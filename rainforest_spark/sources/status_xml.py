"""XML status / VPR profile readers (SURVEY §2.1 S13).

Reference: rainforest/common/io_data.py:65-114 parses radar status XML
(noise calibration, wet-radome attenuation) and :332-380 parses VPR
profiles into an interpolator.

Spark-first: pure-python ``xml.etree`` parse inside an ingestion helper;
status values become a broadcastable per-(radar, timestamp) dimension
table, and the VPR curve becomes a (height, correction) table used with
the interpolation join (J10 machinery) instead of a scipy interpolator.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def parse_status_xml(content: str) -> dict:
    """Extract noise/wet-radome fields from a status XML document."""
    root = ET.fromstring(content)
    out = {}
    for key in ("noisepower_frontend_h_inuse", "rspstatus_noisepwr_h",
                "wet_radome_attenuation", "radome_status"):
        el = root.find(f".//{key}")
        if el is not None and el.text:
            try:
                out[key] = float(el.text)
            except ValueError:
                out[key] = el.text
    return out


def status_table(spark: SparkSession,
                 docs: list[tuple[str, int, str]]) -> DataFrame:
    """[(radar, epoch, xml_text)] → per-(RADAR, TIMESTAMP) status dim."""
    rows = []
    for radar, epoch, text in docs:
        rec = {"RADAR": radar, "TIMESTAMP": epoch}
        rec.update(parse_status_xml(text))
        rows.append(rec)
    return spark.createDataFrame(pd.DataFrame(rows))


def parse_vpr_xml(content: str) -> pd.DataFrame:
    """VPR profile XML → (height_m, correction_db) rows."""
    root = ET.fromstring(content)
    heights, corrs = [], []
    for prof in root.iter("level"):
        h = prof.get("height") or (prof.findtext("height") or "")
        c = prof.get("value") or (prof.findtext("value") or "")
        if h and c:
            heights.append(float(h))
            corrs.append(float(c))
    return pd.DataFrame({"height_m": heights, "correction_db": corrs})


def vpr_table(spark: SparkSession, content: str) -> DataFrame:
    """VPR curve as a broadcastable table; consumers interpolate with the
    J10 lead()-pair + lerp pattern (operators.joins.
    interpolate_hourly_to_subhourly generalizes to any monotonic axis)."""
    return spark.createDataFrame(parse_vpr_xml(content))
