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


def parse_status_sweeps(content: str) -> list[dict]:
    """Per-sweep CALIB + WET_RADOME values from a full status document
    (the shape read_status consumes via xmltodict, io_data.py:65-114:
    status/sweep[i]/RADAR/STAT/CALIB/<key value=...>).

    Returns one dict per sweep: SWEEP (1-based), noisepower_h, rconst_h,
    noisepower_v, rconst_v, wetradome_mmh (None when absent).
    """
    import math

    root = ET.fromstring(content)
    rows = []
    for i, sweep in enumerate(root.iter("sweep")):
        rec = {"SWEEP": int(sweep.get("number", i + 1))}
        calib = sweep.find(".//CALIB")
        for key in ("noisepower_frontend_h_inuse", "rconst_h",
                    "noisepower_frontend_v_inuse", "rconst_v"):
            el = calib.find(key) if calib is not None else None
            val = el.get("value") if el is not None else None
            rec[key] = float(val) if val is not None else None
        wr = sweep.find(".//WET_RADOME/wetradome_mmh")
        rec["wetradome_mmh"] = (float(wr.get("value"))
                                if wr is not None and wr.get("value")
                                else None)
        nh, rh = rec["noisepower_frontend_h_inuse"], rec["rconst_h"]
        nv, rv = rec["noisepower_frontend_v_inuse"], rec["rconst_v"]
        # noisedBADU = 10·log10(noisepower) + rconst
        # (radarprocessing.py:191-202)
        rec["noisedbadu_h"] = (10.0 * math.log10(nh) + rh
                               if nh and rh is not None else None)
        rec["noisedbadu_v"] = (10.0 * math.log10(nv) + rv
                               if nv and rv is not None else None)
        rows.append(rec)
    return rows


def status_noise_table(spark: SparkSession,
                       docs: list[tuple[str, int, str]]) -> DataFrame:
    """[(radar, epoch, xml_text)] → per-(RADAR, TIMESTAMP, SWEEP) noise
    dim with noisedbadu_h/_v + wetradome_mmh, consumed by
    grid.corrections.apply_status_noise / wet_radome_feature."""
    rows = []
    for radar, epoch, text in docs:
        for rec in parse_status_sweeps(text):
            rows.append({"RADAR": radar, "TIMESTAMP": epoch, **rec})
    return spark.createDataFrame(pd.DataFrame(rows))


def parse_vpr_xml(content: str) -> pd.DataFrame:
    """VPR profile XML → (height_m, correction_db) rows.

    Supports both a generic <level height= value=> shape and the
    reference's VPR/DATA/slice + HEADER/vpr_res ladder
    (io_data.py:357-367: alt[i] = i · vpr_res)."""
    root = ET.fromstring(content)
    heights, corrs = [], []
    for prof in root.iter("level"):
        h = prof.get("height") or (prof.findtext("height") or "")
        c = prof.get("value") or (prof.findtext("value") or "")
        if h and c:
            heights.append(float(h))
            corrs.append(float(c))
    if not heights:
        res = float(root.findtext(".//HEADER/vpr_res") or 0.0)
        vals = [float(s.findtext("value"))
                for s in root.iter("slice") if s.findtext("value")]
        heights = [i * res for i in range(len(vals))]
        corrs = vals
    return pd.DataFrame({"height_m": heights, "correction_db": corrs})


def vpr_profile_values(content: str) -> tuple[list[float], float]:
    """(slice values, vpr_res_m) for grid.corrections.
    vpr_correction_curve — the reference ladder shape."""
    root = ET.fromstring(content)
    res = float(root.findtext(".//HEADER/vpr_res") or 0.0)
    vals = [float(s.findtext("value"))
            for s in root.iter("slice") if s.findtext("value")]
    return vals, res


def vpr_table(spark: SparkSession, content: str) -> DataFrame:
    """VPR curve as a broadcastable table; consumers interpolate with the
    J10 lead()-pair + lerp pattern (operators.joins.
    interpolate_hourly_to_subhourly generalizes to any monotonic axis)."""
    return spark.createDataFrame(parse_vpr_xml(content))
