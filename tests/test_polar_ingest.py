"""Polar volume ingestion: binaryFile → mapInPandas decode → long DF,
then straight through masks → LUT → composite (the full S11→A10 chain)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_filename_parse():
    from rainforest_spark.sources.polar_ingest import parse_scan_filename

    # 2024-06-01 05:10 UTC = day-of-year 153
    r = parse_scan_filename("/data/A2415305100.npz")
    assert r is None  # 5-digit tail is not a valid %H%M
    radar, epoch = parse_scan_filename("/data/A241530510.npz")
    assert radar == "A"
    import datetime as dt
    d = dt.datetime.fromtimestamp(epoch, dt.timezone.utc)
    assert (d.year, d.month, d.day, d.hour, d.minute) == (2024, 6, 1, 5, 10)


def test_ingest_roundtrip_and_pipeline(spark, tmp_path):
    from rainforest_spark.grid.lookup import polar_to_cart_lut
    from rainforest_spark.grid.qpe import (
        apply_polar_masks, polar_to_grid, vertical_composite,
    )
    from rainforest_spark.sources.polar_ingest import (
        encode_volume_npz, read_polar_volumes,
    )
    from rainforest_spark.testing.fixtures import RADAR_XYZ

    rng = np.random.RandomState(21)
    vols = {
        "A241530510.npz": {1: {"ZH": rng.uniform(0, 50, (60, 40)),
                               "ZV": rng.uniform(0, 45, (60, 40)),
                               "VISIB": rng.uniform(20, 100, (60, 40))},
                           3: {"ZH": rng.uniform(0, 50, (60, 40)),
                               "VISIB": rng.uniform(20, 100, (60, 40))}},
        "D241530510.npz": {1: {"ZH": rng.uniform(0, 50, (60, 40)),
                               "VISIB": rng.uniform(20, 100, (60, 40))}},
    }
    # inject masked gates (NaN) like pyart masked arrays
    vols["A241530510.npz"][1]["ZH"][0:5, 0:5] = np.nan
    for name, sweeps in vols.items():
        (tmp_path / name).write_bytes(encode_volume_npz(sweeps))

    polar = read_polar_volumes(spark, str(tmp_path))
    pdf = polar.toPandas()
    assert set(pdf["RADAR"]) == {"A", "D"}
    assert set(pdf["SWEEP"]) == {1, 3}
    assert len(pdf) == (2 * 60 * 40) + (60 * 40) * 2 - 60 * 40  # 3 sweeps total
    # masked gates arrive as NaN; ZV missing on sweep 3 → all-NaN column
    a1 = pdf[(pdf.RADAR == "A") & (pdf.SWEEP == 1)]
    assert a1[(a1.az_idx < 5) & (a1.rng_idx < 5)]["ZH"].isna().all()
    a3 = pdf[(pdf.RADAR == "A") & (pdf.SWEEP == 3)]
    assert a3["ZV"].isna().all()
    # straight into the grid pipeline
    lut = polar_to_cart_lut(spark, {k: RADAR_XYZ[k] for k in ("A", "D")},
                            sweeps=[1, 3], n_az=60, n_rng=40)
    comp = vertical_composite(
        polar_to_grid(apply_polar_masks(polar), lut, ["zh_lin"]),
        ["zh_lin"], visib_col=None)
    out = comp.toPandas()
    assert len(out) > 50 and "TIMESTAMP" in out.columns


def test_metranet_gate():
    from rainforest_spark.sources.polar_ingest import decode_metranet

    with pytest.raises(NotImplementedError):
        decode_metranet(b"")
