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


FAKE_PYART = """
# Minimal pyart-mch stand-in for wiring tests: exposes
# pyart.aux_io.read_metranet(path, reader=..., physic_value=...) that
# reads our synthetic blob (an npz payload) and returns a Radar-like
# object with pyart field names and a masked ZH.
import io

import numpy as np


class _Radar:
    def __init__(self, fields):
        self.fields = fields


class _AuxIO:
    @staticmethod
    def read_metranet(path, reader="python", physic_value=True):
        assert reader == "python" and physic_value
        z = np.load(path)
        zh = np.ma.masked_invalid(z["zh"])
        return _Radar({
            "reflectivity": {"data": zh},
            "reflectivity_vv": {"data": z["zv"]},
        })


aux_io = _AuxIO()
"""


def _fake_pyart_dir(tmp_path):
    d = tmp_path / "fake_pyart_pkg"
    (d / "pyart").mkdir(parents=True)
    (d / "pyart" / "__init__.py").write_text(FAKE_PYART)
    return str(d)


def _metranet_blob(zh, zv):
    import io as _io

    buf = _io.BytesIO()
    np.savez_compressed(buf, zh=zh, zv=zv)
    return buf.getvalue()


def test_decode_metranet_wiring(tmp_path, monkeypatch):
    """decode_metranet drives the pyart seam end-to-end: temp file named
    like the sweep file, field rename through PYART_NAMES_MAPPING,
    masked gates -> NaN."""
    import importlib
    import sys

    monkeypatch.syspath_prepend(_fake_pyart_dir(tmp_path))
    sys.modules.pop("pyart", None)
    importlib.invalidate_caches()
    try:
        from rainforest_spark.sources.polar_ingest import decode_metranet

        zh = np.array([[10.0, np.nan], [20.0, 30.0]])
        zv = np.array([[9.0, 8.0], [19.0, 29.0]])
        out = decode_metranet(_metranet_blob(zh, zv), "MLA241530510.001")
        assert set(out) == {"ZH", "ZV"}          # pyart names renamed
        assert np.isnan(out["ZH"][0, 1])          # masked -> NaN
        assert out["ZH"][1, 0] == 20.0
        assert out["ZV"][1, 1] == 29.0
    finally:
        sys.modules.pop("pyart", None)


def test_read_polar_volumes_metranet(spark, tmp_path, monkeypatch):
    """The metranet format end-to-end through the binaryFile ->
    mapInPandas pipeline: one sweep per file, sweep number from the
    extension, timestamp from the %y%j%H%M stamp."""
    import importlib
    import sys
    import zipfile

    from rainforest_spark.sources.polar_ingest import read_polar_volumes

    pkg_dir = _fake_pyart_dir(tmp_path)
    # the decode runs inside Spark python workers -> ship the fake
    # package there via addPyFile (a zip with the pyart/ dir inside)
    zpath = str(tmp_path / "fake_pyart.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.write(pkg_dir + "/pyart/__init__.py", "pyart/__init__.py")
    spark.sparkContext.addPyFile(zpath)
    monkeypatch.syspath_prepend(pkg_dir)
    sys.modules.pop("pyart", None)
    importlib.invalidate_caches()
    try:
        rng = np.random.RandomState(3)
        drop = tmp_path / "sweeps"
        drop.mkdir()
        for sweep in (1, 2):
            zh = rng.uniform(0, 50, (12, 8))
            zv = zh - 1.0
            (drop / f"MLA241530510.{sweep:03d}").write_bytes(
                _metranet_blob(zh, zv))
        pdf = read_polar_volumes(spark, str(drop),
                                 fmt="metranet").toPandas()
        assert set(pdf["SWEEP"]) == {1, 2}
        assert set(pdf["RADAR"]) == {"A"}
        assert len(pdf) == 2 * 12 * 8
        assert pdf["TIMESTAMP"].nunique() == 1
        # VISIB absent from the decode -> all-NaN column, schema stable
        assert pdf["VISIB"].isna().all()
        assert pdf["ZH"].notna().all()
    finally:
        sys.modules.pop("pyart", None)
