"""Hydrometeor classification, XML status/VPR readers, rotated pole,
run-summary sink."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_hydro_classify(spark):
    from rainforest_spark.operators.hydro import CENTROIDS, hydro_classify

    # gates placed exactly AT centroids must classify to them (distance 0
    # up to libm ulp differences between the JVM and CPython transforms)
    rows = []
    for i, (cls, zh, zdr, kdp, rho, relh) in enumerate(CENTROIDS):
        rows.append((i, zh, zdr, kdp, rho, relh, cls))
    pdf = pd.DataFrame(rows, columns=["gate_id", "ZH", "ZDR", "KDP",
                                      "RHOHV", "relh", "expected"])
    df = spark.createDataFrame(pdf)
    out = hydro_classify(df, spark, keys=["gate_id", "expected"]).toPandas()
    assert (out["HYDRO"] == out["expected"]).all()
    assert (out["hydro_dist"] < 1e-9).all()
    # a strong dry-hail-like gate (near the IH centroid of radar A)
    hail = spark.createDataFrame(
        [(99, "A", 50.0, 0.0, 0.1, 0.99, 1100.0)],
        "gate_id long, RADAR string, ZH double, ZDR double, KDP double, "
        "RHOHV double, relh double")
    got = hydro_classify(hail, spark, keys=["gate_id"]).collect()[0]
    assert got.HYDRO == "IH"


def _np_standardize(data, feat):
    """Independent numpy mirror of Besic (2016) / pyart _standardize."""
    if feat == "relh":
        return 2.0 / (1.0 + np.exp(-0.005 * data)) - 1.0
    if feat == "KDP":
        data = 10.0 * np.log10(np.maximum(data, -0.5) + 0.6)
    elif feat == "RHOHV":
        data = 10.0 * np.log10(1.0 - data)
    mn, mx = {"ZH": (-10.0, 60.0), "ZDR": (-1.5, 5.0),
              "KDP": (-10.0, 7.0), "RHOHV": (-50.0, -5.23)}[feat]
    return np.clip(2.0 * (data - mn) / (mx - mn) - 1.0, -1.0, 1.0)


def test_hydro_classify_reference_parity(spark):
    """Classification over a random fixture volume across all five radars
    matches an independent numpy implementation of the reference pipeline
    (radarprocessing.py:633-705: per-radar centroids, _standardize,
    weighted-Minkowski cdist argmin)."""
    from rainforest_spark.operators.hydro import (
        FEATURES, HYDRO_CENTROIDS, HYDRO_CLASSES, WEIGHTS, hydro_classify)

    rng = np.random.RandomState(42)
    n = 2000
    pdf = pd.DataFrame({
        "gate_id": np.arange(n),
        "RADAR": rng.choice(list(HYDRO_CENTROIDS), n),
        "ZH": rng.uniform(-15, 65, n),
        "ZDR": rng.uniform(-2, 5.5, n),
        "KDP": rng.uniform(-1, 3, n),
        "RHOHV": rng.uniform(0.9, 0.999, n),
        "relh": rng.uniform(-4000, 4000, n)})

    # numpy truth: per-radar standardized centroids + weighted L2 argmin
    feats = np.column_stack([_np_standardize(pdf[f].to_numpy(), f)
                             for f in FEATURES])
    w = np.asarray(WEIGHTS)
    expected, margin = np.empty(n, dtype=object), np.empty(n)
    for radar, cents in HYDRO_CENTROIDS.items():
        idx = np.where(pdf["RADAR"].to_numpy() == radar)[0]
        c = np.column_stack([_np_standardize(np.asarray(cents)[:, j], f)
                             for j, f in enumerate(FEATURES)])
        d = np.sqrt(((feats[idx, None, :] - c[None, :, :]) ** 2 * w).sum(-1))
        order = np.sort(d, axis=1)
        margin[idx] = order[:, 1] - order[:, 0]
        expected[idx] = np.array(HYDRO_CLASSES)[np.argmin(d, axis=1)]

    out = (hydro_classify(spark.createDataFrame(pdf), spark,
                          keys=["gate_id"])
           .toPandas().sort_values("gate_id", ignore_index=True))
    # ignore knife-edge ties where float association order decides
    clear = margin > 1e-9
    assert clear.sum() > n * 0.99
    assert (out["HYDRO"].to_numpy()[clear] == expected[clear]).all()


def test_status_and_vpr_xml(spark):
    from rainforest_spark.sources.status_xml import status_table, vpr_table

    status = """<status><radar>
      <noisepower_frontend_h_inuse>-93.2</noisepower_frontend_h_inuse>
      <wet_radome_attenuation>1.5</wet_radome_attenuation>
    </radar></status>"""
    st = status_table(spark, [("A", 1717200000, status)]).collect()[0]
    assert st.RADAR == "A"
    assert st.noisepower_frontend_h_inuse == -93.2
    assert st.wet_radome_attenuation == 1.5

    vpr = """<vpr>
      <level height="500" value="0.2"/>
      <level height="1500" value="1.1"/>
      <level height="2500" value="2.7"/>
    </vpr>"""
    vt = vpr_table(spark, vpr).orderBy("height_m").collect()
    assert [r.height_m for r in vt] == [500.0, 1500.0, 2500.0]
    assert [r.correction_db for r in vt] == [0.2, 1.1, 2.7]


def test_rotated_pole(spark):
    from rainforest_spark.functions.geo import (
        rotated_pole_to_geo_lat, rotated_pole_to_geo_lon,
    )

    df = spark.createDataFrame([(0.0, 0.0), (90.0, 0.0)],
                               "rlat double, rlon double")
    out = df.select(
        rotated_pole_to_geo_lat("rlat", "rlon").alias("lat"),
        rotated_pole_to_geo_lon("rlat", "rlon").alias("lon")).collect()
    # rotated origin → grid centre (90−43=47°N, 10°E)
    assert abs(out[0].lat - 47.0) < 1e-9
    assert abs(out[0].lon - 10.0) < 1e-9
    # rotated north pole → the pole's geographic latitude
    assert abs(out[1].lat - 43.0) < 1e-9


def test_run_summary_sink(spark, tmp_path):
    from rainforest_spark.sources.writers import append_run_summary

    p = str(tmp_path / "runs")
    append_run_summary(spark, p, "20240601", 1717200000, 1717286400,
                       144, 120000, "day1")
    append_run_summary(spark, p, "20240602", 1717286400, 1717372800,
                       144, 118000, "day2")
    out = spark.read.parquet(p).orderBy("day").collect()
    assert [r.day for r in out] == ["20240601", "20240602"]
    assert out[0].n_rows == 120000


def test_kochendorfer_bands_golden(spark):
    """kochendorfer_adjust vs the reference KD4 coefficients and bands
    (database_10min/retrieve_dwh_data.py:79-97): solid T<-2, mixed
    -2..2, liquid >2 unadjusted, wind clipped at 9, null T unadjusted."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from rainforest_spark.functions.physics import kochendorfer_adjust

    pdf = pd.DataFrame({
        "p": [1.0] * 6,
        "t": [-5.0, -2.0, 0.0, 2.0, 5.0, np.nan],
        "u": [4.0, 4.0, 12.0, 9.0, 4.0, 4.0]})
    out = spark.createDataFrame(pdf).withColumn(
        "adj", kochendorfer_adjust("p", "t", "u")).toPandas()

    def ce_solid(u): return 0.865 * np.exp(-0.298 * min(u, 9)) + 0.225
    def ce_mixed(u): return 0.624 * np.exp(-0.185 * min(u, 9)) + 0.364

    exp = [1 / ce_solid(4), 1 / ce_mixed(4), 1 / ce_mixed(12),
           1 / ce_mixed(9), 1.0, 1.0]
    assert np.allclose(out["adj"].to_numpy(), exp)
