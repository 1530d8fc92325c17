"""Hydrometeor classification, XML status/VPR readers, rotated pole,
run-summary sink."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_hydro_classify(spark):
    from rainforest_spark.operators.hydro import CENTROIDS, hydro_classify

    # gates placed exactly AT three centroids must classify to them
    rows = []
    for i, (cls, zh, zdr, kdp, rho, relh) in enumerate(CENTROIDS[:3]):
        rows.append((i, zh, zdr, kdp, rho, relh, cls))
    pdf = pd.DataFrame(rows, columns=["gate_id", "ZH", "ZDR", "KDP",
                                      "RHOHV", "relh", "expected"])
    df = spark.createDataFrame(pdf)
    out = hydro_classify(df, spark, keys=["gate_id", "expected"]).toPandas()
    assert (out["HYDRO"] == out["expected"]).all()
    assert (out["hydro_dist"] == 0.0).all()
    # a strong-hail-like gate
    hail = spark.createDataFrame(
        [(99, 55.0, 0.0, 0.2, 0.97, 1100.0)],
        "gate_id long, ZH double, ZDR double, KDP double, RHOHV double, "
        "relh double")
    got = hydro_classify(hail, spark, keys=["gate_id"]).collect()[0]
    assert got.HYDRO == "IH"


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
