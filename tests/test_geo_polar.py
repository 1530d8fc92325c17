"""Geo transforms vs known swisstopo reference points; polar nearest-fill
and KDP regression vs numpy goldens."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_wgs_ch1903_roundtrip(spark):
    from rainforest_spark.functions.geo import (
        ch_to_wgs_lat, ch_to_wgs_lon, wgs_to_ch_x, wgs_to_ch_y,
    )

    # official swisstopo test point: Bern, Zimmerwald
    # lat 46.877, lon 7.465 → y≈602030.68, x≈191775.03 (approx formulas)
    df = spark.createDataFrame([(46.87706, 7.46527)], "lat double, lon double")
    out = df.select(
        wgs_to_ch_y("lat", "lon").alias("y"),
        wgs_to_ch_x("lat", "lon").alias("x")).collect()[0]
    assert abs(out.y - 602030.0) < 150.0
    assert abs(out.x - 191775.0) < 150.0
    # round trip to within ~1e-3 deg
    back = (df.select(wgs_to_ch_y("lat", "lon").alias("y"),
                      wgs_to_ch_x("lat", "lon").alias("x"),
                      "lat", "lon")
            .select(ch_to_wgs_lat("y", "x").alias("lat2"),
                    ch_to_wgs_lon("y", "x").alias("lon2"),
                    "lat", "lon").collect()[0])
    assert abs(back.lat2 - back.lat) < 2e-3
    assert abs(back.lon2 - back.lon) < 2e-3


def test_fill_nearest_in_ray(spark):
    from rainforest_spark.grid.polar import fill_nearest_in_ray

    rows = [("A", 1, 0, r, v) for r, v in
            [(0, None), (1, 10.0), (2, None), (3, None), (4, 20.0),
             (5, None), (6, None), (7, None)]]
    df = spark.createDataFrame(
        rows, "RADAR string, SWEEP int, az_idx int, rng_idx int, ZH double")
    out = {r.rng_idx: r.ZH_filled
           for r in fill_nearest_in_ray(df, "ZH").collect()}
    assert out[0] == 10.0          # nearest after
    assert out[1] == 10.0          # already valid
    assert out[2] == 10.0          # dist 1 before vs 2 after → before
    assert out[3] == 20.0          # dist 2 before vs 1 after → after
    assert out[5] == 20.0 and out[7] == 20.0  # tail carries last valid
    capped = {r.rng_idx: r.ZH_filled
              for r in fill_nearest_in_ray(df, "ZH", max_gap=1).collect()}
    assert capped[7] is None       # beyond max gap stays null


def test_kdp_regression_golden(spark):
    from rainforest_spark.grid.polar import kdp_from_psidp

    # PSIDP = 8 deg/km * range + noiseless → KDP = slope/2 = 4 deg/km
    rng_idx = np.arange(50)
    psidp = 8.0 * (rng_idx * 0.5)
    pdf = pd.DataFrame({"RADAR": "A", "SWEEP": 1, "az_idx": 0,
                        "rng_idx": rng_idx.astype(np.int32),
                        "PSIDP": psidp})
    df = spark.createDataFrame(pdf)
    out = kdp_from_psidp(df, window_gates=12).toPandas() \
        .sort_values("rng_idx")
    interior = out.iloc[10:40]["KDP"].to_numpy()
    assert np.allclose(interior, 4.0, atol=1e-9)
    # with a gap of nulls the slope still estimates from present gates
    pdf2 = pdf.copy()
    pdf2.loc[20:25, "PSIDP"] = np.nan
    out2 = kdp_from_psidp(spark.createDataFrame(pdf2),
                          window_gates=12).toPandas()
    assert np.isfinite(out2["KDP"].iloc[30:40]).all()


def test_zphi_attenuation_golden(spark):
    """zphi_attenuation vs an independent per-ray numpy reimplementation
    of the published ZPHI closed form (Testud et al. 2000), including
    ZDR/ZV corrections and gates outside the valid segment."""
    from rainforest_spark.grid.polar import zphi_attenuation

    a_coef, beta, c, d, dr = 0.08, 0.64884, 0.3, 1.0804, 0.5
    rng = np.random.RandomState(7)
    rows = []
    for az in range(4):
        n = 60
        zh = rng.uniform(10, 45, n)
        phidp = np.cumsum(rng.uniform(0.1, 1.2, n))
        zdr = rng.uniform(-1, 3, n)
        zv = zh - zdr
        zh[5] = np.nan                      # an invalid gate mid-ray
        rows.append(pd.DataFrame({
            "RADAR": "A", "SWEEP": 1, "az_idx": az,
            "rng_idx": np.arange(n, dtype=np.int32),
            "ZH": zh, "PHIDP": phidp, "ZDR": zdr, "ZV": zv}))
    pdf = pd.concat(rows, ignore_index=True)
    out = zphi_attenuation(spark.createDataFrame(pdf), zdr_col="ZDR",
                           zv_col="ZV", a_coef=a_coef, beta=beta,
                           c=c, d=d, gate_len_km=dr).toPandas() \
        .sort_values(["az_idx", "rng_idx"])

    for az in range(4):
        g = pdf[pdf["az_idx"] == az].sort_values("rng_idx")
        o = out[out["az_idx"] == az].sort_values("rng_idx")
        valid = g["ZH"].notna().to_numpy()
        zb = np.where(valid, 10 ** (0.1 * beta * g["ZH"].to_numpy()), 0.0)
        ph = g["PHIDP"].to_numpy()
        r1, r2 = np.where(valid)[0][[0, -1]]
        dphi = ph[r2] - ph[r1]
        cnum = 10 ** (0.1 * beta * a_coef * dphi) - 1
        pre = 0.46 * beta * dr
        irev = pre * (np.cumsum(zb[::-1])[::-1])
        itot = pre * zb.sum()
        ah = np.where(valid, zb * cnum / (itot + cnum * irev), np.nan)
        pia = 2 * dr * np.nancumsum(ah)
        got_ah = o["AH"].to_numpy()
        assert np.allclose(got_ah[valid], ah[valid], rtol=1e-9)
        assert np.isnan(got_ah[~valid]).all()
        assert np.allclose(o["PIA"].to_numpy(), pia, rtol=1e-9)
        pida = c * pia ** d
        exp_zhc = g["ZH"].to_numpy() + pia
        exp_zdrc = g["ZDR"].to_numpy() + pida
        exp_zvc = g["ZV"].to_numpy() + pia - pida
        m = np.isfinite(exp_zhc)
        assert np.allclose(o["ZH_CORR"].to_numpy()[m], exp_zhc[m], rtol=1e-9)
        assert np.allclose(o["ZDR_CORR"].to_numpy(), exp_zdrc, rtol=1e-9)
        assert np.allclose(o["ZV_CORR"].to_numpy(), exp_zvc, rtol=1e-9)
    # attenuation must be positive and monotonically accumulating
    assert (out.groupby("az_idx")["PIA"].apply(
        lambda s: (np.diff(s.to_numpy()) >= -1e-12).all())).all()
