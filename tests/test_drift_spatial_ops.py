"""Goldens for the PSI drift profile, OHLC resampling, quantile
normalization, and the grid-bucketed nearest-site join."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from rainforest_spark.operators.aggregates import ohlc
from rainforest_spark.operators.joins import nearest_site
from rainforest_spark.operators.stats import psi_profile, quantile_normalize


# ------------------------------------------------------------- PSI

def test_psi_matches_hand_computation(spark):
    # expected: 6 in bin0, 2 in bin1; actual: 2 in bin0, 6 in bin1
    rows = ([(1.0, 1)] * 6 + [(11.0, 1)] * 2
            + [(1.0, 0)] * 2 + [(11.0, 0)] * 6)
    df = spark.createDataFrame(rows, "v double, e int")
    out = {r["bin"]: r for r in
           psi_profile(df, "v", (F.col("e") == 1),
                       lo=0.0, width=10.0, n_bins=2).collect()}
    term0 = (6 / 8 - 2 / 8) * math.log((6 * 8) / (2 * 8))
    term1 = (2 / 8 - 6 / 8) * math.log((2 * 8) / (6 * 8))
    ref0 = math.floor(term0 * 1e9 + 0.5) / 1e9
    ref1 = math.floor(term1 * 1e9 + 0.5) / 1e9
    assert out[0]["n_expected"] == 6 and out[0]["n_actual"] == 2
    assert out[0]["psi_term"] == ref0
    assert out[1]["psi_term"] == ref1
    assert out[0]["psi_total"] == (math.floor(term0 * 1e9 + 0.5)
                                   + math.floor(term1 * 1e9 + 0.5)) / 1e9


def test_psi_identical_distributions_zero(spark):
    rows = [(float(v), e) for v in range(10) for e in (0, 1)]
    df = spark.createDataFrame(rows, "v double, e int")
    out = psi_profile(df, "v", (F.col("e") == 1),
                      lo=0.0, width=2.0, n_bins=5).collect()
    assert all(r["psi_total"] == 0.0 for r in out)


def test_psi_clamps_out_of_range_and_nulls_empty_bins(spark):
    rows = [(-5.0, 1), (999.0, 1), (1.0, 1), (1.0, 0)]
    df = spark.createDataFrame(rows, "v double, e int")
    out = {r["bin"]: r for r in
           psi_profile(df, "v", (F.col("e") == 1),
                       lo=0.0, width=10.0, n_bins=2).collect()}
    assert out[-1]["n_expected"] == 1 and out[-1]["n_actual"] == 0
    assert out[2]["n_expected"] == 1  # overflow bin = n_bins
    assert out[-1]["psi_term"] is None  # one-sided bin: no term
    # total sums the two-sided bins only: just bin 0, whose term is
    # (1/3 - 1)*ln((1*1)/(1*3)) with T_e=3, T_a=1
    ref = math.floor((1 / 3 - 1.0) * math.log(1 / 3) * 1e9 + 0.5) / 1e9
    assert out[0]["psi_total"] == ref
    assert out[-1]["psi_total"] == ref  # same total on every row


# ------------------------------------------------------------ OHLC

def test_ohlc_known_bars(spark):
    rows = [  # (key, epoch, tie, value) — bucket 100 s
        ("a", 10, 1, 5.0), ("a", 20, 2, 9.0), ("a", 30, 3, 1.0),
        ("a", 150, 4, 7.0),
        ("b", 5, 5, 2.0),
    ]
    df = spark.createDataFrame(
        [(k, e, t, v) for k, e, t, v in rows],
        "k string, e long, t long, v double").withColumn(
        "ts", F.timestamp_seconds(F.col("e")))
    out = {(r["k"], r["bucket_start"]): r for r in
           ohlc(df, ["k"], "ts", "v", "t", bucket_sec=100).collect()}
    bar = out[("a", 0)]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) \
        == (5.0, 9.0, 1.0, 1.0)
    assert bar["n"] == 3 and bar["mean_value"] == 5.0
    assert out[("a", 100)]["open"] == 7.0
    assert out[("b", 0)]["open"] == out[("b", 0)]["close"] == 2.0


def test_ohlc_same_timestamp_tie_break(spark):
    # two observations in the same second: the tie key decides
    df = spark.createDataFrame(
        [("a", 10, 1, 3.0), ("a", 10, 2, 8.0)],
        "k string, e long, t long, v double").withColumn(
        "ts", F.timestamp_seconds(F.col("e")))
    bar = ohlc(df, ["k"], "ts", "v", "t", bucket_sec=60).collect()[0]
    assert bar["open"] == 3.0 and bar["close"] == 8.0


def test_ohlc_negative_values_mean(spark):
    df = spark.createDataFrame(
        [("a", 1, 1, -1.0), ("a", 2, 2, -2.0)],
        "k string, e long, t long, v double").withColumn(
        "ts", F.timestamp_seconds(F.col("e")))
    bar = ohlc(df, ["k"], "ts", "v", "t", bucket_sec=60).collect()[0]
    assert bar["mean_value"] == -1.5


# ---------------------------------------------- quantile normalization

def test_quantile_normalize_maps_onto_global(spark):
    # group g1 values 1..4, group g2 values 101..104: after
    # normalization both groups cover the same global spread
    rows = [("g1", float(v), v) for v in (1, 2, 3, 4)] + \
           [("g2", float(v + 100), v + 10) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "g string, v double, t long")
    out = {(r["g"], r["v"]): r["norm"] for r in
           quantile_normalize(df, "g", "v", "t", out_col="norm")
           .collect()}
    # global sorted values: 1,2,3,4,101,102,103,104 (N=8)
    # r_g=1 -> rank 1; r_g=4 -> rank 8; r_g=2 -> 1+round(1*7/3)=3.33->3
    assert out[("g1", 1.0)] == 1.0
    assert out[("g1", 4.0)] == 104.0
    assert out[("g2", 101.0)] == 1.0
    assert out[("g2", 104.0)] == 104.0
    # both groups get identical normalized sets
    g1 = sorted(v for (g, _), v in out.items() if g == "g1")
    g2 = sorted(v for (g, _), v in out.items() if g == "g2")
    assert g1 == g2


def test_quantile_normalize_singleton_group_hits_median(spark):
    rows = [("big", float(v), v) for v in range(1, 10)] + \
           [("solo", 999.0, 100)]
    df = spark.createDataFrame(rows, "g string, v double, t long")
    out = quantile_normalize(df, "g", "v", "t", out_col="norm")
    solo = out.filter(F.col("g") == "solo").collect()[0]
    # N=10 -> target rank (10+1) div 2 = 5 -> 5th global value
    glob = sorted([float(v) for v in range(1, 10)] + [999.0])
    assert solo["norm"] == glob[4]


def test_quantile_normalize_matches_brute_force(spark):
    rng = random.Random(7)
    rows = [(rng.choice("xyz"), rng.random() * 100, i)
            for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double, t long")
    out = {r["t"]: r["norm"] for r in
           quantile_normalize(df, "g", "v", "t", out_col="norm")
           .collect()}
    glob = sorted(rows, key=lambda r: (r[1], r[2]))
    n = len(rows)
    by_g = {}
    for g, v, t in sorted(rows, key=lambda r: (r[1], r[2])):
        by_g.setdefault(g, []).append(t)
    for g, ts in by_g.items():
        ng = len(ts)
        for i, t in enumerate(ts):
            tgt = ((2 * i * (n - 1) + (ng - 1)) // (2 * (ng - 1)) + 1
                   if ng > 1 else (n + 1) // 2)
            assert out[t] == glob[tgt - 1][1], (g, t)


# --------------------------------------------------- nearest site

def _sites(spark, rows):
    return spark.createDataFrame(rows, "sk long, sx long, sy long")


def _points(spark, rows):
    return spark.createDataFrame(rows, "pk long, px long, py long")


def test_nearest_site_matches_brute_force_within_radius(spark):
    rng = random.Random(3)
    pts = [(i, rng.randrange(10**6), rng.randrange(10**6))
           for i in range(400)]
    sts = [(j, rng.randrange(10**6), rng.randrange(10**6))
           for j in range(25)]
    cell = 200_000
    out = {r["pk"]: (r["sk"], r["dist_sq"]) for r in
           nearest_site(_points(spark, pts), _sites(spark, sts),
                        "px", "py", "sx", "sy", ["pk"], ["sk"],
                        cell=cell).collect()}
    for pk, px, py in pts:
        best = min(((sk, (px - sx) ** 2 + (py - sy) ** 2)
                    for sk, sx, sy in sts), key=lambda t: (t[1], t[0]))
        if best[1] <= cell * cell:
            assert out[pk] == best, pk
        else:
            assert out[pk] == (None, None), pk


def test_nearest_site_distance_tie_breaks_on_key(spark):
    out = nearest_site(
        _points(spark, [(1, 100, 100)]),
        _sites(spark, [(7, 90, 100), (3, 110, 100)]),
        "px", "py", "sx", "sy", ["pk"], ["sk"], cell=1000).collect()
    assert out[0]["sk"] == 3 and out[0]["dist_sq"] == 100


def test_nearest_site_out_of_radius_keeps_point(spark):
    out = nearest_site(
        _points(spark, [(1, 0, 0)]),
        _sites(spark, [(9, 900_000, 900_000)]),
        "px", "py", "sx", "sy", ["pk"], ["sk"], cell=1000).collect()
    assert len(out) == 1 and out[0]["sk"] is None


def test_pareto_frontier_grouped_matches_per_group_brute_force(spark):
    from rainforest_spark.operators.stats import pareto_frontier
    rng = random.Random(33)
    rows = [(i, rng.choice("pq"), rng.randrange(30), rng.randrange(500))
            for i in range(1_500)]
    df = spark.createDataFrame(rows, "i long, g string, x long, y long")
    got = sorted(r["i"] for r in
                 pareto_frontier(df, "x", "y",
                                 group_cols=["g"]).collect())
    want = sorted(
        i for i, g, x, y in rows
        if not any(qg == g and qx <= x and qy <= y and (qx < x or qy < y)
                   for _, qg, qx, qy in rows))
    assert got == want


def test_cli_drift_end_to_end(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    rng = random.Random(14)
    a = [(rng.gauss(50, 10),) for _ in range(2_000)]
    b = [(rng.gauss(58, 12),) for _ in range(2_000)]
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    spark.createDataFrame(a, "v double").write.parquet(pa)
    spark.createDataFrame(b, "v double").write.parquet(pb)
    r = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "drift",
         pa, pb, "-c", "v", "--lo", "0", "--hi", "100"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = _json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n_baseline"] == 2_000 and rep["n_current"] == 2_000
    # a real shift: both monitors fire well above the usual alert bars
    assert rep["psi"] > 0.1 and rep["ks_d"] > 0.1


def test_nearest_site_auto_cell_matches_brute_force(spark):
    # cell=None derives cell ~ sqrt(area/|sites|) from the site bbox —
    # the default path must honor the same bounded-radius contract at
    # the derived radius
    import math
    import random as _r
    rng = _r.Random(11)
    pts = [(i, rng.randrange(10**6), rng.randrange(10**6))
           for i in range(300)]
    sts = [(j, rng.randrange(10**6), rng.randrange(10**6))
           for j in range(25)]
    xs, ys = [s[1] for s in sts], [s[2] for s in sts]
    area = max(max(xs) - min(xs), 1) * max(max(ys) - min(ys), 1)
    cell = max(math.isqrt(area // len(sts)), 1)
    out = {r["pk"]: (r["sk"], r["dist_sq"]) for r in
           nearest_site(_points(spark, pts), _sites(spark, sts),
                        "px", "py", "sx", "sy", ["pk"], ["sk"]).collect()}
    assert len(out) == len(pts)
    for pk, px, py in pts:
        best = min(((sk, (px - sx) ** 2 + (py - sy) ** 2)
                    for sk, sx, sy in sts), key=lambda t: (t[1], t[0]))
        if best[1] <= cell * cell:
            assert out[pk] == best, pk
        # beyond the derived radius the contract allows either the true
        # nearest (if it shares a cell ring) or NULL — both bounded


def test_nearest_site_auto_cell_empty_sites(spark):
    out = nearest_site(
        _points(spark, [(1, 5, 5)]), _sites(spark, []),
        "px", "py", "sx", "sy", ["pk"], ["sk"]).collect()
    assert len(out) == 1 and out[0]["sk"] is None
