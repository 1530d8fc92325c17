"""Goldens for linear multi-touch attribution, the seasonal-naive
forecast backtest, nearest-rank latency bands, and the zorder CLI."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rainforest_spark.operators.stats import (
    latency_bands, linear_attribution, seasonal_naive_error,
)


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "u long, ep long, i long, ty string, v double")
    return df.withColumn("ts", F.timestamp_seconds(F.col("ep")))


# ------------------------------------------------ linear attribution

def _attr(spark, rows, lookback=1000):
    out = linear_attribution(_ev(spark, rows), "u", "ts", "i", "ty",
                             "v", touch_types=["click", "view"],
                             conversion_type="purchase",
                             lookback_sec=lookback)
    return {r["channel"]: r for r in out.collect()}


def test_linear_attribution_equal_split_with_remainder(spark):
    # 3 touches, value 1.00 -> 1_000_000 micros: 333333 each, the
    # remainder micro to the EARLIEST touch (the click at t=10)
    rows = [(1, 10, 1, "click", 0.0), (1, 20, 2, "view", 0.0),
            (1, 30, 3, "view", 0.0), (1, 40, 4, "purchase", 1.0)]
    got = _attr(spark, rows)
    assert got["click"]["credit"] == 0.333334
    assert got["view"]["credit"] == 0.666666
    assert got["click"]["n_touches"] == 1
    assert got["view"]["n_touches"] == 2


def test_linear_attribution_reconstructs_value_exactly(spark):
    rng = random.Random(8)
    rows, i = [], 0
    for u in range(30):
        t = 0
        for _ in range(rng.randrange(1, 8)):
            t += rng.randrange(1, 300)
            i += 1
            rows.append((u, t, i,
                         rng.choice(["click", "view", "purchase"]),
                         round(rng.random() * 50, 2)))
    import math
    got = _attr(spark, rows, lookback=500)
    total_credit = sum(r["credit"] for r in got.values())
    want = sum(math.floor(v * 1e6 + 0.5) for _, _, _, ty, v in rows
               if ty == "purchase") / 1e6
    assert abs(total_credit - want) < 1e-9


def test_linear_attribution_no_touch_goes_direct(spark):
    rows = [(1, 5000, 1, "purchase", 2.0),
            (1, 10, 2, "click", 0.0)]   # click far outside lookback
    got = _attr(spark, rows, lookback=100)
    assert got["direct"]["credit"] == 2.0
    assert got["direct"]["n_direct"] == 1
    assert set(got) == {"direct"}


def test_linear_attribution_same_second_touch_excluded(spark):
    # a touch in the SAME second as the conversion is not credited
    # (the window is [-lookback, -1])
    rows = [(1, 100, 1, "click", 0.0), (1, 100, 2, "purchase", 1.0)]
    got = _attr(spark, rows)
    assert set(got) == {"direct"}


# ------------------------------------------- seasonal-naive forecast

def test_seasonal_naive_error_known_wape(spark):
    # slots of 100 s, period 2 slots; key 'a':
    # slot 0: 10.0, slot 1: 20.0, slot 2: 12.0, slot 3: 16.0
    # scored: slot2 (f=10, |e|=2), slot3 (f=20, |e|=4) -> wape = 6/28
    rows = [(1, 50, 1, "x", 10.0), (1, 150, 2, "x", 20.0),
            (1, 250, 3, "x", 12.0), (1, 350, 4, "x", 16.0)]
    out = seasonal_naive_error(_ev(spark, rows), ["ty"], "ts", "v",
                               slot_sec=100, period_slots=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_slots"] == 2
    # exact round-half-up micro division of 6e6/28e6
    assert r["wape"] == 0.214286


def test_seasonal_naive_perfect_forecast_zero_wape(spark):
    rows = [(1, 50, 1, "x", 7.0), (1, 150, 2, "x", 7.0),
            (1, 250, 3, "x", 7.0)]
    out = seasonal_naive_error(_ev(spark, rows), ["ty"], "ts", "v",
                               slot_sec=100, period_slots=1).collect()
    assert out[0]["wape"] == 0.0 and out[0]["n_slots"] == 2


# ------------------------------------------------- latency bands

def test_latency_bands_nearest_rank(spark):
    rows = [("a", float(v), v) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double, t long")
    out = latency_bands(df, ["g"], "v", "t").collect()[0]
    # ceil(.5*100)=50, ceil(.95*100)=95, ceil(.99*100)=99
    assert (out["p50"], out["p95"], out["p99"]) == (50.0, 95.0, 99.0)
    assert out["n"] == 100


def test_latency_bands_tiny_group(spark):
    df = spark.createDataFrame([("a", 42.0, 1)], "g string, v double, t long")
    out = latency_bands(df, ["g"], "v", "t").collect()[0]
    assert out["p50"] == out["p95"] == out["p99"] == 42.0


# ------------------------------------------------------ zorder CLI

def test_cli_zorder_end_to_end(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    rng = random.Random(12)
    rows = [(rng.randrange(65536), rng.randrange(65536))
            for _ in range(4_000)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "x long, y long").write.parquet(src)
    out = str(tmp_path / "zo")
    r = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "zorder",
         src, out, "-c", "x,y", "-n", "8"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = _json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["files"] > 1
    # interleaved clustering: each column's per-file extents overlap
    # far less than the no-clustering worst case (every file overlaps
    # every other: files-1)
    worst = rep["files"] - 1
    assert rep["overlap"]["x"] < worst
    assert rep["overlap"]["y"] < worst
    assert spark.read.parquet(out).count() == 4_000


# --------------------------------------------- item-item similarity

def test_item_similarity_matches_brute_force(spark):
    import itertools
    import math as _m

    from rainforest_spark.operators.aggregates import item_similarity_topk
    rng = random.Random(31)
    rows = [(b, rng.randrange(20)) for b in range(200)
            for _ in range(rng.randrange(1, 5))]
    df = spark.createDataFrame(rows, "b long, i long")
    got = {(r["item"], r["rank"]): (r["neighbor"], r["cosine"])
           for r in item_similarity_topk(df, "b", "i", k=3,
                                         min_support=2).collect()}
    baskets = {}
    for b, i in rows:
        baskets.setdefault(b, set()).add(i)
    ni, np_ = {}, {}
    for items in baskets.values():
        for i in items:
            ni[i] = ni.get(i, 0) + 1
        for a, b2 in itertools.combinations(sorted(items), 2):
            np_[(a, b2)] = np_.get((a, b2), 0) + 1
    neigh = {}
    for (a, b2), n in np_.items():
        if n < 2:
            continue
        for x, y in ((a, b2), (b2, a)):
            c = round(n / _m.sqrt(ni[x] * ni[y]), 6)
            neigh.setdefault(x, []).append((-c, y, n))
    for x, lst in neigh.items():
        lst.sort()
        for rank, (c, y, n) in enumerate(lst[:3], start=1):
            assert got[(x, rank)] == (y, -c), (x, rank)


def test_item_similarity_identical_items_cosine_one(spark):
    from rainforest_spark.operators.aggregates import item_similarity_topk
    # items 1 and 2 co-occur in every basket they appear in
    rows = [(b, i) for b in range(5) for i in (1, 2)]
    df = spark.createDataFrame(rows, "b long, i long")
    out = item_similarity_topk(df, "b", "i", k=1).collect()
    assert all(r["cosine"] == 1.0 for r in out)


# --------------------------------------------------- concordance

def test_concordance_positions_and_context(spark):
    from rainforest_spark.operators.text_analysis import concordance
    df = spark.createDataFrame(
        [(1, "a b TERM c d"), (2, "TERM x"), (3, "y TERM"),
         (4, "no match here"), (5, "TERM")],
        "doc_id long, text string")
    out = {(r["doc_id"], r["pos"]): (r["left_context"],
                                     r["right_context"])
           for r in concordance(df, "doc_id", "text", term="term",
                                context=2).collect()}
    assert out[(1, 3)] == ("a b", "c d")
    assert out[(2, 1)] == ("", "x")
    assert out[(3, 2)] == ("y", "")
    assert out[(5, 1)] == ("", "")
    assert (4, 1) not in out and len(out) == 4


def test_concordance_repeated_term_all_occurrences(spark):
    from rainforest_spark.operators.text_analysis import concordance
    df = spark.createDataFrame([(1, "t a t b t")],
                               "doc_id long, text string")
    out = sorted(r["pos"] for r in
                 concordance(df, "doc_id", "text", term="t",
                             context=1).collect())
    assert out == [1, 3, 5]
