"""Goldens for the round-7 analytics operators: keyless interval join
(bucket expansion), pure-integer rolling z-score, SCD-2 validity
intervals, and exact-integer TextRank keyword PageRank."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from rainforest_spark.operators.joins import interval_join
from rainforest_spark.operators.text_analysis import textrank_keywords
from rainforest_spark.operators.windows import (
    attribute_intervals, rolling_zscore,
)


# ------------------------------------------------------- interval join

def _iv(spark, rows):
    return spark.createDataFrame(rows, "iv_id long, s long, e long")


def _pt(spark, rows):
    return spark.createDataFrame(rows, "p_id long, us long")


def test_interval_join_matches_brute_force(spark):
    import random
    rng = random.Random(7)
    ivs = []
    for i in range(40):
        s = rng.randrange(0, 3_600_000_000)
        ivs.append((i, s, s + rng.randrange(0, 1_800_000_000)))
    pts = [(j, rng.randrange(0, 5_400_000_000)) for j in range(300)]
    got = {(r["p_id"], r["iv_id"])
           for r in interval_join(_pt(spark, pts), _iv(spark, ivs),
                                  "us", "s", "e",
                                  bucket_sec=600).collect()}
    want = {(p, i) for p, us in pts for i, s, e in ivs if s <= us <= e}
    assert got == want


def test_interval_join_boundaries_inclusive_and_no_dups(spark):
    ivs = _iv(spark, [(1, 1_000_000, 2_000_000)])
    # on-start, inside, on-end, before, after
    pts = _pt(spark, [(1, 1_000_000), (2, 1_500_000), (3, 2_000_000),
                      (4, 999_999), (5, 2_000_001)])
    rows = interval_join(pts, ivs, "us", "s", "e", bucket_sec=1).collect()
    assert sorted(r["p_id"] for r in rows) == [1, 2, 3]
    assert len(rows) == 3  # exactly once each, no bucket-overlap dups


def test_interval_join_plans_as_equi_join(spark):
    ivs = _iv(spark, [(1, 0, 10_000_000)])
    pts = _pt(spark, [(1, 5_000_000)])
    plan = interval_join(pts, ivs, "us", "s", "e",
                         bucket_sec=60)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------- rolling z-score

def _series(spark, vals, user=1):
    base = datetime(2024, 1, 1)
    rows = [(i, user, base + timedelta(minutes=i), float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")


def test_rolling_zscore_flags_known_spike(spark):
    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 9.8, 10.1, 10.0, 9.9, 10.3,
            10.1, 50.0, 10.0]
    out = rolling_zscore(_series(spark, vals), ["user_id"], "ts",
                         "value", tie_col="event_id",
                         window_rows=10, z_thresh=2).collect()
    assert [r["event_id"] for r in out] == [11]
    # z agrees with the numpy reference on the trailing-10 window
    import numpy as np
    w = np.array(vals[2:12])
    z = (w[-1] - w.mean()) / w.std(ddof=1)
    assert out[0]["zscore"] == pytest.approx(z, abs=2e-6)


def test_rolling_zscore_matches_numpy_reference(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    vals = np.round(rng.exponential(20.0, 120), 2)
    out = rolling_zscore(_series(spark, list(vals)), ["user_id"], "ts",
                         "value", tie_col="event_id",
                         window_rows=10, z_thresh=2).collect()
    flagged = set()
    for i in range(9, len(vals)):
        w = vals[i - 9:i + 1]
        sd = w.std(ddof=1)
        if sd > 0 and abs(w[-1] - w.mean()) > 2 * sd:
            flagged.add(i)
    assert {r["event_id"] for r in out} == flagged


def test_rolling_zscore_constant_window_not_flagged(spark):
    out = rolling_zscore(_series(spark, [5.0] * 15), ["user_id"], "ts",
                         "value", tie_col="event_id",
                         window_rows=10, z_thresh=2).collect()
    assert out == []  # zero variance never divides / never flags


# ------------------------------------------------------ SCD-2 intervals

def test_attribute_intervals_golden(spark):
    base = datetime(2024, 1, 1)
    rows = [(k, 7, base + timedelta(days=d), a) for k, d, a in
            [(1, 0, "A"), (2, 1, "A"), (3, 2, "B"), (4, 3, "B"),
             (5, 4, "A")]]
    df = spark.createDataFrame(
        rows, "ok long, k long, ts timestamp, attr string")
    out = {r["version"]: (r["attr"], r["valid_from"], r["valid_to"])
           for r in attribute_intervals(df, ["k"], "ts", "attr",
                                        tie_col="ok").collect()}
    assert len(out) == 3
    assert out[1][0] == "A" and out[1][2] == base + timedelta(days=2)
    assert out[2][0] == "B" and out[2][2] == base + timedelta(days=4)
    assert out[3][0] == "A" and out[3][2] is None  # open current run


def test_attribute_intervals_same_ts_tie_break(spark):
    base = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, base, "A"), (2, 1, base, "B")],
        "ok long, k long, ts timestamp, attr string")
    out = sorted(attribute_intervals(df, ["k"], "ts", "attr",
                                     tie_col="ok").collect(),
                 key=lambda r: r["version"])
    # tie resolves on ok: A (ok=1) first, B second
    assert [r["attr"] for r in out] == ["A", "B"]


# ------------------------------------------------------------ TextRank

def _textrank_reference(texts, iterations=4):
    """Independent integer-exact reference (same spec, plain Python)."""
    from collections import Counter, defaultdict
    edges = Counter()
    for t in texts:
        ws = " ".join(t.lower().split()).split(" ")
        for a, b in zip(ws, ws[1:]):
            if a and b and a != b:
                edges[(a, b)] += 1
                edges[(b, a)] += 1
    W = defaultdict(int)
    for (a, _b), w in edges.items():
        W[a] += w
    r = {v: 1_000_000_000 for v in W}
    for _ in range(iterations):
        new = defaultdict(lambda: 150_000_000)
        for (a, b), w in edges.items():
            a85 = (r[a] * 17) // 20
            new[b] += (a85 // W[a]) * w + ((a85 % W[a]) * w) // W[a]
        r = dict(new)
    return r


def test_textrank_matches_integer_reference(spark):
    texts = ["the cat sat on the mat",
             "the dog sat on the log",
             "a cat and a dog and a bird",
             "bird song in the morning"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["term"]: r["rank_nanos"]
           for r in textrank_keywords(df, "doc_id", "text",
                                      iterations=4, k=100).collect()}
    assert got == _textrank_reference(texts)


def test_textrank_hub_term_ranks_first(spark):
    texts = ["alpha beta", "alpha gamma", "alpha delta", "alpha epsilon",
             "beta gamma"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    top = textrank_keywords(df, "doc_id", "text", k=1).collect()[0]
    assert top["term"] == "alpha"


def test_textrank_single_token_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(0, "solo"), (1, "pair term"), (2, "")],
        "doc_id long, text string")
    terms = {r["term"] for r in
             textrank_keywords(df, "doc_id", "text", k=10).collect()}
    assert terms == {"pair", "term"}
