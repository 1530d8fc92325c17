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


# -------------------------------------------------- fuzzy match (q144)

def test_fuzzy_match_golden(spark):
    from rainforest_spark.operators.joins import fuzzy_match
    df = spark.createDataFrame(
        [(1, "red widget", 5), (2, "ted widget", 5),   # dist 1, same block
         (3, "red widget", 7),                          # other size block
         (4, "blue widget", 5),                         # dist 3 from id 1
         (5, "red gizmo", 5)],                          # other noun block
        "id long, name string, size int")
    noun = F.element_at(F.split("name", " "), 2)
    rows = {(r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy_match(df, "id", "name", [noun, "size"],
                                 max_dist=3).collect()}
    # blocking excludes (1,3) [size] and (1,5)/(2,5)/(4,5) [noun];
    # lev(red,blue)=4 keeps (1,4)/(2,4) out at max_dist=3
    assert rows == {(1, 2): 1}
    rows4 = {(r["id_a"], r["id_b"]): r["dist"]
             for r in fuzzy_match(df, "id", "name", [noun, "size"],
                                  max_dist=4).collect()}
    assert rows4 == {(1, 2): 1, (1, 4): 4, (2, 4): 4}


def test_fuzzy_match_threshold_and_ordering(spark):
    from rainforest_spark.operators.joins import fuzzy_match
    df = spark.createDataFrame(
        [(1, "aaaa", 1), (2, "bbbb", 1)], "id long, name string, size int")
    assert fuzzy_match(df, "id", "name", ["size"], max_dist=3).count() == 0
    got = fuzzy_match(df, "id", "name", ["size"], max_dist=4).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in got] == [(1, 2, 4)]


def test_fuzzy_match_plans_as_equi_join(spark):
    from rainforest_spark.operators.joins import fuzzy_match
    df = spark.createDataFrame(
        [(1, "aaaa", 1)], "id long, name string, size int")
    plan = fuzzy_match(df, "id", "name", ["size"], max_dist=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------- time-weighted mean (q145)

def test_time_weighted_mean_golden(spark):
    from rainforest_spark.operators.aggregates import time_weighted_mean
    # value 10 held 3 us, value 20 held 1 us -> (30+20)/4 = 12.5
    df = spark.createDataFrame(
        [(1, 0, 10.0, 1), (1, 3, 20.0, 2), (1, 4, 99.0, 3)],
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    out = time_weighted_mean(df, ["k"], "ts", "v", tie_col="id").collect()
    assert len(out) == 1
    assert out[0]["n_holds"] == 2
    assert out[0]["tw_mean"] == 12.5


def test_time_weighted_mean_last_obs_dropped_per_key(spark):
    from rainforest_spark.operators.aggregates import time_weighted_mean
    df = spark.createDataFrame(
        [(1, 0, 5.0, 1), (1, 10, 7.0, 2),
         (2, 0, 42.0, 3)],                     # single obs: no hold at all
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    got = {r["k"]: (r["n_holds"], r["tw_mean"])
           for r in time_weighted_mean(df, ["k"], "ts", "v",
                                       tie_col="id").collect()}
    assert got == {1: (1, 5.0)}


# ------------------------------------------------- dyadic EWMA (q146)

def test_dyadic_ewma_matches_python_reference(spark):
    from rainforest_spark.operators.windows import dyadic_ewma
    import random
    rng = random.Random(11)
    vals = [round(rng.uniform(0, 500), 2) for _ in range(40)]
    df = spark.createDataFrame(
        [(1, i, v, i) for i, v in enumerate(vals)],
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    out = {r["us"]: r["ewma"]
           for r in dyadic_ewma(df, ["k"], "ts", "v", tie_col="id",
                                depth=8).collect()}
    assert len(out) == 40 - 7
    for t in range(7, 40):
        vn = [int((v * 1e9) + 0.5) for v in vals]   # floor(x*1e9+.5), x>=0
        y = (vn[t] * 64 + vn[t-1] * 32 + vn[t-2] * 16 + vn[t-3] * 8
             + vn[t-4] * 4 + vn[t-5] * 2 + vn[t-6] + vn[t-7])
        micro = (2 * y + 128_000) // 256_000
        assert out[t] == micro / 1e6, t


def test_dyadic_ewma_halfway_boundary_exact(spark):
    from rainforest_spark.operators.windows import dyadic_ewma
    # eight equal values v = 5e-7: vn = 500, y = 64000, and the exact
    # quotient 64000/128e9 = 0.0000005 lands exactly ON the half-way
    # 6dp boundary — the integer (2y+128000)//256000 = 1 rounds it
    # half-up to 1e-6 identically on both engines (a double ROUND
    # would be engine-dependent here; that was the q146 parity bug).
    df = spark.createDataFrame(
        [(1, i, 0.0000005, i) for i in range(8)],
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    out = dyadic_ewma(df, ["k"], "ts", "v", tie_col="id", depth=8).collect()
    assert len(out) == 1 and out[0]["ewma"] == 1e-06


def test_dyadic_ewma_constant_series_identity(spark):
    from rainforest_spark.operators.windows import dyadic_ewma
    df = spark.createDataFrame(
        [(1, i, 123.456789, i) for i in range(10)],
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    out = dyadic_ewma(df, ["k"], "ts", "v", tie_col="id", depth=8).collect()
    assert all(r["ewma"] == 123.456789 for r in out) and len(out) == 3


# ------------------------------------------------------- CUSUM (q147)

def test_cusum_matches_python_recursion(spark):
    from rainforest_spark.operators.windows import cusum_changepoints
    import random
    rng = random.Random(3)
    vals = [round(rng.uniform(0, 200), 2) for _ in range(60)]
    df = spark.createDataFrame(
        [(1, i, v, i) for i, v in enumerate(vals)],
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    k, h = 64.0, 128.0
    got = {r["us"]: r["cusum"]
           for r in cusum_changepoints(df, ["k"], "ts", "v", tie_col="id",
                                       k=k, h=h).collect()}
    # reference: the textbook recursion in exact integers
    s, kn, hn = 0, 64_000_000_000, 128_000_000_000
    want = {}
    for i, v in enumerate(vals):
        s = max(0, s + int(v * 1e9 + 0.5) - kn)
        if s > hn:
            want[i] = s / 1e9
    assert got == want and len(want) > 0


def test_cusum_resets_after_drop(spark):
    from rainforest_spark.operators.windows import cusum_changepoints
    vals = [100.0, 100.0, 0.0, 0.0, 0.0, 100.0]    # burst, quiet, single
    df = spark.createDataFrame(
        [(1, i, v, i) for i, v in enumerate(vals)],
        "k long, us long, v double, id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    out = {r["us"]: r["cusum"]
           for r in cusum_changepoints(df, ["k"], "ts", "v", tie_col="id",
                                       k=50.0, h=40.0).collect()}
    # S: 50, 100, 50, 0, 0, 50 -> flags at t=0,1,2,5
    assert out == {0: 50.0, 1: 100.0, 2: 50.0, 5: 50.0}


# -------------------------------------------- winsorized stats (q148)

def test_winsorized_stats_golden(spark):
    from rainforest_spark.operators.aggregates import winsorized_stats
    # 20 values 1..20: p05 rank = ceil(1) = 1 -> lo=1;
    # p95 rank = ceil(19) = 19 -> hi=19; clamped sum = 209, mean 10.45
    df = spark.createDataFrame(
        [("a", i, i) for i in range(1, 21)], "g string, v long, id long")
    out = winsorized_stats(df, ["g"], "v", tie_col="id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["lo"], r["hi"]) == (20, 1, 19)
    assert r["w_mean"] == (sum(min(max(v, 1), 19)
                               for v in range(1, 21)) / 20)


def test_winsorized_stats_clamps_outliers(spark):
    from rainforest_spark.operators.aggregates import winsorized_stats
    vals = [10] * 98 + [1_000_000, -1_000_000]
    df = spark.createDataFrame(
        [("a", v, i) for i, v in enumerate(vals)],
        "g string, v long, id long")
    r = winsorized_stats(df, ["g"], "v", tie_col="id").collect()[0]
    # ranks: lo = ceil(5) = 5 -> 10; hi = ceil(95) = 95 -> 10
    assert (r["lo"], r["hi"], r["w_mean"]) == (10, 10, 10.0)


# --------------------------------------------------- MAD profile (q149)

def test_mad_profile_golden(spark):
    from rainforest_spark.operators.aggregates import mad_profile
    # values: 1..9 and a wild 1000 -> n=10, lower median = 5,
    # devs sorted: |1-5|..|1000-5| -> [0,1,1,2,2,3,3,4,4,995],
    # lower MAD (rank 5) = 2; outliers: dev > 6 -> just 1000
    vals = [float(v) for v in range(1, 10)] + [1000.0]
    df = spark.createDataFrame([(1, v) for v in vals], "k long, v double")
    r = mad_profile(df, ["k"], "v", mad_mult=3).collect()[0]
    assert (r["n"], r["median"], r["mad"], r["n_outliers"]) == (10, 5.0, 2.0, 1)


def test_mad_profile_constant_series(spark):
    from rainforest_spark.operators.aggregates import mad_profile
    df = spark.createDataFrame([(1, 7.5)] * 5, "k long, v double")
    r = mad_profile(df, ["k"], "v").collect()[0]
    assert (r["median"], r["mad"], r["n_outliers"]) == (7.5, 0.0, 0)


# ------------------------------------------------- session paths (q150)

def test_session_paths_golden(spark):
    from rainforest_spark.operators.aggregates import session_paths
    rows = []
    # user 1: two sessions with the same path a>b ; user 2: one c
    for uid, base in [(1, 0), (1, 10_000), (2, 0)]:
        rows.append((uid, base * 1_000_000, "a" if uid == 1 else "c",
                     len(rows)))
        if uid == 1:
            rows.append((uid, (base + 60) * 1_000_000, "b", len(rows)))
    df = spark.createDataFrame(
        rows, "user_id long, us long, event_type string, event_id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    got = {r["path"]: r["n_sessions"]
           for r in session_paths(df, "user_id", "ts", "event_type",
                                  tie_col="event_id",
                                  gap_sec=1800).collect()}
    assert got == {"a>b": 2, "c": 1}


def test_session_paths_truncates_and_ties(spark):
    from rainforest_spark.operators.aggregates import session_paths
    # 10 same-ts events, tie order by event_id; max_len=3 truncates
    rows = [(1, 0, t, i) for i, t in enumerate("abcdefghij")]
    df = spark.createDataFrame(
        rows, "user_id long, us long, event_type string, event_id long") \
        .withColumn("ts", F.timestamp_micros("us"))
    got = session_paths(df, "user_id", "ts", "event_type",
                        tie_col="event_id", gap_sec=60,
                        max_len=3).collect()
    assert [(r["path"], r["n_sessions"]) for r in got] == [("a>b>c", 1)]


# --------------------------------------------- rolling distinct (q151)

def test_rolling_distinct_matches_brute_force(spark):
    from rainforest_spark.operators.aggregates import rolling_distinct
    import random
    rng = random.Random(5)
    rows = [(rng.randrange(1, 8),
             rng.randrange(0, 30) * 86_400_000_000 + 12_345)
            for _ in range(200)]
    df = spark.createDataFrame(rows, "uid long, us long") \
        .withColumn("ts", F.timestamp_micros("us"))
    got = {r["day"]: r["n_active"]
           for r in rolling_distinct(df, "ts", "uid",
                                     window_days=7).collect()}
    days = {us // 86_400_000_000 for _, us in rows}
    want = {}
    for d in range(min(days), max(days) + 7):
        act = {u for u, us in rows
               if d - 6 <= us // 86_400_000_000 <= d}
        if act:
            want[d] = len(act)
    assert got == want


def test_rolling_distinct_dedups_within_day(spark):
    from rainforest_spark.operators.aggregates import rolling_distinct
    rows = [(1, 100), (1, 200), (1, 300)]   # one user, thrice, same day
    df = spark.createDataFrame(rows, "uid long, us long") \
        .withColumn("ts", F.timestamp_micros("us"))
    out = {r["day"]: r["n_active"]
           for r in rolling_distinct(df, "ts", "uid",
                                     window_days=2).collect()}
    assert out == {0: 1, 1: 1}


# ---------------------------------------------- survival curve (q152)

def test_survival_curve_matches_lifelines_formula(spark):
    from rainforest_spark.operators.aggregates import survival_curve
    # durations/events: classic hand example
    subj = [(6, 1), (6, 1), (6, 0), (7, 1), (10, 0), (13, 1), (16, 1)]
    df = spark.createDataFrame(subj, "duration long, event int")
    got = {r["t"]: r for r in survival_curve(df, "duration",
                                             "event").collect()}
    # manual KM
    s, want = 1.0, {}
    n = len(subj)
    from collections import Counter
    de = Counter(t for t, e in subj if e == 1)
    ce = Counter(t for t, e in subj if e == 0)
    gone = 0
    for t in sorted({t for t, _ in subj}):
        n_risk = n - gone
        d = de.get(t, 0)
        s *= (n_risk - d) / n_risk
        want[t] = (n_risk, d, ce.get(t, 0), s)
        gone += d + ce.get(t, 0)
    for t, r in got.items():
        nr, d, c, s = want[t]
        assert (r["n_risk"], r["d"], r["c"]) == (nr, d, c)
        assert r["survival"] == pytest.approx(s, abs=1e-12)
    assert set(got) == set(want)


def test_survival_curve_all_censored_stays_flat(spark):
    from rainforest_spark.operators.aggregates import survival_curve
    df = spark.createDataFrame([(3, 0), (5, 0)], "duration long, event int")
    out = survival_curve(df, "duration", "event").collect()
    assert all(r["survival"] == 1.0 for r in out)


# -------------------------------------------------- quality ops (q153-5)

def test_fd_violations_golden(spark):
    from rainforest_spark.operators.quality import fd_violations
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "x"), (3, "z")],
        "k long, v string")
    out = {r["k"]: (r["n_rows"], r["n_rhs"])
           for r in fd_violations(df, ["k"], ["v"]).collect()}
    assert out == {1: (2, 2)}


def test_integrity_audit_golden(spark):
    from rainforest_spark.operators.quality import integrity_audit
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = integrity_audit([("c->p", child, ["fk"], parent, ["pk"])]) \
        .collect()[0]
    assert (r["relation"], r["n_child"], r["n_null_fk"],
            r["n_orphans"]) == ("c->p", 4, 1, 1)


def test_benford_profile_golden(spark):
    from rainforest_spark.operators.quality import benford_profile
    # 1xx values: digit 1 x3, digit 9 x1, plus a sub-1 dropout
    df = spark.createDataFrame(
        [(123.4,), (150.0,), (199.99,), (900.1,), (0.5,)], "v double")
    out = {r["digit"]: r for r in benford_profile(df, "v").collect()}
    assert set(out) == {"1", "9"}
    assert out["1"]["n"] == 3 and out["9"]["n"] == 1
    assert out["1"]["share"] == 0.75 and out["9"]["share"] == 0.25
    import math
    assert out["1"]["benford"] == round(math.log10(2.0), 6)


# ------------------------------------------------ market basket (q156)

def test_co_occurrence_golden(spark):
    from rainforest_spark.operators.aggregates import co_occurrence
    rows = [(1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "b"),
            (4, "c")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = {(r["item_a"], r["item_b"]): r
           for r in co_occurrence(df, "b", "i", min_support=2).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    # a in 3 baskets, b in 3, pair in 3, N=4
    assert (r["n_pair"], r["n_a"], r["n_b"]) == (3, 3, 3)
    assert r["confidence"] == 1.0
    # lift = 3*4/(3*3) = 4/3 -> 1.333333 (round-half of 1333333.33)
    assert r["lift"] == 1.333333
    assert r["n_baskets_dropped"] == 0


def test_co_occurrence_max_basket_cap_is_loud(spark):
    from rainforest_spark.operators.aggregates import co_occurrence
    rows = [(1, str(i)) for i in range(10)] + [(2, "1"), (2, "2"),
                                               (3, "1"), (3, "2")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = co_occurrence(df, "b", "i", min_support=2,
                        max_basket=5).collect()
    assert all(r["n_baskets_dropped"] == 1 for r in out)
    pairs = {(r["item_a"], r["item_b"]) for r in out}
    assert pairs == {("1", "2")}   # the mega-basket no longer pairs


def test_co_occurrence_dedups_repeat_lines(spark):
    from rainforest_spark.operators.aggregates import co_occurrence
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = co_occurrence(df, "b", "i", min_support=2).collect()
    assert [(r["n_pair"], r["n_a"]) for r in out] == [(2, 2)]


# --------------------------------------------- percentile rank (q157)

def test_percentile_rank_uniform(spark):
    from rainforest_spark.operators.windows import percentile_rank
    df = spark.createDataFrame([(i, i * 10) for i in range(1, 6)],
                               "id long, v long")
    out = {r["id"]: (r["pct_rank"], r["pct"])
           for r in percentile_rank(df, "v", tie_col="id").collect()}
    assert out == {1: (1, 0.0), 2: (2, 0.25), 3: (3, 0.5),
                   4: (4, 0.75), 5: (5, 1.0)}


def test_percentile_rank_single_row(spark):
    from rainforest_spark.operators.windows import percentile_rank
    df = spark.createDataFrame([(1, 42)], "id long, v long")
    r = percentile_rank(df, "v", tie_col="id").collect()[0]
    assert (r["pct_rank"], r["pct"]) == (1, 0.0)


# ----------------------------------------------- cadence gaps (q158)

def test_cadence_gaps_golden(spark):
    from rainforest_spark.operators.quality import cadence_gaps
    # daily feed, days 0,1,2,5,6 -> modal gap 1, expected 7, missing 2
    days = [0, 1, 2, 5, 6]
    df = spark.createDataFrame(
        [(1, d * 86_400_000_000 + 7) for d in days], "k long, us long") \
        .withColumn("ts", F.timestamp_micros("us"))
    r = cadence_gaps(df, ["k"], "ts").collect()[0]
    assert (r["n_active"], r["modal_gap"], r["n_expected"],
            r["n_missing"]) == (5, 1, 7, 2)


def test_cadence_gaps_single_slot_drops_out(spark):
    from rainforest_spark.operators.quality import cadence_gaps
    df = spark.createDataFrame([(1, 123)], "k long, us long") \
        .withColumn("ts", F.timestamp_micros("us"))
    assert cadence_gaps(df, ["k"], "ts").count() == 0


# --------------------------------------------- inverted index (q159)

def test_inverted_index_golden(spark):
    from rainforest_spark.operators.text_analysis import inverted_index
    docs = [(1, "apple banana apple"), (2, "banana"), (3, "apple pear")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["term"]: r for r in inverted_index(df, "doc_id", "text",
                                                k_postings=2).collect()}
    assert out["apple"]["df"] == 2 and out["apple"]["tf_total"] == 3
    # tf desc then id asc: doc 1 (tf 2) before doc 3 (tf 1)
    assert out["apple"]["postings"] == "1:2,3:1"
    assert out["banana"]["postings"] == "1:1,2:1"
    assert out["pear"]["postings"] == "3:1"


def test_inverted_index_k_caps_postings(spark):
    from rainforest_spark.operators.text_analysis import inverted_index
    df = spark.createDataFrame([(i, "x") for i in range(10)],
                               "doc_id long, text string")
    r = inverted_index(df, "doc_id", "text", k_postings=3).collect()[0]
    assert r["df"] == 10 and r["postings"] == "0:1,1:1,2:1"
