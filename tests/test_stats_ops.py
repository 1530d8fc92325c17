"""Tests for the rank-statistics / experimentation family
(operators/stats.py) and the ranged_cumsum determinism regression the
family's rank machinery exposed."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from rainforest_spark.operators.stats import (
    ab_contrast, ks_2sample, last_touch_attribution, rank_auc,
    rfm_segments, spearman_corr, _rank,
)
from rainforest_spark.operators.windows import ranged_cumsum


# ------------------------------------------- ranged_cumsum determinism

def test_ranged_rank_consistent_on_large_double_keys(spark):
    """Regression: with repartitionByRange + spark_partition_id, the
    offsets branch and the main branch each drew SEPARATE random
    range-bound samples (no exchange reuse once column pruning
    differs), so ~87% of ranks were wrong on a >sample-size double-key
    input, varying run to run.  The literal-bounds rewrite must give
    exact 1..N ranks on every run."""
    rng = random.Random(11)
    rows = [(rng.random() * 1e5, i) for i in range(20_000)]
    df = spark.createDataFrame(rows, "v double, i long")
    for _ in range(2):
        got = _rank(df, "v", "i", "r").toPandas() \
            .sort_values(["v", "i"], ignore_index=True)
        assert (got["r"] == got.index + 1).all()


def test_ranged_cumsum_null_order_keys(spark):
    """NULL order keys must rank FIRST within their group (Spark's
    NULLS FIRST ascending order): the bounds sample excludes
    null-field keys and their comparisons fall through the CASE tree
    to partition 0 — the lowest label — so the global order is kept."""
    rng = random.Random(5)
    rows = [(("a" if i % 3 else "b"),
             (None if i % 17 == 0 else rng.randrange(10**6)), 1)
            for i in range(5_000)]
    df = spark.createDataFrame(rows, "g string, o bigint, w long")
    out = ranged_cumsum(df, "o", "w", cum_col="c", group_cols=["g"],
                        num_partitions=8).toPandas()
    for g, grp in out.groupby("g"):
        n_null = int(grp["o"].isna().sum())
        # null-order rows take exactly the ranks 1..n_null
        assert (sorted(grp.loc[grp["o"].isna(), "c"])
                == list(range(1, n_null + 1)))
        nn = grp.dropna(subset=["o"]).sort_values(["o", "c"],
                                                  ignore_index=True)
        assert (nn["c"] == nn.index + 1 + n_null).all()


def test_ranged_cumsum_grouped_large_input(spark):
    rng = random.Random(13)
    rows = [(rng.choice("abc"), rng.randrange(10**9), 1)
            for _ in range(15_000)]
    df = spark.createDataFrame(rows, "g string, k long, w long")
    out = ranged_cumsum(df, "k", "w", cum_col="c", group_cols=["g"],
                        total_col="t").toPandas()
    for g, grp in out.groupby("g"):
        grp = grp.sort_values(["k", "c"], ignore_index=True)
        assert (grp["c"] == grp.index + 1).all()
        assert (grp["t"] == len(grp)).all()


# -------------------------------------------------------- spearman

def _spearman_ref(xs, ys):
    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
        r = [0] * len(vals)
        for pos, i in enumerate(order):
            r[i] = pos + 1
        return r
    rx, ry = ranks(xs), ranks(ys)
    n = len(xs)
    s = sum((a - b) ** 2 for a, b in zip(rx, ry))
    return 1.0 - round(6 * s * 1e6 / (n * (n * n - 1))) / 1e6


def test_spearman_matches_reference(spark):
    rng = random.Random(3)
    xs = [rng.random() for _ in range(500)]
    ys = [x * 2 + rng.random() * 0.5 for x in xs]
    df = spark.createDataFrame(
        [(x, y, i) for i, (x, y) in enumerate(zip(xs, ys))],
        "x double, y double, i long")
    row = spearman_corr(df, "x", "y", "i").collect()[0]
    assert row["n"] == 500
    assert abs(row["spearman_rho"] - _spearman_ref(xs, ys)) < 2e-6
    assert row["spearman_rho"] > 0.8  # strongly monotone by design


def test_spearman_perfect_and_inverse(spark):
    df = spark.createDataFrame(
        [(float(i), float(i) * 3 + 1, i) for i in range(50)],
        "x double, y double, i long")
    assert spearman_corr(df, "x", "y", "i").collect()[0][
        "spearman_rho"] == pytest.approx(1.0, abs=1e-6)
    df2 = spark.createDataFrame(
        [(float(i), float(-i), i) for i in range(50)],
        "x double, y double, i long")
    assert spearman_corr(df2, "x", "y", "i").collect()[0][
        "spearman_rho"] == pytest.approx(-1.0, abs=1e-6)


# ------------------------------------------------------------- auc

def test_rank_auc_matches_brute_force(spark):
    rng = random.Random(5)
    rows = [(rng.random() + (0.3 if rng.random() < 0.5 else 0.0), i)
            for i in range(400)]
    data = [(v, 1 if v > 0.8 else 0, i) for v, i in rows]
    df = spark.createDataFrame(data, "v double, l int, i long")
    row = rank_auc(df, "v", "l", "i").collect()[0]
    pos = [v for v, l, _ in data if l == 1]
    neg = [v for v, l, _ in data if l == 0]
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    # row_number tie-break by id: ties split by id order; with distinct
    # doubles ties are absent and AUC is the exact win fraction
    assert ties == 0
    want = round(wins * 1e6 / (len(pos) * len(neg))) / 1e6
    assert row["auc"] == pytest.approx(want, abs=1e-9)
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)


def test_rank_auc_separable_is_one(spark):
    data = [(float(i), 1 if i >= 50 else 0, i) for i in range(100)]
    df = spark.createDataFrame(data, "v double, l int, i long")
    assert rank_auc(df, "v", "l", "i").collect()[0]["auc"] == 1.0


# -------------------------------------------------------------- ks

def _ks_ref(a, b):
    vals = sorted(set(a) | set(b))
    na, nb, best = len(a), len(b), 0
    for v in vals:
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for x in b if x <= v)
        best = max(best, abs(fa * nb - fb * na))
    return best / (na * nb)


def test_ks_matches_brute_force(spark):
    rng = random.Random(9)
    a = [rng.gauss(0, 1) for _ in range(300)]
    b = [rng.gauss(0.5, 1.2) for _ in range(200)]
    rows = [(v, 1) for v in a] + [(v, 0) for v in b]
    df = spark.createDataFrame(rows, "v double, g int")
    row = ks_2sample(df, "v", (F.col("g") == 1)).collect()[0]
    want = _ks_ref(a, b)
    assert row["n_a"] == 300 and row["n_b"] == 200
    assert abs(row["ks_d"] - want) < 2e-6


def test_ks_identical_samples_zero(spark):
    vals = [float(i % 17) for i in range(200)]
    rows = [(v, i % 2) for i, v in enumerate(vals)]
    # both groups see the same multiset of values
    df = spark.createDataFrame(
        [(v, 1) for v in vals] + [(v, 0) for v in vals],
        "v double, g int")
    assert ks_2sample(df, "v", (F.col("g") == 1)) \
        .collect()[0]["ks_d"] == 0.0


# -------------------------------------------------------------- a/b

def test_ab_contrast_counts_and_chi2(spark):
    # arm 1: 30 of 100 convert; arm 0: 10 of 100 convert
    rows = ([(i, 1, 1 if i < 30 else 0) for i in range(100)]
            + [(1000 + i, 0, 1 if i < 10 else 0) for i in range(100)])
    df = spark.createDataFrame(rows, "u long, a int, o int")
    row = ab_contrast(df, "u", "a", "o").collect()[0]
    assert (row["n_t"], row["conv_t"], row["n_c"], row["conv_c"]) \
        == (100, 30, 100, 10)
    assert row["rate_t"] == 0.3 and row["rate_c"] == 0.1
    assert row["lift"] == 3.0
    # scipy-free reference: chi2 = N(ad-bc)^2 / row/col products
    want = 200 * (30 * 90 - 10 * 70) ** 2 / (100 * 100 * 40 * 160)
    assert row["chi2"] == pytest.approx(want, abs=1e-6)


def test_ab_contrast_degenerate_margin_is_null(spark):
    rows = [(i, i % 2, 1) for i in range(50)]  # everyone converts
    df = spark.createDataFrame(rows, "u long, a int, o int")
    row = ab_contrast(df, "u", "a", "o").collect()[0]
    assert row["chi2"] is None


# -------------------------------------------------------------- rfm

def test_rfm_segments_shape_and_extremes(spark):
    base = 1_700_000_000
    rows = []
    for u in range(20):
        for k in range(u + 1):  # user u has u+1 events
            rows.append((u, base + u * 86_400 + k, float(u) * 10))
    df = spark.createDataFrame(rows, "u long, sec long, val double") \
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
    out = {r["unit"]: r for r in
           rfm_segments(df, "u", "ts", "val").collect()}
    assert len(out) == 20
    # user 19: most recent, most frequent, highest value -> 5-5-5
    assert out[19]["segment"] == "5-5-5"
    assert out[0]["recency_days"] == 19
    assert out[0]["segment"] == "1-1-1"
    for r in out.values():
        assert 1 <= r["r_score"] <= 5
        assert r["segment"] == \
            f'{r["r_score"]}-{r["f_score"]}-{r["m_score"]}'


# ------------------------------------------------------ attribution

def test_last_touch_attribution_golden(spark):
    base = 1_700_000_000
    rows = [
        # u1: click then purchase within window -> click
        (1, base, 1, "click", 0.0),
        (1, base + 100, 2, "purchase", 10.0),
        # u1: second purchase still credits the same click
        (1, base + 200, 3, "purchase", 5.0),
        # u2: view 8 days before purchase -> outside window -> direct
        (2, base, 4, "view", 0.0),
        (2, base + 8 * 86_400, 5, "purchase", 7.0),
        # u3: purchase with no preceding touch -> direct
        (3, base, 6, "purchase", 1.0),
        # u4: view then click -> last touch wins
        (4, base, 7, "view", 0.0),
        (4, base + 10, 8, "click", 0.0),
        (4, base + 20, 9, "purchase", 2.0),
    ]
    df = spark.createDataFrame(rows, "u long, sec long, i long,"
                               " ty string, val double") \
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = {r["channel"]: (r["n_conversions"], r["revenue"])
           for r in last_touch_attribution(
               df, "u", "ts", "i", "ty", "purchase",
               ["click", "view"], "val").collect()}
    assert got == {"click": (3, 17.0), "direct": (2, 8.0)}


def test_attribution_conversion_never_self_credits(spark):
    # purchase at the same timestamp as a touch with a smaller tie id
    # credits it; a purchase alone never credits itself
    df = spark.createDataFrame(
        [(1, 100, 1, "purchase", 3.0), (1, 100, 2, "purchase", 4.0)],
        "u long, sec long, i long, ty string, val double") \
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
    got = last_touch_attribution(df, "u", "ts", "i", "ty", "purchase",
                                 ["click"], "val").collect()
    assert {r["channel"] for r in got} == {"direct"}


# ----------------------------------------------------------- lead-lag

def test_lead_lag_detects_shift(spark):
    # series B = series A shifted +2 slots: r at lag +2 must be ~1
    base = 1_700_000_000
    rows = []
    import random as _r
    rng = _r.Random(21)
    counts = [rng.randrange(1, 50) for _ in range(30)]
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((base + d * 86_400, "a"))
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((base + (d + 2) * 86_400, "b"))
    df = spark.createDataFrame(rows, "sec long, k string") \
        .withColumn("ts", F.timestamp_seconds(F.col("sec")))
    from rainforest_spark.operators.stats import lead_lag_corr
    out = {r["lag"]: r for r in lead_lag_corr(
        df, "ts", F.when(F.col("k") == "a", 1).otherwise(0),
        F.when(F.col("k") == "b", 1).otherwise(0)).collect()}
    assert out[2]["r"] == pytest.approx(1.0, abs=1e-6)
    # slots 0..31 all exist (zero-count sides included); lag +2 pairs
    # s in 0..29, lag -3 pairs s in 3..31
    assert out[2]["n_slots"] == 30
    assert out[-3]["n_slots"] == 29


# ----------------------------------------------------------- triangles

def _tri_ref(edges):
    adj = {}
    es = set()
    for u, v in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in es:
        tri += len(adj[a] & adj[b])
    tri //= 3
    wed = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    return len(adj), len(es), tri, wed


def test_triangle_census_matches_brute_force(spark):
    import random as _r
    rng = _r.Random(31)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(400)]
    from rainforest_spark.operators.graph import triangle_census
    df = spark.createDataFrame(edges, "s long, t long")
    row = triangle_census(df, "s", "t").collect()[0]
    n, m, tri, wed = _tri_ref(edges)
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"],
            row["n_wedges"]) == (n, m, tri, wed)
    assert row["clustering_coeff"] == pytest.approx(
        3 * tri / wed, abs=1e-6)


def test_triangle_census_known_graphs(spark):
    from rainforest_spark.operators.graph import triangle_census
    # K4: 4 triangles, 12 wedges, coeff 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = triangle_census(
        spark.createDataFrame(k4, "s long, t long"), "s", "t") \
        .collect()[0]
    assert (row["n_triangles"], row["n_wedges"]) == (4, 12)
    assert row["clustering_coeff"] == 1.0
    # star graph: no triangles, C(5,2) wedges at the hub
    star = [(0, i) for i in range(1, 6)]
    row = triangle_census(
        spark.createDataFrame(star, "s long, t long"), "s", "t") \
        .collect()[0]
    assert (row["n_triangles"], row["n_wedges"]) == (0, 10)
    assert row["clustering_coeff"] == 0.0


# ----------------------------------------------------- ranged_cummin

def test_ranged_cummin_matches_brute_force(spark):
    from rainforest_spark.operators.windows import ranged_cummin
    rng = random.Random(21)
    rows = [(i, rng.randrange(10**6), rng.randrange(-500, 500))
            for i in range(8_000)]
    df = spark.createDataFrame(rows, "i long, o long, v long")
    # distinct order keys for prev_col determinism: collapse first
    dim = df.groupBy("o").agg(F.min("v").alias("v"))
    out = {r["o"]: (r["c"], r["p"]) for r in
           ranged_cummin(dim, "o", "v", cum_col="c", prev_col="p",
                         num_partitions=8).collect()}
    ref = sorted(((o, v) for o, v in
                  ((r["o"], r["v"]) for r in dim.collect())))
    run = None
    for o, v in ref:
        c, p = out[o]
        assert p == run, o
        run = v if run is None else min(run, v)
        assert c == run, o


def test_ranged_cummin_grouped(spark):
    from rainforest_spark.operators.windows import ranged_cummin
    rng = random.Random(22)
    rows = [(rng.choice("ab"), i, rng.randrange(-100, 100))
            for i in range(2_000)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    out = ranged_cummin(df, "o", "v", cum_col="c", group_cols=["g"],
                        num_partitions=8).toPandas()
    for g, grp in out.groupby("g"):
        grp = grp.sort_values("o", ignore_index=True)
        assert (grp["c"] == grp["v"].cummin()).all(), g


# ---------------------------------------------------- pareto frontier

def test_pareto_frontier_matches_brute_force(spark):
    from rainforest_spark.operators.stats import pareto_frontier
    rng = random.Random(23)
    rows = [(i, rng.randrange(50), rng.randrange(1000))
            for i in range(3_000)]
    df = spark.createDataFrame(rows, "i long, x long, y long")
    got = sorted(r["i"] for r in
                 pareto_frontier(df, "x", "y").collect())
    want = sorted(
        i for i, x, y in rows
        if not any((qx <= x and qy <= y and (qx < x or qy < y))
                   for _, qx, qy in rows))
    assert got == want


def test_pareto_frontier_keeps_duplicate_points(spark):
    from rainforest_spark.operators.stats import pareto_frontier
    df = spark.createDataFrame(
        [(1, 1, 5), (2, 1, 5), (3, 2, 9)], "i long, x long, y long")
    got = sorted(r["i"] for r in
                 pareto_frontier(df, "x", "y").collect())
    assert got == [1, 2]   # the two equal points survive, (2,9) is
    # dominated by (1,5)


# ------------------------------------------------------- jackknife

def test_jackknife_mean_matches_python_reference(spark):
    from rainforest_spark.operators.stats import jackknife_mean
    rng = random.Random(24)
    rows = [(rng.choice("abcde"), float(rng.randrange(100, 5000)))
            for _ in range(1_000)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in
           jackknife_mean(df, "g", "v").collect()}
    import collections
    by = collections.defaultdict(list)
    for g, v in rows:
        by[g].append(int(v * 1e6))     # values integral at 1e6 scale
    N = sum(len(v) for v in by.values())
    S = sum(sum(v) for v in by.values())
    G = len(by)
    loos = {}
    for g, vs in by.items():
        num, den = S - sum(vs), N - len(vs)
        loos[g] = (2 * num + den - (2 * num + den) % (2 * den)) \
            // (2 * den)
    sl = sum(loos.values())
    sd2 = sum((G * lm - sl) ** 2 for lm in loos.values())
    se = round(math.sqrt(sd2 * (G - 1) / G ** 3 / 1e12), 6)
    for g, lm in loos.items():
        assert out[g]["loo_mean"] == lm / 1e6
        assert out[g]["jk_se"] == se


# ------------------------------------------------------------ CUPED

def test_cuped_matches_python_reference(spark):
    from rainforest_spark.operators.stats import cuped_contrast
    rng = random.Random(27)
    rows = []
    for u in range(200):
        arm = u % 2
        x = rng.uniform(0, 100)                      # covariate signal
        y = 0.5 * x + rng.uniform(0, 10) + arm * 2.0
        rows.append((u, arm, round(y, 3), round(x, 3)))
    df = spark.createDataFrame(rows, "u long, a int, y double, x double")
    got = {r["arm"]: r for r in
           cuped_contrast(df, "u", "a", "y", "x").collect()}
    ys = {u: math.floor(y * 1e6 + 0.5) for u, _, y, _ in rows}
    xs = {u: math.floor(x * 1e6 + 0.5) for u, _, _, x in rows}
    n = len(rows)
    sx, sy = sum(xs.values()), sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in xs)
    sxx = sum(xs[u] * xs[u] for u in xs)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    for arm in (0, 1):
        us = [u for u, a, _, _ in rows if a == arm]
        na = len(us)
        sya = sum(ys[u] for u in us)
        sxa = sum(xs[u] for u in us)
        adj = round((sya / na - theta * (sxa / na - xbar)) / 1e6, 6)
        assert got[arm]["n_units"] == na
        assert got[arm]["adj_mean"] == adj, arm
        assert got[arm]["theta"] == round(theta, 6)
    # the adjustment must preserve the treatment effect direction and
    # shrink the covariate-driven gap toward the true +2.0 lift
    lift_adj = got[1]["adj_mean"] - got[0]["adj_mean"]
    assert 1.0 < lift_adj < 3.0


def test_cuped_zero_variance_covariate_falls_back(spark):
    from rainforest_spark.operators.stats import cuped_contrast
    rows = [(u, u % 2, float(u), 7.0) for u in range(20)]
    df = spark.createDataFrame(rows, "u long, a int, y double, x double")
    got = {r["arm"]: r for r in
           cuped_contrast(df, "u", "a", "y", "x").collect()}
    for arm in (0, 1):
        assert got[arm]["theta"] is None
        assert got[arm]["adj_mean"] == round(
            sum(float(u) for u in range(arm, 20, 2)) / 10, 6)


# ------------------------------------------------------ Wilson CI

def test_proportion_ci_matches_python_reference(spark):
    from rainforest_spark.operators.stats import proportion_ci
    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 3 + \
           [("b", 0)] * 1
    df = spark.createDataFrame(rows, "g string, s int")
    got = {r["g"]: r for r in
           proportion_ci(df, ["g"], (F.col("s") == 1), z=2).collect()}

    def wilson(k, n, z=2):
        p = k / n
        c = p + z * z / (2 * n)
        h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        d = 1 + z * z / n
        return round((c - h) / d, 6), round((c + h) / d, 6)

    for g, (k, n) in {"a": (30, 100), "b": (3, 4)}.items():
        lo, hi = wilson(k, n)
        assert (got[g]["n"], got[g]["k"]) == (n, k)
        assert got[g]["ci_lo"] == lo and got[g]["ci_hi"] == hi
        assert 0.0 <= got[g]["ci_lo"] <= got[g]["rate"] \
            <= got[g]["ci_hi"] <= 1.0


def test_proportion_ci_extremes_stay_in_unit_interval(spark):
    from rainforest_spark.operators.stats import proportion_ci
    df = spark.createDataFrame(
        [("all", 1)] * 5 + [("none", 0)] * 5, "g string, s int")
    got = {r["g"]: r for r in
           proportion_ci(df, ["g"], (F.col("s") == 1)).collect()}
    assert got["all"]["rate"] == 1.0 and got["all"]["ci_hi"] <= 1.0
    assert got["none"]["rate"] == 0.0 and got["none"]["ci_lo"] >= 0.0
    assert got["all"]["ci_lo"] < 1.0      # the Wilson shrink
    assert got["none"]["ci_hi"] > 0.0


# -------------------------------------------- grid-density clustering

def test_grid_density_clusters_matches_union_find(spark):
    from rainforest_spark.operators.graph import grid_density_clusters
    rng = random.Random(37)
    pts = [(i, rng.randrange(10**6), rng.randrange(10**6))
           for i in range(1_200)]
    cell, minp = 50_000, 4
    df = spark.createDataFrame(pts, "i long, x long, y long")
    got = {r["i"]: r["cluster_id"] for r in
           grid_density_clusters(df, "x", "y", ["i"], cell=cell,
                                 min_pts=minp).collect()}
    import collections
    cnt = collections.Counter((x // cell, y // cell) for _, x, y in pts)
    dense = {k for k, v in cnt.items() if v >= minp}
    par = {}

    def find(a):
        while par.setdefault(a, a) != a:
            par[a] = par[par[a]]
            a = par[a]
        return a

    for (cx, cy) in dense:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nb = (cx + dx, cy + dy)
                if nb in dense and nb != (cx, cy):
                    ra, rb = find((cx, cy)), find(nb)
                    if ra != rb:
                        par[ra] = rb
    comp = collections.defaultdict(list)
    for k in dense:
        comp[find(k)].append(k)
    want_label = {}
    for members in comp.values():
        lab = min(cx * 4294967296 + cy for cx, cy in members)
        for m in members:
            want_label[m] = lab
    for i, x, y in pts:
        c = (x // cell, y // cell)
        assert got[i] == want_label.get(c), (i, c)


def test_grid_density_clusters_noise_is_null_not_dropped(spark):
    from rainforest_spark.operators.graph import grid_density_clusters
    # 4 points in one cell (dense at min_pts=4), 1 far-away point
    pts = [(1, 10, 10), (2, 20, 20), (3, 30, 30), (4, 40, 40),
           (5, 900_000, 900_000)]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    got = {r["i"]: r["cluster_id"] for r in
           grid_density_clusters(df, "x", "y", ["i"], cell=100,
                                 min_pts=4).collect()}
    assert len(got) == 5
    assert got[5] is None
    assert got[1] == got[2] == got[3] == got[4] == 0


# ----------------------------------------------------- entropy profile

def test_entropy_profile_matches_python_reference(spark):
    from rainforest_spark.operators.stats import entropy_profile
    rng = random.Random(41)
    rows = [(rng.choice("abc"), rng.choice(["x", "y", "y", "z", None]))
            for _ in range(600)]
    df = spark.createDataFrame(rows, "g string, h string")
    got = {r["column"]: r for r in
           entropy_profile(df, ["g", "h"]).collect()}
    import collections
    for col, idx in (("g", 0), ("h", 1)):
        cnt = collections.Counter(str(r[idx]) if r[idx] is not None
                                  else None for r in rows)
        t = sum(cnt.values())
        nanos = sum(math.floor(-(c / t) * math.log(c / t) * 1e9 + 0.5)
                    for c in cnt.values())
        assert got[col]["n_rows"] == t
        assert got[col]["n_distinct"] == len(cnt)
        assert got[col]["entropy_nats"] == nanos / 1e9
        assert got[col]["normalized_entropy"] == round(
            (nanos / 1e9) / math.log(len(cnt)), 6)


def test_entropy_profile_uniform_is_one_constant_is_zero(spark):
    from rainforest_spark.operators.stats import entropy_profile
    rows = [(str(i % 4), "same") for i in range(400)]
    df = spark.createDataFrame(rows, "u string, c string")
    got = {r["column"]: r for r in
           entropy_profile(df, ["u", "c"]).collect()}
    assert got["u"]["normalized_entropy"] == 1.0
    assert got["c"]["entropy_nats"] == 0.0
    assert got["c"]["normalized_entropy"] is None


# ------------------- round-8: calibration / kappa / gains / MI family

def test_calibration_curve_matches_python(spark):
    rng = random.Random(5)
    rows = [(rng.random(), rng.random() < 0.5) for _ in range(800)]
    rows += [(1.0, True), (-0.2, True), (1.4, False)]   # edges
    df = spark.createDataFrame(rows, "s double, l boolean")
    from rainforest_spark.operators.stats import calibration_curve
    got = {r["bin"]: r for r in
           calibration_curve(df, "s", "l", n_bins=10).collect()}
    import collections
    want = collections.defaultdict(lambda: [0, 0, 0])
    for s, l in rows:
        if not (0.0 <= s <= 1.0):
            continue
        b = min(int(s * 10), 9)
        want[b][0] += 1
        want[b][1] += int(l)
        want[b][2] += math.floor(s * 1e9 + 0.5)
    assert set(got) == set(want)
    for b, (n, npos, ssn) in want.items():
        r = got[b]
        assert (r["n"], r["n_pos"]) == (n, npos)
        assert r["mean_score"] == ((2 * ssn + n) // (2 * n)) / 1e9
        assert r["frac_pos"] == ((2_000_000 * npos + n) // (2 * n)) / 1e6
        assert r["gap"] == round(r["frac_pos"] - r["mean_score"], 6)


def test_cohens_kappa_matches_formula(spark):
    rng = random.Random(7)
    cats = ["x", "y", "z"]
    rows = [(rng.choice(cats),
             rng.choice(cats) if rng.random() < 0.6 else None)
            for _ in range(500)]
    df = spark.createDataFrame(rows, "a string, b string")
    from rainforest_spark.operators.stats import cohens_kappa
    r = cohens_kappa(df, "a", "b").collect()[0]
    n = len(rows)
    norm = [(a, b if b is not None else "__null__") for a, b in rows]
    agree = sum(a == b for a, b in norm)
    from collections import Counter
    ra, cb = Counter(a for a, _ in norm), Counter(b for _, b in norm)
    pe_num = sum(ra[k] * cb.get(k, 0) for k in ra)
    po = ((2_000_000 * agree + n) // (2 * n)) / 1e6
    pe = ((2_000_000 * pe_num + n * n) // (2 * n * n)) / 1e6
    assert (r["n"], r["n_agree"]) == (n, agree)
    assert (r["po"], r["pe"]) == (po, pe)
    assert r["kappa"] == round((po - pe) / (1.0 - pe), 6)


def test_cohens_kappa_degenerate_single_category(spark):
    df = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    from rainforest_spark.operators.stats import cohens_kappa
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None


def test_cumulative_gains_matches_python(spark):
    rng = random.Random(9)
    rows = [(rng.random(), rng.random() < 0.3, i)
            for i in range(730)]
    df = spark.createDataFrame(rows, "s double, l boolean, t long")
    from rainforest_spark.operators.stats import cumulative_gains
    got = cumulative_gains(df, "s", "l", "t", n_buckets=10).collect()
    srt = sorted(rows, key=lambda r: (r[0], r[2]))   # ascending rank
    N = len(srt)
    import collections
    agg = collections.defaultdict(lambda: [0, 0])
    for r0, (s, l, t) in enumerate(srt, start=1):
        b = ((N - r0) * 10) // N + 1
        agg[b][0] += 1
        agg[b][1] += int(l)
    tp = sum(v[1] for v in agg.values())
    cum_n = cum_p = 0
    want = {}
    for b in sorted(agg):
        cum_n += agg[b][0]
        cum_p += agg[b][1]
        gain = ((2_000_000 * cum_p + tp) // (2 * tp)) / 1e6
        lift = ((2_000_000 * cum_p * N + cum_n * tp)
                // (2 * cum_n * tp)) / 1e6
        want[b] = (agg[b][0], agg[b][1], cum_n, cum_p, gain, lift)
    assert {r["bucket"]: (r["n"], r["n_pos"], r["cum_n"], r["cum_pos"],
                          r["gain"], r["lift"]) for r in got} == want
    # the top bucket must over-capture when scores correlate: here the
    # label is independent, so lift ~1; just check monotone cum fields
    lifts = [r["lift"] for r in got]
    assert len(lifts) == 10


def test_cumulative_gains_no_positives(spark):
    df = spark.createDataFrame([(0.1 * i, False, i) for i in range(20)],
                               "s double, l boolean, t long")
    from rainforest_spark.operators.stats import cumulative_gains
    got = cumulative_gains(df, "s", "l", "t", n_buckets=4).collect()
    assert all(r["gain"] is None and r["lift"] is None for r in got)


def test_mutual_information_dependence_and_independence(spark):
    from rainforest_spark.operators.stats import mutual_information
    # perfect dependence: b = a -> MI = H(A), NMI = 1
    rows = [(c, c) for c in "xxyyzz" * 50]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["nmi"] == pytest.approx(1.0, abs=1e-6)
    assert r["mi_nats"] == pytest.approx(r["h_a"], abs=1e-6)
    assert r["h_a"] == pytest.approx(math.log(3), abs=1e-6)
    # independence: uniform product grid -> MI = 0
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["mi_nats"] == pytest.approx(0.0, abs=1e-6)
    # constant column: H = 0 -> NMI undefined
    df = spark.createDataFrame([("k", v) for v in "uv" * 10],
                               "a string, b string")
    r = mutual_information(df, "a", "b").collect()[0]
    assert r["h_a"] == 0.0 and r["nmi"] is None


def test_mutual_information_matches_python(spark):
    rng = random.Random(3)
    rows = [(rng.choice("abc"), rng.choice("uvw")) for _ in range(400)]
    df = spark.createDataFrame(rows, "a string, b string")
    from rainforest_spark.operators.stats import mutual_information
    r = mutual_information(df, "a", "b").collect()[0]
    from collections import Counter
    n = len(rows)
    j, ra, cb = Counter(rows), Counter(a for a, _ in rows), \
        Counter(b for _, b in rows)
    mi = sum(math.floor((c / n) * math.log(c * n / (ra[a] * cb[b]))
                        * 1e9 + 0.5) for (a, b), c in j.items()) / 1e9
    ha = sum(math.floor(-(c / n) * math.log(c / n) * 1e9 + 0.5)
             for c in ra.values()) / 1e9
    assert r["mi_nats"] == pytest.approx(mi, abs=1e-9)
    assert r["h_a"] == pytest.approx(ha, abs=1e-9)
    assert r["n"] == n


def test_cli_audit_end_to_end(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    src = str(tmp_path / "in.parquet")
    spark.createDataFrame([("x", "x"), ("x", "x"), ("y", "y"),
                           ("y", "x")], "a string, b string") \
        .write.parquet(src)
    r = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "audit", src,
         "--col-a", "a", "--col-b", "b"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rep = _json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["n"] == 4
    assert rep["kappa"]["po"] == 0.75
    assert rep["entropy"]["a"]["n_distinct"] == 2
    assert rep["mutual_information"]["nats"] > 0
