"""Expression-only HyperLogLog sketch (operators/sketches.py):
register determinism, merge algebra, estimator accuracy, and the
incremental-maintenance composition."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rainforest_spark.operators.sketches import (
    hll_accuracy_report, hll_estimate, hll_registers,
)


def _vals(spark, lo, hi, col="v"):
    return spark.range(lo, hi).select(
        F.concat(F.lit("user-"), F.col("id")).alias(col))


def test_union_of_sketches_equals_sketch_of_union(spark):
    a = _vals(spark, 0, 6000)
    b = _vals(spark, 4000, 10000)          # overlapping halves
    whole = a.unionByName(b)
    ra, rb = hll_registers(a, "v"), hll_registers(b, "v")
    merged = (ra.unionByName(rb).groupBy("register")
              .agg(F.max("rho").alias("rho")))
    direct = hll_registers(whole, "v")
    got = {r["register"]: r["rho"] for r in merged.collect()}
    want = {r["register"]: r["rho"] for r in direct.collect()}
    assert got == want
    # and therefore identical estimates
    e1 = hll_estimate(merged).collect()[0]
    e2 = hll_estimate(direct).collect()[0]
    assert e1.asDict() == e2.asDict()


def test_estimator_accuracy_and_small_range_correction(spark):
    # large cardinality: raw HLL path, expect ~1.04/sqrt(m) sigma
    rep = hll_accuracy_report(_vals(spark, 0, 20000), "v").collect()[0]
    assert rep["n_exact"] == 20000
    assert abs(rep["rel_error"]) < 0.25    # ~4 sigma at m=256
    # small cardinality: linear-counting branch, much tighter
    rep = hll_accuracy_report(_vals(spark, 0, 50), "v").collect()[0]
    assert rep["n_exact"] == 50 and rep["v_zero"] > 0
    assert abs(rep["estimate"] - 50) <= 5
    # the correction fired: estimate == m * ln(m / v_zero) on the grid
    want = round(256.0 * math.log(256.0 / rep["v_zero"]), 6)
    assert rep["estimate"] == want


def test_registers_deterministic_and_null_skipped(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), (None,)], "v string")
    r1 = sorted((r["register"], r["rho"]) for r in
                hll_registers(df, "v").collect())
    r2 = sorted((r["register"], r["rho"]) for r in
                hll_registers(df, "v").collect())
    assert r1 == r2 and len(r1) == 2       # a+b only, dup collapsed


def test_grouped_report_matches_per_group_exact(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("u"), (F.col("id") % 700)).alias("v"))
    rows = {r["g"]: r for r in
            hll_accuracy_report(df, "v", ["g"]).collect()}
    assert set(rows) == {"0", "1", "2"}
    for g, r in rows.items():
        assert abs(r["rel_error"]) < 0.25


def test_incremental_maintenance_composition(spark, tmp_path):
    # registers maintained through the versioned store's algebraic
    # max-fold equal the one-shot sketch — the "never rescan history"
    # distinct-count rollup
    from rainforest_spark.sources.incremental import (
        incremental_agg, read_agg,
    )
    store = str(tmp_path / "hll")
    batches = [(0, 4000), (3000, 7000), (6000, 9000)]
    for lo, hi in batches:
        regs = hll_registers(_vals(spark, lo, hi), "v")
        incremental_agg(spark, store, regs, ["register"],
                        {"rho": ("max", "rho")})
    maintained = read_agg(spark, store)
    direct = hll_registers(_vals(spark, 0, 9000), "v")
    got = {r["register"]: r["rho"] for r in maintained.collect()}
    want = {r["register"]: r["rho"] for r in direct.collect()}
    assert got == want
    e = hll_estimate(maintained).collect()[0]
    assert abs(e["estimate"] - 9000) / 9000 < 0.25


# ------------------------------------------------------ Bloom filter

def test_bloom_no_false_negatives_and_fp_bound(spark):
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        bloom_bits, bloom_fp_report, bloom_membership,
    )
    corpus = _vals(spark, 0, 2000)
    probes = _vals(spark, 0, 8000)
    rep = bloom_fp_report(corpus, probes, "v",
                          m_bits=65536, k=4).collect()[0]
    assert rep["no_false_negatives"] is True
    assert (rep["n_probes"], rep["n_present"], rep["n_absent"]) \
        == (8000, 2000, 6000)
    # kn/m = 0.122 -> expected fpr ~ 8e-6; allow generous slack
    assert rep["false_positives"] <= 10
    assert 0 < rep["fp_expected"] < 0.001
    # membership: every corpus value flagged, a definite-absent exists
    bits = bloom_bits(corpus, "v", 65536, 4)
    mem = {r["v"]: r["maybe_present"] for r in
           bloom_membership(bits, probes, "v", 65536, 4).collect()}
    assert all(mem[f"user-{i}"] for i in range(0, 2000, 97))
    assert not all(mem[f"user-{i}"] for i in range(2000, 8000, 97))


def test_bloom_membership_duplicate_probe_rows_no_false_negative(spark):
    """The r8 ADVICE false negative: duplicate probe rows collapse
    into ONE group under the per-probe groupBy, so a hit-sum-==-k test
    reads 2k hits as 'absent'.  Membership must be min(hit)==1 —
    duplicated present values stay maybe_present=true (the zero-FN
    contract), duplicated absent values stay deterministic."""
    from rainforest_spark.operators.sketches import (
        bloom_bits, bloom_membership,
    )
    corpus = _vals(spark, 0, 200)
    bits = bloom_bits(corpus, "v", 65536, 4)
    # every probe row duplicated 3x — the ingest-gate shape
    probes = spark.createDataFrame(
        [(f"user-{i}",) for i in (0, 7, 150, 5000, 6001)] * 3,
        "v string")
    mem = {r["v"]: r["maybe_present"] for r in
           bloom_membership(bits, probes, "v", 65536, 4).collect()}
    assert mem["user-0"] and mem["user-7"] and mem["user-150"]
    # kn/m tiny -> absent values read definitively absent here
    assert not mem["user-5000"] and not mem["user-6001"]


def test_bloom_bits_merge_is_union(spark):
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import bloom_bits
    a, b = _vals(spark, 0, 500), _vals(spark, 300, 900)
    merged = sorted(r["bit"] for r in
                    bloom_bits(a, "v").unionByName(bloom_bits(b, "v"))
                    .distinct().collect())
    direct = sorted(r["bit"] for r in
                    bloom_bits(a.unionByName(b), "v").collect())
    assert merged == direct


def test_bloom_slab0_bit_identical_to_flat(spark):
    """Legacy-upgrade contract: slab 0 of the scalable family is the
    flat bloom_bits filter bit-for-bit (same salts, same modulus, no
    extra hash) — a flat store's rows simply ARE slab 0."""
    from rainforest_spark.operators.sketches import (
        bloom_bits, bloom_bits_slab,
    )
    d = _vals(spark, 0, 400)
    flat = sorted(r["bit"] for r in
                  bloom_bits(d, "v", 4096, 4).collect())
    s0 = bloom_bits_slab(d, "v", 4096, 4, slab=0).collect()
    assert all(r["slab"] == 0 for r in s0)
    assert sorted(r["bit"] for r in s0) == flat


def test_bloom_slab_params_double_and_add_hash():
    from rainforest_spark.operators.sketches import bloom_slab_params
    assert bloom_slab_params(4096, 4, 0) == (4096, 4)
    assert bloom_slab_params(4096, 4, 1) == (8192, 5)
    assert bloom_slab_params(4096, 4, 3) == (32768, 7)


def test_bloom_slabbed_membership_no_fn_and_fp_bounded(spark):
    """Scalable-Bloom probe: values committed into EITHER slab read
    maybe_present=true (zero false negatives across slabs); absent
    probes stay bounded by the telescoping 2·0.5^k budget even with
    both slabs near their 50 % freeze point."""
    from rainforest_spark.operators.sketches import (
        bloom_bits_slab, bloom_membership_rowwise_slabs,
        bloom_slab_params,
    )
    m, k = 256, 4
    a = _vals(spark, 0, 44)          # slab 0 (capacity ln2·256/4 ≈ 44)
    b = _vals(spark, 44, 115)        # slab 1 (capacity ln2·512/5 ≈ 71)
    bits = (bloom_bits_slab(a, "v", m, k, slab=0)
            .unionByName(bloom_bits_slab(b, "v", m, k, slab=1)))
    # occupancy sanity: each slab at/below its freeze point
    per = {r["slab"]: r["n"] for r in
           bits.groupBy("slab").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    for s in (0, 1):
        m_s, _ = bloom_slab_params(m, k, s)
        assert per[s] <= 0.55 * m_s
    probes = _vals(spark, 0, 2115)   # 115 present + 2000 absent
    mem = {r["v"]: r["maybe_present"] for r in
           bloom_membership_rowwise_slabs(
               bits, probes, "v", m, k, slabs=[0, 1]).collect()}
    assert all(mem[f"user-{i}"] for i in range(115))   # zero FN
    fp = sum(mem[f"user-{i}"] for i in range(115, 2115))
    # budget 2·0.5^4 = 12.5 % of 2000 = 250; generous slack for the
    # small-m variance
    assert fp <= 400
    # empty slab list: everything definitely new
    empty = spark.createDataFrame([], "slab int, bit int")
    mem0 = bloom_membership_rowwise_slabs(
        empty, probes.limit(5), "v", m, k, slabs=[])
    assert all(not r["maybe_present"] for r in mem0.collect())


# --------------------------------------------------------- count-min

def test_cms_never_undercounts_and_merge_is_sum(spark):
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        cms_counters, cms_point_estimates,
    )
    import random as _r
    rng = _r.Random(21)
    # Zipf-ish stream: value i appears ~3000/i times
    rows = [(f"t{i}",) for i in range(1, 60) for _ in range(3000 // i)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "v string")
    counters = cms_counters(df, "v", width=512, depth=4)
    from collections import Counter
    true = Counter(v for v, in rows)
    qdf = spark.createDataFrame([(k,) for k in true], "v string")
    est = {r["v"]: r["est"] for r in
           cms_point_estimates(counters, qdf, "v", 512, 4).collect()}
    n = len(rows)
    for k, t in true.items():
        assert est[k] >= t                       # one-sided guarantee
        assert est[k] - t <= 0.05 * n            # eps*N slack (e/512)
    # merge algebra: sum of half-sketches == sketch of the whole
    a = spark.createDataFrame(rows[: len(rows) // 2], "v string")
    b = spark.createDataFrame(rows[len(rows) // 2:], "v string")
    merged = (cms_counters(a, "v", 512, 4)
              .unionByName(cms_counters(b, "v", 512, 4))
              .groupBy("row", "bucket").agg(F.sum("c").alias("c")))
    got = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    want = {(r["row"], r["bucket"]): r["c"] for r in counters.collect()}
    assert got == want


def test_cms_weighted_counts(spark):
    from rainforest_spark.operators.sketches import (
        cms_counters, cms_point_estimates,
    )
    df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 1)],
                               "v string, w long")
    counters = cms_counters(df, "v", width=256, depth=4,
                            weight_col="w")
    qdf = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
    est = {r["v"]: r["est"] for r in
           cms_point_estimates(counters, qdf, "v", 256, 4).collect()}
    assert est["x"] >= 12 and est["y"] >= 1
    # an absent value can still collide, but with 3 values it won't
    assert est["z"] == 0


# ------------------------------------------------- quantile sketch

def _qvals(spark, n=8000, seed=13):
    import random
    rng = random.Random(seed)
    rows = [("g%d" % (i % 3),
             rng.lognormvariate(2.0, 1.5) * (1 if i % 9 else -1))
            for i in range(n)] + [("g0", 0.0)] * 3
    return spark.createDataFrame(rows, "g string, x double")


def test_quantile_buckets_merge_equals_whole(spark):
    from rainforest_spark.operators.sketches import quantile_buckets
    df = _qvals(spark)
    a = df.where(F.col("x") > 3.0)
    b = df.where(F.col("x") <= 3.0)
    merged = (quantile_buckets(a, "x", ["g"], 8)
              .unionByName(quantile_buckets(b, "x", ["g"], 8))
              .groupBy("g", "bucket_key", "rep_nanos")
              .agg(F.sum("cnt").cast("long").alias("cnt")))
    whole = quantile_buckets(df, "x", ["g"], 8)
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in whole.collect()}
    assert got == want


def test_quantile_estimate_relative_error_bound(spark):
    """The 2^-s guarantee, measured: every (group, q) estimate within
    2^-8 of the exact type-1 quantile — including negatives (mirrored
    buckets) and the zero bucket."""
    from rainforest_spark.operators.sketches import (
        quantile_accuracy_report,
    )
    rep = quantile_accuracy_report(
        _qvals(spark), "x",
        [10000, 250000, 500000, 900000, 990000], ["g"], s_bits=8)
    rows = rep.collect()
    assert len(rows) == 15
    for r in rows:
        assert r["rel_error"] is not None
        assert abs(r["rel_error"]) <= 2 ** -8 + 1e-9, r


def test_quantile_small_integers_are_exact(spark):
    """Values whose nanos fit in s bits keep m = |v| exactly — the
    sketch is loss-free on them (e <= s buckets)."""
    from rainforest_spark.operators.sketches import (
        quantile_buckets, quantile_estimate,
    )
    # nanos in [-200, 200] after quantization: all |v| < 2^8
    rows = [(i * 1e-9,) for i in range(-200, 201)]
    df = spark.createDataFrame(rows, "x double")
    est = quantile_estimate(quantile_buckets(df, "x", None, 8),
                            [500000], None).collect()[0]
    assert est["n"] == 401 and est["est_nanos"] == 0


def test_quantile_incremental_maintenance(spark, tmp_path):
    """Bucket tables maintained through incremental_agg (sum_long
    spec) equal the one-shot sketch of all batches — the maintained
    p95 never rescans history."""
    from rainforest_spark.operators.sketches import (
        quantile_buckets, quantile_estimate,
    )
    from rainforest_spark.sources.incremental import (
        incremental_agg, read_agg,
    )
    store = str(tmp_path / "qb")
    df = _qvals(spark, n=6000)
    batches = [df.where(F.pmod(F.xxhash64("x"), F.lit(3)) == i)
               for i in range(3)]
    for b in batches:
        incremental_agg(spark, store,
                        quantile_buckets(b, "x", ["g"], 8),
                        ["g", "bucket_key", "rep_nanos"],
                        {"cnt": ("sum_long", "cnt")})
    maintained = read_agg(spark, store)
    whole = quantile_buckets(df, "x", ["g"], 8)
    got = {tuple(r) for r in
           maintained.select("g", "bucket_key", "rep_nanos",
                             "cnt").collect()}
    want = {tuple(r) for r in whole.collect()}
    assert got == want
    e1 = {(r["g"], r["q_ppm"]): r["est_nanos"] for r in
          quantile_estimate(maintained, [950000], ["g"]).collect()}
    e2 = {(r["g"], r["q_ppm"]): r["est_nanos"] for r in
          quantile_estimate(whole, [950000], ["g"]).collect()}
    assert e1 == e2


# ----------------------------------------------------- KMV (bottom-k)

def test_kmv_merge_equals_whole_and_duplicate_blind(spark):
    from rainforest_spark.operators.sketches import kmv_merge, kmv_sketch
    a = _vals(spark, 0, 3000)
    b = _vals(spark, 2000, 6000)           # overlapping halves
    # duplicate-blind: tripling rows changes nothing
    a3 = a.unionByName(a).unionByName(a)
    merged = kmv_merge(kmv_sketch(a3, "v", None, 128),
                       kmv_sketch(b, "v", None, 128), None, 128)
    direct = kmv_sketch(a.unionByName(b), "v", None, 128)
    assert sorted(r["h"] for r in merged.collect()) \
        == sorted(r["h"] for r in direct.collect())


def test_kmv_estimate_accuracy_and_small_group_exact(spark):
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import kmv_accuracy_report
    df = spark.range(0, 24000).select(
        F.when(F.col("id") % 4 == 0, "small").otherwise("big").alias("g"),
        F.when(F.col("id") % 4 == 0, F.concat(F.lit("s"),
                                              F.col("id") % 100))
        .otherwise(F.concat(F.lit("u"), F.col("id"))).alias("v"))
    rows = {r["g"]: r for r in
            kmv_accuracy_report(df, "v", ["g"], k=256).collect()}
    # small group: ids are multiples of 4, so id % 100 yields 25
    # distinct values < k -> sketch holds ALL hashes, estimate exact
    assert rows["small"]["n_hashes"] == 25
    assert rows["small"]["estimate"] == 25.0
    assert rows["small"]["rel_error"] == 0.0
    # big group: 18000 distinct, sigma ~ 1/sqrt(254) ~ 6.3%
    assert rows["big"]["n_hashes"] == 256
    assert abs(rows["big"]["rel_error"]) < 0.32    # 5 sigma


def test_kmv_jaccard_estimates_known_overlap(spark):
    from rainforest_spark.operators.sketches import kmv_jaccard, kmv_sketch
    # |A|=6000, |B|=6000, |A∩B|=2000 -> J = 2000/10000 = 0.2
    a = _vals(spark, 0, 6000)
    b = _vals(spark, 4000, 10000)
    out = kmv_jaccard(kmv_sketch(a, "v", None, 256),
                      kmv_sketch(b, "v", None, 256), 256).collect()[0]
    assert out["n_union_topk"] == 256
    assert 0 <= out["n_both"] <= 256
    assert abs(out["jaccard"] - 0.2) < 0.15        # ~5 sigma at k=256


def test_quantile_weighted_equals_expanded_rows(spark):
    """weight_col semantics: a row with weight w sketches exactly like
    w repeated rows — bucket tables AND estimates identical."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        quantile_buckets, quantile_estimate,
    )
    rows = [("g0", 3.5, 4), ("g0", -1.25, 2), ("g0", 700.0, 1),
            ("g1", 0.0, 3), ("g1", 9.75, 5)]
    wdf = spark.createDataFrame(rows, "g string, x double, w long")
    expanded = spark.createDataFrame(
        [(g, x) for g, x, w in rows for _ in range(w)],
        "g string, x double")
    wb = quantile_buckets(wdf, "x", ["g"], 8, weight_col="w")
    eb = quantile_buckets(expanded, "x", ["g"], 8)
    assert sorted(tuple(r) for r in wb.collect()) \
        == sorted(tuple(r) for r in eb.collect())
    e1 = sorted(tuple(r) for r in
                quantile_estimate(wb, [500000, 990000], ["g"]).collect())
    e2 = sorted(tuple(r) for r in
                quantile_estimate(eb, [500000, 990000], ["g"]).collect())
    assert e1 == e2


def test_qbucket_fragment_properties_hypothesis():
    """Property test of the dyadic-bucket fragments themselves,
    evaluated in DuckDB (no Spark needed — the fragments are the
    shared engine-portable text): over random finite values, the
    bucket key is MONOTONE in the value (bucket order == value order,
    what every rank walk relies on) and the representative is within
    the 2^-s relative-error guarantee of the nano-quantized value."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rainforest_spark.operators.sketches import _qbucket_exprs

    key, rep = _qbucket_exprs("v", 8)
    con = duckdb.connect()

    @settings(max_examples=30, deadline=None)
    @given(vals=st.lists(
        st.floats(min_value=-9e9, max_value=9e9,
                  allow_nan=False, allow_infinity=False),
        min_size=2, max_size=40))
    def check(vals):
        con.execute("CREATE OR REPLACE TABLE t(x DOUBLE)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        rows = con.execute(f"""
            SELECT x, v, {key} AS k, {rep} AS r
            FROM (SELECT x, CAST(floor(x * 1e9 + 0.5) AS BIGINT) AS v
                  FROM t) ORDER BY v
        """).fetchall()
        prev_v, prev_k = None, None
        for x, v, k, r in rows:
            if prev_v is not None:
                assert (k > prev_k) or (k == prev_k and v >= prev_v)
                if v == prev_v:
                    assert k == prev_k
            prev_v, prev_k = v, k
            if v != 0:
                assert abs(r - v) <= abs(v) * 2 ** -8 + 1, (x, v, k, r)
            else:
                assert r == 0

    check()


def test_bloom_rowwise_equals_aggregation_membership(spark):
    """The stateless row-wise membership plan (k broadcast joins)
    answers identically to the aggregation form on the same probes,
    duplicates included."""
    from rainforest_spark.operators.sketches import (
        bloom_bits, bloom_membership, bloom_membership_rowwise,
    )
    corpus = _vals(spark, 0, 400)
    bits = bloom_bits(corpus, "v", 65536, 4)
    probes = spark.createDataFrame(
        [(f"user-{i}",) for i in list(range(0, 400, 13))
         + list(range(500, 900, 31))] * 2, "v string")
    agg = {r["v"]: r["maybe_present"] for r in
           bloom_membership(bits, probes, "v", 65536, 4).collect()}
    roww = {(r["v"]): r["maybe_present"] for r in
            bloom_membership_rowwise(bits, probes.distinct(), "v",
                                     65536, 4).collect()}
    assert agg == roww


def test_kmv_overlap_matrix_matches_pairwise_jaccard(spark):
    """The matrix row for (ga, gb) equals kmv_jaccard on the two
    groups' own sketches — same estimator, batched over all pairs."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        kmv_jaccard, kmv_overlap_matrix, kmv_sketch,
    )
    df = spark.range(0, 9000).select(
        F.concat(F.lit("s"), F.col("id") % 3).alias("g"),
        F.concat(F.lit("v"), F.col("id") % 2500).alias("v"))
    sk = kmv_sketch(df, "v", ["g"], 64)
    got = {(r["ga"], r["gb"]): (r["n_union_topk"], r["n_both"],
                                r["jaccard"])
           for r in kmv_overlap_matrix(sk, "g", 64).collect()}
    assert set(got) == {("s0", "s1"), ("s0", "s2"), ("s1", "s2")}
    for ga, gb in got:
        a = sk.where(F.col("g") == ga).select("h")
        b = sk.where(F.col("g") == gb).select("h")
        r = kmv_jaccard(a, b, 64).collect()[0]
        assert got[(ga, gb)] == (r["n_union_topk"], r["n_both"],
                                 r["jaccard"]), (ga, gb)


# ------------------------------------ KMV set difference + weighted

def test_kmv_difference_known_sets(spark):
    from rainforest_spark.operators.sketches import (
        kmv_difference, kmv_sketch,
    )
    # |A|=6000, |B|=6000, |B\A|=4000, |A∪B|=10000
    a = _vals(spark, 0, 6000)
    b = _vals(spark, 4000, 10000)
    out = kmv_difference(kmv_sketch(a, "v", None, 256),
                         kmv_sketch(b, "v", None, 256), 256).collect()[0]
    assert out["n_union_topk"] == 256
    assert (out["n_both"] + out["n_a_only"] + out["n_b_only"]
            == out["n_union_topk"])
    assert abs(out["union_est"] - 10000) / 10000 < 0.32     # 5 sigma
    assert abs(out["added_est"] - 4000) / 4000 < 0.45
    assert abs(out["novelty_rate"] - 0.4) < 0.2


def test_kmv_difference_exact_when_unfilled(spark):
    from rainforest_spark.operators.sketches import (
        kmv_difference, kmv_sketch,
    )
    # both sketches unfilled -> complete hash sets -> EXACT answers
    a = _vals(spark, 0, 50)
    b = _vals(spark, 30, 80)                    # B\A = [50, 80) = 30
    out = kmv_difference(kmv_sketch(a, "v", None, 256),
                         kmv_sketch(b, "v", None, 256), 256).collect()[0]
    assert out["n_union_topk"] == 80
    assert out["n_both"] == 20
    assert out["n_a_only"] == 30
    assert out["n_b_only"] == 30
    assert out["union_est"] == 80.0
    assert out["added_est"] == 30.0


def test_kmv_weighted_merge_equals_whole_and_weights_exact(spark):
    from rainforest_spark.operators.sketches import (
        kmv_merge_weighted, kmv_sketch_weighted,
    )
    # value v{i % 400} appears with known multiplicity; split rows in
    # two disjoint halves -> merge(sketch(x), sketch(y)) == sketch(all)
    df = spark.range(0, 8000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id") % 400).alias("v"))
    x = df.where(F.col("id") % 2 == 0)
    y = df.where(F.col("id") % 2 == 1)
    merged = kmv_merge_weighted(
        kmv_sketch_weighted(x, "v", None, 64),
        kmv_sketch_weighted(y, "v", None, 64), None, 64)
    whole = kmv_sketch_weighted(df, "v", None, 64)
    assert sorted((r["h"], r["w"]) for r in merged.collect()) \
        == sorted((r["h"], r["w"]) for r in whole.collect())
    # every kept value's weight is its exact multiplicity (8000/400)
    assert all(r["w"] == 20 for r in whole.collect())


def test_kmv_weighted_estimate_exact_when_unfilled(spark):
    from rainforest_spark.operators.sketches import (
        kmv_sketch_weighted, kmv_weighted_estimate,
    )
    df = spark.range(0, 900).select(
        F.concat(F.lit("v"), F.col("id") % 30).alias("v"))
    out = kmv_weighted_estimate(
        kmv_sketch_weighted(df, "v", None, 256), None, 256).collect()[0]
    assert out["n_hashes"] == 30
    assert out["w_sketch"] == 900
    assert out["d_est"] == 30.0
    assert out["w_est"] == 900.0                # exact total rows


def test_kmv_weighted_estimate_accuracy_when_filled(spark):
    from rainforest_spark.operators.sketches import (
        kmv_sketch_weighted, kmv_weighted_estimate,
    )
    # 6000 distinct values, multiplicity 3 each -> total weight 18000
    df = spark.range(0, 18000).select(
        F.concat(F.lit("v"), F.col("id") % 6000).alias("v"))
    out = kmv_weighted_estimate(
        kmv_sketch_weighted(df, "v", None, 256), None, 256).collect()[0]
    assert out["n_hashes"] == 256
    assert out["w_sketch"] == 256 * 3           # exact per-value counts
    assert abs(out["w_est"] - 18000) / 18000 < 0.32


def test_kmv_added_weight_exact_and_estimated(spark):
    from rainforest_spark.operators.sketches import (
        kmv_added_weight, kmv_sketch, kmv_sketch_weighted,
    )
    # unfilled: A = user-0..39, B = user-20..49 x multiplicity 5;
    # B\A = user-40..49 = 10 values -> added weight EXACTLY 50
    a = _vals(spark, 0, 40)
    b = spark.range(0, 150).select(
        F.concat(F.lit("user-"), F.lit(20) + F.col("id") % 30)
        .alias("v"))
    out = kmv_added_weight(
        kmv_sketch(a, "v", None, 256),
        kmv_sketch_weighted(b, "v", None, 256), 256).collect()[0]
    assert out["n_b_only"] == 10
    assert out["w_b_only"] == 50
    assert out["added_w_est"] == 50.0
    # filled: |A|=6000, B = [4000, 10000) x multiplicity 2
    #   -> true added weight = 4000 * 2 = 8000
    a2 = _vals(spark, 0, 6000)
    b2 = spark.range(0, 12000).select(
        F.concat(F.lit("user-"), F.lit(4000) + F.col("id") % 6000)
        .alias("v"))
    out2 = kmv_added_weight(
        kmv_sketch(a2, "v", None, 256),
        kmv_sketch_weighted(b2, "v", None, 256), 256).collect()[0]
    assert out2["n_union_topk"] == 256
    assert abs(out2["added_w_est"] - 8000) / 8000 < 0.45


def test_kmv_sketch_keeps_null_group_like_spark_groupby(spark):
    """Spark groupBy keeps a NULL-key group; the sketch must too (the
    pandas-groupby dropna fix) — plain and weighted variants."""
    from rainforest_spark.operators.sketches import (
        kmv_estimate, kmv_sketch, kmv_sketch_weighted,
    )
    df = spark.range(0, 200).select(
        F.when(F.col("id") % 4 == 0, None).otherwise(
            F.concat(F.lit("g"), F.col("id") % 2)).alias("g"),
        F.concat(F.lit("v"), F.col("id") % 37).alias("v"))
    est = {r["g"]: r["estimate"]
           for r in kmv_estimate(kmv_sketch(df, "v", ["g"], 64),
                                 ["g"], 64).collect()}
    exact = {r["g"]: r["n"]
             for r in df.groupBy("g")
             .agg(F.count_distinct("v").alias("n")).collect()}
    assert set(est) == set(exact) and None in est
    assert est[None] == float(exact[None])      # unfilled -> exact
    wsk = kmv_sketch_weighted(df, "v", ["g"], 64)
    wtot = {r["g"]: r["w"] for r in
            wsk.groupBy("g").agg(F.sum("w").alias("w")).collect()}
    assert wtot[None] == 50                     # every 4th of 200 rows


def test_kmv_overlap_matrix_adds_matches_kmv_difference(spark):
    """The matrix's n_a_only/n_b_only/union_est/adds_est equal
    kmv_difference on the two groups' own sketches."""
    from rainforest_spark.operators.sketches import (
        kmv_difference, kmv_overlap_matrix, kmv_sketch,
    )
    df = spark.range(0, 9000).select(
        F.concat(F.lit("s"), F.col("id") % 3).alias("g"),
        F.concat(F.lit("v"), (F.col("id") * 7) % 2500).alias("v"))
    sk = kmv_sketch(df, "v", ["g"], 64)
    got = {(r["ga"], r["gb"]): r for r in
           kmv_overlap_matrix(sk, "g", 64).collect()}
    for ga, gb in got:
        a = sk.where(F.col("g") == ga).select("h")
        b = sk.where(F.col("g") == gb).select("h")
        d = kmv_difference(a, b, 64).collect()[0]
        m = got[(ga, gb)]
        assert (m["n_a_only"], m["n_b_only"], m["union_est"],
                m["adds_est"]) == (d["n_a_only"], d["n_b_only"],
                                   d["union_est"], d["added_est"]), \
            (ga, gb)


def test_kmv_weighted_prune_safety_hypothesis():
    """Property test of the weighted bottom-k ALGORITHM (pure Python
    mirror of the mapInPandas kernel — no Spark per example): over
    random multisets, random partitionings and random batch orders,
    the per-partition accumulate-then-prune-to-local-min-k pass
    followed by the global sum+rank merge yields EXACTLY the bottom-k
    distinct hashes with their exact total weights.  This is the
    prune-safety claim in kmv_sketch_weighted's docstring: a hash
    evicted locally has >= k smaller hashes in that partition, so it
    cannot be in the global bottom-k and its dropped partial weight
    can never corrupt an emitted counter."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def h(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def check(data):
        k = data.draw(st.integers(min_value=1, max_value=12))
        rows = data.draw(st.lists(
            st.tuples(st.integers(min_value=0, max_value=60),   # value
                      st.integers(min_value=1, max_value=9)),   # weight
            min_size=1, max_size=120))
        n_parts = data.draw(st.integers(min_value=1, max_value=5))
        parts = [[] for _ in range(n_parts)]
        for r in rows:
            parts[data.draw(st.integers(0, n_parts - 1))].append(r)
        # per-partition: batches of random size, accumulate + prune
        candidates: dict[str, int] = {}
        for part in parts:
            cur: dict[str, int] = {}
            i = 0
            while i < len(part):
                step = data.draw(st.integers(min_value=1, max_value=7))
                for v, w in part[i:i + step]:
                    cur[h(v)] = cur.get(h(v), 0) + w
                if len(cur) > k:          # prune to local bottom-k
                    keep = sorted(cur)[:k]
                    cur = {x: cur[x] for x in keep}
                i += step
            for x, w in cur.items():      # global candidate merge
                candidates[x] = candidates.get(x, 0) + w
        got = {x: candidates[x] for x in sorted(candidates)[:k]}
        # ground truth: bottom-k distinct hashes with exact totals
        exact: dict[str, int] = {}
        for v, w in rows:
            exact[h(v)] = exact.get(h(v), 0) + w
        want = {x: exact[x] for x in sorted(exact)[:k]}
        assert got == want

    check()


def test_kmv_difference_estimator_properties_hypothesis():
    """Property test of the set-difference estimator's exactness
    claims (pure Python mirror — the membership-decidability lemma):
    for random sets A, B and any k, every hash in the union's
    bottom-K that belongs to X is present in X's bottom-k (so the
    side counts are exact functions of the sets), the three side
    counts partition K, and when the union never fills the sketch the
    'estimates' are the exact |A∪B| and |B\\A|."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def h(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def check(data):
        k = data.draw(st.integers(min_value=1, max_value=20))
        a = set(data.draw(st.lists(st.integers(0, 200), max_size=80)))
        b = set(data.draw(st.lists(st.integers(0, 200), max_size=80)))
        ska = set(sorted(h(v) for v in a)[:k])
        skb = set(sorted(h(v) for v in b)[:k])
        u = sorted(ska | skb)[:k]
        ha = {h(v) for v in a}
        hb = {h(v) for v in b}
        for x in u:   # membership decidability on the sampled prefix
            assert (x in ha) == (x in ska)
            assert (x in hb) == (x in skb)
        n_both = sum(1 for x in u if x in ska and x in skb)
        n_a_only = sum(1 for x in u if x in ska and x not in skb)
        n_b_only = sum(1 for x in u if x not in ska)
        assert n_both + n_a_only + n_b_only == len(u)
        if len(u) < k:    # unfilled -> complete hash sets -> exact
            assert len(u) == len(ha | hb)
            assert n_b_only == len(hb - ha)

    check()


def test_kmv_novelty_report_exact_when_unfilled(spark):
    """Union below k: every column is exact — n_only/w_only are the
    true exclusive distinct counts/weights per group, adds_est and
    added_w_est equal them, union_est is the true union size."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        kmv_novelty_report, kmv_sketch_weighted,
    )

    rows = ([("a", f"shared{i}") for i in range(10) for _ in range(2)]
            + [("b", f"shared{i}") for i in range(10)]
            + [("a", f"onlya{i}") for i in range(4)]
            + [("b", f"onlyb{i}") for i in range(7) for _ in range(3)]
            + [("c", f"shared{i}") for i in range(5)])
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketch_weighted(df, "v", ["g"], 256)
    out = {r["g"]: r for r in
           kmv_novelty_report(sk, "g", 256).collect()}
    assert set(out) == {"a", "b", "c"}
    for r in out.values():
        assert r["n_union_topk"] == 21  # 10 shared + 4 onlya + 7 onlyb
        assert r["union_est"] == 21.0
    assert out["a"]["n_only"] == 4 and out["a"]["adds_est"] == 4.0
    assert out["a"]["w_only"] == 4 and out["a"]["added_w_est"] == 4.0
    assert out["b"]["n_only"] == 7 and out["b"]["adds_est"] == 7.0
    # each onlyb value occurs 3 times -> exact added volume 21
    assert out["b"]["w_only"] == 21 and out["b"]["added_w_est"] == 21.0
    assert out["c"]["n_only"] == 0 and out["c"]["added_w_est"] == 0.0
    assert out["a"]["n_in_union"] == 14
    assert out["c"]["n_in_union"] == 5


def test_kmv_novelty_report_two_groups_matches_difference(spark):
    """With S=2 the grouped report reduces to kmv_difference: same
    union bottom-K, so group B's row carries the same exclusive count
    and scaled estimate (filled-sketch path)."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        kmv_difference, kmv_novelty_report, kmv_sketch,
        kmv_sketch_weighted,
    )

    a = spark.range(0, 3000).select(
        F.lit("a").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    b = spark.range(2000, 6000).select(
        F.lit("b").alias("g"),
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    df = a.unionByName(b)
    rep = {r["g"]: r for r in kmv_novelty_report(
        kmv_sketch_weighted(df, "v", ["g"], 256), "g", 256).collect()}
    diff = kmv_difference(kmv_sketch(a, "v", None, 256),
                          kmv_sketch(b, "v", None, 256),
                          256).collect()[0]
    assert rep["b"]["n_only"] == diff["n_b_only"]
    assert rep["a"]["n_only"] == diff["n_a_only"]
    assert rep["b"]["n_union_topk"] == diff["n_union_topk"]
    assert rep["b"]["union_est"] == diff["union_est"]
    assert rep["b"]["adds_est"] == diff["added_est"]
    # estimates land near truth: |B\A| = 3000 of union 6000
    assert abs(rep["b"]["adds_est"] - 3000) < 900
    assert abs(rep["b"]["union_est"] - 6000) < 1500


def test_kmv_sketch_max_groups_guard(spark):
    """High-cardinality group_cols must fail LOUDLY (executor memory
    is groups×k per partition), not grow silently — the operator is
    for per-source/per-shard/per-day dims."""
    import pytest
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        kmv_sketch, kmv_sketch_weighted,
    )

    big = spark.range(5000).coalesce(1).select(
        F.col("id").alias("g"),
        (F.col("id") % 7).cast("string").alias("v"))
    with pytest.raises(Exception, match="max_groups"):
        kmv_sketch(big, "v", ["g"], 16, max_groups=100).count()
    with pytest.raises(Exception, match="max_groups"):
        kmv_sketch_weighted(big, "v", ["g"], 16,
                            max_groups=100).count()
    # at or under the bound the same shape succeeds
    ok = spark.range(5000).coalesce(1).select(
        (F.col("id") % 50).alias("g"),
        (F.col("id") % 7).cast("string").alias("v"))
    assert kmv_sketch(ok, "v", ["g"], 16, max_groups=100).count() > 0


def test_kmv_novelty_report_properties_hypothesis():
    """Property test of the GROUPED novelty estimator's exactness
    claims (pure Python mirror of kmv_novelty_report): for random
    weighted multisets split over random groups and any k —
    (a) membership decidability extends to S sides: every hash in the
    GLOBAL union's bottom-K that belongs to group g is present in g's
    bottom-k sketch, so the per-hash side count over the sample is an
    exact function of the sets; (b) a sampled hash with side count 1
    is exclusive to its group WITH its exact weight (the weighted
    sketch's counter for a global-bottom-K hash is exact); (c) the
    per-group exclusive counts sum to the number of single-side
    sample hashes; (d) when the union never fills the sketch, n_only
    and w_only are the TRUE exclusive distinct counts and weights."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def h(v):
        return hashlib.md5(str(v).encode()).hexdigest()

    @settings(max_examples=60, deadline=None)
    @given(st.data())
    def check(data):
        k = data.draw(st.integers(min_value=1, max_value=16))
        n_groups = data.draw(st.integers(min_value=1, max_value=5))
        rows = data.draw(st.lists(
            st.tuples(st.integers(0, n_groups - 1),             # group
                      st.integers(min_value=0, max_value=120),  # value
                      st.integers(min_value=1, max_value=9)),   # weight
            min_size=1, max_size=150))
        # ground truth per group: value -> total weight
        gw: dict[int, dict[str, int]] = {}
        for g, v, w in rows:
            gw.setdefault(g, {})
            gw[g][h(v)] = gw[g].get(h(v), 0) + w
        # per-group weighted bottom-k sketches
        sk = {g: {x: d[x] for x in sorted(d)[:k]} for g, d in gw.items()}
        # global union bottom-K over the sketch rows
        u = sorted({x for d in sk.values() for x in d})[:k]
        for x in u:   # (a) S-side membership decidability
            for g, d in gw.items():
                assert (x in d) == (x in sk[g])
        per_g_only = {g: 0 for g in gw}
        per_g_wonly = {g: 0 for g in gw}
        n_single = 0
        for x in u:
            owners = [g for g in gw if x in sk[g]]
            if len(owners) == 1:
                g = owners[0]
                n_single += 1
                per_g_only[g] += 1
                per_g_wonly[g] += sk[g][x]
                # (b) the sampled weight is the exact group total
                assert sk[g][x] == gw[g][x]
        assert sum(per_g_only.values()) == n_single   # (c)
        if len(u) < k:   # (d) unfilled -> exact exclusives
            all_h = {x for d in gw.values() for x in d}
            assert len(u) == len(all_h)
            for g, d in gw.items():
                others = {x for g2, d2 in gw.items() if g2 != g
                          for x in d2}
                excl = {x for x in d if x not in others}
                assert per_g_only[g] == len(excl)
                assert per_g_wonly[g] == sum(d[x] for x in excl)

    check()


def test_bloom_slab_bitmap_probe_parity_with_joins(spark):
    """The Arrow-bitmap slab probe (r13, VERDICT r12 #6) must be
    row-identical to the Σk_s broadcast-join route on a 3-slab store —
    present values, absent values, null probes and extra carried
    columns — and refuse bit dims past its broadcast bound."""
    import pytest

    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        bloom_bits_slab, bloom_membership_rowwise_slabs,
        bloom_membership_rowwise_slabs_bitmap,
    )
    m, k = 256, 4
    parts = [_vals(spark, 0, 40), _vals(spark, 40, 100),
             _vals(spark, 100, 220)]
    bits = parts[0].sparkSession.createDataFrame([], "slab int, bit int")
    for s, p in enumerate(parts):
        bits = bits.unionByName(bloom_bits_slab(p, "v", m, k, slab=s))
    probes = (_vals(spark, 0, 500)
              .unionByName(spark.createDataFrame([(None,)], "v string"))
              .withColumn("extra", F.length("v")))
    a = {(r["v"], r["extra"]): r["maybe_present"] for r in
         bloom_membership_rowwise_slabs(
             bits, probes, "v", m, k, slabs=[0, 1, 2]).collect()}
    b = {(r["v"], r["extra"]): r["maybe_present"] for r in
         bloom_membership_rowwise_slabs_bitmap(
             bits, probes, "v", m, k, slabs=[0, 1, 2]).collect()}
    assert a == b
    assert b[(None, None)] is False
    assert all(b[(f"user-{i}", len(f"user-{i}"))] for i in range(220))
    with pytest.raises(ValueError, match="max_bitmap_bytes"):
        bloom_membership_rowwise_slabs_bitmap(
            bits, probes, "v", m, k, slabs=[0, 1, 2],
            max_bitmap_bytes=16)
