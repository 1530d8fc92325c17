"""Mixture / sampling / sharding / projection operator semantics.

The oracle-parity test covers bit-exactness of q81-q85; these pin the
OPERATOR-LEVEL properties a pipeline relies on: decision stability
under growth and re-salting, cap bounds, shard shapes, and the JL
inner-product preservation that justifies projecting before LSH.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from rainforest_spark.operators.mixture import (
    cap_per_group, rate_threshold_hex, weighted_sample,
)
from rainforest_spark.operators.packing import epoch_shards
from rainforest_spark.operators.similarity import jl_project, jl_signs


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "source").cache())


def test_rate_threshold_hex_bounds():
    assert rate_threshold_hex(0.0) == "000000"
    assert rate_threshold_hex(1.0) == "g"      # keep-all sentinel
    assert rate_threshold_hex(2.0) == "g"
    assert rate_threshold_hex(0.5) == "800000"
    # monotonic in rate
    ts = [rate_threshold_hex(r / 20) for r in range(21)]
    assert ts == sorted(ts)


def test_weighted_sample_rate_and_stability(docs):
    n = docs.count()
    kept = weighted_sample(docs, "doc_id", 0.5, salt="t-v1")
    k = kept.count()
    # binomial(n, .5): allow 5 sigma
    assert abs(k - 0.5 * n) < 5 * math.sqrt(n * 0.25) + 1
    # decision stability: the keep-set on a SUBSET of rows is exactly
    # the intersection (no row's decision depends on other rows)
    sub = docs.filter(F.col("doc_id") % 3 == 0)
    kept_sub = set(r.doc_id for r in
                   weighted_sample(sub, "doc_id", 0.5, salt="t-v1")
                   .select("doc_id").collect())
    kept_all = set(r.doc_id for r in kept.select("doc_id").collect())
    assert kept_sub == {i for i in kept_all if i % 3 == 0}
    # re-salting redraws: overlap is ~rate^2, not ~rate
    kept2 = set(r.doc_id for r in
                weighted_sample(docs, "doc_id", 0.5, salt="t-v2")
                .select("doc_id").collect())
    assert kept_all != kept2


def test_weighted_sample_per_group_rates(docs):
    rates = {"src0": 1.0, "src1": 0.0}
    kept = weighted_sample(docs, "doc_id", rates, group_col="source",
                           default_rate=0.25, salt="t-v1")
    by_src = {r.source: r.n for r in
              kept.groupBy("source").agg(F.count("*").alias("n"))
              .collect()}
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert by_src.get("src0") == n_src0          # rate 1.0 keeps all
    assert "src1" not in by_src                  # rate 0.0 drops all
    other = docs.filter(~F.col("source").isin("src0", "src1")).count()
    kept_other = sum(v for s, v in by_src.items()
                     if s not in ("src0", "src1"))
    assert abs(kept_other - 0.25 * other) < 5 * math.sqrt(other * 0.25) + 1


def test_cap_per_group(docs):
    capped = cap_per_group(docs, "source", "doc_id", k=5, salt="c-v1")
    sizes = capped.groupBy("source").agg(F.count("*").alias("n"))
    assert sizes.filter(F.col("n") > 5).count() == 0
    # groups smaller than k keep everything
    small = (docs.groupBy("source").agg(F.count("*").alias("tot"))
             .filter(F.col("tot") <= 5))
    merged = small.join(sizes, "source")
    assert merged.filter(F.col("n") != F.col("tot")).count() == 0
    # deterministic pick: same salt -> same rows
    again = set(r.doc_id for r in
                cap_per_group(docs, "source", "doc_id", k=5, salt="c-v1")
                .select("doc_id").collect())
    assert again == set(r.doc_id for r in
                        capped.select("doc_id").collect())


def test_epoch_shards_shape(docs):
    n = docs.count()
    s = epoch_shards(docs, "doc_id", shard_size=64, salt="e-t",
                     pos_col="pos")
    rows = s.select("doc_id", "shard_id", "pos").collect()
    assert len(rows) == n
    assert sorted(r.pos for r in rows) == list(range(n))
    # every shard is full except possibly the last
    from collections import Counter
    c = Counter(r.shard_id for r in rows)
    full = {k: v for k, v in c.items() if k < max(c)}
    assert all(v == 64 for v in full.values())
    assert c[max(c)] == n - 64 * (len(c) - 1)
    # shard_id consistent with pos
    assert all(r.shard_id == r.pos // 64 for r in rows)
    # a different epoch salt permutes the order
    s2 = epoch_shards(docs, "doc_id", shard_size=64, salt="e-t2",
                      pos_col="pos")
    pos2 = {r.doc_id: r.pos for r in s2.collect()}
    pos1 = {r.doc_id: r.pos for r in rows}
    assert pos1 != pos2


def test_jl_signs_deterministic():
    a = jl_signs(8, 3, salt="s1")
    assert a == jl_signs(8, 3, salt="s1")
    assert a != jl_signs(8, 3, salt="s2")
    assert all(v in (1.0, -1.0) for row in a for v in row)


def test_jl_inner_product_preservation(spark):
    """E[y.y'] = v.v' for +-1 JL; with out_dim=16 on unit-ish vectors
    the per-pair error concentrates — check the mean absolute error
    over real embedding pairs is small relative to vector norms."""
    e = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
         .filter(F.col("vec_id") < 40))
    p = jl_project(e, "embedding", in_dim=64, out_dim=16, salt="jl-t")
    rows = p.collect()
    import numpy as np
    full = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in rows}
    proj = {r.vec_id: np.array([r[f"jl_{j}"] for j in range(16)])
            for r in rows}
    errs, mags = [], []
    ids = sorted(full)
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        true = float(full[a] @ full[b])
        est = float(proj[a] @ proj[b])
        errs.append(abs(est - true))
        mags.append(np.linalg.norm(full[a]) * np.linalg.norm(full[b]))
    # JL with k=16: sd of the estimator ~ |a||b|/sqrt(k); the MEAN
    # error over 20 pairs should sit well under one sd
    assert sum(errs) / len(errs) < sum(mags) / len(mags) / math.sqrt(16) * 1.5


def test_pii_redact_golden(spark):
    """Positive/tricky redaction cases the PII-free driver corpus can't
    exercise: adjacent entities, digits inside emails/URLs, short digit
    runs that must survive, pass ordering."""
    from rainforest_spark.operators.text_analysis import (
        pii_counts, pii_redact,
    )
    rows = [
        (1, "mail a.b+c%d@x-y.co.uk now"),
        (2, "see https://a.b/c?d=12345678 and http://q.r/s#t"),
        (3, "call +41 79 123 45 67 or 0791234567"),
        (4, "id 12345 stays, 123456 goes"),          # 5 digits < min
        (5, "dev123@ex.io pushed to https://git.io/abc123 at 20260101"),
        (6, ""),
        (7, "no pii at all"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {r.i: (r.red, r.n) for r in
           df.select("i", pii_redact("t").alias("red"),
                     pii_counts("t").alias("n")).collect()}
    assert got[1] == ("mail [EMAIL] now", 1)
    assert got[2] == ("see [URL] and [URL]", 2)
    assert got[3] == ("call [NUM] or [NUM]", 2)
    assert got[4] == ("id 12345 stays, [NUM] goes", 1)
    # email/URL pass first: their digits never double-count as numbers
    assert got[5] == ("[EMAIL] pushed to [URL] at [NUM]", 3)
    assert got[6] == ("", 0)
    assert got[7] == ("no pii at all", 0)


def test_ranged_cumsum_null_group_kept(spark):
    """A NULL group-key value is a real group: the grouped ranged path
    must emit exactly what the plain grouped window emits (it used to
    silently drop NULL-group rows in the offsets equi-join)."""
    from pyspark.sql import Window

    from rainforest_spark.operators.windows import ranged_cumsum

    rows = [(None, 1, 10), (None, 2, 5), ("a", 3, 7), ("a", 4, 1),
            (None, 5, 2), ("b", 6, 4)]
    df = spark.createDataFrame(rows, ["grp", "ord", "w"])
    got = {(r.grp, r.ord): r.cw for r in
           ranged_cumsum(df, "ord", "w", "cw", group_cols=["grp"])
           .collect()}
    w = (Window.partitionBy("grp").orderBy("ord")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {(r.grp, r.ord): r.cw for r in
            df.withColumn("cw", F.sum("w").over(w)).collect()}
    assert got == want
    assert len(got) == len(rows)
    # integer weights stay integer (no silent double promotion)
    out = ranged_cumsum(df, "ord", "w", "cw", group_cols=["grp"])
    assert dict(out.dtypes)["cw"] == "bigint"


def test_pii_redact_idempotent(spark):
    """redact(redact(x)) == redact(x): placeholders contain no digits,
    @ or :// so a second pass never re-matches — the property that
    makes the scrub safe to re-run over partially-processed data."""
    from rainforest_spark.operators.text_analysis import pii_redact

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id",
                    F.concat(F.col("text"),
                             F.lit(" a@b.co https://x.y/1 +41791234567"))
                    .alias("t")))
    once = docs.select("doc_id", pii_redact("t").alias("r1"))
    twice = once.select("doc_id", pii_redact("r1").alias("r2"), "r1")
    assert twice.filter(F.col("r1") != F.col("r2")).count() == 0


def test_es_weighted_sample_matches_python_reference(spark):
    # the whole chain (md5 uniform, exponential key, top-m) is exactly
    # reproducible in pure python
    import hashlib
    import math

    rows = [(i, 1 + (i % 7)) for i in range(200)]
    ref = []
    for i, w in rows:
        h = hashlib.md5(f"es-v1:{i}".encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 2 ** 32
        ref.append((round(-math.log(u) / w, 9), i))
    want = sorted(ref)[:20]

    from rainforest_spark.operators.mixture import (
        weighted_sample_no_replacement,
    )
    d = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted((r.es_key, r.doc_id) for r in
                 weighted_sample_no_replacement(
                     d, "doc_id", "w", m=20).collect())
    assert [i for _, i in got] == [i for _, i in want]
    for (gk, _), (wk, _) in zip(got, want):
        assert abs(gk - wk) < 2e-9


def test_es_weighted_sample_favors_heavy_rows(spark):
    # one row with overwhelming weight is (essentially) always drawn:
    # its key is -ln(u)/1e9 ~ 1e-9-scale, below any unit-weight key
    from rainforest_spark.operators.mixture import (
        weighted_sample_no_replacement,
    )
    rows = [(i, 1) for i in range(100)] + [(999, 10 ** 9)]
    d = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r.doc_id for r in
           weighted_sample_no_replacement(d, "doc_id", "w", m=5).collect()}
    assert 999 in got


def test_interleave_spreads_sources_evenly(spark):
    from rainforest_spark.operators.mixture import interleave_sources

    rows = [(i, "A") for i in range(4)] + [(10 + i, "B") for i in range(2)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(d, "doc_id", "source").collect()
    by_pos = {r.position: r for r in out}
    assert sorted(by_pos) == list(range(6)), "positions must be 0..5"
    # midpoint fractions: A at 1/8,3/8,5/8,7/8; B at 1/4,3/4 ->
    # interleaved order A B A A B A regardless of the salted order
    # WITHIN each source
    assert [by_pos[i].source for i in range(6)] == \
        ["A", "B", "A", "A", "B", "A"]
    # src_rank follows the interleave: the B doc at position 1 is B's
    # first, the one at 4 is B's second
    assert by_pos[1].src_rank == 1 and by_pos[4].src_rank == 2


def test_interleave_deterministic(spark):
    from rainforest_spark.operators.mixture import interleave_sources

    rows = [(i, f"s{i % 3}") for i in range(30)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted((r.doc_id, r.position) for r in
               interleave_sources(d, "doc_id", "source").collect())
    b = sorted((r.doc_id, r.position) for r in
               interleave_sources(d, "doc_id", "source").collect())
    assert a == b


def test_rebalance_after_dedup_hand_computed(spark):
    from rainforest_spark.operators.mixture import rebalance_after_dedup

    orig = spark.createDataFrame(
        [(0, "A"), (1, "A"), (2, "A"), (3, "A"), (10, "B"), (11, "B")],
        "doc_id long, source string")
    # dedup removed doc 1 from A (a dup): survivors 3 of 4 in A, 2/2 in B
    kept = orig.filter(F.col("doc_id") != 1)
    out = rebalance_after_dedup(orig, kept, "doc_id", "source").collect()
    a = sorted(r.doc_id for r in out if r.source == "A")
    b = [r.doc_id for r in out if r.source == "B"]
    # A is the worst-hit source (m = 3/4): rate_A = 1 -> all survivors
    assert a == [0, 2, 3]
    # B resamples at 0.75 -> a salted-hash-determined subset
    assert set(b) <= {10, 11}


def test_rebalance_restores_proportions(spark):
    from rainforest_spark.operators.mixture import rebalance_after_dedup

    # A: 400 docs, half removed by "dedup"; B: 200 docs intact.
    # original shares 2:1 -> rebalanced shares must return to ~2:1
    rows = [(i, "A") for i in range(400)] + \
        [(1000 + i, "B") for i in range(200)]
    orig = spark.createDataFrame(rows, "doc_id long, source string")
    kept = orig.filter((F.col("source") == "B")
                       | (F.col("doc_id") % 2 == 0))
    out = rebalance_after_dedup(orig, kept, "doc_id", "source")
    counts = {r.source: r.n for r in
              out.groupBy("source").agg(
                  F.count(F.lit(1)).alias("n")).collect()}
    # A keeps all 200 survivors (binding source); B targets 100
    assert counts["A"] == 200
    assert 80 <= counts["B"] <= 120, counts


def test_rebalance_raises_on_vanished_source(spark):
    import pytest

    from rainforest_spark.operators.mixture import rebalance_after_dedup

    orig = spark.createDataFrame(
        [(0, "A"), (1, "A"), (10, "B")], "doc_id long, source string")
    kept = orig.filter(F.col("source") != "B")   # B fully deduped away
    with pytest.raises(ValueError, match="zero survivors"):
        rebalance_after_dedup(orig, kept, "doc_id", "source")


def test_temperature_allocation_exact_budget_and_python_reference(spark):
    import math

    from rainforest_spark.operators.mixture import temperature_allocation

    # skewed sources: 1000 / 100 / 10 / 3 docs
    rows = ([(i, "web") for i in range(1000)]
            + [(2000 + i, "books") for i in range(100)]
            + [(3000 + i, "code") for i in range(10)]
            + [(4000 + i, "law") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r.source: r for r in
           temperature_allocation(df, "source", budget=777,
                                  alpha=0.25).collect()}

    # python reference: sqrt-chain weights, floor-nanos, LRM
    counts = {"web": 1000, "books": 100, "code": 10, "law": 3}
    nano = {g: math.floor(math.sqrt(math.sqrt(float(n)))
                          * 1000000000.0 + 0.5)
            for g, n in counts.items()}
    T = sum(nano.values())
    base = {g: (nano[g] * 777) // T for g in counts}
    rem = {g: nano[g] * 777 - base[g] * T for g in counts}
    short = 777 - sum(base.values())
    order = sorted(counts, key=lambda g: (-rem[g], g))
    alloc = dict(base)
    for g in order[:short]:
        alloc[g] += 1

    assert sum(r.alloc for r in out.values()) == 777
    for g in counts:
        assert out[g].alloc == alloc[g], (g, out[g].alloc, alloc[g])
        assert out[g].n_docs == counts[g]
        assert abs(out[g].weight - nano[g] / T) < 1.5e-6


def test_temperature_allocation_rejects_non_dyadic_alpha(spark):
    import pytest

    from rainforest_spark.operators.mixture import temperature_allocation

    df = spark.createDataFrame([(0, "A")], "doc_id long, source string")
    with pytest.raises(ValueError, match="1/2"):
        temperature_allocation(df, "source", budget=10, alpha=0.3)
