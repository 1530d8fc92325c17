"""Vocab coverage, span excision, and DSIR importance weights —
hand-computed goldens and semantic edge cases."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rainforest_spark.operators.dedup import excise_repeated_spans
from rainforest_spark.operators.text_analysis import (
    dsir_weights, top_terms_vocab, vocab_coverage,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


# ------------------------------------------------------ vocab coverage

def test_vocab_coverage_hand_computed(spark):
    d = _docs(spark, [
        (0, "s0", "a a b c"),   # with vocab {a, c}: b is OOV -> 1 of 4
        (1, "s1", "c c c a"),   # all in vocab
    ])
    out = vocab_coverage(d, "source", "text", vocab_k=2)
    got = {r.source: (r.total_tokens, r.oov_tokens, r.oov_rate)
           for r in out.collect()}
    # corpus counts: a=4, c=4, b=1 -> top-2 by (n DESC, term) = {a, c}
    assert got == {"s0": (4, 1, 0.25), "s1": (4, 0, 0.0)}


def test_top_terms_vocab_tie_break(spark):
    d = _docs(spark, [(0, "s", "z y z y x")])
    v = [r.term for r in top_terms_vocab(d, "text", k=2).collect()]
    assert v == ["y", "z"]  # counts tie at 2 -> lexicographic


def test_vocab_coverage_explicit_vocab(spark):
    d = _docs(spark, [(0, "s", "a b oovword")])
    voc = spark.createDataFrame([("a", 1), ("b", 1)], "term string, n long")
    out = vocab_coverage(d, "source", "text", vocab=voc).collect()[0]
    assert (out.total_tokens, out.oov_tokens) == (3, 1)


# ------------------------------------------------------- span excision

def test_excision_keeps_first_occurrence(spark):
    shared = "t1 t2 t3 t4 t5"
    d = _docs(spark, [(0, "s", shared + " u0"),
                      (1, "s", shared + " u1"),
                      (2, "s", "nothing shared here at all")])
    out = {r.doc_id: r for r in
           excise_repeated_spans(d, "doc_id", "text").collect()}
    assert out[0].n_tokens_removed == 0           # min doc keeps
    assert out[0].cleaned == shared + " u0"
    assert out[1].n_tokens_removed == 5           # dup occurrence gone
    assert out[1].cleaned == "u1"
    assert out[2].n_tokens_removed == 0           # untouched passthrough
    assert out[2].cleaned == "nothing shared here at all"


def test_excision_full_doc_removed_and_empty_doc(spark):
    shared = "r1 r2 r3 r4 r5"
    d = _docs(spark, [(0, "s", shared), (1, "s", shared), (2, "s", "")])
    out = {r.doc_id: r for r in
           excise_repeated_spans(d, "doc_id", "text").collect()}
    assert out[1].n_tokens_kept == 0 and out[1].cleaned == ""
    assert out[2].n_tokens_kept == 0 and out[2].cleaned == ""
    assert out[0].cleaned == shared


def test_excision_counts_match_token_total(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .withColumn("source", F.lit("s"))
    out = excise_repeated_spans(docs, "doc_id", "text")
    bad = out.filter(
        F.size(F.split(F.regexp_replace(F.lower(F.trim("cleaned")),
                                        r"\s+", " "), " "))
        .cast("long") != F.col("n_tokens_kept")) \
        .filter(F.col("n_tokens_kept") > 0)
    assert bad.count() == 0
    assert out.count() == docs.count()


# ---------------------------------------------------------------- DSIR

def test_dsir_hand_computed(spark):
    # target (src0): tokens a a b      -> pt(a)=2/3, pt(b)=1/3
    # source pool:   doc10 = a b b, doc11 = c
    #   src counts over the POOL: a=1, b=2, c=1 (N=4)
    d = _docs(spark, [
        (0, "src0", "a a b"),
        (10, "srcX", "a b b"),
        (11, "srcX", "c"),
    ])
    out = {r.doc_id: r for r in
           dsir_weights(d, "doc_id", "text",
                        F.col("source") == "src0").collect()}
    # doc11's only term c is absent from the target vocab -> dropped doc
    assert set(out) == {10}
    r = out[10]
    assert r.n_scored_tokens == 3

    def n9(x):
        return int(round(round(math.log(x), 9) * 1e9))

    exp = (1 * (n9(2 / 3) - n9(1 / 4)) + 2 * (n9(1 / 3) - n9(2 / 4)))
    assert r.log_weight == exp / 1e9


def test_dsir_sign_direction(spark):
    # a doc made of target-favoured tokens scores higher than one of
    # source-favoured tokens
    d = _docs(spark, [
        (0, "src0", "tgt tgt tgt common"),
        (10, "srcX", "tgt common"),
        (11, "srcX", "common common junk tgt"),
    ])
    out = {r.doc_id: r.log_weight for r in
           dsir_weights(d, "doc_id", "text",
                        F.col("source") == "src0").collect()}
    assert out[10] > out[11]


# ------------------------------------------------- incremental dedup

def test_incremental_neardup_cross_only(spark):
    from rainforest_spark.operators.dedup import incremental_neardup

    dup = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu nu xi omicron pi rho sigma tau upsilon")
    old = _docs(spark, [(0, "s", dup),
                        (1, "s", "completely different words over here "
                                 "nothing shared with anything else")])
    new = _docs(spark, [(100, "s", dup),          # exact dup of old 0
                        (101, "s", "fresh novel content not seen "
                                   "before in the corpus at all")])
    out = incremental_neardup(new, old, "doc_id", "text",
                              threshold=0.5).collect()
    assert [(r.new_id, r.old_id, r.jaccard) for r in out] == [(100, 0, 1.0)]


def test_incremental_neardup_matches_full_dedup_cross_pairs(spark):
    """The incremental split finds exactly the full pipeline's verified
    pairs that cross the old/new boundary."""
    from rainforest_spark.operators.dedup import (
        incremental_neardup, minhash_verified_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    full = minhash_verified_pairs(docs, "doc_id", "text",
                                  threshold=0.5).collect()
    want = sorted(
        (max(r.id_a, r.id_b) if (max(r.id_a, r.id_b) % 5 == 0)
         else min(r.id_a, r.id_b),
         min(r.id_a, r.id_b) if (max(r.id_a, r.id_b) % 5 == 0)
         else max(r.id_a, r.id_b))
        for r in full if (r.id_a % 5 == 0) != (r.id_b % 5 == 0))
    inc = incremental_neardup(docs.filter(F.col("doc_id") % 5 == 0),
                              docs.filter(F.col("doc_id") % 5 != 0),
                              "doc_id", "text", threshold=0.5).collect()
    got = sorted((r.new_id, r.old_id) for r in inc)
    assert got == [(a, b) for a, b in want]


# ------------------------------------------------------- domain terms

def test_domain_terms_surface_group_specific_tokens(spark):
    from rainforest_spark.operators.text_analysis import domain_terms

    d = _docs(spark, [
        (0, "med", "patient dose clinical trial patient dose"),
        (1, "med", "clinical dose patient symptoms"),
        (2, "law", "court ruling appeal court statute"),
        (3, "law", "ruling court appeal verdict"),
    ])
    out = domain_terms(d, "source", "text", k=3)
    top = {}
    for r in out.collect():
        top.setdefault(r.source, []).append((r.rnk, r.term, r.z))
    med_terms = [t for _, t, _ in sorted(top["med"])]
    law_terms = [t for _, t, _ in sorted(top["law"])]
    assert "patient" in med_terms and "court" in law_terms
    assert all(z > 0 for _, _, z in top["med"][:1])
    assert all(len(v) <= 3 for v in top.values())


# ------------------------------------------------------- corpus drift

def test_jsd_zero_for_single_source(spark):
    from rainforest_spark.operators.text_analysis import corpus_drift_jsd

    d = _docs(spark, [(0, "only", "a b c a b"), (1, "only", "c a b")])
    out = corpus_drift_jsd(d, "source", "text").collect()
    assert len(out) == 1 and out[0].jsd == 0.0


def test_jsd_orders_by_divergence_and_bounded(spark):
    import math

    from rainforest_spark.operators.text_analysis import corpus_drift_jsd

    d = _docs(spark, [
        (0, "mix", "w1 w2 w3 w4 w5 w6 w7 w8"),     # near corpus average
        (1, "mix", "w1 w2 w3 w4 d1 d2 d3 d4"),
        (2, "odd", "d1 d2 d3 d4 d1 d2 d3 d4"),      # skewed
        (3, "alien", "z1 z2 z3 z4 z5 z6 z7 z8"),    # disjoint-ish
    ])
    out = {r.source: r.jsd for r in
           corpus_drift_jsd(d, "source", "text").collect()}
    assert all(0.0 <= v <= math.log(2) + 1e-9 for v in out.values())
    assert out["mix"] < out["odd"] < out["alien"]


# ----------------------------------------------------- novelty scores

def test_novelty_extremes_and_gramless(spark):
    from rainforest_spark.operators.dedup import novelty_scores

    seen = "k1 k2 k3 k4 k5"
    old = _docs(spark, [(1, "s", seen)])
    new = _docs(spark, [
        (100, "s", seen),                      # fully seen -> 0.0
        (101, "s", "n1 n2 n3 n4 n5"),          # fully novel -> 1.0
        (102, "s", seen + " n1 n2"),           # mixed
        (103, "s", "too short"),               # no 3-grams -> NULL
    ])
    out = {r.doc_id: r for r in
           novelty_scores(new, old, "doc_id", "text", n=3).collect()}
    assert out[100].novelty == 0.0 and out[100].n_novel == 0
    assert out[101].novelty == 1.0 and out[101].n_novel == out[101].n_grams
    # doc 102: grams at pos 1..5: k1k2k3,k2k3k4,k3k4k5 seen; k4k5n1,
    # k5n1n2 novel -> 2/5
    assert (out[102].n_grams, out[102].n_novel) == (5, 2)
    assert out[102].novelty == 0.4
    assert out[103].n_grams == 0 and out[103].novelty is None


# ------------------------------------------------ leakage-free split

def test_leakage_free_split_invariants(spark):
    from rainforest_spark.operators.dedup import ngram_jaccard_pairs
    from rainforest_spark.operators.packing import (
        leakage_free_split, split_assign,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text",
                                n=3, threshold=0.2)
    out = leakage_free_split(docs.select("doc_id"), pairs, "doc_id")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == docs.count()
    # 1) no leakage: both ends of every pair share a split
    for p in pairs.collect():
        assert rows[p.id_a].split == rows[p.id_b].split, (p.id_a, p.id_b)
        assert rows[p.id_a].cluster_rep == rows[p.id_b].cluster_rep
    # 2) singletons get exactly the naive assignment
    paired = {p.id_a for p in pairs.collect()} | \
             {p.id_b for p in pairs.collect()}
    naive = {r.doc_id: r.split
             for r in split_assign(docs.select("doc_id"),
                                   "doc_id").collect()}
    for did, r in rows.items():
        if did not in paired:
            assert r.cluster_rep == did
            assert r.split == naive[did]
    assert paired, "fixture must contain near-dup pairs"


# --------------------------------------------- HLL cardinality panel

def test_corpus_cardinalities_sketch_vs_exact(spark):
    """The HLL++ panel tracks the exact distincts within a few rsd —
    the accuracy contract that lets the sketch replace the exact
    distinct at 100 TB."""
    from rainforest_spark.operators.text_analysis import (
        corpus_cardinalities,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {r.source: r for r in
             corpus_cardinalities(docs, "source", "text",
                                  exact=True).collect()}
    approx = {r.source: r for r in
              corpus_cardinalities(docs, "source", "text",
                                   rsd=0.02).collect()}
    assert set(exact) == set(approx)
    for src, e in exact.items():
        a = approx[src]
        for fld in ("n_docs_distinct", "n_terms", "n_grams"):
            ev, av = getattr(e, fld), getattr(a, fld)
            assert ev > 0
            assert abs(av - ev) <= max(0.08 * ev, 2), \
                (src, fld, ev, av)


def test_corpus_cardinalities_counts_empty_docs(spark):
    from rainforest_spark.operators.text_analysis import (
        corpus_cardinalities,
    )

    d = _docs(spark, [(0, "s", "a b c"), (1, "s", ""), (2, "s", "a b")])
    out = corpus_cardinalities(d, "source", "text", exact=True) \
        .collect()[0]
    # 3 distinct contents (incl. the empty doc), 3 terms, 2 trigrams?
    # "a b c" has one 3-gram; "a b" none; empty none
    assert (out.n_docs_distinct, out.n_terms, out.n_grams) == (3, 3, 1)


# ------------------------------ round-8: LSH estimator calibration

def test_lsh_calibration_exact_dup_and_estimator(spark):
    from rainforest_spark.operators.dedup import (
        lsh_calibration, lsh_candidate_pairs, minhash_verified_pairs,
    )
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    docs = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("lazy", "sleepy")),         # near dup of 1
        (4, "completely different text about spark shuffle "
            "partitions and adaptive query execution plans today"),
        (5, "another unrelated document mentioning parquet column "
            "pruning and predicate pushdown behaviour in scans"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["matches"]: r for r in
           lsh_calibration(df, "doc_id", "text").collect()}
    # the exact-dup pair matches all 16 hashes with true jaccard 1.0
    assert 16 in out
    top = out[16]
    assert top["estimate"] == 1.0
    assert top["max_jaccard"] == 1.0
    # every bucket: estimate == matches/16, bias == est - mean
    for m, r in out.items():
        assert r["estimate"] == m / 16.0
        assert r["bias"] == round(r["estimate"] - r["mean_jaccard"], 6)
        assert r["min_jaccard"] <= r["mean_jaccard"] <= r["max_jaccard"]
    # bucket pair counts sum to the candidate-pair count
    n_cand = lsh_candidate_pairs(df, "doc_id", "text").count()
    assert sum(r["n_pairs"] for r in out.values()) == n_cand
