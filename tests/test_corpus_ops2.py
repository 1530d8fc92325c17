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
