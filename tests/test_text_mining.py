"""PMI collocations, cross-document repeated spans, and embedding-space
decontamination — golden hand-computed cases plus structural invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rainforest_spark.operators.dedup import repeated_spans
from rainforest_spark.operators.similarity import semantic_contamination
from rainforest_spark.operators.text_analysis import pmi_bigrams


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


# ---------------------------------------------------------------- PMI

def test_pmi_hand_computed(spark):
    # corpus: "a b" twice, "a c" once -> tokens: a,b,a,b,a,c (N=6)
    # bigrams within docs only: (a,b) x2, (a,c) x1 (Nb=3)
    d = _docs(spark, ["a b", "a b", "a c"])
    out = pmi_bigrams(d, "doc_id", "text", min_count=2, k=10)
    rows = {(r.w1, r.w2): r for r in out.collect()}
    assert set(rows) == {("a", "b")}  # (a,c) cut by min_count
    r = rows[("a", "b")]
    assert r.pair_count == 2
    # PMI = ln( (2/3) / ((3/6)*(2/6)) ) = ln(4) with N=6, Nb=3
    assert abs(r.pmi - round(math.log(4.0), 6)) < 1e-9


def test_pmi_min_count_and_topk_order(spark):
    d = _docs(spark, ["x y x y", "p q", "p q", "p q"])
    out = pmi_bigrams(d, "doc_id", "text", min_count=2, k=1)
    rows = out.collect()
    assert len(rows) == 1  # top-1 after the cut, ordered by pmi desc


def test_pmi_empty_and_single_token_docs(spark):
    d = _docs(spark, ["", "solo", "a b a b"])
    out = pmi_bigrams(d, "doc_id", "text", min_count=1, k=10).collect()
    pairs = {(r.w1, r.w2) for r in out}
    # no cross-doc bigrams, no empty-token bigrams
    assert pairs == {("a", "b"), ("b", "a")}


# ------------------------------------------------------- repeated spans

def test_spans_merge_overlap_and_adjacent(spark):
    # doc0 and doc1 share tokens 1..6 ("t1..t6"): doc0 grams at pos 1,2
    # with n=5 overlap -> ONE span [1, 6]
    shared = "t1 t2 t3 t4 t5 t6"
    d = _docs(spark, [shared + " uniq0a uniq0b", shared + " uniq1a"])
    out = repeated_spans(d, "doc_id", "text", n=5, min_docs=2)
    rows = {(r.doc_id, r.span_id): r for r in out.collect()}
    assert len(rows) == 2  # one merged span per doc
    for did in (0, 1):
        r = rows[(did, 1)]
        assert (r.span_start, r.span_end, r.span_tokens) == (1, 6, 6)
        assert r.n_hot_grams == 2


def test_spans_gap_splits(spark):
    # two shared 5-gram islands separated by doc-unique middles
    a = "s1 s2 s3 s4 s5"
    b = "e1 e2 e3 e4 e5"
    d = _docs(spark, [f"{a} mid0a mid0b {b}", f"{a} mid1x {b}"])
    out = repeated_spans(d, "doc_id", "text", n=5, min_docs=2)
    doc0 = sorted([r for r in out.collect() if r.doc_id == 0],
                  key=lambda r: r.span_id)
    assert len(doc0) == 2
    assert (doc0[0].span_start, doc0[0].span_end) == (1, 5)
    assert (doc0[1].span_start, doc0[1].span_end) == (8, 12)


def test_spans_require_min_docs(spark):
    # a repeated gram WITHIN one doc is not cross-document
    d = _docs(spark, ["r1 r2 r3 r4 r5 z r1 r2 r3 r4 r5", "other words"])
    out = repeated_spans(d, "doc_id", "text", n=5, min_docs=2)
    assert out.count() == 0


def test_spans_within_doc_repeat_of_hot_gram_counts_positions(spark):
    # the shared gram appears twice in doc0 -> two hits, two spans
    g = "h1 h2 h3 h4 h5"
    d = _docs(spark, [f"{g} gap0 gap1 {g}", g])
    out = repeated_spans(d, "doc_id", "text", n=5, min_docs=2)
    doc0 = sorted([r for r in out.collect() if r.doc_id == 0],
                  key=lambda r: r.span_id)
    assert [(r.span_start, r.span_end) for r in doc0] == [(1, 5), (8, 12)]


# ------------------------------------- embedding decontamination

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_contamination_threshold_and_nearest(spark):
    train = _vecs(spark, [
        (1, [1.0, 0.0]),     # sim 1.0 to eval 100, 0.0 to eval 101
        (2, [0.0, 1.0]),     # sim 1.0 to eval 101
        (3, [-1.0, 0.0]),    # sim -1 / 0 -> below threshold
    ])
    ev = _vecs(spark, [(100, [2.0, 0.0]), (101, [0.0, 3.0])])
    out = semantic_contamination(train, ev, "vec_id", "embedding",
                                 threshold=0.5)
    got = {r.train_id: (r.eval_id, r.sim) for r in out.collect()}
    assert got == {1: (100, 1.0), 2: (101, 1.0)}


def test_semantic_contamination_tie_breaks_min_eval_id(spark):
    train = _vecs(spark, [(1, [1.0, 1.0])])
    # two eval vectors at the SAME cosine to the train vector
    ev = _vecs(spark, [(200, [1.0, 0.0]), (201, [0.0, 1.0])])
    out = semantic_contamination(train, ev, "vec_id", "embedding",
                                 threshold=0.1).collect()
    assert len(out) == 1 and out[0].eval_id == 200


def test_semantic_contamination_plan_broadcasts_eval(spark):
    e = (spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"))
    out = semantic_contamination(
        e.filter(F.col("vec_id") % 20 != 0),
        e.filter(F.col("vec_id") % 20 == 0),
        "vec_id", "embedding", threshold=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_readability_scores_known_text(spark):
    from rainforest_spark.operators.text_analysis import (
        readability_scores,
    )
    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"),
         (2, "   "),
         (3, "tsk brr")],             # no [aeiouy] at all: 0 syll
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           readability_scores(df, "doc_id", "text").collect()}
    r1 = got[1]
    assert (r1["n_words"], r1["n_sentences"]) == (6, 2)
    # vowel runs: e,a,a,e,o,a -> 6
    assert r1["n_syllables"] == 6
    want = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert r1["flesch"] == want
    # whitespace-only: NULL words and flesch, sentences floor 1
    assert got[2]["n_words"] is None and got[2]["flesch"] is None
    assert got[2]["n_sentences"] == 1
    # consonant-only words count zero syllables (documented heuristic)
    assert got[3]["n_syllables"] == 0
