"""Distributed BPE training vs an independent single-node reference.

The reference implementation below follows the published algorithm
(Sennrich et al. 2016) directly on python dicts — same greedy
left-to-right application, same (count desc, pair asc) tie-break — and
is deliberately written from the paper's description, not from the
operator, so agreement is two independent derivations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from rainforest_spark.operators.bpe import (
    EOW, apply_merge, bpe_train, chars_with_eow, segment_tokens,
    word_counts,
)


# ---------------------------------------------------------------- ref
def _ref_apply(sym: tuple, a: str, b: str) -> tuple:
    out, prev = [], None
    for s in sym:
        if prev == a and s == b:
            out.append(a + b)
            prev = None
        else:
            if prev is not None:
                out.append(prev)
            prev = s
    if prev is not None:
        out.append(prev)
    return tuple(out)


def _ref_bpe(word_n: dict, n_merges: int, min_count: int = 2):
    vocab = {tuple(w) + (EOW,): n for w, n in word_n.items()}
    merges = []
    for rank in range(n_merges):
        counts: dict = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((rank, a, b, c))
        vocab = {_ref_apply(sym, a, b): n for sym, n in vocab.items()}
    return merges, vocab


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


@pytest.fixture(scope="module")
def trained(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    wt = word_counts(docs, "text")
    merges, segmented = bpe_train(wt, n_merges=12)
    return docs, wt, merges, segmented


def test_merge_sequence_matches_reference(trained):
    docs, wt, merges, segmented = trained
    word_n = {r.word: r.n for r in wt.collect()}
    ref_merges, ref_vocab = _ref_bpe(word_n, 12)
    assert merges == ref_merges
    # the classic example learns the full words: 'low' and 'newest'
    # families merge before any singleton pair survives min_count
    learned = {a + b for _, a, b, _ in merges}
    assert "est" + EOW in learned or "est" in learned


def test_final_segmentation_matches_reference(trained):
    docs, wt, merges, segmented = trained
    word_n = {r.word: r.n for r in wt.collect()}
    _, ref_vocab = _ref_bpe(word_n, 12)
    got = {r.word: tuple(r.sym) for r in segmented.collect()}
    want = {"".join(s).removesuffix(EOW): s for s in ref_vocab}
    assert got == want
    # segmentation is a partition of the word: concat round-trips
    for w, sym in got.items():
        assert "".join(sym) == w + EOW


def test_apply_merge_greedy_overlap(spark):
    """'aaaa' under merge (a,a) must give (aa)(aa); 'aaa' gives
    (aa)(a) — the published greedy left-to-right semantics."""
    df = spark.createDataFrame([("aaaa",), ("aaa",), ("ba",)], ["w"])
    out = df.select(
        "w", apply_merge(chars_with_eow("w"), "a", "a").alias("s"))
    got = {r.w: tuple(r.s) for r in out.collect()}
    assert got["aaaa"] == ("aa", "aa", EOW)
    assert got["aaa"] == ("aa", "a", EOW)
    assert got["ba"] == ("b", "a", EOW)


def test_segment_tokens_counts(trained):
    docs, wt, merges, segmented = trained
    counts = {r.doc_id: (r.n_bpe_tokens, r.n_words)
              for r in segment_tokens(docs, "doc_id", "text",
                                      segmented).collect()}
    seg = {r.word: len(r.sym) for r in segmented.collect()}
    for i, text in CORPUS:
        words = text.split()
        assert counts[i] == (sum(seg[w] for w in words), len(words))


def test_min_count_early_stop(spark):
    """A corpus of unique singleton words stops before memorizing."""
    docs = spark.createDataFrame(
        [(0, "ab cd ef")], ["doc_id", "text"])
    merges, _ = bpe_train(word_counts(docs, "text"), n_merges=10)
    assert merges == []  # every pair has count 1 < min_pair_count


def test_real_corpus_smoke(spark):
    """On the driver corpus: requested merge count, monotone
    non-increasing pair counts, deterministic across re-runs."""
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(100))
    wt = word_counts(docs, "text")
    merges, segmented = bpe_train(wt, n_merges=8)
    assert len(merges) == 8
    counts = [c for _, _, _, c in merges]
    assert counts == sorted(counts, reverse=True)
    merges2, _ = bpe_train(wt, n_merges=8)
    assert merges2 == merges
