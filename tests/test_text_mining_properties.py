"""Property-based tests (hypothesis) for the round-6 text-mining
operators against independent pure-python references: repeated-span
detection vs a brute-force interval merge, PMI vs naive counting,
novelty vs set arithmetic."""

from __future__ import annotations

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return [w for w in t.split(" ") if w != ""]


#: tiny alphabet so shared shingles actually occur
_WORDS = st.sampled_from(["a", "b", "c", "d", "e"])
_DOC = st.lists(_WORDS, min_size=0, max_size=30).map(" ".join)


def _spans_reference(texts, n, min_docs):
    """Brute-force: hot grams by distinct-doc count, then interval
    union per doc."""
    grams = {}  # gram -> set(doc)
    pos = {}    # doc -> [positions]
    for did, t in enumerate(texts):
        toks = _norm_tokens(t)
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i:i + n])
            grams.setdefault(g, set()).add(did)
    hot = {g for g, docs in grams.items() if len(docs) >= min_docs}
    for did, t in enumerate(texts):
        toks = _norm_tokens(t)
        ps = [i + 1 for i in range(len(toks) - n + 1)
              if " ".join(toks[i:i + n]) in hot]
        if ps:
            pos[did] = ps
    out = []
    for did, ps in pos.items():
        sid, start, end, cnt = 0, None, None, 0
        for p in ps:  # ps is increasing
            if start is not None and p > end + 1:
                out.append((did, sid, start, end, cnt))
                start = None
            if start is None:
                sid += 1
                start, end, cnt = p, p + n - 1, 1
            else:
                end, cnt = max(end, p + n - 1), cnt + 1
        out.append((did, sid, start, end, cnt))
    return sorted(out)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_DOC, min_size=2, max_size=6))
def test_repeated_spans_matches_bruteforce(spark, texts):
    from rainforest_spark.operators.dedup import repeated_spans

    n = 3
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = sorted((r.doc_id, r.span_id, r.span_start, r.span_end,
                  r.n_hot_grams)
                 for r in repeated_spans(df, "doc_id", "text",
                                         n=n, min_docs=2).collect())
    want = _spans_reference(texts, n, 2)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_DOC, min_size=1, max_size=6))
def test_pmi_matches_naive_counts(spark, texts):
    from rainforest_spark.operators.text_analysis import pmi_bigrams

    uni: Counter = Counter()
    big: Counter = Counter()
    for t in texts:
        toks = _norm_tokens(t)
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r.w1, r.w2): (r.pair_count, r.pmi)
           for r in pmi_bigrams(df, "doc_id", "text",
                                min_count=1, k=1000).collect()}
    n_tok = float(sum(uni.values()))
    n_big = float(sum(big.values()))
    assert set(got) == set(big)
    for (w1, w2), c in big.items():
        pc, pmi = got[(w1, w2)]
        assert pc == c
        want = round(math.log((c * n_tok * n_tok)
                              / (n_big * uni[w1] * uni[w2])), 6)
        assert abs(pmi - want) <= 1e-6


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(old=st.lists(_DOC, min_size=1, max_size=4),
       new=st.lists(_DOC, min_size=1, max_size=4))
def test_novelty_matches_set_arithmetic(spark, old, new):
    from rainforest_spark.operators.dedup import novelty_scores

    n = 3

    def gramset(t):
        toks = _norm_tokens(t)
        return {" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)}

    old_grams = set().union(*[gramset(t) for t in old])
    odf = spark.createDataFrame(list(enumerate(old)),
                                "doc_id long, text string")
    ndf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(new)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           novelty_scores(ndf, odf, "doc_id", "text", n=n).collect()}
    assert set(got) == {100 + i for i in range(len(new))}
    for i, t in enumerate(new):
        gs = gramset(t)
        r = got[100 + i]
        assert r.n_grams == len(gs)
        assert r.n_novel == len(gs - old_grams)
        if gs:
            # integer round-half-up at 6dp
            want = ((2 * r.n_novel * 1000000 + r.n_grams)
                    // (2 * r.n_grams)) / 1e6
            assert r.novelty == want
        else:
            assert r.novelty is None
