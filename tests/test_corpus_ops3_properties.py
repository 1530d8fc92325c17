"""Property-based tests (hypothesis) for the round-6 continued-2
operators against independent pure-python references: boilerplate
removal vs a dict-counting reference, token-budget selection's prefix
invariant, and spherical k-means vs a numpy reference implementing the
same deterministic policy."""

from __future__ import annotations

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from rainforest_spark.operators.mixture import token_budget_selection
from rainforest_spark.operators.similarity import kmeans_clusters
from rainforest_spark.operators.text_analysis import remove_boilerplate

_WORDS = st.sampled_from(["a", "b", "c", "d"])
_DOC = st.lists(_WORDS, min_size=1, max_size=12).map(" ".join)


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return t.split(" ")


def _boiler_reference(rows, tile, min_docs, frac_denom):
    """Dict-counting reference for remove_boilerplate."""
    per_src = {}
    tiles_of = {}
    for did, src, text in rows:
        toks = _norm_tokens(text)
        ts = [" ".join(toks[i:i + tile]) for i in range(0, len(toks), tile)]
        tiles_of[did] = ts
        per_src.setdefault(src, []).append(did)
    df = {}
    for did, src, text in rows:
        for t in set(tiles_of[did]):
            df[(src, t)] = df.get((src, t), 0) + 1
    out = {}
    for did, src, text in rows:
        nd = len(per_src[src])
        kept = [t for t in tiles_of[did]
                if not (df[(src, t)] >= min_docs
                        and df[(src, t)] * frac_denom >= nd)]
        out[did] = (len(tiles_of[did]), len(tiles_of[did]) - len(kept),
                    hashlib.md5(" ".join(kept).encode()).hexdigest())
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.sampled_from(["A", "B"]), _DOC),
                min_size=1, max_size=10))
def test_boilerplate_matches_reference(spark, docs):
    rows = [(i, src, text) for i, (src, text) in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: (r.n_tiles, r.n_removed, r.cleaned_fp)
           for r in remove_boilerplate(d, "doc_id", "text", "source",
                                       tile=2, min_docs=2,
                                       frac_denom=20).collect()}
    assert got == _boiler_reference(rows, 2, 2, 20)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 1000000), st.integers(1, 50)),
                min_size=1, max_size=20, unique_by=lambda t: t))
def test_token_budget_prefix_invariant(spark, items):
    # selection must be a PREFIX of the (score desc, id asc) order, and
    # the boundary doc is the first to cross the budget line
    rows = [(i, sm, w) for i, (sm, w) in enumerate(items)]
    d = spark.createDataFrame(rows, "doc_id long, sm long, w long")
    out = token_budget_selection(d, "doc_id", "sm", "w", 3, 5).collect()
    total = sum(w for _, _, w in rows)
    ordered = sorted(out, key=lambda r: (-r.sm, r.doc_id))
    cum = 0
    for r in ordered:
        assert r.cum_before == cum, "cumsum must follow best-first order"
        assert r.selected == (cum * 5 < total * 3)
        cum += r.w
    sel = [r.selected for r in ordered]
    assert sel == sorted(sel, reverse=True), "selection must be a prefix"


def _kmeans_reference(vecs, k, n_iter):
    """Numpy spherical k-means with the operator's exact policy:
    lowest-id seeds, 6dp-HALF_UP-rounded cosine, lowest-index ties,
    per-dim plain mean update."""
    ids = sorted(vecs)
    X = {i: np.asarray(vecs[i], dtype=np.float64) for i in ids}

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    cents = {c: X[i] for c, i in enumerate(ids[:k])}
    assign = {}
    for it in range(n_iter):
        if it > 0:
            def nano(x):
                return math.floor(float(x) * 1000000000.0 + 0.5)

            new = {}
            for c in sorted(set(assign.values())):
                members = [X[i] for i in ids if assign[i] == c]
                # the operator's exact-centroid policy: floor-nanos
                # integer sums, (sum/1e9)/n double divisions
                new[c] = np.array(
                    [float(sum(nano(m[d]) for m in members))
                     / 1000000000.0 / len(members)
                     for d in range(len(members[0]))])
            cents = new
        assign = {}
        sims = {}
        for i in ids:
            best = None
            for c in sorted(cents):
                cv = cents[c]
                s = r6(float(X[i] @ cv)
                       / (math.sqrt(float(X[i] @ X[i]))
                          * math.sqrt(float(cv @ cv))))
                if best is None or s > best[1]:
                    best = (c, s)
            assign[i], sims[i] = best
    return {i: (assign[i], sims[i]) for i in ids}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.floats(-1, 1, allow_nan=False, width=32),
              st.floats(-1, 1, allow_nan=False, width=32),
              st.floats(-1, 1, allow_nan=False, width=32)),
    min_size=3, max_size=12).filter(
        lambda vs: all(abs(a) + abs(b) + abs(c) > 0.1 for a, b, c in vs)))
def test_kmeans_matches_numpy_reference(spark, vecs):
    rows = [(i, list(v)) for i, v in enumerate(vecs)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.cluster, r.sim) for r in
           kmeans_clusters(e, "vec_id", "embedding", k=3,
                           n_iter=2).collect()}
    # float32 ingestion: the reference must see the same float32-rounded
    # values the engine casts to double
    vecs32 = {i: np.asarray(v, dtype=np.float32).astype(np.float64)
              for i, v in rows}
    want = _kmeans_reference(vecs32, 3, 2)
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0], f"vec {i} cluster mismatch"
        assert abs(got[i][1] - want[i][1]) < 2e-6, f"vec {i} sim mismatch"


def _bigram_reference(texts, lam=0.75):
    """Pure-python interpolated bigram LM with the operator's exact
    integer-nanos policy."""
    from collections import Counter

    toks = {i: _norm_tokens(t) for i, t in enumerate(texts)}
    uni = Counter(w for ws in toks.values() for w in ws if w)
    n_tot = sum(uni.values())
    bgs = {i: [(a, b) for a, b in zip(ws, ws[1:]) if a and b]
           for i, ws in toks.items()}
    cb = Counter(p for ps in bgs.values() for p in ps)
    cs = Counter(a for ps in bgs.values() for a, _ in ps)
    out = {}
    for i, ps in bgs.items():
        if not ps:
            continue
        n9 = 0
        for p in ps:
            prob = (lam * cb[p] / cs[p[0]]
                    + (1 - lam) * uni[p[1]] / n_tot)
            # exact decimal scaling of the 9-dp value: the operator
            # (and the DuckDB oracle) scale DECIMAL(19,9)*1e9 exactly,
            # while int(round(x,9)*1e9) TRUNCATES when the double
            # product lands at N-eps (hypothesis found
            # -ln(p)=1.028483699 -> 1028483698.9999999 -> ...698)
            n9 += int(Decimal(repr(round(-math.log(prob), 9)))
                      * 1000000000)
        n = len(ps)
        out[i] = (n, ((2 * n9 + 1000 * n) // (2000 * n)) / 1e6)
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_DOC, min_size=1, max_size=10))
def test_bigram_logprob_matches_reference(spark, docs):
    from rainforest_spark.operators.text_analysis import bigram_logprob

    rows = [(i, "s", t) for i, t in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.doc_id: (r.n_bigrams, r.mean_nll)
           for r in bigram_logprob(d, "doc_id", "text").collect()}
    assert got == _bigram_reference(docs)
