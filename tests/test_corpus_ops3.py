"""Boilerplate removal, cluster-canonical selection, margin alignment,
token-budget selection, bigram LM and spherical k-means — hand-computed
goldens and semantic edge cases (the round-6 continued-2 batch)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from rainforest_spark.operators.dedup import canonical_per_cluster
from rainforest_spark.operators.mixture import token_budget_selection
from rainforest_spark.operators.similarity import (
    kmeans_clusters, margin_alignment,
)
from rainforest_spark.operators.text_analysis import (
    bigram_logprob, remove_boilerplate,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# -------------------------------------------------- boilerplate removal

def test_boilerplate_removed_from_every_occurrence(spark):
    # tile=2: "a b" appears in 2 of 3 docs of source A -> boilerplate,
    # stripped from BOTH (no keep-first, unlike span excision)
    d = _docs(spark, [
        (0, "A", "a b c d"),
        (1, "A", "a b x y"),
        (2, "A", "p q r s"),
    ])
    out = {r.doc_id: r for r in
           remove_boilerplate(d, "doc_id", "text", "source",
                              tile=2).collect()}
    assert (out[0].n_tiles, out[0].n_removed) == (2, 1)
    assert out[0].cleaned_fp == _md5("c d")
    assert (out[1].n_tiles, out[1].n_removed) == (2, 1)
    assert out[1].cleaned_fp == _md5("x y")
    assert (out[2].n_tiles, out[2].n_removed) == (2, 0)
    assert out[2].cleaned_fp == _md5("p q r s")


def test_boilerplate_is_per_source(spark):
    # the same tile in two DIFFERENT sources never crosses the source
    # boundary: df is counted within the source
    d = _docs(spark, [
        (0, "A", "a b"),
        (1, "B", "a b"),
    ])
    out = {r.doc_id: r for r in
           remove_boilerplate(d, "doc_id", "text", "source",
                              tile=2).collect()}
    assert out[0].n_removed == 0 and out[1].n_removed == 0


def test_boilerplate_fully_removed_doc_and_short_tail(spark):
    # identical docs -> everything boilerplate -> md5('') fingerprint;
    # 3 words at tile=2 -> 2 tiles, the short tail participates
    d = _docs(spark, [
        (0, "A", "z z"),
        (1, "A", "z z"),
        (2, "A", "u v w"),
    ])
    out = {r.doc_id: r for r in
           remove_boilerplate(d, "doc_id", "text", "source",
                              tile=2).collect()}
    assert out[0].cleaned_fp == _md5("") and out[0].n_removed == 1
    assert (out[2].n_tiles, out[2].n_removed) == (2, 0)
    assert out[2].cleaned_fp == _md5("u v w")


def test_boilerplate_frac_threshold(spark):
    # frac_denom=2 (>=50% of the source's docs): a tile in 2 of 5 docs
    # clears min_docs but NOT the fraction -> kept
    rows = [(i, "A", f"a b u{i} v{i}") for i in range(2)]
    rows += [(i + 2, "A", f"p{i} q{i} r{i} s{i}") for i in range(3)]
    d = _docs(spark, rows)
    out = {r.doc_id: r for r in
           remove_boilerplate(d, "doc_id", "text", "source",
                              tile=2, frac_denom=2).collect()}
    assert all(r.n_removed == 0 for r in out.values())


# ----------------------------------------------- canonical per cluster

def test_canonical_is_highest_quality_member(spark):
    docs = spark.createDataFrame(
        [(0, 3), (1, 7), (2, 5), (3, 4)], "doc_id long, q long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2)], "id_a long, id_b long")
    out = {r.doc_id: r for r in
           canonical_per_cluster(docs, pairs, "doc_id", "q").collect()}
    # cluster {0,1,2}: rep=min id=0, canonical=argmax q -> 1
    for i in (0, 1, 2):
        assert out[i].cluster_rep == 0 and out[i].canonical_id == 1
    assert out[1].is_canonical and not out[0].is_canonical
    # singleton is its own canonical
    assert out[3].cluster_rep == 3 and out[3].canonical_id == 3
    assert out[3].is_canonical


def test_canonical_quality_tie_breaks_on_min_id(spark):
    docs = spark.createDataFrame(
        [(5, 9), (6, 9)], "doc_id long, q long")
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    out = canonical_per_cluster(docs, pairs, "doc_id", "q").collect()
    assert all(r.canonical_id == 5 for r in out)


# ------------------------------------------------------ margin alignment

def test_margin_alignment_hand_computed(spark):
    # 2-D unit vectors: query 0 at 0 deg; candidates at 10/60/90 deg.
    # top-2 margin: sims cos(10)=.984808, cos(60)=.5 -> margin =
    # .984808 / ((.984808+.5)/2)
    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(0, vec(0)), (1, vec(10)), (3, vec(60)), (5, vec(90))]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = margin_alignment(e, "vec_id", "embedding",
                           left_pred=F.col("vec_id") % 2 == 0,
                           right_pred=F.col("vec_id") % 2 == 1,
                           k_margin=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r.query_id == 0 and r.match_id == 1
    s1, s2 = round(math.cos(math.radians(10)), 6), 0.5
    assert r.sim == s1
    assert abs(r.margin - round(s1 / ((s1 + s2) / 2), 6)) < 1e-9


def test_margin_hub_vector_scores_low(spark):
    # a hub: all candidates nearly identical -> margin ~= 1; a distinct
    # match -> margin well above
    hub = [(10, [1.0, 0.0])] + [(2 * i + 1, [0.99, 0.14 + 0.001 * i])
                                for i in range(4)]
    e = spark.createDataFrame(hub, "vec_id long, embedding array<float>")
    m_hub = margin_alignment(e, "vec_id", "embedding",
                             F.col("vec_id") % 2 == 0,
                             F.col("vec_id") % 2 == 1).collect()[0].margin
    assert m_hub < 1.001


# -------------------------------------------------- token budget cut

def test_token_budget_hand_computed(spark):
    # scores (micro) order docs 2 > 0 > 1; weights 4,4,2, total 10,
    # budget 3/5 -> 6: doc2 (before 0) in, doc0 (before 4 < 6) in
    # (crosses the line and is still taken), doc1 (before 8) out.
    d = spark.createDataFrame(
        [(0, 500000, 4), (1, 400000, 2), (2, 600000, 4)],
        "doc_id long, sm long, w long")
    out = {r.doc_id: r for r in
           token_budget_selection(d, "doc_id", "sm", "w",
                                  budget_num=3, budget_den=5).collect()}
    assert (out[2].cum_before, out[2].selected) == (0, True)
    assert (out[0].cum_before, out[0].selected) == (4, True)
    assert (out[1].cum_before, out[1].selected) == (8, False)


def test_token_budget_score_tie_breaks_on_id(spark):
    d = spark.createDataFrame(
        [(7, 500000, 3), (3, 500000, 3)], "doc_id long, sm long, w long")
    out = {r.doc_id: r.cum_before for r in
           token_budget_selection(d, "doc_id", "sm", "w", 1, 2).collect()}
    assert out == {3: 0, 7: 3}


# ------------------------------------------------------- bigram LM

def test_bigram_logprob_hand_computed(spark):
    d = _docs(spark, [(0, "s", "a b"), (1, "s", "a b"), (2, "s", "a c"),
                      (3, "s", "solo")])
    out = {r.doc_id: r for r in
           bigram_logprob(d, "doc_id", "text").collect()}
    # bigrams: (a,b) x2, (a,c) x1; cs(a)=3; unigrams over ALL tokens
    # incl. the bigram-less doc: a=3 b=2 c=1 solo=1, N=7
    def nll(cb, cs, cu, n):
        from decimal import Decimal

        p = 0.75 * (cb / cs) + 0.25 * (cu / n)
        # exact decimal scaling — int(round(x,9)*1e9) truncates when
        # the double product lands at N-eps (see the properties file)
        n9 = int(Decimal(repr(round(-math.log(p), 9))) * 1000000000)
        return ((2 * n9 + 1000) // 2000) / 1e6

    assert out[0].n_bigrams == 1
    assert out[0].mean_nll == nll(2, 3, 2, 7)
    assert out[2].mean_nll == nll(1, 3, 1, 7)
    assert 3 not in out  # no bigram -> absent, but its token counted


def test_bigram_vs_unigram_orders_fluency(spark):
    # same unigram stats, different order: the corpus-frequent bigram
    # scores lower NLL than the scrambled one
    d = _docs(spark, [(0, "s", "x y"), (1, "s", "x y"), (2, "s", "x y"),
                      (3, "s", "y x"), (4, "s", "y z")])
    out = {r.doc_id: r.mean_nll for r in
           bigram_logprob(d, "doc_id", "text").collect()}
    # p(y|x) = .75*(3/3)+.25*(5/10) -> low NLL; p(x|y) = .75*(1/2)+
    # .25*(4/10) -> higher (without the "y z" doc cs(y)=1 would make
    # the scrambled conditional MLE 1.0 as well)
    assert out[0] < out[3]


# ------------------------------------------------------- k-means

def test_kmeans_two_obvious_groups(spark):
    # two tight direction bundles; seeds (ids 0,1) land one per bundle
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
            (2, [0.99, 0.05]), (3, [0.05, 0.99]),
            (4, [0.98, 0.08]), (5, [0.03, 0.97])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: r.cluster for r in
           kmeans_clusters(e, "vec_id", "embedding", k=2,
                           n_iter=2).collect()}
    assert out[0] == out[2] == out[4] == 0
    assert out[1] == out[3] == out[5] == 1


def test_kmeans_empty_cluster_disappears(spark):
    # both seeds sit in one bundle -> after the first update one
    # centroid may keep everything; no error, every vector labeled
    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.99, 0.0]),
            (3, [0.98, 0.01])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_clusters(e, "vec_id", "embedding", k=2, n_iter=2)
    rows_out = out.collect()
    assert len(rows_out) == 4
    assert set(r.cluster for r in rows_out) <= {0, 1}


def test_kmeans_fixed_iterations_deterministic(spark):
    rows = [(i, [math.cos(i), math.sin(i)]) for i in range(12)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted((r.vec_id, r.cluster, r.sim) for r in
               kmeans_clusters(e, "vec_id", "embedding", k=3,
                               n_iter=2).collect())
    b = sorted((r.vec_id, r.cluster, r.sim) for r in
               kmeans_clusters(e, "vec_id", "embedding", k=3,
                               n_iter=2).collect())
    assert a == b


# --------------------------------------------------------- zipf fit

def test_zipf_fit_recovers_power_law(spark):
    # construct term frequencies following n(r) = 1000 / r exactly:
    # slope must come out ~ -1 with r2 ~ 1
    rows = []
    did = 0
    for r in range(1, 41):
        n = max(1, round(1000 / r))
        rows.append((did, "s", " ".join([f"term{r:03d}"] * n)))
        did += 1
    from rainforest_spark.operators.text_analysis import zipf_fit
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = zipf_fit(d, "text").collect()[0]
    assert out.n_terms == 40
    assert abs(out.zipf_slope + 1.0) < 0.02
    assert out.r2 > 0.999


def test_zipf_fit_flat_corpus_slope_zero(spark):
    # equal frequencies: slope 0, r2 null (no variance in y)
    from rainforest_spark.operators.text_analysis import zipf_fit
    d = spark.createDataFrame(
        [(0, "s", "aa bb cc dd aa bb cc dd")],
        "doc_id long, source string, text string")
    out = zipf_fit(d, "text").collect()[0]
    assert out.zipf_slope == 0.0
    assert out.r2 is None


def test_heaps_fit_sublinear_growth(spark):
    # vocabulary that grows as sqrt(N): beta ~ 0.5.  doc d contributes
    # 20 tokens; new terms appear so V(d) = ceil(5*sqrt(20d))
    import math as m
    rows, vocab = [], 0
    for d in range(40):
        n_new_target = int(5 * m.sqrt(20 * (d + 1))) - vocab
        toks = [f"t{vocab + i}" for i in range(max(n_new_target, 0))]
        vocab += max(n_new_target, 0)
        # pad with existing terms to exactly 20 tokens
        toks += [f"t{i % vocab}" for i in range(20 - len(toks))]
        rows.append((d, "s", " ".join(toks)))
    from rainforest_spark.operators.text_analysis import heaps_fit
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = heaps_fit(d, "doc_id", "text").collect()[0]
    assert out.n_docs == 40
    assert 0.4 < out.heaps_beta < 0.6
    assert out.r2 > 0.98


# ---------------------------------------------- farthest-point sample

def test_fps_matches_numpy_reference(spark):
    import numpy as np
    from rainforest_spark.operators.similarity import farthest_point_sample

    rng = np.random.RandomState(3)
    X = rng.randn(30, 8).astype(np.float32)
    rows = [(i, X[i].tolist()) for i in range(30)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted((r.pick_order, r.vec_id) for r in
                 farthest_point_sample(e, "vec_id", "embedding",
                                       k=6).collect())

    Xd = X.astype(np.float64)
    nrm = np.sqrt((Xd * Xd).sum(1))
    sims = np.round((Xd @ Xd.T) / np.outer(nrm, nrm), 6)
    chosen = [0]
    best = sims[:, 0].copy()
    for _ in range(5):
        mask = best.copy()
        mask[chosen] = np.inf                # exclude already-chosen
        nxt = int(np.argmin(mask))           # first index = lowest id tie
        chosen.append(nxt)
        best = np.maximum(best, sims[:, nxt])
    want = [(o + 1, v) for o, v in enumerate(chosen)]
    assert got == sorted(want)


def test_fps_radius_non_decreasing(spark):
    import numpy as np
    from rainforest_spark.operators.similarity import farthest_point_sample

    rng = np.random.RandomState(11)
    rows = [(i, rng.randn(6).astype(float).tolist()) for i in range(25)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sorted(farthest_point_sample(e, "vec_id", "embedding",
                                       k=5).collect(),
                 key=lambda r: r.pick_order)
    radii = [r.sim_at_pick for r in out[1:]]
    assert radii == sorted(radii), \
        "coverage similarity must be non-decreasing over picks"


# ------------------------------------------------- batching & masking

def test_length_batches_accounting(spark):
    from rainforest_spark.operators.packing import length_bucketed_batches

    # 5 docs in one bucket (len 10..14, width 64), batch_size 2:
    # batches of 2,2,1 with exact waste = n*max - sum
    d = spark.createDataFrame([(i, 10 + i) for i in range(5)],
                              "doc_id long, n long")
    out = length_bucketed_batches(d, "doc_id", "n", bucket_width=64,
                                  batch_size=2).collect()
    assert sorted(r.n_docs for r in out) == [1, 2, 2]
    assert all(r.bucket == 0 for r in out)
    for r in out:
        assert r.padding_waste == r.n_docs * r.max_len - r.sum_len
        assert 0 <= r.padding_waste <= r.max_len


def test_length_batches_bucket_bound_on_waste(spark):
    from rainforest_spark.operators.packing import length_bucketed_batches

    # per-doc padding can never exceed bucket_width - 1
    rows = [(i, 1 + (i * 37) % 500) for i in range(300)]
    d = spark.createDataFrame(rows, "doc_id long, n long")
    out = length_bucketed_batches(d, "doc_id", "n", bucket_width=32,
                                  batch_size=8).collect()
    for r in out:
        assert r.padding_waste <= (r.n_docs - 1) * 31


def test_masking_plan_rate_and_islands(spark):
    d = spark.createDataFrame(
        [(i, "s", " ".join(f"w{j}" for j in range(200)))
         for i in range(5)],
        "doc_id long, source string, text string")
    from rainforest_spark.operators import text_analysis as TA
    toks = d.select("doc_id",
                    F.posexplode(TA.tokens("text")).alias("p", "t"))
    h = F.substring(F.md5(F.concat(F.lit("mask-v1:"),
                                   F.col("doc_id").cast("string"),
                                   F.lit(":"),
                                   (F.col("p") + 1).cast("string"))), 1, 6)
    n_masked = toks.filter(h < "266666").count()
    # 1000 tokens at 15% -> binomial; 3.5 sigma bounds
    assert 110 <= n_masked <= 190, n_masked


def test_fps_k_exceeding_corpus_returns_all(spark):
    from rainforest_spark.operators.similarity import farthest_point_sample

    rows = [(i, [float(i), 1.0]) for i in range(3)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = farthest_point_sample(e, "vec_id", "embedding", k=10).collect()
    assert sorted(r.vec_id for r in out) == [0, 1, 2]
    assert sorted(r.pick_order for r in out) == [1, 2, 3]


# ------------------------------------------------ round-7 operators

def test_group_overlap_exact_matrix(spark):
    from rainforest_spark.operators.dedup import group_overlap

    # srcA/srcB share exactly one 3-gram; srcC shares none (complete
    # matrix must still carry the zero rows)
    rows = [(0, "A", "a b c d"),        # grams: "a b c", "b c d"
            (1, "B", "b c d e"),        # grams: "b c d", "c d e"
            (2, "C", "x y z w")]        # grams: "x y z", "y z w"
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r.group_a, r.group_b): r
           for r in group_overlap(d, "doc_id", "text", "source",
                                  n=3).collect()}
    assert set(got) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = got[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_common) == (2, 2, 1)
    assert ab.jaccard == round(1 / 3, 6)
    assert got[("A", "C")].n_common == 0
    assert got[("A", "C")].jaccard == 0.0


def test_source_scorecard_cross_source_dups(spark):
    from rainforest_spark.operators.text_analysis import source_scorecard

    rows = [(0, "A", "en", "same text"), (1, "B", "en", "Same   TEXT"),
            (2, "A", "de", "unique one here"), (3, "B", "fr", "another")]
    d = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string")
    got = {r.source: r for r in
           source_scorecard(d, "doc_id", "text", "source",
                            lang_col="lang").collect()}
    # the normalized fingerprint matches ACROSS sources: both copies
    # count as duplicate-exposed
    assert got["A"].dup_docs == 1 and got["B"].dup_docs == 1
    assert got["A"].n_docs == 2 and got["A"].n_langs == 2
    assert got["A"].n_tokens == 2 + 3
    assert got["A"].dup_rate == 0.5
    assert got["B"].mean_tokens == 1.5


def test_stratified_sample_allocation(spark):
    from rainforest_spark.operators.mixture import stratified_sample

    # 3 sources with counts 900 / 90 / 10; budget 200 with sqrt
    # allocation keeps the tiny source at a much higher RATE than the
    # huge one, and the sample is deterministic
    rows = ([(i, "big") for i in range(900)]
            + [(1000 + i, "mid") for i in range(90)]
            + [(2000 + i, "tiny") for i in range(10)])
    d = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(d, "doc_id", "source", budget=200)
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in out.collect())
    assert a == b                      # deterministic
    n = {s: 0 for s in ("big", "mid", "tiny")}
    for r in out.collect():
        n[r.source] += 1
    # realized counts are Binomial around the sqrt allocation
    # (~127/40/13 of 200): tiny keeps everything (rate 1), the big
    # source keeps well under a fifth of itself
    assert n["tiny"] == 10
    assert 0 < n["big"] < 250
    assert n["big"] / 900 < n["mid"] / 90 < 1.01
    with __import__("pytest").raises(ValueError):
        stratified_sample(d, "doc_id", "source", 10, alloc="nope")


def test_label_cohesion_geometry(spark):
    """Known geometry: a tight label (identical vectors -> cohesion 1)
    vs a spread label (two orthogonal vectors -> cos to the mean
    direction = cos 45deg ~ 0.7071)."""
    from rainforest_spark.operators.similarity import label_cohesion

    rows = [(0, 1, [1.0, 0.0]), (1, 1, [1.0, 0.0]),
            (2, 2, [1.0, 0.0]), (3, 2, [0.0, 1.0])]
    d = spark.createDataFrame(rows,
                              "vec_id long, label int, embedding array<float>")
    got = {r.label: r for r in
           label_cohesion(d, "vec_id", "embedding", "label").collect()}
    assert got[1].n == 2 and got[1].mean_cos == 1.0 and got[1].min_cos == 1.0
    assert got[2].n == 2
    assert abs(got[2].mean_cos - 0.707107) < 1e-6
    assert abs(got[2].min_cos - 0.707107) < 1e-6


def test_containment_pairs_excerpt_case(spark):
    """A short doc fully embedded in a long one: Jaccard is tiny but
    containment is 1.0; orientation is small->large; a below-threshold
    overlap pair is excluded."""
    from rainforest_spark.operators.dedup import containment_pairs, \
        ngram_jaccard_pairs

    body = " ".join(f"w{i}" for i in range(60))
    quote = " ".join(f"w{i}" for i in range(20, 28))   # 8 words inside
    rows = [(0, body), (1, quote), (2, "x y z q r s t u v")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.contained_id, r.container_id): r.containment
           for r in containment_pairs(d, "doc_id", "text",
                                      threshold=0.8).collect()}
    assert got == {(1, 0): 1.0}
    # and symmetric Jaccard misses it at any usable threshold
    jac = ngram_jaccard_pairs(d, "doc_id", "text",
                              threshold=0.3).collect()
    assert not any({r.id_a, r.id_b} == {0, 1} for r in jac)


def test_embedding_novelty_semantics(spark):
    """Known geometry: a batch vector near a corpus vector scores low
    novelty; an isolated batch vector with no bucket-sharing corpus
    neighbour keeps NULL (not 1.0 — 'no evidence' is not 'novel')."""
    import numpy as np

    from rainforest_spark.operators.similarity import embedding_novelty

    planes = np.random.RandomState(1).randn(1, 2, 4)
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.9, 0.1, 0.0, 0.0]
    corpus = spark.createDataFrame([(100, base)],
                                   "vec_id long, embedding array<float>")
    # brute-force an isolated vector landing in a different bucket
    def bucket(v):
        return sum((1 << p) for p in range(2)
                   if planes[0][p] @ np.array(v) > 0)
    cand = None
    rng = np.random.RandomState(2)
    for _ in range(200):
        v = rng.randn(4).tolist()
        if bucket(v) != bucket(base):
            cand = v
            break
    assert cand is not None
    batch = spark.createDataFrame(
        [(0, near), (1, cand)], "vec_id long, embedding array<float>")
    got = {r.batch_id: (r.max_sim, r.novelty) for r in
           embedding_novelty(batch, corpus, "vec_id", "embedding",
                             planes=planes).collect()}
    assert len(got) == 2
    sim, nov = got[0]
    assert sim is not None and sim > 0.98 and nov < 0.02
    assert got[1] == (None, None)


def test_perplexity_buckets_semantics(spark):
    """CCNet head/middle/tail: per-language equal-count cuts; fluent
    in-distribution text ranks head (low NLL), rare-token noise tail;
    languages bucket independently."""
    from rainforest_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    common = "the cat sat on the mat"
    docs = [(i, "en", common) for i in range(4)]          # low NLL
    docs += [(10 + i, "en", f"zq{i}x wv{i}j qq{i}") for i in range(4)]
    docs += [(20 + i, "de", common) for i in range(3)]    # other lang
    df = spark.createDataFrame(docs, "doc_id long, lang string, "
                                     "text string")
    out = perplexity_buckets(df, "doc_id", "text", "lang")
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 11
    # en: 8 docs -> buckets sizes ~ceil thirds via integer cut
    en_buckets = [rows[i].bucket for i in range(4)]
    assert all(b == 0 for b in en_buckets[:2])  # common text is head
    assert all(rows[10 + i].bucket == 2 for i in range(2, 4))
    # de has its own independent 3-cut over 3 docs: one per bucket
    assert sorted(rows[20 + i].bucket for i in range(3)) == [0, 1, 2]
    assert rows[20 + 0].label in ("head", "middle", "tail")
    # per-language bucket sizes differ by at most 1 (equal-count cut)
    from collections import Counter
    for lang in ("en", "de"):
        sizes = Counter(r.bucket for r in rows.values()
                        if r.lang == lang)
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_perplexity_buckets_n2_labels(spark):
    from rainforest_spark.operators.text_analysis import (
        perplexity_buckets,
    )

    df = spark.createDataFrame(
        [(i, "en", "a b " + ("a" if i % 2 else "zzq")) for i in range(4)],
        "doc_id long, lang string, text string")
    out = perplexity_buckets(df, "doc_id", "text", "lang", n_buckets=2)
    labels = {r.label for r in out.collect()}
    assert labels == {"b0", "b1"}


def test_bm25_topk_semantics(spark):
    """Retrieval ordering: higher tf wins at equal length, shorter doc
    wins at equal tf, non-matching docs absent; hand-computed score."""
    import math

    from rainforest_spark.operators.text_analysis import bm25_topk

    docs = [(0, "spark spark join"),     # tf(spark)=2, dl=3
            (1, "spark data model"),     # tf=1, dl=3
            (2, "spark a b c d e f g"),  # tf=1, dl=8 (longer -> lower)
            (3, "no match here at all")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = bm25_topk(df, "doc_id", "text", [(0, "spark")], k=10)
    rows = {r.doc_id: (r.rnk, r.score) for r in got.collect()}
    assert set(rows) == {0, 1, 2}          # doc 3 never matches
    assert rows[0][0] == 1                 # tf=2 ranks first
    assert rows[1][0] == 2                 # shorter beats longer
    assert rows[2][0] == 3
    # hand-computed for doc 1: N=4, df=3, S=3+3+8+5=19, dl=3
    idf = round(math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5)), 9)
    tfp = 1 * 2.25 / (1 + 1.25 * (0.25 + 0.75 * 3 * 4 / 19))
    n9 = int(round(round(idf * tfp, 9) * 1e9))
    want = ((n9 + 500) // 1000) / 1e6
    assert rows[1][1] == want


def test_bm25_topk_dataframe_queries_and_k(spark):
    from rainforest_spark.operators.text_analysis import bm25_topk

    df = spark.createDataFrame(
        [(i, "common term " + ("extra" if i % 2 else "word"))
         for i in range(6)], "doc_id long, text string")
    qdf = spark.createDataFrame([(7, "common")], "qid long, qt string")
    got = bm25_topk(df, "doc_id", "text", qdf, k=4).collect()
    assert len(got) == 4                    # k enforced
    assert {r.query_id for r in got} == {7}
    assert [r.rnk for r in sorted(got, key=lambda r: r.rnk)] == \
        [1, 2, 3, 4]


def test_length_histogram_golden(spark):
    from rainforest_spark.operators.text_analysis import length_histogram

    df = spark.createDataFrame(
        [("s0", "a b c"), ("s0", " ".join(["w"] * 70)),
         ("s0", "x y"), ("s1", "q")],
        "source string, text string")
    got = {(r.source, r.len_lo): (r.n_docs, r.share)
           for r in length_histogram(df, "source", "text",
                                     bin_width=64).collect()}
    assert got == {("s0", 0): (2, round(2 / 3, 6)),
                   ("s0", 64): (1, round(1 / 3, 6)),
                   ("s1", 0): (1, 1.0)}


def test_source_concentration_golden(spark):
    from rainforest_spark.operators.text_analysis import (
        source_concentration,
    )

    df = spark.createDataFrame(
        [("a", " ".join(["w"] * 10)), ("b", " ".join(["w"] * 30)),
         ("c", " ".join(["w"] * 60))], "source string, text string")
    rows = {r.source: r for r in
            source_concentration(df, "source", "text").collect()}
    # masses 10/30/60: Gini = (2*(1*10+2*30+3*60) - 4*100)/(3*100)
    assert rows["c"].rank == 1 and rows["c"].cum_share == 0.6
    assert rows["b"].rank == 2 and rows["b"].cum_share == 0.9
    assert rows["a"].rank == 3 and rows["a"].cum_share == 1.0
    assert all(r.gini == round(1 / 3, 6) for r in rows.values())
    # perfectly equal corpus -> Gini 0
    eq = spark.createDataFrame(
        [(s, "w w") for s in "abc"], "source string, text string")
    assert all(r.gini == 0.0 for r in
               source_concentration(eq, "source", "text").collect())


def test_type_token_ratio_golden(spark):
    from rainforest_spark.operators.text_analysis import type_token_ratio

    df = spark.createDataFrame(
        [("s0", "a a b"), ("s1", "x y z")], "source string, text string")
    got = {r.source: (r.n_tokens, r.n_types, r.ttr)
           for r in type_token_ratio(df, "source", "text").collect()}
    assert got == {"s0": (3, 2, round(2 / 3, 6)), "s1": (3, 3, 1.0)}


def test_rrf_fusion_golden(spark):
    from rainforest_spark.operators.similarity import rrf_fusion

    # query 0: item 10 is #1 lexically, #3 densely; item 11 only dense
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 12, 2), (1, 20, 1)],
        "query_id long, item_id long, rnk long")
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 10, 3), (1, 20, 2)],
        "query_id long, item_id long, rnk long")
    got = {(r.query_id, r.item_id): (r.fused_rnk, r.rrf_score)
           for r in rrf_fusion([a, b], item_col="item_id",
                               k_const=60, k=10).collect()}
    exp = {
        (0, 10): 1.0 / 61 + 1.0 / 63,   # both lists
        (0, 11): 1.0 / 61,              # dense only
        (0, 12): 1.0 / 62,              # lexical only
        (1, 20): 1.0 / 61 + 1.0 / 62,
    }
    order0 = sorted([k for k in exp if k[0] == 0],
                    key=lambda k: (-exp[k], k[1]))
    for rnk, key in enumerate(order0, 1):
        assert got[key] == (rnk, exp[key]), key
    assert got[(1, 20)] == (1, exp[(1, 20)])


def test_rrf_fusion_single_list_and_empty_error(spark):
    import pytest

    from rainforest_spark.operators.similarity import rrf_fusion

    a = spark.createDataFrame([(0, 10, 1), (0, 11, 2)],
                              "query_id long, item_id long, rnk long")
    got = [(r.item_id, r.fused_rnk)
           for r in rrf_fusion([a], item_col="item_id", k=1).collect()]
    assert got == [(10, 1)]
    with pytest.raises(ValueError, match="at least one"):
        rrf_fusion([], item_col="item_id")


def test_relative_quality_filter_reference(spark):
    from rainforest_spark.operators.text_analysis import (
        LANG_STOPWORDS, relative_quality_filter)

    docs = [
        # (id, source, text) — source A: 3 docs, keep ceil(3/2)=2
        (0, "A", "the cat and the dog"),
        (1, "A", "1234 5678 !!!"),
        (2, "A", "plain words without stopwords"),
        (10, "B", "of mice and men"),
        (11, "B", "zz9 %% ##"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    sw = set(LANG_STOPWORDS["en"])

    def score(text):
        toks = text.strip().split()
        n_sw = sum(1 for t in toks if t.lower() in sw)
        import re
        punct = len(re.findall(r"[^\w\s]", text))
        digit = len(re.findall(r"[0-9]", text))
        return n_sw / len(toks) - punct / len(text) - digit / len(text)

    exp = {}
    for src, n_keep in (("A", 2), ("B", 1)):
        grp = sorted((d for d in docs if d[1] == src),
                     key=lambda d: (-score(d[2]), d[0]))
        for rnk, d in enumerate(grp[:n_keep], 1):
            exp[d[0]] = (src, round(score(d[2]), 6), rnk, len(grp))

    got = {r.doc_id: (r.source, r.quality, r.rnk, r.n_group)
           for r in relative_quality_filter(
               df, "doc_id", "text", "source").collect()}
    assert got == exp


# --------------------- round-8: embedding covariance / Gram scale path

def test_embedding_covariance_matches_numpy(spark):
    import numpy as np
    import pytest

    from rainforest_spark.operators.similarity import embedding_covariance
    rng = np.random.RandomState(13)
    d, n = 6, 300
    base = rng.randn(n, d).astype(np.float32)
    base[:, 3] = base[:, 1] * 2.0          # perfectly correlated pair
    base[:, 5] = 0.25                      # zero-variance dim
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    got = {(r["i"], r["j"]): r for r in
           embedding_covariance(df, "embedding", d).collect()}
    assert len(got) == d * (d + 1) // 2
    C = np.cov(base.astype(np.float64), rowvar=False)
    for (i, j), r in got.items():
        assert r["n"] == n
        assert r["cov"] == pytest.approx(C[i, j], abs=5e-6)
    # corr contracts: the engineered pair is ~1, the dead dim is NULL
    assert got[(1, 3)]["corr"] == pytest.approx(1.0, abs=1e-4)
    assert got[(5, 5)]["corr"] is None and got[(0, 5)]["corr"] is None
    assert abs(got[(5, 5)]["cov"]) < 1e-6


def test_gram_accumulate_matches_exact_reduction(spark):
    import numpy as np
    import pytest

    from rainforest_spark.operators.similarity import gram_accumulate
    rng = np.random.RandomState(29)
    d, n = 8, 500
    X = rng.randn(n, d).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>").repartition(7)
    got = {(r["i"], r["j"]): r for r in
           gram_accumulate(df, "embedding", d).collect()}
    Xd = X.astype(np.float64)
    G, S = Xd.T @ Xd, Xd.sum(axis=0)
    assert len(got) == d * (d + 1) // 2
    for (i, j), r in got.items():
        assert r["n"] == n
        assert r["sum_prod"] == pytest.approx(G[i, j], rel=1e-12)
        assert r["sum_i"] == pytest.approx(S[i], rel=1e-12)
        assert r["sum_j"] == pytest.approx(S[j], rel=1e-12)
