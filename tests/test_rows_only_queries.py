"""Rows-only workload entries (no SQL oracle): run at sf0.01 and check
rows/schema stability — exactly the driver's weaker check, plus
determinism across two runs where cheap.

As of round 5 the set is EMPTY — every registered query is
oracle-paired (q49/q70 were the last, via the lossless-codec oracle) —
so the parametrized check is a tripwire for future oracle-less
additions and `test_every_query_is_oracle_paired` pins the milestone."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from rainforest_spark.workload import all_oracles, all_queries

ROWS_ONLY = sorted(set(all_queries()) - set(all_oracles()))


def test_every_query_is_oracle_paired():
    assert ROWS_ONLY == [], (
        f"queries without a DuckDB oracle: {ROWS_ONLY} — pair them or "
        f"document why they are non-SQL-expressible")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(pdf) > 0, f"{name} returned no rows"
    assert len(pdf.columns) > 0


def test_simhash_deterministic(spark):
    q = all_queries()["q46_simhash"]
    a = q(spark, SF_DIR).toPandas().sort_values("doc_id", ignore_index=True)
    b = q(spark, SF_DIR).toPandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_ann_recall_vs_exact(spark):
    """LSH-ANN neighbours must be a plausible subset: every returned
    neighbour's similarity must match the exact top-k computation for
    that pair (correct scores, possibly fewer pairs)."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.similarity import cosine_topk

    ann = all_queries()["q47_ann_lsh_topk"](spark, SF_DIR).toPandas()
    exact = cosine_topk(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "vec_id", "embedding", F.col("vec_id") < 20, k=500).toPandas()
    merged = ann.merge(exact, on=["query_id", "neighbor_id"],
                       suffixes=("_ann", "_exact"))
    assert len(merged) == len(ann), "ANN returned a pair exact scoring lacks"
    assert (merged["sim_ann"] == merged["sim_exact"]).all()


def test_ivf_recall(spark):
    """IVF ANN: returned sims must equal exact sims for those pairs, and
    recall@1 against the exact top-1 must be well above chance."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pred = F.col("vec_id") < 20
    ivf = ivf_topk(emb, "vec_id", "embedding", pred, k=3,
                   n_centroids=8, nprobe=3).toPandas()
    exact = cosine_topk(emb, "vec_id", "embedding", pred, k=1).toPandas()
    top1 = dict(zip(exact["query_id"], exact["neighbor_id"]))
    hits = sum(1 for _, r in ivf[ivf["rnk"] == 1].iterrows()
               if top1.get(r["query_id"]) == r["neighbor_id"])
    assert len(ivf) > 0
    recall = hits / max(len(top1), 1)
    assert recall >= 0.5, f"IVF recall@1 too low: {recall}"


def test_embedding_neardup_lsh_recall(spark):
    """q54's LSH candidate generation: every reported pair must carry the
    exact cosine (no false sims), and recall vs the brute-force all-pairs
    truth must be well above chance — the documented LSH trade."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.similarity import _norm, with_double_vec

    lsh = all_queries()["q54_embedding_neardup"](spark, SF_DIR).toPandas()
    v = with_double_vec(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "embedding", "v").select("vec_id", "v", _norm("v").alias("nrm"))
    a = v.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    brute = (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos_sim", F.round(
                 F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), "
                        "CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
                 / (F.col("na") * F.col("nb")), 6))
             .filter(F.col("cos_sim") >= 0.35)
             .select("id_a", "id_b", "cos_sim").toPandas())
    merged = lsh.merge(brute, on=["id_a", "id_b"], suffixes=("_l", "_b"))
    assert len(merged) == len(lsh), "LSH reported a pair brute force lacks"
    assert (merged["cos_sim_l"] == merged["cos_sim_b"]).all()
    recall = len(lsh) / max(len(brute), 1)
    assert recall >= 0.3, f"LSH recall too low: {recall}"


def test_simhash_neardup_pairs(spark):
    """Near-identical docs must pair with small hamming; unrelated docs
    must not appear at a tight threshold."""
    import pandas as pd

    from rainforest_spark.operators.dedup import simhash_neardup_pairs

    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight") * 3
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [base, base + " extra token", "completely different words "
                 "about spark shuffles and parquet column pruning " * 5]})
    out = simhash_neardup_pairs(spark.createDataFrame(docs), "doc_id",
                                "text", max_hamming=12).toPandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_verified_pairs_matches_exact(spark):
    """The LSH-prefiltered pipeline must return exactly the exact-Jaccard
    scores for every pair it reports, and at a high threshold it must
    find the same pairs as the all-pairs computation (near-identical
    docs always collide in some band)."""
    from rainforest_spark.operators.dedup import (
        minhash_verified_pairs, ngram_jaccard_pairs,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    fast = minhash_verified_pairs(docs, "doc_id", "text",
                                  threshold=0.5).toPandas()
    exact = ngram_jaccard_pairs(docs, "doc_id", "text",
                                threshold=0.5).toPandas()
    merged = fast.merge(exact, on=["id_a", "id_b"], suffixes=("_f", "_e"))
    assert len(merged) == len(fast), "pipeline reported a non-exact pair"
    assert (merged["jaccard_f"] == merged["jaccard_e"]).all()
    recall = len(fast) / max(len(exact), 1)
    assert recall >= 0.9, f"candidate recall too low at 0.5: {recall}"


def test_bpe_ish_tokenizer_golden(spark):
    """The BPE-ish pre-tokenizer splits contractions, digit runs and
    punctuation runs like the GPT-2 pattern (modulo the lookahead-free
    whitespace branch)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rainforest_spark.operators.text_analysis import bpe_ish_tokens

    df = spark.createDataFrame(pd.DataFrame({
        "text": ["isn't 42 cats!!", "hello  world"]}))
    out = df.select(bpe_ish_tokens("text").alias("t")).collect()
    assert out[0].t == ["isn", "'t", " 42", " cats", "!!"]
    # double space: first space becomes a lone \s token, second glues to
    # the word (the lookahead-free deviation from the exact GPT-2 regex)
    assert out[1].t == ["hello", " ", " world"]


def test_neardup_clusters_components(spark):
    """Min-label propagation finds connected components: a 4-node chain
    (only adjacent pairs linked) collapses to one cluster labeled by its
    min id; disjoint pairs stay separate; untouched docs absent."""
    import pandas as pd

    from rainforest_spark.operators.dedup import neardup_clusters

    pairs = spark.createDataFrame(pd.DataFrame({
        # chain 10-11-12-13 (diameter 3 → needs >1 propagation round)
        # plus isolated component {20, 21}
        "id_a": [10, 11, 12, 20],
        "id_b": [11, 12, 13, 21]}))
    out = neardup_clusters(pairs).toPandas()
    lab = out.set_index("doc_id")["cluster_id"].to_dict()
    assert lab == {10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}


def test_documents_text_is_ascii(spark):
    """Every multimodal codec oracle (q49/q70-q74, q111) equates DuckDB's
    ascii(substr(text, i, 1)) with the i-th UTF-8 BYTE — valid only
    while the driver's documents.text stays pure ASCII.  q73 is the
    sharpest dependency: its WAV encoder narrows (uint16 - 16384) to
    int16, which would WRAP (not just shift positions) for byte pairs
    whose high byte >= 128, i.e. the first multibyte character breaks
    it silently.  If a testdata regeneration introduces multibyte
    characters, fail HERE with a clear message instead of as a
    mysterious hash mismatch."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bad = docs.filter(
        F.octet_length("text") != F.length("text")).count()
    assert bad == 0, (
        f"{bad} documents contain non-ASCII text — the q49/q70-q74/q111 "
        f"byte-position oracles need rewriting against UTF-8 bytes "
        f"(q73's int16 sample narrowing wraps on high bytes >= 0x80)")


def test_q54_auto_planes_match_frozen_oracle(spark):
    """q54_auto's oracle inlines the SAME plane literals as q54 — valid
    only while auto_planes(count(embeddings@sf0.01)=500, 64) lands on
    the 3-plane floor with seed 4242 (bit-identical to the frozen
    _ND_P).  A testdata regeneration at a different embeddings count
    would re-size the auto path and silently break the pairing; fail
    HERE with a clear message instead."""
    import numpy as np

    from rainforest_spark.operators.similarity import auto_planes
    from rainforest_spark.workload.extended import _ND_P

    n = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    auto = auto_planes(n, 64)
    assert auto.shape == _ND_P.shape, (
        f"embeddings count {n} auto-sizes to {auto.shape[1]} planes != "
        f"frozen q54 planes {_ND_P.shape[1]} — re-derive the "
        f"q54_auto_embedding_neardup oracle literals for the new count")
    np.testing.assert_array_equal(auto, _ND_P)


def test_auto_planes_sizing():
    """Plane count grows log2 with the corpus so per-bucket occupancy —
    and with it the LSH candidate count — stays ~constant per vector."""
    from rainforest_spark.operators.similarity import auto_planes

    assert auto_planes(2_000, 64).shape == (2, 4, 64)
    assert auto_planes(20_000, 64).shape == (2, 7, 64)
    assert auto_planes(1_000_000, 64).shape == (2, 13, 64)
    assert auto_planes(10, 64).shape[1] == 3          # floor
    assert auto_planes(10**12, 64).shape[1] == 24     # cap
    # deterministic per (N-bucket, dim, seed)
    import numpy as np
    np.testing.assert_array_equal(auto_planes(20_000, 64),
                                  auto_planes(20_000, 64))


def test_pack_contiguous_matches_pandas(spark):
    """Concat-and-chunk invariants vs a sequential pandas reference:
    bin of each doc = floor(cum_tokens_before / budget); bins are
    monotone in doc order; every bin's FIRST doc starts inside it."""
    import numpy as np
    import pandas as pd

    from rainforest_spark.operators.packing import pack_contiguous

    rng = np.random.RandomState(3)
    toks = rng.randint(0, 300, size=500)
    pdf = pd.DataFrame({"doc_id": np.arange(500), "n_tokens": toks})
    out = (pack_contiguous(spark.createDataFrame(pdf), "doc_id",
                           "n_tokens", budget=512)
           .toPandas().sort_values("doc_id", ignore_index=True))
    before = np.concatenate([[0], np.cumsum(toks)[:-1]])
    np.testing.assert_array_equal(out["bin_id"], before // 512)
    assert (out["bin_id"].diff().dropna() >= 0).all()


def test_split_assign_stable_and_proportional(spark):
    """Hash split: ~90/5/5 proportions, and assignments NEVER move when
    the table grows (contamination control) — the first 1000 ids get
    identical labels whether or not 1000 more exist."""
    from rainforest_spark.operators.packing import split_assign

    small = spark.range(1000).withColumnRenamed("id", "doc_id")
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in split_assign(small, "doc_id").collect()}
    b = {r.doc_id: r.split for r in split_assign(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())
    from collections import Counter
    c = Counter(b.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert 0.02 < c["val"] / 2000 < 0.09
    assert 0.02 < c["test"] / 2000 < 0.09
    # a different salt redraws
    c2 = {r.doc_id: r.split
          for r in split_assign(small, "doc_id", salt="v2").collect()}
    assert any(c2[k] != a[k] for k in a)


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization on 64-dim vectors barely moves cosine: recall@3
    vs the exact fp top-3 must be high, and every reported sim must lie
    within the quantization error band of the exact sim."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.similarity import (
        cosine_topk, cosine_topk_quantized,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pred = F.col("vec_id") < 20
    qk = cosine_topk_quantized(emb, "vec_id", "embedding", pred,
                               k=3).toPandas()
    ex = cosine_topk(emb, "vec_id", "embedding", pred, k=3).toPandas()
    exact_pairs = set(map(tuple, ex[["query_id", "neighbor_id"]]
                          .to_numpy()))
    hits = sum((q, n) in exact_pairs for q, n in
               qk[["query_id", "neighbor_id"]].to_numpy())
    assert hits / len(ex) >= 0.8, f"quantized recall@3 {hits/len(ex)}"
    # sim error bounded by the int8 step (~1/127 per lane, amplified by
    # normalization — generous band)
    full = cosine_topk(emb, "vec_id", "embedding", pred, k=500).toPandas()
    m = qk.merge(full, on=["query_id", "neighbor_id"],
                 suffixes=("_q", "_f"))
    assert len(m) == len(qk)
    assert (m["sim_q"] - m["sim_f"]).abs().max() < 0.02


def test_pack_contiguous_grouped_per_tape(spark):
    """group_cols packs one tape per group: each group's bins restart at
    0 and match the per-group pandas reference."""
    import numpy as np
    import pandas as pd

    from rainforest_spark.operators.packing import pack_contiguous

    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({
        "lang": np.repeat(["de", "fr", "it"], 200),
        "doc_id": np.arange(600),
        "n_tokens": rng.randint(0, 300, size=600)})
    out = (pack_contiguous(spark.createDataFrame(pdf), "doc_id",
                           "n_tokens", budget=512, group_cols=["lang"])
           .toPandas().sort_values("doc_id", ignore_index=True))
    for lang, grp in pdf.groupby("lang"):
        g = grp.sort_values("doc_id")
        before = np.concatenate([[0], np.cumsum(g["n_tokens"])[:-1]])
        got = out[out["lang"] == lang].sort_values("doc_id")["bin_id"]
        np.testing.assert_array_equal(got.to_numpy(), before // 512)
        assert got.iloc[0] == 0


def test_chunk_text_overlap_and_edges(spark):
    """Chunk windows: stride = chunk - overlap, a last partial window
    is kept only if it adds content beyond the previous tail,
    consecutive chunks share exactly `overlap` chars, empty and null
    docs yield one empty chunk (no silent drop)."""
    import pandas as pd

    from rainforest_spark.operators.text_analysis import chunk_text

    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                         "text": ["abcdefghij", "abc", "", None]})
    out = (chunk_text(spark.createDataFrame(docs), "doc_id", "text",
                      chunk_chars=6, overlap=2)
           .toPandas().sort_values(["doc_id", "chunk_idx"],
                                   ignore_index=True))
    d1 = out[out.doc_id == 1]["chunk"].tolist()
    # stride 4: windows [1..6], [5..10]; a third window [9..10] would
    # be a strict suffix of [5..10] (<= overlap chars) and is not cut
    assert d1 == ["abcdef", "efghij"]
    assert all(a[-2:] == b[:2] for a, b in zip(d1, d1[1:]) if len(b) >= 2)
    assert out[out.doc_id == 2]["chunk"].tolist() == ["abc"]
    assert out[out.doc_id == 3]["chunk"].tolist() == [""]
    assert out[out.doc_id == 4]["chunk"].tolist() == [""]


def test_repetition_signals_golden(spark):
    """Repetition ratio: fully repeated text → high ratio; unique text →
    0; sub-5-token doc → NULL; email/url counters count."""
    import pandas as pd

    from rainforest_spark.operators.text_analysis import repetition_signals

    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [
        "spam ham " * 20,                       # 40 tokens, 2 distinct 5-grams
        "one two three four five six seven",    # all distinct
        "too short",                            # < 5 tokens
        "mail me at a@b.co or x.y@z.org see https://a.b/c and http://d.e"]})
    out = repetition_signals(spark.createDataFrame(docs), "doc_id",
                             "text").toPandas().set_index("doc_id")
    assert out.loc[1, "dup_ngram_ratio"] > 0.9
    assert out.loc[2, "dup_ngram_ratio"] == 0.0
    assert pd.isna(out.loc[3, "dup_ngram_ratio"])
    assert out.loc[4, "n_emails"] == 2 and out.loc[4, "n_urls"] == 2


def test_contamination_overlap_golden(spark):
    """A training doc containing a verbatim eval 8-gram is flagged with
    the right count; disjoint docs are absent."""
    import pandas as pd

    from rainforest_spark.operators.text_analysis import (
        contamination_overlap,
    )

    ev_text = "the capital of france is paris said the guide"   # 9 toks
    train = pd.DataFrame({"doc_id": [1, 2], "text": [
        "q: " + ev_text + " indeed",      # contains both eval 8-grams
        "entirely different words about spark and parquet and shuffles "
        "and pruning here now"]})
    ev = pd.DataFrame({"doc_id": [100], "text": [ev_text]})
    out = contamination_overlap(spark.createDataFrame(train),
                                spark.createDataFrame(ev),
                                "doc_id", "text", n=8).toPandas()
    got = out.set_index("train_id")["n_shared_grams"].to_dict()
    assert got == {1: 2}
