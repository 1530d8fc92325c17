"""Persisted IVF index: build-once/probe-many equals the in-memory
path bit-for-bit, and probing prunes unprobed list partitions."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from rainforest_spark.operators.similarity import (
    build_ivf_index, ivf_topk_fixed, ivf_topk_index,
)

CENTROIDS = [3, 57, 111, 222, 333, 404, 449, 480]
QUERIES = list(range(12))


def test_index_results_match_in_memory(spark, tmp_path):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(e, "vec_id", "embedding", idx, CENTROIDS)

    qdf = e.filter(F.col("vec_id").isin(QUERIES))
    got = (ivf_topk_index(spark, idx, qdf, "vec_id", "embedding",
                          k=3, nprobe=3)
           .orderBy("query_id", "rnk").collect())
    want = (ivf_topk_fixed(e, "vec_id", "embedding",
                           F.col("vec_id").isin(QUERIES), CENTROIDS,
                           k=3, nprobe=3)
            .orderBy("query_id", "rnk").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    assert len(got) == len(QUERIES) * 3


def test_index_layout_partitioned_by_list(spark, tmp_path):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(e, "vec_id", "embedding", idx, CENTROIDS)
    dirs = sorted(glob.glob(f"{idx}/lists/list_id=*"))
    assert len(dirs) == len(CENTROIDS)
    # every corpus vector is in exactly one list
    lists = spark.read.parquet(f"{idx}/lists")
    assert lists.count() == e.count()
    assert lists.select("vec_id").distinct().count() == e.count()


def test_probe_scan_prunes_partitions(spark, tmp_path):
    """The probed-list filter must reach the scan as a PartitionFilter
    over literals — the read-side payoff of the partitioned layout."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(e, "vec_id", "embedding", idx, CENTROIDS)
    qdf = e.filter(F.col("vec_id").isin(QUERIES[:3]))
    df = ivf_topk_index(spark, idx, qdf, "vec_id", "embedding",
                        k=3, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[[^\]]*list_id[^\]]*IN \(([^)]*)\)",
                  plan)
    assert m, f"no list_id partition filter in plan:\n{plan[:2000]}"
    n_probed = len(m.group(1).split(","))
    assert n_probed < len(CENTROIDS), "probe scan did not prune any list"


def test_ivf_append_equals_fresh_build(spark, tmp_path):
    """Appending a batch against the frozen codebook lands every vector
    in the list a fresh build over the union gives it, and probes see
    the appended rows bit-identically to the full rebuild."""
    from rainforest_spark.operators.similarity import ivf_append

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    old = e.filter(F.col("vec_id") % 7 != 0)
    new = e.filter(F.col("vec_id") % 7 == 0)

    inc = str(tmp_path / "inc")
    build_ivf_index(old, "vec_id", "embedding", inc, CENTROIDS)
    ivf_append(spark, inc, new, "vec_id", "embedding")

    full = str(tmp_path / "full")
    build_ivf_index(e, "vec_id", "embedding", full, CENTROIDS)

    la = (spark.read.parquet(f"{inc}/lists")
          .select("vec_id", "list_id").orderBy("vec_id").collect())
    lb = (spark.read.parquet(f"{full}/lists")
          .select("vec_id", "list_id").orderBy("vec_id").collect())
    assert [r.asDict() for r in la] == [r.asDict() for r in lb]

    qdf = e.filter(F.col("vec_id").isin(QUERIES))
    got = (ivf_topk_index(spark, inc, qdf, "vec_id", "embedding",
                          k=3, nprobe=3)
           .orderBy("query_id", "rnk").collect())
    want = (ivf_topk_index(spark, full, qdf, "vec_id", "embedding",
                           k=3, nprobe=3)
            .orderBy("query_id", "rnk").collect())
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_default_build_is_kmeans_fit_and_beats_chance(spark, tmp_path):
    """VERDICT r10 #2: the persisted-index build DEFAULT is the
    KMeans-fit quantizer, and its recall@5 at a fixed candidate
    budget is measurably ABOVE the scan fraction (chance level) — the
    property the q203 calibration showed the fixed codebook lacks.
    Also pins in-memory/persisted parity for the fit codebook."""
    from rainforest_spark.operators.similarity import (
        cosine_topk, ivf_topk,
    )
    from rainforest_spark.tools.ivf_quality import recall_at_k

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n = e.count()
    idx = str(tmp_path / "ivf_fit")
    build_ivf_index(e, "vec_id", "embedding", idx,
                    n_centroids=16, seed=42)   # no centroid_ids: fit

    pred = F.col("vec_id") % 10 == 0           # ~n/10 queries
    qdf = e.filter(pred)
    exact = cosine_topk(e, "vec_id", "embedding", pred,
                        k=5).localCheckpoint()
    got = ivf_topk_index(spark, idx, qdf, "vec_id", "embedding",
                         k=5, nprobe=2).localCheckpoint()
    lists = spark.read.parquet(f"{idx}/lists")
    sizes = {r["list_id"]: r["n"] for r in
             lists.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()}
    scan_fraction = 2.0 / 16.0                 # nprobe / n_lists bound
    recall = recall_at_k(exact, got, 5)
    assert recall >= 2.0 * scan_fraction, (
        f"fit quantizer recall@5 {recall:.3f} not above chance "
        f"{scan_fraction:.3f} at nprobe=2/16 — default quantizer "
        f"regressed to chance level")
    # the persisted fit index replays the in-memory fit path:
    # same codebook (seed-pinned KMeans) => same topk
    mem = ivf_topk(e, "vec_id", "embedding", pred, k=5,
                   n_centroids=16, nprobe=2, seed=42)
    a = {(r["query_id"], r["rnk"]): r["neighbor_id"]
         for r in got.collect()}
    b = {(r["query_id"], r["rnk"]): r["neighbor_id"]
         for r in mem.collect()}
    assert a == b
    # lists stay reasonably balanced (no single mega-list)
    import numpy as np
    c = np.array(list(sizes.values()), dtype=float)
    assert c.max() / c.mean() < 4.0


def test_manifest_quality_probe_two_tiers(spark, tmp_path):
    """VERDICT r11 #4: every index build records a quality probe in
    {path}/manifest.json — recall@5-vs-chance + list balance for the
    CHOSEN codebook AND the alternative variant — because the r11
    curves showed fit/fixed trading places with corpus size.  Gate at
    two tiers: the fit default must measure above chance on its own
    manifest at sf0.001 AND sf0.01, and the fixed exhibit's manifest
    must record a kmeans-sample alternative."""
    import json
    import os

    for tier, sf in (("t1", "/root/testdata/sf0.001"), ("t2", SF_DIR)):
        e = spark.read.parquet(f"{sf}/embeddings.parquet")
        idx = str(tmp_path / f"fit_{tier}")
        build_ivf_index(e, "vec_id", "embedding", idx,
                        n_centroids=8, seed=42)
        with open(os.path.join(idx, "manifest.json")) as fh:
            m = json.load(fh)
        assert m["quantizer"] == "kmeans_fit"
        ch = m["probe"]["chosen"]
        assert ch["n_sample"] > 0 and ch["n_queries"] > 0
        assert ch["recall5_over_chance"] is not None
        assert ch["recall5_over_chance"] > 1.0, (
            f"{tier}: fit default at/below chance on its own manifest "
            f"probe: {ch}")
        assert ch["balance_max_over_mean"] < 4.0
        alt = m["probe"]["alternative"]
        assert alt["variant"] == "fixed_spread_by_id"
        assert alt["recall5_over_chance"] is not None
        assert isinstance(m["probe"]["alt_better"], bool)

    # fixed exhibit: manifest records the sample-KMeans alternative
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "fixed")
    import warnings as _w
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        build_ivf_index(e, "vec_id", "embedding", idx, CENTROIDS)
    with open(os.path.join(idx, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["quantizer"] == "fixed_ids"
    assert m["probe"]["alternative"]["variant"] == "kmeans_fit_sample"
    # r13: the manifest records the probe's REGIME — the second,
    # smaller probe scale either agrees (verdict trustworthy) or the
    # verdict flips (scale-dependent; the full-corpus instrument must
    # adjudicate).  The rebuild warning fires IFF the alternative won
    # AND the scales agree; a flip fires the scale-dependence warning
    # instead.
    assert m["probe_regime"] in ("consistent", "flips_with_sample_size",
                                 "single_scale_only")
    if m["probe_regime"] != "single_scale_only":
        assert m["probe_small"]["alternative"]["recall5_over_chance"] \
            is not None
    rebuild_warned = any("NON-default quantizer" in str(w.message)
                         for w in caught)
    flip_warned = any("FLIPS between" in str(w.message) for w in caught)
    assert rebuild_warned == (m["probe"]["alt_better"]
                              and m["probe_regime"] != "flips_with_sample_size")
    assert flip_warned == (m["probe_regime"] == "flips_with_sample_size")

    # probe off: no manifest, build otherwise intact
    idx2 = str(tmp_path / "noprobe")
    build_ivf_index(e, "vec_id", "embedding", idx2, CENTROIDS,
                    quality_probe=False)
    assert not os.path.exists(os.path.join(idx2, "manifest.json"))
    assert os.path.isdir(os.path.join(idx2, "lists"))


def test_manifest_probe_flip_regime(spark, tmp_path, monkeypatch):
    """VERDICT r12 #4, the observed failure mode: the sample-level
    verdict disagreeing with itself across probe scales (sf10 read
    the fit ahead on the 4096-probe while the full-corpus instrument
    read the fixed codebook ahead).  Controlled reproduction: pin the
    probe stats so the alternative wins at the full scale and loses
    at the small scale — the manifest must record
    probe_regime='flips_with_sample_size' and the build must warn
    about scale-dependence INSTEAD of recommending a rebuild."""
    import json
    import os
    import warnings as _w

    import rainforest_spark.operators.similarity as S

    real = S._ivf_probe_stats
    calls = {"n": 0}

    def rigged(X, C, n_queries):
        out = real(X, C, n_queries)
        calls["n"] += 1
        # call order: full(chosen, alt), small(chosen, alt)
        rigged_vals = {1: 2.0, 2: 3.0,     # full scale: alt wins
                       3: 2.0, 4: 1.0}     # small scale: alt loses
        out["recall5_over_chance"] = rigged_vals[calls["n"]]
        return out

    monkeypatch.setattr(S, "_ivf_probe_stats", rigged)
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    idx = str(tmp_path / "flip")
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        build_ivf_index(e, "vec_id", "embedding", idx, CENTROIDS)
    with open(os.path.join(idx, "manifest.json")) as fh:
        m = json.load(fh)
    assert m["probe_regime"] == "flips_with_sample_size"
    assert m["probe"]["alt_better"] is True
    assert m["probe_small"]["alt_better"] is False
    msgs = [str(w.message) for w in caught]
    assert any("FLIPS between" in s and "ivf_quality" in s
               for s in msgs), msgs
    assert not any("NON-default quantizer" in s for s in msgs), msgs
