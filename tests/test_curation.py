"""End-to-end corpus curation: the full chain runs as one plan and the
output satisfies every stage's invariant simultaneously."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from rainforest_spark.operators.curation import (
    CurationConfig, curate_corpus,
)
from rainforest_spark.operators.text_analysis import (
    EMAIL_PATTERN, URL_PATTERN, fingerprint, token_count,
)


@pytest.fixture(scope="module")
def curated(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # synthesize PII + a hard duplicate so those stages do real work
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 50 == 0,
               F.concat(F.col("text"), F.lit(" mail me: x@example.com")))
        .otherwise(F.col("text")))
    clone = (docs.filter(F.col("doc_id") < 5)
             .withColumn("doc_id", F.col("doc_id") + 100000))
    docs = docs.unionByName(clone)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    cfg = CurationConfig(min_tokens=10, max_dup_ngram_ratio=0.5,
                         mixture_rates={"src0": 0.0},
                         mixture_default_rate=1.0,
                         cap_per_source=40, shard_size=32)
    counts: dict = {}
    out = curate_corpus(docs, "doc_id", "text", "source",
                        config=cfg, eval_docs=eval_docs,
                        stage_counts=counts).cache()
    return docs, out, counts


def test_stage_counts_monotone(curated):
    docs, out, counts = curated
    order = ["input", "quality", "redacted", "exact_dedup", "near_dedup",
             "decontaminated", "mixed", "output"]
    assert list(counts) == order
    vals = [counts[s] for s in order]
    assert vals == sorted(vals, reverse=True)
    assert counts["output"] == out.count()
    assert counts["input"] == docs.count()
    # the synthetic clones guarantee exact-dedup dropped something
    assert counts["exact_dedup"] < counts["redacted"]
    # decontamination dropped the eval docs themselves (self-overlap)
    assert counts["decontaminated"] < counts["near_dedup"]


def test_output_invariants(curated):
    docs, out, counts = curated
    n = out.count()
    # no exact duplicates survive
    assert out.select(fingerprint("text")).distinct().count() == n
    # PII is gone from the shipped text
    assert out.filter(
        F.col("text").rlike(EMAIL_PATTERN)
        | F.col("text").rlike(URL_PATTERN)).count() == 0
    # quality floor holds
    assert out.filter(token_count("text") < 10).count() == 0
    # mixture dropped src0 entirely
    assert out.filter(F.col("source") == "src0").count() == 0
    # per-source cap respected
    over = (out.groupBy("source").agg(F.count("*").alias("c"))
            .filter(F.col("c") > 40))
    assert over.count() == 0
    # every row has a split; only train rows have shards, and the
    # train-shard positions are a contiguous 0..k-1 permutation
    assert out.filter(F.col("split").isNull()).count() == 0
    train = out.filter(F.col("split") == "train")
    assert train.filter(F.col("shard_id").isNull()).count() == 0
    assert (out.filter(F.col("split") != "train")
            .filter(F.col("shard_id").isNotNull()).count() == 0)
    pos = sorted(r.epoch_pos for r in train.select("epoch_pos").collect())
    assert pos == list(range(len(pos)))


def test_single_lazy_plan(spark):
    """Without stage_counts the chain must not trigger any FULL job at
    build time (the whole point of the lazy composition).  The one
    exception is ranged_cumsum's bounded, column-pruned partition-bound
    sampling (epoch sharding rides it) — those jobs run under the
    dedicated BOUNDS_JOB_GROUP, so every build-time job must belong to
    that group and nothing else."""
    from rainforest_spark.operators.windows import BOUNDS_JOB_GROUP
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None)) \
        | set(tracker.getJobIdsForGroup(BOUNDS_JOB_GROUP))
    out = curate_corpus(docs, "doc_id", "text", "source",
                        config=CurationConfig(mixture_rates=None,
                                              cap_per_source=None))
    ungrouped = set(tracker.getJobIdsForGroup(None)) - before
    assert not ungrouped, \
        f"build-time jobs outside the bounds-sampling group: {ungrouped}"
    assert "split" in out.columns and "shard_id" in out.columns


def test_contamination_hash_grams_equivalent(spark):
    """hash_grams=True must flag the same docs with the same counts as
    the exact-string path on a collision-free corpus."""
    from rainforest_spark.operators.text_analysis import (
        contamination_overlap,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 20 == 0)
    tr = docs.filter(F.col("doc_id") % 20 != 0)
    exact = {r.train_id: r.n_shared_grams for r in
             contamination_overlap(tr, ev, "doc_id", "text", n=8)
             .collect()}
    hashed = {r.train_id: r.n_shared_grams for r in
              contamination_overlap(tr, ev, "doc_id", "text", n=8,
                                    hash_grams=True).collect()}
    assert exact == hashed


def test_curate_cli(spark, tmp_path):
    """The curate subcommand end-to-end: parquet out, stage report on
    stdout, split partitioning on disk."""
    import io
    import json as _json
    from contextlib import redirect_stdout

    from rainforest_spark.cli import main

    out = str(tmp_path / "curated")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["curate", f"{SF_DIR}/documents.parquet", out,
                   "--cap-per-source", "40", "--shard-size", "32",
                   "--mixture-rates", '{"src0": 0.0}'])
    assert rc == 0
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["stages"]["output"] <= rep["stages"]["input"]
    got = spark.read.parquet(out)
    assert got.count() == rep["stages"]["output"]
    assert got.filter(F.col("source") == "src0").count() == 0
    assert set(r.split for r in got.select("split").distinct().collect()) \
        <= {"train", "val", "test"}


def test_ingest_cli(spark, tmp_path):
    import io
    import json as _json
    import os
    from contextlib import redirect_stdout

    from rainforest_spark.cli import main

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(f"{src}/s0.jsonl", "w") as fh:
        fh.write('{"doc_id": 1, "text": "hello world", "lang": "en", '
                 '"source": "s", "n_chars": 11}\n')
        fh.write('not json at all\n')
    out, quar = str(tmp_path / "out"), str(tmp_path / "bad")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["ingest", src, out, "--quarantine", quar])
    assert rc == 0
    rep = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["rows"] == 1 and rep["quarantined"] == 1
    assert spark.read.parquet(out).first().text == "hello world"


def test_boilerplate_stage_strips_per_source(spark):
    # chrome repeats across every s0 doc -> stripped from all of them;
    # docs whose ENTIRE content is cross-doc repeated (the 10/11 pair
    # shares its prose too) are stripped to '' and dropped by the
    # re-applied length floor; the same chrome in a different source
    # is untouched (per-source DF)
    chrome = " ".join(f"nav{i}" for i in range(8))
    base = [(i, "s0", chrome + " " +
             " ".join(f"w{i} tok{j} unique{i * 37 + j}" for j in range(8)))
            for i in range(6)]
    shared_prose = " ".join(f"p{j} q{j} r{j}" for j in range(6))
    base += [(10, "s0", chrome + " " + shared_prose),
             (11, "s0", chrome + " " + shared_prose),
             (20, "s1", chrome + " " +
              " ".join(f"solo{j}" for j in range(8)))]
    docs = spark.createDataFrame(
        base, "doc_id long, source string, text string")
    cfg = CurationConfig(min_tokens=3, max_dup_ngram_ratio=1.0,
                         redact_pii=False, strip_boilerplate=True,
                         neardup_threshold=1.01)
    counts: dict = {}
    out = curate_corpus(docs, "doc_id", "text", "source",
                        config=cfg, stage_counts=counts)
    rows = {r.doc_id: r for r in out.collect()}
    assert counts["boilerplate"] == 7      # 6 prose docs + the s1 doc
    assert 10 not in rows and 11 not in rows
    assert all("nav0" not in rows[i].text for i in range(6))
    assert "nav0" in rows[20].text         # other source keeps chrome
    assert rows[0].boiler_removed == 1


def test_budget_stage_keeps_token_fraction(spark):
    # 8 all-distinct-word docs, 10..17 tokens (ties break on id): the
    # 1/2 budget of 108 tokens keeps exactly docs 0-4 (cum-before 46 <
    # 54 at doc4; doc5 sits at 60)
    docs = spark.createDataFrame(
        [(i, "s", " ".join(f"u{i}w{j}" for j in range(10 + i)))
         for i in range(8)],
        "doc_id long, source string, text string")
    cfg = CurationConfig(min_tokens=1, max_dup_ngram_ratio=1.0,
                         redact_pii=False, neardup_threshold=1.01,
                         token_budget=(1, 2))
    out = curate_corpus(docs, "doc_id", "text", "source", config=cfg)
    kept = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert kept == [0, 1, 2, 3, 4]
    kept_tokens = out.select(
        F.sum(token_count("text"))).collect()[0][0]
    total = docs.select(F.sum(token_count("text"))).collect()[0][0]
    assert kept_tokens * 2 >= total        # budget is COVERED


def test_bloom_ingest_gate_stream(spark, tmp_path):
    """Bloom prefilter on the ingest stream: every already-ingested
    document flags maybe_present (zero false negatives — the
    contractual half), and the definitely-new slice passes without
    touching the corpus; batch ≡ stream on the same rows."""
    import os

    import pandas as pd

    from rainforest_spark.operators.sketches import bloom_bits
    from rainforest_spark.operators.text_analysis import fingerprint
    from rainforest_spark.streaming.corpus import bloom_ingest_gate

    corpus = spark.createDataFrame(
        [(i, f"stored document number {i} body") for i in range(300)],
        "doc_id long, text string")
    bits = bloom_bits(
        corpus.withColumn("fingerprint", fingerprint("text")),
        "fingerprint", 65536, 4)

    arriving = ([(1000 + i, f"stored document number {i} body")
                 for i in range(0, 300, 23)]           # re-ingests
                + [(2000 + i, f"fresh document {i}") for i in range(40)])
    src = str(tmp_path / "in")
    os.makedirs(src)
    pd.DataFrame(arriving, columns=["doc_id", "text"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    out = bloom_ingest_gate(stream, bits, "text")
    q = (out.writeStream.outputMode("append").format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: r["maybe_present"] for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert len(got) == len(arriving)
    # zero false negatives: every re-ingest flags
    assert all(got[1000 + i] for i in range(0, 300, 23))
    # fresh docs overwhelmingly pass (fp-rate bounded; kn/m tiny here)
    fresh_flags = [got[2000 + i] for i in range(40)]
    assert sum(fresh_flags) <= 1
    # batch ≡ stream on the same rows
    batch = {r["doc_id"]: r["maybe_present"] for r in
             bloom_ingest_gate(
                 spark.createDataFrame(arriving,
                                       "doc_id long, text string"),
                 bits, "text").collect()}
    assert batch == got


def test_curated_ingest_sink_slab_growth(spark, tmp_path):
    """VERDICT r11 #1 (the last scale-killer-class gap): the Bloom
    gate must GROW — a fixed bit dim saturates one decade past its
    design corpus and the bounded-state route silently degrades to
    exact-probe wall.  Drive occupancy across the threshold with a
    tiny slab 0 and assert: (a) new slabs open (doubled size, one more
    hash), (b) frozen slabs stay near their freeze occupancy instead
    of saturating, (c) cross-batch duplicates are STILL dropped with
    bits living in different slabs (the no-false-negative invariant
    survives growth), (d) replaying a committed batch stays a no-op,
    (e) a pre-slab LEGACY store (flat bit rows, no slab column)
    upgrades in place as slab 0."""
    import os

    from rainforest_spark.operators.sketches import (
        bloom_bits, bloom_slab_params,
    )
    from rainforest_spark.sources.versioned import (
        commit_tagged_once, history, read_snapshot,
    )
    from rainforest_spark.streaming.corpus import curated_ingest_sink

    def docs(lo, hi, id0):
        return spark.createDataFrame(
            [(id0 + i, f"slab growth document {i} padded with plain "
                       f"ordinary filler tokens here") for i in
             range(lo, hi)],
            "doc_id long, text string")

    store = str(tmp_path / "store")
    m, k = 64, 3          # slab-0 freeze at 32 bits (~15 values)
    sink = curated_ingest_sink(store, m_bits=m, k=k)
    # LEGACY seeding: commit batch 0's bits FLAT (the pre-slab layout)
    # plus its docs/fps, simulating a store built before the upgrade
    from rainforest_spark.operators.text_analysis import fingerprint
    d0 = docs(0, 20, 0).withColumn("fingerprint", fingerprint("text"))
    commit_tagged_once(d0, os.path.join(store, "docs"), "docs", 0)
    commit_tagged_once(bloom_bits(d0, "fingerprint", m, k),
                       os.path.join(store, "bits"), "bits", 0)
    commit_tagged_once(d0.select("fingerprint"),
                       os.path.join(store, "fps"), "fps", 0)

    sink(docs(20, 40, 100), 1)            # slab 0 past freeze -> opens 1
    sink(docs(40, 60, 200), 2)
    # batch 3 re-sends batch-0 (legacy) and batch-1 docs as dups +
    # 10 genuinely new docs under fresh ids
    dups = docs(0, 40, 9000).unionByName(docs(60, 70, 300))
    sink(dups, 3)

    bits = read_snapshot(spark, os.path.join(store, "bits"))
    slab_counts = {
        int(r["slab"]): int(r["n"]) for r in
        bits.select(F.coalesce(F.col("slab"), F.lit(0)).alias("slab"),
                    "bit").distinct()
        .groupBy("slab").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert len(slab_counts) >= 2          # (a) growth happened
    for s, n in slab_counts.items():      # (b) no slab saturates
        m_s, _ = bloom_slab_params(m, k, s)
        assert n < 0.95 * m_s
        if s > 0:
            # every POLICY-opened slab obeys the projection bound
            # post-commit (slab 0 here was seeded overfull by the
            # legacy flat commit, outside the policy)
            assert n <= 0.5 * m_s
    # (c) exactly-one-doc-per-fingerprint across slab boundaries
    docs_t = read_snapshot(spark, os.path.join(store, "docs"))
    assert docs_t.count() == 70
    assert docs_t.select("fingerprint").distinct().count() == 70
    # dups kept the FIRST arrival's id
    surv = {r["fingerprint"]: r["doc_id"] for r in docs_t.collect()}
    assert all(v < 9000 for v in surv.values())
    # (d) replay no-op
    h0 = [len(history(os.path.join(store, t)))
          for t in ("docs", "bits", "fps")]
    sink(dups, 3)
    assert [len(history(os.path.join(store, t)))
            for t in ("docs", "bits", "fps")] == h0
    assert read_snapshot(spark,
                         os.path.join(store, "docs")).count() == 70


def test_curated_ingest_sink_partial_commit_replay_at_slab_boundary(
        spark, tmp_path):
    """The replay-safety argument under the WORST interleaving: a
    crash after the docs and bits commits but BEFORE the fps commit,
    landing exactly when the bits went into a NEW slab.  The replay
    must skip docs/bits (tags survive), derive fps from the COMMITTED
    docs files, and the gate must keep zero false negatives — a later
    batch re-sending those documents is fully dropped even though
    their fps commit arrived one replay late."""
    import os

    from rainforest_spark.operators.sketches import (
        bloom_bits_slab, bloom_membership_rowwise_slabs,
    )
    from rainforest_spark.operators.text_analysis import fingerprint
    from rainforest_spark.sources.versioned import (
        commit_tagged_once, history, read_snapshot,
    )
    from rainforest_spark.streaming.corpus import curated_ingest_sink

    def docs(lo, hi, id0):
        return spark.createDataFrame(
            [(id0 + i, f"slab boundary replay doc {i} padded with "
                       f"plain ordinary filler tokens here") for i in
             range(lo, hi)],
            "doc_id long, text string")

    store = str(tmp_path / "store")
    m, k = 64, 3
    sink = curated_ingest_sink(store, m_bits=m, k=k)
    # batch 0 fills slab 0 past its 32-bit freeze point
    sink(docs(0, 20, 0), 0)
    # ---- simulate the crash: batch 1's docs + bits (slab 1) are
    # committed, fps is NOT ----
    d1 = docs(20, 40, 100).withColumn("fingerprint",
                                      fingerprint("text"))
    commit_tagged_once(d1, os.path.join(store, "docs"), "docs", 1)
    commit_tagged_once(
        bloom_bits_slab(d1, "fingerprint", m, k, slab=1),
        os.path.join(store, "bits"), "bits", 1)
    fps_v = len(history(os.path.join(store, "fps")))
    # ---- replay of batch 1 (Structured Streaming's at-least-once) --
    sink(docs(20, 40, 100), 1)
    docs_t = read_snapshot(spark, os.path.join(store, "docs"))
    fps_t = read_snapshot(spark, os.path.join(store, "fps"))
    assert len(history(os.path.join(store, "docs"))) == 2  # no re-commit
    assert len(history(os.path.join(store, "bits"))) == 2
    assert len(history(os.path.join(store, "fps"))) == fps_v + 1
    assert docs_t.count() == 40
    assert fps_t.select("fingerprint").distinct().count() == 40
    # fps derived from the committed docs files == docs fingerprints
    a = {r["fingerprint"] for r in docs_t.select("fingerprint")
         .collect()}
    b = {r["fingerprint"] for r in fps_t.collect()}
    assert a == b
    # bits ⊇ fps across BOTH slabs: every committed fingerprint probes
    # maybe_present (zero false negatives through the boundary)
    braw = read_snapshot(spark, os.path.join(store, "bits"))
    bits = braw.select(
        F.coalesce(F.col("slab"), F.lit(0)).cast("int").alias("slab"),
        "bit").distinct()
    mem = bloom_membership_rowwise_slabs(
        bits, fps_t.select("fingerprint"), "fingerprint", m, k,
        slabs=None)   # derive the slab list from the store itself
    assert mem.filter(~F.col("maybe_present")).count() == 0
    # a later batch re-sending batch-1 docs is fully dropped
    sink(docs(20, 40, 9000), 2)
    assert read_snapshot(spark,
                         os.path.join(store, "docs")).count() == 40


def test_curated_ingest_sink_bounded_state_parity(spark, tmp_path):
    """VERDICT r10 #3: the Bloom-gated exactly-once curation sink —
    the bounded-state route next to curate_stream's watermarked dedup.
    Full-chain batch ≡ stream parity (same accepted fingerprint set
    as the batch quality→PII→fingerprint→keep-one chain over the
    whole arrival), cross-batch dups dropped with NO watermark hole,
    replay idempotence, and the hot-path state is the fixed-size bit
    dim (≤ m_bits rows), not a per-fingerprint state table."""
    import os

    import pandas as pd

    from rainforest_spark.operators.text_analysis import (
        fingerprint, pii_redact, token_count, dup_ngram_ratio,
    )
    from rainforest_spark.sources.versioned import (
        history, read_snapshot,
    )
    from rainforest_spark.streaming.corpus import curated_ingest_sink

    base = [f"document body number {i} with exactly twelve ordinary "
            f"plain filler tokens" for i in range(60)]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
    rows += [(1000 + i, base[i]) for i in range(0, 60, 7)]   # dups
    rows += [(2000 + i, base[i]) for i in range(0, 60, 13)]  # more dups
    rows.append((3000, "too short"))                         # quality-gated
    src = str(tmp_path / "in")
    os.makedirs(src)
    # three files -> three micro-batches; dups land in LATER batches
    for fi, lo in enumerate((0, 60, 66)):
        hi = {0: 60, 1: 66, 2: len(rows)}[fi]
        pd.DataFrame(rows[lo:hi], columns=["doc_id", "text"]) \
            .to_parquet(f"{src}/f{fi}.parquet", index=False)

    store = str(tmp_path / "store")
    sink = curated_ingest_sink(store, m_bits=8192, k=4)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)
    # stateless: no Structured Streaming state operator at all
    for p in q.recentProgress:
        assert not p.get("stateOperators")

    docs = read_snapshot(spark, os.path.join(store, "docs"))
    fps = read_snapshot(spark, os.path.join(store, "fps"))
    bits = read_snapshot(spark, os.path.join(store, "bits")) \
        .select("bit").distinct()

    # batch semantics over the full arrival: quality -> pii ->
    # fingerprint -> one per fingerprint
    full = spark.createDataFrame(rows, "doc_id long, text string")
    batch = (full.filter(token_count("text") >= 10)
             .filter(F.coalesce(dup_ngram_ratio("text"), F.lit(0.0))
                     <= 0.3)
             .withColumn("text", pii_redact("text"))
             .withColumn("fingerprint", fingerprint("text"))
             .select("fingerprint").distinct())
    want = {r["fingerprint"] for r in batch.collect()}
    got = {r["fingerprint"] for r in docs.select("fingerprint")
           .collect()}
    assert got == want                      # full-chain parity
    assert docs.count() == len(want)        # cross-batch dups dropped
    assert fps.select("fingerprint").distinct().count() == len(want)
    # every accepted doc is the FIRST-batch, min-id survivor
    surv = {r["fingerprint"]: r["doc_id"] for r in docs.collect()}
    assert all(v < 1000 for v in surv.values())
    # hot-path state is the bounded bit dim
    assert bits.count() <= 8192
    # replay idempotence: re-running a committed batch is a no-op
    h_before = [len(history(os.path.join(store, t)))
                for t in ("docs", "bits", "fps")]
    b0 = spark.read.parquet(f"{src}/f0.parquet")
    sink(b0, 0)
    h_after = [len(history(os.path.join(store, t)))
               for t in ("docs", "bits", "fps")]
    assert h_after == h_before
    assert read_snapshot(
        spark, os.path.join(store, "docs")).count() == len(want)


def test_curated_ingest_sink_bits_compaction(spark, tmp_path):
    """The bits table's STORED rows grow linearly with batch count
    (append commits stack per-batch bit sets) even though distinct
    rows are bounded by the slab sizes — at 10k micro-batches the
    per-batch snapshot read would scan millions of redundant rows.
    The sink must compact opportunistically: overwrite-commit the
    distinct rows once stored exceeds the ratio, with exactly-once
    replay and the zero-FN gate untouched."""
    import os

    from rainforest_spark.sources.versioned import (
        commit_tagged_once, latest_version, read_snapshot,
    )
    from rainforest_spark.streaming.corpus import curated_ingest_sink

    def docs(lo, hi, id0):
        return spark.createDataFrame(
            [(id0 + i, f"bits compaction document {i} padded with "
                       f"plain ordinary filler tokens here") for i in
             range(lo, hi)],
            "doc_id long, text string")

    store = str(tmp_path / "store")
    bits_t = os.path.join(store, "bits")
    sink = curated_ingest_sink(store, m_bits=64, k=3,
                               compact_stored_ratio=2.0,
                               compact_min_rows=0)
    sink(docs(0, 20, 0), 0)
    # simulate a long-running stream's redundancy: re-commit batch 0's
    # bit set under five synthetic batch ids (bits ⊇ fps still holds —
    # only redundant TRUE bits are added)
    bits0 = read_snapshot(spark, bits_t)
    for b in range(100, 105):
        commit_tagged_once(bits0, bits_t, "bits", b)
    raw = read_snapshot(spark, bits_t)
    stored_before = raw.count()
    distinct_before = (raw.select(
        F.coalesce(F.col("slab"), F.lit(0)).alias("slab"), "bit")
        .distinct().count())
    assert stored_before >= 2 * distinct_before
    # next batch triggers compaction BEFORE its own append
    sink(docs(20, 30, 100), 1)
    raw2 = read_snapshot(spark, bits_t)
    stored_after = raw2.count()
    distinct_after = (raw2.select(
        F.coalesce(F.col("slab"), F.lit(0)).alias("slab"), "bit")
        .distinct().count())
    assert stored_after < stored_before          # physically shrank
    # compacted base + one batch of appends: bounded by distinct + the
    # new batch's (≤ k_s·n) bit rows, nowhere near the stacked pile
    assert stored_after <= distinct_after + 3 * (3 + 6) * 10
    # exactly-once history intact through the untagged compaction
    # version: replaying committed batches is still a no-op
    v = latest_version(bits_t)
    sink(docs(0, 20, 0), 0)
    sink(docs(20, 30, 100), 1)
    assert latest_version(bits_t) == v
    # and the gate still drops duplicates of everything ingested
    sink(docs(0, 30, 9000), 2)
    docs_t = read_snapshot(spark, os.path.join(store, "docs"))
    assert docs_t.count() == 30
    surv = {r["fingerprint"]: r["doc_id"] for r in docs_t.collect()}
    assert all(v < 9000 for v in surv.values())


def test_bits_compaction_failure_does_not_fail_batch(spark, tmp_path,
                                                     monkeypatch):
    """r12 ADVICE #1: compaction is maintenance — a transient (or even
    persistent) error during the compaction overwrite must log and
    continue, never fail the micro-batch, or a stream past the
    compaction ratio would wedge forever (the trigger re-fires every
    batch)."""
    import os
    import warnings as _w

    import rainforest_spark.streaming.corpus as C
    from rainforest_spark.sources.versioned import (
        commit_tagged_once, read_snapshot,
    )
    from rainforest_spark.streaming.corpus import curated_ingest_sink

    def docs(lo, hi, id0):
        return spark.createDataFrame(
            [(id0 + i, f"compaction failure document {i} padded with "
                       f"plain ordinary filler tokens here") for i in
             range(lo, hi)],
            "doc_id long, text string")

    store = str(tmp_path / "store")
    bits_t = os.path.join(store, "bits")
    sink = curated_ingest_sink(store, m_bits=64, k=3,
                               compact_stored_ratio=2.0,
                               compact_min_rows=0)
    sink(docs(0, 20, 0), 0)
    bits0 = read_snapshot(spark, bits_t)
    for b in range(100, 104):
        commit_tagged_once(bits0, bits_t, "bits", b)

    import rainforest_spark.sources.versioned as V
    real_commit = V.commit_snapshot

    def exploding(df, path, mode="append", **kw):
        if mode == "overwrite" and path == bits_t:
            raise OSError("disk hiccup during compaction write")
        return real_commit(df, path, mode=mode, **kw)

    # the sink imports commit_snapshot lazily from the versioned
    # module inside _maybe_compact_bits — patch it at the source
    monkeypatch.setattr(V, "commit_snapshot", exploding)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        sink(docs(20, 30, 100), 1)       # must NOT raise
    assert any("compaction skipped" in str(w.message) for w in caught)
    monkeypatch.setattr(V, "commit_snapshot", real_commit)
    # the batch itself landed exactly-once despite the failed
    # compaction, and the gate still works
    d = read_snapshot(spark, os.path.join(store, "docs"))
    assert d.count() == 30
    sink(docs(0, 30, 9000), 2)           # all duplicates -> dropped
    assert read_snapshot(
        spark, os.path.join(store, "docs")).count() == 30
