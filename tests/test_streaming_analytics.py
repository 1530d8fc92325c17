"""batch ≡ stream parity for the streaming analytics operators:
windowed OHLC bars and the stream-static seasonal anomaly gate."""

from __future__ import annotations

import os
import random

import pandas as pd
from pyspark.sql import functions as F

SCHEMA = "k string, ep long, i long, v double"


def _rows(seed, n=400, horizon=4 * 86400):
    rng = random.Random(seed)
    return [(rng.choice("ab"), rng.randrange(horizon), i,
             round(rng.uniform(0, 100), 3)) for i in range(n)]


def _write_files(rows, src, parts=3):
    os.makedirs(src, exist_ok=True)
    per = (len(rows) + parts - 1) // parts
    for p in range(parts):
        chunk = rows[p * per:(p + 1) * per]
        if chunk:
            pd.DataFrame(chunk, columns=["k", "ep", "i", "v"]) \
                .to_parquet(f"{src}/f{p}.parquet", index=False)


def _with_ts(df):
    return df.withColumn("ts", F.timestamp_seconds(F.col("ep")))


def test_ohlc_stream_matches_batch(spark, tmp_path):
    from rainforest_spark.operators.aggregates import ohlc
    from rainforest_spark.streaming.analytics import ohlc_stream

    rows = _rows(41)
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _write_files(rows, src)
    # a far-future row advances the watermark past every real window
    _write_files([("a", 10 * 86400, 10**6, 1.0)], src + "/late", 1)
    os.rename(src + "/late/f0.parquet", src + "/flate.parquet")

    stream = _with_ts(spark.readStream.schema(SCHEMA)
                      .option("maxFilesPerTrigger", 2).parquet(src))
    q = (ohlc_stream(stream, ["k"], "ts", "v", "i", bucket_sec=21600)
         .writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(sink)
    batch = ohlc(_with_ts(spark.createDataFrame(rows, SCHEMA)),
                 ["k"], "ts", "v", "i", bucket_sec=21600)
    g = {(r["k"], r["bucket_start"]): (r["open"], r["high"], r["low"],
                                       r["close"], r["n"],
                                       r["mean_value"])
         for r in got.collect()}
    b = {(r["k"], r["bucket_start"]): (r["open"], r["high"], r["low"],
                                       r["close"], r["n"],
                                       r["mean_value"])
         for r in batch.collect()}
    # append mode emitted every closed window; the sentinel's own
    # window may be unemitted — compare on the batch keys
    for key, vals in b.items():
        if key[1] >= 10 * 86400 // 21600 * 21600:
            continue   # the sentinel row's window
        assert g[key] == vals, key


def test_anomaly_gate_stream_matches_batch(spark, tmp_path):
    from rainforest_spark.operators.stats import (
        seasonal_anomaly, seasonal_baseline,
    )
    from rainforest_spark.streaming.analytics import anomaly_gate_stream

    hist = _rows(42, n=600)
    live = _rows(43, n=150)
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "out", "ck"))
    _write_files(live, src)

    hist_df = _with_ts(spark.createDataFrame(hist, SCHEMA))
    base = seasonal_baseline(hist_df, ["k"], "ts", "v",
                             period_sec=86400, slot_sec=21600)
    stream = _with_ts(spark.readStream.schema(SCHEMA)
                      .option("maxFilesPerTrigger", 1).parquet(src))
    q = (anomaly_gate_stream(stream, base, ["k"], "ts", "v",
                             period_sec=86400, slot_sec=21600, z=3)
         .withColumn("ep", F.floor(F.col("ts").cast("double"))
                     .cast("long")).drop("ts")
         .writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["k"], r["ep"], r["v"]): (r["slot_n"], r["slot_mean"],
                                       r["is_anomaly"])
           for r in spark.read.parquet(sink).collect()}

    # batch reference: gate the SAME live rows against the SAME
    # history baseline (seasonal_anomaly self-baselines, so rebuild
    # its join manually via the shared pieces)
    from rainforest_spark.operators.stats import (
        anomaly_flag_cols, slotted_micros,
    )
    live_df = _with_ts(spark.createDataFrame(live, SCHEMA))
    d = slotted_micros(live_df, "ts", "v", 86400, 21600)
    mean, flag = anomaly_flag_cols(3)
    ref = (d.join(F.broadcast(base), ["k", "__slot"], "left")
           .select("k", "ep", "v",
                   F.coalesce(F.col("__n"), F.lit(0).cast("long"))
                   .alias("n"),
                   F.when(F.col("__n").isNotNull(), mean).alias("m"),
                   F.coalesce(F.when(F.col("__n").isNotNull(), flag),
                              F.lit(False)).alias("f")))
    want = {(r["k"], r["ep"], r["v"]): (r["n"], r["m"], r["f"])
            for r in ref.collect()}
    assert got == want and len(got) == len(live)


def test_anomaly_gate_stream_flags_known_spike(spark, tmp_path):
    from rainforest_spark.operators.stats import seasonal_baseline
    from rainforest_spark.streaming.analytics import anomaly_gate_stream

    # history: tight 10.0 +/- small noise in slot 0
    hist = [("a", 86400 * d, i, 10.0 + (i % 5) * 0.01)
            for d, i in ((d, d) for d in range(30))]
    live = [("a", 86400 * 40, 1000, 10.01),     # normal
            ("a", 86400 * 41, 1001, 99.0)]      # spike
    src, sink, ckpt = (str(tmp_path / d) for d in ("s2", "o2", "c2"))
    _write_files(live, src, parts=1)
    base = seasonal_baseline(
        _with_ts(spark.createDataFrame(hist, SCHEMA)),
        ["k"], "ts", "v", period_sec=86400, slot_sec=21600)
    stream = _with_ts(spark.readStream.schema(SCHEMA).parquet(src))
    q = (anomaly_gate_stream(stream, base, ["k"], "ts", "v",
                             period_sec=86400, slot_sec=21600, z=3)
         .withColumn("ep", F.floor(F.col("ts").cast("double"))
                     .cast("long")).drop("ts")
         .writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["v"]: r["is_anomaly"]
           for r in spark.read.parquet(sink).collect()}
    assert got == {10.01: False, 99.0: True}


def test_hll_cardinality_sink_stream_equals_batch(spark, tmp_path):
    """Streaming HLL maintenance: registers folded per micro-batch
    through the exactly-once store equal the one-shot sketch of the
    whole feed BIT-FOR-BIT (union-of-sketches == sketch-of-union), and
    a replayed batch is a no-op."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rainforest_spark.operators.sketches import (
        hll_estimate, hll_registers,
    )
    from rainforest_spark.sources.incremental import read_agg
    from rainforest_spark.sources.versioned import latest_version
    from rainforest_spark.streaming.analytics import hll_cardinality_sink

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows0 = [(f"u{i}", "a" if i % 2 else "b") for i in range(400)]
    rows1 = [(f"u{i}", "a" if i % 2 else "b") for i in range(300, 900)]
    pd.DataFrame(rows0, columns=["uid", "g"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    pd.DataFrame(rows1, columns=["uid", "g"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    store = str(tmp_path / "hll")
    sink = hll_cardinality_sink(store, "uid", ["g"], b=8)
    stream = spark.readStream.schema("uid string, g string") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    whole = spark.createDataFrame(rows0 + rows1, "uid string, g string")
    direct = {(r["g"], r["register"]): r["rho"] for r in
              hll_registers(whole, "uid", ["g"]).collect()}
    maintained = {(r["g"], r["register"]): r["rho"] for r in
                  read_agg(spark, store).collect()}
    assert maintained == direct
    # replay is a no-op
    v = latest_version(store)
    sink(whole.limit(10), 0)
    assert latest_version(store) == v
    # and the estimate answers the distinct-user question per group
    est = {r["g"]: r for r in
           hll_estimate(read_agg(spark, store), ["g"]).collect()}
    n_a = len({u for u, g in rows0 + rows1 if g == "a"})
    assert abs(est["a"]["estimate"] - n_a) / n_a < 0.3


def test_cms_frequency_sink_stream_equals_batch(spark, tmp_path):
    """Streaming CMS maintenance: counters folded per micro-batch
    equal the one-shot sketch of the whole feed (sum-merge algebra),
    INCLUDING the type — the sink's ``sum_long`` spec keeps the stored
    counters the BIGINT the batch-side sketch emits, so the docstring
    recipe probes ``read_agg`` output directly, no re-cast."""
    import pandas as pd

    from rainforest_spark.operators.sketches import (
        cms_counters, cms_point_estimates,
    )
    from rainforest_spark.sources.incremental import read_agg
    from rainforest_spark.streaming.analytics import cms_frequency_sink

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows0 = [(f"t{i % 7}",) for i in range(300)]
    rows1 = [(f"t{i % 11}",) for i in range(400)]
    pd.DataFrame(rows0, columns=["v"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    pd.DataFrame(rows1, columns=["v"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    store = str(tmp_path / "cms")
    sink = cms_frequency_sink(store, "v", width=256, depth=4)
    stream = spark.readStream.schema("v string") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    whole = spark.createDataFrame(rows0 + rows1, "v string")
    direct = {(r["row"], r["bucket"]): r["c"] for r in
              cms_counters(whole, "v", 256, 4).collect()}
    counters = read_agg(spark, store)
    assert dict(counters.dtypes)["c"] == "bigint"   # sum_long spec
    maintained = {(r["row"], r["bucket"]): r["c"] for r in
                  counters.collect()}
    assert maintained == direct
    # and the maintained counters answer point queries directly
    qdf = spark.createDataFrame([("t0",), ("absent",)], "v string")
    est = {r["v"]: r["est"] for r in
           cms_point_estimates(counters, qdf, "v", 256, 4).collect()}
    from collections import Counter
    true = Counter(v for v, in rows0 + rows1)
    assert est["t0"] >= true["t0"]


def test_session_rollup_stream_matches_batch_with_restart(
        spark, tmp_path):
    """Streaming sessionization ≡ batch sessionize, bit-for-bit —
    boundaries (including the exact-gap merge case), counts, epoch
    bounds, decimal value sums — across a RESTART with a late
    in-watermark event that extends an already-open session (the T4
    restart posture on session-window state)."""
    from rainforest_spark.streaming.analytics import (
        session_rollup_batch, session_rollup_stream,
    )

    t0 = 1_717_200_000
    gap = 1800
    # user a: two sessions — the second separated by EXACTLY gap+1 s
    # (split); inside session 1 an event at EXACTLY gap s (merge: the
    # boundary-parity case).  user b: one session, later extended.
    f0 = [("a", t0), ("a", t0 + gap), ("a", t0 + gap + 100, 2.5),
          ("a", t0 + 2 * gap + 101), ("b", t0 + 500)]
    # late event (in-watermark) EXTENDING b's open session after the
    # restart, plus far-future sentinels advancing the watermark past
    # every real session so append mode emits them all
    f1 = [("b", t0 + 500 + gap, 7.25),
          ("a", t0 + 40 * 86400), ("b", t0 + 40 * 86400)]

    def norm(rows):
        return [(k, v[0], float(v[1]) if len(v) > 1 else 1.0)
                for k, *v in [(r[0], r[1:]) for r in rows]]
    rows0 = [(r[0], r[1], float(r[2]) if len(r) > 2 else 1.0)
             for r in f0]
    rows1 = [(r[0], r[1], float(r[2]) if len(r) > 2 else 1.0)
             for r in f1]
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "out", "ck"))
    os.makedirs(src)
    pd.DataFrame(rows0, columns=["k", "ep", "v"]).to_parquet(
        f"{src}/f0.parquet", index=False)

    def run_once():
        stream = (spark.readStream.schema("k string, ep long, v double")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = session_rollup_stream(stream, ["k"], "ep", gap,
                                    watermark="48 hours", value_col="v")
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    run_once()                                   # first run: f0 only
    pd.DataFrame(rows1, columns=["k", "ep", "v"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    run_once()                                   # restart from ckpt

    emitted = {tuple(r) for r in
               spark.read.parquet(sink)
               .select("k", "n_events", "session_start", "session_end",
                       "value_sum").collect()}
    whole = spark.createDataFrame(rows0 + rows1,
                                  "k string, ep long, v double")
    batch = {tuple(r) for r in
             session_rollup_batch(whole, ["k"], "ep", gap,
                                  value_col="v")
             .select("k", "n_events", "session_start", "session_end",
                     "value_sum").collect()}
    # every emitted session equals its batch twin exactly; only the
    # far-future sentinel sessions (watermark advancers) are still
    # open and unemitted
    assert emitted <= batch
    open_sessions = {r for r in batch
                     if r[2] == t0 + 40 * 86400}
    assert emitted == batch - open_sessions
    # the boundary cases really exercised: a has sessions of 3 and 1
    # events, b's restart-extended session has 2
    by_key = sorted((k, n) for k, n, *_ in emitted)
    assert by_key == [("a", 1), ("a", 3), ("b", 2)]
    # and the late event folded into b's session across the restart
    b_row = next(r for r in emitted if r[0] == "b")
    assert (b_row[2], b_row[3]) == (t0 + 500, t0 + 500 + gap)
    assert float(b_row[4]) == 8.25


def test_quantile_sketch_sink_stream_equals_batch(spark, tmp_path):
    """Streaming quantile maintenance: bucket tables folded per
    micro-batch equal the one-shot sketch of the whole feed (sum-merge
    algebra, sum_long counters), and the maintained table answers
    quantile queries identically."""
    import pandas as pd

    from rainforest_spark.operators.sketches import (
        quantile_buckets, quantile_estimate,
    )
    from rainforest_spark.sources.incremental import read_agg
    from rainforest_spark.streaming.analytics import quantile_sketch_sink

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows0 = [("a" if i % 2 else "b", (i % 37) * 1.75 - 8.0)
             for i in range(300)]
    rows1 = [("a" if i % 3 else "b", (i % 53) * 0.4 + 100.0)
             for i in range(400)]
    pd.DataFrame(rows0, columns=["g", "x"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    pd.DataFrame(rows1, columns=["g", "x"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    store = str(tmp_path / "qsk")
    sink = quantile_sketch_sink(store, "x", ["g"], s_bits=8)
    stream = (spark.readStream.schema("g string, x double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    whole = spark.createDataFrame(rows0 + rows1, "g string, x double")
    direct = quantile_buckets(whole, "x", ["g"], 8)
    maintained = read_agg(spark, store)
    assert dict(maintained.dtypes)["cnt"] == "bigint"
    got = {tuple(r) for r in
           maintained.select("g", "bucket_key", "rep_nanos",
                             "cnt").collect()}
    want = {tuple(r) for r in direct.collect()}
    assert got == want
    e1 = {(r["g"], r["q_ppm"]): (r["n"], r["est_nanos"]) for r in
          quantile_estimate(maintained, [500000, 990000],
                            ["g"]).collect()}
    e2 = {(r["g"], r["q_ppm"]): (r["n"], r["est_nanos"]) for r in
          quantile_estimate(direct, [500000, 990000],
                            ["g"]).collect()}
    assert e1 == e2


def test_kmv_sink_stream_equals_batch_with_replay(spark, tmp_path):
    """Streaming KMV maintenance: bottom-k sets folded per micro-batch
    equal the one-shot sketch of the whole feed (min-k merge algebra),
    a replayed batch is a tag-detected no-op, and the maintained table
    still answers the distinct-count question."""
    import pandas as pd

    from rainforest_spark.operators.sketches import (
        kmv_estimate, kmv_sketch,
    )
    from rainforest_spark.sources.versioned import (
        latest_version, read_snapshot,
    )
    from rainforest_spark.streaming.analytics import kmv_sink

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows0 = [(f"u{i}", "a" if i % 2 else "b") for i in range(500)]
    rows1 = [(f"u{i}", "a" if i % 2 else "b") for i in range(300, 1200)]
    pd.DataFrame(rows0, columns=["uid", "g"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    pd.DataFrame(rows1, columns=["uid", "g"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    store = str(tmp_path / "kmv")
    sink = kmv_sink(store, "uid", ["g"], k=128)
    stream = (spark.readStream.schema("uid string, g string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    v = latest_version(store)
    whole = spark.createDataFrame(rows0 + rows1, "uid string, g string")
    direct = kmv_sketch(whole, "uid", ["g"], 128)
    maintained = read_snapshot(spark, store)
    got = sorted(tuple(r) for r in
                 maintained.select("g", "h").collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want
    # replay: re-delivering batch 0 is a no-op (same version after)
    sink(spark.createDataFrame(rows0, "uid string, g string"), 0)
    assert latest_version(store) == v
    # the maintained sketch answers the question
    est = {r["g"]: r["estimate"] for r in
           kmv_estimate(maintained, ["g"], 128).collect()}
    n_a = len({u for u, g in rows0 + rows1 if g == "a"})
    assert abs(est["a"] - n_a) / n_a < 0.35


def test_kmv_weighted_sink_novelty_report_from_store(spark, tmp_path):
    """The maintained-ingest-dashboard composition (r11): per-source
    WEIGHTED bottom-k sketches folded per micro-batch equal the
    one-shot weighted sketch of the whole feed (partial weights of
    the same value ADD across batches — micro-batches partition the
    rows, the merge's precondition), a replayed batch is a tag-
    detected no-op, and kmv_novelty_report over the MAINTAINED store
    is bit-identical to the report over the direct sketch — "what
    does each source add" answered from the store alone, no history
    rescan."""
    import pandas as pd

    from rainforest_spark.operators.sketches import (
        kmv_novelty_report, kmv_sketch_weighted,
    )
    from rainforest_spark.sources.versioned import (
        latest_version, read_snapshot,
    )
    from rainforest_spark.streaming.analytics import kmv_weighted_sink

    src = str(tmp_path / "in")
    os.makedirs(src)
    # overlapping vocab across sources AND batches so both the merge
    # weights and the exclusive-ownership columns do real work
    rows0 = ([(f"w{i % 37}", "a" if i % 2 else "b")
              for i in range(400)]
             + [(f"onlya{i}", "a") for i in range(40) for _ in (0, 1)])
    rows1 = ([(f"w{i % 53}", "b" if i % 3 else "c")
              for i in range(200, 900)]
             + [(f"onlyc{i}", "c") for i in range(40)])
    pd.DataFrame(rows0, columns=["tok", "src"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    pd.DataFrame(rows1, columns=["tok", "src"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    store = str(tmp_path / "kmvw")
    sink = kmv_weighted_sink(store, "tok", ["src"], k=32)
    stream = (spark.readStream.schema("tok string, src string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(180)

    whole = spark.createDataFrame(rows0 + rows1,
                                  "tok string, src string")
    direct = kmv_sketch_weighted(whole, "tok", ["src"], 32)
    maintained = read_snapshot(spark, store)
    got = sorted(tuple(r) for r in
                 maintained.select("src", "h", "w").collect())
    want = sorted(tuple(r) for r in direct.collect())
    assert got == want                     # merge == whole, weights exact

    rep_store = sorted(
        tuple(r) for r in
        kmv_novelty_report(maintained, "src", 32).collect())
    rep_direct = sorted(
        tuple(r) for r in
        kmv_novelty_report(direct, "src", 32).collect())
    assert rep_store == rep_direct
    assert {r[0] for r in rep_store} == {"a", "b", "c"}
    # exclusive counts do real work on this fixture
    assert any(r[4] > 0 for r in rep_store)    # some n_only > 0

    # replay: re-delivering batch 0 is a no-op
    v = latest_version(store)
    sink(spark.createDataFrame(rows0, "tok string, src string"), 0)
    assert latest_version(store) == v
