"""Streaming counterparts of the analytics operators (T-family
extensions): windowed OHLC bars and the stream-static seasonal anomaly
gate.  Both reuse the BATCH operators' exact expression builders, so
an availableNow pass over the same files reproduces the batch result
bit-for-bit (the repo's batch≡stream parity discipline,
tests/test_streaming_analytics.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ohlc_stream", "anomaly_gate_stream",
           "session_rollup_stream", "session_rollup_batch",
           "quantile_sketch_sink", "kmv_sink", "kmv_weighted_sink"]


def ohlc_stream(stream: DataFrame, key_cols: list[str], ts_col: str,
                value_col: str, tie_col: str, bucket_sec: int,
                watermark: str = "1 hour") -> DataFrame:
    """Windowed OHLC bars over a stream: tumbling ``bucket_sec``
    windows with a watermark (append mode emits a bar once its window
    closes).  Tumbling windows anchor at epoch 0, so the buckets are
    IDENTICAL to the batch operator's ``epoch div bucket_sec`` and the
    shared aggregate expressions make the numbers match bit-for-bit.

    State: one open bar per (key, live window) — bounded by the
    watermark horizon, the T3 posture.
    """
    from rainforest_spark.operators.aggregates import (
        ohlc_agg_exprs, ohlc_final_cols,
    )
    ts = F.col(ts_col).cast("timestamp")
    with_e = (stream
              .withColumn("__ts", ts)
              .withColumn("__e", F.floor(ts.cast("double")).cast("long")))
    win = F.window("__ts", f"{int(bucket_sec)} seconds").alias("__w")
    agg = (with_e.withWatermark("__ts", watermark)
           .groupBy(win, *key_cols)
           .agg(*ohlc_agg_exprs(value_col, tie_col)))
    return agg.select(
        *key_cols,
        F.floor(F.col("__w.start").cast("double")).cast("long")
        .alias("bucket_start"),
        *ohlc_final_cols())


def anomaly_gate_stream(stream: DataFrame, baseline: DataFrame,
                        key_cols: list[str], ts_col: str,
                        value_col: str, period_sec: int, slot_sec: int,
                        z: int = 3) -> DataFrame:
    """Stateless streaming seasonal anomaly gate: each arriving
    observation joins its (key, slot) row of a PRECOMPUTED baseline
    dim (``stats.seasonal_baseline`` over history) broadcast onto the
    stream, and the same pure-integer z-inequality flags it — the T6
    stream-static posture, no streaming state at all.

    The baseline is a snapshot by design: an anomaly gate must not
    learn from the anomalies it is flagging; refresh it by rebuilding
    the dim batch-side and restarting the query.
    """
    from rainforest_spark.operators.stats import (
        anomaly_flag_cols, slotted_micros,
    )
    d = slotted_micros(stream, ts_col, value_col, period_sec, slot_sec)
    j = d.join(F.broadcast(baseline), [*key_cols, "__slot"], "left")
    mean, flag = anomaly_flag_cols(z)
    return j.select(
        *key_cols, F.col(ts_col), F.col(value_col),
        F.col("__slot").alias("slot"),
        F.coalesce(F.col("__n"), F.lit(0).cast("long")).alias("slot_n"),
        F.when(F.col("__n").isNotNull(), mean).alias("slot_mean"),
        F.coalesce(F.when(F.col("__n").isNotNull(), flag),
                   F.lit(False)).alias("is_anomaly"))


def hll_cardinality_sink(store_path: str, col: str,
                         group_cols: list[str] | None = None,
                         b: int = 8, query_key: str = "hll"):
    """EXACTLY-ONCE streaming cardinality maintenance: each
    micro-batch's rows sketch into HLL registers
    (operators/sketches.hll_registers — exact md5 register functions)
    and fold into the versioned store through the algebraic
    ``max(rho)`` spec, tagged per batch so replays are log-detected
    no-ops.  Because union-of-sketches == sketch-of-union EXACTLY, the
    maintained register table is bit-identical to sketching the whole
    history in one pass — the streaming distinct-count rollup that
    never rescans history and never double-counts a replay.

    Read the answer any time with
    ``hll_estimate(read_agg(spark, store_path), group_cols, b)``.

    Shape at 100 TB: per batch, one ≤2^b-key register groupBy + one
    state-sized max-merge — both bounded by m × |groups|, independent
    of batch row count after the map-side combine.
    """
    from rainforest_spark.operators.sketches import hll_registers
    from rainforest_spark.sources.incremental import incremental_sink

    g = list(group_cols or [])
    fold = incremental_sink(store_path, [*g, "register"],
                            {"rho": ("max", "rho")}, query_key)

    def write(batch_df, batch_id: int) -> None:
        fold(hll_registers(batch_df, col, g, b), batch_id)
    return write


def cms_frequency_sink(store_path: str, col: str,
                       width: int = 1024, depth: int = 4,
                       weight_col: str | None = None,
                       query_key: str = "cms"):
    """EXACTLY-ONCE streaming frequency maintenance: each micro-batch
    sketches into count-min counters
    (operators/sketches.cms_counters) and folds into the versioned
    store through the algebraic ``sum(c)`` spec, tagged per batch —
    sum-of-sketches == sketch-of-union, so the maintained counters are
    bit-identical to sketching the whole feed once.  Read term
    frequencies any time with
    ``cms_point_estimates(read_agg(spark, store_path), queries, ...)``.

    Shape at 100 TB: per batch one ≤depth·width-key groupBy + one
    state-sized sum-merge — bounded regardless of batch size.  The
    counters are maintained with the integer ``sum_long`` spec, so the
    stored ``c`` stays the BIGINT the batch-side
    ``cms_counters`` emits and the docstring recipe above needs no
    re-cast before probing.
    """
    from rainforest_spark.operators.sketches import cms_counters
    from rainforest_spark.sources.incremental import incremental_sink

    fold = incremental_sink(store_path, ["row", "bucket"],
                            {"c": ("sum_long", "c")}, query_key)

    def write(batch_df, batch_id: int) -> None:
        fold(cms_counters(batch_df, col, width, depth, weight_col),
             batch_id)
    return write


def _session_aggs(ts_long, value_col: str | None):
    aggs = [F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(ts_long).alias("session_start"),
            F.max(ts_long).alias("session_end")]
    if value_col:
        aggs.append(F.sum(F.col(value_col).cast("decimal(38,6)"))
                    .cast("decimal(38,6)").alias("value_sum"))
    return aggs


def session_rollup_stream(stream: DataFrame, key_cols: list[str],
                          ts_col: str, gap_sec: int,
                          watermark: str = "24 hours",
                          value_col: str | None = None) -> DataFrame:
    """Streaming sessionization: per (key, session) rollups via
    ``session_window`` — the streaming counterpart of the batch
    ``operators/aggregates.sessionize`` (reference A15 ``split_event``,
    ml/utils.py:98-115: a gap larger than the threshold — 12 h there —
    starts a new event/session).

    BOUNDARY PARITY: batch ``sessionize`` starts a new session when
    ``gap > gap_sec`` (an event exactly ``gap_sec`` later still
    merges), and Spark's session merge is INCLUSIVE on the window end
    (two sessions merge when one starts at-or-before the other's
    ``start + gap``), so ``session_window(gap_sec)`` has identical
    boundaries — an availableNow pass over the same files reproduces
    the batch session set bit-for-bit: boundaries (both sides of the
    exact-gap edge), counts, epoch bounds, and the exact decimal value
    sums (tests/test_streaming_analytics.py asserts it, including a
    restart with a late in-watermark event).

    State: one open session per (key, live window), merged by Spark's
    session-window state store and EXPIRED past the watermark horizon
    — bounded by (keys active within the watermark) × 1, the T3/T4
    posture.  Append mode emits each session exactly once, when the
    watermark passes its close; a crash replays from the checkpoint
    without re-emitting (the T7 exactly-once posture).
    """
    ts = F.col(ts_col).cast("timestamp")
    with_t = stream.withColumn("__t", ts)
    ts_long = F.col("__t").cast("long")
    win = F.session_window("__t", f"{int(gap_sec)} seconds")
    return (with_t.withWatermark("__t", watermark)
            .groupBy(*key_cols, win.alias("__s"))
            .agg(*_session_aggs(ts_long, value_col))
            .drop("__s"))


def session_rollup_batch(df: DataFrame, key_cols: list[str],
                         ts_col: str, gap_sec: int,
                         value_col: str | None = None) -> DataFrame:
    """The batch twin: ``sessionize`` (lag + running cumsum — A15) then
    the same rollup expressions per (key, session_id) — what
    :func:`session_rollup_stream` must reproduce bit-for-bit over the
    same rows.  ``session_id`` is dropped from the output because the
    stream never numbers sessions (ids are an artifact of the offline
    ordering); (key, session_start) identifies a session in both.
    """
    from rainforest_spark.operators.aggregates import sessionize
    with_t = df.withColumn("__t", F.col(ts_col).cast("timestamp"))
    s = sessionize(with_t, key_cols, "__t", int(gap_sec))
    ts_long = F.col("__t").cast("long")
    return (s.groupBy(*key_cols, "session_id")
            .agg(*_session_aggs(ts_long, value_col))
            .drop("session_id"))


def quantile_sketch_sink(store_path: str, col: str,
                         group_cols: list[str] | None = None,
                         s_bits: int = 8, query_key: str = "qsk"):
    """EXACTLY-ONCE streaming quantile maintenance: each micro-batch
    folds its dyadic bucket table
    (operators/sketches.quantile_buckets) into the versioned store
    through the integer ``sum_long`` spec, tagged per batch — the
    quantile member of the HLL/CMS sink family.  Read p50/p95/p99 any
    time with ``quantile_estimate(read_agg(spark, store_path), qs,
    group_cols)`` — the maintained table is bit-identical to
    sketching the whole feed once (sum-merge algebra), so the
    dashboard never rescans history and a replayed batch never
    double-counts.

    Shape at 100 TB: per batch one bounded-bucket groupBy
    (≤ 2·64·2^(s−1) keys per group) + one state-sized sum-merge.
    """
    from rainforest_spark.operators.sketches import quantile_buckets
    from rainforest_spark.sources.incremental import incremental_sink

    g = list(group_cols or [])
    fold = incremental_sink(store_path,
                            [*g, "bucket_key", "rep_nanos"],
                            {"cnt": ("sum_long", "cnt")}, query_key)

    def write(batch_df, batch_id: int) -> None:
        fold(quantile_buckets(batch_df, col, g, s_bits), batch_id)
    return write


def kmv_sink(store_path: str, col: str,
             group_cols: list[str] | None = None,
             k: int = 256, query_key: str = "kmv",
             max_retries: int = 5):
    """EXACTLY-ONCE streaming bottom-k maintenance: each micro-batch's
    KMV sketch (operators/sketches.kmv_sketch) folds into the
    versioned store, so distinct-count AND set-overlap questions stay
    answerable from a ≤k-row-per-group table that never rescans the
    feed.  Unlike the HLL/CMS/quantile sinks, min-k is NOT a per-key
    algebraic spec (the fold is a rank over the union of hash sets,
    not a per-(key) combine), so this sink runs the read-merge-commit
    itself with the full ``incremental_agg`` concurrency posture: an
    ``expected_parent`` precondition against lost updates, a
    ``(query, batch_id)`` tag, replay detection BEFORE the fold and
    again on every conflict (the r9 zombie-delivery rule — the racing
    winner may have been this very batch).

    Shape at 100 TB: per batch one bounded partial-min-k pass + a
    (2k per group)-row merge rank — state and work independent of
    batch row count.
    """
    g = list(group_cols or [])

    def write(batch_df, batch_id: int) -> None:
        from rainforest_spark.operators.sketches import (
            kmv_merge, kmv_sketch,
        )
        from rainforest_spark.sources.versioned import (
            ConcurrentCommitError, commit_snapshot, committed_batches,
            latest_version, read_snapshot,
        )
        bid = int(batch_id)
        if bid in committed_batches(store_path, query_key):
            return
        new = kmv_sketch(batch_df, col, g, int(k))
        last: Exception | None = None
        for _ in range(int(max_retries)):
            parent = latest_version(store_path)
            if parent is None:
                merged = new
            else:
                old = read_snapshot(batch_df.sparkSession, store_path,
                                    version=parent)
                merged = kmv_merge(old, new, g, int(k))
            try:
                commit_snapshot(merged, store_path, mode="overwrite",
                                expected_parent=parent,
                                stream_tag={"query": query_key,
                                            "batch_id": bid})
                return
            except ConcurrentCommitError as e:
                last = e
                if bid in committed_batches(store_path, query_key):
                    return   # the winner WAS this batch — no-op
        raise ConcurrentCommitError(
            f"kmv_sink lost {max_retries} refresh races at "
            f"{store_path}") from last
    return write


def kmv_weighted_sink(store_path: str, col: str,
                      group_cols: list[str] | None = None,
                      k: int = 256, weight_col: str | None = None,
                      query_key: str = "kmvw",
                      max_retries: int = 5):
    """EXACTLY-ONCE maintenance of the WEIGHTED bottom-k sketch
    (operators/sketches.kmv_sketch_weighted): per-batch partial
    sketches fold through ``kmv_merge_weighted`` — partial weights of
    the same value ADD across batches because micro-batches partition
    the stream's rows, which is exactly the merge's precondition — so
    the maintained ≤k-row-per-group table keeps EXACT per-value
    weights and answers the full ingest-decision family from the
    store alone: per-source volume (kmv_weighted_estimate), pairwise
    added volume (kmv_added_weight) and the grouped novelty report
    (kmv_novelty_report — "what does each source add to the union of
    the rest", distinct values AND bytes/rows) over live feeds, with
    no rescan of history.  Same concurrency posture as
    :func:`kmv_sink` (non-algebraic fold → read-merge-commit with an
    expected_parent precondition, tag-based replay detection before
    the fold and on every conflict).

    Shape at 100 TB: per batch one bounded partial-min-k+weights pass
    + a (2k per group)-row merge rank — independent of batch size.
    """
    g = list(group_cols or [])

    def write(batch_df, batch_id: int) -> None:
        from rainforest_spark.operators.sketches import (
            kmv_merge_weighted, kmv_sketch_weighted,
        )
        from rainforest_spark.sources.versioned import (
            ConcurrentCommitError, commit_snapshot, committed_batches,
            latest_version, read_snapshot,
        )
        bid = int(batch_id)
        if bid in committed_batches(store_path, query_key):
            return
        new = kmv_sketch_weighted(batch_df, col, g, int(k),
                                  weight_col=weight_col)
        last: Exception | None = None
        for _ in range(int(max_retries)):
            parent = latest_version(store_path)
            if parent is None:
                merged = new
            else:
                old = read_snapshot(batch_df.sparkSession, store_path,
                                    version=parent)
                merged = kmv_merge_weighted(old, new, g, int(k))
            try:
                commit_snapshot(merged, store_path, mode="overwrite",
                                expected_parent=parent,
                                stream_tag={"query": query_key,
                                            "batch_id": bid})
                return
            except ConcurrentCommitError as e:
                last = e
                if bid in committed_batches(store_path, query_key):
                    return   # the winner WAS this batch — no-op
        raise ConcurrentCommitError(
            f"kmv_weighted_sink lost {max_retries} refresh races at "
            f"{store_path}") from last
    return write
