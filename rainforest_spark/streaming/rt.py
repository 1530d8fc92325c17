"""Real-time QPE as a Structured Streaming job.

The reference implements real time as a polling daemon
(rainforest/qpe/qpe_rt_daemon.py:53-140): watch /srn/data/<PROD> for new
5-min scan files, recompute a map per cycle, persist prev-frame state to
.npy between restarts.  The Structured Streaming mapping (SURVEY §2.9):

| reference                          | here                              |
|------------------------------------|-----------------------------------|
| directory polling (T1)             | file-stream source                |
| 5-min cycle (T2)                   | processingTime/availableNow trigger|
| 10-min gauge pairing (T3)          | window(ts, '10 minutes') agg      |
| prev-frame state on disk (T4)      | checkpointed streaming state      |
| missing radars → quality (T5)      | per-window observed-radar codes   |
| hourly HZT reuse (T6)              | stream-static join                |
| file-per-timestamp sink (T7)       | idempotent foreachBatch           |

The streaming query reuses the SAME batch operators (grid/qpe.py) inside
foreachBatch — one code path for batch and RT, which is the point of
re-expressing the daemon on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def polar_file_stream(spark: SparkSession, path: str, schema: str,
                      max_files_per_trigger: int = 20) -> DataFrame:
    """T1: file-stream source over a drop directory of polar scans
    (parquet), with filename-timestamp extraction like the reference's
    %y%j%H%M parsing (common/utils.py:205-213) generalized to an
    epoch-seconds column in the data."""
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def ten_minute_aggregate(stream: DataFrame, value_cols: list[str],
                         watermark: str = "20 minutes") -> DataFrame:
    """T3: two 5-min scans → one 10-min observation per key.

    Watermark bounds state; late scans beyond it are dropped — the
    reference simply computes "with what arrived" (T5), which the
    watermark + update mode reproduces.
    """
    from rainforest_spark.functions.db import avg_expr_for

    with_ts = stream.withColumn("event_time",
                                F.col("TIMESTAMP").cast("timestamp"))
    aggs = [avg_expr_for(v).alias(v) for v in value_cols]
    aggs.append(F.count(F.lit(1)).alias("TCOUNT"))
    # quality metadata: which radars contributed (T5, qpe_utils.py:139-147
    # 'ADLPW' → 'AD-PW' encoding)
    aggs.append(F.array_join(F.array_sort(F.collect_set("RADAR")), "")
                .alias("radars_seen"))
    return (with_ts.withWatermark("event_time", watermark)
            .groupBy(F.window("event_time", "10 minutes").alias("win"),
                     "STATION", "RADAR", "SWEEP")
            .agg(*aggs))


def run_rt_pipeline(spark: SparkSession, source_path: str, schema: str,
                    sink_dir: str, checkpoint_dir: str,
                    lut: DataFrame, value_cols: list[str],
                    trigger_once: bool = True,
                    trigger_interval: str = "5 minutes"):
    """T1→T7 wired together; foreachBatch runs the batch grid pipeline
    and writes one parquet per (micro-batch, timestep) — idempotent by
    path, mirroring the reference's file-per-timestamp sink."""
    from rainforest_spark.grid.qpe import polar_to_grid, vertical_composite

    stream = polar_file_stream(spark, source_path, schema)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        grid = polar_to_grid(batch_df, lut, value_cols)
        comp = vertical_composite(grid, value_cols, visib_col=None)
        (comp.write.mode("overwrite")
         .parquet(f"{sink_dir}/batch={batch_id}"))

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def run_rt_postprocessed(spark: SparkSession, source_path: str, schema: str,
                         sink_dir: str, checkpoint_dir: str,
                         lut: DataFrame, cycle_sec: int = 300,
                         alpha: float = 0.5, max_shift: int = 10,
                         nx: int = 710, ny: int = 640,
                         trigger_once: bool = True,
                         trigger_interval: str | None = None):
    """The daemon's FULL post-processing chain as one streaming job
    (reference qpe/qpe.py:680-761 inside qpe_rt_daemon.py's cycle loop):

        composite → rain rate → two-frame mean + disaggregation ratio
        → advection blend against the PREVIOUS frame

    Prev-frame state is the frames store — each micro-batch writes its
    composite frames as TIMESTAMP partitions (dynamic overwrite →
    idempotent on retry, T7) and reads back only the predecessor
    partitions it needs (partition pruning: state reads stay O(batch),
    never O(history)) — the Spark analogue of the daemon persisting
    prev.npy between cycles.  Inside foreachBatch the SAME batch
    operators run (grid/qpe.temporal_smooth, grid/advection.
    advect_blend_series), so streaming and batch stay one code path.

    Pairing note: predecessors are by fixed cadence (``cycle_sec``, the
    daemon's 5-min cycle).  Batch ``temporal_smooth`` pairs by row
    adjacency per pixel; the two agree whenever consecutive frames cover
    the same pixel set (the grid-product case — every frame rasterizes
    the same LUT footprint).  A LATE frame back-fills: when frame t
    arrives after t+cycle was already processed, the successor's post
    partition is recomputed in the same micro-batch, so out-of-order
    delivery converges to the batch result instead of leaving a
    permanently null blend.
    """
    from rainforest_spark.grid.advection import advect_blend_series
    from rainforest_spark.grid.qpe import (
        polar_to_grid, rain_rate, temporal_smooth, vertical_composite,
    )

    stream = polar_file_stream(spark, source_path, schema)
    frames_dir = f"{sink_dir}/frames"
    post_dir = f"{sink_dir}/post"
    frame_cols = ["TIMESTAMP", "x_idx", "y_idx", "zh_lin", "w_total",
                  "rain_rate"]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # everything runs on the MICRO-BATCH session: its conf clone is
        # isolated, so the dynamic-overwrite setting cannot leak into
        # other code on the main session — and, crucially, the frame
        # writes (which derive from batch_df and therefore execute
        # under this session) actually see it.  Setting it on the outer
        # session instead silently leaves the clone on 'static', and a
        # static overwrite REPLACES THE WHOLE frames store with the
        # current batch (observed: a late frame nuked every other
        # frame partition).
        bs = batch_df.sparkSession
        bs.conf.set("spark.sql.sources.partitionOverwriteMode",
                    "dynamic")
        comp = rain_rate(vertical_composite(
            polar_to_grid(batch_df, lut, ["zh_lin"]),
            ["zh_lin"], visib_col=None)).select(*frame_cols)
        # bound the re-executed subtree: the composite feeds the state
        # write, the smoother and the advection fan-out (frames are
        # ~1 MB each, same budget as the driver-side sink boundary)
        comp = comp.localCheckpoint()
        ts_list = sorted(r[0] for r in
                         comp.select("TIMESTAMP").distinct().collect())
        (comp.write.mode("overwrite").partitionBy("TIMESTAMP")
         .parquet(frames_dir))
        prev_ts = [t - cycle_sec for t in ts_list if t - cycle_sec
                   not in ts_list]
        # late-arrival back-fill: successors already in the store must
        # re-pair against the frames arriving now
        succ_ts = [t + cycle_sec for t in ts_list if t + cycle_sec
                   not in ts_list]
        try:
            store = (bs.read.parquet(frames_dir)
                     .filter(F.col("TIMESTAMP").isin(prev_ts + succ_ts))
                     .select(*frame_cols).localCheckpoint())
            succ_present = [r[0] for r in store.select("TIMESTAMP")
                            .distinct().collect() if r[0] in succ_ts]
        except Exception:
            store = bs.createDataFrame([], comp.schema)
            succ_present = []
        out_ts = ts_list + succ_present
        series = store.unionByName(comp)
        smoothed = temporal_smooth(series, "rain_rate",
                                   proxy_col="zh_lin")
        blended = (advect_blend_series(series, "rain_rate", nx=nx, ny=ny,
                                       alpha=alpha, max_shift=max_shift)
                   .withColumnRenamed("rain_rate", "rain_rate_advected"))
        out = (smoothed.join(blended,
                             on=["TIMESTAMP", "x_idx", "y_idx"],
                             how="left")
               .filter(F.col("TIMESTAMP").isin(out_ts)))
        (out.write.mode("overwrite").partitionBy("TIMESTAMP")
         .parquet(post_dir))

    writer = (stream.writeStream.foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        # daemon cadence (micro-batch trigger) and DATA cadence
        # (cycle_sec, the frame-pairing interval) are separate concerns:
        # the daemon polls every 5 min in production, but a catch-up or
        # test run can trigger faster over the same 5-min-spaced frames
        writer = writer.trigger(
            processingTime=trigger_interval or f"{cycle_sec} seconds")
    return writer.start()


def session_window_aggregate(stream: DataFrame, gap: str = "30 minutes",
                             partition_cols: list[str] | None = None,
                             value_col: str = "ZH",
                             watermark: str = "1 hour") -> DataFrame:
    """Streaming session windows: the reference sessionizes offline with
    a cumsum of gap jumps (A15); in streaming, Spark's ``session_window``
    maintains the same semantics with watermark-bounded state."""
    from pyspark.sql import functions as F

    with_ts = stream.withColumn("event_time",
                                F.col("TIMESTAMP").cast("timestamp"))
    keys = partition_cols or ["STATION"]
    return (with_ts.withWatermark("event_time", watermark)
            .groupBy(F.session_window("event_time", gap).alias("session"),
                     *keys)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.avg(value_col).alias(f"{value_col}_mean")))


def dedup_stream(stream: DataFrame, keys: list[str],
                 ts_col: str = "event_time",
                 watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact deduplication for ingest pipelines: drop repeated
    keys (e.g. re-delivered scan files, duplicate document ids) with
    bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and expires
    key state past the watermark — the streaming analogue of the batch
    fingerprint dedup (operators/dedup.py), sized for continuous
    training-data ingest where an unbounded dedup state would OOM.
    """
    with_ts = stream
    if dict(stream.dtypes).get(ts_col) != "timestamp":
        with_ts = stream.withColumn(ts_col,
                                    F.col(ts_col).cast("timestamp"))
    return (with_ts.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))
