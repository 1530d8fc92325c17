"""Training-batch assembly operators: sequence packing and
deterministic dataset splits.

Two ops every large-scale LLM training-data pipeline runs after
filtering/dedup, expressed engine-portably so they stay inside the
DuckDB hash gate:

- ``pack_contiguous``: concat-and-chunk sequence packing — documents in
  a deterministic order are laid head-to-tail on a token tape and cut
  every ``budget`` tokens; a document's bin is the chunk holding its
  FIRST token.  This is the streaming-pack semantics production
  tokenizer pipelines use (no per-bin knapsack state), and the cumsum
  it needs is integer-exact, so both engines agree bit-for-bit.
  The reference has no analogue (it is a weather archive, not a
  training pipeline); the op composes the prompt-level training-data
  requirement with the repo's distributed cumsum machinery.
- ``split_assign``: train/val/test assignment by md5-prefix of the id —
  deterministic, order-free, stable under re-runs and table growth
  (a document keeps its split forever, the property that matters for
  contamination control).  Rates quantize to 1/256 via the first two
  hex chars, which both Spark and DuckDB produce identically.

Scale posture: ``pack_contiguous`` rides :func:`ranged_cumsum` — the
order-key range partition + per-partition offsets — so there is no
single-partition window anywhere (the q34 lesson, PERF.md round 6);
``split_assign`` is a pure per-row expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pack_contiguous(df: DataFrame, order_col: str, token_col: str,
                    budget: int,
                    bin_col: str = "bin_id",
                    group_cols: list[str] | None = None) -> DataFrame:
    """Assign each row the bin index of its first token under
    concat-and-chunk packing with ``budget`` tokens per bin.

    ``bin = floor((cumsum_before_row) / budget)`` where the cumsum runs
    in ``order_col`` order — one global tape, or one tape PER GROUP
    with ``group_cols`` (packing per language/source/shard, the usual
    mixture-building shape; bin ids are then unique per group, not
    globally).  All-integer arithmetic — the result is exactly
    reproducible on any engine from the same (group, order, tokens)
    rows.  ``order_col`` must be unique within a group; token counts
    must be non-negative.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    d = df.withColumn("__t", F.col(token_col).cast("long"))
    c = ranged_cumsum(d, order_col, "__t", "__cw",
                      group_cols=group_cols)
    return (c.withColumn(
        bin_col,
        F.floor((F.col("__cw").cast("long") - F.col("__t"))
                / F.lit(int(budget))).cast("long"))
        .drop("__t", "__cw"))


def epoch_shards(df: DataFrame, id_col: str, shard_size: int,
                 salt: str = "epoch-0",
                 shard_col: str = "shard_id",
                 pos_col: str | None = None) -> DataFrame:
    """Deterministic epoch shuffle + fixed-size sharding.

    Training loaders consume the corpus in a different uniform-random
    order every epoch, materialized as fixed-size shards.  The order is
    the salted hash of the id (change ``salt`` per epoch to redraw), the
    global position is a distributed ordered count over that key, and
    ``shard = position // shard_size``.  Everything is integer-exact, so
    the shard assignment is bit-reproducible on any engine from the same
    (salt, id) pairs — the property that lets a resumed training run
    rebuild the exact epoch order.

    Scale posture: the ordered count rides :func:`windows.ranged_cumsum`
    (order-key range partition + broadcast per-partition offsets) — no
    single-partition window, and the hash order key is uniform by
    construction so the range partitions are balanced at any corpus
    size.  ``pos_col`` optionally exposes the 0-based epoch position.
    """
    from rainforest_spark.operators.mixture import salted_md5
    from rainforest_spark.operators.windows import ranged_cumsum

    c = F.col(id_col).cast("string")
    # md5 order with an id tiebreak appended; zero-padding keeps the
    # concatenated key's lexicographic order total and engine-portable
    key = F.concat(salted_md5(c, salt), F.lpad(c, 20, "0"))
    d = (df.withColumn("__ek", key)
         .withColumn("__one", F.lit(1).cast("long")))
    out = (ranged_cumsum(d, "__ek", "__one", "__rn")
           .withColumn(shard_col,
                       F.floor((F.col("__rn").cast("long") - 1)
                               / F.lit(int(shard_size))).cast("long")))
    if pos_col:
        out = out.withColumn(pos_col,
                             F.col("__rn").cast("long") - 1)
    return out.drop("__ek", "__one", "__rn")


def split_assign(df: DataFrame, id_col: str,
                 rates: dict[str, float] | None = None,
                 salt: str = "split-v1",
                 out_col: str = "split") -> Column | DataFrame:
    """Deterministic dataset split from the md5 prefix of (salt, id).

    The first two hex chars of ``md5(salt || ':' || id)`` give a uniform
    integer in [0, 256); cumulative rate thresholds (quantized to
    1/256) map it to a label.  Changing ``salt`` redraws the whole
    assignment; adding rows never moves existing ones between splits.
    """
    from rainforest_spark.operators.mixture import salted_md5

    rates = rates or {"train": 0.90, "val": 0.05, "test": 0.05}
    bucket = F.conv(F.substring(salted_md5(id_col, salt), 1, 2),
                    16, 10).cast("int")
    expr = None
    acc = 0
    labels = list(rates)
    for name in labels[:-1]:
        acc += int(round(rates[name] * 256))
        cond = bucket < acc
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    expr = (F.lit(labels[-1]) if expr is None
            else expr.otherwise(labels[-1]))
    return df.withColumn(out_col, expr)


def materialize_packed(df: DataFrame, order_col: str, token_col: str,
                       text_col: str, budget: int,
                       sep: str = " <|eos|> ",
                       group_cols: list[str] | None = None) -> DataFrame:
    """Build the actual training tapes: documents are packed with
    :func:`pack_contiguous`, then each bin's texts are concatenated in
    tape order with ``sep`` (the EOS boundary marker a tokenizer maps
    to its document-separator token).

    Returns one row per bin: ``(group..., bin_id, n_docs, tok_sum,
    tape)``.  Deterministic: within-bin order is ``order_col`` (the
    same order that defined the tape), so the concatenation — and any
    hash of it — is exactly reproducible.

    Shuffle shape: pack_contiguous's ranged cumsum, then ONE groupBy on
    (group, bin).  A bin holds ~``budget`` tokens regardless of corpus
    size, so rows-per-group is bounded and the collect_list inside the
    aggregation never skews.
    """
    g = list(group_cols or [])
    packed = pack_contiguous(df, order_col, token_col, budget,
                             group_cols=g or None)
    tape = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col(order_col).alias("o"),
                         F.col(text_col).alias("t")))),
            lambda s: s.t),
        sep)
    return (packed.groupBy(*g, "bin_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(token_col).cast("long")).alias("tok_sum"),
                 tape.alias("tape")))


def leakage_free_split(df: DataFrame, pairs: DataFrame, id_col: str,
                       rates: dict[str, float] | None = None,
                       salt: str = "split-v1",
                       out_col: str = "split") -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates
    across splits: every near-dup CLUSTER (connected component over
    ``pairs``) is assigned as a unit, keyed by its canonical (min-id)
    representative — the step naive per-doc splitting gets wrong, since
    a test doc's near-twin in train silently inflates eval scores.

    Singletons (docs in no pair) key on their own id, so for a corpus
    with no near-dups this degrades EXACTLY to ``split_assign`` —
    adding a pair can only merge assignments, never reshuffle
    unrelated docs.

    Shape at 100 TB: the pair graph is tiny relative to the corpus;
    component labels come from min-label propagation
    (dedup.neardup_clusters), the corpus joins them 1:1 on the doc id,
    and the split itself is one md5 expression — no extra shuffle
    beyond the label join.
    """
    from rainforest_spark.operators.dedup import neardup_clusters

    clusters = neardup_clusters(pairs, out_id=id_col,
                                cluster_col="__cl")
    j = df.join(clusters, id_col, "left")
    rep = j.withColumn("cluster_rep",
                       F.coalesce(F.col("__cl"), F.col(id_col))
                       .cast("long")).drop("__cl")
    return split_assign(rep, "cluster_rep", rates=rates, salt=salt,
                        out_col=out_col)


def length_bucketed_batches(df: DataFrame, id_col: str, len_col: str,
                            bucket_width: int = 64, batch_size: int = 32,
                            salt: str = "lenbatch-v1") -> DataFrame:
    """Length-bucketed batch assembly: group sequences of similar
    length into fixed-size batches so per-batch padding (to the batch
    max) is small — the dynamic-batching pass of a training data
    loader, done offline and deterministically.

    Buckets are ``len div bucket_width``; within a bucket the order is
    a salted hash (uniform, reproducible), and every ``batch_size``
    consecutive docs form a batch.  Emits per-batch accounting:
    ``(bucket, batch_id, n_docs, max_len, sum_len, padding_waste)``
    with ``padding_waste = n_docs * max_len - sum_len`` — the scree
    the pipeline reads to tune bucket_width.

    Shape at 100 TB: one window per bucket (buckets are many and
    balanced by construction — each holds a length band) + one groupBy
    on (bucket, batch_id).  All integer arithmetic.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    d = df.withColumn("__bucket",
                      F.expr(f"CAST({len_col} AS BIGINT)"
                             f" div {bucket_width}"))
    # per-bucket rank via the GROUPED ranged cumsum: real corpora
    # concentrate lengths into few buckets, so a partitionBy(__bucket)
    # window is the monster-group single-task sort (same fix as
    # epoch_shards above); order key = md5 || zero-padded id
    ordc = F.concat(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lpad(F.col(id_col).cast("string"), 20, "0"))
    d = d.withColumn("__bord", ordc).withColumn("__one", F.lit(1))
    d = (ranged_cumsum(d, "__bord", "__one", cum_col="__rn",
                       group_cols=["__bucket"])
         .withColumn("__batch",
                     F.expr(f"CAST(__rn - 1 AS BIGINT) div {batch_size}"))
         .drop("__bord", "__one", "__rn"))
    return (d.groupBy(F.col("__bucket").alias("bucket"),
                      F.col("__batch").alias("batch_id"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.max(len_col).cast("long").alias("max_len"),
                 F.sum(len_col).cast("long").alias("sum_len"))
            .withColumn("padding_waste",
                        F.col("n_docs") * F.col("max_len")
                        - F.col("sum_len")))
