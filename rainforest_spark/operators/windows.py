"""Window / moving-window operators (SURVEY §2.5)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_group_ids(df: DataFrame, order_col: str | Column,
                    out_col: str = "group_id") -> DataFrame:
    """Normalize group labels to 0..n-1 (reference W1/A12,
    ``rankdata(…,'dense')-1`` ml/rf.py:227-243).

    Scale shape: a ``dense_rank`` over a no-partition window would drag
    the whole input through one task.  Instead the DISTINCT label set
    (tiny by construction — these are group labels) is ranked with the
    window and broadcast-joined back, so the fact rows never reshuffle.
    """
    key = F.col(order_col) if isinstance(order_col, str) else order_col
    dim = (df.select(key.alias("__gk")).distinct()
           .withColumn(out_col,
                       F.dense_rank().over(Window.orderBy("__gk")) - 1))
    return (df.join(F.broadcast(dim), key.eqNullSafe(F.col("__gk")), "left")
            .drop("__gk"))


def lead_fill(df: DataFrame, partition_cols: list[str], ts_col: str,
              value_col: str) -> DataFrame:
    """Fill a null slot with the next value in time (reference W4,
    database_5min/retrieve_dwh_data_5min.py:15-69 — the :05 slot takes the
    :10 value)."""
    w = Window.partitionBy(*partition_cols).orderBy(F.col(ts_col))
    return df.withColumn(
        value_col, F.coalesce(F.col(value_col), F.lead(value_col).over(w)))


def sliding_mean(df: DataFrame, partition_cols: list[str], ts_col: str,
                 value_col: str, n_rows: int = 2,
                 out_col: str | None = None) -> DataFrame:
    """N-frame sliding temporal mean (reference W5, qpe/qpe.py:680-684:
    ``Xcomb = nanmean(X_prev, X)``)."""
    w = (Window.partitionBy(*partition_cols).orderBy(F.col(ts_col))
         .rowsBetween(-(n_rows - 1), 0))
    return df.withColumn(out_col or f"{value_col}_sliding",
                         F.avg(value_col).over(w))


def disaggregation_ratio(df: DataFrame, partition_cols: list[str],
                         ts_col: str, proxy_col: str,
                         out_col: str = "disag_ratio") -> DataFrame:
    """Temporal disaggregation ratio (reference W6, qpe/qpe.py:719-733):
    ``ratio = proxy_t / mean(proxy_{t-1}, proxy_t)``."""
    w = (Window.partitionBy(*partition_cols).orderBy(F.col(ts_col))
         .rowsBetween(-1, 0))
    mean2 = F.avg(proxy_col).over(w)
    return df.withColumn(
        out_col, F.when(mean2 > 0, F.col(proxy_col) / mean2).otherwise(None))


def ranged_cumsum(df: DataFrame, order_col: str, weight_col: str,
                  cum_col: str = "__cw",
                  num_partitions: int | None = None) -> DataFrame:
    """Globally-ordered cumulative weight sum WITHOUT a single-partition
    window.

    Range-partition on the order key (equal keys land together), compute
    a partition-LOCAL ordered cumsum, then add per-partition offsets —
    a one-row-per-partition table ranked with a tiny window and
    broadcast back.  Every stage is distributed; the only global
    structure is the broadcast offset map.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n, F.col(order_col))
         .withColumn("__p", F.spark_partition_id()))
    offs = (d.groupBy("__p").agg(F.sum(weight_col).alias("__pw"))
            .withColumn(
                "__off",
                F.coalesce(
                    F.sum("__pw").over(
                        Window.orderBy("__p")
                        .rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0.0)))
            .select("__p", "__off"))
    wl = (Window.partitionBy("__p").orderBy(F.col(order_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.join(F.broadcast(offs), "__p")
            .withColumn(cum_col, F.sum(weight_col).over(wl) + F.col("__off"))
            .drop("__p", "__off"))


def weighted_quantile(df: DataFrame, group_cols: list[str], value_col: str,
                      weight_col: str, q: float,
                      out_col: str = "wq") -> DataFrame:
    """Weighted quantile via cumulative-weight interpolation.

    Reference W10/A13 (common/utils.py:294-369): sort values, cumsum
    weights, pick where the normalized cumulative weight crosses ``q``.
    This matches the reference's step-function semantics: the quantile is
    the smallest x whose cumweight/totweight >= q.

    Spark-first: one window (sort within group) + one groupBy — the sort
    and the aggregation share the partitioning on ``group_cols``.  With
    NO group columns the cumsum goes through :func:`ranged_cumsum` and
    the total through a broadcast one-row agg, so nothing funnels into a
    single partition.
    """
    if group_cols:
        ws = (Window.partitionBy(*group_cols).orderBy(F.col(value_col))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wt = Window.partitionBy(*group_cols)
        cum = df.withColumn("__cw", F.sum(weight_col).over(ws)) \
                .withColumn("__tw", F.sum(weight_col).over(wt))
    else:
        cum = ranged_cumsum(df, value_col, weight_col, "__cw").crossJoin(
            F.broadcast(df.agg(F.sum(weight_col).alias("__tw"))))
    hit = cum.filter(F.col("__cw") >= q * F.col("__tw"))
    return hit.groupBy(*group_cols).agg(F.min(value_col).alias(out_col))
