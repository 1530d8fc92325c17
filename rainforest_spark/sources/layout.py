"""Z-order data layout (sink-side clustering for scan pruning).

At 100 TB the cheapest query is the one that never reads the file:
parquet row-group min/max statistics prune scans ONLY when the data is
clustered on the filter columns.  Sorting clusters ONE column;
interleaving the bits of SEVERAL columns (Morton / Z-order — the same
trade Delta's OPTIMIZE ZORDER and Hudi clustering make) gives every
interleaved column locality at once, at the cost of each being a
little worse than a dedicated sort.

The z-value here is the exact bit interleave of ``bits`` low bits per
column — a pure integer column expression (shift/mask/or), no UDF —
so it is cheap, deterministic, and portable to the DuckDB oracle.
Columns must already be non-negative integers in ``[0, 2**bits)``;
scale/offset them first (quantile-rank them with
``stats.quantile_normalize`` or ``width_bucket``-style arithmetic when
the distribution is skewed — equal-width bits on a power law put
everything in one cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "zorder_write", "zorder_sql",
           "layout_report", "clustering_overlap"]


def _terms(cols: list[str], bits: int) -> list[str]:
    k = len(cols)
    if bits * k > 63:
        raise ValueError(f"bits*len(cols) = {bits * k} exceeds 63 — "
                         f"the z-value must fit a signed BIGINT")
    # multiply by the literal power of two instead of <<: `>>`, `&`
    # and `*` parse identically in Spark SQL and DuckDB
    return [f"((({c} >> {b}) & 1) * {1 << (b * k + i)})"
            for b in range(bits) for i, c in enumerate(cols)]


def zorder_key(cols: list[str], bits: int = 16) -> Column:
    """Morton interleave of the ``bits`` low bits of each column as one
    BIGINT column expression."""
    return F.expr(" + ".join(_terms(cols, bits)))  # disjoint bits: + == |


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The same interleave as ANSI SQL (the DuckDB oracle side — one
    generator, two engines, identical tree)."""
    return " + ".join(_terms(cols, bits))


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 num_files: int, bits: int = 16) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``:
    range-partition on the z-value into ``num_files`` output files and
    sort within each, so every file owns a contiguous z-range and its
    per-column min/max stats are tight.

    The range split only steers file BALANCE (any split is a correct
    layout), so ``repartitionByRange``'s sampled bounds are fine here —
    unlike ranged_cumsum, nothing downstream depends on which partition
    a row landed in.
    """
    z = zorder_key(cols, bits=bits)
    (df.withColumn("__z", z)
       .repartitionByRange(num_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def layout_report(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file layout statistics for a parquet directory: row count
    and min/max extents of ``cols`` per file — the observability side
    of :func:`zorder_write` (tight, disjoint extents = scans prune;
    full-range extents on every file = every filter reads everything).

    Shape: one column-pruned scan + a groupBy on the file-name dim.
    """
    df = spark.read.parquet(path).withColumn("__f", F.input_file_name())
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy(F.col("__f").alias("file")).agg(*aggs)


def clustering_overlap(report: DataFrame, col: str) -> float:
    """Average number of OTHER files whose ``[min, max]`` extent on
    ``col`` overlaps each file's — 0 is perfect clustering (every
    filter value hits one file), n_files−1 is no clustering at all.
    Runs a self-join on the per-file dim (bounded: one row per file).
    """
    a = report.select(F.col(f"{col}_min").alias("alo"),
                      F.col(f"{col}_max").alias("ahi"),
                      F.col("file").alias("af"))
    b = report.select(F.col(f"{col}_min").alias("blo"),
                      F.col(f"{col}_max").alias("bhi"),
                      F.col("file").alias("bf"))
    pairs = (a.crossJoin(b)
             .filter((F.col("af") != F.col("bf"))
                     & (F.col("alo") <= F.col("bhi"))
                     & (F.col("blo") <= F.col("ahi")))
             .count())
    n = report.count()
    return pairs / n if n else 0.0
