"""Bucketed tables: co-located joins and aggregations without a
shuffle (SURVEY §3.2 scale posture; prompt-level requirement).

At 100 TB the dominant repeated cost is re-shuffling the radar day
table on its join keys — every gauge⋈radar pairing, dataset-prep
semi-join and station rollup keys on STATION (+TIMESTAMP).  Writing the
table BUCKETED on that key once moves the shuffle to write time:
``spark.sql.sources.bucketing.enabled`` (default on) lets a
sort-merge join of two tables bucketed on the join key with the same
bucket count run with ZERO Exchange — each task reads matching bucket
files from both sides.

The reference has no analogue (day files are re-read and re-grouped
per job, retrieve_radar_data.py:635-649); this is Spark-first
physical design, verified by plan tests (no Exchange above either
bucketed scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str,
                   bucket_cols: list[str], n_buckets: int = 32,
                   sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as an EXTERNAL bucketed parquet table.

    ``bucket_cols`` should be the dominant join/aggregation key;
    ``sort_cols`` (defaults to the bucket key) additionally sorts
    within buckets so sort-merge joins skip their per-task sort.
    ``n_buckets`` sizes parallelism at the consumer — match it between
    tables that will be joined (unequal counts fall back to shuffling
    the smaller side).
    """
    (df.write.mode(mode).format("parquet").option("path", path)
     .bucketBy(n_buckets, *bucket_cols)
     .sortBy(*(sort_cols or bucket_cols))
     .saveAsTable(table))


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` would lose it and re-shuffle)."""
    return spark.table(table)
