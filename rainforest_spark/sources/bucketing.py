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

from contextlib import contextmanager

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


#: Confs under which STATION-bucketed tables join Exchange-free on
#: composite keys.  Planning is LAZY — these must be in effect when the
#: ACTION runs, not when the DataFrame is built (use the context
#: manager around the action, or set them for the session).
BUCKETED_JOIN_CONFS = {
    # A sort-merge join on (STATION, TIMESTAMP) may reuse both sides'
    # HashPartitioning on the STATION prefix.  Spark's default (true)
    # insists the partitioning covers ALL join keys and re-shuffles both
    # already-bucketed sides; with station-bucketed tables the subset IS
    # the design — one station's rows sit in the same bucket file on
    # both sides.  Trade: join parallelism = bucket count and station
    # skew is not rebalanced — size n_buckets accordingly.
    "spark.sql.requireAllClusterKeysForCoPartition": "false",
    # At test/bench scale factors every fixture fits the broadcast
    # threshold and Catalyst would bypass the bucketed join entirely; at
    # 100 TB neither side broadcasts.  Disabled so the exercised plan is
    # the co-located SMJ the big-data path takes.  (Explicit
    # ``broadcast()`` hints on true dims still broadcast.)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def bucketed_join_confs(spark: SparkSession):
    """Apply ``BUCKETED_JOIN_CONFS`` around an ACTION on bucketed-table
    joins; restores prior values on exit."""
    saved = {k: spark.conf.get(k) for k in BUCKETED_JOIN_CONFS}
    for k, v in BUCKETED_JOIN_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def write_training_bucketed(spark: SparkSession, gauge: DataFrame,
                            radar: DataFrame, reference: DataFrame,
                            db: str, base_path: str, suffix: str = "",
                            n_buckets: int = 32) -> tuple[str, str, str]:
    """Persist the three training inputs bucketed on STATION (sorted
    within buckets by STATION, TIMESTAMP — the prepare_input join/agg
    key prefix).  Write-time shuffle, Exchange-free reads ever after:
    the posture for the repeatedly-joined radar day table at 100 TB
    (SURVEY §3.2).  Returns the three table names."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    names = []
    for name, df in (("gauge", gauge), ("radar", radar),
                     ("reference", reference)):
        table = f"{db}.{name}{suffix}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        write_bucketed(df, table, f"{base_path}/{name}{suffix}",
                       ["STATION"], n_buckets,
                       sort_cols=["STATION", "TIMESTAMP"])
        names.append(table)
    return tuple(names)
