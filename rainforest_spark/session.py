"""SparkSession factory.

Mirrors the engine configuration the reference hard-codes at
rainforest/database_10min/database.py:17-24 (local master, 100 MB
auto-broadcast threshold, case-sensitive SQL), but sized for the target
environment and with the scale-oriented switches a 1000-executor cluster
wants on by default: AQE (runtime re-planning + skew-join handling),
Arrow-based pandas interchange, UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Reference: spark.sql.autoBroadcastJoinThreshold = 1024*1024*100
#: (database_10min/database.py:18).
AUTO_BROADCAST_BYTES = 100 * 1024 * 1024

#: Reference collects results < WARNING_RAM to the driver
#: (common/constants.py:325, database.py:192-198).
WARNING_RAM_MB = 512


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "rainforest-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local tests run ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
    master comes from spark-submit and everything here still applies.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.autoBroadcastJoinThreshold", str(AUTO_BROADCAST_BYTES))
        .config("spark.sql.caseSensitive", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # local[N] runs ALL executor work inside the driver JVM — size
        # the heap for the box (the round-6 sf10 bench OOMed a
        # broadcast build at 8g with 125 GB sitting free).  On a real
        # cluster spark-submit supplies executor/driver memory and
        # this default is irrelevant.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Spark 4.1 writes a companion ".checksum" file for EVERY
        # checkpoint file (offsets, commits, state deltas, sink
        # metadata) by default.  On a Hadoop LocalFileSystem/HDFS
        # deployment the filesystem layer already checksums writes
        # (.crc companions), so the Spark-level pass doubles the file
        # ops per micro-batch for no added integrity.  Measured (r14,
        # steal-guarded A/B): the 31-batch RT chain at sf1 drops
        # 28.2 -> 19.1 s with it off; work-bound streams (s02/s05 at
        # sf10) are unchanged.  Re-enable for object stores without
        # native checksumming via SPARK_GRAFT_CKPT_CHECKSUM=1.
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
                "true" if os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM") == "1"
                else "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
