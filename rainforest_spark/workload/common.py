"""Shared helpers for the oracle workload."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a driver table.  events.parquet has shipped with two ``ts``
    encodings across testdata generations: TIMESTAMP(NANOS) (which
    Spark's vectorized reader rejects — read the nanos as LONG and
    rebuild with exact integer division ns → µs, the same truncation
    DuckDB's µs TIMESTAMP applies) and plain TIMESTAMP(MICROS, NTZ).
    Both normalize to a session-tz TIMESTAMP (UTC, so NTZ→LTZ is the
    identity)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes)["ts"] == "bigint":  # legacy nanos tier
            return df.withColumn("ts",
                                 F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec(col: str | Column) -> Column:
    """Exact fixed-point view of a value column (see workload docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def sum_dec(col: str | Column) -> Column:
    """Order-independent sum: decimal-accumulate, emit DOUBLE."""
    return F.sum(dec(col)).cast("double")


def epoch_d(col: str | Column) -> Column:
    """Timestamp (incl. TIMESTAMP_NTZ) → epoch seconds as DOUBLE.
    Session timezone is UTC, so NTZ→LTZ conversion is the identity."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")


def epoch_s(col: str | Column) -> Column:
    """Timestamp → epoch seconds as BIGINT (floor), matching
    duckdb ``CAST(floor(epoch(ts)) AS BIGINT)``."""
    return F.floor(epoch_d(col)).cast("long")


def r6(col: Column) -> Column:
    return F.round(col, 6)


# SQL fragments for the DuckDB side
SQL_DEC = "CAST({x} AS DECIMAL(18,4))"


def sql_sum_dec(x: str) -> str:
    return f"CAST(SUM(CAST({x} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_epoch(x: str) -> str:
    return f"CAST(floor(epoch({x})) AS BIGINT)"
