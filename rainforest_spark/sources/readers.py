"""Multi-format scans (SURVEY §2.1 S1/S2).

Reference ``read_df`` (rainforest/common/utils.py:536-583) expands globs by
hand and dispatches on suffix; Spark's readers take globs natively and give
vectorized parquet + predicate pushdown for free, so this is a thin suffix
dispatcher.  CSV keeps the reference's header+inferSchema behaviour
(utils.py:569-572).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CSV_SUFFIXES = (".csv", ".csv.gz", ".gz")


def read_df(spark: SparkSession, pattern: str, schema=None) -> DataFrame:
    """Read a file/glob into a DataFrame; format chosen by suffix."""
    p = pattern.lower()
    if p.endswith(".parquet") or p.endswith(".parq"):
        return spark.read.parquet(pattern)
    if p.endswith(_CSV_SUFFIXES):
        reader = spark.read.option("header", True)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return reader.csv(pattern)
    raise ValueError(f"unsupported source suffix: {pattern}")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver-provided parquet tables (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_xls(spark: SparkSession, path: str,
             sheet_prefix: str = "Data Hourly") -> DataFrame:
    """Excel reader (reference S14, common/io_data.py:42-62: concat all
    'Data Hourly*' sheets).  Requires openpyxl — absent in this
    environment, so import-gated; the parquet-fixture path is the
    supported ingest route here."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "read_xls requires openpyxl (not installed); convert the "
            "workbook to parquet and use read_df instead") from e
    import pandas as pd

    sheets = pd.read_excel(path, sheet_name=None)
    frames = [v for k, v in sheets.items() if k.startswith(sheet_prefix)]
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))
