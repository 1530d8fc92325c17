"""Named-table catalog + SQL entry point.

Re-expresses the reference's ``Database`` / ``TableDict`` /
``DataFrameWithInfo`` abstractions (rainforest/database_10min/database.py:
47-136, 164-234):

- ``add_tables``: name → file glob, registered as SQL temp views.
- ``query``: SQL with the custom ``UT()`` macro rewritten to
  ``UNIX_TIMESTAMP()`` (database.py:227-234), optional sink, and the
  RAM-gated collect policy (stay distributed when the estimated result
  exceeds ``WARNING_RAM_MB``; database.py:190-201, constants.py:325).

Spark-first deltas from the reference: the catalog is just the Spark
catalog (temp views) — Catalyst handles pushdown/pruning/broadcast; the
size estimate reuses the reference's ``rows × cols × 4B`` heuristic
(database.py:192-193) but only forces a count when a collect is requested.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from rainforest_spark.session import WARNING_RAM_MB, get_spark
from rainforest_spark.sources.readers import read_df

_UT_MACRO = re.compile(r"\bUT\s*\(", re.IGNORECASE)


def parse_query(sql_query: str) -> str:
    """Rewrite the reference's ``UT(`` macro to ``UNIX_TIMESTAMP(``.

    Reference: database_10min/database.py:227-234 (string substitution
    before handing the SQL to Spark).  A regex keeps it from firing
    inside identifiers like ``OUT(``.
    """
    return _UT_MACRO.sub("UNIX_TIMESTAMP(", sql_query)


@dataclass
class TableInfo:
    """Lazy table metadata (reference ``DataFrameWithInfo``, database.py:54-80)."""

    name: str
    df: DataFrame
    _summary: dict | None = field(default=None, repr=False)

    def summary(self, time_col: str = "TIMESTAMP") -> dict:
        if self._summary is None:
            from pyspark.sql import functions as F

            aggs = [F.count(F.lit(1)).alias("rows")]
            if time_col in self.df.columns:
                aggs += [F.min(time_col).alias("t_min"), F.max(time_col).alias("t_max")]
            self._summary = self.df.agg(*aggs).collect()[0].asDict()
            self._summary["cols"] = len(self.df.columns)
        return self._summary


class Database:
    """SQL-queryable catalog of named tables (reference database.py:82-234)."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.tables: dict[str, TableInfo] = {}

    def add_tables(self, sources: dict[str, DataFrame | str]) -> None:
        """Register tables from DataFrames or file globs as SQL temp views.

        Reference: database.py:113-136 (``add_tables`` → ``read_df`` →
        ``registerTempTable``).
        """
        for name, src in sources.items():
            df = src if isinstance(src, DataFrame) else read_df(self.spark, src)
            df.createOrReplaceTempView(name)
            self.tables[name] = TableInfo(name, df)

    def estimate_result_mb(self, df: DataFrame, n_rows: int) -> float:
        """rows × cols × 4 bytes, the reference's float32 heuristic
        (database.py:192-193)."""
        return n_rows * len(df.columns) * 4 / 1024 / 1024

    def query(self, sql_query: str, to_memory: bool = True,
              output_file: str | None = None):
        """Run SQL (with UT() macro) and apply the reference's result policy.

        - ``output_file`` → distributed write, csv[.gz]/parquet by suffix
          (database.py:200-222).
        - ``to_memory`` → collect to pandas only under the RAM gate
          (database.py:190-201); else return the lazy DataFrame.
        """
        df = self.spark.sql(parse_query(sql_query))
        if output_file:
            from rainforest_spark.sources.writers import write_query_result

            write_query_result(df, output_file)
            return df
        if to_memory:
            n = df.count()
            if self.estimate_result_mb(df, n) <= WARNING_RAM_MB:
                return df.toPandas()
        return df
