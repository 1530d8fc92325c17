"""Catalog (UT macro, RAM gate), readers, and incremental writers."""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_ut_macro_rewrite():
    from rainforest_spark.catalog import parse_query

    sql = "SELECT * FROM t WHERE x >= UT('2024-06-01') AND ut(y) < 5 OR OUT(z)"
    out = parse_query(sql)
    assert "UNIX_TIMESTAMP('2024-06-01')" in out
    assert "UNIX_TIMESTAMP(y)" in out
    assert "OUT(z)" in out  # no false positive inside identifiers


def test_database_query_roundtrip(spark):
    from rainforest_spark.catalog import Database

    db = Database(spark)
    db.add_tables({"orders_t": f"{SF_DIR}/orders.parquet"})
    pdf = db.query(
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders_t "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY o_orderstatus")
    assert isinstance(pdf, pd.DataFrame)  # small result → collected
    assert pdf["n"].sum() > 0
    info = db.tables["orders_t"].summary(time_col="o_orderdate")
    assert info["rows"] == spark.read.parquet(
        f"{SF_DIR}/orders.parquet").count()


def test_csv_reader(spark, tmp_path):
    from rainforest_spark.sources.readers import read_df

    p = str(tmp_path / "g.csv")
    pd.DataFrame({"STATION": ["A", "B"], "V": [1.5, 2.5]}).to_csv(p, index=False)
    df = read_df(spark, p)
    assert df.count() == 2 and df.schema["V"].dataType.typeName() == "double"


def test_anti_join_append(spark):
    from rainforest_spark.sources.writers import anti_join_append

    old = spark.createDataFrame([(1, "a"), (2, "b")], "ts int, v string")
    new = spark.createDataFrame([(2, "B"), (3, "c")], "ts int, v string")
    keep = anti_join_append(old, new, ["ts"]).orderBy("ts").collect()
    assert [(r.ts, r.v) for r in keep] == [(1, "a"), (2, "b"), (3, "c")]
    over = anti_join_append(old, new, ["ts"], overwrite=True) \
        .orderBy("ts").collect()
    assert [(r.ts, r.v) for r in over] == [(1, "a"), (2, "B"), (3, "c")]


def test_upsert_daily_partition(spark, tmp_path):
    from rainforest_spark.sources.writers import upsert_daily_partition

    path = str(tmp_path / "tbl")
    d1 = spark.createDataFrame(
        [("2024-06-01", 1, 10.0), ("2024-06-01", 2, 20.0)],
        "day string, k int, v double")
    upsert_daily_partition(spark, d1, path, ["day", "k"])
    # second write: duplicate key (overwritten day) + a new day
    d2 = spark.createDataFrame(
        [("2024-06-01", 2, 20.0), ("2024-06-01", 3, 30.0),
         ("2024-06-02", 1, 11.0)],
        "day string, k int, v double")
    upsert_daily_partition(spark, d2, path, ["day", "k"])
    out = spark.read.parquet(path)
    assert out.count() == 4  # day1 keys {1,2,3} deduped + day2 key 1
    day1 = out.filter(F.col("day") == "2024-06-01")
    assert day1.count() == 3
    assert day1.dropDuplicates(["k"]).count() == 3
