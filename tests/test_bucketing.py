"""Bucketed tables: the write-time shuffle buys Exchange-free joins and
aggregations at read time — plan-verified (the 100 TB posture for the
repeatedly-joined radar day table)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    from rainforest_spark.sources.bucketing import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS bkt_test")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet") \
        .withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "bkt_test.orders_b", str(tmp_path / "o"),
                   ["o_orderkey"], 8)
    write_bucketed(li, "bkt_test.lineitem_b", str(tmp_path / "l"),
                   ["o_orderkey"], 8)
    yield "bkt_test.orders_b", "bkt_test.lineitem_b"
    spark.sql("DROP TABLE IF EXISTS bkt_test.orders_b")
    spark.sql("DROP TABLE IF EXISTS bkt_test.lineitem_b")


def _fmt(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    from rainforest_spark.sources.bucketing import bucketed_table

    to, tl = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_table(spark, to).join(bucketed_table(spark, tl),
                                           on="o_orderkey")
        plan = _fmt(spark, j)
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"\bExchange\b", plan)) == 0, plan
        # the identical non-bucketed join shuffles both sides
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet") \
            .withColumnRenamed("l_orderkey", "o_orderkey")
        plan2 = _fmt(spark, o.join(li, on="o_orderkey"))
        assert len(re.findall(r"\bExchange\b", plan2)) > 0
        # and the results agree
        assert j.count() == o.join(li, on="o_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    from rainforest_spark.sources.bucketing import bucketed_table

    to, _ = bucketed_pair
    agg = bucketed_table(spark, to).groupBy("o_orderkey") \
        .agg(F.sum("o_totalprice").alias("s"))
    plan = _fmt(spark, agg)
    assert len(re.findall(r"\bExchange\b", plan)) == 0, plan
