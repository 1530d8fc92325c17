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


def test_prepare_input_bucketed_exchange_free(spark, tmp_path):
    """The FULL prepare_input chain (dedup → center-pixel filters →
    chained semi-joins on (STATION, TIMESTAMP) → complete-hour window →
    weighted vertical agg → target join) over STATION-bucketed inputs
    runs with ZERO Exchange on the fact path — the only remaining
    exchanges sit on the tiny distinct-TIMESTAMP group-id dimension.
    The same chain over plain parquet shuffles at every stage."""
    from rainforest_spark.ml.dataset import prepare_input
    from rainforest_spark.sources.bucketing import (
        bucketed_join_confs, bucketed_table, write_training_bucketed,
    )
    from rainforest_spark.testing.fixtures import write_fixtures

    fx = write_fixtures(str(tmp_path / "fx"))
    dfs = {n: spark.read.parquet(p) for n, p in fx.items()}
    tg, tr, tref = write_training_bucketed(
        spark, dfs["gauge"], dfs["radar"], dfs["reference"],
        "bkt_prep", str(tmp_path / "bkt"), n_buckets=8)
    st = dfs["stations"]
    rd = dfs["radars"]
    try:
        with bucketed_join_confs(spark):
            out_b = prepare_input(bucketed_table(spark, tg),
                                  bucketed_table(spark, tr),
                                  bucketed_table(spark, tref), st, rd)
            plan_b = _fmt(spark, out_b)
            out_p = prepare_input(dfs["gauge"], dfs["radar"],
                                  dfs["reference"], st, rd)
            plan_p = _fmt(spark, out_p)

            tree = plan_b.split("\n\n")[0]
            lines = plan_b.splitlines()
            exch = [i for i, ln in enumerate(lines)
                    if re.search(r"\(\d+\) Exchange", ln)]
            # every surviving Exchange carries ONLY the TIMESTAMP
            # column (the group-id dim) — none touches the fact tables
            for i in exch:
                detail = " ".join(lines[i:i + 3])
                assert re.search(r"Input \[1\]: \[TIMESTAMP#\d+L?\]",
                                 detail), detail
            assert len(exch) <= 2, tree
            assert "SortMergeJoin" in plan_b
            # the plain-parquet plan shuffles the facts repeatedly
            assert len(re.findall(r"\(\d+\) Exchange",
                                  plan_p)) > len(exch) + 3

            # physical design only — same result (float partial-sum
            # ORDER differs between the bucketed and shuffled plans, so
            # compare keys exactly and the weighted sums to 1e-9 rel)
            import numpy as np

            cols = ["STATION", "TIMESTAMP", "W_SUM", "target_mmh"]
            got = sorted(map(tuple, out_b.select(cols).collect()))
            want = sorted(map(tuple, out_p.select(cols).collect()))
            assert len(got) == len(want) > 0
            assert [g[:2] for g in got] == [w[:2] for w in want]
            np.testing.assert_allclose(
                np.array([g[2:] for g in got], dtype=float),
                np.array([w[2:] for w in want], dtype=float),
                rtol=1e-9, equal_nan=True)
    finally:
        for t in (tg, tr, tref):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
