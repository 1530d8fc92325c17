"""Salted join / aggregation: results identical to the unsalted plan on
skewed data (one key holding half the rows)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.RandomState(17)
    n = 20000
    keys = np.where(rng.rand(n) < 0.5, 0, rng.randint(1, 200, n))
    return spark.createDataFrame(pd.DataFrame({
        "k": keys.astype("int64"), "v": rng.uniform(0, 10, n)}))


def test_salted_join_matches_plain(spark, skewed):
    from rainforest_spark.operators.skew import salted_join

    dim = spark.createDataFrame(
        pd.DataFrame({"k": np.arange(200, dtype="int64"),
                      "name": [f"k{i}" for i in range(200)]}))
    plain = (skewed.join(dim, on="k").groupBy("name")
             .agg(F.count(F.lit(1)).alias("n")).toPandas()
             .sort_values("name", ignore_index=True))
    salted = (salted_join(skewed, dim, on=["k"], salt=8).groupBy("name")
              .agg(F.count(F.lit(1)).alias("n")).toPandas()
              .sort_values("name", ignore_index=True))
    assert plain.equals(salted)


def test_salted_aggregate_matches_plain(spark, skewed):
    from rainforest_spark.operators.skew import salted_aggregate

    plain = (skewed.groupBy("k")
             .agg(F.count("v").alias("v_count"), F.max("v").alias("v_max"))
             .toPandas().sort_values("k", ignore_index=True))
    salted = (salted_aggregate(skewed, ["k"],
                               {"v": "count"}, salt=8)
              .toPandas().sort_values("k", ignore_index=True))
    assert (plain["v_count"].to_numpy()
            == salted["v_count"].to_numpy()).all()
    salted_max = (salted_aggregate(skewed, ["k"], {"v": "max"}, salt=8)
                  .toPandas().sort_values("k", ignore_index=True))
    assert (plain["v_max"].to_numpy() == salted_max["v_max"].to_numpy()).all()
