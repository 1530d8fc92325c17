"""Plan/partition diagnostics: the packaged form of the plan-shape
audits, verified on constructions with known shapes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F


def test_partition_stats_detects_skew(spark):
    from rainforest_spark.tools.diagnostics import partition_stats

    even = spark.range(0, 32000).repartition(32, "id")
    s = partition_stats(even)
    assert s["n_rows"] == 32000 and s["skew_ratio"] < 2.0

    # everything on one key -> one hash partition holds all rows
    skewed = (spark.range(0, 32000)
              .select(F.lit(7).alias("k"), "id").repartition(32, "k"))
    s2 = partition_stats(skewed)
    assert s2["n_rows"] == 32000
    assert s2["skew_ratio"] >= 1.0 and s2["max"] == 32000
    assert s2["n_empty"] == 31


def test_shuffle_inventory_known_shapes(spark):
    from rainforest_spark.tools.diagnostics import shuffle_inventory

    a = spark.range(0, 1000).select(F.col("id").alias("k"),
                                    (F.col("id") % 7).alias("v"))
    # grouped aggregation: one hash exchange, no joins
    inv = shuffle_inventory(a.groupBy("v").count())
    assert inv["exchanges_hash"] >= 1
    assert inv["cartesian_products"] == 0
    assert inv["single_partition_windows"] == 0

    # single-partition window: flagged
    w = Window.orderBy("k")
    inv2 = shuffle_inventory(a.withColumn("r", F.row_number().over(w)))
    assert inv2["single_partition_windows"] == 1

    # partitioned window: NOT flagged
    wp = Window.partitionBy("v").orderBy("k")
    inv3 = shuffle_inventory(a.withColumn("r", F.row_number().over(wp)))
    assert inv3["single_partition_windows"] == 0

    # explicit cross join: flagged as cartesian or BNLJ
    inv4 = shuffle_inventory(a.crossJoin(a.select(F.col("k").alias("j"))))
    assert (inv4["cartesian_products"] + inv4["broadcast_nested_loop_joins"]) >= 1
