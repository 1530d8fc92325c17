"""Hydrometeor classification (SURVEY J13).

Reference: nearest-centroid classification of polar gates into 9 classes
with a weighted Minkowski distance over (ZH, ZDR, KDP, RHOHV, relative
height) — rainforest/common/radarprocessing.py:633-779, centroid table
common/constants.py:339-384.

Spark-first: the 9-row centroid table is a broadcast crossJoin and the
argmin is a deterministic struct-min — the same J13 machinery as
``operators.joins.nearest_centroid``, instantiated with the domain
distance.  Centroid values here are representative (the reference's
exact per-radar tables are data files, not algorithm).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: class codes follow the reference ordering (radarprocessing.py:659-671)
HYDRO_CLASSES = ["AG", "CR", "LR", "RP", "RN", "VI", "WS", "MH", "IH"]

#: representative centroids (zh dBZ, zdr dB, kdp deg/km, rhohv, relh m)
CENTROIDS = [
    ("AG", 13.5, 0.4, 0.05, 0.98, -1400.0),
    ("CR", 2.0, 0.9, 0.10, 0.99, 1300.0),
    ("LR", 10.0, 0.2, 0.01, 0.995, -2500.0),
    ("RP", 18.0, 0.3, 0.05, 0.98, 600.0),
    ("RN", 33.0, 1.1, 0.30, 0.99, -2800.0),
    ("VI", 5.0, 0.4, 0.05, 0.95, 2400.0),
    ("WS", 28.0, 1.2, 0.20, 0.93, -200.0),
    ("MH", 50.0, 0.5, 0.50, 0.95, -700.0),
    ("IH", 55.0, 0.0, 0.20, 0.97, 1100.0),
]

#: feature scales + weights for the Minkowski distance
#: (radarprocessing.py:707-779 normalizes by per-feature ranges)
FEATURES = [("ZH", 10.0, 1.0), ("ZDR", 1.0, 1.0), ("KDP", 0.3, 1.0),
            ("RHOHV", 0.05, 0.8), ("relh", 2000.0, 0.5)]


def centroid_table(spark: SparkSession) -> DataFrame:
    pdf = pd.DataFrame(CENTROIDS,
                       columns=["hydro_class", "c_ZH", "c_ZDR", "c_KDP",
                                "c_RHOHV", "c_relh"])
    return spark.createDataFrame(pdf)


def minkowski_distance(p: float = 2.0) -> Column:
    total = F.lit(0.0)
    for feat, scale, weight in FEATURES:
        d = F.abs((F.col(feat) - F.col(f"c_{feat}")) / scale)
        total = total + weight * F.pow(d, p)
    return F.pow(total, 1.0 / p)


def hydro_classify(gates: DataFrame, spark: SparkSession,
                   keys: list[str], p: float = 2.0) -> DataFrame:
    """Assign each gate row its nearest hydrometeor class.

    crossJoin(broadcast(9 rows)) × struct-min argmin — the fact side
    never shuffles; ties break on the class label alphabetically.
    """
    cents = centroid_table(spark)
    joined = gates.crossJoin(broadcast(cents)) \
        .withColumn("__d", minkowski_distance(p))
    pick = F.min(F.struct(F.col("__d"), F.col("hydro_class"))).alias("__best")
    out = joined.groupBy(*keys).agg(pick)
    return (out.withColumn("HYDRO", F.col("__best.hydro_class"))
            .withColumn("hydro_dist", F.col("__best.__d"))
            .drop("__best"))
