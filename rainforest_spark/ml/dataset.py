"""Training-dataset preparation — the reference's hardest tabular logic.

Re-expresses ``RFTraining.prepare_input`` (rainforest/ml/rf.py:107-286)
as ONE lazy DataFrame job:

1. sentinel → null on all three tables (rf.py:154,180-181)
2. dedup on the composite keys (rf.py:170-177)
3. centre-pixel predicate NX = NY = 0 (rf.py:163-167)
4. three-table semi-join alignment on (STATION, TIMESTAMP) (rf.py:192-221)
5. complete-hour constraint — 6 ten-minute steps per (station, hour)
   (rf.py:211-223)
6. station-metadata broadcast join → X, Y, Z (rf.py:247-252)
7. derived features: HISO, HAG, zh/zv linear, DIST_TO_RAD (rf.py:254-257,
   361-372)
8. weighted vertical aggregation over the sweep column with β-height ×
   visibility weights and categorical RADAR proportions (ml/utils.py:16-61,
   weights rf.py:394,435-438)
9. dense event-group ids (rf.py:227-243) + gauge target mm/h (rf.py:452)

Scale notes: the alignment semi-joins, complete-hour window and vertical
groupBy all shuffle on (STATION, TIMESTAMP)-derived keys — Catalyst reuses
the exchange where partitioning matches.  Dimension joins are broadcast.
No Python touches any row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from rainforest_spark.functions.physics import dist_to_radar_km
from rainforest_spark.operators.filters import (
    dedup_by_key, sentinel_to_null,
)
from rainforest_spark.operators.joins import semi_align

RADAR_KEY = ["TIMESTAMP", "STATION", "RADAR", "SWEEP", "NX", "NY"]
REF_KEY = ["TIMESTAMP", "STATION", "NX", "NY"]
GAUGE_KEY = ["STATION", "TIMESTAMP"]


def hour_bucket(ts_col: str = "TIMESTAMP") -> F.Column:
    """The reference's gauge-hour bucket ``(T−600) − (T−600) % 3600``
    (rf.py:211-213): the six 10-min steps :10..:00 belong to the hour
    they accumulate into."""
    shifted = F.col(ts_col) - 600
    return (shifted - shifted % 3600).alias("hour_ts")


def prepare_input(gauge: DataFrame, radar: DataFrame, reference: DataFrame,
                  stations: DataFrame, radars: DataFrame,
                  features: list[str] | None = None,
                  beta: float = -0.5,
                  visib_weighting: bool = True) -> DataFrame:
    """gauge/radar/reference → one vertically-aggregated training row per
    (STATION, TIMESTAMP) with the gauge target in mm/h."""
    features = features or ["ZH_mean", "ZV_mean", "ZDR_mean", "KDP_mean",
                            "RHOHV_mean", "HEIGHT", "VISIB_mean",
                            "height_over_iso0"]

    # 1-2. nulls + dedup
    gauge = sentinel_to_null(gauge, ["RRE150Z0"])
    radar = sentinel_to_null(
        radar, [c for c in features if c in radar.columns])
    radar = dedup_by_key(radar, RADAR_KEY)
    reference = dedup_by_key(reference, REF_KEY)

    # 3. centre pixel only
    radar0 = radar.filter((F.col("NX") == 0) & (F.col("NY") == 0))
    ref0 = reference.filter((F.col("NX") == 0) & (F.col("NY") == 0))

    # 4. keys present in all three tables
    gauge_valid = gauge.filter(F.col("RRE150Z0").isNotNull())
    aligned_gauge = semi_align(gauge_valid, [radar0, ref0], GAUGE_KEY)

    # 5. complete hours only: all 6 ten-minute slots present
    w = Window.partitionBy("STATION", hour_bucket())
    aligned_gauge = (aligned_gauge
                     .withColumn("__n_in_hr", F.count(F.lit(1)).over(w))
                     .filter(F.col("__n_in_hr") == 6).drop("__n_in_hr"))
    radar_al = semi_align(radar0, [aligned_gauge], GAUGE_KEY)

    # 6. dimension joins (broadcast: ~700 stations, 5 radars)
    st = stations.select(F.col("Abbrev").alias("STATION"), "X", "Y", "Z")
    radar_al = radar_al.join(broadcast(st), on="STATION", how="left")
    radar_al = radar_al.join(broadcast(radars), on="RADAR", how="left")

    # 7. derived features (pure column math)
    radar_al = (radar_al
                .withColumn("HISO", F.col("HEIGHT") - F.col("T") / 0.7 * 100.0)
                .withColumn("HAG", F.greatest(F.col("HEIGHT") - F.col("Z"),
                                              F.lit(0.0)))
                .withColumn("zh", F.pow(F.lit(10.0), 0.1 * F.col("ZH_mean")))
                .withColumn("zv", F.pow(F.lit(10.0), 0.1 * F.col("ZV_mean")))
                .withColumn("DIST_TO_RAD",
                            dist_to_radar_km("X", "Y", "X_rad", "Y_rad")))

    # 8. weighted vertical aggregation over (RADAR, SWEEP) rows
    weight = F.pow(F.lit(10.0), beta * F.col("HEIGHT") / 1000.0)
    if visib_weighting:
        weight = weight * F.col("VISIB_mean") / 100.0
    vert = radar_al.withColumn("__w", weight)
    num_vars = features + ["HISO", "HAG", "zh", "zv", "DIST_TO_RAD"]
    num_vars = [v for v in num_vars if v in vert.columns]
    aggs = [(F.sum(F.when(F.col(v).isNotNull(), F.col("__w") * F.col(v)))
             / F.sum(F.when(F.col(v).isNotNull(), F.col("__w"))))
            .alias(v) for v in num_vars]
    aggs += [(F.sum(F.when(F.col("RADAR") == r, F.col("__w")).otherwise(0.0))
              / F.sum("__w")).alias(f"RADAR_prop_{r}")
             for r in ["A", "D", "L", "P", "W"]]
    aggs.append(F.sum("__w").alias("W_SUM"))
    vertical = vert.groupBy("STATION", "TIMESTAMP").agg(*aggs)

    # 9. target + event-group ids
    out = vertical.join(
        aligned_gauge.select("STATION", "TIMESTAMP",
                             (F.col("RRE150Z0") * 6).alias("target_mmh")),
        on=GAUGE_KEY, how="inner")
    # dense ids via the distinct-timestamp dimension (tiny), not a global
    # window over the fact table — a no-partition window would serialize
    # the whole table through one task at scale.
    tdim = (out.select("TIMESTAMP").distinct()
            .withColumn("group_id",
                        F.dense_rank().over(Window.orderBy("TIMESTAMP")) - 1))
    return out.join(broadcast(tdim), on="TIMESTAMP", how="left")
