"""Relational workload (SURVEY §2.2-2.8) on the driver tables.

Every query names the SURVEY operator rows it exercises.  Spark side uses
the engine library (rainforest_spark.operators.*) or the DataFrame API;
the oracle is ANSI-ish SQL DuckDB runs on the same parquet.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from rainforest_spark.functions.db import logmean
from rainforest_spark.operators import joins as J
from rainforest_spark.operators import aggregates as A
from rainforest_spark.operators import windows as W
from rainforest_spark.workload.common import (
    T, dec, sum_dec, epoch_d, epoch_s, r6, sql_sum_dec, sql_epoch,
)

QUERIES = {}
ORACLES = {}


def q(name, sql=None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return reg


# ---------------------------------------------------------------- q01
# Flagship: TPC-H-Q1-shaped pricing summary.  SURVEY A1-A3 shape:
# grouped multi-aggregation with per-column operators; predicate pushed
# to the parquet scan.
@q("q01_pricing_summary", sql=f"""
SELECT l_returnflag, l_linestatus,
       {sql_sum_dec('l_quantity')} AS sum_qty,
       {sql_sum_dec('l_extendedprice')} AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q01(spark, sf):
    l = T(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_dec("l_quantity").alias("sum_qty"),
            sum_dec("l_extendedprice").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
             .cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double")
             / F.count(F.lit(1))).cast("double").alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double")
             / F.count(F.lit(1))).cast("double").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------- q02
# P1 projection + P2 time-range predicate (pushed to scan).
@q("q02_time_range_projection", sql=f"""
SELECT o_orderkey, o_custkey, o_totalprice, {sql_epoch('o_orderdate')} AS order_epoch
FROM orders
WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
""")
def q02(spark, sf):
    o = T(spark, sf, "orders")
    return (o.filter(F.col("o_orderdate").between("1996-01-01", "1996-12-31"))
            .select("o_orderkey", "o_custkey", "o_totalprice",
                    epoch_s("o_orderdate").alias("order_epoch")))


# ---------------------------------------------------------------- q03
# P4 sentinel→null (ml/rf.py:154): low readings treated as missing.
@q("q03_sentinel_to_null", sql="""
SELECT event_type,
       COUNT(CASE WHEN value < 1 THEN 1 END) AS n_null,
       CAST(CAST(SUM(CASE WHEN value >= 1
                     THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)
            / COUNT(CASE WHEN value >= 1 THEN 1 END) AS DOUBLE) AS avg_valid
FROM events GROUP BY event_type
""")
def q03(spark, sf):
    e = T(spark, sf, "events")
    nulled = e.withColumn(
        "v", F.when(F.col("value") < 1, None).otherwise(F.col("value")))
    return nulled.groupBy("event_type").agg(
        F.count(F.when(F.col("v").isNull(), 1)).alias("n_null"),
        (F.sum(dec("v")).cast("double")
         / F.count("v")).cast("double").alias("avg_valid"))


# ---------------------------------------------------------------- q04
# P10 threshold clamp (RZC < 0.04 → 0 pattern, constants.py:296).
@q("q04_threshold_clamp", sql="""
SELECT event_id, CASE WHEN value < 5 THEN 0.0 ELSE value END AS clamped
FROM events
""")
def q04(spark, sf):
    from rainforest_spark.operators.filters import clamp_below
    e = T(spark, sf, "events").select("event_id", F.col("value").alias("clamped"))
    return clamp_below(e, "clamped", 5.0)


# ---------------------------------------------------------------- q05
# P5/U4 dedup by key subset via DISTINCT.
@q("q05_dedup_distinct",
   sql="SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem")
def q05(spark, sf):
    return T(spark, sf, "lineitem").select("l_suppkey", "l_returnflag").distinct()


# ---------------------------------------------------------------- q06
# P8 physical-consistency compound predicate (ml/rf.py:411-420 shape).
@q("q06_consistency_filter", sql="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
FROM lineitem
WHERE (l_quantity > 45 AND l_discount < 0.02)
   OR (l_quantity < 3 AND l_tax > 0.06)
""")
def q06(spark, sf):
    l = T(spark, sf, "lineitem")
    bad = ((F.col("l_quantity") > 45) & (F.col("l_discount") < 0.02)) | \
          ((F.col("l_quantity") < 3) & (F.col("l_tax") > 0.06))
    return l.filter(bad).select("l_orderkey", "l_linenumber", "l_quantity",
                                "l_discount", "l_tax")


# ---------------------------------------------------------------- q07
# P9 wet-hour filter (retrieve_dwh_data.py:108-115): keep rows whose
# (user, hour) value-sum ≥ threshold.  Decimal compare — exact.
@q("q07_wet_hour_filter", sql="""
SELECT event_id FROM (
  SELECT event_id,
         SUM(CAST(value AS DECIMAL(18,4)))
           OVER (PARTITION BY user_id,
                 CAST(floor(epoch(ts)/3600) AS BIGINT)) AS hr_sum
  FROM events
) WHERE hr_sum >= 100
""")
def q07(spark, sf):
    from pyspark.sql import Window
    e = T(spark, sf, "events")
    hour = F.floor(epoch_d("ts") / 3600).cast("long")
    w = Window.partitionBy(F.col("user_id"), hour)
    return (e.withColumn("hr_sum", F.sum(dec("value")).over(w))
            .filter(F.col("hr_sum") >= 100).select("event_id"))


# ---------------------------------------------------------------- q08
# P7/P14 exclusion lists + prefix/suffix predicates.
@q("q08_segment_exclusion", sql="""
SELECT c_custkey, c_name FROM customer
WHERE c_mktsegment NOT IN ('BUILDING', 'AUTOMOBILE')
  AND c_name NOT LIKE '%9'
""")
def q08(spark, sf):
    c = T(spark, sf, "customer")
    return (c.filter(~F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
            .filter(~F.col("c_name").endswith("9"))
            .select("c_custkey", "c_name"))


# ---------------------------------------------------------------- q09
# J2 broadcast dimension join (station-metadata join shape, ml/rf.py:247).
@q("q09_broadcast_dim_join", sql="""
SELECT p.p_brand,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""")
def q09(spark, sf):
    l, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    return (l.join(broadcast(p.select("p_partkey", "p_brand")),
                   l.l_partkey == p.p_partkey, "inner")
            .groupBy("p_brand")
            .agg(F.sum(dec("l_extendedprice") * dec(1 - F.col("l_discount")))
                 .cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------- q10
# J3 three-table semi-join alignment (ml/rf.py:192-221).
@q("q10_semi_align", sql="""
SELECT l_returnflag, COUNT(*) AS n, {sq} AS qty_sum
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey AND o.o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM part p
              WHERE p.p_partkey = l.l_partkey AND p.p_size > 40)
GROUP BY l_returnflag
""".format(sq=sql_sum_dec("l_quantity")))
def q10(spark, sf):
    l = T(spark, sf, "lineitem")
    o = T(spark, sf, "orders").filter(F.col("o_orderstatus") == "F") \
        .select(F.col("o_orderkey").alias("l_orderkey"))
    p = T(spark, sf, "part").filter(F.col("p_size") > 40) \
        .select(F.col("p_partkey").alias("l_partkey"))
    aligned = J.semi_align(l, [o], ["l_orderkey"])
    aligned = J.semi_align(aligned, [p], ["l_partkey"])
    return aligned.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), sum_dec("l_quantity").alias("qty_sum"))


# ---------------------------------------------------------------- q11
# J5/U3 anti-join (incremental upsert key test, retrieve_dwh_data.py:22).
@q("q11_anti_join", sql="""
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def q11(spark, sf):
    c = T(spark, sf, "customer")
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return J.anti_join(c, o, ["c_custkey"]).select("c_custkey")


# ---------------------------------------------------------------- q12
# J9 as-of join: each purchase matched to the user's latest click at or
# before it (nearest-earlier-time alignment, utils.py:586-611).
@q("q12_asof_join", sql=f"""
SELECT p.event_id, {sql_epoch('c.ts')} AS click_epoch, c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""")
def q12(spark, sf):
    e = T(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click") \
        .select("user_id", "ts", F.col("value").alias("click_value"))
    out = J.asof_join(purchases, clicks, ["user_id"], "ts", ["click_value"])
    return out.select("event_id", epoch_s("asof_ts").alias("click_epoch"),
                      "click_value")


# ---------------------------------------------------------------- q13
# J11/W2 latest-per-group dedup (newest HZT run per hour,
# retrieve_data.py:144-188).
@q("q13_latest_per_hour", sql="""
SELECT event_id, user_id, hr FROM (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hr,
         row_number() OVER (PARTITION BY user_id, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""")
def q13(spark, sf):
    e = T(spark, sf, "events")
    hr = (F.floor(epoch_d("ts") / 3600) * 3600).cast("long")
    out = J.latest_per_group(
        e.withColumn("hr", hr), [F.col("user_id"), F.col("hr")],
        [F.col("ts").desc(), F.col("event_id").desc()])
    return out.select("event_id", "user_id", "hr")


# ---------------------------------------------------------------- q14
# J13/O4 nearest-centroid classification (hydrometeor classification,
# radarprocessing.py:633-779): crossJoin(broadcast) + deterministic argmin.
@q("q14_nearest_centroid", sql=f"""
WITH cent(cval) AS (VALUES (5.0),(15.0),(25.0),(35.0),(45.0)),
qs AS (SELECT DISTINCT l_quantity FROM lineitem),
d AS (SELECT l_quantity, cval, abs(l_quantity - cval) AS dist FROM qs, cent),
r AS (SELECT *, row_number() OVER (PARTITION BY l_quantity
                                   ORDER BY dist, cval) AS rn FROM d),
qmap AS (SELECT l_quantity, cval FROM r WHERE rn = 1)
SELECT m.cval AS centroid, COUNT(*) AS n, {sql_sum_dec('l.l_quantity')} AS qty_sum
FROM lineitem l JOIN qmap m ON l.l_quantity = m.l_quantity
GROUP BY m.cval
""")
def q14(spark, sf):
    l = T(spark, sf, "lineitem").select("l_quantity")
    cents = spark.createDataFrame([(5.0,), (15.0,), (25.0,), (35.0,), (45.0,)],
                                  "c double")
    qmap = J.nearest_centroid(
        l.distinct(), cents, dist=F.abs(F.col("l_quantity") - F.col("c")),
        class_col="c", keys=["l_quantity"])
    return (l.join(broadcast(qmap.select("l_quantity", "c")), on="l_quantity")
            .groupBy(F.col("c").alias("centroid"))
            .agg(F.count(F.lit(1)).alias("n"),
                 sum_dec("l_quantity").alias("qty_sum")))


# ---------------------------------------------------------------- q15
# A1 table summary (database.py:60-76).
@q("q15_table_summary", sql=f"""
SELECT COUNT(*) AS n_rows,
       {sql_epoch('MIN(l_shipdate)')} AS t_min,
       {sql_epoch('MAX(l_shipdate)')} AS t_max,
       COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
""")
def q15(spark, sf):
    l = T(spark, sf, "lineitem")
    return l.agg(F.count(F.lit(1)).alias("n_rows"),
                 epoch_s(F.min("l_shipdate")).alias("t_min"),
                 epoch_s(F.max("l_shipdate")).alias("t_max"),
                 F.countDistinct("l_orderkey").alias("n_orders"))


# ---------------------------------------------------------------- q16
# A2/F3 dB-domain logmean: 10·log10(avg(10^(0.1·x))) (constants.py:319).
@q("q16_db_logmean", sql="""
SELECT l_returnflag,
       ROUND(10*log10(AVG(pow(10, 0.1*l_quantity))), 6) AS zh_logmean,
       ROUND(AVG(l_quantity), 6) AS plain_mean
FROM lineitem GROUP BY l_returnflag
""")
def q16(spark, sf):
    l = T(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        r6(logmean("l_quantity")).alias("zh_logmean"),
        r6(F.avg("l_quantity")).alias("plain_mean"))


# ---------------------------------------------------------------- q17
# A3 multi-operator tumbling-window aggregation (aggregate_multi,
# utils.py:485-508): 10-min buckets, per-column operator.
@q("q17_temporal_multiagg", sql=f"""
SELECT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS bucket_ts,
       event_type,
       {sql_sum_dec('value')} AS value_sum,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
""")
def q17(spark, sf):
    e = T(spark, sf, "events")
    bucket = (F.floor(epoch_d("ts") / 600) * 600).cast("long").alias("bucket_ts")
    return e.groupBy(bucket, "event_type").agg(
        sum_dec("value").alias("value_sum"), F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------- q18
# A5 weighted vertical aggregation with categorical one-hot proportions
# (ml/utils.py:16-61): w·x sums + weighted event_type proportions.
_ETYPES = ["click", "error", "purchase", "signup", "view"]
@q("q18_weighted_vertical", sql="""
SELECT user_id,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4)) * w) AS DOUBLE)
            / CAST(SUM(w) AS DOUBLE) AS DOUBLE) AS wmean,
       """ + ",\n       ".join(
    f"CAST(CAST(SUM(CASE WHEN event_type = '{t}' THEN w ELSE 0 END) AS DOUBLE)"
    f" / CAST(SUM(w) AS DOUBLE) AS DOUBLE) AS prop_{t}" for t in _ETYPES) + """,
       CAST(SUM(w) AS BIGINT) AS w_sum
FROM (SELECT *, event_id % 5 + 1 AS w FROM events)
GROUP BY user_id
""")
def q18(spark, sf):
    e = T(spark, sf, "events").withColumn("w", F.col("event_id") % 5 + 1)
    props = [
        (F.sum(F.when(F.col("event_type") == t, F.col("w")).otherwise(0))
         .cast("double") / F.sum("w").cast("double")).alias(f"prop_{t}")
        for t in _ETYPES]
    return e.groupBy("user_id").agg(
        (F.sum(dec("value") * F.col("w")).cast("double")
         / F.sum("w").cast("double")).alias("wmean"),
        *props,
        F.sum("w").cast("long").alias("w_sum"))


# ---------------------------------------------------------------- q19
# A6/A7 hourly aggregation with completeness constraint (ml/rf.py:564-588).
@q("q19_hourly_complete", sql="""
SELECT user_id, CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS hr,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS hourly_mean,
       COUNT(*) AS n_in_hour
FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 4
""")
def q19(spark, sf):
    e = T(spark, sf, "events")
    hr = (F.floor(epoch_d("ts") / 3600) * 3600).cast("long").alias("hr")
    return (e.groupBy("user_id", hr)
            .agg((F.sum(dec("value")).cast("double")
                  / F.count(F.lit(1))).alias("hourly_mean"),
                 F.count(F.lit(1)).alias("n_in_hour"))
            .filter(F.col("n_in_hour") >= 4))


# ---------------------------------------------------------------- q20
# A12/W1 dense group ids (rankdata dense − 1, ml/rf.py:227-243).
@q("q20_dense_rank", sql="""
SELECT o_orderkey,
       CAST(dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate) - 1
            AS BIGINT) AS date_rank
FROM orders
""")
def q20(spark, sf):
    from pyspark.sql import Window
    o = T(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    return o.select("o_orderkey",
                    (F.dense_rank().over(w) - 1).cast("long").alias("date_rank"))


# ---------------------------------------------------------------- q21
# A14 contingency table + Pearson corr (eval_calculate.py:30-112).
@q("q21_contingency", sql="""
SELECT l_returnflag,
       COUNT(CASE WHEN l_quantity > 25 AND l_extendedprice > 26000 THEN 1 END) AS hits,
       COUNT(CASE WHEN l_quantity <= 25 AND l_extendedprice > 26000 THEN 1 END) AS misses,
       COUNT(CASE WHEN l_quantity > 25 AND l_extendedprice <= 26000 THEN 1 END) AS false_alarms,
       COUNT(CASE WHEN l_quantity <= 25 AND l_extendedprice <= 26000 THEN 1 END) AS correct_neg,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_p
FROM lineitem GROUP BY l_returnflag
""")
def q21(spark, sf):
    l = T(spark, sf, "lineitem")
    e, r = F.col("l_quantity") > 25, F.col("l_extendedprice") > 26000
    return l.groupBy("l_returnflag").agg(
        F.count(F.when(e & r, 1)).alias("hits"),
        F.count(F.when((~e) & r, 1)).alias("misses"),
        F.count(F.when(e & (~r), 1)).alias("false_alarms"),
        F.count(F.when((~e) & (~r), 1)).alias("correct_neg"),
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_p"))


# ---------------------------------------------------------------- q22
# A15/W3 event sessionization (split_event, ml/utils.py:71-126):
# gap > 30 min starts a new session; per-session aggregates.
@q("q22_sessionization", sql=f"""
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER
              (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events),
s AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
                  AS session_id
      FROM g)
SELECT user_id, session_id, COUNT(*) AS n_events,
       {sql_epoch('MIN(ts)')} AS session_start,
       {sql_sum_dec('value')} AS value_sum
FROM s GROUP BY user_id, session_id
""")
def q22(spark, sf):
    from pyspark.sql import Window
    e = T(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = epoch_s("ts") - F.lag(epoch_s("ts")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("session_id", F.sum(is_new).over(run) - 1)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        epoch_s(F.min("ts")).alias("session_start"),
        sum_dec("value").alias("value_sum"))


# ---------------------------------------------------------------- q23
# A16 deterministic mode / majority (MODE, constants.py:298-302).
@q("q23_mode", sql="""
SELECT user_id, event_type AS event_type_mode FROM (
  SELECT user_id, event_type, COUNT(*) AS cnt,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
""")
def q23(spark, sf):
    return A.deterministic_mode(T(spark, sf, "events"), ["user_id"],
                                "event_type")


# ---------------------------------------------------------------- q24
# A17/F4 catch-efficiency transfer function (Kochendorfer,
# retrieve_dwh_data.py:75-102): exp()-based CE by class, clipped input.
@q("q24_transfer_function", sql="""
SELECT event_type,
       ROUND(AVG(value / (CASE
         WHEN event_type = 'error'
           THEN 0.865 * exp(-0.298 * least(value, 9.0)) + 0.225
         WHEN event_type IN ('click', 'view')
           THEN 0.624 * exp(-0.185 * least(value, 9.0)) + 0.364
         ELSE 1.0 END)), 6) AS adj_mean,
       COUNT(*) AS n
FROM events GROUP BY event_type
""")
def q24(spark, sf):
    # KD4 coefficients (database_10min/retrieve_dwh_data.py:83-94):
    # 'error' plays the solid band, click/view the mixed band.
    e = T(spark, sf, "events")
    u = F.least(F.col("value"), F.lit(9.0))
    ce = (F.when(F.col("event_type") == "error",
                 0.865 * F.exp(-0.298 * u) + 0.225)
          .when(F.col("event_type").isin("click", "view"),
                0.624 * F.exp(-0.185 * u) + 0.364)
          .otherwise(F.lit(1.0)))
    return (e.withColumn("adj", F.col("value") / ce)
            .groupBy("event_type")
            .agg(r6(F.avg("adj")).alias("adj_mean"),
                 F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------- q25
# W4 lead-fill of empty slots (retrieve_dwh_data_5min.py:15-69).
@q("q25_lead_fill", sql="""
SELECT event_id,
       coalesce(CASE WHEN event_type = 'error' THEN NULL ELSE value END,
                lead(CASE WHEN event_type = 'error' THEN NULL ELSE value END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS filled
FROM events
""")
def q25(spark, sf):
    from pyspark.sql import Window
    e = T(spark, sf, "events")
    v = F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select("event_id",
                    F.coalesce(v, F.lead(v).over(w)).alias("filled"))


# ---------------------------------------------------------------- q26
# W5 2-frame sliding mean + W6 disaggregation ratio (qpe.py:680-733).
@q("q26_sliding_disagg", sql="""
SELECT event_id,
       ROUND(slide2, 6) AS slide2,
       ROUND(CASE WHEN slide2 > 0 THEN value / slide2 END, 6) AS disag_ratio
FROM (
  SELECT event_id, value,
         AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS slide2
  FROM events)
""")
def q26(spark, sf):
    from pyspark.sql import Window
    e = T(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-1, 0))
    s = e.withColumn("slide2", F.avg("value").over(w))
    return s.select(
        "event_id", r6(F.col("slide2")).alias("slide2"),
        r6(F.when(F.col("slide2") > 0,
                  F.col("value") / F.col("slide2"))).alias("disag_ratio"))


# ---------------------------------------------------------------- q27
# W10 weighted quantile (weighted median here) — the scatter-score
# machinery (utils.py:294-369) as cumulative-weight window SQL.
@q("q27_weighted_quantile", sql="""
WITH c AS (
  SELECT event_type, value,
         SUM(event_id % 5 + 1) OVER (PARTITION BY event_type ORDER BY value
                                     ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(event_id % 5 + 1) OVER (PARTITION BY event_type) AS tw
  FROM events)
SELECT event_type, MIN(value) AS wq
FROM c WHERE cw >= 0.5 * tw GROUP BY event_type
""")
def q27(spark, sf):
    e = T(spark, sf, "events").withColumn("w", F.col("event_id") % 5 + 1)
    return W.weighted_quantile(e, ["event_type"], "value", "w", q=0.5)


# ---------------------------------------------------------------- q28
# U1/U2 set operations: intersect + union-distinct.
@q("q28_set_ops", sql="""
SELECT
  (SELECT COUNT(*) FROM (SELECT o_custkey FROM orders
                         INTERSECT SELECT user_id FROM events)) AS n_common,
  (SELECT COUNT(*) FROM (SELECT s_nationkey FROM supplier
                         UNION SELECT c_nationkey FROM customer)) AS n_nations
""")
def q28(spark, sf):
    o = T(spark, sf, "orders").select("o_custkey")
    e = T(spark, sf, "events").select("user_id")
    s = T(spark, sf, "supplier").select("s_nationkey")
    c = T(spark, sf, "customer").select("c_nationkey")
    a = o.intersect(e).agg(F.count(F.lit(1)).alias("n_common"))
    b = s.union(c).distinct().agg(F.count(F.lit(1)).alias("n_nations"))
    return a.crossJoin(b)


# ---------------------------------------------------------------- q29
# F1 string functions: key concat, case, regexp extraction.
@q("q29_string_funcs", sql="""
SELECT c_custkey,
       upper(c_mktsegment) || '-' || CAST(c_custkey AS VARCHAR) AS seg_key,
       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num
FROM customer
""")
def q29(spark, sf):
    c = T(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.upper("c_mktsegment"), F.lit("-"),
                 F.col("c_custkey").cast("string")).alias("seg_key"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long")
         .alias("name_num"))


# ---------------------------------------------------------------- q30
# F2 date/time functions: epoch, hour bucket, minute-in-hour.
@q("q30_datetime_funcs", sql="""
SELECT event_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
       CAST(minute(ts) AS INT) AS min_in_hour,
       CAST(day(ts) AS INT) AS dom
FROM events
""")
def q30(spark, sf):
    e = T(spark, sf, "events")
    return e.select(
        "event_id", epoch_s("ts").alias("epoch_s"),
        epoch_s(F.date_trunc("hour", F.col("ts"))).alias("hour_epoch"),
        F.minute("ts").cast("int").alias("min_in_hour"),
        F.dayofmonth("ts").cast("int").alias("dom"))


# ---------------------------------------------------------------- q31
# F6 DN discretization as a broadcast range join against a scale ladder
# with searchsorted-LEFT semantics: dn = first index where the ladder
# value >= x, i.e. x in (scale[dn-1], scale[dn]] (SCALE_CPC searchsorted,
# qpe/qpe.py:276, io_data.py:201-206; grid/io.py dn_encode).
_LADDER = [(i, float((i - 1) * 7000) if i > 0 else -1e18,
            float(i * 7000) if i < 15 else 1e18)
           for i in range(16)]
@q("q31_dn_discretization", sql="""
WITH scale(dn, prev, lo) AS (VALUES """ + ",".join(
    f"({d}, {prev}, {lo})" for d, prev, lo in _LADDER) + """)
SELECT s.dn, COUNT(*) AS n
FROM lineitem l JOIN scale s
  ON l.l_extendedprice > s.prev AND l.l_extendedprice <= s.lo
GROUP BY s.dn
""")
def q31(spark, sf):
    l = T(spark, sf, "lineitem")
    scale = spark.createDataFrame(_LADDER, "dn int, prev double, lo double")
    cond = (F.col("l_extendedprice") > F.col("prev")) & \
           (F.col("l_extendedprice") <= F.col("lo"))
    return (l.join(broadcast(scale), cond, "inner")
            .groupBy("dn").agg(F.count(F.lit(1)).alias("n")))


# ---------------------------------------------------------------- q32
# F8 JSON extraction from the props column.
@q("q32_json_extract", sql="""
SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val
FROM events
""")
def q32(spark, sf):
    e = T(spark, sf, "events")
    return e.select("event_id",
                    F.get_json_object("props", "$.k").cast("long")
                     .alias("k_val"))


# ---------------------------------------------------------------- q33
# A13 perfscores: RMSE / logBias / corr / means on the double-conditional
# subset (utils.py:76-137).  est/ref built as exact decimals.
@q("q33_perfscores", sql="""
WITH d AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,4))
              * CAST(1 - l_discount AS DECIMAL(18,4)) AS DOUBLE) AS est,
         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 0.95 AS DOUBLE) AS ref
  FROM lineitem)
SELECT l_returnflag, COUNT(*) AS N,
       ROUND(sqrt(AVG((est - ref)*(est - ref))), 6) AS RMSE,
       ROUND(10*log10(SUM(est)/SUM(ref)), 6) AS logBias,
       ROUND(corr(est, ref), 6) AS corr_p
FROM d WHERE est > 100 AND ref > 100
GROUP BY l_returnflag
""")
def q33(spark, sf):
    l = T(spark, sf, "lineitem")
    d = l.select(
        "l_returnflag",
        (dec("l_extendedprice") * dec(1 - F.col("l_discount")))
        .cast("double").alias("est"),
        (dec("l_extendedprice") * F.lit(0.95).cast("decimal(18,4)"))
        .cast("double").alias("ref"))
    d = d.filter((F.col("est") > 100) & (F.col("ref") > 100))
    err = F.col("est") - F.col("ref")
    return d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("N"),
        r6(F.sqrt(F.avg(err * err))).alias("RMSE"),
        r6(10.0 * F.log10(F.sum("est") / F.sum("ref"))).alias("logBias"),
        r6(F.corr("est", "ref")).alias("corr_p"))


# ---------------------------------------------------------------- q34
# A13 Germann scatter score: weighted 16/84% quantile spread of the dB
# error, weights ∝ reference (utils.py:139-166, 294-369).
@q("q34_scatter_score", sql="""
WITH d AS (
  SELECT l_returnflag,
         10*log10((l_extendedprice * (1 - l_discount) + 1.0)
                  / (l_extendedprice * 0.95 + 1.0)) AS db_err,
         l_extendedprice AS w
  FROM lineitem),
c AS (
  SELECT l_returnflag, db_err,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY db_err
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM d),
q16 AS (SELECT l_returnflag, MIN(db_err) AS q16 FROM c
        WHERE cw >= 0.16 * tw GROUP BY l_returnflag),
q84 AS (SELECT l_returnflag, MIN(db_err) AS q84 FROM c
        WHERE cw >= 0.84 * tw GROUP BY l_returnflag)
SELECT q16.l_returnflag, ROUND((q84.q84 - q16.q16)/2, 6) AS scatter
FROM q16 JOIN q84 ON q16.l_returnflag = q84.l_returnflag
""")
def q34(spark, sf):
    from rainforest_spark.operators.windows import ranged_cumsum
    l = T(spark, sf, "lineitem")
    d = l.select(
        "l_returnflag",
        (10.0 * F.log10(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")) + 1.0)
            / (F.col("l_extendedprice") * 0.95 + 1.0))).alias("db_err"),
        F.col("l_extendedprice").alias("w"))
    # grouped ranged cumsum, NOT Window.partitionBy(l_returnflag): only
    # 3 return-flag groups, so a grouped window serializes the whole
    # sort into 3 tasks — measured 6.4x at 10x data (sf1, round 6)
    # before this rewrite, ~linear after
    c = ranged_cumsum(d, "db_err", "w", "cw",
                      group_cols=["l_returnflag"], total_col="tw")
    # single pass: conditional min for the 84% quantile (same values as
    # the two-groupBy + join formulation, half the shuffles)
    return (c.filter(F.col("cw") >= 0.16 * F.col("tw"))
            .groupBy("l_returnflag")
            .agg(F.min("db_err").alias("q16"),
                 F.min(F.when(F.col("cw") >= 0.84 * F.col("tw"),
                              F.col("db_err"))).alias("q84"))
            .select("l_returnflag",
                    r6((F.col("q84") - F.col("q16")) / 2).alias("scatter")))


# ---------------------------------------------------------------- q135
# Ordered conversion funnel over the events stream (view -> click ->
# purchase): per user the earliest in-order chain, one user-keyed
# shuffle via the higher-order fold (operators/aggregates.funnel).
# Pure timestamp/integer arithmetic — engine-exact by construction.
# The DuckDB oracle is the closed form: t_i = min ts of stage-i events
# at or after t_{i-1} (same-timestamp advances resolve in stage order
# on both paths — see the operator docstring).
@q("q135_funnel", sql="""
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
SELECT s1.user_id,
       CAST(1 + CAST(t2 IS NOT NULL AS INT)
              + CAST(t3 IS NOT NULL AS INT) AS INT) AS stage_reached,
       epoch_us(t1) AS t_entry_us,
       epoch_us(t3) AS t_convert_us
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
""")
def q135(spark, sf):
    from rainforest_spark.operators.aggregates import funnel
    out = funnel(T(spark, sf, "events"), "user_id", "ts",
                 "event_type", ["view", "click", "purchase"])
    # timestamps ride the gate as exact epoch-micros BIGINTs (the q12
    # convention: the compare harness is unit-agnostic on integers)
    return out.select("user_id", "stage_reached",
                      F.unix_micros("t_entry").alias("t_entry_us"),
                      F.unix_micros("t_convert").alias("t_convert_us"))


# ---------------------------------------------------------------- q136
# Weekly cohort retention matrix over the events stream: cohort = the
# user's first active epoch-week; count users per (cohort, offset).
# One user-keyed shuffle (min + collect_set in a single partial agg),
# one bounded (cohort, offset) count.  Pure integer arithmetic.
@q("q136_retention_cohorts", sql="""
WITH wk AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
  FROM events),
c AS (SELECT user_id, MIN(wk) AS cohort FROM wk GROUP BY 1)
SELECT c.cohort AS cohort_period,
       w.wk - c.cohort AS period_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM wk w JOIN c USING (user_id)
GROUP BY 1, 2
""")
def q136(spark, sf):
    from rainforest_spark.operators.aggregates import retention_cohorts
    return retention_cohorts(T(spark, sf, "events"), "user_id", "ts")


# ---------------------------------------------------------------- q137
# First-order event-transition matrix per user stream: one user-keyed
# lead window ordered by (ts, event_id) — the unique tie-break makes
# same-timestamp ordering engine-portable — then a type-alphabet²
# count.  Exact integers.
@q("q137_transition_matrix", sql="""
SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events)
WHERE to_type IS NOT NULL
GROUP BY 1, 2
""")
def q137(spark, sf):
    from rainforest_spark.operators.aggregates import transition_matrix
    return transition_matrix(T(spark, sf, "events"), "user_id", "ts",
                             "event_type", tie_col="event_id")


# ---------------------------------------------------------------- q138
# Conversion-latency quantiles per weekly cohort: the funnel's
# converters ranked by (latency, user) through the GROUPED
# ranged_cumsum (cohorts are few and huge — the q34/q126 pattern; a
# plain partitionBy(cohort) window would serialize into one task per
# cohort), then lower-median and p90 by conditional-min rank
# arithmetic.  All-integer (epoch-micros diffs div to whole seconds);
# `div`/`//` agree on the non-negative operands.
@q("q138_conversion_latency", sql="""
WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
       FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1),
conv AS (
  SELECT s1.user_id,
         epoch_us(t1) // 604800000000 AS cohort_period,
         (epoch_us(t3) - epoch_us(t1)) // 1000000 AS lat
  FROM s1 JOIN s3 USING (user_id)),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY cohort_period
                            ORDER BY lat, user_id) AS rnk,
         COUNT(*) OVER (PARTITION BY cohort_period) AS n
  FROM conv)
SELECT cohort_period,
       CAST(MAX(n) AS BIGINT) AS n_converters,
       CAST(MIN(CASE WHEN rnk >= (n + 1) // 2 THEN lat END)
            AS BIGINT) AS median_latency_s,
       CAST(MIN(CASE WHEN rnk >= (9 * n + 9) // 10 THEN lat END)
            AS BIGINT) AS p90_latency_s
FROM r GROUP BY 1
""")
def q138(spark, sf):
    from rainforest_spark.operators.aggregates import funnel
    from rainforest_spark.operators.windows import ranged_cumsum
    f = funnel(T(spark, sf, "events"), "user_id", "ts", "event_type",
               ["view", "click", "purchase"])
    conv = (f.filter(F.col("stage_reached") == 3)
            .select("user_id",
                    F.unix_micros("t_entry").alias("eus"),
                    F.unix_micros("t_convert").alias("cus"))
            .select("user_id",
                    F.expr("eus div 604800000000").alias("cohort_period"),
                    F.expr("(cus - eus) div 1000000").alias("lat")))
    keyed = (conv
             .withColumn("__key", F.col("lat") * F.lit(10_000_000_000)
                         + F.col("user_id"))
             .withColumn("__one", F.lit(1).cast("long")))
    r = ranged_cumsum(keyed, "__key", "__one", cum_col="rnk",
                      group_cols=["cohort_period"], total_col="n")
    return (r.groupBy("cohort_period").agg(
        F.max("n").cast("long").alias("n_converters"),
        F.min(F.when(F.col("rnk") >= F.expr("(n + 1) div 2"),
                     F.col("lat"))).cast("long")
        .alias("median_latency_s"),
        F.min(F.when(F.col("rnk") >= F.expr("(9 * n + 9) div 10"),
                     F.col("lat"))).cast("long")
        .alias("p90_latency_s")))


# ---------------------------------------------------------------- q139
# Keyless point-in-interval join (J-family extension): ±5-min incident
# windows around per-user error bursts (30-min-gap sessionization),
# then EVERY click — any user — counted into every window it falls in.
# No equi-key exists, so Spark would plan a BroadcastNestedLoopJoin;
# operators/joins.interval_join rewrites it as a time-bucket-expansion
# equi-join (sequence-exploded interval buckets ⋈ bucketed points +
# exact containment filter).  All-integer epoch-micros arithmetic.
# DuckDB's native IEJoin range join is the oracle.
@q("q139_interval_join", sql="""
WITH err AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events WHERE event_type = 'error'),
g AS (
  SELECT *, CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id ORDER BY ts)
                      > 1800
                 OR LAG(sec) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
            THEN 1 ELSE 0 END AS brk
  FROM err),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM g),
iv AS (
  SELECT user_id, session_id,
         MIN(us) - 300000000 AS start_us,
         MAX(us) + 300000000 AS end_us
  FROM s GROUP BY 1, 2),
clk AS (SELECT epoch_us(ts) AS cus FROM events
        WHERE event_type = 'click')
SELECT iv.user_id, iv.start_us, iv.end_us,
       CAST(COUNT(clk.cus) AS BIGINT) AS n_clicks
FROM iv LEFT JOIN clk ON clk.cus BETWEEN iv.start_us AND iv.end_us
GROUP BY 1, 2, 3
""")
def q139(spark, sf):
    from rainforest_spark.operators.aggregates import sessionize
    from rainforest_spark.operators.joins import interval_join
    e = T(spark, sf, "events")
    err = e.filter(F.col("event_type") == "error")
    iv = (sessionize(err, ["user_id"], "ts", 1800)
          .withColumn("us", F.unix_micros("ts"))
          .groupBy("user_id", "session_id")
          .agg((F.min("us") - 300_000_000).alias("start_us"),
               (F.max("us") + 300_000_000).alias("end_us")))
    clk = (e.filter(F.col("event_type") == "click")
           .select(F.unix_micros("ts").alias("cus")))
    matched = interval_join(clk, iv, "cus", "start_us", "end_us",
                            bucket_sec=600)
    cnt = (matched.groupBy("user_id", "session_id")
           .agg(F.count(F.lit(1)).alias("__n")))
    return (iv.join(cnt, ["user_id", "session_id"], "left")
            .select("user_id", "start_us", "end_us",
                    F.coalesce(F.col("__n"), F.lit(0)).cast("long")
                    .alias("n_clicks")))


# ---------------------------------------------------------------- q140
# Rolling z-score anomaly detection (W-family extension): per-user
# trailing-10 window, flag |x − μ| > 2σ with the PURE-INTEGER squared
# inequality (n·x−S)²·(n−1) > z²·n·(n·Q−S²) — no FP in the decision
# (operators/windows.rolling_zscore).  Emitted z is one shared double
# expression tree off the exact integers, rounded 6dp.
@q("q140_rolling_zscore", sql="""
WITH b AS (
  SELECT event_id, user_id, ts, value,
         CAST(floor(value * 1e9 + 0.5) AS BIGINT) AS vn
  FROM events),
wnd AS (
  SELECT *, SUM(vn) OVER w AS s,
         SUM(CAST(vn AS HUGEINT) * CAST(vn AS HUGEINT)) OVER w AS q,
         COUNT(*) OVER w AS cnt
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
f AS (
  SELECT *, cnt * vn - s AS dev,
         cnt * q - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS vnum
  FROM wnd WHERE cnt = 10)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
       ROUND((CAST(dev AS DOUBLE) / 10)
             / sqrt(CAST(vnum AS DOUBLE) / 90), 6) AS zscore
FROM f
WHERE vnum > 0
  AND CAST(dev AS HUGEINT) * CAST(dev AS HUGEINT) * 9
      > 4 * 10 * vnum
""")
def q140(spark, sf):
    from rainforest_spark.operators.windows import rolling_zscore
    e = T(spark, sf, "events")
    out = rolling_zscore(e, ["user_id"], "ts", "value",
                         tie_col="event_id", window_rows=10, z_thresh=2)
    return out.select("event_id", "user_id",
                      F.unix_micros("ts").alias("ts_us"),
                      "value", "zscore")


# ---------------------------------------------------------------- q141
# Hierarchical ROLLUP revenue report (A-family extension): grand total
# → per-status → per-(status, priority), grouping id spelled as the
# explicit 2·g(status)+g(priority) in BOTH engines.  Decimal-exact
# revenue sums (order-independent partial agg).
@q("q141_rollup_report", sql="""
SELECT o_orderstatus, o_orderpriority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""")
def q141(spark, sf):
    o = T(spark, sf, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg((2 * F.grouping("o_orderstatus")
                  + F.grouping("o_orderpriority")).cast("long")
                 .alias("gid"),
                 sum_dec("o_totalprice").alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders")))


# ---------------------------------------------------------------- q143
# SCD-2 validity intervals (W-family extension): each customer's order-
# priority history collapsed to [valid_from, valid_to) runs via gaps-
# and-islands (operators/windows.attribute_intervals); the open run
# carries NULL valid_to.  (o_orderdate, o_orderkey) ordering makes
# same-day writes engine-portable.  Pure string/integer arithmetic.
@q("q143_scd2_intervals", sql="""
WITH c AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey)
             AS prev
  FROM orders),
ch AS (SELECT * FROM c WHERE prev IS NULL OR prev != o_orderpriority)
SELECT o_custkey, o_orderpriority,
       epoch_us(o_orderdate) AS valid_from_us,
       epoch_us(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey))
           AS valid_to_us,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS version
FROM ch
""")
def q143(spark, sf):
    from rainforest_spark.operators.windows import attribute_intervals
    o = T(spark, sf, "orders")
    out = attribute_intervals(o, ["o_custkey"], "o_orderdate",
                              "o_orderpriority", tie_col="o_orderkey")
    # o_orderdate ships TIMESTAMP_NTZ; session tz is UTC so the cast
    # to TIMESTAMP is the identity (the epoch_s convention)
    return out.select(
        "o_custkey", "o_orderpriority",
        F.unix_micros(F.col("valid_from").cast("timestamp"))
        .alias("valid_from_us"),
        F.unix_micros(F.col("valid_to").cast("timestamp"))
        .alias("valid_to_us"),
        F.col("version").cast("long").alias("version"))


# ---------------------------------------------------------------- q144
# Blocked fuzzy entity matching (J-family extension): near-duplicate
# part names under Levenshtein <= 4, candidates ONLY from the
# (noun-token, p_size) blocking equi-join (operators/joins.fuzzy_match)
# — never all-pairs.  Edit distance is pure integer DP, exact across
# engines; Spark additionally early-abandons via the thresholded
# levenshtein(l, r, d) form.
@q("q144_fuzzy_match", sql="""
WITH s AS (
  SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS noun, p_size
  FROM part)
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       a.p_name AS text_a, b.p_name AS text_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM s a JOIN s b ON a.noun = b.noun AND a.p_size = b.p_size
WHERE a.p_partkey < b.p_partkey
  AND levenshtein(a.p_name, b.p_name) <= 4
""")
def q144(spark, sf):
    p = T(spark, sf, "part")
    noun = F.element_at(F.split(F.col("p_name"), " "), 2)
    return J.fuzzy_match(p, "p_partkey", "p_name",
                         [noun, "p_size"], max_dist=4) \
        .select("id_a", "id_b", "text_a", "text_b",
                F.col("dist").cast("int").alias("dist"))


# ---------------------------------------------------------------- q145
# Time-weighted mean (TWAP) per user series (A-family extension): each
# value held until the user's next event; exact nanos x micros products
# ride DECIMAL(38,0)/HUGEINT so the 32-partition partial agg matches
# DuckDB's sequential scan bit-for-bit
# (operators/aggregates.time_weighted_mean).
@q("q145_time_weighted_mean", sql="""
WITH b AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(floor(value * 1e9 + 0.5) AS BIGINT) AS vn
  FROM events),
h AS (
  SELECT user_id, vn,
         LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             - us AS dus
  FROM b),
g AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_holds,
         SUM(CAST(vn AS HUGEINT) * dus) AS sp,
         SUM(CAST(dus AS HUGEINT)) AS sd
  FROM h WHERE dus IS NOT NULL
  GROUP BY user_id)
SELECT user_id, n_holds,
       CAST((2*sp + 1000*sd) // (2000*sd) AS DOUBLE) / 1e6 AS tw_mean
FROM g
""")
def q145(spark, sf):
    e = T(spark, sf, "events")
    return A.time_weighted_mean(e, ["user_id"], "ts", "value",
                                tie_col="event_id") \
        .select("user_id", "n_holds", "tw_mean")


# ---------------------------------------------------------------- q146
# Dyadic-decay EWMA smoothing (W-family extension): trailing-8 EWMA
# with alpha = 1/2, geometric tail folded into the oldest tap so the
# power-of-two weights sum to exactly 1; the smoothed value is ONE
# exact BIGINT over the dyadic constant 128e9
# (operators/windows.dyadic_ewma).
@q("q146_dyadic_ewma", sql="""
WITH b AS (
  SELECT event_id, user_id, ts, value,
         CAST(floor(value * 1e9 + 0.5) AS BIGINT) AS vn
  FROM events),
l AS (
  SELECT *, LAG(vn, 1) OVER w AS v1, LAG(vn, 2) OVER w AS v2,
         LAG(vn, 3) OVER w AS v3, LAG(vn, 4) OVER w AS v4,
         LAG(vn, 5) OVER w AS v5, LAG(vn, 6) OVER w AS v6,
         LAG(vn, 7) OVER w AS v7
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
       CAST((2 * (vn * 64 + v1 * 32 + v2 * 16 + v3 * 8 + v4 * 4
                  + v5 * 2 + v6 + v7) + 128000) // 256000 AS DOUBLE)
           / 1e6 AS ewma
FROM l WHERE v7 IS NOT NULL
""")
def q146(spark, sf):
    e = T(spark, sf, "events")
    out = W.dyadic_ewma(e, ["user_id"], "ts", "value",
                        tie_col="event_id", depth=8)
    return out.select("event_id", "user_id",
                      F.unix_micros("ts").alias("ts_us"), "value", "ewma")


# ---------------------------------------------------------------- q147
# One-sided CUSUM drift detection (W-family extension): S_t = P_t −
# min(0, running-min P_t) over exact nanos — the max(0, ...) recursion
# in closed window form; the S > h decision is a pure integer compare
# (operators/windows.cusum_changepoints).  k = 64, h = 512 (dyadic).
@q("q147_cusum_changepoints", sql="""
WITH b AS (
  SELECT event_id, user_id, ts, value,
         CAST(floor(value * 1e9 + 0.5) AS BIGINT) - 64000000000 AS d
  FROM events),
c1 AS (
  SELECT *, SUM(d) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS p
  FROM b),
c2 AS (
  SELECT *, LEAST(CAST(0 AS HUGEINT),
                  MIN(p) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING)) AS m
  FROM c1)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
       CAST(p - m AS DOUBLE) / 1e9 AS cusum
FROM c2 WHERE p - m > 512000000000
""")
def q147(spark, sf):
    e = T(spark, sf, "events")
    out = W.cusum_changepoints(e, ["user_id"], "ts", "value",
                               tie_col="event_id", k=64.0, h=512.0)
    return out.select("event_id", "user_id",
                      F.unix_micros("ts").alias("ts_us"), "value", "cusum")


# ---------------------------------------------------------------- q148
# Winsorized per-source length stats (robust A-family extension):
# nearest-rank p05/p95 bounds via the grouped ranged_cumsum rank
# (sources are few-huge groups), clamp, exact integer round-half mean
# (operators/aggregates.winsorized_stats).
@q("q148_winsorized_stats", sql="""
WITH r AS (
  SELECT source, n_chars AS v, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents),
bd AS (
  SELECT source,
         MAX(CASE WHEN rnk = (n * 5 + 99) // 100 THEN v END) AS lo,
         MAX(CASE WHEN rnk = (n * 95 + 99) // 100 THEN v END) AS hi0
  FROM r GROUP BY source),
b2 AS (SELECT source, lo, COALESCE(hi0, lo) AS hi FROM bd),
c AS (
  SELECT d.source, LEAST(GREATEST(d.n_chars, b.lo), b.hi) AS cv
  FROM documents d JOIN b2 b USING (source)),
g AS (SELECT source, SUM(CAST(cv AS HUGEINT)) AS s,
             COUNT(*) AS cnt
      FROM c GROUP BY source)
SELECT g.source, CAST(cnt AS BIGINT) AS n, b.lo, b.hi,
       CAST((2000000 * s + cnt) // (2 * cnt) AS DOUBLE) / 1e6 AS w_mean
FROM g JOIN b2 b USING (source)
""")
def q148(spark, sf):
    d = T(spark, sf, "documents")
    return A.winsorized_stats(d, ["source"], "n_chars", tie_col="doc_id")


# ---------------------------------------------------------------- q149
# Median/MAD robust profile with outlier counts per user (A-family
# extension): single groupBy collects nano values; median → deviations
# → MAD → outlier count all in array expressions — one shuffle, no
# joins (operators/aggregates.mad_profile).  Lower medians keep every
# statistic an exact BIGINT.
@q("q149_mad_profile", sql="""
WITH b AS (SELECT user_id, CAST(floor(value * 1e9 + 0.5) AS BIGINT) AS vn
           FROM events),
a AS (SELECT user_id, list_sort(list(vn)) AS arr FROM b GROUP BY user_id),
m AS (SELECT user_id, arr, len(arr) AS n,
             arr[CAST((len(arr) + 1) // 2 AS BIGINT)] AS med
      FROM a),
d AS (SELECT user_id, n, med,
             list_sort(list_transform(arr, x -> abs(x - med))) AS devs
      FROM m),
f AS (SELECT user_id, n, med, devs,
             devs[CAST((n + 1) // 2 AS BIGINT)] AS mad
      FROM d)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(med AS DOUBLE) / 1e9 AS median,
       CAST(mad AS DOUBLE) / 1e9 AS mad,
       CAST(len(list_filter(devs, x -> x > 3 * mad)) AS BIGINT)
           AS n_outliers
FROM f
""")
def q149(spark, sf):
    e = T(spark, sf, "events")
    return A.mad_profile(e, ["user_id"], "value", mad_mult=3)


# ---------------------------------------------------------------- q150
# Frequent session paths (sequence-analytics extension): 30-min
# sessions, each spelled as its first-8 event-type chain, counted per
# path (operators/aggregates.session_paths).  Struct-sorted collection
# makes the order engine-portable (the q135 idiom); exact counts.
@q("q150_session_paths", sql="""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
g AS (
  SELECT *, CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id
                                           ORDER BY ts) > 1800
                 OR LAG(sec) OVER (PARTITION BY user_id ORDER BY ts)
                    IS NULL
            THEN 1 ELSE 0 END AS brk
  FROM e),
s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM g),
r AS (
  SELECT user_id, session_id, event_type, us, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY us, event_id) AS rn
  FROM s),
p AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY us, event_id) AS path
  FROM r WHERE rn <= 8 GROUP BY 1, 2)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
""")
def q150(spark, sf):
    e = T(spark, sf, "events")
    return A.session_paths(e, "user_id", "ts", "event_type",
                           tie_col="event_id", gap_sec=1800, max_len=8)


# ---------------------------------------------------------------- q151
# 7-day rolling active users (A-family extension): rolling DISTINCT
# via bounded fan-out — dedup to (user, day), explode each active day
# into the <= 7 target days it contributes to, exact two-stage
# count-distinct per day (operators/aggregates.rolling_distinct).
@q("q151_rolling_active", sql="""
WITH ud AS (
  SELECT DISTINCT epoch_us(ts) // 1000000 // 86400 AS d, user_id
  FROM events),
fan AS (
  SELECT user_id, d + k.k AS day
  FROM ud, UNNEST(generate_series(0, 6)) AS k(k))
SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
FROM fan GROUP BY day
""")
def q151(spark, sf):
    e = T(spark, sf, "events")
    return A.rolling_distinct(e, "ts", "user_id", window_days=7)


# ---------------------------------------------------------------- q152
# Kaplan-Meier conversion survival (A-family extension): subjects =
# signed-up users; event = first purchase at/after first signup,
# censoring at the user's last event.  Exact integer risk/event
# counts; the KM product is a SEQUENTIAL left fold over the ordered
# factors — Spark aggregate() over a window-collected array, DuckDB
# list_reduce — so the doubles agree bit-for-bit (the q133 fixed-order
# rule) (operators/aggregates.survival_curve).
@q("q152_survival_curve", sql="""
WITH u AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
t0 AS (SELECT user_id, MIN(us) AS t0 FROM u
       WHERE event_type = 'signup' GROUP BY user_id),
ag AS (
  SELECT u.user_id, ANY_VALUE(t0.t0) AS t0,
         MIN(CASE WHEN u.event_type = 'purchase' AND u.us >= t0.t0
                  THEN u.us END) AS tp,
         MAX(u.us) AS tl
  FROM u JOIN t0 USING (user_id) GROUP BY u.user_id),
subj AS (
  SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // 86400000000
              ELSE (tl - t0) // 86400000000 END AS t,
         CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM ag),
per_t AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(SUM(1 - ev) AS BIGINT) AS c,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM subj GROUP BY t),
w AS (SELECT *,
        CAST(SUM(m) OVER () AS BIGINT)
          - CAST(COALESCE(SUM(m) OVER (ORDER BY t ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          AS n_risk
      FROM per_t),
f AS (SELECT *, CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE)
             AS fct
      FROM w),
l AS (SELECT *, list(fct) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED
                                PRECEDING AND CURRENT ROW) AS fs
      FROM f)
SELECT t, n_risk, d, c,
       list_reduce(fs, (a, b) -> a * b) AS survival
FROM l
""")
def q152(spark, sf):
    e = T(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = e.select("user_id", "event_type", us.alias("us"))
    t0 = (u.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("us").alias("t0")))
    ag = (u.join(t0, "user_id")
          .groupBy("user_id")
          .agg(F.any_value("t0").alias("t0"),
               F.min(F.when((F.col("event_type") == "purchase")
                            & (F.col("us") >= F.col("t0")), F.col("us")))
               .alias("tp"),
               F.max("us").alias("tl")))
    subj = ag.select(
        F.when(F.col("tp").isNotNull(),
               F.expr("(tp - t0) div 86400000000"))
        .otherwise(F.expr("(tl - t0) div 86400000000")).alias("duration"),
        F.when(F.col("tp").isNotNull(), 1).otherwise(0).alias("event"))
    return A.survival_curve(subj, "duration", "event")


# ---------------------------------------------------------------- q153
# Functional-dependency audit (data-quality family,
# operators/quality.fd_violations): custkeys whose orders carry more
# than one distinct priority — witnesses that custkey -> priority does
# not hold.  One groupBy; exact two-stage count-distinct.
@q("q153_fd_violations", sql="""
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_rhs
FROM orders GROUP BY o_custkey
HAVING COUNT(DISTINCT o_orderpriority) > 1
""")
def q153(spark, sf):
    from rainforest_spark.operators.quality import fd_violations
    o = T(spark, sf, "orders")
    return fd_violations(o, ["o_custkey"], ["o_orderpriority"])


# ---------------------------------------------------------------- q154
# Referential-integrity audit (data-quality family,
# operators/quality.integrity_audit): orphan/null-FK counts for the
# four fact->dim relations, each ONE left join + ONE aggregate.
@q("q154_integrity_audit", sql="""
SELECT 'orders->customer' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_child,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_fk,
       CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND pk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM orders LEFT JOIN (SELECT DISTINCT c_custkey AS pk FROM customer) p
  ON o_custkey = p.pk
UNION ALL
SELECT 'lineitem->orders',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND pk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey AS pk FROM orders) p
  ON l_orderkey = p.pk
UNION ALL
SELECT 'lineitem->part',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN l_partkey IS NOT NULL AND pk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey AS pk FROM part) p
  ON l_partkey = p.pk
UNION ALL
SELECT 'lineitem->supplier',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT),
       CAST(SUM(CASE WHEN l_suppkey IS NOT NULL AND pk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey AS pk FROM supplier) p
  ON l_suppkey = p.pk
""")
def q154(spark, sf):
    from rainforest_spark.operators.quality import integrity_audit
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    return integrity_audit([
        ("orders->customer", o, ["o_custkey"],
         T(spark, sf, "customer"), ["c_custkey"]),
        ("lineitem->orders", li, ["l_orderkey"], o, ["o_orderkey"]),
        ("lineitem->part", li, ["l_partkey"],
         T(spark, sf, "part"), ["p_partkey"]),
        ("lineitem->supplier", li, ["l_suppkey"],
         T(spark, sf, "supplier"), ["s_suppkey"]),
    ])


# ---------------------------------------------------------------- q155
# Benford first-digit profile (data-quality family,
# operators/quality.benford_profile): integer-string digit extraction
# (no log10 in the digit path), exact counts + round-half shares; the
# Benford expectation is a per-dim-row transcendental rounded 6dp,
# never aggregated.
@q("q155_benford_profile", sql="""
WITH d AS (
  SELECT regexp_extract(CAST(CAST(floor(abs(o_totalprice)) AS BIGINT)
                             AS VARCHAR), '^[1-9]') AS digit
  FROM orders),
c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n
      FROM d WHERE digit != '' GROUP BY digit),
t AS (SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS tt FROM c)
SELECT digit, n,
       CAST((2000000 * n + tt) // (2 * tt) AS DOUBLE) / 1e6 AS share,
       ROUND(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford
FROM t
""")
def q155(spark, sf):
    from rainforest_spark.operators.quality import benford_profile
    o = T(spark, sf, "orders")
    return benford_profile(o, "o_totalprice")


# ---------------------------------------------------------------- q156
# Market-basket co-occurrence with confidence/lift (A-family
# extension, operators/aggregates.co_occurrence): parts co-ordered in
# the same order, support >= 2; pair fan-out governed by basket size
# via the basket-key self-equi-join, ratios as exact decimal
# cross-multiplies with round-half division.
@q("q156_market_basket", sql="""
WITH ub AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
nb AS (SELECT COUNT(DISTINCT b) AS N FROM ub),
it AS (SELECT i, COUNT(*) AS ni FROM ub GROUP BY i),
p AS (
  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_pair
  FROM ub a JOIN ub b ON a.b = b.b AND a.i < b.i
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
j AS (SELECT p.*, ia.ni AS n_a, ib.ni AS n_b, nb.N AS N
      FROM p JOIN it ia ON p.item_a = ia.i
             JOIN it ib ON p.item_b = ib.i CROSS JOIN nb)
SELECT item_a, item_b, CAST(n_pair AS BIGINT) AS n_pair,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST((2000000 * n_pair + n_a) // (2 * n_a) AS DOUBLE) / 1e6
           AS confidence,
       CAST((2 * (1000000 * CAST(n_pair AS HUGEINT) * N)
             + CAST(n_a AS HUGEINT) * n_b)
            // (2 * CAST(n_a AS HUGEINT) * n_b) AS DOUBLE) / 1e6
           AS lift,
       CAST(0 AS BIGINT) AS n_baskets_dropped
FROM j
""")
def q156(spark, sf):
    li = T(spark, sf, "lineitem")
    return A.co_occurrence(li, "l_orderkey", "l_partkey", min_support=2)


# ---------------------------------------------------------------- q157
# Global percentile-rank calibration (W-family extension,
# operators/windows.percentile_rank): exact BIGINT rank via
# ranged_cumsum on the (n_chars, doc_id) struct key — no
# single-partition sort — and (rank-1)/(N-1) as one double division.
@q("q157_percentile_rank", sql="""
SELECT doc_id, n_chars,
       CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS pct_rank,
       CASE WHEN COUNT(*) OVER () > 1
            THEN CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1
                      AS DOUBLE) / CAST(COUNT(*) OVER () - 1 AS DOUBLE)
            ELSE 0.0 END AS pct
FROM documents
""")
def q157(spark, sf):
    d = T(spark, sf, "documents")
    out = W.percentile_rank(d, "n_chars", tie_col="doc_id")
    return out.select("doc_id", "n_chars", "pct_rank", "pct")


# ---------------------------------------------------------------- q158
# Activity-cadence gap audit (data-quality family,
# operators/quality.cadence_gaps): per-user modal day-gap, expected
# slot count at that cadence, missing-day count — all integer.
@q("q158_cadence_gaps", sql="""
WITH ks AS (SELECT DISTINCT user_id,
                   epoch_us(ts) // 1000000 // 86400 AS s
            FROM events),
d AS (SELECT user_id, s - LAG(s) OVER (PARTITION BY user_id ORDER BY s)
             AS dd
      FROM ks),
dn AS (SELECT user_id, dd, COUNT(*) AS c FROM d
       WHERE dd IS NOT NULL GROUP BY 1, 2),
m AS (SELECT user_id, dd AS modal_gap
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                          ORDER BY c DESC, dd ASC) AS rn FROM dn)
      WHERE rn = 1),
sp AS (SELECT user_id, MIN(s) AS lo, MAX(s) AS hi,
              CAST(COUNT(*) AS BIGINT) AS n_active
       FROM ks GROUP BY user_id)
SELECT sp.user_id, n_active, CAST(modal_gap AS BIGINT) AS modal_gap,
       CAST((hi - lo) // modal_gap + 1 AS BIGINT) AS n_expected,
       CAST(GREATEST((hi - lo) // modal_gap + 1 - n_active, 0)
            AS BIGINT) AS n_missing
FROM sp JOIN m USING (user_id)
""")
def q158(spark, sf):
    from rainforest_spark.operators.quality import cadence_gaps
    e = T(spark, sf, "events")
    return cadence_gaps(e, ["user_id"], "ts", grain_sec=86400)


# ---------------------------------------------------------------- q159
# Inverted-index build (retrieval infra,
# operators/text_analysis.inverted_index): per term df / total tf /
# top-3 postings by (tf DESC, id ASC) as an id:tf string.  Term-keyed
# window (many small groups); exact integers and strings only.
@q("q159_inverted_index", sql="""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY term
                                   ORDER BY tf DESC, doc_id) AS rn
      FROM tf),
top AS (SELECT term,
               string_agg(doc_id || ':' || tf, ',' ORDER BY rn)
                   AS postings
        FROM r WHERE rn <= 3 GROUP BY term),
st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
              CAST(SUM(tf) AS BIGINT) AS tf_total
       FROM tf GROUP BY term)
SELECT st.term, df, tf_total, postings
FROM st JOIN top USING (term)
""")
def q159(spark, sf):
    from rainforest_spark.operators.text_analysis import inverted_index
    d = T(spark, sf, "documents")
    return inverted_index(d, "doc_id", "text", k_postings=3)


# ---------------------------------------------------------------- q160
# Global Spearman rank correlation (stats family,
# operators/stats.spearman_corr): two range-partitioned exact ranks
# joined on the unique event key, sum of squared rank gaps as
# DECIMAL(38,0)/HUGEINT, closed form via one round-half-up integer
# micro-division — no single-partition window.
@q("q160_spearman_corr", sql="""
WITH b AS (SELECT value AS x,
                  CAST(floor(epoch(ts)) AS BIGINT) AS y,
                  event_id AS t FROM events),
rx AS (SELECT t, ROW_NUMBER() OVER (ORDER BY x, t) AS rx FROM b),
ry AS (SELECT t, ROW_NUMBER() OVER (ORDER BY y, t) AS ry FROM b),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS s
      FROM rx JOIN ry USING (t)),
d AS (SELECT n, s,
             CAST(n AS HUGEINT) * n * n - n AS dn FROM s)
SELECT n,
       1.0 - CAST((12000000 * s + dn
                   - (12000000 * s + dn) % (2 * dn))
                  // (2 * dn) AS DOUBLE) / 1e6 AS spearman_rho
FROM d
""")
def q160(spark, sf):
    from rainforest_spark.operators.stats import spearman_corr
    e = T(spark, sf, "events").select(
        F.col("value").alias("__x"), epoch_s("ts").alias("__y"),
        F.col("event_id").alias("__t"))
    return spearman_corr(e, "__x", "__y", "__t")


# ---------------------------------------------------------------- q161
# Mann-Whitney U / ROC-AUC contrast (stats family,
# operators/stats.rank_auc): does o_totalprice separate finished from
# open orders?  One ranged rank pass, exact U and 6dp AUC via integer
# cross-multiplies.
@q("q161_auc_contrast", sql="""
WITH b AS (SELECT o_totalprice AS v,
                  CAST(o_orderstatus = 'F' AS BIGINT) AS l,
                  o_orderkey AS t
           FROM orders WHERE o_orderstatus IN ('F', 'O')),
r AS (SELECT l, ROW_NUMBER() OVER (ORDER BY v, t) AS r FROM b),
a AS (SELECT CAST(SUM(l) AS BIGINT) AS n_pos,
             CAST(SUM(1 - l) AS BIGINT) AS n_neg,
             SUM(CASE WHEN l = 1 THEN CAST(r AS HUGEINT)
                      ELSE 0 END) AS rs
      FROM r),
u AS (SELECT n_pos, n_neg,
             rs - (CAST(n_pos AS HUGEINT) * (n_pos + 1)) // 2 AS u,
             CAST(n_pos AS HUGEINT) * n_neg AS nn
      FROM a)
SELECT n_pos, n_neg, CAST(u AS BIGINT) AS u_stat,
       CAST((2000000 * u + nn - (2000000 * u + nn) % (2 * nn))
            // (2 * nn) AS DOUBLE) / 1e6 AS auc
FROM u
""")
def q161(spark, sf):
    from rainforest_spark.operators.stats import rank_auc
    o = T(spark, sf, "orders").filter(
        F.col("o_orderstatus").isin("F", "O"))
    return rank_auc(o, "o_totalprice",
                    (F.col("o_orderstatus") == "F"), "o_orderkey")


# ---------------------------------------------------------------- q162
# Two-sample KS statistic (stats family, operators/stats.ks_2sample):
# click-vs-view value distributions; per-distinct-value counts, BOTH
# group ECDFs in one ranged_cumsum pass, exact sup via BIGINT
# cross-multiplies + TakeOrdered(1).
@q("q162_ks_statistic", sql="""
WITH pv AS (SELECT value AS v,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                                 ELSE 0 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1
                                 ELSE 0 END) AS BIGINT) AS cb
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY value),
c AS (SELECT v, SUM(ca) OVER (ORDER BY v) AS fa,
             SUM(cb) OVER (ORDER BY v) AS fb FROM pv),
t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM pv),
d AS (SELECT v, ABS(fa * nb - fb * na) AS diff, na, nb FROM c, t),
m AS (SELECT * FROM d ORDER BY diff DESC, v ASC LIMIT 1)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST((2000000 * diff + na * nb
             - (2000000 * diff + na * nb) % (2 * na * nb))
            // (2 * na * nb) AS DOUBLE) / 1e6 AS ks_d,
       v AS ks_at
FROM m
""")
def q162(spark, sf):
    from rainforest_spark.operators.stats import ks_2sample
    e = T(spark, sf, "events").filter(
        F.col("event_type").isin("click", "view"))
    return ks_2sample(e, "value", (F.col("event_type") == "click"))


# ---------------------------------------------------------------- q163
# A/B two-proportion contrast (stats family,
# operators/stats.ab_contrast): odd-user arm vs even-user arm,
# conversion = more purchases than errors; exact 2x2 counts, 6dp
# rates/lift via round-half-up cross-multiplies, chi-square as one
# fixed IEEE double tree over exact integers.
@q("q163_ab_contrast", sql="""
WITH pu AS (SELECT user_id,
                   MAX(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                       AS a,
                   CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
                           > SUM(CASE WHEN event_type = 'error'
                                      THEN 1 ELSE 0 END)
                        THEN 1 ELSE 0 END AS o
            FROM events GROUP BY user_id),
ag AS (SELECT CAST(SUM(a) AS BIGINT) AS n_t,
              CAST(SUM(a * o) AS BIGINT) AS conv_t,
              CAST(SUM(1 - a) AS BIGINT) AS n_c,
              CAST(SUM((1 - a) * o) AS BIGINT) AS conv_c
       FROM pu)
SELECT n_t, conv_t, n_c, conv_c,
       CAST((2000000 * CAST(conv_t AS HUGEINT) + n_t
             - (2000000 * CAST(conv_t AS HUGEINT) + n_t) % (2 * n_t))
            // (2 * n_t) AS DOUBLE) / 1e6 AS rate_t,
       CAST((2000000 * CAST(conv_c AS HUGEINT) + n_c
             - (2000000 * CAST(conv_c AS HUGEINT) + n_c) % (2 * n_c))
            // (2 * n_c) AS DOUBLE) / 1e6 AS rate_c,
       CASE WHEN conv_c > 0 THEN
         CAST((2000000 * (CAST(conv_t AS HUGEINT) * n_c)
               + (CAST(conv_c AS HUGEINT) * n_t)
               - (2000000 * (CAST(conv_t AS HUGEINT) * n_c)
                  + (CAST(conv_c AS HUGEINT) * n_t))
                 % (2 * (CAST(conv_c AS HUGEINT) * n_t)))
              // (2 * (CAST(conv_c AS HUGEINT) * n_t)) AS DOUBLE) / 1e6
       END AS lift,
       CASE WHEN n_t > 0 AND n_c > 0 AND conv_t + conv_c > 0
                 AND n_t + n_c - conv_t - conv_c > 0 THEN
         ROUND(CAST(n_t + n_c AS DOUBLE)
               * CAST(conv_t * (n_c - conv_c)
                      - conv_c * (n_t - conv_t) AS DOUBLE)
               * CAST(conv_t * (n_c - conv_c)
                      - conv_c * (n_t - conv_t) AS DOUBLE)
               / (CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE)
                  * CAST(conv_t + conv_c AS DOUBLE)
                  * CAST(n_t + n_c - conv_t - conv_c AS DOUBLE)), 6)
       END AS chi2
FROM ag
""")
def q163(spark, sf):
    from rainforest_spark.operators.stats import ab_contrast
    e = T(spark, sf, "events")
    # per-user outcome "more purchases than errors" computed first (a
    # unit-level outcome ab_contrast's row-level max cannot express);
    # ab_contrast's per-unit groupBy then passes through 1 row/user
    pu = (e.groupBy("user_id")
          .agg((F.sum(F.when(F.col("event_type") == "purchase", 1)
                      .otherwise(0))
                > F.sum(F.when(F.col("event_type") == "error", 1)
                        .otherwise(0))).alias("__conv")))
    return ab_contrast(pu, "user_id",
                       (F.pmod(F.col("user_id"), F.lit(2)) == 1),
                       "__conv")


# ---------------------------------------------------------------- q164
# RFM segmentation (stats family, operators/stats.rfm_segments):
# per-user recency/frequency/monetary with exact integer quintile
# buckets from ranged ranks ((rank-1)*5 div (N-1), no double
# boundaries) and the marketing 'r-f-m' segment code.
@q("q164_rfm_segments", sql="""
WITH pu AS (SELECT user_id AS unit,
                   MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS last_s,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   SUM(CAST(value AS DECIMAL(18,4))) AS m
            FROM events GROUP BY user_id),
g AS (SELECT MAX(last_s) AS gm FROM pu),
e AS (SELECT unit, (gm - last_s) // 86400 AS recency_days, frequency,
             m, CAST(m AS DOUBLE) AS monetary,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM pu, g),
r AS (SELECT e.*,
             ROW_NUMBER() OVER (ORDER BY recency_days, unit) AS rr,
             ROW_NUMBER() OVER (ORDER BY frequency, unit) AS rf,
             ROW_NUMBER() OVER (ORDER BY m, unit) AS rm
      FROM e),
sc AS (SELECT unit, CAST(recency_days AS BIGINT) AS recency_days,
              frequency, monetary,
              CAST(5 - (CASE WHEN n > 1
                             THEN LEAST(((rr - 1) * 5) // (n - 1), 4)
                             ELSE 0 END) AS INT) AS r_score,
              CAST((CASE WHEN n > 1
                         THEN LEAST(((rf - 1) * 5) // (n - 1), 4)
                         ELSE 0 END) + 1 AS INT) AS f_score,
              CAST((CASE WHEN n > 1
                         THEN LEAST(((rm - 1) * 5) // (n - 1), 4)
                         ELSE 0 END) + 1 AS INT) AS m_score
       FROM r)
SELECT *, r_score || '-' || f_score || '-' || m_score AS segment
FROM sc
""")
def q164(spark, sf):
    from rainforest_spark.operators.stats import rfm_segments
    e = T(spark, sf, "events")
    return rfm_segments(e, "user_id", "ts", "value", n_buckets=5)


# ---------------------------------------------------------------- q165
# Last-touch conversion attribution (stats family,
# operators/stats.last_touch_attribution): purchases credited to the
# latest preceding click/view/signup within 7 days via one user-keyed
# last(ignoreNulls) window; 'direct' otherwise; DECIMAL(18,4) revenue
# rollup per channel.
@q("q165_attribution", sql="""
WITH b AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                  event_id AS i, event_type AS ty, value
           FROM events),
c AS (SELECT u, s, i, ty, value,
             LAST_VALUE(CASE WHEN ty IN ('click', 'view', 'signup')
                             THEN {'s': s, 'ty': ty} END IGNORE NULLS)
                 OVER (PARTITION BY u ORDER BY s, i
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS lt
      FROM b),
p AS (SELECT CASE WHEN lt IS NOT NULL AND s - lt.s <= 604800
                  THEN lt.ty ELSE 'direct' END AS channel, value
      FROM c WHERE ty = 'purchase')
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM p GROUP BY channel
""")
def q165(spark, sf):
    from rainforest_spark.operators.stats import last_touch_attribution
    e = T(spark, sf, "events")
    return last_touch_attribution(
        e, "user_id", "ts", "event_id", "event_type",
        conversion_type="purchase",
        touch_types=["click", "view", "signup"], value_col="value",
        lookback_sec=7 * 86400)


# ---------------------------------------------------------------- q166
# Triangle census over the co-purchase graph (graph family,
# operators/graph.triangle_census): edges = part pairs co-ordered in
# >= 2 orders (the q156 machinery); degree-oriented wedge join — every
# out-neighborhood O(sqrt m), hub-safe — exact triangle/wedge counts
# and the 6dp global clustering coefficient.
@q("q166_triangle_census", sql="""
WITH ub AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i
            FROM lineitem),
ed AS (SELECT a.i AS u, b.i AS v
       FROM ub a JOIN ub b ON a.bk = b.bk AND a.i < b.i
       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u, v FROM ed UNION ALL SELECT v, u FROM ed),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY u),
e AS (SELECT s.u, s.v, dv.d AS dv
      FROM sym s JOIN deg du ON s.u = du.u JOIN deg dv ON s.v = dv.u
      WHERE du.d < dv.d OR (du.d = dv.d AND s.u < s.v)),
w AS (SELECT w1.u, w1.v AS y, w2.v AS z
      FROM e w1 JOIN e w2 ON w1.u = w2.u
      WHERE w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v)),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
        FROM w JOIN e ON w.y = e.u AND w.z = e.v),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
              CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
              CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
       FROM deg)
SELECT n_nodes, n_edges, t AS n_triangles, n_wedges,
       CASE WHEN n_wedges > 0 THEN
         CAST((6000000 * CAST(t AS HUGEINT) + n_wedges
               - (6000000 * CAST(t AS HUGEINT) + n_wedges)
                 % (2 * n_wedges))
              // (2 * n_wedges) AS DOUBLE) / 1e6
       END AS clustering_coeff
FROM st, tri
""")
def q166(spark, sf):
    from rainforest_spark.operators.graph import triangle_census
    li = T(spark, sf, "lineitem")
    ub = li.select(F.col("l_orderkey").alias("bk"),
                   F.col("l_partkey").alias("i")).distinct()
    a = ub.select("bk", F.col("i").alias("pa"))
    b = ub.select("bk", F.col("i").alias("pb"))
    ed = (a.join(b, "bk").filter(F.col("pa") < F.col("pb"))
          .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n"))
          .filter(F.col("n") >= 2))
    return triangle_census(ed, "pa", "pb")


# ---------------------------------------------------------------- q167
# Lead-lag cross-correlation (stats family,
# operators/stats.lead_lag_corr): daily click counts vs purchase
# counts at lags -3..+3; exact integer sufficient statistics, Pearson
# as one fixed IEEE tree, zero-variance by exact integer compare.
@q("q167_lead_lag", sql="""
WITH ps AS (SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS s,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1
                                 ELSE 0 END) AS BIGINT) AS a,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                 ELSE 0 END) AS BIGINT) AS b
            FROM events GROUP BY 1),
lg AS (SELECT * FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3))
       t(lag)),
pr AS (SELECT lg.lag, p1.a, p2.b
       FROM ps p1 CROSS JOIN lg JOIN ps p2 ON p2.s = p1.s + lg.lag),
ag AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_slots,
              CAST(SUM(a) AS BIGINT) AS sx,
              CAST(SUM(b) AS BIGINT) AS sy,
              CAST(SUM(a * a) AS BIGINT) AS sxx,
              CAST(SUM(b * b) AS BIGINT) AS syy,
              CAST(SUM(a * b) AS BIGINT) AS sxy
       FROM pr GROUP BY lag)
SELECT CAST(lag AS INT) AS lag, n_slots,
       CASE WHEN n_slots > 1 AND n_slots * sxx != sx * sx
                 AND n_slots * syy != sy * sy THEN
         ROUND(CAST(n_slots * sxy - sx * sy AS DOUBLE)
               / (SQRT(CAST(n_slots * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(n_slots * syy - sy * sy AS DOUBLE))), 6)
       END AS r
FROM ag
""")
def q167(spark, sf):
    from rainforest_spark.operators.stats import lead_lag_corr
    e = T(spark, sf, "events")
    return lead_lag_corr(
        e, "ts",
        F.when(F.col("event_type") == "click", 1).otherwise(0),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0),
        max_lag=3, grain_sec=86400)


# ---------------------------------------------------------------- q168
# Population-stability-index drift profile (stats family,
# operators/stats.psi_profile): view-vs-click value distributions over
# 10 fixed bins; exact BIGINT bin counts, per-bin (p-q)ln(p/q) as one
# fixed IEEE tree rounded to the 1e-9 grid, total as the exact nano
# sum over the bin dim.
@q("q168_psi_drift", sql="""
WITH b AS (
  SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 48.0) AS BIGINT),
                        -1), 10) AS bin,
         CAST(event_type = 'view' AS BIGINT) AS e
  FROM events WHERE event_type IN ('view', 'click')),
pb AS (SELECT bin, CAST(SUM(e) AS BIGINT) AS n_expected,
              CAST(SUM(1 - e) AS BIGINT) AS n_actual
       FROM b GROUP BY bin),
t AS (SELECT CAST(SUM(n_expected) AS BIGINT) AS te,
             CAST(SUM(n_actual) AS BIGINT) AS ta FROM pb),
d AS (SELECT bin, n_expected, n_actual,
             CASE WHEN n_expected > 0 AND n_actual > 0 THEN
               CAST(FLOOR((CAST(n_expected AS DOUBLE) / CAST(te AS DOUBLE)
                     - CAST(n_actual AS DOUBLE) / CAST(ta AS DOUBLE))
                 * LN((CAST(n_expected AS DOUBLE) * CAST(ta AS DOUBLE))
                     / (CAST(n_actual AS DOUBLE) * CAST(te AS DOUBLE)))
                 * 1e9 + 0.5) AS BIGINT) END AS nano
      FROM pb, t)
SELECT bin, n_expected, n_actual,
       CAST(nano AS DOUBLE) / 1e9 AS psi_term,
       CAST(SUM(nano) OVER () AS DOUBLE) / 1e9 AS psi_total
FROM d
""")
def q168(spark, sf):
    from rainforest_spark.operators.stats import psi_profile
    e = T(spark, sf, "events").filter(
        F.col("event_type").isin("view", "click"))
    return psi_profile(e, "value", (F.col("event_type") == "view"),
                       lo=0.0, width=48.0, n_bins=10)


# ---------------------------------------------------------------- q169
# OHLC resampling (aggregates.ohlc): 6-hour bars of event values per
# type; open/close via lexicographic struct-min/max on (epoch,
# event_id, value), exact floor-nano mean with sign-safe round-half-
# away-from-zero — ONE map-side-combined groupBy, no window over data.
@q("q169_ohlc_bars", sql="""
WITH b AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS e,
                  event_id AS t, value AS v,
                  CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS bk
           FROM events),
r AS (SELECT *,
        row_number() OVER (PARTITION BY event_type, bk
                           ORDER BY e, t, v) AS rf,
        row_number() OVER (PARTITION BY event_type, bk
                           ORDER BY e DESC, t DESC, v DESC) AS rl
      FROM b),
a AS (SELECT event_type, bk,
             SUM(CAST(FLOOR(v * 1e9 + 0.5) AS BIGINT)) AS sn,
             MAX(v) AS high, MIN(v) AS low,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2),
f AS (SELECT event_type, bk, v AS open FROM r WHERE rf = 1),
l AS (SELECT event_type, bk, v AS close FROM r WHERE rl = 1)
SELECT a.event_type, bk * 21600 AS bucket_start, open, high, low,
       close, n,
       CAST((CASE WHEN sn < 0 THEN -1 ELSE 1 END)
            * ((2 * abs(sn) + 1000 * n
                - (2 * abs(sn) + 1000 * n) % (2000 * n))
               // (2000 * n)) AS DOUBLE) / 1e6 AS mean_value
FROM a JOIN f USING (event_type, bk) JOIN l USING (event_type, bk)
""")
def q169(spark, sf):
    return A.ohlc(T(spark, sf, "events"), ["event_type"], "ts",
                  "value", "event_id", bucket_sec=21600)


# ---------------------------------------------------------------- q170
# Cross-source quantile normalization (stats family,
# operators/stats.quantile_normalize): per-source document lengths
# calibrated onto the global length distribution — exact integer rank
# mapping through two ranged passes + one rank equi-join.
@q("q170_quantile_normalize", sql="""
WITH b AS (SELECT source AS g, n_chars AS v, doc_id AS t
           FROM documents),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM b),
gl AS (SELECT t, v, row_number() OVER (ORDER BY v, t) AS gr FROM b),
gr AS (SELECT g, v, t,
              row_number() OVER (PARTITION BY g ORDER BY v, t) AS r,
              COUNT(*) OVER (PARTITION BY g) AS ng
       FROM b),
tg AS (SELECT g, v, t,
              CASE WHEN ng > 1 THEN
                (2 * (r - 1) * (nt - 1) + (ng - 1))
                  // (2 * (ng - 1)) + 1
              ELSE (nt + 1) // 2 END AS tgt
       FROM gr, n)
SELECT tg.t AS doc_id, tg.g AS source, tg.v AS n_chars,
       gl.v AS normalized
FROM tg JOIN gl ON gl.gr = tg.tgt
""")
def q170(spark, sf):
    from rainforest_spark.operators.stats import quantile_normalize
    return quantile_normalize(T(spark, sf, "documents"),
                              "source", "n_chars", "doc_id")


# ---------------------------------------------------------------- q171
# Grid-bucketed bounded-radius nearest-neighbor join (J-family
# extension, operators/joins.nearest_site): customers to their nearest
# supplier in a derived integer coordinate space — 9-cell replication
# of the site dim + ONE cell equi-join, exact integer distances,
# LEFT-join NULLs for out-of-radius points.
@q("q171_nearest_site", sql="""
WITH p AS (SELECT c_custkey,
                  (c_custkey * 2654435761) % 1000000 AS px,
                  (c_custkey * 998244353) % 1000000 AS py
           FROM customer),
s AS (SELECT s_suppkey,
             (s_suppkey * 2654435761) % 1000000 AS sx,
             (s_suppkey * 998244353) % 1000000 AS sy
      FROM supplier),
cand AS (SELECT p.c_custkey, s.s_suppkey,
                (px - sx) * (px - sx) + (py - sy) * (py - sy) AS d2
         FROM p JOIN s
           ON abs(px // 125000 - sx // 125000) <= 1
          AND abs(py // 125000 - sy // 125000) <= 1
         WHERE (px - sx) * (px - sx) + (py - sy) * (py - sy)
               <= 15625000000),
best AS (SELECT c_custkey, s_suppkey, d2,
                row_number() OVER (PARTITION BY c_custkey
                                   ORDER BY d2, s_suppkey) AS rn
         FROM cand)
SELECT p.c_custkey, p.px, p.py, b.s_suppkey, b.d2 AS dist_sq
FROM p LEFT JOIN (SELECT c_custkey, s_suppkey, d2 FROM best
                  WHERE rn = 1) b USING (c_custkey)
""")
def q171(spark, sf):
    pts = T(spark, sf, "customer").select(
        "c_custkey",
        F.pmod(F.col("c_custkey") * F.lit(2654435761), F.lit(1000000))
        .alias("px"),
        F.pmod(F.col("c_custkey") * F.lit(998244353), F.lit(1000000))
        .alias("py"))
    sites = T(spark, sf, "supplier").select(
        "s_suppkey",
        F.pmod(F.col("s_suppkey") * F.lit(2654435761), F.lit(1000000))
        .alias("sx"),
        F.pmod(F.col("s_suppkey") * F.lit(998244353), F.lit(1000000))
        .alias("sy"))
    return J.nearest_site(pts, sites, "px", "py", "sx", "sy",
                          ["c_custkey"], ["s_suppkey"], cell=125000)


# ---------------------------------------------------------------- q172
# Connected-component census of the co-purchase graph (graph family,
# operators/graph.component_census over the q68-proven min-label
# propagation): component = min part id, size per component.  Oracle:
# recursive transitive closure (the q68 pattern) + census rollup.
@q("q172_component_census", sql="""
WITH RECURSIVE
ol AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS i FROM lineitem),
ed AS (SELECT a.i AS pa, b.i AS pb
       FROM ol a JOIN ol b ON a.bk = b.bk AND a.i < b.i
       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT pa AS src, pb AS dst FROM ed
        UNION ALL SELECT pb, pa FROM ed),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
lab AS (SELECT src AS v, LEAST(src, MIN(dst)) AS component_id
        FROM reach GROUP BY src)
SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM lab GROUP BY component_id
""")
def q172(spark, sf):
    from rainforest_spark.operators.graph import component_census
    ol = (T(spark, sf, "lineitem")
          .select(F.col("l_orderkey").alias("bk"),
                  F.col("l_partkey").alias("i")).distinct())
    a = ol.select("bk", F.col("i").alias("pa"))
    b = ol.select("bk", F.col("i").alias("pb"))
    ed = (a.join(b, "bk").filter(F.col("pa") < F.col("pb"))
          .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n"))
          .filter(F.col("n") >= 2))
    return component_census(ed, "pa", "pb")


# ---------------------------------------------------------------- q173
# Z-order layout cells (sources/layout.zorder_key): Morton interleave
# of (user_id low 16 bits, clamped value centi-units) — the exact
# integer bit math behind zorder_write's clustering, hash-proven
# cross-engine; per-256th-cell counts and z-extents.
@q("q173_zorder_cells", sql=None)  # SQL attached below (generated)
def q173(spark, sf):
    from rainforest_spark.sources.layout import zorder_key
    e = T(spark, sf, "events").select(
        F.expr("user_id % 65536").alias("__x"),
        F.expr("least(greatest(CAST(floor(value * 100) AS BIGINT),"
               " 0), 65535)").alias("__y"))
    z = zorder_key(["__x", "__y"], bits=16)
    return (e.withColumn("__z", z)
            .select(F.expr("__z >> 24").alias("cell"), "__z")
            .groupBy("cell")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min("__z").alias("z_lo"), F.max("__z").alias("z_hi")))


def _q173_sql():
    from rainforest_spark.sources.layout import zorder_sql
    z = zorder_sql(["__x", "__y"], bits=16)
    return f"""
WITH b AS (SELECT user_id % 65536 AS __x,
                  LEAST(GREATEST(CAST(FLOOR(value * 100) AS BIGINT),
                                 0), 65535) AS __y
           FROM events),
zv AS (SELECT {z} AS __z FROM b)
SELECT __z >> 24 AS cell, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(__z) AS z_lo, MAX(__z) AS z_hi
FROM zv GROUP BY 1
"""


ORACLES["q173_zorder_cells"] = _q173_sql()


# ---------------------------------------------------------------- q174
# Seasonal-baseline anomaly gate (stats family,
# operators/stats.seasonal_anomaly): hour-of-day baselines per event
# type; pure-integer z-inequality over micro-quantized values, exact
# sign-safe baseline means, ONE groupBy + one broadcast join back.
@q("q174_seasonal_anomaly", sql="""
WITH b AS (SELECT event_type AS k,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ep, value AS v,
                  (CAST(floor(epoch(ts)) AS BIGINT) % 86400) // 3600
                    AS slot,
                  CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS m
           FROM events),
base AS (SELECT k, slot, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(m) AS HUGEINT) AS s,
                SUM(CAST(m AS HUGEINT) * m) AS q
         FROM b GROUP BY 1, 2)
SELECT b.k AS event_type, b.ep AS ts_epoch, b.v AS value, b.slot,
       n AS slot_n,
       CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
            * ((2 * abs(s) + n - (2 * abs(s) + n) % (2 * n))
               // (2 * n)) AS DOUBLE) / 1e6 AS slot_mean,
       CASE WHEN n >= 2 THEN
         (n * CAST(m AS HUGEINT) - s) * (n * CAST(m AS HUGEINT) - s)
           * (n - 1) > 9 * n * (n * q - s * s)
       ELSE FALSE END AS is_anomaly
FROM b JOIN base ON base.k = b.k AND base.slot = b.slot
""")
def q174(spark, sf):
    from rainforest_spark.operators.stats import seasonal_anomaly
    out = seasonal_anomaly(T(spark, sf, "events"), ["event_type"],
                           "ts", "value", period_sec=86400,
                           slot_sec=3600, z=3)
    return out.select("event_type", epoch_s("ts").alias("ts_epoch"),
                      "value", "slot", "slot_n", "slot_mean",
                      "is_anomaly")


# ---------------------------------------------------------------- q175
# Linear multi-touch attribution (stats family,
# operators/stats.linear_attribution): purchase value split equally
# across click/view touches in the prior 7 days, remainder to the
# earliest touch (exact micro reconstruction); 'direct' otherwise.
@q("q175_linear_attribution", sql="""
WITH b AS (SELECT user_id AS u, CAST(floor(epoch(ts)) AS BIGINT) AS s,
                  event_id AS i, event_type AS ty, value FROM events),
conv AS (SELECT u, s, i,
                CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS vm
         FROM b WHERE ty = 'purchase'),
tch AS (SELECT u, s, i, ty FROM b WHERE ty IN ('click', 'view')),
pair AS (SELECT c.u, c.s AS cs, c.i AS ci, c.vm,
                t.s AS es, t.i AS ei, t.ty
         FROM conv c JOIN tch t
           ON t.u = c.u AND t.s >= c.s - 604800 AND t.s <= c.s - 1),
kk AS (SELECT u, cs, ci, vm, CAST(COUNT(*) AS BIGINT) AS k,
              MIN({'s': es, 'i': ei}) AS first
       FROM pair GROUP BY 1, 2, 3, 4),
credited AS (SELECT p.ty AS channel,
                    (kk.vm // kk.k)
                    + CASE WHEN p.es = kk.first.s AND p.ei = kk.first.i
                           THEN kk.vm - kk.k * (kk.vm // kk.k)
                           ELSE 0 END AS credit,
                    0 AS dc
             FROM pair p JOIN kk
               ON p.u = kk.u AND p.cs = kk.cs AND p.ci = kk.ci),
direct AS (SELECT 'direct' AS channel, vm AS credit, 1 AS dc
           FROM conv c WHERE NOT EXISTS (
             SELECT 1 FROM tch t WHERE t.u = c.u
               AND t.s >= c.s - 604800 AND t.s <= c.s - 1)),
tc AS (SELECT ty AS channel, CAST(COUNT(*) AS BIGINT) AS n_touches
       FROM pair GROUP BY 1),
allc AS (SELECT * FROM credited UNION ALL SELECT * FROM direct)
SELECT a.channel, COALESCE(tc.n_touches, 0) AS n_touches,
       CAST(SUM(dc) AS BIGINT) AS n_direct,
       CAST(SUM(CAST(credit AS HUGEINT)) AS DOUBLE) / 1e6 AS credit
FROM allc a LEFT JOIN tc USING (channel)
GROUP BY 1, 2
""")
def q175(spark, sf):
    from rainforest_spark.operators.stats import linear_attribution
    return linear_attribution(
        T(spark, sf, "events"), "user_id", "ts", "event_id",
        "event_type", "value", touch_types=["click", "view"],
        conversion_type="purchase", lookback_sec=604800)


# ---------------------------------------------------------------- q176
# Seasonal-naive forecast backtest (stats family,
# operators/stats.seasonal_naive_error): 6-hour volume slots per event
# type, forecast = same slot yesterday, exact integer WAPE.
@q("q176_seasonal_naive_error", sql="""
WITH s AS (SELECT event_type AS k,
                  CAST(floor(epoch(ts)) AS BIGINT) // 21600 AS slot,
                  SUM(CAST(FLOOR(value * 1e6 + 0.5) AS HUGEINT)) AS a
           FROM events GROUP BY 1, 2),
j AS (SELECT cur.k, cur.a, prv.a AS f
      FROM s cur JOIN s prv
        ON prv.k = cur.k AND prv.slot = cur.slot - 4),
ag AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_slots,
              SUM(ABS(a - f)) AS e, SUM(ABS(a)) AS t
       FROM j GROUP BY k)
SELECT k AS event_type, n_slots,
       CASE WHEN t > 0 THEN
         CAST((2000000 * e + t - (2000000 * e + t) % (2 * t))
              // (2 * t) AS DOUBLE) / 1e6 END AS wape
FROM ag
""")
def q176(spark, sf):
    from rainforest_spark.operators.stats import seasonal_naive_error
    return seasonal_naive_error(T(spark, sf, "events"),
                                ["event_type"], "ts", "value",
                                slot_sec=21600, period_slots=4)


# ---------------------------------------------------------------- q177
# Nearest-rank latency bands (stats family,
# operators/stats.latency_bands): p50/p95/p99 of event value per type
# — grouped ranged rank (few huge groups), pure-integer ceil targets,
# values picked AT the rank, never interpolated.
@q("q177_latency_bands", sql="""
WITH b AS (SELECT event_type AS g, value AS v, event_id AS t
           FROM events),
r AS (SELECT g, v,
             row_number() OVER (PARTITION BY g ORDER BY v, t) AS r,
             COUNT(*) OVER (PARTITION BY g) AS n FROM b)
SELECT g AS event_type, CAST(COUNT(*) AS BIGINT) AS n,
       MAX(CASE WHEN r = (50 * n + 99) // 100 THEN v END) AS p50,
       MAX(CASE WHEN r = (95 * n + 99) // 100 THEN v END) AS p95,
       MAX(CASE WHEN r = (99 * n + 99) // 100 THEN v END) AS p99
FROM r GROUP BY g
""")
def q177(spark, sf):
    from rainforest_spark.operators.stats import latency_bands
    return latency_bands(T(spark, sf, "events"), ["event_type"],
                         "value", "event_id")


# ---------------------------------------------------------------- q178
# 2-D Pareto frontier / skyline (stats family,
# operators/stats.pareto_frontier over windows.ranged_cummin): the
# smallest-AND-cheapest parts — per-distinct-size min price, strictly-
# preceding running min over size, survivors joined back.  Two
# shuffles + one equi-join; no self-join over the data.
@q("q178_pareto_frontier", sql="""
WITH b AS (SELECT p_partkey, p_size, p_retailprice FROM part),
d AS (SELECT p_size AS x, MIN(p_retailprice) AS miny
      FROM b GROUP BY 1),
m AS (SELECT x, miny,
             MIN(miny) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                             PRECEDING AND 1 PRECEDING) AS mp
      FROM d),
k AS (SELECT x, miny FROM m WHERE mp IS NULL OR mp > miny)
SELECT b.p_partkey, b.p_size, b.p_retailprice
FROM b JOIN k ON b.p_size = k.x AND b.p_retailprice = k.miny
""")
def q178(spark, sf):
    from rainforest_spark.operators.stats import pareto_frontier
    p = T(spark, sf, "part").select("p_partkey", "p_size",
                                    "p_retailprice")
    return pareto_frontier(p, "p_size", "p_retailprice")


# ---------------------------------------------------------------- q179
# Delete-a-group jackknife mean (stats family,
# operators/stats.jackknife_mean): corpus mean document length with a
# cluster-robust standard error over sources; exact micro LOO means,
# exact micro^2 deviation sums on the group dim, one double sqrt.
@q("q179_jackknife_mean", sql="""
WITH per AS (SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n,
                    SUM(CAST(FLOOR(n_chars * 1e6 + 0.5) AS HUGEINT))
                      AS s
             FROM documents GROUP BY source),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(s) AS ss,
             CAST(COUNT(*) AS BIGINT) AS g FROM per),
loo AS (SELECT grp, n,
               (2 * (ss - s) + (nn - n)
                - (2 * (ss - s) + (nn - n)) % (2 * (nn - n)))
                 // (2 * (nn - n)) AS lm, g
        FROM per, t),
agg AS (SELECT SUM(lm) AS sl FROM loo),
dev AS (SELECT grp, n, lm, g,
               (g * lm - sl) * (g * lm - sl) AS d2
        FROM loo, agg),
sd AS (SELECT SUM(d2) AS sd2 FROM dev)
SELECT grp AS source, n,
       CAST(lm AS DOUBLE) / 1e6 AS loo_mean,
       ROUND(SQRT(CAST(sd2 AS DOUBLE) * CAST(g - 1 AS DOUBLE)
                  / (CAST(g AS DOUBLE) * CAST(g AS DOUBLE)
                     * CAST(g AS DOUBLE)) / 1e12), 6) AS jk_se
FROM dev, sd
""")
def q179(spark, sf):
    from rainforest_spark.operators.stats import jackknife_mean
    return jackknife_mean(T(spark, sf, "documents"), "source",
                          "n_chars")


# ---------------------------------------------------------------- q180
# Item-item cosine neighborhoods (aggregates.item_similarity_topk):
# "also bought" top-3 per part from co-purchase counts; score rounds
# to 6dp BEFORE ranking (q69 rule) with the neighbor tie-break.
@q("q180_item_similarity", sql="""
WITH ub AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
            FROM lineitem),
itn AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS ni FROM ub GROUP BY i),
p AS (SELECT a.i AS item, b.i AS neighbor,
             CAST(COUNT(*) AS BIGINT) AS n_pair
      FROM ub a JOIN ub b ON a.b = b.b AND a.i < b.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT item, neighbor, n_pair FROM p
        UNION ALL SELECT neighbor, item, n_pair FROM p),
sc AS (SELECT s.item, s.neighbor, s.n_pair,
              na.ni AS n_item, nb.ni AS n_neighbor,
              ROUND(CAST(s.n_pair AS DOUBLE)
                    / SQRT(CAST(na.ni * nb.ni AS DOUBLE)), 6) AS cosine
       FROM sym s JOIN itn na ON na.i = s.item
                  JOIN itn nb ON nb.i = s.neighbor),
r AS (SELECT *, row_number() OVER (PARTITION BY item
                ORDER BY cosine DESC, neighbor ASC) AS rnk FROM sc)
SELECT item, neighbor, n_pair, n_item, n_neighbor, cosine,
       CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= 3
""")
def q180(spark, sf):
    l = T(spark, sf, "lineitem")
    return A.item_similarity_topk(l, "l_orderkey", "l_partkey",
                                  k=3, min_support=2)


# ---------------------------------------------------------------- q182
# Grouped Pareto frontier (stats.pareto_frontier with group_cols): the
# per-BRAND smallest-and-cheapest part shortlist — grouped
# ranged_cummin on the distinct-(brand, size) dim.
@q("q182_brand_frontier", sql="""
WITH b AS (SELECT p_partkey, p_brand, p_size, p_retailprice FROM part),
d AS (SELECT p_brand, p_size AS x, MIN(p_retailprice) AS miny
      FROM b GROUP BY 1, 2),
m AS (SELECT p_brand, x, miny,
             MIN(miny) OVER (PARTITION BY p_brand ORDER BY x
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS mp
      FROM d),
k AS (SELECT p_brand, x, miny FROM m WHERE mp IS NULL OR mp > miny)
SELECT b.p_partkey, b.p_brand, b.p_size, b.p_retailprice
FROM b JOIN k ON b.p_brand = k.p_brand AND b.p_size = k.x
             AND b.p_retailprice = k.miny
""")
def q182(spark, sf):
    from rainforest_spark.operators.stats import pareto_frontier
    p = T(spark, sf, "part").select("p_partkey", "p_brand", "p_size",
                                    "p_retailprice")
    return pareto_frontier(p, "p_size", "p_retailprice",
                           group_cols=["p_brand"])


# ---------------------------------------------------------------- q183
# CUPED variance-reduced A/B contrast (stats.cuped_contrast): odd/even
# user arms, purchase revenue adjusted by view-engagement covariate;
# per-element micro quantization, exact BIGINT/HUGEINT sufficient
# statistics, identical double trees for theta and the adjusted means.
@q("q183_cuped_contrast", sql="""
WITH pu AS (
  SELECT user_id AS u, CAST(user_id % 2 AS BIGINT) AS arm,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN
               CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS y,
         CAST(SUM(CASE WHEN event_type = 'view' THEN
               CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY user_id),
a AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x) AS HUGEINT) AS sx,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM pu GROUP BY arm),
t AS (SELECT CAST(SUM(n_units) AS HUGEINT) AS tn, SUM(sy) AS tsy,
             SUM(sx) AS tsx, SUM(sxy) AS tsxy, SUM(sxx) AS tsxx
      FROM a),
j AS (SELECT a.*, t.* FROM a, t),
c AS (SELECT arm, n_units, sy, sx,
             (tn * tsxx - tsx * tsx) != 0 AS has_var,
             CAST(tn * tsxy - tsx * tsy AS DOUBLE)
               / CAST(tn * tsxx - tsx * tsx AS DOUBLE) AS theta,
             CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE) AS xbar
      FROM j)
SELECT arm, n_units,
       CAST((CASE WHEN sy < 0 THEN -1 ELSE 1 END)
            * ((2 * abs(sy) + n_units
                - (2 * abs(sy) + n_units) % (2 * n_units))
               // (2 * n_units)) AS DOUBLE) / 1e6 AS raw_mean,
       ROUND(CASE WHEN has_var THEN
               (CAST(sy AS DOUBLE) / CAST(n_units AS DOUBLE)
                - theta * (CAST(sx AS DOUBLE) / CAST(n_units AS DOUBLE)
                           - xbar)) / 1e6
             ELSE CAST(sy AS DOUBLE) / CAST(n_units AS DOUBLE) / 1e6
             END, 6) AS adj_mean,
       CASE WHEN has_var THEN ROUND(theta, 6) END AS theta
FROM c
""")
def q183(spark, sf):
    from rainforest_spark.operators.stats import cuped_contrast
    e = T(spark, sf, "events")
    return cuped_contrast(
        e, "user_id", (F.col("user_id") % 2),
        F.when(F.col("event_type") == "purchase",
               F.col("value")).otherwise(F.lit(0.0)),
        F.when(F.col("event_type") == "view",
               F.col("value")).otherwise(F.lit(0.0)))


# ---------------------------------------------------------------- q184
# Wilson proportion intervals (stats.proportion_ci): per-priority
# fraction of finished orders with 2-sigma Wilson bounds — exact
# counts, one fixed double tree, 6dp.
@q("q184_wilson_ci", sql="""
WITH per AS (SELECT o_orderpriority,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1
                                  ELSE 0 END) AS BIGINT) AS k
             FROM orders GROUP BY 1)
SELECT o_orderpriority, n, k,
       CAST((2000000 * k + n - (2000000 * k + n) % (2 * n))
            // (2 * n) AS DOUBLE) / 1e6 AS rate,
       ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + 4.0 / (2.0 * CAST(n AS DOUBLE))
              - 2.0 * SQRT(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                           * (1.0 - CAST(k AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           / CAST(n AS DOUBLE)
                           + 4.0 / (4.0 * CAST(n AS DOUBLE)
                                    * CAST(n AS DOUBLE))))
             / (1.0 + 4.0 / CAST(n AS DOUBLE)), 6) AS ci_lo,
       ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
              + 4.0 / (2.0 * CAST(n AS DOUBLE))
              + 2.0 * SQRT(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                           * (1.0 - CAST(k AS DOUBLE)
                              / CAST(n AS DOUBLE))
                           / CAST(n AS DOUBLE)
                           + 4.0 / (4.0 * CAST(n AS DOUBLE)
                                    * CAST(n AS DOUBLE))))
             / (1.0 + 4.0 / CAST(n AS DOUBLE)), 6) AS ci_hi
FROM per
""")
def q184(spark, sf):
    from rainforest_spark.operators.stats import proportion_ci
    return proportion_ci(T(spark, sf, "orders"), ["o_orderpriority"],
                         (F.col("o_orderstatus") == "F"), z=2)


# ---------------------------------------------------------------- q185
# Grid-density clustering (graph.grid_density_clusters — distributed
# DBSCAN relaxation): derived customer coordinates, 50k cells,
# min_pts=5; dense-cell 8-adjacency components labeled by min packed
# cell id, sparse points NULL (noise).  Oracle: recursive CTE over the
# dense-cell adjacency (the q68 closure pattern on the cell dim).
@q("q185_density_clusters", sql="""
WITH RECURSIVE
p AS (SELECT c_custkey,
             (c_custkey * 2654435761) % 1000000 AS px,
             (c_custkey * 998244353) % 1000000 AS py
      FROM customer),
cells AS (SELECT px // 50000 AS cx, py // 50000 AS cy,
                 COUNT(*) AS n
          FROM p GROUP BY 1, 2),
dense AS (SELECT cx, cy, cx * 4294967296 + cy AS cid
          FROM cells WHERE n >= 5),
ed AS (SELECT a.cid AS s, b.cid AS t
       FROM dense a JOIN dense b
         ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        AND a.cid < b.cid),
sym AS (SELECT s, t FROM ed UNION ALL SELECT t, s FROM ed),
reach(s, t) AS (
  SELECT s, t FROM sym
  UNION
  SELECT r.s, y.t FROM reach r JOIN sym y ON r.t = y.s),
lab AS (SELECT s AS cid, LEAST(s, MIN(t)) AS lab FROM reach GROUP BY s),
dl AS (SELECT d.cx, d.cy, COALESCE(l.lab, d.cid) AS cluster_id
       FROM dense d LEFT JOIN lab l ON l.cid = d.cid)
SELECT p.c_custkey, p.px, p.py, dl.cluster_id
FROM p LEFT JOIN dl ON dl.cx = p.px // 50000 AND dl.cy = p.py // 50000
""")
def q185(spark, sf):
    from rainforest_spark.operators.graph import grid_density_clusters
    pts = T(spark, sf, "customer").select(
        "c_custkey",
        F.pmod(F.col("c_custkey") * F.lit(2654435761), F.lit(1000000))
        .alias("px"),
        F.pmod(F.col("c_custkey") * F.lit(998244353), F.lit(1000000))
        .alias("py"))
    return grid_density_clusters(pts, "px", "py", ["c_custkey"],
                                 cell=50000, min_pts=5)


# ---------------------------------------------------------------- q186
# Column entropy profile (stats.entropy_profile): concentration of the
# documents lang/source columns in one stack-unpivoted pass; exact
# counts, 1e-9-grid −p·ln p terms summed as integers on the value dim.
@q("q186_entropy_profile", sql="""
WITH un AS (
  SELECT 'lang' AS col, CAST(lang AS VARCHAR) AS val FROM documents
  UNION ALL
  SELECT 'source', CAST(source AS VARCHAR) FROM documents),
pv AS (SELECT col, val, CAST(COUNT(*) AS BIGINT) AS c
       FROM un GROUP BY 1, 2),
t AS (SELECT col, CAST(SUM(c) AS BIGINT) AS tt,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM pv GROUP BY col),
d AS (SELECT pv.col, c, tt, k,
             CAST(FLOOR(-(CAST(c AS DOUBLE) / CAST(tt AS DOUBLE))
                        * LN(CAST(c AS DOUBLE) / CAST(tt AS DOUBLE))
                        * 1e9 + 0.5) AS BIGINT) AS nano
      FROM pv JOIN t ON t.col = pv.col)
SELECT col AS "column", MAX(tt) AS n_rows, MAX(k) AS n_distinct,
       CAST(SUM(nano) AS DOUBLE) / 1e9 AS entropy_nats,
       CASE WHEN MAX(k) > 1 THEN
         ROUND((CAST(SUM(nano) AS DOUBLE) / 1e9)
               / LN(CAST(MAX(k) AS DOUBLE)), 6) END
         AS normalized_entropy
FROM d GROUP BY col
""")
def q186(spark, sf):
    from rainforest_spark.operators.stats import entropy_profile
    return entropy_profile(T(spark, sf, "documents"),
                           ["lang", "source"])


# ---------------------------------------------------------------- q187
# Reliability diagram / calibration bins (stats family,
# operators/stats.calibration_curve): a deterministic hash-uniform
# pseudo-probability per event vs a value threshold; one groupBy on
# <= 10 bin keys, exact nano/micro divisions, 6dp gap.
@q("q187_calibration_curve", sql="""
WITH b AS (
  SELECT CAST((event_id * 2654435761) % 1000000 AS DOUBLE) / 1e6 AS s,
         CASE WHEN value > CAST(30 AS DOUBLE) THEN 1 ELSE 0 END AS l
  FROM events),
p AS (
  SELECT LEAST(CAST(FLOOR(s * CAST(10 AS DOUBLE)) AS BIGINT), 9)
           AS bin,
         CAST(FLOOR(s * 1e9 + 0.5) AS BIGINT) AS sn, l
  FROM b WHERE s >= 0 AND s <= 1),
g AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(l) AS BIGINT) AS n_pos,
         CAST(SUM(CAST(sn AS HUGEINT)) AS HUGEINT) AS ssn
  FROM p GROUP BY bin)
SELECT bin, n, n_pos,
       CAST((2 * ssn + n - (2 * ssn + n) % (2 * CAST(n AS HUGEINT)))
            // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e9 AS mean_score,
       CAST((2000000 * CAST(n_pos AS HUGEINT) + n
             - (2000000 * CAST(n_pos AS HUGEINT) + n)
               % (2 * CAST(n AS HUGEINT)))
            // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS frac_pos,
       ROUND(CAST((2000000 * CAST(n_pos AS HUGEINT) + n
                   - (2000000 * CAST(n_pos AS HUGEINT) + n)
                     % (2 * CAST(n AS HUGEINT)))
                  // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6
             - CAST((2 * ssn + n - (2 * ssn + n)
                     % (2 * CAST(n AS HUGEINT)))
                    // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e9,
             6) AS gap
FROM g ORDER BY bin
""")
def q187(spark, sf):
    from rainforest_spark.operators.stats import calibration_curve
    e = T(spark, sf, "events").select(
        (F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(1000000))
         .cast("double") / F.lit(1e6)).alias("__s"),
        (F.col("value") > F.lit(30.0)).alias("__l"))
    return calibration_curve(e, "__s", "__l", n_bins=10)


# ---------------------------------------------------------------- q188
# Cohen's kappa (stats family, operators/stats.cohens_kappa): the
# lineitem (returnflag, linestatus) pair as the two "raters"; exact
# contingency counts, dim-side marginal product, 6dp kappa.
@q("q188_cohens_kappa", sql="""
WITH j AS (
  SELECT COALESCE(CAST(l_returnflag AS VARCHAR), '__null__') AS a,
         COALESCE(CAST(l_linestatus AS VARCHAR), '__null__') AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2),
ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM j GROUP BY a),
cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM j GROUP BY b),
pe AS (SELECT COALESCE(SUM(CAST(ra AS HUGEINT) * cb),
                       CAST(0 AS HUGEINT)) AS pe_num
       FROM ra JOIN cb ON ra.a = cb.b),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM j),
x AS (SELECT n, n_agree, pe_num,
             CAST(n AS HUGEINT) * n AS n2,
             CAST((2000000 * CAST(n_agree AS HUGEINT) + n
                   - (2000000 * CAST(n_agree AS HUGEINT) + n)
                     % (2 * CAST(n AS HUGEINT)))
                  // (2 * CAST(n AS HUGEINT)) AS DOUBLE) / 1e6 AS po
      FROM t, pe),
y AS (SELECT n, n_agree, po, pe_num, n2,
             CAST((2000000 * pe_num + n2
                   - (2000000 * pe_num + n2) % (2 * n2))
                  // (2 * n2) AS DOUBLE) / 1e6 AS pe
      FROM x)
SELECT n, n_agree, po, pe,
       CASE WHEN pe_num <> n2
            THEN ROUND((po - pe) / (CAST(1 AS DOUBLE) - pe), 6) END
         AS kappa
FROM y
""")
def q188(spark, sf):
    from rainforest_spark.operators.stats import cohens_kappa
    return cohens_kappa(T(spark, sf, "lineitem"),
                        "l_returnflag", "l_linestatus")


# ---------------------------------------------------------------- q189
# Cumulative gains / lift table (stats family,
# operators/stats.cumulative_gains): how much of the high-value event
# mass the top score deciles capture; one ranged rank pass (q108
# idiom), bucket-dim cumulatives, exact micro-divisions.
@q("q189_cumulative_gains", sql="""
WITH b AS (
  SELECT CAST((event_id * 2654435761) % 1000000 AS DOUBLE) / 1e6 AS v,
         CASE WHEN value > CAST(30 AS DOUBLE) THEN 1 ELSE 0 END AS l,
         event_id AS t
  FROM events),
r AS (SELECT l, ROW_NUMBER() OVER (ORDER BY v, t) AS r,
             CAST(COUNT(*) OVER () AS BIGINT) AS nn
      FROM b),
g AS (SELECT ((nn - r) * 10) // nn + 1 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(l) AS BIGINT) AS n_pos
      FROM r GROUP BY 1),
c AS (SELECT bucket, n, n_pos,
             CAST(SUM(n) OVER (ORDER BY bucket) AS BIGINT) AS cum_n,
             CAST(SUM(n_pos) OVER (ORDER BY bucket) AS BIGINT)
               AS cum_pos,
             CAST(SUM(n_pos) OVER () AS BIGINT) AS tp,
             CAST(SUM(n) OVER () AS BIGINT) AS tn
      FROM g)
SELECT bucket, n, n_pos, cum_n, cum_pos,
       CASE WHEN tp > 0 THEN
         CAST((2000000 * CAST(cum_pos AS HUGEINT) + tp
               - (2000000 * CAST(cum_pos AS HUGEINT) + tp)
                 % (2 * CAST(tp AS HUGEINT)))
              // (2 * CAST(tp AS HUGEINT)) AS DOUBLE) / 1e6 END
         AS gain,
       CASE WHEN tp > 0 THEN
         CAST((2000000 * CAST(cum_pos AS HUGEINT) * tn
               + CAST(cum_n AS HUGEINT) * tp
               - (2000000 * CAST(cum_pos AS HUGEINT) * tn
                  + CAST(cum_n AS HUGEINT) * tp)
                 % (2 * CAST(cum_n AS HUGEINT) * tp))
              // (2 * CAST(cum_n AS HUGEINT) * tp) AS DOUBLE) / 1e6 END
         AS lift
FROM c ORDER BY bucket
""")
def q189(spark, sf):
    from rainforest_spark.operators.stats import cumulative_gains
    e = T(spark, sf, "events").select(
        (F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(1000000))
         .cast("double") / F.lit(1e6)).alias("__s"),
        (F.col("value") > F.lit(30.0)).alias("__l"),
        F.col("event_id").alias("__t"))
    return cumulative_gains(e, "__s", "__l", "__t", n_buckets=10)


# ---------------------------------------------------------------- q190
# Mutual information / label-leakage audit (stats family,
# operators/stats.mutual_information): does `source` give away `lang`
# in the corpus?  One (a, b) pair groupBy, dim-side marginals, 1e-9
# transcendental grid, exact integer nano sums.
@q("q190_mutual_information", sql="""
WITH j AS (
  SELECT COALESCE(CAST(lang AS VARCHAR), '__null__') AS a,
         COALESCE(CAST(source AS VARCHAR), '__null__') AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM j GROUP BY a),
cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM j GROUP BY b),
t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM j),
ha AS (SELECT CAST(SUM(CAST(FLOOR(
                -(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
                * LN(CAST(ra AS DOUBLE) / CAST(n AS DOUBLE))
                * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS han
      FROM ra, t),
hb AS (SELECT CAST(SUM(CAST(FLOOR(
                -(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                * LN(CAST(cb AS DOUBLE) / CAST(n AS DOUBLE))
                * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS hbn
      FROM cb, t),
mi AS (SELECT CAST(SUM(CAST(FLOOR(
                 (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                 * LN((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
                      / (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE)))
                 * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS min_sum
       FROM j JOIN ra USING (a) JOIN cb USING (b)
       CROSS JOIN t)
SELECT n,
       CAST(han AS DOUBLE) / 1e9 AS h_a,
       CAST(hbn AS DOUBLE) / 1e9 AS h_b,
       CAST(min_sum AS DOUBLE) / 1e9 AS mi_nats,
       CASE WHEN han > 0 AND hbn > 0 THEN
         ROUND((CAST(min_sum AS DOUBLE) / 1e9)
               / SQRT((CAST(han AS DOUBLE) / 1e9)
                      * (CAST(hbn AS DOUBLE) / 1e9)), 6) END AS nmi
FROM t, ha, hb, mi
""")
def q190(spark, sf):
    from rainforest_spark.operators.stats import mutual_information
    return mutual_information(T(spark, sf, "documents"),
                              "lang", "source")


# ---------------------------------------------------------------- q194
# Expression-only HyperLogLog accuracy report (sketches family,
# operators/sketches.hll_accuracy_report): per event_type, the m=256
# register sketch of distinct user_id vs the exact distinct count.
# The register/rho SQL fragments are GENERATED ONCE by the operator
# module and embedded verbatim in both engines' plans (the q173
# zorder pattern), so the sketch — not just its answer — is
# bit-identical; the only transcendental (the linear-counting ln)
# rounds on the 6dp grid.
def _q194_sql() -> str:
    from rainforest_spark.operators.sketches import (
        HLL_RHO_MAX, _register_expr, _rho_exprs,
    )
    reg = _register_expr("h", 8)
    _, rho = _rho_exprs("h", 8)
    m = 256
    alpha = ("(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) "
             "+ CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))")
    return f"""
WITH h AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL),
r AS (
  SELECT event_type, {reg} AS register,
         CAST({rho} AS BIGINT) AS rho
  FROM h),
mx AS (SELECT event_type, register, MAX(rho) AS rho
       FROM r GROUP BY 1, 2),
a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nreg,
             SUM(CAST(POW(CAST(2 AS DOUBLE), {HLL_RHO_MAX} - rho)
                      AS BIGINT)) AS s
      FROM mx GROUP BY 1),
e AS (SELECT event_type, {m} - nreg AS v_zero,
             {alpha} * CAST({m} AS DOUBLE) * CAST({m} AS DOUBLE)
             * CAST({1 << HLL_RHO_MAX} AS DOUBLE)
             / CAST(CAST(s AS HUGEINT)
                    + CAST(({m} - nreg) AS HUGEINT)
                      * CAST({1 << HLL_RHO_MAX} AS HUGEINT)
                    AS DOUBLE) AS eraw
      FROM a),
x AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
               AS n_exact
      FROM events WHERE user_id IS NOT NULL GROUP BY 1),
f AS (SELECT e.event_type, CAST(v_zero AS BIGINT) AS v_zero,
             ROUND(eraw, 6) AS e_raw,
             CASE WHEN eraw <= CAST(640 AS DOUBLE) AND v_zero > 0
                  THEN ROUND(CAST({m} AS DOUBLE)
                             * LN(CAST({m} AS DOUBLE)
                                  / CAST(v_zero AS DOUBLE)), 6)
                  ELSE ROUND(eraw, 6) END AS estimate,
             n_exact
      FROM e JOIN x ON x.event_type = e.event_type)
SELECT event_type, CAST({m} AS BIGINT) AS m, v_zero, n_exact, e_raw,
       estimate,
       ROUND((estimate - CAST(n_exact AS DOUBLE))
             / CAST(n_exact AS DOUBLE), 6) + CAST(0 AS DOUBLE)
           AS rel_error
FROM f
"""


@q("q194_hll_cardinality", sql=_q194_sql())
def q194(spark, sf):
    from rainforest_spark.operators.sketches import hll_accuracy_report
    e = T(spark, sf, "events")
    return hll_accuracy_report(e, "user_id", ["event_type"], b=8)


# ---------------------------------------------------------------- q195
# Bloom-filter membership calibration (sketches family,
# operators/sketches.bloom_fp_report): 4/5 of documents as the
# ingested corpus, all documents as probes — measured FP rate of the
# (m=65536, k=4) filter vs exact membership, plus the textbook
# (1-e^{-kn/m})^k expectation.  Bit positions are exact md5 functions
# (generated-fragment oracle, the q173/q194 pattern); the bit table is
# the broadcastable <=m-row dim that replaces the hot-path anti-join.
def _q195_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    hx = _hex_int_expr("h", 8)
    m, k = 65536, 4
    return f"""
WITH corpus AS (
  SELECT DISTINCT CAST(text AS VARCHAR) AS pv FROM documents
  WHERE doc_id % 5 <> 0 AND text IS NOT NULL),
probes AS (
  SELECT DISTINCT CAST(text AS VARCHAR) AS pv FROM documents
  WHERE text IS NOT NULL),
seeds AS (SELECT seed FROM UNNEST(generate_series(0, {k - 1}))
          AS s(seed)),
cbh AS (SELECT md5(CAST(seed AS VARCHAR) || '|' || md5(pv)) AS h
        FROM corpus, seeds),
cb AS (SELECT DISTINCT {hx} % {m} AS bit FROM cbh),
pbh AS (SELECT pv, md5(CAST(seed AS VARCHAR) || '|' || md5(pv)) AS h
        FROM probes, seeds),
pb AS (SELECT pv, {hx} % {m} AS bit FROM pbh),
hits AS (
  SELECT pv,
         SUM(CASE WHEN cb.bit IS NOT NULL THEN 1 ELSE 0 END) AS nh
  FROM pb LEFT JOIN cb USING (bit) GROUP BY pv),
j AS (
  SELECT h.pv, h.nh = {k} AS maybe,
         CASE WHEN c.pv IS NOT NULL THEN 1 ELSE 0 END AS inn
  FROM hits h LEFT JOIN corpus c ON c.pv = h.pv),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(inn) AS BIGINT) AS n_present,
         CAST(SUM(1 - inn) AS BIGINT) AS n_absent,
         CAST(SUM(CASE WHEN inn = 0 AND maybe THEN 1 ELSE 0 END)
              AS BIGINT) AS false_positives,
         CAST(SUM(CASE WHEN inn = 1 AND NOT maybe THEN 1 ELSE 0 END)
              AS BIGINT) AS fn
  FROM j),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_set FROM cb),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus FROM corpus)
SELECT CAST({m} AS BIGINT) AS m_bits, CAST({k} AS BIGINT) AS k,
       n_corpus, bits_set, n_probes, n_present, n_absent,
       false_positives,
       CASE WHEN n_absent > 0 THEN
         CAST((2000000 * CAST(false_positives AS HUGEINT) + n_absent
               - (2000000 * CAST(false_positives AS HUGEINT)
                  + n_absent) % (2 * CAST(n_absent AS HUGEINT)))
              // (2 * CAST(n_absent AS HUGEINT)) AS DOUBLE) / 1e6 END
         AS fp_rate,
       ROUND(POW(CAST(1 AS DOUBLE)
                 - EXP((-(CAST({k} AS DOUBLE)
                          * CAST(n_corpus AS DOUBLE)))
                       / CAST({m} AS DOUBLE)),
                 CAST({k} AS DOUBLE)), 6) AS fp_expected,
       CAST(CASE WHEN fn = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS no_false_negatives
FROM a, nb, nc
"""


@q("q195_bloom_membership", sql=_q195_sql())
def q195(spark, sf):
    from rainforest_spark.operators.sketches import bloom_fp_report
    d = T(spark, sf, "documents")
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    rep = bloom_fp_report(corpus, d, "text", m_bits=65536, k=4)
    return rep.withColumn(
        "no_false_negatives",
        F.col("no_false_negatives").cast("long"))


# ---------------------------------------------------------------- q208
# SCALABLE-Bloom slab membership (r12, operators/sketches.
# bloom_bits_slab + bloom_membership_rowwise_slabs — the growth
# policy behind the curated_ingest_sink gate): two corpus halves
# committed into DIFFERENT slabs (slab 0 = m bits / k hashes with the
# legacy salts; slab 1 = 2m bits / k+1 hashes with the slab salt) and
# every document probed across BOTH — maybe_present must OR the
# slabs' all-hits tests, with zero false negatives whichever slab
# holds the value.  Bit positions are exact md5 functions
# (generated-fragment oracle, the q195 pattern), so the driver hash
# verifies the slab-1 modulus/extra-hash math itself, not just its
# pytest mirror.  All outputs exact integers.
def _q208_sql() -> str:
    from rainforest_spark.operators.sketches import (
        _hex_int_expr, bloom_slab_params,
    )
    hx = _hex_int_expr("h", 8)
    m, k = 4096, 3
    m1, k1 = bloom_slab_params(m, k, 1)
    return f"""
WITH ca AS (
  SELECT DISTINCT CAST(text AS VARCHAR) AS pv FROM documents
  WHERE doc_id % 5 = 1 AND text IS NOT NULL),
cb_src AS (
  SELECT DISTINCT CAST(text AS VARCHAR) AS pv FROM documents
  WHERE doc_id % 5 IN (2, 3) AND text IS NOT NULL),
probes AS (
  SELECT DISTINCT CAST(text AS VARCHAR) AS pv FROM documents
  WHERE text IS NOT NULL),
s0 AS (SELECT seed FROM UNNEST(generate_series(0, {k - 1}))
       AS s(seed)),
s1 AS (SELECT seed FROM UNNEST(generate_series(0, {k1 - 1}))
       AS s(seed)),
b0 AS (SELECT DISTINCT {hx} % {m} AS bit FROM (
         SELECT md5(CAST(seed AS VARCHAR) || '|' || md5(pv)) AS h
         FROM ca, s0)),
b1 AS (SELECT DISTINCT {hx} % {m1} AS bit FROM (
         SELECT md5(CAST(seed AS VARCHAR) || '#1|' || md5(pv)) AS h
         FROM cb_src, s1)),
p0 AS (SELECT pv, {hx} % {m} AS bit FROM (
         SELECT pv, md5(CAST(seed AS VARCHAR) || '|' || md5(pv)) AS h
         FROM probes, s0)),
p1 AS (SELECT pv, {hx} % {m1} AS bit FROM (
         SELECT pv,
                md5(CAST(seed AS VARCHAR) || '#1|' || md5(pv)) AS h
         FROM probes, s1)),
h0 AS (SELECT pv,
              SUM(CASE WHEN b0.bit IS NOT NULL THEN 1 ELSE 0 END)
                = {k} AS maybe0
       FROM p0 LEFT JOIN b0 USING (bit) GROUP BY pv),
h1 AS (SELECT pv,
              SUM(CASE WHEN b1.bit IS NOT NULL THEN 1 ELSE 0 END)
                = {k1} AS maybe1
       FROM p1 LEFT JOIN b1 USING (bit) GROUP BY pv),
truth AS (SELECT pv, 1 AS inn FROM
            (SELECT pv FROM ca UNION SELECT pv FROM cb_src)),
j AS (
  SELECT p.pv, (h0.maybe0 OR h1.maybe1) AS maybe,
         COALESCE(t.inn, 0) AS inn
  FROM probes p
  JOIN h0 USING (pv) JOIN h1 USING (pv)
  LEFT JOIN truth t USING (pv)),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
         CAST(SUM(inn) AS BIGINT) AS n_present,
         CAST(SUM(1 - inn) AS BIGINT) AS n_absent,
         CAST(SUM(CASE WHEN inn = 0 AND maybe THEN 1 ELSE 0 END)
              AS BIGINT) AS false_positives,
         CAST(CASE WHEN SUM(CASE WHEN inn = 1 AND NOT maybe
                                 THEN 1 ELSE 0 END) = 0
                   THEN 1 ELSE 0 END AS BIGINT)
           AS no_false_negatives
  FROM j),
n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_slab0 FROM b0),
n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS bits_slab1 FROM b1)
SELECT CAST({m} AS BIGINT) AS m_bits, CAST({k} AS BIGINT) AS k,
       bits_slab0, bits_slab1, n_probes, n_present, n_absent,
       false_positives, no_false_negatives
FROM a, n0, n1
"""


@q("q208_bloom_slab_membership", sql=_q208_sql())
def q208(spark, sf):
    from rainforest_spark.operators.sketches import (
        bloom_bits_slab, bloom_membership_rowwise_slabs,
    )
    m, k = 4096, 3
    d = T(spark, sf, "documents").filter(F.col("text").isNotNull())
    ca = d.filter(F.col("doc_id") % 5 == 1)
    cb = d.filter((F.col("doc_id") % 5).isin(2, 3))
    bits = (bloom_bits_slab(ca, "text", m, k, slab=0)
            .unionByName(bloom_bits_slab(cb, "text", m, k, slab=1))
            .localCheckpoint(eager=False))
    probes = d.select(F.col("text").cast("string").alias("pv")) \
        .distinct()
    mem = bloom_membership_rowwise_slabs(bits, probes, "pv", m, k,
                                         slabs=[0, 1])
    truth = (ca.select(F.col("text").cast("string").alias("pv"))
             .unionByName(cb.select(F.col("text").cast("string")
                                    .alias("pv")))
             .distinct().withColumn("__in", F.lit(1)))
    j = mem.join(truth, "pv", "left") \
        .withColumn("__in", F.coalesce(F.col("__in"), F.lit(0)))
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("__in").cast("long").alias("n_present"),
        F.sum(1 - F.col("__in")).cast("long").alias("n_absent"),
        F.sum(F.when((F.col("__in") == 0) & F.col("maybe_present"),
                     1).otherwise(0)).cast("long")
        .alias("false_positives"),
        (F.sum(F.when((F.col("__in") == 1)
                      & ~F.col("maybe_present"), 1).otherwise(0))
         == 0).cast("long").alias("no_false_negatives"))
    sb = bits.agg(
        F.sum(F.when(F.col("slab") == 0, 1).otherwise(0))
        .cast("long").alias("bits_slab0"),
        F.sum(F.when(F.col("slab") == 1, 1).otherwise(0))
        .cast("long").alias("bits_slab1"))
    # 1-row x 1-row global-aggregate cross join (bounded by
    # construction — the q206 whitelist pattern)
    return agg.crossJoin(sb).select(
        F.lit(m).cast("long").alias("m_bits"),
        F.lit(k).cast("long").alias("k"),
        "bits_slab0", "bits_slab1", "n_probes", "n_present",
        "n_absent", "false_positives", "no_false_negatives")


# ---------------------------------------------------------------- q197
# Mergeable quantile-sketch calibration (sketches family,
# operators/sketches.quantile_accuracy_report): per event_type, the
# dyadic-bucket (s=8 mantissa bits — DDSketch/HDR base-2 variant)
# p50/p90/p99 estimate of events.value NEXT TO the exact type-1
# quantile, with the signed relative error (guaranteed ≤ 2^-8).  The
# bucket_key / rep_nanos fragments are GENERATED ONCE by the operator
# module and embedded verbatim in both engines' plans (the q194
# pattern), so the sketch — not just its answer — is bit-identical;
# ranks are exact integer ceils, reps exact BIGINTs, and the only
# doubles are the final denanoize/ratio divisions rounded 6dp.
def _q197_sql() -> str:
    from rainforest_spark.operators.sketches import _qbucket_exprs
    key, rep = _qbucket_exprs("v", 8)
    return f"""
WITH n AS (
  SELECT event_type, CAST(floor(value * 1e9 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
b AS (SELECT event_type, {key} AS bucket_key, {rep} AS rep_nanos
      FROM n),
bc AS (SELECT event_type, bucket_key, rep_nanos,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM b GROUP BY 1, 2, 3),
t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_total
      FROM bc GROUP BY 1),
qq AS (SELECT UNNEST([500000, 900000, 990000]) AS q_ppm),
r AS (SELECT event_type, n_total,
             CAST(q_ppm AS BIGINT) AS q_ppm,
             (CAST(q_ppm AS BIGINT) * n_total + 999999) // 1000000
                 AS rk
      FROM t CROSS JOIN qq),
c AS (SELECT event_type, bucket_key, rep_nanos,
             SUM(cnt) OVER (PARTITION BY event_type
                            ORDER BY bucket_key) AS cum
      FROM bc),
e AS (SELECT r.event_type, q_ppm, n_total,
             MIN(rep_nanos) AS est_nanos
      FROM c JOIN r ON c.event_type = r.event_type
      WHERE cum >= rk GROUP BY 1, 2, 3),
dv AS (SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
       FROM n GROUP BY 1, 2),
dc AS (SELECT event_type, v,
              SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum
       FROM dv),
x AS (SELECT r.event_type, q_ppm, MIN(v) AS exact_nanos
      FROM dc JOIN r ON dc.event_type = r.event_type
      WHERE cum >= rk GROUP BY 1, 2)
SELECT e.event_type, e.q_ppm, n_total AS n, est_nanos, exact_nanos,
       ROUND(CAST(est_nanos AS DOUBLE) / 1e9, 6) AS estimate,
       ROUND(CAST(exact_nanos AS DOUBLE) / 1e9, 6) AS exact,
       CASE WHEN exact_nanos != 0 THEN
            ROUND(CAST(est_nanos - exact_nanos AS DOUBLE)
                  / CAST(abs(exact_nanos) AS DOUBLE), 6)
              + CAST(0 AS DOUBLE)
       END AS rel_error
FROM e JOIN x ON x.event_type = e.event_type AND x.q_ppm = e.q_ppm
"""


@q("q197_quantile_sketch", sql=_q197_sql())
def q197(spark, sf):
    from rainforest_spark.operators.sketches import (
        quantile_accuracy_report,
    )
    ev = T(spark, sf, "events")
    return quantile_accuracy_report(
        ev, "value", [500000, 900000, 990000], ["event_type"], s_bits=8)


# ---------------------------------------------------------------- q198
# KMV (bottom-k) distinct-count calibration (sketches family,
# operators/sketches.kmv_accuracy_report): per event_type, the k=256
# minimum-hash sketch's estimate of distinct user_id next to the
# exact count.  The sketch IS an exact function of the value set (k
# smallest distinct md5 hashes), so both engines materialize the
# identical sketch; the estimator (k−1)/U_k uses the 48-bit hash
# fraction via the shared per-nibble instr fragment, and groups that
# never fill the sketch report their EXACT count.
def _q198_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    u48 = _hex_int_expr("hk", 12)
    return f"""
WITH h AS (SELECT DISTINCT event_type,
                  md5(CAST(user_id AS VARCHAR)) AS h
           FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY h) AS rn
      FROM h),
s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hashes,
             MAX(h) AS hk
      FROM r WHERE rn <= 256 GROUP BY 1),
e AS (SELECT event_type, n_hashes,
             CASE WHEN n_hashes < 256 THEN CAST(n_hashes AS DOUBLE)
                  WHEN {u48} > 0 THEN
                       ROUND(CAST(255 AS DOUBLE)
                             / (CAST({u48} AS DOUBLE)
                                / CAST(281474976710656 AS DOUBLE)), 6)
             END AS estimate
      FROM s),
x AS (SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events WHERE user_id IS NOT NULL GROUP BY 1)
SELECT e.event_type, CAST(256 AS BIGINT) AS k, n_hashes, n_exact,
       estimate,
       ROUND((estimate - CAST(n_exact AS DOUBLE))
             / CAST(n_exact AS DOUBLE), 6) + CAST(0 AS DOUBLE)
           AS rel_error
FROM e JOIN x ON x.event_type = e.event_type
"""


@q("q198_kmv_cardinality", sql=_q198_sql())
def q198(spark, sf):
    from rainforest_spark.operators.sketches import kmv_accuracy_report
    ev = T(spark, sf, "events")
    return kmv_accuracy_report(ev, "user_id", ["event_type"], k=256)


# ---------------------------------------------------------------- q204
# Sketch-backed latency bands (stats family,
# operators/stats.latency_bands_sketch): the SAME dashboard rollup as
# q177 — p50/p95/p99 of events.value per event_type — but answered
# from the mergeable dyadic-bucket quantile sketch (s=8: |rel err| ≤
# 2^-8) instead of the exact grouped ranked pass: ONE bounded-bucket
# groupBy + a ≤16k-row window, and the bucket table maintains
# incrementally (sum-mergeable), so the dashboard never rescans
# history.  The q53_bucketed/q53_shuffle treatment: same answer
# columns, two physical routes, both benched side-by-side.  The
# bucket fragments are generated once and embedded in both engines'
# plans (the q197 pattern); the only doubles are the final denanoize
# divisions rounded 6dp.
def _q204_sql() -> str:
    from rainforest_spark.operators.sketches import _qbucket_exprs
    key, rep = _qbucket_exprs("v", 8)
    return f"""
WITH n AS (
  SELECT event_type, CAST(floor(value * 1e9 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
bc AS (SELECT event_type, {key} AS bucket_key, {rep} AS rep_nanos,
              CAST(COUNT(*) AS BIGINT) AS cnt
       FROM n GROUP BY 1, 2, 3),
t AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_total
      FROM bc GROUP BY 1),
qq AS (SELECT UNNEST([500000, 950000, 990000]) AS q_ppm),
r AS (SELECT event_type, n_total,
             CAST(q_ppm AS BIGINT) AS q_ppm,
             (CAST(q_ppm AS BIGINT) * n_total + 999999) // 1000000
                 AS rk
      FROM t CROSS JOIN qq),
c AS (SELECT event_type, bucket_key, rep_nanos,
             SUM(cnt) OVER (PARTITION BY event_type
                            ORDER BY bucket_key) AS cum
      FROM bc),
e AS (SELECT r.event_type, q_ppm, n_total,
             MIN(rep_nanos) AS est_nanos
      FROM c JOIN r ON c.event_type = r.event_type
      WHERE cum >= rk GROUP BY 1, 2, 3)
SELECT event_type, MIN(n_total) AS n,
       MAX(CASE WHEN q_ppm = 500000 THEN
           ROUND(CAST(est_nanos AS DOUBLE) / 1e9, 6) END) AS p50,
       MAX(CASE WHEN q_ppm = 950000 THEN
           ROUND(CAST(est_nanos AS DOUBLE) / 1e9, 6) END) AS p95,
       MAX(CASE WHEN q_ppm = 990000 THEN
           ROUND(CAST(est_nanos AS DOUBLE) / 1e9, 6) END) AS p99
FROM e GROUP BY event_type
"""


@q("q204_latency_bands_sketch", sql=_q204_sql())
def q204(spark, sf):
    from rainforest_spark.operators.stats import latency_bands_sketch
    return latency_bands_sketch(T(spark, sf, "events"),
                                ["event_type"], "value", s_bits=8)
