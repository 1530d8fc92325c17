"""Goldens for the Z-order layout, component census, and the
seasonal-baseline anomaly gate."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from rainforest_spark.operators.graph import component_census
from rainforest_spark.operators.stats import seasonal_anomaly
from rainforest_spark.sources.layout import (
    zorder_key, zorder_sql, zorder_write,
)


# ---------------------------------------------------------- z-order

def _z_ref(vals, bits=16):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zorder_key_matches_python_reference(spark):
    rng = random.Random(2)
    rows = [(rng.randrange(65536), rng.randrange(65536))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    for r in out:
        assert r["z"] == _z_ref([r["x"], r["y"]]), (r["x"], r["y"])


def test_zorder_sql_matches_spark(spark):
    import duckdb
    rng = random.Random(4)
    rows = [(rng.randrange(65536), rng.randrange(65536))
            for _ in range(100)]
    got = {(x, y): _z_ref([x, y]) for x, y in rows}
    sql = zorder_sql(["x", "y"])
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT, y BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for x, y, z in con.execute(f"SELECT x, y, {sql} FROM t").fetchall():
        assert z == got[(x, y)]


def test_zorder_bits_overflow_guard():
    import pytest
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)   # 64 > 63


def test_zorder_write_files_own_disjoint_z_ranges(spark, tmp_path):
    rng = random.Random(6)
    rows = [(i, rng.randrange(65536), rng.randrange(65536))
            for i in range(5_000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    path = str(tmp_path / "zordered")
    zorder_write(df, path, ["x", "y"], num_files=8)
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    # per-file z-ranges must not overlap: that is the clustering that
    # makes parquet min/max stats prune scans
    ranges = (back.withColumn("f", F.input_file_name())
              .withColumn("z", zorder_key(["x", "y"]))
              .groupBy("f").agg(F.min("z").alias("lo"),
                                F.max("z").alias("hi"))
              .collect())
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert len(spans) > 1
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file z-ranges overlap"


# -------------------------------------------------- component census

def test_component_census_known_graph(spark):
    # {1,2,3} triangle + {10,11} edge -> two components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)], "a long, b long")
    out = {r["component_id"]: r["n_nodes"] for r in
           component_census(edges, "a", "b").collect()}
    assert out == {1: 3, 10: 2}


def test_component_census_chain_converges(spark):
    # a 12-node path: diameter 11 < default max_iter
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a long, b long")
    out = component_census(edges, "a", "b").collect()
    assert len(out) == 1
    assert out[0]["component_id"] == 0 and out[0]["n_nodes"] == 13


# --------------------------------------------------- seasonal anomaly

def _ev(spark, rows):
    df = spark.createDataFrame(rows, "k string, ep long, v double")
    return df.withColumn("ts", F.timestamp_seconds(F.col("ep")))


def test_seasonal_anomaly_flags_spike_in_its_slot(spark):
    # slot 0 (epoch 0-3599 mod 86400): nineteen 10.0s and one 100.0
    # spike (the spike is IN its own baseline, so n must be large
    # enough that the max standardized residual (n-1)/sqrt(n) clears
    # z=3 — n=20 gives 4.25); slot 1: uniform 50.0s, nothing flagged
    rows = ([("a", 86400 * d, 10.0) for d in range(19)]
            + [("a", 86400 * 19, 100.0)]
            + [("a", 86400 * d + 3600, 50.0) for d in range(10)])
    out = seasonal_anomaly(_ev(spark, rows), ["k"], "ts", "v",
                           period_sec=86400, slot_sec=3600, z=3)
    flagged = [(r["slot"], r["v"]) for r in
               out.filter(F.col("is_anomaly")).collect()]
    assert flagged == [(0, 100.0)]
    base = out.filter((F.col("slot") == 0) & (F.col("v") == 10.0)) \
        .collect()[0]
    # slot 0 mean = (19*10 + 100)/20 = 14.5 exactly
    assert base["slot_mean"] == 14.5 and base["slot_n"] == 20


def test_seasonal_anomaly_singleton_slot_never_flagged(spark):
    rows = [("a", 0, 999.0)]
    out = seasonal_anomaly(_ev(spark, rows), ["k"], "ts", "v",
                           period_sec=86400, slot_sec=3600).collect()
    assert out[0]["is_anomaly"] is False and out[0]["slot_n"] == 1


def test_seasonal_anomaly_matches_python_reference(spark):
    rng = random.Random(9)
    rows = [("a", rng.randrange(0, 86400 * 30),
             round(rng.gauss(50, 10), 3)) for _ in range(2_000)]
    out = seasonal_anomaly(_ev(spark, rows), ["k"], "ts", "v",
                           period_sec=86400, slot_sec=21600, z=3)
    got = {(r["slot"], r["v"], r["slot_n"]): r["is_anomaly"]
           for r in out.collect()}
    slots = {}
    for _, ep, v in rows:
        slots.setdefault((ep % 86400) // 21600, []).append(v)
    for (slot, v, n), flag in got.items():
        ms = [math.floor(x * 1e6 + 0.5) for x in slots[slot]]
        m = math.floor(v * 1e6 + 0.5)
        s, q = sum(ms), sum(x * x for x in ms)
        want = (len(ms) >= 2
                and (len(ms) * m - s) ** 2 * (len(ms) - 1)
                > 9 * len(ms) * (len(ms) * q - s * s))
        assert flag == want, (slot, v)
