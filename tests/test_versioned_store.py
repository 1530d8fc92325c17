"""Versioned snapshot store (transaction log) + incremental aggregate
maintenance."""

from __future__ import annotations

import json
import os
import random

import pytest
from pyspark.sql import functions as F

from rainforest_spark.sources.incremental import incremental_agg, read_agg
from rainforest_spark.sources.versioned import (
    commit_snapshot, history, latest_version, read_snapshot, vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def test_append_versions_and_time_travel(spark, tmp_path):
    p = str(tmp_path / "t")
    v1 = commit_snapshot(_df(spark, [("a", 1)]), p, mode="append")
    v2 = commit_snapshot(_df(spark, [("b", 2)]), p, mode="append")
    assert (v1, v2) == (1, 2) and latest_version(p) == 2
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == ["a", "b"]
    # version 1 still reads exactly the old data
    assert [r["k"] for r in
            read_snapshot(spark, p, version=1).collect()] == ["a"]
    hist = history(p)
    assert [h["version"] for h in hist] == [1, 2]
    assert all(h["op"] == "append" for h in hist)


def test_overwrite_replaces_but_old_version_survives(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1), ("b", 2)]), p)
    commit_snapshot(_df(spark, [("z", 9)]), p, mode="overwrite")
    assert [r["k"] for r in read_snapshot(spark, p).collect()] == ["z"]
    assert sorted(r["k"] for r in
                  read_snapshot(spark, p, version=1).collect()) \
        == ["a", "b"]


def test_commit_conflict_retries_to_next_version(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    # simulate a concurrent writer that already took version 2
    log = os.path.join(p, "_log")
    stolen = {"version": 2, "parent": 1, "op": "append", "files": [],
              "ts": 0, "schema": "{}"}
    with open(os.path.join(log, "v00000002.json"), "w") as fh:
        json.dump(stolen, fh)
    v = commit_snapshot(_df(spark, [("b", 2)]), p, mode="overwrite")
    assert v == 3   # lost the race on 2, committed as 3
    assert [r["k"] for r in read_snapshot(spark, p).collect()] == ["b"]


def test_vacuum_drops_old_versions_only(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    commit_snapshot(_df(spark, [("b", 2)]), p, mode="overwrite")
    commit_snapshot(_df(spark, [("c", 3)]), p, mode="append")
    res = vacuum(p, keep_versions=1)
    assert res["manifests_deleted"] == 2
    # v1's file is gone (v3 appended onto v2, so v2+v3 files survive)
    assert res["files_deleted"] >= 1
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == ["b", "c"]
    with pytest.raises(Exception):
        read_snapshot(spark, p, version=1).collect()


def test_read_empty_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))


# ------------------------------------------- incremental aggregates

SPEC = {"n": ("count",), "sum_v": ("sum", "v"),
        "min_v": ("min", "v"), "max_v": ("max", "v")}


def test_incremental_agg_equals_full_recompute(spark, tmp_path):
    rng = random.Random(17)
    store = str(tmp_path / "agg")
    seen = []
    for _ in range(4):
        batch = [(rng.choice("abcde"), rng.randrange(-50, 1000))
                 for _ in range(300)]
        seen += batch
        incremental_agg(spark, store, _df(spark, batch), ["k"], SPEC)
    got = {r["k"]: (r["n"], float(r["sum_v"]), r["min_v"], r["max_v"])
           for r in read_agg(spark, store).collect()}
    full = _df(spark, seen).groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,6)")).alias("s"),
        F.min("v").alias("lo"), F.max("v").alias("hi"))
    want = {r["k"]: (r["n"], float(r["s"]), r["lo"], r["hi"])
            for r in full.collect()}
    assert got == want


def test_incremental_agg_versions_are_per_batch_states(spark, tmp_path):
    store = str(tmp_path / "agg")
    incremental_agg(spark, store, _df(spark, [("a", 1)]), ["k"], SPEC)
    incremental_agg(spark, store, _df(spark, [("a", 2)]), ["k"], SPEC)
    v1 = {r["k"]: r["n"] for r in
          read_agg(spark, store, version=1).collect()}
    v2 = {r["k"]: r["n"] for r in
          read_agg(spark, store, version=2).collect()}
    assert v1 == {"a": 1} and v2 == {"a": 2}


def test_incremental_agg_rejects_non_algebraic(spark, tmp_path):
    with pytest.raises(ValueError):
        incremental_agg(spark, str(tmp_path / "x"),
                        _df(spark, [("a", 1)]), ["k"],
                        {"d": ("count_distinct", "v")})


def test_empty_commit_reads_back_empty_with_schema(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, []), p)
    out = read_snapshot(spark, p)
    assert out.count() == 0 and out.columns == ["k", "v"]


def test_read_changes_between_versions(spark, tmp_path):
    from rainforest_spark.sources.versioned import read_changes
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    commit_snapshot(_df(spark, [("b", 2), ("c", 3)]), p)
    commit_snapshot(_df(spark, [("d", 4)]), p)
    # since v1: the two later batches
    assert sorted(r["k"] for r in
                  read_changes(spark, p, 1).collect()) == ["b", "c", "d"]
    # v1 -> v2 only
    assert sorted(r["k"] for r in
                  read_changes(spark, p, 1, 2).collect()) == ["b", "c"]
    # since the beginning = the full table
    assert len(read_changes(spark, p, 0).collect()) == 4
    # no changes -> empty with schema
    out = read_changes(spark, p, 3, 3)
    assert out.count() == 0 and out.columns == ["k", "v"]
    with pytest.raises(ValueError):
        read_changes(spark, p, 5, 3)


def test_changes_feed_drives_incremental_agg(spark, tmp_path):
    from rainforest_spark.sources.versioned import read_changes
    src = str(tmp_path / "src")
    agg = str(tmp_path / "agg")
    commit_snapshot(_df(spark, [("a", 1), ("a", 2)]), src)
    incremental_agg(spark, agg, read_changes(spark, src, 0), ["k"], SPEC)
    commit_snapshot(_df(spark, [("a", 4), ("b", 8)]), src)
    incremental_agg(spark, agg, read_changes(spark, src, 1), ["k"], SPEC)
    got = {r["k"]: (r["n"], float(r["sum_v"])) for r in
           read_agg(spark, agg).collect()}
    assert got == {"a": (3, 7.0), "b": (1, 8.0)}


def test_cli_snapshot_round_trip(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    src = str(tmp_path / "in")
    _df(spark, [("a", 1), ("b", 2)]).write.parquet(src)
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "rainforest_spark.cli", *argv],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        return _json.loads(r.stdout.strip().splitlines()[-1])

    assert run("snapshot", "commit", store, "-i", src)["version"] == 1
    assert run("snapshot", "commit", store, "-i", src)["version"] == 2
    hist = run("snapshot", "history", store)["history"]
    assert [h["version"] for h in hist] == [1, 2]
    rep = run("snapshot", "read", store, "-o", out, "--version", "1")
    assert rep["rows"] == 2
    assert spark.read.parquet(out).count() == 2
    vac = run("snapshot", "vacuum", store, "--keep", "1")
    assert vac["manifests_deleted"] == 1


def test_snapshot_sink_exactly_once_on_replay(spark, tmp_path):
    from rainforest_spark.sources.versioned import (
        committed_batches, snapshot_sink,
    )
    p = str(tmp_path / "t")
    sink = snapshot_sink(p, query_key="q1")
    sink(_df(spark, [("a", 1)]), 0)
    sink(_df(spark, [("b", 2)]), 1)
    sink(_df(spark, [("b", 2)]), 1)      # replayed batch: skipped
    assert committed_batches(p, "q1") == {0, 1}
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == ["a", "b"]
    # a DIFFERENT query's batch 1 is independent
    snapshot_sink(p, query_key="q2")(_df(spark, [("c", 3)]), 1)
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == ["a", "b", "c"]


def test_snapshot_sink_from_real_stream(spark, tmp_path):
    import pandas as pd

    from rainforest_spark.sources.versioned import snapshot_sink
    src = str(tmp_path / "in")
    os.makedirs(src)
    pd.DataFrame([("a", 1), ("b", 2)], columns=["k", "v"]) \
        .to_parquet(f"{src}/f0.parquet", index=False)
    store = str(tmp_path / "store")
    stream = spark.readStream.schema("k string, v long").parquet(src)
    q = (stream.writeStream
         .foreachBatch(snapshot_sink(store, "ingest"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(r["k"] for r in read_snapshot(spark, store).collect()) \
        == ["a", "b"]


def test_schema_evolution_read_merges_added_column(spark, tmp_path):
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    wide = spark.createDataFrame([("b", 2, "x")],
                                 "k string, v long, extra string")
    commit_snapshot(wide, p, mode="append")
    out = {r["k"]: r["extra"] for r in read_snapshot(spark, p).collect()}
    assert out == {"a": None, "b": "x"}
    # the pre-evolution version still reads with the OLD schema
    assert read_snapshot(spark, p, version=1).columns == ["k", "v"]
