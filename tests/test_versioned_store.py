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


# ------------------------------- vacuum survivors + concurrency races

def test_history_and_batches_survive_vacuum(spark, tmp_path):
    # before round 8, history()/committed_batches() assumed versions
    # contiguous from 1 and raised FileNotFoundError on any vacuumed
    # store, permanently breaking the exactly-once sink
    from rainforest_spark.sources.versioned import (
        committed_batches, snapshot_sink,
    )
    p = str(tmp_path / "t")
    sink = snapshot_sink(p, query_key="q1")
    for b in range(4):
        sink(_df(spark, [(f"k{b}", b)]), b)
    vacuum(p, keep_versions=2)
    assert [h["version"] for h in history(p)] == [3, 4]
    assert committed_batches(p, "q1") == {2, 3}
    # the sink keeps working on the vacuumed store: new batch commits,
    # retained replays are still deduped
    sink(_df(spark, [("k4", 4)]), 4)
    sink(_df(spark, [("k3", 3)]), 3)     # replay of a retained batch
    assert committed_batches(p, "q1") == {2, 3, 4}
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == ["k0", "k1", "k2", "k3", "k4"]


def test_vacuum_spares_young_unreferenced_files(spark, tmp_path):
    # data is written BEFORE its manifest links — an in-flight commit's
    # files are unreferenced at vacuum time and must survive the grace
    # window; old crash leftovers must not
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    inflight = os.path.join(p, "data", "deadbeef" * 4)
    _df(spark, [("x", 9)]).write.parquet(inflight)
    res = vacuum(p, keep_versions=1, grace_sec=3600)
    assert res["files_deleted"] == 0
    assert any(f.endswith(".parquet") for f in os.listdir(inflight))
    # ...but once past the grace window it is a crash leftover
    old = 1.0
    for f in os.listdir(inflight):
        os.utime(os.path.join(inflight, f), (old, old))
    res = vacuum(p, keep_versions=1, grace_sec=3600)
    assert res["files_deleted"] >= 1
    assert not os.path.isdir(inflight)
    # the committed table is untouched throughout
    assert [r["k"] for r in read_snapshot(spark, p).collect()] == ["a"]


def test_expected_parent_precondition(spark, tmp_path):
    from rainforest_spark.sources.versioned import ConcurrentCommitError
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    # stale precondition: table moved on
    commit_snapshot(_df(spark, [("b", 2)]), p)
    with pytest.raises(ConcurrentCommitError):
        commit_snapshot(_df(spark, [("c", 3)]), p, mode="overwrite",
                        expected_parent=1)
    # matching precondition commits
    v = commit_snapshot(_df(spark, [("c", 3)]), p, mode="overwrite",
                        expected_parent=2)
    assert v == 3


def test_two_writer_race_loud_retry(spark, tmp_path):
    """Two concurrent writer families on ONE store: an exactly-once
    streaming sink replaying batches while plain commits race it.  The
    loud-retry contract: every committed version is a distinct manifest
    (atomic os.link create), no batch lands twice, no append is lost."""
    import threading

    from rainforest_spark.sources.versioned import (
        committed_batches, snapshot_sink,
    )
    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, []), p)    # schema seed
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def stream_writer():
        try:
            barrier.wait(timeout=60)
            sink = snapshot_sink(p, query_key="qr")
            for b in range(3):
                sink(_df(spark, [(f"s{b}", b)]), b)
                sink(_df(spark, [(f"s{b}", b)]), b)   # immediate replay
        except Exception as e:   # pragma: no cover - failure path
            errs.append(e)

    def batch_writer():
        try:
            barrier.wait(timeout=60)
            for i in range(3):
                commit_snapshot(_df(spark, [(f"c{i}", i)]), p,
                                mode="append")
        except Exception as e:   # pragma: no cover - failure path
            errs.append(e)

    ts = [threading.Thread(target=stream_writer),
          threading.Thread(target=batch_writer)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errs, errs
    # every version linked exactly once, contiguous from the seed
    vs = [h["version"] for h in history(p)]
    assert vs == list(range(1, 8)), vs   # 1 seed + 3 stream + 3 batch
    assert committed_batches(p, "qr") == {0, 1, 2}
    rows = sorted(r["k"] for r in read_snapshot(spark, p).collect())
    assert rows == ["c0", "c1", "c2", "s0", "s1", "s2"], rows


def test_concurrent_incremental_refreshes_never_lose_updates(
        spark, tmp_path):
    """The r7 ADVICE lost-update: a refresh losing the version race
    must RE-merge against the winner's state, not overwrite it.  Two
    threads each fold disjoint batches into one rollup; the final
    state must equal the full recompute regardless of interleaving."""
    import threading

    store = str(tmp_path / "agg")
    batches = [[("a", 1)], [("a", 10), ("b", 5)],
               [("b", 2)], [("a", 100), ("c", 7)]]
    errs: list[Exception] = []
    barrier = threading.Barrier(2)

    def worker(mine):
        try:
            barrier.wait(timeout=60)
            for b in mine:
                incremental_agg(spark, store, _df(spark, b), ["k"], SPEC)
        except Exception as e:   # pragma: no cover - failure path
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(batches[:2],)),
          threading.Thread(target=worker, args=(batches[2:],))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert not errs, errs
    got = {r["k"]: (r["n"], float(r["sum_v"])) for r in
           read_agg(spark, store).collect()}
    assert got == {"a": (3, 111.0), "b": (2, 7.0), "c": (1, 7.0)}


def test_replayed_batch_commit_race_folds_once(spark, tmp_path,
                                               monkeypatch):
    """The r8 ADVICE zombie-replay double-fold: two concurrent
    deliveries of the SAME tagged batch (a zombie driver racing its
    restarted query) both pass the sink's committed-batches pre-check;
    the loser's conflict retry must detect the winner's tag in the log
    and no-op — NOT re-merge the batch a second time.

    Deterministic race: intercept the loser's first commit and have a
    'zombie twin' commit the identical tagged fold just before it, so
    the loser always loses exactly once."""
    import rainforest_spark.sources.incremental as inc
    from rainforest_spark.sources.versioned import (
        commit_snapshot as real_commit,
    )

    store = str(tmp_path / "agg")
    incremental_agg(spark, store, _df(spark, [("a", 1)]), ["k"], SPEC,
                    stream_tag={"query": "q", "batch_id": 0})
    tag = {"query": "q", "batch_id": 7}
    batch = [("a", 5), ("b", 3)]
    raced = {"n": 0}

    def racing_commit(df, path, mode="append", expected_parent=None,
                      stream_tag=None):
        if stream_tag == tag and raced["n"] == 0:
            raced["n"] += 1
            old = read_agg(spark, path)
            twin = inc._combine(
                old, inc._partials(_df(spark, batch), ["k"], SPEC),
                ["k"], SPEC)
            real_commit(twin, path, mode="overwrite",
                        expected_parent=expected_parent,
                        stream_tag=stream_tag)
            # fall through: the loser's own commit now conflicts
        return real_commit(df, path, mode=mode,
                           expected_parent=expected_parent,
                           stream_tag=stream_tag)

    monkeypatch.setattr(inc, "commit_snapshot", racing_commit)
    v = incremental_agg(spark, store, _df(spark, batch), ["k"], SPEC,
                        stream_tag=tag)
    assert raced["n"] == 1
    assert v == latest_version(store) == 2   # winner's commit only
    got = {r["k"]: (r["n"], float(r["sum_v"])) for r in
           read_agg(spark, store).collect()}
    assert got == {"a": (2, 6.0), "b": (1, 3.0)}   # folded ONCE


def test_incremental_sink_stream_equals_batch(spark, tmp_path):
    """Streaming rollup maintenance: an availableNow stream folded
    through incremental_sink must equal the one-shot full recompute,
    and a replayed batch must be a no-op (exactly-once)."""
    import pandas as pd

    from rainforest_spark.sources.incremental import incremental_sink

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows0 = [("a", 1), ("b", 2), ("a", 3)]
    rows1 = [("b", 4), ("c", 5)]
    pd.DataFrame(rows0, columns=["k", "v"]).to_parquet(
        f"{src}/f0.parquet", index=False)
    pd.DataFrame(rows1, columns=["k", "v"]).to_parquet(
        f"{src}/f1.parquet", index=False)
    store = str(tmp_path / "agg")
    sink = incremental_sink(store, ["k"], SPEC, "roll")
    stream = spark.readStream.schema("k string, v long") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["k"]: (r["n"], float(r["sum_v"]), r["min_v"], r["max_v"])
           for r in read_agg(spark, store).collect()}
    assert got == {"a": (2, 4.0, 1, 3), "b": (2, 6.0, 2, 4),
                   "c": (1, 5.0, 5, 5)}
    v_before = latest_version(store)
    # replayed batch ids are no-ops — state and version unchanged
    sink(_df(spark, [("a", 999)]), 0)
    sink(_df(spark, [("z", 999)]), 1)
    assert latest_version(store) == v_before
    got2 = {r["k"]: r["n"] for r in read_agg(spark, store).collect()}
    assert got2 == {"a": 2, "b": 2, "c": 1}
    # a NEW batch id still folds
    sink(_df(spark, [("a", 10)]), 2)
    got3 = {r["k"]: (r["n"], float(r["sum_v"])) for r in
            read_agg(spark, store).collect()}
    assert got3["a"] == (3, 14.0)


def test_replayed_committed_batch_direct_call_is_noop(spark, tmp_path):
    """Replay safety by construction (r9 ADVICE): a DIRECT
    incremental_agg call with a stream_tag whose batch_id is already
    in the committed log must no-op WITHOUT needing a concurrent race
    to surface it — the guard lives in the function that owns the
    tag, not only in the sinks' pre-checks."""
    store = str(tmp_path / "agg")
    tag = {"query": "q", "batch_id": 3}
    v1 = incremental_agg(spark, store, _df(spark, [("a", 1), ("b", 2)]),
                         ["k"], SPEC, stream_tag=tag)
    # replayed delivery of the SAME tagged batch: no new version, no
    # double fold
    v2 = incremental_agg(spark, store, _df(spark, [("a", 1), ("b", 2)]),
                         ["k"], SPEC, stream_tag=tag)
    assert v2 == v1
    got = {r["k"]: (r["n"], float(r["sum_v"])) for r in
           read_agg(spark, store).collect()}
    assert got == {"a": (1, 1.0), "b": (1, 2.0)}


def test_incremental_agg_randomized_replay_storm(spark, tmp_path):
    """Seeded stress for the exactly-once fold — the class of surface
    the r8/r9 latent bugs lived in: a random interleaving of fresh
    tagged batches, immediate AND delayed replays (zombie deliveries of
    long-committed batches), and untagged manual refreshes must leave
    the maintained rollup EXACTLY equal to the one-shot fold of the
    unique batches + refreshes.  Deterministic (fixed seed), so a
    failure replays."""
    rng = random.Random(20260816)
    store = str(tmp_path / "agg")
    unique: list[list] = []      # every distinct tagged batch, once
    refreshes: list[list] = []   # untagged manual refreshes
    committed: list[int] = []    # batch ids already folded

    def rand_rows():
        return [(f"k{rng.randrange(6)}", rng.randrange(-50, 50))
                for _ in range(rng.randrange(1, 5))]

    next_id = 0
    for _ in range(30):
        op = rng.random()
        if op < 0.5 or not committed:
            rows = rand_rows()
            incremental_agg(spark, store, _df(spark, rows), ["k"],
                            SPEC, stream_tag={"query": "storm",
                                              "batch_id": next_id})
            unique.append(rows)
            committed.append(next_id)
            next_id += 1
        elif op < 0.85:
            # zombie replay of a random long-committed batch — the
            # rows ship again but must fold ZERO times
            bid = rng.choice(committed)
            incremental_agg(spark, store, _df(spark, unique[bid]),
                            ["k"], SPEC,
                            stream_tag={"query": "storm",
                                        "batch_id": bid})
        else:
            rows = rand_rows()
            incremental_agg(spark, store, _df(spark, rows), ["k"],
                            SPEC)     # untagged manual refresh
            refreshes.append(rows)

    all_rows = [r for b in unique + refreshes for r in b]
    expect = {r["k"]: (r["n"], float(r["sum_v"])) for r in
              _df(spark, all_rows).groupBy("k")
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.sum(F.col("v").cast("decimal(18,4)"))
                   .cast("double").alias("sum_v")).collect()}
    got = {r["k"]: (r["n"], float(r["sum_v"])) for r in
           read_agg(spark, store).collect()}
    assert got == expect


def test_committed_batches_tag_index_incremental(spark, tmp_path,
                                                 monkeypatch):
    """The stream-tag index (r12): committed_batches must not re-read
    the whole log on every micro-batch — O(B²) manifest parses over a
    B-batch stream, each O(files) since append manifests carry the
    full file list.  Only manifests newer than the last scan are read;
    tags survive vacuum; a concurrent writer's new version is picked
    up by the catch-up scan; a same-batch re-check costs ZERO reads."""
    import rainforest_spark.sources.versioned as V

    p = str(tmp_path / "t")
    for b in range(6):
        V.commit_tagged_once(_df(spark, [(f"r{b}", b)]), p, "q1", b)
    reads = {"n": 0}
    real = V._read_manifest

    def counting(path, version):
        reads["n"] += 1
        return real(path, version)

    monkeypatch.setattr(V, "_read_manifest", counting)
    # warm scan from a fresh process state
    V._TAG_CACHE.pop(p, None)
    assert V.committed_batches(p, "q1") == set(range(6))
    warm = reads["n"]
    assert warm == 6
    # re-check: zero manifest reads
    assert V.committed_batches(p, "q1") == set(range(6))
    assert reads["n"] == warm
    # a new commit (concurrent-writer shape): exactly ONE extra read
    monkeypatch.setattr(V, "_read_manifest", real)
    V.commit_tagged_once(_df(spark, [("x", 9)]), p, "q2", 0)
    monkeypatch.setattr(V, "_read_manifest", counting)
    assert V.committed_batches(p, "q2") == {0}
    assert reads["n"] == warm + 1
    assert V.committed_batches(p, "q1") == set(range(6))
    assert reads["n"] == warm + 1
    # vacuum drops old manifests; the index evicts their tags so the
    # documented surviving-manifests-only semantics hold EXACTLY
    # (process-independent: a fresh process scanning the vacuumed log
    # reads the same answer as the warm index)
    monkeypatch.setattr(V, "_read_manifest", real)
    vacuum(p, keep_versions=2, grace_sec=0)
    assert V.committed_batches(p, "q1") == {5}
    assert V.committed_batches(p, "q2") == {0}
    # exactly-once through the index: replaying a RETAINED batch is a
    # no-op and costs zero manifest reads (all survivors cached;
    # history() reads outside the counter window — it is a reporting
    # helper, not the per-batch hot path)
    h0 = len(history(p))
    monkeypatch.setattr(V, "_read_manifest", counting)
    before = reads["n"]
    V.commit_tagged_once(_df(spark, [("dup", 5)]), p, "q1", 5)
    assert reads["n"] == before
    monkeypatch.setattr(V, "_read_manifest", real)
    assert len(history(p)) == h0


def test_committed_batches_resets_on_rebuilt_store(spark, tmp_path):
    """A store deleted and rebuilt at the same path (NOT a live-sink
    pattern, but tests/tools do it): a log head moving backwards must
    reset the tag index instead of serving stale tags."""
    import shutil

    import rainforest_spark.sources.versioned as V

    p = str(tmp_path / "t")
    for b in range(4):
        V.commit_tagged_once(_df(spark, [(f"r{b}", b)]), p, "q1", b)
    assert V.committed_batches(p, "q1") == set(range(4))
    shutil.rmtree(p)
    V.commit_tagged_once(_df(spark, [("n", 0)]), p, "q1", 7)
    assert V.committed_batches(p, "q1") == {7}


# ----------------------------------- delta manifests (round 13)

def test_append_manifest_bytes_are_o_new_files(spark, tmp_path):
    """The r12 verdict's one remaining super-linear curve: append
    manifests carried the FULL file list — O(F) json per commit,
    O(B·F) log bytes before vacuum.  Delta manifests record only the
    ADDED files: manifest size must stay flat as the table grows."""
    import rainforest_spark.sources.versioned as V

    p = str(tmp_path / "t")
    sizes = []
    for b in range(12):
        V.commit_tagged_once(_df(spark, [(f"r{b}", b)]), p, "q1", b)
        sizes.append(os.path.getsize(V._manifest_path(p, b + 1)))
    # v2..v12 are delta appends over a growing table; their manifests
    # must NOT grow with table size (identical single-file batches)
    assert max(sizes[1:]) - min(sizes[1:]) < 64, sizes
    m = json.load(open(V._manifest_path(p, 12)))
    assert "adds" in m and "files" not in m
    assert len(m["adds"]) >= 1
    # the reconstruction still sees every batch's rows
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == sorted(f"r{b}" for b in range(12))
    # and added_files is O(1): exactly the delta list
    assert V.added_files(p, 12) == m["adds"]


def test_vacuum_materializes_retention_floor(spark, tmp_path):
    """Dropping ancestors must not orphan retained delta manifests:
    vacuum rewrites the oldest retained manifest self-contained
    (identical logical content, stream tag preserved)."""
    import rainforest_spark.sources.versioned as V

    p = str(tmp_path / "t")
    for b in range(6):
        V.commit_tagged_once(_df(spark, [(f"r{b}", b)]), p, "q1", b)
    before = sorted(r["k"] for r in read_snapshot(spark, p).collect())
    vacuum(p, keep_versions=3, grace_sec=0)
    # fresh process state: no warm caches helping the reconstruction
    V._TAG_CACHE.clear()
    V._FILES_CACHE.clear()
    floor = json.load(open(V._manifest_path(p, 4)))
    assert "files" in floor and floor.get("materialized") is True
    assert floor["stream"] == {"query": "q1", "batch_id": 3}
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == before
    assert [h["n_files"] for h in history(p)] == \
        [len(V._files(p, v)) for v in (4, 5, 6)]
    assert V.committed_batches(p, "q1") == {3, 4, 5}
    # appends keep working on the materialized floor
    V.commit_tagged_once(_df(spark, [("r6", 6)]), p, "q1", 6)
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == before + ["r6"]


def test_read_changes_across_materialized_floor(spark, tmp_path):
    import rainforest_spark.sources.versioned as V
    from rainforest_spark.sources.versioned import read_changes

    p = str(tmp_path / "t")
    for b in range(5):
        commit_snapshot(_df(spark, [(f"r{b}", b)]), p)
    vacuum(p, keep_versions=3, grace_sec=0)
    V._FILES_CACHE.clear()
    assert sorted(r["k"] for r in
                  read_changes(spark, p, 3).collect()) == ["r3", "r4"]
    assert sorted(r["k"] for r in
                  read_changes(spark, p, 3, 4).collect()) == ["r3"]


def test_caches_reset_on_rebuilt_store_at_higher_version(spark,
                                                         tmp_path):
    """The r12 ADVICE variant the head-moved-backwards heuristic
    missed: a store deleted and rebuilt at the same path that reaches
    an EQUAL-OR-HIGHER version before the warm process's next call.
    The identity stamp (written at table creation) must reset both
    the tag index and the file-list cache."""
    import shutil

    import rainforest_spark.sources.versioned as V

    p = str(tmp_path / "t")
    for b in range(3):
        V.commit_tagged_once(_df(spark, [(f"old{b}", b)]), p, "q1", b)
    assert V.committed_batches(p, "q1") == {0, 1, 2}    # warm caches
    read_snapshot(spark, p)
    shutil.rmtree(p)
    # rebuild PAST the old head before the warm process looks again
    for b in range(10, 15):
        V.commit_tagged_once(_df(spark, [(f"new{b}", b)]), p, "q1", b)
    assert V.committed_batches(p, "q1") == {10, 11, 12, 13, 14}
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == [f"new{b}" for b in range(10, 15)]


def test_added_files_legacy_full_list_manifest(spark, tmp_path):
    """Pre-r13 stores carry cumulative ``files`` lists; added_files
    must fall back to the full-minus-parent diff on them."""
    import rainforest_spark.sources.versioned as V

    p = str(tmp_path / "t")
    commit_snapshot(_df(spark, [("a", 1)]), p)
    commit_snapshot(_df(spark, [("b", 2)]), p)
    # rewrite v2 as a LEGACY manifest (cumulative files, no adds)
    m2 = json.load(open(V._manifest_path(p, 2)))
    adds = m2.pop("adds")
    m2["files"] = V._files(p, 1) + adds
    with open(V._manifest_path(p, 2), "w") as fh:
        json.dump(m2, fh)
    V._FILES_CACHE.clear()
    assert sorted(V.added_files(p, 2)) == sorted(adds)
    assert sorted(V.added_files(p, 1)) == sorted(V._files(p, 1))
    # a delta append on top of the legacy manifest reconstructs fine
    commit_snapshot(_df(spark, [("c", 3)]), p)
    V._FILES_CACHE.clear()
    assert sorted(r["k"] for r in read_snapshot(spark, p).collect()) \
        == ["a", "b", "c"]
