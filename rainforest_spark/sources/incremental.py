"""Incremental aggregate maintenance: keep a grouped aggregate table
up to date from APPEND batches without rescanning history.

At 100 TB the difference between "recompute the per-key rollup nightly"
and "fold tonight's batch into yesterday's rollup" is the whole scan:
for ALGEBRAIC aggregates (count, sum, min, max — and anything derived
from them, like mean) the stored partial states combine exactly, so the
maintained table equals the full recompute bit-for-bit (sums ride
DECIMAL, order-free).

The state table lives in the versioned snapshot store
(sources/versioned.py): each refresh is one atomic ``overwrite``
commit, so readers never see a half-merged rollup, concurrent refreshes
conflict loudly instead of silently double-counting, and any past state
is reproducible by version.

Spec format: ``{"out_col": ("count",)}`` / ``("sum"|"sum_long"|"min"|
"max", "value_col")``.  ``sum`` accumulates as DECIMAL(38,6) — exact
and order-independent; ``sum_long`` keeps integer counters as BIGINT
(exact too, for sums that stay under 2^63 — sketch counters, event
tallies), so readers get back the same type the batch-side producer
emits instead of a decimal they must re-cast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rainforest_spark.sources.versioned import (
    ConcurrentCommitError, commit_snapshot, latest_version, read_snapshot,
)

__all__ = ["incremental_agg", "read_agg", "incremental_sink"]

_DEC = "decimal(38,6)"


def _partials(df: DataFrame, keys: list[str], spec: dict) -> DataFrame:
    aggs = []
    for out, s in spec.items():
        kind = s[0]
        if kind == "count":
            aggs.append(F.count(F.lit(1)).cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.col(s[1]).cast(_DEC)).cast(_DEC)
                        .alias(out))
        elif kind == "sum_long":
            aggs.append(F.sum(F.col(s[1]).cast("long")).cast("long")
                        .alias(out))
        elif kind == "min":
            aggs.append(F.min(s[1]).alias(out))
        elif kind == "max":
            aggs.append(F.max(s[1]).alias(out))
        else:
            raise ValueError(f"unsupported aggregate {kind!r} — only "
                             f"algebraic count/sum/min/max combine "
                             f"incrementally (avg = sum/count; distinct "
                             f"counts need a sketch or a full pass)")
    return df.groupBy(*keys).agg(*aggs)


def _combine(old: DataFrame, new: DataFrame, keys: list[str],
             spec: dict) -> DataFrame:
    merged = old.unionByName(new)
    aggs = []
    for out, s in spec.items():
        kind = s[0]
        if kind == "count":
            aggs.append(F.sum(out).cast("long").alias(out))
        elif kind == "sum":
            aggs.append(F.sum(F.col(out)).cast(_DEC).alias(out))
        elif kind == "sum_long":
            aggs.append(F.sum(F.col(out)).cast("long").alias(out))
        elif kind == "min":
            aggs.append(F.min(out).alias(out))
        else:
            aggs.append(F.max(out).alias(out))
    return merged.groupBy(*keys).agg(*aggs)


def incremental_agg(spark: SparkSession, store_path: str,
                    batch: DataFrame, keys: list[str],
                    spec: dict, max_retries: int = 5,
                    stream_tag: dict | None = None) -> int:
    """Fold ``batch`` into the maintained rollup at ``store_path``
    (creating it on first use) and commit the merged state as the next
    snapshot version.  Returns the committed version.

    Shape: ONE map-side-combined groupBy over the batch, one
    state-sized merge groupBy — history is never rescanned.  The
    maintained table is exactly ``_partials(all_batches_unioned)``
    because every aggregate in the spec is algebraic.

    Concurrency: this is a read-modify-write, so the commit carries an
    ``expected_parent`` precondition — a concurrent refresh that
    committed first makes this one's merge stale, and a blind retry
    would overwrite the winner's fold (a silent lost update, dropping
    that batch from the rollup forever).  On conflict the state is
    RE-read at the new parent and the batch re-merged; after
    ``max_retries`` losses it raises, loudly.

    Replay-vs-retry: when ``stream_tag`` is set, losing the race may
    mean the WINNER was a concurrent delivery of this very batch (a
    zombie driver racing its restarted query — the scenario the
    ``(query, batch_id)`` tag exists for).  Retrying the merge then
    would fold the batch twice, silently.  So every conflict first
    re-reads the committed-batch log; if this batch_id is already
    tagged, the fold is a no-op and the current version is returned.
    """
    last_err: Exception | None = None

    def _already_committed() -> int | None:
        if not stream_tag or "batch_id" not in stream_tag:
            return None
        from rainforest_spark.sources.versioned import committed_batches
        done = committed_batches(store_path, stream_tag.get("query"))
        if int(stream_tag["batch_id"]) in done:
            return latest_version(store_path)
        return None

    # Replay safety by construction: ANY tagged caller (not just the
    # sinks, which carry their own pre-check) is a no-op when the
    # batch_id is already in the committed log — a replayed
    # already-committed delivery must never fold twice even without a
    # concurrent race to surface it.
    v0 = _already_committed()
    if v0 is not None:
        return v0

    new = _partials(batch, keys, spec)
    for _ in range(max_retries):
        parent = latest_version(store_path)
        if parent is None:
            merged = new
        else:
            old = read_snapshot(spark, store_path, version=parent)
            merged = _combine(old, new, keys, spec)
        try:
            return commit_snapshot(merged, store_path, mode="overwrite",
                                   expected_parent=parent,
                                   stream_tag=stream_tag)
        except ConcurrentCommitError as e:
            last_err = e   # lost to a concurrent refresh — re-merge
            v = _already_committed()
            if v is not None:   # the winner WAS this batch — no-op
                return v
    raise ConcurrentCommitError(
        f"incremental_agg lost {max_retries} refresh races at "
        f"{store_path}") from last_err


def read_agg(spark: SparkSession, store_path: str,
             version: int | None = None) -> DataFrame:
    """The maintained rollup (optionally time-traveled)."""
    return read_snapshot(spark, store_path, version=version)


def incremental_sink(store_path: str, keys: list[str], spec: dict,
                     query_key: str):
    """An EXACTLY-ONCE ``foreachBatch`` function that maintains the
    rollup at ``store_path`` FROM A STREAM: each micro-batch folds into
    the state via :func:`incremental_agg` and the committed manifest
    carries a ``(query_key, batch_id)`` tag, so a replayed batch
    (restart after a sink failure — Structured Streaming's
    at-least-once contract) is detected in the log and skipped.  The
    streaming analogue of ``versioned.snapshot_sink``, but the version
    written is the MERGED AGGREGATE STATE, not the appended rows —
    "maintain a 100 TB rollup from the feed, never rescan history,
    never double-count a replay".

    Concurrency composes with the round's lost-update fix: the fold
    commits with an expected-parent precondition, so a concurrent
    manual refresh can't be silently overwritten, and a replay that
    finds its tag already in the log is a no-op.  Pair vacuum() with a
    ``keep_versions`` at least as deep as the checkpoint's replayable
    horizon (the snapshot_sink caveat — tags live in manifests).
    """
    def write(batch_df: DataFrame, batch_id: int) -> None:
        from rainforest_spark.sources.versioned import committed_batches
        if int(batch_id) in committed_batches(store_path, query_key):
            return
        incremental_agg(batch_df.sparkSession, store_path, batch_df,
                        keys, spec,
                        stream_tag={"query": query_key,
                                    "batch_id": int(batch_id)})
    return write
