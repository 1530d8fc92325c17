"""Plan and partition diagnostics: the "is this query scale-shaped?"
instrument users point at their own DataFrames before running them on
a 1000-executor cluster.

No reference analogue; this packages the audits the engine's own
plan-shape tests (tests/test_plan_shapes.py) and PERF ledger run, as a
library surface:

- :func:`partition_stats` — per-partition row-count distribution and
  the skew ratio (max/mean): the number that predicts straggler tasks.
- :func:`shuffle_inventory` — counts of Exchanges, join strategies,
  cross joins and single-partition windows from the compiled physical
  plan, without executing anything.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_stats(df: DataFrame) -> dict:
    """Execute ONE count-per-partition aggregation and summarize the
    row distribution.  ``skew_ratio`` is max/mean over non-empty
    partitions; > ~3 predicts stragglers on a real cluster (salt the
    key — operators/skew.py — or repartition).

    Cost: one pass over ``df`` (a per-partition count, no data
    movement beyond the tiny counts).  ``n_partitions`` reflects the
    PLANNED partitioning; trailing empty partitions are reported
    explicitly (they cost scheduler overhead, not compute).
    """
    n_planned = df.rdd.getNumPartitions()
    counts = [r["n"] for r in
              (df.select(F.spark_partition_id().alias("__p"))
               .groupBy("__p").agg(F.count(F.lit(1)).alias("n"))
               .collect())]
    if not counts:
        return {"n_partitions": n_planned, "n_rows": 0,
                "n_empty": n_planned, "min": 0, "max": 0,
                "mean": 0.0, "skew_ratio": 1.0}
    total = sum(counts)
    mean = total / len(counts)
    return {
        "n_partitions": n_planned,
        "n_rows": total,
        "n_empty": n_planned - len(counts),
        "min": min(counts),
        "max": max(counts),
        "mean": round(mean, 1),
        "skew_ratio": round(max(counts) / mean, 2),
    }


def shuffle_inventory(df: DataFrame) -> dict:
    """Static audit of the compiled physical plan (nothing executes):
    Exchange counts by kind, join strategies, cross joins, and
    single-partition windows — the five shapes that decide whether a
    plan survives a 100x scale-up.

    ``single_partition_windows`` > 0 or ``cartesian_products`` > 0 on
    a fact-table query is the canonical scale bug; a tiny-dim cross
    join (a 1-row total, a GxG matrix) is legitimate — the audit
    counts, the reader judges against the data sizes.
    """
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges_hash": p.count("Exchange hashpartitioning"),
        "exchanges_range": p.count("Exchange rangepartitioning"),
        "exchanges_single": p.count("Exchange SinglePartition"),
        "reused_exchanges": p.count("ReusedExchange"),
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "shuffled_hash_joins": p.count("ShuffledHashJoin"),
        "broadcast_nested_loop_joins": p.count("BroadcastNestedLoopJoin"),
        "cartesian_products": p.count("CartesianProduct"),
        "single_partition_windows": _single_partition_windows(p),
        "scans": len(re.findall(r"Scan parquet|FileScan", p)),
    }


def _single_partition_windows(plan: str) -> int:
    """Count Window operators whose spec has no PARTITION BY — the
    'Moving all data to a single partition' shape."""
    n = 0
    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        # a partitioned spec lists partition columns BEFORE the first
        # ordering direction token; an unpartitioned one starts with
        # the ordering column directly followed by ASC/DESC
        head = spec.split(",")[0].strip()
        if ("ASC" in head or "DESC" in head):
            n += 1
    return n
