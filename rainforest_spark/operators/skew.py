"""Skew mitigation for joins and aggregations.

AQE's skew-join handling (on by default in session.py) covers sort-merge
joins at runtime; explicit salting is for the cases AQE can't re-plan:
stateful aggregations over hot keys and broadcast-ineligible hot-key
joins.  Pattern: explode the small side ×S, scatter the big side's rows
uniformly over S salt values, join on (key, salt).

A 100 TB example from this engine: the wet-hour window over
(station, hour) is uniform, but a documents-by-domain dedup can have a
single domain holding 10% of the corpus — `salted_aggregate` splits the
hot key into S partial groups and re-merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: list[str],
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the small side replicated ×salt and the big side
    scattered — hot keys spread over ``salt`` tasks."""
    big_s = big.withColumn("__salt",
                           F.pmod(F.monotonically_increasing_id(),
                                  F.lit(salt)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = big_s.join(small_s, on=on + ["__salt"], how=how)
    return out.drop("__salt")


def salted_aggregate(df: DataFrame, group_cols: list[str],
                     agg_exprs: dict[str, str], salt: int = 8) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups on (key, salt) — hot keys split across ``salt``
    partial groups; phase 2 merges partials.  Supported aggs: sum,
    count, min, max (the re-mergeable ones; avg = sum/count composed by
    the caller).
    """
    salted = df.withColumn("__salt",
                           F.pmod(F.monotonically_increasing_id(),
                                  F.lit(salt)).cast("int"))
    phase1 = []
    for col, fn in agg_exprs.items():
        if fn == "count":
            phase1.append(F.count(col).alias(f"__p_{col}"))
        else:
            phase1.append(getattr(F, fn)(col).alias(f"__p_{col}"))
    partial = salted.groupBy(*group_cols, "__salt").agg(*phase1)
    phase2 = []
    for col, fn in agg_exprs.items():
        merge = "sum" if fn in ("count", "sum") else fn
        phase2.append(getattr(F, merge)(f"__p_{col}").alias(f"{col}_{fn}"))
    return partial.groupBy(*group_cols).agg(*phase2)
