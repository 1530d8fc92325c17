"""Cohort-retention rollup goldens: cohort anchoring on the first
event, distinct-week de-duplication, and multi-cohort counting."""

from __future__ import annotations

from datetime import datetime, timedelta

from rainforest_spark.operators.aggregates import retention_cohorts

EPOCH_WEEK = 604_800


def _ev(spark, rows):
    # rows: (user_id, week_index, extra_events_in_week)
    base = datetime(2024, 1, 4)  # mid-week; week index is epoch-based
    data = []
    for u, w, n in rows:
        for i in range(n):
            data.append((u, base + timedelta(weeks=w, hours=i)))
    return spark.createDataFrame(data, "user_id long, ts timestamp")


def _matrix(df):
    base_week = None
    rows = df.collect()
    base_week = min(r["cohort_period"] for r in rows)
    return {(r["cohort_period"] - base_week, r["period_offset"]):
            r["n_users"] for r in rows}


def test_single_cohort_retention_counts(spark):
    # users 1,2 start week 0; user 1 returns weeks 1 and 3 (twice),
    # user 2 never returns.
    d = _ev(spark, [(1, 0, 2), (1, 1, 1), (1, 3, 2), (2, 0, 1)])
    m = _matrix(retention_cohorts(d, "user_id", "ts"))
    assert m[(0, 0)] == 2          # both users active in their cohort week
    assert m[(0, 1)] == 1
    assert m[(0, 3)] == 1
    assert (0, 2) not in m         # nobody active at offset 2


def test_multiple_cohorts_are_independent(spark):
    d = _ev(spark, [(1, 0, 1), (2, 1, 1), (2, 2, 1)])
    m = _matrix(retention_cohorts(d, "user_id", "ts"))
    assert m[(0, 0)] == 1
    assert m[(1, 0)] == 1          # user 2's cohort is week 1
    assert m[(1, 1)] == 1          # ...with offset 1 activity in week 2


def test_multiple_events_one_week_count_once(spark):
    d = _ev(spark, [(9, 0, 5)])
    m = _matrix(retention_cohorts(d, "user_id", "ts"))
    assert m == {(0, 0): 1}


# ---------------------------------------------------- transition matrix

def test_transition_matrix_counts_adjacent_pairs(spark):
    from rainforest_spark.operators.aggregates import transition_matrix
    rows = [
        # user 1: a -> b -> b -> c
        (1, 0, 10, "a"), (1, 1, 11, "b"), (1, 2, 12, "b"), (1, 3, 13, "c"),
        # user 2: a -> b  (no cross-user transition to user 1's events)
        (2, 0, 20, "a"), (2, 5, 21, "b"),
    ]
    d = spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), e, t) for u, s, e, t in rows],
        "user_id long, ts timestamp, event_id long, event_type string")
    out = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_matrix(
               d, "user_id", "ts", "event_type", tie_col="event_id")
           .collect()}
    assert out == {("a", "b"): 2, ("b", "b"): 1, ("b", "c"): 1}


def test_transition_matrix_tie_break_is_deterministic(spark):
    from rainforest_spark.operators.aggregates import transition_matrix
    # two same-timestamp events with DIFFERENT types: event_id decides
    d = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 2, "y"),
         (1, datetime(2024, 1, 1), 1, "x"),
         (1, datetime(2024, 1, 2), 3, "z")],
        "user_id long, ts timestamp, event_id long, event_type string")
    out = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_matrix(
               d, "user_id", "ts", "event_type", tie_col="event_id")
           .collect()}
    assert out == {("x", "y"): 1, ("y", "z"): 1}
