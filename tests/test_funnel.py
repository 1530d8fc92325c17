"""Ordered-funnel aggregation goldens: in-order chains, out-of-order
events, same-timestamp advances, the within_sec cutoff, and users who
never enter the funnel."""

from __future__ import annotations

from datetime import datetime

from rainforest_spark.operators.aggregates import funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string")


STAGES = ["view", "click", "purchase"]


def _by_user(df):
    return {r["user_id"]: r for r in df.collect()}


def test_full_conversion_earliest_chain(spark):
    d = _ev(spark, [
        (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
        (1, 2, "click"),          # a second, earlier click after t1=0
        (1, 20, "purchase"),
    ])
    out = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES))
    r = out[1]
    assert r["stage_reached"] == 3
    assert r["t_entry"].second == 0
    # earliest eligible chain: click@2 (>= view@0), purchase@9 (>= 2)
    assert r["t_convert"].second == 9


def test_out_of_order_events_do_not_count(spark):
    # click before any view: never advances past stage 1
    d = _ev(spark, [(2, 0, "click"), (2, 5, "view"), (2, 3, "purchase")])
    out = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES))
    assert out[2]["stage_reached"] == 1
    assert out[2]["t_entry"].second == 5
    assert out[2]["t_convert"] is None


def test_same_timestamp_advances_in_stage_order(spark):
    d = _ev(spark, [(3, 4, "view"), (3, 4, "click"), (3, 4, "purchase")])
    out = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES))
    assert out[3]["stage_reached"] == 3
    assert out[3]["t_convert"].second == 4


def test_no_entry_user_excluded(spark):
    d = _ev(spark, [(4, 0, "click"), (4, 1, "purchase"),
                    (5, 0, "view")])
    out = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES))
    assert 4 not in out
    assert out[5]["stage_reached"] == 1


def test_within_sec_cutoff(spark):
    # chain completes at +30s: inside within=30, outside within=10
    d = _ev(spark, [(6, 0, "view"), (6, 10, "click"), (6, 30, "purchase")])
    wide = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES,
                           within_sec=30))
    tight = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES,
                            within_sec=10))
    assert wide[6]["stage_reached"] == 3
    assert tight[6]["stage_reached"] == 2
    assert tight[6]["t_convert"] is None


def test_within_sec_skips_early_takes_later(spark):
    # purchase@40 violates within=15 of t1=0, but NOTHING later helps;
    # purchase@12 is fine.  Order of candidates must not matter.
    d = _ev(spark, [(7, 0, "view"), (7, 5, "click"),
                    (7, 12, "purchase"), (7, 40, "purchase")])
    out = _by_user(funnel(d, "user_id", "ts", "event_type", STAGES,
                          within_sec=15))
    assert out[7]["stage_reached"] == 3
    assert out[7]["t_convert"].second == 12
