"""The rc=1 canary protocol, mechanized (VERDICT r9 #6): on a guard
trip bench.py itself must check the load average, settle, re-run only
the offenders, and emit a machine-readable adjudication block — so an
rc=1 carries its own evidence.  These tests force trips with synthetic
times/baselines and stub re-runners (no Spark needed): a stall that
clears in the canary is adjudicated ``environmental`` (rc would be 0),
a slowdown that reproduces is ``regression`` (rc stays 1)."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


BENCH = _bench()


def _base(**kw):
    b = {"sf0.1": {"q_a": 1.0, "q_b": 2.0, "q_c": 3.0},
         "sf1": {"q_a": 8.0}, "sf10": {"q_a": 60.0}}
    b.update(kw)
    return b


def test_no_failures_no_adjudication():
    times = {"q_a": 1.0, "q_b": 2.0, "q_c": 3.0}
    adj, rem = BENCH.adjudicate(
        times, {"q_a": 8.0}, {"q_a": 60.0}, _base(),
        rerun=lambda t, n: 0.0, sleep=lambda s: None)
    assert adj == [] and rem == []


def test_forced_trip_stall_adjudicated_environmental():
    # inject a slow query: q_b tripped its per-query guard (1.5x+0.5s)
    # — and, by inflating the total, the uniform-drift guard too, so
    # the canary re-runs q_b plus the drift's worst-ratio set
    times = {"q_a": 1.0, "q_b": 9.0, "q_c": 3.0}
    slept = []
    reran = []

    def rerun(tier, name):
        reran.append((tier, name))
        return {"q_b": 2.1}.get(name, _base()["sf0.1"][name])

    adj, rem = BENCH.adjudicate(
        times, {}, {}, _base(), rerun,
        sleep=slept.append, loadavg=lambda: (6.9, 3.0, 1.0),
        settle=10.0)
    assert slept == [10.0] and ("sf0.1", "q_b") in reran
    assert rem == []                       # rc would be 0
    a = next(x for x in adj if x["query"] == "q_b"
             and x["kind"] == "regression")
    assert a["verdict"] == "environmental"
    assert a["tripped_sec"] == 9.0 and a["canary_sec"] == 2.1
    assert a["loadavg_at_trip"] == [6.9, 3.0, 1.0]
    assert times["q_b"] == 2.1             # min folded back
    assert all(x["verdict"] == "environmental" for x in adj)


def test_forced_trip_reproducing_regression_stays_failed():
    times = {"q_a": 1.0, "q_b": 9.0, "q_c": 3.0}
    adj, rem = BENCH.adjudicate(
        times, {}, {}, _base(),
        rerun=lambda t, n: {"q_b": 8.8}.get(n, _base()["sf0.1"][n]),
        sleep=lambda s: None, loadavg=lambda: (0.1, 0.1, 0.1))
    a = next(x for x in adj if x["query"] == "q_b"
             and x["kind"] == "regression")
    assert a["verdict"] == "regression"
    assert any(f["name"] == "q_b" for f in rem)   # rc stays 1
    assert times["q_b"] == 8.8


def test_uniform_drift_reruns_worst_and_clears():
    # every query 1.3x its baseline: no per-query trip (floor filters
    # the small ones... q_c 3.9 vs 3.0 is +0.9 > 0.5 floor but ratio
    # 1.3 < 1.5), yet the TOTAL guard trips; the canary re-runs the
    # worst-ratio queries and the drift clears
    times = {"q_a": 1.3, "q_b": 2.6, "q_c": 3.9}
    fails = BENCH.evaluate_guards(times, {}, {}, _base())
    assert [f["kind"] for f in fails] == ["uniform_drift"]
    assert fails[0]["worst"]               # carries re-run targets
    adj, rem = BENCH.adjudicate(
        times, {}, {}, _base(),
        rerun=lambda t, n: _base()["sf0.1"][n],
        sleep=lambda s: None, loadavg=lambda: (5.0, 2.0, 1.0))
    assert rem == []
    assert {a["kind"] for a in adj} == {"uniform_drift"}
    assert all(a["verdict"] == "environmental" for a in adj)


def test_physics_trip_structured():
    # sf10 took > 200x-linear of same-run sf0.1
    times = {"q_a": 1.0}
    sf10 = {"q_a": 500.0}
    fails = BENCH.evaluate_guards(times, {}, sf10, _base())
    kinds = {(f["kind"], f["tier"]) for f in fails}
    assert ("physics", "sf10") in kinds
    adj, rem = BENCH.adjudicate(
        times, {}, sf10, _base(), rerun=lambda t, n: 90.0,
        sleep=lambda s: None, loadavg=lambda: (9.0, 4.0, 2.0))
    assert sf10["q_a"] == 90.0
    assert all(a["verdict"] == "environmental" for a in adj
               if a["kind"] == "physics")
    assert not any(f["kind"] == "physics" for f in rem)


def test_summary_line_compact_and_self_contained():
    times = {"q_a": 1.0, "q_b": 2.0, "q_c": 3.0}
    line = BENCH._summary_line(
        times, {"q_a": 8.0}, {"q_a": 60.0}, _base(), "0.1", 0,
        [], [])
    assert line["metric"] == "headline_queries_total_wall"
    assert line["rc"] == 0 and line["queries"] == times
    assert set(line["tiers"]) == {"sf0.1", "sf1", "sf10"}
    assert line["tiers"]["sf10"]["worst_vs_baseline"] == [["q_a", 1.0]]
    import json
    assert len(json.dumps(line)) < 8000     # fits a tail capture
