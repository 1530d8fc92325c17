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
    assert line["rc"] == 0 and line["n_queries"] == len(times)
    assert line["value"] == 6.0
    assert set(line["tiers"]) == {"sf0.1", "sf1", "sf10"}
    assert line["tiers"]["sf10"]["worst_vs_baseline"] == [["q_a", 1.0]]
    # the full per-query map lives in the PRECEDING stdout line; the
    # tail-capture record must not carry it
    assert "queries" not in line
    import json
    assert len(json.dumps(line)) < 1900     # fits the 2000-byte tail


def test_summary_line_fits_tail_capture_at_real_scale():
    """r10 ADVICE: the tail-capture bound must be exercised at the
    size of the REAL record — ~120 realistically-named per-query times
    at three tiers, populated 4-tier stream state, and a worst-case
    adjudication block — not a 3-query toy.  The driver captures the
    LAST 2000 BYTES of stdout (see any BENCH_r*.json "tail"), so the
    compact line must stay under ~1.9 KB at that scale or "parsed"
    goes null again."""
    import json

    names = [f"q{i:03d}_realistically_named_workload_entry_{i}"
             for i in range(115)] + [
        "s01_rt_tenmin", "s02_curation_gate", "s03_hll_sink",
        "s04_session_rollup", "s05_gated_curation",
        "s06_kmv_novelty_loop"]
    times = {n: round(0.217 + (i % 37) * 0.931, 3)
             for i, n in enumerate(names)}
    sf1 = {n: round(1.217 + (i % 23) * 2.931, 3)
           for i, n in enumerate(names)}
    sf10 = {n: round(3.417 + (i % 11) * 9.131, 3)
            for i, n in enumerate(names[:40])}
    base = {"sf0.1": dict(times), "sf1": dict(sf1), "sf10": dict(sf10)}
    saved = dict(BENCH._STREAM_STATE)
    BENCH._STREAM_STATE.update({
        "s01:sf10": {"state_rows": 6, "batches": 30},
        "s02:sf10": {"state_rows": 499200, "batches": 2},
        "s04:sf10": {"state_rows": 32000, "batches": 5},
        "s05:sf10": {"state_rows": 0, "bloom_bits_rows": 1878433,
                     "m_bits": 4194304, "n_slabs": 2, "batches": 2},
        "s06:sf10": {"state_rows": 0, "sketch_rows": 5120,
                     "reports": 2, "batches": 2}})
    try:
        adjudication = [
            {"kind": "per_query", "tier": "sf10", "query": n,
             "tripped_sec": 11.36, "canary_sec": 9.67,
             "measured": 11.36, "baseline": 4.654,
             "loadavg_at_trip": [12.2, 8.0, 4.0],
             "loadavg_at_canary": [0.03, 1.2, 2.0],
             "verdict": "environmental"}
            for n in names[:8]]
        failures = [{"kind": "per_query", "tier": "sf10", "query": n,
                     "msg": (f"sf10 {n}: 11.36s vs baseline 4.654s "
                             f"(2.44x > 1.5x), reproduced by canary")}
                    for n in names[:2]]
        line = BENCH._summary_line(times, sf1, sf10, base, "0.1", 1,
                                   adjudication, failures)
        assert line["n_queries"] == len(times)
        assert line["n_adjudications"] == 8
        assert len(line["adjudication"]) <= 6     # capped, count kept
        assert line["stream_state"]["s05:sf10"] == [
            0, 2, 1878433, 4194304, 2]
        assert line["stream_state"]["s06:sf10"] == [0, 2, 5120]
        assert len(json.dumps(line)) < 1900, (
            f"summary line is {len(json.dumps(line))} bytes at "
            f"realistic scale — the driver tail-captures 2000 bytes, "
            f"so this record would come back 'parsed: null'")
    finally:
        BENCH._STREAM_STATE.clear()
        BENCH._STREAM_STATE.update(saved)


def test_baseline_guard_skipped_off_baseline_cpus():
    # the committed baseline is a local[BASELINE_CPUS] artifact: at any
    # other core count _guard_baseline must return {} (no regression /
    # uniform-drift guards, hence no canary storm — the r13 8-core
    # scaling run timed out re-running dozens of tripped canaries),
    # while at BASELINE_CPUS it passes the baseline through untouched
    b = _base()
    assert BENCH._guard_baseline(b, BENCH.BASELINE_CPUS) is b
    assert BENCH._guard_baseline(b, 8) == {}
    assert BENCH._guard_baseline(b, 16) == {}
    # physics guards are same-run ratios and stay active regardless of
    # the baseline dict: a superlinear tier entry must still trip with
    # an empty baseline
    fails = BENCH.evaluate_guards(
        {"q_a": 0.1}, {"q_a": 8.0}, {}, BENCH._guard_baseline(b, 8))
    assert [f["kind"] for f in fails] == ["physics"]
