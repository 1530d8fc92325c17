"""Property-based tests (hypothesis) for the operators with the
subtlest semantics: as-of join vs pandas.merge_asof, weighted quantile
vs a numpy reference, sessionization invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ts_lists(draw):
    left = draw(st.lists(st.integers(0, 10_000), min_size=1, max_size=40,
                         unique=True))
    right = draw(st.lists(st.integers(0, 10_000), min_size=1, max_size=40,
                          unique=True))
    return sorted(left), sorted(right)


@st.composite
def asof_case(draw):
    return _ts_lists(draw)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=asof_case())
def test_asof_join_matches_pandas(spark, case):
    from rainforest_spark.operators.joins import asof_join

    lts, rts = case
    left = spark.createDataFrame(
        pd.DataFrame({"k": 1, "ts": lts, "lid": range(len(lts))}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": 1, "ts": rts, "val": [float(t) for t in rts]}))
    got = (asof_join(left, right, ["k"], "ts", ["val"])
           .toPandas().sort_values("lid", ignore_index=True))
    want = pd.merge_asof(
        pd.DataFrame({"k": 1, "ts": lts, "lid": range(len(lts))}),
        pd.DataFrame({"k": 1, "ts": rts, "val": [float(t) for t in rts]}),
        on="ts", by="k", direction="backward")
    assert len(got) == len(want)
    gv = got["val"].to_numpy()
    wv = want["val"].to_numpy()
    both_nan = np.isnan(gv) & np.isnan(wv)
    assert ((gv == wv) | both_nan).all()


@st.composite
def wq_case(draw):
    n = draw(st.integers(3, 60))
    vals = draw(st.lists(st.integers(-50, 50), min_size=n, max_size=n))
    wts = draw(st.lists(st.integers(1, 9), min_size=n, max_size=n))
    q = draw(st.sampled_from([0.16, 0.5, 0.84]))
    return vals, wts, q


def _wq_numpy(vals, wts, q):
    """Smallest x with cumweight(x)/total >= q (step-function quantile)."""
    order = np.argsort(vals, kind="stable")
    v = np.asarray(vals, dtype=float)[order]
    w = np.asarray(wts, dtype=float)[order]
    cw = np.cumsum(w)
    idx = np.searchsorted(cw, q * cw[-1], side="left")
    return float(v[min(idx, len(v) - 1)])


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=wq_case())
def test_weighted_quantile_matches_numpy(spark, case):
    from rainforest_spark.operators.windows import weighted_quantile

    vals, wts, q = case
    df = spark.createDataFrame(
        pd.DataFrame({"g": "a", "x": [float(v) for v in vals],
                      "w": [float(w) for w in wts]}))
    got = weighted_quantile(df, ["g"], "x", "w", q=q).collect()[0]["wq"]
    assert got == _wq_numpy(vals, wts, q)


@st.composite
def session_case(draw):
    return draw(st.lists(st.integers(0, 100_000), min_size=1, max_size=50,
                         unique=True))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ts=session_case())
def test_sessionize_invariants(spark, ts):
    from rainforest_spark.operators.aggregates import sessionize

    gap = 600
    df = spark.createDataFrame(pd.DataFrame({"u": 1, "ts": sorted(ts)}))
    out = (sessionize(df, ["u"], "ts", gap)
           .toPandas().sort_values("ts", ignore_index=True))
    t = out["ts"].to_numpy()
    s = out["session_id"].to_numpy()
    assert s[0] == 0
    jumps = np.diff(t) > gap
    assert (np.diff(s) == jumps.astype(int)).all()


def test_hzt_fallback_chain_gapped_hour(spark):
    """Reference retrieve_hzt_prod semantics: an hour whose lead-0 file
    is missing is filled from the NEWEST older run valid at that hour;
    hours with a lead-0 file always use it."""
    import pandas as pd

    from rainforest_spark.operators.joins import hzt_fallback_chain

    H = 3600
    rows = [
        # hour 0: lead-0 present + stale alternatives → lead-0 wins
        dict(valid_hour=0, run_ts=0, lead_h=0, fid=1),
        dict(valid_hour=0, run_ts=-2 * H, lead_h=2, fid=2),
        # hour 1: NO lead-0 → newest older run (lead 1) wins over lead 3
        dict(valid_hour=H, run_ts=0, lead_h=1, fid=3),
        dict(valid_hour=H, run_ts=-2 * H, lead_h=3, fid=4),
        # hour 2: only a single stale run
        dict(valid_hour=2 * H, run_ts=-H, lead_h=3, fid=5),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = hzt_fallback_chain(df, "valid_hour", "run_ts", "lead_h",
                             ["fid"]).toPandas()
    picked = out.set_index("valid_hour")["fid"].to_dict()
    assert picked == {0: 1, H: 3, 2 * H: 5}
    # every requested hour is covered despite the lead-0 gap
    assert set(picked) == {0, H, 2 * H}


@st.composite
def grouped_cumsum_case(draw):
    n = draw(st.integers(5, 80))
    groups = draw(st.lists(st.sampled_from(["a", "b", "c"]),
                           min_size=n, max_size=n))
    vals = draw(st.lists(st.integers(-20, 20), min_size=n, max_size=n))
    wts = draw(st.lists(st.integers(1, 9), min_size=n, max_size=n))
    return groups, vals, wts


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=grouped_cumsum_case())
def test_grouped_ranged_cumsum_matches_pandas(spark, case):
    """The grouped ranged cumsum (round-6 q34 scale fix: range-partition
    on (group, order) + per-(group, partition) offsets, NO per-group
    window) must equal a per-group sorted cumsum — including duplicate
    order values, where any tie order is valid but the cumsum at the
    LAST row of each tie run (the value the quantile filter keys on) is
    order-independent.  Forced onto many partitions so offsets actually
    engage."""
    from rainforest_spark.operators.windows import ranged_cumsum

    groups, vals, wts = case
    pdf = pd.DataFrame({"g": groups, "x": [float(v) for v in vals],
                        "w": [float(w) for w in wts]})
    out = ranged_cumsum(spark.createDataFrame(pdf), "x", "w", "cw",
                        num_partitions=7, group_cols=["g"],
                        total_col="tw").toPandas()
    # per (group, value): the max cumsum over the tie run equals the
    # pandas groupwise sorted cumsum at the run's end; totals match
    want = pdf.sort_values(["g", "x"], kind="stable")
    want["cw"] = want.groupby("g")["w"].cumsum()
    want_end = want.groupby(["g", "x"], as_index=False).agg(
        cw=("cw", "max"), n=("cw", "size"))
    got_end = out.groupby(["g", "x"], as_index=False).agg(
        cw=("cw", "max"), n=("cw", "size"))
    pd.testing.assert_frame_equal(
        got_end.sort_values(["g", "x"], ignore_index=True),
        want_end.sort_values(["g", "x"], ignore_index=True))
    tot = pdf.groupby("g")["w"].sum().to_dict()
    assert {g: tw for g, tw in out[["g", "tw"]].drop_duplicates()
            .itertuples(index=False)} == tot
