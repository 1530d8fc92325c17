"""QPE evaluation pipeline golden test (reference qpe/evaluation.py:
54-240): file averaging, the min-files rule, the all-models rule, the
complete-hour rule, and the score math on a hand-checkable fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def fixture_eval(spark):
    H = 600
    rows = []
    # 6 complete slots (one full hour), 2 models, 2 files, 2 stations.
    # file 1 reads one unit higher than file 0 → slot estimate = v + 0.5.
    for si, slot in enumerate(range(0, 6 * H, H)):
        for model, moff in (("A", 0.0), ("B", 2.0)):
            for f in (0, 1):
                for (x, y), soff in (((1, 1), 0.0), ((2, 2), 10.0)):
                    rows.append(dict(
                        model=model, timestep=slot, file_id=f,
                        x_idx=x, y_idx=y,
                        value=1.0 + si * 0.5 + moff + soff + f))
    # slot 3600: model A only → dropped by the all-models rule
    for f in (0, 1):
        rows.append(dict(model="A", timestep=3600, file_id=f,
                         x_idx=1, y_idx=1, value=99.0))
    # slot 4200: single file for both models → dropped by min_files
    for model in ("A", "B"):
        rows.append(dict(model=model, timestep=4200, file_id=0,
                         x_idx=1, y_idx=1, value=77.0))
    grids = spark.createDataFrame(pd.DataFrame(rows))
    lut = spark.createDataFrame(pd.DataFrame(
        {"STATION": ["S1", "S2"], "x_idx": [1, 2], "y_idx": [1, 2]}))
    gauge_rows = [dict(STATION=s, timestep=slot,
                       ref_mmh=1.5 + (slot // 600) * 0.5
                       + (10.0 if s == "S2" else 0.0))
                  for s in ("S1", "S2") for slot in range(0, 8 * 600, 600)]
    gauge = spark.createDataFrame(pd.DataFrame(gauge_rows))
    return grids, gauge, lut


def test_station_series_rules(spark, fixture_eval):
    from rainforest_spark.grid.evaluation import station_series

    grids, gauge, lut = fixture_eval
    est = station_series(grids, lut).toPandas()
    # 2 models x 6 slots x 2 stations; slots 3600/4200 dropped
    assert len(est) == 24
    assert set(est["timestep"]) == set(range(0, 3600, 600))
    # file averaging: slot 0, model A, S1 = mean(1.0, 2.0) = 1.5
    key = est.set_index(["model", "timestep", "STATION"])["est_mmh"]
    assert key[("A", 0, "S1")] == 1.5
    assert key[("B", 0, "S1")] == 3.5          # +2 model offset
    assert key[("A", 0, "S2")] == 11.5         # +10 station offset
    assert key[("A", 3000, "S1")] == pytest.approx(1.5 + 5 * 0.5)


def test_evaluate_qpe_scores(spark, fixture_eval):
    from rainforest_spark.grid.evaluation import evaluate_qpe

    grids, gauge, lut = fixture_eval
    out = evaluate_qpe(grids, gauge, lut).toPandas()
    assert set(out["agg"]) == {"10min", "60min"}
    a10 = out[(out["agg"] == "10min") & (out["bound"] == "all")] \
        .set_index("model")
    # every kept row passes the 0.1 double-conditional
    assert a10.loc["A", "N"] == 12 and a10.loc["B", "N"] == 12
    # model A S1: est = 1.5..4.0, ref = 1.5..4.0 → perfect at S1;
    # overall est_mean_A = mean(1.5+0.25i over slots, both stations)
    est_a = [1.5 + 0.5 * i + off for i in range(6) for off in (0.0, 10.0)]
    ref_a = [1.5 + 0.5 * i + off for i in range(6) for off in (0.0, 10.0)]
    assert a10.loc["A", "est_mean"] == pytest.approx(np.mean(est_a))
    assert a10.loc["A", "RMSE"] == pytest.approx(0.0)    # A == ref exactly
    assert a10.loc["B", "RMSE"] == pytest.approx(2.0)    # constant +2 bias
    assert a10.loc["A", "scatter"] == pytest.approx(0.0)
    # hourly: exactly one complete hour (slots 0..3000) survives
    a60 = out[(out["agg"] == "60min") & (out["bound"] == "all")] \
        .set_index("model")
    assert a60.loc["A", "N"] == 2                        # 2 stations
    assert a60.loc["A", "est_mean"] == pytest.approx(np.mean(ref_a))
    assert a60.loc["B", "logBias"] == pytest.approx(
        10 * np.log10(np.sum(np.array(est_a) + 2.0) / np.sum(ref_a)), abs=1e-6)
