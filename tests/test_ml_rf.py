"""ML layer: RF learns a known relationship; bias correction is a
quantile-quantile fit; event folds partition by session (statistical
equivalence testing per SURVEY §7 Phase 3 — scores, not trees)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

FEATURES = ["zh", "hag", "visib"]


@pytest.fixture(scope="module")
def learnable(spark):
    """Synthetic dataset with a known target = f(features) + noise."""
    rng = np.random.RandomState(7)
    n = 4000
    ts = 1717200000 + rng.randint(0, 100, n) * 600  # ~17 h spread
    # three well-separated events (>12 h gaps between clusters)
    ts = ts + rng.choice([0, 3 * 86400, 6 * 86400], n)
    zh = rng.uniform(0, 55, n)
    hag = rng.uniform(0, 3000, n)
    visib = rng.uniform(20, 100, n)
    target = (3.0 * (zh / 316.0) ** (1 / 1.5) * (visib / 100.0)
              + 0.00002 * hag + rng.normal(0, 0.05, n))
    pdf = pd.DataFrame({"TIMESTAMP": ts.astype("int64"), "zh": zh,
                        "hag": hag, "visib": visib,
                        "target_mmh": np.maximum(target, 0)})
    return spark.createDataFrame(pdf)


def test_rf_learns(spark, learnable):
    from rainforest_spark.ml.rf import RandomForestQPE

    model = RandomForestQPE(FEATURES, num_trees=15, max_depth=12).fit(learnable)
    scored = model.transform(learnable)
    rmse = float(scored.agg(F.sqrt(F.avg(
        F.pow(F.col("prediction_bc") - F.col("target_mmh"), 2)))).first()[0])
    std = float(learnable.agg(F.stddev("target_mmh")).first()[0])
    assert rmse < 0.5 * std, f"RF did not learn: rmse={rmse}, std={std}"
    fi = model.feature_importances()
    assert abs(sum(fi.values()) - 1.0) < 1e-6
    assert fi["zh"] == max(fi.values())  # zh dominates the signal


def test_bias_correction_quantile_match():
    from rainforest_spark.ml.rf import BiasCorrection

    rng = np.random.RandomState(0)
    obs = rng.gamma(2.0, 1.0, 2000)
    pred = obs * 0.5  # systematic underestimation
    bc = BiasCorrection.fit(pred, obs, degree=1)
    assert abs(bc.coefs[0] - 2.0) < 0.05  # recovers the 2x correction


def test_event_folds(spark, learnable):
    from rainforest_spark.ml.rf import split_events

    folded = split_events(learnable, k=3).toPandas()
    # every timestamp maps to exactly one (event, fold)
    per_ts = folded.groupby("TIMESTAMP")[["event_id", "fold"]].nunique()
    assert (per_ts == 1).all().all()
    # the three 3-day-separated clusters → ≥3 events
    assert folded["event_id"].nunique() >= 3
    assert set(folded["fold"].unique()) <= {0, 1, 2}


def test_event_cv_runs(spark, learnable):
    from rainforest_spark.ml.rf import event_cross_validation

    res = event_cross_validation(learnable, FEATURES, k=3, num_trees=5,
                                 max_depth=8)
    assert len(res) >= 2
    for r in res:
        assert r["rmse"] > 0 and r["n"] > 0


def test_permutation_importance_stable_ranking(spark, learnable):
    """Reference ml/rf.py:632-843 compares permutation importances; the
    partition-local permutation must give the same feature RANKING for
    any permutation seed (the statistic is seed-robust even though the
    permutations differ)."""
    from rainforest_spark.ml.rf import RandomForestQPE, permutation_importance

    model = RandomForestQPE(FEATURES, num_trees=10, max_depth=10).fit(
        learnable)
    rankings = []
    for seed in (1, 42, 1234):
        imp = permutation_importance(learnable, model, FEATURES,
                                     "target_mmh", seed=seed)
        rankings.append(sorted(FEATURES, key=lambda f: -imp[f]))
        # zh dominates the synthetic signal by construction
        assert rankings[-1][0] == "zh"
    assert rankings[0] == rankings[1] == rankings[2]


@pytest.fixture(scope="module")
def comparable(spark):
    """learnable + an 'RZC' reference-product column that is a NOISIER
    estimate of the target than what the RF can learn, + temperature."""
    rng = np.random.RandomState(11)
    n = 4000
    ts = 1717200000 + rng.randint(0, 100, n) * 600
    ts = ts + rng.choice([0, 3 * 86400, 6 * 86400], n)
    zh = rng.uniform(0, 55, n)
    hag = rng.uniform(0, 3000, n)
    visib = rng.uniform(20, 100, n)
    target = np.maximum(
        3.0 * (zh / 316.0) ** (1 / 1.5) * (visib / 100.0)
        + 0.00002 * hag + rng.normal(0, 0.05, n), 0)
    rzc = np.maximum(target * rng.uniform(0.3, 1.9, n)
                     + rng.normal(0, 0.6, n), 0)
    pdf = pd.DataFrame({
        "STATION": np.char.add("S", (ts % 7).astype(str)),
        "TIMESTAMP": ts.astype("int64"), "zh": zh, "hag": hag,
        "visib": visib, "target_mmh": target, "RZC": rzc,
        "temp": rng.uniform(-5, 15, n)})
    return spark.createDataFrame(pdf)


def test_model_intercomparison_rf_beats_reference(spark, comparable):
    """BASELINE.md §2 criterion through the harness: the trained RF's
    cross-validated RMSE must be <= the reference product's (relative
    ordering, not absolute numbers) — the reference paper's headline
    claim, reproduced from the harness's own tidy output."""
    from rainforest_spark.ml.intercomparison import (
        intercomparison_summary, model_intercomparison,
    )

    scores = model_intercomparison(
        comparable,
        {"RF_full": {"features": FEATURES, "num_trees": 8,
                     "max_depth": 10},
         "RF_zh_only": {"features": ["zh"], "num_trees": 8,
                        "max_depth": 10}},
        reference_products=["RZC"], k=3, temp_col="temp").cache()

    # tidy shape: every (model, fold, timeagg, phase) has an 'all' row
    models = {r.model for r in scores.select("model").distinct().collect()}
    assert models == {"RF_full", "RF_zh_only", "RZC"}
    assert {r.timeagg for r in
            scores.select("timeagg").distinct().collect()} \
        == {"10min", "60min"}
    assert {r.phase for r in scores.select("phase").distinct().collect()} \
        == {"all", "solid", "liquid"}

    summ = {r.model: r.RMSE_mean
            for r in intercomparison_summary(scores).filter(
                (F.col("timeagg") == "10min") & (F.col("phase") == "all")
                & (F.col("bound") == "all")).collect()}
    assert summ["RF_full"] <= summ["RZC"], summ
    # more features help: the dual-feature config beats zh-only
    assert summ["RF_full"] <= summ["RF_zh_only"] + 0.05, summ
    scores.unpersist()


def test_intercompare_cli(spark, tmp_path, capsys):
    import json as _json

    from rainforest_spark.cli import main

    rng = np.random.RandomState(3)
    n = 800
    ts = 1717200000 + rng.randint(0, 60, n) * 600
    ts = ts + rng.choice([0, 3 * 86400], n)
    zh = rng.uniform(0, 55, n)
    target = np.maximum(zh / 20.0 + rng.normal(0, 0.05, n), 0)
    rzc = np.maximum(target + rng.normal(0, 0.8, n), 0)
    pd.DataFrame({"TIMESTAMP": ts.astype("int64"), "zh": zh,
                  "target_mmh": target, "RZC": rzc}).to_parquet(
        tmp_path / "prep.parquet")
    cfgp = tmp_path / "models.json"
    cfgp.write_text(_json.dumps(
        {"RF": {"features": ["zh"], "num_trees": 5, "max_depth": 8}}))
    out = str(tmp_path / "scores")
    assert main(["intercompare", str(tmp_path / "prep.parquet"),
                 str(cfgp), "-o", out,
                 "--reference-products", "RZC", "-k", "2"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(res["rmse_10min_all"]) == {"RF", "RZC"}
    assert res["rmse_10min_all"]["RF"] <= res["rmse_10min_all"]["RZC"]
    saved = spark.read.parquet(out)
    assert saved.filter("bound = 'all'").count() > 0


def test_quality_classifier_separates(spark):
    """The trainable quality gate must separate clean prose from
    digit/punct-heavy junk it was seeded on, score unseen docs
    sensibly, and keep scoring map-only (no Exchange in the plan)."""
    import random

    from rainforest_spark.ml.quality import QualityClassifier, quality_filter

    rng = random.Random(7)
    words = ["the", "model", "reads", "clean", "text", "with", "normal",
             "structure", "and", "plain", "words", "of", "varied",
             "length", "sentences"]
    good = [(i, " ".join(rng.choices(words, k=30)), 1)
            for i in range(120)]
    junk = [(1000 + i,
             " ".join("".join(rng.choices("0123456789$#@!%", k=9))
                      for _ in range(30)), 0)
            for i in range(120)]
    d = spark.createDataFrame(good + junk,
                              "doc_id long, text string, label int")
    train = d.filter("doc_id % 3 != 0")
    test = d.filter("doc_id % 3 = 0")
    clf = QualityClassifier().fit(train)
    scored = clf.transform(test)
    rows = scored.join(d.select("doc_id", "label"), "doc_id").collect()
    good_p = [r.quality_prob for r in rows if r.label == 1]
    junk_p = [r.quality_prob for r in rows if r.label == 0]
    assert min(good_p) > max(junk_p), "classifier failed to separate"
    kept = quality_filter(test.select("doc_id", "text"), clf, 0.5)
    assert kept.count() == len(good_p)
    assert "quality_prob" in kept.columns
    # scoring is map-only: no shuffle in the transform plan
    p = clf.transform(test.select("doc_id", "text"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in p


def test_intercomparison_station_scores(spark, comparable):
    """station_scores=True adds per-station 'all'-phase rows
    (reference ml/rf.py:1169+); nationwide rows carry NULL station."""
    from rainforest_spark.ml.intercomparison import model_intercomparison

    scores = model_intercomparison(
        comparable, {"RF": {"features": FEATURES, "num_trees": 5,
                            "max_depth": 8}},
        reference_products=["RZC"], k=2, station_scores=True).cache()
    nat = scores.filter("station IS NULL")
    per = scores.filter("station IS NOT NULL")
    assert nat.count() > 0 and per.count() > 0
    assert {r.phase for r in per.select("phase").distinct().collect()} \
        == {"all"}
    # every station that appears got scored for both models
    st_models = {(r.station, r.model) for r in
                 per.select("station", "model").distinct().collect()}
    stations = {s for s, _ in st_models}
    assert all((s, m) in st_models for s in stations
               for m in ("RF", "RZC"))
    scores.unpersist()
