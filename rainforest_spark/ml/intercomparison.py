"""Multi-model intercomparison harness: K-fold event CV over SEVERAL
RF configurations plus operational reference products, emitting one
tidy score table — the paper's headline experiment.

Reference: rainforest/ml/rf.py:846-1331 (``model_intercomparison``)
with ml/intercomparison_config_example.yml; score semantics from
common/utils.py:76-137 (perfscores, double-conditional) and the
solid/liquid split at THRESHOLD_SOLID = 2 °C
(common/constants.py:41).

Spark-first deltas:

- The reference loads the full tables into pandas and loops models ×
  folds in one process.  Here every per-fold fit is a distributed
  MLlib training job and every score is one aggregation pass; only the
  tiny per-(model, fold, bound) score rows ever reach the driver.
- Fold assignment is the deterministic event hash of
  :func:`rainforest_spark.ml.rf.split_events` (reference uses RNG).
- Per-bound scores come from ONE grouped aggregation with a bound
  label column, not one filtered pass per range.

Shape at 100 TB: ``k × len(models)`` driver-coordinated MLlib fits
(each distributed over the cluster; the driver holds only model
metadata), plus one scoring aggregation per (fold, model) — the score
table itself is O(models × folds × bounds) rows, never data-sized.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Below 2 °C precipitation is considered solid (reference
#: common/constants.py:41).
THRESHOLD_SOLID = 2.0


@dataclass
class ModelSpec:
    """One RF configuration under comparison (the per-model block of
    intercomparison_config_example.yml: features + regressor params +
    bias-correction degree)."""

    features: list[str]
    num_trees: int = 15
    max_depth: int = 20
    bc_degree: int = 1
    seed: int = 42

    @classmethod
    def from_dict(cls, d: dict) -> "ModelSpec":
        return cls(features=list(d["features"]),
                   num_trees=int(d.get("num_trees", 15)),
                   max_depth=int(d.get("max_depth", 20)),
                   bc_degree=int(d.get("bc_degree", 1)),
                   seed=int(d.get("seed", 42)))


def _bound_label(ref_col: str, bounds: tuple[float, ...]):
    lab = None
    for lo, hi in zip(bounds, bounds[1:]):
        name = f"{lo:g}-{hi:g}"
        cond = (F.col(ref_col) >= lo) & (F.col(ref_col) < hi)
        lab = F.when(cond, name) if lab is None else lab.when(cond, name)
    return lab.otherwise(F.lit(None))


def _score_pass(scored: DataFrame, est_col: str, ref_col: str,
                bounds: tuple[float, ...], min_ref: float,
                extra_groups: list[str]) -> DataFrame:
    """perfscores over 'all' plus every [b_i, b_{i+1}) reference range
    in ONE union of two grouped aggregations."""
    from rainforest_spark.operators.scores import perfscores

    d = scored.withColumn("bound", _bound_label(ref_col, bounds))
    per_bound = perfscores(d.filter(F.col("bound").isNotNull()),
                           est_col, ref_col,
                           group_cols=extra_groups + ["bound"],
                           min_ref=min_ref)
    overall = (perfscores(d, est_col, ref_col, group_cols=extra_groups,
                          min_ref=min_ref)
               .withColumn("bound", F.lit("all")))
    cols = extra_groups + ["bound", "N", "RMSE", "logBias",
                           "est_mean", "ref_mean", "corr_p"]
    return per_bound.select(*cols).unionByName(overall.select(*cols))


def _hourly(df: DataFrame, est_col: str, ref_col: str,
            ts_col: str, station_col: str | None,
            extra_cols: list[str]) -> DataFrame:
    """60-min aggregation: mean estimate and reference per (station,
    hour) — the reference's grp_hourly group mean (ml/rf.py:1083-1093).
    The hour bucket follows the repo's A6 convention: a 10-min slot
    stamped ``ts`` belongs to the hour starting at ``ts - 600``."""
    hour = ((F.col(ts_col) - 600) - (F.col(ts_col) - 600) % 3600)
    keys = ([station_col] if station_col else []) + ["__hr"]
    aggs = [F.avg(est_col).alias(est_col), F.avg(ref_col).alias(ref_col)]
    aggs += [F.avg(c).alias(c) for c in extra_cols]
    return (df.withColumn("__hr", hour).groupBy(*keys).agg(*aggs))


def model_intercomparison(df: DataFrame,
                          models: dict[str, ModelSpec | dict],
                          reference_products: list[str] | None = None,
                          target: str = "target_mmh",
                          ts_col: str = "TIMESTAMP",
                          station_col: str | None = "STATION",
                          temp_col: str | None = None,
                          threshold_solid: float = THRESHOLD_SOLID,
                          bounds: tuple[float, ...] = (0.0, 2.0, 10.0, 100.0),
                          k: int = 5, gap_hours: float = 12.0,
                          seed: int = 42,
                          min_ref: float = 0.1,
                          station_scores: bool = False) -> DataFrame:
    """Run the K-fold event-CV intercomparison; returns ONE tidy score
    DataFrame with columns ``(model, fold, timeagg, phase, bound,
    station, N, RMSE, logBias, est_mean, ref_mean, corr_p)`` —
    ``station`` is NULL on the nationwide rows; ``station_scores=True``
    (reference ml/rf.py:1169-1331) additionally emits per-station rows
    for the 'all' phase at both time aggregations.

    ``models`` maps model name → :class:`ModelSpec` (or its dict form);
    ``reference_products`` are COLUMN NAMES of ``df`` carrying each
    operational product's estimate (RZC, CPC, ...) — they skip training
    and score as-is, exactly like the reference's
    ``model not in reference_products`` branch (ml/rf.py:1110-1131).
    ``temp_col`` (reference TRE200S0) adds solid/liquid phase rows on
    top of 'all'; ``timeagg`` is '10min' and '60min' (hourly means).
    """
    from rainforest_spark.ml.rf import RandomForestQPE, split_events

    specs = {name: (m if isinstance(m, ModelSpec) else
                    ModelSpec.from_dict(m))
             for name, m in models.items()}
    if station_col and station_col not in df.columns:
        station_col = None  # station-less inputs score nationwide only
    products = list(reference_products or [])

    spark = df.sparkSession
    folded = split_events(df, ts_col=ts_col, gap_hours=gap_hours,
                          k=k, seed=seed).cache()
    out_parts: list[DataFrame] = []
    for fold in range(k):
        test = folded.filter(F.col("fold") == fold)
        if test.limit(1).count() == 0:
            continue
        train = folded.filter(F.col("fold") != fold)
        ests: dict[str, DataFrame] = {}
        for name, spec in specs.items():
            model = RandomForestQPE(spec.features, target,
                                    spec.num_trees, spec.max_depth,
                                    spec.seed)
            model.fit(train, bc_degree=spec.bc_degree)
            ests[name] = (model.transform(test)
                          .select(*filter(None, [station_col, ts_col]),
                                  *( [temp_col] if temp_col else [] ),
                                  F.col("prediction_bc").alias("__est"),
                                  F.col(target).alias("__ref")))
        for name in products:
            ests[name] = test.select(
                *filter(None, [station_col, ts_col]),
                *([temp_col] if temp_col else []),
                F.col(name).cast("double").alias("__est"),
                F.col(target).alias("__ref"))
        for name, scored in ests.items():
            views = {"10min": scored,
                     "60min": _hourly(scored, "__est", "__ref", ts_col,
                                      station_col,
                                      [temp_col] if temp_col else [])}
            for timeagg, view in views.items():
                phases = {"all": view}
                if temp_col:
                    phases["liquid"] = view.filter(
                        F.col(temp_col) >= threshold_solid)
                    phases["solid"] = view.filter(
                        F.col(temp_col) < threshold_solid)
                for phase, v in phases.items():
                    rows = _score_pass(v, "__est", "__ref", bounds,
                                       min_ref, [])
                    out_parts.append(rows.select(
                        F.lit(name).alias("model"),
                        F.lit(fold).alias("fold"),
                        F.lit(timeagg).alias("timeagg"),
                        F.lit(phase).alias("phase"),
                        "bound",
                        F.lit(None).cast("string").alias("station"),
                        "N", "RMSE", "logBias",
                        "est_mean", "ref_mean", "corr_p"))
                if station_scores and station_col:
                    rows = _score_pass(view, "__est", "__ref", bounds,
                                       min_ref, [station_col])
                    out_parts.append(rows.select(
                        F.lit(name).alias("model"),
                        F.lit(fold).alias("fold"),
                        F.lit(timeagg).alias("timeagg"),
                        F.lit("all").alias("phase"),
                        "bound",
                        F.col(station_col).cast("string")
                        .alias("station"),
                        "N", "RMSE", "logBias",
                        "est_mean", "ref_mean", "corr_p"))
    folded.unpersist()
    if not out_parts:
        schema = ("model string, fold int, timeagg string, phase string, "
                  "bound string, station string, N long, RMSE double, "
                  "logBias double, est_mean double, ref_mean double, "
                  "corr_p double")
        return spark.createDataFrame([], schema)
    out = out_parts[0]
    for p in out_parts[1:]:
        out = out.unionByName(p)
    return out


def intercomparison_summary(scores: DataFrame) -> DataFrame:
    """Aggregate the tidy per-fold table across folds: mean/std/min/max
    of each score per (model, timeagg, phase, bound) — the reference's
    ``stats`` dict (ml/rf.py:905) as one grouped aggregation."""
    aggs = []
    for m in ("RMSE", "logBias", "corr_p"):
        aggs += [F.avg(m).alias(f"{m}_mean"),
                 F.stddev_samp(m).alias(f"{m}_std"),
                 F.min(m).alias(f"{m}_min"),
                 F.max(m).alias(f"{m}_max")]
    aggs.append(F.sum("N").alias("N_total"))
    keys = ["model", "timeagg", "phase", "bound"]
    if "station" in scores.columns:
        keys.append("station")
    return scores.groupBy(*keys).agg(*aggs)
