"""Engine-side plot-data jobs (reference `common/graphics.py:301`
`qpe_scatterplot`, `:220` `score_plot`, `performance/eval_plot.py:193`
`plotModelMapsSubplots`).

The reference hands matplotlib the RAW (estimate, reference) pairs and
bins them driver-side (hexbin).  These jobs do the data-sized work —
binning, melting, per-station reduction — as DataFrame aggregations, so
the renderer input is bounded by construction (bins² rows, models ×
bounds × scores rows, one row per station) no matter how large the
underlying pair set is.

Exactness policy (workload/__init__.py): bin indexes are
``floor((v - lo) / step)`` on doubles — a single IEEE expression both
engines evaluate identically — and everything downstream of the bin is
integer counting, so the scatter-density job is oracle-pairable
bit-exactly (q125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scatter_density(df: DataFrame, est_col: str, ref_col: str,
                    lo: float = 0.0, hi: float = 100.0,
                    n_bins: int = 60, model_col: str | None = None,
                    log_counts: bool = False) -> DataFrame:
    """2-D histogram of (reference, estimate) pairs — the distributed
    analogue of `graphics.py:301` ``qpe_scatterplot``'s hexbin.

    Returns ``(model?, xbin, ybin, x_lo, y_lo, n)`` — one row per
    non-empty cell (matplotlib's ``mincnt=1``), ``x_lo``/``y_lo`` the
    inclusive lower edge of the cell.  Pairs outside ``[lo, hi)`` on
    either axis are dropped, mirroring the reference's shared axis
    limits (`graphics.py:365` ``xlim/ylim = [0, gmax]``).

    ``log_counts=True`` adds ``log10_n`` (the reference's
    ``bins='log'`` display transform) — computed here so the renderer
    stays arithmetic-free.

    Shape at 100 TB: one groupBy on (≤ n_bins² distinct) cell keys with
    map-side partial counts — the classic full-reduction aggregation;
    output is ≤ n_bins² rows per model regardless of input size.
    """
    if not (hi > lo) or n_bins < 1:
        raise ValueError(f"need hi > lo and n_bins >= 1 "
                         f"(got lo={lo}, hi={hi}, n_bins={n_bins})")
    step = (hi - lo) / n_bins
    keys = ([model_col] if model_col else [])
    x, y = F.col(ref_col), F.col(est_col)
    out = (df.filter((x >= lo) & (x < hi) & (y >= lo) & (y < hi))
           .select(*keys,
                   F.floor((x - F.lit(lo)) / F.lit(step)).alias("xbin"),
                   F.floor((y - F.lit(lo)) / F.lit(step)).alias("ybin"))
           .groupBy(*keys, "xbin", "ybin")
           .agg(F.count(F.lit(1)).alias("n"))
           .withColumn("x_lo", F.round(F.col("xbin") * F.lit(step)
                                       + F.lit(lo), 9))
           .withColumn("y_lo", F.round(F.col("ybin") * F.lit(step)
                                       + F.lit(lo), 9)))
    if log_counts:
        out = out.withColumn("log10_n", F.round(F.log10("n"), 6))
    return out.select(*keys, "xbin", "ybin", "x_lo", "y_lo", "n",
                      *(["log10_n"] if log_counts else []))


def score_panel(scores: DataFrame, score_cols: list[str] | None = None,
                model_col: str = "model",
                bound_col: str = "bound") -> DataFrame:
    """Melt a wide per-(model, bound) score table into the long
    ``(model, bound, score, value)`` form `graphics.py:220`
    ``score_plot`` iterates — one bar per row.

    ``score_cols=None`` melts every non-key numeric column (``N`` is
    kept as a column per panel, like the reference's sample-count
    annotation, not melted).  Works on both `grid/evaluation.evaluate_qpe`
    output (extra ``agg`` key passes through) and
    `ml/intercomparison` score tables.

    Shape at 100 TB: input is already the reduced score table (models ×
    bounds rows); the melt is a map-only ``stack``.
    """
    passthrough = list(dict.fromkeys(
        c for c in (model_col, bound_col, "agg", "fold", "timeagg",
                    "phase", "station", "N", "aggregation", "fraction")
        if c in scores.columns))
    if score_cols is None:
        from pyspark.sql.types import NumericType
        score_cols = [c for c in scores.columns
                      if c not in passthrough
                      and isinstance(scores.schema[c].dataType, NumericType)]
    if not score_cols:
        raise ValueError("score_panel: no numeric score columns to melt "
                         f"(columns: {scores.columns})")
    stack = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in score_cols)
    return scores.selectExpr(
        *passthrough,
        f"stack({len(score_cols)}, {stack}) AS (score, value)")


def fit_metrics_panel(scores: DataFrame, precip_col: str = "precip",
                      bound_col: str = "bound") -> DataFrame:
    """Melt a wide per-(aggregation?, fraction?, precip, bound) fit
    score table — `operators/scores.perfscores` grouped by precip
    phase + intensity bound, the engine-side analogue of the reference's
    CV-scores dict (ml/rf.py:592-607) — into the long
    ``(..., precip, bound, score, value)`` rows `graphics.py:378`
    ``plot_fit_metrics`` iterates (one bar per precip type, one panel
    per (metric, intensity range)).

    Shape at 100 TB: the input is already the reduced score table
    (aggs × fractions × precips × bounds rows); the melt is map-only.
    The precip column comes out under the renderer's generic ``model``
    key (precip types play the bar role here).
    """
    d = scores.withColumnRenamed(precip_col, "model")
    return score_panel(d, model_col="model", bound_col=bound_col)


def crossval_stats_panel(summary: DataFrame) -> DataFrame:
    """Melt `ml/intercomparison.intercomparison_summary`'s wide
    mean/std columns into the long ``(model, timeagg, phase, bound,
    score, mean, std)`` rows `graphics.py:424` ``plot_crossval_stats``
    iterates (grouped bars = score × model, whiskers = ±std across CV
    folds).

    Shape at 100 TB: input is the fold-aggregated score table (models ×
    timeaggs × phases × bounds rows); the melt is a map-only ``stack``.
    """
    meta = [c for c in ("model", "timeagg", "phase", "bound", "station",
                        "N_total") if c in summary.columns]
    pairs = sorted({c[:-5] for c in summary.columns
                    if c.endswith("_mean")
                    and f"{c[:-5]}_std" in summary.columns})
    if not pairs:
        raise ValueError("crossval_stats_panel: no *_mean/*_std column "
                         f"pairs to melt (columns: {summary.columns})")
    stack = ", ".join(
        f"'{s}', CAST(`{s}_mean` AS DOUBLE), CAST(`{s}_std` AS DOUBLE)"
        for s in pairs)
    return summary.selectExpr(
        *meta, f"stack({len(pairs)}, {stack}) AS (score, mean, std)")


def station_score_map(station_scores: DataFrame, coords: DataFrame,
                      score: str, station_col: str = "station",
                      x_col: str = "X", y_col: str = "Y") -> DataFrame:
    """Join per-station scores to station coordinates — the data behind
    `eval_plot.py:193` ``plotModelMapsSubplots`` (one marker per
    station, colored by the score).

    ``station_scores``: e.g. `ml/intercomparison.model_intercomparison`
    with ``station_scores=True`` filtered to one (timeagg, phase,
    bound); ``coords``: the small station dimension (broadcast join).
    Returns ``(model, station, X, Y, value)``.
    """
    pick = (station_scores.filter(F.col(station_col).isNotNull())
            .select("model", station_col,
                    F.col(score).cast("double").alias("value")))
    dim = coords.select(station_col, F.col(x_col).alias("X"),
                        F.col(y_col).alias("Y"))
    return pick.join(F.broadcast(dim), station_col)
