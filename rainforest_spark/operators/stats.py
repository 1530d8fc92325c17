"""Rank statistics and experimentation operators (extension family).

The reference engine stops at verification scores (perfscores,
contingency tables — ``common/utils.py`` / ``performance/``); a
training-data pipeline additionally needs the *comparative* statistics:
does a quality score separate good from bad sources (AUC), did a
curation change shift the length distribution (KS), is a filter's
effect real (chi-square), how do score columns co-move (Spearman), and
which accounts/users matter (RFM).  Everything here follows the
workload exactness policy: ranks are exact BIGINTs from
:func:`~rainforest_spark.operators.windows.ranged_cumsum` (never a
single-partition window), ratio outputs are round-half-up integer
divisions on exact DECIMAL(38,0) cross-multiplies, and the few double
expressions are fixed trees evaluated identically by any IEEE-754
engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rainforest_spark.operators.windows import ranged_cummin, ranged_cumsum

__all__ = [
    "spearman_corr", "rank_auc", "ks_2sample", "ab_contrast",
    "rfm_segments", "last_touch_attribution", "lead_lag_corr",
    "psi_profile", "quantile_normalize", "seasonal_anomaly",
    "linear_attribution", "seasonal_naive_error", "latency_bands",
    "pareto_frontier", "jackknife_mean", "cuped_contrast",
    "proportion_ci", "entropy_profile", "calibration_curve",
    "cohens_kappa", "cumulative_gains", "mutual_information",
]


def _rank(df: DataFrame, value_col: str, tie_col: str,
          out_col: str) -> DataFrame:
    """Exact global BIGINT rank under (value, tie) via ranged_cumsum —
    the q108 vocab-rank idiom (range-partitioned, no global sort into
    one task)."""
    keyed = (df.withColumn("__ord", F.struct(
                 F.col(value_col).alias("v"), F.col(tie_col).alias("i")))
             .withColumn("__one", F.lit(1).cast("long")))
    return ranged_cumsum(keyed, "__ord", "__one",
                         cum_col=out_col).drop("__ord", "__one")


def spearman_corr(df: DataFrame, x_col: str, y_col: str,
                  tie_col: str) -> DataFrame:
    """Global Spearman rank correlation of two columns — EXACT.

    Both rankings are deterministic row_number ranks under
    ``(value, tie)`` (the policy's unique-tie-breaker rule; with
    continuous-ish data this matches the classic statistic, and with
    ties it is still a well-defined, engine-portable quantity).  The
    sufficient statistic ``S = Σ(rank_x − rank_y)²`` accumulates as
    DECIMAL(38,0) (order-free, exact to n ≈ 2·10¹² rows); the closed
    form ``ρ = 1 − 6S/(n(n²−1))`` lands as ONE round-half-up integer
    micro-division plus a final double subtraction.

    Shape at 100 TB: two range-partitioned rank passes over (value,
    tie) struct keys — the second pass CARRIES the first rank column
    through (ranged_cumsum preserves carried columns), so the old
    equi-join of the two rank tables on the tie key is gone (r13:
    one sort-merge join — two exchanges + two sorts — removed for the
    cost of one extra BIGINT in the second rank's shuffle rows); one
    order-free aggregate.  No global window anywhere.

    Returns one row: ``n`` (BIGINT), ``spearman_rho`` (DOUBLE, 6dp).
    """
    base = df.select(F.col(x_col).alias("__x"), F.col(y_col).alias("__y"),
                     F.col(tie_col).alias("__t"))
    rx = _rank(base, "__x", "__t", "__rx")
    j = _rank(rx.select("__y", "__t", "__rx"), "__y", "__t", "__ry")
    d = F.col("__rx") - F.col("__ry")
    # (18,0)x(18,0) -> decimal(37,0): exact product on both engines
    d2 = d.cast("decimal(18,0)") * d.cast("decimal(18,0)")
    agg = j.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(d2.cast("decimal(38,0)")).alias("__s"))
    agg = agg.withColumn(
        "__dn", (F.col("n").cast("decimal(18,0)")
                 * (F.col("n").cast("decimal(18,0)")
                    * F.col("n").cast("decimal(18,0)")
                    - F.lit(1))).cast("decimal(38,0)"))
    micros = F.expr("(12000000 * __s + __dn - pmod(12000000 * __s + __dn,"
                    " 2 * __dn)) div (2 * __dn)")
    return agg.select(
        "n",
        (F.lit(1.0) - micros.cast("double") / F.lit(1e6))
        .alias("spearman_rho"))


def rank_auc(df: DataFrame, score_col: str, label_col: str | Column,
             tie_col: str) -> DataFrame:
    """Mann-Whitney U / ROC-AUC of a score against a binary label —
    the quality-classifier evaluation a curation pipeline runs before
    trusting a filter.  EXACT: combined ranks are deterministic
    BIGINTs under ``(score, tie)``; ``U = R₁ − n₁(n₁+1)/2`` and
    ``AUC = U/(n₁n₀)`` via round-half-up integer micro-division.

    Shape at 100 TB: one range-partitioned rank pass + one order-free
    aggregate.  Returns one row: ``n_pos``, ``n_neg``, ``u_stat``
    (BIGINTs) and ``auc`` (DOUBLE, 6dp).
    """
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(F.col(score_col).alias("__v"),
                     lab.cast("long").alias("__l"),
                     F.col(tie_col).alias("__t"))
    ranked = _rank(base, "__v", "__t", "__r")
    agg = ranked.agg(
        F.sum("__l").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("__l")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__l") == 1, F.col("__r"))
              .otherwise(F.lit(0)).cast("decimal(38,0)")).alias("__rs"))
    u = F.expr("CAST(__rs - (CAST(n_pos AS DECIMAL(18,0))"
               " * (CAST(n_pos AS DECIMAL(18,0)) + 1)) div 2"
               " AS DECIMAL(38,0))")
    agg = agg.withColumn("__u", u).withColumn(
        "__nn", (F.col("n_pos").cast("decimal(18,0)")
                 * F.col("n_neg").cast("decimal(18,0)"))
        .cast("decimal(38,0)"))
    micros = F.expr("(2000000 * __u + __nn - pmod(2000000 * __u + __nn,"
                    " 2 * __nn)) div (2 * __nn)")
    return agg.select(
        "n_pos", "n_neg", F.col("__u").cast("long").alias("u_stat"),
        (micros.cast("double") / F.lit(1e6)).alias("auc"))


def ks_2sample(df: DataFrame, value_col: str, group_col: str | Column,
               ) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic — did a pipeline change
    shift a distribution?  EXACT: collapse to per-distinct-value counts
    first (so ECDFs are evaluated at value boundaries, never inside a
    tie cluster), cumsum BOTH group counts in ONE
    :func:`ranged_cumsum` pass over the value order, and take
    ``D = max |c₁n₀ − c₀n₁| / (n₁n₀)`` with exact BIGINT
    cross-multiplies and a round-half-up micro-division.

    ``group_col`` must be a boolean/0-1 column (group membership).

    Shape at 100 TB: one groupBy on the value (map-side combine; output
    is the distinct-value dim), one range-partitioned cumsum, one
    TakeOrdered(1) for the argmax row — no single-partition window, no
    driver loop.  Returns one row: ``n_a``, ``n_b``, ``ks_d`` (DOUBLE,
    6dp), ``ks_at`` (the smallest value attaining the supremum).
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    per_v = (df.select(F.col(value_col).alias("__v"),
                       g.cast("long").alias("__g"))
             .groupBy("__v")
             .agg(F.sum("__g").cast("long").alias("__ca"),
                  F.sum(F.lit(1) - F.col("__g")).cast("long")
                  .alias("__cb")))
    cum = ranged_cumsum(per_v, "__v", "__ca", cum_col="__fa",
                        extra_weights={"__cb": "__fb"})
    totals = per_v.agg(F.sum("__ca").alias("na"),
                       F.sum("__cb").alias("nb")).collect()[0]
    n_a, n_b = int(totals["na"]), int(totals["nb"])
    diff = F.abs(F.col("__fa") * F.lit(n_b) - F.col("__fb") * F.lit(n_a))
    top = (cum.withColumn("__diff", diff.cast("long"))
           .orderBy(F.col("__diff").desc(), F.col("__v").asc())
           .limit(1))
    micros = F.expr(f"(2000000 * __diff + {n_a}::BIGINT * {n_b}"
                    f" - pmod(2000000 * __diff + {n_a}::BIGINT * {n_b},"
                    f" 2 * {n_a}::BIGINT * {n_b}))"
                    f" div (2 * {n_a}::BIGINT * {n_b})")
    return top.select(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        (micros.cast("double") / F.lit(1e6)).alias("ks_d"),
        F.col("__v").alias("ks_at"))


def ab_contrast(df: DataFrame, unit_col: str, arm_col: str | Column,
                outcome_col: str | Column) -> DataFrame:
    """Two-proportion A/B contrast with EXACT lift and chi-square — the
    "is this filter/change doing anything" gate.  Units (users, docs)
    collapse to one row each with a 0/1 arm and a 0/1 outcome
    (``max`` over their events); the 2×2 counts then give

    - conversion rates and lift by round-half-up integer
      micro-division on exact cross-multiplies, and
    - the chi-square statistic ``N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))``
      as ONE fixed double expression over exactly-converted integers
      (identical IEEE tree on both engines), rounded to 6dp.

    Shape at 100 TB: one unit groupBy (map-side combine) + one global
    aggregate.  Returns one row: ``n_t, conv_t, n_c, conv_c, rate_t,
    rate_c, lift, chi2``.
    """
    arm = F.col(arm_col) if isinstance(arm_col, str) else arm_col
    out = F.col(outcome_col) if isinstance(outcome_col, str) \
        else outcome_col
    per_unit = (df.groupBy(F.col(unit_col).alias("__u"))
                .agg(F.max(arm.cast("long")).alias("__a"),
                     F.max(out.cast("long")).alias("__o")))
    agg = per_unit.agg(
        F.sum("__a").cast("long").alias("n_t"),
        F.sum(F.col("__a") * F.col("__o")).cast("long").alias("conv_t"),
        F.sum(F.lit(1) - F.col("__a")).cast("long").alias("n_c"),
        F.sum((F.lit(1) - F.col("__a")) * F.col("__o")).cast("long")
        .alias("conv_c"))

    def _ratio6(num: str, den: str) -> Column:
        return (F.expr(f"(2000000 * CAST({num} AS DECIMAL(38,0))"
                       f" + CAST({den} AS DECIMAL(38,0))"
                       f" - pmod(2000000 * CAST({num} AS DECIMAL(38,0))"
                       f" + CAST({den} AS DECIMAL(38,0)),"
                       f" 2 * CAST({den} AS DECIMAL(38,0))))"
                       f" div (2 * CAST({den} AS DECIMAL(38,0)))")
                .cast("double") / F.lit(1e6))

    # a=conv_t b=n_t-conv_t c=conv_c d=n_c-conv_c; all exact BIGINTs,
    # converted once to double -> one fixed IEEE expression tree.  A
    # degenerate margin (nobody or everybody converts, or an empty
    # arm) leaves chi2 undefined -> NULL, not a divide-by-zero.
    chi2 = F.expr(
        "CASE WHEN n_t > 0 AND n_c > 0 AND conv_t + conv_c > 0"
        "          AND n_t + n_c - conv_t - conv_c > 0 THEN"
        " ROUND(CAST(n_t + n_c AS DOUBLE)"
        " * CAST(conv_t * (n_c - conv_c) - conv_c * (n_t - conv_t)"
        "        AS DOUBLE)"
        " * CAST(conv_t * (n_c - conv_c) - conv_c * (n_t - conv_t)"
        "        AS DOUBLE)"
        " / (CAST(n_t AS DOUBLE) * CAST(n_c AS DOUBLE)"
        "    * CAST(conv_t + conv_c AS DOUBLE)"
        "    * CAST(n_t + n_c - conv_t - conv_c AS DOUBLE)), 6)"
        " END")
    lift_num = "CAST(conv_t AS DECIMAL(18,0)) * CAST(n_c AS DECIMAL(18,0))"
    lift_den = "CAST(conv_c AS DECIMAL(18,0)) * CAST(n_t AS DECIMAL(18,0))"
    lift = F.when(
        F.col("conv_c") > 0,
        F.expr(f"(2000000 * ({lift_num}) + ({lift_den})"
               f" - pmod(2000000 * ({lift_num}) + ({lift_den}),"
               f" 2 * ({lift_den}))) div (2 * ({lift_den}))")
        .cast("double") / F.lit(1e6))
    return agg.select(
        "n_t", "conv_t", "n_c", "conv_c",
        _ratio6("conv_t", "n_t").alias("rate_t"),
        _ratio6("conv_c", "n_c").alias("rate_c"),
        lift.alias("lift"), chi2.alias("chi2"))


def rfm_segments(df: DataFrame, unit_col: str, ts_col: str,
                 value_col: str, n_buckets: int = 5) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    entity-scoring rollup.  Per unit: days since last activity
    (exact integer epoch-day arithmetic against the global max),
    activity count, and DECIMAL(18,4) value sum; each dimension then
    gets an exact percentile bucket 1..n via the range-partitioned
    rank (``(rank−1)·n div (N−1)`` capped — pure integer, no double
    boundary) and the three digits concat into a segment code.

    Recency is inverted (most recent → highest score) so 'n n n' is
    the best segment, matching the marketing convention.

    Shape at 100 TB: one unit groupBy over the fact table, then three
    ranged rank passes + equi-joins on the (much smaller) unit dim.
    """
    ep = F.floor(F.col(ts_col).cast("timestamp").cast("double")) \
        .cast("long")
    per_u = (df.groupBy(F.col(unit_col).alias("unit"))
             .agg(F.max(ep).alias("__last"),
                  F.count(F.lit(1)).cast("long").alias("frequency"),
                  F.sum(F.col(value_col).cast("decimal(18,4)"))
                  .alias("__m")))
    g_max = per_u.agg(F.max("__last").alias("m")).collect()[0]["m"]
    per_u = (per_u
             .withColumn("recency_days",
                         F.expr(f"({int(g_max)} - __last) div 86400")
                         .cast("long"))
             .withColumn("monetary", F.col("__m").cast("double")))

    nb = int(n_buckets)

    def _bucket(src: DataFrame, order: Column, out: str,
                invert: bool = False) -> DataFrame:
        keyed = (src.withColumn("__ord", F.struct(
                     order.alias("v"), F.col("unit").alias("i")))
                 .withColumn("__one", F.lit(1).cast("long")))
        ranked = ranged_cumsum(keyed, "__ord", "__one", cum_col="__r",
                               total_col="__n")
        b = F.when(F.col("__n") > 1,
                   F.expr(f"((__r - 1) * {nb}) div (__n - 1)")) \
            .otherwise(F.lit(0))
        b = F.least(b, F.lit(nb - 1)).cast("int")
        b = (F.lit(nb) - b) if invert else (b + 1)
        return ranked.withColumn(out, b.cast("int")) \
            .drop("__ord", "__one", "__r", "__n")

    scored = _bucket(per_u, F.col("recency_days"), "r_score",
                     invert=True)
    scored = _bucket(scored, F.col("frequency"), "f_score")
    scored = _bucket(scored, F.col("__m"), "m_score")
    return scored.select(
        "unit", "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
        F.concat_ws("-", F.col("r_score").cast("string"),
                    F.col("f_score").cast("string"),
                    F.col("m_score").cast("string")).alias("segment"))


def lead_lag_corr(df: DataFrame, ts_col: str, a_col: str | Column,
                  b_col: str | Column, max_lag: int = 3,
                  grain_sec: int = 86400) -> DataFrame:
    """Lead-lag cross-correlation of two event streams — does series A
    (e.g. clicks) LEAD series B (purchases), and by how many days?
    Both series aggregate to exact BIGINT counts per time slot; for
    each lag ℓ ∈ [−max_lag, +max_lag], Pearson r between A(t) and
    B(t+ℓ) over the slots where both exist.

    Exactness: the five sufficient statistics are exact integer sums;
    r is ONE fixed IEEE double tree over their exact double
    conversions (products/sqrt are correctly rounded and engine-
    identical), rounded to 6dp; zero-variance slices are detected with
    exact integer compares (n·Sxx = Sx², never a double ≈ 0) → NULL.

    Shape at 100 TB: the fact table collapses to the slot dim (one
    groupBy, map-side combine); the lag fan-out (explode over 2ℓ+1
    lags) and self-join run on slot-dim rows only.

    Returns one row per lag: ``lag, n_slots, r``.
    """
    a = F.col(a_col) if isinstance(a_col, str) else a_col
    b = F.col(b_col) if isinstance(b_col, str) else b_col
    slot = F.expr(f"CAST(floor(CAST(CAST({ts_col} AS TIMESTAMP)"
                  f" AS DOUBLE)) AS BIGINT) div {int(grain_sec)}")
    per_slot = (df.groupBy(slot.alias("__s"))
                .agg(F.sum(a.cast("long")).alias("__a"),
                     F.sum(b.cast("long")).alias("__b")))
    lags = F.explode(F.sequence(F.lit(-int(max_lag)),
                                F.lit(int(max_lag)))).alias("lag")
    la = per_slot.select("__s", "__a").select(F.col("__s"), "__a", lags)
    pair = (la.withColumn("__st", F.col("__s") + F.col("lag"))
            .join(per_slot.select(F.col("__s").alias("__st"),
                                  F.col("__b")), "__st"))
    agg = (pair.groupBy("lag")
           .agg(F.count(F.lit(1)).cast("long").alias("n_slots"),
                F.sum("__a").cast("long").alias("__sx"),
                F.sum("__b").cast("long").alias("__sy"),
                F.sum(F.col("__a") * F.col("__a")).cast("long")
                .alias("__sxx"),
                F.sum(F.col("__b") * F.col("__b")).cast("long")
                .alias("__syy"),
                F.sum(F.col("__a") * F.col("__b")).cast("long")
                .alias("__sxy")))
    r = F.expr(
        "CASE WHEN n_slots > 1"
        " AND n_slots * __sxx != __sx * __sx"
        " AND n_slots * __syy != __sy * __sy THEN"
        " ROUND(CAST(n_slots * __sxy - __sx * __sy AS DOUBLE)"
        " / (SQRT(CAST(n_slots * __sxx - __sx * __sx AS DOUBLE))"
        "    * SQRT(CAST(n_slots * __syy - __sy * __sy AS DOUBLE))),"
        " 6) END")
    return agg.select(F.col("lag").cast("int").alias("lag"),
                      "n_slots", r.alias("r")).orderBy("lag")


def last_touch_attribution(df: DataFrame, unit_col: str, ts_col: str,
                           tie_col: str, type_col: str,
                           conversion_type: str,
                           touch_types: list[str],
                           value_col: str,
                           lookback_sec: int = 7 * 86400) -> DataFrame:
    """Last-touch conversion attribution — credit each conversion event
    to the most recent preceding touch event of the same unit within a
    lookback window, else to ``'direct'``; roll up conversion count and
    DECIMAL(18,4) revenue per credited channel.

    One unit-keyed window pass: ``last(touch_struct, ignoreNulls)``
    over ``(ts, tie)`` order carries the latest touch forward, and the
    lookback comparison is exact integer epoch-seconds.  Conversions
    never attribute to themselves or later events (strict preceding
    rows via ``rowsBetween(unboundedPreceding, -1)``).

    Shape at 100 TB: one keyed window over many small unit groups +
    one channel groupBy (channel dim is tiny).
    """
    from pyspark.sql import Window

    ep = F.floor(F.col(ts_col).cast("timestamp").cast("double")) \
        .cast("long")
    base = df.select(F.col(unit_col).alias("__u"), ep.alias("__s"),
                     F.col(tie_col).alias("__i"),
                     F.col(type_col).alias("__ty"),
                     F.col(value_col).alias("__val"))
    touch = F.when(F.col("__ty").isin(*touch_types),
                   F.struct(F.col("__s").alias("s"),
                            F.col("__ty").alias("ty")))
    w = (Window.partitionBy("__u").orderBy("__s", "__i")
         .rowsBetween(Window.unboundedPreceding, -1))
    carried = (base.withColumn("__lt", F.last(touch, ignorenulls=True)
                               .over(w))
               .filter(F.col("__ty") == conversion_type))
    channel = F.when(
        F.col("__lt").isNotNull()
        & (F.col("__s") - F.col("__lt.s") <= F.lit(int(lookback_sec))),
        F.col("__lt.ty")).otherwise(F.lit("direct"))
    return (carried.withColumn("channel", channel)
            .groupBy("channel")
            .agg(F.count(F.lit(1)).cast("long").alias("n_conversions"),
                 F.sum(F.col("__val").cast("decimal(18,4)"))
                 .cast("double").alias("revenue")))


def psi_profile(df: DataFrame, value_col: str, split_col: str | Column,
                lo: float, width: float, n_bins: int) -> DataFrame:
    """Population stability index between two snapshots of a numeric
    column — the standard drift monitor a curation pipeline runs when a
    filter, mixture, or upstream source changes (complements
    ``corpus_drift_jsd``, which compares TERM distributions; PSI
    compares a binned NUMERIC feature).

    ``split_col`` is boolean/0-1: 1 = expected (baseline) snapshot,
    0 = actual.  Values bin into ``n_bins`` fixed-width bins from
    ``lo`` (floor((v−lo)/width)); underflow clamps to bin −1, overflow
    to bin ``n_bins`` — rows are never silently dropped.

    Exactness: bin counts are exact BIGINTs; each bin's PSI term
    ``(p−q)·ln(p/q)`` is ONE fixed double tree over exact integers
    ``(c_e·T_a − c_a·T_e)/(T_e·T_a) · ln((c_e·T_a)/(c_a·T_e))``,
    rounded to the 1e-9 grid (terms are ≥ 0, so ``floor(x·1e9 + 0.5)``
    is round-half-up); the total is the exact BIGINT nano sum over the
    bin dim divided once by 1e9.  Bins where either snapshot is empty
    get a NULL term and are excluded from the total (reported, never
    smoothed away silently).

    Shape at 100 TB: one map-side-combined groupBy(bin) over the scan;
    everything after runs on the ≤ n_bins+2-row bin dim (the one
    unpartitioned window is over that dim — the "per-dim-row-only"
    policy).  Returns one row per occupied bin: ``bin``,
    ``n_expected``, ``n_actual``, ``psi_term`` (DOUBLE, 1e-9 grid),
    ``psi_total`` (DOUBLE, same on every row).
    """
    from pyspark.sql import Window
    s = F.col(split_col) if isinstance(split_col, str) else split_col
    raw = F.floor((F.col(value_col) - F.lit(float(lo)))
                  / F.lit(float(width))).cast("long")
    bin_ = F.least(F.greatest(raw, F.lit(-1)), F.lit(int(n_bins)))
    per_bin = (df.select(bin_.alias("bin"), s.cast("long").alias("__e"))
               .groupBy("bin")
               .agg(F.sum("__e").cast("long").alias("n_expected"),
                    F.sum(F.lit(1) - F.col("__e")).cast("long")
                    .alias("n_actual")))
    wt = Window.partitionBy()          # bin dim only: <= n_bins+2 rows
    d = (per_bin
         .withColumn("__te", F.sum("n_expected").over(wt))
         .withColumn("__ta", F.sum("n_actual").over(wt)))
    # one fixed IEEE double tree over exact BIGINTs (both engines parse
    # the same shape); NULL when either side of the bin is empty
    term = F.when(
        (F.col("n_expected") > 0) & (F.col("n_actual") > 0),
        (F.col("n_expected").cast("double") / F.col("__te").cast("double")
         - F.col("n_actual").cast("double") / F.col("__ta").cast("double"))
        * F.log((F.col("n_expected").cast("double")
                 * F.col("__ta").cast("double"))
                / (F.col("n_actual").cast("double")
                   * F.col("__te").cast("double"))))
    d = d.withColumn("__nano",
                     F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long"))
    d = d.withColumn("__tot", F.sum("__nano").over(wt))
    return d.select(
        "bin", "n_expected", "n_actual",
        (F.col("__nano").cast("double") / F.lit(1e9)).alias("psi_term"),
        (F.col("__tot").cast("double") / F.lit(1e9)).alias("psi_total"))


def quantile_normalize(df: DataFrame, group_col: str, value_col: str,
                       tie_col: str, out_col: str = "normalized",
                       ) -> DataFrame:
    """Map every group's value distribution onto the GLOBAL
    distribution by rank — quantile normalization, the cross-source
    score calibration step before per-source quality scores can share
    one threshold (a "0.8" from a lenient scorer and a strict one mean
    different things; after normalization both are the global value at
    the same quantile).

    EXACT: within-group rank r (1..N_g) and global rank (1..N) are
    deterministic BIGINTs under ``(value, tie)`` via two
    range-partitioned :func:`ranged_cumsum` passes; the target global
    rank is the pure-integer round-half map
    ``(2(r−1)(N−1) + (N_g−1)) div (2(N_g−1)) + 1`` (singleton groups
    map to the global median rank ``(N+1) div 2``), and the normalized
    value is the input value AT that rank — joined exactly, never
    interpolated in doubles.

    Shape at 100 TB: one grouped + one global ranked pass, then ONE
    equi-join on the integer target rank (uniform by construction —
    every global rank is hit O(|groups|) times).  No global window.

    Returns ``tie_col``, ``group_col``, ``value_col``, ``out_col``.
    """
    base = df.select(F.col(group_col).alias("__g"),
                     F.col(value_col).alias("__v"),
                     F.col(tie_col).alias("__t"))
    n_total = base.count()
    # global rank -> value lookup
    glob = (_rank(base.select("__v", "__t"), "__v", "__t", "__gr")
            .select(F.col("__gr").alias("__tgt"),
                    F.col("__v").alias("__nv")))
    # within-group rank + group size in one pass
    keyed = (base.withColumn("__ord", F.struct(
                 F.col("__v").alias("v"), F.col("__t").alias("i")))
             .withColumn("__one", F.lit(1).cast("long")))
    grp = ranged_cumsum(keyed, "__ord", "__one", cum_col="__r",
                        group_cols=["__g"], total_col="__ng") \
        .drop("__ord", "__one")
    tgt = F.when(
        F.col("__ng") > 1,
        F.expr(f"(2 * (__r - 1) * ({n_total} - 1) + (__ng - 1))"
               f" div (2 * (__ng - 1)) + 1")
    ).otherwise(F.lit((n_total + 1) // 2).cast("long"))
    out = (grp.withColumn("__tgt", tgt.cast("long"))
           .join(glob, "__tgt"))
    return out.select(F.col("__t").alias(tie_col),
                      F.col("__g").alias(group_col),
                      F.col("__v").alias(value_col),
                      F.col("__nv").alias(out_col))


def seasonal_anomaly(df: DataFrame, key_cols: list[str], ts_col: str,
                     value_col: str, period_sec: int, slot_sec: int,
                     z: int = 3) -> DataFrame:
    """Seasonal-baseline anomaly gate: each observation is compared to
    the mean/variance of its OWN seasonal slot (hour-of-day,
    slot-of-week, ...) — the deviation monitor for any metric with a
    daily/weekly shape, where a global z-score (q140's rolling gate is
    the trend-following counterpart) would flag every rush hour.

    ``slot = (epoch mod period_sec) div slot_sec``.  The decision is
    the PURE-INTEGER inequality of the rolling z-score gate
    (``(n·x − S)²·(n−1) > z²·n·(n·Q − S²)``) over micro-quantized
    values (``floor(v·1e6 + 0.5)``), so no FP enters the flag;
    the reported baseline mean is the exact round-half-away-from-zero
    micro-division.  The baseline INCLUDES the observation itself
    (population baseline — leave-one-out would need a per-row
    subtraction that changes nothing at seasonal-slot counts).

    Bounds: micros ≤ ~5·10⁸ keep ``(n·x−S)²·(n−1)`` inside
    DECIMAL(38,0)/HUGEINT for n ≲ 10⁶ rows per (key, slot) — beyond
    that, coarsen ``slot_sec`` (same trade as q140's trailing window).

    Shape at 100 TB: ONE map-side-combined groupBy((key, slot)) builds
    the baseline dim (|keys|·period/slot rows), joined back broadcast/
    equi — no window over the data, no self-join.
    """
    d = slotted_micros(df, ts_col, value_col, period_sec, slot_sec)
    base = seasonal_baseline(df, key_cols, ts_col, value_col,
                             period_sec, slot_sec)
    j = d.join(F.broadcast(base), [*key_cols, "__slot"])
    mean, flag = anomaly_flag_cols(z)
    return j.select(
        *key_cols, F.col(ts_col), F.col(value_col),
        F.col("__slot").alias("slot"), F.col("__n").alias("slot_n"),
        mean.alias("slot_mean"), flag.alias("is_anomaly"))


def slotted_micros(df: DataFrame, ts_col: str, value_col: str,
                   period_sec: int, slot_sec: int) -> DataFrame:
    """Attach the seasonal ``__slot`` index and micro-quantized ``__m``
    value (shared between the batch gate and the streaming gate so
    both quantize identically)."""
    mic = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)) \
        .cast("long")
    return (df.withColumn("__slot", F.expr(
                f"pmod(floor(cast(cast({ts_col} as timestamp)"
                f" as double)), {int(period_sec)})"
                f" div {int(slot_sec)}").cast("long"))
            .withColumn("__m", mic))


def seasonal_baseline(df: DataFrame, key_cols: list[str], ts_col: str,
                      value_col: str, period_sec: int,
                      slot_sec: int) -> DataFrame:
    """The per-(key, slot) baseline dim (count / micro sum / micro²
    sum) behind :func:`seasonal_anomaly` — exposed so a STREAM can
    join the same baseline statically (streaming/analytics)."""
    d = slotted_micros(df, ts_col, value_col, period_sec, slot_sec)
    return (d.groupBy(*key_cols, "__slot")
            .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                 F.sum(F.col("__m").cast("decimal(38,0)")).alias("__s"),
                 F.sum((F.col("__m").cast("decimal(19,0)")
                        * F.col("__m").cast("decimal(19,0)"))
                       .cast("decimal(38,0)")).alias("__q")))


def anomaly_flag_cols(z: int) -> tuple[Column, Column]:
    """(slot-mean, is-anomaly) expressions over a row carrying
    ``__m/__n/__s/__q`` — the pure-integer decision shared by the
    batch and streaming gates."""
    dev = F.col("__n") * F.col("__m").cast("decimal(38,0)") - F.col("__s")
    lhs = dev * dev * (F.col("__n") - 1)
    rhs = (F.lit(int(z) * int(z)) * F.col("__n")
           * (F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")))
    flag = F.when(F.col("__n") >= 2, lhs > rhs).otherwise(F.lit(False))
    mean = F.expr(
        "CAST((CASE WHEN __s < 0 THEN -1 ELSE 1 END)"
        " * ((2 * abs(__s) + __n - pmod(2 * abs(__s) + __n, 2 * __n))"
        "    div (2 * __n)) AS DOUBLE) / 1e6")
    return mean, flag


def linear_attribution(df: DataFrame, unit_col: str, ts_col: str,
                       tie_col: str, type_col: str, value_col: str,
                       touch_types: list[str], conversion_type: str,
                       lookback_sec: int) -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's value is split
    EQUALLY across every touch inside the lookback window (the
    single-winner counterpart is :func:`last_touch_attribution`).
    Conversions with no in-window touch credit ``direct`` in full.

    EXACT: the conversion value quantizes to micros
    (``floor(v·1e6 + 0.5)``); each of the k touches gets
    ``micros div k`` and the REMAINDER goes to the earliest touch
    (min ``(epoch, tie)`` — deterministic under same-second ties), so
    per-channel credit sums are exact integers that reconstruct every
    conversion exactly.

    Shape at 100 TB: one unit-keyed shuffle shared by the range window
    (``collect_list`` over ``[−lookback, −1)`` seconds — state bounded
    by per-unit activity inside the lookback, the same bound
    ``last_touch_attribution`` carries) and nothing else; the explode
    fans out conversions × their touches, bounded by the same window.
    """
    from pyspark.sql import Window
    epoch = F.floor(F.col(ts_col).cast("timestamp").cast("double")) \
        .cast("long")
    base = df.select(F.col(unit_col).alias("__u"), epoch.alias("__s"),
                     F.col(tie_col).alias("__i"),
                     F.col(type_col).alias("__ty"),
                     F.col(value_col).alias("__val"))
    touch = F.when(F.col("__ty").isin(*touch_types),
                   F.struct(F.col("__s").alias("s"),
                            F.col("__i").alias("i"),
                            F.col("__ty").alias("ty")))
    w = (Window.partitionBy("__u").orderBy("__s")
         .rangeBetween(-int(lookback_sec), -1))
    conv = (base.withColumn("__ts", F.collect_list(touch).over(w))
            .filter(F.col("__ty") == conversion_type))
    vm = F.floor(F.col("__val") * F.lit(1e6) + F.lit(0.5)).cast("long")
    k = F.size("__ts").cast("long")
    conv = (conv.withColumn("__vm", vm).withColumn("__k", k)
            .withColumn("__base", F.expr(
                "CASE WHEN __k > 0 THEN __vm div __k ELSE 0 END"))
            .withColumn("__rem", F.expr(
                "CASE WHEN __k > 0 THEN __vm - __k * (__vm div __k)"
                " ELSE 0 END"))
            .withColumn("__first", F.array_min("__ts")))
    credited = (conv.filter(F.col("__k") > 0)
                .select("__u", "__vm", "__base", "__rem", "__first",
                        F.explode("__ts").alias("__t"))
                .select(F.col("__t.ty").alias("channel"),
                        (F.col("__base")
                         + F.when((F.col("__t.s") == F.col("__first.s"))
                                  & (F.col("__t.i") == F.col("__first.i")),
                                  F.col("__rem")).otherwise(F.lit(0)))
                        .alias("__credit"),
                        F.lit(0).alias("__conv")))
    direct = (conv.filter(F.col("__k") == 0)
              .select(F.lit("direct").alias("channel"),
                      F.col("__vm").alias("__credit"),
                      F.lit(1).alias("__conv")))
    n_conv_per_channel = (conv.filter(F.col("__k") > 0)
                          .select(F.explode("__ts").alias("__t"))
                          .groupBy(F.col("__t.ty").alias("channel"))
                          .agg(F.count(F.lit(1)).cast("long")
                               .alias("n_touches")))
    credit = (credited.unionByName(direct)
              .groupBy("channel")
              .agg(F.sum(F.col("__credit").cast("decimal(38,0)"))
                   .alias("__cm"),
                   F.sum("__conv").cast("long").alias("n_direct"))
              .join(n_conv_per_channel, "channel", "left"))
    return credit.select(
        "channel",
        F.coalesce("n_touches", F.lit(0).cast("long")).alias("n_touches"),
        "n_direct",
        (F.col("__cm").cast("double") / F.lit(1e6)).alias("credit"))


def seasonal_naive_error(df: DataFrame, key_cols: list[str],
                         ts_col: str, value_col: str, slot_sec: int,
                         period_slots: int) -> DataFrame:
    """Seasonal-naive forecast backtest: forecast(slot) =
    actual(slot − period), scored with WAPE = Σ|a−f| / Σ|a| — the
    sanity baseline every forecasting effort must beat, and the
    cheapest drift monitor for strongly periodic volume metrics.

    EXACT: per-slot actuals are micro-quantized sums
    (``floor(v·1e6 + 0.5)`` per element, exact integer totals), the
    self-join is on the pure-integer shifted slot index, the absolute
    errors are exact integers, and WAPE is one round-half-up integer
    micro-division.  Slots with no prior-period counterpart drop out
    (scored slots only — reported via ``n_slots``).

    Shape at 100 TB: ONE map-side-combined groupBy((key, slot))
    collapses the raw rows to the slot dim; the shifted self-join and
    the final key rollup run on that dim.  No window over data rows.
    """
    epoch = F.floor(F.col(ts_col).cast("timestamp").cast("double")) \
        .cast("long")
    mic = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)) \
        .cast("long")
    slots = (df.withColumn("__slot", F.expr(
                f"floor(cast(cast({ts_col} as timestamp) as double))"
                f" div {int(slot_sec)}").cast("long"))
             .withColumn("__m", mic)
             .groupBy(*key_cols, "__slot")
             .agg(F.sum(F.col("__m").cast("decimal(38,0)"))
                  .alias("__a")))
    prior = slots.select(
        *key_cols, (F.col("__slot") + F.lit(int(period_slots)))
        .alias("__slot"), F.col("__a").alias("__f"))
    j = slots.join(prior, [*key_cols, "__slot"])
    agg = (j.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).cast("long").alias("n_slots"),
                F.sum(F.abs(F.col("__a") - F.col("__f"))).alias("__e"),
                F.sum(F.abs(F.col("__a"))).alias("__t")))
    wape = F.expr("CASE WHEN __t > 0 THEN"
                  " CAST((2000000 * __e + __t"
                  "       - pmod(2000000 * __e + __t, 2 * __t))"
                  "      div (2 * __t) AS DOUBLE) / 1e6 END")
    return agg.select(*key_cols, "n_slots", wape.alias("wape"))


def latency_bands(df: DataFrame, group_cols: list[str], value_col: str,
                  tie_col: str,
                  bands: list[tuple[int, int, int]] = ((50, 100, 1),
                                                       (95, 100, 2),
                                                       (99, 100, 3)),
                  ) -> DataFrame:
    """Nearest-rank percentile bands per group (p50/p95/p99 by
    default) — the latency/SLO dashboard rollup.  EXACT: within-group
    ranks are deterministic BIGINTs under ``(value, tie)`` via the
    grouped :func:`ranged_cumsum`; each band's target rank is the
    pure-integer ``ceil(p·n) = (num·n + den − 1) div den``; the band
    value is the input value AT that rank, picked with a conditional
    ``max`` in the same group rollup — never interpolated.

    ``bands`` entries are ``(numerator, denominator, ordinal)`` —
    ordinals name the output columns ``p<numerator>``.

    Shape at 100 TB: one grouped ranked pass + ONE groupBy.  Group
    count is unbounded (offsets dim grows ~1 row per group); for
    MILLIONS of tiny groups a plain grouped window is the better plan
    — same trade documented on ranged_cumsum.
    """
    base = df.select(*[F.col(c) for c in group_cols],
                     F.col(value_col).alias("__v"),
                     F.col(tie_col).alias("__t"))
    keyed = (base.withColumn("__ord", F.struct(
                 F.col("__v").alias("v"), F.col("__t").alias("i")))
             .withColumn("__one", F.lit(1).cast("long")))
    ranked = ranged_cumsum(keyed, "__ord", "__one", cum_col="__r",
                           group_cols=list(group_cols),
                           total_col="__n")
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for num, den, _ in bands:
        tgt = F.expr(f"({num} * __n + {den} - 1) div {den}")
        aggs.append(F.max(F.when(F.col("__r") == tgt, F.col("__v")))
                    .alias(f"p{num}"))
    return ranked.groupBy(*group_cols).agg(*aggs)


def latency_bands_sketch(df: DataFrame, group_cols: list[str],
                         value_col: str,
                         bands: list[tuple[int, int, int]] = (
                             (50, 100, 1), (95, 100, 2), (99, 100, 3)),
                         s_bits: int = 8) -> DataFrame:
    """The SKETCH-backed route of :func:`latency_bands`: same answer
    columns (``group..., n, p50, p95, p99``) but each band value is
    the dyadic-bucket quantile estimate (within 2^-s_bits relative
    error, denanoized 6dp) instead of the exact value at the rank.

    The physical trade (the q53_bucketed/q53_shuffle pattern): the
    exact route pays a grouped ranked pass whose shuffle grows with
    the DISTINCT value count; this route is ONE map-side-combined
    groupBy onto the bounded bucket dim (≤ ~16k rows/group) + a
    window over that dim — and the bucket table is mergeable, so a
    maintained rollup (incremental_agg spec ``sum_long`` on ``cnt``)
    answers the dashboard without ever rescanning history.  Pick this
    route when the value column is high-cardinality or the bands are
    re-read often; q197's calibration report measures the error.
    """
    from rainforest_spark.operators.sketches import (
        quantile_buckets, quantile_estimate,
    )
    g = list(group_cols)
    ppms = [int(num) * 1_000_000 // int(den) for num, den, _ in bands]
    est = quantile_estimate(
        quantile_buckets(df, value_col, g, s_bits), ppms, g)
    aggs = [F.min("n").alias("n")]
    for (num, _den, _o), ppm in zip(bands, ppms):
        aggs.append(F.max(F.when(F.col("q_ppm") == ppm,
                                 F.col("estimate")))
                    .alias(f"p{num}"))
    return est.groupBy(*g).agg(*aggs)


def pareto_frontier(df: DataFrame, x_col: str, y_col: str,
                    group_cols: list[str] | None = None) -> DataFrame:
    """2-D skyline: the rows NOT dominated by any other row, where q
    dominates p iff ``q.x <= p.x AND q.y <= p.y`` with at least one
    strict (minimize both) — the multi-objective shortlist query
    ("smallest AND cheapest", "fastest AND most accurate").  Duplicate
    frontier points all survive (neither dominates the other).  With
    ``group_cols`` the frontier is computed WITHIN each group (a
    per-brand shortlist).

    Distributed shape: collapse to the per-distinct-(group, x) dim
    (ONE map-side-combined groupBy: x → min y), run the
    strictly-preceding running min over x through
    :func:`ranged_cummin` (range-labeled, no single-partition window;
    grouped when group_cols is set), keep x's whose best y beats every
    smaller x's best, and join the survivors back — a skyline in two
    shuffles + one equi-join, never a self-join over the data.

    EXACT: comparisons only — no arithmetic touches the values.
    """
    g = list(group_cols or [])
    dim = df.groupBy(*g, F.col(x_col).alias("__x")) \
        .agg(F.min(y_col).alias("__miny"))
    dim = ranged_cummin(dim, "__x", "__miny", cum_col="__cm",
                        prev_col="__mp", group_cols=g or None)
    keep = (dim.filter(F.col("__mp").isNull()
                       | (F.col("__mp") > F.col("__miny")))
            .select(*[F.col(c).alias(f"__kg_{c}") for c in g],
                    "__x", "__miny"))
    cond = (df[x_col] == F.col("__x")) & (df[y_col] == F.col("__miny"))
    for c in g:
        cond = cond & df[c].eqNullSafe(F.col(f"__kg_{c}"))
    return df.join(keep, cond, "inner").drop(
        "__x", "__miny", *[f"__kg_{c}" for c in g])


def jackknife_mean(df: DataFrame, group_col: str, value_col: str,
                   ) -> DataFrame:
    """Leave-one-group-out (delete-a-group jackknife) mean with its
    standard error — the error bar a corpus-level average needs when
    observations CLUSTER by source (independent-row SEs are too tight
    when whole sources move together).

    EXACT: per-group sums/counts are exact integers; each
    leave-one-out mean is ONE round-half-up micro-division of
    ``(S − s_g) / (N − n_g)``; the deviation sum of squares runs in
    exact micro² decimals over the group dim (the per-dim-row-only
    window policy — ≤ |groups| rows), and only the final
    ``(G−1)·ΣD²/G³`` division and square root are doubles, rounded to
    6dp.

    Shape at 100 TB: ONE map-side-combined groupBy to the group dim;
    everything else on that dim.  Returns one row per group:
    ``group, n, loo_mean`` plus the same ``jk_se`` on every row.
    """
    from pyspark.sql import Window
    mic = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)) \
        .cast("long")
    # internal column names must never differ only by CASE: the driver
    # runs a vanilla (case-INSENSITIVE) session where withColumn with
    # an upper-cased twin of an existing name silently REPLACES it
    # (tests/test_plan_shapes.py lints the whole package for this)
    per = (df.select(F.col(group_col).alias("grp"), mic.alias("__m"))
           .groupBy("grp")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("__m").cast("decimal(38,0)")).alias("__s")))
    wt = Window.partitionBy()              # group dim only
    per = (per.withColumn("__tn", F.sum("n").over(wt))
           .withColumn("__tsum", F.sum("__s").over(wt))
           .withColumn("__ng", F.count(F.lit(1)).over(wt)))
    # leave-one-out mean in micros: round-half-up of (S-s)/(N-n)
    loo = F.expr("(2 * (__tsum - __s) + (__tn - n)"
                 " - pmod(2 * (__tsum - __s) + (__tn - n),"
                 " 2 * (__tn - n))) div (2 * (__tn - n))")
    per = per.withColumn("__loo", loo.cast("decimal(38,0)"))
    per = per.withColumn("__sl", F.sum("__loo").over(wt))
    # deviation scaled by G to stay integer: G*loo_g - sum(loo)
    dev = F.expr("CAST(__ng AS DECIMAL(38,0)) * __loo - __sl")
    per = per.withColumn("__d2", (dev * dev).cast("decimal(38,0)"))
    per = per.withColumn("__sd2", F.sum("__d2").over(wt))
    se = F.round(F.sqrt(
        F.col("__sd2").cast("double") * (F.col("__ng") - 1).cast("double")
        / (F.col("__ng").cast("double") * F.col("__ng").cast("double")
           * F.col("__ng").cast("double")) / F.lit(1e12)), 6)
    return per.select(
        F.col("grp").alias(group_col), "n",
        (F.col("__loo").cast("double") / F.lit(1e6)).alias("loo_mean"),
        se.alias("jk_se"))


def cuped_contrast(df: DataFrame, unit_col: str, arm_col: str | Column,
                   metric_col: str | Column,
                   covariate_col: str | Column) -> DataFrame:
    """CUPED variance-reduced A/B contrast (Deng et al., WSDM 2013):
    adjust each unit's metric by a pre-experiment covariate,
    ``y' = y − θ(x − x̄)`` with ``θ = cov(x,y)/var(x)`` pooled over all
    units, then contrast the arms on the adjusted metric — the standard
    sensitivity booster when a pre-period measurement of the same
    units exists.

    EXACT sufficient statistics: metric/covariate values
    micro-quantize PER ELEMENT (``floor(v·1e6 + 0.5)`` — quantizing a
    double SUM would inherit its partial-aggregation order) and every
    unit/pooled sum (n, Σx, Σy, Σxy, Σx²) rides exact
    BIGINT/DECIMAL(38,0) — order-free.
    θ and the adjusted means are fixed double trees over those exact
    integers (decimal→double casts are correctly rounded on both
    engines), with outputs rounded to 6dp at the end; a zero-variance
    covariate is detected by the EXACT integer compare
    ``n·Σx² == (Σx)²`` (never a double ``var > 0``) and falls back to
    the unadjusted means.

    Shape at 100 TB: one unit groupBy (map-side combined), one
    order-free pooled aggregate, one per-arm aggregate on the unit
    dim.  Returns one row per arm: ``arm, n_units, raw_mean,
    adj_mean, theta``.
    """
    from pyspark.sql import Window
    arm = F.col(arm_col) if isinstance(arm_col, str) else arm_col
    y = F.col(metric_col) if isinstance(metric_col, str) else metric_col
    x = (F.col(covariate_col) if isinstance(covariate_col, str)
         else covariate_col)
    ym = F.floor(y * F.lit(1e6) + F.lit(0.5)).cast("long")
    xm = F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long")
    per_unit = (df.select(F.col(unit_col).alias("__u"),
                          arm.cast("long").alias("__arm"),
                          ym.alias("__ym"), xm.alias("__xm"))
                .groupBy("__u", "__arm")
                .agg(F.sum("__ym").cast("long").alias("__y"),
                     F.sum("__xm").cast("long").alias("__x")))
    dec = lambda c: F.col(c).cast("decimal(19,0)")   # noqa: E731
    wt = Window.partitionBy()          # arm dim only after the rollup
    arms = (per_unit.groupBy("__arm")
            .agg(F.count(F.lit(1)).cast("long").alias("n_units"),
                 F.sum(dec("__y").cast("decimal(38,0)")).alias("__sy"),
                 F.sum(dec("__x").cast("decimal(38,0)")).alias("__sx"),
                 F.sum((dec("__x") * dec("__y")).cast("decimal(38,0)"))
                 .alias("__sxy"),
                 F.sum((dec("__x") * dec("__x")).cast("decimal(38,0)"))
                 .alias("__sxx")))
    # pooled sums from the tiny arm dim (2 rows)
    arms = (arms.withColumn("__tn", F.sum("n_units").over(wt))
            .withColumn("__tsy", F.sum("__sy").over(wt))
            .withColumn("__tsx", F.sum("__sx").over(wt))
            .withColumn("__tsxy", F.sum("__sxy").over(wt))
            .withColumn("__tsxx", F.sum("__sxx").over(wt)))
    # exact zero-variance test; theta as one double tree over exact
    # integers (cov/var share the 1/n(n-1) factor, so the n·Σ forms
    # cancel): theta = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
    varx_num = F.expr("__tn * __tsxx - __tsx * __tsx")
    theta = F.expr("CAST(__tn * __tsxy - __tsx * __tsy AS DOUBLE)"
                   " / CAST(__tn * __tsxx - __tsx * __tsx AS DOUBLE)")
    raw_mean = F.expr(
        "CAST((CASE WHEN __sy < 0 THEN -1 ELSE 1 END)"
        " * ((2 * abs(__sy) + n_units"
        "     - pmod(2 * abs(__sy) + n_units, 2 * n_units))"
        "    div (2 * n_units)) AS DOUBLE) / 1e6")
    # adj_mean = raw_mean − θ·(x̄_arm − x̄_pooled), all in micro doubles
    adj = (F.expr("CAST(__sy AS DOUBLE) / CAST(n_units AS DOUBLE)")
           - theta * (F.expr("CAST(__sx AS DOUBLE)"
                             " / CAST(n_units AS DOUBLE)")
                      - F.expr("CAST(__tsx AS DOUBLE)"
                               " / CAST(__tn AS DOUBLE)"))) / F.lit(1e6)
    has_var = varx_num != F.lit(0).cast("decimal(38,0)")
    return arms.select(
        F.col("__arm").alias("arm"), "n_units",
        raw_mean.alias("raw_mean"),
        F.round(F.when(has_var, adj)
                .otherwise(F.expr("CAST(__sy AS DOUBLE)"
                                  " / CAST(n_units AS DOUBLE) / 1e6")),
                6).alias("adj_mean"),
        F.when(has_var, F.round(theta, 6)).alias("theta"))


def proportion_ci(df: DataFrame, group_cols: list[str],
                  success_col: str | Column, z: int = 2) -> DataFrame:
    """Per-group proportion with its Wilson score interval — the error
    bar for every "X% of rows pass the filter" claim (the Wilson form
    stays inside [0,1] and behaves at small n and extreme p, where the
    naive normal interval fails).

    ``z`` is an INTEGER sigma multiplier (default 2 ≈ 95%) so ``z²``
    is exact.  EXACT counts; the interval is one fixed double tree
    over them, rounded to 6dp:
    ``(p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)``.

    Shape: ONE map-side-combined groupBy.  Returns one row per group:
    ``*group_cols, n, k, rate, ci_lo, ci_hi``.
    """
    s = F.col(success_col) if isinstance(success_col, str) else success_col
    per = (df.select(*[F.col(c) for c in group_cols],
                     s.cast("long").alias("__s"))
           .groupBy(*group_cols)
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__s").cast("long").alias("k")))
    z2 = int(z) * int(z)
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    center = p + F.lit(float(z2)) / (F.lit(2.0) * nd)
    half = F.lit(float(z)) * F.sqrt(
        p * (F.lit(1.0) - p) / nd
        + F.lit(float(z2)) / (F.lit(4.0) * nd * nd))
    denom = F.lit(1.0) + F.lit(float(z2)) / nd
    rate = F.expr("(2000000 * k + n - pmod(2000000 * k + n, 2 * n))"
                  " div (2 * n)").cast("double") / F.lit(1e6)
    return per.select(
        *group_cols, "n", "k", rate.alias("rate"),
        F.round((center - half) / denom, 6).alias("ci_lo"),
        F.round((center + half) / denom, 6).alias("ci_hi"))


def entropy_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy profile of categorical columns — the
    one-number answer to "how concentrated is this column?" that a
    mixture designer reads next to the Lorenz/Gini concentration
    (``source_concentration``): H = −Σ p·ln p in nats, plus the
    [0,1]-normalized H/ln(k) that compares columns with different
    cardinalities.

    EXACT counts; each value's term ``−(c/T)·ln(c/T)`` is one fixed
    double tree over exact BIGINTs rounded to the 1e-9 grid (terms are
    ≥ 0), summed as exact integers over the value dim; the normalized
    form is one more double division rounded to 6dp (NULL for
    single-valued columns — ln(1) = 0).

    Shape at 100 TB: the columns unpivot via ``stack`` (k× the scan,
    map-only) into ONE map-side-combined groupBy((column, value));
    everything after runs on the value dim.  NULLs count as a real
    category.
    """
    from pyspark.sql import Window
    k = len(cols)
    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    un = df.selectExpr(f"stack({k}, {pairs}) AS (col, val)")
    per_v = (un.groupBy("col", "val")
             .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    wt = Window.partitionBy("col")    # value dim per column
    per_v = (per_v.withColumn("__t", F.sum("__c").over(wt))
             .withColumn("__k", F.count(F.lit(1)).over(wt)))
    term = -(F.col("__c").cast("double") / F.col("__t").cast("double")) \
        * F.log(F.col("__c").cast("double") / F.col("__t").cast("double"))
    per_v = per_v.withColumn(
        "__nano", F.floor(term * F.lit(1e9) + F.lit(0.5)).cast("long"))
    out = (per_v.groupBy("col")
           .agg(F.max("__t").alias("n_rows"),
                F.max("__k").cast("long").alias("n_distinct"),
                F.sum("__nano").alias("__hn")))
    h = F.col("__hn").cast("double") / F.lit(1e9)
    norm = F.when(F.col("n_distinct") > 1,
                  F.round(h / F.log(F.col("n_distinct").cast("double")),
                          6))
    return out.select(F.col("col").alias("column"), "n_rows",
                      "n_distinct", h.alias("entropy_nats"),
                      norm.alias("normalized_entropy"))


def calibration_curve(df: DataFrame, score_col: str,
                      label_col: str | Column,
                      n_bins: int = 10) -> DataFrame:
    """Reliability-diagram data for a probabilistic score in [0, 1] —
    the per-bin (mean predicted, observed frequency) pairs a curation
    pipeline reads before trusting a quality classifier's probabilities
    (the evaluation sibling of :func:`rank_auc`, which checks RANKING;
    this checks CALIBRATION).

    Rows with a score outside [0, 1] are dropped (the probability
    contract); score exactly 1.0 lands in the top bin.  Returns one row
    per non-empty bin: ``bin`` (0-based), ``n``, ``n_pos``,
    ``mean_score``, ``frac_pos``, ``gap`` (= frac_pos − mean_score; the
    signed per-bin calibration error, weighted-summable into ECE).

    EXACT: the bin index is ``floor(score·n_bins)`` on doubles (one
    IEEE expression, identical in both engines); scores quantize ONCE
    to integer nanos (the hot-path idiom), so ``mean_score`` is an
    exact round-half-up integer division, and ``frac_pos`` an exact
    integer micro-division; ``gap`` is one fixed double tree over the
    two exactly-derived values, rounded to 6dp.

    Shape at 100 TB: ONE map-side-combined groupBy on ≤ n_bins keys —
    the full-reduction aggregate; everything after runs on the bin dim.
    """
    lab = (F.col(label_col) if isinstance(label_col, str)
           else label_col).cast("long")
    s = F.col(score_col)
    b = F.least(F.floor(s * F.lit(float(n_bins))).cast("long"),
                F.lit(int(n_bins) - 1))
    nanos = F.floor(s * F.lit(1e9) + F.lit(0.5)).cast("long")
    per = (df.filter((s >= 0.0) & (s <= 1.0))
           .select(b.alias("bin"), nanos.alias("__sn"),
                   lab.alias("__l"))
           .groupBy("bin")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__l").cast("long").alias("n_pos"),
                F.sum(F.col("__sn").cast("decimal(38,0)"))
                .alias("__ssn")))
    mean_nanos = F.expr("(2 * __ssn + n) div (2 * CAST(n AS "
                        "DECIMAL(38,0)))")
    fp_micros = F.expr("(2000000 * CAST(n_pos AS DECIMAL(38,0)) + n) "
                       "div (2 * CAST(n AS DECIMAL(38,0)))")
    out = (per.withColumn("mean_score",
                          mean_nanos.cast("double") / F.lit(1e9))
           .withColumn("frac_pos",
                       fp_micros.cast("double") / F.lit(1e6)))
    return (out.select("bin", "n", "n_pos", "mean_score", "frac_pos",
                       F.round(F.col("frac_pos") - F.col("mean_score"),
                               6).alias("gap"))
            .orderBy("bin"))


def cohens_kappa(df: DataFrame, rater_a: str | Column,
                 rater_b: str | Column) -> DataFrame:
    """Cohen's kappa between two categorical labelings of the same
    rows — the inter-annotator (or model-vs-model) agreement check a
    labeled-data pipeline runs before pooling annotations.  NULL is a
    real category on both sides.

    Returns ONE row: ``n``, ``n_agree``, ``po`` (observed agreement),
    ``pe`` (chance agreement), ``kappa`` (NULL when pe = 1 — a
    single-category degenerate where kappa is undefined).

    EXACT: the contingency table is integer counts; ``po`` and ``pe``
    come from round-half-up integer cross-multiplies (pe's numerator
    Σ_k row_k·col_k rides DECIMAL(38,0)); ``kappa`` is one fixed double
    tree over the two exactly-derived 6dp values, rounded to 6dp.  The
    pe = 1 guard compares EXACT integers (pe_num = n²), never a double.

    Shape at 100 TB: ONE map-side-combined groupBy on the (a, b) label
    pair dim; marginals and their category-matched product run on that
    tiny dim (two dim-sized groupBys + one dim equi-join).
    """
    a = (F.col(rater_a) if isinstance(rater_a, str) else rater_a)
    b = (F.col(rater_b) if isinstance(rater_b, str) else rater_b)
    joint = (df.select(
        F.coalesce(a.cast("string"), F.lit("__null__")).alias("__a"),
        F.coalesce(b.cast("string"), F.lit("__null__")).alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    ra = joint.groupBy("__a").agg(F.sum("__c").cast("long").alias("__ra"))
    cb = joint.groupBy("__b").agg(F.sum("__c").cast("long").alias("__cb"))
    pe_num = (ra.join(cb, ra["__a"] == cb["__b"])
              .agg(F.coalesce(
                  F.sum(F.col("__ra").cast("decimal(19,0)")
                        * F.col("__cb").cast("decimal(19,0)")),
                  F.lit(0).cast("decimal(38,0)")).alias("__pe_num")))
    tot = joint.agg(
        F.sum("__c").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
              .otherwise(F.lit(0))).cast("long").alias("n_agree"))
    j = tot.crossJoin(pe_num)   # two 1-row aggregates
    po_micros = F.expr("(2000000 * CAST(n_agree AS DECIMAL(38,0)) + n) "
                       "div (2 * CAST(n AS DECIMAL(38,0)))")
    n2 = "CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0))"
    pe_micros = F.expr(f"(2000000 * __pe_num + {n2}) "
                       f"div (2 * CAST(({n2}) AS DECIMAL(38,0)))")
    j = (j.withColumn("po", po_micros.cast("double") / F.lit(1e6))
         .withColumn("pe", pe_micros.cast("double") / F.lit(1e6))
         .withColumn("__degenerate",
                     F.expr(f"__pe_num = {n2}")))
    kappa = F.when(~F.col("__degenerate"),
                   F.round((F.col("po") - F.col("pe"))
                           / (F.lit(1.0) - F.col("pe")), 6))
    return j.select("n", "n_agree", "po", "pe", kappa.alias("kappa"))


def cumulative_gains(df: DataFrame, score_col: str,
                     label_col: str | Column, tie_col: str,
                     n_buckets: int = 10) -> DataFrame:
    """Cumulative-gains / lift table: rank rows by score DESCENDING,
    cut into ``n_buckets`` equal-count buckets, and report how much of
    the total positive mass the top buckets capture — the
    model-triage curve ("the top decile holds 43% of the duplicates")
    a pipeline reads to budget manual review or expensive reprocessing.

    Returns one row per non-empty bucket (1 = top scores): ``bucket``,
    ``n``, ``n_pos``, ``cum_n``, ``cum_pos``, ``gain``
    (= cum_pos/total_pos), ``lift`` (= gain / (cum_n/N)).

    EXACT: the rank is the deterministic BIGINT (score, tie) rank of
    the q108 idiom (ascending; the bucket maps from the top via
    ``((N − r)·n_buckets) div N + 1``, pure integer); gains and lift
    are round-half-up integer micro-divisions (lift's cross-multiply
    rides DECIMAL(38,0)).  NULL gain/lift when there are no positives.

    Shape at 100 TB: one range-partitioned rank pass (no global-sort
    task), one groupBy on ≤ n_buckets keys, cumulative sums on the
    bucket dim.
    """
    from pyspark.sql import Window
    lab = (F.col(label_col) if isinstance(label_col, str)
           else label_col).cast("long")
    base = (df.select(F.col(score_col).alias("__v"),
                      lab.alias("__l"), F.col(tie_col).alias("__t"))
            .withColumn("__ord", F.struct(F.col("__v").alias("v"),
                                          F.col("__t").alias("i")))
            .withColumn("__one", F.lit(1).cast("long")))
    ranked = ranged_cumsum(base, "__ord", "__one", cum_col="__r",
                           total_col="__tot")
    per = (ranked
           .withColumn("bucket", F.expr(
               f"((__tot - __r) * {int(n_buckets)}) div __tot + 1"))
           .groupBy("bucket")
           .agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("__l").cast("long").alias("n_pos")))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)   # bucket dim
    wt = Window.partitionBy()
    per = (per.withColumn("cum_n", F.sum("n").over(w).cast("long"))
           .withColumn("cum_pos", F.sum("n_pos").over(w).cast("long"))
           .withColumn("__tp", F.sum("n_pos").over(wt).cast("long"))
           .withColumn("__tn", F.sum("n").over(wt).cast("long")))
    gain_micros = F.expr("(2000000 * CAST(cum_pos AS DECIMAL(38,0)) "
                         "+ __tp) div (2 * CAST(__tp AS DECIMAL(38,0)))")
    lift_micros = F.expr(
        "(2000000 * CAST(cum_pos AS DECIMAL(19,0)) "
        "* CAST(__tn AS DECIMAL(19,0)) "
        "+ CAST(cum_n AS DECIMAL(19,0)) * CAST(__tp AS DECIMAL(19,0))) "
        "div (2 * CAST(cum_n AS DECIMAL(19,0)) "
        "* CAST(__tp AS DECIMAL(19,0)))")
    pos = F.col("__tp") > 0
    return (per.select(
        "bucket", "n", "n_pos", "cum_n", "cum_pos",
        F.when(pos, gain_micros.cast("double") / F.lit(1e6))
        .alias("gain"),
        F.when(pos, lift_micros.cast("double") / F.lit(1e6))
        .alias("lift"))
        .orderBy("bucket"))


def mutual_information(df: DataFrame, col_a: str | Column,
                       col_b: str | Column) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    both marginal entropies and the normalized MI — the leakage /
    redundancy audit a feature or labeling pipeline runs ("does
    `source` give away `label`?").  NULL is a real category.

    Returns ONE row: ``n``, ``h_a``, ``h_b`` (marginal entropies),
    ``mi_nats``, ``nmi`` (= MI/√(H(A)·H(B)), 6dp; NULL when either
    marginal entropy is 0 — a constant column carries no information
    to normalize by).

    EXACT: counts are integers end-to-end; every transcendental term
    — the joint's ``(c/n)·ln(c·n/(r_a·c_b))`` and the marginals'
    ``−(c/n)·ln(c/n)`` — is ONE fixed IEEE double tree over exact
    BIGINTs, quantized to the 1e-9 grid (``floor(x·1e9 + 0.5)`` —
    pure double ops, engine-identical, sign-safe) and summed as exact
    integers.  The H = 0 guard compares the exact integer nano sum,
    never a rounded double.

    Shape at 100 TB: ONE map-side-combined groupBy on the (a, b) pair
    dim; marginals derive from that dim (two dim groupBys) and join
    back broadcast — the fact table shuffles exactly once.
    """
    a = (F.col(col_a) if isinstance(col_a, str) else col_a)
    b = (F.col(col_b) if isinstance(col_b, str) else col_b)
    joint = (df.select(
        F.coalesce(a.cast("string"), F.lit("__null__")).alias("__a"),
        F.coalesce(b.cast("string"), F.lit("__null__")).alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    ra = joint.groupBy("__a").agg(F.sum("__c").cast("long").alias("__ra"))
    cb = joint.groupBy("__b").agg(F.sum("__c").cast("long").alias("__cb"))

    def _h(dim: DataFrame, cnt: str, out: str) -> DataFrame:
        from pyspark.sql import Window
        wt = Window.partitionBy()
        d = dim.withColumn("__n", F.sum(cnt).over(wt))
        term = -(F.col(cnt).cast("double") / F.col("__n").cast("double")) \
            * F.log(F.col(cnt).cast("double") / F.col("__n").cast("double"))
        d = d.withColumn("__hn", F.floor(term * F.lit(1e9) + F.lit(0.5))
                         .cast("long"))
        return d.agg(F.sum("__hn").alias(out),
                     F.max("__n").cast("long").alias(f"{out}_n"))
    ha = _h(ra, "__ra", "__han")
    hb = _h(cb, "__cb", "__hbn")
    j = (joint.join(F.broadcast(ra), "__a")
         .join(F.broadcast(cb), "__b"))
    from pyspark.sql import Window
    wt = Window.partitionBy()
    j = j.withColumn("__n", F.sum("__c").over(wt))
    c, n = F.col("__c").cast("double"), F.col("__n").cast("double")
    term = (c / n) * F.log(
        (c * n) / (F.col("__ra").cast("double")
                   * F.col("__cb").cast("double")))
    j = j.withColumn("__min", F.floor(term * F.lit(1e9) + F.lit(0.5))
                     .cast("long"))
    mi = j.agg(F.sum("__min").alias("__min_sum"),
               F.max("__n").cast("long").alias("n"))
    out = mi.crossJoin(ha).crossJoin(hb)   # three 1-row aggregates
    h_a = F.col("__han").cast("double") / F.lit(1e9)
    h_b = F.col("__hbn").cast("double") / F.lit(1e9)
    mi_nats = F.col("__min_sum").cast("double") / F.lit(1e9)
    nmi = F.when((F.col("__han") > 0) & (F.col("__hbn") > 0),
                 F.round(mi_nats / F.sqrt(h_a * h_b), 6))
    return out.select("n", h_a.alias("h_a"), h_b.alias("h_b"),
                      mi_nats.alias("mi_nats"), nmi.alias("nmi"))
