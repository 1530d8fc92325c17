"""Data-quality profiling operators: functional-dependency audit,
referential-integrity audit, Benford first-digit profile.

The reference engine has no data-quality layer (its QC is physics-
specific — SNR/visibility masks, P-family filters); these are the
schema-level checks a 100 TB lakehouse ingest wants before training
pipelines consume a drop.  Everything is exact integer counting —
groupBy / anti-join shapes that scale with the fact tables they audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_violations(df: DataFrame, lhs_cols: list[str],
                  rhs_cols: list[str]) -> DataFrame:
    """Functional-dependency audit: the LHS keys that map to MORE THAN
    ONE distinct RHS tuple — i.e. witnesses that ``lhs → rhs`` does
    NOT hold.  Output: one row per violating LHS with its row count
    and distinct-RHS count (exact BIGINTs).

    ONE groupBy on the LHS; the distinct-RHS count is the built-in
    two-stage exact count-distinct (partial dedup before the
    exchange).  Skewed hot keys are AQE territory; no joins, no
    windows, no collect.
    """
    rhs = (F.countDistinct(*[F.col(c) for c in rhs_cols])
           .cast("long").alias("n_rhs"))
    return (df.groupBy(*lhs_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"), rhs)
            .filter(F.col("n_rhs") > 1))


def integrity_audit(relations: list[tuple[str, DataFrame, list[str],
                                          DataFrame, list[str]]]
                    ) -> DataFrame:
    """Referential-integrity audit over FK relations: for each
    ``(name, child, fk_cols, parent, pk_cols)`` emit the child row
    count, NULL-FK count, and orphan count (non-null FK with no parent
    — a LEFT ANTI join on the key).  Output one row per relation.

    Scale shape: each relation is ONE left join of the child onto the
    parent's deduped key projection (shuffled on the FK the tables
    already join on elsewhere, or broadcast when the parent is a dim)
    followed by ONE aggregate — null-FK, orphan, and total counts come
    out of the same pass, so the child is scanned once per relation.
    NULL FKs are counted separately because they are not orphans
    under SQL join semantics.  The result is a relation-count-sized
    union of 1-row aggregates.
    """
    outs = []
    for name, child, fk, parent, pk in relations:
        pkeys = parent.select(*[F.col(p).alias(f"__pk{i}")
                                for i, p in enumerate(pk)]).distinct() \
            .withColumn("__hit", F.lit(1))
        cond = None
        for i, f in enumerate(fk):
            c = F.col(f) == F.col(f"__pk{i}")
            cond = c if cond is None else (cond & c)
        anynull = F.col(fk[0]).isNull()
        for c in fk[1:]:
            anynull = anynull | F.col(c).isNull()
        joined = child.join(pkeys, cond, "left")
        outs.append(joined.agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.when(anynull, 1).otherwise(0)).cast("long")
            .alias("n_null_fk"),
            F.sum(F.when((~anynull) & F.col("__hit").isNull(), 1)
                  .otherwise(0)).cast("long").alias("n_orphans"))
            .select(F.lit(name).alias("relation"), "n_child",
                    "n_null_fk", "n_orphans"))
    res = outs[0]
    for other in outs[1:]:
        res = res.unionByName(other)
    return res


def benford_profile(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit profile vs Benford's law (the classic
    fabricated-data screen for financial / measured quantities).

    The digit comes from the INTEGER part's decimal string
    (``regexp_extract('^[1-9]')`` on ``CAST(floor(abs(x)) AS BIGINT)``
    — integer→string is exact on every engine; no log10 in the digit
    path).  Values in (−1, 1) have no leading integer digit and drop
    out.  Per digit: exact count, exact 6dp share via the integer
    round-half division (q83 idiom), and the Benford expectation
    ``log10(1 + 1/d)`` rounded 6dp (a per-dim-row transcendental —
    engine FP noise ~1e-16, far under the 5e-7 boundary; never
    aggregated).  No cross-row double arithmetic anywhere.

    ONE groupBy onto a 9-value key; the total for the share rides a
    window over that 9-row dim (no join back to the fact).
    """
    from pyspark.sql import Window

    digit = F.regexp_extract(
        F.floor(F.abs(F.col(value_col))).cast("long").cast("string"),
        "^[1-9]", 0)
    counts = (df.select(digit.alias("digit"))
              .filter(F.col("digit") != "")
              .groupBy("digit")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    share = F.expr("(2000000*n + __t - pmod(2000000*n + __t, 2*__t))"
                   " div (2*__t)")
    expected = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")),
        6)
    return (counts
            .withColumn("__t", F.sum("n").over(Window.partitionBy()))
            .select("digit", "n",
                    (share.cast("double") / F.lit(1e6)).alias("share"),
                    expected.alias("benford")))


def cadence_gaps(df: DataFrame, key_cols: list[str], ts_col: str,
                 grain_sec: int = 86400) -> DataFrame:
    """Activity-cadence gap audit per series (data-quality family): at
    the chosen grain (days by default), infer each series' modal
    inter-activity gap, derive how many grain slots its span SHOULD
    contain at that cadence, and report the missing count — the
    missing-data profile an ingest health check wants ("this feed
    skipped 12 of its expected 90 days").

    All integer: slots are ``epoch div grain``; the modal gap takes
    the SMALLEST most-frequent delta (the deterministic-mode
    tie-break); expected = ``span div modal + 1``; missing is clamped
    at 0 for series denser than their modal cadence.  Series with a
    single active slot have no deltas and drop out.

    Shape at 100 TB: dedup to (key, slot) with map-side combine, one
    key-ordered window for deltas, one (key, delta) count, one
    deterministic-mode row_number on the per-key delta dim — every
    window is keyed by the series (many small series).
    """
    from pyspark.sql import Window

    slot = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
                  f" div 1000000 div {int(grain_sec)}")
    ks = df.select(*key_cols, slot.alias("__s")).distinct()
    w = Window.partitionBy(*key_cols).orderBy("__s")
    deltas = (ks.withColumn("__d", F.col("__s") - F.lag("__s").over(w))
              .filter(F.col("__d").isNotNull()))
    dc = (deltas.groupBy(*key_cols, "__d")
          .agg(F.count(F.lit(1)).alias("__c")))
    wm = Window.partitionBy(*key_cols).orderBy(F.col("__c").desc(),
                                               F.col("__d").asc())
    modal = (dc.withColumn("__rn", F.row_number().over(wm))
             .filter(F.col("__rn") == 1)
             .select(*key_cols, F.col("__d").alias("modal_gap")))
    spans = ks.groupBy(*key_cols).agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi"),
        F.count(F.lit(1)).cast("long").alias("n_active"))
    out = spans.join(modal, key_cols)
    expected = F.expr("(__hi - __lo) div modal_gap + 1")
    return out.select(
        *key_cols, "n_active", F.col("modal_gap").cast("long"),
        expected.cast("long").alias("n_expected"),
        F.greatest(expected - F.col("n_active"),
                   F.lit(0)).cast("long").alias("n_missing"))
