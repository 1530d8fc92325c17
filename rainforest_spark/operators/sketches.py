"""Cardinality sketches as pure column expressions (no UDF, no JVM
helper): a deterministic HyperLogLog whose registers are exact md5
functions of the values, so the sketch itself — not just its answer —
is reproducible on ANY engine with md5 (the property that makes it
oracle-pairable bit-for-bit, and lets registers live in ordinary
tables).

Why an engine needs it at 100 TB: ``COUNT(DISTINCT user)`` per
(day, country, …) re-shuffles the raw keys for every grouping; an HLL
register table is a few hundred BIGINTs per group, MERGEABLE by
``max`` — which composes with the versioned store's incremental
aggregate maintenance (``("max", rho)`` is an algebraic spec), so the
rollup never rescans history and still answers distinct-count
questions.

Register math: value → md5 hex; the first ``b/4`` hex chars index one
of ``m = 2^b`` registers (portable per-nibble ``instr`` hex→int — the
q110 idiom); the next 8 hex chars are a 32-bit window whose
leading-zero count gives ``rho`` (1..33, 33 = all-zero window).  The
estimator is the classic HLL: ``E = α_m·m²/Σ 2^{−M_j}`` with the
small-range linear-counting correction ``m·ln(m/V)`` when
``E ≤ 2.5m`` and empty registers exist.  ``Σ 2^{−M_j}`` is summed as
EXACT integers scaled by 2^33 (every term ``2^{33−M}`` is a BIGINT),
so the only engine-sensitive op in the whole pipeline is the final
``ln`` — rounded on the 6dp grid like every transcendental in this
repo.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_registers", "hll_estimate", "hll_accuracy_report",
           "HLL_RHO_MAX", "bloom_bits", "bloom_membership",
           "bloom_membership_rowwise", "bloom_fp_report",
           "bloom_bits_slab", "bloom_membership_rowwise_slabs",
           "bloom_slab_params",
           "cms_counters", "cms_point_estimates",
           "cms_accuracy_report", "quantile_buckets",
           "quantile_estimate", "exact_quantiles",
           "quantile_accuracy_report", "kmv_sketch", "kmv_merge",
           "kmv_estimate", "kmv_jaccard", "kmv_overlap_matrix",
           "kmv_accuracy_report", "kmv_novelty_report"]

#: rho of an all-zero 32-bit window (8 hex chars) — the window cap.
HLL_RHO_MAX = 33


def _register_expr(hex_col: str, b: int) -> str:
    """Portable SQL: first b/4 hex chars → integer register index."""
    n_chars = b // 4
    terms = [
        f"CAST(instr('0123456789abcdef', substr({hex_col}, {j + 1}, 1))"
        f" - 1 AS BIGINT) * {16 ** (n_chars - 1 - j)}"
        for j in range(n_chars)]
    return "(" + " + ".join(terms) + ")"


def _rho_exprs(hex_col: str, b: int) -> tuple[str, str]:
    """Portable SQL fragments (z = leading-zero hex chars of the
    32-bit window, rho) — identical text runs on Spark and DuckDB."""
    start = b // 4 + 1
    win = f"substr({hex_col}, {start}, 8)"
    z = f"length(regexp_extract({win}, '^0*', 0))"
    d = f"substr({hex_col}, {start} + {z}, 1)"
    rho = (f"CASE WHEN {z} >= 8 THEN {HLL_RHO_MAX} "
           f"ELSE 4 * {z} + (CASE "
           f"WHEN {d} IN ('8','9','a','b','c','d','e','f') THEN 0 "
           f"WHEN {d} IN ('4','5','6','7') THEN 1 "
           f"WHEN {d} IN ('2','3') THEN 2 ELSE 3 END) + 1 END")
    return z, rho


def hll_registers(df: DataFrame, col: str | Column,
                  group_cols: list[str] | None = None,
                  b: int = 8) -> DataFrame:
    """The register table: ``(group..., register, rho)`` with
    ``rho = max`` over the group's values — ≤ 2^b rows per group.

    MERGEABLE: registers of two row sets combine by ``max(rho)`` per
    (group, register) — union-of-sketches == sketch-of-union exactly,
    which is what makes this safe to maintain incrementally
    (``incremental_agg`` spec ``{"rho": ("max", "rho")}``) or to store
    per partition and fold at query time.

    Shape at 100 TB: one map-side-combined groupBy on
    (group, register) — ≤ m keys per group, partial max per partition;
    NULL values are skipped (COUNT DISTINCT semantics).
    """
    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    d = (df.where(c.isNotNull())
         .select(*g, F.md5(c.cast("string")).alias("__h")))
    reg = F.expr(_register_expr("__h", b))
    _, rho = _rho_exprs("__h", b)
    return (d.select(*g, reg.alias("register"),
                     F.expr(rho).cast("long").alias("__r"))
            .groupBy(*g, "register")
            .agg(F.max("__r").alias("rho")))


def hll_estimate(registers: DataFrame,
                 group_cols: list[str] | None = None,
                 b: int = 8) -> DataFrame:
    """Estimate from a register table: one row per group with ``m``,
    ``v_zero`` (empty registers), ``e_raw`` (the raw HLL estimate) and
    ``estimate`` (small-range-corrected).

    Exactness: ``Σ 2^{−rho}`` is the exact BIGINT ``Σ 2^{33−rho}``
    (plus ``2^33`` per empty register), so ``e_raw`` is one fixed IEEE
    double tree over two exact integers, rounded 6dp; the
    linear-counting branch's ``ln`` rounds on the same 6dp grid; the
    branch condition compares the UNROUNDED e_raw tree against
    ``2.5m`` — identical doubles on both engines.
    """
    g = list(group_cols or [])
    m = 1 << b
    # every literal CAST to DOUBLE explicitly — both engines parse bare
    # decimal literals as DECIMAL and would route the arithmetic
    # through exact-decimal division (the q127/q133 rule)
    alpha = (f"(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) "
             f"+ CAST(1.079 AS DOUBLE) / CAST({m} AS DOUBLE)))")
    agg = (registers.groupBy(*g)
           .agg(F.count(F.lit(1)).cast("long").alias("__nreg"),
                F.sum(F.expr(f"CAST(POW(CAST(2 AS DOUBLE), "
                              f"{HLL_RHO_MAX} - rho) "
                              f"AS BIGINT)")).alias("__s")))
    v = F.lit(m) - F.col("__nreg")
    s_full = (F.col("__s").cast("decimal(38,0)")
              + v.cast("decimal(38,0)")
              * F.lit(1 << HLL_RHO_MAX).cast("decimal(38,0)"))
    e_raw = F.expr(f"{alpha} * CAST({m} AS DOUBLE) "
                   f"* CAST({m} AS DOUBLE) "
                   f"* CAST({1 << HLL_RHO_MAX} AS DOUBLE)") \
        / s_full.cast("double")
    out = (agg.withColumn("v_zero", v.cast("long"))
           .withColumn("__eraw", e_raw))
    est = F.when((F.col("__eraw") <= F.lit(2.5 * m))
                 & (F.col("v_zero") > 0),
                 F.round(F.lit(float(m))
                         * F.log(F.lit(float(m))
                                 / F.col("v_zero").cast("double")), 6)) \
        .otherwise(F.round(F.col("__eraw"), 6))
    return out.select(*g, F.lit(m).cast("long").alias("m"), "v_zero",
                      F.round(F.col("__eraw"), 6).alias("e_raw"),
                      est.alias("estimate"))


def hll_accuracy_report(df: DataFrame, col: str | Column,
                        group_cols: list[str] | None = None,
                        b: int = 8) -> DataFrame:
    """Sketch-accuracy report: the HLL estimate NEXT TO the exact
    distinct count, with the signed relative error — what a pipeline
    owner reads before replacing exact distincts with the sketch at a
    given ``b`` ("±2% at m=256 on this key — good enough for the
    dashboard, not for billing").

    Shape at 100 TB: the sketch side is the ≤m-key register groupBy;
    the exact side is one two-stage count-distinct (the only full
    shuffle, and the thing the sketch exists to replace — this report
    is the one-time calibration run).
    """
    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    est = hll_estimate(hll_registers(df, c, g, b), g, b)
    exact = (df.where(c.isNotNull())
             .groupBy(*g)
             .agg(F.count_distinct(c).cast("long").alias("n_exact")))
    j = (est.join(exact, g) if g else est.crossJoin(exact))
    # + 0.0 normalizes IEEE negative zero (a tiny negative ratio
    # rounds to -0.0 in DuckDB, +0.0 in Spark — the q197 idiom)
    rel = F.round((F.col("estimate") - F.col("n_exact").cast("double"))
                  / F.col("n_exact").cast("double"), 6) + F.lit(0.0)
    return j.select(*g, "m", "v_zero", "n_exact", "e_raw", "estimate",
                    rel.alias("rel_error"))


def _hex_int_expr(hex_col: str, n_chars: int = 8) -> str:
    """Portable SQL: first ``n_chars`` hex chars → BIGINT (per-nibble
    instr — the q110 idiom shared with the HLL register index)."""
    terms = [
        f"CAST(instr('0123456789abcdef', substr({hex_col}, {j + 1}, 1))"
        f" - 1 AS BIGINT) * {16 ** (n_chars - 1 - j)}"
        for j in range(n_chars)]
    return "(" + " + ".join(terms) + ")"


def bloom_bits(df: DataFrame, col: str | Column,
               m_bits: int = 4096, k: int = 4) -> DataFrame:
    """The Bloom bit table: DISTINCT ``(bit,)`` positions set by the
    corpus values — k deterministic md5 positions per value, so the
    filter (like the HLL registers) is an exact function of the value
    set: reproducible on any engine, MERGEABLE by plain
    ``union``+``distinct`` (bits-of-union == union-of-bits), and
    storable as an ordinary ≤m_bits-row table.

    Use case: the "probably already ingested" gate — a broadcastable
    ≤m_bits-row dim that answers membership with zero false negatives
    and a tunable false-positive rate, replacing an anti-join against
    the full corpus on the hot ingest path (run the anti-join only on
    the "maybe" survivors).

    Shape at 100 TB: one explode(k) + distinct on ≤ m_bits keys —
    map-side partial dedup makes the shuffle O(m_bits · partitions).
    A FIXED m_bits saturates past its design corpus (fp → 1): for a
    store that grows without an upfront size estimate, use the
    scalable-slab family (:func:`bloom_bits_slab` /
    :func:`bloom_membership_rowwise_slabs`) instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    d = df.where(c.isNotNull()).select(
        F.md5(c.cast("string")).alias("__v"))
    bits = F.array(*[
        F.expr(_hex_int_expr(f"md5(concat('{s}|', __v))", 8))
        % F.lit(int(m_bits))
        for s in range(k)])
    return (d.select(F.explode(bits).alias("bit")).distinct())


def bloom_membership(bits: DataFrame, probes: DataFrame,
                     col: str | Column, m_bits: int = 4096,
                     k: int = 4) -> DataFrame:
    """Membership check of ``probes[col]`` against a
    :func:`bloom_bits` table: adds ``maybe_present`` (true = all k bit
    positions set — no false negatives; false = DEFINITELY absent).

    Shape at 100 TB: the bit table is ≤ m_bits rows → broadcast; the
    probe side explodes ×k, one broadcast equi-join, one probe-keyed
    min — the probe table never self-shuffles.

    Duplicate probe rows are safe: the per-probe groupBy collapses
    duplicates into one group, and the membership test is
    ``min(hit) == 1`` (every probed bit position set) — NOT a hit-sum
    compared against k, which a duplicated probe row would inflate to
    a multiple of k and mis-read as "absent" (a false negative — the
    one error class the filter contractually never makes; the ingest
    gate this operator feeds sees duplicate rows routinely).
    """
    c = F.col(col) if isinstance(col, str) else col
    keyed = probes.withColumn("__v", F.md5(c.cast("string")))
    bit_arr = F.array(*[
        F.expr(_hex_int_expr(f"md5(concat('{s}|', __v))", 8))
        % F.lit(int(m_bits))
        for s in range(k)])
    ex = keyed.withColumn("__bit", F.explode(bit_arr))
    hit = (ex.join(F.broadcast(bits.withColumnRenamed("bit", "__bit")
                               .withColumn("__hit", F.lit(1))),
                   "__bit", "left")
           .groupBy(*probes.columns)
           .agg((F.min(F.coalesce(F.col("__hit"), F.lit(0)))
                 == F.lit(1)).alias("maybe_present")))
    return hit


def bloom_membership_rowwise(bits: DataFrame, probes: DataFrame,
                             col: str | Column, m_bits: int = 4096,
                             k: int = 4) -> DataFrame:
    """Row-wise membership (same semantics as
    :func:`bloom_membership`, different plan): the k bit probes are k
    BROADCAST left equi-joins and ``maybe_present`` is a per-row AND —
    no aggregation at all, so it runs on STREAMS (a streaming groupBy
    would demand a watermark and hold state; this is the stateless T6
    stream-static shape) and never re-groups the probe table.  Probe
    duplicates and pre-existing columns pass through untouched.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = probes.withColumn("__v", F.md5(c.cast("string")))
    flags = []
    for s in range(int(k)):
        bit = (F.expr(_hex_int_expr(f"md5(concat('{s}|', __v))", 8))
               % F.lit(int(m_bits)))
        dim = F.broadcast(bits.withColumnRenamed("bit", f"__b{s}")
                          .withColumn(f"__hit{s}", F.lit(1)))
        out = (out.withColumn(f"__b{s}", bit)
               .join(dim, f"__b{s}", "left"))
        flags.append(F.coalesce(F.col(f"__hit{s}"), F.lit(0)) == 1)
    pred = flags[0]
    for f_ in flags[1:]:
        pred = pred & f_
    drop = ["__v"] + [f"__b{s}" for s in range(int(k))] \
        + [f"__hit{s}" for s in range(int(k))]
    return out.withColumn("maybe_present", pred).drop(*drop)


def bloom_slab_params(m_bits: int, k: int, slab: int) -> tuple[int, int]:
    """``(m_s, k_s)`` for scalable-Bloom slab ``slab``: sizes DOUBLE
    and one hash is ADDED per slab (``m_s = m_bits·2^s``,
    ``k_s = k + s``), so a slab frozen at ≤50 % occupancy contributes
    fp ≈ ``0.5^(k+s)`` and the total over ANY number of slabs
    telescopes to ``< 2·0.5^k`` (the classic scalable-Bloom bound —
    Almeida et al. 2007) instead of growing linearly with slab count.
    Slab capacity at the 50 % freeze is ``ln2·m_s/k_s`` values — it
    GROWS geometrically, so slab count is O(log corpus)."""
    s = int(slab)
    return int(m_bits) << s, int(k) + s


def _slab_salt(j: int, slab: int) -> str:
    # slab 0 keeps the legacy bloom_bits salt so flat stores upgrade
    # in place (their rows ARE slab 0, bit-identical)
    return f"{j}|" if int(slab) == 0 else f"{j}#{int(slab)}|"


def bloom_bits_slab(df: DataFrame, col: str | Column,
                    m_bits: int = 4096, k: int = 4,
                    slab: int = 0) -> DataFrame:
    """One scalable-Bloom SLAB's bit table: DISTINCT ``(slab, bit)``
    positions set by ``df[col]`` under slab ``slab``'s parameters
    (:func:`bloom_slab_params` — doubled size, one extra hash per
    slab).  Slab 0 is BIT-IDENTICAL to :func:`bloom_bits` (plus the
    slab column), so a legacy flat store upgrades in place: read its
    rows as slab 0 (``coalesce(slab, 0)`` after a mergeSchema read)
    and append new slabs beside them.

    This is what gives the Bloom-gated ingest store a GROWTH POLICY:
    a fixed ``m_bits`` saturates one decade past its design corpus
    (occupancy → 1, fp → 1, the gate silently degrades to the exact
    probe's wall); freezing a slab at ~50 % occupancy and opening the
    next (bigger, one-more-hash) slab keeps total fp ``< 2·0.5^k``
    forever, with no upfront corpus-size estimate.  Union-mergeable
    per slab exactly like :func:`bloom_bits`.

    Shape at 100 TB: one explode(k_s) + distinct on ≤ m_s keys.
    """
    m_s, k_s = bloom_slab_params(m_bits, k, slab)
    c = F.col(col) if isinstance(col, str) else col
    d = df.where(c.isNotNull()).select(
        F.md5(c.cast("string")).alias("__v"))
    bits = F.array(*[
        F.expr(_hex_int_expr(
            f"md5(concat('{_slab_salt(j, slab)}', __v))", 8))
        % F.lit(int(m_s))
        for j in range(k_s)])
    return (d.select(F.explode(bits).alias("bit")).distinct()
            .select(F.lit(int(slab)).cast("int").alias("slab"), "bit"))


def bloom_membership_rowwise_slabs(bits: DataFrame, probes: DataFrame,
                                   col: str | Column,
                                   m_bits: int = 4096, k: int = 4,
                                   slabs: list[int] | None = None
                                   ) -> DataFrame:
    """Row-wise membership against a SLABBED bit store (``(slab,
    bit)`` rows from :func:`bloom_bits_slab`): ``maybe_present`` is
    the OR over slabs of that slab's all-``k_s``-bits-hit AND — zero
    false negatives as long as every committed value's bits live in
    SOME listed slab, which the ingest sink's bits-before-fps commit
    order guarantees.  ``slabs`` is the explicit slab-id list (the
    caller usually knows it from its occupancy bookkeeping); when
    None it is read off the bit table (one tiny action).

    Stream-legal like :func:`bloom_membership_rowwise` (no
    aggregation, probe duplicates pass through); the plan is
    ``Σ k_s`` broadcast left joins of few-KB dims in one codegen
    stage.  An empty slab list marks every probe DEFINITELY new
    (empty store).
    """
    if slabs is None:
        slabs = [int(r["slab"]) for r in
                 bits.select("slab").distinct().collect()]
    slabs = sorted(int(s) for s in slabs)
    c = F.col(col) if isinstance(col, str) else col
    out = probes.withColumn("__v", F.md5(c.cast("string")))
    drop = ["__v"]
    slab_preds = []
    for s in slabs:
        m_s, k_s = bloom_slab_params(m_bits, k, s)
        sb = bits.where(F.col("slab") == s).select("bit")
        flags = []
        for j in range(k_s):
            bcol, hcol = f"__b{s}_{j}", f"__hit{s}_{j}"
            bit = (F.expr(_hex_int_expr(
                f"md5(concat('{_slab_salt(j, s)}', __v))", 8))
                % F.lit(int(m_s)))
            dim = F.broadcast(sb.withColumnRenamed("bit", bcol)
                              .withColumn(hcol, F.lit(1)))
            out = out.withColumn(bcol, bit).join(dim, bcol, "left")
            flags.append(F.coalesce(F.col(hcol), F.lit(0)) == 1)
            drop += [bcol, hcol]
        pred = flags[0]
        for f_ in flags[1:]:
            pred = pred & f_
        slab_preds.append(pred)
    mp = F.lit(False)
    for p in slab_preds:
        mp = mp | p
    return out.withColumn("maybe_present", mp).drop(*drop)


def bloom_membership_rowwise_slabs_bitmap(
        bits: DataFrame, probes: DataFrame, col: str | Column,
        m_bits: int = 4096, k: int = 4,
        slabs: list[int] | None = None,
        max_bitmap_bytes: int = 64 << 20) -> DataFrame:
    """Arrow-kernel variant of :func:`bloom_membership_rowwise_slabs`
    (VERDICT r12 #6): the committed ``(slab, bit)`` rows collect into
    per-slab PACKED numpy bitmaps (``Σ m_s/8`` bytes — KBs at typical
    ``m_bits``), broadcast once per batch (the ``curate_media_stream``
    posture, bound enforced at ``max_bitmap_bytes``), and every probe
    row checks all slabs inside ONE ``mapInPandas`` kernel — zero
    probe joins at any slab count, vs the join route's ``Σ k_s``.
    Output is row-identical to the join route (pinned by
    tests/test_sketches.py parity); null probe values read
    ``maybe_present = false`` on both.

    MEASURED at the r12 forced-growth configuration (m=16384, 3 slabs,
    Σk_s = 27, 10k-doc batches of sf1 documents — PERF.md r13): the
    kernel pays the full-row Arrow round-trip of the document text,
    the join route keeps rows JVM-side; see PERF.md for the verdict
    and when each side wins.  The kernel early-exits per slab on the
    first missing bit, so the expected digest count per NEW row is
    ~1-2 per slab, not ``k_s``.
    """
    import hashlib

    import numpy as np

    spark = probes.sparkSession
    if slabs is None:
        slabs = [int(r["slab"]) for r in
                 bits.select("slab").distinct().collect()]
    params = [(s, *bloom_slab_params(m_bits, k, s))
              for s in sorted(int(s) for s in slabs)]
    total = sum((m_s + 7) // 8 for _, m_s, _ in params)
    if total > int(max_bitmap_bytes):
        raise ValueError(
            f"slab bitmaps need {total} bytes > max_bitmap_bytes="
            f"{max_bitmap_bytes} — use bloom_membership_rowwise_slabs "
            f"(broadcast-join probe) for bit dims this large")
    maps = {}
    for s, m_s, _ in params:
        arr = np.zeros((m_s + 7) // 8, dtype=np.uint8)
        idx = np.array([int(r["bit"]) for r in
                        bits.where(F.col("slab") == s)
                        .select("bit").collect()], dtype=np.int64)
        if len(idx):
            np.bitwise_or.at(arr, idx >> 3,
                             (1 << (idx & 7)).astype(np.uint8))
        maps[s] = arr
    salts = {s: [_slab_salt(j, s) for j in range(k_s)]
             for s, _, k_s in params}
    bc = spark.sparkContext.broadcast((params, salts, maps))
    c = F.col(col) if isinstance(col, str) else col
    src = probes.withColumn("__v", F.md5(c.cast("string")))
    schema = src.drop("__v").withColumn("maybe_present",
                                        F.lit(True)).schema

    def kernel(batches):
        params_, salts_, maps_ = bc.value
        md5 = hashlib.md5
        for pdf in batches:
            flags = []
            for v in pdf["__v"]:
                hit = False
                if isinstance(v, str):   # null probe → False, as joins
                    for s, m_s, _ in params_:
                        arr = maps_[s]
                        ok = True
                        for salt in salts_[s]:
                            b = int(md5((salt + v).encode())
                                    .hexdigest()[:8], 16) % m_s
                            if not (arr[b >> 3] >> (b & 7)) & 1:
                                ok = False
                                break
                        if ok:
                            hit = True
                            break
                flags.append(hit)
            out = pdf.drop(columns=["__v"])
            out["maybe_present"] = flags
            yield out

    return src.mapInPandas(kernel, schema=schema)


def bloom_fp_report(corpus: DataFrame, probes: DataFrame,
                    col: str | Column, m_bits: int = 4096,
                    k: int = 4) -> DataFrame:
    """Bloom calibration: measured false-positive rate of the
    (m_bits, k) filter on ``probes`` against EXACT membership in
    ``corpus`` — plus the textbook expectation ``(1 − e^{−kn/m})^k``
    — the one-time report before trusting the gate on the hot path.

    Returns ONE row: ``m_bits``, ``k``, ``n_corpus`` (distinct),
    ``bits_set``, ``n_probes``, ``n_present``, ``n_absent``,
    ``false_positives``, ``fp_rate`` (6dp micro-division; NULL when
    nothing is absent), ``fp_expected`` (6dp — exp is the only
    transcendental, on the usual grid).

    EXACT: membership truth is a distinct-value left join (no FN by
    construction is asserted, not assumed: a present-but-unflagged
    value would be an engine bug); all counts integer.
    """
    c = F.col(col) if isinstance(col, str) else col
    # the bit table feeds the membership probe AND the bits_set count
    # — lazily localCheckpointed so the corpus explode runs once
    bits = bloom_bits(corpus, c, m_bits, k).localCheckpoint(eager=False)
    pv = probes.where(c.isNotNull()) \
        .select(c.cast("string").alias("__pv")).distinct()
    flagged = bloom_membership(bits, pv, "__pv", m_bits, k)
    truth = (corpus.where(c.isNotNull())
             .select(c.cast("string").alias("__pv")).distinct()
             .withColumn("__in", F.lit(1)))
    j = flagged.join(truth, "__pv", "left") \
        .withColumn("__in", F.coalesce(F.col("__in"), F.lit(0)))
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("__in").cast("long").alias("n_present"),
        F.sum(F.lit(1) - F.col("__in")).cast("long").alias("n_absent"),
        F.sum(F.when((F.col("__in") == 0) & F.col("maybe_present"),
                     F.lit(1)).otherwise(F.lit(0))).cast("long")
        .alias("false_positives"),
        F.sum(F.when((F.col("__in") == 1) & ~F.col("maybe_present"),
                     F.lit(1)).otherwise(F.lit(0))).cast("long")
        .alias("__fn"))
    nb = bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set"))
    nc = (corpus.where(c.isNotNull())
          .agg(F.count_distinct(c.cast("string")).cast("long")
               .alias("n_corpus")))
    out = agg.crossJoin(nb).crossJoin(nc)   # three 1-row aggregates
    fpr = F.expr("CASE WHEN n_absent > 0 THEN "
                 "CAST((2000000 * CAST(false_positives AS DECIMAL(38,0))"
                 " + n_absent - pmod(2000000 * "
                 "CAST(false_positives AS DECIMAL(38,0)) + n_absent, "
                 "2 * CAST(n_absent AS DECIMAL(38,0)))) "
                 "div (2 * CAST(n_absent AS DECIMAL(38,0))) AS DOUBLE) "
                 "/ 1e6 END")
    fpe = F.round(
        F.pow(F.lit(1.0) - F.exp(-(F.lit(float(k))
                                   * F.col("n_corpus").cast("double"))
                                 / F.lit(float(m_bits))),
              F.lit(float(k))), 6)
    return out.select(
        F.lit(int(m_bits)).cast("long").alias("m_bits"),
        F.lit(int(k)).cast("long").alias("k"),
        "n_corpus", "bits_set", "n_probes", "n_present", "n_absent",
        "false_positives", fpr.alias("fp_rate"),
        fpe.alias("fp_expected"),
        (F.col("__fn") == 0).alias("no_false_negatives"))


def cms_counters(df: DataFrame, col: str | Column,
                 width: int = 1024, depth: int = 4,
                 weight_col: str | None = None) -> DataFrame:
    """Count-min sketch counters: ``(row, bucket, c)`` — ``depth``
    hash rows × ``width`` buckets, each counter the exact sum of the
    weights (default 1) of the values hashing into it.  Like the HLL
    registers and Bloom bits, the counters are exact md5 functions of
    the data, so the sketch is engine-reproducible and MERGEABLE by
    ``sum(c)`` per (row, bucket) — sketch-of-union == sum-of-sketches,
    which composes with ``incremental_agg``'s ``("sum", c)`` spec for
    frequency rollups that never rescan history.

    Use case at 100 TB: "how often does each of these 10k terms occur
    per day" without a day×term shuffle of the raw corpus — the
    counter table is depth·width BIGINTs per group, and the point
    estimate ``min_r counter[r][h_r(x)]`` NEVER under-counts
    (one-sided error ≤ ε·N with ε = e/width at the standard depths).

    Shape: one explode(depth) + ONE map-side-combined groupBy on
    ≤ depth·width keys.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    d = df.where(c.isNotNull()).select(
        F.md5(c.cast("string")).alias("__v"), w.alias("__w"))
    rows = F.array(*[
        F.struct(
            F.lit(r).cast("long").alias("row"),
            (F.expr(_hex_int_expr(f"md5(concat('cms{r}|', __v))", 8))
             % F.lit(int(width))).alias("bucket"))
        for r in range(depth)])
    return (d.select(F.explode(rows).alias("rb"), "__w")
            .groupBy(F.col("rb.row").alias("row"),
                     F.col("rb.bucket").alias("bucket"))
            .agg(F.sum("__w").alias("c")))


def cms_point_estimates(counters: DataFrame, queries: DataFrame,
                        col: str | Column, width: int = 1024,
                        depth: int = 4) -> DataFrame:
    """Point frequency estimates for ``queries[col]`` against a
    :func:`cms_counters` table: adds ``est`` (= min over the depth
    counters — never below the true count; missing counters read 0).

    Shape at 100 TB: counters ≤ depth·width rows → broadcast; queries
    explode ×depth, one broadcast equi-join, one query-keyed min.
    """
    c = F.col(col) if isinstance(col, str) else col
    keyed = queries.withColumn("__v", F.md5(c.cast("string")))
    rows = F.array(*[
        F.struct(
            F.lit(r).cast("long").alias("row"),
            (F.expr(_hex_int_expr(f"md5(concat('cms{r}|', __v))", 8))
             % F.lit(int(width))).alias("bucket"))
        for r in range(depth)])
    ex = keyed.withColumn("rb", F.explode(rows)) \
        .select(*queries.columns,
                F.col("rb.row").alias("row"),
                F.col("rb.bucket").alias("bucket"))
    j = ex.join(F.broadcast(counters), ["row", "bucket"], "left")
    return (j.groupBy(*queries.columns)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long")))
                 .alias("est")))


def cms_accuracy_report(df: DataFrame, col: str | Column,
                        width: int = 1024, depth: int = 4,
                        top: int = 20) -> DataFrame:
    """Sketch-accuracy report: for the exact top-``top`` values (by
    count, value as tie-break), the CMS estimate next to the true
    count and the signed overestimate — never negative (the one-sided
    guarantee is ASSERTED by the data, not assumed).

    Shape at 100 TB: the exact side is one value groupBy +
    TakeOrdered(top); the sketch side is the bounded counter table and
    a ``top``-row probe.
    """
    c = F.col(col) if isinstance(col, str) else col
    exact = (df.where(c.isNotNull())
             .groupBy(c.cast("string").alias("value"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
             .orderBy(F.col("n_true").desc(), F.col("value").asc())
             .limit(int(top)))
    counters = cms_counters(df, c, width, depth)
    est = cms_point_estimates(counters, exact, "value", width, depth)
    return (est.select(
        "value", "n_true", "est",
        (F.col("est") - F.col("n_true")).alias("overestimate"))
        .orderBy(F.col("n_true").desc(), F.col("value").asc()))


# ------------------------------------------------------------------
# Mergeable quantile sketch: dyadic value buckets (the base-2 member
# of the DDSketch / HDR-histogram family — Masson, Rim & Lee, "DDSketch:
# a fast and fully-mergeable quantile sketch with relative-error
# guarantees", VLDB 2019).  Like the HLL/Bloom/CMS registers above,
# the buckets are EXACT integer functions of the values (bit-length +
# top-``s`` mantissa bits of the nano-quantized magnitude), so the
# sketch itself is engine-reproducible bit-for-bit and oracle-pairable.
#
# Why an engine needs it at 100 TB: every percentile rollup today pays
# an exact grouped ranged-rank pass over the facts (ranged_cumsum).
# The bucket table is ≤ 2·64·2^(s-1) rows per group — a bounded dim,
# MERGEABLE by ``sum(cnt)`` per (group, bucket), which composes with
# ``incremental_agg``'s ``("sum_long", cnt)`` spec: the p50/p95/p99
# dashboard never rescans history, at a guaranteed relative error of
# 2^-s on the reported value (HDR's mantissa-bits guarantee).
# ------------------------------------------------------------------

#: nano-quantization scale shared by the sketch and its exact oracle.
QUANTILE_SCALE = 1_000_000_000


def _qbucket_exprs(v: str, s_bits: int) -> tuple[str, str]:
    """Portable SQL fragments ``(bucket_key, rep_nanos)`` for a BIGINT
    column named ``v`` (nano-quantized values) — identical text runs on
    Spark and DuckDB, the q194/q195/q196 generated-fragment property.

    Bucket: ``sign · (e·2^s + m)`` with ``e`` the bit length of
    ``|v|`` (``length(bin(|v|))`` — minimal binary in both engines)
    and ``m`` the top ``s`` mantissa bits (per-char ``instr('01', …)``
    parse of the binary prefix — the q110 hex idiom on base 2).
    Values with ``e ≤ s`` keep ``m = |v|`` exactly (small integers are
    loss-free).  The key is strictly monotone in the value, so bucket
    order IS value order and rank walks need no decode.

    Representative: the bucket's magnitude midpoint
    ``m·2^(e−s) + 2^(e−s−1) − 1`` (exact BIGINT; powers of two are
    exact doubles at every exponent, so ``CAST(pow(2, …) AS BIGINT)``
    is engine-safe), signed back.  ``|rep − true| ≤ 2^(e−s−1)`` against
    ``|true| ≥ 2^(e−1)`` gives the 2^-s relative-error guarantee.
    """
    s = int(s_bits)
    sign = f"(CASE WHEN {v} < 0 THEN -1 WHEN {v} = 0 THEN 0 ELSE 1 END)"
    av = f"abs({v})"
    e = f"(CASE WHEN {av} = 0 THEN 0 ELSE length(bin({av})) END)"
    bits = " + ".join(
        f"CAST(instr('01', substr(bin({av}), {j + 1}, 1)) - 1 AS BIGINT)"
        f" * {1 << (s - 1 - j)}" for j in range(s))
    m = f"(CASE WHEN {e} <= {s} THEN {av} ELSE ({bits}) END)"
    p2 = f"CAST(pow(CAST(2 AS DOUBLE), {e} - {s}) AS BIGINT)"
    p2h = f"CAST(pow(CAST(2 AS DOUBLE), {e} - {s} - 1) AS BIGINT)"
    key = f"({sign} * ({e} * {1 << s} + {m}))"
    rep = (f"({sign} * (CASE WHEN {e} <= {s} THEN {av} "
           f"ELSE {m} * {p2} + {p2h} - 1 END))")
    return key, rep


def _nanos(c: Column) -> Column:
    """floor(x·1e9 + 0.5) → BIGINT — the repo's hot-path quantization
    idiom (pure double ops + floor, IEEE-identical across engines)."""
    return F.floor(c.cast("double") * F.lit(1e9) + F.lit(0.5)) \
        .cast("long")


def quantile_buckets(df: DataFrame, col: str | Column,
                     group_cols: list[str] | None = None,
                     s_bits: int = 8,
                     weight_col: str | None = None) -> DataFrame:
    """The quantile-sketch bucket table: ``(group..., bucket_key,
    rep_nanos, cnt)`` — ≤ 2·64·2^(s−1) rows per group (~16k at s=8).

    MERGEABLE: bucket tables of two row sets combine by ``sum(cnt)``
    per (group, bucket_key, rep_nanos) — union-of-sketches ==
    sketch-of-union exactly, so it maintains incrementally
    (``incremental_agg`` spec ``{"cnt": ("sum_long", "cnt")}``) or
    folds per partition/day and merges at query time.

    ``weight_col`` (integer) makes the percentiles WEIGHTED — a row
    with weight w counts as w repeats ("p95 document length weighted
    by token count"); the estimator downstream is unchanged because
    only ``cnt`` semantics shift.

    Values quantize to nanos first (|x| ≲ 9.2e9 fits BIGINT); NULLs
    are skipped.  Non-finite values are DETERMINISTIC but
    engine-specific (Spark's floor saturates ±inf to the extreme
    buckets and sends NaN to the zero bucket) — filter them before an
    oracle-paired use.  Shape at 100 TB: ONE map-side-combined groupBy
    on the bounded bucket dim — no sort, no window, no shuffle of raw
    values beyond the partial-agg exchange.
    """
    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    d = (df.where(c.isNotNull())
         .select(*g, _nanos(c).alias("__n"), w.alias("__w")))
    key, rep = _qbucket_exprs("__n", s_bits)
    return (d.select(*g, F.expr(key).alias("bucket_key"),
                     F.expr(rep).alias("rep_nanos"), "__w")
            .groupBy(*g, "bucket_key", "rep_nanos")
            .agg(F.sum("__w").cast("long").alias("cnt")))


def quantile_estimate(buckets: DataFrame, qs_ppm: list[int],
                      group_cols: list[str] | None = None) -> DataFrame:
    """Quantile estimates from a :func:`quantile_buckets` table: one
    row per (group, q) with ``n`` (total count), ``est_nanos`` (the
    representative of the bucket holding the rank-``⌈q·n⌉`` value —
    type-1 / lower quantile) and ``estimate`` (denanoized, 6dp).

    Quantiles are EXACT integer parts-per-million (``q_ppm``), the
    rank ``(q_ppm·n + 999999) div 1e6`` an exact ceil — no double ever
    lands on a rank boundary.  Because ``bucket_key`` is monotone in
    the value, the answer is ``min(rep_nanos)`` over buckets whose
    cumulative count reaches the rank.

    Shape at 100 TB: the cumulative walk is a window over the BOUNDED
    bucket dim (≤ ~16k rows per group — the few-huge-group window
    hazard does not apply to register tables); ranks broadcast.  The
    bucket table feeds TWO consumers (totals and the cumulative walk),
    so it is lazily localCheckpointed — when ``buckets`` is the
    one-pass sketch of raw data, that pass runs once, not twice.
    """
    g = list(group_cols or [])
    from pyspark.sql import Window
    buckets = buckets.localCheckpoint(eager=False)
    tot = buckets.groupBy(*g).agg(F.sum("cnt").cast("long").alias("n"))
    qarr = F.array(*[F.lit(int(p)).cast("long") for p in qs_ppm])
    ranks = (tot.select(*g, "n", F.explode(qarr).alias("q_ppm"))
             .withColumn("__rk",
                         F.expr("(q_ppm * n + 999999) div 1000000")))
    w = (Window.partitionBy(*g) if g else Window.partitionBy()) \
        .orderBy("bucket_key") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = buckets.withColumn("__cum", F.sum("cnt").over(w))
    j = (cum.join(F.broadcast(ranks), g) if g
         else cum.crossJoin(F.broadcast(ranks)))
    return (j.where(F.col("__cum") >= F.col("__rk"))
            .groupBy(*g, "q_ppm", "n")
            .agg(F.min("rep_nanos").alias("est_nanos"))
            .select(*g, "q_ppm", "n", "est_nanos",
                    F.round(F.col("est_nanos").cast("double")
                            / F.lit(1e9), 6).alias("estimate")))


def exact_quantiles(df: DataFrame, col: str | Column,
                    qs_ppm: list[int],
                    group_cols: list[str] | None = None) -> DataFrame:
    """The EXACT type-1 quantile per (group, q): ``(group..., q_ppm,
    n, exact_nanos)`` — the smallest nano-quantized value whose
    cumulative count reaches rank ``⌈q·n⌉``.

    This is the full ranked pass the bucket sketch replaces: one
    distinct-value groupBy + one grouped ``ranged_cumsum``
    (few-huge-group safe) + a broadcast rank probe.  Kept public so
    the bench can measure sketch-vs-exact on identical definitions.
    """
    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    dv = (df.where(c.isNotNull())
          .select(*g, _nanos(c).alias("__n"))
          .groupBy(*g, "__n")
          .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    from rainforest_spark.operators.windows import ranged_cumsum
    cum = ranged_cumsum(dv, "__n", "__c", cum_col="__cum",
                        group_cols=g or None, total_col="__tot")
    qarr = F.array(*[F.lit(int(p)).cast("long") for p in qs_ppm])
    probe = (cum.select("*", F.explode(qarr).alias("q_ppm"))
             .withColumn("__rk", F.expr(
                 "(q_ppm * __tot + 999999) div 1000000")))
    return (probe.where(F.col("__cum") >= F.col("__rk"))
            .groupBy(*g, "q_ppm")
            .agg(F.min("__tot").alias("n"),
                 F.min("__n").alias("exact_nanos"))
            .select(*g, "q_ppm", "n", "exact_nanos"))


def quantile_accuracy_report(df: DataFrame, col: str | Column,
                             qs_ppm: list[int],
                             group_cols: list[str] | None = None,
                             s_bits: int = 8) -> DataFrame:
    """Sketch-accuracy report (the q192/q194 calibration treatment):
    per (group, q), the bucket-sketch estimate NEXT TO the exact
    type-1 quantile and the signed relative error — guaranteed
    ``|rel_error| ≤ 2^-s_bits`` by construction, measured here so a
    pipeline owner can read "±0.4% at s=8 on this column" before
    replacing the exact ranked pass with the maintained bucket dim.

    Shape at 100 TB: the sketch side is the bounded-bucket groupBy;
    the exact side is ONE grouped ranged-cumsum over distinct values
    (``ranged_cumsum`` — few-huge-group safe) + a broadcast rank probe
    — the full pass the sketch exists to replace; this report is the
    one-time calibration run.
    """
    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    est = quantile_estimate(quantile_buckets(df, c, g, s_bits),
                            qs_ppm, g)
    ex = exact_quantiles(df, c, qs_ppm, g).select(
        *g, "q_ppm", "exact_nanos")
    exact = est.join(ex, [*g, "q_ppm"])
    # + 0.0 normalizes IEEE negative zero: a ratio like -2e-10 rounds
    # to -0.0 in DuckDB but +0.0 in Spark (BigDecimal HALF_UP drops
    # the sign) — adding positive zero maps both to +0.0 exactly and
    # changes no other value (the engine-portability idiom for any
    # rounded signed ratio that can land on zero)
    rel = F.when(
        F.col("exact_nanos") != 0,
        F.round((F.col("est_nanos") - F.col("exact_nanos"))
                .cast("double")
                / F.abs(F.col("exact_nanos")).cast("double"), 6)
        + F.lit(0.0))
    return exact.select(
        *g, "q_ppm", "n", "est_nanos", "exact_nanos", "estimate",
        F.round(F.col("exact_nanos").cast("double") / F.lit(1e9), 6)
        .alias("exact"),
        rel.alias("rel_error"))


# ------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) sketch: the k smallest distinct
# md5 hashes of a value set (Bar-Yossef et al. 2002; Beyer et al.,
# "On synopses for distinct-value estimation under multiset
# operations", SIGMOD 2007).  Like the rest of the family the sketch
# is an EXACT function of the value set (the minimum is
# order-independent and duplicate-blind), so it is engine-reproducible
# bit-for-bit and oracle-pairable; unlike HLL it also supports SET
# OPERATIONS — the k smallest of a union are computable from the two
# sketches alone, which gives distinct-count estimates for unions and
# Jaccard estimates for overlaps ("how much does corpus B add /
# overlap corpus A") WITHOUT touching the raw data again.
# ------------------------------------------------------------------


def kmv_sketch(df: DataFrame, col: str | Column,
               group_cols: list[str] | None = None,
               k: int = 256,
               max_groups: int = 4096) -> DataFrame:
    """The bottom-k table: ``(group..., h)`` — the ``k``
    lexicographically-smallest DISTINCT md5 hex hashes per group
    (md5 hex order == uniform order on [0, 16^32)).

    MERGEABLE: min-k of a union is the min-k of the two sketches'
    union (:func:`kmv_merge`) — so partition/day/source sketches fold
    without rescanning, and the union estimator needs only the
    sketches.

    Shape at 100 TB: ONE ``mapInPandas`` pass keeps a per-group
    bounded partial min-k per Arrow batch (no shuffle of raw values,
    no distinct of the full key set — the thing this sketch exists to
    avoid); the final exact merge ranks the ≤ partitions·k candidate
    rows per group with an ordinary window over that BOUNDED dim.

    "Bounded" is per GROUP: the per-partition accumulator holds
    (groups-seen-in-partition × k) hashes (~150 B each), so the
    operator is sized for LOW-cardinality ``group_cols`` — sources,
    shards, days, splits — not per-user/per-document keys.  The
    bound is ENFORCED: a partition seeing more than ``max_groups``
    distinct keys (default 4096 ≈ 150 MB at k=256) raises loudly
    instead of growing executor memory; for high-cardinality groups
    use an ordinary ``groupBy(key).agg(count_distinct(...))`` — per
    key the exact aggregate IS the bounded plan.
    """
    import pandas as pd

    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    d = df.where(c.isNotNull()).select(
        *g, F.md5(c.cast("string")).alias("h"))
    kk = int(k)
    mg = int(max_groups)
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in d.schema.fields])

    def part(batches):
        import numpy as _np2
        best: dict = {}
        for b in batches:
            if len(b) == 0:
                continue
            # dropna=False: Spark groupBy keeps a NULL-key group, so
            # the sketch must too (pandas' default silently drops it).
            groups = (b.groupby(g, sort=False, dropna=False) if g
                      else [((), b)])
            for gv, sub in groups:
                key = gv if isinstance(gv, tuple) else (gv,)
                # NaN/NaT group keys normalize to None: NaN != NaN
                # would split one logical group across dict entries,
                # and None round-trips to a Spark NULL key.
                key = tuple(None if pd.isna(v) else v for v in key)
                arr = _np2.unique(sub["h"].to_numpy())[:kk]
                cur = best.get(key)
                if cur is not None:
                    arr = _np2.union1d(cur, arr)[:kk]
                elif len(best) >= mg:
                    raise ValueError(
                        f"kmv_sketch: partition saw more than "
                        f"max_groups={mg} distinct group keys — the "
                        f"per-partition accumulator is groups×k "
                        f"hashes, so the sketch is for low-"
                        f"cardinality groups (sources/shards/days).  "
                        f"For high-cardinality keys use groupBy + "
                        f"count_distinct, or raise max_groups "
                        f"deliberately.")
                best[key] = arr
        for key, arr in best.items():
            out = {name: [v] * len(arr)
                   for name, v in zip(g, key)}
            out["h"] = arr
            yield pd.DataFrame(out)

    cand = d.mapInPandas(part, schema).distinct()
    from pyspark.sql import Window
    w = Window.partitionBy(*g).orderBy("h")
    return (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= kk).drop("__rn"))


def kmv_merge(a: DataFrame, b: DataFrame,
              group_cols: list[str] | None = None,
              k: int = 256) -> DataFrame:
    """min-k of two sketches' union == sketch of the unioned data —
    the fold used for incremental maintenance and the union half of
    the set-operation estimators.  Bounded input (2k per group)."""
    g = list(group_cols or [])
    from pyspark.sql import Window
    u = a.unionByName(b).distinct()
    w = Window.partitionBy(*g).orderBy("h")
    return (u.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= int(k)).drop("__rn"))


def kmv_estimate(sketch: DataFrame,
                 group_cols: list[str] | None = None,
                 k: int = 256) -> DataFrame:
    """Distinct-count estimate per group: ``n_hashes`` (sketch size)
    and ``estimate`` — EXACT ``n_hashes`` when the group never filled
    the sketch (every distinct value's hash is present), else the
    classic unbiased KMV ``(k−1)/U_k`` with ``U_k`` the k-th smallest
    hash as an exact 48-bit fraction (per-nibble instr hex→int over
    the first 12 chars — identical text both engines; the only double
    op is one division, rounded 6dp).
    """
    g = list(group_cols or [])
    kk = int(k)
    agg = (sketch.groupBy(*g)
           .agg(F.count(F.lit(1)).cast("long").alias("n_hashes"),
                F.max("h").alias("__hk")))
    u48 = F.expr(_hex_int_expr("__hk", 12))
    est = F.when(F.col("n_hashes") < kk,
                 F.col("n_hashes").cast("double")) \
        .otherwise(F.when(
            u48 > 0,
            F.round(F.lit(float(kk - 1))
                    / (u48.cast("double")
                       / F.lit(float(16 ** 12))), 6)))
    return agg.select(*g, F.lit(kk).cast("long").alias("k"),
                      "n_hashes", est.alias("estimate"))


def kmv_jaccard(sketch_a: DataFrame, sketch_b: DataFrame,
                k: int = 256) -> DataFrame:
    """Jaccard estimate between two (ungrouped) sketches: rank the
    distinct union of the two hash sets, keep the ``k`` smallest (the
    union's own KMV — computable from sketches alone), and count how
    many live in BOTH sketches: ``J ≈ n_both / n_union_topk`` (Beyer
    et al. 2007).  One row: ``k, n_union_topk, n_both, jaccard`` —
    exact integers + one rounded division.

    Shape: both inputs are ≤k-row dims; everything broadcasts.  Each
    sketch feeds THREE consumers (the union and two semi-probes), so
    both are lazily localCheckpointed — the partial-min-k pass over
    the raw data runs once, not three times (the textrank posture:
    no job at construction, blocks GC-reclaimed, plan stays lazy).
    """
    kk = int(k)
    sa = sketch_a.select("h").localCheckpoint(eager=False)
    sb = sketch_b.select("h").localCheckpoint(eager=False)
    u = (sa.unionByName(sb)
         .distinct().orderBy("h").limit(kk))
    both = (u.join(F.broadcast(sa), "h", "semi")
            .join(F.broadcast(sb), "h", "semi"))
    nu = u.agg(F.count(F.lit(1)).cast("long").alias("n_union_topk"))
    nb = both.agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    j = nu.crossJoin(nb)   # two 1-row aggregates
    return j.select(
        F.lit(kk).cast("long").alias("k"), "n_union_topk", "n_both",
        F.when(F.col("n_union_topk") > 0,
               F.round(F.col("n_both").cast("double")
                       / F.col("n_union_topk").cast("double"), 6))
        .alias("jaccard"))


def kmv_accuracy_report(df: DataFrame, col: str | Column,
                        group_cols: list[str] | None = None,
                        k: int = 256) -> DataFrame:
    """Calibration: the KMV estimate next to the exact distinct count
    with the signed relative error (expected σ ≈ 1/√(k−2)) — read
    before replacing exact per-group distincts or overlap audits with
    the sketch.  The exact side is the one full count-distinct pass
    the sketch replaces."""
    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    est = kmv_estimate(kmv_sketch(df, c, g, k), g, k)
    exact = (df.where(c.isNotNull())
             .groupBy(*g)
             .agg(F.count_distinct(c).cast("long").alias("n_exact")))
    j = (est.join(exact, g) if g else est.crossJoin(exact))
    rel = F.round((F.col("estimate") - F.col("n_exact").cast("double"))
                  / F.col("n_exact").cast("double"), 6) + F.lit(0.0)
    return j.select(*g, "k", "n_hashes", "n_exact", "estimate",
                    rel.alias("rel_error"))


def kmv_difference(sketch_a: DataFrame, sketch_b: DataFrame,
                   k: int = 256) -> DataFrame:
    """Set-DIFFERENCE estimator from two (ungrouped) bottom-k
    sketches alone: "how many NEW distinct values does corpus B add
    to A" (|B∖A|) — the question an ingest decision actually asks —
    plus the union cardinality and the novelty rate, with NO pass
    over raw data (Beyer et al., SIGMOD 2007 multiset machinery).

    Estimator: the union's own bottom-K (K = min(k, distinct sketch
    hashes)) is a uniform sample of the union's distinct values; any
    sampled hash belonging to set X is PROVABLY present in X's sketch
    (it has < k smaller hashes anywhere), so per-hash membership is
    exact.  ``union_est`` is the classic (K−1)/U_K (exact count when
    the union never filled — both sketches then hold their complete
    hash sets); ``added_est = n_b_only/K · union_est``.

    One row: ``k, n_union_topk, n_both, n_a_only, n_b_only,
    union_est, added_est, novelty_rate`` — exact integers plus
    rounded divisions/products spelled identically in both engines
    (the q198 idiom; in the unfilled case ``added_est`` IS the exact
    |B∖A|).

    Shape: both inputs are ≤k-row dims; everything broadcasts.  Each
    sketch feeds two consumers (the union build and its membership
    probe), so both are lazily localCheckpointed — the partial-min-k
    pass over raw data runs once per side.

    PRECONDITION: both sketches must have been built with a bottom-k
    parameter ≥ this function's ``k`` — the membership-decidability
    lemma ("a union-bottom-K hash has < K smaller hashes anywhere, so
    if its value is in X it is in X's bottom-k") only holds when each
    side kept at least K minima.  Sketches built with a SMALLER k
    silently bias ``n_*_only`` upward (absences stop being proof).
    The row counts of a lazy sketch plan are unknowable here, so the
    precondition is documented, not checked — every in-repo caller
    passes the construction k through.
    """
    kk = int(k)
    sa = sketch_a.select("h").localCheckpoint(eager=False)
    sb = sketch_b.select("h").localCheckpoint(eager=False)
    u = (sa.unionByName(sb)
         .distinct().orderBy("h").limit(kk))
    t = (u.join(F.broadcast(sa.withColumn("__a", F.lit(1))),
                "h", "left")
         .join(F.broadcast(sb.withColumn("__b", F.lit(1))),
               "h", "left"))
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_topk"),
        F.max("h").alias("__hk"),
        F.sum(F.when(F.col("__a").isNotNull()
                     & F.col("__b").isNotNull(), 1).otherwise(0))
        .cast("long").alias("n_both"),
        F.sum(F.when(F.col("__a").isNotNull()
                     & F.col("__b").isNull(), 1).otherwise(0))
        .cast("long").alias("n_a_only"),
        F.sum(F.when(F.col("__a").isNull(), 1).otherwise(0))
        .cast("long").alias("n_b_only"))
    u48 = F.expr(_hex_int_expr("__hk", 12))
    union_est = F.when(F.col("n_union_topk") < kk,
                       F.col("n_union_topk").cast("double")) \
        .otherwise(F.when(
            u48 > 0,
            F.round(F.lit(float(kk - 1))
                    / (u48.cast("double")
                       / F.lit(float(16 ** 12))), 6)))
    e = agg.withColumn("union_est", union_est)
    added = F.when(F.col("n_union_topk") < kk,
                   F.col("n_b_only").cast("double")) \
        .otherwise(F.when(
            F.col("n_union_topk") > 0,
            F.round(F.col("n_b_only").cast("double")
                    / F.col("n_union_topk").cast("double")
                    * F.col("union_est"), 6)))
    rate = F.when(F.col("n_union_topk") > 0,
                  F.round(F.col("n_b_only").cast("double")
                          / F.col("n_union_topk").cast("double"), 6))
    return e.select(
        F.lit(kk).cast("long").alias("k"), "n_union_topk", "n_both",
        "n_a_only", "n_b_only", "union_est",
        added.alias("added_est"), rate.alias("novelty_rate"))


def kmv_sketch_weighted(df: DataFrame, col: str | Column,
                        group_cols: list[str] | None = None,
                        k: int = 256,
                        weight_col: str | None = None,
                        max_groups: int = 4096) -> DataFrame:
    """Weighted bottom-k: ``(group..., h, w)`` — the k smallest
    distinct md5 hashes per group, each carrying the EXACT BIGINT
    total weight of its value's rows (``weight_col``, default 1 per
    row — i.e. the value's multiplicity).  The multiset synopsis of
    Beyer et al. 2007: a uniform distinct-value sample with exact
    per-value counters, so it answers "how many ROWS/bytes do the
    values of this subset carry", not just "how many values".

    Exactness of the counters: a hash in the global bottom-k has
    < k smaller hashes ANYWHERE, so no partition's local prune can
    evict it — every partition's partial weight for it survives to
    the final ``sum``.  Weights must be integral (cast to BIGINT) so
    partial sums are order-independent.

    MERGEABLE: concat the sketches, ``sum(w)`` per (group, h) —
    partial weights of the same value add — then re-rank to bottom-k
    (:func:`kmv_merge_weighted`).

    Shape at 100 TB: same as :func:`kmv_sketch` — ONE mapInPandas
    pass with a bounded per-group min-k + weight accumulator per
    Arrow batch (no raw-value shuffle); the final groupBy + rank runs
    over the ≤ partitions·k candidate dim.  As there, "bounded" is
    per GROUP — the accumulator holds groups×k entries per partition,
    sized for low-cardinality ``group_cols`` and ENFORCED at
    ``max_groups`` distinct keys per partition (loud ValueError, not
    silent executor-memory growth).
    """
    import pandas as pd

    g = list(group_cols or [])
    c = F.col(col) if isinstance(col, str) else col
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    d = df.where(c.isNotNull()).select(
        *g, F.md5(c.cast("string")).alias("h"), w.alias("w"))
    kk = int(k)
    mg = int(max_groups)
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}"
         for f in d.schema.fields])

    def part(batches):
        best: dict = {}
        for b in batches:
            if len(b) == 0:
                continue
            groups = (b.groupby(g, sort=False, dropna=False) if g
                      else [((), b)])
            for gv, sub in groups:
                key = gv if isinstance(gv, tuple) else (gv,)
                key = tuple(None if pd.isna(v) else v for v in key)
                hw = sub.groupby("h", sort=False)["w"].sum()
                cur = best.get(key)
                if cur is not None:
                    hw = pd.concat([cur, hw]).groupby(level=0).sum()
                elif len(best) >= mg:
                    raise ValueError(
                        f"kmv_sketch_weighted: partition saw more "
                        f"than max_groups={mg} distinct group keys — "
                        f"the per-partition accumulator is groups×k "
                        f"entries, so the sketch is for low-"
                        f"cardinality groups (sources/shards/days).  "
                        f"For high-cardinality keys use groupBy + "
                        f"exact aggregates, or raise max_groups "
                        f"deliberately.")
                # prune to the local bottom-k: an evicted hash has
                # >= k smaller hashes in this partition, so it cannot
                # be in the global bottom-k — dropping its partial
                # weight is safe
                best[key] = hw.sort_index().iloc[:kk]
        for key, hw in best.items():
            out = {name: [v] * len(hw)
                   for name, v in zip(g, key)}
            out["h"] = hw.index.to_numpy()
            out["w"] = hw.to_numpy("int64")
            yield pd.DataFrame(out)

    cand = (d.mapInPandas(part, schema)
            .groupBy(*g, "h")
            .agg(F.sum("w").cast("long").alias("w")))
    from pyspark.sql import Window
    wnd = Window.partitionBy(*g).orderBy("h")
    return (cand.withColumn("__rn", F.row_number().over(wnd))
            .where(F.col("__rn") <= kk).drop("__rn"))


def kmv_merge_weighted(a: DataFrame, b: DataFrame,
                       group_cols: list[str] | None = None,
                       k: int = 256) -> DataFrame:
    """Fold two weighted sketches: partial weights of the same value
    ADD (disjoint row sets of one dataset), then re-rank to bottom-k.
    ``merge(sketch(X), sketch(Y)) == sketch(X ∪ Y)`` exactly when X
    and Y partition the rows.  Bounded input (2k rows per group)."""
    g = list(group_cols or [])
    from pyspark.sql import Window
    u = (a.unionByName(b)
         .groupBy(*g, "h")
         .agg(F.sum("w").cast("long").alias("w")))
    wnd = Window.partitionBy(*g).orderBy("h")
    return (u.withColumn("__rn", F.row_number().over(wnd))
            .where(F.col("__rn") <= int(k)).drop("__rn"))


def kmv_weighted_estimate(sketch: DataFrame,
                          group_cols: list[str] | None = None,
                          k: int = 256) -> DataFrame:
    """Total-weight estimate per group from a weighted bottom-k
    sketch: ``w_est ≈ D̂ · (Σ sketch weights / n_hashes)`` — the
    sampled mean weight scaled by the distinct-count estimate (Beyer
    et al. 2007).  EXACT (``Σ w`` as a plain double of a BIGINT) when
    the group never filled the sketch; the distinct estimate is the
    same (k−1)/U_k as :func:`kmv_estimate`.

    Columns: ``group..., k, n_hashes, w_sketch, d_est, w_est``.
    """
    g = list(group_cols or [])
    kk = int(k)
    agg = (sketch.groupBy(*g)
           .agg(F.count(F.lit(1)).cast("long").alias("n_hashes"),
                F.sum("w").cast("long").alias("w_sketch"),
                F.max("h").alias("__hk")))
    u48 = F.expr(_hex_int_expr("__hk", 12))
    d_est = F.when(F.col("n_hashes") < kk,
                   F.col("n_hashes").cast("double")) \
        .otherwise(F.when(
            u48 > 0,
            F.round(F.lit(float(kk - 1))
                    / (u48.cast("double")
                       / F.lit(float(16 ** 12))), 6)))
    e = agg.withColumn("d_est", d_est)
    w_est = F.when(F.col("n_hashes") < kk,
                   F.col("w_sketch").cast("double")) \
        .otherwise(F.when(
            F.col("n_hashes") > 0,
            F.round(F.col("w_sketch").cast("double")
                    / F.col("n_hashes").cast("double")
                    * F.col("d_est"), 6)))
    return e.select(*g, F.lit(kk).cast("long").alias("k"),
                    "n_hashes", "w_sketch", "d_est",
                    w_est.alias("w_est"))


def kmv_added_weight(sketch_a: DataFrame, wsketch_b: DataFrame,
                     k: int = 256) -> DataFrame:
    """How many ROWS (occurrences, bytes, …) does corpus B add — the
    total WEIGHT of B's values NOT in A, estimated from A's plain
    sketch and B's weighted sketch alone: the union bottom-K samples
    the union's distinct values uniformly; each sampled B-only value
    carries its exact B-weight (provably present in B's sketch), so
    ``added_w_est = union_est · (Σ w over sampled B-only) / K``.
    EXACT when the union never filled.  The ingest-volume half of
    :func:`kmv_difference` (which counts distinct values).

    One row: ``k, n_union_topk, n_b_only, w_b_only, union_est,
    added_w_est``.  Shape: ≤k-row dims only; everything broadcasts.

    PRECONDITION (as :func:`kmv_difference`): both sketches must have
    been built with bottom-k ≥ this ``k``, or membership stops being
    decidable and the B-only counts/weights bias upward.  Documented,
    not checked — lazy sketch sizes are unknowable here.
    """
    kk = int(k)
    sa = sketch_a.select("h").localCheckpoint(eager=False)
    sb = wsketch_b.select("h", "w").localCheckpoint(eager=False)
    u = (sa.unionByName(sb.select("h"))
         .distinct().orderBy("h").limit(kk))
    t = (u.join(F.broadcast(sa.withColumn("__a", F.lit(1))),
                "h", "left")
         .join(F.broadcast(sb), "h", "left"))
    agg = t.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_topk"),
        F.max("h").alias("__hk"),
        F.sum(F.when(F.col("__a").isNull(), 1).otherwise(0))
        .cast("long").alias("n_b_only"),
        F.sum(F.when(F.col("__a").isNull(), F.col("w")).otherwise(0))
        .cast("long").alias("w_b_only"))
    u48 = F.expr(_hex_int_expr("__hk", 12))
    union_est = F.when(F.col("n_union_topk") < kk,
                       F.col("n_union_topk").cast("double")) \
        .otherwise(F.when(
            u48 > 0,
            F.round(F.lit(float(kk - 1))
                    / (u48.cast("double")
                       / F.lit(float(16 ** 12))), 6)))
    e = agg.withColumn("union_est", union_est)
    added_w = F.when(F.col("n_union_topk") < kk,
                     F.col("w_b_only").cast("double")) \
        .otherwise(F.when(
            F.col("n_union_topk") > 0,
            F.round(F.col("w_b_only").cast("double")
                    / F.col("n_union_topk").cast("double")
                    * F.col("union_est"), 6)))
    return e.select(
        F.lit(kk).cast("long").alias("k"), "n_union_topk",
        "n_b_only", "w_b_only", "union_est",
        added_w.alias("added_w_est"))


def kmv_overlap_matrix(sketch: DataFrame, group_col: str,
                       k: int = 256) -> DataFrame:
    """Pairwise Jaccard matrix across ALL groups, from their bottom-k
    sketches alone: one row per unordered pair ``(ga < gb)`` with
    ``n_union_topk``, ``n_both``, ``jaccard`` — the sketch-scaled
    counterpart of the exact cross-source contamination matrix
    (operators/dedup.source_overlap): every pairwise vocabulary /
    fingerprint overlap across S sources WITHOUT any pass over raw
    data — only the S·k sketch rows are touched.

    Per pair the estimator is :func:`kmv_jaccard`'s (union's own
    bottom-k, membership counted by side multiplicity — a hash
    appearing under both groups has count 2).  The matrix also
    carries the DECISION columns of :func:`kmv_difference`:
    ``n_a_only``/``n_b_only`` (side-exclusive sample counts),
    ``union_est`` ((K−1)/U_K per pair; exact when unfilled) and
    ``adds_est`` — the estimated count of distinct values ``gb``
    would ADD to ``ga`` (|gb∖ga|), so the contamination matrix
    doubles as an ingest-ordering report.

    Shape at 100 TB: the pair dim is S(S−1)/2 rows (S = group count —
    bounded by construction, document when S is large), the tagged
    hash table ≤ S²·k rows, the rank window per pair ≤ 2k rows.
    Everything broadcasts; the raw corpus is never read.
    """
    from pyspark.sql import Window
    kk = int(k)
    s = (sketch.select(F.col(group_col).cast("string").alias("__g"),
                       "h")
         .localCheckpoint(eager=False))
    gs = s.select("__g").distinct()
    pairs = (gs.select(F.col("__g").alias("ga"))
             .join(gs.select(F.col("__g").alias("gb")),
                   F.col("ga") < F.col("gb")))
    ra = s.join(F.broadcast(pairs), s["__g"] == pairs["ga"]) \
        .select("ga", "gb", "h", F.lit(0).alias("__isb"))
    rb = s.join(F.broadcast(pairs), s["__g"] == pairs["gb"]) \
        .select("ga", "gb", "h", F.lit(1).alias("__isb"))
    c = (ra.unionAll(rb)
         .groupBy("ga", "gb", "h")
         .agg(F.count(F.lit(1)).cast("long").alias("__nsides"),
              F.max("__isb").alias("__hasb")))
    w = Window.partitionBy("ga", "gb").orderBy("h")
    t = (c.withColumn("__rn", F.row_number().over(w))
         .where(F.col("__rn") <= kk))
    agg = (t.groupBy("ga", "gb")
           .agg(F.count(F.lit(1)).cast("long").alias("n_union_topk"),
                F.max("h").alias("__hk"),
                F.sum(F.when(F.col("__nsides") == 2, 1).otherwise(0))
                .cast("long").alias("n_both"),
                F.sum(F.when((F.col("__nsides") == 1)
                             & (F.col("__hasb") == 0), 1).otherwise(0))
                .cast("long").alias("n_a_only"),
                F.sum(F.when((F.col("__nsides") == 1)
                             & (F.col("__hasb") == 1), 1).otherwise(0))
                .cast("long").alias("n_b_only")))
    u48 = F.expr(_hex_int_expr("__hk", 12))
    union_est = F.when(F.col("n_union_topk") < kk,
                       F.col("n_union_topk").cast("double")) \
        .otherwise(F.when(
            u48 > 0,
            F.round(F.lit(float(kk - 1))
                    / (u48.cast("double")
                       / F.lit(float(16 ** 12))), 6)))
    e = agg.withColumn("union_est", union_est)
    adds = F.when(F.col("n_union_topk") < kk,
                  F.col("n_b_only").cast("double")) \
        .otherwise(F.when(
            F.col("n_union_topk") > 0,
            F.round(F.col("n_b_only").cast("double")
                    / F.col("n_union_topk").cast("double")
                    * F.col("union_est"), 6)))
    return e.select(
        "ga", "gb", "n_union_topk", "n_both", "n_a_only", "n_b_only",
        F.when(F.col("n_union_topk") > 0,
               F.round(F.col("n_both").cast("double")
                       / F.col("n_union_topk").cast("double"), 6))
        .alias("jaccard"),
        "union_est", adds.alias("adds_est"))


def kmv_novelty_report(wsketch: DataFrame, group_col: str,
                       k: int = 256) -> DataFrame:
    """Grouped novelty report: for EVERY group g, "what does g add to
    the union of all the others" — |g ∖ ∪rest| (distinct values) AND
    its total weight (rows/bytes) — in ONE pass over the S·k sketch
    rows of a per-group WEIGHTED sketch (:func:`kmv_sketch_weighted`).
    The ingest-ordering decision over S sources that
    :func:`kmv_difference` answers pairwise and
    :func:`kmv_overlap_matrix` answers per-pair, answered per-source
    against the rest-union without building S rest-sketches.

    Estimator (Beyer et al. 2007 multiset machinery): the GLOBAL
    union's bottom-K is a uniform sample of the union's distinct
    values; a sampled hash has < K smaller hashes anywhere, so its
    membership in each group's sketch is EXACT, and a hash present
    under exactly ONE group is exclusive to it — with its exact
    per-group weight riding along.  Per group:
    ``adds_est = n_only/K · union_est`` and
    ``added_w_est = w_only/K · union_est`` (both EXACT when the
    union never filled the sketch), ``novelty_rate = n_only/K``.

    Columns: ``<group_col>, k, n_union_topk, n_in_union, n_only,
    w_only, union_est, adds_est, added_w_est, novelty_rate`` — exact
    strings/integers plus rounded divisions/products identical in
    both engines (oracle-pairable, q200 idiom).  ``<group_col>``
    keeps its INPUT dtype (integer/date keys stay joinable back onto
    the source dim without an implicit cast).

    PRECONDITION (as :func:`kmv_difference`): the sketch must have
    been built with bottom-k ≥ this ``k`` per group, or membership
    stops being decidable and exclusive counts bias upward.

    Ranking resolution (measured, PERF.md round 12): ``adds_est``
    differences smaller than ~2/√k are estimator noise — near-tied
    sources are unrankable at any k (and either order is equivalent
    for the ingest decision); on a corpus whose true novelty spans
    ≥2× between sources, k=256 ranks with Spearman ≈ 0.85 (top-3
    exact) and k=1024 with ≈ 0.99 at ~8 % mean relative error.

    Shape at 100 TB: the sketch is an S·k-row dim (S = group count,
    bounded by construction); the union bottom-K is a
    TakeOrderedAndProject over it; every join broadcasts a ≤S·k-row
    side; the 1-row global aggregate cross-joins onto the S-row group
    dim.  The raw corpus is never read.
    """
    kk = int(k)
    s = (wsketch.select(F.col(group_col).alias("__g"), "h", "w")
         .localCheckpoint(eager=False))
    u = s.select("h").distinct().orderBy("h").limit(kk)
    # sample hits: (h, group, exact weight) for union-bottom-K hashes
    m = (u.join(F.broadcast(s), "h")
         .localCheckpoint(eager=False))
    per_h = m.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("__ng"))
    tagged = m.join(F.broadcast(per_h), "h")
    per_g = (tagged.groupBy("__g")
             .agg(F.count(F.lit(1)).cast("long").alias("n_in_union"),
                  F.sum(F.when(F.col("__ng") == 1, 1).otherwise(0))
                  .cast("long").alias("n_only"),
                  F.sum(F.when(F.col("__ng") == 1, F.col("w"))
                        .otherwise(0))
                  .cast("long").alias("w_only")))
    glob = u.agg(F.count(F.lit(1)).cast("long").alias("n_union_topk"),
                 F.max("h").alias("__hk"))
    groups = s.select("__g").distinct()
    j = (groups.join(per_g, "__g", "left")
         .crossJoin(glob)   # 1-row global aggregate
         .select("__g",
                 F.coalesce("n_in_union", F.lit(0)).cast("long")
                 .alias("n_in_union"),
                 F.coalesce("n_only", F.lit(0)).cast("long")
                 .alias("n_only"),
                 F.coalesce("w_only", F.lit(0)).cast("long")
                 .alias("w_only"),
                 "n_union_topk", "__hk"))
    u48 = F.expr(_hex_int_expr("__hk", 12))
    union_est = F.when(F.col("n_union_topk") < kk,
                       F.col("n_union_topk").cast("double")) \
        .otherwise(F.when(
            u48 > 0,
            F.round(F.lit(float(kk - 1))
                    / (u48.cast("double")
                       / F.lit(float(16 ** 12))), 6)))
    e = j.withColumn("union_est", union_est)

    def _scaled(cnt: str) -> Column:
        return F.when(F.col("n_union_topk") < kk,
                      F.col(cnt).cast("double")) \
            .otherwise(F.when(
                F.col("n_union_topk") > 0,
                F.round(F.col(cnt).cast("double")
                        / F.col("n_union_topk").cast("double")
                        * F.col("union_est"), 6)))

    rate = F.when(F.col("n_union_topk") > 0,
                  F.round(F.col("n_only").cast("double")
                          / F.col("n_union_topk").cast("double"), 6))
    return e.select(
        F.col("__g").alias(group_col),
        F.lit(kk).cast("long").alias("k"),
        "n_union_topk", "n_in_union", "n_only", "w_only", "union_est",
        _scaled("n_only").alias("adds_est"),
        _scaled("w_only").alias("added_w_est"),
        rate.alias("novelty_rate"))
