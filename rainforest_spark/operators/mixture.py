"""Corpus-mixture operators: deterministic weighted sampling and
per-domain caps.

After dedup/filtering, a training-data pipeline reshapes the corpus:
down-weight over-represented sources to hit a target domain mixture,
and cap the number of documents any single domain (web host, source
shard) may contribute.  Both are expressed as pure column/window logic
so they run JVM-side and are exactly reproducible on any engine:

- ``weighted_sample``: keep a row iff the md5 of (salt, id) falls under
  the source's rate threshold.  Like :func:`packing.split_assign` this
  is order-free and stable — re-running the pipeline, or growing the
  table, never flips a previous keep/drop decision, and changing the
  salt redraws the whole sample.  Rates quantize to 1/16^6 (≈6e-8) via
  the first six hex chars; the threshold comparison is LEXICOGRAPHIC on
  fixed-width lowercase hex, which is monotonic with the numeric
  bucket, so Spark and DuckDB (and any engine with md5 + string
  compare) agree bit-for-bit.
- ``cap_per_group``: keep at most ``k`` rows per group, chosen by a
  salted-hash order (a deterministic uniform pick, not "first k by
  ingest order" which would bias toward old crawls).

Scale posture: ``weighted_sample`` is a per-row expression — no
shuffle, no join (the rate table is a literal CASE chain, not even a
broadcast).  ``cap_per_group`` is one shuffle on the group key with a
per-group TOP-K sort; with many domains (the web-crawl shape) the
window parallelizes per group.  A single monster group degenerates to
one task's sort — for the few-huge-groups shape use
:func:`windows.ranged_cumsum` over (group, hash) and filter rank <= k
instead (same trade as PERF.md round-6 q34).

No reference analogue (MeteoSwiss/rainforest is a weather archive);
these compose the prompt-level training-pipeline requirement with the
repo's determinism policy (workload/__init__.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Hex-prefix width used for rate thresholds: 6 chars = 24 bits.
_HEX_CHARS = 6
_BUCKETS = 16 ** _HEX_CHARS


def rate_threshold_hex(rate: float) -> str:
    """The fixed-width lowercase-hex keep threshold for ``rate``.

    A row is kept iff ``md5(salt || ':' || id)[:6] < threshold`` —
    strict ``<`` on same-length lowercase hex equals the numeric
    comparison, so the predicate is engine-portable as a plain string
    compare.  ``rate >= 1`` maps to ``'g'`` which is > every hex char,
    i.e. keep-all.

    Rounding is HALF-UP via ``floor(x + 0.5)`` — the SAME convention
    as :func:`weighted_sample_dynamic`'s runtime-rate threshold, so a
    given nominal rate selects the identical document set through
    either sampling API (Python's ``round`` is banker's rounding and
    would disagree on exact halves)."""
    import math

    thr = int(math.floor(min(max(rate, 0.0), 1.0) * _BUCKETS + 0.5))
    if thr >= _BUCKETS:
        return "g"  # sorts after 'f': keep everything
    return format(thr, f"0{_HEX_CHARS}x")


def salted_md5(id_col: Column | str, salt: str) -> Column:
    """``md5(salt || ':' || id)`` — THE deterministic-decision hash
    convention shared by every sampling/split/shuffle op (mixture,
    packing.split_assign, packing.epoch_shards).  One spelling, one
    place: the oracle SQL replays this exact string form, so a drift in
    any copy would silently fork the determinism contract."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(F.lit(salt + ":"), c.cast("string")))


def sample_hash(id_col: Column | str, salt: str) -> Column:
    """The 6-hex-char uniform sampling key of (salt, id)."""
    return F.substring(salted_md5(id_col, salt), 1, _HEX_CHARS)


def weighted_sample(df: DataFrame, id_col: str,
                    rates: dict[str, float] | float,
                    group_col: str | None = None,
                    default_rate: float = 0.0,
                    salt: str = "mix-v1") -> DataFrame:
    """Deterministic Bernoulli(rate) sample, with per-group rates.

    ``rates`` is either one global rate or a ``{group_value: rate}``
    mapping over ``group_col`` (the domain-mixture shape: each source
    gets its target retention).  Groups absent from the mapping fall
    back to ``default_rate`` (0.0 = drop unknown sources, the safe
    default for a curated mixture).  The decision for a given
    (salt, id) never changes across runs or as the table grows.
    """
    h = sample_hash(id_col, salt)
    if isinstance(rates, dict):
        if group_col is None:
            raise ValueError("per-group rates require group_col")
        expr: Column | None = None
        for val, rate in rates.items():
            cond = F.col(group_col) == val
            thr = F.lit(rate_threshold_hex(rate))
            expr = (F.when(cond, thr) if expr is None
                    else expr.when(cond, thr))
        thr_col = (expr.otherwise(rate_threshold_hex(default_rate))
                   if expr is not None
                   else F.lit(rate_threshold_hex(default_rate)))
    else:
        thr_col = F.lit(rate_threshold_hex(float(rates)))
    return df.filter(h < thr_col)


def cap_per_group(df: DataFrame, group_col: str, id_col: str, k: int,
                  salt: str = "cap-v1",
                  rank_col: str | None = None) -> DataFrame:
    """Keep at most ``k`` rows per ``group_col``, picked by salted-hash
    order (ties broken by id, so the pick is total and reproducible).

    ``rank_col`` optionally exposes the 1-based pick order of the
    surviving rows (callers that sub-sample further can reuse it).
    """
    w = (Window.partitionBy(group_col)
         .orderBy(sample_hash(id_col, salt), F.col(id_col)))
    out = (df.withColumn("__rk", F.row_number().over(w))
           .filter(F.col("__rk") <= int(k)))
    if rank_col:
        return out.withColumnRenamed("__rk", rank_col)
    return out.drop("__rk")


def token_budget_selection(df: DataFrame, id_col: str,
                           score_micro_col: str, weight_col: str,
                           budget_num: int, budget_den: int,
                           id_headroom: int = 10_000_000_000) -> DataFrame:
    """Quality-ordered corpus selection under a token budget: rank docs
    best-first and keep them until the running token count reaches
    ``budget_num/budget_den`` of the corpus total — "take the best N
    billion tokens", the final cut of a curated pre-training mix.

    Exactness contract (everything is 64-bit integer arithmetic):

    - ``score_micro_col``: integer micro-units quality score in
      [0, 1e6] (compute it with the round-half-up integer idiom
      ``(2*v*1e6 + d) div (2*d)`` — never a rounded double);
    - order: score DESC, id ASC, encoded as the single exact BIGINT key
      ``(1e6 - score) * id_headroom + id`` so the distributed
      range-partitioned cumsum (:func:`windows.ranged_cumsum` — no
      single-partition window) orders on one column;
    - a doc is selected iff the tokens BEFORE it are under the budget
      (integer cross-multiply, no FP): the first doc to cross the line
      is still taken, matching the "complete the budget" convention.

    Output: input ids + ``(score..., cum_before, selected)``.

    Shape at 100 TB: one range-shuffle for the cumsum, a broadcast
    offsets map, and a scalar total carried by the same offsets table —
    nothing global except the tiny per-partition offset dim.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    d = df.withColumn(
        "__ord",
        (F.lit(1000000) - F.col(score_micro_col)).cast("long")
        * F.lit(id_headroom) + F.col(id_col))
    c = ranged_cumsum(d, "__ord", weight_col, cum_col="__cw",
                      total_col="__tw")
    before = F.col("__cw") - F.col(weight_col)
    sel = (before * F.lit(budget_den)
           < F.col("__tw") * F.lit(budget_num))
    return (c.withColumn("cum_before", before.cast("long"))
            .withColumn("selected", sel)
            .drop("__ord", "__cw", "__tw"))


def hex_uniform_expr(hex_col_sql: str, n_chars: int = 8) -> str:
    """SQL fragment (valid in both Spark SQL and DuckDB) turning the
    first ``n_chars`` hex chars of an md5 into an integer via per-nibble
    ``instr`` arithmetic — the engine-portable hex->int (neither
    engine's native conv/from_hex is portable; the nibble sum is, and
    it is how simhash64 reads its bit votes)."""
    # CAST each term to BIGINT: in Spark's ANSI mode instr() is a
    # 32-bit INT and nibble * 16^7 overflows it
    terms = [
        f"CAST(instr('0123456789abcdef', substr({hex_col_sql}, {j + 1}, 1))"
        f" - 1 AS BIGINT) * {16 ** (n_chars - 1 - j)}"
        for j in range(n_chars)]
    return "(" + " + ".join(terms) + ")"


def weighted_sample_no_replacement(df: DataFrame, id_col: str,
                                   weight_col: str, m: int,
                                   salt: str = "es-v1") -> DataFrame:
    """Exact weighted sampling WITHOUT replacement via exponential
    keys (Efraimidis-Spirakis 2006): each row draws the deterministic
    uniform ``u = (h + 0.5) / 2^32`` from md5(salt:id) and competes on
    ``key = -ln(u) / w`` — the m SMALLEST keys are a true weighted
    sample without replacement (w_i/sum(w) first-draw marginals,
    successively renormalized), reproducible on any engine with md5.

    Determinism: ``u`` is exact integer arithmetic; the key is rounded
    to the 1e-9 grid before ranking (libm ``ln`` is the only
    cross-engine noise; the grid is ~1e3 coarser) with the id as tie
    break.  Weights must be positive.

    Shape at 100 TB: per-row expression + global top-m — Spark executes
    ``orderBy(...).limit(m)`` as per-partition top-m + a single merge
    of m-row heaps (TakeOrderedAndProject), never a full sort.
    """
    u_int = F.expr(hex_uniform_expr(
        f"md5(concat('{salt}:', cast({id_col} as string)))"))
    u = (u_int.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 9)
    d = df.withColumn("es_key", key)
    return (d.orderBy(F.col("es_key").asc(), F.col(id_col).asc())
            .limit(m))


def interleave_sources(df: DataFrame, id_col: str, group_col: str,
                       salt: str = "interleave-v1",
                       frac_scale: int = 10 ** 12,
                       group_headroom: int = 1_000_000) -> DataFrame:
    """Curriculum interleaving (stride scheduling): order the corpus so
    every source's documents are spread EVENLY through the epoch instead
    of clumping — the data-loader property that keeps per-batch domain
    mixture stable without runtime shuffling.

    The r-th of a source's n docs (r = 1..n, salted-hash order within
    the source) gets the midpoint fraction ``(2r-1)/(2n)``; sources
    interleave by fraction.  Exact integer encoding: ``fs = (2r-1) *
    frac_scale div (2n)`` then ``ord = fs * group_headroom + dense
    group id`` — one BIGINT, no FP anywhere, collision-free while
    ``n < frac_scale / group_headroom`` per source (1e6 docs/source at
    the defaults; raise frac_scale for more).  The global position is
    the distributed ordered count (ranged_cumsum of weight 1), never a
    single-partition window.

    Returns the input plus ``(src_rank, position)`` — position is the
    0-based slot in the interleaved epoch.
    """
    from pyspark.sql import Window

    from rainforest_spark.operators.windows import ranged_cumsum

    # per-source rank via the GROUPED ranged cumsum, not a
    # partitionBy(source) window — one monster source would serialize
    # the whole corpus into one task's sort (this module's own header
    # trade).  The order key is md5 || zero-padded id (q84's idiom):
    # one string column, unique, identical ordering to (md5, id).
    ordc = F.concat(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        F.lpad(F.col(id_col).cast("string"), 20, "0"))
    d = (df.withColumn("__sord", ordc).withColumn("__one", F.lit(1)))
    d = (ranged_cumsum(d, "__sord", "__one", cum_col="src_rank",
                       group_cols=[group_col])
         .withColumn("src_rank", F.col("src_rank").cast("int"))
         .drop("__sord", "__one"))
    n = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    from pyspark.sql.functions import broadcast
    d = d.join(broadcast(n), group_col)
    gid = Window.orderBy(group_col)
    gids = (df.select(group_col).distinct()
            .withColumn("__gid", F.row_number().over(gid) - 1))
    d = d.join(broadcast(gids), group_col)
    d = (d.withColumn(
            "__ord",
            F.expr(f"(((2 * src_rank - 1) * CAST({frac_scale} AS BIGINT))"
                   f" div (2 * __n)) * {group_headroom} + __gid"))
         .withColumn("__one", F.lit(1)))
    c = ranged_cumsum(d, "__ord", "__one", cum_col="__pos")
    return (c.withColumn("position", (F.col("__pos") - 1).cast("long"))
            .drop("__n", "__gid", "__ord", "__one", "__pos"))


def weighted_sample_dynamic(df: DataFrame, id_col: str, group_col: str,
                            rates: DataFrame, rate_col: str = "rate",
                            salt: str = "dyn-v1") -> DataFrame:
    """Per-group Bernoulli sampling with RATES COMPUTED AT RUNTIME (a
    broadcast-joined rates table instead of :func:`weighted_sample`'s
    literal CASE chain).  Keep rule is the same engine-portable
    lexicographic hex compare; the threshold is formatted per row with
    ``format_string('%06x', floor(rate * 16^6 + 0.5))`` — HALF-UP, the
    same rounding convention as :func:`rate_threshold_hex`, identical
    double arithmetic in both engines — and a rate >= 1 maps to the
    sentinel 'g' (sorts after every hex digit, so everything keeps).
    A sub-1 rate whose half-up rounding still reaches 16^6 also maps
    to 'g': ``%06x`` would otherwise emit the 7-char '1000000', whose
    leading '1' sorts BEFORE letter hex digits and silently drops
    every hash starting a-f.
    """
    from pyspark.sql.functions import broadcast

    t = F.floor(F.col(rate_col) * F.lit(float(_BUCKETS)) + F.lit(0.5))
    thr = (F.when(F.col(rate_col) >= 1.0, F.lit("g"))
           .when(t >= _BUCKETS, F.lit("g"))
           .otherwise(F.format_string("%06x", t.cast("int"))))
    r = rates.select(F.col(group_col), thr.alias("__thr"))
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"),
                       F.col(id_col).cast("string"))), 1, _HEX_CHARS)
    return (df.join(broadcast(r), group_col)
            .filter(h < F.col("__thr"))
            .drop("__thr"))


def rebalance_after_dedup(original: DataFrame, kept: DataFrame,
                          id_col: str, group_col: str,
                          salt: str = "rebalance-v1") -> DataFrame:
    """Dedup-loss rebalancing: deduplication removes MORE from
    duplicate-heavy sources, silently shifting the domain mixture; this
    resamples the survivors so per-source proportions return to the
    ORIGINAL corpus's, using only down-sampling.

    Math: with per-source original counts ``o_s`` and survivor counts
    ``k_s``, the largest original-proportioned corpus inside the
    survivors keeps ``rate_s = m * o_s / k_s`` of source ``s`` where
    ``m = min_t k_t / o_t`` (the worst-hit source binds and keeps
    everything).  The BINDING sources are detected with an EXACT
    integer cross-multiply (``s`` binds iff ``k_s·o_t <= k_t·o_s`` for
    all ``t``, products as exact decimals) and get rate 1.0 outright:
    ``(min_t k_t/o_t)·o_s/k_s`` in double is mathematically 1 for them
    but FP can land a hair below, missing the 'g' sentinel and
    silently dropping ~1/16M of a source that must keep everything.
    Non-binding rates are identical double expressions in any engine;
    the keep decision is the salted-hash threshold of
    :func:`weighted_sample_dynamic`.

    Shape at 100 TB: two per-source count aggs (tiny dims), the
    binding check is a self-cross-join of the per-source counts dim
    (|sources|² tiny rows), one broadcast join — no extra shuffle over
    the corpus.
    """
    o = original.groupBy(group_col).agg(F.count(F.lit(1)).alias("__o"))
    k = kept.groupBy(group_col).agg(F.count(F.lit(1)).alias("__k"))
    # LEFT join + coalesce 0: a source whose every doc was deduped away
    # must participate (an inner join would silently compute m over the
    # survivors only and ship a mixture that cannot match the original).
    # Restoring original proportions by down-sampling is then impossible
    # (m = 0 -> empty output), so fail loudly instead.
    j = (o.join(k, group_col, "left")
         .withColumn("__k", F.coalesce("__k", F.lit(0))))
    vanished = [r[group_col] for r in
                j.filter(F.col("__k") == 0).select(group_col).collect()]
    if vanished:
        raise ValueError(
            f"rebalance_after_dedup: sources {sorted(vanished)!r} have "
            f"zero survivors — the original mixture is unreachable by "
            f"down-sampling (drop them from `original` to rebalance "
            f"over the remaining sources deliberately)")
    m = j.agg(F.min(F.col("__k").cast("double") / F.col("__o"))
              .alias("__m"))
    # exact binding test: k_s·o_t <= k_t·o_s for all t, products as
    # decimals (bigint·bigint can overflow at 100 TB corpus counts)
    other = j.select(F.col("__o").alias("__o2"), F.col("__k").alias("__k2"))
    kd = F.col("__k").cast("decimal(19,0)")
    k2d = F.col("__k2").cast("decimal(19,0)")
    v = (j.crossJoin(other)
         .groupBy(group_col, "__o", "__k")
         .agg(F.max((kd * F.col("__o2") > k2d * F.col("__o"))
                    .cast("int")).alias("__viol")))
    rates = (v.crossJoin(m)
             .select(F.col(group_col),
                     F.when(F.col("__viol") == 0, F.lit(1.0))
                     .otherwise(F.col("__m") * F.col("__o") / F.col("__k"))
                     .alias("rate")))
    return weighted_sample_dynamic(kept, id_col, group_col, rates,
                                   salt=salt)


def stratified_sample(df: DataFrame, id_col: str, group_col: str,
                      budget: int, alloc: str = "sqrt",
                      salt: str = "strat-v1") -> DataFrame:
    """Deterministic stratified sampling to a TOTAL document budget —
    the eval/holdout-set construction step: small sources must not
    vanish, huge sources must not drown the sample.

    ``alloc='sqrt'`` allocates the budget proportional to
    ``sqrt(n_g)`` (the square-root allocation used for eval suites:
    between proportional — which mirrors the skew — and equal — which
    over-weights tiny sources); ``alloc='prop'`` is plain proportional.
    Per-group keep rates are ``min(1, budget·w_g / (Σw·n_g))`` computed
    as one double expression over the tiny per-group count dim, and the
    keep decision is the salted-hash threshold of
    :func:`weighted_sample_dynamic` — reproducible, join-free over the
    corpus, identical in any engine.  Exactness: the sqrt weights are
    rounded to the 1e-9 grid and summed as DECIMAL(19,9) (the q83
    policy) so ``Σw`` is order-free — a raw double sum would depend on
    partial-aggregation order across partitions.

    The realized sample size is Binomial around the budget (hash
    sampling is per-row Bernoulli, the same trade weighted_sample
    makes); callers needing an exact count compose
    :func:`cap_per_group` on the result instead.

    Shape at 100 TB: one per-group count agg (tiny dim), rate algebra
    on that dim, one broadcast join — no shuffle over the corpus.
    """
    if alloc not in ("sqrt", "prop"):
        raise ValueError(f"unknown alloc {alloc!r} (want sqrt|prop)")
    cnt = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w9 = (F.round(F.sqrt(F.col("__n").cast("double")), 9)
          if alloc == "sqrt" else F.col("__n").cast("double"))
    cnt = cnt.withColumn("__w", w9.cast("decimal(19,9)"))
    tot = cnt.agg(F.sum("__w").cast("double").alias("__tw"))
    rates = (cnt.crossJoin(tot)
             .select(F.col(group_col),
                     F.least(
                         F.lit(1.0),
                         F.lit(float(budget))
                         * F.col("__w").cast("double")
                         / (F.col("__tw") * F.col("__n")))
                     .alias("rate")))
    return weighted_sample_dynamic(df, id_col, group_col, rates,
                                   salt=salt)


def temperature_allocation(df: DataFrame, group_col: str, budget: int,
                           alpha: float = 0.25) -> DataFrame:
    """Temperature-scaled mixture quotas: allocate an EXACT total
    document budget across sources proportional to ``n_g^alpha`` — the
    multilingual/domain rebalancing rule (mT5/XLM-R style alpha
    sampling: alpha=1 mirrors the corpus skew, alpha->0 approaches
    uniform; 0.2-0.5 is the usual band).  Unlike
    :func:`stratified_sample` (per-row Bernoulli, Binomial realized
    size) this emits integer per-group QUOTAS that sum to ``budget``
    exactly — the contract a fixed-size training-mix spec needs; feed
    the quota into :func:`cap_per_group` to materialize the pick.

    ``alpha`` must be ``1/2**m`` (0.5, 0.25, 0.125, ...): ``n^alpha``
    is then an m-fold ``sqrt`` chain, and IEEE-754 sqrt is correctly
    rounded on every engine — the weights are bit-identical in Spark,
    DuckDB and numpy with NO transcendental grid at all.  The weights
    become integer nanos (``floor(w*1e9 + 0.5)`` — pure double ops,
    engine-identical) and everything after is integer arithmetic:

    - base quota ``(nano_g * budget) div T`` with ``T = sum(nano)``,
      products in DECIMAL(38,0) so a trillion-doc source times a
      billion-doc budget cannot overflow BIGINT;
    - the leftover ``budget - sum(base)`` (< #groups) goes to the
      largest remainders, ties on the group name ascending — the
      classic largest-remainder method, wholly deterministic.

    Output: ``(group, n_docs, weight, alloc)``; ``weight`` is the
    rounded share ``nano/T``, ``sum(alloc) == budget`` exactly and
    ``alloc`` never exceeds... note it MAY exceed ``n_docs`` when a
    tiny source's temperature share outruns its actual size — callers
    wanting attainable quotas cap at ``least(alloc, n_docs)`` (kept
    raw here so the quota table states the *target* mixture).

    Shape at 100 TB: one per-group count over the corpus (map-side
    combine, uniform), then ALL arithmetic — including the
    largest-remainder rank window — runs on the per-group dim table
    (|sources|, bounded small); nothing re-touches the corpus.
    """
    m = 0
    a = alpha
    while a < 1.0 - 1e-12 and m < 12:
        a *= 2.0
        m += 1
    if abs(a - 1.0) > 1e-12 or m == 0:
        raise ValueError(
            f"alpha={alpha!r} is not 1/2**m (0.5, 0.25, ...); the "
            "sqrt-chain exactness contract needs a dyadic reciprocal")
    w = F.col("__n").cast("double")
    for _ in range(m):
        w = F.sqrt(w)
    cnt = (df.groupBy(F.col(group_col).alias("grp"))
           .agg(F.count(F.lit(1)).alias("__n"))
           .withColumn("__nano",
                       F.floor(w * F.lit(1000000000.0) + F.lit(0.5))))
    tot = cnt.agg(F.sum("__nano").alias("__t"))
    d = (cnt.crossJoin(F.broadcast(tot))
         .withColumn("__prod", F.col("__nano").cast("decimal(38,0)")
                     * F.lit(int(budget)).cast("decimal(38,0)"))
         .withColumn("__base", F.expr("__prod div __t"))
         .withColumn("__rem", F.col("__prod")
                     - F.col("__base").cast("decimal(38,0)")
                     * F.col("__t").cast("decimal(38,0)")))
    # deficit + remainder rank live on the per-group dim table —
    # bounded by |sources|, so the no-partition window is safe here
    # (same bounded-dim argument as q129's Lorenz ranks)
    short = d.agg((F.lit(int(budget))
                   - F.sum("__base")).alias("__short"))
    rw = Window.orderBy(F.col("__rem").desc(), F.col("grp").asc())
    out = (d.crossJoin(F.broadcast(short))
           .withColumn("__rr", F.row_number().over(rw))
           .select(F.col("grp").alias(group_col),
                   F.col("__n").alias("n_docs"),
                   F.round(F.col("__nano").cast("double")
                           / F.col("__t").cast("double"), 6)
                   .alias("weight"),
                   (F.col("__base")
                    + F.when(F.col("__rr") <= F.col("__short"), 1)
                    .otherwise(0)).cast("long").alias("alloc")))
    return out
