"""Deduplication operators for training-data pipelines.

- exact dedup: fingerprint groupBy (one shuffle on the hash — uniform keys,
  no skew).
- n-gram Jaccard near-dup: shingle explode + self-join on shingle.  The
  shingle join is the scale hazard (hot shingles fan out); production use
  pairs it with the MinHash/LSH prefilter below so the exact Jaccard only
  runs on candidate pairs.
- MinHash + LSH banding: k independent min-hashes from md5(seed||shingle)
  (string min — engine-portable, no 64-bit arithmetic differences), banded
  into b groups; docs sharing a band bucket are candidate pairs.  This is
  the standard shingle→minhash→band→bucket-join pipeline and shuffles only
  on (band_id, band_hash) — uniformly distributed keys.
- SimHash: 64-bit sign-aggregated token hashes via bit arithmetic on
  md5 (engine-portable — both Spark and DuckDB agree on the digest, so
  the signatures are oracle-checkable) — near-dups differ in few bits
  (checked by popcount of XOR).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rainforest_spark.operators.text_analysis import fingerprint, normalized_text


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical (normalized) documents: canonical id + group size."""
    return (df.withColumn("fingerprint", fingerprint(text_col))
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count(F.lit(1)).alias("n_dups")))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (empty if fewer than n
    words).  The words array is let-bound (r13): referencing the raw
    ``split(normalized_text(...))`` inside the transform lambda
    re-evaluates it per element per ``element_at`` — no CSE across
    lambda scopes (the `shingle_table` lesson; DataFrame callers should
    prefer :func:`shingle_table`, which stages a column instead)."""
    from rainforest_spark.operators.text_analysis import _let

    def body(words: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(words) - n)
        mk = F.transform(
            idx, lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + k + 1) for k in range(n)]))
        return F.when(F.size(words) >= n, mk).otherwise(
            F.array().cast("array<string>"))
    return _let(F.split(normalized_text(text), " "), body)


def shingle_table(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3) -> DataFrame:
    """(id, shingle) rows, distinct — the base for Jaccard and MinHash.

    The words array is materialized as a column BEFORE the shingle
    transform: referencing the raw ``split(...)`` expression inside the
    lambda would re-evaluate the split per element (no CSE across lambda
    scopes) — ~50× slower on real documents.
    """
    words = F.split(normalized_text(text_col), " ")
    staged = df.select(F.col(id_col), words.alias("__words"))
    w = F.col("__words")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    mk = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1)
                                          for k in range(n)]))
    shingles = F.when(F.size(w) >= n, mk) \
        .otherwise(F.array().cast("array<string>"))
    return (staged.select(F.col(id_col),
                          F.explode(shingles).alias("shingle"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle."""
    # no .cache() (storage leak in long-lived sessions); the three
    # consumers share the shingle table's exchange via ReusedExchange
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (a.join(b, on="shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    j = (inter.join(sa, "id_a").join(sb, "id_b")
         .withColumn("jaccard",
                     F.col("inter")
                     / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def minhash_bands(df: DataFrame, id_col: str, text_col: str,
                  n: int = 3, num_hashes: int = 16,
                  band_size: int = 4) -> DataFrame:
    """MinHash signature banded for LSH: (id, band_id, band_hash).

    Each of the ``num_hashes`` hash functions is ``md5(seed || '|' ||
    md5(shingle))`` and the min-hash is the lexicographic MIN — pure
    string ops, identical across engines, no signed-overflow pitfalls.

    Shuffle shape: ONE groupBy(id) computing all k min-hashes as parallel
    aggregates (map-side combine keeps k strings per doc per partition),
    then the band table unpivots driver-free via a small stack().  An
    explode-by-seed would multiply the shuffle k× for no benefit.

    NOTE (r13, negative result): a ZERO-exchange in-expression variant
    (``array_min(transform(md5s, seeded_md5))`` over the staged
    distinct-gram array — min over the distinct set equals min over
    the multiset, so it is result-identical) measured ~3× SLOWER at
    sf1 (q45 3.1 → 9.7 s isolated best-of-3; q63 5.0 → 11.2; q97
    4.4 → 6.4), and adding a doc-level repartition for map parallelism
    did not recover it (q45 11.4 s).  Root cause: higher-order
    functions (``transform``/``array_min``) evaluate their lambdas
    INTERPRETED per element — 16 seeded md5s per gram outside
    whole-stage codegen lose far more than the two removed Exchanges
    save.  The aggregate shape keeps every md5 inside codegen'd
    operators; do not retry without checking HOF codegen first.
    """
    # hash the shingle ONCE to a fixed 32-char key before the distinct —
    # the dedup shuffle then moves 32-byte keys instead of raw shingles,
    # and the k seeded hashes run over the short key.
    # (r13 finding: the `.distinct()` below never reaches the physical
    # plan — RemoveRedundantAggregates elides the dedup aggregate
    # because every signature aggregate is a duplicate-agnostic MIN,
    # so this path already shuffles ONLY the compact groupBy(id)
    # partials.  An explicit distinct-free variant produced a
    # bit-identical physical plan and flat timings at both tiers;
    # kept as-is since shingle_table is the shared, tested idiom.)
    sh = (shingle_table(df, id_col, text_col, n)
          .select(F.col(id_col), F.md5("shingle").alias("h0")))
    mh_aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("h0"))))
        .alias(f"mh{seed}") for seed in range(num_hashes)]
    sig = sh.groupBy(id_col).agg(*mh_aggs)
    n_bands = num_hashes // band_size
    band_cols = [
        F.struct(F.lit(b).cast("long").alias("band_id"),
                 F.md5(F.concat(*[F.col(f"mh{b * band_size + j}")
                                  for j in range(band_size)]))
                 .alias("band_hash"))
        for b in range(n_bands)]
    return (sig.select(F.col(id_col),
                       F.explode(F.array(*band_cols)).alias("b"))
            .select(id_col, F.col("b.band_id").alias("band_id"),
                    F.col("b.band_hash").alias("band_hash")))


def lsh_candidate_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, num_hashes: int = 16,
                        band_size: int = 4) -> DataFrame:
    """Distinct candidate near-dup pairs from MinHash LSH banding."""
    sig = minhash_bands(df, id_col, text_col, n, num_hashes, band_size)
    a = sig.select(F.col(id_col).alias("id_a"), "band_id", "band_hash")
    b = sig.select(F.col(id_col).alias("id_b"), "band_id", "band_hash")
    return (a.join(b, on=["band_id", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def minhash_verified_pairs(df: DataFrame, id_col: str, text_col: str,
                           n: int = 3, num_hashes: int = 16,
                           band_size: int = 4,
                           threshold: float = 0.5) -> DataFrame:
    """The production near-dup pipeline: MinHash/LSH candidate
    generation + exact n-gram Jaccard VERIFICATION on candidates only.

    This is the scale shape ngram_jaccard_pairs' docstring promises: the
    all-pairs shingle self-join never happens — the exact Jaccard fans
    out only over LSH candidates, so hot shingles cost nothing and the
    expensive join is bounded by the candidate count.  Returns
    (id_a, id_b, jaccard) for pairs ≥ threshold.
    """
    cand = lsh_candidate_pairs(df, id_col, text_col, n, num_hashes,
                               band_size)
    # no .cache(): the three consumers (sizes, sa, sb) share the shingle
    # table's exchange via ReusedExchange, and an explicit cache would
    # leak executor storage across invocations in a long-lived session
    sh = shingle_table(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # semi-filter each verify side down to the docs that actually
    # appear in a candidate pair BEFORE the shingle exchanges (guide
    # §3.2, r13): candidates are LSH-sparse, so the id-keyed and
    # (id, shingle)-keyed exchanges below otherwise carry the whole
    # corpus's shingles to verify a small candidate set.  The id dims
    # are distinct candidate ids — broadcast-sized; the extra cand
    # recomputes ride the band subtree's reused exchanges.
    ida = cand.select(F.col("id_a").alias(id_col)).distinct()
    idb = cand.select(F.col("id_b").alias(id_col)).distinct()
    sa = (sh.join(ida, id_col, "semi")
          .select(F.col(id_col).alias("id_a"), "shingle"))
    sb = (sh.join(idb, id_col, "semi")
          .select(F.col(id_col).alias("id_b"), "shingle"))
    inter = (cand.join(sa, on="id_a")
             .join(sb, on=["id_b", "shingle"])
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter")))
    za = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    zb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    j = (inter.join(za, "id_a").join(zb, "id_b")
         .withColumn("jaccard",
                     F.col("inter")
                     / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard")))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word tokens using md5-derived bit votes.

    The 64 bits come from the FIRST 16 hex chars of ``md5(token)``:
    nibble j is hex char j+1, and bit b is bit (b mod 4) of nibble
    (b div 4).  md5 is chosen over xxhash64 deliberately: both engines
    (Spark, DuckDB) compute the identical digest, so the signature — and
    therefore the banded near-dup pairs — is hash-checkable by the SQL
    oracle at no algorithmic cost (xxhash64 exists only in Spark).

    Per token each bit votes ±1; the signature takes the sign of each
    bit-sum.  All 64 vote counters are PARALLEL integer aggregates in
    one groupBy (map-side combine, exact arithmetic — no FP anywhere) —
    a 64× bit-explode would multiply the shuffle for nothing.
    """
    from rainforest_spark.operators.text_analysis import tokens

    toks = df.select(F.col(id_col),
                     F.explode(tokens(text_col)).alias("tok"))
    h = toks.withColumn("h16", F.substring(F.md5("tok"), 1, 16))
    nibs = h.select(
        F.col(id_col),
        *[F.expr(f"instr('0123456789abcdef', substr(h16, {j + 1}, 1)) - 1")
          .alias(f"n{j}") for j in range(16)])
    votes = [
        F.sum(F.when(F.expr(f"shiftright(n{b // 4}, {b % 4}) & 1") == 1, 1)
              .otherwise(-1)).alias(f"v{b}")
        for b in range(64)]
    sums = nibs.groupBy(id_col).agg(*votes)
    sig_bits = [
        F.when(F.col(f"v{b}") > 0,
               F.lit(1 << b if b < 63 else -(1 << 63)).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for b in range(64)]
    total = sig_bits[0]
    for sb in sig_bits[1:]:
        total = total + sb
    return sums.select(F.col(id_col), total.alias("simhash"))


def simhash_neardup_pairs(df: DataFrame, id_col: str, text_col: str,
                          max_hamming: int = 7,
                          n_bands: int | None = None) -> DataFrame:
    """SimHash near-duplicate pairs: band the 64-bit signature into
    ``n_bands`` equal chunks, join on (band_id, chunk), then exact
    popcount filter.

    Pigeonhole guarantee: a pair with hamming ≤ n_bands − 1 shares at
    least one unchanged band, so candidate generation is EXHAUSTIVE for
    ``max_hamming ≤ n_bands − 1``.  ``n_bands`` defaults to the smallest
    power-of-two divisor of 64 exceeding ``max_hamming``, capped at 16
    (4-bit chunks) — beyond that the band keys have too few distinct
    values to bucket at scale, so for ``max_hamming ≥ 16`` recall is
    PARTIAL by construction (documented trade; lower max_hamming or
    accept missed pairs).
    """
    sig = simhash64(df, id_col, text_col)
    return hamming_neardup_pairs(sig, id_col, "simhash",
                                 max_hamming=max_hamming,
                                 n_bands=n_bands)


def _hamming_bands(n_bands: int | None, max_hamming: int) -> int:
    if n_bands is None:
        n_bands = next((b for b in (4, 8, 16) if b > max_hamming), 16)
    assert 64 % n_bands == 0, "n_bands must divide 64"
    return n_bands


def banded_signatures(df: DataFrame, id_col: str, sig_col: str,
                      n_bands: int, id_out: str,
                      sig_out: str) -> DataFrame:
    """Explode a 64-bit signature column into its ``n_bands`` band-key
    rows ``(id_out, sig_out, band_id, chunk)`` — the shared banding
    under every Hamming join shape (self-pairing and batch-vs-corpus)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    chunks = [
        F.struct(F.lit(b).alias("band_id"),
                 F.expr(f"({sig_col} >> {width * b}) & {mask}")
                 .alias("chunk"))
        for b in range(n_bands)]
    return (df.select(F.col(id_col).alias(id_out),
                      F.col(sig_col).alias(sig_out),
                      F.explode(F.array(*chunks)).alias("b"))
            .select(id_out, sig_out,
                    F.col("b.band_id").alias("band_id"),
                    F.col("b.chunk").alias("chunk")))


def hamming_neardup_pairs(sig: DataFrame, id_col: str, sig_col: str,
                          max_hamming: int = 7,
                          n_bands: int | None = None) -> DataFrame:
    """Banded Hamming pairing over ANY 64-bit signature column —
    the shared engine under SimHash text dedup and perceptual-hash
    image dedup (operators/multimodal.image_phash).  Same pigeonhole
    guarantee and band-sizing trade as :func:`simhash_neardup_pairs`.
    """
    n_bands = _hamming_bands(n_bands, max_hamming)
    a = banded_signatures(sig, id_col, sig_col, n_bands, "id_a", "sh_a")
    b = banded_signatures(sig, id_col, sig_col, n_bands, "id_b", "sh_b")
    cand = (a.join(b, on=["band_id", "chunk"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return (cand.withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def neardup_clusters(pairs: DataFrame, id_a: str = "id_a",
                     id_b: str = "id_b", out_id: str = "doc_id",
                     cluster_col: str = "cluster_id",
                     max_iter: int = 25) -> DataFrame:
    """Connected components over near-dup pairs: each document labeled
    with the MIN doc id of its component — the canonical representative
    a dedup pipeline keeps (the step after q44/q45/q63 pair
    generation; the reference stops at pairs, this closes the loop).

    Iterative min-label propagation: each round joins the symmetric
    edge list to the current labels and takes the min over the
    neighborhood, so labels converge in O(component diameter) rounds —
    near-dup components are small dense clusters, so a handful of
    rounds suffices.  Every round is ONE shuffle keyed on the vertex
    id; the pair set is orders of magnitude smaller than the corpus at
    scale.  Lineage is truncated per round (localCheckpoint) so the
    plan does not grow with iterations.
    """
    sym = (pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
           .unionByName(
               pairs.select(F.col(id_b).alias("src"),
                            F.col(id_a).alias("dst"))))
    labels = (sym.select(F.col("src").alias("v")).distinct()
              .withColumn("label", F.col("v")))
    converged = False
    for _ in range(max_iter):
        neigh = (sym.join(labels, sym["dst"] == labels["v"])
                 .groupBy("src").agg(F.min("label").alias("nmin")))
        stepped = (labels.join(neigh, labels["v"] == neigh["src"], "left")
                   .select(labels["v"],
                           F.col("label").alias("__old"),
                           F.least("label", F.coalesce("nmin", "label"))
                           .alias("label")))
        stepped = stepped.localCheckpoint()
        if stepped.filter(F.col("label") != F.col("__old")) \
                .limit(1).count() == 0:
            labels = stepped
            converged = True
            break
        labels = stepped.drop("__old")
    if not converged:
        # a partially-propagated labeling is WRONG (splits one component
        # into several); fail loudly rather than return it — raise
        # max_iter past the largest component diameter
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iter} rounds; "
            f"a component's diameter exceeds max_iter — raise max_iter")
    return labels.select(F.col("v").alias(out_id),
                         F.col("label").alias(cluster_col))


def positioned_shingles(df: DataFrame, id_col: str, text_col: str,
                        n: int = 5) -> DataFrame:
    """(id, pos, shingle) rows — word ``n``-gram at each 1-based token
    position of the normalized token sequence.  NOT distinct (unlike
    ``shingle_table``): positions are the point, a repeated gram in one
    doc is two rows.  Same staged-array pattern (the lambda must not
    re-evaluate the split per element)."""
    words = F.split(normalized_text(text_col), " ")
    staged = df.select(F.col(id_col), words.alias("__words"))
    w = F.col("__words")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    mk = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1)
                                          for k in range(n)]))
    shingles = F.when(F.size(w) >= n, mk) \
        .otherwise(F.array().cast("array<string>"))
    return staged.select(
        F.col(id_col), F.posexplode(shingles).alias("__p", "shingle")
    ).select(F.col(id_col), (F.col("__p") + 1).cast("long").alias("pos"),
             "shingle")


def repeated_spans(df: DataFrame, id_col: str, text_col: str,
                   n: int = 5, min_docs: int = 2) -> DataFrame:
    """Cross-document repeated-span detection — the word-granularity
    analogue of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    maximal token spans whose every ``n``-gram also appears verbatim in
    at least ``min_docs`` distinct documents, the passages an LLM
    pipeline trims as boilerplate/licence blocks/quotes.

    Three stages, all linear in total grams:
    1. positioned ``n``-gram shingles (in-expression fan-out, no join);
    2. "hot" grams: groupBy(gram) → approx nothing, an EXACT distinct-doc
       count, filter ≥ ``min_docs``.  The shuffle key is the gram —
       uniform (md5-able at scale; string kept here for the oracle).
       NOTE (r13, negative result): staging the positioned table
       behind an explicit gram-keyed repartition measured 4.4 → 2.2 s
       at sf1 but INVERTED at the scale decade (35.2 → 47.3 s at
       sf10, same-window isolated best-of-N) and was reverted — the
       sf1 win was only parallelism (the heavy distinct-doc partial
       aggregation moves off the 10 scan tasks the small tier's file
       layout yields), while at sf10 (100 input splits) scan-side
       parallelism is already sufficient and the extra full
       positioned-row shuffle, unpruned and uncompacted by map-side
       partial aggregation, is pure cost.  The branches prune
       different columns, so the two exchanges never canonicalize
       equal — there is no ReusedExchange to be had here;
    3. hit positions join hot grams (equi-join, 1:1 per position), then
       per-doc merge of overlapping-or-adjacent hits into maximal spans
       via the classic cummax sessionization (running MAX of span end
       over preceding rows; a new span starts when the gap exceeds one
       token).  The window partitions by document — bounded rows, never
       a global sort.

    Returns (id, span_id, span_start, span_end, span_tokens,
    n_hot_grams), token positions 1-based inclusive.
    """
    from pyspark.sql import Window

    pos = positioned_shingles(df, id_col, text_col, n=n)
    # Hot-gram census from a per-doc-DISTINCT gram stream (r13): the
    # old `pos.groupBy(shingle).agg(countDistinct(id))` planned the
    # two-phase distinct aggregate, whose exchange carries one row per
    # distinct (gram, doc) PAIR — ~all 25M gram strings at sf10,
    # measured 52 s of the 67 s wall.  Deduping each doc's grams
    # in-expression first makes `count(1)` per gram exactly equal to
    # the distinct-doc count, so the map-side partial aggregation
    # compacts the exchange to one row per partition-distinct GRAM —
    # vocabulary-bounded, not pair-bounded.  The hot set is identical.
    dg = df.select(F.col(id_col),
                   F.explode(F.array_distinct(
                       word_shingles(text_col, n))).alias("shingle"))
    hot = (dg.groupBy("shingle")
           .agg(F.count(F.lit(1)).alias("__nd"))
           .filter(F.col("__nd") >= min_docs)
           .select("shingle"))
    # SHUFFLE_HASH on the hot side (r13): the hot-gram dim grows with
    # the corpus (1.2M grams at sf10), and AQE's broadcast pick pays a
    # single-threaded build of that whole relation per run — measured
    # 31.6-58.5 s vs 12.8-18.3 s full-query interleaved at sf10
    # (4.6-10.9 vs 2.4-3.8 s at sf1).  A shuffled hash join builds
    # per-partition maps in parallel and is also the only choice that
    # stays bounded when the hot dim outgrows any broadcast threshold.
    hits = (pos.join(hot.hint("shuffle_hash"), "shingle")
            .select(F.col(id_col), "pos"))
    w_prev = (Window.partitionBy(id_col).orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    prev_end = F.max(F.col("pos") + (n - 1)).over(w_prev)
    new_span = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0)
    spanned = hits.withColumn("span_id",
                              F.sum(new_span).over(w_run).cast("long"))
    return (spanned.groupBy(id_col, "span_id")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + (n - 1)).alias("span_end"),
                 (F.max("pos") + (n - 1) - F.min("pos") + 1)
                 .alias("span_tokens"),
                 F.count(F.lit(1)).alias("n_hot_grams")))


def excise_repeated_spans(df: DataFrame, id_col: str, text_col: str,
                          n: int = 5, min_docs: int = 2) -> DataFrame:
    """The dedup TRANSFORM that completes ``repeated_spans``'s
    detection: remove every cross-document repeated span occurrence
    EXCEPT the one in the lowest-id document containing that gram —
    keep-first-occurrence substring dedup (Lee et al. 2022) at word
    granularity.

    Semantics, defined at the gram-hit level so they are set-exact in
    any engine: a hot gram occurrence (doc, pos) is DROPPED iff the doc
    is not the MIN doc id over that gram's occurrences; a token is
    removed iff some dropped occurrence covers its position.  Dropped
    ranges are merged per doc (cummax sessionization) and each doc's
    removed-range list rides a doc-keyed 1:1 join as an ARRAY — the
    keep test is an in-expression ``exists`` over that array, never a
    token×span fan-out.

    Returns one row per input document: (id, n_tokens_kept,
    n_tokens_removed, cleaned) with ``cleaned`` the surviving tokens of
    the NORMALIZED text joined by single spaces (docs with nothing
    removed pass through; empty docs yield empty cleaned text).

    Shape at 100 TB: the gram table shuffles once on the gram (uniform
    keys), the min-doc table is gram-keyed and joins 1:1 per
    occurrence, ranges collapse per doc (bounded rows), and the final
    rebuild is a doc-keyed join of the (small) per-doc range lists back
    to the document row with the keep test and the cleaned text built
    IN-EXPRESSION over the words array — no token explode, no
    token-level Exchange, no collect_list re-sort (r13: the explode →
    id-shuffle → collect_list rebuild was ~40 % of the wall at sf10;
    the range side is docs-with-removals only, so AQE broadcasts it).
    """
    from pyspark.sql import Window

    # NOTE (r13, negative result): staging `pos` behind an explicit
    # repartition("shingle") measured 3.2 → 4.7 s at sf1 HERE (and the
    # same change on repeated_spans won at sf1 only to invert at sf10
    # — see that operator's NOTE); reverted in both.  The branches
    # prune different columns, so the exchanges never canonicalize
    # equal and the full positioned-row shuffle is pure added cost on
    # top of the doc-rebuild branch this operator uniquely carries.
    pos = positioned_shingles(df, id_col, text_col, n=n)
    # per-doc-distinct gram stream for the census (the q92 r13 trick):
    # count(1) over it equals countDistinct(id), min(id) is unchanged,
    # and the exchange compacts from (gram, doc)-pair rows to
    # partition-distinct gram rows via plain map-side partials
    dg = df.select(F.col(id_col),
                   F.explode(F.array_distinct(
                       word_shingles(text_col, n))).alias("shingle"))
    gstat = (dg.groupBy("shingle")
             .agg(F.count(F.lit(1)).alias("__nd"),
                  F.min(id_col).alias("__keeper"))
             .filter(F.col("__nd") >= min_docs)
             .select("shingle", "__keeper"))
    # SHUFFLE_HASH (r13): same corpus-dependent-dim pathology as
    # repeated_spans' hot join — AQE's broadcast pick single-threaded-
    # builds the whole gram-stat relation; per-partition hash builds
    # measured 11.6-21.0 → 8.9-12.0 s at sf10 (4.1 → 3.5 s at sf1),
    # and stay bounded when the dim outgrows any broadcast threshold
    gstat = gstat.hint("shuffle_hash")
    dropped = (pos.join(gstat, "shingle")
               .filter(F.col(id_col) != F.col("__keeper"))
               .select(F.col(id_col), "pos"))
    w_prev = (Window.partitionBy(id_col).orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(id_col).orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    prev_end = F.max(F.col("pos") + (n - 1)).over(w_prev)
    new_span = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), 1).otherwise(0)
    ranges = (dropped
              .withColumn("__sid", F.sum(new_span).over(w_run))
              .groupBy(id_col, "__sid")
              .agg(F.min("pos").alias("s"),
                   (F.max("pos") + (n - 1)).alias("e"))
              .groupBy(id_col)
              .agg(F.collect_list(F.struct("s", "e")).alias("__rm")))
    words = F.split(normalized_text(text_col), " ")
    # the keep test and the cleaned text are pure array expressions
    # over the staged words array: a token at 1-based position p is
    # gone iff some merged range covers p; empty tokens (the ""
    # artifact of splitting an empty normalized text) are neither kept
    # nor counted, exactly like the pre-r13 explode path's
    # tok != '' pre-filter
    rm = F.col("__rm")
    covered = lambda p: (rm.isNotNull()
                         & F.exists(rm, lambda r: (p >= r["s"])
                                    & (p <= r["e"])))
    w = F.col("__words")
    kept_arr = F.filter(
        w, lambda tok, i: (tok != "") & ~covered(i + F.lit(1)))
    gone_arr = F.filter(
        w, lambda tok, i: (tok != "") & covered(i + F.lit(1)))
    staged = df.select(F.col(id_col), words.alias("__words"))
    return (staged.join(ranges, id_col, "left")
            .select(F.col(id_col),
                    F.size(kept_arr).cast("long").alias("n_tokens_kept"),
                    F.size(gone_arr).cast("long")
                    .alias("n_tokens_removed"),
                    F.array_join(kept_arr, " ").alias("cleaned")))


def incremental_neardup(new_df: DataFrame, old_df: DataFrame,
                        id_col: str, text_col: str,
                        n: int = 3, num_hashes: int = 16,
                        band_size: int = 4,
                        threshold: float = 0.5) -> DataFrame:
    """Incremental near-dup: a NEW ingest batch checked against the
    EXISTING corpus without re-deduping the corpus — the shape a daily
    crawl append actually runs.  Returns (new_id, old_id, jaccard) for
    verified matches ≥ ``threshold``; an ingest pipeline anti-joins its
    batch against the new_id column (S6 composes directly).

    Candidates come from a band-table JOIN between the batch's minhash
    bands and the corpus's — at scale the corpus side is a PERSISTED
    table (write ``minhash_bands(corpus)`` bucketed by (band_id,
    band_hash) once per corpus version; the daily cost is then
    O(batch) band computation + one equi-join that prunes to matching
    buckets, never O(corpus) recompute).  Exact n-gram Jaccard runs on
    candidates only, and the batch side of every join is the small
    side — AQE broadcasts it.
    """
    bn = (minhash_bands(new_df, id_col, text_col, n, num_hashes,
                        band_size)
          .select(F.col(id_col).alias("new_id"), "band_id", "band_hash"))
    bo = (minhash_bands(old_df, id_col, text_col, n, num_hashes,
                        band_size)
          .select(F.col(id_col).alias("old_id"), "band_id", "band_hash"))
    # The candidate table is MATERIALIZED once (localCheckpoint, eager)
    # before the verify stage fans out.  r13 history: the guide-§3.2
    # semi-prefilter of the verify sides by candidate ids (the q63 win)
    # first measured 4.2 -> 9.4 s at sf1 here, because every filter
    # branch re-derived the band join (joins are not deduped the way
    # Exchanges are, and the optimizer's column pruning under each
    # branch makes the subtrees canonically unequal — no reuse is
    # possible by construction).  Materializing cand removes the
    # recompute: LSH candidates are sparse by design (measured sf10:
    # 8.9 k pairs over a 400 k-doc corpus — 2 % of old ids), so the
    # checkpoint is a candidate-pair-sized table computed exactly once
    # per invocation, inside the measured query, never across runs.
    # At cluster scale localCheckpoint's executor-local storage trades
    # re-computation on executor loss for zero distributed-FS traffic —
    # the right trade for a table this small.
    cand = (bn.join(bo, ["band_id", "band_hash"])
            .select("new_id", "old_id").distinct()
            .localCheckpoint())
    ida = cand.select(F.col("new_id").alias(id_col)).distinct()
    idb = cand.select(F.col("old_id").alias(id_col)).distinct()
    # Semi-filter BOTH verify sides down to candidate docs before any
    # gram work: the semi join pushes below the gram explode to the
    # doc scan (PushDownLeftSemiAntiJoin), so the corpus side's gram
    # GENERATION — not just its shuffle — runs on the 2 %, and the
    # size dims aggregate only candidate docs (the final inner joins
    # restrict to those ids anyway; results are identical).
    sh_n = shingle_table(new_df.join(ida, id_col, "semi"),
                         id_col, text_col, n)
    sh_o = shingle_table(old_df.join(idb, id_col, "semi"),
                         id_col, text_col, n)
    sz_n = (sh_n.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_n"))
            .select(F.col(id_col).alias("new_id"), "sz_n"))
    sz_o = (sh_o.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz_o"))
            .select(F.col(id_col).alias("old_id"), "sz_o"))
    sa = sh_n.select(F.col(id_col).alias("new_id"), "shingle")
    sb = sh_o.select(F.col(id_col).alias("old_id"), "shingle")
    inter = (cand.join(sa, "new_id")
             .join(sb, ["old_id", "shingle"])
             .groupBy("new_id", "old_id")
             .agg(F.count(F.lit(1)).alias("inter")))
    j = (inter.join(sz_n, "new_id").join(sz_o, "old_id")
         .withColumn("jaccard",
                     F.col("inter")
                     / (F.col("sz_n") + F.col("sz_o") - F.col("inter"))))
    return (j.filter(F.col("jaccard") >= threshold)
            .select("new_id", "old_id",
                    F.round("jaccard", 6).alias("jaccard")))


def novelty_scores(new_df: DataFrame, old_df: DataFrame,
                   id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Content-novelty scoring for an ingest batch: per new document,
    the fraction of its DISTINCT word ``n``-grams never seen in the
    existing corpus — the curation dial between near-dup rejection
    (novelty ≈ 0) and valuable new content (novelty ≈ 1), and the
    aggregate a crawl pipeline tracks per source to detect collapsed
    feeds re-serving old content.

    Shape at 100 TB: the corpus side collapses to a DISTINCT gram set
    (persisted and bucketed by gram in production, exactly like q97's
    band table); the batch's grams left-join it on the gram key —
    uniform md5-able keys, cost linear in batch grams.  The novelty
    ratio is exact-integer round-half-up at 6dp (q83's trick).  Docs
    with fewer than ``n`` tokens have no grams: they surface with
    ``n_grams = 0`` and NULL novelty rather than disappearing.
    """
    sh_new = shingle_table(new_df, id_col, text_col, n)
    old_grams = (shingle_table(old_df, id_col, text_col, n)
                 .select("shingle").distinct()
                 .withColumn("__seen", F.lit(1)))
    j = sh_new.join(old_grams, "shingle", "left")
    agg = j.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
        .alias("n_novel"))
    micro = F.expr("(2 * n_novel * 1000000 + n_grams) "
                   "div (2 * n_grams)")
    scored = agg.select(
        F.col(id_col), "n_grams", "n_novel",
        (micro.cast("double") / F.lit(1000000.0)).alias("novelty"))
    base = new_df.select(F.col(id_col)).distinct()
    return (base.join(scored, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_grams", F.lit(0)).cast("long")
                    .alias("n_grams"),
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    .alias("n_novel"),
                    F.col("novelty")))


def canonical_per_cluster(docs: DataFrame, pairs: DataFrame,
                          id_col: str, quality_col: str,
                          id_headroom: int = 10_000_000_000) -> DataFrame:
    """Canonical-document selection: near-dup clusters (connected
    components over ``pairs``) each keep their HIGHEST-quality member —
    the step a production dedup pipeline runs after clustering (the
    min-id representative of :func:`neardup_clusters` is a stable
    label; the doc actually kept should be the best one, not the
    oldest id).

    ``quality_col`` must be a non-negative integer column (e.g. token
    count); ties break on the SMALLEST id via the exact integer key
    ``quality * id_headroom - id`` (ids must be < ``id_headroom``, and
    ``quality * id_headroom`` must stay < 2^63 — both asserted cheaply
    at plan level by the multiply overflowing into SQL ANSI error).

    Output: ``(id, cluster_rep, canonical_id, is_canonical)`` for every
    input doc; singletons are their own canonical.

    Shape at 100 TB: label propagation costs O(pairs); the argmax is
    ONE groupBy on the cluster id; the canonical dim joins back on the
    same key.
    """
    clusters = neardup_clusters(pairs, out_id="__cid",
                                cluster_col="__cluster")
    j = (docs.join(clusters, docs[id_col] == clusters["__cid"], "left")
         .drop("__cid")
         .withColumn("cluster_rep",
                     F.coalesce("__cluster", F.col(id_col)).cast("long"))
         .drop("__cluster"))
    key = (F.col(quality_col).cast("long") * F.lit(id_headroom)
           - F.col(id_col))
    canon = (j.withColumn("__key", key)
             .groupBy("cluster_rep")
             .agg(F.max_by(id_col, "__key").alias("canonical_id")))
    return (j.join(canon, "cluster_rep")
            .select(F.col(id_col), "cluster_rep", "canonical_id",
                    (F.col(id_col) == F.col("canonical_id"))
                    .alias("is_canonical")))


def incremental_hamming_neardup(batch_sig: DataFrame,
                                corpus_sig: DataFrame,
                                id_col: str, sig_col: str,
                                corpus_id_col: str | None = None,
                                max_hamming: int = 7,
                                n_bands: int | None = None) -> DataFrame:
    """Incremental ingest dedup for ANY 64-bit signature (SimHash text,
    pHash images, audio energy contours): each new batch row pairs
    against the PERSISTED corpus signature table via the banded
    Hamming join — cost O(batch), never O(corpus^2), because only band
    keys present in the batch reach the join.

    Returns ``(batch_id, corpus_id, hamming)``.  The corpus table is a
    plain (id, sig) parquet the pipeline appends accepted batches to —
    the same contract as the MinHash ``incremental_neardup`` path.
    """
    cid = corpus_id_col or id_col
    n_bands = _hamming_bands(n_bands, max_hamming)
    a = banded_signatures(batch_sig, id_col, sig_col, n_bands,
                          "batch_id", "sh_a")
    b = banded_signatures(corpus_sig, cid, sig_col, n_bands,
                          "corpus_id", "sh_b")
    cand = (a.join(b, on=["band_id", "chunk"])
            .select("batch_id", "corpus_id", "sh_a", "sh_b").distinct())
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return (cand.withColumn("hamming", hamming.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("batch_id", "corpus_id", "hamming"))


def group_overlap(df: DataFrame, id_col: str, text_col: str,
                  group_col: str, n: int = 3) -> DataFrame:
    """Pairwise cross-slice contamination matrix: for every pair of
    corpus slices (sources, snapshots, shards) the n-gram Jaccard of
    their DISTINCT gram sets — the curation dashboard that catches one
    crawl re-serving another's content, or a "new" source that is a
    mirror, BEFORE any doc-level dedup runs.

    Returns one row per unordered pair (group_a < group_b):
    ``(group_a, group_b, n_a, n_b, n_common, jaccard)`` — including
    zero-overlap pairs (the matrix is complete, built from the tiny
    group dim).

    Shape at 100 TB: grams collapse to DISTINCT (group, gram) rows
    first (one groupBy, uniform md5-able keys), then ONE gram-keyed
    aggregation folds each gram's member groups into a sorted set
    (size ≤ G, the group count — a handful); pair counts and per-group
    sizes both explode out of that per-gram set, so the corpus-scale
    work (scan → shingle explode → one distinct → gram shuffle) sits
    under a single Exchange that Spark REUSES across the two branches
    — a naive gram self-join re-ran the whole shingle pipeline four
    times (once per join side and twice for the size dim).  The final
    matrix assembly is a cross join of the G-row size dim with itself.
    Jaccard is exact-integer counts through one double division,
    rounded to 6dp — identical in any engine.

    r13: the group column rides the gram explode directly (the doc row
    already carries it), so the old per-doc ``shingle_table`` distinct
    (a corpus-scale (id, gram) Exchange) and the id-keyed join back to
    the doc dim are both GONE — per-doc-distinct-then-group-distinct
    and direct group-distinct are the same set, and the (group, gram)
    hash aggregate's map-side partial dedups in-doc repeats just as
    well.  Measured 2 corpus Exchanges removed.
    """
    words = F.split(normalized_text(text_col), " ")
    staged = df.select(F.col(group_col).alias("__g"),
                       words.alias("__words"))
    w = F.col("__words")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    mk = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1)
                                          for k in range(n)]))
    shingles = F.when(F.size(w) >= n, mk) \
        .otherwise(F.array().cast("array<string>"))
    grams = (staged.select("__g", F.explode(shingles).alias("shingle"))
             .distinct())
    bg = grams.groupBy("shingle").agg(
        F.array_sort(F.collect_set("__g")).alias("__gs"))
    # ONE explode emits singles (gb NULL → per-group gram counts) and
    # ordered pairs (→ pair intersections) together, so both outputs
    # filter the SAME aggregated table and the whole corpus-scale
    # subtree is shared (identical branches → exchange reuse)
    # nullif(g, g) = NULL of the group's own type; the pair branch is
    # gated on size >= 2 because Spark's sequence(0, -1) would DESCEND
    items = F.expr(
        "concat(transform(__gs, g -> struct(g AS ga, "
        "nullif(g, g) AS gb)), "
        "CASE WHEN size(__gs) >= 2 THEN "
        "flatten(transform(sequence(0, size(__gs) - 2), j -> "
        "transform(sequence(j + 1, size(__gs) - 1), i -> "
        "struct(__gs[j] AS ga, __gs[i] AS gb)))) "
        "ELSE array() END)")
    counts = (bg.select(F.explode(items).alias("__p"))
              .groupBy(F.col("__p.ga").alias("group_a"),
                       F.col("__p.gb").alias("group_b"))
              .agg(F.count(F.lit(1)).alias("__common")))
    sz = (counts.filter(F.col("group_b").isNull())
          .select(F.col("group_a").alias("__g"),
                  F.col("__common").alias("__sz")))
    inter = counts.filter(F.col("group_b").isNotNull())
    pairs = (sz.select(F.col("__g").alias("group_a"),
                       F.col("__sz").alias("n_a"))
             .crossJoin(sz.select(F.col("__g").alias("group_b"),
                                  F.col("__sz").alias("n_b")))
             .filter(F.col("group_a") < F.col("group_b")))
    out = (pairs.join(inter, ["group_a", "group_b"], "left")
           .withColumn("n_common", F.coalesce("__common", F.lit(0))))
    return out.select(
        "group_a", "group_b", "n_a", "n_b", "n_common",
        F.round(F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6)
        .alias("jaccard"))


def containment_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, threshold: float = 0.8) -> DataFrame:
    """Asymmetric CONTAINMENT dedup: document A is (near-)contained in
    B when ``|shingles(A) ∩ shingles(B)| / |shingles(A)| ≥ threshold``
    — the quote/excerpt/boilerplate-wrapper case symmetric Jaccard
    systematically misses (a 100-word doc fully embedded in a
    10 000-word doc has Jaccard ≈ 0.01 but containment 1.0).

    Returns ``(contained_id, container_id, containment)`` oriented
    small→large (ties break on id), one row per direction that clears
    the threshold.

    Shape at 100 TB: candidates come from the shared-gram equi-join of
    the distinct shingle table (the q44 machinery — a pair must share
    ≥1 gram to have containment > 0, so no all-pairs anywhere); the
    intersection count is one grouped aggregation over candidate
    pairs; sizes broadcast off the per-doc gram-count dim.  Note
    MinHash banding is NOT used here by design: minhashes estimate
    Jaccard, and a contained-but-small doc's band signature diverges
    from its container's, so banded candidates would silently lose
    exactly the pairs this operator exists to find.  Containment is an
    exact integer ratio through one rounded double division.
    """
    sh = shingle_table(df, id_col, text_col, n)
    sz = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    a = sh.select(F.col(id_col).alias("__ida"), "shingle")
    b = sh.select(F.col(id_col).alias("__idb"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("__ida") != F.col("__idb"))
             .groupBy("__ida", "__idb")
             .agg(F.count(F.lit(1)).alias("__inter")))
    j = (inter
         .join(sz.select(F.col(id_col).alias("__ida"),
                         F.col("__sz").alias("__sza")), "__ida")
         .join(sz.select(F.col(id_col).alias("__idb"),
                         F.col("__sz").alias("__szb")), "__idb"))
    # orient small -> large: A is the contained side
    oriented = j.filter(
        (F.col("__sza") < F.col("__szb"))
        | ((F.col("__sza") == F.col("__szb"))
           & (F.col("__ida") < F.col("__idb"))))
    cont = F.round(F.col("__inter") / F.col("__sza"), 6)
    return (oriented.withColumn("containment", cont)
            .filter(F.col("containment") >= threshold)
            .select(F.col("__ida").alias("contained_id"),
                    F.col("__idb").alias("container_id"),
                    "containment"))


def paragraph_dedup(df: DataFrame, id_col: str, text_col: str,
                    sep: str | None = None, block_words: int = 12,
                    join_with: str | None = None) -> DataFrame:
    """Cross-document paragraph-level dedup with reassembly — the
    MassiveText/Gopher curation step (Rae et al. 2021, appendix A.2.3;
    also RefinedWeb, Penedo et al. 2023): every distinct paragraph
    keeps exactly its corpus-wide FIRST occurrence (lexicographic
    ``(id, position)``) and every other instance — across documents
    *and* repeats inside one document — is dropped; each document is
    then reassembled from its surviving paragraphs in original order.
    No counterpart in the reference engine (LLM-pipeline extra).

    ``sep`` — paragraph boundary regex for real corpora (e.g.
    ``'\\n\\n+'``).  ``sep=None`` falls back to non-overlapping
    ``block_words``-word blocks of the normalized token stream, the
    delimiter-free proxy used on the synthetic documents table.

    Returns one row per input document: ``id_col``, ``n_paras``
    (BIGINT instances before dedup), ``n_kept`` (BIGINT survivors),
    ``cleaned`` (the reassembled text, ``''`` when nothing survives).

    Shape at 100 TB: two uniform shuffles and nothing else.  The
    first-occurrence table is ``groupBy(para).agg(min(struct(id,pos)))``
    — a partial-aggregating hash agg, so a boilerplate paragraph
    occurring in 10^8 documents is combined map-side and never
    concentrates on one reducer (this is why the keeper is computed
    with groupBy+join rather than a ``min() over (partition by para)``
    window, which has no map-side combine and would serialize the hot
    paragraph into a single task).  The join back to instances is a
    para-keyed equi-join whose both sides AQE co-partitions with the
    agg's exchange; reassembly is one id-keyed groupBy (bounded rows
    per doc).  No global windows, no fan-out beyond one row per
    paragraph instance.
    """
    words = F.filter(F.split(normalized_text(text_col), " "),
                     lambda w: w != "")
    if sep is not None:
        paras = F.filter(F.transform(F.split(F.col(text_col), sep),
                                     lambda p: F.trim(p)),
                         lambda p: p != "")
    else:
        bw = int(block_words)
        nb = F.ceil(F.size(words) / F.lit(float(bw))).cast("int")
        paras = F.when(
            nb > 0,
            F.transform(F.sequence(F.lit(0), nb - F.lit(1)),
                        lambda i: F.array_join(
                            F.slice(words, i * bw + 1, F.lit(bw)), " "))
        ).otherwise(F.array().cast("array<string>"))
    joiner = join_with if join_with is not None else (
        " " if sep is None else "\n\n")

    inst = df.select(F.col(id_col).alias("__id"),
                     F.posexplode(paras).alias("blk", "para"))
    firsts = inst.groupBy("para").agg(
        F.min(F.struct("__id", "blk")).alias("__first"))
    # flag every instance instead of filtering: totals and survivors
    # then come out of ONE id-keyed aggregation (collect_list skips the
    # NULLs the non-keepers produce), not two groupBys + two joins.
    # (r13 NOTE: a dropped-blocks-only rebuild — non-keeper ints to
    # the groupBy, survivors filtered in-expression from __paras — was
    # tried and REVERTED: it rebuilds the paras array a second time
    # under the doc-keyed join and measured 2.6 -> 4.3 s at sf1;
    # recorded in OPTIMIZATION_r13.md)
    # SHUFFLE_HASH (r13): `firsts` is one row per DISTINCT paragraph —
    # a corpus-sized dim; AQE's broadcast pick single-threaded-builds
    # it per run (the q92 hot-join pathology).  Per-partition hash
    # builds measured 10.1-11.7 → 7.1-8.6 s at sf10 (2.9 → 1.8 s at
    # sf1) and stay bounded at any corpus size.
    flagged = (inst.join(firsts.hint("shuffle_hash"), "para")
               .withColumn("__keep",
                           (F.col("__first.__id") == F.col("__id"))
                           & (F.col("__first.blk") == F.col("blk"))))
    agg = flagged.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(F.when(F.col("__keep"), 1).otherwise(0))
        .cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(
                    F.when(F.col("__keep"), F.struct("blk", "para")))),
                lambda x: x["para"]),
            joiner).alias("cleaned"))
    return (df.select(id_col)
            .join(agg.withColumnRenamed("__id", id_col), id_col, "left")
            .select(id_col,
                    F.coalesce("n_paras", F.lit(0)).cast("long")
                    .alias("n_paras"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.coalesce("cleaned", F.lit("")).alias("cleaned")))


def lsh_calibration(df: DataFrame, id_col: str, text_col: str,
                    n: int = 3, num_hashes: int = 16,
                    band_size: int = 4) -> DataFrame:
    """Parameter-calibration table for the MinHash/LSH pipeline: for
    every LSH candidate pair, compare the MinHash Jaccard ESTIMATOR
    (matching-signature fraction) against the EXACT shingle Jaccard,
    grouped by match count — the table a pipeline owner reads before
    trusting (num_hashes, band_size) on a new corpus ("at 12/16
    matches the true Jaccard averages 0.71; below 6 matches candidates
    are ~all false positives — re-cut the bands").

    Returns one row per observed match count: ``matches`` (0..k),
    ``estimate`` (= matches/k — the unbiased MinHash estimator),
    ``n_pairs``, ``mean_jaccard``, ``min_jaccard``, ``max_jaccard``,
    ``bias`` (= estimate − mean_jaccard, 6dp).

    EXACT: signatures and match counts are md5-string equality on both
    engines; per-pair Jaccard quantizes to integer nanos once
    (``floor(j·1e9 + 0.5)``), so the mean is a round-half-up integer
    division and min/max come from the integer nanos.

    Shape at 100 TB: the candidate set is the banded equi-join (never
    all-pairs); signatures attach via two id-keyed joins against the
    k-column sig table (one groupBy(id) with k parallel min-aggregates
    — the q45 shuffle shape); exact Jaccard fans out only over
    candidates (the q63 shape); the final groupBy has ≤ k+1 keys.
    """
    sh = shingle_table(df, id_col, text_col, n)
    h0 = sh.select(F.col(id_col), F.md5("shingle").alias("h0"),
                   "shingle")
    mh_aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("h0"))))
        .alias(f"mh{seed}") for seed in range(num_hashes)]
    sig = h0.groupBy(id_col).agg(*mh_aggs)
    cand = lsh_candidate_pairs(df, id_col, text_col, n, num_hashes,
                               band_size)
    siga = sig.select(F.col(id_col).alias("id_a"),
                      *[F.col(f"mh{i}").alias(f"__a{i}")
                        for i in range(num_hashes)])
    sigb = sig.select(F.col(id_col).alias("id_b"),
                      *[F.col(f"mh{i}").alias(f"__b{i}")
                        for i in range(num_hashes)])
    matches = sum((F.col(f"__a{i}") == F.col(f"__b{i}")).cast("long")
                  for i in range(num_hashes))
    est = cand.join(siga, "id_a").join(sigb, "id_b") \
        .select("id_a", "id_b", matches.alias("matches"))
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (cand.join(sa, on="id_a")
             .join(sb, on=["id_b", "shingle"])
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("__i")))
    za = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("sz").alias("__sa"))
    zb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("sz").alias("__sb"))
    jac = (inter.join(za, "id_a").join(zb, "id_b")
           .select("id_a", "id_b",
                   F.floor(F.col("__i").cast("double")
                           / (F.col("__sa") + F.col("__sb")
                              - F.col("__i"))
                           * F.lit(1e9) + F.lit(0.5)).cast("long")
                   .alias("__jn")))
    per = est.join(jac, ["id_a", "id_b"])
    g = (per.groupBy("matches")
         .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
              F.sum(F.col("__jn").cast("decimal(38,0)")).alias("__sj"),
              F.min("__jn").alias("__jmin"),
              F.max("__jn").alias("__jmax")))
    mean_n = F.expr("(2 * __sj + n_pairs) div "
                    "(2 * CAST(n_pairs AS DECIMAL(38,0)))")
    estimate = (F.col("matches").cast("double")
                / F.lit(float(num_hashes)))
    out = (g.withColumn("estimate", estimate)
           .withColumn("mean_jaccard",
                       mean_n.cast("double") / F.lit(1e9))
           .withColumn("min_jaccard",
                       F.col("__jmin").cast("double") / F.lit(1e9))
           .withColumn("max_jaccard",
                       F.col("__jmax").cast("double") / F.lit(1e9)))
    return (out.select(
        "matches", "estimate", "n_pairs", "mean_jaccard",
        "min_jaccard", "max_jaccard",
        F.round(F.col("estimate") - F.col("mean_jaccard"), 6)
        .alias("bias"))
        .orderBy("matches"))
