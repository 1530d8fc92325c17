"""Text analysis for large-scale training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting.  All built-in column expressions — JVM-side,
no Python UDFs — so they stream through whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Per-language stopword lists for the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist"],
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "les", "et", "est", "une"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

_NORM_WS = r"\s+"


def normalized_text(text: Column | str) -> Column:
    """Whitespace-collapsed lowercase form used for fingerprint/dedup."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), _NORM_WS, " ")


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string>."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), _NORM_WS)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


#: GPT-2-style pre-tokenizer pattern (public gpt-2 encoder.py regex),
#: adapted to engine-portable syntax: RE2 (DuckDB) has no lookahead, so
#: the trailing-space branch is a plain \s; \p{L}/\p{N} are Unicode
#: classes in both Java regex and RE2.  Branch order matters (leftmost
#: alternation preference in both engines): contractions, then
#: space+letters, space+digits, space+punct, lone whitespace.
BPE_ISH_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
                   r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|\s")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokenization → array<string> (the token-budget
    estimator a training pipeline runs before the real tokenizer)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.size(bpe_ish_tokens(text))


def stopword_count(text: Column | str, stopwords: list[str]) -> Column:
    """Number of tokens that are stopwords (lambda filter — still JVM-side)."""
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: char/token counts, punctuation ratio,
    digit ratio, mean token length, stopword ratio."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    return (df
            .withColumn("n_chars_actual", n_chars.cast("long"))
            .withColumn("n_tokens", n_tok.cast("long"))
            .withColumn("punct_ratio",
                        F.regexp_count(t, F.lit(r"[^\w\s]")) / n_chars)
            .withColumn("digit_ratio",
                        F.regexp_count(t, F.lit(r"[0-9]")) / n_chars)
            .withColumn("mean_token_len",
                        (n_chars - n_tok + 1) / n_tok)
            .withColumn("stopword_ratio",
                        stopword_count(t, LANG_STOPWORDS["en"]) / n_tok))


def lang_id(df: DataFrame, text_col: str = "text",
            out_col: str = "pred_lang") -> DataFrame:
    """Stopword-vote language identification with a deterministic
    priority-order tie-break (first language in sorted order wins).

    Tokenizes ONCE into a shared column; each language score is a lambda
    filter over that array — one regex split per row, not one per
    language."""
    langs = sorted(LANG_STOPWORDS)
    scored = df.withColumn(
        "__toks", F.transform(tokens(text_col), lambda t: F.lower(t)))
    for lg in langs:
        sw = F.array(*[F.lit(s) for s in LANG_STOPWORDS[lg]])
        scored = scored.withColumn(
            f"__s_{lg}",
            F.size(F.filter(F.col("__toks"),
                            lambda t: F.array_contains(sw, t))))
    best = F.greatest(*[F.col(f"__s_{lg}") for lg in langs])
    pick = None
    for lg in langs:
        cond = F.col(f"__s_{lg}") == best
        pick = F.when(cond, F.lit(lg)) if pick is None else pick.when(cond, F.lit(lg))
    scored = scored.withColumn(out_col, pick)
    return scored.drop("__toks", *[f"__s_{lg}" for lg in langs])


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 3):
    """Per-document top-k terms by TF-IDF (tf · ln(N/df)) — the classic
    corpus-level term salience signal a training-data pipeline uses for
    topic filtering and keyword extraction.

    Shuffle shape: one groupBy on (doc, term), a term-keyed join against
    the document-frequency table (1:1 fan-out — one row per (doc, term)
    regardless of how hot the term is), a broadcast one-row corpus
    count, and a per-document window.  Scores round to 6 decimals
    BEFORE ranking with a term tie-break, so the ordering is
    deterministic across engines.
    """
    from pyspark.sql import Window

    toks = (df.select(F.col(id_col),
                      F.explode(F.split(normalized_text(text_col), " "))
                      .alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (tf.join(dfreq, "term")
              .crossJoin(F.broadcast(n))
              .withColumn("tfidf",
                          F.round(F.col("tf")
                                  * F.log(F.col("n_docs")
                                          / F.col("df")), 6)))
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(),
                                           F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(id_col, "term", "tfidf",
                    F.col("rank").cast("int").alias("rank")))


def chunk_text(df, id_col: str, text_col: str,
               chunk_chars: int = 512, overlap: int = 64):
    """Split documents into fixed-size overlapping character windows —
    the retrieval/embedding preprocessing step (context-window-sized
    chunks with overlap so no boundary sentence is lost).

    Pure column ops: a ``sequence`` of window starts (stride =
    chunk_chars - overlap) exploded executor-side, then ``substring`` —
    no UDF, fan-out stays in the plan.  Emits (id, chunk_idx,
    chunk_start [1-based], chunk).  The last start is the largest
    ``k·stride < max(len − overlap, 1)``: a final partial window is
    kept only when it contributes at least one character BEYOND the
    previous chunk's tail (a window of ≤ overlap chars is a strict
    suffix of its predecessor — indexing it would embed duplicate
    content).  Empty/null docs produce one empty chunk at start 1, so
    no document silently disappears from the corpus.
    """
    assert 0 <= overlap < chunk_chars
    stride = chunk_chars - overlap
    c = F.col(text_col)
    starts = F.sequence(
        F.lit(0),
        F.floor((F.greatest(F.length(F.coalesce(c, F.lit("")))
                            - overlap, F.lit(1)) - 1)
                / stride).cast("int"))
    d = df.withColumn("__k", F.explode(starts))
    return d.select(
        F.col(id_col),
        F.col("__k").cast("long").alias("chunk_idx"),
        (F.col("__k") * stride + 1).cast("long").alias("chunk_start"),
        F.substring(F.coalesce(c, F.lit("")),
                    (F.col("__k") * stride + 1).cast("int"),
                    chunk_chars).alias("chunk"))


#: engine-portable patterns (RE2 ∩ Java regex: no lookarounds)
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_PATTERN = r"https?://[^\s]+"


def _let(val: Column, body) -> Column:
    """Expression-level let-binding: evaluate ``val`` ONCE and bind it
    as a lambda variable inside ``body`` (a Column -> Column callable).

    Spark performs no common-subexpression elimination across lambda
    scopes (the shingle_table lesson, measured ~50x on real
    documents), so a Column-returning helper that references an
    expensive expression inside an ``F.transform`` lambda re-evaluates
    it per element.  Staging as a DataFrame column is not available to
    a pure Column function; wrapping the value in a 1-element array
    and transforming it binds the value as a lambda variable, which IS
    evaluated once per row."""
    return F.element_at(F.transform(F.array(val), body), 1)


def dup_ngram_ratio(text_col, n: int = 5) -> Column:
    """1 − distinct/total over word n-grams as one column expression
    (NULL below ``n`` tokens) — reusable from batch selects and
    streaming stages alike.  The token array is let-bound (r13): the
    n-gram lambda previously re-evaluated the normalize+split per
    gram position — O(tokens × text length) per document."""
    def body(toks: Column) -> Column:
        total = F.greatest(F.size(toks) - (n - 1), F.lit(0))
        ngrams = F.transform(
            F.sequence(F.lit(1),
                       F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        ngrams = F.when(total > 0, ngrams).otherwise(F.array())
        return F.when(
            total > 0,
            F.round(1.0 - F.size(F.array_distinct(ngrams))
                    / total.cast("double"), 6))
    return _let(tokens(text_col), body)


def repetition_signals(df, id_col: str, text_col: str, n: int = 5):
    """Within-document repetition + pattern counts — the Gopher-style
    quality-filter signals a pretraining pipeline cuts on.

    - ``dup_ngram_ratio``: 1 − distinct/total over word ``n``-grams
      (NULL when the doc has fewer than ``n`` tokens — short docs are
      not 'repetitive', they are short).  Heavily repeated boilerplate
      → ratio near 1.
    - ``n_emails`` / ``n_urls``: regex match counts (leakage/boilerplate
      signals).
    All JVM-side array/regex ops — the n-grams are built with
    sequence+slice+concat inside one column expression, never exploded.
    """
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        dup_ngram_ratio(text_col, n).alias("dup_ngram_ratio"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(URL_PATTERN), 0))
        .cast("long").alias("n_urls"))


def word_ngrams(text_col, n: int):
    """Distinct word n-grams of a document as one array column (built
    in-expression: sequence + slice + concat; empty below n tokens).
    Token array let-bound (r13) — see :func:`_let`."""
    def body(toks: Column) -> Column:
        total = F.size(toks) - (n - 1)
        ng = F.transform(
            F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        return F.when(total > 0, F.array_distinct(ng)).otherwise(F.array())
    return _let(tokens(text_col), body)


def contamination_overlap(train, eval_docs, id_col: str, text_col: str,
                          n: int = 8, hash_grams: bool = False):
    """Benchmark decontamination: training docs sharing any word
    ``n``-gram with the eval set, with the shared-gram count.

    The canonical pre-training hygiene pass (eval answers leaking into
    the corpus).  Shape at 100 TB: explode each side's DISTINCT
    n-grams, equi-join on the gram — the shuffle key is the gram, never
    a doc pair, so cost is linear in total grams; the eval side is
    tiny and its distinct grams broadcast.

    ``hash_grams=True`` joins on ``xxhash64(gram)`` instead of the
    string: ~8 bytes per key through the exchange instead of ~50 — the
    scale configuration.  A 64-bit collision can only ADD a flagged
    doc (one in ~1e19 per cross-pair; for an eval set of 1e6 grams
    against 1e12 train grams that is still ≪1 expected false flag, and
    decontamination over-flagging is safe — it drops a clean doc, never
    keeps a dirty one).  The exact-string default stays the
    oracle-checkable path.
    """
    from pyspark.sql.functions import broadcast

    # hash INSIDE the n-gram array, before the generator fan-out — the
    # exploded rows then never materialize the ~50-byte strings at all
    def grams(c):
        g = word_ngrams(c, n)
        return (F.transform(g, lambda x: F.xxhash64(x))
                if hash_grams else g)

    tg = train.select(F.col(id_col).alias("train_id"),
                      F.explode(grams(text_col)).alias("g"))
    eg = (eval_docs.select(F.explode(grams(text_col)).alias("g"))
          .distinct())
    return (tg.join(broadcast(eg), "g")
            .groupBy("train_id")
            .agg(F.count(F.lit(1)).alias("n_shared_grams")))


def unigram_logprob(df, id_col: str, text_col: str,
                    vocab_counts=None):
    """Per-document mean negative log-likelihood under the corpus's own
    unigram MLE — the engine-portable stand-in for the KenLM-perplexity
    quality filter (CCNet-style): boilerplate and in-distribution text
    score low, rare-token noise scores high.

    ``vocab_counts`` (term, n_term) defaults to counts over ``df``
    itself (self-scoring); pass a reference corpus's counts to score
    against a fixed LM.  Terms absent from that vocab are then EXCLUDED
    from both the sum and ``n_tokens`` (the inner join drops them) — a
    real pipeline adds smoothing, which would bury the exactness
    guarantee; self-scoring never sees an unseen term.

    Determinism: each term's −ln p is rounded to 9 decimals and summed
    as DECIMAL (exact, order-free — a raw double sum would depend on
    partial-aggregation order).  The 1e-9 grid is ~1e3 coarser than
    cross-engine libm noise in ``ln``.  The final mean is rounded to 6
    in EXACT integer arithmetic — the 1e-9-grid sum over an integer
    token count lands exactly ON the half-micro boundary for some docs
    (3 of 500 at sf0.01), where Spark's shortest-repr HALF_UP and a
    double-arithmetic round disagree — so both engines compute
    ``(2·N + 1000·n) div (2000·n)`` with ``N = sum·1e9`` and divide by
    1e6 at the very end (one double division, bit-identical).

    Shape at 100 TB: token explode → two groupBys (per-doc tf, corpus
    vocab) → equi-join on the term.  The vocab is Zipf-small relative
    to the corpus (AQE broadcasts it when it fits; the join stays an
    equi-join, never per-row lookups) and the scalar total rides a
    1-row cross join — against the VOCAB side, so the per-term nanos
    (a BigDecimal round each) are computed once per TERM before the
    join, never once per (doc, term) row of the corpus.
    """
    toks = (df.select(F.col(id_col), F.explode(tokens(text_col))
                      .alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    if vocab_counts is None:
        vocab_counts = toks.groupBy("term").agg(
            F.count(F.lit(1)).alias("n_term"))
    total = vocab_counts.agg(
        F.sum("n_term").cast("double").alias("__tot"))
    # per-term -ln p as integer NANOS: decimal(19,9) * int stays inside
    # precision 38 so the multiply is exact; everything after this line
    # is 64-bit integer arithmetic (summing the decimal and scaling the
    # SUM would clamp precision at decimal(38,9) * int and round)
    nano = (F.round(-F.log(F.col("n_term") / F.col("__tot")), 9)
            .cast("decimal(19,9)") * F.lit(1000000000)).cast("long")
    vocab_nano = (vocab_counts.crossJoin(total)
                  .select("term", nano.alias("__nano")))
    per_term = (tf.join(vocab_nano, "term")
                .select(F.col(id_col), "tf",
                        (F.col("__nano") * F.col("tf")).alias("__n9")))
    agg = per_term.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.sum("__n9").alias("__n9"))
    micro = F.expr("(2 * __n9 + 1000 * n_tokens) div (2000 * n_tokens)")
    return agg.select(
        F.col(id_col), "n_tokens",
        (micro.cast("double") / F.lit(1000000.0)).alias("mean_nll"))


def pmi_bigrams(df, id_col: str, text_col: str,
                min_count: int = 2, k: int = 100):
    """Collocation extraction: corpus-level pointwise mutual information
    over adjacent word pairs — the phrase-mining signal a training-data
    pipeline uses to find multi-word expressions worth preserving as
    units (and to spot boilerplate n-grams that dominate a crawl).

    PMI(w1, w2) = ln( p(w1 w2) / (p(w1)·p(w2)) ) with p(w1 w2) over the
    bigram total and p(w) over the token total; pairs below ``min_count``
    occurrences are cut (singleton pairs have degenerate, noise-maximal
    PMI), and the global top-``k`` is returned with a (pmi, w1, w2)
    total order (PMI rounded to 6dp BEFORE ranking so the cut itself is
    engine-exact).

    Shape at 100 TB: the bigram fan-out happens IN-EXPRESSION
    (sequence + struct transform, exploded executor-side — never a
    positions self-join), then two groupBys (pair counts, unigram
    counts), two vocab-sized equi-joins (Zipf-small right sides — AQE
    broadcasts them when they fit), two 1-row scalar cross joins, and a
    distributed TakeOrdered for the top-k.  No UDF anywhere.

    The words array is materialized as a column before the lambda
    (same no-CSE-across-lambda-scopes pitfall as
    dedup.shingle_table).
    """
    words = tokens(normalized_text(text_col))
    staged = df.select(F.col(id_col), words.alias("__w"))
    w = F.col("__w")
    pair_arr = F.when(
        F.size(w) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(w) - 2),
                    lambda i: F.struct(F.get(w, i).alias("w1"),
                                       F.get(w, i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = staged.select(F.explode(pair_arr).alias("bg")).select("bg.*")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pair_count"))
    uni = (staged.select(F.explode(w).alias("term"))
           .filter(F.col("term") != "")
           .groupBy("term").agg(F.count(F.lit(1)).alias("n")))
    n_tok = uni.agg(F.sum("n").cast("double").alias("__n_tok"))
    n_big = c12.agg(F.sum("pair_count").cast("double").alias("__n_big"))
    u1 = uni.select(F.col("term").alias("w1"), F.col("n").alias("__c1"))
    u2 = uni.select(F.col("term").alias("w2"), F.col("n").alias("__c2"))
    scored = (c12.filter(F.col("pair_count") >= min_count)
              .join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(n_tok))
              .crossJoin(F.broadcast(n_big))
              .withColumn(
                  "pmi",
                  F.round(F.log(
                      (F.col("pair_count") * F.col("__n_tok")
                       * F.col("__n_tok"))
                      / (F.col("__n_big") * F.col("__c1")
                         * F.col("__c2"))), 6)))
    return (scored
            .orderBy(F.col("pmi").desc(), "w1", "w2").limit(k)
            .select("w1", "w2", "pair_count", "pmi"))


def dsir_weights(df, id_col: str, text_col: str, target_pred):
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per-document
    log-likelihood ratio between a TARGET domain's unigram LM and the
    SOURCE (rest-of-corpus) LM — documents scoring high look like the
    target domain and are up-sampled for domain-adapted pretraining.

    ``target_pred`` is a boolean Column selecting the target rows of
    ``df``; weights are computed for the complement (the source pool).
    Terms outside the INTERSECTION of both vocabularies are excluded
    from the sum and the token count (the inner joins drop them) —
    the published method hashes into a fixed bucket space so every
    feature has mass on both sides; restricting to the shared exact
    vocabulary is the unsmoothed analogue that keeps the result
    oracle-exact (see q83's rationale).

    Determinism: ln-ratios go through the q83 integer-nanos path —
    each term's round(ln p_t, 9) − round(ln p_s, 9) is an exact BIGINT
    of nanos, scaled by tf and summed; the bigint→double conversion
    and the final /1e9 are IEEE-exact and identical across engines.

    Shape at 100 TB: one token explode feeding a (doc, term) groupBy
    and two vocab groupBys (target side is filter-pruned at the scan);
    two Zipf-small equi-joins; two 1-row scalar cross joins.
    """
    toks = (df.select(F.col(id_col), target_pred.alias("__is_t"),
                      F.explode(tokens(normalized_text(text_col)))
                      .alias("term"))
            .filter(F.col("term") != ""))
    tgt = (toks.filter(F.col("__is_t"))
           .groupBy("term").agg(F.count(F.lit(1)).alias("nt")))
    src_toks = toks.filter(~F.col("__is_t"))
    src = src_toks.groupBy("term").agg(F.count(F.lit(1)).alias("ns"))
    tot_t = tgt.agg(F.sum("nt").cast("double").alias("__tt"))
    tot_s = src.agg(F.sum("ns").cast("double").alias("__ts"))
    tf = src_toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))

    def nanos(c):
        return (F.round(c, 9).cast("decimal(19,9)")
                * F.lit(1000000000)).cast("long")

    # NOTE: deliberately NOT pre-joined into one vocab_nano table —
    # a joined vocab side must finish its own broadcast-build chain
    # before the tf probe starts (the q106 A/B measured that serial
    # cascade at 2.3x the parallel shape); here tgt/src/totals all
    # build their broadcasts CONCURRENTLY while tf streams once
    per = (tf.join(tgt, "term").join(src, "term")
           .crossJoin(F.broadcast(tot_t)).crossJoin(F.broadcast(tot_s))
           .select(F.col(id_col), "tf",
                   ((nanos(F.log(F.col("nt") / F.col("__tt")))
                     - nanos(F.log(F.col("ns") / F.col("__ts"))))
                    * F.col("tf")).alias("__n9")))
    agg = per.groupBy(id_col).agg(
        F.sum("tf").alias("n_scored_tokens"),
        F.sum("__n9").alias("__n9"))
    return agg.select(
        F.col(id_col), "n_scored_tokens",
        (F.col("__n9").cast("double") / F.lit(1000000000.0))
        .alias("log_weight"))


def top_terms_vocab(df, text_col: str, k: int = 500):
    """Top-``k`` corpus terms by frequency with a (count DESC, term)
    total order — the fixed-size vocabulary a tokenizer-coverage pass
    tests against.  Returns (term, n) rows."""
    uni = (df.select(F.explode(tokens(normalized_text(text_col)))
                     .alias("term"))
           .filter(F.col("term") != "")
           .groupBy("term").agg(F.count(F.lit(1)).alias("n")))
    return (uni.orderBy(F.col("n").desc(), "term").limit(k)
            .select("term", "n"))


def vocab_coverage(df, group_col: str, text_col: str, vocab=None,
                   vocab_k: int = 500):
    """Per-group tokenizer-coverage report: total tokens, out-of-vocab
    tokens, OOV rate against a fixed vocabulary (default: the corpus's
    own top-``vocab_k`` terms).  The go/no-go check before committing a
    tokenizer to a corpus — a source with a high OOV rate will fragment
    into byte-fallback tokens and blow up its effective length.

    Shape at 100 TB: token explode → one groupBy on (group, term) —
    NOT one row per token through the join — then a vocab-sized
    left join (broadcast: the vocab is top-k by construction) and a
    per-group rollup.  OOV rate divides exact integer sums, rounded
    to 6dp.
    """
    toks = (df.select(F.col(group_col),
                      F.explode(tokens(normalized_text(text_col)))
                      .alias("term"))
            .filter(F.col("term") != "")
            .groupBy(group_col, "term")
            .agg(F.count(F.lit(1)).alias("tf")))
    if vocab is None:
        vocab = top_terms_vocab(df, text_col, k=vocab_k)
    v = vocab.select("term", F.lit(1).alias("__in_v"))
    joined = toks.join(F.broadcast(v), "term", "left")
    agg = (joined.groupBy(group_col)
           .agg(F.sum("tf").alias("total_tokens"),
                F.sum(F.when(F.col("__in_v").isNull(), F.col("tf"))
                      .otherwise(F.lit(0))).alias("oov_tokens")))
    # exact round-half-up at 6dp in INTEGER arithmetic (q83's trick):
    # an oov/total ratio can land exactly ON the half-micro boundary
    # (e.g. 1/16000 = 0.0000625) where the engines' double-rounding
    # conventions diverge
    micro = F.expr("(2 * oov_tokens * 1000000 + total_tokens) "
                   "div (2 * total_tokens)")
    return agg.withColumn(
        "oov_rate", micro.cast("double") / F.lit(1000000.0))


#: Long digit runs (6+ digits, optional +/spaces/dashes between) —
#: phone numbers, account ids.  RE2-compatible (no lookaround) so the
#: same pattern runs on Spark (Java regex) and DuckDB (RE2).
NUMBER_PATTERN = r"\+?\d(?:[\d -]*\d){5,}"

#: Redaction pass order matters: emails/URLs first (their digits must
#: not be re-matched as numbers), longest-match families before
#: substrings.
PII_PASSES: list[tuple[str, str]] = [
    (EMAIL_PATTERN, "[EMAIL]"),
    (URL_PATTERN, "[URL]"),
    (NUMBER_PATTERN, "[NUM]"),
]


def pii_redact(text: Column | str,
               passes: list[tuple[str, str]] | None = None) -> Column:
    """PII scrub (C4/Dolma-style): emails, URLs and long digit runs
    replaced by typed placeholder tokens, as chained JVM
    ``regexp_replace`` passes — no UDF, codegen-friendly, and
    engine-portable (every pattern is RE2-compatible, so an oracle can
    replay the exact passes)."""
    c = F.col(text) if isinstance(text, str) else text
    for pat, token in (passes or PII_PASSES):
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(text: Column | str) -> Column:
    """Total count of PII matches (all passes) BEFORE redaction."""
    c = F.col(text) if isinstance(text, str) else text
    out = F.lit(0)
    # count on the progressively redacted text, like the passes do —
    # an email's digits must not double-count as a number
    for pat, token in PII_PASSES:
        out = out + F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        c = F.regexp_replace(c, pat, token)
    return out.cast("long")


def domain_terms(df, group_col: str, text_col: str,
                 k: int = 10, prior_mass: float = 100.0):
    """Domain-characteristic terms via log-odds with an informative
    Dirichlet prior (Monroe/Colaresi/Quinn 2008, "Fightin' Words") —
    for each group, the terms most over-represented vs the rest of the
    corpus, z-scored so rare-but-lopsided terms don't dominate the way
    they do under raw TF-IDF.

    For term w in group s (y = in-group count, r = rest count, n_s /
    n_r = group/rest totals, a_w = prior_mass · corpus p(w)):

        delta = ln((y + a_w)/(n_s + a0 − y − a_w))
              − ln((r + a_w)/(n_r + a0 − r − a_w))
        z     = delta / sqrt(1/(y + a_w) + 1/(r + a_w))

    z is rounded to 6dp before the per-group top-``k`` rank (term
    tie-break), so the cut is engine-exact; ln/sqrt noise is ~1e-15,
    far under the rounding grid.  Only terms PRESENT in the group rank
    (y > 0) — absent terms have negative z by construction.

    Shape at 100 TB: one token explode feeding (group, term) and term
    groupBys, a vocab-sized equi-join, broadcast 1-row totals, and a
    per-group top-k window over that group's own vocab.
    """
    from pyspark.sql import Window

    toks = (df.select(F.col(group_col),
                      F.explode(tokens(normalized_text(text_col)))
                      .alias("term"))
            .filter(F.col("term") != ""))
    yg = toks.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("y"))
    yw = toks.groupBy("term").agg(F.count(F.lit(1)).alias("yw"))
    ng = toks.groupBy(group_col).agg(F.count(F.lit(1)).alias("ns"))
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    a0 = F.lit(float(prior_mass))
    j = (yg.join(yw, "term").join(ng, group_col)
         .crossJoin(F.broadcast(tot)))
    aw = a0 * (F.col("yw") / F.col("__n"))
    r = F.col("yw") - F.col("y")
    nr = F.col("__n") - F.col("ns")
    delta = (F.log((F.col("y") + aw)
                   / (F.col("ns") + a0 - F.col("y") - aw))
             - F.log((r + aw) / (nr + a0 - r - aw)))
    var = 1.0 / (F.col("y") + aw) + 1.0 / (r + aw)
    scored = j.withColumn("z", F.round(delta / F.sqrt(var), 6))
    w = Window.partitionBy(group_col).orderBy(F.col("z").desc(), "term")
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select(group_col, F.col("rnk").cast("long").alias("rnk"),
                    "term", F.col("y").alias("term_count"), "z"))


def corpus_drift_jsd(df, group_col: str, text_col: str):
    """Per-group Jensen-Shannon divergence between the group's unigram
    distribution and the WHOLE corpus's — the drift/representativeness
    monitor a pipeline runs per source or per ingest snapshot (JSD in
    nats; 0 = identical, ln 2 = disjoint support).

    The absent-term tail is folded algebraically instead of building a
    group×vocab grid: for terms the group lacks (p=0) the contribution
    is ½·q·ln 2, so

        JSD = ½·Σ_present [p·ln(p/m) + q·ln(q/m)]
            + ½·ln 2 · (1 − covered_q)

    where covered_q = (Σ_present corpus counts)/n is computed as ONE
    double division of exact integer sums (a summed-doubles version
    would be partial-agg-order dependent).  Per-term contributions go
    through the q83 integer-nanos path, so the whole sum is order-free
    and engine-exact.

    Shape at 100 TB: two groupBys + one vocab equi-join per group's
    own vocabulary — never group×vocab.
    """
    toks = (df.select(F.col(group_col),
                      F.explode(tokens(normalized_text(text_col)))
                      .alias("term"))
            .filter(F.col("term") != ""))
    yg = toks.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("y"))
    yw = toks.groupBy("term").agg(F.count(F.lit(1)).alias("yw"))
    ng = toks.groupBy(group_col).agg(F.count(F.lit(1)).alias("ns"))
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    j = (yg.join(yw, "term").join(ng, group_col)
         .crossJoin(F.broadcast(tot)))
    p = F.col("y") / F.col("ns")
    q_ = F.col("yw") / F.col("__n")
    m = (p + q_) / F.lit(2.0)
    contrib = (p * F.log(p / m) + q_ * F.log(q_ / m)) / F.lit(2.0)
    nano = (F.round(contrib, 9).cast("decimal(19,9)")
            * F.lit(1000000000)).cast("long")
    agg = j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(nano).alias("__n9"),
        F.sum("yw").alias("__cov"),
        F.max("__n").alias("__nn"))
    tail = (F.lit(0.5) * F.log(F.lit(2.0))
            * ((F.col("__nn") - F.col("__cov")) / F.col("__nn")))
    return agg.select(
        F.col(group_col), "n_terms",
        F.round(F.col("__n9").cast("double") / F.lit(1000000000.0)
                + tail, 6).alias("jsd"))


def corpus_cardinalities(df, group_col: str, text_col: str,
                         rsd: float = 0.02, n: int = 3,
                         exact: bool = False):
    """Per-group cardinality panel — distinct documents, distinct
    terms, distinct word ``n``-grams — via HyperLogLog++
    (``approx_count_distinct``): the sketch path that replaces exact
    distincts when the vocabulary/gram space no longer fits a shuffle
    (an exact distinct-gram count at 100 TB shuffles ~10^12 keys; the
    HLL sketch is a few KB per group and merges map-side, so the whole
    panel is ONE pass over the token/gram explode with no
    gram-cardinality shuffle at all).

    ``exact=True`` swaps in countDistinct for small corpora and tests
    — same output schema, so the two paths are drop-in comparable
    (the accuracy test pins the sketch's relative error against it).
    ``rsd`` is the target relative standard deviation (Spark's HLL++
    parameter; 0.02 ≈ 2 %).
    """
    words = tokens(normalized_text(text_col))
    staged = df.select(F.col(group_col), F.col(text_col),
                       words.alias("__w"))
    w = F.col("__w")
    grams = F.when(
        F.size(w) >= n,
        F.transform(F.sequence(F.lit(0), F.size(w) - n),
                    lambda i: F.concat_ws(
                        " ", *[F.get(w, i + k) for k in range(n)]))
    ).otherwise(F.array().cast("array<string>"))
    exploded = staged.select(
        F.col(group_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("__doc"),
        F.explode_outer(F.concat(
            F.transform(F.filter(w, lambda t: t != ""),
                        lambda t: F.concat(F.lit("t:"), t)),
            F.transform(grams, lambda g: F.concat(F.lit("g:"), g))))
        .alias("__k"))
    is_term = F.col("__k").startswith("t:")
    is_gram = F.col("__k").startswith("g:")

    def distinct_of(cond, col):
        c = F.when(cond, F.col(col))
        return (F.countDistinct(c) if exact
                else F.approx_count_distinct(c, rsd))

    return exploded.groupBy(group_col).agg(
        (F.countDistinct("__doc") if exact
         else F.approx_count_distinct("__doc", rsd))
        .cast("long").alias("n_docs_distinct"),
        distinct_of(is_term, "__k").cast("long").alias("n_terms"),
        distinct_of(is_gram, "__k").cast("long").alias("n_grams"))


def _tile_table(df: "DataFrame", id_col: str, text_col: str,
                source_col: str, tile: int):
    """Non-overlapping ``tile``-word segments of the normalized text as
    exploded ``(id, source, pos, tile)`` rows (short final tile kept).

    The words array is STAGED as a column before the tile transform
    (the shingle_table lesson: referencing the raw ``split(...)``
    inside the lambda re-evaluates the split per element — no CSE
    across lambda scopes)."""
    staged = df.select(F.col(id_col), F.col(source_col),
                       F.split(normalized_text(text_col), " ")
                       .alias("__toks"))
    return staged.select(F.col(id_col), F.col(source_col),
                         F.posexplode(_tiles_of(F.col("__toks"), tile))
                         .alias("pos", "tile"))


def _tiles_of(toks: "Column", tile: int) -> "Column":
    """Non-overlapping ``tile``-word segments of a staged words-array
    column, in order (short final tile kept)."""
    n_tiles = F.floor((F.size(toks) + F.lit(tile - 1)) / F.lit(tile))
    return F.transform(
        F.sequence(F.lit(0), (n_tiles - 1).cast("int")),
        lambda i: F.concat_ws(" ", F.slice(toks, i * tile + 1, tile)))


def boilerplate_tiles(df: "DataFrame", id_col: str, text_col: str,
                      source_col: str, tile: int = 8,
                      min_docs: int = 2, frac_denom: int = 20,
                      tiles: "DataFrame | None" = None):
    """Per-source boilerplate tile table: the normalized text is cut
    into NON-overlapping ``tile``-word segments (the last one may be
    shorter), and a segment is boilerplate within its source when it
    appears in >= ``min_docs`` distinct documents AND in >=
    1/``frac_denom`` of the source's documents (integer cross-multiply,
    no FP threshold).

    The CCNet-style per-domain repeated-content pass (headers, footers,
    nav chrome repeat across a domain's pages; prose does not).
    Distinct from :func:`~rainforest_spark.operators.dedup`'s span
    excision (q95): boilerplate is removed from EVERY occurrence —
    there is no canonical first keeper.

    Returns ``(source, tile)`` — one row per boilerplate segment.
    Shape at 100 TB: tile fan-out is ~n_words/tile per doc (an order
    less than n-gram shingling), one groupBy on (source, tile), and the
    per-source doc-count dim is tiny and broadcast.  ``tiles`` (a
    pre-built :func:`_tile_table`) lets a caller reuse an existing
    fan-out; the default path (r13) counts over a per-doc-DISTINCT
    tile stream instead — ``count(1)`` then equals the distinct-doc
    count (the q92 census trick), so the (source, tile) aggregate
    rides plain map-side partials (one row per partition-distinct
    tile) instead of the two-phase distinct aggregate's
    (source, tile, id)-pair exchange, and the doc id never rides the
    fan-out at all.
    """
    srcn = df.groupBy(source_col).agg(
        F.countDistinct(id_col).alias("__nd"))
    if tiles is not None:
        tdf = tiles.groupBy(source_col, "tile").agg(
            F.countDistinct(id_col).alias("__df"))
    else:
        staged = df.select(F.col(source_col),
                           F.split(normalized_text(text_col), " ")
                           .alias("__toks"))
        dg = staged.select(
            F.col(source_col),
            F.explode(F.array_distinct(
                _tiles_of(F.col("__toks"), tile))).alias("tile"))
        tdf = dg.groupBy(source_col, "tile").agg(
            F.count(F.lit(1)).alias("__df"))
    from pyspark.sql.functions import broadcast
    return (tdf.join(broadcast(srcn), source_col)
            .filter((F.col("__df") >= min_docs)
                    & (F.col("__df") * frac_denom >= F.col("__nd")))
            .select(source_col, "tile"))


def remove_boilerplate(df: "DataFrame", id_col: str, text_col: str,
                       source_col: str, tile: int = 8,
                       min_docs: int = 2, frac_denom: int = 20):
    """Strip per-source boilerplate tiles from every document.

    Output: ``(id, n_tiles, n_removed, cleaned_fp)`` where
    ``cleaned_fp`` is the md5 of the space-joined KEPT tiles in
    original order ('' when everything was boilerplate) — the
    downstream dedup key of the cleaned corpus.

    Shape at 100 TB: the boilerplate set is per-source Zipf-small
    (AQE broadcasts it under the anti-join when it fits); the rebuild
    is one groupBy on the doc id — the same key the tile fan-out
    already carries.
    """
    c = _boilerplate_cleaned(df, id_col, text_col, source_col,
                             tile=tile, min_docs=min_docs,
                             frac_denom=frac_denom)
    return c.select(F.col(id_col), "n_tiles", "n_removed",
                    F.md5("cleaned").alias("cleaned_fp"))


def strip_boilerplate(df: "DataFrame", id_col: str, text_col: str,
                      source_col: str, tile: int = 8,
                      min_docs: int = 2, frac_denom: int = 20):
    """In-place variant for pipeline composition: returns ``df`` with
    ``text_col`` REPLACED by the boilerplate-stripped text (in
    normalized space — the tile segmentation is defined on the
    lowercased whitespace-collapsed form) plus a ``boiler_removed``
    tile count.  Docs whose every tile was boilerplate survive with
    empty text — drop them with the pipeline's length floor, not here
    (curation stages stay single-purpose)."""
    c = _boilerplate_cleaned(df, id_col, text_col, source_col,
                             tile=tile, min_docs=min_docs,
                             frac_denom=frac_denom)
    return (df.drop(text_col)
            .join(c.select(F.col(id_col), F.col("cleaned").alias(text_col),
                           F.col("n_removed").alias("boiler_removed")),
                  id_col))


def _boilerplate_cleaned(df: "DataFrame", id_col: str, text_col: str,
                         source_col: str, tile: int,
                         min_docs: int, frac_denom: int):
    """Shared core: ``(id, n_tiles, n_removed, cleaned)`` with the
    kept tiles re-joined in original order ('' when all removed).

    The tile fan-out runs ONCE, for the DF counting side only; the
    strip side is IN-EXPRESSION (r13): the per-source boilerplate set
    is bounded by construction (every bp tile appears in >= nd/
    ``frac_denom`` of the source's docs, so a source has at most
    ``frac_denom`` x avg-tiles-per-doc of them), so it collapses to a
    per-source array on a broadcast-sized dim and each doc filters its
    own tiles array against it — the pre-r13 shape re-shuffled every
    corpus tile through a (source, tile) anti join and rebuilt the
    text with a collect_list + array_sort groupBy on the doc id."""
    # tiles=None: the census side uses boilerplate_tiles' per-doc-
    # distinct stream (r13) — the strip side below is in-expression,
    # so no exploded tile table is shared anymore
    bp = boilerplate_tiles(df, id_col, text_col, source_col,
                           tile=tile, min_docs=min_docs,
                           frac_denom=frac_denom)
    bp_sets = bp.groupBy(source_col).agg(
        F.collect_list("tile").alias("__bp"))
    staged = (df.select(F.col(id_col), F.col(source_col),
                        F.split(normalized_text(text_col), " ")
                        .alias("__toks"))
              .select(F.col(id_col), F.col(source_col),
                      _tiles_of(F.col("__toks"), tile).alias("__tiles")))
    bparr = F.coalesce(F.col("__bp"), F.array().cast("array<string>"))
    kept = F.filter(F.col("__tiles"),
                    lambda s: ~F.array_contains(bparr, s))
    return (staged.join(bp_sets, source_col, "left")
            .select(F.col(id_col),
                    F.size("__tiles").cast("int").alias("n_tiles"),
                    (F.size("__tiles") - F.size(kept)).cast("int")
                    .alias("n_removed"),
                    F.array_join(kept, " ").alias("cleaned")))


def bigram_logprob(df, id_col: str, text_col: str,
                   lam: float = 0.75):
    """Per-document mean negative log-likelihood under an interpolated
    corpus bigram LM: ``p(w2|w1) = lam*c(w1 w2)/c(w1 .) + (1-lam)*c(w2)/N``
    — one modeling step past :func:`unigram_logprob` (q83), the
    fluency-aware variant of the KenLM quality filter (word order now
    matters: scrambled boilerplate scores differently from fluent
    repetition even at identical unigram stats).

    ``c(w1 .)`` is the bigram-FIRST count (not the raw unigram count),
    so the conditional MLE sums to exactly 1 over observed continuations
    and self-scoring never needs unseen-mass smoothing; the unigram
    interpolation term uses occurrence counts over all tokens.

    Determinism: identical to q83's policy — each bigram type's -ln p
    is rounded to 9 decimals and scaled to integer nanos (the
    decimal(19,9) * int multiply is exact; scaling a SUM would clamp at
    precision 38), summed exactly, and the final mean is round-half-up
    in pure integer arithmetic ``(2N + 1000 n) div (2000 n)``.

    Docs with fewer than 2 tokens have no bigrams and are absent from
    the result (both engines drop them in the inner join).

    Shape at 100 TB: bigram explode -> per-doc tf groupBy + corpus
    bigram groupBy -> equi-joins on (w1, w2), w1 and w2.  All three
    count dims are Zipf-small relative to the corpus (AQE broadcasts
    them when they fit); the scalar N rides a 1-row cross join.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    pairs_arr = F.when(
        n >= 2,
        F.arrays_zip(F.slice(toks, 1, n - 1).alias("w1"),
                     F.slice(toks, 2, n - 1).alias("w2"))
    ).otherwise(F.array())
    bg = (df.select(F.col(id_col), F.explode(pairs_arr).alias("p"))
          .select(F.col(id_col), F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2"))
          .filter((F.col("w1") != "") & (F.col("w2") != "")))
    tf = bg.groupBy(id_col, "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf"))
    # partial-aggregation chain (r13, guide §2.2): c(w1 w2) = Σ_id tf
    # and c(w1 .) = Σ_w2 c(w1 w2) — identical integer counts, but the
    # bigram explode runs ONCE (for tf) instead of three times, and
    # the cb/cs exchanges carry pre-aggregated (id-distinct) rows
    # instead of raw bigram instances
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    cs = cb.groupBy("w1").agg(F.sum("cb").alias("cs"))
    uni = (df.select(F.explode(toks).alias("w2"))
           .filter(F.col("w2") != ""))
    cu = uni.groupBy("w2").agg(F.count(F.lit(1)).alias("cu"))
    total = uni.agg(F.count(F.lit(1)).cast("double").alias("__tot"))
    p = (F.lit(lam) * (F.col("cb") / F.col("cs"))
         + F.lit(1.0 - lam) * (F.col("cu") / F.col("__tot")))
    nano = (F.round(-F.log(p), 9).cast("decimal(19,9)")
            * F.lit(1000000000)).cast("long")
    # NOTE: deliberately NOT pre-joined into a (w1, w2) vocab_nano
    # table: that shape chains cb <- cs/cu/total broadcast builds
    # SERIALLY before the tf probe can start — measured 2.3x slower at
    # sf1 than this one, where cb/cs/cu/total broadcasts all build
    # concurrently while tf streams once (the per-row BigDecimal round
    # it would save is far cheaper than the lost overlap)
    per = (tf.join(cb, ["w1", "w2"]).join(cs, "w1").join(cu, "w2")
           .crossJoin(total)
           .select(F.col(id_col), "tf", (nano * F.col("tf")).alias("__n9")))
    agg = per.groupBy(id_col).agg(
        F.sum("tf").alias("n_bigrams"),
        F.sum("__n9").alias("__n9"))
    micro = F.expr("(2 * __n9 + 1000 * n_bigrams) div (2000 * n_bigrams)")
    return agg.select(
        F.col(id_col), "n_bigrams",
        (micro.cast("double") / F.lit(1000000.0)).alias("mean_nll"))


def zipf_fit(df, text_col: str, round_to: int = 6):
    """Corpus power-law (Zipf) fit: least-squares regression of
    ``ln(term_frequency)`` on ``ln(rank)`` over the whole vocabulary —
    the corpus-health diagnostic that catches template/boilerplate
    floods (slope drifts toward 0 over the head) and tokenizer damage
    (hockey-stick tail) in one scalar pair.

    Distributed as SUFFICIENT STATISTICS: the regression never sees
    rows — it is five sums (n, Sx, Sy, Sxx, Sxy [, Syy for r2])
    reduced in one aggregation over the vocab dim.  Exactness: x and y
    are ln values rounded to the 1e-9 grid as DECIMAL(18,9) — 18, not
    19: a (19,9)×(19,9) product wants precision 39, which Spark clamps
    to decimal(38,17) (rounding the 18th fractional digit away) while
    DuckDB keeps the exact (38,18), so the engines' sums could differ
    at 1e-18.  At (18,9) the product is decimal(37,18) — EXACT on both
    engines — and the partial aggregation across partitions is
    order-free.  Only the final closed-form division happens in double
    (one expression, bit-identical), rounded to ``round_to``.

    Rank is assigned over the VOCAB (count DESC, term ASC — total
    order) DISTRIBUTED: the order is encoded as one range-partitionable
    struct key ((-n), term) and a unit weight rides
    :func:`~rainforest_spark.operators.windows.ranged_cumsum` — since
    terms are unique after the groupBy, the cumulative unit count IS
    row_number.  Never one task sorting the whole vocabulary: a 100 TB
    web corpus has 1e8-1e9 distinct tokens (typos, URLs, code), tens of
    GB that a single-partition ``Window.orderBy`` would funnel through
    one sort task.

    Returns ONE row: ``(n_terms, zipf_slope, zipf_intercept, r2)``.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    toks = (df.select(F.explode(tokens(text_col)).alias("term"))
            .filter(F.col("term") != ""))
    voc = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    ordered = (voc.withColumn("__ord",
                              F.struct((-F.col("n")).alias("nn"),
                                       F.col("term").alias("t")))
               .withColumn("__one", F.lit(1).cast("long")))
    ranked = ranged_cumsum(ordered, "__ord", "__one", cum_col="r")
    x = F.round(F.log(F.col("r").cast("double")), 9).cast("decimal(18,9)")
    y = F.round(F.log(F.col("n").cast("double")), 9).cast("decimal(18,9)")
    return _ols_loglog(ranked.select(x.alias("x"), y.alias("y")),
                       "n_terms", "zipf_slope", "zipf_intercept",
                       round_to)


def _ols_loglog(xy, n_name: str, slope_name: str, icept_name: str,
                round_to: int):
    """Shared sufficient-statistics least squares over decimal (x, y):
    five exact decimal sums, closed-form slope/intercept/r2 in one
    double expression each (bit-identical across engines), rounded.

    Inputs MUST be DECIMAL(18,9): the (18,9)×(18,9) product is
    decimal(37,18) — exact on both Spark and DuckDB.  At (19,9) the
    product precision 39 exceeds 38 and Spark silently rounds to
    (38,17) while DuckDB computes the exact (38,18), breaking the
    bit-exact-sums contract at the 1e-18 digit."""
    s = xy.agg(
        F.count(F.lit(1)).cast("long").alias(n_name),
        F.countDistinct("y").alias("__dy"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,18)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,18)")).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,18)")).alias("syy"))
    n = F.col(n_name).cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / vx
    # the degenerate-variance guard is EXACT (distinct-y count), never
    # ``vy > 0`` on a double — FP noise makes that engine-dependent
    # when all y are equal (vy is mathematically 0 but ~1e-13 in one
    # engine and -1e-14 in the other)
    return s.select(
        n_name,
        F.round(slope, round_to).alias(slope_name),
        F.round((sy - slope * sx) / n, round_to).alias(icept_name),
        F.round(F.when(F.col("__dy") > 1, (cov * cov) / (vx * vy))
                .otherwise(F.lit(None)), round_to).alias("r2"))


def heaps_fit(df, id_col: str, text_col: str, round_to: int = 6):
    """Heaps'-law vocabulary-growth fit: ``ln V(N) ~ ln N`` least
    squares over the per-document growth curve — the companion
    diagnostic to :func:`zipf_fit` (β drifting high flags OCR noise /
    tokenizer damage minting spurious new terms; β collapsing flags a
    template flood that stops growing vocabulary).

    The curve is built DISTRIBUTED, never by scanning docs in order:

    - ``N(d)``: running token count up to doc ``d`` (in ``id_col``
      order) via the range-partitioned cumsum (windows.ranged_cumsum);
    - ``V(d)``: each term charges its FIRST document (min id — one
      groupBy), per-doc new-term counts then cumsum the same way;
    - the regression is the shared exact-decimal sufficient-statistics
      core (``_ols_loglog``) on the q83 1e-9 grid.

    Returns ONE row: ``(n_docs, heaps_beta, heaps_log_k, r2)`` —
    ``V ≈ exp(heaps_log_k) · N^heaps_beta``.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    toks = (df.select(F.col(id_col).alias("__d"),
                      F.explode(tokens(text_col)).alias("term"))
            .filter(F.col("term") != ""))
    per_doc = toks.groupBy("__d").agg(F.count(F.lit(1)).alias("__nt"))
    first = (toks.groupBy("term").agg(F.min("__d").alias("__d"))
             .groupBy("__d").agg(F.count(F.lit(1)).alias("__nv")))
    g = (per_doc.join(first, "__d", "left")
         .withColumn("__nv", F.coalesce("__nv", F.lit(0))))
    # ONE range shuffle for both running sums (extra_weights folds the
    # new-term cumsum into the same pass)
    g = ranged_cumsum(g, "__d", "__nt", cum_col="__ct",
                      extra_weights={"__nv": "__cv"})
    xy = g.filter(F.col("__cv") > 0).select(
        F.round(F.log(F.col("__ct").cast("double")), 9)
        .cast("decimal(18,9)").alias("x"),
        F.round(F.log(F.col("__cv").cast("double")), 9)
        .cast("decimal(18,9)").alias("y"))
    return _ols_loglog(xy, "n_docs", "heaps_beta", "heaps_log_k",
                       round_to)


def source_scorecard(df, id_col: str, text_col: str, group_col: str,
                     lang_col: str | None = None,
                     round_to: int = 6):
    """Per-source corpus report card — the one-screen health table a
    curation pipeline publishes per ingest: document and token volume,
    exact-duplicate exposure (share of docs whose normalized
    fingerprint occurs more than once ANYWHERE in the corpus — cross-
    source copies count, that is the point), mean document length, and
    language spread.

    Returns one row per source: ``(source, n_docs, n_tokens, dup_docs,
    dup_rate, mean_tokens[, n_langs])``.

    Shape at 100 TB: one fingerprint groupBy (uniform md5 keys), one
    fingerprint-keyed equi-join back (AQE-broadcastable per-fingerprint
    counts are NOT a dim — the join stays a shuffle join on the md5
    key, perfectly uniform), one grouped aggregation on the source dim.
    Ratios are exact-integer counts through one double division,
    rounded — engine-identical.
    """
    fp = fingerprint(text_col)
    d = df.select(F.col(id_col), F.col(group_col).alias("__src"),
                  *( [F.col(lang_col).alias("__lang")] if lang_col else [] ),
                  fp.alias("__fp"),
                  token_count(text_col).alias("__nt"))
    fpc = d.groupBy("__fp").agg(F.count(F.lit(1)).alias("__fn"))
    j = d.join(fpc, "__fp")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("n_tokens"),
        F.sum(F.when(F.col("__fn") > 1, 1).otherwise(0)).alias("dup_docs"),
    ]
    if lang_col:
        aggs.append(F.countDistinct("__lang").alias("n_langs"))
    out = j.groupBy(F.col("__src").alias(group_col)).agg(*aggs)
    cols = [group_col, "n_docs", "n_tokens", "dup_docs",
            F.round(F.col("dup_docs") / F.col("n_docs"), round_to)
            .alias("dup_rate"),
            F.round(F.col("n_tokens") / F.col("n_docs"), round_to)
            .alias("mean_tokens")]
    if lang_col:
        cols.append("n_langs")
    return out.select(*cols)


def perplexity_buckets(df, id_col: str, text_col: str, lang_col: str,
                       n_buckets: int = 3, vocab_counts=None):
    """CCNet-style per-language perplexity bucketing (Wenzek 2020
    §4.3): score every document with the unigram-LM mean NLL
    (:func:`unigram_logprob` — the KenLM stand-in) and cut each
    language into ``n_buckets`` equal-count rank buckets; CCNet's
    head/middle/tail is ``n_buckets=3``, where bucket 0 (*head*, lowest
    perplexity) is the cleanest slice and pipelines typically keep
    head+middle.

    Returns ``(id, lang, n_tokens, mean_nll, bucket, label)``; label is
    head/middle/tail for the 3-bucket case, ``b<i>`` otherwise.

    Exactness: mean_nll carries q83's integer-nanos guarantee; rank
    order is the total order (mean_nll, id) and the bucket index is
    pure integer arithmetic ``((rank−1)·k) div count`` — both engines
    pick identical buckets.

    Shape at 100 TB: languages are the canonical FEW-HUGE-GROUPS case
    (one language can be half the corpus), exactly what the grouped
    :func:`~rainforest_spark.operators.windows.ranged_cumsum` exists
    for — a ``Window.partitionBy(lang)`` rank would serialize each
    language into one sort task.  The per-language doc counts ride the
    same pass (``total_col``); no second scan.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    scores = unigram_logprob(df, id_col, text_col, vocab_counts)
    j = scores.join(df.select(id_col, lang_col), id_col)
    ordered = (j.withColumn("__ord", F.struct(
                    F.col("mean_nll").alias("s"),
                    F.col(id_col).alias("i")))
               .withColumn("__one", F.lit(1).cast("long")))
    ranked = ranged_cumsum(ordered, "__ord", "__one", cum_col="rn",
                           group_cols=[lang_col], total_col="cnt")
    bucket = F.expr(f"((rn - 1) * {int(n_buckets)}) div cnt").cast("int")
    if n_buckets == 3:
        label = (F.when(F.col("bucket") == 0, "head")
                 .when(F.col("bucket") == 1, "middle")
                 .otherwise("tail"))
    else:
        label = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    return (ranked.withColumn("bucket", bucket)
            .select(F.col(id_col), F.col(lang_col), "n_tokens",
                    "mean_nll", "bucket", label.alias("label")))


def bm25_topk(df, id_col: str, text_col: str, queries,
              k: int = 10, k1: float = 1.25, b: float = 0.75,
              round_to: int = 6):
    """Okapi BM25 retrieval over the corpus: top-``k`` documents per
    query (Robertson/Sparck-Jones; the Lucene ``ln(1 + (N−df+0.5)/
    (df+0.5))`` IDF form, so scores stay positive) — the
    retrieval-based curation primitive (targeted corpus audits,
    "find training docs about X", retrieval-augmented dedup review).

    ``queries``: list of ``(query_id, query_text)`` or a 2-col
    DataFrame.  Query terms are DISTINCT per query (standard for short
    queries); terms share :func:`tokens`' whitespace policy with the
    LM family.

    Returns ``(query_id, rnk, doc_id-as-id_col, score)``.

    Exactness: IDF is rounded to the 1e-9 grid straight after the
    ``ln`` (libm last-ulp differences are the only cross-engine hazard
    — everything else is a rational expression over the integers tf,
    dl, df, N and S=Σdl that both engines evaluate identically);
    per-term contributions become integer NANOS (the q83 idiom) and
    the round to ``round_to`` is HALF-UP in pure BIGINT arithmetic
    before ranking, so top-k ties break on the doc id
    deterministically.  The defaults are DYADIC (k1=1.25, b=0.75) so
    every derived constant (k1+1=2.25, 1−b=0.25) is an exactly
    representable double an oracle can spell as a literal.

    Shape at 100 TB: per-doc tf is the q83 token pass; the query-term
    table is tiny and BROADCAST onto it (gram equi-join — only docs
    sharing a query term survive); df/N/S are 1-row aggregates riding
    cross joins.  The final top-k window partitions by query_id —
    fine for interactive query batches (the q50 idiom); a
    thousand-query batch with broad terms wants the per-partition-heap
    top-k of ``weighted_sample_no_replacement`` instead.
    """
    from pyspark.sql.functions import broadcast

    if not hasattr(queries, "columns"):
        queries = df.sparkSession.createDataFrame(
            list(queries), "query_id long, qtext string")
    else:
        qa, qb = queries.columns[:2]
        queries = queries.select(F.col(qa).alias("query_id"),
                                 F.col(qb).alias("qtext"))
    qterms = (queries.select("query_id",
                             F.explode(tokens("qtext")).alias("term"))
              .filter(F.col("term") != "").distinct())

    toks = (df.select(F.col(id_col), F.explode(tokens(text_col))
                      .alias("term"))
            .filter(F.col("term") != ""))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("N"),
                   F.sum("dl").alias("S"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # the 9dp IDF round (a BigDecimal op) is computed ONCE per query
    # term on the tiny dfreq dim, not per (query, term, doc) match row
    dfq = (dfreq.join(broadcast(qterms).select("term").distinct(),
                      "term")
           .crossJoin(broadcast(stats))
           .select("term", F.round(F.log(
               F.lit(1.0) + (F.col("N") - F.col("df") + F.lit(0.5))
               / (F.col("df") + F.lit(0.5))), 9).alias("__idf9")))
    m = (tf.join(broadcast(qterms), "term")
         .join(dl, id_col).join(broadcast(dfq), "term")
         .crossJoin(broadcast(stats)))
    tfpart = (F.col("tf") * F.lit(k1 + 1.0)
              / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b)
                 + F.lit(b) * F.col("dl") * F.col("N") / F.col("S"))))
    # integer-nanos contributions (q83 idiom): the 1e-9-grid sum can
    # land exactly ON a half-micro boundary where the engines' double
    # rounding conventions disagree — so the round-to-6 is HALF-UP in
    # pure BIGINT arithmetic (scores are positive) and only the final
    # division happens in double
    contrib = (F.round(F.col("__idf9") * tfpart, 9)
               .cast("decimal(19,9)")
               * F.lit(1000000000)).cast("long")
    dv = 10 ** (9 - round_to)
    scored = (m.select("query_id", F.col(id_col), contrib.alias("__n9"))
              .groupBy("query_id", id_col)
              .agg(F.sum("__n9").alias("__n9"))
              .select("query_id", id_col,
                      (F.expr(f"(__n9 + {dv // 2}) div {dv}")
                       .cast("double") / F.lit(float(10 ** round_to)))
                      .alias("score")))
    from pyspark.sql import Window
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    F.col(id_col), "score"))


def length_histogram(df, group_col: str, text_col: str,
                     bin_width: int = 64, round_to: int = 6):
    """Per-group token-length histogram — the sequence-length
    diagnostic behind packing/batching decisions (how much of source X
    is sub-context-length?).  Returns ``(group, len_lo, n_docs,
    share)``; ``len_lo`` the inclusive lower edge of the
    ``bin_width``-token bin, ``share`` the in-group fraction.

    Exactness: bins and counts are pure integer arithmetic; the share
    is one double division of two BIGINTs, rounded.

    Shape at 100 TB: one map-side token count, one groupBy on the
    (group, bin) key, one broadcast-size per-group total join.
    """
    d = df.select(F.col(group_col).alias("__g"),
                  token_count(text_col).alias("__n"))
    binned = d.groupBy(
        "__g", (F.floor(F.col("__n") / bin_width) * bin_width)
        .cast("long").alias("len_lo")).agg(
        F.count(F.lit(1)).alias("n_docs"))
    totals = binned.groupBy("__g").agg(F.sum("n_docs").alias("__tot"))
    return (binned.join(totals, "__g")
            .select(F.col("__g").alias(group_col), "len_lo", "n_docs",
                    F.round(F.col("n_docs") / F.col("__tot"), round_to)
                    .alias("share")))


def source_concentration(df, group_col: str, text_col: str,
                         round_to: int = 6):
    """Corpus-concentration diagnostic: sources ranked by token mass
    with cumulative (Lorenz) shares, plus the per-row Gini coefficient
    of the whole distribution — catches a mixture silently collapsing
    onto one crawl.  Returns ``(group, n_tokens, rank, cum_share,
    gini)`` with rank 1 = largest source.

    Exactness: token masses are exact BIGINTs; cumulative sums and the
    Gini numerator ``2·Σ(i·xᵢ) − (n+1)·Σx`` (x ascending) stay integer;
    each result is one double division, rounded.

    Shape at 100 TB: the heavy pass is the per-source token groupBy;
    everything after runs on the SOURCE DIM (hundreds of rows — the
    window is bounded by the dim, not the data).
    """
    from pyspark.sql import Window

    mass = (df.select(F.col(group_col).alias("__g"),
                      token_count(text_col).alias("__n"))
            .groupBy("__g").agg(F.sum("__n").alias("n_tokens")))
    wd = Window.orderBy(F.col("n_tokens").desc(), F.col("__g").asc())
    wa = Window.orderBy(F.col("n_tokens").asc(), F.col("__g").desc())
    wall = Window.partitionBy()
    ranked = (mass
              .withColumn("rank", F.row_number().over(wd))
              .withColumn("__i", F.row_number().over(wa))
              .withColumn("__cum", F.sum("n_tokens").over(
                  wd.rowsBetween(Window.unboundedPreceding, 0)))
              .withColumn("__tot", F.sum("n_tokens").over(wall))
              .withColumn("__cnt", F.count(F.lit(1)).over(wall))
              .withColumn("__wsum", F.sum(F.col("__i").cast("long")
                                          * F.col("n_tokens")).over(wall)))
    gini = ((F.lit(2) * F.col("__wsum")
             - (F.col("__cnt") + 1) * F.col("__tot")).cast("double")
            / (F.col("__cnt") * F.col("__tot")).cast("double"))
    return ranked.select(
        F.col("__g").alias(group_col), "n_tokens",
        F.col("rank").cast("long").alias("rank"),
        F.round(F.col("__cum").cast("double")
                / F.col("__tot").cast("double"), round_to)
        .alias("cum_share"),
        F.round(gini, round_to).alias("gini"))


def type_token_ratio(df, group_col: str, text_col: str,
                     round_to: int = 6):
    """Per-group lexical richness: distinct terms over total tokens —
    low TTR flags templated/boilerplate-heavy sources.  Returns
    ``(group, n_tokens, n_types, ttr)``.

    Shape at 100 TB: one (group, term) distinct + two grouped counts;
    the ratio is one rounded double division of exact BIGINTs.
    """
    toks = (df.select(F.col(group_col).alias("__g"),
                      F.explode(tokens(text_col)).alias("term"))
            .filter(F.col("term") != ""))
    per = toks.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("term").alias("n_types"))
    return per.select(
        F.col("__g").alias(group_col), "n_tokens",
        F.col("n_types").cast("long").alias("n_types"),
        F.round(F.col("n_types") / F.col("n_tokens"), round_to)
        .alias("ttr"))


def relative_quality_filter(df, id_col: str, text_col: str,
                            group_col: str, keep_num: int = 1,
                            keep_den: int = 2):
    """Per-source RELATIVE quality filtering: keep the top
    ``keep_num/keep_den`` fraction of each source's documents by a
    heuristic quality score — the Gopher-style rule applied per domain
    rather than globally, so a clean-but-small source is not wiped out
    by a corpus-wide threshold tuned on web text (and a noisy giant
    cannot dominate just because its median clears a global bar).

    Score: ``stopword_ratio − punct_ratio − digit_ratio`` (higher is
    better; the q42 feature set) computed as raw double ratios of
    integer counts — both engines evaluate the identical expression
    tree, so the per-source rank order ``(score DESC, id ASC)`` is
    bit-deterministic without any grid.  The kept count is
    ``ceil(n_g·keep_num/keep_den)`` in pure integer arithmetic.

    Returns only the kept rows: ``(id, group, quality, rnk,
    n_group)``; ``quality`` is the 6dp-rounded score (display
    rounding — ranking used the raw double).

    Shape at 100 TB: sources are the few-huge-groups case (one crawl
    can be half the corpus), so the per-source rank rides the grouped
    :func:`~rainforest_spark.operators.windows.ranged_cumsum` —
    a ``Window.partitionBy(source)`` would serialize each source into
    a single sort task (the q34/q126 lesson).  One score scan, one
    range shuffle; nothing else touches the corpus.
    """
    from rainforest_spark.operators.windows import ranged_cumsum

    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(t)
    score = (stopword_count(t, LANG_STOPWORDS["en"]) / n_tok
             - F.regexp_count(t, F.lit(r"[^\w\s]")) / n_chars
             - F.regexp_count(t, F.lit(r"[0-9]")) / n_chars)
    scored = df.select(F.col(id_col), F.col(group_col),
                       score.alias("__q"))
    ordered = (scored.withColumn("__ord", F.struct(
                    (-F.col("__q")).alias("s"),
                    F.col(id_col).alias("i")))
               .withColumn("__one", F.lit(1).cast("long")))
    ranked = ranged_cumsum(ordered, "__ord", "__one", cum_col="rnk",
                           group_cols=[group_col], total_col="n_group")
    keep = F.expr(f"(n_group * {int(keep_num)} + {int(keep_den)} - 1) "
                  f"div {int(keep_den)}")
    return (ranked.filter(F.col("rnk") <= keep)
            .select(F.col(id_col), F.col(group_col),
                    F.round("__q", 6).alias("quality"),
                    F.col("rnk").cast("long").alias("rnk"),
                    F.col("n_group").cast("long").alias("n_group")))


def textrank_keywords(df, id_col: str, text_col: str,
                      iterations: int = 4, k: int = 50):
    """TextRank keyword extraction: PageRank over the adjacent-term
    co-occurrence graph (Mihalcea & Tarau 2004), the unsupervised
    keyphrase signal a curation pipeline uses to label/route corpus
    slices.  Graph: undirected edges between adjacent tokens (both
    directions materialized), weight = co-occurrence count; rank
    update r'(v) = 0.15 + 0.85·Σ_u r(u)·w_uv/W_u with damping 17/20.

    EXACT-INTEGER iteration (the engine's oracle-parity policy for
    iterative algorithms): ranks live as BIGINT nanos (r₀ = 1e9);
    damping is ``(r·17) div 20``; the per-edge share uses the
    quotient/remainder split  ``(a div W)·w + ((a mod W)·w) div W``
    = floor(a·w/W)  — keeping every intermediate under 2⁶³ (the
    remainder term is < W·w) while Spark's ``div`` and DuckDB's ``//``
    agree bit-for-bit on the non-negative operands.  No FP enters
    until the final reporting division.

    Shape at 100 TB: the edge table (vocab × avg-degree, Zipf-small
    next to the corpus) is built from ONE in-expression bigram
    fan-out + one groupBy, persisted, and each of the ``iterations``
    rounds is one equi-join (ranks ⋈ edges on src — AQE broadcasts
    the rank dim when it fits) + one groupBy(dst).  Linear DAG depth,
    no driver-side loop over data.  Terms never adjacent to another
    term (single-token documents) have no edges and drop out, as in
    the reference formulation.  Beyond ~10⁹-token vocabularies the
    BIGINT headroom argument in the docstring body needs the
    DECIMAL(38,0) variant of the share split.
    """
    words = tokens(normalized_text(text_col))
    staged = df.select(F.col(id_col), words.alias("__w"))
    w = F.col("__w")
    pair_arr = F.when(
        F.size(w) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(w) - 2),
                    lambda i: F.struct(F.get(w, i).alias("w1"),
                                       F.get(w, i + 1).alias("w2")))
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = (staged.select(F.explode(pair_arr).alias("bg")).select("bg.*")
          .filter((F.col("w1") != F.col("w2"))
                  & (F.col("w1") != "") & (F.col("w2") != "")))
    both = (bg.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
            .unionAll(bg.select(F.col("w2").alias("src"),
                                F.col("w1").alias("dst"))))
    edges = both.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("wt"))
    deg = edges.groupBy("src").agg(F.sum("wt").alias("W"))
    # LAZY localCheckpoint instead of persist(): the edge table still
    # materializes once (first action) and is reused by every
    # iteration join, but (a) constructing the query runs NO job,
    # (b) the returned plan keeps the iteration joins visible to the
    # registry-wide plan lint (a collect()/createDataFrame rewrap
    # would hand the lint an opaque LocalRelation), and (c) the
    # checkpoint blocks are dropped by the ContextCleaner when the
    # RDD is garbage-collected — no per-call persist accumulating in
    # long-lived sessions and no unpersist for callers to remember.
    ew = edges.join(deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(F.col("src").alias("term"),
                       F.lit(1_000_000_000).cast("long").alias("r"))
    for _ in range(int(iterations)):
        j = ew.join(ranks, ew["src"] == ranks["term"])
        contrib = F.expr("((r * 17) div 20 div W) * wt"
                         " + ((((r * 17) div 20) % W) * wt) div W")
        ranks = (j.groupBy("dst")
                 .agg((F.lit(150_000_000)
                       + F.sum(contrib)).cast("long").alias("r"))
                 .withColumnRenamed("dst", "term"))
    return (ranks
            .orderBy(F.col("r").desc(), F.col("term")).limit(int(k))
            .select(F.col("term"),
                    F.col("r").alias("rank_nanos"),
                    F.round(F.col("r") / F.lit(1e9), 6).alias("score")))


def inverted_index(df, id_col: str, text_col: str,
                   k_postings: int = 3):
    """Inverted-index construction (retrieval-infrastructure extension
    alongside :func:`bm25_topk`): per term, the document frequency,
    total term frequency, and the top-``k`` postings by
    ``(tf DESC, id ASC)`` spelled as an ``id:tf,id:tf`` string — the
    index build a search/RAG pipeline runs over the corpus before
    query time.

    The posting rank is a window keyed BY TERM — millions of small
    groups, the uniform grouped-window case (per-term posting lists
    are Zipf-long only for stopword-class terms, which AQE's skew
    split handles; contrast the q108 vocab-wide rank, which must ride
    ``ranged_cumsum``).  The string assembly is ``array_join`` over a
    ``slice`` of the already-ordered collected structs.  Everything is
    exact integers/strings.

    Shape at 100 TB: token explode → one (doc, term) groupBy → one
    term-keyed window + one term groupBy.  ``k_postings`` bounds
    output arrays; no doubles anywhere.
    """
    t = (df.select(F.col(id_col).alias("__id"),
                   F.explode(tokens(text_col)).alias("term"))
         .filter(F.col("term") != ""))
    tf = (t.groupBy("term", "__id")
          .agg(F.count(F.lit(1)).cast("long").alias("__tf")))
    from pyspark.sql import Window
    w = Window.partitionBy("term").orderBy(F.col("__tf").desc(),
                                           F.col("__id").asc())
    ranked = tf.withColumn("__rn", F.row_number().over(w))
    top = (ranked.filter(F.col("__rn") <= int(k_postings))
           .groupBy("term")
           .agg(F.array_join(
               F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("__rn").alias("r"),
                                F.col("__id").alias("i"),
                                F.col("__tf").alias("f")))),
                   lambda s: F.concat_ws(":", s["i"].cast("string"),
                                         s["f"].cast("string"))),
               ",").alias("postings")))
    stats = (tf.groupBy("term")
             .agg(F.count(F.lit(1)).cast("long").alias("df"),
                  F.sum("__tf").cast("long").alias("tf_total")))
    return stats.join(top, "term").select("term", "df", "tf_total",
                                          "postings")


def concordance(df: DataFrame, id_col: str, text_col: str, term: str,
                context: int = 3) -> DataFrame:
    """Keyword-in-context (KWIC) concordance: every occurrence of
    ``term`` in the normalized token stream with ``context`` words of
    left/right context — the qualitative-inspection view behind every
    "show me how this token is actually used" question a corpus
    curator asks (and the spot-check UI for PII/decontamination hits).

    EXACT: pure string/array expressions over the shared
    ``normalized_text`` tokenization; positions are 1-based token
    indices.

    Shape at 100 TB: one scan, one posexplode bounded by matches only
    (the token array is filtered to the term BEFORE exploding), no
    shuffle at all until the caller aggregates.
    """
    words = F.split(normalized_text(text_col), " ")
    staged = df.select(F.col(id_col), words.alias("__words"))
    w = F.col("__words")
    # positions (1-based) where the term occurs — explode matches only
    pos = F.filter(
        F.transform(F.sequence(F.lit(1), F.size(w)),
                    lambda i: F.when(F.element_at(w, i) == term, i)
                    .otherwise(F.lit(None))),
        lambda x: x.isNotNull())
    out = staged.select(F.col(id_col), w.alias("__ws"),
                        F.explode(pos).alias("pos"))
    c = int(context)
    left = F.concat_ws(" ", F.slice(
        F.col("__ws"), F.greatest(F.col("pos") - c, F.lit(1)),
        F.least(F.lit(c), F.col("pos") - 1)))
    right = F.concat_ws(" ", F.when(
        F.col("pos") < F.size("__ws"),
        F.slice(F.col("__ws"), F.col("pos") + 1,
                F.least(F.lit(c), F.size("__ws") - F.col("pos"))))
        .otherwise(F.array().cast("array<string>")))
    return out.select(F.col(id_col), F.col("pos").cast("long").alias("pos"),
                      left.alias("left_context"),
                      right.alias("right_context"))


def readability_scores(df: DataFrame, id_col: str,
                       text_col: str = "text") -> DataFrame:
    """Flesch-style readability profile per document — the fluency
    screen a curation pipeline runs next to :func:`quality_features`
    ("drop the unreadable tail before the expensive filters").

    Heuristics (deterministic, engine-portable — no dictionary):
    words = whitespace tokens; sentences = runs of ``[.!?]`` (min 1);
    syllables = runs of ``[aeiouy]`` in the lowercased text (the
    standard vowel-group approximation; consonant-only tokens count 0).

    ``flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syll/words)``
    — one fixed IEEE double tree over exact BIGINT counts, rounded to
    6dp (the only division-bearing step).  Empty/whitespace-only texts
    return NULL flesch, never a divide-by-zero.

    Shape at 100 TB: map-only — three regex counters per row, no
    shuffle at all.
    """
    t = F.col(text_col)
    words = F.when(F.length(F.trim(t)) > 0,
                   F.size(F.split(F.trim(t), r"\s+"))).cast("long")
    sents = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")),
                       F.lit(1)).cast("long")
    syll = F.regexp_count(F.lower(t), F.lit("[aeiouy]+")).cast("long")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sents.cast("double"))
        - F.lit(84.6) * (syll.cast("double") / words.cast("double")),
        6)
    return df.select(
        F.col(id_col),
        words.alias("n_words"), sents.alias("n_sentences"),
        syll.alias("n_syllables"),
        F.when(words > 0, flesch).alias("flesch"))
