"""Distributed BPE vocabulary induction (tokenizer training).

The missing piece between token-count ESTIMATION (text_analysis.
bpe_ish_tokens) and a real training pipeline: learn the merge table
itself from the corpus.  Classic BPE (Sennrich et al. 2016, public
algorithm) over word TYPES:

1. corpus → (word, count) — the only corpus-sized shuffle; everything
   after runs on the word-type table, which is Zipf-small relative to
   the corpus (and is what the original algorithm iterates on).
2. each round: count adjacent symbol pairs weighted by word count
   (explode → groupBy → 1-row argmax to the driver), then apply the
   winning merge to every word with a greedy left-to-right fold.
3. repeat for ``n_merges`` rounds.

Spark-first shape:

- pair counting is ONE groupBy per round over exploded pairs — fully
  parallel, combiner-friendly (partial aggregation), and the only
  thing crossing to the driver is the single argmax row;
- the merge application is a JVM-side ``aggregate`` fold over the
  symbol array (greedy left-to-right, exactly the reference
  semantics — overlapping matches like ``aaa`` under merge (a,a)
  yield ``(aa)(a)``) — no Python UDF;
- the driver loop localCheckpoints the word table every few rounds,
  cutting the per-round expression nesting before Catalyst's plan
  depth becomes the bottleneck (the neardup_clusters pattern).

The merge sequence is fully deterministic: ties on pair count break on
the (a, b) symbol strings.  Iterative argmax is not expressible as one
SQL query, so this op is verified by a golden test against an
independent single-node reference implementation instead of a DuckDB
oracle (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (public BPE convention) — keeps merges from
#: crossing word boundaries and lets segmentations round-trip.
EOW = "</w>"

#: localCheckpoint cadence: rounds between lineage cuts.
_CHECKPOINT_EVERY = 4


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — the one corpus-sized aggregation."""
    from rainforest_spark.operators.text_analysis import tokens

    return (docs.select(F.explode(tokens(text_col)).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def chars_with_eow(word: Column | str) -> Column:
    """Initial symbol array: one symbol per character + the EOW mark."""
    w = F.col(word) if isinstance(word, str) else word
    chars = F.transform(F.sequence(F.lit(1), F.length(w)),
                        lambda i: F.substring(w, i, 1))
    return F.concat(chars, F.array(F.lit(EOW)))


def adjacent_pairs(sym: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty below 2)."""
    n = F.size(sym)
    mk = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
        lambda i: F.struct(F.element_at(sym, i).alias("a"),
                           F.element_at(sym, i + 1).alias("b")))
    return F.when(n >= 2, mk).otherwise(
        F.array().cast("array<struct<a:string,b:string>>"))


def apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) → a||b, as a pure
    ``aggregate`` fold carrying (out, pending-symbol)."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"))

    def step(acc, s):
        hit = acc.prev.eqNullSafe(F.lit(a)) & (s == F.lit(b))
        return F.struct(
            F.when(hit, F.concat(acc.out, F.array(F.lit(merged))))
            .otherwise(F.when(acc.prev.isNull(), acc.out)
                       .otherwise(F.concat(acc.out, F.array(acc.prev))))
            .alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s)
            .alias("prev"))

    def finish(acc):
        return F.when(acc.prev.isNull(), acc.out) \
            .otherwise(F.concat(acc.out, F.array(acc.prev)))

    return F.aggregate(sym, init, step, finish)


def bpe_train(word_table: DataFrame, n_merges: int,
              min_pair_count: int = 2):
    """Learn ``n_merges`` BPE merges from a (word, n) table.

    Returns ``(merges, segmented)``: the ordered merge list
    ``[(rank, a, b, pair_count), ...]`` and the word table with its
    final symbol segmentation (``word, n, sym``) — join corpus tokens
    against it (broadcast; it is the word vocab) to tokenize at scale
    without re-running any merge logic per document.

    Stops early when no pair reaches ``min_pair_count`` (merging
    singletons only memorizes the corpus).
    """
    wt = word_table.select("word", "n",
                           chars_with_eow("word").alias("sym"))
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        if rank % _CHECKPOINT_EVERY == 0:
            wt = wt.localCheckpoint(eager=True)
        best = (wt.select("n", F.explode(adjacent_pairs(F.col("sym")))
                          .alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.col("c").desc(), "a", "b")
                .first())
        if best is None or best["c"] < min_pair_count:
            break
        merges.append((rank, best["a"], best["b"], int(best["c"])))
        wt = wt.withColumn(
            "sym", apply_merge(F.col("sym"), best["a"], best["b"]))
    return merges, wt


def segment_tokens(docs: DataFrame, id_col: str, text_col: str,
                   segmented: DataFrame) -> DataFrame:
    """Per-document BPE token count via the segmented word vocab
    (broadcast join on the word — no merge logic in the hot path)."""
    from rainforest_spark.operators.text_analysis import tokens

    words = (docs.select(F.col(id_col),
                         F.explode(tokens(text_col)).alias("word"))
             .filter(F.col("word") != ""))
    vocab = F.broadcast(
        segmented.select("word", F.size("sym").alias("n_sym")))
    return (words.join(vocab, "word")
            .groupBy(id_col)
            .agg(F.sum("n_sym").alias("n_bpe_tokens"),
                 F.count(F.lit(1)).alias("n_words")))
