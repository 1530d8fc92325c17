"""End-to-end corpus curation: the composition layer over the
corpus-shaping operators.

A pretraining data pipeline is a fixed sequence of the ops this package
provides individually — quality gate → PII scrub → exact dedup →
near-dup dedup → benchmark decontamination → domain mixture →
per-domain cap → split assignment → epoch sharding.  ``curate_corpus``
wires them into ONE lazy DataFrame chain (no intermediate action, so
Catalyst sees the whole plan: filters merge, column pruning reaches the
scan, and a caller can add their own stages before the first job runs).

Every stage is individually oracle-verified (q40/q63/q79-q84/q86); this
module adds the composition and the per-stage survivor accounting.

Scale posture: the chain inherits each stage's shape — the only
all-corpus shuffles are the dedup groupBys/joins and the final ranged
count; mixture/cap/split/scrub are per-row or per-group-window ops.
``stage_counts`` is opt-in because it runs one job per stage; the
curated output itself stays a single plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from rainforest_spark.operators import dedup as D
from rainforest_spark.operators import text_analysis as TA
from rainforest_spark.operators.mixture import cap_per_group, weighted_sample
from rainforest_spark.operators.packing import epoch_shards, split_assign


@dataclass
class CurationConfig:
    """Tunables for :func:`curate_corpus`; defaults follow the common
    published pipeline settings (Gopher repetition cut, C4-ish length
    floor, 0.8 Jaccard near-dup threshold)."""
    min_tokens: int = 10
    max_dup_ngram_ratio: float = 0.3      # Gopher-style repetition cut
    redact_pii: bool = True
    strip_boilerplate: bool = False       # per-source tile removal
    boilerplate_tile: int = 8
    token_budget: tuple | None = None     # (num, den) of corpus tokens
    neardup_threshold: float = 0.8        # exact-verified Jaccard
    neardup_num_hashes: int = 16
    neardup_band_size: int = 4
    decontaminate_ngram: int = 8          # eval-overlap gram size
    mixture_rates: dict | None = None     # source -> rate; None = keep all
    mixture_default_rate: float = 1.0
    cap_per_source: int | None = None
    split_rates: dict = field(default_factory=lambda: {
        "train": 0.90, "val": 0.05, "test": 0.05})
    shard_size: int = 1024
    salt: str = "curate-v1"


def curate_corpus(docs: DataFrame, id_col: str, text_col: str,
                  source_col: str,
                  config: CurationConfig | None = None,
                  eval_docs: DataFrame | None = None,
                  stage_counts: dict | None = None) -> DataFrame:
    """Run the full curation chain; returns the curated corpus with
    ``split``/``shard_id``/``epoch_pos`` columns and ``text_col``
    redacted in place (when configured).

    ``eval_docs`` enables the decontamination stage (docs sharing any
    ``decontaminate_ngram``-gram with it are dropped).  Pass a dict as
    ``stage_counts`` to get per-stage survivor counts filled in — each
    entry costs one count() job, and only stages that actually RAN get
    an entry (a disabled stage's count would just replay the previous
    one); leave it None for the pure lazy chain.
    """
    cfg = config or CurationConfig()

    def note(stage: str, df: DataFrame) -> DataFrame:
        if stage_counts is not None:
            stage_counts[stage] = df.count()
        return df

    d = note("input", docs)

    # 1. quality gate: length floor + repetition ceiling — the signals
    # are per-row column expressions, so the gate is two filters fused
    # into the scan (no join, no shuffle)
    d = (d.filter(TA.token_count(text_col) >= cfg.min_tokens)
         .filter(F.coalesce(TA.dup_ngram_ratio(text_col, n=5),
                            F.lit(0.0))
                 <= cfg.max_dup_ngram_ratio))
    d = note("quality", d)

    # 2. PII scrub (in place, before any hashing so dedup keys match
    # what ships)
    if cfg.redact_pii:
        d = d.withColumn(text_col, TA.pii_redact(text_col))
        d = note("redacted", d)

    # 2b. per-source boilerplate strip (optional; before dedup so the
    # fingerprints key on the prose, not the shared chrome — two docs
    # differing only in boilerplate become exact dups and collapse).
    # Docs stripped to nothing are dropped by re-applying the length
    # floor, which now sees the cleaned text.
    if cfg.strip_boilerplate:
        d = TA.strip_boilerplate(d, id_col, text_col, source_col,
                                 tile=cfg.boilerplate_tile)
        d = d.filter(TA.token_count(text_col) >= cfg.min_tokens)
        d = note("boilerplate", d)

    # 3. exact dedup: keep the canonical (min-id) doc per fingerprint
    groups = (D.exact_dedup_groups(d, id_col, text_col)
              .select(F.col("canonical_id").alias("__keep")))
    d = d.join(groups, d[id_col] == F.col("__keep"), "semi")
    d = note("exact_dedup", d)

    # 4. near-dup dedup: LSH candidates + exact-Jaccard verify (q63
    # machinery); drop the higher id of each verified pair
    pairs = D.minhash_verified_pairs(
        d, id_col, text_col, n=3,
        num_hashes=cfg.neardup_num_hashes,
        band_size=cfg.neardup_band_size,
        threshold=cfg.neardup_threshold)
    losers = pairs.select(F.col("id_b").alias("__drop")).distinct()
    d = d.join(losers, d[id_col] == F.col("__drop"), "anti")
    d = note("near_dedup", d)

    # 5. benchmark decontamination (optional)
    if eval_docs is not None:
        hits = TA.contamination_overlap(
            d, eval_docs, id_col, text_col,
            n=cfg.decontaminate_ngram).select(
            F.col("train_id").alias("__bad"))
        d = d.join(hits, d[id_col] == F.col("__bad"), "anti")
        d = note("decontaminated", d)

    # 6. domain mixture + per-source cap
    if cfg.mixture_rates is not None:
        d = weighted_sample(d, id_col, cfg.mixture_rates,
                            group_col=source_col,
                            default_rate=cfg.mixture_default_rate,
                            salt=cfg.salt + ":mix")
    if cfg.cap_per_source is not None:
        d = cap_per_group(d, source_col, id_col,
                          k=cfg.cap_per_source, salt=cfg.salt + ":cap")
    if cfg.mixture_rates is not None or cfg.cap_per_source is not None:
        d = note("mixed", d)

    # 6b. token-budget cut (optional): keep the best docs (lexical-
    # diversity score, exact integer micro-units) until num/den of the
    # surviving corpus's tokens — the final size cut before splitting,
    # so train/val/test stay leakage-consistent subsets of ONE pool
    if cfg.token_budget is not None:
        from rainforest_spark.operators.mixture import (
            token_budget_selection,
        )
        num, den = cfg.token_budget
        words = F.split(TA.normalized_text(text_col), " ")
        scored = (d.withColumn("__ntok", F.size(words).cast("long"))
                  .withColumn("__ndis",
                              F.size(F.array_distinct(words)).cast("long"))
                  .withColumn("__sm", F.expr(
                      "(2 * __ndis * 1000000 + __ntok) div (2 * __ntok)")))
        d = (token_budget_selection(scored, id_col, "__sm", "__ntok",
                                    budget_num=num, budget_den=den)
             .filter(F.col("selected"))
             .drop("__ntok", "__ndis", "__sm", "cum_before", "selected"))
        d = note("budgeted", d)

    # 7. split assignment + epoch sharding (train split only gets
    # shards; val/test keep shard_id null)
    d = split_assign(d, id_col, rates=cfg.split_rates,
                     salt=cfg.salt + ":split")
    train = epoch_shards(d.filter(F.col("split") == "train"),
                         id_col, shard_size=cfg.shard_size,
                         salt=cfg.salt + ":epoch0", pos_col="epoch_pos")
    rest = (d.filter(F.col("split") != "train")
            .withColumn("shard_id", F.lit(None).cast("long"))
            .withColumn("epoch_pos", F.lit(None).cast("long")))
    out = train.unionByName(rest)
    return note("output", out)


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str,
                text_col: str) -> DataFrame:
    """Dataset-version diff: classify every document across two corpus
    snapshots as ``added`` / ``removed`` / ``changed`` / ``unchanged``
    by content fingerprint — the audit step between dataset releases
    (what moved, and how much, before a retrain is approved).

    Content equality is the normalized-text md5 (the dedup
    fingerprint), so whitespace-only edits read as ``unchanged`` —
    the same equivalence the dedup stages use.

    Shape at 100 TB: one full outer equi-join on the id; fingerprints
    are computed in the scan projection, so each side is read once and
    only (id, 16-byte hash) flows through the shuffle.
    """
    o = old.select(F.col(id_col), TA.fingerprint(text_col).alias("__fo"))
    n = new.select(F.col(id_col), TA.fingerprint(text_col).alias("__fn"))
    j = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("__fo").isNull(), F.lit("added"))
              .when(F.col("__fn").isNull(), F.lit("removed"))
              .when(F.col("__fo") == F.col("__fn"), F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select(F.col(id_col), status.alias("status"))
