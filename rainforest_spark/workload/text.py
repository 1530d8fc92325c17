"""Text / dedup workload on the documents table (SURVEY §7 Phase 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rainforest_spark.operators import dedup as D
from rainforest_spark.operators import text_analysis as TA
from rainforest_spark.workload.common import T

QUERIES = {}
ORACLES = {}


def q(name, sql=None):
    def reg(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return reg


# DuckDB fragment: normalized text (matches TA.normalized_text)
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
# DuckDB fragment: token array of normalized text
_WORDS = f"string_split({_NORM}, ' ')"


# ---------------------------------------------------------------- q40
# Exact dedup via normalized-text fingerprint (hash groupBy).
@q("q40_fingerprint_dedup", sql=f"""
SELECT md5({_NORM}) AS fingerprint,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_dups
FROM documents GROUP BY 1
""")
def q40(spark, sf):
    return D.exact_dedup_groups(T(spark, sf, "documents"), "doc_id", "text")


# ---------------------------------------------------------------- q41
# Token counting (whitespace tokenizer) + char length.
@q("q41_token_count", sql="""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
       CAST(length(text) AS INT) AS n_chars_actual
FROM documents
""")
def q41(spark, sf):
    d = T(spark, sf, "documents")
    return d.select("doc_id",
                    TA.token_count("text").cast("int").alias("n_tokens"),
                    F.length("text").cast("int").alias("n_chars_actual"))


# ---------------------------------------------------------------- q42
# Quality-scoring features: punct/digit ratios, stopword ratio.
@q("q42_quality_score", sql=f"""
SELECT doc_id,
       ROUND(CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
             / length(text), 6) AS punct_ratio,
       ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             / length(text), 6) AS digit_ratio,
       ROUND(CAST(len(list_filter({_WORDS},
                  t -> t IN ('the','and','of','to','is'))) AS DOUBLE)
             / len(string_split_regex(trim(text), '\\s+')), 6) AS stopword_ratio
FROM documents
""")
def q42(spark, sf):
    d = T(spark, sf, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    n_tok = TA.token_count(t)
    return d.select(
        "doc_id",
        F.round(F.regexp_count(t, F.lit(r"[^\w\s]")) / n_chars, 6)
         .alias("punct_ratio"),
        F.round(F.regexp_count(t, F.lit(r"[0-9]")) / n_chars, 6)
         .alias("digit_ratio"),
        F.round(TA.stopword_count(t, TA.LANG_STOPWORDS["en"]) / n_tok, 6)
         .alias("stopword_ratio"))


# ---------------------------------------------------------------- q43
# Language-ID heuristic: stopword votes, priority-order tie-break.
_LANGS = sorted(TA.LANG_STOPWORDS)


def _sql_score(lg):
    words = ",".join(f"'{w}'" for w in TA.LANG_STOPWORDS[lg])
    return f"len(list_filter({_WORDS}, t -> t IN ({words})))"


@q("q43_lang_id", sql=f"""
WITH s AS (
  SELECT doc_id, lang,
         {", ".join(f"{_sql_score(lg)} AS s_{lg}" for lg in _LANGS)}
  FROM documents),
m AS (SELECT *, greatest({", ".join("s_" + lg for lg in _LANGS)}) AS best FROM s)
SELECT doc_id, lang,
       CASE {" ".join(f"WHEN s_{lg} = best THEN '{lg}'" for lg in _LANGS)}
       END AS pred_lang
FROM m
""")
def q43(spark, sf):
    d = T(spark, sf, "documents").select("doc_id", "lang", "text")
    return TA.lang_id(d, "text").select("doc_id", "lang", "pred_lang")


# ---------------------------------------------------------------- q44
# Exact n-gram Jaccard near-dup pairs (shingle self-join).
@q("q44_ngram_jaccard", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2
""")
def q44(spark, sf):
    return D.ngram_jaccard_pairs(T(spark, sf, "documents"), "doc_id", "text",
                                 n=3, threshold=0.2)


# ---------------------------------------------------------------- q45
# MinHash + LSH banding candidate pairs (shingle→minhash→band→bucket join).
@q("q45_minhash_lsh", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
mh AS (
  -- shingle pre-hashed once to a fixed-width key (matches the engine's
  -- shuffle-size optimization); seeded hashes run over the short key
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || '|' || md5(shingle))) AS mh
  FROM sh, UNNEST(generate_series(0, 15)) AS s(seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS BIGINT) AS band_id,
         md5(string_agg(mh, '' ORDER BY seed)) AS band_hash
  FROM mh GROUP BY doc_id, floor(seed / 4))
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_hash = b.band_hash
 AND a.doc_id < b.doc_id
""")
def q45(spark, sf):
    return D.lsh_candidate_pairs(T(spark, sf, "documents"), "doc_id", "text",
                                 n=3, num_hashes=16, band_size=4)


# ---------------------------------------------------------------- q64
# BPE-ish pre-tokenizer count (the token-budget estimator; GPT-2-style
# public regex, engine-portable RE2/Java subset — text_analysis.py
# BPE_ISH_PATTERN).  Whitespace counting is q41; this measures what a
# real tokenizer would see.
@q("q64_bpe_token_count", sql=r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}'']+|\s'
         )) AS INT) AS n_bpe_tokens,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS n_ws_tokens
FROM documents
""")
def q64(spark, sf):
    d = T(spark, sf, "documents")
    return d.select(
        "doc_id",
        TA.bpe_ish_token_count("text").cast("int").alias("n_bpe_tokens"),
        TA.token_count("text").cast("int").alias("n_ws_tokens"))


# ---------------------------------------------------------------- q63
# The production near-dup pipeline: LSH candidates (q45 machinery) +
# exact Jaccard VERIFICATION on candidates only (q44 machinery) — the
# composition that replaces the all-pairs shingle join at scale.
@q("q63_minhash_verified_neardup", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
mh AS (
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || '|' || md5(shingle))) AS mh
  FROM sh, UNNEST(generate_series(0, 15)) AS s(seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS BIGINT) AS band_id,
         md5(string_agg(mh, '' ORDER BY seed)) AS band_hash
  FROM mh GROUP BY doc_id, floor(seed / 4)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
""")
def q63(spark, sf):
    return D.minhash_verified_pairs(T(spark, sf, "documents"), "doc_id",
                                    "text", n=3, num_hashes=16,
                                    band_size=4, threshold=0.5)


# ---------------------------------------------------------------- q68
# Near-dup CLUSTER formation: connected components over the exact
# n-gram-Jaccard pair graph (the step after pair generation that a
# production dedup pipeline needs — keep min-id per component).  Spark
# side: iterative min-label propagation; oracle: recursive transitive
# closure over the same (portable, q44-proven) edge set.
@q("q68_neardup_clusters", sql="""
WITH RECURSIVE
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM edges),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src)
SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
FROM reach GROUP BY src
""")
def q68(spark, sf):
    from rainforest_spark.operators.dedup import (
        neardup_clusters, ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(T(spark, sf, "documents"), "doc_id",
                                "text", n=3, threshold=0.2)
    return neardup_clusters(pairs)


# ---------------------------------------------------------------- q69
# TF-IDF top terms per document (corpus-level salience for topic
# filtering / keyword extraction).  Scores round to 6 BEFORE ranking
# with a term tie-break so both engines rank identically.
@q("q69_tfidf_top_terms", sql="""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term,
         ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""")
def q69(spark, sf):
    return TA.tfidf_top_terms(T(spark, sf, "documents"), "doc_id",
                              "text", k=3)


# ---------------------------------------------------------------- q75
# Sequence packing (concat-and-chunk): documents ordered by doc_id are
# laid head-to-tail on a token tape cut every 512 tokens; a document's
# bin is the chunk holding its first token.  All-integer cumsum (the
# grouped ranged_cumsum machinery, no single-partition window) — the
# training-batch assembly step of an LLM data pipeline, exactly
# reproducible on both engines.
@q("q75_sequence_packing", sql="""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cw
  FROM t)
SELECT CAST((cw - n_tokens) // 512 AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
       MIN(doc_id) AS first_doc
FROM c GROUP BY 1
""")
def q75(spark, sf):
    from rainforest_spark.operators.packing import pack_contiguous

    d = T(spark, sf, "documents").select(
        "doc_id", TA.token_count("text").cast("long").alias("n_tokens"))
    packed = pack_contiguous(d, "doc_id", "n_tokens", budget=512)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok_sum"),
        F.min("doc_id").alias("first_doc"))


# ---------------------------------------------------------------- q76
# Deterministic train/val/test split: md5('split-v1:' || doc_id) prefix
# → uniform bucket in [0, 256) → 90/5/5 labels.  Order-free and stable
# under table growth (a document keeps its split forever — the
# contamination-control property).  The oracle compares the two-char
# hex prefix LEXICOGRAPHICALLY ('e6' = 230, 'f3' = 243): monotonic with
# the numeric bucket for lowercase hex, so both engines agree exactly.
@q("q76_deterministic_split", sql="""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         substr(md5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
  FROM documents)
SELECT CASE WHEN h < 'e6' THEN 'train'
            WHEN h < 'f3' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       MIN(doc_id) AS first_doc
FROM s GROUP BY 1
""")
def q76(spark, sf):
    from rainforest_spark.operators.packing import split_assign

    d = T(spark, sf, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars"))
    s = split_assign(d, "doc_id",
                     rates={"train": 0.90, "val": 0.05, "test": 0.05},
                     salt="split-v1")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.min("doc_id").alias("first_doc"))


# ---------------------------------------------------------------- q78
# Document chunking: fixed 256-char windows with 32-char overlap
# (stride 224), the retrieval/embedding preprocessing fan-out — pure
# sequence+explode+substring, no UDF.  A trailing window of <= overlap
# chars is a strict suffix of its predecessor and is not emitted.  Result is per-chunk scalars
# (lengths + a chunk fingerprint) so the hash gate covers the exact
# chunk CONTENT without hashing megabytes of text cells twice.
@q("q78_document_chunking", sql="""
WITH d AS (
  SELECT doc_id, COALESCE(text, '') AS t FROM documents),
k AS (
  SELECT doc_id, t,
         UNNEST(generate_series(0,
             CAST(floor((GREATEST(length(t) - 32, 1) - 1) / 224)
                  AS BIGINT)))
           AS ki
  FROM d)
SELECT doc_id, CAST(ki AS BIGINT) AS chunk_idx,
       CAST(ki * 224 + 1 AS BIGINT) AS chunk_start,
       CAST(length(substr(t, CAST(ki * 224 + 1 AS INTEGER), 256))
            AS BIGINT) AS chunk_len,
       md5(substr(t, CAST(ki * 224 + 1 AS INTEGER), 256)) AS chunk_md5
FROM k
""")
def q78(spark, sf):
    chunks = TA.chunk_text(T(spark, sf, "documents"), "doc_id", "text",
                           chunk_chars=256, overlap=32)
    return chunks.select(
        "doc_id", "chunk_idx", "chunk_start",
        F.length("chunk").cast("long").alias("chunk_len"),
        F.md5("chunk").alias("chunk_md5"))


# ---------------------------------------------------------------- q79
# Pretraining quality-filter signals: within-doc duplicate-5-gram ratio
# (Gopher-style repetition cut) + email/URL match counts — all JVM
# array/regex column ops, n-grams built in-expression (never exploded).
@q("q79_quality_signals", sql="""
WITH w AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t
  FROM documents),
g AS (
  SELECT doc_id, text, t,
         GREATEST(len(t) - 4, 0) AS total,
         CASE WHEN len(t) >= 5 THEN
           list_transform(generate_series(1, len(t) - 4),
                          i -> array_to_string(t[i:i+4], ' '))
         ELSE [] END AS ng
  FROM w)
SELECT doc_id,
       CASE WHEN total > 0
            THEN ROUND(1.0 - len(list_distinct(ng))
                       / CAST(total AS DOUBLE), 6) END AS dup_ngram_ratio,
       CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
            AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, 'https?://[^\\s]+'))
            AS BIGINT) AS n_urls
FROM g
""")
def q79(spark, sf):
    return TA.repetition_signals(T(spark, sf, "documents"),
                                 "doc_id", "text", n=5)


# ---------------------------------------------------------------- q80
# Benchmark decontamination: docs with doc_id % 20 == 0 play the eval
# set; every other doc sharing any word 8-gram with it is flagged with
# its shared-gram count.  Gram-keyed equi-join (never doc×doc) with the
# tiny eval side broadcast — the canonical pre-training hygiene pass.
@q("q80_decontamination", sql="""
WITH g AS (
  SELECT doc_id, gram
  FROM (
    SELECT doc_id,
           UNNEST(list_distinct(
             CASE WHEN len(t) >= 8 THEN
               list_transform(generate_series(1, len(t) - 7),
                              i -> array_to_string(t[i:i+7], ' '))
             ELSE [] END)) AS gram
    FROM (SELECT doc_id,
                 string_split_regex(trim(text), '\\s+') AS t
          FROM documents))),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 20 = 0),
tr AS (SELECT * FROM g WHERE doc_id % 20 != 0)
SELECT tr.doc_id AS train_id, COUNT(*) AS n_shared_grams
FROM tr JOIN ev USING (gram)
GROUP BY 1
""")
def q80(spark, sf):
    d = T(spark, sf, "documents")
    ev = d.filter(F.col("doc_id") % 20 == 0)
    tr = d.filter(F.col("doc_id") % 20 != 0)
    return TA.contamination_overlap(tr, ev, "doc_id", "text", n=8)


# ---------------------------------------------------------------- q81
# Domain-mixture sampling: per-source keep rates via the salted-hash
# Bernoulli (order-free, stable under growth).  The rate CASE chain and
# its hex thresholds come from ONE Python dict through
# mixture.rate_threshold_hex, so both engines test the identical
# lexicographic predicate.
from rainforest_spark.operators import mixture as MX  # noqa: E402

_MIX_RATES = {f"src{i}": (2 * i + 1) / 20 for i in range(10)}
_MIX_DEFAULT = 0.5
_MIX_CASE = ("CASE source " + " ".join(
    f"WHEN '{s}' THEN '{MX.rate_threshold_hex(r)}'"
    for s, r in _MIX_RATES.items())
    + f" ELSE '{MX.rate_threshold_hex(_MIX_DEFAULT)}' END")


@q("q81_domain_mixture", sql=f"""
WITH s AS (
  SELECT doc_id, source, length(text) AS n_chars,
         substr(md5('mix-v1:' || CAST(doc_id AS VARCHAR)), 1, 6) AS h
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       MIN(doc_id) AS first_doc
FROM s WHERE h < {_MIX_CASE}
GROUP BY 1
""")
def q81(spark, sf):
    d = T(spark, sf, "documents").select(
        "doc_id", "source", F.length("text").cast("long").alias("n_chars"))
    kept = MX.weighted_sample(d, "doc_id", _MIX_RATES,
                              group_col="source",
                              default_rate=_MIX_DEFAULT, salt="mix-v1")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.min("doc_id").alias("first_doc"))


# ---------------------------------------------------------------- q82
# Per-domain cap: at most 10 docs per source, picked by salted-hash
# order (deterministic uniform pick, not ingest order).
@q("q82_domain_cap", sql="""
WITH r AS (
  SELECT doc_id, source, length(text) AS n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY substr(md5('cap-v1:' || CAST(doc_id AS VARCHAR)), 1, 6),
                    doc_id) AS rk
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       MIN(doc_id) AS first_doc
FROM r WHERE rk <= 10
GROUP BY 1
""")
def q82(spark, sf):
    d = T(spark, sf, "documents").select(
        "doc_id", "source", F.length("text").cast("long").alias("n_chars"))
    kept = MX.cap_per_group(d, "source", "doc_id", k=10, salt="cap-v1")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.min("doc_id").alias("first_doc"))


# ---------------------------------------------------------------- q83
# Unigram-LM quality scoring: per-doc mean negative log-likelihood
# under the corpus's own unigram MLE (the KenLM-perplexity stand-in).
# Determinism: per-term -ln p rounded to 1e-9 then DECIMAL-summed
# (order-free); the mean's round-to-6 happens in exact integer
# arithmetic because the 1e-9-grid sum over an integer count can land
# exactly ON the half-micro boundary (3/500 docs at sf0.01), where the
# engines' double-rounding conventions disagree.
@q("q83_unigram_logprob", sql="""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
voc AS (SELECT term, COUNT(*) AS n_term FROM toks GROUP BY 1),
tot AS (SELECT CAST(SUM(n_term) AS DOUBLE) AS tot FROM voc),
per AS (
  SELECT doc_id, tf,
         CAST(CAST(ROUND(-ln(n_term / tot), 9) AS DECIMAL(19,9))
              * 1000000000 AS BIGINT) * tf AS n9
  FROM tf JOIN voc USING (term) CROSS JOIN tot),
agg AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         CAST(SUM(n9) AS BIGINT) AS n9
  FROM per GROUP BY 1)
SELECT doc_id, n_tokens,
       CAST((2 * n9 + 1000 * n_tokens) // (2000 * n_tokens) AS DOUBLE)
         / 1000000.0 AS mean_nll
FROM agg
""")
def q83(spark, sf):
    return TA.unigram_logprob(T(spark, sf, "documents"), "doc_id", "text")


# ---------------------------------------------------------------- q84
# Epoch shuffle + sharding: salted-hash order, distributed ordered
# count (ranged_cumsum — no single-partition window), 64-doc shards.
@q("q84_epoch_shard", sql="""
WITH s AS (
  SELECT doc_id, length(text) AS n_chars,
         md5('epoch-0:' || CAST(doc_id AS VARCHAR))
           || lpad(CAST(doc_id AS VARCHAR), 20, '0') AS k
  FROM documents),
r AS (SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY k) AS rn
      FROM s)
SELECT CAST((rn - 1) // 64 AS BIGINT) AS shard_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       MIN(doc_id) AS first_doc
FROM r GROUP BY 1
""")
def q84(spark, sf):
    from rainforest_spark.operators.packing import epoch_shards

    d = T(spark, sf, "documents").select(
        "doc_id", F.length("text").cast("long").alias("n_chars"))
    s = epoch_shards(d, "doc_id", shard_size=64, salt="epoch-0")
    return s.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars_sum"),
        F.min("doc_id").alias("first_doc"))


# ---------------------------------------------------------------- q86
# PII redaction (C4/Dolma-style scrub): emails, URLs, long digit runs
# -> typed placeholders, as chained regexp_replace passes.  The driver
# corpus is PII-free word soup, so both engines deterministically
# append the SAME synthetic contact block to every doc first — the
# oracle then verifies the scrub does real work (md5 of the redacted
# text, bit-exact) rather than passing on a no-op.  Patterns are
# RE2-compatible so Java regex and DuckDB RE2 replace identically.
@q("q86_pii_redaction", sql="""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.com or https://ex.org/d/'
              || CAST(doc_id AS VARCHAR)
              || ' tel +41 79 ' || CAST(doc_id * 7 + 100000 AS VARCHAR)
           AS t
  FROM documents),
p1 AS (SELECT doc_id, t,
              len(regexp_extract_all(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                AS n_email,
              regexp_replace(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                  '[EMAIL]', 'g') AS t1
       FROM aug),
p2 AS (SELECT doc_id, n_email,
              len(regexp_extract_all(t1, 'https?://[^\\s]+')) AS n_url,
              regexp_replace(t1, 'https?://[^\\s]+', '[URL]', 'g') AS t2
       FROM p1),
p3 AS (SELECT doc_id, n_email, n_url,
              len(regexp_extract_all(t2, '\\+?\\d(?:[\\d -]*\\d){5,}'))
                AS n_num,
              regexp_replace(t2, '\\+?\\d(?:[\\d -]*\\d){5,}',
                             '[NUM]', 'g') AS t3
       FROM p2)
SELECT doc_id,
       CAST(n_email + n_url + n_num AS BIGINT) AS n_pii,
       md5(t3) AS redacted_md5,
       CAST(length(t3) AS BIGINT) AS redacted_len
FROM p3
""")
def q86(spark, sf):
    d = T(spark, sf, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or https://ex.org/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" tel +41 79 "),
            (F.col("doc_id") * 7 + 100000).cast("string")).alias("t"))
    red = TA.pii_redact("t")
    return aug.select(
        "doc_id",
        TA.pii_counts("t").alias("n_pii"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).cast("long").alias("redacted_len"))


# ---------------------------------------------------------------- q88
# Corpus statistics report: the per-source summary a curation run
# publishes (doc/lang counts, token mass, discrete char-length
# quantiles).  Quantiles are rank-based (value at row floor((n-1)q)+1
# in (n_chars, doc_id) order) — pure integer rank arithmetic, so both
# engines pick the IDENTICAL element; no interpolation, no approx
# sketch.  At scale this is one window + one groupBy per source.
@q("q88_corpus_stats", sql="""
WITH r AS (
  SELECT source, lang, doc_id, length(text) AS n_chars,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY length(text), doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM documents)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(CASE WHEN rn = (cnt - 1) // 2 + 1
                     THEN n_chars END) AS BIGINT) AS median_chars,
       CAST(MAX(CASE WHEN rn = ((cnt - 1) * 9) // 10 + 1
                     THEN n_chars END) AS BIGINT) AS p90_chars
FROM r GROUP BY 1
""")
def q88(spark, sf):
    from pyspark.sql import Window

    d = T(spark, sf, "documents").select(
        "source", "lang", "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        TA.token_count("text").cast("long").alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    r = (d.withColumn("rn", F.row_number().over(w))
         .withColumn("cnt", F.count(F.lit(1)).over(wc)))
    med_rn = F.floor((F.col("cnt") - 1) / 2) + 1
    p90_rn = F.floor((F.col("cnt") - 1) * 9 / 10) + 1
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max(F.when(F.col("rn") == med_rn, F.col("n_chars")))
        .cast("long").alias("median_chars"),
        F.max(F.when(F.col("rn") == p90_rn, F.col("n_chars")))
        .cast("long").alias("p90_chars"))


# ---------------------------------------------------------------- q89
# Packed-tape materialization: the step after q75's bin assignment —
# each 512-token bin's documents concatenated in tape order with an
# EOS boundary marker.  The hash gate covers the exact tape CONTENT
# via md5 (hashing megabytes of tape twice would be the same bytes
# anyway); within-bin order is doc_id, so both engines agg the
# identical string.
@q("q89_packed_tapes", sql="""
WITH t AS (
  SELECT doc_id, text,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, text, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cw
  FROM t),
b AS (
  SELECT CAST((cw - n_tokens) // 512 AS BIGINT) AS bin_id,
         doc_id, text, n_tokens
  FROM c)
SELECT bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tok_sum,
       md5(string_agg(text, ' <|eos|> ' ORDER BY doc_id)) AS tape_md5,
       CAST(length(string_agg(text, ' <|eos|> ' ORDER BY doc_id))
            AS BIGINT) AS tape_len
FROM b GROUP BY 1
""")
def q89(spark, sf):
    from rainforest_spark.operators.packing import materialize_packed

    d = T(spark, sf, "documents").select(
        "doc_id", "text",
        TA.token_count("text").cast("long").alias("n_tokens"))
    tapes = materialize_packed(d, "doc_id", "n_tokens", "text",
                               budget=512)
    return tapes.select(
        "bin_id", "n_docs", "tok_sum",
        F.md5("tape").alias("tape_md5"),
        F.length("tape").cast("long").alias("tape_len"))


# ---------------------------------------------------------------- q91
# Collocation extraction: corpus-level PMI over adjacent word pairs,
# min-count cut, global top-100 on (pmi DESC, w1, w2).  Both engines
# build the ln argument with the identical double expression tree
# (left-assoc bigint*double products), so the 6dp round is engine-exact.
@q("q91_pmi_bigrams", sql=f"""
WITH arr AS (
  SELECT string_split({_NORM}, ' ') AS w FROM documents),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM arr, UNNEST(CASE WHEN len(w) >= 2
                        THEN generate_series(1, len(w) - 1)
                        ELSE []::BIGINT[] END) AS t(i)),
c12 AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bg GROUP BY 1, 2),
uni AS (
  SELECT u.t AS term, COUNT(*) AS n
  FROM arr, UNNEST(w) AS u(t) WHERE u.t != '' GROUP BY 1),
tots AS (
  SELECT (SELECT CAST(SUM(n) AS DOUBLE) FROM uni) AS n_tok,
         (SELECT CAST(SUM(pair_count) AS DOUBLE) FROM c12) AS n_big)
SELECT w1, w2, pair_count,
       ROUND(ln((pair_count * n_tok * n_tok)
                / (n_big * u1.n * u2.n)), 6) AS pmi
FROM c12
JOIN uni u1 ON c12.w1 = u1.term
JOIN uni u2 ON c12.w2 = u2.term
CROSS JOIN tots
WHERE pair_count >= 2
ORDER BY pmi DESC, w1, w2 LIMIT 100
""")
def q91(spark, sf):
    return TA.pmi_bigrams(T(spark, sf, "documents"), "doc_id", "text",
                          min_count=2, k=100)


# ---------------------------------------------------------------- q92
# Cross-document repeated-span detection (word-granularity substring
# dedup, Lee-et-al-2022-style): maximal token spans of 5-grams that
# appear verbatim in >= 2 distinct documents, merged per doc by cummax
# sessionization.  Pure integer output.
@q("q92_repeated_spans", sql=f"""
WITH arr AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS shingle
  FROM arr, UNNEST(CASE WHEN len(w) >= 5
                        THEN generate_series(1, len(w) - 4)
                        ELSE []::BIGINT[] END) AS t(i)),
hot AS (SELECT shingle FROM g GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >= 2),
h AS (SELECT g.doc_id, g.pos FROM g JOIN hot USING (shingle)),
m AS (
  SELECT doc_id, pos,
         MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) + 4 AS prev_end
  FROM h),
s AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS span_id
  FROM m)
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 4 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 4 - MIN(pos) + 1 AS BIGINT) AS span_tokens,
       COUNT(*) AS n_hot_grams
FROM s GROUP BY 1, 2
""")
def q92(spark, sf):
    return D.repeated_spans(T(spark, sf, "documents"), "doc_id", "text",
                            n=5, min_docs=2)


# ---------------------------------------------------------------- q94
# Tokenizer-coverage report: per-source total/OOV token counts and OOV
# rate against the corpus's own top-500-term vocabulary.  The OOV rate
# is exact-integer round-half-up at 6dp (a ratio like 1/16000 lands ON
# the half-micro boundary where double rounding diverges by engine).
@q("q94_vocab_coverage", sql=f"""
WITH toks AS (
  SELECT source, u.t AS term
  FROM (SELECT source, string_split({_NORM}, ' ') AS w FROM documents),
       UNNEST(w) AS u(t) WHERE u.t != ''),
tf AS (SELECT source, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
uni AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
voc AS (SELECT term, 1 AS in_v FROM uni ORDER BY n DESC, term LIMIT 500),
j AS (SELECT tf.source, tf.tf, voc.in_v
      FROM tf LEFT JOIN voc USING (term)),
agg AS (
  SELECT source, CAST(SUM(tf) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN in_v IS NULL THEN tf ELSE 0 END) AS BIGINT)
           AS oov_tokens
  FROM j GROUP BY 1)
SELECT source, total_tokens, oov_tokens,
       CAST((2 * oov_tokens * 1000000 + total_tokens)
            // (2 * total_tokens) AS DOUBLE) / 1000000.0 AS oov_rate
FROM agg
""")
def q94(spark, sf):
    return TA.vocab_coverage(T(spark, sf, "documents"), "source", "text",
                             vocab_k=500)


# ---------------------------------------------------------------- q95
# Keep-first-occurrence substring dedup (the q92 TRANSFORM): a hot-gram
# occurrence is dropped iff its doc is not the gram's MIN doc; dropped
# ranges merge per doc; the cleaned text is the surviving normalized
# tokens.  The md5 gate covers the exact cleaned CONTENT.
@q("q95_span_excision", sql=f"""
WITH arr AS (
  SELECT doc_id, string_split({_NORM}, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, i AS pos, array_to_string(w[i:i+4], ' ') AS shingle
  FROM arr, UNNEST(CASE WHEN len(w) >= 5
                        THEN generate_series(1, len(w) - 4)
                        ELSE []::BIGINT[] END) AS t(i)),
gs AS (SELECT shingle, MIN(doc_id) AS keeper FROM g
       GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2),
drp AS (SELECT g.doc_id, g.pos FROM g JOIN gs USING (shingle)
        WHERE g.doc_id != gs.keeper),
m AS (
  SELECT doc_id, pos,
         MAX(pos) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) + 4 AS prev_end
  FROM drp),
sp AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev_end IS NULL OR pos > prev_end + 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM m),
rs AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 4 AS e
       FROM sp GROUP BY doc_id, sid),
tok AS (
  SELECT doc_id, i AS tpos, w[i] AS tok
  FROM arr, UNNEST(generate_series(1, len(w))) AS u(i)
  WHERE w[i] != ''),
mk AS (
  SELECT t.doc_id, t.tpos, t.tok,
         CASE WHEN EXISTS (SELECT 1 FROM rs
                           WHERE rs.doc_id = t.doc_id
                             AND t.tpos BETWEEN rs.s AND rs.e)
              THEN 1 ELSE 0 END AS gone
  FROM tok t),
agg AS (
  SELECT doc_id,
         CAST(SUM(1 - gone) AS BIGINT) AS n_tokens_kept,
         CAST(SUM(gone) AS BIGINT) AS n_tokens_removed,
         COALESCE(string_agg(CASE WHEN gone = 0 THEN tok END, ' '
                             ORDER BY tpos), '') AS cleaned
  FROM mk GROUP BY 1)
SELECT d.doc_id,
       COALESCE(a.n_tokens_kept, 0) AS n_tokens_kept,
       COALESCE(a.n_tokens_removed, 0) AS n_tokens_removed,
       md5(COALESCE(a.cleaned, '')) AS cleaned_md5,
       CAST(length(COALESCE(a.cleaned, '')) AS BIGINT) AS cleaned_len
FROM documents d LEFT JOIN agg a USING (doc_id)
""")
def q95(spark, sf):
    out = D.excise_repeated_spans(T(spark, sf, "documents"),
                                  "doc_id", "text", n=5, min_docs=2)
    return out.select(
        "doc_id", "n_tokens_kept", "n_tokens_removed",
        F.md5("cleaned").alias("cleaned_md5"),
        F.length("cleaned").cast("long").alias("cleaned_len"))


# ---------------------------------------------------------------- q96
# DSIR-style importance weights: per-source-pool-document unigram
# log-likelihood ratio target/source (target = src0 docs), via the
# q83 integer-nanos path so the sum is order-free and engine-exact.
@q("q96_dsir_weights", sql=f"""
WITH toks AS (
  SELECT doc_id, source = 'src0' AS is_t, t.term
  FROM (SELECT doc_id, source, string_split({_NORM}, ' ') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
tgt AS (SELECT term, COUNT(*) AS nt FROM toks WHERE is_t GROUP BY 1),
src AS (SELECT term, COUNT(*) AS ns FROM toks WHERE NOT is_t GROUP BY 1),
tt AS (SELECT CAST(SUM(nt) AS DOUBLE) AS tt FROM tgt),
ts AS (SELECT CAST(SUM(ns) AS DOUBLE) AS ts FROM src),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE NOT is_t GROUP BY 1, 2),
per AS (
  SELECT doc_id, tf,
         (CAST(CAST(ROUND(ln(nt / tt), 9) AS DECIMAL(19,9))
               * 1000000000 AS BIGINT)
          - CAST(CAST(ROUND(ln(ns / ts), 9) AS DECIMAL(19,9))
                 * 1000000000 AS BIGINT)) * tf AS n9
  FROM tf JOIN tgt USING (term) JOIN src USING (term)
  CROSS JOIN tt CROSS JOIN ts)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_scored_tokens,
       CAST(CAST(SUM(n9) AS BIGINT) AS DOUBLE) / 1000000000.0
         AS log_weight
FROM per GROUP BY 1
""")
def q96(spark, sf):
    d = T(spark, sf, "documents")
    return TA.dsir_weights(d, "doc_id", "text",
                           target_pred=F.col("source") == "src0")


# ---------------------------------------------------------------- q97
# Incremental near-dup: the NEW ingest batch (doc_id % 5 == 0) checked
# against the EXISTING corpus (the rest) — band-table equi-join for
# candidates, exact Jaccard verification on candidates only.  The
# daily-append shape: O(batch) work against a persisted corpus band
# table, never a corpus re-dedup.
@q("q97_incremental_dedup", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
mh AS (
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || '|' || md5(shingle))) AS mh
  FROM sh, UNNEST(generate_series(0, 15)) AS s(seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS BIGINT) AS band_id,
         md5(string_agg(mh, '' ORDER BY seed)) AS band_hash
  FROM mh GROUP BY doc_id, floor(seed / 4)),
cand AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0),
inter AS (
  SELECT c.new_id, c.old_id, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.new_id
  JOIN sh b ON b.doc_id = c.old_id AND b.shingle = a.shingle
  GROUP BY 1, 2)
SELECT new_id, old_id,
       ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = new_id
JOIN sz sb ON sb.doc_id = old_id
WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.5
""")
def q97(spark, sf):
    d = T(spark, sf, "documents")
    return D.incremental_neardup(
        d.filter(F.col("doc_id") % 5 == 0),
        d.filter(F.col("doc_id") % 5 != 0),
        "doc_id", "text", n=3, num_hashes=16, band_size=4, threshold=0.5)


# ---------------------------------------------------------------- q98
# Domain-characteristic terms: log-odds with informative Dirichlet
# prior (Monroe et al. 2008), z-scored, top-10 per source.  Both
# engines build the identical double expression tree; z rounds to 6dp
# BEFORE the (z DESC, term) rank.
@q("q98_domain_terms", sql=f"""
WITH toks AS (
  SELECT source, u.t AS term
  FROM (SELECT source, string_split({_NORM}, ' ') AS w FROM documents),
       UNNEST(w) AS u(t) WHERE u.t != ''),
yg AS (SELECT source, term, COUNT(*) AS y FROM toks GROUP BY 1, 2),
yw AS (SELECT term, COUNT(*) AS yw FROM toks GROUP BY 1),
ng AS (SELECT source, COUNT(*) AS ns FROM toks GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
sc AS (
  SELECT source, term, y,
         ROUND((ln((y + 100.0 * (yw / n))
                   / (ns + 100.0 - y - 100.0 * (yw / n)))
                - ln(((yw - y) + 100.0 * (yw / n))
                     / ((n - ns) + 100.0 - (yw - y) - 100.0 * (yw / n))))
               / sqrt(1.0 / (y + 100.0 * (yw / n))
                      + 1.0 / ((yw - y) + 100.0 * (yw / n))), 6) AS z
  FROM yg JOIN yw USING (term) JOIN ng USING (source) CROSS JOIN tot),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY z DESC, term) AS rnk
      FROM sc)
SELECT source, CAST(rnk AS BIGINT) AS rnk, term,
       y AS term_count, z
FROM r WHERE rnk <= 10
""")
def q98(spark, sf):
    return TA.domain_terms(T(spark, sf, "documents"), "source", "text",
                           k=10, prior_mass=100.0)


# ---------------------------------------------------------------- q99
# Corpus drift: per-source Jensen-Shannon divergence vs the whole
# corpus's unigram distribution, absent-term tail folded algebraically
# (integer-sum covered mass), per-term contributions through the q83
# integer-nanos path.
@q("q99_corpus_drift", sql=f"""
WITH toks AS (
  SELECT source, u.t AS term
  FROM (SELECT source, string_split({_NORM}, ' ') AS w FROM documents),
       UNNEST(w) AS u(t) WHERE u.t != ''),
yg AS (SELECT source, term, COUNT(*) AS y FROM toks GROUP BY 1, 2),
yw AS (SELECT term, COUNT(*) AS yw FROM toks GROUP BY 1),
ng AS (SELECT source, COUNT(*) AS ns FROM toks GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks),
per AS (
  SELECT source, yw,
         CAST(CAST(ROUND(
           ((y / ns) * ln((y / ns)
                          / (((y / ns) + (yw / n)) / 2.0))
            + (yw / n) * ln((yw / n)
                            / (((y / ns) + (yw / n)) / 2.0))) / 2.0,
           9) AS DECIMAL(19,9)) * 1000000000 AS BIGINT) AS n9,
         n
  FROM yg JOIN yw USING (term) JOIN ng USING (source) CROSS JOIN tot),
agg AS (
  SELECT source, COUNT(*) AS n_terms,
         CAST(SUM(n9) AS BIGINT) AS n9,
         CAST(SUM(yw) AS BIGINT) AS cov,
         MAX(n) AS nn
  FROM per GROUP BY 1)
SELECT source, n_terms,
       ROUND(CAST(n9 AS DOUBLE) / 1000000000.0
             + 0.5 * ln(2.0) * ((nn - cov) / nn), 6) AS jsd
FROM agg
""")
def q99(spark, sf):
    return TA.corpus_drift_jsd(T(spark, sf, "documents"), "source",
                               "text")


# ---------------------------------------------------------------- q100
# Batch novelty scoring: per new-batch doc (doc_id % 5 == 0), the
# fraction of its distinct 3-gram shingles absent from the existing
# corpus (the rest) — q97's analysis complement.  Exact-integer 6dp
# round; gram-less docs surface with NULL novelty.
@q("q100_novelty_score", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
old_g AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 5 != 0),
j AS (
  SELECT s.doc_id, s.shingle, o.shingle IS NOT NULL AS seen
  FROM sh s LEFT JOIN old_g o USING (shingle)
  WHERE s.doc_id % 5 = 0),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN NOT seen THEN 1 ELSE 0 END) AS BIGINT)
           AS n_novel
  FROM j GROUP BY 1)
SELECT d.doc_id,
       COALESCE(a.n_grams, 0) AS n_grams,
       COALESCE(a.n_novel, 0) AS n_novel,
       CAST((2 * a.n_novel * 1000000 + a.n_grams)
            // (2 * a.n_grams) AS DOUBLE) / 1000000.0 AS novelty
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN agg a USING (doc_id)
""")
def q100(spark, sf):
    d = T(spark, sf, "documents")
    return D.novelty_scores(d.filter(F.col("doc_id") % 5 == 0),
                            d.filter(F.col("doc_id") % 5 != 0),
                            "doc_id", "text", n=3)


# ---------------------------------------------------------------- q101
# Leakage-free dataset split: near-dup clusters (q68's component
# machinery over the exact-Jaccard pair graph) are split as UNITS via
# their min-id representative — a test doc's near-twin can never land
# in train.  Singletons key on their own id, so this degrades exactly
# to q76's split when no pairs exist.
@q("q101_leakage_free_split", sql="""
WITH RECURSIVE
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM edges),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
cl AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       FROM reach GROUP BY src),
j AS (
  SELECT d.doc_id,
         CAST(COALESCE(cl.cluster_id, d.doc_id) AS BIGINT)
           AS cluster_rep
  FROM documents d LEFT JOIN cl USING (doc_id)),
s AS (
  SELECT doc_id, cluster_rep,
         substr(md5('split-v1:' || CAST(cluster_rep AS VARCHAR)),
                1, 2) AS h
  FROM j)
SELECT doc_id, cluster_rep,
       CASE WHEN h < 'e6' THEN 'train'
            WHEN h < 'f3' THEN 'val'
            ELSE 'test' END AS split
FROM s
""")
def q101(spark, sf):
    from rainforest_spark.operators.dedup import ngram_jaccard_pairs
    from rainforest_spark.operators.packing import leakage_free_split

    d = T(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)
    out = leakage_free_split(d.select("doc_id"), pairs, "doc_id",
                             rates={"train": 0.90, "val": 0.05,
                                    "test": 0.05}, salt="split-v1")
    return out.select("doc_id", "cluster_rep", "split")


# ---------------------------------------------------------------- q102
# Per-source boilerplate removal (CCNet-style): non-overlapping 8-word
# tiles of the normalized text that repeat across >=2 docs AND >=5% of
# the source's docs are stripped from EVERY occurrence (unlike q95's
# keep-first span excision); the cleaned text is fingerprinted for the
# downstream dedup key.  Integer cross-multiplied threshold — no FP.
@q("q102_boilerplate_removal", sql=f"""
WITH w AS (SELECT doc_id, source, {_WORDS} AS words FROM documents),
t AS (
  SELECT doc_id, source, u.i AS pos,
         array_to_string(words[8*u.i+1 : 8*u.i+8], ' ') AS tile
  FROM w, UNNEST(generate_series(
         0, CAST(floor((len(words) + 7) / 8) AS INT) - 1)) AS u(i)),
srcn AS (SELECT source, COUNT(DISTINCT doc_id) AS nd
         FROM documents GROUP BY 1),
tdf AS (SELECT source, tile, COUNT(DISTINCT doc_id) AS df
        FROM t GROUP BY 1, 2),
bp AS (SELECT source, tile FROM tdf JOIN srcn USING (source)
       WHERE df >= 2 AND df * 20 >= nd),
kept AS (SELECT t.doc_id, t.pos, t.tile
         FROM t ANTI JOIN bp
           ON t.source = bp.source AND t.tile = bp.tile),
agg AS (SELECT doc_id, COUNT(*) AS n_kept,
               array_to_string(list(tile ORDER BY pos), ' ') AS cleaned
        FROM kept GROUP BY 1),
nt AS (SELECT doc_id, COUNT(*) AS n_tiles FROM t GROUP BY 1)
SELECT d.doc_id, CAST(nt.n_tiles AS INT) AS n_tiles,
       CAST(nt.n_tiles - COALESCE(agg.n_kept, 0) AS INT) AS n_removed,
       md5(COALESCE(agg.cleaned, '')) AS cleaned_fp
FROM documents d JOIN nt USING (doc_id) LEFT JOIN agg USING (doc_id)
""")
def q102(spark, sf):
    return TA.remove_boilerplate(T(spark, sf, "documents"),
                                 "doc_id", "text", "source")


# ---------------------------------------------------------------- q103
# Canonical-doc selection per near-dup cluster: q101's component
# machinery over the exact-Jaccard pair graph, then each cluster keeps
# its highest-token-count member (smallest id on ties) via one exact
# integer arg-max key.  Singletons are their own canonical.
@q("q103_cluster_canonical", sql=f"""
WITH RECURSIVE
sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id, {_WORDS} AS words FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.2),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM edges),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
cl AS (SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       FROM reach GROUP BY src),
j AS (
  SELECT d.doc_id,
         CAST(COALESCE(cl.cluster_id, d.doc_id) AS BIGINT) AS cluster_rep,
         CAST(len({_WORDS}) AS BIGINT) AS q
  FROM documents d LEFT JOIN cl USING (doc_id)),
canon AS (
  SELECT cluster_rep,
         arg_max(doc_id, q * 10000000000 - doc_id) AS canonical_id
  FROM j GROUP BY 1)
SELECT j.doc_id, j.cluster_rep, canon.canonical_id,
       j.doc_id = canon.canonical_id AS is_canonical
FROM j JOIN canon USING (cluster_rep)
""")
def q103(spark, sf):
    from rainforest_spark.operators.dedup import (canonical_per_cluster,
                                                  ngram_jaccard_pairs)

    d = T(spark, sf, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.2)
    docs = d.select(
        "doc_id",
        F.size(F.split(TA.normalized_text("text"), " ")).alias("__q"))
    return canonical_per_cluster(docs, pairs, "doc_id", "__q") \
        .select("doc_id", "cluster_rep", "canonical_id", "is_canonical")


# ---------------------------------------------------------------- q105
# Token-budget curriculum selection: lexical-diversity score in exact
# integer micro-units, best-first order as ONE exact BIGINT key, and a
# DISTRIBUTED ordered cumsum (ranged_cumsum, no single-partition
# window) cut at 60% of the corpus tokens via integer cross-multiply.
@q("q105_token_budget", sql=f"""
WITH s AS (
  SELECT doc_id, len(words) AS n, len(list_distinct(words)) AS d
  FROM (SELECT doc_id, {_WORDS} AS words FROM documents)),
k AS (SELECT doc_id, n,
             (2 * d * 1000000 + n) // (2 * n) AS sm
      FROM s),
c AS (SELECT doc_id, n, sm,
             SUM(n) OVER (ORDER BY (1000000 - sm) * 10000000000 + doc_id)
               AS cw,
             SUM(n) OVER () AS total
      FROM k)
SELECT doc_id, CAST(sm AS DOUBLE) / 1000000.0 AS score,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(cw - n AS BIGINT) AS cum_before,
       (cw - n) * 5 < total * 3 AS selected
FROM c
""")
def q105(spark, sf):
    from rainforest_spark.operators.mixture import token_budget_selection

    d = T(spark, sf, "documents")
    words = F.split(TA.normalized_text("text"), " ")
    base = d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("__d"))
    base = base.withColumn(
        "__sm",
        F.expr("(2 * __d * 1000000 + n_tokens) div (2 * n_tokens)"))
    out = token_budget_selection(base, "doc_id", "__sm", "n_tokens",
                                 budget_num=3, budget_den=5)
    return out.select(
        "doc_id",
        (F.col("__sm").cast("double") / F.lit(1000000.0)).alias("score"),
        "n_tokens", "cum_before", "selected")


# ---------------------------------------------------------------- q106
# Interpolated bigram-LM quality scoring: one modeling step past q83
# (word order now matters).  Same exactness policy: per-type -ln p on
# the 1e-9 grid as integer nanos, exact integer sum, round-half-up
# mean as pure integer division.
@q("q106_bigram_logprob", sql="""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
           FROM documents),
bg AS (
  SELECT doc_id, words[u.i] AS w1, words[u.i+1] AS w2
  FROM w, UNNEST(generate_series(1, len(words) - 1)) AS u(i)
  WHERE words[u.i] != '' AND words[u.i+1] != ''),
tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
cb AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
cs AS (SELECT w1, COUNT(*) AS cs FROM bg GROUP BY 1),
toks AS (
  SELECT t.term FROM w, UNNEST(words) AS t(term) WHERE t.term != ''),
cu AS (SELECT term AS w2, COUNT(*) AS cu FROM toks GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tot FROM toks),
per AS (
  SELECT doc_id, tf,
         CAST(CAST(ROUND(-ln(0.75 * (cb / cs) + 0.25 * (cu / tot)), 9)
                   AS DECIMAL(19,9)) * 1000000000 AS BIGINT) * tf AS n9
  FROM tf JOIN cb USING (w1, w2) JOIN cs USING (w1) JOIN cu USING (w2)
  CROSS JOIN tot),
agg AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         CAST(SUM(n9) AS BIGINT) AS n9
  FROM per GROUP BY 1)
SELECT doc_id, n_bigrams,
       CAST((2 * n9 + 1000 * n_bigrams) // (2000 * n_bigrams) AS DOUBLE)
         / 1000000.0 AS mean_nll
FROM agg
""")
def q106(spark, sf):
    return TA.bigram_logprob(T(spark, sf, "documents"), "doc_id", "text")


# ---------------------------------------------------------------- q108
# Corpus Zipf power-law fit: ln(freq) ~ ln(rank) least squares as five
# EXACT decimal sufficient-statistic sums over the vocab (q83's 1e-9
# grid policy); only the closed-form division runs in double (one
# expression, bit-identical), rounded to 6dp.
@q("q108_zipf_fit", sql="""
WITH toks AS (
  SELECT t.term
  FROM (SELECT string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
voc AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, term ASC) AS r
  FROM voc),
xy AS (
  SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(ROUND(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM ranked),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
         COUNT(DISTINCT y) AS dy,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy
  FROM xy)
SELECT n_terms,
       ROUND((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6)
         AS zipf_slope,
       ROUND((sy - ((n_terms * sxy - sx * sy)
                    / (n_terms * sxx - sx * sx)) * sx) / n_terms, 6)
         AS zipf_intercept,
       ROUND(CASE WHEN dy > 1 THEN
               (n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
               / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy))
             END, 6) AS r2
FROM s
""")
def q108(spark, sf):
    return TA.zipf_fit(T(spark, sf, "documents"), "text")


# ---------------------------------------------------------------- q109
# Heaps'-law vocabulary-growth fit: per-doc growth curve built with
# one first-occurrence groupBy + two distributed cumsums, then the
# shared exact-decimal sufficient-statistics regression (see q108).
@q("q109_heaps_fit", sql="""
WITH toks AS (
  SELECT doc_id AS d, t.term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
per_doc AS (SELECT d, COUNT(*) AS nt FROM toks GROUP BY 1),
firsts AS (SELECT term, MIN(d) AS d FROM toks GROUP BY 1),
newv AS (SELECT d, COUNT(*) AS nv FROM firsts GROUP BY 1),
g AS (
  SELECT p.d, p.nt, COALESCE(n.nv, 0) AS nv
  FROM per_doc p LEFT JOIN newv n USING (d)),
c AS (
  SELECT d, SUM(nt) OVER (ORDER BY d) AS ct,
         SUM(nv) OVER (ORDER BY d) AS cv
  FROM g),
xy AS (
  SELECT CAST(ROUND(ln(CAST(ct AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
         CAST(ROUND(ln(CAST(cv AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
  FROM c WHERE cv > 0),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         COUNT(DISTINCT y) AS dy,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,18))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,18))) AS DOUBLE) AS syy
  FROM xy)
SELECT n_docs,
       ROUND((n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx), 6)
         AS heaps_beta,
       ROUND((sy - ((n_docs * sxy - sx * sy)
                    / (n_docs * sxx - sx * sx)) * sx) / n_docs, 6)
         AS heaps_log_k,
       ROUND(CASE WHEN dy > 1 THEN
               (n_docs * sxy - sx * sy) * (n_docs * sxy - sx * sy)
               / ((n_docs * sxx - sx * sx) * (n_docs * syy - sy * sy))
             END, 6) AS r2
FROM s
""")
def q109(spark, sf):
    return TA.heaps_fit(T(spark, sf, "documents"), "doc_id", "text")


# ---------------------------------------------------------------- q110
# Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
# exponential keys): deterministic md5 uniforms via the portable
# per-nibble hex->int, keys on the 1e-9 grid, global top-m as
# per-partition heaps + one m-row merge (TakeOrderedAndProject).
from rainforest_spark.operators.mixture import hex_uniform_expr as _hex_u

_Q110_U = _hex_u("md5(concat('es-v1:', cast(doc_id as string)))")


@q("q110_weighted_sample", sql=f"""
WITH k AS (
  SELECT doc_id, source, n_chars,
         ROUND(-ln(({_Q110_U} + 0.5) / 4294967296.0)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM documents)
SELECT doc_id, source, n_chars, es_key
FROM k ORDER BY es_key ASC, doc_id ASC LIMIT 50
""")
def q110(spark, sf):
    from rainforest_spark.operators.mixture import (
        weighted_sample_no_replacement,
    )

    d = T(spark, sf, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample_no_replacement(d, "doc_id", "n_chars", m=50)


# ---------------------------------------------------------------- q112
# Curriculum source-interleaving (stride scheduling): salted order
# within source, midpoint fraction (2r-1)/(2n) as ONE exact BIGINT key
# (integer div, dense group id in the low digits), global position via
# the distributed ordered count.  No FP anywhere.
@q("q112_interleave", sql="""
WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
g AS (SELECT source, row_number() OVER (ORDER BY source) - 1 AS gid
      FROM (SELECT DISTINCT source FROM documents)),
r AS (SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('interleave-v1:' || CAST(doc_id AS VARCHAR)),
                        doc_id) AS src_rank
      FROM documents),
o AS (SELECT r.doc_id, r.source, r.src_rank,
             ((2*r.src_rank - 1) * CAST(1000000000000 AS BIGINT)
              // (2*n.n)) * 1000000 + g.gid AS ord
      FROM r JOIN n USING (source) JOIN g USING (source))
SELECT doc_id, source, CAST(src_rank AS BIGINT) AS src_rank,
       CAST(row_number() OVER (ORDER BY ord) - 1 AS BIGINT) AS position
FROM o
""")
def q112(spark, sf):
    from rainforest_spark.operators.mixture import interleave_sources

    d = T(spark, sf, "documents").select("doc_id", "source")
    out = interleave_sources(d, "doc_id", "source")
    return out.select("doc_id", "source",
                      F.col("src_rank").cast("long").alias("src_rank"),
                      "position")


# ---------------------------------------------------------------- q113
# Dedup-loss rebalancing: exact dedup keeps min-id docs; survivors are
# down-sampled back to the ORIGINAL per-source proportions with
# runtime-computed rates (m * o_s / k_s, m = min survivor ratio); the
# binding sources are detected by EXACT decimal cross-multiply
# (k_a*o_b > k_b*o_a) and pinned to rate 1.0 so FP noise can't miss
# the 'g' keep-all sentinel; thresholds round HALF-UP (floor(x+0.5)),
# matching the literal-rate path's convention.
@q("q113_dedup_rebalance", sql=f"""
WITH kept AS (
  SELECT doc_id, source FROM documents
  WHERE doc_id IN (
    SELECT MIN(doc_id) FROM documents
    GROUP BY md5({_NORM}))),
o AS (SELECT source, COUNT(*) AS o FROM documents GROUP BY 1),
k AS (SELECT source, COUNT(*) AS k FROM kept GROUP BY 1),
c AS (SELECT source, o, k FROM o JOIN k USING (source)),
m AS (SELECT MIN(CAST(k AS DOUBLE) / o) AS m FROM c),
v AS (SELECT a.source, a.o, a.k,
             MAX(CASE WHEN CAST(a.k AS DECIMAL(19,0)) * b.o
                           > CAST(b.k AS DECIMAL(19,0)) * a.o
                      THEN 1 ELSE 0 END) AS viol
      FROM c a CROSS JOIN c b GROUP BY 1, 2, 3),
rr AS (SELECT source,
              CASE WHEN viol = 0 THEN 1.0
                   ELSE m.m * v.o / v.k END AS rate
       FROM v CROSS JOIN m),
rates AS (
  SELECT source,
         CASE WHEN rate >= 1 THEN 'g'
              WHEN floor(rate * 16777216 + 0.5) >= 16777216 THEN 'g'
              ELSE printf('%06x',
                          CAST(floor(rate * 16777216 + 0.5) AS INTEGER))
         END AS thr
  FROM rr)
SELECT kept.doc_id, kept.source
FROM kept JOIN rates USING (source)
WHERE substr(md5('rebalance-v1:' || CAST(kept.doc_id AS VARCHAR)), 1, 6)
      < rates.thr
""")
def q113(spark, sf):
    from rainforest_spark.operators.dedup import exact_dedup_groups
    from rainforest_spark.operators.mixture import rebalance_after_dedup

    d = T(spark, sf, "documents").select("doc_id", "source", "text")
    keep_ids = exact_dedup_groups(d, "doc_id", "text").select(
        F.col("canonical_id").alias("doc_id"))
    kept = d.join(keep_ids, "doc_id", "semi").select("doc_id", "source")
    return rebalance_after_dedup(d.select("doc_id", "source"), kept,
                                 "doc_id", "source")


# ---------------------------------------------------------------- q114
# Dataset-version diff: v1 drops every 7th doc (deletions) and v2
# rewrites every 11th doc's text (edits); every doc classifies as
# added/removed/changed/unchanged by the normalized-text fingerprint
# through ONE full outer equi-join on the id.
@q("q114_corpus_diff", sql=f"""
WITH v1 AS (
  SELECT doc_id, md5({_NORM}) AS f FROM documents WHERE doc_id % 7 != 0),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN md5(regexp_replace(lower(trim(text || ' edited')),
                                      '\\s+', ' ', 'g'))
              ELSE md5({_NORM}) END AS f
  FROM documents)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.f IS NULL THEN 'added'
            WHEN v2.f IS NULL THEN 'removed'
            WHEN v1.f = v2.f THEN 'unchanged'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
""")
def q114(spark, sf):
    from rainforest_spark.operators.curation import corpus_diff

    d = T(spark, sf, "documents")
    v1 = d.filter(F.col("doc_id") % 7 != 0)
    v2 = d.withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.col("text"), F.lit(" edited")))
        .otherwise(F.col("text")))
    return corpus_diff(v1, v2, "doc_id", "text")


# ---------------------------------------------------------------- q116
# Length-bucketed batch assembly: width-64 length buckets, salted
# order, 32-doc batches, per-batch padding-waste accounting.  Pure
# integer arithmetic end-to-end.
@q("q116_length_batches", sql=f"""
WITH l AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tok
  FROM documents),
b AS (
  SELECT doc_id, n_tok, n_tok // 64 AS bucket,
         (row_number() OVER (
            PARTITION BY n_tok // 64
            ORDER BY md5('lenbatch-v1:' || CAST(doc_id AS VARCHAR)),
                     doc_id) - 1) // 32 AS batch_id
  FROM l)
SELECT bucket, batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_tok) AS BIGINT) AS max_len,
       CAST(SUM(n_tok) AS BIGINT) AS sum_len,
       CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT)
         AS padding_waste
FROM b GROUP BY 1, 2
""")
def q116(spark, sf):
    from rainforest_spark.operators.packing import length_bucketed_batches

    d = T(spark, sf, "documents").select(
        "doc_id", TA.token_count("text").cast("long").alias("n_tok"))
    return length_bucketed_batches(d, "doc_id", "n_tok")


# ---------------------------------------------------------------- q117
# Tokenizer fertility per language: BPE-ish subword count over
# whitespace word count — the tokenizer-health metric that flags
# scripts the vocab serves badly.  Integer sums, one rounded division.
@q("q117_tokenizer_fertility", sql=r"""
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}'']+|\s'
         ))) AS BIGINT) AS n_subwords,
       CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
         AS n_words,
       ROUND(CAST(SUM(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}'']+|\s'
         ))) AS DOUBLE)
         / SUM(len(string_split_regex(trim(text), '\s+'))), 6)
         AS fertility
FROM documents GROUP BY lang
""")
def q117(spark, sf):
    d = T(spark, sf, "documents")
    agg = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(TA.bpe_ish_token_count("text")).cast("long")
        .alias("n_subwords"),
        F.sum(TA.token_count("text")).cast("long").alias("n_words"))
    return agg.withColumn(
        "fertility",
        F.round(F.col("n_subwords").cast("double") / F.col("n_words"), 6))


# ---------------------------------------------------------------- q118
# Span-corruption masking plan (T5-style prep): deterministic ~15%
# token masking by salted hash, adjacent masked tokens coalesced into
# spans via gaps-and-islands; per-doc span accounting with the exact
# integer round-half-up mean.
@q("q118_masking_plan", sql="""
WITH toks AS (
  SELECT doc_id, u.i AS i
  FROM (SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(generate_series(1, len(w))) AS u(i)),
masked AS (
  SELECT doc_id, i,
         i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
           AS island
  FROM toks
  WHERE substr(md5('mask-v1:' || CAST(doc_id AS VARCHAR) || ':'
                   || CAST(i AS VARCHAR)), 1, 6) < '266666'),
spans AS (
  SELECT doc_id, island, COUNT(*) AS span_len
  FROM masked GROUP BY 1, 2)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(span_len) AS BIGINT) AS n_masked,
       CAST(MAX(span_len) AS BIGINT) AS max_span,
       CAST((2 * SUM(span_len) * 1000000 + COUNT(*))
            // (2 * COUNT(*)) AS DOUBLE) / 1000000.0 AS mean_span
FROM spans GROUP BY doc_id
""")
def q118(spark, sf):
    from pyspark.sql import Window

    d = T(spark, sf, "documents")
    toks = d.select("doc_id",
                    F.posexplode(TA.tokens("text")).alias("p", "__t"))
    toks = toks.withColumn("i", F.col("p") + 1).drop("p", "__t")
    h = F.substring(
        F.md5(F.concat(F.lit("mask-v1:"), F.col("doc_id").cast("string"),
                       F.lit(":"), F.col("i").cast("string"))), 1, 6)
    m = toks.filter(h < "266666")
    w = Window.partitionBy("doc_id").orderBy("i")
    m = m.withColumn("island", F.col("i") - F.row_number().over(w))
    spans = m.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("span_len"))
    agg = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("span_len").cast("long").alias("n_masked"),
        F.max("span_len").cast("long").alias("max_span"))
    mean = F.expr("(2 * n_masked * 1000000 + n_spans)"
                  " div (2 * n_spans)")
    return agg.withColumn(
        "mean_span", mean.cast("double") / F.lit(1000000.0))


# ---------------------------------------------------------------- q115
# Per-source duplication profile: docs vs distinct content
# fingerprints, the largest duplicate group, and the dup ratio in
# exact integer micro-units — the corpus-health panel that tells a
# pipeline WHERE its dedup budget goes before it runs dedup.
@q("q115_duplication_profile", sql=f"""
WITH fp AS (
  SELECT source, md5({_NORM}) AS f FROM documents),
g AS (SELECT source, f, COUNT(*) AS n FROM fp GROUP BY 1, 2)
SELECT source,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(MAX(n) AS BIGINT) AS max_group,
       CAST((2 * (SUM(n) - COUNT(*)) * 1000000 + SUM(n))
            // (2 * SUM(n)) AS DOUBLE) / 1000000.0 AS dup_ratio
FROM g GROUP BY source
""")
def q115(spark, sf):
    d = T(spark, sf, "documents")
    g = (d.select("source", TA.fingerprint("text").alias("f"))
         .groupBy("source", "f").agg(F.count(F.lit(1)).alias("n")))
    agg = g.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.max("n").cast("long").alias("max_group"))
    ratio = F.expr("(2 * (n_docs - n_unique) * 1000000 + n_docs)"
                   " div (2 * n_docs)")
    return agg.withColumn("dup_ratio",
                          ratio.cast("double") / F.lit(1000000.0))


# ---------------------------------------------------------------- q119
# Pairwise cross-source contamination matrix: 3-gram Jaccard between
# every pair of sources (complete matrix incl. zero-overlap pairs),
# exact-integer counts through one rounded double division.
@q("q119_source_overlap", sql=f"""
WITH g AS (
  SELECT DISTINCT source,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT source, {_WORDS} AS words FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)),
sz AS (SELECT source, COUNT(*) AS sz FROM g GROUP BY 1),
inter AS (
  SELECT a.source AS group_a, b.source AS group_b, COUNT(*) AS c
  FROM g a JOIN g b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2),
pairs AS (
  SELECT a.source AS group_a, b.source AS group_b,
         a.sz AS n_a, b.sz AS n_b
  FROM sz a CROSS JOIN sz b WHERE a.source < b.source)
SELECT p.group_a, p.group_b,
       CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS n_common,
       ROUND(CAST(COALESCE(i.c, 0) AS DOUBLE)
             / (p.n_a + p.n_b - COALESCE(i.c, 0)), 6) AS jaccard
FROM pairs p LEFT JOIN inter i USING (group_a, group_b)
""")
def q119(spark, sf):
    out = D.group_overlap(T(spark, sf, "documents"), "doc_id", "text",
                          "source", n=3)
    return out.select("group_a", "group_b",
                      F.col("n_a").cast("long").alias("n_a"),
                      F.col("n_b").cast("long").alias("n_b"),
                      F.col("n_common").cast("long").alias("n_common"),
                      "jaccard")


# ---------------------------------------------------------------- q120
# Per-source corpus report card: volume, exact-dup exposure (corpus-
# wide fingerprint counts — cross-source copies count), mean length,
# language spread.
@q("q120_source_scorecard", sql=f"""
WITH d AS (
  SELECT doc_id, source, lang, md5({_NORM}) AS fp,
         len(string_split_regex(trim(text), '\\s+')) AS nt
  FROM documents),
fc AS (SELECT fp, COUNT(*) AS fn FROM d GROUP BY 1)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN fc.fn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_docs,
       ROUND(CAST(SUM(CASE WHEN fc.fn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS dup_rate,
       ROUND(CAST(SUM(nt) AS DOUBLE) / COUNT(*), 6) AS mean_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
FROM d JOIN fc USING (fp)
GROUP BY 1
""")
def q120(spark, sf):
    out = TA.source_scorecard(T(spark, sf, "documents"), "doc_id",
                              "text", "source", lang_col="lang")
    return out.select("source",
                      F.col("n_docs").cast("long").alias("n_docs"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      F.col("dup_docs").cast("long").alias("dup_docs"),
                      "dup_rate", "mean_tokens",
                      F.col("n_langs").cast("long").alias("n_langs"))


# ---------------------------------------------------------------- q121
# Stratified eval-set sampling to a total budget with sqrt allocation:
# per-source rates over the tiny count dim (1e-9-grid decimal weight
# sum, q83 policy), keep rule = the unified half-up hex threshold.
@q("q121_stratified_sample", sql="""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
w AS (SELECT source, n,
             CAST(ROUND(sqrt(CAST(n AS DOUBLE)), 9) AS DECIMAL(19,9)) AS w9
      FROM c),
t AS (SELECT CAST(SUM(w9) AS DOUBLE) AS tw FROM w),
rates AS (
  SELECT source,
         LEAST(1.0, 120.0 * CAST(w9 AS DOUBLE) / (t.tw * n)) AS rate
  FROM w CROSS JOIN t),
thr AS (
  SELECT source,
         CASE WHEN rate >= 1 THEN 'g'
              WHEN floor(rate * 16777216 + 0.5) >= 16777216 THEN 'g'
              ELSE printf('%06x',
                          CAST(floor(rate * 16777216 + 0.5) AS INTEGER))
         END AS thr
  FROM rates)
SELECT d.doc_id, d.source
FROM documents d JOIN thr USING (source)
WHERE substr(md5('strat-v1:' || CAST(d.doc_id AS VARCHAR)), 1, 6)
      < thr.thr
""")
def q121(spark, sf):
    from rainforest_spark.operators.mixture import stratified_sample

    d = T(spark, sf, "documents").select("doc_id", "source")
    return stratified_sample(d, "doc_id", "source", budget=120)


# ---------------------------------------------------------------- q123
# Asymmetric containment dedup (quote/excerpt case): shared-gram
# candidates, |A∩B|/|A| oriented small->large, exact-integer ratio.
@q("q123_containment_pairs", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
  GROUP BY 1, 2),
o AS (
  SELECT ida, idb, i, sa.sz AS sza
  FROM inter
  JOIN sz sa ON sa.doc_id = ida
  JOIN sz sb ON sb.doc_id = idb
  WHERE sa.sz < sb.sz OR (sa.sz = sb.sz AND ida < idb))
SELECT ida AS contained_id, idb AS container_id,
       ROUND(CAST(i AS DOUBLE) / sza, 6) AS containment
FROM o
WHERE ROUND(CAST(i AS DOUBLE) / sza, 6) >= 0.5
""")
def q123(spark, sf):
    return D.containment_pairs(T(spark, sf, "documents"), "doc_id",
                               "text", n=3, threshold=0.5)


# ---------------------------------------------------------------- q126
# CCNet-style per-language perplexity bucketing: q83's unigram-LM mean
# NLL, ranked per language on (mean_nll, doc_id), cut into equal-count
# head/middle/tail by exact integer rank arithmetic ((rn-1)*3) div cnt.
# The Spark side ranks via the grouped ranged_cumsum (languages = few
# huge groups), the oracle via a plain window — same total order.
@q("q126_perplexity_buckets", sql="""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
voc AS (SELECT term, COUNT(*) AS n_term FROM toks GROUP BY 1),
tot AS (SELECT CAST(SUM(n_term) AS DOUBLE) AS tot FROM voc),
per AS (
  SELECT doc_id, tf,
         CAST(CAST(ROUND(-ln(n_term / tot), 9) AS DECIMAL(19,9))
              * 1000000000 AS BIGINT) * tf AS n9
  FROM tf JOIN voc USING (term) CROSS JOIN tot),
agg AS (
  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         CAST(SUM(n9) AS BIGINT) AS n9
  FROM per GROUP BY 1),
l AS (
  SELECT a.doc_id, d.lang, a.n_tokens,
         CAST((2 * n9 + 1000 * n_tokens) // (2000 * n_tokens) AS DOUBLE)
           / 1000000.0 AS mean_nll
  FROM agg a JOIN documents d USING (doc_id)),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY mean_nll, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM l)
SELECT doc_id, lang, n_tokens, mean_nll,
       CAST(((rn - 1) * 3) // cnt AS INTEGER) AS bucket,
       CASE ((rn - 1) * 3) // cnt
            WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
            ELSE 'tail' END AS label
FROM r
""")
def q126(spark, sf):
    return TA.perplexity_buckets(T(spark, sf, "documents"), "doc_id",
                                 "text", "lang")


# ---------------------------------------------------------------- q127
# Okapi BM25 retrieval: top-10 docs per query over the corpus.  The
# whole score is a rational expression over the integers (tf, dl, df,
# N, S) except the IDF ln, which both sides round to 1e-9 immediately;
# contributions ride q83's integer-nanos sum and the round-to-6 is
# half-up BIGINT arithmetic.  Constants are dyadic (k1=1.25, b=0.75 →
# 2.25/0.25 literals, exact doubles on both engines; the SQL CASTs
# them to DOUBLE so DuckDB cannot route the arithmetic through its
# exact-DECIMAL literal type, which would diverge from Spark's double
# expression tree).
@q("q127_bm25_topk", sql="""
WITH toks AS (
  SELECT doc_id, t.term
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
st AS (SELECT COUNT(*) AS N, CAST(SUM(dl) AS BIGINT) AS S FROM dl),
qq(query_id, qtext) AS (
  VALUES (CAST(0 AS BIGINT), 'spark window join'),
         (CAST(1 AS BIGINT), 'hash table scan'),
         (CAST(2 AS BIGINT), 'customer stream value')),
qt AS (
  SELECT DISTINCT query_id, t.term
  FROM (SELECT query_id,
               string_split_regex(trim(qtext), '\\s+') AS w FROM qq),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
m AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(CAST(ROUND(
           ROUND(ln(CAST(1.0 AS DOUBLE)
                    + (N - df + CAST(0.5 AS DOUBLE))
                      / (df + CAST(0.5 AS DOUBLE))), 9)
           * (tf * CAST(2.25 AS DOUBLE)
              / (tf + CAST(1.25 AS DOUBLE)
                      * (CAST(0.25 AS DOUBLE)
                         + CAST(0.75 AS DOUBLE) * dl * N / S))), 9)
         AS DECIMAL(19,9)) * 1000000000 AS BIGINT) AS n9
  FROM tf JOIN qt USING (term) JOIN dl USING (doc_id)
       JOIN dfq USING (term) CROSS JOIN st),
sc AS (
  SELECT query_id, doc_id,
         CAST((SUM(n9) + 500) // 1000 AS DOUBLE) / 1000000.0 AS score
  FROM m GROUP BY 1, 2),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id) AS rnk
  FROM sc)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score
FROM r WHERE rnk <= 10
""")
def q127(spark, sf):
    return TA.bm25_topk(
        T(spark, sf, "documents"), "doc_id", "text",
        [(0, "spark window join"), (1, "hash table scan"),
         (2, "customer stream value")])


# ---------------------------------------------------------------- q128
# Per-source token-length histogram (64-token bins): integer bin keys
# and counts; the in-group share is one double division of BIGINTs.
@q("q128_length_histogram", sql="""
WITH d AS (
  SELECT source AS g,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n
  FROM documents),
b AS (
  SELECT g, CAST((n // 64) * 64 AS BIGINT) AS len_lo,
         COUNT(*) AS n_docs
  FROM d GROUP BY 1, 2),
t AS (SELECT g, CAST(SUM(n_docs) AS BIGINT) AS tot FROM b GROUP BY 1)
SELECT b.g AS source, b.len_lo, b.n_docs,
       ROUND(b.n_docs / t.tot, 6) AS share
FROM b JOIN t USING (g)
""")
def q128(spark, sf):
    return TA.length_histogram(T(spark, sf, "documents"), "source",
                               "text", bin_width=64)


# ---------------------------------------------------------------- q129
# Source-concentration diagnostic: token-mass ranks, Lorenz cumulative
# shares and the Gini coefficient — all windows run on the SOURCE DIM
# (bounded), masses/cumsums/Gini numerator stay integer, one rounded
# double division each.
@q("q129_source_concentration", sql="""
WITH m AS (
  SELECT source AS g,
         CAST(SUM(len(string_split_regex(trim(text), '\\s+')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
r AS (
  SELECT g, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, g) AS rank,
         ROW_NUMBER() OVER (ORDER BY n_tokens ASC, g DESC) AS i,
         SUM(n_tokens) OVER (ORDER BY n_tokens DESC, g
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM m),
s AS (
  SELECT *, SUM(n_tokens) OVER () AS tot, COUNT(*) OVER () AS cnt,
         SUM(CAST(i AS BIGINT) * n_tokens) OVER () AS wsum
  FROM r)
SELECT g AS source, n_tokens, CAST(rank AS BIGINT) AS rank,
       ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         AS cum_share,
       ROUND(CAST(2 * wsum - (cnt + 1) * tot AS DOUBLE)
             / CAST(cnt * tot AS DOUBLE), 6) AS gini
FROM s
""")
def q129(spark, sf):
    return TA.source_concentration(T(spark, sf, "documents"), "source",
                                   "text")


# ---------------------------------------------------------------- q130
# Per-source type-token ratio: lexical-richness diagnostic; distinct
# terms and token totals are exact integers through one rounded
# division.
@q("q130_type_token_ratio", sql="""
WITH toks AS (
  SELECT source AS g, t.term
  FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != '')
SELECT g AS source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT term) AS BIGINT) AS n_types,
       ROUND(COUNT(DISTINCT term) / COUNT(*), 6) AS ttr
FROM toks GROUP BY 1
""")
def q130(spark, sf):
    return TA.type_token_ratio(T(spark, sf, "documents"), "source",
                               "text")


# ---------------------------------------------------------------- q131
# Temperature-scaled mixture quotas (alpha=0.25 over languages): the
# mT5/XLM-R alpha-sampling rule with an EXACT largest-remainder integer
# allocation.  n^0.25 is a 2-fold IEEE sqrt chain (correctly rounded on
# every engine — no transcendental grid); weights become floor-nanos
# BIGINTs, quotas are pure integer arithmetic in HUGEINT/DECIMAL(38,0),
# and the leftover goes to the largest remainders (ties on the group
# ascending).  sum(alloc) == 1000 exactly on both engines.
from rainforest_spark.operators import mixture as MIX  # noqa: E402


@q("q131_temperature_mixture", sql="""
WITH c AS (
  SELECT lang AS grp, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1),
w AS (
  SELECT grp, n,
         CAST(FLOOR(sqrt(sqrt(CAST(n AS DOUBLE))) * 1000000000.0 + 0.5)
              AS BIGINT) AS nano
  FROM c),
t AS (SELECT CAST(SUM(nano) AS BIGINT) AS tt FROM w),
d AS (
  SELECT grp, n, nano, tt,
         CAST(nano AS HUGEINT) * 1000 AS prod,
         (CAST(nano AS HUGEINT) * 1000) // tt AS base
  FROM w CROSS JOIN t),
d2 AS (
  SELECT *, prod - base * tt AS rem,
         1000 - SUM(base) OVER () AS short,
         ROW_NUMBER() OVER (ORDER BY prod - base * tt DESC, grp)
           AS rr
  FROM d)
SELECT grp AS lang, n AS n_docs,
       ROUND(CAST(nano AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS weight,
       CAST(base + CASE WHEN rr <= short THEN 1 ELSE 0 END AS BIGINT)
         AS alloc
FROM d2
""")
def q131(spark, sf):
    return MIX.temperature_allocation(T(spark, sf, "documents"),
                                      "lang", budget=1000, alpha=0.25)


# ---------------------------------------------------------------- q132
# Per-source RELATIVE quality filter: keep each source's top half by
# the q42 quality score (stopword − punct − digit ratios, raw-double
# identical trees; rank order (score DESC, doc ASC) bit-deterministic).
# The Spark side ranks via the grouped ranged_cumsum (few huge
# sources); the oracle states the same rank as a plain partitioned
# window.  Kept count = ceil(n/2) in integer arithmetic.
_SW = ",".join(f"'{w}'" for w in TA.LANG_STOPWORDS["en"])


@q("q132_relative_quality", sql=f"""
WITH s AS (
  SELECT doc_id, source,
         CAST(len(list_filter({_WORDS}, t -> t IN ({_SW})))
              AS DOUBLE)
           / len(string_split_regex(trim(text), '\\s+'))
         - CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
           / length(text)
         - CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           / length(text) AS q
  FROM documents),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY q DESC, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n_group
  FROM s)
SELECT doc_id, source, ROUND(q, 6) AS quality,
       CAST(rnk AS BIGINT) AS rnk, CAST(n_group AS BIGINT) AS n_group
FROM r WHERE rnk <= (n_group + 1) // 2
""")
def q132(spark, sf):
    return TA.relative_quality_filter(T(spark, sf, "documents"),
                                      "doc_id", "text", "source")


# ---------------------------------------------------------------- q134
# Paragraph-level cross-document dedup with reassembly (MassiveText
# A.2.3): paragraphs = non-overlapping 12-word blocks of the
# normalized token stream (delimiter-free proxy — the operator takes a
# separator regex on real corpora); each distinct paragraph keeps its
# corpus-wide first occurrence by (doc_id, block), every other
# instance is dropped, and documents are reassembled in order.  The
# md5 gate covers the exact reassembled CONTENT.  Pure integer/string
# arithmetic — no floats anywhere, so hash parity is structural.
@q("q134_paragraph_dedup", sql=f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split({_NORM}, ' '), x -> x <> '') AS w
  FROM documents),
p AS (
  SELECT doc_id, i AS blk,
         array_to_string(w[(i*12+1):(i*12+12)], ' ') AS para
  FROM arr,
       UNNEST(CASE WHEN len(w) > 0
                   THEN generate_series(0, (len(w) + 11) // 12 - 1)
                   ELSE []::BIGINT[] END) AS t(i)),
f AS (SELECT para, MIN(doc_id * 1048576 + blk) AS fk
      FROM p GROUP BY 1),
k AS (SELECT p.doc_id, p.blk, p.para
      FROM p JOIN f USING (para)
      WHERE p.doc_id * 1048576 + p.blk = f.fk),
a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(para, ' ' ORDER BY blk) AS cleaned
      FROM k GROUP BY 1),
np AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_paras
       FROM p GROUP BY 1)
SELECT d.doc_id,
       COALESCE(np.n_paras, 0) AS n_paras,
       COALESCE(a.n_kept, 0) AS n_kept,
       md5(COALESCE(a.cleaned, '')) AS cleaned_md5,
       CAST(length(COALESCE(a.cleaned, '')) AS BIGINT) AS cleaned_len
FROM documents d
LEFT JOIN np USING (doc_id) LEFT JOIN a USING (doc_id)
""")
def q134(spark, sf):
    out = D.paragraph_dedup(T(spark, sf, "documents"),
                            "doc_id", "text", block_words=12)
    return out.select(
        "doc_id", "n_paras", "n_kept",
        F.md5("cleaned").alias("cleaned_md5"),
        F.length("cleaned").cast("long").alias("cleaned_len"))


# ---------------------------------------------------------------- q142
# TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
# the adjacent-term co-occurrence graph in EXACT-INTEGER nano-ranks —
# damping (r·17) div 20, per-edge share by the quotient/remainder
# split floor(a·w/W) = (a div W)·w + ((a mod W)·w) div W, so Spark's
# `div` and DuckDB's `//` agree bit-for-bit across all 4 unrolled
# iterations (operators/text_analysis.textrank_keywords).  Top-50 on
# (rank DESC, term).
_TR_ITER = """
r{n} AS (
  SELECT ew.dst AS term,
         150000000 + SUM( ((r.r * 17) // 20 // ew.W) * ew.wt
                        + ((((r.r * 17) // 20) % ew.W) * ew.wt) // ew.W )
             AS r
  FROM ew JOIN r{p} r ON ew.src = r.term GROUP BY 1)"""


@q("q142_textrank_keywords", sql=f"""
WITH arr AS (
  SELECT string_split({_NORM}, ' ') AS w FROM documents),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM arr, UNNEST(CASE WHEN len(w) >= 2
                        THEN generate_series(1, len(w) - 1)
                        ELSE []::BIGINT[] END) AS t(i)),
e0 AS (SELECT w1, w2 FROM bg
       WHERE w1 != w2 AND w1 != '' AND w2 != ''),
ed AS (SELECT src, dst, COUNT(*) AS wt FROM (
         SELECT w1 AS src, w2 AS dst FROM e0
         UNION ALL
         SELECT w2 AS src, w1 AS dst FROM e0)
       GROUP BY 1, 2),
dg AS (SELECT src, SUM(wt) AS W FROM ed GROUP BY 1),
ew AS (SELECT ed.src, ed.dst, ed.wt, dg.W FROM ed JOIN dg USING (src)),
r0 AS (SELECT src AS term, CAST(1000000000 AS BIGINT) AS r FROM dg),
{_TR_ITER.format(n=1, p=0)},
{_TR_ITER.format(n=2, p=1)},
{_TR_ITER.format(n=3, p=2)},
{_TR_ITER.format(n=4, p=3)}
SELECT term, CAST(r AS BIGINT) AS rank_nanos,
       ROUND(CAST(r AS DOUBLE) / 1e9, 6) AS score
FROM r4
ORDER BY r DESC, term LIMIT 50
""")
def q142(spark, sf):
    return TA.textrank_keywords(T(spark, sf, "documents"),
                                "doc_id", "text", iterations=4, k=50)


# ---------------------------------------------------------------- q181
# Keyword-in-context concordance (text_analysis.concordance): every
# occurrence of 'join' with 3 words of context — match-only explode,
# no shuffle; pure string/array expressions on the shared
# normalization.
@q("q181_concordance", sql="""
WITH d AS (SELECT doc_id,
                  string_split(regexp_replace(lower(trim(text)),
                                              '\\s+', ' ', 'g'),
                               ' ') AS ws
           FROM documents),
occ AS (SELECT doc_id, ws, i AS pos
        FROM d, UNNEST(generate_series(1, len(ws))) AS u(i)
        WHERE ws[i] = 'join')
SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       COALESCE(array_to_string(ws[GREATEST(pos - 3, 1): pos - 1],
                                ' '), '') AS left_context,
       COALESCE(array_to_string(ws[pos + 1: LEAST(pos + 3, len(ws))],
                                ' '), '') AS right_context
FROM occ
""")
def q181(spark, sf):
    return TA.concordance(T(spark, sf, "documents"), "doc_id", "text",
                          term="join", context=3)


# ---------------------------------------------------------------- q192
# MinHash/LSH estimator calibration (dedup family,
# operators/dedup.lsh_calibration): per LSH candidate pair, the
# matching-signature fraction (the MinHash estimator) vs the EXACT
# shingle Jaccard, grouped by match count — the (num_hashes,
# band_size) tuning table.  q45's candidate join + q63's verified
# Jaccard + one <=k+1-key groupBy; nano-exact means.
@q("q192_lsh_calibration", sql="""
WITH sh AS (
  SELECT DISTINCT doc_id,
         words[i] || ' ' || words[i+1] || ' ' || words[i+2] AS shingle
  FROM (SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                            ' ') AS words
        FROM documents),
       UNNEST(generate_series(1, len(words) - 2)) AS u(i)
),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
mh AS (
  SELECT doc_id, seed,
         MIN(md5(CAST(seed AS VARCHAR) || '|' || md5(shingle))) AS mh
  FROM sh, UNNEST(generate_series(0, 15)) AS s(seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 4) AS BIGINT) AS band_id,
         md5(string_agg(mh, '' ORDER BY seed)) AS band_hash
  FROM mh GROUP BY doc_id, floor(seed / 4)),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
m AS (
  SELECT c.id_a, c.id_b,
         CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
              AS BIGINT) AS matches
  FROM cand c
  JOIN mh ma ON ma.doc_id = c.id_a
  JOIN mh mb ON mb.doc_id = c.id_b AND mb.seed = ma.seed
  GROUP BY 1, 2),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
  GROUP BY 1, 2),
jac AS (
  SELECT id_a, id_b,
         CAST(FLOOR(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) * 1e9
                    + 0.5) AS BIGINT) AS jn
  FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b),
g AS (
  SELECT matches, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         SUM(CAST(jn AS HUGEINT)) AS sj,
         MIN(jn) AS jmin, MAX(jn) AS jmax
  FROM m JOIN jac USING (id_a, id_b)
  GROUP BY matches)
SELECT matches,
       CAST(matches AS DOUBLE) / CAST(16 AS DOUBLE) AS estimate,
       n_pairs,
       CAST((2 * sj + n_pairs - (2 * sj + n_pairs)
             % (2 * CAST(n_pairs AS HUGEINT)))
            // (2 * CAST(n_pairs AS HUGEINT)) AS DOUBLE) / 1e9
         AS mean_jaccard,
       CAST(jmin AS DOUBLE) / 1e9 AS min_jaccard,
       CAST(jmax AS DOUBLE) / 1e9 AS max_jaccard,
       ROUND(CAST(matches AS DOUBLE) / CAST(16 AS DOUBLE)
             - CAST((2 * sj + n_pairs - (2 * sj + n_pairs)
                     % (2 * CAST(n_pairs AS HUGEINT)))
                    // (2 * CAST(n_pairs AS HUGEINT)) AS DOUBLE) / 1e9,
             6) AS bias
FROM g ORDER BY matches
""")
def q192(spark, sf):
    return D.lsh_calibration(T(spark, sf, "documents"), "doc_id",
                             "text", n=3, num_hashes=16, band_size=4)


# ---------------------------------------------------------------- q193
# Flesch-style readability profile (text-analysis family,
# operators/text_analysis.readability_scores): map-only regex counters
# + one fixed double tree; NULL for empty texts.
@q("q193_readability", sql="""
SELECT doc_id,
       CASE WHEN len(trim(text)) > 0
            THEN CAST(len(string_split_regex(trim(text), '\\s+'))
                      AS BIGINT) END AS n_words,
       CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
            AS BIGINT) AS n_sentences,
       CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
            AS BIGINT) AS n_syllables,
       CASE WHEN len(trim(text)) > 0 THEN
         ROUND(206.835
               - 1.015 * (CAST(len(string_split_regex(trim(text),
                                                      '\\s+'))
                               AS DOUBLE)
                          / CAST(GREATEST(len(regexp_extract_all(
                                text, '[.!?]+')), 1) AS DOUBLE))
               - 84.6 * (CAST(len(regexp_extract_all(lower(text),
                                                     '[aeiouy]+'))
                              AS DOUBLE)
                         / CAST(len(string_split_regex(trim(text),
                                                       '\\s+'))
                                AS DOUBLE)),
               6) END AS flesch
FROM documents
""")
def q193(spark, sf):
    return TA.readability_scores(T(spark, sf, "documents"), "doc_id",
                                 "text")


# ---------------------------------------------------------------- q196
# Count-min frequency sketch calibration (sketches family,
# operators/sketches.cms_accuracy_report): the exact top-20 corpus
# tokens vs their CMS point estimates (depth 4 x width 1024) — the
# heavy-hitters accuracy run before trusting the sketch for per-slice
# term frequencies.  Counters are exact md5 functions (generated-
# fragment oracle, the q194/q195 pattern); estimates never
# under-count.
def _q196_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    hx = _hex_int_expr("h", 8)
    w, dep, top = 1024, 4, 20
    return f"""
WITH tok AS (
  SELECT words[i] AS value
  FROM (SELECT string_split(regexp_replace(lower(trim(text)),
                                           '\\s+', ' ', 'g'), ' ')
          AS words FROM documents WHERE text IS NOT NULL),
       UNNEST(generate_series(1, len(words))) AS u(i)
  WHERE words[i] <> ''),
exact AS (
  SELECT value, CAST(COUNT(*) AS BIGINT) AS n_true
  FROM tok GROUP BY value
  ORDER BY n_true DESC, value ASC LIMIT {top}),
seeds AS (SELECT seed FROM UNNEST(generate_series(0, {dep - 1}))
          AS s(seed)),
ch AS (SELECT seed,
              md5('cms' || CAST(seed AS VARCHAR) || '|' || md5(value))
                AS h
       FROM tok, seeds),
counters AS (
  SELECT seed AS row, {hx} % {w} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM ch GROUP BY 1, 2),
ph AS (SELECT value, n_true, seed,
              md5('cms' || CAST(seed AS VARCHAR) || '|' || md5(value))
                AS h
       FROM exact, seeds),
pb AS (SELECT value, n_true, seed AS row, {hx} % {w} AS bucket
       FROM ph),
est AS (
  SELECT value, n_true,
         MIN(COALESCE(c, 0)) AS est
  FROM pb LEFT JOIN counters USING (row, bucket)
  GROUP BY value, n_true)
SELECT value, n_true, CAST(est AS BIGINT) AS est,
       CAST(est - n_true AS BIGINT) AS overestimate
FROM est ORDER BY n_true DESC, value ASC
"""


@q("q196_cms_heavy_hitters", sql=_q196_sql())
def q196(spark, sf):
    from rainforest_spark.operators.sketches import cms_accuracy_report
    d = T(spark, sf, "documents").filter(F.col("text").isNotNull())
    tok = d.select(F.explode(
        F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))),
                                 r"\s+", " "), " ")).alias("tok")) \
        .filter(F.col("tok") != "")
    return cms_accuracy_report(tok, "tok", width=1024, depth=4, top=20)


# ---------------------------------------------------------------- q199
# KMV set-overlap calibration (sketches family,
# operators/sketches.kmv_jaccard): split the corpus into doc_id-parity
# halves, sketch each half's whitespace-token vocabulary with k=256
# minimum hashes, and estimate their Jaccard from the sketches ALONE
# (k smallest of the union, counted against both sketches — Beyer et
# al. 2007), next to the exact intersection/union counts.  The
# corpus-overlap audit ("how much does source B's vocabulary overlap
# A's") without a full token-set join.  Everything is exact integers
# plus two rounded divisions spelled identically in both engines.
@q("q199_kmv_token_overlap", sql="""
WITH toks AS (
  SELECT doc_id % 2 AS half, t.term AS tok
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
ha AS (SELECT DISTINCT md5(tok) AS h FROM toks WHERE half = 0),
hb AS (SELECT DISTINCT md5(tok) AS h FROM toks WHERE half = 1),
ska AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                       FROM ha) WHERE rn <= 256),
skb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                       FROM hb) WHERE rn <= 256),
u AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                     FROM (SELECT h FROM ska UNION
                           SELECT h FROM skb)) WHERE rn <= 256),
nu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union_topk FROM u),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM u
       WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)),
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_inter_exact
       FROM (SELECT tok FROM toks WHERE half = 0
             INTERSECT SELECT tok FROM toks WHERE half = 1)),
eu AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_union_exact
       FROM toks)
SELECT CAST(256 AS BIGINT) AS k, n_union_topk, n_both,
       CASE WHEN n_union_topk > 0 THEN
            ROUND(CAST(n_both AS DOUBLE)
                  / CAST(n_union_topk AS DOUBLE), 6) END AS jaccard,
       n_inter_exact, n_union_exact,
       CASE WHEN n_union_exact > 0 THEN
            ROUND(CAST(n_inter_exact AS DOUBLE)
                  / CAST(n_union_exact AS DOUBLE), 6) END
           AS jaccard_exact
FROM nu, nb, ex, eu
""")
def q199(spark, sf):
    from rainforest_spark.operators.sketches import (
        kmv_jaccard, kmv_sketch,
    )
    d = T(spark, sf, "documents")
    toks = (d.select((F.col("doc_id") % 2).alias("half"),
                     F.explode(TA.tokens("text")).alias("tok"))
            .filter(F.col("tok") != ""))
    a = toks.where(F.col("half") == 0)
    b = toks.where(F.col("half") == 1)
    est = kmv_jaccard(kmv_sketch(a, "tok", None, 256),
                      kmv_sketch(b, "tok", None, 256), 256)
    ta = a.select("tok").distinct()
    tb = b.select("tok").distinct()
    inter = (ta.join(tb, "tok", "semi")
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("n_inter_exact")))
    union = (ta.unionByName(tb).distinct()
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("n_union_exact")))
    out = est.crossJoin(inter).crossJoin(union)   # 1-row aggregates
    je = F.when(F.col("n_union_exact") > 0,
                F.round(F.col("n_inter_exact").cast("double")
                        / F.col("n_union_exact").cast("double"), 6))
    return out.select("k", "n_union_topk", "n_both", "jaccard",
                      "n_inter_exact", "n_union_exact",
                      je.alias("jaccard_exact"))


# ---------------------------------------------------------------- q200
# Pairwise source-overlap matrix from per-source KMV sketches
# (sketches family, operators/sketches.kmv_overlap_matrix): every
# unordered source pair's token-vocabulary Jaccard estimated from the
# bottom-128 sketches ALONE — the sketch-scaled counterpart of q119's
# exact contamination matrix (no raw-corpus pass per pair; only
# S·k sketch rows are touched) — now also carrying the per-pair
# DECISION columns (round 10): side-exclusive sample counts, the
# (K−1)/U_K union estimate (48-bit hash fraction, q198 idiom) and
# ``adds_est`` = estimated |gb∖ga| (Beyer et al. 2007).  Exact
# strings/integers plus rounded divisions/products identical in both
# engines.
def _q200_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    u48 = _hex_int_expr("hk", 12)
    return f"""
WITH toks AS (
  SELECT source, t.term AS tok
  FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
h AS (SELECT DISTINCT source, md5(tok) AS h FROM toks),
sk AS (SELECT source, h
       FROM (SELECT source, h,
                    ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY h) AS rn
             FROM h) WHERE rn <= 128),
g AS (SELECT DISTINCT source FROM sk),
p AS (SELECT g1.source AS ga, g2.source AS gb
      FROM g g1 JOIN g g2 ON g1.source < g2.source),
r AS (SELECT ga, gb, sk.h, 0 AS isb
      FROM sk JOIN p ON sk.source = p.ga
      UNION ALL
      SELECT ga, gb, sk.h, 1 AS isb
      FROM sk JOIN p ON sk.source = p.gb),
c AS (SELECT ga, gb, h, CAST(COUNT(*) AS BIGINT) AS nsides,
             MAX(isb) AS hasb
      FROM r GROUP BY 1, 2, 3),
t AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY ga, gb
                                   ORDER BY h) AS rn FROM c),
a AS (SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n_union_topk,
             MAX(h) AS hk,
             CAST(SUM(CASE WHEN nsides = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_both,
             CAST(SUM(CASE WHEN nsides = 1 AND hasb = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
             CAST(SUM(CASE WHEN nsides = 1 AND hasb = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only
      FROM t WHERE rn <= 128 GROUP BY 1, 2),
e AS (SELECT *,
             CASE WHEN n_union_topk < 128 THEN
                       CAST(n_union_topk AS DOUBLE)
                  WHEN {u48} > 0 THEN
                       ROUND(CAST(127 AS DOUBLE)
                             / (CAST({u48} AS DOUBLE)
                                / CAST(281474976710656 AS DOUBLE)), 6)
             END AS union_est
      FROM a)
SELECT ga, gb, n_union_topk, n_both, n_a_only, n_b_only,
       CASE WHEN n_union_topk > 0 THEN
            ROUND(CAST(n_both AS DOUBLE)
                  / CAST(n_union_topk AS DOUBLE), 6) END AS jaccard,
       union_est,
       CASE WHEN n_union_topk < 128 THEN CAST(n_b_only AS DOUBLE)
            WHEN n_union_topk > 0 THEN
                 ROUND(CAST(n_b_only AS DOUBLE)
                       / CAST(n_union_topk AS DOUBLE)
                       * union_est, 6)
       END AS adds_est
FROM e
"""


@q("q200_kmv_overlap_matrix", sql=_q200_sql())
def q200(spark, sf):
    from rainforest_spark.operators.sketches import (
        kmv_overlap_matrix, kmv_sketch,
    )
    d = T(spark, sf, "documents")
    toks = (d.select("source",
                     F.explode(TA.tokens("text")).alias("tok"))
            .filter(F.col("tok") != ""))
    sk = kmv_sketch(toks, "tok", ["source"], 128)
    return kmv_overlap_matrix(sk, "source", 128)


def _q201_toks_sql() -> str:
    return """
toks AS (
  SELECT doc_id % 2 AS half, t.term AS tok
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
        FROM documents),
       UNNEST(w) AS t(term)
  WHERE t.term != ''),
ha AS (SELECT DISTINCT md5(tok) AS h FROM toks WHERE half = 0),
hb AS (SELECT DISTINCT md5(tok) AS h FROM toks WHERE half = 1),
ska AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                       FROM ha) WHERE rn <= 256),
skb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                       FROM hb) WHERE rn <= 256),
u AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
                     FROM (SELECT h FROM ska UNION
                           SELECT h FROM skb)) WHERE rn <= 256)"""


# ---------------------------------------------------------------- q201
# KMV set-DIFFERENCE calibration (sketches family,
# operators/sketches.kmv_difference): "how many NEW distinct tokens
# does corpus half B add to half A" — estimated from the two
# bottom-256 sketches ALONE (union bottom-K as a uniform distinct
# sample, exact per-hash membership, (K−1)/U_K union estimate — Beyer
# et al. 2007) NEXT TO the exact anti-join distinct count the sketch
# replaces, with the signed relative error.  The ingest-decision
# report: the exact side is one full token-set anti-join; the sketch
# side never re-reads raw data.  Exact integers + the q198 48-bit
# hash-fraction idiom; the signed ratio carries the +0.0
# negative-zero normalization.
def _q201_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    u48 = _hex_int_expr("hk", 12)
    return f"""
WITH {_q201_toks_sql()},
m AS (SELECT u.h,
             CASE WHEN u.h IN (SELECT h FROM ska) THEN 1 ELSE 0 END
                 AS ina,
             CASE WHEN u.h IN (SELECT h FROM skb) THEN 1 ELSE 0 END
                 AS inb
      FROM u),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union_topk,
             MAX(h) AS hk,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 1
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
             CAST(SUM(CASE WHEN ina = 1 AND inb = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
             CAST(SUM(CASE WHEN ina = 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only
      FROM m),
e AS (SELECT *,
             CASE WHEN n_union_topk < 256 THEN
                       CAST(n_union_topk AS DOUBLE)
                  WHEN {u48} > 0 THEN
                       ROUND(CAST(255 AS DOUBLE)
                             / (CAST({u48} AS DOUBLE)
                                / CAST(281474976710656 AS DOUBLE)), 6)
             END AS union_est
      FROM a),
d AS (SELECT *,
             CASE WHEN n_union_topk < 256 THEN
                       CAST(n_b_only AS DOUBLE)
                  WHEN n_union_topk > 0 THEN
                       ROUND(CAST(n_b_only AS DOUBLE)
                             / CAST(n_union_topk AS DOUBLE)
                             * union_est, 6)
             END AS added_est,
             CASE WHEN n_union_topk > 0 THEN
                  ROUND(CAST(n_b_only AS DOUBLE)
                        / CAST(n_union_topk AS DOUBLE), 6)
             END AS novelty_rate
      FROM e),
x AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_added_exact
      FROM (SELECT DISTINCT tok FROM toks WHERE half = 1
            EXCEPT SELECT DISTINCT tok FROM toks WHERE half = 0))
SELECT CAST(256 AS BIGINT) AS k, n_union_topk, n_both, n_a_only,
       n_b_only, union_est, added_est, novelty_rate, n_added_exact,
       CASE WHEN n_added_exact > 0 THEN
            ROUND((added_est - CAST(n_added_exact AS DOUBLE))
                  / CAST(n_added_exact AS DOUBLE), 6)
              + CAST(0 AS DOUBLE)
       END AS rel_error
FROM d, x
"""


@q("q201_kmv_added_vocab", sql=_q201_sql())
def q201(spark, sf):
    from rainforest_spark.operators.sketches import (
        kmv_difference, kmv_sketch,
    )
    d = T(spark, sf, "documents")
    toks = (d.select((F.col("doc_id") % 2).alias("half"),
                     F.explode(TA.tokens("text")).alias("tok"))
            .filter(F.col("tok") != ""))
    a = toks.where(F.col("half") == 0)
    b = toks.where(F.col("half") == 1)
    # two per-side passes, NOT one grouped pass: the fused grouped
    # sketch was measured SLOWER at every tier (PERF.md round 10 —
    # the kernel is Python-bound locally, so saving the second scan
    # buys nothing while the per-batch groupby split costs real time)
    est = kmv_difference(kmv_sketch(a, "tok", None, 256),
                         kmv_sketch(b, "tok", None, 256), 256)
    exact = (b.select("tok").distinct()
             .join(a.select("tok").distinct(), "tok", "anti")
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("n_added_exact")))
    out = est.crossJoin(exact)   # 1-row aggregates
    rel = F.when(
        F.col("n_added_exact") > 0,
        F.round((F.col("added_est")
                 - F.col("n_added_exact").cast("double"))
                / F.col("n_added_exact").cast("double"), 6)
        + F.lit(0.0))
    return out.select("k", "n_union_topk", "n_both", "n_a_only",
                      "n_b_only", "union_est", "added_est",
                      "novelty_rate", "n_added_exact",
                      rel.alias("rel_error"))


# ---------------------------------------------------------------- q202
# Weighted-KMV added-VOLUME calibration (sketches family,
# operators/sketches.kmv_added_weight over kmv_sketch_weighted): "how
# many token OCCURRENCES does corpus half B add" — the ingest-volume
# half of q201 — estimated from A's plain sketch and B's WEIGHTED
# bottom-256 (each sampled B-only token carries its exact BIGINT
# occurrence count, provably present in B's sketch), scaled by the
# union estimate (Beyer et al. 2007 multiset synopsis), NEXT TO the
# exact anti-join occurrence sum.  Exact integers + the q198 idioms.
def _q202_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    u48 = _hex_int_expr("hk", 12)
    return f"""
WITH {_q201_toks_sql()},
wb AS (SELECT md5(tok) AS h, CAST(COUNT(*) AS BIGINT) AS w
       FROM toks WHERE half = 1 GROUP BY 1),
m AS (SELECT u.h,
             CASE WHEN u.h IN (SELECT h FROM ska) THEN 1 ELSE 0 END
                 AS ina,
             (SELECT w FROM wb WHERE wb.h = u.h) AS w
      FROM u),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union_topk,
             MAX(h) AS hk,
             CAST(SUM(CASE WHEN ina = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_b_only,
             CAST(SUM(CASE WHEN ina = 0 THEN w ELSE 0 END) AS BIGINT)
                 AS w_b_only
      FROM m),
e AS (SELECT *,
             CASE WHEN n_union_topk < 256 THEN
                       CAST(n_union_topk AS DOUBLE)
                  WHEN {u48} > 0 THEN
                       ROUND(CAST(255 AS DOUBLE)
                             / (CAST({u48} AS DOUBLE)
                                / CAST(281474976710656 AS DOUBLE)), 6)
             END AS union_est
      FROM a),
d AS (SELECT *,
             CASE WHEN n_union_topk < 256 THEN
                       CAST(w_b_only AS DOUBLE)
                  WHEN n_union_topk > 0 THEN
                       ROUND(CAST(w_b_only AS DOUBLE)
                             / CAST(n_union_topk AS DOUBLE)
                             * union_est, 6)
             END AS added_w_est
      FROM e),
x AS (SELECT CAST(COUNT(*) AS BIGINT) AS w_added_exact
      FROM toks WHERE half = 1
        AND tok NOT IN (SELECT DISTINCT tok FROM toks WHERE half = 0))
SELECT CAST(256 AS BIGINT) AS k, n_union_topk, n_b_only, w_b_only,
       union_est, added_w_est, w_added_exact,
       CASE WHEN w_added_exact > 0 THEN
            ROUND((added_w_est - CAST(w_added_exact AS DOUBLE))
                  / CAST(w_added_exact AS DOUBLE), 6)
              + CAST(0 AS DOUBLE)
       END AS rel_error
FROM d, x
"""


@q("q202_kmv_weighted_volume", sql=_q202_sql())
def q202(spark, sf):
    from rainforest_spark.operators.sketches import (
        kmv_added_weight, kmv_sketch, kmv_sketch_weighted,
    )
    d = T(spark, sf, "documents")
    toks = (d.select((F.col("doc_id") % 2).alias("half"),
                     F.explode(TA.tokens("text")).alias("tok"))
            .filter(F.col("tok") != ""))
    a = toks.where(F.col("half") == 0)
    b = toks.where(F.col("half") == 1)
    est = kmv_added_weight(kmv_sketch(a, "tok", None, 256),
                           kmv_sketch_weighted(b, "tok", None, 256),
                           256)
    exact = (b.join(a.select("tok").distinct(), "tok", "anti")
             .agg(F.count(F.lit(1)).cast("long")
                  .alias("w_added_exact")))
    out = est.crossJoin(exact)   # 1-row aggregates
    rel = F.when(
        F.col("w_added_exact") > 0,
        F.round((F.col("added_w_est")
                 - F.col("w_added_exact").cast("double"))
                / F.col("w_added_exact").cast("double"), 6)
        + F.lit(0.0))
    return out.select("k", "n_union_topk", "n_b_only", "w_b_only",
                      "union_est", "added_w_est", "w_added_exact",
                      rel.alias("rel_error"))


# ---------------------------------------------------------------- q206
# Grouped KMV novelty report (sketches family,
# operators/sketches.kmv_novelty_report): for EVERY source, "what
# does it add to the union of all the others" — exclusive distinct
# token-trigrams AND their occurrence volume — from the per-source
# weighted bottom-256 sketches ALONE, in ONE pass over the S·k
# sketch rows (no rest-sketch per source, no raw-corpus pass).  The
# S-source generalization of q201's pairwise difference, composing
# the kmv_added_weight volume column; the ingest-ordering decision
# report.  Trigrams (not unigrams: the fixture vocabulary is 31
# words, all shared — zero signal) give per-source exclusives in the
# hundreds.  Exact strings/integers + the q198 48-bit hash-fraction
# idiom; rounded divisions/products spelled identically both engines.
def _q206_sql() -> str:
    from rainforest_spark.operators.sketches import _hex_int_expr
    u48 = _hex_int_expr("hk", 12)
    return f"""
WITH arr AS (
  SELECT source,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ',
                                     'g'), ' ') AS w
  FROM documents),
tri AS (
  SELECT source, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM arr, UNNEST(CASE WHEN len(w) >= 3
                        THEN generate_series(1, len(w) - 2)
                        ELSE [] END) AS u(i)),
hw AS (SELECT source, md5(g) AS h, CAST(COUNT(*) AS BIGINT) AS wt
       FROM tri GROUP BY 1, 2),
sk AS (SELECT source, h, wt
       FROM (SELECT source, h, wt,
                    ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY h) AS rn
             FROM hw) WHERE rn <= 256),
u AS (SELECT h FROM (SELECT DISTINCT h FROM sk)
      ORDER BY h LIMIT 256),
gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_union_topk,
                MAX(h) AS hk FROM u),
m AS (SELECT sk.source, sk.h, sk.wt FROM u JOIN sk USING (h)),
cn AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS ng FROM m GROUP BY 1),
per AS (SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_in_union,
               CAST(SUM(CASE WHEN ng = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_only,
               CAST(SUM(CASE WHEN ng = 1 THEN m.wt ELSE 0 END)
                    AS BIGINT) AS w_only
        FROM m JOIN cn USING (h) GROUP BY 1),
gd AS (SELECT DISTINCT source FROM sk),
j AS (SELECT gd.source,
             COALESCE(n_in_union, 0) AS n_in_union,
             COALESCE(n_only, 0) AS n_only,
             COALESCE(w_only, 0) AS w_only,
             n_union_topk, hk
      FROM gd LEFT JOIN per USING (source), gtot),
e AS (SELECT *,
             CASE WHEN n_union_topk < 256 THEN
                       CAST(n_union_topk AS DOUBLE)
                  WHEN {u48} > 0 THEN
                       ROUND(CAST(255 AS DOUBLE)
                             / (CAST({u48} AS DOUBLE)
                                / CAST(281474976710656 AS DOUBLE)), 6)
             END AS union_est
      FROM j)
SELECT source, CAST(256 AS BIGINT) AS k, n_union_topk, n_in_union,
       n_only, w_only, union_est,
       CASE WHEN n_union_topk < 256 THEN CAST(n_only AS DOUBLE)
            WHEN n_union_topk > 0 THEN
                 ROUND(CAST(n_only AS DOUBLE)
                       / CAST(n_union_topk AS DOUBLE)
                       * union_est, 6) END AS adds_est,
       CASE WHEN n_union_topk < 256 THEN CAST(w_only AS DOUBLE)
            WHEN n_union_topk > 0 THEN
                 ROUND(CAST(w_only AS DOUBLE)
                       / CAST(n_union_topk AS DOUBLE)
                       * union_est, 6) END AS added_w_est,
       CASE WHEN n_union_topk > 0 THEN
            ROUND(CAST(n_only AS DOUBLE)
                  / CAST(n_union_topk AS DOUBLE), 6) END
           AS novelty_rate
FROM e
"""


@q("q206_kmv_novelty_report", sql=_q206_sql())
def q206(spark, sf):
    from rainforest_spark.operators.sketches import (
        kmv_novelty_report, kmv_sketch_weighted,
    )
    d = T(spark, sf, "documents")
    # stage the words array BEFORE the shingle transform (the
    # shingle_table rule: split() referenced inside the lambda
    # re-evaluates per element — measured 10.6 s vs ~2 s at sf0.1);
    # NO distinct — the sketch weights are occurrence counts
    words = F.split(TA.normalized_text("text"), " ")
    staged = d.select("source", words.alias("__words"))
    w = F.col("__words")
    idx = F.sequence(F.lit(0), F.size(w) - 3)
    mk = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1)
                                          for k in range(3)]))
    shingles = F.when(F.size(w) >= 3, mk) \
        .otherwise(F.array().cast("array<string>"))
    tri = staged.select("source", F.explode(shingles).alias("g"))
    sk = kmv_sketch_weighted(tri, "g", ["source"], 256)
    return kmv_novelty_report(sk, "source", 256)
