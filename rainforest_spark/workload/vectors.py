"""Embedding similarity workload on the embeddings table."""

from __future__ import annotations

from pyspark.sql import functions as F

from rainforest_spark.operators import similarity as SIM
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


# ---------------------------------------------------------------- q50
# Brute-force cosine top-3 for the first 20 vectors.  Both engines
# compute dot/(|a|·|b|) in double with a sequential fold; similarity is
# rounded to 6dp BEFORE ranking so ordering ties break on neighbor_id.
@q("q50_cosine_topk", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM v WHERE vec_id < 20),
pairs AS (
  SELECT q.query_id, t.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.qv, t.v) / (q.qn * t.nrm), 6) AS sim
  FROM q, v t WHERE t.vec_id != q.query_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, sim
FROM ranked WHERE rnk <= 3
""")
def q50(spark, sf):
    e = T(spark, sf, "embeddings")
    return SIM.cosine_topk(e, "vec_id", "embedding",
                           query_ids_pred=F.col("vec_id") < 20, k=3)


# ---------------------------------------------------------------- q51
# Label-centroid classification: per-label mean embedding, assign every
# vector to the nearest centroid by cosine (rounded before ranking).
@q("q51_centroid_classify", sql="""
WITH expl AS (
  SELECT label, u.i AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(i)),
cent AS (
  SELECT label AS c_label, pos, AVG(x) AS cx
  FROM expl GROUP BY label, pos),
cvec AS (
  SELECT c_label, list(cx ORDER BY pos) AS cv FROM cent GROUP BY c_label),
cn AS (SELECT c_label, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM cvec),
v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                   CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings),
scored AS (
  SELECT v.vec_id, v.label, cn.c_label,
         ROUND(list_dot_product(v.v, cn.cv) / (v.nrm * cn.cnrm), 6) AS sim
  FROM v, cn),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, c_label) AS rn
  FROM scored)
SELECT vec_id, label, c_label AS pred_label FROM ranked WHERE rn = 1
""")
def q51(spark, sf):
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    e = SIM.with_double_vec(T(spark, sf, "embeddings"), "embedding", "v")
    expl = e.select("label", F.posexplode("v").alias("pos", "x"))
    cent = expl.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    cvec = (cent.groupBy(F.col("label").alias("c_label"))
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"]).alias("cv")))
    cn = cvec.withColumn(
        "cnrm", F.sqrt(F.expr(
            "aggregate(cv, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)")))
    v = e.select("vec_id", "label", "v",
                 F.sqrt(F.expr(
                     "aggregate(v, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"
                 )).alias("nrm"))
    scored = v.crossJoin(broadcast(cn)).withColumn(
        "sim", F.round(
            F.expr("aggregate(zip_with(v, cv, (x, y) -> x * y), "
                   "CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
            / (F.col("nrm") * F.col("cnrm")), 6))
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "c_label")
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "label", F.col("c_label").alias("pred_label")))


# ---------------------------------------------------------------- q77
# int8-quantized cosine top-3: per-vector symmetric quantization
# (scale = max|x|/127, floor(x/scale + 0.5)), then cosine over the
# CODES — the scales cancel, so every dot/norm² is exact integer math
# (|dot| <= 64·127² ≪ 2⁵³) and the single rounding point is the final
# division.  The 100 TB path: 4× less data shuffled/held per candidate
# stage.  Engine-portable by construction — both sides spell the same
# floor-based rounding and the same expression tree.
@q("q77_quantized_cosine_topk", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
         CASE WHEN m > 0 THEN m / 127.0 ELSE 1.0 END AS sc
  FROM (SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) AS m FROM v)),
qz AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x / sc + 0.5) AS BIGINT)) AS qv
  FROM s),
n AS (
  SELECT vec_id, qv,
         CAST(list_dot_product(qv, qv) AS DOUBLE) AS n2 FROM qz),
pairs AS (
  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
         ROUND(CAST(list_dot_product(q.qv, t.qv) AS DOUBLE)
               / (sqrt(q.n2) * sqrt(t.n2)), 6) AS sim
  FROM n q JOIN n t ON t.vec_id != q.vec_id
  WHERE q.vec_id < 20),
r AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs)
SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, sim
FROM r WHERE rnk <= 3
""")
def q77(spark, sf):
    return SIM.cosine_topk_quantized(T(spark, sf, "embeddings"),
                                     "vec_id", "embedding",
                                     F.col("vec_id") < 20, k=3)


# ---------------------------------------------------------------- q85
# Johnson-Lindenstrauss ±1 projection (64 -> 4 dims): the
# dimension-reduction front end for 100 TB embedding stores (project
# before LSH/IVF so shuffles move ~10x fewer bytes).  The sign matrix
# is md5-derived at plan time, so the oracle rebuilds the IDENTICAL
# left-associated double chain — bit-exact, no tolerance.
def _jl_oracle_sql() -> str:
    signs = SIM.jl_signs(64, 4, salt="jl-v1")
    outs = []
    for j, row in enumerate(signs):
        terms = " + ".join(
            f"({s:+.1f}) * CAST(embedding[{i + 1}] AS DOUBLE)"
            for i, s in enumerate(row))
        outs.append(f"ROUND(({terms}) * 0.5, 6) AS jl_{j}")
    return ("SELECT vec_id, " + ", ".join(outs)
            + " FROM embeddings")


@q("q85_jl_projection", sql=_jl_oracle_sql())
def q85(spark, sf):
    e = T(spark, sf, "embeddings").select("vec_id", "embedding")
    p = SIM.jl_project(e, "embedding", in_dim=64, out_dim=4,
                       salt="jl-v1")
    return p.select("vec_id",
                    *[F.round(F.col(f"jl_{j}"), 6).alias(f"jl_{j}")
                      for j in range(4)])


# ---------------------------------------------------------------- q87
# Semantic (embedding) dedup — SemDeDup shape: q54's frozen-plane LSH
# edges at cosine >= 0.35, connected components (min-label), canonical
# keep flag, singletons covered.  The oracle replays the identical
# plane literals and closes the graph with a recursive CTE (the q68
# pattern on the embedding edge set).
def _q87_oracle_sql() -> str:
    from rainforest_spark.workload.extended import (
        _ND_P, _ND_TABLES, _nd_bucket_sql,
    )
    buckets = ",".join(f"({_nd_bucket_sql(t)}) AS b{t}"
                       for t in range(_ND_TABLES))
    cand = "\nUNION\n".join(
        f"SELECT a.vec_id AS id_a, c.vec_id AS id_b "
        f"FROM b a JOIN b c ON a.b{t} = c.b{t} AND a.vec_id < c.vec_id"
        for t in range(_ND_TABLES))
    return f"""
WITH RECURSIVE
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
b AS (SELECT vec_id, v, nrm, {buckets} FROM v),
cand AS ({cand}),
edges AS (
  SELECT c.id_a, c.id_b FROM cand c
  JOIN v va ON va.vec_id = c.id_a
  JOIN v vb ON vb.vec_id = c.id_b
  WHERE ROUND(list_dot_product(va.v, vb.v) / (va.nrm * vb.nrm), 6)
        >= 0.35),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM edges
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM edges),
reach(src, dst) AS (
  SELECT src, dst FROM sym
  UNION
  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
lab AS (
  SELECT src AS vec_id, LEAST(src, MIN(dst)) AS cluster_id
  FROM reach GROUP BY src)
SELECT e.vec_id,
       COALESCE(lab.cluster_id, e.vec_id) AS cluster_id,
       (e.vec_id = COALESCE(lab.cluster_id, e.vec_id)) AS keep
FROM embeddings e LEFT JOIN lab ON lab.vec_id = e.vec_id
"""


@q("q87_embedding_dedup", sql=_q87_oracle_sql())
def q87(spark, sf):
    from rainforest_spark.operators.similarity import embedding_dedup
    from rainforest_spark.workload.extended import _ND_P

    return embedding_dedup(T(spark, sf, "embeddings"),
                           "vec_id", "embedding", planes=_ND_P,
                           threshold=0.35)


# ---------------------------------------------------------------- q90
# Hard-negative mining for contrastive training: per anchor (first 20
# vectors), the top-3 most similar corpus vectors inside the
# [0.2, 0.8) similarity band — informative negatives below the
# near-dup zone.  The band cut is on the 6dp-rounded similarity, so
# both engines cut identically.
@q("q90_hard_negatives", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS anchor_id, v AS qv, nrm AS qn
      FROM v WHERE vec_id < 20),
pairs AS (
  SELECT q.anchor_id, t.vec_id AS negative_id,
         ROUND(list_dot_product(q.qv, t.v) / (q.qn * t.nrm), 6) AS sim
  FROM q, v t WHERE t.vec_id != q.anchor_id),
banded AS (SELECT * FROM pairs WHERE sim >= 0.2 AND sim < 0.8),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY sim DESC, negative_id) AS rnk
  FROM banded)
SELECT anchor_id, CAST(rnk AS BIGINT) AS rnk, negative_id, sim
FROM ranked WHERE rnk <= 3
""")
def q90(spark, sf):
    e = T(spark, sf, "embeddings")
    return SIM.hard_negatives(e, "vec_id", "embedding",
                              query_ids_pred=F.col("vec_id") < 20,
                              k=3, band=(0.2, 0.8))


# ---------------------------------------------------------------- q93
# Embedding-space benchmark decontamination: training vectors within
# 0.3 cosine of ANY eval vector (eval = vec_id % 20 == 0), with the
# nearest eval neighbour.  The semantic complement of q80's verbatim
# n-gram overlap — catches paraphrased leakage.  Eval side broadcast;
# per-train nearest via (sim DESC, eval_id) row_number, rounded BEFORE
# the threshold so the cut is engine-exact.
@q("q93_semantic_decontamination", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
e AS (SELECT vec_id AS eval_id, v AS ev, nrm AS en
      FROM v WHERE vec_id % 20 = 0),
t AS (SELECT vec_id AS train_id, v AS tv, nrm AS tn
      FROM v WHERE vec_id % 20 != 0),
p AS (
  SELECT train_id, eval_id,
         ROUND(list_dot_product(tv, ev) / (tn * en), 6) AS sim
  FROM t, e),
r AS (
  SELECT *, row_number() OVER (PARTITION BY train_id
                               ORDER BY sim DESC, eval_id) AS rnk
  FROM p)
SELECT train_id, eval_id, sim FROM r WHERE rnk = 1 AND sim >= 0.3
""")
def q93(spark, sf):
    e = T(spark, sf, "embeddings")
    return SIM.semantic_contamination(
        e.filter(F.col("vec_id") % 20 != 0),
        e.filter(F.col("vec_id") % 20 == 0),
        "vec_id", "embedding", threshold=0.3)


# ---------------------------------------------------------------- q104
# Margin-based embedding alignment (bitext-mining style): even vec_ids
# query the odd side; top-1 cosine with ratio margin sim/mean(top-4).
# Similarity rounds BEFORE ranking (ties on neighbor id); the margin
# rounds after the one division; no threshold is applied in-engine.
@q("q104_margin_alignment", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
      FROM v WHERE vec_id % 2 = 0),
c AS (SELECT vec_id AS neighbor_id, v AS tv, nrm AS tn
      FROM v WHERE vec_id % 2 = 1),
pairs AS (
  SELECT q.query_id, c.neighbor_id,
         ROUND(list_dot_product(q.qv, c.tv) / (q.qn * c.tn), 6) AS sim
  FROM q, c),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id) AS rnk
  FROM pairs),
top AS (SELECT * FROM ranked WHERE rnk <= 4)
SELECT query_id,
       arg_min(neighbor_id, rnk) AS match_id,
       arg_min(sim, rnk) AS sim,
       ROUND(arg_min(sim, rnk) / AVG(sim), 6) AS margin
FROM top GROUP BY query_id
""")
def q104(spark, sf):
    e = T(spark, sf, "embeddings")
    return SIM.margin_alignment(e, "vec_id", "embedding",
                                left_pred=F.col("vec_id") % 2 == 0,
                                right_pred=F.col("vec_id") % 2 == 1,
                                k_margin=4)


# ---------------------------------------------------------------- q107
# Fixed-iteration spherical k-means (k=8, 2 assignment rounds, seeds =
# the 8 lowest vec_ids): the corpus topic-clustering pass.  Assignment
# follows the proven q51 policy (cosine rounded to 6dp BEFORE argmax,
# ties on the lowest cluster index); centroid update is the per-
# dimension mean from floor(x*1e9 + 0.5) integer-nanos BIGINT sums
# (order-free partial aggregation, IEEE-identical on both engines,
# no BigDecimal — see kmeans_clusters docstring).
@q("q107_kmeans_clusters", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)),
cn0 AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c0),
s1 AS (
  SELECT v.vec_id, cn0.cid,
         ROUND(list_dot_product(v.v, cn0.cv) / (v.nrm * cn0.cnrm), 6)
           AS sim
  FROM v, cn0),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, cid) AS rn
    FROM s1) WHERE rn = 1),
e1 AS (
  SELECT a1.cid, u.i AS pos,
         CAST(SUM(CAST(FLOOR(v.v[u.i] * 1000000000.0 + 0.5)
                       AS BIGINT)) AS DOUBLE)
           / 1000000000.0 / COUNT(*) AS cx
  FROM a1 JOIN v USING (vec_id),
       UNNEST(generate_series(1, len(v.v))) AS u(i)
  GROUP BY 1, 2),
c1 AS (SELECT cid, list(cx ORDER BY pos) AS cv FROM e1 GROUP BY cid),
cn1 AS (SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cnrm FROM c1),
s2 AS (
  SELECT v.vec_id, cn1.cid,
         ROUND(list_dot_product(v.v, cn1.cv) / (v.nrm * cn1.cnrm), 6)
           AS sim
  FROM v, cn1)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, cid) AS rn
  FROM s2) WHERE rn = 1
""")
def q107(spark, sf):
    e = T(spark, sf, "embeddings")
    return SIM.kmeans_clusters(e, "vec_id", "embedding", k=8, n_iter=2)


# ---------------------------------------------------------------- q122
# Per-label embedding cohesion: centroid from floor(x*1e9 + 0.5)
# integer-nanos BIGINT sums (no per-element BigDecimal); per-row
# cosine as one sequential fold; mean via the sign-safe shifted
# floor-nanos integer round; min over 6dp doubles.
@q("q122_label_cohesion", sql="""
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings),
comp AS (
  SELECT label, pos,
         CAST(FLOOR(v[pos] * 1000000000.0 + 0.5) AS BIGINT) AS x9
  FROM v, UNNEST(generate_series(1, len(v))) AS t(pos)),
sums AS (
  SELECT label, pos, SUM(x9) AS s, COUNT(*) AS n
  FROM comp GROUP BY 1, 2),
cent AS (
  SELECT label,
         list(CAST(s AS DOUBLE) / 1000000000.0 / n ORDER BY pos) AS c
  FROM sums GROUP BY 1),
scored AS (
  SELECT v.label,
         list_dot_product(v.v, c.c)
           / (sqrt(list_dot_product(v.v, v.v))
              * sqrt(list_dot_product(c.c, c.c))) AS cos
  FROM v JOIN cent c USING (label)),
agg AS (
  SELECT label, COUNT(*) AS n,
         SUM(CAST(FLOOR((cos + CAST(1.0 AS DOUBLE)) * 1000000000.0
                        + 0.5) AS BIGINT)) AS s9,
         MIN(ROUND(cos, 6)) AS min_cos
  FROM scored GROUP BY 1)
SELECT label, CAST(n AS BIGINT) AS n,
       CAST((2 * s9 + 1000 * n) // (2000 * n) AS DOUBLE) / 1000000.0
         - 1.0 AS mean_cos,
       min_cos
FROM agg
""")
def q122(spark, sf):
    e = T(spark, sf, "embeddings")
    out = SIM.label_cohesion(e, "vec_id", "embedding", "label")
    return out.select("label", F.col("n").cast("long").alias("n"),
                      "mean_cos", "min_cos")


# ---------------------------------------------------------------- q133
# Hybrid retrieval: reciprocal-rank fusion of BM25 (q127 machinery,
# lexical) and brute-force cosine (q50 machinery, dense) top-10 lists
# for queries 0/1/2 (text query i paired with query vector i).  Every
# contribution is 1/(60+rank) — one double division of integers, both
# literals CAST to DOUBLE so DuckDB cannot route them through its
# exact-DECIMAL type — and the fused score is a fixed two-term sum,
# not an aggregation, so there is no partial-agg order to perturb.
# Fused ties rank on doc_id ascending.
@q("q133_hybrid_rrf", sql="""
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
bm AS (
  SELECT query_id, doc_id, rnk FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rnk
    FROM sc) WHERE rnk <= 10),
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings),
qv AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
       FROM v WHERE vec_id < 3),
cpairs AS (
  SELECT qv.query_id, t.vec_id AS neighbor_id,
         ROUND(list_dot_product(qv.qv, t.v) / (qv.qn * t.nrm), 6)
           AS sim
  FROM qv, v t WHERE t.vec_id != qv.query_id),
cr AS (
  SELECT query_id, neighbor_id, rnk FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id) AS rnk
    FROM cpairs) WHERE rnk <= 10),
f AS (
  SELECT COALESCE(bm.query_id, cr.query_id) AS query_id,
         COALESCE(bm.doc_id, cr.neighbor_id) AS doc_id,
         COALESCE(CAST(1.0 AS DOUBLE)
                  / (CAST(60.0 AS DOUBLE) + bm.rnk),
                  CAST(0.0 AS DOUBLE))
         + COALESCE(CAST(1.0 AS DOUBLE)
                    / (CAST(60.0 AS DOUBLE) + cr.rnk),
                    CAST(0.0 AS DOUBLE)) AS rrf_score
  FROM bm FULL OUTER JOIN cr
    ON bm.query_id = cr.query_id AND bm.doc_id = cr.neighbor_id)
SELECT query_id, CAST(fused_rnk AS BIGINT) AS fused_rnk, doc_id,
       rrf_score
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id)
        AS fused_rnk FROM f)
WHERE fused_rnk <= 10
""")
def q133(spark, sf):
    from rainforest_spark.operators import text_analysis as TA
    bm = TA.bm25_topk(
        T(spark, sf, "documents"), "doc_id", "text",
        [(0, "spark window join"), (1, "hash table scan"),
         (2, "customer stream value")], k=10)
    cos = SIM.cosine_topk(T(spark, sf, "embeddings"), "vec_id",
                          "embedding",
                          query_ids_pred=F.col("vec_id") < 3, k=10)
    return SIM.rrf_fusion(
        [bm.select("query_id", F.col("doc_id"), "rnk"),
         cos.select("query_id", F.col("neighbor_id").alias("doc_id"),
                    "rnk")],
        query_col="query_id", item_col="doc_id", rank_col="rnk",
        k_const=60, k=10)


# ---------------------------------------------------------------- q191
# Embedding-dimension covariance/correlation audit (similarity family,
# operators/similarity.embedding_covariance): upper-triangle sample
# covariance + correlation over the 64 dims.  In-expression pair
# terms (no self-join on the Spark side), one d(d+1)/2-key groupBy,
# nano-quantized exact sums, fixed IEEE double trees — no rounding
# step needed.  The oracle spells the same reduction with DuckDB's
# UNNEST WITH ORDINALITY + a vec_id self-join (its in-SQL equivalent).
@q("q191_embedding_covariance", sql="""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (
  SELECT vec_id, v[pos] AS xd, CAST(pos AS BIGINT) - 1 AS i
  FROM v, UNNEST(generate_series(1, len(v))) AS t(pos)),
p AS (
  SELECT a.i AS i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(FLOOR(a.xd * b.xd * 1e9 + 0.5) AS HUGEINT)) AS sp
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2),
s AS (
  SELECT i, SUM(CAST(FLOOR(xd * 1e9 + 0.5) AS HUGEINT)) AS sx
  FROM e GROUP BY i),
c AS (
  SELECT p.i, p.j, p.n,
         CASE WHEN p.n > 1 THEN
           (CAST(sp AS DOUBLE) / 1e9
            - (CAST(si.sx AS DOUBLE) / 1e9)
              * (CAST(sj.sx AS DOUBLE) / 1e9) / CAST(p.n AS DOUBLE))
           / (CAST(p.n AS DOUBLE) - CAST(1 AS DOUBLE)) END AS cov
  FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j),
d AS (SELECT i AS dk, cov AS var FROM c WHERE i = j)
SELECT c.i, c.j, c.n, c.cov,
       CASE WHEN vi.var > 0 AND vj.var > 0
            THEN c.cov / SQRT(vi.var * vj.var) END AS corr
FROM c JOIN d vi ON vi.dk = c.i JOIN d vj ON vj.dk = c.j
ORDER BY c.i, c.j
""")
def q191(spark, sf):
    e = T(spark, sf, "embeddings")
    return SIM.embedding_covariance(e, "embedding", 64)


# ---------------------------------------------------------------- q203
# ANN recall calibration — the q192 treatment for the IVF family
# (operators/similarity.ivf_topk_fixed vs cosine_topk): per probe
# budget (nprobe ∈ 1,2,4,8), recall@5 of the fixed-codebook IVF
# against the EXACT brute-force cosine top-5 over the same 20-query
# sample — so a user choosing nprobe reads measured recall, not a
# guess.  Hit counts are exact integers (both rankings are the
# hash-proven q57/q50 shapes: 6dp-rounded sims, neighbor-id
# tie-breaks, single-list assignment); the only new double is the
# final recall division, rounded 6dp.
_Q203_CENTROIDS = [30, 95, 160, 225, 290, 355, 420, 485]
_Q203_NPROBES = [1, 2, 4, 8]
_Q203_K = 5


def _q203_sql() -> str:
    cent = ",".join(f"({i}, {cid})"
                    for i, cid in enumerate(_Q203_CENTROIDS))
    probes = ", ".join(str(p) for p in _Q203_NPROBES)
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS aa
  FROM embeddings),
cmap(list_id, cid) AS (VALUES {cent}),
cdf AS (
  SELECT c.list_id, v.v AS cv, v.aa AS cc
  FROM cmap c JOIN v ON v.vec_id = c.cid),
assigned AS (
  SELECT vec_id, v, aa, list_id FROM (
    SELECT v.vec_id, v.v, v.aa, cdf.list_id,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY ROUND(v.aa - 2*list_dot_product(v.v, cdf.cv)
                            + cdf.cc, 6),
                      cdf.list_id) AS rn
    FROM v, cdf) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, aa AS qaa
      FROM assigned WHERE vec_id < 20),
probes AS (
  SELECT query_id, list_id, pr FROM (
    SELECT q.query_id, cdf.list_id,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY ROUND(q.qaa - 2*list_dot_product(q.qv, cdf.cv)
                            + cdf.cc, 6),
                      cdf.list_id) AS pr
    FROM q, cdf)),
pairs AS (
  SELECT q.query_id, probes.pr, t.vec_id AS neighbor_id,
         ROUND(list_dot_product(q.qv, t.v)
               / (sqrt(q.qaa) * sqrt(t.aa)), 6) AS sim
  FROM q JOIN probes USING (query_id)
  JOIN assigned t ON t.list_id = probes.list_id
  WHERE t.vec_id != q.query_id),
np AS (SELECT CAST(UNNEST([{probes}]) AS BIGINT) AS nprobe),
ranked AS (
  SELECT np.nprobe, p2.query_id, p2.neighbor_id,
         row_number() OVER (PARTITION BY np.nprobe, p2.query_id
                            ORDER BY p2.sim DESC, p2.neighbor_id)
             AS rnk
  FROM np JOIN pairs p2 ON p2.pr <= np.nprobe),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q2.query_id, t.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q2.query_id
             ORDER BY ROUND(list_dot_product(q2.v, t.v)
                            / (sqrt(q2.aa) * sqrt(t.aa)), 6) DESC,
                      t.vec_id) AS rnk
    FROM (SELECT vec_id AS query_id, v, aa FROM v
          WHERE vec_id < 20) q2, v t
    WHERE t.vec_id != q2.query_id) WHERE rnk <= {_Q203_K}),
den AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs FROM ex),
hits AS (
  SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ranked r
  WHERE rnk <= {_Q203_K}
    AND EXISTS (SELECT 1 FROM ex
                WHERE ex.query_id = r.query_id
                  AND ex.neighbor_id = r.neighbor_id)
  GROUP BY nprobe)
SELECT np.nprobe, CAST({_Q203_K} AS BIGINT) AS k, den.n_exact_pairs,
       CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
       CASE WHEN den.n_exact_pairs > 0 THEN
            ROUND(CAST(COALESCE(hits.n_hits, 0) AS DOUBLE)
                  / CAST(den.n_exact_pairs AS DOUBLE), 6)
       END AS recall
FROM np LEFT JOIN hits ON hits.nprobe = np.nprobe, den
"""


@q("q203_ann_recall", sql=_q203_sql())
def q203(spark, sf):
    from rainforest_spark.operators.similarity import (
        cosine_topk, ivf_topk_fixed,
    )
    e = T(spark, sf, "embeddings")
    pred = F.col("vec_id") < 20
    exact = (cosine_topk(e, "vec_id", "embedding", pred, k=_Q203_K)
             .select("query_id", "neighbor_id")
             .localCheckpoint(eager=False))   # feeds 4 probes + den
    runs = None
    for p in _Q203_NPROBES:
        r = (ivf_topk_fixed(e, "vec_id", "embedding", pred,
                            centroid_ids=_Q203_CENTROIDS, k=_Q203_K,
                            nprobe=p)
             .select(F.lit(int(p)).cast("long").alias("nprobe"),
                     "query_id", "neighbor_id"))
        runs = r if runs is None else runs.unionByName(r)
    hits = (runs.join(F.broadcast(exact),
                      ["query_id", "neighbor_id"], "semi")
            .groupBy("nprobe")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
    den = exact.agg(F.count(F.lit(1)).cast("long")
                    .alias("n_exact_pairs"))
    dim = (e.sparkSession.range(1)
           .select(F.explode(F.array(
               *[F.lit(int(p)).cast("long")
                 for p in _Q203_NPROBES])).alias("nprobe")))
    out = (dim.join(hits, "nprobe", "left").crossJoin(den)
           .withColumn("n_hits",
                       F.coalesce(F.col("n_hits"), F.lit(0))
                       .cast("long")))
    recall = F.when(
        F.col("n_exact_pairs") > 0,
        F.round(F.col("n_hits").cast("double")
                / F.col("n_exact_pairs").cast("double"), 6))
    return out.select("nprobe", F.lit(_Q203_K).cast("long").alias("k"),
                      "n_exact_pairs", "n_hits",
                      recall.alias("recall"))
