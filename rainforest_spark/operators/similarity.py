"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline.  Query side is
  broadcast; the dot product is a JVM-side ``zip_with``/``aggregate``
  fold (sequential, deterministic) — no Python in the loop.
- LSH-bucketed ANN: random-hyperplane signs bucket the vectors; only
  same-bucket pairs are scored.  The scale path: the shuffle is on the
  bucket key instead of a full cross join.
"""

from __future__ import annotations

import numpy as _np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)")


def _norm(a: str) -> Column:
    return F.sqrt(F.expr(
        f"aggregate({a}, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))


def with_double_vec(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    """float vectors → double before arithmetic, so both engines
    accumulate in double precision."""
    return df.withColumn(out, F.col(vec_col).cast("array<double>"))


def cosine_topk(vectors: DataFrame, id_col: str, vec_col: str,
                query_ids_pred: Column, k: int = 3,
                round_to: int = 6) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Similarity is rounded BEFORE ranking so ties break on the neighbour
    id deterministically; the query side is broadcast (queries ≪ corpus).
    """
    from pyspark.sql import Window

    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col), F.col("v"), _norm("v").alias("nrm"))
    q = v.filter(query_ids_pred).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    t = v.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("tv"),
                 F.col("nrm").alias("tn"))
    pairs = t.crossJoin(broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")),
                       round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    "neighbor_id", "sim"))


def hard_negatives(vectors: DataFrame, id_col: str, vec_col: str,
                   query_ids_pred: Column, k: int = 3,
                   band: tuple = (0.2, 0.8),
                   round_to: int = 6) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the
    top-k most similar vectors INSIDE a similarity band — similar
    enough to be informative negatives, below the near-duplicate zone
    that would poison the loss with false negatives.

    Exactly cosine_topk with the band filter applied BEFORE ranking
    (the band is on the 6dp-rounded similarity, so the cut itself is
    engine-exact).  Scale path: swap the scoring backend for the
    LSH/IVF candidate generators when the corpus outgrows the
    broadcast — the band filter composes with any of them.
    """
    from pyspark.sql import Window

    lo, hi = band
    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col), F.col("v"), _norm("v").alias("nrm"))
    q = v.filter(query_ids_pred).select(
        F.col(id_col).alias("anchor_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    t = v.select(F.col(id_col).alias("negative_id"),
                 F.col("v").alias("tv"), F.col("nrm").alias("tn"))
    pairs = t.crossJoin(broadcast(q)).filter(
        F.col("negative_id") != F.col("anchor_id"))
    sim = (pairs.withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")),
                       round_to))
        .filter((F.col("sim") >= lo) & (F.col("sim") < hi)))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("negative_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("anchor_id", F.col("rnk").cast("long").alias("rnk"),
                    "negative_id", "sim"))


def hyperplane_buckets(vectors: DataFrame, id_col: str, vec_col: str,
                       n_planes: int | None = None, seed: int = 42,
                       dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector.

    Planes are seeded driver-side (numpy RandomState) and broadcast as
    literals — deterministic and tiny (n_planes × dim doubles).  Pass
    ``dim`` when the caller knows it (it almost always does) — the
    fallback ``.first()`` probe runs an eager Spark job during plan
    construction.

    ``n_planes=None`` (the default) sizes the plane count from a corpus
    count via ``auto_n_planes`` — per-bucket occupancy, and therefore
    downstream candidate-pair counts, stay constant as N grows.  A
    frozen plane count at growing N is the measured quadratic
    (PERF.md round 5); pass an explicit ``n_planes`` only when the
    caller owns that trade (e.g. a recall target or an oracle pairing).
    """
    import numpy as np

    if n_planes is None:
        n_planes = auto_n_planes(vectors.count())
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    v = with_double_vec(vectors, vec_col, "v")
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        d = F.expr(
            "aggregate(zip_with(v, __plane, (x, y) -> x * y), "
            "CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
        v = v.withColumn("__plane", plane)
        bit = F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0)
        bucket = bucket + bit
        v = v.withColumn(f"__b{i}", bit).drop("__plane")
    out = v.withColumn(
        "bucket", sum([F.col(f"__b{i}") for i in range(n_planes)],
                      F.lit(0).cast("long")))
    return out.drop(*[f"__b{i}" for i in range(n_planes)], "v")


def ann_topk_bucketed(vectors: DataFrame, id_col: str, vec_col: str,
                      query_ids_pred: Column, k: int = 3,
                      n_planes: int = 6, seed: int = 42,
                      dim: int | None = None) -> DataFrame:
    """Approximate top-k: score only within matching hyperplane buckets.

    At 100 TB this replaces the O(N·Q) cross join with a bucket-key
    equi-join; recall is tuned by ``n_planes`` (fewer planes → bigger
    buckets → higher recall, more compute).
    """
    from pyspark.sql import Window

    b = hyperplane_buckets(vectors, id_col, vec_col, n_planes, seed, dim)
    v = with_double_vec(b, vec_col, "v").select(
        F.col(id_col), "bucket", F.col("v"), _norm("v").alias("nrm"))
    q = v.filter(query_ids_pred).select(
        F.col(id_col).alias("query_id"), F.col("bucket"),
        F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    t = v.select(F.col(id_col).alias("neighbor_id"), F.col("bucket"),
                 F.col("v").alias("tv"), F.col("nrm").alias("tn"))
    pairs = t.join(broadcast(q), on="bucket").filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    "neighbor_id", "sim"))


def auto_n_planes(n_vectors: int, target_bucket: int = 128,
                  min_planes: int = 3, max_planes: int = 24) -> int:
    """``n_planes ≈ log2(N / target_bucket)``: the plane count that
    holds expected per-bucket occupancy at ``target_bucket`` as N
    grows, which keeps LSH candidate pairs — and the verify join behind
    them — LINEAR in N (the sf1 bench measured the frozen-plane
    alternative going quadratic; PERF.md round 5).

    ``target_bucket=128`` is the measured sweet spot at sf1: smaller
    buckets shave the verify join but pay more in per-row plane dots
    (each plane is a dim-literal zip_with fold) — 10 planes ran 1.6×
    SLOWER than 7 at 20k vectors.  Verify-bound workloads (tighter
    thresholds, larger dim) can lower it.
    """
    import math

    return int(min(max_planes, max(
        min_planes, round(math.log2(max(n_vectors, 1) / target_bucket)))))


def auto_planes(n_vectors: int, dim: int, n_tables: int = 2,
                target_bucket: int = 128, seed: int = 4242,
                min_planes: int = 3, max_planes: int = 24):
    """Corpus-sized hyperplane normals: ``auto_n_planes`` picks the
    plane count, a seeded RandomState draws the normals.

    Deterministic for (n_vectors-bucket, dim, seed): callers at the same
    scale tier regenerate identical planes.  Returns a (n_tables,
    n_planes, dim) float array for ``embedding_neardup_pairs``.
    """
    import numpy as np

    n_planes = auto_n_planes(n_vectors, target_bucket, min_planes,
                             max_planes)
    return np.random.RandomState(seed).randn(n_tables, n_planes, dim)


def embedding_neardup_pairs(vectors: DataFrame, id_col: str, vec_col: str,
                            planes=None, threshold: float = 0.35,
                            round_to: int = 6, seed: int = 4242,
                            dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table
    hyperplane-LSH candidates + exact cosine verification.

    ``planes`` is a (tables, n_planes, dim) array of hyperplane normals
    (caller-seeded, broadcast as literals).  The DEFAULT ``planes=None``
    auto-sizes them from the corpus: one ``count()`` (plus a one-row
    ``first()`` probe when ``dim`` isn't passed) feeds
    ``auto_planes(N, dim)`` — the log2(N / 128-per-bucket) rule — so
    per-bucket density, candidate-pair counts, and the verify join stay
    LINEAR in N.  Candidates are generated per table with an equi-join
    on the bucket key — never a corpus cross join — unioned,
    de-duplicated, then scored exactly and filtered at ``threshold``.

    SCALE NOTE (measured at sf0.1→sf1, see PERF.md): with the plane
    count FIXED, per-bucket occupancy grows linearly with corpus size,
    so candidate pairs — and runtime — grow quadratically (12.4× at 10×
    data for the frozen 3-plane setup).  That is why explicit
    ``planes`` is now the opt-in: pass it only for oracle pairings or
    when the caller owns the density trade; the default path is the
    measured-linear one.
    """
    if planes is None:
        n = vectors.count()
        if dim is None:
            dim = len(vectors.select(vec_col).first()[0])
        planes = auto_planes(n, dim, seed=seed)
    n_tables = len(planes)
    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col), "v", _norm("v").alias("nrm"))

    def bucket_col(t: int) -> Column:
        b = F.lit(0)
        for p, row in enumerate(planes[t]):
            arr = F.array(*[F.lit(float(x)) for x in row])
            dot = F.aggregate(F.zip_with(F.col("v"), arr,
                                         lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x)
            b = b + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return b

    b = v.select(F.col(id_col), "v", "nrm",
                 *[bucket_col(t).alias(f"b{t}") for t in range(n_tables)])
    cand = None
    for t in range(n_tables):
        a = b.select(F.col(id_col).alias("id_a"),
                     F.col(f"b{t}").alias("__bk"))
        c = b.select(F.col(id_col).alias("id_b"),
                     F.col(f"b{t}").alias("__bk"))
        pairs_t = (a.join(c, on="__bk")
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b"))
        cand = pairs_t if cand is None else cand.unionByName(pairs_t)
    cand = cand.distinct()
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"),
                  F.col("nrm").alias("na"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"),
                  F.col("nrm").alias("nb"))
    sim = (cand.join(va, on="id_a").join(vb, on="id_b")
           .withColumn("cos_sim", F.round(
               F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), "
                      "CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
               / (F.col("na") * F.col("nb")), round_to)))
    return (sim.filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))


def ivf_topk_fixed(vectors: DataFrame, id_col: str, vec_col: str,
                   query_ids_pred: Column, centroid_ids: list[int],
                   k: int = 3, nprobe: int = 4) -> DataFrame:
    """IVF ANN with a FIXED codebook: the inverted lists are defined by
    caller-chosen corpus vectors (by id) instead of a KMeans fit.

    The engine mechanics are identical to ``ivf_topk`` — in-plan list
    assignment against the broadcast codebook, nprobe nearest lists per
    query, list-keyed equi-join scoring — but the quantizer is
    deterministic and SQL-expressible, so the whole path is
    oracle-checkable (the KMeans variant stays for quality; its fit has
    no SQL counterpart).  Squared distances use the 3-term identity
    ``|a−c|² = a·a − 2·a·c + c·c`` — three sequential folds that both
    engines evaluate identically — rounded to 6dp before ranking with a
    list-id tie-break, so assignment/probing is bit-deterministic.
    """
    import pandas as pd
    from pyspark.sql import Window

    spark = vectors.sparkSession
    cmap = spark.createDataFrame(pd.DataFrame({
        "__list": range(len(sorted(centroid_ids))),
        "__cid": sorted(centroid_ids)}))
    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col), "v", _dot("v", "v").alias("aa"))
    cdf = (v.join(broadcast(cmap), F.col(id_col) == F.col("__cid"))
           .select("__list", F.col("v").alias("cv"),
                   F.col("aa").alias("cc")))

    # assignment: argmin over the broadcast codebook via struct-min —
    # the 8-way fan-out collapses map-side (partial agg) BEFORE the
    # shuffle, unlike a row_number window; (d2, list) is unique per row
    # so the min is deterministic
    d2 = F.round(F.col("aa") - 2 * _dot("v", "cv") + F.col("cc"), 6)
    assigned = (v.crossJoin(broadcast(cdf)).withColumn("__d2", d2)
                .groupBy(id_col)
                .agg(F.min(F.struct("__d2", "__list", "aa", "v")).alias("m"))
                .select(id_col, F.col("m.v").alias("v"),
                        F.col("m.aa").alias("aa"),
                        F.col("m.__list").alias("__list")))

    q = assigned.filter(query_ids_pred).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("aa").alias("qaa"))
    qd2 = F.round(F.col("qaa") - 2 * _dot("qv", "cv") + F.col("cc"), 6)
    pw = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(),
                                                F.col("__list").asc())
    probes = (q.crossJoin(broadcast(cdf)).withColumn("__d2", qd2)
              .withColumn("__pr", F.row_number().over(pw))
              .filter(F.col("__pr") <= nprobe)
              .select("query_id", "__list"))

    qside = (q.join(broadcast(probes), on="query_id")
             .withColumn("qn", F.sqrt(F.col("qaa"))))
    t = assigned.select(F.col(id_col).alias("neighbor_id"), "__list",
                        F.col("v").alias("tv"),
                        F.sqrt(F.col("aa")).alias("tn"))
    pairs = t.join(broadcast(qside), on="__list").filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    "neighbor_id", "sim"))


def ivf_topk(vectors: DataFrame, id_col: str, vec_col: str,
             query_ids_pred: Column, k: int = 3, n_centroids: int = 16,
             nprobe: int = 4, seed: int = 42,
             fit_fraction: float | None = None) -> DataFrame:
    """IVF-style ANN: MLlib KMeans partitions the corpus into inverted
    lists; each query scores only the ``nprobe`` nearest lists.

    At 100 TB this is the classic IVF trade: one KMeans fit on a SAMPLE
    (``fit_fraction``; centroids need thousands of points per list, not
    the corpus), one pass to assign list ids (stored with the data), and
    per-query work proportional to nprobe/n_centroids of the corpus.
    The list assignment join is an equi-join on the list id — uniform
    keys.
    """
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    v = with_double_vec(vectors, vec_col, "v")
    feat = v.withColumn("__fv", array_to_vector("v"))
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__fv",
                predictionCol="__list")
    fit_set = (feat.sample(fraction=fit_fraction, seed=seed)
               if fit_fraction else feat)
    model = km.fit(fit_set)
    assigned = model.transform(feat).drop("__fv")

    # nprobe nearest lists per query — IN THE PLAN: queries × broadcast
    # centroids (n_centroids rows — tiny), squared distance as a JVM
    # zip_with fold, row_number ≤ nprobe.  No driver-side loop: the
    # query table never leaves the executors.
    cdf = assigned.sparkSession.createDataFrame(pd.DataFrame({
        "__list": range(n_centroids),
        "cv": [[float(x) for x in c] for c in model.clusterCenters()]}))
    q = assigned.filter(query_ids_pred).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"))
    d2 = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)), "
        "CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
    pw = Window.partitionBy("query_id").orderBy(
        F.col("__d2").asc(), F.col("__list").asc())
    probes = (q.crossJoin(broadcast(cdf)).withColumn("__d2", d2)
              .withColumn("__pr", F.row_number().over(pw))
              .filter(F.col("__pr") <= nprobe)
              .select("query_id", "__list"))

    qside = q.join(broadcast(probes), on="query_id") \
        .withColumn("qn", _norm("qv"))
    t = assigned.select(F.col(id_col).alias("neighbor_id"), "__list",
                        F.col("v").alias("tv")).withColumn("tn", _norm("tv"))
    pairs = t.join(broadcast(qside), on="__list").filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    "neighbor_id", "sim"))


def quantize_embeddings(df: DataFrame, vec_col: str,
                        out_col: str = "qv",
                        scale_col: str = "q_scale") -> DataFrame:
    """Symmetric per-vector int8-range quantization: ``scale =
    max|x|/127``, ``q_i = floor(x_i/scale + 0.5)`` (round-half-up — the
    one rounding rule both engines spell identically; values land in
    [-127, 127] with at most one -128 from a negative-half edge).

    The 100 TB lever: a 4× cut of the bytes every ANN candidate stage
    shuffles and holds in memory.  Cosine NEEDS NO DEQUANTIZATION —
    the per-vector scales cancel, so downstream similarity is exact
    integer arithmetic on the quantized codes (see
    ``cosine_topk_quantized``); re-score survivors against the fp
    vectors only when the fp value itself is the deliverable.
    """
    v = with_double_vec(df, vec_col, "__v")
    amax = F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    v = v.withColumn(
        scale_col,
        F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0)))
    v = v.withColumn(
        out_col,
        F.transform(F.col("__v"),
                    lambda x: F.floor(x / F.col(scale_col) + F.lit(0.5))
                    .cast("long")))
    return v.drop("__v")


def cosine_topk_quantized(vectors: DataFrame, id_col: str, vec_col: str,
                          query_ids_pred: Column, k: int = 3,
                          round_to: int = 6) -> DataFrame:
    """Exact top-k cosine over int8-QUANTIZED codes.

    cos(s_a·q_a, s_b·q_b) = dot(q_a, q_b) / (|q_a|·|q_b|) — the scales
    cancel, so every dot product and squared norm is EXACT integer math
    (|dot| ≤ dim·127² ≪ 2⁵³); the single rounding point is the final
    division.  Same broadcast-query / row_number shape as
    ``cosine_topk``; the corpus side carries 1 byte per lane instead of
    4 at scale.
    """
    from pyspark.sql import Window

    q8 = quantize_embeddings(vectors, vec_col)
    v = q8.select(F.col(id_col), F.col("qv"),
                  _dot("qv", "qv").alias("n2"))
    q = v.filter(query_ids_pred).select(
        F.col(id_col).alias("query_id"), F.col("qv").alias("qa"),
        F.col("n2").alias("na2"))
    t = v.select(F.col(id_col).alias("neighbor_id"),
                 F.col("qv").alias("qb"), F.col("n2").alias("nb2"))
    pairs = t.crossJoin(broadcast(q)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "sim", F.round(_dot("qa", "qb")
                       / (F.sqrt("na2") * F.sqrt("nb2")), round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    "neighbor_id", "sim"))


def jl_signs(in_dim: int, out_dim: int,
             salt: str = "jl-v1") -> list[list[float]]:
    """The ±1 Achlioptas/JL projection matrix as plan-time literals.

    Sign (j, i) is the low bit of ``md5(salt:j:i)`` — data-independent,
    so the whole matrix is computed on the driver and baked into the
    plan as constants (no broadcast, no join; any engine can rebuild it
    from (salt, shape) alone, which is what keeps the op oracle-exact).
    """
    import hashlib

    return [[1.0 if int(hashlib.md5(f"{salt}:{j}:{i}".encode())
                        .hexdigest(), 16) & 1 == 0 else -1.0
             for i in range(in_dim)]
            for j in range(out_dim)]


def jl_project(df: DataFrame, vec_col: str, in_dim: int, out_dim: int,
               salt: str = "jl-v1", prefix: str = "jl_") -> DataFrame:
    """Johnson–Lindenstrauss random projection with a ±1 sign matrix:
    ``y_j = (1/sqrt(out_dim)) * Σ_i s_ji · v_i``.

    The dimension-reduction front end for 100 TB embedding stores:
    project 768-d vectors to 32–64 d before LSH bucketing / IVF
    clustering so every downstream shuffle moves ~10× fewer bytes,
    then re-score survivors on the full vectors.  With ±1 signs the
    projection preserves pairwise inner products in expectation
    (E[y·y'] = v·v'), and per-row cost is a pure column expression —
    whole-stage codegen, no UDF, no shuffle.

    Determinism: each output is a LITERAL left-associated double chain
    (element i is cast to double, multiplied by ±1.0 — exact — and
    added in fixed index order), so any engine evaluating the same
    chain produces bit-identical doubles.
    """
    import functools

    signs = jl_signs(in_dim, out_dim, salt)
    scale = 1.0 / (float(out_dim) ** 0.5)
    v = F.col(vec_col)
    outs = []
    for j, row in enumerate(signs):
        terms = [F.element_at(v, i + 1).cast("double") * F.lit(s)
                 for i, s in enumerate(row)]
        acc = functools.reduce(lambda a, b: a + b, terms)
        outs.append((acc * F.lit(scale)).alias(f"{prefix}{j}"))
    return df.select("*", *outs)


def embedding_dedup(vectors: DataFrame, id_col: str, vec_col: str,
                    planes=None, threshold: float = 0.35,
                    seed: int = 4242,
                    dim: int | None = None) -> DataFrame:
    """Semantic dedup over an embedding column (the SemDeDup shape):
    near-dup pair generation (LSH candidates + exact cosine ≥
    ``threshold``), connected components over the pair graph, and a
    canonical representative (the MIN id) per component.

    Returns one row per INPUT vector: ``(id, cluster_id, keep)`` —
    singletons are their own cluster with ``keep=true``; within a
    component only the canonical id keeps.  Filter on ``keep`` to
    materialize the deduplicated corpus.

    Scale shape: everything rides the two proven pieces — the bucketed
    pair join (never a corpus cross product) and min-label propagation
    whose per-round shuffle is keyed on the vertex id over the pair
    set, which is orders of magnitude smaller than the corpus.  The
    final label attach is one left join on the id.
    """
    from rainforest_spark.operators.dedup import neardup_clusters

    pairs = embedding_neardup_pairs(vectors, id_col, vec_col,
                                    planes=planes, threshold=threshold,
                                    seed=seed, dim=dim)
    labels = neardup_clusters(pairs, out_id="__v",
                              cluster_col="__cluster")
    out = (vectors.select(F.col(id_col))
           .join(labels, F.col(id_col) == F.col("__v"), "left")
           .select(F.col(id_col),
                   F.coalesce("__cluster", F.col(id_col))
                   .alias("cluster_id")))
    return out.withColumn("keep", F.col(id_col) == F.col("cluster_id"))


def _np_kmeans_fit(X, m: int, iters: int = 10):
    """Deterministic numpy Lloyd's on a bounded sample (probe-side
    alternative quantizer when the chosen codebook is the fixed
    exhibit — NOT the production fit, which is MLlib KMeans).
    Init = spread-by-order (the fixed exhibit's own rule), so the fit
    is reproducible without a RNG."""
    import numpy as np

    n = len(X)
    C = X[[(i * n) // m for i in range(m)]].copy()
    for _ in range(int(iters)):
        d2 = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
              + (C * C).sum(1)[None, :])
        a = d2.argmin(1)
        for j in range(m):
            sel = X[a == j]
            if len(sel):
                C[j] = sel.mean(0)
    return C


def _ivf_probe_stats(X, C, n_queries: int) -> dict:
    """Recall@5-at-nprobe-1 vs the sample-exact cosine top-5, plus the
    scan fraction (= chance recall) and list balance, all in numpy on
    the bounded probe sample.  The quality numbers build_ivf_index
    records in the index manifest."""
    import numpy as np

    n = len(X)
    d2 = ((X * X).sum(1)[:, None] - 2.0 * (X @ C.T)
          + (C * C).sum(1)[None, :])
    assign = d2.argmin(1)
    sizes = np.bincount(assign, minlength=len(C)).astype(float)
    balance = float(sizes.max() / sizes.mean()) if sizes.mean() else None
    norms = np.sqrt((X * X).sum(1))
    norms[norms == 0] = 1.0
    nq = min(int(n_queries), n)
    recalls, fracs = [], []
    for i in range(nq):
        sims = (X @ X[i]) / (norms * norms[i])
        sims[i] = -np.inf
        top5 = np.argsort(-sims)[:5]
        cand = np.flatnonzero(assign == assign[i])
        cand = set(int(c) for c in cand if c != i)
        recalls.append(len(cand & set(int(t) for t in top5)) / 5.0)
        fracs.append(len(cand) / max(n - 1, 1))
    r5 = float(np.mean(recalls)) if recalls else None
    sf = float(np.mean(fracs)) if fracs else None
    return {
        "n_sample": int(n), "n_queries": int(nq),
        "recall_at_5_np1": round(r5, 4) if r5 is not None else None,
        "scan_fraction": round(sf, 4) if sf is not None else None,
        "recall5_over_chance": (round(r5 / sf, 2)
                                if r5 is not None and sf else None),
        "balance_max_over_mean": (round(balance, 3)
                                  if balance is not None else None)}


def build_ivf_index(vectors: DataFrame, id_col: str, vec_col: str,
                    path: str, centroid_ids: list[int] | None = None,
                    n_centroids: int = 16, seed: int = 42,
                    fit_fraction: float | None = None,
                    quality_probe: bool = True,
                    probe_sample: int = 4096,
                    probe_queries: int = 64) -> None:
    """Materialize an IVF index as TABLES: ``{path}/codebook`` (list_id,
    centroid vector, |c|²) and ``{path}/lists`` (the corpus with its
    list assignment), the latter PARTITIONED BY list_id on disk.

    Quantizer DEFAULT is a KMeans fit (``n_centroids`` lists, optional
    ``fit_fraction`` sampling — centroids need thousands of points per
    list, not the corpus): the q203 calibration showed a fixed
    corpus-vector codebook concentrates neighbours at ≈ chance level
    (recall ≈ scan fraction at every nprobe) while the fit quantizer
    reaches 2-3× chance on the same embeddings at equal candidate
    budget (PERF.md ANN curve; pytest-gated in tests/test_ivf_index.py).
    Pass explicit ``centroid_ids`` (corpus vectors by id) only for the
    deterministic, SQL-expressible exhibit (the q57/q203 oracle path).

    Build once, probe many: the write pays the assignment cross-product
    one time, and every subsequent query batch scans ONLY the probed
    list partitions (static partition pruning — see
    :func:`ivf_topk_index`).  At 100 TB this converts every ANN batch from
    a full-corpus scan into ``nprobe/n_lists`` of it.

    QUALITY PROBE (VERDICT r11 #4 — the r11 curves showed the fit and
    fixed quantizers TRADING PLACES with corpus size, so a static
    default needs a per-build measurement): unless
    ``quality_probe=False``, the build samples ``probe_sample``
    corpus vectors deterministically (md5-of-id order), measures
    recall@5-at-nprobe-1 vs the sample-exact cosine top-5, the scan
    fraction (chance recall) and list balance for the CHOSEN codebook
    AND the alternative variant (fixed spread-by-id when the fit was
    chosen; a deterministic sample-KMeans when the fixed exhibit was
    chosen), records both in ``{path}/manifest.json``, and
    ``warnings.warn``s LOUDLY when the alternative measures >10 %
    better on recall-over-chance — the signal to rebuild with the
    other quantizer.  Probe cost is bounded at any corpus size (one
    TakeOrdered of ``probe_sample`` rows + numpy on the driver).
    """
    import warnings
    spark = vectors.sparkSession
    import pandas as pd

    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col).alias("vid"), "v", _dot("v", "v").alias("aa"))
    if centroid_ids is not None:
        cmap = spark.createDataFrame(pd.DataFrame({
            "__list": range(len(sorted(centroid_ids))),
            "__cid": sorted(centroid_ids)}))
        cdf = (v.join(broadcast(cmap), F.col("vid") == F.col("__cid"))
               .select("__list", F.col("v").alias("cv"),
                       F.col("aa").alias("cc")))
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = v.withColumn("__fv", array_to_vector("v"))
        fit_set = (feat.sample(fraction=fit_fraction, seed=seed)
                   if fit_fraction else feat)
        model = KMeans(k=n_centroids, seed=seed, featuresCol="__fv",
                       predictionCol="__list").fit(fit_set)
        centers = [[float(x) for x in c] for c in model.clusterCenters()]
        cdf = broadcast(spark.createDataFrame(pd.DataFrame({
            "__list": range(n_centroids),
            "cv": centers,
            "cc": [sum(x * x for x in c) for c in centers]})))
    (cdf.withColumnRenamed("__list", "list_id")
        .write.mode("overwrite").parquet(f"{path}/codebook"))
    (_ivf_assign(v, cdf, id_col).repartition("list_id")
     .write.mode("overwrite").partitionBy("list_id")
     .parquet(f"{path}/lists"))
    if not quality_probe:
        return
    import json
    import os

    import numpy as np

    quantizer = "fixed_ids" if centroid_ids is not None else "kmeans_fit"
    sample = (v.orderBy(F.md5(F.col("vid").cast("string")))
              .limit(int(probe_sample))
              .select("vid", "v").collect())
    X = np.array([list(r["v"]) for r in sample], dtype=np.float64)
    chosen_C = np.array(
        [list(r["cv"]) for r in
         sorted(cdf.select("__list", "cv").collect(),
                key=lambda r: r["__list"])], dtype=np.float64)
    k_lists = len(chosen_C)

    def _probe_at(m: int) -> dict:
        """Chosen-vs-alternative verdict on the first ``m`` probe
        vectors (md5 order — the small sample is a prefix, so the two
        scales differ ONLY in sample size).  The alternative codebook
        is re-derived at each scale: that is the point — the r12
        sf10 measurement showed the 4096-sample verdict disagreeing
        with the 200k full-corpus instrument, so a verdict that flips
        between two probe scales is flagged as scale-dependent."""
        Xs = X[:m]
        if centroid_ids is not None:
            alt_variant = "kmeans_fit_sample"
            alt_C = _np_kmeans_fit(Xs, k_lists)
        else:
            # the fixed exhibit's rule: corpus vectors spread by id
            alt_variant = "fixed_spread_by_id"
            by_id = sorted(range(m), key=lambda i: sample[i]["vid"])
            alt_C = Xs[[by_id[(j * m) // k_lists]
                        for j in range(k_lists)]]
        chosen_s = _ivf_probe_stats(Xs, chosen_C, probe_queries)
        alt_s = _ivf_probe_stats(Xs, alt_C, probe_queries)
        co, ao = (chosen_s["recall5_over_chance"],
                  alt_s["recall5_over_chance"])
        return {"chosen": chosen_s,
                "alternative": {"variant": alt_variant, **alt_s},
                "alt_better": bool(co is not None and ao is not None
                                   and ao > 1.1 * co)}

    probe = _probe_at(len(X))
    # second, smaller scale (VERDICT r12 #4): the observed failure
    # mode is the verdict CHANGING with probe scale — two agreeing
    # scales are evidence the sample-level signal is stable; a flip
    # says the build sits in the regime where only the full-corpus
    # instrument (tools/ivf_quality) can adjudicate.
    small_m = len(X) // 4
    if small_m >= max(64, 2 * k_lists):
        probe_small = _probe_at(small_m)
        regime = ("consistent"
                  if probe_small["alt_better"] == probe["alt_better"]
                  else "flips_with_sample_size")
    else:
        probe_small, regime = None, "single_scale_only"
    manifest = {"quantizer": quantizer,
                "n_centroids": int(k_lists),
                "seed": int(seed),
                "probe": probe,
                "probe_small": probe_small,
                "probe_regime": regime}
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    co = probe["chosen"]["recall5_over_chance"]
    ao = probe["alternative"]["recall5_over_chance"]
    alt_variant = probe["alternative"]["variant"]
    if regime == "flips_with_sample_size":
        warnings.warn(
            f"build_ivf_index({path}): the chosen-vs-alternative "
            f"verdict FLIPS between the {len(X)}- and {small_m}-vector "
            f"probe scales — the sample-level signal is scale-"
            f"dependent here (the regime where the 4096-sample probe "
            f"and the full-corpus instrument disagreed at sf10, "
            f"PERF.md).  Do not choose a quantizer from this probe: "
            f"run python -m rainforest_spark.tools.ivf_quality at the "
            f"corpus tier.  Full numbers: {path}/manifest.json",
            stacklevel=2)
    elif probe["alt_better"]:
        warnings.warn(
            f"build_ivf_index({path}): the NON-default quantizer "
            f"({alt_variant}) measured recall5_over_chance={ao} vs "
            f"the chosen {quantizer}'s {co} on the {len(X)}-vector "
            f"probe sample (and the {small_m}-vector scale agrees) — "
            f"the variants trade places with corpus size (PERF.md ANN "
            f"curves); consider rebuilding with the other quantizer.  "
            f"Full numbers: {path}/manifest.json", stacklevel=2)


def _ivf_assign(v: DataFrame, cdf: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid list assignment shared by index build and
    append: rounded squared distance, argmin tie-broken on list id."""
    d2 = F.round(F.col("aa") - 2 * _dot("v", "cv") + F.col("cc"), 6)
    return (v.crossJoin(broadcast(cdf)).withColumn("__d2", d2)
            .groupBy("vid")
            .agg(F.min(F.struct("__d2", "__list", "aa", "v"))
                 .alias("m"))
            .select(F.col("vid").alias(id_col),
                    F.col("m.v").alias("v"),
                    F.col("m.aa").alias("aa"),
                    F.col("m.__list").alias("list_id")))


def ivf_append(spark, path: str, vectors: DataFrame, id_col: str,
               vec_col: str) -> None:
    """Append NEW vectors to a persisted IVF index
    (:func:`build_ivf_index`) without refitting: assign against the
    frozen codebook with the exact build-time expressions (so an
    appended vector lands in the list a fresh build over the union
    would give it, bit-for-bit) and parquet-APPEND into the
    ``list_id``-partitioned store — only the touched partitions gain
    files; probes (:func:`ivf_topk_index`) see the new rows with
    partition pruning intact and zero index rewrite.

    The ingest path for a continuously-growing 100 TB embedding store:
    appends are O(batch); rebuild (refit centroids) only when drift
    degrades recall — the codebook stays frozen here by design, the
    same trade every production IVF store makes between index
    freshness and assignment quality.
    """
    code = spark.read.parquet(f"{path}/codebook")
    cdf = code.select(F.col("list_id").alias("__list"), "cv", "cc")
    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col).alias("vid"), "v", _dot("v", "v").alias("aa"))
    (_ivf_assign(v, cdf, id_col).repartition("list_id")
     .write.mode("append").partitionBy("list_id")
     .parquet(f"{path}/lists"))


def ivf_topk_index(spark, path: str, queries: DataFrame,
                   id_col: str, vec_col: str, k: int = 3,
                   nprobe: int = 4) -> DataFrame:
    """Probe a persisted IVF index (:func:`build_ivf_index`) with a
    batch of query vectors.

    ``queries`` carries the vectors themselves (the ANN-batch shape —
    queries are usually NOT index members, and looking vectors up by id
    would full-scan the index since ``list_id``, not the id, is the
    partition column).  The probed list ids are computed against the
    broadcast codebook and collected to the driver — a tiny, bounded
    set (≤ n_lists ints) — so the ONLY index scan filters on LITERALS
    and Spark prunes the unprobed ``list_id=`` partitions at planning
    time (plan-asserted in tests/test_ivf_index.py).  Scoring replays
    ivf_topk_fixed's exact expressions, so results are bit-identical to
    the in-memory path.
    """
    from pyspark.sql import Window

    code = spark.read.parquet(f"{path}/codebook").withColumnRenamed(
        "list_id", "__list")
    lists = spark.read.parquet(f"{path}/lists")
    qv = with_double_vec(queries, vec_col, "qv")
    q = qv.select(F.col(id_col).alias("query_id"), "qv",
                  _dot("qv", "qv").alias("qaa"))
    qd2 = F.round(F.col("qaa") - 2 * _dot("qv", "cv") + F.col("cc"), 6)
    pw = Window.partitionBy("query_id").orderBy(F.col("__d2").asc(),
                                                F.col("__list").asc())
    probes = (q.crossJoin(broadcast(code)).withColumn("__d2", qd2)
              .withColumn("__pr", F.row_number().over(pw))
              .filter(F.col("__pr") <= nprobe)
              .select("query_id", "__list"))
    probed_ids = sorted({r["__list"] for r in
                         probes.select("__list").distinct().collect()})
    qside = (q.join(broadcast(probes), on="query_id")
             .withColumn("qn", F.sqrt(F.col("qaa"))))
    t = (lists.filter(F.col("list_id").isin(probed_ids))
         .select(F.col(id_col).alias("neighbor_id"),
                 F.col("list_id").alias("__list"),
                 F.col("v").alias("tv"),
                 F.sqrt(F.col("aa")).alias("tn")))
    pairs = t.join(broadcast(qside), on="__list").filter(
        F.col("neighbor_id") != F.col("query_id"))
    sim = pairs.withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (sim.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", F.col("rnk").cast("long").alias("rnk"),
                    "neighbor_id", "sim"))


def semantic_contamination(train: DataFrame, eval_side: DataFrame,
                           id_col: str, vec_col: str,
                           threshold: float = 0.3,
                           round_to: int = 6) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic
    complement of the n-gram overlap pass (text_analysis.
    contamination_overlap): flag training items whose embedding is
    within ``threshold`` cosine of ANY eval-set item, with the nearest
    eval neighbour attached.  Catches paraphrased eval leakage that
    verbatim n-gram matching misses.

    Shape at 100 TB: the eval side is small by construction — it is
    broadcast, and each train partition computes its max-similarity
    locally (crossJoin against the broadcast + per-train-row window,
    no shuffle of the train side beyond the window's partition-local
    sort over ≤|eval| rows per train id).  Similarity is rounded
    BEFORE the threshold cut and ranking, so the cut and the
    nearest-neighbour tie-break (min eval id at equal sim) are
    engine-exact.
    """
    from pyspark.sql import Window

    t = with_double_vec(train, vec_col, "tv").select(
        F.col(id_col).alias("train_id"), F.col("tv"),
        _norm("tv").alias("tn"))
    e = with_double_vec(eval_side, vec_col, "ev").select(
        F.col(id_col).alias("eval_id"), F.col("ev"),
        _norm("ev").alias("en"))
    pairs = t.crossJoin(broadcast(e))
    sim = pairs.withColumn(
        "sim", F.round(_dot("tv", "ev") / (F.col("tn") * F.col("en")),
                       round_to))
    w = Window.partitionBy("train_id").orderBy(
        F.col("sim").desc(), F.col("eval_id").asc())
    return (sim.withColumn("__rnk", F.row_number().over(w))
            .filter((F.col("__rnk") == 1) & (F.col("sim") >= threshold))
            .select("train_id", "eval_id", "sim"))


def margin_alignment(vectors: DataFrame, id_col: str, vec_col: str,
                     left_pred: Column, right_pred: Column,
                     k_margin: int = 4, round_to: int = 6) -> DataFrame:
    """Margin-based embedding alignment (bitext-mining style): for each
    LEFT vector, its top-1 RIGHT neighbour by cosine together with the
    ratio margin ``sim / mean(top-k sims)`` — the standard
    absolute-threshold killer for parallel-corpus mining (a hub vector
    that is "close to everything" gets margin ~1 and is rejected; a
    true translation pair stands out from its neighbourhood).

    Similarity is rounded to ``round_to`` BEFORE ranking (ties break on
    the neighbour id); the margin divides the top-1 similarity by the
    mean of the top-``k_margin`` similarities and is rounded after the
    division.  No margin threshold is applied here — emitting the raw
    margin keeps the decision cut out of the engine (and a threshold
    exactly ON a margin value would be engine-order dependent).

    Shape at 100 TB: the LEFT (query) side broadcasts — alignment
    queries are the smaller corpus by construction; swap the candidate
    generator for the LSH/IVF paths when both sides are huge (the
    margin is computed over whatever candidate set ranks).
    """
    from pyspark.sql import Window

    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col), F.col("v"), _norm("v").alias("nrm"))
    q = v.filter(left_pred).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"))
    t = v.filter(right_pred).select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("tv"),
        F.col("nrm").alias("tn"))
    sim = t.crossJoin(broadcast(q)).withColumn(
        "sim", F.round(_dot("qv", "tv") / (F.col("qn") * F.col("tn")),
                       round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    top = (sim.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= k_margin))
    return (top.groupBy("query_id").agg(
        F.min_by("neighbor_id", "rnk").alias("match_id"),
        F.min_by("sim", "rnk").alias("sim"),
        F.avg("sim").alias("__mean_topk"))
        .select("query_id", "match_id", "sim",
                F.round(F.col("sim") / F.col("__mean_topk"), round_to)
                .alias("margin")))


def kmeans_clusters(vectors: DataFrame, id_col: str, vec_col: str,
                    k: int = 8, n_iter: int = 2,
                    round_to: int = 6) -> DataFrame:
    """Fixed-iteration spherical k-means over an embedding column —
    the topic/quality clustering pass of a corpus pipeline (cluster
    then sample per cluster for diversity, or drop junk clusters).

    Deterministic by construction, so it is oracle-checkable:

    - init: the ``k`` lowest-id vectors are the seed centroids, cluster
      index = their id rank (no RNG);
    - assignment: cosine similarity rounded to ``round_to`` BEFORE the
      argmax, ties break on the lowest cluster index (the q51 policy,
      proven hash-exact);
    - update: per-dimension mean from 1e-9-grid integer-nanos BIGINT
      component sums — a raw double ``avg`` is partial-aggregation-
      order dependent, and deep property fuzzing showed the noise CAN
      push a rounded similarity across the 6dp grid and flip an
      assignment between runs.  The nanos come from
      ``floor(x·1e9 + 0.5)`` — pure double ops + floor→long, all
      IEEE-identical across Spark/DuckDB/libm, with NO per-element
      BigDecimal (both ``ROUND(x, 9)``-based formulations measured
      ~2x the whole query at sf1; this one is as fast as the raw
      ``avg``).  Half-way values round toward +inf on both engines —
      a convention, deterministic either way;
    - exactly ``n_iter`` assignment rounds — no convergence test, so
      both engines run the same computation.

    A centroid that loses all members simply disappears from the next
    round (both engines derive centroids from the assignment table).

    Shape at 100 TB: the centroid table is k x dim (broadcast); each
    iteration is one broadcast-join scan + one (cluster, dim) groupBy
    whose output is again k x dim.  Iterations multiply the scan count,
    not the shuffle size — n_iter stays a small constant.
    """
    from pyspark.sql import Window

    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col).alias("vec_id"), F.col("v"),
        _norm("v").alias("nrm"))
    w_init = Window.orderBy("vec_id")
    cent = (v.orderBy("vec_id").limit(k)
            .withColumn("cid", F.row_number().over(w_init) - 1)
            .select("cid", F.col("v").alias("cv")))

    def assign(cent_df: DataFrame) -> DataFrame:
        cn = cent_df.withColumn("cnrm", _norm("cv"))
        scored = v.crossJoin(broadcast(cn)).withColumn(
            "sim",
            F.round(_dot("v", "cv") / (F.col("nrm") * F.col("cnrm")),
                    round_to))
        w = Window.partitionBy("vec_id").orderBy(
            F.col("sim").desc(), F.col("cid").asc())
        return (scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("vec_id", "cid", "sim"))

    for _ in range(n_iter - 1):
        a = assign(cent)
        pos = (a.join(v, "vec_id")
               .select("cid", F.posexplode("v").alias("pos", "x")))
        nano = F.floor(F.col("x") * F.lit(1000000000.0) + F.lit(0.5))
        cent = (pos.groupBy("cid", "pos")
                .agg(((F.sum(nano).cast("double")
                       / F.lit(1000000000.0))
                      / F.count(F.lit(1))).alias("cx"))
                .groupBy("cid")
                .agg(F.array_sort(F.collect_list(
                    F.struct("pos", "cx"))).alias("s"))
                .select("cid", F.transform("s", lambda e: e["cx"])
                        .alias("cv")))
    out = assign(cent)
    return out.select("vec_id", F.col("cid").cast("long").alias("cluster"),
                      "sim")


def farthest_point_sample(vectors: DataFrame, id_col: str, vec_col: str,
                          k: int, round_to: int = 6) -> DataFrame:
    """k-center / farthest-point diversity sampling: greedily pick the
    vector FARTHEST (lowest max-cosine) from everything chosen so far —
    the classic coreset selector a data pipeline runs to cover the
    embedding space with k exemplars (complement of near-dup removal:
    dedup drops redundancy, FPS picks the spanning set).

    Deterministic: the seed is the LOWEST id; each round scores
    ``sim_to_chosen = max(cosine to any chosen exemplar)`` rounded to
    ``round_to`` and picks the minimum (ties -> lowest id).  Exactly
    ``k-1`` distributed rounds.

    Shape at 100 TB: the chosen set is k rows — each round is ONE
    broadcast-join scan + a 1-row global min (the same argmin shape as
    TakeOrdered with m=1); rounds multiply scans, not shuffles, so keep
    k modest (a coreset, not a sample).  The incremental trick keeps
    each round O(n): only similarity against the NEWEST exemplar is
    computed, folded into the running max via ``greatest``.

    Returns ``(id, pick_order, sim_at_pick)`` for the k exemplars —
    ``sim_at_pick`` is the coverage radius when that exemplar was
    chosen (non-decreasing; a scree curve for choosing k).
    """
    v = with_double_vec(vectors, vec_col, "v").select(
        F.col(id_col).alias("__vid"), F.col("v"),
        _norm("v").alias("nrm"))
    seed = (v.orderBy("__vid").limit(1)
            .select(F.col("__vid").alias("__cid"),
                    F.col("v").alias("cv"), F.col("nrm").alias("cnrm")))
    state = (v.crossJoin(broadcast(seed))
             .withColumn("__best",
                         F.round(_dot("v", "cv")
                                 / (F.col("nrm") * F.col("cnrm")),
                                 round_to))
             .select("__vid", "v", "nrm", "__best"))
    first = seed.select("__cid").collect()[0][0]
    out_rows = [(first, 1, None)]
    state = state.filter(F.col("__vid") != F.lit(first)).localCheckpoint()
    for rnd in range(2, k + 1):
        nxt_rows = (state.orderBy(F.col("__best").asc(),
                                  F.col("__vid").asc())
                    .limit(1).collect())
        if not nxt_rows:
            break                      # k exceeds the corpus: return all
        nxt = nxt_rows[0]
        out_rows.append((nxt["__vid"], rnd, float(nxt["__best"])))
        chosen = (v.filter(F.col("__vid") == F.lit(nxt["__vid"]))
                  .select(F.col("v").alias("cv"),
                          F.col("nrm").alias("cnrm")))
        state = (state.filter(F.col("__vid") != F.lit(nxt["__vid"]))
                 .crossJoin(broadcast(chosen))
                 .withColumn("__best", F.greatest(
                     "__best",
                     F.round(_dot("v", "cv")
                             / (F.col("nrm") * F.col("cnrm")),
                             round_to)))
                 .select("__vid", "v", "nrm", "__best")
                 .localCheckpoint())
    spark = vectors.sparkSession
    id_type = vectors.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        out_rows,
        f"{id_col} {id_type}, pick_order int, sim_at_pick double")


def label_cohesion(vectors: DataFrame, id_col: str, vec_col: str,
                   label_col: str, round_to: int = 6) -> DataFrame:
    """Embedding-space health per class/cluster label: each label's
    centroid cohesion — ``n``, the mean and the minimum cosine of the
    label's members to their own centroid.  The drift monitor a
    pipeline runs over embedding versions: a label whose mean cohesion
    collapses has been polluted (mislabeled ingest) or the encoder
    changed under it.

    Exactness (both engines bit-identical):

    - centroid: per-(label, dim) component sums as floor-nanos
      BIGINTs (``floor(x*1e9 + 0.5)`` — pure double ops + floor→long,
      IEEE-identical everywhere, order-free partial aggregation, and
      NO per-element BigDecimal: the ROUND-based decimal formulation
      measured ~2x on the kmeans sibling at sf1), centroid component
      = (sum/1e9)/n in two double divisions;
    - per-row cosine: one sequential array fold (zip_with aggregate ≡
      DuckDB list_dot_product — index order, same doubles);
    - mean cosine: per-element floor-nanos of (cos+1) (shifted
      POSITIVE so the exact round-half-up integer division idiom is
      sign-safe), summed as BIGINT, divided back;
    - min cosine: min over 6dp-rounded identical doubles.

    Shape at 100 TB: one posexplode groupBy on (label, dim) — |labels|
    × dim tiny dim out; the centroid table broadcast-joins back; one
    grouped aggregation.  No pairwise anything.
    """
    v = with_double_vec(vectors, vec_col, "__v")
    comp = v.select(F.col(label_col).alias("__lb"),
                    F.posexplode("__v").alias("__pos", "__x"))
    sums = (comp.withColumn("__x9",
                            F.floor(F.col("__x") * F.lit(1000000000.0)
                                    + F.lit(0.5)))
            .groupBy("__lb", "__pos")
            .agg(F.sum("__x9").alias("__s"),
                 F.count(F.lit(1)).alias("__n")))
    cent = (sums.withColumn("__c", (F.col("__s").cast("double")
                                    / F.lit(1000000000.0))
                            / F.col("__n"))
            .groupBy("__lb")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__c"))),
                lambda t: t["__c"]).alias("__cent")))
    scored = v.join(F.broadcast(cent),
                    F.col(label_col).eqNullSafe(F.col("__lb")))
    cos = (_dot("__v", "__cent")
           / (_norm("__v") * _norm("__cent")))
    nano = F.floor((cos + F.lit(1.0)) * F.lit(1000000000.0)
                   + F.lit(0.5))
    agg = (scored.select(F.col(label_col), nano.alias("__n9"),
                         F.round(cos, round_to).alias("__c6"))
           .groupBy(label_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("__n9").alias("__s9"),
                F.min("__c6").alias("min_cos")))
    micro = F.expr("(2 * __s9 + 1000 * n) div (2000 * n)")
    return agg.select(
        label_col, "n",
        (micro.cast("double") / F.lit(1000000.0) - F.lit(1.0))
        .alias("mean_cos"),
        "min_cos")


def embedding_novelty(batch: DataFrame, corpus: DataFrame,
                      id_col: str, vec_col: str, planes=None,
                      round_to: int = 6, seed: int = 4242,
                      dim: int | None = None,
                      corpus_id_col: str | None = None) -> DataFrame:
    """Semantic novelty of an ingest batch against the PERSISTED
    corpus: per batch vector, ``1 − max(0, cos)`` over its LSH-
    candidate corpus neighbours — the embedding-space analogue of the
    n-gram :func:`~rainforest_spark.operators.dedup.novelty_scores`
    (novelty ≈ 0: semantically re-served content; ≈ 1 or NULL —
    no candidate at all: genuinely new).

    Returns ``(batch_id, max_sim, novelty)``; batch vectors with no
    bucket-sharing corpus neighbour keep a NULL ``max_sim``/``novelty``
    rather than disappearing (the ingest-gate join is LEFT from the
    batch).

    Exactness: per-pair cosine is the sequential fold, rounded at
    ``round_to`` BEFORE the max (max over identical rounded doubles is
    engine-free); novelty is arithmetic on the already-rounded max.

    Shape at 100 TB: the corpus side's buckets are computed from the
    SAME broadcast plane literals as the batch (at scale: persist the
    corpus bucket table once per corpus version, exactly like q97's
    band table); candidates come from per-table bucket equi-joins with
    the small batch side — cost O(batch × bucket density), never
    O(corpus).  ``planes=None`` auto-sizes off the CORPUS count so
    bucket density holds as the corpus grows.
    """
    cid = corpus_id_col or id_col
    if planes is None:
        n = corpus.count()
        if dim is None:
            dim = len(corpus.select(vec_col).first()[0])
        planes = auto_planes(n, dim, seed=seed)
    n_tables = len(planes)

    def prep(df: DataFrame, idc: str, out_id: str) -> DataFrame:
        v = with_double_vec(df, vec_col, "v")
        return v.select(F.col(idc).alias(out_id), "v",
                        _norm("v").alias("nrm"))

    def bucket_col(t: int) -> Column:
        b = F.lit(0)
        for p, row in enumerate(planes[t]):
            arr = F.array(*[F.lit(float(x)) for x in row])
            dot = F.aggregate(F.zip_with(F.col("v"), arr,
                                         lambda x, y: x * y),
                              F.lit(0.0), lambda acc, x: acc + x)
            b = b + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        return b

    bb = prep(batch, id_col, "batch_id")
    cb = prep(corpus, cid, "corpus_id")
    bb = bb.select("batch_id", "v", "nrm",
                   *[bucket_col(t).alias(f"b{t}") for t in range(n_tables)])
    cb = cb.select("corpus_id", "v", "nrm",
                   *[bucket_col(t).alias(f"b{t}") for t in range(n_tables)])
    cand = None
    for t in range(n_tables):
        a = bb.select("batch_id", F.col(f"b{t}").alias("__bk"))
        c = cb.select("corpus_id", F.col(f"b{t}").alias("__bk"))
        p_t = a.join(c, "__bk").select("batch_id", "corpus_id")
        cand = p_t if cand is None else cand.unionByName(p_t)
    cand = cand.distinct()
    va = bb.select("batch_id", F.col("v").alias("va"),
                   F.col("nrm").alias("na"))
    vb = cb.select("corpus_id", F.col("v").alias("vb"),
                   F.col("nrm").alias("nb"))
    sims = (cand.join(va, "batch_id").join(vb, "corpus_id")
            .withColumn("__s", F.round(
                F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), "
                       "CAST(0 AS DOUBLE), (acc, p) -> acc + p)")
                / (F.col("na") * F.col("nb")), round_to)))
    mx = sims.groupBy("batch_id").agg(F.max("__s").alias("max_sim"))
    # explicit NULL guard: greatest() SKIPS nulls in both engines, so
    # without it a no-candidate row would read as novelty 1.0 instead
    # of "no evidence"
    nov = F.when(F.col("max_sim").isNull(), F.lit(None).cast("double")) \
        .otherwise(F.round(
            F.lit(1.0) - F.greatest(F.col("max_sim"), F.lit(0.0)),
            round_to))
    return (batch.select(F.col(id_col).alias("batch_id")).distinct()
            .join(mx, "batch_id", "left")
            .select("batch_id", "max_sim", nov.alias("novelty")))


def rrf_fusion(rankings: list, query_col: str = "query_id",
               item_col: str = "item_id", rank_col: str = "rnk",
               k_const: int = 60, k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion of N ranked retrieval lists (Cormack &
    Clarke 2009): ``score(item) = Σ_lists 1/(k_const + rank)`` — the
    standard hybrid-search combiner (BM25 + dense cosine is the
    canonical pair) a retrieval-curation pipeline uses so neither
    retriever's score scale has to be calibrated against the other's.

    Inputs: DataFrames each holding ``(query_col, item_col,
    rank_col)`` — typically the top-k outputs of
    :func:`~rainforest_spark.operators.text_analysis.bm25_topk` and
    :func:`cosine_topk`.  An item absent from a list simply
    contributes 0 for that list.

    Exactness: every contribution is ``1/(k_const + r)`` — one double
    division of integers — and the fused score is a FIXED left-to-right
    sum over the (ordered, small) list slots, not an aggregation, so
    partial-agg order cannot perturb it; both engines evaluate the
    identical tree.  Ties rank on the item id ascending.

    Shape at 100 TB: the inputs are already top-k lists — a few rows
    per query by construction — so the outer joins and the final
    per-query rank window run on k·|queries| rows, never the corpus;
    the heavy lifting happened inside the retrievers.
    """
    from functools import reduce

    from pyspark.sql import Window

    if not rankings:
        raise ValueError("rrf_fusion needs at least one ranked list")
    norm = [r.select(F.col(query_col).alias("__q"),
                     F.col(item_col).alias("__i"),
                     F.col(rank_col).alias(f"__r{j}"))
            for j, r in enumerate(rankings)]
    joined = reduce(lambda a, b: a.join(b, ["__q", "__i"], "full_outer"),
                    norm)
    contrib = [F.coalesce(F.lit(1.0)
                          / (F.lit(float(k_const)) + F.col(f"__r{j}")),
                          F.lit(0.0))
               for j in range(len(norm))]
    score = reduce(lambda a, b: a + b, contrib)
    w = Window.partitionBy("__q").orderBy(
        F.col("rrf_score").desc(), F.col("__i").asc())
    return (joined.withColumn("rrf_score", score)
            .withColumn("fused_rnk", F.row_number().over(w))
            .filter(F.col("fused_rnk") <= k)
            .select(F.col("__q").alias(query_col),
                    F.col("fused_rnk").cast("long").alias("fused_rnk"),
                    F.col("__i").alias(item_col), "rrf_score"))


def embedding_covariance(vectors: DataFrame, vec_col: str,
                         dim: int) -> DataFrame:
    """Upper-triangle covariance + correlation matrix of the embedding
    dimensions — the collinearity/whitening audit run before picking
    LSH planes, IVF dims, or a JL target size (a dimension pair with
    |corr| ≈ 1 wastes index bits; a near-zero-variance dimension is
    dead weight in every distance).

    Returns one row per ``i <= j`` pair: ``i``, ``j``, ``n``, ``cov``
    (sample covariance, n−1 denominator), ``corr`` (NULL when either
    variance is 0 or n < 2).

    EXACT: each per-row product ``x_i·x_j`` and element ``x_i`` is a
    pure double expression quantized ONCE to integer nanos
    (``floor(x·1e9 + 0.5)`` — the hot-path idiom), summed as
    DECIMAL(38,0); cov/corr are fixed IEEE double trees over those
    exact sums — no rounding step is needed at all, because no
    engine-divergent operation remains.

    Shape at 100 TB: the pair terms build IN-EXPRESSION (a flattened
    transform over ``sequence`` — no self-join, no fan-out join) and
    feed ONE map-side-combined groupBy on the d(d+1)/2 pair dim;
    marginal sums are a second slim map-side pass (d keys).  Compute
    is O(N·d²) — for d in the thousands run the same reduction as a
    numpy Gram accumulation per Arrow batch (mapInPandas) and keep
    this expression form as the oracle-pairable reference.
    """
    d = int(dim)
    v = F.col(vec_col)
    pairs = F.flatten(F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.transform(
            F.sequence(i, F.lit(d - 1)),
            lambda j: F.struct(
                i.alias("i"), j.alias("j"),
                F.floor(F.element_at(v, i + 1).cast("double")
                        * F.element_at(v, j + 1).cast("double")
                        * F.lit(1e9) + F.lit(0.5)).cast("long")
                .alias("pn")))))
    pair_sums = (vectors.select(F.explode(pairs).alias("p"))
                 .groupBy(F.col("p.i").alias("i"),
                          F.col("p.j").alias("j"))
                 .agg(F.count(F.lit(1)).cast("long").alias("n"),
                      F.sum(F.col("p.pn").cast("decimal(38,0)"))
                      .alias("__sp")))
    elems = F.transform(
        F.sequence(F.lit(0), F.lit(d - 1)),
        lambda i: F.struct(
            i.alias("i"),
            F.floor(F.element_at(v, i + 1).cast("double")
                    * F.lit(1e9) + F.lit(0.5)).cast("long")
            .alias("xn")))
    dim_sums = (vectors.select(F.explode(elems).alias("e"))
                .groupBy(F.col("e.i").alias("di"))
                .agg(F.sum(F.col("e.xn").cast("decimal(38,0)"))
                     .alias("__sx")))
    si = dim_sums.select(F.col("di").alias("__ii"),
                         F.col("__sx").alias("__si"))
    sj = dim_sums.select(F.col("di").alias("__jj"),
                         F.col("__sx").alias("__sj"))
    out = (pair_sums
           .join(F.broadcast(si), F.col("i") == F.col("__ii"))
           .join(F.broadcast(sj), F.col("j") == F.col("__jj")))
    nd = F.col("n").cast("double")
    cov = F.when(
        F.col("n") > 1,
        (F.col("__sp").cast("double") / F.lit(1e9)
         - (F.col("__si").cast("double") / F.lit(1e9))
         * (F.col("__sj").cast("double") / F.lit(1e9)) / nd)
        / (nd - F.lit(1.0)))
    out = out.withColumn("cov", cov)
    # correlation needs the two variances — the diagonal of the same
    # table, joined back broadcast (d rows)
    diag = (out.filter(F.col("i") == F.col("j"))
            .select(F.col("i").alias("__dk"),
                    F.col("cov").alias("__var")))
    vi = diag.select(F.col("__dk").alias("__vi_k"),
                     F.col("__var").alias("__vi"))
    vj = diag.select(F.col("__dk").alias("__vj_k"),
                     F.col("__var").alias("__vj"))
    out = (out.join(F.broadcast(vi), F.col("i") == F.col("__vi_k"))
           .join(F.broadcast(vj), F.col("j") == F.col("__vj_k")))
    corr = F.when((F.col("__vi") > 0) & (F.col("__vj") > 0),
                  F.col("cov") / F.sqrt(F.col("__vi") * F.col("__vj")))
    return (out.select(F.col("i").cast("long").alias("i"),
                       F.col("j").cast("long").alias("j"),
                       "n", "cov", corr.alias("corr"))
            .orderBy("i", "j"))


def gram_accumulate(vectors: DataFrame, vec_col: str,
                    dim: int) -> DataFrame:
    """The LARGE-d scale path for :func:`embedding_covariance`'s
    reduction: per-Arrow-batch numpy ``Xᵀ·X`` / ``ΣX`` accumulation in
    ``mapInPandas`` (one d×d float64 Gram per batch instead of N·d²
    exploded rows), combined by a final d²-key groupBy.  Returns
    ``(i, j, n, sum_prod, sum_i_elems?)`` — upper triangle, raw double
    sums (NOT nano-quantized: this is the throughput path; bit-exact
    cross-engine pairing is what :func:`embedding_covariance` is for).
    Tested equal to the exact form within float tolerance.
    """
    import pandas as pd

    d = int(dim)
    iu0, iu1 = _np.triu_indices(d)

    def part(batches):
        g = _np.zeros((d, d), dtype=_np.float64)
        s = _np.zeros(d, dtype=_np.float64)
        n = 0
        for b in batches:
            if len(b) == 0:
                continue
            x = _np.stack(b[vec_col].to_numpy()).astype(_np.float64)
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        yield pd.DataFrame({
            "i": iu0.astype("int64"), "j": iu1.astype("int64"),
            "n": _np.full(len(iu0), n, dtype="int64"),
            "sp": g[iu0, iu1],
            "si": s[iu0], "sj": s[iu1]})

    parts = vectors.select(vec_col).mapInPandas(
        part, "i long, j long, n long, sp double, si double, sj double")
    return (parts.groupBy("i", "j")
            .agg(F.sum("n").alias("n"), F.sum("sp").alias("sum_prod"),
                 F.sum("si").alias("sum_i"), F.sum("sj").alias("sum_j"))
            .orderBy("i", "j"))
