"""IVF ANN quality measurement (recall + list balance) at a data tier.

Answers the round-4 evidence gap: ``ivf_topk`` (KMeans codebook) and
``ivf_topk_fixed`` (fixed codebook) had recall tests at fixture size
only — no measurement of recall@k or inverted-list skew at sf0.1+.
Run:

    python -m rainforest_spark.tools.ivf_quality [sf_dir]

prints one JSON line per (variant, nprobe) with recall@k against the
exact ``cosine_topk`` ground truth, plus list-occupancy stats (max/mean
ratio is the skew number that matters at scale: the largest list bounds
the per-query scoring fan-out).  Results are recorded in PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
from pyspark.sql import functions as F


def recall_at_k(exact, approx, k: int) -> float:
    """Mean per-query |approx∩exact| / k (both topk frames)."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hit = e.join(a, on=["query_id", "neighbor_id"]).groupBy("query_id") \
        .agg(F.count(F.lit(1)).alias("h"))
    n_q = e.select("query_id").distinct().count()
    tot = hit.agg(F.sum("h")).collect()[0][0] or 0
    return float(tot) / (n_q * k)


def list_stats(counts: list[int]) -> dict:
    c = np.array(sorted(counts))
    return {"n_lists": len(c), "min": int(c.min()), "max": int(c.max()),
            "mean": round(float(c.mean()), 1),
            "max_over_mean": round(float(c.max() / c.mean()), 2)}


def main() -> None:
    from rainforest_spark.operators.similarity import (
        cosine_topk, ivf_topk, ivf_topk_fixed, with_double_vec, _dot,
    )
    from rainforest_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k, n_lists = 10, 16
    spark = get_spark("ivf-quality")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    step = max(n // 100, 1)                         # ~100 queries
    pred = F.col("vec_id") % step == 0
    exact = cosine_topk(emb, "vec_id", "embedding", pred, k=k) \
        .localCheckpoint()

    # fixed codebook: ids spread uniformly through the corpus
    ids = sorted(r[0] for r in emb.select("vec_id").collect())
    centroid_ids = [ids[(i * n) // n_lists] for i in range(n_lists)]

    results = []
    for nprobe in (1, 2, 4):
        for variant, fn in (
            ("fixed", lambda: ivf_topk_fixed(
                emb, "vec_id", "embedding", pred, centroid_ids,
                k=k, nprobe=nprobe)),
            ("kmeans", lambda: ivf_topk(
                emb, "vec_id", "embedding", pred, k=k,
                n_centroids=n_lists, nprobe=nprobe)),
        ):
            t0 = time.perf_counter()
            approx = fn().localCheckpoint()
            r = recall_at_k(exact, approx, k)
            r5 = recall_at_k(exact.filter(F.col("rnk") <= 5),
                             approx.filter(F.col("rnk") <= 5), 5)
            scan = nprobe / n_lists   # nominal candidate budget
            results.append({"variant": variant, "nprobe": nprobe,
                            "recall_at_10": round(r, 3),
                            "recall_at_5": round(r5, 3),
                            "scan_nominal": round(scan, 3),
                            "recall5_over_chance": round(r5 / scan, 2),
                            "wall_sec": round(time.perf_counter() - t0, 2)})

    # list balance — same assignment math as the operators
    v = with_double_vec(emb, "embedding", "v") \
        .select("vec_id", "v", _dot("v", "v").alias("aa"))
    cdf = (v.filter(F.col("vec_id").isin(centroid_ids))
           .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
                   F.col("aa").alias("cc")))
    d2 = F.round(F.col("aa") - 2 * _dot("v", "cv") + F.col("cc"), 6)
    fixed_counts = [r[1] for r in (
        v.crossJoin(F.broadcast(cdf)).withColumn("__d2", d2)
        .groupBy("vec_id")
        .agg(F.min(F.struct("__d2", "cid")).alias("m"))
        .groupBy("m.cid").count().collect())]

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = with_double_vec(emb, "embedding", "v") \
        .withColumn("__fv", array_to_vector("v"))
    model = KMeans(k=n_lists, seed=42, featuresCol="__fv",
                   predictionCol="__list").fit(feat)
    km_counts = [r[1] for r in model.transform(feat)
                 .groupBy("__list").count().collect()]

    print(json.dumps({
        "sf_dir": sf_dir, "n_vectors": n, "k": k, "n_lists": n_lists,
        "recall": results,
        "list_balance": {"fixed": list_stats(fixed_counts),
                         "kmeans": list_stats(km_counts)},
    }))


if __name__ == "__main__":
    main()
