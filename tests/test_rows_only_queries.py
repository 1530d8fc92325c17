"""Rows-only workload entries (no SQL oracle): run at sf0.01 and check
rows/schema stability — exactly the driver's weaker check, plus
determinism across two runs where cheap."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from rainforest_spark.workload import all_oracles, all_queries

ROWS_ONLY = sorted(set(all_queries()) - set(all_oracles()))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = all_queries()[name](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(pdf) > 0, f"{name} returned no rows"
    assert len(pdf.columns) > 0


def test_simhash_deterministic(spark):
    q = all_queries()["q46_simhash"]
    a = q(spark, SF_DIR).toPandas().sort_values("doc_id", ignore_index=True)
    b = q(spark, SF_DIR).toPandas().sort_values("doc_id", ignore_index=True)
    assert a.equals(b)


def test_ann_recall_vs_exact(spark):
    """LSH-ANN neighbours must be a plausible subset: every returned
    neighbour's similarity must match the exact top-k computation for
    that pair (correct scores, possibly fewer pairs)."""
    from pyspark.sql import functions as F

    from rainforest_spark.operators.similarity import cosine_topk

    ann = all_queries()["q47_ann_lsh_topk"](spark, SF_DIR).toPandas()
    exact = cosine_topk(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "vec_id", "embedding", F.col("vec_id") < 20, k=500).toPandas()
    merged = ann.merge(exact, on=["query_id", "neighbor_id"],
                       suffixes=("_ann", "_exact"))
    assert len(merged) == len(ann), "ANN returned a pair exact scoring lacks"
    assert (merged["sim_ann"] == merged["sim_exact"]).all()
