"""Stateful prev-frame streaming: state carries across micro-batches AND
across query restarts (checkpoint), mirroring the reference's .npy
daemon state."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

SCHEMA = "TIMESTAMP bigint, x_idx int, y_idx int, rain_rate double"


def _frame(ts, vals):
    return pd.DataFrame({
        "TIMESTAMP": np.int64(ts),
        "x_idx": np.int32([p[0] for p in vals]),
        "y_idx": np.int32([p[1] for p in vals]),
        "rain_rate": [p[2] for p in vals]})


def _run_stream(spark, src, sink, ckpt):
    from rainforest_spark.streaming.stateful import two_frame_mean_stateful

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = two_frame_mean_stateful(stream)
    q = (out.writeStream.outputMode("append").format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)


def test_prev_frame_state_across_batches_and_restart(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)
    t0 = 1717200000
    _frame(t0, [(5, 5, 2.0), (6, 5, 4.0)]) \
        .to_parquet(f"{src}/f1.parquet", index=False)
    _frame(t0 + 300, [(5, 5, 6.0), (7, 5, 10.0)]) \
        .to_parquet(f"{src}/f2.parquet", index=False)
    _run_stream(spark, src, sink, ckpt)

    out = spark.read.parquet(sink).toPandas()
    key = out.set_index(["TIMESTAMP", "x_idx", "y_idx"])["rain_rate_2frame"]
    assert key[(t0, 5, 5)] == 2.0                   # no prev frame
    assert key[(t0 + 300, 5, 5)] == (6.0 + 2.0) / 2  # uses prev frame
    assert key[(t0 + 300, 7, 5)] == 10.0            # new pixel, no prev

    # restart: new files, same checkpoint — state must survive
    _frame(t0 + 600, [(5, 5, 8.0)]).to_parquet(f"{src}/f3.parquet",
                                               index=False)
    _run_stream(spark, src, sink, ckpt)
    out2 = spark.read.parquet(sink).toPandas()
    key2 = out2.set_index(["TIMESTAMP", "x_idx", "y_idx"])["rain_rate_2frame"]
    assert key2[(t0 + 600, 5, 5)] == (8.0 + 6.0) / 2  # prev from before restart


def test_permutation_importance_small(spark):
    from rainforest_spark.ml.rf import (
        RandomForestQPE, permutation_importance,
    )

    rng = np.random.RandomState(9)
    n = 800
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(0, 10, n)
    pdf = pd.DataFrame({"x1": x1, "x2": x2,
                        "y": 3 * x1 + rng.normal(0, 0.1, n)})
    df = spark.createDataFrame(pdf)
    model = RandomForestQPE(["x1", "x2"], target="y", num_trees=8,
                            max_depth=8).fit(df)
    imp = permutation_importance(df, model, ["x1", "x2"], "y")
    assert imp["x1"] > 10 * max(imp["x2"], 1e-9)  # x1 is the signal
