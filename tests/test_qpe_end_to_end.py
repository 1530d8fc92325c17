"""Full QPE chain: npz polar volumes → ingestion → masks → LUT join →
per-pixel composite → MLlib RF predict on grid features → dense map sink.

Mirrors the reference's e2e golden test shape (tests_ci/qpe/test_qpe.py:
14-46: grid (1,640,710) — 640 descending-northing rows × 710 easting
cols, >2 distinct values, time metadata)."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_qpe_end_to_end(spark, tmp_path):
    from rainforest_spark.grid.io import save_grid_npz
    from rainforest_spark.grid.lookup import polar_to_cart_lut
    from rainforest_spark.grid.qpe import (
        apply_polar_masks, polar_to_grid, rain_rate, vertical_composite,
    )
    from rainforest_spark.ml.rf import RandomForestQPE
    from rainforest_spark.sources.polar_ingest import (
        encode_volume_npz, read_polar_volumes,
    )
    from rainforest_spark.testing.fixtures import RADAR_XYZ

    # 1. drop-dir of two radars × two sweeps
    rng = np.random.RandomState(31)
    for radar in ("A", "D"):
        sweeps = {}
        for sw in (1, 3):
            zh = rng.uniform(5, 50, (90, 50))
            zh[rng.rand(90, 50) < 0.1] = np.nan  # masked gates
            sweeps[sw] = {"ZH": zh,
                          "ZV": zh - rng.uniform(0, 2, (90, 50)),
                          "VISIB": rng.uniform(30, 100, (90, 50))}
        (tmp_path / f"{radar}241530510.npz").write_bytes(
            encode_volume_npz(sweeps))

    # 2. ingest → masks → LUT → composite → rain rate
    polar = read_polar_volumes(spark, str(tmp_path))
    lut = polar_to_cart_lut(spark, {k: RADAR_XYZ[k] for k in ("A", "D")},
                            sweeps=[1, 3], n_az=90, n_rng=50)
    comp = vertical_composite(
        polar_to_grid(apply_polar_masks(polar), lut, ["zh_lin"]),
        ["zh_lin"], visib_col=None)
    grid = rain_rate(comp).withColumn(
        "zh_db", 10.0 * F.log10(F.col("zh_lin")))

    # 3. train a small RF on grid features with a synthetic known target,
    #    then batch-predict over the pixels (distributed transform)
    train = grid.dropna(subset=["rain_rate"]).withColumn(
        "target_mmh", F.col("rain_rate") * 1.1 + 0.05)
    model = RandomForestQPE(["zh_db", "w_total"], num_trees=8,
                            max_depth=8).fit(train)
    scored = model.transform(grid.dropna(subset=["rain_rate"]))
    pdf = scored.select("x_idx", "y_idx", "prediction_bc").toPandas()
    assert len(pdf) > 200
    # RF must track the synthetic relation closely
    truth = scored.select(
        F.sqrt(F.avg(F.pow(F.col("prediction_bc")
                           - (F.col("rain_rate") * 1.1 + 0.05), 2)))
        .alias("rmse"),
        F.stddev("rain_rate").alias("std")).collect()[0]
    assert truth.rmse < 0.5 * truth.std

    # 4. sink: dense map + metadata (reference golden shape)
    out = str(tmp_path / "qpe_map.npz")
    save_grid_npz(scored.withColumnRenamed("prediction_bc", "qpe"),
                  "qpe", out, timestamp=1717218600, quality="AD---")
    m = np.load(out)["data"]
    assert m.shape == (640, 710)
    assert len(np.unique(m[np.isfinite(m)])) > 2
    meta = json.load(open(out + ".json"))
    assert meta["shape"] == [1, 640, 710] and meta["quality"] == "AD---"
