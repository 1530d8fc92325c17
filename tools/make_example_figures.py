"""Regenerate the example figures in docs/figures/ from the sf0.01
testdata — proof-of-life for the matplotlib-free plotting layer
(plots/), reproducible with:

    python tools/make_example_figures.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(sf_dir: str = "/root/testdata/sf0.01",
         out_dir: str = "docs/figures") -> None:
    from pyspark.sql import functions as F

    from rainforest_spark.plots import (render_qpe_gif, render_qpe_png,
                                        scatter_density, score_panel,
                                        svg_scatter_density,
                                        svg_score_panels,
                                        svg_station_map)
    from rainforest_spark.session import get_spark

    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("example-figures")

    # score panels from a small literal score table (the evaluate /
    # intercompare output shape)
    scores = spark.createDataFrame(
        [("RF", "all", 1200, 0.92, -0.08, 0.71),
         ("RF", "0.0-2.0", 800, 0.55, -0.12, 0.52),
         ("RF", "2.0-10.0", 350, 1.31, -0.05, 0.63),
         ("RZC", "all", 1200, 1.35, 0.21, 0.64),
         ("RZC", "0.0-2.0", 800, 0.78, 0.25, 0.41),
         ("RZC", "2.0-10.0", 350, 1.90, 0.18, 0.55)],
        "model string, bound string, N long, RMSE double, "
        "logBias double, scatter double")
    svg_score_panels(score_panel(scores).collect(),
                     title="QPE verification scores (example)",
                     path=f"{out_dir}/score_panels.svg")

    # density scatter from the events fixture (q125's binning job)
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = e.select(
        F.col("value").alias("ref"),
        (F.col("value") * (F.lit(1.0)
         + ((F.col("user_id") % 5).cast("double") - F.lit(2.0))
         / F.lit(10.0))).alias("est"))
    cells = scatter_density(pairs, "est", "ref", lo=0.0, hi=480.0,
                            n_bins=60).collect()
    svg_scatter_density(cells, 0.0, 480.0, 60,
                        title="est vs ref density (example)",
                        path=f"{out_dir}/scatter_density.svg")

    # QPE map + movie from a synthetic storm-cell field
    yy, xx = np.mgrid[0:64, 0:96]
    frames = []
    for t in range(6):
        cx, cy = 20 + 9 * t, 28 + 3 * t
        cell = 60.0 * np.exp(-(((xx - cx) / 9.0) ** 2
                               + ((yy - cy) / 6.0) ** 2))
        band = 4.0 * np.exp(-((yy - 45 - 2 * np.sin(xx / 9.0 + t))
                              ** 2) / 18.0)
        g = cell + band
        g[g < 0.04] = 0.0
        frames.append(g)
    render_qpe_png(frames[2], f"{out_dir}/qpe_map.png", upscale=4)
    render_qpe_gif(frames, f"{out_dir}/qpe_movie.gif", upscale=4)

    # station score map
    rng = np.random.RandomState(7)
    rows = [{"model": m, "station": f"ST{i:02d}",
             "X": float(x), "Y": float(y),
             "value": float(v)}
            for m, sgn in (("RF", 0.6), ("RZC", 1.4))
            for i, (x, y) in enumerate(zip(rng.uniform(490, 830, 40),
                                           rng.uniform(80, 290, 40)))
            for v in [rng.randn() * sgn]]
    svg_station_map(rows, "BIAS", title="per-station bias (example)",
                    path=f"{out_dir}/station_map.svg")
    spark.stop()
    print(f"wrote 5 figures -> {out_dir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
