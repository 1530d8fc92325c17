"""Evaluation / QPE plotting layer (reference `common/graphics.py`,
`performance/eval_plot.py`).

Spark-first split: everything that scales with the data — 2-D density
binning of (estimate, reference) pairs, score-table reshaping, station
aggregation — runs IN the engine (`plots.data`); the renderers
(`plots.render`) are pure-python (zero-dep SVG + the repo's own PNG
codec) and consume only the O(bins)/O(models×bounds)/O(stations) rows
those jobs return.  The reference collects the raw pairs to the driver
and lets matplotlib bin them (`graphics.py:301` hexbin) — at 100 TB
that is the part that must be distributed, so here it is.
"""

from rainforest_spark.plots.data import (crossval_stats_panel,
                                         fit_metrics_panel,
                                         scatter_density, score_panel,
                                         station_score_map)
from rainforest_spark.plots.render import (qpe_colormap, qpe_gif_palette,
                                           qpe_value_to_index,
                                           render_qpe_gif, render_qpe_png,
                                           svg_crossval_stats,
                                           svg_fit_metrics,
                                           svg_model_maps,
                                           svg_scatter_density,
                                           svg_score_panels,
                                           svg_station_map)

__all__ = [
    "crossval_stats_panel", "fit_metrics_panel",
    "scatter_density", "score_panel", "station_score_map",
    "qpe_colormap", "qpe_gif_palette", "qpe_value_to_index",
    "render_qpe_gif", "render_qpe_png", "svg_crossval_stats",
    "svg_fit_metrics", "svg_model_maps", "svg_scatter_density",
    "svg_score_panels", "svg_station_map",
]
