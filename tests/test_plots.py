"""Plotting layer (reference common/graphics.py, performance/
eval_plot.py): engine-side plot-data jobs + zero-dep SVG/PNG renderers.
"""

import math
import xml.etree.ElementTree as ET

import numpy as np
import pytest
from pyspark.sql import functions as F

from rainforest_spark.plots import (qpe_colormap, render_qpe_png,
                                    scatter_density, score_panel,
                                    station_score_map,
                                    svg_scatter_density,
                                    svg_score_panels, svg_station_map)


# ------------------------------------------------------------ colormap
def test_qpe_colormap_anchors():
    """Reference QPE scale semantics (graphics.py:61-101): white below
    vmin, purple at the linear-segment midpoint, green at the
    transition, red at vmax, grey for NaN."""
    v = np.array([0.0, 0.02, (0.04 + 10.0) / 2, 10.0, 120.0, np.nan])
    rgb = qpe_colormap(v, vmin=0.04, vmax=120.0, transition=10.0)
    assert rgb.shape == (6, 3)
    assert tuple(rgb[0]) == (255, 255, 255)       # zero: white
    assert tuple(rgb[1]) == (255, 255, 255)       # below vmin: white
    assert tuple(rgb[2]) == (122, 1, 119)         # t=0.25: purple
    assert tuple(rgb[3]) == (67, 222, 139)        # transition: green
    assert tuple(rgb[4]) == (252, 45, 45)         # vmax: red
    assert tuple(rgb[5]) == (180, 180, 180)       # NaN: grey


def test_qpe_colormap_linear_then_log():
    """Below the transition the ramp position is linear in v; above it
    is linear in log10(v) (graphics.py:83 docstring)."""
    def pos(v):
        rgb = qpe_colormap(np.array([v]), 0.04, 120.0, 10.0)[0]
        # invert via the blue channel on the purple→blue segment and
        # the green→red half: just check monotone + midpoint algebra
        return rgb

    # linear: value midway between vmin and transition hits t=0.25
    assert tuple(pos((0.04 + 10.0) / 2)) == (122, 1, 119)
    # log: value at sqrt(10*120) (log-midpoint) hits t=0.75 → yellow
    assert tuple(pos(math.sqrt(10.0 * 120.0))) == (245, 245, 45)


def test_render_qpe_png_roundtrip(tmp_path):
    """The rendered map decodes with the repo's own PNG decoder; the
    decoder collapses RGB to ITU-601 luminance, so assert the decoded
    luminance equals the formula applied to the colormap output."""
    from rainforest_spark.grid.png import decode_png_bytes

    grid = np.array([[0.0, 5.0], [50.0, float("nan")]])
    p = tmp_path / "qpe.png"
    buf = render_qpe_png(grid, str(p), upscale=3)
    assert p.read_bytes() == buf
    lum = decode_png_bytes(buf)
    assert lum.shape == (6, 6)
    rgb = qpe_colormap(grid)
    want = ((rgb[..., 0].astype(int) * 299 + rgb[..., 1].astype(int) * 587
             + rgb[..., 2].astype(int) * 114) // 1000)
    assert np.array_equal(lum, np.repeat(np.repeat(want, 3, 0), 3, 1))


# ------------------------------------------------------ data: binning
def test_scatter_density_matches_numpy(spark):
    rng = np.random.RandomState(7)
    ref = rng.uniform(0, 20, 500)
    est = ref * rng.uniform(0.5, 1.5, 500)
    df = spark.createDataFrame(
        [(float(r), float(e)) for r, e in zip(ref, est)],
        "ref double, est double")
    got = scatter_density(df, "est", "ref", lo=0.0, hi=20.0,
                          n_bins=10).collect()
    h, _, _ = np.histogram2d(ref, est, bins=10, range=[[0, 20], [0, 20]])
    # numpy's last bin is closed [*, 20]; drop the boundary pairs it
    # counts that the half-open engine job excludes
    mask = (ref < 20) & (est < 20)
    h, _, _ = np.histogram2d(ref[mask], est[mask], bins=10,
                             range=[[0, 20], [0, 20]])
    want = {(x, y): int(h[x, y]) for x in range(10) for y in range(10)
            if h[x, y] > 0}
    assert {(r["xbin"], r["ybin"]): r["n"] for r in got} == want
    # cell lower edges are on the step grid
    assert all(r["x_lo"] == r["xbin"] * 2.0 for r in got)


def test_scatter_density_per_model_and_log(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0)] * 10 + [("b", 5.0, 5.0)],
        "model string, ref double, est double")
    got = {(r["model"], r["xbin"], r["ybin"]): (r["n"], r["log10_n"])
           for r in scatter_density(df, "est", "ref", 0.0, 10.0, 10,
                                    model_col="model",
                                    log_counts=True).collect()}
    assert got[("a", 1, 1)] == (10, 1.0)
    assert got[("b", 5, 5)] == (1, 0.0)


# -------------------------------------------------------- data: melt
def test_score_panel_melt(spark):
    scores = spark.createDataFrame(
        [("RF", "all", 100, 1.5, -0.2), ("RZC", "all", 100, 2.0, 0.4)],
        "model string, bound string, N long, RMSE double, "
        "logBias double")
    rows = score_panel(scores).collect()
    got = {(r["model"], r["score"]): r["value"] for r in rows}
    assert got == {("RF", "RMSE"): 1.5, ("RF", "logBias"): -0.2,
                   ("RZC", "RMSE"): 2.0, ("RZC", "logBias"): 0.4}
    assert all(r["N"] == 100 for r in rows)  # N kept, not melted


def test_station_score_map_join(spark):
    ss = spark.createDataFrame(
        [("RF", "OTL", 1.2), ("RF", None, 9.9)],
        "model string, station string, RMSE double")
    coords = spark.createDataFrame([("OTL", 700.0, 120.0)],
                                   "station string, X double, Y double")
    rows = station_score_map(ss, coords, "RMSE").collect()
    assert len(rows) == 1  # nationwide NULL-station row excluded
    r = rows[0]
    assert (r["model"], r["station"], r["X"], r["Y"], r["value"]) == \
        ("RF", "OTL", 700.0, 120.0, 1.2)


# ---------------------------------------------------------- renderers
def _parse(svg: str) -> ET.Element:
    return ET.fromstring(svg)


def test_svg_score_panels_structure(tmp_path):
    rows = [{"model": m, "bound": b, "score": s, "value": v}
            for m in ("RF", "RZC") for b in ("all", "0.0-2.0")
            for s, v in (("RMSE", 1.0), ("logBias", -0.3))]
    p = tmp_path / "scores.svg"
    svg = svg_score_panels(rows, title="demo & co", path=str(p))
    root = _parse(p.read_text())
    ns = "{http://www.w3.org/2000/svg}"
    bars = [e for e in root.iter(f"{ns}rect")]
    # 2 panel frames + 2 models × 2 bounds × 2 scores bars + 2 legend
    assert len(bars) == 2 + 8 + 2
    texts = [e.text for e in root.iter(f"{ns}text")]
    assert "demo & co" in texts and "RMSE" in texts


def test_svg_scatter_density_structure(tmp_path):
    cells = [{"xbin": 0, "ybin": 0, "n": 10},
             {"xbin": 5, "ybin": 5, "n": 1}]
    svg = svg_scatter_density(cells, 0.0, 20.0, 10,
                              path=str(tmp_path / "s.svg"))
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    # frame + 2 cells; one red 1:1 diagonal
    assert len(list(root.iter(f"{ns}rect"))) == 3
    lines = list(root.iter(f"{ns}line"))
    assert any(e.get("stroke") == "red" for e in lines)


def test_svg_station_map_structure():
    rows = [{"model": "RF", "station": "OTL", "X": 700.0, "Y": 120.0,
             "value": 1.0},
            {"model": "RZC", "station": "OTL", "X": 700.0, "Y": 120.0,
             "value": -1.0}]
    svg = svg_station_map(rows, "BIAS",
                          border=[(690.0, 110.0), (710.0, 130.0)])
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    assert len(list(root.iter(f"{ns}circle"))) == 2   # one per panel
    assert len(list(root.iter(f"{ns}polyline"))) == 2  # border per panel


def test_svg_empty_inputs_render():
    """Degenerate inputs must still produce parseable documents."""
    _parse(svg_score_panels([]))
    _parse(svg_scatter_density([], 0.0, 1.0, 4))
    _parse(svg_station_map([], "RMSE"))


# --------------------------------------------------------------- CLI
def test_cli_plot_end_to_end(spark, tmp_path):
    """plot scores + plot qpe-map from parquet inputs (the evaluate →
    plot user chain)."""
    import subprocess
    import sys

    scores = spark.createDataFrame(
        [("RF", "all", 50, 1.5, -0.2), ("RZC", "all", 50, 2.0, 0.4)],
        "model string, bound string, N long, RMSE double, "
        "logBias double")
    sp = tmp_path / "scores_pq"
    scores.write.parquet(str(sp))
    grid = spark.createDataFrame(
        [(x, y, float(x + y)) for x in range(4) for y in range(3)],
        "x_idx int, y_idx int, value double")
    gp = tmp_path / "grid_pq"
    grid.write.parquet(str(gp))

    out1 = tmp_path / "scores.svg"
    r1 = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "plot", "scores",
         str(sp), str(out1), "--title", "t"],
        capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    _parse(out1.read_text())

    out2 = tmp_path / "map.png"
    r2 = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "plot",
         "qpe-map", str(gp), str(out2), "--upscale", "2"],
        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    from rainforest_spark.grid.png import decode_png_bytes
    assert decode_png_bytes(out2.read_bytes()).shape == (6, 8)


# ------------------------------------------------------- animated QPE
def test_qpe_gif_palette_and_index():
    from rainforest_spark.plots import qpe_gif_palette, qpe_value_to_index

    pal = qpe_gif_palette()
    assert len(pal) == 768
    assert pal[0:3] == b"\xff\xff\xff"          # index 0: white
    assert pal[3:6] == b"\xb4\xb4\xb4"          # index 1: no-data grey
    assert pal[765:768] == bytes((252, 45, 45))  # index 255: red
    v = np.array([0.0, 0.02, 0.04, 5.0, 10.0, 60.0, 120.0, np.nan])
    idx = qpe_value_to_index(v)
    assert idx[0] == 0 and idx[1] == 0          # below vmin
    assert idx[7] == 1                          # NaN
    assert idx[2] == 2                          # vmin -> ramp start
    assert idx[6] == 255                        # vmax -> ramp end
    assert list(idx[2:7]) == sorted(idx[2:7])   # monotone in value


def test_render_qpe_gif_roundtrip(tmp_path):
    """Animated QPE maps (eval_plot.py:276 plotQPEMaps counterpart)
    round-trip through the repo's own GIF89a decoder: per-frame palette
    indices equal the direct discretization, palette preserved."""
    from rainforest_spark.grid.gif import decode_gif_frames_with_palettes
    from rainforest_spark.plots import (qpe_gif_palette,
                                        qpe_value_to_index,
                                        render_qpe_gif)

    f0 = np.array([[0.0, 1.0], [20.0, float("nan")]])
    f1 = np.array([[2.0, 0.0], [0.0, 80.0]])
    p = tmp_path / "movie.gif"
    buf = render_qpe_gif([f0, f1], str(p))
    assert p.read_bytes() == buf
    frames, pals = decode_gif_frames_with_palettes(buf)
    assert len(frames) == 2
    assert all(pal == qpe_gif_palette() for pal in pals)
    assert np.array_equal(frames[0], qpe_value_to_index(f0))
    assert np.array_equal(frames[1], qpe_value_to_index(f1))


def test_cli_plot_qpe_movie(spark, tmp_path):
    import subprocess
    import sys

    grid = spark.createDataFrame(
        [(t, x, y, float(t * 10 + x)) for t in range(3)
         for x in range(3) for y in range(2)],
        "timestep int, x_idx int, y_idx int, value double")
    gp = tmp_path / "grids_pq"
    grid.write.parquet(str(gp))
    out = tmp_path / "movie.gif"
    r = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "plot",
         "qpe-movie", str(gp), str(out)],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    from rainforest_spark.grid.gif import decode_gif_frames
    frames, _pal = decode_gif_frames(out.read_bytes())
    assert len(frames) == 3                 # one frame per timestep
    assert frames[0].shape == (2, 3)        # (h, w) logical screen


# --------------------------------------------- crossval-stats parity
def test_score_panel_over_intercomparison_shape(spark, tmp_path):
    """The reference's plot_crossval_stats (graphics.py:424) bar-plots
    the nested intercomparison dict; here the tidy intercomparison
    table melts through score_panel and renders — the same figure
    content from the engine-shaped data, no nested-dict reshaping."""
    rows = [(m, f, ta, ph, b, 100, rmse, lb)
            for m in ("RF", "RZC") for f in (0, 1)
            for ta, ph in (("10min", "all"), ("60min", "liquid"))
            for b, rmse, lb in (("all", 1.5, -0.2), ("0.0-2.0", 0.8, 0.1))]
    sc = spark.createDataFrame(
        rows, "model string, fold int, timeagg string, phase string, "
              "bound string, N long, RMSE double, logBias double")
    long = score_panel(sc)
    # every passthrough key survives the melt; scores go long
    assert {"model", "fold", "timeagg", "phase", "bound", "N",
            "score", "value"} <= set(long.columns)
    got = long.filter(
        (F.col("timeagg") == "10min") & (F.col("fold") == 0)).collect()
    assert {r["score"] for r in got} == {"RMSE", "logBias"}
    # one slice renders directly
    svg = svg_score_panels([r.asDict() for r in got],
                           title="crossval 10min fold 0",
                           path=str(tmp_path / "cv.svg"))
    _parse(svg)


def test_cli_plot_scatter_and_stations(spark, tmp_path):
    import subprocess
    import sys

    pairs = spark.createDataFrame(
        [(float(i % 7), float((i % 7) * 1.1)) for i in range(200)],
        "ref_mmh double, est_mmh double")
    pp = tmp_path / "pairs_pq"
    pairs.write.parquet(str(pp))
    out1 = tmp_path / "scatter.svg"
    r1 = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "plot",
         "scatter", str(pp), str(out1), "--lo", "0", "--hi", "10",
         "--bins", "20"],
        capture_output=True, text=True, timeout=300)
    assert r1.returncode == 0, r1.stderr[-2000:]
    _parse(out1.read_text())

    ss = spark.createDataFrame(
        [("RF", "OTL", 1.2), ("RF", "GVE", 0.8)],
        "model string, station string, RMSE double")
    sp = tmp_path / "ss_pq"
    ss.write.parquet(str(sp))
    coords = spark.createDataFrame(
        [("OTL", 700.0, 120.0), ("GVE", 500.0, 110.0)],
        "station string, X double, Y double")
    cp = tmp_path / "coords_pq"
    coords.write.parquet(str(cp))
    out2 = tmp_path / "stations.svg"
    r2 = subprocess.run(
        [sys.executable, "-m", "rainforest_spark.cli", "plot",
         "stations", str(sp), str(out2), "--stations", str(cp),
         "--score", "RMSE"],
        capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    root = _parse(out2.read_text())
    ns = "{http://www.w3.org/2000/svg}"
    assert len(list(root.iter(f"{ns}circle"))) == 2


def test_data_api_input_validation(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "ref double, est double")
    with pytest.raises(ValueError, match="hi > lo"):
        scatter_density(df, "est", "ref", lo=5.0, hi=5.0, n_bins=10)
    only_keys = spark.createDataFrame([("RF", "all")],
                                      "model string, bound string")
    with pytest.raises(ValueError, match="no numeric score columns"):
        score_panel(only_keys)


# ------------------------- round-8: the three residual figure types

def test_fit_metrics_panel_melt(spark):
    from rainforest_spark.plots import fit_metrics_panel
    df = spark.createDataFrame(
        [("test", "solid", "all", 1.2, -0.1),
         ("test", "liquid", "all", 0.8, 0.2),
         ("train", "solid", "0.0-2.0", 1.0, 0.0)],
        "fraction string, precip string, bound string, "
        "RMSE double, logBias double")
    rows = fit_metrics_panel(df).collect()
    # 3 input rows x 2 metrics, keys pass through
    assert len(rows) == 6
    got = {(r["fraction"], r["model"], r["bound"], r["score"]): r["value"]
           for r in rows}
    assert got[("test", "solid", "all", "RMSE")] == 1.2
    assert got[("train", "solid", "0.0-2.0", "logBias")] == 0.0


def test_crossval_stats_panel_melt(spark):
    from rainforest_spark.plots import crossval_stats_panel
    df = spark.createDataFrame(
        [("RF", "10min", "liquid", "all", 1.1, 0.2, 0.9, 0.05, 100),
         ("RZC", "10min", "liquid", "all", 1.4, 0.3, 0.8, 0.04, 100)],
        "model string, timeagg string, phase string, bound string, "
        "RMSE_mean double, RMSE_std double, corr_p_mean double, "
        "corr_p_std double, N_total long")
    rows = crossval_stats_panel(df).collect()
    assert len(rows) == 4     # 2 models x 2 score pairs
    got = {(r["model"], r["score"]): (r["mean"], r["std"]) for r in rows}
    assert got[("RF", "RMSE")] == (1.1, 0.2)
    assert got[("RZC", "corr_p")] == (0.8, 0.04)
    with pytest.raises(ValueError):
        crossval_stats_panel(df.select("model", "timeagg")).collect()


def test_svg_fit_metrics_structure(tmp_path):
    from rainforest_spark.plots import svg_fit_metrics
    rows = [{"model": p, "bound": b, "score": s, "value": v}
            for p in ("solid", "liquid", "all")
            for b in ("all", "0.0-2.0")
            for s, v in (("RMSE", 1.0), ("logBias", -0.3))]
    p = tmp_path / "fit.svg"
    svg = svg_fit_metrics(rows, title="fraction=test", path=str(p))
    root = _parse(p.read_text())
    ns = "{http://www.w3.org/2000/svg}"
    rects = list(root.iter(f"{ns}rect"))
    # 2 metrics x 2 bounds panel frames + 3 precip bars per panel
    assert len(rects) == 4 + 12
    texts = [e.text for e in root.iter(f"{ns}text")]
    # metric row labels + precip tick labels + the suptitle
    assert {"RMSE", "logBias", "solid", "fraction=test"} <= set(texts)


def test_svg_crossval_stats_structure(tmp_path):
    from rainforest_spark.plots import svg_crossval_stats
    rows = [{"model": m, "phase": ph, "score": s, "mean": v, "std": sd}
            for m, v, sd in (("RF", 1.1, 0.2), ("RZC", 1.4, 0.0))
            for ph in ("liquid", "solid")
            for s in ("RMSE", "corr_p")]
    svg = svg_crossval_stats(rows, title="Agg: 10min",
                             path=str(tmp_path / "cv.svg"))
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    rects = list(root.iter(f"{ns}rect"))
    # 2 phase panels + 2x2x2 bars + 2 legend swatches
    assert len(rects) == 2 + 8 + 2
    # ±std whiskers only where std > 0: RF's 4 bars
    whiskers = [e for e in root.iter(f"{ns}line")
                if e.get("class") == "whisker"]
    assert len(whiskers) == 4


def test_svg_model_maps_structure(tmp_path):
    from rainforest_spark.plots import svg_model_maps
    rows = [{"model": m, "station": st, "X": x, "Y": y, "value": v}
            for m in ("RF", "RZC", "CPC", "AQC")
            for st, x, y, v in (("OTL", 700.0, 120.0, 1.0),
                                ("PAY", 560.0, 180.0, -0.5))]
    svg = svg_model_maps(rows, "BIAS", ncols=3,
                         border=[(500.0, 100.0), (750.0, 200.0)],
                         path=str(tmp_path / "maps.svg"))
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    assert len(list(root.iter(f"{ns}circle"))) == 8    # 2 per model
    assert len(list(root.iter(f"{ns}polyline"))) == 4  # border per panel
    texts = [e.text for e in root.iter(f"{ns}text")]
    # (a)..(d) labels in reading order + the shared colorbar caption
    assert any(t and t.startswith("(a) ") for t in texts)
    assert any(t and t.startswith("(d) ") for t in texts)
    assert "BIAS" in texts
    cbar = [e for e in root.iter(f"{ns}rect") if e.get("class") == "cbar"]
    assert len(cbar) == 48


def test_svg_residual_figures_empty_inputs():
    from rainforest_spark.plots import (svg_crossval_stats,
                                        svg_fit_metrics, svg_model_maps)
    _parse(svg_fit_metrics([]))
    _parse(svg_crossval_stats([]))
    _parse(svg_model_maps([], "RMSE"))


def test_cli_plot_residual_figures(spark, tmp_path):
    """fit-metrics / crossval / model-maps CLI kinds end-to-end from
    parquet inputs."""
    import subprocess
    import sys

    fit = str(tmp_path / "fit.parquet")
    spark.createDataFrame(
        [("10min", "test", "solid", "all", 1.2, -0.1),
         ("10min", "test", "liquid", "all", 0.8, 0.2),
         ("10min", "train", "solid", "all", 1.0, 0.0)],
        "aggregation string, fraction string, precip string, "
        "bound string, RMSE double, logBias double").write.parquet(fit)
    cv = str(tmp_path / "cv.parquet")
    spark.createDataFrame(
        [("RF", 0, "10min", "liquid", "all", 1.1, 0.1, 0.9, 50),
         ("RF", 1, "10min", "liquid", "all", 1.3, -0.1, 0.8, 60),
         ("RZC", 0, "10min", "liquid", "all", 1.5, 0.2, 0.7, 50),
         ("RZC", 1, "10min", "liquid", "all", 1.6, 0.0, 0.75, 60)],
        "model string, fold int, timeagg string, phase string, "
        "bound string, RMSE double, logBias double, corr_p double, "
        "N long").write.parquet(cv)
    st = str(tmp_path / "st.parquet")
    spark.createDataFrame(
        [("RF", "OTL", 1.0), ("RZC", "OTL", -0.5)],
        "model string, station string, RMSE double").write.parquet(st)
    dim = str(tmp_path / "dim.parquet")
    spark.createDataFrame([("OTL", 700.0, 120.0)],
                          "station string, X double, Y double") \
        .write.parquet(dim)

    def run(*argv):
        r = subprocess.run(
            [sys.executable, "-m", "rainforest_spark.cli", *argv],
            capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]

    o1 = str(tmp_path / "fit.svg")
    run("plot", "fit-metrics", fit, o1, "--fraction", "test",
        "--agg", "10min")
    t1 = _parse(open(o1).read())
    assert any(t and "fraction=test" in t for t in
               (e.text for e in t1.iter(
                   "{http://www.w3.org/2000/svg}text")))
    o2 = str(tmp_path / "cv.svg")
    run("plot", "crossval", cv, o2, "--timeagg", "10min",
        "--bound", "all")
    _parse(open(o2).read())
    o3 = str(tmp_path / "maps.svg")
    run("plot", "model-maps", st, o3, "--stations", dim,
        "--score", "RMSE")
    t3 = _parse(open(o3).read())
    assert len(list(t3.iter("{http://www.w3.org/2000/svg}circle"))) == 2
