"""Zero-dependency renderers for the plot-data jobs (reference
`common/graphics.py`, `performance/eval_plot.py`).

matplotlib is absent in this container (like PIL/pyart), so — in the
same spirit as the repo's own GIF87a/PNG/JPEG codecs — the figures are
produced with:

- **PNG** via `grid/png.encode_png_bytes` (RGB mode) for raster QPE
  maps, using a reimplementation of the reference's precipitation
  colormap semantics (`graphics.py:61` ``QPE_cmap`` + `:83` qpe_plot's
  linear-below / log-above ``transition`` value scaling);
- **SVG** (hand-written XML, stdlib only) for the vector figures: the
  per-intensity-bound score bar panels (`graphics.py:220` score_plot),
  the estimate-vs-reference density scatter (`graphics.py:301`
  qpe_scatterplot), and the per-station score map
  (`eval_plot.py:193` plotModelMapsSubplots).

Every renderer takes ALREADY-REDUCED rows (the `plots.data` outputs:
≤ bins² cells, models × bounds × scores bars, one row per station) —
pure driver-side formatting of engine-sized-down data, never a
data-sized loop.
"""

from __future__ import annotations

import math
from xml.sax.saxutils import escape

import numpy as np

#: QPE colormap control points — reimplemented from the published
#: MeteoSwiss palette (`graphics.py:68-74`): white → purple for drizzle,
#: then blue → green → yellow → red above the transition.
_QPE_COLORS = np.array([(255, 255, 255), (122, 1, 119), (43, 66, 181),
                        (67, 222, 139), (245, 245, 45), (252, 45, 45)],
                       dtype=np.float64)
_QPE_POS = np.array([0.0, 0.25, 0.251, 0.5, 0.75, 1.0])

#: default categorical palette for SVG series (own choice; the
#: reference hardcodes matplotlib's C0..C9 cycle + REFCOLORS letters)
PALETTE = ["#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#3ca951",
           "#ff8ab7", "#a463f2", "#97bbf5", "#9c6b4e", "#9498a0"]


def qpe_colormap(values: np.ndarray, vmin: float = 0.04,
                 vmax: float = 120.0,
                 transition: float = 10.0) -> np.ndarray:
    """float array (mm/h) → uint8 RGB via the reference's QPE scale:
    values in [vmin, transition] map LINEARLY onto the first half of
    the ramp, values in (transition, vmax] LOGARITHMICALLY onto the
    second half (`graphics.py:83` docstring: "for low precipitation it
    is linear whereas for high precipitation it is logarithmic"); below
    vmin renders white, NaN renders a neutral grey.
    """
    v = np.asarray(values, dtype=np.float64)
    t = np.zeros(v.shape, dtype=np.float64)
    low = (v >= vmin) & (v <= transition)
    t[low] = 0.5 * (v[low] - vmin) / (transition - vmin)
    high = v > transition
    vh = np.minimum(v[high], vmax)
    t[high] = 0.5 + 0.5 * (np.log10(vh) - math.log10(transition)) \
        / (math.log10(vmax) - math.log10(transition))
    rgb = np.empty(v.shape + (3,), dtype=np.float64)
    for ch in range(3):
        rgb[..., ch] = np.interp(t, _QPE_POS, _QPE_COLORS[:, ch])
    rgb[v < vmin] = 255.0
    rgb[~np.isfinite(v)] = 180.0
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def render_qpe_png(grid: np.ndarray, path: str | None = None,
                   vmin: float = 0.04, vmax: float = 120.0,
                   transition: float = 10.0, upscale: int = 1) -> bytes:
    """2-D precipitation grid → colormapped RGB PNG (`graphics.py:83`
    qpe_plot's raster, via the repo's own PNG encoder).  ``upscale``
    integer-replicates pixels for small demo grids.  Returns the bytes;
    also writes ``path`` when given."""
    from rainforest_spark.grid.png import encode_png_bytes
    rgb = qpe_colormap(grid, vmin, vmax, transition)
    if upscale > 1:
        rgb = np.repeat(np.repeat(rgb, upscale, axis=0), upscale, axis=1)
    buf = encode_png_bytes(rgb)
    if path:
        with open(path, "wb") as f:
            f.write(buf)
    return buf


# --------------------------------------------------------------- SVG
def _svg(width: int, height: int, body: list[str]) -> str:
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{height}" viewBox="0 0 {width} {height}" '
            f'font-family="sans-serif" font-size="10">\n'
            + "\n".join(body) + "\n</svg>\n")


def _text(x: float, y: float, s: str, anchor: str = "start",
          size: int = 10, extra: str = "") -> str:
    return (f'<text x="{x:.1f}" y="{y:.1f}" text-anchor="{anchor}" '
            f'font-size="{size}" {extra}>{escape(str(s))}</text>')


def _heat_color(frac: float) -> str:
    """0..1 → viridis-ish hex (own 5-stop ramp, dark→bright)."""
    stops = np.array([(68, 1, 84), (59, 82, 139), (33, 145, 140),
                      (94, 201, 98), (253, 231, 37)], dtype=np.float64)
    pos = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    f = min(max(frac, 0.0), 1.0)
    rgb = [int(round(np.interp(f, pos, stops[:, c]))) for c in range(3)]
    return "#{:02x}{:02x}{:02x}".format(*rgb)


def svg_scatter_density(cells, lo: float, hi: float, n_bins: int,
                        title: str = "", size: int = 360,
                        path: str | None = None) -> str:
    """`plots.data.scatter_density` rows (dicts/Rows with xbin, ybin,
    n) → one square density panel with the 1:1 diagonal
    (`graphics.py:301` qpe_scatterplot: hexbin + red y=x line).
    Counts are displayed on the log10 scale like ``bins='log'``."""
    m, pad = size, 42
    rows = [dict(r.asDict()) if hasattr(r, "asDict") else dict(r)
            for r in cells]
    body = [f'<rect x="{pad}" y="{pad}" width="{m}" height="{m}" '
            f'fill="white" stroke="#333"/>']
    if rows:
        nmax = max(math.log10(r["n"] + 1) for r in rows)
        cell = m / n_bins
        for r in rows:
            f = math.log10(r["n"] + 1) / nmax if nmax > 0 else 1.0
            x = pad + r["xbin"] * cell
            y = pad + m - (r["ybin"] + 1) * cell
            body.append(f'<rect x="{x:.2f}" y="{y:.2f}" '
                        f'width="{cell:.2f}" height="{cell:.2f}" '
                        f'fill="{_heat_color(f)}"/>')
    body.append(f'<line x1="{pad}" y1="{pad + m}" x2="{pad + m}" '
                f'y2="{pad}" stroke="red" stroke-width="1"/>')
    for frac in (0.0, 0.5, 1.0):
        val = lo + frac * (hi - lo)
        body.append(_text(pad + frac * m, pad + m + 14, f"{val:g}",
                          "middle"))
        body.append(_text(pad - 4, pad + m - frac * m + 3, f"{val:g}",
                          "end"))
    body.append(_text(pad + m / 2, pad + m + 30,
                      "Observation R [mm]", "middle"))
    body.append(_text(12, pad + m / 2, "Prediction R [mm]", "middle",
                      extra=f'transform="rotate(-90 12 {pad + m / 2})"'))
    if title:
        body.append(_text(pad + m / 2, pad - 10, title, "middle", 12))
    out = _svg(m + 2 * pad, m + 2 * pad, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def svg_score_panels(long_rows, title: str = "",
                     panel_w: int = 260, panel_h: int = 170,
                     path: str | None = None) -> str:
    """`plots.data.score_panel` long rows (model, bound, score, value)
    → one bar panel per bound, grouped bars per score colored by model,
    value labels on the bars (`graphics.py:220` score_plot +
    `:27` _autolabel)."""
    rows = [dict(r.asDict()) if hasattr(r, "asDict") else dict(r)
            for r in long_rows]
    rows = [r for r in rows if r.get("value") is not None]
    bounds = sorted({r["bound"] for r in rows})
    models = sorted({r["model"] for r in rows})
    scores = sorted({r["score"] for r in rows})
    color = {mdl: PALETTE[i % len(PALETTE)]
             for i, mdl in enumerate(models)}
    ncol = max(1, math.ceil(len(bounds) / 2))
    nrow = 2 if len(bounds) > 1 else 1
    pad, legend_w = 36, 110
    width = ncol * (panel_w + pad) + pad + legend_w
    height = nrow * (panel_h + pad + 28) + pad + 16
    body = []
    vmax = max((abs(r["value"]) for r in rows), default=1.0) or 1.0
    for bi, bound in enumerate(bounds):
        px = pad + (bi % ncol) * (panel_w + pad)
        py = pad + 16 + (bi // ncol) * (panel_h + pad + 28)
        base = py + panel_h / 2  # zero line mid-panel: scores go ±
        body.append(f'<rect x="{px}" y="{py}" width="{panel_w}" '
                    f'height="{panel_h}" fill="white" stroke="#333"/>')
        body.append(f'<line x1="{px}" y1="{base:.1f}" '
                    f'x2="{px + panel_w}" y2="{base:.1f}" '
                    f'stroke="#999" stroke-dasharray="3,3"/>')
        body.append(_text(px + panel_w / 2, py - 5,
                          f"bound = {bound}", "middle", 11))
        group_w = panel_w / max(1, len(scores))
        bar_w = max(2.0, group_w / (len(models) + 1))
        for si, s in enumerate(scores):
            gx = px + si * group_w
            body.append(_text(gx + group_w / 2, py + panel_h + 12, s,
                              "middle", 9))
            for mi, mdl in enumerate(models):
                v = next((r["value"] for r in rows
                          if r["bound"] == bound and r["score"] == s
                          and r["model"] == mdl), None)
                if v is None:
                    continue
                hgt = abs(v) / vmax * (panel_h / 2 - 14)
                by = base - hgt if v >= 0 else base
                bx = gx + (mi + 0.5) * bar_w
                body.append(f'<rect x="{bx:.1f}" y="{by:.1f}" '
                            f'width="{bar_w:.1f}" height="{hgt:.1f}" '
                            f'fill="{color[mdl]}"/>')
                ty = by - 2 if v >= 0 else by + hgt + 9
                body.append(_text(bx + bar_w / 2, ty, f"{v:.2f}",
                                  "middle", 7))
    lx = width - legend_w + 6
    for mi, mdl in enumerate(models):
        ly = pad + 16 + mi * 16
        body.append(f'<rect x="{lx}" y="{ly}" width="10" height="10" '
                    f'fill="{color[mdl]}"/>')
        body.append(_text(lx + 14, ly + 9, mdl))
    if title:
        body.append(_text(width / 2, 14, title, "middle", 13))
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def svg_station_map(rows, score: str, title: str = "", size: int = 420,
                    border: list[tuple[float, float]] | None = None,
                    path: str | None = None) -> str:
    """`plots.data.station_score_map` rows (model, station, X, Y,
    value) → one map panel per model, stations as circles colored by
    the score on a diverging-ish ramp (`eval_plot.py:193`
    plotModelMapsSubplots).  ``border``: optional (X, Y) polyline in
    the same coordinate system (the reference draws the Swiss border
    from its bundled shapefile — pass any polyline, or none)."""
    rws = [dict(r.asDict()) if hasattr(r, "asDict") else dict(r)
           for r in rows]
    rws = [r for r in rws if r.get("value") is not None]
    models = sorted({r["model"] for r in rws})
    pad = 40
    xs = [r["X"] for r in rws] + [p[0] for p in (border or [])]
    ys = [r["Y"] for r in rws] + [p[1] for p in (border or [])]
    if not xs:
        xs, ys = [0.0, 1.0], [0.0, 1.0]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    xr, yr = (x1 - x0) or 1.0, (y1 - y0) or 1.0
    vmax = max((abs(r["value"]) for r in rws), default=1.0) or 1.0

    def sx(x):
        return pad + (x - x0) / xr * size

    def sy(y):
        return pad + size - (y - y0) / yr * size

    width = pad + len(models) * (size + pad)
    body = []
    for mi, mdl in enumerate(models):
        ox = mi * (size + pad)
        body.append(f'<rect x="{pad + ox}" y="{pad}" width="{size}" '
                    f'height="{size}" fill="#f7f7f7" stroke="#333"/>')
        body.append(_text(pad + ox + size / 2, pad - 8,
                          f"{mdl} — {score}", "middle", 12))
        if border:
            pts = " ".join(f"{sx(p[0]) + ox:.1f},{sy(p[1]):.1f}"
                           for p in border)
            body.append(f'<polyline points="{pts}" fill="none" '
                        f'stroke="#555" stroke-width="1"/>')
        for r in rws:
            if r["model"] != mdl:
                continue
            f = 0.5 + 0.5 * r["value"] / vmax  # diverging around 0
            body.append(f'<circle cx="{sx(r["X"]) + ox:.1f}" '
                        f'cy="{sy(r["Y"]):.1f}" r="4" '
                        f'fill="{_heat_color(f)}" stroke="#333" '
                        f'stroke-width="0.4"/>')
    if title:
        body.append(_text(width / 2, 14, title, "middle", 13))
    out = _svg(width, size + 2 * pad, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def _rowdicts(rows) -> list[dict]:
    return [dict(r.asDict()) if hasattr(r, "asDict") else dict(r)
            for r in rows]


def svg_fit_metrics(rows, title: str = "", panel_w: int = 150,
                    panel_h: int = 100, path: str | None = None) -> str:
    """`plots.data.fit_metrics_panel` rows (precip, bound, score,
    value) → the reference's fit-metrics grid (`graphics.py:378`
    ``plot_fit_metrics``): one bar panel per (metric row, intensity-
    range column), bars = precip types, y-scale shared along each
    metric row, range labels on the bottom row, metric labels on the
    left column.  One figure per (aggregation, fraction) — filter the
    rows before rendering, title accordingly (the CLI does)."""
    rws = [r for r in _rowdicts(rows) if r.get("value") is not None]
    precips = sorted({r["model"] for r in rws})   # melted as model_col
    bounds = sorted({str(r["bound"]) for r in rws})
    metrics = sorted({r["score"] for r in rws})
    pad = 40
    width = pad + len(bounds) * (panel_w + 14) + 10
    height = pad + len(metrics) * (panel_h + 14) + 30
    body = []
    for mi, metric in enumerate(metrics):
        mvals = [abs(r["value"]) for r in rws if r["score"] == metric]
        vmax = max(mvals, default=1.0) or 1.0
        py = pad + mi * (panel_h + 14)
        body.append(_text(pad - 6, py + panel_h / 2, metric, "middle",
                          9, extra=f'transform="rotate(-90 '
                                   f'{pad - 6} {py + panel_h / 2})"'))
        for bi, bound in enumerate(bounds):
            px = pad + bi * (panel_w + 14)
            body.append(f'<rect x="{px}" y="{py}" width="{panel_w}" '
                        f'height="{panel_h}" fill="white" '
                        f'stroke="#333"/>')
            base = py + panel_h / 2
            body.append(f'<line x1="{px}" y1="{base:.1f}" '
                        f'x2="{px + panel_w}" y2="{base:.1f}" '
                        f'stroke="#ccc" stroke-dasharray="2,2"/>')
            bar_w = panel_w / max(1, len(precips)) * 0.6
            for pi, p in enumerate(precips):
                v = next((r["value"] for r in rws
                          if r["score"] == metric
                          and str(r["bound"]) == bound
                          and r["model"] == p), None)
                if v is None:
                    continue
                hgt = abs(v) / vmax * (panel_h / 2 - 8)
                by = base - hgt if v >= 0 else base
                bx = px + (pi + 0.5) * panel_w / len(precips) - bar_w / 2
                body.append(f'<rect x="{bx:.1f}" y="{by:.1f}" '
                            f'width="{bar_w:.1f}" height="{hgt:.1f}" '
                            f'fill="{PALETTE[pi % len(PALETTE)]}"/>')
                if mi == len(metrics) - 1:
                    body.append(_text(bx + bar_w / 2, py + panel_h + 10,
                                      p, "middle", 8))
            if mi == len(metrics) - 1:
                body.append(_text(px + panel_w / 2, py + panel_h + 22,
                                  bound, "middle", 9))
    if title:
        body.append(_text(width / 2, 14, title, "middle", 12))
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def svg_crossval_stats(rows, title: str = "", panel_w: int = 420,
                       panel_h: int = 150,
                       path: str | None = None) -> str:
    """`plots.data.crossval_stats_panel` rows (model, phase, score,
    mean, std) → the reference's cross-validation figure
    (`graphics.py:424` ``plot_crossval_stats``): one panel per precip
    phase stacked vertically, grouped bars per score colored by model,
    ±std error whiskers, value labels (`graphics.py:27` _autolabel),
    model legend.  One figure per (timeagg, bound) — filter first (the
    CLI does)."""
    rws = [r for r in _rowdicts(rows) if r.get("mean") is not None]
    models = sorted({r["model"] for r in rws})
    phases = sorted({str(r.get("phase", "all")) for r in rws})
    scores = sorted({r["score"] for r in rws})
    color = {m: PALETTE[i % len(PALETTE)] for i, m in enumerate(models)}
    pad, legend_w = 40, 120
    width = pad * 2 + panel_w + legend_w
    height = pad + len(phases) * (panel_h + pad) + 10
    vmax = max((abs(r["mean"]) + (r.get("std") or 0.0) for r in rws),
               default=1.0) or 1.0
    body = []
    for fi, ph in enumerate(phases):
        py = pad + fi * (panel_h + pad)
        body.append(f'<rect x="{pad}" y="{py}" width="{panel_w}" '
                    f'height="{panel_h}" fill="white" stroke="#333"/>')
        base = py + panel_h / 2
        body.append(f'<line x1="{pad}" y1="{base:.1f}" '
                    f'x2="{pad + panel_w}" y2="{base:.1f}" '
                    f'stroke="#999" stroke-dasharray="3,3"/>')
        body.append(_text(pad - 6, py + panel_h / 2,
                          f"precip: {ph}", "middle", 9,
                          extra=f'transform="rotate(-90 {pad - 6} '
                                f'{py + panel_h / 2})"'))
        group_w = panel_w / max(1, len(scores))
        bar_w = max(2.0, group_w / (len(models) + 1))
        for si, s in enumerate(scores):
            gx = pad + si * group_w
            body.append(_text(gx + group_w / 2, py + panel_h + 12, s,
                              "middle", 8))
            for mi, m in enumerate(models):
                row = next((r for r in rws
                            if str(r.get("phase", "all")) == ph
                            and r["score"] == s and r["model"] == m),
                           None)
                if row is None:
                    continue
                v, sd = row["mean"], row.get("std") or 0.0
                hgt = abs(v) / vmax * (panel_h / 2 - 12)
                by = base - hgt if v >= 0 else base
                bx = gx + (mi + 0.5) * bar_w
                cx = bx + bar_w / 2
                body.append(f'<rect x="{bx:.1f}" y="{by:.1f}" '
                            f'width="{bar_w:.1f}" height="{hgt:.1f}" '
                            f'fill="{color[m]}"/>')
                if sd > 0:   # ±std whisker through the bar tip
                    tip = base - hgt if v >= 0 else base + hgt
                    werr = sd / vmax * (panel_h / 2 - 12)
                    body.append(f'<line x1="{cx:.1f}" '
                                f'y1="{tip - werr:.1f}" x2="{cx:.1f}" '
                                f'y2="{tip + werr:.1f}" stroke="#333" '
                                f'stroke-width="0.8" class="whisker"/>')
                ty = by - 2 if v >= 0 else by + hgt + 8
                body.append(_text(cx, ty, f"{v:.2f}", "middle", 6))
    lx = width - legend_w + 6
    for mi, m in enumerate(models):
        ly = pad + mi * 16
        body.append(f'<rect x="{lx}" y="{ly}" width="10" height="10" '
                    f'fill="{color[m]}"/>')
        body.append(_text(lx + 14, ly + 9, m))
    if title:
        body.append(_text(width / 2, 14, title, "middle", 12))
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def svg_model_maps(rows, score: str, title: str = "", size: int = 300,
                   ncols: int = 3,
                   border: list[tuple[float, float]] | None = None,
                   path: str | None = None) -> str:
    """`plots.data.station_score_map` rows (model, station, X, Y,
    value) → the reference's multi-model score-map GRID
    (`eval_plot.py:193` ``plotModelMapsSubplots``): one map subplot per
    model laid out in ``ncols`` columns, (a)/(b)/… panel labels, shared
    axes extent and color scale, one shared horizontal colorbar at the
    bottom (the reference's ``subplot2grid`` + shared-norm setup).
    ``svg_station_map`` remains the single-strip variant."""
    rws = [r for r in _rowdicts(rows) if r.get("value") is not None]
    models = sorted({r["model"] for r in rws})
    nc = max(1, min(ncols, len(models) or 1))
    nr = max(1, math.ceil((len(models) or 1) / nc))
    pad, bar_h = 40, 36
    xs = [r["X"] for r in rws] + [p[0] for p in (border or [])]
    ys = [r["Y"] for r in rws] + [p[1] for p in (border or [])]
    if not xs:
        xs, ys = [0.0, 1.0], [0.0, 1.0]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    xr, yr = (x1 - x0) or 1.0, (y1 - y0) or 1.0
    vmax = max((abs(r["value"]) for r in rws), default=1.0) or 1.0
    width = pad + nc * (size + pad)
    height = pad + nr * (size + pad) + bar_h + 24
    body = []
    for mi, mdl in enumerate(models):
        ox = pad + (mi % nc) * (size + pad)
        oy = pad + (mi // nc) * (size + pad)

        def sx(x):
            return ox + (x - x0) / xr * size

        def sy(y):
            return oy + size - (y - y0) / yr * size

        body.append(f'<rect x="{ox}" y="{oy}" width="{size}" '
                    f'height="{size}" fill="#f7f7f7" stroke="#333"/>')
        lab = chr(ord("a") + mi)
        body.append(_text(ox + 6, oy + 14, f"({lab}) {mdl}", "start",
                          11, extra='font-weight="bold"'))
        if border:
            pts = " ".join(f"{sx(p[0]):.1f},{sy(p[1]):.1f}"
                           for p in border)
            body.append(f'<polyline points="{pts}" fill="none" '
                        f'stroke="#555" stroke-width="1"/>')
        for r in rws:
            if r["model"] != mdl:
                continue
            f = 0.5 + 0.5 * r["value"] / vmax   # diverging around 0
            body.append(f'<circle cx="{sx(r["X"]):.1f}" '
                        f'cy="{sy(r["Y"]):.1f}" r="4" '
                        f'fill="{_heat_color(f)}" stroke="#333" '
                        f'stroke-width="0.4"/>')
    # shared horizontal colorbar (reference: one fig.colorbar for all)
    by = pad + nr * (size + pad)
    bw = width - 2 * pad
    nseg = 48
    for i in range(nseg):
        body.append(f'<rect x="{pad + i * bw / nseg:.1f}" y="{by}" '
                    f'width="{bw / nseg + 0.5:.1f}" height="12" '
                    f'fill="{_heat_color(i / (nseg - 1))}" '
                    f'class="cbar"/>')
    for frac, v in ((0.0, -vmax), (0.5, 0.0), (1.0, vmax)):
        body.append(_text(pad + frac * bw, by + 24, f"{v:.2g}",
                          "middle", 9))
    body.append(_text(width / 2, by + 35, score, "middle", 10))
    if title:
        body.append(_text(width / 2, 14, title, "middle", 13))
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


# ------------------------------------------------------- animated QPE
def qpe_gif_palette() -> bytes:
    """256-RGB-triple GIF palette for the QPE ramp: index 0 = below
    vmin (white), 1 = NaN/no-data (grey), 2..255 = the colormap at
    t = (i−2)/253.  The QPE colormap is one-dimensional, so a palette
    GIF loses nothing beyond the 254-step discretization — the same
    trade the reference's operational RZC products make by shipping
    DN-coded GIFs."""
    idx = np.arange(256, dtype=np.float64)
    t = np.clip((idx - 2.0) / 253.0, 0.0, 1.0)
    pal = np.empty((256, 3), dtype=np.uint8)
    for ch in range(3):
        pal[:, ch] = np.clip(np.rint(
            np.interp(t, _QPE_POS, _QPE_COLORS[:, ch])), 0, 255)
    pal[0] = (255, 255, 255)
    pal[1] = (180, 180, 180)
    return pal.tobytes()


def qpe_value_to_index(values: np.ndarray, vmin: float = 0.04,
                       vmax: float = 120.0,
                       transition: float = 10.0) -> np.ndarray:
    """float mm/h → uint8 palette index under the same linear-below /
    log-above scale as :func:`qpe_colormap` (0 below vmin, 1 NaN)."""
    v = np.asarray(values, dtype=np.float64)
    t = np.zeros(v.shape, dtype=np.float64)
    low = (v >= vmin) & (v <= transition)
    t[low] = 0.5 * (v[low] - vmin) / (transition - vmin)
    high = v > transition
    vh = np.minimum(v[high], vmax)
    t[high] = 0.5 + 0.5 * (np.log10(vh) - math.log10(transition)) \
        / (math.log10(vmax) - math.log10(transition))
    idx = (np.rint(t * 253.0) + 2.0).astype(np.uint8)
    idx[v < vmin] = 0
    idx[~np.isfinite(v)] = 1
    return idx


def render_qpe_gif(frames, path: str | None = None, vmin: float = 0.04,
                   vmax: float = 120.0, transition: float = 10.0,
                   upscale: int = 1) -> bytes:
    """QPE time series (list of 2-D grids, or a (t, h, w) array) →
    animated GIF89a via the repo's own encoder — the matplotlib-free
    counterpart of `eval_plot.py:276` ``plotQPEMaps``' per-timestep
    map sequence."""
    from rainforest_spark.grid.gif import encode_gif_frames
    seq = [qpe_value_to_index(f, vmin, vmax, transition)
           for f in (frames if isinstance(frames, list) else list(frames))]
    if upscale > 1:
        seq = [np.repeat(np.repeat(f, upscale, 0), upscale, 1)
               for f in seq]
    buf = encode_gif_frames(seq, qpe_gif_palette())
    if path:
        with open(path, "wb") as f:
            f.write(buf)
    return buf
