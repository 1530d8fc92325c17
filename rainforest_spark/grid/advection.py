"""Advection correction (SURVEY W11).

The reference estimates motion between two consecutive frames with
pysteps' Lucas-Kanade and resamples semi-Lagrangian
(qpe/qpe_utils.py:271-312).  pysteps is not available here; this module
implements the same two stages with plain numpy:

- ``estimate_motion``: global block-matching (phase of the
  cross-correlation argmax over a search window) — a coarse but
  deterministic stand-in for LK's mean motion field.
- ``advect``: semi-Lagrangian backward resample by the (dy, dx) vector
  with bilinear interpolation.

Like the reference, this runs at the frame boundary (driver-side on the
dense 640×710 map, ~1.2 MB) — motion estimation is inherently a
whole-frame operation and is NOT worth distributing per map.
"""

from __future__ import annotations

import numpy as np


def estimate_motion(prev: np.ndarray, cur: np.ndarray,
                    max_shift: int = 10) -> tuple[int, int]:
    """(dy, dx) maximizing correlation of cur against shifted prev."""
    p = np.nan_to_num(prev, nan=0.0)
    c = np.nan_to_num(cur, nan=0.0)
    p = p - p.mean()
    c = c - c.mean()
    best, best_score = (0, 0), -np.inf
    for dy in range(-max_shift, max_shift + 1):
        for dx in range(-max_shift, max_shift + 1):
            shifted = np.roll(np.roll(p, dy, axis=0), dx, axis=1)
            score = float((shifted * c).sum())
            if score > best_score:
                best_score, best = score, (dy, dx)
    return best


def advect(frame: np.ndarray, dy: float, dx: float) -> np.ndarray:
    """Semi-Lagrangian backward resample with bilinear interpolation."""
    ny, nx = frame.shape
    yy, xx = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    sy = yy - dy
    sx = xx - dx
    y0 = np.clip(np.floor(sy).astype(int), 0, ny - 2)
    x0 = np.clip(np.floor(sx).astype(int), 0, nx - 2)
    fy = np.clip(sy - y0, 0.0, 1.0)
    fx = np.clip(sx - x0, 0.0, 1.0)
    f = np.nan_to_num(frame, nan=0.0)
    out = ((1 - fy) * (1 - fx) * f[y0, x0]
           + (1 - fy) * fx * f[y0, x0 + 1]
           + fy * (1 - fx) * f[y0 + 1, x0]
           + fy * fx * f[y0 + 1, x0 + 1])
    oob = (sy < 0) | (sy > ny - 1) | (sx < 0) | (sx > nx - 1)
    out[oob] = np.nan
    return out


def advection_blend(prev: np.ndarray, cur: np.ndarray,
                    alpha: float = 0.5, max_shift: int = 10) -> np.ndarray:
    """Reference pattern: advect the previous frame along the estimated
    motion, blend with the current (qpe_utils.py:294-312 shape)."""
    dy, dx = estimate_motion(prev, cur, max_shift)
    moved = advect(prev, dy, dx)
    blended = np.where(np.isnan(moved), cur,
                       alpha * cur + (1 - alpha) * moved)
    return blended
