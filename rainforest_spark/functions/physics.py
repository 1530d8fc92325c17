"""Physics scalar expressions (SURVEY §2.8 F4).

All pure column arithmetic — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def rain_proxy(zh_lin: Column | str, a: float = 316.0, b: float = 1.5) -> Column:
    """Marshall-Palmer-style rain-rate proxy ``(Z/a)^(1/b)``.

    Reference: qpe/qpe.py:722-728 with A_QPE=316, B_QPE=1.5
    (common/constants.py:107-108).
    """
    return F.pow(_c(zh_lin) / a, 1.0 / b)


def kochendorfer_adjust(precip: Column | str, temp: Column | str,
                        wind: Column | str,
                        solid_temp: float = 2.0) -> Column:
    """Catch-efficiency gauge adjustment (Kochendorfer et al. transfer fn).

    Reference: retrieve_dwh_data.py:75-102 — wind clipped at 9 m/s; mixed
    precip (T in (solid_temp, ~8]) and solid (T ≤ solid_temp) get
    ``CE = a·exp(−b·U) + c``; liquid is unadjusted.  Coefficients are the
    reference's mixed/solid constants.
    """
    u = F.least(_c(wind), F.lit(9.0))
    ce_mixed = 0.1245 + F.lit(0.867) * F.exp(-0.3270 * u) - F.lit(0.0)
    ce_solid = F.lit(0.378) * F.exp(-0.1130 * u) + F.lit(0.3787)
    t = _c(temp)
    ce = (F.when(t <= solid_temp, ce_solid)
          .when(t <= 8.0, ce_mixed)
          .otherwise(F.lit(1.0)))
    return _c(precip) / ce


def visib_correction(zh_lin: Column | str, visib: Column | str,
                     max_corr: float = 2.0) -> Column:
    """Visibility correction on linear reflectivity:
    ``Z · min(100/VISIB, max_corr)`` (radarprocessing.py:144-182)."""
    corr = F.least(F.lit(100.0) / _c(visib), F.lit(max_corr))
    return _c(zh_lin) * corr


def iso0_height_from_temp(temp: Column | str, height: Column | str) -> Column:
    """HISO: freezing-level estimate ``HEIGHT − T/0.7·100`` from a std lapse
    rate (reference ml/rf.py:254-257 builds it as −T/0.7·100 offset)."""
    return _c(height) - _c(temp) / 0.7 * 100.0


def height_above_ground(height: Column | str, iso0: Column | str) -> Column:
    """HAG = max(HEIGHT − ISO0, 0) style clamp (ml/rf.py:254-257)."""
    return F.greatest(_c(height) - _c(iso0), F.lit(0.0))


def dist_to_radar_km(x: Column | str, y: Column | str,
                     xr: Column | str, yr: Column | str) -> Column:
    """Euclidean distance station↔radar in km (ml/rf.py:366-372)."""
    return F.hypot(_c(x) - _c(xr), _c(y) - _c(yr)) / 1000.0
