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
                        wind: Column | str) -> Column:
    """Catch-efficiency gauge adjustment (Kochendorfer et al. 2017 KD4
    transfer function, hess-21-3525-2017).

    Reference: database_10min/retrieve_dwh_data.py:79-97 — wind clipped at
    9 m/s; ``CE = a·exp(−b·U) + c`` with
    solid (T < −2):      a=0.865, b=0.298, c=0.225
    mixed (−2 ≤ T ≤ 2):  a=0.624, b=0.185, c=0.364
    liquid (T > 2):      unadjusted (CE = 1).
    Null temperature rows are left unadjusted, like the reference's
    ``~isna`` masks.
    """
    u = F.least(_c(wind), F.lit(9.0))
    ce_mixed = F.lit(0.624) * F.exp(-0.185 * u) + F.lit(0.364)
    ce_solid = F.lit(0.865) * F.exp(-0.298 * u) + F.lit(0.225)
    t = _c(temp)
    ce = (F.when(t < -2.0, ce_solid)
          .when(t <= 2.0, ce_mixed)
          .otherwise(F.lit(1.0)))
    return _c(precip) / F.coalesce(ce, F.lit(1.0))


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
