"""Geo transforms (SURVEY §2.8 F5).

WGS84 ↔ Swiss CH1903/LV03 via the official swisstopo approximate
polynomial formulas (public; the reference carries the same math in
rainforest/common/wgs84_ch1903.py:4-105).  Pure column arithmetic —
vectorized, codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def wgs_to_ch_y(lat: Column | str, lon: Column | str) -> Column:
    """WGS84 (deg) → CH1903 easting Y (swisstopo approx formula)."""
    phi = (_c(lat) * 3600.0 - 169028.66) / 10000.0
    lam = (_c(lon) * 3600.0 - 26782.5) / 10000.0
    return (600072.37 + 211455.93 * lam
            - 10938.51 * lam * phi
            - 0.36 * lam * phi * phi
            - 44.54 * lam * lam * lam)


def wgs_to_ch_x(lat: Column | str, lon: Column | str) -> Column:
    """WGS84 (deg) → CH1903 northing X."""
    phi = (_c(lat) * 3600.0 - 169028.66) / 10000.0
    lam = (_c(lon) * 3600.0 - 26782.5) / 10000.0
    return (200147.07 + 308807.95 * phi
            + 3745.25 * lam * lam
            + 76.63 * phi * phi
            - 194.56 * lam * lam * phi
            + 119.79 * phi * phi * phi)


def ch_to_wgs_lat(y: Column | str, x: Column | str) -> Column:
    """CH1903 (m) → WGS84 latitude (deg)."""
    yp = (_c(y) - 600000.0) / 1000000.0
    xp = (_c(x) - 200000.0) / 1000000.0
    lat = (16.9023892 + 3.238272 * xp
           - 0.270978 * yp * yp
           - 0.002528 * xp * xp
           - 0.0447 * yp * yp * xp
           - 0.0140 * xp * xp * xp)
    return lat * 100.0 / 36.0


def ch_to_wgs_lon(y: Column | str, x: Column | str) -> Column:
    """CH1903 (m) → WGS84 longitude (deg)."""
    yp = (_c(y) - 600000.0) / 1000000.0
    xp = (_c(x) - 200000.0) / 1000000.0
    lon = (2.6779094 + 4.728982 * yp
           + 0.791484 * yp * xp
           + 0.1306 * yp * xp * xp
           - 0.0436 * yp * yp * yp)
    return lon * 100.0 / 36.0


def rotated_pole_to_geo_lat(rlat: Column | str, rlon: Column | str,
                            pole_lat: float = 43.0,
                            pole_lon: float = -170.0) -> Column:
    """COSMO rotated-pole → geographic latitude (deg).

    Reference: rainforest/common/lookup.py:563-613; standard spherical
    rotation with the rotated north pole at (pole_lat, pole_lon).
    Sanity: rotated (0, 0) → 90 − pole_lat (the grid centre), rotated
    north pole → pole_lat.
    """
    import math
    phi_r = F.radians(_c(rlat))
    lam_r = F.radians(_c(rlon))
    sp, cp = math.sin(math.radians(pole_lat)), math.cos(math.radians(pole_lat))
    return F.degrees(F.asin(F.sin(phi_r) * sp
                            + F.cos(phi_r) * F.cos(lam_r) * cp))


def rotated_pole_to_geo_lon(rlat: Column | str, rlon: Column | str,
                            pole_lat: float = 43.0,
                            pole_lon: float = -170.0) -> Column:
    """COSMO rotated-pole → geographic longitude (deg)."""
    import math
    phi_r = F.radians(_c(rlat))
    lam_r = F.radians(_c(rlon))
    sp, cp = math.sin(math.radians(pole_lat)), math.cos(math.radians(pole_lat))
    num = F.cos(phi_r) * F.sin(lam_r)
    den = sp * F.cos(phi_r) * F.cos(lam_r) - cp * F.sin(phi_r)
    lon = F.degrees(F.atan2(num, den)) + (pole_lon + 180.0)
    # normalize to (-180, 180]
    return lon - 360.0 * F.floor((lon + 180.0) / 360.0)
