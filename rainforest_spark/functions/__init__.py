"""Scalar / expression function library (SURVEY §2.8)."""

from rainforest_spark.functions.db import (  # noqa: F401
    dbz_to_lin, lin_to_dbz, logmean, AVG_BY_VAR, avg_expr_for,
)
from rainforest_spark.functions.physics import (  # noqa: F401
    rain_proxy, kochendorfer_adjust, visib_correction, height_above_ground,
    iso0_height_from_temp, dist_to_radar_km,
)
