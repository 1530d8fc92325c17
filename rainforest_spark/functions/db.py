"""dB / linear domain math and the per-variable averaging dispatch.

Reflectivity must be averaged in linear space: the "logmean"
``10·log10(mean(10^(0.1·x)))`` is operator code 1 in the reference's
``AVG_METHODS`` (rainforest/common/constants.py:319-322), with the
per-variable dispatch table ``AVG_BY_VAR`` (constants.py:314-316).  All of
it is pure column expression — JVM-side, codegen-friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Which aggregation a variable takes in temporal/neighbourhood aggregation.
#: mirrors constants.py:314-322: reflectivity-like vars → logmean, counters →
#: sum, everything else → plain mean.
AVG_BY_VAR: dict[str, str] = {
    "ZH": "logmean", "ZV": "logmean", "ZH_VISIB": "logmean",
    "ZV_VISIB": "logmean", "ZH_CORR": "logmean", "ZV_CORR": "logmean",
    "TCOUNT": "sum",
}


def dbz_to_lin(col: Column | str) -> Column:
    """dBZ → linear Z: ``10^(0.1·x)`` (reference ml/rf.py:361-365)."""
    return F.pow(F.lit(10.0), 0.1 * F.col(col) if isinstance(col, str) else 0.1 * col)


def lin_to_dbz(col: Column | str) -> Column:
    """linear Z → dBZ: ``10·log10(x)`` (reference radarprocessing.py:369-374)."""
    c = F.col(col) if isinstance(col, str) else col
    return 10.0 * F.log10(c)


def logmean(col: Column | str) -> Column:
    """dB-domain mean: ``10·log10(avg(10^(0.1·x)))``.

    Reference: ``nanlogmean`` / AVG_METHODS code 1, constants.py:319-322.
    Nulls are ignored by ``avg`` exactly like the reference's nan-mean.
    """
    return lin_to_dbz(F.avg(dbz_to_lin(col)))


def avg_expr_for(var: str, col: str | None = None) -> Column:
    """Aggregation expression for a variable per the dispatch table.

    Reference: ``aggregate_multi`` operator selection
    (common/utils.py:485-508 + retrieve_radar_data.py:790-822).
    """
    col = col or var
    method = AVG_BY_VAR.get(var, "mean")
    if method == "logmean":
        return logmean(col)
    if method == "sum":
        return F.sum(col)
    return F.avg(col)
