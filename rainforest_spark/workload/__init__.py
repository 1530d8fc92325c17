"""Driver-facing workload: paired (Spark query, DuckDB oracle SQL).

Each entry maps a SURVEY §2 operator onto the driver-provided tables
(TESTDATA.md).  Numeric determinism policy (so the driver's value-hash
matches bit-for-bit):

- Sums of money/value columns go through ``DECIMAL(18,4)`` — decimal
  addition is exact and order-independent, so Spark's partial aggregation
  across 32 partitions and DuckDB's sequential scan produce identical
  results.  Final values are cast back to DOUBLE (exact conversion).
- Transcendental outputs (log/exp/pow ratios, corr, RMSE) are rounded to
  6 decimals AFTER the final division/log, where the engines' FP noise is
  ~1e-12 — far below the 5e-7 rounding boundary.
- Threshold comparisons against aggregated values always compare decimals,
  never raw double sums (a double sum landing exactly on the threshold
  would be engine-order dependent).
- Timestamps are returned as epoch-second BIGINTs, never raw timestamps.
- Every ranking window carries a unique tie-breaker column.
"""

from __future__ import annotations

from rainforest_spark.workload import extended, relational, text, vectors

_MODULES = [relational, text, vectors, extended]


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
