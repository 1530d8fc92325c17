"""Phase-2 pipeline vs a DuckDB oracle on the rainforest-shaped fixtures.

The whole prepare_input chain is re-stated as one DuckDB SQL query; the
Spark result must match on keys exactly and on floats to 1e-6 relative
(the reference's own golden tolerance is 1e-3, tests_cscs/
test_retrieve_radar_data.py:24-25 — we are far tighter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rainforest_spark.testing.fixtures import write_fixtures


@pytest.fixture(scope="module")
def fx(tmp_path_factory):
    out = tmp_path_factory.mktemp("rf_fixtures")
    return write_fixtures(str(out))


ORACLE = """
WITH radar_d AS (
  SELECT DISTINCT * FROM radar
  WHERE NX = 0 AND NY = 0
),
ref0 AS (SELECT DISTINCT TIMESTAMP, STATION FROM reference
         WHERE NX = 0 AND NY = 0),
gauge_valid AS (
  SELECT STATION, TIMESTAMP, RRE150Z0 FROM gauge
  WHERE RRE150Z0 IS NOT NULL AND RRE150Z0 != -9999
),
aligned AS (
  SELECT g.* FROM gauge_valid g
  WHERE EXISTS (SELECT 1 FROM radar_d r
                WHERE r.STATION = g.STATION AND r.TIMESTAMP = g.TIMESTAMP)
    AND EXISTS (SELECT 1 FROM ref0 f
                WHERE f.STATION = g.STATION AND f.TIMESTAMP = g.TIMESTAMP)
),
hours AS (
  SELECT *, COUNT(*) OVER (PARTITION BY STATION,
            (TIMESTAMP - 600) - (TIMESTAMP - 600) % 3600) AS n_in_hr
  FROM aligned
),
g6 AS (SELECT * FROM hours WHERE n_in_hr = 6),
rj AS (
  SELECT r.*, s.X, s.Y, s.Z, rd.X_rad, rd.Y_rad,
         pow(10, -0.5 * r.HEIGHT / 1000.0) * r.VISIB_mean / 100.0 AS w
  FROM radar_d r
  JOIN stations s ON s.Abbrev = r.STATION
  JOIN radars rd ON rd.RADAR = r.RADAR
  WHERE EXISTS (SELECT 1 FROM g6
                WHERE g6.STATION = r.STATION AND g6.TIMESTAMP = r.TIMESTAMP)
),
vert AS (
  SELECT STATION, TIMESTAMP,
         SUM(CASE WHEN ZH_mean IS NOT NULL AND ZH_mean != -9999
             THEN w * ZH_mean END)
           / SUM(CASE WHEN ZH_mean IS NOT NULL AND ZH_mean != -9999
                 THEN w END) AS ZH_mean,
         SUM(w * sqrt((X - X_rad)*(X - X_rad) + (Y - Y_rad)*(Y - Y_rad))
             / 1000.0) / SUM(w) AS DIST_TO_RAD,
         SUM(CASE WHEN RADAR = 'A' THEN w ELSE 0 END) / SUM(w) AS RADAR_prop_A,
         SUM(w) AS W_SUM
  FROM rj GROUP BY STATION, TIMESTAMP
)
SELECT v.*, g6.RRE150Z0 * 6 AS target_mmh
FROM vert v JOIN g6 ON v.STATION = g6.STATION AND v.TIMESTAMP = g6.TIMESTAMP
"""


def test_prepare_input_oracle(spark, fx):
    import duckdb

    from rainforest_spark.ml.dataset import prepare_input

    dfs = {k: spark.read.parquet(p) for k, p in fx.items()}
    got = prepare_input(dfs["gauge"], dfs["radar"], dfs["reference"],
                        dfs["stations"], dfs["radars"]).toPandas()

    con = duckdb.connect()
    for k, p in fx.items():
        con.execute(f"CREATE VIEW {k} AS SELECT * FROM '{p}'")
    want = con.execute(ORACLE).df()

    assert len(got) > 50, "pipeline produced too few rows"
    key = ["STATION", "TIMESTAMP"]
    g = got.sort_values(key, ignore_index=True)
    w = want.sort_values(key, ignore_index=True)
    assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
    assert (g["STATION"] == w["STATION"]).all()
    assert (g["TIMESTAMP"].astype("int64")
            == w["TIMESTAMP"].astype("int64")).all()
    for c in ["ZH_mean", "DIST_TO_RAD", "RADAR_prop_A", "W_SUM",
              "target_mmh"]:
        a = g[c].to_numpy(dtype=float)
        b = w[c].to_numpy(dtype=float)
        ok = np.isclose(a, b, rtol=1e-6, atol=1e-6, equal_nan=True)
        assert ok.all(), f"{c}: {(~ok).sum()} mismatches, e.g. " \
                         f"{a[~ok][:3]} vs {b[~ok][:3]}"


def test_prepare_input_invariants(spark, fx):
    from rainforest_spark.ml.dataset import prepare_input

    dfs = {k: spark.read.parquet(p) for k, p in fx.items()}
    out = prepare_input(dfs["gauge"], dfs["radar"], dfs["reference"],
                        dfs["stations"], dfs["radars"])
    pdf = out.toPandas()
    # keys unique
    assert not pdf.duplicated(["STATION", "TIMESTAMP"]).any()
    # radar proportions sum to 1
    props = pdf[[c for c in pdf.columns if c.startswith("RADAR_prop_")]]
    assert np.allclose(props.sum(axis=1), 1.0)
    # target non-negative, group ids dense from 0
    assert (pdf["target_mmh"] >= 0).all()
    gids = np.sort(pdf["group_id"].unique())
    assert gids[0] == 0 and (np.diff(gids) == 1).all()
