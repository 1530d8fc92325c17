"""Golden parity against a REFERENCE-PRODUCED artifact.

`/root/reference/tests_cscs/reference_test_output.parquet` is the day
file the reference's own CI compares its `Updater` output against
(tests_cscs/test_retrieve_radar_data.py:20-26, check_less_precise=3).
We cannot re-run the Updater (raw metranet inputs aren't shipped), but
the artifact pins three things this engine must reproduce exactly:

1. the column layout + dtype conventions of `_remap`
   (retrieve_radar_data.py:677-788 + :608-621 dtype application) —
   asserted column-for-column, dtype-for-dtype, against the output of
   this repo's db_build chain projected with `to_reference_layout`;
2. value-preserving sink behaviour — the artifact is pushed through the
   engine's daily-partition upsert (S5) twice and must come back
   frame-equal (the reference's own pass criterion, to 3 decimals;
   here exact);
3. the semantic invariants the reference test data encodes (config
   radars/sweeps, NX=NY=0 neighbourhood, 10-min TCOUNT ∈ {1,2}).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

REF_ARTIFACT = "/root/reference/tests_cscs/reference_test_output.parquet"

#: RADAR_RETRIEVAL config of the artifact (tests_cscs/test_config.yml).
REF_RADAR_VARIABLES = ["ZH", "ZV", "ZH_VISIB", "ZV_VISIB", "ZDR", "KDP",
                       "RHOHV", "SW", "RVEL", "AH", "ZH_CORR", "ZV_CORR",
                       "ZDR_CORR", "VISIB", "NH", "NV"]
REF_OTHER_VARIABLES = ["HEIGHT", "VPR"]

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_ARTIFACT),
    reason="reference artifact not present in this environment")


@pytest.fixture(scope="module")
def ref_pdf():
    return pd.read_parquet(REF_ARTIFACT)


def test_artifact_layout_matches_remap_spec(ref_pdf):
    """Sanity-pin the spec itself: the artifact's columns are exactly
    reference_layout_columns for its config."""
    from rainforest_spark.grid.db_build import reference_layout_columns

    assert list(ref_pdf.columns) == reference_layout_columns(
        REF_RADAR_VARIABLES, REF_OTHER_VARIABLES)


def test_chain_output_layout_and_dtypes_match_artifact(spark, ref_pdf):
    """db_build chain → to_reference_layout reproduces the artifact's
    schema column-for-column and dtype-for-dtype."""
    from rainforest_spark.grid.db_build import (
        build_radar_table, to_reference_layout,
    )
    from rainforest_spark.grid.lookup import (
        polar_to_cart_lut, station_to_pixel_lut,
    )
    from rainforest_spark.testing.fixtures import RADAR_XYZ

    rng = np.random.RandomState(7)
    az, rg = np.meshgrid(np.arange(0, 360, 4), np.arange(40),
                         indexing="ij")
    n = az.size
    polar = pd.DataFrame({
        "TIMESTAMP": np.int64(1571443200), "RADAR": "A",
        "SWEEP": np.int32(1),
        "az_idx": az.ravel().astype(np.int32),
        "rng_idx": rg.ravel().astype(np.int32),
        **{v: rng.uniform(0, 50, n) for v in REF_RADAR_VARIABLES},
    })
    lut = polar_to_cart_lut(spark, {"A": RADAR_XYZ["A"]}, sweeps=[1],
                            n_az=360, n_rng=40)
    lut_pdf = lut.toPandas()
    px = lut_pdf.drop_duplicates(["x_idx", "y_idx"]).iloc[[3]]
    stations = pd.DataFrame({
        "Abbrev": ["ST00"],
        "X": (px["x_idx"].to_numpy() + 255.0 + 0.5) * 1000.0,
        "Y": (px["y_idx"].to_numpy() - 160.0 + 0.5) * 1000.0,
    })
    spx = station_to_pixel_lut(spark, stations)
    out = build_radar_table(spark.createDataFrame(polar), lut, spx,
                            REF_RADAR_VARIABLES)
    # OTHER_VARIABLES ride at the center pixel (reference config
    # OTHER_VARIABLES: [HEIGHT, VPR]); HEIGHT from the gate geometry,
    # VPR from the correction chain — a constant suffices for layout
    out = (out.withColumn("HEIGHT", F.lit(1500.0))
           .withColumn("VPR", F.lit(0.95)))
    shaped = to_reference_layout(out, REF_RADAR_VARIABLES,
                                 REF_OTHER_VARIABLES).toPandas()
    assert list(shaped.columns) == list(ref_pdf.columns)
    for c in ref_pdf.columns:
        assert shaped[c].dtype == ref_pdf[c].dtype, \
            f"{c}: {shaped[c].dtype} != {ref_pdf[c].dtype}"


def test_upsert_roundtrip_preserves_reference_values(spark, ref_pdf,
                                                     tmp_path):
    """The reference artifact through the engine's S5 upsert (twice —
    idempotence) comes back frame-equal: names, dtypes, values."""
    from rainforest_spark.grid.db_build import to_reference_layout
    from rainforest_spark.sources.writers import upsert_daily_partition

    keys = ["TIMESTAMP", "STATION", "RADAR", "SWEEP", "NX", "NY"]
    df = spark.createDataFrame(ref_pdf).withColumn(
        "day", F.date_format(F.col("TIMESTAMP").cast("timestamp"),
                             "yyyyMMdd"))
    path = str(tmp_path / "day_table")
    upsert_daily_partition(spark, df, path, keys)
    upsert_daily_partition(spark, df, path, keys)  # idempotent re-run
    back = to_reference_layout(spark.read.parquet(path),
                               REF_RADAR_VARIABLES,
                               REF_OTHER_VARIABLES).toPandas()
    got = back.sort_values(keys, ignore_index=True)
    exp = ref_pdf.sort_values(keys, ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=True)


def test_artifact_semantic_invariants(ref_pdf):
    """The conventions the engine's chain assumes hold in the real file:
    config radars/sweeps, centre-pixel neighbourhood, 10-min pairing."""
    assert set(ref_pdf["RADAR"]) <= {"A", "D"}
    assert set(ref_pdf["SWEEP"]) <= set(range(1, 6))
    assert (ref_pdf["NX"] == 0).all() and (ref_pdf["NY"] == 0).all()
    # NB the real file contains TCOUNT=3: the reference pairs WHATEVER
    # arrived in the 10-min window, not at most two scans (repeated
    # scans at one timestep count individually).  The engine's
    # temporal_pair_aggregate counts the same way — don't assume ≤2.
    assert set(ref_pdf["TCOUNT"]) <= {1, 2, 3}
    assert (ref_pdf["TCOUNT"] >= 1).all()
    assert (ref_pdf["TIMESTAMP"] == 1571443200).all()
