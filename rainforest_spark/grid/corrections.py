"""Status-XML noise, wet-radome and VPR corrections APPLIED to the
polar chain (closing round-1 'Missing' #5/#6: parsing without
application is half the operator).

Reference semantics:

- compute_noise (radarprocessing.py:183-226): per sweep,
  ``noisedBADU = 10·log10(noisepower_frontend_*_inuse) + rconst`` from
  the status XML CALIB block, expanded along range with pyart's
  compute_noisedBZ law ``NH(r) = noisedBADU + 20·log10(r_km / 100)``;
  snr_mask (:116-142) then nulls radar fields where ZH − NH < thr.
- wet radome (retrieve_radar_data_5min.py:321-334): the last sweep's
  WET_RADOME/wetradome_mmh scalar becomes the per-radar RADPRECIP
  feature (0 when the block is empty).
- read_vpr (io_data.py:332-380): profile values v(h) on a regular
  height ladder; correction = v(h_ref)/v(h) clamped into
  [10^(−0.477), 10^(0.477)] (MAX_VPR_CORRECTION_DB = 4.77), linear
  interpolation between slices, out-of-range fill = the max factor.
  The correction multiplies LINEAR reflectivity/rain.

Spark-first: the status table is a tiny per-(radar, sweep) dimension →
broadcast equi-join + column expressions; the VPR curve is a tiny
(alt, corr) ladder → lead()-paired broadcast RANGE join + lerp (the J10
interpolation machinery on the height axis instead of time).  Polar
rows never shuffle for any of these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: constants.py:104-110 — reference height per radar and max correction
VPR_REF_HEIGHTS = {"A": 1500, "D": 2000, "L": 2000, "P": 1500, "W": 1500}
MAX_VPR_CORRECTION_DB = 4.77

RADAR_FIELDS = ("ZH", "ZV", "ZDR", "RHOHV", "KDP", "PHIDP")


def noise_dbz(noisedbadu, rng_km):
    """pyart compute_noisedBZ law: NH(r) = noisedBADU + 20·log10(r/100)
    (range in km, 100 km reference distance)."""
    return noisedbadu + 20.0 * F.log10(rng_km / 100.0)


def apply_status_noise(polar: DataFrame, status_noise: DataFrame,
                       snr_threshold: float = 3.0,
                       rng_res_km: float = 0.5,
                       fields: tuple = RADAR_FIELDS) -> DataFrame:
    """Join the per-(RADAR, SWEEP) status noise dim and SNR-mask the
    radar fields with the status-derived NH instead of a constant.

    ``status_noise`` columns: RADAR, SWEEP, noisedbadu_h (dB) — from
    ``sources.status_xml.status_noise_table``.  Adds NH and nulls every
    radar field where ZH − NH < snr_threshold (radarprocessing.py
    snr_mask), leaving non-radar (NWP) columns untouched.
    """
    joined = polar.join(broadcast(status_noise.select(
        "RADAR", "SWEEP", "noisedbadu_h")), on=["RADAR", "SWEEP"],
        how="left")
    rng_km = (F.col("rng_idx") + 0.5) * rng_res_km
    out = joined.withColumn("NH", noise_dbz(F.col("noisedbadu_h"), rng_km))
    # materialize the predicate BEFORE masking: once ZH is nulled, a
    # lazily re-resolved (ZH - NH) < thr would be NULL (treated false by
    # when()) and the remaining fields would never be masked
    out = out.withColumn(
        "__snr_bad", (F.col("ZH") - F.col("NH")) < snr_threshold)
    for c in fields:
        if c in polar.columns:
            out = out.withColumn(
                c, F.when(F.col("__snr_bad"), None).otherwise(F.col(c)))
    return out.drop("noisedbadu_h", "__snr_bad")


def vpr_correction_curve(spark: SparkSession, values: list[float],
                         vpr_res_m: float, radar: str) -> DataFrame:
    """read_vpr's normalize+clamp (io_data.py:361-380) as a tiny
    (alt_m, corr_lin) dimension table.

    corr(h) = v(h_ref)/v(h), clamped into [1/m, m] with
    m = 10^(0.1·4.77); h_ref is the slice nearest the radar's reference
    height.  Driver-side list math (the profile is ~100 floats).
    """
    n = len(values)
    alts = [i * vpr_res_m for i in range(n)]
    ref_h = VPR_REF_HEIGHTS[radar]
    ref_i = min(range(n), key=lambda i: abs(alts[i] - ref_h))
    m = 10.0 ** (0.1 * MAX_VPR_CORRECTION_DB)
    corr = [min(max(values[ref_i] / v, 1.0 / m), m) if v else m
            for v in values]
    return spark.createDataFrame(
        list(zip(alts, corr)), "alt_m double, corr_lin double")


def vpr_at_height(df: DataFrame, curve: DataFrame,
                  height_col: str = "height",
                  out_col: str = "VPR") -> DataFrame:
    """Piecewise-linear VPR factor at each row's height: lead()-paired
    broadcast range join + lerp; outside the ladder the reference's
    interp1d fill_value (the max factor) applies."""
    w = Window.orderBy("alt_m")
    seg = (curve.withColumn("alt1", F.lead("alt_m").over(w))
           .withColumn("corr1", F.lead("corr_lin").over(w)))
    h = F.col(height_col)
    cond = (h >= F.col("alt_m")) & ((h < F.col("alt1"))
                                    | F.col("alt1").isNull())
    joined = df.join(broadcast(seg), cond, "left")
    lerp = F.col("corr_lin") + (F.col("corr1") - F.col("corr_lin")) \
        * (h - F.col("alt_m")) / (F.col("alt1") - F.col("alt_m"))
    fill = F.lit(10.0 ** (0.1 * MAX_VPR_CORRECTION_DB))
    # outside the ladder (below slice 0 OR strictly above the last
    # slice) interp1d's fill_value applies; AT the last slice the data
    # value holds (io_data.py:377-380)
    corr = (F.when(F.col("alt_m").isNull(), fill)
            .when(F.col("alt1").isNull(),
                  F.when(h > F.col("alt_m"), fill)
                  .otherwise(F.col("corr_lin")))
            .otherwise(lerp))
    return joined.withColumn(out_col, corr) \
        .drop("alt_m", "corr_lin", "alt1", "corr1")


def apply_vpr_to_zlin(df: DataFrame, curve: DataFrame,
                      zlin_col: str = "zh_lin",
                      height_col: str = "height") -> DataFrame:
    """Multiply linear reflectivity by the VPR factor at the gate/pixel
    height (the correction is multiplicative in linear units)."""
    out = vpr_at_height(df, curve, height_col, "__vpr")
    return (out.withColumn(zlin_col, F.col(zlin_col) * F.col("__vpr"))
            .withColumnRenamed("__vpr", "VPR"))


def wet_radome_feature(polar: DataFrame, status: DataFrame) -> DataFrame:
    """Attach the per-radar RADPRECIP scalar (wetradome_mmh of the last
    sweep; 0 when the WET_RADOME block is absent —
    retrieve_radar_data_5min.py:321-334)."""
    w = status.groupBy("RADAR").agg(
        F.coalesce(F.expr("max_by(wetradome_mmh, SWEEP)"), F.lit(0.0))
        .alias("RADPRECIP"))
    return polar.join(broadcast(w), on="RADAR", how="left")
