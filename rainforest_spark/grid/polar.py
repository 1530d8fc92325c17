"""Polar-volume processing: nearest-valid gap fill, range-window KDP,
and ZPHI attenuation correction.

Completes the polar operator family (SURVEY J12, W9 + the round-1
missing attenuation stage):

- ``fill_nearest_in_ray``: the reference fills NaN polar gates from the
  nearest valid gate with a KDTree (radarprocessing.py:444-453,593-602).
  Along a ray the nearest valid neighbour is 1-D — two window passes
  (last-valid-before / first-valid-after + distance compare) replace the
  KDTree with sort-based windows that shuffle once on (radar, sweep, az).
- ``kdp_from_psidp``: moving least-squares derivative of PSIDP over a
  range window (radarprocessing.py:307-354, pyart's 6 km window).  A
  regression slope over a centered rows window is expressible with
  window sums (Σxy, Σx, Σy, n) — no UDF, stays in codegen.
- ``zphi_attenuation``: the ZPHI path-attenuation correction (Testud et
  al. 2000) behind the reference's ``correct_attenuation``
  (radarprocessing.py:271-305, which calls pyart's
  calculate_attenuation_zphi).  The per-ray integrals become one
  per-ray aggregate + two ordered window sums — one shuffle on the ray
  key, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RAY_KEY = ["RADAR", "SWEEP", "az_idx"]


def fill_nearest_in_ray(polar: DataFrame, value_col: str,
                        max_gap: int | None = None) -> DataFrame:
    """Fill null gates from the nearest valid gate along the ray."""
    w_before = (Window.partitionBy(*RAY_KEY).orderBy("rng_idx")
                .rowsBetween(Window.unboundedPreceding, 0))
    w_after = (Window.partitionBy(*RAY_KEY).orderBy(F.col("rng_idx").desc())
               .rowsBetween(Window.unboundedPreceding, 0))
    valid_rng = F.when(F.col(value_col).isNotNull(), F.col("rng_idx"))
    d = (polar
         .withColumn("__vb", F.last(value_col, ignorenulls=True).over(w_before))
         .withColumn("__rb", F.last(valid_rng, ignorenulls=True).over(w_before))
         .withColumn("__va", F.last(value_col, ignorenulls=True).over(w_after))
         .withColumn("__ra", F.last(valid_rng, ignorenulls=True).over(w_after)))
    db = F.col("rng_idx") - F.col("__rb")
    da = F.col("__ra") - F.col("rng_idx")
    nearer_before = F.col("__ra").isNull() | (F.col("__rb").isNotNull()
                                              & (db <= da))
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)) \
        .when(nearer_before, F.col("__vb")).otherwise(F.col("__va"))
    if max_gap is not None:
        dist = F.when(F.col(value_col).isNotNull(), F.lit(0)) \
            .when(nearer_before, db).otherwise(da)
        filled = F.when(dist <= max_gap, filled)
    return (d.withColumn(f"{value_col}_filled", filled)
            .drop("__vb", "__rb", "__va", "__ra"))


def kdp_from_psidp(polar: DataFrame, psidp_col: str = "PSIDP",
                   window_gates: int = 12,
                   gate_len_km: float = 0.5) -> DataFrame:
    """KDP = ½ · d(PSIDP)/d(range), slope by least squares over a centered
    range window (deg/km).

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over the window, where
    x = range (km), y = PSIDP.  All terms are window sums — single
    shuffle on the ray key.
    """
    half = window_gates // 2
    w = (Window.partitionBy(*RAY_KEY).orderBy("rng_idx")
         .rowsBetween(-half, half))
    x = F.col("rng_idx").cast("double") * gate_len_km
    y = F.col(psidp_col)
    xy_present = F.when(y.isNotNull(), x)
    n = F.count(y).over(w).cast("double")
    sx = F.sum(xy_present).over(w)
    sy = F.sum(y).over(w)
    sxy = F.sum(xy_present * y).over(w)
    sxx = F.sum(xy_present * xy_present).over(w)
    denom = n * sxx - sx * sx
    slope = F.when(denom > 1e-12, (n * sxy - sx * sy) / denom)
    return polar.withColumn("KDP", slope / 2.0)


def zphi_attenuation(polar: DataFrame, zh_col: str = "ZH",
                     phidp_col: str = "PHIDP", zdr_col: str | None = None,
                     zv_col: str | None = None,
                     valid_col: str | None = None,
                     a_coef: float = 0.08, beta: float = 0.64884,
                     c: float = 0.3, d: float = 1.0804,
                     gate_len_km: float = 0.5,
                     stabilize: bool = False) -> DataFrame:
    """ZPHI attenuation correction (Testud et al. 2000; C-band default
    coefficients as in pyart's calculate_attenuation_zphi, which the
    reference calls from correct_attenuation, radarprocessing.py:271-305).

    Per ray, over the valid (liquid) segment [r1, r2] with rectangle-rule
    integrals (Δr = gate_len_km):

        zb(r)   = 10^(0.1·β·ZH(r))
        C       = 10^(0.1·β·a·Δφdp) − 1,  Δφdp = φdp(r2) − φdp(r1)
        I(r,r2) = 0.46·β·Σ_{s≥r} zb(s)·Δr      (reverse running sum)
        AH(r)   = zb(r)·C / (I(r1,r2) + C·I(r,r2))        [dB/km]
        PIA(r)  = 2·Σ_{s≤r} AH(s)·Δr           (forward running sum)
        ZH_CORR = ZH + PIA
        PIDA    = c·PIA^d;  ZDR_CORR = ZDR + PIDA
        ZV_CORR = ZV + PIA − PIDA            (radarprocessing.py:303-305)

    Shuffle shape: ONE scan, ONE exchange on the ray key — the per-ray
    quantities (Δφdp via first/last ignorenulls, I(r1,r2) via a
    full-frame window sum) and both running sums are all windows over
    the same partitioning, so there is no second scan and no stats
    join; Spark adds only per-frame sorts after the single exchange.

    ``stabilize=True`` rounds zb to 6 decimals and accumulates the range
    integrals in DECIMAL so the sums are bit-identical across engines
    and partition layouts (the workload determinism policy); the default
    keeps pure double arithmetic for production.
    """
    valid = (F.col(valid_col) if valid_col
             else F.col(zh_col).isNotNull() & F.col(phidp_col).isNotNull())
    zb = F.pow(F.lit(10.0), 0.1 * beta * F.col(zh_col))
    if stabilize:
        zb = F.round(zb, 6)
    df = polar.withColumn("__valid", valid).withColumn(
        "__zb", F.when(F.col("__valid"), zb))
    # Δr and 0.46·β are constants — factor them OUT of the sums, so the
    # stabilized path sums plain decimals (no decimal×decimal precision
    # overflow) and both engines multiply by one identical literal.
    seg = F.col("__zb")
    if stabilize:
        seg = F.col("__zb").cast("decimal(28,6)")
    prefactor = 0.46 * beta * gate_len_km
    w_full = (Window.partitionBy(*RAY_KEY).orderBy("rng_idx")
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    valid_phidp = F.when(F.col("__valid"), F.col(phidp_col))
    out = (df
           .withColumn("__ph1",
                       F.first(valid_phidp, ignorenulls=True).over(w_full))
           .withColumn("__ph2",
                       F.last(valid_phidp, ignorenulls=True).over(w_full))
           .withColumn("__isum", F.sum(seg).over(w_full).cast("double")))

    w_rev = (Window.partitionBy(*RAY_KEY).orderBy(F.col("rng_idx").desc())
             .rowsBetween(Window.unboundedPreceding, 0))
    irev = F.sum(seg).over(w_rev).cast("double") * F.lit(prefactor)
    itot = F.col("__isum") * F.lit(prefactor)
    cnum = (F.pow(F.lit(10.0),
                  0.1 * beta * a_coef * (F.col("__ph2") - F.col("__ph1")))
            - 1.0)
    ah = F.when(F.col("__valid"),
                F.col("__zb") * cnum / (itot + cnum * irev))
    out = out.withColumn("AH", ah)

    w_fwd = (Window.partitionBy(*RAY_KEY).orderBy("rng_idx")
             .rowsBetween(Window.unboundedPreceding, 0))
    pia = 2.0 * F.lit(gate_len_km) * F.sum("AH").over(w_fwd)
    out = out.withColumn("PIA", pia)
    out = out.withColumn("ZH_CORR", F.col(zh_col) + F.col("PIA"))
    if zdr_col or zv_col:
        pida = F.lit(c) * F.pow(F.col("PIA"), F.lit(d))
        out = out.withColumn("PIDA", pida)
        if zdr_col:
            out = out.withColumn("ZDR_CORR", F.col(zdr_col) + F.col("PIDA"))
        if zv_col:
            out = out.withColumn(
                "ZV_CORR", F.col(zv_col) + F.col("PIA") - F.col("PIDA"))
    return out.drop("__valid", "__zb", "__ph1", "__ph2", "__isum")
