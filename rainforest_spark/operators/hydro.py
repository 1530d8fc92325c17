"""Hydrometeor classification (SURVEY J13).

Reference: nearest-centroid classification of polar gates into 9 classes
with a weighted Minkowski distance over standardized (ZH, ZDR, KDP,
RHOHV, relative height) — rainforest/common/radarprocessing.py:633-705,
per-radar centroid tables common/constants.py:339-384.

The algorithm and the operational centroid values are published in
Besic et al. (2016), "Hydrometeor classification through statistical
clustering of polarimetric radar measurements: a semi-supervised
approach", Atmos. Meas. Tech. 9, 4425-4445 (doi:10.5194/amt-9-4425-2016)
and shipped by the open-source Py-ART library
(pyart.retrieve.echo_class.hydroclass_semisupervised / _standardize);
everything below derives from those public sources.

Standardization (Besic 2016 sect. 3.1; pyart _standardize):
  ZH     linear map [-10, 60] dBZ          -> [-1, 1]
  ZDR    linear map [-1.5, 5] dB           -> [-1, 1]
  KDP    clip at -0.5, 10*log10(kdp+0.6), then linear [-10, 7] -> [-1, 1]
  RHOHV  10*log10(1-rhohv), then linear [-50, -5.23]           -> [-1, 1]
  relh   logistic 2/(1+exp(-0.005*h)) - 1  (height rel. to iso0, m)
Distance: weighted Minkowski p=2, weights (1, 1, 1, 0.75, 0.5) — the
scipy.cdist convention d = (sum_i w_i |x_i - y_i|^p)^(1/p).

Spark-first: centroids are standardized once on the driver (45 rows),
broadcast, and equi-joined on the radar id; the argmin is a
deterministic struct-min.  The gate side never shuffles; all arithmetic
is JVM column expressions (no UDF).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: class codes in reference row order (radarprocessing.py:659-671):
#: aggregates, ice crystals, light rain, rimed particles, rain,
#: vertically-aligned ice, wet snow, melting hail, dry hail/high-density
#: graupel.
HYDRO_CLASSES = ["AG", "CR", "LR", "RP", "RN", "VI", "WS", "MH", "IH"]

#: operational per-radar centroids (zh dBZ, zdr dB, kdp deg/km, rhohv,
#: relh m) for the five Swiss C-band radars, from Besic et al. (2016)
#: (parity table: reference common/constants.py:339-384).
HYDRO_CENTROIDS: dict[str, list[list[float]]] = {
    "A": [[13.5829, 0.4063, 0.0497, 0.9868, 1330.3],
          [2.8453, 0.2457, 0.0000, 0.9798, 653.8],
          [7.6597, 0.2180, 0.0019, 0.9799, -1426.5],
          [31.6815, 0.3926, 0.0828, 0.9978, 535.3],
          [39.4703, 1.0734, 0.4919, 0.9876, -1036.3],
          [4.8267, -0.5690, 0.0000, 0.9691, 869.8],
          [30.8613, 0.9819, 0.1998, 0.9845, -66.1],
          [52.3969, 2.1094, 2.4675, 0.9730, -1550.2],
          [50.6186, -0.0649, 0.0946, 0.9904, 1179.9]],
    "L": [[13.8231, 0.2514, 0.0644, 0.9861, 1380.6],
          [3.0239, 0.1971, 0.0000, 0.9661, 1464.1],
          [4.9447, 0.1142, 0.0000, 0.9787, -974.7],
          [34.2450, 0.5540, 0.1459, 0.9937, 945.3],
          [40.9432, 1.0110, 0.5141, 0.9928, -993.5],
          [3.5202, -0.3498, 0.0000, 0.9746, 843.2],
          [32.5287, 0.9751, 0.2640, 0.9804, -55.5],
          [52.6547, 2.7054, 2.5101, 0.9765, -1114.6],
          [46.4998, 0.1978, 0.6431, 0.9845, 1010.1]],
    "D": [[12.567, 0.18934, 0.041193, 0.97693, 1328.1],
          [3.2115, 0.13379, 0.0000, 0.96918, 1406.3],
          [10.669, 0.18119, 0.0000, 0.97337, -1171.9],
          [34.941, 0.13301, 0.090056, 0.9979, 898.44],
          [39.653, 1.1432, 0.35013, 0.98501, -859.38],
          [2.8874, -0.46363, 0.0000, 0.95653, 1015.6],
          [34.122, 0.87987, 0.2281, 0.98003, -234.37],
          [53.134, 2.0888, 2.0055, 0.96927, -1054.7],
          [46.715, 0.030477, 0.16994, 0.9969, 976.56]],
    "P": [[13.9882, 0.2470, 0.0690, 0.9939, 1418.1],
          [0.9834, 0.4830, 0.0043, 0.9834, 950.6],
          [5.3962, 0.2689, 0.0000, 0.9831, -479.5],
          [35.3411, 0.1502, 0.0940, 0.9974, 920.9],
          [35.0114, 0.9681, 0.1106, 0.9785, -374.0],
          [2.5897, -0.3879, 0.0282, 0.9876, 985.5],
          [32.2914, 0.7789, 0.1443, 0.9075, -153.5],
          [53.2413, 1.8723, 0.3857, 0.9454, -470.8],
          [44.7896, 0.0015, 0.1349, 0.9968, 1116.7]],
    "W": [[16.7650, 0.3754, 0.0442, 0.9866, 1409.0],
          [1.4418, 0.3786, 0.0000, 0.9490, 1415.8],
          [16.0987, 0.3238, 0.0000, 0.9871, -818.7],
          [36.5465, 0.2041, 0.0731, 0.9952, 745.4],
          [43.4011, 0.6658, 0.3241, 0.9894, -778.5],
          [0.9077, -0.4793, 0.0000, 0.9502, 1488.6],
          [36.8091, 0.7266, 0.1284, 0.9924, -71.1],
          [53.8402, 0.8922, 0.5306, 0.9890, -1017.6],
          [45.9686, 0.0845, 0.0963, 0.9940, 867.4]],
}

#: feature order and the Besic (2016) distance weights
FEATURES = ["ZH", "ZDR", "KDP", "RHOHV", "relh"]
WEIGHTS = [1.0, 1.0, 1.0, 0.75, 0.5]

#: standardization limits (mn, mx) in transformed space
_LIMITS = {"ZH": (-10.0, 60.0), "ZDR": (-1.5, 5.0),
           "KDP": (-10.0, 7.0), "RHOHV": (-50.0, -5.23)}

#: backward-compatible single-radar view (class, zh, zdr, kdp, rho, relh)
CENTROIDS = [(HYDRO_CLASSES[i], *HYDRO_CENTROIDS["A"][i]) for i in range(9)]


def _standardize_value(x: float, feat: str) -> float:
    """Driver-side (numpy-free) mirror of the column transform, used to
    standardize the 45 centroid rows once."""
    if feat == "relh":
        return 2.0 / (1.0 + math.exp(-0.005 * x)) - 1.0
    if feat == "KDP":
        x = 10.0 * math.log10(max(x, -0.5) + 0.6)
    elif feat == "RHOHV":
        x = 10.0 * math.log10(1.0 - x) if x < 1.0 else _LIMITS[feat][1]
    mn, mx = _LIMITS[feat]
    return max(-1.0, min(1.0, 2.0 * (x - mn) / (mx - mn) - 1.0))


def standardize_col(col: Column, feat: str) -> Column:
    """Besic (2016) / pyart ``_standardize`` as a JVM column expression."""
    if feat == "relh":
        return F.lit(2.0) / (F.lit(1.0) + F.exp(F.lit(-0.005) * col)) - F.lit(1.0)
    if feat == "KDP":
        col = F.lit(10.0) * F.log10(F.greatest(col, F.lit(-0.5)) + F.lit(0.6))
    elif feat == "RHOHV":
        col = F.lit(10.0) * F.log10(F.lit(1.0) - col)
    mn, mx = _LIMITS[feat]
    lin = F.lit(2.0) * (col - F.lit(mn)) / F.lit(mx - mn) - F.lit(1.0)
    return F.least(F.greatest(lin, F.lit(-1.0)), F.lit(1.0))


def centroid_table(spark: SparkSession,
                   radars: list[str] | None = None) -> DataFrame:
    """Standardized (radar, class, sc_<feat>...) table — 45 rows, built
    on the driver and broadcast by the caller."""
    rows = []
    for radar in (radars or sorted(HYDRO_CENTROIDS)):
        for cls, cent in zip(HYDRO_CLASSES, HYDRO_CENTROIDS[radar]):
            rows.append((radar, cls, *[
                _standardize_value(v, f) for v, f in zip(cent, FEATURES)]))
    pdf = pd.DataFrame(rows, columns=["c_radar", "hydro_class"]
                       + [f"sc_{f}" for f in FEATURES])
    return spark.createDataFrame(pdf)


def minkowski_distance(p: float = 2.0) -> Column:
    """Weighted Minkowski over the standardized features
    (radarprocessing.py:703 cdist(..., 'minkowski', p=2, w=weights))."""
    total = F.lit(0.0)
    for feat, weight in zip(FEATURES, WEIGHTS):
        d = F.abs(standardize_col(F.col(feat), feat) - F.col(f"sc_{feat}"))
        total = total + F.lit(weight) * F.pow(d, p)
    return F.pow(total, 1.0 / p)


def hydro_classify(gates: DataFrame, spark: SparkSession,
                   keys: list[str], p: float = 2.0,
                   radar_col: str = "RADAR",
                   default_radar: str = "A") -> DataFrame:
    """Assign each gate row its nearest hydrometeor class.

    Per-radar centroid subtable selected by an equi-join on the radar id
    (broadcast, 45 rows); argmin via deterministic struct-min; ties
    break on the class label alphabetically.  Rows whose radar has no
    table (or with ``radar_col`` absent) use ``default_radar``, so the
    operator stays total.
    """
    cents = centroid_table(spark)
    if radar_col in gates.columns:
        key = F.coalesce(F.col(radar_col).cast("string"), F.lit(default_radar))
    else:
        key = F.lit(default_radar)
    known = list(HYDRO_CENTROIDS)
    joined = (gates.withColumn(
        "__radar_key",
        F.when(key.isin(known), key).otherwise(F.lit(default_radar)))
        .join(broadcast(cents), F.col("__radar_key") == F.col("c_radar"))
        .withColumn("__d", minkowski_distance(p)))
    pick = F.min(F.struct(F.col("__d"), F.col("hydro_class"))).alias("__best")
    out = joined.groupBy(*keys).agg(pick)
    return (out.withColumn("HYDRO", F.col("__best.hydro_class"))
            .withColumn("hydro_dist", F.col("__best.__d"))
            .drop("__best"))
