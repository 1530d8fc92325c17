"""Trainable document-quality classifier — the model-based filtering
stage of a large-scale training-data pipeline (the fastText-style
"does this look like reference text?" gate run after the heuristic
filters and before mixture sampling).

No reference analogue (MeteoSwiss/rainforest is a weather archive);
this composes the prompt-level training-pipeline requirement with the
repo's existing signal surface:

- features: the engine's own heuristic quality signals
  (operators/text_analysis.quality_features — punct/digit/stopword
  ratios, token stats) plus a hashed bag-of-words block
  (HashingTF over the whitespace tokens) so the model can learn
  lexical cues the ratios miss;
- model: MLlib LogisticRegression — distributed fit, and scoring is a
  pure column transform (one VectorAssembler + one model.transform),
  so the 100 TB scoring pass is map-only with zero shuffles;
- the decision surface is exposed as a PROBABILITY column; the cut
  belongs to the caller (mixture/budget stages consume the score —
  thresholding inside the model would hide the dial).

Scale shape: fit = MLlib's distributed LBFGS over the labeled seed set
(seed sets are small — high-quality reference docs vs random crawl);
scoring = map-only, broadcastable model, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rainforest_spark.operators.text_analysis import quality_features

#: Heuristic feature columns fed to the classifier (the engine's own
#: quality signals).
RATIO_FEATURES = ["n_chars_actual", "n_tokens", "punct_ratio",
                  "digit_ratio", "mean_token_len", "stopword_ratio"]


class QualityClassifier:
    """LogisticRegression over heuristic ratios + hashed token block.

    ``fit`` takes a labeled seed DataFrame (``label_col`` ∈ {0, 1};
    1 = reference-quality); ``transform`` appends
    ``quality_prob`` ∈ [0, 1].
    """

    def __init__(self, text_col: str = "text", label_col: str = "label",
                 hash_features: int = 1 << 12, reg_param: float = 0.01,
                 max_iter: int = 50):
        self.text_col = text_col
        self.label_col = label_col
        self.hash_features = int(hash_features)
        self.reg_param = float(reg_param)
        self.max_iter = int(max_iter)
        self.model = None

    def _featurize(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import HashingTF, VectorAssembler

        feat = quality_features(df, self.text_col)
        # null-free ratios: empty docs get 0s instead of dropping rows
        for c in RATIO_FEATURES:
            feat = feat.withColumn(
                c, F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
        feat = feat.withColumn(
            "__toks", F.split(F.lower(F.trim(F.col(self.text_col))),
                              r"\s+"))
        tf = HashingTF(inputCol="__toks", outputCol="__tf",
                       numFeatures=self.hash_features, binary=True)
        va = VectorAssembler(inputCols=RATIO_FEATURES + ["__tf"],
                             outputCol="__features",
                             handleInvalid="keep")
        return va.transform(tf.transform(feat))

    def fit(self, labeled: DataFrame) -> "QualityClassifier":
        from pyspark.ml.classification import LogisticRegression

        train = self._featurize(labeled).withColumn(
            "__label", F.col(self.label_col).cast("double"))
        lr = LogisticRegression(featuresCol="__features",
                                labelCol="__label",
                                regParam=self.reg_param,
                                maxIter=self.max_iter,
                                standardization=True)
        self.model = lr.fit(train)
        return self

    def transform(self, df: DataFrame,
                  out_col: str = "quality_prob") -> DataFrame:
        """Append the quality probability; input columns pass through."""
        from pyspark.ml.functions import vector_to_array

        scored = self.model.transform(self._featurize(df))
        prob = vector_to_array(F.col("probability"))[1]
        keep = [c for c in df.columns]
        return scored.select(*keep, prob.alias(out_col))


def quality_filter(df: DataFrame, clf: QualityClassifier,
                   threshold: float = 0.5,
                   out_col: str = "quality_prob") -> DataFrame:
    """Score + cut in one call: rows with ``quality_prob >= threshold``
    survive.  The score column stays on the output so downstream
    mixture/budget stages can re-weight instead of re-scoring."""
    return (clf.transform(df, out_col=out_col)
            .filter(F.col(out_col) >= float(threshold)))
