"""Soft-voting ensemble (M7).

Reference: VotingClassifier(voting='soft') over XGB + GaussianNB + SVC
(modeling_validation.ipynb:1105-1121). Spark shape: each member's
``probability`` vector column is produced by one ``transform`` over the SAME
cached frame; P(class 1) is extracted with ``vector_to_array`` (JVM-side,
no UDF), averaged, and thresholded at 0.5 (M10).

Members without probability output (e.g. LinearSVC) are excluded by the
reference too — soft voting needs calibrated probabilities.
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class SoftVotingEnsemble(Transformer):
    """Average member probabilities, threshold at 0.5.

    Members may emit an MLlib ``probability`` vector, a scalar
    ``probability_pos`` (e.g. ``CalibratedClassifierModel`` — voting over
    calibrated probabilities is the reference's effective behavior, since
    sklearn members are reasonably calibrated out of the box), or a plain
    ``probs`` array column (``SoftmaxGBTModel`` with scoresCol='probs').

    ``weights`` (optional, same length as ``models``) weight each member's
    vote; sklearn's VotingClassifier exposes the same knob. None = uniform.
    """

    def __init__(self, models: list, threshold: float = 0.5,
                 weights: list[float] | None = None):
        super().__init__()
        if weights is not None:
            if len(weights) != len(models):
                raise ValueError("weights must match models length")
            if any(w < 0 for w in weights) or sum(weights) <= 0:
                # all-zero weights divide by zero (null probability_pos);
                # negative weights push the vote outside [0, 1]
                raise ValueError(
                    "weights must be >= 0 with a positive sum"
                )
        self.models = models
        self.threshold = threshold
        self.weights = weights

    def _transform(self, df: DataFrame) -> DataFrame:
        out = df
        prob_cols = []
        for i, m in enumerate(self.models):
            pred = m.transform(out)
            col = f"_p1_{i}"
            if "probability_pos" in pred.columns:
                pred = pred.withColumnRenamed("probability_pos", col)
            elif "probs" in pred.columns:
                pred = pred.withColumn(col, F.col("probs")[1])
            else:
                pred = pred.withColumn(col, vector_to_array(F.col("probability"))[1])
            out = pred.drop(
                "rawPrediction", "probability", "prediction", "probability_pos",
                "probs",
            )
            prob_cols.append(col)
        w = self.weights or [1.0] * len(prob_cols)
        avg = sum(
            (F.col(c) * wi for c, wi in zip(prob_cols, w)), F.lit(0.0)
        ) / sum(w)
        return (
            out.withColumn("probability_pos", avg)
            .withColumn(
                "prediction",
                F.when(F.col("probability_pos") > self.threshold, 1.0).otherwise(0.0),
            )
            .drop(*prob_cols)
        )
