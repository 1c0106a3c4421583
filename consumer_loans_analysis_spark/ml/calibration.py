"""Probability calibration (isotonic, out-of-fold) for soft voting.

The reference's soft-voting ensemble (modeling_validation.ipynb:1105-1121,
valid micro-F1 0.8847) averages sklearn probabilities that are reasonably
calibrated per member; the r3 MLlib reproduction measured the gap from
voting over UNcalibrated members directly — GaussianNB's overconfident
scores dragged the trio to 0.8417 (TUNING.json). The standard fix is the
CalibratedClassifierCV recipe: learn a monotone map from member score to
empirical P(y=1) on OUT-OF-FOLD predictions, then vote over calibrated
probabilities.

Spark shape:
- fold assignment is the deterministic ``pmod(hash(id-ish), k)`` used by
  the CV harness (cv.py) — reproducible under any partitioning;
- each fold's holdout scores come from a model fitted on the other folds
  (k member fits — embarrassingly parallel, same cached frame);
- the monotone map is MLlib ``IsotonicRegression`` on (score, label) —
  the PAV fit runs on ≤ one point per distinct score, driver-light;
- serving: inner model transform → extract P(1) → isotonic transform —
  one lazy plan, all JVM-side.
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.functions import vector_to_array
from pyspark.ml.regression import IsotonicRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _p1(df: DataFrame) -> DataFrame:
    """P(class 1) from either an MLlib ``probability`` vector or a plain
    ``probs`` array column (SoftmaxGBTModel with scoresCol='probs')."""
    if "probability" in df.columns:
        score = vector_to_array(F.col("probability"))[1]
    elif "probs" in df.columns:
        score = F.col("probs")[1]
    else:
        # e.g. LinearSVC emits only rawPrediction — fail here with a clear
        # message instead of an unresolved-column error deep inside fit
        raise ValueError(
            "calibration needs a 'probability' vector or 'probs' array "
            f"column; got columns {df.columns}"
        )
    return df.withColumn("_score", score).drop(
        "rawPrediction", "probability", "prediction", "probs"
    )


class CalibratedClassifierModel(Transformer):
    """Fitted member + fitted isotonic map: transform emits
    ``probability_pos`` (calibrated P(1)) and a 0.5-threshold
    ``prediction``."""

    def __init__(self, inner, iso_model, threshold: float = 0.5):
        super().__init__()
        self.inner = inner
        self.iso_model = iso_model
        self.threshold = threshold

    def _transform(self, df: DataFrame) -> DataFrame:
        scored = _p1(self.inner.transform(df))
        cal = self.iso_model.transform(scored)
        return (
            cal.withColumnRenamed("_cal", "probability_pos")
            .withColumn(
                "prediction",
                F.when(
                    F.col("probability_pos") > self.threshold, 1.0
                ).otherwise(0.0),
            )
            .drop("_score")
        )


class CalibratedClassifier:
    """Estimator: k-fold out-of-fold isotonic calibration around any MLlib
    probabilistic classifier (the CalibratedClassifierCV shape).

    ``fit(df)``: df needs ``features``/``label`` (+ whatever the inner
    estimator uses). The isotonic map is fit ONLY on scores the member
    produced for rows it never trained on; the served member is refit on
    the full frame.
    """

    def __init__(self, estimator, n_folds: int = 5, seed: int = 42,
                 threshold: float = 0.5):
        self.estimator = estimator
        self.n_folds = n_folds
        self.seed = seed
        self.threshold = threshold

    def fit(self, df: DataFrame) -> CalibratedClassifierModel:
        k = self.n_folds
        # deterministic fold id: hash of the full row content (same
        # device as cv.py — reproducible under any partitioning)
        fold = F.pmod(F.hash(F.struct(*df.columns), F.lit(self.seed)), F.lit(k))
        framed = df.withColumn("_fold", fold).cache()
        oof = None
        for f in range(k):
            m = self.estimator.fit(framed.filter(F.col("_fold") != f))
            part = _p1(m.transform(framed.filter(F.col("_fold") == f))).select(
                "_score", F.col("label").cast("double").alias("_y")
            )
            oof = part if oof is None else oof.unionByName(part)
        iso = IsotonicRegression(
            featuresCol="_score", labelCol="_y", predictionCol="_cal",
            isotonic=True,
        ).fit(oof)
        inner = self.estimator.fit(framed)
        framed.unpersist()
        return CalibratedClassifierModel(inner, iso, self.threshold)
