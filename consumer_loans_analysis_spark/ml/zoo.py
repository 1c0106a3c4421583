"""Model zoo (M1) + featurization helpers.

The reference screens 11 sklearn classifiers with defaults
(modeling_validation.ipynb:103-129). MLlib substitution table (declared up
front per SURVEY §2.8 M1):

| reference              | ours                                   |
|------------------------|----------------------------------------|
| RandomForest           | RandomForestClassifier                 |
| GradientBoosting / XGB | GBTClassifier                          |
| LogisticRegression     | LogisticRegression                     |
| Ridge classifier       | LogisticRegression(elasticNetParam=0)  |
| SVC (linear) / LinearSVC | LinearSVC                            |
| GaussianNB             | NaiveBayes(modelType='gaussian')       |
| MLP                    | MultilayerPerceptronClassifier         |
| rbf-SVC                | RandomFourierFeatures → LinearSVC (ml/rff.py — Rahimi–Recht kernel approx; closes the r≤6 LinearSVC-only gap) |
| KNN / AdaBoost         | no MLlib equivalent — documented gap   |
| DummyClassifier        | UniformRandomClassifier (M2, below)    |

The final shipped model is GaussianNB (BASELINE.md), which MLlib has.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Transformer
from pyspark.ml.classification import (
    FMClassifier,
    GBTClassifier,
    LinearSVC,
    LogisticRegression,
    MultilayerPerceptronClassifier,
    NaiveBayes,
    RandomForestClassifier,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.util import DefaultParamsReadable, DefaultParamsWritable
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_features(df: DataFrame, label_col: str = "FINALIZED_LOAN") -> DataFrame:
    """Featured table → MLlib convention: `features` vector + double `label`
    (O6: the label stays a column; no pandas-style X/y split)."""
    feature_cols = [c for c in df.columns if c != label_col]
    assembled = VectorAssembler(inputCols=feature_cols, outputCol="features").transform(df)
    return assembled.withColumn("label", F.col(label_col).cast("double"))


def model_zoo(seed: int = 42, mlp_layers: list[int] | None = None) -> dict[str, callable]:
    """name → estimator factory (defaults), for the screening harness."""
    return {
        "random_forest": lambda: RandomForestClassifier(seed=seed),
        "gbt": lambda: GBTClassifier(seed=seed),
        "logistic_regression": lambda: LogisticRegression(),
        "linear_svc": lambda: LinearSVC(),
        "gaussian_nb": lambda: NaiveBayes(modelType="gaussian"),
        # engine-native closed-form Gaussian NB with the sklearn
        # var_smoothing knob (ml/gaussian_nb.py) — the reference's tuned
        # and FINAL shipped model family (var_smoothing 9.027e-05,
        # modeling_validation.ipynb:608-614); MLlib's has no such knob
        "gaussian_nb_smoothed": lambda: _gaussian_nb_smoothed(),
        "mlp": lambda: MultilayerPerceptronClassifier(
            layers=mlp_layers or [54, 16, 2], seed=seed
        ),
        "fm": lambda: FMClassifier(seed=seed),
        # in-engine K-class boosting (ml/softmax_gbt.py) — the XGB-family
        # stand-in; tuned config from TUNING.json sgbt_binary_wave2
        "gbt_softmax": lambda: _softmax_gbt(seed),
        # rbf-SVC stand-in: Rahimi–Recht random Fourier features feeding a
        # linear SVM (ml/rff.py) — approximates sklearn SVC(kernel='rbf',
        # gamma='scale'), the one reference family MLlib lacks natively
        "rbf_svc_rff": lambda: _rbf_svc_rff(seed),
        "dummy_uniform": lambda: UniformRandomClassifier(seed=seed),
    }


def _gaussian_nb_smoothed():
    from consumer_loans_analysis_spark.ml.gaussian_nb import GaussianNBClassifier

    # reference-tuned smoothing (TUNING.json nb_smoothing_sweep)
    return GaussianNBClassifier(varSmoothing=9.027e-05)


def _rbf_svc_rff(seed: int):
    from pyspark.ml import Pipeline

    from consumer_loans_analysis_spark.ml.rff import RandomFourierFeatures

    return Pipeline(stages=[
        RandomFourierFeatures(inputCol="features", outputCol="_rff_z",
                              nComponents=1000, gamma=0.0, seed=seed),
        LinearSVC(featuresCol="_rff_z"),
    ])


def _softmax_gbt(seed: int):
    from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier

    return SoftmaxGBTClassifier(
        scoresCol="probs", maxDepth=6, maxIter=150, stepSize=0.2, seed=seed
    )


class UniformRandomClassifierModel(Transformer, DefaultParamsReadable, DefaultParamsWritable):
    seed = Param(Params._dummy(), "seed", "seed", TypeConverters.toInt)

    @keyword_only
    def __init__(self, seed: int = 42):
        super().__init__()
        self._set(seed=seed)

    def _transform(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "prediction",
            F.when(F.rand(self.getOrDefault(self.seed)) > 0.5, 1.0).otherwise(0.0),
        )


class UniformRandomClassifier(DefaultParamsReadable, DefaultParamsWritable):
    """M2: DummyClassifier(strategy='uniform') equivalent (modeling.py:21-28)
    — the screening floor."""

    def __init__(self, seed: int = 42):
        self.seed = seed

    def fit(self, df: DataFrame) -> UniformRandomClassifierModel:
        return UniformRandomClassifierModel(seed=self.seed)
