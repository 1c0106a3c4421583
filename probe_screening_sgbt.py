"""Screening-table XGB twin via the engine's softmax-GBT (VERDICT r06
task 4). The reference's screening row is ``XGBClassifier()`` defaults
under 6-fold CV — f1 0.63405 / soft AUC 0.92715
(/root/reference/notebooks/modeling_validation.ipynb:203). The r6
tier3_report stood in MLlib ``GBTClassifier`` defaults (f1 0.5826): MLlib
defaults (20 rounds, depth 5, lr 0.1) are far weaker than XGB defaults.
This probe runs the in-repo SoftmaxGBTClassifier in binary (K=2) mode at
XGBoost's published defaults — max_depth 6, learning_rate 0.3,
n_estimators 100, reg_lambda 1 — under the IDENTICAL 6-fold CV harness
(same hash folds, same metrics, soft AUC from the softmax scores).

Appends {"probe": "screening_sgbt_twin", ...} to TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml import Estimator, Model
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.cv import cross_validate, cv_summary, pin_layout
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

# XGBoost defaults: max_depth=6, eta=0.3, n_estimators=100 (sklearn
# wrapper), lambda=1, subsample=1, min_child_weight=1
XGB_DEFAULTS = {"maxDepth": 6, "stepSize": 0.3, "maxIter": 100, "regLambda": 1.0}


class _P1Model(Model):
    """Adapter: expose P(class=1) from the softmax scores array as a
    DOUBLE `probability` column (BinaryClassificationEvaluator accepts
    Double or Vector, not array<double>)."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner

    def _transform(self, df):
        return self.inner.transform(df).withColumn(
            "probability", F.element_at("_scores", 2)
        ).drop("_scores")


class _P1Estimator(Estimator):
    def _fit(self, df):
        return _P1Model(
            SoftmaxGBTClassifier(scoresCol="_scores", parallelism=8,
                                 **XGB_DEFAULTS).fit(df)
        )


def main() -> None:
    spark = get_spark("screening-sgbt", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    proc, feat = fit_full_pipeline(train, with_model_imputers=True)
    ftr = pin_layout(
        assemble_features(feat.transform(proc.transform(train)))
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    folds = cross_validate(
        _P1Estimator, ftr, k=6, parallelism=2, soft_auc_col="probability",
    )
    summ = {k: round(v, 4) for k, v in cv_summary(folds).items()}
    sec = round(time.perf_counter() - t0)
    print("screening sgbt twin:", summ, f"({sec}s)", flush=True)

    record = {
        "probe": "screening_sgbt_twin",
        "config": XGB_DEFAULTS,
        "cv6": summ,
        "cv_sec": sec,
        "reference_screening_xgb": {"f1": 0.63405, "roc_auc_soft": 0.92715},
        "r6_mllib_gbt_defaults_row": {"f1": 0.5826, "roc_auc_soft": 0.9179},
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
