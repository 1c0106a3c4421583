"""ModelImputer classifier-family probe (VERDICT r01 task 5, continued).

The RF family saturated at valid micro-F1 0.449 after a 16-config SHA sweep
(IMPUTER_TUNING.json) vs the reference's tuned-XGB 0.500
(eda_processing.ipynb:2418). This probes the other MLlib families through
the same ``evaluate_imputer`` protocol: multinomial LogisticRegression
(regularization grid) and MultilayerPerceptron (width grid), with the RF
default as the control row.

Usage: python probe_imputer_families.py   (appends IMPUTER_TUNING.json)
"""

from __future__ import annotations

import json
import time

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer
from consumer_loans_analysis_spark.pipeline.loans import build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

CONFIGS = [
    # rf_default control row comes from IMPUTER_TUNING.json (0.449) — the
    # 150x14 fit costs ~10 min on a contended host, no need to re-measure.
    ("lr", {"classifierFamily": "lr", "regParam": 0.0}),
    ("lr_l2_0.01", {"classifierFamily": "lr", "regParam": 0.01}),
    ("lr_l2_0.1", {"classifierFamily": "lr", "regParam": 0.1}),
    ("lr_en_0.01_0.5", {"classifierFamily": "lr", "regParam": 0.01, "elasticNetParam": 0.5}),
    ("mlp_64", {"classifierFamily": "mlp", "hiddenLayers": [64], "maxIter": 200}),
    ("mlp_128_64", {"classifierFamily": "mlp", "hiddenLayers": [128, 64], "maxIter": 200}),
]


def main() -> None:
    spark = get_spark(
        "probe_imputer", extra_configs={"spark.sql.shuffle.partitions": "8"}
    )
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(stages=base.getStages()[:-1]).fit(train)
    ptrain = prep.transform(train).cache()
    ptrain.count()
    pvalid = prep.transform(valid).cache()
    pvalid.count()

    scores = {}
    for name, params in CONFIGS:
        imp = ModelImputer(targetCol="ECONOMIC_SECTOR", sentinel="Missing", **params)
        t0 = time.perf_counter()
        f1 = evaluate_imputer(imp.fit(ptrain), pvalid, "ECONOMIC_SECTOR")
        scores[name] = round(f1, 4)
        print(f"{name:16s} f1={f1:.4f} ({time.perf_counter() - t0:.0f}s)", flush=True)

    record = {
        "probe": "classifier_family",
        "target": "ECONOMIC_SECTOR",
        "scores": scores,
        "reference_tuned_xgb": 0.500,
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
