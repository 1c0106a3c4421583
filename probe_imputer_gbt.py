"""ModelImputer boosted-trees probe (VERDICT r01 task 5, continued).

RF saturated at valid micro-F1 0.449 (16-config SHA, IMPUTER_TUNING.json)
and the lr/mlp families probed well below it; the reference's 0.500 comes
from a tuned boosted-tree model (XGBClassifier,
eda_processing.ipynb:2423-2480). This probes the one matching MLlib family
not yet tried: one-vs-rest GBTClassifier (``classifierFamily="gbt_ovr"``)
through the same ``evaluate_imputer`` protocol.

Usage: python probe_imputer_gbt.py   (appends IMPUTER_TUNING.json)
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
    ("gbt_d5_i60", {"maxDepth": 5, "maxIter": 60, "stepSize": 0.1, "subsamplingRate": 0.8}),
    ("gbt_d7_i40", {"maxDepth": 7, "maxIter": 40, "stepSize": 0.1, "subsamplingRate": 0.8}),
    ("gbt_d4_i100_lr005", {"maxDepth": 4, "maxIter": 100, "stepSize": 0.05, "subsamplingRate": 0.7}),
]


def main() -> None:
    spark = get_spark(
        "probe_imputer_gbt", extra_configs={"spark.sql.shuffle.partitions": "8"}
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
        imp = ModelImputer(
            targetCol="ECONOMIC_SECTOR", sentinel="Missing",
            classifierFamily="gbt_ovr", **params,
        )
        t0 = time.perf_counter()
        f1 = evaluate_imputer(imp.fit(ptrain), pvalid, "ECONOMIC_SECTOR")
        scores[name] = round(f1, 4)
        print(f"{name:20s} f1={f1:.4f} ({time.perf_counter() - t0:.0f}s)", flush=True)

    record = {
        "probe": "gbt_ovr",
        "target": "ECONOMIC_SECTOR",
        "scores": scores,
        "reference_tuned_xgb": 0.500,
        "rf_best": 0.449,
    }
    with open("IMPUTER_TUNING.json", "a") as f:
        f.write("\n" + json.dumps(record))
    print(json.dumps(record))


if __name__ == "__main__":
    main()
