"""Softmax-multiclass-GBT imputer probe (VERDICT r03 task 1).

The measured residual gap (RF plateau 0.4503 vs reference tuned-XGB 0.500,
eda_processing.ipynb:2418) was attributed to the booster family; OvR
boosting was rejected at K x cost. This probes the NEW shared-frame softmax
GBT (ml/softmax_gbt.py) through the same evaluate_imputer protocol.

Usage: python probe_imputer_softmax.py [config ...]  (appends IMPUTER_TUNING.json)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer
from consumer_loans_analysis_spark.pipeline.loans import build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

CONFIGS = {
    "sgbt_d5_i40_lr01": {"maxDepth": 5, "maxIter": 40, "stepSize": 0.1},
    "sgbt_d5_i60_lr02": {"maxDepth": 5, "maxIter": 60, "stepSize": 0.2},
    "sgbt_d6_i40_lr01_s08": {"maxDepth": 6, "maxIter": 40, "stepSize": 0.1, "subsamplingRate": 0.8},
    "sgbt_d4_i80_lr01": {"maxDepth": 4, "maxIter": 80, "stepSize": 0.1},
    "sgbt_d3_i20_lr02": {"maxDepth": 3, "maxIter": 20, "stepSize": 0.2},
    "sgbt_d5_i100_lr02": {"maxDepth": 5, "maxIter": 100, "stepSize": 0.2},
    "sgbt_d5_i60_lr03": {"maxDepth": 5, "maxIter": 60, "stepSize": 0.3},
    "sgbt_d5_i60_lr02_s08": {"maxDepth": 5, "maxIter": 60, "stepSize": 0.2, "subsamplingRate": 0.8},
    "sgbt_d6_i60_lr02": {"maxDepth": 6, "maxIter": 60, "stepSize": 0.2},
    "sgbt_d7_i60_lr02": {"maxDepth": 7, "maxIter": 60, "stepSize": 0.2},
    "sgbt_d6_i100_lr02": {"maxDepth": 6, "maxIter": 100, "stepSize": 0.2},
    "sgbt_d6_i60_lr02_emp": {"maxDepth": 6, "maxIter": 60, "stepSize": 0.2, "_target": "EMPLOYEE_NO_NUM"},
    "sgbt_d6_i100_lr02_emp": {"maxDepth": 6, "maxIter": 100, "stepSize": 0.2, "_target": "EMPLOYEE_NO_NUM"},
    "rf_tpe_emp": {"_family": "rf", "numTrees": 80, "maxDepth": 14, "maxBins": 64, "minInstancesPerNode": 3, "subsamplingRate": 0.82, "featureSubsetStrategy": "0.5", "_target": "EMPLOYEE_NO_NUM"},
    "sgbt_d8_i60_lr02": {"maxDepth": 8, "maxIter": 60, "stepSize": 0.2},
    "sgbt_d7_i100_lr02": {"maxDepth": 7, "maxIter": 100, "stepSize": 0.2},
    # seed replicates of the 0.5059 ECONOMIC_SECTOR headline (ref 0.500,
    # margin 0.0059): MLlib's split-binning sampler makes fits
    # seed-sensitive, so the robustness number is the multi-seed mean
    # (r6, same protocol as emp_seed_robustness_summary)
    "sgbt_d7_i100_lr02_seed7": {"maxDepth": 7, "maxIter": 100, "stepSize": 0.2, "seed": 7},
    "sgbt_d7_i100_lr02_seed99": {"maxDepth": 7, "maxIter": 100, "stepSize": 0.2, "seed": 99},
}


def main() -> None:
    spark = get_spark(
        "probe_imputer_sgbt", extra_configs={"spark.sql.shuffle.partitions": "8"}
    )
    names = sys.argv[1:] or list(CONFIGS)
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    from consumer_loans_analysis_spark.pipeline.loans import EMPLOYEE_NO_MAP
    from consumer_loans_analysis_spark.pipeline.stages import BucketOrdinalEncoder

    base = build_processing_pipeline(with_model_imputers=False)
    # the probe evaluates imputers standalone, so add the EMPLOYEE_NO ->
    # EMPLOYEE_NO_NUM encoder the with_model_imputers pipeline would carry
    prep = Pipeline(
        stages=base.getStages()[:-1]
        + [BucketOrdinalEncoder(inputCol="EMPLOYEE_NO", outputCol="EMPLOYEE_NO_NUM", mapping=EMPLOYEE_NO_MAP)]
    ).fit(train)
    ptrain = prep.transform(train).cache()
    ptrain.count()
    pvalid = prep.transform(valid).cache()
    pvalid.count()

    scores = {}
    for name in names:
        params = dict(CONFIGS[name])
        target = params.pop("_target", "ECONOMIC_SECTOR")
        family = params.pop("_family", "gbt_softmax")
        sentinel = "Missing" if target == "ECONOMIC_SECTOR" else None
        # EMPLOYEE_NO_NUM is null where EMPLOYEE_NO is missing (the probe
        # prep has no upstream imputer for it), so it must stay out of the
        # ECONOMIC_SECTOR feature set — this also keeps scores comparable
        # with the wave-1..3 runs, whose prep lacked the column entirely.
        excl = (
            ["EMPLOYEE_NO_NUM"]
            if target == "ECONOMIC_SECTOR"
            else ["ECONOMIC_SECTOR_"]
        )
        imp = ModelImputer(
            targetCol=target, sentinel=sentinel, excludePrefixes=excl,
            classifierFamily=family, **params,
        )
        t0 = time.perf_counter()
        f1 = evaluate_imputer(imp.fit(ptrain), pvalid, target, sentinel=sentinel)
        dt = time.perf_counter() - t0
        scores[name] = {"f1": round(f1, 4), "sec": round(dt), "target": target}
        print(f"{name:24s} f1={f1:.4f} ({dt:.0f}s)", flush=True)

    record = {
        "probe": "gbt_softmax",
        "scores": scores,
        # reference: ECONOMIC_SECTOR tuned-XGB 0.500 (eda_processing:2418),
        # EMPLOYEE_NO tuned-XGB 0.47903 / mode 0.27587 (:2661,:2507)
        "reference_tuned_xgb": {"ECONOMIC_SECTOR": 0.500, "EMPLOYEE_NO": 0.47903},
        "rf_tpe_best": 0.4503,
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
