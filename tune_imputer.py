"""ModelImputer tuning (VERDICT r01 task 5): close the 0.449 → 0.500 gap.

Mirrors the reference's 100-trial optuna tuning of its imputer
(eda_processing.ipynb:2423-2480) with the successive-halving harness:
many RF configs screened on a sampled fit, survivors promoted to the full
train, best refit and scored with ``evaluate_imputer`` (micro-F1 of the
recovered ECONOMIC_SECTOR values on the valid rows whose truth is known).

Memory envelope note: RF(200 trees × depth 16) OOMs the local[32] heap —
the space caps at the known-safe 150×14 region and searches bins/leaf
floor/bagging/feature-subset instead.

Usage: python tune_imputer.py [n_configs] [eta]   (appends IMPUTER_TUNING.json)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer, mode_baseline
from consumer_loans_analysis_spark.ml.tuning import successive_halving
from consumer_loans_analysis_spark.pipeline.loans import build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

IMPUTER_SPACE = {
    "numTrees": ("int", 80, 150),
    "maxDepth": ("int", 8, 14),
    "maxBins": ("choice", [16, 32, 48, 64]),
    "minInstancesPerNode": ("int", 1, 10),
    "subsamplingRate": ("uniform", 0.5, 1.0),
    "featureSubsetStrategy": ("choice", ["auto", "sqrt", "onethird", "0.5", "all"]),
}


def main() -> None:
    n_configs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    eta = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("tune_imputer", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")

    # Processed frame up to (but excluding) the model-imputer stages: the
    # with_model_imputers=False pipeline minus its trailing ColumnDropper,
    # so ECONOMIC_SECTOR (with its "Missing" sentinel) survives.
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(stages=base.getStages()[:-1]).fit(train)
    ptrain = prep.transform(train).cache()
    ptrain.count()
    pvalid = prep.transform(valid).cache()
    pvalid.count()

    baseline = mode_baseline(ptrain, pvalid, "ECONOMIC_SECTOR")

    def evaluate(params, fraction):
        fit_on = ptrain if fraction >= 1.0 else ptrain.sample(fraction=fraction, seed=42)
        imp = ModelImputer(targetCol="ECONOMIC_SECTOR", sentinel="Missing", **params)
        t0 = time.perf_counter()
        f1 = evaluate_imputer(imp.fit(fit_on), pvalid, "ECONOMIC_SECTOR")
        print(
            f"  frac={fraction:.3f} f1={f1:.4f} ({time.perf_counter() - t0:.0f}s) {params}",
            flush=True,
        )
        return f1

    t0 = time.perf_counter()
    out = successive_halving(evaluate, IMPUTER_SPACE, n_configs=n_configs, eta=eta)
    record = {
        "target": "ECONOMIC_SECTOR",
        "mode_baseline": round(baseline, 4),
        "best_params": out["best_params"],
        "best_valid_micro_f1": round(out["best_value"], 4),
        "reference_tuned_xgb": 0.500,
        "default_rf_150x14": 0.449,
        "rungs": out["rungs"],
        "tune_sec": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
