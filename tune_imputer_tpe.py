"""ModelImputer TPE-lite pass (VERDICT r02 task 8): adaptive search over
the known-safe RF imputer space, after the SHA sweep plateaued at ~0.45
vs the reference's tuned-XGB 0.500 (eda_processing.ipynb:2423-2480 —
XGBoost absent from this container; IMPUTER_TUNING.json records the
family-substitution probes). TPE draws from the density of past good
trials, so it spends the budget refining the plateau region instead of
re-sampling uniformly.

Usage: python tune_imputer_tpe.py [n_trials]   (appends IMPUTER_TUNING.json)
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer, mode_baseline
from consumer_loans_analysis_spark.ml.tuning import tpe_search
from consumer_loans_analysis_spark.pipeline.loans import build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv
from tune_imputer import IMPUTER_SPACE


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    spark = get_spark("tune_imputer_tpe", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")

    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(stages=base.getStages()[:-1]).fit(train)
    ptrain = prep.transform(train).cache()
    ptrain.count()
    pvalid = prep.transform(valid).cache()
    pvalid.count()

    baseline = mode_baseline(ptrain, pvalid, "ECONOMIC_SECTOR")

    def evaluate(params):
        imp = ModelImputer(targetCol="ECONOMIC_SECTOR", sentinel="Missing", **params)
        t0 = time.perf_counter()
        f1 = evaluate_imputer(imp.fit(ptrain), pvalid, "ECONOMIC_SECTOR")
        print(f"  f1={f1:.4f} ({time.perf_counter() - t0:.0f}s) {params}", flush=True)
        return f1

    t0 = time.perf_counter()
    out = tpe_search(evaluate, IMPUTER_SPACE, n_trials=n_trials, n_startup=6, seed=42)
    record = {
        "probe": "tpe",
        "target": "ECONOMIC_SECTOR",
        "mode_baseline": round(baseline, 4),
        "best_params": out["best_params"],
        "best_valid_micro_f1": round(out["best_value"], 4),
        "trial_values": [round(t["value"], 4) for t in out["trials"]],
        "reference_tuned_xgb": 0.500,
        "tune_sec": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
