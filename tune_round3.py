"""Round-3 Tier-3 tuning push (VERDICT r02 task 4): close the gap to the
reference's tuned-XGB valid micro-F1 0.8906 (BASELINE.md;
notebooks/modeling_validation.ipynb:407-422) or record the family plateau.

Changes vs the r02 runs (TUNING.json lines 1-2):
- RF: successive halving with ``min_fraction=0.25`` and eta=2 — r02's
  unfloored SHA (rung-0 at 1.6% of the data) mis-ranked the high-variance
  RF configs and lost to 8-trial random search (0.8705 < 0.8742); the
  floor keeps the screening rungs honest. 64 configs over a WIDENED space
  (featureSubsetStrategy + maxBins join the reference dims).
- GBT: TPE-lite (the adaptive-search stand-in for the reference's optuna
  TPE), 20 trials ≈ 2.5× the r02 random budget with model-guided draws.

Appends one JSON line to TUNING.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.ml.classification import GBTClassifier, RandomForestClassifier

from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.tuning import (
    GBT_SPACE,
    RF_SPACE,
    optimize_sha,
    optimize_tpe,
)
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

RF_SPACE_WIDE = {
    **RF_SPACE,
    "featureSubsetStrategy": ("choice", ["auto", "all", "onethird", "sqrt", "log2", "0.5"]),
    "maxBins": ("choice", [32, 64, 128]),
}


def main() -> None:
    rf_configs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    gbt_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("tune-r3", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    results = {}

    t0 = time.perf_counter()
    out = optimize_sha(
        lambda **kw: RandomForestClassifier(seed=42, **kw),
        RF_SPACE_WIDE,
        ftr,
        n_configs=rf_configs,
        eta=2,
        min_fraction=0.25,
        cv_folds=4,
        metric="micro_f1",
    )
    best = RandomForestClassifier(seed=42, **out["best_params"]).fit(ftr)
    vm = binary_metrics(best.transform(fva))
    results["random_forest_sha_floored"] = {
        "best_params": out["best_params"],
        "cv_micro_f1": out["best_value"],
        "rungs": out["rungs"],
        "valid": {k: round(v, 4) for k, v in vm.items()},
        "tune_sec": round(time.perf_counter() - t0, 1),
    }
    print("rf", json.dumps(results["random_forest_sha_floored"]), flush=True)

    t0 = time.perf_counter()
    out = optimize_tpe(
        lambda **kw: GBTClassifier(seed=42, **kw),
        GBT_SPACE,
        ftr,
        n_trials=gbt_trials,
        n_startup=8,
        cv_folds=4,
        metric="micro_f1",
    )
    best = GBTClassifier(seed=42, **out["best_params"]).fit(ftr)
    vm = binary_metrics(best.transform(fva))
    results["gbt_tpe"] = {
        "best_params": out["best_params"],
        "cv_micro_f1": out["best_value"],
        "trial_values": [round(t["value"], 5) for t in out["trials"]],
        "valid": {k: round(v, 4) for k, v in vm.items()},
        "tune_sec": round(time.perf_counter() - t0, 1),
    }
    print("gbt", json.dumps(results["gbt_tpe"]), flush=True)

    with open("TUNING.json", "a") as fh:
        fh.write(
            json.dumps(
                {
                    "search": "r3_sha_floored_rf+tpe_gbt",
                    "n_configs": {"rf": rf_configs, "gbt_trials": gbt_trials},
                    "results": results,
                }
            )
            + "\n"
        )


if __name__ == "__main__":
    main()
