"""Tier-3 tuning reproduction (M5/M6): random-search GBT + RF against the
reference's tuned-XGB valid micro-F1 of 0.8906 (BASELINE.md).

Runs the full EP1+EP2 pipeline, searches the FIXTURES spaces with the
seeded random-search harness, refits the best params on full train, and
reports valid metrics as one JSON line (appended to TUNING.json).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.ml.classification import GBTClassifier, RandomForestClassifier

from consumer_loans_analysis_spark.ml.cv import cv_summary
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.tuning import GBT_SPACE, RF_SPACE, optimize
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("tune", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    results = {}
    for name, cls, space in [
        ("gbt", GBTClassifier, GBT_SPACE),
        ("random_forest", RandomForestClassifier, RF_SPACE),
    ]:
        t0 = time.perf_counter()
        out = optimize(
            lambda **kw: cls(seed=42, **kw),
            space,
            ftr,
            n_trials=n_trials,
            cv_folds=4,
            metric="micro_f1",
        )
        best = cls(seed=42, **out["best_params"]).fit(ftr)
        vm = binary_metrics(best.transform(fva))
        results[name] = {
            "best_params": out["best_params"],
            "cv_micro_f1": out["best_value"],
            "valid": {k: round(v, 4) for k, v in vm.items()},
            "tune_sec": round(time.perf_counter() - t0, 1),
        }
        print(name, json.dumps(results[name]), flush=True)

    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps({"n_trials": n_trials, "results": results}) + "\n")


if __name__ == "__main__":
    main()
