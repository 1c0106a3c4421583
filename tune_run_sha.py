"""Tier-3 tuning, round 2: successive-halving search at a larger screened
budget than tune_run.py's 8-trial random search (VERDICT r01 task 6/7).

SHA screens 32 RF / 16 GBT configs for roughly the full-evaluation cost of
6 / 4.6 random trials (early rungs score on a sampled frame), then refits
the winner on full train and scores valid — same protocol and spaces as
tune_run.py, so rows are comparable. Appends one JSON line to TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml.classification import GBTClassifier, RandomForestClassifier

from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.tuning import GBT_SPACE, RF_SPACE, optimize_sha
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv


def main() -> None:
    spark = get_spark("tune-sha", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    results = {}
    for name, cls, space, n_configs in [
        ("random_forest", RandomForestClassifier, RF_SPACE, 32),
        ("gbt", GBTClassifier, GBT_SPACE, 16),
    ]:
        t0 = time.perf_counter()
        out = optimize_sha(
            lambda **kw: cls(seed=42, **kw),
            space,
            ftr,
            n_configs=n_configs,
            eta=4,
            cv_folds=4,
            metric="micro_f1",
        )
        best = cls(seed=42, **out["best_params"]).fit(ftr)
        vm = binary_metrics(best.transform(fva))
        results[name] = {
            "best_params": out["best_params"],
            "cv_micro_f1": out["best_value"],
            "rungs": out["rungs"],
            "valid": {k: round(v, 4) for k, v in vm.items()},
            "tune_sec": round(time.perf_counter() - t0, 1),
        }
        print(name, json.dumps(results[name]), flush=True)

    with open("TUNING.json", "a") as fh:
        fh.write(
            json.dumps({"search": "sha", "n_configs": {"rf": 32, "gbt": 16}, "results": results})
            + "\n"
        )


if __name__ == "__main__":
    main()
