"""Calibrated soft-voting ensembles (VERDICT r03 task 3).

r3 measured: voting over UNcalibrated members gives 0.8723 (rf+gbt) and
0.8417 (trio with NB — its overconfident probabilities dominate the vote).
This re-runs the reference trio shape with out-of-fold isotonic
calibration (ml/calibration.py) per member. Reference: 0.8847
(modeling_validation.ipynb:1100). Appends TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml.classification import (
    GBTClassifier,
    NaiveBayes,
    RandomForestClassifier,
)

from consumer_loans_analysis_spark.ml.calibration import CalibratedClassifier
from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv


def _best_params(rows: list[dict], model: str) -> tuple[dict, float]:
    best, score = {}, -1.0
    for row in rows:
        res = row.get("results", {}).get(model)
        if res and res["valid"]["micro_f1"] > score:
            best, score = res["best_params"], res["valid"]["micro_f1"]
    return best, score


def main() -> None:
    rows = [json.loads(line) for line in open("TUNING.json")]
    rf_params, rf_f1 = _best_params(rows, "random_forest")
    gbt_params, gbt_f1 = _best_params(rows, "gbt")
    print("members: rf", rf_params, rf_f1, "| gbt", gbt_params, gbt_f1, flush=True)

    spark = get_spark("tune-cal-ens", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    t0 = time.perf_counter()
    cal_rf = CalibratedClassifier(
        RandomForestClassifier(seed=42, **rf_params), n_folds=5
    ).fit(ftr)
    cal_gbt = CalibratedClassifier(
        GBTClassifier(seed=42, **gbt_params), n_folds=5
    ).fit(ftr)
    cal_nb = CalibratedClassifier(NaiveBayes(modelType="gaussian"), n_folds=5).fit(ftr)
    print(f"calibrated members in {time.perf_counter()-t0:.0f}s", flush=True)

    results = {}
    for name, members in [
        ("cal_rf+cal_gbt", [cal_rf, cal_gbt]),
        ("cal_rf+cal_gbt+cal_nb", [cal_rf, cal_gbt, cal_nb]),
        ("cal_rf+cal_nb", [cal_rf, cal_nb]),
    ]:
        vm = binary_metrics(SoftVotingEnsemble(members).transform(fva))
        results[name] = {k: round(v, 4) for k, v in vm.items()}
        print(name, results[name], flush=True)

    out = {
        "ensemble": "calibrated_soft_voting (isotonic OOF, 5-fold)",
        "results": results,
        "uncalibrated_best": 0.8723,
        "reference_ensemble": 0.8847,
    }
    print(json.dumps(out), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
