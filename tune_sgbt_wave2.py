"""Softmax-GBT wave 2 on the binary loans task: deeper/longer configs.

Wave 1 (TUNING.json `sgbt_binary+calibrated_quartet`) found a single
sgbt member at 0.8853 valid accuracy — above the reference ensemble
(0.8847); the remaining bar is the reference's tuned dart-XGB 0.8906
(/root/reference/notebooks/modeling_validation.ipynb:422). This wave
probes depth/length/subsample around the d6_i100_lr02 winner, then
votes the best two configs (different seeds) plus the calibrated RF.
Appends TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml.classification import RandomForestClassifier
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.calibration import CalibratedClassifier
from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

CONFIGS = {
    "sgbt_d6_i150_lr02": {"maxDepth": 6, "maxIter": 150, "stepSize": 0.2},
    "sgbt_d7_i100_lr02": {"maxDepth": 7, "maxIter": 100, "stepSize": 0.2},
    "sgbt_d6_i100_lr02_s08": {
        "maxDepth": 6, "maxIter": 100, "stepSize": 0.2, "subsamplingRate": 0.8,
    },
    "sgbt_d6_i150_lr01": {"maxDepth": 6, "maxIter": 150, "stepSize": 0.1},
}


def main() -> None:
    spark = get_spark("sgbt-wave2", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    results = {}
    fitted = {}
    for name, params in CONFIGS.items():
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", **params).fit(ftr)
        pred = m.transform(fva)
        vm = binary_metrics(pred)
        dt = time.perf_counter() - t0
        results[name] = {**{k: round(v, 4) for k, v in vm.items()}, "sec": round(dt)}
        fitted[name] = m
        print(name, results[name], flush=True)

    best = max(results, key=lambda k: results[k]["micro_f1"])
    # second fit of the best config with a different seed for a 2-member vote
    alt = SoftmaxGBTClassifier(scoresCol="probs", seed=7, **CONFIGS[best]).fit(ftr)
    rows = [json.loads(line) for line in open("TUNING.json")]
    rf_params, score = {}, -1.0
    for row in rows:
        res = row.get("results", {}).get("random_forest")
        if res and res["valid"]["micro_f1"] > score:
            rf_params, score = res["best_params"], res["valid"]["micro_f1"]
    cal_rf = CalibratedClassifier(
        RandomForestClassifier(seed=42, **rf_params), n_folds=5
    ).fit(ftr)

    ens_results = {}
    for ename, members in [
        ("sgbt_best+sgbt_seed7", [fitted[best], alt]),
        ("sgbt_best+sgbt_seed7+cal_rf", [fitted[best], alt, cal_rf]),
        ("sgbt_best+cal_rf", [fitted[best], cal_rf]),
    ]:
        vm = binary_metrics(SoftVotingEnsemble(members).transform(fva))
        ens_results[ename] = {k: round(v, 4) for k, v in vm.items()}
        print(ename, ens_results[ename], flush=True)

    out = {
        "probe": "sgbt_binary_wave2",
        "member_results": results,
        "best_member": best,
        "ensembles": ens_results,
        "wave1_best_member": 0.8853,
        "reference_ensemble": 0.8847,
        "reference_tuned_xgb": 0.8906,
    }
    print(json.dumps(out), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
