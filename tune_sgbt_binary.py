"""Binary softmax-GBT as a tuned member + calibrated-ensemble re-run.

The r4 softmax GBT closed the imputer booster gap (0.4958 vs XGB 0.500);
this probes it on the BINARY loans task where MLlib GBT plateaued at
0.8713 (tuned), and re-votes the calibrated ensemble with it as a member
(reference ensemble 0.8847). Appends TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml.classification import NaiveBayes, RandomForestClassifier
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
    "sgbt_d5_i60_lr02": {"maxDepth": 5, "maxIter": 60, "stepSize": 0.2},
    "sgbt_d6_i100_lr02": {"maxDepth": 6, "maxIter": 100, "stepSize": 0.2},
    "sgbt_d3_i150_lr01": {"maxDepth": 3, "maxIter": 150, "stepSize": 0.1},
}


def main() -> None:
    spark = get_spark("sgbt-bin", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    results = {}
    best_name, best_f1, best_model = None, -1.0, None
    for name, params in CONFIGS.items():
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", **params).fit(ftr)
        pred = m.transform(fva)
        acc = pred.agg(
            F.avg((F.col("prediction") == F.col("label")).cast("double"))
        ).head()[0]
        dt = time.perf_counter() - t0
        results[name] = {"micro_f1": round(acc, 4), "sec": round(dt)}
        print(name, results[name], flush=True)
        if acc > best_f1:
            best_name, best_f1, best_model = name, acc, m

    # calibrated quartet: rf + mllib-gbt best params + nb + sgbt(best)
    rows = [json.loads(line) for line in open("TUNING.json")]
    def best_params(model):
        best, score = {}, -1.0
        for row in rows:
            res = row.get("results", {}).get(model)
            if res and res["valid"]["micro_f1"] > score:
                best, score = res["best_params"], res["valid"]["micro_f1"]
        return best
    from pyspark.ml.classification import GBTClassifier

    cal_rf = CalibratedClassifier(
        RandomForestClassifier(seed=42, **best_params("random_forest")), n_folds=5
    ).fit(ftr)
    cal_gbt = CalibratedClassifier(
        GBTClassifier(seed=42, **best_params("gbt")), n_folds=5
    ).fit(ftr)
    cal_nb = CalibratedClassifier(NaiveBayes(modelType="gaussian"), n_folds=5).fit(ftr)
    cal_sgbt = CalibratedClassifier(
        SoftmaxGBTClassifier(scoresCol="probs", **CONFIGS[best_name]),
        n_folds=5,
    ).fit(ftr)

    ens_results = {}
    for name, members in [
        ("cal_rf+cal_gbt+cal_nb+cal_sgbt", [cal_rf, cal_gbt, cal_nb, cal_sgbt]),
        ("cal_rf+cal_sgbt", [cal_rf, cal_sgbt]),
        ("cal_rf+cal_sgbt+cal_nb", [cal_rf, cal_sgbt, cal_nb]),
    ]:
        vm = binary_metrics(SoftVotingEnsemble(members).transform(fva))
        ens_results[name] = {k: round(v, 4) for k, v in vm.items()}
        print(name, ens_results[name], flush=True)

    out = {
        "probe": "sgbt_binary+calibrated_quartet",
        "member_results": results,
        "best_member": best_name,
        "ensembles": ens_results,
        "uncalibrated_best": 0.8723, "calibrated_trio": 0.8748,
        "reference_ensemble": 0.8847,
    }
    print(json.dumps(out), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
