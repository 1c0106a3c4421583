"""Leak-free n_rounds selection for the headline softmax-GBT (VERDICT r05
task 2): the 0.8921 sgbt_d16 number was read off the VALID round-curve
(best_n chosen on the reported set). This re-runs the selection the way
the reference did (CV-chosen hyperparameters, valid reported once,
modeling.py:213-233):

  1. 4-fold CV on TRAIN with the d16 config; per fold ONE fit, the
     full saturation curve read via withMaxRounds prefix truncation.
  2. n* = argmax of the MEAN CV micro-F1 curve.
  3. One fit on full train at the d16 config; valid micro-F1 reported
     ONCE at n* (and the whole valid curve recorded for transparency —
     marked as diagnostic, not selection).

Appends a {"probe": "sgbt_cv_select", "selection": "cv", ...} line to
TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.cv import add_fold
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

CONFIG = {"maxDepth": 16, "maxIter": 120, "stepSize": 0.363, "regLambda": 5.3}
PREFIXES = [25, 50, 75, 100, 120]
K = 4


def main() -> None:
    spark = get_spark("sgbt-cv-select", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).localCheckpoint(eager=True)
    fva = assemble_features(feat.transform(proc.transform(valid))).localCheckpoint(eager=True)

    folded = add_fold(ftr, K).localCheckpoint(eager=True)
    cv_curve = {n: 0.0 for n in PREFIXES}
    fold_secs = []
    for i in range(K):
        tr = folded.filter(F.col("_fold") != i).drop("_fold")
        te = folded.filter(F.col("_fold") == i).drop("_fold").cache()
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", **CONFIG).fit(tr)
        fold_secs.append(round(time.perf_counter() - t0))
        for n in PREFIXES:
            f1 = binary_metrics(m.withMaxRounds(n).transform(te))["micro_f1"]
            cv_curve[n] += f1 / K
        te.unpersist()
        print(f"fold {i}: fit {fold_secs[-1]}s, curve so far "
              f"{ {n: round(v, 4) for n, v in cv_curve.items()} }", flush=True)

    n_star = max(cv_curve, key=cv_curve.get)
    print(f"CV-selected n*={n_star} (mean cv micro_f1={cv_curve[n_star]:.4f})", flush=True)

    # --- final: ONE fit on full train, valid reported once at n* ---------
    t0 = time.perf_counter()
    final = SoftmaxGBTClassifier(scoresCol="probs", **CONFIG).fit(ftr)
    final_sec = round(time.perf_counter() - t0)
    headline = round(
        binary_metrics(final.withMaxRounds(n_star).transform(fva))["micro_f1"], 4
    )
    # diagnostic only (NOT used for selection): the full valid curve
    diag = {
        n: round(binary_metrics(final.withMaxRounds(n).transform(fva))["micro_f1"], 4)
        for n in PREFIXES
    }
    print(f"valid micro_f1 at n*={n_star}: {headline} (diagnostic curve {diag})", flush=True)

    record = {
        "probe": "sgbt_cv_select",
        "selection": "cv",
        "config": CONFIG,
        "k_folds": K,
        "cv_curve_mean": {n: round(v, 4) for n, v in cv_curve.items()},
        "n_star": n_star,
        "valid_micro_f1_at_n_star": headline,
        "valid_curve_diagnostic": diag,
        "fold_fit_secs": fold_secs,
        "final_fit_sec": final_sec,
        "reference_tuned_xgb": 0.8906,
        "curve_selected_prior": 0.8921,
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
