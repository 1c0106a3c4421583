"""Leak-free 3-seed ensemble headline (companion to tune_sgbt_cv_select):
the r5 ensemble number 0.8940 voted members truncated at the
valid-curve-selected n. This re-pins it with NO valid-side selection:

  - config = the d16 corner, n_rounds = 75, both fixed by
    tune_sgbt_cv_select's 4-fold CV on TRAIN (TUNING.json
    sgbt_cv_select: n*=75, mean cv 0.8822);
  - members = seeds 42 / 7 / 99 fit at exactly 75 rounds;
  - uniform soft vote (no weight tuning — weights were the other
    valid-selected knob in the r5 number);
  - valid micro-F1 reported ONCE per row (members + vote).

Appends {"probe": "ensemble_cv_select", "selection": "cv", ...} to
TUNING.json.
"""

from __future__ import annotations

import json
import time

from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

CONFIG = {"maxDepth": 16, "maxIter": 75, "stepSize": 0.363, "regLambda": 5.3}
SEEDS = [42, 7, 99]


def main() -> None:
    spark = get_spark("ensemble-cv", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).localCheckpoint(eager=True)
    fva = assemble_features(feat.transform(proc.transform(valid))).localCheckpoint(eager=True)

    members, member_f1, fit_secs = [], {}, []
    for s in SEEDS:
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", seed=s, **CONFIG).fit(ftr)
        fit_secs.append(round(time.perf_counter() - t0))
        members.append(m)
        member_f1[s] = round(binary_metrics(m.transform(fva))["micro_f1"], 4)
        print(f"seed {s}: fit {fit_secs[-1]}s, valid micro_f1 {member_f1[s]}", flush=True)

    vote = binary_metrics(SoftVotingEnsemble(members).transform(fva))
    print("uniform 3-seed vote:", {k: round(v, 4) for k, v in vote.items()}, flush=True)

    record = {
        "probe": "ensemble_cv_select",
        "selection": "cv",
        "config": CONFIG,
        "seeds": SEEDS,
        "member_valid_micro_f1": member_f1,
        "vote_valid": {k: round(v, 4) for k, v in vote.items()},
        "fit_secs": fit_secs,
        "reference_ensemble": 0.8847,
        "reference_tuned_xgb": 0.8906,
        "r5_curve_selected_ensemble": 0.8940,
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
