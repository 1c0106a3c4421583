"""Leak-free 5-seed soft ensemble at the jointly-CV-selected config
(round-7 companion to tune_sgbt_cv_joint): the joint 4-fold CV search
selected d16 + featureSubsetStrategy 0.8 @ n=100 (TUNING.json
`sgbt_cv_joint`, mean CV 0.8859, single-model valid 0.8856). Soft
probability averaging over fixed seeds is the engine's standard
variance reduction (it lifted the EMPLOYEE_NO imputer past its bar —
IMPUTER_TUNING.json `emp_soft_avg`); this run applies it to the
headline model with NO valid-side selection:

  - config AND n_rounds fixed by the joint CV search (no knob chosen
    on valid);
  - members = seeds 42 / 7 / 99 / 13 / 57 (the same a-priori seed set
    as emp_soft_avg), each fit at exactly 100 rounds on the
    layout-pinned train frame;
  - uniform soft vote (SoftVotingEnsemble averages the per-class
    softmax scores; no weight tuning);
  - valid micro-F1 reported ONCE per row (each member + the 3-seed and
    5-seed votes).

Appends {"probe": "ensemble_cv5", "selection": "cv", ...} to TUNING.json.
"""

from __future__ import annotations

import json
import time

from consumer_loans_analysis_spark.ml.cv import pin_layout
from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

# TUNING.json sgbt_cv_joint "selected": d16_lr036_reg53_col08, n*=100
CONFIG = {"maxDepth": 16, "maxIter": 100, "stepSize": 0.363, "regLambda": 5.3,
          "featureSubsetStrategy": "0.8"}
SEEDS = [42, 7, 99, 13, 57]


def main() -> None:
    spark = get_spark("ensemble-cv5", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = pin_layout(
        assemble_features(feat.transform(proc.transform(train)))
    ).localCheckpoint(eager=True)
    fva = assemble_features(feat.transform(proc.transform(valid))).localCheckpoint(eager=True)

    members, member_f1, fit_secs = [], {}, []
    for s in SEEDS:
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", seed=s, parallelism=8, **CONFIG).fit(ftr)
        fit_secs.append(round(time.perf_counter() - t0))
        members.append(m)
        member_f1[s] = round(binary_metrics(m.transform(fva))["micro_f1"], 4)
        print(f"seed {s}: fit {fit_secs[-1]}s, valid micro_f1 {member_f1[s]}", flush=True)

    vote3 = binary_metrics(SoftVotingEnsemble(members[:3]).transform(fva))
    vote5 = binary_metrics(SoftVotingEnsemble(members).transform(fva))
    print("uniform 3-seed vote:", {k: round(v, 4) for k, v in vote3.items()}, flush=True)
    print("uniform 5-seed vote:", {k: round(v, 4) for k, v in vote5.items()}, flush=True)

    record = {
        "probe": "ensemble_cv5",
        "selection": "cv",
        "config": CONFIG,
        "n_rounds": 100,
        "seeds": SEEDS,
        "layout": "pin_layout(parts=8, seed=7) on train",
        "member_valid_micro_f1": member_f1,
        "vote3_valid": {k: round(v, 4) for k, v in vote3.items()},
        "vote5_valid": {k: round(v, 4) for k, v in vote5.items()},
        "fit_secs": fit_secs,
        "reference_ensemble": 0.8847,
        "reference_tuned_xgb": 0.8906,
        "r6_ensemble_cv_select_vote3": 0.8875,
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
