"""Softmax-GBT binary wave 4: take the reference tuned-XGB bar (0.8906).

Wave 3 was still monotone in iterations (i150 → i200: 0.8875 → 0.8884).
This wave fits ONE long run per config (i400) and reads the whole
iteration-saturation curve with ``SoftmaxGBTModel.withMaxRounds`` prefix
truncation (bit-equal to shorter fits — pinned in tests): early stopping
at 1× fit cost. The best (config, n) then gets a 2-/3-seed vote.

Appends TUNING.json. Reference bars: ensemble 0.8847
(modeling_validation.ipynb:1100, already beaten), tuned dart-XGB 0.8906
(:422).
"""

from __future__ import annotations

import json
import sys
import time

from consumer_loans_analysis_spark.ml.ensemble import SoftVotingEnsemble
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

CONFIGS = {
    "sgbt_d6_i400_lr02": {"maxDepth": 6, "maxIter": 400, "stepSize": 0.2},
    "sgbt_d6_i400_lr015": {"maxDepth": 6, "maxIter": 400, "stepSize": 0.15},
    "sgbt_d7_i300_lr015": {"maxDepth": 7, "maxIter": 300, "stepSize": 0.15},
    # reference dart-XGB shape: eta 0.363, lambda 5.30, very deep trees
    # (depth 46; MLlib caps at 30 — probe the deep+regularized corner)
    "sgbt_d8_i250_lr03_reg5": {
        "maxDepth": 8, "maxIter": 250, "stepSize": 0.3, "regLambda": 5.0,
    },
    "sgbt_d10_i200_lr035_reg5": {
        "maxDepth": 10, "maxIter": 200, "stepSize": 0.35, "regLambda": 5.0,
    },
    "sgbt_d12_i150_lr035_reg5_s08": {
        "maxDepth": 12, "maxIter": 150, "stepSize": 0.35, "regLambda": 5.0,
        "subsamplingRate": 0.8,
    },
}
PREFIXES = [50, 75, 100, 150, 200, 250, 300, 350, 400]


def main() -> None:
    spark = get_spark("sgbt-wave4", extra_configs={"spark.sql.shuffle.partitions": "8"})
    names = sys.argv[1:] or list(CONFIGS)
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()
    fva.count()

    results = {}
    fitted = {}
    best = (None, None, -1.0)  # (config, n, micro_f1)
    for name in names:
        params = CONFIGS[name]
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", **params).fit(ftr)
        fit_sec = round(time.perf_counter() - t0)
        fitted[name] = m
        curve = {}
        for n in [p for p in PREFIXES if p <= params["maxIter"]]:
            vm = binary_metrics(m.withMaxRounds(n).transform(fva))
            curve[n] = round(vm["micro_f1"], 4)
            print(f"{name} @ {n:3d}: micro_f1={vm['micro_f1']:.4f}", flush=True)
            if vm["micro_f1"] > best[2]:
                best = (name, n, vm["micro_f1"])
        results[name] = {"curve": curve, "fit_sec": fit_sec}

    bname, bn, bf1 = best
    print(f"best member: {bname} @ {bn} = {bf1:.4f}", flush=True)

    # seed committee at the best (config, n): the seed-42 member is FREE
    # (prefix truncation of the long fit is bit-equal to a maxIter=bn fit)
    bparams = {**CONFIGS[bname], "maxIter": bn}
    members = [fitted[bname].withMaxRounds(bn)]
    for s in (7, 99):
        members.append(
            SoftmaxGBTClassifier(scoresCol="probs", seed=s, **bparams).fit(ftr)
        )
    ens = {}
    for ename, ms, w in [
        ("2seed_vote", members[:2], None),
        ("3seed_vote", members, None),
        ("3seed_weighted_211", members, [2.0, 1.0, 1.0]),
    ]:
        vm = binary_metrics(SoftVotingEnsemble(ms, weights=w).transform(fva))
        ens[ename] = {k: round(v, 4) for k, v in vm.items()}
        print(ename, ens[ename], flush=True)

    out = {
        "probe": "sgbt_binary_wave4",
        "member_curves": results,
        "best_member": {"config": bname, "n_rounds": bn, "micro_f1": round(bf1, 4)},
        "ensembles": ens,
        "wave3_best_member": 0.8884,
        "reference_ensemble": 0.8847,
        "reference_tuned_xgb": 0.8906,
    }
    print(json.dumps(out), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
