"""Softmax-GBT binary wave 5: the reference-echo corner + real DART.

The reference's 0.8906 winner (modeling_validation.ipynb:422) is
booster=dart with optuna NOT tuning rate_drop — XGBoost's default
rate_drop=0.0 makes it plain gbtree with eta=0.363, lambda=5.30,
max_depth=46 (depthwise), n_estimators=100 (default). Wave 4 only ran
its three shallow/low-lr configs, so that corner (deep + high lr +
lambda≈5) is unprobed. This wave probes it directly, plus true DART
dropout (new ``dropoutRate`` param, XGBoost normalize_type='tree'
weights) which the reference had available but left off.

One long fit per config; the full iteration-saturation curve read via
``withMaxRounds`` prefix truncation (exact for DART too — weight
snapshots). Appends TUNING.json.
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
    # straight echo of the reference winner (depth capped by MLlib ≤ 30;
    # on 12k rows depthwise growth saturates well below that anyway)
    "sgbt_d12_i150_lr036_reg53": {
        "maxDepth": 12, "maxIter": 150, "stepSize": 0.363, "regLambda": 5.3,
    },
    "sgbt_d16_i120_lr036_reg53": {
        "maxDepth": 16, "maxIter": 120, "stepSize": 0.363, "regLambda": 5.3,
    },
    "sgbt_d8_i150_lr036_reg53": {
        "maxDepth": 8, "maxIter": 150, "stepSize": 0.363, "regLambda": 5.3,
    },
    # true DART on the wave-3 best shape
    "sgbt_d6_i250_lr02_dart01": {
        "maxDepth": 6, "maxIter": 250, "stepSize": 0.2, "dropoutRate": 0.1,
    },
    # DART on the echo shape
    "sgbt_d12_i150_lr036_reg53_dart01": {
        "maxDepth": 12, "maxIter": 150, "stepSize": 0.363, "regLambda": 5.3,
        "dropoutRate": 0.1,
    },
}
PREFIXES = [25, 50, 75, 100, 120, 150, 200, 250]


def main() -> None:
    spark = get_spark("sgbt-wave5", extra_configs={"spark.sql.shuffle.partitions": "8"})
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
    best = (None, None, -1.0)
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
        "probe": "sgbt_binary_wave5",
        "member_curves": results,
        "best_member": {"config": bname, "n_rounds": bn, "micro_f1": round(bf1, 4)},
        "ensembles": ens,
        "wave4_best_member": 0.8884,
        "reference_ensemble": 0.8847,
        "reference_tuned_xgb": 0.8906,
    }
    print(json.dumps(out), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
