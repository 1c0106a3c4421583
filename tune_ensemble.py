"""Tier-3 ensemble reproduction, round 2: soft-voting over the TUNED
members instead of defaults (reference: VotingClassifier over tuned
XGB + GaussianNB + SVC, valid micro-F1 0.8847 — BASELINE.md).

Members: best-tuned RF and GBT (params from TUNING.json rows) + NB (the
reference's probabilistic member). Appends one JSON line to TUNING.json.
"""

from __future__ import annotations

import json

from pyspark.ml.classification import (
    GBTClassifier,
    NaiveBayes,
    RandomForestClassifier,
)

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
    print("members: rf", rf_params, rf_f1, "| gbt", gbt_params, gbt_f1)

    spark = get_spark("tune-ens", extra_configs={"spark.sql.shuffle.partitions": "8"})
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = assemble_features(feat.transform(proc.transform(train))).cache()
    ftr.count()
    fva = assemble_features(feat.transform(proc.transform(valid))).cache()

    members = [
        RandomForestClassifier(seed=42, **rf_params).fit(ftr),
        GBTClassifier(seed=42, **gbt_params).fit(ftr),
        NaiveBayes(modelType="gaussian").fit(ftr),
    ]
    ens = SoftVotingEnsemble(members)
    vm = binary_metrics(ens.transform(fva))
    out = {
        "ensemble": "soft_voting(tuned_rf, tuned_gbt, gaussian_nb)",
        "member_valid_micro_f1": {"rf": rf_f1, "gbt": gbt_f1},
        "valid": {k: round(v, 4) for k, v in vm.items()},
        "reference_ensemble": 0.8847,
    }
    print(json.dumps(out))
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
