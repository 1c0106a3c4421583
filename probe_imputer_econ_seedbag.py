"""Engine-native seedBag run at the ECONOMIC_SECTOR config (round 7).

ECONOMIC_SECTOR already passes its reference bar seed-robustly
(IMPUTER_TUNING.json `econ_seed_robustness_summary`: 0.5089 ± 0.0022
across 3 seeds vs the reference tuned-XGB 0.500). This probe scores the
first-class ``ModelImputer(seedBag=5)`` soft vote at the same
sgbt_d7_i100_lr02 config — the expected outcome is at or above the
single-seed band (soft voting reduced variance and added ~+0.006 on
EMPLOYEE_NO). Reported once, selection-free.

Appends {"probe": "econ_seedbag_native"} to IMPUTER_TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.ml.cv import pin_layout
from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer
from consumer_loans_analysis_spark.pipeline.loans import build_processing_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

TARGET = "ECONOMIC_SECTOR"
PARAMS = {"maxDepth": 7, "maxIter": 100, "stepSize": 0.2}
BAG = 5
BASE_SEED = 42


def main() -> None:
    spark = get_spark("probe_econ_seedbag",
                      extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(stages=base.getStages()[:-1]).fit(train)
    ptrain = pin_layout(prep.transform(train)).localCheckpoint(eager=True)
    pvalid = prep.transform(valid).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    fitted = ModelImputer(
        targetCol=TARGET, sentinel="Missing",
        classifierFamily="gbt_softmax", seed=BASE_SEED, seedBag=BAG, **PARAMS,
    ).fit(ptrain)
    fit_sec = round(time.perf_counter() - t0)
    f1 = round(evaluate_imputer(fitted, pvalid, TARGET), 4)
    print(f"engine-native seedBag={BAG} micro-F1: {f1} (fit {fit_sec}s)", flush=True)

    record = {
        "probe": "econ_seedbag_native",
        "config": {**PARAMS, "seedBag": BAG, "seed": BASE_SEED,
                   "member_seeds": [BASE_SEED + 7919 * i for i in range(BAG)]},
        "layout": "pin_layout(parts=8, seed=7) on prepared train",
        "valid_micro_f1": f1,
        "reference_tuned_xgb": 0.5,
        "single_seed_band": "0.5089 +/- 0.0022 (econ_seed_robustness_summary)",
        "note": ("first-class seedBag soft vote at the recorded config; "
                 "reported once, selection-free"),
        "fit_sec": fit_sec,
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
