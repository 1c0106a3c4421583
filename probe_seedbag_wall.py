"""seedBag fit-cost re-measurement (round 8, VERDICT r7 task 3).

Round 7 measured ``ModelImputer(seedBag=5)`` at the EMPLOYEE_NO config at
2115 s wall (IMPUTER_TUNING.json ``emp_seedbag_native``). Round 8 removed
the two serializers that number hid:

1. ``_extract_tree_from_save`` rebuilt each tree via a per-row Python
   loop over ``to_pylist()`` rows — GIL-held driver work (~2 s/round per
   member) that serialized concurrent member fits. Now a column-wise
   numpy build (bit-equal, pinned by
   test_extract_tree_from_save_bit_equal_to_py4j_walk).
2. The member ThreadPool was capped at 4 workers, so bag=5 ran as a wave
   of 4 plus one serialized tail member. Now all members are in flight.

Acceptance: SAME prediction output (bit-equal member trees via
pin_layout + unchanged seeds ⇒ identical valid micro-F1 0.4830) at
<= 60% of the r7 wall (<= 1269 s). Appends
{"probe": "emp_seedbag_wall_r8"} to IMPUTER_TUNING.json.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.ml import Pipeline

from consumer_loans_analysis_spark.ml.cv import pin_layout
from consumer_loans_analysis_spark.ml.imputer_eval import evaluate_imputer
from consumer_loans_analysis_spark.pipeline.loans import (
    EMPLOYEE_NO_MAP,
    build_processing_pipeline,
)
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.pipeline.stages import BucketOrdinalEncoder
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

TARGET = "EMPLOYEE_NO_NUM"
PARAMS = {"maxDepth": 14, "maxIter": 80, "stepSize": 0.2}
BAG = 5
BASE_SEED = 42  # member seeds: 42, 7961, 15880, 23799, 31718 (same as r7)


def main() -> None:
    spark = get_spark("probe_seedbag_wall",
                      extra_configs={"spark.sql.shuffle.partitions": "8"})
    loadavg = os.getloadavg()[0]
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(
        stages=base.getStages()[:-1]
        + [BucketOrdinalEncoder(inputCol="EMPLOYEE_NO", outputCol=TARGET,
                                mapping=EMPLOYEE_NO_MAP)]
    ).fit(train)
    ptrain = pin_layout(prep.transform(train)).localCheckpoint(eager=True)
    pvalid = prep.transform(valid).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    fitted = ModelImputer(
        targetCol=TARGET, sentinel=None, excludePrefixes=["ECONOMIC_SECTOR_"],
        classifierFamily="gbt_softmax", seed=BASE_SEED, seedBag=BAG, **PARAMS,
    ).fit(ptrain)
    fit_sec = round(time.perf_counter() - t0)
    f1 = round(evaluate_imputer(fitted, pvalid, TARGET, sentinel=None), 4)
    print(f"seedBag={BAG} micro-F1: {f1} (fit {fit_sec}s, r7 was 2115s)",
          flush=True)

    record = {
        "probe": "emp_seedbag_wall_r8",
        "config": {**PARAMS, "seedBag": BAG, "seed": BASE_SEED},
        "layout": "pin_layout(parts=8, seed=7) on prepared train",
        "valid_micro_f1": f1,
        "expected_micro_f1": 0.483,
        "fit_sec": fit_sec,
        "r7_fit_sec": 2115,
        "target_fit_sec": 1269,
        "loadavg_at_start": round(loadavg, 2),
        "changes": ["vectorized _extract_tree_from_save (bit-equal pin)",
                    "member pool 4 -> bag workers"],
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
