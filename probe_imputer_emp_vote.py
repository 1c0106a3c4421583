"""3-seed majority-vote probe for the EMPLOYEE_NO imputer (r6 follow-up to
IMPUTER_TUNING.json `emp_seed_robustness_summary`): single-seed d14_i80
clears the reference bar only for seed 42 (0.4802/0.4762/0.4694, mean
0.4753 vs 0.47903). Seed-bagging is the standard variance-reduction
response — this probe fits the SAME config under seeds 42/7/99 and scores
the row-wise MAJORITY VOTE of the three imputed labels (ties → seed 42's
label, the deterministic first member), alongside each member, under the
identical evaluate_imputer protocol. If the vote clears the bar, the
claim is robust (no seed selection: all three members participate); the
method difference vs the reference's single XGB is stated with the
result.

Appends {"probe": "emp_vote"} to IMPUTER_TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.metrics import micro_f1_multiclass
from consumer_loans_analysis_spark.pipeline.loans import (
    EMPLOYEE_NO_MAP,
    build_processing_pipeline,
)
from consumer_loans_analysis_spark.pipeline.model_imputer import ModelImputer
from consumer_loans_analysis_spark.pipeline.stages import BucketOrdinalEncoder
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

TARGET = "EMPLOYEE_NO_NUM"
SEEDS = [42, 7, 99]
PARAMS = {"maxDepth": 14, "maxIter": 80, "stepSize": 0.2}


def main() -> None:
    spark = get_spark("probe_emp_vote", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(
        stages=base.getStages()[:-1]
        + [BucketOrdinalEncoder(inputCol="EMPLOYEE_NO", outputCol=TARGET, mapping=EMPLOYEE_NO_MAP)]
    ).fit(train)
    ptrain = prep.transform(train).localCheckpoint(eager=True)
    pvalid = prep.transform(valid).localCheckpoint(eager=True)

    # hidden-target frame (evaluate_imputer's protocol, shared by all members)
    present = pvalid.filter(F.col(TARGET).isNotNull())
    hidden = present.withColumn("_truth", F.col(TARGET)).withColumn(
        TARGET, F.lit(None).cast(present.schema[TARGET].dataType)
    )
    # stable row key for the vote join (row order is not guaranteed
    # across the three transforms)
    hidden = hidden.withColumn("_rid", F.monotonically_increasing_id()).localCheckpoint(eager=True)

    member_f1, preds, fit_secs = {}, [], []
    for s in SEEDS:
        t0 = time.perf_counter()
        fitted = ModelImputer(
            targetCol=TARGET, sentinel=None, excludePrefixes=["ECONOMIC_SECTOR_"],
            classifierFamily="gbt_softmax", seed=s, **PARAMS,
        ).fit(ptrain)
        fit_secs.append(round(time.perf_counter() - t0))
        out = fitted.transform(hidden).select(
            "_rid", "_truth", F.col(TARGET).alias(f"_p{s}")
        ).localCheckpoint(eager=True)
        member_f1[s] = round(micro_f1_multiclass(out, "_truth", f"_p{s}"), 4)
        preds.append(out.select("_rid", f"_p{s}") if preds else out)
        print(f"seed {s}: fit {fit_secs[-1]}s, member f1 {member_f1[s]}", flush=True)

    joined = preds[0]
    for p in preds[1:]:
        joined = joined.join(p, "_rid")
    # majority of 3; 3-way tie → seed 42 (first member, deterministic)
    a, b, c = [F.col(f"_p{s}") for s in SEEDS]
    vote = (
        F.when(b == c, b)  # b==c covers {a,b,c} majorities where a is odd one
        .otherwise(a)      # a==b, a==c, or 3-way tie all resolve to a
    )
    voted = joined.withColumn("_vote", vote)
    vote_f1 = round(micro_f1_multiclass(voted, "_truth", "_vote"), 4)
    print(f"3-seed majority vote f1: {vote_f1}", flush=True)

    record = {
        "probe": "emp_vote",
        "config": PARAMS, "seeds": SEEDS,
        "member_f1": member_f1,
        "vote_f1": vote_f1,
        "fit_secs": fit_secs,
        "reference_tuned_xgb": 0.47903,
        "note": ("majority vote of 3 fixed seeds, no seed selection; tie -> "
                 "first member. Method differs from the reference's single "
                 "XGB — reported as the engine's variance-reduction path, "
                 "not as like-for-like parity."),
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
