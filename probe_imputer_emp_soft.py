"""Soft-probability seed-bagging probe for the EMPLOYEE_NO imputer
(VERDICT r06 tasks 2 + 5). The r6 `emp_vote` probe majority-voted the
LABELS of 3 seeds (0.4762 vs the reference bar 0.47903,
/root/reference/notebooks/eda_processing.ipynb:2661); averaging the
per-class PROBABILITIES is the standard stronger variance reduction at
identical members (soft vs hard voting — same machinery as M7's
soft-voting ensemble). This probe:

  1. Layout-pins the prepared train frame (ml.cv.pin_layout) so every
     fit is replayable — task 5's reproducibility requirement.
  2. Fits the fixed d14_i80_lr02 softmax-GBT imputer under 5 FIXED seeds
     (42/7/99/13/57 — chosen before any scoring; no seed selection).
  3. Scores the valid hidden-target frame with each member's per-class
     softmax probabilities (SoftmaxGBTModel scoresCol), averages the 5
     probability arrays row-wise, argmax → label.
  4. Reports: each member, the 5-seed soft average, the first-3-seed
     soft average (comparable to r6's 3-seed vote), and a same-config
     same-seed REFIT of seed 42 to demonstrate layout-pinned
     reproducibility (f1 must match to 4 decimals; row-level
     disagreements counted).

Appends {"probe": "emp_soft_avg"} to IMPUTER_TUNING.json.
"""

from __future__ import annotations

import json
import time
from functools import reduce

from pyspark.ml import Pipeline
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.cv import pin_layout
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
SEEDS = [42, 7, 99, 13, 57]
PARAMS = {"maxDepth": 14, "maxIter": 80, "stepSize": 0.2}


def fit_member(ptrain, seed: int):
    fitted = ModelImputer(
        targetCol=TARGET, sentinel=None, excludePrefixes=["ECONOMIC_SECTOR_"],
        classifierFamily="gbt_softmax", seed=seed, **PARAMS,
    ).fit(ptrain)
    # expose the softmax probability array on the inner classifier
    fitted.inner.stages[-1]._set(scoresCol="_mi_scores")
    return fitted


def main() -> None:
    spark = get_spark("probe_emp_soft", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv")
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    base = build_processing_pipeline(with_model_imputers=False)
    prep = Pipeline(
        stages=base.getStages()[:-1]
        + [BucketOrdinalEncoder(inputCol="EMPLOYEE_NO", outputCol=TARGET, mapping=EMPLOYEE_NO_MAP)]
    ).fit(train)
    ptrain = pin_layout(prep.transform(train)).localCheckpoint(eager=True)
    pvalid = prep.transform(valid).localCheckpoint(eager=True)

    present = pvalid.filter(F.col(TARGET).isNotNull())
    hidden = present.withColumn("_truth", F.col(TARGET)).withColumn(
        TARGET, F.lit(None).cast(present.schema[TARGET].dataType)
    )
    hidden = hidden.withColumn("_rid", F.monotonically_increasing_id()).localCheckpoint(eager=True)

    member_f1, frames, fit_secs = {}, [], []
    labels_ref = None
    for s in SEEDS:
        t0 = time.perf_counter()
        fitted = fit_member(ptrain, s)
        fit_secs.append(round(time.perf_counter() - t0))
        labels = fitted.spec["labels"]
        if labels_ref is None:
            labels_ref = labels
        assert labels == labels_ref, f"label order differs for seed {s}"
        out = fitted.inner.transform(hidden).select(
            "_rid", "_truth",
            F.col("_mi_prediction").alias(f"_p{s}"),
            F.col("_mi_scores").alias(f"_s{s}"),
        ).localCheckpoint(eager=True)
        lab_arr = F.array(*[F.lit(l) for l in labels])
        f1 = micro_f1_multiclass(
            out.withColumn(
                "_plab",
                F.element_at(lab_arr, F.col(f"_p{s}").cast("int") + 1).cast("double"),
            ),
            "_truth", "_plab",
        )
        member_f1[s] = round(f1, 4)
        frames.append(out if not frames else out.drop("_truth"))
        print(f"seed {s}: fit {fit_secs[-1]}s, member f1 {member_f1[s]}", flush=True)

    joined = reduce(lambda a, b: a.join(b, "_rid"), frames).localCheckpoint(eager=True)
    lab_arr = F.array(*[F.lit(l) for l in labels_ref])

    def soft_avg_f1(seeds: list[int]) -> float:
        ssum = reduce(
            lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
            [F.col(f"_s{s}") for s in seeds],
        )
        # argmax (first max on ties — deterministic), map through labels
        pred = F.element_at(
            lab_arr, F.array_position(ssum, F.array_max(ssum)).cast("int")
        ).cast("double")
        return round(
            micro_f1_multiclass(joined.withColumn("_soft", pred), "_truth", "_soft"), 4
        )

    soft5 = soft_avg_f1(SEEDS)
    soft3 = soft_avg_f1(SEEDS[:3])
    print(f"soft-avg f1: 5 seeds {soft5}, first 3 seeds {soft3}", flush=True)

    # --- reproducibility: same-config same-seed refit on the pinned frame --
    t0 = time.perf_counter()
    refit = fit_member(ptrain, SEEDS[0])
    refit_sec = round(time.perf_counter() - t0)
    rout = refit.inner.transform(hidden).select(
        "_rid", F.col("_mi_prediction").alias("_p_refit")
    )
    lab42 = F.element_at(
        lab_arr, F.col("_p_refit").cast("int") + 1
    ).cast("double")
    rjoin = joined.select("_rid", "_truth", f"_p{SEEDS[0]}").join(rout, "_rid")
    rjoin = rjoin.withColumn("_plab_refit", lab42).withColumn(
        "_plab_orig",
        F.element_at(lab_arr, F.col(f"_p{SEEDS[0]}").cast("int") + 1).cast("double"),
    )
    refit_f1 = round(micro_f1_multiclass(rjoin, "_truth", "_plab_refit"), 4)
    disagreements = rjoin.filter(F.col("_plab_refit") != F.col("_plab_orig")).count()
    print(f"seed-42 refit f1 {refit_f1} (orig {member_f1[SEEDS[0]]}); "
          f"row disagreements vs original: {disagreements}", flush=True)

    record = {
        "probe": "emp_soft_avg",
        "config": PARAMS, "seeds": SEEDS,
        "layout": "pin_layout(parts=8, seed=7) on prepared train",
        "member_f1": {str(s): member_f1[s] for s in SEEDS},
        "soft_avg_5seed_f1": soft5,
        "soft_avg_3seed_f1": soft3,
        "refit_determinism": {
            "seed": SEEDS[0], "orig_f1": member_f1[SEEDS[0]], "refit_f1": refit_f1,
            "row_disagreements": disagreements, "refit_sec": refit_sec,
        },
        "fit_secs": fit_secs,
        "reference_tuned_xgb": 0.47903,
        "r6_vote_f1": 0.4762,
        "note": ("5 fixed seeds chosen a priori; soft-probability average "
                 "(argmax of mean softmax scores), no seed or threshold "
                 "selection. Method differs from the reference's single "
                 "XGB (best of 100 optuna trials) — reported as the "
                 "engine's variance-reduction path."),
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("IMPUTER_TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
