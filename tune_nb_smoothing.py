"""Gaussian NB var_smoothing sweep + final-model serving parity row.

The reference's tuned/final classifier is GaussianNB(var_smoothing=
9.027e-05), found with 100 optuna trials each refitting 5-fold CV
(modeling_validation.ipynb:608-614; modeling.py:223-233). The engine's
closed-form NB (ml/gaussian_nb.py) makes the same search ~free: the
sufficient statistics are smoothing-independent, so the sweep is ONE fit
per fold plus a cheap confusion aggregation per (fold, ε) on a cached
frame — an exhaustive log-grid, strictly denser than 100 TPE trials on a
1-D knob.

Protocol (selection-bias-clean, mirrors the reference):
  1. ε grid selected by 5-fold-CV micro-F1 on TRAIN only.
  2. Valid metrics reported at the selected ε (the BASELINE.md tuned-NB
     row: micro 0.82782, hard AUC 0.83619, class-1 P/R/F1 0.47/0.85/0.60).
  3. Full C6 serving-path row (raw CSV → pipeline incl. model imputers →
     NB), the reference's shipped FinalModel (:2741-2767, AUC 0.83619).

Appends one {"probe": "nb_smoothing_sweep", ...} line to TUNING.json.
"""

from __future__ import annotations

import json
import time

from pyspark.ml import Pipeline as MLPipeline
from pyspark.ml import PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.cv import add_fold
from consumer_loans_analysis_spark.ml.gaussian_nb import GaussianNBClassifier
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ServingWrapper
from consumer_loans_analysis_spark.session import get_spark

GRID = [10 ** (-9 + 9 * i / 45) for i in range(46)]  # 1e-9 … 1, log-uniform
K = 5
REF_EPS = 9.027e-05


def main() -> None:
    spark = get_spark("nb-smoothing", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t0 = time.perf_counter()
    from consumer_loans_analysis_spark.sources.readers import read_loans_csv

    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv").cache()
    proc, feat = fit_full_pipeline(train, with_model_imputers=True)
    pipe = PipelineModel(stages=[proc, feat])
    # localCheckpoint, NOT cache (tier3_report's lesson): the transform
    # plan embeds the fitted RF imputer models, and a cached frame still
    # ships that lineage (~177 MB measured) in EVERY task binary — fatal
    # for a sweep that runs 5×46 tiny aggregations. Checkpointing
    # truncates the lineage so each agg broadcasts KBs.
    ftr = assemble_features(pipe.transform(train)).localCheckpoint(eager=True)
    fva = assemble_features(pipe.transform(valid)).localCheckpoint(eager=True)

    # --- 5-fold CV sweep: one NB fit per fold, one tiny agg per (fold, ε)
    folded = add_fold(ftr, K).cache()
    folded.count()
    cv_scores = {eps: 0.0 for eps in GRID}
    for i in range(K):
        tr = folded.filter(F.col("_fold") != i)
        te = folded.filter(F.col("_fold") == i).cache()
        base = GaussianNBClassifier(varSmoothing=1e-9).fit(tr)
        for eps in GRID:
            m = binary_metrics(base.withVarSmoothing(eps).transform(te))
            cv_scores[eps] += m["micro_f1"] / K
        te.unpersist()
        print(f"fold {i} done", flush=True)
    best_eps = max(cv_scores, key=cv_scores.get)
    print(f"best eps={best_eps:.3e} cv_micro_f1={cv_scores[best_eps]:.4f}", flush=True)

    # --- tuned-NB row: fit on full train, report valid at selected ε -----
    full = GaussianNBClassifier(varSmoothing=best_eps).fit(ftr)
    tuned_valid = {k: round(v, 4) for k, v in binary_metrics(full.transform(fva)).items()}
    at_ref_eps = {k: round(v, 4) for k, v in
                  binary_metrics(full.withVarSmoothing(REF_EPS).transform(fva)).items()}
    print("tuned_valid", tuned_valid, flush=True)
    print("at_ref_eps", at_ref_eps, flush=True)

    # --- final shipped model: full C6 serving path -----------------------
    feature_cols = [c for c in pipe.transform(train).columns if c != "FINALIZED_LOAN"]
    head = MLPipeline(stages=[
        VectorAssembler(inputCols=feature_cols, outputCol="features"),
        GaussianNBClassifier(varSmoothing=best_eps, labelCol="FINALIZED_LOAN"),
    ]).fit(pipe.transform(train))
    sw = ServingWrapper(pipe, head)
    scored = sw.transform(valid.withColumn("label", valid["FINALIZED_LOAN"].cast("double")))
    serving = {k: round(v, 4) for k, v in binary_metrics(scored).items()}
    print("final_serving", serving, flush=True)

    record = {
        "probe": "nb_smoothing_sweep",
        "grid_points": len(GRID),
        "cv_curve_sample": {f"{eps:.2e}": round(cv_scores[eps], 4)
                            for eps in GRID[::5]},
        "best_eps": best_eps,
        "cv_micro_f1_at_best": round(cv_scores[best_eps], 4),
        "valid_at_best": tuned_valid,
        "valid_at_reference_eps": at_ref_eps,
        "final_serving_at_best": serving,
        "reference": {"eps": REF_EPS, "micro_f1": 0.82782,
                      "roc_auc_hard": 0.83619, "p1": 0.47, "r1": 0.85,
                      "f1_1": 0.60},
        "sec_total": round(time.perf_counter() - t0),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
