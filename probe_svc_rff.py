"""RFF rbf-SVC stand-in probe (VERDICT r06 task 3): closes the last
documented substitution row. Reference: sklearn ``SVC()`` (rbf kernel,
C=1, gamma='scale') at micro-F1 0.88099 / hard AUC 0.70054
(/root/reference/notebooks/modeling_validation.ipynb:1040-1076); the
plain LinearSVC stand-in scored 0.8556 / 0.6652 (TUNING.json
tier3_report). RandomFourierFeatures → LinearSVC approximates the rbf
decision function with a linear fit (ml/rff.py).

Leak-free protocol:
  1. Full C6 pipeline (model imputers included) fitted on train — the
     same featured frame tier3_report's svc_serving row uses.
  2. γ = sklearn 'scale' from train; for each D in the grid, ONE RFF
     featurization of train (checkpointed), then 4-fold CV over the
     regParam grid. Selection = argmax mean CV micro-F1.
  3. ONE final serving fit at (D*, regParam*) through ServingWrapper;
     valid micro-F1 + hard AUC reported ONCE.

Appends {"probe": "svc_rff_serving", "selection": "cv", ...} to
TUNING.json.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.ml import Pipeline as MLPipeline
from pyspark.ml import PipelineModel
from pyspark.ml.classification import LinearSVC
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.cv import add_fold, pin_layout
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.rff import RandomFourierFeatures
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.pipeline.model_imputer import ServingWrapper
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

K = 4
# sklearn C=1 maps to regParam ≈ 1/(C·n) in MLlib's (λ/2)‖w‖² + mean-hinge
# objective; bracket it with heavier-regularization points. Wave 1
# (D ∈ {1000, 2000} × reg ∈ {6.6e-5, 1e-3, 1e-2}) CV-selected its grid
# EDGE (D=2000, reg=0.01, serving 0.8624/0.7034), so the grids are
# env-overridable for follow-up waves past the edge:
#   SVC_RFF_D_GRID=2000,4000 SVC_RFF_REG_GRID=0.01,0.03,0.1
# Wave 3 (r8) adds γ itself: waves 1-2 only ever used sklearn 'scale'
# (0.00138) while the reference's Optuna-tuned SVC landed at γ=0.2667,
# C=22208.6 (modeling_validation.ipynb cell 23 output) — γ=0 in the grid
# means 'scale', anything else is used verbatim:
#   SVC_RFF_GAMMA_GRID=0.05,0.267,1.0 SVC_RFF_REG_GRID=1e-8,1e-5,1e-3
D_GRID = [int(x) for x in os.environ.get("SVC_RFF_D_GRID", "1000,2000").split(",")]
REG_GRID = [float(x) for x in os.environ.get("SVC_RFF_REG_GRID", "6.6e-5,1e-3,1e-2").split(",")]
GAMMA_GRID = [float(x) for x in os.environ.get("SVC_RFF_GAMMA_GRID", "0").split(",")]
MAX_ITER = int(os.environ.get("SVC_RFF_MAX_ITER", "100"))


def main() -> None:
    spark = get_spark("svc-rff", extra_configs={"spark.sql.shuffle.partitions": "8"})
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv").cache()

    proc, feat = fit_full_pipeline(train, with_model_imputers=True)
    featured = feat.transform(proc.transform(train)).localCheckpoint()
    feature_cols = [c for c in featured.columns if c != "FINALIZED_LOAN"]
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    ftr = pin_layout(
        assembler.transform(featured).select(
            F.col("FINALIZED_LOAN").cast("double").alias("label"), "features"
        )
    ).localCheckpoint(eager=True)

    results = {}
    best = None  # (cv_f1, gamma_param, D, reg)
    gamma_resolved = {}
    # fold on the ORIGINAL features so every (γ, D, reg) cell shares the
    # identical split — comparisons across cells stay apples-to-apples
    folded = add_fold(ftr, K).localCheckpoint(eager=True)
    for g in GAMMA_GRID:
        for D in D_GRID:
            rff_model = RandomFourierFeatures(
                inputCol="features", outputCol="z", nComponents=D, gamma=g, seed=42
            ).fit(ftr)
            gamma_resolved[g] = rff_model.gamma
            z = rff_model.transform(folded).select(
                "label", "z", "_fold"
            ).localCheckpoint(eager=True)
            for reg in REG_GRID:
                f1s, aucs = [], []
                for i in range(K):
                    m = LinearSVC(
                        featuresCol="z", labelCol="label", regParam=reg,
                        maxIter=MAX_ITER,
                    ).fit(z.filter(F.col("_fold") != i))
                    met = binary_metrics(m.transform(z.filter(F.col("_fold") == i)))
                    f1s.append(met["micro_f1"])
                    aucs.append(met["roc_auc_hard"])
                cv_f1 = sum(f1s) / K
                cv_auc = sum(aucs) / K
                results[f"g{g}_D{D}_reg{reg}"] = {
                    "cv_micro_f1": round(cv_f1, 4),
                    "cv_roc_auc_hard": round(cv_auc, 4),
                }
                print(f"g={g} D={D} reg={reg}: cv micro_f1 {cv_f1:.4f} "
                      f"auc {cv_auc:.4f}", flush=True)
                if best is None or cv_f1 > best[0]:
                    best = (cv_f1, g, D, reg)

    cv_star, g_star, d_star, reg_star = best
    print(f"CV-selected: gamma={g_star} D={d_star} regParam={reg_star} "
          f"(cv {cv_star:.4f})", flush=True)

    # --- final serving fit, valid reported ONCE ---------------------------
    head = MLPipeline(stages=[
        assembler,
        RandomFourierFeatures(inputCol="features", outputCol="z",
                              nComponents=d_star, gamma=g_star, seed=42),
        LinearSVC(featuresCol="z", labelCol="FINALIZED_LOAN",
                  regParam=reg_star, maxIter=MAX_ITER),
    ]).fit(featured)
    sw = ServingWrapper(PipelineModel(stages=[proc, feat]), head)
    scored = sw.transform(
        valid.withColumn("label", valid["FINALIZED_LOAN"].cast("double"))
    )
    serving = {k: round(v, 4) for k, v in binary_metrics(scored).items()}
    print("svc_rff_serving", serving, flush=True)

    record = {
        "probe": "svc_rff_serving",
        "selection": "cv",
        "k_folds": K,
        "max_iter": MAX_ITER,
        "gamma_resolved": gamma_resolved,
        "grid": results,
        "selected": {"gamma": g_star, "nComponents": d_star, "regParam": reg_star,
                     "cv_micro_f1": round(cv_star, 4)},
        "serving_valid": serving,
        "reference_tuned_svc": {"micro_f1": 0.88099, "roc_auc_hard": 0.70054},
        "linear_svc_prior": {"micro_f1": 0.8556, "roc_auc_hard": 0.6652},
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
