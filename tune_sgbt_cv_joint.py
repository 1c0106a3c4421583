"""Joint leak-free CV hyperparameter search for the headline softmax-GBT
(VERDICT r06 task 1): the r6 `sgbt_cv_select` probe CV-selected only
n_rounds at the r5-fixed config (d16/lr0.363/λ5.3 → valid 0.8884 vs the
reference's 100-trial-optuna dart-XGB 0.8906,
/root/reference/notebooks/modeling_validation.ipynb:407-422). This run
searches (maxDepth, stepSize, regLambda, subsamplingRate,
featureSubsetStrategy, DART drop-rate) JOINTLY under CV selection:

  1. Same 4 folds as sgbt_cv_select (add_fold seed 42) on TRAIN.
  2. Per (config, fold): ONE fit; the full n_rounds saturation curve
     read via withMaxRounds prefix truncation (bit-equal to shorter
     fits — softmax_gbt.SoftmaxGBTModel.withMaxRounds).
  3. (config*, n*) = argmax of the MEAN CV micro-F1 over all configs ×
     prefixes — including the r6-recorded center config curve as a
     zero-cost baseline candidate (same folds, leak-free to reuse).
  4. ONE final fit at config* on full (layout-pinned) train; valid
     micro-F1 reported ONCE at n*. Valid curve recorded as diagnostic.

Training frames are layout-pinned (ml.cv.pin_layout) so every number in
the record replays bit-for-bit (VERDICT r06 task 5).

Appends {"probe": "sgbt_cv_joint", "selection": "cv", ...} to TUNING.json.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.cv import add_fold, pin_layout
from consumer_loans_analysis_spark.ml.metrics import binary_metrics
from consumer_loans_analysis_spark.ml.softmax_gbt import SoftmaxGBTClassifier
from consumer_loans_analysis_spark.ml.zoo import assemble_features
from consumer_loans_analysis_spark.pipeline.loans import fit_full_pipeline
from consumer_loans_analysis_spark.session import get_spark
from consumer_loans_analysis_spark.sources.readers import read_loans_csv

K = 4
# r6 sgbt_cv_select, same folds: CV mean curve for the center config —
# reused as a candidate without re-fitting (leak-free: CV-only numbers).
CENTER = {
    "name": "d16_lr036_reg53 (r6 center, reused)",
    "params": {"maxDepth": 16, "maxIter": 120, "stepSize": 0.363, "regLambda": 5.3},
    "cv_curve": {25: 0.8757, 50: 0.8816, 75: 0.8822, 100: 0.8820, 120: 0.8818},
}

CONFIGS = [
    # wave4's valid-curve winner region (d12/lr0.35/λ5/sub0.8) — never CV-checked
    {"name": "d12_lr035_reg5_s08",
     "params": {"maxDepth": 12, "maxIter": 150, "stepSize": 0.35, "regLambda": 5.0,
                "subsamplingRate": 0.8},
     "prefixes": [50, 75, 100, 125, 150]},
    # center + stochastic row subsampling
    {"name": "d16_lr036_reg53_s08",
     "params": {"maxDepth": 16, "maxIter": 100, "stepSize": 0.363, "regLambda": 5.3,
                "subsamplingRate": 0.8},
     "prefixes": [25, 50, 75, 100]},
    # depth midpoint
    {"name": "d14_lr035_reg5_s08",
     "params": {"maxDepth": 14, "maxIter": 120, "stepSize": 0.35, "regLambda": 5.0,
                "subsamplingRate": 0.8},
     "prefixes": [25, 50, 75, 100, 120]},
    # center + per-node column subsampling (XGB colsample analog)
    {"name": "d16_lr036_reg53_col08",
     "params": {"maxDepth": 16, "maxIter": 100, "stepSize": 0.363, "regLambda": 5.3,
                "featureSubsetStrategy": "0.8"},
     "prefixes": [25, 50, 75, 100]},
    # DART at the d12 config (the reference's tuned booster is dart-XGB)
    {"name": "d12_lr035_reg5_s08_dart005",
     "params": {"maxDepth": 12, "maxIter": 150, "stepSize": 0.35, "regLambda": 5.0,
                "subsamplingRate": 0.8, "dropoutRate": 0.05},
     "prefixes": [50, 75, 100, 125, 150]},
    # slow-learn / heavier-reg corner
    {"name": "d16_lr02_reg8_s08",
     "params": {"maxDepth": 16, "maxIter": 150, "stepSize": 0.2, "regLambda": 8.0,
                "subsamplingRate": 0.8},
     "prefixes": [50, 75, 100, 125, 150]},
]


def main() -> None:
    spark = get_spark(
        "sgbt-cv-joint", extra_configs={"spark.sql.shuffle.partitions": "8"}
    )
    t_start = time.perf_counter()
    train = read_loans_csv(spark, "/root/reference/data/orig_train.csv").cache()
    valid = read_loans_csv(spark, "/root/reference/data/orig_valid.csv")
    proc, feat = fit_full_pipeline(train, with_model_imputers=False)
    ftr = pin_layout(
        assemble_features(feat.transform(proc.transform(train)))
    ).localCheckpoint(eager=True)
    fva = assemble_features(feat.transform(proc.transform(valid))).localCheckpoint(eager=True)

    folded = add_fold(ftr, K).localCheckpoint(eager=True)
    fold_frames = []
    for i in range(K):
        tr = pin_layout(
            folded.filter(F.col("_fold") != i).drop("_fold")
        ).localCheckpoint(eager=True)
        te = folded.filter(F.col("_fold") == i).drop("_fold").localCheckpoint(eager=True)
        fold_frames.append((tr, te))

    results = {}

    def run_fold(cfg, i):
        tr, te = fold_frames[i]
        t0 = time.perf_counter()
        m = SoftmaxGBTClassifier(scoresCol="probs", parallelism=8, **cfg["params"]).fit(tr)
        sec = round(time.perf_counter() - t0)
        curve = {
            n: binary_metrics(m.withMaxRounds(n).transform(te))["micro_f1"]
            for n in cfg["prefixes"]
        }
        print(f"  {cfg['name']} fold {i}: fit {sec}s curve "
              f"{ {n: round(v, 4) for n, v in curve.items()} }", flush=True)
        return curve, sec

    for cfg in CONFIGS:
        print(f"config {cfg['name']} ...", flush=True)
        with ThreadPoolExecutor(max_workers=2) as pool:
            per_fold = list(pool.map(lambda i: run_fold(cfg, i), range(K)))
        mean_curve = {
            n: sum(pf[0][n] for pf in per_fold) / K for n in cfg["prefixes"]
        }
        results[cfg["name"]] = {
            "params": cfg["params"],
            "cv_curve_mean": {n: round(v, 4) for n, v in mean_curve.items()},
            "fold_fit_secs": [pf[1] for pf in per_fold],
        }
        print(f"config {cfg['name']} CV mean curve "
              f"{results[cfg['name']]['cv_curve_mean']}", flush=True)

    # --- joint argmax over (config, n), center included -------------------
    candidates = [
        (name, n, v)
        for name, r in results.items()
        for n, v in r["cv_curve_mean"].items()
    ] + [(CENTER["name"], n, v) for n, v in CENTER["cv_curve"].items()]
    best_name, n_star, cv_star = max(candidates, key=lambda t: t[2])
    print(f"CV-selected: {best_name} n*={n_star} (mean cv micro_f1={cv_star:.4f})",
          flush=True)

    if best_name == CENTER["name"]:
        best_params = dict(CENTER["params"])
    else:
        best_params = dict(results[best_name]["params"])
    best_params["maxIter"] = max(best_params.get("maxIter", n_star), n_star)

    # --- final: ONE fit on full pinned train, valid reported once at n* ---
    t0 = time.perf_counter()
    final = SoftmaxGBTClassifier(scoresCol="probs", parallelism=8, **best_params).fit(ftr)
    final_sec = round(time.perf_counter() - t0)
    headline = round(
        binary_metrics(final.withMaxRounds(n_star).transform(fva))["micro_f1"], 4
    )
    if best_name == CENTER["name"]:
        prefixes = sorted(set(CENTER["cv_curve"]) | {n_star})
    else:
        prefixes = sorted(set(results[best_name]["cv_curve_mean"]) | {n_star})
    diag = {
        n: round(binary_metrics(final.withMaxRounds(n).transform(fva))["micro_f1"], 4)
        for n in prefixes
    }
    print(f"valid micro_f1 at n*={n_star}: {headline} (diagnostic curve {diag})",
          flush=True)

    record = {
        "probe": "sgbt_cv_joint",
        "selection": "cv",
        "k_folds": K,
        "layout": "pin_layout(parts=8, seed=7) on train and every fold",
        "configs": results,
        "center_reused": CENTER,
        "selected": {"config": best_name, "params": best_params,
                     "n_star": n_star, "cv_micro_f1": round(cv_star, 4)},
        "valid_micro_f1_at_n_star": headline,
        "valid_curve_diagnostic": diag,
        "final_fit_sec": final_sec,
        "reference_tuned_xgb": 0.8906,
        "r6_cv_selected_center": 0.8884,
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
