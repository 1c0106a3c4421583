"""Bounded wave 2 of the joint leak-free CV search (VERDICT r7 task 4):
one last attempt at the reference's tuned single-model bar, then the
ledger closes.

The r7 joint search (tune_sgbt_cv_joint.py, TUNING.json `sgbt_cv_joint`)
CV-selected d16+colsample0.8@100 (mean CV 0.8859, valid-once 0.8856) vs
the reference's 100-trial-optuna dart-XGB at 0.8906
(/root/reference/notebooks/modeling_validation.ipynb:407-422). It never
tried depth > 16 or DART **on the winning col08 config** — exactly the
four cells this wave runs (<= 4 configs x 4 folds, VERDICT's cap):

  d20_col08, d24_col08, d16_col08_dart005, d16_col08_dart01

Protocol identical to wave 1 (same add_fold seed-42 folds, layout-pinned
frames, withMaxRounds prefix curves, CV argmax over (config, n) with the
r7 winner's CV curve reused as a zero-cost candidate, ONE final fit,
valid reported once). Whatever the outcome, COVERAGE.md records the
family ceiling and the ledger closes.

Appends {"probe": "sgbt_cv_wave2", "selection": "cv", ...} to TUNING.json.
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
# r7 sgbt_cv_joint, same folds: the winning config's mean CV curve,
# reused as a candidate without re-fitting (leak-free: CV-only numbers).
CENTER = {
    "name": "d16_lr036_reg53_col08 (r7 winner, reused)",
    "params": {"maxDepth": 16, "maxIter": 100, "stepSize": 0.363,
               "regLambda": 5.3, "featureSubsetStrategy": "0.8"},
    "cv_curve": {25: 0.8788, 50: 0.8847, 75: 0.8848, 100: 0.8859},
}

COL08 = {"stepSize": 0.363, "regLambda": 5.3, "featureSubsetStrategy": "0.8"}
CONFIGS = [
    {"name": "d20_col08",
     "params": {"maxDepth": 20, "maxIter": 100, **COL08},
     "prefixes": [25, 50, 75, 100]},
    {"name": "d24_col08",
     "params": {"maxDepth": 24, "maxIter": 100, **COL08},
     "prefixes": [25, 50, 75, 100]},
    {"name": "d16_col08_dart005",
     "params": {"maxDepth": 16, "maxIter": 120, "dropoutRate": 0.05, **COL08},
     "prefixes": [25, 50, 75, 100, 120]},
    {"name": "d16_col08_dart01",
     "params": {"maxDepth": 16, "maxIter": 120, "dropoutRate": 0.1, **COL08},
     "prefixes": [25, 50, 75, 100, 120]},
]


def main() -> None:
    spark = get_spark(
        "sgbt-cv-wave2", extra_configs={"spark.sql.shuffle.partitions": "8"}
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

    # --- joint argmax over (config, n), r7 winner included ----------------
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
        "probe": "sgbt_cv_wave2",
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
        "r7_cv_selected": 0.8856,
        "note": "final bounded attempt at the single-model bar; the family "
                "ceiling line in COVERAGE.md closes the ledger either way",
        "sec_total": round(time.perf_counter() - t_start),
    }
    print(json.dumps(record), flush=True)
    with open("TUNING.json", "a") as fh:
        fh.write(json.dumps(record) + "\n")


if __name__ == "__main__":
    main()
