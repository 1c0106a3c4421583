"""Hyperparameter search (M5/M6).

The reference tunes with optuna TPE + MedianPruner (modeling.py:213-233).
optuna is not in this container, so the harness is a SEEDED RANDOM SEARCH
over the same declared spaces (documented substitution; random search is the
standard strong baseline for TPE). The structure matches the reference:
``optimize(space, objective, n_trials)`` where each objective evaluation is
a Spark-evaluated CV mean; ``best_trial`` re-fits on the full train
(create_best_estimator, modeling.py:186-210).

Search spaces are data (FIXTURES.md §4), declared as dicts:
    {"maxDepth": ("int", 1, 20), "stepSize": ("loguniform", 0.01, 1.0)}
"""

from __future__ import annotations

import numpy as np

from consumer_loans_analysis_spark.ml.cv import cross_validate, cv_summary

# FIXTURES.md §4 — translated to MLlib parameter names.
GBT_SPACE = {
    "maxDepth": ("int", 1, 12),
    "stepSize": ("loguniform", 0.01, 1.0),
    "maxIter": ("int", 20, 150),
    "subsamplingRate": ("loguniform", 0.1, 1.0),
    "minInstancesPerNode": ("int", 1, 20),
}

GAUSSIAN_NB_SPACE = {
    "smoothing": ("loguniform", 1e-10, 10.0),
}

LINEAR_SVC_SPACE = {
    "regParam": ("loguniform", 1e-6, 10.0),
    "maxIter": ("int", 50, 200),
}

RF_SPACE = {
    "numTrees": ("int", 50, 300),
    "maxDepth": ("int", 2, 16),
    "minInstancesPerNode": ("int", 1, 20),
    "subsamplingRate": ("loguniform", 0.3, 1.0),
}


def sample_params(space: dict, rng: np.random.Generator) -> dict:
    out = {}
    for name, (kind, lo, hi) in space.items():
        if kind == "int":
            out[name] = int(rng.integers(lo, hi + 1))
        elif kind == "uniform":
            out[name] = float(rng.uniform(lo, hi))
        elif kind == "loguniform":
            out[name] = float(np.exp(rng.uniform(np.log(lo), np.log(hi))))
        else:
            raise ValueError(kind)
    return out


def optimize(
    estimator_class,
    space: dict,
    df,
    n_trials: int = 20,
    cv_folds: int = 5,
    metric: str = "f1",
    seed: int = 42,
    fixed_params: dict | None = None,
) -> dict:
    """Random-search maximize: returns {'best_params', 'best_value', 'trials'}.
    Each trial = k-fold CV on the cached frame (cluster-parallel fits)."""
    rng = np.random.default_rng(seed)
    trials = []
    best = {"value": -1.0, "params": None}
    for t in range(n_trials):
        params = sample_params(space, rng)
        params.update(fixed_params or {})
        folds = cross_validate(
            lambda: estimator_class(**params), df, k=cv_folds, seed=seed
        )
        value = cv_summary(folds)[metric]
        trials.append({"trial": t, "params": params, "value": value})
        if value > best["value"]:
            best = {"value": value, "params": params}
    return {"best_params": best["params"], "best_value": best["value"], "trials": trials}
