"""Hyperparameter search (M5/M6).

The reference tunes with optuna TPE + MedianPruner (modeling.py:213-233).
optuna is not in this container, so the harness offers:

- ``optimize``: SEEDED RANDOM SEARCH over the same declared spaces
  (documented substitution; random search is the standard strong baseline
  for TPE), and
- ``optimize_sha``: SUCCESSIVE HALVING (Jamieson & Talwalkar, AISTATS'16 —
  the algorithm under Hyperband/ASHA and the pruner role in the reference's
  MedianPruner): many configs at a small data fraction, promote the top
  1/eta each rung, full data only for the finalists. At the same total
  budget it evaluates ~eta× more configurations than random search.

The structure matches the reference: ``optimize(space, objective,
n_trials)`` where each objective evaluation is a Spark-evaluated CV mean;
``best_trial`` re-fits on the full train (create_best_estimator,
modeling.py:186-210).

Search spaces are data (FIXTURES.md §4), declared as dicts:
    {"maxDepth": ("int", 1, 20), "stepSize": ("loguniform", 0.01, 1.0)}
"""

from __future__ import annotations

import math

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
    for name, spec in space.items():
        kind = spec[0]
        if kind == "choice":
            out[name] = spec[1][int(rng.integers(0, len(spec[1])))]
            continue
        _, lo, hi = spec
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


def successive_halving(
    evaluate,
    space: dict,
    n_configs: int = 16,
    eta: int = 4,
    seed: int = 42,
) -> dict:
    """Generic successive halving (maximize). ``evaluate(params, fraction)``
    scores a config at a resource fraction in (0, 1]; rung r of s runs the
    surviving configs at fraction eta^(r-s), keeping the top ceil(n/eta).

    Total budget in full-evaluation units is Σ n_r·f_r ≈ s+1 — at the cost
    of ~``n_configs``/(s+1)× random-search trials it screens ``n_configs``
    configurations. Pure driver-side control flow: the evaluate callable
    owns all Spark work, which keeps this testable against synthetic
    objectives.
    """
    rng = np.random.default_rng(seed)
    survivors = [sample_params(space, rng) for _ in range(n_configs)]
    s = max(1, math.ceil(math.log(n_configs, eta)))
    trials, rungs = [], []
    for r in range(s + 1):
        fraction = float(eta ** (r - s))
        scored = []
        for params in survivors:
            value = float(evaluate(params, fraction))
            scored.append((value, params))
            trials.append(
                {"rung": r, "fraction": fraction, "params": params, "value": value}
            )
        scored.sort(key=lambda t: t[0], reverse=True)
        keep = max(1, math.ceil(len(scored) / eta)) if r < s else 1
        survivors = [p for _, p in scored[:keep]]
        rungs.append(
            {"rung": r, "fraction": fraction, "n": len(scored), "best": scored[0][0]}
        )
    best_value, best_params = max(
        ((t["value"], t["params"]) for t in trials if t["fraction"] == 1.0),
        key=lambda t: t[0],
    )
    return {
        "best_params": best_params,
        "best_value": best_value,
        "trials": trials,
        "rungs": rungs,
    }


def optimize_sha(
    estimator_class,
    space: dict,
    df,
    n_configs: int = 16,
    eta: int = 4,
    cv_folds: int = 5,
    metric: str = "f1",
    seed: int = 42,
    fixed_params: dict | None = None,
) -> dict:
    """Successive-halving maximize over Spark CV: early rungs score on a
    deterministic sample of the (cached) frame, the final rung on all of
    it. Same return shape as ``optimize``."""

    def evaluate(params, fraction):
        sub = df if fraction >= 1.0 else df.sample(fraction=fraction, seed=seed)
        folds = cross_validate(
            lambda: estimator_class(**{**params, **(fixed_params or {})}),
            sub,
            k=cv_folds,
            seed=seed,
        )
        return cv_summary(folds)[metric]

    return successive_halving(evaluate, space, n_configs=n_configs, eta=eta, seed=seed)
