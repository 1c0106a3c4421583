"""Hyperparameter search (M5/M6).

The reference tunes with optuna TPE + MedianPruner (modeling.py:213-233).
optuna is not in this container, so the harness offers:

- ``optimize``: SEEDED RANDOM SEARCH over the same declared spaces
  (documented substitution; random search is the standard strong baseline
  for TPE),
- ``optimize_sha``: SUCCESSIVE HALVING (Jamieson & Talwalkar, AISTATS'16 —
  the algorithm under Hyperband/ASHA and the pruner role in the reference's
  MedianPruner): many configs at a small data fraction, promote the top
  1/eta each rung, full data only for the finalists. At the same total
  budget it evaluates ~eta× more configurations than random search. Pass
  ``min_fraction`` for high-variance estimators (RF) — unfloored rungs
  mis-rank them (measured, TUNING.json), and
- ``optimize_tpe``: TPE-LITE (Bergstra et al., NeurIPS 2011 — the same
  estimator family optuna's TPESampler implements): factored Parzen
  densities over the top-γ vs rest trials, candidates drawn from the
  good-trial kernels, argmax l(x)/g(x). Beats seeded random search at
  equal budget on the fixed synthetic objective (tests/test_ml.py) and
  on the live GBT task (TUNING.json r3: guided trials 14-20 all above
  the random-startup band).

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
    min_fraction: float | None = None,
) -> dict:
    """Generic successive halving (maximize). ``evaluate(params, fraction)``
    scores a config at a resource fraction in (0, 1]; rung r of s runs the
    surviving configs at fraction eta^(r-s), keeping the top ceil(n/eta).

    ``min_fraction`` floors the rung resource: aggressive geometric floors
    (1/eta^s — e.g. 1.6% of the data for 32 configs at eta=4) mis-rank
    HIGH-VARIANCE estimators whose tiny-sample CV score is mostly noise
    (measured on RF in TUNING.json: 32-config SHA at floor 0.0156 lost to
    8-trial random search). A floor of ~0.25 keeps rung-0 screening honest
    at ~4× the cost of the unfloored rung — still far cheaper than random
    search at equal coverage.

    Total budget in full-evaluation units is Σ n_r·f_r ≈ s+1 — at the cost
    of ~``n_configs``/(s+1)× random-search trials it screens ``n_configs``
    configurations. Pure driver-side control flow: the evaluate callable
    owns all Spark work, which keeps this testable against synthetic
    objectives.
    """
    import json as _json

    rng = np.random.default_rng(seed)
    survivors = [sample_params(space, rng) for _ in range(n_configs)]
    s = max(1, math.ceil(math.log(n_configs, eta)))
    trials, rungs = [], []
    memo: dict[tuple[str, float], float] = {}
    for r in range(s + 1):
        fraction = float(eta ** (r - s))
        if min_fraction is not None:
            fraction = max(fraction, float(min_fraction))
        scored = []
        for params in survivors:
            # floored schedules give consecutive rungs the SAME fraction;
            # evaluate is deterministic per (config, fraction), so memoize
            # instead of burning budget re-scoring survivors (observed: a
            # 64-config floored run re-evaluated rungs 1-4 verbatim)
            key = (_json.dumps(params, sort_keys=True), fraction)
            if key not in memo:
                memo[key] = float(evaluate(params, fraction))
                trials.append(
                    {"rung": r, "fraction": fraction, "params": params, "value": memo[key]}
                )
            value = memo[key]
            scored.append((value, params))
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
    min_fraction: float | None = None,
) -> dict:
    """Successive-halving maximize over Spark CV: early rungs score on a
    deterministic sample of the (cached) frame, the final rung on all of
    it. Same return shape as ``optimize``. Pass ``min_fraction`` (e.g.
    0.25) for high-variance estimators — see ``successive_halving``."""

    def evaluate(params, fraction):
        sub = df if fraction >= 1.0 else df.sample(fraction=fraction, seed=seed)
        folds = cross_validate(
            lambda: estimator_class(**{**params, **(fixed_params or {})}),
            sub,
            k=cv_folds,
            seed=seed,
        )
        return cv_summary(folds)[metric]

    return successive_halving(
        evaluate, space, n_configs=n_configs, eta=eta, seed=seed,
        min_fraction=min_fraction,
    )


# --- TPE-lite (M5 last increment) --------------------------------------------

def _to_unit(space_spec, value):
    """Map a sampled value into the dimension's continuous search space
    coordinate (log space for loguniform; identity otherwise)."""
    kind = space_spec[0]
    if kind == "loguniform":
        return math.log(value)
    return float(value)


def _tpe_suggest(space: dict, trials: list[dict], rng, gamma=0.25, n_candidates=24):
    """Propose one config by the tree-structured Parzen estimator rule
    (Bergstra et al., NeurIPS 2011): split completed trials into the top
    ``gamma`` fraction (l) and the rest (g); model each as a per-dimension
    kernel density (Gaussian over the numeric coordinate, add-one
    categorical frequencies for choices); sample candidates from l and
    keep the one maximizing l(x)/g(x). Factored (independent-dimension)
    densities — the 'tree' part is trivial here because the spaces have
    no conditional structure."""
    ordered = sorted(trials, key=lambda t: t["value"], reverse=True)
    n_top = max(2, int(math.ceil(gamma * len(ordered))))
    top = ordered[:n_top]
    rest = ordered[n_top:] if len(ordered) > n_top else ordered[-2:]

    def kde_logpdf(points, x, lo, hi):
        pts = np.asarray(points, dtype=float)
        span = hi - lo if hi > lo else 1.0
        bw = max(pts.std() * len(pts) ** -0.2, 0.05 * span)
        z = (x - pts[:, None]) / bw
        return np.log(
            np.exp(-0.5 * z * z).mean(axis=0) / (bw * math.sqrt(2 * math.pi)) + 1e-300
        )

    best_score, best_params = -np.inf, None
    for _ in range(n_candidates):
        cand, log_l, log_g = {}, 0.0, 0.0
        for name, spec in space.items():
            kind = spec[0]
            if kind == "choice":
                options = list(spec[1])
                top_counts = np.array(
                    [1 + sum(1 for t in top if t["params"][name] == o) for o in options],
                    dtype=float,
                )
                rest_counts = np.array(
                    [1 + sum(1 for t in rest if t["params"][name] == o) for o in options],
                    dtype=float,
                )
                p_top = top_counts / top_counts.sum()
                idx = int(rng.choice(len(options), p=p_top))
                cand[name] = options[idx]
                log_l += math.log(p_top[idx])
                log_g += math.log(rest_counts[idx] / rest_counts.sum())
                continue
            _, lo, hi = spec
            zlo, zhi = (_to_unit(spec, lo), _to_unit(spec, hi))
            top_z = [_to_unit(spec, t["params"][name]) for t in top]
            rest_z = [_to_unit(spec, t["params"][name]) for t in rest]
            # sample the candidate coordinate from l's kernel mixture
            center = top_z[int(rng.integers(0, len(top_z)))]
            span = zhi - zlo if zhi > zlo else 1.0
            bw = max(np.std(top_z) * len(top_z) ** -0.2, 0.05 * span)
            z = float(np.clip(rng.normal(center, bw), zlo, zhi))
            log_l += float(kde_logpdf(top_z, np.array([z]), zlo, zhi)[0])
            log_g += float(kde_logpdf(rest_z, np.array([z]), zlo, zhi)[0])
            if kind == "int":
                cand[name] = int(round(float(np.clip(z, lo, hi))))
            elif kind == "loguniform":
                cand[name] = float(math.exp(z))
            else:
                cand[name] = float(z)
        score = log_l - log_g
        if score > best_score:
            best_score, best_params = score, cand
    return best_params


def tpe_search(
    evaluate,
    space: dict,
    n_trials: int = 20,
    n_startup: int = 8,
    gamma: float = 0.25,
    n_candidates: int = 24,
    seed: int = 42,
) -> dict:
    """Generic TPE-lite maximize: ``n_startup`` seeded-random trials, then
    each subsequent trial evaluates the l/g-ratio-maximizing candidate.
    Same driver-side-control-flow/testability contract as
    ``successive_halving`` — ``evaluate(params) -> value``."""
    rng = np.random.default_rng(seed)
    trials = []
    for t in range(n_trials):
        if t < n_startup or len(trials) < 4:
            params = sample_params(space, rng)
        else:
            params = _tpe_suggest(
                space, trials, rng, gamma=gamma, n_candidates=n_candidates
            )
        value = float(evaluate(params))
        trials.append({"trial": t, "params": params, "value": value})
    best = max(trials, key=lambda t: t["value"])
    return {"best_params": best["params"], "best_value": best["value"], "trials": trials}


def optimize_tpe(
    estimator_class,
    space: dict,
    df,
    n_trials: int = 20,
    n_startup: int = 8,
    cv_folds: int = 5,
    metric: str = "f1",
    seed: int = 42,
    fixed_params: dict | None = None,
) -> dict:
    """TPE-lite over Spark CV — the adaptive-search stand-in for the
    reference's optuna TPE (modeling.py:213-233; optuna absent from this
    container). Same return shape as ``optimize``."""

    def evaluate(params):
        folds = cross_validate(
            lambda: estimator_class(**{**params, **(fixed_params or {})}),
            df,
            k=cv_folds,
            seed=seed,
        )
        return cv_summary(folds)[metric]

    return tpe_search(
        evaluate, space, n_trials=n_trials, n_startup=n_startup, seed=seed
    )
