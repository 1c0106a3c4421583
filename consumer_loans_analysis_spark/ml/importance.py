"""Feature attribution: global importance, per-row path contributions (M9), A15.

The reference's SHAP surface (modeling_validation.ipynb:2553-2722) has two
layers: per-row TreeExplainer contributions and their global |mean| ranking.

- Global: MLlib tree ensembles expose ``featureImportances`` (Gini) — the
  SURVEY §2.8 parity target.
- Per-row: ``tree_contributions`` implements Saabas path attribution
  (the treeinterpreter algorithm; TreeSHAP's fast predecessor): walking a
  row root→leaf, each split's feature is credited with the change in the
  node value, so ``bias + Σ contrib == prediction`` EXACTLY per row. Tree
  structure is extracted ONCE driver-side (py4j traversal, O(nodes));
  scoring is an Arrow-batched Pandas UDF over the distributed rows — no
  shap library, no per-row JVM calls.

``mean_abs_contribution`` implements the A15 aggregation shape on any
DataFrame of per-row contribution columns — one pass, no shuffle beyond the
single aggregate; feed it the ``tree_contributions`` output to reproduce
the reference's global |SHAP| ranking end-to-end.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def feature_importances(
    model, feature_names: list[str], spark: SparkSession, top_k: int | None = None
) -> DataFrame:
    """Named global importance table from a fitted tree model/ensemble.

    Returns (feature, importance) ordered descending, optionally top-k
    (A15/O3: orderBy desc + limit).
    """
    vec = model.featureImportances
    pairs = [(feature_names[i], float(vec[i])) for i in range(len(feature_names))]
    df = spark.createDataFrame(pairs, ["feature", "importance"])
    out = df.orderBy(F.desc("importance"), "feature")
    return out.limit(top_k) if top_k else out


def _extract_tree(jnode, target_class: int, is_classifier: bool) -> dict:
    """Flatten one MLlib tree (java Node) into plain-Python arrays via a
    single driver-side traversal. Node value = P(target_class) from the
    node's impurity stats for classifiers, the node mean for regressors.
    ``cover`` records each node's training row count (impurity-stats
    count) — the path-dependent expectation weights TreeSHAP needs."""

    feats, thresholds, lefts, rights, values, cats, covers = [], [], [], [], [], [], []

    def value(node) -> float:
        if is_classifier:
            stats = list(node.impurityStats().stats())
            total = sum(stats)
            if total > 0 and target_class < len(stats):
                return stats[target_class] / total
        return float(node.prediction())

    def walk(node) -> int:
        idx = len(feats)
        feats.append(-1)
        thresholds.append(0.0)
        lefts.append(-1)
        rights.append(-1)
        cats.append(None)
        values.append(value(node))
        covers.append(float(node.impurityStats().count()))
        if node.getClass().getSimpleName() == "InternalNode":
            split = node.split()
            feats[idx] = int(split.featureIndex())
            if split.getClass().getSimpleName() == "CategoricalSplit":
                cats[idx] = set(float(c) for c in split.leftCategories())
            else:
                thresholds[idx] = float(split.threshold())
            lefts[idx] = walk(node.leftChild())
            rights[idx] = walk(node.rightChild())
        return idx

    walk(jnode)
    return {
        "feat": feats, "thr": thresholds, "left": lefts, "right": rights,
        "value": values, "cats": cats, "cover": covers,
    }


def tree_contributions(
    model,
    features: Column | str,
    feature_names: list[str],
    target_class: int = 1,
) -> Column:
    """Per-row Saabas path contributions for an MLlib tree model/ensemble.

    Returns a struct column ``(bias, contrib array<double>, pred double)``
    where ``pred == bias + Σ contrib`` exactly and, for a classifier,
    ``pred`` is the model's P(target_class) (ensembles: unweighted mean of
    per-tree leaf probabilities — the same combination MLlib's RF uses).

    Scale shape: trees are extracted once on the driver (py4j, O(total
    nodes)) and captured by the UDF closure, which Spark broadcasts with
    the task — scoring itself is Arrow-batched and embarrassingly
    parallel. Pass the features as ``vector_to_array(col)`` or any
    array<double> column.

    Reference surface: per-row TreeExplainer contributions
    (modeling_validation.ipynb:2553-2722), reproduced without the shap
    library.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    trees = model.trees if hasattr(model, "trees") else [model]
    is_classifier = hasattr(model, "numClasses")
    structs = [
        _extract_tree(t._call_java("rootNode"), target_class, is_classifier)
        for t in trees
    ]
    n_features = len(feature_names)

    @pandas_udf("struct<bias double, contrib array<double>, pred double>")
    def saabas(vecs: pd.Series) -> pd.DataFrame:
        n = len(vecs)
        contrib = np.zeros((n, n_features))
        bias = 0.0
        pred = np.zeros(n)
        for tr in structs:
            bias += tr["value"][0] / len(structs)
            for i, x in enumerate(vecs):
                node = 0
                while tr["left"][node] != -1:
                    f = tr["feat"][node]
                    cat = tr["cats"][node]
                    go_left = (
                        (x[f] in cat) if cat is not None
                        else (x[f] <= tr["thr"][node])
                    )
                    child = tr["left"][node] if go_left else tr["right"][node]
                    contrib[i, f] += (tr["value"][child] - tr["value"][node]) / len(structs)
                    node = child
                pred[i] += tr["value"][node] / len(structs)
        return pd.DataFrame(
            {"bias": np.full(n, bias), "contrib": list(contrib), "pred": pred}
        )

    return saabas(F.col(features) if isinstance(features, str) else features)


def _tree_shap_single(tr: dict, x, n_features: int):
    """Exact path-dependent TreeSHAP for ONE tree (Lundberg et al. 2018,
    Algorithm 2): returns (phi array, expected_value).

    phi satisfies ``E[f] + Σ phi == f(x)`` exactly, where E[f] is the
    cover-weighted leaf expectation and the conditional expectations v(S)
    descend the tree following x on S-features and splitting by cover
    proportion on the rest. O(leaves · depth²) per row — polynomial where
    naive Shapley is exponential. Pure Python on the extracted struct;
    used inside the Arrow-batched UDF below and unit-testable standalone.

    Path elements are [d, z, o, w]: feature index, zero fraction (cover
    proportion if d is NOT in S), one fraction (1 if x follows this split,
    else 0), and the permutation-weight accumulator.
    """
    phi = [0.0] * n_features

    def extend(m, pz, po, pi):
        l = len(m)
        m = [e[:] for e in m]
        m.append([pi, pz, po, 1.0 if l == 0 else 0.0])
        for i in range(l - 1, -1, -1):
            m[i + 1][3] += po * m[i][3] * (i + 1) / (l + 1)
            m[i][3] = pz * m[i][3] * (l - i) / (l + 1)
        return m

    def unwind(m, i):
        l = len(m) - 1
        m = [e[:] for e in m]
        n = m[l][3]
        o, z = m[i][2], m[i][1]
        for j in range(l - 1, -1, -1):
            if o != 0:
                t = m[j][3]
                m[j][3] = n * (l + 1) / ((j + 1) * o)
                n = t - m[j][3] * z * (l - j) / (l + 1)
            else:
                m[j][3] = m[j][3] * (l + 1) / (z * (l - j))
        for j in range(i, l):
            m[j][0], m[j][1], m[j][2] = m[j + 1][0], m[j + 1][1], m[j + 1][2]
        m.pop()
        return m

    def unwound_sum(m, i):
        l = len(m) - 1
        n = m[l][3]
        o, z = m[i][2], m[i][1]
        total = 0.0
        for j in range(l - 1, -1, -1):
            if o != 0:
                t = n * (l + 1) / ((j + 1) * o)
                total += t
                n = m[j][3] - t * z * (l - j) / (l + 1)
            else:
                total += m[j][3] * (l + 1) / (z * (l - j))
        return total

    def go_left(node) -> bool:
        f = tr["feat"][node]
        cat = tr["cats"][node]
        return (x[f] in cat) if cat else (x[f] <= tr["thr"][node])

    def recurse(node, m, pz, po, pi):
        m = extend(m, pz, po, pi)
        if tr["left"][node] == -1:
            v = tr["value"][node]
            for i in range(1, len(m)):
                w = unwound_sum(m, i)
                phi[m[i][0]] += w * (m[i][2] - m[i][1]) * v
            return
        f = tr["feat"][node]
        hot, cold = (
            (tr["left"][node], tr["right"][node])
            if go_left(node)
            else (tr["right"][node], tr["left"][node])
        )
        iz = io = 1.0
        k = next((i for i in range(1, len(m)) if m[i][0] == f), None)
        if k is not None:
            iz, io = m[k][1], m[k][2]
            m = unwind(m, k)
        rj = tr["cover"][node]
        recurse(hot, m, iz * tr["cover"][hot] / rj, io, f)
        recurse(cold, m, iz * tr["cover"][cold] / rj, 0.0, f)

    recurse(0, [], 1.0, 1.0, -1)
    root_cover = tr["cover"][0]
    expected = sum(
        tr["value"][i] * tr["cover"][i] / root_cover
        for i in range(len(tr["value"]))
        if tr["left"][i] == -1
    )
    return phi, expected


def tree_shap_contributions(
    model,
    features: Column | str,
    feature_names: list[str],
    target_class: int = 1,
) -> Column:
    """Per-row EXACT path-dependent TreeSHAP for an MLlib tree model or
    ensemble — the reference's TreeExplainer surface
    (modeling_validation.ipynb:2553-2722) without the shap library.

    Same contract as ``tree_contributions`` (struct of bias, contrib
    array, pred with ``pred == bias + Σ contrib`` exactly; ensembles
    average per-tree attributions, matching MLlib RF's probability
    combination) but the attributions are true Shapley values of the
    cover-weighted conditional expectation — unlike Saabas, which biases
    credit toward shallow splits under feature interactions (the fixture
    test pins a tree where the two provably differ and TreeSHAP matches
    hand-computed Shapley values).

    Cost: O(leaves · depth²) per row per tree, Python-looped inside the
    Arrow batch — exact per-row explanations for moderate ensembles
    (boosted stumps/shallow GBTs, the reference's XGB shape). For
    deep-forest global rankings at corpus scale, ``tree_contributions``
    (Saabas, same code shape, ~depth× cheaper) or ``featureImportances``
    remain the fast paths.
    """
    from pyspark.sql.functions import pandas_udf

    trees = model.trees if hasattr(model, "trees") else [model]
    if hasattr(model, "treeWeights"):
        tw = list(model.treeWeights)
        if tw and any(abs(w - tw[0]) > 1e-12 for w in tw):
            # GBT-style weighted tree sums (plus a link function) break the
            # advertised exact-efficiency contract bias + Σcontrib == output;
            # this path averages trees uniformly — RF semantics only.
            raise ValueError(
                "tree_shap_contributions supports uniformly-weighted "
                "ensembles (RF); non-uniform treeWeights found — per-tree "
                "averaging would not reproduce the model output"
            )
    is_classifier = hasattr(model, "numClasses")
    structs = [
        _extract_tree(t._call_java("rootNode"), target_class, is_classifier)
        for t in trees
    ]
    n_features = len(feature_names)

    @pandas_udf("struct<bias double, contrib array<double>, pred double>")
    def shap_udf(vecs: pd.Series) -> pd.DataFrame:
        import numpy as np

        n = len(vecs)
        contrib = np.zeros((n, n_features))
        bias = 0.0
        for tr in structs:
            root_cover = tr["cover"][0]
            bias += sum(
                tr["value"][i] * tr["cover"][i] / root_cover
                for i in range(len(tr["value"]))
                if tr["left"][i] == -1
            ) / len(structs)
            for i, x in enumerate(vecs):
                phi, _ = _tree_shap_single(tr, x, n_features)
                contrib[i] += np.asarray(phi) / len(structs)
        pred = bias + contrib.sum(axis=1)
        return pd.DataFrame(
            {"bias": np.full(n, bias), "contrib": list(contrib), "pred": pred}
        )

    return shap_udf(F.col(features) if isinstance(features, str) else features)


def contributions_table(
    model,
    df: DataFrame,
    feature_names: list[str],
    features_col: str = "features",
    target_class: int = 1,
    method: str = "saabas",
) -> DataFrame:
    """Per-row contributions widened to named ``contrib_<feature>`` columns
    (the reference's per-row SHAP frame shape), plus bias and pred.
    ``method``: 'saabas' (fast path attribution) or 'treeshap' (exact
    Shapley, ~depth× costlier — see tree_shap_contributions)."""
    from pyspark.ml.functions import vector_to_array

    if method not in ("saabas", "treeshap"):
        raise ValueError(f"method must be saabas | treeshap, got {method!r}")
    fn = tree_contributions if method == "saabas" else tree_shap_contributions
    dtype = dict(df.dtypes).get(features_col, "")
    feats = (
        vector_to_array(F.col(features_col)) if dtype == "vector"
        else F.col(features_col)
    )
    out = df.withColumn(
        "_c", fn(model, feats, feature_names, target_class)
    )
    return out.select(
        *df.columns,
        F.col("_c.bias").alias("bias"),
        *[
            F.col("_c.contrib")[i].alias(f"contrib_{name}")
            for i, name in enumerate(feature_names)
        ],
        F.col("_c.pred").alias("pred_contrib"),
    )


def mean_abs_contribution(
    contribs: DataFrame, contrib_cols: list[str], top_k: int = 10
) -> DataFrame:
    """A15: mean |contribution| per feature column + top-k ranking, in ONE
    aggregation pass (reference: np.abs(shap_values).mean(axis=0))."""
    row = contribs.agg(
        *[F.mean(F.abs(F.col(c))).alias(c) for c in contrib_cols]
    )
    long = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("feature"), F.col(c).alias("mean_abs"))
                    for c in contrib_cols
                ]
            )
        ).alias("s")
    ).select("s.*")
    return long.orderBy(F.desc("mean_abs"), "feature").limit(top_k)
