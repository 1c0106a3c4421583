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
    node's impurity stats for classifiers, the node mean for regressors."""

    feats, thresholds, lefts, rights, values, cats = [], [], [], [], [], []

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
        "value": values, "cats": cats,
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


def contributions_table(
    model,
    df: DataFrame,
    feature_names: list[str],
    features_col: str = "features",
    target_class: int = 1,
) -> DataFrame:
    """``tree_contributions`` widened to named ``contrib_<feature>`` columns
    (the reference's per-row SHAP frame shape), plus bias and pred."""
    from pyspark.ml.functions import vector_to_array

    dtype = dict(df.dtypes).get(features_col, "")
    feats = (
        vector_to_array(F.col(features_col)) if dtype == "vector"
        else F.col(features_col)
    )
    out = df.withColumn(
        "_c", tree_contributions(model, feats, feature_names, target_class)
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
