"""Global feature importance + top-k ranking (M9 SHAP surrogate, A15).

The reference aggregates per-row |SHAP| into a global ranking and takes the
top 10 (modeling_validation.ipynb:2706-2710). MLlib tree ensembles expose
``featureImportances`` (Gini importance) as the global measure — the parity
target per SURVEY §2.8 M9; per-row contributions would come from
SparkXGB's pred_contrib_col or a pandas_udf SHAP wrapper (not in this
container). The ranking itself is driver-side: the importance vector is
already tiny (one weight per feature).

``mean_abs_contribution`` implements the A15 aggregation shape on any
DataFrame of per-row contribution columns — one pass, no shuffle beyond the
single aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
