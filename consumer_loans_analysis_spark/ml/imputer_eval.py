"""Imputer evaluation harness (reference evaluate_estimator,
processing.py:188-233).

Protocol: fit the imputer on train; on valid, take the rows whose target is
PRESENT, hide it (set to the sentinel), run the imputer, and score micro-F1
of the recovered values against the truth. BASELINE.md acceptance: beat the
mode-imputation baselines (ECONOMIC_SECTOR 0.279, EMPLOYEE_NO 0.276).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.ml.metrics import micro_f1_multiclass


def evaluate_imputer(
    fitted_imputer,
    valid: DataFrame,
    target: str,
    sentinel: str | None = "Missing",
) -> float:
    """Micro-F1 of imputed vs true values on the present valid rows."""
    present = (
        valid.filter(F.col(target).isNotNull())
        if sentinel is None
        else valid.filter(F.col(target) != sentinel)
    )
    hidden = present.withColumn("_truth", F.col(target)).withColumn(
        target,
        F.lit(None).cast(present.schema[target].dataType)
        if sentinel is None
        else F.lit(sentinel),
    )
    imputed = fitted_imputer.transform(hidden)
    return micro_f1_multiclass(imputed, "_truth", target)


def mode_baseline(
    train: DataFrame, valid: DataFrame, target: str, sentinel: str | None = "Missing"
) -> float:
    """The SimpleImputer(most_frequent) floor the model imputer must beat."""
    tcond = (
        F.col(target).isNotNull() if sentinel is None else F.col(target) != sentinel
    )
    mode_row = (
        train.filter(tcond)
        .groupBy(target)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min_by(target, F.struct(-F.col("n"), F.col(target))).alias("m"))
        .head()
    )
    mode = mode_row["m"]
    row = valid.filter(tcond).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col(target) == mode).cast("long")).alias("hit"),
    ).head()
    return (row["hit"] or 0) / row["n"] if row["n"] else 0.0
