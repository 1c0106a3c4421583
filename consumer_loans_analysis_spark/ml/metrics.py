"""Multi-metric evaluation (M4) from a predictions DataFrame.

All metrics derive from ONE confusion-matrix aggregation
(``groupBy(label, prediction).count()`` → tiny driver-side table) — never
one job per metric. ROC-AUC follows the reference's convention of scoring
HARD 0/1 predictions (modeling.py:315-319): with a single threshold the
curve has one operating point and AUC = (1 + TPR − FPR) / 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> dict[tuple[float, float], int]:
    rows = (
        pred.groupBy(
            F.col(label_col).cast("double").alias("y"),
            F.col(pred_col).cast("double").alias("p"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {(r["y"], r["p"]): r["n"] for r in rows}


def binary_metrics(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> dict[str, float]:
    """accuracy, precision/recall/f1 (positive class = 1.0), micro-F1
    (= accuracy for single-label), and hard-prediction ROC-AUC."""
    cm = confusion_counts(pred, label_col, pred_col)
    tp = cm.get((1.0, 1.0), 0)
    tn = cm.get((0.0, 0.0), 0)
    fp = cm.get((0.0, 1.0), 0)
    fn = cm.get((1.0, 0.0), 0)
    n = tp + tn + fp + fn
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    tpr = recall
    fpr = fp / (fp + tn) if fp + tn else 0.0
    return {
        "accuracy": (tp + tn) / n if n else 0.0,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "micro_f1": (tp + tn) / n if n else 0.0,
        "roc_auc_hard": (1 + tpr - fpr) / 2,
        "support_pos": tp + fn,
        "support_neg": tn + fp,
    }


def classification_report(pred: DataFrame, label_col: str = "label", pred_col: str = "prediction") -> dict:
    """Per-class precision/recall/f1/support (sklearn classification_report
    shape) from the same single confusion aggregation."""
    cm = confusion_counts(pred, label_col, pred_col)
    classes = sorted({y for y, _ in cm} | {p for _, p in cm})
    report = {}
    total = sum(cm.values())
    correct = sum(v for (y, p), v in cm.items() if y == p)
    for c in classes:
        tp = cm.get((c, c), 0)
        fp = sum(v for (y, p), v in cm.items() if p == c and y != c)
        fn = sum(v for (y, p), v in cm.items() if y == c and p != c)
        prec = tp / (tp + fp) if tp + fp else 0.0
        rec = tp / (tp + fn) if tp + fn else 0.0
        report[c] = {
            "precision": prec,
            "recall": rec,
            "f1": 2 * prec * rec / (prec + rec) if prec + rec else 0.0,
            "support": tp + fn,
        }
    report["accuracy"] = correct / total if total else 0.0
    return report


def micro_f1_multiclass(pred: DataFrame, label_col: str, pred_col: str) -> float:
    """Micro-F1 for multiclass single-label = accuracy (used by the imputer
    evaluation harness, processing.py:232). One aggregation pass."""
    row = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col(label_col) == F.col(pred_col)).cast("long")).alias("correct"),
    ).head()
    return (row["correct"] or 0) / row["n"] if row["n"] else 0.0


def soft_auc(pred: DataFrame, label_col: str = "label", prob_col: str = "probability") -> float:
    """Probability ROC-AUC — the sklearn ``cross_validate('roc_auc')``
    convention the reference's SCREENING rows use
    (modeling_validation.ipynb cv tables), unlike its tuned/final rows
    which score hard 0/1 predictions (``roc_auc_hard`` above). MLlib's
    BinaryClassificationEvaluator computes it distributed (sort-merge on
    executors — no driver-side global sort)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    ev = BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol=prob_col, metricName="areaUnderROC"
    )
    return ev.evaluate(pred)
