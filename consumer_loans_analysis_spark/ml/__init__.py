from consumer_loans_analysis_spark.ml import (
    cv,
    ensemble,
    importance,
    imputer_eval,
    metrics,
    tuning,
    zoo,
)

__all__ = ["cv", "ensemble", "importance", "imputer_eval", "metrics", "tuning", "zoo"]
