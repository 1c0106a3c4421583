from consumer_loans_analysis_spark.ml import cv, ensemble, imputer_eval, metrics, tuning, zoo

__all__ = ["cv", "ensemble", "imputer_eval", "metrics", "tuning", "zoo"]
