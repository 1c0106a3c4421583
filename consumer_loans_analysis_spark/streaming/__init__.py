from consumer_loans_analysis_spark.streaming import events, stateful

__all__ = ["events", "stateful"]
