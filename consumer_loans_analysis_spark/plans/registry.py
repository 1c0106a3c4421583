"""Query registry: named Spark queries + matching DuckDB oracle SQL.

Every operator claimed in SURVEY §2 registers here with BOTH a Spark
implementation (a callable ``(spark, sf_dir) -> DataFrame``) and, where
SQL-expressible, an ANSI-SQL oracle the driver runs on DuckDB over the same
parquet. Column names are aliased identically on both sides (the driver's
compare hashes values under sorted column names).

Float discipline: aggregate doubles through DECIMAL (order-independent, exact
— see functions.relational.decimal_sum) wherever the value feeds the hash
compare; round intrinsically-iterative stats (stddev, corr) to 6 digits on
both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-equivalent SQL (or None
    for non-SQL-expressible ops → driver runs a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import consumer_loans_analysis_spark.plans.relational_queries  # noqa: F401
    import consumer_loans_analysis_spark.plans.tpch_queries  # noqa: F401
    import consumer_loans_analysis_spark.plans.window_queries  # noqa: F401
    import consumer_loans_analysis_spark.plans.datapipe_queries  # noqa: F401
    import consumer_loans_analysis_spark.plans.behavioral_queries  # noqa: F401
