"""Bucketed co-located joins: the plan must contain no Exchange.

The point of bucketing is structural, so the assertion is structural: an
equi-join of two tables bucketed on the join key plans WITHOUT a shuffle
(and without a Sort when written sorted), while the same join over plain
parquet shuffles both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.sources.bucketed import (
    bucketed_join,
    write_bucketed,
)
from consumer_loans_analysis_spark.sources.readers import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"), "b_orders", ["okey"], 8
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "okey"), "b_lineitem", ["okey"], 8
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # At test scale the planner would broadcast the small side (which
    # bypasses bucketing entirely); suppress it — the 100 TB case this
    # layout exists for is two fact tables, neither broadcast-able.
    # Since Spark 3.0 the scan only exposes the bucket SORT order under the
    # legacy flag (sortedness holds only with one file per bucket, which
    # write_bucketed guarantees); partitioning is exposed unconditionally.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        plan = _plan(bucketed_join(spark, lt, rt, ["okey"]))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    assert "Exchange" not in plan, plan
    # written sorted within buckets -> sort-merge join needs no Sort either
    assert "Sort" not in plan.replace("SortMergeJoin", ""), plan


def test_plain_parquet_join_does_exchange(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_totalprice"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    # suppress broadcast so the comparison is shuffle-join vs bucket-join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(orders.join(li, "okey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" in plan


def test_bucketed_join_results_match_plain(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, ["okey"])
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity")).alias("sq"),
        )
        .collect()[0]
    )
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"), "l_quantity"
    )
    want = (
        orders.join(li, "okey")
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sq"))
        .collect()[0]
    )
    assert got["n"] == want["n"] and float(got["sq"]) == float(want["sq"])


def test_bucketed_aggregation_skips_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("okey").agg(F.sum("o_totalprice").alias("s"))
    assert "Exchange" not in _plan(agg)
