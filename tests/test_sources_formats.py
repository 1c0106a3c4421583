"""Source/sink format round-trips: JSON and ORC next to CSV/parquet (S1/S2).

Round-trip = write with the sink, read with the reader, compare the full
sorted row multiset — covers schema fidelity (incl. timestamp and double
columns) rather than just row counts.
"""

import os

from pyspark.sql import functions as F

from consumer_loans_analysis_spark.sources import readers


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_json_round_trip(spark, tmp_path):
    src = readers.read_table(spark, "/root/testdata/sf0.001", "orders").limit(200)
    path = os.path.join(str(tmp_path), "orders_json")
    readers.write_json(src, path)
    back = readers.read_json(spark, path, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back, "o_orderkey") == _sorted_rows(src, "o_orderkey")


def test_orc_round_trip_partitioned(spark, tmp_path):
    src = readers.read_table(spark, "/root/testdata/sf0.001", "customer")
    path = os.path.join(str(tmp_path), "customer_orc")
    readers.write_orc(src, path, partition_by=["c_mktsegment"])
    back = readers.read_orc(spark, path).select(*src.columns)
    assert _sorted_rows(back, "c_custkey") == _sorted_rows(src, "c_custkey")
    pruned = readers.read_orc(spark, path).filter(F.col("c_mktsegment") == "BUILDING")
    assert pruned.count() == src.filter(F.col("c_mktsegment") == "BUILDING").count()
