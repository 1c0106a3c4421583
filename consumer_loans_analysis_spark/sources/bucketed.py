"""Bucketed (pre-partitioned) tables: the shuffle-free co-located join path.

At 100 TB the dominant cost of a fact-to-fact join is shuffling both sides
on the join key. Bucketing pays that shuffle ONCE at write time — rows are
hash-clustered into a fixed number of per-key files, recorded in the table
catalog — and every later equi-join or aggregation on the bucket key reads
both sides already co-partitioned: the physical plan contains NO Exchange
(asserted in tests/test_bucketed.py). `sortBy` additionally pre-sorts
within buckets so sort-merge joins skip their Sort.

This mirrors the standing guidance in the repo's plan audits ("co-locate
joins via bucketing") with an actual implementation. Notes for cluster
use:

- Bucket count is a layout decision: pick ``target data size / bucket ≈
  128-512 MB`` per bucket per partition; both join sides must share the
  count (Spark can coalesce mismatched counts when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set, at reduced
  parallelism).
- Buckets only help when ``spark.sql.sources.bucketing.enabled`` (default
  true) and the join keys are a prefix of the bucket spec.
- Bucket PARTITIONING is exposed to the planner unconditionally (no
  Exchange); the within-bucket SORT order is only exposed under
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` since Spark
  3.0, and is only valid with one file per bucket — which
  ``write_bucketed`` guarantees via its pre-write repartition.
- AQE leaves bucketed scans alone — output partitioning is contractual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a catalog-managed parquet table bucketed (and
    optionally sorted) on ``bucket_cols``. The one-time shuffle that
    bucketing amortizes happens here.

    The pre-write ``repartition(n_buckets, cols)`` uses the same murmur3
    hash as the bucket spec, so every write task holds exactly one
    bucket → ONE file per bucket. That matters: Spark only treats a
    bucketed scan as pre-SORTED when each bucket is a single file, so
    without this the downstream sort-merge join keeps its per-bucket
    Sort. (At cluster scale, trade this off: one file per bucket caps
    write parallelism at n_buckets, so pick n_buckets ≈ cluster width.)
    """
    df = df.repartition(n_buckets, *bucket_cols)
    w = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Equi-join two tables bucketed on the same keys/count: both scans
    report the bucket spec as their output partitioning, so the join plans
    with zero Exchange operators (and zero Sort when written sorted)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
