"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the local[32] test harness but expressed so the same
config scales to a multi-executor cluster: AQE on (runtime coalescing +
skew-join handling), Arrow on (fast pandas/Pandas-UDF interchange), and a
shuffle-partition count that AQE can coalesce down from.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFIGS: dict[str, str] = {
    # Adaptive query execution: runtime partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. Essential at scale,
    # harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas interchange & Pandas UDFs (the only sanctioned way to
    # run Python in the hot path).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast joins for dimension tables (region/nation/customer-sized).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # ANSI off: we want permissive casts / null-on-bad-input like the
    # reference's pandas semantics (Spark 4 defaults ANSI on).
    "spark.sql.ansi.enabled": "false",
    # Reasonable local shuffle width; AQE coalesces below this. At cluster
    # scale SPARK_GRAFT_INITIAL_PARTITIONS (applied below) is the real
    # knob — AQE can only coalesce DOWN from the initial number, so a bare
    # 32 would cap every production shuffle at 32 tasks.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "128m",
    # Split-size floor when a table is smaller than cores × 4 MB: Spark sets
    # maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    # totalBytes/defaultParallelism)) — the 4 MB default open-cost would scan
    # a 10 MB table on ~3 cores. 64 KB keeps small scans fully parallel and
    # is irrelevant at scale (the totalBytes term dominates, capped at 128m).
    "spark.sql.files.openCostInBytes": "65536",
    # Quiet progress bars in test output.
    "spark.ui.showConsoleProgress": "false",
}

# r12 (guide §2.4: scale-adaptive partitioning, parameterised — not a local
# constant): on a cluster set SPARK_GRAFT_INITIAL_PARTITIONS to ~2-3x total
# cores so shuffles START wide and AQE coalesces DOWN to the advisory size
# (AQE can only coalesce down, so the bare 32 above would cap every
# production shuffle at 32 tasks). Locally the key is deliberately UNSET:
# the first r12 attempt defaulted it to 64 and a 5-rep quiet A/B measured
# real regressions on many-Exchange queries (d2_ngram_jaccard_pairs
# 1.71 s @32 -> 2.28 s @64, d3_minhash_lsh_pairs 2.62 -> 2.83 — extra
# map-side buckets + two task waves per non-coalesced stage on 32 cores),
# so the local default stays the shuffle-partition width and the production
# value is an explicit deployment knob.
_INITIAL_PARTITIONS = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
if _INITIAL_PARTITIONS:
    DEFAULT_CONFIGS[
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    ] = _INITIAL_PARTITIONS


def get_spark(
    app_name: str = "consumer_loans_analysis_spark",
    master: str | None = None,
    extra_configs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    when no cluster master is configured — on a real cluster, leave it unset
    and spark-submit supplies it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if master and master.startswith("local"):
        # local mode runs every executor thread inside the driver JVM — the
        # 1g default heap starves 32-way shuffles long before the machine
        # does. On a cluster, leave executor/driver memory to spark-submit.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        ).config("spark.driver.maxResultSize", "8g")
    for k, v in DEFAULT_CONFIGS.items():
        builder = builder.config(k, v)
    for k, v in (extra_configs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
