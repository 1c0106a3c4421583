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
    # scale the r12 initialPartitionNum below (env-scalable) is the real
    # knob — AQE can only coalesce DOWN from the initial number, so a bare
    # 32 would cap every production shuffle at 32 tasks.
    "spark.sql.shuffle.partitions": "32",
    # r12 (guide §2.4: scale-adaptive partitioning, not a local constant):
    # shuffles START at this many partitions and AQE coalesces them to the
    # advisory size. Locally 64 is wall-neutral (every bench shuffle is far
    # below the advisory size, so AQE coalesces to the same handful of
    # partitions either way — A/B-measured before adoption); on a cluster
    # set SPARK_GRAFT_INITIAL_PARTITIONS to ~2-3x total cores (or leave
    # maxPartitionBytes to govern scans) so TB-scale shuffles are neither
    # capped at 32 tasks nor sized by a local default.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": os.environ.get(
        "SPARK_GRAFT_INITIAL_PARTITIONS", "64"
    ),
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
