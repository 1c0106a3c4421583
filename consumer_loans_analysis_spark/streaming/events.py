"""Structured Streaming surface over the events table (SURVEY §2.9, §7.0
Layer 4).

The reference has no streaming (SURVEY §2.9) — semantics here come from
Spark Structured Streaming: the SAME window aggregations the batch queries
e1/e2/e3 run (plans/window_queries.py) are expressed on an unbounded
DataFrame with ``withWatermark`` for late data. Batch/stream parity is the
design invariant, tested by running each stream on the static events
parquet with ``trigger(availableNow=True)`` and comparing to the batch
result.

Scale notes: streaming window aggs shuffle on (window, keys) exactly like
batch; state is bounded by the watermark horizon (old windows evict), so a
1000-executor job holds only `horizon / slide × |keys|` state rows. The
sessionization operator keeps one state row per active user — skew-safe
because state is hash-partitioned on user_id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# events.parquet raw shape when ts is TIMESTAMP(NANOS) (driver testdata has
# shipped both NANOS and MICROS across rounds — the reader probes): the
# vectorized reader rejects nanos, so the stream takes ts as long under the
# legacy flag and truncates to microseconds with integer division (gotcha:
# double division loses ulps at 1e18 nanos).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
    glob: str = "events.parquet",
) -> DataFrame:
    """Unbounded events source: file-stream over the events parquet.

    A parquet directory is the test/replay source; swapping in Kafka is a
    one-line change (``format("kafka")`` + from_json) because everything
    downstream only sees the typed schema.

    The physical ``ts`` type is probed first (a metadata-only batch schema
    resolution): TIMESTAMP(MICROS) files stream directly under the typed
    schema; TIMESTAMP(NANOS) files — which the vectorized reader rejects —
    stream as long under the legacy flag and truncate to microseconds.
    In the nanos case the flag is session-wide and deliberately NOT
    restored: micro-batches execute for the stream's whole lifetime and
    need it live (``read_table`` handles either shape for batch reads).
    """
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        probed = (
            spark.read.option("pathGlobFilter", glob).parquet(sf_dir).schema
        )
        ts_is_nanos = dict(
            (f.name, f.dataType.simpleString()) for f in probed
        ).get("ts") == "bigint"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    # the file stream source lists a DIRECTORY; testdata ships events as a
    # single file, so stream the dir with a glob filter selecting it
    reader = spark.readStream.schema(
        EVENTS_RAW_SCHEMA if ts_is_nanos else EVENTS_SCHEMA
    ).option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if not ts_is_nanos:
        return reader.parquet(sf_dir)
    spark.conf.set(key, "true")  # live for the stream's lifetime
    raw = reader.parquet(sf_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of e1_tumbling_window: per-(window, event_type)
    count/sum with late-data eviction after `watermark`."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of e2_sliding_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def session_aggregates(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of e3_session_window: native session_window state
    (merging sessions) with watermark-bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    stream_df: DataFrame, name: str, timeout_sec: int = 300, output_mode: str = "complete"
) -> None:
    """Drain an availableNow stream into an in-memory table `name`
    (complete mode for aggregations; append for joins/dedup) — the
    test/debug sink.

    Most availableNow queries self-terminate once the source is exhausted.
    Stateful queries with a ProcessingTimeTimeout do NOT: after the data
    batches, the engine keeps scheduling empty "no new data but cleaning up
    state" batches waiting for timers that may be hours away, so a plain
    ``awaitTermination(timeout)`` silently burns the whole timeout. Detect
    the drained condition instead — all input consumed AND two consecutive
    completed zero-row triggers — and stop the query explicitly (update-mode
    output for the data batches is already in the sink at that point)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_sec)


def _await_drained(q, timeout_sec: int) -> None:
    """Wait until an availableNow query has consumed its source, then stop it.

    Self-terminating queries exit via the ``isActive`` check; the stateful
    ProcessingTimeTimeout case (see ``run_to_memory``) is detected as all
    input consumed + two consecutive completed zero-row triggers."""
    import time as _time

    deadline = _time.monotonic() + timeout_sec
    seen_data = False
    zero_row_batches = 0
    last_batch = -1
    while _time.monotonic() < deadline:
        if not q.isActive:
            return
        lp = q.lastProgress
        if lp is not None and lp["batchId"] != last_batch:
            last_batch = lp["batchId"]
            if lp["numInputRows"] > 0:
                seen_data = True
                zero_row_batches = 0
            else:
                zero_row_batches += 1
        # drained = input consumed + 2 consecutive empty triggers; an
        # entirely EMPTY source never sets seen_data, so accept a longer
        # all-empty streak too instead of burning the whole timeout
        if (seen_data and zero_row_batches >= 2) or zero_row_batches >= 5:
            if not q.status["isDataAvailable"]:
                break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)


def run_foreach_batch(
    stream_df: DataFrame, batch_fn, checkpoint_dir: str, timeout_sec: int = 300
):
    """Production-shaped sink: per-microbatch callable (e.g. upsert to a
    warehouse, or PipelineModel.transform for streaming serving) with
    exactly-once bookkeeping via the checkpoint."""
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    _await_drained(q, timeout_sec)
    return q


def view_click_attribution(
    events: DataFrame, max_lag: str = "30 minutes", watermark: str = "30 days"
) -> DataFrame:
    """Stream-stream inner join: attribute each click to the views it
    followed within ``max_lag`` for the same user (a self-join of the
    event stream — views and clicks are two filtered readers of it).

    Both sides carry a watermark and the join condition bounds click_ts
    relative to view_ts, so the state store can evict a view once no
    future click can match it: state is O(events inside the lag horizon),
    not O(stream). Inner stream-stream joins emit in append mode.
    """
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag}")),
        "inner",
    ).select(
        "view_id", "click_id", F.col("v_user").alias("user_id"), "view_ts", "click_ts"
    )


def dedup_events_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "90 days"
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins, duplicates
    arriving in ANY later micro-batch within the watermark horizon are
    dropped (``dropDuplicatesWithinWatermark`` state evicts keys whose
    event time falls behind the watermark — bounded state, unlike a plain
    ``dropDuplicates`` on a stream which retains keys forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
