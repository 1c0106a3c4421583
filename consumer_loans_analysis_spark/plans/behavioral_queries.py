"""Event-analytics queries: funnel, retention, sessionization, JSON props.

No reference counterpart (the reference is a loans notebook with no event
surface) — semantics are the industry-standard definitions, stated
precisely by each DuckDB oracle. See operators/behavioral.py for the
one-shuffle-per-user plan design these compile to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from consumer_loans_analysis_spark.operators import behavioral
from consumer_loans_analysis_spark.plans.registry import query
from consumer_loans_analysis_spark.sources.readers import read_table

_FUNNEL_STEPS = ["view", "click", "purchase"]


@query(
    "e8_funnel_steps",
    oracle="""
    WITH u0 AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0
      FROM events GROUP BY user_id
    ), u1 AS (
      SELECT e.user_id, u0.t0,
        MIN(CASE WHEN e.event_type = 'click' AND e.ts > u0.t0
              AND epoch_us(e.ts) - epoch_us(u0.t0) <= 43200000000 THEN e.ts END) AS t1
      FROM events e JOIN u0 USING (user_id) GROUP BY e.user_id, u0.t0
    ), u2 AS (
      SELECT e.user_id, u1.t0, u1.t1,
        MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > u1.t1
              AND epoch_us(e.ts) - epoch_us(u1.t1) <= 43200000000 THEN e.ts END) AS t2
      FROM events e JOIN u1 USING (user_id) GROUP BY e.user_id, u1.t0, u1.t1
    )
    SELECT 'view' AS step, 0 AS step_idx, COUNT(t0) AS n_users FROM u2
    UNION ALL
    SELECT 'click', 1, COUNT(t1) FROM u2
    UNION ALL
    SELECT 'purchase', 2, COUNT(t2) FROM u2
    """,
)
def e8_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered view→click→purchase funnel with a 12 h conversion
    window: each step counts users whose first qualifying event follows
    their previous step's first touch within the window. The oracle
    re-derives each step with a join-per-step; the Spark plan is N stacked
    same-partition windows over ONE events shuffle."""
    e = read_table(spark, sf_dir, "events")
    return behavioral.funnel_steps(e, _FUNNEL_STEPS, within_seconds=43200)


@query(
    "e9_retention_cohorts",
    oracle="""
    WITH fa AS (
      SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
      date_diff('day', cohort_day, day) AS day_offset,
      COUNT(*) AS n_users
    FROM act JOIN fa USING (user_id)
    WHERE date_diff('day', cohort_day, day) <= 7
    GROUP BY 1, 2
    """,
)
def e9_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention triangle (offsets 0..7): distinct users active
    N days after their first-seen day, grouped by cohort day."""
    e = read_table(spark, sf_dir, "events")
    return behavioral.retention_cohorts(e, max_offset_days=7)


@query(
    "e10_session_stats",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
        LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), m AS (
      SELECT user_id, us,
        CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM o
    ), s AS (
      SELECT user_id, us,
        CAST(SUM(new_s) OVER (
          PARTITION BY user_id ORDER BY us
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS BIGINT) AS session_id
      FROM m
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
      ROUND((MAX(us) - MIN(us)) / 1000000.0, 6) AS duration_sec
    FROM s GROUP BY user_id, session_id
    """,
)
def e10_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization at a 30-minute inactivity gap, one
    row per session with event count and duration. The oracle's running
    SUM may order by ``us`` alone because (user_id, us) is unique in the
    testdata; the Spark side tiebreaks on event_id for full determinism."""
    e = read_table(spark, sf_dir, "events")
    return behavioral.sessionize(e, gap_seconds=1800)


@query(
    "p16_json_extract",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      COUNT(json_extract_string(props, '$.k')) AS n_with_k
    FROM events GROUP BY event_type
    """,
)
def p16_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON property extraction + aggregate. At scale,
    ``get_json_object`` is JVM-side (Jackson) — no Python UDF; for hot
    paths over a fixed schema, ``from_json`` with an explicit schema lets
    Catalyst prune unused fields."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("k").alias("n_with_k"))
    )


@query(
    "e12_gapfill_hourly",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY user_id
    ), grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM b
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             AVG(value) AS v, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, g.hour,
      CAST(COALESCE(h.n, 0) AS BIGINT) AS n_events,
      ROUND(LAST_VALUE(h.v IGNORE NULLS) OVER (
        PARTITION BY g.user_id ORDER BY g.hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_filled
    FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hour = g.hour
    """,
)
def e12_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a dense per-user hourly grid between each
    user's first and last event, hourly mean `value` forward-filled across
    empty hours (the hypertable `locf`/gap-fill operation). Scale shape:
    the grid explodes from ONE tiny (user, min, max) aggregate — never a
    cross join against a calendar table; the hourly aggregate and the
    forward-fill window share the user-key partitioning, so the events
    table shuffles once. Grid size is bounded by users × span-hours, not
    by raw event count."""
    e = read_table(spark, sf_dir, "events")
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    # The bounds table is tiny (one row per user), so AQE coalesces its
    # exchange to ~1 partition — and the explode then materializes the
    # ENTIRE grid (users × span-hours, orders of magnitude bigger) in that
    # one partition, serializing the downstream window. The explicit
    # fixed-width repartition on the window's own key spreads the
    # generation AND is reused by the forward-fill window (no extra
    # exchange); harness-level 10× ratio 27.8× → 16.7× — the residual is
    # driver-side collect of the 10.5M-row result, compute is flat
    # (SCALING.md e12 decomposition).
    bounds = bounds.repartition(
        spark.sparkContext.defaultParallelism, "user_id"
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.avg("value").alias("v"), F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id", "hour",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
            F.round(F.last("v", ignorenulls=True).over(w), 6).alias("v_filled"),
        )
    )


@query(
    "p18_variant_extract",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      COUNT(*) AS n
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def p18_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): ``parse_json`` once into a
    variant column, then typed ``variant_get`` extraction — the
    shred-on-read lakehouse pattern that replaces repeated
    ``get_json_object`` string re-parsing (p16) with a binary-encoded
    document that parses once and serves many typed extractions. The
    predicate and aggregation both run on the typed projection, so the
    filter prunes before the shuffle."""
    e = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )
