"""Grouped-window aggregation inventory — SURVEY.md §2.7 (batch form).

Reference: window assigners TumblingEventTimeWindows / SlidingEventTimeWindows /
EventTimeSessionWindows (flink-streaming-java/.../windowing/assigners/),
Table API Tumble/Slide/Session (flink-table/.../api/windows.scala:182,278,417),
SQL TUMBLE/HOP/SESSION (FunctionCatalog.scala:495-509), executed by
WindowOperator.java:294.  Spark: F.window / F.session_window — identical
epoch-aligned bucketing; these queries run the same expressions in batch
(the streaming path is exercised in tests/test_streaming.py).

Oracle note: DuckDB time_bucket() is epoch-aligned like Spark's window();
hop windows expand to the two covering 30-min-aligned starts; session
windows use the classic gaps-and-islands rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


@register(
    "window_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS w_start,
           time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS w_end,
           event_type,
           count(*) AS cnt, sum(value) AS total
    FROM events GROUP BY 1, 2, 3
    """,
    doc="Tumbling event-time window (TumblingEventTimeWindows; SQL TUMBLE + "
    "TUMBLE_START/TUMBLE_END via window.start/end).",
    bench=True,
)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
            "total",
        )
    )


@register(
    "window_hop",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP)
             - (o * INTERVAL '30 minutes') AS w_start,
           count(*) AS cnt, sum(value) AS total
    FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
    GROUP BY 1
    """,
    doc="Sliding/hopping window 1h size, 30m slide (SlidingEventTimeWindows; "
    "SQL HOP): each event falls in exactly two 30m-aligned windows.",
)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("w_start"), "cnt", "total")
    )


@register(
    "window_session",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts::TIMESTAMP AS ts, value,
             CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP)
                    OVER (PARTITION BY user_id ORDER BY ts)
                  > INTERVAL 10 MINUTE THEN 1
                  WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS s_start,
           max(ts) + INTERVAL 10 MINUTE AS s_end,
           count(*) AS cnt, sum(value) AS total
    FROM numbered GROUP BY user_id, sid
    """,
    doc="Session window, 10-minute gap (EventTimeSessionWindows + "
    "MergingWindowAssigner; SQL SESSION): window = [first, last+gap).",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .select(
            "user_id",
            F.col("w.start").alias("s_start"),
            F.col("w.end").alias("s_end"),
            "cnt",
            "total",
        )
    )


@register(
    "window_tumble_flink_sql",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS w_start,
           time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) + INTERVAL 1 HOUR AS w_end,
           event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2, 3
    """,
    doc="Flink-1.8 SQL spelling through the pre-rewrite layer: "
    "TUMBLE/TUMBLE_START/TUMBLE_END -> window() (FunctionCatalog.scala:495).",
)
def window_tumble_flink_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.engine import Engine

    eng = Engine(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start,
               TUMBLE_END(ts, INTERVAL '1' HOUR) AS w_end,
               event_type, count(*) AS cnt
        FROM events GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type
        """
    )


@register(
    "window_hop_flink_sql",
    oracle="""
    SELECT time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP)
             - (o * INTERVAL '30 minutes') AS w_start,
           count(*) AS cnt
    FROM events CROSS JOIN (VALUES (0), (1)) AS offs(o)
    GROUP BY 1
    """,
    doc="Flink SQL HOP (time, slide, size) -> window(time, size, slide) "
    "argument-order swap through the rewrite layer.",
)
def window_hop_flink_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.engine import Engine

    eng = Engine(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS w_start,
               count(*) AS cnt
        FROM events
        GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)
        """
    )


@register(
    "window_tumble_daily_join",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts::TIMESTAMP) AS day_start,
           event_type,
           count(DISTINCT user_id) AS active_users,
           sum(value) AS total
    FROM events WHERE event_type IN ('purchase', 'click')
    GROUP BY 1, 2
    """,
    doc="Daily tumbling window with distinct-agg (windowed distinct users).",
)
def window_tumble_daily_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.countDistinct("user_id").alias("active_users"),
            F.sum("value").alias("total"),
        )
        .select(F.col("w.start").alias("day_start"), "event_type", "active_users", "total")
    )


@register(
    "window_session_flink_sql",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts::TIMESTAMP AS ts,
             CASE WHEN ts::TIMESTAMP - lag(ts::TIMESTAMP)
                    OVER (PARTITION BY user_id ORDER BY ts)
                  > INTERVAL 10 MINUTE THEN 1
                  WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS s_start, count(*) AS cnt
    FROM numbered GROUP BY user_id, sid
    """,
    doc="Flink SQL SESSION spelling (SESSION/SESSION_START, "
    "FunctionCatalog.scala:509) through the pre-rewrite layer -> "
    "session_window().",
)
def window_session_flink_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.engine import Engine

    eng = Engine(spark)
    table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return eng.sql(
        """
        SELECT user_id,
               SESSION_START(ts, INTERVAL '10' MINUTE) AS s_start,
               count(*) AS cnt
        FROM events GROUP BY SESSION(ts, INTERVAL '10' MINUTE), user_id
        """
    )
