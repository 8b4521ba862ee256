"""OVER-window (analytic) inventory — SURVEY.md §2.6.

Reference: Flink 1.8 supports OVER only on streams, ordered by one
ascending time attribute (DataStreamOverAggregate.scala:105-120), with
runtime variants ProcTime/RowTime x Unbounded/BoundedRows/BoundedRange
(flink-table/.../runtime/aggregate/RowTimeBoundedRowsOver.scala:44 etc.).
Our engine expresses the same frames on the event-time column with
Spark's Window API (batch) — plus the ranking/navigation superset
(row_number/rank/lag/lead/ntile) Spark adds for free.

Scale note: one shuffle on the partition key per distinct partitioning;
all frames below share partitionBy(user_id) so Catalyst reuses a single
sort+exchange for all window functions in a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


@register(
    "over_unbounded",
    oracle="""
    SELECT event_id, user_id,
           sum(value) OVER w AS running_sum,
           count(*) OVER w AS running_cnt,
           max(value) OVER w AS running_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Unbounded-preceding OVER (ProcTimeUnboundedOver/RowTimeUnboundedOver).",
    bench=True,
)
def over_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.sum("value").over(w).alias("running_sum"),
        F.count(F.lit(1)).over(w).alias("running_cnt"),
        F.max("value").over(w).alias("running_max"),
    )


@register(
    "over_bounded_rows",
    oracle="""
    SELECT event_id, user_id,
           avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg
    FROM events
    """,
    doc="Bounded ROWS frame (ProcTimeBoundedRowsOver/RowTimeBoundedRowsOver.scala:44).",
)
def over_bounded_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.avg("value").over(w).alias("mov_avg")
    )


@register(
    "over_bounded_range_time",
    oracle="""
    SELECT event_id, user_id,
           sum(value) OVER (PARTITION BY user_id
                            ORDER BY floor(epoch(ts))::BIGINT
                            RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS hr_sum
    FROM events
    """,
    doc="Bounded RANGE over event time, 1h window "
    "(ProcTimeBoundedRangeOver/RowTimeBoundedRangeOver) — ordered on "
    "epoch seconds so the frame is a true time interval.  The oracle "
    "floors epoch() explicitly: DuckDB's DOUBLE->BIGINT cast ROUNDS "
    "fractional seconds while Spark's timestamp->long cast truncates, "
    "which shifts a frame boundary for sub-second timestamps (bit the "
    "sf0.1 sweep on 2 rows).",
)
def over_bounded_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        # NTZ cannot cast straight to long in Spark 4; go via LTZ (session
        # tz is UTC, so epoch seconds are identical either way)
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.sum("value").over(w).alias("hr_sum")
    )


@register(
    "over_ranking",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER w AS rn,
           rank() OVER w AS rk,
           dense_rank() OVER w AS drk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
    """,
    doc="Ranking functions (Spark superset; Flink 1.8 catalog lacks them — "
    "SURVEY §2.6 'harmless superset').",
)
def over_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
    )


@register(
    "over_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           lag(value, 2, -1.0) OVER w AS prev2_or_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="LAG/LEAD navigation (Spark superset over the 1.8 catalog).",
)
def over_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_or_default"),
    )


@register(
    "over_ntile",
    oracle="""
    SELECT event_id, event_type,
           ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile
    FROM events
    """,
    doc="NTILE bucketing (deterministic tie-break on event_id).",
)
def over_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.ntile(4).over(w).alias("quartile")
    )
