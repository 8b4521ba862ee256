"""Streaming windowed aggregations + watermarks.

Reference parity: WindowOperator.java:294 (assign -> state -> trigger ->
emit at watermark), window assigners §2.7, watermark assignment
DataStream.assignTimestampsAndWatermarks (DataStream.java:883 —
BoundedOutOfOrdernessTimestampExtractor).  Spark's streaming aggregation +
withWatermark implements the same event-time firing and state cleanup;
allowedLateness folds into the watermark delay.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_bounded_out_of_orderness(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """BoundedOutOfOrdernessTimestampExtractor analogue."""
    return df.withWatermark(ts_col, delay)


def _agg(df_grouped, aggs: Mapping[str, Column]) -> DataFrame:
    exprs = [c.alias(name) for name, c in aggs.items()]
    return df_grouped.agg(*exprs)


def tumble(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: list[str],
    aggs: Mapping[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """TUMBLE(ts, size) GROUP BY keys — works on batch and streaming frames."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.window(ts_col, size).alias("w"), *keys)
    return _agg(g, aggs).select(
        F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), *keys,
        *[F.col(k) for k in aggs],
    )


def hop(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: list[str],
    aggs: Mapping[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """HOP (sliding) window."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.window(ts_col, size, slide).alias("w"), *keys)
    return _agg(g, aggs).select(
        F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), *keys,
        *[F.col(k) for k in aggs],
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: Mapping[str, Column],
    watermark: str | None = None,
) -> DataFrame:
    """SESSION window with static gap (dynamic gap: pass a Column as gap)."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    g = df.groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
    return _agg(g, aggs).select(
        F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), *keys,
        *[F.col(k) for k in aggs],
    )


def streaming_dedup(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str | None = None
) -> DataFrame:
    """Keep-first-per-key on a stream.

    watermark=None -> exact dedup with unbounded state (Flink dedup without
    TTL).  With a watermark -> dropDuplicatesWithinWatermark: state expires
    after the delay and a key may legitimately re-emit — Flink's
    idle-state-TTL dedup (CleanupState.scala parity).
    """
    if watermark is None:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
