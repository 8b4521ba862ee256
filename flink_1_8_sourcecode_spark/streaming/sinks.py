"""Streaming sinks and output-mode mapping.

Reference parity (SURVEY.md §1.3, §2.2):
- AppendStreamTableSink   -> outputMode('append')
- RetractStreamTableSink  -> outputMode('update')  (per-batch upserts;
  equivalence = final materialized state, SURVEY §7 'what's hard' #3)
- UpsertStreamTableSink   -> foreachBatch + keyed MERGE (``upsert_sink``)
- StreamingFileSink (StreamingFileSink.java:95, exactly-once bucketed
  part files committed on checkpoint) -> file sink + checkpointLocation
  (same commit-on-checkpoint semantics)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def file_sink(df: DataFrame, path: str, checkpoint: str, fmt: str = "parquet"):
    """StreamingFileSink analogue: exactly-once bucketed files."""
    return (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )


def console_sink(df: DataFrame, mode: str = "append"):
    """DataStream.print() analogue."""
    return df.writeStream.format("console").outputMode(mode)


def memory_sink(df: DataFrame, name: str, mode: str = "update"):
    """Test sink: named in-memory table (harness-test analogue)."""
    return df.writeStream.format("memory").queryName(name).outputMode(mode)


def upsert_sink(
    df: DataFrame,
    merge_fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
    mode: str = "update",
):
    """UpsertStreamTableSink analogue: every micro-batch hands its upsert
    delta to ``merge_fn(batch_df, batch_id)`` (e.g. a JDBC/Delta MERGE)."""
    w = df.writeStream.foreachBatch(merge_fn).outputMode(mode)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w
