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
    delta to ``merge_fn(batch_df, batch_id)`` (e.g. a JDBC/Delta MERGE,
    or :func:`parquet_upsert_merger` for a data-lake table)."""
    w = df.writeStream.foreachBatch(merge_fn).outputMode(mode)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def parquet_upsert_merger(
    key_cols: list[str], path: str, num_buckets: int = 16
) -> Callable[[DataFrame, int], None]:
    """A concrete keyed MERGE target for :func:`upsert_sink`
    (UpsertStreamTableSink.scala setKeyFields/emitDataStream parity —
    the reference's upsert sinks MERGE per key into an external table;
    here the table is hash-bucketed parquet).

    Scale + retry contract (same design as the toRetractStream
    snapshot, streaming/retract.py): the table is partitioned by
    ``__bucket = pmod(xxhash64(keys), num_buckets)``; each micro-batch
    reads ONLY the buckets containing its keys (partition-pruned),
    anti-joins the old versions out, and rewrites just those buckets
    via dynamic partition overwrite — per-trigger cost tracks
    O(touched buckets), not O(table).  An update-mode aggregate's
    batch delta is deterministic on replay, so a retried batch
    rewrites the same bucket content: idempotent by value, no
    duplicate keys.  Unlike the retract snapshot, batch 0 does NOT
    truncate — an upsert sink merges into whatever the external table
    already holds (JDBC MERGE semantics).

    Read the current table back with :func:`read_upsert_table`.
    """
    from pyspark.sql import functions as F

    from flink_1_8_sourcecode_spark.streaming.retract import _path_exists

    bucket = F.pmod(F.xxhash64(*key_cols), F.lit(num_buckets))

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            # only driver-side collect: <= num_buckets small ints
            touched = [
                r[0]
                for r in batch_df.select(bucket.alias("__bucket"))
                .distinct().collect()
            ]
            if _path_exists(spark, path):
                prev = spark.read.parquet(path).filter(
                    F.col("__bucket").isin(touched)
                )
                kept = prev.join(
                    batch_df.select(*key_cols), key_cols, "left_anti"
                ).drop("__bucket")
                nxt = kept.unionByName(batch_df)
            else:
                nxt = batch_df
            (
                nxt.withColumn("__bucket", bucket)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__bucket")
                .parquet(path)
            )
        finally:
            batch_df.unpersist()

    return merge


def read_upsert_table(spark, path: str) -> DataFrame:
    """The current state of a :func:`parquet_upsert_merger` table."""
    return spark.read.parquet(path).drop("__bucket")


def queryable_state(df: DataFrame, name: str, checkpoint: str | None = None):
    """Queryable state (KeyedStream.asQueryableState, flink-streaming-java/
    .../datastream/KeyedStream.java:1004 + QueryableStateClient): expose a
    streaming aggregation's CURRENT state for ad-hoc point lookups while
    the job runs.

    Spark's idiomatic equivalent is the complete-mode memory sink: every
    micro-batch publishes the full updated state as the in-memory table
    ``name``, and any concurrent ``spark.sql("SELECT ... FROM name WHERE
    key = ...")`` is the QueryableStateClient.getKvState call — same
    read-your-aggregation-live contract, without a bespoke RPC layer.

    Scale note: complete mode re-publishes the whole aggregate each
    batch, so this fits state that a Flink deployment would also have
    served queryably (bounded keyed aggregates), not raw streams; for
    unbounded key spaces, upsert_sink into an external KV store is the
    production path (same as Flink recommending state TTL + external
    serving there).
    """
    w = df.writeStream.format("memory").queryName(name).outputMode("complete")
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w
