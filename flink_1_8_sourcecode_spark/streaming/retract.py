"""toRetractStream / toAppendStream — the Table->DataStream conversion
surface of the reference's StreamTableEnvironment
(flink-table/flink-table-planner/.../api/java/StreamTableEnvironment
.scala:155 toAppendStream, :247 toRetractStream; the retraction
changelog semantics of CRowWrapping / RetractStreamTableSink).

``toRetractStream`` turns a CONTINUOUSLY UPDATING table (a streaming
group aggregate) into a changelog of ``(add: boolean, row)`` pairs:
every key update emits ``(false, old_row)`` then ``(true, new_row)``;
first appearance emits only the add.  Folding the changelog (apply
adds, remove retracts) always reconstructs the table's current state —
that invariant IS the correctness check.

Spark-first lowering: Structured Streaming has no retraction mode, but
``foreachBatch`` over an update-mode aggregate delivers exactly the
per-trigger UPDATED ROWS.  Each micro-batch:

1. joins its updated rows against the persisted previous snapshot on
   the key columns (a distributed left join — the snapshot is
   key-cardinality-sized parquet, the same bound as the reference's
   per-key prior-value state in RetractStream translation),
2. appends ``(false, old)`` + ``(true, new)`` rows to the changelog
   sink (parquet, exactly-once per epoch id is not needed — the
   changelog is append-only and replays idempotently per batch id),
3. merges the updates into the snapshot for the next batch.

Every step is a DataFrame job — no driver-side key loops — so the
conversion scales with the aggregate's key space, not the stream.

``toAppendStream`` asserts the query is append-only (the reference
throws TableException "Table is not an append-only table" for
updating queries) and passes the stream through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TableException(Exception):
    """api/TableException — toAppendStream on an updating table."""


def to_append_stream(df: DataFrame) -> DataFrame:
    """toAppendStream (StreamTableEnvironment.scala:155): only valid
    for queries whose plan never updates an emitted row.  Structured
    Streaming encodes the same property as append-output-mode support;
    a streaming aggregate without watermark/window finalization is the
    updating case the reference rejects."""
    if not df.isStreaming:
        return df
    # isAppendOnly check (UpdatingPlanChecker parity): a streaming
    # aggregate with no event-time window/watermark finalization keeps
    # updating emitted rows — Spark's append output mode would reject
    # it at query start; fail here with the reference's message
    plan = df._jdf.queryExecution().analyzed().toString()
    if "Aggregate" in plan and "window" not in plan.lower():
        raise TableException(
            "Table is not an append-only table. Use toRetractStream "
            "(to_retract_stream) to handle add and retract messages."
        )
    return df


def to_retract_stream(
    agg_df: DataFrame,
    key_cols: list[str],
    changelog_path: str,
    checkpoint: str,
    snapshot_path: str | None = None,
):
    """toRetractStream (StreamTableEnvironment.scala:247): run the
    updating ``agg_df`` and materialize its CHANGELOG — rows of
    ``(add boolean, <table columns>)`` — at ``changelog_path``.

    Returns the started StreamingQuery; read the changelog with
    ``spark.read.parquet(changelog_path)`` (it carries ``__batch_id``
    for ordering).  Fold rule: within a key, the row from the highest
    batch with ``add = true`` that has no later retraction is current —
    equivalently ``read_changelog_state``.
    """
    snapshot_path = snapshot_path or changelog_path.rstrip("/") + "__snapshot"
    val_cols = [c for c in agg_df.columns if c not in key_cols]
    spark = agg_df.sparkSession

    def _read_snapshot(path: str):
        # Spark-native existence probe: works on any FileSystem the
        # session can read (HDFS/S3/local), unlike a driver-local
        # os.path check (r15 review finding)
        try:
            return spark.read.parquet(path)
        except Exception:
            return None

    def emit(batch_df: DataFrame, batch_id: int) -> None:
        # alternating snapshot dirs by batch parity: ONE snapshot
        # write per batch (no read-back copy, no leaked temp dir), and
        # a retried batch re-reads its intact prev dir — idempotent
        prev_dir = f"{snapshot_path}/v{(batch_id + 1) % 2}"
        next_dir = f"{snapshot_path}/v{batch_id % 2}"
        batch_df = batch_df.persist()
        try:
            # batch 0 starts a FRESH changelog: a leftover snapshot
            # from a prior run at the same path must not fabricate
            # retractions for rows this changelog never added
            prev = None if batch_id == 0 else _read_snapshot(prev_dir)
            if prev is not None:
                old = batch_df.select(*key_cols).join(prev, key_cols, "inner")
                retracts = old.select(
                    F.lit(False).alias("add"), *key_cols, *val_cols,
                    F.lit(batch_id).alias("__batch_id"),
                )
            else:
                retracts = None
            adds = batch_df.select(
                F.lit(True).alias("add"), *key_cols, *val_cols,
                F.lit(batch_id).alias("__batch_id"),
            )
            out = adds if retracts is None else retracts.unionByName(adds)
            out.write.mode("append").parquet(changelog_path)
            # merge updates into the snapshot (anti-join keeps
            # untouched keys, union adds the new versions)
            if prev is not None:
                kept = prev.join(
                    batch_df.select(*key_cols), key_cols, "left_anti"
                )
                nxt = kept.unionByName(batch_df.select(*key_cols, *val_cols))
            else:
                nxt = batch_df.select(*key_cols, *val_cols)
            nxt.write.mode("overwrite").parquet(next_dir)
        finally:
            batch_df.unpersist()

    return (
        agg_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(emit)
        .start()
    )


def read_changelog_state(spark, changelog_path: str,
                         key_cols: list[str]) -> DataFrame:
    """Fold a changelog back to the table's current state: per key,
    the latest ADD that was not later retracted — for an add/retract
    stream produced by :func:`to_retract_stream`, simply each key's
    row from its highest ``__batch_id`` with ``add = true`` (a retract
    is always followed by its replacing add within the same batch)."""
    log = spark.read.parquet(changelog_path)
    latest = log.filter(F.col("add")).groupBy(*key_cols).agg(
        F.max_by(
            F.struct(*[c for c in log.columns
                       if c not in key_cols + ["add"]]),
            F.col("__batch_id"),
        ).alias("__v")
    )
    vals = [c for c in log.columns
            if c not in key_cols + ["add", "__batch_id"]]
    return latest.select(
        *key_cols, *[F.col("__v")[c].alias(c) for c in vals]
    )
