"""toRetractStream / toAppendStream (streaming/retract.py) —
StreamTableEnvironment.scala:155/:247 parity: an updating aggregate
becomes an (add, row) changelog whose fold reconstructs the table; an
updating table refuses toAppendStream with the reference's message."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.streaming import sources
from flink_1_8_sourcecode_spark.streaming.retract import (
    TableException,
    make_retract_emitter,
    read_changelog_state,
    to_append_stream,
    to_retract_stream,
)
from tests.conftest import SF_SMALL


def _stream(spark, tmp_path, name):
    chunks = str(tmp_path / name)
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=4)
    return sources.read_event_stream(spark, chunks)


class TestRetractStream:
    def test_changelog_fold_equals_batch(self, spark, tmp_path):
        agg = _stream(spark, tmp_path, "rt_src").groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("total"),
        )
        log_path = str(tmp_path / "rt_log")
        q = to_retract_stream(
            agg, ["event_type"], log_path, str(tmp_path / "rt_ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = {
            r.event_type: (r.cnt, round(r.total, 6))
            for r in read_changelog_state(
                spark, log_path, ["event_type"]
            ).collect()
        }
        want = {
            r.event_type: (r.cnt, round(r.total, 6))
            for r in table(spark, SF_SMALL, "events")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
            .collect()
        }
        assert got == want

    def test_retracts_pair_with_prior_adds(self, spark, tmp_path):
        agg = _stream(spark, tmp_path, "rt_pair").groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        log_path = str(tmp_path / "rt_pair_log")
        q = to_retract_stream(
            agg, ["event_type"], log_path, str(tmp_path / "rt_pair_ckpt")
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        log = spark.read.parquet(log_path).collect()
        adds = {}
        # within a batch the retraction names the PRE-batch state, so
        # fold retracts (add=False) before adds
        for r in sorted(log, key=lambda r: (r.__getitem__("__batch_id"),
                                            r.add)):
            if r.add:
                adds[r.event_type] = r.cnt
            else:
                # every retraction names exactly the currently-held row
                assert adds.get(r.event_type) == r.cnt, (
                    f"retract of unseen value for {r.event_type}"
                )
        # multi-batch replay really produced retractions
        assert any(not r.add for r in log)
        # first appearance of each key has no retraction in its batch
        first_batch = {}
        for r in log:
            b = r.__getitem__("__batch_id")
            if r.add and (r.event_type not in first_batch
                          or b < first_batch[r.event_type]):
                first_batch[r.event_type] = b
        for r in log:
            if not r.add:
                assert r.__getitem__("__batch_id") > first_batch[r.event_type]

    def test_append_stream_guard(self, spark, tmp_path):
        src = _stream(spark, tmp_path, "rt_guard")
        # updating aggregate -> refuse with the reference's message
        agg = src.groupBy("event_type").count()
        with pytest.raises(TableException, match="not an append-only"):
            to_append_stream(agg)
        # map-only plan passes through untouched
        passed = to_append_stream(src.select("event_id", "value"))
        assert passed.isStreaming
        # windowed (finalizable) aggregate is append-only and passes
        win = (
            src.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 day"), "event_type")
            .count()
        )
        assert to_append_stream(win).isStreaming
        # batch frames pass through
        b = table(spark, SF_SMALL, "events")
        assert to_append_stream(b) is b

    def test_append_stream_structural_not_string_sniff(self, spark,
                                                       tmp_path):
        """UpdatingPlanChecker parity is STRUCTURAL (delegated to
        Spark's UnsupportedOperationChecker), not a plan-string test —
        the two escapes of the r15 string sniff must both be closed."""
        src = _stream(spark, tmp_path, "rt_guard2")
        # windowed but WATERMARKLESS aggregate never finalizes -> it
        # is still updating and must be refused (the old sniff passed
        # it because the plan string contains "window")
        nowm = src.groupBy(F.window("ts", "1 day"), "event_type").count()
        with pytest.raises(TableException, match="not an append-only"):
            to_append_stream(nowm)
        # an updating aggregate cannot hide behind a column whose NAME
        # contains "window"
        masked = (
            src.selectExpr("event_type AS window_size", "value")
            .groupBy("window_size")
            .count()
        )
        with pytest.raises(TableException, match="not an append-only"):
            to_append_stream(masked)
        # ...and a map-only plan with such a column is not falsely
        # refused
        ok = to_append_stream(src.selectExpr("value AS window_size"))
        assert ok.isStreaming


def _bucket_listing(snap_path):
    """{bucket dir name: sorted data file names} for a snapshot dir."""
    import pathlib

    out = {}
    for d in pathlib.Path(snap_path).iterdir():
        if d.name.startswith("__bucket="):
            out[d.name] = sorted(
                p.name for p in d.iterdir() if p.name.endswith(".parquet")
            )
    return out


class TestRetractSnapshotScale:
    """The snapshot behind to_retract_stream is hash-bucketed with
    dynamic partition overwrite (GroupAggProcessFunction.scala:39
    per-key state parity): per-trigger cost tracks O(touched buckets),
    retries are idempotent, and a corrupted snapshot read FAILS the
    batch instead of fabricating an add-only changelog."""

    def _emitter(self, tmp_path, name, num_buckets=8):
        base = tmp_path / name
        log, snap = str(base / "log"), str(base / "snap")
        emit = make_retract_emitter(
            ["k"], ["cnt"], log, snap, num_buckets=num_buckets
        )
        return emit, log, snap

    def test_only_touched_buckets_rewritten(self, spark, tmp_path):
        emit, log, snap = self._emitter(tmp_path, "bk")
        emit(
            spark.createDataFrame(
                [(i, 1) for i in range(64)], "k int, cnt int"
            ),
            0,
        )
        before = _bucket_listing(snap)
        assert len(before) > 1, "need multiple buckets for the test"
        # batch 1 updates ONE key -> exactly one bucket dir rewritten
        emit(spark.createDataFrame([(7, 2)], "k int, cnt int"), 1)
        after = _bucket_listing(snap)
        assert set(after) == set(before)
        changed = [b for b in before if after[b] != before[b]]
        assert len(changed) == 1, (
            f"batch touching 1 key rewrote {len(changed)} buckets: "
            f"{changed}"
        )
        # and the fold is still the current state
        got = {
            r.k: r.cnt
            for r in read_changelog_state(spark, log, ["k"]).collect()
        }
        assert got == {i: (2 if i == 7 else 1) for i in range(64)}

    def test_retry_is_idempotent_with_true_old_values(self, spark,
                                                      tmp_path):
        emit, log, snap = self._emitter(tmp_path, "retry")
        emit(
            spark.createDataFrame([(1, 10), (2, 50)], "k int, cnt int"), 0
        )
        batch1 = spark.createDataFrame([(1, 30)], "k int, cnt int")
        emit(batch1, 1)  # first attempt: merges into the snapshot
        emit(batch1, 1)  # foreachBatch retry AFTER the snapshot merge
        rows = (
            spark.read.parquet(log)
            .filter(F.col("__batch_id") == 1)
            .collect()
        )
        # the rewritten batch dir holds exactly one (retract, add) pair
        assert sorted((r.add, r.k, r.cnt) for r in rows) == [
            (False, 1, 10),  # TRUE pre-batch value, not the merged 30
            (True, 1, 30),
        ]
        got = {
            r.k: r.cnt
            for r in read_changelog_state(spark, log, ["k"]).collect()
        }
        assert got == {1: 30, 2: 50}

    def test_corrupt_snapshot_read_fails_batch(self, spark, tmp_path):
        import pathlib

        emit, log, snap = self._emitter(tmp_path, "corrupt",
                                        num_buckets=1)
        emit(spark.createDataFrame([(1, 10)], "k int, cnt int"), 0)
        # corrupt the (single) snapshot bucket's data file
        parts = list(pathlib.Path(snap).rglob("*.parquet"))
        assert parts
        for p in parts:
            p.write_bytes(b"not a parquet file")
        # an unreadable EXISTING snapshot must raise (Structured
        # Streaming would retry the batch) — never silently emit
        # add-only rows and overwrite the snapshot
        with pytest.raises(Exception, match="[Pp]arquet|PATH|footer"):
            emit(spark.createDataFrame([(1, 20)], "k int, cnt int"), 1)
        batch1_dir = pathlib.Path(log) / "__batch_id=1"
        assert not any(batch1_dir.rglob("*.parquet")), (
            "failed batch must not have published changelog rows"
        )
