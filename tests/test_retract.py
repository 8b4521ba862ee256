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
