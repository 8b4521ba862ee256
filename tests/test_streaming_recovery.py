"""Checkpoint recovery (exactly-once) + late-data side channel + hop
window streaming tests."""

from __future__ import annotations

import datetime as dt
import shutil

import pandas as pd
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.streaming import side_outputs, sinks, sources, windows
from tests.conftest import SF_SMALL, assert_frames_match


def test_file_sink_exactly_once_across_restart(spark, tmp_path):
    """StreamingFileSink parity (StreamingFileSink.java:95): stop the
    query mid-stream, restart from the checkpoint, and the sink holds
    every input row exactly once."""
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = table(spark, SF_SMALL, "events").orderBy("ts").limit(600)
    # first half of the input
    ev.limit(300).coalesce(1).write.mode("overwrite").parquet(src_dir)

    def start():
        stream = (
            spark.readStream.schema(sources.EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .select("event_id", "user_id", "value")
        )
        return sinks.file_sink(stream, out_dir, ckpt).start()

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # second half arrives while the query is DOWN; restart resumes from
    # the checkpoint without reprocessing the first half
    ev.subtract(ev.limit(300)).coalesce(1).write.mode("append").parquet(src_dir)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out_dir)
    assert got.count() == 600
    assert got.select("event_id").distinct().count() == 600  # exactly once


def test_late_data_side_channel(spark, tmp_path):
    """allowedLateness/sideOutputLateData emulation: rows arriving behind
    the tracked watermark land in the late channel, everything else in
    the main channel, with no loss."""
    src_dir = str(tmp_path / "late_src")
    base = dt.datetime(2024, 1, 1)
    on_time = [(i, base + dt.timedelta(minutes=i), 1.0) for i in range(30)]
    late = [(100 + i, base + dt.timedelta(minutes=i), 1.0) for i in range(3)]  # very old
    schema = "event_id long, ts timestamp, value double"
    spark.createDataFrame(on_time, schema).coalesce(1).write.mode("overwrite").parquet(
        src_dir + "/f=1"
    )
    spark.createDataFrame(late, schema).coalesce(1).write.mode("overwrite").parquet(
        src_dir + "/f=2"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src_dir)
    )
    got_main, got_late = [], []
    q = side_outputs.late_data_side_channel(
        stream,
        "ts",
        "10 minutes",
        main_fn=lambda df, _b: got_main.extend(r.event_id for r in df.collect()),
        late_fn=lambda df, _b: got_late.extend(r.event_id for r in df.collect()),
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(got_main + got_late) == sorted([e for e, _, _ in on_time + late])
    # the 3 ancient rows arriving after the watermark advanced are late
    assert set(got_late) == {100, 101, 102}


def test_stream_hop_equals_batch(spark, tmp_path):
    chunks = str(tmp_path / "hop_chunks")
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=4)
    stream = sources.read_event_stream(spark, chunks)
    aggs = {"cnt": F.count(F.lit(1))}
    out = windows.hop(stream, "ts", "1 hour", "30 minutes", [], aggs, watermark="30 minutes")
    q = out.writeStream.format("memory").queryName("t_hop").outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("t_hop")
        .toPandas()
        .drop_duplicates(subset=["w_start", "w_end"], keep="last")
    )
    expected = windows.hop(
        table(spark, SF_SMALL, "events"), "ts", "1 hour", "30 minutes", [], aggs
    ).toPandas()
    assert_frames_match(got, expected, name="stream_hop")
