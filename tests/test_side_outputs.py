"""Side outputs / connect / broadcast state / async I/O tests (§2.13)."""

from __future__ import annotations

import glob

import pandas as pd
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.streaming import side_outputs, sources
from tests.conftest import SF_SMALL


def test_split_tags(spark):
    ev = table(spark, SF_SMALL, "events")
    outs = side_outputs.split(
        ev,
        {
            "errors": F.col("event_type") == "error",
            "big": F.col("value") > 400,
            "rest": (F.col("event_type") != "error") & (F.col("value") <= 400),
        },
    )
    n_err = outs["errors"].count()
    n_rest = outs["rest"].count()
    assert n_err == ev.filter("event_type = 'error'").count()
    # overlapping tags allowed; errors+rest partition everything <= 400 or error
    assert n_err + n_rest == ev.filter("event_type = 'error' OR value <= 400").count()


def test_foreach_batch_fanout_streaming(spark, tmp_path):
    chunks = str(tmp_path / "chunks")
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=4)
    stream = sources.read_event_stream(spark, chunks, files_per_trigger=2)
    p_err = str(tmp_path / "out_errors")
    p_buy = str(tmp_path / "out_purchases")
    q = side_outputs.foreach_batch_fanout(
        stream,
        {
            "errors": (F.col("event_type") == "error", p_err),
            "purchases": (F.col("event_type") == "purchase", p_buy),
        },
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ev = table(spark, SF_SMALL, "events")
    assert spark.read.parquet(p_err).count() == ev.filter("event_type='error'").count()
    assert spark.read.parquet(p_buy).count() == ev.filter("event_type='purchase'").count()


def test_connect_tagged_schema_and_counts(spark):
    ev = table(spark, SF_SMALL, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    merged = side_outputs.connect_tagged(
        clicks,
        buys,
        key="user_id",
        payload_cols={"val": ("value", "value"), "eid": ("event_id", "event_id")},
    )
    assert set(merged.columns) == {"user_id", "__input", "val", "eid"}
    counts = {r["__input"]: r["cnt"] for r in merged.groupBy("__input").agg(F.count("*").alias("cnt")).collect()}
    assert counts[1] == clicks.count() and counts[2] == buys.count()


def test_broadcast_state_join_per_batch(spark, tmp_path):
    chunks = str(tmp_path / "chunks2")
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=3)
    stream = sources.read_event_stream(spark, chunks, files_per_trigger=1)
    cust = table(spark, SF_SMALL, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    seen: list[int] = []

    def sink(df, batch_id):
        seen.append(df.filter(F.col("c_mktsegment").isNotNull()).count())

    q = side_outputs.broadcast_state_join(
        stream, lambda: cust, on="user_id", sink_fn=sink
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ev = table(spark, SF_SMALL, "events")
    expected = ev.join(cust, "user_id").count()
    assert sum(seen) == expected


def test_async_map_matches_serial(spark):
    ev = table(spark, SF_SMALL, "events").select("event_id", "value").limit(200)

    def enrich(row: dict) -> dict:
        # stands in for a blocking external call
        return {"event_id": row["event_id"], "doubled": row["value"] * 2}

    out = side_outputs.async_map(ev, enrich, "event_id long, doubled double", concurrency=8)
    got = out.toPandas().sort_values("event_id").reset_index(drop=True)
    exp = (
        ev.select("event_id", (F.col("value") * 2).alias("doubled"))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_punctuated_watermark_channel(spark, tmp_path):
    """AssignerWithPunctuatedWatermarks parity: the watermark advances
    ONLY on marker rows; data rows behind a marker-carried watermark go
    to the late channel."""
    import datetime as dt

    from flink_1_8_sourcecode_spark.streaming.side_outputs import (
        punctuated_watermark_channel,
    )

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, etype string, wm timestamp"
    chunks = str(tmp_path / "punct")
    rows1 = [(1, base + dt.timedelta(minutes=1), "data", None),
             (2, base + dt.timedelta(minutes=9), "data", None),
             (3, None, "marker", base + dt.timedelta(minutes=5))]
    rows2 = [(4, base + dt.timedelta(minutes=2), "data", None),   # late: behind wm=5min
             (5, base + dt.timedelta(minutes=7), "data", None)]   # on time
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(chunks + "/__chunk=a")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(chunks + "/__chunk=b")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunks)
    )
    main_ids, late_ids = [], []
    q = punctuated_watermark_channel(
        stream, time_col="ts",
        marker_pred=F.col("etype") == "marker",
        marker_wm_col=F.col("wm"),
        main_fn=lambda b, i: main_ids.extend(r.event_id for r in b.collect()),
        late_fn=lambda b, i: late_ids.extend(r.event_id for r in b.collect()),
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert 4 in late_ids          # behind the marker watermark
    assert {1, 2, 5} <= set(main_ids)
    assert 3 not in main_ids + late_ids  # markers are not forwarded
