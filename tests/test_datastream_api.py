"""Fluent DataStream-API facade (datastream_api.py) — DataStream.java
surface lowering to Structured Streaming.  Streams are driven through
the chunked-parquet replay fixture and checked against batch twins.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.datastream_api import (
    DataStream,
    StreamExecutionEnvironment,
)
from flink_1_8_sourcecode_spark.streaming import sources
from tests.conftest import SF_SMALL


@pytest.fixture()
def env(spark):
    return StreamExecutionEnvironment.get_execution_environment(spark)


def _event_stream(spark, tmp_path, name, sentinel=False):
    import datetime as dt

    chunks = str(tmp_path / name)
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=3)
    if sentinel:
        max_ts = table(spark, SF_SMALL, "events").agg(F.max("ts")).first()[0]
        spark.createDataFrame(
            [(10**9, max_ts + dt.timedelta(days=30), -1, "noop", 0.0, "{}")],
            sources.EVENTS_SCHEMA,
        ).write.mode("append").parquet(chunks + "/__chunk=zz_sentinel")
    return sources.read_event_stream(spark, chunks)


def _drain(q):
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_map_filter_window_aggregate_matches_batch(spark, env, tmp_path):
    stream = env.add_source(_event_stream(spark, tmp_path, "ds_api", sentinel=True))
    out = (
        # the far-future sentinel (user -1) must SURVIVE the filter or
        # the watermark never closes the final windows
        stream.filter((F.col("user_id") % 2 == 0) | (F.col("user_id") < 0))
        .map(F.col("user_id"), F.col("ts"), (F.col("value") * 2).alias("v2"))
        .assign_timestamps_and_watermarks("ts", "10 minutes")
        .key_by("user_id")
        .time_window("ts", "1 day")
        .aggregate(total=F.sum("v2"), cnt=F.count(F.lit(1)))
    )
    q = out.add_sink_memory("t_ds_api", mode="append")
    _drain(q)
    got = spark.table("t_ds_api").toPandas()
    got = got[got.user_id >= 0]

    ev = table(spark, SF_SMALL, "events").filter(F.col("user_id") % 2 == 0)
    want = (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.sum(F.col("value") * 2).alias("total"), F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                "user_id", "total", "cnt")
        .toPandas()
    )
    key = ["w_start", "user_id"]
    got_s = got.sort_values(key).reset_index(drop=True)
    want_s = want.sort_values(key).reset_index(drop=True)
    assert len(got_s) == len(want_s)
    assert (got_s["cnt"].to_numpy() == want_s["cnt"].to_numpy()).all()
    assert abs(got_s["total"].to_numpy() - want_s["total"].to_numpy()).max() < 1e-6


def test_union_and_flat_map(spark, env, tmp_path):
    s1 = env.add_source(_event_stream(spark, tmp_path, "ds_u1"))
    s2 = env.add_source(_event_stream(spark, tmp_path, "ds_u2"))
    both = s1.union(s2).flat_map(
        F.col("event_id"),
        F.explode(F.array(F.lit("x"), F.lit("y"))).alias("tag"),
    )
    q = both.add_sink_memory("t_ds_union", mode="append")
    _drain(q)
    n_events = table(spark, SF_SMALL, "events").count()
    assert spark.table("t_ds_union").count() == 2 * 2 * n_events


def test_count_window_and_process_delegate(spark, env, tmp_path):
    stream = env.add_source(_event_stream(spark, tmp_path, "ds_cw"))
    out = stream.key_by("user_id").count_window("value", 5)
    q = out.writeStream.format("memory").queryName("t_ds_cw").outputMode("append").start()
    _drain(q)
    got = spark.table("t_ds_cw")
    assert got.filter("cnt != 5").count() == 0  # only FULL windows emit
    with pytest.raises(NotImplementedError, match="one key"):
        stream.key_by("user_id", "event_type").count_window("value", 5)


def test_session_window_and_rate_source(spark, env, tmp_path):
    stream = env.add_source(_event_stream(spark, tmp_path, "ds_sess"))
    out = (
        stream.key_by("user_id")
        .session_window("ts", "2 hours", watermark="10 minutes")
        .sum("value")
    )
    q = out.add_sink_memory("t_ds_sess", mode="append")
    _drain(q)
    assert spark.table("t_ds_sess").count() > 0
    # rate source wires a streaming frame
    rs = env.rate_stream(5)
    assert rs.df.isStreaming


def test_reduce_running_and_bounded_delegates(spark, env, tmp_path):
    stream = env.add_source(_event_stream(spark, tmp_path, "ds_red", sentinel=True))
    out = stream.key_by("user_id").reduce_bounded(
        "ts", "value", "30 minutes", preceding_rows=1, tiebreak="event_id",
    )
    q = out.writeStream.format("memory").queryName("t_ds_red").outputMode("append").start()
    _drain(q)
    got = spark.table("t_ds_red").filter("user_id >= 0")
    # 2-row frame: w_cnt is 1 for each user's first event, else 2
    assert got.filter("w_cnt > 2").count() == 0
    firsts = got.filter("w_cnt = 1").count()
    assert firsts == got.select("user_id").distinct().count()
    with pytest.raises(NotImplementedError, match="one key"):
        stream.key_by("user_id", "event_type").reduce_bounded(
            "ts", "value", "30 minutes", preceding_rows=1
        )


def test_split_and_connect(spark, env, tmp_path):
    stream = env.add_source(_event_stream(spark, tmp_path, "ds_split"))
    channels = stream.split({
        "big": F.col("value") > 50,
        "small": F.col("value") <= 50,
    })
    qb = channels["big"].add_sink_memory("t_ds_big", mode="append")
    _drain(qb)
    qs = channels["small"].add_sink_memory("t_ds_small", mode="append")
    _drain(qs)
    total = table(spark, SF_SMALL, "events").count()
    nb = spark.table("t_ds_big").count()
    ns = spark.table("t_ds_small").count()
    assert nb + ns == total and nb > 0 and ns > 0
    assert spark.table("t_ds_big").filter("value <= 50").count() == 0

    s2 = env.add_source(_event_stream(spark, tmp_path, "ds_conn"))
    merged = stream.connect(
        s2, "user_id", {"v": ("value", None), "t": (None, "event_type")}
    )
    qm = merged.add_sink_memory("t_ds_conn", mode="append")
    _drain(qm)
    got = spark.table("t_ds_conn")
    assert set(got.columns) == {"user_id", "__input", "v", "t"}
    assert got.filter("__input = 1 AND t IS NOT NULL").count() == 0
    assert got.filter("__input = 2 AND v IS NOT NULL").count() == 0
    assert got.count() == 2 * total
