"""Streaming harness tests (analogue of the reference's
OneInputStreamOperatorTestHarness suites, SURVEY.md §5.4).

Strategy: replay the events table as time-ordered chunk files through the
file source (one chunk per micro-batch), run the streaming operator, and
assert the final materialized state equals the batch equivalent — the
equivalence contract defined in SURVEY §7 (retract traces differ, final
state must match).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.streaming import sources, stateful, windows
from tests.conftest import SF_SMALL, assert_frames_match


@pytest.fixture(scope="module")
def chunk_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("event_chunks"))
    sources.write_event_chunks(spark, SF_SMALL, d, n_chunks=6)
    return d


def _run(q_builder, name: str, spark, mode: str = "update") -> pd.DataFrame:
    query = q_builder.queryName(name).outputMode(mode).start()
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return spark.table(name).toPandas()


def test_stream_tumble_equals_batch(spark, chunk_dir):
    stream = sources.read_event_stream(spark, chunk_dir)
    aggs = {"cnt": F.count(F.lit(1)), "total": F.sum("value")}
    out = windows.tumble(stream, "ts", "1 hour", ["event_type"], aggs, watermark="30 minutes")
    got = _run(out.writeStream.format("memory"), "t_tumble", spark, mode="update")

    batch = windows.tumble(table(spark, SF_SMALL, "events"), "ts", "1 hour", ["event_type"], aggs)
    expected = batch.toPandas()
    # update-mode memory sink may hold multiple versions of a window row —
    # keep the last emitted version per (window, key).
    got = got.drop_duplicates(subset=["w_start", "w_end", "event_type"], keep="last")
    assert_frames_match(got, expected, name="stream_tumble")


def test_stream_session_equals_batch(spark, chunk_dir):
    stream = sources.read_event_stream(spark, chunk_dir)
    aggs = {"cnt": F.count(F.lit(1))}
    out = windows.session(stream, "ts", "10 minutes", ["user_id"], aggs, watermark="30 minutes")
    # session windows require append or update w/ watermark; use complete-safe append
    got = _run(out.writeStream.format("memory"), "t_session", spark, mode="append")

    batch = windows.session(
        table(spark, SF_SMALL, "events"), "ts", "10 minutes", ["user_id"], aggs
    )
    expected = batch.toPandas()
    # append mode only emits windows closed by the final watermark; every
    # emitted window must match its batch twin, and coverage must be high.
    merged = got.merge(expected, on=["w_start", "w_end", "user_id"], suffixes=("_s", "_b"))
    assert len(merged) == len(got)
    assert (merged["cnt_s"] == merged["cnt_b"]).all()
    assert len(got) >= 0.8 * len(expected)


def test_stream_dedup_keys(spark, chunk_dir):
    # Exact dedup (unbounded state): exactly one row per observed key.
    stream = sources.read_event_stream(spark, chunk_dir)
    out = windows.streaming_dedup(stream, ["user_id", "event_type"], "ts")
    got = _run(out.writeStream.format("memory"), "t_dedup", spark, mode="append")
    assert got.groupby(["user_id", "event_type"]).size().max() == 1
    expected_keys = (
        table(spark, SF_SMALL, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert len(got) == expected_keys


def test_stream_dedup_ttl_bounded(spark, chunk_dir):
    # TTL-bounded dedup: a key may re-emit only after its state expired,
    # i.e. consecutive emissions of the same key are > delay apart.
    stream = sources.read_event_stream(spark, chunk_dir)
    out = windows.streaming_dedup(stream, ["user_id", "event_type"], "ts", "30 minutes")
    got = _run(out.writeStream.format("memory"), "t_dedup_ttl", spark, mode="append")
    gaps_ok = (
        got.sort_values("ts")
        .groupby(["user_id", "event_type"])["ts"]
        .apply(lambda s: s.diff().dropna().min())
        .dropna()
    )
    assert (gaps_ok > pd.Timedelta(minutes=30)).all()


def test_stream_count_window(spark, chunk_dir):
    stream = sources.read_event_stream(spark, chunk_dir)
    out = stateful.count_window_agg(stream, "user_id", "value", window_size=5)
    got = _run(out.writeStream.format("memory"), "t_cw", spark, mode="append")

    ev = table(spark, SF_SMALL, "events").toPandas().sort_values(["ts", "event_id"])
    for uid, grp in ev.groupby("user_id"):
        n_expected = len(grp) // 5
        mine = got[got["user_id"] == uid]  # key column keeps its input name
        assert len(mine) == n_expected, f"user {uid}: {len(mine)} != {n_expected}"
        assert (mine["cnt"] == 5).all()
    # totals: every emitted window sums 5 consecutive (by replay order) values
    total_emitted = got["total"].sum()
    expected_total = sum(
        grp.sort_values(["ts", "event_id"])["value"].iloc[: (len(grp) // 5) * 5].sum()
        for _, grp in ev.groupby("user_id")
    )
    assert abs(total_emitted - expected_total) < 1e-6


def test_stream_windowed_join(spark, chunk_dir):
    """Windowed stream-stream join (JoinedStreams.java:128: same key,
    same tumbling window): equality on (key, window bucket)."""
    ev = sources.read_event_stream(spark, chunk_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("signup_id"), F.col("user_id").alias("u"),
                F.window("ts", "1 hour").alias("w"), F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "1 hour")
    )
    p = (
        ev.filter(F.col("event_type") == "view")
        .select(F.col("event_id").alias("view_id"), F.col("user_id").alias("u2"),
                F.window("ts", "1 hour").alias("w2"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = s.join(p, (s.u == p.u2) & (s.w == p.w2)).select("signup_id", "view_id")
    got = _run(joined.writeStream.format("memory"), "t_wjoin", spark, mode="append")

    bev = table(spark, SF_SMALL, "events")
    bs = bev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("user_id").alias("u"),
        F.window("ts", "1 hour").alias("w"),
    )
    bp = bev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("u2"),
        F.window("ts", "1 hour").alias("w2"),
    )
    expected = bs.join(bp, (bs.u == bp.u2) & (bs.w == bp.w2)).select(
        "signup_id", "view_id"
    ).toPandas()
    assert_frames_match(got, expected, name="stream_windowed_join")


def test_stream_interval_join(spark, chunk_dir):
    """Stream-stream interval join (purchases within 30min after signup)."""
    from flink_1_8_sourcecode_spark.operators.joins import interval_join

    ev = sources.read_event_stream(spark, chunk_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .select(F.col("event_id").alias("signup_id"), F.col("user_id").alias("u"),
                F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "1 hour")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), F.col("user_id").alias("u"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = interval_join(s, p, "u", "s_ts", "p_ts", "0 seconds", "30 minutes").select(
        "signup_id", "purchase_id"
    )
    got = _run(joined.writeStream.format("memory"), "t_ijoin", spark, mode="append")

    bev = table(spark, SF_SMALL, "events")
    bs = bev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("user_id").alias("u"), F.col("ts").alias("s_ts")
    )
    bp = bev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("u"), F.col("ts").alias("p_ts")
    )
    expected = (
        interval_join(bs, bp, "u", "s_ts", "p_ts", "0 seconds", "30 minutes")
        .select("signup_id", "purchase_id")
        .toPandas()
    )
    assert_frames_match(got, expected, name="stream_interval_join")


def test_event_time_sorted_emit(spark, chunk_dir):
    """RowTimeSort parity: rows come out in ascending event-time order
    (total order, single group) once the watermark passes them."""
    stream = sources.read_event_stream(spark, chunk_dir).select("event_id", "ts", "user_id")
    out = stateful.event_time_sorted_emit(
        stream, time_col="ts", watermark_delay="0 seconds", tiebreak="event_id"
    )
    got = _run(out.writeStream.format("memory"), "t_sorted", spark, mode="append")
    ev = table(spark, SF_SMALL, "events").toPandas().sort_values(["ts", "event_id"])
    # everything but the rows after the final watermark must flush, in order
    assert len(got) >= len(ev) * 0.9
    emitted = list(zip(got.ts, got.event_id))
    assert emitted == sorted(emitted)


def test_unbounded_stream_join_inner(spark, chunk_dir):
    """Non-window stream-stream inner join == batch join (unbounded
    state on both sides, like the reference's NonWindowInnerJoin)."""
    from flink_1_8_sourcecode_spark.operators.joins import unbounded_stream_join

    s1 = sources.read_event_stream(spark, chunk_dir).select("event_id", "user_id", "value")
    s2 = sources.read_event_stream(spark, chunk_dir).filter(
        F.col("event_type") == "purchase"
    ).select(F.col("user_id").alias("p_user"), F.col("event_id").alias("p_event"))
    joined = unbounded_stream_join(
        s1.withColumnRenamed("user_id", "u"), s2.withColumnRenamed("p_user", "u"), on="u"
    )
    # stream-stream joins emit in append mode only
    q = joined.writeStream.format("memory").queryName("t_unb_join").outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_unb_join").toPandas()
    ev = table(spark, SF_SMALL, "events")
    expected = (
        ev.select("event_id", F.col("user_id").alias("u"))
        .join(ev.filter(F.col("event_type") == "purchase").select(F.col("user_id").alias("u"), "ts"), "u")
        .groupBy("u").count().toPandas()
    )
    got_counts = got.groupby("u").size().to_dict()
    assert got_counts == dict(zip(expected.u, expected["count"]))

    import pytest as _pytest
    # outer flavors require event-time columns to bound null-padded emission
    with _pytest.raises(ValueError, match="event-time"):
        unbounded_stream_join(s1, s2, on="u", how="left")


def test_socket_source_reads_lines(spark):
    """socketTextStream parity (StreamExecutionEnvironment.java:1190)
    against a real localhost socket server."""
    import socket
    import threading
    import time

    from flink_1_8_sourcecode_spark.streaming import sources

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    try:
        srv.bind(("127.0.0.1", 0))
    except OSError:
        pytest.skip("sandbox forbids localhost sockets")
    port = srv.getsockname()[1]
    srv.listen(1)
    lines = [f"msg_{i}" for i in range(5)]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(("\n".join(lines) + "\n").encode())
        time.sleep(20)  # keep the connection open while the query drains
        conn.close()

    threading.Thread(target=serve, daemon=True).start()
    stream = sources.socket_stream(spark, "127.0.0.1", port)
    q = (
        stream.writeStream.format("memory").queryName("t_socket")
        .outputMode("append").start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("t_socket").count() >= len(lines):
                break
            time.sleep(0.5)
        got = [r.value for r in spark.table("t_socket").collect()]
    finally:
        q.stop()
        srv.close()
    assert sorted(got) == sorted(lines)


def test_queryable_state_live_point_lookup(spark, chunk_dir):
    """Queryable state parity (KeyedStream.asQueryableState +
    QueryableStateClient): a running aggregation's CURRENT state answers
    point lookups between micro-batches, and the final state equals the
    batch aggregate."""
    from flink_1_8_sourcecode_spark.streaming.sinks import queryable_state

    stream = sources.read_event_stream(spark, chunk_dir)
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total")
    )
    q = queryable_state(agg, "qstate").start()
    try:
        q.processAllAvailable()
        # the live point lookup: SELECT against the named state table
        mid = spark.sql(
            "SELECT cnt, total FROM qstate WHERE event_type = "
            "(SELECT min(event_type) FROM qstate)"
        ).collect()
        assert len(mid) == 1 and mid[0]["cnt"] > 0
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("qstate").toPandas().set_index("event_type")
    want = (
        table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total"))
        .toPandas()
        .set_index("event_type")
    )
    assert sorted(got.index) == sorted(want.index)
    for k in want.index:
        assert got.loc[k, "cnt"] == want.loc[k, "cnt"]
        assert abs(got.loc[k, "total"] - want.loc[k, "total"]) < 1e-6


def test_streaming_heavy_hitters_certifies_batch_set(spark, tmp_path):
    """The streaming MG summary's completeness contract: after the
    stream drains, every item whose TRUE count clears its bucket's
    certify threshold appears in the final snapshot, and lower_count
    never exceeds the true count (undercount bound <= bucket_seen/k)."""
    chunks = str(tmp_path / "hhchunks")
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=3)
    stream = sources.read_event_stream(spark, chunks)
    out = stateful.streaming_heavy_hitters(stream, "user_id", k_capacity=16)
    q = (out.writeStream.format("memory").queryName("t_hh")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import pandas as pd

    snap = spark.table("t_hh").toPandas()
    # update mode appends each batch's snapshot to the memory sink —
    # keep the LAST row per item (largest bucket_seen, then lower_count)
    snap = (snap.sort_values(["bucket_seen", "lower_count"])
            .groupby("item", as_index=False).tail(1))
    exact = (
        table(spark, SF_SMALL, "events")
        .groupBy(F.col("user_id").cast("string").alias("item"))
        .count()
        .toPandas()
    )
    truth = dict(zip(exact["item"], exact["count"]))
    got = dict(zip(snap["item"], snap["lower_count"]))
    seen = dict(zip(snap["item"], snap["bucket_seen"]))
    # lower bound never overshoots
    for item, lc in got.items():
        assert lc <= truth[item], (item, lc, truth[item])
    # completeness: anything above its bucket threshold is present
    for item, n in truth.items():
        # conservative global threshold: total events / k (any bucket's
        # local threshold is tighter)
        if n > sum(truth.values()) / 16:
            assert item in got, (item, n)


def test_streaming_lsh_dedup_matches_batch_reference(spark, tmp_path):
    """Replay documents in doc_id order; the online flag set must equal
    the batch rule 'shares >= 1 LSH band with a lower doc_id', and every
    dup_of must be the earliest owner of a shared band."""
    import os

    from flink_1_8_sourcecode_spark.operators.dedup import minhash_band_rows

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    # chunked replay in doc_id order (arrival order == id order)
    chunk_dir = str(tmp_path / "dchunks")
    os.makedirs(chunk_dir, exist_ok=True)
    pdf = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    n = len(pdf)
    for i in range(3):
        part = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        spark.createDataFrame(part).coalesce(1).write.mode("overwrite").parquet(
            f"{chunk_dir}/c{i}"
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{chunk_dir}/c*")
    )
    out = stateful.streaming_lsh_dedup(stream, "doc_id", "text")
    q = (out.writeStream.format("memory").queryName("t_lsh_dedup")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.table("t_lsh_dedup").groupBy("doc_id")
        .agg(F.min("dup_of").alias("dup_of")).toPandas()
    )
    got_map = dict(zip(got.doc_id, got.dup_of))

    # batch reference: owner(band) = min doc with that band; a doc is a
    # dup iff some of its bands has an owner below it
    bands = minhash_band_rows(docs, "doc_id", "text").toPandas()
    bands["bk"] = bands.band_id.astype(str) + "#" + bands.band_hash
    owner = bands.groupby("bk")["__id"].min()
    bands["owner"] = bands.bk.map(owner)
    dups = bands[bands.owner < bands.__id]
    want_map = dups.groupby("__id")["owner"].min().to_dict()
    assert got_map == want_map, (
        len(got_map), len(want_map),
        dict(list(got_map.items())[:3]), dict(list(want_map.items())[:3]),
    )
    # sanity: the corpus actually contains near-dups (non-vacuous test)
    assert len(want_map) > 0


class TestParquetUpsertMerger:
    """upsert_sink + parquet_upsert_merger (UpsertStreamTableSink.scala
    setKeyFields/emitDataStream): keyed MERGE into hash-bucketed
    parquet — last-write-wins per key, only touched buckets rewritten,
    batch retry idempotent by value."""

    def test_merge_semantics_and_bucket_scope(self, spark, tmp_path):
        import pathlib

        from flink_1_8_sourcecode_spark.streaming.sinks import (
            parquet_upsert_merger,
            read_upsert_table,
        )

        tbl = str(tmp_path / "upsert_tbl")
        merge = parquet_upsert_merger(["k"], tbl, num_buckets=8)
        merge(
            spark.createDataFrame(
                [(i, i * 10) for i in range(64)], "k int, v int"
            ),
            0,
        )
        listing = {
            d.name: sorted(p.name for p in d.iterdir()
                           if p.name.endswith(".parquet"))
            for d in pathlib.Path(tbl).iterdir()
            if d.name.startswith("__bucket=")
        }
        assert len(listing) > 1
        # batch 1: update one key, insert one new -> at most 2 buckets
        delta = spark.createDataFrame(
            [(7, 999), (100, 5)], "k int, v int"
        )
        merge(delta, 1)
        merge(delta, 1)  # foreachBatch retry: same final state
        after = {
            d.name: sorted(p.name for p in d.iterdir()
                           if p.name.endswith(".parquet"))
            for d in pathlib.Path(tbl).iterdir()
            if d.name.startswith("__bucket=")
        }
        changed = [b for b in listing if after.get(b) != listing[b]]
        assert len(changed) <= 2, f"rewrote untouched buckets: {changed}"
        got = {
            r.k: r.v for r in read_upsert_table(spark, tbl).collect()
        }
        want = {i: i * 10 for i in range(64)}
        want[7], want[100] = 999, 5
        assert got == want
