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


def test_windowed_join_matches_batch(spark, env, tmp_path):
    """DataStream.join(...).where(...).equal_to(...).window(...) ==
    the batch (key, window-bucket) equi-join (JoinedStreams.java:128)."""
    src = _event_stream(spark, tmp_path, "wjoin")
    s = DataStream(src).filter(F.col("event_type") == "signup").map(
        F.col("event_id").alias("signup_id"), F.col("user_id").alias("u"),
        F.col("ts").alias("s_ts"),
    )
    p = DataStream(src).filter(F.col("event_type") == "view").map(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("u2"),
        F.col("ts").alias("p_ts"),
    )
    joined = (
        s.join(p).where("u").equal_to("u2")
        .window("s_ts", "p_ts", "1 hour")
        .map("signup_id", "view_id")
    )
    q = joined.add_sink_memory("t_ds_wjoin")
    _drain(q)
    got = spark.table("t_ds_wjoin").toPandas()

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
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, expected.values.tolist())
    )


def test_windowed_join_validation(spark, env, tmp_path):
    src = _event_stream(spark, tmp_path, "wjoin_bad")
    a, b = DataStream(src), DataStream(src)
    with pytest.raises(ValueError, match="where"):
        a.join(b).window("ts", "ts", "1 hour")
    with pytest.raises(ValueError, match="disjoint"):
        a.join(b).where("user_id").equal_to("user_id").window("ts", "ts", "1 hour")


def test_interval_join_key_rename_and_validation(spark, env, tmp_path):
    # batch frames through the facade: positional key pairing renames
    # the right key to the left name
    import datetime as dt
    base = dt.datetime(2020, 1, 1)
    l = DataStream(spark.createDataFrame(
        [(1, base), (2, base)], "k int, lt timestamp"))
    r = DataStream(spark.createDataFrame(
        [(1, base + dt.timedelta(seconds=3)),
         (1, base + dt.timedelta(seconds=50)),
         (2, base + dt.timedelta(seconds=4))], "k2 int, rt timestamp"))
    out = (
        l.key_by("k").interval_join(r.key_by("k2"), "lt", "rt")
        .between("0 seconds", "5 seconds")
    )
    rows = sorted((x.k, x.rt) for x in out.df.collect())
    assert rows == [
        (1, base + dt.timedelta(seconds=3)),
        (2, base + dt.timedelta(seconds=4)),
    ]
    with pytest.raises(ValueError, match="arity"):
        l.key_by("k").interval_join(r.key_by("k2", "rt"), "lt", "rt")


def test_connect_broadcast_smoke(spark, env, tmp_path):
    """Broadcast state pattern through the facade: each micro-batch
    joins a fresh snapshot (side_outputs.broadcast_state_join)."""
    src = _event_stream(spark, tmp_path, "bcast")
    snap = spark.createDataFrame(
        [("signup", 1), ("view", 2), ("click", 3), ("purchase", 4),
         ("error", 5), ("noop", 0)],
        "event_type string, code int",
    )
    seen = []
    q = DataStream(src).connect_broadcast(
        lambda: snap, on="event_type", how="left",
        sink_fn=lambda df, bid: seen.append(df.filter("code IS NULL").count()),
    ).start()
    _drain(q)
    assert seen and sum(seen) == 0  # every event type resolved


def test_cogroup_batch_path_one_sided_groups(spark, env, tmp_path):
    """CoGroupedStreams (CoGroupedStreams.java:75) over batch inputs:
    native cogroup(applyInPandas), one-sided groups included."""
    import datetime as dt
    import pandas as pd

    base = dt.datetime(2020, 1, 1)
    l = DataStream(spark.createDataFrame(
        [(1, base, 10.0), (1, base, 20.0), (3, base, 5.0)],
        "k int, lt timestamp, lv double"))
    r = DataStream(spark.createDataFrame(
        [(1, base, 100.0), (2, base, 7.0)],
        "k2 int, rt timestamp, rv double"))

    def fn(lp, rp):
        k = int(lp["k"].iloc[0]) if len(lp) else int(rp["k2"].iloc[0])
        return pd.DataFrame({
            "k": [k],
            "lsum": [float(lp["lv"].sum()) if len(lp) else 0.0],
            "rsum": [float(rp["rv"].sum()) if len(rp) else 0.0],
        })

    out = (
        l.co_group(r).where("k").equal_to("k2")
        .window("lt", "rt", "1 day")
        .apply(fn, "k int, lsum double, rsum double")
    )
    assert not out.df.isStreaming
    rows = sorted((x.k, x.lsum, x.rsum) for x in out.df.collect())
    # k=1 both sides, k=2 right-only, k=3 left-only
    assert rows == [(1, 30.0, 100.0), (2, 0.0, 7.0), (3, 5.0, 0.0)]


def test_cogroup_stream_matches_batch(spark, env, tmp_path):
    """Streaming coGroup == the batch facade path on the same inputs,
    across multiple micro-batches (each group delivered exactly once)."""
    import pandas as pd

    def fn(lp, rp):
        ts = lp["s_ts"].iloc[0] if len(lp) else rp["p_ts"].iloc[0]
        uid = int(lp["u"].iloc[0]) if len(lp) else int(rp["u2"].iloc[0])
        return pd.DataFrame({
            "user_id": [uid],
            "w_start": [pd.Timestamp(ts).floor("D")],
            "sc": [len(lp)],
            "vc": [len(rp)],
        })

    schema = "user_id long, w_start timestamp, sc long, vc long"

    def build(src_ds):
        keep = F.col("user_id") < 0
        s = src_ds.filter((F.col("event_type") == "signup") | keep).map(
            F.col("user_id").alias("u"), F.col("ts").alias("s_ts"))
        v = src_ds.filter((F.col("event_type") == "view") | keep).map(
            F.col("user_id").alias("u2"), F.col("ts").alias("p_ts"))
        return (
            s.co_group(v).where("u").equal_to("u2")
            .window("s_ts", "p_ts", "1 day")
            .apply(fn, schema)
        )

    stream = build(DataStream(
        _event_stream(spark, tmp_path, "cg_sb", sentinel=True)))
    q = stream.add_sink_memory("t_ds_cg")
    _drain(q)
    got = spark.table("t_ds_cg").filter("user_id >= 0").toPandas()

    batch = build(DataStream(table(spark, SF_SMALL, "events"))).df
    expected = batch.filter("user_id >= 0").toPandas()
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, expected.values.tolist())
    )


def test_cogroup_null_key_groups_pair(spark, env, tmp_path):
    """NULL grouping keys: batch cogroup pairs the two NULL-key groups
    into ONE fn call, so the streaming lowering must too (null-safe
    join equality) — pinned stream==batch on a null-key input."""
    import datetime as dt
    import pandas as pd

    base = dt.datetime(2024, 1, 1)
    far = base + dt.timedelta(days=40)
    lrows = [(None, base, 1.0), (1, base, 2.0), (-9, far, 0.0)]
    rrows = [(None, base, 10.0), (2, base, 20.0), (-9, far, 0.0)]
    d = str(tmp_path / "nk")
    spark.createDataFrame(lrows, "k int, lt timestamp, lv double").coalesce(
        1).write.parquet(d + "/l")
    spark.createDataFrame(rrows, "k2 int, rt timestamp, rv double").coalesce(
        1).write.parquet(d + "/r")

    def fn(lp, rp):
        k = lp["k"].iloc[0] if len(lp) else rp["k2"].iloc[0]
        return pd.DataFrame({
            "k": [None if pd.isna(k) else int(k)],
            "ln": [len(lp)], "rn": [len(rp)],
        })

    def build(l, r):
        return (
            l.co_group(r).where("k").equal_to("k2")
            .window("lt", "rt", "1 day").apply(fn, "k int, ln long, rn long")
        )

    ls = spark.readStream.schema("k int, lt timestamp, lv double").parquet(d + "/l")
    rs = spark.readStream.schema("k2 int, rt timestamp, rv double").parquet(d + "/r")
    q = build(DataStream(ls), DataStream(rs)).add_sink_memory("t_cg_nk")
    _drain(q)
    got = sorted(
        ((r.k, r.ln, r.rn) for r in spark.table("t_cg_nk").collect()
         if r.k != -9),
        key=str,
    )
    lb = DataStream(spark.createDataFrame(lrows[:2], "k int, lt timestamp, lv double"))
    rb = DataStream(spark.createDataFrame(rrows[:2], "k2 int, rt timestamp, rv double"))
    expected = sorted(
        ((r.k, r.ln, r.rn) for r in build(lb, rb).df.collect()), key=str
    )
    assert got == expected == [(1, 1, 0), (2, 0, 1), (None, 1, 1)]


def test_cogroup_validation(spark, env, tmp_path):
    a = DataStream(spark.range(3).withColumn("ts", F.current_timestamp()))
    with pytest.raises(ValueError, match="where"):
        a.co_group(a).window("ts", "ts", "1 hour")
    with pytest.raises(ValueError, match="where"):
        a.co_group(a).where("id").window("ts", "ts", "1 hour")
    with pytest.raises(ValueError, match="contract"):
        (
            a.co_group(a).where("id").equal_to("id")
            .window("ts", "ts", "1 hour")
            .apply(lambda lp, rp: None, "x int", contract="numpy")
        )


def test_cogroup_arrow_contract_matches_pandas(spark, env, tmp_path):
    """Opt-in Arrow-native CoGroupFunction contract (r14 verdict task
    8): fn receives zero-copy pyarrow.Table slices and returns a
    pyarrow.Table; results must equal the pandas contract bit-for-bit
    on both the streaming AND the batch path."""
    import pandas as pd
    import pyarrow as pa

    schema = "user_id long, w_start timestamp, sc long, vc long"

    def pandas_fn(lp, rp):
        ts = lp["s_ts"].iloc[0] if len(lp) else rp["p_ts"].iloc[0]
        uid = int(lp["u"].iloc[0]) if len(lp) else int(rp["u2"].iloc[0])
        return pd.DataFrame({
            "user_id": [uid],
            "w_start": [pd.Timestamp(ts).floor("D")],
            "sc": [len(lp)],
            "vc": [len(rp)],
        })

    def arrow_fn(lt: "pa.Table", rt: "pa.Table") -> "pa.Table":
        if len(lt):
            ts = lt.column("s_ts")[0].as_py()
            uid = lt.column("u")[0].as_py()
        else:
            ts = rt.column("p_ts")[0].as_py()
            uid = rt.column("u2")[0].as_py()
        w = pd.Timestamp(ts).floor("D").to_pydatetime()
        return pa.table({
            "user_id": pa.array([uid], pa.int64()),
            "w_start": pa.array([w], pa.timestamp("us")),
            "sc": pa.array([len(lt)], pa.int64()),
            "vc": pa.array([len(rt)], pa.int64()),
        })

    def build(src_ds, fn, contract):
        keep = F.col("user_id") < 0
        s = src_ds.filter((F.col("event_type") == "signup") | keep).map(
            F.col("user_id").alias("u"), F.col("ts").alias("s_ts"))
        v = src_ds.filter((F.col("event_type") == "view") | keep).map(
            F.col("user_id").alias("u2"), F.col("ts").alias("p_ts"))
        return (
            s.co_group(v).where("u").equal_to("u2")
            .window("s_ts", "p_ts", "1 day")
            .apply(fn, schema, contract=contract)
        )

    # streaming: arrow contract
    stream = build(
        DataStream(_event_stream(spark, tmp_path, "cg_ar", sentinel=True)),
        arrow_fn, "arrow",
    )
    q = stream.add_sink_memory("t_ds_cg_arrow")
    _drain(q)
    got = spark.table("t_ds_cg_arrow").filter("user_id >= 0").toPandas()

    # batch reference: pandas contract
    expected = (
        build(DataStream(table(spark, SF_SMALL, "events")),
              pandas_fn, "pandas")
        .df.filter("user_id >= 0").toPandas()
    )
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, expected.values.tolist())
    )

    # batch path: arrow contract adapts over the pandas transport
    batch_arrow = (
        build(DataStream(table(spark, SF_SMALL, "events")),
              arrow_fn, "arrow")
        .df.filter("user_id >= 0").toPandas()
    )
    assert sorted(map(tuple, batch_arrow.values.tolist())) == sorted(
        map(tuple, expected.values.tolist())
    )


class TestAsyncDataStream:
    """AsyncDataStream.unorderedWait/orderedWait
    (flink-streaming-java/.../datastream/AsyncDataStream.java:102,147)
    — async per-record enrichment with bounded in-flight capacity;
    mapInPandas + one asyncio loop per batch."""

    def _src(self, spark, n=40):
        from flink_1_8_sourcecode_spark.datastream_api import DataStream

        return DataStream(
            spark.range(n).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ).coalesce(2)
        )

    def test_ordered_wait_preserves_order_and_enriches(self, spark):
        import asyncio

        from flink_1_8_sourcecode_spark.datastream_api import AsyncDataStream

        async def lookup(row):
            # jittered completion: later rows may finish first
            await asyncio.sleep(0.001 * (row["k"] % 3))
            return {"k": row["k"], "enriched": row["v"] + 100}

        out = AsyncDataStream.ordered_wait(
            self._src(spark), lookup, "k long, enriched long",
            timeout_s=5.0, capacity=16,
        )
        rows = out.df.collect()
        assert {(r.k, r.enriched) for r in rows} == {
            (i, 2 * i + 100) for i in range(40)
        }
        # per-partition input order preserved (ordered emitter queue)
        part = out.df.withColumn("__p", F.spark_partition_id()).collect()
        by_part = {}
        for r in part:
            by_part.setdefault(r["__p"], []).append(r["k"])
        for ks in by_part.values():
            assert ks == sorted(ks)

    def test_unordered_wait_completes_all(self, spark):
        import asyncio

        from flink_1_8_sourcecode_spark.datastream_api import AsyncDataStream

        async def lookup(row):
            await asyncio.sleep(0)
            if row["k"] % 10 == 0:
                return None  # complete-with-empty drops the record
            if row["k"] % 10 == 1:
                return [  # collection result fans out
                    {"k": row["k"], "enriched": row["v"]},
                    {"k": row["k"], "enriched": row["v"] + 1},
                ]
            return {"k": row["k"], "enriched": row["v"]}

        out = AsyncDataStream.unordered_wait(
            self._src(spark), lookup, "k long, enriched long",
            timeout_s=5.0, capacity=8,
        )
        got = out.df.groupBy().count().collect()[0]["count"]
        # 40 rows: 4 dropped (k%10==0), 4 doubled (k%10==1)
        assert got == 40 - 4 + 4

    def test_capacity_bounds_concurrency_and_speeds_up(self, spark):
        # 20 rows x 0.05s sleep on one partition: serial would be 1s;
        # capacity=20 must finish the partition in ~one round-trip
        import asyncio
        import time

        from flink_1_8_sourcecode_spark.datastream_api import (
            AsyncDataStream,
            DataStream,
        )

        src = DataStream(spark.range(20).coalesce(1).selectExpr(
            "id as k", "id as v"))

        async def slow(row):
            await asyncio.sleep(0.05)
            return {"k": row["k"]}

        t0 = time.perf_counter()
        n = AsyncDataStream.unordered_wait(
            src, slow, "k long", timeout_s=5.0, capacity=20
        ).df.count()
        wall = time.perf_counter() - t0
        assert n == 20
        assert wall < 0.8, f"async requests did not overlap ({wall:.2f}s)"

    def test_timeout_fail_and_drop(self, spark):
        import asyncio

        from flink_1_8_sourcecode_spark.datastream_api import (
            AsyncDataStream,
            DataStream,
        )

        src = DataStream(spark.range(3).selectExpr("id as k", "id as v"))

        async def hang(row):
            if row["k"] == 1:
                await asyncio.sleep(10)
            return {"k": row["k"]}

        dropped = AsyncDataStream.unordered_wait(
            src, hang, "k long", timeout_s=0.3, capacity=4,
            on_timeout="drop",
        ).df.collect()
        assert sorted(r.k for r in dropped) == [0, 2]

        import py4j.protocol
        with pytest.raises(Exception, match="timed out|PythonException"):
            AsyncDataStream.unordered_wait(
                src, hang, "k long", timeout_s=0.3, capacity=4,
            ).df.collect()

    def test_timeout_covers_queue_wait(self, spark):
        # Reference semantics (AsyncWaitOperator): the async-wait
        # timer starts when the element ENTERS the operator queue —
        # so time spent queued behind the capacity limit counts.
        # capacity=1 serializes 0.5s requests with a 0.75s timeout:
        # row 0 runs immediately (0.5 < 0.75); every later row is
        # still queued or mid-flight at t=0.75 and must time out.
        # (Pre-fix, the timer started after the semaphore was
        # acquired, so ALL rows completed.)
        import asyncio

        from flink_1_8_sourcecode_spark.datastream_api import (
            AsyncDataStream,
            DataStream,
        )

        src = DataStream(
            spark.range(4).coalesce(1).selectExpr("id as k", "id as v")
        )

        async def slow(row):
            await asyncio.sleep(0.5)
            return {"k": row["k"]}

        out = AsyncDataStream.ordered_wait(
            src, slow, "k long", timeout_s=0.75, capacity=1,
            on_timeout="drop",
        ).df.collect()
        assert [r.k for r in out] == [0]

    def test_param_guards(self, spark):
        from flink_1_8_sourcecode_spark.datastream_api import AsyncDataStream

        with pytest.raises(ValueError, match="capacity"):
            AsyncDataStream.unordered_wait(
                self._src(spark), None, "k long", timeout_s=1.0, capacity=0
            )
        with pytest.raises(ValueError, match="on_timeout"):
            AsyncDataStream.ordered_wait(
                self._src(spark), None, "k long", timeout_s=1.0,
                on_timeout="retry",
            )


def test_cogroup_columns_only_matches_default(spark, env, tmp_path):
    """columns_only=True (r17): same CoGroupFunction, same results as
    the default pandas contract — the flag only changes how groups are
    delivered (Series-slice views vs per-group DataFrame slices)."""
    import pandas as pd

    def fn(lp, rp):
        ts = lp["s_ts"].iloc[0] if len(lp) else rp["p_ts"].iloc[0]
        uid = int(lp["u"].iloc[0]) if len(lp) else int(rp["u2"].iloc[0])
        return pd.DataFrame({
            "user_id": [uid],
            "w_start": [pd.Timestamp(ts).floor("D")],
            "sc": [len(lp)],
            "vc": [len(rp)],
        })

    schema = "user_id long, w_start timestamp, sc long, vc long"

    def build(src_ds, **kw):
        keep = F.col("user_id") < 0
        s = src_ds.filter((F.col("event_type") == "signup") | keep).map(
            F.col("user_id").alias("u"), F.col("ts").alias("s_ts"))
        v = src_ds.filter((F.col("event_type") == "view") | keep).map(
            F.col("user_id").alias("u2"), F.col("ts").alias("p_ts"))
        return (
            s.co_group(v).where("u").equal_to("u2")
            .window("s_ts", "p_ts", "1 day")
            .apply(fn, schema, **kw)
        )

    stream = build(DataStream(
        _event_stream(spark, tmp_path, "cg_co", sentinel=True)),
        columns_only=True)
    q = stream.add_sink_memory("t_ds_cg_co")
    _drain(q)
    got = spark.table("t_ds_cg_co").filter("user_id >= 0").toPandas()

    batch = build(DataStream(table(spark, SF_SMALL, "events"))).df
    expected = batch.filter("user_id >= 0").toPandas()
    assert sorted(map(tuple, got.values.tolist())) == sorted(
        map(tuple, expected.values.tolist())
    )
