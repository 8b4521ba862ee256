"""Side outputs, two-input operators, broadcast state, async I/O —
the §2.13 control-flow operators Spark doesn't name directly.

Reference parity:
- OutputTag side outputs (flink-core/.../util/OutputTag.java;
  ProcessFunction.java:70) -> tagged filter fan-out (``split``) or a
  single-pass multi-write per micro-batch (``foreach_batch_fanout``).
- connect + CoProcessFunction (DataStream.java:254; CoProcessFunction.java)
  -> union of tagged, schema-aligned streams into one keyed stateful op
  (``connect_tagged``).
- Broadcast state pattern (DataStream.java:427,
  KeyedBroadcastProcessFunction) -> per-micro-batch broadcast join
  against a re-evaluated snapshot (``broadcast_state_join``).
- Async I/O (AsyncDataStream.java:102,147) -> concurrent requests inside
  an Arrow batch (``async_map`` — unordered-wait semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split(df: DataFrame, outputs: dict[str, Column]) -> dict[str, DataFrame]:
    """OutputTag fan-out as filtered views. Tags need not be disjoint
    (Flink allows multi-tag emission). Works on batch and streaming
    frames; each sink re-reads the source unless fanned out via
    ``foreach_batch_fanout``."""
    return {tag: df.filter(cond) for tag, cond in outputs.items()}


def foreach_batch_fanout(
    df: DataFrame,
    routes: dict[str, tuple[Column, str]],
    fmt: str = "parquet",
    checkpoint: str | None = None,
):
    """Single-pass multi-sink: per micro-batch, persist once and write
    every tagged subset — the scalable form of side outputs (one source
    scan per batch, N writes)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            for _tag, (cond, path) in routes.items():
                batch.filter(cond).write.format(fmt).mode("append").save(path)
        finally:
            batch.unpersist()

    w = df.writeStream.foreachBatch(write_batch)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def connect_tagged(
    left: DataFrame,
    right: DataFrame,
    key: str,
    payload_cols: dict[str, tuple[str | None, str | None]],
) -> DataFrame:
    """connect(): merge two inputs into one keyed stream with an
    ``__input`` tag (1/2) and a unified schema; feed the result to
    stateful.keyed_process for CoProcessFunction semantics.

    payload_cols maps output column -> (left source col | None,
    right source col | None); missing sides are NULL-padded.
    """

    def side(df: DataFrame, tag: int, idx: int) -> DataFrame:
        cols = [F.col(key), F.lit(tag).alias("__input")]
        for out, pair in payload_cols.items():
            lc, rc = pair
            ttype = (
                left.schema[lc] if lc is not None else right.schema[rc]
            ).dataType.simpleString()
            src = pair[idx]
            expr = df[src] if src is not None else F.lit(None)
            cols.append(expr.cast(ttype).alias(out))
        return df.select(*cols)

    return side(left, 1, 0).unionByName(side(right, 2, 1))


def broadcast_state_join(
    stream: DataFrame,
    snapshot_fn: Callable[[], DataFrame],
    on: str | list[str],
    how: str = "left",
    checkpoint: str | None = None,
    sink_fn: Callable[[DataFrame, int], None] | None = None,
):
    """Broadcast state pattern: each micro-batch joins against a FRESH
    snapshot of a slowly-changing side (re-evaluated and re-broadcast per
    batch — the Spark idiom for Flink's broadcast state)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        joined = batch.join(F.broadcast(snapshot_fn()), on, how)
        if sink_fn is not None:
            sink_fn(joined, batch_id)

    w = stream.writeStream.foreachBatch(process)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def late_data_side_channel(
    df: DataFrame,
    time_col: str,
    delay,
    main_fn: Callable[[DataFrame, int], None],
    late_fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
):
    """allowedLateness + sideOutputLateData emulation
    (WindowedStream.allowedLateness:158 / sideOutputLateData:177).

    Structured Streaming silently drops rows behind the watermark inside
    stateful ops; this collector tracks the watermark equivalent
    (max event time seen - delay) across micro-batches in the foreachBatch
    closure and routes would-be-late rows to ``late_fn`` while on-time
    rows go to ``main_fn``.  The caller applies its windowed aggregation
    inside ``main_fn`` (per-batch) or downstream of the main sink.

    The high-watermark is persisted beside the checkpoint location
    (``<checkpoint>/_late_wm.json``) so a query restarted from its
    checkpoint resumes with the prior watermark instead of silently
    routing genuinely-late rows to ``main_fn``.  Without a checkpoint
    the watermark is in-memory only (documented restart limitation;
    requires a driver-visible filesystem path).
    """
    import datetime as _dt
    import json as _json
    import os as _os

    from pyspark.sql import functions as _F

    if isinstance(delay, str):
        n, unit = delay.split()
        seconds = float(n) * {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                              "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
    else:
        seconds = float(delay)
    wm_path = _os.path.join(checkpoint, "_late_wm.json") if checkpoint else None
    hwm: dict[str, _dt.datetime] = {}
    if wm_path and _os.path.exists(wm_path):
        try:
            with open(wm_path) as f:
                hwm["wm"] = _dt.datetime.fromisoformat(_json.load(f)["wm"])
        except (OSError, ValueError, KeyError) as exc:
            # a corrupt/unreadable watermark file degrades to a cold
            # start (late rows may route to main once) — say so rather
            # than silently losing the recovery guarantee
            import logging

            logging.getLogger(__name__).warning(
                "could not restore late-watermark from %s (%s); starting cold",
                wm_path, exc,
            )

    def _persist_wm(wm: _dt.datetime) -> None:
        if wm_path is None:
            return
        _os.makedirs(_os.path.dirname(wm_path), exist_ok=True)
        tmp = wm_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"wm": wm.isoformat()}, f)
        _os.replace(tmp, wm_path)

    def route(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            cutoff = hwm.get("wm")
            if cutoff is not None:
                late = batch.filter(_F.col(time_col) < _F.lit(cutoff))
                on_time = batch.filter(_F.col(time_col) >= _F.lit(cutoff))
            else:
                late = batch.limit(0)
                on_time = batch
            late_fn(late, batch_id)
            main_fn(on_time, batch_id)
            mx = batch.agg(_F.max(time_col)).first()[0]
            if mx is not None:
                new_wm = mx - _dt.timedelta(seconds=seconds)
                if cutoff is None or new_wm > cutoff:
                    hwm["wm"] = new_wm
                    _persist_wm(new_wm)
        finally:
            batch.unpersist()

    w = df.writeStream.foreachBatch(route)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w


def async_map(
    df: DataFrame,
    fn: Callable[[dict], dict],
    output_schema: str,
    concurrency: int = 16,
) -> DataFrame:
    """AsyncDataStream.unorderedWait analogue: apply a (blocking) per-row
    callable with ``concurrency`` in-flight requests per Arrow batch.
    Row order within a batch is preserved in the output (results are
    gathered positionally), matching orderedWait; throughput matches
    unorderedWait because requests overlap."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            for pdf in batches:
                rows = pdf.to_dict("records")
                results = list(pool.map(fn, rows))
                yield pd.DataFrame(results)

    return df.mapInPandas(run, output_schema)


def punctuated_watermark_channel(
    df: DataFrame,
    time_col: str,
    marker_pred,
    marker_wm_col,
    main_fn: Callable[[DataFrame, int], None],
    late_fn: Callable[[DataFrame, int], None],
    checkpoint: str | None = None,
):
    """Punctuated watermarks (AssignerWithPunctuatedWatermarks,
    DataStream.java:926): the watermark advances ONLY when designated
    marker rows appear in the stream — ``marker_pred`` (Column) selects
    them, ``marker_wm_col`` (Column) reads the watermark they carry.

    Structured Streaming's withWatermark is strictly bounded-delay, so
    the punctuated contract runs in the foreachBatch collector exactly
    like late_data_side_channel: marker rows advance the high-watermark
    (persisted beside the checkpoint), data rows behind it route to
    ``late_fn``, the rest to ``main_fn``.  Markers are not forwarded.
    """
    import datetime as _dt
    import json as _json
    import os as _os

    from pyspark.sql import functions as _F

    wm_path = _os.path.join(checkpoint, "_punct_wm.json") if checkpoint else None
    hwm: dict[str, _dt.datetime] = {}
    if wm_path and _os.path.exists(wm_path):
        try:
            with open(wm_path) as f:
                hwm["wm"] = _dt.datetime.fromisoformat(_json.load(f)["wm"])
        except (OSError, ValueError, KeyError) as exc:
            # a corrupt/unreadable watermark file degrades to a cold
            # start (late rows may route to main once) — say so rather
            # than silently losing the recovery guarantee
            import logging

            logging.getLogger(__name__).warning(
                "could not restore late-watermark from %s (%s); starting cold",
                wm_path, exc,
            )

    def _persist(wm: _dt.datetime) -> None:
        if wm_path is None:
            return
        _os.makedirs(_os.path.dirname(wm_path), exist_ok=True)
        tmp = wm_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"wm": wm.isoformat()}, f)
        _os.replace(tmp, wm_path)

    def route(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            cutoff = hwm.get("wm")
            data = batch.filter(~marker_pred)
            if cutoff is not None:
                late_fn(data.filter(_F.col(time_col) < _F.lit(cutoff)), batch_id)
                main_fn(data.filter(_F.col(time_col) >= _F.lit(cutoff)), batch_id)
            else:
                late_fn(data.limit(0), batch_id)
                main_fn(data, batch_id)
            mx = batch.filter(marker_pred).agg(_F.max(marker_wm_col)).first()[0]
            if mx is not None and (cutoff is None or mx > cutoff):
                hwm["wm"] = mx
                _persist(mx)
        finally:
            batch.unpersist()

    w = df.writeStream.foreachBatch(route)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w
