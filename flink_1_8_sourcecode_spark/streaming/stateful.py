"""Custom stateful streaming operators over applyInPandasWithState.

Reference parity:
- KeyedProcessFunction + keyed state + timers
  (flink-streaming-java/.../functions/ProcessFunction.java:51,
  flink-core/.../api/common/state/) -> ``keyed_process`` wraps
  applyInPandasWithState: GroupState holds the user state tuple, state
  timeouts stand in for timers, watermark for event-time progress.
- Count windows (KeyedStream.countWindow, KeyedStream.java:642; Flink has
  no SQL/Table form) -> ``count_window_agg``: per-key element counter in
  state, emits one row per full window of N elements.

Scale notes: state is per-key and partitioned by the groupBy key — the
same sharding as Flink's keyed state backend; Arrow batches move groups
into pandas.  State stays small (counters/ring buffers), never whole
groups.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def keyed_process(
    df: DataFrame,
    keys: list[str],
    func: Callable[[Any, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]],
    output_schema: str,
    state_schema: str,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """ProcessFunction-grade escape hatch: user func sees (key, batches,
    state) exactly like applyInPandasWithState, with Flink-style timeout
    names ('NoTimeout' | 'ProcessingTimeTimeout' | 'EventTimeTimeout')."""
    tmo = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
    }[timeout]
    return df.groupBy(*keys).applyInPandasWithState(
        func, output_schema, state_schema, "update", tmo
    )


def event_time_running_agg(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    watermark_delay: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming unbounded-preceding OVER on event time — Flink's
    RowTimeUnboundedOver (flink-table/.../runtime/aggregate/
    RowTimeUnboundedOver.scala): one output row per input row carrying
    the running sum/count over all earlier events of the key.

    Out-of-order arrivals are buffered in state; rows are emitted in
    event-time order once the watermark passes them (same firing rule as
    the reference's over-window state cleanup).  Emits append-mode rows
    (key, time, tiebreak?, value, running_sum, running_cnt).
    """
    import pickle

    src = df.withWatermark(time_col, watermark_delay)
    key_t = src.schema[key].dataType.simpleString()
    tb = [tiebreak] if tiebreak else []
    tb_schema = f", {tiebreak} {src.schema[tiebreak].dataType.simpleString()}" if tiebreak else ""
    out_schema = (
        f"{key} {key_t}, {time_col} timestamp{tb_schema}, "
        f"{value_col} double, running_sum double, running_cnt long"
    )

    def fn(key_tuple, batches, state: GroupState):
        if state.exists:
            blob, total, cnt = state.get
            pending: list[dict] = pickle.loads(bytes(blob))
        else:
            pending, total, cnt = [], 0.0, 0
        for pdf in batches:
            pending.extend(pdf.to_dict("records"))
        wm = state.getCurrentWatermarkMs() / 1000.0

        def ts_sec(r) -> float:
            return pd.Timestamp(r[time_col]).value / 1e9

        pending.sort(key=lambda r: (ts_sec(r), r.get(tiebreak) if tiebreak else 0))
        out, keep = [], []
        for r in pending:
            if ts_sec(r) <= wm:
                total += float(r[value_col])
                cnt += 1
                rec = {
                    key: key_tuple[0],
                    time_col: r[time_col],
                    value_col: float(r[value_col]),
                    "running_sum": total,
                    "running_cnt": cnt,
                }
                if tiebreak:
                    rec[tiebreak] = r[tiebreak]
                out.append(rec)
            else:
                keep.append(r)
        state.update((pickle.dumps(keep), total, cnt))
        if keep:
            # Re-arm an event-time timer at the earliest pending row so the
            # group is re-invoked when the watermark passes it — without
            # this, a group that stops receiving data never flushes
            # (Flink's over-window registers the same cleanup timer).
            state.setTimeoutTimestamp(int(ts_sec(keep[0]) * 1000) + 1)
        if out:
            cols = [key, time_col, *tb, value_col, "running_sum", "running_cnt"]
            yield pd.DataFrame(out, columns=cols)

    return src.groupBy(key).applyInPandasWithState(
        fn, out_schema, "buf binary, total double, cnt long", "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def count_window_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    window_size: int,
) -> DataFrame:
    """Per-key tumbling COUNT window (KeyedStream.countWindow(n)):
    emits (key, window_seq, cnt, total) for every N-th element.

    State = (elements_in_current_window, running_sum, windows_emitted);
    carry-over partial windows stay in state until filled — identical to
    Flink's count-trigger semantics (CountTrigger.java).
    """

    # derive the key column's name/type from the input so string or
    # otherwise-typed keys keep their schema (not a hardcoded 'key long')
    key_field = df.schema[key]
    key_name, key_ddl = key_field.name, key_field.dataType.simpleString()

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            cnt, total, emitted = state.get
        else:
            cnt, total, emitted = 0, 0.0, 0
        out_rows = []
        for pdf in batches:
            for v in pdf[value_col]:
                cnt += 1
                total += float(v)
                if cnt == window_size:
                    out_rows.append(
                        {
                            key_name: key_tuple[0],
                            "window_seq": emitted,
                            "cnt": cnt,
                            "total": total,
                        }
                    )
                    emitted += 1
                    cnt, total = 0, 0.0
        state.update((cnt, total, emitted))
        if out_rows:
            yield pd.DataFrame(out_rows)

    return df.groupBy(key).applyInPandasWithState(
        fn,
        f"{key_name} {key_ddl}, window_seq int, cnt int, total double",
        "cnt int, total double, emitted int",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def event_time_sorted_emit(
    df: DataFrame,
    time_col: str,
    watermark_delay: str,
    key: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming event-time sort — Flink's RowTimeSortOperator
    (flink-table/.../runtime/aggregate/RowTimeSortProcessFunction.scala):
    buffer out-of-order rows, emit them in ascending event-time order
    once the watermark passes them.

    ``key=None`` gives the reference's total order (parallelism-1 sort:
    one group, a deliberate single-task bottleneck, exactly as Flink's
    streaming SQL ORDER BY ts requires); with a key, rows are ordered
    per key but parallel across keys.  Output schema = input schema.
    """
    import pickle

    src = df.withWatermark(time_col, watermark_delay)
    if key is None:
        # total order: one group (the reference's parallelism-1 sort)
        src = src.withColumn("__g", F.lit(1))
        group = ["__g"]
    else:
        group = [key]
    cols = df.columns
    out_schema = ", ".join(f"{c} {src.schema[c].dataType.simpleString()}" for c in cols)

    def fn(key_tuple, batches, state: GroupState):
        pending: list = pickle.loads(bytes(state.get[0])) if state.exists else []

        def ts_sec(r) -> float:
            return pd.Timestamp(r[time_col]).value / 1e9

        for pdf in batches:
            pending.extend(pdf[cols].to_dict("records"))
        wm = state.getCurrentWatermarkMs() / 1000.0
        pending.sort(key=lambda r: (ts_sec(r), r.get(tiebreak) if tiebreak else 0))
        ready = [r for r in pending if ts_sec(r) <= wm]
        keep = [r for r in pending if ts_sec(r) > wm]
        state.update((pickle.dumps(keep),))
        if keep:
            state.setTimeoutTimestamp(
                max(int(ts_sec(keep[0]) * 1000) + 1, state.getCurrentWatermarkMs() + 1)
            )
        if ready:
            yield pd.DataFrame(ready, columns=cols)

    grouped = src.groupBy(*group)
    return grouped.applyInPandasWithState(
        fn, out_schema, "buf binary", "append", GroupStateTimeout.EventTimeTimeout
    )
