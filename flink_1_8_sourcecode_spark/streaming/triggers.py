"""Window triggers — early-firing emulation of the reference's trigger
surface (flink-streaming-java/.../windowing/triggers/CountTrigger.java,
ContinuousEventTimeTrigger.java, PurgingTrigger.java).

Structured Streaming's windowed aggregation fires once per micro-batch
with no user trigger hook, so custom triggers run in the stateful layer
(applyInPandasWithState): per key, open tumbling windows live in state;
trigger conditions emit EARLY partial rows (is_final=false); the global
watermark passing a window's end emits the final row (is_final=true)
and purges — the classic assign -> state -> trigger -> emit loop of
WindowOperator.java:294.  Event-time timeouts flush windows of keys
that receive no further data, exactly like Flink's event-time timers.

Scale notes: state per key holds only open-window accumulators
(cnt/total/fire-cursor), never buffered rows; keys shard across
executors via the groupBy shuffle exactly like Flink's keyed windows.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def triggered_tumble_agg(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    window_seconds: float,
    trigger: tuple[str, float],
    watermark_delay: str = "0 seconds",
    purging: bool = False,
    delta_fn=None,
) -> DataFrame:
    """Tumbling event-time sum/count windows with an early-firing trigger.

    ``trigger``:
    - ``("count", n)`` — CountTrigger.java: FIRE every n elements of a
      window (counted from the last firing).
    - ``("continuous", interval)`` — ContinuousEventTimeTrigger.java:
      FIRE whenever the watermark passes the next epoch-aligned
      ``interval`` boundary inside the window.
    - ``("delta", threshold)`` — DeltaTrigger.java: the window state
      keeps the element that last fired (seeded with the first
      element); FIRE when ``delta_fn(last, current) > threshold``, then
      the current element becomes the new comparison point — exactly
      the reference's onElement/ValueState<T> loop.

    ``purging=True`` wraps the trigger PurgingTrigger-style: early
    firings reset the accumulator (FIRE_AND_PURGE), so each firing
    reports only the delta since the previous one.  The final firing at
    watermark passage always purges the window.

    Output: ``(key, w_start timestamp, cnt, total, is_final)``; rows
    behind the watermark for an already-purged window are dropped
    (Flink default without allowed lateness).
    """
    kind, param = trigger
    if kind not in ("count", "continuous", "delta"):
        raise ValueError(f"unknown trigger {kind!r}")
    if delta_fn is None:
        # the reference ships DeltaFunction as user code; the default
        # mirrors its euclidean example on the aggregated value column
        delta_fn = lambda last, cur: abs(cur - last)  # noqa: E731
    key_field = df.schema[key]
    key_name, key_ddl = key_field.name, key_field.dataType.simpleString()
    out_schema = (
        f"{key_name} {key_ddl}, w_start timestamp, cnt long, total double, is_final boolean"
    )

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        st = pickle.loads(state.get[0]) if state.exists else {"wins": {}}
        wins: dict[float, list] = st["wins"]
        wm = state.getCurrentWatermarkMs() / 1000.0  # global event-time watermark
        out = []

        def emit(ws: float, acc: list, final: bool) -> None:
            out.append(
                {
                    key_name: key_tuple[0],
                    "w_start": pd.Timestamp(ws, unit="s"),
                    "cnt": int(acc[0]),
                    "total": float(acc[1]),
                    "is_final": final,
                }
            )
            if not final and purging:
                acc[0], acc[1] = 0, 0.0

        for pdf in batches:
            ts = pdf[time_col].astype("datetime64[us]").astype("int64") / 1e6
            vals = pdf[value_col].astype(float)
            for t, v in sorted(zip(ts, vals)):
                ws = t - (t % window_seconds)
                if ws + window_seconds <= wm:
                    continue  # behind the watermark: window already purged
                if ws not in wins:
                    # [cnt, total, cursor]: since_fire count, next
                    # epoch-aligned boundary, or last-fired element value
                    if kind == "count":
                        cursor = 0
                    elif kind == "continuous":
                        cursor = t - (t % param) + param
                    else:
                        cursor = None  # DeltaTrigger's empty ValueState
                    wins[ws] = [0, 0.0, cursor]
                acc = wins[ws]
                acc[0] += 1
                acc[1] += float(v)
                if kind == "count":
                    acc[2] += 1
                    if acc[2] >= param:
                        emit(ws, acc, final=False)
                        acc[2] = 0
                elif kind == "delta":
                    if acc[2] is None:
                        acc[2] = float(v)
                    elif delta_fn(acc[2], float(v)) > param:
                        emit(ws, acc, final=False)
                        acc[2] = float(v)

        for ws in sorted(wins):
            acc = wins[ws]
            if kind == "continuous":
                # fire at every passed epoch-aligned boundary in the window
                while acc[2] <= wm and acc[2] < ws + window_seconds:
                    emit(ws, acc, final=False)
                    acc[2] += param
            if ws + window_seconds <= wm:
                emit(ws, acc, final=True)
                del wins[ws]

        if wins:
            state.update((pickle.dumps(st),))
            # event-time timer at the earliest pending deadline (next
            # window end or continuous boundary), like Flink's
            # registerEventTimeTimer — must sit beyond the watermark
            deadlines = [ws + window_seconds for ws in wins]
            if kind == "continuous":
                deadlines += [acc[2] for acc in wins.values()]
            target_ms = int(min(deadlines) * 1000)
            state.setTimeoutTimestamp(max(target_ms, int(wm * 1000) + 1))
        elif state.exists:
            # no open windows: drop the key's state entry entirely so
            # state stays bounded by ACTIVE keys, not all keys ever seen
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return (
        df.withWatermark(time_col, watermark_delay)
        .groupBy(key)
        .applyInPandasWithState(
            fn, out_schema, "buf binary", "append", GroupStateTimeout.EventTimeTimeout
        )
    )
