"""Window evictors — CountEvictor / TimeEvictor parity
(flink-streaming-java/.../windowing/evictors/CountEvictor.java,
TimeEvictor.java): remove elements from a window's buffer before the
window function applies.

Spark's windowed aggregation never exposes the element buffer, so
evicted windows run in the stateful layer: per (key, open window) the
state holds the SURVIVING element buffer only — eviction is applied
eagerly on every arrival, so state stays bounded at ``n`` elements
(count evictor) or one time-span (time evictor), never the full window.
The window function (sum/count here) applies to the survivors when the
global watermark closes the window — evict-before-apply, the reference
default (``doEvictAfter=false``).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def evicted_tumble_agg(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    window_seconds: float,
    evictor: tuple[str, float],
    watermark_delay: str = "0 seconds",
    delta_fn=None,
) -> DataFrame:
    """Tumbling event-time windows whose buffer passes through an
    evictor before aggregating:

    - ``("count", n)`` — CountEvictor.java: keep only the LAST n
      elements (in event-time order) of each window;
    - ``("time", span)`` — TimeEvictor.java: keep elements with
      ``ts > max_ts_in_window - span``;
    - ``("delta", threshold)`` — DeltaEvictor.java: evict every element
      whose ``delta_fn(element, last_element) >= threshold``, where
      ``last_element`` is the window's final element.

    Count/time evictors are suffix-keepers, so eviction applies eagerly
    on every arrival and state stays bounded.  The delta evictor is
    relative to the LAST element — which isn't known until the window
    closes — so its windows buffer every element, exactly like the
    reference's EvictingWindowOperator (which keeps the full element
    list for ANY evictor); eviction then runs once at firing time
    (evict-before-apply, doEvictAfter=false).

    Output: ``(key, w_start, cnt, total)`` over the surviving elements,
    one row per window at watermark passage.
    """
    kind, param = evictor
    if kind not in ("count", "time", "delta"):
        raise ValueError(f"unknown evictor {kind!r}")
    if delta_fn is None:
        delta_fn = lambda e, last: abs(e - last)  # noqa: E731
    key_field = df.schema[key]
    key_name, key_ddl = key_field.name, key_field.dataType.simpleString()
    out_schema = f"{key_name} {key_ddl}, w_start timestamp, cnt long, total double"

    def evict(buf: list[tuple[float, float]]) -> list[tuple[float, float]]:
        buf.sort()
        if kind == "count":
            return buf[-int(param):]
        if kind == "time":
            cutoff = buf[-1][0] - param
            return [r for r in buf if r[0] > cutoff]
        # delta: keep elements strictly under the threshold vs the last
        # element (reference evicts on delta >= threshold)
        last_v = buf[-1][1]
        return [r for r in buf if delta_fn(r[1], last_v) < param]

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        wins: dict[float, list] = pickle.loads(state.get[0]) if state.exists else {}
        wm = state.getCurrentWatermarkMs() / 1000.0
        out = []

        for pdf in batches:
            ts = pdf[time_col].astype("datetime64[us]").astype("int64") / 1e6
            vals = pdf[value_col].astype(float)
            for t, v in zip(ts, vals):
                ws = t - (t % window_seconds)
                if ws + window_seconds <= wm:
                    continue  # behind the watermark: window already fired
                buf = wins.setdefault(ws, [])
                buf.append((float(t), float(v)))
                if kind != "delta":
                    # eager eviction keeps state bounded; delta must see
                    # the final element, so it buffers the whole window
                    wins[ws] = evict(buf)

        for ws in sorted(wins):
            if ws + window_seconds <= wm:
                survivors = wins.pop(ws)
                if kind == "delta":
                    survivors = evict(survivors)  # evict-before-apply at firing
                out.append(
                    {
                        key_name: key_tuple[0],
                        "w_start": pd.Timestamp(ws, unit="s"),
                        "cnt": len(survivors),
                        "total": sum(v for _, v in survivors),
                    }
                )

        if wins:
            state.update((pickle.dumps(wins),))
            target_ms = int(min(ws + window_seconds for ws in wins) * 1000)
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
