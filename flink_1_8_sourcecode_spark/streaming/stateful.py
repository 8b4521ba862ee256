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
                            "key": key_tuple[0],
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
        "key long, window_seq int, cnt int, total double",
        "cnt int, total double, emitted int",
        "append",
        GroupStateTimeout.NoTimeout,
    )
