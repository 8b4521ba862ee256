"""Streaming CEP: the NFA matcher inside applyInPandasWithState.

Reference parity: Flink's CepOperator runs the NFA over keyed state,
emitting matches as the event-time watermark passes them
(flink-libraries/flink-cep/.../nfa/NFA.java:85; operator
AbstractKeyedCEPPatternOperator).  Our engine buffers each key's rows in
GroupState and, per micro-batch, runs the same batch matcher over the
buffer — but only for *stable* starts, i.e. rows whose full pattern
window (``within``) has passed the current watermark, so late/out-of-
order arrivals inside the watermark delay cannot invalidate an emitted
match.

Boundedness: the pattern MUST carry ``within`` (same requirement keeps
Flink's shared buffer bounded).  After each batch the buffer is trimmed
to rows at or after the resume point:
- resume >= first unstable start (everything earlier was scanned);
- under skip_past_last, also past the last emitted match's end (those
  rows are consumed by definition of the skip strategy).

State per key = (Arrow-IPC row buffer, next match id, resume timestamp)
— O(rows within the watermark+within horizon), the same bound as
Flink's NFA state.  The buffer is typed columnar (no pickle), kept
sorted with one stable pandas sort per batch, and the resume trim is a
searchsorted on the time column; rows materialize as dicts only for the
NFA scan itself (the matcher is per-row by nature — it IS the NFA).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_1_8_sourcecode_spark.cep.matcher import _find_matches
from flink_1_8_sourcecode_spark.cep.pattern import Pattern
from flink_1_8_sourcecode_spark.streaming import arrow_state


def match_pattern_stream(
    stream: DataFrame,
    pattern: Pattern,
    key: str,
    time_col: str,
    select_cols: list[str],
    watermark_delay: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Streaming PatternStream.select: same output shape as the batch
    ``match_pattern`` ((key, match_id, stage, seq, select_cols)), emitted
    in append mode as matches stabilize behind the watermark."""
    pattern = pattern.validate()
    if pattern.within_seconds is None:
        raise ValueError(
            "streaming CEP requires Pattern.within(...) — unbounded patterns "
            "would keep unbounded state (same constraint as Flink's CEP)"
        )
    within = pattern.within_seconds
    skip_past = pattern.skip_strategy == "skip_past_last"
    src = stream.withWatermark(time_col, watermark_delay)

    key_t = src.schema[key].dataType.simpleString()
    sel_schema = ", ".join(
        f"{c} {src.schema[c].dataType.simpleString()}" for c in select_cols
    )
    out_schema = f"{key} {key_t}, match_id long, stage string, seq int, {sel_schema}"

    # the full input row must survive buffering: DEFINE/where predicates
    # may reference any column, not just the selected ones
    buf_cols = ["__t", *stream.columns]

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        # buf = typed row frame with a __t seconds column, kept sorted by
        # (__t, tiebreak); state rides as Arrow IPC, never pickle
        if state.exists:
            buf_blob, next_id, resume = state.get
            parts = [arrow_state.de(bytes(buf_blob), buf_cols)]
        else:
            parts, next_id, resume = [], 0, float("-inf")
        for pdf in batches:
            p = pdf[buf_cols[1:]].copy()
            p.insert(
                0, "__t",
                pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy() / 1e6,
            )
            parts.append(p)
        buf = arrow_state.concat(parts, buf_cols)
        if len(buf):
            # state part first + stable sort == the incremental stable
            # merge (equal keys keep earlier-batch order)
            buf = buf.sort_values(
                ["__t", *( [tiebreak] if tiebreak else [] )],
                kind="stable", ignore_index=True,
            )

        wm_ms = state.getCurrentWatermarkMs()
        stable_limit = wm_ms / 1000.0 - within

        out_rows = []
        if len(buf):
            tarr = buf["__t"].to_numpy()
            buf = buf.iloc[np.searchsorted(tarr, resume, side="left"):]
        if len(buf):
            times = buf["__t"].tolist()
            rows = buf.drop(columns="__t").to_dict("records")

            last_end = float("-inf")
            first_unstable = next((t for t in times if t > stable_limit), None)
            for m in _find_matches(rows, times, pattern, max_start_time=stable_limit):
                for seq, (stage_name, ridx) in enumerate(m):
                    rec = {
                        key: key_tuple[0],
                        "match_id": next_id,
                        "stage": stage_name,
                        "seq": seq,
                    }
                    for c in select_cols:
                        rec[c] = rows[ridx][c]
                    out_rows.append(rec)
                next_id += 1
                if m:
                    last_end = max(last_end, max(times[idx] for _, idx in m))

            new_resume = first_unstable if first_unstable is not None else (
                times[-1] + 1e-6 if times else resume
            )
            if skip_past and last_end > float("-inf"):
                new_resume = max(new_resume, last_end + 1e-6)
            resume = max(resume, new_resume)
            buf = buf.iloc[
                np.searchsorted(buf["__t"].to_numpy(), resume, side="left"):
            ]

        state.update((arrow_state.ser(buf.reset_index(drop=True)), next_id, resume))
        if len(buf):
            # Event-time timer at the earliest buffered row + within: the
            # group re-fires when its oldest pending start stabilizes even
            # if no further events arrive for the key (Flink's CEP cleanup
            # timer parity).
            earliest = float(buf["__t"].iloc[0])
            state.setTimeoutTimestamp(
                max(int((earliest + within) * 1000) + 1, wm_ms + 1)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=[key, "match_id", "stage", "seq", *select_cols]
            )

    return src.groupBy(key).applyInPandasWithState(
        fn,
        out_schema,
        "buf binary, next_id long, resume double",
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
