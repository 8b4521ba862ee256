"""Join operators beyond Spark's built-in flavors.

Reference parity:
- as-of (temporal-table) join — Flink's ``TemporalRowtimeJoin``
  (flink-table/.../runtime/join/TemporalRowtimeJoin.scala:63) buffers the
  build side per key and emits, for each probe row, the latest build row
  with time <= probe time.
- interval join — ``KeyedStream.intervalJoin(...).between(lower, upper)``
  (flink-streaming-java/.../datastream/KeyedStream.java:414,448; runtime
  flink-table/.../runtime/join/TimeBoundedStreamJoin.scala).

Scale design:
- ``asof_join`` uses the union + sort-within-key + last-value-carry-forward
  strategy: ONE shuffle on the key, no row explosion, no per-probe
  backtracking — the plan that survives 100 TB.  (A key-equi join with a
  ``right.ts <= left.ts`` predicate would multiply rows before aggregating;
  merge_asof-in-pandas would force a Python boundary.)
- ``interval_join`` is a plain equi-join on the key with the time-range
  predicate evaluated inside the hash join — Spark shuffles both sides on
  the key once; AQE picks broadcast when one side is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    allow_exact_match: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` (or ``<`` when not allow_exact_match),
    matching on the key column(s) ``on``. Left rows without a prior right
    row keep NULLs (left-outer as-of semantics, like pandas merge_asof
    and the reference's temporal join).

    The whole right payload is carried as ONE struct with a single
    ``last(ignorenulls=True)``, exactly as the reference's
    TemporalRowtimeJoin emits the latest build row atomically: a
    legitimately-NULL field of the latest right version stays NULL
    (never backfilled from an older version), and all output columns
    come from the same right row — no version tearing.

    Ties on right_time are broken deterministically by the greatest
    right_cols struct (field-by-field comparison).

    Skew note: each key's full (probe + version) history flows through
    ONE window partition — the same per-key serialization as the
    reference's keyed TemporalRowtimeJoin state.  A pathologically hot
    key serializes its own history; if that bites, pre-bucket the time
    axis (join on (key, time_bucket) with a per-bucket seed carried
    from the previous bucket) — not done by default because it adds a
    second pass for a case the keyed model already bounds.
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    right_cols = right_cols or [c for c in right.columns if c not in keys + [right_time]]
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )

    # Tag and align schemas: left rows carry a NULL right-payload struct,
    # right rows carry their payload; a single sort per key then carries
    # the latest right struct forward onto each left row.
    lpay = [F.col(c) for c in left.columns]
    l_tagged = left.select(
        *lpay,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"),
    ).select(*[c for c in l_tagged.columns])

    # Exact-time ties: a right row (tag 0) must sort BEFORE the left row
    # (tag 1) to be visible at equal timestamps (<= semantics) — ascending
    # tag order; strict (<) puts left first — descending.  Equal-time right
    # rows order by the payload struct so "last" is deterministic.
    order_left_flag = (
        F.col("__is_left").asc() if allow_exact_match else F.col("__is_left").desc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), order_left_flag, F.col("__r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        *[c for c in l_tagged.columns if c != "__r"],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left", "__t")
    for c in right_cols:
        out = out.withColumn(c, F.col("__r")[c])
    return out.drop("__r")


class TemporalTableFunction:
    """Surface parity with ``Table.createTemporalTableFunction(timeAttr,
    key)`` (flink-table/.../api/table.scala:188): a versioned-table handle
    whose as-of semantics are applied by ``temporal_join``."""

    def __init__(self, history: DataFrame, time_attr: str, key: str):
        self.history = history
        self.time_attr = time_attr
        self.key = key


def create_temporal_table_function(
    history: DataFrame, time_attr: str, key: str
) -> TemporalTableFunction:
    return TemporalTableFunction(history, time_attr, key)


def temporal_join(
    probe: DataFrame,
    versioned: TemporalTableFunction,
    probe_time: str,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """LATERAL TABLE (versioned(probe_time)) join: each probe row gets the
    version of the build side valid at its timestamp — implemented by the
    as-of join (TemporalRowtimeJoin.scala:63 semantics)."""
    return asof_join(
        probe,
        versioned.history,
        on=versioned.key,
        left_time=probe_time,
        right_time=versioned.time_attr,
        right_cols=right_cols,
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    lower,
    upper,
    how: str = "inner",
) -> DataFrame:
    """Flink interval join: match left/right rows on key where
    ``left_time + lower <= right_time <= left_time + upper``.

    ``lower``/``upper`` are SQL interval strings (e.g. ``'10 minutes'``)
    or Column expressions; negative bounds via ``'-10 minutes'``.
    """

    def _bound(b):
        if isinstance(b, str):
            s = b.strip()
            neg = s.startswith("-")
            iv = F.expr(f"INTERVAL {s.lstrip('+-')}")
            return (-1) * iv if neg else iv
        return b

    keys = [on] if isinstance(on, str) else list(on)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    lt, rt = left[left_time], right[right_time]
    cond = cond & (rt >= lt + _bound(lower)) & (rt <= lt + _bound(upper))
    out = left.join(right, cond, how)
    if how in ("inner", "left", "left_outer", "leftouter"):
        # Keep a single unambiguous key column (the left side's).
        for k in keys:
            out = out.drop(right[k])
    return out


def unbounded_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    left_time: str | None = None,
    right_time: str | None = None,
    watermark_delay: str = "0 seconds",
    idle_state_ttl_seconds: float = 3600.0,
) -> DataFrame:
    """Unbounded (non-windowed) stream-stream join — the reference's
    retraction-mode SQL joins (flink-table/.../runtime/join/
    NonWindowInnerJoin.scala, NonWindowFullJoin.scala,
    NonWindowLeftRightJoin.scala): both sides' state grows without bound
    because ANY past row may match a future one.

    INNER delegates to Spark's native stream-stream join (identical
    unbounded-state cost to NonWindowInnerJoin).

    LEFT/RIGHT/FULL OUTER run as a symmetric hash join in the stateful
    layer: per key, both sides buffer in state; each arriving row emits
    its cross-pairs with the already-buffered opposite side (append
    mode, no duplicates).  Flink emits null-padded rows EAGERLY and
    retracts them when a match arrives; an append-only sink cannot
    retract, so null-padded rows are emitted when the key's event-time
    timer fires — the watermark has passed every buffered element, the
    key has gone idle, and state clears (exactly the final state Flink's
    join converges to under idle-state retention, which the reference
    also requires for unbounded joins to stay feasible; a match arriving
    after the TTL is dropped there too).  ``left_time``/``right_time``
    event-time columns are required for the outer flavors to drive that
    watermark; ``idle_state_ttl_seconds`` is the event-time idle span
    after which an unmatched key flushes (Flink's
    withIdleStateRetentionTime analogue — size it above the expected
    key re-arrival gap).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how == "inner":
        return left.join(right, keys, "inner")
    how_n = {
        "left": "left", "left_outer": "left", "leftouter": "left",
        "right": "right", "right_outer": "right", "rightouter": "right",
        "full": "full", "full_outer": "full", "fullouter": "full",
    }.get(how)
    if how_n is None:
        raise ValueError(f"unknown join type {how!r}")
    if left_time is None or right_time is None:
        raise ValueError(
            "outer unbounded stream joins need event-time columns on both "
            "sides (left_time/right_time) to bound null-padded emission"
        )
    return _outer_unbounded_join(
        left, right, keys, how_n, left_time, right_time, watermark_delay,
        idle_state_ttl_seconds,
    )


def _outer_unbounded_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    how: str,
    left_time: str,
    right_time: str,
    watermark_delay: str,
    idle_state_ttl_seconds: float,
) -> DataFrame:
    """Symmetric hash join with timer-driven null-padding (see
    unbounded_stream_join).  Non-key columns of the two sides must be
    disjoint (alias before joining, as in SQL).

    Implementation notes (hot-path discipline):
    - payload columns travel as NATIVE Spark columns (the other side's
      columns null-cast before the union) — no JSON round-trip;
    - buffered state is Arrow-IPC-serialized pandas frames, not pickled
      Python lists — the Arrow boundary is the same one
      applyInPandasWithState already pays;
    - per-batch matching is a vectorized pandas cross-merge: the new
      pairs of a batch are exactly new_left x all_right + old_left x
      new_right (the incremental cross product), no per-row Python loop;
    - the idle timer is armed off ``max(watermark, max observed event
      time)`` — the first micro-batch's watermark is epoch 0, and a
      timer based on it alone fires as soon as the watermark first
      advances, flushing null-padded rows for keys whose match is still
      in flight (the round-3 flake).
    """
    from collections.abc import Iterator

    import pandas as pd
    import pyarrow as pa
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    lcols = [c for c in left.columns if c not in keys]
    rcols = [c for c in right.columns if c not in keys]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, both sides have {overlap}")

    def _ddl(df: DataFrame, cols: list[str]) -> list[tuple[str, str]]:
        return [(c, df.schema[c].dataType.simpleString()) for c in cols]

    key_ddl = _ddl(left, keys)
    l_ddl, r_ddl = _ddl(left, lcols), _ddl(right, rcols)
    out_cols = [c for c, _t in key_ddl + l_ddl + r_ddl]
    out_schema = ", ".join(f"{c} {t}" for c, t in key_ddl + l_ddl + r_ddl)
    ts_cols = {c for c, t in l_ddl + r_ddl if t.startswith("timestamp")}

    def _tag(df: DataFrame, time_col: str, side: int) -> DataFrame:
        # Both sides project to the SAME wide schema (own payload native,
        # other side's columns null-cast) so the union keeps every value
        # typed end-to-end.  Watermark goes on the post-projection __ts
        # column — the tag does not survive an alias.
        own = lcols if side == 0 else rcols
        other = r_ddl if side == 0 else l_ddl
        return df.select(
            *[F.col(k) for k in keys],
            F.col(time_col).cast("timestamp").alias("__ts"),
            F.lit(side).alias("__side"),
            *[F.col(c) for c in own],
            *[F.lit(None).cast(t).alias(c) for c, t in other],
        ).withWatermark("__ts", watermark_delay)

    u = _tag(left, left_time, 0).unionByName(_tag(right, right_time, 1))

    def _ser(pdf: pd.DataFrame) -> bytes:
        if not len(pdf):
            return b""
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, tbl.schema) as w:
            w.write_table(tbl)
        return sink.getvalue().to_pybytes()

    def _de(buf: bytes, cols: list[str]) -> pd.DataFrame:
        if not buf:
            return pd.DataFrame(columns=cols)
        return pa.ipc.open_stream(pa.BufferReader(buf)).read_all().to_pandas()

    def _concat(parts: list[pd.DataFrame], cols: list[str]) -> pd.DataFrame:
        parts = [p for p in parts if len(p)]
        if not parts:
            return pd.DataFrame(columns=cols)
        return pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]

    ttl_ms = int(idle_state_ttl_seconds * 1000)

    def _finish(pdf: pd.DataFrame, key_tuple) -> pd.DataFrame:
        for k, v in zip(keys, key_tuple):
            pdf[k] = v
        for c in ts_cols:
            pdf[c] = pd.to_datetime(pdf[c])  # None -> NaT, dtype datetime64
        return pdf.reindex(columns=out_cols)

    def fn(key_tuple, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            lbuf, rbuf, max_ts_ms = state.get
            old_l, old_r = _de(lbuf, lcols), _de(rbuf, rcols)
        else:
            old_l, old_r, max_ts_ms = pd.DataFrame(columns=lcols), pd.DataFrame(columns=rcols), 0
        wm = state.getCurrentWatermarkMs()

        new_l_parts: list[pd.DataFrame] = []
        new_r_parts: list[pd.DataFrame] = []
        for pdf in batches:
            if not len(pdf):
                continue
            mt = pdf["__ts"].dropna().max()
            if mt is not pd.NaT and not pd.isna(mt):
                max_ts_ms = max(max_ts_ms, pd.Timestamp(mt).value // 1_000_000)
            new_l_parts.append(pdf.loc[pdf["__side"] == 0, lcols])
            new_r_parts.append(pdf.loc[pdf["__side"] == 1, rcols])
        new_l = _concat(new_l_parts, lcols)
        new_r = _concat(new_r_parts, rcols)
        all_l = _concat([old_l, new_l], lcols)
        all_r = _concat([old_r, new_r], rcols)

        # Incremental cross product: everything involving a new row,
        # nothing already emitted.
        pairs: list[pd.DataFrame] = []
        if len(new_l) and len(all_r):
            pairs.append(new_l.merge(all_r, how="cross"))
        if len(old_l) and len(new_r):
            pairs.append(old_l.merge(new_r, how="cross"))
        out = _concat(pairs, lcols + rcols)

        if state.hasTimedOut:
            # key idle past its TTL: flush null-padded rows and clear —
            # Flink's idle-state-retention final state
            if how in ("left", "full") and len(all_l) and not len(all_r):
                pad = all_l.copy()
                for c in rcols:
                    pad[c] = None
                out = _concat([out, pad], lcols + rcols)
            if how in ("right", "full") and len(all_r) and not len(all_l):
                pad = all_r.copy()
                for c in lcols:
                    pad[c] = None
                out = _concat([out, pad], lcols + rcols)
            if state.exists:
                state.remove()
        else:
            state.update((_ser(all_l), _ser(all_r), max_ts_ms))
            # Arm off the max of watermark and observed event time: batch-1
            # watermarks are epoch 0, and an epoch-based timer fires the
            # moment the watermark first advances — padding keys whose
            # match arrives a few batches later.
            state.setTimeoutTimestamp(max(wm, max_ts_ms) + ttl_ms + 1)

        if len(out):
            yield _finish(out, key_tuple)

    return u.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, "lbuf binary, rbuf binary, max_ts_ms long", "append",
        GroupStateTimeout.EventTimeTimeout,
    )
