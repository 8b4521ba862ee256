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
) -> DataFrame:
    """Unbounded (non-windowed) stream-stream join — the reference's
    retraction-mode SQL join (flink-table/.../runtime/join/
    NonWindowInnerJoin.scala): both sides' state grows without bound
    because ANY past row may match a future one.

    Spark supports this for INNER joins (each side's state retained
    forever — identical unbounded-state cost to the reference's
    NonWindowInnerJoin). Outer flavors need watermarks on both sides to
    bound when unmatched rows can be emitted, so requesting one here
    raises with the interval-join pointer rather than silently hanging.
    """
    if how != "inner":
        raise NotImplementedError(
            "unbounded stream-stream join supports inner only; outer joins "
            "need time bounds — use interval_join with watermarks"
        )
    keys = [on] if isinstance(on, str) else list(on)
    out = left.join(right, keys, "inner")
    return out
