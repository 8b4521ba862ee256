"""Fluent DataStream-API facade — the reference's primary STREAMING
entry point (flink-streaming-java/.../api/datastream/).

Reference parity:
- StreamExecutionEnvironment.java: getExecutionEnvironment :1542,
  fromElements :789, socketTextStream :1085, readFile :1027,
  addSource :1413
- DataStream.java: map :578, flatMap :600, filter :645, union :218,
  keyBy :285, assignTimestampsAndWatermarks :738
- KeyedStream.java: timeWindow/window :390, countWindow :642,
  reduce :730 (running agg), process :360
- WindowedStream.java: aggregate/reduce/sum
- DataStream.addSink :1235 / writeAsText

Spark-first: everything lowers to Structured Streaming DataFrames —
`readStream` sources, `withWatermark` for the watermark assigner,
`F.window`/`F.session_window` grouping for windows, and the repo's
applyInPandasWithState operators for the custom stateful tail
(keyed_process, count_window_agg, running/bounded OVER).  ``.df`` is
always exposed; nothing hides from the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.session import get_spark
from flink_1_8_sourcecode_spark.streaming import sinks as _sinks
from flink_1_8_sourcecode_spark.streaming import sources as _sources
from flink_1_8_sourcecode_spark.streaming import windows as _windows


class StreamExecutionEnvironment:
    """StreamExecutionEnvironment.java:1542."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "StreamExecutionEnvironment":
        return cls(spark)

    def socket_text_stream(self, host: str, port: int) -> "DataStream":
        """socketTextStream :1085."""
        return DataStream(_sources.socket_stream(self.spark, host, port))

    def register_cached_file(self, file_path: str, name: str) -> None:
        """registerCachedFile (StreamExecutionEnvironment.java mirrors
        ExecutionEnvironment.java:859) — see
        distributed_cache.register_cached_file."""
        from flink_1_8_sourcecode_spark.distributed_cache import (
            register_cached_file,
        )

        register_cached_file(self.spark, file_path, name)

    def rate_stream(self, rows_per_second: int = 100) -> "DataStream":
        """The rate source (the fromElements/generateSequence stand-in
        for an unbounded test stream)."""
        return DataStream(_sources.rate_stream(self.spark, rows_per_second))

    def read_file_stream(self, path: str, fmt: str, schema: str) -> "DataStream":
        """readFile with FileProcessingMode.PROCESS_CONTINUOUSLY :1027
        — the file-monitoring source."""
        return DataStream(
            self.spark.readStream.format(fmt).schema(schema).load(path)
        )

    def add_source(self, df: DataFrame) -> "DataStream":
        """addSource :1413 — wrap any readStream DataFrame (custom
        SourceFunction parity: build the frame, hand it in)."""
        return DataStream(df)


class DataStream:
    """Fluent wrapper over a (usually streaming) DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- row-level (same fast-path stance as the DataSet facade) -----
    def map(self, *cols: Column) -> "DataStream":
        """map :578 — JVM-side select expressions."""
        return DataStream(self.df.select(*cols))

    def flat_map(self, *cols) -> "DataStream":
        """flatMap :600 — pass-throughs plus one exploded Column."""
        return DataStream(self.df.select(*cols))

    def filter(self, predicate) -> "DataStream":
        """filter :645."""
        return DataStream(self.df.filter(predicate))

    def union(self, *others: "DataStream") -> "DataStream":
        """union :218 (UNION ALL of same-schema streams)."""
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return DataStream(out)

    def assign_timestamps_and_watermarks(
        self, ts_col: str, delay: str
    ) -> "DataStream":
        """assignTimestampsAndWatermarks :738 with a
        BoundedOutOfOrdernessTimestampExtractor(delay)."""
        return DataStream(self.df.withWatermark(ts_col, delay))

    def key_by(self, *keys) -> "KeyedStream":
        """keyBy :285."""
        return KeyedStream(self.df, [k if isinstance(k, str) else k for k in keys])

    def split(self, outputs: dict[str, Column]) -> dict[str, "DataStream"]:
        """split/side outputs (DataStream.split / OutputTag side
        outputs — streaming/side_outputs.py:split): named predicate
        channels over one pass; a row lands in every channel whose
        predicate holds."""
        from flink_1_8_sourcecode_spark.streaming.side_outputs import split

        return {k: DataStream(v) for k, v in split(self.df, outputs).items()}

    def connect(
        self,
        other: "DataStream",
        key: str,
        payload_cols: dict[str, tuple[str | None, str | None]],
    ) -> "DataStream":
        """connect :247 (ConnectedStreams) — the two streams keyed,
        tagged ``__input`` (1/2) and unioned on a unified NULL-padded
        schema (streaming/side_outputs.py:connect_tagged); feed the
        result to key_by(...).process for CoProcessFunction
        semantics."""
        from flink_1_8_sourcecode_spark.streaming.side_outputs import (
            connect_tagged,
        )

        return DataStream(connect_tagged(self.df, other.df, key, payload_cols))

    def join(self, other: "DataStream") -> "JoinedStreams":
        """DataStream.join :427 (JoinedStreams.java:128) — windowed
        stream-stream join: chain ``.where(keys).equal_to(keys)
        .window(lts, rts, size).apply()``."""
        return JoinedStreams(self, other)

    def co_group(self, other: "DataStream") -> "CoGroupedStreams":
        """DataStream.coGroup :457 (CoGroupedStreams.java:75) — windowed
        stream-stream coGroup: chain ``.where(keys).equal_to(keys)
        .window(lts, rts, size).apply(fn, schema)``.  Unlike join, the
        CoGroupFunction also sees one-sided (key, window) groups."""
        return CoGroupedStreams(self, other)

    coGroup = co_group

    def connect_broadcast(
        self,
        snapshot_fn,
        on: str | list[str],
        how: str = "left",
        checkpoint: str | None = None,
        sink_fn=None,
    ):
        """connect(BroadcastStream) :427 + KeyedBroadcastProcessFunction
        — the broadcast state pattern (streaming/side_outputs.py:
        broadcast_state_join): each micro-batch joins against a FRESH
        broadcast snapshot of the slowly-changing side.  Returns the
        writeStream builder (call .start())."""
        from flink_1_8_sourcecode_spark.streaming.side_outputs import (
            broadcast_state_join,
        )

        return broadcast_state_join(
            self.df, snapshot_fn, on, how, checkpoint, sink_fn
        )

    # --- sinks (DataStream.addSink :1235) ----------------------------
    # each returns a STARTED StreamingQuery (execute() is implicit in
    # Structured Streaming's start) — callers processAllAvailable/stop
    def add_sink_file(self, path: str, checkpoint: str, fmt: str = "parquet"):
        """StreamingFileSink parity — exactly-once file sink."""
        return _sinks.file_sink(self.df, path, checkpoint, fmt).start()

    def add_sink_memory(self, name: str, mode: str = "append"):
        return _sinks.memory_sink(self.df, name, mode).start()

    def print(self, mode: str = "append"):
        """DataStream.print — console sink."""
        return _sinks.console_sink(self.df, mode).start()


class KeyedStream:
    """KeyedStream.java surface: windows, running reduce, process."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self.df = df
        self.keys = keys

    def time_window(
        self, ts_col: str, size: str, slide: str | None = None,
        watermark: str | None = None,
    ) -> "WindowedStream":
        """timeWindow :390 — tumbling (no slide) or sliding."""
        return WindowedStream(self, ts_col, "hop" if slide else "tumble",
                              size=size, slide=slide, watermark=watermark)

    def session_window(
        self, ts_col: str, gap: str, watermark: str | None = None
    ) -> "WindowedStream":
        """EventTimeSessionWindows.withGap."""
        return WindowedStream(self, ts_col, "session", gap=gap, watermark=watermark)

    def count_window(self, value_col: str, size: int) -> DataFrame:
        """countWindow :642 — per-key tumbling count window (the
        custom stateful operator; no SQL form exists in either
        engine)."""
        from flink_1_8_sourcecode_spark.streaming.stateful import count_window_agg

        if len(self.keys) != 1:
            raise NotImplementedError("count_window: exactly one key column")
        return count_window_agg(self.df, self.keys[0], value_col, size)

    def reduce_running_sum(
        self, ts_col: str, value_col: str, watermark_delay: str,
        tiebreak: str | None = None,
    ) -> DataFrame:
        """reduce :730 in its running-aggregate reading — the
        event-time unbounded OVER (RowTimeUnboundedOver parity)."""
        from flink_1_8_sourcecode_spark.streaming.stateful import (
            event_time_running_agg,
        )

        if len(self.keys) != 1:
            raise NotImplementedError("reduce_running_sum: exactly one key")
        return event_time_running_agg(
            self.df, self.keys[0], ts_col, value_col, watermark_delay, tiebreak
        )

    def reduce_bounded(
        self, ts_col: str, value_col: str, watermark_delay: str,
        preceding_rows: int | None = None,
        preceding_seconds: float | None = None,
        tiebreak: str | None = None,
        idle_retention_seconds: "float | str | None" = "auto",
    ) -> DataFrame:
        """The bounded OVER twin (RowTimeBoundedRowsOver.scala:44 /
        RowTimeBoundedRangeOver.scala): per-row frame sum/count over
        the last n rows or trailing interval
        (streaming/stateful.py:event_time_bounded_agg).
        ``idle_retention_seconds``: "auto" (default) drops an idle
        ROWS key after max(30 days, 100x delay) of event time; None
        retains forever (exact frames across any gap); float = TTL."""
        from flink_1_8_sourcecode_spark.streaming.stateful import (
            event_time_bounded_agg,
        )

        if len(self.keys) != 1:
            raise NotImplementedError("reduce_bounded: exactly one key")
        return event_time_bounded_agg(
            self.df, self.keys[0], ts_col, value_col, watermark_delay,
            preceding_rows, preceding_seconds, tiebreak,
            idle_retention_seconds=idle_retention_seconds,
        )

    def rate_limit(
        self, time_col: str, id_col: str, k: int, window_seconds: int,
        watermark_delay: str,
    ) -> DataFrame:
        """Online per-key rate limit (streaming/stateful.py:
        streaming_rate_limit): admit the first k events per key per
        tumbling bucket, event-time order — equals the batch
        rate_limit on the same data."""
        from flink_1_8_sourcecode_spark.streaming.stateful import (
            streaming_rate_limit,
        )

        if len(self.keys) != 1:
            raise NotImplementedError("rate_limit: exactly one key")
        return streaming_rate_limit(
            self.df, self.keys[0], time_col, id_col, k, window_seconds,
            watermark_delay,
        )

    def interval_join(
        self, other: "KeyedStream", left_time: str, right_time: str
    ) -> "IntervalJoined":
        """KeyedStream.intervalJoin :414 — chain ``.between(lower,
        upper)`` to finish (IntervalJoin.java between/process).  The two
        streams' key columns pair positionally; the result carries the
        LEFT side's key names (operators/joins.py:interval_join)."""
        if len(self.keys) != len(other.keys):
            raise ValueError(
                f"interval_join: key arity mismatch "
                f"({self.keys} vs {other.keys})"
            )
        return IntervalJoined(self, other, left_time, right_time)

    def process(self, fn, output_schema: str, state_schema: str,
                timeout: str = "NoTimeout") -> DataFrame:
        """KeyedProcessFunction :360 — the full escape hatch
        (streaming/stateful.py:keyed_process)."""
        from flink_1_8_sourcecode_spark.streaming.stateful import keyed_process

        return keyed_process(
            self.df, self.keys, fn, output_schema, state_schema, timeout
        )


class WindowedStream:
    """WindowedStream.java: terminal aggregate over the window spec."""

    def __init__(self, keyed: KeyedStream, ts_col: str, kind: str,
                 size: str | None = None, slide: str | None = None,
                 gap: str | None = None, watermark: str | None = None):
        self._keyed = keyed
        self._ts = ts_col
        self._kind = kind
        self._size = size
        self._slide = slide
        self._gap = gap
        self._wm = watermark

    def aggregate(self, **aggs: Column) -> DataStream:
        """aggregate/reduce/sum — named aggregate Columns; emits
        (w_start, w_end, keys..., aggs...)."""
        k = self._keyed
        if self._kind == "tumble":
            out = _windows.tumble(k.df, self._ts, self._size, k.keys, aggs, self._wm)
        elif self._kind == "hop":
            out = _windows.hop(
                k.df, self._ts, self._size, self._slide, k.keys, aggs, self._wm
            )
        else:
            out = _windows.session(k.df, self._ts, self._gap, k.keys, aggs, self._wm)
        return DataStream(out)

    def sum(self, value_col: str) -> DataStream:
        return self.aggregate(**{value_col: F.sum(value_col)})


class IntervalJoined:
    """KeyedStream.intervalJoin(...).between(lower, upper) handle
    (flink-streaming-java/.../api/datastream/KeyedStream.java:414,
    IntervalJoined.java): ``between`` closes the chain and returns the
    joined DataStream.  ``lower``/``upper`` are SQL interval strings
    relative to the LEFT time (negative via '-10 minutes'); bounds are
    inclusive, matching the reference's default (no lowerBoundExclusive
    surface — Spark's range condition is closed)."""

    def __init__(self, left: KeyedStream, right: KeyedStream,
                 left_time: str, right_time: str):
        self._l = left
        self._r = right
        self._lt = left_time
        self._rt = right_time

    def between(self, lower: str, upper: str, how: str = "inner") -> DataStream:
        from flink_1_8_sourcecode_spark.operators.joins import interval_join

        rdf = self._r.df
        # pair the key columns positionally, carrying the LEFT names
        for lk, rk in zip(self._l.keys, self._r.keys):
            if rk != lk:
                if lk in rdf.columns:
                    raise ValueError(
                        f"interval_join: right side already has a column "
                        f"named {lk!r}; alias it before joining"
                    )
                rdf = rdf.withColumnRenamed(rk, lk)
        return DataStream(
            interval_join(
                self._l.df, rdf, on=self._l.keys,
                left_time=self._lt, right_time=self._rt,
                lower=lower, upper=upper, how=how,
            )
        )


class JoinedStreams:
    """DataStream.join(other).where(k).equal_to(k).window(...).apply()
    (JoinedStreams.java:128): same key, same tumbling event-time window.
    Lowers to the Spark idiom for windowed stream-stream joins — both
    sides bucketed with F.window + watermarked, equi-joined on
    (keys..., window bucket).  State stays bounded: the watermark
    evicts buckets older than size + delay on both sides, exactly the
    reference's window-state eviction."""

    def __init__(self, left: DataStream, right: DataStream):
        self._l = left
        self._r = right
        self._where: list[str] | None = None
        self._equal: list[str] | None = None

    def where(self, *keys: str) -> "JoinedStreams":
        self._where = list(keys)
        return self

    def equal_to(self, *keys: str) -> "JoinedStreams":
        self._equal = list(keys)
        return self

    equalTo = equal_to

    def window(
        self,
        left_time: str,
        right_time: str,
        size: str,
        watermark_delay: str | None = None,
    ) -> DataStream:
        """TumblingEventTimeWindows.of(size); ``apply`` is implicit —
        the joined rows carry both sides' payload columns (the
        JoinFunction is a downstream .map).  ``watermark_delay``
        (default: the window size) bounds out-of-orderness AND state."""
        if not self._where or not self._equal or len(self._where) != len(self._equal):
            raise ValueError(
                "join: .where(k...).equal_to(k...) with matching key "
                "counts must precede .window"
            )
        delay = watermark_delay or size
        ldf, rdf = self._l.df, self._r.df
        overlap = set(ldf.columns) & set(rdf.columns)
        if overlap:
            raise ValueError(
                f"windowed join: column names must be disjoint, both "
                f"sides have {sorted(overlap)}; alias before joining"
            )
        lw = ldf.withColumn("__wl", F.window(left_time, size))
        rw = rdf.withColumn("__wr", F.window(right_time, size))
        if ldf.isStreaming:
            lw = lw.withWatermark(left_time, delay)
        if rdf.isStreaming:
            rw = rw.withWatermark(right_time, delay)
        cond = lw["__wl"] == rw["__wr"]
        for lk, rk in zip(self._where, self._equal):
            cond = cond & (lw[lk] == rw[rk])
        return DataStream(lw.join(rw, cond, "inner").drop("__wl", "__wr"))


class _ColsView:
    """Columns-only group view for ``WindowedCoGroup.apply(...,
    columns_only=True)``: supports ``len(v)`` and ``v["col"]`` (a pandas
    Series slice of the batch-level column).  Deliberately NOTHING else
    — the opt-in flag is the caller's promise that its CoGroupFunction
    never touches frame-level APIs or the row index, which is what makes
    skipping the per-group DataFrame construction sound."""

    __slots__ = ("_cols", "_a", "_b")

    def __init__(self, cols, a, b):
        self._cols = cols
        self._a = a
        self._b = b

    def __len__(self):
        return self._b - self._a

    def __getitem__(self, col):
        return self._cols[col].iloc[self._a:self._b]


class CoGroupedStreams:
    """DataStream.coGroup(other).where(k).equal_to(k).window(...)
    .apply(fn, schema) (CoGroupedStreams.java:75): same keys, same
    tumbling event-time window, but the user function is invoked once
    per (key, window) group with BOTH sides' rows — including groups
    where one side is empty, which a join would drop.

    Spark-first lowering (WindowedCoGroup.apply):
    - batch inputs: ``groupBy(keys, bucket).cogroup(...).applyInPandas``
      — the native Spark coGroup, one co-partitioned shuffle per side.
    - streaming inputs: both sides union into one side-tagged stream
      and a SINGLE watermark-finalized windowed aggregation collects
      the two per-side buffers per (key, window) — exactly the
      reference's window state buffering (WindowOperator.java keeps one
      window buffer per key for a CoGroupFunction, with the side tag
      Flink's TaggedUnion) — and the CoGroupFunction is applied per
      group via ``mapInArrow``.  One-sided groups get an empty
      other-side buffer (collect_list skips the union's typed NULLs),
      which a join-based lowering would need a full-outer join to keep.
      Each group is delivered to ``fn`` exactly once across
      micro-batches (a naive streaming ``cogroup`` would fire per-batch
      and split groups).

    State stays bounded at 100 TB the same way the reference's window
    state does: the watermark evicts (key, window) buffers once
    ``size + delay`` has passed, and the buffered payload is exactly
    one window of rows per key — the contract of a CoGroupFunction.
    """

    def __init__(self, left: DataStream, right: DataStream):
        self._l = left
        self._r = right
        self._where: list[str] | None = None
        self._equal: list[str] | None = None

    def where(self, *keys: str) -> "CoGroupedStreams":
        self._where = list(keys)
        return self

    def equal_to(self, *keys: str) -> "CoGroupedStreams":
        self._equal = list(keys)
        return self

    equalTo = equal_to

    def window(
        self,
        left_time: str,
        right_time: str,
        size: str,
        watermark_delay: str | None = None,
    ) -> "WindowedCoGroup":
        """TumblingEventTimeWindows.of(size)."""
        if not self._where or not self._equal or len(self._where) != len(self._equal):
            raise ValueError(
                "co_group: .where(k...).equal_to(k...) with matching key "
                "counts must precede .window"
            )
        return WindowedCoGroup(
            self._l, self._r, self._where, self._equal,
            left_time, right_time, size, watermark_delay or size,
        )


class WindowedCoGroup:
    """The ``.apply(fn, schema)`` tail of the coGroup chain.

    ``fn(left_pdf, right_pdf) -> pdf`` — the same signature as the
    batch DataSet facade's CoGroupBuilder (dataset_api.py:480), with
    each side's ORIGINAL columns (helper bucket columns are stripped).
    One side's pdf is empty for one-sided groups; empty pdfs carry the
    correct column names but object dtypes — guard reductions with
    ``len(pdf)`` checks as any CoGroupFunction does for empty iterables.

    ``contract="arrow"`` (opt-in, streaming path): ``fn`` receives the
    two sides as zero-copy ``pyarrow.Table`` slices instead of pandas
    frames and may return a ``pyarrow.Table``/``RecordBatch`` (or a
    pandas frame).  This skips the Arrow->pandas materialization of
    every micro-batch AND the per-group pandas ``iloc`` machinery —
    the power-user fast path when the function only reads lengths /
    columns.  On the BATCH path Spark's native ``cogroup`` transport
    is pandas, so the Arrow contract is adapted (frames wrapped to
    Tables at the boundary) — identical results, no extra speed.
    """

    def __init__(self, left, right, where, equal, lt, rt, size, delay):
        self._l, self._r = left, right
        self._where, self._equal = where, equal
        self._lt, self._rt = lt, rt
        self._size, self._delay = size, delay

    def apply(
        self, fn, schema, contract: str = "pandas",
        columns_only: bool = False,
    ) -> DataStream:
        """``columns_only=True`` (r17, guide §4): opt-in declaration that
        ``fn`` reads its two inputs ONLY through ``len(pdf)`` and column
        access (``pdf["col"]`` / positional ops on the returned Series)
        and never relies on the frame's own row index or frame-level
        methods.  The streaming dispatch then hands each group two
        lightweight column views (one pandas Series slice per accessed
        column) instead of materializing a per-group DataFrame slice —
        the per-group pandas machinery (frame construction + index
        reset, ~0.15 ms x 26k groups at sf0.1) disappears while the
        function body and its results stay byte-identical.  The batch
        path ignores the flag (Spark's native cogroup transport already
        delivers real frames).  Only meaningful with contract='pandas'."""
        if contract not in ("pandas", "arrow"):
            raise ValueError(
                f"co_group apply: contract must be 'pandas' or 'arrow', "
                f"got {contract!r}"
            )
        ldf, rdf = self._l.df, self._r.df
        lt, rt, size = self._lt, self._rt, self._size
        lcols, rcols = list(ldf.columns), list(rdf.columns)

        if not ldf.isStreaming and not rdf.isStreaming:
            # native batch coGroup: bucket, co-partition, applyInPandas
            lb = ldf.withColumn("__w", F.window(lt, size).start)
            rb = rdf.withColumn("__w", F.window(rt, size).start)

            if contract == "arrow":
                def strip(l_pdf, r_pdf):
                    import pandas as pd
                    import pyarrow as pa

                    out = fn(
                        pa.Table.from_pandas(
                            l_pdf[lcols], preserve_index=False
                        ),
                        pa.Table.from_pandas(
                            r_pdf[rcols], preserve_index=False
                        ),
                    )
                    if isinstance(out, pa.RecordBatch):
                        out = pa.Table.from_batches([out])
                    if isinstance(out, pa.Table):
                        return out.to_pandas()
                    return out
            else:
                def strip(l_pdf, r_pdf):
                    return fn(l_pdf[lcols], r_pdf[rcols])

            lg = lb.groupBy(*self._where, "__w")
            rg = rb.groupBy(*self._equal, "__w")
            return DataStream(lg.cogroup(rg).applyInPandas(strip, schema))

        # streaming: ONE stateful operator (r16, guide §1.2 "remove
        # unnecessary shuffles and passes").  Both sides union into one
        # tagged stream — each row carries its own side's struct and a
        # typed NULL for the other — and a single watermark-finalized
        # windowed aggregate collects the two buffers per (key, window)
        # (collect_list skips the NULL structs, so one-sided groups get
        # an EMPTY other-side list, exactly what the full-outer join
        # produced; groupBy groups NULL keys together, matching the
        # join's eqNullSafe).  The previous lowering ran TWO windowed
        # collect_list aggregates plus a stream-stream FULL OUTER join —
        # three chained stateful operators, five state stores, ~1.2 s of
        # state-store commit time per micro-batch at bench scale — for a
        # result this one exchange + one store computes identically.
        lst = F.struct(*lcols)
        rst = F.struct(*rcols)
        l_norm = ldf.select(
            *[F.col(k).alias(f"__k{i}") for i, k in enumerate(self._where)],
            F.col(lt).alias("__t"),
            lst.alias("__lrow"),
            F.lit(None).cast(
                rdf.select(rst.alias("__r")).schema["__r"].dataType
            ).alias("__rrow"),
        )
        r_norm = rdf.select(
            *[F.col(k).alias(f"__k{i}") for i, k in enumerate(self._equal)],
            F.col(rt).alias("__t"),
            F.lit(None).cast(
                ldf.select(lst.alias("__l")).schema["__l"].dataType
            ).alias("__lrow"),
            rst.alias("__rrow"),
        )
        u = l_norm.unionByName(r_norm).withWatermark("__t", self._delay)
        joined = (
            u.groupBy(
                *[F.col(f"__k{i}") for i in range(len(self._where))],
                F.window("__t", size).alias("__w"),
            )
            .agg(
                F.collect_list("__lrow").alias("__lrows"),
                F.collect_list("__rrow").alias("__rrows"),
            )
            .select("__lrows", "__rrows")
        )

        # group dispatch runs on ARROW batches, not pandas: building a
        # pd.DataFrame from a list-of-dict struct column costs ~ms per
        # group (26k groups at sf0.1 = tens of seconds); instead each
        # batch's list<struct> column is flattened ONCE (vectorized C)
        # into a single typed frame and every group is an iloc slice of
        # it — the per-group Python work drops to two slices + fn()
        from pyspark.sql.types import StructType

        spark_schema = (
            schema if isinstance(schema, StructType)
            else StructType.fromDDL(schema)
        )

        as_pandas = contract == "pandas"

        def _flatten(col, names):
            # list<struct> column -> (one typed frame of ALL rows in
            # the batch, exclusive group offsets); NULL lists (the
            # empty side of a one-sided group) count as length 0
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            flat = pc.list_flatten(col)
            big = pa.Table.from_arrays(
                [flat.field(n) for n in names], names=names
            )
            if as_pandas:
                big = big.to_pandas()
            lens = pc.list_value_length(col).fill_null(0)
            offs = np.zeros(len(col) + 1, dtype="int64")
            np.cumsum(lens.to_numpy(zero_copy_only=False), out=offs[1:])
            return big, offs

        def run(batches):
            import pandas as pd
            import pyarrow as pa
            from pyspark.sql.pandas.types import to_arrow_schema

            out_schema = to_arrow_schema(spark_schema)
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                li = batch.schema.names.index("__lrows")
                ri = batch.schema.names.index("__rrows")
                big_l, off_l = _flatten(batch.column(li), lcols)
                big_r, off_r = _flatten(batch.column(ri), rcols)
                if as_pandas and columns_only:
                    # columns-only contract: one Series per column per
                    # BATCH; each group is two O(1)-built views whose
                    # column access returns a Series slice — no
                    # per-group DataFrame construction or index reset
                    lsers = {c: big_l[c] for c in lcols}
                    rsers = {c: big_r[c] for c in rcols}
                outs = []
                for i in range(batch.num_rows):
                    if as_pandas and columns_only:
                        l_in = _ColsView(lsers, off_l[i], off_l[i + 1])
                        r_in = _ColsView(rsers, off_r[i], off_r[i + 1])
                    elif as_pandas:
                        l_in = big_l.iloc[off_l[i]:off_l[i + 1]]
                        r_in = big_r.iloc[off_r[i]:off_r[i + 1]]
                        if len(l_in) and l_in.index[0] != 0:
                            l_in = l_in.reset_index(drop=True)
                        if len(r_in) and r_in.index[0] != 0:
                            r_in = r_in.reset_index(drop=True)
                    else:
                        # zero-copy Arrow slices — no pandas anywhere
                        l_in = big_l.slice(off_l[i], off_l[i + 1] - off_l[i])
                        r_in = big_r.slice(off_r[i], off_r[i + 1] - off_r[i])
                    out = fn(l_in, r_in)
                    if out is not None and len(out):
                        outs.append(out)
                # one Arrow batch per input batch, not one per group —
                # per-group yields cost a serializer round-trip each
                if not outs:
                    continue
                if isinstance(outs[0], pd.DataFrame):
                    yield pa.RecordBatch.from_pandas(
                        pd.concat(outs, ignore_index=True),
                        schema=out_schema, preserve_index=False,
                    )
                else:
                    tables = [
                        pa.Table.from_batches([o])
                        if isinstance(o, pa.RecordBatch) else o
                        for o in outs
                    ]
                    merged = (
                        pa.concat_tables(tables)
                        .cast(pa.schema(out_schema))
                        .combine_chunks()
                    )
                    yield from merged.to_batches()

        return DataStream(joined.mapInArrow(run, spark_schema))


class AsyncDataStream:
    """Async I/O (flink-streaming-java/.../datastream/
    AsyncDataStream.java:102 unorderedWait, :147 orderedWait;
    AsyncFunction.java asyncInvoke/timeout): apply an ASYNC per-record
    function — an external lookup, an RPC — with up to ``capacity``
    requests in flight at once, so operator throughput is bounded by
    round-trip CONCURRENCY instead of round-trip latency.

    Spark-first lowering: ``mapInPandas`` runs one asyncio event loop
    per Arrow batch per partition; a Semaphore(capacity) throttles
    in-flight coroutines exactly like the reference's queue capacity.
    ``ordered_wait`` preserves input order within each partition
    (asyncio.gather — the reference's ordered emitter queue);
    ``unordered_wait`` emits in completion order.  Ordering across
    partitions is never promised — same as the reference, where order
    only holds per parallel subtask.

    ``async_fn(row: dict) -> dict | list[dict] | None`` — None or []
    drops the record (AsyncFunction can complete with an empty
    collection); a list fans out (ResultFuture.complete takes a
    collection).  ``timeout_s`` is the per-request timeout:
    ``on_timeout="fail"`` re-raises (the reference's default — the
    job fails), ``"drop"`` discards the record (an overriding
    AsyncFunction.timeout that completes empty).

    This is the I/O-bound enrichment path — per-row Python by design
    (each row IS a request).  CPU-bound work belongs in vectorized
    ops, not here.
    """

    @staticmethod
    def _apply(stream: DataStream, async_fn, schema, timeout_s: float,
               capacity: int, on_timeout: str, ordered: bool) -> DataStream:
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        if on_timeout not in ("fail", "drop"):
            raise ValueError(
                f"on_timeout must be 'fail' or 'drop', got {on_timeout!r}"
            )

        def run(batches):
            import asyncio

            import pandas as pd

            async def one(sem, row):
                # the timeout timer starts when the element ENTERS the
                # operator queue (reference: AsyncWaitOperator registers
                # the timeout on addAsyncBufferEntry, before capacity is
                # available) — so wait_for wraps the semaphore WAIT plus
                # the request, and a saturated capacity cannot delay a
                # record unboundedly without tripping on_timeout
                async def _queued_request():
                    async with sem:
                        return await async_fn(row)

                try:
                    return await asyncio.wait_for(
                        _queued_request(), timeout=timeout_s
                    )
                except asyncio.TimeoutError:
                    if on_timeout == "fail":
                        raise TimeoutError(
                            f"async request timed out after {timeout_s}s "
                            f"for row {row!r} (AsyncDataStream default "
                            "is fail; pass on_timeout='drop' to discard)"
                        )
                    return None

            async def drive(rows):
                sem = asyncio.Semaphore(capacity)
                tasks = [asyncio.ensure_future(one(sem, r)) for r in rows]
                if ordered:
                    return await asyncio.gather(*tasks)
                done: list = []
                for fut in asyncio.as_completed(tasks):
                    done.append(await fut)
                return done

            for pdf in batches:
                if not len(pdf):
                    continue
                rows = pdf.to_dict("records")
                results = asyncio.run(drive(rows))
                out: list[dict] = []
                for res in results:
                    if res is None:
                        continue
                    out.extend(res if isinstance(res, list) else [res])
                if out:
                    yield pd.DataFrame(out)

        return DataStream(stream.df.mapInPandas(run, schema))

    @staticmethod
    def unordered_wait(stream: DataStream, async_fn, schema,
                       timeout_s: float, capacity: int = 100,
                       on_timeout: str = "fail") -> DataStream:
        """AsyncDataStream.unorderedWait:102 — completion order."""
        return AsyncDataStream._apply(
            stream, async_fn, schema, timeout_s, capacity, on_timeout,
            ordered=False,
        )

    @staticmethod
    def ordered_wait(stream: DataStream, async_fn, schema,
                     timeout_s: float, capacity: int = 100,
                     on_timeout: str = "fail") -> DataStream:
        """AsyncDataStream.orderedWait:147 — input order per subtask."""
        return AsyncDataStream._apply(
            stream, async_fn, schema, timeout_s, capacity, on_timeout,
            ordered=True,
        )
