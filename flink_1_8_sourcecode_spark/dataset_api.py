"""Fluent DataSet-API facade — the reference's PRIMARY batch entry
point, so a Flink user's first lines port verbatim-ish.

Reference parity (flink-java/.../api/java/):
- ExecutionEnvironment.java:  getExecutionEnvironment :1137,
  fromCollection :808, fromElements :870, readTextFile :521,
  readCsvFile (CsvReader), generateSequence :916
- DataSet.java: map :210, flatMap :260, mapPartition :237,
  filter :287, project :314, distinct :620, groupBy :694/710,
  join :744 (JoinOperatorSets.where/equalTo), coGroup :894,
  cross :940, union :1212, first :567, aggregate/sum/min/max
  :468-540, sortPartition :1401, partitionByHash :1257,
  partitionByRange :1297, rebalance :1385, count/collect :406/418,
  writeAsText :1354, writeAsCsv :1372
- DataSetUtils.java: zipWithIndex :89, zipWithUniqueId :132

Spark-first stance: every fluent call lowers DIRECTLY to DataFrame
operations (Catalyst sees the whole plan; pushdown/codegen apply
unchanged).  ``map``/``filter`` take Column expressions — the JVM fast
path; the reference's opaque-lambda forms route through the explicit
``map_partition(fn, schema)`` escape hatch (Arrow-batched, documented
slow path), never silently.  Field references accept Flink's tuple
POSITIONS (ints) or column names everywhere.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.session import get_spark
from flink_1_8_sourcecode_spark.sources import io as _io


class ExecutionEnvironment:
    """ExecutionEnvironment.java:1137 — the batch entry point."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    @classmethod
    def get_execution_environment(
        cls, spark: SparkSession | None = None
    ) -> "ExecutionEnvironment":
        return cls(spark)

    def from_collection(self, data: Iterable, schema) -> "DataSet":
        """fromCollection :808."""
        return DataSet(_io.from_elements(self.spark, data, schema))

    def from_elements(self, *elements, schema) -> "DataSet":
        """fromElements :870."""
        return DataSet(_io.from_elements(self.spark, list(elements), schema))

    def read_text_file(self, path: str) -> "DataSet":
        """readTextFile :521 — one string column ``value``."""
        return DataSet(_io.read_text(self.spark, path))

    def read_csv_file(self, path: str, schema=None, **options) -> "DataSet":
        """readCsvFile (CsvReader parity)."""
        return DataSet(_io.read_csv(self.spark, path, schema=schema, **options))

    def generate_sequence(self, start: int, end: int) -> "DataSet":
        """generateSequence :916 — inclusive [start, end]."""
        return DataSet(_io.generate_sequence(self.spark, start, end))

    def register_cached_file(self, file_path: str, name: str) -> None:
        """registerCachedFile :859 — ship a side file to every worker;
        read it back anywhere (driver or pandas UDF) with
        ``distributed_cache.get_cached_file(name)`` — the
        RuntimeContext.getDistributedCache().getFile mapping."""
        from flink_1_8_sourcecode_spark.distributed_cache import (
            register_cached_file,
        )

        register_cached_file(self.spark, file_path, name)


def _col(df: DataFrame, f) -> Column:
    """Field reference: Flink tuple position (int), name, or Column."""
    if isinstance(f, Column):
        return f
    if isinstance(f, int):
        return F.col(df.columns[f])
    return F.col(f)


def _name(df: DataFrame, f) -> str:
    if isinstance(f, int):
        return df.columns[f]
    if isinstance(f, str):
        return f
    raise TypeError(f"expected a field position or name, got {f!r}")


class DataSet:
    """Fluent wrapper over a DataFrame (DataSet.java surface).
    ``.df`` is always available — nothing is hidden from Catalyst."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- row-level ----------------------------------------------------
    def map(self, *cols: Column) -> "DataSet":
        """map :210 — JVM-side select expressions (the fast path; an
        opaque Python MapFunction belongs in map_partition)."""
        return DataSet(self.df.select(*cols))

    def flat_map(self, *cols) -> "DataSet":
        """flatMap :260 — pass-through columns plus one exploded
        array/map Column (1->N)."""
        return DataSet(self.df.select(*cols))

    def map_partition(self, fn, schema) -> "DataSet":
        """mapPartition :237 — Arrow-batched per-partition iterator
        (MapPartitionFunction parity; the documented Python path)."""
        return DataSet(self.df.mapInPandas(fn, schema))

    def filter(self, predicate) -> "DataSet":
        """filter :287 — Column predicate or SQL string."""
        return DataSet(self.df.filter(predicate))

    def project(self, *fields) -> "DataSet":
        """project :314 — positional tuple projection."""
        return DataSet(self.df.select(*[_col(self.df, f) for f in fields]))

    # --- grouping / aggregates ---------------------------------------
    def group_by(self, *keys) -> "UnsortedGrouping":
        """groupBy :694 (positions) / :710 (names)."""
        return UnsortedGrouping(self.df, [_name(self.df, k) for k in keys])

    def aggregate(self, agg: str, field) -> "DataSet":
        """DataSet.aggregate :468 — global SUM/MIN/MAX."""
        return DataSet(self.df.agg(_AGGS[agg.upper()](_col(self.df, field)).alias(
            _name(self.df, field)
        )))

    def agg_fields(self, *specs) -> "DataSet":
        """Several (agg, field) pairs at once — the reference's chained
        ``sum(0).andMax(1)`` AggregateOperator form
        (AggregateOperator.java:115 ``and``), ungrouped."""
        cols = [
            _AGGS[a.upper()](_col(self.df, f)).alias(_name(self.df, f))
            for a, f in specs
        ]
        return DataSet(self.df.agg(*cols))

    def sum(self, field) -> "DataSet":
        return self.aggregate("SUM", field)

    def min(self, field) -> "DataSet":
        return self.aggregate("MIN", field)

    def max(self, field) -> "DataSet":
        return self.aggregate("MAX", field)

    # --- binary ops ---------------------------------------------------
    def join(self, other: "DataSet", hint: str | None = None) -> "JoinBuilder":
        """join :744 — fluent .where(...).equal_to(...); ``hint`` in
        (None, 'tiny', 'huge') mirrors joinWithTiny/joinWithHuge."""
        return JoinBuilder(self, other, "inner", hint)

    def left_outer_join(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "left")

    def right_outer_join(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "right")

    def full_outer_join(self, other: "DataSet") -> "JoinBuilder":
        return JoinBuilder(self, other, "full")

    def co_group(self, other: "DataSet") -> "CoGroupBuilder":
        """coGroup :894."""
        return CoGroupBuilder(self, other)

    def cross(self, other: "DataSet") -> "DataSet":
        """cross :940."""
        return DataSet(self.df.crossJoin(other.df))

    def cross_with_tiny(self, other: "DataSet") -> "DataSet":
        from flink_1_8_sourcecode_spark.operators.joins import cross_with_tiny

        return DataSet(cross_with_tiny(self.df, other.df))

    def cross_with_huge(self, other: "DataSet") -> "DataSet":
        from flink_1_8_sourcecode_spark.operators.joins import cross_with_huge

        return DataSet(cross_with_huge(self.df, other.df))

    def union(self, other: "DataSet") -> "DataSet":
        """union :1212 — keeps duplicates (Flink union = UNION ALL)."""
        return DataSet(self.df.unionByName(other.df))

    def distinct(self, *keys) -> "DataSet":
        """distinct :620 — whole-row, or by key fields."""
        if not keys:
            return DataSet(self.df.distinct())
        names = [_name(self.df, k) for k in keys]
        return DataSet(self.df.dropDuplicates(names))

    # --- order / partitioning ----------------------------------------
    def sort_partition(self, field, order: str = "ASC") -> "DataSet":
        """sortPartition :1401 — per-partition local sort."""
        c = _col(self.df, field)
        return DataSet(
            self.df.sortWithinPartitions(c.desc() if order.upper() == "DESC" else c.asc())
        )

    def partition_by_hash(self, *keys) -> "DataSet":
        """partitionByHash :1257."""
        return DataSet(self.df.repartition(*[_col(self.df, k) for k in keys]))

    def partition_by_range(self, *keys) -> "DataSet":
        """partitionByRange :1297."""
        return DataSet(self.df.repartitionByRange(*[_col(self.df, k) for k in keys]))

    def rebalance(self, n: int | None = None) -> "DataSet":
        """rebalance :1385 — round-robin redistribution."""
        return DataSet(
            self.df.repartition(n)
            if n
            else self.df.repartition(self.df.sparkSession.sparkContext.defaultParallelism)
        )

    def first(self, n: int) -> "DataSet":
        """first :567."""
        return DataSet(self.df.limit(n))

    # --- iterations ---------------------------------------------------
    def iterate(self, max_iterations: int) -> "IterativeDataSet":
        """Bulk BSP iteration — DataSet.iterate (DataSet.java:1156).
        The reference returns an IterativeDataSet handle that the body
        transforms and ``closeWith(result[, termination])`` closes; here
        the body is a callable (the driver loop re-executes it each
        superstep): ``ds.iterate(10).close_with(lambda d: step(d))``.
        Lowers to operators/iterations.py:iterate — each superstep is a
        full distributed Catalyst plan, lineage truncated periodically."""
        return IterativeDataSet(self.df, max_iterations)

    def iterate_delta(
        self, workset: "DataSet", max_iterations: int, *key_fields
    ) -> "DeltaIteration":
        """Delta/workset iteration — DataSet.iterateDelta
        (DataSet.java:1206): ``self`` is the initial solution set,
        ``workset`` the initial workset, ``key_fields`` the solution-set
        keys (Flink's keyPositions — ints or names).  Close with
        ``close_with(lambda solution, workset: (delta, next_workset))``.
        Only CHANGED elements flow through the per-superstep shuffle
        (operators/iterations.py:iterate_delta)."""
        keys = [_name(self.df, k) for k in (key_fields or ("id",))]
        return DeltaIteration(self.df, workset.df, max_iterations, keys)

    def zip_with_index(self, order_by: list[str] | None = None) -> "DataSet":
        """DataSetUtils.zipWithIndex :89 — consecutive 0..n-1 via the
        two-pass distributed assignment (never a global window)."""
        from flink_1_8_sourcecode_spark.operators.partitioning import zip_with_index

        return DataSet(
            zip_with_index(self.df, order_by or list(self.df.columns), id_col="index")
        )

    def zip_with_unique_id(self) -> "DataSet":
        """DataSetUtils.zipWithUniqueId :132 — unique, not consecutive."""
        return DataSet(self.df.withColumn("unique_id", F.monotonically_increasing_id()))

    # --- actions / sinks ---------------------------------------------
    def count(self) -> int:
        return self.df.count()

    def collect(self) -> list:
        return self.df.collect()

    def write_as_text(self, path: str, mode: str = "overwrite") -> None:
        _io.write_text(self.df, path, mode)

    def write_as_csv(self, path: str, mode: str = "overwrite", **options) -> None:
        _io.write_csv(self.df, path, mode, **options)


class IterativeDataSet:
    """DataSet.iterate handle (IterativeDataSet.java): close_with runs
    the superstep loop and returns the converged DataSet."""

    def __init__(self, df: DataFrame, max_iterations: int):
        if max_iterations <= 0:
            raise ValueError(f"max_iterations must be positive, got {max_iterations}")
        self._df = df
        self._max = max_iterations

    def close_with(
        self,
        step,
        termination=None,
        checkpoint_every: int = 3,
        checkpoint_dir: str | None = None,
    ) -> DataSet:
        """IterativeDataSet.closeWith(result[, terminationCriterion])
        (IterativeDataSet.java:98): ``step(DataSet) -> DataSet`` is the
        loop body; optional ``termination(prev, cur) -> bool`` (both
        DataSets) ends early — the reference's convention of a
        termination-criterion set that, when EMPTY, stops the loop, is
        expressed directly as the predicate (aggregate-based, never a
        collect)."""
        from flink_1_8_sourcecode_spark.operators.iterations import iterate

        conv = None
        if termination is not None:
            conv = lambda prev, cur: termination(DataSet(prev), DataSet(cur))  # noqa: E731
        return DataSet(
            iterate(
                self._df,
                lambda df, _i: step(DataSet(df)).df,
                self._max,
                has_converged=conv,
                checkpoint_every=checkpoint_every,
                checkpoint_dir=checkpoint_dir,
            )
        )

    closeWith = close_with


class DeltaIteration:
    """DataSet.iterateDelta handle (DeltaIteration.java): close_with
    runs the workset loop and returns the final solution set."""

    def __init__(
        self, solution: DataFrame, workset: DataFrame, max_iterations: int,
        keys: list[str],
    ):
        if max_iterations <= 0:
            raise ValueError(f"max_iterations must be positive, got {max_iterations}")
        self._solution = solution
        self._workset = workset
        self._max = max_iterations
        self._keys = keys

    def close_with(
        self,
        step,
        checkpoint_every: int = 3,
        checkpoint_dir: str | None = None,
    ) -> DataSet:
        """DeltaIteration.closeWith(solutionSetDelta, newWorkset)
        (DeltaIteration.java:117): ``step(solution, workset) ->
        (delta, next_workset)`` over DataSets; the delta upserts into
        the solution set on the iteration keys, the loop ends when the
        workset empties or max_iterations hit."""
        from flink_1_8_sourcecode_spark.operators.iterations import iterate_delta

        def _step(sol: DataFrame, ws: DataFrame, _i: int):
            delta, nxt = step(DataSet(sol), DataSet(ws))
            return delta.df, nxt.df

        return DataSet(
            iterate_delta(
                self._solution,
                self._workset,
                _step,
                self._max,
                key=self._keys,
                checkpoint_every=checkpoint_every,
                checkpoint_dir=checkpoint_dir,
            )
        )

    closeWith = close_with


_AGGS = {"SUM": F.sum, "MIN": F.min, "MAX": F.max}


class UnsortedGrouping:
    """groupBy result (UnsortedGrouping.java): field aggregates,
    reduceGroup, sortGroup+first."""

    def __init__(self, df: DataFrame, keys: list[str]):
        self._df = df
        self._keys = keys
        self._sort: list[Column] = []
        self._sort_spec: list[tuple[str, bool]] = []

    def aggregate(self, agg: str, field) -> DataSet:
        """UnsortedGrouping.aggregate — SUM/MIN/MAX of one field,
        grouped.  Chainable via and_agg on the returned frame is not
        needed: pass several to agg_fields."""
        return self.agg_fields((agg, field))

    def agg_fields(self, *specs) -> DataSet:
        """Several (agg, field) pairs at once — the chained
        .aggregate(...).and(...) form of the reference."""
        cols = [
            _AGGS[a.upper()](_col(self._df, f)).alias(_name(self._df, f))
            for a, f in specs
        ]
        return DataSet(self._df.groupBy(*self._keys).agg(*cols))

    def sum(self, field) -> DataSet:
        return self.aggregate("SUM", field)

    def min(self, field) -> DataSet:
        return self.aggregate("MIN", field)

    def max(self, field) -> DataSet:
        return self.aggregate("MAX", field)

    def count(self) -> DataSet:
        return DataSet(
            self._df.groupBy(*self._keys).agg(F.count(F.lit(1)).alias("count"))
        )

    def min_by(self, field) -> DataSet:
        """minBy — the whole row holding the group's minimum field
        (SelectByMinFunction parity; deterministic via struct order)."""
        return self._select_by(field, asc=True)

    def max_by(self, field) -> DataSet:
        return self._select_by(field, asc=False)

    def _select_by(self, field, asc: bool) -> DataSet:
        from pyspark.sql import Window

        c = _col(self._df, field)
        w = Window.partitionBy(*self._keys).orderBy(
            c.asc() if asc else c.desc(),
            # full-row struct tiebreak = deterministic winner
            F.struct(*[F.col(x) for x in self._df.columns]).asc(),
        )
        return DataSet(
            self._df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def sort_group(self, field, order: str = "ASC") -> "UnsortedGrouping":
        """sortGroup — orders rows within each group for first(n) /
        reduce_group."""
        c = _col(self._df, field)
        asc = order.upper() != "DESC"
        g = UnsortedGrouping(self._df, self._keys)
        g._sort = self._sort + [c.asc() if asc else c.desc()]
        # name/direction form for the pandas (reduce_group) path
        g._sort_spec = getattr(self, "_sort_spec", []) + [
            (_name(self._df, field), asc)
        ]
        return g

    def first(self, n: int) -> DataSet:
        """GroupedDataSet.first(n) — n rows per group in sortGroup
        order (arrival order is nondeterministic in both engines, so an
        explicit sort_group is required for reproducibility)."""
        from pyspark.sql import Window

        order = self._sort or [
            F.struct(*[F.col(x) for x in self._df.columns]).asc()
        ]
        w = Window.partitionBy(*self._keys).orderBy(*order)
        return DataSet(
            self._df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__rn")
        )

    def reduce_group(self, fn, schema) -> DataSet:
        """reduceGroup(GroupReduceFunction) — one pandas frame per
        group via applyInPandas (Arrow-batched; the Python path,
        loudly).  After ``sort_group``, the frame arrives SORTED — the
        reference's sortGroup().reduceGroup() contract
        (GroupReduceITCase sorted-group rows): Spark gives no
        within-group order through applyInPandas, so the wrapper sorts
        the pandas frame on the declared fields first."""
        spec = getattr(self, "_sort_spec", [])
        if spec:
            names = [n for n, _ in spec]
            ascs = [a for _, a in spec]

            def sorted_fn(pdf):
                return fn(
                    pdf.sort_values(names, ascending=ascs, kind="stable")
                    .reset_index(drop=True)
                )

            return DataSet(
                self._df.groupBy(*self._keys).applyInPandas(sorted_fn, schema)
            )
        return DataSet(self._df.groupBy(*self._keys).applyInPandas(fn, schema))

    def reduce(self, fn) -> DataSet:
        """reduce(ReduceFunction) (UnsortedGrouping.java:160 /
        ReduceITCase rows): pairwise-fold each group to ONE row of the
        INPUT schema — ``fn(acc: dict, row: dict) -> dict``.  Like the
        reference, fold order within a group is unspecified; a
        ReduceFunction must be associative/commutative to be
        deterministic.  Python path (per-group fold inside
        applyInPandas); associative ARITHMETIC belongs in agg_fields,
        which stays JVM-side."""
        import pandas as pd

        cols = list(self._df.columns)
        schema = self._df.schema

        def fold(pdf):
            rows = pdf.to_dict("records")
            acc = rows[0]
            for r in rows[1:]:
                acc = fn(acc, r)
            return pd.DataFrame([acc], columns=cols)

        return DataSet(
            self._df.groupBy(*self._keys).applyInPandas(fold, schema)
        )


class JoinBuilder:
    """DataSet.join(...).where(keys).equal_to(keys) — JoinOperatorSets
    parity; the hint maps to broadcast() on the tiny side."""

    def __init__(self, left: DataSet, right: DataSet, how: str, hint: str | None = None):
        self._l = left
        self._r = right
        self._how = how
        self._hint = hint
        self._where: list | None = None

    def where(self, *keys) -> "JoinBuilder":
        self._where = list(keys)
        return self

    def equal_to(self, *keys) -> DataSet:
        if self._where is None or len(self._where) != len(keys):
            raise ValueError(
                "join: .where(k...) must precede .equal_to(k...) with the "
                "same number of keys"
            )
        ldf, rdf = self._l.df, self._r.df
        if self._hint == "tiny":
            rdf = F.broadcast(rdf)
        elif self._hint == "huge":
            ldf = F.broadcast(ldf)
        cond = None
        for lk, rk in zip(self._where, keys):
            c = _col(self._l.df, lk) == _col(self._r.df, rk)
            cond = c if cond is None else (cond & c)
        return DataSet(ldf.join(rdf, cond, self._how))


class CoGroupBuilder:
    """DataSet.coGroup(...).where(...).equal_to(...).apply(fn, schema)
    — CoGroupFunction parity via cogroup(applyInPandas)."""

    def __init__(self, left: DataSet, right: DataSet):
        self._l = left
        self._r = right
        self._where: list | None = None
        self._equal: list | None = None

    def where(self, *keys) -> "CoGroupBuilder":
        self._where = list(keys)
        return self

    def equal_to(self, *keys) -> "CoGroupBuilder":
        self._equal = list(keys)
        return self

    def apply(self, fn, schema) -> DataSet:
        if not self._where or not self._equal or len(self._where) != len(self._equal):
            raise ValueError(
                "co_group: .where(k...).equal_to(k...) with matching key "
                "counts must precede .apply"
            )
        lnames = [_name(self._l.df, k) for k in self._where]
        rnames = [_name(self._r.df, k) for k in self._equal]
        lg = self._l.df.groupBy(*lnames)
        rg = self._r.df.groupBy(*rnames)
        return DataSet(lg.cogroup(rg).applyInPandas(fn, schema))
