"""User-facing accumulators — IntCounter / LongCounter / DoubleCounter
/ Histogram of the reference
(flink-core/.../api/common/accumulators/{IntCounter,LongCounter,
DoubleCounter,Histogram}.java; registered through
``RichFunction.getRuntimeContext().addAccumulator`` and read from the
``JobExecutionResult``).

Spark-first: each counter wraps a ``pyspark`` Accumulator (driver-
merged, executor-incremented — the exact execution model of the
reference's accumulator snapshots), and ``Histogram`` uses a custom
dict-merging ``AccumulatorParam``.  The counters' ``add`` methods are
plain picklable callables, so user functions running inside
``mapInPandas`` / UDFs / ``foreachPartition`` can increment them.

Semantics contract (pinned by tests/test_accumulators.py): these
counters are AT-LEAST-ONCE.  Updates from RE-EXECUTED tasks are
re-applied — a retried/speculative task, or a second action that
recomputes an uncached lineage, increments again.  (Spark guarantees
exactly-once only for internal accumulators inside actions; the
reference's ``Accumulator.java`` merges per-task snapshots on job
SUCCESS, so a restarted Flink job also re-counts from zero.)  Treat
values as job metrics, not transactional counts.

For exactly-once counts, route the increment through the job's own
dataflow instead of a side channel: :func:`metric_counts` computes
named predicates as ONE DataFrame aggregate, so the result is tied to
the action boundary and task retries/recomputation cannot double-count
— the same move as the reference's per-job accumulator snapshot merge,
expressed as a Spark aggregation.
"""

from __future__ import annotations

from pyspark import AccumulatorParam


class _DictSumParam(AccumulatorParam):
    """Merge histograms: per-key integer sum (Histogram.java:60
    ``add`` increments the value's bucket; merge sums buckets)."""

    def zero(self, value):
        return {}

    def addInPlace(self, v1, v2):
        for k, n in v2.items():
            v1[k] = v1.get(k, 0) + n
        return v1


class IntCounter:
    """IntCounter.java — ``add(n)``, ``get_local_value`` on the driver
    after an action."""

    def __init__(self, spark, initial: int = 0):
        self._acc = spark.sparkContext.accumulator(int(initial))

    def add(self, n: int = 1) -> None:
        self._acc.add(int(n))

    def get_local_value(self) -> int:
        return int(self._acc.value)


LongCounter = IntCounter  # LongCounter.java — same shape in Python


class DoubleCounter:
    """DoubleCounter.java."""

    def __init__(self, spark, initial: float = 0.0):
        self._acc = spark.sparkContext.accumulator(float(initial))

    def add(self, x: float) -> None:
        self._acc.add(float(x))

    def get_local_value(self) -> float:
        return float(self._acc.value)


class Histogram:
    """Histogram.java — integer-bucket counts; ``add(bucket)``."""

    def __init__(self, spark):
        self._acc = spark.sparkContext.accumulator({}, _DictSumParam())

    def add(self, bucket: int, n: int = 1) -> None:
        self._acc.add({int(bucket): int(n)})

    def get_local_value(self) -> dict:
        return dict(self._acc.value)


def metric_counts(df, predicates: dict) -> dict:
    """Exactly-once metric counting (the action-boundary alternative
    to the at-least-once counters above): ``predicates`` maps metric
    name -> Column/SQL-string predicate; returns ``{name: count}``
    computed as a single DataFrame aggregate.  Because the counts ARE
    the job's result (not a side-channel), task retries, speculation,
    and lineage recomputation can never double-count them."""
    from pyspark.sql import functions as F

    aggs = [
        F.count_if(F.expr(p) if isinstance(p, str) else p).alias(name)
        for name, p in predicates.items()
    ]
    row = df.agg(*aggs).collect()[0]
    return {name: row[name] for name in predicates}


class RuntimeContext:
    """The accumulator half of RuntimeContext.java:
    ``add_accumulator(name, acc)`` registers on the DRIVER and the
    registry doubles as the JobExecutionResult's
    ``getAccumulatorResult`` surface.

    Closure rule (differs from the reference, where the runtime
    injects the context into each RichFunction): capture the COUNTER
    OBJECTS in the user function — they wrap picklable Spark
    Accumulators — never the context itself, which holds the
    SparkSession and cannot ship to executors (it refuses pickling
    loudly)."""

    def __init__(self, spark):
        self._spark = spark
        self._accs: dict = {}

    def __getstate__(self):
        raise TypeError(
            "RuntimeContext holds the SparkSession and cannot be "
            "shipped to executors — capture the counter objects "
            "(IntCounter/DoubleCounter/Histogram) in the user "
            "function instead; they pickle and merge on the driver"
        )

    def add_accumulator(self, name: str, acc) -> None:
        if name in self._accs:
            raise ValueError(
                f"accumulator {name!r} already registered "
                "(RuntimeContext.addAccumulator throws on duplicates)"
            )
        self._accs[name] = acc

    def get_accumulator(self, name: str):
        return self._accs[name]

    def get_accumulator_result(self, name: str):
        """JobExecutionResult.getAccumulatorResult — the driver-side
        merged value after an action has run."""
        return self._accs[name].get_local_value()

    # convenience constructors (the reference's counters are built by
    # the user then registered; here the context owns the SparkContext
    # handle, so offer both spellings)
    def int_counter(self, name: str) -> IntCounter:
        acc = IntCounter(self._spark)
        self.add_accumulator(name, acc)
        return acc

    def double_counter(self, name: str) -> DoubleCounter:
        acc = DoubleCounter(self._spark)
        self.add_accumulator(name, acc)
        return acc

    def histogram(self, name: str) -> Histogram:
        acc = Histogram(self._spark)
        self.add_accumulator(name, acc)
        return acc
