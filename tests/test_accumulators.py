"""Accumulators (accumulators.py) — IntCounter/DoubleCounter/Histogram
+ RuntimeContext registration (flink-core/.../accumulators/*.java,
RuntimeContext.addAccumulator, JobExecutionResult.getAccumulatorResult):
executor-side increments from inside mapInPandas merge on the driver
after the action."""

from __future__ import annotations

import pytest

from flink_1_8_sourcecode_spark.accumulators import (
    DoubleCounter,
    Histogram,
    IntCounter,
    LongCounter,
    RuntimeContext,
)


def test_counters_accumulate_from_executors(spark):
    ctx = RuntimeContext(spark)
    rows = ctx.int_counter("rows")
    vsum = ctx.double_counter("vsum")

    def count_rows(batches):
        for pdf in batches:
            rows.add(len(pdf))
            vsum.add(float(pdf["v"].sum()))
            yield pdf

    df = spark.range(100).selectExpr("id as v").repartition(4)
    out = df.mapInPandas(count_rows, "v long")
    assert out.count() == 100  # the action that runs the increments
    assert ctx.get_accumulator_result("rows") == 100
    assert ctx.get_accumulator_result("vsum") == float(sum(range(100)))


def test_histogram_merges_buckets(spark):
    ctx = RuntimeContext(spark)
    hist = ctx.histogram("mod3")

    def bucketize(batches):
        for pdf in batches:
            for v in pdf["v"]:
                hist.add(int(v) % 3)
            yield pdf

    df = spark.range(99).selectExpr("id as v").repartition(3)
    df.mapInPandas(bucketize, "v long").count()
    assert ctx.get_accumulator_result("mod3") == {0: 33, 1: 33, 2: 33}


def test_duplicate_registration_refused(spark):
    ctx = RuntimeContext(spark)
    ctx.add_accumulator("a", IntCounter(spark))
    with pytest.raises(ValueError, match="already registered"):
        ctx.add_accumulator("a", IntCounter(spark))
    assert LongCounter is IntCounter
    # standalone counters work without a context
    c = DoubleCounter(spark, initial=1.5)
    c.add(2.5)
    assert c.get_local_value() == 4.0


def test_context_refuses_shipping(spark):
    import pickle

    ctx = RuntimeContext(spark)
    with pytest.raises(TypeError, match="capture the counter objects"):
        pickle.dumps(ctx)


class TestRetrySemantics:
    """Pin the accumulator consistency contract (r15 verdict task 5):
    raw counters are AT-LEAST-ONCE under task re-execution — the same
    mechanism behind retries, speculation, and lineage recompute —
    while metric_counts is exactly-once because the counts travel
    through the action boundary (ref Accumulator.java merges per-task
    snapshots on job success; Spark's external accumulators do not)."""

    def _counted_df(self, spark, counter):
        import pandas as pd

        def tag(batches):
            for pdf in batches:
                counter.add(len(pdf))
                yield pdf

        return (
            spark.range(100)
            .repartition(4)
            .mapInPandas(tag, "id long")
        )

    def test_recomputation_double_counts_raw_counter(self, spark):
        c = IntCounter(spark)
        df = self._counted_df(spark, c)
        assert df.count() == 100
        first = c.get_local_value()
        assert first == 100
        # an uncached lineage re-executes the tasks: the side-channel
        # counter increments AGAIN — at-least-once, by contract
        assert df.count() == 100
        assert c.get_local_value() == 2 * first

    def test_cache_bounds_reexecution(self, spark):
        c = IntCounter(spark)
        df = self._counted_df(spark, c).persist()
        try:
            df.count()
            once = c.get_local_value()
            assert once == 100
            # cached partitions are not recomputed -> no re-increment
            df.count()
            assert c.get_local_value() == once
        finally:
            df.unpersist()

    def test_metric_counts_exactly_once(self, spark):
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.accumulators import metric_counts

        df = spark.range(100).select(
            F.col("id"), (F.col("id") % 2 == 0).alias("even")
        )
        for _ in range(2):  # repeated actions never inflate the counts
            got = metric_counts(
                df, {"evens": "even", "big": F.col("id") >= 90}
            )
            assert got == {"evens": 50, "big": 10}
