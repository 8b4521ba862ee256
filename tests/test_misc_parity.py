"""Miscellaneous parity tests: dynamic session gap (§2.7), type matrix
(§1.1), RichFunction context idioms (§2.12 — broadcast vars +
accumulators), Avro format availability (§2.1)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from tests.conftest import SF_SMALL


def test_dynamic_session_gap(spark):
    """DynamicEventTimeSessionWindows: gap as an expression per row."""
    ev = table(spark, SF_SMALL, "events")
    gap = F.when(F.col("event_type") == "error", F.lit("5 minutes")).otherwise(
        F.lit("15 minutes")
    )
    out = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    assert out.count() > 0
    # windows never overlap per key
    pdf = out.select("user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e")).toPandas()
    for _u, grp in pdf.groupby("user_id"):
        g = grp.sort_values("s")
        assert (g.e.shift(1).dropna().values <= g.s.iloc[1:].values).all()


def test_type_matrix_roundtrip(spark, tmp_path):
    """§1.1 mapping: every Flink BasicTypeInfo target type survives a
    parquet write/read with schema intact."""
    sql = """
    SELECT CAST('s' AS STRING) c_string, CAST(1 AS BOOLEAN) c_bool,
           CAST(1 AS TINYINT) c_byte, CAST(1 AS SMALLINT) c_short,
           CAST(1 AS INT) c_int, CAST(1 AS BIGINT) c_long,
           CAST(1.5 AS FLOAT) c_float, CAST(1.5 AS DOUBLE) c_double,
           CAST('2024-01-01' AS DATE) c_date,
           CAST('2024-01-01 10:00:00' AS TIMESTAMP) c_ts,
           CAST(1.23 AS DECIMAL(38, 18)) c_dec,
           ARRAY(1, 2) c_arr, MAP('k', 1) c_map,
           NAMED_STRUCT('a', 1, 'b', 's') c_row,
           CAST(INTERVAL '3' DAY AS STRING) c_interval_str
    """
    df = spark.sql(sql)
    path = str(tmp_path / "types")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    # nullability (incl. nested containsNull) loosens through parquet;
    # names + types must survive
    assert [(f.name, f.dataType.simpleString()) for f in back.schema] == [
        (f.name, f.dataType.simpleString()) for f in df.schema
    ]
    assert back.count() == 1


def test_broadcast_variable_idiom(spark):
    """RuntimeContext.getBroadcastVariable parity: a driver-side dict
    broadcast into a pandas UDF."""
    from pyspark.sql.functions import pandas_udf

    seg_rank = spark.sparkContext.broadcast(
        {"AUTOMOBILE": 1, "BUILDING": 2, "FURNITURE": 3, "HOUSEHOLD": 4, "MACHINERY": 5}
    )

    @pandas_udf("int")
    def rank_of(seg: pd.Series) -> pd.Series:
        return seg.map(seg_rank.value).astype("int32")

    c = table(spark, SF_SMALL, "customer")
    out = c.select(rank_of("c_mktsegment").alias("r"))
    assert out.filter(F.col("r").between(1, 5)).count() == c.count()


def test_accumulator_idiom(spark):
    """RuntimeContext counters parity: accumulator counts processed rows."""
    acc = spark.sparkContext.accumulator(0)
    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey")

    def count_rows(it):
        for row in it:
            acc.add(1)
            yield row

    n = li.rdd.mapPartitions(count_rows).count()
    assert acc.value == n


def test_avro_format_availability(spark, tmp_path):
    """Avro parity (AvroRowDeserializationSchema): spark-avro is an
    external package; verify and document whichever way it lands."""
    df = table(spark, SF_SMALL, "nation")
    try:
        df.write.mode("overwrite").format("avro").save(str(tmp_path / "avro"))
    except Exception as e:
        pytest.skip(f"spark-avro not bundled in this env (expected): {type(e).__name__}")
    back = spark.read.format("avro").load(str(tmp_path / "avro"))
    assert back.count() == df.count()


class TestDistributedCache:
    """registerCachedFile (ExecutionEnvironment.java:859) +
    RuntimeContext.getDistributedCache().getFile — a side file shipped
    to every worker and resolved INSIDE a pandas UDF
    (distributed_cache.py: addFile with the logical name as the
    physical basename, so SparkFiles.get needs no shared registry)."""

    def test_lookup_file_inside_pandas_udf(self, spark, tmp_path):
        import json

        from flink_1_8_sourcecode_spark.dataset_api import (
            ExecutionEnvironment,
        )

        lookup = tmp_path / "seg.json"
        lookup.write_text(json.dumps({"1": "gold", "2": "silver"}))
        env = ExecutionEnvironment(spark)
        env.register_cached_file(str(lookup), "seg_lookup.json")

        def enrich(batches):
            import json as _json

            import pandas as pd

            from flink_1_8_sourcecode_spark.distributed_cache import (
                get_cached_file,
            )

            with open(get_cached_file("seg_lookup.json")) as f:
                seg = _json.load(f)
            for pdf in batches:
                yield pd.DataFrame(
                    {"k": pdf["k"],
                     "seg": pdf["k"].astype(str).map(seg).fillna("?")}
                )

        ds = env.from_collection([(1,), (2,), (3,)], "k int")
        got = sorted(
            map(tuple, ds.map_partition(enrich, "k int, seg string")
                .df.collect())
        )
        assert got == [(1, "gold"), (2, "silver"), (3, "?")]

    def test_driver_side_get(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.distributed_cache import (
            get_cached_file,
            register_cached_file,
        )

        p = tmp_path / "w.txt"
        p.write_text("42")
        register_cached_file(spark, str(p), "weights.txt")
        with open(get_cached_file("weights.txt")) as f:
            assert f.read() == "42"

    def test_guards(self, spark, tmp_path):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.distributed_cache import (
            get_cached_file,
            register_cached_file,
        )

        with _pytest.raises(ValueError, match="plain filename"):
            register_cached_file(spark, "x", "../evil")
        with _pytest.raises(FileNotFoundError, match="no such file"):
            register_cached_file(spark, str(tmp_path / "nope"), "a.txt")
        with _pytest.raises(FileNotFoundError, match="never registered"):
            get_cached_file("never_was_registered.bin")
