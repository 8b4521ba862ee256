"""Batch source/sink round-trip tests (SURVEY.md §2.1/§2.2 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.sources import io
from tests.conftest import SF_SMALL


def test_csv_roundtrip(spark, tmp_path):
    li = table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "li_csv")
    io.write_csv(li, path, sep="|")
    back = io.read_csv(
        spark, path,
        "l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string",
        sep="|",
    )
    assert back.count() == li.count()
    assert back.schema == li.schema
    a = li.agg(F.sum("l_quantity")).first()[0]
    b = back.agg(F.sum("l_quantity")).first()[0]
    assert abs(a - b) < 1e-6


def test_text_roundtrip(spark, tmp_path):
    d = table(spark, SF_SMALL, "documents").select(F.col("text").alias("value"))
    path = str(tmp_path / "docs_txt")
    io.write_text(d, path)
    back = io.read_text(spark, path)
    assert back.count() == d.count()


def test_json_lines_with_schema(spark, tmp_path):
    ev = table(spark, SF_SMALL, "events").select("event_id", "user_id", "event_type", "value")
    path = str(tmp_path / "ev_json")
    ev.write.mode("overwrite").json(path)
    back = io.read_json_lines(
        spark, path, "event_id long, user_id long, event_type string, value double"
    )
    assert back.count() == ev.count()
    assert set(back.columns) == set(ev.columns)


def test_json_column_extraction(spark):
    ev = table(spark, SF_SMALL, "events")
    parsed = ev.select(io.json_column(F.col("props"), "k int").alias("p")).select("p.k")
    assert parsed.filter(F.col("k").isNotNull()).count() == ev.count()


def test_orc_roundtrip(spark, tmp_path):
    # OrcTableSource parity (flink-connectors/flink-orc) — native in Spark.
    o = table(spark, SF_SMALL, "orders")
    path = str(tmp_path / "orders_orc")
    o.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == o.count()
    assert set(back.columns) == set(o.columns)


def test_from_elements_and_sequence(spark):
    df = io.from_elements(spark, [(1, "a"), (2, "b")], "x int, s string")
    assert df.count() == 2
    seq = io.generate_sequence(spark, 1, 10)
    assert seq.count() == 10  # inclusive bounds, Flink semantics
    assert seq.agg(F.sum("id")).first()[0] == 55


class TestJdbc:
    """flink-jdbc parity smoke tests against the Derby driver bundled
    with Spark (in-memory database, no external service)."""

    URL = "jdbc:derby:memory:flink18test;create=true"
    DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

    @pytest.fixture(autouse=True)
    def _needs_derby(self, spark):
        import glob
        import os

        spark_home = os.environ.get("SPARK_HOME", "/opt/spark")
        if not glob.glob(os.path.join(spark_home, "jars", "derby-*.jar")):
            pytest.skip("no Derby JDBC driver on the Spark classpath")

    def test_jdbc_roundtrip_and_partitioned_read(self, spark):
        from flink_1_8_sourcecode_spark.sources.jdbc import jdbc_input, jdbc_output

        df = spark.range(100).selectExpr("id", "id * 2 AS doubled")
        jdbc_output(df, self.URL, "t_roundtrip", mode="overwrite", driver=self.DRIVER)

        plain = jdbc_input(spark, self.URL, "t_roundtrip", driver=self.DRIVER)
        assert plain.count() == 100
        assert plain.agg({"doubled": "sum"}).first()[0] == sum(2 * i for i in range(100))

        split = jdbc_input(
            spark, self.URL, "t_roundtrip", driver=self.DRIVER,
            partition_column="id", lower_bound=0, upper_bound=100, num_partitions=4,
        )
        assert split.rdd.getNumPartitions() == 4
        assert split.count() == 100

    def test_jdbc_predicate_splits(self, spark):
        from flink_1_8_sourcecode_spark.sources.jdbc import jdbc_input, jdbc_output

        df = spark.range(50).selectExpr("id", "id % 2 AS parity")
        jdbc_output(df, self.URL, "t_pred", mode="overwrite", driver=self.DRIVER)
        out = jdbc_input(
            spark, self.URL, "t_pred", driver=self.DRIVER,
            predicates=['"parity" = 0', '"parity" = 1'],  # Derby folds unquoted idents to upper-case
        )
        assert out.rdd.getNumPartitions() == 2
        assert out.count() == 50


def test_read_input_format_generic(spark, tmp_path):
    """createInput(InputFormat) parity: the format registry stands in
    for user InputFormats; declared schema is applied, not inferred."""
    from flink_1_8_sourcecode_spark.sources import io

    li = table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "fmt_parquet")
    li.write.parquet(path)
    back = io.read_input_format(spark, "parquet", path, schema="l_orderkey long, l_quantity double")
    assert back.count() == li.count()
    assert [f.name for f in back.schema.fields] == ["l_orderkey", "l_quantity"]


def test_add_source_split_parallel(spark):
    """addSource (bounded SourceFunction): generate() runs once per
    split, distributed."""
    from flink_1_8_sourcecode_spark.sources import io

    def gen(pid, n):
        # 10 rows per split, values encode the split id
        return [(pid * 10 + i, f"s{pid}") for i in range(10)]

    out = io.add_source(spark, gen, "v long, tag string", num_partitions=4).toPandas()
    assert len(out) == 40
    assert sorted(out.tag.unique()) == ["s0", "s1", "s2", "s3"]
    assert sorted(out.v) == list(range(40))


def test_catalog_schema_probe(spark):
    """Fail fast, with a readable message, if the driver regenerates the
    testdata with a different shape (the round-4 regression: events.ts
    flipped parquet TIMESTAMP(NANOS) -> TIMESTAMP(MICROS) and an
    unconditional conversion broke every events read)."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from flink_1_8_sourcecode_spark.catalog import TABLES, table

    sf = "/root/testdata/sf0.001"
    for name in TABLES:
        df = table(spark, sf, name)
        assert df.limit(1).count() >= 0, f"{name}: does not load"
    ev = table(spark, sf, "events")
    ts_type = ev.schema["ts"].dataType
    assert isinstance(ts_type, (TimestampType, TimestampNTZType)), (
        f"events.ts must load as a timestamp, got {ts_type.simpleString()} — "
        "check _read_events in catalog.py against the current parquet dtype"
    )
    assert ev.filter(F.col("ts").isNull()).limit(1).count() == 0
