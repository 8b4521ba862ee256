"""Descriptor / connect API (descriptors.py, engine.py:connect) —
TableEnvironment.scala:656 connect(ConnectorDescriptor),
descriptors/FileSystem.scala, OldCsv.scala, Schema.scala,
Rowtime.scala, ConnectTableDescriptor.scala:45/:59/:67.  Validation
errors mirror the reference's TableFactoryService-style fail-fast."""

from __future__ import annotations

import os

import pytest

from flink_1_8_sourcecode_spark.descriptors import (
    Csv,
    FileSystem,
    Json,
    OldCsv,
    Rowtime,
    Schema,
    ValidationException,
)
from flink_1_8_sourcecode_spark.engine import Engine


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "people.csv"
    p.write_text("1|alice|3.5\n2|bob|4.25\n3|carol|1.0\n")
    return str(p)


@pytest.fixture()
def env(spark):
    return Engine(spark)


class TestFileSystemCsvSource:
    def test_register_and_query(self, env, csv_path):
        (
            env.connect(FileSystem().path(csv_path))
            .with_format(
                OldCsv()
                .field("id", "INT")
                .field("name", "STRING")
                .field("score", "DOUBLE")
                .field_delimiter("|")
            )
            .with_schema(
                Schema()
                .field("id", "INT")
                .field("name", "STRING")
                .field("score", "DOUBLE")
            )
            .register_table_source("people")
        )
        got = env.sql(
            "SELECT name, score FROM people WHERE id > 1 ORDER BY id"
        ).collect()
        assert [(r["name"], r["score"]) for r in got] == [
            ("bob", 4.25), ("carol", 1.0)
        ]

    def test_schema_rename_from_origin(self, env, csv_path):
        (
            env.connect(FileSystem().path(csv_path))
            .with_format(
                OldCsv().field("a", "INT").field("b", "STRING")
                .field("c", "DOUBLE").field_delimiter("|")
            )
            .with_schema(
                Schema()
                .field("ident", "BIGINT").from_origin("a")
                .field("who", "STRING").from_origin("b")
            )
            .register_table_source("renamed")
        )
        df = env.table("renamed")
        assert df.columns == ["ident", "who"]
        assert df.schema["ident"].dataType.simpleString() == "bigint"
        assert df.count() == 3

    def test_ignore_first_line_and_parse_errors(self, env, tmp_path):
        p = tmp_path / "h.csv"
        p.write_text("id,name\n1,a\nbroken_row_no_comma_intfield\n2,b\n")
        (
            env.connect(FileSystem().path(str(p)))
            .with_format(
                OldCsv().field("id", "INT").field("name", "STRING")
                .ignore_first_line().ignore_parse_errors()
            )
            .with_schema(Schema().field("id", "INT").field("name", "STRING"))
            .register_table_source("hdr")
        )
        got = sorted((r["id"], r["name"]) for r in env.table("hdr").collect())
        assert got == [(1, "a"), (2, "b")]

    def test_proctime_column(self, env, csv_path):
        (
            env.connect(FileSystem().path(csv_path))
            .with_format(
                OldCsv().field("id", "INT").field("name", "STRING")
                .field("score", "DOUBLE").field_delimiter("|")
            )
            .with_schema(
                Schema().field("id", "INT").field("pt", "TIMESTAMP").proctime()
            )
            .register_table_source("with_pt")
        )
        row = env.table("with_pt").limit(1).collect()[0]
        assert row["pt"] is not None  # wall-clock attribute materialized


class TestJsonSource:
    def test_json_lines(self, env, tmp_path):
        p = tmp_path / "d.jsonl"
        p.write_text('{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\n')
        (
            env.connect(FileSystem().path(str(p)))
            .with_format(Json().derive_schema())
            .with_schema(Schema().field("k", "BIGINT").field("v", "STRING"))
            .register_table_source("jsrc")
        )
        got = sorted((r["k"], r["v"]) for r in env.table("jsrc").collect())
        assert got == [(1, "x"), (2, "y")]


class TestSink:
    def test_register_table_sink_roundtrip(self, env, spark, tmp_path):
        out = str(tmp_path / "out_csv")
        (
            env.connect(FileSystem().path(out))
            .with_format(
                Csv().field("a", "INT").field("b", "STRING")
                .field_delimiter(";")
            )
            .with_schema(Schema().field("a", "INT").field("b", "STRING"))
            .register_table_sink("csv_out")
        )
        env.insert_into(
            spark.createDataFrame([(1, "x"), (2, "y")], "a int, b string"),
            "csv_out",
        )
        got = sorted(map(tuple, env.read_sink("csv_out").collect()))
        assert got == [(1, "x"), (2, "y")]

    def test_source_and_sink(self, env, spark, tmp_path):
        out = str(tmp_path / "both")
        os.makedirs(out, exist_ok=True)
        chain = (
            env.connect(FileSystem().path(out))
            .with_format(Csv().field("a", "INT"))
            .with_schema(Schema().field("a", "INT"))
        )
        # empty dir: register sink first, write, then source resolves
        chain.register_table_sink("both_t")
        env.insert_into(spark.createDataFrame([(7,)], "a int"), "both_t")
        chain.register_table_source("both_t")
        assert [r["a"] for r in env.table("both_t").collect()] == [7]


class TestStreaming:
    def test_in_append_mode_builds_stream(self, env, tmp_path, csv_path):
        import shutil

        d = tmp_path / "stream_in"
        d.mkdir()
        shutil.copy(csv_path, d / "part1.csv")
        (
            env.connect(FileSystem().path(str(d)))
            .with_format(
                OldCsv().field("id", "INT").field("name", "STRING")
                .field("score", "DOUBLE").field_delimiter("|")
            )
            .with_schema(
                Schema()
                .field("id", "INT")
                .field("ts", "TIMESTAMP").proctime()
            )
            .in_append_mode()
            .register_table_source("s_src")
        )
        df = env.table("s_src")
        assert df.isStreaming
        q = (
            df.writeStream.format("memory").queryName("desc_probe")
            .outputMode("append").start()
        )
        try:
            q.processAllAvailable()
            got = env.spark.sql("SELECT id FROM desc_probe ORDER BY id").collect()
            assert [r["id"] for r in got] == [1, 2, 3]
        finally:
            q.stop()


class TestValidation:
    def test_missing_path(self, env):
        with pytest.raises(ValidationException, match="path"):
            env.connect(FileSystem()).with_format(
                OldCsv().field("a", "INT")
            ).with_schema(Schema().field("a", "INT")).register_table_source("x")

    def test_missing_format(self, env, csv_path):
        with pytest.raises(ValidationException, match="format"):
            env.connect(FileSystem().path(csv_path)).with_schema(
                Schema().field("a", "INT")
            ).register_table_source("x")

    def test_missing_schema(self, env, csv_path):
        with pytest.raises(ValidationException, match="schema"):
            env.connect(FileSystem().path(csv_path)).with_format(
                OldCsv().field("a", "INT")
            ).register_table_source("x")

    def test_csv_without_fields(self, env, csv_path):
        with pytest.raises(ValidationException, match="field"):
            env.connect(FileSystem().path(csv_path)).with_format(
                OldCsv()
            ).with_schema(Schema().field("a", "INT")).register_table_source("x")

    def test_bad_type_and_duplicates(self):
        with pytest.raises(ValidationException, match="unsupported field type"):
            Schema().field("a", "BLOB")
        with pytest.raises(ValidationException, match="duplicate"):
            Schema().field("a", "INT").field("a", "INT")
        with pytest.raises(ValidationException, match="declare a field"):
            Schema().proctime()
        with pytest.raises(ValidationException, match="timestamps_from_field"):
            Schema().field("t", "TIMESTAMP").rowtime(Rowtime())

    def test_unsupported_connector(self, env):
        class Fake:
            pass

        with pytest.raises(ValidationException, match="unsupported connector"):
            env.connect(Fake()).register_table_source("x")

    def test_time_field_is_int_millis(self, env, spark, tmp_path):
        # TIME convention (SURVEY §1.1): the descriptor reads the
        # lexical HH:MM:SS[.fff] and surfaces int millis since midnight
        d = str(tmp_path / "time_src")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part.csv"), "w") as f:
            f.write("1|12:34:56\n2|00:00:00.250\n3|23:59:59\n")
        (
            env.connect(FileSystem().path(d))
            .with_format(
                OldCsv().field("id", "BIGINT").field("t", "TIME")
                .field_delimiter("|")
            )
            .with_schema(Schema().field("id", "BIGINT").field("t", "TIME"))
            .register_table_source("time_tbl")
        )
        got = {r["id"]: r["t"] for r in env.table("time_tbl").collect()}
        assert got == {
            1: (12 * 3600 + 34 * 60 + 56) * 1000,
            2: 250,
            3: (23 * 3600 + 59 * 60 + 59) * 1000,
        }
        assert dict(env.table("time_tbl").dtypes)["t"] == "int"

    def test_time_field_roundtrips_through_sink(self, env, spark, tmp_path):
        # write side renders int-millis back to HH:mm:ss.SSS so a
        # TIME column survives insert -> scan unchanged
        from flink_1_8_sourcecode_spark.descriptors import (
            ExternalCatalogTable,
        )

        out = str(tmp_path / "time_rt")
        os.makedirs(out, exist_ok=True)
        tbl = (
            ExternalCatalogTable.builder(FileSystem().path(out))
            .with_format(
                OldCsv().field("id", "BIGINT").field("t", "TIME")
                .field_delimiter("|")
            )
            .with_schema(Schema().field("id", "BIGINT").field("t", "TIME"))
            .as_table_source()
        )
        millis = (12 * 3600 + 34 * 60 + 56) * 1000 + 250
        tbl.write(
            spark.createDataFrame([(1, millis), (2, 0)], "id long, t long")
        )
        got = {r["id"]: r["t"] for r in tbl.table(spark).collect()}
        assert got == {1: millis, 2: 0}

    def test_time_field_roundtrips_through_registry_sink(
        self, env, spark, tmp_path
    ):
        # r15 review finding: the registry-sink path (register_table_
        # sink + insert_into + read_sink) must render/derive TIME like
        # the catalog-table path, or millis written raw NULL out on
        # re-scan
        out = str(tmp_path / "time_reg_sink")
        os.makedirs(out, exist_ok=True)
        chain = (
            env.connect(FileSystem().path(out))
            .with_format(
                OldCsv().field("id", "BIGINT").field("t", "TIME")
                .field_delimiter("|")
            )
            .with_schema(Schema().field("id", "BIGINT").field("t", "TIME"))
        )
        chain.register_table_sink("time_reg")
        millis = (7 * 3600 + 5 * 60 + 9) * 1000 + 42
        env.insert_into(
            spark.createDataFrame([(1, millis)], "id long, t long"),
            "time_reg",
        )
        got = {r["id"]: r["t"] for r in env.read_sink("time_reg").collect()}
        assert got == {1: millis}
        # the source face derives the same millis
        chain.register_table_source("time_reg")
        got2 = {r["id"]: r["t"] for r in env.table("time_reg").collect()}
        assert got2 == {1: millis}

    def test_catalog_insert_arity_validated(self, env, spark, tmp_path):
        # ADVICE r14: ExternalCatalogTable.write must reject a
        # mismatched projection at INSERT time (the reference's
        # insertInto validates the sink schema), not produce
        # misaligned CSV that fails later at scan time
        from flink_1_8_sourcecode_spark.descriptors import (
            ExternalCatalogTable,
        )

        out = str(tmp_path / "arity")
        os.makedirs(out, exist_ok=True)
        tbl = (
            ExternalCatalogTable.builder(FileSystem().path(out))
            .with_format(
                OldCsv().field("a", "INT").field("b", "STRING")
            )
            .with_schema(Schema().field("a", "INT").field("b", "STRING"))
            .as_table_source()
        )
        with pytest.raises(ValidationException, match="declares 2"):
            tbl.write(spark.createDataFrame([(1,)], "a int"))
        with pytest.raises(ValidationException, match="declares 2"):
            tbl.write(
                spark.createDataFrame([(1, "x", 2)], "a int, b string, c int")
            )
        # positional cast: int written into the STRING slot round-trips
        tbl.write(spark.createDataFrame([(1, 5)], "a int, b int"))
        got = [tuple(r) for r in tbl.table(spark).collect()]
        assert got == [(1, "5")]
