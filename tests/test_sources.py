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


class TestPureAvro:
    """Pure-Python Avro OCF (sources/avro.py) — format parity for
    AvroRowDeserializationSchema without the spark-avro jar."""

    SCHEMA = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "int"}},
            {"name": "color",
             "type": {"type": "enum", "name": "c", "symbols": ["RED", "BLUE"]}},
            {"name": "raw", "type": "bytes"},
            {"name": "fx", "type": {"type": "fixed", "name": "f4", "size": 4}},
            {"name": "nested",
             "type": {"type": "record", "name": "n",
                      "fields": [{"name": "x", "type": "int"}]}},
        ],
    }
    ROWS = [
        {"id": 1, "name": "alice", "score": 1.5, "flag": True,
         "tags": ["a", "b"], "props": {"k": 3}, "color": "RED",
         "raw": b"xy", "fx": b"1234", "nested": {"x": 7}},
        {"id": 2, "name": None, "score": -2.25, "flag": False,
         "tags": [], "props": {}, "color": "BLUE",
         "raw": b"", "fx": b"abcd", "nested": {"x": -1}},
    ]

    def test_roundtrip_all_types_both_codecs(self):
        from flink_1_8_sourcecode_spark.sources.avro import (
            decode_container,
            encode_avro,
        )

        for codec in ("null", "deflate"):
            ws, recs = decode_container(
                encode_avro(self.SCHEMA, self.ROWS, codec=codec)
            )
            assert ws == self.SCHEMA and recs == self.ROWS, codec

    def test_spark_distributed_read_multi_file(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.sources.avro import (
            read_avro,
            write_avro_file,
        )

        write_avro_file(str(tmp_path / "a.avro"), self.SCHEMA, self.ROWS,
                        codec="deflate")
        write_avro_file(str(tmp_path / "b.avro"), self.SCHEMA, [self.ROWS[0]])
        df = read_avro(spark, str(tmp_path / "*.avro"), self.SCHEMA)
        out = df.orderBy("id", "name").collect()
        assert len(out) == 3
        assert out[0]["name"] == "alice" and dict(out[0]["props"]) == {"k": 3}
        assert out[0]["nested"]["x"] == 7 and out[0]["color"] == "RED"
        assert out[2]["name"] is None and out[2]["flag"] is False

    def test_corruption_and_mismatch_raise(self, spark, tmp_path):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.sources.avro import (
            decode_container,
            encode_avro,
            read_avro,
            write_avro_file,
        )

        blob = encode_avro(self.SCHEMA, self.ROWS)
        with _pytest.raises(ValueError, match="magic"):
            decode_container(b"XXXX" + blob[4:])
        with _pytest.raises((ValueError, EOFError)):
            decode_container(blob[:-8])  # clipped sync -> corrupt
        other = {"type": "record", "name": "o",
                 "fields": [{"name": "id", "type": "long"}]}
        write_avro_file(str(tmp_path / "x.avro"), other, [{"id": 1}])
        df = read_avro(spark, str(tmp_path / "x.avro"), self.SCHEMA)
        with _pytest.raises(Exception, match="writer schema mismatch"):
            df.collect()


class TestTarShards:
    """WebDataset-style tar shards (sources/tar.py): distributed member
    walk, key/ext split, suffix pruning."""

    def _shards(self, tmp_path):
        from flink_1_8_sourcecode_spark.sources.tar import write_tar_shard

        write_tar_shard(
            str(tmp_path / "shard-000.tar"),
            {
                "000001.txt": b"caption one",
                "000001.img": b"\x00\x01\x02",
                "000001.json": b'{"w": 2}',
                "000002.txt": b"caption two",
                "000002.img": b"\xff\xfe",
            },
        )
        write_tar_shard(
            str(tmp_path / "shard-001.tar"),
            {"sub/000003.seg.img": b"\x11", "sub/000003.txt": b"three"},
        )
        return str(tmp_path / "shard-*.tar")

    def test_members_keys_and_grouping(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from flink_1_8_sourcecode_spark.sources.tar import read_tar_shards

        df = read_tar_shards(spark, self._shards(tmp_path))
        rows = df.collect()
        assert len(rows) == 7
        by_member = {r["member"]: r for r in rows}
        assert by_member["000001.txt"]["sample_key"] == "000001"
        assert bytes(by_member["000001.img"]["content"]) == b"\x00\x01\x02"
        # multi-dot member, WebDataset FIRST-dot rule: everything after
        # the first dot of the basename is the extension, so the member
        # groups with its sample siblings
        assert by_member["sub/000003.seg.img"]["sample_key"] == "sub/000003"
        assert by_member["sub/000003.seg.img"]["ext"] == "seg.img"
        # modality grouping: sample 000001 has 3 members; the multi-dot
        # seg mask groups WITH its sibling txt under sub/000003
        g = {r["sample_key"]: r["n"] for r in
             df.groupBy("sample_key").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert g["000001"] == 3 and g["000002"] == 2 and g["sub/000003"] == 2
        # split="last" restores the plain-filename rule
        df2 = read_tar_shards(spark, self._shards(tmp_path), split="last")
        by2 = {r["member"]: r for r in df2.collect()}
        assert by2["sub/000003.seg.img"]["sample_key"] == "sub/000003.seg"
        assert by2["sub/000003.seg.img"]["ext"] == "img"

    def test_suffix_pruning(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.sources.tar import read_tar_shards

        df = read_tar_shards(spark, self._shards(tmp_path), suffixes=["txt"])
        rows = df.collect()
        assert {r["ext"] for r in rows} == {"txt"}
        assert len(rows) == 3
        # a suffix matches the final dot-component of a multi-dot
        # WebDataset extension too ("img" admits "seg.img")
        imgs = read_tar_shards(spark, self._shards(tmp_path), suffixes=["img"])
        assert {r["ext"] for r in imgs.collect()} == {"img", "seg.img"}

    def test_deterministic_shard_bytes(self, tmp_path):
        from flink_1_8_sourcecode_spark.sources.tar import write_tar_shard

        a, b = str(tmp_path / "a.tar"), str(tmp_path / "b.tar")
        for p in (a, b):
            write_tar_shard(p, {"k.txt": b"v", "j.img": b"w"})
        assert open(a, "rb").read() == open(b, "rb").read()

    def test_assemble_samples_pivot(self, spark, tmp_path):
        from flink_1_8_sourcecode_spark.sources.tar import (
            assemble_samples,
            read_tar_shards,
        )

        df = read_tar_shards(spark, self._shards(tmp_path))
        out = {r["sample_key"]: r for r in
               assemble_samples(df, ["txt", "img"]).collect()}
        assert bytes(out["000001"]["txt"]) == b"caption one"
        assert bytes(out["000001"]["img"]) == b"\x00\x01\x02"
        # incomplete sample keeps NULL modality unless require_all
        # (sub/000003 groups txt + seg.img; no plain "img" modality)
        assert out["sub/000003"]["img"] is None
        strict = assemble_samples(df, ["txt", "img"], require_all=True)
        assert {r["sample_key"] for r in strict.collect()} == {"000001", "000002"}
