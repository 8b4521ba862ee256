"""Unit tests for the Flink-SQL pre-rewrite layer."""

from __future__ import annotations

import pytest

from flink_1_8_sourcecode_spark.plans import rewrite_flink_sql


def test_tumble_rewrite():
    out = rewrite_flink_sql(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS s, count(*) "
        "FROM t GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hours')" in out
    assert "window.start AS s" in out


def test_hop_swaps_slide_and_size():
    out = rewrite_flink_sql("SELECT 1 FROM t GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)")
    assert "window(ts, '1 hours', '30 minutes')" in out


def test_session_rewrite():
    out = rewrite_flink_sql("SELECT 1 FROM t GROUP BY SESSION(ts, INTERVAL '10' MINUTE)")
    assert "session_window(ts, '10 minutes')" in out


def test_plain_sql_untouched():
    q = "SELECT a, sum(b) FROM t GROUP BY a"
    assert rewrite_flink_sql(q) == q


def test_unsupported_raises():
    with pytest.raises(NotImplementedError):
        rewrite_flink_sql("SELECT * FROM t MATCH_RECOGNIZE (PARTITION BY k)")


def test_sql_match_recognize_routing(spark):
    """engine.sql routes FROM t MATCH_RECOGNIZE (...) through the CEP
    engine (Flink 1.8's SQL surface for CEP, DataStreamMatch.scala:65)."""
    from flink_1_8_sourcecode_spark.engine import Engine
    from tests.conftest import SF_SMALL

    eng = Engine(spark)
    eng.register_testdata(SF_SMALL)
    got = eng.sql(
        """
        SELECT user_id, signup_id, purchase_id
        FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES S.event_id AS signup_id, P.event_id AS purchase_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (S P)
          DEFINE S AS S.event_type = 'signup',
                 P AS P.event_type = 'purchase'
        ) AS T
        WHERE user_id >= 0
        """
    ).toPandas()

    from flink_1_8_sourcecode_spark.cep.match_recognize import match_recognize
    from flink_1_8_sourcecode_spark.catalog import table as _table

    direct = match_recognize(
        _table(spark, SF_SMALL, "events"),
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES S.event_id AS signup_id, P.event_id AS purchase_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (S P)
        DEFINE S AS S.event_type = 'signup',
               P AS P.event_type = 'purchase'
        """,
    ).toPandas()
    key = ["user_id", "signup_id", "purchase_id"]
    assert sorted(map(tuple, got[key].itertuples(index=False, name=None))) == sorted(
        map(tuple, direct[key].itertuples(index=False, name=None))
    )
    assert len(got) > 0


_MR_CLAUSE = """
      PARTITION BY user_id
      ORDER BY ts
      MEASURES S.event_id AS signup_id, P.event_id AS purchase_id
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (S P)
      DEFINE S AS S.event_type = 'signup',
             P AS P.event_type = 'purchase'
"""


def _mr_engine(spark):
    from flink_1_8_sourcecode_spark.engine import Engine
    from tests.conftest import SF_SMALL

    eng = Engine(spark)
    eng.register_testdata(SF_SMALL)
    return eng


def _baseline(spark):
    from flink_1_8_sourcecode_spark.catalog import table as _table
    from flink_1_8_sourcecode_spark.cep.match_recognize import match_recognize
    from tests.conftest import SF_SMALL

    pdf = match_recognize(_table(spark, SF_SMALL, "events"), _MR_CLAUSE).toPandas()
    key = ["user_id", "signup_id", "purchase_id"]
    return sorted(map(tuple, pdf[key].itertuples(index=False, name=None)))


def test_sql_match_recognize_derived_table_source(spark):
    """DataStreamMatch.scala:65 builds MATCH_RECOGNIZE from arbitrary
    relational input — a derived-table source must route too."""
    eng = _mr_engine(spark)
    got = eng.sql(
        "SELECT user_id, signup_id, purchase_id "
        "FROM (SELECT * FROM events WHERE user_id >= 0) MATCH_RECOGNIZE ("
        + _MR_CLAUSE + ")"
    ).toPandas()
    key = ["user_id", "signup_id", "purchase_id"]
    assert sorted(map(tuple, got[key].itertuples(index=False, name=None))) == _baseline(spark)
    assert len(got) > 0


def test_sql_match_recognize_aliased_sources(spark):
    """`FROM t AS x MATCH_RECOGNIZE`, `FROM t x ...` and
    `FROM (sub) AS x ...` all parse to the same result."""
    eng = _mr_engine(spark)
    base = _baseline(spark)
    key = ["user_id", "signup_id", "purchase_id"]
    for src in (
        "events AS e",
        "events e",
        "(SELECT * FROM events) AS sub",
        "(SELECT * FROM events) sub",
    ):
        got = eng.sql(
            f"SELECT user_id, signup_id, purchase_id FROM {src} MATCH_RECOGNIZE ("
            + _MR_CLAUSE + ")"
        ).toPandas()
        assert sorted(map(tuple, got[key].itertuples(index=False, name=None))) == base, src


def test_sql_match_recognize_two_clauses_one_statement(spark):
    """Two MATCH_RECOGNIZE clauses in one statement route independently."""
    eng = _mr_engine(spark)
    one = (
        "SELECT user_id, signup_id, purchase_id FROM events MATCH_RECOGNIZE ("
        + _MR_CLAUSE + ")"
    )
    got = eng.sql(f"SELECT count(*) AS n FROM ({one}) a JOIN ({one}) b USING (user_id, signup_id)").toPandas()
    assert int(got.n.iloc[0]) >= len(_baseline(spark))


def test_sql_match_recognize_in_string_literal_not_routed(spark):
    """The token inside a string literal must not trigger routing."""
    eng = _mr_engine(spark)
    got = eng.sql("SELECT 'use MATCH_RECOGNIZE (wisely)' AS tip").toPandas()
    assert got.tip.iloc[0] == "use MATCH_RECOGNIZE (wisely)"


def test_sql_match_recognize_unsupported_source_raises(spark):
    """A join in the table position is rejected with a readable message,
    not passed through to an opaque Spark parse error."""
    import pytest

    eng = _mr_engine(spark)
    with pytest.raises(NotImplementedError, match="MATCH_RECOGNIZE"):
        eng.sql(
            "SELECT * FROM events JOIN events ON 1=1 MATCH_RECOGNIZE ("
            + _MR_CLAUSE + ")"
        )


def test_driver_verified_requires_hash_match(tmp_path):
    """A rows-green/hash-red record must NOT count as verified (it should
    re-surface first in the driver's capped sweep); hash_match=None
    (rows-only check) still counts."""
    import json
    import __spark_entry__ as entrymod

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "good": {"rows_match": True, "schema_match": True, "hash_match": True},
        "rows_only": {"rows_match": True, "schema_match": True, "hash_match": None},
        "hash_red": {"rows_match": True, "schema_match": True, "hash_match": False},
        "rows_red": {"rows_match": False, "schema_match": True, "hash_match": True},
    }))
    green = entrymod._driver_verified(str(tmp_path))
    assert green == {"good", "rows_only"}


class TestSinkRegistry:
    """TableEnvironment.registerTableSink / Table.insertInto /
    sqlUpdate("INSERT INTO ...") parity (TableEnvironment.scala:586,756;
    table.scala:1052; CsvTableSink.scala)."""

    def _engine(self, spark):
        from flink_1_8_sourcecode_spark.engine import Engine

        eng = Engine(spark)
        eng.register(
            "src_t",
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "a")], "k int, s string"
            ),
        )
        return eng

    def test_insert_append_and_overwrite(self, spark, tmp_path):
        eng = self._engine(spark)
        eng.register_sink("out", "parquet", str(tmp_path / "out"))
        eng.sql_update("INSERT INTO out SELECT k, s FROM src_t WHERE k > 1")
        assert eng.read_sink("out").count() == 2
        # append semantics: a second INSERT INTO doubles the rows
        eng.sql_update("INSERT INTO out SELECT k, s FROM src_t WHERE k > 1")
        assert eng.read_sink("out").count() == 4
        # INSERT OVERWRITE replaces
        eng.sql_update("INSERT OVERWRITE out SELECT k, s FROM src_t")
        assert eng.read_sink("out").count() == 3

    def test_sql_entry_routes_insert_and_returns_readback(self, spark, tmp_path):
        eng = self._engine(spark)
        eng.register_sink("out2", "parquet", str(tmp_path / "out2"))
        got = eng.sql("INSERT OVERWRITE out2 SELECT k, upper(s) AS u FROM src_t")
        assert sorted((r.k, r.u) for r in got.collect()) == [
            (1, "A"), (2, "B"), (3, "A"),
        ]

    def test_csv_sink_round_trip_with_delimiter(self, spark, tmp_path):
        eng = self._engine(spark)
        eng.register_sink(
            "csv_out",
            "csv",
            str(tmp_path / "csv_out"),
            write_options={"delimiter": "|"},
            read_options={"delimiter": "|"},
            schema="k int, s string",
        )
        eng.insert_into(eng.sql("SELECT k, s FROM src_t"), "csv_out", overwrite=True)
        back = eng.read_sink("csv_out")
        assert sorted((r.k, r.s) for r in back.collect()) == [
            (1, "a"), (2, "b"), (3, "a"),
        ]

    def test_unknown_sink_and_format_raise_readably(self, spark, tmp_path):
        import pytest

        eng = self._engine(spark)
        with pytest.raises(NotImplementedError, match="no sink 'nope'"):
            eng.insert_into(eng.table("src_t"), "nope")
        with pytest.raises(NotImplementedError, match="format 'avro'"):
            eng.register_sink("x", "avro", str(tmp_path / "x"))
        with pytest.raises(NotImplementedError, match="INSERT INTO"):
            eng.sql_update("DELETE FROM src_t")

    def test_streaming_df_refused(self, spark, tmp_path):
        import pytest

        eng = self._engine(spark)
        eng.register_sink("s_out", "parquet", str(tmp_path / "s_out"))
        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        )
        with pytest.raises(NotImplementedError, match="streaming"):
            eng.insert_into(stream, "s_out")

    def test_partitioned_sink_layout_and_pruning(self, spark, tmp_path):
        eng = self._engine(spark)
        eng.register_sink(
            "part_out", "parquet", str(tmp_path / "part_out"),
            partition_by=["s"],
        )
        eng.sql_update("INSERT OVERWRITE part_out SELECT k, s FROM src_t")
        import os

        dirs = sorted(
            d for d in os.listdir(tmp_path / "part_out") if d.startswith("s=")
        )
        assert dirs == ["s=a", "s=b"]  # hive layout on disk
        back = eng.read_sink("part_out")
        assert back.filter("s = 'a'").count() == 2
        # partition filter reaches the scan as a partition predicate
        plan = back.filter("s = 'a'")._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(s" in plan or "s#" in plan

    def test_insert_parenthesized_and_union_bodies(self, spark, tmp_path):
        eng = self._engine(spark)
        eng.register_sink("u_out", "parquet", str(tmp_path / "u_out"))
        # single wrapping pair strips
        eng.sql_update("INSERT OVERWRITE u_out (SELECT k, s FROM src_t WHERE k = 1)")
        assert eng.read_sink("u_out").count() == 1
        # "(A) UNION ALL (B)" must stay balanced, not get mangled
        eng.sql_update(
            "INSERT OVERWRITE u_out "
            "(SELECT k, s FROM src_t WHERE k = 1) UNION ALL "
            "(SELECT k, s FROM src_t WHERE k = 2)"
        )
        assert eng.read_sink("u_out").count() == 2


def test_engine_explain_text_plans(spark):
    """TableEnvironment.explain parity: formatted physical plan text
    for SQL strings and DataFrames; extended adds the logical stages."""
    from flink_1_8_sourcecode_spark.engine import Engine

    eng = Engine(spark)
    eng.register("exp_t", spark.createDataFrame([(1, "a")], "k int, s string"))
    plan = eng.explain("SELECT k, upper(s) AS u FROM exp_t WHERE k > 0")
    assert "Physical Plan" in plan and "upper" in plan
    ext = eng.explain(eng.table("exp_t"), extended=True)
    assert "Analyzed Logical Plan" in ext and "Optimized Logical Plan" in ext
