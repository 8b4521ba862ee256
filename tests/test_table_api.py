"""Flink 1.8 Table-API string-expression facade (table_api.py).

Reference parity: the String overloads of select/filter/groupBy/orderBy
(flink-table/.../api/table.scala:162,318,375,987) and the expression
grammar of ExpressionParser.scala.  Every test checks the facade against
the equivalent hand-built DataFrame plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.table_api import (
    ExpressionParserException,
    Table,
    parse_expression,
)


@pytest.fixture()
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _same(a, b):
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, (ra[:3], rb[:3])


class TestExpressionGrammar:
    def test_precedence_product_over_term(self, spark, li):
        _same(
            Table(li).select("l_quantity + l_tax * 2 as v").df,
            li.select((F.col("l_quantity") + F.col("l_tax") * 2).alias("v")),
        )

    def test_triple_equals_and_logic(self, spark, li):
        _same(
            Table(li).filter("l_returnflag === 'R' && l_quantity > 30").df,
            li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30)),
        )

    def test_all_equality_spellings_agree(self, spark, li):
        base = Table(li).filter("l_linestatus = 'O'").df.count()
        assert Table(li).filter("l_linestatus == 'O'").df.count() == base
        assert Table(li).filter("l_linestatus === 'O'").df.count() == base
        ne = Table(li).filter("l_linestatus <> 'O'").df.count()
        assert Table(li).filter("l_linestatus != 'O'").df.count() == ne
        assert Table(li).filter("l_linestatus !== 'O'").df.count() == ne

    def test_unary_not_and_parens(self, spark, li):
        _same(
            Table(li).filter("!(l_quantity > 10 || l_tax > 0.05)").df,
            li.filter(~((F.col("l_quantity") > 10) | (F.col("l_tax") > 0.05))),
        )

    def test_scalar_suffix_calls(self, spark, li):
        _same(
            Table(li)
            .select("l_returnflag.lowerCase() as lc, l_extendedprice.sqrt() as sq")
            .df,
            li.select(
                F.lower("l_returnflag").alias("lc"),
                F.sqrt("l_extendedprice").alias("sq"),
            ),
        )

    def test_cast_and_round_and_substring(self, spark, li):
        _same(
            Table(li)
            .select(
                "l_quantity.cast(INT) as qi, l_tax.round(1) as t1, "
                "l_returnflag.substring(1, 1) as rf"
            )
            .df,
            li.select(
                F.col("l_quantity").cast("int").alias("qi"),
                F.round("l_tax", 1).alias("t1"),
                F.col("l_returnflag").substr(F.lit(1), F.lit(1)).alias("rf"),
            ),
        )

    def test_null_literal_and_boolean(self, spark, li):
        out = Table(li).select("Null(STRING) as s, true as t").df.limit(1).collect()
        assert out[0]["s"] is None and out[0]["t"] is True

    def test_between_in_like(self, spark, li):
        _same(
            Table(li).filter("l_quantity.between(10, 20)").df,
            li.filter(F.col("l_quantity").between(10, 20)),
        )
        _same(
            Table(li).filter("l_linestatus.in('O')").df,
            li.filter(F.col("l_linestatus").isin("O")),
        )
        _same(
            Table(li).filter("l_returnflag.like('R%')").df,
            li.filter(F.col("l_returnflag").like("R%")),
        )


class TestTableOps:
    def test_grouped_select_with_aggregates(self, spark, li):
        got = (
            Table(li)
            .groupBy("l_returnflag, l_linestatus")
            .select(
                "l_returnflag, l_linestatus, l_quantity.sum as sum_qty, "
                "l_extendedprice.avg as avg_price, l_orderkey.count as cnt"
            )
            .df
        )
        want = li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count("l_orderkey").alias("cnt"),
        )
        _same(got, want)

    def test_ungrouped_global_aggregate(self, spark, li):
        got = Table(li).select("l_quantity.sum as s, l_orderkey.count as c").df
        want = li.agg(
            F.sum("l_quantity").alias("s"), F.count("l_orderkey").alias("c")
        )
        _same(got, want)

    def test_orderby_sort_markers_offset_fetch(self, spark, li):
        got = (
            Table(li)
            .select("l_orderkey, l_extendedprice")
            .orderBy("l_extendedprice.desc, l_orderkey.asc")
            .offset(2)
            .fetch(3)
            .df.collect()
        )
        want = (
            li.select("l_orderkey", "l_extendedprice")
            .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"))
            .offset(2)
            .limit(3)
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_join_with_string_predicate(self, spark, sf_dir):
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        got = (
            Table(o)
            .join(Table(c), "o_custkey === c_custkey")
            .select("o_orderkey, c_name")
            .df
        )
        want = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
            "o_orderkey", "c_name"
        )
        _same(got, want)

    def test_as_renames_all_columns(self, spark, li):
        t = Table(li.select("l_orderkey", "l_quantity")).as_("k, q")
        assert t.df.columns == ["k", "q"]
        with pytest.raises(ExpressionParserException):
            Table(li.select("l_orderkey", "l_quantity")).as_("only_one")

    def test_setops_match_dataframe(self, spark, li):
        a = Table(li.select("l_returnflag"))
        b = Table(li.filter("l_returnflag = 'R'").select("l_returnflag"))
        _same(a.minus(b).df, li.select("l_returnflag").exceptAll(
            li.filter(F.col("l_returnflag") == "R").select("l_returnflag")
        ).distinct())
        _same(a.intersect(b).df,
              li.select("l_returnflag").intersect(
                  li.filter(F.col("l_returnflag") == "R").select("l_returnflag")))


class TestRejections:
    """ExpressionParser parity: malformed input raises a parser error
    naming the position, never an opaque Spark analysis error."""

    @pytest.mark.parametrize(
        "bad",
        [
            "a +",
            "a .. b",
            "a as 5",
            "a ; b",
            "x.cast(NOT_A_TYPE)",
            "a.round(b)",  # non-literal scale
            "",
        ],
    )
    def test_malformed_expressions(self, spark, bad):
        with pytest.raises(ExpressionParserException):
            parse_expression(bad)

    def test_unknown_function_named(self, spark):
        with pytest.raises(ExpressionParserException, match="unknownFn"):
            parse_expression("x.unknownFn()")

    def test_unsupported_constructs_gate_loudly(self, spark):
        # the only remaining rejected suffix: row-count intervals
        with pytest.raises(NotImplementedError, match="count_window_agg"):
            parse_expression("10.rows")
        # .over is wired now, but outside a window() scope it must
        # still fail readably
        with pytest.raises(ExpressionParserException, match="no OVER windows"):
            parse_expression("a.sum.over(w)")

    def test_interval_literals_and_time_markers(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [("2020-01-01 00:00:00",)], "ts string"
        ).select(F.col("ts").cast("timestamp").alias("ts"))
        out = Table(df).select(
            "ts + 10.minutes as m, ts + 2.hours + 30.seconds as h, "
            "ts + 3.days as d, ts + 1.month as mo, ts + 2.quarters as q, "
            "ts + 1.week as w, ts + 1.year as y, ts.rowtime as rt"
        ).df.first()
        base = dt.datetime(2020, 1, 1)
        assert out.m == base + dt.timedelta(minutes=10)
        assert out.h == base + dt.timedelta(hours=2, seconds=30)
        assert out.d == base + dt.timedelta(days=3)
        assert out.mo == dt.datetime(2020, 2, 1)
        assert out.q == dt.datetime(2020, 7, 1)
        assert out.w == base + dt.timedelta(days=7)
        assert out.y == dt.datetime(2021, 1, 1)
        assert out.rt == base
        # interval literal needs an integer base
        with pytest.raises(ExpressionParserException, match="integer base"):
            parse_expression("x.minutes")
        # proctime parses to a current-timestamp column
        assert "current_timestamp" in str(
            parse_expression("p.proctime")
        ).lower()

    def test_composite_get_and_flatten(self, spark):
        df = spark.createDataFrame([(1,)], "x int").select(
            F.struct(
                F.lit(7).alias("a"), F.lit("z").alias("b")
            ).alias("s"),
            F.array(F.lit(10), F.lit(20)).alias("arr"),
        )
        row = Table(df).select("s.get('a') as ga, arr.get(1) as g1").df.first()
        assert row.ga == 7 and row.g1 == 20
        flat = Table(df).select("s.flatten()").df
        assert flat.columns == ["a", "b"]
        assert flat.first() == (7, "z")
        with pytest.raises(ExpressionParserException, match="named struct"):
            Table(df).select("(s).flatten()")

    def test_mixed_agg_and_field_ungrouped_rejected(self, spark, li):
        with pytest.raises(ExpressionParserException, match="groupBy"):
            Table(li).select("l_orderkey, l_quantity.sum")

    def test_aggregate_in_filter_rejected(self, spark, li):
        with pytest.raises(ExpressionParserException, match="aggregate"):
            Table(li).filter("l_quantity.sum > 5")

    def test_nonkey_nonagg_in_grouped_select_rejected(self, spark, li):
        with pytest.raises(ExpressionParserException):
            Table(li).groupBy("l_returnflag").select("l_orderkey")


def test_grouped_select_agg_aliased_to_key_name(spark):
    """An aggregate aliased to a grouping key's name must not misalign
    the projection (the positional out_agg_names matching excluded any
    agg output whose name collided with a key)."""
    from flink_1_8_sourcecode_spark.table_api import Table

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 5)], "a string, b int"
    )
    out = Table(df).groupBy("a").select("a as grp, b.sum as a").to_df()
    got = sorted((r["grp"], r["a"]) for r in out.collect())
    assert got == [("x", 3), ("y", 5)]


def test_grouped_select_aliased_key_accepted(spark):
    """A grouping key referenced WITH an alias in select() is a legal
    key passthrough, not 'neither key nor aggregate'."""
    from flink_1_8_sourcecode_spark.table_api import Table

    df = spark.createDataFrame(
        [("x", 1), ("x", 2), ("y", 5)], "a string, b int"
    )
    out = Table(df).groupBy("a").select("a as k, b.sum as total").to_df()
    assert sorted((r["k"], r["total"]) for r in out.collect()) == [
        ("x", 3), ("y", 5),
    ]


def test_grouped_select_non_key_still_rejected(spark):
    """A bare non-key, non-aggregate column still raises readably."""
    import pytest

    from flink_1_8_sourcecode_spark.table_api import (
        ExpressionParserException,
        Table,
    )

    df = spark.createDataFrame([("x", 1, 2.0)], "a string, b int, c double")
    with pytest.raises(ExpressionParserException, match="grouping keys"):
        Table(df).groupBy("a").select("a, b, c.sum as s").to_df()


class TestOverWindows:
    """Table-API OVER windows (Over builder + table.window + infix
    'over' from ExpressionParser.scala:225)."""

    def _t(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Table

        return Table(spark.createDataFrame(
            [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0),
             ("b", 1, 5.0), ("b", 2, 7.0)],
            "k string, seq int, v double",
        ))

    def test_unbounded_range_running_agg(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Over

        t = self._t(spark)
        w = Over.partitionBy("k").order_by("seq").alias("w")
        out = t.window(w).select("k, seq, v.sum over w as running").to_df()
        got = {(r.k, r.seq): r.running for r in out.collect()}
        assert got[("a", 3)] == 60.0 and got[("a", 2)] == 30.0
        assert got[("b", 2)] == 12.0

    def test_bounded_rows_preceding(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Over

        t = self._t(spark)
        w = Over.partitionBy("k").order_by("seq").preceding(1).alias("w")
        out = t.window(w).select("k, seq, v.avg over w as m, v.count over w as c")
        got = {(r.k, r.seq): (r.m, r.c) for r in out.to_df().collect()}
        assert got[("a", 3)] == (25.0, 2)   # rows 2..3
        assert got[("a", 1)] == (10.0, 1)

    def test_suffix_spelling_and_multiple_windows(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Over

        t = self._t(spark)
        w1 = Over.partitionBy("k").order_by("seq").alias("w1")
        w2 = Over.partitionBy("k").order_by("seq").preceding(0).alias("w2")
        out = t.window(w1, w2).select(
            "k, seq, v.sum.over(w1) as run, v.sum over w2 as self_only"
        ).to_df()
        got = {(r.k, r.seq): (r.run, r.self_only) for r in out.collect()}
        assert got[("a", 2)] == (30.0, 20.0)

    def test_camelcase_chain_keeps_partition(self, spark):
        """ADVICE r11 #1: Over.partitionBy('k').orderBy('t') — the
        reference's camelCase chain — must keep the partition (a plain
        classmethod orderBy silently reset it to a global window)."""
        from flink_1_8_sourcecode_spark.table_api import Over

        w = Over.partitionBy("k").orderBy("seq")
        assert w._partition == "k" and w._order == "seq"
        # class-form entry points still work (fresh builders)
        assert Over.orderBy("seq")._partition is None
        assert Over.partitionBy("k")._order is None
        # end-to-end: per-key running sum, not a global one
        t = self._t(spark)
        out = t.window(
            Over.partitionBy("k").orderBy("seq").alias("w")
        ).select("k, seq, v.sum over w as running").to_df()
        got = {(r.k, r.seq): r.running for r in out.collect()}
        assert got[("b", 2)] == 12.0          # global window would give 42.0
        assert got[("a", 3)] == 60.0

    def test_unknown_alias_and_missing_scope_raise(self, spark):
        from flink_1_8_sourcecode_spark.table_api import (
            ExpressionParserException,
            Over,
        )

        t = self._t(spark)
        w = Over.partitionBy("k").order_by("seq").alias("w")
        with pytest.raises(ExpressionParserException, match="unknown window"):
            t.window(w).select("v.sum over nope")
        with pytest.raises(ExpressionParserException, match="needs orderBy"):
            t.window(Over.partitionBy("k").alias("x")).select("v.sum over x")
        with pytest.raises(ExpressionParserException, match="alias"):
            t.window(Over.partitionBy("k").order_by("seq")).select("k")


class TestGroupWindows:
    """Table-API group windows (Tumble/Slide/Session builders,
    windows.scala parity) lowering to F.window / F.session_window."""

    def _ev(self, spark):
        import datetime as dt

        from flink_1_8_sourcecode_spark.table_api import Table

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("u1", base + dt.timedelta(minutes=m), float(v))
            for m, v in [(0, 1), (4, 2), (11, 3), (12, 4), (40, 5)]
        ]
        return Table(spark.createDataFrame(rows, "k string, ts timestamp, v double"))

    def test_tumble_matches_dataframe_window(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Tumble

        t = self._ev(spark)
        out = (
            t.window(Tumble.over("10.minutes").on("ts").alias("w"))
            .groupBy("w, k")
            .select("k, w.start as w_start, v.sum as total, v.count as cnt")
            .to_df()
        )
        want = (
            t.df.groupBy(F.window("ts", "10 minutes").alias("w"), "k")
            .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("cnt"))
            .select("k", F.col("w.start").alias("w_start"), "total", "cnt")
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))

    def test_slide_every(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Slide

        t = self._ev(spark)
        out = (
            t.window(Slide.over("10.minutes").every("5.minutes").on("ts").alias("w"))
            .groupBy("w, k")
            .select("k, w.start as ws, w.end as we, v.count as cnt")
            .to_df()
        )
        want = (
            t.df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "k")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("k", F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "cnt")
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, want.collect()))

    def test_session_gap(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Session

        t = self._ev(spark)
        out = (
            t.window(Session.withGap("10.minutes").on("ts").alias("w"))
            .groupBy("w, k")
            .select("k, v.count as cnt")
            .to_df()
        )
        # events at 0,4,11,12 chain into one session (gaps < 10 min);
        # 40 is its own session
        assert sorted(r.cnt for r in out.collect()) == [1, 4]

    def test_builder_validation(self, spark):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.table_api import (
            ExpressionParserException,
            Slide,
            Tumble,
        )

        t = self._ev(spark)
        with _pytest.raises(ExpressionParserException, match="time interval"):
            Tumble.over("banana")
        with _pytest.raises(ExpressionParserException, match="count_window_agg"):
            Tumble.over("10.rows")
        with _pytest.raises(ExpressionParserException, match="on\\("):
            t.window(Tumble.over("10.minutes").alias("w"))
        with _pytest.raises(ExpressionParserException, match="every"):
            t.window(Slide.over("10.minutes").on("ts").alias("w")).groupBy(
                "w, k"
            ).select("k, v.count as c").to_df().collect()
        with _pytest.raises(ExpressionParserException, match="window alias"):
            t.window(Tumble.over("10.minutes").on("ts").alias("w")).groupBy("k")


class TestJoinLateral:
    """String-form joinLateral (table.scala:627/:662) against the
    table-function registry (TableFunction.java:85)."""

    @pytest.fixture()
    def t(self, spark):
        from flink_1_8_sourcecode_spark.table_api import (
            Table,
            register_table_function,
        )

        register_table_function(
            "split_ws",
            lambda c: F.filter(F.split(c, " "), lambda x: x != F.lit("")),
        )
        register_table_function(
            "tok_pos",
            lambda c: F.transform(
                F.filter(F.split(c, " "), lambda x: x != F.lit("")),
                lambda x, i: F.struct(i.alias("p"), x.alias("t")),
            ),
        )
        return Table(
            spark.createDataFrame([(1, "a b"), (2, "")], "id int, c string")
        )

    def test_inner_drops_empty(self, t):
        got = sorted(
            (r.id, r.word)
            for r in t.joinLateral("split_ws(c) as (word)").df.collect()
        )
        assert got == [(1, "a"), (1, "b")]

    def test_left_outer_pads(self, t):
        got = sorted(
            (r.id, r.word)
            for r in t.leftOuterJoinLateral("split_ws(c) as (word)").df.collect()
        )
        assert got == [(1, "a"), (1, "b"), (2, None)]

    def test_multi_field_positional_rename_and_predicate(self, t):
        out = t.joinLateral("tok_pos(c) as (pos, tok)", predicate="pos = 0")
        assert sorted(
            (r.id, r.pos, r.tok) for r in out.df.collect()
        ) == [(1, 0, "a")]

    def test_errors(self, t):
        from flink_1_8_sourcecode_spark.table_api import (
            ExpressionParserException,
        )

        with pytest.raises(ExpressionParserException, match="unknown table function"):
            t.joinLateral("nope(c) as (x)")
        with pytest.raises(ExpressionParserException, match="alias list"):
            t.joinLateral("tok_pos(c) as (a, b, c)")
        with pytest.raises(ExpressionParserException, match="as"):
            t.joinLateral("split_ws(c)")


def test_over_preceding_rows_string_and_interval_validation(spark):
    from flink_1_8_sourcecode_spark.table_api import (
        ExpressionParserException,
        Over,
        Table,
    )

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 4.0)], "k int, seq int, v double"
    )
    # '2.rows' string spelling == preceding(2)
    w = Over.partitionBy("k").order_by("seq").preceding("2.rows").alias("w")
    got = sorted(
        r.s for r in Table(df).window(w).select("v.sum over w as s").df.collect()
    )
    assert got == [1.0, 3.0, 7.0]
    with pytest.raises(ExpressionParserException, match="preceding"):
        Over.partitionBy("k").order_by("seq").preceding("garbage")


def test_table_insert_into_sink(spark, tmp_path):
    from flink_1_8_sourcecode_spark.engine import Engine
    from flink_1_8_sourcecode_spark.table_api import Table

    eng = Engine(spark)
    eng.register_sink("t_out", "parquet", str(tmp_path / "t_out"))
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    Table(df).filter("k > 1").insertInto(eng, "t_out")
    assert [tuple(r) for r in eng.read_sink("t_out").collect()] == [(2, "y")]


class TestPolymorphicPlus:
    """Flink's '+' concatenates when an operand is a string
    (flink-table/.../expressions/arithmetic.scala Plus.validateInput);
    numeric '+' must stay arithmetic."""

    def _t(self, spark):
        from flink_1_8_sourcecode_spark.table_api import Table

        return Table(
            spark.createDataFrame(
                [(" Ab ", "cd", 3), ("x", "y", 4)],
                "s1 string, s2 string, n long",
            )
        )

    def test_string_string_concat(self, spark):
        got = self._t(spark).select("(s1 + s2) as v").df.collect()
        assert [r["v"] for r in got] == [" Ab cd", "xy"]

    def test_string_numeric_concat_casts(self, spark):
        got = self._t(spark).select("(s1.trim + n) as v").df.collect()
        assert [r["v"] for r in got] == ["Ab3", "x4"]

    def test_literal_left_concat(self, spark):
        got = self._t(spark).select("('p:' + n) as v").df.collect()
        assert [r["v"] for r in got] == ["p:3", "p:4"]

    def test_numeric_plus_still_adds(self, spark):
        got = self._t(spark).select("(n + n) as v").df.collect()
        assert [r["v"] for r in got] == [6, 8]

    def test_cast_string_concat(self, spark):
        got = self._t(spark).select("(n.cast(STRING) + s2) as v").df.collect()
        assert [r["v"] for r in got] == ["3cd", "4y"]

    def test_filter_and_grouped_agg(self, spark):
        t = self._t(spark)
        assert t.filter("s1.trim + s2 = 'Abcd'").df.count() == 1
        got = t.groupBy("s2").select("s2, (s1.max + '!') as m").df.collect()
        assert {(r["s2"], r["m"]) for r in got} == {("cd", " Ab !"), ("y", "x!")}

    def test_parenthesized_concat_chain(self, spark):
        got = self._t(spark).select("((s1.trim + '-') + s2.upperCase) as v").df.collect()
        assert [r["v"] for r in got] == ["Ab-CD", "x-Y"]

    def test_if_result_concat(self, spark):
        # if() with string branches is string-typed, so '+' must
        # concatenate — numeric Plus would silently yield NULL in
        # non-ANSI Spark (arithmetic.scala Plus concatenates whenever
        # either operand is a string)
        got = self._t(spark).select(
            "(if(n > 3, 'big', 'small') + n) as v"
        ).df.collect()
        assert [r["v"] for r in got] == ["small3", "big4"]
        got = self._t(spark).select("(n > 3).if('y', 'n') + n as v").df.collect()
        assert [r["v"] for r in got] == ["n3", "y4"]

    def test_composite_accessor_concat(self, spark):
        # .get()/.at()/.element() outputs carry no static marking; the
        # parser resolves their actual Catalyst type before choosing
        # concat vs Plus
        from flink_1_8_sourcecode_spark.table_api import Table

        t = Table(
            spark.createDataFrame(
                [((("p",), ["q"], 1))],
                "r struct<f: string>, arr array<string>, n long",
            )
        )
        assert t.select("(r.get('f') + n) as v").df.collect()[0]["v"] == "p1"
        assert t.select("(arr.at(1) + n) as v").df.collect()[0]["v"] == "q1"
        assert t.select("(arr.element + n) as v").df.collect()[0]["v"] == "q1"
        # numeric composites still add
        t2 = Table(
            spark.createDataFrame([((3,), 1)], "r struct<m: long>, n long")
        )
        assert t2.select("(r.get('m') + n) as v").df.collect()[0]["v"] == 4

    def test_element_on_null_array_is_null(self, spark):
        # ArrayElement: NULL input -> NULL (non-ANSI size(NULL) is -1,
        # which must not reach the >1-element error branch)
        from flink_1_8_sourcecode_spark.table_api import Table

        t = Table(
            spark.createDataFrame(
                [(["q"],), (None,)], "arr array<string>"
            )
        )
        got = t.select("arr.element as v").df.collect()
        assert [r["v"] for r in got] == ["q", None]


class TestPrefixCalls:
    """Prefix function-call grammar (ExpressionParser.scala:376
    prefixFunctionCall, :370 prefixIf, :394-410 prefixExtract/Floor/
    Ceil, :425 prefixToDate): fn(receiver, args...) == receiver.fn(...)
    with LOG keeping its SQL log([base,] x) signature — the spellings
    ScalarFunctionsTest uses interchangeably with the suffix forms."""

    def _t(self, spark):
        import datetime as dt

        from flink_1_8_sourcecode_spark.table_api import Table

        return Table(
            spark.createDataFrame(
                [(" Ab ", "cd", 3, dt.datetime(1996, 11, 10, 6, 55, 44))],
                "s1 string, s2 string, n long, ts timestamp",
            )
        )

    def _one(self, spark, expr):
        return self._t(spark).select(f"({expr}) as v").df.collect()[0]["v"]

    def test_scalar_prefix_forms(self, spark):
        assert self._one(spark, "concat(s1, s2)") == " Ab cd"
        assert self._one(spark, "trim(s1)") == "Ab"
        assert self._one(spark, "upperCase(s2)") == "CD"
        assert self._one(spark, "mod(n, 2)") == 1

    def test_temporal_prefix_forms(self, spark):
        import datetime as dt

        # "extract(f16, MONTH)" spelling — ScalarFunctionsTest:2085
        assert self._one(spark, "extract(ts, MONTH)") == 11
        assert self._one(spark, "floor(ts, DAY)") == dt.datetime(1996, 11, 10)
        assert self._one(spark, "ceil(ts, YEAR)") == dt.datetime(1997, 1, 1)
        assert self._one(spark, "toDate(ts)") == dt.date(1996, 11, 10)

    def test_log_keeps_sql_signature(self, spark):
        # "log(10, 100)" -> 2.0 — ScalarFunctionsTest testLog
        assert self._one(spark, "log(10, 100)") == 2.0
        import math

        # last-ulp libm divergence between JVM log and CPython log
        assert abs(self._one(spark, "log(n)") - math.log(3)) < 1e-15

    def test_prefix_if(self, spark):
        assert self._one(spark, "if(n > 2, 'big', 'small')") == "big"
        assert self._one(spark, "if(n > 9, 'big', 'small')") == "small"

    def test_composes_with_suffix_chain_and_plus(self, spark):
        assert self._one(spark, "trim(s1).upperCase") == "AB"
        assert self._one(spark, "trim(s1) + s2") == "Abcd"

    def test_rejections(self, spark):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.table_api import (
            ExpressionParserException,
        )

        with _pytest.raises(ExpressionParserException, match="prefix"):
            self._one(spark, "cast(n, INT)")
        with _pytest.raises(ExpressionParserException, match="argument"):
            self._one(spark, "trim()")


class TestTimestampDiff:
    """prefixTimestampDiff (ExpressionParser.scala:399) — the
    published rows of ScalarFunctionsTest.testTimestampDiff :2550."""

    def _one(self, spark, expr):
        from flink_1_8_sourcecode_spark.table_api import Table

        df = spark.createDataFrame([(1,)], "x int")
        return Table(df).select(f"({expr}) as v").df.collect()[0]["v"]

    def test_published_rows(self, spark):
        cases = [
            ("DAY", "2018-07-03 11:11:11", "2018-07-05 11:11:11", 2),
            ("DAY", "2016-06-15 11:00:00", "2016-06-19 00:00:00", 3),
            ("HOUR", "2018-07-03 11:11:11", "2018-07-04 12:12:11", 25),
            ("HOUR", "2016-06-15 00:00:00", "2016-06-12 00:00:00", -72),
            ("MINUTE", "2018-07-03 11:11:11", "2018-07-03 12:10:11", 59),
            ("SECOND", "2018-07-03 11:11:11", "2018-07-03 11:12:12", 61),
            ("WEEK", "2018-05-03 11:11:11", "2018-07-03 11:12:12", 8),
            ("MONTH", "2016-06-15 11:00:00", "2018-05-19 00:00:00", 23),
            ("QUARTER", "2016-06-15 11:00:00", "2018-05-19 00:00:00", 7),
        ]
        for unit, a, b, exp in cases:
            expr = (
                f"timestampDiff({unit}, '{a}'.toTimestamp, '{b}'.toTimestamp)"
            )
            assert self._one(spark, expr) == exp, (unit, a, b)

    def test_date_operands(self, spark):
        # date, date -> "2016-06-15" .. "2016-06-18" = 3 DAY
        assert (
            self._one(
                spark,
                "timestampDiff(DAY, '2016-06-15'.toDate, '2016-06-18'.toDate)",
            )
            == 3
        )

    def test_bad_unit_raises(self, spark):
        import pytest as _pytest

        from flink_1_8_sourcecode_spark.table_api import (
            ExpressionParserException,
        )

        with _pytest.raises(ExpressionParserException, match="unit"):
            self._one(spark, "timestampDiff(EON, x, x)")


class TestPrefixSuffixEquivalence:
    """Property: every prefix spelling fn(recv, args...) must produce
    the same rows as the suffix spelling recv.fn(args...) — the
    reference grammar treats them as one Call."""

    CASES = [
        ("s.upperCase", "upperCase(s)"),
        ("s.trim", "trim(s)"),
        ("s.charLength", "charLength(s)"),
        ("s.lpad(6, '*')", "lpad(s, 6, '*')"),
        ("s.substring(2, 3)", "substring(s, 2, 3)"),
        ("s.position('xAbcd')", "position(s, 'xAbcd')"),
        ("n.mod(3)", "mod(n, 3)"),
        ("n.power(2)", "power(n, 2)"),
        ("v.round(1)", "round(v, 1)"),
        ("v.truncate(1)", "truncate(v, 1)"),
        ("v.sign", "sign(v)"),
        ("ts.extract(DAY)", "extract(ts, DAY)"),
        ("ts.floor(HOUR)", "floor(ts, HOUR)"),
        ("ts.ceil(MINUTE)", "ceil(ts, MINUTE)"),
        ("ts.toDate", "toDate(ts)"),
        ("s.md5", "md5(s)"),
    ]

    def test_all_pairs_agree(self, spark):
        import datetime as dt

        from flink_1_8_sourcecode_spark.table_api import Table

        df = spark.createDataFrame(
            [("Abcd", 7, 1.26, dt.datetime(2001, 2, 3, 4, 5, 6))],
            "s string, n long, v double, ts timestamp",
        )
        t = Table(df)
        for suf, pre in self.CASES:
            a = t.select(f"({suf}) as x").df.collect()[0]["x"]
            b = t.select(f"({pre}) as x").df.collect()[0]["x"]
            assert a == b, (suf, pre, a, b)


class TestUnionPositional:
    """Union validation parity (plan/logical/operators.scala:320):
    positional — counts and TYPES must match, names need not."""

    def test_names_need_not_match(self, spark):
        a = Table(spark.createDataFrame([(1, "x")], "p int, q string"))
        b = Table(spark.createDataFrame([(2, "y")], "r int, s string"))
        got = sorted(map(tuple, a.unionAll(b).df.collect()))
        assert got == [(1, "x"), (2, "y")]
        # output takes the LEFT side's names (Calcite/Spark convention)
        assert a.unionAll(b).df.columns == ["p", "q"]

    def test_different_sizes_rejected(self, spark):
        a = Table(spark.createDataFrame([(1,)], "p int"))
        b = Table(spark.createDataFrame([(2, "y")], "r int, s string"))
        with pytest.raises(
            ExpressionParserException, match="different column sizes: 1 and 2"
        ):
            a.unionAll(b)

    def test_different_types_rejected(self, spark):
        a = Table(spark.createDataFrame([(1, 2)], "p int, q int"))
        b = Table(spark.createDataFrame([(2, "y")], "r int, s string"))
        with pytest.raises(
            ExpressionParserException, match="different schema"
        ):
            a.union(b)
