"""MATCH_RECOGNIZE subset tests (DataStreamMatch.scala:65 parity).

Sequence per user (one event per second):
  u=1: login fail fail fail logout  -> FAIL{3} matches once
  u=2: login fail ok fail fail      -> FAIL{3} no match (gap breaks strict
                                        contiguity); FAIL{2} matches at 3,4
"""

from __future__ import annotations

import datetime as dt

import pytest

from flink_1_8_sourcecode_spark.cep.match_recognize import match_recognize

ROWS = [
    # (user, seq, type)
    (1, 0, "login"), (1, 1, "fail"), (1, 2, "fail"), (1, 3, "fail"), (1, 4, "logout"),
    (2, 0, "login"), (2, 1, "fail"), (2, 2, "ok"), (2, 3, "fail"), (2, 4, "fail"),
]


@pytest.fixture(scope="module")
def auth_df(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, i, base + dt.timedelta(seconds=i), t) for (u, i, t) in ROWS
    ]
    return spark.createDataFrame(rows, "user_id int, event_id int, ts timestamp, etype string")


def test_three_consecutive_fails(spark, auth_df):
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS first_fail,
                 LAST(A.event_id) AS last_fail,
                 COUNT(A.*) AS n_fails
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{3})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.user_id, r.first_fail, r.last_fail, r.n_fails) == (1, 1, 3, 3)


def test_login_then_fails_then_logout(spark, auth_df):
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES L.event_id AS login_id,
                 COUNT(FA.*) AS n_fails,
                 LAST(O.event_id) AS logout_id
        ONE ROW PER MATCH
        PATTERN (L FA+ O)
        DEFINE L AS L.etype = 'login',
               FA AS FA.etype = 'fail',
               O AS O.etype = 'logout'
        """,
    ).toPandas()
    # only user 1 has login -> fails -> logout with strict contiguity
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.user_id, r.login_id, r.n_fails, r.logout_id) == (1, 0, 3, 4)


def test_skip_to_next_row_overlaps(spark, auth_df):
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS start_id, COUNT(A.*) AS n
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (A{2})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas()
    got = sorted(zip(out.user_id, out.start_id))
    # u1: fails at 1,2,3 -> starts 1 and 2 overlap; u2: fails 3,4 -> start 3
    assert got == [(1, 1), (1, 2), (2, 3)]


def test_undefined_symbol_matches_any(spark, auth_df):
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(L.event_id) AS lid, FIRST(X.event_id) AS xid
        ONE ROW PER MATCH
        PATTERN (L X)
        DEFINE L AS L.etype = 'login'
        """,
    ).toPandas()
    got = sorted(zip(out.user_id, out.lid, out.xid))
    assert got == [(1, 0, 1), (2, 0, 1)]


def test_bare_symbol_column_measure_is_last_row(spark, auth_df):
    """Bare ``SYM.col`` in MEASURES resolves as the variable's LAST row
    (SQL FINAL semantics; MatchCodeGenerator.scala defaults first=false)
    — consistent with the bare-expression lowering (``SYM.col + 0``)."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES A.event_id AS bare_id,
                 LAST(A.event_id) AS last_id,
                 A.event_id + 0 AS expr_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{3})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    # u1 fails at event_id 1,2,3 — bare/expr forms must agree with LAST
    assert (r.bare_id, r.last_id, r.expr_id) == (3, 3, 3)


def test_define_literal_aggregate_argument(spark, auth_df):
    """``COUNT(1)`` / ``SUM(1)`` inside DEFINE: digit-only arguments are
    NOT implied-symbol columns (the old rewrite produced the invalid
    reference ``SYM.1``); they lower to a synthetic constant column and
    aggregate per defining symbol — here capping the A-run at 2 rows."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS start_id, COUNT(A.*) AS n
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A+)
        DEFINE A AS A.etype = 'fail' AND COUNT(1) <= 2
        """,
    ).toPandas()
    got = sorted(zip(out.user_id, out.start_id, out.n))
    # u1 has fails 1,2,3: run capped at 2 -> match (1,2) then (3);
    # u2 has an isolated fail at 1 and a run (3,4)
    assert got == [(1, 1, 2), (1, 3, 1), (2, 1, 1), (2, 3, 2)]


def test_decimal_literal_and_quoted_dot_survive_define_rewrite(spark):
    """Regression: the old blanket prefix rewrite mangled '1.5' -> '5'
    and dotted string literals ('a.fail' -> 'fail')."""
    rows = [(1, 0, 1.0, "x"), (1, 1, 2.0, "a.fail"), (1, 2, 0.5, "y")]
    df = spark.createDataFrame(rows, "k int, eid int, price double, tag string")
    out = match_recognize(
        df,
        """
        PARTITION BY k
        ORDER BY eid
        MEASURES FIRST(A.eid) AS hit_eid, FIRST(A.price) AS hit_price
        ONE ROW PER MATCH
        PATTERN (A)
        DEFINE A AS A.price > 1.5 AND A.tag = 'a.fail'
        """,
    ).toPandas()
    assert len(out) == 1
    assert (out.iloc[0].hit_eid, out.iloc[0].hit_price) == (1, 2.0)


def test_within_interval_parsing():
    from flink_1_8_sourcecode_spark.cep.match_recognize import _parse_sql_interval

    assert _parse_sql_interval("INTERVAL '10' MINUTE") == 600.0
    assert _parse_sql_interval("interval '1.5' hours") == 5400.0
    assert _parse_sql_interval("INTERVAL '2' DAY") == 172800.0
    assert _parse_sql_interval("INTERVAL '30' SECOND(3)") == 30.0
    assert _parse_sql_interval("INTERVAL '1 02:30:00' DAY TO SECOND") == 95400.0
    assert _parse_sql_interval("INTERVAL '02:30:00' HOUR TO SECOND") == 9000.0
    assert _parse_sql_interval("INTERVAL '02:30' HOUR TO MINUTE") == 9000.0
    assert _parse_sql_interval("INTERVAL '10:30' MINUTE TO SECOND") == 630.0
    with pytest.raises(NotImplementedError, match="unsupported interval"):
        _parse_sql_interval("3 + 4")
    with pytest.raises(NotImplementedError, match="unknown unit"):
        _parse_sql_interval("INTERVAL '3' FORTNIGHT")
    with pytest.raises(NotImplementedError, match="cannot parse"):
        _parse_sql_interval("INTERVAL 'abc' DAY TO SECOND")


def test_pattern_within_bounds_match_span(spark, auth_df):
    """WITHIN prunes matches whose first-to-last span exceeds the bound;
    the same clause without WITHIN used to raise 'unsupported PATTERN
    token' — both behaviors pinned here.  Events are 1 s apart, so an
    A{3} run spans 2 s: WITHIN '2' SECOND keeps it, '1' SECOND kills it."""
    clause = """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS first_fail, COUNT(A.*) AS n_fails
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{{3}}) WITHIN INTERVAL '{iv}' SECOND
        DEFINE A AS A.etype = 'fail'
    """
    wide = match_recognize(auth_df, clause.format(iv="2")).toPandas()
    assert len(wide) == 1 and wide.iloc[0].first_fail == 1
    tight = match_recognize(auth_df, clause.format(iv="1")).toPandas()
    assert len(tight) == 0


@pytest.fixture(scope="module")
def price_df(spark):
    # per key: a price path for V-shape (down-run then recovery) patterns
    base = dt.datetime(2024, 1, 1)
    paths = {
        1: [10.0, 9.0, 8.0, 7.0, 9.5],   # strict V: down down down up-above-2-back
        2: [5.0, 6.0, 7.0, 8.0, 9.0],    # monotonic up: no down-run
        3: [10.0, 9.5, 9.9, 9.0, 12.0],  # down, up, down, up
    }
    rows = [
        (k, i, base + dt.timedelta(seconds=i), p)
        for k, path in paths.items()
        for i, p in enumerate(path)
    ]
    return spark.createDataFrame(rows, "k int, eid int, ts timestamp, price double")


def test_define_cross_symbol_navigation_v_shape(spark, price_df):
    """The classic MATCH_RECOGNIZE V-shape: DOWN+ rows each below the
    PREVIOUS row (LAST(DOWN.price) with a FIRST(A.price) fallback for
    the first DOWN), then UP above the last DOWN — cross-symbol and
    self-navigation in DEFINE, the reference's IterativeCondition path."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES A.eid AS start_id,
                 LAST(DOWN.eid) AS bottom_id,
                 UP.eid AS up_id
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A DOWN+ UP)
        DEFINE DOWN AS (LAST(DOWN.price, 1) IS NULL AND DOWN.price < A.price)
                    OR DOWN.price < LAST(DOWN.price, 1),
               UP AS UP.price > LAST(DOWN.price)
        """,
    ).toPandas()
    got = {r.k: (r.start_id, r.bottom_id, r.up_id) for _, r in out.iterrows()}
    # k=1: A=0, DOWN=1,2,3 (9<10, 8<9, 7<8), UP=4 (9.5>7)
    assert got[1] == (0, 3, 4)
    # k=2: no down-run anywhere
    assert 2 not in got
    # k=3: A=0, DOWN=1 (9.5<10), UP=2 (9.9>9.5)
    assert got[3] == (0, 1, 2)


def test_define_navigation_unknown_rejects_row(spark, price_df):
    """SQL three-valued logic at the gate: a comparison against an
    unbound navigation (NULL) is unknown -> the row cannot match."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES B.eid AS bid
        ONE ROW PER MATCH
        PATTERN (B)
        DEFINE B AS B.price > LAST(Z.price)
        """.replace("PATTERN (B)", "PATTERN (B Z?)"),
    ).toPandas()
    assert len(out) == 0  # Z never bound before B evaluates


def test_define_iterative_unsupported_raises(spark, price_df):
    with pytest.raises(NotImplementedError, match="DEFINE"):
        match_recognize(
            price_df,
            """
            PARTITION BY k
            ORDER BY ts
            MEASURES B.eid AS bid
            ONE ROW PER MATCH
            PATTERN (A B)
            DEFINE B AS B.price BETWEEN LAST(A.price) AND 10
            """,
        )


def test_define_prev_physical_row(spark, price_df):
    """PREV(col[, n]) navigates physical rows symbol-blind: the classic
    'price strictly below the previous row' run, first row of each
    partition rejected (PREV off the edge is NULL -> unknown)."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES D.eid AS did
        ONE ROW PER MATCH
        AFTER MATCH SKIP TO NEXT ROW
        PATTERN (D)
        DEFINE D AS D.price < PREV(price)
        """,
    ).toPandas()
    got = sorted(zip(out.k, out.did))
    # k=1 [10,9,8,7,9.5]: rows 1,2,3 drop; k=2 rises; k=3 [10,9.5,9.9,9,12]: rows 1,3
    assert got == [(1, 1), (1, 2), (1, 3), (3, 1), (3, 3)]


def test_running_vs_final_measures_all_rows(spark, auth_df):
    """ALL ROWS PER MATCH with RUNNING vs FINAL semantics: RUNNING
    COUNT climbs row by row; FINAL repeats the match total (the SQL
    standard's per-row navigation split the reference codegen also
    implements, MatchCodeGenerator.scala)."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES RUNNING COUNT(A.*) AS n_run, FINAL COUNT(A.*) AS n_fin,
                 RUNNING LAST(A.event_id) AS last_run
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{3})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas().sort_values("event_id")
    assert list(out.n_run) == [1, 2, 3]
    assert list(out.n_fin) == [3, 3, 3]
    assert list(out.last_run) == [1, 2, 3]


def test_define_three_valued_logic_or_with_unknown(spark, price_df):
    """SQL 3VL in iterative DEFINE: UNKNOWN OR TRUE = TRUE regardless of
    operand order (regression: a None comparison used to raise and
    reject the whole row even when the other disjunct held), and
    NOT UNKNOWN = UNKNOWN rejects."""
    # LAST(B.price, 9) is always unbound (UNKNOWN comparison); the other
    # disjunct selects eid == 2 rows — both operand orders must agree
    for clause_pat in (
        "B AS B.price > LAST(B.price, 9) OR B.eid = 2",
        "B AS B.eid = 2 OR B.price > LAST(B.price, 9)",
    ):
        out = match_recognize(
            price_df,
            f"""
            PARTITION BY k
            ORDER BY ts
            MEASURES B.eid AS bid
            ONE ROW PER MATCH
            AFTER MATCH SKIP TO NEXT ROW
            PATTERN (B)
            DEFINE {clause_pat}
            """,
        ).toPandas()
        got = sorted(zip(out.k, out.bid))
        assert got == [(1, 2), (2, 2), (3, 2)], (clause_pat, got)

    # NOT over an unknown comparison stays unknown -> reject everything
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES B.eid AS bid
        ONE ROW PER MATCH
        PATTERN (B)
        DEFINE B AS NOT (B.price > LAST(B.price, 9))
        """,
    ).toPandas()
    assert len(out) == 0


def test_measures_aggregates_per_variable(spark, price_df):
    """SUM/AVG/MIN/MAX/COUNT(S.col) grouped by pattern variable in
    MEASURES (MatchCodeGenerator.scala:42-69 parity): the V-shape
    match's DOWN-run aggregates differ from any FIRST/LAST form."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES FIRST(A.price) AS start_price,
                 SUM(DOWN.price) AS sum_down, AVG(DOWN.price) AS avg_down,
                 MIN(DOWN.price) AS min_down, MAX(DOWN.price) AS max_down,
                 COUNT(DOWN.price) AS n_down
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A DOWN+ UP)
        DEFINE DOWN AS (LAST(DOWN.price, 1) IS NULL AND DOWN.price < A.price)
                    OR DOWN.price < LAST(DOWN.price, 1),
               UP AS UP.price > LAST(DOWN.price)
        """,
    ).toPandas()
    got = {r.k: r for _, r in out.iterrows()}
    # k=1: DOWN = [9, 8, 7]
    assert (got[1].sum_down, got[1].avg_down) == (24.0, 8.0)
    assert (got[1].min_down, got[1].max_down, got[1].n_down) == (7.0, 9.0, 3)
    # k=3: DOWN = [9.5]
    assert (got[3].sum_down, got[3].n_down) == (9.5, 1)


def test_define_aggregate_running_semantics(spark, price_df):
    """AVG(D.price) inside DEFINE evaluates with RUNNING semantics —
    the candidate row counts toward its own variable's aggregate: a
    down-run extends only while the running average stays >= 8."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES COUNT(D.*) AS n, AVG(D.price) AS avg_kept
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (D+)
        DEFINE D AS D.price < PREV(price) AND AVG(D.price) >= 8
        """,
    ).toPandas()
    got = sorted(zip(out.k, out.n, out.avg_kept))
    # k=1 [10,9,8,7,9.5]: candidates 9 (avg 9 ok), 8 (avg 8.5 ok),
    # 7 (avg 8 ok) -> one run [9,8,7]; k=3 [10,9.5,9.9,9,12]: two
    # single-row runs ([9.5] and [9]); k=2 rises -> none
    assert got == [(1, 3, 8.0), (3, 1, 9.0), (3, 1, 9.5)]


def test_measures_running_aggregate_all_rows(spark, price_df):
    """RUNNING SUM in ALL ROWS PER MATCH mode climbs row by row while
    FINAL repeats the match total."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES RUNNING SUM(D.price) AS s_run, FINAL SUM(D.price) AS s_fin
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (D{3})
        DEFINE D AS D.price < PREV(price)
        """,
    ).toPandas()
    rows = out[out.k == 1].sort_values("eid")
    assert list(rows.s_run) == [9.0, 17.0, 24.0]
    assert list(rows.s_fin) == [24.0, 24.0, 24.0]


def test_subset_union_variable(spark, price_df):
    """SUBSET W = (A, UP): LAST/COUNT/aggregates over the union of the
    component symbols' rows (DataStreamMatch.scala:38 subsets)."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES LAST(W.eid) AS last_w, FIRST(W.price) AS first_w,
                 COUNT(W.*) AS n_w, SUM(W.price) AS sum_w
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A DOWN+ UP)
        SUBSET W = (A, UP)
        DEFINE DOWN AS (LAST(DOWN.price, 1) IS NULL AND DOWN.price < A.price)
                    OR DOWN.price < LAST(DOWN.price, 1),
               UP AS UP.price > LAST(DOWN.price)
        """,
    ).toPandas()
    got = {r.k: r for _, r in out.iterrows()}
    # k=1: A=row0 (10.0), UP=row4 (9.5) -> union rows 0 and 4
    assert (got[1].last_w, got[1].first_w) == (4, 10.0)
    assert (got[1].n_w, got[1].sum_w) == (2, 19.5)


def test_subset_in_define_navigation(spark, price_df):
    """A DEFINE condition may navigate a SUBSET variable; the union
    includes the current candidate row when its own symbol is a
    component (running semantics)."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES FIRST(A.eid) AS aid, FIRST(B.eid) AS bid
        ONE ROW PER MATCH
        PATTERN (A B)
        SUBSET V = (A, B)
        DEFINE A AS A.eid = 0,
               B AS COUNT(V.*) = 2 AND B.price < FIRST(V.price)
        """,
    ).toPandas()
    # B at row 1 sees V = {A row, B candidate}: count 2; price < first
    # -> only partitions whose row1 price < row0 price (k=1, k=3)
    got = sorted(zip(out.k, out.aid, out.bid))
    assert got == [(1, 0, 1), (3, 0, 1)]


def test_unsupported_measure_raises_not_implemented(spark, price_df):
    """Task-7 normalization: an unsupported MEASURES item raises
    NotImplementedError with the supported-grammar message, like every
    other capability gate."""
    with pytest.raises(NotImplementedError, match="supported"):
        match_recognize(
            price_df,
            """
            PARTITION BY k
            ORDER BY ts
            MEASURES STDDEV(A.price) AS sd
            ONE ROW PER MATCH
            PATTERN (A)
            DEFINE A AS A.price > 0
            """,
        )
    with pytest.raises(NotImplementedError, match="COUNT"):
        match_recognize(
            price_df,
            """
            PARTITION BY k
            ORDER BY ts
            MEASURES SUM(A.*) AS s
            ONE ROW PER MATCH
            PATTERN (A)
            DEFINE A AS A.price > 0
            """,
        )


def test_subset_validation_errors(spark, price_df):
    with pytest.raises(ValueError, match="components must be pattern symbols"):
        match_recognize(
            price_df,
            """
            PARTITION BY k
            ORDER BY ts
            MEASURES FIRST(A.eid) AS aid
            ONE ROW PER MATCH
            PATTERN (A)
            SUBSET U = (A, NOPE)
            DEFINE A AS A.price > 0
            """,
        )
    with pytest.raises(ValueError, match="collides"):
        match_recognize(
            price_df,
            """
            PARTITION BY k
            ORDER BY ts
            MEASURES FIRST(A.eid) AS aid
            ONE ROW PER MATCH
            PATTERN (A B)
            SUBSET B = (A)
            DEFINE A AS A.price > 0
            """,
        )


def test_pattern_group_parse_shapes():
    from flink_1_8_sourcecode_spark.cep.match_recognize import _parse_pattern

    assert _parse_pattern("A B{2}") == [
        ("sym", "A", 1, 1, True), ("sym", "B", 2, 2, True)
    ]
    # unquantified parens are plain grouping — inlined
    assert _parse_pattern("(A B)") == [
        ("sym", "A", 1, 1, True), ("sym", "B", 1, 1, True)
    ]
    assert _parse_pattern("(A B)+ C") == [
        ("grp", [("sym", "A", 1, 1, True), ("sym", "B", 1, 1, True)], 1, None, True),
        ("sym", "C", 1, 1, True),
    ]
    # nested group, bounded quantifier, reluctant outer star
    assert _parse_pattern("(A (B C){2})*?") == [
        ("grp",
         [("sym", "A", 1, 1, True),
          ("grp", [("sym", "B", 1, 1, True), ("sym", "C", 1, 1, True)], 2, 2, True)],
         0, None, False)
    ]
    import pytest as _pt
    with _pt.raises(ValueError, match="unbalanced"):
        _parse_pattern("(A B")
    with _pt.raises(ValueError, match="quantifier"):
        _parse_pattern("+ A")


def test_sql_pattern_group_matches(spark, auth_df):
    """PATTERN ((L FA){1,2}) through SQL MR: quantified group with
    strict contiguity; u1 has login,fail adjacent once; u2 too."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts, event_id
        MEASURES FIRST(L.event_id) AS lid, LAST(FA.event_id) AS fid,
                 MATCH_NUMBER() AS mno, CLASSIFIER() AS cls
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ((L FA){1,2})
        DEFINE L AS L.etype = 'login', FA AS FA.etype = 'fail'
        """,
    ).toPandas()
    got = sorted(zip(out.user_id, out.lid, out.fid, out.mno, out.cls))
    assert got == [(1, 0, 1, 1, "FA"), (2, 0, 1, 1, "FA")]


def test_order_by_multiple_tiebreaks(spark):
    """ALL extra ORDER BY columns break ties (previously only the
    first was honored — rows with equal (ts, c1) order by c2)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        # same ts and same c1 — c2 decides the sequence a then b
        (1, base, 0, 1, "b"),
        (1, base, 0, 0, "a"),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, c1 int, c2 int, t string")
    out = match_recognize(
        df,
        """
        PARTITION BY k
        ORDER BY ts, c1, c2
        MEASURES A.c2 AS a2, B.c2 AS b2
        ONE ROW PER MATCH
        PATTERN (A B)
        DEFINE A AS A.t = 'a', B AS B.t = 'b'
        """,
    ).toPandas()
    assert len(out) == 1 and (out.iloc[0].a2, out.iloc[0].b2) == (0, 1)


def test_match_number_not_supported_on_stream(spark, auth_df):
    """MATCH_NUMBER() on a streaming source must refuse loudly (the
    gate fires at plan time, before any execution)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="mr_mno_")
    auth_df.write.mode("overwrite").parquet(d)
    s = spark.readStream.schema(auth_df.schema).parquet(d)
    with pytest.raises(NotImplementedError, match="MATCH_NUMBER"):
        match_recognize(
            s,
            """
            PARTITION BY user_id
            ORDER BY ts
            MEASURES MATCH_NUMBER() AS mno
            ONE ROW PER MATCH
            PATTERN (A B) WITHIN INTERVAL '1' HOUR
            DEFINE A AS A.etype = 'login', B AS B.etype = 'fail'
            """,
        )


def test_match_rowtime_measure(spark, auth_df):
    """MATCH_ROWTIME(): the match's last-row event time (Flink 1.8
    exposes it as the event-time attribute of MR output)."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS first_fail, MATCH_ROWTIME() AS mrt
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A{3})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas()
    assert len(out) == 1
    # u1 fails at seconds 1..3 -> last row ts = base + 3s
    assert out.iloc[0].mrt == dt.datetime(2024, 1, 1, 0, 0, 3)


def test_optional_first_symbol_anchor(spark, auth_df):
    """Review regression: PATTERN (A? C) must match C-only at rows
    where A's condition fails (the anchor gate used to reject them)."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(C.event_id) AS cid, COUNT(A.*) AS na
        ONE ROW PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN (A? C)
        DEFINE A AS A.etype = 'login', C AS C.etype = 'logout'
        """,
    ).toPandas()
    # u1 logout at event 4, preceded by 'fail' (A rejects) -> C-only
    got = sorted(zip(out.user_id, out.cid, out.na))
    assert got == [(1, 4, 0)]


def test_alias_named_subset_parses(spark, auth_df):
    """Review regression: an alias named 'subset' must not be mistaken
    for the SUBSET clause keyword."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS subset
        ONE ROW PER MATCH
        PATTERN (A{3})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas()
    assert list(out.columns) == ["user_id", "subset"] and len(out) == 1


def test_keyword_shaped_aliases_parse(spark, auth_df):
    """Aliases named pattern/define/subset are identifiers, not clause
    keywords — the guarded lookaheads must keep them intact."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES FIRST(A.event_id) AS pattern, LAST(A.event_id) AS define,
                 COUNT(A.*) AS subset
        ONE ROW PER MATCH
        PATTERN (A{3})
        DEFINE A AS A.etype = 'fail'
        """,
    ).toPandas()
    assert sorted(out.columns) == ["define", "pattern", "subset", "user_id"]
    assert len(out) == 1 and out.iloc[0]["pattern"] == 1


def test_all_rows_with_sql_pattern_group(spark, auth_df):
    """ALL ROWS PER MATCH over a quantified SQL pattern group: one row
    per matched event, classifier = inner stage names."""
    out = match_recognize(
        auth_df,
        """
        PARTITION BY user_id
        ORDER BY ts
        MEASURES COUNT(FA.*) AS n_fa
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PATTERN ((L FA){1})
        DEFINE L AS L.etype = 'login', FA AS FA.etype = 'fail'
        """,
    ).toPandas().sort_values(["user_id", "event_id"])
    # both users: login@0 fail@1
    assert list(out.classifier) == ["L", "FA", "L", "FA"]
    assert list(out.n_fa) == [1, 1, 1, 1]


def test_bare_measure_whitelisted_scalar_call(spark, price_df):
    """ROUND/ABS/… in a BARE expression measure lower through the
    synthetic-column path with LAST/FINAL semantics (the reference
    compiles arbitrary RexCalls in measures,
    MatchCodeGenerator.scala:42-69); unknown calls keep raising."""
    out = match_recognize(
        price_df,
        """
        PARTITION BY k
        ORDER BY ts
        MEASURES ROUND(A.price / 3, 2) AS r,
                 ABS(A.price - 100) + 1 AS d
        ONE ROW PER MATCH
        PATTERN (A+)
        DEFINE A AS A.price > 0
        """,
    ).toPandas()
    # A+ greedily takes the whole partition; bare measures = LAST row
    last = {1: 9.5, 2: 9.0, 3: 12.0}
    got = {int(r.k): (float(r.r), float(r.d)) for r in out.itertuples()}
    assert got == {
        k: (round(v / 3, 2), abs(v - 100) + 1) for k, v in last.items()
    }


def test_bare_measure_unknown_call_still_raises(spark, price_df):
    with pytest.raises(NotImplementedError, match="supported"):
        match_recognize(
            price_df,
            """
            PARTITION BY k
            ORDER BY ts
            MEASURES STDDEV(A.price) + 1 AS sd
            ONE ROW PER MATCH
            PATTERN (A+)
            DEFINE A AS A.price > 0
            """,
        )
