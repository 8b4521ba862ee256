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
