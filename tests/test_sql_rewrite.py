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
