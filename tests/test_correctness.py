"""Driver-t2-style correctness: every registry query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from flink_1_8_sourcecode_spark.queries import load_all
from tests.conftest import check_query

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir):
    check_query(REGISTRY[name], spark, sf_dir)
