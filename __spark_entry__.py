"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship TPC-H Q3 on sf0.001.
queries()     -> every declared query from SURVEY.md §2 (name -> callable).
oracle_sql()  -> matching DuckDB SQL per query (omitted => rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_1_8_sourcecode_spark.queries import load_all  # noqa: E402

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3, the reference's own example query) on sf0.001."""
    return _REGISTRY["tpch_q3"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
