"""Declared query inventory — the engine's correctness surface.

Every operator claimed in SURVEY.md §2 appears here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs
on the same parquet tables.  The driver hash-compares both sides.

Naming contract: every computed column is aliased identically in the
Spark code and the oracle SQL (driver sorts columns by name).
"""

from __future__ import annotations

import importlib
import os
import tempfile
import uuid as _uuid
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Per-process unique root for conditioned-oracle export artifacts
# (trained centroids/codebooks/weights the DuckDB oracle re-reads).
# The path is baked into the oracle SQL at import time, so it must be
# stable within a process — but unique ACROSS processes, or two
# concurrent sweeps on one host would clobber each other's artifacts.
EXPORT_ROOT = os.path.join(
    tempfile.gettempdir(),
    f"spark_graft_exports_{os.getpid()}_{_uuid.uuid4().hex[:8]}",
)


def export_path(name: str) -> str:
    """Collision-free export directory for one conditioned-oracle
    artifact; same value for the query writer and the oracle reader
    inside a process, distinct between processes."""
    return os.path.join(EXPORT_ROOT, name)


@dataclass(frozen=True)
class Query:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None => rows-only check
    doc: str = ""
    bench: bool = False  # include in bench.py headline set
    # a 0-row oracle "passes" while checking nothing (r11 verdict found
    # dataset_api_tpch_q10 vacuous this way) — conftest.check_query
    # fails 0-row oracles at sf>=0.01 unless the query declares
    # emptiness is the point (e.g. join_anti: every order has a
    # customer, so the anti side is PROVABLY empty)
    expect_empty: bool = False


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
    expect_empty: bool = False,
):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, spark=fn, oracle=oracle, doc=doc, bench=bench,
            expect_empty=expect_empty,
        )
        return fn

    return deco


_MODULES = (
    "tpch",
    "joins",
    "aggregates",
    "setops",
    "sorts",
    "scalar_functions",
    "over_windows",
    "group_windows",
    "dedup",
    "similarity",
    "text_analysis",
    "cep_queries",
    "graph_queries",
    "udf_queries",
    "rowops",
    "sql_suite",
    "multimodal_queries",
    "streaming_windows",
    "pipeline_ops",
    "examples",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    for m in _MODULES:
        importlib.import_module(f"flink_1_8_sourcecode_spark.queries.{m}")
    return REGISTRY
