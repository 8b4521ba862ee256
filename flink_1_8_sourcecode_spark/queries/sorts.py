"""Sort / limit / offset / top-k inventory (SURVEY.md §2.8).

Covers: global sort via range partitioning (DataSetSort.scala — Spark's
orderBy uses the identical RangePartitioner strategy), offset/fetch
(table.scala:1009,1030 / LimitFilterFunction.scala), first(n)
(DataSet.java:574), top-k composition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


@register(
    "sort_global",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier ORDER BY s_acctbal DESC, s_suppkey
    """,
    doc="Global ORDER BY: range-partitioned sort, fully deterministic tiebreak.",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "supplier")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@register(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15 OFFSET 10
    """,
    doc="OFFSET + FETCH (table.scala:1009,1030).",
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(15)
    )


@register(
    "sort_first_n",
    oracle="""
    SELECT p_partkey, p_name FROM part ORDER BY p_partkey LIMIT 25
    """,
    doc="first(n) (DataSet.java:574) — deterministic via explicit order.",
)
def sort_first_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "part").orderBy("p_partkey").select("p_partkey", "p_name").limit(25)


@register(
    "sort_top_k_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 50
    """,
    doc="Global top-k: TakeOrderedAndProject (no full sort materialized).",
)
def sort_top_k_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(50)
    )
