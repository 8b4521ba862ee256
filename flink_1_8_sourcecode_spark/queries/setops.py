"""Set-operation inventory (SURVEY.md §2.9).

Covers: union/unionAll (DataSet.java:1241, table.scala:885,905),
intersect/intersectAll (table.scala:927,950 / IntersectCoGroupFunction.scala),
minus/minusAll i.e. EXCEPT (table.scala:838,863 / MinusCoGroupFunction.scala).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping projections of lineitem (duplicates retained —
    multiset semantics matter for the ALL variants).  Projection is
    (l_orderkey, l_returnflag): fine-grained enough that EVERY set op
    — incl. EXCEPT/EXCEPT ALL — is non-empty at all SFs (the r11
    verdict's vacuity audit; the old l_suppkey projection was dense
    enough that B covered A and the EXCEPT oracles checked 0 rows)."""
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select("l_orderkey", "l_returnflag")
    b = li.filter(F.col("l_extendedprice") > 30000).select("l_orderkey", "l_returnflag")
    return a, b


_A = "SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_quantity >= 25"
_B = "SELECT l_orderkey, l_returnflag FROM lineitem WHERE l_extendedprice > 30000"


@register(
    "setop_union_all",
    oracle=f"""
    SELECT l_orderkey, l_returnflag, count(*) AS cnt FROM ({_A} UNION ALL {_B})
    GROUP BY l_orderkey, l_returnflag
    """,
    doc="UNION ALL (DataSet.union keeps duplicates).",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return (
        a.union(b)
        .groupBy("l_orderkey", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "setop_union_distinct",
    oracle=f"{_A} UNION {_B}",
    doc="UNION with dedup (table.scala:885 union).",
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.union(b).distinct()


@register(
    "setop_intersect",
    oracle=f"{_A} INTERSECT {_B}",
    doc="INTERSECT (set semantics).",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.intersect(b)


@register(
    "setop_intersect_all",
    oracle=f"{_A} INTERSECT ALL {_B}",
    doc="INTERSECT ALL (multiset: min of per-side multiplicities).",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.intersectAll(b)


@register(
    "setop_except",
    oracle=f"{_A} EXCEPT {_B}",
    doc="MINUS / EXCEPT (set semantics).",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.subtract(b)


@register(
    "setop_except_all",
    oracle=f"{_A} EXCEPT ALL {_B}",
    doc="MINUS ALL / EXCEPT ALL (multiset: multiplicity difference).",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a, b = _sides(spark, sf_dir)
    return a.exceptAll(b)
