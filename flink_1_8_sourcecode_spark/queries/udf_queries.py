"""UDF / UDTF / lateral-join inventory (SURVEY.md §2.12, §2.4 lateral).

Reference: ScalarFunction (flink-table-common/.../functions/ScalarFunction.java:49),
TableFunction + joinLateral (TableFunction.java:85; table.scala:627;
DataStreamCorrelate.scala), registered via TableEnvironment.registerFunction
(TableEnvironment.scala:439).

Spark: scalar UDFs via pandas_udf (Arrow-vectorized — the fast Python
path); UDTF/lateral via explode/posexplode of an array-returning
expression (LATERAL VIEW), which stays fully JVM-side here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.queries import register


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount < 0.03 THEN 'low'
                WHEN l_discount < 0.07 THEN 'mid'
                ELSE 'high' END AS band,
           l_extendedprice * (1 - l_discount) AS net
    FROM lineitem WHERE l_orderkey < 500
    """,
    doc="ScalarFunction via Arrow-batched pandas_udf (vectorized, not "
    "row-at-a-time — SURVEY §2.12 'UDFs are the slow path' mitigation).",
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("string")
    def discount_band(d: pd.Series) -> pd.Series:
        return pd.cut(
            d, bins=[-1, 0.03, 0.07, 2], labels=["low", "mid", "high"], right=False
        ).astype(str)

    @pandas_udf("double")
    def net_price(price: pd.Series, d: pd.Series) -> pd.Series:
        return price * (1 - d)

    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        discount_band("l_discount").alias("band"),
        net_price("l_extendedprice", "l_discount").alias("net"),
    )


@register(
    "udtf_lateral_explode",
    oracle="""
    SELECT doc_id, t.pos - 1 AS pos, t.tok FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x != ''),
               (x, i) -> {'pos': i, 'tok': x})) AS t
      FROM documents WHERE doc_id < 20
    )
    """,
    doc="TableFunction + joinLateral (LATERAL VIEW): tokenize into "
    "(pos, token) rows via posexplode.",
)
def udtf_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_1_8_sourcecode_spark.operators.text import tokens

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )


@register(
    "udf_registered_sql",
    oracle="""
    SELECT o_orderkey, (o_totalprice * 1.1) AS with_tax
    FROM orders WHERE o_orderkey < 200
    """,
    doc="registerFunction + SQL usage (TableEnvironment.scala:439): a UDF "
    "registered on the session and invoked from spark.sql.",
)
def udf_registered_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def with_tax(p: pd.Series) -> pd.Series:
        return p * 1.1

    spark.udf.register("with_tax", with_tax)
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, with_tax(o_totalprice) AS with_tax "
        "FROM orders WHERE o_orderkey < 200"
    )
