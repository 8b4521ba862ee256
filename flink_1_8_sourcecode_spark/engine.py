"""TableEnvironment-style facade.

Reference parity: TableEnvironment.sqlQuery/registerTable/registerFunction
(flink-table/.../table/api/TableEnvironment.scala:740,439).  Steps 1-5 of
the reference's query lifecycle (parse/validate/rel/optimize/translate,
SURVEY.md §3.1) are all ``spark.sql`` — only the Flink-specific SQL
spellings go through the pre-rewrite layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_8_sourcecode_spark.catalog import TABLES, table
from flink_1_8_sourcecode_spark.plans import rewrite_flink_sql
from flink_1_8_sourcecode_spark.session import get_spark


class Engine:
    """The engine's ExecutionEnvironment + TableEnvironment in one."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()

    # --- catalog -----------------------------------------------------
    def register_testdata(self, sf_dir: str) -> None:
        for t in TABLES:
            self.register(t, table(self.spark, sf_dir, t))

    def register(self, name: str, df: DataFrame) -> None:
        """registerTable (TableEnvironment.scala:439)."""
        df.createOrReplaceTempView(name)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # --- SQL ---------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """sqlQuery (TableEnvironment.scala:740) with the Flink-SQL
        pre-rewrite (TUMBLE/HOP/SESSION -> window())."""
        return self.spark.sql(rewrite_flink_sql(query))

    # --- functions ---------------------------------------------------
    def register_function(self, name: str, fn, return_type=None) -> None:
        """registerFunction (ScalarFunction.java:49 parity)."""
        self.spark.udf.register(name, fn, return_type)
