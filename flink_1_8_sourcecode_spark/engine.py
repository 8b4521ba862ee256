"""TableEnvironment-style facade.

Reference parity: TableEnvironment.sqlQuery/registerTable/registerFunction
(flink-table/.../table/api/TableEnvironment.scala:740,439).  Steps 1-5 of
the reference's query lifecycle (parse/validate/rel/optimize/translate,
SURVEY.md §3.1) are all ``spark.sql`` — only the Flink-specific SQL
spellings go through the pre-rewrite layer.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from flink_1_8_sourcecode_spark.catalog import TABLES, table
from flink_1_8_sourcecode_spark.plans import rewrite_flink_sql
from flink_1_8_sourcecode_spark.session import get_spark

_MATCH_RECOGNIZE = re.compile(r"\bFROM\s+(?P<tbl>\w+)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE)


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
        pre-rewrite (TUMBLE/HOP/SESSION -> window()) and SQL
        MATCH_RECOGNIZE routing (DataStreamMatch.scala:65): ``FROM t
        MATCH_RECOGNIZE (<clause>)`` runs the CEP engine on ``t`` and
        splices the result back in as a view, so the outer SELECT stays
        plain Spark SQL.  Subset: one MATCH_RECOGNIZE per query, over a
        registered table name."""
        query = self._route_match_recognize(query)
        return self.spark.sql(rewrite_flink_sql(query))

    def _route_match_recognize(self, query: str) -> str:
        m = _MATCH_RECOGNIZE.search(query)
        if not m:
            return query
        from flink_1_8_sourcecode_spark.cep.match_recognize import match_recognize
        from flink_1_8_sourcecode_spark.plans.sql_rewrite import _find_call

        open_paren = m.end() - 1
        close = _find_call(query, open_paren)
        clause = query[m.end() : close - 1]
        out = match_recognize(self.table(m.group("tbl")), clause)
        view = f"__mr_{abs(hash(clause)) % 10**8}"
        out.createOrReplaceTempView(view)
        # a trailing "AS alias" after the close paren keeps working —
        # the view name simply takes the table position
        return query[: m.start()] + f"FROM {view}" + query[close:]

    # --- functions ---------------------------------------------------
    def register_function(self, name: str, fn, return_type=None) -> None:
        """registerFunction (ScalarFunction.java:49 parity)."""
        self.spark.udf.register(name, fn, return_type)
