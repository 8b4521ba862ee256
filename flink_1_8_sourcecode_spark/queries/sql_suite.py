"""SQL entry-point suite — SURVEY.md §3.1 / §4.1.

The reference rewrites IN/EXISTS/scalar subqueries to joins
(SubQueryRemoveRule, FlinkRuleSets.scala:37-39) and decorrelates
(RelDecorrelator, StreamTableEnvironment.scala:810); Catalyst does the
same (RewritePredicateSubquery).  These queries go through
``Engine.sql`` verbatim — the SQL text doubles as the DuckDB oracle, so
the check is pure engine-vs-engine semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_8_sourcecode_spark.engine import Engine
from flink_1_8_sourcecode_spark.queries import register


def _sql_query(name: str, sql: str, doc: str):
    @register(name, oracle=sql, doc=doc)
    def run(spark: SparkSession, sf_dir: str, _sql=sql) -> DataFrame:
        eng = Engine(spark)
        eng.register_testdata(sf_dir)
        return eng.sql(_sql)

    return run


_sql_query(
    "sql_in_subquery",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9500)
      AND o_totalprice > 300000
    """,
    "IN subquery -> semi join (SubQueryRemoveRule parity).",
)

_sql_query(
    "sql_exists_correlated",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT'
                    AND o.o_totalprice > 350000)
    """,
    "Correlated EXISTS -> decorrelated semi join (RelDecorrelator parity).",
)

_sql_query(
    "sql_not_in_subquery",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
    """,
    "NOT IN -> null-aware anti join.",
)

_sql_query(
    "sql_scalar_subquery",
    """
    SELECT n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_customers
    FROM nation
    """,
    "Correlated scalar subquery -> left outer aggregate join.",
)

_sql_query(
    "sql_having_window_mix",
    """
    SELECT l_returnflag, l_linestatus, n_items, total FROM (
      SELECT l_returnflag, l_linestatus, count(*) AS n_items,
             sum(l_extendedprice) AS total
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      HAVING count(*) > 100
    ) WHERE total > 1000000
    """,
    "HAVING + derived-table filtering through the SQL entry.",
)


_sql_query(
    "sql_topn_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    "The canonical Flink SQL Top-N recipe (ROW_NUMBER per group, "
    "filter rn <= N — the pattern the reference's planner recognizes "
    "as a rank retraction operator): top-3 orders per customer.",
)

_sql_query(
    "sql_dedup_latest",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    "The canonical Flink SQL deduplication recipe (ROW_NUMBER ... "
    "ORDER BY time DESC, keep rn = 1): latest event per user — the "
    "SQL form of dedup-by-key.",
)
