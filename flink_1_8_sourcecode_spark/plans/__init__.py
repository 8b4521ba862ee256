"""SQL planning layer.

Catalyst does everything the reference's optimizer does (SURVEY.md §4 —
zero custom rules required for relational parity); what remains is a thin
*pre-rewrite* for Flink-1.8 SQL spellings Spark doesn't parse:
TUMBLE/HOP/SESSION group windows and their _START/_END auxiliaries
(FunctionCatalog.scala:495-509).
"""

from flink_1_8_sourcecode_spark.plans.sql_rewrite import rewrite_flink_sql

__all__ = ["rewrite_flink_sql"]
