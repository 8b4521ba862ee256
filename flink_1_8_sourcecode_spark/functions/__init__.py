"""Scalar/aggregate function layer.

Flink 1.8's function catalog (flink-table/.../validate/FunctionCatalog.scala:157-508)
maps ~95% 1:1 onto ``pyspark.sql.functions``; this package holds only the
spellings Flink has and Spark lacks (see ``scalar``).
"""

from flink_1_8_sourcecode_spark.functions.scalar import (
    at,
    cot,
    element,
    overlaps,
    rand_integer,
    similar_to,
    truncate,
)

__all__ = ["at", "cot", "element", "overlaps", "rand_integer", "similar_to", "truncate"]
