"""Batch operator layer — the pieces Spark doesn't spell natively.

Everything here is a composition of DataFrame operations (shuffle-
conscious, AQE-friendly); Pandas UDFs appear only where per-group
imperative logic is genuinely required (cogroup apply).
"""

from flink_1_8_sourcecode_spark.operators.joins import asof_join, interval_join

__all__ = ["asof_join", "interval_join"]
