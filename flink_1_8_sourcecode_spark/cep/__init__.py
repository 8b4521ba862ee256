"""CEP: complex event processing (SURVEY.md §2.14).

Pattern DSL + NFA matcher with the surface of the reference's
flink-cep library (Pattern.java, NFA.java:85, PatternStream.java),
executed Spark-side as ``applyInPandas`` over per-key time-ordered
groups (batch) — the pattern spec travels as data to the workers.
"""

from flink_1_8_sourcecode_spark.cep.pattern import Pattern
from flink_1_8_sourcecode_spark.cep.matcher import match_pattern

__all__ = ["Pattern", "match_pattern"]
