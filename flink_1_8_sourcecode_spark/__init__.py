"""flink_1_8_sourcecode_spark — a PySpark-native analytics engine.

A brand-new engine with the query & data-processing capabilities of
Apache Flink 1.8 (reference: linweijiang/Flink-1.8-SourceCode), built
Spark-first: DataFrame / Spark SQL / Catalyst / Structured Streaming.

Layout
------
- ``session``    : tuned SparkSession bootstrap (AQE, broadcast, Arrow)
- ``catalog``    : testdata table loading / temp-view registration
- ``functions``  : scalar-function shims Flink has but Spark spells
                   differently (1-based AT, SIMILAR TO, OVERLAPS, ...)
- ``operators``  : batch operator layer (joins incl. as-of, aggs,
                   set ops, sorts, partitioning, dedup, similarity,
                   text analysis, multimodal)
- ``plans``      : SQL pre-rewrite (TUMBLE/HOP/SESSION -> window())
- ``streaming``  : Structured Streaming layer (watermarks, windows,
                   stateful ops, count windows)
- ``queries``    : the declared query inventory (each with a DuckDB
                   oracle) — the correctness surface of the engine
"""

from flink_1_8_sourcecode_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
