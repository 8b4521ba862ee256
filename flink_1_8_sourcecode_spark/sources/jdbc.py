"""JDBC input/output — parity with the reference's flink-jdbc connector.

Reference:
- flink-connectors/flink-jdbc/src/main/java/org/apache/flink/api/java/io/
  jdbc/JDBCInputFormat.java (parallel reads split by a
  ParameterValuesProvider — here Spark's partitionColumn/lowerBound/
  upperBound/numPartitions, the same numeric-range splitting as
  NumericBetweenParametersProvider)
- .../jdbc/JDBCOutputFormat.java and JDBCAppendTableSink (batched
  INSERTs — Spark's df.write.jdbc batches via the JDBC driver).

Scale notes: a partitioned read issues one range query per partition so
executors pull in parallel; an unpartitioned read is a single-connection
scan (fine for dimension-sized tables only).  Pushdown: Spark sends
filters/column pruning into the generated SQL where the dialect allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_input(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
    driver: str | None = None,
    fetch_size: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBCInputFormat.buildJDBCInputFormat parity.

    ``table`` may be a table name or a subquery alias
    (``"(SELECT ...) t"``).  Exactly one split strategy applies:
    - ``partition_column`` + bounds + ``num_partitions`` -> numeric
      range splits (NumericBetweenParametersProvider);
    - ``predicates`` -> one partition per WHERE fragment
      (GenericParameterValuesProvider);
    - neither -> single-partition read.
    """
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    if fetch_size is not None:
        props["fetchsize"] = str(fetch_size)
    reader = spark.read
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        return reader.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=props,
        )
    if predicates is not None:
        return reader.jdbc(url, table, predicates=predicates, properties=props)
    return reader.jdbc(url, table, properties=props)


def jdbc_output(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    *,
    driver: str | None = None,
    batch_size: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """JDBCOutputFormat / JDBCAppendTableSink parity: batched INSERTs,
    one connection per partition."""
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    if batch_size is not None:
        props["batchsize"] = str(batch_size)
    df.write.jdbc(url, table, mode=mode, properties=props)
