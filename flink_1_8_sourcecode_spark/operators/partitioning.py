"""Physical distribution operators — SURVEY.md §2.10.

Reference parity: DataSet.partitionByHash/partitionByRange/rebalance/
sortPartition (flink-java/.../DataSet.java:1257,1297,1385,1401), stream
shuffle/rebalance/rescale/broadcast (DataStream.java:355-499), ship
strategies (OutputEmitter.java).

In Spark these are explicit Exchange requests; Catalyst/AQE normally
decides — use these only to pre-shape data (e.g. co-locate before
repeated joins) or to fix skew (``salted_keys``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partition_by_hash(df: DataFrame, cols: list[str], n: int | None = None) -> DataFrame:
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def partition_by_range(df: DataFrame, cols: list[str], n: int | None = None) -> DataFrame:
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)


def rebalance(df: DataFrame, n: int) -> DataFrame:
    """Round-robin redistribution (DataSet.rebalance)."""
    return df.repartition(n)


def rescale_down(df: DataFrame, n: int) -> DataFrame:
    """Shuffle-free partition merge (closest analogue of rescale)."""
    return df.coalesce(n)


def sort_partition(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """Per-partition local sort (DataSet.sortPartition:1401)."""
    return df.sortWithinPartitions(*cols)


def salted_keys(df: DataFrame, key: str, buckets: int) -> DataFrame:
    """Skew mitigation: append a salt column; join the other side against
    an exploded (key, salt) dimension.  AQE's skew-join handles most
    cases automatically — this is the manual escape hatch."""
    return df.withColumn("__salt", (F.rand(seed=42) * buckets).cast("int"))
