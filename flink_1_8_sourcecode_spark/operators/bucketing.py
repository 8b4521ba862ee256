"""Bucketed tables — exchange-free co-located joins.

Reference parity: Flink's batch optimizer reuses "interesting
properties" (existing partitionings) to avoid re-shuffles
(flink-optimizer/.../dataproperties/); Spark's equivalent persistent
mechanism is bucketed tables: both join sides pre-hash-partitioned and
sorted on the join key at write time, so repeated joins/aggregations on
that key skip the Exchange entirely.

At 100 TB this converts every fact-fact join on the bucket key from a
full two-sided shuffle into a zipped per-bucket merge — the single
biggest recurring-cost lever for a star schema that is joined daily.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) table."""
    if mode == "overwrite":
        # a managed-table location can outlive its catalog entry (fresh
        # session, old warehouse dir) and then block saveAsTable with
        # LOCATION_ALREADY_EXISTS — drop both metadata and location
        import shutil

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
