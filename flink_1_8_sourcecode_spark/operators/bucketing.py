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
        import shutil

        spark = df.sparkSession
        if spark.catalog.tableExists(table_name):
            # DROP TABLE removes a managed table's data with it; an
            # external table's location belongs to the user — never
            # touched (the fresh saveAsTable gets a managed location)
            spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        else:
            # orphaned location: a prior session's managed dir outlived
            # its catalog entry and would block saveAsTable with
            # LOCATION_ALREADY_EXISTS.  Only a local-filesystem path
            # under the managed warehouse is ever deleted — remote
            # warehouses (hdfs://, s3a://) are left for the catalog to
            # reconcile
            warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            if "://" not in warehouse or warehouse.startswith("file:"):
                root = warehouse.removeprefix("file:")
                if "." in table_name:
                    db, tbl = table_name.rsplit(".", 1)
                    loc = os.path.join(root, f"{db.lower()}.db", tbl.lower())
                else:
                    loc = os.path.join(root, table_name.lower())
                shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.format("parquet").saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
