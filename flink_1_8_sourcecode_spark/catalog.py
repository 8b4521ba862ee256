"""Table catalog over the driver's parquet testdata.

Reference parity: Flink's ``TableEnvironment.registerTable`` /
``registerTableSource`` (flink-table/.../table/api/TableEnvironment.scala)
binds named tables to sources; scans are projectable/filterable
(flink-table/.../table/sources/CsvTableSource.scala:50).  In Spark the
parquet reader gives predicate pushdown + column pruning + partition
pruning for free, so this module is a thin registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
        # read natively: take it as epoch-nanos long and truncate to
        # microseconds exactly (integer div — double math would lose
        # precision above 2^53).  Matches DuckDB's ns->us cast semantics.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL entry point)."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
