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
        return _read_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Load events with a dtype-aware ``ts`` normalisation.

    The driver's testdata has shipped ``ts`` both as parquet
    TIMESTAMP(MICROS) (reads natively as a timestamp) and as
    TIMESTAMP(NANOS) (Spark 4 refuses it unless
    ``spark.sql.legacy.parquet.nanosAsLong`` maps it to epoch-nanos
    long).  Branch on what the file actually contains instead of
    assuming either shape.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    try:
        df = spark.read.parquet(path)
    except Exception as exc:
        # Retry ONLY for the TIMESTAMP(NANOS) shape; any other failure
        # (missing file, corrupt footer) must surface as-is rather than
        # leak legacy-read semantics into the whole session.
        msg = str(exc)
        if not ("NANOS" in msg or "nanosAsLong" in msg):
            raise
        # The conf must stay set for the session: the returned DataFrame
        # is lazy, so the nanos mapping is consulted again at job run
        # time, not just at schema inference.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, LongType):
        # Epoch-nanos long (nanosAsLong path): truncate to microseconds
        # exactly (integer div — double math would lose precision above
        # 2^53).  Matches DuckDB's ns->us cast semantics.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (SQL entry point)."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
