"""Thin, typed wrappers over Spark's readers/writers.

These exist to pin the reference's semantics (header-less CSV with
declared schema, JSON-per-line with declared schema — Flink never
infers at runtime, SURVEY.md §1.2) and to be the single place where
read options are set project-wide.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """readTextFile: one string column named 'value'."""
    return spark.read.text(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    sep: str = ",",
    header: bool = False,
    **options,
) -> DataFrame:
    """readCsvFile: declared schema (never inferred), configurable
    delimiter — RowCsvInputFormat parity."""
    return spark.read.csv(path, schema=schema, sep=sep, header=header, **options)


def read_json_lines(spark: SparkSession, path: str, schema: str | StructType) -> DataFrame:
    """JSON-per-record with declared schema (JsonRowDeserializationSchema)."""
    return spark.read.schema(schema).json(path)


def json_column(col, schema: str):
    """from_json for embedded JSON string columns (events.props)."""
    return F.from_json(col, schema)


def from_elements(spark: SparkSession, rows: Iterable, schema: str | StructType) -> DataFrame:
    """fromElements/fromCollection (ExecutionEnvironment.java:602,692)."""
    return spark.createDataFrame(list(rows), schema)


def generate_sequence(spark: SparkSession, start: int, end: int) -> DataFrame:
    """generateSequence(from, to) — inclusive bounds like Flink."""
    return spark.range(start, end + 1).select(F.col("id"))


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """writeAsText (DataSet.java:1492): single string column to text parts."""
    df.write.mode(mode).text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", sep: str = ",", **options) -> None:
    """writeAsCsv (DataSet.java:1564) / CsvTableSink."""
    df.write.mode(mode).option("sep", sep).csv(path, **options)


def read_input_format(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    schema: str | StructType | None = None,
    **options,
) -> DataFrame:
    """Custom InputFormat surface (ExecutionEnvironment.createInput /
    readFile with a user InputFormat): Spark's pluggable DataSource V2
    registry plays the InputFormat role — ``fmt`` is any registered
    short name or provider class (parquet/orc/avro/csv/json/jdbc/...).
    A declared schema is applied when given (Flink never infers)."""
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path) if path is not None else r.load()


def add_source(
    spark: SparkSession,
    generate: "callable",
    schema: str | StructType,
    num_partitions: int | None = None,
) -> DataFrame:
    """Custom batch source (StreamExecutionEnvironment.addSource /
    SourceFunction run-loop, bounded case): ``generate(partition_index,
    n_partitions)`` yields row tuples for one split — the same
    split-parallel contract as InputFormat.createInputSplits + open.
    Runs distributed via a range seed + mapInPandas (Arrow batches);
    for unbounded custom sources use the documented foreachBatch
    loopback (streaming/sources.py)."""
    import pandas as pd

    n = num_partitions or spark.sparkContext.defaultParallelism
    seeds = spark.range(n).repartition(n, "id")
    target = spark.createDataFrame([], schema).schema

    def run(batches):
        for pdf in batches:
            for pid in pdf["id"]:
                rows = list(generate(int(pid), n))
                if rows:
                    yield pd.DataFrame(rows, columns=[f.name for f in target.fields])

    return seeds.mapInPandas(run, target)
