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
