"""Batch sources & sinks — SURVEY.md §2.1 / §2.2.

Readers parity: readTextFile (ExecutionEnvironment.java:393), readCsvFile
(CsvReader.java / RowCsvInputFormat.java), CsvTableSource (projectable/
filterable — Spark's readers push down natively), JSON per-record
(JsonRowDeserializationSchema.java:52 -> from_json), parquet/orc native,
JDBC (JDBCInputFormat.java -> spark.read.jdbc), collections
(fromCollection/fromElements/generateSequence).

Sinks parity: writeAsText/writeAsCsv/write (DataSet.java:1492,1564,1740),
CsvTableSink; print/collect/count are DataFrame actions.
"""

from flink_1_8_sourcecode_spark.sources.io import (
    from_elements,
    generate_sequence,
    read_csv,
    read_json_lines,
    read_text,
    write_csv,
    write_text,
)

__all__ = [
    "from_elements",
    "generate_sequence",
    "read_csv",
    "read_json_lines",
    "read_text",
    "write_csv",
    "write_text",
]
