"""Descriptor / connect API — the declarative source-registration
builder of the reference's Table API (TableEnvironment.scala:656
``connect(ConnectorDescriptor)``; descriptor classes under
flink-table/flink-table-common/.../descriptors/ and
flink-table-planner/.../descriptors/: FileSystem.scala, OldCsv.scala,
Schema.scala, Rowtime.scala, ConnectTableDescriptor.scala).

Real 1.8 user code registers sources with exactly this spelling::

    env.connect(FileSystem().path(p)) \\
       .with_format(OldCsv().field("a", "INT").field("b", "STRING")) \\
       .with_schema(Schema().field("a", "INT").field("b", "STRING")) \\
       .register_table_source("t")

Spark-first lowering: a descriptor chain is nothing but a
``DataFrameReader`` spec — connector -> format+path, format ->
``spark.read.format(...)`` options, schema -> a DDL string — so the
registered table is a plain DataFrame/view and every Catalyst
optimization applies.  Sinks reuse the engine's sink registry
(``Engine.register_sink``), streams go through ``readStream`` with the
same options.  Validation mirrors the reference's
TableFactoryService-style errors: a missing path, a format-needing
connector without a format, or a missing schema raise
``ValidationException`` naming the absent property instead of failing
later inside Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class ValidationException(Exception):
    """api/exceptions ValidationException — descriptor chains fail fast
    with the missing/invalid property named."""


# Flink 1.8 type strings (TypeStringUtils) -> Spark DDL types
_TYPE_MAP = {
    "VARCHAR": "string", "STRING": "string",
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint", "BYTE": "tinyint",
    "SMALLINT": "smallint", "SHORT": "smallint",
    "INT": "int", "INTEGER": "int",
    "BIGINT": "bigint", "LONG": "bigint",
    "FLOAT": "float", "REAL": "float",
    "DOUBLE": "double",
    "DECIMAL": "decimal(38,18)",
    "DATE": "date", "SQL_DATE": "date",
    "TIMESTAMP": "timestamp", "SQL_TIMESTAMP": "timestamp",
    # Spark has no TIME type.  REPO CONVENTION (SURVEY §1.1):
    # time-of-day surfaces as INT MILLIS since midnight — the physical
    # read stays the lexical string ("HH:MM:SS[.fff]"), and
    # Schema.apply_to derives the int-millis column from it.
    "TIME": "string", "SQL_TIME": "string",
}

_TIME_TYPES = ("TIME", "SQL_TIME")


def time_millis_from_lexical(col):
    """TIME convention (SURVEY §1.1): lexical "HH:MM:SS[.fff]" ->
    int millis since midnight (shared by Schema.apply_to and the
    sink-registry read path)."""
    from pyspark.sql import functions as F

    p = F.split(col.cast("string"), ":")
    return (
        (p[0].cast("long") * 3600 + p[1].cast("long") * 60) * 1000
        + F.round(p[2].cast("double") * 1000).cast("long")
    ).cast("int")


def time_millis_to_lexical(col):
    """int millis since midnight -> "HH:mm:ss.SSS" (the sink-side
    render so TIME columns round-trip insert -> scan unchanged)."""
    from pyspark.sql import functions as F

    ms = col.cast("long")
    return F.concat(
        F.lpad((ms / 3600000).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((ms / 60000) % 60).cast("long").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad(((ms / 1000) % 60).cast("long").cast("string"), 2, "0"),
        F.lit("."),
        F.lpad((ms % 1000).cast("string"), 3, "0"),
    )


def conform_to_schema(df: "DataFrame", fields: list) -> "DataFrame":
    """Sink-side schema conformance (TableSinkUtils.validateSink
    parity): arity-check the projection against the declared fields,
    then cast POSITIONALLY (a toDF rename first — the projection may
    carry duplicate auto-generated names, e.g. ``SELECT 99, 99``
    through UNION ALL, where name-based refs are ambiguous) and render
    TIME columns back to their lexical form."""
    if len(df.columns) != len(fields):
        raise ValidationException(
            f"insert into table: query has {len(df.columns)} columns "
            f"but the table schema declares {len(fields)} "
            f"({', '.join(f['name'] for f in fields)})"
        )
    tmp = df.toDF(*[f"__c{i}" for i in range(len(df.columns))])

    def _out(i: int, f: dict):
        src = tmp[f"__c{i}"]
        if f.get("time"):
            return time_millis_to_lexical(src).alias(f["name"])
        return src.cast(f["type"]).alias(f["name"])

    return tmp.select(*[_out(i, f) for i, f in enumerate(fields)])


def _spark_type(t: str) -> str:
    tu = t.strip().upper()
    if tu.startswith("DECIMAL(") and tu.endswith(")"):
        return tu.lower()
    if tu not in _TYPE_MAP:
        raise ValidationException(
            f"unsupported field type {t!r} (supported: "
            f"{sorted(_TYPE_MAP)} and DECIMAL(p,s))"
        )
    return _TYPE_MAP[tu]


class ConnectorDescriptor:
    """descriptors/ConnectorDescriptor.java — base of the connector
    half of a descriptor chain."""

    connector_type = "?"
    format_needed = True


class FileSystem(ConnectorDescriptor):
    """descriptors/FileSystem.scala: ``FileSystem().path(p)``."""

    connector_type = "filesystem"
    format_needed = True

    def __init__(self):
        self._path: str | None = None

    def path(self, path: str) -> "FileSystem":
        self._path = path
        return self

    def validate(self) -> str:
        if not self._path:
            raise ValidationException(
                "filesystem connector: missing required property 'path' "
                "(FileSystem().path(...))"
            )
        return self._path


class FormatDescriptor:
    """descriptors/FormatDescriptor.java — base of the format half."""

    format_type = "?"

    def spark_format(self) -> str:
        raise NotImplementedError

    def spark_options(self) -> dict:
        return {}

    def fields_ddl(self) -> str | None:
        return None

    def validate(self) -> None:
        pass


class OldCsv(FormatDescriptor):
    """descriptors/OldCsv.scala — Flink 1.8's built-in CSV format
    (the non-RFC splitting one).  Spark's CSV reader covers every
    knob the descriptor exposes."""

    format_type = "csv"

    def __init__(self):
        self._fields: list[tuple[str, str]] = []
        self._options: dict = {}

    def field(self, name: str, field_type: str) -> "OldCsv":
        if any(n == name for n, _ in self._fields):
            raise ValidationException(f"duplicate format field {name!r}")
        self._fields.append((name, _spark_type(field_type)))
        return self

    def field_delimiter(self, delim: str) -> "OldCsv":
        self._options["sep"] = delim
        return self

    def line_delimiter(self, delim: str) -> "OldCsv":
        self._options["lineSep"] = delim
        return self

    def quote_character(self, quote: str) -> "OldCsv":
        self._options["quote"] = quote
        return self

    def comment_prefix(self, prefix: str) -> "OldCsv":
        self._options["comment"] = prefix
        return self

    def ignore_first_line(self) -> "OldCsv":
        self._options["header"] = "true"
        return self

    def ignore_parse_errors(self) -> "OldCsv":
        self._options["mode"] = "DROPMALFORMED"
        return self

    def spark_format(self) -> str:
        return "csv"

    def spark_options(self) -> dict:
        return dict(self._options)

    def fields_ddl(self) -> str | None:
        if not self._fields:
            return None
        return ", ".join(f"{n} {t}" for n, t in self._fields)

    def validate(self) -> None:
        if not self._fields:
            raise ValidationException(
                "csv format: missing field declarations "
                "(OldCsv().field(name, type)...) — the 1.8 CSV format "
                "cannot derive a schema"
            )


class Csv(OldCsv):
    """flink-formats/flink-csv descriptors/Csv — the RFC-4180 CSV
    format; Spark's CSV reader IS RFC-compliant, so the lowering is the
    same as OldCsv plus schema derivation support."""

    def __init__(self):
        super().__init__()
        self._derive = False

    def derive_schema(self) -> "Csv":
        self._derive = True
        return self

    def validate(self) -> None:
        if not self._fields and not self._derive:
            raise ValidationException(
                "csv format: declare fields or call derive_schema()"
            )


class Json(FormatDescriptor):
    """flink-formats/flink-json descriptors/Json: JSON-lines files;
    ``json_schema``/``fail_on_missing_field`` map to Spark reader
    options, ``derive_schema`` defers to the table schema."""

    format_type = "json"

    def __init__(self):
        self._derive = True
        self._fail_on_missing = False

    def derive_schema(self) -> "Json":
        self._derive = True
        return self

    def fail_on_missing_field(self, flag: bool = True) -> "Json":
        self._fail_on_missing = flag
        return self

    def spark_format(self) -> str:
        return "json"

    def spark_options(self) -> dict:
        return {"mode": "FAILFAST"} if self._fail_on_missing else {}


class Rowtime:
    """descriptors/Rowtime.scala: event-time attribute spec —
    ``timestamps_from_field`` + ``watermarks_periodic_bounded``."""

    def __init__(self):
        self.from_field: str | None = None
        self.delay_ms: int | None = None

    def timestamps_from_field(self, name: str) -> "Rowtime":
        self.from_field = name
        return self

    def watermarks_periodic_bounded(self, delay_ms: int) -> "Rowtime":
        self.delay_ms = int(delay_ms)
        return self


class Schema:
    """descriptors/Schema.scala: the table schema half —
    ``field(name, type)``, ``from_origin`` (the Scala ``from``, renames
    a physical field), ``proctime`` and ``rowtime``."""

    def __init__(self):
        self._fields: list[dict] = []

    def field(self, name: str, field_type: str) -> "Schema":
        if any(f["name"] == name for f in self._fields):
            raise ValidationException(f"duplicate schema field {name!r}")
        self._fields.append(
            {"name": name, "type": _spark_type(field_type), "origin": None,
             "proctime": False, "rowtime": None,
             "time": field_type.strip().upper() in _TIME_TYPES}
        )
        return self

    def from_origin(self, origin_field: str) -> "Schema":
        self._last()["origin"] = origin_field
        return self

    def proctime(self) -> "Schema":
        self._last()["proctime"] = True
        return self

    def rowtime(self, rt: Rowtime) -> "Schema":
        if rt.from_field is None:
            raise ValidationException(
                "rowtime: missing timestamps_from_field(...)"
            )
        self._last()["rowtime"] = rt
        return self

    def _last(self) -> dict:
        if not self._fields:
            raise ValidationException(
                "schema: declare a field before qualifying it"
            )
        return self._fields[-1]

    def validate(self) -> None:
        if not self._fields:
            raise ValidationException(
                "schema: at least one field is required "
                "(Schema().field(name, type)...)"
            )

    def apply_to(self, df: DataFrame, streaming: bool) -> DataFrame:
        """Project the physical frame onto the declared schema:
        renames (``from_origin``), casts, proctime/rowtime columns."""
        from pyspark.sql import functions as F

        cols = []
        watermark: tuple[str, int] | None = None
        for f in self._fields:
            if f["proctime"]:
                cols.append(F.current_timestamp().alias(f["name"]))
                continue
            src = F.col(f["origin"] or (
                f["rowtime"].from_field if f["rowtime"] else f["name"]
            ))
            if f.get("time"):
                cols.append(time_millis_from_lexical(src).alias(f["name"]))
                continue
            cols.append(src.cast(f["type"]).alias(f["name"]))
            if f["rowtime"] is not None and f["rowtime"].delay_ms is not None:
                watermark = (f["name"], f["rowtime"].delay_ms)
        out = df.select(*cols)
        if streaming and watermark is not None:
            out = out.withWatermark(
                watermark[0], f"{watermark[1]} milliseconds"
            )
        return out

    def ddl(self) -> str:
        return ", ".join(
            f"{f['name']} {f['type']}" for f in self._fields
            if not f["proctime"]
        )


def _load_source(spark, path, fmt, opts, ddl, schema: Schema,
                 streaming: bool) -> DataFrame:
    if streaming:
        # streaming file sources must state the schema
        reader = spark.readStream.format(fmt).options(**opts).schema(ddl)
    else:
        reader = spark.read.format(fmt).options(**opts)
        if ddl:
            reader = reader.schema(ddl)
    return schema.apply_to(reader.load(path), streaming=streaming)


class ExternalCatalogTable:
    """catalog/ExternalCatalogTable.scala — a descriptor-defined table
    that lives INSIDE an external catalog: the same connector/format/
    schema chain as ``Engine.connect``, but producing a lazy table for
    ``InMemoryExternalCatalog.create_table`` instead of registering a
    session view (the reference's CommonTestData.getInMemoryTestCatalog
    builds its test catalogs exactly this way)."""

    def __init__(self, connector, fmt, schema, streaming):
        self._connector = connector
        self._format = fmt
        self._schema = schema
        self._streaming = streaming

    @staticmethod
    def builder(connector_descriptor) -> "ExternalCatalogTableBuilder":
        return ExternalCatalogTableBuilder(connector_descriptor)

    def table(self, spark) -> DataFrame:
        if not isinstance(self._connector, FileSystem):
            raise ValidationException(
                f"unsupported connector {type(self._connector).__name__}"
            )
        path = self._connector.validate()
        if self._format is None:
            raise ValidationException("missing format descriptor")
        self._format.validate()
        if self._schema is None:
            raise ValidationException("missing schema descriptor")
        self._schema.validate()
        ddl = self._format.fields_ddl() or self._schema.ddl()
        return _load_source(
            spark, path, self._format.spark_format(),
            self._format.spark_options(), ddl, self._schema,
            self._streaming,
        )

    def bind(self, spark):
        """Zero-arg callable for InMemoryExternalCatalog.create_table —
        the source opens lazily on first scan.  (Registering the
        ExternalCatalogTable itself instead keeps the WRITE side too:
        Engine.scan opens it and Engine.insert_into writes through it.)
        """
        return lambda: self.table(spark)

    def write(self, df: DataFrame, overwrite: bool = False) -> None:
        """The sink side (ExternalCatalogInsertTest.scala:48 —
        ``insertInto("test.db3.tb3")``): write through the same
        connector/format spec the scan reads."""
        if not isinstance(self._connector, FileSystem):
            raise ValidationException(
                f"unsupported connector {type(self._connector).__name__}"
            )
        path = self._connector.validate()
        if self._format is None:
            raise ValidationException("missing format descriptor")
        if self._schema is not None:
            # the reference's insertInto validates the sink schema at
            # insert time (TableSinkUtils.validateSink); a positional
            # CSV write with the wrong arity would only surface later
            # as bad casts at scan time
            df = conform_to_schema(
                df, [f for f in self._schema._fields if not f["proctime"]]
            )
        w = (
            df.write.format(self._format.spark_format())
            .options(**self._format.spark_options())
            .mode("overwrite" if overwrite else "append")
        )
        w.save(path)


class ExternalCatalogTableBuilder:
    """ExternalCatalogTableBuilder (ExternalCatalogTable.scala:246):
    ``builder(conn).with_format(f).with_schema(s).supports_batch()``."""

    def __init__(self, connector):
        self._connector = connector
        self._format = None
        self._schema = None
        self._streaming = False

    def with_format(self, fmt) -> "ExternalCatalogTableBuilder":
        self._format = fmt
        return self

    def with_schema(self, schema) -> "ExternalCatalogTableBuilder":
        self._schema = schema
        return self

    def supports_batch(self) -> "ExternalCatalogTableBuilder":
        self._streaming = False
        return self

    def supports_streaming(self) -> "ExternalCatalogTableBuilder":
        self._streaming = True
        return self

    def in_append_mode(self) -> "ExternalCatalogTableBuilder":
        return self

    def as_table_source(self) -> ExternalCatalogTable:
        return ExternalCatalogTable(
            self._connector, self._format, self._schema, self._streaming
        )


class ConnectTableDescriptor:
    """descriptors/ConnectTableDescriptor.scala: the chain returned by
    ``Engine.connect`` — ``with_format``/``with_schema`` accumulate,
    ``register_table_source``/``register_table_sink``/
    ``register_table_source_and_sink`` lower onto the engine.
    ``in_append_mode`` (StreamTableDescriptor.scala:46) switches the
    source side to ``readStream``."""

    def __init__(self, engine, connector: ConnectorDescriptor):
        self._engine = engine
        self._connector = connector
        self._format: FormatDescriptor | None = None
        self._schema: Schema | None = None
        self._streaming = False

    def with_format(self, fmt: FormatDescriptor) -> "ConnectTableDescriptor":
        self._format = fmt
        return self

    def with_schema(self, schema: Schema) -> "ConnectTableDescriptor":
        self._schema = schema
        return self

    def in_append_mode(self) -> "ConnectTableDescriptor":
        self._streaming = True
        return self

    # --- validation ----------------------------------------------------
    def _validate(self) -> tuple[str, str, dict, str | None]:
        if not isinstance(self._connector, FileSystem):
            raise ValidationException(
                f"unsupported connector {type(self._connector).__name__} "
                "(filesystem only; Kafka lives in streaming/kafka.py)"
            )
        path = self._connector.validate()
        if self._connector.format_needed and self._format is None:
            raise ValidationException(
                "connector requires a format: call "
                ".with_format(OldCsv()/Csv()/Json())"
            )
        if self._format is not None:
            self._format.validate()
        if self._schema is None:
            raise ValidationException(
                "missing schema: call .with_schema(Schema().field(...))"
            )
        self._schema.validate()
        if self._format is None:
            # a format-less connector (format_needed=False) reads with
            # the table schema directly; FileSystem always needs one,
            # so this arm is future-connector safety, not dead code
            return (path, "parquet", {}, self._schema.ddl())
        read_schema = self._format.fields_ddl() or self._schema.ddl()
        return (path, self._format.spark_format(),
                self._format.spark_options(), read_schema)

    # --- registration (RegistrableDescriptor.scala:32/:40/:48) ---------
    def _build_source(self) -> DataFrame:
        path, fmt, opts, ddl = self._validate()
        return _load_source(
            self._engine.spark, path, fmt, opts, ddl, self._schema,
            self._streaming,
        )

    def register_table_source(self, name: str) -> None:
        self._engine.register(name, self._build_source())

    def register_table_sink(self, name: str) -> None:
        path, fmt, opts, _ = self._validate()
        self._engine.register_sink(
            name, fmt, path, write_options=opts, read_options=opts,
            schema=self._schema.ddl(),
            fields=[f for f in self._schema._fields if not f["proctime"]],
        )

    def register_table_source_and_sink(self, name: str) -> None:
        # ConnectTableDescriptor.scala:67 — same name, both directions
        self.register_table_source(name)
        self.register_table_sink(name)
