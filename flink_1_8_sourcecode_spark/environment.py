"""SQL-client-style environment files.

Reference parity: the SQL client's YAML environment
(flink-table/flink-sql-client/src/main/java/org/apache/flink/table/
client/config/Environment.java; conf/sql-client-defaults.yaml) — a
declarative file that registers ``tables`` (sources, sinks, views) and
``functions`` into a session before any query runs.  The interactive
REPL itself is out of scope (SURVEY §2 scopes the client to the
environment surface); this module covers the part that defines engine
state.

Spark-first: every ``tables`` entry lowers onto the SAME descriptor
chain as ``Engine.connect`` (descriptors.py — FileSystem + OldCsv/Csv/
Json + Schema), so an environment-registered source is a plain
distributed DataFrameReader scan with the declared schema, views are
``Engine.sql`` plans registered as temp views (lazily composable, in
file order, exactly like the reference resolves its view list), and
sinks land in the engine's sink registry for ``insert_into``.

Functions: the reference instantiates JVM classes (``from: class``);
a Python engine cannot, so that spelling raises loudly and the
supported spelling is ``from: python`` with a dotted ``callable`` path
(resolved via importlib) — registered through
``Engine.register_function`` like any UDF.
"""

from __future__ import annotations

import importlib

from flink_1_8_sourcecode_spark.descriptors import (
    Csv,
    FileSystem,
    Json,
    OldCsv,
    Rowtime,
    Schema,
    ValidationException,
)

_SOURCE_TYPES = {"source-table", "source"}
_SINK_TYPES = {"sink-table", "sink"}
_BOTH_TYPES = {"source-sink-table", "both"}


def _build_schema(fields: list) -> Schema:
    """``schema:`` entry list -> descriptors.Schema (Environment.java
    routes the same list into Schema descriptor properties)."""
    sch = Schema()
    for f in fields or []:
        if not isinstance(f, dict) or "name" not in f:
            raise ValidationException(
                f"environment: schema entries need a name, got {f!r}"
            )
        if f.get("proctime"):
            # proctime attribute: declared with a TIMESTAMP type slot
            sch.field(f["name"], f.get("type", "TIMESTAMP")).proctime()
            continue
        sch.field(f["name"], f.get("type", "VARCHAR"))
        rt = f.get("rowtime")
        if rt:
            ts = rt.get("timestamps", {})
            if ts.get("type") not in (None, "from-field"):
                raise ValidationException(
                    "environment: only timestamps type 'from-field' is "
                    f"supported, got {ts.get('type')!r}"
                )
            r = Rowtime().timestamps_from_field(
                ts.get("from", f["name"])
            )
            wm = rt.get("watermarks", {})
            if wm:
                if wm.get("type") not in (None, "periodic-bounded"):
                    raise ValidationException(
                        "environment: only watermarks type "
                        "'periodic-bounded' is supported, got "
                        f"{wm.get('type')!r}"
                    )
                r = r.watermarks_periodic_bounded(int(wm.get("delay", 0)))
            sch.rowtime(r)
    return sch


def _build_format(fmt: dict):
    """``format:`` entry -> FormatDescriptor (ConfigUtil.java routes
    these into TableFactoryService properties)."""
    ftype = (fmt or {}).get("type")
    if ftype == "csv":
        f = Csv() if fmt.get("derive-schema") else OldCsv()
        for fld in fmt.get("fields", []) or []:
            f = f.field(fld["name"], fld.get("type", "VARCHAR"))
        if "field-delimiter" in fmt:
            f = f.field_delimiter(fmt["field-delimiter"])
        if "line-delimiter" in fmt:
            f = f.line_delimiter(fmt["line-delimiter"])
        if "comment-prefix" in fmt:
            f = f.comment_prefix(fmt["comment-prefix"])
        if fmt.get("ignore-first-line"):
            f = f.ignore_first_line()
        if fmt.get("ignore-parse-errors"):
            f = f.ignore_parse_errors()
        return f
    if ftype == "json":
        return Json()
    raise ValidationException(
        f"environment: unsupported format type {ftype!r} (csv/json)"
    )


def _build_connector(conn: dict) -> FileSystem:
    ctype = (conn or {}).get("type")
    if ctype != "filesystem":
        raise ValidationException(
            f"environment: unsupported connector type {ctype!r} "
            "(filesystem only; Kafka lives in streaming/kafka.py)"
        )
    if "path" not in conn:
        raise ValidationException("environment: connector needs a path")
    return FileSystem().path(conn["path"])


def load_environment(engine, source) -> dict:
    """Load a SQL-client environment into an :class:`Engine`
    (Environment.java parse + LocalExecutor start-up registration).

    ``source`` is a YAML file path, a YAML string, or an
    already-parsed dict.  Returns a summary
    ``{"sources": [...], "sinks": [...], "views": [...],
    "functions": [...]}``.

    Entry order matters for views — a view may reference any table or
    view registered ABOVE it, same as the reference's sequential view
    resolution.
    """
    import yaml

    if isinstance(source, dict):
        env = source
    else:
        text = source
        if "\n" not in str(source):
            try:
                with open(source) as fh:
                    text = fh.read()
            except (OSError, ValueError):
                # not an openable path (missing, too long, a dir, NUL
                # bytes, ...) — treat as a (single-line) YAML string
                pass
        env = yaml.safe_load(text)
    if not isinstance(env, dict):
        raise ValidationException(
            "environment: top level must be a mapping with "
            "tables/functions/execution"
        )

    streaming = (
        str(env.get("execution", {}).get("type", "batch")).lower()
        == "streaming"
    )
    out: dict = {"sources": [], "sinks": [], "views": [], "functions": []}

    # functions first: views in the tables list may call them (the
    # reference's LocalExecutor registers functions before tables)
    for fn in env.get("functions", []) or []:
        name = fn.get("name")
        if not name:
            raise ValidationException(
                "environment: function entry needs a name"
            )
        origin = fn.get("from", "class")
        if origin == "class":
            raise NotImplementedError(
                f"environment: function {name!r} uses 'from: class' — "
                "JVM class instantiation has no Python counterpart; "
                "use 'from: python' with a dotted 'callable' path"
            )
        if origin != "python":
            raise ValidationException(
                f"environment: unknown function origin {origin!r}"
            )
        dotted = fn.get("callable")
        if not dotted or "." not in dotted:
            raise ValidationException(
                f"environment: function {name!r} needs a dotted "
                "'callable' module path"
            )
        mod_name, attr = dotted.rsplit(".", 1)
        target = getattr(importlib.import_module(mod_name), attr)
        engine.register_function(name, target, fn.get("returns"))
        out["functions"].append(name)

    for t in env.get("tables", []) or []:
        name = t.get("name")
        if not name:
            raise ValidationException("environment: table entry needs a name")
        ttype = str(t.get("type", "source-table")).lower()
        if ttype == "view":
            if "query" not in t:
                raise ValidationException(
                    f"environment: view {name!r} needs a query"
                )
            engine.register(name, engine.sql(t["query"]))
            out["views"].append(name)
            continue
        if ttype == "temporal-table":
            raise NotImplementedError(
                "environment: temporal-table entries are registered in "
                "code via Engine.register_temporal_table_function "
                "(Table.createTemporalTableFunction parity)"
            )
        if ttype not in (_SOURCE_TYPES | _SINK_TYPES | _BOTH_TYPES):
            raise ValidationException(
                f"environment: unknown table type {ttype!r} for {name!r}"
            )
        chain = (
            engine.connect(_build_connector(t.get("connector")))
            .with_format(_build_format(t.get("format")))
            .with_schema(_build_schema(t.get("schema")))
        )
        if streaming and ttype in (_SOURCE_TYPES | _BOTH_TYPES):
            chain = chain.in_append_mode()
        if ttype in _BOTH_TYPES:
            chain.register_table_source_and_sink(name)
            out["sources"].append(name)
            out["sinks"].append(name)
        elif ttype in _SINK_TYPES:
            chain.register_table_sink(name)
            out["sinks"].append(name)
        else:
            chain.register_table_source(name)
            out["sources"].append(name)

    return out
