"""Pure-Python Avro Object Container File support.

Reference parity: the Avro row (de)serialization format surface —
flink-formats/flink-avro/.../AvroRowDeserializationSchema.java:79 and
AvroRowSerializationSchema.java.  The sandbox bundles no spark-avro jar
and no fastavro, so this implements the PUBLIC Avro 1.x container-file
spec directly (magic/metadata/sync framing, zigzag-varint primitives,
block structure, null + deflate codecs) and exposes:

- :func:`read_avro`   — distributed read: files parallelize over
  Spark's binaryFile source, each file's blocks decode inside a
  mapInPandas pass (Arrow-batched out), schema derived from the writer
  schema embedded in the file header.
- :func:`encode_avro` / :func:`write_avro_file` — encoder used by tests
  and the round-trip query (and a convenient small-file writer).

Type coverage: null, boolean, int, long, float, double, bytes, string,
record, enum, array, map, union, fixed.  Logical types decode as their
underlying primitive (documented; timestamp-millis handling is the
caller's concern — same stance as Avro's own GenericDatum without
logical-type conversions).

Scale: one Spark task per FILE (the natural Avro parallel unit here;
block-level splitting needs a seekable stream, which binaryFile does
not expose).  A 100 TB Avro lake arrives as many files, so file-level
parallelism saturates a cluster; the decode itself is pure CPU inside
the executor.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive decode (Avro spec: zigzag varints, little-endian IEEE floats)
# --------------------------------------------------------------------------
class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError(f"avro: truncated read ({n} bytes at {self.pos})")
        self.pos += n
        return b

    def long(self) -> int:
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def float_(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def bytes_(self) -> bytes:
        return self.read(self.long())

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def boolean(self) -> bool:
        return self.read(1) != b"\x00"


def _decode_value(r: _Reader, schema):
    if isinstance(schema, list):  # union: long index + value
        return _decode_value(r, schema[r.long()])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]
            }
        if t == "enum":
            return schema["symbols"][r.long()]
        if t == "array":
            out = []
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.long()  # block byte size (unused when not skipping)
                for _ in range(n):
                    out.append(_decode_value(r, schema["items"]))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    r.long()
                for _ in range(n):
                    # key MUST read before value (assignment evaluates
                    # the right-hand side first)
                    k = r.string()
                    out[k] = _decode_value(r, schema["values"])
            return out
        if t == "fixed":
            return r.read(schema["size"])
        return _decode_value(r, t)  # {"type": "string", ...} wrapper form
    # named primitive
    if schema == "null":
        return None
    if schema == "boolean":
        return r.boolean()
    if schema in ("int", "long"):
        return r.long()
    if schema == "float":
        return r.float_()
    if schema == "double":
        return r.double()
    if schema == "bytes":
        return r.bytes_()
    if schema == "string":
        return r.string()
    raise NotImplementedError(f"avro type not supported: {schema!r}")


# --------------------------------------------------------------------------
# primitive encode (for tests / the round-trip fixture writer)
# --------------------------------------------------------------------------
def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(schema, v) -> bytes:
    if isinstance(schema, list):
        # union: pick the first matching branch (null vs not-null covers
        # the nullable-column case; other unions match by python type)
        for i, branch in enumerate(schema):
            if _matches(branch, v):
                return _zigzag(i) + _encode_value(branch, v)
        raise ValueError(f"no union branch of {schema} matches {v!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return b"".join(
                _encode_value(f["type"], v[f["name"]]) for f in schema["fields"]
            )
        if t == "enum":
            return _zigzag(schema["symbols"].index(v))
        if t == "array":
            if not v:
                return _zigzag(0)
            return (
                _zigzag(len(v))
                + b"".join(_encode_value(schema["items"], x) for x in v)
                + _zigzag(0)
            )
        if t == "map":
            if not v:
                return _zigzag(0)
            body = b"".join(
                _encode_value("string", k) + _encode_value(schema["values"], x)
                for k, x in v.items()
            )
            return _zigzag(len(v)) + body + _zigzag(0)
        if t == "fixed":
            assert len(v) == schema["size"]
            return bytes(v)
        return _encode_value(t, v)
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if v else b"\x00"
    if schema in ("int", "long"):
        return _zigzag(int(v))
    if schema == "float":
        return struct.pack("<f", v)
    if schema == "double":
        return struct.pack("<d", v)
    if schema == "bytes":
        return _zigzag(len(v)) + bytes(v)
    if schema == "string":
        b = v.encode("utf-8")
        return _zigzag(len(b)) + b
    raise NotImplementedError(f"avro type not supported: {schema!r}")


def _matches(schema, v) -> bool:
    if schema == "null":
        return v is None
    if v is None:
        return False
    if isinstance(schema, dict):
        return True
    if schema == "boolean":
        return isinstance(v, bool)
    if schema in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if schema in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if schema == "bytes":
        return isinstance(v, (bytes, bytearray))
    if schema == "string":
        return isinstance(v, str)
    return True


# --------------------------------------------------------------------------
# container file framing
# --------------------------------------------------------------------------
def decode_container(data: bytes):
    """Decode one Avro OCF: returns (writer_schema, list_of_records)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = _decode_value(r, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = r.read(16)
    records = []
    while r.pos < len(r.buf):
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec not supported: {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode_value(br, schema))
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
    return schema, records


def encode_avro(schema: dict, records, codec: str = "null") -> bytes:
    """Encode records into one Avro OCF (spec framing; null/deflate)."""
    sync = b"\x07" * 16  # fixed sync: deterministic fixtures
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    out = bytearray(MAGIC)
    out += _encode_value({"type": "map", "values": "bytes"}, meta)
    out += sync
    body = b"".join(_encode_value(schema, rec) for rec in records)
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        body = comp.compress(body) + comp.flush()
    elif codec != "null":
        raise NotImplementedError(f"avro codec not supported: {codec}")
    out += _zigzag(len(records)) + _zigzag(len(body)) + body + sync
    return bytes(out)


def write_avro_file(path: str, schema: dict, records, codec: str = "null") -> None:
    with open(path, "wb") as f:
        f.write(encode_avro(schema, records, codec=codec))


# --------------------------------------------------------------------------
# Avro schema -> Spark schema
# --------------------------------------------------------------------------
def _spark_type(schema) -> str:
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"only [null, T] unions supported: {schema}")
        return _spark_type(non_null[0])
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            inner = ", ".join(
                f"{f['name']}: {_spark_type(f['type'])}" for f in schema["fields"]
            )
            return f"struct<{inner}>"
        if t == "enum":
            return "string"
        if t == "array":
            return f"array<{_spark_type(schema['items'])}>"
        if t == "map":
            return f"map<string, {_spark_type(schema['values'])}>"
        if t == "fixed":
            return "binary"
        return _spark_type(t)
    return {
        "null": "string",
        "boolean": "boolean",
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "bytes": "binary",
        "string": "string",
    }[schema]


def spark_schema_ddl(schema: dict) -> str:
    """Top-level record schema -> Spark DDL column list."""
    if not (isinstance(schema, dict) and schema["type"] == "record"):
        raise ValueError("top-level avro schema must be a record")
    return ", ".join(
        f"{f['name']} {_spark_type(f['type'])}" for f in schema["fields"]
    )


def read_avro(spark: SparkSession, path: str, schema: dict) -> DataFrame:
    """Distributed Avro read: binaryFile source (one task per file) +
    per-file container decode in mapInPandas (Arrow-batched rows out).

    ``schema`` is the expected writer schema (top-level record) — it
    defines the output columns up front so the plan is fully typed
    without a driver-side peek; each file's EMBEDDED schema is checked
    against it and a mismatch raises (no silent coercion).
    """
    from collections.abc import Iterator

    import pandas as pd

    ddl = spark_schema_ddl(schema)
    cols = [f["name"] for f in schema["fields"]]
    expected = json.dumps(schema, sort_keys=True)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for raw in pdf["content"]:
                ws, recs = decode_container(bytes(raw))
                if json.dumps(ws, sort_keys=True) != expected:
                    raise ValueError(
                        f"avro writer schema mismatch: file has {ws}, "
                        f"reader expects {json.loads(expected)}"
                    )
                if recs:
                    yield pd.DataFrame.from_records(recs, columns=cols)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, ddl)
