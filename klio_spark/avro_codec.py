"""Minimal pure-Python Avro Object Container File codec.

Implements the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/current/specification/) that klio-style
event I/O needs — records of primitives, [null, T] unions, arrays, maps,
nested records, null/deflate codecs — so Avro event inputs/outputs work
without the spark-avro package or any Python avro dependency (neither is
in this container; reference io.py:428-657 relies on Beam's avroio).

Used by sources/batch.read_avro and sinks.write_avro as the fallback
path: Spark's binaryFile source delivers whole files to executors, this
codec decodes them inside mapInPandas (Arrow-batched); writes encode one
container file per partition. When the spark-avro DataSource IS on the
classpath, the callers use it instead — this module is the portability
floor, not the scale path.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any, Iterator

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# primitive encode/decode (spec: binary encoding)
# ---------------------------------------------------------------------------

def _write_long(out: io.BytesIO, n: int) -> None:
    # zigzag then varint, little-endian 7-bit groups
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise AvroError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    b = buf.read(n)
    if len(b) != n:
        raise AvroError("truncated bytes")
    return b


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------

def _norm(schema: Any) -> Any:
    """'string' and {"type": "string"} are equivalent; strip logicalType."""
    if isinstance(schema, dict) and schema.get("type") in _PRIMITIVES and set(
        schema
    ) <= {"type", "logicalType"}:
        return schema["type"]
    return schema


def encode(out: io.BytesIO, schema: Any, value: Any) -> None:
    schema = _norm(schema)
    if isinstance(schema, str):
        if schema == "null":
            return
        if schema == "boolean":
            out.write(b"\x01" if value else b"\x00")
        elif schema in ("int", "long"):
            _write_long(out, int(value))
        elif schema == "float":
            out.write(struct.pack("<f", float(value)))
        elif schema == "double":
            out.write(struct.pack("<d", float(value)))
        elif schema == "bytes":
            _write_bytes(out, bytes(value))
        elif schema == "string":
            _write_bytes(out, str(value).encode("utf-8"))
        else:
            raise AvroError(f"unsupported type {schema!r}")
        return
    if isinstance(schema, list):  # union: write branch index then value
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, i)
                encode(out, branch, value)
                return
        raise AvroError(f"value {value!r} matches no union branch {schema!r}")
    t = schema["type"]
    if t == "record":
        for f in schema["fields"]:
            encode(out, f["type"], None if value is None else value.get(f["name"]))
    elif t == "array":
        items = list(value or [])
        if items:
            _write_long(out, len(items))
            for it in items:
                encode(out, schema["items"], it)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                encode(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise AvroError(f"unsupported complex type {t!r}")


def _matches(branch: Any, value: Any) -> bool:
    branch = _norm(branch)
    if branch == "null":
        return value is None
    return value is not None


def decode(buf: io.BytesIO, schema: Any) -> Any:
    schema = _norm(schema)
    if isinstance(schema, str):
        if schema == "null":
            return None
        if schema == "boolean":
            return buf.read(1) == b"\x01"
        if schema in ("int", "long"):
            return _read_long(buf)
        if schema == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if schema == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if schema == "bytes":
            return _read_bytes(buf)
        if schema == "string":
            return _read_bytes(buf).decode("utf-8")
        raise AvroError(f"unsupported type {schema!r}")
    if isinstance(schema, list):
        idx = _read_long(buf)
        return decode(buf, schema[idx])
    t = schema["type"]
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte size prefix
                _read_long(buf)
                n = -n
            out.extend(decode(buf, schema["items"]) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"])
    if t in ("enum",):
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    raise AvroError(f"unsupported complex type {t!r}")


# ---------------------------------------------------------------------------
# object container files (spec: object container files)
# ---------------------------------------------------------------------------

def write_container(
    schema: dict,
    records: list[dict],
    *,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
    block_records: int = 4096,
) -> bytes:
    """Serialize records into one Avro container file (bytes)."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    out = io.BytesIO()
    out.write(MAGIC)
    meta_schema = {"type": "map", "values": "bytes"}
    encode(
        out,
        meta_schema,
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        },
    )
    out.write(sync)
    for start in range(0, len(records), block_records) or [0]:
        chunk = records[start : start + block_records]
        if not chunk:
            break
        body = io.BytesIO()
        for r in chunk:
            encode(body, schema, r)
        data = body.getvalue()
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate, no zlib header/crc
        _write_long(out, len(chunk))
        _write_bytes(out, data)
        out.write(sync)
    return out.getvalue()


def read_schema(blob: bytes) -> dict:
    """Parse just the header's embedded schema (cheap driver-side sniff)."""
    return _read_header(io.BytesIO(blob))[0]


def _read_header(buf: io.BytesIO):
    if buf.read(4) != MAGIC:
        raise AvroError("not an Avro container file")
    meta = decode(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    return schema, codec, sync


def read_container(blob: bytes) -> Iterator[dict]:
    """Yield records from an Avro container file."""
    buf = io.BytesIO(blob)
    schema, codec, sync = _read_header(buf)
    while True:
        head = buf.read(1)
        if not head:
            return
        buf.seek(-1, 1)
        n = _read_long(buf)
        data = _read_bytes(buf)
        if buf.read(16) != sync:
            raise AvroError("sync marker mismatch")
        if codec == "deflate":
            data = zlib.decompress(data, wbits=-15)
        elif codec != "null":
            raise AvroError(f"unsupported codec {codec!r}")
        body = io.BytesIO(data)
        for _ in range(n):
            yield decode(body, schema)


# ---------------------------------------------------------------------------
# Spark <-> Avro schema mapping
# ---------------------------------------------------------------------------

def spark_to_avro_schema(schema, name: str = "klio_record") -> dict:
    """StructType → Avro record schema (nullable fields become unions).

    Nested records are named by their FIELD PATH (``<name>_<field>``) —
    Avro requires unique record fullnames, so two sibling struct fields
    must not share one (spec-compliant readers reject duplicate names)."""
    from pyspark.sql import types as T

    def conv(dt, nullable, field_path):
        if isinstance(dt, T.StringType):
            a = "string"
        elif isinstance(dt, T.BinaryType):
            a = "bytes"
        elif isinstance(dt, (T.IntegerType, T.ShortType)):
            a = "int"
        elif isinstance(dt, T.LongType):
            a = "long"
        elif isinstance(dt, T.FloatType):
            a = "float"
        elif isinstance(dt, T.DoubleType):
            a = "double"
        elif isinstance(dt, T.BooleanType):
            a = "boolean"
        elif isinstance(dt, T.TimestampType):
            a = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.DateType):
            a = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, T.ArrayType):
            a = {
                "type": "array",
                "items": conv(dt.elementType, dt.containsNull, f"{field_path}_item"),
            }
        elif isinstance(dt, T.MapType):
            a = {
                "type": "map",
                "values": conv(
                    dt.valueType, dt.valueContainsNull, f"{field_path}_value"
                ),
            }
        elif isinstance(dt, T.StructType):
            a = spark_to_avro_schema(dt, name=field_path)
        else:
            raise AvroError(f"no Avro mapping for Spark type {dt}")
        return ["null", a] if nullable else a

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, f"{name}_{f.name}")}
            for f in schema.fields
        ],
    }


def avro_to_spark_schema(schema: dict):
    """Avro record schema → StructType (unions with null → nullable).

    Logical types are read as their BASE types (timestamp-micros → long,
    date → int): the pure-Python fallback stays byte-faithful and leaves
    temporal interpretation to the caller — the spark-avro DataSource
    path handles logical types natively when present.
    """
    from pyspark.sql import types as T

    prim = {
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "boolean": T.BooleanType(),
        "null": T.NullType(),
    }

    def conv(a):
        a = _norm(a)
        if isinstance(a, str):
            return prim[a], False
        if isinstance(a, list):
            branches = [b for b in a if _norm(b) != "null"]
            if len(branches) != 1:
                raise AvroError(f"only [null, T] unions supported, got {a!r}")
            dt, _ = conv(branches[0])
            return dt, True
        t = a["type"]
        if t == "record":
            fields = []
            for f in a["fields"]:
                dt, nullable = conv(f["type"])
                fields.append(T.StructField(f["name"], dt, nullable))
            return T.StructType(fields), False
        if t == "array":
            dt, nullable = conv(a["items"])
            return T.ArrayType(dt, nullable), False
        if t == "map":
            dt, nullable = conv(a["values"])
            return T.MapType(T.StringType(), dt, nullable), False
        if t == "enum":
            return T.StringType(), False
        if t == "fixed":
            return T.BinaryType(), False
        raise AvroError(f"unsupported avro type {t!r}")

    dt, _ = conv(schema)
    return dt
