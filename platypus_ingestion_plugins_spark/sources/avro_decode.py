"""Pure-Python Avro binary decoder (spark-avro fallback).

The sandboxed build has no ``spark-avro`` jar, so the per-record
schema dispatch in ``sources.kafka.decode_with_schema_map`` could only
be tested through an injected fake. This module implements the Avro
binary encoding (the public Apache Avro 1.11 spec, "Binary encoding")
for the reference converter's full input lattice — null, boolean,
int, long, float, double, string, bytes, NESTED RECORDS (typed
structs; flatten downstream with converters.flatten_structs for the
``parent_child`` naming, AvroToAddDocumentConverter.java:36-69),
arrays (block encoding, incl. arrays of records), maps, enums
(decoded to their symbol), fixed (hex, like bytes), logical types
(date/timestamp-millis/... pass through as their underlying int/long,
AvroToAddDocumentConverter.java:94-107), and unions (the decoded
branch is read exactly; the Spark-side type comes from the first
non-null branch, the reference's getNonNullSchema rule,
AvroToAddDocumentConverter.java:77-86) — and exposes it through the
same ``decoder(payload_col, schema_json) -> Column`` injection point,
making the wire-format -> typed-record path testable end-to-end
without the jar.

Spark-first shape: the Python decode runs as an Arrow-batched pandas
UDF emitting a JSON string per record (``None`` on any decode error),
then ``F.from_json`` builds the typed struct JVM-side — a failed
decode therefore surfaces as a NULL struct, exactly the PERMISSIVE
``from_avro`` contract that the poison/DLQ routing keys on. Use
spark-avro in production (JVM-side, no Python hop); this fallback is
for environments and tests without it.

Reference parity: KafkaIngestor.java:151-157 (per-record registry
decode), 192-195 (undecodable-record skip).
"""

from __future__ import annotations

import json
import struct as _struct

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------------------
# binary decode primitives (Avro spec: zigzag varints, little-endian
# floats, length-prefixed bytes)
# ----------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise ValueError("truncated Avro payload")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        """Zigzag-encoded variable-length integer (int and long)."""
        shift, acc = 0, 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("truncated varint")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (acc >> 1) ^ -(acc & 1)


def _read_blocks(r: _Reader, read_item) -> list:
    """Avro block series: long count per block (negative count = item
    count is abs(count) and a byte-size long follows), 0 terminates."""
    out = []
    while True:
        n = r.read_long()
        if n == 0:
            return out
        if n < 0:
            n = -n
            r.read_long()  # block byte size (skippable; we read items)
        for _ in range(n):
            out.append(read_item())


def _decode_value(r: _Reader, schema) -> object:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # union: branch index then value
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _decode_value(r, schema[idx])
    elif isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {
                f["name"]: _decode_value(r, f["type"]) for f in schema["fields"]
            }
        if t == "array":
            items = schema["items"]
            return _read_blocks(r, lambda: _decode_value(r, items))
        if t == "map":
            values = schema["values"]

            def kv():
                k = _decode_value(r, "string")
                return (k, _decode_value(r, values))

            return dict(_read_blocks(r, kv))
        if t == "enum":
            idx = r.read_long()
            symbols = schema["symbols"]
            if not 0 <= idx < len(symbols):
                raise ValueError(f"enum index {idx} out of range")
            return symbols[idx]
        if t == "fixed":
            return r.read(int(schema["size"])).hex()
        # logical types ({"type": "int", "logicalType": "date"}, ...)
        # pass through as their underlying primitive — reference parity
        # (AvroToAddDocumentConverter.java:94-107)
    else:
        raise ValueError(f"unsupported schema node: {schema!r}")
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return _struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return _struct.unpack("<d", r.read(8))[0]
    if t in ("string", "bytes"):
        n = r.read_long()
        if n < 0:
            raise ValueError("negative length")
        raw = r.read(n)
        return raw.decode("utf-8") if t == "string" else raw.hex()
    raise ValueError(f"unsupported Avro type: {t}")


def decode_record(payload: bytes, schema: dict) -> dict:
    """Decode one binary-encoded record; raises on malformed input.
    Trailing bytes are an error (a record must consume its payload)."""
    r = _Reader(payload)
    out = _decode_value(r, schema)
    if r.pos != len(payload):
        raise ValueError(f"{len(payload) - r.pos} trailing bytes")
    return out


# ----------------------------------------------------------------------
# Avro schema -> Spark type
# ----------------------------------------------------------------------

_PRIMITIVE = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.StringType(),  # decoded to hex (JSON has no binary)
    "null": T.NullType(),
}


def avro_to_spark_type(schema) -> T.DataType:
    if isinstance(schema, str):
        return _PRIMITIVE[schema]
    if isinstance(schema, list):
        # union: type from the FIRST non-null branch — the reference's
        # getNonNullSchema rule (AvroToAddDocumentConverter.java:77-86).
        # Values decoded from other branches surface as NULL fields
        # after the JVM-side from_json (PERMISSIVE), mirroring the
        # reference's stringify-whatever looseness without inventing a
        # union type Spark doesn't have.
        branches = [b for b in schema if b != "null"]
        if not branches:
            return T.NullType()
        return avro_to_spark_type(branches[0])
    t = schema["type"]
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"]))
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.StringType()  # hex, like bytes
    if t in _PRIMITIVE:
        # logical-type annotation on a primitive: underlying int/long
        # passes through (AvroToAddDocumentConverter.java:94-107;
        # goldens AvroToAddDocumentConverterTest.java:60-84)
        return _PRIMITIVE[t]
    raise ValueError(f"unsupported Avro schema: {schema!r}")


# ----------------------------------------------------------------------
# the injection-point decoder
# ----------------------------------------------------------------------


def python_avro_decoder(payload: Column, schema_json: str) -> Column:
    """Drop-in ``decoder`` for ``decode_with_schema_map``: decodes the
    Avro binary payload in an Arrow-batched pandas UDF to JSON, then
    parses the struct JVM-side. Malformed records become NULL structs
    (PERMISSIVE semantics)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    schema = json.loads(schema_json)
    spark_type = avro_to_spark_type(schema)

    def dec(series):
        out = []
        for b in series:
            if b is None:
                out.append(None)
                continue
            try:
                out.append(json.dumps(decode_record(bytes(b), schema)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't resolve — attach concrete ones instead
    dec.__annotations__ = {"series": pd.Series, "return": pd.Series}
    dec_udf = pandas_udf(T.StringType())(dec)
    return F.from_json(dec_udf(payload), spark_type)


# ----------------------------------------------------------------------
# encoder — the other half of the wire format, used to build test
# fixtures and to round-trip without a registry
# ----------------------------------------------------------------------


def _encode_long(v: int) -> bytes:
    v = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_value(v, schema) -> bytes:
    if isinstance(schema, list):
        if v is None:
            idx = schema.index("null")
            return _encode_long(idx)
        branches = [(i, b) for i, b in enumerate(schema) if b != "null"]
        idx, branch = branches[0]
        return _encode_long(idx) + _encode_value(v, branch)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "record":
        return b"".join(
            _encode_value(v.get(f["name"]), f["type"]) for f in schema["fields"]
        )
    if t == "array":
        if not v:
            return _encode_long(0)
        body = b"".join(_encode_value(x, schema["items"]) for x in v)
        return _encode_long(len(v)) + body + _encode_long(0)
    if t == "map":
        if not v:
            return _encode_long(0)
        body = b"".join(
            _encode_value(k, "string") + _encode_value(val, schema["values"])
            for k, val in v.items()
        )
        return _encode_long(len(v)) + body + _encode_long(0)
    if t == "enum":
        return _encode_long(schema["symbols"].index(v))
    if t == "fixed":
        raw = bytes(v)
        if len(raw) != int(schema["size"]):
            raise ValueError("fixed size mismatch")
        return raw
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t in ("int", "long"):
        return _encode_long(int(v))
    if t == "float":
        return _struct.pack("<f", v)
    if t == "double":
        return _struct.pack("<d", v)
    if t == "string":
        raw = v.encode("utf-8")
        return _encode_long(len(raw)) + raw
    if t == "bytes":
        return _encode_long(len(v)) + bytes(v)
    raise ValueError(f"unsupported Avro type: {t}")


def encode_record(record: dict, schema: dict) -> bytes:
    """Binary-encode a record (test fixtures / registry-less round trips)."""
    return _encode_value(record, schema)


def confluent_frame(record: dict, schema: dict, schema_id: int) -> bytes:
    """Full Confluent wire-format frame: magic 0 + big-endian int32
    schema id + Avro binary payload (the format
    ``strip_confluent_header`` / ``confluent_schema_id`` parse)."""
    return b"\x00" + _struct.pack(">i", schema_id) + encode_record(record, schema)
