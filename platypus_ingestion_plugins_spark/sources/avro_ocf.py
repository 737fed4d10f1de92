"""Avro Object Container File source (the public Avro 1.x spec's file
format): header = magic ``Obj\\x01`` + file-metadata map
(``avro.schema`` JSON, ``avro.codec``) + 16-byte sync marker, then
data blocks of (record count, byte size, serialized records, sync).

Widens the S-column beyond the Kafka wire format: pipelines exchange
.avro FILES (Sqoop/Flume/warehouse exports), and this container has no
spark-avro jar, so the pure-Python binary decoder
(``sources/avro_decode.py``) is reused over Spark's ``binaryFile``
source. Parallelism is per FILE — one task per .avro file, the right
grain for the many-file layouts batch exporters write (sub-file block
splitting by sync-marker scan is a JVM-reader optimization this
fallback intentionally skips). Codecs: ``null`` and ``deflate``
(raw zlib, spec §Required Codecs).

Framing errors (bad magic, sync mismatch, truncated block) raise — a
corrupt FILE is an operational fault, unlike the per-record poison the
Kafka path quarantines (sources/kafka.py C14), where records arrive
individually from an untrusted producer.
"""

from __future__ import annotations

import json
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .avro_decode import (
    _Reader,
    _decode_value,
    _read_blocks,
    avro_to_spark_type,
    encode_record,
)

MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # fixed writer sync (any 16 bytes, per spec)


def _read_meta_map(r: _Reader) -> dict[str, bytes]:
    """File-metadata map — the same Avro block-series framing
    ``_read_blocks`` already implements."""

    def kv():
        k = r.read(r.read_long()).decode("utf-8")
        return k, bytes(r.read(r.read_long()))

    return dict(_read_blocks(r, kv))


def parse_ocf_header(content: bytes) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync, body_offset) from an OCF prefix. Raises
    ValueError on bad magic / truncation (pass more bytes)."""
    r = _Reader(content)
    if r.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = _read_meta_map(r)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec: {codec}")
    schema = json.loads(meta["avro.schema"])
    sync = bytes(r.read(16))
    return schema, codec, sync, r.pos


def parse_ocf(content: bytes) -> tuple[dict, list]:
    """Decode a whole OCF file to (schema, records)."""
    schema, codec, sync, pos = parse_ocf_header(content)
    r = _Reader(content)
    r.pos = pos
    records: list = []
    while r.pos < len(content):
        n = r.read_long()
        data = bytes(r.read(r.read_long()))
        if codec == "deflate":
            data = zlib.decompress(data, -15)  # raw deflate, no zlib header
        br = _Reader(data)
        for _ in range(n):
            records.append(_decode_value(br, schema))
        if br.pos != len(data):
            raise ValueError("trailing bytes in OCF block")
        if bytes(r.read(16)) != sync:
            raise ValueError("OCF sync marker mismatch")
    return schema, records


def write_ocf(records: list, schema: dict, codec: str = "null") -> bytes:
    """Encode records as an OCF byte string (one block) — the fixture/
    round-trip half, same role as ``confluent_frame`` for the wire
    format."""
    from .avro_decode import _encode_long

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec: {codec}")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    out = bytearray(MAGIC)
    out += _encode_long(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _encode_long(len(kb)) + kb + _encode_long(len(v)) + v
    out += _encode_long(0)  # end of metadata map
    out += _SYNC
    body = b"".join(encode_record(rec, schema) for rec in records)
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    out += _encode_long(len(records)) + _encode_long(len(body)) + body + _SYNC
    return bytes(out)


def _sniff_schema(spark: SparkSession, path: str, glob: str) -> dict:
    """Driver-side header sniff of one file matching ``glob`` (the SAME
    filter the binaryFile load applies — a sniff/load mismatch would
    return a schema for files the scan then skips): read growing
    prefixes until the header parses — bounded by the schema text
    size, never the file size. Only truncation errors grow the
    prefix; structural errors (bad magic, unsupported codec) raise
    immediately instead of re-reading the file."""
    import fnmatch
    import os as _os

    import pyarrow.fs as pafs

    if "://" in path:
        fs, inner = pafs.FileSystem.from_uri(path)
    else:
        fs, inner = pafs.LocalFileSystem(), path
    sel = pafs.FileSelector(inner, recursive=True)
    try:
        infos = [i.path for i in fs.get_file_info(sel) if i.is_file]
    except NotADirectoryError:
        infos = [inner]
    files = sorted(
        f for f in infos if fnmatch.fnmatch(_os.path.basename(f), glob)
    )
    if not files:
        raise FileNotFoundError(f"no files matching {glob!r} under {path}")
    size = 1 << 16
    with fs.open_input_file(files[0]) as f:
        while True:
            buf = f.read(size)
            try:
                schema, _, _, _ = parse_ocf_header(bytes(buf))
                return schema
            except ValueError as exc:
                if "truncated" not in str(exc) or len(buf) < size:
                    raise  # structural error, or the whole file is read
            f.seek(0)
            size *= 4


def read_avro_ocf(
    spark: SparkSession,
    path: str,
    schema_json: str | None = None,
    glob: str = "*.avro",
) -> DataFrame:
    """Typed DataFrame over a directory (or single file) of OCF files
    matching ``glob`` (pass ``"*"`` for extension-less exports, e.g.
    Sqoop part-files — the sniff and the scan share the one filter, so
    a file the sniff would accept is never silently skipped by the
    load). ``schema_json`` pins the reader schema; when omitted, the
    first matching file's header is sniffed driver-side. Decode runs
    in an Arrow-batched ``mapInPandas`` over the ``binaryFile`` source
    (one task per file), surfacing typed columns through the same
    JSON bridge as ``python_avro_decoder``."""
    schema = (
        json.loads(schema_json)
        if schema_json
        else _sniff_schema(spark, path, glob)
    )
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("content")
    )
    return _decode_to_typed(raw, avro_to_spark_type(schema))


def _decode_to_typed(raw: DataFrame, spark_type) -> DataFrame:
    """content-binary frame -> typed rows: per-file parse_ocf in an
    Arrow-batched mapInPandas, JSON bridge, JVM-side from_json — the
    one decode tail both the batch and streaming readers share."""

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                _, records = parse_ocf(bytes(content))
                if records:
                    yield pd.DataFrame(
                        {"json": [json.dumps(rec) for rec in records]}
                    )

    decoded = raw.mapInPandas(decode, "json string")
    return decoded.select(F.from_json("json", spark_type).alias("r")).select(
        "r.*"
    )


_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_avro_ocf(
    spark: SparkSession,
    path: str,
    schema_json: str,
    glob: str = "*.avro",
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Streaming file-drop ingestion of OCF files: each newly-arrived
    .avro file is decoded in the micro-batch that discovers it — the
    file-based twin of the Kafka wire path (drop-directory handoff is
    how batch producers feed a streaming pipeline when there is no
    broker). The reader schema must be pinned (``schema_json``): a
    streaming source cannot sniff, and the schema-evolution story is
    the per-file header + ``unionByName`` downstream, same as the
    registry dispatch. Plug the result into ``CdcStreamingPipeline``'s
    transform/foreachBatch like any decoded stream."""
    schema = json.loads(schema_json)
    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
        .select("content")
    )
    return _decode_to_typed(raw, avro_to_spark_type(schema))
