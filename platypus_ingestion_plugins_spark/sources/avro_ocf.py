"""Avro Object Container File source (the public Avro 1.x spec's file
format): header = magic ``Obj\\x01`` + file-metadata map
(``avro.schema`` JSON, ``avro.codec``) + 16-byte sync marker, then
data blocks of (record count, byte size, serialized records, sync).

Widens the S-column beyond the Kafka wire format: pipelines exchange
.avro FILES (Sqoop/Flume/warehouse exports), and this container has no
spark-avro jar, so the pure-Python binary decoder
(``sources/avro_decode.py``) is reused. Batch reads are BLOCK-SPLIT:
the driver fans out (path, start, end) byte ranges and each task
resynchronizes on the 16-byte sync marker and decodes only its own
blocks — a multi-GB file reads in parallel with bounded per-task
memory (the container format is designed for exactly this). The
streaming reader stays file-grained: ``binaryFile`` discovery hands
whole newly-arrived files to the micro-batch, the right grain for
drop-directory ingestion where files are trigger-sized. Codecs:
``null`` and ``deflate`` (raw zlib, spec §Required Codecs).

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


def write_ocf(
    records: list, schema: dict, codec: str = "null",
    records_per_block: int | None = None,
) -> bytes:
    """Encode records as an OCF byte string — the fixture/round-trip
    half, same role as ``confluent_frame`` for the wire format. One
    block by default; ``records_per_block`` splits into multiple
    sync-delimited blocks (the layout real exporters write, and what
    the block-split reader's range tasks divide between themselves)."""
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
    step = records_per_block or max(len(records), 1)
    for i in range(0, max(len(records), 1), step):
        chunk = records[i : i + step]
        body = b"".join(encode_record(rec, schema) for rec in chunk)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            body = comp.compress(body) + comp.flush()
        out += _encode_long(len(chunk)) + _encode_long(len(body)) + body + _SYNC
    return bytes(out)


def spark_schema_to_avro(schema, name: str = "row") -> dict:
    """Spark StructType -> Avro record schema (the inverse of
    ``avro_to_spark_type``, over the types ``_encode_value`` can
    frame). Every field is the nullable union ``["null", t]`` — the
    decode side surfaces everything nullable anyway, and it spares
    callers a per-column nullability audit. Unsupported Spark types
    (timestamps, decimals) raise with a cast hint instead of writing a
    file another reader can't interpret."""
    import pyspark.sql.types as T

    def conv(dt, field_name):
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": f"{name}_{field_name}",
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType, f"{field_name}_{f.name}")]}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": ["null", conv(dt.elementType, field_name)]}
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("Avro maps require string keys")
            return {"type": "map", "values": ["null", conv(dt.valueType, field_name)]}
        simple = {
            T.LongType: "long", T.IntegerType: "int", T.ShortType: "int",
            T.ByteType: "int", T.DoubleType: "double", T.FloatType: "float",
            T.StringType: "string", T.BooleanType: "boolean",
            T.BinaryType: "bytes",
        }
        for st, avro_t in simple.items():
            if isinstance(dt, st):
                return avro_t
        raise ValueError(
            f"no Avro mapping for Spark type {dt.simpleString()} "
            f"(column {field_name!r}) — cast it first (timestamps: "
            "unix_micros(...).cast('long'); decimals: cast('double') "
            "or cast('string'))"
        )

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
            for f in schema.fields
        ],
    }


def _pyify(v):
    """Arrow scalar -> the plain-Python value _encode_value frames.
    ``RecordBatch.to_pylist`` already yields native Python (exact ints
    even in nullable columns — the pandas bridge this replaced coerced
    nullable int64 to float64, silently rounding longs above 2^53;
    r11 review #2), so this only normalizes the leftovers: NaN -> None
    (missing), numpy scalars unbox (defensive), Arrow MAP entries
    (list of (k, v) 2-tuples) -> dict for the Avro map encoder."""
    import numpy as np

    if v is None or v is False or v is True:
        return v
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and v != v:  # NaN cell = missing
        return None
    if isinstance(v, np.ndarray):
        return [_pyify(x) for x in v.tolist()]
    if isinstance(v, list) and v and all(
        isinstance(x, tuple) and len(x) == 2 for x in v
    ):
        # Arrow map column: to_pylist yields [(key, value), ...].
        # Unambiguous — Spark array<struct> surfaces as list of dicts,
        # never tuples.
        return {k: _pyify(x) for k, x in v}
    if isinstance(v, (list, tuple)):
        return [_pyify(x) for x in v]
    if isinstance(v, dict):
        return {k: _pyify(x) for k, x in v.items()}
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def export_avro_ocf(
    df: DataFrame,
    out_path: str,
    key: str,
    n_shards: int,
    salt: str = "shuffle",
    codec: str = "null",
    records_per_block: int = 1000,
    stale_after_s: int = 3600,
) -> list:
    """Write the corpus as Avro OCF shards —
    ``out_path/part-00000.avro`` .. — the container the block-split
    reader (``read_avro_ocf``) and every Avro-speaking warehouse tool
    consume. Completes the export matrix: JSONL and tar have both
    directions; OCF was read-only before r11.

    Scale shape mirrors ``export_tar_shards``: the deterministic
    shuffle assigns (shard, order) as a codegen projection,
    ``repartition(n_shards, shard)`` gives each task exactly one shard,
    and the task STREAMS its partition into sync-delimited blocks of
    ``records_per_block`` through one pyarrow output stream — no
    in-memory file image, no driver data; executors re-resolve the
    filesystem from ``out_path`` so object stores work. Rows within a
    shard land in the deterministic permutation order, so reruns are
    byte-identical (the writer sync marker is fixed) and the returned
    manifest (shard, path, n_records) is stable. Each task writes
    an ATTEMPT-UNIQUE ``.inprogress-<attempt>`` temp renamed on
    completion — a crashed attempt never leaves a readable half-file
    behind (the reader globs ``*.avro``), and a speculative/zombie
    second attempt of the same task can never interleave bytes into
    the first attempt's temp (r11 review #6: a shared temp path
    published a corrupt shard under ``spark.speculation``).

    Generation protocol (r11 review #1 — previously a re-export with
    fewer shards silently served old leftover shards alongside the
    new generation): the driver raises an
    ``.ocf_export_in_progress-<gen>`` sentinel BEFORE the first
    final-name move can land, and ``read_avro_ocf`` refuses the
    directory while any sentinel is up; after the write action, stale
    ``part-*.avro`` absent from this generation's manifest and aged
    ``.inprogress-*`` temps are swept, foreign sentinels older than
    ``stale_after_s`` (a crashed export's permanent reader-blocker)
    are cleared, then the sentinel drops — its absence certifies the
    directory lists exactly one generation. A crash anywhere in the
    window leaves the sentinel up: DETECTABLE, never silently read
    as a mixed-generation directory.

    Blocks are the unit of read parallelism AND compression
    (``codec="deflate"`` compresses per block), so
    ``records_per_block`` trades split granularity against framing
    overhead — 1000 matches the reference's batch-size defaults.

    Binary columns frame as Avro ``bytes`` on disk; NOTE that
    ``read_avro_ocf`` surfaces them as HEX STRINGS (its JSON-bridge
    contract, ``avro_decode.avro_to_spark_type``) — unhexlify on read
    if you need BinaryType back."""
    from platypus_ingestion_plugins_spark.operators.export import (
        ORDER_COL,
        shuffle_assign,
    )

    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec: {codec}")
    schema = spark_schema_to_avro(df.schema)
    schema_bytes = json.dumps(schema).encode()
    cols = list(df.columns)
    assigned = (
        shuffle_assign(df, key, n_shards, salt)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", ORDER_COL, key)
    )
    out_schema = "shard long, path string, n_records long"

    def write_shards(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        tc = TaskContext.get()
        attempt = tc.taskAttemptId() if tc is not None else 0
        meta = {"avro.schema": schema_bytes, "avro.codec": codec.encode()}
        header = bytearray(MAGIC)
        from .avro_decode import _encode_long

        header += _encode_long(len(meta))
        for k, v in sorted(meta.items()):
            kb = k.encode()
            header += _encode_long(len(kb)) + kb + _encode_long(len(v)) + v
        header += _encode_long(0)
        header += _SYNC

        fs = None
        inner = None
        state = {"shard": None, "out": None, "tmp": None, "buf": [], "n": 0}
        manifest = []

        def flush_block():
            if not state["buf"]:
                return
            body = b"".join(
                encode_record(rec, schema) for rec in state["buf"]
            )
            if codec == "deflate":
                comp = zlib.compressobj(wbits=-15)
                body = comp.compress(body) + comp.flush()
            state["out"].write(
                _encode_long(len(state["buf"])) + _encode_long(len(body))
                + body + _SYNC
            )
            state["buf"] = []

        def close_current():
            if state["out"] is None:
                return None
            flush_block()
            state["out"].close()
            final = f"{inner}/part-{state['shard']:05d}.avro"
            info = fs.get_file_info(final)
            import pyarrow.fs as pafs

            if info.type != pafs.FileType.NotFound:
                fs.delete_file(final)  # task retry overwrites
            fs.move(state["tmp"], final)
            rec = (int(state["shard"]), final, int(state["n"]))
            state.update(shard=None, out=None, tmp=None, n=0)
            return rec

        for batch in batches:
            # Arrow batches, not pandas: to_pylist keeps nullable long
            # columns as exact Python ints (the pandas bridge coerced
            # them to float64, corrupting values above 2^53 —
            # r11 review #2) and preserves underscore-leading column
            # names (_seq, _row_kind) verbatim.
            for d in batch.to_pylist():
                shard = int(d["shard"])
                if shard != state["shard"]:
                    done = close_current()
                    if done:
                        manifest.append(done)
                    if fs is None:
                        fs, inner = _open_fs(out_path)
                        fs.create_dir(inner, recursive=True)
                    tmp = (
                        f"{inner}/part-{shard:05d}.avro"
                        f".inprogress-{attempt}"
                    )
                    out = fs.open_output_stream(tmp)
                    out.write(bytes(header))
                    state.update(shard=shard, out=out, tmp=tmp, buf=[], n=0)
                state["buf"].append({c: _pyify(d[c]) for c in cols})
                state["n"] += 1
                if len(state["buf"]) >= records_per_block:
                    flush_block()
        done = close_current()
        if done:
            manifest.append(done)
        if manifest:
            yield pa.RecordBatch.from_pylist(
                [
                    {"shard": s, "path": p, "n_records": n}
                    for s, p, n in manifest
                ],
                schema=pa.schema(
                    [
                        pa.field("shard", pa.int64()),
                        pa.field("path", pa.string()),
                        pa.field("n_records", pa.int64()),
                    ]
                ),
            )

    import uuid as _uuid

    generation = _uuid.uuid4().hex
    _drv_fs, _drv_inner = _open_fs(out_path)
    _drv_fs.create_dir(_drv_inner, recursive=True)
    sentinel_base = f".ocf_export_in_progress-{generation}"
    sentinel = f"{_drv_inner}/{sentinel_base}"
    with _drv_fs.open_output_stream(sentinel) as _out:
        _out.write(generation.encode("utf-8"))
    # sentinel is UP before the action: tasks move finals into place
    # as they finish, so a reader racing the export would otherwise
    # see a mixed old/new directory with no tell. The write action can
    # outlive stale_after_s at scale, and a CONCURRENT export's sweep
    # clears foreign sentinels past that horizon — so a driver-side
    # daemon re-touches the sentinel every stale_after_s/4 while the
    # action runs (r12 review #3, the tar swap-loop heartbeat's
    # sibling for an action-shaped window). A crashed driver stops
    # beating and the sentinel ages out as before.
    import threading as _threading

    _hb_stop = _threading.Event()

    def _heartbeat():
        while not _hb_stop.wait(max(1.0, stale_after_s / 4.0)):
            try:
                with _drv_fs.open_output_stream(sentinel) as _o:
                    _o.write(generation.encode("utf-8"))
            except OSError:
                pass  # transient fs hiccup: the next beat retries

    _hb = _threading.Thread(target=_heartbeat, daemon=True)
    _hb.start()
    try:
        manifest = assigned.mapInArrow(write_shards, out_schema).collect()
        _sweep_after_export(
            _drv_fs, _drv_inner, sentinel_base,
            keep={f"part-{int(m.shard):05d}.avro" for m in manifest},
            stale_after_s=stale_after_s,
        )
    finally:
        _hb_stop.set()
        _hb.join(timeout=5)
    _drv_fs.delete_file(sentinel)
    return manifest


def _sweep_after_export(fs, inner, own_sentinel, keep, stale_after_s):
    """Post-action directory reconciliation for ``export_avro_ocf``:
    drop previous-generation ``part-*.avro`` not in ``keep``, aged
    ``.inprogress-*`` temps (young ones may belong to a still-running
    zombie attempt of THIS run — racing a live writer's open stream
    is worse than a one-hour litter window), and foreign
    ``.ocf_export_in_progress-*`` sentinels older than
    ``stale_after_s`` (a crashed export's permanent reader-blocker)."""
    import datetime as _dt

    import pyarrow.fs as pafs

    now = _dt.datetime.now(_dt.timezone.utc)

    def _stale(info) -> bool:
        t = info.mtime
        return t is not None and (
            (now - t.astimezone(_dt.timezone.utc)).total_seconds()
            > stale_after_s
        )

    for info in fs.get_file_info(pafs.FileSelector(inner, recursive=False)):
        if not info.is_file:
            continue
        base = info.path.rsplit("/", 1)[-1]
        if base.startswith("part-") and base.endswith(".avro"):
            if base not in keep:
                fs.delete_file(info.path)
        elif ".avro.inprogress" in base and _stale(info):
            fs.delete_file(info.path)
        elif (
            base.startswith(".ocf_export_in_progress-")
            and base != own_sentinel
            and _stale(info)
        ):
            fs.delete_file(info.path)


def _open_fs(path: str):
    """(pyarrow FileSystem, fs-local path) for a URI or local path."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _list_files(path: str, glob: str) -> list[tuple[str, int]]:
    """Matching (fs-local path, size) pairs under ``path`` — driver
    metadata listing only, same filter as the binaryFile scan so the
    sniff, the whole-file load and the block-split load all agree on
    which files exist."""
    import fnmatch
    import os as _os

    import pyarrow.fs as pafs

    fs, inner = _open_fs(path)
    sel = pafs.FileSelector(inner, recursive=True)
    try:
        infos = [(i.path, i.size) for i in fs.get_file_info(sel) if i.is_file]
    except NotADirectoryError:
        info = fs.get_file_info(inner)
        infos = [(info.path, info.size)]
    files = sorted(
        (f, sz) for f, sz in infos if fnmatch.fnmatch(_os.path.basename(f), glob)
    )
    if not files:
        raise FileNotFoundError(f"no files matching {glob!r} under {path}")
    return files


def _refuse_if_export_in_progress(path: str) -> None:
    """Raise if ``path`` (when it is a directory) carries an
    ``.ocf_export_in_progress-*`` sentinel — an in-flight or
    crash-interrupted ``export_avro_ocf`` whose listing would mix
    generations. Single-file paths have no sentinel concept."""
    import pyarrow.fs as pafs

    fs, inner = _open_fs(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(inner, recursive=False))
    except (NotADirectoryError, FileNotFoundError):
        return
    raised = [
        i.path.rsplit("/", 1)[-1]
        for i in infos
        if i.is_file
        and i.path.rsplit("/", 1)[-1].startswith(".ocf_export_in_progress-")
    ]
    if raised:
        raise RuntimeError(
            f"{path} has an OCF-export-in-progress sentinel "
            f"({', '.join(sorted(raised))}): an export_avro_ocf is "
            "either mid-write or crashed before its post-write sweep; "
            "wait for it (or rerun the export, whose sweep clears "
            "stale sentinels) before reading"
        )


def _sniff_header(fs, file_path: str) -> tuple[dict, str, bytes, int]:
    """(schema, codec, sync, body_offset) from one file's header: read
    growing prefixes until the header parses — bounded by the schema
    text size, never the file size. Only truncation errors grow the
    prefix; structural errors (bad magic, unsupported codec) raise
    immediately instead of re-reading the file."""
    size = 1 << 16
    with fs.open_input_file(file_path) as f:
        while True:
            buf = f.read(size)
            try:
                return parse_ocf_header(bytes(buf))
            except ValueError as exc:
                if "truncated" not in str(exc) or len(buf) < size:
                    raise  # structural error, or the whole file is read
            f.seek(0)
            size *= 4


def _sniff_schema(spark: SparkSession, path: str, glob: str) -> dict:
    """Driver-side header sniff of the first file matching ``glob``
    (the SAME filter the load applies — a sniff/load mismatch would
    return a schema for files the scan then skips)."""
    fs, _ = _open_fs(path)
    files = _list_files(path, glob)
    return _sniff_header(fs, files[0][0])[0]


class _RangedBuf:
    """Grow-on-demand byte window over a pyarrow input file, starting
    at ``base``: ``get(pos, n)`` returns bytes [pos, pos+n) reading
    more of the file only as the block chain actually extends — a
    range task never buffers more than its own blocks (+ one chunk)."""

    CHUNK = 1 << 20

    def __init__(self, f, base: int, file_size: int):
        self.f, self.base, self.size = f, base, file_size
        self.buf = bytearray()

    def _extend_to(self, end: int) -> None:
        need = min(end, self.size) - (self.base + len(self.buf))
        if need <= 0:
            return
        self.f.seek(self.base + len(self.buf))
        self.buf += self.f.read(max(need, self.CHUNK))

    def get(self, pos: int, n: int) -> bytes:
        self._extend_to(pos + n)
        off = pos - self.base
        out = bytes(self.buf[off : off + n])
        if len(out) < n:
            raise ValueError("truncated Avro OCF: block extends past EOF")
        return out

    def find_sync(self, sync: bytes, start: int, end: int) -> int:
        """Absolute position of the first ``sync`` occurrence whose
        FIRST byte lies in [start, end), or -1. Reads ahead past
        ``end`` only by the marker length (a marker may straddle the
        range boundary)."""
        pos = max(start, self.base)
        while pos < end:
            window_end = min(pos + self.CHUNK, end) + len(sync)
            self._extend_to(window_end)
            hay = self.buf[pos - self.base : window_end - self.base]
            i = bytes(hay).find(sync)
            if i >= 0 and pos + i < end:
                return pos + i
            pos = min(pos + self.CHUNK, end)
        return -1


def _read_varint_long(buf: _RangedBuf, pos: int) -> tuple[int, int]:
    """Avro zig-zag long at ``pos`` -> (value, next_pos)."""
    shift, acc = 0, 0
    while True:
        (b,) = buf.get(pos, 1)
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed Avro varint")


def _try_block(buf: _RangedBuf, sync: bytes, block_pos: int):
    """Parse the block starting at ``block_pos`` (just past a sync):
    (count, raw_bytes, next_sync_pos) or None if the framing does not
    validate — the false-positive rejection for a sync pattern that
    happens to occur inside block DATA."""
    try:
        n, p = _read_varint_long(buf, block_pos)
        nbytes, p = _read_varint_long(buf, p)
        if n < 0 or nbytes < 0 or p + nbytes + len(sync) > buf.size:
            return None
        data = buf.get(p, nbytes)
        if buf.get(p + nbytes, len(sync)) != sync:
            return None
        return n, data, p + nbytes
    except ValueError:
        return None


def _decode_block_data(n: int, data: bytes, codec: str, schema: dict) -> list:
    """Decode one block's raw payload to its ``n`` records; raises
    ValueError (or zlib.error) on anything that isn't a genuine,
    complete block — the full-strength validator."""
    if codec == "deflate":
        data = zlib.decompress(data, -15)
    br = _Reader(data)
    out = [_decode_value(br, schema) for _ in range(n)]
    if br.pos != len(data):
        raise ValueError("trailing bytes in OCF block")
    return out


def _decode_block_range(fs, file_path: str, start: int, end: int) -> list:
    """Records of every block OWNED by byte range [start, end) of one
    OCF file. Ownership rule (each block decoded by exactly one range,
    no matter how ranges cut the file): a block belongs to the range
    containing the first byte of the sync marker that PRECEDES it —
    for the first data block that is the header's own sync, so the
    range holding the header tail owns it. A task locates its first
    sync by byte-scan from ``start``, then follows the block chain —
    possibly past ``end``, since the last owned block may straddle the
    boundary — exactly the split protocol Avro's container spec
    enables (the 16-byte marker exists so readers can resynchronize
    at arbitrary offsets).

    False-resync defense: a scan hit is accepted only if the bytes
    after it frame as a block (varint count/size ≥ 0, trailing sync
    in place) AND that block's payload fully DECODES under the file
    schema — framing alone is spoofable when the marker pattern
    occurs inside record data (dense in the worst case, e.g. data
    that embeds the marker bytes; the block-split test constructs
    exactly this). Blocks reached by following a validated chain are
    at exact positions, so later decode failures are real corruption
    and raise instead of resyncing past data loss.

    The ONE position where a first-candidate decode failure is provably
    corruption rather than a framing coincidence is the header's own
    sync (reachable from the header, so exact-chain): there we raise
    instead of scanning on — otherwise a corrupt first block would be
    silently dropped, contradicting the module contract. Every other
    skipped candidate is counted and logged at WARNING so dense
    marker-colliding data is observable, not invisible."""
    schema, codec, sync, body_off = _sniff_header(fs, file_path)
    size = fs.get_file_info(file_path).size
    with fs.open_input_file(file_path) as f:
        buf = _RangedBuf(f, max(min(start, body_off - len(sync)), 0), size)
        # candidate syncs can start no earlier than the header's own
        scan_from = max(start, body_off - len(sync))
        pos = buf.find_sync(sync, scan_from, min(end, size))
        first: list | None = None
        skipped = 0
        while pos >= 0:
            blk = _try_block(buf, sync, pos + len(sync))
            if blk is None and pos == body_off - len(sync) and body_off < size:
                # the header's own sync with data bytes after it MUST
                # frame a block; a framing failure here (corrupt varints
                # or missing trailing sync) is first-block corruption,
                # not a marker coincidence — same contract as the
                # decode-failure raise below. (A header-only file has
                # body_off == size and legitimately frames nothing.)
                raise ValueError(
                    f"corrupt first OCF block at {file_path}:{pos}"
                )
            if blk is not None:
                n, data, _ = blk
                try:
                    first = _decode_block_data(n, data, codec, schema)
                    break
                except (ValueError, zlib.error) as exc:
                    if pos == body_off - len(sync):
                        # exact chain position (the header's own sync):
                        # a framed block that fails to decode here IS
                        # corruption, not a marker coincidence — raise
                        # rather than resync past data loss
                        raise ValueError(
                            f"corrupt first OCF block at {file_path}:{pos}"
                        ) from exc
                    skipped += 1  # framing coincidence inside record data
            pos = buf.find_sync(sync, pos + 1, min(end, size))
        if skipped:
            import logging

            logging.getLogger(__name__).warning(
                "OCF resync skipped %d framed-but-undecodable sync "
                "candidate(s) in %s[%d:%d)", skipped, file_path, start, end,
            )
        if pos < 0:
            return []  # no block starts in this range
        records: list = []
        while True:
            blk = _try_block(buf, sync, pos + len(sync))
            if blk is None:
                raise ValueError(f"OCF block chain broken at {file_path}:{pos}")
            n, data, next_sync = blk
            records.extend(
                first if first is not None
                else _decode_block_data(n, data, codec, schema)
            )
            first = None
            if next_sync >= end or next_sync + len(sync) >= size:
                break
            pos = next_sync
        return records


def read_avro_ocf(
    spark: SparkSession,
    path: str,
    schema_json: str | None = None,
    glob: str = "*.avro",
    split_size: int = 32 << 20,
) -> DataFrame:
    """Typed DataFrame over a directory (or single file) of OCF files
    matching ``glob`` (pass ``"*"`` for extension-less exports, e.g.
    Sqoop part-files — the sniff and the scan share the one filter, so
    a file the sniff would accept is never silently skipped by the
    load). ``schema_json`` pins the reader schema; when omitted, the
    first matching file's header is sniffed driver-side.

    Scale shape: the driver lists (path, size) METADATA only, fans the
    byte ranges ``[i*split_size, (i+1)*split_size)`` of every file out
    as rows, and each range task ranged-reads + decodes just its own
    sync-delimited blocks (``_decode_block_range``). A multi-GB OCF
    file therefore decodes across size/split_size parallel tasks with
    bounded per-task memory — the whole-file ``binaryFile`` row this
    replaces capped file size at the 2 GiB binary-column limit and
    serialized each file through one task. Records surface through the
    same Arrow-batched ``mapInPandas`` + JSON bridge + JVM ``from_json``
    tail as the streaming reader (``_decode_to_typed``).

    Refuses a directory with a raised ``.ocf_export_in_progress-*``
    sentinel: either an export is mid-write (finals land
    incrementally, the listing would mix generations) or one crashed
    mid-window — both unreadable states the sentinel exists to make
    detectable (r11 review #1)."""
    _refuse_if_export_in_progress(path)
    schema = (
        json.loads(schema_json)
        if schema_json
        else _sniff_schema(spark, path, glob)
    )
    scheme = path.split("://", 1)[0] + "://" if "://" in path else ""
    try:
        files = _list_files(path, glob)
    except FileNotFoundError:
        if schema_json is None:
            raise  # nothing to sniff a schema from either
        files = []  # pinned schema over an empty export dir: empty frame
    ranges = [
        (f, off, min(off + split_size, sz))
        for f, sz in files
        for off in range(0, max(sz, 1), split_size)
    ]
    if not ranges:
        return spark.createDataFrame([], avro_to_spark_type(schema))
    n_slots = min(len(ranges), spark.sparkContext.defaultParallelism)
    rdf = spark.createDataFrame(
        ranges, "file string, start long, end long"
    ).repartition(n_slots)

    def decode(batches):
        import pandas as pd

        fs_cache: dict = {}
        for pdf in batches:
            for file, s, e in zip(pdf["file"], pdf["start"], pdf["end"]):
                if not fs_cache:
                    fs_cache["fs"] = _open_fs(scheme + file)[0]
                records = _decode_block_range(fs_cache["fs"], file, int(s), int(e))
                if records:
                    yield pd.DataFrame(
                        {"json": [json.dumps(rec) for rec in records]}
                    )

    decoded = rdf.mapInPandas(decode, "json string")
    return decoded.select(F.from_json("json", avro_to_spark_type(schema)).alias("r")).select(
        "r.*"
    )


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
