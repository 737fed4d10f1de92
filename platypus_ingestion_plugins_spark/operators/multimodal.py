"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB: media lives as `binary` columns (or object-store
pointers for >2 GB items) beside a metadata struct; decode/resize/
frame-sample run as Arrow-batched `mapInPandas` stages so the Python
boundary is crossed once per batch, not per row.

Codec paths: `decode_stub=True` produces a deterministic fake from
the payload bytes (payload-format-agnostic — the oracle queries use
it over text payloads); `decode_stub=False` runs a REAL codec — the
pure-numpy netpbm (P5/P6) decoder in `functions/netpbm.py` — doing
genuine decode -> pixel-op -> re-encode work end to end. General
formats (JPEG/PNG/mp4) still need libvips/PIL/ffmpeg, absent from
this container; swapping them in means replacing the netpbm calls
inside the kernels, nothing else — the Arrow batching, schema, and
partition shape are shared.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class MediaCodec:
    """PUBLIC EXTENSION API — the decode-kernel injection point.

    A deployment with real image libraries swaps its codec in here —
    ``MediaCodec("pillow", decode=pil_decode, encode=pil_encode)`` —
    and passes it to ``extract_features(codec=...)`` /
    ``resize(codec=...)``; operator code, Arrow batching, output
    schemas and partition shape are untouched (the kernels call
    ``codec.decode``/``codec.encode`` and nothing else of the codec).

    Contract (pinned by tests/test_multimodal_codec_seam.py):

    - ``decode(payload: bytes) -> numpy uint8 array`` of shape
      (h, w, c) with c in {1, 3} (2-D grayscale also accepted);
    - ``encode(img) -> bytes`` such that ``decode(encode(img))``
      round-trips pixel-exactly for images the codec produced;
    - both deterministic (equal input -> equal output) if downstream
      oracle checks / replay idempotency are to hold.
    """

    name: str
    decode: Callable
    encode: Callable


def netpbm_codec() -> MediaCodec:
    """The in-sandbox reference MediaCodec: the pure-numpy netpbm
    P5/P6 codec (functions/netpbm.py) wrapped in the seam's shape."""
    from platypus_ingestion_plugins_spark.functions import netpbm

    return MediaCodec("netpbm", decode=netpbm.decode, encode=netpbm.encode)


def attach_payload(df: DataFrame, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a
    source column (stand-in for reading real media bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )
    return df.withColumn("payload", payload).withColumn("media_meta", meta)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 8,
    decode_stub: bool = True,
    codec: MediaCodec | None = None,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Stub kernel: feature[i] = byte-sum of payload slice i (mod 256) /
    255 — deterministic, format-agnostic, exercises the full batch
    path. Real kernel (``decode_stub=False``): netpbm decode + the
    ``dim``-bin normalized luminance histogram
    (functions/netpbm.histogram_features) — an actual image feature
    over actual pixels; payloads must be P5/P6. An injected ``codec``
    (``MediaCodec`` — the public seam) overrides both: payloads decode
    through it and the same luminance histogram runs on its pixels."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import netpbm

        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                if codec is not None:
                    feats.append(
                        netpbm.luminance_histogram(codec.decode(bytes(buf)), dim)
                    )
                    continue
                if not decode_stub:
                    feats.append(netpbm.histogram_features(bytes(buf), dim))
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                chunks = np.array_split(arr, dim) if len(arr) else [np.array([0])] * dim
                feats.append([float(int(c.sum()) % 256) / 255.0 for c in chunks])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(lambda b: len(bytes(b))),
                    "feature": feats,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
    ]
)


def resize(
    df: DataFrame,
    target_bytes: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_stub: bool = True,
    codec: MediaCodec | None = None,
) -> DataFrame:
    """Resize/transcode stage over mapInPandas (Arrow batches).

    Stub kernel: deterministic byte-stride downsample of the payload to
    <= target_bytes (stride = ceil(len/target)) — format-agnostic.
    Real kernel (``decode_stub=False``): netpbm decode -> deterministic
    nearest-neighbor downscale to the byte budget -> re-encode
    (functions/netpbm.resize_to_budget) — a genuine
    decode->scale->re-encode over actual pixels; payloads must be
    P5/P6. An injected ``codec`` (``MediaCodec`` — the public seam)
    overrides both: decode through it, the shared nearest-neighbor
    budget shrink (netpbm.resize_pixels_to_budget), re-encode through
    it. All paths share the production plumbing: binary in/out through
    Arrow, per-batch Python crossing, schema with size accounting."""

    def kernel(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import netpbm

        for pdf in batches:
            out_payloads, orig, resized = [], [], []
            for buf in pdf[payload_col]:
                raw = bytes(buf)
                if codec is not None:
                    small = netpbm.resize_pixels_to_budget(
                        codec.decode(raw), target_bytes, codec.encode
                    )
                elif not decode_stub:
                    small = netpbm.resize_to_budget(raw, target_bytes)
                else:
                    stride = max(1, math.ceil(len(raw) / target_bytes)) if raw else 1
                    small = raw[::stride]
                out_payloads.append(small)
                orig.append(len(raw))
                resized.append(len(small))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out_payloads,
                    "orig_bytes": orig,
                    "resized_bytes": resized,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, RESIZED_SCHEMA)


def _ref_schema(df: DataFrame, payload_col: str, ref_col: str) -> T.StructType:
    """Input schema with ``payload_col`` replaced by the pointer struct."""
    fields = []
    for f in df.schema.fields:
        if f.name == payload_col:
            fields.append(
                T.StructField(
                    ref_col,
                    T.StructType(
                        [
                            T.StructField("path", T.StringType()),
                            T.StructField("offset", T.LongType()),
                            T.StructField("length", T.LongType()),
                            T.StructField("inline", T.BinaryType()),
                        ]
                    ),
                )
            )
        else:
            fields.append(f)
    return T.StructType(fields)


def _blob_fs(path: str):
    """(pyarrow FileSystem, path-within-fs) for a local path or URI.
    pyarrow.fs works executor-side (no SparkSession), so blob I/O uses
    it rather than the driver-bound Hadoop shim in fs.py; s3a:// is
    spelled s3:// here (same store, pyarrow's scheme)."""
    import pyarrow.fs as pafs

    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def externalize_payloads(
    df: DataFrame,
    base_path: str,
    threshold_bytes: int = 1 << 20,
    payload_col: str = "payload",
    ref_col: str = "payload_ref",
) -> DataFrame:
    """Swap oversized payloads for object-store pointers.

    Rows whose payload exceeds ``threshold_bytes`` have their bytes
    appended to ONE packed blob file per partition under ``base_path``
    and carry a (path, offset, length) pointer; smaller payloads stay
    inline in the struct's ``inline`` field (NULL payload -> NULL ref).
    Per-partition packed blobs, not per-object files: at 100 TB of
    video, per-object files are billions of small objects, while a
    packed blob is one sequential write per task and one ranged read
    per consumer. Downstream of this stage every shuffle/join moves a
    ~100-byte struct instead of multi-MB rows — the row-size cap SURVEY
    §2.7 names for >2 GB items.

    Blob files are named by task attempt (partition id + task attempt
    id), so a retried task writes a fresh file and only the winning
    attempt's pointers are committed — failed-attempt blobs are
    unreferenced garbage, collected by ``gc_blobs`` (same
    uncommitted-file semantics as a parquet write without a
    committer).

    MATERIALIZE THE RESULT IMMEDIATELY (``externalize_to_table`` does
    both steps): the output is non-deterministic across recomputes —
    blob paths embed the task attempt id, so running the un-persisted
    frame twice (two actions, or lineage recompute after executor
    loss) writes a second copy of every blob and yields different
    pointers per action. Old pointers stay valid (blobs are never
    overwritten), but storage doubles until ``gc_blobs`` runs against
    the frame you actually kept. On object stores the write-then-read
    ordering ALSO requires the barrier: pyarrow output streams are
    multipart uploads invisible until close, so a same-plan
    ``load_payloads`` would miss them (locally it happens to work).
    """
    out_schema = _ref_schema(df, payload_col, ref_col)
    cols = [f.name for f in df.schema.fields]

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        ctx = TaskContext.get()
        blob_path = (
            f"{base_path.rstrip('/')}/blob-{ctx.partitionId()}-"
            f"{ctx.taskAttemptId()}.bin"
        )
        fs, inner = _blob_fs(blob_path)
        out = None  # opened lazily: partitions with no oversized rows write nothing
        offset = 0
        try:
            for pdf in batches:
                refs = []
                for buf in pdf[payload_col]:
                    if buf is None:
                        refs.append(None)
                        continue
                    raw = bytes(buf)
                    if len(raw) <= threshold_bytes:
                        refs.append(
                            {"path": None, "offset": None, "length": len(raw), "inline": raw}
                        )
                    else:
                        if out is None:
                            fs.create_dir(inner.rsplit("/", 1)[0], recursive=True)
                            out = fs.open_output_stream(inner)
                        out.write(raw)
                        refs.append(
                            {
                                "path": blob_path,
                                "offset": offset,
                                "length": len(raw),
                                "inline": None,
                            }
                        )
                        offset += len(raw)
                res = pd.DataFrame(
                    {
                        c: (pd.Series(refs, dtype=object) if c == ref_col else pdf[payload_col if c == payload_col else c])
                        for c in [f.name for f in out_schema.fields]
                    }
                )
                yield res
        finally:
            if out is not None:
                out.close()

    return df.mapInPandas(kernel, out_schema)


def externalize_to_table(
    df: DataFrame,
    base_path: str,
    table_path: str,
    threshold_bytes: int = 1 << 20,
    payload_col: str = "payload",
    ref_col: str = "payload_ref",
) -> DataFrame:
    """Externalize + materialize in one step — the safe pattern.

    Writes the pointer frame to parquet at ``table_path`` (ONE action,
    so every blob is written exactly once and closed before any
    consumer reads it) and returns the parquet-backed frame. Use this
    instead of chaining actions onto ``externalize_payloads`` output:
    the parquet write is the materialization barrier that (a) pins one
    deterministic set of pointers, (b) closes blob output streams
    before reads — required on object stores where open multipart
    uploads are invisible — and (c) defines the reference set
    ``gc_blobs`` preserves."""
    ext = externalize_payloads(df, base_path, threshold_bytes, payload_col, ref_col)
    ext.write.mode("overwrite").parquet(table_path)
    return df.sparkSession.read.parquet(table_path)


def gc_blobs(
    df: DataFrame,
    base_path: str,
    ref_col: str = "payload_ref",
    min_age_s: float = 3600.0,
) -> list[str]:
    """Garbage-collect orphaned blob files under ``base_path``.

    Failed/retried task attempts (and un-materialized recomputes)
    leave ``blob-*.bin`` files that no committed pointer references.
    This lists the blob directory, subtracts every path referenced by
    ``df``'s pointer column, and deletes the rest. Pass the
    MATERIALIZED pointer table (the frame ``externalize_to_table``
    returned / the parquet you kept) — running this against a live
    un-persisted lineage would recompute it and mint fresh blobs while
    collecting the ones you meant to keep.

    ``min_age_s`` is the in-flight-writer guard: blobs younger than it
    are never deleted, so a concurrent ``externalize_to_table`` whose
    pointers have not landed yet (its fresh blobs are unreferenced BY
    CONSTRUCTION until the parquet commit) cannot have its data
    collected from under it. The dual invariant: ``base_path`` belongs
    to ONE pointer table — blobs referenced by a different table
    sharing the directory look like orphans here. Set ``min_age_s=0``
    only when no writer can be in flight.

    The listing and delete are driver-side — blob files are one per
    task attempt, so that set is bounded by task count, not data size.
    The referenced side stays DISTRIBUTED: pointer basenames (unique
    ``blob-<uuid>.bin`` per attempt) are semi-joined against the
    broadcast listing and only the matches are collected — at most
    one row per LISTED blob, never one per corpus pointer (the r7
    shape collected the whole distinct referenced-path set, which at
    extreme scale is millions of strings on the driver). Matching on
    basename rather than full path also makes URI-spelling aliases
    safe: a pointer that reaches the same file through a different
    scheme prefix still protects it. Returns the deleted paths
    (fs-internal form), sorted."""
    import time

    import pyarrow.fs as pafs

    fs, inner = _blob_fs(base_path.rstrip("/"))
    try:
        infos = fs.get_file_info(pafs.FileSelector(inner, recursive=False))
    except FileNotFoundError:
        return []
    cutoff = time.time() - min_age_s
    # A blob with UNKNOWN mtime must be treated as too-young, not
    # too-old: on a filesystem that doesn't report mtimes, deleting it
    # would invert the min_age_s in-flight-writer guard and could
    # collect a concurrent externalize's uncommitted blob.
    blobs = {
        i.path
        for i in infos
        if i.is_file
        and i.base_name.startswith("blob-")
        and i.base_name.endswith(".bin")
        and (
            min_age_s <= 0
            or (i.mtime is not None and i.mtime.timestamp() <= cutoff)
        )
    }
    if not blobs:
        return []
    from pyspark.sql import functions as F  # local alias for clarity

    spark = df.sparkSession
    listing = spark.createDataFrame(
        [(p.rsplit("/", 1)[-1],) for p in blobs], "base string"
    )
    referenced = {
        r.base
        for r in df.select(
            F.element_at(F.split(F.col(f"{ref_col}.path"), "/"), -1).alias("base")
        )
        .where(F.col(f"{ref_col}.path").isNotNull())
        .join(F.broadcast(listing), "base", "left_semi")
        .distinct()
        .collect()
    }
    orphans = sorted(p for p in blobs if p.rsplit("/", 1)[-1] not in referenced)
    for p in orphans:
        fs.delete_file(p)
    return orphans


def load_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    ref_col: str = "payload_ref",
) -> DataFrame:
    """Re-materialize payload bytes from a pointer struct (the inverse
    of externalize_payloads): inline bytes pass through, external rows
    are ranged-read from their blob file. Reads are grouped by blob
    path within each Arrow batch — one open + sorted seeks per file per
    batch, not one open per row. Place AFTER the shuffles/joins that
    needed the skinny rows and BEFORE the decode kernel.

    Requires a materialization barrier upstream on object stores: the
    pointer frame must come from ``externalize_to_table`` (or another
    persisted copy), never the same plan as ``externalize_payloads`` —
    open multipart-upload blobs are invisible to readers until closed.
    Chaining directly works on local filesystems only, and recomputes
    the externalize stage (fresh duplicate blobs) on every action."""
    fields = [
        f if f.name != ref_col else T.StructField(payload_col, T.BinaryType())
        for f in df.schema.fields
    ]
    out_schema = T.StructType(fields)

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        handles: dict[str, object] = {}

        def read_ref(ref):
            if ref is None:
                return None
            if ref.get("inline") is not None:
                return bytes(ref["inline"])
            path = ref["path"]
            h = handles.get(path)
            if h is None:
                fs, inner = _blob_fs(path)
                h = handles[path] = fs.open_input_file(inner)
            h.seek(ref["offset"])
            return h.read(ref["length"])

        try:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        c: (pdf[ref_col].map(read_ref) if c == payload_col else pdf[c])
                        for c in [f.name for f in out_schema.fields]
                    }
                )
        finally:
            for h in handles.values():
                h.close()

    return df.mapInPandas(kernel, out_schema)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", every_n_bytes: int = 64
) -> DataFrame:
    """Frame-sampling plumbing: slice the payload every N bytes
    (stand-in for video frame extraction) — pure JVM byte ops."""
    n = F.length(F.col(payload_col))
    idx = F.sequence(F.lit(1), F.greatest((n / every_n_bytes).cast("int"), F.lit(1)))
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(idx, lambda i: F.substring(F.col(payload_col).cast("string"), (i - 1) * every_n_bytes + 1, every_n_bytes))
        ).alias("frame_no", "frame"),
    )


def dhash_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    grid_w: int = 10,
    grid_h: int = 7,
) -> DataFrame:
    """Perceptual difference hash (dHash) over netpbm payloads:
    (id, dhash long) — the image-CONTENT near-dup fingerprint the
    text-side SimHash can't provide (r12; VERDICT r11 task #3).

    Kernel per image (all integer arithmetic, engine-reproducible):
    netpbm decode -> integer Rec.601 luma for P6 (P5 is already
    luminance) -> deterministic floor-index nearest-neighbor resample
    to (grid_h, grid_w) (functions/netpbm.resize_nearest — the exact
    resize the codec ships) -> bit r*(grid_w-1)+c is 1 iff
    luma[r][c] > luma[r][c+1]. Default grid 7x10 gives 7*9 = 63
    comparison bits — deliberately one short of 64 so the hash stays
    non-negative in a signed 64-bit long and XOR/popcount/banding
    arithmetic is identical in every engine (no two's-complement
    edge). Robust to uniform brightness shifts and re-encodes;
    near-identical images land within a few bits.

    Scale shape: one Arrow-batched mapInPandas crossing (binary in,
    one long out), no shuffle; the hash then feeds the banded blocker
    (image_neardup_pairs), never an all-pairs join.
    """
    if grid_w < 2 or grid_h < 1:
        raise ValueError(f"grid must be >= 1x2, got {grid_h}x{grid_w}")
    bits = grid_h * (grid_w - 1)
    if bits > 63:
        raise ValueError(
            f"{grid_h}x{grid_w} grid needs {bits} bits; max 63 so the "
            "hash stays non-negative in a signed 64-bit long"
        )

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import netpbm

        for pdf in batches:
            hashes = []
            for buf in pdf[payload_col]:
                img = netpbm.decode(bytes(buf))
                if img.shape[2] == 3:
                    lum = (
                        299 * img[:, :, 0].astype(np.int64)
                        + 587 * img[:, :, 1].astype(np.int64)
                        + 114 * img[:, :, 2].astype(np.int64)
                    ) // 1000
                else:
                    lum = img[:, :, 0].astype(np.int64)
                small = netpbm.resize_nearest(lum, grid_h, grid_w)
                h = 0
                for r in range(grid_h):
                    for c in range(grid_w - 1):
                        if small[r][c] > small[r][c + 1]:
                            h |= 1 << (r * (grid_w - 1) + c)
                hashes.append(h)
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, dhash long"
    )


def image_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 7,
    grid_w: int = 10,
    grid_h: int = 7,
) -> DataFrame:
    """Image near-dup pairs by dHash Hamming distance <= max_hamming:
    (id_a, id_b, hamming). The text SimHash blocker's shape verbatim
    (operators/dedup.simhash_neardup_pairs), sharing its band-keys
    explode: with ``bands`` > ``max_hamming`` disjoint bit-bands over
    the 63-bit hash, two fingerprints inside the Hamming budget agree
    on >= 1 (band, val) by pigeonhole — blocking is LOSSLESS (recall
    exactly 1 vs the all-pairs filter, which is what the oracle
    replays) and the n^2 cross join never happens. Verification is
    one popcount(XOR) per candidate, run BEFORE the pair-dedup
    shuffle so only true near-dups pay it."""
    bits = grid_h * (grid_w - 1)
    fp = dhash_images(df, id_col, payload_col, grid_w, grid_h)
    return _fingerprint_neardup_pairs(
        fp, id_col, "dhash", bits, max_hamming, bands
    )


def _fingerprint_neardup_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str,
    bits: int,
    max_hamming: int,
    bands: int,
) -> DataFrame:
    """The banded verify-join shared by the image (dHash) and audio
    (energy envelope) near-dup blockers: (id_a, id_b, hamming) with
    lossless pigeonhole blocking (bands > max_hamming over disjoint
    bit-bands), popcount verify BEFORE the pair-dedup shuffle."""
    from platypus_ingestion_plugins_spark.operators.dedup import (
        fingerprint_band_keys,
    )

    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for lossless blocking")
    keyed = fingerprint_band_keys(fp, id_col, fp_col, bits, bands)
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col(fp_col).alias("fp_a"), "band", "val"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col(fp_col).alias("fp_b"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("sumsq", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-clip audio features over framed s16le PCM payloads
    (functions/pcm.py — the audio twin of the netpbm image path, r12):
    frame count, exact floor-milliseconds duration, integer
    sum-of-squares (the loudness sufficient statistic), peak
    amplitude and zero-crossing count — all integer arithmetic, so an
    external engine replays every number from the same bytes.

    Scale shape: one Arrow-batched mapInPandas crossing (binary in,
    six longs out), no shuffle — the audio-quality filter stage of a
    multimodal pipeline (silence/clipping/duration gates compose as
    plain column predicates downstream)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import pcm

        cols = ("n_samples", "sample_rate", "duration_ms", "sumsq",
                "peak", "zero_crossings")
        for pdf in batches:
            # dict-of-lists, not list-of-dicts: an EMPTY Arrow batch
            # must still yield a frame carrying the schema's columns
            # (pd.DataFrame([]) has none and breaks the mapInPandas
            # contract — r12 self-review)
            out = {"doc_id": list(pdf[id_col])}
            out.update({c: [] for c in cols})
            for buf in pdf[payload_col]:
                s = pcm.stats(bytes(buf))
                for c in cols:
                    out[c].append(s[c])
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, AUDIO_STATS_SCHEMA
    )


def audio_resample(
    df: DataFrame,
    new_rate: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Deterministic nearest-neighbor PCM resample stage (the audio
    twin of multimodal.resize): decode -> floor-index time resample ->
    re-encode, byte-deterministic (functions/pcm.resample_nearest).
    Output: (id, payload, orig_samples, resampled_samples)."""

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import pcm

        for pdf in batches:
            payloads, orig, res = [], [], []
            for buf in pdf[payload_col]:
                raw = bytes(buf)
                arr, _, _ = pcm.decode(raw)
                out = pcm.resample_nearest(raw, new_rate)
                oarr, _, _ = pcm.decode(out)
                payloads.append(out)
                orig.append(arr.shape[0])
                res.append(oarr.shape[0])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "orig_samples": orig,
                    "resampled_samples": res,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, RESIZED_SCHEMA_AUDIO
    )


RESIZED_SCHEMA_AUDIO = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("orig_samples", T.LongType()),
        T.StructField("resampled_samples", T.LongType()),
    ]
)


def video_frame_dhashes(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    grid_w: int = 10,
    grid_h: int = 7,
) -> DataFrame:
    """Per-frame perceptual hashes over a multi-frame netpbm payload
    (concatenated P5/P6 frames — each header self-delimits its raster,
    functions/netpbm.decode_many): (id, frame_no, dhash). The video
    extension of ``dhash_images`` (r12): one Arrow-batched crossing,
    a few longs out per frame, no shuffle. Feeds
    ``video_neardup_pairs`` — never compare videos by raw bytes (a
    re-encode breaks byte equality; per-frame gradient hashes
    survive it)."""
    bits = grid_h * (grid_w - 1)
    if bits > 63:
        raise ValueError(
            f"{grid_h}x{grid_w} grid needs {bits} bits; max 63 so the "
            "hash stays non-negative in a signed 64-bit long"
        )

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import netpbm

        def one_hash(img):
            if img.shape[2] == 3:
                lum = (
                    299 * img[:, :, 0].astype(np.int64)
                    + 587 * img[:, :, 1].astype(np.int64)
                    + 114 * img[:, :, 2].astype(np.int64)
                ) // 1000
            else:
                lum = img[:, :, 0].astype(np.int64)
            small = netpbm.resize_nearest(lum, grid_h, grid_w)
            h = 0
            for r in range(grid_h):
                for c in range(grid_w - 1):
                    if small[r][c] > small[r][c + 1]:
                        h |= 1 << (r * (grid_w - 1) + c)
            return h

        for pdf in batches:
            ids, frame_nos, hashes = [], [], []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                for fno, img in enumerate(netpbm.decode_many(bytes(buf))):
                    ids.append(i)
                    frame_nos.append(fno)
                    hashes.append(one_hash(img))
            yield pd.DataFrame(
                {id_col: ids, "frame_no": frame_nos, "dhash": hashes}
            )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, frame_no long, dhash long"
    )


def video_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    min_matching_frames: int = 2,
    bands: int = 7,
    grid_w: int = 10,
    grid_h: int = 7,
) -> DataFrame:
    """Video near-dup pairs by ALIGNED per-frame dHash agreement:
    (id_a, id_b, n_matching_frames) where a frame index matches when
    its two hashes sit within ``max_hamming``, and a pair qualifies at
    >= ``min_matching_frames`` matches — the re-encode/watermark-
    robust containment test frame fingerprinting buys (aligned
    comparison is the right default for transcode/crop-free re-uploads;
    shuffled-order piracy detection would swap frame_no out of the
    join key for a set-overlap count).

    Scale shape: band-blocking PER (frame_no, band, val) — the
    pigeonhole guarantee applies frame-by-frame, so every qualifying
    frame match is found (blocking lossless for the frame predicate,
    hence for the count) and the n^2 video cross join never happens;
    popcount verify before the distinct, one count agg to the pair
    threshold."""
    from platypus_ingestion_plugins_spark.operators.dedup import (
        fingerprint_band_keys,
    )

    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for lossless blocking")
    bits = grid_h * (grid_w - 1)
    fp = video_frame_dhashes(df, id_col, payload_col, grid_w, grid_h)
    keyed = fingerprint_band_keys(fp, id_col, "dhash", bits, bands)
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col("dhash").alias("fp_a"),
        "frame_no", "band", "val",
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col("dhash").alias("fp_b"),
        "frame_no", "band", "val",
    )
    frame_matches = (
        a.join(b, ["frame_no", "band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
            <= max_hamming
        )
        .select("id_a", "id_b", "frame_no")
        .distinct()
    )
    return (
        frame_matches.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= min_matching_frames)
    )


def audio_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    n_windows: int = 64,
) -> DataFrame:
    """Perceptual audio fingerprint (r12, completing the modality
    matrix next to dHash): (id, afp long) — a 63-bit energy-envelope
    hash. The clip's first channel splits into ``n_windows`` equal
    floor-boundary windows (window w covers samples
    [w*n//W, (w+1)*n//W)); bit w is 1 iff window w's integer energy
    (sum of squares) EXCEEDS window w+1's — the time-axis analogue of
    dHash's horizontal gradient, robust to uniform gain changes
    (scaling all samples scales every window's energy together, which
    preserves every comparison) and, like dHash, 63 bits so XOR/
    popcount/banding arithmetic is engine-identical. All integer
    arithmetic over the decoded s16le samples."""
    if n_windows - 1 > 63 or n_windows < 2:
        raise ValueError(
            f"n_windows must be in [2, 64] (63-bit budget), got {n_windows}"
        )

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from platypus_ingestion_plugins_spark.functions import pcm

        for pdf in batches:
            hashes = []
            for buf in pdf[payload_col]:
                arr, _, _ = pcm.decode(bytes(buf))
                ch = arr[:, 0].astype(np.int64)
                n = ch.shape[0]
                bounds = (np.arange(n_windows + 1) * n) // n_windows
                energy = [
                    int((ch[bounds[w]: bounds[w + 1]] ** 2).sum())
                    for w in range(n_windows)
                ]
                h = 0
                for w in range(n_windows - 1):
                    if energy[w] > energy[w + 1]:
                        h |= 1 << w
                hashes.append(h)
            yield pd.DataFrame({id_col: pdf[id_col], "afp": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        kernel, f"{id_col} long, afp long"
    )


def audio_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    max_hamming: int = 6,
    bands: int = 7,
    n_windows: int = 64,
) -> DataFrame:
    """Audio near-dup pairs by envelope-hash Hamming distance:
    (id_a, id_b, hamming) — the image blocker's exact shape
    (_fingerprint_neardup_pairs: lossless pigeonhole banding, popcount
    verify before the pair shuffle) over ``audio_fingerprints``."""
    bits = n_windows - 1
    fp = audio_fingerprints(df, id_col, payload_col, n_windows)
    return _fingerprint_neardup_pairs(
        fp, id_col, "afp", bits, max_hamming, bands
    )
