"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB: media lives as `binary` columns (or object-store
pointers for >2 GB items) beside a metadata struct; decode/resize/
frame-sample run as Arrow-batched `mapInPandas` stages so the Python
boundary is crossed once per batch, not per row.

The container has no image/audio codecs, so the decode kernels are
STUBBED: `decode_stub=True` produces a deterministic fake feature
vector from the payload bytes (so the Spark-side plumbing — schema,
batching, partitioning — is fully real and tested); `decode_stub=
False` raises NotImplementedError where a real libvips/ffmpeg call
would go.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Stub kernel: feature[i] = byte-sum of payload slice i (mod 256) /
    255 — deterministic, exercises the full batch path. A real kernel
    would decode the media and run the extractor here, with identical
    plumbing."""

    def kernel(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio codecs not present "
                    "in this environment; pass decode_stub=True"
                )
            feats = []
            for buf in pdf[payload_col]:
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
) -> DataFrame:
    """Resize/transcode stage over mapInPandas (Arrow batches).

    Stub kernel: deterministic byte-stride downsample of the payload to
    <= target_bytes (stride = ceil(len/target)), standing in for a real
    decode->scale->re-encode (libvips/PIL/ffmpeg not in this
    environment; ``decode_stub=False`` marks where it goes). The
    plumbing — binary in/out through Arrow, per-batch Python crossing,
    schema with size accounting — is the real production shape."""

    def kernel(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media resize requires codecs not present in this "
                    "environment; pass decode_stub=True"
                )
            out_payloads, orig, resized = [], [], []
            for buf in pdf[payload_col]:
                raw = bytes(buf)
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
