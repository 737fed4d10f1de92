"""Pure-numpy netpbm (P5 grayscale / P6 RGB) image codec.

The container ships no image libraries, but netpbm binary formats are
simple enough to decode with numpy alone — which makes them the REAL
(non-stub) codec path for the multimodal kernels: a byte-exact,
dependency-free decode -> pixel-op -> re-encode chain
(`operators/multimodal.py` ``decode_stub=False``). The format is the
public netpbm spec: magic ``P5``/``P6``, ASCII width/height/maxval
tokens separated by whitespace with ``#`` comments, a single
whitespace byte, then the raw big-endian raster (1 byte/sample for
maxval <= 255, the only depth supported here).

Everything is deterministic (no dithering, floor-index nearest
neighbor), so outputs are byte-checkable in tests and stable across
engines/runs.
"""

from __future__ import annotations

import numpy as np

_WS = b" \t\r\n\x0b\x0c"


def _next_token(raw: bytes, pos: int) -> tuple[bytes, int]:
    """Next header token after ``pos``, skipping whitespace and
    ``#``-to-end-of-line comments (netpbm header grammar)."""
    n = len(raw)
    while pos < n:
        c = raw[pos : pos + 1]
        if c in (b"#",):
            while pos < n and raw[pos : pos + 1] != b"\n":
                pos += 1
        elif c in _WS:
            pos += 1
        else:
            break
    start = pos
    while pos < n and raw[pos : pos + 1] not in _WS and raw[pos : pos + 1] != b"#":
        pos += 1
    if start == pos:
        raise ValueError("truncated netpbm header")
    return raw[start:pos], pos


def decode(raw: bytes) -> np.ndarray:
    """Decode a P5/P6 image to a (height, width, channels) uint8 array
    (channels 1 for P5, 3 for P6). Raises ValueError on anything that
    is not a complete, maxval<=255 binary netpbm image."""
    img, _end = decode_at(raw, 0)
    return img


def decode_many(raw: bytes) -> list[np.ndarray]:
    """Decode a CONCATENATION of P5/P6 images (the trivial multi-frame
    'video' container the frame-level kernels consume — each netpbm
    header carries its own raster length, so frames self-delimit).
    Raises on trailing garbage: a container that doesn't parse to
    exactly N whole frames is corrupt, not 'N frames plus noise'."""
    frames, pos = [], 0
    while pos < len(raw):
        img, pos = decode_at(raw, pos)
        frames.append(img)
    return frames


def decode_at(raw: bytes, start: int) -> tuple[np.ndarray, int]:
    """Decode one P5/P6 image beginning at byte ``start``; returns
    (image, end offset) so concatenated frames parse sequentially."""
    if len(raw) < start + 2 or raw[start : start + 1] != b"P" or raw[
        start + 1 : start + 2
    ] not in (b"5", b"6"):
        raise ValueError("not a binary netpbm (P5/P6) payload")
    channels = 3 if raw[start + 1 : start + 2] == b"6" else 1
    pos = start + 2
    dims = []
    for _ in range(3):
        tok, pos = _next_token(raw, pos)
        try:
            dims.append(int(tok))
        except ValueError as exc:
            raise ValueError(f"bad netpbm header token {tok!r}") from exc
    width, height, maxval = dims
    if width <= 0 or height <= 0:
        raise ValueError(f"bad netpbm dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    # exactly ONE whitespace byte after maxval, per spec — anything
    # else (a comment, CRLF shifting the raster) must fail loudly, not
    # decode every pixel off-by-N
    if pos >= len(raw) or raw[pos : pos + 1] not in _WS:
        raise ValueError("netpbm raster must follow maxval after one whitespace")
    pos += 1
    count = width * height * channels
    if len(raw) - pos < count:
        raise ValueError("truncated netpbm raster")
    img = (
        np.frombuffer(raw, dtype=np.uint8, count=count, offset=pos)
        .reshape(height, width, channels)
        .copy()
    )
    if maxval != 255:
        # rescale sub-255 sample depths to the canonical 0..255 scale
        # (spec-valid maxval=15 white must stay white, not turn 15/255
        # gray through re-encode or histogram kernels)
        img = ((img.astype(np.uint32) * 255 + maxval // 2) // maxval).clip(
            0, 255
        ).astype(np.uint8)
    return img, pos + count


def encode(img: np.ndarray) -> bytes:
    """Encode a (h, w, 1|3) or (h, w) uint8 array as P5/P6 bytes —
    canonical minimal header, so equal pixel arrays encode to equal
    bytes."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"expected (h, w, 1|3) array, got {img.shape}")
    magic = b"P6" if img.shape[2] == 3 else b"P5"
    header = b"%s\n%d %d\n255\n" % (magic, img.shape[1], img.shape[0])
    return header + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def resize_nearest(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Deterministic floor-index nearest-neighbor resample."""
    h, w = img.shape[:2]
    rows = (np.arange(max(new_h, 1)) * h) // max(new_h, 1)
    cols = (np.arange(max(new_w, 1)) * w) // max(new_w, 1)
    return img[rows][:, cols]


def resize_to_budget(raw: bytes, target_bytes: int) -> bytes:
    """Decode, downscale (never upscale) so the re-encoded image fits
    ``target_bytes``, re-encode. The scale factor comes from the exact
    byte model size = header + h*w*c, solved for the largest uniform
    scale whose encoding fits; at least 1x1 survives."""
    img = decode(raw)
    h, w, c = img.shape
    header = len(b"P6\n%d %d\n255\n" % (w, h))  # shrinks or stays as dims shrink
    budget = max(target_bytes - header, c)
    scale = min(1.0, (budget / (h * w * c)) ** 0.5)
    new_h = max(1, int(h * scale))
    new_w = max(1, int(w * scale))
    # the int() floor plus the shrinking header keep this inside budget
    # except in degenerate tiny-target cases, where one more shrink
    # step lands it
    out = encode(resize_nearest(img, new_h, new_w))
    while len(out) > target_bytes and (new_h > 1 or new_w > 1):
        new_h, new_w = max(1, new_h - 1), max(1, new_w - 1)
        out = encode(resize_nearest(img, new_h, new_w))
    return out


def resize_pixels_to_budget(img: np.ndarray, target_bytes: int, encode_fn) -> bytes:
    """Codec-agnostic ``resize_to_budget``: downscale (never upscale)
    a decoded pixel array until ``encode_fn``'s output fits
    ``target_bytes`` — the pixel-op half of the resize kernel when the
    codec is injected (``operators/multimodal.MediaCodec``) and the
    exact netpbm byte model doesn't apply. First guess from the
    uncompressed-raster model, then deterministic multiplicative
    shrink (x0.9, floor, -1 near the bottom) until the encoding fits;
    terminates at 1x1. Compressed codecs (JPEG et al.) shrink
    monotonically enough in practice for the loop to land within a few
    probes; the result is deterministic for a deterministic codec."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    scale = min(1.0, (max(target_bytes, 1) / (h * w * c)) ** 0.5)
    new_h, new_w = max(1, int(h * scale)), max(1, int(w * scale))
    out = encode_fn(resize_nearest(img, new_h, new_w))
    while len(out) > target_bytes and (new_h > 1 or new_w > 1):
        new_h = max(1, int(new_h * 0.9) if new_h > 10 else new_h - 1)
        new_w = max(1, int(new_w * 0.9) if new_w > 10 else new_w - 1)
        out = encode_fn(resize_nearest(img, new_h, new_w))
    return out


def luminance_histogram(img: np.ndarray, dim: int) -> list[float]:
    """``dim``-bin normalized luminance histogram of a decoded (h, w,
    1|3) uint8 array — the pixel-op half of ``histogram_features``,
    factored out so injected codecs (``MediaCodec``) share it."""
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 3:
        # integer Rec.601 luma (deterministic, no float rounding drift)
        lum = (
            299 * img[:, :, 0].astype(np.int64)
            + 587 * img[:, :, 1].astype(np.int64)
            + 114 * img[:, :, 2].astype(np.int64)
        ) // 1000
    else:
        lum = img[:, :, 0].astype(np.int64)
    counts = np.bincount((lum.ravel() * dim) // 256, minlength=dim)[:dim]
    return (counts / lum.size).tolist()


def histogram_features(raw: bytes, dim: int) -> list[float]:
    """Decode and return the ``dim``-bin normalized luminance
    histogram — a real, deterministic image feature vector."""
    return luminance_histogram(decode(raw), dim)
