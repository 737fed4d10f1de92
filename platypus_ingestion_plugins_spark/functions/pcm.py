"""Pure-numpy PCM (WAV-less raw s16le) audio codec.

The container ships no audio libraries, but raw 16-bit little-endian
PCM — the payload inside every WAV file and the interchange format of
`ffmpeg -f s16le` — decodes with numpy alone, which makes it the REAL
(non-stub) codec path for the audio half of the multimodal kernels,
exactly as `functions/netpbm.py` is for images: a byte-exact,
dependency-free decode -> sample-op -> re-encode chain. General
containers (mp3/ogg/flac) still need external codecs; swapping them in
replaces these calls inside the kernels, nothing else.

Everything is integer/deterministic (floor-index resampling, integer
sums), so outputs are byte-checkable in tests and reproducible by an
external SQL engine on the same bytes.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"PCM1"
# header: magic + u32le sample_rate + u16le channels, then s16le
# interleaved samples. A minimal framing (the WAV 'fmt ' facts without
# RIFF bookkeeping) so payloads are self-describing in tests; decode()
# also accepts headerless raw s16le when rate/channels are passed.
_HEADER_LEN = len(_MAGIC) + 4 + 2


def encode(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """Encode an int16 sample array (n,) or (n, channels) as framed
    s16le bytes — canonical minimal header, so equal sample arrays
    encode to equal bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] != channels:
        raise ValueError(f"expected (n,) or (n, {channels}), got {arr.shape}")
    if not 0 < rate < 1 << 32:
        raise ValueError(f"bad sample rate {rate}")
    header = (
        _MAGIC
        + int(rate).to_bytes(4, "little")
        + int(channels).to_bytes(2, "little")
    )
    return header + arr.tobytes()


def decode(
    raw: bytes, rate: int | None = None, channels: int | None = None
) -> tuple[np.ndarray, int, int]:
    """Decode framed (or headerless raw s16le, when rate/channels are
    given) PCM to ((n, channels) int16 array, rate, channels). Raises
    ValueError on truncated or misaligned payloads."""
    if raw[: len(_MAGIC)] == _MAGIC:
        if len(raw) < _HEADER_LEN:
            raise ValueError("truncated PCM header")
        rate = int.from_bytes(raw[4:8], "little")
        channels = int.from_bytes(raw[8:10], "little")
        body = raw[_HEADER_LEN:]
    else:
        if rate is None or channels is None:
            raise ValueError(
                "headerless payload needs explicit rate and channels"
            )
        body = raw
    if channels < 1:
        raise ValueError(f"bad channel count {channels}")
    if len(body) % (2 * channels):
        raise ValueError(
            f"PCM body of {len(body)} bytes is not a whole number of "
            f"{channels}-channel s16le frames"
        )
    arr = np.frombuffer(body, dtype="<i2").reshape(-1, channels)
    return arr, rate, channels


def stats(raw: bytes) -> dict:
    """Deterministic per-clip features: n_samples (frames), duration
    in EXACT milliseconds-floor (integer arithmetic — no float
    seconds an engine could round differently), integer sum of
    squares over the first channel (the loudness sufficient
    statistic: rms = sqrt(sumsq/n) downstream), peak |amplitude|, and
    zero-crossing count (sign changes over the first channel,
    zero-valued samples carrying the previous sign — the convention
    an oracle can replay with a running non-zero-sign window)."""
    arr, rate, channels = decode(raw)
    ch = arr[:, 0].astype(np.int64)
    n = int(ch.shape[0])
    sumsq = int((ch * ch).sum())
    peak = int(np.abs(ch).max()) if n else 0
    sgn = np.sign(ch)
    nz = sgn[sgn != 0]
    crossings = int((nz[1:] != nz[:-1]).sum()) if nz.size > 1 else 0
    return {
        "n_samples": n,
        "sample_rate": rate,
        "channels": channels,
        "duration_ms": (n * 1000) // rate if rate else 0,
        "sumsq": sumsq,
        "peak": peak,
        "zero_crossings": crossings,
    }


def resample_nearest(raw: bytes, new_rate: int) -> bytes:
    """Deterministic floor-index nearest-neighbor resample to
    ``new_rate`` (the netpbm ``resize_nearest`` convention on the
    time axis): output frame i reads input frame i*in_rate//new_rate
    — pure integer index arithmetic, no interpolation, so the exact
    output samples are engine-reproducible."""
    arr, rate, channels = decode(raw)
    if not 0 < new_rate < 1 << 32:
        raise ValueError(f"bad target rate {new_rate}")
    n = arr.shape[0]
    m = (n * new_rate) // rate
    idx = (np.arange(m) * rate) // new_rate
    return encode(arr[idx], new_rate, channels)
