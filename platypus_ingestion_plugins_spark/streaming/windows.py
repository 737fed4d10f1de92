"""Event-time windowed aggregation with watermark-bounded late data.

The reference's flush cadence is processing-time only (1000 rows / 5 s,
PaimonRowProcessor.java:47-48); a training-data pipeline also needs
event-time windows that tolerate out-of-order arrival without keeping
unbounded state. Structured Streaming gives both: ``withWatermark``
bounds how late a row may arrive (state for finalized windows is
dropped, and later rows are discarded), and ``window()`` aggregates
per tumbling/sliding window.

The same expressions run in batch mode (watermark is a no-op there),
so the windowed shape is oracle-checkable while the late-data
semantics are exercised through a real streaming checkpoint in tests.

Scale: windowed aggregation is one hash shuffle on (keys, window);
state size is bounded by (#keys x #open windows), independent of
stream length — the property that makes it safe on an unbounded
100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, ts_col: str, out_col: str = "event_time") -> DataFrame:
    """Attach a TimestampType event-time column from epoch seconds."""
    return df.withColumn(out_col, F.timestamp_seconds(F.col(ts_col)))


def windowed_counts(
    df: DataFrame,
    event_time_col: str = "event_time",
    window_duration: str = "10 seconds",
    slide: str | None = None,
    watermark_delay: str | None = None,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """Per-window (and optionally per-key) event counts.

    With ``watermark_delay`` on a streaming frame, rows later than
    (max event time seen - delay) are dropped and each window finalizes
    exactly once in append mode.
    """
    out = df
    if watermark_delay:
        out = out.withWatermark(event_time_col, watermark_delay)
    win: Column = (
        F.window(F.col(event_time_col), window_duration, slide)
        if slide
        else F.window(F.col(event_time_col), window_duration)
    )
    return out.groupBy(*keys, win.alias("win")).agg(F.count(F.lit(1)).alias("n_events"))


def session_counts(
    df: DataFrame,
    event_time_col: str = "event_time",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
    watermark_delay: str | None = None,
) -> DataFrame:
    """Per-session aggregates on Spark's BUILT-IN ``session_window`` —
    the preferred path when you only need session-level rollups
    (count/min/max/sum per session): all merge state lives JVM-side in
    the streaming state store, with none of the Python-worker round
    trips or per-key pandas state of ``sessionize_stream``. Two events
    share a session iff they are on the same keys and at most ``gap``
    apart — an event exactly ``gap`` after the previous one still
    MERGES (verified empirically; only a strictly larger silence opens
    a new session), and the reported window is [first, last+gap). Use
    ``sessionize_stream`` (streaming, row-level output) or the batch
    lag/cumsum ``sessionize`` only when every EVENT must carry its
    session id, e.g. to join session labels back onto the rows.

    Works identically in batch (oracle-checkable) and streaming; with
    ``watermark_delay`` set on a stream, sessions finalize in append
    mode once the watermark passes their close. One shuffle on
    (keys, merged window); state bounded by open sessions per key.
    Output: keys + ``session`` struct<start,end> + ``n_events``."""
    out = df
    if watermark_delay:
        out = out.withWatermark(event_time_col, watermark_delay)
    return out.groupBy(
        *keys, F.session_window(F.col(event_time_col), gap).alias("session")
    ).agg(F.count(F.lit(1)).alias("n_events"))
