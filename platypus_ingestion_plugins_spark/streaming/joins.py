"""Stream-stream interval join with watermarked state.

Joining two live streams (impressions x clicks, orders x payments)
requires buffering both sides; unbounded buffering is the scale
killer, so each side carries a watermark and the join predicate bounds
the event-time distance — Spark can then evict state older than
(watermark - bound) on both sides. State is O(rate x interval), not
O(stream).

The reference has no stream-stream join (its only correlation is the
CDC key merge); this is the standard Spark construct a training-data
pipeline needs to stitch multi-source event streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 seconds",
    watermark_delay: str = "5 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join events with the same ``key`` where right's event time lies
    in [left_ts, left_ts + max_delay].

    Both inputs must be streaming DataFrames with TimestampType
    event-time columns. The watermark + interval predicate make the
    buffered state bounded and let outer-join sides emit NULLs once
    the watermark proves no match can arrive.

    The output carries ONE ``key`` column (coalesced across sides, so
    outer-join rows keep whichever side is present) — an expression
    join otherwise leaves two identically-named key columns and every
    unqualified downstream reference throws AMBIGUOUS_REFERENCE.
    """
    l = left.withWatermark(left_ts, watermark_delay).alias("l")
    r = right.withWatermark(right_ts, watermark_delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = l.join(r, cond, how)
    return (
        joined.withColumn(
            "__key", F.coalesce(F.col(f"l.{key}"), F.col(f"r.{key}"))
        )
        .drop(F.col(f"l.{key}"))
        .drop(F.col(f"r.{key}"))
        .withColumnRenamed("__key", key)
    )
