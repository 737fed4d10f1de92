"""Time-grid resampling with forward fill (last observation carried
forward) — the feature-engineering primitive that turns an irregular
event stream into the fixed-step series a training pipeline joins
against (hourly metrics, sensor grids, price marks). The reference's
serving side consumes regular time buckets the same way its hit-count
aggregations do (reference Q5 surface); this produces them from raw
events.

Scale shape: one hash aggregate collapses events to (key, bucket)
taking the LAST value per bucket (max_by on the (ts, tiebreak) pair —
deterministic under ties, so the SQL oracle reproduces it exactly);
per-key grid bounds ride the SAME aggregate output (a second, tiny
aggregate over buckets); the dense grid is a bounded
``sequence``/``explode`` (rows = time-range/step per key, independent
of event count); the forward fill is one ``last(ignorenulls)`` running
window per key ordered by bucket — state is a single value per key,
and the partition is the key, so no global sort. Three shuffles total
(bucket agg, grid join, fill window — the last two share the key
hash), no UDFs, everything WholeStageCodegen.

The grid spans each key's OWN [first, last] bucket — no fabricated
readings before a key exists or after it stops reporting; pass
``until_bucket`` to extend every key's series to a common right edge
(e.g. the batch watermark) with its last value carried forward.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_last_ffill(
    df: DataFrame,
    ts_ms: Column,
    value_col: str,
    key_cols: tuple[str, ...] = ("user_id",),
    step_ms: int = 3_600_000,
    tiebreak_col: str | None = None,
    until_bucket: int | None = None,
) -> DataFrame:
    """(keys..., bucket, value) on a dense ``step_ms`` grid per key.

    ``bucket`` = floor(epoch-ms / step_ms). Within a bucket the LAST
    event wins, ordered by (ts_ms, tiebreak_col) — supply a unique
    ``tiebreak_col`` (an event id) to make same-timestamp buckets
    deterministic. Buckets with no events inherit the previous
    bucket's value (LOCF); the first bucket of every key always has an
    observation, so no NULLs survive.
    """
    ts = ts_ms.cast("long")
    order = (
        F.struct(ts.alias("t"), F.col(tiebreak_col).alias("tb"))
        if tiebreak_col
        else F.struct(ts.alias("t"))
    )
    last_per_bucket = (
        df.groupBy(*key_cols, F.floor(ts / F.lit(step_ms)).cast("long").alias("bucket"))
        .agg(F.max_by(F.col(value_col), order).alias("__v"))
    )
    bounds = last_per_bucket.groupBy(*key_cols).agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    if until_bucket is not None:
        bounds = bounds.withColumn(
            "__b1", F.greatest("__b1", F.lit(int(until_bucket)))
        )
    grid = bounds.select(
        *key_cols, F.explode(F.sequence("__b0", "__b1")).alias("bucket")
    )
    joined = grid.join(last_per_bucket, [*key_cols, "bucket"], "left")
    fill = Window.partitionBy(*key_cols).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        *key_cols,
        "bucket",
        F.last("__v", ignorenulls=True).over(fill).alias(value_col),
    )
