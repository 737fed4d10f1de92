"""As-of join: for each left row, the latest right row at-or-before it.

Spark has no native ASOF JOIN. The scalable composition (no pairwise
blowup, no applyInPandas) is the union-and-window trick:

  tag left/right -> union on (key, t) -> window last_value(right
  payload) ignoring nulls ordered by (t, side) -> keep left rows.

One shuffle on the key, identical to what a native as-of would cost.
Works on any orderable time axis; an integer sequence axis sidesteps
sub-microsecond timestamp semantics entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    on: str,
    right_value_cols: list[str] | None = None,
    strict: bool = False,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row per ``key``:
    ``direction='backward'`` (default) takes the greatest right ``on``
    <= left.``on``; ``'forward'`` the smallest right ``on`` >= it
    (``strict`` excludes equality in either direction).

    Matches DuckDB/ANSI ASOF JOIN inequality semantics (inclusive by
    default). Left rows with no matching right row keep nulls (left
    join). Forward is the time-mirror of backward: the window orders
    ``on`` descending and fills from the future side.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rvals = right_value_cols or [c for c in right.columns if c not in (key, on)]
    lcols = left.columns

    l_tag = left.withColumn("__side", F.lit(1))
    # the whole right payload travels as ONE struct so the fill is
    # atomic: a legitimate NULL inside a payload column stays the
    # matched row's NULL instead of backfilling from an older right row
    r_tag = right.select(
        key,
        on,
        F.struct(
            F.col(on).alias(f"{on}{suffix}"),
            *[F.col(c).alias(c + suffix) for c in rvals],
        ).alias("__r"),
    ).withColumn("__side", F.lit(0))

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # at equal `on`: inclusive -> right sorts before left (visible);
    # strict -> right sorts after left (not visible)
    on_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(on_order, side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("__r", F.last(F.col("__r"), ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        F.col(f"__r.{on}{suffix}"),
        *[F.col(f"__r.{v + suffix}") for v in rvals],
    )
