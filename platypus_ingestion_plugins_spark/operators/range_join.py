"""Range (interval) join: match rows whose point falls in an interval.

Spark has no dedicated range-join operator; a naive
``point BETWEEN lo AND hi`` join plans as BroadcastNestedLoopJoin
(fine when one side broadcasts) or a cartesian product (fatal at
scale). The scalable composition is bucketed blocking: quantize both
sides to fixed-width buckets, equi-join on the bucket id — intervals
explode into every bucket they overlap — then re-check the exact
predicate. The equi-join hash-shuffles on the bucket key, so the
cartesian never materializes; cost is O(points + interval-width/bucket
x intervals + matches).

Bucket width tunes the tradeoff: narrow buckets mean more interval
replication, wide buckets mean more false candidates re-checked.
A reasonable default is the median interval width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with lo <= point < hi.

    Both inputs keep all their columns (names must not collide).
    ``how='inner'`` only; the blocked plan is an equi-join on the
    bucket id followed by the exact range filter.
    """
    if how != "inner":
        raise ValueError("range_join supports inner joins only")
    w = float(bucket_width)
    p = points.withColumn("__rb", F.floor(F.col(point_col) / w).cast("long"))
    i = intervals.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                # hi is exclusive: the bucket containing hi only matters
                # when hi is not exactly on a bucket edge, but including
                # it is harmless (exact filter re-checks)
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    return (
        p.join(i, "__rb")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__rb")
    )
