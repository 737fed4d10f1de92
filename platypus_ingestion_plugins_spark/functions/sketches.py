"""Deterministic distinct-count sketch (minimum-statistics estimator).

Distinct counting at 100 TB needs bounded, mergeable state. Engine
HyperLogLogs (approx_count_distinct) have that but their register
layouts differ across engines, so the *estimate* can't be checked by
an external oracle. This sketch can: hash every value with m
independent salted md5 functions onto (0,1]; for n distinct values
the expected per-function minimum is 1/(n+1), so

    n_hat = m / sum_i(min_i) - 1

State is m doubles, the aggregate is m `min`s (trivially algebraic:
map-side partial mins, one merge), and md5 is bit-identical in any
engine — the estimate itself hash-matches a DuckDB oracle, not just
"is approximately right". Relative error ~1/sqrt(m); m=64 ≈ 12%,
m=256 ≈ 6%.

Duplicates never grow state, order never changes the result, and
per-partition sketches combine by elementwise min — the precompute-
per-file-then-merge pattern that makes cardinality cheap at read time.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

_HASH_SPACE = float(16**15)


def salted_unit_hash(col: Column | str, salt: int) -> Column:
    """Uniform (0,1] hash: md5 of (salt|value), head 15 hex chars."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string"))), 1, 15), 16, 10
    ).cast("double")
    return (h + F.lit(1.0)) / F.lit(_HASH_SPACE)


def distinct_sketch_mins(col: Column | str, m: int = 64) -> list[Column]:
    """The m per-function minimum aggregates (the sketch's state).
    Merge two sketches by elementwise LEAST."""
    return [F.min(salted_unit_hash(col, i)).alias(f"__kmin{i}") for i in range(m)]


def distinct_estimate(col: Column | str, m: int = 64) -> Column:
    """Aggregate expression: estimated distinct count of ``col``.

    One pass, m min-aggregates combined as m/sum(mins) - 1.
    """
    mins = [F.min(salted_unit_hash(col, i)) for i in range(m)]
    total = reduce(lambda a, b: a + b, mins)
    return F.round(F.lit(float(m)) / total - F.lit(1.0), 4)


def _salted_bucket(col: Column | str, salt: int, width: int) -> Column:
    """Deterministic bucket in [0, width): md5 long mod width."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(width))


def countmin_counters(df, col: str, depth: int = 4, width: int = 256):
    """Count-min sketch counters: ``depth`` salted hash rows of
    ``width`` buckets. State is depth*width longs — bounded no matter
    the key cardinality, and two sketches merge by elementwise ADD
    (fully algebraic: map-side partial counts, one shuffle of at most
    depth*width cells per partition). The frequency-tracking complement
    of the distinct sketch above: same md5 trick, so the counters (and
    every estimate read off them) hash-match an external oracle.
    Output: (i, b, c)."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"), _salted_bucket(col, i, width).alias("b")
                )
                for i in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.select(cells)
        .groupBy(F.col("cell.i").alias("i"), F.col("cell.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(counters, keys, col: str, depth: int = 4, width: int = 256):
    """Point-frequency estimates for ``keys`` (a DataFrame with
    ``col``): min over hash rows of the key's counter — the classic
    count-min upper bound (overestimates only, by at most the
    collision mass). The counters broadcast: depth*width cells, a few
    KB regardless of data size. Output: (col, est_count)."""
    kb = keys.select(
        F.col(col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"), _salted_bucket(col, i, width).alias("b")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(col, F.col("cell.i").alias("i"), F.col("cell.b").alias("b"))
    return (
        kb.join(F.broadcast(counters), ["i", "b"])
        .groupBy(col)
        .agg(F.min("c").alias("est_count"))
    )
