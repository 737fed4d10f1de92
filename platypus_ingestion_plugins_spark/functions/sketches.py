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
