"""Skew-aware join: salting for hot keys.

AQE's runtime skew-join split (enabled in session.py) handles
moderately skewed SHUFFLE partitions, but a single pathological key —
the empty-string user id, the null-ish default, the one viral document
— still lands every matching row in one task because AQE can only
split a partition, not a key. Salting is the explicit fix: replicate
the small side R times and scatter the big side's hot keys across R
sub-keys, so one hot key becomes R tasks.

Only HOT keys are salted (everything else joins 1:1 on salt 0), so the
small-side replication cost is |hot ∩ small| * (R - 1) rows, not
|small| * R. The hot-key set comes from a sampled frequency count —
at 100 TB a 1% sample finds every key that matters at a 10^-6 of the
scan cost — and is broadcast to both sides.

Semantically an inner/left equi-join: results are row-for-row equal to
the unsalted join (the oracle checks exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(
    df: DataFrame,
    key: str,
    threshold: int,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Keys whose (estimated) row count exceeds ``threshold``.

    With ``sample_fraction`` the count runs on a Bernoulli sample and
    is scaled back up — the hot set is by definition huge per key, so
    sampling finds it reliably while reading a fraction of the input.
    Deterministic seed keeps plans reproducible.
    """
    src = df.sample(fraction=sample_fraction, seed=7) if sample_fraction else df
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    return (
        src.groupBy(key)
        .agg((F.count(F.lit(1)) * F.lit(scale)).alias("__est"))
        .filter(F.col("__est") > threshold)
        .select(key)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 8,
    hot: DataFrame | None = None,
    hot_threshold: int = 100_000,
    sample_fraction: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key``, salting hot keys.

    - big side: hot rows get a deterministic salt in [0, salts): a
      content hash of the full row (stable across task retries, no
      RNG; identical duplicate rows share a salt, which only costs
      balance, never correctness). Cold rows get salt 0. Because the
      hash covers every column of ``big``, project the frame down to
      the columns you need BEFORE the join or column pruning is lost.
    - small side: hot rows are replicated ``salts`` times (posexplode),
      cold rows carry salt 0 only.

    Output columns = big's columns plus small's non-key columns,
    exactly as ``big.join(small, key, how)``.

    Only ``inner`` and ``left`` are semantics-preserving: with a right
    or full outer join, an unmatched hot small-side key is replicated
    across all ``salts`` sub-keys and would emit ``salts`` duplicate
    null-padded rows instead of one.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join preserves semantics only for how in ('inner', 'left'); got {how!r}"
        )
    if hot is None:
        hot = hot_keys(big, key, hot_threshold, sample_fraction)
    hot_marked = F.broadcast(hot.select(F.col(key).alias("__hk")).distinct())

    # big side: stable per-row salt from a content hash (shuffle-safe,
    # no RNG — retried tasks produce identical salts)
    b = (
        big.join(hot_marked, big[key] == F.col("__hk"), "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hk").isNotNull(),
                F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hk")
    )
    s = (
        small.join(hot_marked, small[key] == F.col("__hk"), "left")
        .select(
            "*",
            F.explode(
                F.when(
                    F.col("__hk").isNotNull(),
                    F.sequence(F.lit(0), F.lit(salts - 1)),
                ).otherwise(F.array(F.lit(0)))
            ).alias("__salt"),
        )
        .drop("__hk")
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
