"""Deterministic sampling and dataset splitting.

`df.sample()` is seed-dependent per partition layout — the same call
over the same data returns DIFFERENT rows after a repartition or an
engine change, which is poison for reproducible training sets. These
operators key every decision off a content hash (same md5→unit trick
as functions/sketches.py), so:

- membership is a pure function of the row's key — stable across
  engines, partitionings, retries, and re-runs (an external oracle
  reproduces the exact row set, not just the expected size);
- sampling composes with incremental data: yesterday's rows keep
  yesterday's decisions when new rows arrive;
- everything is a codegen-able filter/projection — no RNG state, no
  shuffle, pushes through column pruning like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(16**15)


def cap_per_group(
    df,
    id_col: str,
    group_col: str,
    k: int,
    salt: str = "cap",
):
    """Deterministic fixed-COUNT cap per group: keep each group's k
    smallest-hash rows — the heavy-tail guard a pretraining mix needs
    when one domain/source dwarfs the rest (temperature_mix reweights
    by RATE; this bounds absolute count). Hash-order membership makes
    the kept set a uniform sample of the group that is stable across
    reruns, partitionings, and engine (same md5 trick as hash_split),
    and INCREMENTALLY stable: a group already at its cap only swaps a
    row out when a new row hashes below one of the kept k, never
    reshuffles wholesale. One window shuffle on the group; per-group
    state is the rank counter. Groups under k keep every row."""
    from pyspark.sql.window import Window

    u = unit_hash(id_col, salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def unit_hash(col: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) hash of a key column (md5, engine-independent).
    Distinct ``salt`` values give independent hash functions — use a
    different salt per decision so sampling and splitting don't
    correlate."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(_HASH_SPACE)
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction``. Exactly
    reproducible; approximately ``fraction`` of distinct keys (exact
    membership, binomial size)."""
    return df.filter(unit_hash(key, salt) < fraction)


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps
    ``fractions[s]`` of its rows (unlisted strata keep
    ``default_fraction``). The per-row threshold is a CASE projection;
    the whole operator is one codegen filter."""
    thr = F.lit(default_fraction)
    for s, f in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(f)).otherwise(thr)
    return df.filter(unit_hash(key, salt) < thr)


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], salt: str = "split"
) -> DataFrame:
    """Assign every row a split label (train/val/test/...) by hash
    thresholds proportional to ``weights``. Deterministic, disjoint,
    exhaustive; a key always lands in the same split — across runs,
    engines, and data growth. Adds a ``split`` column."""
    total = sum(weights.values())
    h = unit_hash(key, salt)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = h < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def temperature_mix(
    df: DataFrame,
    key: str,
    strata_col: str,
    alpha: float = 0.5,
    total_fraction: float = 0.3,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-pretraining
    resampling scheme, e.g. XLM-R): stratum ``s`` with ``n_s`` rows
    receives sample share ``q_s = n_s^alpha / sum_t n_t^alpha`` —
    ``alpha < 1`` up-weights small domains against head domains — and
    an expected total of ``total_fraction`` of the corpus. The per-row
    keep rate ``min(1, f*N*q_s/n_s)`` is computed from one per-stratum
    count aggregate (broadcast back — strata counts are tiny), and
    membership is the deterministic ``unit_hash`` decision, so the
    exact sampled row set is reproducible by an external engine.

    Rows keep their columns; strata missing from ``df`` can't occur by
    construction (rates derive from the same frame). A NULL stratum is
    a stratum like any other — the rate join is null-safe, so
    null-stratum rows are sampled at their group's rate instead of
    being silently dropped by an equi-join."""
    from pyspark.sql.window import Window

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # corpus totals via an unpartitioned window over the strata-count
    # frame — bounded by the stratum count, and avoids the ambiguous
    # self-join a counts.agg + crossJoin would create
    w = Window.partitionBy()
    big_n = F.sum("__n").over(w)
    z = F.sum(F.pow("__n", F.lit(alpha))).over(w)
    rates = counts.select(
        F.col(strata_col).alias("__stratum"),
        F.least(
            F.lit(1.0),
            F.lit(total_fraction)
            * big_n
            * F.pow("__n", F.lit(alpha))
            / (z * F.col("__n")),
        ).alias("__rate"),
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(strata_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(unit_hash(key, salt) < F.col("__rate"))
        .drop("__stratum", "__rate")
    )
