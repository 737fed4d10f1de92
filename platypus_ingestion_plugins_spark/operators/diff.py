"""Dataset diff: what changed between two corpus versions.

Training-data releases need an audit of exactly what moved between
version N and N+1 — docs added, docs removed, docs whose content
changed — before anyone retrains on the new cut (the data-side
analogue of a code diff; the reference's commit log answers this for
the serving table, this answers it for arbitrary keyed tables).

Shape: ONE full-outer hash join on the key, comparing a content hash
(sha2 over the canonicalized compared columns) computed map-side on
each side — the join carries (key, hash) only, never the payloads, so
the shuffle is two fixed-width columns regardless of row width. At
100 TB both sides are scans + one co-partitioned join; if both tables
are bucketed on the key it is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key, change) rows for every key present in either version:
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    content hash differs). Unchanged keys are omitted — the diff is
    sized by churn, not by corpus. ``compare_cols`` defaults to every
    non-key column both sides share (schema-evolution-tolerant: a
    column only one side has would mark everything changed — declare
    it explicitly if that is the intent)."""
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - {key}
        )

    def hashed(df: DataFrame, side: str) -> DataFrame:
        h = F.sha2(
            F.to_json(F.struct(*[F.col(c) for c in compare_cols])), 256
        )
        return df.select(F.col(key), h.alias(f"__h_{side}"))

    o, n = hashed(old, "old"), hashed(new, "new")
    joined = o.join(n, key, "full_outer")
    return (
        joined.select(
            key,
            F.when(F.col("__h_old").isNull(), F.lit("added"))
            .when(F.col("__h_new").isNull(), F.lit("removed"))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
