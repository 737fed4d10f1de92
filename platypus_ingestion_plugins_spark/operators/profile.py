"""Corpus datasheet profiling — the dataset-card numbers every
release pipeline publishes (docs, tokens, length percentiles,
duplication) per source/language slice, as ONE aggregation pass.

100 TB shape: a single ``groupBy(by)`` whose aggregates are all
partial-aggregatable (counts, sums) or sort-based-per-group (exact
``percentile``); the distinct-text count shuffles fixed-width sha2
keys, not documents. Output is group-bounded (one row per slice).
At extreme scale swap ``percentile`` for ``approx_percentile`` and
``count_distinct`` for ``approx_count_distinct`` — the exact forms
are kept default because they are oracle-checkable and the group
cardinality, not the corpus, bounds the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.functions.text import token_count

_M_DISTINCT = 64  # KMV width of the streaming distinct-text state


def corpus_profile(
    df: DataFrame,
    text_col: str,
    by: str | None = None,
) -> DataFrame:
    """Per-slice corpus statistics: (by?, n_docs, n_tokens, n_chars,
    chars_p50, chars_p90, chars_p99, n_distinct_texts, dup_ratio).

    ``dup_ratio`` is the fraction of documents whose text is an exact
    copy of another in the same slice — the number a release
    datasheet quotes next to its dedup method. Percentiles are the
    exact interpolated form (matches DuckDB ``quantile_cont``);
    floats round to 6 dp so slices compare stably across engines.
    NULL text profiles as length 0 (the document exists; its text is
    empty for measurement purposes)."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    keys = [by] if by is not None else []
    base = df.select(
        *keys,
        F.length(c).alias("__len"),
        token_count(c).alias("__tok"),
        F.sha2(c, 256).alias("__sha"),
    )
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tok").alias("n_tokens"),
        F.sum("__len").alias("n_chars"),
        F.round(F.expr("percentile(__len, 0.5)"), 6).alias("chars_p50"),
        F.round(F.expr("percentile(__len, 0.9)"), 6).alias("chars_p90"),
        F.round(F.expr("percentile(__len, 0.99)"), 6).alias("chars_p99"),
        F.count_distinct("__sha").alias("n_distinct_texts"),
    )
    return agg.withColumn(
        "dup_ratio",
        F.round(
            (F.col("n_docs") - F.col("n_distinct_texts"))
            / F.col("n_docs").cast("double"),
            6,
        ),
    )


def key_skew_report(
    df: DataFrame,
    key: str,
    percentiles: tuple[float, ...] = (0.5, 0.99),
) -> DataFrame:
    """Key-distribution diagnostic for shuffle planning: before a
    100 TB join/groupBy on ``key``, this one-row report says whether
    the key needs salting (``salted_join_agg``), AQE skew handling,
    or nothing — max count, the heaviest key and its row share,
    per-key count percentiles, and the Gini coefficient of the key
    distribution (0 = uniform, → 1 = one key owns everything).

    Scale shape: ONE partial-aggregatable groupBy builds the per-key
    counts; everything downstream runs on the (count value,
    n_keys-with-that-count) FREQUENCY table, which is bounded by the
    number of DISTINCT count values, not keys — so the rank window
    the Gini needs is over a tiny frame (a billion keys collapse to
    at most thousands of distinct counts), never a single-reducer
    pass over the keys. Rank-block arithmetic is exact: a block of
    ``nk`` tied keys starting after ``s`` others contributes
    ``cnt · (nk·s + nk(nk+1)/2)`` to the Gini numerator — identical
    to any tie order, so the statistic is deterministic. Percentiles
    use Spark's frequency-weighted ``percentile`` over the same tiny
    table. NULL keys group as one key (groupBy semantics on both
    engines). The heaviest key reports via a (cnt desc, key)
    TakeOrdered and is cast to string for a stable schema."""
    from pyspark.sql.window import Window

    counts = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    freq = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("nk"))
    blocks = freq.withColumn(
        "cum", F.sum("nk").over(Window.orderBy("cnt"))
    )
    pct_arr = ", ".join(repr(float(p)) for p in percentiles)
    stats = blocks.agg(
        F.sum(F.col("cnt") * F.col("nk")).alias("n_rows"),
        F.sum("nk").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
        F.sum(
            (
                F.col("cnt")
                * (
                    (F.col("cum") - F.col("nk")) * F.col("nk")
                    + F.expr("(nk * (nk + 1)) div 2")
                )
            ).cast("decimal(38,0)")
        ).alias("srn"),
        F.expr(f"percentile(cnt, array({pct_arr}), nk)").alias("pcts"),
    )
    top = (
        counts.orderBy(F.desc("cnt"), F.col("k"))
        .limit(1)
        .select(F.col("k").cast("string").alias("top_key"))
    )
    out = stats.crossJoin(F.broadcast(top)).select(
        "n_rows",
        "n_keys",
        "max_cnt",
        "top_key",
        F.round(F.col("max_cnt") / F.col("n_rows"), 6).alias("top_pct"),
        *[
            F.round(F.element_at("pcts", i + 1), 6).alias(
                f"p{float(p) * 100:g}_cnt".replace(".", "_")
            )
            for i, p in enumerate(percentiles)
        ],
        F.round(
            (
                F.lit(2) * F.col("srn").cast("double")
                - (F.col("n_keys") + F.lit(1)).cast("double")
                * F.col("n_rows").cast("double")
            )
            / (
                F.col("n_keys").cast("double")
                * F.col("n_rows").cast("double")
            ),
            6,
        ).alias("gini"),
    )
    return out


def profile_merge_into(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    by: str,
    path: str,
    k: int = 512,
    batch_id: int | None = None,
) -> None:
    """``foreachBatch`` body maintaining a LIVE corpus datasheet on an
    ingest stream — the streaming twin of ``corpus_profile``, built
    from three mergeable states under the shared epoch-pinned
    crash-safe sketch commit (``_merge_sketch_into`` — at-least-once
    replay folds to exactly-once):

    - ``{path}/counts``: per-slice (n_docs, n_tokens, n_chars) — sums
      are algebraic, so the accumulated row EQUALS the batch numbers
      over everything ingested (exact);
    - ``{path}/sample``: per-slice bottom-``k`` hash sample of
      lengths (membership depends only on each row's own hash, so the
      merged sample equals the one-shot bottom-k) — quantile
      ESTIMATES, error ~1/sqrt(k);
    - ``{path}/distinct``: per-slice KMV min-state (elementwise-LEAST
      merge law) — distinct-text/dup-ratio ESTIMATES.

    Counts stay exact forever; the two non-algebraic datasheet
    numbers degrade gracefully to deterministic, oracle-reproducible
    estimates — the honest trade for bounded state on an unbounded
    stream. Read with ``profile_read`` (NULL slice keys accumulate
    and read back like any other — the read joins null-safely).
    """
    from platypus_ingestion_plugins_spark.functions.sampling import (
        unit_hash,
    )
    from platypus_ingestion_plugins_spark.functions.sketches import (
        _merge_sketch_into,
        bottomk_sample_merge,
        distinct_sketch_mins,
    )

    c = F.coalesce(F.col(text_col), F.lit(""))

    def merge_counts(b, prev):
        new = (
            b.select(F.col(by), F.length(c).alias("__l"),
                     token_count(c).alias("__t"))
            .groupBy(by)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("__t").alias("n_tokens"),
                F.sum("__l").alias("n_chars"),
            )
        )
        if prev is None:
            return new
        return (
            prev.unionByName(new)
            .groupBy(by)
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.sum("n_chars").alias("n_chars"),
            )
        )

    def merge_sample(b, prev):
        new = b.select(
            F.col(by),
            unit_hash(id_col, "profile").alias("u"),
            F.length(c).alias("v"),
        )
        return bottomk_sample_merge(new, prev, k, group_cols=(by,))

    def merge_distinct(b, prev):
        new = (
            b.select(F.col(by), F.sha2(c, 256).alias("__sha"))
            .groupBy(by)
            .agg(*distinct_sketch_mins("__sha", _M_DISTINCT))
        )
        if prev is None:
            return new
        return (
            prev.unionByName(new)
            .groupBy(by)
            .agg(
                *[
                    F.min(f"__kmin{i}").alias(f"__kmin{i}")
                    for i in range(_M_DISTINCT)
                ]
            )
        )

    from ..concurrency import overlap_jobs

    # ONE physical scan of the batch feeds all three state merges —
    # without the persist each _merge_sketch_into re-reads the
    # micro-batch source (3x I/O per epoch on the ingest path).
    # The three merges maintain DISJOINT state directories, so their
    # jobs overlap from driver threads (guide §2.6) instead of paying
    # three end-to-end read-merge-write-swap latencies per epoch; the
    # persist's block-level get-or-compute lock makes whichever thread
    # touches a batch partition first compute it and the others reuse.
    batch.persist()
    try:
        overlap_jobs(
            lambda: _merge_sketch_into(
                batch, f"{path}/counts", merge_counts, batch_id
            ),
            lambda: _merge_sketch_into(
                batch, f"{path}/sample", merge_sample, batch_id
            ),
            lambda: _merge_sketch_into(
                batch, f"{path}/distinct", merge_distinct, batch_id
            ),
        )
    finally:
        batch.unpersist()


def profile_read(
    spark,
    path: str,
    by: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """The always-current datasheet from the accumulated profile
    state: per-slice exact (n_docs, n_tokens, n_chars), quantile
    estimates from the bottom-k length sample (exact interpolated
    percentile over the sample, 6-dp rounded; columns named
    ``chars_pN`` with N = the percentile — chars_p50/chars_p90/...,
    matching the batch twin ``corpus_profile``), and the KMV
    distinct-text estimate + dup-ratio estimate (4-dp, the
    ``distinct_estimate`` convention). The three states join
    NULL-SAFELY on the slice key, so a NULL slice (accumulated like
    any other by the merges) survives to the output."""
    from platypus_ingestion_plugins_spark.functions.sketches import (
        kmin_state_estimate,
        sketch_read,
    )

    counts = sketch_read(spark, f"{path}/counts")
    sample = sketch_read(spark, f"{path}/sample")
    distinct = sketch_read(spark, f"{path}/distinct")
    qs = sample.groupBy(by).agg(
        *[
            F.round(F.expr(f"percentile(v, {p!r})"), 6).alias(
                f"chars_p{int(round(p * 100)):d}"
            )
            for p in probs
        ]
    ).withColumnRenamed(by, "__by_q")
    dd = distinct.select(
        F.col(by).alias("__by_d"),
        kmin_state_estimate(_M_DISTINCT).alias("est_distinct_texts"),
    )
    out = (
        counts.join(qs, F.col(by).eqNullSafe(F.col("__by_q")))
        .drop("__by_q")
        .join(dd, F.col(by).eqNullSafe(F.col("__by_d")))
        .drop("__by_d")
    )
    return out.withColumn(
        "est_dup_ratio",
        F.round(
            F.greatest(
                (F.col("n_docs") - F.col("est_distinct_texts"))
                / F.col("n_docs").cast("double"),
                F.lit(0.0),
            ),
            4,
        ),
    )
