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
