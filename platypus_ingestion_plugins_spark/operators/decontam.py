"""Benchmark decontamination: flag (or drop) training documents that
share token n-grams with a held-out evaluation corpus.

The standard LLM training-data hygiene step (GPT-3 appendix C /
PaLM-style n-gram overlap): any training document containing an
n-gram that also appears in an eval/benchmark document is
contaminated — keeping it inflates eval scores.

Scale design: the benchmark side is SMALL by definition (eval sets
are MBs against a 100 TB corpus), so its distinct gram set is
broadcast and the training side stays a map-side hash-join — the
only shuffle is the final per-doc count aggregation, whose input is
already collapsed to (doc_id, gram-hit) rows. Gram construction
reuses ``dedup.shingles`` (zipped token-array slices — codegen, no
per-gram re-tokenization). If the benchmark gram set ever outgrows
the broadcast threshold, Spark falls back to a shuffle join on the
gram string; pre-hash grams to fixed width first if that happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.operators.dedup import shingles


def benchmark_grams(
    bench: DataFrame, text_col: str, id_col: str, n: int = 13
) -> DataFrame:
    """The distinct token n-gram set of the benchmark corpus —
    computed once, reused across training shards."""
    return shingles(bench, text_col, id_col, n).select("shingle").distinct()


def contaminated_docs(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
) -> DataFrame:
    """Training documents sharing >= 1 token n-gram with the benchmark
    corpus, with the count of distinct contaminated grams — the audit
    view (what would be dropped, and how contaminated it is).

    ``n`` is the precision lever: real decontamination runs use 8-13
    token grams (a 13-gram collision is essentially never chance);
    lower n only for short-document or high-paraphrase corpora.
    Output: (id, n_contaminated), contaminated docs only.

    Inherits ``shingles``' precondition: ``id_col`` unique per row in
    ``train`` — duplicate ids double their rows' contaminated-gram
    counts (and the flags consumers derive from them)."""
    bg = F.broadcast(benchmark_grams(bench, text_col, id_col, n))
    tg = shingles(train, text_col, id_col, n)  # distinct per doc already
    return (
        tg.join(bg, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )


def contaminated_docs_bloom(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
    num_bits: int = 1 << 15,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter variant of ``contaminated_docs`` for when even the
    benchmark gram set outgrows a comfortable broadcast (many stacked
    eval suites): the gram set collapses to ``num_bits`` BITS
    (functions/sketches.bloom_build) and the training side probes a
    pure codegen expression — no join at all on the 100 TB side, the
    cheapest possible contamination pre-screen. Bloom guarantees NO
    false negatives (nothing contaminated slips through), at a
    tunable false-positive overcount; run the exact
    ``contaminated_docs`` on the (tiny) flagged subset when the FP
    rate matters. Output: (id, n_flagged_grams), flagged docs only —
    deterministic including the FP set, so oracle-checkable."""
    from platypus_ingestion_plugins_spark.functions.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )

    words = bloom_build(
        benchmark_grams(bench, text_col, id_col, n), "shingle",
        num_bits, num_hashes,
    )
    tg = shingles(train, text_col, id_col, n)
    return (
        tg.filter(
            bloom_maybe_contains(F.col("shingle"), words, num_bits, num_hashes)
        )
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_flagged_grams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 13,
) -> DataFrame:
    """The clean training corpus: ``train`` minus every contaminated
    document (left-anti join against the flagged set on the id).
    Returns the full training rows, untouched columns."""
    flagged = contaminated_docs(train, bench, text_col, id_col, n).select(id_col)
    return train.join(flagged, id_col, "left_anti")


def contaminated_embeddings(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str | None = None,
    bits: int = 8,
    bands: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination: corpus rows whose vector is
    cosine-similar (>= ``threshold``) to ANY benchmark vector —
    catches the paraphrase/translation contamination that n-gram
    overlap (``contaminated_docs``) structurally misses.

    Scale shape mirrors the n-gram path: the benchmark side is tiny
    (eval suites) and rides a BROADCAST, so the corpus stays map-side.
    With ``bits>0`` (default) both sides explode into banded sign-LSH
    keys (similarity.signbit_band_keys — the same blocking as
    ``similarity.neardup_pairs``) and only band-key matches pay the
    exact cosine: per corpus row the work is O(matching bench rows),
    not O(|bench|). Multi-band duplicate candidates are NOT pre-deduped
    (the extra dots are bounded by ``bands`` and the pairs are already
    map-side local); the final ``count_distinct`` collapses them.
    ``bits=0`` is the exact-recall variant — a broadcast nested-loop
    over the full bench set; affordable whenever
    |corpus| x |bench| dot products is, and the right default when a
    missed contamination costs more than the scan (recall of the
    banded screen at a 0.9 threshold with 8x8 is ~0.94 — document the
    miss rate, don't discover it in an eval).

    The ONLY shuffle either way is the final per-doc aggregation,
    whose input is already collapsed to contaminated hits.

    Output: (``id_col``, n_contaminated, max_cos) — contaminated
    corpus rows only; the audit view. Anti-join the ids to drop them.

    Mismatched vector widths (wrong model / wrong column) FAIL the job
    with a raise_error on the first candidate pair instead of silently
    returning zero contamination (r11 review #6). The guard evaluates
    per candidate, so a banded run where NO band key collides between
    the mismatched sets can still come back empty — with ``bits=8``
    over real data that needs every one of bands x 2^bits key spaces
    to miss, but use ``bits=0`` when auditing a suspect pairing.
    """
    from platypus_ingestion_plugins_spark.operators.similarity import (
        _dvec,
        norm,
        signbit_band_keys,
    )
    from platypus_ingestion_plugins_spark.session import ensure_parallelism

    bid = bench_id_col or id_col
    b = bench.select(
        F.col(bid).alias("__bid"),
        _dvec(F.col(vec_col)).alias("__bv"),
        norm(F.col(vec_col), dim).alias("__bn"),
    )
    # the corpus side carries ALL the O(|corpus| x |bench|) cosine work
    # (the bench side broadcasts) — spread a few-split source across
    # cores first, same convention as the module's map-heavy siblings
    # (brute_force_topk, ivf_assign, semdedup)
    c = ensure_parallelism(corpus).select(
        F.col(id_col),
        _dvec(F.col(vec_col)).alias("__cv"),
        norm(F.col(vec_col), dim).alias("__cn"),
    )
    if bits:
        bk = b.withColumn(
            "__bk", F.explode(signbit_band_keys(F.col("__bv"), bits, bands))
        )
        ck = c.withColumn(
            "__bk", F.explode(signbit_band_keys(F.col("__cv"), bits, bands))
        )
        cand = ck.join(F.broadcast(bk), "__bk")
    else:
        cand = c.crossJoin(F.broadcast(b))
    # per-pair dot via the higher-order aggregate, NOT a dim-unrolled
    # chain: unrolled 64-term expressions on a join path blow codegen
    # limits (measured in neardup_pairs); dim only unrolls the norms
    dot_expr = F.aggregate(
        F.zip_with(F.col("__cv"), F.col("__bv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # LOUD dimension guard (r11 review #6): mismatched corpus/bench
    # vector widths (wrong model, wrong column) make zip_with pad with
    # nulls, the dot goes null, every pair filters out, and the screen
    # returns "no contamination found" — the most dangerous silent
    # failure a decontamination step can have. Fail the job instead:
    # the guard wraps the dot expression ITSELF (a dropped side-column
    # would be pruned away by Catalyst and never evaluate). Rows with
    # a NULL vector on either side keep the null dot (no signal is not
    # an error); only a genuine width conflict trips.
    dim_ok = (
        F.col("__cv").isNull()
        | F.col("__bv").isNull()
        | (F.size(F.col("__cv")) == F.size(F.col("__bv")))
    )
    dot_expr = F.when(dim_ok, dot_expr).otherwise(
        F.raise_error(
            F.concat(
                F.lit("contaminated_embeddings: corpus vector dim "),
                F.size(F.col("__cv")).cast("string"),
                F.lit(" != bench vector dim "),
                F.size(F.col("__bv")).cast("string"),
                F.lit(" — comparing embeddings from different models/"
                      "columns would silently report zero contamination"),
            )
        ).cast("double")
    )
    hits = cand.select(
        F.col(id_col),
        F.col("__bid"),
        F.round(dot_expr / (F.col("__cn") * F.col("__bn")), 6).alias("__cos"),
    ).filter(F.col("__cos") >= threshold)
    return hits.groupBy(id_col).agg(
        F.count_distinct("__bid").alias("n_contaminated"),
        F.max("__cos").alias("max_cos"),
    )
