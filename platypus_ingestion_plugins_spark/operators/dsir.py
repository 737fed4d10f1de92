"""Data Selection via Importance Resampling (DSIR).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling", arXiv:2302.03169): pick pretraining documents from a raw
web corpus that LOOK LIKE a small target corpus (Wikipedia, books, a
downstream task's text) by importance weights under two hashed-n-gram
bag-of-words models:

  1. featurize every document as counts over ``buckets`` hashed
     unigram+bigram buckets (the feature-hashing trick — no
     vocabulary, fixed model size regardless of corpus size);
  2. fit bucket distributions p (target) and q (raw) with add-k
     smoothing;
  3. weight each raw document ``log w = sum_b c_b (ln p_b - ln q_b)``
     — the bag-of-n-grams log-likelihood ratio;
  4. resample without replacement via Gumbel top-n on
     ``log w + g_i`` (the paper's sampling step; ``gumbel=False``
     degrades to deterministic top-n by weight).

100 TB shape — nothing here depends on corpus size:
- the two model fits are ONE ``groupBy(bucket)`` count each,
  partial-aggregatable (zipf-hot buckets collapse map-side), output
  bounded at ``buckets`` rows;
- the bucket log-ratio table (<= ``buckets`` rows, both fits joined
  OUTER so a bucket seen on one side only still scores — smoothing
  gives the missing side its floor mass) is BROADCAST to the scoring
  join: the corpus-sized pass is map-only + one per-doc partial agg;
- Gumbel noise is the deterministic ``unit_hash`` of the id — scores
  are a pure function of (corpus, target, salt), reproducible across
  engines/partitionings/reruns, so an external SQL oracle replays the
  exact selected set;
- top-n compiles to TakeOrderedAndProject (per-partition top-n, no
  global sort); n is a sample size, driver-modest by definition.

Reference parity: the reference (an ingestion shim) has no selection
operators; this extends the repo's pretraining-mix family
(``temperature_mix``, ``select_token_budget``) with the
distribution-matching selector those two can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.functions.sampling import unit_hash
from platypus_ingestion_plugins_spark.functions.text import tokens
from platypus_ingestion_plugins_spark.session import ensure_parallelism


def _gram_buckets(text_col: str, buckets: int):
    """array<long> of hashed unigram+bigram buckets for a document —
    the engine-independent md5-half bucket convention
    (``hashed_bow_embeddings``), so an external SQL engine reproduces
    every feature id. Bigrams are space-joined adjacent token pairs;
    ``zip_with`` against the 1-shifted slice pads the last pair with
    NULL, whose null-propagating ``concat`` is NULL and is filtered
    (no phantom gram)."""
    t = tokens(text_col)
    n = F.size(t)
    bi = F.filter(
        F.zip_with(
            t,
            F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    grams = F.concat(t, bi)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
            F.lit(buckets),
        ),
    )


def _bucket_counts(df: DataFrame, text_col: str, buckets: int) -> DataFrame:
    """(bucket, cnt) hashed-gram histogram of a corpus — bounded at
    ``buckets`` rows, partial-aggregatable."""
    return (
        df.select(
            F.explode(_gram_buckets(text_col, buckets)).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    smoothing: float = 1.0,
) -> DataFrame:
    """(id, logw): per-document importance log-weight of ``raw`` docs
    toward ``target``'s hashed-n-gram distribution. Zero-token raw
    documents produce no row (no features, no evidence — exactly the
    ``doc_logprob`` empty-doc contract). ``logw`` is raw double;
    round at the caller when comparing across engines."""
    tc = _bucket_counts(target, text_col, buckets)
    rc = _bucket_counts(ensure_parallelism(raw), text_col, buckets)
    t_tot = tc.agg(F.sum("cnt").alias("t_tot"))
    r_tot = rc.agg(F.sum("cnt").alias("r_tot"))
    s = float(smoothing)
    b = float(buckets)
    # outer-join the two histograms: a bucket present on one side only
    # still needs a ratio (the absent side contributes its smoothing
    # floor s / (tot + s*B)); buckets absent from BOTH sides never
    # appear in any document, so the table stays <= `buckets` rows.
    ratio = (
        tc.withColumnRenamed("cnt", "t_cnt")
        .join(rc.withColumnRenamed("cnt", "r_cnt"), "bucket", "outer")
        .crossJoin(t_tot)
        .crossJoin(r_tot)
        .select(
            "bucket",
            (
                F.log(F.coalesce("t_cnt", F.lit(0)) + F.lit(s))
                - F.log(F.col("t_tot") + F.lit(s * b))
                - F.log(F.coalesce("r_cnt", F.lit(0)) + F.lit(s))
                + F.log(F.col("r_tot") + F.lit(s * b))
            ).alias("logr"),
        )
    )
    exploded = ensure_parallelism(raw).select(
        F.col(id_col),
        F.explode(_gram_buckets(text_col, buckets)).alias("bucket"),
    )
    return (
        exploded.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum("logr").alias("logw"))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 8192,
    smoothing: float = 1.0,
    gumbel: bool = True,
    salt: str = "dsir",
) -> DataFrame:
    """Select ``n`` raw documents by DSIR importance resampling:
    Gumbel top-n over ``logw + g_i`` with deterministic per-id Gumbel
    noise ``g = -ln(-ln(u))``, ``u = unit_hash(id, salt)`` — the
    paper's without-replacement resampling, de-randomized the same way
    every sampler in ``functions/sampling`` is (selection is a pure
    function of the data and the salt). ``gumbel=False`` takes the
    top-n by weight alone (mode-seeking: highest-likelihood-ratio
    docs, no diversity). Output: the selected rows of ``raw`` plus
    ``logw`` (rounded to 6 places for cross-engine comparability)."""
    w = dsir_weights(raw, target, text_col, id_col, buckets, smoothing)
    if gumbel:
        u = F.greatest(unit_hash(id_col, salt), F.lit(1e-12))
        score = F.col("logw") - F.log(-F.log(u))
    else:
        score = F.col("logw")
    picked = (
        w.withColumn("__score", score)
        .orderBy(F.col("__score").desc(), F.col(id_col).asc())
        .limit(n)
        .select(id_col, F.round("logw", 6).alias("logw"))
    )
    return raw.join(picked, id_col)
