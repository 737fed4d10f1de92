"""Corpus-trained unigram language-model quality scoring.

The CCNet-style perplexity proxy (Wenzek et al. 2020, "CCNet:
Extracting High Quality Monolingual Datasets from Web Crawl Data"):
score each document by its mean token log-probability under a unigram
distribution — documents of gibberish, boilerplate, or the wrong
language score far below fluent text. Here the LM is trained on the
corpus itself (one aggregation pass), so the operator needs no
external model file.

100 TB shape:
- training is ONE ``groupBy(token)`` count — map-side partial
  aggregation collapses each task to its distinct-token set before the
  shuffle, so the zipf-hot tokens ("the") never concentrate rows;
- the model is capped at ``vocab_size`` rows by construction
  (``orderBy(cnt).limit`` = TakeOrdered) and broadcast to the scoring
  join — the corpus-size pass is map-only;
- the per-document mean reduces map-side to ~one row per document
  before its shuffle.

Both passes and the smoothing are expressible in ANSI SQL, so the
whole pipeline is oracle-checkable (query ``unigram_logprob``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def unigram_model(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1 << 16,
) -> tuple[DataFrame, DataFrame]:
    """Train the corpus unigram LM.

    Returns ``(model, totals)``: ``model`` is at most ``vocab_size``
    rows of ``(tok, logp)`` with ``logp = ln(cnt) - ln(total)`` —
    total counted over ALL tokens, not just the kept vocabulary, so
    kept-token probabilities don't inflate when the tail is cut;
    ``totals`` is the one-row ``(total)`` frame the scorer needs for
    out-of-vocabulary smoothing. Vocabulary ties at the cut boundary
    break deterministically on the token string.
    """
    toks = docs.select(F.explode(tokens(text_col)).alias("tok"))
    freqs = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    totals = freqs.agg(F.sum("cnt").alias("total"))
    vocab = freqs.orderBy(F.col("cnt").desc(), "tok").limit(vocab_size)
    model = vocab.crossJoin(F.broadcast(totals)).select(
        "tok", (F.log("cnt") - F.log("total")).alias("logp")
    )
    return model, totals


def doc_logprob(
    docs: DataFrame,
    model: DataFrame,
    totals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean token log-probability under ``model``.

    Out-of-vocabulary tokens get the smoothed floor
    ``ln(alpha) - ln(total)`` (add-alpha against the full corpus mass).
    Documents with zero tokens produce no row — the mean is undefined.
    Returns ``(id_col, mean_logp, n_tokens)`` with ``mean_logp``
    computed as ``sum/count`` (the order-stable formulation; round it
    at the caller if comparing across engines).
    """
    toks = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    oov = F.log(F.lit(float(alpha))) - F.log("total")
    return (
        toks.join(F.broadcast(model), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, F.coalesce("logp", oov).alias("__lp"))
        .groupBy(id_col)
        .agg(
            (F.sum("__lp") / F.count(F.lit(1))).alias("mean_logp"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def logprob_filter(
    docs: DataFrame,
    min_mean_logp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1 << 16,
    alpha: float = 0.5,
) -> DataFrame:
    """Keep documents whose mean unigram log-prob clears the floor —
    the composed train-then-filter pipeline (empty-token documents are
    dropped with the gibberish: no score, no keep)."""
    model, totals = unigram_model(docs, text_col, vocab_size)
    scored = doc_logprob(docs, model, totals, text_col, id_col, alpha)
    return docs.join(
        scored.filter(F.col("mean_logp") >= min_mean_logp).select(id_col),
        id_col,
        "inner",
    )
