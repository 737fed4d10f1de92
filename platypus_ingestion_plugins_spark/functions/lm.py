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


def bigram_model(
    docs: DataFrame,
    text_col: str = "text",
    bigram_size: int = 1 << 20,
) -> DataFrame:
    """Train the corpus bigram conditional table: at most
    ``bigram_size`` rows of ``(w1, w2, p_big)`` with
    ``p_big = c(w1 w2) / c(w1)`` — the maximum-likelihood conditional,
    denominators taken from the FULL unigram counts (never a capped
    vocabulary, so a kept bigram's probability is exact even when its
    history token would miss a vocab cut). The cap keeps the highest-
    count bigrams, ties broken on (w1, w2) so the table is
    deterministic.

    100 TB shape: one ``groupBy(w1, w2)`` count with map-side partial
    aggregation (the bigram key space self-compresses long before the
    shuffle), one ``groupBy(w1)`` for denominators, one join bigram->
    unigram on w1 (both sides already reduced to count rows, never
    corpus rows), one TakeOrdered for the cap. The result is
    model-sized and broadcast by the scorer.
    """
    t = tokens(text_col)
    n = F.size(t)
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        docs.select(F.explode(bigrams).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt2"))
    )
    uni = (
        docs.select(F.explode(tokens(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("cnt1"))
    )
    return (
        pairs.join(uni, "w1")
        .orderBy(F.col("cnt2").desc(), "w1", "w2")
        .limit(bigram_size)
        .select("w1", "w2", (F.col("cnt2") / F.col("cnt1")).alias("p_big"))
    )


def doc_bigram_logprob(
    docs: DataFrame,
    bigrams: DataFrame,
    model: DataFrame,
    totals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability — the
    KenLM-shaped upgrade of ``doc_logprob`` (CCNet scores with a
    5-gram KenLM; a corpus-trained interpolated bigram is the
    distributed, external-model-free analogue, and separates fluent
    word ORDER from fluent word CHOICE, which the unigram proxy
    cannot):

        p(w2 | w1) = lam * p_big(w2 | w1) + (1 - lam) * p_uni(w2)

    with ``p_big`` from ``bigram_model`` (0 when the pair is absent),
    and ``p_uni`` the ``unigram_model`` probability with the same
    add-alpha OOV floor as ``doc_logprob`` — the unigram interpolation
    mass guarantees every position scores > 0, so the log never sees
    zero. Scores average over the document's ``n_tokens - 1`` bigram
    positions; documents with fewer than 2 tokens produce no row.
    Returns ``(id_col, mean_logp2, n_bigrams)``.

    Scale shape: the doc side explodes to one row per position ONCE;
    both model joins broadcast (model-sized tables); the mean reduces
    map-side to ~one row per document. No window, no driver data.
    """
    t = tokens(text_col)
    n = F.size(t)
    bg = F.zip_with(
        F.slice(t, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pos = docs.select(F.col(id_col), F.explode(bg).alias("bg")).select(
        id_col, "bg.w1", "bg.w2"
    )
    uni = model.select(F.col("tok").alias("w2"), F.col("logp").alias("__lp1"))
    oov = F.log(F.lit(float(alpha))) - F.log("total")
    p_uni = F.exp(F.coalesce(F.col("__lp1"), oov))
    score = F.log(
        F.lit(float(lam)) * F.coalesce(F.col("p_big"), F.lit(0.0))
        + F.lit(1.0 - float(lam)) * p_uni
    )
    return (
        pos.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(F.broadcast(uni), "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(id_col, score.alias("__lp"))
        .groupBy(id_col)
        .agg(
            (F.sum("__lp") / F.count(F.lit(1))).alias("mean_logp2"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str | None = None,
    vocab_size: int = 1 << 16,
    alpha: float = 0.5,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail perplexity partition (Wenzek et al.
    2020 §4.3): score every document with the mean-logprob perplexity
    proxy, then split each ``by`` group (CCNet: the language) into
    three quality buckets at the ``cuts`` quantiles — head = the
    best-scoring third, the slice actually used for pretraining mixes;
    tail = the worst. Returns ``(id_col, [by,] mean_logp, bucket)``;
    zero-token documents produce no row (no score — same contract as
    ``doc_logprob``).

    Bucketing is by ``percent_rank`` over ``mean_logp`` DESC (higher
    mean logprob = lower perplexity = better), with ``id_col`` as the
    final tiebreak so the rank — and therefore the bucket — is a total
    order reproducible across engines. ``mean_logp`` is rounded to 6
    places BEFORE ranking: cross-engine libm/summation-order ulps may
    perturb raw doubles, and a rank comparison on perturbed keys could
    flip a boundary document's bucket; ranking on the rounded value
    makes the sort keys bit-identical everywhere.

    Scale shape: training + scoring as in ``doc_logprob`` (broadcast
    model, partial-aggregatable passes); the rank is ONE window
    partitioned by ``by`` — parallel across groups, which is why CCNet
    shards this step per language. ``by=None`` is a single global
    window (one reducer over one row per DOCUMENT — fine up to ~10^8
    docs, but prefer a group column at corpus scale).
    """
    from pyspark.sql.window import Window

    model, totals = unigram_model(docs, text_col, vocab_size)
    scored = doc_logprob(docs, model, totals, text_col, id_col, alpha)
    scored = scored.withColumn("mean_logp", F.round("mean_logp", 6))
    keep = [id_col, "mean_logp"]
    if by is not None:
        scored = scored.join(
            docs.select(id_col, by).dropDuplicates([id_col]), id_col
        )
        keep = [id_col, by, "mean_logp"]
        win = Window.partitionBy(by)
    else:
        win = Window.partitionBy()
    win = win.orderBy(F.col("mean_logp").desc(), F.col(id_col).asc())
    pr = F.percent_rank().over(win)
    bucket = (
        F.when(pr < cuts[0], labels[0])
        .when(pr < cuts[1], labels[1])
        .otherwise(labels[2])
    )
    return scored.select(*keep, bucket.alias("bucket"))
