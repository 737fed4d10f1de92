"""Trained quality classifier: logistic regression over hashed
n-gram features.

The GPT-3 / FineWeb-Edu pattern — train a linear classifier that
separates a small "good" reference corpus from raw crawl text, then
score the whole corpus with it — as distributed, engine-reproducible
DataFrame plans. This completes the classifier story next to
``operators/dsir.py`` (closed-form distribution matching) and
``functions/inference.py`` (hosting an EXTERNAL model): here the model
is TRAINED in-engine, no external artifact.

Design for 100 TB:
- features are the hashed unigram+bigram bucket convention shared
  with DSIR / ``hashed_bow_embeddings`` (md5-half buckets — no
  vocabulary, fixed ``dim`` regardless of corpus size, reproducible
  by an external SQL engine), L1-normalized per document so document
  length does not dominate the margin;
- TRAINING runs full-batch gradient descent with a driver-held weight
  vector (bounded by ``dim``, never corpus size): each iteration is
  one broadcast join (margins) + one partial-aggregatable groupBy
  (per-bucket gradient) + one ``dim``-bounded collect. Train on a
  SAMPLE (classifier training is sample-sized by design — fit ~10^5-6
  labeled rows, score 10^10); the iteration count multiplies the
  sample passes, not corpus passes;
- SCORING the corpus is one map-side pass: broadcast the weight
  table, join, per-doc partial agg.

Determinism: the per-bucket gradient is ROUNDED to 9 dp each
iteration before the weight update — groupBy float sums are
summation-order dependent across engines/partitionings, and an
unrounded ulp would compound over iterations; rounding pins every
iterate so an external oracle can replay training exactly (the
``perplexity_buckets`` rounding convention, applied per step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.operators.dsir import _gram_buckets
from platypus_ingestion_plugins_spark.session import ensure_parallelism


def doc_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1 << 12,
) -> DataFrame:
    """Sparse L1-normalized hashed-gram features: (id, bucket, val)
    with ``val = count(bucket in doc) / n_grams(doc)`` — at most
    min(dim, n_grams) rows per document. Zero-gram documents produce
    no rows (they carry no evidence; score 0.5 under any weights)."""
    # per-doc total = the gram-array size, taken BEFORE the explode
    # and carried through it — a window over the per-bucket counts
    # cost a second full shuffle (repartition by id) for the same
    # number (r13 bench follow-up). Two-step select so the md5 array
    # is materialized once (CollapseProject keeps multi-use non-cheap
    # exprs in their own Project); first() is constant per group.
    arr = ensure_parallelism(df).select(
        F.col(id_col), _gram_buckets(text_col, dim).alias("__b")
    )
    grams = arr.select(
        F.col(id_col),
        F.size("__b").alias("__n"),
        F.explode("__b").alias("bucket"),
    )
    counts = grams.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("__c"), F.first("__n").alias("__n")
    )
    return counts.select(
        id_col, "bucket", (F.col("__c") / F.col("__n")).alias("val")
    )


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    id_col: str,
    label_col: str,
    iters: int = 8,
    lr: float = 1.0,
) -> list[tuple[int, float]]:
    """Full-batch logistic-regression training over sparse features.

    ``features`` is the ``doc_features`` frame; ``labels`` maps id ->
    0/1. Returns the non-zero weight vector as (bucket, weight) pairs
    — dim-bounded, driver-held. Weights start at zero (iteration 1's
    sigmoid is exactly 0.5, which the oracle replays in closed form);
    each step computes ``grad_b = round(sum_d val_db * (p_d - y_d)
    / N, 9)`` and updates ``w_b -= lr * grad_b``.

    The joined (features x labels) frame is evaluated once per
    iteration — persist it before calling when the upstream lineage
    is expensive; the call itself caches and releases it. Rows whose
    label is NULL are EXCLUDED from training entirely (a NULL y would
    silently contribute nothing to any gradient while still inflating
    the 1/N normalizer, shrinking every weight — r11 review 2nd
    pass #5); label what you train on, score everything after.
    """
    fl = features.join(
        labels.select(
            F.col(id_col), F.col(label_col).cast("double").alias("__y")
        ).filter(F.col("__y").isNotNull()),
        id_col,
    ).persist()
    try:
        n_docs = fl.select(id_col).distinct().count()
        if n_docs == 0:
            return []
        w: dict[int, float] = {}
        for _ in range(int(iters)):
            if w:
                wdf = F.broadcast(
                    fl.sparkSession.createDataFrame(
                        sorted(w.items()), "bucket long, __w double"
                    )
                )
                margins = (
                    fl.join(wdf, "bucket", "left")
                    .groupBy(id_col, "__y")
                    .agg(
                        F.sum(
                            F.col("val") * F.coalesce("__w", F.lit(0.0))
                        ).alias("__m")
                    )
                )
                err = margins.select(
                    id_col,
                    (
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
                        - F.col("__y")
                    ).alias("__e"),
                )
                graded = fl.join(err, id_col)
            else:
                graded = fl.withColumn("__e", F.lit(0.5) - F.col("__y"))
            grad = (
                graded.groupBy("bucket")
                .agg(
                    F.round(
                        F.sum(F.col("val") * F.col("__e"))
                        / F.lit(float(n_docs)),
                        9,
                    ).alias("__g")
                )
                .collect()
            )
            for r in grad:
                # Row.__g attribute access is reserved; index instead
                w[r.bucket] = w.get(r.bucket, 0.0) - lr * r["__g"]
    finally:
        fl.unpersist()
    return sorted(w.items())


def score_logreg(
    features: DataFrame,
    weights: list[tuple[int, float]] | DataFrame,
    id_col: str,
) -> DataFrame:
    """Per-document sigmoid score under a trained weight vector:
    (id, margin, score). One broadcast join + one partial-aggregatable
    groupBy — the corpus pass is map-side. Documents with no feature
    rows are absent (no evidence; callers wanting them score 0.5 via
    a left join on the corpus ids)."""
    spark = features.sparkSession
    wdf = (
        weights
        if isinstance(weights, DataFrame)
        else spark.createDataFrame(
            [(int(b), float(x)) for b, x in weights],
            "bucket long, __w double",
        )
    )
    return (
        features.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("val") * F.coalesce("__w", F.lit(0.0))).alias(
                "margin"
            )
        )
        .select(
            id_col,
            "margin",
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias(
                "score"
            ),
        )
    )


def char_gram_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    dim: int = 1 << 11,
) -> DataFrame:
    """Sparse L1-normalized hashed CHARACTER n-gram features:
    (id, bucket, val) — the fastText-style language-ID signal (char
    n-grams separate languages far better than word grams; Joulin et
    al. 2016). Same engine-independent md5-half bucket convention as
    the word-gram features (``operators/dsir._gram_buckets``), so an
    external SQL engine replays every feature id; all Catalyst
    expressions, no UDF. Documents shorter than ``n`` chars produce
    no rows (the ``when`` guard — Spark's ``sequence`` would
    otherwise DESCEND for stop < start and mint phantom grams)."""
    c = F.lower(F.col(text_col))
    grams = F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - n + 1),
            lambda i: c.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    buckets = F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
            F.lit(dim),
        ),
    )
    # per-doc total = the gram count, which is a pure LENGTH formula
    # (length - n + 1 when long enough) — no window over the
    # per-bucket counts, whose partition-by-id shuffle doubled the
    # feature cost (r13 bench follow-up)
    n_grams = F.when(
        F.length(c) >= n, (F.length(c) - n + 1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    # the md5-per-gram transform is heavy per-row compute: inherit a
    # single-split small scan and the whole stage serializes on one
    # core (the session.ensure_parallelism contract; no-op at scale)
    grams_df = ensure_parallelism(df).select(
        F.col(id_col),
        n_grams.alias("__n"),
        F.explode(buckets).alias("bucket"),
    )
    counts = grams_df.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).alias("__c"), F.first("__n").alias("__n")
    )
    return counts.select(
        id_col, "bucket", (F.col("__c") / F.col("__n")).alias("val")
    )


def train_logreg_ovr(
    features: DataFrame,
    labels: DataFrame,
    id_col: str,
    class_col: str,
    iters: int = 2,
    lr: float = 1.0,
) -> list[tuple[str, int, float]]:
    """One-vs-rest multiclass training: K binary logistic models fit
    SIMULTANEOUSLY by keying every frame on (class, bucket) — one
    broadcast-classes expansion, one groupBy(class, bucket) gradient
    and one (K x dim)-bounded collect per iteration, regardless of K.
    Same determinism contract as ``train_logreg``: zero init (so
    iteration 1's sigmoid is exactly 0.5 and the oracle replays it in
    closed form), 9-dp-rounded gradients pinning every iterate across
    engines. Returns (class, bucket, weight) rows, driver-held.
    NULL-class rows are excluded (the ``train_logreg`` rationale)."""
    spark = features.sparkSession
    lab = labels.select(
        F.col(id_col), F.col(class_col).alias("__cls")
    ).filter(F.col("__cls").isNotNull())
    classes = sorted(r[0] for r in lab.select("__cls").distinct().collect())
    if not classes:
        return []
    cls_df = F.broadcast(
        spark.createDataFrame([(c,) for c in classes], "__c string")
    )
    # cache the labeled features PRE-expansion: the K-way class
    # cross join is a cheap in-memory broadcast expansion, so caching
    # fj instead of fl holds K x less data and the distinct-doc count
    # scans K x fewer rows (r13 bench follow-up — this was the
    # suite's slowest query)
    fj = features.join(lab, id_col).persist()
    # (id, bucket, val, __cls actual, __c candidate, __y) — the OVR
    # label matrix, K rows per feature row, derived lazily from the
    # cached fj on each use
    fl = fj.crossJoin(cls_df).withColumn(
        "__y", (F.col("__cls") == F.col("__c")).cast("double")
    )
    try:
        n_docs = fj.select(id_col).distinct().count()
        w: dict[tuple[str, int], float] = {}
        for _ in range(int(iters)):
            if w:
                wdf = F.broadcast(
                    spark.createDataFrame(
                        [(c, b, x) for (c, b), x in sorted(w.items())],
                        "__c string, bucket long, __w double",
                    )
                )
                margins = (
                    fl.join(wdf, ["__c", "bucket"], "left")
                    .groupBy(id_col, "__c", "__y")
                    .agg(
                        F.sum(
                            F.col("val") * F.coalesce("__w", F.lit(0.0))
                        ).alias("__m")
                    )
                )
                err = margins.select(
                    id_col,
                    "__c",
                    (
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("__m")))
                        - F.col("__y")
                    ).alias("__e"),
                )
                graded = fl.join(err, [id_col, "__c"])
            else:
                graded = fl.withColumn("__e", F.lit(0.5) - F.col("__y"))
            grad = (
                graded.groupBy("__c", "bucket")
                .agg(
                    F.round(
                        F.sum(F.col("val") * F.col("__e"))
                        / F.lit(float(n_docs)),
                        9,
                    ).alias("__g")
                )
                .collect()
            )
            for r in grad:
                key = (r["__c"], r.bucket)
                w[key] = w.get(key, 0.0) - lr * r["__g"]
    finally:
        fj.unpersist()
    return sorted((c, b, x) for (c, b), x in w.items())


def predict_ovr(
    features: DataFrame,
    weights: list[tuple[str, int, float]] | DataFrame,
    id_col: str,
    out_col: str = "pred_class",
) -> DataFrame:
    """Argmax-margin class per document: (id, <out_col>, margin). One
    broadcast weights join + one partial-aggregatable groupBy per
    (id, class) + one partial-aggregatable argmax groupBy per id —
    the corpus pass is map-side like ``score_logreg``. The argmax is
    min(struct(-margin, class)) rather than a window: a window
    re-shuffles AND sorts every (id, class) row, where the min-struct
    combines map-side (r13 bench follow-up). Margins are
    6-dp-rounded BEFORE the argmax and ties break on the
    lexicographically smallest class (min over (-margin, class)
    equals max-margin-then-min-class), so the prediction is
    deterministic across engines, partitionings and summation
    orders."""
    spark = features.sparkSession
    wdf = (
        weights
        if isinstance(weights, DataFrame)
        else spark.createDataFrame(
            [(c, int(b), float(x)) for c, b, x in weights],
            "__c string, bucket long, __w double",
        )
    )
    margins = (
        features.join(F.broadcast(wdf), "bucket")
        .groupBy(id_col, "__c")
        .agg(F.round(F.sum(F.col("val") * F.col("__w")), 6).alias("margin"))
    )
    best = margins.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("margin")).alias("nm"), F.col("__c").alias("c")
            )
        ).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.c").alias(out_col),
        (-F.col("__best.nm")).alias("margin"),
    )
