"""Model/label evaluation readouts over corpus-scale prediction
frames: classification report, calibration (ECE), kNN label
propagation, and corpus unigram divergence.

These close the loop the in-engine trained classifiers
(``functions/classifier.py``) and the inference seam
(``functions/inference.py``) open: once a quality or language model
scores a corpus, the questions become "how good are the labels"
(``classification_report``), "can I trust the probabilities"
(``calibration_report``), "can the labeled slice label the rest"
(``knn_classify``), and "did the corpus drift under my sampling"
(``unigram_kl_divergence``). All four are pure DataFrame
compositions — conditional aggregations, bounded windows, broadcast
joins; no UDF, no corpus-sized collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def classification_report(
    df: DataFrame,
    gold_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 + support from a (gold,
    predicted) frame — the sklearn ``classification_report`` shape,
    computed distributed: one partial-aggregatable conditional
    aggregation per class over the label union. Rows with a NULL gold
    label drop (unlabeled); NULL predictions count as wrong for every
    class (they inflate no denominator except the gold support).
    Output (label, support, tp, precision, recall, f1) 6dp, label
    order; zero denominators yield 0.0 (sklearn's zero_division=0),
    so a never-predicted class reads precision 0, not NULL.

    Scale shape: one groupBy over the gold axis and one over the
    predicted axis, full-outer-joined on the class-sized label set —
    the corpus never shuffles wider than (label, count) rows."""
    base = df.where(F.col(gold_col).isNotNull()).select(
        F.col(gold_col).alias("__g"), F.col(pred_col).alias("__p")
    )
    per_gold = base.groupBy(F.col("__g").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("support"),
        F.sum(
            F.when(F.col("__p") == F.col("__g"), 1).otherwise(0)
        ).cast("long").alias("tp"),
    )
    per_pred = (
        base.where(F.col("__p").isNotNull())
        .groupBy(F.col("__p").alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("pred_n"))
    )
    joined = per_gold.join(per_pred, "label", "full_outer").select(
        "label",
        F.coalesce("support", F.lit(0)).alias("support"),
        F.coalesce("tp", F.lit(0)).alias("tp"),
        F.coalesce("pred_n", F.lit(0)).alias("__pn"),
    )
    prec = F.when(
        F.col("__pn") > 0, F.col("tp") / F.col("__pn")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("support") > 0, F.col("tp") / F.col("support")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (prec + rec) > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return joined.select(
        "label",
        "support",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("label")


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + expected calibration error inputs
    (Naeini et al. 2015): scores in [0, 1] bucket into ``n_bins``
    equal-width bins; per bin the count, mean predicted score, and
    empirical positive rate — |accuracy − confidence| summed with
    bin-weight IS the ECE, computable from this output by one more
    fold (kept as rows so the curve can be plotted and the oracle can
    replay it). Score exactly 1.0 folds into the last bin (sklearn's
    convention); NULL scores/labels drop; empty bins are absent.
    Output (bin, n, avg_score 6dp, pos_rate 6dp, abs_gap 6dp).

    One partial-aggregatable groupBy over a codegen bin id —
    bin-count-sized output."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    s = F.col(score_col)
    y = F.col(label_col).cast("double")
    b = F.least(
        F.floor(s * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    )
    out = (
        df.where(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(s).alias("__avg"),
            F.avg(y).alias("__pos"),
        )
    )
    return out.select(
        "bin",
        "n",
        F.round("__avg", 6).alias("avg_score"),
        F.round("__pos", 6).alias("pos_rate"),
        F.round(F.abs(F.col("__avg") - F.col("__pos")), 6).alias("abs_gap"),
    ).orderBy("bin")


def knn_classify(
    labeled: DataFrame,
    unlabeled: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
) -> DataFrame:
    """kNN label propagation (the auto-labeling / weak-supervision
    primitive): each unlabeled vector takes the majority label of its
    ``k`` nearest LABELED vectors by cosine, ties broken by (summed
    cosine desc, label asc) — deterministic. Output (id, label,
    votes, n_neighbors).

    Plan shape: the LABELED side (the small curated slice) BROADCASTS
    and each unlabeled row scores against it map-side; the per-
    unlabeled top-k rides ``similarity._topk_per_query``'s salted
    two-phase merge (no per-query hot reducer), then one bounded
    groupBy per (query, label) and a per-query window over <= k
    rows. Never |labeled| x |unlabeled| through a shuffle wider than
    the scored pairs, and the scored pairs are |unlabeled| x
    |labeled| map-side rows — cap the labeled slice or pre-block with
    sign-LSH when both sides are corpus-sized."""
    from pyspark.sql.window import Window

    from platypus_ingestion_plugins_spark.operators.similarity import (
        _topk_per_query,
        cosine,
        ensure_parallelism,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    lab = F.broadcast(
        labeled.select(
            F.col(id_col).alias("__lid"),
            F.col(vec_col).alias("__lvec"),
            F.col(label_col).alias("__lab"),
        )
    )
    scored = (
        ensure_parallelism(unlabeled.select(F.col(id_col), F.col(vec_col)))
        .crossJoin(lab)
        .select(
            F.col(id_col).alias("__q"),
            F.col("__lid"),
            F.round(
                cosine(F.col(vec_col), F.col("__lvec"), dim), 6
            ).alias("cos_sim"),
        )
    )
    nn = _topk_per_query(scored, k, "__q", "__lid", 4096, "knn_rank")
    lab_of = F.broadcast(
        labeled.select(
            F.col(id_col).alias("__lid"), F.col(label_col).alias("__lab")
        )
    )
    votes = (
        nn.join(lab_of, "__lid")
        .groupBy(F.col("__q").alias(id_col), F.col("__lab"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("votes"),
            F.sum("cos_sim").alias("__w"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("votes").desc(), F.col("__w").desc(), F.col("__lab").asc()
    )
    totals = votes.groupBy(id_col).agg(
        F.sum("votes").cast("long").alias("n_neighbors")
    )
    best = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("__lab").alias(label_col), "votes")
    )
    return best.join(totals, id_col)


def unigram_kl_divergence(
    corpus_a: DataFrame,
    corpus_b: DataFrame,
    text_col: str,
    top_n: int = 20,
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus drift diagnostic: per-term contributions to the
    (smoothed) unigram KL divergence KL(A || B) = sum_t
    p_A(t) * ln(p_A(t) / p_B(t)) over the union vocabulary with
    add-``alpha`` smoothing (so a term absent from B contributes a
    large-but-finite penalty instead of infinity) — "which words made
    my filtered corpus different". Output the ``top_n`` largest
    contributions (term, p_a, p_b, contrib — 6dp) by (contrib desc,
    term); the TOTAL KL is the unrounded sum, recoverable by running
    with top_n >= |vocab|.

    Plan shape: two token-count aggregations (partial-aggregatable),
    one full-outer join on the vocabulary (term-sized, never
    corpus-sized), 1-row totals broadcast, distributed TakeOrdered."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from platypus_ingestion_plugins_spark.serving.query import tokenize

    def counts(df):
        return (
            df.select(F.explode(tokenize(text_col)).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    ca, cb = counts(corpus_a), counts(corpus_b)
    vocab = ca.join(cb.withColumnRenamed("n", "nb"), "term", "full_outer").select(
        "term",
        F.coalesce("n", F.lit(0)).alias("na"),
        F.coalesce("nb", F.lit(0)).alias("nb"),
    )
    totals = vocab.agg(
        F.sum("na").cast("long").alias("__ta"),
        F.sum("nb").cast("long").alias("__tb"),
        F.count(F.lit(1)).cast("long").alias("__v"),
    )
    a = F.lit(float(alpha))
    p_a = (F.col("na") + a) / (F.col("__ta") + a * F.col("__v"))
    p_b = (F.col("nb") + a) / (F.col("__tb") + a * F.col("__v"))
    contrib = p_a * F.log(p_a / p_b)
    return (
        vocab.crossJoin(F.broadcast(totals))
        .select(
            "term",
            F.round(p_a, 6).alias("p_a"),
            F.round(p_b, 6).alias("p_b"),
            F.round(contrib, 6).alias("contrib"),
        )
        .orderBy(F.col("contrib").desc(), F.col("term").asc())
        .limit(top_n)
    )


def match_synonyms(field: str, query: str, synonyms: dict) -> Column:
    """Query-time synonym expansion (the ES synonym_graph filter in
    its query-time deployment, applied to ``match_text`` OR
    semantics): each analyzed query term expands through the synonym
    map (term -> list of equivalent terms, applied ONE hop — ES
    semantics, no transitive closure) and a document matches when any
    expanded term appears among its analyzed tokens. The map is a
    query-side dictionary (registry-sized); the predicate compiles to
    one EXISTS+isin over the tokenized field — codegen, no UDF, no
    join."""
    from platypus_ingestion_plugins_spark.serving.query import (
        _py_tokenize,
        tokenize,
    )

    terms = _py_tokenize(query)
    expanded: set[str] = set()
    for t in terms:
        expanded.add(t)
        for s in synonyms.get(t, []):
            toks = _py_tokenize(s)
            if len(toks) != 1:
                raise ValueError(
                    f"synonym {s!r} for {t!r} must analyze to one term"
                )
            expanded.add(toks[0])
    if not expanded:
        # match_text semantics: an empty analyzed query matches
        # NOTHING (arrays_overlap with an empty array) — a match-all
        # from punctuation-only input would hand a filter/alert caller
        # the whole corpus (the percolate empty-terms rule)
        return F.lit(False)
    lst = sorted(expanded)
    return F.exists(tokenize(field), lambda x: x.isin(lst))


def psi_report(
    df: DataFrame,
    value_col: str,
    slice_col: str,
    ref_value,
    cmp_value,
    bins: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Population-stability-index drift report (NEW r15) — the numeric
    twin of ``unigram_kl_divergence``'s vocabulary drift: how far a
    feature's distribution moved between two corpus slices (release
    vs release, train vs serve), the standard pre-retraining gate
    (PSI < 0.1 stable / 0.1-0.25 drifting / > 0.25 shifted). Bins are
    the REFERENCE slice's exact ``bins``-quantile cut points (the
    ``percentiles`` quantile_cont convention, so an external engine
    replays them bit-for-bit); each slice's rows land in
    bin = #cuts strictly below the value. Output one row per realized
    bin: ``(bin, n_ref, n_cmp, ref_pct, cmp_pct, psi_contrib)`` with
    add-``alpha`` smoothed proportions (absent mass stays finite, the
    KL rule); total PSI = sum of contribs. NULL values drop.

    Plan shape: one 1-row exact-percentile aggregate over the
    reference slice broadcast onto the scan, bin ids via a
    size(filter(cuts)) codegen fold (``bins``-bounded, no UDF), one
    partial-aggregatable groupBy(bin), then window totals over the
    bin grid — a curve by construction, never the corpus."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    from pyspark.sql import Window

    x = F.col(value_col)
    both = df.where(
        x.isNotNull() & F.col(slice_col).isin([ref_value, cmp_value])
    )
    cuts = (
        both.where(F.col(slice_col) == F.lit(ref_value))
        .agg(
            F.percentile(
                x, F.array(*[F.lit(i / bins) for i in range(1, bins)])
            ).alias("__cuts")
        )
        # an empty reference slice makes the percentile array NULL, so
        # every row would bin to NULL and the report would emit
        # meaningless rows — fail loudly instead (plan-side guard: the
        # query stays lazy/action-free at construction)
        .select(
            F.when(F.col("__cuts").isNotNull(), F.col("__cuts"))
            .otherwise(
                F.raise_error(
                    F.lit(
                        "psi_report: reference slice "
                        f"{ref_value!r} is empty"
                    )
                )
            )
            .alias("__cuts")
        )
    )
    binned = both.join(F.broadcast(cuts)).select(
        F.col(slice_col).alias("__slice"),
        F.size(F.filter(F.col("__cuts"), lambda c: c < x)).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum((F.col("__slice") == F.lit(ref_value)).cast("long"))
        .alias("n_ref"),
        F.sum((F.col("__slice") == F.lit(cmp_value)).cast("long"))
        .alias("n_cmp"),
    )
    w = Window.partitionBy()
    pa = (F.col("n_ref") + F.lit(alpha)) / (
        F.sum("n_ref").over(w) + F.lit(alpha * bins)
    )
    pb = (F.col("n_cmp") + F.lit(alpha)) / (
        F.sum("n_cmp").over(w) + F.lit(alpha * bins)
    )
    return counts.select(
        "bin",
        "n_ref",
        "n_cmp",
        F.round(pa, 6).alias("ref_pct"),
        F.round(pb, 6).alias("cmp_pct"),
        F.round((pa - pb) * F.log(pa / pb), 6).alias("psi_contrib"),
    )
