"""Physical-plan audit gate for the headline queries.

Locks in the round-4..6 plan fixes against regression (VERDICT r6 #6):

- no ``CartesianProduct`` anywhere (every cross join must ride a
  broadcast side → ``BroadcastNestedLoopJoin``, which is the intended
  plan for the O(k) query-side crossJoins in similarity/top-k);
- no row-at-a-time Python UDF (``BatchEvalPython``) in any headline
  plan — Python is allowed only Arrow-batched (ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas);
- the candidate-pair dedup exchange in ``embedding_neardup`` carries
  only ids — an Exchange hash-partitioned on (id_a, id_b) must not
  ship vector columns (the round-4 fat-shuffle fix);
- queries that join an O(k) side actually broadcast it
  (``BroadcastExchange`` present in the static plan).

Static plans only (``explain("formatted")`` without executing), so the
gate is fast and independent of AQE's runtime rewrites.
"""

from __future__ import annotations

import io
import re
import sys

import pytest

import __spark_entry__ as E

# Headline queries: the most expensive / most plan-sensitive batch
# entries (VERDICT r6 "plan audit of the 5 most expensive" + the
# broadcast-join suite).
HEADLINE = [
    "tpch_q1",
    "tpch_q5ish",
    "salted_join_agg",
    "asof_join",
    "similarity_topk",
    "knn_join",
    "embedding_neardup",
    "embedding_dedup_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "winnow_overlap",
    "jaccard_join",
    "unigram_logprob",
    "shuffle_shards",
    "pack_texts",
    "fulltext_bm25",
    "temperature_mix",
    "session_counts",
    "resample_ffill",
    "bloom_decontam",
    "quantile_sketch",
    "line_dedup",
    "pipeline_clean_corpus",
    "dedup_survivors",
    "top_terms_per_group",
    "hashed_bow_embedding",
    # r11 additions
    "budget_select",
    "semdedup_keep",
    "weighted_sample",
    "dsir_select",
    "perplexity_buckets",
    "gopher_quality",
    "line_dedup_by_source",
    "exact_substring_dedup",
    "c4_filter",
    "bigram_logprob",
    "stratified_interleave",
    "url_dedup",
    "paragraph_dedup",
    # quality_classifier / bpe_token_count are NOT here: their
    # queries() constructors EXECUTE (training collects / sample
    # collect) — this module's contract is static plans only. The
    # classifier's scoring plan is audited by
    # test_classifier_scoring_plan below, built without training.
    "corpus_profile",
    "corpus_overlap",
    "pretraining_mix",
    # r12 additions
    "image_neardup",
    "audio_stats",
    "video_neardup",
    "audio_neardup",
    "hybrid_search",
    "chat_render",
    "chat_sft_stats",
    "chat_assistant_dedup",
    # r13 additions
    "range_bool_query",
    "ann_recall",
    "date_histogram",
    "key_skew",
    "funnel",
    "funnel_windowed",
    "retention",
    "multi_match",
    "ab_test",
    "event_transitions",
    "preference_pairs",
    # bpe_train / indexed_wildcard / more_like_this / group_split are
    # NOT here: their queries() constructors EXECUTE (merge-round
    # argmax collects / index build + dictionary expansion / the
    # N-docs scalar / CC iteration) — static plans only. Their scale
    # shapes are pinned by construction instead: vocab-only rounds,
    # dictionary-sized expansion + pruned postings, one broadcast
    # term join, duplicate-sized groups join (see each docstring).
    # r14 additions. phrase_slop / span_near are NOT here: their
    # constructors EXECUTE (shared term-index build); their pruned
    # posting-read shape is pinned by the text_index prune tests.
    "significant_terms",
    "event_paths",
    "rate_anomalies",
    "funnel_cascade",
    "attribution",
    "survival_km",
    "rfm_segments",
    "percolate",
    "collapse_source",
    "tfidf_keywords",
    "rouge_pairs",
    "char_entropy",
    "phrase_prefix",
    "stats_facet",
    "recency_decay",
    "pagerank",
    "fd_violations",
    "pmi_pairs",
    "seasonal_anomalies",
    "adjacency_matrix",
    # r15 additions. indexed_regexp / indexed_prefix are NOT here:
    # their constructors EXECUTE (dictionary expansion collect, like
    # indexed_wildcard); their pruned posting-read shape is pinned by
    # the text_index prune tests.
    "geo_distance",
    "geo_grid",
    "stickiness",
    "percentile_ranks",
    "rare_terms",
    "composite_page",
    "histogram_pipeline",
    # did_you_mean is NOT here: its constructor EXECUTES (shared
    # index build + query-frame createDataFrame); the dictionary-scan
    # shape is pinned by its unit test.
    "maxsim_topk",
    "diff_in_diff",
    "funnel_latency",
    "eval_report",
    "calibration",
    "knn_label",
    "corpus_kl",
    "synonym_search",
    # update_by_query is NOT here: its constructor EXECUTES (scratch
    # serving-table build + CDC applies); its plan discipline is the
    # serving table's own, pinned by the table suite.
    "dsl_query",
    "soft_dedup",
    "json_validity",
    # r15 tail batch. lpa_communities / kcore_graph are NOT here:
    # their returned frames sit behind per-round localCheckpoints
    # (the pagerank exclusion); unit tests pin the semantics.
    "aggs_dsl",
    "aggs_dsl_range",
    "simple_query",
    "triangle_count",
    "fim_split",
    "span_corrupt",
    "psi_drift",
    "ewma_anomalies",
    "aggs_dsl_filter",
    "readability",
    "aggs_multi_terms",
    # srm_check / ppr_seeds are NOT here: their constructors EXECUTE
    # (the bounded unknown-arm collect; the seed-intersection guard)
    "ab_cuped",
    "aggs_missing",
    "aggs_pipeline",
    "aggs_geo_rings",
    "doremi_weights",
    "aggs_percentiles",
    "aggs_top_hits",
]

# Queries whose plan legitimately contains a broadcast O(k)-side join.
EXPECT_BROADCAST = [
    "tpch_q5ish",
    "salted_join_agg",
    "similarity_topk",
    "knn_join",
    "dedup_minhash_lsh",
    "unigram_logprob",  # the capped-vocab model must broadcast to the scorer
    "temperature_mix",  # the strata-rate frame must broadcast to the filter
    "dsir_select",  # the bucket log-ratio table must broadcast to the scorer
    "perplexity_buckets",  # the capped-vocab LM must broadcast (unigram_logprob)
    "bigram_logprob",  # both model tables (bigram + unigram) must broadcast
    "key_skew",  # the 1-row top-key frame must broadcast onto the stats row
    "significant_terms",  # the 1-row fg/bg totals must broadcast
    "attribution",  # the 1-row credit total must broadcast
    "survival_km",  # the 1-row at-risk total must broadcast
    "rfm_segments",  # the 1-row as-of edge date must broadcast
    "percolate",  # the registry must broadcast (never shuffle the corpus)
    "tfidf_keywords",  # the 1-row N must broadcast
    "recency_decay",  # the 1-row max-date edge must broadcast
    "pmi_pairs",  # the vocab frame + 1-row N must broadcast
    "maxsim_topk",  # the query-token frame must broadcast to the corpus
    "knn_label",  # the labeled slice must broadcast to the corpus
    "corpus_kl",  # the 1-row vocabulary totals must broadcast
    "triangle_count",  # the 1-row id-space modulus must broadcast
    "psi_drift",  # the 1-row decile-cuts frame must broadcast
    "ab_cuped",  # the 1-row pooled-theta stats must broadcast
    "doremi_weights",  # the 1-row domain-count/normalizer must broadcast
    # pagerank is NOT here: its returned frame sits behind the final
    # round's localCheckpoint, so the per-round broadcast scalars live
    # in already-truncated lineage — the unit test pins the semantics.
]


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


def _plan(spark, sf_dir, name) -> str:
    df = E.queries()[name](spark, sf_dir)
    return _formatted_plan(df)


def _detail_blocks(plan: str) -> list[tuple[str, str]]:
    """Split the formatted-explain detail section into
    (node_name, block_text) pairs — blocks start at ``(N) NodeName``."""
    blocks = []
    current_name, current_lines = None, []
    for line in plan.splitlines():
        m = re.match(r"\(\d+\) ([A-Za-z]+)", line)
        if m:
            if current_name is not None:
                blocks.append((current_name, "\n".join(current_lines)))
            current_name, current_lines = m.group(1), [line]
        elif current_name is not None:
            current_lines.append(line)
    if current_name is not None:
        blocks.append((current_name, "\n".join(current_lines)))
    return blocks


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {name: _plan(spark, sf_dir, name) for name in HEADLINE}


def test_no_cartesian_product(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, f"CartesianProduct in: {offenders}"


def test_no_row_at_a_time_python_udf(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, f"row-at-a-time Python UDF in: {offenders}"


def test_broadcast_on_small_sides(plans):
    missing = [
        n for n in EXPECT_BROADCAST if "BroadcastExchange" not in plans[n]
    ]
    assert not missing, f"no BroadcastExchange in: {missing}"


def test_pair_dedup_exchange_ships_no_vectors(plans):
    """The Exchange that hash-partitions candidate pairs on
    (id_a, id_b) must carry only ids — vectors re-attach AFTER the
    dedup (operators/similarity.py:570-605)."""
    vec_names = re.compile(r"\b(__v|va|vb|embedding)#")
    for name in ("embedding_neardup", "embedding_dedup_groups"):
        for node, block in _detail_blocks(plans[name]):
            if node != "Exchange":
                continue
            args = next(
                (l for l in block.splitlines() if l.startswith("Arguments:")), ""
            )
            if "id_a#" in args and "id_b#" in args:
                assert not vec_names.search(block), (
                    f"{name}: pair-keyed Exchange ships vector columns:\n{block}"
                )


def test_scans_prune_columns(plans):
    """Every parquet scan in the similarity/dedup suite should read a
    narrow schema (≤4 columns) — the tables have 3-4 columns of
    payload but a scan reading the full documents/embeddings width
    for a 2-column pipeline would be a pruning regression."""
    # (dedup_minhash_lsh's scan is hidden behind its lazy
    # localCheckpoint in the static plan; jaccard_join reads the same
    # documents shingle path un-checkpointed, keeping the probe live)
    for name in ("similarity_topk", "embedding_neardup", "jaccard_join"):
        widths = [
            len(w.split(","))
            for w in re.findall(r"ReadSchema: struct<([^>]*)>", plans[name])
            if w
        ]
        assert widths and max(widths) <= 4, (
            f"{name}: wide scan read_cols={widths}"
        )


def test_weighted_sample_is_take_ordered(plans):
    """weighted_sample's global top-n must compile to
    TakeOrderedAndProject (per-partition top-n + bounded merge), never
    a global Sort+Limit over the full corpus."""
    assert "TakeOrderedAndProject" in plans["weighted_sample"], (
        plans["weighted_sample"]
    )
    assert "dsir_select" in plans  # same contract for the Gumbel top-n
    assert "TakeOrderedAndProject" in plans["dsir_select"]


def test_gopher_flags_map_only(plans):
    """gopher_quality and c4_filter are each one codegen projection —
    their plans must contain no Exchange (shuffle-free,
    embarrassingly parallel) and no Python evaluation of any kind."""
    for name in ("gopher_quality", "c4_filter"):
        p = plans[name]
        assert "Exchange" not in p, (name, p)
        assert "EvalPython" not in p and "InPandas" not in p, (name, p)


def test_chat_projections_map_only(plans):
    """chat_render and chat_sft_stats are array-local codegen
    projections (fold / zip_with / filter over the turns array) —
    no Exchange, no Python evaluation of any kind."""
    for name in ("chat_render", "chat_sft_stats"):
        p = plans[name]
        assert "Exchange" not in p, (name, p)
        assert "EvalPython" not in p and "InPandas" not in p, (name, p)


def test_stratified_interleave_single_shuffle(plans):
    """stratified_interleave must shuffle EXACTLY once (one
    hash-partition on the group column; rank and group-count windows
    share it) and scan only the two columns it uses."""
    p = plans["stratified_interleave"]
    n_exchange = sum(
        1 for n, _ in _detail_blocks(p) if n == "Exchange"
    )
    assert n_exchange == 1, p
    widths = [
        len(w.split(","))
        for w in re.findall(r"ReadSchema: struct<([^>]*)>", p)
        if w
    ]
    assert widths and max(widths) <= 2, f"wide scan read_cols={widths}"


def test_classifier_scoring_plan(spark, sf_dir):
    """The classifier's corpus-scoring pass (the part that runs at
    100 TB) must broadcast the dim-bounded weight table and keep all
    Python Arrow-batched — audited WITHOUT training (the trainer
    executes collects; see the HEADLINE note)."""
    from platypus_ingestion_plugins_spark.functions.classifier import (
        doc_features,
        score_logreg,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = doc_features(docs, "text", "doc_id", dim=4096)
    p = _formatted_plan(score_logreg(feats, [(1, 0.5), (2, -0.25)], "doc_id"))
    assert "BroadcastExchange" in p, p
    assert "BatchEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_language_classifier_scoring_plan(spark, sf_dir):
    """predict_ovr's corpus pass (r12): broadcast the (K x dim)
    weight table, no row-at-a-time Python, no cross join — audited
    without training like test_classifier_scoring_plan."""
    from platypus_ingestion_plugins_spark.functions.classifier import (
        char_gram_features,
        predict_ovr,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = char_gram_features(docs, "text", "doc_id", n=3, dim=2048)
    p = _formatted_plan(
        predict_ovr(
            feats, [("en", 1, 0.5), ("de", 2, -0.25)], "doc_id"
        )
    )
    assert "BroadcastExchange" in p, p
    assert "BatchEvalPython" not in p, p
    assert "CartesianProduct" not in p, p


def test_pq_encode_and_adc_plans(spark, sf_dir):
    """PQ at corpus scale: encoding must be ONE map-only codegen
    projection (literal codebook — no Exchange, no join, no Python)
    and ADC top-k must compile to a distributed TakeOrdered — audited
    with a fixed codebook, WITHOUT training (pq_train executes
    collects; see the HEADLINE note)."""
    from platypus_ingestion_plugins_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = [
        (s, c, [float(s + c + i) for i in range(16)])
        for s in range(4)
        for c in range(4)
    ]
    enc = pq_encode(emb, cb, dim=64)
    p = _formatted_plan(enc)
    assert "Exchange" not in p, p
    assert "EvalPython" not in p and "InPandas" not in p, p

    p2 = _formatted_plan(pq_adc_topk(enc, cb, [0.0] * 64, k=10, dim=64))
    assert "TakeOrderedAndProject" in p2, p2
    assert "Exchange" not in p2, p2


def test_text_index_query_plans(spark, tmp_path):
    """The index query paths that run at 100 TB (r13): term search and
    BM25 over a prebuilt index must broadcast the bounded sides (tf /
    df / stats / delete set), keep everything JVM-side, and contain no
    cartesian product — audited on a small prebuilt index because the
    build itself executes (the classifier-pattern exemption from
    HEADLINE)."""
    from pyspark.sql import functions as F

    from platypus_ingestion_plugins_spark.serving import text_index as TI

    docs = spark.createDataFrame(
        [(i, f"term{i % 7} shared tokens here") for i in range(50)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "planidx")
    TI.build_term_index(docs, "text", "doc_id", idx, buckets=8, positions=True)
    TI.delete_docs(spark, idx, spark.createDataFrame([(1,)], "doc_id long"))

    for df in (
        TI.search_terms_indexed(spark, idx, ["shared", "term1"]),
        TI.bm25_indexed(spark, idx, "shared term1"),
        TI.search_phrase_indexed(spark, idx, "shared tokens"),
    ):
        p = _formatted_plan(df)
        assert "BroadcastExchange" in p, p       # delete set / tf / df / stats
        assert "BatchEvalPython" not in p, p      # no row-Python anywhere
        assert "CartesianProduct" not in p, p
    # the scan carries the literal bucket partition filter
    p = _formatted_plan(TI._pruned_scan(spark, idx, ["shared"]))
    assert "PartitionFilters" in p and "tb" in p, p
