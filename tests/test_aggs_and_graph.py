"""Units for the r15 tail batches: the ES aggregations-DSL executor
(``serving/aggs.run_aggs`` — buckets, metrics, pipeline aggs, shape
raises), ``simple_query_string``, the graph family (triangles, LPA,
k-core, personalized PageRank), the FIM/span-corruption transforms,
readability, PSI drift, EWMA charts (batch + shared-state streaming
twin), CUPED, and the SRM check."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.functions.text import fim_transform
from platypus_ingestion_plugins_spark.operators.graph import triangle_count
from platypus_ingestion_plugins_spark.serving.aggs import run_aggs
from platypus_ingestion_plugins_spark.serving.query import (
    simple_query_string,
)


# ------------------------------------------------------------------ aggs


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(id=1, src="a", lang="en", n=10),
        Row(id=2, src="a", lang="en", n=20),
        Row(id=3, src="a", lang="fr", n=30),
        Row(id=4, src="b", lang="en", n=40),
        Row(id=5, src="b", lang=None, n=50),
        Row(id=6, src="c", lang="de", n=60),
        Row(id=7, src=None, lang="de", n=70),
    ]
    return spark.createDataFrame(rows)


def test_aggs_terms_chain_with_metrics(docs):
    out = run_aggs(docs, {
        "aggs": {"s": {"terms": {"field": "src", "size": 2},
                 "aggs": {"l": {"terms": {"field": "lang", "size": 1},
                          "aggs": {"m": {"avg": {"field": "n"}}}}}}},
    }).orderBy("s", "l").collect()
    # TRUE src counts (pre-child-transform snapshots): a=3, b=2 (doc 5
    # counts for b even though its NULL lang elides below), c=1 ->
    # top-2 parents = a, b. within a: en(2) beats fr(1); within b: en.
    assert [(r.s, r.l, r.doc_count, r.m) for r in out] == [
        ("a", "en", 2, 15.0),
        ("b", "en", 1, 40.0),
    ]


def test_aggs_parent_rank_uses_total_count(docs):
    # parent 'a' has 3 docs split 2+1 across langs -> its rank must use
    # 3 (the level-snapshot total), not any single child row's count
    out = run_aggs(docs, {
        "aggs": {"s": {"terms": {"field": "src", "size": 1},
                 "aggs": {"l": {"terms": {"field": "lang", "size": 10},
                          "aggs": {"m": {"sum": {"field": "n"}}}}}}},
    }).collect()
    assert {r.s for r in out} == {"a"}
    assert sorted((r.l, r.doc_count, r.m) for r in out) == [
        ("en", 2, 30), ("fr", 1, 30),
    ]


def test_aggs_query_and_global_metrics(docs):
    out = run_aggs(docs, {
        "query": {"range": {"n": {"gte": 30}}},
        "aggs": {"tot": {"sum": {"field": "n"}},
                 "k": {"cardinality": {"field": "src"}}},
    }).collect()
    assert out == [Row(tot=250, k=3)]


def test_aggs_histogram_densifies_and_date_mdc(spark):
    df = spark.createDataFrame(
        [Row(x=0.5), Row(x=1.5), Row(x=7.5), Row(x=None)]
    )
    out = run_aggs(df, {"aggs": {"h": {"histogram":
        {"field": "x", "interval": 2.0}}}}).orderBy("h").collect()
    assert [(r.h, r.doc_count) for r in out] == [
        (0.0, 2), (2.0, 0), (4.0, 0), (6.0, 1),
    ]
    # min_doc_count=1 elides the gaps instead
    out = run_aggs(df, {"aggs": {"h": {"histogram":
        {"field": "x", "interval": 2.0, "min_doc_count": 1}}}}) \
        .orderBy("h").collect()
    assert [(r.h, r.doc_count) for r in out] == [(0.0, 2), (6.0, 1)]


def test_aggs_range_multi_membership(spark):
    df = spark.createDataFrame([Row(x=5.0), Row(x=15.0), Row(x=None)])
    out = run_aggs(df, {"aggs": {"b": {"range": {"field": "x", "ranges": [
        {"to": 10, "key": "low"},
        {"from": 0, "key": "all_pos"},
    ]}}}}).orderBy("b").collect()
    # x=5 lands in BOTH ranges (ES semantics); NULL in neither
    assert [(r.b, r.doc_count) for r in out] == [
        ("all_pos", 2), ("low", 1),
    ]


def test_aggs_shape_violations_raise(docs):
    with pytest.raises(ValueError, match="sibling bucket"):
        run_aggs(docs, {"aggs": {
            "a": {"terms": {"field": "src"}},
            "b": {"terms": {"field": "lang"}}}})
    with pytest.raises(ValueError, match="parent scope"):
        run_aggs(docs, {"aggs": {
            "a": {"terms": {"field": "src"}},
            "m": {"avg": {"field": "n"}}}})
    with pytest.raises(ValueError, match="unsupported agg type"):
        run_aggs(docs, {"aggs": {"a": {"geo_bounds": {"field": "src"}}}})
    with pytest.raises(ValueError, match="innermost"):
        run_aggs(docs, {"aggs": {"h": {
            "histogram": {"field": "n", "interval": 10},
            "aggs": {"l": {"terms": {"field": "lang"}}}}}})
    with pytest.raises(ValueError, match="unknown keys"):
        run_aggs(docs, {"aggs": {"a": {"terms":
            {"field": "src", "order": {"_key": "asc"}}}}})


# --------------------------------------------------- simple_query_string


@pytest.fixture(scope="module")
def texts(spark):
    return spark.createDataFrame([
        Row(id=1, text="the query plan was fast"),
        Row(id=2, text="merge sort shuffles data"),
        Row(id=3, text="a fast merge with no shuffle keyword, oops shuffle"),
        Row(id=4, text="nothing relevant here"),
        Row(id=5, text=None),
    ])


def test_sqs_or_semantics(texts):
    got = {r.id for r in texts.filter(
        simple_query_string("text", '"query plan" merg* -shuffles')
    ).collect()}
    # 1: phrase; 3: merg* (shuffle != shuffles); 2 excluded by -shuffles
    assert got == {1, 3}


def test_sqs_and_operator_and_fuzzy_degrade(texts):
    got = {r.id for r in texts.filter(
        simple_query_string("text", "fast~2 merge", default_operator="and")
    ).collect()}
    assert got == {3}


def test_sqs_required_overrides_default_or(texts):
    got = {r.id for r in texts.filter(
        simple_query_string("text", "+merge plan")
    ).collect()}
    # merge required; 'plan' optional under OR -> no constraint
    assert got == {2, 3}


def test_sqs_empty_matches_nothing(texts):
    assert texts.filter(simple_query_string("text", "...")).count() == 0
    assert texts.filter(simple_query_string("text", "")).count() == 0


def test_sqs_pure_negative_and_null_field(texts):
    got = {r.id for r in texts.filter(
        simple_query_string("text", "-fast")
    ).collect()}
    # NULL text: must_not coalesces the inner clause to false -> kept
    assert got == {2, 4, 5}


def test_sqs_bad_operator_raises(texts):
    with pytest.raises(ValueError, match="default_operator"):
        simple_query_string("text", "x", default_operator="xor")


# -------------------------------------------------------- triangle_count


def test_triangles_k4(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4), (4, 1), (4, 4), (2, 1)],
        "s int, t int",
    )
    out = {r.node: r.triangles for r in
           triangle_count(e, "s", "t").collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_path_graph_zeroes(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "s int, t int")
    out = {r.node: r.triangles for r in
           triangle_count(e, "s", "t").collect()}
    assert out == {1: 0, 2: 0, 3: 0, 4: 0}


def test_triangles_skewed_hub(spark):
    # star hub 0 -- 1..20 plus one rim edge (1,2): exactly one triangle
    rows = [(0, i) for i in range(1, 21)] + [(1, 2)]
    e = spark.createDataFrame(rows, "s int, t int")
    out = {r.node: r.triangles for r in
           triangle_count(e, "s", "t").collect()}
    assert out[0] == 1 and out[1] == 1 and out[2] == 1
    assert sum(out.values()) == 3


# --------------------------------------------------------- fim_transform


def test_fim_tiles_the_original(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="abcdefghij") for i in range(40)]
    )
    out = fim_transform(df, rate=1.0).collect()
    for r in out:
        assert r.fim
        body = r.fim_text
        pre, rest = body.removeprefix("<|fim_prefix|>").split(
            "<|fim_suffix|>"
        )
        suf, mid = rest.split("<|fim_middle|>")
        assert pre + mid + suf == "abcdefghij"
    # cut points vary with the key
    assert len({r.fim_text for r in out}) > 5


def test_fim_rate_zero_and_null_text(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="hello"), Row(doc_id=2, text=None)]
    )
    out = {r.doc_id: r for r in fim_transform(df, rate=0.0).collect()}
    assert not out[1].fim and out[1].fim_text == "hello"
    assert not out[2].fim and out[2].fim_text is None
    # NULL text never transforms even at rate 1
    out = {r.doc_id: r for r in fim_transform(df, rate=1.0).collect()}
    assert not out[2].fim and out[2].fim_text is None


def test_fim_deterministic_and_rate_bounds(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text="x" * (i + 1)) for i in range(100)]
    )
    a = fim_transform(df, rate=0.5).orderBy("doc_id").collect()
    b = fim_transform(df, rate=0.5).orderBy("doc_id").collect()
    assert [r.fim_text for r in a] == [r.fim_text for r in b]
    picked = sum(r.fim for r in a)
    assert 20 <= picked <= 80
    with pytest.raises(ValueError, match="rate"):
        fim_transform(df, rate=1.5)


# ------------------------------------------------------ batch B: graph 2


from platypus_ingestion_plugins_spark.operators.graph import (  # noqa: E402
    label_propagation,
)
from platypus_ingestion_plugins_spark.functions.text import (  # noqa: E402
    span_corrupt,
)
from platypus_ingestion_plugins_spark.functions.evals import (  # noqa: E402
    psi_report,
)
from platypus_ingestion_plugins_spark.operators.analytics import (  # noqa: E402
    ewma_anomalies,
)


def test_lpa_two_cliques(spark):
    # two triangles bridged by one edge: each clique converges to its
    # own min label; the bridge can't outvote two clique neighbors
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "s int, t int",
    )
    out = {r.node: r.label for r in
           label_propagation(e, "s", "t", rounds=4).collect()}
    assert out[1] == out[2] == out[3] == 1
    # the second clique converges to ITS own label (3 floods across
    # the bridge in round 1 then wins the clique) — distinct from the
    # first community is the invariant
    assert out[4] == out[5] == out[6] == 3
    with pytest.raises(ValueError, match="rounds"):
        label_propagation(e, "s", "t", rounds=0)


def test_lpa_tie_breaks_to_smallest(spark):
    # node 3's neighbors 1 and 2 tie at one vote each -> label 1
    e = spark.createDataFrame([(1, 3), (2, 3)], "s int, t int")
    out = {r.node: r.label for r in
           label_propagation(e, "s", "t", rounds=1).collect()}
    assert out[3] == 1


def test_span_corrupt_renders_sentinels(spark):
    rows = [Row(doc_id=k, text=" ".join(f"w{i}" for i in range(30)))
            for k in range(25)]
    out = span_corrupt(spark.createDataFrame(rows)).collect()
    some = [r for r in out if r.corrupt_target is not None]
    assert some, "1-in-5 of 10 blocks x 25 docs must mask something"
    for r in some:
        assert "<extra_id_0>" in r.corrupt_input
        assert r.corrupt_target.startswith("<extra_id_0> ")
        # masked words appear in the target, not the input
        for tok in r.corrupt_target.split():
            if not tok.startswith("<extra_id_"):
                assert tok not in r.corrupt_input.split()
        # sentinels increment without gaps and match across the pair
        ids = [t for t in r.corrupt_input.split()
               if t.startswith("<extra_id_")]
        assert ids == [f"<extra_id_{i}>" for i in range(len(ids))]
        assert [t for t in r.corrupt_target.split()
                if t.startswith("<extra_id_")] == ids


def test_span_corrupt_reconstructs_original(spark):
    rows = [Row(doc_id=k, text=" ".join(f"w{i}" for i in range(31)))
            for k in range(20)]
    out = span_corrupt(spark.createDataFrame(rows)).collect()
    for r in out:
        # splice targets back into the input -> the original text
        spans = {}
        if r.corrupt_target:
            parts = r.corrupt_target.split("<extra_id_")
            for p in parts[1:]:
                k, rest = p.split(">", 1)
                spans[f"<extra_id_{k}>"] = rest.strip()
        rebuilt = " ".join(
            spans.get(t, t) for t in r.corrupt_input.split()
        )
        # splicing collapses on empty spans; compare token streams
        assert rebuilt.split() == " ".join(
            f"w{i}" for i in range(31)
        ).split()


def test_span_corrupt_null_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None)], "doc_id long, text string"
    )
    r = span_corrupt(df).first()
    assert r.corrupt_input is None and r.corrupt_target is None
    with pytest.raises(ValueError, match="block_tokens"):
        span_corrupt(df, block_tokens=0)
    with pytest.raises(ValueError, match="mask_one_in"):
        span_corrupt(df, mask_one_in=1)


def test_psi_identical_slices_near_zero(spark):
    rows = [Row(s=s, x=float(i % 50)) for s in ("a", "b")
            for i in range(500)]
    out = psi_report(spark.createDataFrame(rows), "x", "s", "a", "b")
    total = abs(sum(r.psi_contrib for r in out.collect()))
    assert total < 0.01


def test_psi_shifted_slice_flags(spark):
    rows = ([Row(s="a", x=float(i % 50)) for i in range(500)]
            + [Row(s="b", x=float(i % 50) + 40.0) for i in range(500)])
    out = psi_report(spark.createDataFrame(rows), "x", "s", "a", "b")
    rows_out = out.collect()
    total = sum(r.psi_contrib for r in rows_out)
    assert total > 0.25
    # proportions each sum to ~1 over realized bins
    assert abs(sum(r.ref_pct for r in rows_out) - 1.0) < 0.05
    with pytest.raises(ValueError, match="bins"):
        psi_report(spark.createDataFrame(rows), "x", "s", "a", "b", bins=1)


def test_ewma_flags_spike_not_baseline(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(30):
        n = 5 if h != 28 else 40  # spike in hour 28
        for _ in range(n):
            rows.append(Row(ts=base + dt.timedelta(hours=h), e="x"))
            eid += 1
    df = spark.createDataFrame(rows)
    out = {r.hour.hour + (r.hour.day - 1) * 24: r
           for r in ewma_anomalies(df, "ts", "e").collect()}
    spike = out[28]
    assert spike.anomaly and spike.ratio > 2.0
    flagged = [k for k, r in out.items() if r.anomaly]
    # hour 29 is the textbook post-spike shadow: the spike inflates
    # the EWMA baseline, so the return to 5/hour reads as an outage
    # (ratio < 1/threshold) — the chart's memory, by design
    assert flagged == [28, 29]
    assert out[29].ratio < 0.5
    # young series (first min_history hours) never alarm
    assert not out[1].anomaly
    with pytest.raises(ValueError, match="alpha"):
        ewma_anomalies(df, "ts", "e", alpha=1.0)


def test_aggs_filter_bucket_narrows_scope(spark):
    df = spark.createDataFrame([
        Row(kind="a", v=1.0), Row(kind="a", v=2.0), Row(kind="b", v=9.0),
    ])
    from platypus_ingestion_plugins_spark.serving.aggs import run_aggs
    out = run_aggs(df, {"aggs": {"only_a": {
        "filter": {"term": {"kind": "a"}},
        "aggs": {"s": {"sum": {"field": "v"}}}}}}).collect()
    assert out == [Row(only_a="only_a", doc_count=2, s=3.0)]


# ------------------------------------------------------ batch C


from platypus_ingestion_plugins_spark.operators.graph import (  # noqa: E402
    k_core,
)
from platypus_ingestion_plugins_spark.functions.text import (  # noqa: E402
    readability_stats,
)


def test_kcore_peels_tail_keeps_clique(spark):
    # triangle {1,2,3} with a pendant chain 3-4-5: 2-core = triangle
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "s int, t int"
    )
    out = {r.node: r.degree for r in
           k_core(e, "s", "t", k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k=3: no 3-core exists -> empty
    assert k_core(e, "s", "t", k=3, rounds=4).count() == 0
    with pytest.raises(ValueError, match="k must"):
        k_core(e, "s", "t", k=0)


def test_kcore_cascade_requires_rounds(spark):
    # a chain peels one node per round from each end; rounds bound it
    chain = [(i, i + 1) for i in range(1, 8)]
    e = spark.createDataFrame(chain, "s int, t int")
    # 2-core of a pure chain is empty, but needs ceil(n/2) peels
    assert k_core(e, "s", "t", k=2, rounds=6).count() == 0


def test_readability_hand_case(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="The cat sat. The dog barked!"),
         Row(doc_id=2, text=None)]
    )
    st = readability_stats("text")
    r = {x.doc_id: x for x in df.select("doc_id", *st.values()).collect()}
    a = r[1]
    assert a.n_words == 6 and a.n_sentences == 2
    # syllables: the(1) cat(1) sat(1) the(1) dog(1) barked(2: a, e) = 7
    assert a.n_syllables == 7
    expect = 206.835 - 1.015 * 6 / 2 - 84.6 * 7 / 6
    assert abs(a.flesch - expect) < 1e-4
    b = r[2]
    assert b.n_words == 0 and b.flesch is None and b.n_sentences == 1


def test_aggs_multi_terms_tuple_key(spark):
    df = spark.createDataFrame([
        Row(a="x", b="1", v=1.0), Row(a="x", b="1", v=3.0),
        Row(a="x", b="2", v=5.0), Row(a=None, b="1", v=7.0),
        Row(a="y", b=None, v=9.0),
    ])
    out = run_aggs(df, {"aggs": {"k": {
        "multi_terms": {"terms": [{"field": "a"}, {"field": "b"}],
                        "size": 1},
        "aggs": {"m": {"avg": {"field": "v"}}}}}}).collect()
    # NULL-bearing rows land in no bucket; top-1 = x|1 (count 2)
    assert out == [Row(k="x|1", doc_count=2, m=2.0)]
    with pytest.raises(ValueError, match="multi_terms"):
        run_aggs(df, {"aggs": {"k": {
            "multi_terms": {"terms": [{"field": "a"}]}}}})


def test_ewma_read_equals_batch_twin(spark, tmp_path):
    import datetime as dt

    from platypus_ingestion_plugins_spark.operators.analytics import (
        ewma_anomalies_read,
        hourly_counts_merge_into,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [Row(ts=base + dt.timedelta(hours=h, minutes=m), e="x")
            for h in range(12) for m in range(0, 60, 7)]
    df = spark.createDataFrame(rows)
    a, b = df.limit(40), df.subtract(df.limit(40))
    state = str(tmp_path / "hourly")
    hourly_counts_merge_into(a, "ts", "e", state, batch_id=0)
    hourly_counts_merge_into(b, "ts", "e", state, batch_id=1)
    # replay batch 1 (at-least-once): must fold to exactly-once
    hourly_counts_merge_into(b, "ts", "e", state, batch_id=1)
    got = sorted(
        ewma_anomalies_read(spark, state).collect(),
        key=lambda r: (r.event_type, r.hour),
    )
    want = sorted(
        ewma_anomalies(df, "ts", "e").collect(),
        key=lambda r: (r.event_type, r.hour),
    )
    assert got == want


# ------------------------------------ review-pass regressions (aggs)


def test_aggs_fractional_interval_densify_keeps_buckets(spark):
    # lo + i*interval drifts a ULP off floor(x/interval)*interval for
    # non-integral intervals; the grid must be built as int*interval
    # or the realized 0.6 bucket silently zeroes out
    df = spark.createDataFrame([Row(x=0.15), Row(x=0.65)])
    out = run_aggs(df, {"aggs": {"h": {"histogram":
        {"field": "x", "interval": 0.1}}}}).orderBy("h").collect()
    assert [r.doc_count for r in out] == [1, 0, 0, 0, 0, 1]
    assert sum(r.doc_count for r in out) == 2


def test_aggs_parent_rank_survives_child_filter(spark):
    # parent A: 101 docs, 1 buy; parent B: 10 docs, 9 buys. ES ranks
    # parents by their TRUE doc_count (A wins), not by the rows that
    # survive the child filter bucket
    rows = ([Row(src="A", kind="buy" if i == 0 else "view")
             for i in range(101)]
            + [Row(src="B", kind="buy" if i else "view")
               for i in range(10)])
    out = run_aggs(spark.createDataFrame(rows), {"aggs": {"top": {
        "terms": {"field": "src", "size": 1},
        "aggs": {"buys": {"filter": {"term": {"kind": "buy"}}}}}}}) \
        .collect()
    assert {r.top for r in out} == {"A"}


def test_aggs_name_collisions_raise(spark, docs):
    with pytest.raises(ValueError, match="duplicate output column"):
        run_aggs(docs, {"aggs": {"by": {"terms": {"field": "src"},
                 "aggs": {"by": {"terms": {"field": "lang"}}}}}})
    with pytest.raises(ValueError, match="shadow input column"):
        run_aggs(docs, {"aggs": {"n": {"terms": {"field": "src"},
                 "aggs": {"m": {"avg": {"field": "n"}}}}}})
    with pytest.raises(ValueError, match="doc_count"):
        run_aggs(docs, {"aggs": {"doc_count": {"terms":
                 {"field": "src"}}}})


def test_aggs_range_default_keys_es_format(spark):
    df = spark.createDataFrame([Row(x=5.0), Row(x=20.0)])
    out = run_aggs(df, {"aggs": {"b": {"range": {"field": "x",
        "ranges": [{"to": 10}, {"from": 10}]}}}}).orderBy("b").collect()
    assert [r.b for r in out] == ["*-10.0", "10.0-*"]


# ------------------------------------------------------ batch D


from platypus_ingestion_plugins_spark.operators.analytics import (  # noqa: E402
    ab_test_cuped,
    srm_check,
)
from platypus_ingestion_plugins_spark.operators.graph import (  # noqa: E402
    pagerank,
)


def test_cuped_reduces_variance_keeps_effect(spark):
    import math

    # y = x + treatment effect + deterministic noise: CUPED must strip
    # the x-driven variance and keep the arm means' gap
    rows = []
    for i in range(400):
        # x independent of the arm (paired) — a confounded fixture
        # would make the RAW lift zero and the test meaningless
        x = float((i // 2) % 20)
        arm = "t" if i % 2 == 0 else "c"
        noise = math.sin(i * 0.7) * 0.1
        y = x + (1.0 if arm == "t" else 0.0) + noise
        rows.append(Row(variant=arm, y=y, x=x))
    out = {r.variant: r for r in ab_test_cuped(
        spark.createDataFrame(rows), "variant", "y", "x").collect()}
    lift_raw = out["t"].mean_raw - out["c"].mean_raw
    lift_adj = out["t"].mean_adj - out["c"].mean_adj
    assert abs(lift_adj - lift_raw) < 0.05
    assert out["t"].var_adj < out["t"].var_raw * 0.05
    assert out["c"].var_adj < out["c"].var_raw * 0.05


def test_cuped_null_covariate_neutral(spark):
    rows = [Row(variant="a", y=float(i), x=None) for i in range(10)]
    out = ab_test_cuped(
        spark.createDataFrame(rows, "variant string, y double, x double"),
        "variant", "y", "x").collect()
    # all-NULL covariate: theta 0, adjusted == raw
    assert out[0].mean_adj == out[0].mean_raw


def test_srm_terms_and_unknown_arm(spark):
    rows = [Row(arm="A")] * 50 + [Row(arm="B")] * 50
    out = {r.variant: r for r in srm_check(
        spark.createDataFrame(rows), "arm",
        {"A": 0.5, "B": 0.5}).collect()}
    assert out["A"].expected_n == 50.0 and out["A"].chi2_term == 0.0
    skew = [Row(arm="A")] * 80 + [Row(arm="B")] * 20
    out = {r.variant: r for r in srm_check(
        spark.createDataFrame(skew), "arm",
        {"A": 0.5, "B": 0.5}).collect()}
    assert out["A"].chi2_term == out["B"].chi2_term == 18.0
    with pytest.raises(ValueError, match="unknown arm"):
        srm_check(spark.createDataFrame([Row(arm="Z")]), "arm",
                  {"A": 1.0})
    with pytest.raises(ValueError, match="non-empty"):
        srm_check(spark.createDataFrame([Row(arm="A")]), "arm", {})
    # review pins: NULL assignments must raise (silently folding them
    # into the total fabricated an unattributable "mismatch"), and a
    # non-positive share must raise (its negative chi term DEFLATES
    # the statistic)
    withnull = spark.createDataFrame(
        [("A",), ("B",), (None,)], "arm string")
    with pytest.raises(ValueError, match="NULL"):
        srm_check(withnull, "arm", {"A": 0.5, "B": 0.5})
    with pytest.raises(ValueError, match="all be > 0"):
        srm_check(spark.createDataFrame([Row(arm="A")]), "arm",
                  {"A": 1.5, "B": -0.5})


def test_aggs_missing_bucket(spark):
    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), (None, 4.0)], "f string, v double"
    )
    out = run_aggs(df, {"aggs": {"gone": {"missing": {"field": "f"},
        "aggs": {"s": {"sum": {"field": "v"}}}}}}).collect()
    assert out == [Row(gone="gone", doc_count=2, s=6.0)]


def test_personalized_pagerank_concentrates_on_seeds(spark):
    # star: hub -> a,b,c; seeding {a} must rank a far above b/c and
    # above the unseeded-run spread
    e = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c"), ("a", "h")],
        "s string, t string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    pr = {r.node: r.rank for r in
          pagerank(e, "s", "t", iterations=8, seeds=seeds).collect()}
    assert pr["a"] > pr["b"] * 2 and pr["b"] == pr["c"]
    assert abs(sum(pr.values()) - 1.0) < 1e-4
    with pytest.raises(ValueError, match="seed"):
        pagerank(e, "s", "t",
                 seeds=spark.createDataFrame([("zz",)], "node string"))


def test_pagerank_default_path_unchanged(spark):
    # seeds=None must produce the exact pre-change ranks (the oracle
    # contract): uniform teleport, dangling redistribution
    e = spark.createDataFrame(
        [("x", "y"), ("y", "z")], "s string, t string"
    )
    a = {r.node: r.rank for r in pagerank(e, "s", "t").collect()}
    b = {r.node: r.rank for r in
         pagerank(e, "s", "t", seeds=None).collect()}
    assert a == b and abs(sum(a.values()) - 1.0) < 1e-4


def test_aggs_pipeline_windows(spark):
    df = spark.createDataFrame(
        [Row(g="a", x=float(v)) for v in [1, 1, 3, 3, 3, 5]]
        + [Row(g="b", x=1.0)]
    )
    out = run_aggs(df, {"aggs": {"g2": {
        "terms": {"field": "g", "size": 10},
        "aggs": {"h": {"histogram": {"field": "x", "interval": 2.0,
                                     "min_doc_count": 1},
                 "aggs": {"cum": {"cumulative_sum":
                                  {"buckets_path": "_count"}},
                          "d": {"derivative": {"buckets_path": "_count"}},
                          "m": {"moving_avg": {"buckets_path": "_count",
                                               "window": 2}}}}}}}}) \
        .orderBy("g2", "h").collect()
    a = [(r.h, r.doc_count, r.cum, r.d, r.m) for r in out if r.g2 == "a"]
    assert a == [(0.0, 2, 2, None, 2.0), (2.0, 3, 5, 1, 2.5),
                 (4.0, 1, 6, -2, 2.0)]
    b = [(r.cum, r.d) for r in out if r.g2 == "b"]
    assert b == [(1, None)]  # derivative NULL restarts per parent


def test_aggs_pipeline_validation(spark):
    df = spark.createDataFrame([Row(g="a", x=1.0)])
    with pytest.raises(ValueError, match="ORDERED"):
        run_aggs(df, {"aggs": {"t": {"terms": {"field": "g"},
                 "aggs": {"c": {"cumulative_sum":
                                {"buckets_path": "_count"}}}}}})
    with pytest.raises(ValueError, match="buckets_path"):
        run_aggs(df, {"aggs": {"h": {
            "histogram": {"field": "x", "interval": 1.0},
            "aggs": {"c": {"cumulative_sum":
                           {"buckets_path": "nope"}}}}}})


def test_aggs_geo_distance_rings(spark):
    # origin (0,0): (0,1)->~111km ring1, (0,40)->~4450km ring2,
    # NULL coord -> no ring
    df = spark.createDataFrame(
        [(0.0, 1.0, 10.0), (0.0, 40.0, 20.0), (None, 1.0, 30.0)],
        "lat double, lon double, v double",
    )
    out = run_aggs(df, {"aggs": {"rings": {
        "geo_distance": {"lat_field": "lat", "lon_field": "lon",
                         "origin": {"lat": 0.0, "lon": 0.0},
                         "ranges": [{"to": 1000}, {"from": 1000}]},
        "aggs": {"m": {"avg": {"field": "v"}}}}}}) \
        .orderBy("rings").collect()
    assert [(r.rings, r.doc_count, r.m) for r in out] == [
        ("*-1000.0", 1, 10.0), ("1000.0-*", 1, 20.0),
    ]
    # a bare array origin is ambiguous (ES [lon, lat] vs hand-written
    # [lat, lon]) and must raise, not guess
    with pytest.raises(ValueError, match="origin"):
        run_aggs(df, {"aggs": {"r": {"geo_distance": {
            "lat_field": "lat", "lon_field": "lon",
            "origin": [0.0, 0.0], "ranges": [{"to": 5}]}}}})


def test_doremi_reweight_step(spark):
    from platypus_ingestion_plugins_spark.functions.sampling import (
        doremi_reweight,
    )

    rows = (
        [Row(d="hard", loss=3.0, ref=1.0)] * 4      # excess 2
        + [Row(d="easy", loss=1.0, ref=2.0)] * 4    # clipped to 0
        + [Row(d="mid", loss=2.0, ref=1.5)] * 2     # excess 0.5
        + [Row(d=None, loss=9.0, ref=0.0)]          # drops
    )
    out = {r.domain: r for r in doremi_reweight(
        spark.createDataFrame(rows), "d", "loss", "ref",
        step_size=1.0).collect()}
    import math

    assert out["easy"].excess == 0.0
    z = math.exp(2.0) + 1.0 + math.exp(0.5)
    assert abs(out["hard"].weight - math.exp(2.0) / z) < 1e-5
    assert abs(out["easy"].weight - 1.0 / z) < 1e-5
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-5
    # a prior shifts mass before the exponential update
    out2 = {r.domain: r for r in doremi_reweight(
        spark.createDataFrame(rows), "d", "loss", "ref", step_size=1.0,
        prior={"hard": 0.8, "easy": 0.1, "mid": 0.1}).collect()}
    assert out2["hard"].weight > out["hard"].weight
    with pytest.raises(ValueError, match="step_size"):
        doremi_reweight(spark.createDataFrame(rows), "d", "loss",
                        "ref", step_size=0)


def test_aggs_pipeline_derivative_skips_gaps(spark):
    # densified grid: the gap bucket's metric is NULL; the derivative
    # of the NEXT real bucket must diff against the last REAL value
    # (ES gap_policy skip), not NULL-poison
    df = spark.createDataFrame(
        [Row(x=0.5, v=10.0), Row(x=0.7, v=20.0), Row(x=4.5, v=50.0)]
    )
    out = run_aggs(df, {"aggs": {"h": {
        "histogram": {"field": "x", "interval": 2.0},
        "aggs": {"s": {"sum": {"field": "v"}},
                 "d": {"derivative": {"buckets_path": "s"}}}}}}) \
        .orderBy("h").collect()
    got = [(r.h, r.doc_count, r.s, r.d) for r in out]
    assert got == [(0.0, 2, 30.0, None), (2.0, 0, None, None),
                   (4.0, 1, 50.0, 20.0)]


def test_doremi_bad_prior_raises(spark):
    from platypus_ingestion_plugins_spark.functions.sampling import (
        doremi_reweight,
    )

    rows = [Row(d="a", loss=1.0, ref=1.0)]
    with pytest.raises(ValueError, match="all be > 0"):
        doremi_reweight(spark.createDataFrame(rows), "d", "loss",
                        "ref", prior={"a": 0.0})


def test_aggs_percentiles_metric(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=float(i)) for i in range(1, 6)]  # 1..5
    )
    out = run_aggs(df, {"aggs": {"g2": {"terms": {"field": "g"},
        "aggs": {"q": {"percentiles": {"field": "v",
                                       "percents": [50, 75]}}}}}}) \
        .collect()
    assert out == [Row(g2="a", doc_count=5, q_p50=3.0, q_p75=4.0)]
    with pytest.raises(ValueError, match="whole numbers"):
        run_aggs(df, {"aggs": {"q": {"percentiles":
                 {"field": "v", "percents": [99.9]}}}})
    with pytest.raises(ValueError, match="percents"):
        run_aggs(df, {"aggs": {"q": {"percentiles":
                 {"field": "v", "percents": []}}}})


def test_aggs_percentiles_approx_mode(spark):
    # the 100 TB escape hatch: bounded-memory sketch, same call shape;
    # on a tiny exact-representable set it agrees with exact
    df = spark.createDataFrame(
        [Row(g="a", v=float(i)) for i in range(1, 6)]
    )
    out = run_aggs(df, {"aggs": {"g2": {"terms": {"field": "g"},
        "aggs": {"q": {"percentiles": {"field": "v", "percents": [50],
                                       "approx": True}}}}}}).collect()
    assert out[0].q_p50 == 3.0


def test_aggs_top_hits_rectangle(spark):
    df = spark.createDataFrame([
        Row(g="a", id=1, v=5.0), Row(g="a", id=2, v=9.0),
        Row(g="a", id=3, v=7.0), Row(g="b", id=4, v=1.0),
    ])
    out = run_aggs(df, {"aggs": {"g2": {"terms": {"field": "g"},
        "aggs": {"top": {"top_hits": {"size": 2,
            "sort": [{"v": "desc"}, {"id": "asc"}],
            "_source": ["id", "v"]}}}}}}) \
        .orderBy("g2", "hit_rank").collect()
    assert [(r.g2, r.hit_rank, r.id) for r in out] == [
        ("a", 1, 2), ("a", 2, 3), ("b", 1, 4),
    ]
    # parent terms size cut applies to the hit rectangle too
    out = run_aggs(df, {"aggs": {"g2": {"terms": {"field": "g",
                                                  "size": 1},
        "aggs": {"top": {"top_hits": {"size": 1,
            "sort": [{"v": "desc"}, {"id": "asc"}],
            "_source": ["id"]}}}}}}).collect()
    assert [(r.g2, r.id) for r in out] == [("a", 2)]
    with pytest.raises(ValueError, match="only agg"):
        run_aggs(df, {"aggs": {"g2": {"terms": {"field": "g"},
            "aggs": {"top": {"top_hits": {"sort": [{"v": "desc"}],
                                          "_source": ["id"]}},
                     "m": {"avg": {"field": "v"}}}}}})
    with pytest.raises(ValueError, match="sort"):
        run_aggs(df, {"aggs": {"top": {"top_hits": {"sort": [],
                                                    "_source": ["id"]}}}})


def test_aggs_pipeline_gap_policy_insert_zeros(spark):
    df = spark.createDataFrame([Row(x=0.5, v=10.0), Row(x=4.5, v=50.0)])
    out = run_aggs(df, {"aggs": {"h": {
        "histogram": {"field": "x", "interval": 2.0},
        "aggs": {"s": {"sum": {"field": "v"}},
                 "d": {"derivative": {"buckets_path": "s",
                                      "gap_policy": "insert_zeros"}}}}}}) \
        .orderBy("h").collect()
    # the gap CONTRIBUTES a zero: -10 into the gap, 50 out of it
    assert [(r.h, r.d) for r in out] == [(0.0, None), (2.0, -10.0),
                                         (4.0, 50.0)]
    with pytest.raises(ValueError, match="gap_policy"):
        run_aggs(df, {"aggs": {"h": {
            "histogram": {"field": "x", "interval": 2.0},
            "aggs": {"d": {"derivative": {"buckets_path": "_count",
                                          "gap_policy": "bogus"}}}}}})


def test_psi_empty_reference_slice_raises(spark):
    # ref slice absent -> NULL percentile cuts would bin every row to
    # garbage; the plan-side guard must fail loudly instead
    rows = [Row(s="b", x=float(i)) for i in range(50)]
    out = psi_report(spark.createDataFrame(rows), "x", "s", "a", "b")
    with pytest.raises(Exception, match="reference slice"):
        out.collect()


def test_fim_and_span_corrupt_reject_non_numeric_key(spark):
    df = spark.createDataFrame(
        [("k1", "some text here")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="numeric"):
        fim_transform(df)
    with pytest.raises(ValueError, match="numeric"):
        span_corrupt(df)


def test_aggs_pipeline_rejects_wide_metric_buckets_path(spark):
    # percentiles materialize as <name>_pNN columns and stats as
    # <name>_* — neither is addressable as a single buckets_path
    # column, so the validation must raise the documented ValueError
    # instead of the later opaque AnalysisException
    df = spark.createDataFrame([Row(g="a", x=1.0)])
    for metric in ({"p": {"percentiles": {"field": "x",
                                          "percents": [50]}}},
                   {"p": {"stats": {"field": "x"}}}):
        with pytest.raises(ValueError, match="buckets_path"):
            run_aggs(df, {"aggs": {"h": {
                "histogram": {"field": "x", "interval": 1.0},
                "aggs": {**metric,
                         "c": {"cumulative_sum":
                               {"buckets_path": "p"}}}}}})
