"""Units for the r15 tail batch: the ES aggregations-DSL executor
(``serving/aggs.run_aggs``), ``simple_query_string``, per-node
triangle counting, and the FIM pretraining transform."""

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
    # src counts over realized (src, lang) buckets: a=3, b=1 (NULL lang
    # elides), c=1 -> top-2 parents = a, then b (count tie 1v1 broken
    # by key asc). within a: en(2) beats fr(1); within b: en.
    assert [(r.s, r.l, r.doc_count, r.m) for r in out] == [
        ("a", "en", 2, 15.0),
        ("b", "en", 1, 40.0),
    ]


def test_aggs_parent_rank_uses_total_count(docs):
    # parent 'a' has 3 docs split 2+1 across langs -> its rank must use
    # 3 (the window SUM), not any single child row's count
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
