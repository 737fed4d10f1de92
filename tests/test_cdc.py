"""CDC semantics: the reference's 17 row-processor ordering scenarios
(PaimonRowProcessorTest.java:59-368) expressed as final-state
assertions of the last-wins operator, plus the multi-snapshot and
delete E2E goldens (FIXTURES.md F2/F3/F6)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from platypus_ingestion_plugins_spark.operators.cdc import (
    apply_changelog,
    last_wins,
    split_upserts_deletes,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("_row_kind", T.StringType()),
        T.StructField("photo_id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _apply(spark, ops, target=None):
    rows = [Row(_seq=i + 1, _row_kind=k, photo_id=pid, v=v) for i, (k, pid, v) in enumerate(ops)]
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    return apply_changelog(df, "photo_id", target=target)


def _state(df):
    return {r.photo_id: r.v for r in df.collect()}


# scenario -> (ops, expected final {key: value})
SCENARIOS = {
    "insert_only": ([("+I", 100, "a"), ("+I", 101, "b"), ("+I", 102, "c")],
                    {100: "a", 101: "b", 102: "c"}),
    "delete_only": ([("-D", 100, "a"), ("-D", 101, "b"), ("-D", 102, "c")], {}),
    "update_pair_skips_minus_u": ([("-U", 100, "old"), ("+U", 100, "new")], {100: "new"}),
    "delete_then_insert": ([("-D", 100, "x"), ("+I", 100, "y")], {100: "y"}),
    "insert_then_delete": ([("+I", 100, "x"), ("-D", 100, "x")], {}),
    "complex_d_i_u_pair_d": (
        [("-D", 100, "a"), ("+I", 100, "b"), ("-U", 100, "b"), ("+U", 100, "c"), ("-D", 100, "c")],
        {},
    ),
    "alternating_keys": (
        [("+I", 1, "a"), ("-D", 2, "b"), ("+I", 3, "c"), ("-D", 4, "d"), ("+I", 5, "e")],
        {1: "a", 3: "c", 5: "e"},
    ),
    "unknown_kind_skipped": ([("+I", 1, "a"), ("??", 2, "b")], {1: "a"}),
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_scenario_empty_target(spark, name):
    ops, expected = SCENARIOS[name]
    assert _state(_apply(spark, ops)) == expected


def test_delete_applies_to_existing_target(spark):
    target = _apply(spark, [("+I", 100, "a"), ("+I", 200, "keep")])
    out = _apply(spark, [("-D", 100, "a")], target=target)
    assert _state(out) == {200: "keep"}


def test_upsert_replaces_existing_target(spark):
    target = _apply(spark, [("+I", 100, "v1"), ("+I", 200, "keep")])
    out = _apply(spark, [("+U", 100, "v2")], target=target)
    assert _state(out) == {100: "v2", 200: "keep"}


def test_multi_snapshot_ordering_f2(spark):
    """PaimonIngestorE2ETest.java:179-267,459-496: 3 snapshots of
    versioned docs -> final state has user123@v3, user456@v2,
    user789@v1, user999@v1."""
    ops = [
        ("+I", 123, "v1"), ("+I", 456, "v1"), ("+I", 789, "v1"),
        ("+I", 123, "v2"), ("+I", 456, "v2"), ("+I", 999, "v1"),
        ("+I", 123, "v3"),
    ]
    assert _state(_apply(spark, ops)) == {123: "v3", 456: "v2", 789: "v1", 999: "v1"}


def test_insert_delete_insert_f3(spark):
    """PaimonIngestorDeleteE2ETest.java:169-243: +I -> -D -> +I leaves
    exactly the second version."""
    ops = [("+I", 1, "First Version"), ("-D", 1, "First Version"), ("+I", 1, "Second Version")]
    assert _state(_apply(spark, ops)) == {1: "Second Version"}


def test_split_upserts_deletes(spark):
    df = spark.createDataFrame(
        [Row(_seq=1, _row_kind="+I", photo_id=1, v="a"),
         Row(_seq=2, _row_kind="-D", photo_id=2, v="b")],
        CDC_SCHEMA,
    )
    ups, dels = split_upserts_deletes(last_wins(df, "photo_id"))
    assert [r.photo_id for r in ups.collect()] == [1]
    assert [r.photo_id for r in dels.collect()] == [2]
    assert "_row_kind" not in ups.columns


def test_seq_tie_delete_wins(spark):
    df = spark.createDataFrame(
        [Row(_seq=1, _row_kind="+I", photo_id=1, v="a"),
         Row(_seq=1, _row_kind="-D", photo_id=1, v="a")],
        CDC_SCHEMA,
    )
    assert _state(apply_changelog(df, "photo_id")) == {}
