"""Streaming CDC pipeline: file-source stream -> foreachBatch merge ->
serving table, with checkpointed resume, DLQ split, and retry policy."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from platypus_ingestion_plugins_spark.serving.table import ServingTable
from platypus_ingestion_plugins_spark.sources.cdc_table import (
    latest_snapshot_id,
    read_cdc_incremental,
    write_cdc_snapshot,
)
from platypus_ingestion_plugins_spark.streaming.pipeline import (
    CdcStreamingPipeline,
    RetryPolicy,
)

CDC_SCHEMA = T.StructType(
    [
        T.StructField("_seq", T.LongType()),
        T.StructField("_row_kind", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)


def _rows(*ops):
    return [Row(_seq=s, _row_kind=k, id=i, title=t) for s, k, i, t in ops]


def test_streaming_cdc_end_to_end(spark, tmp_path):
    src = str(tmp_path / "cdc_src")
    serving = ServingTable(spark, str(tmp_path / "serving"), key="id")
    pipe = CdcStreamingPipeline(
        spark, src, CDC_SCHEMA, serving, str(tmp_path / "ckpt"),
        dlq_path=str(tmp_path / "dlq"),
    )

    spark.createDataFrame(
        _rows((1, "+I", "a", "v1"), (2, "+I", "b", "v1")), CDC_SCHEMA
    ).write.mode("append").parquet(src)
    pipe.run_available()
    assert {r.id: r.title for r in serving.query().collect()} == {"a": "v1", "b": "v1"}

    # second drop: update a, delete b — checkpoint resumes past batch 1
    spark.createDataFrame(
        _rows((3, "+U", "a", "v2"), (4, "-D", "b", "v1")), CDC_SCHEMA
    ).write.mode("append").parquet(src)
    pipe.run_available()
    assert {r.id: r.title for r in serving.query().collect()} == {"a": "v2"}

    # replaying with a fresh checkpoint is idempotent (at-least-once safe)
    pipe2 = CdcStreamingPipeline(
        spark, src, CDC_SCHEMA, serving, str(tmp_path / "ckpt2")
    )
    pipe2.run_available()
    assert {r.id: r.title for r in serving.query().collect()} == {"a": "v2"}


def test_streaming_dlq_split(spark, tmp_path):
    schema = T.StructType(
        CDC_SCHEMA.fields + [T.StructField("_is_poison", T.BooleanType())]
    )
    src = str(tmp_path / "src")
    dlq = str(tmp_path / "dlq")
    serving = ServingTable(spark, str(tmp_path / "serving"), key="id")
    rows = [
        Row(_seq=1, _row_kind="+I", id="ok", title="good", _is_poison=False),
        Row(_seq=2, _row_kind="+I", id="bad", title=None, _is_poison=True),
    ]
    spark.createDataFrame(rows, schema).write.parquet(src)
    pipe = CdcStreamingPipeline(spark, src, schema, serving, str(tmp_path / "ckpt"), dlq_path=dlq)
    pipe.run_available()
    assert [r.id for r in serving.query().collect()] == ["ok"]
    assert [r.id for r in spark.read.parquet(dlq).collect()] == ["bad"]


def test_pipeline_decode_transform_single_scan(spark, tmp_path):
    """The full wire path: Confluent binary frames streamed from a file
    source, decoded per-batch by the schema-map dispatch (pure-Python
    Avro fallback), poison to the DLQ, good rows merged. The pipeline
    caches the raw batch so the k per-schema decode passes + DLQ split
    + merge share one source scan."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        confluent_frame,
        python_avro_decoder,
    )
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    v1 = {
        "type": "record",
        "name": "Cdc",
        "fields": [
            {"name": "_seq", "type": "long"},
            {"name": "_row_kind", "type": "string"},
            {"name": "id", "type": "string"},
            {"name": "title", "type": "string"},
        ],
    }
    frames = [
        Row(value=bytearray(confluent_frame(
            {"_seq": 1, "_row_kind": "+I", "id": "a", "title": "v1"}, v1, 1))),
        Row(value=bytearray(confluent_frame(
            {"_seq": 2, "_row_kind": "+I", "id": "b", "title": "v1"}, v1, 1))),
        Row(value=bytearray(b"\x00\x00\x00\x00\x63junk")),  # unknown id 99
    ]
    raw_schema = T.StructType([T.StructField("value", T.BinaryType())])
    src, dlq = str(tmp_path / "src"), str(tmp_path / "dlq")
    spark.createDataFrame(frames, raw_schema).write.parquet(src)

    # earlier tests in the shared session may hold not-yet-GC'd
    # localCheckpoint blocks; assert the PIPELINE adds nothing
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    seen_cached = []

    def transform(batch_df):
        seen_cached.append(batch_df.storageLevel.useMemory)
        return decode_with_schema_map(
            batch_df, {1: _json.dumps(v1)}, decoder=python_avro_decoder
        ).drop("value")

    serving = ServingTable(spark, str(tmp_path / "serving"), key="id", num_buckets=4)
    pipe = CdcStreamingPipeline(
        spark, src, raw_schema, serving, str(tmp_path / "ckpt"),
        dlq_path=dlq, transform=transform,
    )
    pipe.run_available()
    assert {r.id: r.title for r in serving.query().collect()} == {"a": "v1", "b": "v1"}
    assert spark.read.parquet(dlq).count() == 1  # the unknown-id frame
    # the raw batch really was cached while the passes ran
    assert seen_cached == [True]
    # and the pipeline leaves nothing persisted after the batch completes
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before


def test_retry_policy_bounded():
    calls = []

    def fail_twice():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("index does not exist yet")
        return "ok"

    assert RetryPolicy(max_retries=3, initial_delay_s=0.01).run(fail_twice) == "ok"
    assert len(calls) == 3

    with pytest.raises(RuntimeError):
        RetryPolicy(max_retries=1, initial_delay_s=0.01).run(lambda: (_ for _ in ()).throw(RuntimeError("x")))


def test_incremental_snapshot_reads(spark, tmp_path):
    path = str(tmp_path / "cdc_table")
    df1 = spark.createDataFrame(_rows((1, "+I", "a", "v1")), CDC_SCHEMA)
    df2 = spark.createDataFrame(_rows((2, "+I", "a", "v2")), CDC_SCHEMA)
    write_cdc_snapshot(df1, path, snapshot_id=1)
    write_cdc_snapshot(df2, path, snapshot_id=2)

    assert latest_snapshot_id(spark, path) == 2
    inc = read_cdc_incremental(spark, path, last_snapshot=1)
    assert [r.title for r in inc.collect()] == ["v2"]
    # partition pruning: only the _snapshot=2 directory is scanned
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "_snapshot" in plan


def _wire(schema_id: int, payload: bytes) -> bytearray:
    return bytearray(b"\x00" + schema_id.to_bytes(4, "big") + payload)


def test_confluent_header_strip(spark):
    from platypus_ingestion_plugins_spark.sources.kafka import strip_confluent_header

    df = spark.createDataFrame([Row(value=_wire(1, b"payload"))])
    out = df.select(strip_confluent_header("value").alias("p")).collect()[0]
    assert bytes(out.p) == b"payload"
    # a Column argument (not a name) must behave identically
    out2 = df.select(strip_confluent_header(F.col("value")).alias("p")).collect()[0]
    assert bytes(out2.p) == b"payload"


def test_confluent_schema_id(spark):
    from platypus_ingestion_plugins_spark.sources.kafka import confluent_schema_id

    df = spark.createDataFrame(
        [Row(value=_wire(7, b"x")), Row(value=_wire(70000, b"y"))]
    )
    assert [r.sid for r in df.select(confluent_schema_id("value").alias("sid")).collect()] == [7, 70000]


def test_schema_map_dispatch(spark):
    """Per-record schema resolution: two wire-format versions of the
    same subject decode with their own schemas and unify by name
    (KafkaIngestor.java:151-157 registry-per-record equivalence).
    The decoder is a JSON stand-in for from_avro (no Avro jar in the
    sandbox); the dispatch plumbing under test is identical."""
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    def json_decoder(payload, schema_ddl):
        return F.from_json(payload.cast("string"), schema_ddl)

    rows = [
        Row(value=_wire(1, b'{"id": "a", "title": "t1"}')),
        Row(value=_wire(2, b'{"id": "b", "title": "t2", "lang": "en"}')),
        Row(value=_wire(99, b'{"id": "zzz"}')),  # unregistered id -> poison
    ]
    df = spark.createDataFrame(rows)
    out = decode_with_schema_map(
        df,
        {1: "id string, title string", 2: "id string, title string, lang string"},
        decoder=json_decoder,
    )
    by_id = {r.id: r for r in out.filter(~F.col("_is_poison")).collect()}
    assert by_id["a"].title == "t1" and by_id["a"].lang is None  # evolved field NULL
    assert by_id["b"].lang == "en"
    poison = out.filter(F.col("_is_poison")).collect()
    assert len(poison) == 1 and poison[0]._schema_id == 99


def test_confluent_wire_fixture_replay(spark, tmp_path):
    """Record-and-replay closure of the S1 seam (VERDICT r8 task #4):
    CHECKED-IN Confluent wire-format frames (magic byte + big-endian
    schema id + Avro binary — the layout a real
    KafkaAvroSerializer-producing topic carries, frozen in
    tests/fixtures/ so a decoder regression is caught against recorded
    bytes, not bytes the current encoder just minted) are replayed
    through the STREAMING decode path: a file source stands in for the
    Kafka source (same `value binary` column), decode_with_schema_map
    dispatches per-record on the header schema id across two evolved
    schema versions, the garbage-payload frame and the
    unknown-schema-id frame come out poison. This is the
    KafkaIngestorE2ETest.java:300-494 flow with only the live socket
    gated (tests/test_kafka_broker.py)."""
    import base64
    import json as _json
    import os

    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        python_avro_decoder,
    )
    from platypus_ingestion_plugins_spark.sources.kafka import (
        decode_with_schema_map,
    )

    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "confluent_wire_fixture.jsonl")
    lines = [_json.loads(l) for l in open(fix)]
    schemas = {int(k): _json.dumps(v) for k, v in lines[0]["schemas"].items()}
    frames = [(base64.b64decode(l["frame_b64"]),) for l in lines[1:]]
    expected = [l["expect"] for l in lines[1:]]

    # "topic log" on disk: replay the recorded frames via a streaming
    # file source carrying the same value:binary column Kafka would
    topic_dir = str(tmp_path / "topic")
    spark.createDataFrame(frames, "value binary").coalesce(1).write.parquet(topic_dir)
    raw = (
        spark.readStream.schema("value binary")
        .parquet(topic_dir)
    )
    decoded = decode_with_schema_map(raw, schemas, decoder=python_avro_decoder)
    got_batches = []
    q = (
        decoded.writeStream.outputMode("append")
        .foreachBatch(lambda b, _e: got_batches.append(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = [r for b in got_batches for r in b]
    assert len(rows) == len(frames)
    good = {r.id: r for r in rows if not r._is_poison}
    want_good = [e for e in expected if e is not None]
    assert len(good) == len(want_good) == 20
    for e in want_good:
        r = good[e["id"]]
        assert r.title == e["title"]
        # evolution: v1 records surface the v2-only field as NULL
        assert (r.score == e["score"]) if "score" in e else (r.score is None)
    poison_ids = sorted(r._schema_id for r in rows if r._is_poison)
    assert poison_ids == [7, 42]  # garbage payload; unregistered id


AVRO_V1 = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
    ],
}
AVRO_V2 = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "title", "type": "string"},
        {"name": "lang", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ],
}


def test_avro_binary_roundtrip_unit():
    """Pure-Python Avro binary encode/decode against the spec's wire
    examples: zigzag varints, LE doubles, length-prefixed strings."""
    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        decode_record,
        encode_record,
    )

    # spec examples: 1 -> 0x02, -1 -> 0x01, 64 -> 0x80 0x01
    assert encode_record({"id": 1, "title": ""}, AVRO_V1)[:1] == b"\x02"
    assert encode_record({"id": -1, "title": ""}, AVRO_V1)[:1] == b"\x01"
    assert encode_record({"id": 64, "title": ""}, AVRO_V1)[:2] == b"\x80\x01"
    rec = {"id": 123456789, "title": "héllo", "lang": None, "score": -2.5}
    assert decode_record(encode_record(rec, AVRO_V2), AVRO_V2) == rec
    rec2 = dict(rec, lang="en")
    assert decode_record(encode_record(rec2, AVRO_V2), AVRO_V2) == rec2


def test_avro_fallback_decoder_end_to_end(spark):
    """The wire-format -> typed-record path WITHOUT spark-avro: real
    Confluent frames (magic + schema id + Avro binary) decoded by the
    pure-Python fallback through the same schema-map dispatch, evolved
    fields unified by name, corrupt payloads and unknown ids poisoned."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        confluent_frame,
        python_avro_decoder,
    )
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    rows = [
        Row(value=bytearray(confluent_frame({"id": 1, "title": "t1"}, AVRO_V1, 1))),
        Row(
            value=bytearray(
                confluent_frame(
                    {"id": 2, "title": "t2", "lang": "en", "score": 0.5}, AVRO_V2, 2
                )
            )
        ),
        Row(value=bytearray(_wire(1, b"\xff\xff\xff\xff\xff\xff"))),  # corrupt varint
        Row(value=bytearray(_wire(99, b"\x02"))),  # unregistered id
    ]
    df = spark.createDataFrame(rows)
    out = decode_with_schema_map(
        df,
        {1: _json.dumps(AVRO_V1), 2: _json.dumps(AVRO_V2)},
        decoder=python_avro_decoder,
    )
    good = {r.id: r for r in out.filter(~F.col("_is_poison")).collect()}
    assert good[1].title == "t1" and good[1].lang is None and good[1].score is None
    assert good[2].lang == "en" and good[2].score == 0.5
    poison_ids = sorted(r._schema_id for r in out.filter(F.col("_is_poison")).collect())
    assert poison_ids == [1, 99]  # corrupt payload AND unknown id -> DLQ


def test_schema_map_empty_registry_all_poison(spark):
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    df = spark.createDataFrame([Row(value=_wire(1, b"x")), Row(value=_wire(2, b"y"))])
    out = decode_with_schema_map(df, {})
    rows = out.collect()
    assert len(rows) == 2 and all(r._is_poison for r in rows)


def test_jsonl_source_quarantines_poison_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from platypus_ingestion_plugins_spark.sources.jsonl import read_jsonl

    p = tmp_path / "drop.jsonl"
    p.write_text(
        '{"id": 1, "text": "ok one"}\n'
        '{"id": 2, "text": "ok two"}\n'
        "{broken json!!\n"
        '{"id": "not-a-number", "text": 3}\n'
        '{"id": 3, "text": "ok three"}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    good, dlq = read_jsonl(spark, str(p), schema)
    assert {r.id for r in good.collect()} == {1, 2, 3}
    bad = {r.raw_line for r in dlq.collect()}
    assert len(bad) == 2
    assert any(b.startswith("{broken") for b in bad)  # syntactically invalid
    assert any("not-a-number" in b for b in bad)  # schema-invalid


# ---------------------------------------------------------------------------
# Avro full-lattice goldens, ported from AvroToAddDocumentConverterTest.java
# (:28-57 primitives, :60-84 logical types, :87-117 nullable unions,
#  :120-143 arrays, :146-166 nested records, :169-197 arrays of records,
#  :200-209 Utf8) and the E2E fixture schema (KafkaIngestorE2ETest.java:78-100)
# ---------------------------------------------------------------------------

AVRO_FULL = {
    "type": "record",
    "name": "Full",
    "fields": [
        {"name": "stringField", "type": "string"},
        {"name": "intField", "type": "int"},
        {"name": "longField", "type": "long"},
        {"name": "floatField", "type": "float"},
        {"name": "doubleField", "type": "double"},
        {"name": "booleanField", "type": "boolean"},
        {"name": "dateField", "type": {"type": "int", "logicalType": "date"}},
        {
            "name": "timestampField",
            "type": {"type": "long", "logicalType": "timestamp-millis"},
        },
        {"name": "nullableString", "type": ["null", "string"]},
        {"name": "nullableInt", "type": ["null", "int"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {
            "name": "attrs",
            "type": {"type": "map", "values": "long"},
        },
        {
            "name": "color",
            "type": {"type": "enum", "name": "Color", "symbols": ["RED", "GREEN"]},
        },
        {"name": "fp", "type": {"type": "fixed", "name": "FP", "size": 4}},
        {
            "name": "metadata",
            "type": {
                "type": "record",
                "name": "Meta",
                "fields": [
                    {"name": "author", "type": "string"},
                    {"name": "publishDate", "type": "string"},
                ],
            },
        },
        {
            "name": "children",
            "type": {
                "type": "array",
                "items": {
                    "type": "record",
                    "name": "Child",
                    "fields": [{"name": "name", "type": "string"}],
                },
            },
        },
    ],
}

FULL_REC = {
    "stringField": "hello",
    "intField": 42,
    "longField": 123456789,
    "floatField": 3.5,
    "doubleField": 2.718,
    "booleanField": True,
    "dateField": 19723,  # 2024-01-01 as epoch days — int passthrough
    "timestampField": 1704110400000,  # 2024-01-01T12:00:00Z epoch ms
    "nullableString": "nullable",
    "nullableInt": 99,
    "tags": ["tag1", "tag2", "tag3"],
    "attrs": {"views": 7, "likes": 3},
    "color": "GREEN",
    "fp": b"\x01\x02\x03\x04",
    "metadata": {"author": "Alice Smith", "publishDate": "2024-01-15"},
    "children": [{"name": "Alice"}, {"name": "Bob"}],
}


def test_avro_full_lattice_roundtrip_unit():
    """Binary encode -> decode over the whole reference lattice:
    nested records, arrays (incl. of records), maps, enums, fixed,
    logical types as raw int/long, nullable unions."""
    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        decode_record,
        encode_record,
    )

    got = decode_record(encode_record(FULL_REC, AVRO_FULL), AVRO_FULL)
    expected = dict(FULL_REC, fp="01020304")  # fixed decodes to hex
    assert got == expected
    # null branches of the unions
    rec2 = dict(FULL_REC, nullableString=None, nullableInt=None)
    got2 = decode_record(encode_record(rec2, AVRO_FULL), AVRO_FULL)
    assert got2["nullableString"] is None and got2["nullableInt"] is None
    # empty array / empty map encode as a bare 0-block
    rec3 = dict(FULL_REC, tags=[], attrs={}, children=[])
    got3 = decode_record(encode_record(rec3, AVRO_FULL), AVRO_FULL)
    assert got3["tags"] == [] and got3["attrs"] == {} and got3["children"] == []


def test_avro_nested_decode_and_flatten_end_to_end(spark):
    """The Done-criterion path: an E2E-fixture-shaped nested record
    (KafkaIngestorE2ETest.java:78-100, :300-349) travels wire-format ->
    decode_with_schema_map (pure-Python decoder) -> flatten_structs,
    yielding the flattened metadata_author/metadata_publishDate columns
    the reference registers (:246-260)."""
    import json as _json

    from platypus_ingestion_plugins_spark.functions.converters import flatten_structs
    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        confluent_frame,
        python_avro_decoder,
    )
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    doc_schema = {
        "type": "record",
        "name": "Document",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "title", "type": "string"},
            {"name": "content", "type": "string"},
            {"name": "category", "type": "string"},
            {"name": "rating", "type": "double"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {
                "name": "metadata",
                "type": {
                    "type": "record",
                    "name": "Metadata",
                    "fields": [
                        {"name": "author", "type": "string"},
                        {"name": "publishDate", "type": "string"},
                    ],
                },
            },
        ],
    }
    docs = [
        {
            "id": "doc1",
            "title": "Machine Learning Basics",
            "content": "Introduction to neural networks and deep learning concepts",
            "category": "technology",
            "rating": 4.5,
            "tags": ["ml", "ai", "tutorial"],
            "metadata": {"author": "Alice Smith", "publishDate": "2024-01-15"},
        },
        {
            "id": "doc2",
            "title": "Cooking Pasta Perfectly",
            "content": "Tips and tricks for making restaurant-quality pasta at home",
            "category": "cooking",
            "rating": 4.8,
            "tags": ["food", "recipe", "italian"],
            "metadata": {"author": "Chef Mario", "publishDate": "2024-01-20"},
        },
    ]
    rows = [Row(value=bytearray(confluent_frame(d, doc_schema, 7))) for d in docs]
    rows.append(Row(value=bytearray(_wire(7, b"\xff\xff\xff\xff\xff\xff"))))  # poison
    df = spark.createDataFrame(rows)
    out = decode_with_schema_map(
        df, {7: _json.dumps(doc_schema)}, decoder=python_avro_decoder
    )
    good = out.filter(~F.col("_is_poison")).drop("value", "_schema_id", "_is_poison")
    assert good.schema["metadata"].dataType.typeName() == "struct"
    flat = flatten_structs(good)
    got = {r.id: r for r in flat.collect()}
    assert set(flat.columns) >= {"metadata_author", "metadata_publishDate", "tags"}
    assert got["doc1"].metadata_author == "Alice Smith"
    assert got["doc1"].metadata_publishDate == "2024-01-15"
    assert got["doc2"].metadata_author == "Chef Mario"
    assert list(got["doc2"].tags) == ["food", "recipe", "italian"]
    assert got["doc1"].rating == 4.5
    assert out.filter(F.col("_is_poison")).count() == 1


def test_avro_full_lattice_through_spark_decoder(spark):
    """python_avro_decoder must surface the full lattice as typed Spark
    columns: array<struct> children, map attrs, enum/fixed strings,
    logical-type ints untouched."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        confluent_frame,
        python_avro_decoder,
    )
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    df = spark.createDataFrame(
        [Row(value=bytearray(confluent_frame(FULL_REC, AVRO_FULL, 3)))]
    )
    out = decode_with_schema_map(
        df, {3: _json.dumps(AVRO_FULL)}, decoder=python_avro_decoder
    )
    r = out.filter(~F.col("_is_poison")).collect()[0]
    assert r.stringField == "hello" and r.intField == 42
    assert r.dateField == 19723 and r.timestampField == 1704110400000
    assert r.nullableString == "nullable" and r.nullableInt == 99
    assert list(r.tags) == ["tag1", "tag2", "tag3"]
    assert dict(r.attrs) == {"views": 7, "likes": 3}
    assert r.color == "GREEN" and r.fp == "01020304"
    assert r.metadata.author == "Alice Smith"
    assert [c.name for c in r.children] == ["Alice", "Bob"]
    dt = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert dt["children"] == "array<struct<name:string>>"
    assert dt["attrs"] == "map<string,bigint>"
    assert dt["dateField"] == "int" and dt["timestampField"] == "bigint"


def test_avro_roundtrip_property():
    """Property: decode(encode(r)) == r for arbitrary records over the
    non-float lattice (floats live in the golden tests — binary32
    re-rounding makes exact equality the wrong property there)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        decode_record,
        encode_record,
    )

    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": ["null", "long"]},
            {"name": "b", "type": "boolean"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "N",
                    "fields": [
                        {"name": "x", "type": "long"},
                        {"name": "ys", "type": {"type": "array", "items": "int"}},
                    ],
                },
            },
        ],
    }
    i32 = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    recs = st.fixed_dictionaries(
        {
            "s": st.text(max_size=40),
            "i": i32,
            "l": st.none() | i64,
            "b": st.booleans(),
            "tags": st.lists(st.text(max_size=10), max_size=5),
            "m": st.dictionaries(st.text(max_size=8), i64, max_size=4),
            "nested": st.fixed_dictionaries(
                {"x": i64, "ys": st.lists(i32, max_size=6)}
            ),
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(recs)
    def roundtrip(rec):
        assert decode_record(encode_record(rec, schema), schema) == rec

    roundtrip()


def test_schema_evolution_mid_stream(spark, tmp_path):
    """Registry-per-record parity with KafkaIngestor.java:151-157: the
    schema registry gains a NEW schema id BETWEEN micro-batches of one
    continuously-running query, and decode_with_schema_map picks it up
    without a restart. Batch 1 carries v1 frames (id 1); then v2 — a
    backward-compatible evolution adding a nullable ``lang`` — is
    registered as id 2 and batch 2 carries v2 frames. Both decode,
    zero poison, and the serving table evolves its schema in place."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_decode import (
        confluent_frame,
        python_avro_decoder,
    )
    from platypus_ingestion_plugins_spark.sources.kafka import decode_with_schema_map

    base_fields = [
        {"name": "_seq", "type": "long"},
        {"name": "_row_kind", "type": "string"},
        {"name": "id", "type": "string"},
        {"name": "title", "type": "string"},
    ]
    v1 = {"type": "record", "name": "Cdc", "fields": base_fields}
    v2 = {
        "type": "record",
        "name": "Cdc",
        "fields": base_fields
        + [{"name": "lang", "type": ["null", "string"], "default": None}],
    }

    registry = {1: _json.dumps(v1)}  # live registry, mutated mid-stream

    def transform(batch_df):
        # snapshot the CURRENT registry at each micro-batch, the way a
        # real registry client resolves ids per record
        return decode_with_schema_map(
            batch_df, dict(registry), decoder=python_avro_decoder
        ).drop("value")

    raw_schema = T.StructType([T.StructField("value", T.BinaryType())])
    src, dlq = str(tmp_path / "src"), str(tmp_path / "dlq")
    serving = ServingTable(spark, str(tmp_path / "serving"), key="id", num_buckets=4)
    pipe = CdcStreamingPipeline(
        spark, src, raw_schema, serving, str(tmp_path / "ckpt"),
        dlq_path=dlq, transform=transform,
    )

    def frames(rows, schema, schema_id):
        return [
            Row(value=bytearray(confluent_frame(r, schema, schema_id)))
            for r in rows
        ]

    b1 = frames(
        [
            {"_seq": 1, "_row_kind": "+I", "id": "a", "title": "v1a"},
            {"_seq": 2, "_row_kind": "+I", "id": "b", "title": "v1b"},
        ],
        v1, 1,
    )
    spark.createDataFrame(b1, raw_schema).write.parquet(src)

    q = pipe.start(trigger={"processingTime": "1 second"})
    try:
        q.processAllAvailable()
        assert {r.id: r.title for r in serving.query().collect()} == {
            "a": "v1a", "b": "v1b",
        }

        # --- evolution happens while the query keeps running ---
        registry[2] = _json.dumps(v2)
        b2 = frames(
            [
                {"_seq": 3, "_row_kind": "+U", "id": "a",
                 "title": "v2a", "lang": "en"},
                {"_seq": 4, "_row_kind": "+I", "id": "c",
                 "title": "v2c", "lang": "de"},
            ],
            v2, 2,
        )
        spark.createDataFrame(b2, raw_schema).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    rows = {r.id: r for r in serving.query().collect()}
    assert rows["a"].title == "v2a" and rows["a"].lang == "en"  # upsert on v2
    assert rows["c"].title == "v2c" and rows["c"].lang == "de"  # insert on v2
    assert rows["b"].title == "v1b" and rows["b"].lang is None  # v1 row evolved
    # zero poison in either epoch
    assert (
        spark.read.option("basePath", dlq).parquet(dlq)
        .filter(F.col("_is_poison")).count() == 0
    )


def test_avro_ocf_roundtrip_and_spark_read(spark, tmp_path):
    """Object-container-file source: records encoded into OCF bytes
    (null and deflate codecs), written as .avro files, read back typed
    through the binaryFile + mapInPandas path — schema sniffed from
    the first file's header, multi-file parallel, nested fields
    surfaced as struct columns."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        parse_ocf,
        read_avro_ocf,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "title", "type": "string"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {
                "name": "meta",
                "type": {
                    "type": "record",
                    "name": "Meta",
                    "fields": [{"name": "lang", "type": "string"}],
                },
            },
        ],
    }
    recs = [
        {"id": i, "title": f"t{i}", "tags": [f"a{i}", "b"], "meta": {"lang": "en"}}
        for i in range(10)
    ]
    # pure round trip, both codecs
    for codec in ("null", "deflate"):
        got_schema, got = parse_ocf(write_ocf(recs, schema, codec))
        assert got == recs and got_schema == schema

    d = tmp_path / "avro"
    d.mkdir()
    (d / "part-0.avro").write_bytes(write_ocf(recs[:6], schema, "null"))
    (d / "part-1.avro").write_bytes(write_ocf(recs[6:], schema, "deflate"))
    (d / "ignore.txt").write_bytes(b"not avro")  # pathGlobFilter skips

    df = read_avro_ocf(spark, str(d))  # schema sniffed from header
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 10
    assert rows[3].title == "t3" and rows[3].tags == ["a3", "b"]
    assert rows[9].meta.lang == "en"

    # explicit reader schema takes the sniff out of the path
    df2 = read_avro_ocf(spark, str(d), schema_json=_json.dumps(schema))
    assert df2.count() == 10


def test_avro_ocf_block_split_reads(spark, tmp_path):
    """Block-split OCF reading (VERDICT r7 #2): a multi-block file is
    decoded by MANY byte-range tasks — each resynchronizes on the sync
    marker and owns exactly the blocks whose preceding sync starts in
    its range — and the result is identical to the whole-file parse
    for every split size, including splits that slice mid-block,
    mid-header, and mid-sync. One record embeds the sync byte pattern
    INSIDE string data to prove the scan's framing validation rejects
    false resync points instead of double-decoding."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        _SYNC,
        parse_ocf,
        read_avro_ocf,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "Doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    evil = _SYNC.decode("utf-8")  # bytes 0..15 are valid 1-byte UTF-8
    recs = [
        {"id": i, "s": (evil if i % 7 == 3 else f"text-{i}") * 3}
        for i in range(200)
    ]
    d = tmp_path / "avro"
    d.mkdir()
    for codec in ("null", "deflate"):
        blob = write_ocf(recs, schema, codec, records_per_block=17)
        (d / f"part-{codec}.avro").write_bytes(blob)
        # sanity: the fixture really is multi-block and the evil bytes
        # really do appear inside block data
        assert blob.count(_SYNC) >= 200 // 17 + 1
        got_schema, got = parse_ocf(blob)
        assert got == recs

    expect = sorted(
        (r["id"], r["s"]) for r in recs
    ) * 2  # both codec files hold the same records
    expect.sort()
    file_size = len((d / "part-null.avro").read_bytes())
    for split in (64, 257, 1000, file_size * 2):
        df = read_avro_ocf(spark, str(d), split_size=split)
        got = sorted((r.id, r.s) for r in df.collect())
        assert got == expect, f"split_size={split}: {len(got)} rows"
    # the small split genuinely fans one file into many range tasks
    assert file_size // 257 >= 10

    # explicit reader schema path too
    assert (
        read_avro_ocf(
            spark, str(d), schema_json=_json.dumps(schema), split_size=509
        ).count()
        == 400
    )


def test_avro_ocf_property_roundtrip():
    """Property test: OCF write -> parse round-trips arbitrary record
    batches bit-exactly under both codecs, including multi-byte UTF-8
    strings and empty batches."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        parse_ocf,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "v", "type": ["null", "double"]},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
        ],
    }
    i64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    recs = st.lists(
        st.fixed_dictionaries(
            {
                "i": i64,
                "s": st.text(max_size=30),
                "v": st.none() | st.floats(allow_nan=False),
                "tags": st.lists(st.text(max_size=8), max_size=4),
            }
        ),
        max_size=8,
    )

    @settings(max_examples=100, deadline=None)
    @given(recs, st.sampled_from(["null", "deflate"]))
    def roundtrip(rs, codec):
        got_schema, got = parse_ocf(write_ocf(rs, schema, codec))
        assert got == rs and got_schema == schema

    roundtrip()


def test_stream_avro_ocf_file_drops(spark, tmp_path):
    """Streaming OCF ingestion: files dropped into the directory are
    decoded in the micro-batch that discovers them — two drops, two
    availableNow drains, all rows typed in the sink."""
    import json as _json

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        stream_avro_ocf,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "Ev",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "kind", "type": "string"},
        ],
    }
    src = tmp_path / "drop"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_avro_ocf(spark, str(src), _json.dumps(schema))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    (src / "a.avro").write_bytes(
        write_ocf([{"id": 1, "kind": "x"}, {"id": 2, "kind": "y"}], schema)
    )
    drain()
    (src / "b.avro").write_bytes(
        write_ocf([{"id": 3, "kind": "z"}], schema, codec="deflate")
    )
    drain()
    rows = {(r.id, r.kind) for r in spark.read.parquet(out).collect()}
    assert rows == {(1, "x"), (2, "y"), (3, "z")}


def test_avro_ocf_corrupt_first_block_raises(tmp_path):
    """A corrupt FIRST block sits at an exact chain position (the
    header's own sync), so its decode failure is provably corruption —
    the range scan must raise, not resync past it and silently drop
    the block's records (ADVICE r8). Mid-data framing coincidences
    (the evil-bytes fixture above) still skip-and-scan."""
    import pyarrow.fs as pafs
    import pytest as _pytest

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        _SYNC,
        _decode_block_range,
        _sniff_header,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    recs = [{"i": i, "s": f"row-{i}" * 8} for i in range(50)]
    blob = write_ocf(recs, schema, "deflate", records_per_block=10)
    p = tmp_path / "corrupt.avro"
    p.write_bytes(blob)
    fs = pafs.LocalFileSystem()
    _, _, sync, body_off = _sniff_header(fs, str(p))
    # flip payload bytes INSIDE the first block (past the two varints,
    # before the trailing sync): framing still validates, the deflate
    # stream does not — exactly the corrupt-not-coincidence case
    mut = bytearray(blob)
    for off in range(body_off + 8, body_off + 16):
        mut[off] ^= 0xFF
    p.write_bytes(bytes(mut))
    with _pytest.raises(ValueError, match="corrupt first OCF block"):
        _decode_block_range(fs, str(p), 0, len(mut))
    # FRAMING corruption of the first block (varint header smashed, not
    # the payload) must raise the same way, not resync past the block
    # (code-review r9)
    mut2 = bytearray(blob)
    mut2[body_off] = 0xFF  # record-count varint becomes a huge/invalid value
    mut2[body_off + 1] = 0xFF
    p2 = tmp_path / "corrupt_framing.avro"
    p2.write_bytes(bytes(mut2))
    with _pytest.raises(ValueError, match="corrupt first OCF block"):
        _decode_block_range(fs, str(p2), 0, len(mut2))
    # a header-only zero-block file is NOT corruption: frames nothing,
    # returns no records
    from platypus_ingestion_plugins_spark.sources.avro_ocf import write_ocf as _w

    empty = _w([], schema, "null", records_per_block=10)
    p3 = tmp_path / "empty.avro"
    p3.write_bytes(empty)
    assert _decode_block_range(fs, str(p3), 0, len(empty)) == []


def test_avro_ocf_block_range_ownership_property(tmp_path):
    """Property (pure Python, no Spark): for ANY block layout and ANY
    partition of the file into byte ranges, the ranges' decodes
    concatenate to exactly the whole-file record sequence — every
    block owned by exactly one range, none lost, none doubled. This
    is the invariant the distributed reader rests on; the Spark test
    above exercises it through mapInPandas at fixed split sizes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        _SYNC,
        _decode_block_range,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    evil = _SYNC.decode("utf-8")

    @settings(max_examples=40, deadline=None)
    @given(
        n_records=st.integers(min_value=0, max_value=60),
        per_block=st.integers(min_value=1, max_value=9),
        codec=st.sampled_from(["null", "deflate"]),
        cuts=st.lists(st.integers(min_value=1, max_value=5000), max_size=6),
        evil_every=st.integers(min_value=2, max_value=9),
    )
    def check(n_records, per_block, codec, cuts, evil_every):
        import pyarrow.fs as pafs

        recs = [
            {"i": i, "s": (evil * 2 if i % evil_every == 0 else f"row-{i}")}
            for i in range(n_records)
        ]
        blob = write_ocf(recs, schema, codec, records_per_block=per_block)
        p = tmp_path / "prop.avro"
        p.write_bytes(blob)
        fs = pafs.LocalFileSystem()
        size = len(blob)
        bounds = sorted({min(c, size) for c in cuts} | {0, size})
        got = []
        for s, e in zip(bounds, bounds[1:]):
            got.extend(_decode_block_range(fs, str(p), s, e))
        assert got == recs, (n_records, per_block, codec, bounds)

    check()


def test_export_avro_ocf_distributed_roundtrip(spark, tmp_path):
    """NEW r11: the DISTRIBUTED OCF writer (one streamed shard file
    per task, deterministic shuffle order) closes the export matrix.
    Round trip through the block-split reader, byte-determinism across
    reruns, nested/array/null lattice, deflate blocks, and the
    .inprogress temp contract (no readable half-files)."""
    import hashlib
    import os

    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        export_avro_ocf,
        read_avro_ocf,
        spark_schema_to_avro,
    )

    rows = [
        Row(_seq=i, name=f"n{i}" if i % 3 else None,
            vec=[float(i), i + 0.5], meta=Row(k=f"k{i}", n=i))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "ocf")
    manifest = export_avro_ocf(
        df, out, "_seq", n_shards=4, codec="deflate", records_per_block=5
    )
    assert sorted(m.shard for m in manifest) == list(range(4))
    assert sum(m.n_records for m in manifest) == 30
    # no temp files left behind; exactly the manifest's files exist
    names = sorted(os.listdir(out))
    assert names == [f"part-{i:05d}.avro" for i in range(4)]
    back = read_avro_ocf(spark, out)
    got = sorted(
        (r._seq, r.name, tuple(r.vec), r.meta.k, r.meta.n)
        for r in back.collect()
    )
    want = sorted(
        (r._seq, r.name, tuple(r.vec), r.meta.k, r.meta.n) for r in rows
    )
    assert got == want
    # rerun -> byte-identical shards (fixed sync marker, deterministic
    # permutation order)
    h1 = {n: hashlib.sha256(open(f"{out}/{n}", "rb").read()).hexdigest() for n in names}
    export_avro_ocf(
        df, out, "_seq", n_shards=4, codec="deflate", records_per_block=5
    )
    h2 = {n: hashlib.sha256(open(f"{out}/{n}", "rb").read()).hexdigest() for n in names}
    assert h1 == h2
    # unsupported types fail loudly with a cast hint
    import pytest as _pytest

    ts = spark.sql("SELECT current_timestamp() AS t, 1 AS k")
    with _pytest.raises(ValueError, match="cast"):
        spark_schema_to_avro(ts.schema)


def test_export_avro_ocf_generation_and_precision(spark, tmp_path):
    """r11 review #1/#2/#6: (a) a NULLABLE long column keeps exact
    values above 2^53 — the Arrow writer must never route ints
    through pandas float64; (b) re-exporting with FEWER shards sweeps
    the previous generation's leftover parts, so the reader sees
    exactly one generation; (c) a raised export sentinel makes the
    reader refuse instead of serving a mixed directory."""
    import os

    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        export_avro_ocf,
        read_avro_ocf,
    )

    big = (1 << 60) + 1  # not representable in float64
    rows = [
        Row(doc_id=i, val=(big + i) if i % 3 else None) for i in range(24)
    ]
    df = spark.createDataFrame(rows, "doc_id long, val long")
    out = str(tmp_path / "ocf")
    export_avro_ocf(df, out, "doc_id", n_shards=6)
    got = {r.doc_id: r.val for r in read_avro_ocf(spark, out).collect()}
    assert got == {r.doc_id: r.val for r in rows}  # exact, incl. None

    # narrower re-export: old part-00004/5 must not survive to mix
    # generations into the read
    sub = df.filter("doc_id < 12")
    export_avro_ocf(sub, out, "doc_id", n_shards=2)
    assert sorted(os.listdir(out)) == [
        "part-00000.avro", "part-00001.avro"
    ]
    got2 = {r.doc_id: r.val for r in read_avro_ocf(spark, out).collect()}
    assert got2 == {r.doc_id: r.val for r in rows if r.doc_id < 12}

    # a raised sentinel (mid-write or crashed export) blocks reads
    sent = os.path.join(out, ".ocf_export_in_progress-deadbeef")
    with open(sent, "w") as f:
        f.write("deadbeef")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="in-progress"):
        read_avro_ocf(spark, out)
    os.remove(sent)
    # ...and the next export's sweep clears it once stale
    old = os.path.join(out, ".ocf_export_in_progress-stale000")
    with open(old, "w") as f:
        f.write("stale000")
    past = 1_000_000_000  # epoch 2001 — ancient mtime
    os.utime(old, (past, past))
    export_avro_ocf(sub, out, "doc_id", n_shards=2)
    assert not os.path.exists(old)
    assert read_avro_ocf(spark, out).count() == 12


def test_profile_merge_into_accumulates_and_replays(spark, tmp_path):
    """NEW r11: the streaming datasheet. Two epochs must accumulate to
    the one-shot batch numbers (counts exact; sample and KMV states
    merge to the one-shot sketch); replaying an epoch with the same
    batch_id must change NOTHING (epoch-pinned commit)."""
    from platypus_ingestion_plugins_spark.operators.profile import (
        corpus_profile,
        profile_merge_into,
        profile_read,
    )

    rows = [
        Row(doc_id=i,
            src=None if i % 10 == 9 else f"s{i % 3}",
            text=("word " * (5 + i % 7)).strip())
        for i in range(60)
    ]  # every 10th doc has a NULL slice key — must survive to the read
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")
    lo, hi = df.filter("doc_id < 30"), df.filter("doc_id >= 30")
    state = str(tmp_path / "prof")
    profile_merge_into(lo, "text", "doc_id", "src", state, k=64, batch_id=0)
    profile_merge_into(hi, "text", "doc_id", "src", state, k=64, batch_id=1)
    got = {r.src: r for r in profile_read(spark, state, "src").collect()}
    want = {r.src: r for r in corpus_profile(df, "text", by="src").collect()}
    assert set(got) == set(want)
    for s in want:
        assert (got[s].n_docs, got[s].n_tokens, got[s].n_chars) == (
            want[s].n_docs, want[s].n_tokens, want[s].n_chars)
        # k=64 >= slice size here, so the "sample" is the whole slice
        # and the quantile estimate must be EXACT
        assert got[s].chars_p50 == want[s].chars_p50
        # KMV estimate within the m=64 envelope of the exact count
        assert abs(got[s].est_distinct_texts - want[s].n_distinct_texts) \
            <= max(3, 0.5 * want[s].n_distinct_texts)
    # replay epoch 1 -> nothing changes
    profile_merge_into(hi, "text", "doc_id", "src", state, k=64, batch_id=1)
    again = {r.src: r for r in profile_read(spark, state, "src").collect()}
    for s in want:
        assert (again[s].n_docs, again[s].n_tokens) == (
            got[s].n_docs, got[s].n_tokens)
        assert again[s].est_distinct_texts == got[s].est_distinct_texts


def test_stats_listener_failing_then_recovering_stream(spark, tmp_path):
    """Observability parity (PaimonIngestor.java:619-646,779-798 and
    the queue/error/lag metric TODO, paimon-plugin/TODO.md:6): a sink
    that fails once then recovers is retried to success; the stats
    object counts every failed attempt, the registered listener
    captures per-batch rows + docs/sec + trigger times, and the
    rolling summary reports both."""
    import time as _time

    from platypus_ingestion_plugins_spark.streaming.pipeline import (
        ThroughputListener,
    )

    stats = ThroughputListener(summary_interval_s=3600.0)
    spark.streams.addListener(stats)
    try:
        src = str(tmp_path / "cdc_src")
        serving = ServingTable(spark, str(tmp_path / "serving"), key="id")
        pipe = CdcStreamingPipeline(
            spark,
            src,
            CDC_SCHEMA,
            serving,
            str(tmp_path / "ckpt"),
            retry=RetryPolicy(max_retries=3, initial_delay_s=0.01),
            stats=stats,
        )
        calls = {"n": 0}
        orig = serving.apply_batch

        def flaky(df):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("transient sink outage")
            return orig(df)

        serving.apply_batch = flaky
        spark.createDataFrame(
            _rows((1, "+I", "a", "v1"), (2, "+I", "b", "v1")), CDC_SCHEMA
        ).write.mode("append").parquet(src)
        pipe.run_available()

        # the failed attempt was counted AND the stream converged
        assert stats.errors == 1
        assert "transient sink outage" in stats.error_log[0][1]
        assert {r.id: r.title for r in serving.query().collect()} == {
            "a": "v1",
            "b": "v1",
        }
        # listener progress events are delivered asynchronously
        deadline = _time.time() + 30
        while not stats.progress and _time.time() < deadline:
            _time.sleep(0.2)
        assert stats.progress, "no progress events delivered"
        batch = next(r for r in stats.progress if r["rows"] == 2)
        assert batch["trigger_ms"] is not None and batch["trigger_ms"] >= 0
        assert batch["rows_behind"] == {}  # file source reports no backlog
        s = stats.summary(window_s=3600.0)
        assert s["rows"] >= 2 and s["n_batches"] >= 1
        assert s["errors"] == 1 and s["total_errors"] == 1
        assert s["docs_per_sec"] > 0
    finally:
        spark.streams.removeListener(stats)


def test_stats_listener_rolling_summary_clock():
    """summary()/maybe_emit() under an injected clock: the window
    excludes old batches and errors, and emission honors the
    interval — no sleeping, pure arithmetic."""
    from platypus_ingestion_plugins_spark.streaming.pipeline import (
        ThroughputListener,
    )

    now = {"t": 1000.0}
    st = ThroughputListener(summary_interval_s=300.0, clock=lambda: now["t"])
    # two old batches + one old error, outside the 300 s window later
    st.progress.append(
        {"t": 1000.0, "batch_id": 0, "rows": 50, "rows_per_sec": 10.0,
         "trigger_ms": 5000, "rows_behind": {"maxOffsetsBehindLatest": 9.0}}
    )
    st.record_error(RuntimeError("old"))
    assert st.maybe_emit() is None  # interval not yet elapsed
    now["t"] = 1400.0
    st.progress.append(
        {"t": 1390.0, "batch_id": 1, "rows": 100, "rows_per_sec": 20.0,
         "trigger_ms": 2000, "rows_behind": {"maxOffsetsBehindLatest": 3.0}}
    )
    st.record_error(RuntimeError("fresh"))
    s = st.summary()
    assert s["n_batches"] == 1 and s["rows"] == 100
    assert s["errors"] == 1 and s["total_errors"] == 2
    assert s["max_rows_behind"] == 3.0
    assert s["docs_per_sec"] == 50.0  # 100 rows / 2 s trigger time
    emitted = st.maybe_emit()
    assert emitted is not None and st.summaries == [emitted]
    assert st.maybe_emit() is None  # once per interval
