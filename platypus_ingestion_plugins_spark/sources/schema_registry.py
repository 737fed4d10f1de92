"""Confluent Schema Registry client: fetch-on-miss id->schema resolution.

Closes the last functional gap vs the reference (S1): the reference's
``KafkaAvroDeserializer`` resolves the writer schema for every record
from a live Schema Registry (KafkaIngestor.java:151-157), so schema
evolution mid-stream "just works". ``decode_with_schema_map``
(sources/kafka.py) needs the id->schema map up front and poisons
unknown ids; this module supplies that map dynamically — ids seen in a
micro-batch that are not yet cached are fetched from the registry's
public REST API (``GET {base}/schemas/ids/{id}``) and cached for every
later batch.

Design notes:
  * The fetcher is injectable (``fetcher(schema_id) -> str | None``),
    so unit tests serve schemas from a fixture dict and the HTTP path
    is exercised against a loopback ``http.server`` — no live registry
    needed in the sandbox. A live registry path is env-gated in tests
    the same way as the broker smoke (``SCHEMA_REGISTRY_URL``).
  * Positive results are cached forever: Confluent schema ids are
    immutable (an id always names the same schema), so the cache never
    invalidates — the same contract the reference's
    CachedSchemaRegistryClient relies on.
  * Confirmed-unknown ids (registry answered 404) are negative-cached
    so a poison-heavy topic does not hammer the registry once per
    batch; ``retry_misses()`` clears that set for the rare
    registered-after-first-sight race. Transport errors are NOT
    negative-cached — they are transient, the next batch retries.
  * Scale: resolution happens once per distinct schema id on the
    DRIVER, bounded by the number of live schema versions (small), not
    by batch or corpus size. ``decode_with_registry`` collects the
    distinct ids of a batch with a hard cap to keep the driver action
    bounded even under adversarial (corrupt-header) input.
"""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from collections.abc import Callable, Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def http_fetcher(base_url: str, timeout: float = 5.0) -> Callable[[int], str | None]:
    """Fetcher for the Confluent Schema Registry REST API.

    ``GET {base_url}/schemas/ids/{id}`` -> ``{"schema": "<avro json>"}``.
    Returns the schema JSON string, ``None`` on HTTP 404 (id not
    registered), and raises on transport errors / non-404 statuses so
    the caller can distinguish "confirmed unknown" from "registry
    unreachable".
    """
    base = base_url.rstrip("/")

    def fetch(schema_id: int) -> str | None:
        url = f"{base}/schemas/ids/{int(schema_id)}"
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                body = json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                return None
            raise
        schema = body.get("schema")
        if not isinstance(schema, str):
            raise ValueError(f"registry response for id {schema_id} has no 'schema': {body!r}")
        return schema

    return fetch


class SchemaRegistryClient:
    """id->schema resolver with a permanent positive cache and a
    clearable negative cache. Thread-safe (foreachBatch callbacks can
    run from Spark's streaming thread while tests poke the cache)."""

    def __init__(
        self,
        base_url: str | None = None,
        fetcher: Callable[[int], str | None] | None = None,
        timeout: float = 5.0,
        max_negative_cache: int = 10_000,
    ) -> None:
        if fetcher is None:
            if base_url is None:
                raise ValueError("need base_url or an injected fetcher")
            fetcher = http_fetcher(base_url, timeout=timeout)
        self._fetch = fetcher
        self._cache: dict[int, str] = {}
        # bounded (code-review r10 #8): a corrupt-header topic mints
        # fresh garbage ids every batch — max_distinct_ids caps them
        # PER batch, but an unbounded set would still grow on the
        # driver forever. At the cap the set resets (the 404s those
        # ids would re-trigger are the price of bounded memory).
        self._missing: set[int] = set()
        self._max_negative_cache = max_negative_cache
        self._lock = threading.Lock()
        self.fetch_count = 0  # observability: network round-trips issued

    def prime(self, schemas: dict[int, str]) -> "SchemaRegistryClient":
        """Seed the cache (e.g. from a checkpoint of known schemas)."""
        with self._lock:
            self._cache.update({int(k): v for k, v in schemas.items()})
        return self

    def get(self, schema_id: int) -> str | None:
        """Cached lookup; fetches from the registry on first sight.
        Returns None for confirmed-unknown ids (negative-cached).

        Concurrency: the fetch itself runs OUTSIDE the lock so a slow
        registry never serializes unrelated cache hits — the trade is
        that two threads first-seeing the same id may each issue a
        fetch (idempotent GETs; the cache converges to one entry).
        Within one foreachBatch handler calls are sequential, so the
        one-fetch-per-id discipline the tests assert holds there."""
        schema_id = int(schema_id)
        with self._lock:
            if schema_id in self._cache:
                return self._cache[schema_id]
            if schema_id in self._missing:
                return None
            self.fetch_count += 1  # counted under the lock (r10 #9)
        schema = self._fetch(schema_id)
        with self._lock:
            if schema is None:
                if len(self._missing) >= self._max_negative_cache:
                    self._missing.clear()  # bounded driver memory (r10 #8)
                self._missing.add(schema_id)
            else:
                self._cache[schema_id] = schema
        return schema

    def resolve(self, ids: Iterable[int]) -> dict[int, str]:
        """id->schema map for every resolvable id in ``ids``; ids the
        registry does not know are simply absent (callers poison them)."""
        out: dict[int, str] = {}
        for schema_id in ids:
            if schema_id is None:
                continue
            schema = self.get(schema_id)
            if schema is not None:
                out[int(schema_id)] = schema
        return out

    def retry_misses(self) -> None:
        """Forget confirmed-unknown ids so the next batch re-asks the
        registry (registered-after-first-sight race)."""
        with self._lock:
            self._missing.clear()

    def known_schemas(self) -> dict[int, str]:
        with self._lock:
            return dict(self._cache)


def decode_with_registry(
    raw: DataFrame,
    registry: SchemaRegistryClient,
    decoder: Callable[[Column, str], Column] | None = None,
    value_col: str = "value",
    max_distinct_ids: int = 256,
) -> DataFrame:
    """``decode_with_schema_map`` with registry-backed dynamic schemas.

    Reads the distinct Confluent schema ids present in ``raw`` (one
    driver-side distinct, capped at ``max_distinct_ids`` — bounded by
    live schema versions in healthy topics and by the cap under
    corrupt-header adversarial input), resolves each through the
    registry's fetch-on-miss cache, and dispatches the batch through
    :func:`~platypus_ingestion_plugins_spark.sources.kafka.decode_with_schema_map`.
    Ids past the cap or unknown to the registry come out ``_is_poison``
    exactly like the static-map path.

    Intended use inside ``foreachBatch`` (each micro-batch is bounded):

        def handle(batch, epoch_id):
            decoded = decode_with_registry(batch, registry, decoder)
            ...

    Parity: KafkaIngestor.java:151-157 (per-record registry resolution).
    """
    from platypus_ingestion_plugins_spark.sources.kafka import (
        confluent_schema_id,
        decode_with_schema_map,
    )

    id_rows = (
        raw.select(confluent_schema_id(value_col).alias("_sid"))
        .where(F.col("_sid").isNotNull())
        .distinct()
        .limit(max_distinct_ids)
        .collect()
    )
    schemas = registry.resolve(r["_sid"] for r in id_rows)
    return decode_with_schema_map(raw, schemas, decoder=decoder, value_col=value_col)
