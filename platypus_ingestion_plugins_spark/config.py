"""Config-driven pipeline assembly — the reference's operational
surface on Spark rails.

The reference is not a library its users call; it is a YAML-configured
plugin service (``pluginConfigs.ingestion.kafka`` →
IngestionConfig.java:40-82; the paimon map → PaimonConfig.java:63-92,
key access via utils/ConfigHelper.java's dot-path navigation). This
module accepts the SAME plain config mappings (parse the YAML with any
loader) and assembles the equivalent Spark pipeline, with the
reference's key names, defaults, and required-field validation kept
1:1 so an existing deployment's config carries over unchanged.

Knobs whose mechanism Spark subsumes are still parsed and validated
(so configs round-trip) and recorded on the object, with the Spark
equivalent documented: ``worker.threads`` → executor cores /
``local[N]``; ``queue.capacity`` + ``poll.timeout.ms`` → source-side
backpressure via ``maxFilesPerTrigger`` / trigger cadence;
``checkpoint.timeout.minutes`` → Spark's own streaming commit
protocol; Kafka's ``groupId``/``autoCommitEnabled`` → the streaming
checkpoint owns offsets (the reference also commits only after
durable indexing, KafkaIngestor.java C11 — same semantics, different
bookkeeper).
"""

from __future__ import annotations

from typing import Any, Mapping

_MISSING = object()


def config_get(config: Mapping[str, Any], path: str, default: Any = _MISSING) -> Any:
    """ConfigHelper.navigate parity: resolve ``path`` as a FLAT key
    first (PaimonConfig's own accessors use flat keys that contain
    dots), then as a dot-separated descent through nested maps (the
    ConfigHelper convention). Missing + no default raises the
    reference's error shape."""
    if path in config:
        return config[path]
    node: Any = config
    for part in path.split("."):
        if not isinstance(node, Mapping) or part not in node:
            node = _MISSING
            break
        node = node[part]
    if node is _MISSING:
        if default is _MISSING:
            raise ValueError(f"Required configuration '{path}' is missing")
        return default
    return node


def _get_int(config: Mapping[str, Any], path: str, default: int) -> int:
    """Optional-numeric parity: the reference's getOptionalInt /
    getOptionalLong (PaimonConfig.java) WARN on a malformed value and
    fall back to the default rather than failing the load — a config
    that deploys on the reference must load here too."""
    v = config_get(config, path, default)
    try:
        return int(str(v))
    except (TypeError, ValueError):
        import logging

        logging.getLogger(__name__).warning(
            "Invalid integer value for '%s': %r; using default %d",
            path, v, default,
        )
        return default


def ingestion_config_from(config: Mapping[str, Any]):
    """Entry point for a WHOLE reference-style config document: the
    reference wires its plugins from ``pluginConfigs.ingestion.kafka``
    / ``...ingestion.paimon`` (IngestionConfig.java:41,
    plugin-metadata.yaml); hand the same parsed YAML here and get the
    matching typed config back — the one-call migration path for an
    existing deployment."""
    ing = config_get(config, "pluginConfigs.ingestion", None)
    if isinstance(ing, Mapping):
        if "kafka" in ing:
            return KafkaIngestionConfig(ing["kafka"])
        if "paimon" in ing:
            return PaimonIngestionConfig(ing["paimon"])
    raise ValueError(
        "no ingestion plugin configured under pluginConfigs.ingestion "
        "(expected a 'kafka' or 'paimon' section)"
    )


class KafkaIngestionConfig:
    """IngestionConfig.java parity: same keys, defaults, and
    validation (topic / indexName / bootstrapServers required)."""

    def __init__(self, config: Mapping[str, Any]):
        self.bootstrap_servers = str(
            config_get(config, "bootstrapServers", "localhost:9092")
        )
        self.consumer_group_id = str(
            config_get(config, "groupId", "nrtsearch-kafka-consumer")
        )
        self.topic = config_get(config, "topic", None)
        self.auto_commit_enabled = (
            str(config_get(config, "autoCommitEnabled", False)).lower() == "true"
        )
        self.auto_offset_reset = str(
            config_get(config, "autoOffsetReset", "earliest")
        )
        self.schema_registry_url = config_get(config, "schemaRegistryUrl", None)
        self.index_name = config_get(config, "indexName", None)
        self.auto_register_fields = (
            str(config_get(config, "autoRegisterFields", False)).lower() == "true"
        )
        self.batch_size = _get_int(config, "batchSize", 1000)
        self.validate()

    def validate(self) -> None:
        if not self.topic:
            raise ValueError("Kafka topic is required")
        if not self.index_name:
            raise ValueError("Index name is required")
        if not self.bootstrap_servers:
            raise ValueError("Bootstrap servers are required")

    def build_stream(self, spark, avro_schema_json: str):
        """The configured source: decoded Avro records + ``_is_poison``
        (sources/kafka.kafka_avro_stream), ``batchSize`` →
        maxOffsetsPerTrigger, ``autoOffsetReset`` → startingOffsets.
        Plug into CdcStreamingPipeline's foreachBatch like any decoded
        stream."""
        from platypus_ingestion_plugins_spark.sources.kafka import (
            kafka_avro_stream,
        )

        return kafka_avro_stream(
            spark,
            self.bootstrap_servers,
            self.topic,
            avro_schema_json,
            starting_offsets=self.auto_offset_reset,
            max_records_per_trigger=self.batch_size,
        )


class PaimonIngestionConfig:
    """PaimonConfig.java parity: same keys, defaults, and validation,
    plus the two keys OUR engine genuinely needs that the reference
    derives from its index registry: ``index.key`` (the merge key) and
    optional ``index.buckets`` (hash-bucket count for the serving
    table's partial rewrites)."""

    def __init__(self, config: Mapping[str, Any]):
        self.database_name = str(config_get(config, "database.name"))
        self.table_name = str(config_get(config, "table.name"))
        self.table_path = f"{self.database_name}.{self.table_name}"
        self.target_index_name = str(config_get(config, "target.index.name"))
        self.warehouse_path = str(config_get(config, "warehouse.path"))
        self.worker_threads = _get_int(config, "worker.threads", 4)
        self.batch_size = _get_int(config, "batch.size", 1000)
        self.poll_timeout_ms = _get_int(config, "poll.timeout.ms", 1000)
        self.scan_interval_ms = _get_int(config, "scan.interval.ms", 30000)
        self.queue_capacity = _get_int(config, "queue.capacity", 10000)
        self.checkpoint_timeout_minutes = _get_int(
            config, "checkpoint.timeout.minutes", 10
        )
        self.field_mapping = dict(config_get(config, "field.mapping", {}) or {})
        self.field_drop_prefixes = list(
            config_get(config, "field.drop.prefixes", []) or []
        )
        self.sharding_config = dict(config_get(config, "sharding", {}) or {})
        self.index_key = config_get(config, "index.key", "id")
        self.index_buckets = _get_int(config, "index.buckets", 0)
        # the kafka plugin's autoRegisterFields contract, available on
        # the CDC path too: False makes the registered index schema a
        # contract (unknown batch columns refuse to ingest)
        self.auto_register_fields = (
            str(config_get(config, "index.auto.register.fields", True)).lower()
            == "true"
        )
        self.max_files_per_trigger = _get_int(
            config, "spark.max.files.per.trigger", 10
        )

    def source_path(self) -> str:
        """``warehouse/<db>.db/<table>`` — the Paimon warehouse layout
        the reference's catalog resolves (PaimonIngestor table loading
        via warehouse path + db.table)."""
        return f"{self.warehouse_path}/{self.database_name}.db/{self.table_name}"

    def index_path(self) -> str:
        return f"{self.warehouse_path}/_indexes/{self.target_index_name}"

    def build_transform(self):
        """The configured per-batch projection chain, in the
        reference's order: field renames (P1), prefix drops (P2), then
        the sharding partition filter (P6/D1-D5) — each a no-op when
        unconfigured."""
        from platypus_ingestion_plugins_spark.operators.projection import (
            drop_by_prefix,
            rename_fields,
        )
        from platypus_ingestion_plugins_spark.operators.sharding import (
            sharding_strategy,
        )

        shard = None
        if self.sharding_config:
            cfg = self.sharding_config
            shard = sharding_strategy(
                str(config_get(cfg, "strategy", "none")),
                partition_field=config_get(cfg, "partition.field", None),
                service_name=config_get(cfg, "service.name", None),
                shard_id=config_get(cfg, "shard.id", None),
                max_shards=config_get(cfg, "max.shards", None),
                regions=config_get(cfg, "regions", None),
            )

        def transform(df):
            if self.field_mapping:
                df = rename_fields(df, self.field_mapping)
            if self.field_drop_prefixes:
                df = drop_by_prefix(df, self.field_drop_prefixes)
            if shard is not None:
                df = shard.apply(df)
            return df

        return transform

    def build_pipeline(
        self,
        spark,
        source_schema,
        checkpoint_path: str | None = None,
        dlq_path: str | None = None,
    ):
        """The assembled, runnable unit the reference's plugin startup
        produces: CDC source scan → configured projections/sharding →
        last-wins merge into the target serving table, checkpointed.
        ``run_available()`` it for a drain, ``start()`` for continuous
        ingestion (scan cadence ≈ ``scan.interval.ms``)."""
        from platypus_ingestion_plugins_spark.serving.table import ServingTable
        from platypus_ingestion_plugins_spark.streaming.pipeline import (
            CdcStreamingPipeline,
        )

        serving = ServingTable(
            spark,
            self.index_path(),
            key=self.index_key,
            num_buckets=self.index_buckets,
            auto_register_fields=self.auto_register_fields,
        )
        return CdcStreamingPipeline(
            spark,
            self.source_path(),
            source_schema,
            serving,
            checkpoint_path or f"{self.warehouse_path}/_checkpoints/"
            f"{self.target_index_name}",
            max_files_per_trigger=self.max_files_per_trigger,
            dlq_path=dlq_path,
            transform=self.build_transform(),
        )
