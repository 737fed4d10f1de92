"""Kafka Avro streaming source (reference S1, KafkaIngestor.java:145-249).

The reference runs one consumer per partition with manual assignment,
<=1000 records/poll, earliest/latest reset, Schema-Registry Avro
decode, and commits offsets only after the batch is durably indexed.

Spark-first mapping:
  consumer-per-partition + poll loop  -> spark.readStream.format("kafka")
  MAX_POLL_RECORDS=1000               -> maxOffsetsPerTrigger
  auto.offset.reset                   -> startingOffsets
  KafkaAvroDeserializer               -> from_avro(value, schema) after
                                         stripping the 5-byte Confluent
                                         wire-format header (magic byte +
                                         4-byte schema id)
  commitSync after index              -> checkpointed offsets advance only
                                         after foreachBatch success (C11)
  non-Avro record skip (P5)           -> PERMISSIVE from_avro -> null
                                         parse -> DLQ filter (C14)

This container has no Kafka broker and no spark-avro jar, so the
builder is import/config-gated: it constructs the full streaming plan
when the integration is available and raises a clear error otherwise.
The record-decode shape (header strip + permissive parse + DLQ split)
is pure DataFrame logic, testable without a broker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CONFLUENT_HEADER_BYTES = 5  # magic byte + schema-id int32


def strip_confluent_header(value_col: Column | str) -> Column:
    """Drop the Confluent wire-format prefix from a binary value column."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.substring(c, CONFLUENT_HEADER_BYTES + 1, F.length(c) - CONFLUENT_HEADER_BYTES)


def confluent_schema_id(value_col: Column | str) -> Column:
    """Big-endian int32 schema id from bytes 2-5 of the wire format —
    the same id the reference's KafkaAvroDeserializer resolves against
    the Schema Registry per record (KafkaIngestor.java:151-157)."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.conv(F.hex(F.substring(c, 2, 4)), 16, 10).cast("int")


def decode_avro_stream(raw: DataFrame, avro_schema_json: str, value_col: str = "value") -> DataFrame:
    """PERMISSIVE Avro decode: bad records become null structs routed to
    a quarantine column instead of failing the stream (reference skips
    them with a warning, KafkaIngestor.java:192-195; we keep them for a
    dead-letter sink — the reference's own TODO, paimon-plugin/TODO.md:5).
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("spark-avro not on the classpath; add the "
                           "org.apache.spark:spark-avro package") from exc
    payload = strip_confluent_header(value_col)
    parsed = from_avro(payload, avro_schema_json, {"mode": "PERMISSIVE"})
    return (
        raw.withColumn("parsed", parsed)
        .withColumn("_is_poison", F.col("parsed").isNull())
    )


def _avro_decoder(payload: Column, schema_json: str) -> Column:
    from pyspark.sql.avro.functions import from_avro

    return from_avro(payload, schema_json, {"mode": "PERMISSIVE"})


def decode_with_schema_map(
    raw: DataFrame,
    schemas: dict[int, str],
    decoder: Callable[[Column, str], Column] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Per-record schema resolution for an evolving topic.

    The reference resolves the Avro schema per record from the registry
    (KafkaIngestor.java:151-157); a single fixed reader schema is wrong
    once the topic has evolved. Here each record is routed by the
    schema id in its wire-format header (parsed BEFORE the header is
    stripped), decoded with that id's registered schema, and the
    per-schema results are unified by field name — fields missing from
    older versions come back NULL, the standard
    backward-compatible-evolution contract. Records with an unknown id
    are poison (``_is_poison``), mirroring the unknown-record skip
    (KafkaIngestor.java:192-195) but preserved for the DLQ.

    ``decoder(payload, schema_json) -> struct Column`` defaults to
    spark-avro's from_avro; injectable so the dispatch plumbing is
    testable without the Avro package on the classpath.

    Scale note: this plans one pass over the micro-batch per distinct
    registered schema id (k passes for k live versions — k is small).
    Inside foreachBatch, cache the batch first so the passes share one
    source read.

    For a LIVE registry (ids not known up front, schema evolution
    mid-stream), use
    :func:`~platypus_ingestion_plugins_spark.sources.schema_registry.decode_with_registry`,
    which resolves the batch's ids fetch-on-miss through a cached
    SchemaRegistryClient and then delegates here.
    """
    decoder = decoder or _avro_decoder
    tagged = raw.withColumn("_schema_id", confluent_schema_id(value_col)).withColumn(
        "_payload", strip_confluent_header(value_col)
    )
    base_cols = [c for c in tagged.columns if c != "_payload"]
    if not schemas:
        # registry knows no schemas: every record is undecodable — the
        # degenerate case of registry-driven dispatch is all-poison,
        # not an IndexError
        return tagged.select(*base_cols).withColumn("_is_poison", F.lit(True))
    parts = []
    for schema_id, schema_json in schemas.items():
        part = tagged.filter(F.col("_schema_id") == F.lit(schema_id)).withColumn(
            "parsed", decoder(F.col("_payload"), schema_json)
        )
        # a PERMISSIVE decode failure yields a null struct -> poison
        part = part.withColumn("_is_poison", F.col("parsed").isNull())
        parts.append(part.select(*base_cols, "_is_poison", "parsed.*"))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part, allowMissingColumns=True)
    unknown = tagged.filter(
        ~F.col("_schema_id").isin(list(schemas)) | F.col("_schema_id").isNull()
    ).select(*base_cols)
    return out.unionByName(
        unknown.withColumn("_is_poison", F.lit(True)), allowMissingColumns=True
    )


def kafka_avro_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    avro_schema_json: str,
    starting_offsets: str = "earliest",
    max_records_per_trigger: int = 1000,
) -> DataFrame:
    """Streaming DataFrame of decoded Avro records (+ _is_poison flag).

    maxOffsetsPerTrigger=1000 mirrors the reference's MAX_POLL_RECORDS
    (KafkaIngestor.java:29); Spark assigns partitions to tasks, giving
    the per-partition parallelism the reference lists as a TODO
    (KafkaIngestPlugin.java:40-43).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("maxOffsetsPerTrigger", max_records_per_trigger)
        .option("failOnDataLoss", "false")
        .load()
    )
    return decode_avro_stream(raw, avro_schema_json)
