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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONFLUENT_HEADER_BYTES = 5  # magic byte + schema-id int32


def strip_confluent_header(value_col) -> "F.Column":
    """Drop the Confluent wire-format prefix from a binary value column."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.expr(f"substring({value_col}, {CONFLUENT_HEADER_BYTES + 1}, "
                  f"length({value_col}) - {CONFLUENT_HEADER_BYTES})")


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
