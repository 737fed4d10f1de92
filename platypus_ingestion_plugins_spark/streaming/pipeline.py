"""Structured-Streaming CDC ingestion pipeline.

The reference's coordinator/worker machinery (SURVEY §2.3) dissolves
into the Spark runtime:

  coordinator scan loop (30 s)        -> trigger(processingTime=...)
  bounded work queue + backpressure   -> maxFilesPerTrigger
  InFlightBatch all-buckets barrier   -> micro-batch completion barrier
  checkpoint only after full success  -> streaming checkpointLocation
  per-bucket single-thread ordering   -> last-wins reduction per batch
  unbounded worker retry w/ backoff   -> RetryPolicy around foreachBatch
  poison-pill skip                    -> DLQ split before the merge
  docs/sec stats                      -> ThroughputListener

The sink is the idempotent ServingTable merge, so at-least-once
redelivery after a failed checkpoint converges (effectively-once).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

from platypus_ingestion_plugins_spark.serving.table import ServingTable


@dataclass(frozen=True)
class RetryPolicy:
    """Bounded (Kafka path: 3 x 5 s, KafkaIngestor.java:33-34) or
    unbounded exponential (Paimon path: 100 ms -> x2 -> cap 60 s,
    PaimonIngestor.java:427,486) retry around the sink body."""

    max_retries: int | None = 3  # None = unbounded
    initial_delay_s: float = 0.1
    backoff: float = 2.0
    max_delay_s: float = 60.0

    def run(self, fn):
        attempt, delay = 0, self.initial_delay_s
        while True:
            try:
                return fn()
            except Exception:
                attempt += 1
                if self.max_retries is not None and attempt > self.max_retries:
                    raise
                time.sleep(delay)
                delay = min(delay * self.backoff, self.max_delay_s)


class ThroughputListener(StreamingQueryListener):
    """docs/sec per batch (reference stats wrapper,
    PaimonIngestor.java:619-646)."""

    def __init__(self):
        self.batches: list[tuple[int, float]] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.batches.append((p.numInputRows, p.processedRowsPerSecond or 0.0))

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


class CdcStreamingPipeline:
    """File-source CDC stream -> last-wins merge into a ServingTable.

    Reads a CDC-convention parquet directory as a stream (the S2
    incremental scan; a Kafka+Avro source from sources/kafka.py plugs
    into the same foreachBatch sink).
    """

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        source_schema,
        serving: ServingTable,
        checkpoint_path: str,
        key: str | list[str] | None = None,
        max_files_per_trigger: int = 10,
        dlq_path: str | None = None,
        poison_col: str = "_is_poison",
        retry: RetryPolicy | None = None,
        transform=None,
    ):
        self.spark = spark
        self.source_path = source_path
        self.source_schema = source_schema
        self.serving = serving
        self.checkpoint_path = checkpoint_path
        # the merge key IS the serving table's key; a differing caller
        # key would be silently ignored, so mismatches fail loudly
        self.key = [key] if isinstance(key, str) else list(key) if key else serving.key
        if list(self.key) != list(serving.key):
            raise ValueError(
                f"pipeline key {self.key} != serving table key {serving.key}"
            )
        self.max_files_per_trigger = max_files_per_trigger
        self.dlq_path = dlq_path
        self.poison_col = poison_col
        self.retry = retry or RetryPolicy()
        self.transform = transform  # per-batch DataFrame -> DataFrame (e.g. decode)
        self.query = None

    def _apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # One batch fans into several actions: k per-schema decode passes
        # (decode_with_schema_map plans one per registered schema), the
        # DLQ split, bucket discovery, the commit-log row count, and the
        # merge write. Cache the raw batch so they all share ONE source
        # scan, and the transformed frame so the decode UDF runs once —
        # then drop both so executor storage doesn't accumulate across
        # micro-batches of a long-lived stream.
        raw = batch_df
        raw.persist()
        try:
            df = self.transform(raw) if self.transform is not None else raw
            cached = df if df is not raw else None
            if cached is not None:
                cached.persist()
            try:
                if self.poison_col in df.columns:
                    if self.dlq_path:
                        # per-epoch dir + overwrite makes the DLQ write
                        # replay-idempotent: a redelivered micro-batch
                        # overwrites ITS OWN quarantine records instead
                        # of appending duplicates.
                        # BREAKING vs the pre-r6 flat-append layout: a
                        # DLQ dir holding flat parquet files AND
                        # epoch=N subdirs fails partition discovery —
                        # point dlq_path at a fresh dir, and read with
                        # spark.read.option("basePath", dlq_path)
                        # .parquet(dlq_path) so epoch stays a column.
                        poison = df.filter(F.col(self.poison_col))
                        poison.write.mode("overwrite").parquet(
                            f"{self.dlq_path}/epoch={epoch_id}"
                        )
                    df = df.filter(~F.col(self.poison_col)).drop(self.poison_col)
                self.retry.run(lambda: self.serving.apply_batch(df))
            finally:
                if cached is not None:
                    cached.unpersist()
        finally:
            raw.unpersist()

    def start(self, trigger: dict | None = None):
        """trigger: e.g. {"processingTime": "5 seconds"} (the reference's
        flush cadence, PaimonRowProcessor.java:48) or
        {"availableNow": True} for drain-and-stop."""
        reader = (
            self.spark.readStream.schema(self.source_schema)
            .option("maxFilesPerTrigger", self.max_files_per_trigger)
            .parquet(self.source_path)
        )
        writer = (
            reader.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_path)
            .trigger(**(trigger or {"processingTime": "5 seconds"}))
        )
        self.query = writer.start()
        return self.query

    def run_available(self) -> None:
        """Drain everything currently in the source, then stop —
        batch-mode semantics over the streaming plan."""
        q = self.start(trigger={"availableNow": True})
        q.awaitTermination()
        self.query = None

    def stop(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None
