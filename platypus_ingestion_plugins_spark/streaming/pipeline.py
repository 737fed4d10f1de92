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

    def run(self, fn, on_error=None):
        """``on_error(exc)`` fires on EVERY failed attempt (including
        the one that exhausts bounded retries) — the hook the stats
        listener counts batch errors through."""
        attempt, delay = 0, self.initial_delay_s
        while True:
            try:
                return fn()
            except Exception as exc:
                if on_error is not None:
                    on_error(exc)
                attempt += 1
                if self.max_retries is not None and attempt > self.max_retries:
                    raise
                time.sleep(delay)
                delay = min(delay * self.backoff, self.max_delay_s)


class ThroughputListener(StreamingQueryListener):
    """Ingest observability (the reference's stats wrapper and its
    metric TODO: docs/sec + batch failures + 5-minute rolling
    summaries, PaimonIngestor.java:619-646,779-798; queue-size /
    error-count / checkpoint-lag metrics, paimon-plugin/TODO.md:6).

    - Per batch: input rows, docs/sec, trigger-execution ms, and any
      backlog ("rows behind") metrics the source reports in
      ``event.progress.sources[*].metrics`` — Kafka publishes
      ``*OffsetsBehindLatest`` there; the file source reports none.
    - Batch error count: ``record_error`` is invoked by the
      pipeline's retry wrapper on every failed sink attempt (pass the
      listener as ``CdcStreamingPipeline(stats=...)``).
    - Rolling summary: ``summary()`` aggregates the trailing window;
      ``maybe_emit()`` appends one to ``self.summaries`` at most once
      per ``summary_interval_s`` (called from onQueryProgress, so a
      live stream emits on cadence like the reference's 5-min stats
      thread). The clock is injectable so tests don't sleep."""

    def __init__(self, summary_interval_s: float = 300.0, clock=time.monotonic):
        self.batches: list[tuple[int, float]] = []
        self.progress: list[dict] = []
        self.errors = 0
        self.error_log: list[tuple[float, str]] = []
        self.summaries: list[dict] = []
        self._interval = float(summary_interval_s)
        self._clock = clock
        self._last_emit = clock()

    def record_error(self, exc) -> None:
        self.errors += 1
        self.error_log.append((self._clock(), repr(exc)))

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        self.batches.append((p.numInputRows, p.processedRowsPerSecond or 0.0))
        lag = {}
        for s in p.sources or []:
            m = getattr(s, "metrics", None) or {}
            for key in (
                "minOffsetsBehindLatest",
                "maxOffsetsBehindLatest",
                "avgOffsetsBehindLatest",
            ):
                if key in m:
                    lag[key] = float(m[key])
        self.progress.append(
            {
                "t": self._clock(),
                "batch_id": p.batchId,
                "rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond or 0.0,
                "trigger_ms": (p.durationMs or {}).get("triggerExecution"),
                "rows_behind": lag,
            }
        )
        self.maybe_emit()

    def summary(self, window_s: float | None = None) -> dict:
        """Aggregate the trailing ``window_s`` (default: the emit
        interval): batches, rows, wall-clock docs/sec over trigger
        time, errors in the window, worst rows-behind seen."""
        now = self._clock()
        window_s = self._interval if window_s is None else window_s
        recent = [r for r in self.progress if now - r["t"] <= window_s]
        rows = sum(r["rows"] for r in recent)
        busy_s = sum((r["trigger_ms"] or 0) for r in recent) / 1000.0
        lags = [v for r in recent for v in r["rows_behind"].values()]
        return {
            "window_s": window_s,
            "n_batches": len(recent),
            "rows": rows,
            "docs_per_sec": round(rows / busy_s, 3) if busy_s > 0 else 0.0,
            "errors": sum(1 for t, _ in self.error_log if now - t <= window_s),
            "total_errors": self.errors,
            "max_rows_behind": max(lags) if lags else None,
        }

    def maybe_emit(self) -> dict | None:
        if self._clock() - self._last_emit < self._interval:
            return None
        s = self.summary()
        self.summaries.append(s)
        self._last_emit = self._clock()
        return s

    def onQueryIdle(self, event):
        # a stream with no data still reports on cadence (the
        # reference's stats thread is wall-clock driven, not
        # batch-driven)
        self.maybe_emit()

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
        stats: ThroughputListener | None = None,
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
        # error-count sink (reference TODO metric parity); progress
        # events additionally flow to it if the caller registers it
        # with spark.streams.addListener
        self.stats = stats
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
                self.retry.run(
                    lambda: self.serving.apply_batch(df),
                    on_error=(
                        self.stats.record_error if self.stats is not None else None
                    ),
                )
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
