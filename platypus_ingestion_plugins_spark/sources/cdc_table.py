"""CDC-convention parquet table source (the Paimon-table equivalent).

Layout convention (SURVEY §1.1): a parquet table whose rows carry
  _row_kind  string  (+I/+U/-U/-D)
  _seq       long    (total order within a key's bucket)
  _snapshot  long    (snapshot id, monotone per incremental drop)
  _bucket    int     (ordering/distribution unit; optional)

The reference plans new splits per scan and checkpoints the consumed
snapshot (PaimonIngestor.java:248-269, StreamTableScan.checkpoint).
Here incremental reads are `_snapshot > last_snapshot` filters over a
snapshot-partitioned table — Catalyst partition-prunes old snapshots
at the manifest level, the same file-skipping the reference gets from
Paimon, and the checkpoint is just the last consumed snapshot id
(or, in streaming mode, the Structured Streaming checkpoint dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark import fs

SNAPSHOT_COL = "_snapshot"


def write_cdc_snapshot(df: DataFrame, path: str, snapshot_id: int) -> None:
    """Append one snapshot's changelog, partitioned by snapshot id so
    incremental readers prune files (append = new snapshot dirs only)."""
    (
        df.withColumn(SNAPSHOT_COL, F.lit(snapshot_id).cast("long"))
        .write.mode("append")
        .partitionBy(SNAPSHOT_COL)
        .parquet(path)
    )


def read_cdc_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """Full-table read of the CDC log."""
    return spark.read.parquet(path)


def read_cdc_incremental(
    spark: SparkSession, path: str, last_snapshot: int | None = None
) -> DataFrame:
    """Splits since the checkpoint: `_snapshot > last_snapshot`.

    The filter lands on the partition column, so pruning happens at
    file-listing time — old snapshots are never opened (the
    reference's manifest-level skip, paimon-plugin/README.md:247-271).
    """
    df = spark.read.parquet(path)
    if last_snapshot is not None:
        df = df.filter(F.col(SNAPSHOT_COL) > F.lit(last_snapshot))
    return df


def latest_snapshot_id(spark: SparkSession, path: str) -> int | None:
    """Max snapshot id present (directory listing, no data read).

    Listing goes through the Hadoop FileSystem API so the table may
    live on any supported store (local/HDFS/s3a)."""
    names = fs.list_names(spark, path)
    snaps = [
        int(n.split("=", 1)[1])
        for n in names
        if n.startswith(f"{SNAPSHOT_COL}=")
    ]
    return max(snaps) if snaps else None


def read_as_of(
    spark: SparkSession,
    path: str,
    snapshot: int,
    key: str | list[str],
    seq_col: str = "_seq",
) -> DataFrame:
    """Time-travel read: the table's materialized state AS OF
    ``snapshot`` — Paimon's `VERSION AS OF` on the CDC-convention
    layout. The changelog is append-only and snapshot-partitioned, so
    every historical state remains reconstructible: filter
    ``_snapshot <= snapshot`` (partition-pruned at file-listing time —
    later snapshots are never opened) and apply the same last-wins
    reduction the live materialization uses. A snapshot id that never
    existed raises rather than silently returning a state nobody
    wrote.

    Scale shape: identical to a live materialization over the kept
    prefix — one keyed window; the prune means cost tracks the
    history you ask for, not the history that exists after it."""
    from platypus_ingestion_plugins_spark.operators.cdc import apply_changelog

    latest = latest_snapshot_id(spark, path)
    if latest is None:
        raise ValueError(f"no snapshots at {path}")
    names = fs.list_names(spark, path)
    snaps = {
        int(n.split("=", 1)[1])
        for n in names
        if n.startswith(f"{SNAPSHOT_COL}=")
    }
    if snapshot not in snaps:
        raise ValueError(
            f"snapshot {snapshot} does not exist at {path}; have "
            f"{sorted(snaps)}"
        )
    log = spark.read.parquet(path).filter(
        F.col(SNAPSHOT_COL) <= F.lit(snapshot)
    )
    return apply_changelog(log.drop(SNAPSHOT_COL), key, seq_col=seq_col)
