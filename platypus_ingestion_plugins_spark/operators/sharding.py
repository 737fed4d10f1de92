"""Horizontal sharding via partition pruning.

Reference: sharding/ShardingStrategy.java:41-76 (interface + factory),
NoShardingStrategy.java:34-51, ModuloShardingStrategy.java:98-209.
A table PARTITIONED BY (partition_field) where the writer computed
``partition_field = pk % max_shards`` lets shard i read only its
partition — manifest/file-level pruning, ~N-fold I/O reduction
(ModuloShardingStrategy.java:142-143, paimon-plugin/README.md:284-290).

Spark-first: the filter ``col(partition_field) == shard_id`` over a
parquet table written with ``partitionBy(partition_field)`` triggers
Catalyst's PruneFileSourcePartitions — the non-matching files are never
listed into the scan, exactly the reference's pruning, with dynamic
partition pruning on joins for free.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id_from_service_name(service_name: str, max_shards: int) -> int:
    """Trailing integer of ``name-23`` -> 23, validated in [0, max_shards).

    Reference: ModuloShardingStrategy.calculateShardId
    (ModuloShardingStrategy.java:174-209).
    """
    m = re.search(r"-(\d+)$", service_name)
    if not m:
        raise ValueError(
            f"service name {service_name!r} must end in -<shardId> for modulo sharding"
        )
    shard = int(m.group(1))
    if not (0 <= shard < max_shards):
        raise ValueError(f"shard id {shard} out of range [0, {max_shards})")
    return shard


@dataclass(frozen=True)
class ShardingStrategy:
    """Base: pass-through (reference ShardingStrategy.java:41-76)."""

    def apply(self, df: DataFrame) -> DataFrame:
        return df

    def validate(self, df: DataFrame) -> None:
        return None


class NoShardingStrategy(ShardingStrategy):
    """Identity (NoShardingStrategy.java:34-51)."""


@dataclass(frozen=True)
class ModuloShardingStrategy(ShardingStrategy):
    """Read only rows whose partition column equals this shard's id.

    ``partition_field`` must exist (the writer's ``pk % max_shards``
    column); validation mirrors ModuloShardingStrategy.java:98-126.
    """

    partition_field: str
    shard_id: int
    max_shards: int

    def validate(self, df: DataFrame) -> None:
        if self.partition_field not in df.columns:
            raise ValueError(
                f"table missing partition field {self.partition_field!r}; "
                f"modulo sharding requires PARTITIONED BY({self.partition_field})"
            )
        if not (0 <= self.shard_id < self.max_shards):
            raise ValueError(f"shard id {self.shard_id} out of range [0, {self.max_shards})")

    def apply(self, df: DataFrame) -> DataFrame:
        self.validate(df)
        # partition-pruning filter (ModuloShardingStrategy.java:129-146)
        return df.filter(F.col(self.partition_field) == F.lit(self.shard_id))


@dataclass(frozen=True)
class GeoShardingStrategy(ShardingStrategy):
    """Read only rows whose region partition column matches this
    shard's regions.

    The reference DECLARES geo sharding and throws
    (GeoShardingStrategy.java:26-44, acknowledged tech debt); we
    implement the declared intent — a shard serves a set of regions,
    pruning to their partition directories — the same
    PruneFileSourcePartitions mechanism as the modulo strategy, keyed
    by a categorical region column instead of a hash."""

    partition_field: str
    regions: tuple[str, ...]

    def validate(self, df: DataFrame) -> None:
        if self.partition_field not in df.columns:
            raise ValueError(
                f"table missing region partition field {self.partition_field!r}; "
                f"geo sharding requires PARTITIONED BY({self.partition_field})"
            )
        if not self.regions:
            raise ValueError("geo sharding requires a non-empty region set")

    def apply(self, df: DataFrame) -> DataFrame:
        self.validate(df)
        return df.filter(F.col(self.partition_field).isin(list(self.regions)))


def sharding_strategy(
    kind: str,
    partition_field: str | None = None,
    service_name: str | None = None,
    shard_id: int | None = None,
    max_shards: int | None = None,
    regions: list[str] | tuple[str, ...] | None = None,
) -> ShardingStrategy:
    """Factory: none | modulo | geo (ShardingStrategyFactory.java:38-77)."""
    kind = kind.lower()
    if kind == "none":
        return NoShardingStrategy()
    if kind == "modulo":
        if partition_field is None or max_shards is None:
            raise ValueError("modulo sharding requires partition_field and max_shards")
        if shard_id is None:
            if service_name is None:
                raise ValueError("modulo sharding requires shard_id or service_name")
            shard_id = shard_id_from_service_name(service_name, max_shards)
        return ModuloShardingStrategy(partition_field, shard_id, max_shards)
    if kind == "geo":
        # declared but unimplemented in the reference
        # (GeoShardingStrategy.java:26-44); implemented here as a
        # region-set partition filter
        if partition_field is None or not regions:
            raise ValueError("geo sharding requires partition_field and regions")
        return GeoShardingStrategy(partition_field, tuple(regions))
    raise ValueError(f"unknown sharding strategy: {kind!r}")


def write_modulo_partitioned(
    df: DataFrame, path: str, pk: str, partition_field: str, max_shards: int
) -> None:
    """Writer side: materialize ``pk % max_shards`` and partition by it."""
    (
        df.withColumn(partition_field, F.pmod(F.col(pk), F.lit(max_shards)).cast("int"))
        .write.mode("overwrite")
        .partitionBy(partition_field)
        .parquet(path)
    )


DATE_COL = "__date"


def write_time_partitioned(
    df: DataFrame, path: str, ts_col, granularity: str = "day"
) -> None:
    """Time-series layout: partition by event-time date (or hour).

    ``ts_col`` is any TimestampType column/expression. A time-range
    query over the result prunes to the matching date directories at
    the manifest level — the time-axis analogue of the modulo shard,
    and the layout every event/log table at 100 TB needs (retention
    drops are also directory-level deletes).
    """
    fmt = {"day": "yyyy-MM-dd", "hour": "yyyy-MM-dd-HH"}[granularity]
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    (
        df.withColumn(DATE_COL, F.date_format(col, fmt))
        .write.mode("overwrite")
        .partitionBy(DATE_COL)
        .parquet(path)
    )


def time_range(df: DataFrame, start: str, end: str) -> DataFrame:
    """Half-open [start, end) filter on the date partition column —
    string-ordered, so it prunes directories without touching data
    files outside the range."""
    return df.filter((F.col(DATE_COL) >= start) & (F.col(DATE_COL) < end))


def expire_partitions_before(spark, path: str, cutoff: str) -> list[str]:
    """Retention for a time-partitioned table: drop every date
    partition directory strictly older than ``cutoff`` — a pure
    manifest/directory operation (no data scan, no rewrite), which is
    the entire point of the date layout at 100 TB. Returns the dropped
    partition values."""
    from platypus_ingestion_plugins_spark import fs

    dropped = []
    for name in fs.list_names(spark, path):
        if not name.startswith(f"{DATE_COL}="):
            continue
        val = name.split("=", 1)[1]
        if val < cutoff:
            fs.delete(spark, f"{path}/{name}")
            dropped.append(val)
    return sorted(dropped)
