"""Deterministic corpus shuffle + train-shard export.

Training pipelines need the corpus in a pseudo-random order (to
decorrelate batches) that is REPRODUCIBLE — the same data and seed
must yield the same shard files on any engine, partitioning, or rerun.
``df.orderBy(rand(seed))`` fails that: Spark's rand is
partition-layout-dependent. Here the permutation is a pure function of
each row's key: ``u = unit_hash(key, salt)`` (functions/sampling.py —
the md5→[0,1) trick an external SQL engine reproduces bit-for-bit).

One hash drives everything:
- ``shard = floor(u * n_shards)`` — a contiguous range of the hash
  order, so every shard is a uniform sample AND concatenating shards
  0..N-1 replays the full global permutation;
- within-shard position = rank by ``(u, key)``.

100 TB shape: assignment is a codegen projection riding the scan; the
only shuffle is the write's partitionBy(shard) exchange. Within-shard
ranking is one task per shard — shard count is chosen so a shard is
file-sized (hundreds of MB), which bounds that task by construction;
there is no global sort. The reference has no export surface; this is
a §2.7 extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.sampling import unit_hash

ORDER_COL = "__shuffle_u"


def shuffle_assign(
    df: DataFrame, key: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """Add ``shard`` (int, 0..n_shards-1) and the ordering hash —
    a pure projection, deterministic in (key, salt)."""
    u = unit_hash(key, salt)
    return df.withColumn(ORDER_COL, u).withColumn(
        "shard", F.floor(F.col(ORDER_COL) * n_shards).cast("int")
    )


def shuffle_positions(
    df: DataFrame, key: str, n_shards: int, salt: str = "shuffle"
) -> DataFrame:
    """(key, shard, pos): the materialized permutation — pos is the
    0-based rank within the shard by (hash, key). One task per shard;
    size n_shards for file-sized shards (see module doc)."""
    w = Window.partitionBy("shard").orderBy(ORDER_COL, key)
    return (
        shuffle_assign(df, key, n_shards, salt)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop(ORDER_COL)
    )


def export_shuffled(
    df: DataFrame,
    out_path: str,
    key: str,
    n_shards: int,
    salt: str = "shuffle",
    max_records_per_file: int | None = None,
) -> None:
    """Write the shuffled corpus as ``out_path/shard=K/*.parquet``,
    rows within each shard file in permutation order.

    ``repartition(n_shards, shard)`` + ``sortWithinPartitions`` puts
    each shard's rows in ONE task in hash order, so each shard
    directory holds ordered files; ``maxRecordsPerFile`` caps file
    size without disturbing the order (Spark splits the sorted stream
    sequentially). Readers that list shard dirs and files in name
    order replay the deterministic permutation.
    """
    out = shuffle_assign(df, key, n_shards, salt).repartition(
        n_shards, F.col("shard")
    ).sortWithinPartitions("shard", ORDER_COL, key)
    writer = out.drop(ORDER_COL).write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(out_path)
