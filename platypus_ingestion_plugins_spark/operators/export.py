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


def pack_bins(
    df: DataFrame,
    key: str,
    n_tokens_col: str,
    target_tokens: int,
    n_shards: int,
    salt: str = "shuffle",
) -> DataFrame:
    """Concatenate-then-chunk sequence packing: documents laid out in
    the deterministic shuffle order form one token stream per shard,
    chunked into context windows of ``target_tokens``. Each document
    gets ``offset`` (its exclusive token-cumsum position in the shard
    stream) and ``bin = floor(offset / target_tokens)`` — the window
    its first token lands in. Documents may span bins, the standard
    pre-training packing (no padding waste, no bin-packing heuristics,
    and — unlike first-fit — fully order-deterministic, so an external
    engine reproduces the exact layout).

    The cumulative sum is one window per shard (ROWS frame, explicit —
    RANGE-with-ties would diverge from the SQL oracle), bounded by the
    same file-sized-shard sizing as shuffle_positions."""
    w = (
        Window.partitionBy("shard")
        .orderBy(ORDER_COL, key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        shuffle_assign(df, key, n_shards, salt)
        .withColumn(
            "offset",
            (F.sum(n_tokens_col).over(w) - F.col(n_tokens_col)).cast("long"),
        )
        .withColumn(
            "bin", F.floor(F.col("offset") / target_tokens).cast("long")
        )
        .drop(ORDER_COL)
    )


def materialize_packs(
    df: DataFrame,
    key: str,
    text_col: str,
    n_tokens_col: str,
    target_tokens: int,
    n_shards: int,
    salt: str = "shuffle",
    sep: str = " ",
) -> DataFrame:
    """Build the packed training rows: per (shard, bin), documents
    concatenated in stream order. A document belongs to the bin its
    FIRST token lands in, so packs are variable-length around
    ``target_tokens`` (the chunk grid, not a hard cap) — the padding-
    free trade the concatenate-then-chunk scheme makes.

    Order inside a pack is made deterministic without a sort exchange:
    ``collect_list`` order is partition-dependent, so each element
    carries its offset and ``array_sort`` restores stream order after
    the aggregation. One groupBy on (shard, bin) — map-side partials,
    pack sizes bounded by construction (~target_tokens of text)."""
    packed = pack_bins(df, key, n_tokens_col, target_tokens, n_shards, salt)
    return (
        packed.groupBy("shard", "bin")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("offset"), F.col(text_col)))
            ).alias("__parts"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tokens_col).alias("n_tokens"),
        )
        .select(
            "shard",
            "bin",
            "n_docs",
            "n_tokens",
            F.array_join(
                F.transform("__parts", lambda s: s[text_col]), sep
            ).alias("pack_text"),
        )
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
