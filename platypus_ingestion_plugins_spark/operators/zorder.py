"""Z-order (Morton) clustered layout: multi-dimensional partition
pruning from ONE partition column.

A table partitioned by a single column prunes queries on that column
only; range queries over a second dimension still scan everything. The
space-filling-curve trick interleaves the bits of every dimension's
bucket ordinal into one Z-VALUE, so rows close in ALL dimensions land
close on the curve — partitioning by a short z-prefix gives directory
granularity that respects every dimension at once, and a rectangle
query touches only the directories whose prefix region intersects it
(the layout idea behind Delta/Iceberg OPTIMIZE ZORDER, applied here at
the partition-directory level where plain Spark can prune via
PruneFileSourcePartitions).

Everything is deterministic integer arithmetic over FIXED, caller-
declared [min, max) ranges — no sampled quantiles — so the z-value an
external SQL engine computes is bit-identical (the oracle checks it),
and the write-side and read-side bucketing can never drift.

Scale shape: the z-value is a codegen projection riding the scan; the
write's ``partitionBy`` is the only exchange; the read side turns a
query rectangle into a LITERAL prefix ``IN`` list driver-side (bounded
by the prefix space, never data-sized) and re-checks the exact
predicate on the pruned scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZCOL = "zp"


def _bucket(col: Column, mn: float, mx: float, bits: int) -> Column:
    """Fixed-range bucket ordinal in [0, 2^bits): floor of the
    normalized position, clamped — values outside [mn, mx) land in the
    edge buckets, so nothing is ever lost to a bad range guess."""
    n = (1 << bits) - 1
    raw = F.floor((col - F.lit(mn)) / F.lit((mx - mn) / float(1 << bits)))
    return F.greatest(F.least(raw, F.lit(n)), F.lit(0)).cast("long")


def _interleave(buckets: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of dimension j lands at position
    i * ndims + j. Pure sum of shifted masked bits — the same closed
    form a SQL oracle can evaluate term by term."""
    nd = len(buckets)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * nd + j
            )
    return z


def zorder_value(
    specs: list[tuple[Column | str, float, float]], bits: int = 8
) -> Column:
    """The Morton code of a row over ``specs`` = [(col, min, max),
    ...]: each dimension buckets into 2^bits fixed-width cells, bit-
    interleaved into one long. Equal-prefix rows are close in every
    dimension simultaneously."""
    buckets = [
        _bucket(F.col(c) if isinstance(c, str) else c, mn, mx, bits)
        for c, mn, mx in specs
    ]
    return _interleave(buckets, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    specs: list[tuple[str, float, float]],
    bits: int = 8,
    prefix_bits: int = 6,
) -> None:
    """Materialize the layout: partition directories keyed by the top
    ``prefix_bits`` of the z-value (2^prefix_bits dirs — pick it for
    directory-sized partitions), rows within each directory sorted by
    the full z-value so parquet row-group stats stay tight for
    in-directory skipping."""
    nd = len(specs)
    z = zorder_value([(c, mn, mx) for c, mn, mx in specs], bits)
    shift = nd * bits - prefix_bits
    out = (
        df.withColumn("__z", z)
        .withColumn(ZCOL, F.shiftright(F.col("__z"), shift))
        .repartition(ZCOL)
        .sortWithinPartitions(ZCOL, "__z")
        .drop("__z")
    )
    out.write.mode("overwrite").partitionBy(ZCOL).parquet(path)


def _covering_prefixes(
    rect: list[tuple[float, float]],
    specs: list[tuple[str, float, float]],
    bits: int,
    prefix_bits: int,
) -> list[int]:
    """Driver-side: every z-prefix whose region intersects the query
    rectangle. Enumerates the rectangle's bucket grid — bounded by the
    bucket space (2^(nd*bits) worst case; a selective rectangle is
    tiny), independent of data size — and shifts each cell's z-value
    down to its prefix. Exactly the literal set PruneFileSourcePartitions
    needs."""
    nd = len(specs)
    ranges = []
    for (lo, hi), (c, mn, mx) in zip(rect, specs):
        w = (mx - mn) / float(1 << bits)
        b_lo = max(min(int((lo - mn) / w), (1 << bits) - 1), 0)
        b_hi = max(min(int((hi - mn) / w), (1 << bits) - 1), 0)
        ranges.append(range(b_lo, b_hi + 1))

    def z_of(cell: tuple[int, ...]) -> int:
        z = 0
        for j, b in enumerate(cell):
            for i in range(bits):
                z |= ((b >> i) & 1) << (i * nd + j)
        return z

    import itertools

    shift = nd * bits - prefix_bits
    return sorted({z_of(cell) >> shift for cell in itertools.product(*ranges)})


def zorder_range_scan(
    spark,
    path: str,
    specs: list[tuple[str, float, float]],
    rect: list[tuple[float, float]],
    bits: int = 8,
    prefix_bits: int = 6,
) -> DataFrame:
    """Rectangle query over the z-ordered layout: scan only the
    covering-prefix directories (literal ``zp IN (...)`` — partition
    pruned before any file opens), then re-check the EXACT per-column
    bounds, so the result is identical to the full-scan filter while
    touching ~the rectangle's share of directories. ``specs``/``bits``
    must match the writer's (same fixed ranges — the no-drift
    contract)."""
    prefixes = _covering_prefixes(rect, specs, bits, prefix_bits)
    df = spark.read.parquet(path).filter(F.col(ZCOL).isin(prefixes))
    for (lo, hi), (c, _, _) in zip(rect, specs):
        df = df.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return df
