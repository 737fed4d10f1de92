"""Interleaved A/B of the simhash vote aggregate: current per-vote
md5-digit chains vs a precomputed per-token bit-mask (one
conv(reverse(hex-prefix)) per token, then bits+1 trivial sums).

Identity proof in code: vote_j = sum(2*bit_j - 1) = 2*s_j - cnt, so
vote_j > 0  <=>  2*s_j > cnt; integer arithmetic, exact.

Usage:
  python scripts/ab_simhash.py verify   # bit-identity on sf0.01 + sf0.1
  python scripts/ab_simhash.py time     # interleaved min-of-3 timings
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from platypus_ingestion_plugins_spark.session import get_spark
from platypus_ingestion_plugins_spark.operators import dedup
from platypus_ingestion_plugins_spark.operators.dedup import (
    ensure_parallelism,
    tokens,
)


def simhash_masked(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    tok = ensure_parallelism(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    # bit j of a token = bit (j%4) of hex digit (j//4) of md5(token).
    # Packed: mask = sum_d digit_d << 4d = conv(reverse(first bits/4
    # hex chars), 16, 10) — one expression per token instead of one
    # digit chain per vote.
    mask = F.conv(F.reverse(F.substring(F.md5(F.col("tok")), 1, bits // 4)), 16, 10).cast(
        "long"
    )
    tok = tok.select(F.col(id_col), mask.alias("m"))
    sums = [
        F.sum(F.shiftright(F.col("m"), j).bitwiseAND(F.lit(1))).alias(f"s{j}")
        for j in range(bits)
    ] + [F.count(F.lit(1)).alias("cnt")]
    agg = tok.groupBy(id_col).agg(*sums)
    fp = None
    for j in range(bits):
        # vote_j = 2*s_j - cnt > 0  <=>  2*s_j > cnt
        bit = F.when(F.col(f"s{j}") * 2 > F.col("cnt"), F.lit(2**j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return agg.select(F.col(id_col), fp.cast("long").alias("simhash"))


def verify(spark):
    for sfd in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        d = spark.read.parquet(os.path.join(sfd, "documents.parquet"))
        for bits in (16, 32):
            a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(d, "text", "doc_id", bits).collect()}
            b = {r["doc_id"]: r["simhash"] for r in simhash_masked(d, "text", "doc_id", bits).collect()}
            assert a == b, f"MISMATCH {sfd} bits={bits}: {len(a)} vs {len(b)} rows"
            print(f"IDENTICAL {sfd} bits={bits} ({len(a)} docs)", flush=True)


def time_ab(spark):
    d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    variants = {
        "old16": lambda: dedup.simhash(d, "text", "doc_id", 16).count(),
        "new16": lambda: simhash_masked(d, "text", "doc_id", 16).count(),
        "old32": lambda: dedup.simhash(d, "text", "doc_id", 32).count(),
        "new32": lambda: simhash_masked(d, "text", "doc_id", 32).count(),
    }
    # pairs-query A/B: monkeypatch dedup.simhash
    orig = dedup.simhash

    def pairs_with(fn):
        dedup.simhash = fn
        try:
            return dedup.simhash_neardup_pairs(d, "text", "doc_id", 16, 3, 4).count()
        finally:
            dedup.simhash = orig

    variants["pairs_old"] = lambda: pairs_with(orig)
    variants["pairs_new"] = lambda: pairs_with(simhash_masked)

    results = {k: [] for k in variants}
    for _ in range(3):
        for k, fn in variants.items():
            t0 = time.perf_counter()
            n = fn()
            results[k].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for k, ts in results.items():
        print(f"{k}: min {min(ts):.3f}  runs {[round(t,3) for t in ts]}", flush=True)


def main():
    spark = get_spark("ab_simhash")
    spark.range(1).count()
    mode = sys.argv[1] if len(sys.argv) > 1 else "verify"
    if mode == "verify":
        verify(spark)
    else:
        time_ab(spark)


if __name__ == "__main__":
    main()
