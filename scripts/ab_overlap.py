"""Interleaved in-session A/B of the overlap_jobs change (r16).

Runs the five affected stream queries alternately with overlap_jobs
(parallel) and a sequential stand-in, min-of-N each, in ONE Spark
session so cross-process machine noise cancels.

Usage: python scripts/ab_overlap.py [sf_dir] [passes]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from platypus_ingestion_plugins_spark import concurrency
from platypus_ingestion_plugins_spark.session import get_spark

QUERIES = [
    "stream_line_dedup",
    "stream_exact_substring_dedup",
    "stream_image_neardup",
    "stream_neardup_dedup",
    "stream_profile",
]

PARALLEL = concurrency.overlap_jobs


def sequential(*thunks):
    return [t() for t in thunks]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    spark = get_spark("ab_overlap")
    qs = E.queries()
    res: dict[str, dict[str, list[float]]] = {
        q: {"seq": [], "par": []} for q in QUERIES
    }
    for p in range(passes):
        for q in QUERIES:
            for mode in ("seq", "par") if p % 2 == 0 else ("par", "seq"):
                concurrency.overlap_jobs = (
                    sequential if mode == "seq" else PARALLEL
                )
                gc.collect()
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{q}[{mode}]")
                t0 = time.monotonic()
                qs[q](spark, sf_dir).count()
                res[q][mode].append(round(time.monotonic() - t0, 3))
    concurrency.overlap_jobs = PARALLEL
    out = {
        q: {
            "seq_min": min(v["seq"]),
            "par_min": min(v["par"]),
            "seq": v["seq"],
            "par": v["par"],
        }
        for q, v in res.items()
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
