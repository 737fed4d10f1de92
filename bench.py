"""Benchmark: run the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from platypus_ingestion_plugins_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark("bench")
    # warm the JVM/session so q1 doesn't pay session startup
    spark.range(1).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()  # execute the full plan
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
        # queries are independent jobs: drop any cached/checkpointed
        # blocks an operator pinned so later timings aren't distorted
        # by block-manager pressure from earlier ones
        spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "metric": "sum_query_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
