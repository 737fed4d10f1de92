"""Interleaved A/B for the single-run two-batch drop replay
(__spark_entry__._replay_two_drops, VERDICT r16 task #7 generalized to
the whole foreachBatch/windowed stream family): arm OLD forces the
pre-r17 two-run shape through the same code path
(E._SINGLE_RUN_DROPS = False -> the fallback branch, byte-identical to
the old two-run replay), arm NEW uses the single-run shape. Output
rows (the query's returned frame, fully collected) are asserted
identical between arms on every pass.

Usage: python scripts/ab_two_drop_replay.py [sf_dir] [passes] [q ...]
"""

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from platypus_ingestion_plugins_spark.session import get_spark

DEFAULT = [
    "stream_line_dedup",
    "stream_dedup_exact",
    "stream_chat_dedup",
    "stream_image_neardup",
    "stream_neardup_dedup",
    "stream_exact_substring_dedup",
    "stream_profile",
    "stream_agg_materialize",
    "stream_term_index",
    "stream_constraints",
    "stream_quantiles",
    "stream_heavy_hitters",
    "stream_rate_anomalies",
    "stream_percolate",
    "stream_ewma_anomalies",
]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3:] or DEFAULT
    spark = get_spark(app_name="ab_two_drop_replay")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["stream_dedup_exact"](spark, sf).count()  # warm streaming machinery
    best: dict[tuple, float] = {}
    for name in names:
        ref = None
        for p in range(passes):
            for arm, single in (("old", False), ("new", True)):
                E._SINGLE_RUN_DROPS = single
                spark.sparkContext.setJobDescription(f"{name} {arm} p{p}")
                t0 = time.monotonic()
                rows = sorted(
                    tuple(r) for r in qs[name](spark, sf).collect()
                )
                dt = round(time.monotonic() - t0, 3)
                if ref is None:
                    ref = rows
                assert rows == ref, (
                    f"{name} {arm} p{p}: OUTPUT DIFFERS "
                    f"({len(rows)} vs {len(ref)} rows)")
                best[(name, arm)] = min(best.get((name, arm), dt), dt)
                print(f"{name} p{p} {arm}: {dt}s", flush=True)
                gc.collect()
                spark.catalog.clearCache()
        print(f"== {name}: rows identical across arms ({len(ref)}) ==",
              flush=True)
    E._SINGLE_RUN_DROPS = True
    print(f"\n== min-of-{passes} ==")
    tot = {"old": 0.0, "new": 0.0}
    for name in names:
        o, n = best[(name, "old")], best[(name, "new")]
        tot["old"] += o
        tot["new"] += n
        print(f"{name:32s} old {o:6.3f}  new {n:6.3f}  delta {o - n:+.3f}")
    print(f"{'TOTAL':32s} old {tot['old']:6.3f}  new {tot['new']:6.3f}  "
          f"delta {tot['old'] - tot['new']:+.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
