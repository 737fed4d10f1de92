"""A/B: the minhash verify/boundary size gate (`big` = plan >= 32 MB)
at the MIDDLE scale the r16 bisect never measured.

r16 re-introduced the r14 exploded equi-join verify for small corpora
behind the same Catalyst plan-size gate that places the eager
materialization boundaries (exploded wins 1.3 s vs 1.8 s at sf0.1;
array wins 40 s vs 84 s at sf10). The sf1 replica (~6 MB plan size)
falls on the exploded side of the 32 MB threshold — but the refreshed
sf1_scale_check read clean_corpus 10 -> 23 s at sf1 vs the r15 record
(array shape always), which is either the gate mis-placed in the
middle regime or box noise. This probe answers it the only valid way
on this VM: both arms INTERLEAVED in one Spark session, min-of-N,
forcing the gate each way by monkeypatching dedup._plan_size_bytes
(the single seam both gate sites read).

Usage: python scripts/ab_minhash_gate.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from platypus_ingestion_plugins_spark.operators import dedup
from platypus_ingestion_plugins_spark.session import get_spark


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab_minhash_gate")
    spark.sparkContext.setLogLevel("ERROR")
    real = dedup._plan_size_bytes
    print("real plan size of documents:", real(E._t(spark, sf, "documents")))

    QUERIES = {
        "dedup_minhash_lsh": E.q_dedup_minhash_lsh,
        "pipeline_clean_corpus": E.q_pipeline_clean_corpus,
    }
    ARMS = {"small(exploded,lazy)": 0, "big(array,eager)": 1 << 62}

    # warmup both paths once
    for forced in ARMS.values():
        dedup._plan_size_bytes = lambda df, _v=forced: _v
        E.q_dedup_minhash_lsh(spark, sf).count()
    best: dict[tuple[str, str], float] = {}
    counts: dict[str, set] = {q: set() for q in QUERIES}
    try:
        for p in range(passes):
            for arm, forced in ARMS.items():
                dedup._plan_size_bytes = lambda df, _v=forced: _v
                for qname, qfn in QUERIES.items():
                    spark.sparkContext.setJobDescription(
                        f"{qname} {arm} pass={p}"
                    )
                    t0 = time.monotonic()
                    n = qfn(spark, sf).count()
                    dt = time.monotonic() - t0
                    counts[qname].add(n)
                    key = (qname, arm)
                    best[key] = min(best.get(key, dt), dt)
                    print(f"pass={p} {qname} {arm}: {dt:.2f}s rows={n}",
                          flush=True)
                    spark.catalog.clearCache()
    finally:
        dedup._plan_size_bytes = real
    print(f"\n== min-of-{passes} ==")
    for (qname, arm), dt in sorted(best.items()):
        print(f"{qname} {arm}: {dt:.2f}s")
    for qname, ns in counts.items():
        assert len(ns) == 1, f"{qname} row counts differ across arms: {ns}"
        print(f"{qname}: identical row count across arms ({ns.pop()})")
    spark.stop()


if __name__ == "__main__":
    main()
