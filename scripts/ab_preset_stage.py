"""Decomposed A/B for clean_corpus at sf0.1: which knob drives the
eager-arm win the sf0.1 gate A/B showed (4.41 vs 5.15 min-of-3)?

The preset consults dedup._plan_size_bytes twice per construction, in
a fixed order: first for its OWN staging boundaries (pipelines.py),
then inside minhash_lsh_dedup_pairs for the verify shape + LSH
boundaries. A call-counting monkeypatch flips each knob independently:

  A  preset lazy,  inner small   (current sf0.1 behavior)
  B  preset EAGER, inner small   (staging only)
  C  preset lazy,  inner BIG     (verify/LSH only)
  D  preset EAGER, inner BIG     (the measured 4.41 arm)

Usage: python scripts/ab_preset_stage.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from platypus_ingestion_plugins_spark.operators import dedup
from platypus_ingestion_plugins_spark.session import get_spark

BIG = 1 << 62


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="ab_preset_stage")
    spark.sparkContext.setLogLevel("ERROR")
    real = dedup._plan_size_bytes

    def make_mock(first_big: bool, second_big: bool):
        calls = {"n": 0}

        def mock(df):
            calls["n"] += 1
            if calls["n"] == 1:
                return BIG if first_big else real(df)
            return BIG if second_big else real(df)

        return mock, calls

    ARMS = {
        "A_lazy_small": (False, False),
        "B_eager_small": (True, False),
        "C_lazy_big": (False, True),
        "D_eager_big": (True, True),
    }
    E.q_pipeline_clean_corpus(spark, sf).count()  # warmup
    best: dict[str, float] = {}
    counts = set()
    try:
        for p in range(passes):
            for arm, (fb, sb) in ARMS.items():
                dedup._plan_size_bytes, calls = make_mock(fb, sb)
                spark.sparkContext.setJobDescription(f"clean_corpus {arm} p{p}")
                t0 = time.monotonic()
                n = E.q_pipeline_clean_corpus(spark, sf).count()
                dt = time.monotonic() - t0
                # ADVICE r16: the positional mock assumes exactly two
                # gate sites per construction (preset staging first,
                # inner LSH gate second) — a third call site or a
                # reorder would silently mislabel the arms, so fail
                # loudly on any call-count drift
                assert calls["n"] == 2, (
                    f"expected 2 _plan_size_bytes gate calls per "
                    f"construction, saw {calls['n']} — arm labels no "
                    f"longer match the gate sites"
                )
                counts.add(n)
                best[arm] = min(best.get(arm, dt), dt)
                print(f"pass={p} {arm}: {dt:.2f}s rows={n}", flush=True)
                spark.catalog.clearCache()
    finally:
        dedup._plan_size_bytes = real
    print(f"\n== min-of-{passes} ==")
    for arm, dt in sorted(best.items()):
        print(f"{arm}: {dt:.2f}s")
    assert len(counts) == 1, f"row counts differ: {counts}"
    print(f"identical rows across arms ({counts.pop()})")
    spark.stop()


if __name__ == "__main__":
    main()
