"""10x scale probe for the r15 TAIL-batch newcomers.

Extends the ``sf1_scale_check`` replica with an EVENTS table (the
graph/experiment operators' scale dimension, which the
documents/embeddings-only replica deliberately lacked): 10 replicas of
sf0.1 events with event_id/user_id strides of max(id)+1, timestamps
unchanged — 10x users and 10x events per hour, so the hash-derived
user graph has 10x nodes/edges and every hourly grid carries 10x
counts. Then times each tail-batch query once at sf0.1 and once at
sf1 (whole cohort warmed first — the sf1_scale_check JIT discipline)
and merges ``r15_tail_probe`` into bench_summary.json.

scaling_factor_10x = sec(sf1)/sec(sf0.1); linear == 10.

Usage: python scripts/probe_r15_tail.py
"""

import gc
import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SF1_DIR", "/tmp/sf1")

DOC_READERS = [
    "aggs_dsl",
    "aggs_multi_terms",
    "simple_query",
    "readability",
    "span_corrupt",
    "fim_split",
    "soft_dedup",
    "json_validity",
]
EVENT_READERS = [
    "triangle_count",
    "lpa_communities",
    "kcore_graph",
    "ppr_seeds",
    "ewma_anomalies",
    "psi_drift",
    "ab_cuped",
    "srm_check",
]


def build_events_replica(spark):
    """10 replicas of sf0.1 events into SF1/events.parquet with the
    .building/rename crash discipline (the build_sf1 rule)."""
    import shutil

    from pyspark.sql import functions as F

    building = f"{SF1}/events.parquet.building"
    shutil.rmtree(building, ignore_errors=True)
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    estride = ev.agg(F.max("event_id")).collect()[0][0] + 1
    ustride = ev.agg(F.max("user_id")).collect()[0][0] + 1
    for k in range(10):
        (
            ev.select(
                (F.col("event_id") + F.lit(k * estride)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(k * ustride)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            .write.mode("append")
            .parquet(building)
        )
    final = f"{SF1}/events.parquet"
    shutil.rmtree(final, ignore_errors=True)
    os.rename(building, final)
    print(
        f"built {final}: events="
        f"{spark.read.parquet(final).count()}",
        flush=True,
    )


def main():
    from platypus_ingestion_plugins_spark.session import get_spark

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    spark = get_spark(app_name="r15-tail-probe")
    if not os.path.exists(f"{SF1}/documents.parquet"):
        sf1_mod = importlib.import_module("sf1_scale_check")
        sf1_mod.build_sf1(spark)
    if not os.path.exists(f"{SF1}/events.parquet"):
        build_events_replica(spark)

    cohort = DOC_READERS + EVENT_READERS

    def _release():
        gc.collect()
        spark.catalog.clearCache()

    for q in cohort:  # warm JIT/codegen before any measurement
        qs[q](spark, SF01).count()
        _release()
        print(f"warmup {q}: done", flush=True)

    results = {}
    for sf_name, sf_dir in [("sf0.1", SF01), ("sf1", SF1)]:
        for q in cohort:
            t0 = time.monotonic()
            n = qs[q](spark, sf_dir).count()
            dt = round(time.monotonic() - t0, 2)
            results.setdefault(q, {})[sf_name] = {"sec": dt, "rows": n}
            print(f"{sf_name} {q}: {dt}s ({n} rows)", flush=True)
            _release()
    for q, r in results.items():
        r["scaling_factor_10x"] = round(
            r["sf1"]["sec"] / max(r["sf0.1"]["sec"], 1e-9), 2
        )
        print(f"{q}: {r['scaling_factor_10x']}x", flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "bench_summary.json")
    summary = json.load(open(path)) if os.path.exists(path) else {}
    summary["r15_tail_probe"] = {
        "note": "10x probe of the r15 tail-batch newcomers; events "
                "replica = 10 id-strided copies of sf0.1 events "
                "(10x users -> 10x graph nodes, 10x counts per hourly "
                "bucket). scaling_factor_10x = sec(sf1)/sec(sf0.1), "
                "linear == 10.",
        "results": results,
    }
    json.dump(summary, open(path, "w"), indent=1)
    print("merged r15_tail_probe into bench_summary.json", flush=True)


if __name__ == "__main__":
    main()
