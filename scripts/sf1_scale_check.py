"""One-order-of-magnitude scale spot-check (VERDICT r9 task #4).

Builds a 10x replica of the sf0.1 documents/embeddings tables in a
scratch dir, runs the dedup/ANN flagship cohort (dedup_groups,
stream_neardup_dedup, knn_join, line_dedup, pipeline_clean_corpus,
exact_substring_dedup, dsir_select) once at each scale, and records seconds + the sf1/sf0.1 scaling
factor into bench_summary.json under "sf1_scale_check". Anything
scaling materially worse than linear gets a named cause in SURVEY §6.

Replica construction keeps the data's dedup characteristics instead
of creating a degenerate 10x-exact-duplicate corpus: every word in
replica k is prefixed with ``r{k}`` (one regexp, codegen), so
in-replica shingle/near-dup relationships are preserved exactly while
cross-replica Jaccard is 0 — each replica is an independent corpus of
the same shape, which is what "10x more data" means for a dedup
workload. Embeddings get a tiny deterministic per-replica rotation of
the first component for the same reason.

Run UNCONTENDED (no concurrent pytest/oracle runs): timings feed the
scaling-factor record.

Usage: python scripts/sf1_scale_check.py [--skip-gen]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("SF1_DIR", "/tmp/sf1")
COHORT = [
    "dedup_groups",
    "stream_neardup_dedup",
    "knn_join",
    "line_dedup",
    "pipeline_clean_corpus",
    # r11 late additions: the two data-proportional newcomers — the
    # ExactSubstr gram pipeline (explode + count + coverage windows)
    # and DSIR (two bucket fits + broadcast scoring over the corpus)
    "exact_substring_dedup",
    "dsir_select",
    # r11 final additions: the bigram LM (two count fits + a
    # positioned-bigram explode scoring pass), the trained classifier
    # (feature explode, two gradient iterations, broadcast scoring),
    # and the paragraph-unit scrub (explode + df count + reassembly)
    "bigram_logprob",
    "quality_classifier",
    "paragraph_dedup",
    # r12 additions (VERDICT r11 task #5): the streaming/stateful
    # heavyweights — the checkpointed two-drop profile (three mergeable
    # states under the staged-swap commit) and streaming ExactSubstr
    # (span-count index appends + pruned reads, ~1.2M keys/drop at
    # sf0.1) — plus the O(touched-shards) GDPR tar scrub, and the two
    # new r12 operators (dHash banding; OVR classifier train+score)
    "stream_profile",
    "stream_exact_substring_dedup",
    "tar_scrub",
    "image_neardup",
    "language_classifier",
    # r12 late additions: the shuffle-bearing newcomers — hybrid RRF
    # (BM25 corpus pass + cosine TakeOrdered + bounded fusion), PQ
    # (one-iteration joint Lloyd + map-only encode), and the
    # assistant-transcript dedup (sha2-key groupBy + semi join); the
    # other late ops (render/stats/gate, script detection, HTML
    # extraction, highlighting) are zero-shuffle map projections whose
    # scaling is the scan itself
    "hybrid_search",
    "pq_codes",
    "chat_assistant_dedup",
    "length_batches",
]


def build_sf1(spark):
    """Build into SF1 + '.building', then atomically rename: a crashed
    or interrupted generation can never be mistaken for a complete 10x
    dataset by a later run (code-review r10 #3). Replica id strides use
    max(id)+1, not row count — sparse id spaces would otherwise collide
    across replicas and corrupt the measured dedup identity (r10 #5)."""
    import shutil

    from pyspark.sql import functions as F

    building = SF1 + ".building"
    shutil.rmtree(building, ignore_errors=True)
    os.makedirs(building)
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    doc_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    emb_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    for k in range(10):
        (
            docs.select(
                (F.col("doc_id") + F.lit(k * doc_stride)).alias("doc_id"),
                F.regexp_replace("text", r"(\w+)", f"r{k}$1").alias("text")
                if k
                else F.col("text"),
                "lang",
                "source",
                "n_chars",
            )
            .write.mode("append")
            .parquet(f"{building}/documents.parquet")
        )
        (
            emb.select(
                (F.col("vec_id") + F.lit(k * emb_stride)).alias("vec_id"),
                F.concat(
                    F.array((F.col("embedding")[0] + F.lit(k * 1e-3)).cast("float")),
                    F.slice("embedding", 2, 10_000),
                ).alias("embedding"),
                "label",
            )
            .write.mode("append")
            .parquet(f"{building}/embeddings.parquet")
        )
    shutil.rmtree(SF1, ignore_errors=True)
    os.rename(building, SF1)
    print(
        f"built {SF1}: documents={spark.read.parquet(f'{SF1}/documents.parquet').count()}, "
        f"embeddings={spark.read.parquet(f'{SF1}/embeddings.parquet').count()}",
        flush=True,
    )


def main():
    from platypus_ingestion_plugins_spark.session import get_spark

    import importlib

    entry = importlib.import_module("__spark_entry__")
    qs = entry.queries()
    spark = get_spark(app_name="sf1-scale-check")
    if "--skip-gen" not in sys.argv and not os.path.exists(
        f"{SF1}/documents.parquet"
    ):
        build_sf1(spark)

    # warm-up: run the whole cohort once UNTIMED at sf0.1 before any
    # measurement (r11 review #9 — the old ordering ran sf0.1 on a
    # cold JVM and sf1 fully warmed, so JIT/codegen/first-touch costs
    # inflated the sf0.1 denominator and systematically DEFLATED
    # scaling_factor_10x in the direction that flatters the
    # at-or-below-linear conclusion this record exists to certify)
    for q in COHORT:
        qs[q](spark, SF01).count()
        print(f"warmup {q}: done", flush=True)

    results = {}
    for sf_name, sf_dir in [("sf0.1", SF01), ("sf1", SF1)]:
        for q in COHORT:
            t0 = time.monotonic()
            n = qs[q](spark, sf_dir).count()
            dt = round(time.monotonic() - t0, 2)
            results.setdefault(q, {})[sf_name] = {"sec": dt, "rows": n}
            print(f"{sf_name} {q}: {dt}s ({n} rows)", flush=True)

    for q, r in results.items():
        r["scaling_factor_10x"] = round(r["sf1"]["sec"] / max(r["sf0.1"]["sec"], 1e-9), 2)

    record = {
        "note": "10x replica of sf0.1 (word-prefix salted per replica; "
                "see scripts/sf1_scale_check.py), one uncontended pass per "
                "scale; scaling_factor_10x = sec(sf1)/sec(sf0.1), linear == 10",
        "results": results,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the UNTRACKED sidecar got the r10 record silently dropped (fresh
    # checkout -> bench.py regenerates it without the key); the TRACKED
    # SCALE.md is now the durable home (VERDICT r10 task #3) and the
    # sidecar merge is kept only as the machine-readable mirror
    path = os.path.join(repo, "bench_summary.json")
    summary = json.load(open(path)) if os.path.exists(path) else {}
    summary["sf1_scale_check"] = record
    json.dump(summary, open(path, "w"), indent=1)
    with open(os.path.join(repo, "SCALE.md"), "w") as f:
        f.write(
            "# SCALE — 10x scale spot-check (tracked record)\n\n"
            "Harness: `scripts/sf1_scale_check.py` (this file is written by\n"
            "it on every run). Method: one uncontended pass of the flagship\n"
            "dedup/ANN cohort at sf0.1 and at a 10x word-prefix-salted\n"
            "replica (independent same-shape corpora, cross-replica\n"
            "Jaccard 0). `scaling_factor_10x = sec(sf1)/sec(sf0.1)`;\n"
            "linear scaling == 10, fixed-cost-bound entries sit near 1.\n\n"
            "```json\n" + json.dumps(record, indent=1) + "\n```\n"
        )
    print(json.dumps({q: r["scaling_factor_10x"] for q, r in results.items()}))


if __name__ == "__main__":
    main()
