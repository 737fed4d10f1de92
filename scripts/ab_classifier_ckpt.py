"""A/B: the r16 single-evaluation checkpoint on the classifier feature
frames, re-examined at sf1 (the refreshed scale check read
quality_classifier sf1 at 12.5-13.3 s across two runs vs the r15
record's 8.3 s, while the same change wins at sf0.1).

Arms, interleaved in one session (min-of-N):
  ckpt   — feats.localCheckpoint(eager=False)  (the r16 shape)
  none   — feats unreferenced twice, extraction recomputed (r15 shape)
  eager  — feats.localCheckpoint(eager=True)

Usage: python scripts/ab_classifier_ckpt.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from pyspark.sql import functions as F
from platypus_ingestion_plugins_spark.functions.classifier import (
    char_gram_features,
    doc_features,
    predict_ovr,
    score_logreg,
    train_logreg,
    train_logreg_ovr,
)
from platypus_ingestion_plugins_spark.session import get_spark


def run_quality(spark, sf, mode: str):
    d = E._t(spark, sf, "documents")
    labels = d.select("doc_id", (F.col("lang") == "en").cast("int").alias("y"))
    feats = doc_features(d, "text", "doc_id", dim=4096)
    if mode == "ckpt":
        feats = feats.localCheckpoint(eager=False)
    elif mode == "eager":
        feats = feats.localCheckpoint(eager=True)
    w = train_logreg(feats, labels, "doc_id", "y", iters=2, lr=1.0)
    out = score_logreg(feats, w, "doc_id").select(
        "doc_id", F.round("margin", 6).alias("margin")
    )
    return out.count()


def run_language(spark, sf, mode: str):
    d = E._t(spark, sf, "documents")
    feats = char_gram_features(d, "text", "doc_id", n=3, dim=2048)
    if mode == "ckpt":
        feats = feats.localCheckpoint(eager=False)
    elif mode == "eager":
        feats = feats.localCheckpoint(eager=True)
    w = train_logreg_ovr(
        feats.filter(F.col("doc_id") % 10 == 0),
        d.select("doc_id", "lang").filter(F.col("doc_id") % 10 == 0),
        "doc_id", "lang", iters=2,
    )
    return predict_ovr(feats, w, "doc_id", out_col="pred_lang").count()


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab_classifier_ckpt")
    spark.sparkContext.setLogLevel("ERROR")
    run_quality(spark, sf, "none")  # warmup
    best: dict[tuple[str, str], float] = {}
    counts: dict[str, set] = {"quality": set(), "language": set()}
    for p in range(passes):
        for mode in ("ckpt", "none", "eager"):
            for name, fn in (("quality", run_quality), ("language", run_language)):
                spark.sparkContext.setJobDescription(f"{name} {mode} pass={p}")
                t0 = time.monotonic()
                n = fn(spark, sf, mode)
                dt = time.monotonic() - t0
                counts[name].add(n)
                best[(name, mode)] = min(best.get((name, mode), dt), dt)
                print(f"pass={p} {name} {mode}: {dt:.2f}s rows={n}", flush=True)
                spark.catalog.clearCache()
    print(f"\n== min-of-{passes} ==")
    for (name, mode), dt in sorted(best.items()):
        print(f"{name} {mode}: {dt:.2f}s")
    for name, ns in counts.items():
        assert len(ns) == 1, f"{name} row counts differ: {ns}"
    spark.stop()


if __name__ == "__main__":
    main()
