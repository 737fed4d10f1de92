"""Benchmark: run the engine's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (order-controlled, warm):
- Queries run in FIXED canonical (sorted-by-name) order, decoupled from
  the queries() dict order — dict order encodes oracle-verification
  priority and changes between rounds, which made round-over-round
  per-query deltas unattributable (position effects swamped real ones).
- Warmup runs representative queries first — one pandas-UDF query so
  the Python worker pool is up, one parquet scan/agg so the JVM, codegen
  and shuffle paths are hot — so the first measured query doesn't pay
  session amortization.
- SPARK_GRAFT_BENCH_PASSES=N (default 2) measures N passes and reports
  the per-query MIN — the low-noise figure for regression attribution.

Round-8 attribution note (VERDICT r7 tasks #1/#5): the four r7
"regressions" with no code change (simhash_neardup, knn_join,
similarity_ann, similarity_topk) all recovered on a quiet machine
(3.30/2.15/1.66/1.42 s vs r6's 2.93/1.90/1.30/1.16) — confirmed
suite-load noise, within the verdict's 1.2x tolerance of r6. The one
real regression, winnow_overlap (1.94 -> 3.78 s), was the overlap
self-join evaluating the fingerprint UDF once per side; fixed with a
localCheckpoint (single evaluation): 1.33 s in the same full-suite
min-of-2, beating both r6 and the <= 2.0 s target.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from platypus_ingestion_plugins_spark.session import get_spark

# pandas-UDF (python worker pool) + scan/agg codegen + the shingle
# tokenize/explode pipeline + a shuffle join (SMJ/exchange codegen) + a
# real streaming query (checkpoint, state store, foreachBatch) — the
# r6 bench showed whatever ran first in alphabetical order paying the
# cold path for machinery the old warmup never touched (asof_join
# 0.21->0.77s, anti_join 0.39->1.26s, cdc_last_wins 0.49->1.06s)
WARMUP = (
    "multimodal_features",
    "tpch_q1",
    "dedup_ngram_jaccard",
    "semi_join",
    "stream_dedup_exact",
)


def _stream_noop_floor(spark) -> float:
    """Wall-clock of one checkpointed availableNow stream over a
    2-row parquet source with a no-op foreachBatch — the per-drop
    fixed overhead every stream_* bench entry pays before touching
    data. Runs after warmup so it measures steady-state setup cost,
    not first-stream JVM amortization."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="bench_stream_floor_")
    try:
        src = os.path.join(work, "src")
        spark.range(2).write.parquet(src)
        t0 = time.perf_counter()
        q = (
            spark.readStream.schema("id long")
            .parquet(src)
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    # default 2: the r6 bench showed a single pass charges whatever runs
    # first in canonical order with cold-machinery residue the warmup
    # can't fully cover (agg_rollup 0.47->1.66s with identical plans);
    # min-of-2 is the attributable figure
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))

    spark = get_spark("bench")
    spark.range(1).count()

    qs = E.queries()
    for name in WARMUP:
        if name in qs:
            qs[name](spark, sf_dir).count()
            spark.catalog.clearCache()
    # measured fixed cost of ONE checkpointed availableNow micro-stream
    # over trivial data: the stream_* queries each pay this per drop
    # regardless of data volume (VERDICT r13 task #8 — ~2-8 s per
    # streaming oracle at sf0.1 is trigger/checkpoint setup, not rows;
    # report the floor next to the totals so regression attribution can
    # subtract it instead of reading setup noise as data signal)
    stream_floor = round(_stream_noop_floor(spark), 3)
    # Shared read-only term-index builds as their OWN timed lines
    # (VERDICT r14 task #1): _term_index_for memoizes one index per
    # (sf_dir, positions) scheme, so in a single-pass run whichever
    # indexed query sorts first paid the whole build — r14 charged
    # hybrid_indexed 5.39 s for a 2.6 s query. Pre-build both schemes
    # here, timed separately, so every indexed query measures pure
    # query cost and the build stays visible for attribution.
    index_build = {}
    if hasattr(E, "_term_index_for"):
        for positions in (False, True):
            t0 = time.perf_counter()
            E._term_index_for(spark, sf_dir, positions=positions)
            key = "positional" if positions else "plain"
            index_build[f"term_index_build_{key}_sec"] = round(
                time.perf_counter() - t0, 3
            )

    all_runs: dict[str, list[float]] = {}
    for p in range(passes):
        for name in sorted(qs):  # canonical order, stable across rounds
            fn = qs[name]
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()  # execute the full plan
            dt = time.perf_counter() - t0
            all_runs.setdefault(name, []).append(dt)
            print(f"# pass{p} {name}: {n} rows in {dt:.2f}s", file=sys.stderr)
            # queries are independent jobs: drop any cached/checkpointed
            # blocks an operator pinned so later timings aren't distorted
            # by block-manager pressure from earlier ones. clearCache
            # only covers cached relations; localCheckpoint blocks are
            # freed by the JVM ContextCleaner, which waits for the
            # PYTHON references to die — collect them now so the 90th
            # query isn't benched against 89 queries of block litter
            del df
            gc.collect()
            spark.catalog.clearCache()

    timings = {name: round(min(runs), 3) for name, runs in all_runs.items()}
    total = round(sum(timings.values()), 3)
    # the stream/batch split + measured per-drop setup floor (VERDICT
    # r13 task #8): stream_* totals are dominated by checkpoint/trigger
    # fixed cost at bench scale; the split keeps that visible so a
    # "stream_x regressed 1.3x" reading can check whether DATA work or
    # session setup moved
    stream_names = [n for n in timings if n.startswith("stream_")]
    stream_split = {
        "stream_sum_sec": round(sum(timings[n] for n in stream_names), 3),
        "batch_sum_sec": round(
            total - sum(timings[n] for n in stream_names), 3
        ),
        "n_stream_queries": len(stream_names),
        "stream_noop_floor_sec": stream_floor,
    }
    # Variance control for the slow cohort (VERDICT r8 task #6): the >2 s
    # queries are all streaming/maintenance entries where machine noise
    # swamped r7's regression attribution — record min AND median for
    # them (min stays the headline figure used in "queries"/"value").
    variance = {}
    for name, runs in all_runs.items():
        if min(runs) > 2.0 and len(runs) > 1:
            s = sorted(runs)
            mid = len(s) // 2
            med = s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2
            variance[name] = {"min": round(s[0], 3), "med": round(med, 3)}
    # Contention heuristic (VERDICT r11 task #7): driver-run inflation
    # (other processes sharing the box) has twice triggered a round of
    # regression forensics. Compare this run's per-query timings to the
    # tracked sidecar (the last committed, known-uncontended builder
    # run): the MEDIAN ratio over common queries is robust to a few
    # real regressions — a genuinely regressed query moves its own
    # ratio, machine contention moves ALL of them.
    sidecar = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_summary.json")
    contended = None
    median_ratio = None
    sf_key = str(sf)
    tracked_by_sf: dict = {}
    try:
        with open(sidecar) as f:
            prev = json.load(f)
        # the tracked reference is the MIN-OF-HISTORY floor, KEYED BY
        # SF (an sf0.001 smoke run must not become the floor an sf0.1
        # driver run is judged against), so a contended run that
        # overwrites the sidecar can never raise — and a cross-sf run
        # can never lower — the baseline used next time
        t = prev.get("tracked_queries_by_sf")
        if isinstance(t, dict):
            tracked_by_sf = {
                k: dict(v) for k, v in t.items() if isinstance(v, dict)
            }
        elif str(prev.get("sf")) == sf_key and isinstance(
            prev.get("queries"), dict
        ):
            tracked_by_sf = {sf_key: dict(prev["queries"])}
    except (OSError, ValueError):
        pass
    tracked_prev = tracked_by_sf.get(sf_key, {})
    ratios = sorted(
        timings[n] / tracked_prev[n]
        for n in timings
        if n in tracked_prev and tracked_prev[n] > 0.05
    )
    if len(ratios) >= 8:
        mid = len(ratios) // 2
        median_ratio = round(
            ratios[mid] if len(ratios) % 2
            else (ratios[mid - 1] + ratios[mid]) / 2, 3
        )
        contended = median_ratio > 1.25
    tracked_by_sf[sf_key] = {
        n: round(min(t, tracked_prev.get(n, t)), 3)
        for n, t in timings.items()
    }
    summary = {
        "metric": "sum_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "stream_split": stream_split,
        "variance_gt2s": variance,
        "index_build": index_build,
        "contended": contended,
        "median_ratio_vs_tracked": median_ratio,
        "tracked_queries_by_sf": tracked_by_sf,
        "sf": sf,
    }
    # BENCH_r07 AND r08 recorded "parsed": null — the driver tail-captures
    # only ~2.2 KB of stdout and the single summary line (~2.5 KB at 95
    # queries) got its FRONT clipped, breaking the JSON parse, two rounds
    # running. Fix (VERDICT r8 task #1): the full per-query object goes to
    # the sidecar file AND an earlier stdout line; the FINAL flushed line
    # carries only {"metric","value","unit","sf"} (~80 bytes) so it can
    # never outgrow the capture window regardless of query count.
    full_line = json.dumps(summary, separators=(",", ":"))
    try:
        # the sidecar also carries records other harnesses leave there
        # (scripts/sf1_scale_check.py) — merge, don't wipe
        try:
            with open(sidecar) as f:
                prev = json.load(f)
            if isinstance(prev, dict):  # a non-dict sidecar is garbage
                for k, v in prev.items():
                    if k not in summary:
                        summary[k] = v
        except (OSError, ValueError):
            pass
        with open(sidecar, "w") as f:
            f.write(json.dumps(summary, separators=(",", ":")) + "\n")
    except OSError:
        pass  # read-only checkout: stdout lines are still authoritative
    print(full_line, flush=True)
    # Driver-parsable per-query data (VERDICT r16 task #2). The driver
    # tail-captures the LAST 2000 bytes of stdout (BENCH_r16.json
    # "tail" is exactly 2000 chars), so a names-keyed per-query dict
    # (~5.8 KB at 262 queries) can NEVER survive the capture — that is
    # the driver-side limitation that left PERF_r15/r16 per_query
    # empty. What CAN survive: (a) named per-query chunk lines, each
    # well under 2 KB, for harnesses that capture more than the tail;
    # (b) one compact values-only line — centiseconds in CANONICAL
    # (sorted-by-name) order, the same order the bench runs in — that
    # fits INSIDE the 2000-byte window together with the final summary
    # line (~1.25 KB combined at 262 queries), so the captured tail
    # always carries complete, machine-recoverable per-query timings
    # (names = sorted(queries); "names_sha" pins the name list so a
    # mismatched reconstruction fails loudly instead of silently).
    import hashlib

    ordered = sorted(timings)
    for i in range(0, len(ordered), 40):
        chunk = {n: timings[n] for n in ordered[i:i + 40]}
        print(json.dumps(
            {"metric": "per_query_sec", "chunk": i // 40,
             "n_chunks": (len(ordered) + 39) // 40, "queries": chunk},
            separators=(",", ":")), flush=True)
    names_sha = hashlib.sha256("\n".join(ordered).encode()).hexdigest()[:12]
    compact = {"metric": "per_query_csec", "order": "sorted_names",
               "n": len(ordered), "names_sha": names_sha,
               "values": [int(round(timings[n] * 100)) for n in ordered]}
    print(json.dumps(compact, separators=(",", ":")), flush=True)
    short = {"metric": "sum_query_wall_sec", "value": total,
             "unit": "sec", "sf": sf, "contended": contended,
             "median_ratio_vs_tracked": median_ratio}
    print(json.dumps(short, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
