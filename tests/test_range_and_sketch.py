"""Range join blocking semantics and the deterministic distinct sketch."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.functions.sketches import distinct_estimate
from platypus_ingestion_plugins_spark.operators.range_join import range_join


def test_range_join_matches_naive(spark):
    points = spark.createDataFrame(
        [Row(pid=i, x=float(i)) for i in range(50)]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid=0, lo=0.0, hi=10.0),
            Row(iid=1, lo=5.0, hi=6.0),       # narrower than a bucket
            Row(iid=2, lo=38.5, hi=62.0),     # spans several buckets
            Row(iid=3, lo=100.0, hi=200.0),   # matches nothing
        ]
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(points, intervals, "x", "lo", "hi", bucket_width=8.0).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
        .collect()
    }
    assert got == naive
    assert (5, 1) in got and (5, 0) in got  # overlap -> multiple matches
    assert not any(iid == 3 for _, iid in got)
    # half-open: hi itself excluded
    assert (10, 0) not in got and (6, 1) not in got


def test_range_join_fractional_bucket_edges(spark):
    points = spark.createDataFrame([Row(pid=0, x=7.25), Row(pid=1, x=7.75)])
    intervals = spark.createDataFrame([Row(iid=0, lo=7.5, hi=7.8)])
    got = {
        (r.pid, r.iid)
        for r in range_join(points, intervals, "x", "lo", "hi", bucket_width=0.5).collect()
    }
    assert got == {(1, 0)}


def test_distinct_sketch_accuracy(spark):
    n = 3000
    df = spark.range(n * 3).select((F.col("id") % n).alias("v"))
    est = df.agg(distinct_estimate("v", m=64).alias("e")).collect()[0].e
    # ~1/sqrt(64) = 12.5% relative error; allow 3 sigma
    assert abs(est - n) / n < 0.4, est
    # deterministic: same input -> bit-identical estimate
    est2 = df.agg(distinct_estimate("v", m=64).alias("e")).collect()[0].e
    assert est == est2


def test_distinct_sketch_dup_invariant(spark):
    a = spark.range(100).select(F.col("id").alias("v"))
    b = spark.range(100).union(spark.range(100)).select(F.col("id").alias("v"))
    ea = a.agg(distinct_estimate("v", m=32).alias("e")).collect()[0].e
    eb = b.agg(distinct_estimate("v", m=32).alias("e")).collect()[0].e
    assert ea == eb  # duplicates never move the estimate


def test_countmin_overestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from platypus_ingestion_plugins_spark.functions.sketches import (
        countmin_counters,
        countmin_estimate,
    )

    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 10 + [("c",)] * 1, "k string"
    )
    counters = countmin_counters(df, "k", depth=4, width=64)
    keys = df.select("k").distinct()
    est = {r.k: r.est_count for r in countmin_estimate(counters, keys, "k", 4, 64).collect()}
    # count-min never underestimates; with 3 keys in 64 buckets it's exact
    assert est["a"] >= 50 and est["b"] >= 10 and est["c"] >= 1
    assert sum(est.values()) <= 61 + 3 * 61  # sanity bound on collision mass
    # mergeability: counters over two halves, summed cellwise == whole
    d1 = spark.createDataFrame([("a",)] * 20 + [("b",)] * 4, "k string")
    d2 = spark.createDataFrame([("a",)] * 30 + [("b",)] * 6 + [("c",)] * 1, "k string")
    h1 = countmin_counters(d1, "k", depth=4, width=64)
    h2 = countmin_counters(d2, "k", depth=4, width=64)
    merged = (
        h1.unionByName(h2).groupBy("i", "b").agg(F.sum("c").alias("c"))
    )
    whole = {(r.i, r.b): r.c for r in counters.collect()}
    got = {(r.i, r.b): r.c for r in merged.collect()}
    assert got == whole


def test_bloom_filter_membership_and_decontam(spark):
    """Bloom sketch: NO false negatives (every member probes true),
    definite-absent values probe false at a sane FP rate, filters
    merge by elementwise OR, and the bloom decontam pre-screen flags
    a superset of the exact contamination audit."""
    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.functions.sketches import (
        bloom_build,
        bloom_maybe_contains,
    )
    from platypus_ingestion_plugins_spark.operators import decontam

    members = spark.createDataFrame([Row(v=f"member-{i}") for i in range(200)])
    words = bloom_build(members, "v", num_bits=1 << 12, num_hashes=4)
    assert len(words) == (1 << 12) // 32 and any(words)

    probe = spark.createDataFrame(
        [Row(v=f"member-{i}") for i in range(200)]
        + [Row(v=f"absent-{i}") for i in range(500)]
    )
    got = probe.withColumn(
        "hit", bloom_maybe_contains(F.col("v"), words, num_hashes=4)
    )
    hits = {r.v for r in got.filter("hit").collect()}
    assert all(f"member-{i}" in hits for i in range(200)), "false negative!"
    fp = sum(1 for v in hits if v.startswith("absent-"))
    assert fp / 500 < 0.15, f"implausible FP rate: {fp}/500"

    # merge = elementwise OR
    more = spark.createDataFrame([Row(v=f"extra-{i}") for i in range(50)])
    words2 = bloom_build(more, "v", num_bits=1 << 12, num_hashes=4)
    merged = [a | b for a, b in zip(words, words2)]
    mhits = {
        r.v
        for r in probe.union(more)
        .withColumn("hit", bloom_maybe_contains(F.col("v"), merged, num_hashes=4))
        .filter("hit")
        .collect()
    }
    assert hits <= mhits and all(f"extra-{i}" in mhits for i in range(50))

    # decontam pre-screen: superset of the exact audit, counts >= exact
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"alpha beta gamma delta unique{i} tail{i}")
         for i in range(30)]
        + [Row(doc_id=100, text="alpha beta gamma benchmark phrase here")]
    )
    bench = docs.filter("doc_id = 100")
    train = docs.filter("doc_id <> 100")
    exact = {
        r.doc_id: r.n_contaminated
        for r in decontam.contaminated_docs(train, bench, "text", "doc_id", n=3).collect()
    }
    bloom = {
        r.doc_id: r.n_flagged_grams
        for r in decontam.contaminated_docs_bloom(
            train, bench, "text", "doc_id", n=3, num_bits=1 << 12, num_hashes=4
        ).collect()
    }
    assert set(exact) <= set(bloom)
    assert all(bloom[d] >= n for d, n in exact.items())


def test_bottomk_quantile_sketch(spark):
    """Bottom-k quantile sketch: estimates land within the sample
    error of the exact quantiles, the result is invariant to input
    partitioning (hash membership, not partition luck), and two
    sketches merge by union + re-bottom-k to the full-data sketch."""
    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.functions.sketches import (
        bottomk_quantiles,
    )
    from platypus_ingestion_plugins_spark.functions.sampling import unit_hash

    rows = [Row(rid=i, v=float(i)) for i in range(4000)]  # uniform 0..3999
    df = spark.createDataFrame(rows)
    est = bottomk_quantiles(
        df, "rid", "v", probs=(0.25, 0.5, 0.9), k=512
    ).collect()[0]
    assert est.n_sample == 512
    # 1/sqrt(512) ~ 4.4%; allow 3 sigma
    for q, p in ((est.q_0_25, 0.25), (est.q_0_5, 0.5), (est.q_0_9, 0.9)):
        assert abs(q / 3999.0 - p) < 0.14, (q, p)

    # partitioning invariance
    est2 = bottomk_quantiles(
        df.repartition(13), "rid", "v", probs=(0.25, 0.5, 0.9), k=512
    ).collect()[0]
    assert (est.q_0_25, est.q_0_5, est.q_0_9) == (est2.q_0_25, est2.q_0_5, est2.q_0_9)

    # merge: bottom-k of the union of two halves' bottom-k == full sketch
    u = unit_hash("rid", "bottomk")
    halves = [
        df.filter(f"rid % 2 = {m}").select(u.alias("__u"), "v")
        .orderBy("__u", "v").limit(512)
        for m in (0, 1)
    ]
    merged = halves[0].union(halves[1]).orderBy("__u", "v").limit(512)
    m_est = merged.agg(
        F.round(F.percentile("v", F.lit(0.5)), 6).alias("q")
    ).collect()[0].q
    assert m_est == est.q_0_5


def test_countmin_streaming_merge_idempotent_and_heals(spark, tmp_path):
    """countmin_merge_into: two merged batches equal the one-shot
    sketch, a REPLAYED batch (same batch_id) is skipped by the
    epoch pin instead of double-counting, and a crash that leaves
    only the parked dir heals on read."""
    import os

    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.functions.sketches import (
        countmin_counters,
        countmin_merge_into,
        countmin_read,
    )

    rows = [Row(i=i, k=f"t{i % 5}") for i in range(300)]
    df = spark.createDataFrame(rows)
    b1 = df.filter("i < 120")
    b2 = df.filter("i >= 120")
    path = str(tmp_path / "cm")

    countmin_merge_into(b1, "k", path, depth=3, width=64, batch_id=0)
    countmin_merge_into(b2, "k", path, depth=3, width=64, batch_id=1)
    onehot = {
        (r.i, r.b): r.c
        for r in countmin_counters(df, "k", depth=3, width=64).collect()
    }
    got = {(r.i, r.b): r.c for r in countmin_read(spark, path).collect()}
    assert got == onehot

    # replay of batch 1 must be a no-op (ADD is not idempotent; the
    # epoch pin is)
    countmin_merge_into(b2, "k", path, depth=3, width=64, batch_id=1)
    again = {(r.i, r.b): r.c for r in countmin_read(spark, path).collect()}
    assert again == onehot, "replayed batch double-counted"

    # crash mid-swap: only the park survives -> heal on read
    os.rename(path, path + ".old")
    healed = {(r.i, r.b): r.c for r in countmin_read(spark, path).collect()}
    assert healed == onehot and os.path.exists(path)


def test_bottomk_streaming_merge(spark, tmp_path):
    """bottomk_merge_into: two merged batches equal the one-shot
    bottom-k sample (hash membership is batch-split independent), a
    replayed batch is epoch-skipped, and crash-heal promotes the
    park — the quantile twin of the count-min maintenance."""
    import os

    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.functions.sampling import unit_hash
    from platypus_ingestion_plugins_spark.functions.sketches import (
        bottomk_merge_into,
        sketch_read,
    )

    rows = [Row(rid=i, v=float(i * 3 % 101)) for i in range(500)]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "bk")
    bottomk_merge_into(df.filter("rid < 250"), "rid", "v", path, k=64, batch_id=0)
    bottomk_merge_into(df.filter("rid >= 250"), "rid", "v", path, k=64, batch_id=1)

    oneshot = sorted(
        (r.u, r.v)
        for r in df.select(unit_hash("rid", "bottomk").alias("u"), "v")
        .orderBy("u", "v").limit(64).collect()
    )
    got = sorted((r.u, r.v) for r in sketch_read(spark, path).collect())
    assert got == oneshot

    # replay is a no-op
    bottomk_merge_into(df.filter("rid >= 250"), "rid", "v", path, k=64, batch_id=1)
    assert sorted((r.u, r.v) for r in sketch_read(spark, path).collect()) == oneshot

    # crash-heal
    os.rename(path, path + ".old")
    assert sorted((r.u, r.v) for r in sketch_read(spark, path).collect()) == oneshot
