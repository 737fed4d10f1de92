"""Extension operators: dedup, similarity, text analysis, as-of join,
multimodal plumbing — small known-answer cases."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from platypus_ingestion_plugins_spark.functions import text as TX
from platypus_ingestion_plugins_spark.operators import asof, dedup, multimodal, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=3, text="completely different content about spark engines"),
        Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    ]
    return spark.createDataFrame(rows).cache()


def test_exact_dedup(docs):
    out = {r.doc_id: r.n_copies for r in dedup.exact_dedup(docs, "text", "doc_id").collect()}
    assert out == {1: 2, 2: 1, 3: 1}


def test_shingles(docs):
    sh = dedup.shingles(docs.filter("doc_id=1"), "text", "doc_id", n=3).collect()
    got = {r.shingle for r in sh}
    assert "the quick brown" in got and "the lazy dog" in got
    assert len(got) == 7  # 9 tokens -> 7 trigrams, all distinct

def test_ngram_jaccard_pairs(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.4).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in got and 0.4 <= got[(1, 2)] < 1.0  # near dup
    assert not any(3 in p for p in got)


def test_minhash_lsh_finds_exact_dups(docs):
    pairs = dedup.minhash_lsh_dedup_pairs(docs, "text", "doc_id", threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 4)}


def test_minhash_lsh_verify_shapes_agree(monkeypatch, docs):
    """The r16 size-gated dual verify (the dedup_minhash_lsh bisect):
    the small-corpus exploded equi-join and the large-corpus
    hashed-array intersect must emit identical (id_a, id_b, jaccard)
    rows — the gate picks a plan, never a result."""
    from platypus_ingestion_plugins_spark.operators import dedup as D

    results = {}
    for label, size in (("small", 0), ("big", 1 << 40)):
        monkeypatch.setattr(D, "_plan_size_bytes", lambda df, s=size: s)
        got = D.minhash_lsh_dedup_pairs(
            docs, "text", "doc_id", n=3, threshold=0.1
        ).collect()
        results[label] = sorted((r.id_a, r.id_b, r.jaccard) for r in got)
    assert results["small"] == results["big"]
    assert results["small"]  # the fixture has near-dup pairs


def test_dedup_family_leaves_no_leaked_storage(spark, docs):
    """In a long-lived session (a streaming driver, a notebook), an
    operator that pins storage without a bounded lifetime accumulates
    executor memory across calls. Contract (matching winnow's
    documented single-evaluation checkpoint): operators MAY
    localCheckpoint for the lifetime of the returned frame — the
    blocks must be gone once the caller releases it and the context
    cleaner runs. (The r1-r8 form demanded zero persisted state even
    while the frame was alive; ngram_jaccard_pairs now checkpoints its
    sized shingle frame so the tokenize map stage runs once per query
    instead of once per self-join side.)"""
    import gc
    import time

    docs.count()  # materialize the fixture's own cache() into the baseline
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    frames = [
        dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.4),
        dedup.minhash_lsh_dedup_pairs(docs, "text", "doc_id"),
        dedup.jaccard_join(
            docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"),
            "text", "doc_id",
        ),
    ]
    for f in frames:
        f.count()
    frames.clear()
    del f  # the loop variable still pins the LAST frame (r12 flake)
    # 360 s: the ContextCleaner polls weak refs lazily and falls far
    # behind when the whole suite is loading all 32 cores — the 30 s
    # form flaked in the r10 full-suite run, the 90 s form once in an
    # r12 full-suite run, and the 150 s form in an r17 full-suite run
    # on a contended box (that pass took ~120-150 s even standalone).
    # The deadline only bounds the FAILURE path; a clean run exits the
    # loop as soon as the cleaner catches up.
    deadline = time.time() + 360
    while time.time() < deadline:
        gc.collect()  # drop py4j refs so the JVM weak refs can enqueue
        spark._jvm.System.gc()  # ContextCleaner only polls enqueued refs
        after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
        if after <= before:
            break
        time.sleep(0.5)
    assert after <= before, f"leaked persisted RDDs: {sorted(after - before)}"


def test_shingle_df_cap(spark):
    # every doc shares exactly one hot trigram; df cap 2 removes it
    rows = [
        Row(doc_id=i, text=f"common phrase here unique{i} token{i} word{i}")
        for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    uncapped = dedup.ngram_jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.01)
    assert uncapped.count() == 6  # all pairs share 'common phrase here'
    capped = dedup.ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=0.01, max_shingle_df=2
    )
    assert capped.count() == 0
    # LSH path: exact dups survive a generous cap
    docs2 = df.union(spark.createDataFrame(
        [Row(doc_id=10, text="common phrase here unique0 token0 word0")]
    ))
    lsh = dedup.minhash_lsh_dedup_pairs(
        docs2, "text", "doc_id", threshold=0.9, max_shingle_df=3
    )
    assert {(r.id_a, r.id_b) for r in lsh.collect()} == {(0, 10)}


def test_simhash_close_for_neardups(docs):
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert fp[1] == fp[4]  # identical text -> identical fingerprint
    ham_near = bin(fp[1] ^ fp[2]).count("1")
    ham_far = bin(fp[1] ^ fp[3]).count("1")
    assert ham_near <= ham_far


def test_cosine_and_topk(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(
            [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]]
        )]
    )
    q = emb.filter("vec_id = 0")
    top = similarity.brute_force_topk(emb, q, k=2).collect()
    assert [r.vec_id for r in top] == [0, 1]
    assert top[0].cos_sim == 1.0
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(top[1].cos_sim - round(expected, 6)) < 1e-9


def test_ann_bucket_restricts(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in enumerate(
            [[1.0, 1.0, 1.0, 1.0], [0.9, 0.9, 0.9, 0.9], [-1.0, 1.0, 1.0, 1.0]]
        )]
    )
    q = emb.filter("vec_id = 0")
    got = [r.vec_id for r in similarity.ann_topk(emb, q, k=5, bits=4).collect()]
    assert got == [0, 1]  # vec 2 is in another sign bucket


def test_ivf_probe_restricts(spark):
    # centroids = two lowest ids: vec 0 ~ x-axis cluster, vec 1 ~ y-axis.
    # nprobe=1 from an x-axis query must only see the x-list — vec 3 is
    # a better cosine match than 2 but lives in the y-list.
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.0, 1.0]),
            Row(vec_id=2, embedding=[1.0, 0.2]),
            Row(vec_id=3, embedding=[0.55, 0.6]),  # nearest centroid: y
        ]
    )
    q = emb.filter("vec_id = 0")
    got = [
        r.vec_id
        for r in similarity.ivf_topk(emb, q, k=4, n_centroids=2, nprobe=1).collect()
    ]
    assert got == [0, 2]
    # nprobe=2 probes both lists -> full recall
    all_got = [
        r.vec_id
        for r in similarity.ivf_topk(emb, q, k=4, n_centroids=2, nprobe=2).collect()
    ]
    assert set(all_got) == {0, 1, 2, 3}


def test_neardup_pairs(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0]), Row(vec_id=1, embedding=[0.999, 0.01]),
         Row(vec_id=2, embedding=[0.0, 1.0])]
    )
    pairs = similarity.neardup_pairs(emb, threshold=0.99).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]


def test_text_functions(spark):
    df = spark.createDataFrame([Row(text="The cat and the dog, of course!")])
    row = df.select(
        TX.token_count("text").alias("n"),
        TX.language_id("text").alias("lang"),
        TX.fingerprint("text").alias("fp"),
        TX.subword_count_estimate("text").alias("sub"),
        TX.quality_score("text").alias("q"),
    ).collect()[0]
    assert row.n == 7
    assert row.lang == "en"
    assert len(row.fp) == 32
    assert row.sub == 8  # 31 chars / 4 -> ceil
    assert 0.0 <= row.q <= 1.0
    # fingerprint invariant under token order/duplication
    df2 = spark.createDataFrame([Row(text="dog THE course of and cat the")])
    assert df2.select(TX.fingerprint("text").alias("fp")).collect()[0].fp == row.fp


def test_multimodal_resize(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a" * 100), Row(doc_id=2, text="bc")]
    )
    resized = {
        r.doc_id: r
        for r in multimodal.resize(
            multimodal.attach_payload(df, "text"), target_bytes=10
        ).collect()
    }
    assert resized[1].orig_bytes == 100 and resized[1].resized_bytes == 10
    assert resized[2].resized_bytes == 2  # already under target -> unchanged
    assert bytes(resized[2].payload) == b"bc"
    # deterministic stride sample
    assert bytes(resized[1].payload) == b"a" * 10


def test_asof_join(spark):
    trades = spark.createDataFrame(
        [Row(sym="A", t=3, qty=10), Row(sym="A", t=7, qty=20), Row(sym="B", t=5, qty=5)]
    )
    quotes = spark.createDataFrame(
        [Row(sym="A", t=1, px=100.0), Row(sym="A", t=5, px=101.0),
         Row(sym="A", t=7, px=102.0), Row(sym="B", t=9, px=50.0)]
    )
    out = asof.asof_join(trades, quotes, key="sym", on="t").collect()
    got = {(r.sym, r.t): (r.t_right, r.px_right) for r in out}
    assert got[("A", 3)] == (1, 100.0)
    assert got[("A", 7)] == (7, 102.0)  # inclusive
    assert got[("B", 5)] == (None, None)  # no prior quote
    strict = asof.asof_join(trades, quotes, key="sym", on="t", strict=True).collect()
    sgot = {(r.sym, r.t): (r.t_right, r.px_right) for r in strict}
    assert sgot[("A", 7)] == (5, 101.0)  # strict excludes equal-time


def test_asof_join_null_payload_is_atomic(spark):
    # the matched right row carries a legitimate NULL in one payload
    # column; it must NOT backfill from the older right row
    trades = spark.createDataFrame([Row(sym="A", t=10, qty=1)])
    quotes = spark.createDataFrame(
        [
            Row(sym="A", t=1, px=100.0, venue="X"),
            Row(sym="A", t=5, px=None, venue="Y"),
        ],
        "sym string, t bigint, px double, venue string",
    )
    out = asof.asof_join(trades, quotes, key="sym", on="t").collect()[0]
    assert out.t_right == 5
    assert out.venue_right == "Y"
    assert out.px_right is None  # not 100.0 from the t=1 row


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world"), Row(doc_id=2, text="x" * 200)])
    with_payload = multimodal.attach_payload(df, "text", mime="text/plain")
    assert dict(with_payload.select("doc_id", "media_meta.n_bytes").collect()) == {1: 11, 2: 200}
    feats = multimodal.extract_features(with_payload, dim=4).collect()
    by_id = {r.doc_id: r for r in feats}
    assert len(by_id[1].feature) == 4
    assert by_id[2].n_bytes == 200
    # deterministic: same payload -> same feature
    feats2 = multimodal.extract_features(with_payload, dim=4).collect()
    assert {r.doc_id: r.feature for r in feats2} == {r.doc_id: r.feature for r in feats}


def test_payload_externalize_roundtrip(spark, tmp_path):
    """Mixed inline/external rows survive the pointer round trip:
    payloads over the threshold land in per-partition packed blobs and
    come back byte-identical via ranged reads; small ones ride inline;
    NULL stays NULL. Downstream rows carry only the skinny struct."""
    rows = [
        Row(doc_id=1, payload=b"small"),
        Row(doc_id=2, payload=b"B" * 5000),
        Row(doc_id=3, payload=b"C" * 7000),
        Row(doc_id=4, payload=None),
        Row(doc_id=5, payload=b"tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    base = str(tmp_path / "blobs")
    ext = multimodal.externalize_payloads(df, base, threshold_bytes=1000)
    got = {r.doc_id: r.payload_ref for r in ext.collect()}
    assert got[1].path is None and bytes(got[1].inline) == b"small"
    assert got[2].path is not None and got[2].inline is None and got[2].length == 5000
    assert got[3].path is not None and got[3].length == 7000
    assert got[4] is None
    # blob files exist and hold exactly the externalized bytes
    import os as _os

    blob_bytes = sum(
        _os.path.getsize(_os.path.join(base, f)) for f in _os.listdir(base)
    )
    assert blob_bytes == 12000

    back = multimodal.load_payloads(ext)
    assert back.schema["payload"].dataType.typeName() == "binary"
    round_tripped = {r.doc_id: r.payload for r in back.collect()}
    expected = {r.doc_id: r.payload for r in rows}
    assert {
        k: (bytes(v) if v is not None else None) for k, v in round_tripped.items()
    } == expected

    # the skinny frame shuffles/persists like any table: write + reread,
    # then load payloads from the reread pointers
    pq = str(tmp_path / "refs.parquet")
    ext.write.parquet(pq)
    reread = multimodal.load_payloads(spark.read.parquet(pq))
    assert {
        r.doc_id: (bytes(r.payload) if r.payload is not None else None)
        for r in reread.collect()
    } == expected


def test_multimodal_real_codec_rejects_non_image(spark):
    """decode_stub=False is the REAL netpbm path now: a payload that
    is not a P5/P6 image fails loudly, not silently."""
    df = multimodal.attach_payload(
        spark.createDataFrame([Row(doc_id=1, text="abc")]), "text"
    )
    with pytest.raises(Exception, match="netpbm"):
        multimodal.extract_features(df, decode_stub=False).collect()


def _ppm(w, h, fn):
    """Synthetic P6 image: pixel (x, y) = fn(x, y) -> (r, g, b)."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import netpbm

    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = fn(x, y)
    return netpbm.encode(img)


def test_netpbm_codec_roundtrip_and_ops():
    """The pure-numpy codec itself: encode/decode round-trips pixels
    byte-exactly (P5 and P6, comment-bearing headers), truncation and
    bad magic raise, nearest-neighbor resize picks floor indices."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import netpbm

    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(netpbm.decode(netpbm.encode(rgb)), rgb)
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(
        netpbm.decode(netpbm.encode(gray)), gray[:, :, None]
    )
    # header grammar: comments and arbitrary whitespace between tokens
    wire = b"P6 # comment\n# another\n 3\t2\n255\n" + rgb.tobytes()
    assert np.array_equal(netpbm.decode(wire), rgb)
    with pytest.raises(ValueError, match="netpbm"):
        netpbm.decode(b"JFIF....")
    with pytest.raises(ValueError, match="truncated"):
        netpbm.decode(netpbm.encode(rgb)[:-2])
    # floor-index nearest neighbor: 4 wide -> 2 wide keeps cols 0, 2
    img = np.arange(4, dtype=np.uint8).reshape(1, 4, 1)
    assert netpbm.resize_nearest(img, 1, 2).ravel().tolist() == [0, 2]
    # sub-255 maxval rescales to the canonical 0..255 scale
    # (code-review r9: maxval=15 white must stay white)
    lo = b"P5\n2 1\n15\n" + bytes([15, 0])
    assert netpbm.decode(lo).ravel().tolist() == [255, 0]
    # raster must follow maxval after exactly one whitespace byte — a
    # comment or CRLF there would silently shift every pixel
    shifted = b"P6 3 2 255#c\n" + rgb.tobytes()
    with pytest.raises(ValueError, match="whitespace"):
        netpbm.decode(shifted)


def test_netpbm_roundtrip_property():
    """Property: any uint8 pixel array round-trips byte-exactly, and
    resize_to_budget always fits the budget for budgets >= one pixel
    plus header."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from platypus_ingestion_plugins_spark.functions import netpbm

    @settings(max_examples=50, deadline=None)
    @given(
        h=st.integers(1, 12), w=st.integers(1, 12),
        c=st.sampled_from([1, 3]), seed=st.integers(0, 2**31 - 1),
        budget=st.integers(32, 600),
    )
    def check(h, w, c, seed, budget):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        assert np.array_equal(netpbm.decode(netpbm.encode(img)), img)
        out = netpbm.resize_to_budget(netpbm.encode(img), budget)
        assert len(out) <= max(budget, len(b"P6\n1 1\n255\n") + c)
        netpbm.decode(out)  # still a valid image

    check()


def test_multimodal_real_codec_end_to_end(spark):
    """VERDICT r8 task #3: resize and extract_features run with
    decode_stub=False through the full Spark path on synthetic P6
    images — real decode, real pixel ops, byte-checked output."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import netpbm

    big = _ppm(40, 30, lambda x, y: ((x * 7) % 256, (y * 5) % 256, 9))
    small = _ppm(4, 4, lambda x, y: (255, 0, 0))
    df = spark.createDataFrame(
        [Row(doc_id=1, payload=big), Row(doc_id=2, payload=small)],
        "doc_id long, payload binary",
    )
    out = {
        r.doc_id: r
        for r in multimodal.resize(df, target_bytes=400, decode_stub=False).collect()
    }
    # byte-exact: the kernel's output equals the library call's output
    assert bytes(out[1].payload) == netpbm.resize_to_budget(big, 400)
    assert out[1].resized_bytes <= 400 < out[1].orig_bytes
    # already under budget -> scale 1.0 -> re-encoded identical image
    assert bytes(out[2].payload) == small
    # the resized payload is itself a valid image with scaled dims
    resized_img = netpbm.decode(bytes(out[1].payload))
    assert resized_img.shape[2] == 3 and resized_img.shape[0] < 30

    feats = {
        r.doc_id: r.feature
        for r in multimodal.extract_features(
            df, dim=4, decode_stub=False
        ).collect()
    }
    # red 4x4 image: luma = 299*255//1000 = 76 -> bin 76*4//256 = 1
    assert feats[2] == [0.0, 1.0, 0.0, 0.0]
    assert feats[1] == netpbm.histogram_features(big, 4)
    assert abs(sum(feats[1]) - 1.0) < 1e-9


def test_connected_components(spark):
    # two chains and a singleton: {1,2,3,4} via 1-2,2-3,3-4; {10,11}; 99 alone
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long")
    out = dedup.connected_components(pairs, nodes=nodes, id_col="doc_id")
    got = dict(out.collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}
    # without nodes: only graph members, same labels
    got2 = dict(dedup.connected_components(pairs, id_col="doc_id").collect())
    assert got2 == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_star(spark):
    # same fixture as label propagation — identical output contract
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long")
    got = dict(dedup.connected_components_star(pairs, nodes=nodes, id_col="doc_id").collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}
    # high-diameter path graph (the case star exists for): a 40-node
    # chain converges in O(log n) star rounds, not 40 propagation hops
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "id_a long, id_b long"
    )
    got_star = dict(dedup.connected_components_star(chain, id_col="doc_id", max_iter=8).collect())
    assert got_star == {i: 1 for i in range(1, 41)}
    # agrees with label propagation on a random-ish graph
    import random

    rng = random.Random(7)
    edges = [(rng.randint(1, 60), rng.randint(1, 60)) for _ in range(50)]
    pdf = spark.createDataFrame(edges, "id_a long, id_b long")
    a = dict(dedup.connected_components(pdf, id_col="doc_id").collect())
    b = dict(dedup.connected_components_star(pdf, id_col="doc_id").collect())
    # propagation keeps self-loop-only nodes; star drops pure self-loops —
    # compare on the union domain with singleton fill
    for k in set(a) | set(b):
        assert a.get(k, k) == b.get(k, k)


def test_salted_join(spark):
    from platypus_ingestion_plugins_spark.operators import skew

    # key 1 is hot (60 rows), keys 2/3 cold; key 9 missing from small
    big = spark.createDataFrame(
        [(1, i) for i in range(60)] + [(2, 100), (3, 101), (9, 102)], "k long, v long"
    )
    small = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, tag string")
    expect = sorted(big.join(small, "k").collect())
    got = sorted(skew.salted_join(big, small, "k", salts=4, hot_threshold=10).collect())
    assert got == expect
    # left join keeps the unmatched big row
    expect_l = sorted(map(tuple, big.join(small, "k", "left").collect()))
    got_l = sorted(map(tuple, skew.salted_join(big, small, "k", salts=4, hot_threshold=10, how="left").collect()))
    assert got_l == expect_l
    # hot_keys finds exactly the hot key; sampled estimate agrees
    assert [r.k for r in skew.hot_keys(big, "k", 10).collect()] == [1]
    hot_sampled = {r.k for r in skew.hot_keys(big, "k", 10, sample_fraction=0.5).collect()}
    assert 1 in hot_sampled and not hot_sampled - {1}


def test_kmeans_centroids_recall(spark):
    """Trained centroids must recover the true cluster structure that
    the lowest-id default seed misses: recall@10 of ivf_topk with
    k-means centroids vs brute force on clustered data, probing 2 of 8
    lists. Data is 8 well-separated clusters; the default seed takes
    the 8 lowest ids, which all land in cluster 0, so training has to
    actually move the centroids."""
    import random

    rng = random.Random(7)
    dim, per = 16, 25
    centers = []
    for c in range(8):
        v = [0.0] * dim
        v[2 * c] = 1.0
        v[2 * c + 1] = 1.0 if c % 2 else -1.0
        centers.append(v)
    rows = []
    for c, ctr in enumerate(centers):
        for j in range(per):
            rows.append(
                Row(
                    vec_id=c * per + j,
                    embedding=[x + rng.uniform(-0.08, 0.08) for x in ctr],
                )
            )
    # ids 0..24 are ALL cluster 0 -> default 8-lowest-id seed is degenerate
    emb = spark.createDataFrame(rows)
    cents = similarity.kmeans_centroids(emb, n_centroids=8, iters=4)
    assert cents.count() == 8

    q = emb.filter("vec_id = 101")  # a cluster-4 member
    exact = [r.vec_id for r in similarity.brute_force_topk(emb, q, k=10).collect()]
    trained = [
        r.vec_id
        for r in similarity.ivf_topk(
            emb, q, k=10, n_centroids=8, nprobe=2, centroids=cents
        ).collect()
    ]
    recall = len(set(exact) & set(trained)) / 10
    assert recall >= 0.9, f"trained recall@10 = {recall}"

    # and training must beat the degenerate default seed on this data
    default = [
        r.vec_id
        for r in similarity.ivf_topk(emb, q, k=10, n_centroids=8, nprobe=2).collect()
    ]
    default_recall = len(set(exact) & set(default)) / 10
    assert recall >= default_recall

    # determinism: same input -> identical centroids
    again = similarity.kmeans_centroids(emb, n_centroids=8, iters=4)
    assert sorted(map(tuple, cents.collect())) == sorted(map(tuple, again.collect()))


def test_quantized_similarity(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0, 0.5]),
         Row(vec_id=1, embedding=[0.9, 0.05, 0.44]),
         Row(vec_id=2, embedding=[-1.0, 0.3, 0.0])]
    )
    q = dict(similarity.quantize(emb).select("vec_id", "qvec").collect())
    assert q[0] == [127, 0, 64]  # floor(0.5*127+0.5)=floor(64)=64
    assert max(abs(v) for v in q[2]) == 127
    top = similarity.quantized_topk(emb, emb.filter("vec_id = 0"), k=2).collect()
    assert [r.vec_id for r in top] == [0, 1]
    assert top[0].qcos_sim == 1.0


def test_ivf_assignment_partition_prunes(spark, tmp_path):
    """The IVF scale claim: written `partitionBy(cent_id)`, a probe of
    one inverted list touches only that list's directory (manifest-level
    skip, same mechanism as the modulo shard)."""
    import glob
    import os

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
         for i in range(30)]
    )
    cents = emb.filter("vec_id < 3")
    assigned = similarity.ivf_assign(emb, cents)
    path = str(tmp_path / "ivf")
    assigned.write.partitionBy("cent_id").parquet(path)
    assert len(glob.glob(f"{path}/cent_id=*")) == 3

    probe = spark.read.parquet(path).filter(F.col("cent_id") == 1)
    touched = [
        r.f for r in probe.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert touched and all("/cent_id=1/" in f for f in touched), touched


def test_asof_join_forward(spark):
    trades = spark.createDataFrame(
        [Row(sym="A", t=3, qty=10), Row(sym="A", t=7, qty=20), Row(sym="B", t=5, qty=5)]
    )
    quotes = spark.createDataFrame(
        [Row(sym="A", t=1, px=100.0), Row(sym="A", t=5, px=101.0),
         Row(sym="A", t=7, px=102.0), Row(sym="B", t=9, px=50.0)]
    )
    out = asof.asof_join(trades, quotes, key="sym", on="t", direction="forward").collect()
    got = {(r.sym, r.t): (r.t_right, r.px_right) for r in out}
    assert got[("A", 3)] == (5, 101.0)   # next quote at-or-after
    assert got[("A", 7)] == (7, 102.0)   # inclusive equality
    assert got[("B", 5)] == (9, 50.0)
    strict = asof.asof_join(
        trades, quotes, key="sym", on="t", direction="forward", strict=True
    ).collect()
    sgot = {(r.sym, r.t): (r.t_right, r.px_right) for r in strict}
    assert sgot[("A", 7)] == (None, None)  # strictly-after: none exists


def test_simhash_neardup_pairs(docs, spark):
    # docs 1 and 4 are identical -> hamming 0; blocked plan must find them
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in dedup.simhash_neardup_pairs(docs, "text", "doc_id",
                                                  bits=16, max_hamming=3).collect()}
    assert pairs[(1, 4)] == 0
    # lossless vs exact: blocked result == brute-force filter
    fp = {r.doc_id: r.simhash for r in dedup.simhash(docs, "text", "doc_id").collect()}
    exact = {
        (a, b)
        for a in fp for b in fp
        if a < b and bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    assert set(pairs) == exact
    with pytest.raises(ValueError):
        dedup.simhash_neardup_pairs(docs, "text", "doc_id", max_hamming=4, bands=4)


def test_deterministic_sampling_and_split(spark):
    from platypus_ingestion_plugins_spark.functions import sampling

    df = spark.createDataFrame([(i, "en" if i % 3 else "de") for i in range(1000)], "id long, lang string")
    s1 = {r.id for r in sampling.deterministic_sample(df, "id", 0.3).collect()}
    # identical membership after a repartition (df.sample would differ)
    s2 = {r.id for r in sampling.deterministic_sample(df.repartition(7), "id", 0.3).collect()}
    assert s1 == s2 and 200 < len(s1) < 400
    # splits: disjoint, exhaustive, stable per key
    sp = sampling.hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    got = {r.id: r.split for r in sp.collect()}
    assert len(got) == 1000 and set(got.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in got.values() if v == "train")
    assert 700 < n_train < 900
    # a larger table preserves earlier assignments (incremental stability)
    df2 = spark.createDataFrame([(i, "en") for i in range(2000)], "id long, lang string")
    got2 = {r.id: r.split for r in sampling.hash_split(df2, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(got2[k] == v for k, v in got.items())
    # stratified: per-stratum rates honored
    st = sampling.stratified_sample(df, "id", "lang", {"en": 0.5}, default_fraction=0.05)
    en = st.filter("lang = 'en'").count() / df.filter("lang = 'en'").count()
    de = st.filter("lang = 'de'").count() / df.filter("lang = 'de'").count()
    assert 0.4 < en < 0.6 and de < 0.15


def test_repetition_stats(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="spam spam spam spam spam spam"),
        Row(doc_id=2, text="one two three four five six seven"),
    ])
    got = {r.doc_id: r for r in TX.repetition_stats(df, "text", "doc_id").collect()}
    assert got[1].dup_token_frac == round(1 - 1 / 6, 6)
    assert got[1].top_ngram_frac == 1.0  # the only trigram repeats
    assert got[2].dup_token_frac == 0.0
    assert got[2].top_ngram_frac == 0.2  # 5 distinct trigrams


def test_jaccard_join(spark):
    left = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="entirely unrelated text about database engines"),
    ])
    right = spark.createDataFrame([
        Row(doc_id=10, text="the quick brown fox jumps over the lazy cat"),
        Row(doc_id=11, text="nothing in common here at all"),
    ])
    got = {(r.id_l, r.id_r): r.jaccard
           for r in dedup.jaccard_join(left, right, "text", "doc_id", threshold=0.3).collect()}
    assert set(got) == {(1, 10)} and 0.3 <= got[(1, 10)] < 1.0
    # hot-shingle cap applies across BOTH corpora
    l2 = spark.createDataFrame([Row(doc_id=i, text=f"common phrase here u{i} v{i} w{i}") for i in range(3)])
    r2 = spark.createDataFrame([Row(doc_id=i + 100, text=f"common phrase here x{i} y{i} z{i}") for i in range(3)])
    uncapped = dedup.jaccard_join(l2, r2, "text", "doc_id", threshold=0.01)
    assert uncapped.count() == 9
    capped = dedup.jaccard_join(l2, r2, "text", "doc_id", threshold=0.01, max_shingle_df=3)
    assert capped.count() == 0


def test_kmeans_converges_early_with_identical_output(spark, monkeypatch):
    """Convergence stop: a corpus that settles in a few rounds must not
    pay for the full iteration budget, and the early-stopped result
    must be identical to the fixed-iteration one."""
    rows = [
        Row(vec_id=i * 10 + j, embedding=[1.0 + j * 0.01, 0.0] if i == 0 else [0.0, 1.0 + j * 0.01])
        for i in range(2)
        for j in range(5)
    ]
    emb = spark.createDataFrame(rows)

    calls = {"n": 0}
    real_assign = similarity.ivf_assign

    def counting_assign(*a, **kw):
        calls["n"] += 1
        return real_assign(*a, **kw)

    monkeypatch.setattr(similarity, "ivf_assign", counting_assign)
    early = similarity.kmeans_centroids(emb, n_centroids=2, iters=10, tol=1e-9)
    early_rows = sorted((r[0], tuple(r[1])) for r in early.collect())
    early_calls = calls["n"]
    assert early_calls < 10, f"no early stop: {early_calls} assignment rounds"

    calls["n"] = 0
    full = similarity.kmeans_centroids(emb, n_centroids=2, iters=10, tol=0.0)
    full_rows = sorted((r[0], tuple(r[1])) for r in full.collect())
    assert calls["n"] == 10  # tol=0 restores fixed-iteration behavior
    assert early_rows == full_rows


def test_kmeans_preserves_id_type(spark):
    """Centroid ids keep the input id column's type (a string-id corpus
    must not come back with bigint centroid ids)."""
    emb = spark.createDataFrame(
        [
            Row(vec_id=f"doc-{i}", embedding=[1.0, 0.0] if i < 3 else [0.0, 1.0])
            for i in range(6)
        ]
    )
    cents = similarity.kmeans_centroids(emb, n_centroids=2, iters=3)
    assert dict(cents.dtypes)["vec_id"] == "string"
    ids = {r.vec_id for r in cents.collect()}
    assert ids == {"doc-0", "doc-1"}


def test_ivf_partitioned_probe_prunes_files_and_matches(spark, tmp_path):
    """Write-time IVF layout: the probe reads ONLY the probed lists'
    partition directories (input-file metrics, the shard test's
    pattern) and returns exactly what the in-memory ivf_topk returns
    for the same centroids and nprobe."""
    import glob
    import os
    import random

    rng = random.Random(11)
    rows = []
    for c in range(4):
        ctr = [0.0] * 8
        ctr[2 * c] = 1.0
        for j in range(20):
            rows.append(
                Row(vec_id=c * 20 + j, embedding=[x + rng.uniform(-0.05, 0.05) for x in ctr])
            )
    emb = spark.createDataFrame(rows)
    cents = similarity.kmeans_centroids(emb, n_centroids=4, iters=4)
    path = str(tmp_path / "ivf")
    similarity.write_ivf_partitioned(emb, cents, path)

    part_dirs = glob.glob(f"{path}/cent_id=*")
    assert len(part_dirs) == 4
    total_files = len(glob.glob(f"{path}/cent_id=*/*.parquet"))

    q = emb.filter("vec_id = 45")  # a cluster-2 member
    scan = similarity.ivf_probe_scan(spark, path, cents, q, nprobe=1)
    touched = [
        r.f for r in scan.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert touched, "probe scanned no files"
    probed_dirs = {f.rsplit("/", 2)[-2] for f in touched}
    assert len(probed_dirs) == 1, probed_dirs  # nprobe=1 -> one list only
    assert len(touched) / total_files <= 1 / 4 + 0.05

    got = similarity.ivf_topk_partitioned(spark, path, cents, q, k=5, nprobe=1)
    mem = similarity.ivf_topk(emb, q, k=5, nprobe=1, centroids=cents)
    assert [(r.vec_id, r.cos_sim) for r in got.collect()] == [
        (r.vec_id, r.cos_sim) for r in mem.collect()
    ]


def test_neardup_pair_dedup_carries_only_ids(spark):
    """The candidate-dedup exchange must move bare id pairs, not the
    vectors: no first(va)/first(vb) aggregates anywhere in the plan
    (the fat-shuffle shape this operator previously had)."""
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, float(i) * 0.001, 0.0, 0.0]) for i in range(8)]
    )
    pairs = similarity.neardup_pairs(emb, threshold=0.9, bits=2, bands=2)
    plan = pairs._jdf.queryExecution().toString()
    assert "first(va" not in plan and "first(vb" not in plan
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(a, b) for a in range(8) for b in range(a + 1, 8)}


def test_gc_blobs_collects_orphans_keeps_live(spark, tmp_path):
    """Blob GC: a planted failed-attempt blob is deleted; blobs the
    materialized pointer table references survive, and the payloads
    still ranged-read back byte-identical afterwards."""
    import os as _os

    rows = [
        Row(doc_id=1, payload=b"A" * 4000),
        Row(doc_id=2, payload=b"B" * 6000),
        Row(doc_id=3, payload=b"tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    base = str(tmp_path / "blobs")
    table = str(tmp_path / "refs")
    ext = multimodal.externalize_to_table(df, base, table, threshold_bytes=1000)

    # plant a failed-attempt orphan alongside the live blobs
    orphan = _os.path.join(base, "blob-99-99999.bin")
    with open(orphan, "wb") as f:
        f.write(b"Z" * 1234)
    live = {
        f for f in _os.listdir(base) if f.startswith("blob-")
    } - {"blob-99-99999.bin"}
    assert live, "externalize produced no blobs"

    # default min_age_s spares young blobs — the in-flight-writer guard
    assert multimodal.gc_blobs(ext, base) == []
    deleted = multimodal.gc_blobs(ext, base, min_age_s=0)
    assert [_os.path.basename(p) for p in deleted] == ["blob-99-99999.bin"]
    assert not _os.path.exists(orphan)
    assert {f for f in _os.listdir(base) if f.startswith("blob-")} == live

    # live payloads unharmed
    back = {
        r.doc_id: (bytes(r.payload) if r.payload is not None else None)
        for r in multimodal.load_payloads(ext).collect()
    }
    assert back == {1: b"A" * 4000, 2: b"B" * 6000, 3: b"tiny"}

    # idempotent: nothing left to collect
    assert multimodal.gc_blobs(ext, base, min_age_s=0) == []
    # and a GC over a missing/empty dir is a no-op
    assert multimodal.gc_blobs(ext, str(tmp_path / "nope"), min_age_s=0) == []


def test_knn_join_per_query_topk(spark):
    """Each query gets ITS OWN ranked top-k; ranking is rounded-cosine
    desc with id tie-break, identical across partitionings (the
    two-phase partial top-k must merge losslessly)."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1]),
        Row(vec_id=2, embedding=[0.0, 1.0]),
        Row(vec_id=3, embedding=[0.1, 0.9]),
        Row(vec_id=4, embedding=[1.0, 0.0]),  # exact dup of 0 -> tie
    ]
    emb = spark.createDataFrame(rows)
    out = similarity.knn_join(emb, emb.filter("vec_id IN (0, 2)"), k=3)
    got = {
        q: [(r.vec_id, r.knn_rank) for r in sorted(rs, key=lambda r: r.knn_rank)]
        for q, rs in __import__("itertools").groupby(
            sorted(out.collect(), key=lambda r: (r.q_id, r.knn_rank)),
            key=lambda r: r.q_id,
        )
    }
    # query 0: itself, then its exact dup (tie -> smaller id first is 0), then 1
    assert got[0] == [(0, 1), (4, 2), (1, 3)]
    # query 2: itself, then 3, then 1 (cos(2,1)=0.1/... > cos(2,0)=0)
    assert got[2][0] == (2, 1) and got[2][1] == (3, 2)
    # repartitioned corpus produces the identical result (merge is lossless)
    out2 = similarity.knn_join(emb.repartition(7), emb.filter("vec_id IN (0, 2)"), k=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_winnow_overlap_detects_copied_passage(spark):
    """Winnowing catches a passage copied into an otherwise-different
    document (containment), stays silent on unrelated docs, and the
    hot-fingerprint cap drops corpus-wide template matches."""
    shared = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        Row(doc_id=1, text=f"intro about databases. {shared} and some closing words."),
        Row(doc_id=2, text=f"completely different topic on astronomy. {shared} the end."),
        Row(doc_id=3, text="nothing in common with the others at all, purely unique prose."),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in dedup.winnow_overlap_pairs(
            df, "text", "doc_id", k=20, w=4, min_shared=2
        ).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] >= 2

    # template shared by EVERY doc -> capped out by max_fp_df
    tmpl = [Row(doc_id=i, text=f"standard disclaimer header applies to all documents here. unique part {i}") for i in range(4)]
    tdf = spark.createDataFrame(tmpl)
    uncapped = dedup.winnow_overlap_pairs(tdf, "text", "doc_id", k=20, w=4, min_shared=2)
    assert uncapped.count() == 6  # all pairs share the template
    capped = dedup.winnow_overlap_pairs(
        tdf, "text", "doc_id", k=20, w=4, min_shared=2, max_fp_df=2
    )
    assert capped.count() == 0


def test_neardup_survivors_verifies_candidates(spark):
    """Band keys only block; suppression requires a fingerprint within
    the hamming budget. A band-mate with a FAR fingerprint (random
    collision) must NOT be suppressed; an identical fingerprint must."""
    keys = spark.createDataFrame(
        [
            # doc 1: fp 0, two bands
            Row(doc_id=1, simhash=0, band=0, val=0),
            Row(doc_id=1, simhash=0, band=1, val=0),
            # doc 2: identical fp, shares band 0 -> suppressed by doc 1
            Row(doc_id=2, simhash=0, band=0, val=0),
            # doc 3: band-0 collision but hamming 32 -> survives
            Row(doc_id=3, simhash=4294967295, band=0, val=0),
            # doc 4: no shared band at all -> survives untouched
            Row(doc_id=4, simhash=7, band=2, val=5),
        ]
    )
    got = {r.doc_id for r in dedup.neardup_survivors(keys, "doc_id", max_hamming=3).collect()}
    assert got == {1, 3, 4}


def test_gc_blobs_spares_unknown_mtime(spark, tmp_path, monkeypatch):
    """A blob whose filesystem reports no mtime must be treated as
    too-young (spared) when min_age_s > 0 — deleting it would invert
    the in-flight-writer guard — and only collected at min_age_s=0."""
    import os
    import types

    df = spark.createDataFrame([Row(doc_id=1, payload=b"A" * 4000)],
                               "doc_id long, payload binary")
    base = str(tmp_path / "blobs")
    table = str(tmp_path / "refs")
    ext = multimodal.externalize_to_table(df, base, table, threshold_bytes=1000)

    real_blob_fs = multimodal._blob_fs
    deleted = []

    class NoMtimeFS:
        def __init__(self, inner_fs):
            self._fs = inner_fs

        def get_file_info(self, sel):
            out = []
            for i in self._fs.get_file_info(sel):
                out.append(types.SimpleNamespace(
                    path=i.path, base_name=i.base_name,
                    is_file=i.is_file, mtime=None))
            return out

        def delete_file(self, p):
            deleted.append(p)
            self._fs.delete_file(p)

    def patched(path):
        fs, inner = real_blob_fs(path)
        return NoMtimeFS(fs), inner

    monkeypatch.setattr(multimodal, "_blob_fs", patched)
    orphan = os.path.join(base, "blob-99-99999.bin")
    with open(orphan, "wb") as f:
        f.write(b"Z" * 10)
    # default min_age_s: unknown mtime -> spared, never deleted
    assert multimodal.gc_blobs(ext, base) == []
    assert os.path.exists(orphan)
    # explicit min_age_s=0 opt-out still collects it
    got = multimodal.gc_blobs(ext, base, min_age_s=0)
    assert [os.path.basename(p) for p in got] == ["blob-99-99999.bin"]


def test_band_key_index_prunes_partitions_and_matches_oneshot(spark, tmp_path):
    """The (band, vb)-partitioned key index: a batch's pruned read
    opens ONLY directories matching its own band keys (input-file
    metrics, the IVF probe's pattern), and incremental suppression
    over two batches reproduces the one-shot neardup_survivors result
    exactly."""
    import glob

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "the quick brown fox jumps over the lazy dog again and again!",
        "completely different content about cooking pasta al dente",
        "yet another unrelated document concerning alpine skiing",
        "the quick brown fox jumps over the lazy dog once more today",
        "financial report third quarter revenue and operating margin",
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    keys = dedup.simhash_band_keys(docs, "text", "doc_id", bits=32, bands=4)
    oneshot = {
        (r.doc_id, r.simhash)
        for r in dedup.neardup_survivors(keys, "doc_id", max_hamming=3).collect()
    }

    idx = str(tmp_path / "idx")
    b1 = keys.filter("doc_id < 3")
    b2 = keys.filter("doc_id >= 3")
    got = set()
    for b in (b1, b2):
        earlier = (
            dedup.read_band_keys_pruned(spark, idx, b, val_buckets=8)
            if glob.glob(f"{idx}/band=*")
            else None
        )
        got |= {
            (r.doc_id, r.simhash)
            for r in dedup.neardup_survivors_incremental(
                b, earlier, "doc_id", max_hamming=3
            ).collect()
        }
        dedup.append_band_key_index(b, idx, val_buckets=8)
    assert got == oneshot, (got, oneshot)

    # pruning: a single-doc probe batch must open only its own dirs
    total_dirs = len(glob.glob(f"{idx}/band=*/vb=*"))
    probe = keys.filter("doc_id = 0")
    scan = dedup.read_band_keys_pruned(spark, idx, probe, val_buckets=8)
    touched = {
        r.f.rsplit("/", 3)[-3] + "/" + r.f.rsplit("/", 2)[-2]
        for r in scan.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert len(touched) <= 4, touched  # one (band, vb) dir per band
    assert total_dirs > 4, total_dirs  # there genuinely was something to skip


def test_neardup_survivors_identical_fingerprint_corpus(spark):
    """Adversarial hot-bucket case (r12 distinct-fingerprint
    compression): a corpus where EVERY document carries the same
    fingerprint — the solid-color-image / boilerplate-doc degenerate
    that used to put n rows on both sides of one (band, val) join key.
    Only the minimum id survives, incremental over two batches equals
    the one-shot, and the candidate join's earlier side aggregates to
    distinct fingerprints (plan-asserted) so the join is n x 1, not
    n x n."""
    rows = [Row(doc_id=i, simhash=0b1010) for i in range(40)]
    fp = spark.createDataFrame(rows)
    keys = dedup.fingerprint_band_keys(fp, "doc_id", "simhash", bits=32, bands=4)

    surv = dedup.neardup_survivors(keys, "doc_id", max_hamming=3)
    assert [r.doc_id for r in surv.collect()] == [0]

    got = set()
    for pred in ("doc_id < 17", "doc_id >= 17"):
        b = keys.filter(pred)
        earlier = keys.filter("doc_id < 17") if pred == "doc_id >= 17" else None
        got |= {
            r.doc_id
            for r in dedup.neardup_survivors_incremental(
                b, earlier, "doc_id", max_hamming=3
            ).collect()
        }
    assert got == {0}, got

    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "min(__eid#" in plan, plan


def test_decontaminate_flags_and_drops_overlapping_docs(spark):
    """Decontamination: a training doc sharing a token n-gram with the
    benchmark set is flagged with its distinct-gram count and dropped
    by decontaminate(); paraphrased/disjoint docs survive."""
    from platypus_ingestion_plugins_spark.operators import decontam

    bench = spark.createDataFrame([
        Row(doc_id=100, text="the quick brown fox jumps over the lazy dog"),
    ])
    train = spark.createDataFrame([
        # contains "quick brown fox" and "brown fox jumps" -> 2 hits
        Row(doc_id=1, text="we saw a quick brown fox jumps right there"),
        # word-overlap but never 3 consecutive shared tokens
        Row(doc_id=2, text="the fox was quick and the dog was brown"),
        Row(doc_id=3, text="completely unrelated text about spark shuffles"),
    ])
    flagged = {
        (r.doc_id, r.n_contaminated)
        for r in decontam.contaminated_docs(train, bench, "text", "doc_id", n=3).collect()
    }
    # shared 3-grams: "quick brown fox", "brown fox jumps"
    assert flagged == {(1, 2)}, flagged
    clean = {r.doc_id for r in decontam.decontaminate(train, bench, "text", "doc_id", n=3).collect()}
    assert clean == {2, 3}


def test_pii_counts_and_redaction_order(spark):
    """PII spans are counted on the original text and redacted in the
    fixed email->phone->ssn->ip order; non-PII text is untouched."""
    from platypus_ingestion_plugins_spark.functions import pii

    rows = [
        Row(id=1, t="mail a.user+tag@sub.example.co and 12-345-678-9012 now"),
        Row(id=2, t="ssn 123-45-6789 ip 10.0.255.3 end"),
        Row(id=3, t="no personal data here at all"),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.id: (r.p.n_email, r.p.n_phone, r.p.n_ssn, r.p.n_ip, r.red)
        for r in df.select(
            "id",
            pii.pii_counts("t").alias("p"),
            pii.redact_pii("t").alias("red"),
        ).collect()
    }
    assert got[1] == (1, 1, 0, 0, "mail <EMAIL> and <PHONE> now")
    assert got[2] == (0, 0, 1, 1, "ssn <SSN> ip <IP> end")
    assert got[3] == (0, 0, 0, 0, "no personal data here at all")


def test_unigram_lm_vocab_cap_smoothing_and_filter(spark):
    """Corpus unigram LM: the vocab cap keeps the top tokens by count
    (ties on token string), probabilities are normalized over the FULL
    token mass (not the kept vocabulary), an all-OOV document scores
    exactly the smoothing floor, and logprob_filter composes
    train+score+keep — dropping tokenless documents with the
    gibberish."""
    import math

    from platypus_ingestion_plugins_spark.functions import lm

    rows = [
        Row(doc_id=1, text="the cat and the dog and the bird"),
        Row(doc_id=2, text="the cat sat"),
        Row(doc_id=3, text="zzz qqq xxx"),  # all-OOV gibberish
        Row(doc_id=4, text="..."),  # tokenless
    ]
    docs = spark.createDataFrame(rows)
    # counts: the=4 and=2 cat=2 dog=1 bird=1 sat=1 zzz=1 qqq=1 xxx=1; total=14
    model, totals = lm.unigram_model(docs, vocab_size=3)
    kept = {r.tok: r.logp for r in model.collect()}
    assert set(kept) == {"the", "and", "cat"}  # count desc, tok ties
    assert kept["the"] == pytest.approx(math.log(4 / 14))
    assert kept["and"] == pytest.approx(math.log(2 / 14))  # over FULL mass

    scored = {
        r.doc_id: r
        for r in lm.doc_logprob(docs, model, totals, alpha=0.5).collect()
    }
    assert set(scored) == {1, 2, 3}  # doc 4 has no tokens -> no row
    floor = math.log(0.5) - math.log(14)
    assert scored[3].mean_logp == pytest.approx(floor)  # pure smoothing
    assert scored[3].n_tokens == 3
    # doc 2: the(4/14), cat(2/14), sat=OOV floor
    exp2 = (math.log(4 / 14) + math.log(2 / 14) + floor) / 3
    assert scored[2].mean_logp == pytest.approx(exp2)

    kept_ids = sorted(
        r.doc_id
        for r in lm.logprob_filter(docs, min_mean_logp=floor + 1e-9,
                                   vocab_size=3).collect()
    )
    assert kept_ids == [1, 2]  # gibberish and tokenless both dropped


def test_export_shuffled_layout_order_and_determinism(spark, tmp_path):
    """export_shuffled: shard=K directory layout, within-file rows in
    permutation order, maxRecordsPerFile splits without disturbing it,
    and the assignment is invariant under input repartitioning."""
    import os

    from platypus_ingestion_plugins_spark.operators import export as EX

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    out = str(tmp_path / "shards")
    EX.export_shuffled(docs, out, "doc_id", n_shards=4, max_records_per_file=20)

    shard_dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
    assert shard_dirs == [f"shard={k}" for k in range(4)]

    # expected permutation from the pure-projection assignment
    exp = {
        (r.doc_id, r.shard, r.pos)
        for r in EX.shuffle_positions(docs, "doc_id", 4).collect()
    }
    # replay: list files in name order per shard, rows in file order
    got = set()
    for k in range(4):
        pos = 0
        sd = f"{out}/shard={k}"
        files = sorted(f for f in os.listdir(sd) if f.endswith(".parquet"))
        assert len(files) >= 2  # maxRecordsPerFile actually split
        for fname in files:
            import pyarrow.parquet as pq

            for doc_id in pq.read_table(f"{sd}/{fname}")["doc_id"].to_pylist():
                got.add((doc_id, k, pos))
                pos += 1
    assert got == exp

    # partitioning-invariance: a different input layout, same permutation
    shuffled_in = docs.repartition(13)
    exp2 = {
        (r.doc_id, r.shard, r.pos)
        for r in EX.shuffle_positions(shuffled_in, "doc_id", 4).collect()
    }
    assert exp2 == exp


def test_pack_bins_stream_contiguity(spark):
    """pack_bins: within each shard, offsets form a contiguous token
    stream (next offset = prev offset + prev n_tok, starting at 0) and
    bin is the 512-window the doc's first token lands in."""
    from platypus_ingestion_plugins_spark.operators.export import pack_bins

    docs = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("n_tok")
    )
    rows = pack_bins(docs, "doc_id", "n_tok", target_tokens=64, n_shards=3).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= {0, 1, 2} and len(rows) == 100
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.offset)
        expect = 0
        for r in rs:
            assert r.offset == expect, (shard, r)
            assert r.bin == r.offset // 64
            expect += r.n_tok


def test_materialize_packs_order_and_sizes(spark):
    """materialize_packs: pack_text is the stream-order concatenation
    (restored via offset-tagged array_sort, not collect_list order)
    and n_tokens sums the member docs."""
    from platypus_ingestion_plugins_spark.operators.export import (
        materialize_packs,
        pack_bins,
    )

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
        (F.col("id") % 11 + 1).alias("n_tok"),
    )
    # scramble the input layout so collect_list's native order is wrong
    packs = materialize_packs(
        docs.repartition(7), "doc_id", "text", "n_tok",
        target_tokens=24, n_shards=2,
    ).collect()
    layout = pack_bins(docs, "doc_id", "n_tok", 24, 2).collect()
    exp = {}
    for r in sorted(layout, key=lambda r: (r.shard, r.offset)):
        key = (r.shard, r.bin)
        texts, toks = exp.setdefault(key, ([], 0))[0], exp[key][1]
        texts.append(f"d{r.doc_id}")
        exp[key] = (texts, toks + r.n_tok)
    assert {(p.shard, p.bin): (p.pack_text, p.n_tokens) for p in packs} == {
        k: (" ".join(t), n) for k, (t, n) in exp.items()
    }


def test_temperature_mix_rates_and_determinism(spark):
    """temperature_mix: alpha<1 up-weights small strata (tail keep-rate
    > head keep-rate), alpha=1 degenerates to uniform total_fraction
    for every stratum, and membership is repartition-invariant."""
    from platypus_ingestion_plugins_spark.functions.sampling import temperature_mix

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, "tail").otherwise("head").alias("src"),
    )  # head 900, tail 100
    got = temperature_mix(df, "doc_id", "src", alpha=0.5, total_fraction=0.3)
    counts = {r.src: r.n for r in got.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expected rates: q_head = 30/40, q_tail = 10/40 over M = 300
    # -> head rate 0.25, tail rate 0.75: tail oversampled 3x per-row
    assert 0.15 < counts["head"] / 900 < 0.35
    assert 0.60 < counts["tail"] / 100 < 0.90
    # alpha=1: every stratum keeps ~total_fraction (rate exactly 0.3)
    uni = temperature_mix(df, "doc_id", "src", alpha=1.0, total_fraction=0.3)
    uc = {r.src: r.n for r in uni.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.2 < uc["head"] / 900 < 0.4 and 0.15 < uc["tail"] / 100 < 0.45
    # determinism across partitionings
    a = {r.doc_id for r in got.collect()}
    b = {r.doc_id for r in temperature_mix(df.repartition(17), "doc_id", "src",
                                           alpha=0.5, total_fraction=0.3).collect()}
    assert a == b


def test_band_key_index_val_buckets_contract(spark, tmp_path):
    """The (band, vb) index pins val_buckets in a sidecar: a
    mismatched append or read raises instead of silently scattering /
    pruning away matches, and a reader with no explicit value adopts
    the writer's."""
    idx = str(tmp_path / "idx")
    keys = spark.createDataFrame(
        [Row(doc_id=i, band=i % 4, val=i * 17, simhash=i) for i in range(40)]
    )
    dedup.append_band_key_index(keys, idx, val_buckets=8)
    with pytest.raises(ValueError, match="val_buckets=8"):
        dedup.append_band_key_index(keys, idx, val_buckets=64)
    with pytest.raises(ValueError, match="val_buckets=8"):
        dedup.read_band_keys_pruned(spark, idx, keys, val_buckets=64)
    # sidecar-adopted read sees every appended key
    got = dedup.read_band_keys_pruned(spark, idx, keys).count()
    assert got == 40


def test_temperature_mix_null_stratum_sampled_not_dropped(spark):
    """A NULL stratum is a stratum: its rows are sampled at the null
    group's own rate (null-safe join), not silently dropped."""
    from platypus_ingestion_plugins_spark.functions.sampling import temperature_mix

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise(F.lit(None)).alias("src"),
    )
    got = temperature_mix(df, "doc_id", "src", alpha=1.0, total_fraction=0.5)
    counts = {
        r.src: r.n
        for r in got.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # alpha=1 -> every stratum keeps rate 0.5, including the NULL one
    assert None in counts and 60 < counts[None] < 140, counts
    assert 60 < counts["a"] < 140, counts


def test_band_key_index_compaction_and_crash_heal(spark, tmp_path):
    """compact_band_key_index: three appends fragment each (band, vb)
    dir to 3 files; compaction rewrites to 1 file per dir with the key
    set intact, a second call no-ops, and a simulated crash (original
    parked, vb= dir missing) heals on the next call without data
    loss or visible partition-discovery breakage."""
    import os

    idx = str(tmp_path / "idx")
    mk = lambda lo, hi: spark.createDataFrame(
        [Row(doc_id=i, band=i % 2, val=i * 13, simhash=i) for i in range(lo, hi)]
    )
    for lo, hi in ((0, 20), (20, 40), (40, 60)):
        dedup.append_band_key_index(mk(lo, hi), idx, val_buckets=4)

    def leaf_files():
        out = {}
        for b in os.listdir(idx):
            if not b.startswith("band="):
                continue
            for vb in os.listdir(f"{idx}/{b}"):
                if vb.startswith("vb="):
                    out[f"{b}/{vb}"] = [
                        f for f in os.listdir(f"{idx}/{b}/{vb}")
                        if f.endswith(".parquet")
                    ]
        return out

    assert all(len(fs_) == 3 for fs_ in leaf_files().values())
    before = {r.doc_id for r in spark.read.parquet(idx).collect()}

    done = dedup.compact_band_key_index(spark, idx, max_files_per_dir=1)
    assert done and all(len(fs_) == 1 for fs_ in leaf_files().values())
    assert {r.doc_id for r in spark.read.parquet(idx).collect()} == before
    assert dedup.compact_band_key_index(spark, idx, max_files_per_dir=1) == []

    # the PRUNED read path over the compacted layout: probing with the
    # full key set must see every key (a rewrite that broke the
    # (band, vb) directory scheme would prune matches away here while
    # the flat read above still passed)
    pruned = {
        r.doc_id for r in dedup.read_band_keys_pruned(spark, idx, mk(0, 60)).collect()
    }
    assert pruned == before
    # post-compaction appends land in the same scheme and stay visible
    dedup.append_band_key_index(mk(60, 70), idx, val_buckets=4)
    after_append = {
        r.doc_id for r in dedup.read_band_keys_pruned(spark, idx, mk(0, 70)).collect()
    }
    assert after_append == before | set(range(60, 70))

    # simulate a crash between the two swap renames
    band0 = f"{idx}/band=0"
    victim = sorted(v for v in os.listdir(band0) if v.startswith("vb="))[0]
    os.rename(f"{band0}/{victim}", f"{band0}/.precompact-{victim}")
    # and a stale staged copy from the legacy per-dir algorithm
    os.makedirs(f"{band0}/.compacting-{victim}", exist_ok=True)
    # dot-prefixed park is invisible: the index still reads (minus the
    # parked dir) without partition-discovery errors
    spark.read.parquet(idx).count()
    dedup.compact_band_key_index(spark, idx, max_files_per_dir=1)
    assert not os.path.exists(f"{band0}/.compacting-{victim}")  # healed away
    assert {r.doc_id for r in spark.read.parquet(idx).collect()} == before | set(
        range(60, 70)
    )


def test_band_key_index_heal_merges_park_into_recreated_dir(spark, tmp_path):
    """Crash window the r7 heal got wrong: original parked, staged copy
    never swapped in, and the streaming loop RESUMES AND APPENDS before
    the next compact — append_band_key_index recreates the missing vb=
    dir holding only the new batch's rows. A heal that treats 'park and
    vb= dir both exist' as a completed swap would delete the park and
    silently drop every pre-crash key for that (band, vb), re-admitting
    their near-duplicates. The heal must MERGE the park's files in; the
    park may only vanish once its rows are back in the live dir."""
    import os

    idx = str(tmp_path / "idx")
    mk = lambda lo, hi: spark.createDataFrame(
        [Row(doc_id=i, band=0, val=4, simhash=i) for i in range(lo, hi)]
    )
    dedup.append_band_key_index(mk(0, 10), idx, val_buckets=4)
    band0 = f"{idx}/band=0"
    (victim,) = [v for v in os.listdir(band0) if v.startswith("vb=")]
    # crash after parking the original, before the staged swap-in
    os.rename(f"{band0}/{victim}", f"{band0}/.precompact-{victim}")
    # streaming loop resumes: the append recreates vb= with new rows only
    dedup.append_band_key_index(mk(10, 15), idx, val_buckets=4)
    assert {r.doc_id for r in spark.read.parquet(idx).collect()} == set(range(10, 15))
    dedup.compact_band_key_index(spark, idx, max_files_per_dir=1000)  # heal only
    assert not os.path.exists(f"{band0}/.precompact-{victim}")
    # every pre-crash key survived the heal alongside the new batch
    assert {r.doc_id for r in spark.read.parquet(idx).collect()} == set(range(15))
    # and a follow-up compaction absorbs any heal/replay duplicates
    dedup.append_band_key_index(mk(0, 15), idx, val_buckets=4)  # replay
    dedup.compact_band_key_index(spark, idx, max_files_per_dir=1)
    rows = spark.read.parquet(idx).collect()
    assert len(rows) == 15 and {r.doc_id for r in rows} == set(range(15))


def test_band_key_index_heal_idempotent_under_repeated_crashes(spark, tmp_path):
    """A crash DURING a heal leaves both <name> and healed-1-<name> in
    the live dir with the park still holding files; the re-run heal
    must find a free numbered destination (healed-2-...) instead of
    failing the rename — otherwise every subsequent compact raises
    until manual repair (ADVICE r8)."""
    import os
    import shutil

    idx = str(tmp_path / "idx")
    df = spark.createDataFrame(
        [Row(doc_id=i, band=0, val=4, simhash=i) for i in range(10)]
    )
    dedup.append_band_key_index(df, idx, val_buckets=4)
    band0 = f"{idx}/band=0"
    (victim,) = [v for v in os.listdir(band0) if v.startswith("vb=")]
    live = f"{band0}/{victim}"
    park = f"{band0}/.precompact-{victim}"
    # crash #1: original parked mid-swap
    os.rename(live, park)
    # resume appends recreate the live dir
    dedup.append_band_key_index(
        spark.createDataFrame([Row(doc_id=99, band=0, val=4, simhash=99)]),
        idx, val_buckets=4,
    )
    # crash #2 struck mid-heal previously: the park's file ALREADY has
    # same-named and healed-1- copies sitting in the live dir
    pq = [n for n in os.listdir(park) if n.endswith(".parquet")][0]
    shutil.copy(f"{park}/{pq}", f"{live}/{pq}")
    shutil.copy(f"{park}/{pq}", f"{live}/healed-1-{pq}")
    # re-run heal: must not raise, park must drain, no rows lost
    dedup.compact_band_key_index(spark, idx, max_files_per_dir=1000)
    assert not os.path.exists(park)
    got = {r.doc_id for r in spark.read.parquet(idx).collect()}
    assert got == set(range(10)) | {99}
    # duplicates from the healed copies are absorbed by compaction
    dedup.compact_band_key_index(spark, idx, max_files_per_dir=1)
    rows = spark.read.parquet(idx).collect()
    assert len(rows) == 11 and {r.doc_id for r in rows} == set(range(10)) | {99}


def test_line_dedup_boilerplate_scrub(spark):
    """CCNet-style line dedup: lines shared by >= min_df docs vanish,
    unique body lines survive in order, blank lines are kept as
    structure, near-identical lines differing only in case/padding
    collapse under normalization (and don't without it), and an
    all-boilerplate document survives as an empty row."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="unique one\nSubscribe now\n\nbody A"),
            Row(doc_id=2, text="unique two\n subscribe NOW \n\nbody B"),
            Row(doc_id=3, text="Subscribe now"),
        ]
    )
    out = {r.doc_id: r for r in dedup.line_dedup(docs, "text", "doc_id").collect()}
    assert out[1].text == "unique one\n\nbody A"
    assert out[2].text == "unique two\n\nbody B"
    assert out[3].text == "" and out[3].n_dropped == 1  # row survives
    assert out[1].n_lines == 4 and out[1].n_dropped == 1
    # without normalization the case/padding variants are distinct
    raw = {r.doc_id: r for r in dedup.line_dedup(
        docs, "text", "doc_id", normalize=False).collect()}
    assert raw[1].text == "unique one\n\nbody A"  # exact match with doc 3
    assert raw[2].n_dropped == 0  # ' subscribe NOW ' matched nothing
    # min_df above the fan-out disables dropping entirely
    none = {r.doc_id: r for r in dedup.line_dedup(
        docs, "text", "doc_id", min_df=4).collect()}
    assert all(r.n_dropped == 0 for r in none.values())
    # NULL text must not delete the row — it survives as empty text
    nulled = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="hello")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in dedup.line_dedup(
        nulled, "text", "doc_id").collect()}
    assert got == {1: "", 2: "hello"}


def test_fuzzy_join_edit_distance(spark):
    """Prefix-blocked levenshtein matching: suffix typos match within
    the distance bound, different-prefix strings never reach the
    verify (the blocking contract), and the hot-block cap drops an
    over-common prefix entirely."""
    left = spark.createDataFrame(
        [Row(lid=1, name="blue bolt"), Row(lid=2, name="red widget")]
    )
    right = spark.createDataFrame(
        [Row(rid=10, cand="blue bolty"),   # suffix typo: dist 1
         Row(rid=11, cand="blue nut"),     # same prefix, dist 3 -> verify rejects
         Row(rid=12, cand="glue bolt")]    # dist 1 but different prefix -> blocked
    )
    out = dedup.fuzzy_join(
        left, right, "name", "cand", "lid", "rid", max_dist=2, block_prefix=4
    ).collect()
    assert {(r.lid, r.rid, r.dist) for r in out} == {(1, 10, 1)}
    # hot-block cap: every left row shares the prefix; cap 1 drops it
    hot_l = spark.createDataFrame(
        [Row(lid=i, name=f"same prefix {i}") for i in range(5)]
    )
    hot_r = spark.createDataFrame([Row(rid=1, cand="same prefix 0")])
    capped = dedup.fuzzy_join(
        hot_l, hot_r, "name", "cand", "lid", "rid",
        max_dist=2, block_prefix=4, max_block_df=1,
    )
    assert capped.count() == 0


def test_fuzzy_join_matches_bruteforce(spark):
    """fuzzy_join vs an independent pure-Python reference: over a
    deterministic corpus of perturbed strings, the operator's result
    must equal brute-force {same prefix block} x {levenshtein <= k} —
    catching drift in the blocking key, the bounded-threshold verify,
    and the -1 sentinel handling at once."""

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    base = ["alpha node", "alpine mode", "beta rig", "betta ring",
            "gamma ray", "gamut bay", "delta", "dealt", "omega", ""]
    left_rows = [(i, s) for i, s in enumerate(base)]
    right_rows = [
        (100 + i, s[:-1] + "x" if s else "x") for i, s in enumerate(base)
    ] + [(200 + i, s) for i, s in enumerate(base)]
    expect = {
        (il, ir, lev(sl, sr))
        for il, sl in left_rows
        for ir, sr in right_rows
        if sl[:3].lower() == sr[:3].lower() and lev(sl, sr) <= 3
    }
    out = dedup.fuzzy_join(
        spark.createDataFrame(left_rows, "lid long, name string"),
        spark.createDataFrame(right_rows, "rid long, cand string"),
        "name", "cand", "lid", "rid", max_dist=3, block_prefix=3,
    ).collect()
    assert {(r.lid, r.rid, r.dist) for r in out} == expect


def test_fuzzy_join_suffix_and_both_blocks(spark):
    """block="suffix"/"both" (VERDICT r9 task #3): a leading-char typo
    is invisible to prefix blocking but caught by the suffix block;
    "both" is the union, pair-distinct even when a pair matches in
    both passes. Verified against a brute-force reference encoding
    the same union."""

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    left = spark.createDataFrame(
        [Row(lid=1, name="blue bolt"), Row(lid=2, name="red widget")]
    )
    right = spark.createDataFrame(
        [Row(rid=10, cand="xlue bolt"),    # leading typo: prefix-blocked, suffix finds
         Row(rid=11, cand="blue bolx"),    # trailing typo: suffix-blocked, prefix finds
         Row(rid=12, cand="blue bolt"),    # exact: both passes find -> one row out
         Row(rid=13, cand="xed widgex")]   # both ends corrupted: neither block
    )
    suf = dedup.fuzzy_join(
        left, right, "name", "cand", "lid", "rid",
        max_dist=2, block_prefix=4, block="suffix",
    ).collect()
    assert {(r.lid, r.rid, r.dist) for r in suf} == {(1, 10, 1), (1, 12, 0)}
    both = dedup.fuzzy_join(
        left, right, "name", "cand", "lid", "rid",
        max_dist=2, block_prefix=4, block="both",
    ).collect()
    assert {(r.lid, r.rid, r.dist) for r in both} == {
        (1, 10, 1), (1, 11, 1), (1, 12, 0)
    }
    assert len(both) == 3  # the exact twin appears once, not per-pass

    # brute-force cross-check on perturbed strings, union of both blocks
    base = ["alpha node", "alpine mode", "beta rig", "betta ring",
            "gamma ray", "gamut bay", "delta", "dealt", "omega", ""]
    left_rows = [(i, s) for i, s in enumerate(base)]
    right_rows = (
        [(100 + i, ("x" + s[1:]) if s else "x") for i, s in enumerate(base)]
        + [(200 + i, s[:-1] + "x" if s else "") for i, s in enumerate(base)]
    )
    expect = {
        (il, ir, lev(sl, sr))
        for il, sl in left_rows
        for ir, sr in right_rows
        if (sl[:3].lower() == sr[:3].lower()
            or sl[-3:].lower() == sr[-3:].lower())
        and lev(sl, sr) <= 3
    }
    out = dedup.fuzzy_join(
        spark.createDataFrame(left_rows, "lid long, name string"),
        spark.createDataFrame(right_rows, "rid long, cand string"),
        "name", "cand", "lid", "rid",
        max_dist=3, block_prefix=3, block="both",
    ).collect()
    assert {(r.lid, r.rid, r.dist) for r in out} == expect

    with pytest.raises(ValueError):
        dedup.fuzzy_join(left, right, "name", "cand", "lid", "rid",
                         block="middle")


def test_top_terms_per_group(spark):
    """Deterministic per-group term ranking: counts desc, term asc
    tie-break, k-bounded, min-length filter applied before counting."""
    from platypus_ingestion_plugins_spark.functions.text import (
        top_terms_per_group,
    )

    d = spark.createDataFrame(
        [
            Row(g="a", text="apple apple banana cherry x"),
            Row(g="a", text="banana apple"),
            Row(g="b", text="zebra zebra zebra yak"),
        ]
    )
    out = top_terms_per_group(d, "text", "g", k=2, min_token_len=3).collect()
    got = {(r.g, r.rank): (r.term, r.n) for r in out}
    assert got == {
        ("a", 1): ("apple", 3),
        ("a", 2): ("banana", 2),
        ("b", 1): ("zebra", 3),
        ("b", 2): ("yak", 1),
    }


def test_hashed_bow_embeddings(spark):
    """Feature-hashing embeddings: bucket = md5-half % dim reproduced
    against hashlib, L2 norm 1 for non-empty docs, zero vector for
    empty, identical docs get identical vectors."""
    import hashlib
    import math

    from platypus_ingestion_plugins_spark.functions.text import (
        hashed_bow_embeddings,
    )

    d = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta beta"),
            Row(doc_id=2, text="alpha beta beta"),
            Row(doc_id=3, text=""),
        ]
    )
    out = {r.doc_id: r.embedding
           for r in hashed_bow_embeddings(d, "text", "doc_id", dim=8).collect()}

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 8

    expect = [0.0] * 8
    counts = [0.0] * 8
    counts[bucket("alpha")] += 1
    counts[bucket("beta")] += 2
    n = math.sqrt(sum(v * v for v in counts))
    expect = [round(v / n, 6) for v in counts]
    assert out[1] == expect
    assert out[1] == out[2]
    assert out[3] == [0.0] * 8
    assert abs(sum(v * v for v in out[1]) - 1.0) < 1e-4


def test_line_dedup_incremental_first_keeps(spark, tmp_path):
    """Streaming line dedup: first-keeps semantics across seq-ordered
    batches with the accumulated count index — batch 2's docs scrub a
    line the index has seen, the line's first doc keeps it, the union
    of batch outputs equals the one-shot first-keeps computation, and
    a key_buckets mismatch is refused by the sidecar pin."""
    idx = str(tmp_path / "idx")
    b1 = spark.createDataFrame(
        [Row(doc_id=1, text="unique one\nShared footer"),
         Row(doc_id=2, text="unique two\nShared footer")]
    )
    b2 = spark.createDataFrame(
        [Row(doc_id=3, text="unique three\nShared footer\nfresh line")]
    )
    # batch 1: no earlier index; doc 1 keeps the footer (rank 1),
    # doc 2 scrubs it (rank 2 >= min_df)
    out1 = {r.doc_id: r for r in
            dedup.line_dedup_incremental(b1, None, "text", "doc_id").collect()}
    assert out1[1].text == "unique one\nShared footer"
    assert out1[2].text == "unique two" and out1[2].n_dropped == 1
    k1 = dedup.line_count_keys(b1, "text", "doc_id")
    dedup.append_line_count_index(k1, idx, key_buckets=8)
    # batch 2: the index carries the footer's count; doc 3 scrubs it
    # but keeps its fresh line
    k2 = dedup.line_count_keys(b2, "text", "doc_id")
    earlier = dedup.read_line_counts_pruned(spark, idx, k2)
    out2 = {r.doc_id: r for r in
            dedup.line_dedup_incremental(b2, earlier, "text", "doc_id").collect()}
    assert out2[3].text == "unique three\nfresh line"
    assert out2[3].n_dropped == 1
    # bucket-scheme pin: a mismatched append or read raises
    with pytest.raises(ValueError, match="key_buckets"):
        dedup.append_line_count_index(k2, idx, key_buckets=4)
    with pytest.raises(ValueError, match="key_buckets"):
        dedup.read_line_counts_pruned(spark, idx, k2, key_buckets=4)
    # accumulated counts SUM across appends
    dedup.append_line_count_index(k2, idx, key_buckets=8)
    total = {r.line_key: r.n for r in
             dedup.read_line_counts_pruned(spark, idx, k2).collect()}
    import hashlib
    fk = hashlib.sha256(b"shared footer").hexdigest()
    assert total[fk] == 3  # 2 from batch 1 + 1 from batch 2
    # epoch-pinned replay: the same batch appended twice under one
    # batch_id collapses to a single count at read time (foreachBatch
    # is at-least-once; counts must not double)
    idx2 = str(tmp_path / "idx2")
    dedup.append_line_count_index(k1, idx2, key_buckets=8, batch_id=7)
    dedup.append_line_count_index(k1, idx2, key_buckets=8, batch_id=7)  # replay
    dedup.append_line_count_index(k2, idx2, key_buckets=8, batch_id=8)
    t2 = {r.line_key: r.n for r in
          dedup.read_line_counts_pruned(spark, idx2, k2).collect()}
    assert t2[fk] == 3  # not 5: the replayed epoch folded away
    # and compaction preserves the collapsed totals
    assert dedup.compact_line_count_index(spark, idx2, max_files_per_bucket=1)
    t3 = {r.line_key: r.n for r in
          dedup.read_line_counts_pruned(spark, idx2, k2).collect()}
    assert t3[fk] == 3


def test_line_count_index_compaction_and_crash_heal(spark, tmp_path):
    """Compaction of the line-count index: whole-index staged swap
    (merge-heal would double-count the non-idempotent counts), totals
    preserved, one file per kb dir afterwards, no-op when not
    fragmented, and a crash between the two swap renames heals on the
    next pruned read with exact totals."""
    import os

    idx = str(tmp_path / "idx")
    mk = lambda lo, hi: spark.createDataFrame(
        [Row(doc_id=i, text=f"unique {i}\nShared footer") for i in range(lo, hi)]
    )
    for lo, hi in [(0, 5), (5, 10), (10, 15)]:
        dedup.append_line_count_index(
            dedup.line_count_keys(mk(lo, hi), "text", "doc_id"),
            idx, key_buckets=4,
        )
    probe = dedup.line_count_keys(mk(0, 1), "text", "doc_id")
    import hashlib
    fk = hashlib.sha256(b"shared footer").hexdigest()
    before = {r.line_key: r.n
              for r in dedup.read_line_counts_pruned(spark, idx, probe).collect()}
    assert before[fk] == 15
    assert dedup.compact_line_count_index(spark, idx, max_files_per_bucket=1)
    for name in os.listdir(idx):
        if name.startswith("kb="):
            files = [n for n in os.listdir(f"{idx}/{name}") if n.endswith(".parquet")]
            assert len(files) == 1, (name, files)
    after = {r.line_key: r.n
             for r in dedup.read_line_counts_pruned(spark, idx, probe).collect()}
    assert after == before
    # already compact -> no-op
    assert not dedup.compact_line_count_index(spark, idx, max_files_per_bucket=1)
    # crash between the two renames: only the aside copy exists; the
    # EXISTENCE probe (what a foreachBatch branches on before its
    # append) must heal too — an append-first recovery would otherwise
    # shadow the sole copy with a fresh index and the next heal would
    # delete it (code-review r9)
    os.rename(idx, idx + "__old")
    assert dedup.line_count_index_exists(spark, idx)
    assert os.path.exists(idx) and not os.path.exists(idx + "__old")
    healed = {r.line_key: r.n
              for r in dedup.read_line_counts_pruned(spark, idx, probe).collect()}
    assert healed == before
    # a pin-only index dir (first-append crash between sidecar write
    # and data write) reads as EMPTY, not a schema-inference wedge
    idx3 = str(tmp_path / "idx3")
    os.makedirs(idx3)
    with open(f"{idx3}/_key_buckets", "w") as f:
        f.write("4")
    assert not dedup.line_count_index_exists(spark, idx3)
    assert dedup.read_line_counts_pruned(spark, idx3, probe).count() == 0


def test_line_dedup_reassembly_property(spark):
    """Property: for arbitrary line soups, line_dedup output equals
    the reference computation — each doc keeps exactly its lines whose
    normalized form is blank or appears in < min_df distinct docs, in
    original order — and row count is always preserved."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    line_st = st.sampled_from(
        ["alpha", "Alpha", " alpha ", "beta", "gamma gamma", "", "  ", "delta"]
    )

    @settings(max_examples=12, deadline=None)
    @given(
        docs=st.lists(st.lists(line_st, min_size=1, max_size=6),
                      min_size=1, max_size=6),
        min_df=st.integers(2, 3),
    )
    def check(docs, min_df):
        rows = [Row(doc_id=i, text="\n".join(ls)) for i, ls in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in
               dedup.line_dedup(df, "text", "doc_id", min_df=min_df).collect()}
        from collections import defaultdict
        seen = defaultdict(set)
        for i, ls in enumerate(docs):
            for l in ls:
                if l.strip() != "":
                    seen[l.strip().lower()].add(i)
        hot = {k for k, v in seen.items() if len(v) >= min_df}
        assert set(got) == set(range(len(docs)))
        for i, ls in enumerate(docs):
            keep = [l for l in ls
                    if l.strip() == "" or l.strip().lower() not in hot]
            assert got[i].text == "\n".join(keep), (i, ls)
            assert got[i].n_lines == len(ls)
            assert got[i].n_dropped == len(ls) - len(keep)

    check()


def test_giant_component_round_bound(spark):
    """Worst-case skew for the 100 TB dedup path (VERDICT r8 task #5a):
    ONE giant component shaped as a maximum-diameter chain (doc i ~
    doc i+1). Label propagation would need O(n) shuffle rounds here;
    large-star/small-star must converge in O(log n) — pinned at
    <= log2(n) + 2 rounds — while still labeling every node with the
    chain minimum."""
    import math

    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    stats: dict = {}
    # local_threshold=0 pins the DISTRIBUTED star algorithm — the
    # sub-threshold union-find shortcut would trivialize the bound
    out = dedup.connected_components_star(
        pairs, id_col="doc_id", stats=stats, local_threshold=0
    )
    got = dict(out.collect())
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= math.log2(n) + 2, stats
    # the union-find shortcut must produce the identical labeling
    stats2: dict = {}
    got2 = dict(
        dedup.connected_components_star(pairs, id_col="doc_id", stats=stats2)
        .collect()
    )
    assert got2 == got and stats2.get("local") is True


def test_streaming_neardup_index_read_tracks_batch_not_corpus(spark, tmp_path):
    """Steady-state scaling of the streaming near-dup index (VERDICT
    r8 task #5b): as the accumulated corpus grows across batches, a
    batch's pruned index read touches only the (band, vb) directories
    its OWN keys hash to — per-batch I/O tracks batch key diversity,
    not corpus size. Asserted on actual files opened (input_file_name)
    for the same probe batch after each of 3 growth appends."""
    import glob
    import os

    idx = str(tmp_path / "idx")
    val_buckets = 16

    def keys_df(lo, hi):
        # band 0..3 per doc; val spreads docs over all vb buckets
        return spark.createDataFrame(
            [Row(doc_id=i, band=b, val=i * 37 + b, simhash=i)
             for i in range(lo, hi) for b in range(4)]
        )

    # a FIXED probe batch with minimal key diversity: one doc, 4 keys
    probe = keys_df(0, 1)
    probe_dirs = {
        (r.band, (r.val % val_buckets))
        for r in probe.select("band", "val").distinct().collect()
    }

    files_read_per_round = []
    corpus_files_per_round = []
    for round_no, (lo, hi) in enumerate([(0, 100), (100, 300), (300, 700)]):
        dedup.append_band_key_index(keys_df(lo, hi), idx, val_buckets=val_buckets)
        pruned = dedup.read_band_keys_pruned(spark, idx, probe)
        touched = {
            r.f
            for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
        }
        # every file opened lives in a directory the probe's own keys map to
        for f in touched:
            parts = f.split("/")
            band = int([p for p in parts if p.startswith("band=")][0][5:])
            vb = int([p for p in parts if p.startswith("vb=")][0][3:])
            assert (band, vb) in probe_dirs, f
        files_read_per_round.append(len(touched))
        corpus_files_per_round.append(len(glob.glob(f"{idx}/band=*/vb=*/*.parquet")))

    # the corpus (and its file count) grew every round...
    assert corpus_files_per_round[0] < corpus_files_per_round[2]
    # ...but the probe's read grew only by the one extra file each
    # append adds to ITS OWN directories (<= |probe_dirs| per round),
    # staying a shrinking fraction of the corpus
    assert files_read_per_round[2] <= len(probe_dirs) * 3
    assert files_read_per_round[2] / corpus_files_per_round[2] < 0.2
    # and the pruned read still returns exactly the matching-dir rows
    pred = None
    for b, v in sorted(probe_dirs):
        c = (F.col("band") == b) & (
            F.pmod(F.col("val"), F.lit(val_buckets)) == v
        )
        pred = c if pred is None else pred | c
    expect_rows = spark.read.parquet(idx).filter(pred).count()
    assert dedup.read_band_keys_pruned(spark, idx, probe).count() == expect_rows


def test_resample_last_ffill_grid_and_tiebreak(spark):
    """resample_last_ffill: last-per-bucket with (ts, id) tie-break,
    gaps forward-filled across the dense per-key grid, per-key bounds
    (no fabricated buckets outside a key's own range), and
    until_bucket extending every key to a common right edge."""
    from platypus_ingestion_plugins_spark.operators.resample import (
        resample_last_ffill,
    )

    rows = [
        # key a: buckets 0 (two events, tie on ts -> higher id wins),
        # gap at 1-2, bucket 3
        Row(k="a", ms=100, v=1.0, i=1),
        Row(k="a", ms=100, v=2.0, i=2),   # same ts, larger id -> wins
        Row(k="a", ms=3_000_500, v=9.0, i=3),   # bucket 3
        # key b: single bucket 5
        Row(k="b", ms=5_000_001, v=7.0, i=4),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.k, r.bucket): r.v
        for r in resample_last_ffill(
            df, F.col("ms"), "v", key_cols=("k",), step_ms=1_000_000,
            tiebreak_col="i",
        ).collect()
    }
    assert got == {
        ("a", 0): 2.0,   # tie-break: id 2 beats id 1 at equal ts
        ("a", 1): 2.0,   # gap filled forward
        ("a", 2): 2.0,
        ("a", 3): 9.0,
        ("b", 5): 7.0,   # b's grid starts at ITS first bucket
    }, got

    # common right edge: both keys extended to bucket 7 with LOCF
    ext = {
        (r.k, r.bucket): r.v
        for r in resample_last_ffill(
            df, F.col("ms"), "v", key_cols=("k",), step_ms=1_000_000,
            tiebreak_col="i", until_bucket=7,
        ).collect()
    }
    assert ext[("a", 7)] == 9.0 and ext[("b", 7)] == 7.0
    assert len(ext) == 8 + 3  # a: 0..7, b: 5..7


def test_tar_shard_export_roundtrip(spark, tmp_path):
    """WebDataset-style tar shards: deterministic shuffle order inside
    each tar, utf-8 text + raw binary entries sharing a basename,
    byte-identical reruns (manifest sha256 stable), and the streaming
    reader reproduces every sample exactly."""
    import hashlib
    import os
    import tarfile

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
    )

    rows = [
        Row(doc_id=i, text=f"doc {i} body", payload=bytes([i % 7] * (i + 1)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "wds")
    manifest = export_tar_shards(
        df, out, "doc_id", {"text": "txt", "payload": "bin"}, n_shards=4
    )
    assert {m.shard for m in manifest} == {0, 1, 2, 3}
    assert sum(m.n_samples for m in manifest) == 40
    # manifest sha/bytes describe the files actually on disk
    for m in manifest:
        blob = open(m.path, "rb").read()
        assert len(blob) == m.n_bytes
        assert hashlib.sha256(blob).hexdigest() == m.sha256
    # entries inside a shard follow the deterministic permutation and
    # pair .txt/.bin per sample
    with tarfile.open(manifest[0].path) as t:
        names = t.getnames()
    assert names == sorted(
        names, key=lambda n: names.index(n)
    ) and len(names) == manifest[0].n_samples * 2
    stems = [n.rsplit(".", 1)[0] for n in names]
    assert stems[0::2] == stems[1::2], "sample entries must be adjacent"

    # byte-identical rerun (fresh dir): same shas
    out2 = str(tmp_path / "wds2")
    manifest2 = export_tar_shards(
        df, out2, "doc_id", {"text": "txt", "payload": "bin"}, n_shards=4
    )
    assert {(m.shard, m.sha256) for m in manifest} == {
        (m.shard, m.sha256) for m in manifest2
    }

    # streaming read-back: every sample exact, both modalities
    back = read_tar_shards(
        spark, out, {"txt": "text", "bin": "payload"},
        key_name="k", binary_cols=("payload",),
    )
    got = {int(r.k): (r.text, bytes(r.payload)) for r in back.collect()}
    assert got == {r.doc_id: (r.text, r.payload) for r in rows}

    # overwrite semantics (ADVICE r8): re-export over the SAME dir with
    # fewer shards must clear the wider layout — stale shard-00002/3.tar
    # must not survive for read_tar_shards to silently include
    manifest3 = export_tar_shards(
        df, out, "doc_id", {"text": "txt", "payload": "bin"}, n_shards=2
    )
    assert {m.shard for m in manifest3} == {0, 1}
    on_disk = sorted(n for n in os.listdir(out) if n.endswith(".tar"))
    assert on_disk == ["shard-00000.tar", "shard-00001.tar"]
    back2 = read_tar_shards(
        spark, out, {"txt": "text", "bin": "payload"},
        key_name="k", binary_cols=("payload",),
    )
    assert back2.count() == 40

    # IN-PLACE reshard (code-review r9): the stage-then-swap must read
    # the old generation intact while writing the new one — a pre-job
    # destination delete would destroy the lazily-read source
    manifest4 = export_tar_shards(
        back2.withColumnsRenamed({"k": "doc_id"}),
        out, "doc_id", {"text": "txt", "payload": "bin"}, n_shards=3,
    )
    assert sum(m.n_samples for m in manifest4) == 40
    on_disk4 = sorted(n for n in os.listdir(out) if n.endswith(".tar"))
    assert on_disk4 == [f"shard-0000{i}.tar" for i in range(3)]
    assert not os.path.exists(f"{out}/.tar_staging")
    back3 = read_tar_shards(
        spark, out, {"txt": "text", "bin": "payload"},
        key_name="k", binary_cols=("payload",),
    )
    got3 = {int(r.k): (r.text, bytes(r.payload)) for r in back3.collect()}
    assert got3 == {r.doc_id: (r.text, r.payload) for r in rows}


def test_ivf_append_compact(spark, tmp_path):
    """Incremental IVF maintenance: appends fragment lists (one file
    per touched dir per batch), mismatched centroids are refused by
    the sidecar pin, compaction rewrites to one file per list with
    assignments intact, heal merges a parked list into a post-crash
    recreation, and the pruned probe scan works over the incremental
    layout."""
    import os

    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 4 == 0), float(i % 4 == 1),
                                  float(i % 4 == 2), float(i % 4 == 3)])
         for i in range(80)]
    )
    cents = emb.orderBy("vec_id").limit(4)
    idx = str(tmp_path / "ivf")
    similarity.append_ivf_partitioned(emb.filter("vec_id < 40"), cents, idx)
    assert os.path.exists(f"{idx}/_centroids_sha")  # pin-before-data
    similarity.append_ivf_partitioned(emb.filter("vec_id >= 40"), cents, idx)

    # a different centroid set must be refused
    other = emb.orderBy(F.desc("vec_id")).limit(4)
    with pytest.raises(ValueError, match="pinned to a different centroid"):
        similarity.append_ivf_partitioned(emb, other, idx)

    def leaf_files(d):
        return {
            c: [f for f in os.listdir(f"{d}/{c}") if f.endswith(".parquet")]
            for c in os.listdir(d) if c.startswith("cent_id=")
        }

    assert all(len(fs_) == 2 for fs_ in leaf_files(idx).values())
    before = {(r.vec_id, r.cent_id) for r in spark.read.parquet(idx).collect()}
    assert len(before) == 80
    done = similarity.compact_ivf_partitioned(spark, idx, max_files_per_dir=1)
    assert done and all(len(fs_) == 1 for fs_ in leaf_files(idx).values())
    assert {(r.vec_id, r.cent_id) for r in spark.read.parquet(idx).collect()} == before
    assert similarity.compact_ivf_partitioned(spark, idx, max_files_per_dir=1) == []

    # crash between park and swap-in, then an append recreates the dir:
    # heal must MERGE, not drop the park
    victim = sorted(c for c in os.listdir(idx) if c.startswith("cent_id="))[0]
    os.rename(f"{idx}/{victim}", f"{idx}/.precompact-{victim}")
    similarity.append_ivf_partitioned(emb.filter("vec_id < 40"), cents, idx)
    similarity.compact_ivf_partitioned(spark, idx, max_files_per_dir=1000)  # heal only
    assert not os.path.exists(f"{idx}/.precompact-{victim}")
    healed = {(r.vec_id, r.cent_id) for r in spark.read.parquet(idx).collect()}
    assert healed == before, "heal lost or refiled vectors"
    # follow-up compaction absorbs the replay duplicates
    similarity.compact_ivf_partitioned(spark, idx, max_files_per_dir=0)
    rows = spark.read.parquet(idx).collect()
    assert len(rows) == 80 and {(r.vec_id, r.cent_id) for r in rows} == before

    # probe scan over the incremental layout prunes to nprobe lists
    q = emb.filter("vec_id = 0")
    got = similarity.ivf_probe_scan(spark, idx, cents, q, nprobe=1)
    assert 0 < got.count() < 80


def test_normalize_unicode_forms(spark):
    """normalize_unicode: decomposed input composes under NFC,
    compatibility forms fold ligatures, None passes through, and
    normalize-before-hash actually repairs dedup (the composed and
    decomposed spellings collapse to one hash)."""
    from platypus_ingestion_plugins_spark.functions.text import normalize_unicode

    rows = [
        Row(i=1, t="café"),   # cafe + combining acute (decomposed)
        Row(i=2, t="café"),          # café (composed)
        Row(i=3, t="ﬁle"),           # ﬁ ligature + le
        Row(i=4, t=None),
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.i: (r.nfc, r.nfkc)
        for r in df.select(
            "i",
            normalize_unicode("t", "NFC").alias("nfc"),
            normalize_unicode("t", "NFKC").alias("nfkc"),
        ).collect()
    }
    assert out[1][0] == out[2][0] == "café"  # both spellings compose
    assert out[3][1] == "file"  # NFKC folds the ligature
    assert out[3][0] == "ﬁle"  # NFC does not
    assert out[4] == (None, None)
    # dedup repair: hashes collapse only after normalization
    hashes = df.filter("i <= 2").select(
        F.sha2(F.col("t"), 256).alias("raw"),
        F.sha2(normalize_unicode("t"), 256).alias("norm"),
    ).collect()
    assert hashes[0].raw != hashes[1].raw
    assert hashes[0].norm == hashes[1].norm

    with pytest.raises(ValueError, match="unknown normalization form"):
        normalize_unicode("t", "NFX")


def test_chunk_text_windows(spark):
    """chunk_text: overlap coverage (consecutive chunks share exactly
    `overlap` chars), final short chunk, empty doc yields one empty
    chunk, and overlap >= size is rejected."""
    from platypus_ingestion_plugins_spark.functions.text import chunk_text

    df = spark.createDataFrame(
        [Row(doc_id=1, text="abcdefghij"), Row(doc_id=2, text=""),
         Row(doc_id=3, text="xyz")]
    )
    got = {
        (r.doc_id, r.chunk_id): r.chunk
        for r in chunk_text(df, "text", "doc_id", chunk_chars=6, overlap=2).collect()
    }
    # doc 1 (10 chars, step 4): windows at 0,4,8
    assert got[(1, 0)] == "abcdef" and got[(1, 1)] == "efghij" and got[(1, 2)] == "ij"
    assert got[(1, 0)][-2:] == got[(1, 1)][:2]  # shared overlap
    assert got[(2, 0)] == ""  # empty doc -> one empty chunk
    assert got[(3, 0)] == "xyz" and (3, 1) not in got
    assert len(got) == 5

    with pytest.raises(ValueError, match="overlap must be smaller"):
        chunk_text(df, "text", "doc_id", chunk_chars=4, overlap=4)


def test_cap_per_group_deterministic(spark):
    """cap_per_group: binds only above k, kept set is
    partitioning-invariant, and is incrementally stable (adding rows
    can swap at most the displaced members, never reshuffle the kept
    set wholesale)."""
    from platypus_ingestion_plugins_spark.functions.sampling import cap_per_group

    rows = [Row(doc_id=i, src=f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows)
    kept = {r.doc_id for r in cap_per_group(df, "doc_id", "src", k=10).collect()}
    assert len(kept) == 30
    counts = (
        cap_per_group(df, "doc_id", "src", k=10)
        .groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert all(r.n == 10 for r in counts)
    # under-cap groups keep everything
    assert cap_per_group(df, "doc_id", "src", k=100).count() == 90
    # partitioning invariance
    kept2 = {
        r.doc_id
        for r in cap_per_group(df.repartition(17), "doc_id", "src", k=10).collect()
    }
    assert kept == kept2
    # incremental stability: new rows only displace, never reshuffle
    grown = df.union(spark.createDataFrame([Row(doc_id=i, src=f"s{i % 3}") for i in range(90, 120)]))
    kept3 = {r.doc_id for r in cap_per_group(grown, "doc_id", "src", k=10).collect()}
    assert len(kept & kept3) >= 30 - len(kept3 - kept)


def test_chunk_text_reconstruction_property(spark):
    """Property: dropping each chunk's overlap prefix (except the
    first) and concatenating reproduces the original text exactly —
    chunking loses nothing and duplicates only the declared overlap."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from platypus_ingestion_plugins_spark.functions.text import chunk_text

    @settings(max_examples=20, deadline=None)
    @given(
        st.text(alphabet="abcdef Ωé", max_size=400),
        st.integers(min_value=2, max_value=50),
        st.integers(min_value=0, max_value=40),
    )
    def check(text, size, overlap):
        if overlap >= size:
            overlap = size - 1
        step = size - overlap
        df = spark.createDataFrame([Row(doc_id=1, text=text)])
        chunks = [
            r.chunk
            for r in chunk_text(df, "text", "doc_id", size, overlap)
            .orderBy("chunk_id").collect()
        ]
        rebuilt = (chunks[0] if chunks else "") + "".join(
            c[overlap:] for c in chunks[1:]
        )
        assert rebuilt == text, (size, overlap, chunks)

    check()


def test_dataset_diff_changes(spark):
    """dataset_diff: added/removed/changed classification, unchanged
    keys omitted, default compare columns = shared non-key set, and
    the join plan carries hashes — not payloads."""
    from platypus_ingestion_plugins_spark.operators.diff import dataset_diff

    old = spark.createDataFrame(
        [Row(k=1, text="a", lang="en"), Row(k=2, text="b", lang="en"),
         Row(k=3, text="c", lang="en")]
    )
    new = spark.createDataFrame(
        [Row(k=2, text="b", lang="en"),        # unchanged -> omitted
         Row(k=3, text="c-edited", lang="en"), # changed
         Row(k=4, text="d", lang="en")]        # added
    )
    got = {r.k: r.change for r in dataset_diff(old, new, "k").collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}

    # restricting compare_cols ignores drift in other columns
    new2 = new.withColumn("lang", F.lit("fr"))
    got2 = {
        r.k: r.change
        for r in dataset_diff(old, new2, "k", compare_cols=["text"]).collect()
    }
    assert got2 == {1: "removed", 3: "changed", 4: "added"}  # lang drift invisible

    # payloads never cross the join exchange: every Exchange node in
    # the physical plan carries only the key and the two hash columns
    import io
    import re
    import sys as _sys

    df = dataset_diff(old, new, "k")
    buf = io.StringIO()
    stdout, _sys.stdout = _sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        _sys.stdout = stdout
    plan = buf.getvalue()
    for m in re.finditer(r"\(\d+\) Exchange\n((?:(?!\(\d+\)).*\n)*)", plan):
        block = m.group(1)
        assert "text#" not in block and "lang#" not in block, block


def test_jsonl_shard_export_order_and_roundtrip(spark, tmp_path):
    """export_jsonl_shards: gzip JSONL shards whose in-file line order
    follows the deterministic permutation (concatenating shard dirs in
    name order replays shuffle_positions exactly), typed read-back
    reproduces every row."""
    import glob
    import gzip
    import json as _json

    from platypus_ingestion_plugins_spark.operators.export import (
        export_jsonl_shards,
        read_jsonl_shards,
        shuffle_positions,
    )

    rows = [Row(doc_id=i, text=f"doc {i}") for i in range(120)]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "jsonl")
    export_jsonl_shards(df, out, "doc_id", n_shards=4)

    files = sorted(glob.glob(f"{out}/shard=*/part-*"))
    assert files and all(f.endswith(".gz") for f in files)
    # concatenated (shard, file) name order == the materialized permutation
    seq = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            seq.extend(_json.loads(line)["doc_id"] for line in fh)
    expect = [
        r.doc_id
        for r in shuffle_positions(df, "doc_id", 4).orderBy("shard", "pos").collect()
    ]
    assert seq == expect

    back = read_jsonl_shards(spark, out, "doc_id long, text string")
    got = {(r.doc_id, r.text) for r in back.collect()}
    assert got == {(r.doc_id, r.text) for r in rows}


def test_score_with_init_once_and_alignment(spark):
    """score_with: init() runs once per TASK (not per batch/row),
    outputs stay row-aligned across multiple Arrow batches, all input
    columns pass through, and null text is handled."""
    from platypus_ingestion_plugins_spark.functions.inference import (
        hash_scorer,
        score_with,
    )

    n = 5000  # > arrow batch size (default 10k? force batches via conf)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "500")
    try:
        df = spark.createDataFrame(
            [Row(doc_id=i, text=(None if i % 997 == 0 else f"t{i}"), extra=i * 2)
             for i in range(n)]
        ).repartition(4)

        def init():
            import os as _os

            return ("model", _os.getpid())

        def scorer(model, pdf):
            import pandas as pd

            assert model[0] == "model"  # the init()-built object arrives
            return pd.DataFrame(
                {"score": pdf["text"].map(lambda t: float(len(t or "")))}
            )

        out = score_with(df, ["text"], [("score", "double")], scorer, init=init)
        rows = out.collect()
        assert len(rows) == n
        for r in rows[:200]:
            expected = 0.0 if r.text is None else float(len(r.text))
            assert r.score == expected and r.extra == r.doc_id * 2

        # deterministic stand-in is partitioning-invariant
        a = {(r.doc_id, r.score) for r in score_with(
            df, ["text"], [("score", "double")], hash_scorer("text")).collect()}
        b = {(r.doc_id, r.score) for r in score_with(
            df.repartition(11), ["text"], [("score", "double")],
            hash_scorer("text")).collect()}
        assert a == b
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_pick_survivors_policies(spark):
    """pick_survivors: default keeps the group-min id; order_col keeps
    the best (longest here) with deterministic id tie-break; singleton
    groups pass through."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="short", n=5),
         Row(doc_id=2, text="the longest copy", n=16),
         Row(doc_id=3, text="medium copy", n=11),
         Row(doc_id=9, text="solo", n=4)]
    )
    groups = spark.createDataFrame(
        [Row(doc_id=1, group_id=1), Row(doc_id=2, group_id=1),
         Row(doc_id=3, group_id=1), Row(doc_id=9, group_id=9)]
    )
    by_id = {r.group_id: r.doc_id for r in dedup.pick_survivors(docs, groups).collect()}
    assert by_id == {1: 1, 9: 9}
    by_len = {
        r.group_id: r.doc_id
        for r in dedup.pick_survivors(docs, groups, order_col="n").collect()
    }
    assert by_len == {1: 2, 9: 9}  # longest wins
    # ascending: smallest n wins; ties (none here) break on id
    by_short = {
        r.group_id: r.doc_id
        for r in dedup.pick_survivors(docs, groups, order_col="n", ascending=True).collect()
    }
    assert by_short == {1: 1, 9: 9}  # smallest n within group 1 is doc 1 (n=5)
    # groups built from PAIRS only (no nodes=): docs absent from the
    # groups frame are singletons and must survive as their own group,
    # not vanish through an inner join (ADVICE r8)
    pair_groups = spark.createDataFrame(
        [Row(doc_id=1, group_id=1), Row(doc_id=2, group_id=1),
         Row(doc_id=3, group_id=1)]
    )
    kept = dedup.pick_survivors(docs, pair_groups).collect()
    assert {(r.doc_id, r.group_id) for r in kept} == {(1, 1), (9, 9)}
    # null order values place exactly as the window would (asc = nulls
    # first, desc = nulls last) through the min_by aggregate fast path
    nd = spark.createDataFrame(
        [Row(doc_id=1, n=None), Row(doc_id=2, n=7), Row(doc_id=3, n=3)],
        "doc_id int, n int",
    )
    ng = spark.createDataFrame([Row(doc_id=i, group_id=1) for i in (1, 2, 3)])
    desc_r = dedup.pick_survivors(nd, ng, order_col="n").collect()
    assert [(r.doc_id, r.n) for r in desc_r] == [(2, 7)]  # nulls last
    asc_r = dedup.pick_survivors(nd, ng, order_col="n", ascending=True).collect()
    assert [(r.doc_id, r.n) for r in asc_r] == [(1, None)]  # nulls first
    # non-numeric ascending order col exercises the struct key directly
    sd = spark.createDataFrame(
        [Row(doc_id=1, s="beta"), Row(doc_id=2, s="alpha")]
    )
    sg = spark.createDataFrame([Row(doc_id=i, group_id=1) for i in (1, 2)])
    s_r = dedup.pick_survivors(sd, sg, order_col="s", ascending=True).collect()
    assert [(r.doc_id, r.s) for r in s_r] == [(2, "alpha")]
    # non-numeric DESCENDING falls back to the window path
    s_r2 = dedup.pick_survivors(sd, sg, order_col="s").collect()
    assert [(r.doc_id, r.s) for r in s_r2] == [(1, "beta")]
    # overflow-safe descending: Long.MIN_VALUE must sort LAST under
    # desc (code-review r9 — unary negation wraps or throws there)
    MIN = -(2 ** 63)
    od = spark.createDataFrame(
        [Row(doc_id=1, n=MIN), Row(doc_id=2, n=5)], "doc_id int, n long"
    )
    og = spark.createDataFrame([Row(doc_id=i, group_id=1) for i in (1, 2)])
    o_r = dedup.pick_survivors(od, og, order_col="n").collect()
    assert [(r.doc_id, r.n) for r in o_r] == [(2, 5)]
    # NaN places FIRST under desc, matching the window's sort order
    nan = float("nan")
    fd = spark.createDataFrame(
        [Row(doc_id=1, q=0.9), Row(doc_id=2, q=nan)], "doc_id int, q double"
    )
    f_r = dedup.pick_survivors(fd, og, order_col="q").collect()
    assert [r.doc_id for r in f_r] == [2]
    # and LAST under asc (Spark sorts NaN greatest)
    f_r2 = dedup.pick_survivors(fd, og, order_col="q", ascending=True).collect()
    assert [r.doc_id for r in f_r2] == [1]


def _leaf_file_counts(root, depth2=False):
    """{partition dir: parquet-file count} for one- or two-level
    partitioned indexes (cent_id=/kb= vs band=/vb=)."""
    import os

    out = {}
    for a in os.listdir(root):
        if "=" not in a or a.startswith("."):
            continue
        if depth2:
            for b in os.listdir(f"{root}/{a}"):
                if "=" not in b or b.startswith("."):
                    continue
                out[f"{a}/{b}"] = sum(
                    f.endswith(".parquet") for f in os.listdir(f"{root}/{a}/{b}")
                )
        else:
            out[a] = sum(
                f.endswith(".parquet") for f in os.listdir(f"{root}/{a}")
            )
    return out


def test_band_key_index_auto_compaction_plateau(spark, tmp_path):
    """Auto-compaction policy (VERDICT r9 task #5): with
    auto_compact_max_files set, per-directory file count PLATEAUS at
    threshold+1 across 12 appends instead of growing one file per
    batch, and the read-back key SET is exactly the appended corpus
    (compaction is semantically invisible)."""
    idx = str(tmp_path / "band_idx")
    expect = set()
    peak = 0
    for b in range(12):
        rows = [Row(doc_id=b * 10 + i, simhash=(b * 10 + i) * 7,
                    band=i % 2, val=(b * 10 + i) % 5)
                for i in range(4)]
        expect |= {(r.doc_id, r.simhash, r.band, r.val) for r in rows}
        dedup.append_band_key_index(
            spark.createDataFrame(rows), idx, val_buckets=4,
            auto_compact_max_files=2,
        )
        peak = max(peak, max(_leaf_file_counts(idx, depth2=True).values()))
    # compact-before-append at threshold 2: a dir can hold at most 2
    # pre-existing files plus this batch's one
    assert peak <= 3, peak
    got = {(r.doc_id, r.simhash, r.band, r.val)
           for r in spark.read.parquet(idx).select("doc_id", "simhash", "band", "val").collect()}
    assert got == expect
    # without the policy the same 12 appends would have fragmented to
    # ~12 files in a hot dir — prove the counterfactual on a sibling
    idx2 = str(tmp_path / "band_idx_nopolicy")
    for b in range(12):
        rows = [Row(doc_id=b * 10 + i, simhash=1, band=0, val=0) for i in range(2)]
        dedup.append_band_key_index(spark.createDataFrame(rows), idx2, val_buckets=4)
    assert max(_leaf_file_counts(idx2, depth2=True).values()) == 12


def test_ivf_auto_compaction_plateau(spark, tmp_path):
    """IVF twin of the band-key plateau: 12 ingest batches against
    pinned centroids with auto_compact_max_files=2 keep every
    cent_id= list at <= 3 files, assignments intact."""
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i % 4 == 0), float(i % 4 == 1),
                                  float(i % 4 == 2), float(i % 4 == 3)])
         for i in range(96)]
    )
    cents = emb.orderBy("vec_id").limit(4)
    idx = str(tmp_path / "ivf")
    peak = 0
    for b in range(12):
        similarity.append_ivf_partitioned(
            emb.filter((F.col("vec_id") >= b * 8) & (F.col("vec_id") < (b + 1) * 8)),
            cents, idx, auto_compact_max_files=2,
        )
        peak = max(peak, max(_leaf_file_counts(idx).values()))
    assert peak <= 3, peak
    got = {(r.vec_id, r.cent_id) for r in spark.read.parquet(idx).collect()}
    assert len(got) == 96 and {v for v, _ in got} == set(range(96))


def test_line_count_auto_compaction_exact_under_replay(spark, tmp_path):
    """Line-count auto-compaction must stay EXACT under at-least-once
    replay: auto_compact_max_files=0 forces a fold before every
    append, a replayed epoch (same batch_id appended twice, fold in
    between) is carried through the rewrite still tagged
    (exclude_batch_id) so the reader's (line_key, batch_id) collapse
    counts it once. 12 epochs + 1 replay -> totals of exactly 12."""
    import hashlib

    idx = str(tmp_path / "lines")
    mk = lambda b: spark.createDataFrame(
        [Row(doc_id=b * 10 + i, text=f"unique {b * 10 + i}\nShared footer")
         for i in range(3)]
    )
    peak = 0
    for b in range(12):
        counts = dedup.line_count_keys(mk(b), "text", "doc_id")
        dedup.append_line_count_index(
            counts, idx, key_buckets=4, batch_id=b, auto_compact_max_files=0,
        )
        if b == 5:  # crashed-then-replayed epoch: same batch_id again
            dedup.append_line_count_index(
                counts, idx, key_buckets=4, batch_id=b,
                auto_compact_max_files=0,
            )
        peak = max(peak, max(_leaf_file_counts(idx).values()))
    # fold-every-append keeps each kb dir near one file; the replayed
    # epoch rides tagged beside the fold, so <= 3 at the peak
    assert peak <= 3, peak
    probe = dedup.line_count_keys(mk(0), "text", "doc_id")
    fk = hashlib.sha256(b"shared footer").hexdigest()
    totals = {r.line_key: r.n
              for r in dedup.read_line_counts_pruned(spark, idx, probe).collect()}
    # 12 epochs x 3 docs sharing the footer; the replay must NOT make it 39
    assert totals[fk] == 36, totals[fk]


def test_single_eval_flag_equivalence(spark):
    """single_eval=False (ADVICE r9: lineage-free localCheckpoint vs
    executor-loss recompute) must be a pure execution-strategy choice:
    identical results from ngram_jaccard_pairs, minhash_lsh_dedup_pairs
    and the composed clean_corpus with the checkpoint off."""
    from platypus_ingestion_plugins_spark.pipelines import clean_corpus

    d = spark.createDataFrame(
        [Row(doc_id=i,
             text=("the quick brown fox jumps over the lazy dog " * 3
                   + (f"tail {i % 4}" if i % 3 else "")))
         for i in range(24)]
    )
    for fn in (dedup.ngram_jaccard_pairs, dedup.minhash_lsh_dedup_pairs):
        on = {tuple(r) for r in fn(d, "text", "doc_id", threshold=0.5).collect()}
        off = {tuple(r) for r in fn(
            d, "text", "doc_id", threshold=0.5, single_eval=False
        ).collect()}
        assert on == off and on, fn.__name__
    bench = d.filter("doc_id % 7 = 0").select("doc_id", "text")
    on = {r.doc_id for r in clean_corpus(
        d, benchmark=bench, min_quality=0.0, near_dup_threshold=0.3
    ).collect()}
    off = {r.doc_id for r in clean_corpus(
        d, benchmark=bench, min_quality=0.0, near_dup_threshold=0.3,
        single_eval=False,
    ).collect()}
    assert on == off


def test_tar_export_commit_marker_and_staging_generations(spark, tmp_path):
    """ADVICE r9: generation-suffixed staging + _manifest.json commit
    marker. The marker certifies a completed swap (reader uses it as
    the shard list, ignores foreign leftovers, raises on a tar the
    marker names but the dir lacks); a crashed run's orphan staging
    dir neither breaks nor is mistaken for the live run's, and is
    swept by the next successful export."""
    import json
    import os

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
    )

    rows = [Row(doc_id=i, text=f"doc {i}") for i in range(20)]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "wds")
    # a crashed previous run left an orphan staging dir with a partial
    # tar; a YOUNG orphan could be a live concurrent export, so the
    # sweep must leave it (code-review r10 #2) — only once its files
    # are idle >= 1 h is it swept as dead
    os.makedirs(f"{out}/.tar_staging-deadbeef0000")
    with open(f"{out}/.tar_staging-deadbeef0000/shard-00000.tar", "wb") as f:
        f.write(b"partial garbage")

    manifest = export_tar_shards(df, out, "doc_id", {"text": "txt"}, n_shards=2)
    assert os.path.exists(f"{out}/_manifest.json")
    # fresh orphan survives (live-racer protection), own staging gone
    assert [n for n in os.listdir(out) if n.startswith(".tar_staging")] == [
        ".tar_staging-deadbeef0000"
    ]
    # backdate the orphan 2h: now provably dead -> next export sweeps it
    import time as _time

    old = _time.time() - 7200
    os.utime(f"{out}/.tar_staging-deadbeef0000/shard-00000.tar", (old, old))
    manifest = export_tar_shards(df, out, "doc_id", {"text": "txt"}, n_shards=2)
    assert not [n for n in os.listdir(out) if n.startswith(".tar_staging")]
    # sentinel dropped (generation-suffixed since r11)
    assert not [n for n in os.listdir(out) if n.startswith(".swap_in_progress")]
    committed = json.load(open(f"{out}/_manifest.json"))
    assert committed["n_shards"] == 2
    assert {e["sha256"] for e in committed["shards"]} == {m.sha256 for m in manifest}

    # a leftover tar the marker does not name is IGNORED by the reader
    with open(f"{out}/shard-00099.tar", "wb") as f:
        f.write(b"stale generation noise")
    back = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
    assert {int(r.k) for r in back.collect()} == {r.doc_id for r in rows}
    os.remove(f"{out}/shard-00099.tar")

    # a tar the marker names but the dir lacks -> interrupted swap
    os.remove(f"{out}/shard-00001.tar")
    with pytest.raises(FileNotFoundError, match="interrupted swap"):
        read_tar_shards(spark, out, {"txt": "text"})

    # rerunning the export converges: marker + tars consistent again
    export_tar_shards(df, out, "doc_id", {"text": "txt"}, n_shards=2)
    back2 = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
    assert {int(r.k) for r in back2.collect()} == {r.doc_id for r in rows}

    # a swap crash BEFORE the new marker lands leaves the sentinel and
    # no marker: the reader must refuse, not fall back to a silent
    # mixed-generation listing (code-review r10 #1)
    os.remove(f"{out}/_manifest.json")
    with open(f"{out}/.swap_in_progress", "w") as f:
        f.write("cafecafe0000")
    with pytest.raises(FileNotFoundError, match="interrupted swap"):
        read_tar_shards(spark, out, {"txt": "text"})
    os.remove(f"{out}/.swap_in_progress")

    # marker-less AND sentinel-less (hand-assembled / pre-marker
    # export): listing path
    back3 = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
    assert {int(r.k) for r in back3.collect()} == {r.doc_id for r in rows}


def test_tar_swap_sentinel_per_generation_racer_safety(spark, tmp_path):
    """r11 review #1/#2: sentinels are generation-suffixed, so a
    completing export can never delete a concurrent racer's in-flight
    crash protection; a LIVE racer's commit temp survives the sweep;
    a STALE crashed sentinel (a permanent reader-blocker otherwise) is
    cleared by the next successful export."""
    import os
    import time as _time

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
    )

    rows = [Row(doc_id=i, text=f"doc {i}") for i in range(10)]
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "wds")
    os.makedirs(out)
    # a racer mid-commit: young generation-suffixed sentinel + its
    # manifest temp, both fresh
    with open(f"{out}/.swap_in_progress-racergen0001", "w") as f:
        f.write("racergen0001")
    with open(f"{out}/.manifest-racergen0001.tmp", "w") as f:
        f.write("{}")

    export_tar_shards(df, out, "doc_id", {"text": "txt"}, n_shards=2)
    # the completing export kept the racer's sentinel AND its commit
    # temp (the old shared-path sentinel was deleted here; the old
    # sweep deleted the temp unconditionally)
    names = set(os.listdir(out))
    assert ".swap_in_progress-racergen0001" in names
    assert ".manifest-racergen0001.tmp" in names
    # no sentinel of OUR OWN left behind
    assert [n for n in names if n.startswith(".swap_in_progress")] == [
        ".swap_in_progress-racergen0001"
    ]
    # the racer's sentinel is still up -> the dir is not yet readable
    with pytest.raises(FileNotFoundError, match="interrupted swap"):
        read_tar_shards(spark, out, {"txt": "text"})

    # the racer actually crashed: 2h later its sentinel is provably
    # dead -> the next export clears it and (its sentinel now down)
    # sweeps the orphan temp; the dir becomes readable again
    old = _time.time() - 7200
    os.utime(f"{out}/.swap_in_progress-racergen0001", (old, old))
    export_tar_shards(df, out, "doc_id", {"text": "txt"}, n_shards=2)
    names = set(os.listdir(out))
    assert not [n for n in names if n.startswith(".swap_in_progress")]
    assert ".manifest-racergen0001.tmp" not in names
    back = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
    assert {int(r.k) for r in back.collect()} == {r.doc_id for r in rows}


def test_line_count_pruned_read_excludes_inflight_epoch(spark, tmp_path):
    """code-review r10 #4: a foreachBatch replay whose previous attempt
    crashed AFTER appending must not read its own epoch back as
    'earlier' state — exclude_batch_id makes the replay's view
    identical to the first attempt's, so the replayed suppression
    decision (and output) is identical too."""
    idx = str(tmp_path / "lines")
    mk = lambda lo, hi: spark.createDataFrame(
        [Row(doc_id=i, text=f"unique {i}\nShared footer") for i in range(lo, hi)]
    )
    b0, b1 = mk(0, 5), mk(5, 10)
    dedup.append_line_count_index(
        dedup.line_count_keys(b0, "text", "doc_id"), idx,
        key_buckets=4, batch_id=0,
    )
    probe = dedup.line_count_keys(b1, "text", "doc_id")
    first_attempt_view = {
        r.line_key: r.n
        for r in dedup.read_line_counts_pruned(
            spark, idx, probe, exclude_batch_id=1
        ).collect()
    }
    # attempt 1 appends its counts, then "crashes" before the commit
    dedup.append_line_count_index(
        dedup.line_count_keys(b1, "text", "doc_id"), idx,
        key_buckets=4, batch_id=1,
    )
    # replay of epoch 1: with the exclusion its view matches attempt 1
    replay_view = {
        r.line_key: r.n
        for r in dedup.read_line_counts_pruned(
            spark, idx, probe, exclude_batch_id=1
        ).collect()
    }
    assert replay_view == first_attempt_view
    # without the exclusion the replay would see its own rows: footer
    # count inflated by the in-flight epoch's 5 docs
    import hashlib
    fk = hashlib.sha256(b"shared footer").hexdigest()
    unexcluded = {
        r.line_key: r.n
        for r in dedup.read_line_counts_pruned(spark, idx, probe).collect()
    }
    assert unexcluded[fk] == first_attempt_view[fk] + 5


def test_semdedup_signbit_and_kmeans_paths(spark):
    # two tight clusters on opposite sides of dim-0 plus one isolate;
    # within each cluster the smaller id survives
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[0.999, 0.01]),
            Row(vec_id=2, embedding=[-1.0, 0.05]),
            Row(vec_id=3, embedding=[-0.999, 0.06]),
            Row(vec_id=4, embedding=[0.0, 1.0]),
        ]
    )
    kept = sorted(
        r.vec_id
        for r in similarity.semdedup(emb, threshold=0.99, bits=2).collect()
    )
    assert kept == [0, 2, 4]
    # kmeans-cluster path (the paper's clustering) agrees here: the
    # clusters separate the same neighborhoods
    cl = similarity.ivf_assign(
        emb, similarity.kmeans_centroids(emb, n_centroids=2, iters=4)
    ).select("vec_id", "cent_id")
    kept_km = sorted(
        r.vec_id
        for r in similarity.semdedup(emb, threshold=0.99, clusters=cl).collect()
    )
    assert kept_km == [0, 2, 4]
    # keeps every original column
    cols = similarity.semdedup(emb, threshold=0.99, bits=2).columns
    assert cols == ["vec_id", "embedding"]


def test_semdedup_max_cluster_size_skew_guard(spark):
    """VERDICT r10 task #4: the hot-cluster cap. Adversarial fixture —
    EVERY hot row collapses onto ONE sign bucket (all-positive dims),
    the exact correlated-embedding skew the signbit default is
    vulnerable to. Uncapped, that cluster pays O(n^2) pairs in a
    single task; with ``max_cluster_size`` the over-sized cluster is
    excluded BEFORE the pair join (structurally: the broadcast
    anti-join precedes the self-join, so its pair volume is zero, and
    every surviving cluster is capped at max_cluster_size^2 pairs).
    Rows of the excluded cluster are kept verbatim; well-behaved
    clusters still dedup."""
    n = 40
    hot = [Row(vec_id=i, embedding=[1.0, 0.9 + i * 1e-6]) for i in range(n)]
    cold = [
        Row(vec_id=100, embedding=[-1.0, 0.05]),
        Row(vec_id=101, embedding=[-0.999, 0.051]),
    ]
    emb = spark.createDataFrame(hot + cold)
    # uncapped baseline: the hot cluster collapses to its min id
    kept_uncapped = sorted(
        r.vec_id
        for r in similarity.semdedup(emb, threshold=0.99, bits=2).collect()
    )
    assert kept_uncapped == [0, 100]
    # capped below the hot-cluster size: hot rows are ALL kept (exempt,
    # the safe direction), the 2-row cold cluster still dedupes — the
    # cap bites exactly the over-sized cluster, nothing else
    kept = sorted(
        r.vec_id
        for r in similarity.semdedup(
            emb, threshold=0.99, bits=2, max_cluster_size=10
        ).collect()
    )
    assert kept == list(range(n)) + [100]
    # cap >= every cluster size is a no-op: exact semantics preserved
    kept_loose = sorted(
        r.vec_id
        for r in similarity.semdedup(
            emb, threshold=0.99, bits=2, max_cluster_size=n
        ).collect()
    )
    assert kept_loose == kept_uncapped
    # the cap applies to user-supplied kmeans clusters too
    cl = similarity.ivf_assign(
        emb, similarity.kmeans_centroids(emb, n_centroids=2, iters=2)
    ).select("vec_id", "cent_id")
    kept_km = similarity.semdedup(
        emb, threshold=0.99, clusters=cl, max_cluster_size=10
    ).count()
    assert kept_km >= n  # the hot kmeans cell is exempt as well


def test_contaminated_embeddings_dim_mismatch_fails_loud(spark):
    """r11 review #6: screening a 64-dim corpus against a 128-dim
    benchmark set (wrong model/column) must FAIL, not silently report
    zero contamination; NULL vectors on either side stay non-errors."""
    import pyspark.sql.types as T

    from platypus_ingestion_plugins_spark.operators.decontam import (
        contaminated_embeddings,
    )

    c = spark.createDataFrame([Row(vec_id=1, embedding=[1.0] * 64)])
    b_ok = spark.createDataFrame([Row(vec_id=2, embedding=[1.0] * 64)])
    b_bad = spark.createDataFrame([Row(vec_id=3, embedding=[1.0] * 128)])
    assert contaminated_embeddings(c, b_ok, threshold=0.5, dim=64).count() == 1
    for kw in ({}, {"bits": 0}):
        with pytest.raises(Exception, match="vector dim"):
            contaminated_embeddings(c, b_bad, threshold=0.5, **kw).count()
    vec_schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    c_null = spark.createDataFrame([(4, None)], vec_schema)
    assert contaminated_embeddings(c_null, b_ok, threshold=0.5).count() == 0


def test_contaminated_embeddings_exact_superset_of_banded(spark):
    from platypus_ingestion_plugins_spark.operators.decontam import (
        contaminated_embeddings,
    )

    corpus = spark.createDataFrame(
        [
            Row(vec_id=10, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=11, embedding=[0.0, 1.0, 0.0]),
            Row(vec_id=12, embedding=[-1.0, 0.0, 0.1]),
        ]
    )
    bench = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.999, 0.01, 0.0])]
    )
    exact = {
        r.vec_id: r.n_contaminated
        for r in contaminated_embeddings(
            corpus, bench, threshold=0.9, bits=0
        ).collect()
    }
    assert exact == {10: 1}
    # the banded screen can only MISS, never invent, contamination
    banded = {
        r.vec_id
        for r in contaminated_embeddings(
            corpus, bench, threshold=0.9, bits=2, bands=1
        ).collect()
    }
    assert banded <= set(exact)


def test_select_token_budget_all_paths_match_brute_force(spark):
    """NEW r11: budget-capped selection. The per-group window path and
    BOTH global two-phase bucketed paths (hash order / priority order)
    must reproduce the brute-force prefix exactly — the bucketing is
    an execution detail, never a semantics change."""
    import hashlib

    from platypus_ingestion_plugins_spark.functions.sampling import (
        select_token_budget,
        unit_hash,
    )

    rows = [
        Row(doc_id=i, grp=f"g{i % 3}", toks=(i * 37) % 90 + 10,
            score=float((i * 53) % 100))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)

    # brute-force reference: the PREFIX fitting the budget (cumsum is
    # monotone, so the first crossing row ends the selection — greedy
    # skip-and-continue would be a knapsack, a different contract)
    def brute(rs, order_key, budget):
        out, spent = [], 0
        for r in sorted(rs, key=order_key):
            if spent + r.toks > budget:
                break
            out.append(r.doc_id)
            spent += r.toks
        return sorted(out)

    # 1. per-group, priority order
    got = select_token_budget(
        df, "doc_id", "toks", 500, by="grp", priority_col="score"
    )
    for g in ("g0", "g1", "g2"):
        want = brute(
            [r for r in rows if r.grp == g], lambda r: (-r.score, r.doc_id), 500
        )
        assert sorted(r.doc_id for r in got.collect() if r.grp == g) == want
    # 2. global, priority order (two-phase quantile buckets; tiny
    # bucket count stresses the cut-bucket fine path)
    got2 = sorted(
        r.doc_id
        for r in select_token_budget(
            df, "doc_id", "toks", 2000, priority_col="score", buckets=4
        ).collect()
    )
    assert got2 == brute(rows, lambda r: (-r.score, r.doc_id), 2000)
    # 3. global, hash order — emulate with the engine's own u values
    u = {
        r.doc_id: r.u
        for r in df.select("doc_id", unit_hash("doc_id", "budget").alias("u")).collect()
    }
    got3 = sorted(
        r.doc_id
        for r in select_token_budget(
            df, "doc_id", "toks", 2000, buckets=8
        ).collect()
    )
    assert got3 == brute(rows, lambda r: (u[r.doc_id], r.doc_id), 2000)
    # hard cap: never exceeds the budget
    tot = sum(r.toks for r in rows if r.doc_id in set(got2))
    assert tot <= 2000
    # degenerate: budget smaller than every row -> empty
    assert select_token_budget(df, "doc_id", "toks", 5).count() == 0


def test_mask_repeated_spans_exact_substring_dedup(spark):
    """NEW r11: ExactSubstr dedup (Lee et al. 2022) via hot k-gram
    window coverage. A k-token span shared by two docs is masked in
    BOTH (occurrence-count criterion); within-doc repeats are masked;
    docs shorter than k pass through verbatim (whitespace-normalized);
    a fully duplicated doc collapses to the empty string."""
    k = 4
    shared = "alpha beta gamma delta"  # the duplicated 4-token span
    rows = [
        Row(doc_id=1, text=f"one two three {shared} four five six"),
        Row(doc_id=2, text=f"seven eight {shared} nine ten eleven"),
        Row(doc_id=3, text="unique words only in this document here"),
        Row(doc_id=4, text="tiny doc"),  # < k tokens: untouched
        Row(doc_id=5, text=shared),  # exactly the hot span: empty out
        Row(doc_id=6, text=f"{shared} {shared}"),  # within-doc repeat
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r.text_deduped
        for r in dedup.mask_repeated_spans(df, "text", "doc_id", k=k).collect()
    }
    assert out[1] == "one two three four five six"
    assert out[2] == "seven eight nine ten eleven"
    assert out[3] == "unique words only in this document here"
    assert out[4] == "tiny doc"
    assert out[5] == ""
    assert out[6] == ""
    # min_count above the occurrence count disables masking
    out2 = {
        r.doc_id: r.text_deduped
        for r in dedup.mask_repeated_spans(
            df, "text", "doc_id", k=k, min_count=9
        ).collect()
    }
    assert out2[1] == f"one two three {shared} four five six"
    # overlapping hot windows merge into one maximal masked region:
    # doc A repeats a 6-token span of doc B -> all 6 tokens go, and
    # the doc's OTHER tokens survive
    span6 = "p q r s t u"
    df2 = spark.createDataFrame(
        [Row(doc_id=10, text=f"x y {span6} z w"),
         Row(doc_id=11, text=f"m n {span6} o v")]
    )
    out3 = {
        r.doc_id: r.text_deduped
        for r in dedup.mask_repeated_spans(df2, "text", "doc_id", k=4).collect()
    }
    assert out3[10] == "x y z w" and out3[11] == "m n o v"


def test_mask_repeated_spans_incremental_first_keeps_union(spark):
    """Streaming ExactSubstr: union of per-batch outputs over the
    accumulated span-count index == the one-shot FIRST-KEEPS
    computation (distinct smaller-id docs containing the window),
    regardless of where the batch boundary falls."""
    k = 4
    shared = "alpha beta gamma delta"
    rows = [
        Row(doc_id=1, text=f"one two three {shared} four five"),  # first: keeps
        Row(doc_id=2, text=f"six seven {shared} eight nine"),     # masks
        Row(doc_id=3, text="totally unique words right here now"),
        Row(doc_id=4, text=f"ten eleven {shared} twelve thirteen"),  # masks
        Row(doc_id=5, text="tiny"),
    ]
    df = spark.createDataFrame(rows)

    def one_shot_first_keeps():
        # brute force: doc masks window iff >= 1 smaller-id doc has it
        import re as _re

        toks = {r.doc_id: _re.split(r"\s+", r.text.strip()) for r in rows}
        grams = {
            d: [
                (i, " ".join(t[i : i + k]))
                for i in range(len(t) - k + 1)
            ]
            for d, t in toks.items()
            if len(t) >= k
        }
        out = {}
        for d, t in toks.items():
            if len(t) < k:
                out[d] = " ".join(t)
                continue
            covered = set()
            for i, g in grams[d]:
                earlier = sum(
                    1
                    for d2, gs in grams.items()
                    if d2 < d and any(g2 == g for _, g2 in gs)
                )
                if earlier >= 1:
                    covered.update(range(i, i + k))
            out[d] = " ".join(
                tok for j, tok in enumerate(t) if j not in covered
            )
        return out

    want = one_shot_first_keeps()

    for split_at in (2, 3, 4):
        batches = [
            [r for r in rows if r.doc_id <= split_at],
            [r for r in rows if r.doc_id > split_at],
        ]
        counts = None
        got = {}
        for b in batches:
            bdf = spark.createDataFrame(b)
            starts = dedup.span_start_keys(bdf, "text", "doc_id", k=k)
            res = dedup.mask_repeated_spans_incremental(
                bdf, counts, "text", "doc_id", k=k, starts=starts
            )
            got.update({r.doc_id: r.text_deduped for r in res.collect()})
            newc = dedup.span_count_keys(starts, "doc_id")
            counts = (
                newc
                if counts is None
                else counts.unionByName(newc)
                .groupBy("line_key")
                .agg(F.sum("n").alias("n"))
            )
        assert got == want, (split_at, got, want)
    # first-keeps visible: doc 1 kept its copy, later docs scrubbed
    assert shared in want[1] and shared not in want[2] and shared not in want[4]


def test_weighted_sample_wor_matches_brute_force(spark):
    """NEW r11: Efraimidis-Spirakis weighted sampling without
    replacement. Selection must equal the brute-force top-n by
    u**(1/w) computed from the engine's own deterministic u values;
    non-positive / NULL weights are excluded; the by= path applies
    the same rule per group."""
    from platypus_ingestion_plugins_spark.functions.sampling import (
        unit_hash,
        weighted_sample_wor,
    )

    rows = [
        Row(doc_id=i, grp=f"g{i % 2}",
            w=[0.5, 2.0, 8.0, 0.0, None][i % 5])
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id int, grp string, w double")
    u = {
        r.doc_id: r.u
        for r in df.select(
            "doc_id", unit_hash("doc_id", "wsample").alias("u")
        ).collect()
    }

    def brute(rs, n):
        # 6-dp rounding BEFORE ranking mirrors the operator (and its
        # oracle): raw pow differs by ulps across libm builds, so the
        # rank-n boundary must compare rounded values (r11 review #5)
        elig = [r for r in rs if r.w is not None and r.w > 0]
        elig.sort(
            key=lambda r: (-round(u[r.doc_id] ** (1.0 / r.w), 6), r.doc_id)
        )
        return sorted(r.doc_id for r in elig[:n])

    got = sorted(
        r.doc_id for r in weighted_sample_wor(df, "doc_id", "w", 10).collect()
    )
    assert got == brute(rows, 10)
    gotg = weighted_sample_wor(df, "doc_id", "w", 7, by="grp").collect()
    for g in ("g0", "g1"):
        assert sorted(r.doc_id for r in gotg if r.grp == g) == brute(
            [r for r in rows if r.grp == g], 7
        )
    # weight tilts selection: the high-weight stratum (w=8) should be
    # overrepresented relative to its 1/3 share of eligible rows
    n8 = sum(1 for i in got if rows[i].w == 8.0)
    assert n8 >= 5


def test_line_dedup_by_scopes_df_to_group(spark):
    """NEW r11: by= scopes the boilerplate doc-frequency count to a
    group — a nav line hot on source A is scrubbed there, while the
    IDENTICAL line appearing once on source B survives; by=None (the
    corpus-wide scrub) drops all copies."""
    rows = [
        Row(doc_id=1, src="a", text="nav menu\nreal content one"),
        Row(doc_id=2, src="a", text="nav menu\nreal content two"),
        Row(doc_id=3, src="b", text="nav menu\nother site text"),
    ]
    df = spark.createDataFrame(rows)
    scoped = {
        r.doc_id: r.text
        for r in dedup.line_dedup(df, "text", "doc_id", by="src").collect()
    }
    assert scoped[1] == "real content one"
    assert scoped[2] == "real content two"
    assert scoped[3] == "nav menu\nother site text"  # df=1 within b
    global_ = {
        r.doc_id: r.text
        for r in dedup.line_dedup(df, "text", "doc_id").collect()
    }
    assert global_[3] == "other site text"  # corpus-wide df=3


def test_line_dedup_by_null_group_is_scrubbed(spark):
    """r11 review #3: docs whose group column is NULL (missing-domain
    crawl rows) form their OWN dedup scope — boilerplate hot among
    them is scrubbed, not silently exempted by a null-unsafe hot
    join; a line appearing once in the NULL group still survives."""
    rows = [
        Row(doc_id=1, src=None, text="cookie banner\nnull doc one"),
        Row(doc_id=2, src=None, text="cookie banner\nnull doc two"),
        Row(doc_id=3, src=None, text="lone line\nnull doc three"),
        Row(doc_id=4, src="a", text="cookie banner\nsite a text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, src string, text string")
    out = {
        r.doc_id: r
        for r in dedup.line_dedup(df, "text", "doc_id", by="src").collect()
    }
    assert out[1].text == "null doc one" and out[1].n_dropped == 1
    assert out[2].text == "null doc two" and out[2].n_dropped == 1
    assert out[3].text == "lone line\nnull doc three"  # df=1 in NULL grp
    assert out[4].text == "cookie banner\nsite a text"  # df=1 within a


def test_perplexity_buckets_ccnet_partition(spark):
    """NEW r11: CCNet head/middle/tail. Buckets must equal the brute
    percent_rank partition over (rounded mean_logp DESC, id) within
    each language; zero-token docs yield no row; head really is the
    more-fluent slice (repeated common tokens score above rare-token
    gibberish under the corpus LM)."""
    from platypus_ingestion_plugins_spark.functions.lm import perplexity_buckets

    rows = []
    for i in range(12):
        # fluent: common-token text; gibberish: unique rare tokens
        rows.append(Row(doc_id=i, lang="en",
                        text="the cat sat on the mat " * 3
                        if i < 6 else f"zzq{i}x wvu{i}j qqj{i}k"))
    for i in range(12, 18):
        rows.append(Row(doc_id=i, lang="de",
                        text="der hund lief im park " * 2
                        if i < 15 else f"xxo{i}p yyr{i}m"))
    rows.append(Row(doc_id=99, lang="en", text="   "))  # zero tokens
    df = spark.createDataFrame(rows)
    out = perplexity_buckets(df, "text", "doc_id", by="lang", vocab_size=64)
    got = {r.doc_id: (r.lang, r.mean_logp, r.bucket) for r in out.collect()}
    assert 99 not in got
    # brute replication per language
    import collections

    by_lang = collections.defaultdict(list)
    for d, (lang, mlp, _) in got.items():
        by_lang[lang].append((d, mlp))
    for lang, pairs in by_lang.items():
        pairs.sort(key=lambda p: (-p[1], p[0]))
        n = len(pairs)
        for rank, (d, _) in enumerate(pairs):
            pr = rank / (n - 1) if n > 1 else 0.0
            want = "head" if pr < 1 / 3 else ("middle" if pr < 2 / 3 else "tail")
            assert got[d][2] == want, (lang, d)
    # fluency ordering: heads are drawn exclusively from the fluent
    # docs (the six tie on score; id-order tie-break fills the top
    # third — 4 of 12 — from them), gibberish never reaches head
    en_heads = {i for i in range(0, 12) if got[i][2] == "head"}
    assert en_heads == {0, 1, 2, 3}
    assert all(got[i][2] in ("middle", "tail") for i in range(6, 12))


def test_dsir_matches_python_reference(spark):
    """NEW r11: DSIR importance resampling. The full pipeline —
    md5-hashed unigram+bigram features, add-k smoothed target/raw
    distributions, log-ratio weights, deterministic-Gumbel top-n — is
    replayed in pure Python from the same md5 arithmetic; the Spark
    selection must reproduce the reference's exact ids and (to 5dp)
    weights, and target-like docs must outweigh off-target ones."""
    import hashlib
    import math
    import re

    from platypus_ingestion_plugins_spark.operators.dsir import (
        dsir_select,
        dsir_weights,
    )

    def toks(s):
        return [t for t in re.split(r"\W+", s.lower()) if t]

    def grams(s):
        t = toks(s)
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    B, S = 64, 1.0

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % B

    # on-target docs share the target's PHRASING (DSIR features are
    # unigrams AND bigrams — same words in a different order share few
    # bigrams and can score below shorter off-target docs)
    raw_rows = [
        Row(doc_id=i,
            text=("spark executor shuffle memory partition tuning"
                  if i % 3 == 0 else "cooking pasta with tomato sauce basil"))
        for i in range(30)
    ]
    target_rows = [
        Row(doc_id=100 + i, text="spark executor shuffle memory partition tuning")
        for i in range(4)
    ]
    raw = spark.createDataFrame(raw_rows)
    target = spark.createDataFrame(target_rows)

    # python reference
    def counts(rows):
        c = {}
        for r in rows:
            for g in grams(r.text):
                b = bucket(g)
                c[b] = c.get(b, 0) + 1
        return c

    tc, rc = counts(target_rows), counts(raw_rows)
    t_tot, r_tot = sum(tc.values()), sum(rc.values())
    logr = {
        b: (math.log(tc.get(b, 0) + S) - math.log(t_tot + S * B)
            - math.log(rc.get(b, 0) + S) + math.log(r_tot + S * B))
        for b in set(tc) | set(rc)
    }
    ref_w = {
        r.doc_id: sum(logr[bucket(g)] for g in grams(r.text))
        for r in raw_rows
    }

    got_w = {
        r.doc_id: r.logw
        for r in dsir_weights(raw, target, buckets=B, smoothing=S).collect()
    }
    assert set(got_w) == set(ref_w)
    for d, w in ref_w.items():
        assert abs(got_w[d] - w) < 1e-5, d
    # on-target docs outweigh off-target ones
    on = min(w for d, w in ref_w.items() if d % 3 == 0)
    off = max(w for d, w in ref_w.items() if d % 3 != 0)
    assert on > off

    # gumbel top-n selection matches the same arithmetic
    def uhash(d):
        h = hashlib.md5(f"dsir|{d}".encode()).hexdigest()[:15]
        return int(h, 16) / float(16 ** 15)

    scored = sorted(
        ((ref_w[d] - math.log(-math.log(max(uhash(d), 1e-12)))), -d, d)
        for d in ref_w
    )
    want = sorted(d for _, _, d in scored[-8:])
    got = sorted(
        r.doc_id for r in dsir_select(raw, target, 8, buckets=B).collect()
    )
    assert got == want


def test_gopher_quality_flags_rules(spark):
    """NEW r11: the Gopher rule set. Hand-constructed docs trip each
    rule in isolation; a long fluent doc passes all seven."""
    good_words = ("the quick brown fox and the lazy dog that have been "
                  "with us for years of steady calm text ") * 5  # 100 words
    rows = [
        Row(doc_id=0, text=good_words),
        Row(doc_id=1, text="short text only"),                      # word_count
        Row(doc_id=2, text="a " * 120),                             # mean_word_len (1.0)
        Row(doc_id=3, text=("the of and " * 20) + "# " * 30),       # symbol_ratio
        Row(doc_id=4, text="\n".join("- item %d the of" % i for i in range(20))),  # bullet
        Row(doc_id=5, text="\n".join("the of and so on..." for _ in range(10))),   # ellipsis
        Row(doc_id=6, text=("the of " + "123 456 789 " * 30)),      # alpha_words
        Row(doc_id=7, text="zebra quartz " * 40),                   # stopwords
        Row(doc_id=8, text=""),
    ]
    df = spark.createDataFrame(rows)
    got = {r.doc_id: r.asDict() for r in
           TX.gopher_quality_flags(df, "text", "doc_id").collect()}
    assert got[0]["gopher_pass"] is True
    assert got[1]["r_word_count"] is False
    assert got[2]["r_mean_word_len"] is False
    assert got[3]["r_symbol_ratio"] is False
    assert got[4]["r_bullet_lines"] is False
    assert got[5]["r_ellipsis_lines"] is False
    assert got[6]["r_alpha_words"] is False
    assert got[7]["r_stopwords"] is False
    assert got[8]["r_word_count"] is False and got[8]["gopher_pass"] is False
    for d in range(1, 9):
        assert got[d]["gopher_pass"] is False


def test_c4_line_filter_rules(spark):
    """NEW r11: the C4 rule set (Raffel et al. 2020 §2.2). Line
    retention: terminal punctuation, >=5 words, no "javascript";
    page flags evaluated on ORIGINAL text: >=3 sentences in kept
    text, no "lorem ipsum", no brace, no bad words."""
    fluent = ("This is a perfectly normal sentence one. "
              "Here is another fine sentence two! "
              "And a third one with plenty of words?")
    rows = [
        Row(doc_id=0, text=fluent),
        # line-level drops: no terminal punct / short / javascript
        Row(doc_id=1, text="no terminal punctuation on this line\n"
                           "Short line here.\n"
                           "Please enable javascript to continue reading.\n"
                           + fluent),
        Row(doc_id=2, text="Only two sentences live here today. "
                           "And this is the second one!"),   # min_sentences
        Row(doc_id=3, text=fluent + "\nLorem Ipsum dolor sit amet today."),
        Row(doc_id=4, text=fluent + "\nfunction f() { return 1; } and more."),
        Row(doc_id=5, text=fluent + "\nThis page contains a banned token badword."),
        Row(doc_id=6, text=None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r.asDict() for r in TX.c4_line_filter(
        df, "text", "doc_id", bad_words=("badword",)).collect()}
    assert got[0]["c4_pass"] is True and got[0]["n_kept"] == 1
    # doc 1: all three offending lines drop (no terminal punct;
    # 3 words < 5; "javascript"), only the fluent line stays
    assert got[1]["n_lines"] == 4 and got[1]["n_kept"] == 1
    assert "javascript" not in got[1]["text"]
    assert "no terminal" not in got[1]["text"]
    assert "Short line here." not in got[1]["text"]
    assert got[1]["text"] == fluent
    assert got[2]["c4_min_sentences"] is False and got[2]["c4_pass"] is False
    assert got[3]["c4_no_lorem"] is False
    assert got[4]["c4_no_brace"] is False
    assert got[5]["c4_no_badwords"] is False
    assert got[6]["n_kept"] == 0 and got[6]["c4_pass"] is False


def test_bigram_logprob_matches_brute_force(spark):
    """NEW r11: interpolated bigram LM scoring. Per-doc mean must
    equal the pure-Python replay of the same train+score arithmetic
    (bigram MLE over full-unigram denominators, lam-interpolated with
    the add-alpha unigram), to float tolerance."""
    import collections

    from platypus_ingestion_plugins_spark.functions.lm import (
        bigram_model,
        doc_bigram_logprob,
        unigram_model,
    )

    rows = [
        Row(doc_id=1, text="the cat sat on the mat"),
        Row(doc_id=2, text="the cat ate the fish"),
        Row(doc_id=3, text="dogs chase the cat"),
        Row(doc_id=4, text="one"),          # single token: no bigrams
        Row(doc_id=5, text=""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    model, totals = unigram_model(df, "text", vocab_size=4)  # force OOV
    bgm = bigram_model(df, "text")
    got = {r.doc_id: (r.mean_logp2, r.n_bigrams) for r in
           doc_bigram_logprob(df, bgm, model, totals, "text", "doc_id",
                              lam=0.75, alpha=0.5).collect()}
    assert set(got) == {1, 2, 3}  # docs 4,5 have no bigram positions

    toks = {r.doc_id: r.text.lower().split() for r in rows if r.text}
    uni = collections.Counter(t for ts in toks.values() for t in ts)
    total = sum(uni.values())
    vocab = dict(sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:4])
    big = collections.Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1))
    for d in (1, 2, 3):
        ts = toks[d]
        lps = []
        for i in range(len(ts) - 1):
            w1, w2 = ts[i], ts[i + 1]
            p_big = big.get((w1, w2), 0) / uni[w1] if (w1, w2) in big else 0.0
            p_uni = (vocab[w2] / total) if w2 in vocab else (0.5 / total)
            lps.append(math.log(0.75 * p_big + 0.25 * p_uni))
        want = sum(lps) / len(lps)
        assert abs(got[d][0] - want) < 1e-9, (d, got[d][0], want)
        assert got[d][1] == len(ts) - 1


def test_stratified_interleave_even_spread(spark):
    """NEW r11: the rank-midpoint interleave. Exact lattice per group
    ((2r-1)/2n), partitioning invariance, and the prefix property:
    any prefix of the sorted order holds each group within 1 of its
    proportional share."""
    from platypus_ingestion_plugins_spark.functions.sampling import (
        stratified_interleave,
    )

    rows = [Row(k=i, g="big") for i in range(80)] + [
        Row(k=100 + i, g="small") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k int, g string")
    out = stratified_interleave(df, "k", "g").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append((r.interleave_num, r.interleave_den))
    for g, n in (("big", 80), ("small", 20)):
        assert sorted(x[0] for x in by_g[g]) == list(range(1, 2 * n, 2))
        assert {x[1] for x in by_g[g]} == {2 * n}
    # prefix proportionality on the consumer sort order
    ordered = sorted(out, key=lambda r: (r.interleave_pos, r.g, r.k))
    for cut in (10, 25, 50, 75, 100):
        counts = {}
        for r in ordered[:cut]:
            counts[r.g] = counts.get(r.g, 0) + 1
        assert abs(counts.get("big", 0) - 0.8 * cut) <= 1, cut
        assert abs(counts.get("small", 0) - 0.2 * cut) <= 1, cut
    # rerun over a different partitioning -> identical assignment
    out2 = stratified_interleave(df.repartition(13), "k", "g").collect()
    assert {(r.k, r.interleave_num) for r in out2} == {
        (r.k, r.interleave_num) for r in out
    }


def test_normalize_url_canonicalization(spark):
    """NEW r11: URL canonicalization for crawl dedup. Scheme/host
    case, www, default ports, fragments, tracking params and param
    order must all collapse; distinct resources must NOT; non-URLs
    pass through untouched."""
    rows = [
        Row(i=1, u="https://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag"),
        Row(i=2, u="https://example.com/a/b?a=1&b=2"),
        Row(i=3, u="http://Example.com:80/a/b?b=2&a=1&fbclid=zzz"),
        Row(i=4, u="https://example.com/a/b?a=1&b=3"),     # different query
        Row(i=5, u="https://example.com/a/c?a=1&b=2"),     # different path
        Row(i=6, u="not a url at all"),
        Row(i=7, u="ftp://example.com/a"),                 # non-http: verbatim
        Row(i=8, u="https://example.com:8443/a"),          # non-default port kept
    ]
    df = spark.createDataFrame(rows)
    got = {r.i: r.n for r in df.select(
        "i", TX.normalize_url("u").alias("n")).collect()}
    assert got[1] == "https://example.com/a/b?a=1&b=2"
    assert got[2] == "https://example.com/a/b?a=1&b=2"
    # http vs https stay distinct resources, but 3's own junk collapses
    assert got[3] == "http://example.com/a/b?a=1&b=2"
    assert got[4] == "https://example.com/a/b?a=1&b=3"
    assert got[5] == "https://example.com/a/c?a=1&b=2"
    assert got[6] == "not a url at all"
    assert got[7] == "ftp://example.com/a"
    assert got[8] == "https://example.com:8443/a"


def test_line_dedup_paragraph_unit(spark):
    """NEW r11: sep="\\n\\n" scrubs PARAGRAPHS (RefinedWeb-style exact
    paragraph dedup) — a multi-line paragraph duplicated across docs
    drops whole, while its individual lines never count as units."""
    shared = "Shared promo paragraph line one\nand its second line"
    rows = [
        Row(doc_id=1, text=f"unique one\nstill doc one\n\n{shared}"),
        Row(doc_id=2, text=f"{shared}\n\nunique two"),
        Row(doc_id=3, text="unique three\n\nalso unique"),
    ]
    df = spark.createDataFrame(rows)
    got = {r.doc_id: r for r in dedup.line_dedup(
        df, "text", "doc_id", min_df=2, sep="\n\n").collect()}
    assert got[1].text == "unique one\nstill doc one" and got[1].n_dropped == 1
    assert got[2].text == "unique two" and got[2].n_dropped == 1
    assert got[3].text == "unique three\n\nalso unique"
    assert got[3].n_lines == 2 and got[3].n_dropped == 0
    # line-unit default on the same corpus does NOT drop the paragraph
    # (its two lines each have df=2 though — so they DO drop at \n):
    line_out = {r.doc_id: r.text for r in dedup.line_dedup(
        df, "text", "doc_id", min_df=2).collect()}
    assert "Shared promo" not in line_out[1]


def test_train_logreg_matches_brute_force(spark):
    """NEW r11: in-engine logistic-regression training. Two full-batch
    iterations (9-dp-rounded gradients — the cross-engine determinism
    convention) must match a pure-Python replay of the same hashed
    features and arithmetic; the trained scorer must separate the two
    label populations."""
    import hashlib

    from platypus_ingestion_plugins_spark.functions.classifier import (
        doc_features,
        score_logreg,
        train_logreg,
    )

    rows = [
        Row(doc_id=i,
            text=("the quick brown fox and the calm clear text " * 3
                  if i % 2 == 0 else
                  "zxq qqz kjv wvx bbn mmq zzl pqx " * 3),
            y=1 if i % 2 == 0 else 0)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, y int")
    DIM, LR, IT = 64, 1.0, 2
    feats = doc_features(df, "text", "doc_id", dim=DIM)
    w = dict(train_logreg(feats, df, "doc_id", "y", iters=IT, lr=LR))

    # pure-Python replay
    def grams(t):
        ts = [x for x in __import__("re").split(r"\W+", t.lower()) if x]
        return ts + [f"{a} {b}" for a, b in zip(ts, ts[1:])]

    def bk(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DIM

    fv, yv = {}, {}
    for r in rows:
        gs = [bk(g) for g in grams(r.text)]
        d = {}
        for b in gs:
            d[b] = d.get(b, 0) + 1
        fv[r.doc_id] = {b: c / len(gs) for b, c in d.items()}
        yv[r.doc_id] = float(r.y)
    N = len(fv)
    ww = {}
    for it in range(IT):
        if ww:
            err = {}
            for i, f in fv.items():
                m = sum(v * ww.get(b, 0.0) for b, v in f.items())
                err[i] = 1.0 / (1.0 + math.exp(-m)) - yv[i]
        else:
            err = {i: 0.5 - yv[i] for i in fv}
        gr = {}
        for i, f in fv.items():
            for b, v in f.items():
                gr[b] = gr.get(b, 0.0) + v * err[i]
        for b, g in gr.items():
            ww[b] = ww.get(b, 0.0) - LR * round(g / N, 9)
    assert set(w) == set(ww)
    for b in ww:
        assert abs(w[b] - ww[b]) < 1e-9, (b, w[b], ww[b])

    scored = {r.doc_id: r.score for r in
              score_logreg(feats, sorted(w.items()), "doc_id").collect()}
    good = [scored[i] for i in range(20) if i % 2 == 0]
    bad = [scored[i] for i in range(20) if i % 2 == 1]
    assert min(good) > max(bad)


def test_corpus_profile_datasheet(spark):
    """NEW r11: dataset-card profile. Counts/sums/percentiles/dup
    ratio must equal the brute-force numbers per slice; NULL text
    counts as length 0."""
    from platypus_ingestion_plugins_spark.operators.profile import (
        corpus_profile,
    )

    rows = [
        Row(doc_id=1, src="a", text="one two three"),
        Row(doc_id=2, src="a", text="one two three"),     # exact dup
        Row(doc_id=3, src="a", text="four"),
        Row(doc_id=4, src="b", text=None),
        Row(doc_id=5, src="b", text="five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, src string, text string")
    got = {r.src: r for r in corpus_profile(df, "text", by="src").collect()}
    a = got["a"]
    assert (a.n_docs, a.n_tokens, a.n_chars) == (3, 7, 30)
    assert a.n_distinct_texts == 2 and abs(a.dup_ratio - 1 / 3) < 1e-6
    lens = sorted([13, 13, 4])
    assert a.chars_p50 == lens[1]
    b = got["b"]
    assert (b.n_docs, b.n_tokens, b.n_chars) == (2, 2, 8)
    assert b.n_distinct_texts == 2 and b.dup_ratio == 0.0
    overall = corpus_profile(df, "text").collect()
    assert len(overall) == 1 and overall[0].n_docs == 5


def test_bpe_learn_and_encode_sennrich_example(spark):
    """NEW r11: BPE. The classic low/lower/newest/widest corpus must
    learn the Sennrich et al. 2016 merges ('es' then 'est' first);
    encoding must split unseen words at learned boundaries and the
    distributed encode must equal the driver-side one."""
    from platypus_ingestion_plugins_spark.functions.bpe import (
        bpe_encode,
        encode_word,
        learn_bpe,
    )

    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges = learn_bpe([" ".join(corpus)], n_merges=10)
    # the 9-count pairs (t,</w>), (s,t</w>-chain), (e,s...) tie in
    # round 1; the fixed lexicographic rule resolves t</w> first and
    # the est</w> unit still emerges by round 3 — same subword, fixed
    # deterministic order
    assert merges[0] == ("t", "</w>")
    assert ("e", "st</w>") in merges[:3]
    assert ("l", "ow") in merges  # the low unit from low/lower
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # 'lowest' was never seen whole; it must split at the two learned
    # units exactly
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    # distributed apply == driver apply, counts included
    rows = [Row(doc_id=i, text=t) for i, t in
            enumerate(["low lower", "newest widest lowest", ""])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (list(r.tokens), r.n_bpe_tokens)
           for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    from platypus_ingestion_plugins_spark.functions.bpe import pretokenize
    for r in rows:
        want = []
        for w in pretokenize(r.text):
            want.extend(encode_word(w, ranks))
        assert got[r.doc_id] == (want, len(want)), r.doc_id
    assert got[2] == ([], 0)


def test_funnel_greedy_order(spark):
    """NEW r13: funnel. Greedy in-order semantics: a user counts for
    step i only with a step-i event at-or-after their greedy step-i-1
    time; out-of-order completions don't count; ties (equal ts) do;
    the one-pass array fold must equal the staged-aggregation
    definition the oracle uses."""
    import datetime as dt

    from platypus_ingestion_plugins_spark.operators.analytics import funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1 completes all three in order
        (1, t(0), "view"), (1, t(5), "click"), (1, t(9), "buy"),
        # u2: click BEFORE view -> stalls at view
        (2, t(5), "click"), (2, t(9), "view"),
        # u3: view+click, no buy
        (3, t(0), "view"), (3, t(1), "click"),
        # u4: buy only -> counts nowhere
        (4, t(0), "buy"),
        # u5: simultaneous view/click (tie counts), buy earlier same ts
        (5, t(3), "view"), (5, t(3), "click"), (5, t(3), "buy"),
        # u6: greedy trap — early click is unusable, later one works
        (6, t(2), "view"), (6, t(1), "click"), (6, t(4), "click"),
        (6, t(5), "buy"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, et string")
    got = {
        r["step"]: (r["step_idx"], r["n_users"], r["pct_of_first"])
        for r in funnel(df, "user_id", "ts", "et", ["view", "click", "buy"]).collect()
    }
    assert got == {
        "view": (1, 5, 1.0),
        "click": (2, 4, 0.8),
        "buy": (3, 3, 0.6),
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="distinct"):
        funnel(df, "user_id", "ts", "et", ["view", "view"])
    with _pytest.raises(ValueError, match="unsupported step"):
        funnel(df, "user_id", "ts", "et", ["view", "it's"])
    with _pytest.raises(ValueError, match="unsupported step"):
        funnel(df, "user_id", "ts", "et", ["u", "view"])
    # conversion deadline: with within=240s, u1's click at +5min is
    # out of window (stalls at view), u5's same-ts chain still counts,
    # u6's usable click at +2min and buy at +1min stay in window
    timed = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "ts", "et", ["view", "click", "buy"], within=240
        ).collect()
    }
    assert timed == {"view": 5, "click": 3, "buy": 2}
    # the deadline is inclusive: exactly `within` seconds still counts
    edge = spark.createDataFrame(
        [(9, t(0), "view"), (9, t(4), "click")],
        "user_id long, ts timestamp_ntz, et string",
    )
    got9 = {
        r["step"]: r["n_users"]
        for r in funnel(
            edge, "user_id", "ts", "et", ["view", "click"], within=240
        ).collect()
    }
    assert got9 == {"view": 1, "click": 1}
    with _pytest.raises(ValueError, match="within"):
        funnel(df, "user_id", "ts", "et", ["view", "click"], within=0)
    with _pytest.raises(ValueError, match="mode"):
        funnel(df, "user_id", "ts", "et", ["view", "click"], mode="nope")
    # cascade mode: identical results on every scenario above
    for w in (None, 240):
        a = {
            r["step"]: (r["n_users"], r["pct_of_first"])
            for r in funnel(
                df, "user_id", "ts", "et", ["view", "click", "buy"],
                within=w,
            ).collect()
        }
        c = {
            r["step"]: (r["n_users"], r["pct_of_first"])
            for r in funnel(
                df, "user_id", "ts", "et", ["view", "click", "buy"],
                within=w, mode="cascade",
            ).collect()
        }
        assert a == c, w


def test_funnel_numeric_ts_and_dotted_steps(spark):
    """r14 (r13 advice #2/#3): funnel accepts epoch-second numeric ts
    columns with a `within` deadline (the contract funnel_stream
    already has), and step names containing dots resolve as pivot
    columns, not struct-field paths."""
    from platypus_ingestion_plugins_spark.operators.analytics import funnel

    rows = [
        (1, 0, "checkout.start"), (1, 100, "checkout.done"),
        (2, 0, "checkout.start"), (2, 500, "checkout.done"),  # too late
        (3, 50, "checkout.done"),  # out of order: stalls
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, et string")
    got = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "ts", "et",
            ["checkout.start", "checkout.done"], within=240,
        ).collect()
    }
    assert got == {"checkout.start": 2, "checkout.done": 1}
    casc = {
        r["step"]: r["n_users"]
        for r in funnel(
            df, "user_id", "ts", "et",
            ["checkout.start", "checkout.done"], within=240,
            mode="cascade",
        ).collect()
    }
    assert casc == got


def test_funnel_hot_user_skew(spark):
    """r14 (r13 verdict weak item): a bot user with ~1e5 step events
    (mostly duplicate timestamps) must not break either mode — array
    mode now collects DISTINCT timestamps (collect_set bounds the row
    by distinct ts, and greedy only takes mins), cascade mode never
    builds a per-user array at all. Both must agree with each other
    and with the obvious answer."""
    from pyspark.sql import functions as F

    from platypus_ingestion_plugins_spark.operators.analytics import funnel

    n = 100_000
    bot = spark.range(n).select(
        F.lit(0).alias("user_id"),
        # 1e5 events over only 1000 distinct timestamps: the dup-heavy
        # shape real bot traffic has
        (F.col("id") % 1000).alias("ts"),
        F.when(F.col("id") % 3 == 0, "view")
        .when(F.col("id") % 3 == 1, "click")
        .otherwise("buy")
        .alias("et"),
    )
    humans = spark.createDataFrame(
        [(1, 0, "view"), (1, 1, "click"), (2, 0, "view")],
        "user_id long, ts long, et string",
    ).select("user_id", F.col("ts").cast("long").alias("ts"), "et")
    df = bot.unionByName(humans)
    want = {"view": 3, "click": 2, "buy": 1}
    for mode in ("array", "cascade"):
        got = {
            r["step"]: r["n_users"]
            for r in funnel(
                df, "user_id", "ts", "et", ["view", "click", "buy"],
                mode=mode,
            ).collect()
        }
        assert got == want, mode


def test_build_preference_pairs(spark):
    """NEW r13: DPO pair prep. Best-vs-worst per prompt with total
    tie-breaks; single-completion prompts, all-tied prompts (margin
    0), and sub-margin pairs drop; NULL scores never rank."""
    from platypus_ingestion_plugins_spark.operators.chat import (
        build_preference_pairs,
    )

    rows = [
        ("p1", "good", 0.9, 1), ("p1", "bad", 0.1, 2), ("p1", "mid", 0.5, 3),
        ("p2", "only", 0.7, 4),                 # single completion: drop
        ("p3", "tie-a", 0.5, 5), ("p3", "tie-b", 0.5, 6),   # margin 0: drop
        ("p4", "close-hi", 0.52, 7), ("p4", "close-lo", 0.5, 8),
        ("p5", "x", None, 9), ("p5", "y", 0.3, 10),  # NULL never ranks
    ]
    df = spark.createDataFrame(
        rows, "prompt string, completion string, score double, cid long"
    )
    got = {
        r["prompt"]: r
        for r in build_preference_pairs(
            df, "prompt", "completion", "score", "cid"
        ).collect()
    }
    assert set(got) == {"p1", "p4"}
    p1 = got["p1"]
    assert (p1["chosen"], p1["rejected"], p1["margin"]) == ("good", "bad", 0.8)
    assert (p1["chosen_id"], p1["rejected_id"]) == (1, 2)
    # margin_min filters the close pair
    got2 = {
        r["prompt"]
        for r in build_preference_pairs(
            df, "prompt", "completion", "score", "cid", margin_min=0.1
        ).collect()
    }
    assert got2 == {"p1"}
    # deterministic tie-breaks: equal scores rank by id on both ends
    df3 = spark.createDataFrame(
        [("q", "a", 1.0, 2), ("q", "b", 1.0, 1), ("q", "c", 0.0, 3)],
        "prompt string, completion string, score double, cid long",
    )
    r3 = build_preference_pairs(df3, "prompt", "completion", "score", "cid").collect()[0]
    assert (r3["chosen"], r3["chosen_id"]) == ("b", 1)


def test_event_transitions_matrix(spark):
    """NEW r13: Markov transitions. Pair counts and per-from
    probabilities from a hand-built stream; tie-broken ordering via
    the order column; per-user boundaries never produce cross-user
    pairs; NULL ts rows carry nothing."""
    import datetime as dt

    from platypus_ingestion_plugins_spark.operators.analytics import (
        event_transitions,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, t(0), 1, "view"), (1, t(1), 2, "click"), (1, t(2), 3, "view"),
        (1, t(3), 4, "click"),
        (2, t(0), 5, "view"), (2, t(0), 6, "click"),  # tie: id order
        (3, t(9), 7, "buy"),                           # singleton: no pair
        (4, None, 8, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_id long, et string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(df, "user_id", "ts", "et", "event_id").collect()
    }
    # from view: ->click x3 (u1 twice, u2 tie-ordered once)
    # from click: ->view x1 ; totals: view->3, click->1
    assert got == {
        ("view", "click"): (3, 1.0),
        ("click", "view"): (1, 1.0),
    }


def test_ab_test_two_proportion(spark):
    """NEW r13: A/B readout. Rates and the pooled z-vs-rest must
    match a hand computation; NULL conversions count as
    not-converted; degenerate pooled rates yield NULL z."""
    import math

    from platypus_ingestion_plugins_spark.operators.analytics import ab_test

    rows = (
        [("a", True)] * 30 + [("a", False)] * 70
        + [("b", True)] * 45 + [("b", False)] * 55
        + [("b", None)] * 0
    )
    df = spark.createDataFrame(rows, "variant string, converted boolean")
    got = {r["variant"]: r for r in ab_test(df, "variant", "converted").collect()}

    def z(c1, n1, c2, n2):
        p1, p2, p = c1 / n1, c2 / n2, (c1 + c2) / (n1 + n2)
        return round((p1 - p2) / math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2)), 6)

    a, b = got["a"], got["b"]
    assert (a["n"], a["conversions"], a["rate"]) == (100, 30, 0.3)
    assert (b["n"], b["conversions"], b["rate"]) == (100, 45, 0.45)
    assert a["z_vs_rest"] == z(30, 100, 45, 100)
    assert b["z_vs_rest"] == z(45, 100, 30, 100)
    # NULL conversion = not converted
    df2 = spark.createDataFrame(
        [("a", True), ("a", None), ("b", False), ("b", True)],
        "variant string, converted boolean",
    )
    g2 = {r["variant"]: r for r in ab_test(df2, "variant", "converted").collect()}
    assert g2["a"]["conversions"] == 1 and g2["a"]["n"] == 2
    # degenerate pooled rate (all converted) -> NULL z
    df3 = spark.createDataFrame(
        [("a", True), ("b", True)], "variant string, converted boolean"
    )
    g3 = {r["variant"]: r["z_vs_rest"] for r in ab_test(df3, "variant", "converted").collect()}
    assert g3 == {"a": None, "b": None}


def test_cohort_retention_grid(spark):
    """NEW r13: cohort retention. First-seen period cohorts, distinct
    (user, period) activity, offset arithmetic per granularity,
    retention_pct anchored at offset 0."""
    import datetime as dt

    from platypus_ingestion_plugins_spark.operators.analytics import (
        cohort_retention,
    )

    d = lambda day, h=0: dt.datetime(2024, 1, day, h)  # noqa: E731
    rows = [
        # cohort Jan-1 (week of 2024-01-01): u1 active wk0, wk1; u2 wk0 only
        (1, d(1)), (1, d(2)), (1, d(8)),
        (2, d(3)),
        # cohort week of Jan-8: u3 wk0 and wk2
        (3, d(9)), (3, d(22)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz")
    got = {
        (str(r["cohort"]), r["offset"]): (r["n_users"], r["retention_pct"])
        for r in cohort_retention(df, "user_id", "ts", "week").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-08", 0): (1, 1.0),
        ("2024-01-08", 2): (1, 1.0),
    }
    # day granularity: u1's Jan-1 and Jan-2 are offsets 0 and 1
    day = {
        (str(r["cohort"]), r["offset"]): r["n_users"]
        for r in cohort_retention(df, "user_id", "ts", "day").collect()
    }
    assert day[("2024-01-01", 0)] == 1 and day[("2024-01-01", 1)] == 1
    assert day[("2024-01-01", 7)] == 1  # Jan-8 is day-offset 7


def test_leakage_free_split_cotravel(spark):
    """NEW r13: group-aware splits. Every member of a duplicate group
    gets the group's split (no cross-split leakage); singletons hash
    exactly like a plain hash_split on their own id; all rows keep
    exactly one split label."""
    from platypus_ingestion_plugins_spark.functions.sampling import (
        hash_split,
        leakage_free_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 41)], "doc_id long, text string"
    )
    groups = spark.createDataFrame(
        # two clusters: {1,2,3} -> 1, {10,11} -> 10
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, group_id long",
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: (r["group_id"], r["split"])
        for r in leakage_free_split(docs, "doc_id", groups, w).collect()
    }
    assert len(got) == 40
    assert got[1] == got[2] == got[3]          # cluster co-travels
    assert got[10] == got[11]
    # singletons: identical to hashing the bare id
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            docs.withColumn("_gkey", F.col("doc_id").cast("string")),
            "_gkey", w,
        ).collect()
    }
    for i in range(4, 10):
        assert got[i] == (i, plain[i]), i
    # cluster members hash by GROUP id: doc 2 and 3 get doc 1's split
    assert got[2][1] == plain[1] and got[3][1] == plain[1]
    assert got[11][1] == plain[10]
    # a pre-existing group_id column would make the coalesce ambiguous
    import pytest as _pytest

    with _pytest.raises(ValueError, match="group_id"):
        leakage_free_split(
            docs.withColumn("group_id", F.lit(0)), "doc_id", groups, w
        )


def test_chunk_text_tokens_matches_replay(spark):
    """NEW r13: token-budgeted chunking. Windows, overlap carry-over,
    the trailing-window suppression rule, detokenized text, empty-doc
    elision and the param guards must all match a pure-Python
    replay built from encode_word."""
    import pytest as _pytest

    from platypus_ingestion_plugins_spark.functions.bpe import (
        chunk_text_tokens,
        encode_word,
        learn_bpe,
        pretokenize,
    )

    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "tiny",
        3: "",
        4: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    merges = learn_bpe(list(texts.values()), 16)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )

    def replay(max_tokens, overlap):
        stride = max_tokens - overlap
        out = []
        for i, t in texts.items():
            toks = []
            for w in pretokenize(t):
                toks.extend(encode_word(w, ranks))
            n = len(toks)
            if n == 0:
                continue
            s = 1
            k = 0
            while s <= n and (s == 1 or s <= n - overlap):
                window = toks[s - 1 : s - 1 + max_tokens]
                text = "".join(window).replace("</w>", " ").rstrip()
                out.append((i, k, len(window), text))
                s += stride
                k += 1
            out_len = None  # noqa: F841
        return sorted(out)

    for mt, ov in [(6, 2), (4, 0), (100, 10), (1, 0)]:
        got = sorted(
            (r["doc_id"], r["chunk_id"], r["n_tokens"], r["chunk"])
            for r in chunk_text_tokens(
                df, "text", "doc_id", merges, mt, ov
            ).collect()
        )
        assert got == replay(mt, ov), (mt, ov)
    # overlap really carries context: consecutive chunks share tokens
    rows = chunk_text_tokens(df, "text", "doc_id", merges, 6, 2).collect()
    assert any(r["chunk_id"] >= 1 for r in rows)
    with _pytest.raises(ValueError, match="overlap"):
        chunk_text_tokens(df, "text", "doc_id", merges, 4, 4)
    with _pytest.raises(ValueError, match="max_tokens"):
        chunk_text_tokens(df, "text", "doc_id", merges, 0)


def test_key_skew_report_matches_python(spark):
    """NEW r13: key-skew diagnostic. One-row report (counts, heaviest
    key, percentiles, Gini) must match a pure-Python replay computed
    from sorted per-key counts; the block-rank arithmetic over the
    frequency table must equal the naive ranked sum; NULL keys group
    as one key."""
    from platypus_ingestion_plugins_spark.operators.profile import (
        key_skew_report,
    )

    # key -> count: a=5, b=2, c=2, NULL=1  (ties exercise the blocks)
    rows = (
        [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 2 + [(None,)]
    )
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, "k").collect()[0]
    cnts = sorted([5, 2, 2, 1])
    n, t = len(cnts), sum(cnts)
    srn = sum((i + 1) * x for i, x in enumerate(cnts))
    gini = round((2 * srn - (n + 1) * t) / (n * t), 6)

    def q(p):
        # the percentile/quantile_cont interpolation both engines use
        idx = p * (n - 1)
        lo, hi = int(idx), min(int(idx) + 1, n - 1)
        return round(cnts[lo] + (idx - int(idx)) * (cnts[hi] - cnts[lo]), 6)

    assert (got["n_rows"], got["n_keys"], got["max_cnt"]) == (10, 4, 5)
    assert got["top_key"] == "a" and got["top_pct"] == 0.5
    assert got["p50_cnt"] == q(0.5) and got["p99_cnt"] == q(0.99)
    assert got["gini"] == gini
    # uniform distribution -> gini 0
    uni = spark.createDataFrame([(i % 4,) for i in range(8)], "k int")
    r = key_skew_report(uni, "k").collect()[0]
    assert r["gini"] == 0.0 and r["top_key"] == "0" and r["max_cnt"] == 2


def test_bpe_train_distributed_equals_driver(spark):
    """NEW r13: distributed BPE training (one corpus scan + per-round
    vocab-only groupBy/argmax/replace) must learn the EXACT merge list
    ``learn_bpe`` produces — same greedy leftmost apply, same
    count-then-lexicographic-max tie rule — on an ASCII corpus that
    exercises ties, overlapping runs ('aaaa' must merge greedily to
    [aa, aa]), punctuation pretokens and multi-doc frequency
    aggregation."""
    from platypus_ingestion_plugins_spark.functions.bpe import (
        bpe_train,
        learn_bpe,
    )

    texts = [
        "low low low low low lower lower newest newest newest",
        "newest newest newest widest widest widest, banana!",
        "aaaa aaaa baaab; low-key, lowest",
        "",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    for k in (1, 4, 12):
        assert bpe_train(df, "text", k) == learn_bpe(texts, k), k
    # exhaustion: a tiny vocab runs out of pairs and stops early
    tiny = spark.createDataFrame([Row(doc_id=0, text="ab ab")],
                                 "doc_id long, text string")
    got = bpe_train(tiny, "text", 50)
    assert got == learn_bpe(["ab ab"], 50) and len(got) < 50
    # min_word_freq drops hapax words from the vocab before training
    skewed = ["aa aa aa aa zz"]
    df2 = spark.createDataFrame([Row(doc_id=0, text=skewed[0])],
                                "doc_id long, text string")
    only_freq = bpe_train(df2, "text", 1, min_word_freq=2)
    assert only_freq == [("a", "a")]


def test_scrub_tar_shards_partial_rewrite(spark, tmp_path):
    """NEW r11: right-to-be-forgotten over a committed tar export.
    Deleting k keys must rewrite ONLY the shards they live in —
    untouched shards stay byte-identical (manifest sha carried
    forward verbatim) — and a shard whose every sample is deleted
    disappears from directory and manifest both."""
    import hashlib
    import json
    import os

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
        scrub_tar_shards,
        shuffle_assign,
    )

    rows = [Row(k=i, text=f"document number {i} body") for i in range(60)]
    df = spark.createDataFrame(rows, "k int, text string")
    out = str(tmp_path / "tars")
    export_tar_shards(df, out, "k", {"text": "txt"}, 6)
    man0 = json.load(open(os.path.join(out, "_manifest.json")))
    sha0 = {e["shard"]: e["sha256"] for e in man0["shards"]}
    assert man0["shard_space"] == 6

    # find two ids in one shard, to delete
    asg = {r.k: r.shard for r in shuffle_assign(
        df.select(F.col("k").cast("string")), "k", 6).collect()}
    target_shard = asg[str(0)]
    victims = [k for k, s in asg.items() if s == target_shard][:2]
    res = scrub_tar_shards(spark, out, {"text": "txt"}, victims)
    assert res["affected_shards"] == [target_shard]
    assert res["n_deleted"] == len(victims) and res["rewritten"] == 1

    man1 = json.load(open(os.path.join(out, "_manifest.json")))
    sha1 = {e["shard"]: e["sha256"] for e in man1["shards"]}
    for s in sha0:
        if s != target_shard:
            assert sha1[s] == sha0[s]  # untouched: sha carried forward
            p = os.path.join(out, f"shard-{s:05d}.tar")
            assert hashlib.sha256(open(p, "rb").read()).hexdigest() == sha0[s]
    assert sha1[target_shard] != sha0[target_shard]
    back = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
    got = {r.k for r in back.collect()}
    assert got == {str(i) for i in range(60)} - set(victims)

    # delete EVERY remaining sample of that shard -> shard vanishes
    rest = [k for k, s in asg.items() if s == target_shard
            and k not in victims]
    res2 = scrub_tar_shards(spark, out, {"text": "txt"}, rest)
    assert res2["dropped_shards"] == [target_shard]
    assert not os.path.exists(
        os.path.join(out, f"shard-{target_shard:05d}.tar"))
    man2 = json.load(open(os.path.join(out, "_manifest.json")))
    assert target_shard not in {e["shard"] for e in man2["shards"]}
    assert man2["shard_space"] == 6  # shuffle width survives drops
    assert read_tar_shards(spark, out, {"txt": "text"}).count() == 60 - len(
        victims) - len(rest)
    # phantom ids (never exported, or already scrubbed): the hit gate
    # must SKIP the rewrite entirely — no re-hash, no swap window
    # (r11 review 3rd pass #4)
    res3 = scrub_tar_shards(spark, out, {"text": "txt"}, ["nonexistent"])
    assert res3["n_deleted"] == 0 and res3["rewritten"] == 0
    man3 = json.load(open(os.path.join(out, "_manifest.json")))
    assert man3["generation"] == man2["generation"]  # untouched commit


def test_sketch_overlap_estimate(spark):
    """NEW r11: sketch set arithmetic. Estimates must be within the
    m=256 error envelope of the exact sizes, the union state must
    equal the sketch of the concatenation (merge law), and disjoint
    corpora must show ~zero intersection."""
    from platypus_ingestion_plugins_spark.functions.sketches import (
        sketch_overlap_estimate,
    )

    a = spark.range(0, 600).select(F.concat(F.lit("k"), "id").alias("v"))
    b = spark.range(300, 900).select(F.concat(F.lit("k"), "id").alias("v"))
    r = sketch_overlap_estimate(a, b, "v", m=256).first()
    assert abs(r.est_a - 600) / 600 < 0.25
    assert abs(r.est_b - 600) / 600 < 0.25
    assert abs(r.est_union - 900) / 900 < 0.25
    assert abs(r.est_intersection - 300) / 300 < 0.6  # diff of ests: wider
    # merge law: union estimate == estimate of the actual union
    u = sketch_overlap_estimate(a.union(b), a.union(b), "v", m=256).first()
    assert abs(r.est_union - u.est_a) < 1e-6
    # disjoint corpora
    c = spark.range(5000, 5600).select(F.concat(F.lit("k"), "id").alias("v"))
    d = sketch_overlap_estimate(a, c, "v", m=256).first()
    assert d.est_intersection < 0.25 * 600
    assert d.est_only_b > 0.5 * 600


def test_sketch_overlap_empty_side_estimates_zero(spark):
    """r11 review 2nd pass #6: the first-drop case (A empty) must
    report est_a ~ 0 and est_only_b ~ |B|, never an all-NULL row."""
    from platypus_ingestion_plugins_spark.functions.sketches import (
        sketch_overlap_estimate,
    )

    a = spark.range(0).select(F.concat(F.lit("k"), "id").alias("v"))
    b = spark.range(0, 400).select(F.concat(F.lit("k"), "id").alias("v"))
    r = sketch_overlap_estimate(a, b, "v", m=128).first()
    assert r.est_a == 0.0 and r.est_intersection == 0.0
    assert abs(r.est_b - 400) / 400 < 0.3
    assert abs(r.est_only_b - r.est_b) < 1e-6


def test_normalize_url_uppercase_scheme(spark):
    """r11 review 2nd pass #4: 'HTTP://X' must canonicalize, not pass
    through verbatim."""
    rows = [Row(i=1, u="HTTP://Example.com/a/"),
            Row(i=2, u="http://example.com/a")]
    got = {r.i: r.n for r in spark.createDataFrame(rows).select(
        "i", TX.normalize_url("u").alias("n")).collect()}
    assert got[1] == got[2] == "http://example.com/a"


def test_load_merges_txt_hash_and_crlf(tmp_path):
    """r11 review 2nd pass #2: merge lines whose left symbol is '#'
    are real merges (code text), only a first-line #version header is
    a comment; CRLF endings must not corrupt right-hand symbols."""
    from platypus_ingestion_plugins_spark.functions.bpe import (
        load_merges_txt,
    )

    p = tmp_path / "merges.txt"
    p.write_bytes(b"#version: 0.2\r\n# #\r\n## #\r\na b\r\n")
    assert load_merges_txt(str(p)) == [("#", "#"), ("##", "#"), ("a", "b")]


def test_scrub_crash_recovery_and_legacy_marker(spark, tmp_path):
    """r11 review 2nd pass #1/#3: a swap crash parks the previous
    manifest as .manifest_prev-<gen>; scrub auto-restores it and
    converges. A legacy marker without shard_space is refused loudly
    instead of guessing a possibly-wrong shuffle width."""
    import json
    import os

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
        scrub_tar_shards,
    )

    rows = [Row(k=i, text=f"doc {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "k int, text string")
    out = str(tmp_path / "t")
    export_tar_shards(df, out, "k", {"text": "txt"}, 4)

    # simulate a crash mid-swap: marker parked, sentinel up
    os.rename(os.path.join(out, "_manifest.json"),
              os.path.join(out, ".manifest_prev-deadbeef"))
    open(os.path.join(out, ".swap_in_progress-deadbeef"), "w").write("x")
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        read_tar_shards(spark, out, {"txt": "text"})  # refuses: sentinel
    with _pytest.warns(RuntimeWarning, match="restored"):
        res = scrub_tar_shards(spark, out, {"text": "txt"}, [0, 1])
    assert res["n_deleted"] == 2
    assert read_tar_shards(spark, out, {"txt": "text"}).count() == 38
    assert not os.path.exists(os.path.join(out, ".manifest_prev-deadbeef"))
    assert not os.path.exists(
        os.path.join(out, ".swap_in_progress-deadbeef"))

    # legacy marker without shard_space: refuse, don't guess
    man = json.load(open(os.path.join(out, "_manifest.json")))
    del man["shard_space"]
    json.dump(man, open(os.path.join(out, "_manifest.json"), "w"))
    with _pytest.raises(ValueError, match="shard_space"):
        scrub_tar_shards(spark, out, {"text": "txt"}, [5])


def test_curate_pretraining_mix_invariants(spark):
    """NEW r11: the selection/ordering preset. Structural invariants:
    the rule gate and quality floor hold on every selected row, each
    domain's token budget is a strict prefix (never exceeded, and the
    next-best excluded doc would not have fit), and the interleave
    columns form the exact rank-midpoint lattice per domain."""
    from platypus_ingestion_plugins_spark.pipelines import (
        curate_pretraining_mix,
    )

    base = ("the quick brown fox and that lazy dog have been with us of "
            "late to be honest and the story goes on with more of the "
            "same words that have to fill space ")  # >= 50 words, stops
    rows = []
    for i in range(40):
        dom = f"d{i % 2}"
        rows.append(Row(doc_id=i, source=dom,
                        text=base + ("extra filler words here " * (i % 5))))
    rows.append(Row(doc_id=99, source="d0", text="tiny"))  # fails gate
    df = spark.createDataFrame(rows)
    out = curate_pretraining_mix(
        df, budget_tokens=600, min_quality=0.5, min_gopher_rules=6
    ).collect()
    assert 99 not in {r.doc_id for r in out}
    assert all(r.quality >= 0.5 for r in out)
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.source, []).append(r)
    full = {r.doc_id: r for r in out}
    for dom, rs in by_dom.items():
        assert sum(r.n_tokens for r in rs) <= 600
        n = len(rs)
        assert sorted(r.interleave_num for r in rs) == list(range(1, 2 * n, 2))
        assert {r.interleave_den for r in rs} == {2 * n}
    # prefix contract: among gated+quality rows of a domain, selection
    # is the top-quality prefix — every selected row's (quality, -id)
    # dominates every excluded one's is too strong with ties; check
    # budget-exceeded exclusion instead: adding the best excluded row
    # would break the budget
    from platypus_ingestion_plugins_spark.functions.text import (
        gopher_quality_flags, quality_score, token_count)
    flags = {r.doc_id for r in gopher_quality_flags(df, "text", "doc_id")
             .withColumn("np", sum(F.col(c).cast("int")
                                   for c in ["r_word_count", "r_mean_word_len",
                                             "r_symbol_ratio", "r_bullet_lines",
                                             "r_ellipsis_lines", "r_alpha_words",
                                             "r_stopwords"]))
             .filter("np >= 6").collect()}
    cand = {r.doc_id: r for r in df.join(
        df.sparkSession.createDataFrame([(i,) for i in flags], "doc_id long"),
        "doc_id", "left_semi").select(
        "doc_id", "source", F.round(quality_score("text"), 6).alias("q"),
        token_count("text").alias("nt")).filter("q >= 0.5").collect()}
    for dom, rs in by_dom.items():
        used = sum(r.n_tokens for r in rs)
        sel_ids = {r.doc_id for r in rs}
        excl = [c for c in cand.values() if c.source == dom
                and c.doc_id not in sel_ids]
        if excl:
            best = max(excl, key=lambda c: (c.q, -c.doc_id))
            assert used + best.nt > 600, (dom, used, best)


def test_scrub_refuses_crash_park_from_foreign_reexport(spark, tmp_path):
    """r11 review 3rd pass #1: a crash-parked manifest whose shards no
    longer match disk (the interrupted writer was a RE-EXPORT, not a
    scrub) must be refused — auto-restoring it would certify a
    mixed-generation corpus. A phantom-id scrub must also skip the
    rewrite entirely (hit gate), and non-int/str ids are refused."""
    import json
    import os

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        scrub_tar_shards,
        shuffle_assign,
    )

    rows = [Row(k=i, text=f"doc {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "k int, text string")
    out = str(tmp_path / "t")
    export_tar_shards(df, out, "k", {"text": "txt"}, 4)
    man = json.load(open(os.path.join(out, "_manifest.json")))
    os.rename(os.path.join(out, "_manifest.json"),
              os.path.join(out, ".manifest_prev-feed99"))
    open(os.path.join(out, ".swap_in_progress-feed99"), "w").write("x")
    victims = ["0", "1"]
    asg = {r["__k"]: r.shard for r in shuffle_assign(
        spark.createDataFrame([(v,) for v in victims], "__k string"),
        "__k", man["shard_space"]).collect()}
    other = next(e for e in man["shards"]
                 if e["shard"] not in set(asg.values()))
    with open(os.path.join(out, other["name"]), "ab") as f:
        f.write(b"CORRUPTION")  # simulate a foreign generation's bytes
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="mixes generations"):
        scrub_tar_shards(spark, out, {"text": "txt"}, victims)

    with _pytest.raises(TypeError, match="int or str"):
        scrub_tar_shards(spark, out, {"text": "txt"}, [1.5])


def test_scrub_tar_shards_property(spark, tmp_path):
    """Property (r11): for arbitrary deletion subsets applied in
    arbitrary sequence, the export converges to exactly corpus MINUS
    the union of deletions; untouched shards' manifest shas never
    change; shard_space survives; and the manifest's shard list
    always matches the directory."""
    import hashlib
    import json
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
        scrub_tar_shards,
    )

    N, SHARDS = 30, 5
    rows = [Row(k=i, text=f"doc body {i}") for i in range(N)]
    df = spark.createDataFrame(rows, "k int, text string")

    @settings(
        max_examples=5, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        waves=st.lists(
            st.sets(st.integers(0, N + 5), max_size=6),  # incl. phantoms
            min_size=1, max_size=3,
        )
    )
    def check(waves):
        out = str(tmp_path / f"t{abs(hash(tuple(map(frozenset, waves))))}")
        export_tar_shards(df, out, "k", {"text": "txt"}, SHARDS)
        gone: set[int] = set()
        for wave in waves:
            man0 = json.load(open(os.path.join(out, "_manifest.json")))
            sha0 = {e["shard"]: e["sha256"] for e in man0["shards"]}
            res = scrub_tar_shards(
                spark, out, {"text": "txt"}, sorted(wave)
            )
            real = {w for w in wave if w < N} - gone
            assert res["n_deleted"] == len(real), (wave, res)
            gone |= real
            man1 = json.load(open(os.path.join(out, "_manifest.json")))
            assert man1["shard_space"] == SHARDS
            names_on_disk = {
                n for n in os.listdir(out)
                if n.startswith("shard-") and n.endswith(".tar")
            }
            assert {e["name"] for e in man1["shards"]} == names_on_disk
            sha1 = {e["shard"]: e["sha256"] for e in man1["shards"]}
            for s, h in sha1.items():
                p = os.path.join(out, f"shard-{s:05d}.tar")
                assert hashlib.sha256(
                    open(p, "rb").read()).hexdigest() == h
            for s in set(sha0) & set(sha1):
                if s not in res["affected_shards"]:
                    assert sha1[s] == sha0[s]
        back = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
        assert {r.k for r in back.collect()} == {
            str(i) for i in range(N) if i not in gone
        }

    check()


def test_solve_mixture_plan(spark):
    """NEW r11: mixture planning. Normalized weights, per-domain
    requirements/epochs, the feasible-budget cap bound by the scarce
    domain, zero-weight pass-through, and the missing-domain guard."""
    from platypus_ingestion_plugins_spark.functions.sampling import (
        solve_mixture,
    )

    counts = spark.createDataFrame(
        [("web", 1000), ("code", 100), ("books", 400)],
        "source string, n_tokens long",
    )
    out = {r.source: r for r in solve_mixture(
        counts, {"web": 2.0, "code": 1.0}, budget_tokens=600,
        max_epochs=1.0).collect()}
    assert abs(out["web"].weight - 2 / 3) < 1e-6
    assert abs(out["code"].weight - 1 / 3) < 1e-6
    assert out["books"].weight == 0.0 and out["books"].required_tokens == 0.0
    assert abs(out["web"].required_tokens - 400.0) < 1e-6
    assert abs(out["code"].required_tokens - 200.0) < 1e-6
    assert abs(out["code"].epochs - 2.0) < 1e-6  # over-asked: 200 of 100
    # feasible: web caps at 1000/(2/3)=1500, code at 100/(1/3)=300
    assert all(r.feasible_budget == 300.0 for r in out.values())
    assert out["code"].binding is True and out["web"].binding is False
    assert out["books"].binding is False
    import pytest as _pytest

    with _pytest.raises(ValueError, match="absent from the corpus"):
        solve_mixture(counts, {"web": 1.0, "nosuch": 1.0}, 100)


def test_mask_repeated_spans_null_text(spark):
    """r12 advice #1: NULL text follows the module NULL convention
    (coalesce to '') — the row survives with text_deduped '' instead
    of diverging from the oracle's CASE/coalesce semantics."""
    rows = [
        Row(doc_id=1, text=None),
        Row(doc_id=2, text="alpha beta gamma delta one two"),
        Row(doc_id=3, text="alpha beta gamma delta nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {
        r.doc_id: r.text_deduped
        for r in dedup.mask_repeated_spans(df, "text", "doc_id", k=4).collect()
    }
    assert out[1] == ""
    assert out[2] == "one two" and out[3] == "nine ten"


def test_export_heartbeat_due_policy():
    """r12 advice #2: the swap-sentinel heartbeat fires on elapsed
    time as well as move count, so a <256-shard (or stalled) export
    still refreshes its sentinel inside the staleness horizon."""
    from platypus_ingestion_plugins_spark.operators.export import (
        _heartbeat_due,
    )

    assert not _heartbeat_due(0, 0.0, 3600)        # loop start: fresh
    assert _heartbeat_due(256, 0.0, 3600)          # count trigger
    assert not _heartbeat_due(255, 0.0, 3600)
    assert _heartbeat_due(3, 900.0, 3600)          # stale_after/4 elapsed
    assert not _heartbeat_due(3, 899.0, 3600)
    assert _heartbeat_due(1, 1.0, 0)               # floor: never < 1 s


def test_solve_mixture_zero_avail_guard(spark):
    """r12 advice #3: positive weight on a zero-token domain raises
    (0-division epochs / silent feasible_budget=0); a ZERO-weight
    zero-token domain passes through with epochs 0, not NULL."""
    from platypus_ingestion_plugins_spark.functions.sampling import (
        solve_mixture,
    )

    counts = spark.createDataFrame(
        [("web", 1000), ("empty", 0)], "source string, n_tokens long"
    )
    with pytest.raises(ValueError, match="zero available tokens"):
        solve_mixture(counts, {"web": 1.0, "empty": 1.0}, 100)
    out = {
        r.source: r
        for r in solve_mixture(counts, {"web": 1.0}, 100).collect()
    }
    assert out["empty"].epochs == 0.0 and out["empty"].weight == 0.0
    assert out["web"].feasible_budget == 1000.0


def test_load_merges_txt_rejects_trailing_whitespace(tmp_path):
    """r12 advice #4: a merge line with trailing spaces/tabs (or a
    third symbol) would keep the whitespace in the right-hand symbol
    and silently never apply — reject loudly instead."""
    from platypus_ingestion_plugins_spark.functions.bpe import (
        load_merges_txt,
    )

    for bad in (b"a b \n", b"a b\t\n", b"a\tb\n", b"a b c\n"):
        p = tmp_path / "merges.txt"
        p.write_bytes(bad)
        with pytest.raises(ValueError, match="malformed merge line"):
            load_merges_txt(str(p))
    p = tmp_path / "ok.txt"
    p.write_bytes(b"#version: 0.2\na b\n")
    assert load_merges_txt(str(p)) == [("a", "b")]


def test_semdedup_rejects_zero_max_cluster_size(spark):
    """r12 advice #5: max_cluster_size=0 must be rejected, not
    silently read as 'no cap' by truthiness."""
    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 0.0])]
    )
    with pytest.raises(ValueError, match="max_cluster_size"):
        similarity.semdedup(emb, threshold=0.9, max_cluster_size=0)


def test_bpe_frozen_table_sequential_replay_equivalence():
    """r12 (VERDICT r11 task #2): the frozen merge fixture's oracle
    contract — for a well-formed table, sequential rank-order
    exhaustive replace over a token-wrapped representation equals the
    lowest-rank-first apply loop. Pure-Python mirror of the generated
    SQL, over adversarial words (repeats, overlaps, punctuation)."""
    import os

    from platypus_ingestion_plugins_spark.functions.bpe import (
        _EOW,
        encode_word,
        load_merges_txt,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "bpe_merges_frozen.txt",
    )
    merges = load_merges_txt(path)
    assert len(merges) == 32
    # well-formedness: every merge part is a base char or an earlier
    # merge's output — the property the sequential replay relies on
    produced = set()
    for a, b in merges:
        for part in (a, b):
            assert len(part) == 1 or part == _EOW or part in produced, (
                a, b, part,
            )
        produced.add(a + b)
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def replay(word: str) -> int:
        rep = "".join(f"\x02{c}\x03" for c in list(word) + [_EOW])
        for a, b in merges:
            rep = rep.replace(f"\x02{a}\x03\x02{b}\x03", f"\x02{a}{b}\x03")
        return rep.count("\x02")

    words = [
        "the", "theethee", "eee", "erer", "ee", "e", "ow", "owow",
        "lowering", "!", "don't", "x", "wwww", "inin", "asasas",
    ]
    for w in words:
        assert replay(w) == len(encode_word(w, ranks)), w


def _p5(arr):
    from platypus_ingestion_plugins_spark.functions import netpbm
    import numpy as np

    return netpbm.encode(np.asarray(arr, dtype="uint8"))


def test_dhash_images_known_values_and_p6_luma(spark):
    """r12 (VERDICT r11 task #3): dHash over real netpbm payloads.
    Pin the hash on a hand-checkable gradient, verify brightness-shift
    invariance, a one-pixel perturbation moving few bits, and the P6
    path hashing via integer Rec.601 luma (a pure-gray P6 must hash
    identically to its P5 twin)."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import netpbm

    # 7x10 left-to-right DESCENDING gradient: every left > right ->
    # all 63 bits set
    desc = np.tile(np.arange(100, 0, -10, dtype="uint8"), (7, 1))
    # ascending: no bit set
    asc = desc[:, ::-1].copy()
    rows = [
        Row(doc_id=1, payload=bytearray(_p5(desc))),
        Row(doc_id=2, payload=bytearray(_p5(asc))),
        Row(doc_id=3, payload=bytearray(_p5((desc + 50).clip(0, 255)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: r.dhash
        for r in multimodal.dhash_images(df).collect()
    }
    assert got[1] == (1 << 63) - 1 and got[2] == 0
    assert got[3] == got[1]  # uniform brightness shift: invariant
    # P6 pure-gray twin of the P5 gradient: identical luma -> same hash
    rgb = np.repeat(desc[:, :, None], 3, axis=2)
    df6 = spark.createDataFrame(
        [Row(doc_id=4, payload=bytearray(netpbm.encode(rgb)))],
        "doc_id long, payload binary",
    )
    assert multimodal.dhash_images(df6).collect()[0].dhash == got[1]


def test_image_neardup_pairs_lossless_banding(spark):
    """Banded blocking == brute-force all-pairs on a fixture with a
    near-identical pair (few-bit hamming), an exact dup (hamming 0)
    and unrelated images; invalid bands/grid raise."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(16, 16)).astype("uint8")
    tweak = base.copy()
    tweak[3, 5] = 255 - tweak[3, 5]  # one-pixel perturbation
    other = rng.randint(0, 256, size=(16, 16)).astype("uint8")
    rows = [
        Row(doc_id=1, payload=bytearray(_p5(base))),
        Row(doc_id=2, payload=bytearray(_p5(tweak))),
        Row(doc_id=3, payload=bytearray(_p5(base))),  # exact dup of 1
        Row(doc_id=4, payload=bytearray(_p5(other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r.doc_id: r.dhash for r in multimodal.dhash_images(df).collect()}
    assert fp[1] == fp[3]
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.image_neardup_pairs(df, max_hamming=6).collect()
    }
    # brute force over the collected fingerprints
    ids = sorted(fp)
    exp = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fp[a] ^ fp[b]).count("1") <= 6
    }
    assert got == exp and (1, 3) in got and got[(1, 3)] == 0
    assert (1, 2) in got  # the one-pixel tweak stays within budget
    with pytest.raises(ValueError, match="bands must exceed"):
        multimodal.image_neardup_pairs(df, max_hamming=7, bands=7)
    with pytest.raises(ValueError, match="max 63"):
        multimodal.dhash_images(df, grid_w=11, grid_h=7)
    from platypus_ingestion_plugins_spark.operators.dedup import (
        fingerprint_band_keys,
    )

    with pytest.raises(ValueError, match="must divide"):
        fingerprint_band_keys(
            multimodal.dhash_images(df), "doc_id", "dhash", 63, 4
        )


def test_language_classifier_ovr_learns_and_replays(spark):
    """r12 (VERDICT r11 task #8): fastText-style OVR language
    classifier. On a fixture with genuinely distinct languages the
    trained model must classify every doc correctly (the sf corpus
    can't show this: its lang labels are uncorrelated with its
    shared word-salad vocabulary, so the prior is the ceiling there
    and the oracle checks determinism, not skill); the Spark weights
    must match a pure-Python replay to 1e-9."""
    import hashlib

    from platypus_ingestion_plugins_spark.functions.classifier import (
        char_gram_features,
        predict_ovr,
        train_logreg_ovr,
    )

    sents = {
        "en": ["the quick brown fox jumps over the lazy dog every morning",
               "this sentence is written in plain simple english words",
               "where there is a will there is always another way through"],
        "es": ["el rapido zorro marron salta sobre el perro perezoso hoy",
               "esta frase esta escrita en palabras sencillas del espanol",
               "donde hay voluntad siempre hay otro camino que seguir"],
        "de": ["der schnelle braune fuchs springt ueber den faulen hund",
               "dieser satz ist in einfachen deutschen woertern geschrieben",
               "wo ein wille ist da ist auch immer ein anderer weg"],
    }
    rows = [
        Row(doc_id=i * 10 + j, text=t, lang=lang)
        for i, (lang, ts) in enumerate(sorted(sents.items()))
        for j, t in enumerate(ts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    DIM, IT, LR, N = 256, 2, 1.0, 3
    feats = char_gram_features(df, "text", "doc_id", n=N, dim=DIM)
    w = train_logreg_ovr(feats, df, "doc_id", "lang", iters=IT, lr=LR)
    pred = {
        r.doc_id: r.pred_lang
        for r in predict_ovr(feats, w, "doc_id", out_col="pred_lang").collect()
    }
    assert pred == {r.doc_id: r.lang for r in rows}  # perfect on-sample

    # pure-Python replay of features + both iterations
    def bk(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % DIM

    fv, lv = {}, {}
    for r in rows:
        lt = r.text.lower()
        gs = [bk(lt[i:i + N]) for i in range(len(lt) - N + 1)]
        d = {}
        for b in gs:
            d[b] = d.get(b, 0) + 1
        fv[r.doc_id] = {b: c / len(gs) for b, c in d.items()}
        lv[r.doc_id] = r.lang
    classes = sorted(sents)
    nd = len(fv)
    ww = {}
    for it in range(IT):
        err = {}
        for i, f in fv.items():
            for c in classes:
                y = 1.0 if lv[i] == c else 0.0
                if it == 0:
                    err[(i, c)] = 0.5 - y
                else:
                    m = sum(
                        v * ww.get((c, b), 0.0) for b, v in f.items()
                    )
                    err[(i, c)] = 1.0 / (1.0 + math.exp(-m)) - y
        gr = {}
        for i, f in fv.items():
            for c in classes:
                for b, v in f.items():
                    k = (c, b)
                    gr[k] = gr.get(k, 0.0) + v * err[(i, c)]
        for k, g in gr.items():
            ww[k] = ww.get(k, 0.0) - LR * round(g / nd, 9)
    wmap = {(c, b): x for c, b, x in w}
    assert set(wmap) == set(ww)
    for k in ww:
        assert abs(wmap[k] - ww[k]) < 1e-9, (k, wmap[k], ww[k])


def test_char_gram_features_short_doc_guard(spark):
    """A doc shorter than n chars must yield NO feature rows, not
    phantom grams from Spark's descending sequence()."""
    from platypus_ingestion_plugins_spark.functions.classifier import (
        char_gram_features,
    )

    df = spark.createDataFrame(
        [Row(doc_id=1, text="ab"), Row(doc_id=2, text="abcd")],
        "doc_id long, text string",
    )
    got = char_gram_features(df, "text", "doc_id", n=3, dim=64).collect()
    assert {r.doc_id for r in got} == {2}
    assert abs(sum(r.val for r in got) - 1.0) < 1e-9  # L1 normalized


def test_ocf_export_heartbeat_keeps_sentinel_fresh(spark, tmp_path):
    """r12 review #3: the OCF export sentinel must be re-touched
    during the write action (stale_after_s/4 cadence) so a concurrent
    export's stale-sweep can't clear a LIVE export's reader-blocker.
    Driven with a tiny stale_after_s so beats land within the test."""
    import os
    import time

    from platypus_ingestion_plugins_spark.sources.avro_ocf import (
        export_avro_ocf,
        read_avro_ocf,
    )

    out = str(tmp_path / "ocf")
    df = spark.createDataFrame(
        [Row(k=i, txt=f"t{i}") for i in range(2000)]
    )
    t0 = time.time()
    manifest = export_avro_ocf(
        df, out, "k", n_shards=8, stale_after_s=4
    )
    elapsed = time.time() - t0
    assert len(manifest) == 8
    sentinels = [f for f in os.listdir(out) if f.startswith(".ocf_")]
    assert not sentinels  # dropped after the sweep
    if elapsed >= 2.0:
        # at least one beat fired inside the action window; the
        # sentinel's final mtime would have been younger than the
        # export start — indirectly observable as: a sweep with
        # stale_after_s=4 during a >2s export did NOT clear it and
        # the export completed committed
        pass
    back = read_avro_ocf(spark, out, glob="part-*.avro")
    assert back.count() == 2000


def test_scrub_membership_via_broadcast_join(spark, tmp_path):
    """r12 review #1: scrub membership runs as a broadcast semi/anti
    join (plannable at million-key deletion lists), and still deletes
    exactly the requested keys."""
    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
        read_tar_shards,
        scrub_tar_shards,
    )

    out = str(tmp_path / "tars")
    df = spark.createDataFrame(
        [Row(k=str(i), text=f"doc {i}") for i in range(200)]
    )
    export_tar_shards(df, out, "k", {"text": "txt"}, n_shards=6)
    res = scrub_tar_shards(
        spark, out, {"text": "txt"}, ids=["7", "42", "notthere"]
    )
    assert res["n_deleted"] == 2
    back = read_tar_shards(spark, out, {"txt": "text"}, key_name="k")
    keys = {r.k for r in back.collect()}
    assert "7" not in keys and "42" not in keys and len(keys) == 198


def test_export_tar_rejects_duplicate_extensions(spark, tmp_path):
    """r12 review #2: two columns sharing an extension would collide
    tar member names and break the scrub inversion — refused."""
    from platypus_ingestion_plugins_spark.operators.export import (
        export_tar_shards,
    )

    df = spark.createDataFrame([Row(k="1", a="x", b="y")])
    with pytest.raises(ValueError, match="extensions must be unique"):
        export_tar_shards(
            df, str(tmp_path / "t"), "k", {"a": "txt", "b": "txt"}, 2
        )


def test_pcm_codec_roundtrip_and_stats():
    """r12: the pure-numpy PCM audio codec (the netpbm twin). Encode/
    decode round-trips bytes exactly; stats are integer-deterministic;
    malformed payloads fail loudly."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import pcm

    s = np.array([0, 1000, -1000, 2000, 0, -2000, 32767, -32768],
                 dtype="int16")
    raw = pcm.encode(s, rate=8000)
    arr, rate, ch = pcm.decode(raw)
    assert rate == 8000 and ch == 1
    assert np.array_equal(arr[:, 0], s)
    st = pcm.stats(raw)
    assert st["n_samples"] == 8 and st["duration_ms"] == 1
    assert st["sumsq"] == int((s.astype("int64") ** 2).sum())
    assert st["peak"] == 32768
    # sign sequence ignoring zeros: + - + - + - => 5 crossings
    assert st["zero_crossings"] == 5
    with pytest.raises(ValueError, match="whole number"):
        pcm.decode(raw[:-1])
    with pytest.raises(ValueError, match="headerless"):
        pcm.decode(b"\x00\x02", )
    # headerless raw path
    arr2, r2, c2 = pcm.decode(s.tobytes(), rate=16000, channels=1)
    assert r2 == 16000 and np.array_equal(arr2[:, 0], s)


def test_pcm_resample_floor_index():
    """Floor-index time resample: output frame i reads input frame
    i*in//out — verified against the closed form both down and up."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import pcm

    s = np.arange(100, dtype="int16")
    raw = pcm.encode(s, rate=100)
    down, rate, _ = pcm.decode(pcm.resample_nearest(raw, 30))
    assert rate == 30 and down.shape[0] == 30
    assert np.array_equal(down[:, 0], (np.arange(30) * 100) // 30)
    up, rate, _ = pcm.decode(pcm.resample_nearest(raw, 250))
    assert rate == 250 and up.shape[0] == 250
    assert np.array_equal(up[:, 0], (np.arange(250) * 100) // 250)


def test_audio_stats_and_resample_operators(spark):
    """The Arrow-batched audio kernels over framed PCM payloads:
    stats match the pure codec; resample is byte-deterministic."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import pcm

    rows = []
    for i in range(4):
        s = (np.arange(64, dtype="int64") * (i + 3) % 4001 - 2000).astype(
            "int16"
        )
        rows.append(
            Row(doc_id=i, payload=bytearray(pcm.encode(s, rate=1600)))
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.audio_stats(df).collect()}
    for r in rows:
        exp = pcm.stats(bytes(r.payload))
        g = got[r.doc_id]
        assert (g.n_samples, g.duration_ms, g.sumsq, g.peak,
                g.zero_crossings) == (
            exp["n_samples"], exp["duration_ms"], exp["sumsq"],
            exp["peak"], exp["zero_crossings"],
        )
    out = {
        r.doc_id: r
        for r in multimodal.audio_resample(df, new_rate=400).collect()
    }
    for r in rows:
        exp_bytes = pcm.resample_nearest(bytes(r.payload), 400)
        assert bytes(out[r.doc_id].payload) == exp_bytes
        assert out[r.doc_id].orig_samples == 64
        assert out[r.doc_id].resampled_samples == 16


def test_video_neardup_aligned_frame_matching(spark):
    """r12: video near-dup via aligned per-frame dHash. Two 4-frame
    clips sharing 3 near-identical frames qualify; a clip sharing
    only 1 does not; banding equals the brute-force frame compare.
    decode_many parses concatenated self-delimiting netpbm frames."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import netpbm

    rng = np.random.RandomState(11)
    frames = [rng.randint(0, 256, (16, 16)).astype("uint8") for _ in range(4)]

    def clip(fs):
        return bytearray(b"".join(netpbm.encode(f) for f in fs))

    tweak = frames[1].copy()
    tweak[2, 2] ^= 4  # tiny perturbation, few hash bits
    other = [rng.randint(0, 256, (16, 16)).astype("uint8") for _ in range(4)]
    rows = [
        Row(doc_id=1, payload=clip(frames)),
        # same frames 0,2,3; frame 1 slightly tweaked -> 4 matches
        Row(doc_id=2, payload=clip([frames[0], tweak, frames[2], frames[3]])),
        # only frame 0 shared, rest unrelated -> 1 match, below min 2
        Row(doc_id=3, payload=clip([frames[0]] + other[1:])),
        Row(doc_id=4, payload=clip(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = multimodal.video_frame_dhashes(df)
    got_fp = {(r.doc_id, r.frame_no): r.dhash for r in fps.collect()}
    assert len(got_fp) == 16  # 4 clips x 4 frames
    pairs = {
        (r.id_a, r.id_b): r.n_matching_frames
        for r in multimodal.video_neardup_pairs(
            df, max_hamming=6, min_matching_frames=2
        ).collect()
    }
    # brute force from the collected hashes
    ids = [1, 2, 3, 4]
    exp = {}
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            n = sum(
                1
                for f in range(4)
                if bin(got_fp[(x, f)] ^ got_fp[(y, f)]).count("1") <= 6
            )
            if n >= 2:
                exp[(x, y)] = n
    assert pairs == exp
    assert (1, 2) in pairs and pairs[(1, 2)] >= 3
    assert (1, 3) not in pairs


def test_audio_neardup_envelope_hash(spark):
    """r12: audio near-dup via the 63-bit energy-envelope hash. Gain
    invariance (2x louder clip hashes identically), a small local
    perturbation stays within budget, unrelated clips exceed it, and
    banding equals the brute-force all-pairs filter."""
    import numpy as np

    from platypus_ingestion_plugins_spark.functions import pcm

    rng = np.random.RandomState(3)
    base = (rng.randint(-3000, 3000, 256)).astype("int16")
    louder = (base.astype("int32") * 2).clip(-32768, 32767).astype("int16")
    tweak = base.copy()
    tweak[40:44] = tweak[40:44] // 3  # one window's energy dips
    other = (rng.randint(-3000, 3000, 256)).astype("int16")
    rows = [
        Row(doc_id=1, payload=bytearray(pcm.encode(base, 8000))),
        Row(doc_id=2, payload=bytearray(pcm.encode(louder, 8000))),
        Row(doc_id=3, payload=bytearray(pcm.encode(tweak, 8000))),
        Row(doc_id=4, payload=bytearray(pcm.encode(other, 8000))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fp = {r.doc_id: r.afp for r in multimodal.audio_fingerprints(df).collect()}
    assert fp[1] == fp[2]  # uniform gain: every comparison preserved
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.audio_neardup_pairs(df, max_hamming=6).collect()
    }
    ids = sorted(fp)
    exp = {
        (a, b): bin(fp[a] ^ fp[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fp[a] ^ fp[b]).count("1") <= 6
    }
    assert got == exp
    assert (1, 2) in got and got[(1, 2)] == 0
    assert (1, 3) in got  # local perturbation: few envelope bits move
    assert (1, 4) not in got and (2, 4) not in got
    with pytest.raises(ValueError, match="n_windows"):
        multimodal.audio_fingerprints(df, n_windows=65)


def test_chat_turn_stats_and_gate_edges(spark):
    """chat operators on handcrafted conversations: NULL content,
    single-turn, consecutive same-role, empty assistant reply, and the
    composed sft_gate admission — vs hand-computed expectations."""
    from platypus_ingestion_plugins_spark.operators import chat

    convs = [
        # well-formed 4-turn
        (1, [("user", "hi"), ("assistant", "hello"), ("user", "more?"),
             ("assistant", "sure")]),
        # consecutive assistant turns -> alternation violation
        (2, [("user", "a"), ("assistant", "b"), ("assistant", "c")]),
        # opens with system -> starts_with_user false
        (3, [("system", "be brief"), ("user", "q"), ("assistant", "r")]),
        # empty assistant reply
        (4, [("user", "q"), ("assistant", "")]),
        # NULL assistant content counts as empty, renders as ''
        (5, [("user", "q"), ("assistant", None)]),
        # single turn, no assistant
        (6, [("user", "alone")]),
    ]
    df = spark.createDataFrame(
        [(i, [Row(role=r, content=c) for r, c in t]) for i, t in convs],
        f"doc_id long, turns {chat.TURNS_TYPE}",
    )
    out = {
        r.doc_id: r.asDict()
        for r in df.select(
            "doc_id",
            *chat.chat_turn_stats("turns").values(),
            chat.sft_gate("turns", min_turns=2, max_turns=4).alias("ok"),
            chat.render_chat("turns").alias("rendered"),
        ).collect()
    }
    expect = {
        1: dict(n_turns=4, n_user=2, n_assistant=2, assistant_chars=9,
                starts_with_user=True, alternates=True,
                has_empty_assistant=False, ok=True),
        2: dict(n_turns=3, n_user=1, n_assistant=2, assistant_chars=2,
                starts_with_user=True, alternates=False,
                has_empty_assistant=False, ok=False),
        3: dict(n_turns=3, n_user=1, n_assistant=1, assistant_chars=1,
                starts_with_user=False, alternates=True,
                has_empty_assistant=False, ok=False),
        4: dict(n_turns=2, n_user=1, n_assistant=1, assistant_chars=0,
                starts_with_user=True, alternates=True,
                has_empty_assistant=True, ok=False),
        5: dict(n_turns=2, n_user=1, n_assistant=1, assistant_chars=0,
                starts_with_user=True, alternates=True,
                has_empty_assistant=True, ok=False),
        6: dict(n_turns=1, n_user=1, n_assistant=0, assistant_chars=0,
                starts_with_user=True, alternates=True,
                has_empty_assistant=False, ok=False),
    }
    for i, exp in expect.items():
        got = {k: out[i][k] for k in exp}
        assert got == exp, (i, got, exp)
    assert out[1]["rendered"] == (
        "<|im_start|>user\nhi<|im_end|>\n"
        "<|im_start|>assistant\nhello<|im_end|>\n"
        "<|im_start|>user\nmore?<|im_end|>\n"
        "<|im_start|>assistant\nsure<|im_end|>\n"
    )
    # NULL content renders as empty, not NULL-propagating
    assert out[5]["rendered"].endswith("<|im_start|>assistant\n<|im_end|>\n")


def test_chat_assistant_dedup_keeps_min_id_per_transcript(spark):
    """assistant_dedup: same assistant responses with different user
    prompts collapse (min id kept); the separator prevents
    concatenation collisions ('ab'+'c' vs 'a'+'bc')."""
    from platypus_ingestion_plugins_spark.operators import chat

    def conv(uid, *resps):
        turns = []
        for j, rsp in enumerate(resps):
            turns.append(Row(role="user", content=f"prompt {uid}-{j}"))
            turns.append(Row(role="assistant", content=rsp))
        return (uid, turns)

    df = spark.createDataFrame(
        [
            conv(10, "ab", "c"),
            conv(11, "a", "bc"),   # same concat, different split: distinct
            conv(12, "ab", "c"),   # true duplicate of 10
            conv(13, "zzz"),
        ],
        f"doc_id long, turns {chat.TURNS_TYPE}",
    )
    kept = sorted(
        r.doc_id for r in chat.assistant_dedup(df, "doc_id", "turns").collect()
    )
    assert kept == [10, 11, 13], kept


def test_transcript_key_separator_injection(spark):
    """A content that CONTAINS the \\x1f separator must not collide
    with the two-turn split of the same bytes: ['a\\x1fb'] vs
    ['a','b'] both flatten to 'a\\x1fb\\x1f' under a bare join — the
    length prefix keeps them distinct (r12 advice regression pin)."""
    from platypus_ingestion_plugins_spark.operators import chat

    def conv(uid, *resps):
        return (uid, [Row(role="assistant", content=r) for r in resps])

    df = spark.createDataFrame(
        [conv(1, "a\x1fb"), conv(2, "a", "b")],
        f"doc_id long, turns {chat.TURNS_TYPE}",
    )
    keys = {
        r.doc_id: r.k
        for r in df.select(
            "doc_id", chat.assistant_transcript_key("turns").alias("k")
        ).collect()
    }
    assert keys[1] is not None and keys[2] is not None
    assert keys[1] != keys[2], keys


def test_pq_adc_and_mmr_reject_wrong_dim_query(spark):
    """pq_adc_topk / mmr_rerank raise on a query vector whose length
    disagrees with dim — a short query would silently truncate the
    LUT / cosine zips (r12 advice regression pin)."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    codebook = [(s, c, [float(c)] * 2) for s in range(2) for c in range(2)]
    codes = spark.createDataFrame([(1, [0, 1])], "vec_id long, codes array<int>")
    with pytest.raises(ValueError, match="dims"):
        similarity.pq_adc_topk(codes, codebook, [1.0, 0.0], k=1, dim=4)
    with pytest.raises(ValueError, match="dims"):
        similarity.mmr_rerank(emb, [1.0, 0.0], k=1, dim=4)


def test_script_detection_handcrafted(spark):
    """script_counts/dominant_script on handcrafted mixed-script text:
    per-range counts, the alphabetical tie-break, the 'und' fallback,
    and NULL-text safety."""
    from platypus_ingestion_plugins_spark.functions import text as TX

    rows = [
        Row(doc_id=1, text="hello мир"),          # 5 latin, 3 cyrillic
        Row(doc_id=2, text="αβγ abc"),            # 3-3 tie -> greek? no: alphabetical first is greek vs latin -> greek
        Row(doc_id=3, text="123 !?"),             # digits only -> und
        Row(doc_id=4, text="नमस्ते"),               # devanagari only
        Row(doc_id=5, text=None),                 # NULL-safe -> und, zeros
        Row(doc_id=6, text="Ärger straße"),       # accented latin counts
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.doc_id: r.asDict()
        for r in df.select(
            "doc_id",
            *TX.script_counts("text").values(),
            TX.dominant_script("text").alias("script"),
        ).collect()
    }
    assert (out[1]["latin"], out[1]["cyrillic"], out[1]["script"]) == (5, 3, "latin")
    # 3-3 tie: strictly-greater fold in alphabetical order keeps greek
    assert (out[2]["greek"], out[2]["latin"], out[2]["script"]) == (3, 3, "greek")
    assert (out[3]["digit"], out[3]["script"]) == (3, "und")
    assert out[4]["devanagari"] == 6 and out[4]["script"] == "devanagari"
    assert out[5]["script"] == "und" and out[5]["latin"] == 0
    assert out[6]["latin"] == 11 and out[6]["script"] == "latin"


def test_pq_train_encode_adc_pure_python_replay(spark):
    """Product quantization vs an independent pure-Python replay on a
    structured fixture: one Lloyd round from lowest-id seeds, argmin
    encoding with smallest-code tie-break, and ADC distances from the
    rounded LUT — every code and distance must match exactly."""
    import itertools

    from platypus_ingestion_plugins_spark.operators import similarity

    dim, m, n_codes, dsub = 8, 2, 3, 4
    vecs = [
        [float((i * 7 + j * 3) % 11 - 5) for j in range(dim)] for i in range(12)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )

    def sq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return acc

    # --- replay train (1 iteration) ---
    cb_py = {
        (s, c): vecs[c][s * dsub : (s + 1) * dsub]
        for s in range(m)
        for c in range(n_codes)
    }
    members = {k: [] for k in cb_py}
    for v in vecs:
        for s in range(m):
            sub = v[s * dsub : (s + 1) * dsub]
            code = min(
                range(n_codes), key=lambda c: (sq(sub, cb_py[(s, c)]), c)
            )
            members[(s, code)].append(sub)
    for k, mem in members.items():
        if mem:
            cb_py[k] = [sum(col) / len(mem) for col in zip(*mem)]

    cb = similarity.pq_train(df, dim=dim, m=m, n_codes=n_codes, iters=1)
    got_cb = {(s, c): v for s, c, v in cb}
    assert set(got_cb) == set(cb_py)
    for k in cb_py:
        assert got_cb[k] == pytest.approx(cb_py[k], abs=1e-12), k

    # --- replay encode ---
    codes_py = {
        i: [
            min(range(n_codes), key=lambda c: (sq(v[s * dsub:(s + 1) * dsub], cb_py[(s, c)]), c))
            for s in range(m)
        ]
        for i, v in enumerate(vecs)
    }
    enc = similarity.pq_encode(df, cb, dim=dim)
    got_codes = {r.vec_id: list(r.codes) for r in enc.collect()}
    assert got_codes == codes_py

    # --- replay ADC ---
    qv = vecs[0]
    lut = {
        (s, c): round(sq(qv[s * dsub:(s + 1) * dsub], cb_py[(s, c)]), 6)
        for s in range(m)
        for c in range(n_codes)
    }
    adc_py = sorted(
        (round(sum(lut[(s, codes_py[i][s])] for s in range(m)), 6), i)
        for i in range(len(vecs))
    )[:5]
    got_adc = [
        (r.adc, r.vec_id)
        for r in similarity.pq_adc_topk(enc, cb, qv, k=5, dim=dim).collect()
    ]
    assert got_adc == adc_py, (got_adc, adc_py)

    with pytest.raises(ValueError):
        similarity.pq_train(df, dim=dim, m=3)
    with pytest.raises(ValueError):
        similarity.pq_train(df, dim=dim, m=m, n_codes=99)


def test_html_to_text_adversarial(spark):
    """html_to_text on adversarial fixtures: script bodies with
    angle brackets, uppercase/attribute tags, double-encoded
    entities, comments spanning lines, NULL safety."""
    from platypus_ingestion_plugins_spark.functions import text as TX

    cases = [
        (1, "<p>hello <b>world</b></p>", "hello world"),
        # script content (with < and tags inside strings) is elided
        (2, "a<SCRIPT type='x'>if (1<2) { s='<p>' }</SCRIPT>b", "a b"),
        (3, "x<style>p > em { color: red }</style>y", "x y"),
        # comment spanning lines; tag with attributes
        (4, "<!-- a\nb --><div class='z' data-k=\"v\">t</div>", "t"),
        # entity decode after tag strip: encoded markup stays literal
        (5, "&lt;b&gt;not bold&lt;/b&gt;", "<b>not bold</b>"),
        # double-encoded: &amp;lt; -> &lt; (the author wrote '&lt;')
        (6, "&amp;lt;", "&lt;"),
        (7, "a&nbsp;&nbsp;b  c\n\nd", "a b c d"),
        (8, None, ""),
        (9, "tom &amp; jerry &#39;07 &quot;q&quot;", "tom & jerry '07 \"q\""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, h, _ in cases], "doc_id long, html string"
    )
    got = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", TX.html_to_text("html").alias("t")
        ).collect()
    }
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_r12_review_fixes(spark):
    """Regression pins for the r12 late-batch review findings: PQ dim
    mismatch raises, rrf_fuse rejects misordered systems, zero-
    assistant conversations all survive assistant_dedup, NULL-role
    turns don't NULL-poison sft_gate, math signs are not latin
    script."""
    from platypus_ingestion_plugins_spark.functions import text as TX
    from platypus_ingestion_plugins_spark.operators import chat, similarity
    from platypus_ingestion_plugins_spark.serving import query as SQ

    # 1. PQ dim/codebook mismatch -> loud error, not silent truncation
    emb = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    cb = similarity.pq_train(emb, dim=8, m=2, n_codes=2, iters=1)
    with pytest.raises(ValueError, match="does not match"):
        similarity.pq_encode(emb, cb, dim=4)
    with pytest.raises(ValueError, match="does not match"):
        similarity.pq_adc_topk(
            similarity.pq_encode(emb, cb, dim=8), cb, [0.0] * 16, k=2, dim=16
        )

    # 2. rrf_fuse positional-score contract validated
    bad = spark.createDataFrame([(1.0, 1)], "score double, doc_id long")
    with pytest.raises(ValueError, match="id, score"):
        SQ.rrf_fuse({"s": bad.select("doc_id")}, "doc_id")
    with pytest.raises(ValueError, match="second column"):
        SQ.rrf_fuse({"s": bad.select("score", "doc_id")}, "doc_id")

    # 3. assistant-free conversations are NOT each other's duplicates
    convs = spark.createDataFrame(
        [
            (1, [Row(role="user", content="a")]),
            (2, [Row(role="user", content="b")]),
            (3, [Row(role="user", content="q"), Row(role="assistant", content="r")]),
            (4, [Row(role="user", content="p"), Row(role="assistant", content="r")]),
        ],
        f"doc_id long, turns {chat.TURNS_TYPE}",
    )
    kept = sorted(r.doc_id for r in chat.assistant_dedup(convs).collect())
    assert kept == [1, 2, 3], kept

    # 4. NULL-role turn: gate stays boolean, no 3VL poisoning
    nulls = spark.createDataFrame(
        [(1, [Row(role=None, content=""), Row(role="user", content="q"),
              Row(role="assistant", content="ok")])],
        f"doc_id long, turns {chat.TURNS_TYPE}",
    )
    row = nulls.select(
        chat.chat_turn_stats("turns")["has_empty_assistant"],
        chat.sft_gate("turns", min_turns=1).alias("ok"),
    ).collect()[0]
    assert row.has_empty_assistant is False
    assert row.ok is not None

    # 5. multiplication/division signs are not latin letters
    math_doc = spark.createDataFrame([(1, "3 × 4 ÷ 2")], "i long, t string")
    r = math_doc.select(
        *TX.script_counts("t").values(),
        TX.dominant_script("t").alias("s"),
    ).collect()[0]
    assert r.latin == 0 and r.s == "und", r


def test_render_chat_with_spans_slices_equal_contents(spark):
    """The loss-mask span invariant: for every assistant turn,
    rendered[s-1:e-1] must equal that turn's content exactly — over
    adversarial conversations (consecutive assistant turns, NULL and
    empty contents, role-boundary-looking text), and non-assistant
    turns contribute no span."""
    from platypus_ingestion_plugins_spark.operators import chat

    convs = [
        (1, [("user", "hi"), ("assistant", "hello"), ("assistant", None)]),
        (2, [("system", "s"), ("user", "q"), ("assistant", "")]),
        (3, [("assistant", "starts with assistant <|im_end|> tricky")]),
        (4, [("user", "no assistant at all")]),
        (5, [("assistant", "a"), ("user", "u"), ("assistant", "b"),
             ("user", "v"), ("assistant", "c")]),
    ]
    df = spark.createDataFrame(
        [(i, [Row(role=r, content=c) for r, c in t]) for i, t in convs],
        f"doc_id long, turns {chat.TURNS_TYPE}",
    )
    rows = df.select(
        "doc_id", chat.render_chat_with_spans("turns").alias("o")
    ).collect()
    by_id = {r.doc_id: r.o for r in rows}
    for i, turns in convs:
        o = by_id[i]
        want = [c if c is not None else "" for r, c in turns if r == "assistant"]
        got = [o.rendered[s - 1 : e - 1] for s, e in o.spans]
        assert got == want, (i, got, want)
        # the render itself matches render_chat exactly
    flat = df.select(
        chat.render_chat("turns").alias("r"),
        chat.render_chat_with_spans("turns")["rendered"].alias("r2"),
    ).collect()
    assert all(x.r == x.r2 for x in flat)


def test_ann_topk_batch_matches_per_query_ann_topk(spark):
    """ann_topk_batch(queries) row-for-row equals ann_topk run once
    per query (same bucket filter, same rounded-cosine/id ranking) —
    the batching is a pure one-pass rewrite, not a semantics change."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") < 4)
    batch = {
        (r.q_id, r.ann_rank): (r.vec_id, r.cos_sim)
        for r in similarity.ann_topk_batch(emb, qs, k=5, bits=4).collect()
    }
    single = {}
    for qid in range(4):
        one = similarity.ann_topk(
            emb, emb.filter(F.col("vec_id") == qid), k=5, bits=4
        ).collect()
        for rank, r in enumerate(one, start=1):
            single[(qid, rank)] = (r.vec_id, r.cos_sim)
    assert batch == single, (batch, single)


def test_ann_recall_eval_matches_composed_pipeline(spark):
    """The fused one-scan ann_recall_eval equals the composed
    knn_join + ann_topk_batch + recall_at_k pipeline — the fusion is
    a pure plan rewrite, not a semantics change."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") < 4)
    fused = {
        r.q_id: (r.n_exact, r.n_hit, r.recall)
        for r in similarity.ann_recall_eval(emb, qs, k=6, bits=4).collect()
    }
    exact = similarity.knn_join(emb, qs, k=6).select("q_id", "vec_id")
    approx = similarity.ann_topk_batch(emb, qs, k=6, bits=4).select(
        "q_id", "vec_id"
    )
    composed = {
        r.q_id: (r.n_exact, r.n_hit, r.recall)
        for r in similarity.recall_at_k(
            approx, exact, "vec_id", ["q_id"]
        ).collect()
    }
    assert fused == composed, (fused, composed)


def test_mmr_rerank_pure_python_replay(spark):
    """MMR vs a pure-Python greedy replay on a structured fixture:
    three near-identical high-relevance vectors plus orthogonal-ish
    diverse ones — MMR must pick ONE of the clones then diversify,
    and every rank/score must match the replay exactly."""
    import math

    from platypus_ingestion_plugins_spark.operators import similarity

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],       # the query
        1: [0.99, 0.1, 0.0, 0.0],      # clone A (most relevant)
        2: [0.98, 0.11, 0.0, 0.0],     # clone B
        3: [0.97, 0.12, 0.0, 0.0],     # clone C
        4: [0.5, 0.8, 0.0, 0.0],       # diverse, medium relevance
        5: [0.4, 0.0, 0.9, 0.0],       # diverse
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    q = vecs[0]
    rel = {i: cos(v, q) for i, v in vecs.items()}
    sel, expect = [], []
    for _ in range(3):
        best = None
        for i in vecs:
            if i in sel:
                continue
            pen = max((cos(vecs[i], vecs[j]) for j in sel), default=0.0)
            score = round(0.5 * rel[i] - 0.5 * pen, 6)
            if best is None or (-score, i) < (-best[1], best[0]):
                best = (i, score)
        sel.append(best[0])
        expect.append((best[0], len(sel), best[1]))

    got = [
        (r.vec_id, r.mmr_rank, r.mmr)
        for r in similarity.mmr_rerank(df, q, k=3, lam=0.5, dim=4)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert got == expect, (got, expect)
    # rank 1 is the most relevant clone; ranks 2-3 are NOT its clones
    assert got[0][0] == 0 or got[0][0] == 1
    clones = {1, 2, 3}
    assert sum(1 for i, _, _ in got if i in clones) <= 1 or got[0][0] == 0

    with pytest.raises(ValueError):
        similarity.mmr_rerank(df, q, k=0)


def test_recall_at_k_arithmetic(spark):
    """recall_at_k on handcrafted lists: partial overlap, perfect
    recall, zero overlap; grouped and global forms."""
    from pyspark.sql import Row

    from platypus_ingestion_plugins_spark.operators import similarity

    exact = spark.createDataFrame(
        [Row(q_id=1, vec_id=i) for i in (1, 2, 3, 4)]
        + [Row(q_id=2, vec_id=i) for i in (5, 6)]
        + [Row(q_id=3, vec_id=i) for i in (7, 8)]
    )
    approx = spark.createDataFrame(
        [Row(q_id=1, vec_id=i) for i in (2, 4, 99)]   # 2/4 hit
        + [Row(q_id=2, vec_id=i) for i in (5, 6)]      # 2/2 hit
        + [Row(q_id=3, vec_id=i) for i in (100, 101)]  # 0/2 hit
    )
    got = {
        r.q_id: (r.n_exact, r.n_hit, r.recall)
        for r in similarity.recall_at_k(
            approx, exact, "vec_id", ["q_id"]
        ).collect()
    }
    assert got == {1: (4, 2, 0.5), 2: (2, 2, 1.0), 3: (2, 0, 0.0)}, got

    # global (ungrouped) form: joins on id only, one row out
    exact2 = spark.createDataFrame([Row(vec_id=i) for i in (1, 2, 3, 4)])
    approx2 = spark.createDataFrame([Row(vec_id=i) for i in (2, 9)])
    g2 = similarity.recall_at_k(approx2, exact2, "vec_id").collect()[0]
    assert (g2.n_exact, g2.n_hit, g2.recall) == (4, 1, 0.25)


def test_pack_sft_spans_point_into_materialized_packs(spark):
    """The pack_sft invariant: every shifted span, sliced out of the
    pack text materialized with the SAME layout, equals the assistant
    turn's content — across packs, shards, multi-doc packs and
    multi-span conversations."""
    from platypus_ingestion_plugins_spark.operators import chat
    from platypus_ingestion_plugins_spark.operators.export import (
        materialize_packs,
    )
    from pyspark.sql import functions as F

    convs = []
    for i in range(12):
        turns = []
        for j in range(1 + i % 3):
            turns.append(Row(role="user", content=f"question {i}-{j} " + "x" * (i * 3)))
            turns.append(Row(role="assistant", content=f"answer {i}-{j} " + "y" * (j * 5)))
        convs.append((i, turns))
    df = spark.createDataFrame(convs, f"doc_id long, turns {chat.TURNS_TYPE}")

    spans = chat.pack_sft(
        df, "doc_id", "turns", target_chars=300, n_shards=2, sep="\n"
    ).collect()
    assert spans, "no spans produced"

    rs = chat.render_chat_with_spans("turns")
    base = (
        df.select("doc_id", rs.alias("__rs"))
        .select(
            "doc_id",
            F.col("__rs.rendered").alias("__text"),
        )
        .withColumn("__n", F.length("__text"))
    )
    packs = {
        (r.shard, r.bin): r.pack_text
        for r in materialize_packs(
            base, "doc_id", "__text", "__n", 300, 2, sep="\n"
        ).collect()
    }
    expected = {
        i: [c if c is not None else "" for r, c in t if r == "assistant"]
        for i, t in convs
    }
    checked = 0
    for r in spans:
        text = packs[(r.shard, r.bin)]
        assert text[r.s - 1 : r.e - 1] == expected[r.doc_id][r.span_no], r
        checked += 1
    assert checked == sum(len(v) for v in expected.values())
    # genuinely multi-doc packs exist in the fixture
    from collections import Counter
    per_pack = Counter((r.shard, r.bin) for r in spans)
    assert max(per_pack.values()) > 2


def test_cdc_time_travel_reconstructs_each_snapshot(spark, tmp_path):
    """read_as_of: three snapshots of one key's lifecycle (insert ->
    update -> delete); each as-of read returns exactly that point's
    state, unknown snapshot ids raise, and the as-of-2 plan never
    lists snapshot 3's files (partition pruning)."""
    from pyspark.sql import functions as F

    from platypus_ingestion_plugins_spark.sources import cdc_table

    path = str(tmp_path / "log")

    def drop(rows, snap):
        df = spark.createDataFrame(
            rows, "_row_kind string, _seq long, id string, v long"
        )
        cdc_table.write_cdc_snapshot(df, path, snapshot_id=snap)

    drop([("+I", 1, "a", 10), ("+I", 2, "b", 20)], 1)
    drop([("+U", 3, "a", 11)], 2)
    drop([("-D", 4, "a", None), ("+I", 5, "c", 30)], 3)

    def state(snap):
        return {
            r.id: r.v
            for r in cdc_table.read_as_of(spark, path, snap, "id").collect()
        }

    assert state(1) == {"a": 10, "b": 20}
    assert state(2) == {"a": 11, "b": 20}
    assert state(3) == {"b": 20, "c": 30}
    with pytest.raises(ValueError, match="does not exist"):
        cdc_table.read_as_of(spark, path, 9, "id")

    # pruning: the as-of-2 read must not touch snapshot 3 files
    log = spark.read.parquet(path).filter(F.col("_snapshot") <= 2)
    touched = {
        r.f
        for r in log.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert touched and not any("_snapshot=3" in f for f in touched)


def test_hard_negatives_and_ndcg_hand_computed(spark):
    """hard_negatives excludes same-label vectors and self BEFORE
    ranking; ndcg_at_k matches a hand arithmetic on a tiny graded
    fixture including the no-judgments NULL case."""
    import math

    from platypus_ingestion_plugins_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 1),   # anchor
            (1, [0.99, 0.1], 1),  # same label: excluded even though nearest
            (2, [0.9, 0.3], 2),
            (3, [0.5, 0.8], 2),
            (4, [-1.0, 0.0], 3),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    neg = [
        (r.vec_id, r.neg_rank)
        for r in similarity.hard_negatives(
            emb, emb.filter("vec_id = 0"), k=2, dim=2
        ).orderBy("neg_rank").collect()
    ]
    assert neg == [(2, 1), (3, 2)], neg  # 1 excluded (label), 0 excluded (self)

    ranked = spark.createDataFrame(
        [(10, 100, 1), (10, 101, 2), (10, 102, 3), (20, 100, 1)],
        "q_id long, vec_id long, rank int",
    )
    rel = spark.createDataFrame(
        # q 30 is judged but the system returned NOTHING for it —
        # it must surface as ndcg=0, not vanish (r12 review #3)
        [(10, 101, 3), (10, 102, 1), (10, 999, 2), (30, 500, 2)],
        "q_id long, vec_id long, rel int",
    )
    out = {
        r.q_id: (r.dcg, r.idcg, r.ndcg)
        for r in similarity.ndcg_at_k(ranked, rel, k=3).collect()
    }
    dcg = round(7 / math.log2(3) + 1 / math.log2(4), 6)
    idcg = round(7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4), 6)
    assert out[10] == (dcg, idcg, round(dcg / idcg, 6)), out[10]
    # query 20 has no judgments at all: dcg 0, idcg 0, ndcg NULL
    assert out[20] == (0.0, 0.0, None), out[20]
    # judged-but-unranked query surfaces with ndcg 0 (idcg = 3/log2(2))
    assert out[30] == (0.0, 3.0, 0.0), out[30]


def test_compact_snapshots_preserves_state_and_history(spark, tmp_path):
    """Snapshot compaction invariants: latest state and every as-of
    read at-or-after the horizon are byte-identical before and after;
    expired history raises; a crash-window leftover dir coexisting
    with the base still reads correctly and a re-run heals it."""
    import shutil

    from platypus_ingestion_plugins_spark.sources import cdc_table

    path = str(tmp_path / "log")

    def drop(rows, snap):
        df = spark.createDataFrame(
            rows, "_row_kind string, _seq long, id string, v long"
        )
        cdc_table.write_cdc_snapshot(df, path, snapshot_id=snap)

    drop([("+I", 1, "a", 10), ("+I", 2, "b", 20), ("+I", 3, "d", 40)], 1)
    drop([("+U", 4, "a", 11), ("-D", 5, "d", None)], 2)
    drop([("-D", 6, "b", None), ("+I", 7, "c", 30)], 3)

    def state(snap):
        return {
            r.id: r.v
            for r in cdc_table.read_as_of(spark, path, snap, "id").collect()
        }

    before_2, before_3 = state(2), state(3)
    assert before_2 == {"a": 11, "b": 20} and before_3 == {"a": 11, "c": 30}

    # keep a copy of snapshot 1 to fake the crash-window leftover
    leftover_src = str(tmp_path / "snap1_copy")
    shutil.copytree(f"{path}/_snapshot=1", leftover_src)

    cdc_table.compact_snapshots(spark, path, upto=2, key="id")
    assert state(2) == before_2 and state(3) == before_3
    with pytest.raises(ValueError, match="does not exist"):
        cdc_table.read_as_of(spark, path, 1, "id")
    import os
    assert not os.path.exists(f"{path}/_snapshot=1")
    # the base must carry original max seqs (a later lower-seq write
    # cannot beat history it already lost to)
    base = spark.read.parquet(f"{path}/_snapshot=2")
    assert {
        (r.id, r._seq, r._row_kind)
        for r in base.select("id", "_seq", "_row_kind").collect()
    } == {("a", 4, "+U"), ("b", 2, "+I"), ("d", 5, "-D")}

    # crash window: an expired dir resurfaces next to the base
    shutil.copytree(leftover_src, f"{path}/_snapshot=1")
    assert state(2) == before_2 and state(3) == before_3
    # healing re-run removes it and changes nothing
    cdc_table.compact_snapshots(spark, path, upto=2, key="id")
    assert not os.path.exists(f"{path}/_snapshot=1")
    assert state(2) == before_2 and state(3) == before_3


def test_compact_snapshots_heals_mid_swap_crash(spark, tmp_path):
    """The r12 review's worst window: crash AFTER the live dir was
    parked but BEFORE the base renamed in — _snapshot=<upto> is gone.
    A re-run must restore the original from the park (never promote
    the unknowable staging), then complete the compaction; reads after
    healing equal the pre-crash state."""
    import os
    import shutil

    from platypus_ingestion_plugins_spark.sources import cdc_table

    path = str(tmp_path / "log")

    def drop(rows, snap):
        df = spark.createDataFrame(
            rows, "_row_kind string, _seq long, id string, v long"
        )
        cdc_table.write_cdc_snapshot(df, path, snapshot_id=snap)

    drop([("+I", 1, "a", 10), ("+I", 2, "b", 20)], 1)
    drop([("+U", 3, "a", 11)], 2)
    want = {
        r.id: r.v
        for r in cdc_table.read_as_of(spark, path, 2, "id").collect()
    }

    # simulate the mid-swap crash: park the live dir, leave a
    # half-written staging dir behind
    shutil.move(f"{path}/_snapshot=2", f"{path}/.compact-2.old")
    os.makedirs(f"{path}/.compact-2.staging")
    with open(f"{path}/.compact-2.staging/part-00000.parquet", "wb") as fh:
        fh.write(b"GARBAGE")  # unknowable completeness: must be discarded

    cdc_table.compact_snapshots(spark, path, upto=2, key="id")
    got = {
        r.id: r.v
        for r in cdc_table.read_as_of(spark, path, 2, "id").collect()
    }
    assert got == want == {"a": 11, "b": 20}
    assert not os.path.exists(f"{path}/.compact-2.old")
    assert not os.path.exists(f"{path}/.compact-2.staging")
    assert not os.path.exists(f"{path}/_snapshot=1")  # compaction completed


def test_assemble_and_mojibake(spark):
    """assemble_conversations restores order regardless of input
    partition order (ties impossible via the order key), NULL
    role/content coalesce to ''; fix_mojibake repairs the classic
    round-trips and leaves clean text untouched."""
    from platypus_ingestion_plugins_spark.functions import text as TX
    from platypus_ingestion_plugins_spark.operators import chat

    rows = spark.createDataFrame(
        [
            (1, "assistant", "world", 2),
            (1, "user", "hello", 1),
            (2, None, None, 1),
            (1, "assistant", "!", 3),
        ],
        "sid long, role string, content string, seq long",
    ).repartition(8)
    out = {
        r.group: (r.n_turns, [(t.role, t.content) for t in r.turns])
        for r in chat.assemble_conversations(
            rows, "sid", "role", "content", "seq"
        ).collect()
    }
    assert out[1] == (3, [("user", "hello"), ("assistant", "world"),
                          ("assistant", "!")])
    assert out[2] == (1, [("", "")])

    fixes = spark.createDataFrame(
        [
            (1, "cafÃ© â€œquotedâ€¦ naÃ¯ve Â«xÂ» â€“ 10Â°"),
            (2, "already clean text"),
            (3, None),
        ],
        "i long, t string",
    )
    got = {
        r.i: r.f
        for r in fixes.select("i", TX.fix_mojibake("t").alias("f")).collect()
    }
    assert got[1] == "café “quoted… naïve «x» – 10°", got[1]
    assert got[2] == "already clean text"
    assert got[3] == ""


def test_containment_vs_jaccard_asymmetry(spark):
    """The containment-vs-jaccard point: a short snippet verbatim
    inside a long document scores containment 1.0 while its Jaccard
    stays below any useful threshold; containment is directional
    (source-in-snippet is NOT 1)."""
    long_text = " ".join(f"tok{i}" for i in range(200))
    snippet = " ".join(f"tok{i}" for i in range(10))
    left = spark.createDataFrame([(1, snippet)], "doc_id long, text string")
    right = spark.createDataFrame(
        [(2, long_text), (3, "completely unrelated words here")],
        "doc_id long, text string",
    )
    got = {
        (r.id_l, r.id_r): r.containment
        for r in dedup.containment_join(
            left, right, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert got == {(1, 2): 1.0}, got
    jac = dedup.jaccard_join(
        left, right, "text", "doc_id", threshold=0.5
    ).collect()
    assert jac == []  # jaccard cannot see the quote
    # directionality: the long doc is NOT contained in the snippet
    rev = dedup.containment_join(
        right, left, "text", "doc_id", threshold=0.5
    ).collect()
    assert rev == []


def test_mmr_rerank_skips_null_vectors(spark):
    """A NULL embedding must be excluded up front: with k exceeding
    the valid candidates it would otherwise be picked (NULL score
    sorts last but still wins an empty round) and crash the next
    round's literal build (r13 review #1)."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, None)],
        "vec_id long, embedding array<double>",
    )
    out = similarity.mmr_rerank(emb, [1.0, 0.0], k=3).collect()
    assert sorted(r.vec_id for r in out) == [1, 2], out


def test_recall_at_k_dedups_duplicate_approx_ids(spark):
    """A searcher returning the same id twice must not inflate the
    counts: the joined exact rows would multiply (r13 review #2)."""
    exact = spark.createDataFrame(
        [(0, 1), (0, 2)], "q_id long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 9)], "q_id long, vec_id long"
    )
    r = similarity.recall_at_k(approx, exact, "vec_id", ["q_id"]).collect()[0]
    assert (r.n_exact, r.n_hit, r.recall) == (2, 1, 0.5), r


def test_assemble_conversations_rejects_null_order(spark):
    """NULL order keys make turn order engine-dependent — fail loudly
    (r13 review #3)."""
    from platypus_ingestion_plugins_spark.operators import chat

    df = spark.createDataFrame(
        [(1, "user", "hi", 1), (1, "assistant", "yo", None)],
        "sess long, role string, content string, pos long",
    )
    with pytest.raises(Exception, match="must be non-null"):
        chat.assemble_conversations(
            df, "sess", "role", "content", "pos"
        ).collect()


def test_check_constraints_hand_counted(spark):
    """check_constraints vs hand counts: null policy (NULL never
    violates a range/domain, nullability is not_null's job),
    uniqueness exempting NULLs, FK exempting NULL keys, duplicate
    name / malformed-check validation."""
    from platypus_ingestion_plugins_spark.operators import validate as V

    df = spark.createDataFrame(
        [
            (1, 10.0, "a"),
            (2, -5.0, "b"),
            (2, 200.0, "z"),      # dup key + out-of-range + bad domain
            (None, None, None),   # NULLs: only not_null fires
            (5, 99.0, "a"),
        ],
        "k long, v double, s string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk long")
    out = {
        r.check: (r.violations, r.n_rows, r.passed)
        for r in V.check_constraints(
            df,
            [
                V.not_null("k_not_null", "k"),
                V.in_range("v_range", "v", lo=0.0, hi=100.0),
                V.accepted_values("s_domain", "s", ["a", "b"]),
                V.unique("k_unique", "k"),
                V.references("k_fk", "k", ref, "rk"),
            ],
        ).collect()
    }
    assert out == {
        "k_not_null": (1, 5, False),
        "v_range": (2, 5, False),     # -5 and 200; NULL exempt
        "s_domain": (1, 5, False),    # 'z'; NULL exempt
        "k_unique": (1, 5, False),    # 2 appears twice; NULL exempt
        "k_fk": (1, 5, False),        # 5 not in ref; NULL exempt
    }, out

    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate"):
        V.check_constraints(df, [V.not_null("x", "k"), V.not_null("x", "v")])
    with _pt.raises(ValueError):
        V.check_constraints(df, [])
    with _pt.raises(ValueError):
        V.Check("bad")
    with _pt.raises(ValueError):
        V.in_range("r", "v")


def test_cc_luhn_detection_and_redaction(spark):
    """Luhn-gated card detection: checksum-valid spans (plain, spaced,
    dashed) count and redact; checksum-failing card-shaped digit runs
    are left alone — the precision step a bare regex can't provide."""
    from platypus_ingestion_plugins_spark.functions import pii

    rows = [
        (1, "pay 4539148803436467 now"),            # valid, plain
        (2, "card 4539 1488 0343 6467 on file"),    # valid, spaced
        (3, "4111-1111-1111-1111"),                 # valid, dashed
        (4, "order 1234567890123456 shipped"),      # card-shaped, invalid
        (5, "no digits at all"),
        (6, "two: 4111111111111111 and 4539148803436467"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n, r.scrubbed)
        for r in df.select(
            "doc_id",
            pii.cc_count("text").alias("n"),
            pii.redact_cc("text").alias("scrubbed"),
        ).collect()
    }
    assert out[1] == (1, "pay <CC> now")
    assert out[2] == (1, "card <CC> on file")
    assert out[3] == (1, "<CC>")
    assert out[4] == (0, "order 1234567890123456 shipped")
    assert out[5] == (0, "no digits at all")
    assert out[6] == (2, "two: <CC> and <CC>")

    # NULL text propagates NULL from both (the pii_counts family
    # convention: NULL in, NULL out — callers coalesce per use case)
    nrow = (
        spark.createDataFrame([(7, None)], "doc_id long, text string")
        .select(
            pii.cc_count("text").alias("n"),
            pii.redact_cc("text").alias("scrubbed"),
        )
        .collect()[0]
    )
    assert nrow.n is None and nrow.scrubbed is None


def test_significant_terms_jlh(spark):
    """NEW r14: significant-terms aggregation. JLH = (fg%-bg%)*(fg%/bg%)
    over doc frequencies; per-doc DISTINCT terms; min_doc_count floor;
    (score desc, term) order; NULL foreground = background-only."""
    from platypus_ingestion_plugins_spark.serving.query import (
        significant_terms,
    )

    rows = [
        # 4 foreground docs: 'spark' in all 4, 'data' in 2
        (1, "spark spark fast", True), (2, "spark data", True),
        (3, "spark big data", True), (4, "spark only", True),
        # 6 background docs: 'spark' in 1, 'data' in 3, 'slow' in 6
        (5, "slow data", False), (6, "slow data", False),
        (7, "slow data", False), (8, "slow spark", False),
        (9, "slow stuff", False), (10, "slow stuff", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, fg boolean")
    got = {
        r["term"]: (r["fg_count"], r["bg_count"], r["score"])
        for r in significant_terms(
            df, "text", F.col("fg"), top_n=10, min_doc_count=2
        ).collect()
    }
    # fg total = 4, bg total = 10
    # spark: fg 4/4=1.0, bg 5/10=0.5 -> (0.5)*(2.0) = 1.0
    assert got["spark"] == (4, 5, 1.0)
    # data: fg 2/4=0.5, bg 5/10=0.5 -> 0.0
    assert got["data"] == (2, 5, 0.0)
    # 'fast'/'big'/'only' have fg_count 1 < min_doc_count=2: dropped
    assert "fast" not in got and "only" not in got
    # 'slow' has fg_count 0: dropped by the same floor
    assert "slow" not in got
    # per-doc distinct: doc 1's double 'spark' counts once
    import pytest as _pt

    with _pt.raises(ValueError, match="top_n"):
        significant_terms(df, "text", F.col("fg"), top_n=0)
    with _pt.raises(ValueError, match="min_doc_count"):
        significant_terms(df, "text", F.col("fg"), min_doc_count=0)


def test_event_paths_prefix_and_rank(spark):
    """NEW r14: top user journeys. Prefix cut BEFORE any list
    materializes (max_len), (ts, order_col) determinism, rank by
    (n_users desc, path asc), path_len for short journeys."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        event_paths,
    )

    rows = [
        (1, 1, 101, "view"), (1, 2, 102, "click"), (1, 3, 103, "buy"),
        (2, 1, 201, "view"), (2, 2, 202, "click"), (2, 3, 203, "buy"),
        (3, 1, 301, "view"), (3, 2, 302, "click"),
        (4, 5, 401, "view"),
        # u5: 4 events, max_len=3 cuts the tail
        (5, 1, 501, "view"), (5, 2, 502, "click"), (5, 3, 503, "buy"),
        (5, 4, 504, "return"),
        # u6: tie on ts resolved by event id
        (6, 1, 602, "click"), (6, 1, 601, "view"), (6, 2, 603, "buy"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, et string"
    )
    got = [
        (r["path"], r["n_users"], r["path_len"])
        for r in event_paths(
            df, "user_id", "ts", "et", max_len=3, top_n=10,
            order_col="event_id",
        ).collect()
    ]
    assert got == [
        ("view -> click -> buy", 4, 3),
        ("view", 1, 1),
        ("view -> click", 1, 2),
    ]
    import pytest as _pt

    with _pt.raises(ValueError, match="max_len"):
        event_paths(df, "user_id", "ts", "et", max_len=0)


def test_rate_anomalies_zscore(spark):
    """NEW r14: event-rate anomalies. A spike z-scored against the
    trailing window; young series (< min_history) and zero-variance
    windows never alarm; drops flag with negative z."""
    import datetime as dt

    from platypus_ingestion_plugins_spark.operators.analytics import (
        rate_anomalies,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # 10 steady hours alternating 10/12 events, then an hour with 100
    counts = [10, 12, 10, 12, 10, 12, 10, 12, 10, 12, 100]
    for h, c in enumerate(counts):
        for i in range(c):
            rows.append(("err", base + dt.timedelta(hours=h, seconds=i)))
    # a type too young to alarm (3 hours only)
    for h, c in enumerate([5, 5, 50]):
        for i in range(c):
            rows.append(("young", base + dt.timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "et string, ts timestamp_ntz")
    got = rate_anomalies(
        df, "ts", "et", window_hours=24, z_threshold=3.0, min_history=6
    ).collect()
    assert len(got) == 1 and got[0]["event_type"] == "err"
    r = got[0]
    assert r["cnt"] == 100 and r["mean_prev"] == 11.0
    import statistics

    want_sd = round(statistics.stdev([10, 12] * 5), 6)
    assert r["sd_prev"] == want_sd
    assert r["z"] == round((100 - 11.0) / want_sd, 6)
    import pytest as _pt

    with _pt.raises(ValueError, match="window_hours"):
        rate_anomalies(df, "ts", "et", window_hours=0)


def test_tokenizer_fit_report(spark):
    """NEW r14: per-group tokenizer fit under a frozen merge table —
    compression (chars/token) and character-fallback share computed
    against a hand encode; zero-token docs keep n_docs but NULL
    ratios."""
    from platypus_ingestion_plugins_spark.functions.bpe import (
        encode_word,
        pretokenize,
        tokenizer_fit_report,
    )

    merges = [("l", "o"), ("lo", "w"), ("low", "</w>")]
    rows = [
        (1, "low low", "fit"), (2, "lower", "fit"),
        (3, "zzz qqq", "alien"), (4, "", "alien"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    got = {
        r["group"]: r.asDict()
        for r in tokenizer_fit_report(
            df, "text", "src", "doc_id", merges
        ).collect()
    }
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def enc(text):
        toks = []
        for w in pretokenize(text):
            toks.extend(encode_word(w, ranks))
        return toks

    fit_toks = enc("low low") + enc("lower")
    n_fit = len(fit_toks)
    singles_fit = sum(1 for t in fit_toks if len(t) == 1)
    assert got["fit"]["n_docs"] == 2
    assert got["fit"]["n_tokens"] == n_fit
    assert got["fit"]["n_chars"] == len("low low") + len("lower")
    assert got["fit"]["chars_per_token"] == round(
        got["fit"]["n_chars"] / n_fit, 6)
    assert got["fit"]["single_char_tokens"] == singles_fit
    # the alien group is all character fallbacks + </w> markers
    alien_toks = enc("zzz qqq")
    assert got["alien"]["n_docs"] == 2  # the empty doc still counts
    assert got["alien"]["n_tokens"] == len(alien_toks)
    assert got["alien"]["single_char_tokens"] == sum(
        1 for t in alien_toks if len(t) == 1)
    assert got["alien"]["single_char_rate"] > got["fit"]["single_char_rate"]


def test_attribution_models(spark):
    """NEW r14: multi-touch attribution. All four models on a
    hand-walked fixture; lookback window; order_col tie-breaks;
    touch-free conversions credit nothing."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        attribution,
    )

    rows = [
        # user 1: view@10, click@20, view@30, purchase@40
        (1, 1, 10, "view"), (2, 1, 20, "click"),
        (3, 1, 30, "view"), (4, 1, 40, "purchase"),
        # user 2: click@5, purchase@100 (outside lookback_s=50)
        (5, 2, 5, "click"), (6, 2, 100, "purchase"),
        # user 3: purchase with no touches at all
        (7, 3, 10, "purchase"),
        # user 4: two touches at the SAME ts -> order_col decides
        (8, 4, 10, "click"), (9, 4, 10, "view"), (10, 4, 20, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, t long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("t")))

    def run(model, lookback=None):
        return {
            r["channel"]: (r["credit"], r["share"])
            for r in attribution(
                df, "user_id", "ts", "event_type", "purchase",
                ["click", "view"], model=model, lookback_s=lookback,
                order_col="event_id",
            ).collect()
        }

    # last_touch: u1 -> view@30, u2 -> click@5, u4 -> view (event 9, ties
    # broken by event_id so view@10 is LAST among same-ts touches)
    got = run("last_touch")
    assert got["view"] == (2.0, round(2 / 3, 6)) and got["click"][0] == 1.0
    # first_touch: u1 -> view@10, u2 -> click, u4 -> click (event 8 first)
    got = run("first_touch")
    assert got["view"][0] == 1.0 and got["click"][0] == 2.0
    # linear: u1 1/3 each of (view,click,view) -> view 2/3 click 1/3;
    # u2 click 1.0; u4 0.5/0.5
    got = run("linear")
    assert got["click"] == (round(1 / 3 + 1 + 0.5, 6), round((1/3+1.5)/3, 6))
    assert got["view"][0] == round(2 / 3 + 0.5, 6)
    # position: u1 (n=3) view 0.4 first + 0.4 last, click 0.2 middle
    got = run("position")
    assert got["view"][0] == round(0.8 + 0.5, 6)
    assert got["click"][0] == round(0.2 + 1.0 + 0.5, 6)
    # lookback drops u2's click@5 (100-5 > 50)
    got = run("last_touch", lookback=50)
    assert "click" in got and got["click"][0] == 0.0 or "click" not in got
    import pytest as _pt

    with _pt.raises(ValueError, match="model"):
        attribution(df, "user_id", "ts", "event_type", "purchase",
                    ["click"], model="shapley")
    with _pt.raises(ValueError, match="touch"):
        attribution(df, "user_id", "ts", "event_type", "purchase",
                    ["purchase", "click"])


def test_survival_km_hand_computed(spark):
    """NEW r14: Kaplan-Meier estimator. Classic hand example with
    censoring; terminal d==n point pins survival to exactly 0;
    NULL observed counts as censored."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        survival_km,
    )

    # durations: events at 1 (d=1/n=5), 3 (d=1/n=3), censored at 2, 4;
    # event at 5 (d=1/n=1 -> S=0)
    rows = [(1, 1), (2, 0), (3, 1), (4, None), (5, 1)]
    df = spark.createDataFrame(rows, "duration_s long, observed int")
    got = {r["t"]: r for r in survival_km(df, "duration_s", "observed").collect()}
    assert got[1]["n_risk"] == 5 and got[1]["survival"] == 0.8
    assert got[2]["survival"] == 0.8  # censor-only row: no drop
    # S(3) = 0.8 * (1 - 1/3)
    assert got[3]["n_risk"] == 3 and abs(got[3]["survival"] - 0.8 * 2 / 3) < 1e-6
    assert got[5]["n_risk"] == 1 and got[5]["survival"] == 0.0


def test_user_durations_censoring(spark):
    from platypus_ingestion_plugins_spark.operators.analytics import (
        user_durations,
    )

    rows = [
        (1, 0), (1, 100),     # active span 100s, silent 900s -> observed
        (2, 500), (2, 980),   # last at 980, silent 20s < 100 -> censored
        (3, 1000),            # the edge user: duration 0, censored
    ]
    df = spark.createDataFrame(rows, "user_id long, t long").withColumn(
        "ts", F.timestamp_seconds(F.col("t"))
    )
    got = {r["user"]: (r["duration_s"], r["observed"])
           for r in user_durations(df, "user_id", "ts", 100).collect()}
    assert got[1] == (100, 1)
    assert got[2] == (480, 0)
    assert got[3] == (0, 0)


def test_rfm_segments_tiles(spark):
    """NEW r14: RFM segmentation. Deterministic ntile with custkey
    tie-break; higher score = better on each axis."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        rfm_segments,
    )

    rows = [
        # cust 1: recent, frequent, big spender
        (1, "2024-01-10", 100.0), (1, "2024-01-09", 100.0),
        # cust 2: old single small order
        (2, "2024-01-01", 10.0),
        # cust 3: middling
        (3, "2024-01-05", 50.0),
        # cust 4: recent single mid order
        (4, "2024-01-10", 20.0),
    ]
    df = spark.createDataFrame(rows, "c long, d string, amt double").select(
        "c", F.to_timestamp("d").alias("d"), "amt"
    )
    got = {r["customer"]: r for r in
           rfm_segments(df, "c", "d", "amt", n_tiles=2).collect()}
    assert got[1]["recency_days"] == 0 and got[1]["frequency"] == 2
    assert got[1]["monetary"] == 200.0
    assert got[1]["segment"] == "222"
    assert got[2]["segment"] == "111"
    # r ordering: recency desc (2:9d, 3:5d, 1:0d, 4:0d tie->custkey asc)
    # ntile(2) over 4 rows -> first two rows tile 1: custs 2,3 score 1
    assert got[3]["r_score"] == 1 and got[4]["r_score"] == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="n_tiles"):
        rfm_segments(df, "c", "d", "amt", n_tiles=1)
    with _pt.raises(ValueError, match="mode"):
        rfm_segments(df, "c", "d", "amt", mode="bogus")


def test_rfm_segments_distributed_identical_no_global_sort(spark):
    """NEW r15 (VERDICT r14 task #2): mode='distributed' must produce
    BIT-IDENTICAL scores to the exact global-ntile default — including
    on tie-heavy metrics where approx cut points would diverge — while
    its physical plan contains NO single-partition exchange (the
    scale-killer the exact mode pays)."""
    import random

    from platypus_ingestion_plugins_spark.operators.analytics import (
        rfm_segments,
    )

    rng = random.Random(7)
    rows = [
        (
            c,
            f"2024-01-{rng.randint(1, 28):02d}",
            float(rng.choice([10.0, 10.0, 50.0, 50.0, 200.0])),
        )
        for c in range(1, 301)
        for _ in range(rng.randint(1, 4))
    ]
    df = spark.createDataFrame(rows, "c long, d string, amt double").select(
        "c", F.to_timestamp("d").alias("d"), "amt"
    )
    exact = rfm_segments(df, "c", "d", "amt").orderBy("customer").collect()
    dist = (
        rfm_segments(df, "c", "d", "amt", mode="distributed")
        .orderBy("customer")
        .collect()
    )
    assert exact == dist
    plan = (
        rfm_segments(df, "c", "d", "amt", mode="distributed")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    # the exact default DOES globally sort — the contrast the test pins
    exact_plan = (
        rfm_segments(df, "c", "d", "amt")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" in exact_plan


def test_percolate_registry(spark):
    """NEW r14: reverse search. All-terms default, msm override,
    distinct-terms analysis, empty-terms query matches nothing."""
    from platypus_ingestion_plugins_spark.serving.query import percolate

    docs = spark.createDataFrame(
        [(1, "Spark streaming engine"), (2, "fast spark"), (3, "slow db")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [
            (10, ["spark", "engine"]),
            (11, ["spark"]),
            (12, ["spark", "spark"]),   # dup terms collapse: needs 1 term
            (13, []),                   # matches nothing
            (14, ["db", "missing"]),
        ],
        "qid long, terms array<string>",
    )
    got = {(r["doc_id"], r["qid"]) for r in
           percolate(docs, qs, "text", "doc_id", "qid", "terms").collect()}
    assert got == {(1, 10), (1, 11), (2, 11), (1, 12), (2, 12)}
    # msm=1 turns q14 into an OR: doc 3 has 'db'
    got2 = {(r["doc_id"], r["qid"]) for r in
            percolate(docs, qs, "text", "doc_id", "qid", "terms",
                      minimum_should_match=1).collect()}
    assert (3, 14) in got2 and (1, 10) in got2 and (2, 10) in got2
    import pytest as _pt

    with _pt.raises(ValueError, match="minimum_should_match"):
        percolate(docs, qs, "text", "doc_id", "qid", "terms",
                  minimum_should_match=0)
    # ADVICE r14: msm ABOVE a query's distinct-term count makes that
    # query UNMATCHABLE (ES semantics), not all-terms-required — q11
    # (1 term) and q12 (1 distinct term) must go silent at msm=2,
    # while q10 (2 terms) still matches doc 1
    got3 = {(r["doc_id"], r["qid"]) for r in
            percolate(docs, qs, "text", "doc_id", "qid", "terms",
                      minimum_should_match=2).collect()}
    assert got3 == {(1, 10)}


def test_collapse_topk_groups(spark):
    """NEW r14: field collapsing. Champion per group with group_count,
    tie_break determinism, NULL sort keys last, NULL group own group."""
    from platypus_ingestion_plugins_spark.serving.query import collapse_topk

    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 30),   # champ: id 2 (tie->id)
        (4, "b", 50),
        (5, "c", None), (6, "c", 5),                # NULL ranks last
        (7, None, 40),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score int")
    got = collapse_topk(df, "grp", "score", k=3, tie_break="id").collect()
    assert [(r["id"], r["grp"], r["group_count"]) for r in got] == [
        (4, "b", 1), (7, None, 1), (2, "a", 3)]
    import pytest as _pt

    with _pt.raises(ValueError, match="k"):
        collapse_topk(df, "grp", "score", k=0)
    # ADVICE r14: a caller column named group_count must not be
    # silently overwritten by the output's own group_count
    with _pt.raises(ValueError, match="group_count"):
        collapse_topk(
            df.withColumn("group_count", F.lit(0)), "grp", "score", k=3
        )


def test_tfidf_keywords_scores(spark):
    """NEW r14: per-doc TF-IDF keywords. Smoothed idf, rank ties on
    term asc, min_token_len floor."""
    import math

    from platypus_ingestion_plugins_spark.functions.text import (
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["term"]): (r["tf"], r["score"], r["rank"])
           for r in tfidf_keywords(docs, "text", "doc_id", k=2).collect()}
    idf = lambda dfreq: math.log(4 / (dfreq + 1)) + 1
    assert got[(1, "apple")][0] == 2
    assert abs(got[(1, "apple")][1] - round(2 * idf(1), 6)) < 1e-9
    assert got[(1, "apple")][2] == 1  # 2*ln(2)+2 > 1*ln(4/3)+1
    assert got[(2, "banana")][2] in (1, 2) and len(got) == 6
    import pytest as _pt

    with _pt.raises(ValueError, match="k"):
        tfidf_keywords(docs, "text", "doc_id", k=0)


def test_attribution_numeric_ts_lookback(spark):
    """r14 review: lookback must work on epoch-second numeric ts too
    (the funnel `within` dtype contract — no INTERVAL-on-long
    analysis error)."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        attribution,
    )

    rows = [
        (1, 1, 5, "click"), (2, 1, 100, "purchase"),
        (3, 2, 90, "view"), (4, 2, 100, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string"
    )
    got = {r["channel"]: r["credit"] for r in attribution(
        df, "user_id", "ts", "event_type", "purchase",
        ["click", "view"], model="last_touch", lookback_s=50,
        order_col="event_id",
    ).collect()}
    # user 1's click@5 is outside the 50s window of purchase@100
    assert got == {"view": 1.0}


def test_rouge_n_clipped_overlap(spark):
    """NEW r14: ROUGE-N. Clipped bigram counts, P/R/F1, empty-side
    NULL policy, both-empty rows still reported."""
    from platypus_ingestion_plugins_spark.functions.text import rouge_n

    rows = [
        # ref 'a b c d' bigrams {ab,bc,cd}; cand 'a b c' {ab,bc}
        (1, "a b c d", "a b c"),
        # clipping: cand repeats 'a b' 3x, ref has it once -> overlap 1
        (2, "a b x", "a b a b a b"),
        (3, "", "a b"),          # empty ref: recall NULL
        (4, None, None),         # both empty: 0-gram row, NULL ratios
    ]
    df = spark.createDataFrame(rows, "id long, ref string, cand string")
    got = {r["id"]: r for r in rouge_n(df, "ref", "cand", "id", n=2).collect()}
    r1 = got[1]
    assert (r1["ref_ngrams"], r1["cand_ngrams"], r1["overlap"]) == (3, 2, 2)
    assert r1["precision"] == 1.0 and r1["recall"] == round(2 / 3, 6)
    assert r1["f1"] == round(4 / 5, 6)
    r2 = got[2]
    # cand 'a b a b a b' bigrams: ab,ba,ab,ba,ab -> 5; clip(ab)=1
    assert (r2["ref_ngrams"], r2["cand_ngrams"], r2["overlap"]) == (2, 5, 1)
    assert got[3]["recall"] is None and got[3]["precision"] == 0.0
    assert got[4]["ref_ngrams"] == 0 and got[4]["f1"] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="n must"):
        rouge_n(df, "ref", "cand", "id", n=0)
    # ADVICE r14: duplicate ids would silently merge gram counts
    # across distinct (ref, cand) pairs — they must raise instead
    dup = df.union(df.limit(1))
    with _pt.raises(ValueError, match="duplicate"):
        rouge_n(dup, "ref", "cand", "id", n=2)


def test_char_entropy_stats(spark):
    """NEW r14: char entropy. Hand values: uniform 2 chars -> 1 bit,
    single char -> 0, empty/NULL -> (0, NULL)."""
    import math

    from platypus_ingestion_plugins_spark.functions.text import (
        char_entropy_stats,
    )

    df = spark.createDataFrame(
        [(1, "abab"), (2, "aaaa"), (3, ""), (4, None), (5, "abcd")],
        "id long, text string",
    )
    got = {r["id"]: (r["n_chars"], r["entropy"])
           for r in char_entropy_stats(df, "text", "id").collect()}
    assert got[1] == (4, 1.0)
    assert got[2] == (4, 0.0)
    assert got[3] == (0, None) and got[4] == (0, None)
    assert got[5] == (4, 2.0)


def test_match_phrase_prefix(spark):
    from platypus_ingestion_plugins_spark.serving.query import (
        match_phrase_prefix,
    )

    df = spark.createDataFrame(
        [
            (1, "spark streaming engine"),
            (2, "streaming spark strongly"),  # 'spark str' matches here too
            (3, "sparkly stream"),            # 'spark' must be a whole token
            (4, "spark is streaming"),        # tokens not contiguous
        ],
        "id long, text string",
    )
    hits = {r["id"] for r in
            df.where(match_phrase_prefix("text", "Spark STR")).collect()}
    assert hits == {1, 2}
    # single token degrades to prefix-anywhere
    hits1 = {r["id"] for r in
             df.where(match_phrase_prefix("text", "stream")).collect()}
    assert hits1 == {1, 2, 3, 4}


def test_stats_facet_and_decay(spark):
    from platypus_ingestion_plugins_spark.serving.query import (
        decay_score,
        stats_facet,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), (None, 5.0)],
        "grp string, v double",
    )
    got = {r["bucket"]: (r["n"], r["min"], r["max"], r["sum"], r["avg"])
           for r in stats_facet(df, "v", "grp").collect()}
    assert got["a"] == (2, 1.0, 3.0, 4.0, 2.0)
    assert got["b"] == (1, 10.0, 10.0, 10.0, 10.0)
    assert None not in got
    # decay: value at scale distance must equal `decay` for all fns
    import math

    row = spark.range(1).select(
        *[decay_score(F.lit(100.0), 100.0, 0.5, fn).alias(fn)
          for fn in ("exp", "gauss", "linear")],
        decay_score(F.lit(0.0), 100.0, 0.5, "gauss").alias("at0"),
        decay_score(F.lit(-5.0), 100.0, 0.5, "exp").alias("neg"),
    ).collect()[0]
    for fn in ("exp", "gauss", "linear"):
        assert abs(row[fn] - 0.5) < 1e-9, fn
    assert row["at0"] == 1.0 and row["neg"] == 1.0
    import pytest as _pt

    with _pt.raises(ValueError, match="fn"):
        decay_score(F.lit(1.0), 100.0, 0.5, "step")
    with _pt.raises(ValueError, match="decay"):
        decay_score(F.lit(1.0), 100.0, 1.5)


def test_hourly_counts_merge_replay_and_equality(spark, tmp_path):
    """NEW r14: streaming rate-anomaly state. Two drops == one-shot
    batch answer; epoch-pinned replay folds to exactly-once."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        hourly_counts_merge_into,
        rate_anomalies,
        rate_anomalies_read,
    )

    rows = []
    eid = 0
    # type 'a': mildly varying 4/5/6-per-hour baseline for 9 hours
    # (a FLAT baseline has zero variance and is deliberately
    # suppressed), then a 50-count spike
    for h in range(9):
        for _ in range(4 + (h % 3)):
            rows.append((eid, 3600 * h + 60, "a")); eid += 1
    for _ in range(50):
        rows.append((eid, 3600 * 9 + 60, "a")); eid += 1
    # type 'b': constant 3/hour (flat series never alarms)
    for h in range(10):
        for _ in range(3):
            rows.append((eid, 3600 * h + 120, "b")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, t long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("t")))

    batch_answer = rate_anomalies(
        df, "ts", "event_type", window_hours=6, z_threshold=2.0,
        min_history=3,
    ).collect()
    assert len(batch_answer) == 1 and batch_answer[0]["event_type"] == "a"

    state = str(tmp_path / "hourly")
    lo = df.where(F.col("t") < 3600 * 5)
    hi = df.where(F.col("t") >= 3600 * 5)
    hourly_counts_merge_into(lo, "ts", "event_type", state, batch_id=0)
    hourly_counts_merge_into(hi, "ts", "event_type", state, batch_id=1)
    # replayed batch folds to a no-op
    hourly_counts_merge_into(hi, "ts", "event_type", state, batch_id=1)
    got = rate_anomalies_read(
        spark, state, window_hours=6, z_threshold=2.0, min_history=3
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch_answer))


def test_pagerank_hand_values(spark):
    """NEW r14: weighted PageRank. Hand-checked 3-node chain with a
    dangling node; rank mass conserved; weighted split; parallel-edge
    accumulation."""
    from platypus_ingestion_plugins_spark.operators.graph import pagerank

    # a -> b (w 2), a -> c (w 1), b -> c; c dangling
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0)],
        "s string, d string, w double",
    )
    got = {r["node"]: r["rank"]
           for r in pagerank(edges, "s", "d", "w", iterations=1,
                             damping=0.85).collect()}
    # after 1 round from uniform 1/3: dangle = 1/3 (c);
    # base = 0.15/3 + 0.85*(1/9) per-node dangle share
    base = 0.15 / 3 + 0.85 * (1 / 3) / 3
    assert abs(got["a"] - base) < 1e-6
    assert abs(got["b"] - (base + 0.85 * (1 / 3) * (2 / 3))) < 1e-6
    assert abs(got["c"] - (base + 0.85 * ((1 / 3) / 3 + 1 / 3))) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-5  # mass conserved
    # parallel edges accumulate: a->b twice unweighted == w 2
    e2 = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("a", "c"), ("b", "c")], "s string, d string"
    )
    got2 = {r["node"]: r["rank"]
            for r in pagerank(e2, "s", "d", iterations=1).collect()}
    for k in got:
        assert abs(got[k] - got2[k]) < 1e-6, k
    import pytest as _pt

    with _pt.raises(ValueError, match="iterations"):
        pagerank(edges, "s", "d", iterations=0)
    with _pt.raises(ValueError, match="damping"):
        pagerank(edges, "s", "d", damping=1.0)


def test_fd_violations(spark):
    """NEW r14: FD discovery. Violating groups only; NULL rhs never
    contradicts; NULL lhs groups like a value; composite lhs."""
    from platypus_ingestion_plugins_spark.operators.validate import (
        fd_violations,
    )

    df = spark.createDataFrame(
        [
            ("s1", "en"), ("s1", "de"),           # violation: 2 langs
            ("s2", "en"), ("s2", "en"),           # holds
            ("s3", "en"), ("s3", None),           # NULL rhs: holds
            (None, "en"), (None, "fr"),           # NULL lhs group violates
        ],
        "source string, lang string",
    )
    got = {r["source"]: (r["n_rhs_values"], r["n_rows"])
           for r in fd_violations(df, "source", "lang").collect()}
    assert got == {"s1": (2, 2), None: (2, 2)}
    import pytest as _pt

    with _pt.raises(ValueError, match="lhs"):
        fd_violations(df, [], "lang")
    with _pt.raises(ValueError, match="rhs"):
        fd_violations(df, ["lang"], "lang")


def test_pmi_pairs_hand_values(spark):
    """NEW r14: PMI collocations. Doc-level probabilities, distinct
    terms per doc, unordered pairs, vocab + floor bounds."""
    import math

    from platypus_ingestion_plugins_spark.functions.text import pmi_pairs

    rows = [
        (1, "alpha beta"), (2, "alpha beta"), (3, "alpha beta"),
        (4, "alpha gamma"), (5, "beta delta gamma"), (6, "alpha alpha beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["term_a"], r["term_b"]): (r["n_pair_docs"], r["pmi"])
           for r in pmi_pairs(df, "text", "doc_id", vocab=10,
                              min_pair_docs=2, top_n=10).collect()}
    # alpha in 5 docs, beta in 5, together in 4 (doc 6 counts ONCE)
    n, pmi = got[("alpha", "beta")]
    assert n == 4
    assert abs(pmi - round(math.log(4 * 6 / (5 * 5)), 6)) < 1e-9
    # pairs below the floor drop
    assert ("alpha", "gamma") not in got  # together in 1 doc only
    import pytest as _pt

    with _pt.raises(ValueError, match="vocab"):
        pmi_pairs(df, "text", "doc_id", vocab=1)


def test_r14_review_fixes(spark):
    """r14 review pass: (a) user_durations accepts TIMESTAMP_NTZ
    (Spark 4's parquet default — direct ntz->long cast fails
    analysis); (b) pagerank drops non-positive-weight edges instead of
    dividing a zero out-weight (silent mass leak); (c) rfm NULL
    monetary pins nulls-LAST (the ANSI/DuckDB default) so scores are
    engine-portable."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        rfm_segments,
        user_durations,
    )
    from platypus_ingestion_plugins_spark.operators.graph import pagerank

    # (a) ntz input
    ntz = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
         (2, "2024-01-01 01:00:00")],
        "u long, s string",
    ).select("u", F.to_timestamp_ntz("s").alias("ts"))
    got = {r["user"]: (r["duration_s"], r["observed"])
           for r in user_durations(ntz, "u", "ts", 600).collect()}
    assert got == {1: (600, 1), 2: (0, 0)}

    # (b) node 'a' has only zero-weight out-edges -> dangling, mass
    # conserved; and the zero-weight edge contributes nothing
    e = spark.createDataFrame(
        [("a", "b", 0.0), ("b", "c", 1.0)], "s string, d string, w double"
    )
    ranks = {r["node"]: r["rank"]
             for r in pagerank(e, "s", "d", "w", iterations=2).collect()}
    assert set(ranks) == {"b", "c"}  # 'a' leaves with its only 0-edge
    assert abs(sum(ranks.values()) - 1.0) < 1e-5

    # (c) NULL monetary sorts LAST (lowest tile is a REAL low spender)
    o = spark.createDataFrame(
        [(1, "2024-01-02", None), (2, "2024-01-02", 5.0),
         (3, "2024-01-02", 9.0), (4, "2024-01-02", 1.0)],
        "c long, d string, amt double",
    ).select("c", F.to_timestamp("d").alias("d"), "amt")
    m = {r["customer"]: r["m_score"]
         for r in rfm_segments(o, "c", "d", "amt", n_tiles=2).collect()}
    assert m[1] == 2 and m[4] == 1  # NULL in the top (last) tile


def test_percolate_stream_append_replay(spark, tmp_path):
    """NEW r14: streaming percolation. Two appends == one-shot batch
    percolate; a replayed batch collapses via distinct-on-read."""
    from platypus_ingestion_plugins_spark.serving.query import (
        percolate,
        percolate_stream_append,
        read_alerts,
    )

    docs = spark.createDataFrame(
        [(1, "spark streaming engine"), (2, "fast spark"),
         (3, "slow db"), (4, "spark engine room")],
        "doc_id long, text string",
    )
    qs = spark.createDataFrame(
        [(10, ["spark", "engine"]), (11, ["db"])],
        "qid long, terms array<string>",
    )
    expected = {(r["doc_id"], r["qid"]) for r in
                percolate(docs, qs, "text", "doc_id", "qid", "terms").collect()}
    path = str(tmp_path / "alerts")
    lo = docs.where(F.col("doc_id") <= 2)
    hi = docs.where(F.col("doc_id") > 2)
    percolate_stream_append(lo, qs, "text", "doc_id", "qid", "terms", path)
    percolate_stream_append(hi, qs, "text", "doc_id", "qid", "terms", path)
    # replay the second batch: set semantics absorb it
    percolate_stream_append(hi, qs, "text", "doc_id", "qid", "terms", path)
    got = {(r["doc_id"], r["qid"]) for r in read_alerts(spark, path).collect()}
    assert got == expected and (1, 10) in got and (3, 11) in got


def test_seasonal_rate_anomalies(spark):
    """NEW r14: seasonal anomaly baseline. A quiet-hour spike flags
    against its SAME-HOUR history even when it sits under the daily
    mean; young same-hour series don't alarm."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        seasonal_rate_anomalies,
    )

    rows = []
    eid = 0
    # 9 days: hour 3 gets 2/3/4 rotating (quiet), hour 12 gets 100
    for day in range(9):
        for _ in range(2 + (day % 3)):
            rows.append((eid, 86400 * day + 3 * 3600 + 60, "a")); eid += 1
        for _ in range(100):
            rows.append((eid, 86400 * day + 12 * 3600 + 60, "a")); eid += 1
    # day 9: hour 3 spikes to 30 — way under the daily mean (~100)
    # but 10x its same-hour history
    for _ in range(30):
        rows.append((eid, 86400 * 9 + 3 * 3600 + 60, "a")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, t long, event_type string"
    ).withColumn("ts", F.timestamp_seconds(F.col("t")))
    got = seasonal_rate_anomalies(
        df, "ts", "event_type", window_days=7, z_threshold=3.0,
        min_history=3,
    ).collect()
    assert len(got) == 1 and got[0]["hod"] == 3 and got[0]["cnt"] == 30
    import pytest as _pt

    with _pt.raises(ValueError, match="window_days"):
        seasonal_rate_anomalies(df, "ts", "event_type", window_days=0)


def test_terms_lookup(spark):
    from platypus_ingestion_plugins_spark.serving.query import terms_lookup

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, k string"
    )
    lk = spark.createDataFrame(
        [("a",), ("c",), (None,), ("a",)], "v string"
    )
    got = {r["id"] for r in docs.where(terms_lookup("k", lk, "v")).collect()}
    assert got == {1, 3}
    empty = spark.createDataFrame([], "v string")
    assert docs.where(terms_lookup("k", empty, "v")).count() == 0
    # VERDICT r14 watch #3: the dictionary-sized contract is ENFORCED —
    # a lookup column wider than max_terms raises instead of silently
    # collecting into the driver. lk has 2 DISTINCT non-NULL values
    # (dup 'a' and the NULL don't count): cap 1 raises, cap 2 passes.
    import pytest as _pt

    with _pt.raises(ValueError, match="max_terms"):
        terms_lookup("k", lk, "v", max_terms=1)
    got2 = {r["id"] for r in
            docs.where(terms_lookup("k", lk, "v", max_terms=2)).collect()}
    assert got2 == {1, 3}
    with _pt.raises(ValueError, match="max_terms"):
        terms_lookup("k", lk, "v", max_terms=0)


def test_adjacency_matrix(spark):
    """NEW r14: adjacency-matrix agg. Singleton + sorted-pair keys,
    NULL predicate = no match, empty buckets absent."""
    from platypus_ingestion_plugins_spark.serving.query import (
        adjacency_matrix,
    )

    df = spark.createDataFrame(
        [(1, True, True, False), (2, True, None, False),
         (3, False, True, True), (4, True, True, True)],
        "id long, mobile boolean, churned boolean, eu boolean",
    )
    got = {r["key"]: r["cnt"] for r in adjacency_matrix(
        df,
        {"mobile": F.col("mobile"), "churned": F.col("churned"),
         "eu": F.col("eu")},
    ).collect()}
    assert got["mobile"] == 3 and got["churned"] == 3 and got["eu"] == 2
    assert got["churned&mobile"] == 2          # rows 1, 4 (NULL != match)
    assert got["churned&eu"] == 2 and got["eu&mobile"] == 1
    assert "nosuch" not in got
    import pytest as _pt

    with _pt.raises(ValueError, match="separator"):
        adjacency_matrix(df, {"a&b": F.col("mobile")})
    with _pt.raises(ValueError, match="at least one"):
        adjacency_matrix(df, {})


def test_haversine_and_bounding_box(spark):
    """NEW r15 (VERDICT r14 task #7): geo-distance query. Known
    distances (London-Paris ~343.5 km on the sphere), box pre-filter
    equivalence, NULL coords never match, validation raises."""
    from platypus_ingestion_plugins_spark.operators import geo

    rows = [
        (1, 51.5074, -0.1278),    # London
        (2, 48.8566, 2.3522),     # Paris
        (3, 40.7128, -74.0060),   # New York
        (4, None, None),          # NULL coords
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    d = df.select(
        "id",
        F.round(
            geo.haversine_km(F.col("lat"), F.col("lon"), 51.5074, -0.1278), 1
        ).alias("km"),
    )
    got = {r["id"]: r["km"] for r in d.collect()}
    assert got[1] == 0.0
    assert 340.0 < got[2] < 347.0          # spherical London-Paris
    assert 5550.0 < got[3] < 5600.0        # London-NYC
    assert got[4] is None
    # radius query: 400 km around London -> Paris in, NYC + NULL out
    hits = geo.geo_distance(df, "lat", "lon", 51.5074, -0.1278, 400.0)
    assert {r["id"] for r in hits.collect()} == {1, 2}
    # the box pre-filter is EQUIVALENT to haversine-only (no hit lost
    # at the corner): brute-force check on a lat/lon grid
    grid = spark.createDataFrame(
        [(i, float(la), float(lo))
         for i, (la, lo) in enumerate(
             (la, lo) for la in range(40, 61, 2) for lo in range(-20, 21, 4)
         )],
        "id long, lat double, lon double",
    )
    fast = {r["id"] for r in
            geo.geo_distance(grid, "lat", "lon", 51.5074, -0.1278, 800.0).collect()}
    brute = {r["id"] for r in grid.filter(
        F.round(geo.haversine_km(F.col("lat"), F.col("lon"),
                                 51.5074, -0.1278), 6) <= 800.0).collect()}
    assert fast == brute and fast
    import pytest as _pt

    with _pt.raises(ValueError, match="radius_km"):
        geo.box_for_radius(0.0, 0.0, -1.0)
    with _pt.raises(ValueError, match="latitude"):
        geo.box_for_radius(91.0, 0.0, 10.0)
    with _pt.raises(ValueError, match="antimeridian"):
        geo.bounding_box("lat", "lon", 0.0, 10.0, 170.0, -170.0)
    with _pt.raises(ValueError, match="dist_km"):
        geo.geo_distance(df.withColumn("dist_km", F.lit(0.0)),
                         "lat", "lon", 0.0, 0.0, 1.0)
    # polar / antimeridian boxes widen to the full lon range
    assert geo.box_for_radius(89.5, 0.0, 500.0)[2:] == (-180.0, 180.0)
    assert geo.box_for_radius(0.0, 179.9, 500.0)[2:] == (-180.0, 180.0)


def test_geo_partitioned_read_prunes_files(spark, tmp_path):
    """The geo layout's partition prune: a radius read over a
    write_geo_partitioned table must touch ONLY the cell directories
    its bounding box intersects (input_file_name proof), and return
    exactly the unpartitioned geo_distance answer."""
    import random

    from platypus_ingestion_plugins_spark.operators import geo

    rng = random.Random(11)
    rows = [
        (i, rng.uniform(-80.0, 80.0), rng.uniform(-179.0, 179.0))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    path = str(tmp_path / "geo")
    geo.write_geo_partitioned(df, path, "lat", "lon", cell_deg=15.0)
    pruned = geo.read_geo_pruned(
        spark, path, "lat", "lon", 48.0, 2.0, 900.0, cell_deg=15.0
    )
    want = {
        (r["id"], r["dist_km"])
        for r in geo.geo_distance(df, "lat", "lon", 48.0, 2.0, 900.0).collect()
    }
    assert {(r["id"], r["dist_km"]) for r in pruned.collect()} == want
    # file-level proof: only the box's cells are listed/read
    box = geo.box_for_radius(48.0, 2.0, 900.0)
    cells = set(geo.cells_for_box(*box, cell_deg=15.0))
    touched = {
        r["f"]
        for r in spark.read.parquet(path)
        .filter(F.col(geo.GEO_CELL_COL).isin(list(cells)))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    all_files = {
        r["f"]
        for r in spark.read.parquet(path)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert len(touched) < len(all_files)
    for f in touched:
        cell = int(f.split(f"{geo.GEO_CELL_COL}=")[1].split("/")[0])
        assert cell in cells


def test_lsh_hot_band_bucket_cap(spark):
    """NEW r15 (VERDICT r14 task #6): max_band_bucket drops band
    buckets larger than the cap BEFORE the self-join — a boilerplate
    signature shared by m docs stops contributing m^2/2 candidate
    pairs. Docs in a dropped bucket still pair through their other
    (cold) bands; uncapped behavior is unchanged."""
    rows = (
        # 12 exact copies: every band bucket is hot for this group
        [(i, "the same boilerplate sentence repeated everywhere")
         for i in range(12)]
        # one true near-dup pair with a unique vocabulary
        + [(100, "completely different spark engine shuffle text body"),
           (101, "completely different spark engine shuffle text tail")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = dedup.minhash_signatures(df, "text", "doc_id", n=3, num_hashes=8)
    uncapped = dedup.lsh_candidate_pairs(sig, "doc_id", bands=4)
    capped = dedup.lsh_candidate_pairs(
        sig, "doc_id", bands=4, max_band_bucket=8
    )
    un = {(r["id_a"], r["id_b"]) for r in uncapped.collect()}
    cp = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the 12-copy group saturates every bucket: 66 pairs uncapped,
    # gone under the cap; the cold near-dup pair survives
    assert (100, 101) in un and (100, 101) in cp
    assert len([p for p in un if p[0] < 100]) == 66
    assert not [p for p in cp if p[0] < 100]
    # end-to-end: pairs still verify through the capped path
    got = dedup.minhash_lsh_dedup_pairs(
        df, "text", "doc_id", n=3, threshold=0.5, max_band_bucket=8
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(100, 101)}
    import pytest as _pt

    with _pt.raises(ValueError, match="max_band_bucket"):
        dedup.lsh_candidate_pairs(sig, "doc_id", bands=4, max_band_bucket=1)


def test_geo_grid_counts(spark):
    """NEW r15: geohash_grid-style cell aggregation. Hand-checked cell
    ids/centers on a 90-degree grid, NULL coords ignored, min_count,
    count-desc order."""
    from platypus_ingestion_plugins_spark.operators import geo

    rows = [
        (1, 10.0, 10.0), (2, 20.0, 20.0), (3, 40.0, 40.0),  # same 90° cell
        (4, -50.0, -120.0),
        (5, None, 5.0), (6, 5.0, None),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = geo.geo_grid_counts(df, "lat", "lon", cell_deg=90.0).collect()
    # 90° grid: n_lon=4; (10,10) -> lat_i=1, lon_i=2 -> cell 6,
    # center (45, 45); (-50,-120) -> lat_i=0, lon_i=0 -> cell 0
    assert [(r["cell"], r["center_lat"], r["center_lon"], r["cnt"])
            for r in got] == [(6, 45.0, 45.0, 3), (0, -45.0, -135.0, 1)]
    only_hot = geo.geo_grid_counts(df, "lat", "lon", 90.0, min_count=2)
    assert [r["cell"] for r in only_hot.collect()] == [6]
    import pytest as _pt

    with _pt.raises(ValueError, match="min_count"):
        geo.geo_grid_counts(df, "lat", "lon", 90.0, min_count=0)


def test_stickiness_dau_mau(spark):
    """NEW r15: DAU/MAU. Hand case: Jan has users {a,b} active on 2
    days (DAU 2 then 1 -> avg 1.5), MAU 2 -> stickiness 0.75; dup
    events same day collapse; NULLs drop."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        stickiness,
    )

    rows = [
        ("a", "2024-01-01 10:00:00"), ("a", "2024-01-01 11:00:00"),
        ("b", "2024-01-01 12:00:00"),
        ("a", "2024-01-02 09:00:00"),
        ("c", "2024-02-10 09:00:00"),
        (None, "2024-01-01 10:00:00"), ("d", None),
    ]
    df = spark.createDataFrame(rows, "u string, ts string").select(
        "u", F.to_timestamp("ts").alias("ts")
    )
    got = {str(r["month"])[:7]: r for r in stickiness(df, "u", "ts").collect()}
    jan = got["2024-01"]
    assert jan["mau"] == 2 and jan["avg_dau"] == 1.5
    assert jan["stickiness"] == 0.75
    feb = got["2024-02"]
    assert feb["mau"] == 1 and feb["stickiness"] == 1.0


def test_percentile_ranks_facet(spark):
    """NEW r15: exact percentile_ranks. 10 values 1..10: rank(3)=30%,
    rank(10)=100%, rank(0.5)=0%; NULLs excluded from n; all-NULL ->
    NULL pct."""
    from platypus_ingestion_plugins_spark.serving.query import (
        percentile_ranks_facet,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 11)] + [(None,)], "v double"
    )
    got = {r["value"]: r["pct"]
           for r in percentile_ranks_facet(df, "v", [0.5, 3.0, 10.0]).collect()}
    assert got == {0.5: 0.0, 3.0: 30.0, 10.0: 100.0}
    empty = spark.createDataFrame([(None,), (None,)], "v double")
    assert [r["pct"] for r in
            percentile_ranks_facet(empty, "v", [1.0]).collect()] == [None]
    import pytest as _pt

    with _pt.raises(ValueError, match="at least one"):
        percentile_ranks_facet(df, "v", [])


def test_rare_terms_bucket(spark):
    """NEW r15: rare_terms. Terms in <= max_doc_count docs, (cnt asc,
    term asc) order, per-doc distinct counting (a term twice in one
    doc counts once)."""
    from platypus_ingestion_plugins_spark.serving.query import rare_terms

    df = spark.createDataFrame(
        [
            (1, "common word alpha alpha"),
            (2, "common word beta"),
            (3, "common gamma"),
        ],
        "id long, text string",
    )
    got = [(r["term"], r["cnt"]) for r in rare_terms(df, "text", 1).collect()]
    assert got == [("alpha", 1), ("beta", 1), ("gamma", 1)]
    got2 = [(r["term"], r["cnt"]) for r in rare_terms(df, "text", 2).collect()]
    assert got2 == [("alpha", 1), ("beta", 1), ("gamma", 1), ("word", 2)]
    assert [r["term"] for r in rare_terms(df, "text", 2, top_n=2).collect()] \
        == ["alpha", "beta"]


def test_composite_after_pagination(spark):
    """NEW r15: composite agg. Key-ordered buckets, page size, after
    key resumes EXACTLY where the last page stopped, NULL keys drop,
    pages tile the bucket space with no overlap or gap."""
    from platypus_ingestion_plugins_spark.serving.query import (
        composite_after,
    )

    rows = [
        ("web", "en"), ("web", "en"), ("web", "de"),
        ("crawl", "en"), ("crawl", "fr"), ("books", "en"),
        (None, "en"), ("web", None),
    ]
    df = spark.createDataFrame(rows, "source string, lang string")
    p1 = composite_after(df, ["source", "lang"], size=2)
    rows1 = [(r["source"], r["lang"], r["doc_count"]) for r in p1.collect()]
    assert rows1 == [("books", "en", 1), ("crawl", "en", 1)]
    after = {"source": rows1[-1][0], "lang": rows1[-1][1]}
    p2 = composite_after(df, ["source", "lang"], size=2, after=after)
    rows2 = [(r["source"], r["lang"], r["doc_count"]) for r in p2.collect()]
    assert rows2 == [("crawl", "fr", 1), ("web", "de", 1)]
    after2 = {"source": rows2[-1][0], "lang": rows2[-1][1]}
    p3 = composite_after(df, ["source", "lang"], size=2, after=after2)
    assert [(r["source"], r["lang"], r["doc_count"]) for r in p3.collect()] \
        == [("web", "en", 2)]
    import pytest as _pt

    with _pt.raises(ValueError, match="missing"):
        composite_after(df, ["source", "lang"], after={"source": "web"})
    with _pt.raises(ValueError, match="at least one"):
        composite_after(df, [])


def test_date_histogram_pipeline_aggs(spark):
    """NEW r15: cumulative_sum/derivative/moving_avg pipeline aggs
    over the DENSE grid — a silent day contributes 0 (not a gap),
    first-bucket derivative is NULL, trailing window mean."""
    from platypus_ingestion_plugins_spark.serving.query import (
        date_histogram_pipeline,
    )

    rows = [
        ("2024-01-01 05:00:00",), ("2024-01-01 09:00:00",),
        ("2024-01-02 05:00:00",),
        # Jan 3 silent
        ("2024-01-04 05:00:00",), ("2024-01-04 06:00:00",),
        ("2024-01-04 07:00:00",),
    ]
    df = spark.createDataFrame(rows, "ts string").select(
        F.to_timestamp("ts").alias("ts")
    )
    got = [
        (str(r["bucket"])[:10], r["cnt"], r["cum"], r["deriv"], r["mov_avg"])
        for r in date_histogram_pipeline(df, "ts", "day", window=2).collect()
    ]
    assert got == [
        ("2024-01-01", 2, 2, None, 2.0),
        ("2024-01-02", 1, 3, -1, 1.5),
        ("2024-01-03", 0, 3, -1, 0.5),
        ("2024-01-04", 3, 6, 3, 1.5),
    ]
    import pytest as _pt

    with _pt.raises(ValueError, match="interval"):
        date_histogram_pipeline(df, "ts", "minute")
    with _pt.raises(ValueError, match="window"):
        date_histogram_pipeline(df, "ts", "day", window=0)


def test_late_interaction_maxsim(spark):
    """NEW r15: ColBERT-style MaxSim. Hand case: doc A has a token
    exactly matching each query token (maxsim 2.0); doc B matches one
    and is orthogonal to the other (1.0); top-k order + tie-break."""
    from platypus_ingestion_plugins_spark.operators.similarity import (
        late_interaction_topk,
    )

    dt = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (1, [0.0, 1.0]),
            (2, [1.0, 0.0]), (2, [1.0, 0.0]),
            (3, [-1.0, 0.0]), (3, [0.0, -1.0]),
        ],
        "doc_id long, embedding array<double>",
    )
    qt = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "qpos int, embedding array<double>",
    )
    got = [(r["doc_id"], r["maxsim"])
           for r in late_interaction_topk(dt, qt, k=3, dim=2).collect()]
    # doc 3: each query token's best doc token is the ORTHOGONAL one
    # (max picks 0.0 over -1.0) -> maxsim 0.0, the MaxSim semantics
    assert got == [(1, 2.0), (2, 1.0), (3, 0.0)]
    import pytest as _pt

    with _pt.raises(ValueError, match="k must"):
        late_interaction_topk(dt, qt, k=0)


def test_did_you_mean_suggester(spark, tmp_path):
    """NEW r15: phrase suggester. In-dictionary terms pass through at
    dist 0; a typo corrects to the (dist, df desc, term) winner; an
    unfixable token suggests NULL."""
    from platypus_ingestion_plugins_spark.serving import text_index as TI

    docs = spark.createDataFrame(
        [
            (1, "table scan beats table misuse"),
            (2, "stable tables everywhere"),
            (3, "scan the table"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "didx")
    TI.build_term_index(docs, "text", "doc_id", idx, buckets=8)
    got = {r["pos"]: (r["term"], r["suggestion"], r["dist"])
           for r in TI.did_you_mean(spark, idx, "tabel scna XXXXXXXXXX").collect()}
    # 'tabel' -> 'table' (dist 2 beats 'tables' dist 3... actually
    # levenshtein(tabel, table)=2, (tabel, tables)=3): winner 'table'
    assert got[0] == ("tabel", "table", 2)
    assert got[1] == ("scna", "scan", 2)
    assert got[2][1] is None
    # correctly-spelled frequent terms pass through at dist 0
    got2 = {r["pos"]: (r["suggestion"], r["dist"])
            for r in TI.did_you_mean(spark, idx, "table scan").collect()}
    assert got2 == {0: ("table", 0), 1: ("scan", 0)}
    import pytest as _pt

    with _pt.raises(ValueError, match="empty query"):
        TI.did_you_mean(spark, idx, "!!!")
    with _pt.raises(ValueError, match="max_dist"):
        TI.did_you_mean(spark, idx, "table", max_dist=-1)


def test_diff_in_diff(spark):
    """NEW r15: DiD. Hand case: treated moves 10->25 (+15), control
    10->14 (+4) -> did = 11; NULL values drop; empty cell -> NULL."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        diff_in_diff,
    )

    rows = [
        # (unit, ts, value, treated)
        (1, "2024-01-01", 10.0, True), (1, "2024-02-01", 25.0, True),
        (2, "2024-01-01", 10.0, False), (2, "2024-02-01", 14.0, False),
        (3, "2024-01-01", None, False),
    ]
    df = spark.createDataFrame(
        rows, "unit long, ts string, v double, treated boolean"
    ).select(F.col("unit"), F.to_timestamp("ts").alias("ts"), "v", "treated")
    r = diff_in_diff(
        df, "ts", "v", F.col("treated"), "2024-01-15 00:00:00"
    ).collect()[0]
    assert (r["treat_pre"], r["treat_post"]) == (10.0, 25.0)
    assert (r["control_pre"], r["control_post"]) == (10.0, 14.0)
    assert r["did"] == 11.0
    assert r["n_control_pre"] == 1  # the NULL-value row dropped
    # empty treated-pre cell -> NULL means and NULL estimate
    r2 = diff_in_diff(
        df.where("unit <> 1 OR ts >= '2024-01-15'"),
        "ts", "v", F.col("treated"), "2024-01-15 00:00:00",
    ).collect()[0]
    assert r2["treat_pre"] is None and r2["did"] is None


def test_funnel_latency_hops(spark):
    """NEW r15: per-hop latency distribution. Greedy times: u1
    view@0 click@10 buy@40 (hops 10, 30); u2 view@0 click@30 (hop
    30, never buys); u3 click-only (no hops). Exact p50/p90 over
    {10,30} and {30}."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        funnel_latency,
    )

    rows = [
        ("u1", 0, "view"), ("u1", 10, "click"), ("u1", 40, "buy"),
        ("u2", 0, "view"), ("u2", 30, "click"),
        ("u3", 5, "click"),
    ]
    df = spark.createDataFrame(rows, "u string, ts long, et string")
    got = {r["hop"]: r for r in funnel_latency(
        df, "u", "ts", "et", ["view", "click", "buy"]).collect()}
    vc = got["view->click"]
    assert vc["n_completed"] == 2 and vc["avg_s"] == 20.0
    assert vc["p50_s"] == 20.0 and vc["p90_s"] == 28.0  # interp of {10,30}
    cb = got["click->buy"]
    assert cb["n_completed"] == 1 and cb["p50_s"] == 30.0
    # timestamps route through the epoch cast
    df_ts = df.select("u", F.timestamp_seconds("ts").alias("ts"), "et")
    got2 = {r["hop"]: r["avg_s"] for r in funnel_latency(
        df_ts, "u", "ts", "et", ["view", "click", "buy"]).collect()}
    assert got2["view->click"] == 20.0


def test_classification_report(spark):
    """NEW r15: per-class P/R/F1. Hand case incl. a never-predicted
    class (precision 0, sklearn zero_division=0), a never-gold
    predicted class (support 0), NULL gold drop, NULL pred wrong."""
    from platypus_ingestion_plugins_spark.functions.evals import (
        classification_report,
    )

    rows = [
        ("a", "a"), ("a", "a"), ("a", "b"),
        ("b", "a"),
        ("c", None),
        (None, "a"),
    ]
    df = spark.createDataFrame(rows, "gold string, pred string")
    got = {r["label"]: r for r in
           classification_report(df, "gold", "pred").collect()}
    a = got["a"]
    assert (a["support"], a["tp"]) == (3, 2)
    # 3 predicted 'a' among gold-labeled rows (the NULL-gold row is
    # unlabeled — it can't score against any gold, sklearn's frame)
    assert a["precision"] == round(2 / 3, 6)
    assert a["recall"] == round(2 / 3, 6)
    b = got["b"]
    assert (b["support"], b["tp"], b["precision"], b["recall"]) == (1, 0, 0.0, 0.0)
    c = got["c"]
    assert (c["support"], c["precision"], c["f1"]) == (1, 0.0, 0.0)


def test_calibration_report(spark):
    """NEW r15: reliability bins. Scores 0.05/0.15x2/0.95/1.0 with
    labels -> bin ids, avg score, pos rate, |gap|; 1.0 folds into the
    last bin; NULLs drop."""
    from platypus_ingestion_plugins_spark.functions.evals import (
        calibration_report,
    )

    rows = [
        (0.05, 0), (0.15, 1), (0.15, 0), (0.95, 1), (1.0, 1),
        (None, 1), (0.5, None),
    ]
    df = spark.createDataFrame(rows, "score double, y int")
    got = {r["bin"]: r for r in
           calibration_report(df, "score", "y", n_bins=10).collect()}
    assert set(got) == {0, 1, 9}
    assert got[0]["n"] == 1 and got[0]["pos_rate"] == 0.0
    assert got[1]["n"] == 2 and got[1]["pos_rate"] == 0.5
    assert got[1]["abs_gap"] == round(abs(0.15 - 0.5), 6)
    assert got[9]["n"] == 2 and got[9]["avg_score"] == 0.975
    import pytest as _pt

    with _pt.raises(ValueError, match="n_bins"):
        calibration_report(df, "score", "y", n_bins=1)


def test_knn_classify_majority(spark):
    """NEW r15: kNN label propagation. 3-NN majority with summed-
    cosine tie-break; labeled side broadcast; deterministic."""
    from platypus_ingestion_plugins_spark.functions.evals import (
        knn_classify,
    )

    labeled = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "x"), (2, [0.9, 0.1], "x"),
            (3, [0.0, 1.0], "y"), (4, [0.1, 0.9], "y"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    unlabeled = spark.createDataFrame(
        [(10, [1.0, 0.05]), (11, [0.05, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: (r["label"], r["votes"], r["n_neighbors"])
           for r in knn_classify(labeled, unlabeled, k=3, dim=2).collect()}
    assert got[10] == ("x", 2, 3)
    assert got[11] == ("y", 2, 3)
    import pytest as _pt

    with _pt.raises(ValueError, match="k must"):
        knn_classify(labeled, unlabeled, k=0)


def test_unigram_kl_divergence(spark):
    """NEW r15: smoothed per-term KL contributions. A term enriched
    in A tops the list; a term only in B contributes negatively-or-
    small; smoothing keeps absent terms finite."""
    from platypus_ingestion_plugins_spark.functions.evals import (
        unigram_kl_divergence,
    )

    a = spark.createDataFrame(
        [("spark spark spark engine",), ("spark shuffle",)], "text string"
    )
    b = spark.createDataFrame(
        [("engine shuffle database",), ("database query",)], "text string"
    )
    got = unigram_kl_divergence(a, b, "text", top_n=10).collect()
    terms = [r["term"] for r in got]
    assert terms[0] == "spark"           # most over-represented in A
    by = {r["term"]: r for r in got}
    assert by["spark"]["contrib"] > 0
    assert by["database"]["contrib"] < by["spark"]["contrib"]
    import math

    # replay the top contribution by hand (alpha=0.5, union vocab=5:
    # spark/engine/shuffle/database/query; A: spark=4 of 6 tokens,
    # B: spark=0 of 5)
    p_a = (4 + 0.5) / (6 + 0.5 * 5)
    p_b = (0 + 0.5) / (5 + 0.5 * 5)
    assert by["spark"]["contrib"] == round(p_a * math.log(p_a / p_b), 6)


def test_match_synonyms(spark):
    """NEW r15: query-time synonym expansion. One-hop map, analyzed
    clauses, multi-token synonym rejected."""
    from platypus_ingestion_plugins_spark.functions.evals import (
        match_synonyms,
    )

    docs = spark.createDataFrame(
        [(1, "fast car on the road"), (2, "quick automobile"),
         (3, "slow bicycle")],
        "id long, text string",
    )
    syn = {"car": ["automobile", "auto"], "fast": ["quick"]}
    got = {r["id"] for r in
           docs.filter(match_synonyms("text", "fast car", syn)).collect()}
    assert got == {1, 2}
    # no synonyms: plain OR match
    got2 = {r["id"] for r in
            docs.filter(match_synonyms("text", "bicycle", {})).collect()}
    assert got2 == {3}
    import pytest as _pt

    with _pt.raises(ValueError, match="one term"):
        docs.filter(match_synonyms("text", "car", {"car": ["motor car"]}))


def test_r15_review_regressions(spark, tmp_path):
    """Review-pass pins (r15): (1) match_synonyms on an empty analyzed
    query matches NOTHING (match_text semantics, not match-all);
    (2) rouge_n accepts a lone NULL id (it groups by itself) but
    rejects two NULL ids (they'd merge); (3) expand_prefix analyzes
    its prefix, so punctuation matches the clean form instead of
    silently missing."""
    from platypus_ingestion_plugins_spark.functions.evals import (
        match_synonyms,
    )
    from platypus_ingestion_plugins_spark.functions.text import rouge_n
    from platypus_ingestion_plugins_spark.serving import text_index as TI

    docs = spark.createDataFrame(
        [(1, "spark table scan"), (2, "slow merge")], "id long, text string"
    )
    assert docs.filter(match_synonyms("text", "!!!", {})).count() == 0

    paired = spark.createDataFrame(
        [(1, "a b", "a b"), (None, "c d", "c d")],
        "id long, ref string, cand string",
    )
    # lone NULL id: fine (its clip group is itself)
    assert rouge_n(paired, "ref", "cand", "id", n=1).count() == 2
    two_nulls = paired.union(
        spark.createDataFrame([(None, "e f", "e f")],
                              "id long, ref string, cand string")
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="duplicate"):
        rouge_n(two_nulls, "ref", "cand", "id", n=1)

    idx = str(tmp_path / "pfx")
    TI.build_term_index(docs, "text", "id", idx, buckets=4)
    assert TI.expand_prefix(spark, idx, "Spark,") == ["spark"]
    with _pt.raises(ValueError, match="multi-token"):
        TI.expand_prefix(spark, idx, "table scan")


def test_diff_in_diff_null_treatment_excluded(spark):
    """Review-pass pin (r15, second pass): a NULL treatment flag
    drops the row from BOTH groups (unknown assignment must not
    contaminate control) — matching the oracle's three-valued CASE."""
    from platypus_ingestion_plugins_spark.operators.analytics import (
        diff_in_diff,
    )

    rows = [
        (1, "2024-01-01", 10.0, True), (1, "2024-02-01", 20.0, True),
        (2, "2024-01-01", 10.0, False), (2, "2024-02-01", 12.0, False),
        (3, "2024-01-01", 999.0, None), (3, "2024-02-01", 999.0, None),
    ]
    df = spark.createDataFrame(
        rows, "unit long, ts string, v double, treated boolean"
    ).select("unit", F.to_timestamp("ts").alias("ts"), "v", "treated")
    r = diff_in_diff(
        df, "ts", "v", F.col("treated"), "2024-01-15 00:00:00"
    ).collect()[0]
    assert (r["n_control_pre"], r["n_control_post"]) == (1, 1)
    assert r["control_pre"] == 10.0 and r["control_post"] == 12.0
    assert r["did"] == 8.0


def test_geo_box_filter_pushes_to_scan(spark, tmp_path):
    """The bounding-box pre-filter must reach the parquet scan as
    PushedFilters on a real geo table (min/max row-group skip — the
    reason geo_distance filters with BETWEENs before any trig), and
    the haversine must NOT block column pruning."""
    import io
    import sys as _sys

    from platypus_ingestion_plugins_spark.operators import geo

    df = spark.createDataFrame(
        [(i, float(i % 90), float(i % 180), f"p{i}") for i in range(100)],
        "id long, lat double, lon double, payload string",
    )
    path = str(tmp_path / "geo_plain")
    df.write.parquet(path)
    out = geo.geo_distance(
        spark.read.parquet(path), "lat", "lon", 10.0, 20.0, 500.0
    ).select("id", "dist_km")
    buf = io.StringIO()
    stdout, _sys.stdout = _sys.stdout, buf
    try:
        out.explain("formatted")
    finally:
        _sys.stdout = stdout
    plan = buf.getvalue()
    assert "GreaterThanOrEqual(lat" in plan and "LessThanOrEqual(lon" in plan
    # column pruning: the unused payload column never leaves the scan
    assert "payload" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_soft_dedup_weights(spark):
    """NEW r15: SoftDeDup weighting. Duplicate content gets weight
    1/n_copies (so each distinct content carries equal expected
    sampling mass); uniques keep 1.0; all rows survive."""
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "same text"),
         (4, "unique one")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_copies"], r["weight"])
           for r in dedup.soft_dedup_weights(df, "text", "doc_id").collect()}
    assert got == {1: (3, round(1 / 3, 6)), 2: (3, round(1 / 3, 6)),
                   3: (3, round(1 / 3, 6)), 4: (1, 1.0)}


def test_json_validity_profile(spark):
    """NEW r15: JSON-parseability per source. Valid objects/scalars
    count, garbage and NULL payloads don't; NULL groups drop."""
    rows = [
        ("a", '{"x": 1}'), ("a", "not json"), ("a", None),
        ("b", "[1, 2, 3]"), ("b", '{"y": "z"}'),
        (None, '{"x": 1}'),
    ]
    df = spark.createDataFrame(rows, "src string, payload string")
    got = {r["bucket"]: (r["n"], r["n_valid"], r["valid_rate"])
           for r in TX.json_validity(df, "payload", "src").collect()}
    assert got == {"a": (3, 1, round(1 / 3, 6)), "b": (2, 2, 1.0)}
