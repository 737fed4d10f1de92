"""Property-based CDC semantics (SURVEY §7.4): for ANY interleaved
changelog, split ANY way into ordered micro-batches, the merged serving
state equals a sequential one-row-at-a-time reference model.

This is the per-key ordering risk the reference covers with 17
hand-written scenarios (PaimonRowProcessorTest.java:59-368) — the
property subsumes them: last-wins reduction per batch + idempotent
merge must be equivalent to strict sequential replay."""

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from platypus_ingestion_plugins_spark.operators import cdc
from platypus_ingestion_plugins_spark.session import get_spark

KINDS = ["+I", "+U", "-U", "-D"]


def _model(ops):
    """Sequential reference: replay ops in seq order, one at a time."""
    state = {}
    for seq, key, kind, payload in sorted(ops):
        if kind in ("+I", "+U"):
            state[key] = payload
        elif kind == "-D":
            state.pop(key, None)
        # -U carries no final state
    return state


ops_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key
        st.sampled_from(KINDS),
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=0,
    max_size=30,
)
split_strategy = st.lists(st.integers(min_value=1, max_value=10), min_size=1, max_size=4)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=ops_strategy, splits=split_strategy)
def test_batched_merge_equals_sequential_replay(raw, splits):
    spark = get_spark("tests", shuffle_partitions=4)
    # seq = arrival order (unique, monotone) — the per-bucket total order
    ops = [(i, k, kind, p) for i, (k, kind, p) in enumerate(raw)]
    expected = _model(ops)

    # cut the changelog into ordered batches at the given sizes
    batches, start = [], 0
    for s in splits:
        if start >= len(ops):
            break
        batches.append(ops[start : start + s])
        start += s
    if start < len(ops):
        batches.append(ops[start:])

    target = None
    for batch in batches:
        df = spark.createDataFrame(
            [(seq, key, kind, p) for seq, key, kind, p in batch],
            "_seq long, key long, _row_kind string, payload long",
        )
        target = cdc.apply_changelog(df, "key", target=target)
    got = (
        {}
        if target is None
        else {r.key: r.payload for r in target.collect()}
    )
    assert got == expected


# --- distributed BPE training property (NEW r13 continuation) ---
# Adversarial shape: tiny alphabets maximize pair-count TIES (the
# tie-break rule is where a distributed argmax can silently diverge
# from the driver trainer) and repeated letters maximize overlapping
# runs (where greedy-leftmost apply differs from any other policy).
_bpe_word = st.text(alphabet="abc", min_size=1, max_size=5)
_bpe_texts = st.lists(
    st.lists(_bpe_word, min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_bpe_texts, n_merges=st.integers(min_value=1, max_value=12))
def test_bpe_train_property_equals_driver(texts, n_merges):
    # n_merges up to 12 over a 3-letter alphabet forces multi-pair
    # batches through _select_merge_batch's interaction guards
    # (shared symbols, concat == existing symbol, new-pair bounds) —
    # the r14 batched trainer must stay merge-for-merge equal to the
    # sequential driver trainer
    from platypus_ingestion_plugins_spark.functions.bpe import (
        bpe_train,
        learn_bpe,
    )

    spark = get_spark("tests", shuffle_partitions=4)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert bpe_train(df, "text", n_merges) == learn_bpe(texts, n_merges)


def test_select_merge_batch_is_sequential_prefix():
    """Pure-driver property sweep of the batch selector: on hundreds
    of random corpora the batched trainer's SELECTION must equal the
    sequential trainer's next-k merges for the batch it claims. Runs
    learn_bpe as ground truth and replays _select_merge_batch over
    the same pair tables — no Spark needed, so the sweep is wide."""
    import random

    from platypus_ingestion_plugins_spark.functions.bpe import (
        _EOW,
        _select_merge_batch,
        learn_bpe,
    )
    from collections import Counter

    rng = random.Random(14)
    for trial in range(300):
        n_words = rng.randint(1, 8)
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(n_words)
        ]
        texts = [" ".join(rng.choices(words, k=rng.randint(1, 10)))]
        want = learn_bpe(texts, 12)
        # replay: walk the sequential vocab, at each state ask the
        # selector for a batch and check it prefixes `want`
        vocab: Counter = Counter()
        for t in texts:
            for w in t.split():
                vocab[tuple(list(w) + [_EOW])] += 1
        got: list = []
        while len(got) < len(want):
            pairs: Counter = Counter()
            for sym, cnt in vocab.items():
                for a, b in zip(sym, sym[1:]):
                    pairs[(a, b)] += cnt
            if not pairs:
                break
            rows = [
                {"a": a, "b": b, "c": c} for (a, b), c in pairs.items()
            ]
            rows.sort(key=lambda r: (r["c"], (r["a"], r["b"])), reverse=True)
            batch = _select_merge_batch(rows, budget=12 - len(got))
            assert batch == want[len(got): len(got) + len(batch)], (
                trial, texts, got, batch, want)
            # apply the batch sequentially (ground-truth application)
            for pair in batch:
                merged = pair[0] + pair[1]
                nv: Counter = Counter()
                for sym, cnt in vocab.items():
                    out, i = [], 0
                    while i < len(sym):
                        if (i + 1 < len(sym) and sym[i] == pair[0]
                                and sym[i + 1] == pair[1]):
                            out.append(merged)
                            i += 2
                        else:
                            out.append(sym[i])
                            i += 1
                    nv[tuple(out)] += cnt
                vocab = nv
            got.extend(batch)
        assert got == want[: len(got)]
