"""Byte-pair-encoding tokenization — REAL subword token counts for
budget selection, packing and datasheet numbers (the 4-chars-per-token
estimate in ``text.subword_count_estimate`` is a heuristic; training
budgets are accounted in actual tokenizer tokens).

Format: the classic Sennrich et al. 2016 word-internal BPE —
pretokenize to words + punctuation marks, append the ``</w>``
end-of-word marker, then greedily apply a learned merge list in rank
order. ``load_merges_txt`` reads the standard one-merge-per-line
``merges.txt`` shipped with published tokenizers, which is the
production path: the merge table is MODEL-SIZED (30-50k rows),
broadcast once, applied corpus-wide in an Arrow-batched UDF (there is
no builtin subword operator to compose from — this is the documented
slow-path exception, with a per-batch word cache so the per-DISTINCT-
word cost, not the per-occurrence cost, dominates; zipf makes that
cache hit ~95%+ on natural text).

``learn_bpe`` is a driver-side trainer for samples/tests (pure
Python, deterministic: ties on pair count break lexicographically).
``bpe_train`` is the same algorithm distributed: one corpus scan
builds the distinct-word histogram, then every merge round runs on
the vocabulary table only (pair-count groupBy + 1-row argmax collect
+ pure-codegen replace) — the path for training over a corpus too
large to sample to one machine's comfort, while published-table
APPLICATION stays the hot path (``bpe_encode``).
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PRETOKEN_RX = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_EOW = "</w>"


def pretokenize(text: str) -> list[str]:
    """Words + standalone punctuation marks, case-preserved (BPE
    vocabularies are case-sensitive)."""
    return _PRETOKEN_RX.findall(text or "")


def learn_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side BPE training on a sample: count words, then
    ``n_merges`` rounds of merge-the-most-frequent-adjacent-pair
    (ties break on the pair itself, so the merge list is a pure
    function of the sample). Returns the ranked merge list."""
    vocab: Counter = Counter()
    for t in texts:
        for w in pretokenize(t):
            vocab[tuple(list(w) + [_EOW])] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # deterministic: max count, ties broken on the lexicographically
        # greatest pair — any FIXED rule works, it just has to be one
        top = max(pairs.values())
        pair = max(p for p, c in pairs.items() if c == top)
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_vocab: Counter = Counter()
        for sym, cnt in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == pair[0]
                    and sym[i + 1] == pair[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


_STX, _ETX = "\x02", "\x03"


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    *,
    min_word_freq: int = 1,
) -> list[tuple[str, str]]:
    """Distributed BPE training: the Sennrich et al. 2016 trainer
    re-expressed for Spark, byte-for-byte equivalent to ``learn_bpe``
    on ASCII corpora (unit-pinned).

    Shape at scale: the corpus is scanned ONCE to build the
    distinct-word/frequency vocabulary (the only corpus-sized stage —
    a partial-aggregatable groupBy). Every merge round then runs on
    the VOCAB table only (zipf-bounded: distinct words, not
    occurrences): one pair-count groupBy, one 1-row argmax collect
    (driver-bounded by construction, the kmeans-centroids pattern),
    and one pure-codegen ``replace`` applying the merge. No UDF
    anywhere — the word is held as the fully-wrapped
    ``STX·sym·ETX`` representation the ``bpe_token_count`` oracle
    replay already uses, so adjacent replace matches share no
    characters and left-to-right non-overlapping ``replace`` IS the
    leftmost-greedy merge pass of ``learn_bpe`` (the fold never
    re-merges the token it just produced: ``a+b != a`` for non-empty
    ``b``).

    Determinism: ties on pair count break on the lexicographically
    greatest ``(left, right)`` pair — ``ORDER BY c DESC, a DESC,
    b DESC`` equals Python tuple-max because tuple comparison is
    first-element-then-second. Pretokenization runs JVM-side
    (``regexp_extract_all`` with the same ``\\w+|[^\\w\\s]`` the
    DuckDB replay uses — both ASCII ``\\w``; Python's ``re.UNICODE``
    in ``pretokenize`` differs only on non-ASCII word characters,
    so the ``learn_bpe`` equivalence is pinned on ASCII text). STX/ETX
    control characters are stripped from the input first (both engines
    alike) so text can never collide with the wrapping."""
    spark = df.sparkSession  # noqa: F841  (documents the session scope)
    words = df.select(
        F.explode(
            F.regexp_extract_all(
                F.translate(
                    F.coalesce(F.col(text_col), F.lit("")), _STX + _ETX, ""
                ),
                F.lit(r"\w+|[^\w\s]"),
                F.lit(0),
            )
        ).alias("w")
    )
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= F.lit(min_word_freq))
        .select(
            F.concat(
                F.regexp_replace("w", "(.)", _STX + "$1" + _ETX),
                F.lit(_STX + _EOW + _ETX),
            ).alias("rep"),
            "freq",
        )
        .persist()
    )
    # no eager materialization: the first round's pair-count collect
    # populates the cache while doing useful work (one corpus-sized
    # job instead of two)
    pair_expr = F.explode(
        F.expr(
            "transform(slice(toks, 1, size(toks)-1),"
            " (x, i) -> struct(x AS a, element_at(toks, i+2) AS b))"
        )
    )
    toks_expr = F.expr(
        "transform(filter(split(rep, '\\u0003'), x -> x != ''),"
        " x -> substring(x, 2))"
    )
    merges: list[tuple[str, str]] = []
    base = vocab  # the only .persist() — released in finally; later
    # rounds are localCheckpoint frames the ContextCleaner reclaims
    try:
        while len(merges) < n_merges:
            # the FULL pair-count table, not just the argmax: it is
            # vocab-pair-sized (zipf-bounded, distinct adjacent symbol
            # pairs of distinct words) and holding it driver-side lets
            # one scan commit a BATCH of merges — a 32k-merge
            # production vocabulary as ~32k/batch scans instead of 32k
            # sequential Spark jobs (r13 advice: scheduling, not data,
            # dominated the per-merge loop)
            table = (
                vocab.withColumn("toks", toks_expr)
                .select("freq", pair_expr.alias("p"))
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("freq").alias("c"))
                .collect()
            )
            if not table:
                break
            rows = sorted(
                table, key=lambda r: (r["c"], (r["a"], r["b"])), reverse=True
            )
            chosen = _select_merge_batch(
                rows, budget=min(n_merges - len(merges), 64)
            )
            rep = F.col("rep")
            for a, b in chosen:
                # symbol-disjoint by construction, so the chained
                # replaces can't interfere (no pattern matches across
                # another merge's output)
                rep = F.replace(
                    rep,
                    F.lit(_STX + a + _ETX + _STX + b + _ETX),
                    F.lit(_STX + a + b + _ETX),
                )
            # lazy localCheckpoint, not persist: caching keeps the
            # FULL logical plan (analysis re-walks k nested rounds
            # every round — measured superlinear past ~15 merges,
            # minutes at 40); the checkpoint truncates the plan to a
            # LogicalRDD, so every round plans over depth-1 lineage.
            # eager=False defers materialization to the next round's
            # pair-count collect — still ONE job per round. Storage is
            # vocab-sized; the ContextCleaner reclaims prior rounds.
            vocab = vocab.withColumn("rep", rep).localCheckpoint(eager=False)
            merges.extend(chosen)
    finally:
        base.unpersist()
    return merges


def _select_merge_batch(
    rows: list, budget: int
) -> list[tuple[str, str]]:
    """The maximal prefix of the (count desc, pair desc)-sorted pair
    table that provably commits in ONE pass with the exact result of
    that many SEQUENTIAL merge rounds. Pair j joins the batch iff:

    - its symbols (and its concatenation) are disjoint from every
      earlier batch member's symbols AND concatenations — merging
      (a,b) only changes counts of pairs touching a, b, or the new
      symbol ab, so disjoint pairs keep their exact counts;
    - its count strictly exceeds every possible NEW pair's count: a
      new pair (x, ab) occupies a subset of the old (x, a) sites and
      of the (a, b) sites, so it is bounded by
      min(c_i, max(maxcount(*, a_i), maxcount(b_i, *))) — strict,
      because a tying new pair could win the lexicographic tie-break;
    - its concatenation is not an EXISTING symbol: merging would mint
      more tokens of that symbol and INFLATE existing pair counts
      (the one case where counts can rise), so such a merge commits
      alone, exactly like the sequential trainer.

    Every decrease elsewhere is harmless: the sorted prefix already
    outranks all original pairs after it. Equivalence to the
    one-merge-per-scan trainer is property-tested against
    ``learn_bpe``."""
    symbols: set[str] = set()
    maxc_left: dict[str, int] = {}
    maxc_right: dict[str, int] = {}
    for r in rows:
        a, b, c = r["a"], r["b"], r["c"]
        symbols.add(a)
        symbols.add(b)
        if c > maxc_left.get(a, 0):
            maxc_left[a] = c
        if c > maxc_right.get(b, 0):
            maxc_right[b] = c
    chosen: list[tuple[str, str]] = []
    used: set[str] = set()
    max_new_bound = 0
    for r in rows:
        a, b, c = r["a"], r["b"], r["c"]
        concat = a + b
        if chosen and (
            a in used
            or b in used
            or concat in used
            or c <= max_new_bound
            or concat in symbols
        ):
            break
        chosen.append((a, b))
        if concat in symbols:
            break  # inflating merge: commit alone (first pick only)
        used.update((a, b, concat))
        bound = min(c, max(maxc_right.get(a, 0), maxc_left.get(b, 0)))
        max_new_bound = max(max_new_bound, bound)
        if len(chosen) >= budget:
            break
    return chosen


def chunk_text_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
    max_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Token-budgeted RAG chunking: windows of ``max_tokens`` REAL
    BPE tokens with ``overlap`` tokens of context carry-over — the
    retrieval-chunking contract embedding models actually have (a
    token budget), where ``text.chunk_text``'s character windows only
    approximate it. Chunks start every ``stride = max_tokens -
    overlap`` tokens, so chunk k holds tokens [k·stride, k·stride +
    max_tokens); the final partial window is kept (standard RAG
    practice — dropping it loses the document tail).

    ``chunk`` is the detokenized window: concatenated symbols with
    the ``</w>`` end-of-word markers becoming spaces — i.e.
    whitespace-NORMALIZED text (pretokenization discards the original
    spacing; punctuation detaches: 'low-key' -> 'low - key'),
    documented like the analyzer's other normalizations. Marker
    collision caveat: if the merge table ever LEARNS the 4-symbol
    chain '<'+'/'+'w'+'>' from text that literally contains "</w>",
    that content token detokenizes to a space too — the classic BPE
    marker ambiguity, affecting display text only (token counts and
    windows are exact either way). Documents with no tokens yield no
    chunks.

    One Arrow-batched encode (``bpe_encode`` — the module's
    documented slow-path exception) + pure codegen windowing
    (sequence/slice/explode): chunk fan-out is token-budget-bounded
    per row, never a shuffle."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if overlap < 0 or overlap >= max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    stride = max_tokens - overlap
    enc = bpe_encode(df, text_col, id_col, merges)
    # a window starting at s adds new tokens iff the previous window
    # didn't already reach the document end: prev covered through
    # (s - stride) + max_tokens - 1 >= n  <=>  s > n - overlap — so
    # keep s = 1 (there's always a first chunk) or s <= n - overlap,
    # suppressing trailing windows fully contained in their
    # predecessor (the standard splitter stop rule)
    win = F.expr(
        f"transform("
        f"  filter(sequence(1, size(tokens), {stride}),"
        f"         s -> s = 1 OR s <= size(tokens) - {overlap}),"
        f" s -> struct(CAST((s - 1) DIV {stride} AS INT) AS chunk_id,"
        f"             slice(tokens, s, {max_tokens}) AS toks))"
    )
    out = (
        enc.where(F.col("n_bpe_tokens") > 0)
        .select(F.col(id_col), F.explode(win).alias("w"))
        .select(
            id_col,
            F.col("w.chunk_id").alias("chunk_id"),
            F.size("w.toks").cast("long").alias("n_tokens"),
            F.rtrim(
                F.replace(
                    F.array_join(F.col("w.toks"), ""),
                    F.lit(_EOW),
                    F.lit(" "),
                )
            ).alias("chunk"),
        )
    )
    return out


def load_merges_txt(path: str) -> list[tuple[str, str]]:
    """Parse the standard ``merges.txt`` (one ``left right`` pair per
    line) — the artifact published tokenizers ship. Only a FIRST-LINE
    ``#version`` header is skipped: published merge tables contain
    real merges whose left symbol is ``#`` (``# #``, ``## #`` — code
    text), so a skip-all-comment-lines rule silently drops them and
    mistokenizes every document containing ``#`` (r11 review 2nd
    pass #2). Line endings strip ``\\r`` too — a CRLF-saved file
    would otherwise corrupt every right-hand symbol."""
    merges = []
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\r\n")
            if not line:
                continue
            if i == 0 and line.startswith("#version"):
                continue
            a, _, b = line.partition(" ")
            if not b and "\t" not in line:
                continue
            if not b or " " in b or "\t" in line or b != b.rstrip():
                # trailing spaces/tabs would survive into the
                # right-hand symbol ('a b ' -> ('a','b ')) and that
                # merge would silently never apply; a second interior
                # space means >2 symbols — both are the same
                # silent-mistokenization class the #version/CRLF
                # handling guards against (r12 advice #4), so reject
                # loudly instead of loading a merge that can't fire.
                raise ValueError(
                    f"{path}:{i + 1}: malformed merge line "
                    f"{line!r} — expected exactly 'left right' with "
                    "no extra whitespace"
                )
            merges.append((a, b))
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word: repeatedly merge the LOWEST-RANK
    adjacent pair until none applies (the standard BPE apply loop)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i: best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """(id, tokens array<string>, n_bpe_tokens) under the merge list.

    Arrow-batched ``mapInPandas`` with the rank table captured in the
    closure (model-sized — serialized once per task, not per row) and
    a per-batch distinct-word cache, so cost tracks unique words. The
    ``</w>`` marker stays attached to word-final symbols, matching
    the merges.txt convention."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # the id field keeps the INPUT's type (string/UUID document ids are
    # as legitimate as longs — hard-coding `long` here broke the Arrow
    # batch conversion for them, r13 advice #4)
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, tokens array<string>, n_bpe_tokens long"

    def run(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(text):
            toks: list[str] = []
            for w in pretokenize(text or ""):
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = [enc(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_bpe_tokens": [len(t) for t in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def tokenizer_fit_report(
    df: DataFrame,
    text_col: str,
    group_col: str,
    id_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Per-group tokenizer FIT datasheet under a frozen merge table:
    the go/no-go numbers for reusing a tokenizer on a new corpus
    slice — (group, n_docs, n_tokens, n_chars, chars_per_token,
    single_char_tokens, single_char_rate). ``chars_per_token``
    (compression) drops and ``single_char_rate`` (character-fallback
    share: tokens the merge table couldn't grow past one character)
    rises on text the vocabulary wasn't trained for — the standard
    domain-shift signals.

    One Arrow-batched ``bpe_encode`` pass (the module's documented
    slow-path exception) + a row-local singles count + one
    partial-aggregatable groupBy; output is group-count-sized. Ratios
    6dp-rounded; a group with zero tokens reports NULL ratios
    (0-token docs still count toward n_docs)."""
    enc = bpe_encode(df, text_col, id_col, merges).select(
        id_col,
        F.col("n_bpe_tokens"),
        F.size(F.filter("tokens", lambda t: F.length(t) == 1)).alias(
            "__singles"
        ),
    )
    base = df.select(
        id_col,
        F.col(group_col).alias("group"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("__chars"),
    )
    per_group = (
        base.join(enc, id_col)
        .groupBy("group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("long").alias("n_tokens"),
            F.sum("__chars").cast("long").alias("n_chars"),
            F.sum("__singles").cast("long").alias("single_char_tokens"),
        )
    )
    nz = F.when(F.col("n_tokens") > 0, F.col("n_tokens"))
    return per_group.select(
        "group",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_chars") / nz, 6).alias("chars_per_token"),
        "single_char_tokens",
        F.round(F.col("single_char_tokens") / nz, 6).alias(
            "single_char_rate"
        ),
    )
