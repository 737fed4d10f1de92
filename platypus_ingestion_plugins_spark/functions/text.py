"""Text-analysis functions for large-scale training-data pipelines.

All pure Catalyst expressions (no UDFs): language-ID heuristic, quality
scoring, token counting, document fingerprinting. Each is a column
expression factory so it composes into any plan and stays inside
whole-stage codegen at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny public stopword lists for the n-gram/stopword language heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace/punctuation tokenization, lowercased, no empty tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\W+"), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def subword_count_estimate(col: Column | str) -> Column:
    """BPE-ish token estimate: ~4 chars per subword token (the public
    rule-of-thumb for byte-pair encodings)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.ceil(F.length(c) / F.lit(4.0)).cast("long")


def stopword_hits(col: Column | str, lang: str = "en") -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda t: t.isin(words)))


def language_id(col: Column | str) -> Column:
    """Stopword-overlap language heuristic: argmax of per-language
    stopword hit counts; 'und' (undetermined) when no list hits."""
    scores = [(lang, stopword_hits(col, lang)) for lang in STOPWORDS]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reverse order so earlier languages win ties deterministically
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# UTF-8-bytes-read-as-cp1252 mojibake ("Ã©" where the author wrote
# "é") — the single most common encoding damage in web crawls. The
# pair table is GENERATED from the encoding round-trip itself rather
# than hand-typed (one source of truth the oracle SQL builds from the
# same constant), covering Western-European accents, the euro sign,
# curly quotes/dashes/ellipsis, guillemets, the degree sign and NBSP.
# Longest patterns first so a 3-byte sequence is never half-eaten by
# a 2-byte rule.
_MOJIBAKE_TARGETS = (
    "áàâäãåéèêëíìîïóòôöõúùûüñçýÿÁÀÂÄÅÉÈÊËÍÎÓÔÖÕÚÜÑÇßæœ€‘’“”–—…«»° "
)


def _mojibake_pairs() -> list[tuple[str, str]]:
    pairs = []
    for ch in _MOJIBAKE_TARGETS:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue  # cp1252 holes (0x81/8D/8F/90/9D) never decode
        pairs.append((moji, ch))
    return sorted(pairs, key=lambda p: -len(p[0]))


MOJIBAKE_PAIRS = _mojibake_pairs()


def fix_mojibake(col: Column | str) -> Column:
    """Repair cp1252-misdecoded UTF-8 ('caf' + 'Ã©' -> 'café'): one
    bounded replace chain over ``MOJIBAKE_PAIRS`` — map-only codegen,
    no regex, engine-replayable byte-for-byte. Text without mojibake
    passes through untouched except the pathological case of a
    document that LEGITIMATELY contains these exact two/three-char
    sequences ('Ã' followed by a combining symbol), which is
    vanishingly rare in real prose precisely because the sequences
    are what broken decoding produces."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    for moji, ch in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(moji), F.lit(ch))
    return c


def html_to_text(col: Column | str) -> Column:
    """Web-page payload -> training text — the extraction step every
    web-crawl corpus (C4, CCNet, RefinedWeb) runs before any quality
    or dedup operator sees the document:

    1. drop <script>/<style> ELEMENTS with their contents and HTML
       comments (their text is code, not prose),
    2. strip remaining tags to a space (block boundaries must not
       glue words together),
    3. decode the five ubiquitous entities (&lt; &gt; &quot; &#39;
       &nbsp;) and LAST &amp; — last so '&amp;lt;' decodes to the
       literal '&lt;' the author wrote, not to '<',
    4. collapse whitespace runs and trim.

    Pure regexp_replace chain — codegen, map-only, no parser
    dependency. Deliberately RE2-compatible (non-greedy dot-all, no
    backreferences or lookaround: script/style each get their own
    pattern), so an external engine replays the exact byte output.
    Entity decode AFTER tag strip is the correct order: text that
    spelled '&lt;b&gt;' renders as literal '<b>', never as markup."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&nbsp;", " "),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.replace(c, F.lit("&amp;"), F.lit("&"))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# Writing-system character classes by Unicode BMP range. BMP-only on
# purpose: Spark's length() counts UTF-16 code units and DuckDB's
# counts code points — they agree exactly on BMP text, so every count
# below is engine-reproducible (astral-plane scripts would need a
# codepoint-length convention first).
SCRIPT_RANGES = {
    "cyrillic": "Ѐ-ӿ",
    "devanagari": "ऀ-ॿ",
    "greek": "Ͱ-Ͽ",
    # Latin-1 letters EXCLUDE U+00D7 x and U+00F7 ÷ — the two math
    # signs sitting inside the accented-letter block; counting them as
    # latin would make a math-notation-only doc read as latin-dominant
    # (r12 review #4)
    "latin": "A-Za-zÀ-ÖØ-öø-ɏ",
}


def script_counts(col: Column | str) -> dict[str, Column]:
    """Per-script character counts (named Columns): how many chars of
    the text fall in each ``SCRIPT_RANGES`` class, plus ``digit``.
    Count = length(text) - length(class chars removed) via one
    regexp_replace per class — pure codegen, no tokenization, which is
    the point: script ID must work on text that has no word
    boundaries (CJK, Devanagari) where the stopword ``language_id``
    heuristic is blind."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    out = {
        name: F.length(F.regexp_replace(c, f"[^{rng}]", "")).alias(name)
        for name, rng in SCRIPT_RANGES.items()
    }
    out["digit"] = F.length(F.regexp_replace(c, "[^0-9]", "")).alias("digit")
    return out


def dominant_script(
    col: Column | str, counts: dict[str, Column] | None = None
) -> Column:
    """The writing system with the most characters — 'und' when no
    script char occurs. Ties break to the alphabetically-first script
    (a strictly-greater fold in alphabetical order, which an external
    engine replays as a greatest() + first-match CASE chain).

    Callers also selecting ``script_counts`` should pass that dict as
    ``counts`` so each per-script regexp scan appears once in the
    projection by construction instead of leaning on Catalyst
    subexpression elimination (r12 review #6)."""
    counts = counts if counts is not None else script_counts(col)
    best = F.struct(
        F.lit(0).alias("c"), F.lit("und").alias("s")
    )
    for name in sorted(SCRIPT_RANGES):
        cnt = counts[name]
        best = F.when(
            cnt > best["c"],
            F.struct(cnt.alias("c"), F.lit(name).alias("s")),
        ).otherwise(best)
    return best["s"]


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic in [0,1]:
    length band + mean token length band + alpha ratio.

    Deterministic integer/char arithmetic only, so an external SQL
    oracle reproduces it bit-for-bit."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_toks = token_count(c)
    alpha_chars = F.length(F.regexp_replace(c, r"[^a-zA-Z]", ""))
    mean_tok = n_chars.cast("double") / F.greatest(n_toks, F.lit(1)).cast("double")
    len_ok = F.when((n_chars >= 100) & (n_chars <= 20000), F.lit(1.0)).otherwise(F.lit(0.0))
    tok_ok = F.when((mean_tok >= 3.0) & (mean_tok <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    alpha_ratio = alpha_chars.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    return F.round((len_ok + tok_ok + alpha_ratio) / F.lit(3.0), 6)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set.

    Robust to token order/duplication — two documents with the same
    vocabulary collide, which is the 'normalized-text hash' dedup key
    used at corpus scale."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def chunk_text(
    df,
    text_col: str,
    id_col: str,
    chunk_chars: int = 512,
    overlap: int = 128,
):
    """Overlapping character windows per document — the
    retrieval/embedding chunking step (RAG indexes, long-doc
    embedding models with bounded context): chunk i covers
    ``[i*step, i*step + chunk_chars)`` with ``step = chunk_chars -
    overlap``, so consecutive chunks share ``overlap`` characters and
    no split point can hide a phrase from retrieval. Chunks start
    while their offset is inside the text, the final one running
    short; an empty document yields one empty chunk (row-count
    preserving for joins back to the source).

    Pure codegen — ``sequence`` over chunk ordinals, ``substring``
    per window, one ``posexplode`` — no UDF, no shuffle; output rows
    ≈ corpus_chars/step, each carrying (id, chunk_id, chunk).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    c = F.col(text_col)
    last_i = F.floor(F.greatest(F.length(c) - 1, F.lit(0)) / F.lit(step)).cast(
        "int"
    )
    windows = F.transform(
        F.sequence(F.lit(0), last_i),
        lambda i: F.substring(c, i * step + 1, chunk_chars),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(windows).alias("chunk_id", "chunk"),
    )


def normalize_unicode(col: Column | str, form: str = "NFC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the ingestion
    hygiene step that belongs BEFORE any content hashing: the same
    visible text in composed vs decomposed form (é vs e+U+0301) hashes
    differently, so an un-normalized corpus leaks duplicates straight
    past exact dedup and splits shingle/minhash keys. Spark has no
    built-in; this is an Arrow-batched pandas UDF over
    ``unicodedata.normalize`` (the reference implementation — the same
    Unicode tables DuckDB's ``nfc_normalize`` applies, so the result
    is oracle-checkable byte-for-byte). Pure map stage, no shuffle;
    normalize once at ingest and every downstream hash sees canonical
    bytes."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")

    def norm(texts):
        import unicodedata

        return texts.map(
            lambda t: None if t is None else unicodedata.normalize(form, t)
        )

    norm.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    c = F.col(col) if isinstance(col, str) else col
    return pandas_udf("string")(norm)(c)


def repetition_stats(df, text_col: str, id_col: str, n: int = 3):
    """Gopher-style repetition signals per document: duplicate-token
    fraction (1 - distinct/total) and top-n-gram mass (most frequent
    n-gram's share of all n-grams). High values mark boilerplate,
    keyword stuffing, and generation loops — the standard repetition
    filters of large-corpus curation pipelines.

    SHUFFLE-FREE: the top-n-gram count is a per-document statistic, so
    it never needs the explode + two hash aggregations a corpus-level
    n-gram table would — each row sorts its own gram array and takes
    the longest equal-adjacent run (max multiplicity) in one
    higher-order aggregate. Zero exchanges, embarrassingly parallel:
    at 100 TB this is a map-only pass where the grouped form shuffles
    |corpus| x grams-per-doc rows twice. Locally it measures a wash
    (the interpreted lambda trades against codegen'd hash aggs; wall
    time is dominated by n-gram string construction either way) — the
    win is the removed exchanges at cluster scale. Values are
    identical (same counts, same arithmetic), so the SQL oracle is
    unchanged.
    Documents with no valid n-gram are dropped, matching the grouped
    form's inner join. Output: (id, n_tokens, dup_token_frac,
    top_ngram_frac).
    """
    from pyspark.sql import DataFrame  # noqa: F401
    from platypus_ingestion_plugins_spark.session import ensure_parallelism

    toks = tokens(text_col)
    # arrays_zip of shifted slices, not transform-over-indices: the
    # index form has Catalyst inline the tokenize expression into the
    # lambda (re-split per gram position, quadratic per doc — the
    # dedup.shingles trap). concat_ws skips zip-padding nulls, so
    # short docs still yield their full text as one gram.
    m = F.greatest(F.size(toks) - n + 1, F.lit(1))
    grams = F.transform(
        F.arrays_zip(*[F.slice(toks, j + 1, m) for j in range(n)]),
        lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)]),
    )
    sg = F.array_sort(F.filter(grams, lambda g: g != ""))
    # longest run of equal adjacent grams in the sorted array == the
    # most frequent gram's count
    run_state = F.aggregate(
        sg,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return (
        ensure_parallelism(df)
        .select(
            F.col(id_col),
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            run_state["best"].alias("top_c"),
            F.size(sg).alias("tot"),
        )
        .filter(F.col("tot") > 0)
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("n_distinct").cast("double")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ).alias("dup_token_frac"),
            F.round(
                F.col("top_c").cast("double") / F.col("tot").cast("double"), 6
            ).alias("top_ngram_frac"),
        )
    )


def top_terms_per_group(
    df,
    text_col: str,
    group_col: str,
    k: int = 10,
    min_token_len: int = 1,
):
    """Top-k most frequent tokens per group (per source, per language,
    per date bucket) — the corpus-composition report a training-data
    pipeline runs after every ingest to spot drift and contamination
    by eye.

    Shape at scale: explode tokens, ONE partial-aggregatable count
    shuffle on (group, token), then a group-bounded row_number window
    — the window's partition is a single group's vocabulary, never the
    corpus. Deterministic (count desc, token asc) ordering makes the
    report engine-reproducible. Output: (group_col, term, n, rank).
    """
    tok = (
        df.select(F.col(group_col), F.explode(tokens(text_col)).alias("term"))
        .filter(F.length("term") >= min_token_len)
    )
    counts = tok.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hashed_bow_embeddings(
    df, text_col: str, id_col: str, dim: int = 32
):
    """Hashed bag-of-words embeddings: (id, L2-normalized
    ``array<double>`` of token-count buckets), token -> bucket by the
    engine-independent md5-half hash used throughout (so an external
    SQL engine reproduces the vector bit-for-bit after rounding).

    The feature-hashing trick (Weinberger et al. 2009): no vocabulary,
    no model file — the cheapest way to give every document a vector
    the similarity operators (knn_join, IVF/LSH dedup) can consume
    when no learned embedding exists yet.

    Physical split: the md5 bucketing is a JVM codegen transform (one
    evaluation per token); the histogram + normalization is an
    Arrow-batched mapInPandas kernel over the bucket arrays (numpy
    bincount — map-only, no shuffle). A pure-expression histogram was
    measured 30x slower: Catalyst either inlines the md5 pipeline
    into every per-component lambda or, in the single-aggregate form,
    rebuilds the dim-wide accumulator array per token — per-row array
    construction is exactly what the Arrow batch boundary avoids.
    Components round to 6 places AFTER normalization for cross-engine
    comparability; the zero vector (empty text) stays zero."""
    from pyspark.sql import types as _T

    buckets = F.transform(
        tokens(text_col),
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            F.lit(dim),
        ),
    )
    out_schema = _T.StructType(
        [
            df.schema[id_col],
            _T.StructField("embedding", _T.ArrayType(_T.DoubleType())),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for b in pdf["__buckets"]:
                arr = np.bincount(
                    np.asarray(b if b is not None else [], dtype=np.int64),
                    minlength=dim,
                ).astype(np.float64)
                n = float(np.sqrt((arr * arr).sum()))
                if n > 0:
                    arr = arr / n
                out.append(np.round(arr, 6).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": out})

    return df.select(
        F.col(id_col), buckets.alias("__buckets")
    ).mapInPandas(kernel, out_schema)


def normalize_url(col: Column | str) -> Column:
    """Canonical URL for dedup/grouping — the normalization step every
    crawl pipeline runs before URL-level dedup (RefinedWeb §3.1 dedups
    by URL; Dolma filters and groups by it). Rules, all pure codegen
    string expressions (no UDF, map-only):

      - scheme and host lowercased; leading ``www.`` stripped;
        default ports dropped (``:80`` for http, ``:443`` for https);
      - fragment (``#...``) dropped — never sent to the server;
      - tracking parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
        ``ref``) and the surviving query parameters SORTED, so
        param-order permutations of one resource collapse;
      - trailing slash trimmed from a non-root path.

    Non-http(s) or unparseable values pass through unchanged (a
    canonicalizer must never manufacture collisions out of garbage).
    """
    c = F.col(col) if isinstance(col, str) else col
    # scheme chars matched case-insensitively via classes (not (?i),
    # which would also case-fold the host/path groups differently
    # across regex engines): 'HTTP://X' must canonicalize, not pass
    # through (r11 review 2nd pass #4)
    rx = (
        r"^([hH][tT][tT][pP][sS]?)://([^/?#]+)([^?#]*)"
        r"(?:\?([^#]*))?(?:#.*)?$"
    )
    scheme = F.lower(F.regexp_extract(c, rx, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(c, rx, 2)), r"^www\.", ""
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(c, rx, 3), r"(.)/$", "$1")
    qs = F.regexp_extract(c, rx, 4)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(r"^(utm_[^=]*|gclid|fbclid|ref)="),
    )
    qsn = F.array_join(F.array_sort(params), "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qsn != "", F.concat(F.lit("?"), qsn)).otherwise(F.lit("")),
    )
    return F.when(c.rlike(rx), rebuilt).otherwise(c)


def c4_line_filter(
    df,
    text_col: str,
    id_col: str,
    bad_words: tuple[str, ...] = (),
    min_words_per_line: int = 5,
    min_sentences: int = 3,
):
    """The C4 cleaning rules (Raffel et al. 2020, JMLR §2.2 — the
    other canonical public rule set next to Gopher's, reused by
    FineWeb/Dolma): line-level retention plus page-level flags.

    Line retention (a line survives iff ALL hold):
      - ends in a terminal punctuation mark (. ! ? or a closing
        double quote), after trimming;
      - has >= ``min_words_per_line`` whitespace words;
      - does not contain the word "javascript" (case-insensitive).

    Page-level flags (evaluated on the ORIGINAL text, as in the
    paper — a page containing "{" anywhere is code, even if the
    offending line would have been dropped):
      c4_min_sentences  kept text carries >= ``min_sentences``
                        sentence-terminal characters ([.!?])
      c4_no_lorem       "lorem ipsum" absent (case-insensitive)
      c4_no_brace       "{" absent
      c4_no_badwords    no ``bad_words`` entry appears as a token
                        (empty default list = trivially true; supply
                        the deployment's list — it is policy, not
                        code)

    Output: (id, text [kept lines re-joined], n_lines, n_kept,
    n_sentences, the four flags, c4_pass = their conjunction). Like
    ``gopher_quality_flags``, every rule is one codegen projection —
    map-only, shuffle-free, no UDF, SQL-oracle-reproducible. A page
    whose every line is dropped has empty text and fails
    ``c4_min_sentences``.
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(c, "\n")

    def _keep(line):
        t = F.trim(line)
        words = F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(words) >= min_words_per_line)
            & ~F.lower(line).contains("javascript")
        )

    kept_arr = F.filter(lines, _keep)
    kept = F.array_join(kept_arr, "\n")
    n_sentences = F.length(kept) - F.length(
        F.regexp_replace(kept, r"[.!?]", "")
    )
    low = F.lower(c)
    toks = tokens(c)
    no_bad = (
        F.lit(True)
        if not bad_words
        else F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(w.lower()) for w in bad_words])
            )
        )
        == 0
    )
    flags = {
        "c4_min_sentences": n_sentences >= min_sentences,
        "c4_no_lorem": ~low.contains("lorem ipsum"),
        "c4_no_brace": ~c.contains("{"),
        "c4_no_badwords": no_bad,
    }
    out = df.select(
        F.col(id_col),
        kept.alias(text_col),
        F.size(lines).alias("n_lines"),
        F.size(kept_arr).alias("n_kept"),
        n_sentences.alias("n_sentences"),
        *[v.alias(k) for k, v in flags.items()],
    )
    overall = None
    for k in flags:
        overall = F.col(k) if overall is None else (overall & F.col(k))
    return out.withColumn("c4_pass", overall)


def gopher_quality_flags(df, text_col: str, id_col: str):
    """The Gopher rule set (Rae et al. 2021, arXiv:2112.11446, Table
    A1 — the public heuristics FineWeb/Dolma reuse verbatim): one
    boolean per rule plus the conjunction, so a pipeline can either
    hard-filter on ``gopher_pass`` or inspect which rule fired.

    Rules (document-level, whitespace words / newline lines):
      r_word_count     50 <= words <= 100_000
      r_mean_word_len  3 <= mean word length <= 10
      r_symbol_ratio   (# '#' + # '...') / words <= 0.1
      r_bullet_lines   < 90% of lines start with a bullet marker
      r_ellipsis_lines <= 30% of lines end with '...'
      r_alpha_words    >= 80% of words contain an alphabetic char
      r_stopwords      >= 2 distinct of the 8 Gopher stop words
                       (the, be, to, of, and, that, have, with)

    Every rule is deterministic integer/char arithmetic over one
    codegen projection — map-only, shuffle-free, no UDF; an external
    SQL oracle reproduces each flag bit-for-bit. Empty documents fail
    r_word_count and so fail overall (0 words; ratios guard their
    denominators)."""
    flags = gopher_rule_exprs(text_col)
    out = df.select(F.col(id_col), *[v.alias(k) for k, v in flags.items()])
    overall = None
    for k in flags:
        overall = F.col(k) if overall is None else (overall & F.col(k))
    return out.withColumn("gopher_pass", overall)


def gopher_rule_exprs(text_col: str) -> dict:
    """The seven Gopher rule COLUMN EXPRESSIONS, name -> boolean —
    the composable form: a pipeline that gates on k-of-7 inline
    (pipelines.curate_pretraining_mix) filters map-only instead of
    semi-joining a corpus-sized flag frame back onto the corpus."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(c, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    ).cast("double") / nw
    n_hash = F.size(F.split(c, "#", -1)) - 1
    n_ellipsis = F.size(F.split(c, r"\.\.\.", -1)) - 1
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))
    )
    ellipsis_lines = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stops = F.array(*[F.lit(s) for s in
                      ("the", "be", "to", "of", "and", "that", "have", "with")])
    n_stop = F.size(
        F.array_intersect(F.transform(words, lambda w: F.lower(w)), stops)
    )
    return {
        "r_word_count": (n_words >= 50) & (n_words <= 100_000),
        "r_mean_word_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "r_symbol_ratio": (n_hash + n_ellipsis).cast("double") / nw <= 0.1,
        "r_bullet_lines": bullet_lines.cast("double") / n_lines < 0.9,
        "r_ellipsis_lines": ellipsis_lines.cast("double") / n_lines <= 0.3,
        "r_alpha_words": alpha_words.cast("double") / nw >= 0.8,
        "r_stopwords": n_stop >= 2,
    }


def tfidf_keywords(
    df,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_token_len: int = 2,
):
    """Per-document keyword extraction by smoothed TF-IDF: each doc's
    top-k terms under score = tf * (ln((N+1)/(df+1)) + 1) — term
    frequency within the doc times the sklearn-style smoothed inverse
    document frequency (df counts DOCUMENTS containing the term, the
    +1s keep corpus-universal terms finite and new-term scores
    defined). The per-doc summary every search/RAG pipeline wants
    next to the corpus-level ``top_terms_per_group``.

    Output (id, term, tf, score 6dp, rank), rank by (score desc,
    term asc) within the doc — deterministic, engine-reproducible.

    Scale shape: explode tokens once; tf is one partial-aggregatable
    (doc, term) count; df reduces the SAME frame by term (vocab-sized)
    and joins back on term; N rides a 1-row broadcast; the final
    window partitions by doc — a single doc's vocabulary, never the
    corpus (the ``top_terms_per_group`` contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    ).filter(F.length("term") >= min_token_len)
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    n_docs = df.select(
        F.count_distinct(F.col(id_col)).alias("__n")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1) / (F.col("__df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "score", "rank")
    )


def rouge_n(
    df,
    ref_col: str,
    cand_col: str,
    id_col: str,
    n: int = 2,
):
    """ROUGE-N overlap between paired texts (Lin 2004) — the n-gram
    eval metric for generated/rewritten data: per row, clipped n-gram
    overlap between reference and candidate, reported as precision
    (overlap / candidate grams), recall (overlap / reference grams)
    and F1. Clipping counts each gram min(ref multiplicity, cand
    multiplicity) times — the standard anti-gaming reading (repeating
    a matched gram in the candidate earns nothing).

    Output (id, ref_ngrams, cand_ngrams, overlap, precision, recall,
    f1) — ratios 6dp, NULL when the denominator is 0 (an empty side
    scores nothing, it doesn't crash); rows where BOTH sides have
    zero grams still appear (n_grams 0, NULL ratios).

    Scale shape: both sides' n-grams build as codegen array
    expressions (transform over a sequence of slices — no UDF),
    explode once each, clip via one (id, gram) full-outer count join,
    then one partial-aggregatable groupBy(id). Pair rows upstream
    (the operator takes one frame carrying both columns).

    ``id_col`` must be UNIQUE per row — the clip aggregates by id, so
    duplicate ids would silently merge gram counts across distinct
    (ref, cand) pairs and corrupt every ratio. Enforced eagerly (one
    count/count_distinct aggregate) — duplicates raise instead of
    mis-scoring (ADVICE r14)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # count_distinct ignores NULL ids, so NULL counts as its own
    # distinct value explicitly — otherwise one NULL id falsely reads
    # as a duplicate (the clip groups a lone NULL by itself correctly)
    dup = df.agg(
        (
            F.count(F.lit(1))
            - F.count_distinct(F.col(id_col))
            - F.max(F.col(id_col).isNull().cast("int"))
        ).alias("d")
    ).first()["d"]
    if dup:
        raise ValueError(
            f"rouge_n: id_col {id_col!r} has {dup} duplicate row(s); "
            "scores aggregate per id, so ids must be unique per "
            "(ref, cand) pair"
        )

    def grams(col):
        toks = tokens(col)
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    base = df.select(
        F.col(id_col),
        grams(ref_col).alias("__rg"),
        grams(cand_col).alias("__cg"),
    )
    rc = (
        base.select(F.col(id_col), F.explode("__rg").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("rn"))
    )
    cc = (
        base.select(F.col(id_col), F.explode("__cg").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    clip = (
        rc.join(cc, [id_col, "gram"], "full_outer")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("rn", F.lit(0))).cast("long").alias("ref_ngrams"),
            F.sum(F.coalesce("cn", F.lit(0))).cast("long").alias("cand_ngrams"),
            F.sum(
                F.least(
                    F.coalesce("rn", F.lit(0)), F.coalesce("cn", F.lit(0))
                )
            ).cast("long").alias("overlap"),
        )
    )
    # rows whose both sides are empty never reach the explode — join
    # them back so the report covers every input pair
    ids = base.select(id_col).distinct()
    out = ids.join(clip, id_col, "left").select(
        id_col,
        F.coalesce("ref_ngrams", F.lit(0)).alias("ref_ngrams"),
        F.coalesce("cand_ngrams", F.lit(0)).alias("cand_ngrams"),
        F.coalesce("overlap", F.lit(0)).alias("overlap"),
    )
    p = F.when(
        F.col("cand_ngrams") > 0, F.col("overlap") / F.col("cand_ngrams")
    )
    r = F.when(
        F.col("ref_ngrams") > 0, F.col("overlap") / F.col("ref_ngrams")
    )
    f1 = F.when(
        (F.col("cand_ngrams") > 0)
        & (F.col("ref_ngrams") > 0)
        & (F.col("overlap") > 0),
        2.0
        * F.col("overlap")
        / (F.col("cand_ngrams") + F.col("ref_ngrams")),
    ).otherwise(
        F.when(
            (F.col("cand_ngrams") > 0) & (F.col("ref_ngrams") > 0),
            F.lit(0.0),
        )
    )
    return out.select(
        id_col,
        "ref_ngrams",
        "cand_ngrams",
        "overlap",
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def char_entropy_stats(df, text_col: str, id_col: str):
    """Per-document character-distribution Shannon entropy (bits) —
    the classic gibberish/compression-quality signal: natural prose
    sits in a tight entropy band (~3.5-4.5 bits for English),
    keyboard mashing and base64 blobs sit high, repeated-character
    filler sits low. Output (id, n_chars, entropy 6dp); empty/NULL
    text reports (0, NULL).

    Scale shape: one explode to (id, char) rows, one
    partial-aggregatable groupBy(id, char), one groupBy(id) folding
    -sum(p log2 p) — two bounded shuffles, no UDF (entropy needs the
    per-char histogram; there is no single-pass column form). The
    per-doc char alphabet is <= a few hundred rows, so the second
    stage is tiny."""
    chars = (
        df.select(
            F.col(id_col),
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "")
            ).alias("ch"),
        )
        .where(F.col("ch") != "")
        .groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_doc = chars.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_chars"),
        F.sum(F.col("cnt") * F.log2(F.col("cnt"))).alias("__sum_nlogn"),
    )
    entropy = F.log2(F.col("n_chars")) - F.col("__sum_nlogn") / F.col(
        "n_chars"
    )
    ids = df.select(id_col).distinct()
    return ids.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_chars", F.lit(0)).alias("n_chars"),
        F.when(F.col("n_chars") > 0, F.round(entropy, 6)).alias("entropy"),
    )


def pmi_pairs(
    df,
    text_col: str,
    id_col: str,
    vocab: int = 30,
    min_pair_docs: int = 5,
    top_n: int = 20,
):
    """Top term-pair pointwise mutual information over documents —
    "which words travel together" (Church & Hanks 1990), the corpus
    collocation report next to `top_terms_per_group`'s solo counts:

        pmi(a, b) = ln( P(a, b) / (P(a) P(b)) )

    with doc-level probabilities (P(x) = docs containing x / N).
    Pairs are unordered (a < b lexicographically) over per-doc
    DISTINCT terms, restricted to the ``vocab`` most document-frequent
    terms — the explicit blocking bound that keeps the per-doc pair
    fan-out <= vocab^2/2 regardless of corpus size (the MinHash-band
    lesson: never an unbounded self-join). Pairs in fewer than
    ``min_pair_docs`` docs drop (rare-pair noise floor). Output
    (term_a, term_b, n_pair_docs, pmi 6dp) ranked (pmi desc, term_a,
    term_b), top_n rows.

    Scale shape: one explode + distinct to (doc, term); the vocab
    frame (vocab rows, rank by (df desc, term)) BROADCASTS into a
    semi-join filter; the pair stage self-joins the filtered frame on
    doc (fan-out bounded by vocab); one partial-aggregatable
    groupBy(pair); doc frequencies re-join from the vocab frame; N
    rides a 1-row broadcast; final rank is a distributed
    TakeOrdered."""
    if vocab < 2:
        raise ValueError(f"vocab must be >= 2, got {vocab}")
    if min_pair_docs < 1:
        raise ValueError(f"min_pair_docs must be >= 1, got {min_pair_docs}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark.sql import Window

    doc_terms = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    dfreq = doc_terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    w = Window.orderBy(F.col("__df").desc(), F.col("term").asc())
    top_vocab = (
        dfreq.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= vocab)
        .select("term", "__df")
    )
    filtered = doc_terms.join(F.broadcast(top_vocab), "term").select(
        "__id", "term"
    )
    a = filtered.select("__id", F.col("term").alias("term_a"))
    b = filtered.select("__id", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "__id")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair_docs"))
        .where(F.col("n_pair_docs") >= min_pair_docs)
    )
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (
        pairs.join(
            F.broadcast(top_vocab.select(F.col("term").alias("term_a"),
                                         F.col("__df").alias("__dfa"))),
            "term_a",
        )
        .join(
            F.broadcast(top_vocab.select(F.col("term").alias("term_b"),
                                         F.col("__df").alias("__dfb"))),
            "term_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_pair_docs",
            F.round(
                F.log(
                    (F.col("n_pair_docs") * F.col("__n"))
                    / (F.col("__dfa") * F.col("__dfb"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(top_n)


def json_validity(df, col: str, by: str):
    """JSON-parseability profile per group (NEW r15) — the corpus-
    hygiene gate for code/config/structured-text sources: per ``by``
    bucket, the row count, how many rows parse as JSON, and the valid
    rate (6dp). A source whose validity rate drops between releases
    is the canonical silent-scraper-breakage signal. NULL text rows
    count as INVALID (a missing payload fails any parse); NULL group
    keys carry no row (the facet convention).

    Pure codegen: ``try_parse_json`` (the VARIANT parser — JVM-side,
    no UDF) feeds one partial-aggregatable groupBy."""
    valid = F.try_parse_json(F.col(col)).isNotNull().cast("int")
    return (
        df.where(F.col(by).isNotNull())
        .groupBy(F.col(by).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(valid).cast("long").alias("n_valid"),
        )
        .select(
            "bucket",
            "n",
            "n_valid",
            F.round(F.col("n_valid") / F.col("n"), 6).alias("valid_rate"),
        )
    )


def _require_numeric_key(df, key_col: str, op: str) -> None:
    """Eager guard for the multiplicative-hash determinism keys: a
    non-numeric ``key_col`` would either throw mid-corpus under Spark
    4's ANSI cast-to-long or (non-ANSI) silently yield NULL keys so no
    row ever transforms — fail loudly at plan time instead."""
    from pyspark.sql import types as T

    dt = df.schema[key_col].dataType
    if not isinstance(dt, T.NumericType):
        raise ValueError(
            f"{op}: key_col {key_col!r} must be numeric for the "
            f"deterministic multiplicative hash, got {dt.simpleString()};"
            " derive a numeric key first (e.g. xxhash64(col))"
        )


def fim_transform(
    df,
    text_col: str = "text",
    key_col: str = "doc_id",
    rate: float = 0.5,
    pre_tok: str = "<|fim_prefix|>",
    suf_tok: str = "<|fim_suffix|>",
    mid_tok: str = "<|fim_middle|>",
):
    """Fill-in-the-middle pretraining transform (NEW r15; Bavarian et
    al. 2022, "Efficient Training of Language Models to Fill in the
    Middle") — the formatting step between curation and packing for
    code/infilling corpora: a deterministic ``rate`` fraction of docs
    split at two content-independent cut points into
    (prefix, middle, suffix) and re-render in PSM order
    ``<pre>prefix<suf>suffix<mid>middle``; the rest pass through
    unchanged. Output: the input columns plus ``fim`` (bool) and
    ``fim_text`` (the training payload — rendered PSM for transformed
    rows, the original text otherwise).

    Everything derives from ``key_col`` by multiplicative hashing
    (Knuth constants), NOT from a random source: reruns, replays and
    the two halves of a diffed release transform the SAME docs at the
    SAME cut points — the determinism rule every sampling operator in
    this engine follows (``dataset_split``'s hash-membership
    precedent). Cut points are uniform over [0, len] and order-fixed
    with least/greatest, so prefix/middle/suffix tile the exact
    original (empty spans allowed, ES-of-substr semantics). NULL text
    passes through untransformed (``fim`` false, ``fim_text`` NULL).
    Pure codegen substring arithmetic — no UDF, no shuffle; composes
    map-side with ``pack_texts``/``pack_bins`` downstream."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    _require_numeric_key(df, key_col, "fim_transform")
    # fold the key below 2**20 BEFORE the Knuth multiply: a raw
    # 100 TB-scale id times 2654435761 overflows BIGINT, and Spark 4's
    # ANSI default turns that into a runtime error mid-corpus
    key = F.pmod(F.col(key_col).cast("long"), F.lit(1000003))
    text = F.col(text_col)
    n = F.length(text)
    picked = F.coalesce(
        (F.pmod(key * F.lit(2654435761), F.lit(1000000)) <
         F.lit(int(round(rate * 1000000)))) & text.isNotNull(),
        F.lit(False),
    )
    r1 = F.pmod(key * F.lit(40503) + F.lit(12345), n + F.lit(1))
    r2 = F.pmod(key * F.lit(69069) + F.lit(54321), n + F.lit(1))
    lo, hi = F.least(r1, r2), F.greatest(r1, r2)
    prefix = F.substring(text, F.lit(1), lo)
    middle = F.substring(text, lo + F.lit(1), hi - lo)
    suffix = F.substring(text, hi + F.lit(1), n - hi)
    rendered = F.concat(
        F.lit(pre_tok), prefix, F.lit(suf_tok), suffix, F.lit(mid_tok), middle
    )
    return df.withColumn("fim", picked).withColumn(
        "fim_text", F.when(picked, rendered).otherwise(text)
    )


def span_corrupt(
    df,
    text_col: str = "text",
    key_col: str = "doc_id",
    block_tokens: int = 3,
    mask_one_in: int = 5,
):
    """T5-style span-corruption formatting (NEW r15; Raffel et al.
    2020, the denoising sibling of ``fim_transform``'s infilling):
    whitespace tokens group into fixed ``block_tokens`` blocks; a
    deterministic 1-in-``mask_one_in`` of the blocks mask out, each
    replaced in the input by an incrementing sentinel and emitted in
    the target as ``<extra_id_k> span-text`` — the exact
    (inputs, targets) pair a T5/UL2 objective trains on. Output: the
    input columns plus ``corrupt_input`` and ``corrupt_target``
    (target NULL when no block masked — such rows carry no denoising
    signal and a caller filters them, matching the reference
    preprocessing's drop).

    Mask membership derives from (``key_col``, block index) by
    multiplicative hashing (the ``fim_transform`` determinism rule,
    key folded below 2**20 first — ANSI-safe at 100 TB ids). The
    sentinel numbering is a PREFIX COUNT over masked blocks, computed
    in ONE linear ``F.aggregate`` scan per row carrying
    (input, target, k) — no posexplode/window round-trip, no O(n^2)
    slice-refilter; pure codegen higher-order functions, map-side,
    NULL text passes through NULL."""
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1, got {block_tokens}")
    if mask_one_in < 2:
        raise ValueError(f"mask_one_in must be >= 2, got {mask_one_in}")
    _require_numeric_key(df, key_col, "span_corrupt")
    kh = F.pmod(F.col(key_col).cast("long"), F.lit(1000003))
    toks = F.split(F.col(text_col), " ")
    n_blocks = F.ceil(F.size(toks) / F.lit(block_tokens)).cast("int")

    def block_text(b):
        return F.concat_ws(
            " ", F.slice(toks, b * F.lit(block_tokens) + 1, block_tokens)
        )

    def masked(b):
        return (
            F.pmod((kh + b) * F.lit(2654435761), F.lit(mask_one_in)) == 0
        )

    def sentinel(k):
        return F.concat(
            F.lit("<extra_id_"), k.cast("string"), F.lit(">")
        )

    def join_piece(acc_str, piece):
        return F.when(acc_str == "", piece).otherwise(
            F.concat(acc_str, F.lit(" "), piece)
        )

    zero = F.struct(
        F.lit("").alias("inp"), F.lit("").alias("tgt"),
        F.lit(0).alias("k"),
    )

    def step(acc, b):
        return F.when(
            masked(b),
            F.struct(
                join_piece(acc["inp"], sentinel(acc["k"])).alias("inp"),
                join_piece(
                    acc["tgt"],
                    F.concat(
                        sentinel(acc["k"]), F.lit(" "), block_text(b)
                    ),
                ).alias("tgt"),
                (acc["k"] + F.lit(1)).alias("k"),
            ),
        ).otherwise(
            F.struct(
                join_piece(acc["inp"], block_text(b)).alias("inp"),
                acc["tgt"].alias("tgt"),
                acc["k"].alias("k"),
            )
        )

    folded = F.aggregate(
        F.sequence(F.lit(0), n_blocks - F.lit(1)),
        zero,
        step,
    )
    has_text = F.col(text_col).isNotNull() & (F.size(toks) > 0)
    return df.withColumn(
        "corrupt_input", F.when(has_text, folded["inp"])
    ).withColumn(
        "corrupt_target",
        F.when(has_text & (folded["k"] > 0), folded["tgt"]),
    )


def readability_stats(col, min_words: int = 1):
    """Flesch reading-ease readability (NEW r15; Flesch 1948, the
    score every readability gate quotes) as named codegen Columns —
    the style-complexity signal next to ``gopher_quality_flags``'
    structural rules: words (whitespace tokens), sentences
    (``[.!?]+`` runs, min 1 — a fragment is one sentence), syllables
    (per-word ``[aeiouy]+`` vowel groups, min 1 per word — the
    standard heuristic), and

        flesch = 206.835 - 1.015 * words/sentences
                         - 84.6 * syllables/words

    (~90-100 grade-school, ~30-50 college, <0 dense legalese).
    Returns a dict of Columns (the ``script_counts`` convention) so a
    caller projects them in one pass: ``n_words``, ``n_sentences``,
    ``n_syllables``, ``flesch`` (6dp, NULL when under ``min_words``).
    Pure higher-order-function codegen (split/filter/aggregate) — no
    UDF; the syllable heuristic is ASCII-vowel-based, i.e. an ENGLISH
    readability instrument (its published scope), applied after
    lowercasing."""
    c = F.lower(F.coalesce(F.col(col) if isinstance(col, str) else col,
                           F.lit("")))
    words = F.filter(F.split(c, r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words)
    n_sent = F.greatest(
        F.size(
            F.filter(F.split(c, r"[.!?]+"), lambda s: F.trim(s) != F.lit(""))
        ),
        F.lit(1),
    )
    syl = F.aggregate(
        words,
        F.lit(0),
        lambda acc, w: acc
        + F.greatest(
            F.size(
                F.filter(
                    F.split(w, "[^aeiouy]+"), lambda g: g != F.lit("")
                )
            ),
            F.lit(1),
        ),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * n_words / n_sent
        - F.lit(84.6) * syl / n_words
    )
    return {
        "n_words": n_words.alias("n_words"),
        "n_sentences": n_sent.alias("n_sentences"),
        "n_syllables": syl.alias("n_syllables"),
        "flesch": F.when(
            n_words >= F.lit(min_words), F.round(flesch, 6)
        ).alias("flesch"),
    }
