"""Query surface over the materialized serving table (SURVEY §2.5 Q1-Q8).

The reference delegates serving to NRTSearch/Lucene and its tests pin
the query semantics (KafkaIngestorE2ETest.java:364-494,
PaimonIngestorE2ETest.java:439-525). Here the "index" is a queryable
DataFrame and each query op compiles to Catalyst expressions:

- Q1 match-all + top-k + offset   -> deterministic sort + limit
- Q2 field retrieval              -> select
- Q3 term query (ATOM exact)      -> col == lit  (parquet-pushed)
- Q4 full-text match (TEXT)       -> lowercase \\W+ tokenize, OR-of-terms
- Q5 hit counting                 -> count
- Q6 delete-set membership        -> isin / broadcast semi-join
- Q8 multi-valued fields          -> array columns + array_contains

Q4 approximates Lucene's standard analyzer with lowercase + non-word
split — sufficient for the reference's own corpus and documented as
such (SURVEY §7.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(col: Column | str) -> Column:
    """Lucene-standard-analyzer approximation: lowercase, split on \\W+."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"\W+"), lambda t: t != F.lit(""))


def match_all() -> Column:
    return F.lit(True)


def term(field: str, value) -> Column:
    """Exact match on an ATOM field (TermQuery)."""
    return F.col(field) == F.lit(value)


def term_in_set(field: str, values: Sequence) -> Column:
    """TermInSetQuery (the delete-set membership query,
    PaimonRowProcessor.java:299-315). For large sets, prefer a
    broadcast semi-join over isin."""
    return F.col(field).isin(list(values))


def match_text(field: str, query: str) -> Column:
    """Analyzed full-text match: OR of query tokens against the field's
    tokens (MatchQuery semantics: 'pasta cooking' matches a doc
    containing either token, KafkaIngestorE2ETest.java:472-492)."""
    q_tokens = [t for t in _py_tokenize(query)]
    return F.arrays_overlap(tokenize(field), F.array(*[F.lit(t) for t in q_tokens]))


def _py_tokenize(s: str) -> list[str]:
    """Query-side analyzer — MUST split identically to ``tokenize``'s
    field side. Java's regex \\W is ASCII-only by default, so Python's
    must be too (re.ASCII); without it a query containing accented
    letters tokenizes differently from the field ('naïve' stays whole
    here but splits to 'na','ve' in the scan) and can never match."""
    import re

    return [t for t in re.split(r"\W+", s.lower(), flags=re.ASCII) if t]


def wildcard_regex(pattern: str) -> str:
    """Lucene WildcardQuery pattern -> anchored regex: ``*`` matches
    any (possibly empty) run, ``?`` exactly one character, everything
    else is literal (escaped character-by-character, so the
    translation uses only the escaped-literal + ``.*`` / ``.`` regex
    subset, which behaves identically in Java regex and RE2 — the
    oracle replays it verbatim). The pattern is lowercased to match
    the analyzer's lowercased terms: Lucene does not analyze wildcard
    patterns, and lowercasing is the only normalization our analyzer
    applies to single tokens."""
    import re as _re

    out = []
    for ch in pattern.lower():
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "^" + "".join(out) + "$"


def match_wildcard(field: str, pattern: str) -> Column:
    """WildcardQuery on the scan path: true when ANY analyzed term of
    ``field`` matches the pattern. Pure codegen (EXISTS over the
    tokenized array + RLIKE) — no UDF. The indexed twin
    (``text_index.search_wildcard_indexed``) answers the same query
    from the term dictionary + pruned postings without touching the
    corpus text."""
    rx = wildcard_regex(pattern)
    return F.exists(tokenize(field), lambda t: t.rlike(rx))


def regexp_term_regex(regex: str) -> str:
    """Lucene ``RegexpQuery`` pattern -> anchored whole-term regex.
    Lucene matches a regexp against ENTIRE terms (implicit anchors);
    the translation adds them around a non-capturing group.
    Validated eagerly (a malformed pattern raises at query build, not
    per-row at scan time); the pattern is NOT lowercased — unlike
    wildcards, a character class like ``[a-z]`` can't be lowercased
    textually, so the caller writes against the analyzer's lowercase
    terms (Lucene's contract too). Keep to the portable subset
    (literals, classes, ``.``, ``*``, ``+``, ``?``, ``|``, groups) —
    it behaves identically in Java regex and the oracle's engine."""
    import re as _re

    try:
        _re.compile(regex)
    except _re.error as e:
        raise ValueError(f"invalid regexp {regex!r}: {e}") from None
    return f"^(?:{regex})$"


def match_regexp(field: str, regex: str) -> Column:
    """RegexpQuery on the scan path (NEW r15, the read-side next to
    ``match_wildcard``): true when ANY analyzed term of ``field``
    matches the whole-term regexp. Pure codegen (EXISTS + RLIKE).
    Indexed twin: ``text_index.search_regexp_indexed`` — dictionary
    expansion + pruned postings, never a corpus text scan."""
    rx = regexp_term_regex(regex)
    return F.exists(tokenize(field), lambda t: t.rlike(rx))


def match_phrase(field: str, phrase: str) -> Column:
    """PhraseQuery: the analyzed phrase tokens appear contiguously and
    in order. Token-exact (not substring): the field's token array is
    re-joined space-delimited with sentinel padding, so 'rope a'
    cannot match inside 'europe about'. Pure codegen string ops —
    no positions index, no UDF."""
    p_tokens = _py_tokenize(phrase)
    if not p_tokens:
        return F.lit(True)
    joined = F.concat(
        F.lit(" "), F.array_join(tokenize(field), " "), F.lit(" ")
    )
    return joined.contains(" " + " ".join(p_tokens) + " ")


def match_prefix(field: str, prefix: str) -> Column:
    """PrefixQuery on an analyzed TEXT field: some token starts with
    the (lowercased) prefix."""
    p = prefix.lower()
    return F.exists(tokenize(field), lambda t: t.startswith(p))


def match_phrase_prefix(field: str, phrase: str) -> Column:
    """MatchPhrasePrefixQuery (the search-as-you-type primitive): the
    analyzed phrase tokens appear contiguously and in order, with the
    LAST token matching as a prefix — 'spark str' matches 'spark
    streaming engine'. Same sentinel-padded joined-tokens trick as
    ``match_phrase``: the leading space anchors the first token's
    start and the missing trailing space leaves the last token
    prefix-open. A single-token phrase degrades to ``match_prefix``
    at the phrase position (i.e. any token). Pure codegen, no UDF."""
    p_tokens = _py_tokenize(phrase)
    if not p_tokens:
        return F.lit(True)
    joined = F.concat(
        F.lit(" "), F.array_join(tokenize(field), " "), F.lit(" ")
    )
    return joined.contains(" " + " ".join(p_tokens))


def range_query(
    field: str,
    gte=None,
    lte=None,
    gt=None,
    lt=None,
) -> Column:
    """RangeQuery: bounded comparison on a numeric/temporal/string
    field (NRTSearch RangeQuery; the reference's clients compose these
    against the Lucene index — KafkaIngestorE2ETest.java query trees).
    Bounds are ANDed; at least one must be given. A NULL field value
    matches no range (Lucene semantics: a doc missing the field is
    never a range hit), which three-valued comparison already gives.
    Pure Column predicate, so Catalyst pushes it to the parquet scan
    like any handwritten comparison."""
    if all(x is None for x in (gte, lte, gt, lt)):
        raise ValueError("range_query needs at least one bound")
    if gte is not None and gt is not None:
        raise ValueError("give at most one lower bound (gte XOR gt)")
    if lte is not None and lt is not None:
        raise ValueError("give at most one upper bound (lte XOR lt)")
    c = F.col(field)
    pred = F.lit(True)
    if gte is not None:
        pred = pred & (c >= F.lit(gte))
    if gt is not None:
        pred = pred & (c > F.lit(gt))
    if lte is not None:
        pred = pred & (c <= F.lit(lte))
    if lt is not None:
        pred = pred & (c < F.lit(lt))
    return pred


def bool_query(
    must: Sequence[Column] = (),
    should: Sequence[Column] = (),
    must_not: Sequence[Column] = (),
    minimum_should_match: int | None = None,
) -> Column:
    """BooleanQuery: Lucene's boolean composition over sub-queries.

    - ``must``: every clause matches (AND).
    - ``should``: at least ``minimum_should_match`` clauses match.
      Default mirrors Lucene: 0 when ``must`` is non-empty (shoulds
      become optional rank-boosters, which a filter context treats as
      no constraint), else 1.
    - ``must_not``: no clause matches. A doc whose field is NULL does
      NOT match the inner clause, so Lucene KEEPS it — every clause is
      coalesced to false before negation/counting, otherwise Spark's
      three-valued NOT would silently drop NULL-field docs the
      reference's engine returns.

    Compiles to one Column predicate (a sum of integer casts for the
    should-count), so the whole tree stays inside codegen and pushes
    down like any manual filter; it composes with ``search()``,
    ``range_query``, ``term``, ``match_*`` and itself (nested trees)."""
    must, should, must_not = list(must), list(should), list(must_not)
    if minimum_should_match is None:
        # Lucene's default: shoulds are the only positive clauses ->
        # at least one must match; with must present (or no shoulds at
        # all, e.g. a pure must_not filter) they are optional boosters.
        minimum_should_match = 1 if (should and not must) else 0
    if minimum_should_match > len(should):
        raise ValueError(
            f"minimum_should_match={minimum_should_match} exceeds the "
            f"{len(should)} should clauses"
        )
    safe = lambda q: F.coalesce(q, F.lit(False))  # noqa: E731
    pred = F.lit(True)
    for q in must:
        # no coalesce on must: NULL and FALSE both fail an AND filter,
        # and the bare predicate stays parquet-pushable (a coalesce
        # wrapper blocks PushedFilters on an otherwise pushable
        # comparison)
        pred = pred & q
    if should and minimum_should_match > 0:
        n = None
        for q in should:
            term_n = safe(q).cast("int")
            n = term_n if n is None else n + term_n
        pred = pred & (n >= F.lit(minimum_should_match))
    for q in must_not:
        pred = pred & ~safe(q)
    return pred


_DSL_LEAVES = (
    "match_all", "term", "terms", "range", "match", "match_phrase",
    "match_phrase_prefix", "prefix", "wildcard", "regexp", "exists",
    "bool",
)


def parse_query(dsl) -> Column:
    """Elasticsearch query-DSL parser (NEW r15): compile the JSON
    query a search client already sends — ``bool`` trees over
    ``term/terms/range/match/match_phrase/match_phrase_prefix/prefix/
    wildcard/regexp/exists/match_all`` leaves — into ONE Column
    predicate built from this module's constructors, so an ES user's
    stored queries run unchanged. Accepts a dict or a JSON string.
    ``filter`` clauses fold into ``must`` (identical semantics here —
    there is no scoring context to skip). Unknown query types, clause
    keys, or malformed bodies raise with the offending fragment
    (silent acceptance of a typo'd query is a wrong-results bug).

    The result is a pure codegen predicate: it pushes down, composes
    with ``search()``/``collapse_topk``/facets, and nests arbitrarily
    — exactly what the hand-built constructors give, minus the hand."""
    import json as _json

    if isinstance(dsl, str):
        try:
            dsl = _json.loads(dsl)
        except ValueError as e:
            raise ValueError(f"invalid query JSON: {e}") from None
    return _parse_node(dsl)


def _one_entry(node: dict, what: str):
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError(
            f"{what} must be an object with exactly one key, got {node!r}"
        )
    return next(iter(node.items()))


def _parse_node(node) -> Column:
    qtype, body = _one_entry(node, "query")
    if qtype not in _DSL_LEAVES:
        raise ValueError(
            f"unsupported query type {qtype!r} (supported: {_DSL_LEAVES})"
        )
    if qtype == "match_all":
        if body not in ({}, None):
            raise ValueError(f"match_all takes no body, got {body!r}")
        return match_all()
    if qtype == "exists":
        if not isinstance(body, dict) or set(body) != {"field"}:
            raise ValueError(f"exists needs {{'field': ...}}, got {body!r}")
        return F.col(body["field"]).isNotNull()
    if qtype == "bool":
        if not isinstance(body, dict):
            raise ValueError(f"bool body must be an object, got {body!r}")
        known = {"must", "filter", "should", "must_not",
                 "minimum_should_match"}
        unknown = set(body) - known
        if unknown:
            raise ValueError(f"unknown bool clause(s) {sorted(unknown)}")

        def clauses(key):
            v = body.get(key, [])
            v = v if isinstance(v, list) else [v]
            return [_parse_node(c) for c in v]

        return bool_query(
            must=clauses("must") + clauses("filter"),
            should=clauses("should"),
            must_not=clauses("must_not"),
            minimum_should_match=body.get("minimum_should_match"),
        )
    # field-keyed leaves
    field, spec = _one_entry(body, f"{qtype} body")

    def unwrap(key: str):
        # ES body forms: a bare scalar OR {"value"/"query": ..., and
        # possibly boost etc. we don't score}. A missing wrapper key
        # must raise the promised ValueError, never a KeyError.
        if isinstance(spec, dict):
            if key not in spec:
                raise ValueError(
                    f"{qtype} body for {field!r} needs {key!r}, got {spec!r}"
                )
            return spec[key]
        return spec

    if qtype == "term":
        return term(field, unwrap("value"))
    if qtype == "terms":
        if not isinstance(spec, list):
            raise ValueError(f"terms needs a value list, got {spec!r}")
        return term_in_set(field, spec)
    if qtype == "range":
        if not isinstance(spec, dict):
            raise ValueError(f"range needs a bounds object, got {spec!r}")
        unknown = set(spec) - {"gte", "gt", "lte", "lt"}
        if unknown:
            raise ValueError(f"unknown range bound(s) {sorted(unknown)}")
        return range_query(field, **spec)
    # ES wraps prefix/wildcard/regexp text as "value", the match
    # family as "query" — both canonical forms parse
    wrapper = "value" if qtype in ("prefix", "wildcard", "regexp") else "query"
    text = unwrap(wrapper)
    if not isinstance(text, str):
        raise ValueError(f"{qtype} needs a string, got {text!r}")
    if qtype in ("match", "match_phrase", "match_phrase_prefix", "prefix"):
        # an analyzed-to-nothing query here would silently compile to
        # match-ALL (match_phrase's empty-degenerate) or near-match-all
        # (prefix '') — in a stored-query surface that's a typo handing
        # the caller the whole corpus (the match_synonyms/percolate
        # rule): raise instead
        if not _py_tokenize(text):
            raise ValueError(
                f"{qtype} query {text!r} analyzes to zero tokens"
            )
    if qtype == "match":
        return match_text(field, text)
    if qtype == "match_phrase":
        return match_phrase(field, text)
    if qtype == "match_phrase_prefix":
        return match_phrase_prefix(field, text)
    if qtype == "prefix":
        return match_prefix(field, text)
    if qtype == "wildcard":
        return match_wildcard(field, text)
    return match_regexp(field, text)  # qtype == "regexp"


def simple_query_string(
    field: str, query: str, default_operator: str = "or"
) -> Column:
    """Lucene ``SimpleQueryParser`` / ES ``simple_query_string`` (NEW
    r15): the end-user search-box syntax — never raises on user input,
    by contract. Supported operators: ``+term`` (required), ``-term``
    (prohibited), ``"quoted phrase"``, trailing ``*`` (prefix), bare
    terms joined by ``default_operator`` ("or": at least one optional
    term matches when nothing is required; "and": every term matches —
    the Lucene BooleanQuery defaults ``bool_query`` already encodes).

    Lenient dialect (documented degradations, matching the parser's
    never-fail contract): ``|``/``(``/``)`` analyze away as term
    separators, so grouping degrades to the default operator; a fuzzy
    suffix ``~N`` strips to the exact term; a token that analyzes to
    several terms contributes each term as its own clause; an
    unbalanced quote reads as plain terms. A query whose every clause
    analyzes to nothing compiles to FALSE — Lucene's
    ``MatchNoDocsQuery`` for empty input, NOT match-all (the
    stored-query typo rule ``parse_query`` enforces by raising; a
    search box must stay silent instead)."""
    import re

    if default_operator not in ("or", "and"):
        raise ValueError(
            f"default_operator must be 'or' or 'and', got {default_operator!r}"
        )
    must: list[Column] = []
    should: list[Column] = []
    must_not: list[Column] = []
    for sign, phrase, tok in re.findall(
        r'([+-]?)(?:"([^"]*)"|(\S+))', query or ""
    ):
        dest = (
            must_not if sign == "-"
            else must if sign == "+" or default_operator == "and"
            else should
        )
        if tok == "" and phrase is not None:
            if _py_tokenize(phrase):
                dest.append(match_phrase(field, phrase))
            continue
        tok = re.sub(r"~\d*$", "", tok)  # fuzzy degrades to exact
        if tok.endswith("*"):
            stem_toks = _py_tokenize(tok[:-1])
            if not stem_toks:
                continue
            if len(stem_toks) == 1:
                dest.append(match_prefix(field, stem_toks[0]))
            else:
                dest.append(match_phrase_prefix(field, " ".join(stem_toks)))
            continue
        for t in _py_tokenize(tok):
            dest.append(F.array_contains(tokenize(field), t))
    if not must and not should and not must_not:
        return F.lit(False)
    return bool_query(must=must, should=should, must_not=must_not)


def match_score(field: str, query: str) -> Column:
    """Deterministic relevance for ranked full-text: the number of
    DISTINCT query tokens present in the field (the coordination
    factor of Lucene's OR scoring). tf-idf weights are corpus- and
    engine-dependent; the coord count is an integer every engine
    reproduces bit-for-bit, which makes ranked retrieval
    oracle-checkable. Evaluates inside codegen: one array_intersect
    per row, no shuffle."""
    q_tokens = sorted(set(_py_tokenize(query)))
    return F.size(
        F.array_intersect(
            F.array_distinct(tokenize(field)),
            F.array(*[F.lit(t) for t in q_tokens]),
        )
    )


def multi_match(
    query: str,
    fields: dict[str, float],
    mode: str = "most_fields",
) -> Column:
    """Lucene/ES MultiMatchQuery over boosted fields, scored with the
    engine-replayable coordination count (``match_score``):

    - ``most_fields``: Σ boost·coord(field) — fields reinforce each
      other (the ES most_fields combiner);
    - ``best_fields``: max boost·coord(field) — the single best field
      wins (the ES default / DisMax with tie_breaker 0).

    Integer coords × caller-fixed boosts keep the score exactly
    reproducible across engines (the match_score rationale); the
    whole expression is per-row codegen — no shuffle, no UDF. Boosts
    must be positive: a zero boost silently erases a field from the
    query (pass the field or don't), and a negative one inverts
    ranking."""
    if not fields:
        raise ValueError("multi_match needs at least one field")
    if mode not in ("most_fields", "best_fields"):
        raise ValueError(f"mode must be most_fields|best_fields, got {mode!r}")
    for f, b in fields.items():
        if not b > 0:
            raise ValueError(f"boost for {f!r} must be > 0, got {b}")
    parts = [
        (F.lit(float(b)) * match_score(f, query)).alias(f)
        for f, b in sorted(fields.items())
    ]
    if mode == "most_fields":
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out
    return F.greatest(*parts) if len(parts) > 1 else parts[0]


def bm25_scores(
    df: DataFrame,
    field: str,
    query: str,
    id_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Robertson BM25 over the corpus — the ranking Lucene (the
    reference's actual serving engine) applies by default to TEXT
    fields, completing Q4 ranked-retrieval parity beyond the
    coordination count:

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))

    Plan shape: the document is tokenized ONCE (dl and the query-term
    explode come off the same array, no self-join back to the corpus
    for lengths); df(t) is at most |query| rows and the (N, avgdl)
    aggregate is one row — both broadcast — so the corpus-sized pass
    is map-side; per-(doc,term) tf and the final per-doc sum reduce
    map-side before their shuffles. Only matching documents return.
    Scores rounded to 6 dp (engine libm / summation-order tolerance,
    same rationale as fulltext_tfidf)."""
    q_tokens = sorted(set(_py_tokenize(query)))
    q_arr = F.array(*[F.lit(t) for t in q_tokens])
    toked = df.select(id_col, tokenize(field).alias("__toks"))
    stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("__toks")).alias("avgdl"),
    )
    hits = toked.select(
        id_col,
        F.size("__toks").alias("dl"),
        F.explode(F.filter("__toks", lambda t: F.array_contains(q_arr, t))).alias(
            "tok"
        ),
    )
    tf = hits.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_t = hits.groupBy("tok").agg(F.count_distinct(F.col(id_col)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("__w", idf * norm)
        .groupBy(id_col)
        .agg(F.round(F.sum("__w"), 6).alias("bm25"))
    )


def top_hits(
    df: DataFrame,
    k: int,
    start_hit: int = 0,
    order_by: str | None = None,
    descending: bool = False,
) -> DataFrame:
    """Top-k + offset. Lucene returns score-ordered hits; with no scoring
    column the serving table orders by the given column (or the first
    column) for determinism. ``descending=True`` gives the
    highest-first ranking a relevance score needs (Lucene's default
    hit order).

    Offset path: ``limit(start_hit + k)`` first — a distributed
    TakeOrdered over the full table — then row_number over the <=
    start+k survivors. The window is unpartitioned but only ever sees
    the bounded limit output, never the whole scan."""
    key = order_by or df.columns[0]
    sort_key = F.col(key).desc() if descending else F.col(key)
    ordered = df.orderBy(sort_key)
    if start_hit == 0:
        return ordered.limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(sort_key)
    return (
        ordered.limit(start_hit + k)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > start_hit)
        .drop("__rn")
    )


def search_after(
    index: DataFrame,
    k: int,
    order_by: str,
    last_key,
    last_id,
    id_col: str,
    descending: bool = False,
) -> Column:
    """Cursor ("deep") pagination — Lucene's searchAfter: the next
    page is the k rows strictly AFTER the previous page's last
    (sort_key, id) in the total order (key asc|desc, id asc). One
    filtered TakeOrderedAndProject whose cost is independent of how
    deep the cursor sits; ``top_hits(start_hit=S)`` instead pays a
    limit(S + k) that grows with every page — the difference between
    O(k) and O(S) per page when a client walks a 100 TB result set.
    The (key, id) pair makes the cursor exact under key ties; the
    caller feeds back the last row of each page verbatim."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = F.col(order_by)
    if descending:
        after = (key < F.lit(last_key)) | (
            (key == F.lit(last_key)) & (F.col(id_col) > F.lit(last_id))
        )
        order = [key.desc(), F.col(id_col).asc()]
    else:
        after = (key > F.lit(last_key)) | (
            (key == F.lit(last_key)) & (F.col(id_col) > F.lit(last_id))
        )
        order = [key.asc(), F.col(id_col).asc()]
    return index.filter(after).orderBy(*order).limit(k)


def more_like_this(
    index: DataFrame,
    field: str,
    id_col: str,
    seed_id,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 1,
    top: int = 10,
) -> DataFrame:
    """Lucene MoreLikeThis: select the seed document's most
    informative terms by tf·idf, then rank the corpus by the boosted
    OR query those terms form.

    Term selection (Lucene's interesting-terms loop): seed-document
    term frequency gated by ``min_term_freq``, document frequency
    gated by ``min_doc_freq``, weight = tf · ln((N+1)/(df+1))
    (strictly positive, monotone in Lucene's idf), top
    ``max_query_terms`` by (weight desc, term) — a total order, so
    the query is deterministic. Document ranking: weight-boosted
    coordination — Σ weight over the DISTINCT selected terms a
    candidate contains (the boost carries the seed's tf; presence,
    not candidate-tf, keeps the score engine-replayable), seed
    excluded, top-``top`` by (score desc, id). Scores round to 6dp
    (the bm25_scores convention) so cross-engine float noise can't
    reorder the cut.

    Shape at scale: two aggregations over the tokenized corpus (tf
    per (doc, term), then df per term), a point-filter for the seed,
    and ONE broadcast join of the ≤ max_query_terms selected terms
    against the term table — no collect, no cartesian. A missing
    seed id yields an empty result (no terms to select), not an
    error."""
    if max_query_terms < 1 or top < 1:
        raise ValueError(
            f"need max_query_terms >= 1 and top >= 1, got "
            f"{max_query_terms}/{top}"
        )
    tf = (
        index.select(F.col(id_col), F.explode(tokenize(field)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = index.select(F.countDistinct(id_col)).collect()[0][0]
    selected = (
        tf.filter(F.col(id_col) == F.lit(seed_id))
        .filter(F.col("tf") >= F.lit(min_term_freq))
        .join(df_counts, "term")
        .filter(F.col("df") >= F.lit(min_doc_freq))
        .select(
            "term",
            (
                F.col("tf")
                * F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1)))
            ).alias("weight"),
        )
        .orderBy(F.desc("weight"), F.col("term"))
        .limit(max_query_terms)
    )
    return (
        tf.join(F.broadcast(selected), "term")
        .filter(F.col(id_col) != F.lit(seed_id))
        .groupBy(id_col)
        .agg(F.round(F.sum("weight"), 6).alias("mlt_score"))
        .orderBy(F.desc("mlt_score"), F.col(id_col))
        .limit(top)
    )


def bm25_prf(
    df: DataFrame,
    field: str,
    query: str,
    id_col: str,
    fb_docs: int = 10,
    fb_terms: int = 5,
    min_term_len: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 with pseudo-relevance feedback (RM3-style query
    expansion): score the original query, treat its top ``fb_docs``
    documents as relevant, harvest the ``fb_terms`` most frequent
    terms from them (excluding the original terms and tokens shorter
    than ``min_term_len``), and rescore the corpus with the expanded
    term set — the classic recall lever when the user's wording
    doesn't match the corpus's.

    Both sync points are BOUNDED driver collects (the
    kmeans/classifier convention): fb_docs ids, then fb_terms terms —
    never corpus-sized. Each scoring pass is ``bm25_scores``'s
    map-side shape. Fully deterministic: feedback docs by (rounded
    bm25 desc, id), expansion terms by (count desc, term asc) — an
    external engine replays the exact expanded term set and scores."""
    orig = sorted(set(_py_tokenize(query)))
    base = bm25_scores(df, field, query, id_col, k1, b)
    top_ids = [
        r[id_col]
        for r in base.orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(fb_docs)
        .collect()
    ]
    fb = (
        df.filter(F.col(id_col).isin(top_ids))
        .select(F.explode(tokenize(field)).alias("__tok"))
        .filter(
            (F.length("__tok") >= min_term_len) & ~F.col("__tok").isin(orig)
        )
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__tok"))
        .limit(fb_terms)
        .collect()
    )
    expanded = " ".join(sorted(set(orig) | {r["__tok"] for r in fb}))
    return bm25_scores(df, field, expanded, id_col, k1, b)


def rrf_fuse(
    systems: dict[str, DataFrame],
    id_col: str,
    k_candidates: int = 100,
    rrf_k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of several retrieval systems (Cormack et
    al. 2009 — the standard hybrid of lexical BM25 and embedding-cosine
    ranking): each system contributes floor(1e9 / (rrf_k + rank)) RRF
    points for the documents in its top ``k_candidates``, and documents
    are returned by total points. Output: (id, rrf, n_systems), points
    descending with id tie-break, limited to ``top`` when given.

    Every ``systems`` value is an (id, score) DataFrame whose SECOND
    column is the score; ranks are assigned by (score desc, id asc) —
    a deterministic total order, so ranking the top-k equals taking the
    top-k of the ranking and an external engine reproduces every rank.
    Points are INTEGER (scaled-reciprocal floor) rather than double
    1/(k+rank) sums, so the fused total is exact under any summation
    order in any engine — the same integer-determinism convention as
    the fingerprint/sketch operators.

    Plan shape per system: orderBy+limit compiles to a distributed
    TakeOrdered over the full score set; the rank window is
    unpartitioned but only ever sees those <= k_candidates survivors
    (the ``top_hits`` offset pattern). Fusion is a union of
    candidate-bounded lists and one tiny groupBy — the corpus-sized
    work stays inside each system's own scorer.
    """
    if not systems:
        raise ValueError("rrf_fuse needs at least one ranked system")
    if rrf_k < 1 or k_candidates < 1:
        raise ValueError(f"rrf_k/k_candidates must be >= 1, got {rrf_k}/{k_candidates}")
    from pyspark.sql import Window

    ranked = []
    for name, df in systems.items():
        # positional score-column contract, validated (r12 review #2):
        # a reordered frame would otherwise silently rank by the wrong
        # column and fuse a plausible-looking garbage ranking
        if len(df.columns) < 2 or id_col not in df.columns:
            raise ValueError(
                f"system {name!r} must have columns (id, score); got {df.columns}"
            )
        score = df.columns[1]
        if score == id_col:
            raise ValueError(
                f"system {name!r}: second column is the id column "
                f"{id_col!r}; the score must be column 2 — reorder with "
                f"select({id_col!r}, <score>)"
            )
        order = [F.col(score).desc(), F.col(id_col).asc()]
        w = Window.orderBy(*order)
        ranked.append(
            df.orderBy(*order)
            .limit(k_candidates)
            .withColumn("__rank", F.row_number().over(w))
            .select(
                F.col(id_col),
                F.floor(
                    F.lit(1_000_000_000) / (F.lit(rrf_k) + F.col("__rank"))
                ).alias("__pts"),
            )
        )
    allsys = ranked[0]
    for r in ranked[1:]:
        allsys = allsys.unionByName(r)
    fused = (
        allsys.groupBy(id_col)
        .agg(
            F.sum("__pts").alias("rrf"),
            F.count(F.lit(1)).alias("n_systems"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
    )
    return fused.limit(top) if top is not None else fused


def highlight(
    field: str,
    query: str,
    context_chars: int = 30,
    pre: str = "<em>",
    post: str = "</em>",
) -> Column:
    """Lucene-style highlight snippet: up to ``context_chars`` of
    context either side of the FIRST occurrence of the
    earliest-matching query token (case-insensitive substring match —
    the deterministic contract; analyzed-boundary matching is the
    ``match_*`` predicates' job), with the matched span wrapped in
    ``pre``/``post`` in its ORIGINAL case. NULL when no token occurs
    (the hit simply carries no snippet, like a Lucene response).

    Tie rule, engine-replayable: candidate = min by (position, token)
    over the sorted distinct query tokens — an array_min over (pos,
    token) structs, with absent tokens pushed to a sentinel position.
    Pure codegen string expressions, map-only."""
    f_ = F.col(field)
    toks = sorted(set(_py_tokenize(query)))
    if not toks:
        return F.lit(None).cast("string")
    sentinel = 1 << 31
    cands = F.array(
        *[
            F.struct(
                F.when(F.instr(F.lower(f_), t) > 0, F.instr(F.lower(f_), t))
                .otherwise(F.lit(sentinel))
                .alias("p"),
                F.lit(t).alias("t"),
            )
            for t in toks
        ]
    )
    best = F.array_min(cands)
    pos, tlen = best["p"], F.length(best["t"])
    start = F.greatest(pos - context_chars, F.lit(1))
    return F.when(
        pos < sentinel,
        F.concat(
            f_.substr(start, pos - start),
            F.lit(pre),
            f_.substr(pos, tlen),
            F.lit(post),
            f_.substr(pos + tlen, F.lit(context_chars)),
        ),
    ).otherwise(F.lit(None).cast("string"))


def facet_counts(
    df: DataFrame, fields: Sequence[str], top_n: int = 10
) -> DataFrame:
    """Terms-facet aggregation (the Lucene/NRTSearch facets sidecar of
    a search response): for each named field, the ``top_n`` most
    frequent values with their counts. Output (field, value, cnt,
    rank), rank 1..top_n per field by (count desc, value asc) — a
    deterministic total order. NULL field values carry no facet row
    (Lucene counts only present values).

    Plan shape: ONE corpus scan — the per-field pairs explode from an
    inline array (rows x |fields|, map-side) — then one
    partial-aggregatable groupBy(field, value) and a rank window over
    the AGGREGATED counts, partitioned by field. The window input is
    one row per distinct value, never the corpus; fields facetted in
    production are low-cardinality by design (that is what makes them
    facets), so per-field partitions stay small. Values are cast to
    string so heterogeneous field types coexist in one frame, exactly
    like a facet API response."""
    if not fields:
        raise ValueError("facet_counts needs at least one field")
    from pyspark.sql import Window

    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f_).alias("field"),
                            F.col(f_).cast("string").alias("value"),
                        )
                        for f_ in fields
                    ]
                )
            ).alias("p")
        )
        .select("p.field", "p.value")
        .where(F.col("value").isNotNull())
    )
    counts = pairs.groupBy("field", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("field").orderBy(
        F.col("cnt").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def histogram_facet(
    df: DataFrame, field: str, bin_width: float
) -> DataFrame:
    """Numeric range facet (Lucene's histogram/range aggregation next
    to the terms facet): rows bucket into fixed-width bins by
    floor(value / width), returning (bin, bin_lo, cnt) — bin_lo the
    bucket's inclusive lower edge, NULL values carrying no row (the
    facet_counts convention). One partial-aggregatable groupBy over a
    codegen projection; bins materialize only where data exists (no
    dense range blowup)."""
    if not bin_width > 0:
        raise ValueError(f"bin_width must be > 0, got {bin_width}")
    binned = df.where(F.col(field).isNotNull()).select(
        F.floor(F.col(field) / bin_width).cast("long").alias("bin")
    )
    return (
        binned.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bin_lo", F.round(F.col("bin") * bin_width, 6))
    )


_DATE_INTERVALS = ("hour", "day", "week", "month")


def date_histogram_facet(
    df: DataFrame,
    ts_field: str,
    interval: str,
    min_doc_count: int = 1,
) -> DataFrame:
    """Date-histogram facet (the Elasticsearch/NRTSearch
    date_histogram aggregation next to terms/histogram facets):
    events bucket by calendar interval via ``date_trunc``, returning
    (bucket, cnt). With ``min_doc_count=0`` the ES semantics apply —
    EVERY interval between the data's min and max bucket
    materializes, gaps carrying cnt 0 (one ``sequence()`` over the
    1-row bounds aggregate, broadcast-joined against the counts —
    the dense grid is interval-bounded, never row-bounded). NULL
    timestamps carry no row (the facet_counts convention); week
    buckets start Monday on both engines.

    Shape at scale: one partial-aggregatable groupBy over a codegen
    date_trunc; the densification side is grid-sized (hours between
    min and max), not corpus-sized."""
    if interval not in _DATE_INTERVALS:
        raise ValueError(
            f"interval must be one of {_DATE_INTERVALS}, got {interval!r}"
        )
    if min_doc_count < 0:
        raise ValueError(f"min_doc_count must be >= 0, got {min_doc_count}")
    buckets = (
        df.where(F.col(ts_field).isNotNull())
        .select(F.date_trunc(interval, F.col(ts_field)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_doc_count == 0:
        grid = (
            buckets.agg(
                F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
            )
            .where(F.col("mn").isNotNull())
            .select(
                F.explode(
                    F.expr(f"sequence(mn, mx, interval 1 {interval})")
                ).alias("bucket")
            )
        )
        return grid.join(buckets, "bucket", "left").select(
            "bucket", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
    return buckets.where(F.col("cnt") >= F.lit(min_doc_count))


def significant_terms(
    df: DataFrame,
    text_field: str,
    foreground: Column,
    top_n: int = 10,
    min_doc_count: int = 3,
) -> DataFrame:
    """Significant-terms aggregation (the Elasticsearch
    significant_terms bucket next to the plain terms facet): terms
    OVER-REPRESENTED in the ``foreground`` subset relative to the
    whole frame — "what is different about these hits", where a terms
    facet only says "what is common". Scored with JLH:

        jlh = (fg% - bg%) * (fg% / bg%)

    fg% = foreground doc frequency / foreground size, bg% = corpus
    doc frequency / corpus size — the absolute lift times the
    relative lift, ES's default heuristic. Terms in fewer than
    ``min_doc_count`` foreground docs drop (rare-term noise floor).
    Output (term, fg_count, bg_count, score 6dp) ranked by
    (score desc, term asc), top_n rows.

    Plan shape: ONE corpus scan — tokenize, explode DISTINCT terms
    per doc with the foreground flag carried through, then one
    partial-aggregatable groupBy(term) computing fg and bg doc
    frequencies together (fg_count = sum of flags); totals ride a
    1-row broadcast; the final rank is a distributed TakeOrdered
    (orderBy+limit), never a single-partition window over the
    vocabulary."""
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    if min_doc_count < 1:
        raise ValueError(f"min_doc_count must be >= 1, got {min_doc_count}")
    flagged = df.select(
        F.coalesce(foreground, F.lit(False)).cast("int").alias("__fg"),
        F.explode(F.array_distinct(tokenize(text_field))).alias("term"),
    )
    totals = df.select(
        F.count(F.lit(1)).alias("__n_bg"),
        F.sum(F.coalesce(foreground, F.lit(False)).cast("int")).alias(
            "__n_fg"
        ),
    )
    per_term = flagged.groupBy("term").agg(
        F.sum("__fg").cast("long").alias("fg_count"),
        F.count(F.lit(1)).cast("long").alias("bg_count"),
    )
    fg_pct = F.col("fg_count") / F.col("__n_fg")
    bg_pct = F.col("bg_count") / F.col("__n_bg")
    scored = (
        per_term.where(F.col("fg_count") >= F.lit(min_doc_count))
        .crossJoin(F.broadcast(totals))
        .where(F.col("__n_fg") > 0)
        .select(
            "term",
            "fg_count",
            "bg_count",
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col("term").asc()).limit(
        top_n
    )


def stats_facet(
    df: DataFrame,
    value_field: str,
    by: str,
) -> DataFrame:
    """Stats aggregation inside a terms bucket (the Elasticsearch
    ``stats`` sub-aggregation): per ``by`` value, (n, min, max, sum,
    avg) of the numeric ``value_field``. NULL metric values don't
    count toward n (ES semantics — n is the count of VALUES, not
    docs); NULL bucket keys carry no row (the facet_counts
    convention); all-NULL buckets report n=0 with NULL stats.

    One partial-aggregatable groupBy — bucket-count-sized output;
    sum/avg 6dp-rounded for engine-exact comparison."""
    per = (
        df.where(F.col(by).isNotNull())
        .groupBy(F.col(by).alias("bucket"))
        .agg(
            F.count(F.col(value_field)).cast("long").alias("n"),
            F.min(value_field).alias("min"),
            F.max(value_field).alias("max"),
            F.round(F.sum(value_field), 6).alias("sum"),
            F.round(F.avg(value_field), 6).alias("avg"),
        )
    )
    return per


def percentile_ranks_facet(
    df: DataFrame,
    value_field: str,
    values: Sequence[float],
) -> DataFrame:
    """Percentile-ranks aggregation (the Elasticsearch
    ``percentile_ranks`` twin of the percentiles facet, NEW r15): for
    each given value, the percentage of non-NULL ``value_field``
    entries at or below it — "what fraction of latencies beat 500ms".
    EXACT (one conditional sum per requested value in a single
    partial-aggregatable pass), where ES approximates with TDigest —
    same contract, deterministic answer. Output (value, pct 6dp)
    in the given order of ``values``; an all-NULL column yields pct
    NULL (no rank against nothing), ES's null_value-less behavior."""
    if not values:
        raise ValueError("percentile_ranks_facet needs at least one value")
    v = F.col(value_field)
    aggs = [F.count(v).cast("long").alias("__n")]
    for i, x in enumerate(values):
        aggs.append(
            F.sum(
                F.when(v <= F.lit(float(x)), F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias(f"__le{i}")
        )
    row = df.agg(*aggs)
    cols = []
    for i, x in enumerate(values):
        cols.append(
            F.struct(
                F.lit(float(x)).alias("value"),
                F.when(
                    F.col("__n") > 0,
                    F.round(
                        F.col(f"__le{i}") * F.lit(100.0) / F.col("__n"), 6
                    ),
                ).alias("pct"),
            )
        )
    return row.select(F.explode(F.array(*cols)).alias("s")).select(
        "s.value", "s.pct"
    )


def rare_terms(
    df: DataFrame,
    text_field: str,
    max_doc_count: int = 1,
    top_n: int = 100,
) -> DataFrame:
    """Rare-terms aggregation (the Elasticsearch ``rare_terms``
    bucket, NEW r15 — the long-tail inverse of the terms facet):
    analyzed terms appearing in AT MOST ``max_doc_count`` documents —
    the typo/outlier/contamination surface a top-N facet never shows.
    Output (term, cnt) ranked (cnt asc, term asc), ``top_n`` rows.

    Plan shape: one corpus scan — distinct terms per doc explode once,
    one partial-aggregatable groupBy(term), then a distributed
    TakeOrdered; the doc-count ceiling means the candidate set shrinks
    as the corpus grows (a term gains docs, it leaves the bucket), the
    property ES exploits with its CuckooFilter."""
    if max_doc_count < 1:
        raise ValueError(f"max_doc_count must be >= 1, got {max_doc_count}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    per_term = (
        df.select(
            F.explode(F.array_distinct(tokenize(text_field))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") <= F.lit(max_doc_count))
    )
    return per_term.orderBy(F.col("cnt").asc(), F.col("term").asc()).limit(
        top_n
    )


def composite_after(
    df: DataFrame,
    sources: Sequence[str],
    size: int = 10,
    after: dict | None = None,
) -> DataFrame:
    """Composite aggregation with after-key pagination (the
    Elasticsearch ``composite`` bucket, NEW r15): multi-field buckets
    in KEY order, a page at a time — the scale-safe way to enumerate
    a large bucket space (a terms facet must materialize and rank
    every bucket; composite streams them in key order, and the
    ``after`` key makes each page an independent query). ``after`` is
    the last key tuple of the previous page (dict of source ->
    value); rows with a NULL in any source drop (ES omits
    missing-bucket keys unless missing_bucket is set). Output: the
    source columns + doc_count, (sources asc) order, ``size`` rows.

    Plan shape: one partial-aggregatable groupBy over the sources, a
    codegen tuple-greater predicate for the page cut, then a
    distributed TakeOrdered — pagination never re-ranks the full
    bucket space."""
    if not sources:
        raise ValueError("composite_after needs at least one source field")
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    base = df
    for s in sources:
        base = base.where(F.col(s).isNotNull())
    buckets = base.groupBy(*[F.col(s) for s in sources]).agg(
        F.count(F.lit(1)).cast("long").alias("doc_count")
    )
    if after is not None:
        missing = [s for s in sources if s not in after]
        if missing:
            raise ValueError(
                f"after key must carry every source field; missing {missing}"
            )
        # tuple-lexicographic "key > after": (k1>a1) OR (k1=a1 AND k2>a2) ...
        pred = F.lit(False)
        eq_prefix = F.lit(True)
        for s in sources:
            pred = pred | (eq_prefix & (F.col(s) > F.lit(after[s])))
            eq_prefix = eq_prefix & (F.col(s) == F.lit(after[s]))
        buckets = buckets.where(pred)
    return buckets.orderBy(*[F.col(s).asc() for s in sources]).limit(size)


_PIPELINE_INTERVALS = ("hour", "day", "week", "month")


def date_histogram_pipeline(
    df: DataFrame,
    ts_field: str,
    interval: str,
    window: int = 3,
) -> DataFrame:
    """Pipeline aggregations over a dense date histogram (the
    Elasticsearch ``cumulative_sum`` / ``derivative`` / ``moving_avg``
    pipeline aggs in one readout, NEW r15): per calendar bucket, the
    doc count plus its running total, the bucket-over-bucket delta
    (NULL on the first bucket, ES's derivative contract), and the
    trailing ``window``-bucket mean (simple model, 6dp), computed
    over the GAP-FREE grid (min_doc_count=0 densification) so a
    silent interval contributes 0 to every pipeline stage instead of
    vanishing.

    The windows are unpartitioned ORDER BY bucket — over the
    interval-bounded grid, not the corpus (the survival_km
    curve-not-corpus rule): hours between min and max is a plot
    axis at any data scale."""
    if interval not in _PIPELINE_INTERVALS:
        raise ValueError(
            f"interval must be one of {_PIPELINE_INTERVALS}, got {interval!r}"
        )
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    from pyspark.sql.window import Window

    grid = date_histogram_facet(df, ts_field, interval, min_doc_count=0)
    w_all = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("bucket")
    w_mov = Window.orderBy("bucket").rowsBetween(-(window - 1), 0)
    return grid.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w_all).cast("long").alias("cum"),
        (F.col("cnt") - F.lag("cnt").over(w_prev)).cast("long").alias(
            "deriv"
        ),
        F.round(F.avg("cnt").over(w_mov), 6).alias("mov_avg"),
    )


_DECAY_FNS = ("exp", "gauss", "linear")


def decay_score(
    dist: Column,
    scale: float,
    decay: float = 0.5,
    fn: str = "gauss",
) -> Column:
    """Lucene/Elasticsearch function_score decay: a multiplicative
    relevance factor that falls from 1.0 at distance 0 to ``decay``
    at distance ``scale`` — the recency/geo boost primitive
    (score = base_score * decay_score(age)). ``dist`` is any
    non-negative numeric distance column (seconds of age, meters,
    price delta); the three ES shapes:

        exp:    exp(ln(decay)/scale * d)          — heavy tail
        gauss:  exp(-d^2 / (2 sigma^2)),
                sigma^2 = -scale^2 / (2 ln decay)  — flat top
        linear: max(0, (s - d)/s),
                s = scale / (1 - decay)            — hard zero

    Pure codegen arithmetic — compose it into any ranked query's
    ORDER BY; negative distances are clamped to 0 (ES's offset=0
    reading: at-origin or earlier is a full-strength match)."""
    import math

    if fn not in _DECAY_FNS:
        raise ValueError(f"fn must be one of {_DECAY_FNS}, got {fn!r}")
    if scale <= 0:
        raise ValueError(f"scale must be positive, got {scale}")
    if not (0.0 < decay < 1.0):
        raise ValueError(f"decay must be in (0, 1), got {decay}")
    d = F.greatest(dist.cast("double"), F.lit(0.0))
    if fn == "exp":
        lam = math.log(decay) / scale
        return F.exp(F.lit(lam) * d)
    if fn == "gauss":
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return F.exp(-(d * d) / F.lit(2.0 * sigma2))
    s = scale / (1.0 - decay)
    return F.greatest((F.lit(s) - d) / F.lit(s), F.lit(0.0))


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    text_field: str,
    id_field: str,
    query_id_field: str,
    terms_field: str,
    minimum_should_match: int | None = None,
) -> DataFrame:
    """Percolation — reverse search (Elasticsearch/Lucene percolate
    query): a table of REGISTERED term queries matched against
    incoming documents, the alerting/classification primitive ("which
    saved searches does this new doc satisfy?"). ``queries`` carries
    (query_id, array<string> terms); a document matches a query when
    its analyzed token set covers at least ``minimum_should_match``
    of the query's DISTINCT terms — default ALL of them (the
    AND/phrase-free percolator core). A query whose distinct-term
    count is BELOW ``minimum_should_match`` is UNMATCHABLE (matches
    no document) — Elasticsearch/Lucene semantics: msm is a
    requirement the query must meet, not a bound to clamp down to.
    Clamping would make an over-specified alert FIRE instead of
    staying silent (ADVICE r14).

    Output (doc id, query id) pairs, one per match.

    Scale shape: the registry explodes to (term, query) rows and
    BROADCASTS (saved-search registries are dictionary-sized next to
    a document corpus); documents explode to distinct tokens once and
    the match is one broadcast equi-join on term + one
    per-(doc, query) count-off — never a doc x query cross product.
    An empty-terms query matches NOTHING (it explodes to zero
    registry rows), deliberately the opposite of vacuous truth — a
    match-all row in an alerting registry is always a bug."""
    if minimum_should_match is not None and minimum_should_match < 1:
        raise ValueError(
            f"minimum_should_match must be >= 1, got {minimum_should_match}"
        )
    reg = queries.select(
        F.col(query_id_field).alias("__qid"),
        F.array_distinct(F.col(terms_field)).alias("__qterms"),
    )
    reg = reg.select(
        "__qid",
        F.size("__qterms").alias("__need"),
        F.explode("__qterms").alias("term"),
    )
    if minimum_should_match is not None:
        # ES semantics: msm REPLACES the all-terms requirement; a query
        # with fewer distinct terms than msm can never satisfy it, so
        # drop its registry rows entirely (it matches nothing) instead
        # of clamping down to all-terms-required
        reg = reg.where(
            F.col("__need") >= F.lit(minimum_should_match)
        ).withColumn("__need", F.lit(minimum_should_match))
    doc_terms = docs.select(
        F.col(id_field).alias("__did"),
        F.explode(F.array_distinct(tokenize(text_field))).alias("term"),
    )
    return (
        doc_terms.join(F.broadcast(reg), "term")
        .groupBy("__did", "__qid", "__need")
        .agg(F.count(F.lit(1)).alias("__got"))
        .where(F.col("__got") >= F.col("__need"))
        .select(
            F.col("__did").alias(id_field), F.col("__qid").alias(query_id_field)
        )
    )


def adjacency_matrix(
    df: DataFrame,
    filters: dict[str, Column],
    sep: str = "&",
) -> DataFrame:
    """Adjacency-matrix aggregation (the Elasticsearch
    ``adjacency_matrix`` bucket): given NAMED filters, the doc count
    of every filter and every pairwise intersection — the
    co-occurrence readout behind "users who are both mobile AND
    churned". Output (key, cnt) with singleton keys as given and
    intersection keys ``a&b`` (names sorted, ES's key convention);
    empty buckets are absent (ES omits zero-doc buckets). Filter
    names must not contain ``sep`` — rejected, they'd make keys
    ambiguous.

    Plan shape: ONE corpus scan — each row projects its matched-name
    array (k boolean codegen expressions), singleton + pair keys
    explode from that array (k + k²/2 per row worst case, filter
    count is API-bounded like ES's 100-filter cap), then one
    partial-aggregatable groupBy(key)."""
    if not filters:
        raise ValueError("adjacency_matrix needs at least one filter")
    names = sorted(filters)
    for n in names:
        if sep in n:
            raise ValueError(
                f"filter name {n!r} must not contain the separator {sep!r}"
            )
    matched = F.filter(
        F.array(
            *[
                F.when(F.coalesce(filters[n], F.lit(False)), F.lit(n))
                for n in names
            ]
        ),
        lambda x: x.isNotNull(),
    )
    # singletons + ordered pairs from the (sorted-name) matched array
    keys = F.flatten(
        F.transform(
            matched,
            lambda a, i: F.concat(
                F.array(a),
                F.transform(
                    F.slice(matched, i + 2, F.size(matched)),
                    lambda b: F.concat(a, F.lit(sep), b),
                ),
            ),
        )
    )
    return (
        df.select(F.explode(keys).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def terms_lookup(
    field: str,
    lookup: DataFrame,
    lookup_field: str,
    max_terms: int = 65536,
) -> Column:
    """TermsQuery with a LOOKUP side (the Elasticsearch terms-lookup
    variant of ``term_in_set``): membership against values read from
    another frame at query time — "docs whose id is in today's
    blocklist table" — instead of a literal list baked into the query.
    Compiles to ``isin`` over the collected lookup column, so the
    lookup frame must be dictionary-sized. ``max_terms`` enforces that
    contract the way ES's ``index.max_terms_count`` (default 65536)
    does: if the distinct non-NULL lookup values exceed it, raise
    instead of silently collecting an unbounded column into the driver
    (VERDICT r14 watch #3; the ``TooManyClauses`` precedent in
    text_index). For corpus-sized sets use a broadcast semi-join
    instead (``term_in_set``'s documented scale path). NULL lookup
    values are dropped (a NULL never term-matches)."""
    if max_terms < 1:
        raise ValueError(f"max_terms must be >= 1, got {max_terms}")
    # limit(max_terms + 1): bounds the collect itself, so an over-limit
    # lookup costs one extra row, not a driver OOM before the check
    values = [
        r[0]
        for r in lookup.select(lookup_field)
        .where(F.col(lookup_field).isNotNull())
        .distinct()
        .limit(max_terms + 1)
        .collect()
    ]
    if len(values) > max_terms:
        raise ValueError(
            f"terms_lookup: lookup column {lookup_field!r} has more than "
            f"max_terms={max_terms} distinct values; use a broadcast "
            f"semi-join (term_in_set scale path) for corpus-sized sets"
        )
    return F.col(field).isin(values) if values else F.lit(False)


def percolate_stream_append(
    batch: DataFrame,
    queries: DataFrame,
    text_field: str,
    id_field: str,
    query_id_field: str,
    terms_field: str,
    path: str,
    minimum_should_match: int | None = None,
) -> None:
    """``foreachBatch`` body for STREAMING percolation — the alerting
    deployment the percolator exists for: each micro-batch's documents
    match against the registered queries and the (doc, query) hits
    append to the alert log at ``path``. Alert rows are SET-SEMANTIC
    (a replayed batch re-derives exactly the same matches, and a
    re-ingested doc re-matches the same queries), so at-least-once
    delivery needs no epoch pin — ``read_alerts``'s distinct collapses
    replays, the ``append_band_key_index`` discipline. Per batch: one
    broadcast join against the registry + one append write; never a
    read of the accumulated log."""
    matches = percolate(
        batch,
        queries,
        text_field,
        id_field,
        query_id_field,
        terms_field,
        minimum_should_match=minimum_should_match,
    )
    matches.write.mode("append").parquet(path)


def read_alerts(spark, path: str) -> DataFrame:
    """The accumulated percolation alerts: distinct (doc, query) hits
    over everything ingested — equals the one-shot batch ``percolate``
    over the full corpus (the oracle's check). Raises if no batch has
    ever appended (an alert log that was never written is a wiring
    bug, not an empty result)."""
    return spark.read.parquet(path).distinct()


def collapse_topk(
    index: DataFrame,
    collapse_field: str,
    order_by: str,
    k: int,
    descending: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Field collapsing (Elasticsearch ``collapse`` / Lucene grouping):
    ONE representative hit per ``collapse_field`` group — the group's
    best row by ``order_by`` — plus the group's total hit count
    (``inner_hits`` cardinality), keeping the ``k`` groups whose best
    hit ranks highest. The dedup-at-serving-time query shape (one
    result per domain/author/product).

    ``tie_break`` names a unique column (the doc id) to make the
    per-group champion deterministic when ``order_by`` ties — required
    whenever the sort key isn't unique, the ``event_transitions``
    contract. NULL group keys collapse as their own group (ES
    semantics); NULL sort keys rank last.

    Output: all of the champion row's columns + ``group_count``,
    ranked (order_by desc/asc, tie_break, collapse_field), k rows.

    Scale shape: one window per group (row_number + count share the
    partitioning — one shuffle on the collapse key) then a
    distributed TakeOrdered for the final k — never a global sort of
    the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if "group_count" in index.columns:
        # the output contract adds group_count; silently overwriting a
        # caller column of that name would lose data (ADVICE r14)
        raise ValueError(
            "collapse_topk: input already has a 'group_count' column — "
            "rename it before collapsing (the output adds its own)"
        )
    from pyspark.sql.window import Window

    key = F.col(order_by)
    order = [key.desc_nulls_last() if descending else key.asc_nulls_last()]
    if tie_break:
        order.append(F.col(tie_break).asc())
    w = Window.partitionBy(F.col(collapse_field)).orderBy(*order)
    champs = (
        index.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "group_count",
            F.count(F.lit(1))
            .over(Window.partitionBy(F.col(collapse_field)))
            .cast("long"),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    final_order = list(order) + [F.col(collapse_field).asc()]
    return champs.orderBy(*final_order).limit(k)


def retrieve_fields(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    return df.select(*fields)


def search(
    index: DataFrame,
    query: Column | None = None,
    top: int | None = None,
    start_hit: int = 0,
    fields: Sequence[str] | None = None,
    order_by: str | None = None,
    descending: bool = False,
) -> DataFrame:
    """SearchRequest equivalent: filter + top-k + projection.

    Ranking happens BEFORE field retrieval (Lucene sorts by fields the
    response need not return), so ``order_by`` may name a column
    outside ``fields``; Catalyst prunes it from the scan output after
    the sort either way. When ``order_by`` is None and ``fields`` is
    given, the implicit sort key is ``fields[0]`` — the contract from
    when retrieval ran first — not the index's first column."""
    out = index if query is None else index.filter(query)
    if top is not None:
        if order_by is None and fields:
            order_by = fields[0]
        out = top_hits(out, top, start_hit=start_hit, order_by=order_by, descending=descending)
    if fields:
        out = retrieve_fields(out, fields)
    return out
