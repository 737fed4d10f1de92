"""Chat / SFT (supervised fine-tuning) data preparation.

Instruction-tuning corpora are conversations — arrays of (role,
content) turns — not flat documents, and the curation pipeline needs
turn-STRUCTURE operators the document operators can't express: render
a turn list into the single training string a trainer consumes,
validate role alternation, gate on turn counts and empty assistant
replies, and dedup by what the model actually learns from (the
assistant responses), not by surface document bytes.

The conversation type is the plain Spark SQL shape
``array<struct<role:string, content:string>>`` — what
``spark.read.json`` produces for the ubiquitous
``{"messages": [{"role": ..., "content": ...}]}`` interchange format.

Everything here is Catalyst higher-order functions (transform /
aggregate / exists / zip_with) over that array — zero Python in the
row path, so the operators stay inside whole-stage codegen and an
external SQL engine replays every output (the rendered string, the
stats, the dedup keeps) exactly. Scale shape: render/stats/gate are
map-only projections (no shuffle at any corpus size); the dedup is
one hash groupBy — the exact-dedup pattern — on a sha2 of the
assistant transcript, never on the raw text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TURNS_TYPE = "array<struct<role:string,content:string>>"


def _turns(turns_col: Column | str) -> Column:
    return F.col(turns_col) if isinstance(turns_col, str) else turns_col


def render_chat(
    turns_col: Column | str,
    turn_start: str = "<|im_start|>",
    turn_end: str = "<|im_end|>",
) -> Column:
    """The turn list rendered to ONE training string — ChatML-style
    ``{turn_start}{role}\\n{content}{turn_end}\\n`` per turn, in turn
    order. A left-fold (F.aggregate) so the concatenation order is the
    array order by construction; NULL content renders as empty (the
    whole-string alternative would nullify the full conversation on
    one missing turn). Map-only, codegen."""
    return F.aggregate(
        _turns(turns_col),
        F.lit(""),
        lambda acc, t: F.concat(
            acc,
            F.lit(turn_start),
            F.coalesce(t["role"], F.lit("")),
            F.lit("\n"),
            F.coalesce(t["content"], F.lit("")),
            F.lit(turn_end),
            F.lit("\n"),
        ),
    )


def chat_turn_stats(turns_col: Column | str) -> dict[str, Column]:
    """Structural statistics of a conversation, as named Columns (use
    with ``df.select(id, **chat_turn_stats(...))`` or
    ``with_chat_stats``):

    - n_turns, n_user, n_assistant — turn counts by role
    - assistant_chars — total assistant content length (what the loss
      is computed on; NULL content counts 0)
    - starts_with_user — first turn's role is 'user'
    - alternates — no two CONSECUTIVE turns share a role (the standard
      SFT well-formedness check; vacuously true under 2 turns)
    - has_empty_assistant — any assistant turn with NULL/'' content

    All array-local expressions: zip_with of the array against its own
    tail for adjacency, filter+size for the counts. Map-only."""
    t = _turns(turns_col)
    role = lambda x: x["role"]  # noqa: E731
    content = lambda x: x["content"]  # noqa: E731
    tail = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
    return {
        "n_turns": F.size(t).alias("n_turns"),
        "n_user": F.size(F.filter(t, lambda x: role(x) == "user")).alias("n_user"),
        "n_assistant": F.size(
            F.filter(t, lambda x: role(x) == "assistant")
        ).alias("n_assistant"),
        "assistant_chars": F.aggregate(
            F.filter(t, lambda x: role(x) == "assistant"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(F.coalesce(content(x), F.lit(""))),
        ).alias("assistant_chars"),
        "starts_with_user": (
            F.coalesce(F.element_at(t, 1)["role"] == "user", F.lit(False))
        ).alias("starts_with_user"),
        "alternates": (
            ~F.exists(
                F.zip_with(t, tail, lambda a, b: role(a) == role(b)),
                lambda x: F.coalesce(x, F.lit(False)),
            )
        ).alias("alternates"),
        "has_empty_assistant": F.exists(
            t,
            # coalesce the whole predicate: a NULL role makes
            # (NULL == 'assistant') & ... three-valued NULL, and an
            # all-NULL/false array gives exists() -> NULL, poisoning
            # sft_gate and boolean aggregates (r12 review #5)
            lambda x: F.coalesce(
                (role(x) == "assistant")
                & (F.coalesce(content(x), F.lit("")) == ""),
                F.lit(False),
            ),
        ).alias("has_empty_assistant"),
    }


def with_chat_stats(
    df: DataFrame, turns_col: str = "turns"
) -> DataFrame:
    """``df`` plus the ``chat_turn_stats`` columns."""
    return df.select("*", *chat_turn_stats(turns_col).values())


def sft_gate(
    turns_col: Column | str,
    min_turns: int = 2,
    max_turns: int = 64,
) -> Column:
    """The standard SFT structural admission predicate: turn count in
    [min_turns, max_turns], opens with a user turn, roles strictly
    alternate, at least one assistant turn, and no empty assistant
    reply. One boolean expression — compose with ``df.filter`` and it
    stays a zero-shuffle codegen projection like the Gopher/C4 rule
    gates."""
    s = chat_turn_stats(turns_col)
    return (
        (F.size(_turns(turns_col)) >= min_turns)
        & (F.size(_turns(turns_col)) <= max_turns)
        & s["starts_with_user"]
        & s["alternates"]
        & (s["n_assistant"] > 0)
        & ~s["has_empty_assistant"]
    )


def render_chat_with_spans(
    turns_col: Column | str,
    turn_start: str = "<|im_start|>",
    turn_end: str = "<|im_end|>",
) -> Column:
    """``render_chat`` plus the assistant-content character spans the
    trainer needs for LOSS MASKING — SFT computes loss only on
    assistant tokens, so the rendered string alone is not a training
    example; the (start, end) offsets of each assistant turn's content
    are part of the artifact.

    Returns struct(rendered string, spans array<struct<s, e>>):
    1-based inclusive start / exclusive end character offsets of each
    assistant turn's CONTENT inside ``rendered`` (header and
    terminator excluded), in turn order. One left-fold with a struct
    accumulator carrying (text-so-far, spans-so-far) — the offsets
    come from the fold's own running length, so they are correct by
    construction for any role/content mix, and the whole thing stays
    a map-only codegen projection. NULL content contributes an empty
    (s == e) span, matching ``render_chat``'s empty rendering."""
    def step(acc, t):
        role = F.coalesce(t["role"], F.lit(""))
        content = F.coalesce(t["content"], F.lit(""))
        head_len = (
            F.length(acc["txt"])
            + F.lit(len(turn_start))
            + F.length(role)
            + F.lit(1)  # the \n after the role
        )
        new_txt = F.concat(
            acc["txt"],
            F.lit(turn_start), role, F.lit("\n"), content,
            F.lit(turn_end), F.lit("\n"),
        )
        span = F.struct(
            (head_len + 1).cast("int").alias("s"),
            (head_len + 1 + F.length(content)).cast("int").alias("e"),
        )
        return F.struct(
            new_txt.alias("txt"),
            F.when(
                t["role"] == "assistant",
                F.concat(acc["spans"], F.array(span)),
            )
            .otherwise(acc["spans"])
            .alias("spans"),
        )

    folded = F.aggregate(
        _turns(turns_col),
        F.struct(
            F.lit("").alias("txt"),
            F.array().cast("array<struct<s:int,e:int>>").alias("spans"),
        ),
        step,
    )
    return F.struct(
        folded["txt"].alias("rendered"), folded["spans"].alias("spans")
    )


def assemble_conversations(
    df: DataFrame,
    group_col: str,
    role_col: str,
    content_col: str,
    order_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Interaction logs -> conversations: one row per ``group_col``
    (a session/user/thread id) whose ``turns`` array holds the
    group's (role, content) rows in ``order_col`` order — the INVERSE
    of flattening, and the first step of building SFT data from
    production logs (feed the result to sft_gate / assistant_dedup /
    render_chat_with_spans / pack_sft).

    Order inside a conversation is made deterministic without a sort
    exchange: each element carries its order key into collect_list
    and array_sort restores it after aggregation (the
    materialize_packs convention — collect_list order is
    partition-dependent). Ties on ``order_col`` break on content so
    the result is still a total order. One partial-aggregatable
    groupBy; per-group state is session-sized, never corpus-sized.
    Output: (group, n_turns, turns).

    ``order_col`` must be non-null: a NULL order key has no defined
    position (engines disagree on null placement inside struct
    sorts), so it raises instead of silently producing an
    engine-dependent turn order (r13 review #3, the length_batches
    fail-loud convention)."""
    raw_order = F.col(order_col)
    checked_order = F.when(
        raw_order.isNull(),
        F.raise_error(
            F.lit(
                f"assemble_conversations: {order_col} must be non-null "
                "(a NULL order key makes turn order engine-dependent)"
            )
        ).cast(df.schema[order_col].dataType),
    ).otherwise(raw_order)
    elem = F.struct(
        checked_order.alias("o"),
        F.coalesce(F.col(content_col).cast("string"), F.lit("")).alias("c"),
        F.coalesce(F.col(role_col).cast("string"), F.lit("")).alias("r"),
    )
    return (
        df.groupBy(F.col(group_col).alias("group"))
        .agg(F.array_sort(F.collect_list(elem)).alias("__parts"))
        .select(
            "group",
            F.size("__parts").alias("n_turns"),
            F.transform(
                "__parts",
                lambda s: F.struct(
                    s["r"].alias("role"), s["c"].alias("content")
                ),
            ).alias("turns"),
        )
    )


def pack_sft(
    df: DataFrame,
    id_col: str = "doc_id",
    turns_col: str = "turns",
    target_chars: int = 2048,
    n_shards: int = 4,
    salt: str = "shuffle",
    sep: str = "\n",
) -> DataFrame:
    """The SFT pipeline's end step: rendered conversations packed into
    context windows with every assistant loss-mask span SHIFTED to its
    position inside the pack — rendering, packing and masking must
    move together or the mask silently points at the wrong bytes.

    Layout is ``export.pack_bins``'s deterministic concatenate-then-
    chunk scheme over rendered length (deterministic shuffle order,
    one cumsum window per shard); a conversation's char base inside
    its pack is (offset - pack's first offset) + index_in_pack *
    len(sep) — pure arithmetic on the pack_bins columns, exactly the
    join ``materialize_packs`` performs with ``sep``. Output: one row
    per shifted span, (shard, bin, id, span_no, s, e) — 1-based
    inclusive/exclusive offsets into the materialized pack text.

    Scale shape: one render projection (map-only), the pack_bins
    cumsum window per shard, and one (shard, bin)-partitioned window
    whose partitions are pack-sized by construction. Invariant (the
    property test): pack_text[s-1:e-1] == the assistant turn's
    content, for every span in every pack."""
    from pyspark.sql import Window

    from platypus_ingestion_plugins_spark.operators.export import pack_bins

    rs = render_chat_with_spans(turns_col, turn_start="<|im_start|>")
    base = (
        # zero-turn conversations render to '' — no training signal,
        # and a zero-length member would TIE the cumsum offsets of
        # adjacent docs, making the in-pack order (and so every later
        # doc's char base) nondeterministic vs materialize_packs'
        # (offset, text) sort. Excluded up front; every kept doc has
        # length >= the turn framing, so offsets are strictly
        # increasing and order ties cannot occur.
        df.filter(F.size(_turns(turns_col)) > 0)
        .select(F.col(id_col), rs.alias("__rs"))
        .select(
            id_col,
            F.col("__rs.rendered").alias("__text"),
            F.col("__rs.spans").alias("__spans"),
        )
        .withColumn("__n", F.length("__text"))
    )
    packed = pack_bins(base, id_col, "__n", target_chars, n_shards, salt)
    wp = Window.partitionBy("shard", "bin")
    wo = Window.partitionBy("shard", "bin").orderBy("offset")
    with_base = (
        packed.withColumn(
            "__char_base",
            (F.col("offset") - F.min("offset").over(wp))
            + (F.row_number().over(wo) - 1) * len(sep),
        )
    )
    return with_base.select(
        "shard",
        "bin",
        F.col(id_col),
        F.posexplode("__spans").alias("span_no", "__sp"),
        "__char_base",
    ).select(
        "shard",
        "bin",
        id_col,
        "span_no",
        (F.col("__sp.s") + F.col("__char_base")).cast("int").alias("s"),
        (F.col("__sp.e") + F.col("__char_base")).cast("int").alias("e"),
    )


def assistant_transcript_key(turns_col: Column | str) -> Column:
    """Dedup key: sha2-256 of the assistant turns' contents, each
    serialized as ``<char_length>:<content>\\x1f``. The length prefix
    is what makes the framing injection-safe: a bare separator join is
    not (turns ``['a\\x1fb']`` and ``['a', 'b']`` both flatten to
    ``a\\x1fb\\x1f`` — r12 advice), while with the prefix they
    serialize to ``3:a\\x1fb\\x1f`` vs ``1:a\\x1f1:b\\x1f``, distinct
    regardless of what bytes the content holds. Two conversations that
    teach
    the model the same responses dedup together even when their user
    prompts were paraphrased — response-level dedup is the SFT
    analogue of document exact-dedup.

    NULL for a conversation with NO assistant turns: an empty
    transcript is the ABSENCE of a dedup key, not a key — hashing it
    would collapse every assistant-free conversation into one
    arbitrary survivor (r12 review #3). A NULL-role turn is not an
    assistant turn (the filter predicate's NULL drops it)."""
    assistant = F.filter(
        _turns(turns_col), lambda x: x["role"] == "assistant"
    )
    joined = F.aggregate(
        assistant,
        F.lit(""),
        lambda acc, x: F.concat(
            acc,
            F.length(F.coalesce(x["content"], F.lit(""))).cast("string"),
            F.lit(":"),
            F.coalesce(x["content"], F.lit("")),
            F.lit("\x1f"),
        ),
    )
    return F.when(F.size(assistant) > 0, F.sha2(joined, 256))


def assistant_dedup(
    df: DataFrame, id_col: str = "doc_id", turns_col: str = "turns"
) -> DataFrame:
    """Keep the smallest-id conversation per distinct assistant
    transcript (``assistant_transcript_key``); conversations with no
    assistant turns carry a NULL key and all pass through — they are
    not duplicates of each other (run ``sft_gate`` to reject them
    structurally). One partial-aggregatable groupBy on the 64-hex key
    — ids-only shuffle, the exact-dedup scale shape — then an ids
    semi-join back, so conversation payloads never shuffle."""
    keyed = df.withColumn("__atk", assistant_transcript_key(turns_col))
    keep = (
        keyed.filter(F.col("__atk").isNotNull())
        .groupBy("__atk")
        .agg(F.min(id_col).alias(id_col))
    )
    survivors = keyed.join(keep.select(id_col), id_col, "semi")
    return survivors.unionByName(
        keyed.filter(F.col("__atk").isNull())
    ).drop("__atk")


def build_preference_pairs(
    df: DataFrame,
    prompt_col: str,
    completion_col: str,
    score_col: str,
    id_col: str,
    margin_min: float = 0.0,
) -> DataFrame:
    """Preference-pair preparation (the DPO/RLHF reward-data shape):
    per prompt, pair the highest-scored completion (chosen) with the
    lowest-scored one (rejected). Ranking is total — (score desc, id)
    and (score asc, id) — so the pair is a pure function of the
    input; prompts with fewer than two completions, a degenerate pair
    (chosen == rejected), or a margin at-or-below ``margin_min`` are
    dropped (margin 0 means the ranker couldn't tell the completions
    apart — training on it teaches noise; raise ``margin_min`` to
    keep only confidently-separated pairs).

    Two prompt-partitioned windows (per-prompt candidate counts, not
    corpus-sized) + one row-local filter. Output: (prompt, chosen,
    rejected, chosen_score, rejected_score, margin 6dp,
    chosen_id, rejected_id)."""
    from pyspark.sql.window import Window

    base = df.select(
        F.col(prompt_col).alias("prompt"),
        F.col(completion_col).alias("completion"),
        F.col(score_col).cast("double").alias("score"),
        F.col(id_col).alias("cid"),
    ).where(F.col("score").isNotNull())
    w_best = Window.partitionBy("prompt").orderBy(
        F.desc("score"), F.col("cid")
    )
    w_worst = Window.partitionBy("prompt").orderBy(
        F.col("score"), F.col("cid")
    )
    ranked = base.select(
        "*",
        F.row_number().over(w_best).alias("_rb"),
        F.row_number().over(w_worst).alias("_rw"),
        F.count(F.lit(1)).over(Window.partitionBy("prompt")).alias("_n"),
    ).where((F.col("_rb") == 1) | (F.col("_rw") == 1))
    best = ranked.where(F.col("_rb") == 1).select(
        "prompt",
        F.col("completion").alias("chosen"),
        F.col("score").alias("chosen_score"),
        F.col("cid").alias("chosen_id"),
        "_n",
    )
    worst = ranked.where(F.col("_rw") == 1).select(
        "prompt",
        F.col("completion").alias("rejected"),
        F.col("score").alias("rejected_score"),
        F.col("cid").alias("rejected_id"),
    )
    return (
        best.join(worst, "prompt")
        .where(
            (F.col("_n") >= 2)
            & (F.col("chosen_id") != F.col("rejected_id"))
            & (
                F.col("chosen_score") - F.col("rejected_score")
                > F.lit(float(margin_min))
            )
        )
        .select(
            "prompt",
            "chosen",
            "rejected",
            "chosen_score",
            "rejected_score",
            F.round(
                F.col("chosen_score") - F.col("rejected_score"), 6
            ).alias("margin"),
            "chosen_id",
            "rejected_id",
        )
    )
