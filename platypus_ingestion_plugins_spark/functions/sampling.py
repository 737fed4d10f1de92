"""Deterministic sampling and dataset splitting.

`df.sample()` is seed-dependent per partition layout — the same call
over the same data returns DIFFERENT rows after a repartition or an
engine change, which is poison for reproducible training sets. These
operators key every decision off a content hash (same md5→unit trick
as functions/sketches.py), so:

- membership is a pure function of the row's key — stable across
  engines, partitionings, retries, and re-runs (an external oracle
  reproduces the exact row set, not just the expected size);
- sampling composes with incremental data: yesterday's rows keep
  yesterday's decisions when new rows arrive;
- everything is a codegen-able filter/projection — no RNG state, no
  shuffle, pushes through column pruning like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(16**15)


def cap_per_group(
    df,
    id_col: str,
    group_col: str,
    k: int,
    salt: str = "cap",
):
    """Deterministic fixed-COUNT cap per group: keep each group's k
    smallest-hash rows — the heavy-tail guard a pretraining mix needs
    when one domain/source dwarfs the rest (temperature_mix reweights
    by RATE; this bounds absolute count). Hash-order membership makes
    the kept set a uniform sample of the group that is stable across
    reruns, partitionings, and engine (same md5 trick as hash_split),
    and INCREMENTALLY stable: a group already at its cap only swaps a
    row out when a new row hashes below one of the kept k, never
    reshuffles wholesale. One window shuffle on the group; per-group
    state is the rank counter. Groups under k keep every row."""
    from pyspark.sql.window import Window

    u = unit_hash(id_col, salt)
    w = Window.partitionBy(group_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def unit_hash(col: Column | str, salt: str = "") -> Column:
    """Uniform [0,1) hash of a key column (md5, engine-independent).
    Distinct ``salt`` values give independent hash functions — use a
    different salt per decision so sampling and splitting don't
    correlate."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        / F.lit(_HASH_SPACE)
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction``. Exactly
    reproducible; approximately ``fraction`` of distinct keys (exact
    membership, binomial size)."""
    return df.filter(unit_hash(key, salt) < fraction)


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0, salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum ``s`` keeps
    ``fractions[s]`` of its rows (unlisted strata keep
    ``default_fraction``). The per-row threshold is a CASE projection;
    the whole operator is one codegen filter."""
    thr = F.lit(default_fraction)
    for s, f in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(f)).otherwise(thr)
    return df.filter(unit_hash(key, salt) < thr)


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], salt: str = "split"
) -> DataFrame:
    """Assign every row a split label (train/val/test/...) by hash
    thresholds proportional to ``weights``. Deterministic, disjoint,
    exhaustive; a key always lands in the same split — across runs,
    engines, and data growth. Adds a ``split`` column."""
    total = sum(weights.values())
    h = unit_hash(key, salt)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = h < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def leakage_free_split(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    weights: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Group-aware train/val/test assignment — the split that keeps
    near-duplicates OUT of each other's splits: every member of a
    duplicate group (``connected_components_star`` output:
    (id_col, group_id)) hashes by its GROUP key, so a test document's
    near-twin can never land in train (the eval-leakage mode a
    row-hash split like ``hash_split(id)`` cannot prevent). Documents
    absent from ``groups`` are singletons and hash by their own id
    (the ``pick_survivors`` left-join-coalesce convention — pair-driven
    CC output only labels clustered docs, so the groups side stays
    duplicate-sized, not corpus-sized). Because the split key is the
    group id (min reachable id), growing a cluster never moves its
    existing members unless the minimum itself changes — and when it
    does, the whole group moves TOGETHER, preserving the invariant.

    Output: ``df``'s columns + ``group_id`` (coalesced effective key)
    + ``split``. One shuffle join df⋈groups + the codegen hash CASE;
    deterministic across runs and engines (md5 ``unit_hash``)."""
    if "group_id" in df.columns:
        # the join would carry two group_id columns and the coalesce
        # below would be ambiguous — fail loudly instead of resolving
        # to whichever side the analyzer happens to pick
        raise ValueError(
            "df already has a group_id column; rename it before "
            "leakage_free_split"
        )
    out = df.join(groups, id_col, "left").withColumn(
        "group_id", F.coalesce(F.col("group_id"), F.col(id_col))
    )
    out = hash_split(
        out.withColumn("_gkey", F.col("group_id").cast("string")),
        "_gkey",
        weights,
        salt=salt,
    )
    return out.drop("_gkey")


def temperature_mix(
    df: DataFrame,
    key: str,
    strata_col: str,
    alpha: float = 0.5,
    total_fraction: float = 0.3,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-pretraining
    resampling scheme, e.g. XLM-R): stratum ``s`` with ``n_s`` rows
    receives sample share ``q_s = n_s^alpha / sum_t n_t^alpha`` —
    ``alpha < 1`` up-weights small domains against head domains — and
    an expected total of ``total_fraction`` of the corpus. The per-row
    keep rate ``min(1, f*N*q_s/n_s)`` is computed from one per-stratum
    count aggregate (broadcast back — strata counts are tiny), and
    membership is the deterministic ``unit_hash`` decision, so the
    exact sampled row set is reproducible by an external engine.

    Rows keep their columns; strata missing from ``df`` can't occur by
    construction (rates derive from the same frame). A NULL stratum is
    a stratum like any other — the rate join is null-safe, so
    null-stratum rows are sampled at their group's rate instead of
    being silently dropped by an equi-join."""
    from pyspark.sql.window import Window

    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    # corpus totals via an unpartitioned window over the strata-count
    # frame — bounded by the stratum count, and avoids the ambiguous
    # self-join a counts.agg + crossJoin would create
    w = Window.partitionBy()
    big_n = F.sum("__n").over(w)
    z = F.sum(F.pow("__n", F.lit(alpha))).over(w)
    rates = counts.select(
        F.col(strata_col).alias("__stratum"),
        F.least(
            F.lit(1.0),
            F.lit(total_fraction)
            * big_n
            * F.pow("__n", F.lit(alpha))
            / (z * F.col("__n")),
        ).alias("__rate"),
    )
    return (
        df.join(
            F.broadcast(rates),
            F.col(strata_col).eqNullSafe(F.col("__stratum")),
        )
        .filter(unit_hash(key, salt) < F.col("__rate"))
        .drop("__stratum", "__rate")
    )


def select_token_budget(
    df: DataFrame,
    key: str,
    token_col: str,
    budget: int,
    by: str | None = None,
    priority_col: str | None = None,
    salt: str = "budget",
    buckets: int = 1024,
) -> DataFrame:
    """Fill a token budget with the highest-priority rows — the
    "select N tokens of training data" step every mix spec ends in.
    Rows are taken in (priority desc, key asc) order (total order —
    ``key`` breaks ties deterministically); without ``priority_col``
    the order is the deterministic ``unit_hash`` permutation (a
    reproducible random fill, same family as ``deterministic_sample``).
    A row is KEPT iff its inclusive running token sum is <= ``budget``
    (hard cap: the selection never exceeds the budget; the boundary
    document that would cross it is dropped). Columns pass through.

    Scale shape — the naive form is one global-ORDER-BY window, i.e.
    every row through ONE reducer; at corpus scale that task is the
    job. Instead:

    * ``by`` given: the budget applies PER GROUP and the running sum
      is a partitioned window — shuffle by group key, parallel across
      groups, no global order. The right call for per-domain /
      per-language budgets (compose with ``temperature_mix`` shares).
    * global (``by=None``): two-phase bucketed selection. Rows land in
      ``buckets`` priority-ordered buckets (hash order: uniform
      ``floor(u*B)``; priority order: broadcast approx_percentile
      split points — bucketing only needs to be deterministic and
      order-respecting, exactness stays with phase 2). One bounded
      aggregate sums tokens per bucket; the driver prefix-sums B rows
      to find the CUT bucket; better buckets keep wholesale as a
      filter, and only the cut bucket's ~1/B of the corpus pays a
      window — partitioned by bucket, so still no global exchange.

    Determinism caveat (global + ``priority_col``): the split points
    come from ``approx_percentile``, so the BUCKETING of a given run
    is data-dependent; the SELECTED SET is still exactly the
    (priority desc, key) prefix fitting the budget — split points only
    decide which rows take the fine-window path, not the outcome —
    except that rows tied on priority ACROSS a split boundary share a
    bucket by construction (``s < p`` comparison), keeping the within-
    priority key order intact."""
    from pyspark.sql.window import Window

    tok = F.col(token_col).cast("long")
    if by is not None:
        order = (
            [F.col(priority_col).desc(), F.col(key)]
            if priority_col
            else [unit_hash(key, salt), F.col(key)]
        )
        w = (
            Window.partitionBy(by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            df.withColumn("__cum", F.sum(tok).over(w))
            .filter(F.col("__cum") <= budget)
            .drop("__cum")
        )

    if priority_col is None:
        u = unit_hash(key, salt)
        # ascending bucket id = selection order (hash order has no
        # better/worse, just a fixed permutation)
        bucket = F.least(F.floor(u * buckets), F.lit(buckets - 1)).cast("int")
        order_in_bucket = [u, F.col(key)]
        bucket_sel_order = range(buckets)  # take buckets 0,1,2,...
    else:
        p = F.col(priority_col).cast("double")
        qs = [i / buckets for i in range(1, buckets)]
        splits = df.agg(
            F.percentile_approx(p, F.array(*[F.lit(q) for q in qs]), 10_000)
        ).collect()[0][0] or []
        lit_splits = F.array(*[F.lit(float(s)) for s in splits])
        # strict '<' puts priority values equal to a split point in the
        # HIGHER bucket with their ties; id B-1 = highest priorities
        bucket = F.size(F.filter(lit_splits, lambda s: s < p)).cast("int")
        order_in_bucket = [p.desc(), F.col(key)]
        bucket_sel_order = range(buckets - 1, -1, -1)  # best first

    tagged = df.withColumn("__b", bucket)
    per_bucket = {
        r["__b"]: r["__t"]
        for r in tagged.groupBy("__b").agg(F.sum(tok).alias("__t")).collect()
    }
    spent = 0
    full, cut = [], None
    for b in bucket_sel_order:
        t = per_bucket.get(b, 0) or 0
        if spent + t <= budget:
            full.append(b)
            spent += t
        else:
            cut = b
            break
    keep_full = tagged.filter(F.col("__b").isin(full)) if full else None
    if cut is None:
        return keep_full.drop("__b") if keep_full is not None else df.limit(0)
    w = (
        Window.partitionBy("__b")
        .orderBy(*order_in_bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fine = (
        tagged.filter(F.col("__b") == cut)
        .withColumn("__cum", F.sum(tok).over(w))
        .filter(F.col("__cum") <= budget - spent)
        .drop("__cum")
    )
    out = fine if keep_full is None else keep_full.unionByName(fine)
    return out.drop("__b")


def stratified_interleave(
    df: DataFrame,
    key: str,
    by: str,
    salt: str = "interleave",
) -> DataFrame:
    """Mixture-preserving global training order: give every row a
    position so that each ``by`` group (domain, language, source) is
    spread EVENLY across the whole order — any contiguous slice of it
    (a shard, a curriculum phase, a truncated epoch) then carries
    every group in proportion to its corpus share. A plain hash
    shuffle only gives that in expectation; training-data orders that
    front-load one domain bias early optimization, and a run stopped
    at 40% of an epoch should not have seen 90% of one source.

    Each group's rows are ranked by the deterministic ``unit_hash``
    (so the within-group order is itself a stable shuffle, rerun- and
    partitioning-invariant), and row r of a group with n rows sits at
    position (2r-1)/(2n) — the rank-midpoint lattice, which spreads n
    points evenly over (0,1) with no endpoint collisions between a
    tiny group and a huge one. Consumers sort by
    (interleave_pos, by, key) — total, deterministic — e.g.
    ``shuffle_shards``-style exports can range-partition on it.

    Output: the input columns plus ``interleave_num`` = 2r-1 and
    ``interleave_den`` = 2n (exact integers — the oracle compares
    them exactly, no float ulps) and ``interleave_pos`` = their
    ratio for direct sorting.

    Scale shape: ONE window per group computes both the rank and the
    group size (rows never leave their group's partitions; groups are
    parallel); no global window, no driver data. Skew = the largest
    single group, same bound as any per-group op.
    """
    from pyspark.sql.window import Window

    win = Window.partitionBy(by).orderBy(unit_hash(key, salt), F.col(key))
    whole = Window.partitionBy(by)
    num = (F.lit(2) * F.row_number().over(win) - F.lit(1)).cast("long")
    den = (F.lit(2) * F.count(F.lit(1)).over(whole)).cast("long")
    return (
        df.withColumn("interleave_num", num)
        .withColumn("interleave_den", den)
        .withColumn(
            "interleave_pos",
            F.col("interleave_num") / F.col("interleave_den"),
        )
    )


def solve_mixture(
    domain_tokens: DataFrame,
    weights: dict,
    budget_tokens: int,
    by: str = "source",
    tokens_col: str = "n_tokens",
    max_epochs: float = 1.0,
) -> DataFrame:
    """Mixture planning — the arithmetic between a mix SPEC (domain ->
    target weight) and an executable plan: given per-domain available
    token counts (one `corpus_profile` column) and a total training
    budget, compute what each domain must contribute and whether the
    corpus can actually serve the spec.

    Per domain: ``weight`` (normalized), ``required_tokens`` =
    weight x budget, ``epochs`` = required / available — the repeat
    factor; > ``max_epochs`` means the spec over-asks this domain.
    Global: ``feasible_budget`` = min over domains of
    ``max_epochs x available / weight`` — the largest budget this
    corpus serves without any domain exceeding ``max_epochs`` (the
    binding domain is the one whose epochs hit the cap first), and
    ``binding`` marks it. Downstream: feed ``required_tokens`` per
    domain to ``select_token_budget(by=...)`` / ``temperature_mix``.

    Domains present in the corpus but absent from ``weights`` get
    weight 0 (excluded by the spec — kept in the output with zero
    requirement so the plan is auditable); weights for domains absent
    from the corpus raise (a spec naming data that does not exist is
    a bug, not a zero). A POSITIVE-weight domain with ZERO available
    tokens also raises (r12 advice #3): its epochs would be a 0-division
    (NULL in Spark, inf/NaN/error in other engines) and it would
    silently pin ``feasible_budget`` to 0 — a spec demanding data
    whose every row is empty is the same bug class as naming a
    missing domain, and it is surfaced with the domain name rather
    than propagated as NULLs.

    Scale shape: the spec is a broadcast dict-sized frame; one outer
    join + one global min agg over domain-count rows (group-bounded,
    never corpus rows). All arithmetic deterministic; 6-dp rounding
    on the ratios.
    """
    from pyspark.sql.window import Window

    spark = domain_tokens.sparkSession
    bad = sorted(k for k, v in weights.items() if float(v) < 0)
    if bad:
        raise ValueError(
            f"mixture weights must be non-negative (got negatives for "
            f"{bad}) — a negative share has no sampling meaning"
        )
    total_w = float(sum(weights.values()))
    if total_w <= 0:
        raise ValueError("weights must sum to a positive value")
    wdf = spark.createDataFrame(
        [(k, float(v) / total_w) for k, v in sorted(weights.items())],
        f"{by} string, __w double",
    )
    # ONE evaluation of the (group-bounded) counts frame: the domain
    # list for validation comes from a single collect, and the global
    # feasibility min is an unpartitioned window over the same plan —
    # domain-count rows, never corpus rows, so the single-reducer
    # window is bounded by construction (r11 review 4th pass #2)
    avail_by_domain = {
        r[0]: float(r[1] or 0)
        for r in domain_tokens.select(by, tokens_col).collect()
    }
    missing = sorted(set(weights) - set(avail_by_domain))
    if missing:
        raise ValueError(
            f"mixture spec names domains absent from the corpus: "
            f"{missing} — a spec naming data that does not exist is a "
            "bug, not a zero"
        )
    empty = sorted(
        k
        for k, v in weights.items()
        if float(v) > 0 and avail_by_domain.get(k, 0.0) <= 0
    )
    if empty:
        raise ValueError(
            f"mixture spec puts positive weight on domains with zero "
            f"available tokens: {empty} — epochs would be a "
            "0-division and feasible_budget would silently pin to 0; "
            "fix the spec or the token counts"
        )
    j = domain_tokens.join(F.broadcast(wdf), by, "left").select(
        by,
        F.col(tokens_col).cast("double").alias("__avail"),
        F.coalesce("__w", F.lit(0.0)).alias("__wn"),
    )
    cap = F.when(
        F.col("__wn") > 0,
        F.lit(float(max_epochs)) * F.col("__avail") / F.col("__wn"),
    )
    feas = F.round(F.min(cap).over(Window.partitionBy()), 6)
    return (
        j.withColumn("feasible_budget", feas)
        .select(
            by,
            F.col("__avail").cast("long").alias("avail_tokens"),
            F.round("__wn", 6).alias("weight"),
            F.round(F.col("__wn") * budget_tokens, 3).alias(
                "required_tokens"
            ),
            # avail==0 can only reach here with weight 0 (positive
            # weight on an empty domain raised above): emit epochs 0,
            # not an engine-dependent 0/0 (NULL / NaN / error)
            F.when(
                F.col("__avail") > 0,
                F.round(
                    F.col("__wn") * budget_tokens / F.col("__avail"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("epochs"),
            "feasible_budget",
            F.coalesce(
                F.round(cap, 6) == F.col("feasible_budget"), F.lit(False)
            ).alias("binding"),
        )
    )


def weighted_sample_wor(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    by: str | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — the one-pass reservoir
    algorithm of Efraimidis & Spirakis 2006 ("Weighted random sampling
    with a reservoir", A-ES): each row draws u in [0,1) and scores
    ``u ** (1/w)``; the n LARGEST scores are exactly a weighted
    without-replacement sample (P(row first) = w_i / sum w). Here u is
    the deterministic ``unit_hash`` of the row key, so — like every
    sampler in this module — membership is a pure function of
    (key, salt): stable across engines, partitionings and reruns, and
    an external oracle reproduces the exact row set.

    Rows with weight <= 0 or NULL are excluded (they have probability
    zero; ``u ** (1/w)`` is undefined for them). The score is rounded
    to 6 dp BEFORE ranking (the module convention, same as
    ``perplexity_buckets``): ``pow`` differs by ~1 ulp across libm
    implementations, so two rows straddling the rank-n boundary
    within ulps would otherwise select differently engine to engine
    (r11 review #5); rounding makes boundary ties EXACT and the key
    tiebreak resolves them identically everywhere.

    Scale shape: the score is one codegen expression; global top-n
    compiles to TakeOrderedAndProject — each partition keeps its local
    top n and only n rows per partition reach the final merge, so the
    corpus is never globally sorted. n must be driver-modest (samples,
    not corpora — for "select half the corpus by weight" use
    ``select_token_budget``, whose two-phase bucketed fill has no
    driver-size dependence). With ``by``, the top-n is per group via
    one partitioned window — parallel across groups, no global order.
    """
    w = F.col(weight_col).cast("double")
    score = F.round(F.pow(unit_hash(key, salt), F.lit(1.0) / w), 6)
    pos = df.filter(w > 0).withColumn("__ws", score)
    if by is not None:
        from pyspark.sql.window import Window

        win = Window.partitionBy(by).orderBy(
            F.col("__ws").desc(), F.col(key).asc()
        )
        return (
            pos.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= n)
            .drop("__rn", "__ws")
        )
    return (
        pos.orderBy(F.col("__ws").desc(), F.col(key).asc())
        .limit(n)
        .drop("__ws")
    )


def length_batches(
    df,
    id_col: str,
    len_col: str,
    batch_size: int,
    shards: int = 1,
):
    """Length-bucketed batch assignment — the batching step before
    padded inference or curriculum training: rows group into
    power-of-two length buckets (16, 32, ..., 65536, then 'inf') so
    every batch pads to at most 2x its shortest member, and within a
    (bucket, shard) the rows take contiguous batch numbers in
    (length, id) order. Output columns: ``bucket`` (the power-of-two
    cap, long; the overflow bucket is -1), ``shard``, ``batch_no``.

    The bucket is a bounded comparison chain (no float log2 — an
    exact-power-of-2 length must not straddle engines on a ulp), so
    the whole bucketing is one codegen projection. ``shards`` bounds
    window size at scale: batch numbering needs an order, and a
    GLOBAL per-bucket row_number would drag a 100-TB bucket through
    one task — sharding by ``id % shards`` keeps every window
    partition ~1/shards of its bucket while batches stay
    homogeneous-length (batch quality needs same-bucket members, not
    cross-shard contiguity). One shuffle total: the (bucket, shard)
    window partition."""
    if batch_size < 1 or shards < 1:
        raise ValueError(f"batch_size/shards must be >= 1, got {batch_size}/{shards}")
    from pyspark.sql.window import Window

    # Lengths must be non-null and positive: a NULL length would ride
    # three-valued comparisons into the overflow bucket via Spark's
    # nulls-first window order — engine-dependent batch numbers — and
    # a non-positive length is a caller bug (r12 advice; fail-loud per
    # the mmr_rerank zero-norm convention).
    raw = F.col(len_col).cast("long")
    length = F.when(
        raw.isNull() | (raw <= 0),
        F.raise_error(
            F.concat(
                F.lit(f"length_batches: {len_col} must be a positive "
                      "non-null length, got "),
                F.coalesce(raw.cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(raw)
    bucket = F.lit(-1).cast("long")  # overflow: longer than every cap
    for cap in (1 << p for p in range(16, 3, -1)):  # 65536 down to 16
        bucket = F.when(length <= cap, F.lit(cap).cast("long")).otherwise(bucket)
    tagged = df.withColumn("bucket", bucket).withColumn(
        "shard", (F.col(id_col) % shards).cast("int")
    )
    w = Window.partitionBy("bucket", "shard").orderBy(length.asc(), F.col(id_col).asc())
    return tagged.withColumn(
        "batch_no",
        ((F.row_number().over(w) - 1) / batch_size).cast("long"),
    )


def doremi_reweight(
    df,
    domain_col: str,
    loss_col: str,
    ref_loss_col: str,
    step_size: float = 1.0,
    prior: dict | None = None,
) -> DataFrame:
    """One DoReMi domain-reweighting step (NEW r15; Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining") — the LEARNED mixture update next to
    ``solve_mixture``'s declarative targets and ``temperature_mix``'s
    heuristic: given per-example proxy-model and reference-model
    losses, each domain's weight multiplies by
    ``exp(step_size * excess)`` with ``excess = max(0, mean proxy
    loss − mean reference loss)`` (clipped at 0 — a domain the proxy
    already beats the reference on carries no extra learning signal),
    then normalizes. Iterating this inside a training loop is the
    published algorithm; one call is one step.

    ``prior`` maps domain -> starting weight (default uniform over
    observed domains; unknown prior keys are ignored, missing ones
    read uniform-share — priors renormalize over OBSERVED domains).
    Rows with a NULL domain or either loss NULL drop (no signal).
    Output per domain: ``(domain, n, mean_loss, mean_ref, excess,
    weight)`` 6dp, weights summing to 1.

    Plan: ONE partial-aggregatable corpus groupBy to per-domain
    means, then the softmax over the domain-bounded frame with a
    1-row normalizer broadcast — the ``temperature_mix`` shape."""
    if step_size <= 0:
        raise ValueError(f"step_size must be > 0, got {step_size}")
    if prior and any(v <= 0 for v in prior.values()):
        # a zero prior pins the domain's weight at 0 FOREVER (the
        # multiplicative update can't recover it) and a negative one
        # emits a negative "weight" in a normalized-mixture column
        raise ValueError(
            f"prior weights must all be > 0, got {prior}"
        )
    loss = F.col(loss_col).cast("double")
    ref = F.col(ref_loss_col).cast("double")
    per = (
        df.where(
            F.col(domain_col).isNotNull()
            & loss.isNotNull() & ref.isNotNull()
        )
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg(loss).alias("__ml"),
            F.avg(ref).alias("__mr"),
        )
    )
    if prior:
        pri = F.create_map(
            *[F.lit(x) for kv in prior.items() for x in (str(kv[0]),
                                                         float(kv[1]))]
        )
        p = F.coalesce(
            pri[F.col("domain").cast("string")], F.lit(None).cast("double")
        )
    else:
        p = F.lit(None).cast("double")
    excess = F.greatest(F.col("__ml") - F.col("__mr"), F.lit(0.0))
    scored = per.select(
        "domain", "n", "__ml", "__mr", excess.alias("__ex"),
        p.alias("__p"),
    )
    # missing-prior domains read the uniform share AFTER the observed
    # domain count is known: coalesce against 1/k with k a 1-row agg
    k = scored.agg(F.count(F.lit(1)).cast("double").alias("__k"))
    unnorm = (
        F.coalesce(F.col("__p"), F.lit(1.0) / F.col("__k"))
        * F.exp(F.lit(float(step_size)) * F.col("__ex"))
    )
    w = scored.crossJoin(F.broadcast(k)).withColumn("__u", unnorm)
    z = w.agg(F.sum("__u").alias("__z"))
    return (
        w.crossJoin(F.broadcast(z))
        .select(
            "domain",
            "n",
            F.round(F.col("__ml"), 6).alias("mean_loss"),
            F.round(F.col("__mr"), 6).alias("mean_ref"),
            F.round(F.col("__ex"), 6).alias("excess"),
            F.round(F.col("__u") / F.col("__z"), 6).alias("weight"),
        )
    )
