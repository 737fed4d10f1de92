"""Event-sequence analytics: funnel conversion and cohort retention.

The reference's serving stack answers per-event queries (terms,
ranges, facets — serving/query.py); these operators cover the two
sequence-shaped questions every event corpus gets asked that single
aggregations can't express: "how many users complete step A then B
then C, in order?" (funnel) and "of the users who arrived in period
X, how many came back k periods later?" (retention).

Both are pure DataFrame compositions — no UDF, no collect:

- ``funnel`` makes ONE pass over the (filtered) events in its
  default ``mode="array"``: a groupBy/pivot collects each user's
  per-step DISTINCT timestamps, then the greedy step-chain folds as
  nested codegen array expressions
  (``array_min(filter(ts_i, t >= t_prev))``), so k steps cost one
  shuffle, not k scans. NULLs propagate exactly like the greedy walk:
  a user who never reaches step i has t_i NULL and every later filter
  drops to an empty array. ``mode="cascade"`` trades the arrays for
  k-1 user-co-partitioned join+min stages with BOUNDED row width —
  the shape for skewed event streams (one bot user with millions of
  step events would materialize them all in one array-mode row).
- ``cohort_retention`` is two partial-aggregatable aggregations
  (first-seen period per user, distinct user-activity periods) and
  one join on user — the result is period-grid-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: int | None = None,
    mode: str = "array",
) -> DataFrame:
    """Ordered funnel conversion: step i counts a user iff some step-i
    event happens at-or-after the user's GREEDY completion time of
    step i-1 (t_1 = min ts of step 1; t_i = min step-i ts >= t_{i-1}).
    Greedy-min is the standard funnel semantics: it maximizes the
    number of completed steps, so the counts are order-insensitive to
    event arrival and replayable in plain SQL (the oracle chains k
    staged aggregations; ``mode="array"`` folds the same chain as
    array expressions over ONE shuffle).

    ``within`` adds the conversion-deadline variant every funnel tool
    offers: step i only counts at-or-after AND within ``within``
    seconds of the greedy step-i-1 time (deadline per consecutive
    hop, not from the funnel start — the stricter per-hop reading is
    the composable one: a whole-funnel deadline is the hops' sum).
    Greedy stays well-defined: the earliest in-window step-i event.
    Works for timestamp AND epoch-second numeric ts columns (the
    deadline adds an INTERVAL or a plain number by dtype — the same
    contract ``funnel_stream`` has, which casts to epoch longs).

    ``mode`` picks the physical shape (identical results):

    - ``"array"`` (default): one groupBy/pivot shuffle collecting each
      user's per-step DISTINCT timestamps (``collect_set`` — greedy
      only ever takes mins, so duplicate timestamps are dead weight),
      then the chain folds as codegen array expressions. Fastest when
      per-(user, step) distinct-event counts are civilized; a skewed
      user (bot traffic) with millions of DISTINCT step timestamps
      still lands in one row of one task.
    - ``"cascade"``: the oracle's own k-stage shape — per-user min of
      step-1, then for each later step one user-co-partitioned
      left-join + min-if-qualifying aggregation. Every row is ≤ k
      timestamps wide no matter how hot a user is, map-side partial
      aggregation absorbs the join fan-out, and all k-1 stages shuffle
      on the SAME key (hash(u)), so Spark reuses one partitioning.
      The skew-safe choice at 100 TB.

    Output: (step, step_idx, n_users, pct_of_first) — pct 6dp-rounded,
    NULL when the first step matched nobody. Duplicate step names
    would make the pivot ambiguous and raise."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    if mode not in ("array", "cascade"):
        raise ValueError(f"mode must be 'array' or 'cascade', got {mode!r}")
    for s in steps:
        # step names become pivot column names and stack() literals;
        # a quote would break the literal, a backtick the escaped
        # column reference, and 'u' collides with the internal user
        # column — reject rather than mis-parse. Dots and spaces are
        # fine: pivot columns are read back backtick-escaped.
        if "'" in s or "`" in s or s == "u":
            raise ValueError(f"unsupported step name {s!r}")
    if within is not None and within <= 0:
        raise ValueError(f"within must be positive seconds, got {within}")
    from pyspark.sql.types import NumericType

    ts_is_numeric = isinstance(
        df.select(F.col(ts_col)).schema[0].dataType, NumericType
    )

    def _deadline(prev: Column) -> Column:
        # epoch-second numerics add a plain number; timestamps need an
        # INTERVAL (adding an int to a timestamp fails analysis — the
        # r13 batch/stream contract asymmetry)
        if ts_is_numeric:
            return prev + F.lit(int(within))
        return prev + F.expr(f"INTERVAL {int(within)} SECONDS")

    def _qualifies(prev: Column):
        # one-arg lambda on purpose: a defaulted second parameter
        # would make F.filter pass the ELEMENT INDEX as the bound arg
        if within is None:
            return lambda x: x >= prev
        deadline = _deadline(prev)
        return lambda x: (x >= prev) & (x <= deadline)

    events = df.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    )
    k = len(steps)
    if mode == "array":
        per_user = (
            events.groupBy(F.col(user_col).alias("u"))
            .pivot(type_col, steps)
            .agg(F.collect_set(F.col(ts_col)))
        )
        reach: list[Column] = []
        t_prev: Column | None = None
        for s in steps:
            col_s = F.col(f"`{s}`")
            if t_prev is None:
                t_i = F.array_min(col_s)
            else:
                t_i = F.array_min(F.filter(col_s, _qualifies(t_prev)))
            reach.append(t_i)
            t_prev = t_i
        times = per_user.select(
            *[t_i.alias(f"_t{i}") for i, t_i in enumerate(reach)]
        )
    else:
        ev = events.select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("_et"),
            F.col(ts_col).alias("_e"),
        )
        cur = (
            ev.filter(F.col("_et") == steps[0])
            .groupBy("u")
            .agg(F.min("_e").alias("_t0"))
        )
        for i in range(1, k):
            ev_i = ev.filter(F.col("_et") == steps[i]).select("u", "_e")
            qual = _qualifies(F.col(f"_t{i - 1}"))(F.col("_e"))
            # left join keeps users stuck at step i-1 (their later
            # t_j stay NULL); min(when(...)) is partial-aggregatable,
            # so a hot user's join fan-out combines map-side — no row
            # ever holds more than i+1 timestamps
            cur = (
                cur.join(ev_i, "u", "left")
                .groupBy("u")
                .agg(
                    *[F.first(f"_t{j}").alias(f"_t{j}") for j in range(i)],
                    F.min(F.when(qual, F.col("_e"))).alias(f"_t{i}"),
                )
            )
        times = cur.select(*[f"_t{i}" for i in range(k)])
    counts = times.agg(
        *[
            F.count(F.col(f"_t{i}")).cast("long").alias(f"n{i}")
            for i in range(k)
        ]
    )
    stack_args = ", ".join(
        f"'{s}', {i + 1}, n{i}" for i, s in enumerate(steps)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step, step_idx, n_users)"
        ),
        F.col("n0").alias("_n0"),
    ).select(
        "step",
        F.col("step_idx").cast("int").alias("step_idx"),
        "n_users",
        F.when(
            F.col("_n0") > 0,
            F.round(F.col("n_users") / F.col("_n0"), 6),
        ).alias("pct_of_first"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition readout: for each consecutive
    event pair within a user's (ts, order_col)-ordered stream, count
    (from_type, to_type) and its probability among the from-type's
    outgoing transitions — the what-happens-next matrix behind path
    analysis and next-event prediction.

    ``order_col`` breaks timestamp ties deterministically (pass the
    event id); without it, equal-ts neighbors would order
    arbitrarily and the matrix would be run-dependent — required, not
    optional, when ts can tie, so it defaults to requiring none only
    for strictly-ordered streams. One window over user partitions +
    one groupBy; probabilities 6dp-rounded, denominators exact
    integers."""
    from pyspark.sql.window import Window

    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(F.col(user_col)).orderBy(*order)
    pairs = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(type_col).alias("to_type"),
            F.lag(F.col(type_col)).over(w).alias("from_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    from_totals = pairs.groupBy("from_type").agg(
        F.sum("n").alias("_from_n")
    )
    return pairs.join(from_totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("_from_n"), 6).alias("p"),
    )


def ab_test(
    df: DataFrame,
    variant_col: str,
    converted_col: str,
) -> DataFrame:
    """Two-proportion experiment readout over a per-unit frame (one
    row per user/session, a variant label, a boolean conversion):
    per-variant (n, conversions, rate) plus the pooled two-proportion
    z statistic against the OTHER variants pooled — the standard A/B
    significance input (look the z up in a normal table; neither
    engine ships erf, and shipping a hand-rolled CDF would imply
    precision the normal approximation doesn't have).

    z = (p_v − p_rest) / sqrt(p̂(1−p̂)(1/n_v + 1/n_rest)), p̂ the
    pooled rate; NULL when either side is empty or the pooled rate is
    degenerate (0 or 1 — no variance, significance undefined). One
    partial-aggregatable groupBy + a 1-row totals broadcast;
    variant-count-bounded output; 6dp rounding keeps it
    engine-exact. NULL conversions count as not-converted (the
    missing-outcome reading); NULL variants group as their own
    arm — filter upstream if that's unintended."""
    per = df.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.coalesce(F.col(converted_col), F.lit(False)), 1).otherwise(0)
        ).cast("long").alias("conversions"),
    )
    tot = per.agg(
        F.sum("n").alias("_tn"), F.sum("conversions").alias("_tc")
    )
    out = per.crossJoin(F.broadcast(tot))
    rest_n = F.col("_tn") - F.col("n")
    rest_c = F.col("_tc") - F.col("conversions")
    p_v = F.col("conversions") / F.col("n")
    p_r = rest_c / rest_n
    pooled = F.col("_tc") / F.col("_tn")
    z = (p_v - p_r) / F.sqrt(
        pooled * (F.lit(1) - pooled) * (F.lit(1) / F.col("n") + F.lit(1) / rest_n)
    )
    return out.select(
        "variant",
        "n",
        "conversions",
        F.round(p_v, 6).alias("rate"),
        F.when(
            (F.col("n") > 0)
            & (rest_n > 0)
            & (pooled > 0)
            & (pooled < 1),
            F.round(z, 6),
        ).alias("z_vs_rest"),
    )


_RETENTION_GRAINS = ("day", "week")


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    granularity: str = "week",
) -> DataFrame:
    """Cohort retention: users cohort by their FIRST-seen period
    (date_trunc), activity is the distinct (user, period) set, and
    cell (cohort, offset) counts the cohort's users active exactly
    ``offset`` periods after arrival — offset 0 is the cohort size by
    construction, so ``retention_pct`` divides by it. Two
    partial-aggregatable aggregations + one join on user; output is
    period-grid-sized. NULL timestamps carry no activity (and a user
    whose every event is NULL-stamped never cohorts)."""
    if granularity not in _RETENTION_GRAINS:
        raise ValueError(
            f"granularity must be one of {_RETENTION_GRAINS}, "
            f"got {granularity!r}"
        )
    period = F.date_trunc(granularity, F.col(ts_col))
    ev = df.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("u"), period.cast("date").alias("p")
    )
    firsts = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    activity = ev.distinct()
    days = 7 if granularity == "week" else 1
    cells = (
        activity.join(firsts, "u")
        .select(
            "cohort",
            (F.datediff(F.col("p"), F.col("cohort")) / F.lit(days))
            .cast("int")
            .alias("offset"),
            "u",
        )
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    base = cells.where(F.col("offset") == 0).select(
        "cohort", F.col("n_users").alias("_base")
    )
    return cells.join(base, "cohort").select(
        "cohort",
        "offset",
        "n_users",
        F.round(F.col("n_users") / F.col("_base"), 6).alias("retention_pct"),
    )


def event_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    max_len: int = 5,
    top_n: int = 20,
    order_col: str | None = None,
    sep: str = " -> ",
) -> DataFrame:
    """Top user journeys: the most common sequences of each user's
    FIRST ``max_len`` event types — the path-analysis readout next to
    ``event_transitions``'s one-step matrix (the matrix says what
    follows a click; paths say which whole journeys dominate).

    ``order_col`` breaks timestamp ties deterministically (pass the
    event id) — required whenever ts can tie, the
    ``event_transitions`` contract. Output (path, n_users, path_len)
    ranked by (n_users desc, path asc), top_n rows.

    Skew shape: the per-user prefix is cut with a row_number window
    BEFORE any list materializes, so no row ever holds more than
    ``max_len`` event types — a bot user with millions of events
    costs a window sort (spillable), never a fat collect_list row
    (the funnel cascade-mode lesson). The final rank is a distributed
    TakeOrdered over path-distinct rows."""
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from pyspark.sql.window import Window

    order = [F.col(ts_col).asc()] + (
        [F.col(order_col).asc()] if order_col else []
    )
    w = Window.partitionBy(F.col(user_col)).orderBy(*order)
    prefix = (
        df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("et"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= max_len)
    )
    paths = prefix.groupBy("u").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("et")))
                ),
                lambda s: s["et"],
            ),
            sep,
        ).alias("path"),
        F.count(F.lit(1)).cast("int").alias("path_len"),
    )
    return (
        paths.groupBy("path", "path_len")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(top_n)
        .select("path", "n_users", "path_len")
    )


def rate_anomalies(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    window_hours: int = 24,
    z_threshold: float = 3.0,
    min_history: int = 6,
) -> DataFrame:
    """Event-rate anomaly readout: per (event type, hour) counts
    z-scored against that type's TRAILING ``window_hours`` hours —
    the ops question ("did errors spike at 3am?") every event corpus
    gets asked. A bucket flags when its count sits ``z_threshold``
    sample standard deviations from the trailing mean, with at least
    ``min_history`` prior buckets observed (young series don't
    alarm) and nonzero variance (a flat series alarms on ANY change
    — deliberate).

    Output (event_type, hour, cnt, mean_prev, sd_prev, z) — stats
    6dp-rounded, z's sign preserved (drops as anomalous as spikes).
    Shape: one partial-aggregatable groupBy to hourly counts (the
    only corpus-sized stage), then windows over the HOURLY series
    (hours x types rows, never events). Empty hours inside the
    trailing window are absent, not zero — the sparse-series reading;
    densify upstream with date_histogram_facet(min_doc_count=0) if
    gaps should count."""
    return _hourly_zscore(
        _hourly_counts(df, ts_col, type_col),
        window_hours,
        z_threshold,
        min_history,
    )


def _hourly_counts(df: DataFrame, ts_col: str, type_col: str) -> DataFrame:
    """The one corpus-sized stage: partial-aggregatable hourly counts
    per event type. ADD-mergeable (sums are algebraic), which is what
    makes the streaming twin's accumulated state exact."""
    return (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(type_col).alias("event_type"),
            F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _hourly_zscore(
    hourly: DataFrame,
    window_hours: int,
    z_threshold: float,
    min_history: int,
) -> DataFrame:
    """The grid-sized z-score tail shared by ``rate_anomalies`` and
    ``rate_anomalies_read`` — one code path, so the batch and
    streaming twins cannot drift."""
    if window_hours < 1:
        raise ValueError(f"window_hours must be >= 1, got {window_hours}")
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-int(window_hours), -1)
    )
    stats = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.round(F.avg("cnt").over(w), 6).alias("mean_prev"),
        F.round(F.stddev_samp("cnt").over(w), 6).alias("sd_prev"),
        F.count("cnt").over(w).alias("__n_prev"),
    )
    z = F.round((F.col("cnt") - F.col("mean_prev")) / F.col("sd_prev"), 6)
    return (
        stats.where(
            (F.col("__n_prev") >= min_history)
            & F.col("sd_prev").isNotNull()
            & (F.col("sd_prev") > 0)
        )
        .select("event_type", "hour", "cnt", "mean_prev", "sd_prev", z.alias("z"))
        .where(F.abs(F.col("z")) >= F.lit(float(z_threshold)))
    )


def seasonal_rate_anomalies(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    window_days: int = 7,
    z_threshold: float = 3.0,
    min_history: int = 3,
) -> DataFrame:
    """Seasonally-baselined rate anomalies: each (type, hour) bucket
    z-scores against the SAME HOUR OF DAY across the trailing
    ``window_days`` days — the daily-rhythm-aware twin of
    ``rate_anomalies``, which a trailing-hours window can't give you
    ("3am is always quiet" must not alarm every morning, and a 3am
    spike must not hide under the daytime mean). Same guards: at
    least ``min_history`` prior same-hour buckets, nonzero variance,
    both spike and drop signs.

    Output (event_type, hour, hod, cnt, mean_prev, sd_prev, z) — hod
    the 0-23 hour-of-day the baseline conditions on. Shape: the same
    one corpus-sized hourly groupBy as ``rate_anomalies``
    (``_hourly_counts``), then windows partitioned by (type,
    hour-of-day) over the grid — 24x more, 24x shorter partitions,
    still grid-sized. Absent hours are absent, not zero (the sparse
    reading)."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    from pyspark.sql.window import Window

    hourly = _hourly_counts(df, ts_col, type_col).withColumn(
        "hod", F.hour("hour")
    )
    w = (
        Window.partitionBy("event_type", "hod")
        .orderBy("hour")
        .rowsBetween(-int(window_days), -1)
    )
    stats = hourly.select(
        "event_type",
        "hour",
        "hod",
        "cnt",
        F.round(F.avg("cnt").over(w), 6).alias("mean_prev"),
        F.round(F.stddev_samp("cnt").over(w), 6).alias("sd_prev"),
        F.count("cnt").over(w).alias("__n_prev"),
    )
    z = F.round((F.col("cnt") - F.col("mean_prev")) / F.col("sd_prev"), 6)
    return (
        stats.where(
            (F.col("__n_prev") >= min_history)
            & F.col("sd_prev").isNotNull()
            & (F.col("sd_prev") > 0)
        )
        .select(
            "event_type", "hour", "hod", "cnt", "mean_prev", "sd_prev",
            z.alias("z"),
        )
        .where(F.abs(F.col("z")) >= F.lit(float(z_threshold)))
    )


def hourly_counts_merge_into(
    batch: DataFrame,
    ts_col: str,
    type_col: str,
    path: str,
    batch_id: int | None = None,
) -> None:
    """``foreachBatch`` body maintaining the LIVE hourly-count grid an
    event stream's anomaly monitor reads — the streaming twin of
    ``rate_anomalies``'s corpus-sized stage. Per batch: one bounded
    aggregate to (type, hour, cnt), then an elementwise ADD with the
    previous grid (grid-sized read-back — hours x types rows, KBs)
    under the shared epoch-pinned stage-park-swap commit
    (``_merge_sketch_into`` — at-least-once replay folds to
    exactly-once, counts stay EXACT forever because sums are
    algebraic). Read with ``rate_anomalies_read``."""
    from ..functions.sketches import _merge_sketch_into

    def merge(b, prev):
        new = _hourly_counts(b, ts_col, type_col)
        if prev is None:
            return new
        return (
            prev.unionByName(new)
            .groupBy("event_type", "hour")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    _merge_sketch_into(batch, path, merge, batch_id)


def rate_anomalies_read(
    spark,
    path: str,
    window_hours: int = 24,
    z_threshold: float = 3.0,
    min_history: int = 6,
) -> DataFrame:
    """The always-current anomaly readout from the accumulated hourly
    grid: identical output contract (and code path — ``_hourly_zscore``)
    to the batch ``rate_anomalies`` over everything ingested. Query
    cost is grid-sized, never stream-sized."""
    from ..functions.sketches import sketch_read

    return _hourly_zscore(
        sketch_read(spark, path), window_hours, z_threshold, min_history
    )


_ATTRIBUTION_MODELS = ("first_touch", "last_touch", "linear", "position")


def attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion: str,
    touches: Sequence[str],
    model: str = "last_touch",
    lookback_s: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Multi-touch conversion attribution: credit each conversion
    event's preceding touch events (same user, touch ts <= conversion
    ts, optionally within a ``lookback_s`` window) to their channels
    under the four standard models — ``first_touch`` / ``last_touch``
    (all credit to the earliest / latest touch), ``linear`` (1/n
    each), ``position`` (U-shaped 40/20/40: 0.4 first, 0.4 last, the
    middle 0.2 split evenly; 1 touch takes 1.0, 2 touches 0.5 each).

    Every conversion credits its own lookback window independently —
    a touch inside two conversions' windows credits both (the
    standard window semantics; de-dup upstream if single-use credit
    is wanted). Conversions with no in-window touch credit nothing.
    ``order_col`` breaks ts ties deterministically (pass the event
    id) — required whenever ts can tie, the ``event_transitions``
    contract; it also orders same-instant touch-vs-conversion pairs
    (a touch AT the conversion instant counts).

    Output (channel, credit, share) — credit 6dp, share = channel
    credit / total credited (6dp), ranked (credit desc, channel asc).

    Scale shape: one equi-join on user (both sides pre-filtered to
    the relevant types, so the join is conversions x touches per
    user, bounded by the lookback window — the funnel-candidate
    shape, not an event cross product), one per-conversion window to
    rank touches, one channel-count-sized groupBy. The join and the
    window share the user/conversion keys, so Spark reuses one
    partitioning; a bot user's cost is bounded by its in-window
    touches per conversion — cap event streams upstream
    (``cap_per_group``) when a hot key's window itself is unbounded."""
    touches = list(touches)
    if model not in _ATTRIBUTION_MODELS:
        raise ValueError(
            f"model must be one of {_ATTRIBUTION_MODELS}, got {model!r}"
        )
    if not touches:
        raise ValueError("touches must be non-empty")
    if conversion in touches:
        raise ValueError(
            f"conversion {conversion!r} cannot also be a touch type"
        )
    if lookback_s is not None and lookback_s <= 0:
        raise ValueError(f"lookback_s must be positive, got {lookback_s}")
    from pyspark.sql.window import Window

    base = df.where(F.col(ts_col).isNotNull())
    oc = [F.col(order_col).alias("oid")] if order_col else []
    conv = base.where(F.col(type_col) == conversion).select(
        F.col(user_col).alias("u"), F.col(ts_col).alias("cts"),
        *([F.col(order_col).alias("cid")] if order_col else []),
    )
    touch = base.where(F.col(type_col).isin(touches)).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("tts"),
        F.col(type_col).alias("channel"),
        *oc,
    )
    cond = F.col("tts") <= F.col("cts")
    if lookback_s is not None:
        # epoch-second numerics subtract a plain number; timestamps
        # need an INTERVAL (the funnel ``within`` dtype contract —
        # both twins accept either physical type)
        from pyspark.sql.types import NumericType

        if isinstance(
            df.select(F.col(ts_col)).schema[0].dataType, NumericType
        ):
            window_start = F.col("cts") - F.lit(int(lookback_s))
        else:
            window_start = F.col("cts") - F.expr(
                f"INTERVAL {int(lookback_s)} SECONDS"
            )
        cond = cond & (F.col("tts") >= window_start)
    pairs = conv.join(touch, "u").where(cond)
    conv_key = ["u", "cts"] + (["cid"] if order_col else [])
    order = [F.col("tts").asc()] + ([F.col("oid").asc()] if order_col else [])
    w = Window.partitionBy(*[F.col(c) for c in conv_key]).orderBy(*order)
    ranked = pairs.select(
        *conv_key,
        "channel",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(*[F.col(c) for c in conv_key])
        ).alias("nt"),
    )
    n = F.col("nt")
    rn = F.col("rn")
    if model == "first_touch":
        weight = F.when(rn == 1, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "last_touch":
        weight = F.when(rn == n, F.lit(1.0)).otherwise(F.lit(0.0))
    elif model == "linear":
        weight = F.lit(1.0) / n
    else:  # position (U-shaped 40/20/40)
        weight = (
            F.when(n == 1, F.lit(1.0))
            .when(n == 2, F.lit(0.5))
            .when((rn == 1) | (rn == n), F.lit(0.4))
            .otherwise(F.lit(0.2) / (n - 2))
        )
    per_channel = (
        ranked.select("channel", weight.alias("w"))
        .where(F.col("w") > 0)
        .groupBy("channel")
        .agg(F.sum("w").alias("_credit"))
    )
    tot = per_channel.agg(F.sum("_credit").alias("_tot"))
    return (
        per_channel.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("_credit"), 6).alias("credit"),
            F.round(F.col("_credit") / F.col("_tot"), 6).alias("share"),
        )
        .orderBy(F.col("credit").desc(), F.col("channel").asc())
    )


def user_durations(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    horizon_s: int,
) -> DataFrame:
    """Per-user observation spans for survival analysis over an event
    log: duration = seconds from the user's first to last event;
    ``observed`` = 1 when the user has been silent for at least
    ``horizon_s`` seconds before the corpus's last timestamp (the
    churn event happened inside the observation window), else 0
    (still active at the edge — right-censored). The standard
    churn-defined-as-inactivity framing; feed the result to
    ``survival_km``.

    One partial-aggregatable groupBy(user) + a 1-row global-max
    broadcast. Durations are integer seconds (exact — no float
    drift); single-event users get duration 0."""
    if horizon_s <= 0:
        raise ValueError(f"horizon_s must be positive, got {horizon_s}")
    per = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("user"))
        .agg(
            F.min(ts_col).alias("_first"),
            F.max(ts_col).alias("_last"),
        )
    )
    edge = per.agg(F.max("_last").alias("_edge"))

    def _secs(c: Column) -> Column:
        # TIMESTAMP_NTZ (how Spark 4 reads the driver's parquet) can't
        # cast to BIGINT directly — route through TIMESTAMP; the
        # session tz is pinned UTC (session.py), so values don't move
        return c.cast("timestamp").cast("long")

    return per.crossJoin(F.broadcast(edge)).select(
        "user",
        (_secs(F.col("_last")) - _secs(F.col("_first"))).alias("duration_s"),
        F.when(
            _secs(F.col("_last"))
            <= _secs(F.col("_edge")) - F.lit(int(horizon_s)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("observed"),
    )


def survival_km(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve over (duration, observed 0/1)
    rows — observed=1 is an event (churn/failure) at that duration,
    observed=0 a right-censored span (Kaplan & Meier 1958). At each
    distinct duration t: d_t events, c_t censored, n_t at risk
    (rows with duration >= t); S(t) = prod_{s<=t} (1 - d_s/n_s),
    computed as exp(sum ln) over the ordered duration grid with the
    d==n terminal point pinned to exactly 0.0 (Spark's ln(0) is NULL,
    DuckDB's -inf — the explicit guard is the engine-portable
    reading).

    Output (t, n_risk, events, censored, survival 6dp) ordered by t.

    Scale shape: one partial-aggregatable groupBy(duration) collapses
    the corpus to the distinct-duration grid; the running windows
    (cumsum for n_risk, cumsum-of-logs for S) run over THAT grid
    only — a curve, not the corpus — so the single-partition ordered
    window is grid-sized by construction (the rate_anomalies
    contract). NULL durations are dropped; NULL observed counts as
    censored (the conservative reading)."""
    from pyspark.sql.window import Window

    grid = (
        df.where(F.col(duration_col).isNotNull())
        .groupBy(F.col(duration_col).alias("t"))
        .agg(
            F.sum(
                F.when(F.coalesce(F.col(observed_col), F.lit(0)) == 1, 1)
                .otherwise(0)
            ).cast("long").alias("events"),
            F.sum(
                F.when(F.coalesce(F.col(observed_col), F.lit(0)) == 1, 0)
                .otherwise(1)
            ).cast("long").alias("censored"),
        )
    )
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = grid.agg(
        F.sum(F.col("events") + F.col("censored")).alias("_n")
    )
    staged = grid.crossJoin(F.broadcast(total)).withColumn(
        "n_risk",
        F.col("_n")
        - F.coalesce(
            F.sum(F.col("events") + F.col("censored")).over(w_prev), F.lit(0)
        ),
    )
    factor = F.lit(1.0) - F.col("events") / F.col("n_risk")
    surv = F.when(
        F.min(factor).over(w_all) <= F.lit(0.0), F.lit(0.0)
    ).otherwise(F.exp(F.sum(F.log(factor)).over(w_all)))
    return staged.select(
        "t",
        "n_risk",
        "events",
        "censored",
        F.round(surv, 6).alias("survival"),
    ).orderBy("t")


def _distributed_ntile(
    base: DataFrame,
    sort_cols: Sequence[Column],
    n_tiles: int,
    out_col: str,
) -> DataFrame:
    """Exact ntile over ``sort_cols`` with NO single-reducer sort: a
    range-partitioned parallel sort, per-partition row counts collected
    to the driver (<= shuffle-partition-count rows), then global rank =
    partition offset + partitioned row_number. Reproduces Spark's
    ntile bucket rule exactly (first ``n % t`` buckets get the extra
    row), so the output is bit-identical to a global
    ``ntile(t).over(Window.orderBy(...))`` at any scale — but the
    widest single-node piece is one range partition, not the corpus.

    ``sort_cols`` must be a total order (tie-break on a unique key) or
    the bucket assignment is nondeterministic, same as ntile itself.
    Returns ``base`` + ``out_col`` (int). Eager: runs one job to pin
    the range layout (localCheckpoint) and one tiny count-per-partition
    collect."""
    from pyspark.sql.window import Window

    spark = base.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # pin the range layout so the offsets collected below describe the
    # SAME partitioning the returned plan reads (repartitionByRange
    # re-samples boundaries per action otherwise)
    ranged = (
        base.repartitionByRange(n_parts, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    n_total = sum(sizes.values())
    offsets, acc = {}, 0
    for pid in range(n_parts):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    if n_total == 0:
        return ranged.drop("_pid").withColumn(out_col, F.lit(None).cast("int"))
    off_map = F.create_map(
        *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    rank = (off_map[F.col("_pid")] + F.row_number().over(w)).cast("long")
    t = int(n_tiles)
    base_sz, extras = n_total // t, n_total % t
    head = extras * (base_sz + 1)  # rows living in the size-(base+1) buckets
    bucket = F.when(
        rank <= F.lit(head), ((rank - 1) / F.lit(base_sz + 1)).cast("int") + 1
    ).otherwise(
        F.lit(extras)
        + ((rank - 1 - F.lit(head)) / F.lit(max(base_sz, 1))).cast("int")
        + 1
    )
    return ranged.withColumn(out_col, bucket.cast("int")).drop("_pid")


def rfm_segments(
    df: DataFrame,
    cust_col: str,
    date_col: str,
    amount_col: str,
    n_tiles: int = 5,
    mode: str = "exact",
) -> DataFrame:
    """RFM customer segmentation over an order log: per customer,
    recency (days from last order to the corpus's last order date),
    frequency (order count), monetary (amount sum), each scored
    1..n_tiles by equal-frequency ntile with HIGHER = better (most
    recent / most frequent / highest spend get n_tiles), plus the
    concatenated segment label ('555' = best). The classic
    direct-marketing readout (Hughes 1994).

    Ties break on the customer key, so scores are run-deterministic
    (ntile with a total order is engine-exact — same bucket widths,
    same extras-to-early-buckets rule in Spark and ANSI SQL).
    Dates compare at DAY grain (timestamps truncate first).

    Scale shape: one partial-aggregatable groupBy(customer) collapses
    orders to the customer grid. ``mode="exact"`` (default) then runs
    three global ntile windows over that grid — fine while the
    customer grid fits one reducer, a single-partition sort beyond.
    ``mode="distributed"`` (alias ``"approx"``, the name VERDICT r14
    suggested) produces BIT-IDENTICAL scores with no single-reducer
    stage: each metric ranks via a range-partitioned parallel sort +
    collected per-partition offsets (``_distributed_ntile``), then the
    three scored frames join back on the customer key. It beats the
    suggested percentile_approx-cut-point design because cut-point
    bucketing loses ntile's key-tie-break on tie-heavy metrics
    (frequency is small integers — ties straddle every boundary),
    while distributed ranking keeps the exact contract. Cost: 3 range
    exchanges + 3 tiny offset collects + 2 customer-key joins, all
    parallel — the 100 TB path."""
    if n_tiles < 2:
        raise ValueError(f"n_tiles must be >= 2, got {n_tiles}")
    if mode not in ("exact", "distributed", "approx"):
        raise ValueError(
            f"mode must be 'exact' or 'distributed' (alias 'approx'), got {mode!r}"
        )
    from pyspark.sql.window import Window

    per = (
        df.where(F.col(date_col).isNotNull())
        .groupBy(F.col(cust_col).alias("customer"))
        .agg(
            F.max(F.to_date(F.col(date_col))).alias("_last"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.round(F.sum(amount_col), 6).alias("monetary"),
        )
    )
    edge = per.agg(F.max("_last").alias("_edge"))
    base = per.crossJoin(F.broadcast(edge)).select(
        "customer",
        F.datediff(F.col("_edge"), F.col("_last")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    nt = int(n_tiles)
    # monetary can be NULL (all-NULL amounts in a group); pin it LAST
    # explicitly — Spark's asc default is nulls-FIRST, ANSI/DuckDB's
    # is nulls-LAST, and an implicit default would make the scores
    # engine-dependent on exactly the rows profiling cares about
    orders = {
        "r_score": [F.col("recency_days").desc(), F.col("customer").asc()],
        "f_score": [F.col("frequency").asc(), F.col("customer").asc()],
        "m_score": [
            F.col("monetary").asc_nulls_last(),
            F.col("customer").asc(),
        ],
    }
    if mode in ("distributed", "approx"):
        # pin the customer grid once so the three rankings (and the
        # final join) don't re-aggregate the order log three times
        base = base.localCheckpoint(eager=True)
        scored = base
        for out, cols in orders.items():
            ranked = _distributed_ntile(base, cols, nt, out).select(
                "customer", out
            )
            scored = scored.join(ranked, "customer")
        return scored.select(
            "customer", "recency_days", "frequency", "monetary",
            "r_score", "f_score", "m_score",
        ).withColumn(
            "segment",
            F.concat(
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
    return base.select(
        "customer",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(nt).over(Window.orderBy(*orders["r_score"])).alias("r_score"),
        F.ntile(nt).over(Window.orderBy(*orders["f_score"])).alias("f_score"),
        F.ntile(nt).over(Window.orderBy(*orders["m_score"])).alias("m_score"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def stickiness(
    df: DataFrame,
    user_col: str,
    ts_col,
    period: str = "month",
) -> DataFrame:
    """DAU/MAU stickiness (NEW r15) — the product-analytics engagement
    readout next to funnel/retention: per calendar ``period`` (month
    default, week for DAU/WAU), the period's active users (MAU/WAU),
    the mean of the period's daily-active-user counts over DAYS WITH
    ACTIVITY, and their ratio (avg_dau / mau, 6dp) — 1.0 means every
    active user shows up every active day, the "how habitual is
    usage" number.

    NULL users/timestamps drop. Output (month, mau, avg_dau 6dp,
    stickiness 6dp) ordered by period start (column names keep the
    canonical DAU/MAU reading at either grain).

    Plan shape: two partial-aggregatable aggregations — distinct
    (day, user) then per-day DAU -> per-period mean, and distinct
    (period, user) -> MAU — joined on the period-grid (a curve, never
    corpus-sized). The distincts shuffle on (period, user), the same
    key balance as cohort_retention."""
    if period not in ("week", "month"):
        raise ValueError(f"period must be 'week' or 'month', got {period!r}")
    base = df.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.date_trunc("day", F.col(ts_col)).alias("__d"),
        F.date_trunc(period, F.col(ts_col)).alias("__m"),
    )
    dau = (
        base.select("__d", "__m", "__u")
        .distinct()
        .groupBy("__m", "__d")
        .agg(F.count(F.lit(1)).alias("__dau"))
        .groupBy(F.col("__m").alias("month"))
        .agg(F.round(F.avg("__dau"), 6).alias("avg_dau"))
    )
    mau = (
        base.select("__m", "__u")
        .distinct()
        .groupBy(F.col("__m").alias("month"))
        .agg(F.count(F.lit(1)).cast("long").alias("mau"))
    )
    return (
        mau.join(dau, "month")
        .select(
            "month",
            "mau",
            "avg_dau",
            F.round(F.col("avg_dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("month")
    )


def diff_in_diff(
    df: DataFrame,
    ts_col,
    value_col: str,
    treated: Column,
    cutoff,
) -> DataFrame:
    """Difference-in-differences readout (NEW r15) — the quasi-
    experimental twin of ``ab_test`` for launches WITHOUT random
    assignment: mean ``value_col`` for treated/control units before
    and after ``cutoff``, and the DiD estimate

        did = (treat_post - treat_pre) - (control_post - control_pre)

    — the treatment-effect estimate under the parallel-trends
    assumption (Card & Krueger 1994). Rows with a NULL value,
    timestamp, OR treatment flag drop — an unknown-assignment unit
    belongs to NEITHER group (silently coalescing it into control
    would bias the control means; SQL three-valued logic drops it,
    and the oracle replay must agree). A cell with no rows yields
    NULL means and a NULL estimate (no fabricated zero). Output ONE
    row: per-cell n and mean (6dp) plus did (6dp, computed from
    unrounded means).

    Plan shape: one partial-aggregatable conditional aggregation —
    a single corpus pass, constant-size output."""
    cut = cutoff if isinstance(cutoff, Column) else F.lit(cutoff)
    post = F.col(ts_col) >= cut.cast(
        df.select(F.col(ts_col)).schema[0].dataType
    )
    t = treated
    v = F.col(value_col)
    base = df.where(
        v.isNotNull() & F.col(ts_col).isNotNull() & t.isNotNull()
    )

    def cell(flag_t: bool, flag_post: bool, name: str):
        incell = (t == F.lit(flag_t)) & (post == F.lit(flag_post))
        return [
            F.sum(F.when(incell, 1).otherwise(0)).cast("long").alias(
                f"n_{name}"
            ),
            F.avg(F.when(incell, v)).alias(f"__m_{name}"),
        ]

    agg = base.agg(
        *cell(True, False, "treat_pre"),
        *cell(True, True, "treat_post"),
        *cell(False, False, "control_pre"),
        *cell(False, True, "control_post"),
    )
    did = (
        (F.col("__m_treat_post") - F.col("__m_treat_pre"))
        - (F.col("__m_control_post") - F.col("__m_control_pre"))
    )
    return agg.select(
        "n_treat_pre",
        F.round("__m_treat_pre", 6).alias("treat_pre"),
        "n_treat_post",
        F.round("__m_treat_post", 6).alias("treat_post"),
        "n_control_pre",
        F.round("__m_control_pre", 6).alias("control_pre"),
        "n_control_post",
        F.round("__m_control_post", 6).alias("control_post"),
        F.round(did, 6).alias("did"),
    )


def funnel_user_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: int | None = None,
) -> DataFrame:
    """Per-user greedy funnel completion times as EPOCH SECONDS (the
    cascade shape — bounded row width, shared hash(u) partitioning
    across stages): (u, t0..t{k-1}), NULL from the first missed step
    on. The building block ``funnel_latency`` aggregates; timestamps
    and epoch numerics both accepted (timestamps route through a
    cast, the funnel_stream contract)."""
    steps = list(steps)
    if len(steps) < 2 or len(set(steps)) != len(steps):
        raise ValueError(f"need >= 2 distinct steps, got {steps}")
    if within is not None and within <= 0:
        raise ValueError(f"within must be positive seconds, got {within}")
    from pyspark.sql.types import NumericType

    ts_is_numeric = isinstance(
        df.select(F.col(ts_col)).schema[0].dataType, NumericType
    )
    e = F.col(ts_col) if ts_is_numeric else F.col(ts_col).cast(
        "timestamp"
    ).cast("long")
    ev = df.filter(
        F.col(type_col).isin(steps) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("_et"),
        e.cast("long").alias("_e"),
    )
    cur = (
        ev.filter(F.col("_et") == steps[0])
        .groupBy("u")
        .agg(F.min("_e").alias("_t0"))
    )
    for i in range(1, len(steps)):
        ev_i = ev.filter(F.col("_et") == steps[i]).select("u", "_e")
        prev = F.col(f"_t{i - 1}")
        qual = F.col("_e") >= prev
        if within is not None:
            qual = qual & (F.col("_e") <= prev + F.lit(int(within)))
        cur = (
            cur.join(ev_i, "u", "left")
            .groupBy("u")
            .agg(
                *[F.first(f"_t{j}").alias(f"_t{j}") for j in range(i)],
                F.min(F.when(qual, F.col("_e"))).alias(f"_t{i}"),
            )
        )
    return cur


def funnel_latency(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: int | None = None,
) -> DataFrame:
    """Time-to-convert distribution per funnel hop (NEW r15) — the
    "how long does view -> click take" readout next to the funnel's
    counts: for each consecutive step pair, the number of users who
    completed the hop and the mean / exact median / exact p90 of the
    hop latency in seconds (greedy times, so latencies are the same
    deterministic quantities the funnel counts; 6dp rounds).

    Plan shape: the cascade's k-1 user-co-partitioned join+min stages
    (``funnel_user_times`` — bounded row width, one reused hash(u)
    partitioning) then ONE aggregation over the per-user times; the
    hop rows unpivot from that single row. Exact percentile ==
    DuckDB quantile_cont (the ``percentiles`` precedent); at 100 TB
    swap approx_percentile, same call shape."""
    steps = list(steps)
    times = funnel_user_times(df, user_col, ts_col, type_col, steps, within)
    aggs = []
    for i in range(1, len(steps)):
        d = (F.col(f"_t{i}") - F.col(f"_t{i - 1}")).cast("double")
        tag = f"h{i}"
        aggs += [
            F.count(F.col(f"_t{i}")).cast("long").alias(f"n_{tag}"),
            F.round(F.avg(d), 6).alias(f"avg_{tag}"),
            F.round(F.expr(
                f"percentile(_t{i} - _t{i - 1}, 0.5)"
            ), 6).alias(f"p50_{tag}"),
            F.round(F.expr(
                f"percentile(_t{i} - _t{i - 1}, 0.9)"
            ), 6).alias(f"p90_{tag}"),
        ]
    one = times.agg(*aggs)
    rows = []
    for i in range(1, len(steps)):
        tag = f"h{i}"
        rows.append(
            F.struct(
                F.lit(f"{steps[i - 1]}->{steps[i]}").alias("hop"),
                F.lit(i).cast("int").alias("hop_idx"),
                F.col(f"n_{tag}").alias("n_completed"),
                F.col(f"avg_{tag}").alias("avg_s"),
                F.col(f"p50_{tag}").alias("p50_s"),
                F.col(f"p90_{tag}").alias("p90_s"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.hop", "s.hop_idx", "s.n_completed", "s.avg_s", "s.p50_s", "s.p90_s"
    )


def ewma_anomalies(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    alpha: float = 0.3,
    window_hours: int = 24,
    ratio_threshold: float = 2.0,
    min_history: int = 6,
) -> DataFrame:
    """EWMA control chart over hourly event rates (NEW r15; Roberts
    1959) — the smoothed sibling of ``rate_anomalies``' z-scores: the
    trailing mean weights RECENT hours geometrically
    (``alpha * (1-alpha)^age``), so a level shift three hours ago
    dominates the baseline where the plain window mean still averages
    it away. Per (event type, hour): the finite-window normalized
    EWMA of the PRIOR ``window_hours`` observed hourly counts, the
    count/EWMA ratio, and a flag when the ratio exceeds
    ``ratio_threshold`` or drops below its inverse (spikes AND
    outages), after ``min_history`` prior buckets.

    Output (event_type, hour, cnt, ewma, ratio, anomaly), 6dp.
    Shape: one partial-aggregatable corpus-sized groupBy to hourly
    counts (shared `_hourly_counts`), then a self-join of the hourly
    GRID to its own trailing hours on (type, hour-offset band) — the
    grid is hours x types, a curve, so the join is curve x window
    sized, never the corpus; weights are pure codegen pow. Absent
    hours inside the window are absent (sparse-series reading, the
    ``rate_anomalies`` convention) — ages still count calendar hours,
    so a gap DECAYS older evidence rather than stretching it."""
    return _ewma_from_hourly(
        _hourly_counts(df, ts_col, type_col),
        alpha, window_hours, ratio_threshold, min_history,
    )


def ewma_anomalies_read(
    spark,
    path: str,
    alpha: float = 0.3,
    window_hours: int = 24,
    ratio_threshold: float = 2.0,
    min_history: int = 6,
) -> DataFrame:
    """The streaming EWMA readout over the SAME accumulated hourly
    grid ``hourly_counts_merge_into`` maintains (and
    ``rate_anomalies_read`` z-scores): identical output contract and
    code path (``_ewma_from_hourly``) to the batch twin, so the two
    monitors cannot drift; one state store serves both charts. Query
    cost is grid-sized, never stream-sized."""
    from ..functions.sketches import sketch_read

    return _ewma_from_hourly(
        sketch_read(spark, path),
        alpha, window_hours, ratio_threshold, min_history,
    )


def _ewma_from_hourly(
    hourly: DataFrame,
    alpha: float,
    window_hours: int,
    ratio_threshold: float,
    min_history: int,
) -> DataFrame:
    """The grid-sized EWMA tail shared by ``ewma_anomalies`` and
    ``ewma_anomalies_read`` — one code path, so the batch and
    streaming twins cannot drift."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if window_hours < 1:
        raise ValueError(f"window_hours must be >= 1, got {window_hours}")
    cur = hourly.select(
        "event_type", "hour", "cnt",
        F.col("hour").cast("timestamp").cast("long").alias("__h"),
    )
    prev = hourly.select(
        F.col("event_type").alias("__et"),
        F.col("cnt").alias("__pcnt"),
        F.col("hour").cast("timestamp").cast("long").alias("__ph"),
    )
    age = (F.col("__h") - F.col("__ph")) / F.lit(3600)
    joined = cur.join(
        prev,
        (F.col("event_type") == F.col("__et"))
        & (F.col("__ph") < F.col("__h"))
        & (F.col("__ph") >= F.col("__h") - F.lit(3600 * window_hours)),
        "left",
    )
    wgt = F.lit(alpha) * F.pow(F.lit(1.0 - alpha), age - F.lit(1))
    stats = joined.groupBy("event_type", "hour", "cnt").agg(
        F.sum(F.when(F.col("__ph").isNotNull(), wgt * F.col("__pcnt")))
        .alias("__num"),
        F.sum(F.when(F.col("__ph").isNotNull(), wgt)).alias("__den"),
        F.count("__ph").alias("__hist"),
    )
    ewma = F.col("__num") / F.col("__den")
    ratio = F.col("cnt") / ewma
    return stats.select(
        "event_type",
        "hour",
        "cnt",
        F.round(ewma, 6).alias("ewma"),
        F.round(ratio, 6).alias("ratio"),
        (
            (F.col("__hist") >= F.lit(min_history))
            & (
                (ratio > F.lit(ratio_threshold))
                | (ratio < F.lit(1.0 / ratio_threshold))
            )
        ).alias("anomaly"),
    )


def ab_test_cuped(
    df: DataFrame,
    variant_col: str,
    metric_col: str,
    covariate_col: str,
) -> DataFrame:
    """CUPED variance-reduced experiment readout (NEW r15; Deng et al.
    2013, the industry-standard pre-period adjustment) — the
    continuous-metric sibling of ``ab_test``'s two-proportion z: each
    unit's metric is adjusted by its PRE-EXPERIMENT covariate,
    ``y_adj = y − θ·(x − mean(x))`` with ``θ = cov(x, y)/var(x)``
    estimated POOLED across arms (the standard, assignment-independent
    estimator), removing the variance the pre-period already
    explains. Output per variant: ``(variant, n, mean_raw, mean_adj,
    var_raw, var_adj)`` 6dp — ``var_adj <= var_raw`` is the point
    (tighter confidence at the same traffic); the t/z lookup stays
    with the caller (the ``ab_test`` no-hand-rolled-CDF rule).

    Rows with a NULL metric drop (no outcome, nothing to adjust);
    a NULL covariate adjusts by 0 (reads as x = mean(x) — the neutral
    imputation, so late-joining units without a pre-period neither
    shift nor shrink the estimate). Plan: one 1-row pooled (θ, mean)
    aggregate broadcast onto the scan, then one partial-aggregatable
    per-variant groupBy — two corpus passes, no window, no UDF;
    population variance (the 1-row aggregate convention), matching
    the oracle's var_pop."""
    y = F.col(metric_col).cast("double")
    x = F.col(covariate_col).cast("double")
    base = df.where(y.isNotNull())
    stats = base.agg(
        F.covar_pop(x, y).alias("__cov"),
        F.var_pop(x).alias("__varx"),
        F.avg(x).alias("__mx"),
    )
    theta = F.when(
        F.col("__varx") > 0, F.col("__cov") / F.col("__varx")
    ).otherwise(F.lit(0.0))
    # NULL covariate (or an all-NULL covariate making mx itself NULL)
    # adjusts by 0 — theta * NULL would silently NULL the metric out
    adj = y - theta * F.coalesce(x - F.col("__mx"), F.lit(0.0))
    return (
        base.crossJoin(F.broadcast(stats))
        .select(F.col(variant_col).alias("variant"), y.alias("__y"),
                adj.alias("__adj"))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("__y"), 6).alias("mean_raw"),
            F.round(F.avg("__adj"), 6).alias("mean_adj"),
            F.round(F.var_pop("__y"), 6).alias("var_raw"),
            F.round(F.var_pop("__adj"), 6).alias("var_adj"),
        )
    )


def srm_check(
    df: DataFrame,
    variant_col: str,
    expected: dict,
) -> DataFrame:
    """Sample-ratio-mismatch check (NEW r15) — the experiment-health
    gate that must run BEFORE any readout is believed: compare each
    arm's observed unit count against its expected allocation share
    and emit the chi-square goodness-of-fit statistic. An SRM
    invalidates the experiment regardless of how significant the
    metric looks (bot filtering, crash-on-assignment, logging loss
    all land here first). Output one row per EXPECTED arm:
    ``(variant, n, expected_n, chi2_term)`` plus the arm count-
    bounded total is one ``sum`` away; compare the statistic against
    the chi-square critical value for (arms − 1) df caller-side (the
    ``ab_test`` no-hand-rolled-CDF rule). Units in arms NOT in
    ``expected`` raise loudly — an unknown arm IS the mismatch.

    ``expected`` maps arm -> weight (normalized internally). One
    partial-aggregatable groupBy + a 1-row total broadcast onto the
    arm-bounded frame."""
    if not expected:
        raise ValueError("expected allocation must be non-empty")
    if any(v <= 0 for v in expected.values()):
        # a non-positive share yields a negative expected_n whose
        # chi-square term DEFLATES the total, masking real mismatches
        raise ValueError(
            f"expected weights must all be > 0, got {expected}"
        )
    wsum = float(sum(expected.values()))
    shares = {str(k): v / wsum for k, v in expected.items()}
    # ONE corpus pass; the per-arm result is arms-bounded, so the
    # collect that feeds the unknown-arm check also supplies the
    # observed counts and total — no second aggregation
    observed = {
        r.variant: r.n
        for r in df.groupBy(
            F.col(variant_col).cast("string").alias("variant")
        ).agg(F.count(F.lit(1)).cast("long").alias("n")).collect()
    }
    if None in observed:
        # silently folding unassigned units into the total would
        # fabricate a mismatch no output row can explain
        raise ValueError(
            f"{observed[None]} unit(s) carry a NULL {variant_col!r} — "
            "unassigned traffic IS a logging/assignment defect; filter "
            "or attribute it before the SRM read"
        )
    unknown = sorted(set(observed) - set(shares))
    if unknown:
        raise ValueError(
            f"arm(s) {unknown} not in the expected allocation "
            f"{sorted(shares)} — an unknown arm IS a sample-ratio mismatch"
        )
    total = float(sum(observed.values()))
    rows = []
    for k in sorted(shares):
        n = int(observed.get(k, 0))
        exp_n = shares[k] * total
        chi = (n - exp_n) * (n - exp_n) / exp_n if exp_n > 0 else None
        rows.append((k, n, round(exp_n, 6), round(chi, 6)))
    return df.sparkSession.createDataFrame(
        rows,
        "variant string, n long, expected_n double, chi2_term double",
    )
