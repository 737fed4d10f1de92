"""Elasticsearch aggregations-DSL executor (NEW r15).

The read-side twin of ``serving/query.parse_query``: where that
compiles the ``query`` half of an ES request body, ``run_aggs`` runs
the ``aggs`` half — the JSON a Kibana dashboard or search client
already stores — as ONE Spark aggregation plan.  An ES user's saved
request body (``{"query": ..., "aggs": ...}``) runs unchanged and
returns one rectangular DataFrame: bucket-key columns named after the
bucket aggs, ``doc_count`` per innermost bucket, metric columns named
after the metric aggs.

Supported bucket aggs (ES names): ``terms`` (per-parent top-``size``
by doc_count desc then key asc, ``min_doc_count``), ``multi_terms``
(tuple-keyed terms; key_as_string joins fields with ``|``, docs
missing any field land in no bucket), ``histogram``
(fixed ``interval``; ``min_doc_count: 0`` densifies the grid over the
per-parent extent, innermost level only), ``date_histogram``
(``calendar_interval`` hour/day/week/month), ``range`` (half-open
[from, to) bands, a doc may land in several — ES semantics),
``geo_distance`` (km rings of the codegen haversine around an
``origin: {"lat": .., "lon": ..}`` — object form ONLY, a bare array
is ambiguous between ES's [lon, lat] and hand-written [lat, lon];
``lat_field``/``lon_field`` columns stand in for ES's geo_point —
the operators/geo convention),
``filters`` (named sub-queries, each body parsed by ``parse_query``),
and the single-bucket ``filter`` / ``missing`` scopes (narrowing for
everything below; the constant agg name becomes the bucket key column
— the named single bucket an ES response shows).
Supported pipeline aggs (innermost histogram/date_histogram axis
only, the ``date_histogram_pipeline`` conventions): ``cumulative_sum
derivative moving_avg`` with ``buckets_path`` of ``_count`` or a
sibling metric name and ``gap_policy`` of ``skip`` (default) or
``insert_zeros``, windowed per parent over the bucket-grid
rectangle.  ``top_hits`` (per-bucket example rows — the dashboard
drill-down) emits a FLAT rectangle (bucket keys + ``hit_rank`` +
``_source`` columns, one row per hit) rather than ES's nested hit
arrays; it must be the only agg at its level, and ``sort`` is
required (no _score context — end with a unique field for a
deterministic order).  Supported metric aggs: ``avg sum min max value_count
cardinality stats percentiles`` (percentiles EXACT where ES
TDigests, whole-number percents expanding to ``<name>_p50``-style
columns) (stats expands to ``<name>_count/_min/_max/_avg/_sum``;
cardinality is EXACT where ES uses HyperLogLog — same contract as
``percentile_ranks_facet`` being exact where ES TDigests).  One
documented deviation: a declared ``range``/``filters`` bucket that
matches zero docs elides from the result (ES returns it with
doc_count 0) — the output rectangle carries only realized buckets;
the histogram/date_histogram ``min_doc_count: 0`` grid is the
densified surface.

Shape restriction (raised loudly, never silently reshaped): each
nesting level holds EITHER one bucket agg (with optional ``aggs``
below) OR only metric aggs — i.e. one bucket CHAIN with metrics at
the innermost level, the dominant dashboard shape (terms →
date_histogram → metrics).  Sibling bucket aggs or a metric next to a
bucket would need several result rectangles — run them as separate
``run_aggs`` calls, exactly like issuing two ES requests.

Plan shape: multi-bucket leaves (range/filters) explode map-side from
an inline array (the ``facet_counts`` shape); the whole chain then
folds into ONE partial-aggregatable ``groupBy`` over all bucket keys.
A ``terms`` level's ``size``/``min_doc_count`` cut ranks by the
level's TRUE doc_count — one extra partial-aggregatable pass over
that level's pre-child-transform snapshot per cut level (a window sum
over the final grid would be cheaper but WRONG under scope-modifying
children: a child ``filter`` must not demote a big parent) — applied
as dense_rank windows over the bucket-grid rectangle, never the
corpus.  Agg names that would shadow an input column or duplicate
another output column raise loudly.

Reference: the NRTSearch sink this engine's serving side mirrors
exposes Lucene facets the same way (`PaimonRowProcessor.java` feeds
the index the fields these aggs read); the DSL itself is public ES
API surface.
"""

from __future__ import annotations

import json as _json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET_TYPES = {
    "terms", "multi_terms", "histogram", "date_histogram", "range",
    "geo_distance", "filters", "filter", "missing",
}
_METRIC_TYPES = {
    "avg", "sum", "min", "max", "value_count", "cardinality", "stats",
    "percentiles",
}
_DEFAULT_PERCENTS = (1, 5, 25, 50, 75, 95, 99)  # the ES defaults
_PIPELINE_TYPES = {"cumulative_sum", "derivative", "moving_avg"}
_GAP_POLICIES = {"skip", "insert_zeros"}
_CALENDAR = {"hour", "day", "week", "month"}


def _split_level(aggs: dict, path: str):
    """One DSL level -> (bucket (name, type, body, sub) | None,
    [(metric name, type, body), ...], [(pipeline name, type, body),
    ...]); raises on unsupported shapes."""
    if not isinstance(aggs, dict) or not aggs:
        raise ValueError(f"{path}: aggs must be a non-empty object")
    bucket = None
    metrics = []
    pipelines = []
    for name, spec in aggs.items():
        if not isinstance(spec, dict):
            raise ValueError(f"{path}.{name}: agg body must be an object")
        sub = spec.get("aggs", spec.get("aggregations"))
        types = [k for k in spec if k not in ("aggs", "aggregations")]
        if len(types) != 1:
            raise ValueError(
                f"{path}.{name}: expected exactly one agg type, got {types}"
            )
        t = types[0]
        if t in _BUCKET_TYPES:
            if bucket is not None:
                raise ValueError(
                    f"{path}: sibling bucket aggs ({bucket[0]!r}, {name!r}) "
                    "need separate result rectangles — run them as two "
                    "run_aggs calls"
                )
            bucket = (name, t, spec[t], sub)
        elif t in _METRIC_TYPES or t == "top_hits":
            if sub:
                raise ValueError(f"{path}.{name}: metric aggs take no sub-aggs")
            metrics.append((name, t, spec[t]))
        elif t in _PIPELINE_TYPES:
            if sub:
                raise ValueError(
                    f"{path}.{name}: pipeline aggs take no sub-aggs"
                )
            pipelines.append((name, t, spec[t]))
        else:
            raise ValueError(
                f"{path}.{name}: unsupported agg type {t!r} "
                f"(buckets: {sorted(_BUCKET_TYPES)}, "
                f"metrics: {sorted(_METRIC_TYPES)} + top_hits, "
                f"pipelines: {sorted(_PIPELINE_TYPES)})"
            )
    if bucket is not None and (metrics or pipelines):
        raise ValueError(
            f"{path}: agg(s) "
            f"{[m[0] for m in metrics] + [p[0] for p in pipelines]} next to "
            f"bucket agg {bucket[0]!r} would apply to the parent scope — "
            "nest them inside the bucket's own 'aggs'"
        )
    return bucket, metrics, pipelines


def _require(body: dict, path: str, required: set, optional: set):
    if not isinstance(body, dict):
        raise ValueError(f"{path}: body must be an object, got {body!r}")
    missing = required - set(body)
    unknown = set(body) - required - optional
    if missing or unknown:
        raise ValueError(
            f"{path}: missing keys {sorted(missing)}, unknown keys "
            f"{sorted(unknown)}"
        )


class _Level:
    """One bucket level: projected key column + post-agg cut policy."""

    def __init__(self, name, key_expr, size=None, min_doc_count=1,
                 densify=None, drop_null_key=True, prefilter=None):
        self.name = name
        self.key_expr = key_expr
        self.size = size
        self.min_doc_count = min_doc_count
        self.densify = densify  # (interval Column, kind) for histogram mdc=0
        self.drop_null_key = drop_null_key
        self.prefilter = prefilter  # single-bucket `filter` scope


def _range_pairs(col: Column, ranges, path: str) -> Column:
    """Shared by ``range`` and ``geo_distance``: declared half-open
    [from, to) bands over ``col`` as a compacted membership array (a
    row may land in several — ES semantics; NULL values in none).
    Default keys render ES-style as doubles ('10.0-60.0', '*-10.0')."""
    if not isinstance(ranges, list) or not ranges:
        raise ValueError(f"{path}: ranges must be a non-empty list")
    entries = []
    for r in ranges:
        _require(r, f"{path}.ranges[]", set(), {"from", "to", "key"})
        lo, hi = r.get("from"), r.get("to")
        if lo is None and hi is None:
            raise ValueError(f"{path}: a range needs 'from' and/or 'to'")
        key = r.get("key")
        if key is None:
            key = (f"{'*' if lo is None else float(lo)}-"
                   f"{'*' if hi is None else float(hi)}")
        pred = F.lit(True)
        if lo is not None:
            pred = pred & (col >= F.lit(float(lo)))
        if hi is not None:
            pred = pred & (col < F.lit(float(hi)))
        entries.append(
            F.when(pred & col.isNotNull(), F.lit(str(key)))
        )
    return F.array_compact(F.array(*entries))


def _compile_bucket(name, btype, body, innermost: bool) -> tuple:
    """-> (_Level, explode_pairs | None). explode_pairs is a Column of
    array<struct<k,...>> for multi-membership leaves (range/filters)."""
    path = f"aggs.{name}"
    if btype == "terms":
        _require(body, path, {"field"}, {"size", "min_doc_count"})
        return _Level(
            name, F.col(body["field"]).cast("string"),
            size=int(body.get("size", 10)),
            min_doc_count=int(body.get("min_doc_count", 1)),
        ), None
    if btype == "multi_terms":
        # ES multi_terms: buckets keyed on a field TUPLE; key_as_string
        # joins with '|' (the ES response convention). A doc missing
        # ANY of the fields lands in no bucket (ES semantics — the
        # null-key drop below sees the null-propagating concat_ws
        # guard, not concat_ws's null-skipping).
        _require(body, path, {"terms"}, {"size", "min_doc_count"})
        terms = body["terms"]
        if not isinstance(terms, list) or len(terms) < 2:
            raise ValueError(f"{path}: multi_terms needs >= 2 terms")
        cols = []
        for t in terms:
            _require(t, f"{path}.terms[]", {"field"}, set())
            cols.append(F.col(t["field"]).cast("string"))
        any_null = cols[0].isNull()
        for c in cols[1:]:
            any_null = any_null | c.isNull()
        key = F.when(~any_null, F.concat_ws("|", *cols))
        return _Level(
            name, key,
            size=int(body.get("size", 10)),
            min_doc_count=int(body.get("min_doc_count", 1)),
        ), None
    if btype == "histogram":
        _require(body, path, {"field", "interval"}, {"min_doc_count"})
        interval = float(body["interval"])
        if interval <= 0:
            raise ValueError(f"{path}: interval must be > 0")
        mdc = int(body.get("min_doc_count", 0))
        key = (
            F.floor(F.col(body["field"]) / F.lit(interval)) * F.lit(interval)
        ).cast("double")
        densify = None
        if mdc == 0:
            if not innermost:
                raise ValueError(
                    f"{path}: min_doc_count=0 (gap-free grid) is only "
                    "supported at the innermost bucket level — empty "
                    "buckets have no sub-bucket rows to carry"
                )
            densify = (F.lit(interval), "num")
        return _Level(name, key, min_doc_count=max(mdc, 0) or 0,
                      densify=densify), None
    if btype == "date_histogram":
        _require(body, path, {"field", "calendar_interval"},
                 {"min_doc_count"})
        unit = body["calendar_interval"]
        if unit not in _CALENDAR:
            raise ValueError(
                f"{path}: calendar_interval must be one of "
                f"{sorted(_CALENDAR)}, got {unit!r}"
            )
        mdc = int(body.get("min_doc_count", 0))
        key = F.date_trunc(unit, F.col(body["field"]))
        densify = None
        if mdc == 0:
            if not innermost:
                raise ValueError(
                    f"{path}: min_doc_count=0 (the ES default — a gap-free "
                    "grid) is only supported at the innermost bucket level; "
                    "set min_doc_count>=1 on a mid-chain date_histogram"
                )
            step_sql = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY",
                        "week": "INTERVAL 7 DAY", "month": "INTERVAL 1 MONTH"}
            densify = (F.expr(step_sql[unit]), "ts")
        return _Level(name, key, min_doc_count=mdc, densify=densify), None
    if btype == "range":
        _require(body, path, {"field", "ranges"}, set())
        pairs = _range_pairs(F.col(body["field"]), body["ranges"], path)
        return _Level(name, None), pairs
    if btype == "geo_distance":
        # ES geo_distance rings, columnar twist: lat/lon FIELDS plus
        # an [lat, lon] origin (this engine has no geo_point type —
        # the operators/geo convention), ranges in km half-open
        # [from, to) banding the RAW haversine (codegen trig; a NULL
        # coordinate NULLs the distance and lands in no ring)
        from platypus_ingestion_plugins_spark.operators.geo import (
            haversine_km,
        )
        _require(body, path, {"lat_field", "lon_field", "origin",
                              "ranges"}, set())
        origin = body["origin"]
        # object form ONLY: ES's array geo_point is [lon, lat] while
        # most humans write [lat, lon] — both orders are numerically
        # valid coordinates, so a bare array would silently compute
        # wrong rings whichever convention we picked; {lat, lon} keys
        # make the order impossible to get wrong
        if (not isinstance(origin, dict)
                or set(origin) != {"lat", "lon"}):
            raise ValueError(
                f"{path}: origin must be {{'lat': .., 'lon': ..}} — a "
                "bare [a, b] array is ambiguous (ES's geo_point arrays "
                "are [lon, lat], GeoJSON too, but [lat, lon] is the "
                "common hand-written order)"
            )
        dist = haversine_km(
            F.col(body["lat_field"]), F.col(body["lon_field"]),
            float(origin["lat"]), float(origin["lon"]),
        )
        pairs = _range_pairs(dist, body["ranges"], path)
        return _Level(name, None), pairs
    if btype == "missing":
        # ES missing bucket: docs WITHOUT the field — the data-quality
        # counterpart of exists; scope narrows like `filter`
        _require(body, path, {"field"}, set())
        return _Level(
            name, F.lit(name), drop_null_key=False,
            prefilter=F.col(body["field"]).isNull(),
        ), None
    if btype == "filter":
        # ES single-bucket filter: narrows the scope for everything
        # below; the bucket key is the constant agg name (the named
        # single bucket the ES response shows)
        from platypus_ingestion_plugins_spark.serving.query import parse_query
        return _Level(
            name, F.lit(name), drop_null_key=False,
            prefilter=parse_query(body),
        ), None
    if btype == "filters":
        from platypus_ingestion_plugins_spark.serving.query import parse_query
        _require(body, path, {"filters"}, set())
        named = body["filters"]
        if not isinstance(named, dict) or not named:
            raise ValueError(f"{path}: filters must be a non-empty object")
        entries = [
            F.when(parse_query(q), F.lit(str(fname)))
            for fname, q in named.items()
        ]
        pairs = F.array_compact(F.array(*entries))
        return _Level(name, None), pairs
    raise AssertionError(btype)


def _percents(body, path) -> list:
    ps = body.get("percents", list(_DEFAULT_PERCENTS))
    if not isinstance(ps, list) or not ps:
        raise ValueError(f"{path}: percents must be a non-empty list")
    out = []
    for p in ps:
        if not isinstance(p, (int, float)) or not 0 < p < 100 \
                or int(p) != p:
            raise ValueError(
                f"{path}: percents must be whole numbers in (0, 100) — "
                f"they become column suffixes ('_p50'); got {p!r}"
            )
        out.append(int(p))
    return out


def _metric_exprs(metrics) -> list:
    out = []
    for name, t, body in metrics:
        if t == "percentiles":
            _require(body, f"aggs.{name}", {"field"},
                     {"percents", "approx"})
            col = F.col(body["field"])
            # EXACT by default where ES TDigests (the
            # percentile_ranks_facet contract; quantile_cont
            # interpolation, so an external engine replays the
            # values). Exact percentile buffers a group's values in
            # the aggregator — per-group-bounded, not corpus-bounded,
            # but at 100 TB per bucket pass "approx": true for
            # Spark's bounded-memory sketch (the ES-TDigest class;
            # same call shape, values within the sketch's error
            # bound, not oracle-replayable).
            fn = (
                (lambda c, p: F.percentile_approx(c, F.lit(p)))
                if body.get("approx")
                else (lambda c, p: F.percentile(c, F.lit(p)))
            )
            out.extend(
                fn(col, p / 100.0).alias(f"{name}_p{p}")
                for p in _percents(body, f"aggs.{name}")
            )
            continue
        _require(body, f"aggs.{name}", {"field"}, set())
        col = F.col(body["field"])
        if t == "avg":
            out.append(F.avg(col).alias(name))
        elif t == "sum":
            out.append(F.sum(col).alias(name))
        elif t == "min":
            out.append(F.min(col).alias(name))
        elif t == "max":
            out.append(F.max(col).alias(name))
        elif t == "value_count":
            out.append(F.count(col).alias(name))
        elif t == "cardinality":
            # exact where ES HyperLogLogs — documented contract
            out.append(F.count_distinct(col).alias(name))
        elif t == "stats":
            out.extend([
                F.count(col).alias(f"{name}_count"),
                F.min(col).alias(f"{name}_min"),
                F.max(col).alias(f"{name}_max"),
                F.avg(col).alias(f"{name}_avg"),
                F.sum(col).alias(f"{name}_sum"),
            ])
        else:
            raise AssertionError(t)
    return out


def _one_sort(s, path: str) -> tuple:
    """One ES sort entry {field: "asc"|"desc"} -> (field, direction)."""
    if isinstance(s, str):
        return s, "asc"  # ES's bare-field shorthand
    if not isinstance(s, dict) or len(s) != 1:
        raise ValueError(f"{path}: sort entries are {{field: asc|desc}}")
    fld, d = next(iter(s.items()))
    if isinstance(d, dict):
        d = d.get("order", "asc")  # the ES long form {"order": ...}
    if d not in ("asc", "desc"):
        raise ValueError(f"{path}: sort order must be asc|desc, got {d!r}")
    return fld, d


def _apply_cuts(out, levels, keys, snapshots):
    """Per-level min_doc_count / terms-size cuts over any rectangle
    carrying the key columns (the grouped grid OR the top_hits rows).
    A level's TRUE bucket count (ES doc_count) aggregates its
    SNAPSHOT — one extra partial-aggregatable pass per cut level,
    joined bucket-grid-sized. A window sum over the final rectangle
    would be cheaper but WRONG under scope-modifying children (a
    child filter must not demote a big parent)."""
    for i, lvl in enumerate(levels):
        need_mdc = lvl.min_doc_count > (
            0 if lvl.densify is not None else 1
        )
        if lvl.size is None and not need_mdc:
            continue
        totals = snapshots[i].groupBy(*keys[: i + 1]).agg(
            F.count(F.lit(1)).alias("__lvl_cnt")
        )
        out = out.join(totals, keys[: i + 1], "left")
        if need_mdc:
            out = out.where(F.col("__lvl_cnt") >= F.lit(lvl.min_doc_count))
        if lvl.size is not None:
            w = Window.partitionBy(*keys[:i]).orderBy(
                F.col("__lvl_cnt").desc(), F.col(lvl.name).asc()
            )
            out = (
                out.withColumn("__rk", F.dense_rank().over(w))
                .where(F.col("__rk") <= F.lit(lvl.size))
                .drop("__rk")
            )
        out = out.drop("__lvl_cnt")
    return out


def run_aggs(df: DataFrame, dsl) -> DataFrame:
    """Run an ES request body's ``aggs`` (plus optional ``query``)
    against ``df``; see the module docstring for the supported surface
    and the one-bucket-chain shape rule.  Accepts a dict or a JSON
    string.  Returns one row per innermost bucket combination with the
    bucket-key columns (named after the bucket aggs), ``doc_count``,
    and any metric columns."""
    if isinstance(dsl, str):
        try:
            dsl = _json.loads(dsl)
        except ValueError as e:
            raise ValueError(f"invalid aggs JSON: {e}") from None
    if not isinstance(dsl, dict):
        raise ValueError(f"aggs DSL must be an object, got {dsl!r}")
    known = {"query", "aggs", "aggregations"}
    unknown = set(dsl) - known
    if unknown:
        raise ValueError(f"unknown request keys {sorted(unknown)}")
    if dsl.get("query") is not None:
        from platypus_ingestion_plugins_spark.serving.query import parse_query
        df = df.filter(parse_query(dsl["query"]))
    aggs = dsl.get("aggs", dsl.get("aggregations"))
    if aggs is None:
        raise ValueError("request has no 'aggs'")

    # Linearize the bucket chain.
    levels: list[_Level] = []
    explode_at: list = []  # (level index, pairs Column)
    node = aggs
    metrics = []
    pipelines = []
    inner_btype = None
    while node is not None:
        bucket, lvl_metrics, lvl_pipelines = _split_level(node, "aggs")
        if bucket is None:
            metrics = lvl_metrics
            pipelines = lvl_pipelines
            break
        name, btype, body, sub = bucket
        inner_btype = btype
        # innermost = no bucket agg BELOW (metric-only sub-aggs keep
        # this level innermost for the gap-free-grid rule)
        innermost = sub is None or _split_level(sub, f"aggs.{name}")[0] is None
        lvl, pairs = _compile_bucket(name, btype, body, innermost=innermost)
        if pairs is not None:
            explode_at.append((len(levels), pairs))
        levels.append(lvl)
        node = sub
    if not levels and not metrics:
        raise ValueError("aggs resolved to neither buckets nor metrics")
    if pipelines and inner_btype not in ("histogram", "date_histogram"):
        raise ValueError(
            f"pipeline agg(s) {[p[0] for p in pipelines]} need an ORDERED "
            "histogram/date_histogram axis as the innermost bucket "
            f"(innermost here: {inner_btype!r})"
        )
    # stats explodes into <name>_{count,min,max,avg,sum} columns,
    # percentiles into <name>_pNN, and top_hits is not a metric column
    # at all — none is addressable as a single buckets_path column, so
    # excluding them here turns the later opaque AnalysisException on
    # F.col(bp) into the module's documented loud ValueError
    metric_names = {
        m[0] for m in metrics
        if m[1] not in ("stats", "percentiles", "top_hits")
    }
    for pname, pt, pbody in pipelines:
        _require(pbody, f"aggs.{pname}", {"buckets_path"},
                 {"window", "gap_policy"} if pt == "moving_avg"
                 else {"gap_policy"})
        gp = pbody.get("gap_policy", "skip")
        if gp not in _GAP_POLICIES:
            raise ValueError(
                f"aggs.{pname}: gap_policy must be one of "
                f"{sorted(_GAP_POLICIES)}, got {gp!r}"
            )
        bp = pbody["buckets_path"]
        if bp != "_count" and bp not in metric_names:
            raise ValueError(
                f"aggs.{pname}: buckets_path {bp!r} must be '_count' or a "
                f"sibling non-stats metric name {sorted(metric_names)}"
            )

    # top_hits: the per-bucket example rows every dashboard drill-down
    # wants — emitted as a FLAT rectangle (keys + hit_rank + _source
    # columns, one row per hit) rather than ES's nested hit arrays,
    # which is both oracle-replayable and what a DataFrame consumer
    # actually joins on. Must be the ONLY agg at its level (hits and
    # aggregates need different rectangles).
    tophit = next(
        ((n, b) for n, t, b in metrics if t == "top_hits"), None
    )
    if tophit is not None:
        if len(metrics) > 1 or pipelines:
            raise ValueError(
                "top_hits must be the only agg at its level — hits and "
                "aggregate metrics need different result rectangles"
            )
        tname, tbody = tophit
        _require(tbody, f"aggs.{tname}", {"sort", "_source"}, {"size"})
        tsort = tbody["sort"]
        if not isinstance(tsort, list) or not tsort:
            raise ValueError(
                f"aggs.{tname}: sort must be a non-empty list (there is "
                "no _score context here — include a unique field last "
                "for a deterministic order)"
            )
        tsrc = tbody["_source"]
        if not isinstance(tsrc, list) or not tsrc:
            raise ValueError(
                f"aggs.{tname}: _source must be a non-empty column list"
            )
        sort_exprs = []
        for s in tsort:
            fld, direction = _one_sort(s, f"aggs.{tname}")
            c = F.col(fld)
            sort_exprs.append(c.desc() if direction == "desc" else c.asc())
        tsize = int(tbody.get("size", 3))
        if tsize < 1:
            raise ValueError(f"aggs.{tname}: size must be >= 1")
        hit_names = [lvl.name for lvl in levels] + ["hit_rank"] + list(tsrc)
        dupes = {n for n in hit_names if hit_names.count(n) > 1}
        shadows = {lvl.name for lvl in levels} & set(df.columns)
        if dupes or shadows:
            raise ValueError(
                f"top_hits name collision: duplicates {sorted(dupes)}, "
                f"input-column shadows {sorted(shadows)}"
            )
        metrics = []

    # Name hygiene, raised loudly (the module contract): ES keeps agg
    # names and field names in separate namespaces, but this executor
    # materializes bucket keys AS columns — a level name shadowing an
    # input column would silently corrupt deeper keys/metrics, and
    # duplicate output names would overwrite each other.
    out_names = [lvl.name for lvl in levels] + ["doc_count"]
    for name, t, body in metrics:
        if t == "stats":
            out_names.extend(
                f"{name}_{s}" for s in ("count", "min", "max", "avg", "sum")
            )
        elif t == "percentiles":
            out_names.extend(
                f"{name}_p{p}" for p in _percents(body, f"aggs.{name}")
            )
        else:
            out_names.append(name)
    out_names.extend(p[0] for p in pipelines)
    dupes = {n for n in out_names if out_names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"duplicate output column name(s) {sorted(dupes)} — rename the "
            "agg(s); 'doc_count' is reserved"
        )
    shadows = {lvl.name for lvl in levels} & set(df.columns)
    if shadows:
        raise ValueError(
            f"bucket agg name(s) {sorted(shadows)} shadow input column(s) — "
            "bucket keys materialize as columns here, rename the agg(s)"
        )

    # Project bucket keys (multi-membership leaves explode map-side),
    # snapshotting the frame at each level: a level's TRUE bucket
    # totals (ES doc_count semantics) must count rows BEFORE any
    # deeper scope-modifying transform (a child filter/range/terms
    # null-drop must not change its parent's ranking).
    snapshots: list[DataFrame] = []
    for i, lvl in enumerate(levels):
        if lvl.prefilter is not None:
            df = df.where(lvl.prefilter)
        pairs = next((p for j, p in explode_at if j == i), None)
        if pairs is not None:
            df = df.withColumn(lvl.name, F.explode(pairs))
        else:
            df = df.withColumn(lvl.name, lvl.key_expr)
            if lvl.drop_null_key:
                df = df.where(F.col(lvl.name).isNotNull())
        snapshots.append(df)

    keys = [lvl.name for lvl in levels]
    if tophit is not None:
        w = Window.partitionBy(*keys).orderBy(*sort_exprs)
        out = (
            df.withColumn("hit_rank", F.row_number().over(w))
            .where(F.col("hit_rank") <= F.lit(tsize))
            .select(*keys, "hit_rank", *tsrc)
        )
        return _apply_cuts(out, levels, keys, snapshots)
    if not keys:
        return df.agg(*_metric_exprs(metrics))
    grouped = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("doc_count"), *_metric_exprs(metrics)
    )

    # Histogram/date-histogram gap-free grid (innermost level only):
    # per-parent extent -> sequence -> left join. Grid frames are
    # bucket-bounded (a plot axis, never the corpus).
    last = levels[-1]
    if last.densify is not None:
        step, kind = last.densify
        parents = keys[:-1]
        ext = grouped.groupBy(*parents).agg(
            F.min(last.name).alias("__lo"), F.max(last.name).alias("__hi")
        ) if parents else grouped.agg(
            F.min(last.name).alias("__lo"), F.max(last.name).alias("__hi")
        )
        if kind == "num":
            # float sequence via integer steps (F.sequence is int/ts).
            # Grid values MUST be built as (integer * interval) — the
            # exact float expression the bucket key uses — not as
            # lo + i*interval, whose ULP drift on fractional intervals
            # would miss the join and silently zero realized buckets.
            n_lo = F.round(F.col("__lo") / step).cast("long")
            n_hi = F.round(F.col("__hi") / step).cast("long")
            grid = ext.select(
                *parents,
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0).cast("long"), n_hi - n_lo),
                        lambda i: ((n_lo + i) * step).cast("double"),
                    )
                ).alias(last.name),
            )
        else:
            grid = ext.select(
                *parents,
                F.explode(
                    F.sequence(F.col("__lo"), F.col("__hi"), step)
                ).alias(last.name),
            )
        fill = [F.coalesce(F.col("doc_count"), F.lit(0)).alias("doc_count")]
        metric_cols = [c for c in grouped.columns
                       if c not in keys and c != "doc_count"]
        grouped = grid.join(grouped, on=parents + [last.name], how="left") \
            .select(*keys, *fill, *[F.col(c) for c in metric_cols])

    # Per-level min_doc_count / terms-size cuts (shared _apply_cuts;
    # see its docstring for the snapshot-totals reasoning).
    out = _apply_cuts(grouped, levels, keys, snapshots)
    out = out.select(*keys, "doc_count", *[
        c for c in grouped.columns if c not in keys and c != "doc_count"
    ])

    # ES pipeline aggs over the innermost ordered axis (the
    # date_histogram_pipeline conventions: running total includes the
    # current bucket, derivative is NULL on each parent's first
    # bucket, moving_avg is the trailing-window mean, 6dp). Windows
    # partition by the parent keys over the bucket-grid rectangle —
    # a plot axis per parent, never the corpus.
    if pipelines:
        parents = keys[:-1]
        axis = keys[-1]
        for pname, pt, pbody in pipelines:
            bp = pbody["buckets_path"]
            src = F.col("doc_count" if bp == "_count" else bp)
            if pbody.get("gap_policy", "skip") == "insert_zeros":
                # ES insert_zeros: a gap bucket CONTRIBUTES a zero to
                # every pipeline stage instead of being skipped over
                src = F.coalesce(src, F.lit(0))
            if pt == "cumulative_sum":
                w = Window.partitionBy(*parents).orderBy(axis).rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
                expr = F.sum(src).over(w)
            elif pt == "derivative":
                # last-non-NULL, not lag: ES gap_policy 'skip' — a
                # densified gap bucket's NULL metric must not also
                # NULL the derivative of the NEXT real bucket
                w = Window.partitionBy(*parents).orderBy(axis).rowsBetween(
                    Window.unboundedPreceding, -1
                )
                expr = src - F.last(src, ignorenulls=True).over(w)
            else:  # moving_avg
                window = int(pbody.get("window", 5))
                if window < 1:
                    raise ValueError(
                        f"aggs.{pname}: window must be >= 1, got {window}"
                    )
                w = Window.partitionBy(*parents).orderBy(axis).rowsBetween(
                    -(window - 1), 0
                )
                expr = F.round(F.avg(src).over(w), 6)
            out = out.withColumn(pname, expr)
    return out
