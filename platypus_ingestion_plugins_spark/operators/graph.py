"""Graph analytics over edge frames: weighted PageRank.

The near-dup stack already walks graphs for membership
(``connected_components_star``); this module adds CENTRALITY — which
nodes matter — for the graphs a data pipeline keeps producing: event
transitions, duplicate-pair clusters, citation/link webs.

Spark-first shape: each power-iteration round is one join of the rank
frame to the edge list plus one partial-aggregatable groupBy, both
hash-partitioned on the node key, so Spark reuses a single
partitioning across rounds. Rounds are fixed (``iterations``), not
convergence-tested — a deterministic operator an oracle can replay by
unrolling the same rounds in SQL. No collect touches edge- or
node-sized data; the only driver-side values are the two 1-row
aggregates (node count, per-round dangling mass) folded in as
broadcast scalars inside the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    weight: str | None = None,
    iterations: int = 5,
    damping: float = 0.85,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Weighted PageRank (Brin & Page 1998) over a directed edge
    frame, fixed-round power iteration:

        rank'(v) = (1-d)/N + d * (sum over in-edges u->v of
                   rank(u) * w(u,v) / out_weight(u)  +  dangling/N)

    ``weight`` of None means unweighted (every edge 1.0); parallel
    edges accumulate weight. Dangling nodes (no out-edges) donate
    their rank uniformly to every node each round — the standard
    stochastic-matrix completion, without which total rank leaks.
    Nodes are the UNION of sources and destinations; ranks start
    uniform at 1/N and sum to 1 every round (the oracle's invariant).

    Output (node, rank 6dp). Plan shape per round: rank ⋈ out_weight
    (co-partitioned on node), one groupBy(dst) fold, a 1-row dangling
    aggregate broadcast in — never a driver-side loop over nodes.
    Each round's frame is lazily localCheckpointed so round k+1's
    lineage doesn't replay rounds 1..k (the Lloyd-iteration
    precedent in ``kmeans_centroids``); rows with NULL src/dst or a
    non-positive/NULL weight are dropped (a zero-weight edge is no
    edge — keeping it would divide a zero out-weight sum), so a node
    reachable only through dropped edges leaves the graph.

    ``seeds`` (NEW r15) switches to PERSONALIZED PageRank (Haveliwala
    2002 — "importance relative to THESE nodes", the recommender /
    related-items reading): the teleport distribution concentrates
    uniformly on the seed set (a 1-column frame of node ids) instead
    of all nodes — ranks start there, the (1−d) restart returns
    there, and dangling mass redistributes there. Seeds outside the
    graph are ignored; an empty intersection raises. The default
    ``seeds=None`` path is expression-identical to before (same
    floats, same oracle)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(
            F.col(src).alias("__s"), F.col(dst).alias("__d"), w.alias("__w")
        )
        # non-positive/NULL weights drop BEFORE out-weight sums: a node
        # whose edges all weigh 0 must count as DANGLING, not divide
        # its rank by zero (NULL contribs would silently leak mass)
        .where(F.col("__w") > 0)
        .groupBy("__s", "__d")
        .agg(F.sum("__w").alias("__w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    out_w = e.groupBy(F.col("__s").alias("node")).agg(
        F.sum("__w").alias("__ow")
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    d = float(damping)
    if seeds is None:
        vbase = None
        ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
            "node", (F.lit(1.0) / F.col("__n")).alias("rank")
        )
    else:
        seed_col = seeds.columns[0]
        seed_nodes = (
            seeds.select(F.col(seed_col).alias("node"))
            .where(F.col("node").isNotNull())
            .distinct()
            .join(nodes, "node", "left_semi")
        )
        n_seeds = seed_nodes.agg(
            F.count(F.lit(1)).cast("double").alias("__ns")
        )
        if n_seeds.first()["__ns"] == 0.0:
            raise ValueError("no seed intersects the graph's node set")
        # the teleport vector as a node-keyed frame: 1/|seeds| on
        # seeds, 0 elsewhere — pinned so every round reuses it
        vbase = (
            nodes.join(
                seed_nodes.withColumn("__is", F.lit(1)), "node", "left"
            )
            .crossJoin(F.broadcast(n_seeds))
            .select(
                "node",
                F.when(F.col("__is").isNotNull(),
                       F.lit(1.0) / F.col("__ns"))
                .otherwise(F.lit(0.0)).alias("__v"),
            )
            .localCheckpoint(eager=False)
        )
        ranks = vbase.select("node", F.col("__v").alias("rank"))
    for _ in range(int(iterations)):
        with_out = ranks.join(out_w, "node", "left")
        dangling = with_out.agg(
            F.coalesce(
                F.sum(F.when(F.col("__ow").isNull(), F.col("rank"))),
                F.lit(0.0),
            ).alias("__dangle")
        )
        contrib = (
            with_out.where(F.col("__ow").isNotNull())
            .join(e, F.col("node") == F.col("__s"))
            .groupBy(F.col("__d").alias("node"))
            .agg(
                F.sum(F.col("rank") * F.col("__w") / F.col("__ow")).alias(
                    "__in"
                )
            )
        )
        if vbase is None:
            new_rank = (
                (F.lit(1.0) - F.lit(d)) / F.col("__n")
                + F.lit(d)
                * (
                    F.coalesce(F.col("__in"), F.lit(0.0))
                    + F.col("__dangle") / F.col("__n")
                )
            )
            base = nodes.join(contrib, "node", "left").crossJoin(
                F.broadcast(n_nodes)
            )
        else:
            new_rank = (
                (F.lit(1.0) - F.lit(d)) * F.col("__v")
                + F.lit(d)
                * (
                    F.coalesce(F.col("__in"), F.lit(0.0))
                    + F.col("__dangle") * F.col("__v")
                )
            )
            base = vbase.join(contrib, "node", "left")
        ranks = (
            base.crossJoin(F.broadcast(dangling))
            .select("node", new_rank.alias("rank"))
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def triangle_count(
    edges: DataFrame, src: str, dst: str
) -> DataFrame:
    """Per-node triangle counts (NEW r15) — the clustering signal next
    to PageRank's centrality: how many triangles each node closes in
    the UNDIRECTED graph under ``edges`` (direction and duplicate
    edges ignored; self-loops dropped). Output ``(node, triangles)``
    for every node on at least one edge, zero rows included.

    Spark-first shape — the degree-ordered wedge join (Suri &
    Vassilvitskii 2011, "Counting triangles and the curse of the last
    reducer"): canonicalize + dedup the edge set, compute degrees, and
    orient every edge from its LOWER-(degree, id) endpoint to the
    higher. Each node then generates wedges only among its
    higher-ranked neighbors, so a celebrity node of degree d produces
    O(matched pairs) wedges from its few lower-ranked edges instead of
    d^2 — total wedge volume is O(m^1.5) regardless of skew, the
    property that makes this the 100 TB shape. The pipeline is three
    self-joins/groupBys all hash-partitioned on node ids:
    wedges(a,b,c) from oriented edges (a->b, a->c, b<c), closed by an
    oriented edge (b->c); each closed triangle credits all three
    corners via one map-side explode + a partial-aggregatable count.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    # orient low-(degree, id) -> high-(degree, id)
    ranked = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"),
               "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"),
              "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    l1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    l2 = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    wedges = l1.join(l2, "a").where(F.col("b") < F.col("c"))
    closed = wedges.join(
        # the closing edge may be oriented either way relative to the
        # wedge's VALUE-ordered (b, c); unionByName — a positional
        # union would silently re-emit the same direction twice and
        # double every count
        oriented.select(F.col("s").alias("b"), F.col("t").alias("c"))
        .unionByName(
            oriented.select(F.col("s").alias("c"), F.col("t").alias("b"))
        ),
        ["b", "c"],
    )
    corners = closed.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    tri = corners.groupBy("node").agg(
        (F.count(F.lit(1))).alias("triangles")
    )
    nodes = deg.select(F.col("n").alias("node"))
    return (
        nodes.join(tri, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        )
    )


def label_propagation(
    edges: DataFrame, src: str, dst: str, rounds: int = 4
) -> DataFrame:
    """Synchronous label-propagation communities (NEW r15; Raghavan et
    al. 2007) — the community twin of ``triangle_count``'s clustering
    and ``pagerank``'s centrality, and the cheap first answer to "what
    CLUSTERS does this interaction graph have" before anything as
    heavy as modularity optimization. Undirected; every node starts
    labeled with its own id, and each round RE-labels every node with
    the most frequent label among its neighbors, ties to the SMALLEST
    label — a deterministic total order, so a fixed-``rounds`` run is
    exactly replayable (the ``pagerank`` oracle rule; classic LPA's
    random tie-breaks cannot be value-checked). Output
    ``(node, label)``; labels share the node-id type.

    Spark-first shape: each round is one co-partitioned join of the
    label frame to the doubled edge list plus one partial-aggregatable
    (node, label) count and one per-node argmax window — the window
    input is one row per DISTINCT neighbor label, bounded by degree,
    never the corpus. Rounds reuse the node-key hash partitioning, and
    a lazy localCheckpoint per round keeps round k+1 from replaying
    1..k (the pagerank precedent). Skew note: a celebrity node's vote
    count is |distinct neighbor labels| <= degree rows into ONE
    window partition — at 100 TB cap hub degrees upstream (the
    ``lsh_candidate_pairs`` hot-band precedent) or pre-aggregate votes
    by (node, label), which this already does."""
    from pyspark.sql import Window

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
        .where(F.col("s").isNotNull() & F.col("t").isNotNull())
        .where(F.col("s") != F.col("t"))
        .distinct()
    )
    both = und.unionByName(
        und.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).distinct()
    labels = (
        both.select(F.col("s").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(rounds):
        votes = (
            both.join(
                labels.select(
                    F.col("node").alias("t"), F.col("label")
                ),
                "t",
            )
            .groupBy(F.col("s").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("node", "label")
        )
        labels = labels.localCheckpoint(eager=False)
    return labels


def k_core(
    edges: DataFrame, src: str, dst: str, k: int = 2, rounds: int = 8
) -> DataFrame:
    """k-core decomposition by iterative peeling (NEW r15; Seidman
    1983) — the densest-region filter next to ``triangle_count``'s
    clustering: repeatedly drop every node with fewer than ``k``
    surviving neighbors until the graph stabilizes; what remains is
    the k-core, the standard noise-trim before any community or
    centrality read (a near-dup cluster's core members, the
    interaction subgraph worth modeling). Undirected, dedup'd,
    self-loops dropped. Output ``(node, degree)`` of the surviving
    subgraph — empty when no k-core exists.

    ``rounds`` fixed peels, not convergence-tested (the ``pagerank``
    oracle rule — an oracle replays the same rounds; peeling is
    IDEMPOTENT once converged, so extra rounds are no-ops and a graph
    whose peel depth exceeds ``rounds`` returns the partially-peeled
    superset, documented). Each peel = one degree groupBy + two
    semi-joins, all hash-partitioned on node ids; a lazy
    localCheckpoint per peel keeps round r+1 from replaying 1..r."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= F.lit(k)).select("n")
        e = (
            e.join(keep.withColumnRenamed("n", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("n", "v"), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
