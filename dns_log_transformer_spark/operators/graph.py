"""Iterative graph algorithms as DataFrame joins.

Connected components (duplicate clusters) lives with the dedup family
(operators/dedup.py:243+); this module holds the general iterative
pattern exemplar: PageRank. No reference analog (the reference is a
record-at-a-time log transformer); this covers the "iterative algorithm
on a 100 TB edge list" shape — each iteration is two joins and one
aggregation, all key-partitioned, with per-iteration persists so the
lineage (and any recomputation) stays one-iteration deep.

Arithmetic is EXACT-INTEGER throughout (scaled ranks, floor division)
so a DuckDB oracle unrolls the same iterations bit-for-bit: float
PageRank would fold contributions in nondeterministic order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.caching import persist_tracked

PR_SCALE = 1_000_000  # ranks are fixed-point: 1.0 == PR_SCALE


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    scale: int = PR_SCALE,
    d_num: int = 85,
    d_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (damping
    d_num/d_den, simple variant: dangling mass is not redistributed —
    documented, deterministic).

    Per iteration: contrib(u) = rank(u) DIV outdeg(u) (exact floor
    division), inc(v) = sum of contribs over in-edges (exact int64
    sum — combine-order-independent, unlike a float fold), rank'(v) =
    (1-d)*scale + (d_num * inc) DIV d_den.

    Shape at scale: the static out-degree is attached to the rank frame
    ONCE (setup), so the per-node contribution is a PROJECTION of the
    previous iteration's cached ranks (#nodes rows — no per-iteration
    ranks ⋈ degrees join), and each iteration does exactly ONE join
    over the edge list (broadcast of the #nodes-sized contributions)
    plus a map-side-combined sum and one node-sized left join; the
    division happens #nodes times, never #edges times. No driver
    state, no windows.

    Caching: within a single action each iteration's ranks feed exactly
    ONE downstream consumer (the next iteration), so caching superseded
    iterations buys nothing — each persist is dropped (lazily, before
    it ever materializes) as soon as the next iteration's plan replaces
    it, and only the FINAL ranks stay cached for multi-action
    consumers. Lineage depth grows with ``iters`` (bounded, 3 here);
    callers running MANY iterations should ``localCheckpoint`` the
    ranks every few iterations to cap replay and plan size.

    The caller owns edge caching: `edges` is scanned iters+2 times
    (nodes once, degrees once, one per iteration), so persist the
    expensive part of its lineage upstream — the operator does not
    re-persist a possibly-already-cached input.

    Output: (node, pr_rank) for every node, pr_rank in scaled units.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    # one 1->2 Generate scan, not a two-branch union: union branches
    # race the (caller-owned) edge cache on the first action
    nodes = e.select(
        F.explode(F.array(F.col("_s"), F.col("_d"))).alias("node")
    ).distinct()
    deg = e.groupBy(F.col("_s").alias("node")).agg(
        F.count("*").alias("_outdeg")
    )
    # DEGREE FOLDED INTO THE RANK FRAME (r16, guide §2.4 remove
    # shuffles): the old loop joined ranks x degrees EVERY iteration to
    # form contributions. outdeg is static, so attach it ONCE (nodes
    # LEFT JOIN deg — sink nodes keep a NULL outdeg and contribute
    # nothing, exactly like the old inner join) and each iteration's
    # contribution becomes a cached-frame PROJECTION: one join per
    # iteration (edges x contributions) instead of two, and the
    # separate nodes/deg persists collapse into this single frame.
    ndeg = persist_tracked(nodes.join(deg, "node", "left"))
    base = scale - (d_num * scale) // d_den
    ranks = ndeg.select(
        "node", "_outdeg", F.lit(scale).cast("long").alias("pr_rank")
    )
    prev: DataFrame | None = None
    for _ in range(iters):
        per_node = ranks.filter(F.col("_outdeg").isNotNull()).select(
            F.col("node").alias("_s"),
            F.expr("CAST(pr_rank div _outdeg AS LONG)").alias("_c"),
        )
        inc = (
            e.join(per_node, "_s")
            .groupBy(F.col("_d").alias("node"))
            .agg(F.sum("_c").alias("_inc"))
        )
        # each iteration's ranks stays persisted even though its lazy
        # consumer count is one: the NEXT iteration reads it through a
        # BroadcastExchange (the contribution build), whose
        # materialization re-executes the whole uncached lineage —
        # measured r16: dropping these persists cost +80% wall
        ranks = persist_tracked(
            ndeg.join(inc, "node", "left").select(
                "node",
                "_outdeg",
                (
                    F.lit(base)
                    + F.expr(
                        f"CAST(({d_num} * COALESCE(_inc, 0L)) div {d_den} AS LONG)"
                    )
                ).alias("pr_rank"),
            )
        )
        if prev is not None:
            prev.unpersist(False)  # superseded: consumed once, never reused
        prev = ranks
    return ranks.select("node", "pr_rank")


def triangle_count(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Exact global triangle count over an undirected edge list (rows
    are canonical ``a < b`` pairs, deduplicated by the caller).

    Uses the degree-ordered orientation: each undirected edge points
    from its lower-(degree, id) endpoint to the higher one, so every
    triangle is counted exactly once (at its lowest-degree corner) and —
    the scale property — the oriented out-degree is O(sqrt(m)) for ANY
    degree distribution, which bounds the wedge (2-path) fan-out at
    sum(out_deg^2) <= m^1.5 even when a celebrity node has degree ~n.
    An unoriented wedge join would blow up quadratically on that node.

    Plan: degree agg (one shuffle) -> broadcast-joinable degree map ->
    wedge self-join on the low corner -> semi-join the closing edge.
    Output: one row ``(n_nodes, n_edges, n_triangles)``.
    """
    e = edges.select(F.col(a).alias("_x"), F.col(b).alias("_y"))
    deg = persist_tracked(
        e.select(F.explode(F.array("_x", "_y")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    # orient: (_x,_y) -> low (deg,id) endpoint first
    dx = deg.select(F.col("node").alias("_x"), F.col("_deg").alias("_dx"))
    dy = deg.select(F.col("node").alias("_y"), F.col("_deg").alias("_dy"))
    lower_first = (F.col("_dx") < F.col("_dy")) | (
        (F.col("_dx") == F.col("_dy")) & (F.col("_x") < F.col("_y"))
    )
    oriented = persist_tracked(
        e.join(dx, "_x")
        .join(dy, "_y")
        .select(
            F.when(lower_first, F.col("_x")).otherwise(F.col("_y")).alias("_lo"),
            F.when(lower_first, F.col("_y")).otherwise(F.col("_x")).alias("_hi"),
        )
    )
    # wedges at the low corner: (_lo -> u, _lo -> v), u < v canonically
    o1 = oriented.select(F.col("_lo"), F.col("_hi").alias("_u"))
    o2 = oriented.select(F.col("_lo"), F.col("_hi").alias("_v"))
    wedges = o1.join(o2, "_lo").filter(F.col("_u") < F.col("_v"))
    # close the wedge with the ORIGINAL canonical edge list: both the
    # wedge's (_u, _v) and e's (_x, _y) are id-ascending, so one
    # equi-semi-join finds every closing edge
    closing = e.select(F.col("_x").alias("_u"), F.col("_y").alias("_v"))
    tri = wedges.join(closing, ["_u", "_v"], "left_semi")
    n_nodes = deg.select(F.count("*").alias("n")).withColumn("_k", F.lit(1))
    n_edges = e.select(F.count("*").alias("n")).withColumn("_k", F.lit(1))
    n_tri = tri.select(F.count("*").alias("n")).withColumn("_k", F.lit(1))
    return (
        n_nodes.select(F.col("_k"), F.col("n").alias("n_nodes"))
        .join(n_edges.select("_k", F.col("n").alias("n_edges")), "_k")
        .join(n_tri.select("_k", F.col("n").alias("n_triangles")), "_k")
        .drop("_k")
    )
