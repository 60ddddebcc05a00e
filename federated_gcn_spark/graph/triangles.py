"""Triangle counting and global clustering coefficient.

Extends the graph plane (graph/graph.py aggregate_messages etc.; the
reference's StellarGraph surface stops at neighbor sampling) with the
classic motif statistic used for graph health checks before GNN
training — a bipartite projection mistake or an edge-duplication bug
shows up immediately as an absurd triangle count.

Scale design (Suri & Vassilvitskii, "Counting Triangles and the Curse
of the Last Reducer", WWW'11): orient every undirected edge from its
lower-(degree, id) endpoint to the higher one. Every triangle then has
exactly one node with two outgoing oriented edges, so

    triangles = |wedges(out,out) ⋈ oriented closing edge|

counts each triangle exactly once, and — the point at 100 TB — the
max oriented out-degree is O(√m), so the wedge self-join on the hub
of a skewed graph is bounded: a celebrity node with 10⁸ followers
contributes wedges only through its (few) higher-degree peers, never
10¹⁶ pairs. Both joins are plain equi-joins (src, then (src,dst)
pair) — shuffle-partitioned, AQE-skew-splittable, no broadcast needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(edges: DataFrame) -> DataFrame:
    """Canonical simple undirected edge set: (a < b), self-loops and
    duplicate/reverse copies removed."""
    a = F.least("src", "dst").alias("a")
    b = F.greatest("src", "dst").alias("b")
    return (
        edges.select(a, b).where(F.col("a") != F.col("b")).distinct()
    )


def oriented_by_degree(und: DataFrame) -> DataFrame:
    """Orient each undirected edge from the endpoint with lower
    (degree, id) toward the higher one. Output columns (u, v, deg_v) —
    deg_v rides along because downstream wedge pairing must order
    endpoints by the SAME (degree, id) key: ordering wedge pairs by
    bare id while edges are degree-oriented silently drops every
    triangle whose id order disagrees with its degree order."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(
        F.col("node").alias("a"), F.col("deg").alias("deg_a")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("deg").alias("deg_b")
    )
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v"),
    )


def wedge_partitions(df: DataFrame, n_edges: int) -> int:
    """Row-count-derived partition count for the wedge enumeration.

    The wedge self-join stage is CPU-dense relative to its input bytes
    (each task expands out-neighbor pairs, filters, and probes the
    closing side), and its task count is the ORIENTED-EDGE checkpoint's
    partition count — which AQE's byte-based coalescing squeezes to 1-3
    on a few MB of edges (the ppjoin §regime-3 starvation shape,
    measured at sf0.1).  Size it from the row count instead: floored at
    the cluster's defaultParallelism and growing with the data — never
    a local-mode constant, never a cap at scale.
    """
    return max(
        df.sparkSession.sparkContext.defaultParallelism,
        int(n_edges) // 20_000 + 1,
    )


def _oriented_wedge_triangles(
    ori: DataFrame, n_edges: int | None = None
) -> DataFrame:
    """(u, x, y) rows, one per triangle, from degree-oriented edges.

    The wedge pair (x, y) is ordered by (deg, id) — the orientation key
    — so the closing edge is always stored as (x → y) and the lookup is
    a plain equi join.

    When the caller has already COUNTED the edges (``n_edges``), the
    join sides are hinted from that exact size (guide §3.1: hint when
    you know; a checkpointed edge list is a stats-blind LogicalRDD, so
    the planner otherwise guesses — measured at sf0.1: the same query
    flapped between a broadcast plan and a sort-merge plan that
    shuffled the 75 MB wedge-pair intermediate, run to run).  Small
    edge sets broadcast (the wedge expansion and the closing probe then
    run inside the edge scan's stage, at its full task count); big ones
    fall through to AQE's shuffle planning, where real byte sizes make
    the right call — the hint is data-derived, never a local-mode
    constant.
    """
    e1 = ori.select(
        F.col("u"), F.col("v").alias("x"), F.col("deg_v").alias("dx")
    )
    e2 = ori.select(
        F.col("u"), F.col("v").alias("y"), F.col("deg_v").alias("dy")
    )
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    closing = ori.select(F.col("u").alias("x"), F.col("v").alias("y"))
    if n_edges is not None:
        # ~24 bytes per (long, long, long/deg) row; broadcast only when
        # the measured size sits comfortably under the session's own
        # broadcast threshold, exactly like AQE would with real stats.
        try:
            thresh = int(
                ori.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold")
            )
        except Exception:  # pragma: no cover - conf may be "10MB"-style
            thresh = 10 * 1024 * 1024
        if thresh > 0 and int(n_edges) * 24 < thresh:
            e2 = F.broadcast(e2)
            closing = F.broadcast(closing)
    wedge_pairs = e1.join(e2, "u").where(x_first)
    return wedge_pairs.join(closing, ["x", "y"]).select("u", "x", "y")


def triangle_stats(edges: DataFrame) -> DataFrame:
    """One row: n_nodes, n_edges (undirected), n_wedges (open 2-paths),
    n_triangles, clustering = 3·triangles / wedges (0 when wedge-free).
    """
    und = edges.transform(undirected_edges).localCheckpoint(eager=False)
    ori = oriented_by_degree(und)

    # NOT given the local_clustering treatment (count + sized
    # repartition + broadcast hints): measured at sf0.1 on the sparse
    # mod-10 co-purchase projections this census runs on (wedge output
    # ~ edge count), spreading the cheap wedge stage costs more than it
    # saves — clustering_null_model regressed 2.8 -> 4.0 s wall / 16 ->
    # 42 task-CPU-s under the treatment.  local_clustering's graph is
    # the opposite regime (1.79M triangles from 107k edges), where the
    # same treatment wins 1.8x; the difference is per-callsite and
    # measured, not a policy.
    tri = _oriented_wedge_triangles(ori).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )

    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long").alias("n_wedges"),
    )
    return base.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.when(
            F.col("n_wedges") > 0,
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6),
        ).otherwise(F.lit(0.0)).alias("clustering"),
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """(node, deg, n_triangles, lcc) — per-vertex local clustering
    coefficient lcc = 2·tri(v) / (deg(v)·(deg(v)−1)), 0 when deg < 2.

    Reuses the degree-oriented enumeration (each triangle surfaces
    exactly once as (u, x, y)), then credits all three corners with one
    union + groupBy — per-vertex counts cost one extra combinable
    aggregate over 3·|triangles| rows, nothing quadratic."""
    und = edges.transform(undirected_edges).localCheckpoint(eager=False)
    # One cheap count: doubles as und's materialization job and hands
    # the wedge stage its row-count-derived partition count — the
    # ppjoin n_sets pattern.  The repartition sits BEFORE the
    # checkpoint so the stored blocks — and therefore the CPU-dense
    # wedge stage that scans them — carry the full parallelism, and it
    # keys on ``u`` (the wedge join key; degree-orientation bounds the
    # per-u row count at O(sqrt m), so the key cannot concentrate a
    # hub's load).  The closing side stays AQE-planned: broadcast at
    # small scale, sort-merge + skew-split at large.
    n_edges = und.count()
    ori = (
        oriented_by_degree(und)
        .repartition(wedge_partitions(und, n_edges), "u")
        .localCheckpoint(eager=False)
    )

    # The triangle list feeds all three corner credits; staged once —
    # narrow rows (3 longs, never a payload column) — so the wedge
    # enumeration runs ONCE instead of once per corner branch (the
    # un-staged union re-ran the whole two-join subtree 3x, each copy
    # squeezed into the checkpoint's 1-3 stored partitions).  One
    # explode pass replaces the 3-scan union over the checkpoint.
    tris = _oriented_wedge_triangles(ori, n_edges=n_edges).localCheckpoint(
        eager=False
    )
    corners = (
        tris.select(
            F.explode(F.array("u", "x", "y")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return deg.join(corners, "node", "left").select(
        "node",
        "deg",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                2.0 * F.coalesce("n_triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("lcc"),
    )
