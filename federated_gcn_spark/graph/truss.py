"""k-truss decomposition: iterative triangle-support peeling.

The k-truss of a graph is the maximal subgraph in which every edge
participates in at least ``k - 2`` triangles — the standard
cohesive-subgraph refinement one notch above k-core (every k-truss is
inside the (k-1)-core, but the converse fails: a star survives coring
and dies instantly under trussing). Extends the graph-health plane
(graph/kcore.py h-index fixpoint, graph/triangles.py clustering) that
fronts GNN training data checks (reference's graph preconditions,
models/unsupervised.py:49-56 neighborhood assumptions).

Algorithm (Cohen 2008, "Trusses: cohesive subgraphs for social network
analysis"; distributed form as in Shao et al. / graph-frames practice):

    repeat:  support(e) = #triangles containing e   (over CURRENT edges)
             drop every e with support < k - 2
    until no edge is dropped.

Scale shape per round: triangle enumeration reuses the degree-oriented
wedge join from graph/triangles.py — max oriented out-degree O(sqrt m),
so a hub cannot explode the wedge pair count; support aggregation is
one groupBy over 3 rows per triangle; the peel is a left join + filter.
Everything is equi-join/aggregate — shuffle-partitioned and
AQE-skew-splittable, nothing driver-side except the per-round count.
Each round's survivor set is localCheckpoint'ed: the iteration REPLACES
the edge set, so carrying lineage would re-enumerate every prior
round's triangles (the components/split lesson).

``ktruss_trace`` runs a FIXED number of rounds (filling the tail once
converged — peeling a fixpoint is the identity, so the fill is exact,
not an approximation) to stay replayable by an unrolled SQL oracle;
``k_truss`` is the early-exit twin returning the final edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.graph.triangles import (
    _oriented_wedge_triangles,
    oriented_by_degree,
    undirected_edges,
)


def edge_support(und: DataFrame) -> DataFrame:
    """Per-edge triangle count over a canonical (a < b) edge set.

    Edges in no triangle are absent from the output (support 0).
    """
    tri = _oriented_wedge_triangles(oriented_by_degree(und))
    corners = (
        tri.select(F.col("u").alias("p"), F.col("x").alias("q"))
        .unionAll(tri.select(F.col("u").alias("p"), F.col("y").alias("q")))
        .unionAll(tri.select(F.col("x").alias("p"), F.col("y").alias("q")))
    )
    return (
        corners.select(
            F.least("p", "q").alias("a"), F.greatest("p", "q").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def _peel_once(cur: DataFrame, k: int) -> DataFrame:
    supp = edge_support(cur)
    return (
        cur.join(supp, ["a", "b"], "left")
        .where(F.coalesce("support", F.lit(0)) >= k - 2)
        .select("a", "b")
    )


def k_truss(edges: DataFrame, k: int, max_rounds: int = 50) -> DataFrame:
    """Early-exit k-truss: canonical (a, b) edges of the k-truss subgraph."""
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    cur = undirected_edges(edges).localCheckpoint()
    n = cur.count()
    for _ in range(max_rounds):
        nxt = _peel_once(cur, k).localCheckpoint()
        m = nxt.count()
        cur = nxt
        if m == n:
            break
        n = m
    return cur


def ktruss_trace(
    spark: SparkSession, edges: DataFrame, k: int, rounds: int
) -> DataFrame:
    """Fixed-round peel trace: (round, n_edges) for rounds 0..rounds.

    Once a round drops nothing the remaining rows are filled with the
    fixpoint size instead of re-enumerating triangles — identical output
    (peel of a fixpoint is itself), no wasted jobs.
    """
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    cur = undirected_edges(edges).localCheckpoint()
    counts = [cur.count()]
    converged = False
    for _ in range(rounds):
        if converged:
            counts.append(counts[-1])
            continue
        nxt = _peel_once(cur, k).localCheckpoint()
        n = nxt.count()
        if n == counts[-1]:
            converged = True
        cur = nxt
        counts.append(n)
    return spark.createDataFrame(
        [(i, int(c)) for i, c in enumerate(counts)],
        "round int, n_edges bigint",
    )
