"""Connectivity-preserving edge train/test split (G1).

Reference semantics (models/supervised.py:67-77; EdgeSplitter with
``p=0.1, method="global", keep_connected=True, seed=42``):
- remove ⌈p·E⌉ edges as positive link-prediction examples, but never
  disconnect the residual graph;
- sample an equal number of negative examples (node pairs that are NOT
  edges);
- applied twice: test split first, then train split on the residual.

Spark realization (SURVEY.md §7.3 — the hardest pure-Spark piece):
1. build a spanning forest with BFS supersteps (frontier ⋈ edges, keep
   the first tree edge reaching each new vertex — one shuffle/superstep,
   O(diameter) supersteps); tree edges are never removable, which is
   exactly the keep-connected guarantee;
2. choose positives deterministically from NON-tree edges by seeded hash
   order (partitioning-independent, unlike F.rand);
3. negatives: seeded pseudo-random pairs, left-anti joined against the
   edge set, de-duplicated, trimmed to |positives|.

At scale every step is joins + windows; nothing is collected to the
driver.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from federated_gcn_spark.graph.graph import DST, ID, SRC, Graph


class EdgeSplit(NamedTuple):
    residual: DataFrame  # edges kept (graph stays connected per component)
    positives: DataFrame  # removed edges (src, dst, label=1)
    negatives: DataFrame  # sampled non-edges (src, dst, label=0)


def take_n_smallest_by_hash(
    df: DataFrame, n: int, hash_col: str, tiebreak: tuple[str, ...]
) -> DataFrame:
    """Exactly the n rows with the smallest ``hash_col`` — without a global
    sort-limit (which single-partitions n rows through the driver).

    Distributed selection: histogram on the hash's top 16 bits (≤65,536
    buckets, a tiny groupBy collect), find the bucket holding the n-th
    order statistic on the driver, take every bucket below it wholesale
    and sort-limit only inside the boundary bucket (~|df|/65,536 rows).
    Deterministic for ties via ``tiebreak``.
    """
    if n <= 0:
        return df.limit(0)
    bucket = F.shiftright(F.col(hash_col), 48)  # signed & monotone in hash order
    counts = sorted(
        df.groupBy(bucket.alias("__b")).count().collect(), key=lambda r: r["__b"]
    )
    cum = 0
    boundary = None
    for r in counts:
        if cum + r["count"] >= n:
            boundary = r["__b"]
            break
        cum += r["count"]
    if boundary is None:
        return df  # n >= total rows
    below = df.where(bucket < boundary)
    edge_of = (
        df.where(bucket == boundary).orderBy(hash_col, *tiebreak).limit(n - cum)
    )
    return below.unionByName(edge_of)


def spanning_forest(graph: Graph, max_iterations: int = 100) -> DataFrame:
    """One BFS tree per connected component, rooted at the component's min
    vertex id. Returns tree edges as (src, dst) in the *stored* edge
    orientation (so they can be anti-joined against graph.edges).
    """
    # canonical undirected candidates, remembering stored orientation
    e = graph.edges.select(SRC, DST).where(F.col(SRC) != F.col(DST)).distinct()
    sym = e.select(SRC, DST, F.lit(False).alias("flipped")).unionByName(
        e.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.lit(True).alias("flipped")
        )
    )
    sym = sym.localCheckpoint(eager=True)

    # roots: every vertex with no smaller neighbor is a BFS root; visited
    # grows frontier-by-frontier. Simpler + deterministic: root = global
    # min id per component is unknown upfront, so instead start BFS from
    # EVERY vertex's "am I the min among my component so far" — we avoid
    # that complexity by starting from the min endpoint per *graph*:
    # any single-source BFS spans only one component, so we instead run
    # "forest BFS": initially every vertex is unvisited; a vertex becomes
    # a root if it is the minimum id within its 1-hop neighborhood that
    # is still unvisited... That iterates too. The robust determinstic
    # choice: visited := all vertices that are a local minimum vs ALL
    # neighbors (these are the per-component minima candidates; exactly
    # the component min is a local min, possibly others — extra roots
    # merely split a component's tree into a forest, which still keeps
    # every kept-vertex reachable... NOT acceptable for keep_connected.
    #
    # So: do it right — compute per-vertex component minimum by reusing
    # min-label propagation, fused into the same loop: propagate labels
    # AND record the first edge over which a vertex's label improved.
    # When labels converge, the recorded edges form a spanning forest
    # rooted at each component's min vertex.
    labels = graph.vertices.select(ID, F.col(ID).alias("component"))
    tree = None  # (child_id, src, dst) — edge that first reached child
    for _ in range(max_iterations):
        incoming = labels.join(sym, labels[ID] == sym[SRC]).select(
            F.col(DST).alias(ID),
            F.col("component"),
            F.when(F.col("flipped"), F.col(DST)).otherwise(F.col(SRC)).alias("e_src"),
            F.when(F.col("flipped"), F.col(SRC)).otherwise(F.col(DST)).alias("e_dst"),
        )
        w = Window.partitionBy(ID).orderBy("component", "e_src", "e_dst")
        best_in = (
            incoming.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        joined = labels.alias("l").join(best_in.alias("b"), ID, "left")
        improved = joined.where(
            F.col("b.component").isNotNull()
            & (F.col("b.component") < F.col("l.component"))
        )
        new_tree = improved.select(
            F.col(ID).alias("child"), F.col("e_src").alias(SRC), F.col("e_dst").alias(DST)
        )
        tree = new_tree if tree is None else (
            # a child's tree edge is replaced when its label improves again
            tree.alias("t")
            .join(new_tree.alias("n"), F.col("t.child") == F.col("n.child"), "left_anti")
            .unionByName(new_tree)
        )
        new_labels = joined.select(
            F.col(ID),
            F.when(
                F.col("b.component").isNotNull()
                & (F.col("b.component") < F.col("l.component")),
                F.col("b.component"),
            )
            .otherwise(F.col("l.component"))
            .alias("component"),
        ).localCheckpoint(eager=True)
        tree = tree.localCheckpoint(eager=True)
        n_improved = improved.limit(1).count()
        labels = new_labels
        if n_improved == 0:
            break
    if tree is None:
        return graph.edges.select(SRC, DST).limit(0)
    return tree.select(SRC, DST).distinct()


def connectivity_preserving_split(
    graph: Graph,
    p: float = 0.1,
    seed: int = 42,
    max_iterations: int = 100,
) -> EdgeSplit:
    """EdgeSplitter(p, method='global', keep_connected=True) as dataflow.

    Deterministic for a fixed seed on any partitioning. |negatives| ==
    |positives| (G1 invariant, tested in tests/test_split.py).
    """
    edges = graph.edges.select(SRC, DST).localCheckpoint(eager=True)
    n_edges = edges.count()
    n_remove = int(p * n_edges)

    tree = spanning_forest(Graph(graph.vertices, edges), max_iterations)
    removable = edges.join(tree, [SRC, DST], "left_anti")

    order = F.xxhash64(F.col(SRC), F.col(DST), F.lit(seed))
    positives = (
        take_n_smallest_by_hash(
            removable.withColumn("__h", order).localCheckpoint(eager=True),
            n_remove,
            "__h",
            (SRC, DST),
        )
        .drop("__h")
        .localCheckpoint(eager=True)
    )
    residual = edges.join(positives, [SRC, DST], "left_anti")

    # negatives: seeded pseudo-random vertex pairs that are not edges (in
    # either orientation), not self-pairs; oversample 3x then trim.
    ids = graph.vertices.select(ID)
    n_pos = positives.count()
    if n_pos == 0:
        negatives = positives.withColumn("label", F.lit(0)).limit(0)
        return EdgeSplit(residual, positives.withColumn("label", F.lit(1)), negatives)

    # deterministic candidate pairs WITHOUT a global rank (a no-partition
    # window single-threads the whole vertex set): hash vertices into
    # ~1k-vertex buckets, rank within bucket (partitioned window), then
    # pair rank i with a salted pseudo-random rank in the same bucket.
    # Bucket membership is itself hash-random, so within-bucket pairs are
    # uniform non-edges in expectation at any scale.
    n_cand_rounds = 4
    n_vertices = ids.count()
    n_buckets = max(1, n_vertices // 1024)
    ranked = (
        ids.withColumn("__b", F.pmod(F.xxhash64(F.col(ID), F.lit(seed)), F.lit(n_buckets)))
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy("__b").orderBy(F.xxhash64(F.col(ID), F.lit(seed + 17)), ID)
            )
            - 1,
        )
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("__b")))
    )
    cands = None
    for salt in range(n_cand_rounds):
        other = ranked.select(
            F.col("__b"),
            F.col(ID).alias("dst_cand"),
            F.pmod(
                F.xxhash64(F.col("__r") + F.lit(salt * 7919), F.lit(seed + salt)),
                F.col("__n"),
            ).alias("__r2"),
        )
        pair = ranked.join(
            other, (ranked["__b"] == other["__b"]) & (F.col("__r") == F.col("__r2"))
        ).select(F.col(ID).alias(SRC), F.col("dst_cand").alias(DST))
        cands = pair if cands is None else cands.unionByName(pair)
    sym_edges = edges.unionByName(
        edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    )
    negatives = take_n_smallest_by_hash(
        cands.where(F.col(SRC) != F.col(DST))
        .distinct()
        .join(sym_edges, [SRC, DST], "left_anti")
        .withColumn("__h", F.xxhash64(F.col(SRC), F.col(DST), F.lit(seed + 1)))
        .localCheckpoint(eager=True),
        n_pos,
        "__h",
        (SRC, DST),
    ).drop("__h")
    return EdgeSplit(
        residual,
        positives.withColumn("label", F.lit(1)),
        negatives.withColumn("label", F.lit(0)),
    )
