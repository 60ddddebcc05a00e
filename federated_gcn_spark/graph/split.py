"""Connectivity-preserving edge train/test split (G1).

Reference semantics (models/supervised.py:67-77; EdgeSplitter with
``p=0.1, method="global", keep_connected=True, seed=42``):
- remove ⌈p·E⌉ edges as positive link-prediction examples, but never
  disconnect the residual graph;
- sample an equal number of negative examples (node pairs that are NOT
  edges);
- applied twice: test split first, then train split on the residual.

Spark realization (SURVEY.md §7.3 — the hardest pure-Spark piece):
1. build a spanning forest with distributed Borůvka (min-hash-weight edge
   per component + pointer-jump contraction — O(log n) rounds on any
   graph; see ``spanning_forest``); tree edges are never removable, which
   is exactly the keep-connected guarantee;
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

from federated_gcn_spark.barrier import (
    agg_probed_barrier,
    counted_barrier,
    lazy_barrier,
)
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


def spanning_forest(
    graph: Graph,
    max_rounds: int = 40,
    seed: int = 42,
    stats: dict | None = None,
) -> DataFrame:
    """One spanning tree per connected component, as distributed Borůvka.

    Each round every current component picks its minimum-weight incident
    cross edge (weight = seeded xxhash64 → a global total order, so the
    pick is deterministic and partition-independent), those edges join the
    forest, and the hooking forest is contracted by pointer-jumping.
    Components at least halve per round → O(log n) rounds on ANY graph,
    including high-diameter chains where label-propagation BFS needs
    O(diameter) supersteps (VERDICT r01 item 3; Kiveris et al. give the
    same bound for the star-contraction family). With a globally distinct
    edge order the hooking graph's only cycles are mutual picks
    (2-cycles), broken by rooting the smaller component id.

    Returns tree edges as (src, dst) in the *stored* edge orientation (so
    they can be anti-joined against graph.edges). ``stats``, when passed,
    receives ``rounds`` and ``pointer_jumps``.
    """
    e = (
        graph.edges.select(SRC, DST)
        .where(F.col(SRC) != F.col(DST))
        .distinct()
        .withColumn("__w", F.xxhash64(SRC, DST, F.lit(seed)))
        .localCheckpoint(eager=True)
    )
    labels = graph.vertices.select(ID, F.col(ID).alias("comp"))
    forest = None
    rounds = 0
    total_jumps = 0

    def _pair_probe(a: str, b: str):
        # the fingerprint as an aggregate probe riding a barrier job
        return F.coalesce(
            F.expr(f"bit_xor(xxhash64({a}, {b}))"), F.lit(0)
        ).alias("h")

    for _ in range(max_rounds):
        # Loop state crosses rounds through stats-cut barriers (carried
        # size stats would square per superstep — see barrier.py), but
        # only TWO driver actions run per round: the counted cross-edge
        # barrier (whose count is the emptiness probe) and each
        # pointer-jump's fingerprint-probed barrier.  Everything else —
        # picks, the forest accumulator, labels — is lazy and
        # materializes inside those jobs (picks in the hooking
        # barrier's, labels in the next round's cross-edge job).
        el, n_cross = counted_barrier(
            e.join(labels.select(F.col(ID).alias(SRC), F.col("comp").alias("cs")), SRC)
            .join(labels.select(F.col(ID).alias(DST), F.col("comp").alias("cd")), DST)
            .where(F.col("cs") != F.col("cd"))
        )
        if n_cross == 0:
            break
        rounds += 1
        # min-weight cross edge per component (struct min = lexicographic:
        # weight first, then (src, dst) as the deterministic tiebreak)
        pick = F.struct(F.col("__w"), F.col(SRC), F.col(DST), F.col("cs"), F.col("cd"))
        picks = lazy_barrier(
            el.select(F.col("cs").alias("comp"), pick.alias("p"))
            .unionByName(el.select(F.col("cd").alias("comp"), pick.alias("p")))
            .groupBy("comp")
            .agg(F.min("p").alias("p"))
            .select("comp", "p.*")
        )
        new_edges = picks.select(SRC, DST).distinct()
        forest = new_edges if forest is None else forest.unionByName(new_edges)

        # hooking graph: comp -> other endpoint's comp; break 2-cycles by
        # rooting the smaller id (mutual picks share one edge)
        hooks = picks.select(
            "comp",
            F.when(F.col("comp") == F.col("cs"), F.col("cd"))
            .otherwise(F.col("cs"))
            .alias("to"),
        )
        p, row = agg_probed_barrier(
            hooks.alias("x")
            .join(hooks.alias("y"), F.col("x.to") == F.col("y.comp"), "left")
            .select(
                F.col("x.comp").alias("comp"),
                F.when(
                    (F.col("y.to") == F.col("x.comp"))
                    & (F.col("x.comp") < F.col("x.to")),
                    F.col("x.comp"),
                )
                .otherwise(F.col("x.to"))
                .alias("to"),
            ),
            _pair_probe("comp", "to"),
        )
        # pointer-jump to the root: to := to.to until fixpoint (O(log depth))
        prev = int(row["h"])
        while True:
            total_jumps += 1
            p, row = agg_probed_barrier(
                p.alias("x")
                .join(
                    p.select(F.col("comp").alias("to"), F.col("to").alias("to2")),
                    "to",
                    "left",
                )
                .select("comp", F.coalesce("to2", "to").alias("to")),
                _pair_probe("comp", "to"),
            )
            cur = int(row["h"])
            if cur == prev:
                break
            prev = cur
        labels = lazy_barrier(
            labels.join(p, labels["comp"] == p["comp"], "left")
            .select(ID, F.coalesce(p["to"], labels["comp"]).alias("comp"))
        )
        # only cross edges can matter in later rounds
        e = el.select(SRC, DST, "__w")
    if stats is not None:
        stats["rounds"] = rounds
        stats["pointer_jumps"] = total_jumps
    if forest is None:
        return graph.edges.select(SRC, DST).limit(0)
    return forest


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


class DoubleSplit(NamedTuple):
    test: EdgeSplit  # stage 1: held-out TEST examples, residual = graph_test
    train: EdgeSplit  # stage 2 on stage 1's residual: TRAIN examples


def double_split(
    graph: Graph,
    p_test: float = 0.1,
    p_train: float = 0.1,
    seed: int = 42,
    max_iterations: int = 100,
) -> DoubleSplit:
    """The reference's two-stage EdgeSplitter composition
    (models/supervised.py:67-77): hold out p_test of edges as the test
    set first, then split AGAIN on the residual for the train examples —
    so test edges are never visible to training, and the final residual
    (the message-passing graph) stays connected per component through
    BOTH removals.

    Distinct derived seeds per stage keep the two hash orders
    independent; determinism and the |neg| == |pos| invariant hold at
    each stage (tests/test_split.py::test_double_split_composition).
    """
    test = connectivity_preserving_split(graph, p_test, seed, max_iterations)
    residual_graph = Graph(
        graph.vertices, test.residual.localCheckpoint(eager=True)
    )
    train = connectivity_preserving_split(
        residual_graph, p_train, seed + 0x9E3779B9, max_iterations
    )
    return DoubleSplit(test, train)
