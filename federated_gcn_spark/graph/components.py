"""Connected components via iterative min-label propagation.

Needed by the connectivity-preserving edge split (G1,
models/supervised.py:67-77 ``EdgeSplitter(..., keep_connected=True)``) —
the reference gets connectivity from StellarGraph/networkx in-memory; at
scale it has to be a distributed fixpoint.

Algorithm: every vertex starts labeled with its own id; each superstep
replaces a vertex's label with min(own, neighbors') until no label
changes. Converges in O(diameter) supersteps on the symmetrized edge set.
Each superstep is one shuffle (groupBy id); lineage is cut with
localCheckpoint every few supersteps (SURVEY.md §4.2 — Catalyst has no
loop operator, the driver drives).

For 100 TB graphs the known upgrade is the large-star/small-star
algorithm (fewer supersteps on skewed graphs); min-label propagation is
kept here for determinism and simplicity, and the checkpoint cadence +
AQE handle the practical cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from federated_gcn_spark.graph.graph import DST, ID, SRC, Graph


def connected_components(graph: Graph, max_iterations: int = 50) -> DataFrame:
    """Return (id, component) where component = min vertex id reachable.

    Deterministic: the fixpoint is unique regardless of partitioning.
    """
    edges = graph.symmetrized_edges().select(SRC, DST).distinct()
    edges = edges.localCheckpoint(eager=True)
    labels = graph.vertices.select(ID, F.col(ID).alias("component"))

    for it in range(max_iterations):
        # candidate labels flowing along edges: dst receives src's label
        incoming = (
            labels.join(edges, labels[ID] == edges[SRC])
            .select(F.col(DST).alias(ID), F.col("component"))
        )
        new_labels = (
            labels.unionByName(incoming)
            .groupBy(ID)
            .agg(F.min("component").alias("component"))
        )
        # materialize each superstep: the changed-count below consumes it,
        # and the next superstep builds on it without recompute/lineage growth
        new_labels = new_labels.localCheckpoint(eager=True)

        changed = (
            labels.alias("old")
            .join(new_labels.alias("new"), ID)
            .where(F.col("old.component") != F.col("new.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def num_components(graph: Graph) -> int:
    return connected_components(graph).select("component").distinct().count()
