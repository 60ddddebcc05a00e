"""Connectivity-preserving edge split (G1) invariants."""

import pytest

from federated_gcn_spark.graph import Graph, connectivity_preserving_split
from federated_gcn_spark.graph.components import num_components
from federated_gcn_spark.graph.split import spanning_forest


def test_spanning_forest_spans(spark, toy_graph):
    tree = spanning_forest(toy_graph)
    # forest over (5-vertex comp, 3-vertex comp) → (5-1) + (3-1) = 6 edges
    assert tree.count() == 6
    residual = Graph(toy_graph.vertices, tree)
    assert num_components(residual) == 2  # tree alone keeps both components


@pytest.fixture(scope="module")
def split_result(spark, toy_graph):
    return connectivity_preserving_split(toy_graph, p=0.25, seed=42)


def test_split_partition_of_edges(spark, toy_graph, split_result):
    res = split_result
    # removed ∪ residual == original edges; disjoint
    assert res.residual.count() + res.positives.count() == toy_graph.edges.count()
    assert res.residual.join(
        res.positives.select("src", "dst"), ["src", "dst"], "inner"
    ).count() == 0


def test_split_counts_and_negatives(spark, toy_graph, split_result):
    res = split_result
    n_pos = res.positives.count()
    assert n_pos == int(0.25 * 8) == 2
    assert res.negatives.count() == n_pos  # |neg| == |pos| (G1)
    # negatives are non-edges in either orientation
    sym = toy_graph.symmetrized_edges()
    assert res.negatives.join(sym, ["src", "dst"], "inner").count() == 0


def test_split_preserves_connectivity(spark, toy_graph, split_result):
    before = num_components(toy_graph)
    after = num_components(Graph(toy_graph.vertices, split_result.residual))
    assert before == after == 2


def test_split_deterministic(spark, toy_graph, split_result):
    again = connectivity_preserving_split(toy_graph, p=0.25, seed=42)
    assert sorted(map(tuple, split_result.positives.collect())) == sorted(
        map(tuple, again.positives.collect())
    )
    assert sorted(map(tuple, split_result.negatives.collect())) == sorted(
        map(tuple, again.negatives.collect())
    )
