"""Connectivity-preserving edge split (G1) invariants."""

import pytest

from federated_gcn_spark.graph import Graph, connectivity_preserving_split
from federated_gcn_spark.graph.components import num_components
from federated_gcn_spark.graph.split import spanning_forest


def test_logarithmic_rounds_on_path_graph(spark):
    # the scale argument for star-contraction + Borůvka: a 1k-vertex path
    # has diameter ~1k, so label-propagation BFS needs ~1k supersteps;
    # both new algorithms must finish in O(log n) rounds
    from federated_gcn_spark.graph.components import connected_components

    n = 1024
    vertices = spark.range(n).withColumnRenamed("id", "id")
    edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    g = Graph(vertices, edges)

    cc_stats = {}
    labels = connected_components(g, stats=cc_stats)
    assert labels.where("component != 0").count() == 0  # one component, min id 0
    assert cc_stats["iterations"] <= 15  # ~2·log2(1024), not ~1024

    sf_stats = {}
    tree = spanning_forest(g, stats=sf_stats)
    assert tree.count() == n - 1  # every path edge is a tree edge
    assert sf_stats["rounds"] <= 15


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


def test_double_split_composition(spark):
    """VERDICT r01 #9: EdgeSplitter applied twice (test, then train on the
    residual — models/supervised.py:67-77). Needs a graph with enough
    non-tree edges that BOTH stages can remove some: a 12-cycle + 6
    chords (18 edges, 12 tree ⇒ 6 removable)."""
    from federated_gcn_spark.graph import double_split

    n = 12
    edges = [(i, (i + 1) % n) for i in range(n)] + [
        (0, 4), (1, 6), (2, 8), (3, 9), (5, 10), (7, 11)
    ]
    g = Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long")
    )
    ds = double_split(g, p_test=0.15, p_train=0.15, seed=42)
    n_edges = 18
    n_test = int(0.15 * n_edges)  # 2
    assert ds.test.positives.count() == n_test
    assert ds.test.negatives.count() == n_test
    assert ds.test.residual.count() == n_edges - n_test
    n_train = int(0.15 * (n_edges - n_test))  # stage 2 sees the residual
    assert ds.train.positives.count() == n_train
    assert ds.train.negatives.count() == n_train
    assert ds.train.residual.count() == n_edges - n_test - n_train
    # test and train positives are disjoint (train drew from the residual)
    assert ds.test.positives.select("src", "dst").join(
        ds.train.positives.select("src", "dst"), ["src", "dst"]
    ).count() == 0
    # connectivity preserved through BOTH removals
    assert num_components(Graph(g.vertices, ds.train.residual)) == num_components(g) == 1
    # deterministic under seed
    again = double_split(g, p_test=0.15, p_train=0.15, seed=42)
    assert sorted(map(tuple, ds.train.positives.collect())) == sorted(
        map(tuple, again.train.positives.collect())
    )


def test_split_deterministic(spark, toy_graph, split_result):
    again = connectivity_preserving_split(toy_graph, p=0.25, seed=42)
    assert sorted(map(tuple, split_result.positives.collect())) == sorted(
        map(tuple, again.positives.collect())
    )
    assert sorted(map(tuple, split_result.negatives.collect())) == sorted(
        map(tuple, again.negatives.collect())
    )
