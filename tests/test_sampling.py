"""Seeded random walks + fanout sampling: shape, validity, determinism."""

from federated_gcn_spark.graph import fanout_sample, uniform_random_walks
from federated_gcn_spark.graph.sampling import walk_context_pairs


def _walks_as_dict(walks):
    out = {}
    for r in walks.collect():
        out.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]
    return out


def test_walk_shape_and_validity(spark, toy_graph):
    walks = uniform_random_walks(toy_graph, length=4, number_of_walks=1, seed=7)
    by_walk = _walks_as_dict(walks)
    assert len(by_walk) == 8  # one walk per vertex
    edge_set = set()
    for r in toy_graph.symmetrized_edges().collect():
        edge_set.add((r["src"], r["dst"]))
    for steps in by_walk.values():
        assert steps[0] is not None and 0 in steps
        for s in range(1, max(steps)):
            assert (steps[s], steps[s + 1]) in edge_set  # consecutive = real edge
        # toy graph has no dead ends on the symmetrized view → full length
        assert len(steps) == 4


def test_walk_determinism_and_seed_sensitivity(spark, toy_graph):
    w1 = _walks_as_dict(uniform_random_walks(toy_graph, length=5, seed=7))
    w2 = _walks_as_dict(
        uniform_random_walks(
            toy_graph.vertices.repartition(7) and toy_graph, length=5, seed=7
        )
    )
    assert w1 == w2  # same seed ⇒ identical walks, any layout
    w3 = _walks_as_dict(uniform_random_walks(toy_graph, length=5, seed=8))
    assert w1 != w3  # different seed ⇒ (overwhelmingly) different walks


def test_walk_context_pairs(spark, toy_graph):
    walks = uniform_random_walks(toy_graph, length=3, seed=7)
    pairs = walk_context_pairs(walks, window=2)
    assert pairs.count() > 0
    assert pairs.where("target = context").count() >= 0  # may revisit: allowed


def test_fanout_sample_caps_children(spark, toy_graph):
    roots = toy_graph.vertices
    out = fanout_sample(toy_graph, roots, fanouts=[2, 1], seed=3)
    hop1 = out.where("hop = 1").groupBy("root", "parent").count().collect()
    assert all(r["count"] <= 2 for r in hop1)
    hop2 = out.where("hop = 2").groupBy("root", "parent").count().collect()
    assert all(r["count"] <= 1 for r in hop2)
    # determinism
    again = fanout_sample(toy_graph, roots, fanouts=[2, 1], seed=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
