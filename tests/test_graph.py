"""Graph abstraction: construction join, degrees, message aggregation."""

from pyspark.sql import functions as F

from federated_gcn_spark.graph import Graph, connected_components


def test_from_edges_vertex_set(toy_graph):
    ids = {r["id"] for r in toy_graph.vertices.collect()}
    assert ids == {0, 1, 2, 3, 4, 10, 11, 12}


def test_validated_drops_dangling(spark):
    vertices = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, 2), (1, 99)], "src long, dst long")
    g = Graph(vertices, edges).validated()
    assert [(r["src"], r["dst"]) for r in g.edges.collect()] == [(1, 2)]
    dangling = Graph(vertices, edges).dangling_edges()
    assert [(r["src"], r["dst"]) for r in dangling.collect()] == [(1, 99)]


def test_degrees(toy_graph):
    deg = {r["id"]: r["degree"] for r in toy_graph.degrees().collect()}
    assert deg[1] == 3  # 0-1, 1-2, 1-3 chord
    assert deg[11] == 2
    assert deg[10] == 1


def test_aggregate_messages_mean_of_src_attr(spark):
    vertices = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "id long, f double")
    edges = spark.createDataFrame([(1, 3), (2, 3)], "src long, dst long")
    out = Graph(vertices, edges).aggregate_messages(
        msg=F.col("src_f"), agg=F.avg("_msg"), direction="dst"
    )
    assert {(r["id"], r["agg"]) for r in out.collect()} == {(3, 15.0)}


def test_connected_components(toy_graph):
    cc = {r["id"]: r["component"] for r in connected_components(toy_graph).collect()}
    assert all(cc[i] == 0 for i in range(5))
    assert all(cc[i] == 10 for i in (10, 11, 12))


def test_pagerank_matches_numpy_power_iteration(spark, toy_graph):
    import numpy as np

    from federated_gcn_spark.graph import pagerank

    got = {r["id"]: r["rank"] for r in pagerank(toy_graph, 0.85, 10).collect()}
    # dense power iteration with uniform dangling redistribution
    ids = sorted(got)
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for r in toy_graph.edges.select("src", "dst").distinct().collect():
        if r["src"] != r["dst"]:
            A[pos[r["dst"]], pos[r["src"]]] = 1.0
    out = A.sum(axis=0)
    rank = np.full(n, 1.0 / n)
    for _ in range(10):
        dangling = rank[out == 0].sum()
        spread = np.where(out > 0, rank / np.maximum(out, 1), 0.0)
        rank = (1 - 0.85) / n + 0.85 * (A @ spread + dangling / n)
    for v in ids:
        assert abs(got[v] - rank[pos[v]]) < 1e-9, (v, got[v], rank[pos[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_personalized_pagerank_matches_numpy(spark, toy_graph):
    import numpy as np

    from federated_gcn_spark.graph.pagerank import personalized_pagerank

    seeds = [1, 3]
    got = {
        r["id"]: r["rank"]
        for r in personalized_pagerank(toy_graph, seeds, 0.85, 10).collect()
    }
    ids = sorted(got)
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for r in toy_graph.edges.select("src", "dst").distinct().collect():
        if r["src"] != r["dst"]:
            A[pos[r["dst"]], pos[r["src"]]] = 1.0
    out = A.sum(axis=0)
    tele = np.zeros(n)
    for s in seeds:
        tele[pos[s]] = 1.0 / len(seeds)
    rank = tele.copy()
    for _ in range(10):
        dangling = rank[out == 0].sum()
        spread = np.where(out > 0, rank / np.maximum(out, 1), 0.0)
        rank = (1 - 0.85) * tele + 0.85 * (A @ spread + dangling * tele)
    for v in ids:
        assert abs(got[v] - rank[pos[v]]) < 1e-9, (v, got[v], rank[pos[v]])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    # proximity semantics: seeds outrank the average non-seed
    non_seed = [got[v] for v in ids if v not in seeds]
    assert min(got[s] for s in seeds) > sum(non_seed) / len(non_seed)


def test_luby_mis_independent_and_maximal(spark):
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.mis import luby_mis

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 3), (10, 11), (11, 12), (20, 20)]
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))
    mis = {r["id"] for r in luby_mis(g).collect()}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    # independence: no two members adjacent (self-loop vertex allowed)
    for v in mis:
        assert not (adj[v] & (mis - {v})), f"{v} has a neighbor in the set"
    # maximality: every non-member has a member neighbor
    for v in set(adj) - mis:
        assert adj[v] & mis, f"{v} could be added"


def test_luby_mis_layout_independent(spark):
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.mis import luby_mis

    df = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(23)], "src long, dst long"
    )
    a = {r["id"] for r in luby_mis(Graph.from_edges(df)).collect()}
    b = {r["id"] for r in luby_mis(Graph.from_edges(df.repartition(11, "dst"))).collect()}
    assert a == b
