"""Round-4 wave-26 graph queries vs independent python references:
integer power iteration, Luby coloring properness, butterfly census,
clustering null model."""

from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _edges(mod):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % {mod} = 0"""
    ).fetchall()
    con.close()
    return rows


def test_eigenvector_matches_integer_power_iteration(spark):
    ed = _edges(10)
    adj = defaultdict(set)
    for o, s in ed:
        adj[o].add(s)
        adj[s].add(o)
    x = {v: 1 for v in adj}
    prev = x
    for _ in range(6):
        prev = x
        x = {v: sum(x[u] for u in adj[v]) for v in adj}
    mx = max(x.values())
    lam = sum(prev[v] * x[v] for v in adj) / sum(prev[v] ** 2 for v in adj)
    expect = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = QUERIES["eigenvector_centrality"](spark, SF_DIR).collect()
    assert [(r["id"], r["walks"]) for r in got] == [
        (v, float(c)) for v, c in expect
    ]
    for r in got:
        assert r["score"] == pytest.approx(x[r["id"]] / mx, abs=1e-8)
        assert r["rayleigh_lambda"] == pytest.approx(lam, abs=1e-5)


def test_coloring_is_proper_and_total(spark):
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.coloring import luby_coloring

    edges = spark.createDataFrame(
        [(o, s) for o, s in _edges(50)], "src long, dst long"
    )
    colored = luby_coloring(
        Graph.from_edges(edges), n_colors=4, rounds_per_color=5, seed=42
    ).collect()
    color = {r["id"]: r["color"] for r in colored}
    verts = set()
    for o, s in _edges(50):
        verts.add(o)
        verts.add(s)
    assert set(color) == verts          # every vertex gets exactly one row
    assert all(c >= 0 for c in color.values())  # budget sufficed
    for o, s in _edges(50):
        assert color[o] != color[s], f"monochrome edge {o}-{s}"
    # query output = histogram of the same assignment
    got = {
        r["color"]: r["n_vertices"]
        for r in QUERIES["greedy_coloring_stats"](spark, SF_DIR).collect()
    }
    hist = defaultdict(int)
    for c in color.values():
        hist[c] += 1
    assert got == dict(hist)


def test_coloring_early_exit_skips_converged_layers(spark):
    """Two disjoint edges: layer 0 colors one endpoint per edge, layer 1
    colors the remaining two, layers 2-3 are skipped by the round-7
    early exit — output must be identical to the fixed unroll (a proper
    2-coloring, nothing uncolored, nothing double-colored)."""
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.coloring import luby_coloring

    edges = spark.createDataFrame(
        [(1, 2), (3, 4)], "src long, dst long"
    )
    colored = luby_coloring(
        Graph.from_edges(edges), n_colors=4, rounds_per_color=5, seed=42
    ).collect()
    color = {r["id"]: r["color"] for r in colored}
    assert len(colored) == 4 and set(color) == {1, 2, 3, 4}
    assert set(color.values()) == {0, 1}  # exactly two layers used
    assert color[1] != color[2] and color[3] != color[4]


def test_coloring_degenerate_budgets(spark):
    """n_colors=0 / rounds_per_color=0 return everything uncolored (-1)
    instead of raising (round-5 ADVICE regression guard)."""
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.coloring import luby_coloring

    edges = spark.createDataFrame(
        [(o, s) for o, s in _edges(10)], "src long, dst long"
    )
    g = Graph.from_edges(edges)
    verts = {v for e in _edges(10) for v in e}
    for kwargs in ({"n_colors": 0}, {"rounds_per_color": 0}):
        colored = luby_coloring(g, seed=42, **kwargs).collect()
        assert {r["id"] for r in colored} == verts
        assert all(r["color"] == -1 for r in colored)


def test_butterfly_count_matches_bruteforce(spark):
    ed = _edges(10)
    by_order = defaultdict(set)
    for o, s in ed:
        by_order[o].add(s)
    pair_m = defaultdict(int)
    for o, ss in by_order.items():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pair_m[(ss[i], ss[j])] += 1
    r = QUERIES["butterfly_count"](spark, SF_DIR).collect()[0]
    assert r["n_edges"] == len(ed)
    assert r["n_wedges"] == sum(
        len(ss) * (len(ss) - 1) // 2 for ss in by_order.values()
    )
    assert r["n_copairs"] == len(pair_m)
    assert r["n_butterflies"] == sum(m * (m - 1) // 2 for m in pair_m.values())


def test_clustering_null_model_matches_python(spark):
    ed = _edges(10)
    by_order = defaultdict(set)
    for o, s in ed:
        by_order[o].add(s)
    und = set()
    for ss in by_order.values():
        ss = sorted(ss)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                und.add((ss[i], ss[j]))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if b < c
    )
    n = len(adj)
    degs = [len(v) for v in adj.values()]
    wedges = sum(d * (d - 1) // 2 for d in degs)
    k1 = sum(degs) / n
    k2 = sum(d * d for d in degs) / n
    c_act = 3 * tri / wedges
    c_null = (k2 - k1) ** 2 / (n * k1**3)
    r = QUERIES["clustering_null_model"](spark, SF_DIR).collect()[0]
    assert r["n_nodes"] == n
    assert r["n_edges"] == len(und)
    assert r["n_triangles"] == tri
    assert r["c_actual"] == pytest.approx(c_act, abs=1e-5)
    assert r["c_null"] == pytest.approx(c_null, abs=1e-5)
    assert r["clustering_ratio"] == pytest.approx(c_act / c_null, abs=1e-3)
