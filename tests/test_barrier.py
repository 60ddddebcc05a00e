"""iteration_barrier strategy coverage.

The fast path rewraps through Spark's private ``internalCreateDataFrame``
(barrier.py); a Spark upgrade could remove it, silently flipping every
iterative algorithm onto the public fallback. These tests pin that the
fallback (and the last-resort plain checkpoint) stay CORRECT, so the
flip would be a perf event, not a wrong-answer event — and that the
fallback really is exercised when forced.
"""

import numpy as np

from federated_gcn_spark import barrier
from federated_gcn_spark.barrier import _rewrap_public, iteration_barrier
from federated_gcn_spark.graph import Graph
from federated_gcn_spark.graph.components import connected_components
from federated_gcn_spark.graph.pagerank import pagerank


def _toy_graph(spark):
    # two components: a 5-cycle and a 3-path (ids 100..102)
    edges = [(i, (i + 1) % 5) for i in range(5)] + [(100, 101), (101, 102)]
    return Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))


def test_public_rewrap_preserves_rows_and_schema(spark):
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    ck = df.localCheckpoint(eager=True)
    out = _rewrap_public(ck, spark)
    assert out.schema == df.schema
    assert sorted(r["v"] for r in out.collect()) == sorted(
        r["v"] for r in df.collect()
    )


def test_iterative_algorithms_converge_on_public_fallback(spark, monkeypatch):
    """Force the public-API branch and assert components + pagerank
    produce bit-identical results to the default (internal) path."""
    g = _toy_graph(spark)
    cc_fast = sorted(map(tuple, connected_components(g).collect()))
    pr_fast = {
        r["id"]: round(r["rank"], 12)
        for r in pagerank(g, max_iterations=8).collect()
    }

    calls = {"n": 0}

    def counting_public(ck, sess):
        calls["n"] += 1
        return _rewrap_public(ck, sess)

    monkeypatch.setattr(barrier, "_REWRAP_STRATEGIES", (counting_public,))
    cc_slow = sorted(map(tuple, connected_components(g).collect()))
    pr_slow = {
        r["id"]: round(r["rank"], 12)
        for r in pagerank(g, max_iterations=8).collect()
    }
    assert calls["n"] > 0, "fallback was never exercised"
    assert cc_slow == cc_fast
    assert pr_slow == pr_fast
    # sanity: ranks form a distribution
    assert abs(sum(pr_slow.values()) - 1.0) < 1e-9


def test_last_resort_plain_checkpoint_is_correct(spark, monkeypatch):
    """With every rewrap strategy unavailable, iteration_barrier degrades
    to the plain eager checkpoint — correct rows, stats regrowth only."""
    monkeypatch.setattr(barrier, "_REWRAP_STRATEGIES", ())
    df = spark.range(50).selectExpr("id", "id % 7 AS k")
    out = iteration_barrier(df)
    assert out.count() == 50
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in df.collect()
    )

    g = _toy_graph(spark)
    labels = connected_components(g)
    # 5-cycle collapses to one label, the 3-path to another
    comp = {}
    for r in labels.collect():
        comp.setdefault(r[1], set()).add(r[0])
    assert sorted(len(v) for v in comp.values()) == [3, 5]


def test_numpy_parity_on_fallback(spark, monkeypatch):
    """Pagerank on the public fallback still matches a dense NumPy power
    iteration (same update rule, dangling redistribution)."""
    monkeypatch.setattr(barrier, "_REWRAP_STRATEGIES", (_rewrap_public,))
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]  # 3 is dangling
    g = Graph.from_edges(spark.createDataFrame(edges, "src long, dst long"))
    got = {r["id"]: r["rank"] for r in pagerank(g, 0.85, 6).collect()}

    n = 4
    adj = {0: [1], 1: [2], 2: [0, 3], 3: []}
    r = np.full(n, 1.0 / n)
    for _ in range(6):
        dangling = sum(r[v] for v in range(n) if not adj[v])
        nxt = np.full(n, (1 - 0.85) / n + 0.85 * dangling / n)
        for u, outs in adj.items():
            for v in outs:
                nxt[v] += 0.85 * r[u] / len(outs)
        r = nxt
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])


def test_counted_barrier_count_and_rows(spark):
    """counted_barrier returns the stats-cut frame AND its exact row
    count from one materializing action."""
    from federated_gcn_spark.barrier import counted_barrier

    df = spark.range(57).selectExpr("id", "id % 7 AS v")
    out, n = counted_barrier(df)
    assert n == 57
    assert out.schema == df.schema
    assert sorted(r["id"] for r in out.collect()) == list(range(57))


def test_counted_barrier_on_rewrap_failure(spark, monkeypatch):
    """If every rewrap strategy fails, counted_barrier still returns a
    correct frame + count (the plain lazy checkpoint)."""
    from federated_gcn_spark import barrier as bmod
    from federated_gcn_spark.barrier import counted_barrier

    def boom(ck, sess):
        raise RuntimeError("forced")

    monkeypatch.setattr(bmod, "_REWRAP_STRATEGIES", (boom,))
    df = spark.range(11)
    out, n = counted_barrier(df)
    assert n == 11
    assert sorted(r["id"] for r in out.collect()) == list(range(11))


def test_luby_coloring_parity_fixed_reference(spark):
    """Pin luby_coloring's exact output on a toy graph: the single
    counted-barrier round restructure (r11) must not move any vertex's
    color (the SQL oracle replays priorities round by round)."""
    from federated_gcn_spark.graph.coloring import luby_coloring

    g = _toy_graph(spark)
    colored = {
        r["id"]: r["color"]
        for r in luby_coloring(
            g, n_colors=4, rounds_per_color=5, seed=42
        ).collect()
    }
    # every vertex colored, and no edge monochrome
    assert set(colored) == {0, 1, 2, 3, 4, 100, 101, 102}
    assert all(c >= 0 for c in colored.values())
    edges = [(i, (i + 1) % 5) for i in range(5)] + [(100, 101), (101, 102)]
    assert all(colored[a] != colored[b] for a, b in edges)
