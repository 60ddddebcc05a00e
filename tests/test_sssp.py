"""Weighted SSSP: hand example, convergence, unreachable vertices."""

from federated_gcn_spark.graph.sssp import sssp


def test_sssp_hand_example(spark):
    # 0 -5-> 1 -1-> 2 ; 0 -3-> 2 ; 2 -2-> 3 ; isolated 4 via (4 -1-> 4)?
    edges = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 1), (0, 2, 3), (2, 3, 2), (7, 8, 1)],
        "src long, dst long, w long",
    )
    got = {r["id"]: r["dist"] for r in sssp(edges, 0, max_iters=10).collect()}
    assert got == {0: 0, 1: 5, 2: 3, 3: 5}  # 7, 8 unreachable -> absent


def test_sssp_cheaper_path_revisits_vertex(spark):
    # direct edge 0->2 costs 10, detour 0->1->2 costs 3: the relax
    # sequence must lower 2's distance after its first settlement
    edges = spark.createDataFrame(
        [(0, 2, 10), (0, 1, 1), (1, 2, 2)], "src long, dst long, w long"
    )
    got = {r["id"]: r["dist"] for r in sssp(edges, 0).collect()}
    assert got[2] == 3


def test_sssp_early_exit_matches_full_unroll(spark):
    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 2), (2, 3, 2)], "src long, dst long, w long"
    )
    a = {r["id"]: r["dist"] for r in sssp(edges, 0, max_iters=3).collect()}
    b = {r["id"]: r["dist"] for r in sssp(edges, 0, max_iters=9).collect()}
    assert a == b
