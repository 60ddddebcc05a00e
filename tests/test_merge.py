"""Union + keep-first dedup semantics (merge.py:38-40 parity)."""

from federated_gcn_spark.operators import (
    concat_embeddings,
    merge_partition,
    union_all,
    union_keep_first,
)


def test_keep_first_prefers_earlier_input(spark):
    local = spark.createDataFrame([(1, "local_a"), (2, "local_b")], "id long, v string")
    central = spark.createDataFrame(
        [(2, "central_b"), (3, "central_c")], "id long, v string"
    )
    out = {r["id"]: r["v"] for r in union_keep_first([local, central], ["id"]).collect()}
    assert out == {1: "local_a", 2: "local_b", 3: "central_c"}


def test_union_all_keeps_duplicates(spark):
    a = spark.createDataFrame([(1, 2)], "src long, dst long")
    b = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    assert union_all([a, b]).count() == 3


def test_merge_partition(spark):
    nodes_local = spark.createDataFrame([(1, 0.5), (2, 0.7)], "id long, f double")
    nodes_central = spark.createDataFrame([(2, 9.9), (3, 0.1)], "id long, f double")
    edges_local = spark.createDataFrame([(1, 2)], "src long, dst long")
    edges_central = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    nodes, edges = merge_partition(nodes_local, nodes_central, edges_local, edges_central)
    got = {r["id"]: r["f"] for r in nodes.collect()}
    assert got == {1: 0.5, 2: 0.7, 3: 0.1}  # local copy of id=2 wins
    assert edges.count() == 3  # bag union, duplicate (1,2) kept


def test_concat_embeddings_first_partition_wins(spark):
    p0 = spark.createDataFrame([(1, [1.0]), (2, [2.0])], "id long, embedding array<double>")
    p1 = spark.createDataFrame([(2, [9.0]), (3, [3.0])], "id long, embedding array<double>")
    out = {r["id"]: r["embedding"][0] for r in concat_embeddings([p0, p1]).collect()}
    assert out == {1: 1.0, 2: 2.0, 3: 3.0}
