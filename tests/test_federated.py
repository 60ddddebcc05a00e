"""End-to-end federated rounds + kernels on a tiny 2-partition graph."""

import numpy as np
import pytest

from federated_gcn_spark.ml import GraphSAGELinkModel, LinearModel, federated_fit
from federated_gcn_spark.ml.federated import gen_embeddings


def _toy_partitioned(spark, n_per=12, f=6, parts=2, seed=1):
    rng = np.random.default_rng(seed)
    nodes, edges = [], []
    for p in range(parts):
        ids = [p * 1000 + i for i in range(n_per)]
        for i in ids:
            nodes.append((i, [float(x) for x in rng.integers(0, 2, f)], p))
        for i in range(n_per):  # ring + chords: connected per partition
            edges.append((ids[i], ids[(i + 1) % n_per], p))
            if i % 3 == 0:
                edges.append((ids[i], ids[(i + 5) % n_per], p))
    nodes_df = spark.createDataFrame(
        nodes, "id long, features array<double>, partition_id long"
    )
    edges_df = spark.createDataFrame(edges, "src long, dst long, partition_id long")
    return nodes_df, edges_df


def test_negative_sampling_terminates_on_dense_graphs():
    # a complete local subgraph has zero non-edges; the rejection loop must
    # cap and proceed with fewer negatives instead of spinning forever
    from federated_gcn_spark.ml.federated import _sample_negatives

    rng = np.random.default_rng(0)
    triangle = {(0, 1), (1, 2), (0, 2)}
    neg_u, neg_v = _sample_negatives(rng, 3, 3, triangle)
    assert neg_u == [] and neg_v == []

    # 2-node partition with its one edge: also zero non-edges
    neg_u, neg_v = _sample_negatives(np.random.default_rng(0), 1, 2, {(0, 1)})
    assert neg_u == []

    # sparse graph: full quota, all genuine non-edges, deterministic
    rng = np.random.default_rng(7)
    neg_u, neg_v = _sample_negatives(rng, 5, 50, {(0, 1)})
    assert len(neg_u) == 5
    assert all(
        (u, v) not in {(0, 1), (1, 0)} and u != v for u, v in zip(neg_u, neg_v)
    )
    rng2 = np.random.default_rng(7)
    assert _sample_negatives(rng2, 5, 50, {(0, 1)}) == (neg_u, neg_v)


def test_kernel_fit_decreases_loss():
    rng = np.random.default_rng(0)
    n, f = 30, 8
    x = rng.normal(size=(n, f))
    src = np.arange(n); dst = (np.arange(n) + 1) % n
    pu = np.concatenate([src, rng.integers(0, n, n)])
    pv = np.concatenate([dst, rng.integers(0, n, n)])
    y = np.concatenate([np.ones(n), np.zeros(n)])
    m = GraphSAGELinkModel(f, (8, 8), lr=0.05, seed=0)
    hist = m.fit(x, src, dst, pu, pv, y, epochs=30)
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_kernel_determinism():
    m1 = GraphSAGELinkModel(5, (4, 4), seed=3)
    m2 = GraphSAGELinkModel(5, (4, 4), seed=3)
    for a, b in zip(m1.get_weights(), m2.get_weights()):
        np.testing.assert_array_equal(a, b)


def test_linear_model_learns():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 10))
    true_w = rng.normal(size=10)
    y = x @ true_w + 0.5
    m = LinearModel(10, lr=0.1, seed=0)
    hist = m.fit(x, y, epochs=200)
    assert hist[-1]["loss"] < 0.05 * hist[0]["loss"]


@pytest.fixture(scope="module")
def fl_result(spark):
    nodes, edges = _toy_partitioned(spark)
    weights, history = federated_fit(
        spark, nodes, edges, rounds=2, epochs=2, layer_sizes=(4, 4), seed=42
    )
    return nodes, edges, weights, history


def test_federated_fit_runs_rounds(fl_result):
    _, _, weights, history = fl_result
    assert len(history) == 2
    assert len(weights) == 6  # 2 layers × (W_self, W_neigh, b)
    assert all(np.isfinite(w).all() for w in weights)


def test_federated_fit_deterministic(spark, fl_result):
    nodes, edges, weights, _ = fl_result
    w2, _ = federated_fit(
        spark, nodes, edges, rounds=2, epochs=2, layer_sizes=(4, 4), seed=42
    )
    for a, b in zip(weights, w2):
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_gen_embeddings(spark, fl_result):
    nodes, edges, weights, _ = fl_result
    emb = gen_embeddings(spark, nodes, edges, weights, layer_sizes=(4, 4))
    rows = emb.collect()
    assert len(rows) == nodes.count()
    norms = [np.linalg.norm(r["embedding"]) for r in rows]
    assert all(abs(n - 1.0) < 1e-9 or n == 0.0 for n in norms)  # L2-normalized


def test_federated_fit_on_testdata_graph(spark, tmp_path):
    """End-to-end FL on a testdata-derived graph: embeddings become node
    features, a deterministic ring of edges spans 2 partitions, 2 rounds
    train + the versioned weight sink is written and readable."""
    from pyspark.sql import functions as F

    from federated_gcn_spark.ml.federated import federated_fit
    from federated_gcn_spark.sources.weights import read_weights_table

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    nodes = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("features"),
        (F.col("vec_id") % 2).cast("int").alias("partition_id"),
    )
    # dst = src + 2 (mod even n) keeps both endpoints in the same parity
    # partition — a clean 2-way vertex partition with no cut edges
    edges = emb.select(
        F.col("vec_id").alias("src"),
        ((F.col("vec_id") + 2) % (n - n % 2)).alias("dst"),
        (F.col("vec_id") % 2).cast("int").alias("partition_id"),
    ).where(F.col("src") != F.col("dst"))
    sink = str(tmp_path / "weights")
    weights, history = federated_fit(
        spark, nodes, edges, rounds=2, epochs=1, layer_sizes=(8, 8), seed=42,
        weights_sink=sink,
    )
    assert len(history) == 2
    assert all(h["weight_norm"] > 0 for h in history)
    # sink holds the latest round's full tensor set, layer shapes intact
    restored, _ = read_weights_table(spark, sink)
    assert [w.shape for w in restored] == [w.shape for w in weights]
