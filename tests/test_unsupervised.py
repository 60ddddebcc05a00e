"""Unsupervised FL variant + the no-communication (nograd) pipeline."""

import numpy as np

from federated_gcn_spark.ml import federated_fit
from federated_gcn_spark.ml.federated import distributed_nograd
from federated_gcn_spark.ml.kernels import sample_walk_pairs
from federated_gcn_spark.operators.merge import concat_embeddings
from tests.test_federated import _toy_partitioned


def test_sample_walk_pairs_deterministic_and_valid():
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 0])
    pu, pv = sample_walk_pairs(src, dst, 4, length=4, seed=5)
    pu2, pv2 = sample_walk_pairs(src, dst, 4, length=4, seed=5)
    np.testing.assert_array_equal(pu, pu2)
    np.testing.assert_array_equal(pv, pv2)
    assert len(pu) > 0 and (pu != pv).all()
    assert pu.max() < 4 and pv.max() < 4


def test_unsupervised_federated_fit(spark):
    nodes, edges = _toy_partitioned(spark)
    weights, history = federated_fit(
        spark, nodes, edges, rounds=1, epochs=1, layer_sizes=(4, 4),
        variant="unsupervised", weighted=False, seed=42,
    )
    assert len(weights) == 6
    assert all(np.isfinite(w).all() for w in weights)


def test_distributed_nograd_pipeline(spark):
    nodes, edges = _toy_partitioned(spark)
    emb = distributed_nograd(spark, nodes, edges, epochs=1, layer_sizes=(4, 4))
    parts = [
        emb.where(emb.partition_id == p).select("id", "embedding") for p in (0, 1)
    ]
    merged = concat_embeddings(parts, id_col="id")
    assert merged.count() == nodes.count()  # disjoint ids: nothing dropped
    norms = [np.linalg.norm(r["embedding"]) for r in merged.collect()]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)
