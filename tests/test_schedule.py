"""Memory-model-driven training-wave planning (operators/schedule.py)."""

import pytest

from federated_gcn_spark.operators.schedule import (
    partition_stats,
    plan_training_waves,
)


def test_partition_stats_counts_and_missing_edges(spark):
    nodes = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3)], "partition_id int, id long"
    ).select("partition_id")
    edges = spark.createDataFrame([(0,)], "partition_id int")
    out = {
        r["partition_id"]: (r["n_nodes"], r["n_edges"])
        for r in partition_stats(nodes, edges, feature_dim=4).collect()
    }
    assert out == {0: (2, 1), 1: (1, 0)}


def _stats(spark, costs_gb):
    # invert the cost model: choose n_nodes so cost ≈ target (edges=0, F=1)
    # cost = 3.6 * (n_nodes*8/2^30) + 2  →  n_nodes = (cost-2)*2^30/(3.6*8)
    rows = [
        (i, int((c - 2.0) * 2**30 / (3.6 * 8.0)), 0, 1)
        for i, c in enumerate(costs_gb)
    ]
    return spark.createDataFrame(
        rows, "partition_id int, n_nodes long, n_edges long, feature_dim int"
    )


def test_waves_pack_to_budget(spark):
    # costs ~[6,5,4,3] with budget 8: desc order → cumsum-exclusive
    # 0,6,11,15 → waves 0,0,1,1
    stats = _stats(spark, [3.0, 4.0, 5.0, 6.0])
    out = {r["partition_id"]: r["wave"] for r in plan_training_waves(stats, 8.0).collect()}
    assert out == {3: 0, 2: 0, 1: 1, 0: 1}


def test_oversized_partition_gets_own_wave(spark):
    stats = _stats(spark, [20.0, 3.0, 3.0])
    rows = plan_training_waves(stats, 8.0).collect()
    by_wave = {}
    for r in rows:
        by_wave.setdefault(r["wave"], []).append(r["partition_id"])
    # the 20 GB partition is alone in wave 0; the small ones share a later wave
    assert by_wave[0] == [0]
    assert sorted(by_wave[2]) == [1, 2]


def test_waves_deterministic_and_validates(spark):
    stats = _stats(spark, [3.0, 4.0, 5.0])
    a = sorted(map(tuple, plan_training_waves(stats, 8.0).collect()))
    b = sorted(map(tuple, plan_training_waves(stats.repartition(5), 8.0).collect()))
    assert a == b
    with pytest.raises(ValueError):
        plan_training_waves(stats, 0.0)
