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


def _link_fixture(seed=0, n=30, f=8):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, f))
    src = np.arange(n); dst = (np.arange(n) + 1) % n
    pu = np.concatenate([src, rng.integers(0, n, n)])
    pv = np.concatenate([dst, rng.integers(0, n, n)])
    y = np.concatenate([np.ones(n), np.zeros(n)])
    return x, src, dst, pu, pv, y


def test_adam_beats_sgd_at_equal_epochs():
    # models/supervised.py:100-104 trains with Adam(lr=1e-2); at that lr
    # plain SGD barely moves in 40 epochs while Adam's per-parameter step
    # normalization makes real progress — the reason the reference's
    # convergence behavior needs Adam, not just any optimizer
    x, src, dst, pu, pv, y = _link_fixture()
    kw = dict(layer_sizes=(8, 8), lr=1e-2, seed=0, dropout=0.0)
    sgd = GraphSAGELinkModel(8, optimizer="sgd", **kw)
    adam = GraphSAGELinkModel(8, optimizer="adam", **kw)
    h_sgd = sgd.fit(x, src, dst, pu, pv, y, epochs=40)
    h_adam = adam.fit(x, src, dst, pu, pv, y, epochs=40)
    assert h_adam[-1]["loss"] < h_sgd[-1]["loss"]
    assert h_adam[-1]["loss"] < h_adam[0]["loss"]


def test_dropout_is_seeded_deterministic_and_off_at_inference():
    x, src, dst, pu, pv, y = _link_fixture()
    m1 = GraphSAGELinkModel(8, (8, 8), seed=5, dropout=0.3)
    m2 = GraphSAGELinkModel(8, (8, 8), seed=5, dropout=0.3)
    m1.fit(x, src, dst, pu, pv, y, epochs=5)
    m2.fit(x, src, dst, pu, pv, y, epochs=5)
    for a, b in zip(m1.get_weights(), m2.get_weights()):
        np.testing.assert_array_equal(a, b)
    # inference applies no masks: embed twice → identical
    np.testing.assert_array_equal(m1.embed(x, src, dst), m1.embed(x, src, dst))


def test_minibatch_fit_decreases_loss_and_steps_per_batch():
    # batch_size=20 mirrors GraphSAGELinkGenerator(batch_size=20)
    # (models/supervised.py:79-81): 60 pairs → 3 optimizer steps per epoch
    x, src, dst, pu, pv, y = _link_fixture()
    m = GraphSAGELinkModel(8, (8, 8), lr=1e-2, seed=0, dropout=0.1)
    hist = m.fit(x, src, dst, pu, pv, y, epochs=20, batch_size=20)
    assert m._adam_t == 20 * 3  # one Adam step per minibatch
    assert hist[-1]["loss"] < hist[0]["loss"]


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


def test_federated_fit_round_walltime_telemetry(fl_result):
    """Every history row logs its round walltime (fl_server.py:225-231's
    elapsed-seconds line) and a cumulative clock that is strictly
    monotone across rounds."""
    _, _, _, history = fl_result
    for entry in history:
        assert entry["round_wall_s"] > 0.0
        assert entry["elapsed_s"] >= entry["round_wall_s"]
    elapsed = [e["elapsed_s"] for e in history]
    assert elapsed == sorted(elapsed)
    assert all(b > a for a, b in zip(elapsed, elapsed[1:]))


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


def test_fanout_sample_respects_partitions_and_shape(spark):
    from pyspark.sql import functions as F

    from federated_gcn_spark.graph.graph import Graph
    from federated_gcn_spark.graph.sampling import fanout_sample

    nodes, edges = _toy_partitioned(spark, n_per=12, parts=2)
    g = Graph(nodes.select("id", "partition_id"), edges)
    samp = fanout_sample(
        g, roots=nodes.select("id", "partition_id"), fanouts=[3, 2],
        seed=7, group_col="partition_id",
    )
    rows = samp.collect()
    # configured fanout shape: ≤3 hop-1 children per root, ≤2 per hop-1 parent
    per_parent = (
        samp.where(F.col("hop") == 1).groupBy("root").count().agg(F.max("count")).first()[0]
    )
    assert per_parent <= 3
    per_parent2 = (
        samp.where(F.col("hop") == 2)
        .groupBy("root", "parent").count().agg(F.max("count")).first()[0]
    )
    assert per_parent2 <= 2
    # group_col: a sampled vertex never leaves its partition (partition id
    # encodes as id // 1000 in the fixture)
    assert all(r["vertex"] // 1000 == r["partition_id"] for r in rows)
    # deterministic under seed
    again = fanout_sample(
        g, roots=nodes.select("id", "partition_id"), fanouts=[3, 2],
        seed=7, group_col="partition_id",
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_federated_fit_fanout_minibatch_with_eval_metrics(spark):
    # the reference training path: batch 20, fanout-sampled neighborhoods,
    # Adam + dropout, per-round held-out metrics (fl_client.py:139-160)
    nodes, edges = _toy_partitioned(spark, n_per=16, parts=2, seed=3)
    kw = dict(
        rounds=2, epochs=2, layer_sizes=(4, 4), seed=42,
        batch_size=10, fanouts=[3, 2], eval_fraction=0.25,
    )
    weights, history = federated_fit(spark, nodes, edges, **kw)
    assert len(history) == 2
    for h in history:
        for k in ("loss", "acc", "precision", "recall", "f1", "auc"):
            assert k in h, f"missing metric {k}"
        assert np.isfinite(h["loss"]) and 0.0 <= h["acc"] <= 1.0
        assert h["auc"] is None or 0.0 <= h["auc"] <= 1.0
    # deterministic under seed: same weights and same metric trajectory
    w2, h2 = federated_fit(spark, nodes, edges, **kw)
    for a, b in zip(weights, w2):
        np.testing.assert_allclose(a, b, rtol=1e-12)
    # eval loss is a Spark float aggregate: summation order varies with
    # task scheduling, so runs agree to ~ULP, not bit-for-bit
    np.testing.assert_allclose(
        [h["loss"] for h in history], [h["loss"] for h in h2], rtol=1e-12
    )


def test_eval_metrics_pinned_against_numpy(spark):
    # pin _eval_metrics' six outputs against a straight numpy evaluation
    # of the same pairs with the same weights
    from federated_gcn_spark.ml.federated import _eval_metrics

    nodes, edges = _toy_partitioned(spark, n_per=10, parts=1, seed=9)
    model = GraphSAGELinkModel(6, (4, 4), seed=11, dropout=0.0)
    weights = model.get_weights()

    node_rows = sorted(nodes.collect(), key=lambda r: r["id"])
    ids = [r["id"] for r in node_rows]
    idx = {v: i for i, v in enumerate(ids)}
    x = np.array([r["features"] for r in node_rows])
    e = edges.collect()
    src = np.array([idx[r["src"]] for r in e]); dst = np.array([idx[r["dst"]] for r in e])
    h = model.embed(x, src, dst)

    pairs = [(ids[0], ids[3], 1.0), (ids[1], ids[2], 1.0), (ids[4], ids[9], 0.0),
             (ids[5], ids[8], 0.0), (ids[6], ids[7], 1.0)]
    eval_pairs = spark.createDataFrame(
        [(0, u, v, l) for u, v, l in pairs],
        "partition_id long, u long, v long, label double",
    )
    got = _eval_metrics(spark, nodes, edges, eval_pairs, weights, (4, 4), seed=11)

    s = 1.0 / (1.0 + np.exp(-np.array(
        [h[idx[u]] @ h[idx[v]] for u, v, _ in pairs]
    )))
    y = np.array([l for _, _, l in pairs])
    eps = 1e-12
    exp_loss = float(-np.mean(y * np.log(s + eps) + (1 - y) * np.log(1 - s + eps)))
    pred = s > 0.5
    exp_acc = float(np.mean(pred == (y > 0.5)))
    tp = int(np.sum(pred & (y > 0.5))); fp = int(np.sum(pred & (y <= 0.5)))
    fn = int(np.sum(~pred & (y > 0.5)))
    exp_prec = tp / (tp + fp) if tp + fp else None
    exp_rec = tp / (tp + fn) if tp + fn else None
    # Mann-Whitney AUC with average-rank ties
    pos_s, neg_s = s[y > 0.5], s[y <= 0.5]
    u_stat = sum((p > q) + 0.5 * (p == q) for p in pos_s for q in neg_s)
    exp_auc = u_stat / (len(pos_s) * len(neg_s))
    np.testing.assert_allclose(got["loss"], exp_loss, rtol=1e-9)
    np.testing.assert_allclose(got["acc"], exp_acc, rtol=1e-9)
    if exp_prec is not None:
        np.testing.assert_allclose(got["precision"], exp_prec, rtol=1e-9)
        np.testing.assert_allclose(got["recall"], exp_rec, rtol=1e-9)
        f1 = 2 * exp_prec * exp_rec / (exp_prec + exp_rec)
        np.testing.assert_allclose(got["f1"], f1, rtol=1e-9)
    np.testing.assert_allclose(got["auc"], exp_auc, atol=1e-5)


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


def test_scheduled_waves_bit_identical_to_unscheduled(spark):
    """mem_budget_gb (fl_client_shed analog): wave-by-wave execution must
    change only the scheduling, never the result — FedAvg pools all
    partitions at round end either way (fl_server_shed.py:61-93)."""
    from federated_gcn_spark.operators.schedule import (
        partition_stats,
        plan_training_waves,
    )

    nodes, edges = _toy_partitioned(spark, n_per=10, parts=3, seed=1)
    kw = dict(rounds=2, epochs=1, layer_sizes=(4, 4), seed=42)
    w_plain, _ = federated_fit(spark, nodes, edges, **kw)
    # cost ≈ 2.0 GB per toy partition; budget 2.1 forces multiple waves
    stats = partition_stats(
        nodes.select("partition_id"), edges.select("partition_id"), feature_dim=6
    )
    waves = {r["wave"] for r in plan_training_waves(stats, 2.1).collect()}
    assert len(waves) > 1  # the schedule genuinely splits
    w_sched, hist = federated_fit(spark, nodes, edges, mem_budget_gb=2.1, **kw)
    assert len(hist) == 2
    for a, b in zip(w_plain, w_sched):
        np.testing.assert_array_equal(a, b)


def test_federated_fit_resume_bit_identical(spark, fl_result):
    """fit(2 rounds) == fit(1) then resume(1) from its weights — the
    round-numbered seed stream continues, so checkpoint/restart of a
    long training job is loss-free."""
    nodes, edges, weights_full, _ = fl_result
    w1, h1 = federated_fit(
        spark, nodes, edges, rounds=1, epochs=2, layer_sizes=(4, 4), seed=42,
        fanouts=[3, 2],
    )
    w_resumed, h2 = federated_fit(
        spark, nodes, edges, rounds=1, epochs=2, layer_sizes=(4, 4), seed=42,
        fanouts=[3, 2], initial_weights=w1, start_round=1,
    )
    w_straight, _ = federated_fit(
        spark, nodes, edges, rounds=2, epochs=2, layer_sizes=(4, 4), seed=42,
        fanouts=[3, 2],
    )
    assert h2[0]["round"] == 1
    for a, b in zip(w_resumed, w_straight):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_set_weights_does_not_alias_caller_arrays():
    """fit()'s in-place updates must never write through to the arrays
    passed into set_weights — inside applyInPandas those are the
    worker-cached BROADCAST value, and with spark.python.worker.reuse a
    mutation leaks poisoned global weights into whichever kernel call
    lands on the same worker next (a scheduling accident)."""
    import numpy as np

    from federated_gcn_spark.ml.kernels import GraphSAGELinkModel, LinearModel

    model = GraphSAGELinkModel(4, (3, 3), seed=7)
    shared = model.get_weights()
    snapshot = [w.copy() for w in shared]
    m2 = GraphSAGELinkModel(4, (3, 3), seed=7)
    m2.set_weights(shared)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 4))
    src = np.array([0, 1, 2]); dst = np.array([1, 2, 3])
    m2.fit(x, src, dst, src, dst, np.ones(3), epochs=2)
    for a, b in zip(shared, snapshot):
        np.testing.assert_array_equal(a, b)

    lin = LinearModel(3, seed=7)
    shared = lin.get_weights()
    snapshot = [w.copy() for w in shared]
    l2 = LinearModel(3, seed=7)
    l2.set_weights(shared)
    l2.fit(rng.normal(size=(8, 3)), rng.normal(size=8), epochs=2)
    for a, b in zip(shared, snapshot):
        np.testing.assert_array_equal(a, b)
