"""Federated training rounds as a driver-side loop over Spark jobs.

The reference's architecture — a TCP server holding GLOBAL_WEIGHTS, N
client processes training locally and pushing weight lists, a count
barrier, weighted FedAvg, re-broadcast (fl_server.py:60-102,
fl_client.py:119-175) — maps onto Spark primitives 1:1
(SURVEY.md §2.8, §2.9):

  client process        → one group of a cogrouped applyInPandas
                          (nodes ⋈ edges per partition_id) — G7
  pull global weights   → sc.broadcast of the weight list — G8
  push weights + count  → the returned parameter-table rows
  count barrier (A4)    → the stage boundary (a Spark stage IS a barrier)
  weighted FedAvg (A1)  → operators.fedavg on the parameter table
  rounds / STOP_FLAG    → ``for round_no in range(rounds)``
  versioned .npy sink   → optional parquet write partitioned by round

The scheduled variant (fl_client_shed.py: one client trains k partitions
serially to bound memory) is what Spark's scheduler does natively: P
partition-groups queued over K executor slots.

Scale: features never leave their executor — only weight tensors move
(the reference's communication-minimization rationale, README.md:4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.ml.kernels import GraphSAGELinkModel
from federated_gcn_spark.operators.fedavg import fedavg, rows_to_weights

PARAM_SCHEMA = (
    "partition_id long, layer int, shape array<int>, "
    "values array<double>, num_examples long"
)


def _sample_negatives(rng, target: int, n: int, pos: set) -> tuple[list, list]:
    """Seeded rejection-sample up to ``target`` non-edges over n nodes.

    Bounded: a dense local subgraph (e.g. a triangle, or a 2-node partition
    with its one edge) has few or zero non-edges, so an uncapped loop would
    spin forever. Cap the target at the number of ordered non-edges actually
    available and the draws at 20x the target; proceed with fewer negatives
    when the space is exhausted (|neg| <= |pos| instead of strictly ==).
    """
    # ordered pairs (u,v), u != v, minus edges counted in both orientations
    available = n * (n - 1) - len(pos | {(v, u) for (u, v) in pos})
    target = min(target, max(available, 0))
    neg_u, neg_v = [], []
    attempts = 0
    max_attempts = 20 * max(target, 1)
    seen = set()
    while len(neg_u) < target and attempts < max_attempts:
        attempts += 1
        u = int(rng.integers(0, n)); v = int(rng.integers(0, n))
        if u != v and (u, v) not in pos and (v, u) not in pos and (u, v) not in seen:
            seen.add((u, v))
            neg_u.append(u); neg_v.append(v)
    return neg_u, neg_v


def _make_train_fn(weights_bc, layer_sizes, lr, epochs, seed, feature_dim,
                   variant: str = "supervised"):
    """Build the per-partition trainer (runs inside applyInPandas).

    variant="supervised":   positives = the partition's edges
                            (fl_client.py link prediction)
    variant="unsupervised": positives = random-walk co-occurrence pairs
                            (fl_client_unsupervised.py via
                            UnsupervisedSampler, models/unsupervised.py:54-56)
    """

    def train(key, nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        (partition_id,) = key
        ids = nodes_pdf["id"].to_numpy()
        idx = {v: i for i, v in enumerate(ids)}
        x = np.stack(nodes_pdf["features"].to_numpy()).astype("float64")
        # drop edges whose endpoints are outside this partition's node set
        # (the J1 integrity join, local edition)
        e = edges_pdf[edges_pdf["src"].isin(idx) & edges_pdf["dst"].isin(idx)]
        src = e["src"].map(idx).to_numpy(dtype="int64")
        dst = e["dst"].map(idx).to_numpy(dtype="int64")

        model = GraphSAGELinkModel(feature_dim, layer_sizes, lr=lr,
                                   seed=seed + int(partition_id))
        model.set_weights(weights_bc.value)

        n = len(ids)
        if variant == "unsupervised":
            from federated_gcn_spark.ml.kernels import sample_walk_pairs

            pos_u, pos_v = sample_walk_pairs(
                src, dst, n, length=5, n_walks=1, window=2,
                seed=seed + int(partition_id),
            )
        else:
            pos_u, pos_v = src, dst
        # negatives: seeded random non-edges, |neg|=|pos| (G1's invariant,
        # in-kernel edition for the local train split)
        rng = np.random.default_rng(seed + int(partition_id))
        pos = set(zip(src.tolist(), dst.tolist()))
        neg_u, neg_v = _sample_negatives(rng, len(pos_u), n, pos) if n > 1 else ([], [])
        pu = np.concatenate([pos_u, np.array(neg_u, dtype="int64")])
        pv = np.concatenate([pos_v, np.array(neg_v, dtype="int64")])
        labels = np.concatenate([np.ones(len(pos_u)), np.zeros(len(neg_u))])

        model.fit(x, src, dst, pu, pv, labels, epochs=epochs)
        n_examples = int(len(labels))  # NUM_EXAMPLES (fl_client.py:77)
        rows = [
            {
                "partition_id": int(partition_id),
                "layer": i,
                "shape": list(w.shape),
                "values": w.astype("float64").ravel().tolist(),
                "num_examples": n_examples,
            }
            for i, w in enumerate(model.get_weights())
        ]
        return pd.DataFrame(rows)

    return train


def federated_fit(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    rounds: int = 3,
    epochs: int = 2,
    layer_sizes: tuple[int, int] = (10, 10),
    lr: float = 1e-2,
    seed: int = 42,
    weighted: bool = True,
    variant: str = "supervised",
    weights_sink: str | None = None,
) -> tuple[list[np.ndarray], list[dict]]:
    """Run R federated rounds; returns (global weights, round log).

    nodes: (id, features ARRAY<FLOAT/DOUBLE>, partition_id)
    edges: (src, dst, partition_id)
    ``weights_sink``: optional parquet path, partitioned by round — the
    versioned-weights sink (S7; fl_server.py:78-80) with the round number
    as the partition value instead of a filename suffix.
    """
    feature_dim = len(
        nodes.select("features").first()["features"]
    )
    global_model = GraphSAGELinkModel(feature_dim, layer_sizes, lr=lr, seed=seed)
    global_weights = global_model.get_weights()
    history: list[dict] = []

    grouped_nodes = nodes.groupBy("partition_id")
    grouped_edges = edges.groupBy("partition_id")

    for round_no in range(rounds):
        weights_bc = spark.sparkContext.broadcast(global_weights)
        params = grouped_nodes.cogroup(grouped_edges).applyInPandas(
            _make_train_fn(
                weights_bc, layer_sizes, lr, epochs, seed, feature_dim, variant
            ),
            schema=PARAM_SCHEMA,
        )
        averaged = fedavg(params, weighted=weighted)  # barrier: stage boundary
        rows = [r.asDict() for r in averaged.collect()]
        global_weights = rows_to_weights(rows)
        weights_bc.destroy()
        if weights_sink:
            # write from the collected tensors (KBs), NOT from `averaged`:
            # re-executing that plan would re-train every partition and
            # reference the now-destroyed broadcast
            spark.createDataFrame(
                rows, "layer int, shape array<int>, values array<double>"
            ).withColumn("round", F.lit(round_no)).write.mode(
                "append"
            ).partitionBy("round").parquet(weights_sink)
        history.append(
            {
                "round": round_no,
                "n_layers": len(global_weights),
                "weight_norm": float(
                    sum(float(np.linalg.norm(w)) for w in global_weights)
                ),
            }
        )
    return global_weights, history


def distributed_nograd(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    epochs: int = 2,
    layer_sizes: tuple[int, int] = (16, 16),
    lr: float = 1e-3,
    seed: int = 42,
) -> DataFrame:
    """No-communication distributed pipeline (distributed_nograd.py:19-34 +
    concat_embeddings.py): every partition trains its own unsupervised
    model independently (no FedAvg, no rounds) and emits L2-normalized
    embeddings; partitions are merged first-wins on node id downstream
    (operators.merge.concat_embeddings / dropDuplicates here, since
    partition-local ids only collide on boundary replicas).
    Returns (id, embedding, partition_id).
    """
    feature_dim = len(nodes.select("features").first()["features"])
    init = GraphSAGELinkModel(feature_dim, layer_sizes, lr=lr, seed=seed)
    weights_bc = spark.sparkContext.broadcast(init.get_weights())

    def train_and_embed(key, nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame):
        (partition_id,) = key
        ids = nodes_pdf["id"].to_numpy()
        idx = {v: i for i, v in enumerate(ids)}
        x = np.stack(nodes_pdf["features"].to_numpy()).astype("float64")
        e = edges_pdf[edges_pdf["src"].isin(idx) & edges_pdf["dst"].isin(idx)]
        src = e["src"].map(idx).to_numpy(dtype="int64")
        dst = e["dst"].map(idx).to_numpy(dtype="int64")
        from federated_gcn_spark.ml.kernels import sample_walk_pairs

        model = GraphSAGELinkModel(feature_dim, layer_sizes, lr=lr,
                                   seed=seed + int(partition_id))
        model.set_weights(weights_bc.value)
        n = len(ids)
        pos_u, pos_v = sample_walk_pairs(src, dst, n, seed=seed + int(partition_id))
        rng = np.random.default_rng(seed + int(partition_id))
        pos = set(zip(src.tolist(), dst.tolist()))
        neg_u, neg_v = _sample_negatives(rng, len(pos_u), n, pos) if n > 1 else ([], [])
        pu = np.concatenate([pos_u, np.array(neg_u, dtype="int64")])
        pv = np.concatenate([pos_v, np.array(neg_v, dtype="int64")])
        labels = np.concatenate([np.ones(len(pos_u)), np.zeros(len(neg_u))])
        model.fit(x, src, dst, pu, pv, labels, epochs=epochs)
        h = model.embed(x, src, dst)
        return pd.DataFrame(
            {
                "id": ids,
                "embedding": [row.tolist() for row in h],
                "partition_id": int(partition_id),
            }
        )

    return (
        nodes.groupBy("partition_id")
        .cogroup(edges.groupBy("partition_id"))
        .applyInPandas(
            train_and_embed,
            schema="id long, embedding array<double>, partition_id long",
        )
    )


def gen_embeddings(
    spark: SparkSession,
    nodes: DataFrame,
    edges: DataFrame,
    weights: list[np.ndarray],
    layer_sizes: tuple[int, int] = (10, 10),
    seed: int = 42,
) -> DataFrame:
    """Distributed embedding inference (G6): mapInPandas-style batch
    predict per partition with broadcast weights → (id, embedding).

    Mirrors models/unsupervised.py:105-107 / fl_client_unsupervised.py:118-122:
    per-partition L2-normalized node embeddings; merge across partitions
    with operators.merge.concat_embeddings (first-wins).
    """
    feature_dim = len(nodes.select("features").first()["features"])
    weights_bc = spark.sparkContext.broadcast([w.copy() for w in weights])

    def embed(key, nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame) -> pd.DataFrame:
        (partition_id,) = key
        ids = nodes_pdf["id"].to_numpy()
        idx = {v: i for i, v in enumerate(ids)}
        x = np.stack(nodes_pdf["features"].to_numpy()).astype("float64")
        e = edges_pdf[edges_pdf["src"].isin(idx) & edges_pdf["dst"].isin(idx)]
        src = e["src"].map(idx).to_numpy(dtype="int64")
        dst = e["dst"].map(idx).to_numpy(dtype="int64")
        model = GraphSAGELinkModel(feature_dim, layer_sizes, seed=seed)
        model.set_weights(weights_bc.value)
        h = model.embed(x, src, dst)
        return pd.DataFrame(
            {
                "id": ids,
                "embedding": [row.tolist() for row in h],
                "partition_id": int(partition_id),
            }
        )

    return (
        nodes.groupBy("partition_id")
        .cogroup(edges.groupBy("partition_id"))
        .applyInPandas(
            embed, schema="id long, embedding array<double>, partition_id long"
        )
    )
