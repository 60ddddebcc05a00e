"""Numpy training kernels — the pluggable-model contract, TF-free.

The reference's model contract (README.md:26-51) is: any object with
``initialize() → weights``, ``get_weights()``, ``set_weights()``,
``fit(epochs) → (weights, history)``, optional ``gen_embeddings()``.
Its implementation is StellarGraph+Keras (models/supervised.py:14-22);
this container has neither, and the engine treats the kernel as a
replaceable black box anyway (SURVEY.md §4.2.4: Spark supplies the
dataflow, the kernel is whatever runs per partition). So the kernels
here are small, dependency-free, *deterministic* numpy implementations:

- ``GraphSAGELinkModel``: 2-layer mean-aggregator GraphSAGE (G4) with an
  inner-product + sigmoid link head (G5), manual backprop, full-batch
  Adam-free SGD. Semantics mirror models/supervised.py:50-104 (layer
  sizes [10,10], lr 1e-2, binary-crossentropy) minus dropout (a no-op
  for parity testing) — the final L2 normalization is applied at
  embedding inference like models/unsupervised.py:64.
- ``LinearModel``: the misc/ prototype (misc/model.py, misc/client.py) —
  linear regression, MSE SGD.

Both expose weights as a list of ndarrays — exactly the unit FedAvg
averages (fl_server.py:60-74).
"""

from __future__ import annotations

import numpy as np


def _relu(x):
    return np.maximum(x, 0.0)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-np.clip(x, -35, 35)))


def _sum_neighbors(h: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Row i ← Σ h[j] over undirected neighbors j of i (A·h, A symmetric)."""
    out = np.zeros_like(h)
    np.add.at(out, dst, h[src])
    np.add.at(out, src, h[dst])
    return out


def _degrees(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    deg = np.zeros(n)
    np.add.at(deg, dst, 1.0)
    np.add.at(deg, src, 1.0)
    deg[deg == 0] = 1.0  # isolated vertices aggregate a zero vector
    return deg


def _mean_neighbors(h: np.ndarray, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Row i ← mean of h[j] over undirected neighbors j of i (G4's
    mean-aggregate): D⁻¹·A·h."""
    return _sum_neighbors(h, src, dst) / _degrees(h.shape[0], src, dst)[:, None]


class GraphSAGELinkModel:
    """2-layer GraphSAGE + inner-product link classifier.

    h^k = relu(h^{k-1} W_self + mean_N(h^{k-1}) W_neigh + b), k=1,2
    score(u,v) = sigmoid(<h²_u, h²_v>)   loss = binary cross-entropy
    """

    def __init__(self, feature_dim: int, layer_sizes=(10, 10), lr: float = 1e-2,
                 seed: int = 42):
        self.layer_sizes = tuple(layer_sizes)
        self.lr = lr
        rng = np.random.default_rng(seed)
        dims = [feature_dim, *self.layer_sizes]
        self.weights: list[np.ndarray] = []
        for d_in, d_out in zip(dims[:-1], dims[1:]):
            scale = np.sqrt(2.0 / (2 * d_in + d_out))
            self.weights += [
                rng.normal(0, scale, (d_in, d_out)),  # W_self
                rng.normal(0, scale, (d_in, d_out)),  # W_neigh
                np.zeros(d_out),                      # b
            ]

    # -- weight contract (G8; README.md:37-42) ------------------------------

    def get_weights(self) -> list[np.ndarray]:
        return [w.copy() for w in self.weights]

    def set_weights(self, weights: list[np.ndarray]) -> None:
        self.weights = [np.asarray(w, dtype="float64").reshape(old.shape)
                        for w, old in zip(weights, self.weights)]

    # -- forward / backward -------------------------------------------------

    def _forward(self, x, src, dst):
        h, cache = x, []
        for k in range(len(self.layer_sizes)):
            ws, wn, b = self.weights[3 * k:3 * k + 3]
            m = _mean_neighbors(h, src, dst)
            z = h @ ws + m @ wn + b
            h_next = _relu(z)
            cache.append((h, m, z))
            h = h_next
        return h, cache

    def fit(self, x, src, dst, pairs_u, pairs_v, labels, epochs: int = 1):
        """Full-batch SGD on link BCE; returns per-epoch (loss, acc)."""
        history = []
        for _ in range(epochs):
            h, cache = self._forward(x, src, dst)
            s = _sigmoid(np.einsum("ij,ij->i", h[pairs_u], h[pairs_v]))
            eps = 1e-12
            loss = -np.mean(labels * np.log(s + eps) + (1 - labels) * np.log(1 - s + eps))
            acc = float(np.mean((s > 0.5) == (labels > 0.5)))
            # dL/dh
            g = (s - labels)[:, None] / len(labels)
            dh = np.zeros_like(h)
            np.add.at(dh, pairs_u, g * h[pairs_v])
            np.add.at(dh, pairs_v, g * h[pairs_u])
            # backprop through layers
            grads: list[np.ndarray] = [None] * len(self.weights)
            for k in reversed(range(len(self.layer_sizes))):
                h_in, m, z = cache[k]
                ws, wn, _ = self.weights[3 * k:3 * k + 3]
                dz = dh * (z > 0)
                grads[3 * k] = h_in.T @ dz
                grads[3 * k + 1] = m.T @ dz
                grads[3 * k + 2] = dz.sum(axis=0)
                if k > 0:
                    # exact adjoint of h ↦ D⁻¹A h is g ↦ A D⁻¹ g (A
                    # symmetric): divide by OWN degree, then aggregate
                    deg = _degrees(dz.shape[0], src, dst)
                    dh = dz @ ws.T + _sum_neighbors(
                        (dz @ wn.T) / deg[:, None], src, dst
                    )
            for i, gr in enumerate(grads):
                self.weights[i] -= self.lr * gr
            history.append({"loss": float(loss), "acc": acc})
        return history

    def embed(self, x, src, dst) -> np.ndarray:
        """Node embeddings, L2-normalized (models/unsupervised.py:64)."""
        h, _ = self._forward(x, src, dst)
        norm = np.linalg.norm(h, axis=1, keepdims=True)
        norm[norm == 0] = 1.0
        return h / norm


def sample_walk_pairs(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    length: int = 5,
    n_walks: int = 1,
    window: int = 2,
    seed: int = 42,
):
    """Local uniform random walks → (target, context) positive pairs —
    the in-kernel analog of UnsupervisedSampler(walk length 5, 1/node)
    (models/unsupervised.py:54-56), used by the unsupervised FL variant.
    Deterministic for a fixed seed."""
    rng = np.random.default_rng(seed)
    adj: list[list[int]] = [[] for _ in range(n_nodes)]
    for u, v in zip(src, dst):
        adj[u].append(v)
        adj[v].append(u)
    pu, pv = [], []
    for start in range(n_nodes):
        for _ in range(n_walks):
            walk = [start]
            while len(walk) < length:
                nbrs = adj[walk[-1]]
                if not nbrs:
                    break
                walk.append(int(nbrs[rng.integers(0, len(nbrs))]))
            for i, t in enumerate(walk):
                for j in range(max(0, i - window), min(len(walk), i + window + 1)):
                    if i != j and walk[j] != t:  # revisits → skip self-pairs
                        pu.append(t)
                        pv.append(walk[j])
    return np.asarray(pu, dtype="int64"), np.asarray(pv, dtype="int64")


class LinearModel:
    """misc/ prototype: y = Xw + b, MSE, SGD (misc/client.py:77-99)."""

    def __init__(self, n_features: int, lr: float = 1e-3, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.lr = lr
        self.weights = [rng.normal(0, 0.1, (n_features,)), np.zeros(1)]

    def get_weights(self):
        return [w.copy() for w in self.weights]

    def set_weights(self, weights):
        self.weights = [np.asarray(w, dtype="float64").reshape(o.shape)
                        for w, o in zip(weights, self.weights)]

    def fit(self, x, y, epochs: int = 1):
        history = []
        for _ in range(epochs):
            pred = x @ self.weights[0] + self.weights[1]
            err = pred - y
            loss = float(np.mean(err**2))
            self.weights[0] -= self.lr * 2 * (x.T @ err) / len(y)
            self.weights[1] -= self.lr * 2 * np.array([err.mean()])
            history.append({"loss": loss})
        return history
