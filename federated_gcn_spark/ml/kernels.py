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
  inner-product + sigmoid link head (G5), manual backprop. Training
  mirrors models/supervised.py:50-104: Adam (lr 1e-2, the Keras
  defaults beta1=0.9/beta2=0.999) by default with plain SGD available,
  inverted dropout 0.1 on each layer's self+neighbor inputs, and
  optional minibatching (``batch_size=20`` in the reference's
  generator) — all seeded and deterministic. The final L2 normalization
  is applied at embedding inference like models/unsupervised.py:64.
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
                 seed: int = 42, optimizer: str = "adam", dropout: float = 0.1):
        if optimizer not in ("adam", "sgd"):
            raise ValueError(f"optimizer must be 'adam' or 'sgd', got {optimizer!r}")
        if not 0.0 <= dropout < 1.0:
            raise ValueError(f"dropout must be in [0, 1), got {dropout}")
        self.layer_sizes = tuple(layer_sizes)
        self.lr = lr
        self.optimizer = optimizer
        self.dropout = float(dropout)
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
        # training-time randomness (dropout masks, minibatch shuffles) has
        # its own stream so weight init stays bit-identical across configs
        self._rng = np.random.default_rng(seed + 0x5EED)
        # Adam state (models/supervised.py:100-104: keras.optimizers.Adam(lr)).
        # Like the reference, optimizer moments are client-local and never
        # communicated — only weights ride FedAvg (fl_client.py:75-77).
        self._adam_t = 0
        self._adam_m = [np.zeros_like(w) for w in self.weights]
        self._adam_v = [np.zeros_like(w) for w in self.weights]

    # -- weight contract (G8; README.md:37-42) ------------------------------

    def get_weights(self) -> list[np.ndarray]:
        return [w.copy() for w in self.weights]

    def set_weights(self, weights: list[np.ndarray]) -> None:
        # np.array (NOT np.asarray): asarray is a no-copy view when the
        # dtype already matches, and fit()'s in-place `w -= ...` updates
        # would then mutate the CALLER's arrays. Inside applyInPandas the
        # caller is the worker-cached broadcast value, so with
        # spark.python.worker.reuse the next kernel call in the same
        # worker would start from poisoned global weights — which
        # partitions share a worker is a scheduling accident, making
        # training layout-dependent (caught by
        # test_scheduled_waves_bit_identical_to_unscheduled flaking when
        # an unrelated pandas-UDF job reshuffled the worker pool).
        self.weights = [np.array(w, dtype="float64").reshape(old.shape)
                        for w, old in zip(weights, self.weights)]

    # -- forward / backward -------------------------------------------------

    def _forward(self, x, src, dst, train: bool = False):
        """Forward pass; with ``train=True`` applies seeded inverted
        dropout to each layer's self+neighbor inputs (GraphSAGE(...,
        dropout=0.1), models/supervised.py:88-90) and caches the masks
        for the backward pass."""
        p = self.dropout if train else 0.0
        h, cache = x, []
        for k in range(len(self.layer_sizes)):
            ws, wn, b = self.weights[3 * k:3 * k + 3]
            m = _mean_neighbors(h, src, dst)
            if p > 0.0:
                mask_h = (self._rng.random(h.shape) >= p) / (1.0 - p)
                mask_m = (self._rng.random(m.shape) >= p) / (1.0 - p)
                h_in, m_in = h * mask_h, m * mask_m
            else:
                mask_h = mask_m = None
                h_in, m_in = h, m
            z = h_in @ ws + m_in @ wn + b
            cache.append((h_in, m_in, z, mask_h, mask_m))
            h = _relu(z)
        return h, cache

    def _step(self, x, src, dst, pu, pv, labels):
        """One gradient step on one (mini)batch; returns (loss, acc)."""
        h, cache = self._forward(x, src, dst, train=True)
        s = _sigmoid(np.einsum("ij,ij->i", h[pu], h[pv]))
        eps = 1e-12
        loss = -np.mean(labels * np.log(s + eps) + (1 - labels) * np.log(1 - s + eps))
        acc = float(np.mean((s > 0.5) == (labels > 0.5)))
        # dL/dh
        g = (s - labels)[:, None] / len(labels)
        dh = np.zeros_like(h)
        np.add.at(dh, pu, g * h[pv])
        np.add.at(dh, pv, g * h[pu])
        # backprop through layers
        grads: list[np.ndarray] = [None] * len(self.weights)
        for k in reversed(range(len(self.layer_sizes))):
            h_in, m_in, z, mask_h, mask_m = cache[k]
            ws, wn, _ = self.weights[3 * k:3 * k + 3]
            dz = dh * (z > 0)
            grads[3 * k] = h_in.T @ dz
            grads[3 * k + 1] = m_in.T @ dz
            grads[3 * k + 2] = dz.sum(axis=0)
            if k > 0:
                # exact adjoint of h ↦ D⁻¹A h is g ↦ A D⁻¹ g (A
                # symmetric): divide by OWN degree, then aggregate; the
                # dropout masks are elementwise, so their adjoint is the
                # same mask applied to the incoming gradient
                dh_self = dz @ ws.T
                dh_nbr = dz @ wn.T
                if mask_h is not None:
                    dh_self = dh_self * mask_h
                    dh_nbr = dh_nbr * mask_m
                deg = _degrees(dz.shape[0], src, dst)
                dh = dh_self + _sum_neighbors(dh_nbr / deg[:, None], src, dst)
        self._apply_grads(grads)
        return float(loss), acc

    def _apply_grads(self, grads):
        if self.optimizer == "sgd":
            for i, gr in enumerate(grads):
                self.weights[i] -= self.lr * gr
            return
        # Adam, Keras defaults (models/supervised.py:100-104)
        b1, b2, eps = 0.9, 0.999, 1e-7
        self._adam_t += 1
        t = self._adam_t
        for i, gr in enumerate(grads):
            self._adam_m[i] = b1 * self._adam_m[i] + (1 - b1) * gr
            self._adam_v[i] = b2 * self._adam_v[i] + (1 - b2) * gr * gr
            m_hat = self._adam_m[i] / (1 - b1 ** t)
            v_hat = self._adam_v[i] / (1 - b2 ** t)
            self.weights[i] -= self.lr * m_hat / (np.sqrt(v_hat) + eps)

    def fit(self, x, src, dst, pairs_u, pairs_v, labels, epochs: int = 1,
            batch_size: int | None = None):
        """Train on link BCE; returns per-epoch (loss, acc).

        ``batch_size=None`` is full-batch (one step/epoch);
        ``batch_size=20`` mirrors the reference's shuffled minibatch
        generator (GraphSAGELinkGenerator(..., batch_size=20, shuffle=True),
        models/supervised.py:79-81) — seeded shuffle, one optimizer step
        per batch, epoch metrics averaged over batches.
        """
        history = []
        n_pairs = len(labels)
        for _ in range(epochs):
            if batch_size is None or batch_size >= n_pairs:
                loss, acc = self._step(x, src, dst, pairs_u, pairs_v, labels)
                history.append({"loss": loss, "acc": acc})
                continue
            perm = self._rng.permutation(n_pairs)
            losses, accs, weights_seen = [], [], []
            for lo in range(0, n_pairs, batch_size):
                b = perm[lo:lo + batch_size]
                loss, acc = self._step(x, src, dst, pairs_u[b], pairs_v[b], labels[b])
                losses.append(loss)
                accs.append(acc)
                weights_seen.append(len(b))
            w = np.asarray(weights_seen, dtype="float64")
            history.append({
                "loss": float(np.average(losses, weights=w)),
                "acc": float(np.average(accs, weights=w)),
            })
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
        # np.array, not asarray: same aliasing hazard as
        # GraphSAGELinkModel.set_weights (fit mutates in place).
        self.weights = [np.array(w, dtype="float64").reshape(o.shape)
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
