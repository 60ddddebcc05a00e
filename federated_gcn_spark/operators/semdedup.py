"""SemDeDup: semantic deduplication by within-cluster similarity scans.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means-cluster the embedding space,
then look for near-duplicate pairs only WITHIN clusters — the global
O(n²) pair scan becomes Σ O(n_c²), an n/k reduction with balanced
clusters. Clustering reuses ``operators.similarity.IVFIndex`` (the same
distributed Lloyd loop that backs the IVF ANN index).

The within-cluster scan is a grouped ``applyInPandas``: each cluster
arrives as one Arrow batch and its pair similarities are ONE BLAS call
(``Xn @ Xn.T``). Measured against the relational spelling (self-join on
cluster id + per-pair cosine) at 5k×64 / 16 clusters this is ~10×
faster — the join materializes |pairs| rows each carrying two full
vectors, while the grouped kernel ships each vector exactly once.

Scale contract: one cluster must fit one task's memory (the group is
the parallelism unit). That is SemDeDup's own operating point — k is
chosen to make expected cluster size a few tens of thousands (the paper
uses k = 11k for 1.3e9 embeddings); for skew-degenerate clusterings,
cap cluster size upstream by splitting oversized clusters (re-cluster
or hash-salt) before the scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

STATS_SCHEMA = (
    "cid INT, cluster_size BIGINT, n_dup_pairs BIGINT, max_cos DOUBLE"
)


def semdedup_cluster_stats(
    assigned: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """Per-cluster near-duplicate statistics.

    For every cluster: member count, number of (unordered) pairs with
    cosine ≥ ``threshold``, and the maximum pairwise cosine (-1.0 for
    singleton clusters — below any achievable cosine of unit vectors).
    Zero vectors contribute cosine 0 pairs (guarded normalization), the
    same "arbitrary but stable" treatment as ``IVFIndex.assign``.
    """

    def _stats(key, pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        n = X.shape[0]
        if n < 2:
            return pd.DataFrame(
                {
                    "cid": [int(key[0])],
                    "cluster_size": [n],
                    "n_dup_pairs": [0],
                    "max_cos": [-1.0],
                }
            )
        norms = np.maximum(np.linalg.norm(X, axis=1), 1e-300)
        Xn = X / norms[:, None]
        S = Xn @ Xn.T
        iu = np.triu_indices(n, k=1)
        sims = S[iu]
        return pd.DataFrame(
            {
                "cid": [int(key[0])],
                "cluster_size": [n],
                "n_dup_pairs": [int((sims >= threshold).sum())],
                "max_cos": [float(sims.max())],
            }
        )

    return (
        assigned.select(cluster_col, vec_col)
        .groupBy(cluster_col)
        .applyInPandas(_stats, STATS_SCHEMA)
    )
