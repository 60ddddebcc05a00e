"""Distributed logistic regression by full-batch gradient descent,
entirely in Catalyst expressions.

The demonstration that iterative ML needs NO Python on the row path
when the per-iteration statistic is algebraic: the gradient
∇ = mean((σ(w·x) - y) · x) is one map-side-combinable aggregate per
step. Weights (a handful of floats) live on the driver and are inlined
into the next iteration's expressions as literals — the same
driver-loop + tiny-state shape as PageRank, with Spark doing a single
pass over the data per step. Deterministic up to float summation order.

At 100 TB each iteration is one scan + one scalar-row shuffle; for many
iterations stage the feature matrix once with localCheckpoint (done
here) so parquet decode isn't repaid every step.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logistic_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iterations: int = 20,
    standardize: bool = True,
) -> tuple[np.ndarray, float]:
    """Returns (coefficients aligned to feature_cols, intercept).

    ``standardize`` scales features to zero-mean/unit-variance first
    (one aggregate) — plain GD is hopeless across wildly different
    feature scales, and the stats come back as a single tiny row.
    """
    cols = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")

    if standardize:
        stats = df.agg(
            *[F.avg(c).alias(f"m{i}") for i, c in enumerate(cols)],
            *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(cols)],
        ).collect()[0]
        if any(stats[f"m{i}"] is None for i in range(len(cols))):
            raise ValueError(
                "logistic_fit: empty input or all-null feature column "
                "(aggregate stats returned NULL)"
            )
        cols = [
            (c - F.lit(stats[f"m{i}"])) / F.lit(max(stats[f"s{i}"] or 0.0, 1e-12))
            for i, c in enumerate(cols)
        ]

    staged = df.select(
        *[c.alias(f"x{i}") for i, c in enumerate(cols)], y.alias("y")
    ).localCheckpoint(eager=True)
    k = len(feature_cols)
    w = np.zeros(k)
    b = 0.0
    for _ in range(iterations):
        z = F.lit(b)
        for i in range(k):
            z = z + F.lit(float(w[i])) * F.col(f"x{i}")
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        grad_row = staged.agg(
            *[F.avg(resid * F.col(f"x{i}")).alias(f"g{i}") for i in range(k)],
            F.avg(resid).alias("gb"),
        ).collect()[0]
        w = w - lr * np.array([grad_row[f"g{i}"] for i in range(k)])
        b = b - lr * float(grad_row["gb"])
    return w, b
