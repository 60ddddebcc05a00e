"""Robust (outlier-resistant) embedding aggregation via grouped-agg
pandas UDF — the third Arrow surface.

The engine's Python escape hatches are applyInPandas (training kernels),
mapInPandas (decoders), and — here — the grouped-aggregate
``@pandas_udf``: a vectorized UDAF that Catalyst folds into a normal
HashAggregate, partial-free but Arrow-batched per group. Right tool when
the aggregate is genuinely non-algebraic (a trimmed mean needs the
group's value distribution, so no map-side combine exists) yet the
per-group state fits comfortably in memory.

Trimmed-mean centroids ignore the contaminated tail that drags a plain
mean (embedding_centroids) toward outliers/mislabeled rows — the robust
prototype for nearest-centroid classification over noisy corpora. Skew
note: one group = one Arrow batch on one executor; group size is
|label| rows × dim floats, the same bound as any per-class computation.
For hub-sized groups pre-aggregate with salted partial sums instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType


# returnType as a DataType object, not a DDL string: string parsing needs
# an active SparkContext, which would make this module unimportable
# before a session exists
@pandas_udf(ArrayType(DoubleType()))
def _trimmed_mean_10(vectors: pd.Series) -> list[float]:
    """Per-dimension 10%-trimmed mean of a series of equal-length arrays."""
    mat = np.asarray([np.asarray(v, dtype="float64") for v in vectors])
    n = mat.shape[0]
    k = int(n * 0.10)
    srt = np.sort(mat, axis=0)
    if n - 2 * k <= 0:
        return np.mean(srt, axis=0).tolist()
    return np.mean(srt[k : n - k, :], axis=0).tolist()


def trimmed_mean_centroids(
    embeddings: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(group, centroid ARRAY<DOUBLE>) — per-dimension 10%-trimmed mean."""
    return embeddings.groupBy(group_col).agg(
        _trimmed_mean_10(F.col(vec_col).cast("array<double>")).alias("centroid")
    )
