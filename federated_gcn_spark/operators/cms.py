"""Count-Min sketch: mergeable heavy-hitter frequency estimation.

Cormode & Muthukrishnan 2005. A depth×width counter grid where item i
increments cell (d, h_d(i)) in every row; the estimate is the MIN over
rows — always an overestimate, with error ≤ εN for width = e/ε at
failure probability δ = e^-depth. The sketch a 100 TB token-frequency
pass keeps when the vocabulary does not fit anywhere: the state is
depth·width cells NO MATTER the key cardinality, and cells merge by
addition across partitions/batches (same algebra as
operators/incremental.py).

Hash family: ``xxhash64(key, d)`` — replayable bit-for-bit in the
DuckDB oracle via plans/xxh64_sql.py, so even the sketch's
OVERESTIMATES are hash-checked, not just bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_position(key, d: int, width: int):
    """Column position of hash row ``d`` for ``key``."""
    return F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width))


def cms_counters(
    weighted: DataFrame,
    key_col: str = "term",
    weight_col: str = "cnt",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build the counter grid (d, col, c) from per-key weights.

    One explode (depth rows per key) + a partial-final groupBy whose
    output is ≤ depth·width rows — the broadcastable sketch state.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                cms_position(F.col(key_col), d, width).alias("col"),
            )
            for d in range(depth)
        ]
    )
    return (
        weighted.select(F.explode(cells).alias("cell"), F.col(weight_col))
        .groupBy(F.col("cell.d").alias("d"), F.col("cell.col").alias("col"))
        .agg(F.sum(weight_col).alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for ``keys``: min over depth rows of the grid.

    The grid broadcasts (≤ depth·width rows); each key probes its depth
    cells and takes the min — an empty cell counts 0.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                cms_position(F.col(key_col), d, width).alias("col"),
            )
            for d in range(depth)
        ]
    )
    probed = keys.select(F.col(key_col), F.explode(cells).alias("cell")).select(
        key_col, F.col("cell.d").alias("d"), F.col("cell.col").alias("col")
    )
    return (
        probed.join(F.broadcast(counters), ["d", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_est"))
    )
