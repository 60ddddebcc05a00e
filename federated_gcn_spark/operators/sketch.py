"""Approximate, mergeable aggregates: HLL cardinality + quantile sketch.

At 100 TB, exact COUNT(DISTINCT) is a full shuffle of every distinct
key and exact percentiles need a global sort — the first things a real
pipeline trades for sketches. Spark ships Apache DataSketches HLL
(``hll_sketch_agg``/``hll_union_agg``, Spark 3.5+) whose killer
property is MERGEABILITY: per-partition/per-day sketches union in O(1)
to the global sketch, so cardinalities maintain incrementally (new day
arrives → union one sketch) instead of rescanning history. Quantiles
use ``percentile_approx`` (Greenwald-Khanna), one pass, bounded memory.

Error bounds are pinned by tests (test_sketch.py) against exact
answers: HLL at lgK=12 is ~1.6% RSE; the tests assert 5%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cardinality_report(
    df: DataFrame, key_col: str, group_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group exact vs HLL-approx distinct count + relative error.

    The exact side exists for auditability (and the tests); production
    callers drop it and keep the one-pass sketch path.
    """
    return df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("exact_distinct"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(key_col), F.lit(lg_k))
        ).alias("approx_distinct"),
    ).withColumn(
        "rel_err",
        F.round(
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            6,
        ),
    )


def incremental_hll(
    df: DataFrame, key_col: str, batch_col: str, lg_k: int = 12
) -> DataFrame:
    """The incremental-maintenance shape: one HLL sketch per batch
    (day, shard, snapshot), then a union-merge to the global estimate.

    Returns a 1-row frame (n_batches, merged_estimate). The per-batch
    sketch table is what a pipeline would persist; re-estimating after
    a new batch costs one sketch + one union, never a rescan.
    """
    per_batch = df.groupBy(batch_col).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch")
    )
    return per_batch.agg(
        F.count(F.lit(1)).alias("n_batches"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "merged_estimate"
        ),
    )


def quantile_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna, one pass,
    O(accuracy) memory per group) in long format: (group, prob, value)."""
    q = df.groupBy(group_col).agg(
        F.percentile_approx(
            F.col(value_col), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
        ).alias("qs")
    )
    prob_arr = F.array(*[F.lit(p) for p in probs])
    return (
        q.select(
            group_col,
            F.explode(F.arrays_zip(prob_arr.alias("prob"), F.col("qs").alias("value"))).alias("z"),
        )
        .select(group_col, F.col("z.prob").alias("prob"), F.col("z.value").alias("value"))
    )
