"""Incrementally-maintained distinct counts over a stream (HLL state).

The materialized-view pattern for cardinality: every micro-batch folds
into ONE persisted HLL sketch row per group, so "distinct users ever"
stays queryable at any moment for the cost of a sketch union per batch
— never a rescan of history, and state is O(groups × sketch_size)
regardless of stream length. This is what the mergeability of
operators/sketch.py buys in a streaming setting.

State lives as a parquet table of (group, sketch-binary). foreachBatch
is the right tool (not a stateful operator): the sketch table is an
external queryable artifact, batch-atomic, and restart-safe together
with the stream's checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_sketch_state(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    group_col: str,
    key_col: str,
    lg_k: int = 12,
) -> None:
    """Fold one (micro-)batch into the persisted per-group sketch table."""
    new = batch.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lg_k)).alias("sketch")
    )
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = (
            old.unionByName(new)
            .groupBy(group_col)
            .agg(F.hll_union_agg(F.col("sketch")).alias("sketch"))
        )
    else:
        merged = new
    # localCheckpoint breaks the read->overwrite cycle on the same path
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_path)


def streaming_distinct_counts(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    group_col: str,
    key_col: str,
    lg_k: int = 12,
    max_files_per_trigger: int | None = None,
):
    """Start the maintenance stream; returns the StreamingQuery.

    Query the live estimates any time with ``read_distinct_counts``.
    """
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def fold(batch: DataFrame, _batch_id: int) -> None:
        merge_sketch_state(spark, batch, state_path, group_col, key_col, lg_k)

    return (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )


def read_distinct_counts(
    spark: SparkSession, state_path: str, group_col: str
) -> DataFrame:
    """(group, distinct_estimate) from the maintained sketch table."""
    return spark.read.parquet(state_path).select(
        group_col,
        F.hll_sketch_estimate(F.col("sketch")).alias("distinct_estimate"),
    )
