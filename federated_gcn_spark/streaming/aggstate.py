"""Streaming materialized-view maintenance: per-key aggregate state.

The streaming twin of ``operators/incremental.py``: every micro-batch
is reduced to its aggregate state (one row per key touched) and folded
into a persisted state table with the same count/sum/min/max merge
algebra. The refreshed rollup is queryable between batches, refresh
cost is O(keys touched per batch), and — because the fold is the exact
partial-aggregate algebra — the state after N batches equals the full
recompute over everything ingested (pinned in
tests/test_streaming.py::test_streaming_agg_state_equals_batch_rollup).

Same ``foreachBatch`` + parquet-state pattern as
streaming/cardinality.py: the state is an external, batch-atomic
artifact that survives restarts alongside the stream checkpoint.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from federated_gcn_spark.operators.incremental import (
    Spec,
    agg_state,
    merge_states,
)


def merge_agg_state_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    keys: list[str],
    specs: Spec,
) -> None:
    """Fold one (micro-)batch into the persisted per-key state table."""
    delta = agg_state(batch, keys, specs)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = merge_states(old, delta, keys, specs)
    else:
        merged = delta
    # localCheckpoint breaks the read->overwrite cycle on the same path
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        state_path
    )


def streaming_agg_state(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    keys: list[str],
    specs: Spec,
    max_files_per_trigger: int | None = None,
):
    """Maintain the rollup over a file stream; returns the StreamingQuery.

    Query the live rollup any time with ``spark.read.parquet(state_path)``.
    """
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def fold(batch: DataFrame, _batch_id: int) -> None:
        merge_agg_state_batch(spark, batch, state_path, keys, specs)

    return (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
