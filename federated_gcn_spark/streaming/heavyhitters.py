"""Streaming heavy hitters: incrementally-maintained Count-Min state.

The streaming face of ``operators/cms.py``: every micro-batch's term
stream is reduced to its counter-grid delta and ADDED into a persisted
grid (CMS cells are sums, so the fold is the same merge algebra as
streaming/aggstate.py) — frequency estimates for any key are queryable
between batches at O(depth) probes, with state fixed at depth×width
cells no matter how many distinct keys the stream has seen. The
estimates after N batches equal a one-shot sketch over everything
ingested (associativity, pinned in tests/test_incremental.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.operators.cms import cms_counters


def merge_cms_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> None:
    """Fold one (micro-)batch of keys into the persisted counter grid."""
    weighted = batch.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    delta = cms_counters(weighted, key_col, "cnt", depth=depth, width=width)
    if os.path.exists(state_path):
        old = spark.read.parquet(state_path)
        merged = (
            old.unionByName(delta)
            .groupBy("d", "col")
            .agg(F.sum("c").alias("c"))
        )
    else:
        merged = delta
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        state_path
    )


def streaming_heavy_hitters(
    spark: SparkSession,
    input_path: str,
    state_path: str,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    max_files_per_trigger: int | None = None,
):
    """Maintain the sketch over a file stream; returns the StreamingQuery.

    Probe live estimates any time with ``operators.cms.cms_estimate``
    against ``spark.read.parquet(state_path)``.
    """
    schema = spark.read.parquet(input_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def fold(batch: DataFrame, _batch_id: int) -> None:
        merge_cms_batch(spark, batch, state_path, key_col, depth, width)

    return (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
