"""Incremental document dedup on a stream (extension §2.10 × §2.8).

Batch exact-dedup (operators/dedup.py:exact_dedup) keeps one row per
content fingerprint with a window — unusable on an unbounded stream
(state would grow forever). The streaming form fingerprints each
arriving document and applies dropDuplicatesWithinWatermark: a duplicate
arriving within the watermark horizon of its first occurrence is
dropped, and fingerprint state is evicted once the watermark passes —
bounded state, the standard design for dedup-at-ingest pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from federated_gcn_spark.functions.text import doc_fingerprint


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-arrivals of already-seen content within the watermark.

    ``docs`` must carry a timestamp column; the fingerprint column is
    added (and kept, for downstream lineage/debugging). Exactly-once
    semantics per fingerprint inside the horizon; re-occurrences farther
    apart than the watermark are treated as new (the bounded-state
    trade-off, stated rather than hidden).
    """
    fp = docs.withColumn("fp", doc_fingerprint(text_col))
    if fp.isStreaming:
        fp = fp.withWatermark(event_time_col, watermark)
        return fp.dropDuplicatesWithinWatermark(["fp"])
    return fp.dropDuplicates(["fp"])
