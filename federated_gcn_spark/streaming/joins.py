"""Watermarked stream-stream joins over the events stream.

The classic attribution join: every purchase is matched to the same
user's views in the preceding window. Both sides carry watermarks and
the join predicate carries an explicit time bound, so Spark can expire
buffered state — without the bound a stream-stream join buffers both
streams forever. This is the streaming twin of a plain time-bounded
batch join (same function works on batch DataFrames, which is what the
equivalence test does).

State size at scale: O(events inside [watermark horizon] per side) —
tune the watermark to the attribution window, not to pipeline latency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from federated_gcn_spark.streaming.events import _event_time


def purchase_view_attribution(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """(purchase_id, purchase_time, user_id, view_id, view_time) — one row
    per (purchase, prior view within ``window``) pair for that user.

    Works on a streaming or batch events DataFrame; streaming inputs get
    per-side watermarks (required for state expiry on stream-stream
    inner joins).
    """
    base = events.withColumn("event_time", _event_time(events))
    views = base.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("event_time").alias("view_time"),
    )
    purchases = base.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("event_time").alias("purchase_time"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_time", watermark)
        purchases = purchases.withWatermark("purchase_time", watermark)
    return purchases.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_time") < F.col("purchase_time"))
        & (
            F.col("view_time")
            >= F.col("purchase_time") - F.expr(f"INTERVAL {window}")
        ),
    ).select("purchase_id", "purchase_time", "user_id", "view_id", "view_time")
