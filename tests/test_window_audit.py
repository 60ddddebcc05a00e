"""Round-11 global-window audit: classifier regression + a pinned
no-new-unbounded-window gate over representative query plans.

A window with no PARTITION BY single-tasks its input — acceptable only
over a bounded frame (post-aggregate, cost-gated small path).  The
audit tool (tools/window_audit.py) classifies every such window; these
tests pin the classifier semantics and assert the known window-using
queries stay free of raw-input global windows, so a new one cannot
land silently.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from window_audit import global_windows  # noqa: E402


def _plan(df):
    return df._jdf.queryExecution().optimizedPlan()


def test_window_over_raw_scan_is_unbounded(spark):
    from pyspark.sql import Window

    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    out = df.withColumn("cum", F.sum("v").over(w))
    hits = global_windows(_plan(out))
    assert [v for _, v in hits] == ["unbounded"]


def test_window_over_aggregate_is_bounded(spark):
    from pyspark.sql import Window

    df = spark.range(100).select((F.col("id") % 7).alias("g"), F.col("id"))
    agg = df.groupBy("g").agg(F.sum("id").alias("s"))
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    out = agg.withColumn("cum", F.sum("s").over(w))
    hits = global_windows(_plan(out))
    assert [v for _, v in hits] == ["bounded"]


def test_window_over_checkpoint_is_staged(spark):
    from pyspark.sql import Window

    df = spark.range(100).select((F.col("id") % 7).alias("g"), F.col("id"))
    agg = df.groupBy("g").agg(F.sum("id").alias("s")).localCheckpoint(
        eager=False
    )
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    out = agg.withColumn("cum", F.sum("s").over(w))
    hits = global_windows(_plan(out))
    assert [v for _, v in hits] == ["staged"]


def test_partitioned_window_not_flagged(spark):
    from pyspark.sql import Window

    df = spark.range(100).select((F.col("id") % 7).alias("g"), F.col("id"))
    w = Window.partitionBy("g").orderBy("id")
    out = df.withColumn("rn", F.row_number().over(w))
    assert global_windows(_plan(out)) == []


def test_known_window_queries_have_no_raw_global_window(spark):
    """The heaviest known users of unpartitioned windows: every global
    window must classify bounded (aggregate below) or staged (behind a
    checkpointed aggregate — reviewed in WINDOW_AUDIT_r11.txt), never
    raw-input unbounded."""
    from federated_gcn_spark.plans import QUERIES

    names = [
        "systematic_weighted_sample",
        "benjamini_hochberg_fdr",
        "gains_lift_table",
        "rfm_segmentation",
        "cusum_changepoint",
        "ks_two_sample_price",
    ]
    sf = "/root/testdata/sf0.001"
    for name in names:
        df = QUERIES[name](spark, sf)
        for desc, verdict in global_windows(_plan(df)):
            assert verdict != "unbounded", (name, desc)
