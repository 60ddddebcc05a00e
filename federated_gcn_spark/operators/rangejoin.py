"""Banded range join: facts ⋈ interval table on lo <= value < hi.

The rate-table lookup (price tiers, tax brackets, IP→geo ranges, SLA
bands).  Spark compiles a raw non-equi join to BroadcastNestedLoopJoin
(fine while the band table broadcasts) or, worse, a cartesian — at a
million bands it's O(|facts| x |bands|).  The scale path aligns both
sides to fixed-width buckets: each band explodes to the buckets its
interval covers (``sequence``), each fact computes its single bucket,
and the join becomes an EQUI join on bucket followed by the residual
``[lo, hi)`` filter — O(|facts| x bands-per-bucket), shuffle-keyed and
AQE-skew-splittable like any other equi join.

Bucket width is the tuning knob: ~the median band width makes
bands-per-bucket O(1); pass it explicitly (the caller knows the band
scale) or let the operator derive it from the band table (driver-side
aggregate over |bands| rows — tiny).  Overlapping bands are supported
(a fact matches every containing band); half-open [lo, hi) semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
    how: str = "inner",
) -> DataFrame:
    """facts joined to every band with lo <= value < hi, via
    bucket-aligned equi join.  ``how`` may be "inner" or "left"
    (unmatched facts kept with null band columns)."""
    if bucket_width is None:
        med = bands.agg(
            F.percentile_approx(F.col(hi_col) - F.col(lo_col), 0.5)
        ).collect()[0][0]
        bucket_width = float(med) or 1.0
    w = float(bucket_width)

    # Clamp the EXPLODE range (not the band columns — they flow to the
    # output untouched) to the observed fact domain: an open-ended band
    # (hi = +inf / 1e12) must cover only the buckets facts can actually
    # occupy, not its nominal range — otherwise a single sentinel band
    # explodes to billions of rows.  One tiny aggregate over facts.
    dom = facts.agg(
        F.min(value_col).alias("mn"), F.max(value_col).alias("mx")
    ).collect()[0]
    if dom["mn"] is None:  # no facts: empty joined schema / facts as-is
        return facts.limit(0).crossJoin(bands.limit(0)) if how == "inner" else facts
    clamped_lo = F.greatest(F.col(lo_col), F.lit(float(dom["mn"]) - w))
    clamped_hi = F.least(F.col(hi_col), F.lit(float(dom["mx"]) + w))
    hi_over_w = clamped_hi / w
    last_bucket = F.when(
        # hi exactly on a bucket boundary: exclusive end stops one short
        hi_over_w == F.floor(hi_over_w),
        F.floor(hi_over_w) - 1,
    ).otherwise(F.floor(hi_over_w))
    first_bucket = F.floor(clamped_lo / w).cast("long")
    # guard: Spark's sequence(a, b) runs DESCENDING when b < a, so a
    # band entirely outside the fact domain must yield an explicit
    # empty array, not a backwards range
    buckets = F.when(
        last_bucket.cast("long") >= first_bucket,
        F.sequence(first_bucket, last_bucket.cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    exploded = bands.withColumn("__bucket", F.explode(buckets))
    keyed = facts.withColumn(
        "__bucket", F.floor(F.col(value_col) / w).cast("long")
    )
    cond = (
        (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))
    )
    joined = keyed.join(exploded, "__bucket", "inner").where(cond)
    if how == "inner":
        return joined.drop("__bucket")
    if how == "left":
        matched = joined.drop("__bucket")
        missing = keyed.drop("__bucket").join(
            matched.select(facts.columns).distinct(), facts.columns, "left_anti"
        )
        for c in set(matched.columns) - set(facts.columns):
            missing = missing.withColumn(
                c, F.lit(None).cast(dict(matched.dtypes)[c])
            )
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r}")
