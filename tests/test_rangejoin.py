"""Banded range join: parity with a nested-loop reference, boundary
semantics, overlap, open-ended bands, left join."""

import pytest
from pyspark.sql import functions as F

from federated_gcn_spark.operators.rangejoin import band_range_join


@pytest.fixture(scope="module")
def bands(spark):
    return spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 25.0), ("wide", 5.0, 1e12)],
        "tier string, lo double, hi double",
    )


def test_matches_nested_loop_reference(spark, bands):
    vals = [0.0, 4.9, 5.0, 9.999, 10.0, 24.999, 25.0, 3000.5]
    facts = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v double")
    got = {
        (r["id"], r["tier"])
        for r in band_range_join(facts, bands, "v", bucket_width=7.0).collect()
    }
    ref = {
        (i, t)
        for i, v in enumerate(vals)
        for t, lo, hi in [("a", 0.0, 10.0), ("b", 10.0, 25.0), ("wide", 5.0, 1e12)]
        if lo <= v < hi
    }
    assert got == ref
    # boundary checks baked into ref: 10.0 is in b (not a), 25.0 only in wide


def test_open_ended_band_does_not_explode(spark, bands):
    # 1e12 hi with bucket_width 1.0 must clamp to the fact domain
    facts = spark.createDataFrame([(1, 7.0)], "id long, v double")
    rows = band_range_join(facts, bands, "v", bucket_width=1.0).collect()
    assert {r["tier"] for r in rows} == {"a", "wide"}


def test_left_join_keeps_unmatched(spark, bands):
    facts = spark.createDataFrame(
        [(1, 7.0), (2, -5.0)], "id long, v double"
    )
    rows = band_range_join(facts, bands, "v", bucket_width=5.0, how="left").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r["tier"])
    assert sorted(by_id[1]) == ["a", "wide"]
    assert by_id[2] == [None]


def test_empty_facts(spark, bands):
    facts = spark.createDataFrame([], "id long, v double")
    assert band_range_join(facts, bands, "v", bucket_width=1.0).count() == 0
