"""Distributed skyline: brute-force parity, duplicates, layout
independence, direction handling."""

import random

import pytest
from pyspark.sql import functions as F

from federated_gcn_spark.operators.skyline import skyline


def _brute(rows, crits):
    def dominates(b, a):
        nw = all(
            (b[i] >= a[i]) if d == "max" else (b[i] <= a[i])
            for i, (_, d) in enumerate(crits)
        )
        sb = any(
            (b[i] > a[i]) if d == "max" else (b[i] < a[i])
            for i, (_, d) in enumerate(crits)
        )
        return nw and sb

    return {a for a in rows if not any(dominates(b, a) for b in rows)}


@pytest.mark.parametrize("seed", [1, 2])
def test_skyline_matches_brute_force(spark, seed):
    rng = random.Random(seed)
    rows = [
        (rng.randint(0, 30) * 1.0, rng.randint(0, 30) * 1.0)
        for _ in range(400)
    ]
    crits = [("x", "max"), ("y", "min")]
    df = spark.createDataFrame(rows, "x double, y double").repartition(7)
    got = {(r["x"], r["y"]) for r in skyline(df, crits).collect()}
    assert got == _brute(set(rows), crits)


def test_duplicate_frontier_points_all_kept(spark):
    # two identical points on the frontier: neither STRICTLY dominates
    # the other, so both survive
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, 5.0, 5.0), (3, 1.0, 9.0)], "id long, x double, y double"
    )
    got = sorted(r["id"] for r in skyline(df, [("x", "max"), ("y", "max")]).collect())
    assert got == [1, 2, 3]  # (1,9) incomparable with (5,5) under max/max


def test_layout_independent(spark):
    rows = [(float(i % 13), float((i * 7) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y double")
    a = {(r["x"], r["y"]) for r in skyline(df, [("x", "max"), ("y", "max")]).collect()}
    b = {
        (r["x"], r["y"])
        for r in skyline(df.repartition(17, "y"), [("x", "max"), ("y", "max")]).collect()
    }
    assert a == b
