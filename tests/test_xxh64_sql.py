"""Bit-for-bit parity of the DuckDB-SQL xxhash64 (plans/xxh64_sql) with
Spark's ``F.xxhash64`` — the enabler that turns every hash-seeded
operator (MinHash, SimHash, walks, fanout sampling) into a full
value-hash oracle check instead of a rows-only one.

Covers: the int/long fixed paths, the full byte-stream string path
(empty, <32B, exactly 32B, >32B with every tail combination, multi-byte
UTF-8), and multi-argument seed chaining in the shapes the oracles use.
"""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from federated_gcn_spark.plans.xxh64_sql import (
    hash_int_sql,
    hash_long_sql,
    hash_string_sql,
    pmod_sql,
    to_signed64,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_val(duck, sql: str):
    return duck.execute("SELECT " + sql).fetchall()[0][0]


def test_hash_long_matches_spark(spark, duck):
    vals = [0, 1, -1, 42, 123456789, -987654321, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    expected = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    got = [_duck_val(duck, to_signed64(hash_long_sql(str(v), "42"))) for v in vals]
    assert got == expected


def test_hash_int_matches_spark(spark, duck):
    vals = [0, 1, -1, 77, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    expected = [r[0] for r in df.select(F.xxhash64("v")).collect()]
    got = [_duck_val(duck, to_signed64(hash_int_sql(str(v), "42"))) for v in vals]
    assert got == expected


def test_hash_string_matches_spark(spark, duck):
    rng = random.Random(7)
    cases = [
        "",
        "a",
        "abc",
        "hello world",
        "héllo wörld ünïcödé ✓",
        "x" * 31,
        "y" * 32,
        "z" * 33,
        "w" * 40,  # 1 stripe + 8-byte word
        "q" * 44,  # + 4-byte word
        "r" * 47,  # + 3 single bytes
        "s" * 100,
    ]
    for _ in range(15):
        n = rng.randrange(0, 90)
        cases.append("".join(rng.choice(string.printable[:94]) for _ in range(n)))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    expected = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    for c, exp in zip(cases, expected):
        esc = c.replace("'", "''")
        got = _duck_val(duck, to_signed64(hash_string_sql(f"'{esc}'", "42")))
        assert got == exp, f"mismatch for {c!r}"


def test_seed_chaining_matches_spark(spark, duck):
    """The _pseudo_rand shape: xxhash64(string, int, long, int) — chained
    through staged columns exactly as the walk oracles stage them."""
    rows = [("12_0", 1, 10_000_001, 42), ("99_1", 3, 5, 42), ("7_0", 2, -8, 42)]
    df = spark.createDataFrame(rows, "a string, b int, c long, d int")
    expected = [r[0] for r in df.select(F.xxhash64("a", "b", "c", "d")).collect()]
    for (a, b, c, d), exp in zip(rows, expected):
        got = duck.execute(
            f"""
            SELECT {to_signed64(hash_int_sql(str(d), 'h3'))} FROM (
              SELECT {hash_long_sql(str(c), 'h2')} AS h3 FROM (
                SELECT {hash_int_sql(str(b), 'h1')} AS h2 FROM (
                  SELECT {hash_string_sql(f"'{a}'", '42')} AS h1
                )
              )
            )
            """
        ).fetchall()[0][0]
        assert got == exp, f"mismatch for {(a, b, c, d)}"


def test_pmod_matches_spark(spark, duck):
    """pmod over the signed hash — the [0, P) draw every sampler uses."""
    vals = ["alpha", "beta", ""]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    expected = [
        r[0]
        for r in df.select(F.pmod(F.xxhash64("s"), F.lit(1_000_000_007))).collect()
    ]
    got = [
        _duck_val(duck, pmod_sql(hash_string_sql(f"'{v}'", "42"), 1_000_000_007))
        for v in vals
    ]
    assert got == expected
