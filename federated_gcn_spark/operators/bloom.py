"""Bloom-filter join pruning (semi-join reduction), relationally spelled.

The classic distributed-join optimization: before shuffling a huge
probe side, reduce it with a Bloom filter built from the (much smaller)
build side's join keys. Spark ships this natively as runtime filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator is
the explicit, measurable spelling — it reports exactly how many probe
rows the filter admits and how many of those are false positives, the
number the runtime version never shows you.

Design: k hash functions are ``xxhash64(key, i)`` for i in 0..k-1 —
the same hash family the oracle replay (plans/xxh64_sql.py) reproduces
bit-for-bit, so the whole pruning pipeline is hash-checkable against
DuckDB. The filter itself is kept RELATIONAL: the set of occupied bit
positions is a table bounded by ``n_bits`` rows (a distinct aggregate
— never more, no matter how many build keys), and membership is k
broadcast semi-joins of the probe side against it. No driver-side
bitmap, no giant literal arrays in the plan; at cluster scale each
semi-join is a broadcast hash probe evaluated scan-side before any
fact shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_position(key: Column, i: int, n_bits: int) -> Column:
    """Bit position of hash i for ``key`` — pmod(xxhash64(key, i), n_bits)."""
    return F.pmod(F.xxhash64(key, F.lit(i)), F.lit(n_bits))


def bloom_bits(
    build: DataFrame, key_col: str, n_bits: int = 8192, n_hashes: int = 3
) -> DataFrame:
    """Occupied bit positions of the Bloom filter over the build keys.

    One explode + distinct: ≤ ``n_bits`` output rows regardless of the
    build side's cardinality — the broadcastable filter table.
    """
    key = F.col(key_col)
    return (
        build.select(
            F.explode(
                F.array(
                    *[bloom_position(key, i, n_bits) for i in range(n_hashes)]
                )
            ).alias("p")
        )
        .distinct()
    )


def bloom_prune(
    probe: DataFrame,
    bits: DataFrame,
    key_col: str,
    n_bits: int = 8192,
    n_hashes: int = 3,
) -> DataFrame:
    """Probe rows whose key passes the Bloom filter (all k bits set).

    k broadcast left-semi joins against the bit table — each evaluated
    before any shuffle of the probe side. Supersets the true semi-join
    result by construction (no false negatives).
    """
    key = F.col(key_col)
    out = probe
    for i in range(n_hashes):
        out = out.withColumn(f"_bp{i}", bloom_position(key, i, n_bits))
        out = out.join(
            F.broadcast(bits.withColumnRenamed("p", f"_bp{i}")),
            f"_bp{i}",
            "left_semi",
        )
    return out.drop(*[f"_bp{i}" for i in range(n_hashes)])
