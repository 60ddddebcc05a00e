"""Engine-infrastructure queries: Bloom join pruning, Z-order layout
keys, incremental aggregate (materialized-view) maintenance.

Round-3 additions exercising the physical-layer operators a 100 TB
deployment leans on between queries:

- ``bloom_prejoin_stats``: semi-join reduction with an explicit,
  hash-replayable Bloom filter (operators/bloom.py) — reports admitted
  rows and the measured false-positive rate, the number Spark's native
  runtime bloom filter never surfaces.
- ``zorder_curve_sample``: the Morton-interleave sort key
  (operators/zorder.py) that makes parquet min/max stats prune box
  predicates on every interleaved column; the data-skipping effect
  itself is pinned in tests/test_zorder.py.
- ``incremental_agg_refresh``: fold a delta batch's aggregate state
  into a base state (operators/incremental.py) and get EXACTLY the
  full recompute — the merge invariant, checked against a full
  GROUP BY oracle over the union.

All hash-checked; the Bloom oracle replays xxhash64 via
plans/xxh64_sql.py exactly like the MinHash/LSH oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

_BLOOM_BITS = 8192
_BLOOM_HASHES = 3
_BUILD_PRED = (
    "o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '1998-01-01'"
)


def _bloom_oracle(n_bits: int = _BLOOM_BITS, k: int = _BLOOM_HASHES) -> str:
    from federated_gcn_spark.plans.xxh64_sql import (
        hash_int_sql,
        hash_long_sql,
        to_signed64,
    )

    def pos(key: str, i: int) -> str:
        h = to_signed64(hash_int_sql(str(i), hash_long_sql(key, "42")))
        return f"((({h}) % {n_bits} + {n_bits}) % {n_bits})"

    probe_conds = " AND ".join(
        f"{pos('l_orderkey', i)} IN (SELECT p FROM bits)" for i in range(k)
    )
    build_posns = ", ".join(pos("o_orderkey", i) for i in range(k))
    return f"""
    WITH fo AS MATERIALIZED (
        SELECT o_orderkey FROM orders WHERE {_BUILD_PRED}
    ), bits AS MATERIALIZED (
        SELECT DISTINCT UNNEST([{build_posns}]) AS p FROM fo
    ), probe AS (SELECT l_orderkey FROM lineitem),
    cand AS MATERIALIZED (
        SELECT l_orderkey FROM probe WHERE {probe_conds}
    ), stats AS (
        SELECT (SELECT COUNT(*) FROM probe) AS n_probe,
               (SELECT COUNT(*) FROM cand) AS n_bloom_pass,
               (SELECT COUNT(*) FROM probe
                WHERE l_orderkey IN (SELECT o_orderkey FROM fo)) AS n_exact
    )
    SELECT CAST(n_probe AS BIGINT) AS n_probe,
           CAST(n_bloom_pass AS BIGINT) AS n_bloom_pass,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_bloom_pass - n_exact AS BIGINT) AS n_false_pos,
           ROUND(CAST(n_bloom_pass - n_exact AS DOUBLE)
                 / (n_probe - n_exact), 6) AS fp_rate
    FROM stats
    """


@register("bloom_prejoin_stats", _bloom_oracle())
def bloom_prejoin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction, measured: build an 8192-bit /
    3-hash filter from the urgent-recent orders, prune lineitem with
    it, and report admitted rows vs the exact semi-join (false-positive
    rate ≈ the (1-e^(-kn/m))^k textbook value, here ~9%).

    Scale shape: the filter is a ≤ n_bits-row distinct aggregate — a
    broadcast table no matter how many build keys — and pruning is k
    broadcast semi-joins evaluated on the probe side BEFORE any fact
    shuffle. No false negatives by construction (asserted in
    tests/test_bloom.py); the oracle replays every hash bit-for-bit.
    """
    from federated_gcn_spark.operators.bloom import bloom_bits, bloom_prune

    fo = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey")
    )
    probe = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    bits = bloom_bits(fo, "o_orderkey", _BLOOM_BITS, _BLOOM_HASHES)
    passed = bloom_prune(probe, bits, "l_orderkey", _BLOOM_BITS, _BLOOM_HASHES)
    exact = probe.join(
        fo, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
    )
    n_probe = probe.agg(F.count(F.lit(1)).alias("n_probe"))
    n_pass = passed.agg(F.count(F.lit(1)).alias("n_bloom_pass"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        n_probe.crossJoin(n_pass)
        .crossJoin(n_exact)
        .select(
            "n_probe",
            "n_bloom_pass",
            "n_exact",
            (F.col("n_bloom_pass") - F.col("n_exact")).alias("n_false_pos"),
            F.round(
                (F.col("n_bloom_pass") - F.col("n_exact")).cast("double")
                / (F.col("n_probe") - F.col("n_exact")),
                6,
            ).alias("fp_rate"),
        )
    )


def _zorder_oracle(bits: int = 8) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((x // {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((y // {1 << b}) % 2) * {1 << (2 * b + 1)}")
    z = " + ".join(terms)
    return f"""
    WITH q AS (
        SELECT DISTINCT
               ((l_partkey % 256 + 256) % 256) AS x,
               ((l_suppkey % 256 + 256) % 256) AS y
        FROM lineitem
    )
    SELECT CAST({z} AS BIGINT) AS z,
           CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
    FROM q
    ORDER BY z, x, y
    LIMIT 20
    """


@register("zorder_curve_sample", _zorder_oracle())
def zorder_curve_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) interleaved sort key over two bucketed join
    columns — first 20 distinct curve points. The key is literal-shift
    bit arithmetic (operators/zorder.py, pure codegen); writing
    range-partitioned by it gives every interleaved column tight
    per-file min/max ranges (the data-skipping effect is pinned in
    tests/test_zorder.py against a naturally-laid-out copy)."""
    from federated_gcn_spark.operators.zorder import zorder_key

    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.pmod(F.col("l_partkey"), F.lit(256)).alias("x"),
        F.pmod(F.col("l_suppkey"), F.lit(256)).alias("y"),
    ).distinct()
    return (
        pts.select(
            zorder_key([F.col("x"), F.col("y")], bits=8).alias("z"),
            F.col("x").cast("long").alias("x"),
            F.col("y").cast("long").alias("y"),
        )
        .orderBy("z", "x", "y")
        .limit(20)
    )


@register(
    "incremental_agg_refresh",
    """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the per-customer order rollup is
    kept as mergeable state; a delta batch (orders from 1999 on) folds
    into the pre-1999 base state with a key-sized full-outer merge
    (operators/incremental.py) — and the result is EXACTLY the full
    recompute, which is what the oracle computes from scratch.

    Scale shape: refresh cost is |keys touched| (state ⋈ state on
    custkey, both sides pre-reduced by partial-final aggregates), not
    |base facts| — the reason to maintain state at 100 TB. The merge
    algebra is Spark's own partial-aggregate algebra at table
    granularity.
    """
    from federated_gcn_spark.operators.incremental import (
        agg_state,
        merge_states,
    )

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1999-01-01").cast("timestamp")
    specs = {
        "n_orders": ("count", "o_orderkey"),
        "total_price": ("sum", "o_totalprice"),
        "max_price": ("max", "o_totalprice"),
    }
    base = agg_state(
        orders.where(F.col("o_orderdate") < cut), ["o_custkey"], specs
    )
    delta = agg_state(
        orders.where(F.col("o_orderdate") >= cut), ["o_custkey"], specs
    )
    merged = merge_states(base, delta, ["o_custkey"], specs)
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round("total_price", 2).alias("total_price"),
        F.round("max_price", 2).alias("max_price"),
    )
