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

    # fo feeds the filter build and the exact semi join; bits is
    # referenced once per hash inside bloom_prune; probe feeds the
    # pruned, exact and total counts — unstaged, orders was scanned
    # four times and lineitem three.  Three lazy checkpoints (fo and
    # bits are filter-sized, probe is one key column) -> one scan each.
    fo = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_orderkey")
        .localCheckpoint(eager=False)
    )
    probe = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .localCheckpoint(eager=False)
    )
    bits = bloom_bits(fo, "o_orderkey", _BLOOM_BITS, _BLOOM_HASHES).localCheckpoint(
        eager=False
    )
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


def _cms_oracle(depth: int = 3, width: int = 16, topk: int = 20) -> str:
    r"""Replay of the Count-Min build + probe: tokenize, exact term
    counts, the depth×width counter grid via the xxhash64 replay
    (hash_string once per term, then one hash_int chain per grid row —
    the same composition Spark's xxhash64(term, lit(d)) computes), and
    the min-over-rows estimates for the exact top-k terms."""
    from federated_gcn_spark.plans.xxh64_sql import (
        hash_int_sql,
        hash_string_sql,
        to_signed64,
    )

    def pos(d: int) -> str:
        h = to_signed64(hash_int_sql(str(d), "hs"))
        return f"((({h}) % {width} + {width}) % {width})"

    posns = ", ".join(pos(d) for d in range(depth))
    ds = ", ".join(str(d) for d in range(depth))
    est = ", ".join(
        f"""COALESCE((SELECT c FROM counters
             WHERE counters.d = {d} AND counters.col = {pos(d)}), 0)"""
        for d in range(depth)
    )
    return f"""
    WITH tok AS (
        SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), tc AS MATERIALIZED (
        SELECT term, COUNT(*) AS cnt,
               {hash_string_sql('term', '42')} AS hs
        FROM tok WHERE term <> '' GROUP BY term
    ), cells AS (
        SELECT cnt, UNNEST([{ds}]) AS d, UNNEST([{posns}]) AS col FROM tc
    ), counters AS MATERIALIZED (
        SELECT d, col, SUM(cnt) AS c FROM cells GROUP BY d, col
    ), top AS (
        SELECT term, cnt, hs FROM tc ORDER BY cnt DESC, term LIMIT {topk}
    )
    SELECT term, CAST(cnt AS BIGINT) AS exact_cnt,
           CAST(LEAST({est}) AS BIGINT) AS cms_est,
           CAST(LEAST({est}) - cnt AS BIGINT) AS overcount
    FROM top
    ORDER BY exact_cnt DESC, term
    """


@register("cms_heavy_hitters", _cms_oracle())
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimates for the exact top-20 corpus
    terms, with the measured overcount per term (operators/cms.py).

    Scale shape: the sketch is depth·width cells no matter the
    vocabulary — the frequency pass a 100 TB corpus keeps when exact
    counts do not fit; cells merge by addition (same state algebra as
    incremental_agg_refresh). The exact counts here exist only to
    verify the estimates — and the oracle replays every hash, so the
    sketch's overestimates are hash-checked, not just bounded.
    """
    from federated_gcn_spark.operators.cms import cms_counters, cms_estimate

    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    # tc (vocab counts) feeds the sketch build and the exact top-20;
    # top feeds the probe and the final join — staged once each -> one
    # tokenize pass instead of three
    tc = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    counters = cms_counters(tc, "term", "cnt", depth=3, width=16)
    top = (
        tc.orderBy(F.col("cnt").desc(), "term")
        .limit(20)
        .localCheckpoint(eager=False)
    )
    est = cms_estimate(top.select("term"), counters, "term", depth=3, width=16)
    return (
        top.join(est, "term")
        .select(
            "term",
            F.col("cnt").cast("long").alias("exact_cnt"),
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("cnt")).cast("long").alias("overcount"),
        )
        .orderBy(F.col("exact_cnt").desc(), "term")
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


@register(
    "merge_upsert_segments",
    """
    WITH upd AS (
        SELECT c_custkey, c_name, c_nationkey,
               0.0 AS c_acctbal, 'COLLECTIONS' AS c_mktsegment
        FROM customer WHERE c_acctbal < 0
        UNION ALL
        SELECT s_suppkey + 10000000, s_name, s_nationkey,
               s_acctbal, 'SUPPLIER'
        FROM supplier
    ), merged AS (
        SELECT * FROM customer
        WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        UNION ALL
        SELECT * FROM upd
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM merged
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def merge_upsert_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (operators/upsert.py) through the gate: negative-
    balance customers are UPDATED into a COLLECTIONS segment, suppliers
    are INSERTED as new customer rows, everyone else carries over —
    then the per-segment rollup of the merged snapshot.

    Scale shape: the merge is ONE anti join on the key (update side
    AQE-broadcastable when it is a trickle) plus a union — never a
    full-outer materialization; the oracle spells the same semantics
    with NOT IN + UNION ALL.
    """
    from federated_gcn_spark.operators.upsert import merge_upsert

    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    upd = (
        customer.where(F.col("c_acctbal") < 0)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            F.lit(0.0).alias("c_acctbal"),
            F.lit("COLLECTIONS").alias("c_mktsegment"),
        )
        .unionByName(
            supplier.select(
                (F.col("s_suppkey") + 10_000_000).alias("c_custkey"),
                F.col("s_name").alias("c_name"),
                F.col("s_nationkey").alias("c_nationkey"),
                F.col("s_acctbal").alias("c_acctbal"),
                F.lit("SUPPLIER").alias("c_mktsegment"),
            )
        )
        # the update trickle feeds both merge legs (anti join + union);
        # staged once instead of re-running both source scans per leg
        .localCheckpoint(eager=False)
    )
    merged = merge_upsert(customer, upd, ["c_custkey"])
    return (
        merged.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


def _hll_replay_oracle(p: int = 7, cap: int = 55) -> str:
    """DuckDB replay of operators/sketch.hll_replay over events.user_id.

    Identical integer pipeline: unsigned xxhash64 -> low-p-bit bucket
    (u % m) / high bits (u // m) -> branch-free bit-length via 64-p
    comparisons -> per-bucket MAX(rho) -> INTEGER harmonic sum -> one
    double division with the same inlined constant literal.
    """
    from federated_gcn_spark.plans.xxh64_sql import xxhash64_sql

    m = 1 << p
    wbits = 64 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    c_num = alpha * m * m * float(1 << cap)
    u = xxhash64_sql(("user_id", "long"))
    bitlen = " + ".join(f"(w >= {1 << k})::INT" for k in range(wbits))
    return f"""
    WITH h AS (
        SELECT event_type, ({u}) AS u FROM events
    ), b AS (
        SELECT event_type, (u % {m})::BIGINT AS bucket, (u // {m}) AS w FROM h
    ), regs AS (
        SELECT event_type, bucket, MAX({wbits + 1} - ({bitlen})) AS mr
        FROM b GROUP BY event_type, bucket
    ), per AS (
        SELECT event_type,
               COUNT(*) AS present,
               SUM(CAST(POWER(2, {cap} - LEAST(mr, {cap})) AS BIGINT)) AS filled_sum,
               MAX(mr) AS max_reg
        FROM regs GROUP BY event_type
    )
    SELECT event_type,
           CAST(present AS BIGINT) AS nonzero_regs,
           CAST(max_reg AS BIGINT) AS max_reg,
           ROUND({c_num!r} / CAST(filled_sum + ({m} - present) * {1 << cap} AS DOUBLE), 2)
               AS est_distinct
    FROM per
    ORDER BY event_type
    """


@register("hll_replay_cardinality", _hll_replay_oracle())
def hll_replay_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-replayable HyperLogLog (operators/sketch.py:hll_replay):
    per-event-type register state + raw estimate, value-checked against
    a DuckDB replay of the identical integer pipeline — the distributed
    sketch CONSTRUCTION is the thing under test, complementing the
    DataSketches path whose serialized estimates are library-specific
    (sketch_cardinalities, rows-only)."""
    from federated_gcn_spark.operators.sketch import hll_replay

    events = load_table(spark, sf_dir, "events")
    return hll_replay(events, "user_id", "event_type").orderBy("event_type")


def _kmv_oracle(k: int = 32) -> str:
    from federated_gcn_spark.plans.xxh64_sql import to_signed64, xxhash64_sql

    h = to_signed64(xxhash64_sql(("user_id", "long")))
    num = float((k - 1) * (1 << 64))
    shift = float(1 << 63)
    return f"""
    WITH dh AS (
        SELECT DISTINCT ({h}) AS h FROM events
    ), sm AS (
        SELECT h FROM dh ORDER BY h LIMIT {k}
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_actual,
           MAX(h) AS kth_hash,
           CASE WHEN COUNT(*) < {k}
                THEN CAST(COUNT(*) AS DOUBLE)
                ELSE ROUND({num!r} / (CAST(MAX(h) AS DOUBLE) + {shift!r}), 2)
           END AS est_distinct
    FROM sm
    """


@register("kmv_distinct", _kmv_oracle())
def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct-user estimate
    (operators/sketch.py:kmv_kth), the second hash-replayable sketch:
    integer order statistics end-to-end, one double division at the
    emit.  The k-smallest selection is TakeOrdered (no global sort);
    the oracle replays the same signed-hash order statistics."""
    from federated_gcn_spark.operators.sketch import kmv_kth

    events = load_table(spark, sf_dir, "events")
    return kmv_kth(events, "user_id", k=32)
