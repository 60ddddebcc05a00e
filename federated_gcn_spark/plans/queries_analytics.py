"""Decision-support shapes (TPC-H Q10/Q11/Q13/Q14/Q18/Q21/Q22 analogues).

Round-3 widening of the relational surface with the classic
decision-support patterns the catalog did not yet exercise:

- left-outer + count distribution (Q13),
- global scalar-subquery threshold against a reused aggregate (Q11),
- group-HAVING-membership join-back (Q18),
- multi-correlated EXISTS / NOT EXISTS rewritten to semi/anti joins (Q21),
- anti join against a predicated fact + global average gate (Q22),
- top-k revenue report over a selective fact predicate (Q10),
- conditional-aggregate share with a broadcast dimension (Q14).

Every query follows the catalog's cross-engine determinism rules
(queries.py module docstring) and carries the scale rationale for the
chosen plan in its docstring. Registered into the same QUERIES/ORACLE
maps as plans.queries via the shared ``register`` decorator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


@register(
    "customer_order_distribution",
    """
    WITH c_orders AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k non-urgent orders,
    including k = 0 — the left-outer-join-then-count-then-redistribute
    pattern.

    Scale shape: the only data-sized shuffle is customer⋈orders on
    custkey (both sides hash-partitioned once); COUNT(o_orderkey)
    counts only matched rows, so the k = 0 customers survive the outer
    join without a second pass. The second groupBy runs on ≤ max-orders
    distinct k values — trivially small no matter the SF. The priority
    predicate is pushed into the orders scan (non-matching rows never
    enter the shuffle).
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("long").alias("c_count"), "custdist")
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "supplier_revenue_share",
    """
    WITH s_rev AS (
        SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(l_suppkey AS BIGINT) AS suppkey, ROUND(rev, 2) AS revenue
    FROM s_rev
    WHERE rev > (SELECT SUM(rev) * 0.0102 FROM s_rev)
    ORDER BY revenue DESC, suppkey
    """,
)
def supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers whose revenue exceeds a fixed fraction
    of GLOBAL revenue — the scalar-subquery-threshold pattern.

    Scale shape: one partial-final aggregate produces the per-supplier
    table (|suppliers| rows); the global total is the SUM of that
    already-reduced table, carried to every row as a broadcast 1-row
    cross join — no second scan of lineitem and no global shuffle of
    anything data-sized. Catalyst cannot cache the CTE across the two
    uses by itself, so the per-supplier aggregate is built once in the
    DataFrame and reused for both the total and the filter.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    s_rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    total = s_rev.agg(F.sum("rev").alias("_total"))
    return (
        s_rev.crossJoin(F.broadcast(total))
        .where(F.col("rev") > F.col("_total") * 0.0102)
        .select(
            F.col("l_suppkey").cast("long").alias("suppkey"),
            F.round("rev", 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "suppkey")
    )


@register(
    "large_volume_customers",
    """
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS sum_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT c_name,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           ROUND(o_totalprice, 2) AS o_totalprice,
           ROUND(sum_qty, 2) AS sum_qty
    FROM big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a HAVING
    threshold, joined back to their customers.

    Scale shape: the HAVING aggregate reduces lineitem to the small
    surviving-order set BEFORE any join — partial aggregation pre-sums
    each task's rows per orderkey, the shuffle carries only (orderkey,
    partial sum), and the filter keeps a sub-percent fraction. The
    surviving set (not the raw fact) then joins orders and customer;
    AQE broadcasts it at runtime, so neither big table re-shuffles.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "waiting_suppliers",
    """
    WITH li AS (SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN li l1 ON s_suppkey = l1.l_suppkey AND l1.l_returnflag = 'R'
    WHERE EXISTS (
        SELECT 1 FROM li l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM li l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
    )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole supplier at fault — lines returned
    ('R') in multi-supplier orders where NO other supplier's line was
    returned. Correlated EXISTS and NOT EXISTS are spelled as left_semi
    and left_anti joins on (orderkey, suppkey≠) — the decorrelated form
    a subquery rewrite produces.

    Scale shape: all three legs are equi-joins on l_orderkey (the
    inequality on suppkey rides along as a post-condition inside the
    same hash join, not a theta join), so the fact shuffles on one key
    and the semi/anti legs reuse that partitioning; semi/anti emit each
    probe row at most once — no duplicate blowup from multi-line
    matches. The supplier dim joins last, against the already-reduced
    per-supplier counts, and broadcasts.
    """
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    supplier = load_table(spark, sf_dir, "supplier")
    l1 = lineitem.where(F.col("l_returnflag") == "R")
    other = lineitem.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    )
    other_r = (
        lineitem.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk"))
    )
    cond = (F.col("l_orderkey") == F.col("_ok")) & (
        F.col("l_suppkey") != F.col("_sk")
    )
    at_fault = (
        l1.join(other, cond, "left_semi")
        .join(other_r, cond, "left_anti")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        at_fault.join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "urgent_averse_rich",
    """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def urgent_averse_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers who never
    placed an urgent order, reported per market segment — global scalar
    average gate + anti join against a predicated fact.

    Scale shape: the average is a 1-row aggregate broadcast into the
    filter (no second customer scan at the Spark level — one cached
    logical subtree, two consumers). The anti join's right side is
    orders pre-filtered to urgent rows only (predicate pushed to the
    scan), cutting the shuffled build side ~5×; the join itself is an
    equi anti join on custkey, AQE-broadcastable when the urgent subset
    is small.
    """
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    rich = customer.crossJoin(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("_avg")
    )
    return (
        rich.join(
            urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "returned_item_report",
    """
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           c_name,
           n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by lost revenue on returned
    items.

    Scale shape: the returnflag filter is pushed into the lineitem scan
    (reads 1/3 of rows, 4 of 11 columns); lineitem⋈orders shuffles on
    orderkey — the one necessary fact-fact exchange — then the
    per-customer aggregate reuses the custkey partitioning from the
    orders join. Nation broadcasts; the final top-20 is
    TakeOrderedAndProject, never a global sort.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    returned = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    return (
        returned.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "promo_revenue_share",
    """
    SELECT CAST(DATE_TRUNC('month', l_shipdate) AS DATE) AS ship_month,
           ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from promotional
    parts — conditional aggregation over a dimension attribute.

    Scale shape: part is a broadcast dim (its only consumed column is
    p_type, pruned at the scan), so the fact never shuffles for the
    join; the month rollup is a partial-final aggregate over ~tens of
    groups. Both engines compute the month via date_trunc on the raw
    timestamp (the catalog's pinned cross-engine date idiom,
    monthly_revenue).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
        )
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct")
        )
        .orderBy("ship_month")
    )
