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
    # Catalyst does NOT dedup the two consumers' subtrees by itself;
    # the lazy checkpoint is what makes the reuse real (one fact
    # aggregate instead of two)
    s_rev = lineitem.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    ).localCheckpoint(eager=False)
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
    # The 3-column fact projection feeds all three legs (semi, anti,
    # probe); one lazy checkpoint -> one scan instead of three.
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    ).localCheckpoint(eager=False)
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


@register(
    "nation_volume_trade",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS volume
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_3', 'NATION_9')
      AND n2.n_name IN ('NATION_3', 'NATION_9')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def nation_volume_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year —
    the same dimension (nation) joined twice under different roles.

    Scale shape: both nation legs broadcast (25 rows each), the
    supplier dim broadcasts, and the nation filters REDUCE the fact
    before the one lineitem⋈orders shuffle: the supplier-side nation
    predicate reaches the lineitem scan through the broadcast join, so
    only ~2/25 of lineitem enters the exchange.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("_n1k"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin("NATION_3", "NATION_9"))
    n2 = nation.select(
        F.col("n_nationkey").alias("_n2k"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin("NATION_3", "NATION_9"))
    return (
        li.join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_n1k"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_n2k"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "returnflag_priority_counts",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional priority counts after a fact-fact
    join — the CASE-inside-SUM pivot over a joined attribute.

    Scale shape: the one lineitem⋈orders shuffle on orderkey carries
    only (orderkey, returnflag) vs (orderkey, priority) — two pruned
    columns each — then a 3-group partial-final aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "brand_supplier_distribution",
    """
    SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    LIMIT 40
    """,
)
def brand_supplier_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers serve each
    (brand, size), excluding a complaint list — NOT IN spelled as a
    broadcast anti join.

    Scale shape: the exclusion list is a filtered dim (broadcast anti
    join before anything widens); part broadcasts into the fact; the
    count-distinct expands to the standard two-phase aggregate on
    (group, suppkey). Top-40 is TakeOrdered with full tiebreak.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
                "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
        .limit(40)
    )


@register(
    "small_quantity_revenue",
    """
    WITH pa AS (
        SELECT l_partkey AS pk, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_weekly_loss
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pa ON pa.pk = l_partkey
    WHERE p_type = 'SMALL' AND l_quantity < 0.5 * avg_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity orders
    of SMALL parts — the correlated per-part AVG subquery in its
    decorrelated form (per-part aggregate joined back on partkey).

    Scale shape: the per-part average is a partial-final aggregate of
    the fact reduced to |parts| rows; the join back is partkey⋈partkey
    (the aggregate side AQE-broadcastable); the part dim filter rides a
    broadcast. One fact shuffle total.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    # only SMALL partkeys survive the join back, so pre-filter the
    # aggregate side with the same broadcast dim (exact-equivalent:
    # per-part averages keep all their rows) — the aggregate shuffle
    # shrinks by the part-filter selectivity
    pa = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias(
                "avg_weekly_loss"
            ),
        )
    )


@register(
    "disjunctive_promo_revenue",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#6' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 20 AND 40)
    """,
)
def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides — the
    disjunctive-predicate stress test.

    Scale shape: Catalyst factors the common constraints out of the
    disjunction and pushes them to the scans (p_brand IN (…) reaches
    the part scan; l_quantity BETWEEN 1 AND 40 reaches lineitem), so
    neither side scans rows that no disjunct can accept; the residual
    OR evaluates inside the broadcast hash join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#6")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


_GROUPING_SETS_SQL = """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    ORDER BY returnflag, linestatus
    """


@register("grouping_sets_lineitem", _GROUPING_SETS_SQL)
def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through the SQL front door (catalog.run_sql): the
    same SQL text runs on both engines — the third member of the
    rollup/cube family, with an explicit set list instead of the
    implied hierarchies. Spark expands the sets in ONE pass over the
    scan (partial aggregates per set, a single exchange), not one scan
    per set."""
    from federated_gcn_spark.catalog import run_sql

    return run_sql(spark, sf_dir, _GROUPING_SETS_SQL)


@register(
    "price_histogram",
    """
    WITH b AS (
        SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 11)
                   AS bucket
        FROM orders
    )
    SELECT bucket,
           CAST(bucket * 50000 AS BIGINT) AS lo,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals (fixed 50k buckets, top
    bucket open-ended) — the profiling primitive behind range
    partitioning choices and skew diagnosis. One partial-final
    aggregate over a 1-column scan; bucket count is fixed, so the
    exchange carries ≤ 12 rows per task no matter the SF."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000.0).cast("long"), F.lit(11)
    ).alias("bucket")
    return (
        orders.select(bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .select(
            "bucket",
            (F.col("bucket") * 50000).cast("long").alias("lo"),
            "n_orders",
        )
        .orderBy("bucket")
    )


@register(
    "scd2_user_states",
    """
    WITH t AS (
        SELECT user_id, event_type,
               epoch_ns(ts) // 1000000000 AS sec, event_id
        FROM events WHERE user_id < 10
    ), l AS (
        SELECT user_id, event_type, sec, event_id,
               CASE WHEN LAG(event_type) OVER
                        (PARTITION BY user_id ORDER BY sec, event_id)
                    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        FROM t
    ), g AS (
        SELECT user_id, event_type, sec,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY sec, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM l
    ), i AS (
        SELECT user_id, MIN(event_type) AS state, MIN(sec) AS valid_from
        FROM g GROUP BY user_id, grp
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, state,
           CAST(valid_from AS BIGINT) AS valid_from,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
                AS BIGINT) AS valid_to
    FROM i
    ORDER BY user_id, valid_from
    """,
)
def scd2_user_states(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build (operators/scd.py): each user's
    event-type history collapsed to [valid_from, valid_to) state
    intervals via the gaps-and-islands idiom — LAG transition flags, a
    running-SUM island number, per-island MIN, LEAD for the closing
    edge.  Point-in-time lookups against the result are the as-of join
    (asof_latest_update).  All windows are key-partitioned (scd.py
    docstring has the scale analysis)."""
    from federated_gcn_spark.operators.scd import build_scd2
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events")
    t = events.where(F.col("user_id") < 10).select(
        "user_id",
        "event_type",
        _event_epoch_sec(events).alias("sec"),
        "event_id",
    )
    return (
        build_scd2(t, "user_id", "event_type", "sec", "event_id")
        .select(
            F.col("user_id").cast("long"),
            "state",
            F.col("valid_from").cast("long"),
            F.col("valid_to").cast("long"),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "exact_order_statistics",
    """
    WITH n AS (SELECT COUNT(*) AS n FROM lineitem)
    SELECT (SELECT CAST(n AS BIGINT) FROM n) AS n_rows,
           (SELECT l_extendedprice FROM lineitem ORDER BY l_extendedprice
            LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM n)) AS median_price,
           (SELECT l_extendedprice FROM lineitem ORDER BY l_extendedprice
            LIMIT 1 OFFSET (SELECT (99 * n + 99) // 100 - 1 FROM n))
               AS p99_price
    """,
)
def exact_order_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median and p99 of l_extendedprice via two-pass histogram
    selection (operators/stats.py:exact_kth_smallest_value) — the
    order-statistic answer percentile_approx only approximates, at two
    scans + one micro-sort instead of a global sort.  The result is an
    actual data value, so the DuckDB ORDER-BY-OFFSET oracle matches it
    exactly.  quantity_percentiles remains the one-pass approximate
    path; this is the exactness anchor for selection machinery."""
    from federated_gcn_spark.operators.stats import exact_quantile_values

    lineitem = load_table(spark, sf_dir, "lineitem")
    n = lineitem.count()
    k_med = (n + 1) // 2
    k_p99 = (99 * n + 99) // 100  # ceil, integer-only
    # one shared two-pass selection for both ranks (identical values;
    # the sequential per-k spelling paid twice the driver jobs)
    cuts = exact_quantile_values(lineitem, "l_extendedprice", [k_med, k_p99])
    med, p99 = cuts[k_med], cuts[k_p99]
    return spark.createDataFrame(
        [(n, float(med), float(p99))],
        "n_rows long, median_price double, p99_price double",
    )


@register(
    "exact_group_medians",
    """
    WITH r AS (
        SELECT l_returnflag AS flag, l_extendedprice AS x FROM lineitem
    ), k AS (
        SELECT flag, (COUNT(*) + 1) // 2 AS k FROM r GROUP BY flag
    ), o AS (
        SELECT flag, x, ROW_NUMBER() OVER (PARTITION BY flag ORDER BY x) AS rn
        FROM r
    )
    SELECT o.flag AS l_returnflag, x AS median
    FROM o JOIN k USING (flag) WHERE rn = k.k
    ORDER BY l_returnflag
    """,
)
def exact_group_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-returnflag median price via the grouped two-pass
    histogram selection (operators/stats.py:exact_group_median) — the
    per-group variant of exact_order_statistics: one (group, bucket)
    histogram pass, driver boundary walk, then a window sort over ONLY
    the boundary buckets (~1/4096 of each group).  The oracle's
    ROW_NUMBER spelling sorts every group fully — exactly the plan this
    operator exists to avoid at scale; the VALUES are identical."""
    from federated_gcn_spark.operators.stats import exact_group_median

    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        exact_group_median(lineitem, "l_returnflag", "l_extendedprice")
        .orderBy("l_returnflag")
    )


_PRICE_BANDS = [
    ("nano", 0.0, 500.0),
    ("small", 500.0, 2000.0),
    ("mid", 2000.0, 10000.0),
    ("large", 10000.0, 50000.0),
    ("jumbo", 50000.0, 1e12),
]


@register(
    "price_band_revenue",
    f"""
    WITH bands(tier, lo, hi) AS (
        VALUES {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _PRICE_BANDS)}
    )
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN bands
      ON l_extendedprice >= lo AND l_extendedprice < hi
    GROUP BY tier
    ORDER BY tier
    """,
)
def price_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-table lookup: revenue per price tier via the bucket-aligned
    banded range join (operators/rangejoin.py) — the interval
    containment join rewritten as explode-to-buckets + EQUI join +
    residual filter, so a million-band table joins with a shuffle
    instead of a nested loop.  The oracle states the same join as a raw
    BETWEEN (fine for DuckDB's small input; the equi rewrite is the
    100 TB spelling of the identical relation)."""
    from federated_gcn_spark.operators.rangejoin import band_range_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_PRICE_BANDS, "tier string, lo double, hi double")
    joined = band_range_join(
        lineitem, bands, "l_extendedprice", bucket_width=500.0
    )
    return (
        joined.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("tier")
    )


@register(
    "ohlc_daily",
    """
    WITH t AS (
        SELECT event_type, epoch_ns(ts) // 1000000000 AS sec, event_id, value
        FROM events
    ), r AS (
        SELECT event_type, sec // 86400 AS day, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, sec // 86400
                                  ORDER BY sec, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, sec // 86400
                                  ORDER BY sec DESC, event_id DESC) AS rn_z
        FROM t
    )
    SELECT event_type, CAST(day AS BIGINT) AS day,
           ROUND(MIN(CASE WHEN rn_a = 1 THEN value END), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(MIN(CASE WHEN rn_z = 1 THEN value END), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY event_type, day
    ORDER BY event_type, day
    """,
)
def ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series downsampling to daily OHLC candles per event type —
    the first/last-in-group pattern done as MIN_BY/MAX_BY AGGREGATES
    with a unique (sec, event_id) tiebreak: map-side partial combine,
    no per-group sort, unlike the window spelling the oracle uses
    (equivalent values under a total order; the aggregate is the plan
    that scales — a window sorts every group's full history)."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events")
    t = events.select(
        "event_type",
        _event_epoch_sec(events).alias("sec"),
        "event_id",
        "value",
    ).withColumn("day", F.expr("sec div 86400"))
    order = F.struct(F.col("sec"), F.col("event_id"))
    return (
        t.groupBy("event_type", F.col("day").cast("long").alias("day"))
        .agg(
            F.round(F.min_by("value", order), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", order), 6).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "part_skyline",
    """
    SELECT CAST(p_partkey AS BIGINT) AS partkey, p_name,
           ROUND(p_retailprice, 2) AS price, CAST(p_size AS BIGINT) AS size
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice >= a.p_retailprice AND b.p_size <= a.p_size
          AND (b.p_retailprice > a.p_retailprice OR b.p_size < a.p_size)
    )
    ORDER BY partkey
    """,
)
def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts: maximize retail price, minimize size —
    nobody strictly better on one criterion without being worse on the
    other.  Runs the two-phase distributed skyline
    (operators/skyline.py: per-partition Arrow dominance scan, then a
    broadcast anti-join over the shrunken candidate set); the oracle is
    the textbook NOT EXISTS spelling over the full table — identical
    set, quadratic plan DuckDB can afford at this size."""
    from federated_gcn_spark.operators.skyline import skyline

    part = load_table(spark, sf_dir, "part")
    return (
        skyline(
            part,
            [("p_retailprice", "max"), ("p_size", "min")],
            key_col="p_partkey",
        )
        .select(
            F.col("p_partkey").cast("long").alias("partkey"),
            "p_name",
            F.round("p_retailprice", 2).alias("price"),
            F.col("p_size").cast("long").alias("size"),
        )
        .orderBy("partkey")
    )
