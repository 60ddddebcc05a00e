"""Round-4 wave 18: robust means, basket projection, survival-shape
fitting, and heavy-tail indexing.

- ``trimmed_mean_prices``: exact 10%-trimmed mean of order totalprice
  per priority — rank-range sums computed from the value-domain
  histogram (per-value clamped overlap with [lo, hi]), never a full
  row sort.
- ``copurchase_pairs``: supplier co-occurrence projection of the
  order->supplier bipartite graph — top-20 supplier pairs by shared
  orders with their Jaccard overlap (basket-bounded pair emission).
- ``exponential_gap_fit``: exponential fit of per-customer order
  interarrival gaps (lambda = 1/mean) with an exact-empirical-CDF
  Kolmogorov-Smirnov distance against the fitted CDF.
- ``hill_tail_index``: Hill estimator of the Pareto tail index over
  the top-50 order values — the standard heavy-tail diagnostic
  (complements degree_powerlaw_fit, which MLEs discrete degrees).

Cross-engine determinism: rank ranges, gap histograms and pair counts
are exact integers; fitted-CDF and Hill log terms are 9/12-dp-rounded
DECIMAL sums; emits are single divisions or fixed expressions.

Reference anchor: SURVEY.md §2.11 metrics + §2.5 aggregation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Exact 10%-trimmed mean per priority from the value-domain histogram
# ---------------------------------------------------------------------------

@register(
    "trimmed_mean_prices",
    """
    WITH vals AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ), hist AS (
        SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM vals GROUP BY grp, v
    ), cum AS (
        SELECT grp, v, c,
               COALESCE(SUM(c) OVER (PARTITION BY grp ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cb,
               SUM(c) OVER (PARTITION BY grp) AS n
        FROM hist
    ), clip AS (
        SELECT grp, n,
               n // 10 AS lo,
               n - n // 10 AS hi,
               v, c, cb,
               GREATEST(CAST(0 AS BIGINT),
                        LEAST(n - n // 10, cb + c) - GREATEST(n // 10, cb))
                   AS keep
        FROM cum
    )
    SELECT grp,
           CAST(ANY_VALUE(n) AS BIGINT) AS n,
           CAST(ANY_VALUE(hi) - ANY_VALUE(lo) AS BIGINT) AS n_kept,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(38,0)) * keep) AS DOUBLE)
                 / CAST(ANY_VALUE(hi) - ANY_VALUE(lo) AS DOUBLE) / 100, 4)
               AS trimmed_mean,
           ROUND(CAST(SUM(CAST(v AS DECIMAL(38,0)) * c) AS DOUBLE)
                 / CAST(ANY_VALUE(n) AS DOUBLE) / 100, 4) AS raw_mean
    FROM clip
    GROUP BY grp
    ORDER BY grp
    """,
)
def trimmed_mean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 10%-trimmed mean of order totalprice per priority (drop
    the lowest and highest n/10 ranks, average the middle 80%) next to
    the raw mean — the robust-location estimate whose gap to the raw
    mean measures tail leverage.

    100 TB shape: the trim is computed on the (group, value) HISTOGRAM
    — per-value clamped overlap with the kept rank range [lo, hi] —
    so nothing ever row-sorts: one histogram aggregate, one cumulative
    window over distinct values per group.  Determinism: ranks,
    overlaps and sums are exact integers/DECIMALs; two single
    divisions at emit."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    vals = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    hist = vals.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcb = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "v",
        "c",
        F.coalesce(F.sum("c").over(wcb), F.lit(0)).alias("cb"),
        F.sum("c").over(wn).alias("n"),
    )
    lo = F.floor(F.col("n") / 10).cast("long")
    hi = F.col("n") - lo
    keep = F.greatest(
        F.lit(0).cast("long"),
        F.least(hi, F.col("cb") + F.col("c")) - F.greatest(lo, F.col("cb")),
    )
    clip = cum.select(
        "grp", "n", lo.alias("lo"), hi.alias("hi"), "v", "c",
        keep.alias("keep"),
    )
    vd = F.col("v").cast("decimal(38,0)")
    return (
        clip.groupBy("grp")
        .agg(
            F.any_value(F.col("n")).cast("long").alias("n"),
            (F.any_value(F.col("hi")) - F.any_value(F.col("lo")))
            .cast("long")
            .alias("n_kept"),
            F.round(
                F.sum(vd * F.col("keep")).cast("double")
                / (
                    F.any_value(F.col("hi")) - F.any_value(F.col("lo"))
                ).cast("double")
                / 100,
                4,
            ).alias("trimmed_mean"),
            F.round(
                F.sum(vd * F.col("c")).cast("double")
                / F.any_value(F.col("n")).cast("double")
                / 100,
                4,
            ).alias("raw_mean"),
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Supplier co-purchase projection with Jaccard overlap
# ---------------------------------------------------------------------------

@register(
    "copurchase_pairs",
    """
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS ok, l_suppkey AS s
        FROM lineitem
        WHERE l_orderkey % 10 = 0
    ), deg AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM baskets GROUP BY s
    ), pairs AS (
        SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS shared
        FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.s < b.s
        GROUP BY a.s, b.s
    )
    SELECT p.s1, p.s2, p.shared,
           d1.d AS orders_s1, d2.d AS orders_s2,
           ROUND(CAST(p.shared AS DOUBLE)
                 / CAST(d1.d + d2.d - p.shared AS DOUBLE), 6) AS jaccard
    FROM pairs p
    JOIN deg d1 ON d1.s = p.s1
    JOIN deg d2 ON d2.s = p.s2
    ORDER BY p.shared DESC, p.s1, p.s2
    LIMIT 20
    """,
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite co-purchase projection: the 20 supplier pairs sharing
    the most orders, with their order-set Jaccard — the 'frequently
    bought together' primitive projected from the order->supplier
    graph.

    100 TB shape: pair emission is the per-basket self-join, bounded
    by (basket size choose 2) per order — never supplier x supplier;
    the degree join is against a dimension-sized table, and the top-20
    is a TakeOrdered with a fixed k.  Determinism: shared/degree
    counts are exact; Jaccard is one division; ordering ties break on
    (s1, s2)."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    # baskets feeds the degree tally and both pair sides; deg joins
    # back twice — unstaged, lineitem was scanned + deduplicated four
    # times.  Two lazy checkpoints -> one scan.
    baskets = (
        lineitem.where(F.col("l_orderkey") % 10 == 0)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        baskets.groupBy("s")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    b = baskets.select(F.col("ok").alias("ok2"), F.col("s").alias("s2"))
    pairs = (
        baskets.join(
            b, (F.col("ok") == F.col("ok2")) & (F.col("s") < F.col("s2"))
        )
        .groupBy(F.col("s").alias("s1"), "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
    )
    d1 = deg.select(F.col("s").alias("k1"), F.col("d").alias("orders_s1"))
    d2 = deg.select(F.col("s").alias("k2"), F.col("d").alias("orders_s2"))
    return (
        pairs.join(F.broadcast(d1), F.col("s1") == F.col("k1"))
        .join(F.broadcast(d2), F.col("s2") == F.col("k2"))
        .select(
            "s1",
            "s2",
            "shared",
            "orders_s1",
            "orders_s2",
            F.round(
                F.col("shared").cast("double")
                / (
                    F.col("orders_s1") + F.col("orders_s2") - F.col("shared")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("shared"), F.asc("s1"), F.asc("s2"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Exponential fit + KS distance of per-customer order interarrival gaps
# ---------------------------------------------------------------------------

@register(
    "exponential_gap_fit",
    """
    WITH ord AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day
        FROM orders
    ), gaps AS (
        SELECT day - LAG(day) OVER (PARTITION BY o_custkey ORDER BY day)
                   AS g
        FROM ord
        QUALIFY g IS NOT NULL AND g > 0
    ), hist AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY g
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c * g) AS BIGINT) AS sg
        FROM hist
    ), cdf AS (
        SELECT g, c,
               SUM(c) OVER (ORDER BY g
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
               t.n, t.sg
        FROM hist CROSS JOIN tot t
    ), dist AS (
        SELECT g, n, sg,
               GREATEST(
                   ABS(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE)
                       - ROUND(1 - EXP(-(CAST(n AS DOUBLE)
                                         / CAST(sg AS DOUBLE)) * g), 9)),
                   ABS(CAST(cum - c AS DOUBLE) / CAST(n AS DOUBLE)
                       - ROUND(1 - EXP(-(CAST(n AS DOUBLE)
                                         / CAST(sg AS DOUBLE)) * g), 9)))
                   AS d
        FROM cdf
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_gaps,
           ROUND(CAST(ANY_VALUE(n) AS DOUBLE) / CAST(ANY_VALUE(sg) AS DOUBLE),
                 9) AS lambda_per_day,
           ROUND(CAST(ANY_VALUE(sg) AS DOUBLE) / CAST(ANY_VALUE(n) AS DOUBLE),
                 4) AS mean_gap_days,
           ROUND(MAX(d), 6) AS ks_distance
    FROM dist
    """,
)
def exponential_gap_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential fit of per-customer order interarrival gaps
    (lambda = 1/mean gap, the MLE) with the Kolmogorov-Smirnov
    distance between the exact empirical CDF and the fitted
    1 - exp(-lambda g) — 'is purchasing memoryless?', the standard
    renewal-process screen.

    100 TB shape: gaps come from a per-customer window (keyed, bounded
    per key); the KS scan runs over the integer GAP-VALUE histogram
    (domain-bounded by the calendar), evaluating both CDF step sides.
    Determinism: counts exact; the fitted CDF is rounded to 9 dp
    before comparison; lambda and the mean are single divisions."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    ordd = orders.select(
        "o_custkey",
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day"),
    )
    wc = Window.partitionBy("o_custkey").orderBy("day")
    gaps = (
        ordd.withColumn("g", F.col("day") - F.lag("day").over(wc))
        .filter(F.col("g").isNotNull() & (F.col("g") > 0))
        .select("g")
    )
    # hist feeds both the totals and the CDF walk; staged once -> one
    # per-customer window + histogram over the fact instead of two
    hist = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    tot = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("g")).cast("long").alias("sg"),
    )
    wg = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    cdf = hist.crossJoin(F.broadcast(tot)).select(
        "g", "c", F.sum("c").over(wg).alias("cum"), "n", "sg"
    )
    lam = F.col("n").cast("double") / F.col("sg").cast("double")
    fitted = F.round(1 - F.exp(-lam * F.col("g")), 9)
    d = F.greatest(
        F.abs(F.col("cum").cast("double") / F.col("n").cast("double") - fitted),
        F.abs(
            (F.col("cum") - F.col("c")).cast("double")
            / F.col("n").cast("double")
            - fitted
        ),
    )
    dist = cdf.select("g", "n", "sg", d.alias("d"))
    return dist.agg(
        F.any_value(F.col("n")).cast("long").alias("n_gaps"),
        F.round(
            F.any_value(F.col("n")).cast("double")
            / F.any_value(F.col("sg")).cast("double"),
            9,
        ).alias("lambda_per_day"),
        F.round(
            F.any_value(F.col("sg")).cast("double")
            / F.any_value(F.col("n")).cast("double"),
            4,
        ).alias("mean_gap_days"),
        F.round(F.max("d"), 6).alias("ks_distance"),
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator over the top-50 order values
# ---------------------------------------------------------------------------

@register(
    "hill_tail_index",
    """
    WITH vals AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
               o_orderkey
        FROM orders
    ), top AS (
        SELECT v, ROW_NUMBER() OVER (ORDER BY v DESC, o_orderkey) AS rn
        FROM vals
        QUALIFY rn <= 51
    ), thresh AS (
        SELECT CAST(MAX(CASE WHEN rn = 51 THEN v END) AS BIGINT) AS vk
        FROM top
    ), terms AS (
        SELECT CAST(ROUND(LN(CAST(t.v AS DOUBLE) / CAST(h.vk AS DOUBLE)), 12)
                    AS DECIMAL(28,12)) AS lr,
               h.vk
        FROM top t CROSS JOIN thresh h
        WHERE t.rn <= 50
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k_top,
           ROUND(CAST(ANY_VALUE(vk) AS DOUBLE) / 100, 2) AS threshold_value,
           ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(lr) AS DOUBLE), 6)
               AS hill_alpha
    FROM terms
    """,
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the Pareto tail index over the 50 largest
    order values: alpha = k / sum ln(x_i / x_(k+1)) — small alpha =
    heavy revenue tail (whales dominate); the continuous-value
    complement of degree_powerlaw_fit's discrete MLE.

    100 TB shape: the only work at corpus size is a fixed-k
    TakeOrdered (k = 51 — constant, not data-proportional, so the
    single-reducer top-k is safe; the conformal rank-0.9n lesson does
    NOT apply); 50 log terms follow.  Determinism: the top set and
    threshold are exact (value, orderkey) order statistics; log ratios
    round to 12 dp into a DECIMAL sum; alpha is one division."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
        "o_orderkey",
    )
    # fixed-k TakeOrderedAndProject first (safe single-reducer: k = 51
    # is constant), THEN the row_number window over only those 51 rows
    top51 = vals.orderBy(F.desc("v"), F.asc("o_orderkey")).limit(51)
    top = top51.select(
        "v",
        F.row_number()
        .over(Window.orderBy(F.desc("v"), F.asc("o_orderkey")))
        .alias("rn"),
        # top feeds both the threshold probe and the term pass; staged
        # once -> one fact TakeOrdered instead of two
    ).localCheckpoint(eager=False)
    thresh = top.agg(
        F.max(F.when(F.col("rn") == 51, F.col("v"))).alias("vk")
    )
    terms = (
        top.filter(F.col("rn") <= 50)
        .crossJoin(F.broadcast(thresh))
        .select(
            F.round(
                F.log(F.col("v").cast("double") / F.col("vk").cast("double")),
                12,
            )
            .cast("decimal(28,12)")
            .alias("lr"),
            "vk",
        )
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("k_top"),
        F.round(
            F.any_value(F.col("vk")).cast("double") / 100, 2
        ).alias("threshold_value"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("lr").cast("double"), 6
        ).alias("hill_alpha"),
    )
