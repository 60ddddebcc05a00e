"""Round-4 wave 32: distribution-distance and inequality battery —
the remaining drift/divergence measures next to PSI / Hellinger /
Wasserstein / KS.

- ``jensen_shannon_drift``: Jensen-Shannon divergence (and distance)
  between the two halves' price distributions over the fixed $1000
  buckets — the symmetric, always-finite KL everybody actually ships.
- ``cramer_von_mises_binned``: the binned two-sample Cramer-von Mises
  statistic sum_b w_b (F_b - G_b)^2 * nm/(n+m)^2 with the ECDF
  difference cleared to exact integers — the whole-curve companion of
  the KS max-gap.
- ``mood_median_test``: Mood's median test — the 2x2 chi-square of
  above/not-above the POOLED exact median between halves, with the
  continuity-free N(ad-bc)^2 form.
- ``atkinson_index_binned``: Atkinson inequality of customer spend
  (binned to $10): A(1) = 1 - geomean/mean and A(0.5) =
  1 - (mean sqrt)^2/mean — the welfare-theoretic siblings of Gini /
  Theil / Hoover already in the catalog.

Cross-engine determinism: bucket tallies and cumulative counts are
exact integers; the CvM and Mood statistics are single divisions of
exact DECIMAL(38) products; JSD/Atkinson transcendental terms round
to 12 dp per BUCKET (bounded count) and accumulate as exact DECIMALs.

Reference anchor: SURVEY.md §2.11 metrics; extends
hellinger_price_drift / psi_price_drift / wasserstein_price_drift /
ks_two_sample_price / gini_customer_spend / theil_index / hoover_index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

_HALVED_SQL = """
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS half
        FROM orders
"""


def _halved(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    return orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("half"),
    )


def _bucketed(df: DataFrame, width: int) -> DataFrame:
    return df.groupBy(
        F.floor(F.col("cents") / width).cast("long").alias("bucket")
    ).agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between halves
# ---------------------------------------------------------------------------

@register(
    "jensen_shannon_drift",
    f"""
    WITH o AS ({_HALVED_SQL}),
    b AS (
        SELECT cents // 100000 AS bucket,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS c2
        FROM o GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM b
    ), terms AS (
        SELECT CASE WHEN c1 > 0 THEN
                   CAST(ROUND(0.5 * (CAST(c1 AS DOUBLE) / n1)
                        * LN((CAST(c1 AS DOUBLE) / n1)
                             / (0.5 * CAST(c1 AS DOUBLE) / n1
                                + 0.5 * CAST(c2 AS DOUBLE) / n2)), 12)
                        AS DECIMAL(24,12))
                   ELSE CAST(0 AS DECIMAL(24,12)) END AS t1,
               CASE WHEN c2 > 0 THEN
                   CAST(ROUND(0.5 * (CAST(c2 AS DOUBLE) / n2)
                        * LN((CAST(c2 AS DOUBLE) / n2)
                             / (0.5 * CAST(c1 AS DOUBLE) / n1
                                + 0.5 * CAST(c2 AS DOUBLE) / n2)), 12)
                        AS DECIMAL(24,12))
                   ELSE CAST(0 AS DECIMAL(24,12)) END AS t2
        FROM b, tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(CAST(SUM(t1) + SUM(t2) AS DOUBLE), 6) AS jsd_nats,
           ROUND(CAST(SUM(t1) + SUM(t2) AS DOUBLE)
                 / LN(2), 6) AS jsd_bits,
           ROUND(SQRT(GREATEST(CAST(SUM(t1) + SUM(t2) AS DOUBLE)
                               / LN(2), 0)), 6) AS js_distance
    FROM terms
    """,
)
def jensen_shannon_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the even/odd-half price
    distributions over fixed $1000 buckets, in nats and bits, plus
    the JS distance sqrt(JSD_bits) — symmetric, always finite (every
    zero-bucket term is exactly 0), metric when square-rooted: the
    production-safe drift divergence.

    100 TB shape: one bounded-bucket tally, one reduce.  Determinism:
    per-bucket terms round to 12 dp into exact DECIMAL sums; the
    emits are fixed expressions (hellinger_price_drift's pattern)."""
    # b feeds both the totals and the term pass; staged once -> one
    # bucket tally over the fact instead of two
    b = _bucketed(_halved(spark, sf_dir), 100_000).localCheckpoint(eager=False)
    tot = b.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    j = b.crossJoin(F.broadcast(tot))
    p = F.col("c1").cast("double") / F.col("n1")
    q = F.col("c2").cast("double") / F.col("n2")
    m = 0.5 * p + 0.5 * q
    t1 = F.when(
        F.col("c1") > 0,
        F.round(0.5 * p * F.log(p / m), 12).cast("decimal(24,12)"),
    ).otherwise(F.lit(0).cast("decimal(24,12)"))
    t2 = F.when(
        F.col("c2") > 0,
        F.round(0.5 * q * F.log(q / m), 12).cast("decimal(24,12)"),
    ).otherwise(F.lit(0).cast("decimal(24,12)"))
    terms = j.select(t1.alias("t1"), t2.alias("t2"))
    ln2 = 0.6931471805599453
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        (F.sum("t1") + F.sum("t2")).cast("double").alias("jsd"),
    )
    return agg.select(
        "n_buckets",
        F.round(F.col("jsd"), 6).alias("jsd_nats"),
        F.round(F.col("jsd") / F.lit(ln2), 6).alias("jsd_bits"),
        F.round(
            F.sqrt(F.greatest(F.col("jsd") / F.lit(ln2), F.lit(0.0))), 6
        ).alias("js_distance"),
    )


# ---------------------------------------------------------------------------
# Binned two-sample Cramer-von Mises
# ---------------------------------------------------------------------------

@register(
    "cramer_von_mises_binned",
    f"""
    WITH o AS ({_HALVED_SQL}),
    b AS (
        SELECT cents // 10000 AS bucket,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS c2
        FROM o GROUP BY 1
    ), cum AS (
        SELECT bucket, c1 + c2 AS w,
               CAST(SUM(c1) OVER (ORDER BY bucket) AS DECIMAL(38,0)) AS f1,
               CAST(SUM(c2) OVER (ORDER BY bucket) AS DECIMAL(38,0)) AS f2
        FROM b
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n, CAST(SUM(c2) AS BIGINT) AS m
        FROM b
    ), s AS (
        SELECT SUM(CAST(w AS DECIMAL(38,0))
                   * (f1 * (SELECT m FROM tot) - f2 * (SELECT n FROM tot))
                   * (f1 * (SELECT m FROM tot) - f2 * (SELECT n FROM tot)))
                   AS u
        FROM cum
    )
    SELECT (SELECT n FROM tot) AS n_even, (SELECT m FROM tot) AS n_odd,
           ROUND(CAST(u AS DOUBLE)
                 / (CAST((SELECT n FROM tot) AS DOUBLE)
                    * (SELECT m FROM tot)
                    * POWER(CAST((SELECT n FROM tot) AS DOUBLE)
                            + (SELECT m FROM tot), 2)
                    * (SELECT n FROM tot) * (SELECT m FROM tot)), 8)
               AS cvm_stat
    FROM s
    """,
)
def cramer_von_mises_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Cramer-von Mises statistic between the halves'
    price distributions ($100 buckets): T = nm/(n+m)^2 *
    sum_b w_b (F1_b - F2_b)^2 with the ECDF difference cleared to the
    exact integer (c1m - c2n) — the integrated-squared-gap companion
    of ks_two_sample_price's max-gap.

    100 TB shape: bounded-bucket tally, one cumulative window over
    buckets (calendar-of-prices-sized), one reduce.  Determinism: the
    entire statistic is one division of exact DECIMAL(38) integer
    products."""
    b = _bucketed(_halved(spark, sf_dir), 10_000).localCheckpoint(eager=True)
    tot = b.agg(
        F.sum("c1").cast("long").alias("n"),
        F.sum("c2").cast("long").alias("m"),
    )
    w = Window.orderBy("bucket")
    cum = b.select(
        "bucket",
        (F.col("c1") + F.col("c2")).alias("w"),
        F.sum("c1").over(w).cast("decimal(38,0)").alias("f1"),
        F.sum("c2").over(w).cast("decimal(38,0)").alias("f2"),
    )
    j = cum.crossJoin(F.broadcast(tot))
    diff = F.col("f1") * F.col("m") - F.col("f2") * F.col("n")
    s = j.agg(
        F.sum(F.col("w").cast("decimal(38,0)") * diff * diff).alias("u"),
        F.max("n").alias("n"),
        F.max("m").alias("m"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    return s.select(
        F.col("n").alias("n_even"),
        F.col("m").alias("n_odd"),
        F.round(
            F.col("u").cast("double")
            / (nd * md * F.pow(nd + md, 2) * nd * md),
            8,
        ).alias("cvm_stat"),
    )


# ---------------------------------------------------------------------------
# Mood's median test
# ---------------------------------------------------------------------------

@register(
    "mood_median_test",
    f"""
    WITH o AS ({_HALVED_SQL}),
    k AS (
        SELECT (COUNT(*) + 1) // 2 AS k FROM o
    ), med AS (
        SELECT cents AS med_c
        FROM (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM o)
        JOIN k ON rn = k.k
    ), cls AS (
        SELECT half, CASE WHEN cents > (SELECT med_c FROM med)
                          THEN 1 ELSE 0 END AS above
        FROM o
    ), tab AS (
        SELECT CAST(SUM(CASE WHEN half = 0 AND above = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(SUM(CASE WHEN half = 0 AND above = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN half = 1 AND above = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c,
               CAST(SUM(CASE WHEN half = 1 AND above = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d
        FROM cls
    )
    SELECT a AS even_above, b AS even_below, c AS odd_above, d AS odd_below,
           ROUND(CAST((a + b + c + d) AS DOUBLE)
                 * POWER(CAST(CAST(a AS DECIMAL(38,0)) * d
                              - CAST(b AS DECIMAL(38,0)) * c AS DOUBLE), 2)
                 / (CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d)
                         * (a + c) * (b + d) AS DOUBLE)), 4) AS chi2_stat
    FROM tab
    """,
)
def mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test between the halves: classify every order as
    above / not-above the POOLED exact median (lower-median order
    statistic), then the 2x2 chi-square in the N(ad-bc)^2 /
    ((a+b)(c+d)(a+c)(b+d)) form — the assumption-free 'did the median
    move?' test (companion of mann_whitney_halves, which tests the
    whole-distribution shift).

    100 TB shape: the pooled median comes from the two-pass histogram
    selection (operators/stats.exact_kth_smallest_value — no global
    sort); the contingency tally is one reduce.  Determinism: the
    median is a selected exact integer; the chi-square is one division
    of exact DECIMAL products."""
    from federated_gcn_spark.operators.stats import exact_kth_smallest_value

    o = _halved(spark, sf_dir).localCheckpoint(eager=True)
    n_total = o.count()
    med = exact_kth_smallest_value(o, "cents", (n_total + 1) // 2)
    med_c = int(med)
    cls = o.select(
        "half", F.when(F.col("cents") > med_c, 1).otherwise(0).alias("above")
    )
    tab = cls.agg(
        F.sum(F.when((F.col("half") == 0) & (F.col("above") == 1), 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when((F.col("half") == 0) & (F.col("above") == 0), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when((F.col("half") == 1) & (F.col("above") == 1), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(F.when((F.col("half") == 1) & (F.col("above") == 0), 1).otherwise(0))
        .cast("long")
        .alias("d"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    chi2 = (
        (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
        * F.pow((dec("a") * F.col("d") - dec("b") * F.col("c")).cast("double"), 2)
        / (
            (
                (F.col("a") + F.col("b")).cast("decimal(38,0)")
                * (F.col("c") + F.col("d"))
                * (F.col("a") + F.col("c"))
                * (F.col("b") + F.col("d"))
            ).cast("double")
        )
    )
    return tab.select(
        F.col("a").alias("even_above"),
        F.col("b").alias("even_below"),
        F.col("c").alias("odd_above"),
        F.col("d").alias("odd_below"),
        F.round(chi2, 4).alias("chi2_stat"),
    )


# ---------------------------------------------------------------------------
# Binned Atkinson inequality index
# ---------------------------------------------------------------------------

@register(
    "atkinson_index_binned",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ), b AS (
        SELECT cents // 1000 AS bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM spend GROUP BY 1
    ), x AS (
        SELECT c, (bucket * 1000 + 500) / 100.0 AS xv FROM b
    ), agg AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               SUM(CAST(ROUND(c * xv, 2) AS DECIMAL(38,2))) AS sx,
               SUM(CAST(ROUND(c * LN(xv), 9) AS DECIMAL(38,9))) AS slnx,
               SUM(CAST(ROUND(c * SQRT(xv), 6) AS DECIMAL(38,6))) AS ssqx
        FROM x
    )
    SELECT n AS n_customers,
           ROUND(CAST(sx AS DOUBLE) / n, 2) AS mean_spend_eur,
           ROUND(1 - EXP(CAST(slnx AS DOUBLE) / n)
                     / (CAST(sx AS DOUBLE) / n), 6) AS atkinson_eps1,
           ROUND(1 - POWER(CAST(ssqx AS DOUBLE) / n, 2)
                     / (CAST(sx AS DOUBLE) / n), 6) AS atkinson_eps05
    FROM agg
    """,
)
def atkinson_index_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality indices of customer spend, on the $10-bucket
    midpoint histogram: A(eps=1) = 1 - geometric_mean/mean and
    A(eps=0.5) = 1 - (mean of sqrt)^2/mean — the welfare-weighted
    inequality family (Atkinson 1970) completing Gini/Theil/Hoover;
    eps picks how much the bottom of the distribution matters.

    100 TB shape: per-customer spend reduce, then a bounded bucket
    histogram; all transcendentals run per BUCKET.  Determinism:
    bucket midpoints are exact rationals; c*ln(x)/c*sqrt(x)/c*x terms
    round to 9/6/2 dp into exact DECIMAL sums; emits are fixed
    expressions."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    )
    b = spend.groupBy(
        F.floor(F.col("cents") / 1000).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    xv = (F.col("bucket") * 1000 + 500) / 100.0
    agg = b.select("c", xv.alias("xv")).agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.round(F.col("c") * F.col("xv"), 2).cast("decimal(38,2)")).alias(
            "sx"
        ),
        F.sum(
            F.round(F.col("c") * F.log(F.col("xv")), 9).cast("decimal(38,9)")
        ).alias("slnx"),
        F.sum(
            F.round(F.col("c") * F.sqrt(F.col("xv")), 6).cast("decimal(38,6)")
        ).alias("ssqx"),
    )
    mean = F.col("sx").cast("double") / F.col("n")
    return agg.select(
        F.col("n").alias("n_customers"),
        F.round(mean, 2).alias("mean_spend_eur"),
        F.round(
            1 - F.exp(F.col("slnx").cast("double") / F.col("n")) / mean, 6
        ).alias("atkinson_eps1"),
        F.round(
            1 - F.pow(F.col("ssqx").cast("double") / F.col("n"), 2) / mean, 6
        ).alias("atkinson_eps05"),
    )
