"""Round-4 wave 23: extreme-value fitting, overdispersion, and the
Robin Hood index.

- ``gumbel_extreme_fit``: method-of-moments Gumbel fit to the monthly
  block maxima of daily revenue (mu = m - gamma*beta, beta =
  s*sqrt(6)/pi) plus the fitted exceedance probability of the
  all-time record — textbook extreme-value analysis on block maxima.
- ``dispersion_index``: variance-to-mean ratio of daily order counts
  with the chi-square dispersion statistic (n-1)*VMR — the screen for
  Poisson over/under-dispersion (clustered vs regular arrivals).
- ``hoover_index``: Hoover / Robin Hood inequality index of customer
  spend per nation — the share of total spend that would have to move
  to equalize everyone; numerator sum |n*x - S| is an EXACT integer.

Cross-engine determinism: block maxima, power sums and |n*x - S|
totals are exact integers/DECIMALs; Gumbel constants are 12-dp
literals; each emitted value is a fixed expression (EXP/SQRT of
identical doubles).

Reference anchor: SURVEY.md §2.11 metrics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

_GAMMA = "CAST('0.577215664902' AS DOUBLE)"   # Euler-Mascheroni, 12 dp
_SQRT6_PI = "CAST('0.779696801234' AS DOUBLE)"  # sqrt(6)/pi, 12 dp


# ---------------------------------------------------------------------------
# Gumbel fit to monthly maxima of daily revenue
# ---------------------------------------------------------------------------

@register(
    "gumbel_extreme_fit",
    f"""
    WITH daily AS (
        SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1, 2
    ), maxima AS (
        SELECT month, CAST(MAX(rev_c) AS BIGINT) AS mx
        FROM daily GROUP BY month
    ), mo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mx) AS BIGINT) AS s,
               SUM(CAST(mx AS DECIMAL(38,0)) * mx) AS q,
               CAST(MAX(mx) AS BIGINT) AS record
        FROM maxima
    ), fit AS (
        SELECT n, record,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
               SQRT(CAST(n * q - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   AS sd
        FROM mo
    )
    SELECT n AS n_blocks,
           ROUND(CAST(record AS DOUBLE) / 100, 2) AS record_revenue,
           ROUND((m - {_GAMMA} * (sd * {_SQRT6_PI})) / 100, 4) AS gumbel_mu,
           ROUND(sd * {_SQRT6_PI} / 100, 4) AS gumbel_beta,
           ROUND(1 - EXP(-EXP(-(CAST(record AS DOUBLE)
                                - (m - {_GAMMA} * (sd * {_SQRT6_PI})))
                              / (sd * {_SQRT6_PI}))), 6)
               AS p_exceed_record
    FROM fit
    """,
)
def gumbel_extreme_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Method-of-moments Gumbel fit to monthly block maxima of daily
    revenue: beta = s*sqrt(6)/pi, mu = mean - gamma*beta, and the
    fitted probability that a future month's maximum exceeds the
    all-time record — classical extreme-value analysis (the EV1 limit
    for light-tailed maxima).

    100 TB shape: the corpus reduces to (month, day) then 80ish block
    maxima; everything after is scalar.  Determinism: maxima/moments
    are exact integers/DECIMALs; gamma and sqrt(6)/pi are 12-dp
    literals; the emit is one fixed expression with sample-sd
    (n-1 denominator)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    maxima = daily.groupBy("month").agg(F.max("rev_c").alias("mx"))
    mxd = F.col("mx").cast("decimal(38,0)")
    mo = maxima.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").alias("s"),
        F.sum(mxd * F.col("mx")).alias("q"),
        F.max("mx").alias("record"),
    )
    m = F.col("s").cast("double") / F.col("n").cast("double")
    sd = F.sqrt(
        (
            F.col("n") * F.col("q")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        ).cast("double")
        / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
    )
    gamma = F.lit("0.577215664902").cast("double")
    s6pi = F.lit("0.779696801234").cast("double")
    beta = sd * s6pi
    mu = m - gamma * beta
    return mo.select(
        F.col("n").alias("n_blocks"),
        F.round(F.col("record").cast("double") / 100, 2).alias(
            "record_revenue"
        ),
        F.round(mu / 100, 4).alias("gumbel_mu"),
        F.round(beta / 100, 4).alias("gumbel_beta"),
        F.round(
            1
            - F.exp(
                -F.exp(-(F.col("record").cast("double") - mu) / beta)
            ),
            6,
        ).alias("p_exceed_record"),
    )


# ---------------------------------------------------------------------------
# Index of dispersion of daily order counts
# ---------------------------------------------------------------------------

@register(
    "dispersion_index",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM orders GROUP BY 1
    ), mo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS s,
               SUM(CAST(k AS DECIMAL(38,0)) * k) AS q
        FROM daily
    )
    SELECT n AS n_days, s AS n_orders,
           ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_per_day,
           ROUND((CAST(n * q - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                 / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS vmr,
           ROUND(CAST(n - 1 AS DOUBLE)
                 * (CAST(n * q - CAST(s AS DECIMAL(38,0)) * s AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                 / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 4)
               AS chi2_dispersion
    FROM mo
    """,
)
def dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of daily order
    counts, with the chi-square dispersion statistic (n-1)*VMR — VMR
    = 1 for a Poisson process, > 1 for clustered (bursty) arrivals,
    < 1 for regular ones.

    100 TB shape: one daily tally, one 3-number reduction.
    Determinism: exact power sums, fixed expressions (sample variance,
    n-1 denominator)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("k"))
    kd = F.col("k").cast("decimal(38,0)")
    mo = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("s"),
        F.sum(kd * F.col("k")).alias("q"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("n") * F.col("q")
        - F.col("s").cast("decimal(38,0)") * F.col("s")
    ).cast("double") / (nd * (F.col("n") - 1).cast("double"))
    return mo.select(
        F.col("n").alias("n_days"),
        F.col("s").alias("n_orders"),
        F.round(mean, 4).alias("mean_per_day"),
        F.round(var / mean, 6).alias("vmr"),
        F.round((F.col("n") - 1).cast("double") * var / mean, 4).alias(
            "chi2_dispersion"
        ),
    )


# ---------------------------------------------------------------------------
# Hoover / Robin Hood index of customer spend per nation
# ---------------------------------------------------------------------------

@register(
    "hoover_index",
    """
    WITH spend AS (
        SELECT c_nationkey, o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, o_custkey
    ), tot AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s
        FROM spend GROUP BY c_nationkey
    ), dev AS (
        -- n*|x - S/n| = |n*x - S| is an exact integer
        SELECT sp.c_nationkey, t.n, t.s,
               SUM(ABS(CAST(t.n AS DECIMAL(38,0)) * sp.x - t.s)) AS absdev_n
        FROM spend sp JOIN tot t ON sp.c_nationkey = t.c_nationkey
        GROUP BY sp.c_nationkey, t.n, t.s
    )
    SELECT n_name,
           n AS n_customers,
           ROUND(CAST(absdev_n AS DOUBLE)
                 / (2.0 * CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6)
               AS hoover
    FROM dev JOIN nation ON c_nationkey = n_nationkey
    ORDER BY n_name
    """,
)
def hoover_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hoover (Robin Hood) index of customer-spend inequality per
    nation: H = sum |x_i - mean| / (2 * total) — the fraction of all
    spend that would have to be redistributed for perfect equality;
    the L1 complement of gini_customer_spend / theil_index.

    100 TB shape: one per-customer aggregate, then a nation-keyed
    reduction over |n*x - S| — which is an EXACT integer (DECIMAL vs
    overflow), so the whole numerator is exact and only one division
    is ever performed.  The mean never materializes as a float."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
        )
        # spend feeds both the nation totals and the deviation pass;
        # staged once -> one join+aggregate over the fact instead of two
        .localCheckpoint(eager=False)
    )
    tot = spend.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    dev = (
        spend.join(F.broadcast(tot), F.col("c_nationkey") == F.col("nk"))
        .groupBy("c_nationkey", "n", "s")
        .agg(
            F.sum(
                F.abs(
                    F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s")
                )
            ).alias("absdev_n")
        )
    )
    return (
        dev.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            F.col("n").alias("n_customers"),
            F.round(
                F.col("absdev_n").cast("double")
                / (
                    F.lit(2.0)
                    * F.col("n").cast("double")
                    * F.col("s").cast("double")
                ),
                6,
            ).alias("hoover"),
        )
        .orderBy("n_name")
    )
