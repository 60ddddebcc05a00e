"""Round-4 wave 10: volatility bands, drawdown, and parametric
distribution tests.

- ``bollinger_bands``: 20-day rolling mean +/- 2 sigma envelope over
  daily order revenue — the standard volatility band.  Variance comes
  from exact integer-cents power sums (n*Q - S^2 over n^2), so the
  only FP ops are one division and one IEEE-exact SQRT.
- ``max_drawdown``: running peak and percentage drawdown of the
  monthly revenue series — peak-to-trough decline, the classic risk
  summary for any value series.
- ``anova_oneway``: one-way ANOVA F statistic for order totalprice
  across the five order priorities — the parametric complement of the
  existing ``kruskal_wallis_priority``.  SSB/SSW accumulate per-group
  terms rounded to 6 dp as DECIMAL(38,6) (exact, order-independent).
- ``jarque_bera_price``: per-priority skewness, excess kurtosis and
  the Jarque-Bera normality statistic from raw DECIMAL(38,0) power
  sums (the covariance_matrix moment pattern: exact sums in, one
  fixed double expression out).

Cross-engine determinism: every aggregate is an exact integer/decimal
sum; emitted floats are fixed expression trees over identical inputs
(IEEE +-*/ and SQRT are exactly rounded, hence bit-identical).

Reference anchor: extends the statistics/metrics surface of
SURVEY.md §2.11 (eval metrics, fl_client.py:139-160's F1/AUC family)
to distribution-shape and risk diagnostics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Bollinger bands: 20-day rolling mean +/- 2 sigma of daily revenue
# ---------------------------------------------------------------------------

@register(
    "bollinger_bands",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), win AS (
        SELECT d.day, d.rev_c AS own_c, w.rev_c AS member_c
        FROM daily d JOIN daily w
          ON w.day BETWEEN d.day - 19 AND d.day
    ), agg AS (
        SELECT day,
               CAST(MAX(own_c) AS BIGINT) AS own_c,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(member_c) AS BIGINT) AS s,
               SUM(CAST(member_c AS DECIMAL(38,0))
                   * CAST(member_c AS DECIMAL(38,0))) AS q
        FROM win GROUP BY day
    ), stats AS (
        SELECT day, own_c, n_members, s,
               CAST(s AS DOUBLE) / CAST(n_members AS DOUBLE) AS mean_c,
               SQRT(CAST(n_members * q - CAST(s AS DECIMAL(38,0))
                                         * CAST(s AS DECIMAL(38,0))
                         AS DOUBLE)
                    / CAST(n_members * n_members AS DOUBLE)) AS sd_c
        FROM agg
    )
    SELECT day, n_members,
           ROUND(CAST(own_c AS DOUBLE) / 100, 2) AS revenue,
           CAST((200 * s + n_members) // (2 * n_members) AS DOUBLE) / 10000
               AS sma_revenue,
           ROUND((mean_c + 2 * sd_c) / 100, 4) AS upper_band,
           ROUND((mean_c - 2 * sd_c) / 100, 4) AS lower_band
    FROM stats
    ORDER BY day
    """,
)
def bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-day Bollinger bands over daily revenue: SMA +/- 2 standard
    deviations, the standard mean-reversion/volatility envelope.

    100 TB shape: the same calendar-bounded self-join as
    ewma_smoothed_revenue — the joined table is the DAILY aggregate
    (bounded by the calendar, not the data), so the band fit stays a
    tiny broadcastable join no matter how many raw orders feed it.
    Determinism: variance = (n*Q - S^2)/n^2 over exact integer-cents
    power sums (Q as DECIMAL(38,0)); SQRT is IEEE exactly-rounded, so
    both engines emit bit-identical doubles.  The sma's 4-dp rounding
    happens in exact integer arithmetic ((200s+n) DIV 2n) because the
    float-ROUND path hits exact decimal midpoints on sparse calendars
    (round-9 strict-gate find at sf0.001) where the engines' rounding
    rules diverge."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    w = daily.select(
        F.col("day").alias("wday"), F.col("rev_c").alias("member_c")
    )
    win = daily.join(
        w,
        (F.col("wday") >= F.col("day") - 19) & (F.col("wday") <= F.col("day")),
    ).select(
        "day", F.col("rev_c").alias("own_c"), "member_c"
    )
    dec = F.col("member_c").cast("decimal(38,0)")
    agg = win.groupBy("day").agg(
        F.max("own_c").alias("own_c"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("member_c").alias("s"),
        F.sum(dec * dec).alias("q"),
    )
    n = F.col("n_members")
    mean_c = F.col("s").cast("double") / n.cast("double")
    var_num = n * F.col("q") - F.col("s").cast("decimal(38,0)") * F.col(
        "s"
    ).cast("decimal(38,0)")
    sd_c = F.sqrt(var_num.cast("double") / (n * n).cast("double"))
    stats = agg.select(
        "day", "own_c", "n_members", "s",
        mean_c.alias("mean_c"), sd_c.alias("sd_c"),
    )
    # sma is rounded to 4 dp in EXACT integer arithmetic before the one
    # float division: round_half_up(100*s/n) = (200s + n) DIV 2n.  The
    # float path ROUND(s/n/100, 4) hits EXACT decimal midpoints whenever
    # the window's member count n divides 100*s with a 5-digit
    # termination (sparse calendars make n=8 windows common, and s/800
    # ends in ...5 for every odd s) — and the engines disagree there:
    # Spark HALF_UPs the double's exact binary expansion while DuckDB's
    # multiply-based ROUND snaps to the true midpoint and rounds away.
    # Integer DIV + one exactly-rounded division is bit-identical.
    # 200*s stays inside int64 up to ~4.6e16 cents/window (~sf1000).
    return stats.select(
        "day",
        "n_members",
        F.round(F.col("own_c").cast("double") / 100, 2).alias("revenue"),
        (
            F.expr("(200 * s + n_members) DIV (2 * n_members)")
            .cast("double") / 10000
        ).alias("sma_revenue"),
        F.round((F.col("mean_c") + 2 * F.col("sd_c")) / 100, 4).alias(
            "upper_band"
        ),
        F.round((F.col("mean_c") - 2 * F.col("sd_c")) / 100, 4).alias(
            "lower_band"
        ),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Max drawdown of the monthly revenue series
# ---------------------------------------------------------------------------

@register(
    "max_drawdown",
    """
    WITH monthly AS (
        SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), run AS (
        SELECT month, rev_c,
               MAX(rev_c) OVER (
                   ORDER BY month
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS peak_c
        FROM monthly
    )
    SELECT month,
           ROUND(CAST(rev_c AS DOUBLE) / 100, 2) AS revenue,
           ROUND(CAST(peak_c AS DOUBLE) / 100, 2) AS peak_revenue,
           ROUND(CAST(peak_c - rev_c AS DOUBLE) / CAST(peak_c AS DOUBLE), 6)
               AS drawdown_frac
    FROM run
    ORDER BY month
    """,
)
def max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running peak and fractional drawdown of monthly revenue — the
    peak-to-trough decline series whose maximum is the classic
    "max drawdown" risk statistic.

    100 TB shape: the window runs over the MONTHLY aggregate, whose
    row count is bounded by the calendar (~10^2 rows) regardless of
    data size, so the unpartitioned running-max frame is safe at any
    scale (the moving_median_revenue precedent).  Determinism: peak
    and revenue are exact integer cents; the drawdown fraction is a
    single division of identical integers."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    run = monthly.withColumn("peak_c", F.max("rev_c").over(w))
    return run.select(
        "month",
        F.round(F.col("rev_c").cast("double") / 100, 2).alias("revenue"),
        F.round(F.col("peak_c").cast("double") / 100, 2).alias("peak_revenue"),
        F.round(
            (F.col("peak_c") - F.col("rev_c")).cast("double")
            / F.col("peak_c").cast("double"),
            6,
        ).alias("drawdown_frac"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# One-way ANOVA across order priorities
# ---------------------------------------------------------------------------

@register(
    "anova_oneway",
    """
    WITH g AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS s_g,
               SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))) AS q_g
        FROM orders GROUP BY 1
    ), terms AS (
        SELECT n_g, s_g,
               CAST(ROUND(CAST(n_g * q_g - CAST(s_g AS DECIMAL(38,0))
                                           * CAST(s_g AS DECIMAL(38,0))
                               AS DOUBLE)
                          / CAST(n_g AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS ssw_g,
               CAST(ROUND(CAST(CAST(s_g AS DECIMAL(38,0))
                               * CAST(s_g AS DECIMAL(38,0)) AS DOUBLE)
                          / CAST(n_g AS DOUBLE), 6)
                    AS DECIMAL(38,6)) AS sb_g
        FROM g
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s,
               CAST(SUM(ssw_g) AS DOUBLE) AS ssw,
               CAST(SUM(sb_g) AS DOUBLE) AS sb
        FROM terms
    )
    SELECT k AS k_groups, n AS n_total,
           CAST(k - 1 AS BIGINT) AS df_between,
           CAST(n - k AS BIGINT) AS df_within,
           ROUND((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                       / CAST(n AS DOUBLE)) / 1e13, 4) AS ss_between_gusd2,
           ROUND(ssw / 1e13, 4) AS ss_within_gusd2,
           ROUND(((sb - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))
                 / (ssw / CAST(n - k AS DOUBLE)), 6) AS f_stat
    FROM tot
    """,
)
def anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F statistic for order totalprice across the five
    order priorities — the parametric complement of
    kruskal_wallis_priority (SURVEY §2.11 metrics family).

    SSW = sum_g (Q_g - S_g^2/n_g), SSB = (sum_g S_g^2/n_g) - S^2/N,
    F = (SSB/(k-1)) / (SSW/(N-k)).

    100 TB shape: one map-side-combined groupBy over k=5 groups, then
    a 5-row reduction — no shuffle beyond the tally.  Determinism:
    per-group terms come from exact integer/decimal power sums, are
    rounded to 6 dp and summed as DECIMAL(38,6) (order-independent);
    the F emit is one fixed double expression.  SS columns are
    reported in 10^9-dollars^2 units (/1e13 from cents^2): at sf0.1
    the raw dollars^2 SSW is ~3e15, where a 4-dp round would promise
    digits below one double ulp (~0.5) — the chow_break_test red-row
    class, caught by tools/audit_rounding.py in round 9."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    cd = c.cast("decimal(38,0)")
    g = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(c).alias("s_g"),
        F.sum(cd * cd).alias("q_g"),
    )
    n_g = F.col("n_g")
    s_gd = F.col("s_g").cast("decimal(38,0)")
    ssw_g = F.round(
        (n_g * F.col("q_g") - s_gd * s_gd).cast("double") / n_g.cast("double"),
        6,
    ).cast("decimal(38,6)")
    sb_g = F.round(
        (s_gd * s_gd).cast("double") / n_g.cast("double"), 6
    ).cast("decimal(38,6)")
    terms = g.select("n_g", "s_g", ssw_g.alias("ssw_g"), sb_g.alias("sb_g"))
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("ssw_g").cast("double").alias("ssw"),
        F.sum("sb_g").cast("double").alias("sb"),
    )
    k = F.col("k")
    n = F.col("n")
    ssb = F.col("sb") - F.col("s").cast("double") * F.col("s").cast(
        "double"
    ) / n.cast("double")
    return tot.select(
        k.alias("k_groups"),
        n.alias("n_total"),
        (k - 1).cast("long").alias("df_between"),
        (n - k).cast("long").alias("df_within"),
        F.round(ssb / 1e13, 4).alias("ss_between_gusd2"),
        F.round(F.col("ssw") / 1e13, 4).alias("ss_within_gusd2"),
        F.round(
            (ssb / (k - 1).cast("double"))
            / (F.col("ssw") / (n - k).cast("double")),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality diagnostics per priority
# ---------------------------------------------------------------------------

@register(
    "jarque_bera_price",
    """
    WITH g AS (
        SELECT o_orderpriority AS grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS s1,
               SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))) AS s2,
               SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))) AS s3,
               SUM(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))
                   * CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          AS DECIMAL(38,0))) AS s4
        FROM orders GROUP BY 1
    ), m AS (
        SELECT grp, n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
               CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        FROM g
    ), c AS (
        SELECT grp, n, mu,
               r2 - mu * mu AS m2,
               r3 - 3 * mu * r2 + 2 * mu * mu * mu AS m3,
               r4 - 4 * mu * r3 + 6 * mu * mu * r2
                  - 3 * mu * mu * mu * mu AS m4
        FROM m
    ), k AS (
        SELECT grp, n,
               m3 / (m2 * SQRT(m2)) AS skew,
               m4 / (m2 * m2) AS kurt
        FROM c
    )
    SELECT grp, n,
           ROUND(skew, 6) AS skewness,
           ROUND(kurt - 3, 6) AS excess_kurtosis,
           ROUND(CAST(n AS DOUBLE) / 6
                 * (skew * skew + (kurt - 3) * (kurt - 3) / 4), 4) AS jb_stat
    FROM k
    ORDER BY grp
    """,
)
def jarque_bera_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority skewness, excess kurtosis and the Jarque-Bera
    normality statistic JB = n/6 (S^2 + (K-3)^2/4) for order
    totalprice — the moment-based normality screen.

    100 TB shape: one pass of four raw power sums per group, all
    map-side combinable; the central-moment algebra runs on the 5-row
    tally.  Determinism: the covariance_matrix pattern — power sums
    accumulate as exact DECIMAL(38,0) (cents^4 at sf1 ~ 1e37 < 1e38),
    then one fixed double expression per emitted value, with identical
    association in both engines.  Skew/kurtosis are scale-invariant so
    the cents scaling cancels."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    c = F.round(F.col("o_totalprice") * 100).cast("long")
    cd = c.cast("decimal(38,0)")
    g = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c).alias("s1"),
        F.sum(cd * cd).alias("s2"),
        F.sum(cd * cd * cd).alias("s3"),
        F.sum(cd * cd * cd * cd).alias("s4"),
    )
    n = F.col("n").cast("double")
    m = g.select(
        "grp",
        "n",
        (F.col("s1").cast("double") / n).alias("mu"),
        (F.col("s2").cast("double") / n).alias("r2"),
        (F.col("s3").cast("double") / n).alias("r3"),
        (F.col("s4").cast("double") / n).alias("r4"),
    )
    mu = F.col("mu")
    cm = m.select(
        "grp",
        "n",
        "mu",
        (F.col("r2") - mu * mu).alias("m2"),
        (F.col("r3") - 3 * mu * F.col("r2") + 2 * mu * mu * mu).alias("m3"),
        (
            F.col("r4")
            - 4 * mu * F.col("r3")
            + 6 * mu * mu * F.col("r2")
            - 3 * mu * mu * mu * mu
        ).alias("m4"),
    )
    k = cm.select(
        "grp",
        "n",
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias("skew"),
        (F.col("m4") / (F.col("m2") * F.col("m2"))).alias("kurt"),
    )
    return k.select(
        "grp",
        "n",
        F.round(F.col("skew"), 6).alias("skewness"),
        F.round(F.col("kurt") - 3, 6).alias("excess_kurtosis"),
        F.round(
            F.col("n").cast("double")
            / 6
            * (
                F.col("skew") * F.col("skew")
                + (F.col("kurt") - 3) * (F.col("kurt") - 3) / 4
            ),
            4,
        ).alias("jb_stat"),
    ).orderBy("grp")
