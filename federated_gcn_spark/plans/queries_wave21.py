"""Round-4 wave 21: volatility calibration, goodness-of-fit,
likelihood-ratio independence, and multi-rater agreement.

- ``log_return_volatility``: drift and volatility of daily revenue
  log-returns (the geometric-Brownian calibration pair), with the
  annualized Sharpe-style ratio — 9-dp-rounded log-return terms into
  DECIMAL power sums.
- ``anderson_darling_gap_test``: Anderson-Darling A^2 statistic for
  the exponential fit of order interarrival gaps — the tail-sensitive
  upgrade of ``exponential_gap_fit``'s KS check, computed on the
  gap-value histogram with EXACT integer rank weights
  (sum of (2i-1) over a rank range = hi^2 - lo^2).
- ``g_test_priority_segment``: likelihood-ratio G-test of
  independence for order priority x customer market segment — the
  log-likelihood twin of the chi-square contingency test.
- ``fleiss_kappa``: Fleiss' kappa agreement across THREE binary
  document raters — the multi-rater generalization of
  ``cohen_kappa``, exact rational except the final division.

Cross-engine determinism: counts and rank weights exact; every
transcendental term (ln-returns, ln F, O ln(O/E)) is rounded to 9-12
dp into DECIMAL sums; emits are fixed expressions.

Reference anchor: SURVEY.md §2.11 metrics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Log-return drift / volatility of daily revenue
# ---------------------------------------------------------------------------

@register(
    "log_return_volatility",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), ret AS (
        -- integerize each 9-dp log-return per row: r9 = 1e9 * r exactly
        SELECT CAST(ROUND(LN(CAST(rev_c AS DOUBLE)
                             / CAST(LAG(rev_c) OVER (ORDER BY day)
                                    AS DOUBLE)) * 1e9) AS BIGINT) AS r9
        FROM daily
        QUALIFY LAG(rev_c) OVER (ORDER BY day) IS NOT NULL
    ), m AS (
        -- exact integer moments of the integerized returns
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(r9) AS DECIMAL(38,0)) AS s9,
               SUM(CAST(r9 AS DECIMAL(38,0)) * r9) AS q18
        FROM ret
    ), v AS (
        SELECT n, s9,
               CAST(n * q18 - s9 * s9 AS DOUBLE)
                   / CAST(n AS DOUBLE) / CAST(n - 1 AS DOUBLE) / 1e18
                   AS var_r,
               CAST(s9 AS DOUBLE) / CAST(n AS DOUBLE) / 1e9 AS mean_r
        FROM m
    )
    SELECT n AS n_returns,
           ROUND(mean_r, 8) AS mean_log_return,
           ROUND(SQRT(var_r), 8) AS daily_vol,
           ROUND(mean_r / SQRT(var_r) * SQRT(CAST(252 AS DOUBLE)), 6)
               AS annualized_sharpe
    FROM v
    """,
)
def log_return_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric-Brownian calibration of daily revenue: mean and
    sample standard deviation of day-over-day log-returns, plus the
    annualized (sqrt-252) Sharpe-style drift/vol ratio — the
    volatility primitive under VaR and option-style planning.

    100 TB shape: one daily aggregate; returns and moments run over
    the calendar-bounded series.  Determinism: each ln-return is
    rounded to 9 dp into DECIMAL power sums (r and r*r are then exact
    decimals); emits are fixed double expressions."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    wd = Window.orderBy("day")
    prev = F.lag("rev_c").over(wd)
    ret = (
        daily.select(
            F.round(
                F.log(F.col("rev_c").cast("double") / prev.cast("double"))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("r9"),
            prev.alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .select("r9")
    )
    m = ret.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r9").cast("decimal(38,0)").alias("s9"),
        F.sum(F.col("r9").cast("decimal(38,0)") * F.col("r9")).alias("q18"),
    )
    nd = F.col("n").cast("double")
    var_r = (
        (F.col("n") * F.col("q18") - F.col("s9") * F.col("s9")).cast("double")
        / nd
        / (F.col("n") - 1).cast("double")
        / F.lit(1e18)
    )
    mean_r = F.col("s9").cast("double") / nd / F.lit(1e9)
    return m.select(
        F.col("n").alias("n_returns"),
        F.round(mean_r, 8).alias("mean_log_return"),
        F.round(F.sqrt(var_r), 8).alias("daily_vol"),
        F.round(
            mean_r / F.sqrt(var_r) * F.sqrt(F.lit(252).cast("double")), 6
        ).alias("annualized_sharpe"),
    )


# ---------------------------------------------------------------------------
# Anderson-Darling A^2 for the exponential gap fit
# ---------------------------------------------------------------------------

@register(
    "anderson_darling_gap_test",
    """
    WITH ord AS (
        SELECT o_custkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day
        FROM orders
    ), gaps AS (
        SELECT day - LAG(day) OVER (PARTITION BY o_custkey ORDER BY day) AS g
        FROM ord
        QUALIFY g IS NOT NULL AND g > 0
    ), hist AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY g
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(c * g) AS BIGINT) AS sg
        FROM hist
    ), ranked AS (
        SELECT g, c,
               SUM(c) OVER (ORDER BY g
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
               SUM(c) OVER (ORDER BY g
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                   AS lo,
               t.n, t.sg
        FROM hist CROSS JOIN tot t
    ), terms AS (
        -- ascending ranks lo+1..hi weight ln F(g); the SAME value
        -- block, mirrored (ranks n+1-i), weights ln(1 - F(g)) with
        -- sum of (2i-1) over a rank range = hi^2 - lo^2
        SELECT n, sg,
               (hi * hi - lo * lo)
                   * CAST(ROUND(LN(1 - EXP(-(CAST(n AS DOUBLE)
                                             / CAST(sg AS DOUBLE)) * g)), 9)
                          AS DECIMAL(28,9)) AS t_low,
               ((n - lo) * (n - lo) - (n - hi) * (n - hi))
                   * CAST(ROUND(-(CAST(n AS DOUBLE) / CAST(sg AS DOUBLE)) * g,
                                9) AS DECIMAL(28,9)) AS t_high
        FROM ranked
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_gaps,
           ROUND(CAST(ANY_VALUE(n) AS DOUBLE) / CAST(ANY_VALUE(sg) AS DOUBLE),
                 9) AS lambda_per_day,
           ROUND(-CAST(ANY_VALUE(n) AS DOUBLE)
                 - CAST(CAST(SUM(t_low) * 1000000000 AS DECIMAL(38,0))
                        + CAST(SUM(t_high) * 1000000000 AS DECIMAL(38,0))
                        AS DOUBLE)
                   / 1e9 / CAST(ANY_VALUE(n) AS DOUBLE), 6) AS a_squared
    FROM terms
    """,
)
def anderson_darling_gap_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anderson-Darling A^2 for the exponential fit of order
    interarrival gaps: A^2 = -n - (1/n) sum_i (2i-1)[ln F(x_i) +
    ln(1-F(x_{n+1-i}))] — the tail-weighted goodness-of-fit that KS
    misses (pairs with exponential_gap_fit).  For the exponential,
    ln(1-F(x)) = -lambda x exactly.

    100 TB shape: the statistic is evaluated on the integer GAP-VALUE
    histogram — each distinct gap carries its whole rank range
    [lo+1, hi], whose (2i-1) weights sum to the EXACT integer
    hi^2 - lo^2 (and (n-lo)^2 - (n-hi)^2 for the mirrored term) — so
    no per-row pass or sort ever happens.  Determinism: rank weights
    exact; ln F terms rounded to 9 dp into DECIMAL sums; one fixed
    emit."""
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
    # hist feeds both the totals and the ranked walk; staged once ->
    # one per-customer window + histogram over the fact instead of two
    hist = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    tot = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * F.col("g")).cast("long").alias("sg"),
    )
    wg = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    ranked = hist.crossJoin(F.broadcast(tot)).select(
        "g",
        "c",
        F.sum("c").over(wg).alias("hi"),
        (F.sum("c").over(wg) - F.col("c")).alias("lo"),
        "n",
        "sg",
    )
    lam = F.col("n").cast("double") / F.col("sg").cast("double")
    t_low = (
        F.col("hi") * F.col("hi") - F.col("lo") * F.col("lo")
    ) * F.round(F.log(1 - F.exp(-lam * F.col("g"))), 9).cast("decimal(28,9)")
    t_high = (
        (F.col("n") - F.col("lo")) * (F.col("n") - F.col("lo"))
        - (F.col("n") - F.col("hi")) * (F.col("n") - F.col("hi"))
    ) * F.round(-lam * F.col("g"), 9).cast("decimal(28,9)")
    terms = ranked.select(
        "n", "sg", t_low.alias("t_low"), t_high.alias("t_high")
    )
    nd = F.any_value(F.col("n")).cast("double")
    return terms.agg(
        F.any_value(F.col("n")).cast("long").alias("n_gaps"),
        F.round(
            nd / F.any_value(F.col("sg")).cast("double"), 9
        ).alias("lambda_per_day"),
        F.round(
            -nd
            - (
                (F.sum("t_low") * 1000000000).cast("decimal(38,0)")
                + (F.sum("t_high") * 1000000000).cast("decimal(38,0)")
            ).cast("double")
            / F.lit(1e9)
            / nd,
            6,
        ).alias("a_squared"),
    )


# ---------------------------------------------------------------------------
# G-test of independence: priority x market segment
# ---------------------------------------------------------------------------

@register(
    "g_test_priority_segment",
    """
    WITH joined AS (
        SELECT o_orderpriority AS pr, c_mktsegment AS seg
        FROM orders JOIN customer ON o_custkey = c_custkey
    ), cell AS (
        SELECT pr, seg, CAST(COUNT(*) AS BIGINT) AS o
        FROM joined GROUP BY pr, seg
    ), margins AS (
        SELECT c.pr, c.seg, c.o,
               SUM(c.o) OVER (PARTITION BY c.pr) AS rp,
               SUM(c.o) OVER (PARTITION BY c.seg) AS cs,
               SUM(c.o) OVER () AS n
        FROM cell c
    ), terms AS (
        SELECT n,
               CAST(ROUND(CAST(o AS DOUBLE)
                          * LN(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                               / (CAST(rp AS DOUBLE) * CAST(cs AS DOUBLE))),
                          9) AS DECIMAL(28,9)) AS t
        FROM margins WHERE o > 0
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(2 * CAST(CAST(SUM(t) * 1000000000 AS DECIMAL(38,0))
                          AS DOUBLE) / 1e9, 6) AS g_stat
    FROM terms
    """,
)
def g_test_priority_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Likelihood-ratio G-test of independence for order priority x
    customer market segment: G = 2 sum O ln(O N / (R C)) — the
    log-likelihood twin of the chi-square contingency test
    (contingency_association), preferred when cells are small.

    100 TB shape: one join + a 25-cell tally; margins ride window
    sums over the tiny cell table.  Determinism: counts exact; each
    O ln(O/E) term rounds to 9 dp into a DECIMAL sum; one fixed
    emit."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.join(
        customer.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("o_orderpriority").alias("pr"),
        F.col("c_mktsegment").alias("seg"),
    )
    cell = joined.groupBy("pr", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    margins = cell.select(
        "pr",
        "seg",
        "o",
        F.sum("o").over(Window.partitionBy("pr")).alias("rp"),
        F.sum("o").over(Window.partitionBy("seg")).alias("cs"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    t = F.round(
        F.col("o").cast("double")
        * F.log(
            F.col("o").cast("double")
            * F.col("n").cast("double")
            / (F.col("rp").cast("double") * F.col("cs").cast("double"))
        ),
        9,
    ).cast("decimal(28,9)")
    terms = margins.filter(F.col("o") > 0).select("n", t.alias("t"))
    return terms.agg(
        F.any_value(F.col("n")).cast("long").alias("n_orders"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(
            2
            * (F.sum("t") * 1000000000).cast("decimal(38,0)").cast("double")
            / F.lit(1e9),
            6,
        ).alias("g_stat"),
    )


# ---------------------------------------------------------------------------
# Fleiss' kappa across three binary document raters
# ---------------------------------------------------------------------------

@register(
    "fleiss_kappa",
    """
    WITH rated AS (
        SELECT (CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
               + (CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                            >= 50 THEN 1 ELSE 0 END)
               + (CASE WHEN 4 * (LENGTH(text)
                                 - LENGTH(REPLACE(text, ' ', '')) + 1)
                            <= LENGTH(REPLACE(text, ' ', ''))
                       THEN 1 ELSE 0 END) AS pos
        FROM documents
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(pos) AS BIGINT) AS tot_pos,
               -- per-item agreement numerator: pos(pos-1) + neg(neg-1)
               CAST(SUM(pos * (pos - 1) + (3 - pos) * (2 - pos)) AS BIGINT)
                   AS agree_num
        FROM rated
    )
    SELECT n_items, tot_pos,
           ROUND(CAST(agree_num AS DOUBLE)
                 / CAST(n_items * 6 AS DOUBLE), 6) AS p_bar,
           ROUND((CAST(tot_pos AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                 * (CAST(tot_pos AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                 + (1 - CAST(tot_pos AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                   * (1 - CAST(tot_pos AS DOUBLE)
                          / CAST(3 * n_items AS DOUBLE)), 6) AS p_e,
           ROUND((CAST(agree_num AS DOUBLE) / CAST(n_items * 6 AS DOUBLE)
                  - ((CAST(tot_pos AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                     * (CAST(tot_pos AS DOUBLE) / CAST(3 * n_items AS DOUBLE))
                     + (1 - CAST(tot_pos AS DOUBLE)
                            / CAST(3 * n_items AS DOUBLE))
                       * (1 - CAST(tot_pos AS DOUBLE)
                              / CAST(3 * n_items AS DOUBLE))))
                 / (1 - ((CAST(tot_pos AS DOUBLE)
                          / CAST(3 * n_items AS DOUBLE))
                         * (CAST(tot_pos AS DOUBLE)
                            / CAST(3 * n_items AS DOUBLE))
                         + (1 - CAST(tot_pos AS DOUBLE)
                                / CAST(3 * n_items AS DOUBLE))
                           * (1 - CAST(tot_pos AS DOUBLE)
                                  / CAST(3 * n_items AS DOUBLE)))), 6)
               AS fleiss_kappa
    FROM agg
    """,
)
def fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa agreement across the THREE binary document raters
    of cochran_q_test (length, token-count, mean-token-length rules):
    P_bar from per-item pair agreement pos(pos-1) + neg(neg-1) over
    n(n-1) = 6, P_e from the pooled marginal — the multi-rater
    chance-corrected agreement.

    100 TB shape: one map-side pass accumulating two integer sums.
    Determinism: the agreement numerator is exact integer; P_bar, P_e
    and kappa are fixed double expressions of two integers."""
    documents = load_table(spark, sf_dir, "documents", parallel=True)
    n_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    len_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    pos = (
        F.when(F.col("n_chars") >= 300, 1).otherwise(0)
        + F.when(n_tok >= 50, 1).otherwise(0)
        + F.when(4 * n_tok <= len_nospace, 1).otherwise(0)
    )
    rated = documents.select(pos.alias("pos"))
    agg = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("pos").cast("long").alias("tot_pos"),
        F.sum(
            F.col("pos") * (F.col("pos") - 1)
            + (3 - F.col("pos")) * (2 - F.col("pos"))
        )
        .cast("long")
        .alias("agree_num"),
    )
    p_bar = F.col("agree_num").cast("double") / (
        F.col("n_items") * 6
    ).cast("double")
    p1 = F.col("tot_pos").cast("double") / (3 * F.col("n_items")).cast(
        "double"
    )
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    return agg.select(
        "n_items",
        "tot_pos",
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / (1 - p_e), 6).alias("fleiss_kappa"),
    )
