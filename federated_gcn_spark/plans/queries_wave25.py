"""Round-4 wave 25: the ANOVA companion battery — variance
homogeneity, post-hoc pairwise comparisons, and multiple-testing
control.

- ``benjamini_hochberg_fdr``: per-nation z-test of mean order price vs
  the global mean, two-sided p-values via the Abramowitz-Stegun 26.2.17
  normal-CDF polynomial, then the Benjamini-Hochberg step-up procedure
  at FDR alpha = 0.05 — the standard guard against false discoveries
  when a dashboard runs one test per segment.
- ``brown_forsythe_levene``: the Brown-Forsythe variant of Levene's
  test for equal variances across order priorities — one-way ANOVA on
  |x - group median| (median-centered: robust to heavy tails).
- ``bartlett_test``: the classical (normal-theory) variance-homogeneity
  chi-square on the same groups — the pair every stats package prints
  together with Levene.
- ``tukey_hsd_pairs``: Tukey's honestly-significant-difference post-hoc
  on mean order price across the 5 priorities — all 10 pairwise
  contrasts against q_crit * sqrt(MSW/2 * (1/ni + 1/nj)).

Cross-engine determinism: group tallies are exact integer-cents power
sums; Brown-Forsythe |x - med| deviations are exact integer cents
(the group median is a selected data element, not an average); the
normal-CDF polynomial, LN variance terms (9-dp-rounded DECIMAL sums)
and every final statistic are fixed IEEE expressions of those exact
sums; BH accept/reject compares identically-constructed doubles.

Reference anchor: SURVEY.md §2.11 metrics family; extends
``anova_oneway`` (queries_wave10) with its diagnostic companions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

# Abramowitz-Stegun 26.2.17 constants (exact decimal literals)
_AS = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = "0.398942280401"
_ALPHA = 0.05
# studentized-range critical value q(0.05; k=5, df=inf)
_Q_CRIT_5 = "3.858"


def _phi_tail_sql(zcol: str) -> str:
    """DuckDB SQL for the two-sided normal p-value of |z| via A&S."""
    a1, a2, a3, a4, a5 = _AS
    return f"""
        2 * (EXP(-({zcol}) * ({zcol}) / 2) * {_INV_SQRT_2PI}
             * ({a1} * (1 / (1 + 0.2316419 * ABS({zcol})))
                + {a2} * POWER(1 / (1 + 0.2316419 * ABS({zcol})), 2)
                + {a3} * POWER(1 / (1 + 0.2316419 * ABS({zcol})), 3)
                + {a4} * POWER(1 / (1 + 0.2316419 * ABS({zcol})), 4)
                + {a5} * POWER(1 / (1 + 0.2316419 * ABS({zcol})), 5)))
    """


def _phi_tail_col(z):
    """Spark column: two-sided normal p-value of |z| via the same A&S
    polynomial (identical literals => identical IEEE doubles)."""
    a1, a2, a3, a4, a5 = _AS
    t = 1 / (1 + 0.2316419 * F.abs(z))
    poly = a1 * t + a2 * t**2 + a3 * t**3 + a4 * t**4 + a5 * t**5
    dens = F.exp(-z * z / 2) * F.lit(_INV_SQRT_2PI).cast("double")
    return 2 * (dens * poly)


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over per-nation mean-price z-tests
# ---------------------------------------------------------------------------

@register(
    "benjamini_hochberg_fdr",
    f"""
    WITH x AS (
        SELECT n.n_name,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ), g AS (
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(cents) AS BIGINT) AS sg
        FROM x GROUP BY n_name
    ), gl AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS s,
               SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS q
        FROM x
    ), z AS (
        SELECT n_name, ng,
               (CAST(sg AS DOUBLE) / ng - CAST(s AS DOUBLE) / n)
               / SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                       - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / ng)
                   AS zstat
        FROM g CROSS JOIN gl
    ), p AS (
        SELECT n_name, ng, zstat,
               {_phi_tail_sql('zstat')} AS pval
        FROM z
    ), ranked AS (
        SELECT n_name, ng, zstat, pval,
               CAST(ROW_NUMBER() OVER (ORDER BY pval, n_name) AS BIGINT)
                   AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM p
    ), cross_k AS (
        SELECT COALESCE(MAX(CASE WHEN pval <= {_ALPHA} * rk / m
                                 THEN rk END), 0) AS kstar
        FROM ranked
    )
    SELECT n_name, ng AS n_orders,
           ROUND(zstat, 4) AS z_score,
           ROUND(pval, 6) AS p_value,
           ROUND({_ALPHA} * rk / m, 6) AS bh_threshold,
           CAST(CASE WHEN rk <= kstar THEN 1 ELSE 0 END AS BIGINT)
               AS rejected
    FROM ranked CROSS JOIN cross_k
    ORDER BY n_name
    """,
)
def benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over the 25 per-nation
    'is this nation's mean order price different?' z-tests: rank the
    two-sided p-values, find the largest k with p_(k) <= alpha*k/m,
    reject ranks <= k — the multiplicity correction that keeps a
    25-segment dashboard from crying wolf.

    100 TB shape: the fact reduces to one 25-row (nation, count, sum)
    tally plus a 3-number global moment (nation/customer dims
    broadcast); ranking and the step-up scan run on 25 rows.
    Determinism: tallies are exact integer cents; the z, A&S-polynomial
    p-value, and alpha*k/m thresholds are fixed IEEE expressions built
    from identical literals in both engines; ties in the p-rank break
    by nation name."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    x = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(
            "n_name",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
    )
    g = x.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("sg"),
    )
    gl = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "q"
        ),
    )
    z = g.crossJoin(F.broadcast(gl)).select(
        "n_name",
        "ng",
        (
            (
                F.col("sg").cast("double") / F.col("ng")
                - F.col("s").cast("double") / F.col("n")
            )
            / F.sqrt(
                (
                    F.col("n").cast("double") * F.col("q").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double")
                )
                / (F.col("n").cast("double") * (F.col("n") - 1).cast("double"))
                / F.col("ng")
            )
        ).alias("zstat"),
    )
    # 25 tiny rows consumed by three downstream branches (rank, m,
    # k*) — cut the fact-join lineage once so it runs once.
    p = z.withColumn("pval", _phi_tail_col(F.col("zstat"))).localCheckpoint(
        eager=True
    )
    from pyspark.sql import Window

    w = Window.orderBy("pval", "n_name")
    ranked = p.withColumn("rk", F.row_number().over(w).cast("long")).crossJoin(
        F.broadcast(p.agg(F.count(F.lit(1)).cast("long").alias("m")))
    )
    kstar = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pval") <= _ALPHA * F.col("rk") / F.col("m"),
                    F.col("rk"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("kstar")
    )
    return (
        ranked.crossJoin(F.broadcast(kstar))
        .select(
            "n_name",
            F.col("ng").alias("n_orders"),
            F.round("zstat", 4).alias("z_score"),
            F.round("pval", 6).alias("p_value"),
            F.round(_ALPHA * F.col("rk") / F.col("m"), 6).alias(
                "bh_threshold"
            ),
            F.when(F.col("rk") <= F.col("kstar"), 1)
            .otherwise(0)
            .cast("long")
            .alias("rejected"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe (median-centered Levene) test
# ---------------------------------------------------------------------------

@register(
    "brown_forsythe_levene",
    """
    WITH r AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), k AS (
        SELECT grp, (COUNT(*) + 1) // 2 AS k FROM r GROUP BY grp
    ), o AS (
        SELECT grp, cents,
               ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents) AS rn
        FROM r
    ), med AS (
        SELECT o.grp, cents AS med_c FROM o JOIN k USING (grp)
        WHERE rn = k.k
    ), dev AS (
        SELECT r.grp, ABS(r.cents - m.med_c) AS z
        FROM r JOIN med m ON m.grp = r.grp
    ), g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(z) AS BIGINT) AS sg,
               SUM(CAST(z AS DECIMAL(38,0)) * z) AS qg
        FROM dev GROUP BY grp
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS kk,
               CAST(SUM(sg) AS BIGINT) AS s,
               SUM(qg) AS q,
               SUM(CAST(ROUND(CAST(sg AS DOUBLE) * sg / ng / 10000, 2)
                        AS DECIMAL(38,2))) AS fold_sum
        FROM g
    )
    SELECT kk AS n_groups, n AS n_rows,
           ROUND((CAST(fold_sum AS DOUBLE)
                  - CAST(s AS DOUBLE) * s / n / 10000)
                 / CAST(kk - 1 AS DOUBLE)
                 / ((CAST(q AS DOUBLE) / 10000 - CAST(fold_sum AS DOUBLE))
                    / CAST(n - kk AS DOUBLE)), 4) AS f_stat
    FROM tot
    """,
)
def brown_forsythe_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe / Levene test of variance homogeneity across the
    five order priorities: one-way ANOVA on |x - median_g| — the
    median-centering makes it robust to the heavy right tail of order
    values.

    100 TB shape: ONE fact pass to the bounded (priority, cents)
    value-domain histogram; the group median is a cumulative walk over
    it (no full per-group sort) and the deviation moments fold the
    per-row sums exactly through the counts.
    Determinism: the median is a SELECTED data element (lower-median
    convention), so |x - med| is an exact integer in cents; fold terms
    round to 2 dp euros^2 and sum exactly; the F emit is one fixed
    expression."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # ONE fact pass: values are exact integer cents, so the bounded
    # value-domain histogram serves both the median selection (lower
    # median = smallest cents with cum >= (n+1) div 2, the same
    # k = (n+1)//2 order statistic exact_group_median selects) and the
    # deviation moments (sum c*z, sum c*z^2 fold the per-row sums
    # exactly) — instead of the generic three-scan two-pass selection
    # plus a fourth deviation scan
    hist = orders.groupBy("grp", "cents").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    wcm = (
        Window.partitionBy("grp")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "grp",
        "cents",
        F.sum("c").over(wcm).alias("cm"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n"),
    )
    med = cum.groupBy("grp").agg(
        F.min(
            F.when(F.col("cm") >= F.expr("(n + 1) div 2"), F.col("cents"))
        )
        .cast("long")
        .alias("med_c")
    )
    z = F.abs(F.col("cents") - F.col("med_c"))
    g = hist.join(F.broadcast(med), "grp").groupBy("grp").agg(
        F.sum("c").cast("long").alias("ng"),
        F.sum(F.col("c") * z).cast("long").alias("sg"),
        F.sum(F.col("c").cast("decimal(38,0)") * z * z).alias("qg"),
    )
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum("sg").cast("long").alias("s"),
        F.sum("qg").alias("q"),
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg") / F.col("ng") / 10000,
                2,
            ).cast("decimal(38,2)")
        ).alias("fold_sum"),
    )
    between = (
        F.col("fold_sum").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n") / 10000
    )
    within = (
        F.col("q").cast("double") / 10000 - F.col("fold_sum").cast("double")
    )
    return tot.select(
        F.col("kk").alias("n_groups"),
        F.col("n").alias("n_rows"),
        F.round(
            between
            / (F.col("kk") - 1).cast("double")
            / (within / (F.col("n") - F.col("kk")).cast("double")),
            4,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Bartlett's test
# ---------------------------------------------------------------------------

@register(
    "bartlett_test",
    """
    WITH r AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(cents) AS BIGINT) AS sg,
               SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS qg
        FROM r GROUP BY grp
    ), v AS (
        SELECT grp, ng,
               (CAST(ng AS DOUBLE) * CAST(qg AS DOUBLE)
                - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
               / (CAST(ng AS DOUBLE) * CAST(ng - 1 AS DOUBLE)) / 10000
                   AS s2
        FROM g
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS kk,
               SUM(CAST(ROUND((ng - 1) * LN(s2), 9) AS DECIMAL(38,9)))
                   AS sum_df_ln,
               SUM(CAST(ROUND((ng - 1) * s2, 4) AS DECIMAL(38,4)))
                   AS pooled_num,
               SUM(CAST(ROUND(1.0 / (ng - 1), 12) AS DECIMAL(38,12)))
                   AS sum_inv_df
        FROM v
    )
    SELECT kk AS n_groups, n AS n_rows,
           ROUND(CAST(pooled_num AS DOUBLE) / (n - kk), 0) AS pooled_var,
           ROUND((CAST(n - kk AS DOUBLE)
                  * LN(CAST(pooled_num AS DOUBLE) / (n - kk))
                  - CAST(sum_df_ln AS DOUBLE))
                 / (1 + (CAST(sum_inv_df AS DOUBLE)
                         - 1.0 / (n - kk)) / (3 * (kk - 1))), 4)
               AS chi2_stat
    FROM tot
    """,
)
def bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's chi-square test of equal variances across order
    priorities — the normal-theory companion of Brown-Forsythe
    (sensitive to non-normality, which is exactly why packages print
    both).

    100 TB shape: one 5-row moment tally, everything after scalar.
    Determinism: group variances are fixed expressions of exact
    integer-cents sums; the (ng-1)*ln(s2) terms, pooled-variance
    numerator, and 1/(ng-1) terms are 9/4/12-dp-rounded DECIMAL sums
    over 5 groups (the entropy-term pattern); the chi-square emit is
    one fixed expression.  pooled_var is rounded to WHOLE dollars^2:
    its ~2e10 magnitude leaves a 4-dp grid only ~26 ulp of slack
    (round-9 audit_rounding find)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = orders.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("sg"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "qg"
        ),
    )
    s2 = (
        (
            F.col("ng").cast("double") * F.col("qg").cast("double")
            - F.col("sg").cast("double") * F.col("sg").cast("double")
        )
        / (F.col("ng").cast("double") * (F.col("ng") - 1).cast("double"))
        / 10000
    )
    v = g.select("grp", "ng", s2.alias("s2"))
    tot = v.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum(
            F.round((F.col("ng") - 1) * F.log(F.col("s2")), 9).cast(
                "decimal(38,9)"
            )
        ).alias("sum_df_ln"),
        F.sum(
            F.round((F.col("ng") - 1) * F.col("s2"), 4).cast("decimal(38,4)")
        ).alias("pooled_num"),
        F.sum(
            F.round(1.0 / (F.col("ng") - 1), 12).cast("decimal(38,12)")
        ).alias("sum_inv_df"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("kk").cast("double")
    pooled = F.col("pooled_num").cast("double") / (F.col("n") - F.col("kk"))
    chi2 = (
        (nd - kd) * F.log(pooled) - F.col("sum_df_ln").cast("double")
    ) / (
        1
        + (
            F.col("sum_inv_df").cast("double")
            - 1.0 / (F.col("n") - F.col("kk"))
        )
        / (3 * (kd - 1))
    )
    return tot.select(
        F.col("kk").alias("n_groups"),
        F.col("n").alias("n_rows"),
        # whole-dollars^2 round: pooled is ~2e10 at every SF (price
        # variance is SF-independent), where a 4-dp grid sits only ~26
        # ulp above double resolution — inside plausible cross-engine
        # cast drift (round-9 audit_rounding find); at 0 dp the grid is
        # ~2.6e5 ulp wide
        F.round(pooled, 0).alias("pooled_var"),
        F.round(chi2, 4).alias("chi2_stat"),
    )


# ---------------------------------------------------------------------------
# Tukey HSD post-hoc pairwise comparisons
# ---------------------------------------------------------------------------

@register(
    "tukey_hsd_pairs",
    f"""
    WITH r AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), g AS (
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(cents) AS BIGINT) AS sg,
               SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS qg
        FROM r GROUP BY grp
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS kk,
               SUM(CAST(ROUND(CAST(sg AS DOUBLE) * sg / ng / 10000, 2)
                        AS DECIMAL(38,2))) AS fold_sum,
               SUM(qg) AS q
        FROM g
    ), msw AS (
        SELECT n, kk,
               (CAST(q AS DOUBLE) / 10000 - CAST(fold_sum AS DOUBLE))
               / CAST(n - kk AS DOUBLE) AS msw
        FROM tot
    )
    SELECT a.grp AS group_a, b.grp AS group_b,
           ROUND(ABS(CAST(a.sg AS DOUBLE) / a.ng
                     - CAST(b.sg AS DOUBLE) / b.ng) / 100, 4) AS mean_diff,
           ROUND({_Q_CRIT_5} * SQRT(m.msw / 2
                     * (1.0 / a.ng + 1.0 / b.ng)) / 100, 4) AS hsd_critical,
           CAST(CASE WHEN ABS(CAST(a.sg AS DOUBLE) / a.ng
                              - CAST(b.sg AS DOUBLE) / b.ng)
                          > {_Q_CRIT_5} * SQRT(m.msw / 2
                                * (1.0 / a.ng + 1.0 / b.ng))
                     THEN 1 ELSE 0 END AS BIGINT) AS significant
    FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN msw m
    ORDER BY group_a, group_b
    """,
)
def tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc after the one-way ANOVA on order price by
    priority: all 10 pairwise |mean_i - mean_j| contrasts against
    q_crit * sqrt(MSW/2 * (1/ni + 1/nj)) with q(0.05; k=5, df=inf) —
    the honest answer to 'WHICH groups differ?' once ANOVA fires.

    100 TB shape: one 5-row moment tally; the pairwise join is 5x5
    driver-sized.  Determinism: tallies are exact integer cents; MSW's
    fold terms are 2-dp DECIMAL sums; mean differences and critical
    values are fixed IEEE expressions; q_crit is a shared literal."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    g = orders.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("cents").cast("long").alias("sg"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias(
            "qg"
        ),
    ).localCheckpoint(eager=True)
    tot = g.agg(
        F.sum("ng").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("kk"),
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg") / F.col("ng") / 10000,
                2,
            ).cast("decimal(38,2)")
        ).alias("fold_sum"),
        F.sum("qg").alias("q"),
    )
    msw = tot.select(
        (
            (F.col("q").cast("double") / 10000 - F.col("fold_sum").cast("double"))
            / (F.col("n") - F.col("kk")).cast("double")
        ).alias("msw")
    )
    a = g.select(
        F.col("grp").alias("group_a"),
        F.col("ng").alias("na"),
        F.col("sg").alias("sa"),
    )
    b = g.select(
        F.col("grp").alias("group_b"),
        F.col("ng").alias("nb"),
        F.col("sg").alias("sb"),
    )
    qcrit = F.lit(_Q_CRIT_5).cast("double")
    diff = F.abs(
        F.col("sa").cast("double") / F.col("na")
        - F.col("sb").cast("double") / F.col("nb")
    )
    crit = qcrit * F.sqrt(
        F.col("msw") / 2 * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            "group_a",
            "group_b",
            F.round(diff / 100, 4).alias("mean_diff"),
            F.round(crit / 100, 4).alias("hsd_critical"),
            F.when(diff > crit, 1).otherwise(0).cast("long").alias(
                "significant"
            ),
        )
        .orderBy("group_a", "group_b")
    )
