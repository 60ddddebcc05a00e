"""Round-4 wave 17: paired-rater testing, stratified causal
adjustment, long-range dependence, and degree mixing.

- ``mcnemar_test``: McNemar's chi-square (with continuity correction)
  on the two document-quality raters of ``cohen_kappa`` — do the
  raters disagree symmetrically?  The paired complement of kappa.
- ``stratified_adjusted_lift``: BUILDING-segment spend lift adjusted
  by acctbal stratum (five fixed bands) — the covariate-adjusted
  effect vs the naive difference, the simplest confounding
  correction.
- ``hurst_exponent``: rescaled-range (R/S) estimate of daily
  revenue's Hurst exponent over block sizes {8,16,32,64} — the
  long-range-dependence diagnostic; R is exact via integer k*W_j
  deviations, the slope is a closed 4-point OLS with ln 2 spacing.
- ``neighbor_degree_curve``: mean neighbor degree as a function of
  degree for the order<->supplier graph — the degree-mixing curve
  behind the scalar ``degree_assortativity``.

Cross-engine determinism: all tallies exact; per-block R/S values are
fixed expressions of exact integers, 9-dp-rounded into DECIMAL means;
the Hurst slope uses only LN of identical doubles and literal
constants.

Reference anchor: SURVEY.md §2.11 metrics + §2.7 graph analysis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# McNemar's test on the two kappa raters
# ---------------------------------------------------------------------------

@register(
    "mcnemar_test",
    """
    WITH rated AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS rater_a,
               CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                         >= 50 THEN 1 ELSE 0 END AS rater_b
        FROM documents
    ), cm AS (
        SELECT CAST(SUM(CASE WHEN rater_a = 1 AND rater_b = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN rater_a = 0 AND rater_b = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM rated
    )
    SELECT b AS a_only, c AS b_only,
           CASE WHEN b + c = 0 THEN 0.0
                ELSE ROUND(CAST((ABS(b - c) - 1) * (ABS(b - c) - 1)
                                AS DOUBLE) / CAST(b + c AS DOUBLE), 6) END
               AS chi2_mcnemar
    FROM cm
    """,
)
def mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's chi-square with continuity correction,
    chi2 = (|b - c| - 1)^2 / (b + c), over the two binary document
    raters — tests whether the raters' disagreements are symmetric
    (the paired-marginal complement of cohen_kappa).

    100 TB shape: one two-cell map-side tally.  Determinism: exact
    integer counts, one division."""
    documents = load_table(spark, sf_dir, "documents", parallel=True)
    n_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    ra = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    rb = F.when(n_tok >= 50, 1).otherwise(0)
    rated = documents.select(ra.alias("rater_a"), rb.alias("rater_b"))
    cm = rated.agg(
        F.sum(
            F.when((F.col("rater_a") == 1) & (F.col("rater_b") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when((F.col("rater_a") == 0) & (F.col("rater_b") == 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("c"),
    )
    diff = F.abs(F.col("b") - F.col("c")) - 1
    return cm.select(
        F.col("b").alias("a_only"),
        F.col("c").alias("b_only"),
        F.when(F.col("b") + F.col("c") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                (diff * diff).cast("double")
                / (F.col("b") + F.col("c")).cast("double"),
                6,
            )
        )
        .alias("chi2_mcnemar"),
    )


# ---------------------------------------------------------------------------
# Stratified (acctbal-band) adjustment of the BUILDING-segment lift
# ---------------------------------------------------------------------------

@register(
    "stratified_adjusted_lift",
    """
    WITH spend AS (
        SELECT c.c_custkey,
               CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS trt,
               CAST(FLOOR(c.c_acctbal / 2500) AS BIGINT) AS stratum,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    ), cell AS (
        SELECT stratum, trt,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS s
        FROM spend GROUP BY stratum, trt
    ), strata AS (
        SELECT stratum,
               MAX(CASE WHEN trt = 1 THEN n END) AS n1,
               MAX(CASE WHEN trt = 0 THEN n END) AS n0,
               MAX(CASE WHEN trt = 1 THEN s END) AS s1,
               MAX(CASE WHEN trt = 0 THEN s END) AS s0
        FROM cell GROUP BY stratum
        HAVING MAX(CASE WHEN trt = 1 THEN n END) IS NOT NULL
           AND MAX(CASE WHEN trt = 0 THEN n END) IS NOT NULL
    ), terms AS (
        SELECT stratum, n1, n0,
               CAST(ROUND((n1 + n0)
                          * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                             - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 6)
                    AS DECIMAL(38,6)) AS wlift,
               s1, s0
        FROM strata
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(n1) AS BIGINT) AS n_treated,
           CAST(SUM(n0) AS BIGINT) AS n_control,
           ROUND((CAST(SUM(s1) AS DOUBLE) / CAST(SUM(n1) AS DOUBLE)
                  - CAST(SUM(s0) AS DOUBLE) / CAST(SUM(n0) AS DOUBLE))
                 / 100, 4) AS naive_lift,
           ROUND(CAST(SUM(wlift) AS DOUBLE)
                 / CAST(SUM(n1 + n0) AS DOUBLE) / 100, 4) AS adjusted_lift
    FROM terms
    """,
)
def stratified_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified covariate adjustment: per-customer spend lift of the
    BUILDING market segment, adjusted across five fixed acctbal bands
    (direct standardization: strata weighted by size) vs the naive
    unadjusted difference — the minimal confounding correction, and
    the gap between the two columns IS the confounding.

    100 TB shape: one per-customer aggregate, then a (stratum x 2)
    tally — fixed bands, not quantiles, so bin edges are engine- and
    layout-independent (the score_calibration lesson).  Determinism:
    cell sums exact; per-stratum weighted lifts round to 6 dp into a
    DECIMAL sum; emits are single fixed expressions."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    customer = load_table(spark, sf_dir, "customer")
    spend = (
        # no broadcast hint: customer is a fact table — let the planner
        # pick the join strategy by size (the market_share lesson)
        orders.join(
            customer.select("c_custkey", "c_mktsegment", "c_acctbal"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            "c_custkey",
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("trt"),
            F.floor(F.col("c_acctbal") / 2500).cast("long").alias("stratum"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
        )
    )
    cell = spend.groupBy("stratum", "trt").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").alias("s")
    )

    def pick(t: int, col: str):
        return F.max(F.when(F.col("trt") == t, F.col(col)))

    strata = (
        cell.groupBy("stratum")
        .agg(
            pick(1, "n").alias("n1"),
            pick(0, "n").alias("n0"),
            pick(1, "s").alias("s1"),
            pick(0, "s").alias("s0"),
        )
        .filter(F.col("n1").isNotNull() & F.col("n0").isNotNull())
    )
    lift = (
        F.col("s1").cast("double") / F.col("n1").cast("double")
        - F.col("s0").cast("double") / F.col("n0").cast("double")
    )
    terms = strata.select(
        "stratum",
        "n1",
        "n0",
        "s1",
        "s0",
        F.round((F.col("n1") + F.col("n0")) * lift, 6)
        .cast("decimal(38,6)")
        .alias("wlift"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("n1").cast("long").alias("n_treated"),
        F.sum("n0").cast("long").alias("n_control"),
        F.round(
            (
                F.sum("s1").cast("double") / F.sum("n1").cast("double")
                - F.sum("s0").cast("double") / F.sum("n0").cast("double")
            )
            / 100,
            4,
        ).alias("naive_lift"),
        F.round(
            F.sum("wlift").cast("double")
            / F.sum(F.col("n1") + F.col("n0")).cast("double")
            / 100,
            4,
        ).alias("adjusted_lift"),
    )


# ---------------------------------------------------------------------------
# Hurst exponent via rescaled range at block sizes 8/16/32/64
# ---------------------------------------------------------------------------

_LN2_12 = "CAST('0.693147180560' AS DOUBLE)"


@register(
    "hurst_exponent",
    f"""
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), idx AS (
        SELECT rev_c, ROW_NUMBER() OVER (ORDER BY day) AS t,
               COUNT(*) OVER () AS n
        FROM daily
    ), blk AS (
        SELECT k.k, (t - 1) // k.k AS b, t, rev_c
        FROM idx CROSS JOIN (SELECT UNNEST([8, 16, 32, 64]) AS k) k
        WHERE (t - 1) // k.k < n // k.k
    ), bsum AS (
        SELECT k, b,
               CAST(SUM(rev_c) AS BIGINT) AS s,
               SUM(CAST(rev_c AS DECIMAL(38,0)) * rev_c) AS q
        FROM blk GROUP BY k, b
    ), cum AS (
        SELECT k, b, t,
               SUM(rev_c) OVER (PARTITION BY k, b ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
               ROW_NUMBER() OVER (PARTITION BY k, b ORDER BY t) AS j
        FROM blk
    ), kw AS (
        SELECT c.k, c.b,
               MAX(c.k * c.cm - c.j * s.s) - MIN(c.k * c.cm - c.j * s.s)
                   AS r2,
               CAST(ANY_VALUE(s.k * s.q - CAST(s.s AS DECIMAL(38,0)) * s.s
                    ) AS DECIMAL(38,0)) AS var_num
        FROM cum c JOIN bsum s ON c.k = s.k AND c.b = s.b
        GROUP BY c.k, c.b
    ), rs AS (
        SELECT k,
               CAST(COUNT(*) AS BIGINT) AS n_blocks,
               CAST(SUM(CAST(ROUND(CAST(r2 AS DOUBLE)
                                   / SQRT(CAST(var_num AS DOUBLE)), 9)
                             AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS mean_rs
        FROM kw WHERE var_num > 0
        GROUP BY k
    ), piv AS (
        SELECT MAX(CASE WHEN k = 8 THEN mean_rs END) AS m8,
               MAX(CASE WHEN k = 16 THEN mean_rs END) AS m16,
               MAX(CASE WHEN k = 32 THEN mean_rs END) AS m32,
               MAX(CASE WHEN k = 64 THEN mean_rs END) AS m64,
               CAST(SUM(n_blocks) AS BIGINT) AS total_blocks
        FROM rs
    )
    SELECT total_blocks,
           ROUND(m8, 6) AS rs_8,
           ROUND(m16, 6) AS rs_16,
           ROUND(m32, 6) AS rs_32,
           ROUND(m64, 6) AS rs_64,
           ROUND((1.5 * (LN(m64) - LN(m8)) + 0.5 * (LN(m32) - LN(m16)))
                 / (5 * {_LN2_12}), 4) AS hurst
    FROM piv
    """,
)
def hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range analysis:
    R/S per block at sizes {{8,16,32,64}} (R from cumulative
    deviations, S the block standard deviation), H = the log-log
    slope — H ~ 0.5 for a memoryless series, > 0.5 for trending /
    long-range-dependent ones.

    100 TB shape: everything runs on the calendar-bounded daily
    series; block windows are <= 64 rows each and partitioned by
    (k, block).  Determinism: R is exact — k*W_j = k*cumsum - j*S is
    an exact integer, so max-min is exact; S^2's numerator k*Q - S^2
    is an exact DECIMAL; per-block R/S rounds to 9 dp into DECIMAL
    means; the slope is a closed-form 4-point OLS (equal ln 2 spacing
    folds the x-side into the literal 5*ln2)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    idx = daily.select(
        "rev_c",
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    ks = spark.createDataFrame([(8,), (16,), (32,), (64,)], "k long")
    blk = (
        idx.crossJoin(F.broadcast(ks))
        .filter(
            ((F.col("t") - 1) / F.col("k")).cast("long")
            < (F.col("n") / F.col("k")).cast("long")
        )
        .select(
            "k",
            F.floor((F.col("t") - 1) / F.col("k")).cast("long").alias("b"),
            "t",
            "rev_c",
        )
        # blk feeds both the block moments and the cumulative walk;
        # staged once -> one daily aggregate + window instead of two
        .localCheckpoint(eager=False)
    )
    rd = F.col("rev_c").cast("decimal(38,0)")
    bsum = blk.groupBy("k", "b").agg(
        F.sum("rev_c").alias("s"), F.sum(rd * F.col("rev_c")).alias("q")
    )
    wb = Window.partitionBy("k", "b").orderBy("t")
    cum = blk.select(
        "k",
        "b",
        F.sum("rev_c").over(wb.rowsBetween(Window.unboundedPreceding, 0)).alias("cm"),
        F.row_number().over(wb).alias("j"),
    )
    j = cum.join(bsum, ["k", "b"])
    kwv = F.col("k") * F.col("cm") - F.col("j") * F.col("s")
    kw = j.groupBy("k", "b").agg(
        (F.max(kwv) - F.min(kwv)).alias("r2"),
        F.any_value(
            F.col("k") * F.col("q")
            - F.col("s").cast("decimal(38,0)") * F.col("s")
        )
        .cast("decimal(38,0)")
        .alias("var_num"),
    )
    rs = (
        kw.filter(F.col("var_num") > 0)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            (
                F.sum(
                    F.round(
                        F.col("r2").cast("double")
                        / F.sqrt(F.col("var_num").cast("double")),
                        9,
                    ).cast("decimal(28,9)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_rs"),
        )
    )
    piv = rs.agg(
        F.max(F.when(F.col("k") == 8, F.col("mean_rs"))).alias("m8"),
        F.max(F.when(F.col("k") == 16, F.col("mean_rs"))).alias("m16"),
        F.max(F.when(F.col("k") == 32, F.col("mean_rs"))).alias("m32"),
        F.max(F.when(F.col("k") == 64, F.col("mean_rs"))).alias("m64"),
        F.sum("n_blocks").cast("long").alias("total_blocks"),
    )
    ln2 = F.lit("0.693147180560").cast("double")
    hurst = (
        F.lit(1.5) * (F.log(F.col("m64")) - F.log(F.col("m8")))
        + F.lit(0.5) * (F.log(F.col("m32")) - F.log(F.col("m16")))
    ) / (F.lit(5) * ln2)
    return piv.select(
        "total_blocks",
        F.round(F.col("m8"), 6).alias("rs_8"),
        F.round(F.col("m16"), 6).alias("rs_16"),
        F.round(F.col("m32"), 6).alias("rs_32"),
        F.round(F.col("m64"), 6).alias("rs_64"),
        F.round(hurst, 4).alias("hurst"),
    )


# ---------------------------------------------------------------------------
# Mean neighbor degree vs degree (degree-mixing curve)
# ---------------------------------------------------------------------------

@register(
    "neighbor_degree_curve",
    """
    WITH ed AS (
        SELECT DISTINCT l_orderkey AS src, l_suppkey + 10000000 AS dst
        FROM lineitem WHERE l_orderkey % 50 = 0
    ), sym AS (
        SELECT src, dst FROM ed UNION SELECT dst AS src, src AS dst FROM ed
    ), deg AS (
        SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d
        FROM sym GROUP BY src
    ), pairs AS (
        SELECT du.d AS d_self, dv.d AS d_nbr
        FROM sym e
        JOIN deg du ON du.id = e.src
        JOIN deg dv ON dv.id = e.dst
    )
    SELECT d_self AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_endpoints,
           CAST(SUM(d_nbr) AS BIGINT) AS sum_nbr_degree,
           ROUND(CAST(SUM(d_nbr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS mean_neighbor_degree
    FROM pairs
    GROUP BY d_self
    ORDER BY degree
    """,
)
def neighbor_degree_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean neighbor degree knn(d) as a function of a vertex's own
    degree — the degree-mixing curve whose slope sign is exactly what
    ``degree_assortativity`` summarizes in one number (falling knn(d)
    = disassortative hubs, the usual bipartite commerce shape).

    100 TB shape: one degree aggregate + two hash joins of the edge
    list against it (the standard two-pass degree join); the output is
    bounded by distinct degree values.  Determinism: exact integer
    endpoint tallies, one division."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    # ed feeds both union arms, sym feeds the degree aggregate AND the
    # pair join, deg joins back twice — unstaged, the final plan re-ran
    # the lineitem scan + distinct six times.  Three lazy checkpoints
    # -> one scan (the standard two-pass degree join, now actually two
    # passes).
    ed = (
        lineitem.where(F.col("l_orderkey") % 50 == 0)
        .select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_suppkey") + 10_000_000).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    sym = (
        ed.union(
            ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=False)
    )
    du = deg.select(F.col("id").alias("uid"), F.col("d").alias("d_self"))
    dv = deg.select(F.col("id").alias("vid"), F.col("d").alias("d_nbr"))
    pairs = sym.join(du, F.col("src") == F.col("uid")).join(
        dv, F.col("dst") == F.col("vid")
    )
    return (
        pairs.groupBy(F.col("d_self").alias("degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_endpoints"),
            F.sum("d_nbr").cast("long").alias("sum_nbr_degree"),
            F.round(
                F.sum("d_nbr").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_neighbor_degree"),
        )
        .orderBy("degree")
    )
