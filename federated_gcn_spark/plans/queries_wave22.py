"""Round-4 wave 22: threshold optimization, ordinal association,
sequential drift detection, and regression influence.

- ``youden_threshold``: the operating point maximizing Youden's J =
  TPR - FPR for the price -> returnflag classifier, found by an EXACT
  integer argmax (maximize tp*N - fp*P) over the score-bin histogram.
- ``somers_d_priority_late``: Somers' D(Y|X) for ordinal order
  priority predicting late shipment — all concordant/discordant pair
  counts from the 5x2 contingency cells, pure integers.
- ``page_hinkley_drift``: Page-Hinkley sequential mean-shift detector
  over daily revenue (delta = 0): PH_t = m_t - min m, with the
  cumulative deviations held as EXACT 4-dp decimals.
- ``cooks_distance_report``: Cook's distance influence screen on the
  daily revenue ~ order-count OLS — leverage + residual per calendar
  day, influential-day count at the 4/n rule, argmax day.

Cross-engine determinism: histograms, pair counts and the Youden
argmax key are exact integers; PH deviations round to 4 dp into
DECIMAL running sums (argmax by exact decimal equality); Cook's D is
a fixed expression of identical doubles with the two-step exact-max
day pick.

Reference anchor: SURVEY.md §2.11 evaluation metrics
(fl_client.py:139-160's threshold/metric family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Youden's J optimal threshold over score bins
# ---------------------------------------------------------------------------

@register(
    "youden_threshold",
    """
    WITH s AS (
        SELECT CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS bin,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), hist AS (
        SELECT bin,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
        FROM s GROUP BY bin
    ), tot AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS p, CAST(SUM(neg) AS BIGINT) AS n
        FROM hist
    ), cum AS (
        -- predict positive when bin >= t: reverse cumulative counts
        SELECT bin AS t,
               SUM(pos) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
               SUM(neg) OVER (ORDER BY bin DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
               p, n
        FROM hist CROSS JOIN tot
    ), keyed AS (
        -- exact integer objective: J > J'  <=>  tp*n - fp*p > tp'*n - fp'*p
        SELECT t, tp, fp, p, n,
               tp * n - fp * p AS jkey
        FROM cum
    ), best AS (
        SELECT MAX(jkey) AS maxkey FROM keyed
    )
    SELECT CAST(MIN(k.t) AS BIGINT) AS best_bin,
           CAST(MIN_BY(k.tp, k.t) AS BIGINT) AS tp,
           CAST(MIN_BY(k.fp, k.t) AS BIGINT) AS fp,
           CAST(ANY_VALUE(k.p) AS BIGINT) AS total_pos,
           CAST(ANY_VALUE(k.n) AS BIGINT) AS total_neg,
           ROUND(CAST(MIN_BY(k.tp, k.t) AS DOUBLE)
                 / CAST(ANY_VALUE(k.p) AS DOUBLE), 6) AS tpr,
           ROUND(CAST(MIN_BY(k.fp, k.t) AS DOUBLE)
                 / CAST(ANY_VALUE(k.n) AS DOUBLE), 6) AS fpr,
           ROUND(CAST(MIN_BY(k.tp, k.t) AS DOUBLE)
                 / CAST(ANY_VALUE(k.p) AS DOUBLE)
                 - CAST(MIN_BY(k.fp, k.t) AS DOUBLE)
                   / CAST(ANY_VALUE(k.n) AS DOUBLE), 6) AS youden_j
    FROM keyed k JOIN best b ON k.jkey = b.maxkey
    """,
)
def youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal operating point by Youden's J = TPR - FPR for the
    extendedprice -> returnflag classifier, scanned over 1000-wide
    score bins (predict positive when bin >= t) — the standard
    threshold-picking rule behind every ROC curve.

    100 TB shape: one histogram aggregate, a reverse cumulative over
    ~100 bins, and an argmax.  Determinism: the objective is compared
    as the EXACT integer tp*N - fp*P (common denominator P*N), so the
    chosen threshold can never flip on float noise; ties break to the
    smallest bin."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    s = lineitem.select(
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    # hist (~100 bins) feeds the totals and the cumulative; keyed feeds
    # the argmax and the tie-break join — unstaged, the final plan
    # re-ran the lineitem scan + histogram four times.  Two lazy
    # checkpoints on bounded-size frames -> one scan.
    hist = s.groupBy("bin").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    ).localCheckpoint(eager=False)
    tot = hist.agg(
        F.sum("pos").cast("long").alias("p"),
        F.sum("neg").cast("long").alias("n"),
    )
    wrev = Window.orderBy(F.desc("bin")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.crossJoin(F.broadcast(tot)).select(
        F.col("bin").alias("t"),
        F.sum("pos").over(wrev).alias("tp"),
        F.sum("neg").over(wrev).alias("fp"),
        "p",
        "n",
    )
    keyed = cum.withColumn(
        "jkey", F.col("tp") * F.col("n") - F.col("fp") * F.col("p")
    ).localCheckpoint(eager=False)
    best = keyed.agg(F.max("jkey").alias("maxkey"))
    j = keyed.join(
        F.broadcast(best), F.col("jkey") == F.col("maxkey")
    )
    tpr = F.min_by(F.col("tp"), F.col("t")).cast("double") / F.any_value(
        F.col("p")
    ).cast("double")
    fpr = F.min_by(F.col("fp"), F.col("t")).cast("double") / F.any_value(
        F.col("n")
    ).cast("double")
    return j.agg(
        F.min("t").cast("long").alias("best_bin"),
        F.min_by(F.col("tp"), F.col("t")).cast("long").alias("tp"),
        F.min_by(F.col("fp"), F.col("t")).cast("long").alias("fp"),
        F.any_value(F.col("p")).cast("long").alias("total_pos"),
        F.any_value(F.col("n")).cast("long").alias("total_neg"),
        F.round(tpr, 6).alias("tpr"),
        F.round(fpr, 6).alias("fpr"),
        F.round(tpr - fpr, 6).alias("youden_j"),
    )


# ---------------------------------------------------------------------------
# Somers' D: ordinal priority -> late shipment
# ---------------------------------------------------------------------------

@register(
    "somers_d_priority_late",
    """
    WITH joined AS (
        SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS x,
               CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                   CAST(l_shipdate AS DATE)) > 100
                    THEN 1 ELSE 0 END AS y
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), cell AS (
        SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
        FROM joined GROUP BY x, y
    ), pairs AS (
        SELECT CAST(SUM(CASE WHEN a.x < b.x AND a.y < b.y
                             THEN a.c * b.c ELSE 0 END) AS DECIMAL(38,0))
                   AS conc,
               CAST(SUM(CASE WHEN a.x < b.x AND a.y > b.y
                             THEN a.c * b.c ELSE 0 END) AS DECIMAL(38,0))
                   AS disc,
               CAST(SUM(CASE WHEN a.x < b.x AND a.y = b.y
                             THEN a.c * b.c ELSE 0 END) AS DECIMAL(38,0))
                   AS tied_y_only
        FROM cell a CROSS JOIN cell b
    )
    SELECT CAST(conc AS BIGINT) AS concordant,
           CAST(disc AS BIGINT) AS discordant,
           CAST(tied_y_only AS BIGINT) AS tied_y,
           ROUND(CAST(conc - disc AS DOUBLE)
                 / CAST(conc + disc + tied_y_only AS DOUBLE), 6)
               AS somers_dyx
    FROM pairs
    """,
)
def somers_d_priority_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Somers' D(Y|X) for ordinal order priority (1-URGENT .. 5-LOW)
    predicting late shipment (> 100 days order-to-ship): D = (C - D) /
    (pairs not tied on X) — the asymmetric ordinal association used
    for rank-ordering scorecards (its |D| over a binary Y equals the
    Gini/Somers accuracy ratio).

    100 TB shape: the corpus collapses to a 10-cell contingency
    table; pair counts are cell cross-products.  Determinism: all
    counts exact DECIMAL integers; one division."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    joined = lineitem.join(
        orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("x"),
        F.when(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            > 100,
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    # cell feeds both sides of the pair cross; staged once -> one
    # fact join+aggregate instead of two
    cell = joined.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    b = cell.select(
        F.col("x").alias("bx"), F.col("y").alias("by"), F.col("c").alias("bc")
    )
    cd = F.col("c").cast("decimal(38,0)")
    pairs = cell.crossJoin(F.broadcast(b)).agg(
        F.sum(
            F.when(
                (F.col("x") < F.col("bx")) & (F.col("y") < F.col("by")),
                cd * F.col("bc"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("conc"),
        F.sum(
            F.when(
                (F.col("x") < F.col("bx")) & (F.col("y") > F.col("by")),
                cd * F.col("bc"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("disc"),
        F.sum(
            F.when(
                (F.col("x") < F.col("bx")) & (F.col("y") == F.col("by")),
                cd * F.col("bc"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("tied_y_only"),
    )
    return pairs.select(
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        F.col("tied_y_only").cast("long").alias("tied_y"),
        F.round(
            (F.col("conc") - F.col("disc")).cast("double")
            / (
                F.col("conc") + F.col("disc") + F.col("tied_y_only")
            ).cast("double"),
            6,
        ).alias("somers_dyx"),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley sequential mean-shift detector
# ---------------------------------------------------------------------------

@register(
    "page_hinkley_drift",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), run AS (
        SELECT day, rev_c,
               SUM(rev_c) OVER w AS cum,
               ROW_NUMBER() OVER (ORDER BY day) AS t
        FROM daily
        WINDOW w AS (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), dev AS (
        SELECT day, t,
               CAST(ROUND(rev_c - CAST(cum AS DOUBLE) / t, 4)
                    AS DECIMAL(38,4)) AS d
        FROM run
    ), m AS (
        SELECT day, t,
               SUM(d) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mt
        FROM dev
    ), ph AS (
        SELECT day, t, mt,
               mt - MIN(mt) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph_t
        FROM m
    ), mx AS (
        SELECT MAX(ph_t) AS max_ph FROM ph
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(ANY_VALUE(m.max_ph) AS DOUBLE) / 100, 2) AS max_ph,
           CAST(MIN(CASE WHEN p.ph_t = m.max_ph THEN p.day END) AS BIGINT)
               AS peak_day
    FROM ph p CROSS JOIN mx m
    """,
)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-INCREASE detector over daily revenue (delta =
    0): m_t = cumulative sum of (x_i - running mean_i), PH_t = m_t -
    min m; the maximum PH and the day it peaks are where an upward
    mean shift is most evident — the classic sequential changepoint
    monitor (CUSUM's running-mean sibling).

    100 TB shape: everything after the daily aggregate runs on the
    calendar-bounded series.  Determinism: each deviation rounds to
    4 dp into an EXACT DECIMAL running sum, so PH values compare
    exactly and the peak-day pick (min day at the exact max) cannot
    drift."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(wd).alias("cum"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    dev = run.select(
        "day",
        "t",
        F.round(
            F.col("rev_c") - F.col("cum").cast("double") / F.col("t"), 4
        )
        .cast("decimal(38,4)")
        .alias("d"),
    )
    m = dev.select("day", "t", F.sum("d").over(wd).alias("mt"))
    ph = m.select(
        "day",
        "t",
        (F.col("mt") - F.min("mt").over(wd)).alias("ph_t"),
        # ph feeds both the max probe and the peak pick; staged once ->
        # one daily aggregate + window chain instead of two
    ).localCheckpoint(eager=False)
    mx = ph.agg(F.max("ph_t").alias("max_ph"))
    j = ph.crossJoin(F.broadcast(mx))
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(
            F.any_value(F.col("max_ph")).cast("double") / 100, 2
        ).alias("max_ph"),
        F.min(
            F.when(F.col("ph_t") == F.col("max_ph"), F.col("day"))
        )
        .cast("long")
        .alias("peak_day"),
    )


# ---------------------------------------------------------------------------
# Cook's distance influence screen on the daily revenue ~ volume OLS
# ---------------------------------------------------------------------------

@register(
    "cooks_distance_report",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(COUNT(*) AS BIGINT) AS x,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ), mo AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        FROM daily
    ), fit AS (
        SELECT n, sx, sy,
               CAST(n * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                   / CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                   AS b,
               CAST(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE)
                   / CAST(n AS DOUBLE) AS ssx_n
        FROM mo
    ), resid AS (
        SELECT d.day, f.n,
               d.y - ((CAST(f.sy AS DOUBLE) - f.b * f.sx) / f.n
                      + f.b * d.x) AS e,
               1.0 / f.n
                 + (d.x - CAST(f.sx AS DOUBLE) / f.n)
                   * (d.x - CAST(f.sx AS DOUBLE) / f.n) / f.ssx_n AS h
        FROM daily d CROSS JOIN fit f
    ), s2 AS (
        SELECT CAST(SUM(CAST(ROUND(e * e, 0) AS DECIMAL(38,0))) AS DOUBLE)
                   / CAST(ANY_VALUE(n) - 2 AS DOUBLE) AS sse_n
        FROM resid
    ), dcook AS (
        SELECT r.day, r.n,
               r.e * r.e * r.h
                   / (2 * s.sse_n * (1 - r.h) * (1 - r.h)) AS d
        FROM resid r CROSS JOIN s2 s
    ), mx AS (
        SELECT MAX(d) AS max_d FROM dcook
    )
    SELECT CAST(ANY_VALUE(c.n) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN c.d * CAST(c.n AS DOUBLE) > 4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_influential,
           ROUND(ANY_VALUE(m.max_d), 6) AS max_cooks_d,
           CAST(MIN(CASE WHEN c.d = m.max_d THEN c.day END) AS BIGINT)
               AS max_day
    FROM dcook c CROSS JOIN mx m
    """,
)
def cooks_distance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cook's distance influence screen for the daily revenue ~ daily
    order-count simple OLS: D_i = e_i^2 h_i / (p s^2 (1-h_i)^2) with
    leverage h_i = 1/n + (x_i - xbar)^2/Sxx — which calendar days
    single-handedly bend the revenue-volume fit, counted at the 4/n
    rule of thumb.

    100 TB shape: one daily aggregate, one 5-number moment reduction,
    then per-day scalar math on the calendar-bounded table.
    Determinism: slope/intercept/leverage are fixed expressions of
    exact DECIMAL moments (identical doubles both engines); e^2 rounds
    to integer cents^2 DECIMALs for the s^2 sum; D comparisons (4/n
    rule, exact-max day pick) operate on identical doubles."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"),
    ).localCheckpoint(eager=False)
    xd = F.col("x").cast("decimal(38,0)")
    mo = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(xd * F.col("y")).alias("sxy"),
    )
    sxd = F.col("sx").cast("decimal(38,0)")
    fit = mo.select(
        "n",
        "sx",
        "sy",
        (
            (F.col("n") * F.col("sxy") - sxd * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - sxd * F.col("sx")).cast("double")
        ).alias("b"),
        (
            (F.col("n") * F.col("sxx") - sxd * F.col("sx")).cast("double")
            / F.col("n").cast("double")
        ).alias("ssx_n"),
    )
    r = daily.crossJoin(F.broadcast(fit))
    e = F.col("y") - (
        (F.col("sy").cast("double") - F.col("b") * F.col("sx")) / F.col("n")
        + F.col("b") * F.col("x")
    )
    h = (
        F.lit(1.0) / F.col("n")
        + (F.col("x") - F.col("sx").cast("double") / F.col("n"))
        * (F.col("x") - F.col("sx").cast("double") / F.col("n"))
        / F.col("ssx_n")
    )
    resid = r.select("day", "n", e.alias("e"), h.alias("h"))
    s2 = resid.agg(
        (
            F.sum(
                F.round(F.col("e") * F.col("e"), 0).cast("decimal(38,0)")
            ).cast("double")
            / (F.any_value(F.col("n")) - 2).cast("double")
        ).alias("sse_n")
    )
    dcook = resid.crossJoin(F.broadcast(s2)).select(
        "day",
        "n",
        (
            F.col("e")
            * F.col("e")
            * F.col("h")
            / (2 * F.col("sse_n") * (1 - F.col("h")) * (1 - F.col("h")))
        ).alias("d"),
    )
    mx = dcook.agg(F.max("d").alias("max_d"))
    j = dcook.crossJoin(F.broadcast(mx))
    return j.agg(
        F.any_value(F.col("n")).cast("long").alias("n_days"),
        F.sum(
            F.when(F.col("d") * F.col("n").cast("double") > 4, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_influential"),
        F.round(F.any_value(F.col("max_d")), 6).alias("max_cooks_d"),
        F.min(
            F.when(F.col("d") == F.col("max_d"), F.col("day"))
        )
        .cast("long")
        .alias("max_day"),
    )
