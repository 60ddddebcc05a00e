"""Round-4 wave 24: serial-dependence and periodicity diagnostics on
the daily revenue series.

- ``epoch_folding_periodogram``: the phase-folded (epoch-folding)
  periodogram — for each candidate period p in 2..14 days, fold the
  daily revenue series by ``day % p`` and compute the one-way-ANOVA
  F statistic of the phase means.  The classical exact alternative to
  a Fourier periodogram (no transcendentals): a true period shows up
  as a large between-phase variance.
- ``pacf_lags``: partial autocorrelation at lags 1..3 via the
  Durbin-Levinson recursion over the global-mean sample ACF — the
  AR-order diagnostic (an AR(p) series cuts off after lag p).
- ``turning_points_test``: the turning-points test of randomness —
  count interior days that are strict local maxima/minima; under
  i.i.d. data T ~ N(2(n-2)/3, (16n-29)/90).
- ``cross_correlation_lags``: cross-correlation between daily order
  count and daily revenue at lags -3..+3 (does volume lead value?) —
  the CCF companion of ``revenue_autocorrelation``.

Cross-engine determinism: every sum is an exact integer / DECIMAL(38)
power sum (revenue in cents); per-period F terms are 2-dp-rounded
DECIMAL sums (bounded count of terms, p <= 14); ACF numerators are
cleared of the rational mean by multiplying through by n^2, so rho_k
is a single exact-integer division; Durbin-Levinson and z-score emits
are fixed IEEE expressions.

Reference anchor: SURVEY.md §2.11 metrics family; extends
``revenue_autocorrelation`` / ``seasonal_decompose`` (queries_wave4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

_DAILY_SQL = """
    SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS day,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, rev_c, cnt) daily aggregate — the shared first reduction."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    return orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "rev_c"
        ),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )


# ---------------------------------------------------------------------------
# Epoch-folding periodogram (exact phase-folded ANOVA)
# ---------------------------------------------------------------------------

@register(
    "epoch_folding_periodogram",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    gl AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev_c) AS BIGINT) AS s,
               SUM(CAST(rev_c AS DECIMAL(38,0)) * rev_c) AS q
        FROM daily
    ), phased AS (
        SELECT p.p, daily.day % p.p AS phase,
               CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(rev_c) AS BIGINT) AS sg
        FROM (SELECT UNNEST(range(2, 15)) AS p) p
        JOIN daily ON TRUE
        GROUP BY 1, 2
    ), between_terms AS (
        SELECT p,
               CAST(COUNT(*) AS BIGINT) AS n_phases,
               SUM(CAST(ROUND(CAST(sg AS DOUBLE) * sg / ng / 10000, 2)
                        AS DECIMAL(38,2))) AS fold_sum
        FROM phased GROUP BY p
    )
    SELECT CAST(b.p AS BIGINT) AS period,
           b.n_phases,
           ROUND((CAST(b.fold_sum AS DOUBLE)
                  - CAST(g.s AS DOUBLE) * g.s / g.n / 10000)
                 / CAST(b.n_phases - 1 AS DOUBLE)
                 / ((CAST(g.q AS DOUBLE) / 10000
                     - CAST(b.fold_sum AS DOUBLE))
                    / CAST(g.n - b.n_phases AS DOUBLE)), 4) AS f_stat
    FROM between_terms b CROSS JOIN gl g
    ORDER BY period
    """,
)
def epoch_folding_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-folding periodogram: fold the daily revenue series by
    ``day % p`` for p = 2..14 and report the one-way-ANOVA F statistic
    of the phase means — the exact (transcendental-free) periodicity
    scan; the weekly cycle surfaces as the F spike at p = 7 (and its
    harmonic at 14).

    100 TB shape: one calendar-sized daily aggregate, then a
    13-period x p-phase tally (<= 104 cells) — the broadcast period
    table rides the daily reduce; everything after is scalar per
    period.  Determinism: ng/sg/q are exact integers; each
    sum-of-squares fold term sg^2/ng is rounded to 2 dp (euros^2) and
    accumulated as an exact DECIMAL over <= 14 terms; the F emit is
    one fixed expression.

    Reference anchor: SURVEY §2.11 metrics; the phase-fold is the
    weekday_seasonal_profile machinery generalized to a period scan.
    """
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    glob = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_c").cast("long").alias("s"),
        F.sum(F.col("rev_c").cast("decimal(38,0)") * F.col("rev_c")).alias(
            "q"
        ),
    )
    periods = spark.range(2, 15).select(F.col("id").alias("p"))
    phased = (
        daily.crossJoin(F.broadcast(periods))
        .groupBy("p", (F.col("day") % F.col("p")).alias("phase"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("ng"),
            F.sum("rev_c").cast("long").alias("sg"),
        )
    )
    terms = phased.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_phases"),
        F.sum(
            F.round(
                F.col("sg").cast("double") * F.col("sg") / F.col("ng") / 10000,
                2,
            ).cast("decimal(38,2)")
        ).alias("fold_sum"),
    )
    j = terms.crossJoin(F.broadcast(glob))
    between = (
        F.col("fold_sum").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n") / 10000
    )
    within = (
        F.col("q").cast("double") / 10000 - F.col("fold_sum").cast("double")
    )
    return j.select(
        F.col("p").cast("bigint").alias("period"),
        "n_phases",
        F.round(
            between
            / (F.col("n_phases") - 1).cast("double")
            / (within / (F.col("n") - F.col("n_phases")).cast("double")),
            4,
        ).alias("f_stat"),
    ).orderBy("period")


# ---------------------------------------------------------------------------
# Partial autocorrelation via Durbin-Levinson
# ---------------------------------------------------------------------------

@register(
    "pacf_lags",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    gl AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(CAST(rev_c AS DECIMAL(38,0))) AS s,
               SUM(CAST(rev_c AS DECIMAL(38,0)) * rev_c) AS q
        FROM daily
    ), pairs AS (
        SELECT k.lag,
               CAST(COUNT(*) AS DECIMAL(38,0)) AS nk,
               SUM(CAST(a.rev_c AS DECIMAL(38,0)) * b.rev_c) AS sxy,
               SUM(CAST(a.rev_c AS DECIMAL(38,0))) AS hk,
               SUM(CAST(b.rev_c AS DECIMAL(38,0))) AS tk
        FROM (SELECT UNNEST(range(1, 4)) AS lag) k
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + k.lag
        GROUP BY 1
    ), rho AS (
        SELECT lag,
               CAST(g.n * g.n * p.sxy - g.n * g.s * (p.hk + p.tk)
                    + p.nk * g.s * g.s AS DOUBLE)
               / CAST(g.n * g.n * g.q - g.n * g.s * g.s AS DOUBLE) AS r
        FROM pairs p CROSS JOIN gl g
    ), wide AS (
        SELECT MAX(CASE WHEN lag = 1 THEN r END) AS r1,
               MAX(CASE WHEN lag = 2 THEN r END) AS r2,
               MAX(CASE WHEN lag = 3 THEN r END) AS r3
        FROM rho
    ), dl AS (
        SELECT r1, r2, r3,
               r1 AS phi11,
               (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
        FROM wide
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           ROUND(CASE lag
                     WHEN 1 THEN phi11
                     WHEN 2 THEN phi22
                     ELSE (r3 - (phi11 - phi22 * phi11) * r2 - phi22 * r1)
                          / ((1 - r1 * r1) * (1 - phi22 * phi22))
                 END, 6) AS pacf
    FROM dl CROSS JOIN (SELECT UNNEST(range(1, 4)) AS lag)
    ORDER BY lag
    """,
)
def pacf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily revenue at lags 1..3 via the
    Durbin-Levinson recursion over the global-mean sample ACF — the
    AR-order selection diagnostic (PACF of an AR(p) process cuts off
    beyond lag p), complementing ``revenue_autocorrelation``'s ACF.

    100 TB shape: one daily aggregate, three shifted-calendar
    equi-joins (calendar-sized), then scalar algebra.  Determinism:
    the rational global mean S/n is cleared by multiplying the ACF
    numerator and denominator by n^2, so each rho_k is ONE division of
    exact DECIMAL(38) integers; the Durbin-Levinson emits are fixed
    IEEE expressions of those three doubles."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    glob = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("rev_c")).alias("s"),
        F.sum(dec("rev_c") * F.col("rev_c")).alias("q"),
    )
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    b = daily.select(F.col("day").alias("day2"), F.col("rev_c").alias("y"))
    pairs = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.col("day2") == F.col("day") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("nk"),
            F.sum(dec("rev_c") * F.col("y")).alias("sxy"),
            F.sum(dec("rev_c")).alias("hk"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("tk"),
        )
    )
    rho = pairs.crossJoin(F.broadcast(glob)).select(
        "lag",
        (
            (
                F.col("n") * F.col("n") * F.col("sxy")
                - F.col("n") * F.col("s") * (F.col("hk") + F.col("tk"))
                + F.col("nk") * F.col("s") * F.col("s")
            ).cast("double")
            / (
                F.col("n") * F.col("n") * F.col("q")
                - F.col("n") * F.col("s") * F.col("s")
            ).cast("double")
        ).alias("r"),
    )
    wide = rho.agg(
        F.max(F.when(F.col("lag") == 1, F.col("r"))).alias("r1"),
        F.max(F.when(F.col("lag") == 2, F.col("r"))).alias("r2"),
        F.max(F.when(F.col("lag") == 3, F.col("r"))).alias("r3"),
    )
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    phi11 = r1
    phi22 = (r2 - r1 * r1) / (1 - r1 * r1)
    phi33 = (r3 - (phi11 - phi22 * phi11) * r2 - phi22 * r1) / (
        (1 - r1 * r1) * (1 - phi22 * phi22)
    )
    lagcol = spark.range(1, 4).select(F.col("id").alias("lag"))
    return (
        wide.crossJoin(F.broadcast(lagcol))
        .select(
            F.col("lag").cast("bigint").alias("lag"),
            F.round(
                F.when(F.col("lag") == 1, phi11)
                .when(F.col("lag") == 2, phi22)
                .otherwise(phi33),
                6,
            ).alias("pacf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Turning-points test of randomness
# ---------------------------------------------------------------------------

@register(
    "turning_points_test",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    tri AS (
        SELECT a.rev_c AS x0, b.rev_c AS x1, c.rev_c AS x2
        FROM daily a
        JOIN daily b ON b.day = a.day + 1
        JOIN daily c ON c.day = a.day + 2
    ), agg AS (
        SELECT CAST(SUM(CASE WHEN (x1 > x0 AND x1 > x2)
                               OR (x1 < x0 AND x1 < x2)
                        THEN 1 ELSE 0 END) AS BIGINT) AS t,
               CAST(COUNT(*) + 2 AS BIGINT) AS n
        FROM tri
    )
    SELECT t AS turning_points, n AS n_days,
           ROUND(2.0 * (n - 2) / 3, 4) AS expected,
           ROUND((CAST(t AS DOUBLE) - 2.0 * (n - 2) / 3)
                 / SQRT((16.0 * n - 29) / 90), 4) AS z_score
    FROM agg
    """,
)
def turning_points_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-points test of serial randomness on daily revenue:
    count strict interior local maxima/minima among consecutive-day
    triples; under i.i.d. observations T ~ N(2(n-2)/3, (16n-29)/90),
    so a strong weekly cycle drives |z| up.

    100 TB shape: one daily aggregate, two shifted self-equi-joins on
    the calendar-sized series, one integer tally.  Determinism: T and
    n are exact integers (strict comparisons on exact cents — no
    float ties), z is one fixed expression.  The triple join counts
    only day-consecutive runs, matching the sequential definition on
    a gapless calendar.  Complements ``runs_test_revenue`` (sign runs
    vs median) with the local-extremum flavor."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    b = daily.select(F.col("day").alias("dayb"), F.col("rev_c").alias("x1"))
    c = daily.select(F.col("day").alias("dayc"), F.col("rev_c").alias("x2"))
    tri = daily.join(b, F.col("dayb") == F.col("day") + 1).join(
        c, F.col("dayc") == F.col("day") + 2
    )
    is_turn = (
        (F.col("x1") > F.col("rev_c")) & (F.col("x1") > F.col("x2"))
    ) | ((F.col("x1") < F.col("rev_c")) & (F.col("x1") < F.col("x2")))
    agg = tri.agg(
        F.sum(F.when(is_turn, 1).otherwise(0)).cast("long").alias("t"),
        (F.count(F.lit(1)) + 2).cast("long").alias("n"),
    )
    nd = F.col("n").cast("double")
    td = F.col("t").cast("double")
    return agg.select(
        F.col("t").alias("turning_points"),
        F.col("n").alias("n_days"),
        F.round(2.0 * (nd - 2) / 3, 4).alias("expected"),
        F.round(
            (td - 2.0 * (nd - 2) / 3) / F.sqrt((16.0 * nd - 29) / 90), 4
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Cross-correlation between daily order count and daily revenue
# ---------------------------------------------------------------------------

@register(
    "cross_correlation_lags",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    lagged AS (
        SELECT k.lag, a.cnt AS x, b.rev_c AS y
        FROM (SELECT UNNEST(range(-3, 4)) AS lag) k
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + k.lag
    ), m AS (
        SELECT lag,
               CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        FROM lagged GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag,
           CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS ccf
    FROM m
    ORDER BY lag
    """,
)
def cross_correlation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between daily order COUNT and daily REVENUE
    at lags -3..+3 (negative lag: count leads revenue) — the CCF
    lead/lag diagnostic that precedes any transfer-function or
    Granger-style model.

    100 TB shape: the revenue_autocorrelation pattern with two
    different measures riding the same calendar-sized daily aggregate
    — one broadcast 7-row lag table, one shifted equi-join.
    Determinism: all five moment sums are exact DECIMAL(38) integers,
    one IEEE Pearson emit per lag."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    b = daily.select(F.col("day").alias("day2"), F.col("rev_c").alias("y"))
    lagged = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.col("day2") == F.col("day") + F.col("lag"))
        .select("lag", F.col("cnt").alias("x"), "y")
    )
    m = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("ccf"),
    ).orderBy("lag")
