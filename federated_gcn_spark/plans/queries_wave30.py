"""Round-4 wave 30: regression diagnostics and causality — the
econometrics battery on the daily revenue series.

- ``durbin_watson``: the Durbin-Watson autocorrelated-residuals
  statistic of the OLS trend fit y ~ t, computed in MOMENT form
  (sum (dy - b)^2 = sum dy^2 - 2b sum dy + m b^2 over consecutive-day
  pairs) — no per-row residual materialization at all.
- ``breusch_pagan``: the Breusch-Pagan heteroskedasticity LM test —
  regress squared residuals on the day and report n * R^2.
- ``granger_causality_1lag``: does order VOLUME Granger-cause revenue?
  Restricted (y_t ~ y_{t-1}) vs unrestricted (y_t ~ y_{t-1} + x_{t-1})
  RSS via closed-form 2-regressor OLS from exact cross-moments; F with
  1 numerator df.
- ``chow_break_test``: structural-break F at the sample midpoint —
  pooled trend RSS vs the sum of per-half RSS, each in exact
  centered-moment form.

Cross-engine determinism: every regression reduces to DECIMAL(38)
integer power sums (revenue in cents, epoch-day regressors) with the
rational means cleared by multiplying through by n; RSS and F emits
are fixed IEEE expressions of those exact moments.  Breusch-Pagan's
squared-residual moments are 2-dp-rounded DECIMAL sums (the residual
is an identical double in both engines).

Reference anchor: SURVEY.md §2.11 metrics family; extends linear_fit
/ theil_sen_trend / revenue_autocorrelation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

_DAILY_SQL = """
    SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS t,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM orders GROUP BY 1
"""

# exact centered second moments (x n^2 clearing) shared by every oracle
_MOM_SQL = """
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(CAST(t AS DECIMAL(38,0))) AS st,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt,
               SUM(CAST(t AS DECIMAL(38,0)) * y) AS sty,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    return orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("t")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        F.count(F.lit(1)).cast("long").alias("x"),
    )


def _dec(c):
    return F.col(c).cast("decimal(38,0)")


def _moments(df: DataFrame) -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(_dec("t")).alias("st"),
        F.sum(_dec("y")).alias("sy"),
        F.sum(_dec("t") * F.col("t")).alias("stt"),
        F.sum(_dec("t") * F.col("y")).alias("sty"),
        F.sum(_dec("y") * F.col("y")).alias("syy"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson in moment form
# ---------------------------------------------------------------------------

@register(
    "durbin_watson",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS ({_MOM_SQL} FROM daily),
    fit AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b,
               (CAST(n * syy - sy * sy AS DOUBLE)
                - POWER(CAST(n * sty - st * sy AS DOUBLE), 2)
                  / CAST(n * stt - st * st AS DOUBLE))
               / CAST(n AS DOUBLE) AS rss
        FROM m
    ), diffs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m_pairs,
               SUM(CAST(b.y - a.y AS DECIMAL(38,0))) AS sd,
               SUM(CAST(b.y - a.y AS DECIMAL(38,0)) * (b.y - a.y)) AS sdd
        FROM daily a JOIN daily b ON b.t = a.t + 1
    )
    SELECT f.n AS n_days, d.m_pairs,
           ROUND(f.b / 100, 6) AS slope_eur_per_day,
           ROUND((CAST(d.sdd AS DOUBLE) - 2 * f.b * CAST(d.sd AS DOUBLE)
                  + d.m_pairs * f.b * f.b) / f.rss, 6) AS dw_stat
    FROM fit f CROSS JOIN diffs d
    """,
)
def durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test for autocorrelated residuals of the daily
    revenue trend fit: DW ~ 2 means independent residuals, << 2 means
    positive serial correlation (the 'your OLS standard errors are a
    lie' alarm).  Computed entirely in moment form: the numerator
    sum (dy_t - b)^2 expands to exact integer sums over consecutive-day
    pairs, and RSS comes from the centered moments — residuals are
    never materialized.

    100 TB shape: one calendar-sized daily aggregate, one shifted
    equi-join, two scalar reductions.  Determinism: all sums are exact
    DECIMAL(38); b, RSS, DW are fixed IEEE expressions."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    m = _moments(daily)
    fit = m.select(
        F.col("n").cast("long").alias("n"),
        (
            (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
                "double"
            )
            / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
                "double"
            )
        ).alias("b"),
        (
            (
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
                    "double"
                )
                - F.pow(
                    (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
                        "double"
                    ),
                    2,
                )
                / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
                    "double"
                )
            )
            / F.col("n").cast("double")
        ).alias("rss"),
    )
    b2 = daily.select(F.col("t").alias("t2"), F.col("y").alias("y2"))
    diffs = (
        daily.join(b2, F.col("t2") == F.col("t") + 1)
        .select((F.col("y2") - F.col("y")).alias("dy"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("m_pairs"),
            F.sum(F.col("dy").cast("decimal(38,0)")).alias("sd"),
            F.sum(F.col("dy").cast("decimal(38,0)") * F.col("dy")).alias(
                "sdd"
            ),
        )
    )
    j = fit.crossJoin(F.broadcast(diffs))
    dw = (
        F.col("sdd").cast("double")
        - 2 * F.col("b") * F.col("sd").cast("double")
        + F.col("m_pairs") * F.col("b") * F.col("b")
    ) / F.col("rss")
    return j.select(
        F.col("n").alias("n_days"),
        "m_pairs",
        F.round(F.col("b") / 100, 6).alias("slope_eur_per_day"),
        F.round(dw, 6).alias("dw_stat"),
    )


# ---------------------------------------------------------------------------
# Breusch-Pagan heteroskedasticity LM test
# ---------------------------------------------------------------------------

@register(
    "breusch_pagan",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    m AS ({_MOM_SQL} FROM daily),
    fit AS (
        SELECT CAST(n AS DOUBLE) AS nd,
               CAST(n * sty - st * sy AS DOUBLE)
               / CAST(n * stt - st * st AS DOUBLE) AS b,
               CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(n * sty - st * sy AS DOUBLE)
                  / CAST(n * stt - st * st AS DOUBLE))
                 * CAST(st AS DOUBLE) / CAST(n AS DOUBLE) AS a
        FROM m
    ), u AS (
        SELECT d.t,
               POWER((CAST(d.y AS DOUBLE) - f.a - f.b * d.t) / 100, 2) AS uu
        FROM daily d CROSS JOIN fit f
    ), um AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(t AS DECIMAL(38,0))) AS st,
               SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt,
               SUM(CAST(ROUND(uu, 2) AS DECIMAL(38,2))) AS su,
               SUM(CAST(ROUND(uu * uu, 2) AS DECIMAL(38,2))) AS suu,
               SUM(CAST(ROUND(uu * t, 2) AS DECIMAL(38,2))) AS sut
        FROM u
    )
    SELECT n AS n_days,
           ROUND(POWER(n * CAST(sut AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(su AS DOUBLE), 2)
                 / (CAST(n * stt - st * st AS DOUBLE)
                    * (n * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6)
               AS r_squared,
           ROUND(n * POWER(n * CAST(sut AS DOUBLE)
                           - CAST(st AS DOUBLE) * CAST(su AS DOUBLE), 2)
                 / (CAST(n * stt - st * st AS DOUBLE)
                    * (n * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 4)
               AS lm_stat
    FROM um
    """,
)
def breusch_pagan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity test of the daily revenue
    trend: regress squared residuals (euro^2) on the day and report
    LM = n * R^2 — large LM means the variance itself trends, so the
    homoskedastic OLS intervals are wrong.

    100 TB shape: one daily aggregate, one broadcast of the 2
    coefficients, one 6-number reduce.  Determinism: a and b are
    fixed expressions of exact moments, so each squared residual is
    an identical double in both engines; its moments round to 2 dp
    (euro^2) per term and accumulate as exact DECIMALs; R^2/LM are
    single fixed expressions."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    m = _moments(daily)
    b = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast("double")
    a = F.col("sy").cast("double") / F.col("n").cast("double") - b * F.col(
        "st"
    ).cast("double") / F.col("n").cast("double")
    fit = m.select(a.alias("a"), b.alias("b"))
    uu = F.pow(
        (F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("t"))
        / 100,
        2,
    )
    u = daily.crossJoin(F.broadcast(fit)).select("t", uu.alias("uu"))
    um = u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(_dec("t")).alias("st"),
        F.sum(_dec("t") * F.col("t")).alias("stt"),
        F.sum(F.round(F.col("uu"), 2).cast("decimal(38,2)")).alias("su"),
        F.sum(F.round(F.col("uu") * F.col("uu"), 2).cast("decimal(38,2)")).alias(
            "suu"
        ),
        F.sum(F.round(F.col("uu") * F.col("t"), 2).cast("decimal(38,2)")).alias(
            "sut"
        ),
    )
    num = F.pow(
        F.col("n") * F.col("sut").cast("double")
        - F.col("st").cast("double") * F.col("su").cast("double"),
        2,
    )
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
        "double"
    ) * (
        F.col("n") * F.col("suu").cast("double")
        - F.col("su").cast("double") * F.col("su").cast("double")
    )
    return um.select(
        F.col("n").alias("n_days"),
        F.round(num / den, 6).alias("r_squared"),
        F.round(F.col("n") * num / den, 4).alias("lm_stat"),
    )


# ---------------------------------------------------------------------------
# Granger causality (1 lag): does order count lead revenue?
# ---------------------------------------------------------------------------

@register(
    "granger_causality_1lag",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    lagged AS (
        SELECT b.y AS yt, a.y AS yl, a.x AS xl
        FROM daily a JOIN daily b ON b.t = a.t + 1
    ), m AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(CAST(yt AS DECIMAL(38,0))) AS sy,
               SUM(CAST(yl AS DECIMAL(38,0))) AS sa,
               SUM(CAST(xl AS DECIMAL(38,0))) AS sb,
               SUM(CAST(yt AS DECIMAL(38,0)) * yt) AS syy,
               SUM(CAST(yl AS DECIMAL(38,0)) * yl) AS saa,
               SUM(CAST(xl AS DECIMAL(38,0)) * xl) AS sbb,
               SUM(CAST(yl AS DECIMAL(38,0)) * xl) AS sab,
               SUM(CAST(yl AS DECIMAL(38,0)) * yt) AS say,
               SUM(CAST(xl AS DECIMAL(38,0)) * yt) AS sby
        FROM lagged
    ), c AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(n * syy - sy * sy AS DOUBLE) AS cyy,
               CAST(n * saa - sa * sa AS DOUBLE) AS caa,
               CAST(n * sbb - sb * sb AS DOUBLE) AS cbb,
               CAST(n * sab - sa * sb AS DOUBLE) AS cab,
               CAST(n * say - sa * sy AS DOUBLE) AS cay,
               CAST(n * sby - sb * sy AS DOUBLE) AS cby
        FROM m
    ), rss AS (
        SELECT n,
               cyy - cay * cay / caa AS rss_r,
               cyy - (cbb * cay - cab * cby) / (caa * cbb - cab * cab) * cay
                   - (caa * cby - cab * cay) / (caa * cbb - cab * cab) * cby
                   AS rss_u
        FROM c
    )
    SELECT n AS n_pairs,
           ROUND(rss_r / rss_u, 6) AS rss_ratio,
           ROUND((rss_r - rss_u) / (rss_u / (n - 3)), 4) AS f_stat
    FROM rss
    """,
)
def granger_causality_1lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality, 1 lag: does yesterday's order COUNT improve
    the prediction of today's revenue beyond yesterday's revenue?
    F = (RSS_restricted - RSS_unrestricted) / (RSS_u / (n - 3)) with
    the 2-regressor OLS solved in closed form from centered
    cross-moments.

    100 TB shape: one daily aggregate, one shifted equi-join, one
    10-number moment reduce; the 2x2 normal-equation solve is scalar
    algebra.  Determinism: all moments are exact DECIMAL(38) with the
    means cleared by n; RSS and F are fixed IEEE expressions."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    b = daily.select(F.col("t").alias("t2"), F.col("y").alias("yt"))
    lagged = daily.join(b, F.col("t2") == F.col("t") + 1).select(
        "yt", F.col("y").alias("yl"), F.col("x").alias("xl")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = lagged.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("yt")).alias("sy"),
        F.sum(d("yl")).alias("sa"),
        F.sum(d("xl")).alias("sb"),
        F.sum(d("yt") * F.col("yt")).alias("syy"),
        F.sum(d("yl") * F.col("yl")).alias("saa"),
        F.sum(d("xl") * F.col("xl")).alias("sbb"),
        F.sum(d("yl") * F.col("xl")).alias("sab"),
        F.sum(d("yl") * F.col("yt")).alias("say"),
        F.sum(d("xl") * F.col("yt")).alias("sby"),
    )
    c = m.select(
        F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        .cast("double")
        .alias("cyy"),
        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
        .cast("double")
        .alias("caa"),
        (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
        .cast("double")
        .alias("cbb"),
        (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
        .cast("double")
        .alias("cab"),
        (F.col("n") * F.col("say") - F.col("sa") * F.col("sy"))
        .cast("double")
        .alias("cay"),
        (F.col("n") * F.col("sby") - F.col("sb") * F.col("sy"))
        .cast("double")
        .alias("cby"),
    )
    det = F.col("caa") * F.col("cbb") - F.col("cab") * F.col("cab")
    bu = (F.col("cbb") * F.col("cay") - F.col("cab") * F.col("cby")) / det
    cu = (F.col("caa") * F.col("cby") - F.col("cab") * F.col("cay")) / det
    rss_r = F.col("cyy") - F.col("cay") * F.col("cay") / F.col("caa")
    rss_u = F.col("cyy") - bu * F.col("cay") - cu * F.col("cby")
    return c.select(
        F.col("n").alias("n_pairs"),
        F.round(rss_r / rss_u, 6).alias("rss_ratio"),
        F.round((rss_r - rss_u) / (rss_u / (F.col("n") - 3)), 4).alias(
            "f_stat"
        ),
    )


# ---------------------------------------------------------------------------
# Chow structural-break test at the sample midpoint
# ---------------------------------------------------------------------------

# RSS of the OLS trend fit over `src`, in n-cleared central-moment form.
# NO POWER(): squarings are plain multiplications (exactly-rounded IEEE,
# identical across engines), because engine-libm POWER() carries the 1-ulp
# cross-engine drift class that turned chow_break_test red in round 8
# (same fix as round 5's adstock/ses/croston sweep).
def _chow_rss_sql(src: str) -> str:
    return f"""
        SELECT n,
               (cyy - cty * cty / ctt) / CAST(n AS DOUBLE) AS rss
        FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) AS DOUBLE)
                     * CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE)
                   - CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE)
                     * CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS cyy,
                   CAST(COUNT(*) AS DOUBLE)
                     * CAST(SUM(CAST(t AS DECIMAL(38,0)) * y) AS DOUBLE)
                   - CAST(SUM(CAST(t AS DECIMAL(38,0))) AS DOUBLE)
                     * CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS cty,
                   CAST(COUNT(*) AS DOUBLE)
                     * CAST(SUM(CAST(t AS DECIMAL(38,0)) * t) AS DOUBLE)
                   - CAST(SUM(CAST(t AS DECIMAL(38,0))) AS DOUBLE)
                     * CAST(SUM(CAST(t AS DECIMAL(38,0))) AS DOUBLE) AS ctt
            FROM {src}
        )
"""


@register(
    "chow_break_test",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    mid AS (
        SELECT (MIN(t) + MAX(t)) // 2 AS midt FROM daily
    ),
    pooled AS ({_chow_rss_sql("daily")}),
    h1 AS ({_chow_rss_sql("(SELECT daily.* FROM daily"
                          " CROSS JOIN mid WHERE t <= midt)")}),
    h2 AS ({_chow_rss_sql("(SELECT daily.* FROM daily"
                          " CROSS JOIN mid WHERE t > midt)")})
    SELECT p.n AS n_days, h1.n AS n_first, h2.n AS n_second,
           ROUND(p.rss / 1e13, 2) AS rss_pooled_geur2,
           ROUND((h1.rss + h2.rss) / 1e13, 2) AS rss_split_geur2,
           ROUND(((p.rss - h1.rss - h2.rss) / 2)
                 / ((h1.rss + h2.rss) / (p.n - 4)), 4) AS f_stat
    FROM pooled p CROSS JOIN h1 CROSS JOIN h2
    """,
)
def chow_break_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test for a structural break in the revenue trend at the
    calendar midpoint: F = ((RSS_pooled - RSS_1 - RSS_2)/2) /
    ((RSS_1 + RSS_2)/(n - 4)) — did the line's (intercept, slope)
    change between the halves?

    100 TB shape: three 6-number moment reduces over the daily
    aggregate (the midpoint is a broadcast scalar).  Determinism: the
    moments are exact DECIMAL(38) integer sums and every squaring is a
    plain multiplication (exactly-rounded IEEE — no engine-libm
    ``POWER()``, the round-8 red-row cause); the double intermediates
    may still drift by a few ulp across engines (decimal→double cast
    paths differ), so the OUTPUT contract carries the slack: the RSS
    columns are reported in 10^9-eur^2 units, putting the 2-dp rounding
    grid ~10^6 ulp above any intermediate drift (the round-8 contract
    rounded a ~1.16e15 value to 2 dp — digits below one double ulp,
    unstable by construction).  Midpoint is integer arithmetic."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    mid = daily.agg(
        F.floor((F.min("t") + F.max("t")) / 2).cast("long").alias("midt")
    )

    def rss_of(df: DataFrame):
        mm = _moments(df)
        cyy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
        cty = (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).cast(
            "double"
        )
        ctt = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(
            "double"
        )
        return mm.select(
            F.col("n").cast("long").alias("n"),
            ((cyy - cty * cty / ctt) / F.col("n").cast("double")).alias(
                "rss"
            ),
        )

    withmid = daily.crossJoin(F.broadcast(mid))
    pooled = rss_of(daily).select(
        F.col("n").alias("np"), F.col("rss").alias("rssp")
    )
    h1 = rss_of(withmid.where(F.col("t") <= F.col("midt"))).select(
        F.col("n").alias("n1"), F.col("rss").alias("rss1")
    )
    h2 = rss_of(withmid.where(F.col("t") > F.col("midt"))).select(
        F.col("n").alias("n2"), F.col("rss").alias("rss2")
    )
    j = pooled.crossJoin(F.broadcast(h1)).crossJoin(F.broadcast(h2))
    fstat = ((F.col("rssp") - F.col("rss1") - F.col("rss2")) / 2) / (
        (F.col("rss1") + F.col("rss2")) / (F.col("np") - 4)
    )
    return j.select(
        F.col("np").alias("n_days"),
        F.col("n1").alias("n_first"),
        F.col("n2").alias("n_second"),
        F.round(F.col("rssp") / 1e13, 2).alias("rss_pooled_geur2"),
        F.round((F.col("rss1") + F.col("rss2")) / 1e13, 2).alias(
            "rss_split_geur2"
        ),
        F.round(fstat, 4).alias("f_stat"),
    )
