"""Round-4 wave 31: survival hazards and forecast evaluation — the
queries that grade a forecasting system instead of just fitting one.

- ``nelson_aalen_hazard``: the Nelson-Aalen cumulative-hazard
  estimator H(t) = sum d_i/n_i over user churn durations, with the
  Breslow survival exp(-H) — the robust companion of
  ``kaplan_meier_churn`` (same risk sets, additive instead of
  multiplicative).
- ``forecast_accuracy_report``: an 80/20 calendar split of daily
  revenue; naive (last train value) and seasonal-naive-7 forecasts
  graded by MAE, MASE (scaled by the train one-step naive MAE — the
  Hyndman-Koehler scale-free standard) and sMAPE.
- ``pinball_quantile_eval``: per-weekday train quantiles (q10/q50/q90,
  exact order statistics) as quantile forecasts for the test days,
  graded by pinball (quantile) loss and empirical coverage — the
  probabilistic-forecast scoreboard.
- ``croston_demand_forecast``: Croston's method for intermittent
  demand — per sampled part, 20-term truncated SES over nonzero
  demand SIZES and over inter-demand INTERVALS; forecast =
  size_level / interval_level (demand per day).

Cross-engine determinism: risk sets, demand tallies, |error| sums and
coverage counts are exact integers; hazard terms, decayed SES
weights, sMAPE and pinball terms round to fixed dp and accumulate as
exact DECIMALs; every emitted statistic is a single fixed expression.

Reference anchor: SURVEY.md §2.11 metrics; extends kaplan_meier_churn
(queries_wave4), ses_gridsearch (queries_wave16), forecast_revenue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import _event_epoch_sec, register

_DAILY_SQL = """
    SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS t,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS y
    FROM orders GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    return orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("t")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y")
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard
# ---------------------------------------------------------------------------

@register(
    "nelson_aalen_hazard",
    """
    WITH ev AS (
        SELECT user_id, epoch_ns(ts) // 1000000000 // 86400 AS day
        FROM events
    ), span AS (
        SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day
        FROM ev GROUP BY user_id
    ), mx AS (
        SELECT MAX(last_day) AS max_day FROM span
    ), obs AS (
        SELECT last_day - first_day AS duration,
               CASE WHEN last_day < (SELECT max_day FROM mx)
                    THEN 1 ELSE 0 END AS churned
        FROM span
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM obs
    ), byd AS (
        SELECT duration,
               CAST(COUNT(*) AS BIGINT) AS n_leaving,
               CAST(SUM(churned) AS BIGINT) AS n_events
        FROM obs GROUP BY duration
    ), risk AS (
        SELECT duration, n_leaving, n_events,
               (SELECT n_users FROM tot)
                   - CAST(COALESCE(SUM(n_leaving) OVER (
                         ORDER BY duration
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS BIGINT) AS n_risk
        FROM byd
    ), steps AS (
        SELECT duration, n_risk, n_events,
               CAST(ROUND(CAST(n_events AS DOUBLE) / n_risk, 12)
                    AS DECIMAL(24,12)) AS hz
        FROM risk WHERE n_events > 0
    )
    SELECT CAST(duration AS BIGINT) AS duration, n_risk, n_events,
           ROUND(CAST(SUM(hz) OVER (ORDER BY duration) AS DOUBLE), 6)
               AS cum_hazard,
           ROUND(EXP(-CAST(SUM(hz) OVER (ORDER BY duration) AS DOUBLE)), 6)
               AS breslow_survival
    FROM steps ORDER BY duration
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of user churn (duration = days
    between a user's first and last event; censored if still active on
    the corpus's final day): H(t) = sum of d_i/n_i over event times
    <= t, plus the Breslow survival exp(-H) — the additive, small-risk-
    set-robust sibling of Kaplan-Meier over the SAME risk sets.

    100 TB shape: per-user span reduce, then a duration-bounded tally
    and a calendar-sized cumulative window.  Determinism: risk sets
    are exact integers; each hazard increment rounds to 12 dp and
    accumulates as an exact DECIMAL; survival is one EXP per row."""
    events = load_table(spark, sf_dir, "events", parallel=True)
    day = (_event_epoch_sec(events) / 86400).cast("long")
    span = events.select(
        "user_id", day.alias("day")
    ).groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    mx = span.agg(F.max("last_day").alias("max_day"))
    obs = span.crossJoin(F.broadcast(mx)).select(
        (F.col("last_day") - F.col("first_day")).alias("duration"),
        F.when(F.col("last_day") < F.col("max_day"), 1).otherwise(0).alias(
            "churned"
        ),
    )
    # duration-bounded tally; materialize once so the total-user count
    # and the risk-set window both read it instead of re-scanning events
    byd = (
        obs.groupBy("duration")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_leaving"),
            F.sum("churned").cast("long").alias("n_events"),
        )
        .localCheckpoint(eager=True)
    )
    tot = byd.agg(F.sum("n_leaving").cast("long").alias("n_users"))
    w = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = byd.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_leaving").over(w), F.lit(0))
        ).cast("long"),
    )
    steps = risk.where(F.col("n_events") > 0).withColumn(
        "hz",
        F.round(
            F.col("n_events").cast("double") / F.col("n_risk"), 12
        ).cast("decimal(24,12)"),
    )
    wc = Window.orderBy("duration")
    return steps.select(
        F.col("duration").cast("long").alias("duration"),
        "n_risk",
        "n_events",
        F.round(F.sum("hz").over(wc).cast("double"), 6).alias("cum_hazard"),
        F.round(F.exp(-F.sum("hz").over(wc).cast("double")), 6).alias(
            "breslow_survival"
        ),
    ).orderBy("duration")


# ---------------------------------------------------------------------------
# Forecast accuracy report (naive vs seasonal-naive-7)
# ---------------------------------------------------------------------------

@register(
    "forecast_accuracy_report",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    bounds AS (
        SELECT MIN(t) AS mn, MAX(t) AS mx,
               MIN(t) + CAST(FLOOR(0.8 * (MAX(t) - MIN(t))) AS BIGINT)
                   AS cut
        FROM daily
    ), last_train AS (
        SELECT d.y AS y_last
        FROM daily d CROSS JOIN bounds b
        WHERE d.t = (SELECT MAX(t) FROM daily, bounds WHERE t <= cut)
    ), scale AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(ABS(b2.y - a.y)) AS BIGINT) AS sad
        FROM daily a JOIN daily b2 ON b2.t = a.t + 1
        CROSS JOIN bounds b WHERE b2.t <= b.cut
    ), test AS (
        SELECT d.t, d.y, lt.y_last AS f_naive, s7.y AS f_sn
        FROM daily d
        CROSS JOIN bounds b
        CROSS JOIN last_train lt
        JOIN daily s7 ON s7.t = d.t - 7
        WHERE d.t > b.cut
    ), per AS (
        SELECT 'naive' AS method,
               CAST(COUNT(*) AS BIGINT) AS n_eval,
               CAST(SUM(ABS(y - f_naive)) AS BIGINT) AS sae,
               SUM(CAST(ROUND(2.0 * ABS(y - f_naive) / (y + f_naive), 9)
                        AS DECIMAL(28,9))) AS smape_sum
        FROM test
        UNION ALL
        SELECT 'seasonal7',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(ABS(y - f_sn)) AS BIGINT),
               SUM(CAST(ROUND(2.0 * ABS(y - f_sn) / (y + f_sn), 9)
                        AS DECIMAL(28,9)))
        FROM test
    )
    SELECT method, n_eval,
           ROUND(CAST(sae AS DOUBLE) / n_eval / 100, 2) AS mae_eur,
           ROUND((CAST(sae AS DOUBLE) / n_eval)
                 / (CAST((SELECT sad FROM scale) AS DOUBLE)
                    / (SELECT m FROM scale)), 4) AS mase,
           ROUND(CAST(smape_sum AS DOUBLE) / n_eval, 6) AS smape
    FROM per ORDER BY method
    """,
)
def forecast_accuracy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-evaluation scoreboard on an 80/20 calendar split of
    daily revenue: the naive (last train value) and seasonal-naive-7
    baselines graded by MAE, MASE (MAE / train one-step naive MAE —
    the scale-free Hyndman-Koehler measure every real forecast must
    beat: MASE < 1) and sMAPE.

    100 TB shape: one daily aggregate; the split boundary, last train
    value and naive scale are broadcast scalars; the seasonal join is
    a shifted calendar equi-join.  Determinism: absolute errors are
    exact integer cents; sMAPE terms round to 9 dp into exact DECIMAL
    sums; emits are fixed expressions."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    bounds = daily.agg(
        F.min("t").alias("mn"),
        F.max("t").alias("mx"),
        (F.min("t") + F.floor(0.8 * (F.max("t") - F.min("t"))))
        .cast("long")
        .alias("cut"),
    )
    wb = daily.crossJoin(F.broadcast(bounds))
    last_train = (
        wb.where(F.col("t") <= F.col("cut"))
        .orderBy(F.col("t").desc())
        .limit(1)
        .select(F.col("y").alias("y_last"))
    )
    nxt = daily.select(F.col("t").alias("t2"), F.col("y").alias("y2"))
    scale = (
        wb.join(nxt, F.col("t2") == F.col("t") + 1)
        .where(F.col("t2") <= F.col("cut"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(F.abs(F.col("y2") - F.col("y"))).cast("long").alias("sad"),
        )
    )
    s7 = daily.select((F.col("t") + 7).alias("t"), F.col("y").alias("f_sn"))
    # calendar-bounded; materialize once for the two method aggregates
    test = (
        wb.where(F.col("t") > F.col("cut"))
        .join(s7, "t")
        .crossJoin(F.broadcast(last_train))
        .select("t", "y", F.col("y_last").alias("f_naive"), "f_sn")
        .localCheckpoint(eager=True)
    )

    def per(method: str, fcol: str) -> DataFrame:
        return test.agg(
            F.lit(method).alias("method"),
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(F.abs(F.col("y") - F.col(fcol))).cast("long").alias("sae"),
            F.sum(
                F.round(
                    2.0 * F.abs(F.col("y") - F.col(fcol))
                    / (F.col("y") + F.col(fcol)),
                    9,
                ).cast("decimal(28,9)")
            ).alias("smape_sum"),
        ).select("method", "n_eval", "sae", "smape_sum")

    per_both = per("naive", "f_naive").unionByName(per("seasonal7", "f_sn"))
    j = per_both.crossJoin(F.broadcast(scale))
    mae = F.col("sae").cast("double") / F.col("n_eval")
    naive_scale = F.col("sad").cast("double") / F.col("m")
    return j.select(
        "method",
        "n_eval",
        F.round(mae / 100, 2).alias("mae_eur"),
        F.round(mae / naive_scale, 4).alias("mase"),
        F.round(
            F.col("smape_sum").cast("double") / F.col("n_eval"), 6
        ).alias("smape"),
    ).orderBy("method")


# ---------------------------------------------------------------------------
# Pinball-loss quantile forecast evaluation
# ---------------------------------------------------------------------------

@register(
    "pinball_quantile_eval",
    f"""
    WITH daily AS ({_DAILY_SQL}),
    bounds AS (
        SELECT MIN(t) + CAST(FLOOR(0.8 * (MAX(t) - MIN(t))) AS BIGINT)
                   AS cut
        FROM daily
    ), train AS (
        SELECT t % 7 AS dow, y FROM daily CROSS JOIN bounds
        WHERE t <= cut
    ), ranked AS (
        SELECT dow, y,
               ROW_NUMBER() OVER (PARTITION BY dow ORDER BY y) AS rn,
               COUNT(*) OVER (PARTITION BY dow) AS n
        FROM train
    ), qf AS (
        SELECT q.q, r.dow, r.y AS f
        FROM (SELECT UNNEST([0.1, 0.5, 0.9]) AS q) q
        JOIN ranked r
          ON r.rn = CAST(CEIL(q.q * r.n) AS BIGINT)
    ), test AS (
        SELECT t % 7 AS dow, y FROM daily CROSS JOIN bounds
        WHERE t > cut
    ), scored AS (
        SELECT q.q, t.y, q.f,
               CAST(ROUND(GREATEST(q.q * (t.y - q.f),
                                   (q.q - 1) * (t.y - q.f)) / 100, 4)
                    AS DECIMAL(28,4)) AS pinball,
               CASE WHEN t.y <= q.f THEN 1 ELSE 0 END AS covered
        FROM test t JOIN qf q ON q.dow = t.dow
    )
    SELECT q AS quantile,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           ROUND(CAST(SUM(pinball) AS DOUBLE) / COUNT(*), 4)
               AS mean_pinball_eur,
           ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 4) AS coverage
    FROM scored GROUP BY q ORDER BY q
    """,
)
def pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic-forecast scoreboard: per-weekday train quantiles
    (q10/q50/q90, exact order statistics with rank = ceil(q*n)) used
    as quantile forecasts for the 20% test days, graded by mean
    pinball loss and empirical coverage (coverage ~ q means the
    quantile forecast is calibrated).

    100 TB shape: the train quantile table is 7 x 3 rows (per-weekday
    window over the calendar-bounded daily aggregate); scoring is a
    broadcast join on weekday.  Determinism: order statistics are
    SELECTED values with integer ranks; pinball terms round to 4 dp
    euros into exact DECIMAL sums; coverage is an exact count."""
    daily = _daily(spark, sf_dir).localCheckpoint(eager=True)
    bounds = daily.agg(
        (F.min("t") + F.floor(0.8 * (F.max("t") - F.min("t"))))
        .cast("long")
        .alias("cut")
    )
    wb = daily.crossJoin(F.broadcast(bounds))
    train = wb.where(F.col("t") <= F.col("cut")).select(
        (F.col("t") % 7).alias("dow"), "y"
    )
    wq = Window.partitionBy("dow").orderBy("y")
    ranked = train.withColumn("rn", F.row_number().over(wq)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("dow"))
    )
    qs = spark.createDataFrame([(0.1,), (0.5,), (0.9,)], "q double")
    qf = (
        ranked.crossJoin(F.broadcast(qs))
        .where(F.col("rn") == F.ceil(F.col("q") * F.col("n")).cast("long"))
        .select("q", "dow", F.col("y").alias("f"))
        .localCheckpoint(eager=True)
    )
    test = wb.where(F.col("t") > F.col("cut")).select(
        (F.col("t") % 7).alias("dow"), "y"
    )
    err = F.col("y") - F.col("f")
    scored = test.join(F.broadcast(qf), "dow").select(
        "q",
        F.round(
            F.greatest(F.col("q") * err, (F.col("q") - 1) * err) / 100, 4
        )
        .cast("decimal(28,4)")
        .alias("pinball"),
        F.when(F.col("y") <= F.col("f"), 1).otherwise(0).alias("covered"),
    )
    return (
        scored.groupBy(F.col("q").alias("quantile"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.round(
                F.sum("pinball").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_pinball_eur"),
            F.round(
                F.sum("covered").cast("double") / F.count(F.lit(1)), 4
            ).alias("coverage"),
        )
        .orderBy("quantile")
    )


# ---------------------------------------------------------------------------
# Croston's method for intermittent demand
# ---------------------------------------------------------------------------

_CR_ALPHA = 0.2
_CR_TERMS = 20
# Croston smoothing weights alpha*(1-alpha)^k as SHARED literals:
# engine POWER() drifts by ulps (the adstock lesson); a literal
# table computed once here is bit-identical in both engines.
_CR_W = tuple(_CR_ALPHA * (1 - _CR_ALPHA) ** k for k in range(_CR_TERMS))
_cr_w_sql = '([' + ', '.join(repr(w) for w in _CR_W) + '])'
_CR_MOD = 199


@register(
    "croston_demand_forecast",
    f"""
    WITH demand AS (
        SELECT l_partkey AS part,
               date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                   AS day,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
        FROM lineitem
        WHERE l_partkey % {_CR_MOD} = 3
        GROUP BY 1, 2
    ), idxd AS (
        SELECT part, day, d,
               CAST(ROW_NUMBER() OVER (PARTITION BY part ORDER BY day)
                    AS BIGINT) AS idx
        FROM demand
    ), iv AS (
        SELECT b.part, b.idx, b.d,
               b.day - a.day AS tau
        FROM idxd b LEFT JOIN idxd a
          ON a.part = b.part AND a.idx = b.idx - 1
    ), lastidx AS (
        SELECT part, MAX(idx) AS mx, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM idxd GROUP BY part
    ), terms AS (
        SELECT l.part, l.n_events, k.k,
               v.d AS s_k, v.tau AS tau_k
        FROM lastidx l
        JOIN (SELECT UNNEST(range(0, {_CR_TERMS})) AS k) k ON TRUE
        JOIN iv v ON v.part = l.part AND v.idx = l.mx - k.k
    ), lev AS (
        SELECT part, n_events,
               SUM(CAST(ROUND({_cr_w_sql}[k + 1] * s_k,
                              6) AS DECIMAL(28,6))) AS size_num,
               SUM(CAST(ROUND({_cr_w_sql}[k + 1], 9)
                        AS DECIMAL(28,9))) AS size_den,
               SUM(CASE WHEN tau_k IS NOT NULL THEN
                   CAST(ROUND({_cr_w_sql}[k + 1] * tau_k,
                              6) AS DECIMAL(28,6)) END) AS tau_num,
               SUM(CASE WHEN tau_k IS NOT NULL THEN
                   CAST(ROUND({_cr_w_sql}[k + 1], 9)
                        AS DECIMAL(28,9)) END) AS tau_den
        FROM terms GROUP BY part, n_events
    )
    SELECT CAST(part AS BIGINT) AS part, n_events,
           ROUND(CAST(size_num AS DOUBLE) / CAST(size_den AS DOUBLE), 4)
               AS size_level,
           ROUND(CAST(tau_num AS DOUBLE) / CAST(tau_den AS DOUBLE), 4)
               AS interval_level,
           ROUND((CAST(size_num AS DOUBLE) / CAST(size_den AS DOUBLE))
                 / (CAST(tau_num AS DOUBLE) / CAST(tau_den AS DOUBLE)), 4)
               AS demand_per_day
    FROM lev WHERE tau_den IS NOT NULL
    ORDER BY part
    """,
)
def croston_demand_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand on sampled parts:
    exponential smoothing (alpha=0.2, 20-term truncated, weights
    renormalized) over the nonzero demand SIZES and over the
    INTER-DEMAND intervals separately; the demand-per-day forecast is
    size_level / interval_level — the standard spare-parts forecasting
    estimator, where plain SES is biased by the zeros.

    100 TB shape: demand events tally per (part, day); the smoothing
    is a 20-row broadcast join against each part's most recent events
    (never a full-history window); parts partition independently.
    Determinism: sizes/intervals are exact integers; decayed terms
    round to 6/9 dp into exact DECIMAL sums; emits are fixed
    expressions."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    demand = (
        lineitem.where(F.col("l_partkey") % _CR_MOD == 3)
        .groupBy(
            F.col("l_partkey").alias("part"),
            F.unix_date(F.to_date("l_shipdate")).cast("long").alias("day"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("d"))
    )
    wi = Window.partitionBy("part").orderBy("day")
    idxd = demand.withColumn(
        "idx", F.row_number().over(wi).cast("long")
    ).localCheckpoint(eager=True)
    prev = idxd.select(
        F.col("part").alias("part2"),
        (F.col("idx") + 1).alias("idx2"),
        F.col("day").alias("prev_day"),
    )
    iv = idxd.join(
        prev,
        (F.col("part") == F.col("part2")) & (F.col("idx") == F.col("idx2")),
        "left",
    ).select("part", "idx", "d", (F.col("day") - F.col("prev_day")).alias("tau"))
    lastidx = idxd.groupBy("part").agg(
        F.max("idx").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    ks = spark.range(0, _CR_TERMS).select(F.col("id").alias("k"))
    terms = (
        lastidx.crossJoin(F.broadcast(ks))
        .join(
            iv,
            (iv.part == lastidx.part) & (iv.idx == F.col("mx") - F.col("k")),
        )
        .select(
            lastidx.part.alias("part"),
            "n_events",
            "k",
            F.col("d").alias("s_k"),
            F.col("tau").alias("tau_k"),
        )
    )
    wgt = F.element_at(
        F.lit(list(_CR_W)), (F.col("k") + 1).cast("int")
    )
    lev = terms.groupBy("part", "n_events").agg(
        F.sum(F.round(wgt * F.col("s_k"), 6).cast("decimal(28,6)")).alias(
            "size_num"
        ),
        F.sum(F.round(wgt, 9).cast("decimal(28,9)")).alias("size_den"),
        F.sum(
            F.when(
                F.col("tau_k").isNotNull(),
                F.round(wgt * F.col("tau_k"), 6).cast("decimal(28,6)"),
            )
        ).alias("tau_num"),
        F.sum(
            F.when(
                F.col("tau_k").isNotNull(),
                F.round(wgt, 9).cast("decimal(28,9)"),
            )
        ).alias("tau_den"),
    )
    size_level = F.col("size_num").cast("double") / F.col("size_den").cast(
        "double"
    )
    tau_level = F.col("tau_num").cast("double") / F.col("tau_den").cast(
        "double"
    )
    return (
        lev.where(F.col("tau_den").isNotNull())
        .select(
            F.col("part").cast("long").alias("part"),
            "n_events",
            F.round(size_level, 4).alias("size_level"),
            F.round(tau_level, 4).alias("interval_level"),
            F.round(size_level / tau_level, 4).alias("demand_per_day"),
        )
        .orderBy("part")
    )
