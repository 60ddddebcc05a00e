"""Round-4 wave 15: cluster separation, matched binary treatments,
momentum indicators, and whiteness testing.

- ``davies_bouldin_index``: Davies-Bouldin cluster-separation score
  per label over the embeddings (scatter/centroid-distance ratio) —
  the second standard clustering diagnostic next to
  ``clustering_silhouette``, sharing its 9-dp-quantized point +
  DECIMAL centroid machinery.
- ``cochran_q_test``: Cochran's Q for three matched binary quality
  raters on every document — the k-treatment generalization of
  McNemar, computed entirely from exact integer row/column sums.
- ``rsi_indicator``: 14-day relative strength index of daily revenue
  (SMA variant) — RSI = 100 * gains / (gains + losses), an exact
  integer rational per day.
- ``ljung_box_test``: Ljung-Box portmanteau whiteness test of daily
  revenue at lags 1..7 — cumulative Q statistic from the standard
  mean-adjusted autocorrelations, all moments in DECIMAL(38,0).

Cross-engine determinism: all counts/sums exact; per-lag LB terms are
rounded to 12 dp into DECIMAL cumulative sums; emits are fixed double
expressions (IEEE-exact sqrt only).

Reference anchor: SURVEY.md §2.11 metrics family; the DB index audits
the same label space the reference's GCN classifies
(distributed_nograd.py:19-34).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Davies-Bouldin index over embedding labels
# ---------------------------------------------------------------------------

@register(
    "davies_bouldin_index",
    """
    WITH pts AS (
        SELECT vec_id, label AS own,
               generate_subscripts(embedding, 1) AS i,
               ROUND(CAST(unnest(embedding) AS DOUBLE), 9) AS x
        FROM embeddings
    ), cent AS (
        SELECT own AS clabel, i,
               CAST(SUM(CAST(x AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS c
        FROM pts GROUP BY own, i
    ), d2 AS (
        SELECT p.vec_id, p.own,
               CAST(SUM(CAST(ROUND((p.x - c.c) * (p.x - c.c), 12)
                             AS DECIMAL(30,12))) AS DOUBLE) AS dd
        FROM pts p JOIN cent c ON c.i = p.i AND c.clabel = p.own
        GROUP BY p.vec_id, p.own
    ), scat AS (
        SELECT own,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CAST(ROUND(SQRT(dd), 12) AS DECIMAL(30,12)))
                    AS DOUBLE) / COUNT(*) AS s
        FROM d2 GROUP BY own
    ), cd AS (
        SELECT a.clabel AS la, b.clabel AS lb,
               SQRT(CAST(SUM(CAST(ROUND((a.c - b.c) * (a.c - b.c), 12)
                                  AS DECIMAL(30,12))) AS DOUBLE)) AS m
        FROM cent a JOIN cent b ON a.i = b.i AND a.clabel <> b.clabel
        GROUP BY a.clabel, b.clabel
    ), ratio AS (
        SELECT cd.la,
               MAX((sa.s + sb.s) / cd.m) AS db_i
        FROM cd
        JOIN scat sa ON sa.own = cd.la
        JOIN scat sb ON sb.own = cd.lb
        GROUP BY cd.la
    )
    SELECT CAST(s.own AS INT) AS label,
           s.n_points,
           ROUND(s.s, 6) AS scatter,
           ROUND(r.db_i, 6) AS db_component
    FROM scat s JOIN ratio r ON r.la = s.own
    ORDER BY label
    """,
)
def davies_bouldin_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin component per label: S_i = mean point-to-centroid
    distance, M_ij = centroid separation, DB_i = max_j (S_i + S_j) /
    M_ij — lower is better-separated; the overall DB index is the mean
    of the components.

    100 TB shape: identical skeleton to clustering_silhouette — one
    (label, dim) centroid aggregate (k*d = 640 cells, broadcastable),
    one per-point own-centroid distance ride-along, then k x k scalar
    math.  Determinism: 9-dp-quantized points, DECIMAL centroid sums
    with one division, 12-dp DECIMAL distance terms, max/ratio over
    identical doubles."""
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    # The exploded point table feeds two aggregate chains (centroids,
    # own-centroid distances) and the centroid/scatter frames each feed
    # three consumers; unstaged, the final plan re-ran the explode scan
    # eight times.  Lazy checkpoints: pts once (N*d rows), cent (k*d =
    # 640 cells) and scat (k rows) once each — 8 heavy passes -> 3.
    pts = emb.select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode(F.col("embedding").cast("array<double>")),
    ).select(
        "vec_id",
        "own",
        F.col("pos").alias("i"),
        F.round(F.col("col"), 9).alias("x"),
    ).localCheckpoint(eager=False)
    cent = pts.groupBy(F.col("own").alias("clabel"), "i").agg(
        (
            F.sum(F.col("x").cast("decimal(20,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    ).localCheckpoint(eager=False)
    cent_o = cent.select(
        F.col("clabel"), F.col("i").alias("ci"), F.col("c")
    )
    d2 = (
        pts.join(
            F.broadcast(cent_o),
            (pts["i"] == F.col("ci")) & (pts["own"] == F.col("clabel")),
        )
        .groupBy("vec_id", "own")
        .agg(
            F.sum(
                F.round(
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 12
                ).cast("decimal(30,12)")
            )
            .cast("double")
            .alias("dd")
        )
    )
    scat = d2.groupBy("own").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        (
            F.sum(
                F.round(F.sqrt(F.col("dd")), 12).cast("decimal(30,12)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("s"),
    ).localCheckpoint(eager=False)
    ca = cent.select(
        F.col("clabel").alias("la"), F.col("i").alias("ia"), F.col("c").alias("c1")
    )
    cb = cent.select(
        F.col("clabel").alias("lb"), F.col("i").alias("ib"), F.col("c").alias("c2")
    )
    cd = (
        # broadcast: the checkpointed cent is a stats-less LogicalRDD,
        # and k*d = 640 cells is structurally bounded at any data scale
        ca.join(
            F.broadcast(cb),
            (F.col("ia") == F.col("ib")) & (F.col("la") != F.col("lb")),
        )
        .groupBy("la", "lb")
        .agg(
            F.sqrt(
                F.sum(
                    F.round(
                        (F.col("c1") - F.col("c2"))
                        * (F.col("c1") - F.col("c2")),
                        12,
                    ).cast("decimal(30,12)")
                ).cast("double")
            ).alias("m")
        )
    )
    sa = scat.select(F.col("own").alias("la_s"), F.col("s").alias("s_a"))
    sb = scat.select(F.col("own").alias("lb_s"), F.col("s").alias("s_b"))
    ratio = (
        cd.join(F.broadcast(sa), F.col("la") == F.col("la_s"))
        .join(F.broadcast(sb), F.col("lb") == F.col("lb_s"))
        .groupBy("la")
        .agg(F.max((F.col("s_a") + F.col("s_b")) / F.col("m")).alias("db_i"))
    )
    return (
        # broadcast: ratio is k rows (one per label), bounded at any scale
        scat.join(F.broadcast(ratio), scat["own"] == ratio["la"])
        .select(
            F.col("own").cast("int").alias("label"),
            "n_points",
            F.round(F.col("s"), 6).alias("scatter"),
            F.round(F.col("db_i"), 6).alias("db_component"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# Cochran's Q over three matched binary raters
# ---------------------------------------------------------------------------

@register(
    "cochran_q_test",
    """
    WITH rated AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS a,
               CASE WHEN LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
                         >= 50 THEN 1 ELSE 0 END AS b,
               CASE WHEN 4 * (LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))
                              + 1)
                         <= LENGTH(REPLACE(text, ' ', '')) THEN 1 ELSE 0 END
                   AS c
        FROM documents
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(a) AS BIGINT) AS ga,
               CAST(SUM(b) AS BIGINT) AS gb,
               CAST(SUM(c) AS BIGINT) AS gc,
               CAST(SUM(a + b + c) AS BIGINT) AS sr,
               CAST(SUM((a + b + c) * (a + b + c)) AS BIGINT) AS sr2
        FROM rated
    )
    SELECT n, ga, gb, gc,
           ROUND(2.0 * CAST(3 * (CAST(ga AS DECIMAL(38,0)) * ga
                                 + CAST(gb AS DECIMAL(38,0)) * gb
                                 + CAST(gc AS DECIMAL(38,0)) * gc)
                            - CAST(ga + gb + gc AS DECIMAL(38,0))
                              * (ga + gb + gc) AS DOUBLE)
                 / CAST(3 * sr - sr2 AS DOUBLE), 6) AS q_stat
    FROM agg
    """,
)
def cochran_q_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q for three matched binary document raters (length,
    token-count, mean-token-length rules): Q = (k-1)[k sum G_j^2 -
    (sum G_j)^2] / (k sum R_i - sum R_i^2), k = 3 — do the raters pass
    documents at the same rate?  The k-sample generalization of
    McNemar's test.

    100 TB shape: one map-side-combined pass accumulating five integer
    sums; no shuffle beyond the one-row tally.  Determinism: Q is a
    ratio of exact integers (DECIMAL products against overflow), one
    division at emit."""
    documents = load_table(spark, sf_dir, "documents", parallel=True)
    n_tok = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    len_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    rated = documents.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("a"),
        F.when(n_tok >= 50, 1).otherwise(0).alias("b"),
        F.when(4 * n_tok <= len_nospace, 1).otherwise(0).alias("c"),
    )
    r = F.col("a") + F.col("b") + F.col("c")
    agg = rated.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("ga"),
        F.sum("b").cast("long").alias("gb"),
        F.sum("c").cast("long").alias("gc"),
        F.sum(r).cast("long").alias("sr"),
        F.sum(r * r).cast("long").alias("sr2"),
    )
    gsum = (F.col("ga") + F.col("gb") + F.col("gc")).cast("decimal(38,0)")
    gsq = (
        F.col("ga").cast("decimal(38,0)") * F.col("ga")
        + F.col("gb").cast("decimal(38,0)") * F.col("gb")
        + F.col("gc").cast("decimal(38,0)") * F.col("gc")
    )
    q = (
        F.lit(2.0)
        * (F.lit(3) * gsq - gsum * (F.col("ga") + F.col("gb") + F.col("gc")))
        .cast("double")
        / (F.lit(3) * F.col("sr") - F.col("sr2")).cast("double")
    )
    return agg.select(
        "n", "ga", "gb", "gc", F.round(q, 6).alias("q_stat")
    )


# ---------------------------------------------------------------------------
# 14-day RSI of daily revenue
# ---------------------------------------------------------------------------

@register(
    "rsi_indicator",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), deltas AS (
        SELECT day, rev_c - LAG(rev_c) OVER (ORDER BY day) AS delta
        FROM daily
        QUALIFY delta IS NOT NULL
    ), win AS (
        SELECT d.day,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN w.delta > 0 THEN w.delta ELSE 0 END)
                    AS BIGINT) AS gain_c,
               CAST(SUM(CASE WHEN w.delta < 0 THEN -w.delta ELSE 0 END)
                    AS BIGINT) AS loss_c
        FROM deltas d JOIN deltas w ON w.day BETWEEN d.day - 13 AND d.day
        GROUP BY d.day
    )
    SELECT day, n_members,
           ROUND(CAST(gain_c AS DOUBLE) / 100, 2) AS gains,
           ROUND(CAST(loss_c AS DOUBLE) / 100, 2) AS losses,
           CASE WHEN gain_c + loss_c = 0 THEN 50.0
                ELSE ROUND(100.0 * CAST(gain_c AS DOUBLE)
                           / CAST(gain_c + loss_c AS DOUBLE), 4) END AS rsi
    FROM win
    ORDER BY day
    """,
)
def rsi_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day relative strength index (SMA variant) of daily revenue:
    RSI = 100 * gains / (gains + losses) over the trailing 14 days of
    day-over-day changes — the standard momentum oscillator (RSI > 70
    overbought, < 30 oversold).

    100 TB shape: the corpus reduces to the daily aggregate; deltas
    and the trailing window are the calendar-bounded self-join.
    Determinism: gains/losses are exact integer cents; RSI is a single
    division (50.0 emitted when the window is flat)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    wd = Window.orderBy("day")
    deltas = (
        daily.withColumn("delta", F.col("rev_c") - F.lag("rev_c").over(wd))
        .filter(F.col("delta").isNotNull())
        .select("day", "delta")
        # deltas self-joins for the trailing window; staged once -> one
        # daily aggregate + lag instead of two
        .localCheckpoint(eager=False)
    )
    w = deltas.select(
        F.col("day").alias("wday"), F.col("delta").alias("wdelta")
    )
    win = (
        deltas.join(
            w,
            (F.col("wday") >= F.col("day") - 13)
            & (F.col("wday") <= F.col("day")),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(
                F.when(F.col("wdelta") > 0, F.col("wdelta")).otherwise(0)
            )
            .cast("long")
            .alias("gain_c"),
            F.sum(
                F.when(F.col("wdelta") < 0, -F.col("wdelta")).otherwise(0)
            )
            .cast("long")
            .alias("loss_c"),
        )
    )
    tot = F.col("gain_c") + F.col("loss_c")
    return win.select(
        "day",
        "n_members",
        F.round(F.col("gain_c").cast("double") / 100, 2).alias("gains"),
        F.round(F.col("loss_c").cast("double") / 100, 2).alias("losses"),
        F.when(tot == 0, F.lit(50.0))
        .otherwise(
            F.round(
                F.lit(100.0) * F.col("gain_c").cast("double")
                / tot.cast("double"),
                4,
            )
        )
        .alias("rsi"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Ljung-Box whiteness test at lags 1..7
# ---------------------------------------------------------------------------

@register(
    "ljung_box_test",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), gm AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev_c) AS BIGINT) AS s,
               SUM(CAST(rev_c AS DECIMAL(38,0)) * rev_c) AS q2
        FROM daily
    ), lagged AS (
        SELECT k.lag,
               CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(a.rev_c) AS BIGINT) AS sx,
               CAST(SUM(b.rev_c) AS BIGINT) AS sy,
               SUM(CAST(a.rev_c AS DECIMAL(38,0)) * b.rev_c) AS sxy
        FROM (SELECT UNNEST(range(1, 8)) AS lag) k
        JOIN daily a ON TRUE
        JOIN daily b ON b.day = a.day + k.lag
        GROUP BY k.lag
    ), r AS (
        SELECT lag, np,
               (CAST(sxy AS DOUBLE)
                - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * CAST(sx + sy AS DOUBLE)
                + CAST(np AS DOUBLE)
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
               / (CAST(q2 AS DOUBLE)
                  - CAST(s AS DOUBLE) * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                   AS rk,
               n
        FROM lagged CROSS JOIN gm
    ), terms AS (
        SELECT lag, np, rk, n,
               CAST(ROUND(rk * rk / CAST(n - lag AS DOUBLE), 12)
                    AS DECIMAL(30,12)) AS term
        FROM r
    )
    SELECT CAST(lag AS BIGINT) AS lag, np AS n_pairs,
           ROUND(rk, 6) AS acf_k,
           ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
                 * CAST(SUM(term) OVER (ORDER BY lag
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE), 6) AS q_stat
    FROM terms
    ORDER BY lag
    """,
)
def ljung_box_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test of daily revenue at lags 1..7:
    r_k = sum_t (x_t - xbar)(x_{t+k} - xbar) / sum_t (x_t - xbar)^2
    (pairs over days present), Q(h) = n(n+2) sum_{k<=h} r_k^2/(n-k)
    cumulative per lag — the standard residual-whiteness screen run
    after any forecast fit (here: is revenue serially correlated at
    all?).

    100 TB shape: one daily aggregate + one shifted-calendar equi-join
    per lag (the revenue_autocorrelation pattern); everything after is
    7-row math.  Determinism: all moments are DECIMAL(38,0) integer
    sums; r_k is a fixed double expression; per-lag LB terms round to
    12 dp into a DECIMAL running sum."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    rd = F.col("rev_c").cast("decimal(38,0)")
    glob = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev_c").alias("s"),
        F.sum(rd * F.col("rev_c")).alias("q2"),
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("day").alias("da"), F.col("rev_c").alias("xa"))
    b = daily.select(F.col("day").alias("db_"), F.col("rev_c").alias("xb"))
    lagged = (
        lags.crossJoin(a)
        .join(b, F.col("db_") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("np"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum(F.col("xa").cast("decimal(38,0)") * F.col("xb")).alias(
                "sxy"
            ),
        )
    )
    j = lagged.crossJoin(F.broadcast(glob))
    mu = F.col("s").cast("double") / F.col("n").cast("double")
    rk = (
        F.col("sxy").cast("double")
        - mu * (F.col("sx") + F.col("sy")).cast("double")
        + F.col("np").cast("double") * mu * mu
    ) / (
        F.col("q2").cast("double") - F.col("s").cast("double") * mu
    )
    terms = j.select(
        "lag",
        "np",
        rk.alias("rk"),
        "n",
        F.round(
            rk * rk / (F.col("n") - F.col("lag")).cast("double"), 12
        )
        .cast("decimal(30,12)")
        .alias("term"),
    )
    wl = Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)
    return terms.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("np").alias("n_pairs"),
        F.round(F.col("rk"), 6).alias("acf_k"),
        F.round(
            F.col("n").cast("double")
            * (F.col("n") + 2).cast("double")
            * F.sum("term").over(wl).cast("double"),
            6,
        ).alias("q_stat"),
    ).orderBy("lag")
