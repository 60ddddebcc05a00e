"""Round-4 wave 19: population estimation, price indices, diversity,
and streak mining.

- ``capture_recapture_estimate``: Lincoln-Petersen / Chapman
  mark-recapture estimate of the active customer population from the
  1995 vs 1996 order cohorts — the ecology estimator that also prices
  dedup completeness ("how many entities exist that we saw twice?").
- ``laspeyres_paasche_index``: classic fixed-basket price indices for
  1995 -> 1996 over parts traded in both years (base-weighted
  Laspeyres, current-weighted Paasche, and Fisher's geometric mean).
- ``simpson_diversity``: unbiased Simpson diversity of part types
  supplied per nation, 1 - sum c(c-1) / n(n-1) — an EXACT integer
  rational (no transcendentals at all), complementing the entropy
  family.
- ``growth_streaks``: longest day-over-day revenue up-streak and
  down-streak with their date ranges — gaps-and-islands over the
  delta-sign sequence.

Cross-engine determinism: everything is exact integer tallies and
single divisions except the Fisher index's one IEEE SQRT and the
9-dp-rounded DECIMAL index terms.

Reference anchor: SURVEY.md §2.11 metrics + §2.5 aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Lincoln-Petersen / Chapman capture-recapture on yearly cohorts
# ---------------------------------------------------------------------------

@register(
    "capture_recapture_estimate",
    """
    WITH seen AS (
        SELECT o_custkey,
               MAX(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                         AND o_orderdate < TIMESTAMP '1996-01-01'
                        THEN 1 ELSE 0 END) AS s1,
               MAX(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                         AND o_orderdate < TIMESTAMP '1997-01-01'
                        THEN 1 ELSE 0 END) AS s2
        FROM orders GROUP BY o_custkey
    ), tally AS (
        SELECT CAST(SUM(s1) AS BIGINT) AS n1,
               CAST(SUM(s2) AS BIGINT) AS n2,
               CAST(SUM(s1 * s2) AS BIGINT) AS m,
               CAST(SUM(CASE WHEN s1 = 1 OR s2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS observed
        FROM seen
    )
    SELECT n1 AS captured_1995, n2 AS captured_1996, m AS recaptured,
           observed,
           ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / CAST(m AS DOUBLE), 2) AS lincoln_petersen,
           ROUND(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                 / CAST(m + 1 AS DOUBLE) - 1, 2) AS chapman
    FROM tally
    """,
)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark-recapture estimate of the active customer population:
    customers ordering in 1995 are the 'marked' sample, 1996 the
    recapture; N_hat = n1*n2/m (Lincoln-Petersen) and the
    bias-corrected Chapman form — the estimator behind 'how many
    entities exist that our two crawls both missed?'.

    100 TB shape: one per-customer flag aggregate + a four-number
    tally.  Determinism: exact integer counts, two fixed
    expressions."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    d95 = F.lit("1995-01-01").cast("timestamp")
    d96 = F.lit("1996-01-01").cast("timestamp")
    d97 = F.lit("1997-01-01").cast("timestamp")
    seen = orders.groupBy("o_custkey").agg(
        F.max(
            F.when(
                (F.col("o_orderdate") >= d95) & (F.col("o_orderdate") < d96),
                1,
            ).otherwise(0)
        ).alias("s1"),
        F.max(
            F.when(
                (F.col("o_orderdate") >= d96) & (F.col("o_orderdate") < d97),
                1,
            ).otherwise(0)
        ).alias("s2"),
    )
    tally = seen.agg(
        F.sum("s1").cast("long").alias("n1"),
        F.sum("s2").cast("long").alias("n2"),
        F.sum(F.col("s1") * F.col("s2")).cast("long").alias("m"),
        F.sum(
            F.when((F.col("s1") == 1) | (F.col("s2") == 1), 1).otherwise(0)
        )
        .cast("long")
        .alias("observed"),
    )
    return tally.select(
        F.col("n1").alias("captured_1995"),
        F.col("n2").alias("captured_1996"),
        F.col("m").alias("recaptured"),
        "observed",
        F.round(
            F.col("n1").cast("double")
            * F.col("n2").cast("double")
            / F.col("m").cast("double"),
            2,
        ).alias("lincoln_petersen"),
        F.round(
            (F.col("n1") + 1).cast("double")
            * (F.col("n2") + 1).cast("double")
            / (F.col("m") + 1).cast("double")
            - 1,
            2,
        ).alias("chapman"),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indices 1995 -> 1996
# ---------------------------------------------------------------------------

@register(
    "laspeyres_paasche_index",
    """
    WITH li AS (
        SELECT l_partkey,
               CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                    THEN 1 ELSE 0 END AS yr,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS rev_c,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
    ), per AS (
        SELECT l_partkey, yr,
               CAST(SUM(rev_c) AS BIGINT) AS rev,
               CAST(SUM(qty) AS BIGINT) AS qty
        FROM li GROUP BY l_partkey, yr
    ), pq AS (
        SELECT l_partkey,
               MAX(CASE WHEN yr = 0 THEN rev END) AS rev0,
               MAX(CASE WHEN yr = 0 THEN qty END) AS qty0,
               MAX(CASE WHEN yr = 1 THEN rev END) AS rev1,
               MAX(CASE WHEN yr = 1 THEN qty END) AS qty1
        FROM per GROUP BY l_partkey
        HAVING MAX(CASE WHEN yr = 0 THEN qty END) > 0
           AND MAX(CASE WHEN yr = 1 THEN qty END) > 0
    ), terms AS (
        SELECT CAST(ROUND(CAST(rev1 AS DOUBLE) / CAST(qty1 AS DOUBLE)
                          * CAST(qty0 AS DOUBLE), 6) AS DECIMAL(38,6))
                   AS p1q0,
               CAST(rev0 AS DECIMAL(38,6)) AS p0q0,
               CAST(rev1 AS DECIMAL(38,6)) AS p1q1,
               CAST(ROUND(CAST(rev0 AS DOUBLE) / CAST(qty0 AS DOUBLE)
                          * CAST(qty1 AS DOUBLE), 6) AS DECIMAL(38,6))
                   AS p0q1
        FROM pq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(p1q0) AS DOUBLE) / CAST(SUM(p0q0) AS DOUBLE), 6)
               AS laspeyres,
           ROUND(CAST(SUM(p1q1) AS DOUBLE) / CAST(SUM(p0q1) AS DOUBLE), 6)
               AS paasche,
           ROUND(SQRT((CAST(SUM(p1q0) AS DOUBLE) / CAST(SUM(p0q0) AS DOUBLE))
                      * (CAST(SUM(p1q1) AS DOUBLE)
                         / CAST(SUM(p0q1) AS DOUBLE))), 6) AS fisher
    FROM terms
    """,
)
def laspeyres_paasche_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic price indices for the 1995 -> 1996 ship-year transition
    over parts traded in both years: Laspeyres (base-quantity
    weighted), Paasche (current-quantity weighted), and the Fisher
    ideal index (their geometric mean) — the standard inflation
    triptych, with unit prices = revenue/quantity per part-year.

    100 TB shape: one (part, year) aggregate (the only corpus-sized
    shuffle), a part-level pivot, then a one-row reduction.
    Determinism: cross-year terms p1*q0 / p0*q1 are rounded to 6 dp
    into DECIMAL sums (own-year terms are exact revenue integers);
    emits are single divisions + one IEEE SQRT."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    d95 = F.lit("1995-01-01").cast("timestamp")
    d96 = F.lit("1996-01-01").cast("timestamp")
    d97 = F.lit("1997-01-01").cast("timestamp")
    li = lineitem.filter(
        (F.col("l_shipdate") >= d95) & (F.col("l_shipdate") < d97)
    ).select(
        "l_partkey",
        F.when(F.col("l_shipdate") >= d96, 1).otherwise(0).alias("yr"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("rev_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    per = li.groupBy("l_partkey", "yr").agg(
        F.sum("rev_c").alias("rev"), F.sum("qty").alias("qty")
    )

    def pick(y: int, col: str):
        return F.max(F.when(F.col("yr") == y, F.col(col)))

    both = (
        per.groupBy("l_partkey")
        .agg(
            pick(0, "rev").alias("rev0"),
            pick(0, "qty").alias("qty0"),
            pick(1, "rev").alias("rev1"),
            pick(1, "qty").alias("qty1"),
        )
        .filter((F.col("qty0") > 0) & (F.col("qty1") > 0))
    )
    p1q0 = F.round(
        F.col("rev1").cast("double")
        / F.col("qty1").cast("double")
        * F.col("qty0").cast("double"),
        6,
    ).cast("decimal(38,6)")
    p0q1 = F.round(
        F.col("rev0").cast("double")
        / F.col("qty0").cast("double")
        * F.col("qty1").cast("double"),
        6,
    ).cast("decimal(38,6)")
    terms = both.select(
        p1q0.alias("p1q0"),
        F.col("rev0").cast("decimal(38,6)").alias("p0q0"),
        F.col("rev1").cast("decimal(38,6)").alias("p1q1"),
        p0q1.alias("p0q1"),
    )
    lasp = F.sum("p1q0").cast("double") / F.sum("p0q0").cast("double")
    paas = F.sum("p1q1").cast("double") / F.sum("p0q1").cast("double")
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


# ---------------------------------------------------------------------------
# Unbiased Simpson diversity of part types per nation
# ---------------------------------------------------------------------------

@register(
    "simpson_diversity",
    """
    WITH mix AS (
        SELECT s_nationkey, p_type,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY s_nationkey, p_type
    ), per AS (
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c * (c - 1)) AS BIGINT) AS pairs_same
        FROM mix GROUP BY s_nationkey
    )
    SELECT n_name, n_types, n,
           ROUND(1 - CAST(pairs_same AS DOUBLE)
                     / CAST(n * (n - 1) AS DOUBLE), 6) AS simpson_d
    FROM per JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_name
    """,
)
def simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased Simpson diversity of the part-type mix each nation's
    suppliers ship: D = 1 - sum c(c-1) / (n(n-1)) — the probability
    two random shipments are DIFFERENT types; an exact integer
    rational (the no-transcendental complement of the entropy
    family).

    100 TB shape: two broadcast dimension joins, one (nation, type)
    tally, one nation-level reduction.  Determinism: all integers, one
    division."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    mix = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("s_nationkey", "p_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per = mix.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("pairs_same"),
    )
    return (
        per.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_types",
            "n",
            F.round(
                1
                - F.col("pairs_same").cast("double")
                / (F.col("n") * (F.col("n") - 1)).cast("double"),
                6,
            ).alias("simpson_d"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Longest revenue growth / decline streaks (gaps and islands)
# ---------------------------------------------------------------------------

@register(
    "growth_streaks",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), sgn AS (
        SELECT day,
               CASE WHEN rev_c > LAG(rev_c) OVER (ORDER BY day) THEN 1
                    WHEN rev_c < LAG(rev_c) OVER (ORDER BY day) THEN -1
                    ELSE 0 END AS s,
               ROW_NUMBER() OVER (ORDER BY day) AS t
        FROM daily
        QUALIFY LAG(rev_c) OVER (ORDER BY day) IS NOT NULL
    ), isl AS (
        SELECT day, s, t,
               t - ROW_NUMBER() OVER (PARTITION BY s ORDER BY t) AS grp
        FROM sgn
    ), runs AS (
        SELECT s, grp,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(day) AS BIGINT) AS start_day,
               CAST(MAX(day) AS BIGINT) AS end_day
        FROM isl GROUP BY s, grp
    )
    SELECT s AS direction,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(MAX(len) AS BIGINT) AS longest,
           CAST(MIN_BY(start_day, -len * 100000 + start_day) AS BIGINT)
               AS longest_start_day,
           CAST(MIN_BY(end_day, -len * 100000 + start_day) AS BIGINT)
               AS longest_end_day
    FROM runs
    GROUP BY s
    ORDER BY direction
    """,
)
def growth_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest day-over-day revenue up-streak, down-streak and
    flat-streak with their date ranges — gaps-and-islands over the
    delta-sign sequence (t - row_number-within-sign is the island
    key), the classic streak-mining query.

    100 TB shape: all windows run over the calendar-bounded daily
    series.  Determinism: signs, islands and lengths are exact
    integers; the longest-run pick uses the single-integer tiebreak
    key -len*1e5 + start_day (earliest longest run wins)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    )
    wd = Window.orderBy("day")
    lagv = F.lag("rev_c").over(wd)
    sgn = (
        daily.select(
            "day",
            F.when(F.col("rev_c") > lagv, 1)
            .when(F.col("rev_c") < lagv, -1)
            .otherwise(0)
            .alias("s"),
            F.row_number().over(wd).alias("t"),
            lagv.alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .drop("prev")
    )
    isl = sgn.withColumn(
        "grp",
        F.col("t")
        - F.row_number().over(Window.partitionBy("s").orderBy("t")),
    )
    runs = isl.groupBy("s", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len"),
        F.min("day").cast("long").alias("start_day"),
        F.max("day").cast("long").alias("end_day"),
    )
    key = -F.col("len") * 100000 + F.col("start_day")
    return (
        runs.groupBy(F.col("s").alias("direction"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_runs"),
            F.max("len").cast("long").alias("longest"),
            F.min_by(F.col("start_day"), key)
            .cast("long")
            .alias("longest_start_day"),
            F.min_by(F.col("end_day"), key)
            .cast("long")
            .alias("longest_end_day"),
        )
        .orderBy("direction")
    )
