"""Round-4 wave 20: rate comparison, fence-based outlier screening,
and demand-variability classification.

- ``poisson_rate_test``: two-sample Poisson rate comparison of order
  arrivals, 1995 vs 1996 (exact counts and exposures, the square-root
  variance-stabilized z statistic).
- ``tukey_fences_report``: per-priority Tukey boxplot fences
  (Q1/Q3 from the value-domain histogram, 1.5x and 3x IQR) with
  exact outlier counts — the boxplot-rule complement of the Grubbs
  single-outlier test.
- ``xyz_demand_classes``: XYZ inventory classification of parts by
  the coefficient of variation of their monthly demand (X < 0.5 <=
  Y < 1.0 <= Z) — the variability axis that pairs with
  ``abc_revenue_classes``'s value axis.

Cross-engine determinism: counts, rank selections and class
boundaries are exact integers (CV classification compares the exact
integer inequality 4*(nQ - S^2) vs n*S^2 etc. — never a rounded
float); emitted statistics are fixed double expressions.

Reference anchor: SURVEY.md §2.11 metrics + §2.5 aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Two-sample Poisson rate test on yearly order arrivals
# ---------------------------------------------------------------------------

@register(
    "poisson_rate_test",
    """
    WITH tally AS (
        SELECT CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                              AND o_orderdate < TIMESTAMP '1996-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k1,
               CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                              AND o_orderdate < TIMESTAMP '1997-01-01'
                             THEN 1 ELSE 0 END) AS BIGINT) AS k2
        FROM orders
    )
    SELECT k1 AS orders_1995, k2 AS orders_1996,
           ROUND(CAST(k1 AS DOUBLE) / 365, 4) AS rate_1995_per_day,
           ROUND(CAST(k2 AS DOUBLE) / 366, 4) AS rate_1996_per_day,
           ROUND(2 * (SQRT(CAST(k2 AS DOUBLE) + 0.375)
                      - SQRT(CAST(k1 AS DOUBLE) + 0.375))
                 / SQRT(1.0 + 366.0 / 365.0), 6) AS z_anscombe
    FROM tally
    """,
)
def poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate comparison of order arrivals in 1995 vs
    1996 (exposures 365 vs 366 days) using the Anscombe
    variance-stabilizing transform: z = 2(sqrt(k2+3/8) - sqrt(k1+3/8))
    / sqrt(1 + t2/t1) — did the arrival rate change?

    100 TB shape: one two-cell tally.  Determinism: exact counts, one
    fixed expression with IEEE-exact square roots."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    d95 = F.lit("1995-01-01").cast("timestamp")
    d96 = F.lit("1996-01-01").cast("timestamp")
    d97 = F.lit("1997-01-01").cast("timestamp")
    tally = orders.agg(
        F.sum(
            F.when(
                (F.col("o_orderdate") >= d95) & (F.col("o_orderdate") < d96),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("k1"),
        F.sum(
            F.when(
                (F.col("o_orderdate") >= d96) & (F.col("o_orderdate") < d97),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("k2"),
    )
    z = (
        2
        * (
            F.sqrt(F.col("k2").cast("double") + 0.375)
            - F.sqrt(F.col("k1").cast("double") + 0.375)
        )
        / F.sqrt(F.lit(1.0) + F.lit(366.0) / F.lit(365.0))
    )
    return tally.select(
        F.col("k1").alias("orders_1995"),
        F.col("k2").alias("orders_1996"),
        F.round(F.col("k1").cast("double") / 365, 4).alias(
            "rate_1995_per_day"
        ),
        F.round(F.col("k2").cast("double") / 366, 4).alias(
            "rate_1996_per_day"
        ),
        F.round(z, 6).alias("z_anscombe"),
    )


# ---------------------------------------------------------------------------
# Tukey fences per priority from the value-domain histogram
# ---------------------------------------------------------------------------

@register(
    "tukey_fences_report",
    """
    WITH vals AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
        FROM orders
    ), hist AS (
        SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM vals GROUP BY grp, v
    ), cum AS (
        SELECT grp, v, c,
               SUM(c) OVER (PARTITION BY grp ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm,
               SUM(c) OVER (PARTITION BY grp) AS n
        FROM hist
    ), q AS (
        SELECT grp,
               CAST(ANY_VALUE(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cm >= (n + 3) // 4 THEN v END) AS BIGINT)
                   AS q1,
               CAST(MIN(CASE WHEN cm >= (3 * n + 3) // 4 THEN v END)
                    AS BIGINT) AS q3
        FROM cum GROUP BY grp
    ), fenced AS (
        SELECT h.grp, q.n, q.q1, q.q3,
               q.q3 - q.q1 AS iqr,
               CAST(SUM(CASE WHEN 2 * h.v < 2 * q.q1 - 3 * (q.q3 - q.q1)
                               OR 2 * h.v > 2 * q.q3 + 3 * (q.q3 - q.q1)
                             THEN h.c ELSE 0 END) AS BIGINT) AS n_outliers,
               CAST(SUM(CASE WHEN h.v < q.q1 - 3 * (q.q3 - q.q1)
                               OR h.v > q.q3 + 3 * (q.q3 - q.q1)
                             THEN h.c ELSE 0 END) AS BIGINT) AS n_extreme
        FROM hist h JOIN q ON h.grp = q.grp
        GROUP BY h.grp, q.n, q.q1, q.q3
    )
    SELECT grp, n,
           ROUND(CAST(q1 AS DOUBLE) / 100, 2) AS q1,
           ROUND(CAST(q3 AS DOUBLE) / 100, 2) AS q3,
           ROUND(CAST(iqr AS DOUBLE) / 100, 2) AS iqr,
           n_outliers, n_extreme
    FROM fenced
    ORDER BY grp
    """,
)
def tukey_fences_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot-rule outlier report per priority: Q1/Q3 as exact
    type-1 order statistics (rank ceil(n/4), ceil(3n/4)) from the
    value-domain histogram, counts outside the 1.5x-IQR fences
    (outliers) and 3x-IQR fences (extreme) — the screening rule every
    boxplot encodes.

    100 TB shape: one (group, value) histogram; quartiles come from a
    cumulative scan over distinct values per group (no row sort); the
    fence counts ride the same histogram.  Determinism: quartiles are
    exact data values; the 1.5x fence comparison is doubled (2v vs
    2Q1 - 3*IQR) so it stays pure integer arithmetic."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    vals = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    # hist feeds both the quartile walk and the fence counts; staged
    # once -> one fact histogram instead of two
    hist = vals.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).localCheckpoint(eager=False)
    wcm = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "grp",
        "v",
        "c",
        F.sum("c").over(wcm).alias("cm"),
        F.sum("c").over(Window.partitionBy("grp")).alias("n"),
    )
    q = cum.groupBy("grp").agg(
        F.any_value(F.col("n")).cast("long").alias("n"),
        F.min(
            F.when(
                F.col("cm") >= F.floor((F.col("n") + 3) / 4), F.col("v")
            )
        )
        .cast("long")
        .alias("q1"),
        F.min(
            F.when(
                F.col("cm") >= F.floor((3 * F.col("n") + 3) / 4), F.col("v")
            )
        )
        .cast("long")
        .alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    fenced = (
        hist.join(q, "grp")
        .groupBy("grp", "n", "q1", "q3")
        .agg(
            F.sum(
                F.when(
                    (2 * F.col("v") < 2 * F.col("q1") - 3 * iqr)
                    | (2 * F.col("v") > 2 * F.col("q3") + 3 * iqr),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
            F.sum(
                F.when(
                    (F.col("v") < F.col("q1") - 3 * iqr)
                    | (F.col("v") > F.col("q3") + 3 * iqr),
                    F.col("c"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_extreme"),
        )
    )
    return fenced.select(
        "grp",
        "n",
        F.round(F.col("q1").cast("double") / 100, 2).alias("q1"),
        F.round(F.col("q3").cast("double") / 100, 2).alias("q3"),
        F.round((F.col("q3") - F.col("q1")).cast("double") / 100, 2).alias(
            "iqr"
        ),
        "n_outliers",
        "n_extreme",
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# XYZ demand-variability classification of parts
# ---------------------------------------------------------------------------

@register(
    "xyz_demand_classes",
    """
    WITH monthly AS (
        SELECT l_partkey,
               CAST(strftime(l_shipdate, '%Y-%m') AS VARCHAR) AS month,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem GROUP BY 1, 2
    ), per_part AS (
        SELECT l_partkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS s,
               SUM(CAST(q AS DECIMAL(38,0)) * q) AS qq
        FROM monthly GROUP BY l_partkey
        HAVING COUNT(*) >= 3
    ), classed AS (
        SELECT l_partkey, n, s,
               -- CV^2 = n*(n*qq - s*s) / (n-1) / s^2 (sample variance);
               -- class boundaries compared as EXACT integers:
               -- CV < 0.5  <=>  4*n*(n*qq - s*s) < (n-1)*s*s
               -- CV < 1.0  <=>    n*(n*qq - s*s) < (n-1)*s*s
               CASE WHEN 4 * n * (n * qq - CAST(s AS DECIMAL(38,0)) * s)
                         < (n - 1) * CAST(s AS DECIMAL(38,0)) * s THEN 'X'
                    WHEN n * (n * qq - CAST(s AS DECIMAL(38,0)) * s)
                         < (n - 1) * CAST(s AS DECIMAL(38,0)) * s THEN 'Y'
                    ELSE 'Z' END AS xyz
        FROM per_part
    )
    SELECT xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(s) AS BIGINT) AS total_qty,
           CAST(SUM(n) AS BIGINT) AS part_months
    FROM classed
    GROUP BY xyz
    ORDER BY xyz
    """,
)
def xyz_demand_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ inventory classification: parts bucketed by the coefficient
    of variation of monthly demand — X (CV < 0.5, steady), Y (0.5 <=
    CV < 1, variable), Z (CV >= 1, erratic); the variability axis that
    pairs with abc_revenue_classes' value axis to make the ABC-XYZ
    planning matrix.  Parts need >= 3 active months.

    100 TB shape: one (part, month) aggregate, one per-part reduction.
    Determinism: the CV class boundary is evaluated as the EXACT
    integer inequality 4n(nQ - S^2) vs (n-1)S^2 — no float CV is ever
    materialized, so the classification cannot flip on rounding."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    monthly = lineitem.groupBy(
        "l_partkey", F.date_format("l_shipdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    qd = F.col("q").cast("decimal(38,0)")
    per_part = (
        monthly.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("q").cast("long").alias("s"),
            F.sum(qd * F.col("q")).alias("qq"),
        )
        .filter(F.col("n") >= 3)
    )
    sd = F.col("s").cast("decimal(38,0)")
    var_num = F.col("n") * F.col("qq") - sd * F.col("s")
    thresh = (F.col("n") - 1) * sd * F.col("s")
    classed = per_part.select(
        "n",
        "s",
        F.when(4 * F.col("n") * var_num < thresh, "X")
        .when(F.col("n") * var_num < thresh, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        classed.groupBy("xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("s").cast("long").alias("total_qty"),
            F.sum("n").cast("long").alias("part_months"),
        )
        .orderBy("xyz")
    )
