"""Round-4 wave 11: market concentration, causal inference, tail risk,
and inter-rater agreement.

- ``herfindahl_index``: Herfindahl-Hirschman concentration of supplier
  revenue within each nation — the antitrust-standard market-structure
  measure.  HHI = sum(share_i^2) computed as one exact rational
  sum(rev_i^2) / (sum rev_i)^2 over integer e4-cents.
- ``diff_in_diff_revenue``: two-group (PROMO vs other parts) x
  two-period (1995 vs 1996 ship years) difference-in-differences
  estimate of per-lineitem revenue — the workhorse quasi-experimental
  causal design.
- ``value_at_risk``: historical 95% VaR and CVaR (expected shortfall)
  of day-over-day revenue changes — exact order statistics over the
  calendar-bounded daily delta series, k = ceil(n/20) spelled as
  integer (n + 19) DIV 20 in both engines.
- ``cohen_kappa``: Cohen's kappa agreement between two deterministic
  document-quality raters (char-length rule vs whitespace-token rule)
  — the chance-corrected agreement coefficient.

Cross-engine determinism: every count/sum is exact integer or DECIMAL;
each emitted float is a single division or one fixed double expression
over identical inputs.

Reference anchor: extends SURVEY.md §2.11's evaluation-metric family
(fl_client.py:139-160) with market/causal/risk/agreement diagnostics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


def _rev_e4() -> F.Column:
    """Exact per-lineitem revenue in 1e-4 dollars: integer product of
    price cents and (100 - discount-percent)."""
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )


_REV_E4_SQL = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration of supplier revenue per nation
# ---------------------------------------------------------------------------

@register(
    "herfindahl_index",
    f"""
    WITH per_supp AS (
        SELECT s_nationkey,
               l_suppkey,
               CAST(SUM({_REV_E4_SQL}) AS BIGINT) AS rev
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_suppkey
    ), per_nation AS (
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers,
               CAST(SUM(rev) AS BIGINT) AS tot,
               SUM(CAST(rev AS DECIMAL(38,0)) * CAST(rev AS DECIMAL(38,0)))
                   AS sq,
               CAST(MAX(rev) AS BIGINT) AS top_rev
        FROM per_supp GROUP BY s_nationkey
    )
    SELECT n_name,
           n_suppliers,
           ROUND(CAST(sq AS DOUBLE)
                 / CAST(CAST(tot AS DECIMAL(38,0))
                        * CAST(tot AS DECIMAL(38,0)) AS DOUBLE), 9) AS hhi,
           ROUND(CAST(top_rev AS DOUBLE) / CAST(tot AS DOUBLE), 9)
               AS top_share
    FROM per_nation JOIN nation ON s_nationkey = n_nationkey
    ORDER BY n_name
    """,
)
def herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation: HHI = sum_i share_i^2 in (0, 1], plus the top supplier's
    share — the standard market-concentration screen.

    100 TB shape: the fact scan collapses to one (nation, supplier)
    aggregate (supplier is a broadcast dimension), then a
    dimension-sized per-nation reduction; HHI is the exact rational
    sum(rev^2)/(sum rev)^2 so no per-supplier share division ever
    happens.  Determinism: integer e4-cents revenue, DECIMAL(38,0)
    squares, two single divisions at emit."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    per_supp = (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(_rev_e4()).alias("rev"))
    )
    rev_d = F.col("rev").cast("decimal(38,0)")
    per_nation = per_supp.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum("rev").alias("tot"),
        F.sum(rev_d * rev_d).alias("sq"),
        F.max("rev").alias("top_rev"),
    )
    tot_d = F.col("tot").cast("decimal(38,0)")
    return (
        per_nation.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_suppliers",
            F.round(
                F.col("sq").cast("double") / (tot_d * tot_d).cast("double"), 9
            ).alias("hhi"),
            F.round(
                F.col("top_rev").cast("double") / F.col("tot").cast("double"),
                9,
            ).alias("top_share"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Difference-in-differences: PROMO parts, 1995 -> 1996
# ---------------------------------------------------------------------------

@register(
    "diff_in_diff_revenue",
    f"""
    WITH cells AS (
        SELECT CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
               CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                    THEN 1 ELSE 0 END AS post,
               {_REV_E4_SQL} AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    ), g AS (
        SELECT treated, post,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rev) AS BIGINT) AS s
        FROM cells GROUP BY treated, post
    ), w AS (
        SELECT MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
               MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
               MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
               MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
               MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s00,
               MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s01,
               MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s10,
               MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s11
        FROM g
    )
    SELECT n00, n01, n10, n11,
           CAST(s00 // n00 AS BIGINT) AS mean_ctl_pre_e4,
           CAST(s01 // n01 AS BIGINT) AS mean_ctl_post_e4,
           CAST(s10 // n10 AS BIGINT) AS mean_trt_pre_e4,
           CAST(s11 // n11 AS BIGINT) AS mean_trt_post_e4,
           ROUND(((CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
                   - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
                  - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
                     - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)))
                 / 10000, 4) AS did_estimate
    FROM w
    """,
)
def diff_in_diff_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the PROMO-part revenue
    premium across the 1995->1996 ship-year boundary:
    DiD = (trt_post - trt_pre) - (ctl_post - ctl_pre) — the standard
    two-group/two-period quasi-experimental design.

    100 TB shape: one broadcast dimension join + a four-cell tally —
    map-side combinable, no shuffle beyond the 4-row pivot.
    Determinism: cell sums are exact e4-cents integers; the integer
    floor means are exact, and the DiD emit is one fixed double
    expression."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    part = load_table(spark, sf_dir, "part")
    cells = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.when(F.col("p_type").startswith("PROMO"), 1)
            .otherwise(0)
            .alias("treated"),
            F.when(
                F.col("l_shipdate")
                >= F.lit("1996-01-01").cast("timestamp"),
                1,
            )
            .otherwise(0)
            .alias("post"),
            _rev_e4().alias("rev"),
        )
    )
    g = cells.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("rev").alias("s")
    )

    def cell(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    w = g.agg(
        cell(0, 0, "n").alias("n00"),
        cell(0, 1, "n").alias("n01"),
        cell(1, 0, "n").alias("n10"),
        cell(1, 1, "n").alias("n11"),
        cell(0, 0, "s").alias("s00"),
        cell(0, 1, "s").alias("s01"),
        cell(1, 0, "s").alias("s10"),
        cell(1, 1, "s").alias("s11"),
    )

    def mean_d(s: str, n: str):
        return F.col(s).cast("double") / F.col(n).cast("double")

    did = (mean_d("s11", "n11") - mean_d("s10", "n10")) - (
        mean_d("s01", "n01") - mean_d("s00", "n00")
    )
    return w.select(
        "n00",
        "n01",
        "n10",
        "n11",
        F.floor(F.col("s00") / F.col("n00")).cast("long").alias("mean_ctl_pre_e4"),
        F.floor(F.col("s01") / F.col("n01")).cast("long").alias("mean_ctl_post_e4"),
        F.floor(F.col("s10") / F.col("n10")).cast("long").alias("mean_trt_pre_e4"),
        F.floor(F.col("s11") / F.col("n11")).cast("long").alias("mean_trt_post_e4"),
        F.round(did / 10000, 4).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# Historical VaR / CVaR of day-over-day revenue changes
# ---------------------------------------------------------------------------

@register(
    "value_at_risk",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), deltas AS (
        SELECT day,
               rev_c - LAG(rev_c) OVER (ORDER BY day) AS delta
        FROM daily
        QUALIFY delta IS NOT NULL
    ), ranked AS (
        SELECT day, delta,
               ROW_NUMBER() OVER (ORDER BY delta, day) AS rn,
               COUNT(*) OVER () AS n
        FROM deltas
    ), k AS (
        SELECT n, (n + 19) // 20 AS kth FROM ranked LIMIT 1
    ), tail AS (
        SELECT CAST(ANY_VALUE(r.n) AS BIGINT) AS n_deltas,
               CAST(ANY_VALUE(k.kth) AS BIGINT) AS k_tail,
               CAST(MAX(CASE WHEN r.rn = k.kth THEN r.delta END) AS BIGINT)
                   AS var_c,
               CAST(SUM(CASE WHEN r.rn <= k.kth THEN r.delta END) AS BIGINT)
                   AS tail_sum,
               CAST(MIN(r.delta) AS BIGINT) AS worst_c
        FROM ranked r CROSS JOIN k
    )
    SELECT n_deltas, k_tail,
           ROUND(CAST(var_c AS DOUBLE) / 100, 2) AS var_95,
           ROUND(CAST(tail_sum AS DOUBLE) / CAST(k_tail AS DOUBLE) / 100, 4)
               AS cvar_95,
           ROUND(CAST(worst_c AS DOUBLE) / 100, 2) AS worst_change
    FROM tail
    """,
)
def value_at_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Historical 95% value-at-risk and conditional VaR (expected
    shortfall) of day-over-day total-revenue changes: the k-th smallest
    delta with k = ceil(n/20), and the mean of that worst-5% tail.

    100 TB shape: the only corpus-sized work is the daily aggregate;
    deltas, ranking and the tail summary all run over the
    calendar-bounded (~10^3-row) daily series, so the unpartitioned
    windows are safe at any scale.  Determinism: deltas are exact
    integer cents; k is the integer (n+19) div 20 in both engines;
    VaR is an order statistic and CVaR one single division."""
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
    )
    wr = Window.orderBy("delta", "day")
    ranked = deltas.select(
        "day",
        "delta",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy())
        .alias("n"),
    ).withColumn(
        # integer ceil(n/20): Spark '/' on longs is double — floor-div
        "kth",
        F.floor((F.col("n") + 19) / 20).cast("long"),
    )
    tail = ranked.agg(
        F.any_value(F.col("n")).cast("long").alias("n_deltas"),
        F.any_value(F.col("kth")).cast("long").alias("k_tail"),
        F.max(
            F.when(F.col("rn") == F.col("kth"), F.col("delta"))
        ).alias("var_c"),
        F.sum(
            F.when(F.col("rn") <= F.col("kth"), F.col("delta"))
        ).alias("tail_sum"),
        F.min("delta").alias("worst_c"),
    )
    return tail.select(
        "n_deltas",
        "k_tail",
        F.round(F.col("var_c").cast("double") / 100, 2).alias("var_95"),
        F.round(
            F.col("tail_sum").cast("double")
            / F.col("k_tail").cast("double")
            / 100,
            4,
        ).alias("cvar_95"),
        F.round(F.col("worst_c").cast("double") / 100, 2).alias(
            "worst_change"
        ),
    )


# ---------------------------------------------------------------------------
# Cohen's kappa between two deterministic document raters
# ---------------------------------------------------------------------------

@register(
    "cohen_kappa",
    """
    WITH rated AS (
        SELECT CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS rater_a,
               CASE WHEN length(text) - length(replace(text, ' ', '')) + 1
                         >= 50 THEN 1 ELSE 0 END AS rater_b
        FROM documents
    ), cm AS (
        SELECT CAST(SUM(CASE WHEN rater_a = 1 AND rater_b = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS both_pos,
               CAST(SUM(CASE WHEN rater_a = 1 AND rater_b = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
               CAST(SUM(CASE WHEN rater_a = 0 AND rater_b = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
               CAST(SUM(CASE WHEN rater_a = 0 AND rater_b = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS both_neg,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM rated
    )
    SELECT both_pos, a_only, b_only, both_neg, n,
           ROUND(CAST(both_pos + both_neg AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS po,
           ROUND(CAST((both_pos + a_only) * (both_pos + b_only)
                      + (b_only + both_neg) * (a_only + both_neg) AS DOUBLE)
                 / CAST(n * n AS DOUBLE), 6) AS pe,
           ROUND((CAST(both_pos + both_neg AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST((both_pos + a_only) * (both_pos + b_only)
                         + (b_only + both_neg) * (a_only + both_neg)
                         AS DOUBLE) / CAST(n * n AS DOUBLE))
                 / (1 - CAST((both_pos + a_only) * (both_pos + b_only)
                             + (b_only + both_neg) * (a_only + both_neg)
                             AS DOUBLE) / CAST(n * n AS DOUBLE)), 6)
               AS kappa
    FROM cm
    """,
)
def cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa chance-corrected agreement between two
    deterministic document-quality raters: A = char-length rule
    (n_chars >= 300), B = whitespace-token rule (>= 50 tokens).
    kappa = (po - pe) / (1 - pe).

    100 TB shape: a single map-side-combined four-cell tally over the
    corpus — no shuffle beyond the one-row reduction; the token count
    is a pure string-length expression (no regex, no explode).
    Determinism: all four cells are exact integers; po/pe/kappa are
    fixed double expressions of identical integers."""
    documents = load_table(spark, sf_dir, "documents", parallel=True)
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    rated = documents.select(
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("rater_a"),
        F.when(n_tokens >= 50, 1).otherwise(0).alias("rater_b"),
    )
    cm = rated.agg(
        F.sum(
            F.when((F.col("rater_a") == 1) & (F.col("rater_b") == 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("both_pos"),
        F.sum(
            F.when((F.col("rater_a") == 1) & (F.col("rater_b") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("a_only"),
        F.sum(
            F.when((F.col("rater_a") == 0) & (F.col("rater_b") == 1), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("b_only"),
        F.sum(
            F.when((F.col("rater_a") == 0) & (F.col("rater_b") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("both_neg"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("both_pos") + F.col("both_neg")).cast("double") / nd
    pe = (
        (F.col("both_pos") + F.col("a_only"))
        * (F.col("both_pos") + F.col("b_only"))
        + (F.col("b_only") + F.col("both_neg"))
        * (F.col("a_only") + F.col("both_neg"))
    ).cast("double") / (F.col("n") * F.col("n")).cast("double")
    return cm.select(
        "both_pos",
        "a_only",
        "b_only",
        "both_neg",
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1 - pe), 6).alias("kappa"),
    )
