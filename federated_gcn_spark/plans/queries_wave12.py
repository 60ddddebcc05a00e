"""Round-4 wave 12: inequality decomposition, blocked rank tests,
nonparametric changepoints, and sampled graph centrality.

- ``theil_index``: Theil-T inequality of per-customer spend within
  each nation — the information-theoretic inequality complement of the
  existing ``gini_customer_spend``.  The entropy sum accumulates
  6-dp-rounded x*ln(x) terms as DECIMAL (exact, order-independent).
- ``friedman_test``: Friedman chi-square for priority effects on
  monthly revenue — the blocked nonparametric ANOVA (blocks = months,
  treatments = the five order priorities), with exact doubled
  tie-average ranks.
- ``pettitt_changepoint``: Pettitt's rank-based changepoint statistic
  over the daily revenue series — max |U_t| with U from doubled ranks,
  plus the standard exp approximation for its significance.
- ``harmonic_centrality``: harmonic centrality (sum of 1/d) of four
  probe vertices of the order<->supplier graph via MULTI-SOURCE BFS
  (graph/bfs.multi_source_bfs) — hash-checked against a recursive-CTE
  oracle; 1/d sums are exact 60ths (lcm(1..6)), never float sums.

Cross-engine determinism: ranks and counts are exact integers; the
only transcendentals (LN in Theil, EXP in Pettitt's p) are single
terms of identical doubles at emit.

Reference anchor: SURVEY.md §2.11 metrics + §2.7 graph-analysis
surface (fl_client.py:139-160, distributed BFS per SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Theil-T inequality of customer spend per nation
# ---------------------------------------------------------------------------

@register(
    "theil_index",
    """
    WITH spend AS (
        SELECT c_nationkey,
               o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey, o_custkey
    ), terms AS (
        SELECT c_nationkey, x,
               CAST(ROUND(CAST(x AS DOUBLE) * LN(CAST(x AS DOUBLE)), 6)
                    AS DECIMAL(38,6)) AS xlnx
        FROM spend
    ), per_nation AS (
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(x) AS BIGINT) AS s,
               CAST(SUM(xlnx) AS DOUBLE) AS sxlnx
        FROM terms GROUP BY c_nationkey
    )
    SELECT n_name, n_customers,
           CAST(s // n_customers AS BIGINT) AS mean_spend_c,
           ROUND(sxlnx / (CAST(n_customers AS DOUBLE)
                          * (CAST(s AS DOUBLE) / CAST(n_customers AS DOUBLE)))
                 - LN(CAST(s AS DOUBLE) / CAST(n_customers AS DOUBLE)), 6)
               AS theil_t
    FROM per_nation JOIN nation ON c_nationkey = n_nationkey
    ORDER BY n_name
    """,
)
def theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality of per-customer total spend within each
    nation: T = (1/(n*mu)) * sum(x ln x) - ln(mu) — the
    information-theoretic inequality measure (0 = perfect equality),
    complementing gini_customer_spend.

    100 TB shape: one per-customer aggregate (the only corpus-sized
    shuffle), then a nation-level reduction over 6-dp DECIMAL entropy
    terms — order-independent and map-side combinable.  Determinism:
    each x*ln(x) term is rounded to 6 dp before the decimal sum; the
    emit is one fixed double expression with a single LN."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    spend = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("x")
        )
    )
    xd = F.col("x").cast("double")
    terms = spend.select(
        "c_nationkey",
        "x",
        F.round(xd * F.log(xd), 6).cast("decimal(38,6)").alias("xlnx"),
    )
    per_nation = terms.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("x").alias("s"),
        F.sum("xlnx").cast("double").alias("sxlnx"),
    )
    n = F.col("n_customers")
    mu = F.col("s").cast("double") / n.cast("double")
    return (
        per_nation.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "n_name",
            "n_customers",
            F.floor(F.col("s") / n).cast("long").alias("mean_spend_c"),
            F.round(
                F.col("sxlnx") / (n.cast("double") * mu) - F.log(mu), 6
            ).alias("theil_t"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Friedman blocked rank test: priority effect on monthly revenue
# ---------------------------------------------------------------------------

@register(
    "friedman_test",
    """
    WITH cell AS (
        SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS block,
               o_orderpriority AS trt,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS v
        FROM orders GROUP BY 1, 2
    ), complete AS (
        SELECT block FROM cell GROUP BY block HAVING COUNT(*) = 5
    ), kept AS (
        SELECT c.block, c.trt, c.v FROM cell c
        JOIN complete USING (block)
    ), ranked AS (
        SELECT a.block, a.trt,
               2 * SUM(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
                 + SUM(CASE WHEN b.v = a.v THEN 1 ELSE 0 END) + 2 AS r2
        FROM kept a JOIN kept b ON a.block = b.block AND a.trt <> b.trt
        GROUP BY a.block, a.trt
    ), per_trt AS (
        SELECT trt, CAST(SUM(r2) AS BIGINT) AS r2_sum
        FROM ranked GROUP BY trt
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               SUM(CAST(r2_sum AS DECIMAL(38,0)) * CAST(r2_sum AS DECIMAL(38,0)))
                   AS sq,
               CAST(MIN(r2_sum) AS BIGINT) AS min_r2,
               CAST(MAX(r2_sum) AS BIGINT) AS max_r2
        FROM per_trt
    ), nb AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM complete
    )
    SELECT n AS n_blocks, k AS k_treatments,
           min_r2, max_r2,
           ROUND(3.0 * CAST(sq AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                    * CAST(k + 1 AS DOUBLE))
                 - 3.0 * CAST(n AS DOUBLE) * CAST(k + 1 AS DOUBLE), 6)
               AS chi2_friedman
    FROM tot CROSS JOIN nb
    """,
)
def friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman chi-square for a priority effect on monthly revenue:
    blocks = calendar months (complete blocks only — all five
    priorities present), treatments = order priorities, ranks within
    each block.  chi2 = 12/(n k (k+1)) sum R_j^2 - 3 n (k+1), computed
    from DOUBLED tie-average ranks so every rank is an exact integer
    (sum R_j^2 = sum R2_j^2 / 4, folded into the 3.0 factor).

    100 TB shape: the corpus collapses to one (month, priority)
    aggregate; ranking is a k x k self-join per block (k = 5), so the
    test itself runs on a calendar-bounded table.  Determinism: ranks,
    rank sums and squares are exact integers/decimals; one fixed
    double expression at emit."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    # cell (the one data-sized orders aggregate, months x 5 rows) feeds
    # the completeness filter and both self-join sides; unstaged, the
    # final plan re-ran the orders scan + aggregate five times.  One
    # lazy checkpoint -> one scan.
    cell = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("block"),
        F.col("o_orderpriority").alias("trt"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("v")
    ).localCheckpoint(eager=False)
    complete = cell.groupBy("block").agg(F.count(F.lit(1)).alias("kc")).filter(
        F.col("kc") == 5
    ).select("block")
    kept = cell.join(complete, "block")
    b = kept.select(
        F.col("block").alias("bblock"),
        F.col("trt").alias("btrt"),
        F.col("v").alias("bv"),
    )
    ranked = (
        kept.join(
            b,
            (F.col("block") == F.col("bblock"))
            & (F.col("trt") != F.col("btrt")),
        )
        .groupBy("block", "trt")
        .agg(
            (
                # the b-side self-join excludes the row itself, so the
                # doubled tie-average rank adds 2 (self counts as one
                # tie: 2*cnt_lt + (cnt_eq_excl + 1) + 1)
                2 * F.sum(F.when(F.col("bv") < F.col("v"), 1).otherwise(0))
                + F.sum(F.when(F.col("bv") == F.col("v"), 1).otherwise(0))
                + 2
            ).alias("r2")
        )
    )
    per_trt = ranked.groupBy("trt").agg(F.sum("r2").alias("r2_sum"))
    r2d = F.col("r2_sum").cast("decimal(38,0)")
    tot = per_trt.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(r2d * r2d).alias("sq"),
        F.min("r2_sum").cast("long").alias("min_r2"),
        F.max("r2_sum").cast("long").alias("max_r2"),
    )
    nb = complete.agg(F.count(F.lit(1)).cast("long").alias("n"))
    out = tot.crossJoin(nb)
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    chi2 = (
        F.lit(3.0)
        * F.col("sq").cast("double")
        / (n * k * (F.col("k") + 1).cast("double"))
        - F.lit(3.0) * n * (F.col("k") + 1).cast("double")
    )
    return out.select(
        F.col("n").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        "min_r2",
        "max_r2",
        F.round(chi2, 6).alias("chi2_friedman"),
    )


# ---------------------------------------------------------------------------
# Pettitt rank-based changepoint over daily revenue
# ---------------------------------------------------------------------------

@register(
    "pettitt_changepoint",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), hist AS (
        SELECT rev_c AS v, COUNT(*) AS cnt_eq
        FROM daily GROUP BY rev_c
    ), cum AS (
        SELECT v, cnt_eq,
               COALESCE(SUM(cnt_eq) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS cnt_lt
        FROM hist
    ), r AS (
        SELECT d.day, 2 * c.cnt_lt + c.cnt_eq + 1 AS r2
        FROM daily d JOIN cum c ON d.rev_c = c.v
    ), u AS (
        SELECT day,
               SUM(r2) OVER (ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS s2,
               ROW_NUMBER() OVER (ORDER BY day) AS t,
               COUNT(*) OVER () AS n
        FROM r
    ), stat AS (
        SELECT day, t, n,
               s2 - t * (n + 1) AS u2
        FROM u WHERE t < n
    )
    SELECT CAST(ANY_VALUE(n) AS BIGINT) AS n_days,
           CAST(MIN_BY(day, -ABS(u2) * 100000 + day) AS BIGINT)
               AS change_day,
           CAST(MAX(ABS(u2)) AS BIGINT) AS k_stat,
           ROUND(2 * EXP(-6.0 * CAST(MAX(ABS(u2)) AS DOUBLE)
                              * CAST(MAX(ABS(u2)) AS DOUBLE)
                         / (CAST(ANY_VALUE(n) AS DOUBLE)
                            * CAST(ANY_VALUE(n) AS DOUBLE)
                            * CAST(ANY_VALUE(n) AS DOUBLE)
                            + CAST(ANY_VALUE(n) AS DOUBLE)
                              * CAST(ANY_VALUE(n) AS DOUBLE))), 9)
               AS p_approx
    FROM stat
    """,
)
def pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt's nonparametric changepoint test over daily revenue:
    U_t = 2*S_t - t(n+1) with S_t the running sum of ranks, K =
    max|U_t|, plus the standard approximation
    p ~ 2 exp(-6 K^2 / (n^3 + n^2)).  Rank-based, so robust to any
    monotone transform of revenue.

    100 TB shape: one daily aggregate, then exact doubled-tie ranks
    via the value-domain histogram (no global sort of raw data) and a
    running sum over the calendar-bounded series.  Determinism: U is
    an exact integer (doubled ranks); K and p are single fixed
    expressions at emit (one EXP)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    hist = daily.groupBy(F.col("rev_c").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt_eq")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "cnt_lt", F.coalesce(F.sum("cnt_eq").over(wv), F.lit(0))
    )
    r = daily.join(cum, daily["rev_c"] == cum["v"]).select(
        "day", (2 * F.col("cnt_lt") + F.col("cnt_eq") + 1).alias("r2")
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    u = r.select(
        "day",
        F.sum("r2").over(wd).alias("s2"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    stat = u.filter(F.col("t") < F.col("n")).select(
        "day",
        "n",
        (F.col("s2") - F.col("t") * (F.col("n") + 1)).alias("u2"),
    )
    kd = F.max(F.abs(F.col("u2"))).cast("double")
    nd = F.any_value(F.col("n")).cast("double")
    return stat.agg(
        F.any_value(F.col("n")).cast("long").alias("n_days"),
        # single integer tiebreak key (DuckDB min_by takes no struct):
        # maximize |u2|, then smallest day; day < 1e5 for any calendar
        F.min_by(
            F.col("day"), -F.abs(F.col("u2")) * 100000 + F.col("day")
        )
        .cast("long")
        .alias("change_day"),
        F.max(F.abs(F.col("u2"))).cast("long").alias("k_stat"),
        F.round(
            2 * F.exp(-F.lit(6.0) * kd * kd / (nd * nd * nd + nd * nd)), 9
        ).alias("p_approx"),
    )


# ---------------------------------------------------------------------------
# Harmonic centrality of four probe vertices via multi-source BFS
# ---------------------------------------------------------------------------

@register(
    "harmonic_centrality",
    """
    WITH RECURSIVE ed AS (
        SELECT DISTINCT l_orderkey AS src, l_suppkey + 10000000 AS dst
        FROM lineitem WHERE l_orderkey % 50 = 0
    ), sym AS (
        SELECT src, dst FROM ed UNION SELECT dst AS src, src AS dst FROM ed
    ), srcs AS (
        SELECT id FROM (SELECT DISTINCT src AS id FROM sym) t
        ORDER BY id LIMIT 4
    ), walk(origin, id, d) AS (
        SELECT id AS origin, id, 0 FROM srcs
        UNION
        SELECT walk.origin, sym.dst AS id, walk.d + 1
        FROM walk JOIN sym ON walk.id = sym.src
        WHERE walk.d < 6
    ), best AS (
        SELECT origin, id, MIN(d) AS d FROM walk GROUP BY origin, id
    ), cnt AS (
        SELECT origin, d, COUNT(*) AS n
        FROM best WHERE d > 0 GROUP BY origin, d
    )
    SELECT CAST(origin AS BIGINT) AS source,
           CAST(SUM(n) AS BIGINT) AS n_reached,
           ROUND(CAST(SUM(n * (60 // d)) AS DOUBLE) / 60, 6) AS harmonic_c
    FROM cnt GROUP BY origin ORDER BY source
    """,
)
def harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality C(s) = sum_v 1/d(s,v) (within 6 hops) of
    four probe vertices of the order<->supplier graph, via MULTI-SOURCE
    BFS — the per-node centrality that stays well-defined on
    disconnected graphs.

    100 TB shape: multi-source frontier BFS shuffles each (origin,
    vertex) pair at most once (graph/bfs.multi_source_bfs), so cost is
    |probes| * |V| rows total — the standard trick for centrality at
    scale is exactly this probe-panel sampling.  Determinism: per-hop
    reach counts are exact; 1/d sums are exact integer sixtieths
    (lcm(1..6) = 60), so no float accumulation ever happens."""
    from federated_gcn_spark.graph import Graph
    from federated_gcn_spark.graph.bfs import multi_source_bfs
    from federated_gcn_spark.plans.queries import _edges_mod50

    edges = _edges_mod50(spark, sf_dir)
    g = Graph.from_edges(edges)
    sym = g.symmetrized_edges()
    sources = sym.select(F.col("src").alias("id")).distinct().orderBy("id").limit(4)
    reached = multi_source_bfs(g, sources, max_hops=6)
    cnt = (
        reached.filter(F.col("distance") > 0)
        .groupBy("origin", "distance")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    num60 = F.sum(
        F.col("n") * F.floor(F.lit(60) / F.col("distance")).cast("long")
    )
    return (
        cnt.groupBy(F.col("origin").cast("long").alias("source"))
        .agg(
            F.sum("n").cast("long").alias("n_reached"),
            F.round(num60.cast("double") / 60, 6).alias("harmonic_c"),
        )
        .orderBy("source")
    )
