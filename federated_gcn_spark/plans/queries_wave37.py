"""Round-4 wave 37: survey weighting, regularization paths, energy
statistics, and split-gain feature ranking.

- ``ipf_raking_weights``: iterative proportional fitting (raking) of
  the (nation, segment) customer table to EQUALIZED nation margins
  while preserving segment margins — 3 unrolled row/column sweeps;
  the survey post-stratification weighting every panel dataset needs.
- ``ridge_regression_path``: the ridge path for daily revenue ~
  (day, order count) — closed-form 2x2 normal-equation solves from
  exact centered moments at lambda in {0, 1e2, 1e4, 1e6}, showing the
  coefficient shrinkage.
- ``energy_distance_halves``: the two-sample energy distance between
  the halves' price distributions ($1000 bins) — E = 2E|X-Y| -
  E|X-X'| - E|Y-Y'| with every expected absolute difference computed
  from EXACT integer prefix sums over the bounded bucket table.
- ``gini_gain_feature_ranking``: single-split Gini gain of each
  candidate feature (quantity, discount, part size, price decile)
  against lineitem returns — the model-free feature-importance
  ranking that precedes any tree fit.

Cross-engine determinism: raking weights are 12-dp-rounded DECIMALs
per sweep over a bounded cell table; ridge solves are fixed
expressions of exact DECIMAL(38) moments; energy sums are exact
integers end-to-end; Gini gains order by (12-dp gain, feature).

Reference anchor: SURVEY.md §2.11; extends stratified_adjusted_lift,
linear_fit, wasserstein_price_drift, cart_depth2_tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

_IPF_SWEEPS = 3
_RIDGE_LAMBDAS = (0.0, 1e2, 1e4, 1e6)


# ---------------------------------------------------------------------------
# Iterative proportional fitting (raking)
# ---------------------------------------------------------------------------

def _ipf_oracle(sweeps: int = _IPF_SWEEPS) -> str:
    sql = """
    WITH cell AS MATERIALIZED (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n_all,
               CAST(COUNT(DISTINCT nation) AS BIGINT) AS n_nations
        FROM cell
    ), colm AS MATERIALIZED (
        SELECT segment, CAST(SUM(n) AS BIGINT) AS target FROM cell
        GROUP BY segment
    ), w0 AS (
        SELECT nation, segment, n, CAST(n AS DOUBLE) AS w FROM cell
    )"""
    for s in range(1, sweeps + 1):
        p = s - 1
        sql += f""", rm{s} AS (
        SELECT nation, CAST(SUM(CAST(ROUND(w, 12) AS DECIMAL(28,12)))
                            AS DOUBLE) AS cur
        FROM w{p} GROUP BY nation
    ), wr{s} AS (
        SELECT x.nation, x.segment, x.n,
               CAST(ROUND(x.w * ((CAST(t.n_all AS DOUBLE) / t.n_nations)
                                 / r.cur), 12) AS DECIMAL(28,12)) AS w
        FROM w{p} x JOIN rm{s} r ON r.nation = x.nation CROSS JOIN tot t
    ), cm{s} AS (
        SELECT segment, CAST(SUM(w) AS DOUBLE) AS cur FROM wr{s}
        GROUP BY segment
    ), w{s} AS (
        SELECT x.nation, x.segment, x.n,
               CAST(ROUND(CAST(x.w AS DOUBLE)
                          * (CAST(c.target AS DOUBLE) / m.cur), 12)
                    AS DOUBLE) AS w
        FROM wr{s} x
        JOIN cm{s} m ON m.segment = x.segment
        JOIN colm c ON c.segment = x.segment
    )"""
    return sql + f"""
    SELECT nation, segment, n,
           ROUND(w / n, 6) AS raking_factor,
           ROUND(w, 4) AS weight
    FROM w{sweeps} ORDER BY nation, segment
    """


@register("ipf_raking_weights", _ipf_oracle())
def ipf_raking_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking) of the customer
    (nation, segment) table: 3 row/column sweeps scale the observed
    cell counts so every nation carries an EQUAL total weight while
    the segment margins stay at their observed totals — the standard
    post-stratification correction for a panel over-representing some
    geographies.

    100 TB shape: the fact reduces once to the 25 x 5 cell table;
    every sweep is two bounded join-scale passes.  Determinism:
    weights round to 12 dp per sweep (exact DECIMAL margin sums);
    emits are fixed expressions."""
    customer = load_table(spark, sf_dir, "customer", parallel=True)
    nation = load_table(spark, sf_dir, "nation")
    cell = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = cell.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.countDistinct("nation").cast("long").alias("n_nations"),
    )
    colm = cell.groupBy("segment").agg(F.sum("n").cast("long").alias("target"))
    w = cell.withColumn("w", F.col("n").cast("double"))
    for _ in range(_IPF_SWEEPS):
        rm = w.groupBy("nation").agg(
            F.sum(F.round(F.col("w"), 12).cast("decimal(28,12)"))
            .cast("double")
            .alias("cur")
        )
        w = (
            w.join(F.broadcast(rm), "nation")
            .crossJoin(F.broadcast(tot))
            .withColumn(
                "w",
                F.round(
                    F.col("w")
                    * (
                        (F.col("n_all").cast("double") / F.col("n_nations"))
                        / F.col("cur")
                    ),
                    12,
                ).cast("decimal(28,12)"),
            )
            .drop("cur", "n_all", "n_nations")
        )
        cm = w.groupBy("segment").agg(F.sum("w").cast("double").alias("cur"))
        w = (
            w.join(F.broadcast(cm), "segment")
            .join(F.broadcast(colm), "segment")
            .withColumn(
                "w",
                F.round(
                    F.col("w").cast("double")
                    * (F.col("target").cast("double") / F.col("cur")),
                    12,
                ).cast("double"),
            )
            .drop("cur", "target")
        )
        w = w.localCheckpoint(eager=True)
    return w.select(
        "nation",
        "segment",
        "n",
        F.round(F.col("w") / F.col("n"), 6).alias("raking_factor"),
        F.round(F.col("w"), 4).alias("weight"),
    ).orderBy("nation", "segment")


# ---------------------------------------------------------------------------
# Ridge regression path
# ---------------------------------------------------------------------------

_RIDGE_DAILY_SQL = """
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS t,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS y,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1
"""


@register(
    "ridge_regression_path",
    f"""
    WITH daily AS ({_RIDGE_DAILY_SQL}),
    m AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(CAST(t AS DECIMAL(38,0))) AS st,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(t AS DECIMAL(38,0)) * t) AS stt,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(t AS DECIMAL(38,0)) * x) AS stx,
               SUM(CAST(t AS DECIMAL(38,0)) * y) AS sty,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        FROM daily
    ), c AS (
        SELECT CAST(n AS DOUBLE) AS nd,
               CAST(n * stt - st * st AS DOUBLE) / CAST(n AS DOUBLE) AS ctt,
               CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE) AS cxx,
               CAST(n * stx - st * sx AS DOUBLE) / CAST(n AS DOUBLE) AS ctx,
               CAST(n * sty - st * sy AS DOUBLE) / CAST(n AS DOUBLE) AS cty,
               CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n AS DOUBLE) AS cxy
        FROM m
    )
    SELECT CAST(lam.lam AS DOUBLE) AS lambda,
           ROUND(((cxx + lam.lam) * cty - ctx * cxy)
                 / ((ctt + lam.lam) * (cxx + lam.lam) - ctx * ctx) / 100, 8)
               AS beta_day_eur,
           ROUND(((ctt + lam.lam) * cxy - ctx * cty)
                 / ((ctt + lam.lam) * (cxx + lam.lam) - ctx * ctx) / 100, 4)
               AS beta_count_eur,
           ROUND(SQRT((POWER(((cxx + lam.lam) * cty - ctx * cxy), 2)
                       + POWER(((ctt + lam.lam) * cxy - ctx * cty), 2)))
                 / SQRT(POWER((cxx * cty - ctx * cxy), 2)
                        + POWER((ctt * cxy - ctx * cty), 2))
                 * (ctt * cxx - ctx * ctx)
                 / ((ctt + lam.lam) * (cxx + lam.lam) - ctx * ctx), 6)
               AS shrinkage
    FROM c CROSS JOIN (
        SELECT UNNEST([{', '.join(str(v) for v in _RIDGE_LAMBDAS)}]) AS lam
    ) lam
    ORDER BY lambda
    """,
)
def ridge_regression_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regularization path for daily revenue ~ (day, order
    count): the 2x2 normal-equation solve (X'X + lambda I)^-1 X'y in
    closed form from exact centered moments, at lambda in
    {0, 1e2, 1e4, 1e6} — the shrinkage trace that picks a lambda
    before anyone runs gradient descent, plus the coefficient-norm
    shrinkage factor vs OLS.

    100 TB shape: one 9-number moment reduce; the path is scalar
    algebra per lambda.  Determinism: moments are exact DECIMAL(38)
    with means cleared by n; each solve is one fixed expression."""
    daily = load_table(spark, sf_dir, "orders", parallel=True).groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("t")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"),
        F.count(F.lit(1)).cast("long").alias("x"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("t")).alias("st"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("t") * F.col("t")).alias("stt"),
        F.sum(d("x") * F.col("x")).alias("sxx"),
        F.sum(d("t") * F.col("x")).alias("stx"),
        F.sum(d("t") * F.col("y")).alias("sty"),
        F.sum(d("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    cc = lambda a, b, sa, sb: (  # noqa: E731
        (F.col("n") * F.col(a) - F.col(sa) * F.col(sb)).cast("double") / nd
    )
    c = m.select(
        cc("stt", None, "st", "st").alias("ctt"),
        cc("sxx", None, "sx", "sx").alias("cxx"),
        cc("stx", None, "st", "sx").alias("ctx"),
        cc("sty", None, "st", "sy").alias("cty"),
        cc("sxy", None, "sx", "sy").alias("cxy"),
    )
    lams = spark.createDataFrame(
        [(v,) for v in _RIDGE_LAMBDAS], "lam double"
    )
    j = c.crossJoin(F.broadcast(lams))
    det = (F.col("ctt") + F.col("lam")) * (F.col("cxx") + F.col("lam")) - F.col(
        "ctx"
    ) * F.col("ctx")
    bt = ((F.col("cxx") + F.col("lam")) * F.col("cty") - F.col("ctx") * F.col("cxy")) / det
    bx = ((F.col("ctt") + F.col("lam")) * F.col("cxy") - F.col("ctx") * F.col("cty")) / det
    det0 = F.col("ctt") * F.col("cxx") - F.col("ctx") * F.col("ctx")
    bt0n = F.col("cxx") * F.col("cty") - F.col("ctx") * F.col("cxy")
    bx0n = F.col("ctt") * F.col("cxy") - F.col("ctx") * F.col("cty")
    shrink = (
        F.sqrt(
            F.pow(
                (F.col("cxx") + F.col("lam")) * F.col("cty")
                - F.col("ctx") * F.col("cxy"),
                2,
            )
            + F.pow(
                (F.col("ctt") + F.col("lam")) * F.col("cxy")
                - F.col("ctx") * F.col("cty"),
                2,
            )
        )
        / F.sqrt(F.pow(bt0n, 2) + F.pow(bx0n, 2))
        * det0
        / det
    )
    return j.select(
        F.col("lam").alias("lambda"),
        F.round(bt / 100, 8).alias("beta_day_eur"),
        # 4 dp, not 8: beta_count is the mean order value (~2.5e5 eur
        # at sf0.1), where an 8-dp grid has only ~340 ulp of slack
        # (round-9 audit_rounding find); beta_day stays 8 dp (its
        # magnitude is O(1e2))
        F.round(bx / 100, 4).alias("beta_count_eur"),
        F.round(shrink, 6).alias("shrinkage"),
    ).orderBy("lambda")


# ---------------------------------------------------------------------------
# Two-sample energy distance (binned, exact)
# ---------------------------------------------------------------------------

@register(
    "energy_distance_halves",
    """
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000 AS v,
               o_orderkey % 2 AS half
        FROM orders
    ), b AS MATERIALIZED (
        SELECT v,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS a,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS c
        FROM o GROUP BY v
    ), pre AS (
        SELECT v, a, c,
               CAST(COALESCE(SUM(a) OVER w, 0) AS DECIMAL(38,0)) AS ca,
               CAST(COALESCE(SUM(c) OVER w, 0) AS DECIMAL(38,0)) AS cc,
               CAST(COALESCE(SUM(a * v) OVER w, 0) AS DECIMAL(38,0)) AS sa,
               CAST(COALESCE(SUM(c * v) OVER w, 0) AS DECIMAL(38,0)) AS sc
        FROM b
        WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING)
    ), sums AS (
        SELECT CAST(SUM(a) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS m,
               SUM(CAST(a AS DECIMAL(38,0)) * (CAST(v AS DECIMAL(38,0)) * ca
                                               - sa)) AS dxx,
               SUM(CAST(c AS DECIMAL(38,0)) * (CAST(v AS DECIMAL(38,0)) * cc
                                               - sc)) AS dyy,
               SUM(CAST(a AS DECIMAL(38,0)) * (CAST(v AS DECIMAL(38,0)) * cc
                                               - sc)
                   + CAST(c AS DECIMAL(38,0)) * (CAST(v AS DECIMAL(38,0)) * ca
                                                 - sa)) AS dxy
        FROM pre
    )
    SELECT n AS n_even, m AS n_odd,
           ROUND(2.0 * CAST(dxy AS DOUBLE) / (CAST(n AS DOUBLE) * m)
                 - 2.0 * CAST(dxx AS DOUBLE) / (CAST(n AS DOUBLE) * n)
                 - 2.0 * CAST(dyy AS DOUBLE) / (CAST(m AS DOUBLE) * m), 6)
               AS energy_distance_k,
           ROUND((CAST(n AS DOUBLE) * m / (n + m))
                 * (2.0 * CAST(dxy AS DOUBLE) / (CAST(n AS DOUBLE) * m)
                    - 2.0 * CAST(dxx AS DOUBLE) / (CAST(n AS DOUBLE) * n)
                    - 2.0 * CAST(dyy AS DOUBLE) / (CAST(m AS DOUBLE) * m)), 4)
               AS energy_stat
    FROM sums
    """,
)
def energy_distance_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample energy distance between the halves' price
    distributions on $1000 bins: E = 2E|X-Y| - E|X-X'| - E|Y-Y'|
    (in bin units), plus the nm/(n+m)-scaled test statistic (Szekely
    & Rizzo) — the moment-free whole-distribution distance that is
    zero iff the distributions coincide.

    100 TB shape: one bounded bucket tally; every pairwise
    expected-absolute-difference collapses to prefix sums over the
    ordered buckets (sum_ij c_i c_j |v_i - v_j| = 2 sum_i c_i (v_i
    C_<i - S_<i)) — never a bucket x bucket join.  Determinism: the
    three D-sums are exact DECIMAL integers; emits are fixed
    expressions."""
    o = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.floor(F.round(F.col("o_totalprice") * 100).cast("long") / 100000)
        .cast("long")
        .alias("v"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    b = o.groupBy("v").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("long").alias("c"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    pre = b.select(
        "v",
        "a",
        "c",
        F.coalesce(F.sum("a").over(w), F.lit(0)).cast("decimal(38,0)").alias("ca"),
        F.coalesce(F.sum("c").over(w), F.lit(0)).cast("decimal(38,0)").alias("cc"),
        F.coalesce(F.sum(F.col("a") * F.col("v")).over(w), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sa"),
        F.coalesce(F.sum(F.col("c") * F.col("v")).over(w), F.lit(0))
        .cast("decimal(38,0)")
        .alias("sc"),
    )
    vd = dec(F.col("v"))
    sums = pre.agg(
        F.sum("a").cast("long").alias("n"),
        F.sum("c").cast("long").alias("m"),
        F.sum(dec(F.col("a")) * (vd * F.col("ca") - F.col("sa"))).alias("dxx"),
        F.sum(dec(F.col("c")) * (vd * F.col("cc") - F.col("sc"))).alias("dyy"),
        F.sum(
            dec(F.col("a")) * (vd * F.col("cc") - F.col("sc"))
            + dec(F.col("c")) * (vd * F.col("ca") - F.col("sa"))
        ).alias("dxy"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    e = (
        2.0 * F.col("dxy").cast("double") / (nd * md)
        - 2.0 * F.col("dxx").cast("double") / (nd * nd)
        - 2.0 * F.col("dyy").cast("double") / (md * md)
    )
    return sums.select(
        F.col("n").alias("n_even"),
        F.col("m").alias("n_odd"),
        F.round(e, 6).alias("energy_distance_k"),
        F.round((nd * md / (nd + md)) * e, 4).alias("energy_stat"),
    )


# ---------------------------------------------------------------------------
# Single-split Gini-gain feature ranking
# ---------------------------------------------------------------------------

@register(
    "gini_gain_feature_ranking",
    """
    WITH base AS MATERIALIZED (
        SELECT CAST(l.l_quantity AS BIGINT) AS quantity,
               CAST(ROUND(l.l_discount * 100) AS BIGINT) AS discount,
               CAST(p.p_size AS BIGINT) AS part_size,
               CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) // 500000
                   AS price_bucket,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), long AS (
        SELECT 'quantity' AS feature, quantity AS v, y FROM base
        UNION ALL SELECT 'discount', discount, y FROM base
        UNION ALL SELECT 'part_size', part_size, y FROM base
        UNION ALL SELECT 'price_bucket', price_bucket, y FROM base
    ), cells AS MATERIALIZED (
        SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM long GROUP BY feature, v
    ), cand AS (
        SELECT feature, v AS thr FROM cells GROUP BY feature, v
    ), split AS (
        SELECT c.feature, cand.thr,
               SUM(CASE WHEN c.v <= cand.thr THEN c.c ELSE 0 END) AS nl,
               SUM(CASE WHEN c.v <= cand.thr THEN c.pos ELSE 0 END) AS pl,
               SUM(CASE WHEN c.v > cand.thr THEN c.c ELSE 0 END) AS nr,
               SUM(CASE WHEN c.v > cand.thr THEN c.pos ELSE 0 END) AS pr
        FROM cells c JOIN cand ON cand.feature = c.feature
        GROUP BY c.feature, cand.thr
        HAVING SUM(CASE WHEN c.v <= cand.thr THEN c.c ELSE 0 END) > 0
           AND SUM(CASE WHEN c.v > cand.thr THEN c.c ELSE 0 END) > 0
    ), scored AS (
        SELECT feature, thr,
               (1 - POWER(CAST(pl + pr AS DOUBLE) / (nl + nr), 2)
                  - POWER(CAST(nl + nr - pl - pr AS DOUBLE) / (nl + nr), 2))
               - (CAST(nl AS DOUBLE)
                    * (1 - POWER(CAST(pl AS DOUBLE) / nl, 2)
                         - POWER(CAST(nl - pl AS DOUBLE) / nl, 2))
                  + CAST(nr AS DOUBLE)
                    * (1 - POWER(CAST(pr AS DOUBLE) / nr, 2)
                         - POWER(CAST(nr - pr AS DOUBLE) / nr, 2)))
                 / (nl + nr) AS gain
        FROM split
    ), best AS (
        SELECT feature, thr, gain,
               ROW_NUMBER() OVER (PARTITION BY feature
                                  ORDER BY ROUND(gain, 12) DESC, thr) AS rk
        FROM scored
    )
    SELECT feature, CAST(thr AS BIGINT) AS best_threshold,
           ROUND(gain, 8) AS gini_gain,
           CAST(ROW_NUMBER() OVER (ORDER BY ROUND(gain, 12) DESC, feature)
                AS BIGINT) AS rank
    FROM best WHERE rk = 1
    ORDER BY rank
    """,
)
def gini_gain_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free feature-importance ranking: for each candidate
    feature (quantity, discount, part size, $5000 price bucket), the
    best single split's Gini gain against the returned-lineitem label
    — parent impurity minus the weighted child impurities — ranked
    across features.  The triage step before fitting any tree.

    100 TB shape: one pass builds the per-(feature, value) sufficient
    cells (all features bounded-cardinality by construction); the
    candidate scan is cells x thresholds within each feature.
    Determinism: cells exact; argmax orders by (12-dp gain,
    threshold) and the cross-feature rank by (12-dp gain, feature)."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    part = load_table(spark, sf_dir, "part")
    base = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_size")),
        lineitem.l_partkey == F.col("p_partkey"),
    ).select(
        F.col("l_quantity").cast("long").alias("quantity"),
        F.round(F.col("l_discount") * 100).cast("long").alias("discount"),
        F.col("p_size").cast("long").alias("part_size"),
        F.floor(
            F.round(F.col("l_extendedprice") * 100).cast("long") / 500000
        )
        .cast("long")
        .alias("price_bucket"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    long = None
    for feat in ("quantity", "discount", "part_size", "price_bucket"):
        p = base.select(
            F.lit(feat).alias("feature"), F.col(feat).alias("v"), "y"
        )
        long = p if long is None else long.unionByName(p)
    cells = (
        long.groupBy("feature", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("y").cast("long").alias("pos"),
        )
        .localCheckpoint(eager=True)
    )
    cand = cells.select("feature", F.col("v").alias("thr")).distinct()
    j = cells.join(cand, "feature")
    split = (
        j.groupBy("feature", "thr")
        .agg(
            F.sum(F.when(F.col("v") <= F.col("thr"), F.col("c")).otherwise(0)).alias("nl"),
            F.sum(F.when(F.col("v") <= F.col("thr"), F.col("pos")).otherwise(0)).alias("pl"),
            F.sum(F.when(F.col("v") > F.col("thr"), F.col("c")).otherwise(0)).alias("nr"),
            F.sum(F.when(F.col("v") > F.col("thr"), F.col("pos")).otherwise(0)).alias("pr"),
        )
        .where((F.col("nl") > 0) & (F.col("nr") > 0))
    )
    ntot = F.col("nl") + F.col("nr")
    ptot = F.col("pl") + F.col("pr")
    parent = (
        1
        - F.pow(ptot.cast("double") / ntot, 2)
        - F.pow((ntot - ptot).cast("double") / ntot, 2)
    )
    child = lambda n, p: F.col(n).cast("double") * (  # noqa: E731
        1
        - F.pow(F.col(p).cast("double") / F.col(n), 2)
        - F.pow((F.col(n) - F.col(p)).cast("double") / F.col(n), 2)
    )
    gain = parent - (child("nl", "pl") + child("nr", "pr")) / ntot
    scored = split.select("feature", "thr", gain.alias("gain"))
    wf = Window.partitionBy("feature").orderBy(
        F.round(F.col("gain"), 12).desc(), "thr"
    )
    best = scored.withColumn("rk", F.row_number().over(wf)).where(
        F.col("rk") == 1
    )
    wall = Window.orderBy(F.round(F.col("gain"), 12).desc(), "feature")
    return best.select(
        "feature",
        F.col("thr").cast("long").alias("best_threshold"),
        F.round(F.col("gain"), 8).alias("gini_gain"),
        F.row_number().over(wall).cast("long").alias("rank"),
    ).orderBy("rank")
