"""Round-4 wave 28: classical-model fitting as declarative plans —
EM for a Gaussian mixture, a depth-2 CART tree, and leave-one-out
k-NN evaluation.

- ``gmm_em_1d``: 2-component 1-D Gaussian mixture on log order price,
  3 unrolled EM steps run on the (log-price-bucket, count) HISTOGRAM
  — the sufficient-statistics formulation that makes EM a bounded
  problem at 100 TB (the fact table is touched once).
- ``cart_depth2_tree``: a depth-2 CART decision tree (Gini impurity)
  predicting returned lineitems from (quantity, discount), fitted on
  the bounded (qty, disc, label) cell table — candidate-split search
  as one cells x candidates join, never a per-row pass per split.
- ``knn_loo_accuracy``: leave-one-out 3-NN classification accuracy on
  a deterministic embedding sample — the evaluation loop of every
  embedding-quality dashboard, as one ranked self-join.

Cross-engine determinism: histograms/cells are exact (2-dp log
buckets, integer qty / discount-percent); EM responsibilities and
moment terms are 9/6-dp-rounded DECIMAL sums over bounded cells;
Gini comparisons order by (12-dp-rounded gini, feature, threshold);
k-NN distances are ordered left-to-right float folds (the
embedding_norms pattern) with (distance, id) tie-breaks.

Reference anchor: SURVEY.md §2.11 ML-adjacent metrics; extends
logistic_coeffs / adaboost_stumps / semantic_dedup_stats (k-means EM
cousin) with the generative-mixture and tree families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import register

# fixed EM initialization (log-price units) and step count
_MU1_0, _MU2_0, _SIG_0, _W_0 = 8.0, 11.0, 1.0, 0.5
_EM_STEPS = 3


# ---------------------------------------------------------------------------
# 2-component GMM via histogram EM
# ---------------------------------------------------------------------------

def _gmm_oracle() -> str:
    parts = [
        """
    WITH hist AS (
        SELECT CAST(ROUND(LN(o_totalprice), 2) AS DECIMAL(10,2)) AS x,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    ), n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist),
    p0 AS (
        SELECT CAST(%s AS DOUBLE) AS mu1, CAST(%s AS DOUBLE) AS mu2,
               CAST(%s AS DOUBLE) AS s1, CAST(%s AS DOUBLE) AS s2,
               CAST(%s AS DOUBLE) AS w1
    )""" % (_MU1_0, _MU2_0, _SIG_0, _SIG_0, _W_0)
    ]
    for t in range(1, _EM_STEPS + 1):
        p = t - 1
        parts.append(
            f""", e{t} AS (
        SELECT h.x, h.c,
               (p.w1 * EXP(-POWER(CAST(h.x AS DOUBLE) - p.mu1, 2)
                           / (2 * p.s1 * p.s1)) / p.s1)
               / (p.w1 * EXP(-POWER(CAST(h.x AS DOUBLE) - p.mu1, 2)
                             / (2 * p.s1 * p.s1)) / p.s1
                  + (1 - p.w1) * EXP(-POWER(CAST(h.x AS DOUBLE) - p.mu2, 2)
                                     / (2 * p.s2 * p.s2)) / p.s2) AS r
        FROM hist h CROSS JOIN p{p} p
    ), m{t} AS (
        SELECT CAST(SUM(CAST(ROUND(r * c, 6) AS DECIMAL(38,6))) AS DOUBLE)
                   AS w1n,
               CAST(SUM(CAST(ROUND(r * c * CAST(x AS DOUBLE), 6)
                             AS DECIMAL(38,6))) AS DOUBLE) AS s1n,
               CAST(SUM(CAST(ROUND(r * c * CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE), 6)
                             AS DECIMAL(38,6))) AS DOUBLE) AS q1n,
               CAST(SUM(CAST(ROUND((1 - r) * c, 6) AS DECIMAL(38,6)))
                    AS DOUBLE) AS w2n,
               CAST(SUM(CAST(ROUND((1 - r) * c * CAST(x AS DOUBLE), 6)
                             AS DECIMAL(38,6))) AS DOUBLE) AS s2n,
               CAST(SUM(CAST(ROUND((1 - r) * c * CAST(x AS DOUBLE)
                                   * CAST(x AS DOUBLE), 6)
                             AS DECIMAL(38,6))) AS DOUBLE) AS q2n
        FROM e{t}
    ), p{t} AS (
        SELECT s1n / w1n AS mu1, s2n / w2n AS mu2,
               SQRT(GREATEST(q1n / w1n - POWER(s1n / w1n, 2), 1e-6)) AS s1,
               SQRT(GREATEST(q2n / w2n - POWER(s2n / w2n, 2), 1e-6)) AS s2,
               w1n / (w1n + w2n) AS w1
        FROM m{t}
    )"""
        )
    parts.append(
        f"""
    SELECT comp,
           ROUND(CASE comp WHEN 1 THEN w1 ELSE 1 - w1 END, 6) AS weight,
           ROUND(CASE comp WHEN 1 THEN mu1 ELSE mu2 END, 6) AS mu,
           ROUND(CASE comp WHEN 1 THEN s1 ELSE s2 END, 6) AS sigma
    FROM p{_EM_STEPS}
    CROSS JOIN (SELECT UNNEST([CAST(1 AS BIGINT), 2]) AS comp)
    ORDER BY comp
    """
    )
    return "".join(parts)


@register("gmm_em_1d", _gmm_oracle())
def gmm_em_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-component Gaussian mixture on log order price, 3 EM steps on
    the 2-dp log-price histogram (sufficient statistics, not rows):
    the canonical 'is this price distribution bimodal?' fit.

    100 TB shape: ONE pass over the fact builds a <= ~1000-cell
    histogram; every EM step is then a cells-sized map + 1-row reduce
    — adding steps adds tiny stages, never another fact scan.
    Determinism: bucket keys are exact DECIMAL(10,2); responsibilities
    and moment terms round to 6 dp and accumulate as exact DECIMALs;
    parameter updates are fixed IEEE expressions replayed term-for-term
    by the unrolled DuckDB oracle."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    hist = (
        orders.groupBy(
            F.round(F.log(F.col("o_totalprice")), 2)
            .cast("decimal(10,2)")
            .alias("x")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    params = spark.createDataFrame(
        [(_MU1_0, _MU2_0, _SIG_0, _SIG_0, _W_0)],
        "mu1 double, mu2 double, s1 double, s2 double, w1 double",
    )
    xd = F.col("x").cast("double")

    def dens(mu, s):
        return F.exp(-F.pow(xd - F.col(mu), 2) / (2 * F.col(s) * F.col(s))) / F.col(s)

    def dsum(expr):
        return F.sum(F.round(expr, 6).cast("decimal(38,6)")).cast("double")

    for _ in range(_EM_STEPS):
        e = hist.crossJoin(F.broadcast(params)).withColumn(
            "r",
            (F.col("w1") * dens("mu1", "s1"))
            / (
                F.col("w1") * dens("mu1", "s1")
                + (1 - F.col("w1")) * dens("mu2", "s2")
            ),
        )
        m = e.agg(
            dsum(F.col("r") * F.col("c")).alias("w1n"),
            dsum(F.col("r") * F.col("c") * xd).alias("s1n"),
            dsum(F.col("r") * F.col("c") * xd * xd).alias("q1n"),
            dsum((1 - F.col("r")) * F.col("c")).alias("w2n"),
            dsum((1 - F.col("r")) * F.col("c") * xd).alias("s2n"),
            dsum((1 - F.col("r")) * F.col("c") * xd * xd).alias("q2n"),
        )
        params = m.select(
            (F.col("s1n") / F.col("w1n")).alias("mu1"),
            (F.col("s2n") / F.col("w2n")).alias("mu2"),
            F.sqrt(
                F.greatest(
                    F.col("q1n") / F.col("w1n")
                    - F.pow(F.col("s1n") / F.col("w1n"), 2),
                    F.lit(1e-6),
                )
            ).alias("s1"),
            F.sqrt(
                F.greatest(
                    F.col("q2n") / F.col("w2n")
                    - F.pow(F.col("s2n") / F.col("w2n"), 2),
                    F.lit(1e-6),
                )
            ).alias("s2"),
            (F.col("w1n") / (F.col("w1n") + F.col("w2n"))).alias("w1"),
        ).localCheckpoint(eager=True)
    comps = spark.range(1, 3).select(F.col("id").alias("comp"))
    return (
        params.crossJoin(F.broadcast(comps))
        .select(
            "comp",
            F.round(
                F.when(F.col("comp") == 1, F.col("w1")).otherwise(
                    1 - F.col("w1")
                ),
                6,
            ).alias("weight"),
            F.round(
                F.when(F.col("comp") == 1, F.col("mu1")).otherwise(
                    F.col("mu2")
                ),
                6,
            ).alias("mu"),
            F.round(
                F.when(F.col("comp") == 1, F.col("s1")).otherwise(
                    F.col("s2")
                ),
                6,
            ).alias("sigma"),
        )
        .orderBy("comp")
    )


# ---------------------------------------------------------------------------
# Depth-2 CART tree on (quantity, discount) -> returned
# ---------------------------------------------------------------------------

_CELLS_SQL = """
        SELECT CAST(l_quantity AS BIGINT) AS qty,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS disc,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2, 3
"""

# weighted Gini of a candidate split, from per-side (n, pos) tallies
_GINI_SQL = """
          (CAST(nl AS DOUBLE)
             * (1 - POWER(CAST(pl AS DOUBLE) / nl, 2)
                  - POWER(CAST(nl - pl AS DOUBLE) / nl, 2))
           + CAST(nr AS DOUBLE)
             * (1 - POWER(CAST(pr AS DOUBLE) / nr, 2)
                  - POWER(CAST(nr - pr AS DOUBLE) / nr, 2)))
          / (nl + nr)
"""


def _cart_best_sql(cells: str, node: str) -> str:
    """Best (feature, threshold) over `cells` by 12-dp-rounded Gini
    with (feature, threshold) tie-break; emits one row labeled
    `node`."""
    return f"""
        SELECT '{node}' AS node, feature, thr,
               ROUND(gini, 6) AS gini,
               nl + nr AS n, pl + pr AS n_pos
        FROM (
            SELECT feature, thr, nl, pl, nr, pr, {_GINI_SQL} AS gini,
                   ROW_NUMBER() OVER (
                       ORDER BY ROUND({_GINI_SQL}, 12), feature, thr
                   ) AS rk
            FROM (
                SELECT cand.feature, cand.thr,
                       SUM(CASE WHEN (CASE cand.feature
                                          WHEN 'qty' THEN g.qty
                                          ELSE g.disc END) <= cand.thr
                                THEN g.c ELSE 0 END) AS nl,
                       SUM(CASE WHEN (CASE cand.feature
                                          WHEN 'qty' THEN g.qty
                                          ELSE g.disc END) <= cand.thr
                                THEN g.y * g.c ELSE 0 END) AS pl,
                       SUM(CASE WHEN (CASE cand.feature
                                          WHEN 'qty' THEN g.qty
                                          ELSE g.disc END) > cand.thr
                                THEN g.c ELSE 0 END) AS nr,
                       SUM(CASE WHEN (CASE cand.feature
                                          WHEN 'qty' THEN g.qty
                                          ELSE g.disc END) > cand.thr
                                THEN g.y * g.c ELSE 0 END) AS pr
                FROM ({cells}) g
                CROSS JOIN (
                    SELECT 'qty' AS feature, qty AS thr
                    FROM ({cells}) GROUP BY qty
                    UNION ALL
                    SELECT 'disc' AS feature, disc AS thr
                    FROM ({cells}) GROUP BY disc
                ) cand
                GROUP BY cand.feature, cand.thr
            )
            WHERE nl > 0 AND nr > 0
        )
        WHERE rk = 1
"""


def _cart_oracle() -> str:
    root = _cart_best_sql("SELECT * FROM cells", "root")
    left = _cart_best_sql(
        """SELECT c.* FROM cells c CROSS JOIN rootpick r
           WHERE (CASE r.feature WHEN 'qty' THEN c.qty ELSE c.disc END)
                 <= r.thr""",
        "L",
    )
    right = _cart_best_sql(
        """SELECT c.* FROM cells c CROSS JOIN rootpick r
           WHERE (CASE r.feature WHEN 'qty' THEN c.qty ELSE c.disc END)
                 > r.thr""",
        "R",
    )
    return f"""
    WITH cells AS MATERIALIZED ({_CELLS_SQL}),
    rootpick AS MATERIALIZED ({root})
    SELECT node, feature, CAST(thr AS BIGINT) AS threshold, gini,
           CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos
    FROM (
        SELECT * FROM rootpick
        UNION ALL {left}
        UNION ALL {right}
    ) ORDER BY node
    """


@register("cart_depth2_tree", _cart_oracle())
def cart_depth2_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-2 CART (Gini) tree predicting returned lineitems from
    (quantity, discount): best root split, then the best split inside
    each branch — three rows (root/L/R) with the chosen feature,
    threshold, 6-dp Gini, and branch tallies.

    100 TB shape: the fact reduces ONCE to the <= qty x disc x 2 cell
    table (~1100 rows); the candidate-split search is a cells x
    candidates (~61) cross join grouped per candidate — the classic
    sufficient-statistics CART, no per-split fact passes.
    Determinism: cells and tallies are exact integers; the argmin
    orders by (12-dp-rounded Gini, feature, threshold)."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    cells = (
        lineitem.groupBy(
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_discount") * 100).cast("long").alias("disc"),
            F.when(F.col("l_returnflag") == "R", 1)
            .otherwise(0)
            .alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    cands = (
        cells.select(F.lit("qty").alias("feature"), F.col("qty").alias("thr"))
        .distinct()
        .unionAll(
            cells.select(
                F.lit("disc").alias("feature"), F.col("disc").alias("thr")
            ).distinct()
        )
        .localCheckpoint(eager=True)
    )

    def best(cell_df: DataFrame, node: str) -> DataFrame:
        from pyspark.sql import Window

        fval = F.when(F.col("feature") == "qty", F.col("qty")).otherwise(
            F.col("disc")
        )
        j = cell_df.crossJoin(cands)
        agg = j.groupBy("feature", "thr").agg(
            F.sum(F.when(fval <= F.col("thr"), F.col("c")).otherwise(0)).alias(
                "nl"
            ),
            F.sum(
                F.when(fval <= F.col("thr"), F.col("y") * F.col("c")).otherwise(
                    0
                )
            ).alias("pl"),
            F.sum(F.when(fval > F.col("thr"), F.col("c")).otherwise(0)).alias(
                "nr"
            ),
            F.sum(
                F.when(fval > F.col("thr"), F.col("y") * F.col("c")).otherwise(
                    0
                )
            ).alias("pr"),
        ).where((F.col("nl") > 0) & (F.col("nr") > 0))
        side = lambda n, p: F.col(n).cast("double") * (  # noqa: E731
            1
            - F.pow(F.col(p).cast("double") / F.col(n), 2)
            - F.pow((F.col(n) - F.col(p)).cast("double") / F.col(n), 2)
        )
        gini = (side("nl", "pl") + side("nr", "pr")) / (
            F.col("nl") + F.col("nr")
        )
        w = Window.orderBy(F.round(gini, 12), "feature", "thr")
        return (
            agg.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select(
                F.lit(node).alias("node"),
                "feature",
                F.col("thr").cast("long").alias("threshold"),
                F.round(gini, 6).alias("gini"),
                (F.col("nl") + F.col("nr")).cast("long").alias("n"),
                (F.col("pl") + F.col("pr")).cast("long").alias("n_pos"),
            )
        )

    root = best(cells, "root").localCheckpoint(eager=True)
    rsel = root.select(
        F.col("feature").alias("rfeature"), F.col("threshold").alias("rthr")
    )
    withroot = cells.crossJoin(F.broadcast(rsel))
    rval = F.when(F.col("rfeature") == "qty", F.col("qty")).otherwise(
        F.col("disc")
    )
    lcells = withroot.where(rval <= F.col("rthr")).drop("rfeature", "rthr")
    rcells = withroot.where(rval > F.col("rthr")).drop("rfeature", "rthr")
    return (
        root.unionByName(best(lcells, "L"))
        .unionByName(best(rcells, "R"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Leave-one-out 3-NN accuracy on an embedding sample
# ---------------------------------------------------------------------------

_KNN_K = 3
_SAMPLE_MOD = 20


@register(
    "knn_loo_accuracy",
    f"""
    WITH s AS (
        SELECT vec_id, label, embedding FROM embeddings
        WHERE vec_id % {_SAMPLE_MOD} = 0
    ), sv AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM s
    ), d AS (
        SELECT a.vec_id AS qa, a.label AS la, b.vec_id AS qb,
               b.label AS lb,
               ROUND(list_sum(list_transform(a.e,
                   (x, i) -> (x - b.e[i]) * (x - b.e[i]))), 9) AS dist
        FROM sv a JOIN sv b ON a.vec_id <> b.vec_id
    ), r AS (
        SELECT qa, la, lb,
               ROW_NUMBER() OVER (PARTITION BY qa ORDER BY dist, qb) AS rk
        FROM d
    ), vote AS (
        SELECT qa, la,
               CASE WHEN SUM(CASE WHEN lb = la THEN 1 ELSE 0 END) * 2
                         > {_KNN_K} THEN 1 ELSE 0 END AS correct
        FROM r WHERE rk <= {_KNN_K} GROUP BY qa, la
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(correct) AS BIGINT) AS n_correct,
           ROUND(CAST(SUM(correct) AS DOUBLE) / COUNT(*), 6) AS accuracy
    FROM vote
    """,
)
def knn_loo_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 3-NN classification accuracy over the
    deterministic 1-in-20 embedding sample: every held-out vector is
    classified by majority label of its 3 nearest neighbors (squared
    L2) — the standard quick probe of embedding quality.

    100 TB shape: LOO evaluation is inherently quadratic in the
    EVALUATION SAMPLE, so the sample (not the corpus) bounds the join:
    (n/20)^2 pairs, ranked top-k per query.
    On the full corpus the IVF/LSH paths (operators/similarity.py) do
    the candidate bounding; this query is the exact-eval harness.
    Determinism: distances are ordered left-to-right array folds
    rounded to 9 dp; ranking ties break by neighbor id; the majority
    vote is integer."""
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    s = emb.where(F.col("vec_id") % _SAMPLE_MOD == 0).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    ).localCheckpoint(eager=True)
    a = s.select(
        F.col("vec_id").alias("qa"), F.col("label").alias("la"),
        F.col("e").alias("ea"),
    )
    b = s.select(
        F.col("vec_id").alias("qb"), F.col("label").alias("lb"),
        F.col("e").alias("eb"),
    )
    dist = F.round(
        F.aggregate(
            F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )
    d = a.join(b, F.col("qa") != F.col("qb")).select(
        "qa", "la", "qb", "lb", dist.alias("dist")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qa").orderBy("dist", "qb")
    r = d.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= _KNN_K
    )
    vote = r.groupBy("qa", "la").agg(
        F.when(
            F.sum(F.when(F.col("lb") == F.col("la"), 1).otherwise(0)) * 2
            > _KNN_K,
            1,
        )
        .otherwise(0)
        .alias("correct")
    )
    return vote.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum("correct").cast("long").alias("n_correct"),
        F.round(
            F.sum("correct").cast("double") / F.count(F.lit(1)), 6
        ).alias("accuracy"),
    )
