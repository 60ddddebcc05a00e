"""Round-3 fourth wave: corpus-trained classification and feature selection.

- ``naive_bayes_lang``: multinomial Naive Bayes trained on the corpus's
  own token counts (Laplace-smoothed, class = ``lang``), scored back over
  the corpus, reported as a confusion matrix.  The classical model-based
  companion to the heuristic ``lang_id_detect`` — the reference's
  supervised-classification surface (models/supervised.py trains a
  classifier over node features) re-expressed as pure relational algebra:
  train AND inference are one declarative plan, no driver-side model
  object.
- ``chi2_top_terms``: chi-squared (one-vs-rest, token-level 2x2
  contingency) feature selection — the top discriminative terms per
  language.  The standard vocabulary-pruning step before training any
  text classifier at scale.

Cross-engine determinism (see plans.queries docstring for the full
rules): the NB argmax is decided on DECIMAL-summed per-token log
probabilities — each ``LN`` is rounded to 6 dp and cast to
DECIMAL(12,6) BEFORE summation, so the per-document class scores are
exact decimal sums (associative, order-independent) in both engines and
the argmax cannot flip on float re-association.  chi-squared uses only
+ - * / over doubles (IEEE-deterministic given identical association,
which both expression texts share) — no transcendental in the ordering
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.functions.text import tokens
from federated_gcn_spark.operators.stats import partitioned_prefix_sum
from federated_gcn_spark.plans.queries import register, _event_epoch_sec

_LANGS = ["de", "en", "es", "fr", "zh"]


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    return docs.select(
        "doc_id", "lang", F.explode(tokens(F.lower(F.col("text")))).alias("term")
    )


@register(
    "naive_bayes_lang",
    r"""
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), ct AS (
        SELECT term,
               COUNT(*) FILTER (lang = 'de') AS c_de,
               COUNT(*) FILTER (lang = 'en') AS c_en,
               COUNT(*) FILTER (lang = 'es') AS c_es,
               COUNT(*) FILTER (lang = 'fr') AS c_fr,
               COUNT(*) FILTER (lang = 'zh') AS c_zh
        FROM toks GROUP BY term
    ), tots AS (
        SELECT SUM(c_de) AS t_de, SUM(c_en) AS t_en, SUM(c_es) AS t_es,
               SUM(c_fr) AS t_fr, SUM(c_zh) AS t_zh,
               COUNT(*) AS v
        FROM ct
    ), lp AS (
        SELECT term,
               CAST(ROUND(LN((c_de + 1) / CAST(t_de + v AS DOUBLE)), 6)
                    AS DECIMAL(12,6)) AS lp_de,
               CAST(ROUND(LN((c_en + 1) / CAST(t_en + v AS DOUBLE)), 6)
                    AS DECIMAL(12,6)) AS lp_en,
               CAST(ROUND(LN((c_es + 1) / CAST(t_es + v AS DOUBLE)), 6)
                    AS DECIMAL(12,6)) AS lp_es,
               CAST(ROUND(LN((c_fr + 1) / CAST(t_fr + v AS DOUBLE)), 6)
                    AS DECIMAL(12,6)) AS lp_fr,
               CAST(ROUND(LN((c_zh + 1) / CAST(t_zh + v AS DOUBLE)), 6)
                    AS DECIMAL(12,6)) AS lp_zh
        FROM ct, tots
    ), pri AS (
        SELECT
            CAST(ROUND(LN((COUNT(*) FILTER (lang = 'de'))
                          / CAST(COUNT(*) AS DOUBLE)), 6)
                 AS DECIMAL(12,6)) AS p_de,
            CAST(ROUND(LN((COUNT(*) FILTER (lang = 'en'))
                          / CAST(COUNT(*) AS DOUBLE)), 6)
                 AS DECIMAL(12,6)) AS p_en,
            CAST(ROUND(LN((COUNT(*) FILTER (lang = 'es'))
                          / CAST(COUNT(*) AS DOUBLE)), 6)
                 AS DECIMAL(12,6)) AS p_es,
            CAST(ROUND(LN((COUNT(*) FILTER (lang = 'fr'))
                          / CAST(COUNT(*) AS DOUBLE)), 6)
                 AS DECIMAL(12,6)) AS p_fr,
            CAST(ROUND(LN((COUNT(*) FILTER (lang = 'zh'))
                          / CAST(COUNT(*) AS DOUBLE)), 6)
                 AS DECIMAL(12,6)) AS p_zh
        FROM documents WHERE TRIM(text) <> ''
    ), dscore AS (
        SELECT doc_id, ANY_VALUE(lang) AS lang,
               SUM(lp_de) AS s_de, SUM(lp_en) AS s_en, SUM(lp_es) AS s_es,
               SUM(lp_fr) AS s_fr, SUM(lp_zh) AS s_zh
        FROM toks JOIN lp USING (term)
        GROUP BY doc_id
    ), long AS (
        SELECT doc_id, lang,
               UNNEST(['de', 'en', 'es', 'fr', 'zh']) AS pred_lang,
               UNNEST([s_de + p_de, s_en + p_en, s_es + p_es,
                       s_fr + p_fr, s_zh + p_zh]) AS score
        FROM dscore, pri
    ), pred AS (
        SELECT doc_id, lang, pred_lang,
               ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY score DESC, pred_lang
               ) AS rn
        FROM long
    )
    SELECT lang AS lang_actual, pred_lang AS lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY lang, pred_lang
    """,
)
def naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes over ``documents``: Laplace-smoothed
    per-class token log-likelihoods + log priors, argmax over the five
    ``lang`` classes, reported as an (actual, predicted) confusion
    matrix.  Train and inference in ONE declarative plan.

    100 TB shape: the class-conditional count matrix is built by a
    single pivot aggregation (one shuffle, output = vocabulary x 5 —
    tiny relative to the corpus); class totals / vocabulary size / log
    priors each reduce to a single broadcast row.  Scoring re-joins the
    token stream to the vocabulary on ``term`` (equi-join; AQE
    broadcasts the vocab side when it fits, falls back to a shuffle
    join when the vocabulary is huge) and aggregates per document —
    Spark reuses the tokenize exchange for both the training and the
    scoring subtree.  The argmax window runs over exactly 5 rows per
    document, partition-local after the per-doc aggregation.

    Determinism: per-token log-probs are rounded to 6 dp and cast to
    DECIMAL(12,6) BEFORE the per-document sum, so class scores are
    exact (associativity-independent) in both engines; ties break on
    class name.  Reference parity: the supervised classification
    surface of models/supervised.py:100-130, re-expressed relationally.
    """
    # tokenization feeds both the training pivot and the scoring join,
    # and the pivoted count matrix feeds both tots and lp — stage each
    toks = _doc_tokens(spark, sf_dir).localCheckpoint(eager=False)

    ct = toks.groupBy("term").pivot("lang", _LANGS).count()
    ct = ct.select(
        "term",
        *[F.coalesce(F.col(lang), F.lit(0)).alias(f"c_{lang}") for lang in _LANGS],
    ).localCheckpoint(eager=False)

    tots = ct.agg(
        *[F.sum(f"c_{lang}").alias(f"t_{lang}") for lang in _LANGS],
        F.count(F.lit(1)).alias("v"),
    )

    lp = ct.crossJoin(F.broadcast(tots)).select(
        "term",
        *[
            F.round(
                F.log(
                    (F.col(f"c_{lang}") + F.lit(1))
                    / (F.col(f"t_{lang}") + F.col("v")).cast("double")
                ),
                6,
            )
            .cast("decimal(12,6)")
            .alias(f"lp_{lang}")
            for lang in _LANGS
        ],
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.trim(F.col("text")) != ""
    )
    pri = docs.agg(
        *[
            F.round(
                F.log(
                    F.count_if(F.col("lang") == lang)
                    / F.count(F.lit(1)).cast("double")
                ),
                6,
            )
            .cast("decimal(12,6)")
            .alias(f"p_{lang}")
            for lang in _LANGS
        ]
    )

    dscore = (
        toks.join(lp, "term")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            *[F.sum(f"lp_{lang}").alias(f"s_{lang}") for lang in _LANGS],
        )
        .crossJoin(F.broadcast(pri))
    )

    stack_args = ", ".join(
        f"'{lang}', s_{lang} + p_{lang}" for lang in _LANGS
    )
    long = dscore.select(
        "doc_id",
        "lang",
        F.expr(f"stack({len(_LANGS)}, {stack_args}) AS (pred_lang, score)"),
    )

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("pred_lang")
    )
    pred = long.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)

    return pred.groupBy(
        F.col("lang").alias("lang_actual"),
        F.col("pred_lang").alias("lang_pred"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "chi2_top_terms",
    r"""
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), ct AS (
        SELECT term,
               COUNT(*) FILTER (lang = 'de') AS c_de,
               COUNT(*) FILTER (lang = 'en') AS c_en,
               COUNT(*) FILTER (lang = 'es') AS c_es,
               COUNT(*) FILTER (lang = 'fr') AS c_fr,
               COUNT(*) FILTER (lang = 'zh') AS c_zh,
               COUNT(*) AS tf
        FROM toks GROUP BY term
    ), tots AS (
        SELECT SUM(c_de) AS t_de, SUM(c_en) AS t_en, SUM(c_es) AS t_es,
               SUM(c_fr) AS t_fr, SUM(c_zh) AS t_zh,
               SUM(tf) AS n
        FROM ct
    ), long AS (
        SELECT term, tf,
               UNNEST(['de', 'en', 'es', 'fr', 'zh']) AS lang,
               UNNEST([c_de, c_en, c_es, c_fr, c_zh]) AS a,
               UNNEST([t_de, t_en, t_es, t_fr, t_zh]) AS t_k,
               n
        FROM ct, tots
        WHERE tf >= 5
    ), scored AS (
        SELECT lang, term, a,
               CAST(n AS DOUBLE)
                   * (CAST(a AS DOUBLE) * CAST(n - t_k - tf + a AS DOUBLE)
                      - CAST(tf - a AS DOUBLE) * CAST(t_k - a AS DOUBLE))
                   * (CAST(a AS DOUBLE) * CAST(n - t_k - tf + a AS DOUBLE)
                      - CAST(tf - a AS DOUBLE) * CAST(t_k - a AS DOUBLE))
                   / (CAST(tf AS DOUBLE) * CAST(n - tf AS DOUBLE)
                      * CAST(t_k AS DOUBLE) * CAST(n - t_k AS DOUBLE))
                   AS chi2
        FROM long
    ), ranked AS (
        SELECT lang, term, a, chi2,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY chi2 DESC, term
               ) AS rn
        FROM scored
    )
    SELECT lang, term,
           ROUND(chi2, 4) AS chi2,
           CAST(a AS BIGINT) AS tf_in_class
    FROM ranked WHERE rn <= 10
    """,
)
def chi2_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared feature selection: for each language, the 10 most
    discriminative terms by the one-vs-rest token-level 2x2 contingency
    chi-squared statistic (min corpus frequency 5).  The standard
    vocabulary-pruning / keyword-extraction step before training a text
    classifier over a 100 TB corpus.

    100 TB shape: one pivot aggregation produces the vocabulary x 5
    count matrix (the only corpus-sized shuffle — everything after runs
    on vocabulary-sized data); corpus totals ride as a broadcast single
    row; the per-class top-10 window partitions on ``lang`` (5
    partitions, each vocabulary-sized — bounded, and shrinkable further
    with a per-partition pre-top-k if vocabulary ever rivals corpus
    size).

    Determinism: chi-squared uses only + - * / over doubles from exact
    integer counts with identical association in both engines (IEEE
    multiplication/division is bit-deterministic; no transcendental in
    the ordering path), so the ranking cannot diverge; ties break on
    term.
    """
    toks = _doc_tokens(spark, sf_dir)

    ct = toks.groupBy("term").pivot("lang", _LANGS).count()
    ct = ct.select(
        "term",
        *[F.coalesce(F.col(lang), F.lit(0)).alias(f"c_{lang}") for lang in _LANGS],
    ).withColumn(
        "tf", sum(F.col(f"c_{lang}") for lang in _LANGS)
    ).localCheckpoint(eager=False)  # tots + long: one tokenize/pivot pass

    tots = ct.agg(
        *[F.sum(f"c_{lang}").alias(f"t_{lang}") for lang in _LANGS],
        F.sum("tf").alias("n"),
    )

    stack_args = ", ".join(
        f"'{lang}', c_{lang}, t_{lang}" for lang in _LANGS
    )
    long = (
        ct.where(F.col("tf") >= 5)
        .crossJoin(F.broadcast(tots))
        .select(
            "term",
            "tf",
            "n",
            F.expr(f"stack({len(_LANGS)}, {stack_args}) AS (lang, a, t_k)"),
        )
    )

    a = F.col("a").cast("double")
    d = (F.col("n") - F.col("t_k") - F.col("tf") + F.col("a")).cast("double")
    b = (F.col("tf") - F.col("a")).cast("double")
    c = (F.col("t_k") - F.col("a")).cast("double")
    det = a * d - b * c
    chi2 = (
        F.col("n").cast("double")
        * det
        * det
        / (
            F.col("tf").cast("double")
            * (F.col("n") - F.col("tf")).cast("double")
            * F.col("t_k").cast("double")
            * (F.col("n") - F.col("t_k")).cast("double")
        )
    )
    scored = long.select("lang", "term", "a", chi2.alias("chi2"))

    w = Window.partitionBy("lang").orderBy(F.desc("chi2"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select(
            "lang",
            "term",
            F.round("chi2", 4).alias("chi2"),
            F.col("a").cast("bigint").alias("tf_in_class"),
        )
    )


@register(
    "new_vs_returning_users",
    """
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_ns(ts) // 1000000000 // 86400 AS day
        FROM events
    ), f AS (
        SELECT user_id, day,
               MIN(day) OVER (PARTITION BY user_id) AS first_day
        FROM ud
    ), d AS (
        SELECT day,
               COUNT(*) FILTER (day = first_day) AS new_users,
               COUNT(*) AS active_users
        FROM f GROUP BY day
    )
    SELECT day,
           new_users,
           active_users - new_users AS returning_users,
           active_users,
           CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM d
    """,
)
def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split plus the cumulative user count —
    the growth-accounting backbone of product analytics (every "DAU by
    cohort age" dashboard starts here).

    100 TB shape: ONE shuffle on ``user_id`` serves both the
    (user, day) distinct and the per-user first-day window (the distinct
    re-partitions by (user_id, day); the window's user_id requirement is
    satisfied by the same exchange's co-location, so Catalyst plans a
    single exchange + sort); the daily rollup then reduces to
    calendar-bounded rows.  The cumulative count uses the cost-based
    distributed prefix sum (operators/stats.partitioned_prefix_sum) —
    never an unpartitioned window over unbounded data, though at
    calendar cardinality the single-task branch IS the optimal plan.
    ``ts`` goes through the schema-adaptive epoch helper (nanos-as-long
    and micros-NTZ parquet both ship in the wild)."""
    events = load_table(spark, sf_dir, "events", parallel=True)
    sec = _event_epoch_sec(events)
    ud = events.select(
        "user_id", (sec / F.lit(1)).cast("long").alias("__sec")
    ).select("user_id", F.expr("__sec div 86400").alias("day")).distinct()
    w = Window.partitionBy("user_id")
    f = ud.withColumn("first_day", F.min("day").over(w))
    d = f.groupBy("day").agg(
        F.count_if(F.col("day") == F.col("first_day")).alias("new_users"),
        F.count(F.lit(1)).alias("active_users"),
    )
    c = partitioned_prefix_sum(d, "day", "new_users", "__cum_before")
    return c.select(
        "day",
        "new_users",
        (F.col("active_users") - F.col("new_users")).alias("returning_users"),
        "active_users",
        (F.col("__cum_before") + F.col("new_users")).alias("cum_users"),
    )


@register(
    "abc_revenue_classes",
    """
    WITH li AS (
        SELECT l_partkey,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_e4
        FROM lineitem
    ), per_part AS (
        SELECT l_partkey, CAST(SUM(rev_e4) AS BIGINT) AS rev_e4
        FROM li GROUP BY l_partkey
    ), grp AS (
        SELECT rev_e4,
               COUNT(*) AS n_parts,
               rev_e4 * COUNT(*) AS grp_rev
        FROM per_part GROUP BY rev_e4
    ), tot AS (
        SELECT SUM(grp_rev) AS total FROM grp
    ), ranked AS (
        SELECT rev_e4, n_parts, grp_rev,
               SUM(grp_rev) OVER (ORDER BY rev_e4 DESC) - grp_rev
                   AS cum_before,
               (SELECT total FROM tot) AS total
        FROM grp
    ), classed AS (
        SELECT CASE WHEN cum_before * 100 < total * 80 THEN 'A'
                    WHEN cum_before * 100 < total * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               n_parts, grp_rev, total
        FROM ranked
    )
    SELECT abc_class,
           CAST(SUM(n_parts) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(grp_rev) AS DOUBLE) / 10000, 2) AS revenue,
           ROUND(CAST(SUM(grp_rev) AS DOUBLE) / CAST(ANY_VALUE(total) AS DOUBLE), 6)
               AS revenue_share
    FROM classed
    GROUP BY abc_class
    """,
)
def abc_revenue_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification: parts ranked by revenue,
    classified A (first 80% of cumulative revenue), B (to 95%), C (tail)
    — the classic 80/20 assortment analysis.

    100 TB shape: the fact scan reduces to one per-part aggregate (the
    only corpus-sized shuffle); classification then runs at DISTINCT
    revenue-value granularity, so the prefix sum's input is
    dimension-sized, ordered on a unique integer key, and handled by the
    cost-based distributed prefix sum (range repartition + per-partition
    offsets above 1M rows, single-task below).

    Determinism: revenue is computed in exact 1e-4-dollar integers
    (cents x (100 - discount_pct)) so per-part sums, revenue-group
    formation, ranking, and the cumulative thresholds (compared in
    integer arithmetic, x100 vs x80/x95 of the total) are bit-identical
    in both engines — no float enters until the final rounded report.
    Ties (parts with identical revenue) share one group and one class by
    construction, so no tiebreak ambiguity exists."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True).select(
        "l_partkey",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("rev_e4"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("rev_e4").alias("rev_e4"))
    grp = per_part.groupBy("rev_e4").agg(
        F.count(F.lit(1)).alias("n_parts"),
        (F.col("rev_e4") * F.count(F.lit(1))).alias("grp_rev"),
    ).localCheckpoint(eager=False)  # 2 consumers — fact shuffle once
    tot = grp.agg(F.sum("grp_rev").alias("total"))
    ranked = partitioned_prefix_sum(
        grp.withColumn("__neg", -F.col("rev_e4")), "__neg", "grp_rev",
        "cum_before",
    ).crossJoin(F.broadcast(tot))
    cum = F.col("cum_before").cast("decimal(38,0)")
    total = F.col("total").cast("decimal(38,0)")
    classed = ranked.select(
        F.when(cum * 100 < total * 80, F.lit("A"))
        .when(cum * 100 < total * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "n_parts",
        "grp_rev",
        "total",
    )
    return classed.groupBy("abc_class").agg(
        F.sum("n_parts").alias("n_parts"),
        F.round(F.sum("grp_rev").cast("double") / 10000, 2).alias("revenue"),
        F.round(
            F.sum("grp_rev").cast("double")
            / F.any_value("total").cast("double"),
            6,
        ).alias("revenue_share"),
    )


@register(
    "ship_lag_percentiles",
    """
    WITH lag AS (
        SELECT o_orderpriority AS priority,
               date_diff('day', CAST(o_orderdate AS DATE),
                         CAST(l_shipdate AS DATE)) AS lag_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), hist AS (
        SELECT priority, lag_days, COUNT(*) AS c
        FROM lag GROUP BY priority, lag_days
    ), cum AS (
        SELECT priority, lag_days, c,
               CAST(SUM(c) OVER (
                   PARTITION BY priority ORDER BY lag_days
               ) AS BIGINT) AS cum_c,
               CAST(SUM(c) OVER (PARTITION BY priority) AS BIGINT) AS n
        FROM hist
    )
    SELECT priority,
           n AS n_items,
           MIN(CASE WHEN cum_c >= (n + 1) // 2 THEN lag_days END) AS p50_lag,
           MIN(CASE WHEN cum_c >= (9 * n + 9) // 10 THEN lag_days END)
               AS p90_lag,
           MIN(CASE WHEN cum_c >= (99 * n + 99) // 100 THEN lag_days END)
               AS p99_lag,
           ROUND(CAST(SUM(CASE WHEN lag_days < 0 THEN c ELSE 0 END) AS DOUBLE)
                 / n, 6) AS negative_lag_share
    FROM cum
    GROUP BY priority, n
    """,
)
def ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA report: exact p50/p90/p99 of the ship lag (days
    between order date and line-item ship date) per order priority, plus
    the share of anomalous negative lags.

    100 TB shape: after the orderkey-co-keyed fact-fact join (the
    engine's standard bucketing co-key — same shape as the Q12/Q21
    analogues), everything reduces to a (priority x distinct-lag-days)
    VALUE-DOMAIN histogram: day lags are bounded integers, so the
    histogram is a few thousand rows per priority REGARDLESS of corpus
    size, the cumulative window runs over those tiny partitions, and the
    exact order statistics fall out of one conditional aggregation — no
    global sort, no two-pass selection, no driver-side walk.  Quantile
    ranks use pure integer arithmetic (ceil(q*n) as (q*n + q') div d),
    so the selected values are bit-identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem", parallel=True).select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lag = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).cast("long").alias("lag_days"),
    )
    hist = lag.groupBy("priority", "lag_days").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("priority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("priority")
        .orderBy("lag_days")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    j = hist.withColumn("cum_c", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(wn)
    )
    return j.groupBy("priority", "n").agg(
        F.min(
            F.when(
                F.col("cum_c") >= F.expr("(n + 1) div 2"), F.col("lag_days")
            )
        ).alias("p50_lag"),
        F.min(
            F.when(
                F.col("cum_c") >= F.expr("(9 * n + 9) div 10"),
                F.col("lag_days"),
            )
        ).alias("p90_lag"),
        F.min(
            F.when(
                F.col("cum_c") >= F.expr("(99 * n + 99) div 100"),
                F.col("lag_days"),
            )
        ).alias("p99_lag"),
        F.round(
            F.sum(F.when(F.col("lag_days") < 0, F.col("c")).otherwise(0))
            .cast("double")
            / F.col("n"),
            6,
        ).alias("negative_lag_share"),
    ).select(
        "priority",
        F.col("n").alias("n_items"),
        "p50_lag",
        "p90_lag",
        "p99_lag",
        "negative_lag_share",
    )


@register(
    "burst_detection",
    """
    WITH ev AS (
        SELECT user_id, event_id, value,
               epoch_ns(ts) // 1000000000 AS sec
        FROM events
    ), win AS (
        SELECT user_id, event_id, sec,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
               ) AS burst_n,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY sec
                   RANGE BETWEEN 600 PRECEDING AND CURRENT ROW
               ), 6) AS burst_value
        FROM ev
    )
    SELECT user_id,
           CAST(MAX(burst_n) AS BIGINT) AS peak_burst,
           CAST(COUNT(*) FILTER (burst_n >= 5) AS BIGINT) AS n_burst_events,
           ROUND(MAX(burst_value), 6) AS peak_burst_value,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM win
    GROUP BY user_id
    HAVING MAX(burst_n) >= 5
    """,
)
def burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-burst detection: for every event, the count and
    value-sum of that user's events in the trailing 10 minutes (a
    time-VALUED ``RANGE`` window frame, not a row frame), rolled up to
    the users whose peak trailing-window count reaches the burst
    threshold — the velocity-rule primitive of fraud/abuse detection.

    100 TB shape: one ``user_id`` exchange serves both RANGE windows and
    the final rollup; the frame's state is bounded by the user's event
    rate x 600 s, independent of corpus size.  The HAVING prunes output
    to the anomalous tail.  RANGE frames treat equal-timestamp peers
    identically in both engines (frame bounds are on the ORDER value,
    not row position), so duplicate timestamps cannot cause divergence;
    the value sum is rounded per the float rules.  ``ts`` goes through
    the schema-adaptive epoch helper.
    """
    events = load_table(spark, sf_dir, "events", parallel=True)
    ev = events.select(
        "user_id",
        "event_id",
        "value",
        _event_epoch_sec(events).alias("sec"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-600, Window.currentRow)
    )
    win = ev.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("burst_n"),
        F.round(F.sum("value").over(w), 6).alias("burst_value"),
    )
    return (
        win.groupBy("user_id")
        .agg(
            F.max("burst_n").alias("peak_burst"),
            F.count_if(F.col("burst_n") >= 5).alias("n_burst_events"),
            F.round(F.max("burst_value"), 6).alias("peak_burst_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .where(F.col("peak_burst") >= 5)
    )


@register(
    "corpus_drift_report",
    r"""
    WITH toks AS (
        SELECT doc_id % 2 AS half,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), ct AS (
        SELECT term,
               COUNT(*) FILTER (half = 0) AS c_a,
               COUNT(*) FILTER (half = 1) AS c_b
        FROM toks GROUP BY term
    ), tots AS (
        SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b, COUNT(*) AS v FROM ct
    ), scored AS (
        SELECT term, c_a, c_b,
               (c_a + 1) * (n_b + v) - (c_b + 1) * (n_a + v) AS xnum,
               (c_a + 1) / CAST(n_a + v AS DOUBLE) AS p_a,
               (c_b + 1) / CAST(n_b + v AS DOUBLE) AS p_b
        FROM ct, tots
    ), contrib AS (
        SELECT term, c_a, c_b, xnum, p_a, p_b,
               CAST(ROUND(p_a * LN(p_a / p_b), 12) AS DECIMAL(20,12))
                   AS kl_ab_term,
               CAST(ROUND(p_b * LN(p_b / p_a), 12) AS DECIMAL(20,12))
                   AS kl_ba_term
        FROM scored
    ), summary AS (
        SELECT ROUND(CAST(SUM(kl_ab_term) AS DOUBLE), 6) AS kl_ab,
               ROUND(CAST(SUM(kl_ba_term) AS DOUBLE), 6) AS kl_ba
        FROM contrib
    ), ranked AS (
        SELECT term, c_a, c_b,
               ROUND(p_a - p_b, 9) AS p_diff,
               ROUND(CAST(kl_ab_term AS DOUBLE), 9) AS kl_contrib,
               ROW_NUMBER() OVER (ORDER BY ABS(xnum) DESC, term) AS rn
        FROM contrib
    )
    SELECT term, c_a, c_b, p_diff, kl_contrib, kl_ab, kl_ba
    FROM ranked, summary
    WHERE rn <= 10
    """,
)
def corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: Laplace-smoothed unigram distributions of
    two corpus halves (deterministic ``doc_id`` parity split, the stand-in
    for two ingestion snapshots), their symmetric KL divergences, and the
    10 most divergent terms — the distribution-shift check a 100 TB
    training pipeline runs between crawl snapshots before mixing them.

    100 TB shape: one tokenize + one pivot-style aggregation produce the
    vocabulary-sized count table; everything after runs at vocabulary
    scale with single-row broadcast totals.  The top-divergence ranking
    orders on the EXACT cross-multiplied integer numerator of
    p_a − p_b (same denominator for every term), so no float enters the
    ordering; the KL sums are per-term contributions rounded to 12 dp
    and summed as DECIMAL(20,12) — exact, association-independent — then
    rounded for report.  The top-10 selection is a TakeOrdered (per-
    partition partial top-k, no global sort), so even a billion-term
    vocabulary never funnels through one task."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    toks = docs.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(tokens(F.lower(F.col("text")))).alias("term"),
    )
    # ct (the vocabulary-sized count table) feeds the totals and the
    # scorer; contrib feeds the KL summary and the top-10 ranking —
    # unstaged, the corpus was tokenized four times.  Two lazy
    # checkpoints at vocabulary scale -> one tokenize pass.
    ct = toks.groupBy("term").agg(
        F.count_if(F.col("half") == 0).alias("c_a"),
        F.count_if(F.col("half") == 1).alias("c_b"),
    ).localCheckpoint(eager=False)
    tots = ct.agg(
        F.sum("c_a").alias("n_a"),
        F.sum("c_b").alias("n_b"),
        F.count(F.lit(1)).alias("v"),
    )
    p_a = (F.col("c_a") + 1) / (F.col("n_a") + F.col("v")).cast("double")
    p_b = (F.col("c_b") + 1) / (F.col("n_b") + F.col("v")).cast("double")
    scored = ct.crossJoin(F.broadcast(tots)).select(
        "term",
        "c_a",
        "c_b",
        (
            (F.col("c_a") + 1) * (F.col("n_b") + F.col("v"))
            - (F.col("c_b") + 1) * (F.col("n_a") + F.col("v"))
        ).alias("xnum"),
        p_a.alias("p_a"),
        p_b.alias("p_b"),
    )
    contrib = scored.select(
        "term",
        "c_a",
        "c_b",
        "xnum",
        "p_a",
        "p_b",
        F.round(F.col("p_a") * F.log(F.col("p_a") / F.col("p_b")), 12)
        .cast("decimal(20,12)")
        .alias("kl_ab_term"),
        F.round(F.col("p_b") * F.log(F.col("p_b") / F.col("p_a")), 12)
        .cast("decimal(20,12)")
        .alias("kl_ba_term"),
    ).localCheckpoint(eager=False)
    summary = contrib.agg(
        F.round(F.sum("kl_ab_term").cast("double"), 6).alias("kl_ab"),
        F.round(F.sum("kl_ba_term").cast("double"), 6).alias("kl_ba"),
    )
    ranked = contrib.orderBy(
        F.abs(F.col("xnum")).desc(), F.asc("term")
    ).limit(10)
    return ranked.crossJoin(F.broadcast(summary)).select(
        "term",
        "c_a",
        "c_b",
        F.round(F.col("p_a") - F.col("p_b"), 9).alias("p_diff"),
        F.round(F.col("kl_ab_term").cast("double"), 9).alias("kl_contrib"),
        "kl_ab",
        "kl_ba",
    )


@register(
    "psi_price_drift",
    """
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS half
        FROM orders
    ), ha AS (
        SELECT cents, COUNT(*) AS c FROM o WHERE half = 0 GROUP BY cents
    ), na AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM ha
    ), cum AS (
        SELECT cents,
               CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) AS cum_c
        FROM ha
    ), edges AS (
        SELECT ["""
    + ", ".join(
        f"MIN(CASE WHEN cum_c >= ({i} * n + 9) // 10 THEN cents END)"
        for i in range(1, 10)
    )
    + """] AS es
        FROM cum, na
    ), b AS (
        SELECT half,
               len(list_filter((SELECT es FROM edges), e -> cents > e))
                   AS bucket
        FROM o
    ), ct AS (
        SELECT bucket,
               COUNT(*) FILTER (half = 0) AS c_a,
               COUNT(*) FILTER (half = 1) AS c_b
        FROM b GROUP BY bucket
    ), tot AS (
        SELECT SUM(c_a) AS n_a, SUM(c_b) AS n_b FROM ct
    ), sc AS (
        SELECT bucket, c_a, c_b,
               (c_a + 1) / CAST(n_a + 10 AS DOUBLE) AS p_a,
               (c_b + 1) / CAST(n_b + 10 AS DOUBLE) AS p_b
        FROM ct, tot
    ), co AS (
        SELECT bucket, c_a, c_b, p_a, p_b,
               CAST(ROUND((p_a - p_b) * LN(p_a / p_b), 12)
                    AS DECIMAL(20,12)) AS term
        FROM sc
    )
    SELECT bucket, c_a, c_b,
           ROUND(p_a - p_b, 9) AS p_diff,
           ROUND(CAST(term AS DOUBLE), 9) AS psi_contrib,
           ROUND(CAST(SUM(term) OVER () AS DOUBLE), 6) AS psi
    FROM co
    """,
)
def psi_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the order-price distributions
    of two deterministic corpus halves (``o_orderkey`` parity — the
    stand-in for a reference vs current scoring window): decile bucket
    edges fitted on half A's EXACT order statistics, per-bucket
    populations of both halves, smoothed PSI — the standard model-input
    drift gate in production ML monitoring.

    100 TB shape: prices reduce to an exact integer-cents value-domain
    histogram (distinct cents bounded by the price domain, not the row
    count); the cumulative walk to the nine decile edges goes through
    the cost-based distributed prefix sum; the nine edges then ride as
    ONE broadcast array row and bucket assignment is a 9-element HOF
    scan per row — no per-row join, no sort of the fact.  Determinism:
    integer cents end-to-end until the final smoothed ratios; PSI sums
    12-dp-rounded DECIMAL contributions (association-independent);
    bucket ids are exact HOF counts of edge crossings.  The PSI total is a
    whole-frame window over the bucket table — bounded at 10 rows by
    construction, so the unpartitioned frame is safe at any scale."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    ha = orders.where(F.col("half") == 0).groupBy("cents").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)  # na + prefix sum: one fact pass
    cum = partitioned_prefix_sum(ha, "cents", "c", "cum_before").withColumn(
        "cum_c", F.col("cum_before") + F.col("c")
    )
    na = ha.agg(F.sum("c").alias("n"))
    edges = (
        cum.crossJoin(F.broadcast(na))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum_c") >= F.expr(f"({i} * n + 9) div 10"),
                        F.col("cents"),
                    )
                ).alias(f"e{i}")
                for i in range(1, 10)
            ]
        )
        .select(F.array(*[f"e{i}" for i in range(1, 10)]).alias("es"))
    )
    b = orders.crossJoin(F.broadcast(edges)).select(
        "half",
        F.size(F.filter("es", lambda e: F.col("cents") > e)).alias("bucket"),
    )
    ct = b.groupBy("bucket").agg(
        F.count_if(F.col("half") == 0).alias("c_a"),
        F.count_if(F.col("half") == 1).alias("c_b"),
    )
    tot = ct.agg(F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b"))
    p_a = (F.col("c_a") + 1) / (F.col("n_a") + 10).cast("double")
    p_b = (F.col("c_b") + 1) / (F.col("n_b") + 10).cast("double")
    co = ct.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "c_a",
        "c_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        F.round(
            (p_a - p_b) * F.log(p_a / p_b), 12
        ).cast("decimal(20,12)").alias("term"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return co.select(
        "bucket",
        "c_a",
        "c_b",
        F.round(F.col("p_a") - F.col("p_b"), 9).alias("p_diff"),
        F.round(F.col("term").cast("double"), 9).alias("psi_contrib"),
        F.round(F.sum("term").over(wall).cast("double"), 6).alias("psi"),
    )


def _hll_rolling_oracle(p: int = 7, cap: int = 55, window_days: int = 7) -> str:
    """DuckDB replay of operators/sketch.hll_rolling_estimate over
    events.user_id by day: identical integer register pipeline, the same
    0..w-1 day expansion, the same harmonic-sum emit constants."""
    from federated_gcn_spark.plans.xxh64_sql import xxhash64_sql

    m = 1 << p
    wbits = 64 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    c_num = alpha * m * m * float(1 << cap)
    u = xxhash64_sql(("user_id", "long"))
    bitlen = " + ".join(f"(w >= {1 << k})::INT" for k in range(wbits))
    return f"""
    WITH h AS (
        SELECT epoch_ns(ts) // 1000000000 // 86400 AS day, ({u}) AS u
        FROM events
    ), b AS (
        SELECT day, (u % {m})::BIGINT AS bucket, (u // {m}) AS w FROM h
    ), daily AS (
        SELECT day, bucket, MAX({wbits + 1} - ({bitlen})) AS mr
        FROM b GROUP BY day, bucket
    ), expanded AS (
        SELECT day + off AS wday, bucket, mr
        FROM daily CROSS JOIN (SELECT UNNEST(range({window_days})) AS off)
    ), merged AS (
        SELECT wday, bucket, MAX(mr) AS mr
        FROM expanded
        WHERE wday IN (SELECT DISTINCT day FROM daily)
        GROUP BY wday, bucket
    ), per AS (
        SELECT wday,
               COUNT(*) AS present,
               SUM(CAST(POWER(2, {cap} - LEAST(mr, {cap})) AS BIGINT))
                   AS filled_sum,
               MAX(mr) AS max_reg
        FROM merged GROUP BY wday
    )
    SELECT wday AS day,
           CAST(present AS BIGINT) AS nonzero_regs,
           CAST(max_reg AS BIGINT) AS max_reg,
           ROUND({c_num!r} / CAST(filled_sum + ({m} - present) * {1 << cap}
                                  AS DOUBLE), 2) AS est_distinct
    FROM per
    """


@register("rolling_distinct_users_hll", _hll_rolling_oracle())
def rolling_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-user estimates from mergeable daily HLL
    register state (operators/sketch.py:hll_rolling_estimate) — sliding
    distinct counts are the textbook case where exact computation cannot
    scale (every window re-scans raw rows) but mergeable sketch state
    makes the rollup calendar-sized.  One corpus-sized aggregation
    builds the daily registers; the window merge is a bounded explode +
    max-merge over calendar x m rows.  Integer-exact end-to-end
    (xxhash64 replay, integer harmonic sum), value-checked against a
    full DuckDB replay."""
    from federated_gcn_spark.operators.sketch import hll_rolling_estimate

    events = load_table(spark, sf_dir, "events", parallel=True)
    ev = events.select(
        "user_id", _event_epoch_sec(events).alias("__sec")
    ).select("user_id", F.expr("__sec div 86400").alias("day"))
    return hll_rolling_estimate(ev, "user_id", "day")


@register(
    "theil_sen_trend",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), pairs AS (
        SELECT (b.rev_c - a.rev_c) / CAST(b.day - a.day AS DOUBLE) AS slope
        FROM daily a JOIN daily b ON a.day < b.day
    ), sel AS (
        SELECT slope
        FROM (
            SELECT slope,
                   ROW_NUMBER() OVER (ORDER BY slope) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM pairs
        ) WHERE rn = (cnt + 1) // 2
    ), resid AS (
        SELECT rev_c - (SELECT slope FROM sel) * day AS res FROM daily
    ), isel AS (
        SELECT res
        FROM (
            SELECT res,
                   ROW_NUMBER() OVER (ORDER BY res) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM resid
        ) WHERE rn = (cnt + 1) // 2
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST((SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS BIGINT)
               AS n_pairs,
           ROUND((SELECT slope FROM sel) / 100, 6) AS slope_per_day,
           ROUND((SELECT res FROM isel) / 100, 2) AS intercept
    """,
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily revenue: the median of all
    pairwise slopes (up to 29% outlier breakdown, vs 0% for OLS) and the
    median-residual intercept — the robust-regression companion to
    ``linear_fit``/``forecast_revenue``.

    100 TB shape: the fact reduces to ONE calendar-sized daily aggregate
    (exact integer cents); the pairwise self-join is calendar x calendar
    — bounded by the date domain, NOT the corpus, so the deliberate
    cartesian cannot grow with data volume.  Both medians go through
    operators/stats.exact_kth_smallest_value (two-pass histogram
    selection — no global sort even over the ~n²/2 pair table).

    Determinism: slopes are IEEE divisions of exact integers (bit-equal
    in any engine); the selected median is an actual data value, so no
    FP accumulation exists anywhere; the intercept residuals reuse the
    selected slope as an exact literal."""
    from federated_gcn_spark.operators.stats import exact_kth_smallest_value

    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=True)
    b = daily.select(
        F.col("day").alias("day2"), F.col("rev_c").alias("rev_c2")
    )
    # try_divide, not /: Catalyst pushes the kth-selection's bucket
    # predicate into the join, where it can evaluate slope on an
    # equal-day pair BEFORE the day < day2 condition excludes it — under
    # ANSI mode a plain / then raises DIVIDE_BY_ZERO.  Matched pairs
    # always have day2 > day, so results are identical.
    pairs = daily.join(b, F.col("day") < F.col("day2")).select(
        F.try_divide(
            F.col("rev_c2") - F.col("rev_c"),
            (F.col("day2") - F.col("day")).cast("double"),
        ).alias("slope")
    )
    n_days = daily.count()
    n_pairs = n_days * (n_days - 1) // 2
    slope = exact_kth_smallest_value(pairs, "slope", (n_pairs + 1) // 2)
    resid = daily.select(
        (F.col("rev_c") - F.lit(slope) * F.col("day")).alias("res")
    )
    intercept = exact_kth_smallest_value(resid, "res", (n_days + 1) // 2)
    return spark.createDataFrame(
        [(n_days, n_pairs, round(slope / 100, 6), round(intercept / 100, 2))],
        "n_days long, n_pairs long, slope_per_day double, intercept double",
    )


def _rrf_oracle() -> str:
    """Reciprocal-rank fusion oracle COMPOSED from the two parent
    retrieval oracles (bm25_search, similarity_topk) as subqueries —
    one source of truth for each ranker's semantics."""
    from federated_gcn_spark.plans.queries import ORACLE

    return f"""
    WITH b AS (
        SELECT doc_id, bm25,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rb
        FROM ({ORACLE["bm25_search"]})
    ), c AS (
        SELECT vec_id AS doc_id, cos_sim,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rc
        FROM ({ORACLE["similarity_topk"]})
    ), fused AS (
        SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
               b.rb AS bm25_rank, c.rc AS cos_rank,
               COALESCE(1.0 / (60 + b.rb), 0)
                   + COALESCE(1.0 / (60 + c.rc), 0) AS rrf
        FROM b FULL OUTER JOIN c ON b.doc_id = c.doc_id
    )
    SELECT doc_id, bm25_rank, cos_rank, ROUND(rrf, 9) AS rrf
    FROM fused
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """


@register("hybrid_search_rrf", _rrf_oracle())
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (k=60): the BM25
    keyword ranking and the dense cosine ranking fused as
    Σ 1/(60+rank) — the standard zero-tuning way production RAG stacks
    combine sparse and dense retrieval.  Composes the engine's two
    retrieval primitives verbatim (plans.queries.bm25_search,
    similarity_topk); the oracle likewise embeds the parents' oracle
    texts as subqueries, so each ranker has one source of truth.

    100 TB shape: the parents do the heavy lifting (postings-filtered
    scoring, broadcast query vector, TakeOrdered top-k); fusion then
    runs on two k-row rank lists — constant-sized work regardless of
    corpus scale.  Ranks order on the parents' ROUNDED scores with id
    tiebreaks (the same values their own hash checks pin), so rank
    assignment cannot diverge; the RRF sum is two fixed-shape IEEE
    divisions of integers."""
    from federated_gcn_spark.plans.queries import bm25_search, similarity_topk

    b = bm25_search(spark, sf_dir).withColumn(
        "rb",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    )
    c = similarity_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id_c"), "cos_sim"
    )
    c = c.withColumn(
        "rc",
        F.row_number().over(
            Window.orderBy(F.desc("cos_sim"), F.asc("doc_id_c"))
        ),
    )
    fused = b.join(
        c, b["doc_id"] == c["doc_id_c"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("doc_id_c")).alias("doc_id"),
        F.col("rb").alias("bm25_rank"),
        F.col("rc").alias("cos_rank"),
        (
            F.coalesce(1.0 / (60 + F.col("rb")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rc")), F.lit(0.0))
        ).alias("rrf_raw"),
    )
    return (
        fused.orderBy(F.desc("rrf_raw"), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            F.round("rrf_raw", 9).alias("rrf"),
        )
    )


@register(
    "audience_venn",
    """
    WITH base AS (
        SELECT c.c_custkey,
               MAX(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                   AS in_building,
               MAX(CASE WHEN c.c_acctbal > 5000 THEN 1 ELSE 0 END) AS in_rich,
               MAX(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS in_urgent
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT in_building, in_rich, in_urgent,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM base
    GROUP BY in_building, in_rich, in_urgent
    """,
)
def audience_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way audience overlap (Venn regions) in ONE pass: membership
    bits for three predicates (BUILDING segment, acctbal > 5000, has an
    urgent order) per customer, then a bitmask rollup — the
    inclusion-exclusion shape behind every audience-overlap dashboard,
    computed without 2^k - 1 separate intersect jobs.

    100 TB shape: one custkey-keyed join + aggregate (the MAX-bit trick
    folds the one-to-many orders side during the partial aggregate, so
    no distinct or second pass), then an 8-row rollup.  All integer."""
    customer = load_table(spark, sf_dir, "customer", parallel=True).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        "o_custkey", "o_orderpriority"
    )
    base = (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left"
        )
        .groupBy("c_custkey")
        .agg(
            F.max(
                F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
            ).alias("in_building"),
            F.max(
                F.when(F.col("c_acctbal") > 5000, 1).otherwise(0)
            ).alias("in_rich"),
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("in_urgent"),
        )
    )
    return base.groupBy("in_building", "in_rich", "in_urgent").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "degree_assortativity",
    """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), ds AS (
        SELECT s, COUNT(*) AS deg_s FROM e GROUP BY s
    ), dp AS (
        SELECT p, COUNT(*) AS deg_p FROM e GROUP BY p
    ), j AS (
        SELECT CAST(deg_s AS DECIMAL(38,0)) AS x,
               CAST(deg_p AS DECIMAL(38,0)) AS y
        FROM e JOIN ds USING (s) JOIN dp USING (p)
    ), m AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy,
               SUM(x * y) AS sxy
        FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_edges,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS assortativity
    FROM m
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier-part bipartite graph: the
    Pearson correlation between the two endpoint degrees across edges —
    the one-number graph-health statistic that distinguishes hub-to-hub
    (assortative) from hub-to-leaf (disassortative) wiring, a
    precondition check for sampling-based GNN training (reference graph
    health surface, models/unsupervised.py neighborhood statistics).

    100 TB shape: distinct edges, two degree aggregations, a re-join of
    degrees onto edges (all equi-joins on graph keys), one moment
    rollup.  Determinism: degrees are exact integers and ALL five
    moment sums accumulate in DECIMAL(38,0) — exact, order-independent —
    so the single double expression at the emit is IEEE-identical; no
    float accumulates anywhere."""
    # the distinct edge list feeds both degree aggregates and the
    # re-join; staged once -> one scan + distinct instead of three
    e = (
        load_table(spark, sf_dir, "lineitem", parallel=True)
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ds = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg_s"))
    dp = e.groupBy("p").agg(F.count(F.lit(1)).alias("deg_p"))
    j = (
        e.join(ds, "s")
        .join(dp, "p")
        .select(
            F.col("deg_s").cast("decimal(38,0)").alias("x"),
            F.col("deg_p").cast("decimal(38,0)").alias("y"),
        )
    )
    m = j.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_edges"),
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("assortativity"),
    )


@register(
    "gini_customer_spend",
    """
    WITH spend AS (
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey
    ), grp AS (
        SELECT cents, COUNT(*) AS c FROM spend GROUP BY cents
    ), cum AS (
        SELECT cents, c,
               CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) - c AS r_before
        FROM grp
    ), m AS (
        SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS n,
               CAST(SUM(CAST(cents AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))
                   AS total,
               SUM(CAST(cents AS DECIMAL(38,0))
                   * (c * CAST(r_before + 1 AS DECIMAL(38,0))
                      + CAST(c AS DECIMAL(38,0)) * (c - 1) / 2))
                   AS weighted_rank_sum
        FROM cum
    )
    SELECT CAST(n AS BIGINT) AS n_customers,
           ROUND(CAST(total AS DOUBLE) / 100, 2) AS total_spend,
           ROUND(CAST(2 * weighted_rank_sum AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
                 - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 6) AS gini
    FROM m
    """,
)
def gini_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer spend — the inequality statistic
    behind every revenue-concentration dashboard (and the natural scalar
    companion to ``abc_revenue_classes``): G = 2·Σ rᵢxᵢ / (n·Σx) −
    (n+1)/n over ascending-sorted spend.

    100 TB shape: the fact reduces to a per-customer aggregate, then to
    DISTINCT spend values; the rank-weighted sum needs no per-row rank —
    within a tie group of size c starting at rank r₀ it closes to
    x·(c·r₀ + c(c−1)/2), so only the distinct-value cumulative (the same
    value-domain prefix shape as the ABC query) is ever computed.
    Determinism: exact integer cents, all moments in DECIMAL(38,0)
    (c(c−1)/2 is always integral), one double expression at the emit."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    grp = spend.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    cum = partitioned_prefix_sum(grp, "cents", "c", "r_before")
    dec = lambda col: F.col(col).cast("decimal(38,0)")
    m = cum.agg(
        F.sum("c").cast("decimal(38,0)").alias("n"),
        F.sum(dec("cents") * F.col("c")).cast("decimal(38,0)").alias("total"),
        F.sum(
            dec("cents")
            * (
                F.col("c") * (F.col("r_before") + 1).cast("decimal(38,0)")
                + dec("c") * (F.col("c") - 1) / 2
            )
        ).alias("weighted_rank_sum"),
    )
    n_d = F.col("n").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.round(F.col("total").cast("double") / 100, 2).alias("total_spend"),
        F.round(
            (2 * F.col("weighted_rank_sum")).cast("double")
            / (n_d * F.col("total").cast("double"))
            - (n_d + 1) / n_d,
            6,
        ).alias("gini"),
    )


_BENFORD_P = [
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514,
]


def _benford_oracle() -> str:
    # CAST each literal: DuckDB types bare decimal literals as DECIMAL,
    # and the squared difference then overflows DECIMAL(38); Spark uses
    # IEEE doubles, so the oracle must too.
    p_case = " ".join(
        f"WHEN {d} THEN CAST({_BENFORD_P[d - 1]!r} AS DOUBLE)"
        for d in range(1, 10)
    )
    return f"""
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders
    ), obs AS (
        SELECT digit, COUNT(*) AS observed FROM digits GROUP BY digit
    ), tot AS (
        SELECT CAST(SUM(observed) AS BIGINT) AS n FROM obs
    ), sc AS (
        SELECT digit, observed, n,
               (CASE digit {p_case} END) * n AS expected
        FROM obs, tot
    ), co AS (
        SELECT digit, observed, expected,
               CAST(ROUND((observed - expected) * (observed - expected)
                          / expected, 9) AS DECIMAL(28,9)) AS term
        FROM sc
    )
    SELECT digit,
           observed,
           ROUND(expected, 2) AS expected,
           ROUND(CAST(term AS DOUBLE), 6) AS chi2_contrib,
           ROUND(CAST(SUM(term) OVER () AS DOUBLE), 6) AS chi2
    FROM co
    """


@register("benford_first_digit", _benford_oracle())
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed vs
    expected digit frequencies and the chi-squared conformance statistic
    — the classic large-ledger anomaly/fraud screen (synthetic uniform
    prices fail it loudly, which is itself the point of the check).

    100 TB shape: one fact aggregate to at most nine digit rows;
    everything after is constant-sized, with the chi-squared total as a
    whole-frame window over <= 9 rows.  Determinism: the leading digit
    comes from exact integer cents via string arithmetic (no log10 /
    pow in the digit path); expected counts use inlined double literals
    identical in both engines; contributions are rounded to 9 dp and
    summed as DECIMAL."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    digits = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("digit")
    )
    # obs feeds both the total and the scored pass; staged once -> one
    # fact aggregate instead of two
    obs = digits.groupBy("digit").agg(
        F.count(F.lit(1)).alias("observed")
    ).localCheckpoint(eager=False)
    tot = obs.agg(F.sum("observed").alias("n"))
    p_expr = F.lit(None).cast("double")
    expected_map = None
    for d in range(1, 10):
        cond = F.when(F.col("digit") == d, F.lit(_BENFORD_P[d - 1]))
        expected_map = cond if expected_map is None else expected_map.when(
            F.col("digit") == d, F.lit(_BENFORD_P[d - 1])
        )
    sc = obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "observed",
        (expected_map * F.col("n")).alias("expected"),
    )
    diff = F.col("observed") - F.col("expected")
    co = sc.select(
        "digit",
        "observed",
        "expected",
        F.round(diff * diff / F.col("expected"), 9)
        .cast("decimal(28,9)")
        .alias("term"),
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return co.select(
        "digit",
        "observed",
        F.round("expected", 2).alias("expected"),
        F.round(F.col("term").cast("double"), 6).alias("chi2_contrib"),
        F.round(F.sum("term").over(wall).cast("double"), 6).alias("chi2"),
    )


_DEDUP_CLUSTER_ROUNDS = 4


def _exact_cluster_oracle() -> str:
    """Unrolled min-label propagation over the exact similarity pairs;
    embeds the set_similarity_pairs oracle verbatim (one source of
    truth), MATERIALIZED per the chained-CTE rule."""
    from federated_gcn_spark.plans.queries import ORACLE

    rounds = []
    prev = "l0"
    for k in range(1, _DEDUP_CLUSTER_ROUNDS + 1):
        rounds.append(
            f"""l{k} AS MATERIALIZED (
        SELECT l.node, LEAST(l.label, MIN(nl.label)) AS label
        FROM {prev} l
        JOIN e ON e.u = l.node
        JOIN {prev} nl ON nl.node = e.v
        GROUP BY l.node, l.label
    )"""
        )
        prev = f"l{k}"
    rounds_sql = ", ".join(rounds)
    return f"""
    WITH p AS MATERIALIZED ({ORACLE["set_similarity_pairs"]}),
    e AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM p
        UNION ALL
        SELECT id_b AS u, id_a AS v FROM p
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT u AS node, u AS label FROM e
    ),
    {rounds_sql}
    SELECT label AS canonical_doc,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM {prev}
    GROUP BY label
    """


@register("exact_dedup_clusters", _exact_cluster_oracle())
def exact_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from the exact set-similarity join: the pair
    list closes into connected components by min-label propagation, and
    each cluster reports its canonical (minimum) doc_id and size — the
    step that turns a pair list into an actionable keep/drop list,
    completing the exact-dedup path the way near_dedup_corpus completes
    the MinHash path.

    100 TB shape (round-3 verdict scale fix): exact clone groups —
    identical n-gram sets, the dominant duplication mode in crawled
    corpora — are CONTRACTED to one weighted representative BEFORE the
    PPJoin (operators/ppjoin.contract_exact_clones), so a group of m
    byte-identical docs costs one node instead of C(m,2) pairs; the
    contraction is closure-exact (clones have Jaccard 1 with each other
    and identical similarity to everyone else), asserted against an
    all-pairs union-find reference in tests AND by the unchanged
    all-pairs oracle.  The component closure then runs only over
    contracted pair members plus isolated multi-clone groups —
    proportional to |distinct duplicated sets|, never |corpus| and
    never quadratic in clone-group size.  Fixed {rounds} unrolled
    rounds with converged-tail fill (propagating a fixpoint is the
    identity); all arithmetic is integer MIN/LEAST.
    """.format(rounds=_DEDUP_CLUSTER_ROUNDS)
    from federated_gcn_spark.functions.text import word_ngrams
    from federated_gcn_spark.operators.ppjoin import (
        contract_exact_clones,
        set_similarity_join,
    )

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    sets = docs.where(F.trim("text") != "").select(
        "doc_id",
        F.array_distinct(word_ngrams(F.lower(F.col("text")), 3)).alias("elems"),
    ).where(F.size("elems") > 0)
    reps = contract_exact_clones(sets, "doc_id", "elems").localCheckpoint(
        eager=False
    )  # consumed by the join, the anti-join, and the size expansion
    # max_pairs=None: reps are already clone-contracted above, so the
    # guard's clone-pair lower bound is identically zero here.
    pairs = set_similarity_join(
        reps.select("doc_id", "elems"), "doc_id", "elems", threshold=0.5,
        max_pairs=None,
    )
    e = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionAll(
        pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
    ).localCheckpoint(eager=False)
    members = e.select(F.col("u").alias("node")).distinct().localCheckpoint(
        eager=False
    )  # consumed by labels0, the self-loop union, and the iso anti-join
    # Self-loops fold the keep-own-label join into the neighbor
    # aggregate: min over N(u) ∪ {u} == least(own, min over N(u)), so
    # each round is ONE join + ONE aggregate instead of join + aggregate
    # + join (the old per-round nb-rejoin) — 1 exchange fewer per round.
    eself = e.unionAll(
        members.select(F.col("node").alias("u"), F.col("node").alias("v"))
    ).localCheckpoint(eager=False)  # joined every round — never rebuilt
    labels = members.select("node", F.col("node").alias("label"))
    for _ in range(_DEDUP_CLUSTER_ROUNDS):
        labels = (
            eself.join(
                labels.withColumnRenamed("node", "v2"),
                eself["v"] == F.col("v2"),
            )
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .select(F.col("u").alias("node"), "label")
            # cut lineage per round: without this the visible plan tree
            # (and the scheduler's work) compounds geometrically — 1398
            # exchanges at 4 rounds, measured
            .localCheckpoint(eager=False)
        )
    # A clone group with >= 2 members whose representative pairs with
    # nobody is still a duplicate cluster (its members pair with each
    # other at Jaccard 1 in the uncontracted graph) — its own component.
    iso = reps.where(F.col("grp_n") >= 2).join(
        members, reps["doc_id"] == members["node"], "left_anti"
    ).select(F.col("doc_id").alias("node"), F.col("doc_id").alias("label"))
    labels = labels.unionByName(iso)
    # Expand contracted nodes back to member counts; the canonical doc of
    # a component is its min label = min representative = min member id.
    sized = labels.join(reps, labels["node"] == reps["doc_id"]).select(
        "label", "grp_n"
    )
    return sized.groupBy(F.col("label").alias("canonical_doc")).agg(
        F.sum("grp_n").cast("long").alias("n_members")
    )


_SQL_TOP_SPENDERS = """
    WITH cust AS (
        SELECT o_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS spend_c,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
    )
    SELECT o_custkey,
           ROUND(CAST(spend_c AS DOUBLE) / 100, 2) AS spend,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM cust
    ORDER BY spend_c DESC, o_custkey
    LIMIT 10
"""


@register("sql_interface_top_spenders", _SQL_TOP_SPENDERS)
def sql_interface_top_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second SQL-front-door proof (after sql_interface_orders): ONE SQL
    text — CTE, exact-integer aggregation, ORDER BY + LIMIT — executed
    verbatim by both engines via catalog.run_sql.  The text itself is
    written scale-safe: ranking is ORDER BY + LIMIT (Spark compiles it
    to TakeOrderedAndProject, per-partition partial top-k), spend
    accumulates in exact integer cents so the ordering cannot drift
    cross-engine; spend casts through DOUBLE explicitly because the two
    engines type a bare `/ 100.0` differently (Spark: DECIMAL division,
    prints trailing zeros; DuckDB: DOUBLE) — caught by the round-5
    sf0.1 off-design gate on a .x0 total."""
    from federated_gcn_spark.catalog import run_sql

    return run_sql(spark, sf_dir, _SQL_TOP_SPENDERS)


_HITS_ROUNDS = 4


def _hits_oracle(rounds: int = _HITS_ROUNDS) -> str:
    """Unrolled HITS oracle (same edge subset as pagerank_top): each
    round is auth = Σ hub over in-edges then hub = Σ auth over
    out-edges, each max-normalized and ROUND(,12)-resynced so per-round
    FP drift cannot compound.  Multi-referenced CTEs MATERIALIZED."""
    parts = [
        """
    WITH e AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS src, l_suppkey + 10000000 AS dst
        FROM lineitem WHERE l_orderkey % 10 = 0
    ),
    h0 AS MATERIALIZED (
        SELECT DISTINCT src AS id, CAST(1.0 AS DOUBLE) AS hub FROM e
    )"""
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f""", a{t}r AS MATERIALIZED (
        SELECT e.dst AS id, SUM(h.hub) AS x
        FROM h{p} h JOIN e ON e.src = h.id GROUP BY e.dst
    ), a{t} AS MATERIALIZED (
        SELECT id, ROUND(x / (SELECT MAX(x) FROM a{t}r), 12) AS auth
        FROM a{t}r
    ), h{t}r AS MATERIALIZED (
        SELECT e.src AS id, SUM(a.auth) AS x
        FROM a{t} a JOIN e ON e.dst = a.id GROUP BY e.src
    ), h{t} AS MATERIALIZED (
        SELECT id, ROUND(x / (SELECT MAX(x) FROM h{t}r), 12) AS hub
        FROM h{t}r
    )"""
        )
    parts.append(
        f"""
    SELECT id, ROUND(auth, 9) AS authority
    FROM a{rounds} ORDER BY auth DESC, id LIMIT 20
    """
    )
    return "".join(parts)


@register("hits_authorities", _hits_oracle())
def hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the order→supplier bipartite graph
    (same edge subset as ``pagerank_top``): {r} mutual-reinforcement
    rounds, top-20 authority suppliers — the second classic link-analysis
    eigenvector method, completing the family (PageRank = single
    stochastic eigenvector; HITS = dual singular vectors).

    100 TB shape: each half-round is one equi-join + aggregate on graph
    keys (partial-final, hub-safe); normalization is a single-row MAX
    broadcast, not a sort.  Determinism: max-normalize (MAX is exactly
    order-independent, unlike an L2 norm) and ROUND(,12) at every
    half-round so FP drift cannot compound across rounds; top-20 is
    TakeOrdered with id tiebreak.
    """.format(r=_HITS_ROUNDS)
    e = (
        load_table(spark, sf_dir, "lineitem", parallel=True)
        .where(F.col("l_orderkey") % 10 == 0)
        .select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_suppkey") + 10000000).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = e.select("src").distinct().select(
        F.col("src").alias("id"), F.lit(1.0).alias("hub")
    )
    auth = None
    for _ in range(_HITS_ROUNDS):
        ar = (
            e.join(hub, e["src"] == hub["id"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("x"))
        )
        amax = ar.agg(F.max("x").alias("mx"))
        auth = ar.crossJoin(F.broadcast(amax)).select(
            F.col("dst").alias("id"),
            F.round(F.col("x") / F.col("mx"), 12).alias("auth"),
        )
        hr = (
            e.join(auth, e["dst"] == auth["id"])
            .groupBy("src")
            .agg(F.sum("auth").alias("x"))
        )
        hmax = hr.agg(F.max("x").alias("mx"))
        hub = hr.crossJoin(F.broadcast(hmax)).select(
            F.col("src").alias("id"),
            F.round(F.col("x") / F.col("mx"), 12).alias("hub"),
        )
        # the per-half-round checkpoints are LOAD-BEARING here: the
        # crossJoin-with-max normalization references its input twice,
        # so an uncut recursion doubles the plan tree every half-round
        # (measured: 508 joins / 762 broadcast exchanges in the 4-round
        # uncut plan) — exponential optimizer work even though exchange
        # reuse would dedupe the execution
        auth = auth.localCheckpoint(eager=True)
        hub = hub.localCheckpoint(eager=True)
    return (
        auth.orderBy(F.desc("auth"), F.asc("id"))
        .limit(20)
        .select("id", F.round("auth", 9).alias("authority"))
    )


def _corpus_health_oracle() -> str:
    from federated_gcn_spark.functions.text import STOPWORDS
    from federated_gcn_spark.plans.queries import _in_list

    return rf"""
    WITH t AS (
        SELECT source, lang, text, n_chars,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE LEN(string_split_regex(TRIM(text), '\s+')) END AS n,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE LEN(list_filter(
                        string_split_regex(LOWER(TRIM(text)), '\s+'),
                        x -> x IN ({_in_list(STOPWORDS)}))) END AS sw,
               CASE WHEN LENGTH(text) > 0
                    THEN CAST(LENGTH(text) - LENGTH(translate(text, '.,!?;:', ''))
                              AS DOUBLE) / LENGTH(text)
                    ELSE 0.0 END AS punct
        FROM documents
    ), q AS (
        SELECT source, lang, text, n_chars, n,
               ROUND(0.4 * LEAST(1.0, CAST(n AS DOUBLE) / 64.0)
                     + 0.3 * (1.0 - punct)
                     + 0.3 * LEAST(1.0, 4.0 * (CASE WHEN n > 0
                           THEN CAST(sw AS DOUBLE) / n ELSE 0.0 END)), 6)
                   AS quality
        FROM t
    ), dupc AS (
        SELECT text, COUNT(*) AS c FROM t GROUP BY text
    )
    SELECT source, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) FILTER (c > 1) AS BIGINT) AS dup_docs,
           ROUND(CAST(COUNT(*) FILTER (c > 1) AS DOUBLE) / COUNT(*), 6)
               AS dup_rate,
           ROUND(CAST(SUM(CAST(quality AS DECIMAL(12,6))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_quality,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars
    FROM q JOIN dupc USING (text)
    GROUP BY source, lang
    """


@register("corpus_health_report", _corpus_health_oracle())
def corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard in one pass: per (source, lang) cell —
    document and token counts, exact-duplicate share (corpus-wide text
    equality), mean quality score, mean length.  This is the composition
    report a 100 TB ingestion run produces per snapshot before deciding
    mixing weights, reusing the catalog's quality heuristic and dedup
    shape verbatim.

    100 TB shape: one aggregate for corpus-wide duplicate counts (keyed
    on text — map-side combine collapses repeats before the shuffle),
    one text-keyed join back, one cell rollup; everything codegen, no
    UDF.  Per-doc quality is rounded to 6 dp BEFORE averaging (both
    engines), so cell means sit far from rounding boundaries."""
    from federated_gcn_spark.functions.text import quality_score, token_count

    # the 4-column projection feeds the quality pass and the duplicate
    # tally; staged once -> one scan instead of two
    docs = (
        load_table(spark, sf_dir, "documents", parallel=True)
        .select("source", "lang", "text", "n_chars")
        .localCheckpoint(eager=False)
    )
    q = docs.select(
        "source",
        "lang",
        "text",
        "n_chars",
        token_count("text").alias("n"),
        F.round(quality_score("text"), 6).alias("quality"),
    )
    dupc = docs.groupBy("text").agg(F.count(F.lit(1)).alias("c"))
    j = q.join(dupc, "text")
    return j.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        F.count_if(F.col("c") > 1).alias("dup_docs"),
        F.round(
            F.count_if(F.col("c") > 1) / F.count(F.lit(1)).cast("double"), 6
        ).alias("dup_rate"),
        # decimal-exact sums, ONE identical IEEE division, then round:
        # AVG of doubles differs in the last ulp across engines and can
        # round differently at a 6-dp boundary (observed at sf0.001)
        F.round(
            F.sum(F.col("quality").cast("decimal(12,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_quality"),
        F.round(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)), 2
        ).alias("avg_chars"),
    )


_ADA_ROUNDS = 3
_ADA_GRID = (
    [(1, t) for t in (16, 32, 48, 64, 80)]
    + [(2, t) for t in (100, 200, 300, 400, 500)]
    + [(3, t) for t in (1, 2, 4, 6, 8)]
)


def _ada_feats_sql() -> str:
    from federated_gcn_spark.functions.text import STOPWORDS
    from federated_gcn_spark.plans.queries import _in_list

    return rf"""
    feats AS MATERIALIZED (
        SELECT doc_id AS rid,
               CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
               LEN(string_split_regex(TRIM(text), '\s+')) AS f1,
               n_chars AS f2,
               LEN(list_filter(
                   string_split_regex(LOWER(TRIM(text)), '\s+'),
                   x -> x IN ({_in_list(STOPWORDS)}))) AS f3
        FROM documents WHERE TRIM(text) <> ''
    ),
    cands AS MATERIALIZED (
        SELECT * FROM (VALUES {", ".join(
            f"({fid}, {thr}, {pol})"
            for fid, thr in _ADA_GRID for pol in (1, -1)
        )}) AS c(fid, thr, pol)
    )"""


def _ada_round_sql(r: int) -> str:
    p = r - 1
    return f""", err{r} AS MATERIALIZED (
        SELECT c.fid, c.thr, c.pol,
               SUM(CASE WHEN (CASE WHEN (CASE c.fid WHEN 1 THEN f.f1
                                         WHEN 2 THEN f.f2
                                         ELSE f.f3 END) <= c.thr
                              THEN c.pol ELSE -c.pol END) <> f.y
                        THEN w.w ELSE CAST(0 AS DECIMAL(24,12)) END) AS err
        FROM feats f JOIN w{p} w ON w.rid = f.rid CROSS JOIN cands c
        GROUP BY c.fid, c.thr, c.pol
    ), best{r} AS MATERIALIZED (
        SELECT fid, thr, pol, err FROM err{r}
        ORDER BY err, fid, thr, pol LIMIT 1
    ), a{r} AS MATERIALIZED (
        SELECT fid, thr, pol,
               CAST(err AS DOUBLE)
                   / (SELECT CAST(SUM(w) AS DOUBLE) FROM w{p}) AS e
        FROM best{r}
    ), al{r} AS MATERIALIZED (
        SELECT fid, thr, pol, e,
               ROUND(0.5 * LN((1 - e) / e), 9) AS alpha,
               ROUND(EXP(ROUND(0.5 * LN((1 - e) / e), 9)), 9) AS fw,
               ROUND(EXP(-ROUND(0.5 * LN((1 - e) / e), 9)), 9) AS fc
        FROM a{r}
    ), w{r} AS MATERIALIZED (
        SELECT f.rid,
               CAST(ROUND(CAST(w.w AS DOUBLE)
                   * (CASE WHEN (CASE WHEN (CASE (SELECT fid FROM al{r})
                                             WHEN 1 THEN f.f1
                                             WHEN 2 THEN f.f2
                                             ELSE f.f3 END)
                                      <= (SELECT thr FROM al{r})
                                 THEN (SELECT pol FROM al{r})
                                 ELSE -(SELECT pol FROM al{r}) END) <> f.y
                           THEN (SELECT fw FROM al{r})
                           ELSE (SELECT fc FROM al{r}) END), 12)
                    AS DECIMAL(24,12)) AS w
        FROM feats f JOIN w{p} w ON w.rid = f.rid
    )"""


def _ada_oracle() -> str:
    parts = ["WITH " + _ada_feats_sql().strip().lstrip(",")]
    parts.append(
        """, w0 AS MATERIALIZED (
        SELECT rid, CAST(1 AS DECIMAL(24,12)) AS w FROM feats
    )"""
    )
    for r in range(1, _ADA_ROUNDS + 1):
        parts.append(_ada_round_sql(r))
    sel = " UNION ALL ".join(
        f"SELECT {r} AS round, fid, thr, pol, ROUND(e, 6) AS err_rate, "
        f"alpha FROM al{r}"
        for r in range(1, _ADA_ROUNDS + 1)
    )
    parts.append(f" {sel}")
    return "".join(parts)


@register("adaboost_stumps", _ada_oracle())
def adaboost_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AdaBoost with decision stumps, trained fully relationally: each
    round scores EVERY candidate stump (feature, threshold, polarity)
    with one aggregation, picks the exact-decimal-weighted-error argmin,
    and reweights — boosted-ensemble training as a declarative dataflow
    with no model object and no per-row Python.

    100 TB shape: the candidate grid is a constant (~34x2 rows riding as
    a broadcast), so each round is ONE corpus scan with map-side partial
    aggregation keyed by the grid — the crossJoin multiplies partial-agg
    states, not shuffled rows.  Weights live as a column on the feature
    table, checkpointed per round.

    Determinism: sample weights are DECIMAL(24,12) end-to-end (exact
    sums → exact argmin with lexicographic tiebreak); alpha and the
    reweight factors are computed from ONE identical double division,
    LN/EXP'd on the same libm, ROUND(,9)-resynced, and every weight
    update is the identical double expression ROUND(,12)-resynced — the
    same per-round drift-kill as the HITS iteration."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from federated_gcn_spark.functions.text import STOPWORDS, tokens

    def rh(x: float, nd: int) -> float:
        return float(
            Decimal(repr(x)).quantize(
                Decimal(1).scaleb(-nd), rounding=ROUND_HALF_UP
            )
        )

    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    toks = tokens(F.col("text"))
    sw_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    feats = docs.select(
        F.col("doc_id").alias("rid"),
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
        F.size(toks).alias("f1"),
        F.col("n_chars").alias("f2"),
        F.size(
            F.expr(
                f"filter(transform(split(trim(text), '\\\\s+'), x -> lower(x)),"
                f" x -> x IN ({sw_list}))"
            )
        ).alias("f3"),
        F.lit(1).cast("decimal(24,12)").alias("w"),
    ).localCheckpoint(eager=True)

    cands = spark.createDataFrame(
        [(fid, thr, pol) for fid, thr in _ADA_GRID for pol in (1, -1)],
        "fid int, thr int, pol int",
    )

    def xcol(fid_col):
        return (
            F.when(fid_col == 1, F.col("f1"))
            .when(fid_col == 2, F.col("f2"))
            .otherwise(F.col("f3"))
        )

    trace = []
    for r in range(1, _ADA_ROUNDS + 1):
        j = feats.crossJoin(F.broadcast(cands))
        pred = F.when(xcol(F.col("fid")) <= F.col("thr"), F.col("pol")).otherwise(
            -F.col("pol")
        )
        errs = (
            j.groupBy("fid", "thr", "pol")
            .agg(
                F.sum(
                    F.when(pred != F.col("y"), F.col("w")).otherwise(
                        F.lit(0).cast("decimal(24,12)")
                    )
                ).alias("err"),
                # every candidate group contains every row of feats, so
                # the group's weight sum IS the total weight — folding
                # it here saves a second full feats scan + collect per
                # round (exact DECIMAL sum, order-independent)
                F.sum("w").alias("tw"),
            )
        )
        best = errs.orderBy("err", "fid", "thr", "pol").limit(1).collect()[0]
        e = float(best["err"]) / float(best["tw"])
        alpha = rh(0.5 * math.log((1 - e) / e), 9)
        fw = rh(math.exp(alpha), 9)
        fc = rh(math.exp(-alpha), 9)
        mis = (
            F.when(
                xcol(F.lit(best["fid"])) <= best["thr"], F.lit(best["pol"])
            ).otherwise(F.lit(-best["pol"]))
            != F.col("y")
        )
        feats = feats.withColumn(
            "w",
            F.round(
                F.col("w").cast("double")
                * F.when(mis, F.lit(fw)).otherwise(F.lit(fc)),
                12,
            ).cast("decimal(24,12)"),
        ).localCheckpoint(eager=True)
        trace.append(
            (r, best["fid"], best["thr"], best["pol"], rh(e, 6), alpha)
        )
    return spark.createDataFrame(
        trace,
        "round int, fid int, thr int, pol int, err_rate double, alpha double",
    )


@register(
    "moving_median_revenue",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), win AS (
        SELECT d.day, w.rev_c AS member_rev
        FROM daily d JOIN daily w
          ON w.day BETWEEN d.day - 6 AND d.day
    ), med AS (
        SELECT day,
               COUNT(*) AS n_days_in_window,
               (list_sort(array_agg(member_rev)))
                   [CAST((COUNT(*) + 1) // 2 AS INT)] AS med_c
        FROM win GROUP BY day
    )
    SELECT day,
           CAST(n_days_in_window AS BIGINT) AS n_days_in_window,
           ROUND(CAST(med_c AS DOUBLE) / 100, 2) AS median_revenue
    FROM med
    """,
)
def moving_median_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day MOVING MEDIAN of daily revenue — the robust
    smoother dashboards use where a moving average is outlier-dragged.
    Moving medians have no distributive aggregate; this computes them
    exactly by joining each day to its bounded trailing window (≤ 7
    members by construction) and selecting the order statistic from the
    sorted member array — the window size, not the corpus, bounds every
    per-day array.

    100 TB shape: the fact reduces to the calendar-sized daily aggregate
    first; the window join and per-day arrays are calendar x 7.
    Determinism: exact integer cents end-to-end; the median is an actual
    data value (lower-middle order statistic)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    w = daily.select(
        F.col("day").alias("wday"), F.col("rev_c").alias("member_rev")
    )
    win = daily.join(
        w,
        (F.col("wday") >= F.col("day") - 6) & (F.col("wday") <= F.col("day")),
    )
    med = win.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_days_in_window"),
        F.element_at(
            F.array_sort(F.collect_list("member_rev")),
            ((F.count(F.lit(1)) + 1) / 2).cast("int"),
        ).alias("med_c"),
    )
    return med.select(
        "day",
        "n_days_in_window",
        F.round(F.col("med_c").cast("double") / 100, 2).alias("median_revenue"),
    )


@register(
    "mann_kendall_trend",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), pairs AS (
        SELECT CASE WHEN b.rev_c > a.rev_c THEN 1
                    WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END AS sgn
        FROM daily a JOIN daily b ON a.day < b.day
    ), s AS (
        SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n
        FROM pairs
    ), ties AS (
        SELECT COALESCE(CAST(SUM(c * (c - 1) * (2 * c + 5)) AS BIGINT), 0)
                   AS tie_term
        FROM (SELECT COUNT(*) AS c FROM daily GROUP BY rev_c HAVING COUNT(*) > 1)
    )
    SELECT s_stat, n,
           (n * (n - 1) * (2 * n + 5) - tie_term) AS var18,
           ROUND((CASE WHEN s_stat > 0 THEN s_stat - 1
                       WHEN s_stat < 0 THEN s_stat + 1
                       ELSE 0 END)
                 / SQRT(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                        / 18), 6) AS z_score
    FROM s, ties
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on daily revenue: S = Σ
    sign(xⱼ−xᵢ) over ordered day pairs, tie-corrected variance, and the
    continuity-corrected z-score — the standard nonparametric companion
    to the Theil-Sen slope (same pair table, pure rank statistic, no
    distribution assumption).

    100 TB shape: calendar-bounded pair table after one fact aggregate
    (see theil_sen_trend).  Determinism: S and the variance numerator
    are exact integer sums; the single z-score division/sqrt is one
    identical IEEE expression."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=True)
    b = daily.select(
        F.col("day").alias("day2"), F.col("rev_c").alias("rev_c2")
    )
    sgn = (
        F.when(F.col("rev_c2") > F.col("rev_c"), 1)
        .when(F.col("rev_c2") < F.col("rev_c"), -1)
        .otherwise(0)
    )
    pairs = daily.join(b, F.col("day") < F.col("day2")).select(sgn.alias("sgn"))
    s = pairs.agg(F.sum("sgn").alias("s_stat"))
    n_row = daily.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("rev_c")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("c") * (F.col("c") - 1) * (2 * F.col("c") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(n_row)).crossJoin(F.broadcast(ties))
    n = F.col("n")
    var18 = n * (n - 1) * (2 * n + 5) - F.col("tie_term")
    s_adj = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return j.select(
        "s_stat",
        "n",
        var18.alias("var18"),
        F.round(s_adj / F.sqrt(var18.cast("double") / 18), 6).alias("z_score"),
    )


@register(
    "revenue_autocorrelation",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), lagged AS (
        SELECT k.lag, a.rev_c AS x, b.rev_c AS y
        FROM (SELECT UNNEST(range(1, 8)) AS lag) k
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
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS acf
    FROM m
    """,
)
def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at lags 1-7 — the first
    diagnostic of any forecasting pipeline (is there weekly structure?).

    100 TB shape: the fact reduces to the calendar-sized daily aggregate
    once; the 7 lags come from one equi-join per lag against the shifted
    calendar (day = day + lag — an equi-join, not a window, so it
    partitions).  Determinism: the assortativity pattern — all five
    moment sums accumulate in DECIMAL(38,0) from exact integer cents,
    one IEEE Pearson emit per lag."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=True)
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    b = daily.select(
        F.col("day").alias("day2"), F.col("rev_c").alias("y")
    )
    lagged = (
        daily.crossJoin(F.broadcast(lags))
        .join(b, F.col("day2") == F.col("day") + F.col("lag"))
        .select("lag", F.col("rev_c").alias("x"), "y")
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    m = lagged.groupBy("lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("acf"),
    )


@register(
    "cusum_changepoint",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), pre AS (
        SELECT day, rev_c,
               CAST(SUM(rev_c) OVER (ORDER BY day) AS DECIMAL(38,0)) AS prefix,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS DECIMAL(38,0)) AS i,
               (SELECT CAST(SUM(rev_c) AS DECIMAL(38,0)) FROM daily) AS total,
               (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) FROM daily) AS n
        FROM daily
    ), stat AS (
        SELECT day, n * prefix - i * total AS cusum_scaled, n, total
        FROM pre
    ), best AS (
        SELECT day, cusum_scaled, n, total
        FROM stat
        ORDER BY ABS(cusum_scaled) DESC, day
        LIMIT 1
    )
    SELECT day AS changepoint_day,
           ROUND(CAST(cusum_scaled AS DOUBLE)
                 / (CAST(n AS DOUBLE) * 100), 2) AS max_cusum,
           CASE WHEN cusum_scaled > 0 THEN 'above_mean_run'
                ELSE 'below_mean_run' END AS direction,
           CAST(n AS BIGINT) AS n_days
    FROM best
    """,
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on daily revenue: the day where the
    cumulative deviation from the global mean peaks — the classic
    level-shift locator for monitoring pipelines.

    Exactness trick: the cusum at position i is prefix_i − i·mean =
    (n·prefix_i − i·total)/n, so scaling by n keeps the WHOLE statistic
    in exact DECIMAL integers — the argmax over days (with day tiebreak)
    involves no float at all; floats appear only in the final reported
    magnitude.  100 TB shape: one fact aggregate to calendar size, one
    distributed prefix sum shape (here the calendar fits the counted
    single-task branch), TakeOrdered argmax."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    cum = partitioned_prefix_sum(daily, "day", "rev_c", "prefix_before")
    pre = cum.withColumn(
        "prefix", (F.col("prefix_before") + F.col("rev_c")).cast("decimal(38,0)")
    )
    tot = daily.agg(
        F.sum("rev_c").cast("decimal(38,0)").alias("total"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    w = Window.orderBy("day")
    pre = pre.withColumn("i", F.row_number().over(w).cast("decimal(38,0)"))
    stat = pre.crossJoin(F.broadcast(tot)).select(
        "day",
        (F.col("n") * F.col("prefix") - F.col("i") * F.col("total")).alias(
            "cusum_scaled"
        ),
        "n",
        "total",
    )
    best = stat.orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.asc("day")
    ).limit(1)
    return best.select(
        F.col("day").alias("changepoint_day"),
        F.round(
            F.col("cusum_scaled").cast("double")
            / (F.col("n").cast("double") * 100),
            2,
        ).alias("max_cusum"),
        F.when(F.col("cusum_scaled") > 0, F.lit("above_mean_run"))
        .otherwise(F.lit("below_mean_run"))
        .alias("direction"),
        F.col("n").cast("bigint").alias("n_days"),
    )


@register(
    "weekday_seasonal_profile",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(rev_c) AS DECIMAL(38,0)) AS total,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM daily
    ), wd AS (
        SELECT day % 7 AS weekday,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(rev_c) AS DECIMAL(38,0)) AS s
        FROM daily GROUP BY day % 7
    )
    SELECT CAST(weekday AS BIGINT) AS weekday,
           n_days,
           ROUND(CAST(s AS DOUBLE) / n_days / 100, 2) AS avg_revenue,
           ROUND((CAST(s AS DOUBLE) / n_days)
                 / (CAST(total AS DOUBLE) / n_total), 6) AS seasonal_index
    FROM wd, tot
    """,
)
def weekday_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal decomposition of daily revenue: per-weekday mean
    and its ratio to the overall mean (the multiplicative seasonal
    index) — the first factor every seasonality-aware forecast strips
    out.  Weekday = epoch-day mod 7 (a pure integer key, timezone-free).

    Determinism: the decimal-sum-then-one-division rule — both means
    come from DECIMAL(38,0) sums of exact cents divided once, and the
    index is a ratio of two identical doubles."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    tot = daily.agg(
        F.sum("rev_c").cast("decimal(38,0)").alias("total"),
        F.count(F.lit(1)).alias("n_total"),
    )
    wd = daily.groupBy((F.col("day") % 7).alias("weekday")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("rev_c").cast("decimal(38,0)").alias("s"),
    )
    mean_wd = F.col("s").cast("double") / F.col("n_days")
    mean_all = F.col("total").cast("double") / F.col("n_total")
    return wd.crossJoin(F.broadcast(tot)).select(
        F.col("weekday").cast("bigint").alias("weekday"),
        "n_days",
        F.round(mean_wd / 100, 2).alias("avg_revenue"),
        F.round(mean_wd / mean_all, 6).alias("seasonal_index"),
    )


@register(
    "ewma_smoothed_revenue",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), win AS (
        SELECT d.day, w.day AS wday, w.rev_c
        FROM daily d JOIN daily w
          ON w.day BETWEEN d.day - 19 AND d.day
    ), terms AS (
        SELECT day,
               CAST(ROUND(rev_c * POWER(CAST(0.7 AS DOUBLE), day - wday), 6)
                    AS DECIMAL(28,6)) AS num_term,
               CAST(ROUND(POWER(CAST(0.7 AS DOUBLE), day - wday), 6)
                    AS DECIMAL(28,6)) AS den_term
        FROM win
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(SUM(num_term) AS DOUBLE)
                 / CAST(SUM(den_term) AS DOUBLE) / 100, 2) AS ewma_revenue
    FROM terms GROUP BY day
    """,
)
def ewma_smoothed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of daily revenue
    (decay 0.7/day, normalized weights, 20-day effective window — decay
    below 1e-3 beyond it): the smoothing primitive behind anomaly
    baselines and short-range forecasts.

    The recursion s_t = αx_t + (1−α)s_{t-1} is inherently sequential;
    re-expressed as the normalized decayed sum over a bounded trailing
    window it becomes ONE calendar-bounded join + aggregate — same
    shape as the moving median, fully parallel.  Determinism: each
    decayed term (libm pow of identical doubles) is rounded to 6 dp and
    summed as DECIMAL(28,6) — exact, order-independent — then one
    division emits."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=False)
    w = daily.select(
        F.col("day").alias("wday"), F.col("rev_c").alias("member_rev")
    )
    win = daily.join(
        w,
        (F.col("wday") >= F.col("day") - 19) & (F.col("wday") <= F.col("day")),
    )
    decay = F.pow(F.lit(0.7), F.col("day") - F.col("wday"))
    terms = win.select(
        "day",
        F.round(F.col("member_rev") * decay, 6)
        .cast("decimal(28,6)")
        .alias("num_term"),
        F.round(decay, 6).cast("decimal(28,6)").alias("den_term"),
    )
    return terms.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(
            F.sum("num_term").cast("double")
            / F.sum("den_term").cast("double")
            / 100,
            2,
        ).alias("ewma_revenue"),
    )


@register(
    "zipf_exponent_fit",
    """
    WITH tf AS (
        SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), c AS (
        SELECT term, COUNT(*) AS freq FROM tf GROUP BY term
    ), ranked AS (
        SELECT ROW_NUMBER() OVER (ORDER BY freq DESC, term) AS rank, freq
        FROM c
    ), pts AS (
        SELECT CAST(ROUND(LN(CAST(rank AS DOUBLE)), 9) AS DECIMAL(20,9)) AS x,
               CAST(ROUND(LN(CAST(freq AS DOUBLE)), 9) AS DECIMAL(20,9)) AS y
        FROM ranked
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts
    )
    SELECT n AS vocab_size,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS zipf_slope,
           ROUND((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / n, 6) AS log_intercept
    FROM m
    """,
)
def zipf_exponent_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law exponent: OLS slope of ln(frequency) on ln(rank) over
    the full rank-frequency table — the one-number lexical-distribution
    fingerprint (natural corpora ≈ −1; the synthetic corpus's flat
    vocabulary reads near 0, which is itself the diagnostic).  Completes
    ``zipf_top_terms`` (which lists the head) with the fitted law.

    100 TB shape: one tokenize + one vocabulary aggregate; the ranking
    is vocabulary-sized.  Determinism: per-point ln values are rounded
    to 9 dp and all regression moments accumulate as DECIMAL — the two
    final OLS expressions are identical-double arithmetic."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    tf = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    c = tf.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = c.withColumn("rank", F.row_number().over(w))
    pts = ranked.select(
        F.round(F.log(F.col("rank").cast("double")), 9)
        .cast("decimal(20,9)")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")), 9)
        .cast("decimal(20,9)")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        n.alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("log_intercept"),
    )


@register(
    "vocab_growth_heaps",
    """
    WITH toks AS (
        SELECT doc_id,
               UNNEST(string_split_regex(LOWER(TRIM(text)), '\\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), per_doc AS (
        SELECT doc_id, COUNT(*) AS n_toks FROM toks GROUP BY doc_id
    ), firsts AS (
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_new
        FROM (SELECT term, MIN(doc_id) AS doc_id FROM toks GROUP BY term)
        GROUP BY doc_id
    ), curve AS (
        SELECT p.doc_id,
               CAST(SUM(p.n_toks) OVER (ORDER BY p.doc_id) AS BIGINT)
                   AS cum_tokens,
               CAST(SUM(COALESCE(f.n_new, 0)) OVER (ORDER BY p.doc_id)
                    AS BIGINT) AS cum_vocab
        FROM per_doc p LEFT JOIN firsts f ON f.doc_id = p.doc_id
    ), pts AS (
        SELECT CAST(ROUND(LN(CAST(cum_tokens AS DOUBLE)), 9)
                    AS DECIMAL(20,9)) AS x,
               CAST(ROUND(LN(CAST(cum_vocab AS DOUBLE)), 9)
                    AS DECIMAL(20,9)) AS y
        FROM curve WHERE cum_vocab > 0
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pts
    )
    SELECT n AS n_points,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS heaps_beta,
           ROUND((CAST(sy AS DOUBLE)
                  - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                    * CAST(sx AS DOUBLE)) / n, 6) AS heaps_log_k
    FROM m
    """,
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit: how vocabulary grows with corpus size (V ≈ K·nᵝ,
    natural text β ≈ 0.4-0.6) — the scaling law that predicts tokenizer
    vocabulary pressure as a 100 TB corpus grows.  The growth curve
    orders documents by doc_id; each term contributes its FIRST
    occurrence (MIN(doc_id) per term — one vocabulary aggregate, no
    sequential scan), new-term counts cumulate with the token counts,
    and the log-log OLS uses the decimal-moment pattern.

    100 TB shape: two corpus aggregates (per-doc token counts, per-term
    first doc) then calendar/vocabulary-sized work; cumulative windows
    run over the document-count axis (bounded by |docs|, and swappable
    for the distributed prefix sum if documents ever rival row counts)."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    # toks feeds the per-doc counts and the first-occurrence aggregate;
    # staged once -> one tokenize pass instead of two
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    ).localCheckpoint(eager=False)
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    firsts = (
        toks.groupBy("term")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = (
        per_doc.join(firsts, "doc_id", "left")
        .withColumn("cum_tokens", F.sum("n_toks").over(w))
        .withColumn(
            "cum_vocab", F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w)
        )
        .where(F.col("cum_vocab") > 0)
    )
    pts = curve.select(
        F.round(F.log(F.col("cum_tokens").cast("double")), 9)
        .cast("decimal(20,9)")
        .alias("x"),
        F.round(F.log(F.col("cum_vocab").cast("double")), 9)
        .cast("decimal(20,9)")
        .alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        n.alias("n_points"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((sy - slope * sx) / n, 6).alias("heaps_log_k"),
    )


@register(
    "kaplan_meier_churn",
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
               CASE WHEN n_risk - n_events > 0
                    THEN CAST(ROUND(LN(CAST(n_risk - n_events AS DOUBLE)
                                       / n_risk), 12) AS DECIMAL(24,12))
                    ELSE CAST(0 AS DECIMAL(24,12)) END AS lnf,
               CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END AS dead
        FROM risk WHERE n_events > 0
    ), surv AS (
        SELECT duration, n_risk, n_events,
               CAST(SUM(lnf) OVER (ORDER BY duration) AS DOUBLE) AS cum_ln,
               MAX(dead) OVER (ORDER BY duration) AS cum_dead
        FROM steps
    )
    SELECT duration, n_risk, n_events,
           CASE WHEN cum_dead = 1 THEN 0.0
                ELSE ROUND(EXP(cum_ln), 6) END AS survival
    FROM surv
    """,
)
def kaplan_meier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier churn-survival curve: users observed from first to
    last event day, an event = churn (last activity strictly before the
    observation horizon), horizon-active users right-censored —
    the estimator behind every retention curve that must handle
    censoring honestly (naive retention over-counts users the window
    simply hasn't observed long enough).

    100 TB shape: ONE user-keyed aggregate reduces the corpus; the KM
    table lives at distinct-duration granularity (value-domain bounded —
    durations are day counts), so the risk-set windows and the
    cumulative product run over tens of rows.  Determinism: risk sets
    and event counts are exact integers; each step's hazard factor is an
    identical-double division, its log is rounded to 12 dp, and the
    survival product is the EXP of an exact decimal log-sum — the
    moving-product analog of the decimal-sum rule."""
    events = load_table(spark, sf_dir, "events", parallel=True)
    ev = events.select(
        "user_id", _event_epoch_sec(events).alias("__sec")
    ).select("user_id", F.expr("__sec div 86400").alias("day"))
    span = ev.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    ).localCheckpoint(eager=False)  # mx + obs: one events pass
    mx = span.agg(F.max("last_day").alias("max_day"))
    obs = span.crossJoin(F.broadcast(mx)).select(
        (F.col("last_day") - F.col("first_day")).alias("duration"),
        # churn horizon = the observation boundary itself: the synthetic
        # events table is near-daily-active over a 29-day span (every
        # user's last activity is within 2 days of the horizon), so a
        # multi-day inactivity horizon would censor EVERYONE and the
        # estimator would never exercise; "not active on the final day"
        # gives a real event/censor mix at every scale factor
        F.when(F.col("last_day") < F.col("max_day"), 1)
        .otherwise(0)
        .alias("churned"),
    )
    tot = obs.agg(F.count(F.lit(1)).alias("n_users"))
    byd = obs.groupBy("duration").agg(
        F.count(F.lit(1)).alias("n_leaving"),
        F.sum("churned").alias("n_events"),
    )
    w_prev = (
        Window.orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = byd.crossJoin(F.broadcast(tot)).select(
        "duration",
        "n_leaving",
        "n_events",
        (
            F.col("n_users")
            - F.coalesce(F.sum("n_leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    # Exhausted-risk-set guard (round-3 ADVICE): a step where
    # n_events == n_risk has hazard factor 0 — F.log(0) is NULL in Spark
    # (silently skipped by the windowed SUM) and -inf in DuckDB, so both
    # engines must special-case it: survival drops to EXACTLY 0 at that
    # step and stays 0 (cumulative-max dead flag), and the log term is
    # excluded from the sum.
    steps = risk.where(F.col("n_events") > 0).select(
        "duration",
        "n_risk",
        "n_events",
        F.when(
            F.col("n_risk") - F.col("n_events") > 0,
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("n_events")).cast("double")
                    / F.col("n_risk")
                ),
                12,
            ),
        )
        .otherwise(F.lit(0))
        .cast("decimal(24,12)")
        .alias("lnf"),
        F.when(F.col("n_events") >= F.col("n_risk"), 1)
        .otherwise(0)
        .alias("dead"),
    )
    w_cum = (
        Window.orderBy("duration")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    surv = steps.withColumn(
        "cum_ln", F.sum("lnf").over(w_cum).cast("double")
    ).withColumn("cum_dead", F.max("dead").over(w_cum))
    return surv.select(
        "duration",
        "n_risk",
        "n_events",
        F.when(F.col("cum_dead") == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cum_ln")), 6))
        .alias("survival"),
    )


@register(
    "ks_two_sample_price",
    """
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS half
        FROM orders
    ), hist AS (
        SELECT cents,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS c2
        FROM o GROUP BY cents
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM hist
    ), cum AS (
        SELECT cents,
               CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS cum2
        FROM hist
    ), gap AS (
        SELECT cents,
               ABS(n2 * cum1 - n1 * cum2) AS d_scaled, n1, n2
        FROM cum, tot
    ), best AS (
        SELECT cents, d_scaled, n1, n2 FROM gap
        ORDER BY d_scaled DESC, cents LIMIT 1
    )
    SELECT n1, n2,
           ROUND(cents / 100.0, 2) AS at_price,
           ROUND(CAST(d_scaled AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS d_stat,
           ROUND(CAST(d_scaled AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
                 * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                        / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))), 6)
               AS ks_lambda
    FROM best
    """,
)
def ks_two_sample_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the order-price
    distributions of the two corpus halves — the BINLESS companion to
    ``psi_price_drift``: D = max |F₁−F₂| over the exact empirical CDFs,
    no bucket choice to tune, plus the scaled λ statistic p-value
    lookups use.

    Exactness trick (CUSUM's pattern): the gap at each distinct value is
    |n₂·cum₁ − n₁·cum₂| / (n₁n₂), so scaling by n₁n₂ keeps the entire
    argmax in exact integers — floats appear only in the two reported
    magnitudes.  100 TB shape: the fact reduces to the distinct-cents
    value-domain histogram; the CDF accumulation is the distributed
    prefix-sum shape over value-domain rows."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    hist = orders.groupBy("cents").agg(
        F.count_if(F.col("half") == 0).alias("c1"),
        F.count_if(F.col("half") == 1).alias("c2"),
    ).localCheckpoint(eager=False)  # tot + prefix sums: one fact pass
    tot = hist.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = partitioned_prefix_sum(hist, "cents", "c1", "cb1")
    cum = partitioned_prefix_sum(cum, "cents", "c2", "cb2")
    cum = cum.select(
        "cents",
        (F.col("cb1") + F.col("c1")).alias("cum1"),
        (F.col("cb2") + F.col("c2")).alias("cum2"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.abs(
            F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")
        ).alias("d_scaled"),
        "n1",
        "n2",
    )
    best = gap.orderBy(F.desc("d_scaled"), F.asc("cents")).limit(1)
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d = F.col("d_scaled").cast("double") / (n1d * n2d)
    return best.select(
        "n1",
        "n2",
        F.round(F.col("cents") / 100.0, 2).alias("at_price"),
        F.round(d, 6).alias("d_stat"),
        F.round(d * F.sqrt(n1d * n2d / (n1d + n2d)), 6).alias("ks_lambda"),
    )


@register(
    "spearman_qty_price",
    """
    WITH li AS (
        SELECT CAST(l_quantity AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ), xr AS (
        SELECT x,
               2 * (CAST(SUM(c) OVER (ORDER BY x) AS BIGINT) - c) + c + 1
                   AS rank2x
        FROM (SELECT x, COUNT(*) AS c FROM li GROUP BY x)
    ), yr AS (
        SELECT y,
               2 * (CAST(SUM(c) OVER (ORDER BY y) AS BIGINT) - c) + c + 1
                   AS rank2y
        FROM (SELECT y, COUNT(*) AS c FROM li GROUP BY y)
    ), ranked AS (
        SELECT CAST(rank2x AS DECIMAL(38,0)) AS rx,
               CAST(rank2y AS DECIMAL(38,0)) AS ry
        FROM li JOIN xr USING (x) JOIN yr USING (y)
    ), m AS (
        SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
               SUM(rx) AS sx, SUM(ry) AS sy,
               SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
               SUM(rx * ry) AS sxy
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                    * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS spearman_rho
    FROM m
    """,
)
def spearman_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between line-item quantity and extended
    price — the tie-aware, outlier-robust companion to the Pearson
    correlation already in ``price_stats``.

    Exactness trick: average ranks with ties are half-integers, so
    DOUBLED ranks (2·rank_before + c + 1 for a tie group of size c) stay
    EXACT integers — Pearson is affine-invariant, so ρ is unchanged and
    every moment accumulates in DECIMAL(38,0) from integers; one IEEE
    emit.  100 TB shape: ranks come from the two value-domain histograms
    (quantity and cents domains, not row counts) joined back by value —
    no row-level sort anywhere."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True).select(
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    ).localCheckpoint(eager=False)  # 3 consumers — scan+spread once
    xh = li.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    xr = partitioned_prefix_sum(xh, "x", "c", "cb").select(
        "x", (2 * F.col("cb") + F.col("c") + 1).alias("rank2x")
    )
    yh = li.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
    yr = partitioned_prefix_sum(yh, "y", "c", "cb").select(
        "y", (2 * F.col("cb") + F.col("c") + 1).alias("rank2y")
    )
    ranked = (
        li.join(xr, "x")
        .join(yr, "y")
        .select(
            F.col("rank2x").cast("decimal(38,0)").alias("rx"),
            F.col("rank2y").cast("decimal(38,0)").alias("ry"),
        )
    )
    m = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(num / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("spearman_rho"),
    )


@register(
    "contingency_association",
    """
    WITH ct AS (
        SELECT l_returnflag AS a, l_linestatus AS b,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ), marg AS (
        SELECT a, CAST(SUM(c) AS BIGINT) AS ca FROM ct GROUP BY a
    ), margb AS (
        SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM ct GROUP BY b
    ), tot AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT a) AS BIGINT) AS ra,
               CAST(COUNT(DISTINCT b) AS BIGINT) AS rb
        FROM ct
    ), cells AS (
        SELECT ct.a, ct.b, ct.c, marg.ca, margb.cb, tot.n, tot.ra, tot.rb,
               CAST(ca AS DOUBLE) * cb / n AS expected
        FROM ct JOIN marg USING (a) JOIN margb USING (b), tot
    ), terms AS (
        SELECT n, ra, rb,
               CAST(ROUND((c - expected) * (c - expected) / expected, 9)
                    AS DECIMAL(28,9)) AS chi2_term,
               CAST(ROUND((CAST(c AS DOUBLE) / n)
                          * LN(CAST(c AS DOUBLE) * n
                               / (CAST(ca AS DOUBLE) * cb)), 12)
                    AS DECIMAL(24,12)) AS mi_term
        FROM cells
    )
    SELECT ANY_VALUE(n) AS n_rows,
           ROUND(CAST(SUM(chi2_term) AS DOUBLE), 4) AS chi2,
           ROUND(SQRT(CAST(SUM(chi2_term) AS DOUBLE)
                      / (ANY_VALUE(n)
                         * (LEAST(ANY_VALUE(ra), ANY_VALUE(rb)) - 1))), 6)
               AS cramers_v,
           ROUND(CAST(SUM(mi_term) AS DOUBLE), 6) AS mutual_info_nats
    FROM terms
    """,
)
def contingency_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association between two categorical columns (returnflag x
    linestatus) in one pass: chi-squared, Cramér's V (the normalized
    effect size), and mutual information in nats — the trio every
    feature-selection / data-profiling pass computes over categorical
    pairs.

    100 TB shape: one contingency aggregate (cells = |A|x|B|, tiny),
    marginals derived from it, constant-sized math after.  Determinism:
    cell/marginal counts exact; each chi2 and MI contribution is an
    identical-double expression rounded to decimal before the exact
    sums; three IEEE emits."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True)
    # ct (|A|x|B| cells, tiny) feeds both marginals, the totals and the
    # term table — unstaged, lineitem was scanned + aggregated four
    # times.  One lazy checkpoint -> one scan.
    ct = li.groupBy(
        F.col("l_returnflag").alias("a"), F.col("l_linestatus").alias("b")
    ).agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=False)
    marg = ct.groupBy("a").agg(F.sum("c").alias("ca"))
    margb = ct.groupBy("b").agg(F.sum("c").alias("cb"))
    tot = ct.agg(
        F.sum("c").alias("n"),
        F.countDistinct("a").alias("ra"),
        F.countDistinct("b").alias("rb"),
    )
    cells = (
        ct.join(marg, "a")
        .join(margb, "b")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "expected",
            F.col("ca").cast("double") * F.col("cb") / F.col("n"),
        )
    )
    diff = F.col("c") - F.col("expected")
    terms = cells.select(
        "n",
        "ra",
        "rb",
        F.round(diff * diff / F.col("expected"), 9)
        .cast("decimal(28,9)")
        .alias("chi2_term"),
        F.round(
            (F.col("c").cast("double") / F.col("n"))
            * F.log(
                F.col("c").cast("double")
                * F.col("n")
                / (F.col("ca").cast("double") * F.col("cb"))
            ),
            12,
        )
        .cast("decimal(24,12)")
        .alias("mi_term"),
    )
    chi2 = F.sum("chi2_term").cast("double")
    return terms.agg(
        F.any_value("n").alias("n_rows"),
        F.round(chi2, 4).alias("chi2"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.any_value("n")
                    * (F.least(F.any_value("ra"), F.any_value("rb")) - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
        F.round(F.sum("mi_term").cast("double"), 6).alias("mutual_info_nats"),
    )


@register(
    "price_elasticity_by_brand",
    """
    WITH li AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(LN(CAST(l.l_quantity AS DOUBLE)), 9)
                    AS DECIMAL(20,9)) AS x,
               CAST(ROUND(LN(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                             / 100.0), 9) AS DECIMAL(20,9)) AS y
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0
    ), m AS (
        SELECT brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM li GROUP BY brand
    )
    SELECT brand, n AS n_items,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS elasticity_slope
    FROM m
    """,
)
def price_elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand log-log OLS of extended price on quantity — the grouped
    regression shape (one independent fit per group in a single
    aggregation pass) that backs elasticity panels and per-segment trend
    dashboards; the grouped generalization of ``linear_fit``.

    100 TB shape: the dimension join brings the brand key (broadcast or
    AQE's choice), then ONE partial-final aggregate accumulates all
    regression moments per brand — no per-group iteration, no window.
    Determinism: the log of exact cents (/100 of identical doubles) is
    rounded to 9 dp into DECIMAL(20,9); all moments sum exactly; one
    IEEE slope emit per brand."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True).where(
        F.col("l_quantity") > 0
    )
    part = load_table(spark, sf_dir, "part", parallel=True).select(
        "p_partkey", "p_brand"
    )
    x = F.round(F.log(F.col("l_quantity").cast("double")), 9).cast(
        "decimal(20,9)"
    )
    y = F.round(
        F.log(F.round(F.col("l_extendedprice") * 100).cast("long") / 100.0), 9
    ).cast("decimal(20,9)")
    # aggregate moments BELOW the join: decimal sums are additive, so
    # per-partkey partials roll up to per-brand totals exactly — the
    # dimension join then moves the part-sized aggregate, not the fact
    # (at sf1 the part side outgrows the broadcast threshold and a
    # fact-side SMJ sort cost 13x; this keeps the join part-sized)
    per_part = li.select(
        "l_partkey", x.alias("x"), y.alias("y")
    ).groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    m = per_part.join(
        part, per_part["l_partkey"] == part["p_partkey"]
    ).groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    return m.select(
        "brand",
        n.alias("n_items"),
        F.round(
            (n * sxy - sx * sy) / (n * sxx - sx * sx), 6
        ).alias("elasticity_slope"),
    )


def _negative_sampling_oracle(k: int = 3) -> str:
    """Replays Spark's xxhash64 draw chain bit-for-bit; the modulus is
    the runtime supplier count (scalar subquery), not a baked literal,
    so the same SQL text is correct at every scale factor."""
    from federated_gcn_spark.plans.xxh64_sql import to_signed64, xxhash64_sql

    s = to_signed64(
        xxhash64_sql(("e.src", "long"), ("e.dst", "long"), ("j.slot", "int"))
    )
    return f"""
    WITH e AS (
        SELECT DISTINCT l_orderkey AS src, l_suppkey AS dst
        FROM lineitem WHERE l_orderkey % 10 = 0
    ), ns AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier
    ), cand AS (
        SELECT e.src, e.dst, j.slot,
               ((({s}) % (SELECT n FROM ns)) + (SELECT n FROM ns))
                   % (SELECT n FROM ns) + 1 AS neg_dst
        FROM e CROSS JOIN (SELECT UNNEST(range({k})) AS slot) j
    )
    SELECT c.src, CAST(c.slot AS INT) AS slot,
           CAST(c.neg_dst AS BIGINT) AS neg_dst,
           CASE WHEN t.src IS NULL THEN 0 ELSE 1 END AS is_collision
    FROM cand c
    LEFT JOIN e t ON t.src = c.src AND t.dst = c.neg_dst
    """


@register("negative_sampling_table", _negative_sampling_oracle())
def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-sampling table for link-prediction
    training: k=3 candidate non-neighbors per positive edge, drawn by
    hashing (src, dst, slot) into the supplier vertex range, with true
    edges flagged as collisions for the caller to resample or drop —
    the data-op behind ml/federated's in-kernel negative sampling
    (reference: models/unsupervised.py negative pairs), exposed as a
    replayable relational table.

    100 TB shape: draws are pure codegen hash math on the edge list (no
    RNG state, layout-independent); collision flagging is one equi-join
    back to the edges.  The modulus is the runtime vertex count (one
    broadcast row), so the same plan serves any graph size.  Fully
    replayable: the oracle re-derives every draw bit-for-bit via the
    xxhash64 SQL chain."""
    k = 3
    li = load_table(spark, sf_dir, "lineitem", parallel=True)
    e = (
        li.where(F.col("l_orderkey") % 10 == 0)
        .select(
            F.col("l_orderkey").alias("src"), F.col("l_suppkey").alias("dst")
        )
        .distinct()
        # e feeds both the candidate draws and the collision join-back;
        # staged once -> one filtered distinct over the fact
        .localCheckpoint(eager=False)
    )
    ns = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("n")
    )
    slots = spark.range(k).select(F.col("id").cast("int").alias("slot"))
    cand = (
        e.crossJoin(F.broadcast(slots))
        .crossJoin(F.broadcast(ns))
        .select(
            "src",
            "dst",
            "slot",
            # +1: supplier keys span 1..n, so sample THAT domain — a bare
            # pmod lands in 0..n-1 (candidate 0 never real, supplier n
            # never drawn; flagged in the round-3 ADVICE review)
            (
                F.pmod(
                    F.xxhash64(F.col("src"), F.col("dst"), F.col("slot")),
                    F.col("n"),
                )
                + 1
            ).alias("neg_dst"),
        )
    )
    t = e.select(F.col("src").alias("t_src"), F.col("dst").alias("t_dst"))
    j = cand.join(
        t,
        (cand["src"] == t["t_src"]) & (cand["neg_dst"] == t["t_dst"]),
        "left",
    )
    return j.select(
        "src",
        "slot",
        F.col("neg_dst").cast("bigint").alias("neg_dst"),
        F.when(F.col("t_src").isNull(), 0).otherwise(1).alias("is_collision"),
    )


@register(
    "source_lang_entropy",
    """
    WITH ct AS (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY source, lang
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM ct GROUP BY source
    ), terms AS (
        SELECT ct.source, tot.n,
               CAST(ROUND(-(CAST(c AS DOUBLE) / n)
                          * LN(CAST(c AS DOUBLE) / n), 12)
                    AS DECIMAL(24,12)) AS term
        FROM ct JOIN tot USING (source)
    )
    SELECT source,
           ANY_VALUE(n) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS lang_entropy_nats
    FROM terms GROUP BY source
    """,
)
def source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's language mix — the diversity
    number a corpus-mixing policy balances (a source collapsing to one
    language reads 0; uniform over 5 reads ln 5 ≈ 1.609).

    One contingency aggregate; entropy contributions rounded to 12 dp
    and decimal-summed per the drift-family rule."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    # ct (|sources| x |langs| cells) feeds the totals and the entropy
    # terms; staged once -> one scan instead of two
    ct = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=False)
    tot = ct.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    terms = ct.join(tot, "source").select(
        "source",
        "n",
        F.round(-p * F.log(p), 12).cast("decimal(24,12)").alias("term"),
    )
    return terms.groupBy("source").agg(
        F.any_value("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.round(F.sum("term").cast("double"), 6).alias("lang_entropy_nats"),
    )


@register(
    "interevent_burstiness",
    """
    WITH ev AS (
        SELECT user_id, epoch_ns(ts) // 1000000000 AS sec,
               event_id
        FROM events
    ), gaps AS (
        SELECT sec - LAG(sec) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
               ) AS gap
        FROM ev
    ), g AS (
        SELECT CAST(gap AS DECIMAL(38,0)) AS gap FROM gaps
        WHERE gap IS NOT NULL
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(gap) AS s1,
               SUM(gap * gap) AS s2
        FROM g
    )
    SELECT n AS n_gaps,
           ROUND(CAST(s1 AS DOUBLE) / n, 4) AS mean_gap_sec,
           ROUND(n / CAST(s1 AS DOUBLE), 9) AS poisson_rate_per_sec,
           ROUND(SQRT((n * CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
                 / CAST(s1 AS DOUBLE), 6) AS gap_cv,
           ROUND((SQRT((n * CAST(s2 AS DOUBLE)
                        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
                  - CAST(s1 AS DOUBLE))
                 / (SQRT((n * CAST(s2 AS DOUBLE)
                          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
                    + CAST(s1 AS DOUBLE)), 6) AS burstiness
    FROM m
    """,
)
def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-time statistics over the event stream: the Poisson
    MLE rate (n/Σgap), the coefficient of variation, and the burstiness
    index B = (σ−μ)/(σ+μ) (Goh & Barabási) — B≈0 for a Poisson process,
    →1 for bursty human activity; the stream-characterization number
    capacity planning and anomaly baselines start from.

    Note the σ/μ trick: with σ = √(n·s2 − s1²)/n and μ = s1/n the 1/n
    factors cancel, so CV = √(n·s2 − s1²)/s1 and B use only the raw
    integer moment sums — both emitted from identical doubles.

    100 TB shape: one user_id exchange for the LAG, one moment
    aggregate; gaps accumulate in DECIMAL(38,0)."""
    events = load_table(spark, sf_dir, "events", parallel=True)
    ev = events.select(
        "user_id", _event_epoch_sec(events).alias("sec"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = ev.select((F.col("sec") - F.lag("sec").over(w)).alias("gap")).where(
        F.col("gap").isNotNull()
    )
    g = gaps.select(F.col("gap").cast("decimal(38,0)").alias("gap"))
    m = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
    )
    n = F.col("n")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sd_scaled = F.sqrt(n * s2 - s1 * s1)  # n * sigma
    return m.select(
        n.alias("n_gaps"),
        F.round(s1 / n, 4).alias("mean_gap_sec"),
        F.round(n / s1, 9).alias("poisson_rate_per_sec"),
        F.round(sd_scaled / s1, 6).alias("gap_cv"),
        F.round((sd_scaled - s1) / (sd_scaled + s1), 6).alias("burstiness"),
    )


@register(
    "runs_test_revenue",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), med AS (
        SELECT rev_c AS m
        FROM (
            SELECT rev_c,
                   ROW_NUMBER() OVER (ORDER BY rev_c) AS rn,
                   COUNT(*) OVER () AS cnt
            FROM daily
        ) WHERE rn = (cnt + 1) // 2
    ), signs AS (
        SELECT day,
               CASE WHEN rev_c > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
        FROM daily WHERE rev_c <> (SELECT m FROM med)
    ), runs AS (
        SELECT s,
               CASE WHEN LAG(s) OVER (ORDER BY day) IS NULL
                         OR LAG(s) OVER (ORDER BY day) <> s
                    THEN 1 ELSE 0 END AS new_run
        FROM signs
    ), m AS (
        SELECT CAST(SUM(new_run) AS BIGINT) AS r,
               CAST(SUM(s) AS BIGINT) AS n1,
               CAST(COUNT(*) - SUM(s) AS BIGINT) AS n2
        FROM runs
    )
    SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
           ROUND(1.0 + 2.0 * n1 * n2 / (n1 + n2), 4) AS expected_runs,
           ROUND((r - (1.0 + 2.0 * n1 * n2 / (n1 + n2)))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))), 6)
               AS z_score
    FROM m
    """,
)
def runs_test_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue around its median: too
    FEW runs of above/below-median days means serial dependence, too
    MANY means oscillation — the randomness sanity check behind every
    'is this series i.i.d. enough to bootstrap' decision (and the
    categorical cousin of the autocorrelation panel).

    Determinism: the median is an exact order statistic (equal-to-median
    days drop, standard practice), run boundaries are integer LAG
    comparisons, and the expected-runs/variance formulas are one IEEE
    expression over exact integer counts."""
    from federated_gcn_spark.operators.stats import exact_kth_smallest_value

    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=True)
    n_days = daily.count()
    med = exact_kth_smallest_value(
        daily.select(F.col("rev_c").cast("double").alias("v")), "v",
        (n_days + 1) // 2,
    )
    signs = daily.where(F.col("rev_c") != int(med)).select(
        "day", F.when(F.col("rev_c") > int(med), 1).otherwise(0).alias("s")
    )
    w = Window.orderBy("day")
    runs = signs.select(
        "s",
        F.when(
            F.lag("s").over(w).isNull() | (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    m = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("s").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).alias("n2"),
    )
    r = F.col("r")
    n1 = F.col("n1")
    n2 = F.col("n2")
    exp_r = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    var_r = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0))
    )
    return m.select(
        r.alias("n_runs"),
        n1.alias("n_above"),
        n2.alias("n_below"),
        F.round(exp_r, 4).alias("expected_runs"),
        F.round((r - exp_r) / F.sqrt(var_r), 6).alias("z_score"),
    )


@register(
    "degree_powerlaw_fit",
    """
    WITH e AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), deg AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY p
    ), mn AS (
        SELECT CAST(MIN(d) AS BIGINT) AS dmin FROM deg
    ), terms AS (
        SELECT CAST(ROUND(LN(CAST(d AS DOUBLE)
                             / (CAST((SELECT dmin FROM mn) AS DOUBLE) - 0.5)),
                          12) AS DECIMAL(24,12)) AS lnterm
        FROM deg
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices,
           (SELECT dmin FROM mn) AS d_min,
           ROUND(1.0 + COUNT(*) / CAST(SUM(lnterm) AS DOUBLE), 6)
               AS powerlaw_alpha
    FROM terms
    """,
)
def degree_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent of the part-degree distribution by the
    discrete MLE (Clauset-Shalizi-Newman, continuous approximation with
    the d_min − 1/2 shift): α̂ = 1 + n / Σ ln(dᵢ/(d_min−½)) — the
    scale-free-ness number that decides whether hub-aware plans (skew
    salting, degree-ordered enumeration) are mandatory for a graph.

    One degree aggregate; per-vertex log terms rounded to 12 dp and
    decimal-summed; one IEEE emit."""
    e = (
        load_table(spark, sf_dir, "lineitem", parallel=True)
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # deg feeds both the min probe and the terms pass; the shared
    # distinct+aggregate subtree is identical in both branches, so the
    # runtime deduplicates it via ReusedExchange — a checkpoint here
    # was measured 40% slower at sf1 (stores the degree table to save
    # an exchange the engine already reuses).
    deg = e.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    mn = deg.agg(F.min("d").alias("dmin"))
    terms = deg.crossJoin(F.broadcast(mn)).select(
        "dmin",
        F.round(
            F.log(
                F.col("d").cast("double")
                / (F.col("dmin").cast("double") - 0.5)
            ),
            12,
        )
        .cast("decimal(24,12)")
        .alias("lnterm"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.any_value("dmin").alias("d_min"),
        F.round(
            1.0 + F.count(F.lit(1)) / F.sum("lnterm").cast("double"), 6
        ).alias("powerlaw_alpha"),
    )


@register(
    "kruskal_wallis_priority",
    """
    WITH o AS (
        SELECT o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), vr AS (
        SELECT cents,
               2 * (CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) - c) + c + 1
                   AS rank2,
               c
        FROM (SELECT cents, COUNT(*) AS c FROM o GROUP BY cents)
    ), ranked AS (
        SELECT o.grp, CAST(vr.rank2 AS DECIMAL(38,0)) AS r2
        FROM o JOIN vr USING (cents)
    ), per_grp AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS ni,
               SUM(r2) AS sr2
        FROM ranked GROUP BY grp
    ), tot AS (
        SELECT CAST(SUM(ni) AS BIGINT) AS n FROM per_grp
    ), hraw AS (
        SELECT CAST(SUM(CAST(sr2 AS DOUBLE) * CAST(sr2 AS DOUBLE) / ni)
                    AS DOUBLE) AS sum_term,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM per_grp
    ), ties AS (
        SELECT COALESCE(CAST(SUM(c * c * c - c) AS BIGINT), 0) AS tie_sum
        FROM vr WHERE c > 1
    )
    SELECT k AS n_groups, n AS n_rows,
           ROUND((3.0 / (n * (n + 1.0)) * sum_term - 3.0 * (n + 1.0))
                 / (1.0 - CAST(tie_sum AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n)),
                 6) AS h_statistic
    FROM hraw, tot, ties
    """,
)
def kruskal_wallis_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: does order value differ across the five
    priorities? — the k-sample nonparametric ANOVA, completing the rank
    family (KS two-sample, Spearman).  Doubled tie-average ranks stay
    exact integers (the Spearman trick); with rank sums doubled, H =
    12/(n(n+1)) · Σ(Rᵢ²/nᵢ) − 3(n+1) becomes 3/(n(n+1)) · Σ(R2ᵢ²/nᵢ) −
    3(n+1), so every accumulation is exact and the tie-corrected H is
    one IEEE expression.

    100 TB shape: ranks from the value-domain cents histogram (the
    distributed prefix-sum shape), one group aggregate."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)  # hist + rank join: one fact pass
    hist = orders.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    vr = partitioned_prefix_sum(hist, "cents", "c", "cb").select(
        "cents", (2 * F.col("cb") + F.col("c") + 1).alias("rank2"), "c"
    )
    ranked = orders.join(vr, "cents").select(
        "grp", F.col("rank2").cast("decimal(38,0)").alias("r2")
    )
    per_grp = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ni"), F.sum("r2").alias("sr2")
    )
    tot = per_grp.agg(F.sum("ni").alias("n"))
    hraw = per_grp.agg(
        F.sum(
            F.col("sr2").cast("double") * F.col("sr2").cast("double")
            / F.col("ni")
        ).alias("sum_term"),
        F.count(F.lit(1)).alias("k"),
    )
    ties = vr.where(F.col("c") > 1).agg(
        F.coalesce(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")),
            F.lit(0),
        ).alias("tie_sum")
    )
    n = F.col("n")
    h = (
        3.0 / (n * (n + 1.0)) * F.col("sum_term") - 3.0 * (n + 1.0)
    ) / (
        1.0
        - F.col("tie_sum").cast("double")
        / (n.cast("double") * n * n - n)
    )
    return (
        hraw.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("k").alias("n_groups"),
            n.alias("n_rows"),
            F.round(h, 6).alias("h_statistic"),
        )
    )


@register(
    "mann_whitney_halves",
    """
    WITH o AS (
        SELECT o_orderkey % 2 AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), vr AS (
        SELECT cents,
               2 * (CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) - c) + c + 1
                   AS rank2
        FROM (SELECT cents, COUNT(*) AS c FROM o GROUP BY cents)
    ), per AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS ni,
               CAST(SUM(CAST(rank2 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sr2
        FROM o JOIN vr USING (cents) GROUP BY grp
    ), u AS (
        SELECT MAX(CASE WHEN grp = 0 THEN ni END) AS n1,
               MAX(CASE WHEN grp = 1 THEN ni END) AS n2,
               MAX(CASE WHEN grp = 0 THEN sr2 END) AS r2a
        FROM per
    )
    SELECT n1, n2,
           ROUND((CAST(r2a AS DOUBLE) / 2 - n1 * (n1 + 1.0) / 2)
                 / 1, 1) AS u_statistic,
           ROUND(2.0 * (CAST(r2a AS DOUBLE) / 2 - n1 * (n1 + 1.0) / 2)
                 / (CAST(n1 AS DOUBLE) * n2) - 1.0, 6) AS rank_biserial
    FROM u
    """,
)
def mann_whitney_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the two order halves plus the
    rank-biserial correlation (the effect size 2U/(n₁n₂) − 1 ∈ [−1,1])
    — the two-sample location test that needs no normality, with its
    standard effect-size companion.  Doubled ranks keep the rank sum
    exact; U = R₁ − n₁(n₁+1)/2 halves back out, and both emits are one
    IEEE expression each.  Same value-domain rank machinery as
    Spearman/Kruskal-Wallis."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        (F.col("o_orderkey") % 2).alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)  # hist + rank join: one fact pass
    hist = orders.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    vr = partitioned_prefix_sum(hist, "cents", "c", "cb").select(
        "cents", (2 * F.col("cb") + F.col("c") + 1).alias("rank2")
    )
    per = (
        orders.join(vr, "cents")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("ni"),
            F.sum(F.col("rank2").cast("decimal(38,0)")).alias("sr2"),
        )
    )
    u = per.agg(
        F.max(F.when(F.col("grp") == 0, F.col("ni"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("ni"))).alias("n2"),
        F.max(F.when(F.col("grp") == 0, F.col("sr2"))).alias("r2a"),
    )
    n1 = F.col("n1")
    n2 = F.col("n2")
    u_stat = F.col("r2a").cast("double") / 2 - n1 * (n1 + 1.0) / 2
    return u.select(
        "n1",
        "n2",
        F.round(u_stat, 1).alias("u_statistic"),
        F.round(
            2.0 * u_stat / (n1.cast("double") * n2) - 1.0, 6
        ).alias("rank_biserial"),
    )


@register(
    "wilcoxon_wow_revenue",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c
        FROM orders GROUP BY 1
    ), diffs AS (
        SELECT b.rev_c - a.rev_c AS d
        FROM daily a JOIN daily b ON b.day = a.day + 7
    ), nz AS (
        SELECT d, ABS(d) AS ad FROM diffs WHERE d <> 0
    ), vr AS (
        SELECT ad,
               2 * (CAST(SUM(c) OVER (ORDER BY ad) AS BIGINT) - c) + c + 1
                   AS rank2,
               c
        FROM (SELECT ad, COUNT(*) AS c FROM nz GROUP BY ad)
    ), ranked AS (
        SELECT nz.d, CAST(vr.rank2 AS DECIMAL(38,0)) AS r2
        FROM nz JOIN vr USING (ad)
    ), m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE CAST(0 AS DECIMAL(38,0))
                        END) AS DECIMAL(38,0)) AS w2_plus
        FROM ranked
    ), ties AS (
        SELECT COALESCE(CAST(SUM(c * c * c - c) AS BIGINT), 0) AS tie_sum
        FROM vr WHERE c > 1
    )
    SELECT n AS n_pairs,
           ROUND(CAST(w2_plus AS DOUBLE) / 2, 1) AS w_plus,
           ROUND((CAST(w2_plus AS DOUBLE) / 2 - n * (n + 1.0) / 4)
                 / SQRT(n * (n + 1.0) * (2.0 * n + 1) / 24
                        - CAST(tie_sum AS DOUBLE) / 48), 6) AS z_score
    FROM m, ties
    """,
)
def wilcoxon_wow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on week-over-week paired daily-revenue
    changes (day vs day+7 — same-weekday pairing strips weekday
    seasonality by construction): is there a systematic weekly shift? —
    the PAIRED branch of the nonparametric family (KS/Mann-Whitney are
    independent-sample, this is matched-pairs).

    Doubled |d|-ranks stay exact integers (the family trick); W⁺ halves
    back out, and the tie-corrected normal approximation emits as one
    IEEE expression.  Same value-domain rank machinery, applied to the
    |difference| domain of the calendar-bounded pair table."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c")
    ).localCheckpoint(eager=True)
    b = daily.select(
        F.col("day").alias("day2"), F.col("rev_c").alias("rev_c2")
    )
    diffs = daily.join(b, F.col("day2") == F.col("day") + 7).select(
        (F.col("rev_c2") - F.col("rev_c")).alias("d")
    )
    nz = diffs.where(F.col("d") != 0).select("d", F.abs(F.col("d")).alias("ad"))
    hist = nz.groupBy("ad").agg(F.count(F.lit(1)).alias("c"))
    vr = partitioned_prefix_sum(hist, "ad", "c", "cb").select(
        "ad", (2 * F.col("cb") + F.col("c") + 1).alias("rank2"), "c"
    )
    ranked = nz.join(vr, "ad").select(
        "d", F.col("rank2").cast("decimal(38,0)").alias("r2")
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("d") > 0, F.col("r2")).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("w2_plus"),
    )
    ties = vr.where(F.col("c") > 1).agg(
        F.coalesce(
            F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")),
            F.lit(0),
        ).alias("tie_sum")
    )
    n = F.col("n")
    w_plus = F.col("w2_plus").cast("double") / 2
    var = n * (n + 1.0) * (2.0 * n + 1) / 24 - F.col("tie_sum").cast(
        "double"
    ) / 48
    return m.crossJoin(F.broadcast(ties)).select(
        n.alias("n_pairs"),
        F.round(w_plus, 1).alias("w_plus"),
        F.round((w_plus - n * (n + 1.0) / 4) / F.sqrt(var), 6).alias("z_score"),
    )


@register(
    "wasserstein_price_drift",
    """
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS half
        FROM orders
    ), hist AS (
        SELECT cents,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS c2
        FROM o GROUP BY cents
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM hist
    ), cum AS (
        SELECT cents,
               CAST(SUM(c1) OVER (ORDER BY cents) AS BIGINT) AS cum1,
               CAST(SUM(c2) OVER (ORDER BY cents) AS BIGINT) AS cum2,
               LEAD(cents) OVER (ORDER BY cents) AS next_cents
        FROM hist
    ), area AS (
        SELECT SUM(CAST(ABS(n2 * cum1 - n1 * cum2) AS DECIMAL(38,0))
                   * (next_cents - cents)) AS w_scaled,
               ANY_VALUE(n1) AS n1, ANY_VALUE(n2) AS n2
        FROM cum, tot WHERE next_cents IS NOT NULL
    )
    SELECT n1, n2,
           ROUND(CAST(w_scaled AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) / 100, 4)
               AS wasserstein_dollars
    FROM area
    """,
)
def wasserstein_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein (earth mover's) distance between the two halves'
    price distributions — the optimal-transport drift measure that,
    unlike KS (max gap) or PSI (binned), weighs HOW FAR mass moved:
    W₁ = ∫|F₁−F₂| dx, computed exactly as the CDF-gap area over the
    distinct-value domain.

    Exactness: the integrand |n₂·cum₁ − n₁·cum₂|·Δv is an exact integer
    per segment (the KS cross-multiplication times an integer gap) and
    accumulates in DECIMAL(38,0); one division emits dollars.  Same
    value-domain prefix shape as the KS test."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    hist = orders.groupBy("cents").agg(
        F.count_if(F.col("half") == 0).alias("c1"),
        F.count_if(F.col("half") == 1).alias("c2"),
    ).localCheckpoint(eager=False)  # tot + prefix sums: one fact pass
    tot = hist.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = partitioned_prefix_sum(hist, "cents", "c1", "cb1")
    cum = partitioned_prefix_sum(cum, "cents", "c2", "cb2")
    w = Window.orderBy("cents")
    cum = cum.select(
        "cents",
        (F.col("cb1") + F.col("c1")).alias("cum1"),
        (F.col("cb2") + F.col("c2")).alias("cum2"),
    ).withColumn("next_cents", F.lead("cents").over(w))
    area = (
        cum.where(F.col("next_cents").isNotNull())
        .crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.abs(
                    F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")
                ).cast("decimal(38,0)")
                * (F.col("next_cents") - F.col("cents"))
            ).alias("w_scaled"),
            F.any_value("n1").alias("n1"),
            F.any_value("n2").alias("n2"),
        )
    )
    return area.select(
        "n1",
        "n2",
        F.round(
            F.col("w_scaled").cast("double")
            / (F.col("n1").cast("double") * F.col("n2")) / 100,
            4,
        ).alias("wasserstein_dollars"),
    )


@register(
    "hellinger_price_drift",
    """
    WITH o AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderkey % 2 AS half
        FROM orders
    ), b AS (
        SELECT cents // 100000 AS bucket,
               CAST(COUNT(*) FILTER (half = 0) AS BIGINT) AS c1,
               CAST(COUNT(*) FILTER (half = 1) AS BIGINT) AS c2
        FROM o GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
        FROM b
    ), terms AS (
        SELECT CAST(ROUND(SQRT((CAST(c1 AS DOUBLE) / n1)
                               * (CAST(c2 AS DOUBLE) / n2)), 12)
                    AS DECIMAL(24,12)) AS bc_term
        FROM b, tot
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(CAST(SUM(bc_term) AS DOUBLE), 6) AS bhattacharyya,
           ROUND(SQRT(1 - LEAST(CAST(SUM(bc_term) AS DOUBLE), 1.0)), 6)
               AS hellinger
    FROM terms
    """,
)
def hellinger_price_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bhattacharyya coefficient and Hellinger distance between the two
    halves' price distributions over fixed $1000 buckets — the bounded
    [0,1] drift metric (unlike KL it never diverges on disjoint
    support), completing the drift-distance family: PSI (binned
    log-ratio), KS (max CDF gap), Wasserstein (transported mass),
    Hellinger (geometric overlap).

    Buckets are fixed integer arithmetic (cents div 100000 — no fitted
    edges, so both engines bucket identically by construction); each
    √(p·q) term is IEEE-exact on identical doubles, rounded to 12 dp,
    and decimal-summed."""
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (F.col("o_orderkey") % 2).alias("half"),
    )
    # b feeds both the totals and the term pass; staged once -> one
    # bucket tally over the fact instead of two
    b = orders.groupBy(
        F.expr("cents div 100000").alias("bucket")
    ).agg(
        F.count_if(F.col("half") == 0).alias("c1"),
        F.count_if(F.col("half") == 1).alias("c2"),
    ).localCheckpoint(eager=False)
    tot = b.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    terms = b.crossJoin(F.broadcast(tot)).select(
        F.round(
            F.sqrt(
                (F.col("c1").cast("double") / F.col("n1"))
                * (F.col("c2").cast("double") / F.col("n2"))
            ),
            12,
        )
        .cast("decimal(24,12)")
        .alias("bc_term")
    )
    bc = F.sum("bc_term").cast("double")
    return terms.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(bc, 6).alias("bhattacharyya"),
        F.round(F.sqrt(1 - F.least(bc, F.lit(1.0))), 6).alias("hellinger"),
    )


@register(
    "rolling_correlation_revenue_orders",
    """
    WITH daily AS (
        SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                   AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS rev_c,
               CAST(COUNT(*) AS BIGINT) AS n_ord
        FROM orders GROUP BY 1
    ), win AS (
        SELECT d.day,
               CAST(w.rev_c AS DECIMAL(38,0)) AS x,
               CAST(w.n_ord AS DECIMAL(38,0)) AS y
        FROM daily d JOIN daily w
          ON w.day BETWEEN d.day - 29 AND d.day
    ), m AS (
        SELECT day,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM win GROUP BY day
    )
    SELECT day, n AS n_days_in_window,
           CASE WHEN n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                  OR n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0
                THEN NULL
                ELSE ROUND((n * CAST(sxy AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                           / (SQRT(n * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                              * SQRT(n * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                           6) END AS rolling_corr
    FROM m
    """,
)
def rolling_correlation_revenue_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trailing 30-day Pearson correlation between daily revenue and
    daily order count — the rolling-bivariate monitor that flags regime
    changes where volume and value decouple (discount waves, mix
    shifts).

    Same calendar-bounded window-join shape as the moving median, with
    the assortativity family's exactness: per-day moments accumulate in
    DECIMAL(38,0) from exact integers, one IEEE correlation emit per
    day; degenerate (zero-variance) windows emit NULL explicitly rather
    than dividing by zero."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    daily = orders.groupBy(
        F.unix_date(F.to_date("o_orderdate")).cast("long").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_c"),
        F.count(F.lit(1)).alias("n_ord"),
    ).localCheckpoint(eager=False)
    w = daily.select(
        F.col("day").alias("wday"),
        F.col("rev_c").cast("decimal(38,0)").alias("x"),
        F.col("n_ord").cast("decimal(38,0)").alias("y"),
    )
    win = daily.join(
        w,
        (F.col("wday") >= F.col("day") - 29) & (F.col("wday") <= F.col("day")),
    )
    m = win.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return m.select(
        "day",
        n.alias("n_days_in_window"),
        F.when((vx == 0) | (vy == 0), F.lit(None).cast("double"))
        .otherwise(
            F.round((n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)), 6)
        )
        .alias("rolling_corr"),
    )


@register(
    "odds_ratio_urgent_building",
    """
    WITH base AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                   AS exposed,
               MAX(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                   AS outcome
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, 1
    ), cells AS (
        SELECT CAST(COUNT(*) FILTER (exposed = 1 AND outcome = 1) AS BIGINT) AS a,
               CAST(COUNT(*) FILTER (exposed = 1 AND outcome = 0) AS BIGINT) AS b,
               CAST(COUNT(*) FILTER (exposed = 0 AND outcome = 1) AS BIGINT) AS c,
               CAST(COUNT(*) FILTER (exposed = 0 AND outcome = 0) AS BIGINT) AS d
        FROM base
    )
    SELECT a, b, c, d,
           ROUND(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c), 6)
               AS odds_ratio,
           ROUND((CAST(a AS DOUBLE) / (a + b))
                 / (CAST(c AS DOUBLE) / (c + d)), 6) AS relative_risk,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     - 1.959964 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
               AS or_ci_low,
           ROUND(EXP(LN(CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c))
                     + 1.959964 * SQRT(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
               AS or_ci_high
    FROM cells
    """,
)
def odds_ratio_urgent_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and relative risk of 'has an urgent order' for
    BUILDING-segment customers, with the Woolf 95% CI — the 2×2
    effect-size readout every cohort comparison reports beside its
    p-value (the chi-squared machinery says IF there is association;
    this says HOW MUCH).

    One custkey join + MAX-bit fold (the audience_venn shape) to a
    single 2×2 cell row; all four emits are one IEEE expression over
    exact counts."""
    customer = load_table(spark, sf_dir, "customer", parallel=True).select(
        "c_custkey", "c_mktsegment"
    )
    orders = load_table(spark, sf_dir, "orders", parallel=True).select(
        "o_custkey", "o_orderpriority"
    )
    base = (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"])
        .groupBy(
            "c_custkey",
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("exposed"),
        )
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("outcome")
        )
    )
    cells = base.agg(
        F.count_if((F.col("exposed") == 1) & (F.col("outcome") == 1)).alias("a"),
        F.count_if((F.col("exposed") == 1) & (F.col("outcome") == 0)).alias("b"),
        F.count_if((F.col("exposed") == 0) & (F.col("outcome") == 1)).alias("c"),
        F.count_if((F.col("exposed") == 0) & (F.col("outcome") == 0)).alias("d"),
    )
    a = F.col("a").cast("double")
    b = F.col("b").cast("double")
    c = F.col("c").cast("double")
    d = F.col("d").cast("double")
    or_ = a * d / (b * c)
    se = F.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(or_, 6).alias("odds_ratio"),
        F.round((a / (a + b)) / (c / (c + d)), 6).alias("relative_risk"),
        F.round(F.exp(F.log(or_) - 1.959964 * se), 6).alias("or_ci_low"),
        F.round(F.exp(F.log(or_) + 1.959964 * se), 6).alias("or_ci_high"),
    )


def _gains_oracle() -> str:
    from federated_gcn_spark.functions.text import STOPWORDS
    from federated_gcn_spark.plans.queries import _in_list

    edge_exprs = ", ".join(
        f"MIN(CASE WHEN cum_c >= ({i} * n + 9) // 10 THEN s END)"
        for i in range(1, 10)
    )
    return rf"""
    WITH t AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE LEN(string_split_regex(TRIM(text), '\s+')) END AS nt,
               CASE WHEN TRIM(text) = '' THEN 0
                    ELSE LEN(list_filter(
                        string_split_regex(LOWER(TRIM(text)), '\s+'),
                        x -> x IN ({_in_list(STOPWORDS)}))) END AS sw,
               CASE WHEN LENGTH(text) > 0
                    THEN CAST(LENGTH(text) - LENGTH(translate(text, '.,!?;:', ''))
                              AS DOUBLE) / LENGTH(text)
                    ELSE 0.0 END AS punct
        FROM documents
    ), scored AS (
        SELECT y,
               CAST(ROUND(ROUND(0.4 * LEAST(1.0, CAST(nt AS DOUBLE) / 64.0)
                     + 0.3 * (1.0 - punct)
                     + 0.3 * LEAST(1.0, 4.0 * (CASE WHEN nt > 0
                           THEN CAST(sw AS DOUBLE) / nt ELSE 0.0 END)), 6)
                     * 1000000) AS BIGINT) AS s
        FROM t
    ), hist AS (
        SELECT s, COUNT(*) AS c FROM scored GROUP BY s
    ), na AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n FROM hist
    ), cum AS (
        SELECT s, CAST(SUM(c) OVER (ORDER BY s) AS BIGINT) AS cum_c
        FROM hist
    ), edges AS (
        SELECT [{edge_exprs}] AS es FROM cum, na
    ), b AS (
        SELECT y,
               len(list_filter((SELECT es FROM edges), e -> s > e)) AS bucket
        FROM scored
    ), per AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(y) AS BIGINT) AS n_pos
        FROM b GROUP BY bucket
    ), tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS n_all,
               CAST(SUM(n_pos) AS BIGINT) AS pos_all
        FROM per
    )
    SELECT bucket AS score_decile, n_docs, n_pos,
           ROUND(CAST(n_pos AS DOUBLE) / n_docs, 6) AS positive_rate,
           ROUND((CAST(n_pos AS DOUBLE) / n_docs)
                 / (CAST(pos_all AS DOUBLE) / n_all), 6) AS lift,
           ROUND(CAST(SUM(n_pos) OVER (
                     ORDER BY bucket DESC
                 ) AS DOUBLE) / pos_all, 6) AS cum_gain
    FROM per, tot
    """


@register("gains_lift_table", _gains_oracle())
def gains_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table for the quality score as a predictor of
    English documents — the model-eval readout that answers 'how much of
    the positive class do the top-k score deciles capture' (marketing's
    gains chart, completing roc_auc / confusion_matrix /
    score_calibration).

    Scores become exact integers (6-dp quality × 1e6); decile edges are
    exact order statistics over the score value domain (the PSI edge
    machinery); bucket assignment is the broadcast-edge HOF scan;
    lift/gain emit from exact counts, with the cumulative gain a
    whole-frame window over ≤ 10 decile rows."""
    from federated_gcn_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    scored = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.round(F.round(quality_score("text"), 6) * 1000000)
        .cast("long")
        .alias("s"),
        # Two consumers (histogram, bucket assignment) — score each
        # document once, not once per consumer.
    ).localCheckpoint(eager=False)
    # One quality_score pass: na + the prefix sum both read this frame.
    hist = scored.groupBy("s").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=False
    )
    cum = partitioned_prefix_sum(hist, "s", "c", "cb").withColumn(
        "cum_c", F.col("cb") + F.col("c")
    )
    na = hist.agg(F.sum("c").alias("n"))
    edges = (
        cum.crossJoin(F.broadcast(na))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum_c") >= F.expr(f"({i} * n + 9) div 10"),
                        F.col("s"),
                    )
                ).alias(f"e{i}")
                for i in range(1, 10)
            ]
        )
        .select(F.array(*[f"e{i}" for i in range(1, 10)]).alias("es"))
    )
    b = scored.crossJoin(F.broadcast(edges)).select(
        "y",
        F.size(F.filter("es", lambda e: F.col("s") > e)).alias("bucket"),
    )
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("y").alias("n_pos")
    )
    tot = per.agg(
        F.sum("n_docs").alias("n_all"), F.sum("n_pos").alias("pos_all")
    )
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    j = per.crossJoin(F.broadcast(tot))
    rate = F.col("n_pos").cast("double") / F.col("n_docs")
    return j.select(
        F.col("bucket").alias("score_decile"),
        "n_docs",
        "n_pos",
        F.round(rate, 6).alias("positive_rate"),
        F.round(
            rate / (F.col("pos_all").cast("double") / F.col("n_all")), 6
        ).alias("lift"),
        F.round(
            F.sum("n_pos").over(w).cast("double") / F.col("pos_all"), 6
        ).alias("cum_gain"),
    )


def _rfm_oracle() -> str:
    def edges(src: str, val: str) -> str:
        return ", ".join(
            f"MIN(CASE WHEN cum_c >= ({i} * n + 4) // 5 THEN {val} END)"
            for i in range(1, 5)
        )

    return f"""
    WITH cust AS (
        SELECT o_custkey,
               date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                         (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
                   AS recency,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ), n_c AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cust
    ), re AS (
        SELECT [{edges('cust', 'v')}] AS es
        FROM (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum_c
              FROM (SELECT recency AS v, COUNT(*) AS c FROM cust GROUP BY 1)),
             n_c
    ), fe AS (
        SELECT [{edges('cust', 'v')}] AS es
        FROM (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum_c
              FROM (SELECT frequency AS v, COUNT(*) AS c FROM cust GROUP BY 1)),
             n_c
    ), me AS (
        SELECT [{edges('cust', 'v')}] AS es
        FROM (SELECT v, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT) AS cum_c
              FROM (SELECT monetary AS v, COUNT(*) AS c FROM cust GROUP BY 1)),
             n_c
    ), scored AS (
        SELECT 5 - len(list_filter((SELECT es FROM re), e -> recency > e))
                   AS r_score,
               1 + len(list_filter((SELECT es FROM fe), e -> frequency > e))
                   AS f_score,
               1 + len(list_filter((SELECT es FROM me), e -> monetary > e))
                   AS m_score,
               monetary
        FROM cust
    )
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) // COUNT(*) AS BIGINT) AS avg_spend_cents
    FROM scored
    GROUP BY 1, 2, 3
    """


@register("rfm_segmentation", _rfm_oracle())
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1-5 on Recency (days
    since last order — lower is better, so the score inverts), Frequency
    and Monetary by EXACT population quintiles, rolled up to segment
    cells — the marketing-analytics workhorse, three value-domain
    quantile fits in one query.

    All three edge sets use the PSI/gains machinery (distinct-value
    histogram → prefix sum → order-statistic edges → broadcast array +
    HOF scan); segment means follow the decimal-sum-then-one-division
    rule.  The fact reduces to one per-customer aggregate before
    anything else runs."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    anchor = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("anchor")
    )
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff(F.col("anchor"), F.col("last_order"))
            .cast("long")
            .alias("recency"),
            "frequency",
            "monetary",
        )
        .localCheckpoint(eager=True)
    )
    n_c = cust.agg(F.count(F.lit(1)).alias("n"))

    def quintile_edges(col: str):
        hist = cust.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("c")
        )
        cum = partitioned_prefix_sum(hist, "v", "c", "cb").withColumn(
            "cum_c", F.col("cb") + F.col("c")
        )
        return (
            cum.crossJoin(F.broadcast(n_c))
            .agg(
                *[
                    F.min(
                        F.when(
                            F.col("cum_c") >= F.expr(f"({i} * n + 4) div 5"),
                            F.col("v"),
                        )
                    ).alias(f"e{i}")
                    for i in range(1, 5)
                ]
            )
            .select(F.array(*[f"e{i}" for i in range(1, 5)]).alias("es"))
        )

    re_, fe, me = (
        quintile_edges("recency"),
        quintile_edges("frequency"),
        quintile_edges("monetary"),
    )
    scored = (
        cust.crossJoin(F.broadcast(re_.select(F.col("es").alias("r_es"))))
        .crossJoin(F.broadcast(fe.select(F.col("es").alias("f_es"))))
        .crossJoin(F.broadcast(me.select(F.col("es").alias("m_es"))))
        .select(
            (
                5 - F.size(F.filter("r_es", lambda e: F.col("recency") > e))
            ).alias("r_score"),
            (
                1 + F.size(F.filter("f_es", lambda e: F.col("frequency") > e))
            ).alias("f_score"),
            (
                1 + F.size(F.filter("m_es", lambda e: F.col("monetary") > e))
            ).alias("m_score"),
            "monetary",
        )
    )
    # floor-division cents, not a rounded mean: tiny segments make the
    # p/q mean land on exact half-cents, where the engines' ROUND-of-
    # double implementations disagree — integer div is exact everywhere
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr("sum(monetary) div count(1)").alias("avg_spend_cents"),
        )
    )


@register(
    "cohort_ltv_curve",
    """
    WITH o AS (
        SELECT o_custkey,
               (EXTRACT(year FROM o_orderdate) * 12
                + EXTRACT(month FROM o_orderdate) - 1) AS ym,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), first AS (
        SELECT o_custkey, MIN(ym) AS cohort FROM o GROUP BY o_custkey
    ), sizes AS (
        SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM first GROUP BY cohort
    ), spend AS (
        SELECT f.cohort, o.ym - f.cohort AS age,
               CAST(SUM(o.cents) AS BIGINT) AS month_cents
        FROM o JOIN first f USING (o_custkey)
        GROUP BY f.cohort, o.ym - f.cohort
    ), cum AS (
        SELECT cohort, age,
               CAST(SUM(month_cents) OVER (
                   PARTITION BY cohort ORDER BY age
               ) AS BIGINT) AS cum_cents
        FROM spend
    )
    SELECT CAST(cohort AS BIGINT) AS cohort_month,
           CAST(age AS BIGINT) AS age_months,
           n_customers,
           CAST(cum_cents // n_customers AS BIGINT)
               AS ltv_per_customer_cents
    FROM cum JOIN sizes USING (cohort)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, cumulative spend per customer at each cohort age — the
    value-based companion to ``cohort_retention_matrix`` (retention says
    who comes back; LTV says what they're worth as the cohort ages).

    100 TB shape: one custkey aggregate for cohorts, one
    (cohort, age)-grained rollup of the fact, then calendar-bounded
    cumulative windows per cohort.  All exact integers; per-customer
    LTV is floor-division cents (the small-group mean rule)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    o = orders.select(
        "o_custkey",
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("ym"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)  # 2 consumers — scan+spread once
    first = o.groupBy("o_custkey").agg(F.min("ym").alias("cohort"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    spend = (
        o.join(first, "o_custkey")
        .groupBy("cohort", (F.col("ym") - F.col("cohort")).alias("age"))
        .agg(F.sum("cents").alias("month_cents"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = spend.withColumn("cum_cents", F.sum("month_cents").over(w))
    return cum.join(F.broadcast(sizes), "cohort").select(
        F.col("cohort").alias("cohort_month"),
        F.col("age").alias("age_months"),
        "n_customers",
        F.expr("cum_cents div n_customers").alias("ltv_per_customer_cents"),
    )
