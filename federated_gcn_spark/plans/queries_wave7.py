"""Round-4 wave 7: clickstream path mining, vocabulary coverage
estimation, probabilistic-forecast evaluation, ranking-quality metrics,
and graph core structure.

- ``event_path_trigrams``: most frequent length-3 event-type paths
  across user journeys — the clickstream path-mining staple (what
  product analytics calls "user flows").  One user_id exchange; the
  n-gram table is (|event types|)^3-bounded.
- ``unseen_vocab_mass``: Chao1 species-richness estimate of the TRUE
  vocabulary size and the Good-Turing unseen-probability mass f1/N —
  the coverage diagnostics a corpus-curation pipeline reads before
  freezing a tokenizer.
- ``brier_calibration_report``: Brier-score decomposition (Murphy
  1973: reliability − resolution + uncertainty) + expected calibration
  error of a train-fold binned forecaster evaluated on the held-out
  fold — the probabilistic-forecast scorecard.
- ``ann_ndcg_report``: NDCG@10 of the hyperplane-LSH ANN ranking
  against the brute-force exact top-10 (binary relevance) — completes
  ``ann_recall_report`` with a position-sensitive metric.  Log2
  discounts are inlined 9-dp literals summed as DECIMAL, so even the
  transcendental part is bit-stable across engines.
- ``rich_club_coefficient``: rich-club connectivity phi(k) at k in
  {2,4,8} — do high-degree vertices preferentially interconnect —
  the standard structural diagnostic next to assortativity.

Cross-engine determinism: path counts, vocabulary frequencies, bin
sums, overlap ranks, and degree counts are exact integers; every
emitted double is a single fixed expression (per-bin transcendental
terms are 9-dp-rounded then DECIMAL-summed — the KL/PSI pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import ORACLE, register


# ---------------------------------------------------------------------------
# Clickstream path mining
# ---------------------------------------------------------------------------

@register(
    "event_path_trigrams",
    """
    WITH t AS (
        SELECT user_id, event_type, event_id,
               epoch_ns(ts) // 1000000000 AS sec
        FROM events
    ), seq AS (
        SELECT user_id, event_type AS step1,
               LEAD(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
               ) AS step2,
               LEAD(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
               ) AS step3
        FROM t
    )
    SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM seq WHERE step2 IS NOT NULL AND step3 IS NOT NULL
    GROUP BY step1, step2, step3
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT 20
    """,
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 length-3 event-type paths over per-user journeys (ordered
    by time, event_id tiebreak) — clickstream path mining / "user
    flows".  Companion to ``event_transition_matrix`` (first-order) at
    third order.

    100 TB shape: ONE user_id exchange; both LEADs ride the same
    window sort; the path table is bounded by |event types|^3 (125
    here), so the final top-k is constant-sized.  Determinism: integer
    counts, total-order tiebreak in both the window and the top-k."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events", parallel=True)
    t = events.select(
        "user_id", "event_type", "event_id",
        _event_epoch_sec(events).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = t.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    )
    return (
        seq.where(F.col("step2").isNotNull() & F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "step1", "step2", "step3")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage: Chao1 + Good-Turing
# ---------------------------------------------------------------------------

@register(
    "unseen_vocab_mass",
    r"""
    WITH tf AS (
        SELECT UNNEST(string_split_regex(LOWER(TRIM(text)), '\s+')) AS term
        FROM documents WHERE TRIM(text) <> ''
    ), c AS (
        SELECT term, COUNT(*) AS freq FROM tf GROUP BY term
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(freq) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax_count,
               CAST(SUM(CASE WHEN freq = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dis_count
        FROM c
    )
    SELECT vocab_size, n_tokens, hapax_count, dis_count,
           vocab_size + CAST(hapax_count * (hapax_count - 1) AS DOUBLE)
               / CAST(2 * (dis_count + 1) AS DOUBLE) AS chao1_richness,
           CAST(hapax_count AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS unseen_mass_gt
    FROM s
    """,
)
def unseen_vocab_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage diagnostics: bias-corrected Chao1 richness
    (D + f1(f1-1)/(2(f2+1)) — a lower bound on the TRUE vocabulary the
    corpus samples from) and the Good-Turing unseen-probability mass
    f1/N (the chance the next token is novel).  What a tokenizer-
    freezing / corpus-growth decision reads.

    100 TB shape: one tokenize + one vocabulary aggregate + a singleton
    reduce over (D, N, f1, f2) — all map-side combinable.  Integer
    moments, two single divisions."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim(F.col("text")) != ""
    )
    tf = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    c = tf.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    s = c.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("freq").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax_count"),
        F.sum(F.when(F.col("freq") == 2, 1).otherwise(0))
        .cast("long")
        .alias("dis_count"),
    )
    return s.select(
        "vocab_size", "n_tokens", "hapax_count", "dis_count",
        (
            F.col("vocab_size")
            + (F.col("hapax_count") * (F.col("hapax_count") - 1)).cast("double")
            / (2 * (F.col("dis_count") + 1)).cast("double")
        ).alias("chao1_richness"),
        (
            F.col("hapax_count").cast("double")
            / F.col("n_tokens").cast("double")
        ).alias("unseen_mass_gt"),
    )


# ---------------------------------------------------------------------------
# Brier decomposition + ECE
# ---------------------------------------------------------------------------

def _brier_oracle() -> str:
    from federated_gcn_spark.plans.xxh64_sql import to_signed64, xxhash64_sql

    s = to_signed64(
        xxhash64_sql(("l_orderkey", "long"), ("l_linenumber", "long"))
    )
    return f"""
    WITH li AS (
        SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS score_bin,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
               ((({s}) % 2) + 2) % 2 AS fold
        FROM lineitem
    ), train AS (
        SELECT score_bin,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p
        FROM li WHERE fold = 0 GROUP BY score_bin
    ), test AS (
        SELECT score_bin, CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(y) AS BIGINT) AS pos_k
        FROM li WHERE fold = 1 GROUP BY score_bin
    ), joined AS (
        SELECT t.score_bin, t.n_k, t.pos_k, tr.p,
               CAST(t.pos_k AS DOUBLE) / t.n_k AS ybar_k
        FROM test t JOIN train tr ON tr.score_bin = t.score_bin
    ), tot AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               CAST(SUM(pos_k) AS BIGINT) AS pos
        FROM joined
    ), terms AS (
        SELECT j.score_bin, j.n_k, j.pos_k, j.p, j.ybar_k,
               CAST(ROUND(j.n_k * j.p * j.p - 2 * j.p * j.pos_k + j.pos_k, 9)
                    AS DECIMAL(38,9)) AS brier_term,
               CAST(ROUND(j.n_k * (j.p - j.ybar_k) * (j.p - j.ybar_k), 9)
                    AS DECIMAL(38,9)) AS rel_term,
               CAST(ROUND(j.n_k
                          * (j.ybar_k - CAST(t.pos AS DOUBLE) / t.n)
                          * (j.ybar_k - CAST(t.pos AS DOUBLE) / t.n), 9)
                    AS DECIMAL(38,9)) AS res_term,
               CAST(ROUND(j.n_k * ABS(j.p - j.ybar_k), 9)
                    AS DECIMAL(38,9)) AS ece_term
        FROM joined j, tot t
    )
    SELECT t.n AS n_test,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(terms.brier_term) AS DOUBLE) / t.n AS brier,
           CAST(SUM(terms.rel_term) AS DOUBLE) / t.n AS reliability,
           CAST(SUM(terms.res_term) AS DOUBLE) / t.n AS resolution,
           (CAST(t.pos AS DOUBLE) / t.n) * (1 - CAST(t.pos AS DOUBLE) / t.n)
               AS uncertainty,
           CAST(SUM(terms.ece_term) AS DOUBLE) / t.n AS ece
    FROM terms, tot t GROUP BY t.n, t.pos
    """


@register("brier_calibration_report", _brier_oracle())
def brier_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score (brier = reliability −
    resolution + uncertainty) plus expected calibration error, for the
    binned return-rate forecaster: per-bin rates FIT on the xxh64-even
    fold forecast the xxh64-odd fold — the out-of-sample calibration
    scorecard every probabilistic model ships with (same bins as
    ``isotonic_calibration``, same split machinery as the conformal
    interval).

    100 TB shape: two conditional bin aggregates over one scan (fold is
    a hash label), then constant-sized bin algebra.  Per-row Brier
    needs no per-row pass: sum_i (p_k - y_i)^2 closes to n_k p_k^2 -
    2 p_k pos_k + pos_k per bin.  Determinism: bin moments are exact
    integers; p and ybar are single divisions; per-bin terms are 9-dp
    rounded and DECIMAL-summed (order-independent)."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    li = lineitem.select(
        F.floor(F.col("l_extendedprice") / 10000).cast("long").alias(
            "score_bin"
        ),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        F.pmod(
            F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber").cast("long")),
            F.lit(2),
        ).alias("fold"),
    )
    # Both folds' bin moments in ONE conditional aggregate (was: two
    # separate filtered aggregates inner-joined, each its own scan, and
    # the join re-ran per downstream consumer — four scans total).  The
    # inner join's bins-present-in-both-folds semantics is the n0>0 AND
    # n_k>0 filter; p = pos0/n0 is the identical integer division.  The
    # bin-sized result is staged once.
    joined = (
        li.groupBy("score_bin")
        .agg(
            F.count_if(F.col("fold") == 0).alias("n0"),
            F.sum(F.when(F.col("fold") == 0, F.col("y"))).alias("pos0"),
            F.count_if(F.col("fold") == 1).alias("n_k"),
            F.sum(F.when(F.col("fold") == 1, F.col("y")))
            .cast("long")
            .alias("pos_k"),
        )
        .where((F.col("n0") > 0) & (F.col("n_k") > 0))
        .select(
            "score_bin",
            "n_k",
            "pos_k",
            (F.col("pos0").cast("double") / F.col("n0")).alias("p"),
        )
        .withColumn("ybar_k", F.col("pos_k").cast("double") / F.col("n_k"))
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("pos_k").cast("long").alias("pos"),
    )
    ybar = F.col("pos").cast("double") / F.col("n")
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")  # noqa: E731
    terms = joined.crossJoin(F.broadcast(tot)).select(
        "n", "pos",
        d9(
            F.col("n_k") * F.col("p") * F.col("p")
            - 2 * F.col("p") * F.col("pos_k")
            + F.col("pos_k")
        ).alias("brier_term"),
        d9(
            F.col("n_k")
            * (F.col("p") - F.col("ybar_k"))
            * (F.col("p") - F.col("ybar_k"))
        ).alias("rel_term"),
        d9(
            F.col("n_k") * (F.col("ybar_k") - ybar) * (F.col("ybar_k") - ybar)
        ).alias("res_term"),
        d9(F.col("n_k") * F.abs(F.col("p") - F.col("ybar_k"))).alias(
            "ece_term"
        ),
    )
    return terms.groupBy("n", "pos").agg(
        F.count(F.lit(1)).alias("n_bins"),
        (F.sum("brier_term").cast("double") / F.col("n")).alias("brier"),
        (F.sum("rel_term").cast("double") / F.col("n")).alias("reliability"),
        (F.sum("res_term").cast("double") / F.col("n")).alias("resolution"),
        (ybar * (1 - ybar)).alias("uncertainty"),
        (F.sum("ece_term").cast("double") / F.col("n")).alias("ece"),
    ).select(
        F.col("n").alias("n_test"), "n_bins", "brier", "reliability",
        "resolution", "uncertainty", "ece",
    )


# ---------------------------------------------------------------------------
# NDCG@10 for the ANN ranking
# ---------------------------------------------------------------------------

# 1/log2(i+1) for i = 1..10, rounded to 9 dp (inlined so the
# transcendental never runs inside either engine)
_DISC9 = [
    "1.000000000", "0.630929754", "0.500000000", "0.430676558",
    "0.386852807", "0.356207187", "0.333333333", "0.315464877",
    "0.301029996", "0.289064826",
]
_IDCG9 = "4.543559338"  # exact decimal sum of _DISC9


def _ann_ndcg_oracle() -> str:
    disc_case = " ".join(
        f"WHEN {i + 1} THEN CAST({d} AS DECIMAL(18,9))"
        for i, d in enumerate(_DISC9)
    )
    return f"""
    WITH brute AS ({ORACLE["similarity_topk"]}),
    approx AS ({ORACLE["ann_topk"]}),
    ranked AS (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rk
        FROM approx
    ), hits AS (
        SELECT CASE rk {disc_case} END AS disc
        FROM ranked JOIN brute USING (vec_id)
    )
    SELECT CAST(10 AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           CAST(COALESCE(SUM(disc), CAST(0 AS DECIMAL(18,9))) AS DOUBLE)
               / CAST(CAST({_IDCG9} AS DECIMAL(18,9)) AS DOUBLE) AS ndcg_at_k
    FROM hits
    """


@register("ann_ndcg_report", _ann_ndcg_oracle())
def ann_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the hyperplane-LSH ANN against the brute-force exact
    top-10 (binary relevance: the exact set is "relevant"): position-
    sensitive complement to ``ann_recall_report`` — an ANN that finds
    the right vectors but ranks them low scores lower here.  Embeds the
    parents' oracles; log2 discounts are 9-dp literals summed as
    DECIMAL, so the metric is bit-stable across engines.

    100 TB shape: parents do the work; the metric is a 10x10 join."""
    from federated_gcn_spark.plans.queries import ann_topk_q, similarity_topk

    brute = similarity_topk(spark, sf_dir).select("vec_id")
    approx = ann_topk_q(spark, sf_dir)
    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    ranked = approx.select("vec_id", F.row_number().over(w).alias("rk"))
    disc = F.when(F.lit(False), F.lit(None))
    for i, d in enumerate(_DISC9):
        disc = disc.when(F.col("rk") == i + 1, F.lit(d).cast("decimal(18,9)"))
    hits = ranked.join(brute, "vec_id").select(disc.alias("disc"))
    return hits.agg(
        F.lit(10).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_overlap"),
        (
            F.coalesce(
                F.sum("disc"), F.lit("0").cast("decimal(18,9)")
            ).cast("double")
            / F.lit(_IDCG9).cast("decimal(18,9)").cast("double")
        ).alias("ndcg_at_k"),
    )


# ---------------------------------------------------------------------------
# Rich-club coefficient
# ---------------------------------------------------------------------------

@register(
    "rich_club_coefficient",
    """
    WITH ed AS (
        SELECT DISTINCT l_orderkey AS src, l_suppkey + 10000000 AS dst
        FROM lineitem WHERE l_orderkey % 20 = 0
    ), sym AS (
        SELECT src, dst FROM ed UNION SELECT dst AS src, src AS dst FROM ed
    ), deg AS (
        SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY src
    ), edeg AS (
        SELECT ds.d AS d_src, dd.d AS d_dst
        FROM ed JOIN deg ds ON ds.id = ed.src JOIN deg dd ON dd.id = ed.dst
    ), ks AS (
        SELECT UNNEST([2, 4, 8]) AS k
    ), nodes AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_rich
        FROM ks LEFT JOIN deg ON deg.d > ks.k GROUP BY k
    ), edges_k AS (
        SELECT k,
               CAST(COALESCE(SUM(CASE WHEN d_src > ks.k AND d_dst > ks.k
                                      THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS e_rich
        FROM ks LEFT JOIN edeg ON TRUE GROUP BY k
    )
    SELECT CAST(n.k AS BIGINT) AS k, n.n_rich, e.e_rich,
           CASE WHEN n.n_rich >= 2
                THEN CAST(2 * e.e_rich AS DOUBLE)
                     / CAST(n.n_rich * (n.n_rich - 1) AS DOUBLE)
           END AS phi
    FROM nodes n JOIN edges_k e ON e.k = n.k
    """,
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_{>k} / (N_{>k}(N_{>k}-1)) at
    k in {2,4,8} on the order→supplier bipartite sample: do high-degree
    vertices interconnect more than a complete graph would allow —
    the structural companion to ``degree_assortativity`` (Zhou &
    Mondragon 2004).

    100 TB shape: degrees are one groupBy; per-edge endpoint degrees
    are two id-keyed joins (the same joins modularity runs); the three
    thresholds are CONDITIONAL SUMS in one pass over the edge-degree
    table — no per-k rescan.  Integer counts, one guarded division."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    ed = (
        lineitem.where(F.col("l_orderkey") % 20 == 0)
        .select(
            F.col("l_orderkey").alias("src"),
            (F.col("l_suppkey") + 10_000_000).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # reused: sym/deg + edge-degree join
    )
    sym = ed.union(
        ed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    edeg = (
        ed.join(deg.select(F.col("id").alias("src"), F.col("d").alias("d_src")),
                "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")),
              "dst")
        .select("d_src", "d_dst")
    )
    ks = [2, 4, 8]
    n_agg = deg.agg(
        *[
            F.sum(F.when(F.col("d") > k, 1).otherwise(0))
            .cast("long")
            .alias(f"n{k}")
            for k in ks
        ]
    )
    e_agg = edeg.agg(
        *[
            F.sum(
                F.when((F.col("d_src") > k) & (F.col("d_dst") > k), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"e{k}")
            for k in ks
        ]
    )
    wide = n_agg.crossJoin(e_agg)
    stacked = wide.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"CAST({k} AS BIGINT), n{k}, e{k}" for k in ks)
            + ") AS (k, n_rich, e_rich)"
        )
    )
    return stacked.select(
        "k", "n_rich", "e_rich",
        F.when(
            F.col("n_rich") >= 2,
            (2 * F.col("e_rich")).cast("double")
            / (F.col("n_rich") * (F.col("n_rich") - 1)).cast("double"),
        ).alias("phi"),
    )
