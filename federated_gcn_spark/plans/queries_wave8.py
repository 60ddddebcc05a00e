"""Round-4 wave 8: sequential-pattern mining, cluster quality,
sketch-accuracy evaluation, and scorecard binning.

- ``sequence_support_pairs``: support of every ordered event-type pair
  "a happens, then b later" across users — the length-2 core of
  sequential-pattern mining (AprioriAll/PrefixSpan's first level),
  computed without enumerating subsequences: per-user (min, max) time
  per type decides containment.
- ``clustering_silhouette``: simplified silhouette (point-to-centroid
  form) per label over the embeddings — the standard "are these
  clusters real" score for the vector layer (nearest-centroid b-term,
  own-centroid a-term).
- ``hll_error_report`` / ``kmv_error_report``: estimated vs EXACT
  distinct counts with relative error — the accuracy harness every
  sketch deployment publishes; both the estimate (hash-replayed
  register/order-statistic state) and the exact side are
  deterministic, so the error itself is hash-checked.  Embed the
  parents' oracles.
- ``woe_iv_binning``: weight-of-evidence and information value of the
  binned price feature against the return flag — the credit-scoring /
  feature-screening staple (Siddiqi); ln terms are fixed double
  expressions of exact integer odds, IV is a 9-dp DECIMAL sum.

Cross-engine determinism: supports and bin counts are exact integers;
silhouette distances sum 12-dp-rounded squared terms as DECIMAL before
the one sqrt/compare; sketch errors divide two already-deterministic
numbers; WOE logs take identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.plans.queries import ORACLE, register


# ---------------------------------------------------------------------------
# Sequential pattern support (length-2)
# ---------------------------------------------------------------------------

@register(
    "sequence_support_pairs",
    """
    WITH t AS (
        SELECT user_id, event_type, epoch_ns(ts) // 1000000000 AS sec
        FROM events
    ), m AS (
        SELECT user_id, event_type, MIN(sec) AS mn, MAX(sec) AS mx
        FROM t GROUP BY user_id, event_type
    ), u AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM t
    )
    SELECT a.event_type AS first_type,
           b.event_type AS then_type,
           CAST(COUNT(*) AS BIGINT) AS n_supporting,
           CAST(COUNT(*) AS DOUBLE) / u.n_users AS support
    FROM m a JOIN m b
      ON a.user_id = b.user_id AND a.event_type <> b.event_type, u
    WHERE a.mn < b.mx
    GROUP BY a.event_type, b.event_type, u.n_users
    """,
)
def sequence_support_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support of ordered pairs "some a strictly before some b" per
    user — level-2 sequential-pattern mining (the AprioriAll seed set)
    WITHOUT subsequence enumeration: containment of the pattern (a, b)
    in a user's journey is exactly min_time(a) < max_time(b).

    100 TB shape: the journey reduces to a per-(user, type) min/max —
    one user_id exchange, map-side combinable — then the pair join is
    per-user |types|^2-bounded and co-partitioned on the SAME key (no
    second exchange).  Integer supports, one division by the distinct-
    user count."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events", parallel=True)
    # t feeds the journey reduction and the distinct-user count; m
    # feeds both pair sides — unstaged, events was scanned three times.
    # Two lazy checkpoints -> one scan.
    t = events.select(
        "user_id", "event_type", _event_epoch_sec(events).alias("sec")
    ).localCheckpoint(eager=False)
    m = t.groupBy("user_id", "event_type").agg(
        F.min("sec").alias("mn"), F.max("sec").alias("mx")
    ).localCheckpoint(eager=False)
    u = t.agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    a = m.select("user_id", F.col("event_type").alias("first_type"),
                 F.col("mn").alias("a_mn"))
    b = m.select("user_id", F.col("event_type").alias("then_type"),
                 F.col("mx").alias("b_mx"))
    pairs = (
        a.join(b, "user_id")
        .where(
            (F.col("first_type") != F.col("then_type"))
            & (F.col("a_mn") < F.col("b_mx"))
        )
        .groupBy("first_type", "then_type")
        .agg(F.count(F.lit(1)).alias("n_supporting"))
    )
    return pairs.crossJoin(F.broadcast(u)).select(
        "first_type", "then_type", "n_supporting",
        (F.col("n_supporting").cast("double") / F.col("n_users")).alias(
            "support"
        ),
    )


# ---------------------------------------------------------------------------
# Simplified silhouette over embeddings
# ---------------------------------------------------------------------------

@register(
    "clustering_silhouette",
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
        SELECT p.vec_id, p.own, c.clabel,
               CAST(SUM(CAST(ROUND((p.x - c.c) * (p.x - c.c), 12)
                             AS DECIMAL(30,12))) AS DOUBLE) AS dd
        FROM pts p JOIN cent c ON c.i = p.i
        GROUP BY p.vec_id, p.own, c.clabel
    ), ab AS (
        SELECT vec_id, own,
               SQRT(MAX(CASE WHEN clabel = own THEN dd END)) AS a,
               SQRT(MIN(CASE WHEN clabel <> own THEN dd END)) AS b
        FROM d2 GROUP BY vec_id, own
    ), s AS (
        SELECT own,
               CAST(ROUND(CASE WHEN GREATEST(a, b) > 0
                               THEN (b - a) / GREATEST(a, b) ELSE 0 END, 9)
                    AS DECIMAL(20,9)) AS sil
        FROM ab
    )
    SELECT CAST(own AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(sil) AS DOUBLE) / COUNT(*) AS mean_silhouette
    FROM s GROUP BY own
    """,
)
def clustering_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (point-to-centroid) silhouette per label: a = distance
    to the own-label centroid, b = distance to the nearest other
    centroid, s = (b-a)/max(a,b) — the cluster-quality score every
    clustering/labeling pipeline reports (the centroid form is the
    O(n·k) variant used at scale; full silhouette is O(n²)).

    100 TB shape: centroids are one (label, dim) aggregate; the k·d
    centroid table (640 cells here) BROADCASTS, so the n·k distance
    table needs no join exchange — just one groupBy on (vec, label);
    a/b then ride the same shuffle.  Determinism: embedding values are
    9-dp-quantized, centroid means are exact DECIMAL sums over one
    division, squared-diff terms are 12-dp DECIMAL sums, and sqrt/
    min/max over identical doubles cannot diverge."""
    emb = load_table(spark, sf_dir, "embeddings", parallel=True)
    # pts feeds the centroid aggregate and the distance join; staged
    # once -> one explode pass instead of two
    pts = emb.select(
        "vec_id",
        F.col("label").alias("own"),
        F.posexplode(F.col("embedding").cast("array<double>")),
    ).select(
        "vec_id", "own", F.col("pos").alias("i"),
        F.round("col", 9).alias("x"),
    ).localCheckpoint(eager=False)
    cent = pts.groupBy(F.col("own").alias("clabel"), "i").agg(
        (
            F.sum(F.col("x").cast("decimal(20,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("c")
    )
    d2 = (
        pts.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "own", "clabel")
        .agg(
            F.sum(
                F.round((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 12)
                .cast("decimal(30,12)")
            )
            .cast("double")
            .alias("dd")
        )
    )
    ab = d2.groupBy("vec_id", "own").agg(
        F.sqrt(F.max(F.when(F.col("clabel") == F.col("own"), F.col("dd"))))
        .alias("a"),
        F.sqrt(F.min(F.when(F.col("clabel") != F.col("own"), F.col("dd"))))
        .alias("b"),
    )
    sil = F.when(
        F.greatest("a", "b") > 0,
        (F.col("b") - F.col("a")) / F.greatest("a", "b"),
    ).otherwise(0.0)
    s = ab.select(
        "own", F.round(sil, 9).cast("decimal(20,9)").alias("sil")
    )
    return s.groupBy(F.col("own").cast("int").alias("label")).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.sum("sil").cast("double") / F.count(F.lit(1))).alias(
            "mean_silhouette"
        ),
    )


# ---------------------------------------------------------------------------
# Sketch-accuracy evaluation harnesses
# ---------------------------------------------------------------------------

_HLL_M = 128  # registers in the hll_replay parent (p=7)


def _hll_error_oracle() -> str:
    m = _HLL_M
    return f"""
    WITH est AS ({ORACLE["hll_replay_cardinality"]}),
    corr AS (
        SELECT event_type, est_distinct AS est_raw,
               CASE WHEN est_distinct <= 2.5 * {m}
                         AND {m} - nonzero_regs > 0
                    THEN ROUND({m} * LN(CAST({m} AS DOUBLE)
                                        / ({m} - nonzero_regs)), 2)
                    ELSE est_distinct END AS est_corrected
        FROM est
    ), ex AS (
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT corr.event_type, corr.est_raw, corr.est_corrected,
           ex.exact_distinct,
           (corr.est_corrected - ex.exact_distinct) / ex.exact_distinct
               AS rel_error
    FROM corr JOIN ex USING (event_type)
    """


@register("hll_error_report", _hll_error_oracle())
def hll_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL accuracy harness: the hash-replayed HyperLogLog estimate per
    event type — with Flajolet's small-range linear-counting correction
    (n <= 2.5m and empty registers: est = m·ln(m/zeros)), i.e. the full
    published estimator, which the raw-estimate parent deliberately
    omits — against the EXACT distinct-user count, with signed relative
    error (expected |error| ~ 1.04/sqrt(128) ~ 9% at p=7 in the raw
    regime, tighter under linear counting).  Embeds the parent's
    oracle; this harness is also what CAUGHT the raw estimate reading
    ~6x high at small cardinalities.

    100 TB shape: the estimate side is register-sized; the exact side
    is one distinct aggregate (the thing the sketch replaces — run at
    validation scale only, which is exactly what this query models)."""
    from federated_gcn_spark.operators.sketch import hll_replay

    m = _HLL_M
    est = hll_replay(
        load_table(spark, sf_dir, "events"), "user_id", "event_type"
    ).select(
        "event_type",
        F.col("est_distinct").alias("est_raw"),
        F.when(
            (F.col("est_distinct") <= 2.5 * m)
            & (F.lit(m) - F.col("nonzero_regs") > 0),
            F.round(
                m
                * F.log(
                    F.lit(float(m)) / (F.lit(m) - F.col("nonzero_regs"))
                ),
                2,
            ),
        )
        .otherwise(F.col("est_distinct"))
        .alias("est_corrected"),
    )
    events = load_table(spark, sf_dir, "events")
    ex = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.join(ex, "event_type").select(
        "event_type", "est_raw", "est_corrected", "exact_distinct",
        (
            (F.col("est_corrected") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_error"),
    )


def _kmv_error_oracle() -> str:
    return f"""
    WITH est AS ({ORACLE["kmv_distinct"]}),
    ex AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events
    )
    SELECT est.k_actual, est.est_distinct, ex.exact_distinct,
           (est.est_distinct - ex.exact_distinct) / ex.exact_distinct
               AS rel_error
    FROM est, ex
    """


@register("kmv_error_report", _kmv_error_oracle())
def kmv_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV accuracy harness: the k-minimum-values distinct-user
    estimate against the exact count with signed relative error (the
    KMV twin of ``hll_error_report``; expected |error| ~ 1/sqrt(k-2) ~
    18% at k=32).  Embeds the parent's oracle."""
    from federated_gcn_spark.operators.sketch import kmv_kth

    events = load_table(spark, sf_dir, "events")
    est = kmv_kth(events, "user_id", k=32).select("k_actual", "est_distinct")
    ex = events.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "k_actual", "est_distinct", "exact_distinct",
        (
            (F.col("est_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# Weight of evidence + information value
# ---------------------------------------------------------------------------

@register(
    "woe_iv_binning",
    """
    WITH li AS (
        SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS score_bin,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), bins AS (
        SELECT score_bin,
               CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(y) AS BIGINT) AS pos_k,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg_k
        FROM li GROUP BY score_bin
    ), tot AS (
        SELECT CAST(SUM(pos_k) AS BIGINT) AS pos,
               CAST(SUM(neg_k) AS BIGINT) AS neg
        FROM bins
    ), w AS (
        SELECT b.score_bin, b.n_k, b.pos_k, b.neg_k,
               LN(CAST(b.pos_k * t.neg AS DOUBLE)
                  / CAST(b.neg_k * t.pos AS DOUBLE)) AS woe_raw,
               CAST(ROUND((CAST(b.pos_k AS DOUBLE) / t.pos
                           - CAST(b.neg_k AS DOUBLE) / t.neg)
                          * LN(CAST(b.pos_k * t.neg AS DOUBLE)
                               / CAST(b.neg_k * t.pos AS DOUBLE)), 9)
                    AS DECIMAL(20,9)) AS iv_term
        FROM bins b, tot t
        WHERE b.pos_k > 0 AND b.neg_k > 0
    )
    SELECT score_bin, n_k, pos_k, neg_k,
           ROUND(woe_raw, 6) AS woe,
           CAST(SUM(iv_term) OVER () AS DOUBLE) AS information_value
    FROM w
    """,
)
def woe_iv_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence per price bin against the return flag, plus
    the feature's total information value (Siddiqi's scorecard recipe:
    WOE_k = ln((pos_k/POS)/(neg_k/NEG)), IV = sum (pos_k/POS -
    neg_k/NEG)·WOE_k) — the feature-screening staple of risk modeling
    (IV < 0.02 useless, > 0.3 strong).

    100 TB shape: ONE binning groupBy (map-side combinable), then
    constant-sized bin algebra; zero-count bins are excluded (the
    standard practice — production merges them into neighbors).
    Determinism: WOE's log takes a single division of exact integer
    products; IV terms are 9-dp rounded and DECIMAL-summed over the
    bounded bin table."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    bins = (
        lineitem.select(
            F.floor(F.col("l_extendedprice") / 10000).cast("long").alias(
                "score_bin"
            ),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).alias("n_k"),
            F.sum("y").cast("long").alias("pos_k"),
            (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg_k"),
        )
        # bins feeds both the totals and the WOE pass; staged once ->
        # one fact aggregate instead of two
        .localCheckpoint(eager=False)
    )
    tot = bins.agg(
        F.sum("pos_k").cast("long").alias("pos"),
        F.sum("neg_k").cast("long").alias("neg"),
    )
    woe_raw = F.log(
        (F.col("pos_k") * F.col("neg")).cast("double")
        / (F.col("neg_k") * F.col("pos")).cast("double")
    )
    w = (
        bins.crossJoin(F.broadcast(tot))
        .where((F.col("pos_k") > 0) & (F.col("neg_k") > 0))
        .select(
            "score_bin", "n_k", "pos_k", "neg_k",
            woe_raw.alias("woe_raw"),
            F.round(
                (
                    F.col("pos_k").cast("double") / F.col("pos")
                    - F.col("neg_k").cast("double") / F.col("neg")
                )
                * woe_raw,
                9,
            )
            .cast("decimal(20,9)")
            .alias("iv_term"),
        )
    )
    w_all = Window.partitionBy()
    return w.select(
        "score_bin", "n_k", "pos_k", "neg_k",
        F.round("woe_raw", 6).alias("woe"),
        F.sum("iv_term").over(w_all).cast("double").alias("information_value"),
    )
