"""Round-4 wave: entity resolution, resampling inference, temporal
point-in-time join, and ANN quality evaluation.

- ``part_entity_matches``: record linkage (entity resolution) by
  multi-attribute blocking + edit-distance verification — the standard
  dedup shape for dirty entity tables (Fellegi-Sunter blocking stage).
  Never all-pairs: candidate pairs exist only WITHIN (brand, type)
  blocks, the same asymptotics as the LSH/prefix-filter text dedups.
- ``bootstrap_revenue_ci``: Poisson(1)-weighted bootstrap confidence
  interval for mean order value.  The Poisson bootstrap IS the
  scale-safe bootstrap (resampling n rows WITH replacement needs global
  coordination; independent per-row Poisson weights need none — each
  row contributes to every replicate locally, one aggregate per
  replicate).  Weights are drawn by inverse-CDF on xxhash64 uniforms,
  so the DuckDB oracle replays every draw bit-for-bit.
- ``scd2_point_in_time_join``: probe events joined to the SCD2 state
  valid at their timestamp.  Spark spells it the scale-correct way —
  the union + per-key last(ignorenulls) window as-of (ONE hash exchange
  on the key, linear scan, no range join); the oracle uses the naive
  interval-predicate join — two INDEPENDENT spellings agreeing is the
  strongest form of the check.
- ``ann_recall_report``: recall@10 of the hyperplane-LSH ANN against
  the brute-force exact ranking — the evaluation harness every ANN
  deployment runs; both rankings are deterministic, so even the quality
  METRIC is hash-checked.  Embeds the parents' oracle texts (one source
  of truth).

Cross-engine determinism: edit distances and overlap counts are exact
integers; bootstrap replicate means and recall are single divisions of
identical values (see plans.queries module docstring for the rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.operators.stats import partitioned_prefix_sum
from federated_gcn_spark.plans.queries import ORACLE, register

# ---------------------------------------------------------------------------
# Record linkage: blocking + edit-distance verification
# ---------------------------------------------------------------------------

_MATCH_MAX_DIST = 2


@register(
    "part_entity_matches",
    f"""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_type = b.p_type
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= {_MATCH_MAX_DIST}
    """,
)
def part_entity_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate matches over the part catalog:
    clone contraction, then (brand, type) multi-attribute blocking with
    a length-band conjunct, then exact Levenshtein verification at
    distance <= {d} — the blocking-then-verify shape of every
    record-linkage pipeline (and of this repo's text dedups: candidates
    only within blocks, never all-pairs).

    100 TB shape (the round-4 fix for the measured x18-at-x10-data
    blowup): records are first CONTRACTED to distinct (brand, type,
    name) groups carrying their member-id arrays — the same move as
    :func:`operators.ppjoin.contract_exact_clones` — so the Levenshtein
    self-join runs on the DISTINCT-entity set, whose size grows with
    data diversity, not data volume.  Duplication-heavy growth (exact
    re-crawls, tiled benchmarks) leaves the join cost flat; only the
    final pair expansion — which is Θ(output) and therefore irreducible
    for an exact pair list — grows.  Within the join, the
    ``|len(a)-len(b)| <= {d}`` conjunct (a necessary condition for
    edit distance <= {d}) is evaluated before ``levenshtein``, pruning
    most of the block cross-product at integer-compare cost; both
    predicates are JVM codegen (no Python).  Intra-group pairs (exact
    clones, distance 0) are emitted by output-bound array expansion,
    never through the join.  Blocking recall is the usual caveat —
    records disagreeing on a blocking attribute are never compared;
    production stacks union several blocking passes, which is this same
    plan repeated with other keys.
    """.format(d=_MATCH_MAX_DIST)
    part = load_table(spark, sf_dir, "part", parallel=True)
    # Clone contraction: one row per distinct (brand, type, name) with the
    # sorted member-id list.  Bounded by catalog diversity; checkpointed
    # because three branches (join a/b sides + intra-group expansion)
    # consume it, and without the checkpoint each branch re-runs the scan.
    groups = (
        part.groupBy("p_brand", "p_type", "p_name")
        .agg(F.sort_array(F.collect_list("p_partkey")).alias("ids"))
        .localCheckpoint(eager=True)
    )
    a = groups.select(
        "p_brand",
        "p_type",
        F.col("p_name").alias("name_a"),
        F.col("ids").alias("ids_a"),
    )
    b = groups.select(
        "p_brand",
        "p_type",
        F.col("p_name").alias("name_b"),
        F.col("ids").alias("ids_b"),
    )
    matched = (
        a.join(b, ["p_brand", "p_type"])
        .where(F.col("name_a") < F.col("name_b"))
        .where(
            F.abs(F.length("name_a") - F.length("name_b")) <= _MATCH_MAX_DIST
        )
        .withColumn(
            "edit_dist",
            F.levenshtein("name_a", "name_b").cast("long"),
        )
        .where(F.col("edit_dist") <= _MATCH_MAX_DIST)
    )
    # Expand matched distinct-name pairs to member-id pairs, re-canonical-
    # izing (id_a < id_b) and swapping names to follow the ids.
    cross_pairs = (
        matched.select(
            "name_a", "name_b", "edit_dist", "ids_b",
            F.explode("ids_a").alias("x"),
        )
        .select(
            "name_a", "name_b", "edit_dist", "x",
            F.explode("ids_b").alias("y"),
        )
        .select(
            F.least("x", "y").alias("id_a"),
            F.greatest("x", "y").alias("id_b"),
            F.when(F.col("x") < F.col("y"), F.col("name_a"))
            .otherwise(F.col("name_b"))
            .alias("name_a"),
            F.when(F.col("x") < F.col("y"), F.col("name_b"))
            .otherwise(F.col("name_a"))
            .alias("name_b"),
            "edit_dist",
        )
    )
    # Exact clones: every intra-group pair has distance 0.  ids is sorted,
    # so pairing on array position keeps id_a < id_b without a comparison
    # against re-exploded values.
    intra_pairs = (
        groups.where(F.size("ids") >= 2)
        .select(F.col("p_name").alias("nm"), "ids")
        .select("nm", "ids", F.posexplode("ids").alias("i", "id_a"))
        .select(
            "id_a",
            F.explode(F.slice("ids", F.col("i") + 2, F.size("ids"))).alias(
                "id_b"
            ),
            F.col("nm").alias("name_a"),
            F.col("nm").alias("name_b"),
            F.lit(0).cast("long").alias("edit_dist"),
        )
        .select("id_a", "id_b", "name_a", "name_b", "edit_dist")
    )
    return cross_pairs.unionByName(intra_pairs)


# ---------------------------------------------------------------------------
# Poisson bootstrap CI
# ---------------------------------------------------------------------------

_BOOT_B = 32
_BOOT_P = 1_000_003
# cumulative Poisson(1) CDF: P(X <= k) for k = 0..7; u beyond the last
# entry draws weight 8 (prob ~1e-6)
_POIS_CDF = [
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253,
]


def _bootstrap_oracle() -> str:
    from federated_gcn_spark.plans.xxh64_sql import to_signed64, xxhash64_sql

    s = to_signed64(xxhash64_sql(("o_orderkey", "long"), ("b", "int")))
    w_case = " ".join(
        f"WHEN u < CAST({c!r} AS DOUBLE) THEN {k}"
        for k, c in enumerate(_POIS_CDF)
    )
    return f"""
    WITH o AS (
        SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ), pt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               SUM(cents) AS tot FROM o
    ), d AS (
        SELECT o.o_orderkey, o.cents, CAST(j.b AS INT) AS b,
               (((({s}) % {_BOOT_P}) + {_BOOT_P}) % {_BOOT_P} + 0.5)
                   / CAST({float(_BOOT_P)!r} AS DOUBLE) AS u
        FROM o CROSS JOIN (SELECT UNNEST(range({_BOOT_B})) AS b) j
    ), w AS (
        SELECT b, cents, CASE {w_case} ELSE 8 END AS wt FROM d
    ), reps AS (
        SELECT b, CAST(SUM(wt * cents) AS DOUBLE) / (100.0 * SUM(wt)) AS m
        FROM w GROUP BY b
    ), lo AS (
        SELECT MAX(m) AS ci_lo FROM (SELECT m FROM reps ORDER BY m LIMIT 2)
    ), hi AS (
        SELECT MIN(m) AS ci_hi FROM (SELECT m FROM reps ORDER BY m DESC LIMIT 2)
    )
    SELECT pt.n_orders,
           CAST(pt.tot AS DOUBLE) / (100.0 * pt.n_orders) AS mean_price,
           lo.ci_lo, hi.ci_hi
    FROM pt, lo, hi
    """


@register("bootstrap_revenue_ci", _bootstrap_oracle())
def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~94% bootstrap CI for mean order value via the Poisson bootstrap
    ({b} replicates; interval = 2nd smallest / 2nd largest replicate
    mean).  Each row draws an independent Poisson(1) weight per
    replicate from xxhash64(o_orderkey, b) by inverse CDF — no global
    resampling coordination, which is exactly why this is the bootstrap
    that works on 100 TB: the whole computation is one
    explode({b}) + groupBy(replicate) aggregate with map-side combine,
    and every draw is engine-replayable.

    Determinism: weights and cent sums are exact integers; each
    replicate mean is ONE double division of identical values, so the
    order statistics over the {b} means cannot diverge across engines.
    """.format(b=_BOOT_B)
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    # o feeds the point estimate and the replicate explode; reps feeds
    # both CI tails — staged once each -> one scan instead of three
    o = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    ).localCheckpoint(eager=False)
    pt = o.agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("tot")
    ).select(
        "n_orders",
        (F.col("tot").cast("double") / (100.0 * F.col("n_orders"))).alias(
            "mean_price"
        ),
    )
    slots = spark.range(_BOOT_B).select(F.col("id").cast("int").alias("b"))
    u = (
        F.pmod(F.xxhash64(F.col("o_orderkey"), F.col("b")), F.lit(_BOOT_P))
        + F.lit(0.5)
    ) / F.lit(float(_BOOT_P))
    wt = F.when(u < F.lit(_POIS_CDF[0]), 0)
    for k in range(1, len(_POIS_CDF)):
        wt = wt.when(u < F.lit(_POIS_CDF[k]), k)
    wt = wt.otherwise(8)
    reps = (
        o.crossJoin(F.broadcast(slots))
        .select("b", "cents", wt.alias("wt"))
        .groupBy("b")
        .agg(
            (
                F.sum(F.col("wt") * F.col("cents")).cast("double")
                / (F.lit(100.0) * F.sum("wt"))
            ).alias("m")
        )
        .localCheckpoint(eager=False)
    )
    lo = reps.orderBy("m").limit(2).agg(F.max("m").alias("ci_lo"))
    hi = reps.orderBy(F.desc("m")).limit(2).agg(F.min("m").alias("ci_hi"))
    return pt.crossJoin(lo).crossJoin(hi)


# ---------------------------------------------------------------------------
# SCD2 point-in-time join
# ---------------------------------------------------------------------------

@register(
    "scd2_point_in_time_join",
    """
    WITH t AS (
        SELECT user_id, event_type,
               epoch_ns(ts) // 1000000000 AS sec, event_id
        FROM events WHERE user_id < 10
    ), l AS (
        SELECT user_id, event_type, sec, event_id,
               CASE WHEN LAG(event_type) OVER
                        (PARTITION BY user_id ORDER BY sec, event_id)
                    IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        FROM t
    ), g AS (
        SELECT user_id, event_type, sec,
               SUM(chg) OVER (PARTITION BY user_id ORDER BY sec, event_id
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM l
    ), i AS (
        SELECT user_id, MIN(event_type) AS state, MIN(sec) AS valid_from
        FROM g GROUP BY user_id, grp
    ), scd AS (
        SELECT user_id, state, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY valid_from) AS valid_to
        FROM i
    ), probes AS (
        SELECT user_id, event_id, sec FROM t WHERE event_id % 3 = 0
    )
    SELECT CAST(p.user_id AS BIGINT) AS user_id,
           CAST(p.event_id AS BIGINT) AS event_id,
           CAST(p.sec AS BIGINT) AS sec,
           s.state AS state_at
    FROM probes p JOIN scd s
      ON s.user_id = p.user_id
     AND s.valid_from <= p.sec
     AND (s.valid_to IS NULL OR p.sec < s.valid_to)
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal validity) join: each probe event resolves
    the SCD2 state interval covering its timestamp — the lookup every
    feature store / ML training join needs to avoid label leakage
    ("the customer's state AS OF the order date, not today's").

    Spark plan: NOT the naive interval join (quadratic per key).  State
    transitions and probes union into one stream; a per-key window
    carries last(state ignorenulls) over (sec, is_probe, tiebreak)
    order; probes read the carried state — ONE hash exchange on the
    key + a linear within-partition scan, the asof_latest_update shape.
    The oracle intentionally uses the interval-predicate spelling: two
    independent formulations agreeing is a stronger check than a
    replay.  Empty intervals (equal-second state flips) are dropped on
    both sides — they cover no instant by the half-open [from, to)
    contract."""
    from federated_gcn_spark.operators.scd import build_scd2
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events")
    t = events.where(F.col("user_id") < 10).select(
        "user_id",
        "event_type",
        _event_epoch_sec(events).alias("sec"),
        "event_id",
    )
    scd = build_scd2(t, "user_id", "event_type", "sec", "event_id").where(
        F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from"))
    )
    updates = scd.select(
        "user_id",
        F.col("valid_from").alias("sec"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        "state",
    )
    probes = t.where(F.col("event_id") % 3 == 0).select(
        "user_id",
        "sec",
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = updates.unionByName(probes).withColumn(
        "state_at", F.last("state", ignorenulls=True).over(w)
    )
    return merged.where(F.col("is_probe") == 1).select(
        F.col("user_id").cast("long"),
        F.col("event_id").cast("long"),
        F.col("sec").cast("long"),
        "state_at",
    )


# ---------------------------------------------------------------------------
# ANN recall evaluation
# ---------------------------------------------------------------------------

def _ann_recall_oracle() -> str:
    return f"""
    WITH brute AS ({ORACLE["similarity_topk"]}),
    approx AS ({ORACLE["ann_topk"]})
    SELECT CAST(10 AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           COUNT(*) / 10.0 AS recall_at_k
    FROM approx a JOIN brute b USING (vec_id)
    """


@register("ann_recall_report", _ann_recall_oracle())
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the hyperplane-LSH ANN (ann_topk) against the exact
    brute-force ranking (similarity_topk) — the evaluation loop every
    ANN index ships with, as a one-row query.  Both rankings are
    deterministic (hash-replayable bucketing, exact cosine re-rank), so
    the recall METRIC itself is oracle-checked, not just eyeballed.
    The oracle embeds the parents' oracle texts — one source of truth.

    100 TB shape: the parents do the work; the comparison is a top-k x
    top-k join (constant size).  In production this runs over a sampled
    query batch — same plan with a sampled query side."""
    from federated_gcn_spark.plans.queries import ann_topk_q, similarity_topk

    brute = similarity_topk(spark, sf_dir).select("vec_id")
    approx = ann_topk_q(spark, sf_dir).select("vec_id")
    overlap = approx.join(brute, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap")
    )
    return overlap.select(
        F.lit(10).cast("long").alias("k"),
        "n_overlap",
        (F.col("n_overlap") / F.lit(10.0)).alias("recall_at_k"),
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (PAVA closed form)
# ---------------------------------------------------------------------------

@register(
    "isotonic_calibration",
    """
    WITH bins AS (
        SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS score_bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM lineitem GROUP BY score_bin
    ), cum AS (
        SELECT score_bin, n, pos,
               SUM(n) OVER (ORDER BY score_bin) AS cn,
               SUM(pos) OVER (ORDER BY score_bin) AS cp
        FROM bins
    ), blocks AS (
        SELECT j.score_bin AS jb, k.score_bin AS kb,
               CAST(k.cp - j.cp + j.pos AS DOUBLE)
                   / (k.cn - j.cn + j.n) AS m
        FROM cum j JOIN cum k ON j.score_bin <= k.score_bin
    ), inner_min AS (
        SELECT i.score_bin, b.jb, MIN(b.m) AS mn
        FROM cum i JOIN blocks b
          ON b.jb <= i.score_bin AND i.score_bin <= b.kb
        GROUP BY i.score_bin, b.jb
    ), iso AS (
        SELECT score_bin, MAX(mn) AS iso_rate FROM inner_min GROUP BY score_bin
    )
    SELECT c.score_bin, c.n, c.pos,
           CAST(c.pos AS DOUBLE) / c.n AS raw_rate,
           i.iso_rate
    FROM cum c JOIN iso i USING (score_bin)
    """,
)
def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (PAVA) calibration of the score_calibration
    bins, via the max-min CLOSED FORM: iso_i = max_{j<=i} min_{k>=i}
    mean(pos[j..k] / n[j..k]) — equivalent to pool-adjacent-violators
    but expressible as pure relational algebra (no sequential pooling
    loop), which is what makes it engine-replayable AND cluster-friendly.

    100 TB shape: the corpus-sized work is ONE groupBy into score bins;
    the closed form then runs on B bins (B is fixed by the binning, not
    the corpus — here ~8), so the O(B^3) block enumeration is constant
    work on broadcast-sized data.  Exactness: every block mean is a
    single division of exact integer sums — identical doubles in both
    engines — and min/max over identical doubles cannot diverge."""
    lineitem = load_table(spark, sf_dir, "lineitem", parallel=True)
    bins = (
        lineitem.select(
            F.floor(F.col("l_extendedprice") / 10000)
            .cast("long")
            .alias("score_bin"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .groupBy("score_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("pos"),
        )
    )
    w = Window.orderBy("score_bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = bins.select(
        "score_bin", "n", "pos",
        F.sum("n").over(w).alias("cn"),
        F.sum("pos").over(w).alias("cp"),
    ).localCheckpoint(eager=False)  # B rows; reused by 3 self-joins
    j = cum.select(
        F.col("score_bin").alias("jb"),
        F.col("cn").alias("jcn"), F.col("cp").alias("jcp"),
        F.col("n").alias("jn"), F.col("pos").alias("jpos"),
    )
    k = cum.select(
        F.col("score_bin").alias("kb"),
        F.col("cn").alias("kcn"), F.col("cp").alias("kcp"),
    )
    blocks = j.join(k, F.col("jb") <= F.col("kb")).select(
        "jb", "kb",
        (
            (F.col("kcp") - F.col("jcp") + F.col("jpos")).cast("double")
            / (F.col("kcn") - F.col("jcn") + F.col("jn"))
        ).alias("m"),
    )
    i = cum.select(F.col("score_bin").alias("ib"))
    inner_min = (
        blocks.join(
            i, (F.col("jb") <= F.col("ib")) & (F.col("ib") <= F.col("kb"))
        )
        .groupBy("ib", "jb")
        .agg(F.min("m").alias("mn"))
    )
    iso = inner_min.groupBy("ib").agg(F.max("mn").alias("iso_rate"))
    return cum.join(iso, cum["score_bin"] == iso["ib"]).select(
        "score_bin", "n", "pos",
        (F.col("pos").cast("double") / F.col("n")).alias("raw_rate"),
        "iso_rate",
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment lift
# ---------------------------------------------------------------------------

@register(
    "cuped_adjusted_lift",
    """
    WITH cust AS (
        SELECT o_custkey,
               o_custkey % 2 AS t,
               SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS x,
               SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                        ELSE 0 END) AS y
        FROM orders GROUP BY o_custkey
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(x AS DECIMAL(38,0))) AS sx,
               SUM(CAST(y AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        FROM cust
    ), th AS (
        SELECT n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
               (CAST(n * sxy - sx * sy AS DOUBLE)
                   * CAST(n * sxy - sx * sy AS DOUBLE))
                   / (CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE)) AS rho2
        FROM mom
    ), grp AS (
        SELECT t, CAST(COUNT(*) AS BIGINT) AS ng,
               SUM(CAST(x AS DECIMAL(38,0))) AS sxg,
               SUM(CAST(y AS DECIMAL(38,0))) AS syg
        FROM cust GROUP BY t
    ), wide AS (
        SELECT MAX(CASE WHEN t = 1 THEN CAST(syg AS DOUBLE) / ng END) AS my1,
               MAX(CASE WHEN t = 0 THEN CAST(syg AS DOUBLE) / ng END) AS my0,
               MAX(CASE WHEN t = 1 THEN CAST(sxg AS DOUBLE) / ng END) AS mx1,
               MAX(CASE WHEN t = 0 THEN CAST(sxg AS DOUBLE) / ng END) AS mx0
        FROM grp
    )
    SELECT th.n AS n_units,
           th.theta,
           (wide.my1 - wide.my0) / 100.0 AS lift_raw,
           ((wide.my1 - wide.my0) - th.theta * (wide.mx1 - wide.mx0)) / 100.0
               AS lift_cuped,
           th.rho2 AS var_reduction
    FROM th, wide
    """,
)
def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13 —
    the industry-standard A/B variance-reduction): pre-period spend (X,
    orders before 1998) regresses out of the outcome (Y, orders from
    1998 on); theta = cov(X,Y)/var(X) pooled, adjusted lift =
    raw lift - theta * (pre-period imbalance); rho^2 reports the
    variance fraction removed.  Assignment T = custkey parity (a stand-in
    hash randomization).

    100 TB shape: ONE customer-keyed aggregate reduces the fact table;
    moments and group sums are five algebraic aggregates (map-side
    combine).  Determinism: cents are integers, moment sums are exact
    DECIMAL(38,0), and every double is produced by the same fixed
    expression tree in both engines — single divisions of identical
    values (the Pearson-family pattern)."""
    orders = load_table(spark, sf_dir, "orders", parallel=True)
    cut = F.lit("1998-01-01").cast("timestamp")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < cut, cents).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("o_orderdate") >= cut, cents).otherwise(0)).alias("y"),
    ).select(
        (F.col("o_custkey") % 2).alias("t"),
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    ).localCheckpoint(eager=False)
    # cust feeds both the pooled moments and the per-arm sums; staged
    # once -> one customer-keyed fact aggregate instead of two
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    mom = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n")
    cnum = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    cdenx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cdeny = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    th = mom.select(
        n.alias("n_units"),
        (cnum / cdenx).alias("theta"),
        ((cnum * cnum) / (cdenx * cdeny)).alias("rho2"),
    )
    grp = cust.groupBy("t").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(dec("x")).alias("sxg"),
        F.sum(dec("y")).alias("syg"),
    )
    pick = lambda tv, cc: F.max(  # noqa: E731
        F.when(F.col("t") == tv, F.col(cc).cast("double") / F.col("ng"))
    )
    wide = grp.agg(
        pick(1, "syg").alias("my1"), pick(0, "syg").alias("my0"),
        pick(1, "sxg").alias("mx1"), pick(0, "sxg").alias("mx0"),
    )
    return th.crossJoin(wide).select(
        "n_units",
        "theta",
        ((F.col("my1") - F.col("my0")) / 100.0).alias("lift_raw"),
        (
            (
                (F.col("my1") - F.col("my0"))
                - F.col("theta") * (F.col("mx1") - F.col("mx0"))
            )
            / 100.0
        ).alias("lift_cuped"),
        F.col("rho2").alias("var_reduction"),
    )


# ---------------------------------------------------------------------------
# Split conformal prediction interval
# ---------------------------------------------------------------------------

def _conformal_oracle() -> str:
    from federated_gcn_spark.plans.xxh64_sql import to_signed64, xxhash64_sql

    s = to_signed64(
        xxhash64_sql(("l_orderkey", "long"), ("l_linenumber", "long"))
    )
    return f"""
    WITH li AS (
        SELECT CAST(l_quantity AS DOUBLE) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
               ((({s}) % 4) + 4) % 4 AS fold
        FROM lineitem
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(CAST(x AS BIGINT) AS DECIMAL(38,0))) AS sx,
               SUM(CAST(cents AS DECIMAL(38,0))) AS sy,
               SUM(CAST(CAST(x AS BIGINT) AS DECIMAL(38,0))
                   * CAST(x AS BIGINT)) AS sxx,
               SUM(CAST(CAST(x AS BIGINT) AS DECIMAL(38,0)) * cents) AS sxy
        FROM li WHERE fold < 2
    ), fit AS (
        SELECT n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
               (CAST(sy AS DOUBLE)
                - (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                   / n AS a
        FROM mom
    ), cal AS (
        SELECT ABS(cents * 100
                   - CAST(ROUND((fit.a + fit.b * li.x) * 100) AS BIGINT)) AS r
        FROM li, fit WHERE fold = 2
    ), hist AS (
        SELECT r, CAST(COUNT(*) AS BIGINT) AS c FROM cal GROUP BY r
    ), nc AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_cal FROM hist
    ), cum AS (
        SELECT r, CAST(SUM(c) OVER (ORDER BY r) AS BIGINT) AS cum_c FROM hist
    ), q AS (
        SELECT MIN(r) AS q_i4 FROM cum, nc
        WHERE cum_c >= (9 * (n_cal + 1) + 9) // 10
    ), tst AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN
                   ABS(cents * 100
                       - CAST(ROUND((fit.a + fit.b * li.x) * 100) AS BIGINT))
                       <= (SELECT q_i4 FROM q)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        FROM li, fit WHERE fold = 3
    )
    SELECT nc.n_cal, CAST(q.q_i4 AS DOUBLE) / 10000 AS q90_halfwidth,
           tst.n_test, tst.n_covered,
           CAST(tst.n_covered AS DOUBLE) / tst.n_test AS coverage
    FROM nc, q, tst
    """


@register("conformal_price_interval", _conformal_oracle())
def conformal_price_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction (Vovk; the distribution-free interval
    wrapper every ML deployment can bolt on): hash-fold the data
    (train 2/4, calibration 1/4, test 1/4), fit the linear
    quantity→price model on train, take the ceil(0.9*(n_cal+1))-th
    smallest absolute calibration residual as the interval half-width,
    and report empirical coverage on the held-out test fold — which is
    guaranteed >= 90% in expectation by exchangeability, no
    distributional assumption.

    100 TB shape: folds are hash labels (no shuffle to split); the fit
    is the decimal-moment OLS; residuals quantize to integer 1e-4
    dollars, so the calibration quantile is an exact selection over a
    VALUE-DOMAIN histogram + distributed prefix sum — never a
    TakeOrdered of rank ~0.9n, which would funnel O(rows) through one
    task at scale; coverage is a conditional count.  Determinism:
    residuals are integers built from one fixed double expression, fold
    draws replay through the xxh64 chain, quantile rank is integer
    arithmetic."""
    li = load_table(spark, sf_dir, "lineitem", parallel=True).select(
        F.col("l_quantity").cast("double").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        F.pmod(
            F.xxhash64(F.col("l_orderkey"), F.col("l_linenumber").cast("long")),
            F.lit(4),
        ).alias("fold"),
    ).localCheckpoint(eager=False)  # three folds read from one scan
    dec = lambda c: c.cast("bigint").cast("decimal(38,0)")  # noqa: E731
    mom = li.where(F.col("fold") < 2).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sy"),
        F.sum(dec(F.col("x")) * F.col("x").cast("bigint")).alias("sxx"),
        F.sum(dec(F.col("x")) * F.col("cents")).alias("sxy"),
    )
    n = F.col("n")
    b = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    ).cast("double")
    fit = mom.select(
        b.alias("b"),
        ((F.col("sy").cast("double") - b * F.col("sx").cast("double")) / n).alias("a"),
    )
    resid_i4 = F.abs(
        F.col("cents") * 100
        - F.round((F.col("a") + F.col("b") * F.col("x")) * 100).cast("long")
    )
    hist = (
        li.where(F.col("fold") == 2)
        .crossJoin(F.broadcast(fit))
        .groupBy(resid_i4.alias("r"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = partitioned_prefix_sum(hist, "r", "c", "cum_before")
    nc = cum.agg(F.sum("c").cast("long").alias("n_cal"))
    n_cal = nc.collect()[0]["n_cal"]
    k = (9 * (n_cal + 1) + 9) // 10  # ceil(0.9 * (n_cal + 1))
    q = cum.where(F.col("cum_before") + F.col("c") >= k).agg(
        F.min("r").alias("q_i4")
    )
    tst = (
        li.where(F.col("fold") == 3)
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(resid_i4 <= F.col("q_i4"), 1).otherwise(0)
            ).cast("long").alias("n_covered"),
        )
    )
    return (
        nc.crossJoin(q)
        .crossJoin(tst)
        .select(
            "n_cal",
            (F.col("q_i4").cast("double") / 10000).alias("q90_halfwidth"),
            "n_test",
            "n_covered",
            (F.col("n_covered").cast("double") / F.col("n_test")).alias(
                "coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Funnel latency: time-to-convert percentiles
# ---------------------------------------------------------------------------

@register(
    "time_to_convert_percentiles",
    """
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_ns(ts) // 1000000000 AS sec
        FROM events
    ), firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN sec END) AS fv,
               MIN(CASE WHEN event_type = 'purchase' THEN sec END) AS fp
        FROM ev GROUP BY user_id
    ), lagm AS (
        SELECT (fp - fv) // 60 AS lag_min
        FROM firsts WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
    ), hist AS (
        SELECT lag_min, CAST(COUNT(*) AS BIGINT) AS c FROM lagm GROUP BY lag_min
    ), cum AS (
        SELECT lag_min, c,
               CAST(SUM(c) OVER (ORDER BY lag_min) AS BIGINT) AS cum_c,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM hist
    )
    SELECT n AS n_converted,
           MIN(CASE WHEN cum_c >= (n + 1) // 2 THEN lag_min END) AS p50_min,
           MIN(CASE WHEN cum_c >= (9 * n + 9) // 10 THEN lag_min END) AS p90_min,
           MIN(CASE WHEN cum_c >= (99 * n + 99) // 100 THEN lag_min END)
               AS p99_min
    FROM cum GROUP BY n
    """,
)
def time_to_convert_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: exact p50/p90/p99 of first-view →
    first-purchase lag (minutes) across converting users — the
    time-dimension companion to funnel_conversion's step-count report.

    100 TB shape: ONE user-keyed conditional-min aggregate reduces the
    event stream; the lag distribution then lives as a value-domain
    histogram (lag MINUTES over the observation window — bounded by the
    calendar, not the corpus), so the cumulative window and the exact
    quantile selection run over a constant-sized table (the
    ship_lag_percentiles pattern).  Integer arithmetic end-to-end."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events", parallel=True)
    ev = events.select(
        "user_id", "event_type", _event_epoch_sec(events).alias("sec")
    )
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("sec"))).alias("fv"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("sec"))
        ).alias("fp"),
    )
    lagm = firsts.where(
        F.col("fv").isNotNull()
        & F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
    ).select(F.expr("(fp - fv) div 60").alias("lag_min"))
    hist = lagm.groupBy("lag_min").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("lag_min").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("lag_min").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = hist.select(
        "lag_min",
        F.sum("c").over(w_cum).cast("long").alias("cum_c"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    kth = lambda sql_rank: F.min(  # noqa: E731
        F.when(F.col("cum_c") >= F.expr(sql_rank), F.col("lag_min"))
    )
    return cum.groupBy("n").agg(
        kth("(n + 1) div 2").alias("p50_min"),
        kth("(9 * n + 9) div 10").alias("p90_min"),
        kth("(99 * n + 99) div 100").alias("p99_min"),
    ).select(
        F.col("n").alias("n_converted"), "p50_min", "p90_min", "p99_min"
    )
