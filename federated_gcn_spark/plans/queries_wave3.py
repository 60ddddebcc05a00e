"""Round-3 third wave: exact similarity join, k-truss, postings, robust stats.

- ``set_similarity_pairs``: EXACT set-similarity self-join (PPJoin-style
  prefix filtering, operators/ppjoin.py) over 3-token-shingle sets — the
  zero-false-negative counterpart to the MinHash LSH band join; finds the
  planted near-duplicate pairs with no recall caveat.
- ``ktruss_supersteps``: k-truss decomposition peel trace (graph/truss.py)
  over the part co-purchase graph — the cohesive-subgraph refinement one
  notch above k-core; the oracle replays every peel round unrolled.
- ``postings_index``: positional inverted index (term → document postings
  with in-document positions) — the materialization that backs BM25 /
  phrase search; posexplode + ordered positional aggregation.
- ``winsorized_price_stats``: robust moments after winsorizing at the
  exact p5/p95 order statistics — bounds located by the two-pass
  histogram selection (operators/stats.exact_kth_smallest_value), never
  a global sort.

All follow the cross-engine determinism rules in plans.queries.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.functions.text import tokens, word_ngrams
from federated_gcn_spark.plans.queries import register


# ---------------------------------------------------------------------------
# Exact set-similarity join (prefix filter)
# ---------------------------------------------------------------------------

@register(
    "set_similarity_pairs",
    r"""
    WITH d AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, len(toks) - 1),
                   i -> array_to_string(toks[i:i+2], ' '))) AS elems
        FROM (
            SELECT doc_id,
                   string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
            FROM documents WHERE TRIM(text) <> ''
        ) WHERE len(toks) >= 3
    ), tok AS (
        SELECT doc_id, UNNEST(elems) AS elem FROM d
    ), dfc AS (
        SELECT elem, COUNT(*) AS df FROM tok GROUP BY elem
    ), ordered AS (
        SELECT doc_id,
               array_agg(elem ORDER BY df, elem) AS sorted_elems,
               COUNT(*) AS sz
        FROM tok JOIN dfc USING (elem) GROUP BY doc_id
    ), pref AS (
        SELECT doc_id, sz,
               UNNEST(sorted_elems[1:(sz - CAST(CEIL(0.5 * sz) AS INT) + 1)])
                   AS elem
        FROM ordered
    ), cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pref a JOIN pref b
          ON a.elem = b.elem AND a.doc_id < b.doc_id
        WHERE LEAST(a.sz, b.sz) >= 0.5 * GREATEST(a.sz, b.sz)
    ), ver AS (
        SELECT id_a, id_b,
               len(list_intersect(x.elems, y.elems)) AS inter,
               len(x.elems) AS n_a, len(y.elems) AS n_b
        FROM cand JOIN d x ON id_a = x.doc_id JOIN d y ON id_b = y.doc_id
    )
    SELECT id_a, id_b,
           CAST(inter AS BIGINT) AS inter,
           CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           ROUND(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
    FROM ver
    WHERE inter / CAST(n_a + n_b - inter AS DOUBLE) >= 0.5
    """,
)
def set_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.5 document pairs over distinct 3-token
    shingles via the prefix-filtered set-similarity join
    (operators/ppjoin.set_similarity_join). Unlike the MinHash band join
    this misses NOTHING — and still never goes all-pairs: candidates
    come from an equi-join on each set's globally rarest shingles.

    Output contract: the pair LIST itself is Θ(duplication²) — a clone
    group of m near-identical docs legitimately contains C(m,2)
    qualifying pairs, so on duplication-heavy corpora the output (not
    the candidate generation, which stays prefix-bounded) dominates.
    Bulk dedup/clustering consumers must NOT consume this list; they
    route through exact_dedup_clusters, which contracts exact clone
    groups first (operators/ppjoin.contract_exact_clones) and stays
    linear in |distinct duplicated sets|.  Consumers who need ANSWERS
    rather than the pair list have bounded exact twins: per-record
    top-k (set_similarity_topk query / operators/ppjoin.py) and
    per-record neighbor counts (set_similarity_counts query) — both
    Θ(N·k) / Θ(N) regardless of duplication.

    The escape hatch is now also GUARDED: the default ``max_pairs``
    ceiling makes the join fail fast (PairListOverflowError, naming the
    bounded twins) when the clone-pair lower bound alone would exceed
    10M pairs — at 100 TB a skewed near-dup corpus aborts in one linear
    pre-flight aggregate instead of OOMing the candidate shuffle."""
    from federated_gcn_spark.operators.ppjoin import set_similarity_join

    docs = load_table(spark, sf_dir, "documents", parallel=True)
    sets = docs.where(F.trim("text") != "").select(
        "doc_id",
        F.array_distinct(word_ngrams(F.lower(F.col("text")), 3)).alias("elems"),
    )
    pairs = set_similarity_join(sets, "doc_id", "elems", threshold=0.5)
    return pairs.select(
        F.col("id_a"), F.col("id_b"), "inter", "n_a", "n_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# k-truss peel trace (unrolled oracle)
# ---------------------------------------------------------------------------

_KTRUSS_K = 5
_KTRUSS_ROUNDS = 9


def _ktruss_oracle(k: int, rounds: int) -> str:
    """Unrolled SQL replay of the fixed-round truss peel: each round
    re-enumerates triangles (id-ordered 3-way self-join), aggregates
    per-edge support, and keeps support >= k-2. Reaches the sf0.01
    fixpoint (8 rounds) with one spare round; extra rounds peel a
    fixpoint and are the identity, matching ktruss_trace's fill."""
    parts = [
        """e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE a.l_orderkey % 3 = 0 AND b.l_orderkey % 3 = 0
    )"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(
            f"""tri{i} AS MATERIALIZED (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e{p} e1
        JOIN e{p} e2 ON e2.a = e1.b
        JOIN e{p} e3 ON e3.a = e1.a AND e3.b = e2.b
    ), supp{i} AS MATERIALIZED (
        SELECT a, b, COUNT(*) AS s FROM (
            SELECT x AS a, y AS b FROM tri{i}
            UNION ALL SELECT x AS a, z AS b FROM tri{i}
            UNION ALL SELECT y AS a, z AS b FROM tri{i}
        ) GROUP BY a, b
    ), e{i} AS MATERIALIZED (
        SELECT e.a, e.b FROM e{p} e JOIN supp{i} USING (a, b)
        WHERE s >= {k - 2}
    )"""
        )
    selects = "\nUNION ALL ".join(
        f"SELECT {i} AS round,"
        f" CAST((SELECT COUNT(*) FROM e{i}) AS BIGINT) AS n_edges"
        for i in range(rounds + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


@register("ktruss_supersteps", _ktruss_oracle(_KTRUSS_K, _KTRUSS_ROUNDS))
def ktruss_supersteps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-truss peel trace (round, surviving edges) on the part
    co-purchase graph (parts sharing an order, 1-in-3 order sample).
    Per round: degree-oriented triangle enumeration -> per-edge support
    -> drop support < 3; graph/truss.ktruss_trace."""
    from federated_gcn_spark.graph.truss import ktruss_trace

    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_orderkey") % 3) == 0)
        .select("l_orderkey", "l_partkey")
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
    )
    return ktruss_trace(spark, edges, _KTRUSS_K, _KTRUSS_ROUNDS)


# ---------------------------------------------------------------------------
# Positional inverted index
# ---------------------------------------------------------------------------

@register(
    "postings_index",
    r"""
    WITH d AS (
        SELECT doc_id,
               string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
        FROM documents WHERE TRIM(text) <> ''
    ), t AS (
        SELECT doc_id,
               UNNEST(range(1, len(toks) + 1)) AS pos,
               UNNEST(toks) AS term
        FROM d
    )
    SELECT term, doc_id,
           CAST(COUNT(*) AS BIGINT) AS tf,
           array_to_string(array_agg(pos ORDER BY pos), ',') AS positions
    FROM t GROUP BY term, doc_id HAVING COUNT(*) >= 3
    """,
)
def postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index: per (term, document) the term
    frequency and ordered 1-based in-document positions (the postings
    materialization behind bm25_search / phrase queries). posexplode is
    a codegen generate; the postings build is ONE groupBy on
    (term, doc_id) — map-side combinable, skew bounded because the key
    includes doc_id (a stop-word's postings spread over its documents,
    never one reducer). tf >= 3 keeps the declared result bounded."""
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    t = docs.where(F.trim("text") != "").select(
        "doc_id",
        F.posexplode(tokens(F.lower(F.col("text")))).alias("pos", "term"),
    )
    return (
        t.groupBy("term", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("pos") + 1))
            ).alias("positions"),
        )
        .where(F.col("tf") >= 3)
    )


# ---------------------------------------------------------------------------
# Winsorized robust moments at exact order-statistic bounds
# ---------------------------------------------------------------------------

@register(
    "winsorized_price_stats",
    """
    WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
    n AS (SELECT COUNT(*) AS n FROM v),
    lo AS (
        SELECT x AS lo FROM v ORDER BY x
        LIMIT 1 OFFSET (SELECT CAST(CEIL(0.05 * n) AS BIGINT) - 1 FROM n)
    ),
    hi AS (
        SELECT x AS hi FROM v ORDER BY x
        LIMIT 1 OFFSET (SELECT CAST(CEIL(0.95 * n) AS BIGINT) - 1 FROM n)
    ),
    w AS (
        SELECT GREATEST(lo, LEAST(hi, x)) AS wx, x, lo, hi
        FROM v, lo, hi
    )
    SELECT ROUND(MIN(lo), 2) AS lo_bound,
           ROUND(MIN(hi), 2) AS hi_bound,
           ROUND(AVG(wx), 4) AS w_mean,
           ROUND(STDDEV_SAMP(wx), 4) AS w_sd,
           CAST(SUM(CASE WHEN x < lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_lo,
           CAST(SUM(CASE WHEN x > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_hi
    FROM w
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean/stddev of l_extendedprice, clamped at the exact
    5th/95th-percentile ORDER-STATISTIC values. The bounds come from
    operators/stats.exact_kth_smallest_value — two scans plus one
    micro-sort of a single histogram bucket, never a global sort — and
    the clamped moments are one algebraic aggregate. The bounds are
    actual data values, so both engines clamp at bit-identical points;
    only the final avg/stddev carry FP accumulation (rounded)."""
    from federated_gcn_spark.operators.stats import exact_quantile_values

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    n = li.count()
    k_lo = int(math.ceil(0.05 * n))
    k_hi = int(math.ceil(0.95 * n))
    # one shared two-pass selection for both bounds (identical values;
    # the sequential per-k spelling paid twice the driver jobs)
    cuts = exact_quantile_values(li, "x", [k_lo, k_hi])
    lo = float(cuts[k_lo])
    hi = float(cuts[k_hi])
    wx = F.greatest(F.lit(lo), F.least(F.lit(hi), F.col("x")))
    return li.agg(
        F.round(F.lit(lo), 2).alias("lo_bound"),
        F.round(F.lit(hi), 2).alias("hi_bound"),
        F.round(F.avg(wx), 4).alias("w_mean"),
        F.round(F.stddev_samp(wx), 4).alias("w_sd"),
        F.sum(F.when(F.col("x") < lo, 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_lo"),
        F.sum(F.when(F.col("x") > hi, 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_hi"),
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram at exact multi-quantile cutpoints
# ---------------------------------------------------------------------------

_EQUIDEPTH_ORACLE = """
    WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
    n AS (SELECT COUNT(*) AS n FROM v),
    {cuts}
    b AS (
        SELECT x,
               CAST(1 {cases} AS INT) AS bucket
        FROM v
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS min_x,
           MAX(x) AS max_x
    FROM b GROUP BY bucket
""".format(
    cuts="\n    ".join(
        f"c{i} AS (SELECT x AS c FROM v ORDER BY x LIMIT 1 OFFSET"
        f" (SELECT CAST(CEIL({i} * n / 8.0) AS BIGINT) - 1 FROM n)),"
        for i in range(1, 8)
    ),
    cases="".join(
        f" + (CASE WHEN x > (SELECT c FROM c{i}) THEN 1 ELSE 0 END)"
        for i in range(1, 8)
    ),
)


@register("equidepth_price_buckets", _EQUIDEPTH_ORACLE)
def equidepth_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bucket equi-depth histogram of l_extendedprice with EXACT
    boundaries. All seven cutpoints come from ONE shared two-pass
    histogram selection (operators/stats.exact_quantile_values — two
    scans + one micro-sort total, never a global sort, flat in the
    number of cutpoints); bucket assignment is then a codegen CASE
    chain against seven literal data values, so ties at a boundary land
    deterministically in the same bucket on any engine or layout."""
    from federated_gcn_spark.operators.stats import exact_quantile_values

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    n = li.count()
    ks = [int(math.ceil(i * n / 8)) for i in range(1, 8)]
    cuts = exact_quantile_values(li, "x", ks)
    bucket = F.lit(1)
    for k in ks:
        bucket = bucket + F.when(F.col("x") > float(cuts[k]), 1).otherwise(0)
    return (
        li.groupBy(bucket.cast("int").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance weights
# ---------------------------------------------------------------------------

def _dsir_oracle(n_buckets: int) -> str:
    from federated_gcn_spark.plans.xxh64_sql import (
        hash_string_sql,
        pmod_sql,
    )

    bucket = pmod_sql(hash_string_sql("token", "42"), n_buckets)
    return rf"""
    WITH d AS (
        SELECT doc_id, lang,
               string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
        FROM documents WHERE TRIM(text) <> ''
    ), tok AS (
        SELECT doc_id, lang, UNNEST(toks) AS token FROM d
    ), tb AS (
        SELECT doc_id, lang, {bucket} AS bucket FROM tok
    ), raw AS (
        SELECT bucket, COUNT(*) AS cr FROM tb GROUP BY bucket
    ), tgt AS (
        SELECT bucket, COUNT(*) AS ct FROM tb WHERE lang = 'en'
        GROUP BY bucket
    ), tot AS (
        SELECT (SELECT COUNT(*) FROM tb) AS nr,
               (SELECT COUNT(*) FROM tb WHERE lang = 'en') AS nt
    ), lr AS (
        SELECT raw.bucket,
               LN((COALESCE(ct, 0) + 1) / CAST(nt + {n_buckets} AS DOUBLE))
             - LN((cr + 1) / CAST(nr + {n_buckets} AS DOUBLE)) AS logratio
        FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tot
    )
    SELECT tb.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(logratio), 6) AS log_w
    FROM tb JOIN lr ON tb.bucket = lr.bucket
    GROUP BY tb.doc_id
    """


_DSIR_BUCKETS = 1024


@register("dsir_importance_logweights", _dsir_oracle(_DSIR_BUCKETS))
def dsir_importance_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    hash every token into 1024 buckets, fit add-one-smoothed unigram
    bucket distributions for the TARGET slice (lang='en') and the RAW
    corpus, and score each document with sum_t log(p_tgt/p_raw) — the
    log importance weight that resamples raw data toward the target.

    Scale shape: the bucket tables are n_buckets rows regardless of
    corpus size — they ride as broadcast joins; the only big exchanges
    are the tokenize explode and the per-doc sum, both keyed on doc_id.
    The hash is Spark's xxhash64, replayed bit-exactly by the oracle
    (plans/xxh64_sql), so bucket assignment is layout- and
    engine-independent; only the final log-sum carries FP (rounded)."""
    from federated_gcn_spark.operators.quality import dsir_log_weights

    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim("text") != ""
    )
    tok = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_target"),
        F.explode(tokens(F.lower(F.col("text")))).alias("token"),
    )
    return dsir_log_weights(tok, n_buckets=_DSIR_BUCKETS)


# ---------------------------------------------------------------------------
# Cross-doc duplicated-span REMOVAL (the fix half of exact-substring dedup)
# ---------------------------------------------------------------------------

@register(
    "dup_span_removal",
    r"""
    WITH d AS (
        SELECT doc_id,
               string_split_regex(LOWER(TRIM(text)), '\s+') AS toks
        FROM documents WHERE TRIM(text) <> ''
    ), sh AS (
        SELECT doc_id,
               UNNEST(range(1, len(toks) - 6)) AS start,
               UNNEST(list_transform(
                   range(1, len(toks) - 6),
                   i -> array_to_string(toks[i:i+7], ' '))) AS shingle
        FROM d WHERE len(toks) >= 8
    ), dup AS (
        SELECT shingle FROM sh
        GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
    ), cov AS (
        SELECT DISTINCT sh.doc_id, UNNEST(range(start, start + 8)) AS pos
        FROM sh JOIN dup USING (shingle)
    ), tokpos AS (
        SELECT doc_id,
               UNNEST(range(1, len(toks) + 1)) AS pos,
               UNNEST(toks) AS tok
        FROM d
    ), kept AS (
        SELECT t.doc_id, t.pos, t.tok FROM tokpos t
        WHERE NOT EXISTS (
            SELECT 1 FROM cov c
            WHERE c.doc_id = t.doc_id AND c.pos = t.pos
        )
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               array_to_string(array_agg(tok ORDER BY pos), ' ')
                   AS cleaned_text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(cleaned_text, '') AS cleaned_text
    FROM d LEFT JOIN agg USING (doc_id)
    """,
)
def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, the REMOVAL half (Lee et al. 2022 §4.1 —
    duplicated_span_fraction is the detection half): drop every token
    covered by an 8-token shingle that occurs in >= 2 distinct
    documents, and rebuild the cleaned text from the survivors.

    Scale shape: coverage is 8 rows per duplicated-shingle occurrence
    (bounded, proportional to |duplication| not |corpus|); the kill
    list meets the token table in a left_anti equi-join on
    (doc_id, pos); the rebuild is one groupBy(doc_id) whose per-group
    sort is an in-row array_sort over that document's own tokens."""
    docs = load_table(spark, sf_dir, "documents", parallel=True).where(
        F.trim("text") != ""
    )
    base = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    ).localCheckpoint(eager=False)
    tokpos = base.select(
        "doc_id", F.posexplode("toks").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    sh = base.where(F.size("toks") >= 8).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - F.lit(7)),
                lambda i: F.concat_ws(" ", F.slice("toks", i, 8)),
            )
        ).alias("start0", "shingle"),
    )
    dup = (
        sh.groupBy("shingle")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("shingle")
    )
    cov = (
        sh.join(dup, "shingle")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start0") + 1, F.col("start0") + 8)
            ).alias("pos"),
        )
        .distinct()
    )
    kept = tokpos.join(cov, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))),
            lambda s: s["tok"],
        ).alias("toks_kept"),
    )
    return (
        base.select("doc_id", F.size("toks").alias("n_tokens"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(
                F.concat_ws(" ", "toks_kept"), F.lit("")
            ).alias("cleaned_text"),
        )
    )


# ---------------------------------------------------------------------------
# Trending event types: trailing-window z-scores
# ---------------------------------------------------------------------------

@register(
    "trending_event_types",
    """
    WITH e AS (
        SELECT event_type,
               (epoch_ns(ts) // 1000000000) // 86400 AS day
        FROM events
    ), daily AS (
        SELECT event_type, day, COUNT(*) AS n
        FROM e GROUP BY event_type, day
    ), z AS (
        SELECT event_type, day, n,
               COUNT(*) OVER w AS n_trail,
               AVG(n) OVER w AS mu,
               STDDEV_SAMP(n) OVER w AS sd
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type,
           CAST(day AS BIGINT) AS day,
           CAST(n AS BIGINT) AS n,
           ROUND((n - mu) / sd, 6) AS zscore
    FROM z WHERE n_trail = 7 AND sd > 0
    """,
)
def trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily volume z-scores against the trailing 7
    OBSERVED days (anomaly/trend detection on event streams). One
    groupBy to daily counts — the expensive exchange — then a window
    partitioned by event_type (thousands of frames in parallel, frame
    depth fixed at 7, never an unpartitioned window)."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.withColumn("sec", _event_epoch_sec(events))
        .withColumn("day", F.expr("sec div 86400"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    return (
        daily.select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            F.col("n").cast("long").alias("n"),
            F.count(F.lit(1)).over(w).alias("n_trail"),
            F.avg("n").over(w).alias("mu"),
            F.stddev_samp("n").over(w).alias("sd"),
        )
        .where((F.col("n_trail") == 7) & (F.col("sd") > 0))
        .select(
            "event_type",
            "day",
            "n",
            F.round((F.col("n") - F.col("mu")) / F.col("sd"), 6).alias(
                "zscore"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Event-sequence Markov transition matrix
# ---------------------------------------------------------------------------

@register(
    "event_transition_matrix",
    """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               (epoch_ns(ts) // 1000000000) AS sec
        FROM events
    ), seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY sec, event_id
               ) AS to_type
        FROM e
    ), pairs AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ), tot AS (
        SELECT from_type, SUM(n) AS n_from FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type,
           CAST(p.n AS BIGINT) AS n,
           ROUND(p.n / CAST(t.n_from AS DOUBLE), 6) AS prob
    FROM pairs p JOIN tot t USING (from_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    timeline (the sequence-mining statistic behind funnel design and
    next-event prediction): consecutive event pairs via LEAD inside a
    user-partitioned window (unique (sec, event_id) tiebreak — the
    cross-engine determinism rule for window order), then one
    (from, to) count aggregate; row-normalizing totals are
    |event_types| rows and ride a broadcast join."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", "event_id", "event_type",
        _event_epoch_sec(events).alias("sec"),
    )
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    # pairs feeds both the row-normalizing totals and the emit; staged
    # once -> one user-window pass over the fact instead of two
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=False)
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("n_from").cast("double"), 6).alias("prob"),
    )


# ---------------------------------------------------------------------------
# Cohort retention matrix
# ---------------------------------------------------------------------------

@register(
    "cohort_retention_matrix",
    """
    WITH e AS (
        SELECT user_id,
               (epoch_ns(ts) // 1000000000) // 86400 AS day
        FROM events
    ), first_seen AS (
        SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               (e.day - f.cohort_day) // 7 AS week_offset
        FROM e JOIN first_seen f USING (user_id)
    ), cohort_size AS (
        SELECT cohort_day, COUNT(*) AS n_users
        FROM first_seen GROUP BY cohort_day
    )
    SELECT a.cohort_day AS cohort_day,
           CAST(a.week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           ROUND(COUNT(*) / CAST(s.n_users AS DOUBLE), 6) AS retention
    FROM activity a JOIN cohort_size s USING (cohort_day)
    GROUP BY a.cohort_day, a.week_offset, s.n_users
    """,
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort analysis: users grouped by first-seen day, one
    cell per (cohort, week offset) with the share of the cohort still
    active. Two exchanges — the first-seen groupBy and the distinct
    per-(user, week) activity — both keyed on user_id so they reuse one
    partitioning; cohort sizes are |cohorts| rows on a broadcast."""
    from federated_gcn_spark.plans.queries import _event_epoch_sec

    events = load_table(spark, sf_dir, "events")
    # e feeds the first-seen aggregate and the activity join;
    # first_seen feeds the join and the cohort sizes — staged once
    # each -> one scan instead of three
    e = events.select(
        "user_id", _event_epoch_sec(events).alias("sec")
    ).withColumn("day", F.expr("sec div 86400")).localCheckpoint(eager=False)
    first_seen = (
        e.groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
        .localCheckpoint(eager=False)
    )
    activity = (
        e.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.expr("(day - cohort_day) div 7").alias("week_offset"),
        )
        .distinct()
    )
    cohort_size = first_seen.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return (
        activity.join(F.broadcast(cohort_size), "cohort_day")
        .groupBy("cohort_day", "week_offset", "n_users")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.round(
                F.col("n_active") / F.col("n_users").cast("double"), 6
            ).alias("retention"),
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis report
# ---------------------------------------------------------------------------

@register(
    "join_key_skew_report",
    """
    WITH k AS (
        SELECT l_suppkey AS key, COUNT(*) AS n
        FROM lineitem GROUP BY l_suppkey
    ), tot AS (
        SELECT COUNT(*) AS n_keys, SUM(n) AS n_rows, MAX(n) AS max_n
        FROM k
    ), med AS (
        SELECT n AS median_n FROM k
        ORDER BY n, key
        LIMIT 1 OFFSET (SELECT CAST(CEIL(n_keys / 2.0) AS BIGINT) - 1 FROM tot)
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(max_n AS BIGINT) AS max_rows_per_key,
           CAST(median_n AS BIGINT) AS median_rows_per_key,
           ROUND(max_n / CAST(median_n AS DOUBLE), 6) AS skew_ratio,
           ROUND(max_n / CAST(n_rows AS DOUBLE), 6) AS top_key_share
    FROM tot, med
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis — the report you run BEFORE deciding
    between a plain join, AQE skew splitting, and operators/skew.py
    salting: per-key row counts, the max/median ratio, and the heaviest
    key's share of all rows. One groupBy to per-key counts, one tiny
    aggregate; the median key weight comes from the two-pass histogram
    selection (operators/stats.exact_kth_smallest_value) over the
    count table — no unpartitioned window even when the key space is
    millions of rows (the count table of a 100 TB fact is itself a big
    table)."""
    from federated_gcn_spark.operators.stats import exact_kth_smallest_value

    k = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    n_keys = k.count()
    median_n = int(
        exact_kth_smallest_value(k, "n", int(math.ceil(n_keys / 2)))
    )
    return (
        tot.withColumn("median_n", F.lit(median_n))
        .select(
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("max_n").cast("long").alias("max_rows_per_key"),
            F.col("median_n").cast("long").alias("median_rows_per_key"),
            F.round(
                F.col("max_n") / F.col("median_n").cast("double"), 6
            ).alias("skew_ratio"),
            F.round(
                F.col("max_n") / F.col("n_rows").cast("double"), 6
            ).alias("top_key_share"),
        )
    )
