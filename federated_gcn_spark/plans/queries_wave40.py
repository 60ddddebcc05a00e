"""Round-6 wave-40: BOUNDED exact-similarity front doors.

Round-5 verdict item 3: ``set_similarity_pairs``'s pair list is
Θ(duplication²) *by contract* — correct, but a 100 TB consumer who needs
"who are my nearest neighbors" or "how duplicated am I" must not be
forced through the full pair materialization.  These two queries are the
bounded surfaces, both exact:

- ``set_similarity_topk``: per document its 3 most-similar other
  documents at Jaccard >= 0.5 (operators/ppjoin.set_similarity_topk) —
  clone groups contracted first, per-rep group trimming by a running
  member-count cut, per-group k+1-smallest-id heads; every intermediate
  after the rep join is Θ(N·k).
- ``set_similarity_counts``: per document the COUNT of similar others
  and the best similarity (operators/ppjoin.set_similarity_counts) —
  Θ(N) output via rep-level aggregation + group-size expansion.

Both oracles replay the prefix-filtered pair join in SQL (the
set_similarity_pairs spelling) and derive the bounded answers from the
pair list — the oracle may go Θ(pairs) at sf0.01; the Spark plan must
not.  Determinism: ranking and maxima are over ROUND(j, 6) with the
documented (jaccard desc, nbr_rep asc, nbr asc) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from federated_gcn_spark.catalog import load_table
from federated_gcn_spark.functions.text import word_ngrams
from federated_gcn_spark.plans.queries import register

_SIM_T = 0.5
_SIM_K = 3

# the set_similarity_pairs prefix-filter replay, through the directed
# qualifying-pair list `dirp` (each qualifying unordered pair appears
# once per direction)
_PAIR_CTES = r"""d AS (
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
    ), pairs AS (
        SELECT id_a, id_b,
               ROUND(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS j
        FROM ver
        WHERE inter / CAST(n_a + n_b - inter AS DOUBLE) >= 0.5
    ), dirp AS (
        SELECT id_a AS sid, id_b AS nbr, j FROM pairs
        UNION ALL
        SELECT id_b AS sid, id_a AS nbr, j FROM pairs
    )"""


def _doc_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", parallel=True)
    return docs.where(F.trim("text") != "").select(
        "doc_id",
        F.array_distinct(word_ngrams(F.lower(F.col("text")), 3)).alias(
            "elems"
        ),
    )


@register(
    "set_similarity_topk",
    f"""
    WITH {_PAIR_CTES}, grp AS (
        SELECT list_sort(elems) AS key, MIN(doc_id) AS rep
        FROM d GROUP BY 1
    ), mem AS (
        SELECT d.doc_id, g.rep
        FROM d JOIN grp g ON list_sort(d.elems) = g.key
    ), ranked AS (
        SELECT b.sid, b.nbr, b.j, m.rep AS nbr_rep,
               ROW_NUMBER() OVER (
                   PARTITION BY b.sid ORDER BY b.j DESC, m.rep, b.nbr
               ) AS rnk
        FROM dirp b JOIN mem m ON m.doc_id = b.nbr
    )
    SELECT sid AS doc_id, nbr AS nbr_id, j AS jaccard,
           CAST(rnk AS BIGINT) AS sim_rank
    FROM ranked WHERE rnk <= {_SIM_K}
    """,
)
def set_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: its {k} most similar other documents at exact
    Jaccard >= 0.5 over 3-token shingles — the BOUNDED twin of
    set_similarity_pairs (operators/ppjoin.set_similarity_topk).

    100 TB shape: the pair list is never materialized.  Clone groups
    contract to one representative each (linear), the prefix-filtered
    join runs on representatives, a running-member-count window keeps
    at most k groups per representative, and each kept group ships only
    its k+1 smallest member ids — Θ(N·k) everywhere downstream of the
    rep join.  The ORACLE, by contrast, deliberately goes through the
    full pair list (fine at oracle SF, disqualifying at 100 TB).
    Determinism: ranks over ROUND(j, 6) with the (j desc, nbr_rep asc,
    nbr asc) tie-break replayed identically in SQL.
    """
    from federated_gcn_spark.operators.ppjoin import set_similarity_topk

    out = set_similarity_topk(
        _doc_sets(spark, sf_dir), "doc_id", "elems",
        threshold=_SIM_T, k=_SIM_K,
    )
    return out.select(
        "doc_id", "nbr_id", "jaccard", F.col("rank").alias("sim_rank")
    )


@register(
    "set_similarity_counts",
    f"""
    WITH {_PAIR_CTES}, agg AS (
        SELECT sid, CAST(COUNT(*) AS BIGINT) AS n_similar, MAX(j) AS mj
        FROM dirp GROUP BY sid
    )
    SELECT d.doc_id,
           COALESCE(a.n_similar, 0) AS n_similar,
           a.mj AS max_jaccard
    FROM d LEFT JOIN agg a ON a.sid = d.doc_id
    """,
)
def set_similarity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: HOW MANY other documents sit at exact Jaccard >=
    0.5 (3-token shingles), and the best similarity — the
    aggregate-shaped bounded twin of set_similarity_pairs
    (operators/ppjoin.set_similarity_counts).

    100 TB shape: Θ(N) output; clone contraction → rep-level
    prefix-filtered join → one rep aggregate → group-size expansion.  A
    10⁶-clone group costs one rep node and one multiplication, never
    C(10⁶, 2) pairs.  Determinism: counts are exact integers; the max
    is over ROUND(j, 6) values identical on both engines.
    """
    from federated_gcn_spark.operators.ppjoin import set_similarity_counts

    return set_similarity_counts(
        _doc_sets(spark, sf_dir), "doc_id", "elems", threshold=_SIM_T
    )
