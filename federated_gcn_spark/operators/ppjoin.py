"""Exact set-similarity self-join with prefix filtering (PPJoin family).

Complements the probabilistic near-dup stack (operators/dedup.py MinHash
LSH banding, SimHash pigeonhole) with the EXACT counterpart: every pair
whose Jaccard similarity meets the threshold is returned, no recall
caveat. The classic trick (Chaudhuri, Ganti & Kaushik, "A Primitive
Operator for Similarity Joins in Data Cleaning", ICDE'06; Xiao et al.
PPJoin, WWW'08) makes this scale without an all-pairs comparison:

1. impose ONE global order on elements — ascending document frequency,
   ties by the element value — so every set lists its rarest elements
   first;
2. for Jaccard >= t, two sets can match only if their PREFIXES (the
   first ``|x| - ceil(t*|x|) + 1`` elements in that order) share at
   least one element, so candidate generation is a plain equi-join on
   prefix elements;
3. verify candidates exactly with one intersection count.

Scale shape (100 TB):
- the document-frequency table is element-cardinality-sized and the
  df join is a shuffle equi-join (AQE-skew-splittable);
- the candidate equi-join keys are each set's globally RAREST elements
  — that is the point of the df ordering: per-key row counts in the
  join are small by construction, so the quadratic blowup a frequent
  token would cause structurally cannot happen (frequent tokens never
  reach a prefix unless a set is almost all stop-words, in which case
  the size filter still bounds its matches);
- verification touches candidate pairs only, with per-row work bounded
  by the two set sizes (``array_intersect`` is codegen, JVM-side);
- no global rank window: the per-set ordering is a local
  ``array_sort`` over (df, elem) structs after the df join — nothing
  in the pipeline is single-partition.

No counterpart in the reference repo (its dedup surface stops at id
equality); this is the exact-verification layer a curation pipeline
runs inside LSH buckets or on suspect cohorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contract_exact_clones(
    sets_df: DataFrame, id_col: str = "id", set_col: str = "elems"
) -> DataFrame:
    """Collapse rows with IDENTICAL element sets to one weighted
    representative: ``(id = min id of the clone group, set_col, grp_n =
    group size)``.

    This is the de-quadratic front door for clustering consumers of the
    exact join: a clone group of m identical sets would emit C(m,2)
    pairs from :func:`set_similarity_join` (quadratic in duplication —
    the dominant blowup on duplication-heavy corpora), yet contributes
    exactly ONE node's worth of information to the similarity graph.
    Contraction is closure-EXACT, not an approximation: identical sets
    have Jaccard 1 with each other (always >= any threshold) and the
    same Jaccard as their twin to every other set, so the contracted
    graph's components, expanded by group size, are the all-pairs
    graph's components bit-for-bit.

    Scale shape: one groupBy on the sorted element array (exact — no
    fingerprint collision risk; the shuffle carries arrays the join
    would carry anyway).  Group sizes ride along so downstream component
    sizes can be reconstituted without touching the corpus again.
    """
    return (
        sets_df.select(
            F.col(id_col).alias("sid"),
            F.array_sort(F.array_distinct(F.col(set_col))).alias("k"),
        )
        .groupBy("k")
        .agg(
            F.min("sid").alias(id_col),
            F.count(F.lit(1)).cast("long").alias("grp_n"),
        )
        .select(id_col, F.col("k").alias(set_col), "grp_n")
    )


def set_similarity_join(
    sets_df: DataFrame,
    id_col: str = "id",
    set_col: str = "elems",
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(elems_a, elems_b) >= threshold.

    ``set_col`` must hold DISTINCT elements (callers pass
    ``array_distinct``/``list_distinct`` output). Returns
    ``(id_a, id_b, inter, n_a, n_b, jaccard)`` — exact, not approximate.
    """
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {t}")

    base = sets_df.select(
        F.col(id_col).alias("sid"), F.col(set_col).alias("elems")
    ).where(F.size("elems") > 0)

    tok = base.select("sid", F.explode("elems").alias("elem"))
    dfc = tok.groupBy("elem").agg(F.count(F.lit(1)).alias("df"))

    # Rarest-first per-set element order, without any global rank window:
    # ride df along each element and array_sort the (df, elem) structs.
    ordered = (
        tok.join(dfc, "elem")
        .groupBy("sid")
        .agg(F.array_sort(F.collect_list(F.struct("df", "elem"))).alias("arr"))
        .select(
            "sid",
            F.col("arr.elem").alias("sorted_elems"),
            F.size("arr").alias("sz"),
        )
    )
    # Prefix-filter length for Jaccard >= t: |x| - ceil(t*|x|) + 1.
    plen = (F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1)).cast("int")
    prefix = ordered.select(
        "sid", "sz", F.explode(F.slice("sorted_elems", 1, plen)).alias("elem")
    )

    pa = prefix.select(
        F.col("sid").alias("id_a"), F.col("sz").alias("n_a"), "elem"
    )
    pb = prefix.select(
        F.col("sid").alias("id_b"), F.col("sz").alias("n_b"), "elem"
    )
    cand = (
        pa.join(pb, "elem")
        .where(F.col("id_a") < F.col("id_b"))
        # size filter: J <= min/max, so J >= t requires min >= t*max
        .where(
            F.least("n_a", "n_b") >= F.lit(t) * F.greatest("n_a", "n_b")
        )
        .select("id_a", "id_b")
        .distinct()
    )

    ea = base.select(F.col("sid").alias("id_a"), F.col("elems").alias("ea"))
    eb = base.select(F.col("sid").alias("id_b"), F.col("elems").alias("eb"))
    inter = F.size(F.array_intersect("ea", "eb"))
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("inter"),
            F.size("ea").cast("long").alias("n_a"),
            F.size("eb").cast("long").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= t)
        .select(
            "id_a",
            "id_b",
            "inter",
            "n_a",
            "n_b",
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
