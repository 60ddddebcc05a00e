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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Default ceiling on the emitted pair list (see
#: :class:`PairListOverflowError`).  Chosen far above any declared-SF
#: output (sf0.1 emits ~10^4 pairs) but small enough that a shuffle of
#: ``max_pairs`` rows cannot OOM an executor.
DEFAULT_MAX_PAIRS = 10_000_000


class PairListOverflowError(RuntimeError):
    """The exact pair list would exceed ``max_pairs``.

    :func:`set_similarity_join` output is Θ(duplication²) BY CONTRACT: a
    clone group of m identical sets alone emits C(m,2) pairs, so on a
    duplication-heavy corpus the pair list squares long before anyone
    reads it.  Rather than OOM the shuffle at scale, the join fails fast
    when a cheap exact LOWER bound on the output already exceeds the
    cap.  Consumers who need answers rather than the raw pair list
    should use the bounded front doors — :func:`set_similarity_topk`
    (per-record k best neighbors) or :func:`set_similarity_counts`
    (per-record neighbor count), both Θ(N)-output by construction — or
    contract clones first (:func:`contract_exact_clones`).  Pass
    ``max_pairs=None`` to opt out explicitly.
    """


def _guard_tripped(clone_pairs: int, max_pairs: int) -> bool:
    """True when the clone-pair lower bound exceeds the cap.

    A clone group of m > ~4.3e9 (or a total beyond int64) overflows the
    bigint SUM.  Under Spark's ANSI default that raises loudly, but with
    ANSI disabled the sum wraps NEGATIVE and a plain ``>`` check would
    silently pass — disabling the guard exactly on the pathological
    input it exists for.  A wrapped (negative) bound therefore trips the
    guard too (round-8 advice).
    """
    return clone_pairs > max_pairs or clone_pairs < 0


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
    max_pairs: int | None = DEFAULT_MAX_PAIRS,
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard(elems_a, elems_b) >= threshold.

    ``set_col`` must hold DISTINCT elements (callers pass
    ``array_distinct``/``list_distinct`` output). Returns
    ``(id_a, id_b, inter, n_a, n_b, jaccard)`` — exact, not approximate.

    ``max_pairs`` guards the one quadratic contract in this module: the
    OUTPUT itself is Θ(duplication²) (a clone group of m identical sets
    emits C(m,2) pairs at any threshold).  When set (the default), a
    pre-flight aggregate computes the clone-pair count — an EXACT lower
    bound on the emitted pairs, since identical non-empty sets have
    Jaccard 1 — and raises :class:`PairListOverflowError` if it exceeds
    the cap, BEFORE the quadratic candidate shuffle runs.  The bound is
    one linear groupBy on the xxhash64 of each sorted element array
    (8-byte shuffle keys, not the arrays; a collision can only MERGE
    groups and raise the bound, so the fail-fast stays sound) and runs
    as an eager Spark job at call time; it never changes the returned
    plan or its rows.
    Pass ``max_pairs=None`` to opt out (e.g. when the input is already
    clone-contracted — :func:`_rep_neighbors` does exactly this).
    """
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {t}")
    if max_pairs is not None and max_pairs < 1:
        raise ValueError(f"max_pairs must be >= 1 or None, got {max_pairs}")

    base = sets_df.select(
        F.col(id_col).alias("sid"), F.col(set_col).alias("elems")
    ).where(F.size("elems") > 0)
    # ``base`` feeds FIVE consumers (the clone-pair guard, the df count,
    # the rarest-first ordering, and both verification sides ea/eb), and
    # callers typically pass a freshly tokenized frame — without a cut,
    # each consumer re-runs the upstream tokenization subtree (measured
    # at sf0.1: ~15 CPU-s per re-pass, the single largest cost of the
    # pair join; guide §5 reuse rule).  Lazy checkpoint: materialized by
    # the first action (the guard, when enabled), then every consumer
    # reads the stored partitions.  Callers that already pass a
    # materialized frame (e.g. clone-contracted reps) pay one cheap
    # extra copy pass, nothing else.
    base = base.localCheckpoint(eager=False)

    if max_pairs is not None:
        # Group on the 64-bit xxhash of the sorted set, not the set
        # itself: the guard only needs group COUNTS, and hashing shrinks
        # the shuffle from full element arrays (KBs/row at 100 TB) to 8
        # bytes/row.  A hash collision can only MERGE groups, i.e. only
        # raise the bound — the fail-fast stays sound, with a ~2^-40
        # spurious-trip probability at 10^6 rows (same family of
        # fingerprint the MinHash stack already trusts).  The same pass
        # also returns the total set count (sum of group sizes) for the
        # ordering aggregate's partition sizing below — no extra job.
        guard_row = (
            base.groupBy(F.xxhash64(F.array_sort("elems")).alias("k"))
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.sum(
                    F.when(F.col("m") > 1, F.expr("m * (m - 1) DIV 2"))
                ).alias("p"),
                F.sum("m").alias("n"),
            )
            .first()
        )
        clone_pairs = guard_row["p"] or 0
        n_sets = guard_row["n"] or 0
        if _guard_tripped(clone_pairs, max_pairs):
            bound = "an int64-overflowing number of" if clone_pairs < 0 \
                else f">= {clone_pairs}"
            raise PairListOverflowError(
                f"set_similarity_join would emit {bound} pairs "
                f"from identical-set clone groups alone (max_pairs="
                f"{max_pairs}). The pair list is quadratic in duplication "
                "by contract; use the bounded front doors "
                "set_similarity_topk / set_similarity_counts, contract "
                "clones first (contract_exact_clones), or pass "
                "max_pairs=None to opt out explicitly."
            )

    else:
        # Unguarded callers (already clone-contracted reps): one cheap
        # count over the checkpointed base — it doubles as the
        # checkpoint's materialization job.
        n_sets = base.count()

    # Candidate phase runs on 64-bit xxhash64 TOKENS, not the element
    # strings (guide §2.3: shuffle keys, not payloads — the tok/df/
    # ordering/prefix/candidate exchanges carry 8 bytes per element
    # instead of whole n-grams, and every sort/join/hash over them gets
    # cheaper).  Correctness is screening-only: renaming elements to
    # their hashes preserves equality, and a collision can only MERGE
    # tokens — intersections grow, unions shrink, so hash-Jaccard >=
    # true Jaccard and the prefix/size screens stay COMPLETE (never
    # drop a true pair); spurious candidates are discarded by the exact
    # array_intersect verification below, which reads the ORIGINAL
    # arrays.  The emitted pairs are bit-identical.
    tok = base.select("sid", F.explode("elems").alias("e")).select(
        "sid", F.xxhash64("e").alias("elem")
    )
    dfc = tok.groupBy("elem").agg(F.count(F.lit(1)).alias("df"))

    # Rarest-first per-set element order, without any global rank window:
    # ride df along each element and array_sort the (df, elem) structs.
    # The per-set sort aggregate is CPU-dense relative to its bytes
    # (collect_list of every element, then an O(sz log sz) array sort
    # per set), so AQE's byte-based partition coalescing starves it —
    # measured at sf0.1: 23 task-CPU-s squeezed into 10 post-shuffle
    # partitions on 32 cores.  Size its exchange from the ROW count
    # instead (known for free from the guard pass / base count):
    # explicit numPartitions, which AQE preserves, floored at the
    # cluster's defaultParallelism and growing with the data — never a
    # local-mode constant, never a cap at scale.
    agg_parts = max(
        sets_df.sparkSession.sparkContext.defaultParallelism,
        int(n_sets) // 20_000 + 1,
    )
    ordered = (
        tok.join(dfc, "elem")
        .repartition(agg_parts, "sid")
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


def _contracted(
    sets_df: DataFrame, id_col: str, set_col: str
) -> tuple[DataFrame, DataFrame]:
    """(membership, reps): clone contraction WITH the member mapping.

    membership = (sid, rep, grp_n); reps = (id_col, set_col, grp_n) with
    one row per distinct element set, id = the group's min member id.
    Empty sets are excluded (they have no similarity neighbors).

    One shuffle total: a window over the sorted-array key attaches
    (rep = min member id, grp_n) to every row, so the member mapping
    needs no join back against a grouped table (the round-6 respelling;
    the groupBy+join spelling shuffled the key arrays twice).  The
    windowed frame is localCheckpoint'ed once and both outputs derive
    from it: every consumer branches off them at least twice (heads +
    sibling + cross expansion), and without the cut each branch would
    re-run the contraction shuffle — the multiply-consumed-intermediate
    lesson (plan audit showed 70 exchanges for the uncut top-k plan).
    """
    w = Window.partitionBy("key")
    base = (
        sets_df.select(
            F.col(id_col).alias("sid"),
            F.array_sort(F.array_distinct(F.col(set_col))).alias("key"),
        )
        .where(F.size("key") > 0)
        .withColumn("rep", F.min("sid").over(w))
        .withColumn("grp_n", F.count(F.lit(1)).over(w).cast("long"))
        .localCheckpoint(eager=True)
    )
    membership = base.select("sid", "rep", "grp_n")
    reps = base.where(F.col("sid") == F.col("rep")).select(
        F.col("sid").alias(id_col), F.col("key").alias(set_col), "grp_n"
    )
    return membership, reps


def _group_heads(membership: DataFrame, k: int) -> DataFrame:
    """(rep, head): the k+1 SMALLEST member ids of each clone group —
    enough to hand any member its k best same-group neighbors after
    excluding itself.  Two-phase top-k (salted row_number, then merge)
    so a pathological 10⁸-clone group never lands in one sort partition.
    """
    w1 = Window.partitionBy("rep", "salt").orderBy("sid")
    w2 = Window.partitionBy("rep").orderBy("sid")
    return (
        membership.withColumn(
            "salt", F.pmod(F.abs(F.hash("sid")), F.lit(64))
        )
        .withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= k + 1)
        .withColumn("rn2", F.row_number().over(w2))
        .where(F.col("rn2") <= k + 1)
        .groupBy("rep")
        .agg(F.sort_array(F.collect_list("sid")).alias("head"))
    )


def _rep_neighbors(
    reps: DataFrame, id_col: str, set_col: str, threshold: float
) -> DataFrame:
    """(g, h, jaccard, mh): directed rep-level similarity edges with the
    neighbor group's size — :func:`set_similarity_join` over the
    CONTRACTED sets (linear in distinct sets, never Θ(duplication²)),
    then symmetrized."""
    # max_pairs=None: reps are one-per-distinct-set by construction, so
    # the clone-pair lower bound the guard measures is identically zero —
    # running it would spend a shuffle to learn nothing.
    pairs = set_similarity_join(
        reps.select(id_col, set_col), id_col, set_col, threshold,
        max_pairs=None,
    )
    nbrs = pairs.select(
        F.col("id_a").alias("g"), F.col("id_b").alias("h"), "jaccard"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("g"), F.col("id_a").alias("h"), "jaccard"
        )
    )
    sizes = reps.select(F.col(id_col).alias("h"), F.col("grp_n").alias("mh"))
    return nbrs.join(sizes, "h")


def set_similarity_topk(
    sets_df: DataFrame,
    id_col: str = "id",
    set_col: str = "elems",
    threshold: float = 0.5,
    k: int = 10,
) -> DataFrame:
    """Per record: its k most similar OTHER records with exact Jaccard
    >= threshold — the BOUNDED front door next to
    :func:`set_similarity_join`, for consumers who need answers rather
    than the full Θ(duplication²) pair list.

    Returns ``(id_col, nbr_id, jaccard, rank)``; records with no
    qualifying neighbor emit no rows.  Ordering (and the exactness
    contract) is the deterministic tie-break **(jaccard desc,
    neighbor's clone-group representative asc, neighbor id asc)** —
    rounded-to-6dp jaccard, the same display rounding as the pair join.

    Scale shape (100 TB): clone groups are contracted FIRST
    (:func:`contract_exact_clones` semantics), so a group of m
    identical sets costs one node, never C(m,2) pairs.  The similarity
    join runs on representatives; per representative only the best
    groups covering k members survive a running-sum cut (≤ k groups);
    each kept group contributes only its k+1 smallest member ids
    (pre-trimmed, salted top-k — no giant-group sort partition).  Every
    intermediate after the rep join is Θ(N·k); the final per-record
    window ranks ≤ ~3k candidate rows per record.  Exact under the
    documented tie-break: a trimmed group is preceded by ≥ k members
    that outrank all of its members, and a trimmed member id is
    preceded by ≥ k smaller ids in its own group.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    membership, reps = _contracted(sets_df, id_col, set_col)
    nbrs = _rep_neighbors(reps, id_col, set_col, threshold)
    wg = Window.partitionBy("g").orderBy(F.col("jaccard").desc(), "h")
    cum_prev = F.coalesce(
        F.sum("mh").over(
            wg.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    trimmed = (
        nbrs.withColumn("cum_prev", cum_prev)
        .where(F.col("cum_prev") < k)
        .select("g", "h", "jaccard")
    )
    heads = _group_heads(membership, k).localCheckpoint(eager=True)
    # same-group neighbors: exact Jaccard 1.0, the k smallest sibling ids
    sib = (
        membership.join(heads, "rep")
        .select(
            "sid",
            F.explode("head").alias("nbr"),
            F.col("rep").alias("nbr_rep"),
        )
        .where(F.col("nbr") != F.col("sid"))
        .withColumn("jaccard", F.lit(1.0))
    )
    # cross-group neighbors: kept groups expanded to their k+1 head ids
    cross = (
        trimmed.join(
            heads.select(F.col("rep").alias("h"), "head"), "h"
        )
        .select(
            "g",
            F.col("h").alias("nbr_rep"),
            "jaccard",
            F.explode("head").alias("nbr"),
        )
        .join(membership.select("sid", F.col("rep").alias("g")), "g")
        .select("sid", "nbr", "nbr_rep", "jaccard")
    )
    wf = Window.partitionBy("sid").orderBy(
        F.col("jaccard").desc(), "nbr_rep", "nbr"
    )
    return (
        sib.select("sid", "nbr", "nbr_rep", "jaccard")
        .unionByName(cross)
        .withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select(
            F.col("sid").alias(id_col),
            F.col("nbr").alias("nbr_id"),
            F.col("jaccard"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def set_similarity_counts(
    sets_df: DataFrame,
    id_col: str = "id",
    set_col: str = "elems",
    threshold: float = 0.5,
) -> DataFrame:
    """Per record: HOW MANY other records have exact Jaccard >=
    threshold, and the best similarity — the aggregate-shaped bounded
    front door next to :func:`set_similarity_join` (Θ(N) output, never
    the Θ(duplication²) pair list).

    Returns ``(id_col, n_similar, max_jaccard)`` for every record with
    a non-empty set; ``n_similar`` = 0 and ``max_jaccard`` NULL when
    nothing qualifies.  Exact: a member of an m-clone group counts its
    m-1 siblings (Jaccard 1.0) plus every member of each group whose
    rep-level Jaccard meets the threshold (identical sets have
    identical similarity to everything, so the rep-level join loses
    nothing).

    Scale shape (100 TB): clone contraction → prefix-filtered rep join
    → one groupBy per rep → one broadcastable-rep-keyed join back to
    members.  Work is Θ(N + distinct-set pairs); duplication never
    squares.
    """
    membership, reps = _contracted(sets_df, id_col, set_col)
    nbrs = _rep_neighbors(reps, id_col, set_col, threshold)
    agg = nbrs.groupBy("g").agg(
        F.sum("mh").alias("cn"), F.max("jaccard").alias("mj")
    )
    return (
        membership.join(agg, membership.rep == agg.g, "left")
        .select(
            F.col("sid").alias(id_col),
            (F.col("grp_n") - 1 + F.coalesce("cn", F.lit(0)))
            .cast("long")
            .alias("n_similar"),
            F.when(F.col("grp_n") > 1, F.lit(1.0))
            .otherwise(F.col("mj"))
            .alias("max_jaccard"),
        )
    )
