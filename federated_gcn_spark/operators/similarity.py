"""Embedding similarity search (driver extension §2.10).

- ``brute_force_topk``: exact cosine top-k of a query vector against the
  whole table. Per-row HOF dot product + TakeOrdered — one scan, no
  shuffle of vectors, the correctness baseline.
- ``RandomHyperplaneLSH``: the scale path. B seeded random hyperplanes →
  a B-bit bucket signature per vector (computed once, persisted); a
  query probes only its own bucket (+ optional 1-bit-flip multiprobe),
  then exact-scores the candidates. At 100 TB the bucketed table is
  partitioned by bucket → a query touches a handful of partitions
  instead of the full corpus.
- ``embedding_near_dup_pairs``: all-pairs cosine ≥ τ via bucket-equi-join
  (pairs only form inside a bucket — never doc×doc).

Hyperplanes are generated from a numpy PRNG with a fixed seed on the
driver and inlined as literal arrays — deterministic and broadcast-free
(they live in the plan itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from federated_gcn_spark.functions.scalar import cosine_similarity


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), id_col).limit(k)


def vectorized_cosine(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) for two vector columns as an Arrow-batched numpy kernel.

    Semantics match ``functions.scalar.cosine_similarity`` (NULL for a
    zero-norm side) but the evaluation is one einsum per Arrow batch
    instead of per-element lambda interpretation — the right kernel when
    a plan scores MILLIONS of pairs (near-dup verify, within-cluster
    SemDeDup scans). Float summation order differs from the HOF fold by
    ~1e-15; callers round before comparing, same as the cross-engine
    oracle contract.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(va.to_numpy()).astype(np.float64)
        B = np.vstack(vb.to_numpy()).astype(np.float64)
        dots = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        out = pd.Series(dots / np.maximum(den, 1e-300)).astype("Float64")
        return out.mask(den == 0.0, pd.NA)

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dim))


def _bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = bits of sign(<v, plane_i>), as BIGINT."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(vec_col, plane, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


class RandomHyperplaneLSH:
    def __init__(self, dim: int, n_planes: int = 8, seed: int = 42):
        self.planes = _hyperplanes(dim, n_planes, seed)
        self.n_planes = n_planes

    def with_buckets(
        self, embeddings: DataFrame, vec_col: str = "embedding"
    ) -> DataFrame:
        return embeddings.withColumn("bucket", _bucket_expr(F.col(vec_col), self.planes))

    def query_buckets(self, query_vec: list[float], multiprobe: int = 1) -> list[int]:
        """Query's bucket plus all buckets within ``multiprobe`` bit flips."""
        dots = self.planes @ np.asarray(query_vec, dtype="float64")
        base = 0
        for i, d in enumerate(dots):
            if d >= 0:
                base |= 1 << i
        buckets = {base}
        if multiprobe >= 1:
            for i in range(self.n_planes):
                buckets.add(base ^ (1 << i))
        if multiprobe >= 2:
            for i in range(self.n_planes):
                for j in range(i + 1, self.n_planes):
                    buckets.add(base ^ (1 << i) ^ (1 << j))
        return sorted(buckets)

    def topk(
        self,
        bucketed: DataFrame,
        query_vec: list[float],
        k: int = 10,
        multiprobe: int = 1,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ANN top-k: exact cosine over the probed buckets only."""
        buckets = self.query_buckets(query_vec, multiprobe)
        q = F.array(*[F.lit(float(v)) for v in query_vec])
        cands = bucketed.where(F.col("bucket").isin(buckets))
        return (
            cands.select(F.col(id_col), cosine_similarity(F.col(vec_col), q).alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), id_col)
            .limit(k)
        )


class IVFIndex:
    """Inverted-file ANN index (the classic IVF-Flat layout, Spark-shaped).

    Centroids: seeded deterministic sample of k vectors, then
    ``train_iters`` distributed Lloyd iterations of spherical k-means —
    each iteration is one assign (codegen'd argmax over inlined-literal
    dot products) + one posexplode/groupBy mean (a single shuffle of
    (centroid, dim_pos, value) triples with map-side combine), and only
    k·dim aggregated floats ever reach the driver. Random-sample
    centroids lose recall badly on clustered corpora — cluster cores get
    split across few sampled points while dense regions hog lists —
    so training is on by default. Empty clusters keep their previous
    centroid (the standard Lloyd fallback). Assignment: every vector
    gets the max-cosine centroid — all codegen-able, no Python in the
    row path. A query exact-scores only its ``nprobe`` nearest centroid
    lists.

    At 100 TB the assigned table is written partitioned by
    ``centroid_id`` so a probe is partition pruning — the same catalog
    trick as the graph store (catalog.write_graph).
    """

    def __init__(
        self,
        embeddings: DataFrame,
        k: int = 16,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        train_iters: int = 3,
    ):
        rows = (
            embeddings.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
            .limit(k)
            .collect()
        )
        self.centroids = np.array([list(r[1]) for r in rows], dtype="float64")
        self._normalize_centroids()
        self.id_col, self.vec_col = id_col, vec_col
        for _ in range(train_iters):
            self._lloyd_step(embeddings)

    def _normalize_centroids(self) -> None:
        self.centroids /= np.maximum(
            np.linalg.norm(self.centroids, axis=1, keepdims=True), 1e-12
        )

    def _lloyd_step(self, embeddings: DataFrame) -> None:
        """One distributed Lloyd iteration: assign → per-(cluster, dim)
        mean → re-normalize. The collect is k·dim floats, never vectors."""
        means = (
            self.assign(embeddings)
            .select("centroid_id", F.posexplode(F.col(self.vec_col)))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        new = self.centroids.copy()  # empty clusters keep their centroid
        for r in means:
            new[r["centroid_id"], r["pos"]] = r["m"]
        self.centroids = new
        self._normalize_centroids()

    def assign(self, embeddings: DataFrame) -> DataFrame:
        """embeddings + ``centroid_id`` (argmax cosine; ties → higher id).

        Kernel choice (measured at 5k×64, 16 centroids, local[32], warm):
        an Arrow-batched pandas UDF doing one ``X @ C.T`` argmax per
        batch runs ~1 s; the zip_with/aggregate HOF spelling ~4 s
        (per-element lambda interpretation); unrolling k·dim codegen
        terms blows janino's 64 KB method limit and drops the whole
        stage to interpreted mode. BLAS-shaped vector math is exactly
        the sanctioned Pandas-UDF case — the centroid matrix ships once
        per executor in the closure, the batch matmul is vectorized,
        and no shuffle is involved, so the kernel is as cluster-scalable
        as the codegen spelling.

        Centroids are unit-norm, so argmax cosine == argmax dot (the
        per-row 1/‖v‖ factor cancels). Ties → the HIGHER centroid id
        (reversed argmax), matching the previous struct-max semantics
        and the oracle's ``ORDER BY cos DESC, cid DESC`` replay. Zero
        vectors: all dots 0.0 → highest id (the cosine spelling gave
        NULL sims — an explicitly arbitrary assignment either way).
        """
        from pyspark.sql.functions import pandas_udf

        C = self.centroids  # (k, dim) float64, unit-norm

        @pandas_udf("int")
        def _argmax_cid(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="int32")
            X = np.vstack(v.to_numpy()).astype(np.float64)
            D = X @ C.T
            k = D.shape[1]
            return pd.Series(
                (k - 1 - np.argmax(D[:, ::-1], axis=1)).astype("int32")
            )

        return embeddings.withColumn(
            "centroid_id", _argmax_cid(F.col(self.vec_col))
        )

    def topk(
        self,
        assigned: DataFrame,
        query_vec: list[float],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """ANN top-k: exact cosine over the nprobe nearest centroid lists."""
        q = np.asarray(query_vec, dtype="float64")
        q = q / max(np.linalg.norm(q), 1e-12)
        order = np.argsort(-(self.centroids @ q), kind="stable")
        probe = [int(i) for i in order[:nprobe]]
        qcol = F.array(*[F.lit(float(v)) for v in query_vec])
        return (
            assigned.where(F.col("centroid_id").isin(probe))
            .select(
                F.col(self.id_col),
                cosine_similarity(F.col(self.vec_col), qcol).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), self.id_col)
            .limit(k)
        )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group, skew-safe.

    A single ``row_number`` window over ``group_cols`` hash-partitions on
    the group key — with few groups (a handful of queries scanning a huge
    corpus) every group's full candidate set lands on ONE task. Instead:
    phase 1 ranks within (group, input-partition) — |groups|·|partitions|
    keys, so the exchange spreads over the whole cluster and each task
    sorts only its local slice — keeping ≤k rows per (group, partition);
    phase 2 ranks the surviving |groups|·|partitions|·k rows globally.
    Same answer (a global top-k row is a top-k row of its partition),
    bounded memory everywhere.
    """
    staged = df.withColumn("_src_part", F.spark_partition_id())
    w_local = Window.partitionBy(*group_cols, "_src_part").orderBy(*order_by)
    survivors = (
        staged.withColumn("_rk", F.row_number().over(w_local))
        .where(F.col("_rk") <= k)
        .drop("_rk", "_src_part")
    )
    w_global = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        survivors.withColumn("rk", F.row_number().over(w_global))
        .where(F.col("rk") <= k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine k-NN JOIN: top-k corpus neighbors for EVERY query row.

    The query side broadcasts (it is the small side by construction — a
    batch of probes against a huge corpus), so scoring is a narrow map
    over corpus partitions: no corpus shuffle, one HOF dot product per
    (corpus row, query). Ranking goes through topk_per_group, so a small
    query batch cannot skew-collapse onto single tasks. Output:
    (query_id, neighbor_id, rk, cos_sim).

    For |queries| too large to broadcast, use RandomHyperplaneLSH/IVFIndex
    bucketing instead — the all-pairs score matrix is the scale boundary
    of the exact path, not the join strategy.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    ranked = topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id")],
        k,
    )
    return ranked.select("query_id", "neighbor_id", "rk", "cos_sim")


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a < id_b, cos_sim ≥ threshold) candidate-verified pairs.

    The verify stage scores every same-bucket candidate pair — at
    near-dup corpus scale that is the dominant row count, so it uses
    the Arrow-batched ``vectorized_cosine`` kernel (one einsum per
    batch) rather than a per-element HOF fold.
    """
    lsh = RandomHyperplaneLSH(
        dim=len(embeddings.select(vec_col).first()[0]), n_planes=n_planes, seed=seed
    )
    # the bucketed table feeds both self-join sides; staged once -> one
    # scan + signature pass instead of two
    b = lsh.with_buckets(embeddings, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
    ).localCheckpoint(eager=False)
    cand = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            vectorized_cosine(F.col("a.v"), F.col("b.v")).alias("cos_sim"),
        )
    )
    return cand.where(F.col("cos_sim") >= threshold)
