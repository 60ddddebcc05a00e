"""Product-quantization ANN: compressed codes + asymmetric distance.

Jégou, Douze, Schmid, "Product quantization for nearest neighbor
search" (TPAMI'11): split each d-dim vector into n_sub subvectors,
k-means each subspace independently (n_codes centroids), store each
vector as n_sub small integer codes.  A query builds one lookup table
per subspace (distance from its subvector to every centroid) and scores
a candidate as the SUM of table entries selected by its codes — the
asymmetric distance computation (ADC).  At 100 TB this is the memory
story for vector search: 64 float32 dims (256 B) become 4-8 bytes of
codes; the code table fits in RAM where the raw vectors never could,
and IVF (operators/similarity.py) composes with it as IVFADC.

Spark shape:

- Training is n_sub independent distributed Lloyd runs over SLICES of
  the embedding column — per-(code, dim) means via one
  posexplode/groupBy shuffle per iteration (map-side partials), only
  n_codes * sub_dim floats reach the driver.  Deterministic seeded
  init (xxhash64 order), empty clusters carry, SAME recipe as
  IVFIndex so the unrolled-SQL oracle replays it
  (plans/queries_mining._pq_oracle).
- Encoding is an Arrow-batched pandas UDF: one (B, sub_dim) x
  (sub_dim, n_codes) matmul + argmin per subspace per batch — the
  sanctioned BLAS-kernel case (see IVFIndex.assign docstring for the
  measured HOF-vs-Arrow numbers); ties take the LOWEST code
  (np.argmin first-match), mirrored by the oracle's
  ``ORDER BY d ASC, code ASC``.
- ADC search needs no vector column at all: the n_sub * n_codes LUT is
  inlined as literal arrays, the score is a codegen'd element_at sum
  over the codes array, and top-k is TakeOrderedAndProject.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PQIndex:
    def __init__(
        self,
        embeddings: DataFrame,
        n_sub: int = 4,
        n_codes: int = 8,
        seed: int = 42,
        train_iters: int = 2,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.n_sub, self.n_codes = n_sub, n_codes
        self.id_col, self.vec_col = id_col, vec_col
        dim = len(embeddings.select(vec_col).first()[0])
        if dim % n_sub:
            raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
        self.sub_dim = dim // n_sub

        # seeded init per subspace: subvectors of the n_codes lowest
        # (xxhash64(vec_id, seed + s), vec_id) vectors — layout-free and
        # SQL-replayable.
        self.centroids = np.zeros((n_sub, n_codes, self.sub_dim))
        for s in range(n_sub):
            rows = (
                embeddings.select(id_col, vec_col)
                .orderBy(F.xxhash64(F.col(id_col), F.lit(seed + s)), F.col(id_col))
                .limit(n_codes)
                .collect()
            )
            for c, r in enumerate(rows):
                self.centroids[s, c] = np.asarray(
                    list(r[1]), dtype="float64"
                )[s * self.sub_dim : (s + 1) * self.sub_dim]

        for _ in range(train_iters):
            self._lloyd_step(embeddings)

    def _lloyd_step(self, embeddings: DataFrame) -> None:
        """One Lloyd iteration for ALL subspaces in a single job: encode
        (Arrow argmin), then per-(subspace, code, dim) mean in one
        posexplode/groupBy shuffle."""
        enc = self.encode(embeddings)
        means = (
            enc.select(F.col("codes"), F.col(self.vec_col))
            .select(
                F.posexplode(F.col(self.vec_col)).alias("pos", "val"),
                F.col("codes"),
            )
            .select(
                (F.col("pos") / self.sub_dim).cast("int").alias("s"),
                (F.col("pos") % self.sub_dim).alias("sd"),
                F.element_at(
                    F.col("codes"), (F.col("pos") / self.sub_dim).cast("int") + 1
                ).alias("code"),
                "val",
            )
            .groupBy("s", "code", "sd")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = self.centroids.copy()  # empty clusters keep their centroid
        for r in means:
            new[r["s"], r["code"], r["sd"]] = r["m"]
        self.centroids = new

    def encode(self, embeddings: DataFrame) -> DataFrame:
        """(id, vec, codes array<int>): per-subspace argmin-L2 code."""
        C = self.centroids  # (n_sub, n_codes, sub_dim)
        n_sub, sub_dim = self.n_sub, self.sub_dim

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<int>")
        def _codes(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype=object)
            X = np.vstack(v.to_numpy()).astype(np.float64)
            out = np.empty((X.shape[0], n_sub), dtype="int32")
            for s in range(n_sub):
                Xs = X[:, s * sub_dim : (s + 1) * sub_dim]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2
                D = -2.0 * (Xs @ C[s].T) + (C[s] * C[s]).sum(axis=1)[None, :]
                out[:, s] = np.argmin(D, axis=1)  # ties -> lowest code
            return pd.Series(list(out))

        return embeddings.withColumn("codes", _codes(F.col(self.vec_col)))

    def adc_topk(self, encoded: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
        """Top-k by asymmetric distance: LUT literals + codegen sum —
        the vector column is NOT read."""
        q = np.asarray(query_vec, dtype="float64")
        lut = np.zeros((self.n_sub, self.n_codes))
        for s in range(self.n_sub):
            qs = q[s * self.sub_dim : (s + 1) * self.sub_dim]
            lut[s] = ((self.centroids[s] - qs[None, :]) ** 2).sum(axis=1)
        luts = [
            F.array(*[F.lit(float(x)) for x in lut[s]]) for s in range(self.n_sub)
        ]
        dist = None
        for s in range(self.n_sub):
            term = F.element_at(luts[s], F.element_at(F.col("codes"), s + 1) + 1)
            dist = term if dist is None else dist + term
        return (
            encoded.select(self.id_col, F.round(dist, 6).alias("adc_dist"))
            .orderBy("adc_dist", self.id_col)
            .limit(k)
        )
