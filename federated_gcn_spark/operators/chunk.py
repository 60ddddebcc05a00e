"""Overlapping token-window document chunking (driver extension §2.10).

The standard pre-training / RAG preprocessing step the reference's ETL
(`/root/reference/merge.py`) stops short of: split each document into
fixed-size token windows with a configurable stride (overlap = size −
stride), one output row per chunk.

Scale shape: everything is one pass of codegen'd HOF expressions per row
(whitespace split → windowed slices → posexplode); there is no shuffle at
all — chunking is embarrassingly parallel and pipelines into whatever
scan produced the documents. Output grows by ~n_tokens/stride rows per
doc, so downstream partition sizing should use `repartition` only if the
next operator needs a different key (the chunker itself never forces
one).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from federated_gcn_spark.functions.text import tokens


def chunk_expr(text: Column | str, size: int, stride: int) -> Column:
    """ARRAY<STRUCT<chunk_id, n_tokens, chunk_text>> of overlapping token
    windows: chunk i covers tokens [i·stride, min(i·stride+size, n)).

    The token array is bound ONCE as a lambda variable (the transform-
    over-singleton trick): a plain column reference would be re-expanded
    by Catalyst's projection collapse at every use — the ~100× lesson
    from operators/dedup.py minhash_signature_over.
    """
    if size <= 0 or stride <= 0:
        raise ValueError(f"size and stride must be positive, got {size}, {stride}")

    def chunks_of(t: Column) -> Column:
        n = F.size(t)
        starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
        return F.when(n > 0, F.transform(
            starts,
            lambda s: F.struct(
                (s / stride).cast("long").alias("chunk_id"),
                F.least(F.lit(size), n - s).cast("long").alias("n_tokens"),
                F.concat_ws(" ", F.slice(t, s + 1, size)).alias("chunk_text"),
            ),
        )).otherwise(F.array().cast(
            "array<struct<chunk_id:bigint,n_tokens:bigint,chunk_text:string>>"
        ))

    return F.element_at(F.transform(F.array(tokens(text)), chunks_of), 1)


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """One row per (doc, chunk): (id_col, chunk_id, n_tokens, chunk_text).

    Empty/whitespace-only documents produce no chunks; the final partial
    window at the tail is kept (n_tokens < size), matching the usual
    training-data chunkers.
    """
    return docs.select(
        F.col(id_col), F.explode(chunk_expr(text_col, size, stride)).alias("c")
    ).select(id_col, "c.chunk_id", "c.n_tokens", "c.chunk_text")
