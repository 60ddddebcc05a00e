"""Sequence packing: greedy next-fit assignment of chunks into
fixed-token-budget training sequences.

LLM pre-training wants every context window full — feeding one short
chunk per sequence wastes compute proportional to the padding. Packing
concatenates chunks until the next one would overflow the budget, then
opens a new bin (next-fit; within ~2× of optimal and, unlike first-fit,
streamable in one ordered pass). Composes with operators/chunk.py —
chunk first so no single item exceeds the budget, then pack.

Scale shape: next-fit is inherently sequential *within* a pack group,
so the group is the unit of parallelism — pack per (e.g.) language or
shard key via ``applyInPandas``, one Arrow batch per group, sequential
numpy cumsum inside. Bin ids are (group, local_bin) so no cross-group
coordination exists; 100 TB packs as thousands of independent groups.
The assignment is deterministic: items are sorted by (id, chunk) inside
the group before the scan, independent of partition layout.

The bin loop is numpy-vectorized: one cumsum over the group, then one
searchsorted per bin to find the overflow point — O(#bins) python
iterations with O(log #rows) work each, not O(#rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _next_fit(tokens, budget: int):
    """Bin index per item for next-fit over an ordered token-count list.

    Items larger than the budget get a bin of their own (never split).
    Vectorized: a bin is the maximal prefix of remaining items whose
    running sum stays within budget, so each bin's end is one
    ``searchsorted`` into the global cumsum — the loop advances one BIN
    per iteration, not one row."""
    t = np.asarray(tokens, dtype=np.int64)
    n = len(t)
    bins = np.zeros(n, dtype=np.int64)
    cs = np.cumsum(t)
    start = 0  # first item of the current bin
    base = 0  # cumsum consumed before the current bin
    bin_id = 0
    while True:
        j = int(np.searchsorted(cs, base + budget, side="right"))
        if j <= start:  # first item alone exceeds budget: its own bin
            j = start + 1
        if j >= n:
            bins[start:] = bin_id
            break
        bins[start:j] = bin_id
        bin_id += 1
        base = int(cs[j - 1])
        start = j
    return bins


def pack_sequences(
    chunks: DataFrame,
    group_col: str,
    token_col: str = "n_tokens",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_id"),
    budget: int = 512,
) -> DataFrame:
    """Assign every chunk a ``bin_id`` within its ``group_col`` group.

    Output = input columns + ``bin_id`` (long). Deterministic under any
    partitioning: rows are sorted by ``order_cols`` inside each group
    before the sequential scan.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    order = list(order_cols)
    # fresh StructType — StructType.add mutates in place, and mutating
    # chunks.schema would hand the parent DataFrame a phantom column
    schema_out = StructType(
        list(chunks.schema.fields) + [StructField("bin_id", LongType())]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        pdf["bin_id"] = _next_fit(pdf[token_col].to_numpy(), budget)
        return pdf

    return chunks.groupBy(group_col).applyInPandas(pack, schema=schema_out)


def packing_stats(
    packed: DataFrame,
    group_col: str,
    token_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Per-group packing efficiency: bins used, chunks packed, total
    tokens, the fullest bin, and utilization = total / (bins · budget)."""
    per_bin = packed.groupBy(group_col, "bin_id").agg(
        F.sum(token_col).cast("long").alias("bin_tokens"),
        F.count(F.lit(1)).cast("long").alias("bin_chunks"),
    )
    return (
        per_bin.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bins"),
            F.sum("bin_chunks").cast("long").alias("n_chunks"),
            F.sum("bin_tokens").cast("long").alias("total_tokens"),
            F.max("bin_tokens").cast("long").alias("max_bin_tokens"),
        )
        .select(
            group_col,
            "n_bins",
            "n_chunks",
            "total_tokens",
            "max_bin_tokens",
            F.round(
                F.col("total_tokens").cast("double")
                / (F.col("n_bins") * F.lit(float(budget))),
                6,
            ).alias("utilization"),
        )
    )
