"""Union + keep-first dedup — the reference's partition-ETL spine.

Reference semantics (merge.py:38-40, concat_embeddings.py:12-28):
  nodes  = concat(local, central);  keep FIRST row per id (local wins)
  edges  = concat(local, central)   -- bag semantics, duplicates kept

pandas encodes the priority implicitly in concat order. Spark has no row
order, so keep-first needs an explicit, deterministic priority column
(SURVEY.md §7.3 risk 4): we tag each input with its position and keep the
``min_by`` row over ``(priority, order_within)`` per key.

Scale notes: the min_by aggregate gets map-side partial combine (each
task pre-reduces its duplicates before the one hash-shuffle on the key —
a window would shuffle every row and sort each group), and AQE handles
key skew. When *any* surviving copy is acceptable, ``dropDuplicates``
is equivalent; both spellings reduce to the same shuffle.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRIORITY_COL = "__priority"


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """N-way bag union by column name (SET2/SET4; merge.py:40)."""
    if not dfs:
        raise ValueError("union_all of no inputs")
    return reduce(lambda a, b: a.unionByName(b), dfs)


def union_keep_first(
    dfs: Sequence[DataFrame],
    keys: Sequence[str],
    order_within: Sequence[str] | None = None,
) -> DataFrame:
    """Union inputs, keep the first copy per key — earlier DataFrames win
    (SET3; merge.py:38-39 `~index.duplicated(keep='first')`).

    ``order_within`` (default: the keys) makes tie-breaking inside one
    input deterministic under Spark's arbitrary partition order.
    """
    if not dfs:
        raise ValueError("union_keep_first of no inputs")
    tagged = [df.withColumn(PRIORITY_COL, F.lit(i)) for i, df in enumerate(dfs)]
    unioned = union_all(tagged)
    order_cols = [F.col(PRIORITY_COL)] + [
        F.col(c) for c in (order_within or []) if c not in keys
    ]
    row = F.struct(*[F.col(c) for c in dfs[0].columns])
    # min_by over a lexicographic (priority, tiebreak) struct: keep-first
    # as an aggregate — partial combine, no per-key sort
    return (
        unioned.groupBy(*[F.col(k) for k in keys])
        .agg(F.min_by(row, F.struct(*order_cols)).alias("__r"))
        .select("__r.*")
    )


def merge_partition(
    nodes_local: DataFrame,
    nodes_central: DataFrame,
    edges_local: DataFrame,
    edges_central: DataFrame,
    id_col: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """The full merge.py pipeline as two declarative plans.

    nodes: local ∪ central with keep-first (local replica wins over the
    boundary replica from the central store); edges: plain bag union.
    """
    nodes = union_keep_first([nodes_local, nodes_central], keys=[id_col])
    edges = union_all([edges_local, edges_central])
    return nodes, edges


def concat_embeddings(
    parts: Sequence[DataFrame], id_col: str = "id"
) -> DataFrame:
    """Merge per-partition embedding tables, first partition wins on id
    (concat_embeddings.py:12-28)."""
    return union_keep_first(parts, keys=[id_col])
