"""Incremental aggregate maintenance (materialized-view refresh).

At 100 TB you do not recompute a per-key rollup from scratch because a
day of new facts arrived: you keep the aggregate STATE (mergeable
partials per key) and fold each delta batch into it. This module is
that fold for the distributive/algebraic aggregates — count, sum, min,
max, and anything derivable from them (avg = sum/count) — the same
partial-merge algebra Spark's own partial/final HashAggregate uses,
lifted to table granularity.

``agg_state`` builds the state table from any batch; ``merge_states``
folds two state tables (base ∪ delta) with a full-outer join on the
keys — cost proportional to |keys touched|, not |base facts|. The
invariant (merge of split == single full aggregate) is what the oracle
and tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# out_col -> (kind, input_col); kinds: count / sum / min / max
Spec = dict[str, tuple[str, str]]

_BUILD = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}

_MERGE = {
    "count": lambda a, b: F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)),
    "sum": lambda a, b: F.when(
        a.isNull() & b.isNull(), F.lit(None)
    ).otherwise(F.coalesce(a, F.lit(0.0)) + F.coalesce(b, F.lit(0.0))),
    # least/greatest skip NULLs (return the non-null side), which is
    # exactly "merge a key present in only one state".
    "min": lambda a, b: F.least(a, b),
    "max": lambda a, b: F.greatest(a, b),
}


def agg_state(df: DataFrame, keys: list[str], specs: Spec) -> DataFrame:
    """Mergeable aggregate state of one batch: one row per key group."""
    aggs = [
        _BUILD[kind](col).alias(out) for out, (kind, col) in specs.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    base: DataFrame, delta: DataFrame, keys: list[str], specs: Spec
) -> DataFrame:
    """Fold a delta state into a base state (full-outer key merge).

    Scale shape: both sides are already reduced to one row per key, so
    the join shuffles |distinct keys| rows at most — and when the delta
    touches few keys, AQE broadcasts it and the base state never
    moves. Associative and commutative, so daily deltas can fold in
    any order (tested).
    """
    d = delta
    for out in specs:
        d = d.withColumnRenamed(out, f"_d_{out}")
    merged = base.join(d, keys, "full_outer")
    cols = [
        _MERGE[kind](F.col(out), F.col(f"_d_{out}")).alias(out)
        for out, (kind, _) in specs.items()
    ]
    return merged.select(*[F.col(k) for k in keys], *cols)
