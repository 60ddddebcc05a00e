"""Slowly-changing-dimension (SCD type 2) interval construction.

The warehouse pattern for turning an event/change stream into a
versioned dimension: contiguous runs of the same state per key collapse
to one row with a [valid_from, valid_to) validity interval, the current
state left open (valid_to NULL).  Change detection is the
gaps-and-islands idiom — LAG to flag state transitions, a running SUM
to number islands, then per-island MIN/LEAD — entirely window/aggregate
algebra, no Python.

Scale shape: every window is partitioned by the dimension key, so the
build is one hash shuffle on key + per-key sorts of that key's history
(bounded by per-entity event counts, not corpus size); the island
aggregate is partial-final.  The interval table is the input to
point-in-time lookups — which are exactly the as-of join
(operators/asof.py), so lookups need no range predicate here.

Cross-engine determinism: ordering is (time, tiebreak) with a unique
tiebreak column; the transition flag uses null-safe inequality so the
first row of every key opens an island on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_scd2(
    df: DataFrame,
    key_col: str,
    state_col: str,
    sec_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, state, valid_from, valid_to) — valid_to NULL on the open
    (current) interval; intervals are half-open [from, to)."""
    w = Window.partitionBy(key_col).orderBy(sec_col, tiebreak_col)
    run = Window.partitionBy(key_col).orderBy(sec_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag(F.col(state_col)).over(w)
    chg = F.when(
        prev.isNull() | (prev != F.col(state_col)), F.lit(1)
    ).otherwise(F.lit(0))
    islands = (
        df.select(key_col, state_col, sec_col, tiebreak_col)
        .withColumn("_chg", chg)
        .withColumn("_grp", F.sum("_chg").over(run))
        .groupBy(key_col, "_grp")
        .agg(
            F.min(state_col).alias("state"),
            F.min(sec_col).alias("valid_from"),
        )
    )
    nxt = Window.partitionBy(key_col).orderBy("valid_from")
    return islands.select(
        key_col,
        "state",
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
    )
