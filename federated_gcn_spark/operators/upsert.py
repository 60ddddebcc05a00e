"""MERGE INTO (upsert) semantics over immutable columnar snapshots.

The lakehouse write primitive: apply a batch of updates/inserts to a
keyed table — matched keys take the update's values, unmatched update
keys insert, everything else carries over (optionally: matched keys in
a delete set drop). Delta/Iceberg spell this MERGE INTO; on plain
parquet the engine computes the merged RESULT relationally and swaps
the snapshot directory atomically (rename-aside, same crash-safe dance
as catalog.compact_parquet).

Scale shape: one full-outer-shaped pass — implemented as
(base left_anti updates) ∪ updates — so cost is one anti join keyed on
the merge key (AQE broadcasts the update side when it is a trickle,
which is the common case) plus a write of the new snapshot. Updates
win wholesale (last-writer-wins per key); for column-level merges
compose with operators/incremental.py state algebra instead.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    deletes: DataFrame | None = None,
) -> DataFrame:
    """The merged relation: updates replace matched keys, insert
    otherwise; keys present in ``deletes`` (a key-only DataFrame) are
    dropped from the base and NOT re-inserted."""
    survivors = base.join(updates.select(*keys), keys, "left_anti")
    if deletes is not None:
        survivors = survivors.join(deletes.select(*keys), keys, "left_anti")
        updates = updates.join(deletes.select(*keys), keys, "left_anti")
    return survivors.unionByName(updates)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    deletes: DataFrame | None = None,
) -> None:
    """MERGE INTO a parquet snapshot directory, atomically-enough.

    Writes the merged result to a temp dir, renames the live dir aside,
    renames the new one in, then deletes the old — a crash at any point
    leaves either the old or the new complete snapshot on disk (the
    rename-aside protocol adopted after the round-2 compact_parquet
    review).
    """
    base = spark.read.parquet(path)
    merged = merge_upsert(base, updates, keys, deletes)
    tmp = f"{path}__upsert_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def upsert_stats(
    base: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """One-row audit of what a merge WOULD do: matched (update), new
    (insert), and carried-over counts — the dry-run every production
    MERGE pipeline logs."""
    b = base.select(*keys)
    u = updates.select(*keys)
    n_base = b.agg(F.count(F.lit(1)).alias("n_base"))
    n_upd = u.agg(F.count(F.lit(1)).alias("n_updates"))
    matched = u.join(b, keys, "left_semi").agg(
        F.count(F.lit(1)).alias("n_matched")
    )
    return (
        n_base.crossJoin(n_upd)
        .crossJoin(matched)
        .select(
            "n_base",
            "n_updates",
            "n_matched",
            (F.col("n_updates") - F.col("n_matched")).alias("n_inserted"),
            (F.col("n_base") - F.col("n_matched")).alias("n_carried"),
        )
    )
