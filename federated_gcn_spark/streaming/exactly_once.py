"""Exactly-once streaming upsert sink: foreachBatch + idempotent MERGE.

Structured Streaming's file/kafka sources give at-least-once delivery to
``foreachBatch`` — after a crash the SAME (batch_id, data) can be
re-offered.  The standard production pattern for an exactly-once TABLE
is therefore an idempotent batch apply: track applied batch_ids in a
ledger next to the versioned table; a replayed batch is recognized and
skipped, so the merged state advances exactly once per logical batch.

Composition, not new machinery: the apply step IS
``operators/upsert.upsert_versioned`` (key-deduped last-writer-wins
MERGE into an immutable snapshot chain), so every committed batch is
also a time-travelable version — the CDC diff between version v and
v+1 is exactly batch v's effect.

Crash-window contract (documented, test-pinned): the ledger marker is
written AFTER the version commit.  A crash between the two re-applies
the batch on retry, producing a duplicate VERSION whose merged state is
identical (MERGE of the same key-deduped batch is idempotent on state)
— state is exactly-once, version history is at-least-once.  This is the
same trade Delta's txn-version ledger makes, spelled on plain parquet.

Scale shape: per micro-batch one anti-join-shaped MERGE (AQE broadcasts
trickle batches) + one ledger touch; nothing driver-side grows with the
corpus — the ledger grows with batch COUNT and can be pruned below the
checkpoint's committed offset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _marker_path(table_dir: str, batch_id: int) -> str:
    return os.path.join(table_dir, f"_applied_batch_{batch_id:012d}")


def applied_batches(table_dir: str) -> list[int]:
    """Batch ids the sink has fully committed (ledger scan)."""
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        if name.startswith("_applied_batch_"):
            try:
                out.append(int(name.rsplit("_", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def exactly_once_upsert_sink(table_dir: str, keys: list[str]):
    """Return a ``foreachBatch`` function applying each micro-batch as
    an idempotent versioned MERGE INTO ``table_dir`` on ``keys``.

    Usage::

        q = (stream.writeStream
             .foreachBatch(exactly_once_upsert_sink(dir, ["k"]))
             .option("checkpointLocation", ckpt)
             .start())
    """
    from federated_gcn_spark.operators.upsert import upsert_versioned

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        marker = _marker_path(table_dir, batch_id)
        if os.path.exists(marker):
            return  # replayed batch: already fully committed
        version = upsert_versioned(
            batch_df.sparkSession, table_dir, batch_df, keys
        )
        with open(marker, "w") as fh:
            fh.write(str(version))

    return apply


def prune_ledger(table_dir: str, keep_from_batch: int) -> list[int]:
    """Drop ledger markers below ``keep_from_batch`` (all offsets at or
    below it are already committed in the stream checkpoint, so replays
    below it are impossible).  Returns the pruned batch ids."""
    pruned = []
    for b in applied_batches(table_dir):
        if b < keep_from_batch:
            os.remove(_marker_path(table_dir, b))
            pruned.append(b)
    return pruned
