"""Exactly-once streaming upsert sink: replayed batches are no-ops on
state, committed batches become time-travelable versions."""

import os

from pyspark.sql import functions as F  # noqa: F401

from federated_gcn_spark.operators.upsert import (
    create_snapshot,
    read_snapshot,
    snapshot_versions,
)
from federated_gcn_spark.streaming.exactly_once import (
    applied_batches,
    exactly_once_upsert_sink,
    prune_ledger,
)


def _state(spark, table_dir):
    return {
        (r["k"], r["v"]) for r in read_snapshot(spark, table_dir).collect()
    }


def test_replayed_batch_is_noop_and_versions_advance(spark, tmp_path):
    table = str(tmp_path / "tbl")
    create_snapshot(
        spark, table, spark.createDataFrame([(1, "a")], "k long, v string")
    )
    sink = exactly_once_upsert_sink(table, ["k"])
    b0 = spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string")
    b1 = spark.createDataFrame([(3, "c")], "k long, v string")
    sink(b0, 0)
    assert _state(spark, table) == {(1, "A"), (2, "b")}
    # crash-retry: the SAME batch_id is offered again -> must be a no-op
    sink(b0, 0)
    assert snapshot_versions(table) == [0, 1]
    assert _state(spark, table) == {(1, "A"), (2, "b")}
    sink(b1, 1)
    assert _state(spark, table) == {(1, "A"), (2, "b"), (3, "c")}
    assert applied_batches(table) == [0, 1]
    # time travel: each committed batch is a version boundary
    assert {
        (r["k"], r["v"]) for r in read_snapshot(spark, table, 1).collect()
    } == {(1, "A"), (2, "b")}
    assert prune_ledger(table, keep_from_batch=1) == [0]
    assert applied_batches(table) == [1]


def test_end_to_end_stream_with_duplicate_key_batches(spark, tmp_path):
    """Drive a real availableNow stream through the sink; a batch with
    duplicate keys collapses via the upsert's last-writer-wins dedup."""
    table = str(tmp_path / "tbl")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    create_snapshot(
        spark, table, spark.createDataFrame([(0, 0)], "k long, v long")
    )
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "k long, v long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b"))
    import glob
    import shutil

    shutil.copy(
        glob.glob(str(tmp_path / "b" / "part-*.parquet"))[0],
        os.path.join(src, "f0.parquet"),
    )
    stream = spark.readStream.schema("k long, v long").parquet(src)
    q = (
        stream.writeStream.foreachBatch(
            exactly_once_upsert_sink(table, ["k"])
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _state(spark, table)
    assert (0, 0) in got and (2, 20) in got
    assert ((1, 11) in got) and ((1, 10) not in got)  # greatest v wins
    assert applied_batches(table) == [0]
