"""Structured Streaming: windowed events + the FedAvg round barrier."""

import os
import shutil
import time

import numpy as np
import pytest

from federated_gcn_spark.plans.queries import events_tumbling
from federated_gcn_spark.streaming import (
    read_events_stream,
    streaming_fedavg,
    tumbling_value_agg,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_tumbling_matches_batch(spark, tmp_path):
    """Streaming 5-min windows over the events parquet == the batch twin."""
    events_dir = str(tmp_path / "events_in")  # file sources need a directory
    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).write.parquet(events_dir)
    stream = read_events_stream(spark, events_dir)
    agg = tumbling_value_agg(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (int(r["window_start"].timestamp()), r["event_type"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.sql("select * from t_stream_tumbling").collect()
    }
    batch = {
        (r["bucket_start_sec"], r["event_type"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in events_tumbling(spark, SF_DIR).collect()
    }
    assert got == batch


def test_streaming_fedavg_barrier(spark, tmp_path):
    """Client updates arriving as files; the barrier fires only when all
    expected clients reported (fl_server.py:65 semantics)."""
    updates_dir = str(tmp_path / "updates")
    os.makedirs(updates_dir)
    w_a = [1.0, 2.0, 3.0]
    w_b = [3.0, 6.0, 9.0]
    # client A (n=1) and client B (n=3) for round 0, layer 0
    df = spark.createDataFrame(
        [
            (0, 1, 0, w_a, 1),
            (0, 2, 0, w_b, 3),
        ],
        "round int, client_id long, layer int, values array<double>, num_examples long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(updates_dir)

    out = streaming_fedavg(spark, updates_dir, expected_clients=2)
    q = (
        out.writeStream.format("memory")
        .queryName("t_fedavg_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from t_fedavg_stream").collect()
    assert len(rows) == 1
    got = np.array(rows[0]["values"])
    expected = (1 * np.array(w_a) + 3 * np.array(w_b)) / 4
    np.testing.assert_allclose(got, expected)
    assert rows[0]["n_clients"] == 2


def test_streaming_fedavg_incomplete_round_stays_pending(spark, tmp_path):
    updates_dir = str(tmp_path / "updates2")
    os.makedirs(updates_dir)
    df = spark.createDataFrame(
        [(0, 1, 0, [1.0], 1)],
        "round int, client_id long, layer int, values array<double>, num_examples long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(updates_dir)
    out = streaming_fedavg(spark, updates_dir, expected_clients=2)
    q = (
        out.writeStream.format("memory")
        .queryName("t_fedavg_pending")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("select * from t_fedavg_pending").count() == 0  # barrier holds


def test_stream_sessions_match_batch(spark, tmp_path):
    """session_window produces identical sessions when the same rows
    arrive as a stream (with watermark) and as a batch table."""
    import shutil

    from federated_gcn_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        session_value_agg,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    dst = tmp_path / "events_in"
    dst.mkdir()
    shutil.copy(src, dst / "part-0.parquet")

    stream = read_events_stream(spark, str(dst))
    q = run_available_now(session_value_agg(stream), "sess_stream")
    try:
        got = {
            (r["user_id"], r["session_start"], r["n_events"])
            for r in spark.table("sess_stream").collect()
        }
    finally:
        q.stop()
    batch = session_value_agg(spark.read.parquet(str(dst)))
    want = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    assert got == want and len(got) > 0
