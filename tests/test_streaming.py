"""Structured Streaming: windowed events + the FedAvg round barrier."""

import os
import shutil

import numpy as np

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


def test_watermark_drops_late_data(spark, tmp_path):
    """An event arriving in a later trigger, with event time older than
    (max seen - watermark), must be excluded from its window's final
    aggregate in append mode."""
    import pandas as pd

    from federated_gcn_spark.streaming.events import (
        read_events_stream,
        tumbling_value_agg,
    )

    src = tmp_path / "late_in"
    src.mkdir()
    hour_ns = 3_600_000_000_000
    def write_batch(name, rows):
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        ).to_parquet(src / name)

    # trigger 1: events at t=0h and t=2h -> watermark advances to 2h-10min
    write_batch("b1.parquet", [
        (1, 0, 1, "a", 1.0, "{}"),
        (2, 2 * hour_ns, 1, "a", 1.0, "{}"),
    ])
    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    agg = tumbling_value_agg(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 60
        while _t.time() < deadline and len(q.recentProgress) < 2:
            _t.sleep(1)
        # trigger 2: a late event for the t=0 window (event time far below
        # the 2h watermark) plus an on-time one
        write_batch("b2.parquet", [
            (3, 60_000_000_000, 1, "a", 100.0, "{}"),   # LATE: dropped
            (4, 2 * hour_ns + 60_000_000_000, 1, "a", 5.0, "{}"),
        ])
        deadline = _t.time() + 90
        done = False
        while _t.time() < deadline and not done:
            _t.sleep(2)
            rows = spark.sql("SELECT * FROM late_test").collect()
            done = any(r["window_start"].hour == 0 and r["window_start"].minute == 0
                       for r in rows)
        got = {
            (r["window_start"].hour, r["window_start"].minute): r["total_value"]
            for r in spark.sql("SELECT * FROM late_test").collect()
        }
    finally:
        q.stop()
    # the 00:00 window closed with ONLY the on-time event's value — the
    # late 100.0 never entered it
    assert got.get((0, 0)) == 1.0, got


def test_foreach_batch_fedavg_barrier(spark, tmp_path):
    """foreachBatch round loop: a round fires only once every client
    reported, and the average is example-weighted."""
    import time as _t

    import numpy as np

    from federated_gcn_spark.streaming.rounds import foreach_batch_fedavg

    src = tmp_path / "updates"
    src.mkdir()
    done: dict[int, dict] = {}
    q = foreach_batch_fedavg(spark, str(src), expected_clients=2,
                             on_round=lambda rn, w: done.__setitem__(rn, w))
    try:
        def write(name, client, values, n):
            spark.createDataFrame(
                [(0, client, 0, values, n)],
                "round int, client_id long, layer int, "
                "values array<double>, num_examples long",
            ).coalesce(1).write.mode("append").parquet(str(src))

        write("c1.parquet", 1, [1.0, 2.0], 3)
        deadline = _t.time() + 30
        while _t.time() < deadline and not q.recentProgress:
            _t.sleep(1)
        assert 0 not in done  # barrier holds at 1/2 clients
        write("c2.parquet", 2, [5.0, 6.0], 1)
        deadline = _t.time() + 60
        while _t.time() < deadline and 0 not in done:
            _t.sleep(1)
    finally:
        q.stop()
    assert 0 in done
    # weighted: (3*[1,2] + 1*[5,6]) / 4 = [2, 3]
    np.testing.assert_allclose(done[0][0], [2.0, 3.0])


def test_streaming_dedup_drops_within_watermark(spark, tmp_path):
    """A document re-arriving (same content) in a later micro-batch is
    dropped; distinct content passes."""
    import time as _t

    from federated_gcn_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "docs_in"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, event_time timestamp"
        ).coalesce(1).write.mode("append").parquet(str(src))

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("event_time", TimestampType()),
    ])
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    write("b1.parquet", [(1, "hello world", t0), (2, "unique doc", t0)])
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_exact_dedup(stream, watermark="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _t.time() + 30
        while _t.time() < deadline and not q.recentProgress:
            _t.sleep(1)
        # batch 2: doc 3 duplicates doc 1's content (whitespace-normalized),
        # doc 4 is new
        write("b2.parquet", [
            (3, "hello   world", t0 + dt.timedelta(minutes=1)),
            (4, "another doc", t0 + dt.timedelta(minutes=1)),
        ])
        deadline = _t.time() + 60
        seen = set()
        while _t.time() < deadline and 4 not in seen:
            _t.sleep(2)
            seen = {r["doc_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()}
    finally:
        q.stop()
    assert 1 in seen and 2 in seen and 4 in seen
    assert 3 not in seen  # near-identical re-arrival dropped


def test_streaming_dedup_batch_fallback(spark):
    from federated_gcn_spark.streaming.dedup import streaming_exact_dedup

    df = spark.createDataFrame(
        [(1, "a b", None), (2, "a   b", None), (3, "c", None)],
        "doc_id long, text string, event_time timestamp",
    )
    kept = {r["doc_id"] for r in streaming_exact_dedup(df).collect()}
    assert len(kept) == 2 and 3 in kept


def test_streaming_curation_filters_and_dedups(spark, tmp_path):
    """Curation-at-ingest: junk (short/low-quality) never reaches the sink,
    re-arrived content is dropped, survivors carry their scores."""
    import datetime as dt
    import time as _t

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from federated_gcn_spark.streaming.curation import streaming_curation

    src = tmp_path / "curation_in"
    src.mkdir()
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("event_time", TimestampType()),
    ])

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    good = "the quick brown fox jumps over the lazy dog and runs to the hills"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    write([(1, good, t0), (2, "too short", t0)])
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = streaming_curation(stream, watermark="1 hour", min_tokens=5)
    q = (
        out.writeStream.format("memory")
        .queryName("curation_stream")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _t.time() + 30
        while _t.time() < deadline and not q.recentProgress:
            _t.sleep(1)
        # batch 2: doc 3 re-sends doc 1's content; doc 4 is new good content
        good2 = "a second good document with the usual amount of plain words in it"
        write([
            (3, good, t0 + dt.timedelta(minutes=1)),
            (4, good2, t0 + dt.timedelta(minutes=1)),
        ])
        deadline = _t.time() + 60
        rows = {}
        while _t.time() < deadline and 4 not in rows:
            _t.sleep(2)
            rows = {
                r["doc_id"]: r
                for r in spark.sql("SELECT * FROM curation_stream").collect()
            }
    finally:
        q.stop()
    assert set(rows) == {1, 4}  # junk (2) filtered, duplicate (3) dropped
    assert rows[1]["n_tokens"] == 14 and rows[1]["quality"] > 0.5
    assert rows[1]["pred_lang"] == "en"


def test_streaming_curation_batch_fallback(spark):
    from federated_gcn_spark.streaming.curation import streaming_curation

    good = "the quick brown fox jumps over the lazy dog and runs to the hills"
    df = spark.createDataFrame(
        [(1, good, None), (2, good + " ", None), (3, "meh", None)],
        "doc_id long, text string, event_time timestamp",
    )
    kept = {r["doc_id"] for r in streaming_curation(df, min_tokens=5).collect()}
    assert len(kept) == 1 and kept <= {1, 2}


def test_stream_checkpoint_restart_processes_each_file_once(spark, tmp_path):
    """Restarting a checkpointed stream resumes from the offset log:
    files ingested before the restart are not re-processed, new files
    are — exactly-once ingestion across restarts."""
    import pandas as pd

    from federated_gcn_spark.streaming.events import read_events_stream

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(name, ids):
        pd.DataFrame(
            {
                "event_id": ids,
                "ts": pd.to_datetime("2026-01-01").as_unit("us"),
                "user_id": [1] * len(ids),
                "event_type": ["view"] * len(ids),
                "value": [1.0] * len(ids),
                "props": ["{}"] * len(ids),
            }
        ).to_parquet(src / f"{name}.parquet")

    def drain():
        q = (
            read_events_stream(spark, str(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("a", [1, 2, 3])
    drain()
    write_batch("b", [4, 5])
    drain()  # restart from checkpoint; must only pick up file b

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3, 4, 5]  # no re-processing, no loss
