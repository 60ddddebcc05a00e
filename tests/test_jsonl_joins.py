"""JSONL source/sink roundtrip + watermarked stream-stream join."""

import os

from pyspark.sql import functions as F

from federated_gcn_spark.sources.jsonl import (
    corrupt_line_stats,
    read_jsonl,
    write_jsonl,
)
from federated_gcn_spark.streaming.events import read_events_stream
from federated_gcn_spark.streaming.joins import purchase_view_attribution

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_documents(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, drop_malformed=True)
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "shard"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    df = read_jsonl(spark, str(p))
    stats = corrupt_line_stats(df).collect()[0]
    assert stats["n_rows"] == 3
    assert stats["n_corrupt"] == 1
    clean = read_jsonl(spark, str(p), drop_malformed=True)
    assert {r["doc_id"] for r in clean.collect() if r["doc_id"] is not None} == {1, 2}


def test_stream_attribution_matches_batch(spark, tmp_path):
    """Stream-stream interval join == the same join run in batch."""
    src = str(tmp_path / "events_in")
    spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).write.parquet(src)

    batch = purchase_view_attribution(spark.read.parquet(src))
    want = {
        (r["purchase_id"], r["view_id"]) for r in batch.collect()
    }
    assert len(want) > 0  # the window must actually match something

    stream = read_events_stream(spark, src)
    joined = purchase_view_attribution(stream)
    q = (
        joined.writeStream.format("memory")
        .queryName("t_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["view_id"])
        for r in spark.sql("select * from t_attr").collect()
    }
    assert got == want
