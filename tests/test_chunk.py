"""Overlapping token-window chunking (operators/chunk.py)."""

import pytest

from federated_gcn_spark.operators.chunk import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(spark):
    words = [f"w{i}" for i in range(10)]
    docs = _docs(spark, [(1, " ".join(words))])
    out = chunk_documents(docs, size=4, stride=3).collect()
    got = {r["chunk_id"]: (r["n_tokens"], r["chunk_text"]) for r in out}
    # starts 0,3,6,9 → windows [0:4),[3:7),[6:10),[9:10)
    assert got == {
        0: (4, "w0 w1 w2 w3"),
        1: (4, "w3 w4 w5 w6"),
        2: (4, "w6 w7 w8 w9"),
        3: (1, "w9"),
    }


def test_chunk_short_and_empty_docs(spark):
    docs = _docs(spark, [(1, "only two"), (2, ""), (3, "   ")])
    out = chunk_documents(docs, size=64, stride=48).collect()
    assert len(out) == 1  # empty/whitespace docs emit no chunks
    assert out[0]["doc_id"] == 1
    assert out[0]["n_tokens"] == 2 and out[0]["chunk_text"] == "only two"


def test_chunk_rejects_bad_params(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0, stride=3)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=0)


def test_chunk_no_shuffle(spark):
    # chunking must stay embarrassingly parallel: no Exchange in the plan
    docs = _docs(spark, [(1, "a b c d e")])
    plan = chunk_documents(docs, size=2, stride=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
