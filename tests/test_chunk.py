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


def test_chunk_reconstruction_property(spark):
    """For any doc: chunk 0 starts at token 0, consecutive chunks overlap
    by exactly size-stride, and stitching the non-overlapping parts
    reconstructs the token sequence exactly."""
    import random

    rng = random.Random(0)
    vocab = [f"t{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 90))))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    size, stride = 16, 12
    out = chunk_documents(docs, size=size, stride=stride).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    for doc_id, text in rows:
        toks = text.split()
        chunks = by_doc[doc_id]
        assert sorted(chunks) == list(range(len(chunks)))  # dense chunk ids
        rebuilt = []
        for cid in sorted(chunks):
            ctoks = chunks[cid]["chunk_text"].split()
            assert chunks[cid]["n_tokens"] == len(ctoks)
            assert ctoks == toks[cid * stride : cid * stride + size]
            rebuilt.extend(ctoks if cid == 0 else ctoks[size - stride :])
        assert rebuilt == toks
