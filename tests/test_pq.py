"""Product quantization: code validity, layout independence, ADC
recall against exact L2 top-k."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from federated_gcn_spark.operators.pq import PQIndex

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codes_in_range_and_layout_independent(spark, emb):
    idx = PQIndex(emb, n_sub=4, n_codes=8, train_iters=1)
    a = {r["vec_id"]: list(r["codes"]) for r in idx.encode(emb).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in idx.encode(emb.repartition(7, "vec_id")).collect()
    }
    assert a == b
    for codes in a.values():
        assert len(codes) == 4
        assert all(0 <= c < 8 for c in codes)


def test_adc_recall_against_exact_l2(spark, emb):
    rows = emb.collect()
    X = np.array([list(r["embedding"]) for r in rows], dtype="float64")
    ids = np.array([r["vec_id"] for r in rows])
    q = X[list(ids).index(3)]
    exact = set(ids[np.argsort(((X - q) ** 2).sum(axis=1))[:10]])

    idx = PQIndex(emb, n_sub=8, n_codes=16, train_iters=2)
    got = {
        r["vec_id"]
        for r in idx.adc_topk(idx.encode(emb), [float(v) for v in q], k=10).collect()
    }
    # Isotropic random 64-dim embeddings are PQ's worst case (near-
    # equidistant points, no cluster structure): recall@10 of 0.3+ is
    # already ~15x over the 10/500 chance floor; real clustered
    # corpora do far better.
    assert len(exact & got) >= 3
    assert 3 in got  # the query itself must be its own near-neighbor


def test_training_reduces_quantization_error(spark, emb):
    def qerr(idx):
        C = idx.centroids
        enc = idx.encode(emb).collect()
        tot = 0.0
        for r in enc:
            x = np.array(list(r["embedding"]))
            for s in range(idx.n_sub):
                c = C[s, r["codes"][s]]
                xs = x[s * idx.sub_dim : (s + 1) * idx.sub_dim]
                tot += ((xs - c) ** 2).sum()
        return tot

    untrained = PQIndex(emb, n_sub=4, n_codes=8, train_iters=0)
    trained = PQIndex(emb, n_sub=4, n_codes=8, train_iters=3)
    assert qerr(trained) < qerr(untrained)
