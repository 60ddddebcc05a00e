"""Scalar/array/text expression builders."""

import math

from pyspark.sql import functions as F

from federated_gcn_spark.functions import (
    array_dot,
    cosine_similarity,
    f1_score,
    mem_cost_gb,
    quality_score,
    token_count,
)
from federated_gcn_spark.functions.text import lang_id, shingles


def test_array_dot_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        array_dot("a", "b").alias("dot"),
        cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row["dot"] == 32.0
    expected = 32.0 / (math.sqrt(14) * math.sqrt(77))
    assert abs(row["cos"] - expected) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], "a array<double>, b array<double>")
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] is None


def test_f1_guard(spark):
    df = spark.createDataFrame([(0.5, 0.25), (0.0, 0.0)], "p double, r double")
    rows = df.select(f1_score(F.col("p"), F.col("r")).alias("f1")).collect()
    vals = sorted([r["f1"] for r in rows], key=lambda v: (v is None, v))
    assert abs(vals[0] - (2 * 0.5 * 0.25 / 0.75)) < 1e-12
    assert vals[1] is None  # 0/0 → "undefined" (fl_client.py:132-137)


def test_mem_cost_matches_reference_formula(spark):
    # mem.py example: partition with 1452 nodes, 2383 edges, F=1433, 64-bit
    df = spark.createDataFrame([(1452, 2383)], "n long, e long")
    got = df.select(
        mem_cost_gb(F.col("n"), F.col("e"), 1433, 64, 64).alias("gb")
    ).first()["gb"]
    graph_gb = (2 * 2383 * 64 / 8 + 1452 * 1433 * 64 / 8) / 2**30
    assert abs(got - (3.6 * graph_gb + 2)) < 1e-9


def test_text_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, ""), (3, "   "), (4, "der und das ist die")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("n"),
            lang_id("text").alias("lang"),
            quality_score("text").alias("q"),
        ).collect()
    }
    assert rows[1]["n"] == 5 and rows[1]["lang"] == "en"
    assert rows[2]["n"] == 0 and rows[2]["lang"] == "und"
    assert rows[3]["n"] == 0
    assert rows[4]["lang"] == "de"
    assert 0.0 <= rows[1]["q"] <= 1.0


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "doc_id long, text string")
    rows = {r["doc_id"]: r["sh"] for r in df.select("doc_id", shingles("text", 3).alias("sh")).collect()}
    assert rows[1] == ["a b c", "b c d"]
    assert rows[2] == ["a b"]  # shorter than k → whole text


def test_partitioned_prefix_sum_matches_serial(spark):
    import random

    from pyspark.sql import functions as F

    from federated_gcn_spark.operators.stats import partitioned_prefix_sum

    rng = random.Random(7)
    rows = [(float(rng.randrange(0, 500)), rng.randrange(0, 10)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "k double, v long")
    # serial truth: exclusive prefix sum over k-order; ties share a k, so
    # compare at distinct-k granularity (the binary_auc use case)
    g = df.groupBy("k").agg(F.sum("v").alias("v"))
    # force the distributed two-pass path (small_input_rows=0) AND take
    # the small-input single-task path; both must match the serial truth
    for kwargs in ({"small_input_rows": 0}, {}):
        got = {
            r["k"]: r["ps"]
            for r in partitioned_prefix_sum(
                g, "k", "v", "ps", num_partitions=16, **kwargs
            ).collect()
        }
        data = sorted(((r["k"], r["v"]) for r in g.collect()))
        acc = 0
        for k, v in data:
            assert got[k] == acc, f"prefix sum mismatch at k={k} ({kwargs})"
            acc += v


def test_binary_auc_matches_sklearn_formula(spark):
    import random

    from federated_gcn_spark.operators.stats import binary_auc

    rng = random.Random(11)
    rows = [(rng.gauss(r, 1.0), r) for r in (rng.randrange(2) for _ in range(3000))]
    df = spark.createDataFrame(rows, "score double, y int")
    got = binary_auc(df, "score", "y").collect()[0]["auc"]
    # reference: O(n log n) rank-sum with average ranks
    data = sorted(df.collect(), key=lambda r: r["score"])
    n = len(data)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and data[j]["score"] == data[i]["score"]:
            j += 1
        avg_rank = (i + 1 + j) / 2.0
        for t in range(i, j):
            ranks[t] = avg_rank
        i = j
    pos = [t for t in range(n) if data[t]["y"] == 1]
    np_, nn_ = len(pos), n - len(pos)
    u = sum(ranks[t] for t in pos) - np_ * (np_ + 1) / 2.0
    assert abs(got - u / (np_ * nn_)) < 1e-6
