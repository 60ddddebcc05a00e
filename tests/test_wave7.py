"""Round-4 wave-7 queries vs pure-python references: path trigrams,
vocabulary coverage, Brier decomposition, NDCG, rich club."""

from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_event_path_trigrams_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_type, event_id,
                   epoch_ns(ts) // 1000000000
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    con.close()
    journeys = defaultdict(list)
    for uid, et, eid, sec in rows:
        journeys[uid].append((sec, eid, et))
    tri = Counter()
    for js in journeys.values():
        js.sort()
        types = [et for _, _, et in js]
        for i in range(len(types) - 2):
            tri[tuple(types[i:i + 3])] += 1
    top = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        ((r["step1"], r["step2"], r["step3"]), r["n_paths"])
        for r in QUERIES["event_path_trigrams"](spark, SF_DIR).collect()
    ]
    assert got == top


def test_unseen_vocab_mass_matches_python(spark):
    con = duckdb.connect()
    texts = con.execute(
        f"""SELECT LOWER(TRIM(text))
            FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE TRIM(text) <> ''"""
    ).fetchall()
    con.close()
    freq = Counter()
    for (t,) in texts:
        freq.update(t.split())
    d = len(freq)
    n = sum(freq.values())
    f1 = sum(1 for v in freq.values() if v == 1)
    f2 = sum(1 for v in freq.values() if v == 2)
    row = QUERIES["unseen_vocab_mass"](spark, SF_DIR).collect()[0]
    assert row["vocab_size"] == d
    assert row["n_tokens"] == n
    assert row["hapax_count"] == f1
    assert row["dis_count"] == f2
    assert row["chao1_richness"] == pytest.approx(
        d + f1 * (f1 - 1) / (2 * (f2 + 1)), rel=1e-12
    )
    assert row["unseen_mass_gt"] == pytest.approx(f1 / n, rel=1e-12)


def test_brier_decomposition_matches_python(spark):
    """Decomposition math vs python on the same folded bins (folds
    pulled through Spark so the hash replay itself is the oracle's
    job, not this test's)."""
    from pyspark.sql import functions as F

    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            F.floor(F.col("l_extendedprice") / 10000).cast("long").alias("b"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
            F.pmod(
                F.xxhash64(F.col("l_orderkey"),
                           F.col("l_linenumber").cast("long")),
                F.lit(2),
            ).alias("fold"),
        )
        .collect()
    )
    train_n, train_pos = Counter(), Counter()
    test_n, test_pos = Counter(), Counter()
    for r in li:
        if r["fold"] == 0:
            train_n[r["b"]] += 1
            train_pos[r["b"]] += r["y"]
        else:
            test_n[r["b"]] += 1
            test_pos[r["b"]] += r["y"]
    bins = sorted(set(train_n) & set(test_n))
    n = sum(test_n[b] for b in bins)
    pos = sum(test_pos[b] for b in bins)
    ybar = pos / n
    brier = rel = res = ece = 0.0
    for b in bins:
        p = train_pos[b] / train_n[b]
        yk = test_pos[b] / test_n[b]
        nk, pk = test_n[b], test_pos[b]
        brier += round(nk * p * p - 2 * p * pk + pk, 9)
        rel += round(nk * (p - yk) ** 2, 9)
        res += round(nk * (yk - ybar) ** 2, 9)
        ece += round(nk * abs(p - yk), 9)
    row = QUERIES["brier_calibration_report"](spark, SF_DIR).collect()[0]
    assert row["n_test"] == n
    assert row["n_bins"] == len(bins)
    assert row["brier"] == pytest.approx(brier / n, rel=1e-9)
    assert row["reliability"] == pytest.approx(rel / n, rel=1e-9)
    assert row["resolution"] == pytest.approx(res / n, rel=1e-9)
    assert row["uncertainty"] == pytest.approx(ybar * (1 - ybar), rel=1e-12)
    assert row["ece"] == pytest.approx(ece / n, rel=1e-9)
    # Murphy identity (approximate under per-bin rounding)
    assert row["brier"] == pytest.approx(
        row["reliability"] - row["resolution"] + row["uncertainty"], abs=1e-6
    )


def test_ann_ndcg_consistent_with_recall(spark):
    """Same overlap count as the recall report; NDCG in [0, 1]; equals
    the python DCG over the approx ranking with the same 9-dp
    discounts."""
    recall = QUERIES["ann_recall_report"](spark, SF_DIR).collect()[0]
    ndcg = QUERIES["ann_ndcg_report"](spark, SF_DIR).collect()[0]
    assert ndcg["n_overlap"] == recall["n_overlap"]
    assert 0.0 <= ndcg["ndcg_at_k"] <= 1.0

    from federated_gcn_spark.plans.queries import ann_topk_q, similarity_topk

    brute = {r["vec_id"] for r in similarity_topk(spark, SF_DIR).collect()}
    approx = sorted(
        ann_topk_q(spark, SF_DIR).collect(),
        key=lambda r: (-r["cos_sim"], r["vec_id"]),
    )
    disc = [1.0, 0.630929754, 0.5, 0.430676558, 0.386852807,
            0.356207187, 0.333333333, 0.315464877, 0.301029996, 0.289064826]
    dcg = sum(
        disc[i] for i, r in enumerate(approx) if r["vec_id"] in brute
    )
    assert ndcg["ndcg_at_k"] == pytest.approx(dcg / sum(disc), rel=1e-9)


def test_rich_club_matches_python(spark):
    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 20 = 0"""
    ).fetchall()
    con.close()
    deg = Counter()
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    got = {
        r["k"]: r for r in QUERIES["rich_club_coefficient"](spark, SF_DIR).collect()
    }
    assert set(got) == {2, 4, 8}
    for k in (2, 4, 8):
        n_rich = sum(1 for v in deg.values() if v > k)
        e_rich = sum(1 for s, d in edges if deg[s] > k and deg[d] > k)
        r = got[k]
        assert r["n_rich"] == n_rich
        assert r["e_rich"] == e_rich
        if n_rich >= 2:
            assert r["phi"] == pytest.approx(
                2 * e_rich / (n_rich * (n_rich - 1)), rel=1e-12
            )
        else:
            assert r["phi"] is None
