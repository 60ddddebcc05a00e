"""Round-4 wave-8 queries vs pure-python references: sequence support,
silhouette, sketch error harnesses, WOE/IV."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_sequence_support_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_type, epoch_ns(ts) // 1000000000
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    con.close()
    mn, mx = {}, {}
    users = set()
    for uid, et, sec in rows:
        users.add(uid)
        mn[(uid, et)] = min(mn.get((uid, et), sec), sec)
        mx[(uid, et)] = max(mx.get((uid, et), sec), sec)
    per_user_types = defaultdict(set)
    for uid, et in mn:
        per_user_types[uid].add(et)
    support = Counter()
    for uid, types in per_user_types.items():
        for a in types:
            for b in types:
                if a != b and mn[(uid, a)] < mx[(uid, b)]:
                    support[(a, b)] += 1
    got = {
        (r["first_type"], r["then_type"]): r
        for r in QUERIES["sequence_support_pairs"](spark, SF_DIR).collect()
    }
    assert set(got) == set(support)
    for k, r in got.items():
        assert r["n_supporting"] == support[k]
        assert r["support"] == pytest.approx(
            support[k] / len(users), rel=1e-12
        )


def test_silhouette_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT vec_id, label, embedding
            FROM read_parquet('{SF_DIR}/embeddings.parquet')"""
    ).fetchall()
    con.close()
    pts = [(v, l, [round(float(x), 9) for x in e]) for v, l, e in rows]
    dim = len(pts[0][2])
    by_label = defaultdict(list)
    for _, l, e in pts:
        by_label[l].append(e)
    cents = {
        l: [sum(e[i] for e in es) / len(es) for i in range(dim)]
        for l, es in by_label.items()
    }
    sums = Counter()
    counts = Counter()
    for _, own, e in pts:
        dd = {
            l: sum(round((x - c) ** 2, 12) for x, c in zip(e, cents[l]))
            for l in cents
        }
        a = math.sqrt(dd[own])
        b = math.sqrt(min(v for l, v in dd.items() if l != own))
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        sums[own] += round(s, 9)
        counts[own] += 1
    got = {
        r["label"]: r
        for r in QUERIES["clustering_silhouette"](spark, SF_DIR).collect()
    }
    assert set(got) == set(counts)
    for l, r in got.items():
        assert r["n_points"] == counts[l]
        assert r["mean_silhouette"] == pytest.approx(
            sums[l] / counts[l], abs=1e-7
        )


def test_hll_error_consistency(spark):
    con = duckdb.connect()
    exact = dict(
        con.execute(
            f"""SELECT event_type, COUNT(DISTINCT user_id)
                FROM read_parquet('{SF_DIR}/events.parquet')
                GROUP BY event_type"""
        ).fetchall()
    )
    con.close()
    parent = {
        r["event_type"]: r
        for r in QUERIES["hll_replay_cardinality"](spark, SF_DIR).collect()
    }
    got = QUERIES["hll_error_report"](spark, SF_DIR).collect()
    assert {r["event_type"] for r in got} == set(exact)
    m = 128
    for r in got:
        p = parent[r["event_type"]]
        assert r["exact_distinct"] == exact[r["event_type"]]
        assert r["est_raw"] == p["est_distinct"]
        zeros = m - p["nonzero_regs"]
        if p["est_distinct"] <= 2.5 * m and zeros > 0:
            expect = round(m * math.log(m / zeros), 2)
        else:
            expect = p["est_distinct"]
        assert r["est_corrected"] == pytest.approx(expect, abs=1e-9)
        assert r["rel_error"] == pytest.approx(
            (r["est_corrected"] - r["exact_distinct"]) / r["exact_distinct"],
            rel=1e-12,
        )
        # linear-counting regime at this sf: tight; raw regime 3-sigma
        # ~ 27% — either way a broken register pipeline blows this
        assert abs(r["rel_error"]) < 0.3


def test_kmv_error_consistency(spark):
    con = duckdb.connect()
    (exact,) = con.execute(
        f"""SELECT COUNT(DISTINCT user_id)
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchone()
    con.close()
    r = QUERIES["kmv_error_report"](spark, SF_DIR).collect()[0]
    assert r["exact_distinct"] == exact
    assert r["rel_error"] == pytest.approx(
        (r["est_distinct"] - exact) / exact, rel=1e-12
    )
    assert abs(r["rel_error"]) < 0.75  # k=32: 3-sigma ~ 55%


def test_woe_iv_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT),
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).fetchall()
    con.close()
    n_k, pos_k = Counter(), Counter()
    for b, y in rows:
        n_k[b] += 1
        pos_k[b] += y
    pos = sum(pos_k.values())
    neg = sum(n_k.values()) - pos
    kept = [
        b for b in n_k if pos_k[b] > 0 and (n_k[b] - pos_k[b]) > 0
    ]
    iv = 0.0
    woe = {}
    for b in kept:
        nk, pk = n_k[b], pos_k[b]
        gk = nk - pk
        woe[b] = math.log((pk * neg) / (gk * pos))
        iv += round((pk / pos - gk / neg) * woe[b], 9)
    got = {
        r["score_bin"]: r for r in QUERIES["woe_iv_binning"](spark, SF_DIR).collect()
    }
    assert set(got) == set(kept)
    for b, r in got.items():
        assert r["n_k"] == n_k[b]
        assert r["pos_k"] == pos_k[b]
        assert r["neg_k"] == n_k[b] - pos_k[b]
        assert r["woe"] == pytest.approx(round(woe[b], 6), abs=1e-9)
        assert r["information_value"] == pytest.approx(iv, abs=1e-7)
        assert r["information_value"] >= 0
