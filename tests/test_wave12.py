"""Round-4 wave-12 queries vs pure-python references: Theil index,
Friedman test, Pettitt changepoint, harmonic centrality."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_theil_index_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT c_nationkey, o_custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON o_custkey = c_custkey
            GROUP BY 1, 2"""
    ).fetchall()
    names = dict(
        con.execute(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF_DIR}/nation.parquet')"
        ).fetchall()
    )
    con.close()
    per = defaultdict(list)
    for nk, _, x in rows:
        per[nk].append(x)
    got = {r["n_name"]: r for r in QUERIES["theil_index"](spark, SF_DIR).collect()}
    assert set(got) == {names[nk] for nk in per}
    for nk, xs in per.items():
        n = len(xs)
        mu = sum(xs) / n
        theil = sum((x / mu) * math.log(x / mu) for x in xs) / n
        r = got[names[nk]]
        assert r["n_customers"] == n
        assert r["mean_spend_c"] == sum(xs) // n
        assert r["theil_t"] == pytest.approx(theil, abs=1e-4)
        assert r["theil_t"] >= -1e-6  # Theil is non-negative


def test_friedman_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT strftime(o_orderdate, '%Y-%m'), o_orderpriority,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    blocks = defaultdict(dict)
    for m, p, v in rows:
        blocks[m][p] = v
    complete = {m: d for m, d in blocks.items() if len(d) == 5}
    n, k = len(complete), 5
    rank_sums = defaultdict(float)
    for d in complete.values():
        vals = sorted(d.values())
        for p, v in d.items():
            lt = sum(1 for w in vals if w < v)
            eq = sum(1 for w in vals if w == v)
            rank_sums[p] += lt + (eq + 1) / 2  # tie-average rank
    chi2 = 12 / (n * k * (k + 1)) * sum(r * r for r in rank_sums.values()) - 3 * n * (
        k + 1
    )
    r = QUERIES["friedman_test"](spark, SF_DIR).collect()[0]
    assert r["n_blocks"] == n
    assert r["k_treatments"] == k
    assert r["min_r2"] == round(2 * min(rank_sums.values()))
    assert r["max_r2"] == round(2 * max(rank_sums.values()))
    assert r["chi2_friedman"] == pytest.approx(chi2, abs=1e-4)


def test_pettitt_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    days = [d for d, _ in rows]
    xs = [v for _, v in rows]
    n = len(xs)
    # brute-force Pettitt: U_t = sum_{i<=t} sum_{j>t} sign(x_j - x_i)
    best_k, best_day = -1.0, None
    for t in range(1, n):
        u = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_day = abs(u), days[t - 1]
    p = 2 * math.exp(-6 * best_k**2 / (n**3 + n**2))
    r = QUERIES["pettitt_changepoint"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["change_day"] == best_day
    assert r["k_stat"] == best_k  # exact: doubled-rank U is the sign-sum U
    assert r["p_approx"] == pytest.approx(p, rel=1e-6, abs=1e-9)


def test_harmonic_centrality_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 50 = 0"""
    ).fetchall()
    con.close()
    adj = defaultdict(set)
    for a, b in rows:
        adj[a].add(b)
        adj[b].add(a)
    sources = sorted(adj)[:4]
    got = {r["source"]: r for r in QUERIES["harmonic_centrality"](spark, SF_DIR).collect()}
    assert set(got) == set(sources)
    for s in sources:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 7):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        hc = sum(1 / d for v, d in dist.items() if d > 0)
        r = got[s]
        assert r["n_reached"] == len(dist) - 1
        assert r["harmonic_c"] == pytest.approx(hc, abs=1e-5)
