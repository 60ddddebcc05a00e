"""Round-4 wave-16 queries vs pure-python references: Kendall tau-b,
session entropy, SES grid search, degree Gini."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _daily_xy():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
                   COUNT(*)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    return rows


def test_kendall_tau_matches_python(spark):
    rows = _daily_xy()
    c = d = tx = ty = 0
    n = len(rows)
    for i in range(n):
        for j in range(i + 1, n):
            dx = rows[i][1] - rows[j][1]
            dy = rows[i][2] - rows[j][2]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    t = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((t - tx) * (t - ty))
    r = QUERIES["kendall_tau_daily"](spark, SF_DIR).collect()[0]
    assert (r["concordant"], r["discordant"]) == (c, d)
    assert (r["ties_x"], r["ties_y"]) == (tx, ty)
    assert r["n_pairs"] == t
    assert r["tau_b"] == pytest.approx(tau, abs=1e-5)
    assert -1 <= r["tau_b"] <= 1


def test_session_entropy_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()
    con.close()
    by_user = defaultdict(Counter)
    for uid, et in rows:
        by_user[uid][et] += 1
    buckets = defaultdict(lambda: [0, 0.0, 0])
    for cnts in by_user.values():
        n = sum(cnts.values())
        h = math.log(n) - sum(c * math.log(c) for c in cnts.values()) / n
        b = math.floor(round(h, 9) / 0.25)
        buckets[b][0] += 1
        buckets[b][1] += round(h, 9)
        buckets[b][2] += n
    got = {
        r["h_bucket"]: r
        for r in QUERIES["session_entropy_distribution"](spark, SF_DIR).collect()
    }
    assert set(got) == set(buckets)
    for b, (nu, hs, ne) in buckets.items():
        r = got[b]
        assert r["n_users"] == nu
        assert r["n_events"] == ne
        assert r["mean_entropy"] == pytest.approx(hs / nu, abs=1e-5)
        # entropy of <=5 event types is bounded by ln 5
        assert r["mean_entropy"] <= math.log(5) + 1e-9


def test_ses_gridsearch_matches_python(spark):
    rows = [(d, v) for d, v, _ in _daily_xy()]
    daily = dict(rows)
    sse = {}
    nf = 0
    for a in (0.2, 0.4, 0.6, 0.8):
        dcy = 1 - a
        tot = 0.0
        nf = 0
        for day, _ in rows:
            if day + 1 not in daily:
                continue
            num = den = 0.0
            for lag in range(20):
                if day - lag in daily:
                    wgt = dcy**lag
                    num += round(daily[day - lag] * wgt, 6)
                    den += round(wgt, 6)
            fit = round(num / den, 4)
            err = daily[day + 1] - fit
            tot += round(err * err)
            nf += 1
        sse[a] = tot
    r = QUERIES["ses_gridsearch"](spark, SF_DIR).collect()[0]
    assert r["n_forecasts"] == nf
    for a, col in [(0.2, "rmse_a02"), (0.4, "rmse_a04"), (0.6, "rmse_a06"),
                   (0.8, "rmse_a08")]:
        assert r[col] == pytest.approx(
            math.sqrt(sse[a] / nf) / 100, rel=1e-6
        )
    best = min(sse, key=lambda a: (sse[a], a))
    assert r["best_alpha"] == pytest.approx(best)


def test_degree_gini_matches_python(spark):
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
    degs = [len(v) for v in adj.values()]
    n = len(degs)
    sd = sum(degs)
    absdiff = sum(abs(a - b) for a in degs for b in degs)
    gini = absdiff / (2 * n * sd)
    r = QUERIES["graph_degree_gini"](spark, SF_DIR).collect()[0]
    assert r["n_nodes"] == n
    assert r["mean_degree_floor"] == sd // n
    assert r["degree_gini"] == pytest.approx(gini, abs=1e-5)
    assert 0 <= r["degree_gini"] < 1
