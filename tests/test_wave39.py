"""Round-4 wave-39 queries vs pure-python references."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_handshake_matching_is_valid_and_maximal_ish(spark):
    import pyspark.sql.functions as SF

    con = duckdb.connect()
    ed = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 50 = 0"""
    ).fetchall()
    con.close()
    adj = defaultdict(set)
    for a, b in ed:
        adj[a].add(b)
        adj[b].add(a)
    # replay with Spark's own xxhash64 for the proposal priority
    hdf = spark.createDataFrame(
        [(n,) for n in sorted(adj)], "node long"
    ).select("node", SF.xxhash64("node").alias("h"))
    h = {r["node"]: r["h"] for r in hdf.collect()}
    free = set(adj)
    married = []
    per_round = []
    for _ in range(6):
        prop = {}
        for u in free:
            cands = [v for v in adj[u] if v in free]
            if cands:
                prop[u] = min(cands, key=lambda v: (h[v], v))
        marry = [
            (u, v)
            for u, v in prop.items()
            if u < v and prop.get(v) == u
        ]
        per_round.append(len(marry))
        for u, v in marry:
            married.append((u, v))
            free.discard(u)
            free.discard(v)
    got = QUERIES["handshake_matching_stats"](spark, SF_DIR).collect()
    assert [r["n_married"] for r in got] == per_round
    assert got[-1]["total_matched_pairs"] == len(married)
    # a matching is a set of disjoint edges
    seen = set()
    for u, v in married:
        assert u not in seen and v not in seen
        seen.add(u)
        seen.add(v)


def test_december_regression_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CASE WHEN CAST(strftime(o_orderdate, '%m') AS BIGINT) = 12
                        THEN 1 ELSE 0 END,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    n = len(rows)
    st = sum(r[0] for r in rows)
    sd = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    ctt = n * sum(r[0] ** 2 for r in rows) - st * st
    cdd = n * sum(r[1] ** 2 for r in rows) - sd * sd
    ctd = n * sum(r[0] * r[1] for r in rows) - st * sd
    cty = n * sum(r[0] * r[2] for r in rows) - st * sy
    cdy = n * sum(r[1] * r[2] for r in rows) - sd * sy
    cyy = n * sum(r[2] ** 2 for r in rows) - sy * sy
    det = ctt * cdd - ctd * ctd
    bt = (cdd * cty - ctd * cdy) / det
    bd = (ctt * cdy - ctd * cty) / det
    rss_n = (cyy - bt * cty - bd * cdy) / n
    t = bd / math.sqrt((rss_n / (n - 3)) * n * ctt / det)
    r = QUERIES["december_effect_regression"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["december_lift_eur"] == pytest.approx(bd / 100, abs=0.02)
    assert r["trend_eur_per_day"] == pytest.approx(bt / 100, abs=1e-4)
    assert r["t_stat_december"] == pytest.approx(t, abs=1e-2)


def test_dau_wau_matches_python_and_bounds(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, epoch_ns(ts) // 1000000000 // 86400
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    con.close()
    dau = defaultdict(set)
    wau = defaultdict(set)
    for u, d in rows:
        dau[(d // 7, d)].add(u)
        wau[d // 7].add(u)
    per = defaultdict(lambda: [0, 0])
    for (w, d), us in dau.items():
        per[w][0] += 1
        per[w][1] += len(us)
    got = {
        r["week"]: r
        for r in QUERIES["dau_wau_stickiness"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for w, (nd, ds) in per.items():
        r = got[w]
        assert r["n_active_days"] == nd
        assert r["dau_sum"] == ds
        assert r["wau"] == len(wau[w])
        s = ds / nd / len(wau[w])
        assert r["stickiness"] == pytest.approx(s, abs=1e-5)
        assert 0 < r["stickiness"] <= 1.0 + 1e-9


def test_queueing_matches_python(spark):
    con = duckdb.connect()
    lam = con.execute(
        f"""SELECT CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT CAST(o_orderdate AS DATE))
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchone()[0]
    con.close()
    mu = 40.0
    got = {
        r["servers"]: r
        for r in QUERIES["queueing_mmc_whatif"](spark, SF_DIR).collect()
    }
    fact = {0: 1, 1: 1, 2: 2, 3: 6, 4: 24, 5: 120}
    for c in range(1, 6):
        rho = lam / (c * mu)
        if rho >= 1:
            assert c not in got
            continue
        a = lam / mu
        ssum = sum(a**k / fact[k] for k in range(min(c, 5)))
        tail = a**c / fact[c] / (1 - rho)
        p_wait = tail / (ssum + tail)
        lq = p_wait * rho / (1 - rho)
        r = got[c]
        assert r["arrival_per_day"] == pytest.approx(lam, abs=1e-3)
        assert r["utilization"] == pytest.approx(rho, abs=1e-5)
        assert r["erlang_c_wait_prob"] == pytest.approx(p_wait, abs=1e-5)
        assert r["lq"] == pytest.approx(lq, abs=1e-5)
        assert r["wq_days"] == pytest.approx(lq / lam, abs=1e-6)
    # more servers can only reduce the wait probability
    waits = [got[c]["erlang_c_wait_prob"] for c in sorted(got)]
    assert all(a >= b for a, b in zip(waits, waits[1:]))
