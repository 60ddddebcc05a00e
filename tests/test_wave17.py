"""Round-4 wave-17 queries vs pure-python references: McNemar,
stratified lift, Hurst exponent, neighbor-degree curve."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_mcnemar_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    b = c = 0
    for n_chars, text in rows:
        ra = n_chars >= 300
        rb = len(text.split(" ")) >= 50
        b += ra and not rb
        c += rb and not ra
    chi2 = 0.0 if b + c == 0 else (abs(b - c) - 1) ** 2 / (b + c)
    r = QUERIES["mcnemar_test"](spark, SF_DIR).collect()[0]
    assert (r["a_only"], r["b_only"]) == (b, c)
    assert r["chi2_mcnemar"] == pytest.approx(chi2, abs=1e-5)


def test_stratified_lift_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT c.c_custkey,
                   CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END,
                   CAST(FLOOR(c.c_acctbal / 2500) AS BIGINT),
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3"""
    ).fetchall()
    con.close()
    cells = defaultdict(lambda: [0, 0])  # (stratum, trt) -> [n, s]
    for _, trt, st, y in rows:
        cells[(st, trt)][0] += 1
        cells[(st, trt)][1] += y
    strata = sorted(
        {st for st, _ in cells}
        & {st for st, t in cells if t == 1}
        & {st for st, t in cells if t == 0}
    )
    strata = [
        st
        for st in {s for s, _ in cells}
        if (st, 1) in cells and (st, 0) in cells
    ]
    wsum = wlift = n1t = n0t = s1t = s0t = 0.0
    for st in strata:
        n1, s1 = cells[(st, 1)]
        n0, s0 = cells[(st, 0)]
        w = n1 + n0
        wlift += w * (s1 / n1 - s0 / n0)
        wsum += w
        n1t += n1
        n0t += n0
        s1t += s1
        s0t += s0
    r = QUERIES["stratified_adjusted_lift"](spark, SF_DIR).collect()[0]
    assert r["n_strata"] == len(strata)
    assert r["n_treated"] == n1t
    assert r["n_control"] == n0t
    assert r["naive_lift"] == pytest.approx(
        (s1t / n1t - s0t / n0t) / 100, abs=1e-3
    )
    assert r["adjusted_lift"] == pytest.approx(wlift / wsum / 100, abs=1e-3)


def test_hurst_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    xs = [v for _, v in rows]
    mean_rs = {}
    for k in (8, 16, 32, 64):
        vals = []
        for b in range(len(xs) // k):
            block = xs[b * k : (b + 1) * k]
            s = sum(block)
            q = sum(x * x for x in block)
            var_num = k * q - s * s
            if var_num <= 0:
                continue
            cum = 0
            kws = []
            for j, x in enumerate(block, start=1):
                cum += x
                kws.append(k * cum - j * s)
            r2 = max(kws) - min(kws)
            vals.append(r2 / math.sqrt(var_num))
        mean_rs[k] = sum(vals) / len(vals)
    hurst = (
        1.5 * (math.log(mean_rs[64]) - math.log(mean_rs[8]))
        + 0.5 * (math.log(mean_rs[32]) - math.log(mean_rs[16]))
    ) / (5 * math.log(2))
    r = QUERIES["hurst_exponent"](spark, SF_DIR).collect()[0]
    for k, col in [(8, "rs_8"), (16, "rs_16"), (32, "rs_32"), (64, "rs_64")]:
        assert r[col] == pytest.approx(mean_rs[k], abs=1e-4)
    assert r["hurst"] == pytest.approx(hurst, abs=1e-3)
    assert 0 < r["hurst"] < 1


def test_neighbor_degree_curve_matches_python(spark):
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
    per = defaultdict(lambda: [0, 0])
    for u, nbrs in adj.items():
        for v in nbrs:
            per[len(nbrs)][0] += 1
            per[len(nbrs)][1] += len(adj[v])
    got = {
        r["degree"]: r
        for r in QUERIES["neighbor_degree_curve"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for d, (n, s) in per.items():
        r = got[d]
        assert r["n_endpoints"] == n
        assert r["sum_nbr_degree"] == s
        assert r["mean_neighbor_degree"] == pytest.approx(s / n, abs=1e-5)
