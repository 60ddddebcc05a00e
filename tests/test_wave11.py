"""Round-4 wave-11 queries vs pure-python references: HHI, DiD,
historical VaR/CVaR, Cohen's kappa."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _rev_rows(extra=""):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT {extra} CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            FROM read_parquet('{SF_DIR}/lineitem.parquet') l"""
    ).fetchall()
    con.close()
    return rows


def test_herfindahl_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT s_nationkey, l_suppkey,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            FROM read_parquet('{SF_DIR}/lineitem.parquet') li
            JOIN read_parquet('{SF_DIR}/supplier.parquet') su
              ON l_suppkey = s_suppkey"""
    ).fetchall()
    names = dict(
        con.execute(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF_DIR}/nation.parquet')"
        ).fetchall()
    )
    con.close()
    per = defaultdict(lambda: defaultdict(int))
    for nk, sk, rev in rows:
        per[nk][sk] += rev
    got = {r["n_name"]: r for r in QUERIES["herfindahl_index"](spark, SF_DIR).collect()}
    assert set(got) == {names[nk] for nk in per}
    for nk, supps in per.items():
        tot = sum(supps.values())
        hhi = sum(v * v for v in supps.values()) / tot**2
        r = got[names[nk]]
        assert r["n_suppliers"] == len(supps)
        assert r["hhi"] == pytest.approx(hhi, abs=1e-8)
        assert r["top_share"] == pytest.approx(max(supps.values()) / tot, abs=1e-8)
        # HHI lower bound 1/n, upper bound 1
        assert 1 / len(supps) - 1e-9 <= r["hhi"] <= 1 + 1e-9


def test_diff_in_diff_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END,
                   CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' THEN 1 ELSE 0 END,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
            FROM read_parquet('{SF_DIR}/lineitem.parquet') li
            JOIN read_parquet('{SF_DIR}/part.parquet') pa ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'"""
    ).fetchall()
    con.close()
    cells = defaultdict(list)
    for t, p, rev in rows:
        cells[(t, p)].append(rev)
    mean = {k: sum(v) / len(v) for k, v in cells.items()}
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    r = QUERIES["diff_in_diff_revenue"](spark, SF_DIR).collect()[0]
    assert r["n00"] == len(cells[(0, 0)])
    assert r["n11"] == len(cells[(1, 1)])
    assert r["mean_trt_post_e4"] == sum(cells[(1, 1)]) // len(cells[(1, 1)])
    assert r["did_estimate"] == pytest.approx(did / 10000, abs=1e-3)


def test_value_at_risk_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    deltas = [b[1] - a[1] for a, b in zip(rows, rows[1:])]
    deltas.sort()
    n = len(deltas)
    k = math.ceil(n / 20)
    var = deltas[k - 1]
    cvar = sum(deltas[:k]) / k
    r = QUERIES["value_at_risk"](spark, SF_DIR).collect()[0]
    assert r["n_deltas"] == n
    assert r["k_tail"] == k
    assert r["var_95"] == pytest.approx(var / 100, abs=1e-6)
    assert r["cvar_95"] == pytest.approx(cvar / 100, abs=1e-3)
    assert r["worst_change"] == pytest.approx(deltas[0] / 100, abs=1e-6)


def test_cohen_kappa_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    a_pos = b_pos = both = neither = 0
    for n_chars, text in rows:
        ra = n_chars >= 300
        rb = len(text.split(" ")) >= 50
        both += ra and rb
        a_pos += ra and not rb
        b_pos += rb and not ra
        neither += (not ra) and (not rb)
    n = len(rows)
    po = (both + neither) / n
    pa1, pb1 = both + a_pos, both + b_pos
    pe = (pa1 * pb1 + (n - pa1) * (n - pb1)) / n**2
    kappa = (po - pe) / (1 - pe)
    r = QUERIES["cohen_kappa"](spark, SF_DIR).collect()[0]
    assert r["both_pos"] == both
    assert r["a_only"] == a_pos
    assert r["b_only"] == b_pos
    assert r["both_neg"] == neither
    assert r["po"] == pytest.approx(po, abs=1e-5)
    assert r["pe"] == pytest.approx(pe, abs=1e-5)
    assert r["kappa"] == pytest.approx(kappa, abs=1e-5)
