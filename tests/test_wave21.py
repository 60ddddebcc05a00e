"""Round-4 wave-21 queries vs pure-python references: log-return
volatility, Anderson-Darling, G-test, Fleiss' kappa."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_log_return_volatility_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    rets = [
        round(math.log(b[1] / a[1]), 9) for a, b in zip(rows, rows[1:])
    ]
    n = len(rets)
    mean = sum(rets) / n
    var = (sum(r * r for r in rets) - sum(rets) ** 2 / n) / (n - 1)
    r = QUERIES["log_return_volatility"](spark, SF_DIR).collect()[0]
    assert r["n_returns"] == n
    assert r["mean_log_return"] == pytest.approx(mean, abs=1e-7)
    assert r["daily_vol"] == pytest.approx(math.sqrt(var), abs=1e-6)
    assert r["annualized_sharpe"] == pytest.approx(
        mean / math.sqrt(var) * math.sqrt(252), abs=1e-4
    )


def _gaps():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_custkey,
                   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            FROM read_parquet('{SF_DIR}/orders.parquet') ORDER BY 1, 2"""
    ).fetchall()
    con.close()
    by_cust = defaultdict(list)
    for ck, d in rows:
        by_cust[ck].append(d)
    gaps = []
    for days in by_cust.values():
        days.sort()
        gaps.extend(b - a for a, b in zip(days, days[1:]) if b - a > 0)
    return gaps


def test_anderson_darling_matches_python(spark):
    gaps = sorted(_gaps())
    n = len(gaps)
    lam = n / sum(gaps)
    s = 0.0
    for i, g in enumerate(gaps, start=1):
        lnF = round(math.log(1 - math.exp(-lam * g)), 9)
        ln1mF_mirror = round(-lam * gaps[n - i], 9)
        s += (2 * i - 1) * (lnF + ln1mF_mirror)
    a2 = -n - s / n
    r = QUERIES["anderson_darling_gap_test"](spark, SF_DIR).collect()[0]
    assert r["n_gaps"] == n
    assert r["lambda_per_day"] == pytest.approx(lam, abs=1e-8)
    assert r["a_squared"] == pytest.approx(a2, abs=1e-4)


def test_g_test_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderpriority, c_mktsegment, COUNT(*)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON o_custkey = c_custkey
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    rp = defaultdict(int)
    cs = defaultdict(int)
    n = 0
    for p, s, o in rows:
        rp[p] += o
        cs[s] += o
        n += o
    g = 2 * sum(
        o * math.log(o * n / (rp[p] * cs[s])) for p, s, o in rows if o > 0
    )
    r = QUERIES["g_test_priority_segment"](spark, SF_DIR).collect()[0]
    assert r["n_orders"] == n
    assert r["n_cells"] == len(rows)
    assert r["g_stat"] == pytest.approx(g, abs=1e-3)


def test_fleiss_kappa_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    n_items = len(rows)
    agree = tot_pos = 0
    for n_chars, text in rows:
        n_tok = len(text.split(" "))
        nosp = len(text.replace(" ", ""))
        pos = (
            (1 if n_chars >= 300 else 0)
            + (1 if n_tok >= 50 else 0)
            + (1 if 4 * n_tok <= nosp else 0)
        )
        tot_pos += pos
        agree += pos * (pos - 1) + (3 - pos) * (2 - pos)
    p_bar = agree / (n_items * 6)
    p1 = tot_pos / (3 * n_items)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    kappa = (p_bar - p_e) / (1 - p_e)
    r = QUERIES["fleiss_kappa"](spark, SF_DIR).collect()[0]
    assert r["n_items"] == n_items
    assert r["tot_pos"] == tot_pos
    assert r["p_bar"] == pytest.approx(p_bar, abs=1e-5)
    assert r["p_e"] == pytest.approx(p_e, abs=1e-5)
    assert r["fleiss_kappa"] == pytest.approx(kappa, abs=1e-4)
