"""Round-4 wave-23 queries vs pure-python references: Gumbel fit,
dispersion index, Hoover index."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_gumbel_fit_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT strftime(o_orderdate, '%Y-%m'),
                   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    mx = defaultdict(int)
    for month, _, rev in rows:
        mx[month] = max(mx[month], rev)
    vals = list(mx.values())
    n = len(vals)
    m = sum(vals) / n
    sd = math.sqrt(
        (n * sum(v * v for v in vals) - sum(vals) ** 2) / (n * (n - 1))
    )
    gamma, s6pi = 0.577215664902, 0.779696801234
    beta = sd * s6pi
    mu = m - gamma * beta
    record = max(vals)
    p = 1 - math.exp(-math.exp(-(record - mu) / beta))
    r = QUERIES["gumbel_extreme_fit"](spark, SF_DIR).collect()[0]
    assert r["n_blocks"] == n
    assert r["record_revenue"] == pytest.approx(record / 100, abs=1e-6)
    assert r["gumbel_mu"] == pytest.approx(mu / 100, abs=1e-2)
    assert r["gumbel_beta"] == pytest.approx(beta / 100, abs=1e-2)
    assert r["p_exceed_record"] == pytest.approx(p, abs=1e-5)
    assert 0 < r["p_exceed_record"] < 1


def test_dispersion_index_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   COUNT(*)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    ks = [k for _, k in rows]
    n = len(ks)
    mean = sum(ks) / n
    var = (n * sum(k * k for k in ks) - sum(ks) ** 2) / (n * (n - 1))
    r = QUERIES["dispersion_index"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["n_orders"] == sum(ks)
    assert r["mean_per_day"] == pytest.approx(mean, abs=1e-3)
    assert r["vmr"] == pytest.approx(var / mean, abs=1e-4)
    assert r["chi2_dispersion"] == pytest.approx(
        (n - 1) * var / mean, abs=0.51
    )


def test_hoover_index_matches_python(spark):
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
    got = {r["n_name"]: r for r in QUERIES["hoover_index"](spark, SF_DIR).collect()}
    assert set(got) == {names[nk] for nk in per}
    for nk, xs in per.items():
        n = len(xs)
        s = sum(xs)
        mean = s / n
        hoover = sum(abs(x - mean) for x in xs) / (2 * s)
        r = got[names[nk]]
        assert r["n_customers"] == n
        assert r["hoover"] == pytest.approx(hoover, abs=1e-5)
        assert 0 <= r["hoover"] < 1
