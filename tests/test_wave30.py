"""Round-4 wave-30 econometric diagnostics vs pure-python OLS."""

import math

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _daily():
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


def _ols(ts, ys):
    n = len(ts)
    st, sy = sum(ts), sum(ys)
    stt = sum(t * t for t in ts)
    sty = sum(t * y for t, y in zip(ts, ys))
    syy = sum(y * y for y in ys)
    b = (n * sty - st * sy) / (n * stt - st * st)
    a = sy / n - b * st / n
    rss = ((n * syy - sy * sy) - (n * sty - st * sy) ** 2 / (n * stt - st * st)) / n
    return a, b, rss


def test_durbin_watson_matches_python(spark):
    rows = _daily()
    ts = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    _, b, rss = _ols(ts, ys)
    ymap = dict(zip(ts, ys))
    diffs = [ymap[t + 1] - ymap[t] for t in ts if t + 1 in ymap]
    m = len(diffs)
    num = sum(d * d for d in diffs) - 2 * b * sum(diffs) + m * b * b
    r = QUERIES["durbin_watson"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == len(ts) and r["m_pairs"] == m
    assert r["slope_eur_per_day"] == pytest.approx(b / 100, abs=1e-4)
    assert r["dw_stat"] == pytest.approx(num / rss, abs=1e-4)
    assert 0 < r["dw_stat"] < 4


def test_breusch_pagan_matches_python(spark):
    rows = _daily()
    ts = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    a, b, _ = _ols(ts, ys)
    us = [((y - a - b * t) / 100) ** 2 for t, y in zip(ts, ys)]
    n = len(ts)
    st = sum(ts)
    stt = sum(t * t for t in ts)
    su = sum(round(u, 2) for u in us)
    suu = sum(round(u * u, 2) for u in us)
    sut = sum(round(u * t, 2) for u, t in zip(us, ts))
    num = (n * sut - st * su) ** 2
    den = (n * stt - st * st) * (n * suu - su * su)
    r = QUERIES["breusch_pagan"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["r_squared"] == pytest.approx(num / den, abs=1e-5)
    assert r["lm_stat"] == pytest.approx(n * num / den, abs=1e-2)


def test_granger_matches_python(spark):
    rows = _daily()
    ymap = {t: y for t, y, _ in rows}
    xmap = {t: x for t, _, x in rows}
    trip = [
        (ymap[t + 1], ymap[t], xmap[t]) for t, _, _ in rows if t + 1 in ymap
    ]
    n = len(trip)
    sy = sum(r[0] for r in trip)
    sa = sum(r[1] for r in trip)
    sb = sum(r[2] for r in trip)
    cyy = n * sum(r[0] ** 2 for r in trip) - sy * sy
    caa = n * sum(r[1] ** 2 for r in trip) - sa * sa
    cbb = n * sum(r[2] ** 2 for r in trip) - sb * sb
    cab = n * sum(r[1] * r[2] for r in trip) - sa * sb
    cay = n * sum(r[1] * r[0] for r in trip) - sa * sy
    cby = n * sum(r[2] * r[0] for r in trip) - sb * sy
    det = caa * cbb - cab * cab
    bu = (cbb * cay - cab * cby) / det
    cu = (caa * cby - cab * cay) / det
    rss_r = cyy - cay * cay / caa
    rss_u = cyy - bu * cay - cu * cby
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    r = QUERIES["granger_causality_1lag"](spark, SF_DIR).collect()[0]
    assert r["n_pairs"] == n
    assert r["rss_ratio"] == pytest.approx(rss_r / rss_u, abs=1e-5)
    assert r["f_stat"] == pytest.approx(f, abs=1e-2)
    assert r["rss_ratio"] >= 1  # restricted model can never fit better


def test_chow_matches_python(spark):
    rows = _daily()
    ts = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    midt = (min(ts) + max(ts)) // 2
    _, _, rssp = _ols(ts, ys)
    t1 = [(t, y) for t, y in zip(ts, ys) if t <= midt]
    t2 = [(t, y) for t, y in zip(ts, ys) if t > midt]
    _, _, rss1 = _ols([t for t, _ in t1], [y for _, y in t1])
    _, _, rss2 = _ols([t for t, _ in t2], [y for _, y in t2])
    n = len(ts)
    f = ((rssp - rss1 - rss2) / 2) / ((rss1 + rss2) / (n - 4))
    r = QUERIES["chow_break_test"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["n_first"] == len(t1) and r["n_second"] == len(t2)
    # displayed values are ROUND(x, 2): slack is the rounding grid
    assert r["rss_pooled_geur2"] == pytest.approx(rssp / 1e13, abs=0.006)
    assert r["rss_split_geur2"] == pytest.approx((rss1 + rss2) / 1e13, abs=0.006)
    assert r["f_stat"] == pytest.approx(f, abs=1e-2)
    # split fit can never be worse than pooled
    assert r["rss_split_geur2"] <= r["rss_pooled_geur2"]


def test_chow_exact_displayed_values(spark):
    """Pin the EXACT displayed values (round-8 verdict task 7).

    The driver's official gate hashes full-precision output strings, so
    an ``approx(rel=1e-6)`` test is the wrong instrument for a
    hash-gated 1-row contract — round 8's red row passed such a test
    while failing the driver.  These literals are the cross-engine
    agreed values (Spark == DuckDB under repr-strict normalization,
    verified at sf0.001/0.01/0.1); any 1-ulp output drift fails here.
    """
    r = QUERIES["chow_break_test"](spark, SF_DIR).collect()[0]
    assert (
        r["n_days"], r["n_first"], r["n_second"],
        r["rss_pooled_geur2"], r["rss_split_geur2"], r["f_stat"],
    ) == (1094, 556, 538, 57322.56, 56666.03, 6.3143)
