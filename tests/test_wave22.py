"""Round-4 wave-22 queries vs pure-python references: Youden
threshold, Somers' D, Page-Hinkley, Cook's distance."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_youden_threshold_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(FLOOR(l_extendedprice / 1000) AS BIGINT),
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).fetchall()
    con.close()
    hist = defaultdict(lambda: [0, 0])
    for b, y in rows:
        hist[b][y] += 1
    p = sum(v[1] for v in hist.values())
    n = sum(v[0] for v in hist.values())
    best = None
    for t in sorted(hist):
        tp = sum(v[1] for b, v in hist.items() if b >= t)
        fp = sum(v[0] for b, v in hist.items() if b >= t)
        key = tp * n - fp * p
        if best is None or key > best[0] or (key == best[0] and t < best[1]):
            best = (key, t, tp, fp)
    _, t, tp, fp = best
    r = QUERIES["youden_threshold"](spark, SF_DIR).collect()[0]
    assert r["best_bin"] == t
    assert (r["tp"], r["fp"]) == (tp, fp)
    assert (r["total_pos"], r["total_neg"]) == (p, n)
    assert r["youden_j"] == pytest.approx(tp / p - fp / n, abs=1e-5)
    assert 0 <= r["youden_j"] <= 1


def test_somers_d_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT),
                   CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                       CAST(l_shipdate AS DATE)) > 100
                        THEN 1 ELSE 0 END,
                   COUNT(*)
            FROM read_parquet('{SF_DIR}/lineitem.parquet') li
            JOIN read_parquet('{SF_DIR}/orders.parquet') o
              ON l_orderkey = o_orderkey
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    conc = disc = tied = 0
    for x1, y1, c1 in rows:
        for x2, y2, c2 in rows:
            if x1 < x2:
                if y1 < y2:
                    conc += c1 * c2
                elif y1 > y2:
                    disc += c1 * c2
                else:
                    tied += c1 * c2
    d = (conc - disc) / (conc + disc + tied)
    r = QUERIES["somers_d_priority_late"](spark, SF_DIR).collect()[0]
    assert (r["concordant"], r["discordant"], r["tied_y"]) == (
        conc,
        disc,
        tied,
    )
    assert r["somers_dyx"] == pytest.approx(d, abs=1e-5)
    assert -1 <= r["somers_dyx"] <= 1


def _daily():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   COUNT(*),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    return rows


def test_page_hinkley_matches_python(spark):
    rows = _daily()
    cum = 0
    m = 0.0
    min_m = 0.0
    best_ph, best_day = -1.0, None
    for t, (day, _, y) in enumerate(rows, start=1):
        cum += y
        m += round(y - cum / t, 4)
        min_m = min(min_m, m)
        ph = m - min_m
        if ph > best_ph:
            best_ph, best_day = ph, day
    r = QUERIES["page_hinkley_drift"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == len(rows)
    assert r["max_ph"] == pytest.approx(best_ph / 100, abs=1e-2)
    assert r["peak_day"] == best_day


def test_cooks_distance_matches_python(spark):
    rows = _daily()
    n = len(rows)
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    ssx = sxx - sx * sx / n
    es = [y - (a + b * x) for x, y in zip(xs, ys)]
    s2 = sum(round(e * e) for e in es) / (n - 2)
    hs = [1 / n + (x - sx / n) ** 2 / ssx for x in xs]
    ds = [
        e * e * h / (2 * s2 * (1 - h) ** 2) for e, h in zip(es, hs)
    ]
    n_infl = sum(1 for d in ds if d * n > 4)
    max_d = max(ds)
    max_day = rows[ds.index(max_d)][0]
    r = QUERIES["cooks_distance_report"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["n_influential"] == n_infl
    assert r["max_cooks_d"] == pytest.approx(max_d, rel=1e-4)
    assert r["max_day"] == max_day
