"""Round-4 wave-15 queries vs pure-python references: Davies-Bouldin,
Cochran's Q, RSI, Ljung-Box."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_davies_bouldin_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    con.close()
    by_label = defaultdict(list)
    for label, e in rows:
        by_label[label].append([round(float(x), 9) for x in e])
    cent = {
        lb: [sum(v[i] for v in vs) / len(vs) for i in range(64)]
        for lb, vs in by_label.items()
    }
    scat = {
        lb: sum(
            math.sqrt(sum((x - c) ** 2 for x, c in zip(v, cent[lb])))
            for v in vs
        )
        / len(vs)
        for lb, vs in by_label.items()
    }
    got = {
        r["label"]: r
        for r in QUERIES["davies_bouldin_index"](spark, SF_DIR).collect()
    }
    assert set(got) == set(by_label)
    for li in by_label:
        db_i = max(
            (scat[li] + scat[lj])
            / math.sqrt(
                sum((a - b) ** 2 for a, b in zip(cent[li], cent[lj]))
            )
            for lj in by_label
            if lj != li
        )
        r = got[li]
        assert r["n_points"] == len(by_label[li])
        assert r["scatter"] == pytest.approx(scat[li], abs=1e-5)
        assert r["db_component"] == pytest.approx(db_i, abs=1e-4)


def test_cochran_q_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    ga = gb = gc = sr = sr2 = 0
    for n_chars, text in rows:
        n_tok = len(text.split(" "))
        nosp = len(text.replace(" ", ""))
        a = 1 if n_chars >= 300 else 0
        b = 1 if n_tok >= 50 else 0
        c = 1 if 4 * n_tok <= nosp else 0
        ga += a
        gb += b
        gc += c
        r = a + b + c
        sr += r
        sr2 += r * r
    k = 3
    g2 = ga * ga + gb * gb + gc * gc
    q = (k - 1) * (k * g2 - (ga + gb + gc) ** 2) / (k * sr - sr2)
    r = QUERIES["cochran_q_test"](spark, SF_DIR).collect()[0]
    assert (r["ga"], r["gb"], r["gc"]) == (ga, gb, gc)
    assert r["n"] == len(rows)
    assert r["q_stat"] == pytest.approx(q, abs=1e-4)


def _daily():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    return rows


def test_rsi_matches_python(spark):
    rows = _daily()
    deltas = {
        b[0]: b[1] - a[1] for a, b in zip(rows, rows[1:])
    }
    got = {r["day"]: r for r in QUERIES["rsi_indicator"](spark, SF_DIR).collect()}
    assert set(got) == set(deltas)
    for day in deltas:
        members = [deltas[d] for d in range(day - 13, day + 1) if d in deltas]
        g = sum(d for d in members if d > 0)
        lo = sum(-d for d in members if d < 0)
        r = got[day]
        assert r["n_members"] == len(members)
        assert r["gains"] == pytest.approx(g / 100, abs=1e-6)
        assert r["losses"] == pytest.approx(lo / 100, abs=1e-6)
        expect = 50.0 if g + lo == 0 else 100 * g / (g + lo)
        assert r["rsi"] == pytest.approx(expect, abs=1e-3)
        assert 0 <= r["rsi"] <= 100


def test_ljung_box_matches_python(spark):
    rows = _daily()
    daily = dict(rows)
    xs = [v for _, v in rows]
    n = len(xs)
    mu = sum(xs) / n
    den = sum((x - mu) ** 2 for x in xs)
    q_cum = 0.0
    got = {r["lag"]: r for r in QUERIES["ljung_box_test"](spark, SF_DIR).collect()}
    assert set(got) == set(range(1, 8))
    for lag in range(1, 8):
        pairs = [
            (daily[d], daily[d + lag]) for d in daily if d + lag in daily
        ]
        rk = sum((a - mu) * (b - mu) for a, b in pairs) / den
        q_cum += rk * rk / (n - lag)
        r = got[lag]
        assert r["n_pairs"] == len(pairs)
        assert r["acf_k"] == pytest.approx(rk, abs=1e-5)
        assert r["q_stat"] == pytest.approx(n * (n + 2) * q_cum, abs=1e-3)
