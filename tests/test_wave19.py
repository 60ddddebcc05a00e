"""Round-4 wave-19 queries vs pure-python references: capture-
recapture, price indices, Simpson diversity, growth streaks."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_capture_recapture_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_custkey,
                   MAX(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                             AND o_orderdate < TIMESTAMP '1996-01-01'
                            THEN 1 ELSE 0 END),
                   MAX(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                             AND o_orderdate < TIMESTAMP '1997-01-01'
                            THEN 1 ELSE 0 END)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    n1 = sum(s1 for _, s1, _ in rows)
    n2 = sum(s2 for _, _, s2 in rows)
    m = sum(1 for _, s1, s2 in rows if s1 and s2)
    obs = sum(1 for _, s1, s2 in rows if s1 or s2)
    r = QUERIES["capture_recapture_estimate"](spark, SF_DIR).collect()[0]
    assert (r["captured_1995"], r["captured_1996"], r["recaptured"]) == (
        n1,
        n2,
        m,
    )
    assert r["observed"] == obs
    assert r["lincoln_petersen"] == pytest.approx(n1 * n2 / m, abs=1e-2)
    assert r["chapman"] == pytest.approx(
        (n1 + 1) * (n2 + 1) / (m + 1) - 1, abs=1e-2
    )
    # the estimate can never be below what we actually observed - slack
    assert r["chapman"] >= m


def test_price_indices_match_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_partkey,
                   CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        THEN 1 ELSE 0 END,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT),
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    per = defaultdict(dict)
    for pk, yr, rev, qty in rows:
        per[pk][yr] = (rev, qty)
    p1q0 = p0q0 = p1q1 = p0q1 = 0.0
    n = 0
    for pk, d in per.items():
        if 0 not in d or 1 not in d or d[0][1] <= 0 or d[1][1] <= 0:
            continue
        rev0, qty0 = d[0]
        rev1, qty1 = d[1]
        p1q0 += round(rev1 / qty1 * qty0, 6)
        p0q0 += rev0
        p1q1 += rev1
        p0q1 += round(rev0 / qty0 * qty1, 6)
        n += 1
    lasp, paas = p1q0 / p0q0, p1q1 / p0q1
    r = QUERIES["laspeyres_paasche_index"](spark, SF_DIR).collect()[0]
    assert r["n_parts"] == n
    assert r["laspeyres"] == pytest.approx(lasp, abs=1e-5)
    assert r["paasche"] == pytest.approx(paas, abs=1e-5)
    assert r["fisher"] == pytest.approx(math.sqrt(lasp * paas), abs=1e-5)


def test_simpson_diversity_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT s_nationkey, p_type, COUNT(*)
            FROM read_parquet('{SF_DIR}/lineitem.parquet') li
            JOIN read_parquet('{SF_DIR}/supplier.parquet') su ON l_suppkey = s_suppkey
            JOIN read_parquet('{SF_DIR}/part.parquet') pa ON l_partkey = p_partkey
            GROUP BY 1, 2"""
    ).fetchall()
    names = dict(
        con.execute(
            f"SELECT n_nationkey, n_name FROM read_parquet('{SF_DIR}/nation.parquet')"
        ).fetchall()
    )
    con.close()
    per = defaultdict(list)
    for nk, _, c in rows:
        per[nk].append(c)
    got = {r["n_name"]: r for r in QUERIES["simpson_diversity"](spark, SF_DIR).collect()}
    assert set(got) == {names[nk] for nk in per}
    for nk, cs in per.items():
        n = sum(cs)
        d = 1 - sum(c * (c - 1) for c in cs) / (n * (n - 1))
        r = got[names[nk]]
        assert r["n_types"] == len(cs)
        assert r["n"] == n
        assert r["simpson_d"] == pytest.approx(d, abs=1e-5)
        assert 0 <= r["simpson_d"] <= 1


def test_growth_streaks_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    best = {}  # direction -> (len, start, end, n_runs)
    runs = defaultdict(list)
    cur_s, cur_start, cur_len, prev_day = None, None, 0, None
    for (da, va), (db, vb) in zip(rows, rows[1:]):
        s = 1 if vb > va else (-1 if vb < va else 0)
        if s == cur_s:
            cur_len += 1
        else:
            if cur_s is not None:
                runs[cur_s].append((cur_len, cur_start, prev_day))
            cur_s, cur_start, cur_len = s, db, 1
        prev_day = db
    runs[cur_s].append((cur_len, cur_start, prev_day))
    got = {r["direction"]: r for r in QUERIES["growth_streaks"](spark, SF_DIR).collect()}
    assert set(got) == set(runs)
    for s, rs in runs.items():
        r = got[s]
        assert r["n_runs"] == len(rs)
        longest = max(rs, key=lambda x: (x[0], -x[1]))
        assert r["longest"] == longest[0]
        assert r["longest_start_day"] == longest[1]
        assert r["longest_end_day"] == longest[2]
