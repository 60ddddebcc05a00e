"""Round-4 wave-37 queries vs pure-python references."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_ipf_raking_matches_python_and_margins(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT n.n_name, c.c_mktsegment, COUNT(*)
            FROM read_parquet('{SF_DIR}/customer.parquet') c
            JOIN read_parquet('{SF_DIR}/nation.parquet') n
              ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    w = {(nat, seg): float(n) for nat, seg, n in rows}
    counts = {(nat, seg): n for nat, seg, n in rows}
    n_all = sum(counts.values())
    nations = sorted({k[0] for k in w})
    col_target = defaultdict(int)
    for (nat, seg), n in counts.items():
        col_target[seg] += n
    row_target = n_all / len(nations)
    for _ in range(3):
        cur = defaultdict(float)
        for (nat, seg), v in w.items():
            cur[nat] += round(v, 12)
        w = {
            k: round(v * (row_target / cur[k[0]]), 12) for k, v in w.items()
        }
        curc = defaultdict(float)
        for (nat, seg), v in w.items():
            curc[seg] += v
        w = {
            k: round(v * (col_target[k[1]] / curc[k[1]]), 12)
            for k, v in w.items()
        }
    got = {
        (r["nation"], r["segment"]): r
        for r in QUERIES["ipf_raking_weights"](spark, SF_DIR).collect()
    }
    assert set(got) == set(w)
    for k, v in w.items():
        assert got[k]["weight"] == pytest.approx(v, abs=1e-3)
        assert got[k]["raking_factor"] == pytest.approx(
            v / counts[k], abs=1e-4
        )
    # after raking, nation margins are near-equal and segment margins
    # match the observed totals
    nat_m = defaultdict(float)
    seg_m = defaultdict(float)
    for (nat, seg), r in got.items():
        nat_m[nat] += r["weight"]
        seg_m[seg] += r["weight"]
    for tot in nat_m.values():
        assert tot == pytest.approx(row_target, rel=0.02)
    for seg, tot in seg_m.items():
        # weights are emitted at 4 dp; 25 cells per segment
        assert tot == pytest.approx(col_target[seg], abs=0.01)


def test_ridge_path_matches_python_and_shrinks(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT),
                   COUNT(*)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    n = len(rows)
    st = sum(r[0] for r in rows)
    sx = sum(r[2] for r in rows)
    sy = sum(r[1] for r in rows)
    ctt = (n * sum(r[0] ** 2 for r in rows) - st * st) / n
    cxx = (n * sum(r[2] ** 2 for r in rows) - sx * sx) / n
    ctx = (n * sum(r[0] * r[2] for r in rows) - st * sx) / n
    cty = (n * sum(r[0] * r[1] for r in rows) - st * sy) / n
    cxy = (n * sum(r[2] * r[1] for r in rows) - sx * sy) / n
    got = {
        r["lambda"]: r
        for r in QUERIES["ridge_regression_path"](spark, SF_DIR).collect()
    }
    prev_norm = None
    for lam in (0.0, 1e2, 1e4, 1e6):
        det = (ctt + lam) * (cxx + lam) - ctx * ctx
        bt = ((cxx + lam) * cty - ctx * cxy) / det
        bx = ((ctt + lam) * cxy - ctx * cty) / det
        r = got[lam]
        assert r["beta_day_eur"] == pytest.approx(bt / 100, rel=1e-4)
        assert r["beta_count_eur"] == pytest.approx(bx / 100, rel=1e-4)
        norm = math.hypot(bt, bx)
        if prev_norm is not None:
            assert norm <= prev_norm + 1e-12  # ridge shrinks the norm
        prev_norm = norm
    assert got[0.0]["shrinkage"] == pytest.approx(1.0, abs=1e-6)


def test_energy_distance_matches_bruteforce(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100000,
                   o_orderkey % 2
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    xs = [v for v, h in rows if h == 0]
    ys = [v for v, h in rows if h == 1]
    n, m = len(xs), len(ys)
    from collections import Counter

    cx, cy = Counter(xs), Counter(ys)

    def dsum(ca, cb):
        return sum(
            a_c * b_c * abs(a_v - b_v)
            for a_v, a_c in ca.items()
            for b_v, b_c in cb.items()
        )

    e = (
        2 * dsum(cx, cy) / (n * m)
        - dsum(cx, cx) / (n * n)
        - dsum(cy, cy) / (m * m)
    )
    r = QUERIES["energy_distance_halves"](spark, SF_DIR).collect()[0]
    assert r["n_even"] == n and r["n_odd"] == m
    assert r["energy_distance_k"] == pytest.approx(e, abs=1e-5)
    assert r["energy_stat"] == pytest.approx(n * m / (n + m) * e, abs=1e-2)
    assert r["energy_distance_k"] >= 0


def test_gini_ranking_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(l.l_quantity AS BIGINT),
                   CAST(ROUND(l.l_discount * 100) AS BIGINT),
                   CAST(p.p_size AS BIGINT),
                   CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) // 500000,
                   CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/lineitem.parquet') l
            JOIN read_parquet('{SF_DIR}/part.parquet') p
              ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    con.close()
    feats = ["quantity", "discount", "part_size", "price_bucket"]
    best = {}
    for fi, feat in enumerate(feats):
        cells = defaultdict(lambda: [0, 0])
        for r in rows:
            cells[r[fi]][0] += 1
            cells[r[fi]][1] += r[4]
        ntot = sum(c for c, _ in cells.values())
        ptot = sum(p for _, p in cells.values())
        parent = 1 - (ptot / ntot) ** 2 - ((ntot - ptot) / ntot) ** 2
        cand = sorted(cells)
        top = None
        for thr in cand:
            nl = sum(c for v, (c, _) in cells.items() if v <= thr)
            pl = sum(p for v, (_, p) in cells.items() if v <= thr)
            nr, pr = ntot - nl, ptot - pl
            if nl == 0 or nr == 0:
                continue
            gl = 1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2
            gr = 1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
            gain = parent - (nl * gl + nr * gr) / ntot
            key = (-round(gain, 12), thr)
            if top is None or key < top[0]:
                top = (key, thr, gain)
        best[feat] = (top[1], top[2])
    got = {
        r["feature"]: r
        for r in QUERIES["gini_gain_feature_ranking"](spark, SF_DIR).collect()
    }
    assert set(got) == set(feats)
    for feat, (thr, gain) in best.items():
        assert got[feat]["best_threshold"] == thr
        assert got[feat]["gini_gain"] == pytest.approx(gain, abs=1e-7)
    ranks = sorted(
        got.values(), key=lambda r: (-round(r["gini_gain"], 12), r["feature"])
    )
    assert [r["rank"] for r in ranks] == [1, 2, 3, 4]
