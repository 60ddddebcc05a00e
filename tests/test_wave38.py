"""Round-4 wave-38 queries vs python/numpy references."""

import math
from collections import defaultdict

import duckdb
import numpy as np
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_revenue_bridge_ties_out(spark):
    got = QUERIES["revenue_bridge_decomposition"](spark, SF_DIR).collect()
    assert len(got) > 0
    for r in got:
        # the decomposition identity: delta = price + volume + joint
        assert r["delta_revenue"] == pytest.approx(
            r["price_effect"] + r["volume_effect"] + r["joint_effect"],
            abs=0.05,
        )
    con = duckdb.connect()
    total = con.execute(
        f"""WITH b AS (SELECT (MIN(x) + MAX(x)) // 2 AS mid FROM (
                SELECT date_diff('day', DATE '1970-01-01',
                                 CAST(l_shipdate AS DATE)) AS x
                FROM read_parquet('{SF_DIR}/lineitem.parquet')))
            SELECT ROUND(SUM(CASE WHEN date_diff('day', DATE '1970-01-01',
                          CAST(l_shipdate AS DATE)) > (SELECT mid FROM b)
                     THEN l_extendedprice ELSE -l_extendedprice END), 2)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).fetchone()[0]
    con.close()
    assert sum(r["delta_revenue"] for r in got) == pytest.approx(
        total, abs=0.1
    )


def test_adstock_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
                   COUNT(*),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    xs = {t: x for t, x, _ in rows}
    ys = {t: y for t, _, y in rows}
    got = {
        r["decay"]: r for r in QUERIES["adstock_grid_fit"](spark, SF_DIR).collect()
    }
    best_r = None
    for decay in (0.3, 0.5, 0.7, 0.9):
        pts = []
        for t in xs:
            if t + 1 not in ys:
                continue
            stock = sum(
                round(decay ** (t - pt) * xs[pt], 6)
                for pt in xs
                if t - 19 <= pt <= t
            )
            pts.append((stock, ys[t + 1]))
        n = len(pts)
        sx = sum(round(s, 4) for s, _ in pts)
        sxx = sum(round(s * s, 4) for s, _ in pts)
        sy = sum(y for _, y in pts)
        syy = sum(y * y for _, y in pts)
        sxy = sum(round(s * y, 4) for s, y in pts)
        r = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert got[decay]["n_days"] == n
        assert got[decay]["corr_next_day_revenue"] == pytest.approx(
            r, abs=1e-4
        )
        best_r = r if best_r is None else max(best_r, r)
    winners = [d for d, r in got.items() if r["is_best"] == 1]
    assert len(winners) >= 1
    assert got[winners[0]]["corr_next_day_revenue"] == pytest.approx(
        best_r, abs=1e-4
    )


def test_newsvendor_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT p.p_type,
                   date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE)),
                   CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/lineitem.parquet') l
            JOIN read_parquet('{SF_DIR}/part.parquet') p
              ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    per = defaultdict(list)
    for pt, _, d in rows:
        per[pt].append(d)
    got = {
        r["ptype"]: r
        for r in QUERIES["newsvendor_stock_levels"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for pt, ds in per.items():
        ds = sorted(ds)
        n = len(ds)
        k = math.ceil(0.8 * n)
        stock = ds[k - 1]
        covered = sum(1 for d in ds if d <= stock)
        r = got[pt]
        assert r["n_days"] == n
        assert r["optimal_stock"] == stock
        assert r["service_level"] == pytest.approx(covered / n, abs=1e-4)
        # 0.8-quantile stocking must cover at least 80% of days
        assert r["service_level"] >= 0.8 - 1e-9


def test_power_iteration_matches_numpy_eig(spark):
    con = duckdb.connect()
    embs = np.array(
        con.execute(
            f"""SELECT CAST(embedding AS DOUBLE[])
                FROM read_parquet('{SF_DIR}/embeddings.parquet')
                ORDER BY vec_id"""
        ).fetchnumpy()["CAST(embedding AS DOUBLE[])"].tolist()
    )
    con.close()
    cov = np.round(np.cov(embs.T, bias=True), 4)
    # replay the query's exact iteration (9-dp-rounded terms, L-inf
    # normalization) in numpy — machinery parity
    v = np.ones(cov.shape[0])
    prev = v
    for _ in range(15):
        prev = v
        u = np.array(
            [sum(round(cov[i, j] * v[j], 9) for j in range(len(v)))
             for i in range(len(v))]
        )
        v = u / np.max(np.abs(u))
    lam_replay = sum(round(a * b, 9) for a, b in zip(prev, u)) / sum(
        round(a * a, 9) for a in prev
    )
    got = QUERIES["power_iteration_top_pc"](spark, SF_DIR).collect()
    assert len(got) == 8
    lam = got[0]["top_eigenvalue"]
    assert lam == pytest.approx(lam_replay, abs=1e-3)
    by_comp = {r["component"]: r["loading"] for r in got}
    order = np.argsort(-np.abs(v))[:8]
    assert set(by_comp) == set(int(i) for i in order)
    for i in order:
        assert by_comp[int(i)] == pytest.approx(float(v[i]), abs=1e-4)
    # semantic bracket: the Rayleigh estimate sits inside the true
    # spectrum's top band (near-degenerate eigenvalues slow the
    # iteration, but it can never exceed lambda_1 or fall below the
    # bulk)
    vals = np.linalg.eigvalsh(cov)
    lam1 = float(vals[-1])
    assert 0.8 * lam1 <= lam <= lam1 + 1e-6
