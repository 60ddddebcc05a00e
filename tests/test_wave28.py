"""Round-4 wave-28 model-fitting queries vs pure-python references."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_gmm_em_matches_python(spark):
    con = duckdb.connect()
    hist = con.execute(
        f"""SELECT CAST(ROUND(LN(o_totalprice), 2) AS DECIMAL(10,2)), COUNT(*)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    hist = [(float(x), c) for x, c in hist]
    mu1, mu2, s1, s2, w1 = 8.0, 11.0, 1.0, 1.0, 0.5
    for _ in range(3):
        sums = [0.0] * 6
        for x, c in hist:
            d1 = w1 * math.exp(-((x - mu1) ** 2) / (2 * s1 * s1)) / s1
            d2 = (1 - w1) * math.exp(-((x - mu2) ** 2) / (2 * s2 * s2)) / s2
            r = d1 / (d1 + d2)
            sums[0] += round(r * c, 6)
            sums[1] += round(r * c * x, 6)
            sums[2] += round(r * c * x * x, 6)
            sums[3] += round((1 - r) * c, 6)
            sums[4] += round((1 - r) * c * x, 6)
            sums[5] += round((1 - r) * c * x * x, 6)
        w1n, s1n, q1n, w2n, s2n, q2n = sums
        mu1, mu2 = s1n / w1n, s2n / w2n
        s1 = math.sqrt(max(q1n / w1n - mu1 * mu1, 1e-6))
        s2 = math.sqrt(max(q2n / w2n - mu2 * mu2, 1e-6))
        w1 = w1n / (w1n + w2n)
    got = {r["comp"]: r for r in QUERIES["gmm_em_1d"](spark, SF_DIR).collect()}
    assert got[1]["weight"] == pytest.approx(w1, abs=1e-4)
    assert got[1]["mu"] == pytest.approx(mu1, abs=1e-4)
    assert got[1]["sigma"] == pytest.approx(s1, abs=1e-4)
    assert got[2]["mu"] == pytest.approx(mu2, abs=1e-4)
    # the two components must be ordered (bimodal fit is meaningful)
    assert got[1]["mu"] < got[2]["mu"]
    assert 0 < got[1]["weight"] < 1


def _cells():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(l_quantity AS BIGINT),
                   CAST(ROUND(l_discount * 100) AS BIGINT),
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END,
                   COUNT(*)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            GROUP BY 1, 2, 3"""
    ).fetchall()
    con.close()
    return rows


def _best_split(cells):
    cands = sorted({("qty", q) for q, _, _, _ in cells}) + sorted(
        {("disc", d) for _, d, _, _ in cells}
    )
    best = None
    for feat, thr in cands:
        nl = pl = nr = pr = 0
        for q, d, y, c in cells:
            v = q if feat == "qty" else d
            if v <= thr:
                nl += c
                pl += y * c
            else:
                nr += c
                pr += y * c
        if nl == 0 or nr == 0:
            continue
        side = lambda n, p: n * (1 - (p / n) ** 2 - ((n - p) / n) ** 2)
        gini = (side(nl, pl) + side(nr, pr)) / (nl + nr)
        key = (round(gini, 12), 0 if feat == "disc" else 1, thr)
        if best is None or key < best[0]:
            best = (key, feat, thr, gini, nl + nr, pl + pr)
    return best


def test_cart_depth2_matches_python(spark):
    cells = _cells()
    _, rfeat, rthr, rgini, rn, rpos = _best_split(cells)
    lcells = [
        (q, d, y, c)
        for q, d, y, c in cells
        if (q if rfeat == "qty" else d) <= rthr
    ]
    rcells = [
        (q, d, y, c)
        for q, d, y, c in cells
        if (q if rfeat == "qty" else d) > rthr
    ]
    got = {
        r["node"]: r for r in QUERIES["cart_depth2_tree"](spark, SF_DIR).collect()
    }
    assert got["root"]["feature"] == rfeat
    assert got["root"]["threshold"] == rthr
    assert got["root"]["gini"] == pytest.approx(rgini, abs=1e-5)
    assert got["root"]["n"] == rn and got["root"]["n_pos"] == rpos
    for node, sub in (("L", lcells), ("R", rcells)):
        _, feat, thr, gini, n, pos = _best_split(sub)
        assert got[node]["feature"] == feat
        assert got[node]["threshold"] == thr
        assert got[node]["gini"] == pytest.approx(gini, abs=1e-5)
        assert got[node]["n"] == n and got[node]["n_pos"] == pos
    # children partition the root's mass
    assert got["L"]["n"] + got["R"]["n"] == got["root"]["n"]


def test_knn_loo_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT vec_id, label, CAST(embedding AS DOUBLE[])
            FROM read_parquet('{SF_DIR}/embeddings.parquet')
            WHERE vec_id % 20 = 0"""
    ).fetchall()
    con.close()
    correct = 0
    for qa, la, ea in rows:
        ds = []
        for qb, lb, eb in rows:
            if qb == qa:
                continue
            dist = round(sum((x - y) * (x - y) for x, y in zip(ea, eb)), 9)
            ds.append((dist, qb, lb))
        ds.sort()
        votes = sum(1 for _, _, lb in ds[:3] if lb == la)
        if votes * 2 > 3:
            correct += 1
    r = QUERIES["knn_loo_accuracy"](spark, SF_DIR).collect()[0]
    assert r["n_eval"] == len(rows)
    assert r["n_correct"] == correct
    assert r["accuracy"] == pytest.approx(correct / len(rows), abs=1e-6)
