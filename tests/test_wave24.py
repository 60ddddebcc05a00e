"""Round-4 wave-24 queries vs pure-python references: epoch-folding
periodogram, PACF (Durbin-Levinson), turning-points test, CCF."""

import math
from collections import defaultdict

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


def test_epoch_folding_matches_python(spark):
    rows = _daily()
    xs = {d: r for d, r, _ in rows}
    n = len(xs)
    s = sum(xs.values())
    q = sum(v * v for v in xs.values())
    got = {
        r["period"]: r
        for r in QUERIES["epoch_folding_periodogram"](spark, SF_DIR).collect()
    }
    assert sorted(got) == list(range(2, 15))
    for p in (2, 7, 12):
        groups = defaultdict(list)
        for d, v in xs.items():
            groups[d % p].append(v)
        fold = sum(
            round(sum(g) ** 2 / len(g) / 10000, 2) for g in groups.values()
        )
        k = len(groups)
        between = fold - s * s / n / 10000
        within = q / 10000 - fold
        f = (between / (k - 1)) / (within / (n - k))
        assert got[p]["n_phases"] == k
        assert got[p]["f_stat"] == pytest.approx(f, abs=1e-3)
    # synthetic order dates are uniform: no period should explode
    for r in got.values():
        assert r["f_stat"] is not None and r["f_stat"] < 10.0


def test_pacf_matches_python(spark):
    rows = _daily()
    xs = {d: r for d, r, _ in rows}
    n = len(xs)
    s = sum(xs.values())
    q = sum(v * v for v in xs.values())
    denom = n * n * q - n * s * s
    r = {}
    for k in (1, 2, 3):
        pairs = [(xs[d], xs[d + k]) for d in xs if d + k in xs]
        sxy = sum(a * b for a, b in pairs)
        hk = sum(a for a, _ in pairs)
        tk = sum(b for _, b in pairs)
        nk = len(pairs)
        r[k] = (n * n * sxy - n * s * (hk + tk) + nk * s * s) / denom
    phi11 = r[1]
    phi22 = (r[2] - r[1] ** 2) / (1 - r[1] ** 2)
    phi21 = phi11 - phi22 * phi11
    v2 = (1 - r[1] ** 2) * (1 - phi22**2)
    phi33 = (r[3] - phi21 * r[2] - phi22 * r[1]) / v2
    got = {
        row["lag"]: row["pacf"]
        for row in QUERIES["pacf_lags"](spark, SF_DIR).collect()
    }
    assert got[1] == pytest.approx(phi11, abs=1e-5)
    assert got[2] == pytest.approx(phi22, abs=1e-5)
    assert got[3] == pytest.approx(phi33, abs=1e-5)


def test_turning_points_matches_python(spark):
    rows = _daily()
    xs = {d: r for d, r, _ in rows}
    t = 0
    trip = 0
    for d in xs:
        if d + 1 in xs and d + 2 in xs:
            trip += 1
            a, b, c = xs[d], xs[d + 1], xs[d + 2]
            if (b > a and b > c) or (b < a and b < c):
                t += 1
    n = trip + 2
    z = (t - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    r = QUERIES["turning_points_test"](spark, SF_DIR).collect()[0]
    assert r["turning_points"] == t
    assert r["n_days"] == n
    assert r["z_score"] == pytest.approx(z, abs=1e-3)


def test_ccf_matches_python_and_is_symmetric_sane(spark):
    rows = _daily()
    cnt = {d: c for d, _, c in rows}
    rev = {d: r for d, r, _ in rows}
    got = {
        r["lag"]: r
        for r in QUERIES["cross_correlation_lags"](spark, SF_DIR).collect()
    }
    assert sorted(got) == list(range(-3, 4))
    for lag in (-2, 0, 3):
        pairs = [(cnt[d], rev[d + lag]) for d in cnt if d + lag in rev]
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        ccf = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert got[lag]["n_pairs"] == n
        assert got[lag]["ccf"] == pytest.approx(ccf, abs=1e-5)
    # same-day count and revenue are strongly positively correlated
    assert got[0]["ccf"] > 0.5
