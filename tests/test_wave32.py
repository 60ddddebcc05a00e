"""Round-4 wave-32 drift/inequality queries vs pure-python refs."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _halved():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey % 2
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    return rows


def test_jsd_matches_python_and_bounds(spark):
    rows = _halved()
    b = defaultdict(lambda: [0, 0])
    for cents, half in rows:
        b[cents // 100000][half] += 1
    n1 = sum(v[0] for v in b.values())
    n2 = sum(v[1] for v in b.values())
    jsd = 0.0
    for c1, c2 in b.values():
        p, q = c1 / n1, c2 / n2
        m = 0.5 * p + 0.5 * q
        if c1 > 0:
            jsd += round(0.5 * p * math.log(p / m), 12)
        if c2 > 0:
            jsd += round(0.5 * q * math.log(q / m), 12)
    r = QUERIES["jensen_shannon_drift"](spark, SF_DIR).collect()[0]
    assert r["n_buckets"] == len(b)
    assert r["jsd_nats"] == pytest.approx(jsd, abs=1e-5)
    assert r["jsd_bits"] == pytest.approx(jsd / math.log(2), abs=1e-5)
    # JSD in bits is bounded by 1; halves of the same data are close
    assert 0 <= r["jsd_bits"] <= 1
    assert r["js_distance"] == pytest.approx(
        math.sqrt(max(jsd / math.log(2), 0)), abs=1e-5
    )


def test_cvm_matches_python(spark):
    rows = _halved()
    b = defaultdict(lambda: [0, 0])
    for cents, half in rows:
        b[cents // 10000][half] += 1
    n = sum(v[0] for v in b.values())
    m = sum(v[1] for v in b.values())
    f1 = f2 = 0
    u = 0
    for k in sorted(b):
        c1, c2 = b[k]
        f1 += c1
        f2 += c2
        w = c1 + c2
        u += w * (f1 * m - f2 * n) ** 2
    t = u / (n * m * (n + m) ** 2 * n * m)
    r = QUERIES["cramer_von_mises_binned"](spark, SF_DIR).collect()[0]
    assert r["n_even"] == n and r["n_odd"] == m
    assert r["cvm_stat"] == pytest.approx(t, abs=1e-7)
    assert r["cvm_stat"] >= 0


def test_mood_median_matches_python(spark):
    rows = _halved()
    cents = sorted(c for c, _ in rows)
    med = cents[(len(cents) + 1) // 2 - 1]
    a = sum(1 for c, h in rows if h == 0 and c > med)
    bb = sum(1 for c, h in rows if h == 0 and c <= med)
    c = sum(1 for c_, h in rows if h == 1 and c_ > med)
    d = sum(1 for c_, h in rows if h == 1 and c_ <= med)
    n = a + bb + c + d
    chi2 = n * (a * d - bb * c) ** 2 / ((a + bb) * (c + d) * (a + c) * (bb + d))
    r = QUERIES["mood_median_test"](spark, SF_DIR).collect()[0]
    assert (r["even_above"], r["even_below"], r["odd_above"], r["odd_below"]) == (
        a,
        bb,
        c,
        d,
    )
    assert r["chi2_stat"] == pytest.approx(chi2, abs=1e-2)


def test_atkinson_matches_python_and_ordering(spark):
    con = duckdb.connect()
    spends = [
        s
        for (s,) in con.execute(
            f"""SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                            AS BIGINT)
                FROM read_parquet('{SF_DIR}/orders.parquet')
                GROUP BY o_custkey"""
        ).fetchall()
    ]
    con.close()
    b = defaultdict(int)
    for s in spends:
        b[s // 1000] += 1
    n = len(spends)
    sx = sum(round(c * (k * 1000 + 500) / 100.0, 2) for k, c in b.items())
    slnx = sum(
        round(c * math.log((k * 1000 + 500) / 100.0), 9) for k, c in b.items()
    )
    ssqx = sum(
        round(c * math.sqrt((k * 1000 + 500) / 100.0), 6) for k, c in b.items()
    )
    mean = sx / n
    a1 = 1 - math.exp(slnx / n) / mean
    a05 = 1 - (ssqx / n) ** 2 / mean
    r = QUERIES["atkinson_index_binned"](spark, SF_DIR).collect()[0]
    assert r["n_customers"] == n
    assert r["mean_spend_eur"] == pytest.approx(mean, abs=0.02)
    assert r["atkinson_eps1"] == pytest.approx(a1, abs=1e-5)
    assert r["atkinson_eps05"] == pytest.approx(a05, abs=1e-5)
    # more inequality aversion => larger index; both in [0, 1)
    assert 0 <= r["atkinson_eps05"] <= r["atkinson_eps1"] < 1
