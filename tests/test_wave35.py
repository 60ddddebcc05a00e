"""Round-4 wave-35 queries vs scipy/pure-python references."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _dagostino_reference(xs):
    """scipy.stats.skewtest / kurtosistest formulas, pure python."""
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    g1 = m3 / m2**1.5
    g2 = m4 / m2**2 - 3
    y = g1 * math.sqrt((n + 1) * (n + 3) / (6.0 * (n - 2)))
    b2 = (
        3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3)
        / ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    )
    w2 = math.sqrt(2 * (b2 - 1)) - 1
    alpha = math.sqrt(2 / (w2 - 1))
    z1 = math.log(y / alpha + math.sqrt((y / alpha) ** 2 + 1)) / math.sqrt(
        math.log(math.sqrt(w2))
    )
    xk = (g2 - 3.0 * (n - 1) / (n + 1) + 3 - 3) / math.sqrt(
        24.0 * n * (n - 2) * (n - 3) / ((n + 1) ** 2 * (n + 3) * (n + 5))
    )
    b1 = (
        6.0 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9))
        * math.sqrt(6.0 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    )
    a = 6.0 + 8.0 / b1 * (2.0 / b1 + math.sqrt(1 + 4.0 / (b1 * b1)))
    base = (1 - 2.0 / a) / (1 + xk * math.sqrt(2.0 / (a - 4)))
    z2 = (
        (1 - 2.0 / (9 * a))
        - math.copysign(abs(base) ** (1.0 / 3), base)
    ) / math.sqrt(2.0 / (9 * a))
    return g1, g2, z1, z2


def test_dagostino_k2_matches_python(spark):
    con = duckdb.connect()
    xs = [
        x
        for (x,) in con.execute(
            f"SELECT o_totalprice FROM read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    con.close()
    g1, g2, z1, z2 = _dagostino_reference(xs)
    r = QUERIES["dagostino_k2"](spark, SF_DIR).collect()[0]
    assert r["n_rows"] == len(xs)
    # 2-dp moment rounding perturbs the raw sums slightly; transforms
    # must still match the exact-moment reference closely
    assert r["skewness"] == pytest.approx(g1, abs=1e-3)
    assert r["excess_kurtosis"] == pytest.approx(g2, abs=1e-3)
    assert r["z_skew"] == pytest.approx(z1, abs=0.02)
    assert r["z_kurt"] == pytest.approx(z2, abs=0.02)
    assert r["k2_stat"] == pytest.approx(z1 * z1 + z2 * z2, rel=0.01)


def test_esd_rounds_match_python(spark):
    con = duckdb.connect()
    daily = dict(
        con.execute(
            f"""SELECT date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)),
                       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                            AS BIGINT)
                FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
        ).fetchall()
    )
    con.close()
    expect = []
    rem = dict(daily)
    for i in range(1, 6):
        n = len(rem)
        s = sum(rem.values())
        q = sum(v * v for v in rem.values())
        # argmax |n*y - s| with day tie-break
        day = min(rem, key=lambda d: (-abs(n * rem[d] - s), d))
        sd = math.sqrt((n * q - s * s) / (n * (n - 1)))
        r_stat = (abs(n * rem[day] - s) / n) / sd
        expect.append((i, day, rem[day], r_stat))
        del rem[day]
    got = QUERIES["esd_outlier_rounds"](spark, SF_DIR).collect()
    assert len(got) == 5
    for r, (i, day, y, rs) in zip(got, expect):
        assert r["round"] == i and r["removed_day"] == day
        assert r["value_eur"] == pytest.approx(y / 100, abs=0.011)
        assert r["r_stat"] == pytest.approx(rs, abs=1e-3)
    # R statistics are (weakly) decreasing as extremes are removed
    assert got[0]["r_stat"] >= got[-1]["r_stat"] - 0.5


def test_nmi_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT lang, source FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    cell = defaultdict(int)
    for lang, src in rows:
        cell[(lang, src)] += 1
    n = len(rows)
    ml = defaultdict(int)
    ms = defaultdict(int)
    for (lang, src), c in cell.items():
        ml[lang] += c
        ms[src] += c
    mi = sum(
        round((c / n) * math.log(c * n / (ml[lang] * ms[src])), 12)
        for (lang, src), c in cell.items()
    )
    hl = sum(round(-(c / n) * math.log(c / n), 12) for c in ml.values())
    hs = sum(round(-(c / n) * math.log(c / n), 12) for c in ms.values())
    r = QUERIES["nmi_lang_source"](spark, SF_DIR).collect()[0]
    assert r["n_cells"] == len(cell)
    assert r["mi_nats"] == pytest.approx(mi, abs=1e-5)
    assert r["h_lang"] == pytest.approx(hl, abs=1e-5)
    assert r["h_source"] == pytest.approx(hs, abs=1e-5)
    assert r["nmi"] == pytest.approx(mi / math.sqrt(hl * hs), abs=1e-4)
    # NMI lives in [0, 1]; synthetic lang and source are ~independent
    assert 0 <= r["nmi"] < 0.2


def test_qq_deciles_match_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey % 2
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    halves = {0: [], 1: []}
    for c, h in rows:
        halves[h].append(c)
    got = QUERIES["qq_deciles_halves"](spark, SF_DIR).collect()
    assert [r["quantile"] for r in got] == [d / 10 for d in range(1, 10)]
    for r in got:
        d = round(r["quantile"] * 10)
        vals = {}
        for h in (0, 1):
            xs = sorted(halves[h])
            k = -(-d * len(xs) // 10)
            vals[h] = xs[k - 1]
        assert r["even_value"] == pytest.approx(vals[0] / 100, abs=0.011)
        assert r["odd_value"] == pytest.approx(vals[1] / 100, abs=0.011)
        assert r["qq_gap"] == pytest.approx(
            (vals[1] - vals[0]) / 100, abs=0.021
        )
