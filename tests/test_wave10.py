"""Round-4 wave-10 queries vs pure-python/scipy references: Bollinger
bands, drawdown, one-way ANOVA, Jarque-Bera."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _daily_cents(col="o_totalprice", table="orders", datecol="o_orderdate"):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01', CAST({datecol} AS DATE)),
                   CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/{table}.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    return dict(rows)


def test_bollinger_bands_matches_python(spark):
    daily = _daily_cents()
    got = {
        r["day"]: r for r in QUERIES["bollinger_bands"](spark, SF_DIR).collect()
    }
    assert set(got) == set(daily)
    for day, rev in daily.items():
        members = [daily[d] for d in range(day - 19, day + 1) if d in daily]
        n = len(members)
        mean = sum(members) / n
        var = (n * sum(m * m for m in members) - sum(members) ** 2) / (n * n)
        sd = math.sqrt(var)
        r = got[day]
        assert r["n_members"] == n
        assert r["revenue"] == pytest.approx(rev / 100, abs=1e-6)
        assert r["sma_revenue"] == pytest.approx(mean / 100, abs=1e-3)
        assert r["upper_band"] == pytest.approx((mean + 2 * sd) / 100, abs=1e-3)
        assert r["lower_band"] == pytest.approx((mean - 2 * sd) / 100, abs=1e-3)


def test_max_drawdown_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT strftime(o_orderdate, '%Y-%m'),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    got = QUERIES["max_drawdown"](spark, SF_DIR).collect()
    assert [r["month"] for r in got] == [m for m, _ in rows]
    peak = 0
    for r, (_, rev) in zip(got, rows):
        peak = max(peak, rev)
        assert r["revenue"] == pytest.approx(rev / 100, abs=1e-6)
        assert r["peak_revenue"] == pytest.approx(peak / 100, abs=1e-6)
        assert r["drawdown_frac"] == pytest.approx(
            (peak - rev) / peak, abs=1e-5
        )
    # the headline statistic: max drawdown is attained somewhere
    assert max(r["drawdown_frac"] for r in got) >= 0


def test_anova_oneway_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    # textbook one-way ANOVA from scratch (exact integer sums)
    all_v = [v for vs in groups.values() for v in vs]
    grand = sum(all_v) / len(all_v)
    ssb_ref = sum(
        len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in groups.values()
    )
    ssw_ref = sum(
        (v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs
    )
    k, n = len(groups), len(all_v)
    f_ref = (ssb_ref / (k - 1)) / (ssw_ref / (n - k))
    r = QUERIES["anova_oneway"](spark, SF_DIR).collect()[0]
    assert r["k_groups"] == len(groups)
    assert r["n_total"] == sum(len(v) for v in groups.values())
    assert r["df_between"] == len(groups) - 1
    assert r["df_within"] == r["n_total"] - len(groups)
    assert r["f_stat"] == pytest.approx(f_ref, rel=1e-6)
    # SS identity: SSB + SSW == total sum of squares (in 1e9 dollars^2)
    all_v = [v for vs in groups.values() for v in vs]
    mean = sum(all_v) / len(all_v)
    sst = sum((v - mean) ** 2 for v in all_v) / 1e13
    # each term is displayed at 4 dp, so the identity holds to the grid
    assert r["ss_between_gusd2"] + r["ss_within_gusd2"] == pytest.approx(
        sst, abs=1.1e-4
    )


def test_jarque_bera_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(float(v))
    got = {r["grp"]: r for r in QUERIES["jarque_bera_price"](spark, SF_DIR).collect()}
    assert set(got) == set(groups)
    for g, vals in groups.items():
        # textbook population moments from scratch
        n_ = len(vals)
        mu = sum(vals) / n_
        m2 = sum((v - mu) ** 2 for v in vals) / n_
        m3 = sum((v - mu) ** 3 for v in vals) / n_
        m4 = sum((v - mu) ** 4 for v in vals) / n_
        skew_ref = m3 / m2**1.5
        kurt_ref = m4 / m2**2 - 3  # excess
        jb_ref = n_ / 6 * (skew_ref**2 + kurt_ref**2 / 4)
        r = got[g]
        assert r["n"] == len(vals)
        assert r["skewness"] == pytest.approx(skew_ref, abs=1e-5)
        assert r["excess_kurtosis"] == pytest.approx(kurt_ref, abs=1e-5)
        assert r["jb_stat"] == pytest.approx(jb_ref, rel=1e-5)
