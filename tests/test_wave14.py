"""Round-4 wave-14 queries vs pure-python references: Grubbs test,
MCC, temperature mixture weights, seasonal decomposition."""

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
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    con.close()
    return rows


def test_grubbs_matches_python(spark):
    rows = _daily()
    xs = [x for _, x in rows]
    n = len(xs)
    mean = sum(xs) / n
    sd = math.sqrt((n * sum(x * x for x in xs) - sum(xs) ** 2) / n**2)
    g = max(abs(x - mean) for x in xs) / sd
    out_day = min(d for d, x in rows if abs(n * x - sum(xs)) == max(
        abs(n * v - sum(xs)) for v in xs
    ))
    r = QUERIES["grubbs_outlier_test"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == n
    assert r["outlier_day"] == out_day
    assert r["g_stat"] == pytest.approx(g, abs=1e-5)


def test_mcc_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).fetchall()
    con.close()
    tp = sum(1 for yh, y in rows if y and yh)
    fp = sum(1 for yh, y in rows if not y and yh)
    tn = sum(1 for yh, y in rows if not y and not yh)
    fn = sum(1 for yh, y in rows if y and not yh)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    r = QUERIES["mcc_score"](spark, SF_DIR).collect()[0]
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (tp, fp, tn, fn)
    assert r["mcc"] == pytest.approx(mcc, abs=1e-5)
    assert -1 <= r["mcc"] <= 1


def test_temperature_weights_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT source, COUNT(*) FROM
            read_parquet('{SF_DIR}/documents.parquet') GROUP BY 1"""
    ).fetchall()
    con.close()
    counts = dict(rows)
    n = sum(counts.values())
    got = {
        r["source"]: r
        for r in QUERIES["temperature_mixture_weights"](spark, SF_DIR).collect()
    }
    assert set(got) == set(counts)
    for tau, col in [(0.5, "w_tau05"), (0.7, "w_tau07"), (1.0, "w_tau10")]:
        t = {s: (c / n) ** tau for s, c in counts.items()}
        z = sum(t.values())
        for s in counts:
            assert got[s][col] == pytest.approx(t[s] / z, abs=1e-6)
        # weights sum to 1
        assert sum(got[s][col] for s in counts) == pytest.approx(1.0, abs=1e-6)
    # tau < 1 flattens: rarest source gains weight vs its raw share
    rare = min(counts, key=lambda s: (counts[s], s))
    assert got[rare]["w_tau05"] >= got[rare]["w_tau10"] - 1e-9


def test_seasonal_decompose_matches_python(spark):
    rows = _daily()
    daily = dict(rows)
    resid_by_wd = defaultdict(list)
    for day, rev in rows:
        members = [daily[d] for d in range(day - 3, day + 4) if d in daily]
        if len(members) == 7:
            resid_by_wd[(day + 4) % 7].append(rev - sum(members) / 7.0)
    raw = {wd: sum(v) / len(v) for wd, v in resid_by_wd.items()}
    grand = sum(raw.values()) / 7.0
    got = {r["weekday"]: r for r in QUERIES["seasonal_decompose"](spark, SF_DIR).collect()}
    assert set(got) == set(raw)
    for wd, rs in raw.items():
        r = got[wd]
        assert r["n_days"] == len(resid_by_wd[wd])
        assert r["raw_weekday_effect"] == pytest.approx(rs / 100, abs=1e-3)
        assert r["seasonal"] == pytest.approx((rs - grand) / 100, abs=1e-3)
