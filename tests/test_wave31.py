"""Round-4 wave-31 survival/forecast-eval queries vs python refs."""

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


def test_nelson_aalen_matches_python_and_dominates_km(spark):
    con = duckdb.connect()
    spans = con.execute(
        f"""SELECT MIN(epoch_ns(ts) // 1000000000 // 86400),
                   MAX(epoch_ns(ts) // 1000000000 // 86400)
            FROM read_parquet('{SF_DIR}/events.parquet') GROUP BY user_id"""
    ).fetchall()
    con.close()
    max_day = max(l for _, l in spans)
    obs = [(l - f, 1 if l < max_day else 0) for f, l in spans]
    byd = defaultdict(lambda: [0, 0])
    for dur, ch in obs:
        byd[dur][0] += 1
        byd[dur][1] += ch
    n_risk = len(obs)
    cum = 0.0
    expect = []
    for dur in sorted(byd):
        leaving, events = byd[dur]
        if events > 0:
            cum += round(events / n_risk, 12)
            expect.append((dur, n_risk, events, cum))
        n_risk -= leaving
    got = QUERIES["nelson_aalen_hazard"](spark, SF_DIR).collect()
    assert len(got) == len(expect)
    for r, (dur, nr, ev, h) in zip(got, expect):
        assert r["duration"] == dur
        assert r["n_risk"] == nr and r["n_events"] == ev
        assert r["cum_hazard"] == pytest.approx(h, abs=1e-5)
        assert r["breslow_survival"] == pytest.approx(math.exp(-h), abs=1e-5)
    # hazard is nondecreasing, survival nonincreasing
    assert all(a["cum_hazard"] <= b["cum_hazard"] for a, b in zip(got, got[1:]))


def test_forecast_accuracy_matches_python(spark):
    rows = _daily()
    ts = [t for t, _ in rows]
    ymap = dict(rows)
    cut = min(ts) + int(math.floor(0.8 * (max(ts) - min(ts))))
    y_last = ymap[max(t for t in ts if t <= cut)]
    diffs = [
        abs(ymap[t + 1] - ymap[t]) for t in ts if t + 1 in ymap and t + 1 <= cut
    ]
    scale = sum(diffs) / len(diffs)
    test = [(t, ymap[t]) for t in ts if t > cut and t - 7 in ymap]
    got = {
        r["method"]: r
        for r in QUERIES["forecast_accuracy_report"](spark, SF_DIR).collect()
    }
    for method, f in (("naive", lambda t: y_last), ("seasonal7", lambda t: ymap[t - 7])):
        errs = [abs(y - f(t)) for t, y in test]
        smape = sum(round(2 * abs(y - f(t)) / (y + f(t)), 9) for t, y in test)
        r = got[method]
        assert r["n_eval"] == len(test)
        assert r["mae_eur"] == pytest.approx(sum(errs) / len(errs) / 100, abs=0.01)
        assert r["mase"] == pytest.approx(sum(errs) / len(errs) / scale, abs=1e-3)
        assert r["smape"] == pytest.approx(smape / len(test), abs=1e-5)


def test_pinball_eval_matches_python(spark):
    rows = _daily()
    ts = [t for t, _ in rows]
    ymap = dict(rows)
    cut = min(ts) + int(math.floor(0.8 * (max(ts) - min(ts))))
    train = defaultdict(list)
    for t in ts:
        if t <= cut:
            train[t % 7].append(ymap[t])
    qf = {}
    for dow, ys in train.items():
        ys = sorted(ys)
        for q in (0.1, 0.5, 0.9):
            qf[(q, dow)] = ys[math.ceil(q * len(ys)) - 1]
    test = [(t, ymap[t]) for t in ts if t > cut]
    got = {
        r["quantile"]: r
        for r in QUERIES["pinball_quantile_eval"](spark, SF_DIR).collect()
    }
    for q in (0.1, 0.5, 0.9):
        losses, cov = [], 0
        for t, y in test:
            f = qf[(q, t % 7)]
            losses.append(round(max(q * (y - f), (q - 1) * (y - f)) / 100, 4))
            cov += 1 if y <= f else 0
        r = got[q]
        assert r["n_eval"] == len(test)
        assert r["mean_pinball_eur"] == pytest.approx(
            sum(losses) / len(losses), abs=1e-2
        )
        assert r["coverage"] == pytest.approx(cov / len(test), abs=1e-4)
    # pinball of extreme quantiles is cheaper than the median's
    assert got[0.5]["mean_pinball_eur"] >= got[0.1]["mean_pinball_eur"] * 0.5


def test_croston_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_partkey,
                   date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)),
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_partkey % 199 = 3 GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    con.close()
    series = defaultdict(list)
    for part, day, d in rows:
        series[part].append((day, d))
    alpha = 0.2
    expect = {}
    for part, evs in series.items():
        evs.sort()
        sizes = [d for _, d in evs]
        taus = [evs[i][0] - evs[i - 1][0] for i in range(1, len(evs))]
        sn = sd = tn = td = 0.0
        has_tau = False
        for k in range(min(20, len(sizes))):
            w = alpha * (1 - alpha) ** k
            sn += round(w * sizes[-1 - k], 6)
            sd += round(w, 9)
            # tau of event idx = mx - k exists when that event has a
            # predecessor, i.e. idx >= 2
            if len(sizes) - k >= 2:
                tn += round(w * taus[len(taus) - 1 - k], 6)
                td += round(w, 9)
                has_tau = True
        if has_tau:
            expect[part] = (len(sizes), sn / sd, tn / td)
    got = {
        r["part"]: r
        for r in QUERIES["croston_demand_forecast"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect)
    for part, (n, sl, tl) in expect.items():
        r = got[part]
        assert r["n_events"] == n
        assert r["size_level"] == pytest.approx(sl, abs=1e-3)
        assert r["interval_level"] == pytest.approx(tl, abs=1e-3)
        assert r["demand_per_day"] == pytest.approx(sl / tl, abs=1e-2)
