"""Round-4 wave-6 queries vs pure-python references: modularity,
multi-touch attribution, k-anonymity, SRM, Brown smoothing, PPS
systematic sampling."""

from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _edges():
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 20 = 0"""
    ).fetchall()
    con.close()
    return rows


def _lpa_python(edges, rounds=5):
    """Deterministic LPA reference: neighbor votes + self vote, most
    frequent label, ties to the smaller label."""
    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        adj[d].append(s)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        nxt = {}
        for v in adj:
            votes = Counter(labels[u] for u in adj[v])
            votes[labels[v]] += 1
            best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            nxt[v] = best
        if nxt == labels:
            break
        labels = nxt
    return labels


def test_community_modularity_matches_python(spark):
    edges = _edges()
    labels = _lpa_python(edges)
    m = len(edges)
    deg = Counter()
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    e_c = Counter()
    for s, d in edges:
        if labels[s] == labels[d]:
            e_c[labels[s]] += 1
    d_c = Counter()
    for v, dv in deg.items():
        d_c[labels[v]] += dv
    comms = set(labels.values())
    q = sum(4 * m * e_c[c] - d_c[c] ** 2 for c in comms) / (4.0 * m * m)
    row = QUERIES["community_modularity"](spark, SF_DIR).collect()[0]
    assert row["m_edges"] == m
    assert row["n_communities"] == len(comms)
    assert row["modularity"] == pytest.approx(q, rel=1e-12)
    assert -0.5 <= row["modularity"] <= 1.0


def test_attribution_credit_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, event_type, event_id,
                   epoch_ns(ts) // 1000000000
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    con.close()
    tp = {}
    for uid, et, _eid, sec in rows:
        if et == "purchase":
            tp[uid] = min(tp.get(uid, sec), sec)
    journeys = defaultdict(list)
    for uid, et, eid, sec in rows:
        if et in ("view", "click", "signup") and uid in tp and sec < tp[uid]:
            journeys[uid].append((sec, eid, et))
    credit = Counter()
    touches = Counter()
    for uid, js in journeys.items():
        js.sort()
        k = len(js)
        for pos, (_sec, _eid, et) in enumerate(js, 1):
            touches[et] += 1
            if k == 1:
                bp = 10000
            elif k == 2:
                bp = 5000
            elif pos in (1, k):
                bp = 4000
            else:
                bp = 2000 // (k - 2) + (1 if pos - 1 <= 2000 % (k - 2) else 0)
            credit[et] += bp
    # every journey's credit must total exactly 10000 by construction
    assert sum(credit.values()) == 10000 * len(journeys)
    got = {
        r["channel"]: r
        for r in QUERIES["attribution_credit_split"](spark, SF_DIR).collect()
    }
    assert set(got) == set(credit)
    total = sum(credit.values())
    for ch, r in got.items():
        assert r["n_touches"] == touches[ch]
        assert r["credit_bp"] == credit[ch]
        assert r["credit_share"] == pytest.approx(credit[ch] / total, rel=1e-12)


def test_k_anonymity_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT c_nationkey, c_mktsegment
            FROM read_parquet('{SF_DIR}/customer.parquet')"""
    ).fetchall()
    con.close()
    sizes = Counter(rows)
    at_risk = sum(v for v in sizes.values() if v < 10)
    row = QUERIES["k_anonymity_report"](spark, SF_DIR).collect()[0]
    assert row["n_classes"] == len(sizes)
    assert row["n_rows"] == len(rows)
    assert row["k_anonymity"] == min(sizes.values())
    assert row["rows_at_risk"] == at_risk
    assert row["risk_fraction"] == pytest.approx(at_risk / len(rows), rel=1e-12)


def test_srm_check_matches_python(spark):
    con = duckdb.connect()
    (n0,), (n1,) = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{SF_DIR}/customer.parquet')
            WHERE c_custkey % 2 = 0
            UNION ALL
            SELECT COUNT(*) FROM read_parquet('{SF_DIR}/customer.parquet')
            WHERE c_custkey % 2 = 1"""
    ).fetchall()
    con.close()
    chi2 = (n1 - n0) ** 2 / (n0 + n1)
    row = QUERIES["srm_assignment_check"](spark, SF_DIR).collect()[0]
    assert row["n_control"] == n0
    assert row["n_treatment"] == n1
    assert row["chi2_stat"] == pytest.approx(chi2, rel=1e-12)
    assert row["srm_flag"] == (1 if chi2 > 3.841458820694124 else 0)


def test_double_smoothing_matches_python(spark):
    """Brown's truncated-window DES against a direct python computation
    with the same 6-dp term rounding."""
    con = duckdb.connect()
    daily = dict(
        con.execute(
            f"""SELECT date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)),
                       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1"""
        ).fetchall()
    )
    con.close()
    rows = QUERIES["double_smoothing_forecast"](spark, SF_DIR).collect()
    assert len(rows) == len(daily)
    by_day = {r["day"]: r for r in rows}
    for day in sorted(daily)[:50]:
        n1 = d1 = n2 = d2 = 0.0
        members = 0
        for lag in range(20):
            wday = day - lag
            if wday in daily:
                members += 1
                w1 = 0.7 ** lag
                w2 = (lag + 1) * 0.7 ** lag
                n1 += round(daily[wday] * w1, 6)
                d1 += round(w1, 6)
                n2 += round(daily[wday] * w2, 6)
                d2 += round(w2, 6)
        s1, s2 = n1 / d1, n2 / d2
        level = 2 * s1 - s2
        trend = (0.3 / 0.7) * (s1 - s2)
        r = by_day[day]
        assert r["n_members"] == members
        assert r["s1_revenue"] == pytest.approx(s1 / 100, abs=0.02)
        assert r["s2_revenue"] == pytest.approx(s2 / 100, abs=0.02)
        assert r["level_revenue"] == pytest.approx(level / 100, abs=0.03)
        assert r["forecast_next"] == pytest.approx(
            (level + trend) / 100, abs=0.03
        )


def test_systematic_sample_properties(spark):
    """Exactly 100 draws; multiplicity matches the python prefix-sum
    replay; inclusion is weight-monotone at the extremes."""
    con = duckdb.connect()
    w = con.execute(
        f"""SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')
            ORDER BY o_orderkey"""
    ).fetchall()
    con.close()
    total = sum(wt for _, wt in w)
    step = total // 100
    expected = {}
    r = 0
    for key, wt in w:
        mult = (r + wt) // step - r // step
        if mult > 0:
            expected[key] = (wt, mult)
        r += wt
    got = {
        row["o_orderkey"]: (row["weight_cents"], row["multiplicity"])
        for row in QUERIES["systematic_weighted_sample"](spark, SF_DIR).collect()
    }
    assert got == expected
    assert sum(m for _, m in got.values()) == 100
