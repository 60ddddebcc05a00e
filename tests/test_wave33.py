"""Round-4 wave-33 Markov-chain queries vs pure-python references."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _transition_probs():
    con = duckdb.connect()
    rows = con.execute(
        f"""WITH e AS (
                SELECT user_id, event_id, event_type,
                       epoch_ns(ts) // 1000000000 AS sec
                FROM read_parquet('{SF_DIR}/events.parquet')
            ), seq AS (
                SELECT event_type AS ft,
                       LEAD(event_type) OVER (
                           PARTITION BY user_id ORDER BY sec, event_id
                       ) AS tt
                FROM e
            )
            SELECT ft, tt, COUNT(*) FROM seq WHERE tt IS NOT NULL
            GROUP BY ft, tt"""
    ).fetchall()
    con.close()
    tot = defaultdict(int)
    for ft, _, n in rows:
        tot[ft] += n
    return {(ft, tt): n / tot[ft] for ft, tt, n in rows}


def _step(pi, p):
    nxt = defaultdict(float)
    for (ft, tt), prob in p.items():
        if ft in pi:
            nxt[tt] += round(pi[ft] * prob, 12)
    return dict(nxt)


def test_stationary_matches_python(spark):
    p = _transition_probs()
    states = sorted({ft for ft, _ in p})
    pi = {s: 1 / len(states) for s in states}
    prev = pi
    for _ in range(12):
        prev = pi
        pi = _step(pi, p)
    got = {
        r["event_type"]: r
        for r in QUERIES["markov_stationary_distribution"](spark, SF_DIR).collect()
    }
    assert set(got) == set(states)
    total = 0.0
    for s in states:
        assert got[s]["stationary_prob"] == pytest.approx(pi[s], abs=1e-7)
        assert got[s]["last_step_delta"] == pytest.approx(
            abs(pi[s] - prev[s]), abs=1e-7
        )
        total += got[s]["stationary_prob"]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_absorption_matches_python(spark):
    p = _transition_probs()
    absorbing = {"error", "purchase"}
    q = {k: v for k, v in p.items() if k[0] not in absorbing and k[1] not in absorbing}
    r = {k: v for k, v in p.items() if k[0] not in absorbing and k[1] in absorbing}
    b = defaultdict(float)
    for (s, a), prob in r.items():
        b[(s, a)] = prob
    for _ in range(20):
        stepped = defaultdict(float)
        for (s, t), qp in q.items():
            for a in absorbing:
                if (t, a) in b:
                    stepped[(s, a)] += round(qp * b[(t, a)], 12)
        nb = defaultdict(float)
        for (s, a), prob in r.items():
            nb[(s, a)] += round(prob, 12)
        for k, v in stepped.items():
            nb[k] += round(v, 12)
        b = nb
    got = {
        r_["start_state"]: r_
        for r_ in QUERIES["markov_absorption_probabilities"](
            spark, SF_DIR
        ).collect()
    }
    starts = {s for s, _ in q} | {s for s, _ in r}
    assert set(got) == starts
    for s in starts:
        assert got[s]["p_purchase"] == pytest.approx(
            b.get((s, "purchase"), 0.0), abs=1e-5
        )
        assert got[s]["p_error"] == pytest.approx(
            b.get((s, "error"), 0.0), abs=1e-5
        )
        # the truncated Neumann series must have nearly absorbed
        assert 0.95 < got[s]["p_total"] <= 1.0 + 1e-9


def test_entropy_rate_matches_python(spark):
    p = _transition_probs()
    states = sorted({ft for ft, _ in p})
    pi = {s: 1 / len(states) for s in states}
    for _ in range(12):
        pi = _step(pi, p)
    got = {
        r["event_type"]: r
        for r in QUERIES["markov_entropy_rate"](spark, SF_DIR).collect()
    }
    for s in states:
        h = sum(
            round(-prob * math.log(prob) / math.log(2), 12)
            for (ft, _), prob in p.items()
            if ft == s
        )
        assert got[s]["row_entropy_bits"] == pytest.approx(h, abs=1e-5)
        assert got[s]["contribution_bits"] == pytest.approx(
            round(pi[s] * h, 12), abs=1e-5
        )
        # 5 states => row entropy can never exceed log2(5)
        assert 0 <= got[s]["row_entropy_bits"] <= math.log2(5) + 1e-9


def test_mixing_curve_matches_python_and_decreases(spark):
    p = _transition_probs()
    states = sorted({ft for ft, _ in p})
    stat = {s: 1 / len(states) for s in states}
    for _ in range(12):
        stat = _step(stat, p)
    m = {s: (1.0 if s == "signup" else 0.0) for s in states}
    expect = []
    for _ in range(8):
        m = _step(m, p)
        tv = 0.5 * sum(
            round(abs(m.get(s, 0.0) - stat.get(s, 0.0)), 12) for s in states
        )
        expect.append(round(tv, 9))
    got = QUERIES["markov_mixing_curve"](spark, SF_DIR).collect()
    assert [r["step"] for r in got] == list(range(1, 9))
    for r, tv in zip(got, expect):
        assert r["tv_distance"] == pytest.approx(tv, abs=1e-7)
    # the chain mixes: late distances below the first step's
    assert got[-1]["tv_distance"] <= got[0]["tv_distance"] + 1e-9
