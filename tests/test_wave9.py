"""Round-4 wave-9 queries vs pure-python references: session-window
stats and community conductance."""

from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_session_window_stats_matches_python(spark):
    """Python gaps-and-islands replay (> 600 s gap opens a session; a tie merges) —
    independent of BOTH the Spark session_window and the SQL oracle."""
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT user_id, epoch_ns(ts) // 1000000000
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    con.close()
    by_user = defaultdict(list)
    for uid, sec in rows:
        by_user[uid].append(sec)
    n_sessions = n_bounce = tot_events = tot_dur = 0
    for secs in by_user.values():
        secs.sort()
        sess = [[secs[0]]]
        for s in secs[1:]:
            if s - sess[-1][-1] > 600:
                sess.append([s])
            else:
                sess[-1].append(s)
        for ss in sess:
            n_sessions += 1
            if len(ss) == 1:
                n_bounce += 1
            tot_events += len(ss)
            tot_dur += ss[-1] - ss[0]
    r = QUERIES["session_window_stats"](spark, SF_DIR).collect()[0]
    assert r["n_sessions"] == n_sessions
    assert r["n_bounce"] == n_bounce
    assert r["bounce_rate"] == pytest.approx(n_bounce / n_sessions, rel=1e-12)
    assert r["mean_events"] == pytest.approx(
        tot_events / n_sessions, rel=1e-12
    )
    assert r["mean_duration_sec"] == pytest.approx(
        tot_dur / n_sessions, rel=1e-12
    )


def _lpa_python(edges, rounds=5):
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
            nxt[v] = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if nxt == labels:
            break
        labels = nxt
    return labels


def test_community_conductance_matches_python(spark):
    con = duckdb.connect()
    edges = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 20 = 0"""
    ).fetchall()
    con.close()
    labels = _lpa_python(edges)
    m = len(edges)
    deg = Counter()
    for s, d in edges:
        deg[s] += 1
        deg[d] += 1
    size, vol, cut = Counter(), Counter(), Counter()
    for v, l in labels.items():
        size[l] += 1
        vol[l] += deg[v]
    for s, d in edges:
        if labels[s] != labels[d]:
            cut[labels[s]] += 1
            cut[labels[d]] += 1
    top = sorted(size, key=lambda l: (-size[l], l))[:10]
    got = QUERIES["community_conductance"](spark, SF_DIR).collect()
    assert {r["label"] for r in got} == set(top)
    for r in got:
        l = r["label"]
        assert r["size"] == size[l]
        assert r["volume"] == vol[l]
        assert r["cut_edges"] == cut[l]
        denom = min(vol[l], 2 * m - vol[l])
        assert r["conductance"] == pytest.approx(cut[l] / denom, rel=1e-12)
        assert 0.0 <= r["conductance"] <= 1.0
