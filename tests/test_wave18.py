"""Round-4 wave-18 queries vs pure-python references: trimmed means,
co-purchase pairs, exponential gap fit, Hill tail index."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_trimmed_mean_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderpriority, CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    got = {r["grp"]: r for r in QUERIES["trimmed_mean_prices"](spark, SF_DIR).collect()}
    assert set(got) == set(groups)
    for g, vs in groups.items():
        vs.sort()
        n = len(vs)
        lo = n // 10
        kept = vs[lo : n - lo]
        r = got[g]
        assert r["n"] == n
        assert r["n_kept"] == len(kept)
        assert r["trimmed_mean"] == pytest.approx(
            sum(kept) / len(kept) / 100, abs=1e-3
        )
        assert r["raw_mean"] == pytest.approx(sum(vs) / n / 100, abs=1e-3)


def test_copurchase_pairs_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 10 = 0"""
    ).fetchall()
    con.close()
    baskets = defaultdict(set)
    deg = defaultdict(int)
    for ok, s in rows:
        baskets[ok].add(s)
        deg[s] += 1
    pair_counts = defaultdict(int)
    for supps in baskets.values():
        ss = sorted(supps)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pair_counts[(ss[i], ss[j])] += 1
    ranked = sorted(
        pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:20]
    got = QUERIES["copurchase_pairs"](spark, SF_DIR).collect()
    assert len(got) == len(ranked)
    for r, ((s1, s2), shared) in zip(got, ranked):
        assert (r["s1"], r["s2"], r["shared"]) == (s1, s2, shared)
        assert r["orders_s1"] == deg[s1]
        assert r["orders_s2"] == deg[s2]
        jac = shared / (deg[s1] + deg[s2] - shared)
        assert r["jaccard"] == pytest.approx(jac, abs=1e-5)


def test_exponential_gap_fit_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_custkey,
                   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            FROM read_parquet('{SF_DIR}/orders.parquet')
            ORDER BY 1, 2"""
    ).fetchall()
    con.close()
    by_cust = defaultdict(list)
    for ck, d in rows:
        by_cust[ck].append(d)
    gaps = []
    for days in by_cust.values():
        days.sort()
        gaps.extend(b - a for a, b in zip(days, days[1:]) if b - a > 0)
    n = len(gaps)
    sg = sum(gaps)
    lam = n / sg
    xs = sorted(set(gaps))
    counts = defaultdict(int)
    for g in gaps:
        counts[g] += 1
    cum = 0
    ks = 0.0
    for g in xs:
        f = round(1 - math.exp(-lam * g), 9)
        ks = max(ks, abs(cum / n - f))
        cum += counts[g]
        ks = max(ks, abs(cum / n - f))
    r = QUERIES["exponential_gap_fit"](spark, SF_DIR).collect()[0]
    assert r["n_gaps"] == n
    assert r["lambda_per_day"] == pytest.approx(lam, abs=1e-8)
    assert r["mean_gap_days"] == pytest.approx(sg / n, abs=1e-3)
    assert r["ks_distance"] == pytest.approx(ks, abs=1e-5)


def test_hill_tail_index_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT), o_orderkey
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    rows.sort(key=lambda t: (-t[0], t[1]))
    top = [v for v, _ in rows[:50]]
    vk = rows[50][0]
    alpha = 50 / sum(math.log(v / vk) for v in top)
    r = QUERIES["hill_tail_index"](spark, SF_DIR).collect()[0]
    assert r["k_top"] == 50
    assert r["threshold_value"] == pytest.approx(vk / 100, abs=1e-6)
    assert r["hill_alpha"] == pytest.approx(alpha, rel=1e-4)
    assert r["hill_alpha"] > 0
