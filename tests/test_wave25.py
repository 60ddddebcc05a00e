"""Round-4 wave-25 queries vs pure-python references: BH FDR,
Brown-Forsythe, Bartlett, Tukey HSD."""

import math
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _cents_by(key_sql):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT {key_sql}, CAST(ROUND(o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') o"""
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for g, c in rows:
        groups[g].append(c)
    return groups


def _norm_p_two_sided(z):
    a = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    t = 1 / (1 + 0.2316419 * abs(z))
    poly = sum(a[i] * t ** (i + 1) for i in range(5))
    dens = math.exp(-z * z / 2) * 0.398942280401
    return 2 * dens * poly


def test_bh_fdr_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT n.n_name, CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON c.c_custkey = o.o_custkey
            JOIN read_parquet('{SF_DIR}/nation.parquet') n
              ON n.n_nationkey = c.c_nationkey"""
    ).fetchall()
    con.close()
    groups = defaultdict(list)
    for g, c in rows:
        groups[g].append(c)
    allv = [c for _, c in rows]
    n, s = len(allv), sum(allv)
    q = sum(v * v for v in allv)
    var = (n * q - s * s) / (n * (n - 1))
    stats = {}
    for g, xs in groups.items():
        z = (sum(xs) / len(xs) - s / n) / math.sqrt(var / len(xs))
        stats[g] = (z, _norm_p_two_sided(z))
    m = len(stats)
    ranked = sorted(stats.items(), key=lambda kv: (kv[1][1], kv[0]))
    kstar = 0
    for i, (g, (z, p)) in enumerate(ranked, 1):
        if p <= 0.05 * i / m:
            kstar = i
    rejected = {g for i, (g, _) in enumerate(ranked, 1) if i <= kstar}
    got = {
        r["n_name"]: r
        for r in QUERIES["benjamini_hochberg_fdr"](spark, SF_DIR).collect()
    }
    assert len(got) == m
    for g, (z, p) in stats.items():
        assert got[g]["z_score"] == pytest.approx(z, abs=1e-3)
        assert got[g]["p_value"] == pytest.approx(p, abs=1e-5)
        assert got[g]["rejected"] == (1 if g in rejected else 0)


def _anova_f(groups):
    n = sum(len(xs) for xs in groups.values())
    k = len(groups)
    s = sum(sum(xs) for xs in groups.values())
    q = sum(v * v for xs in groups.values() for v in xs)
    fold = sum(round(sum(xs) ** 2 / len(xs) / 10000, 2) for xs in groups.values())
    between = fold - s * s / n / 10000
    within = q / 10000 - fold
    return (between / (k - 1)) / (within / (n - k)), n, k


def test_brown_forsythe_matches_python(spark):
    groups = _cents_by("o_orderpriority")
    devs = {}
    for g, xs in groups.items():
        med = sorted(xs)[(len(xs) + 1) // 2 - 1]  # lower median, selected
        devs[g] = [abs(x - med) for x in xs]
    f, n, k = _anova_f(devs)
    r = QUERIES["brown_forsythe_levene"](spark, SF_DIR).collect()[0]
    assert r["n_groups"] == k and r["n_rows"] == n
    assert r["f_stat"] == pytest.approx(f, abs=1e-3)


def test_bartlett_matches_python(spark):
    groups = _cents_by("o_orderpriority")
    n = sum(len(xs) for xs in groups.values())
    k = len(groups)
    sum_df_ln = 0.0
    pooled_num = 0.0
    sum_inv = 0.0
    for xs in groups.values():
        ng = len(xs)
        sg, qg = sum(xs), sum(v * v for v in xs)
        s2 = (ng * qg - sg * sg) / (ng * (ng - 1)) / 10000
        sum_df_ln += round((ng - 1) * math.log(s2), 9)
        pooled_num += round((ng - 1) * s2, 4)
        sum_inv += round(1 / (ng - 1), 12)
    pooled = pooled_num / (n - k)
    chi2 = ((n - k) * math.log(pooled) - sum_df_ln) / (
        1 + (sum_inv - 1 / (n - k)) / (3 * (k - 1))
    )
    r = QUERIES["bartlett_test"](spark, SF_DIR).collect()[0]
    assert r["pooled_var"] == pytest.approx(pooled, rel=1e-6)
    assert r["chi2_stat"] == pytest.approx(chi2, abs=1e-2)


def test_tukey_hsd_matches_python(spark):
    groups = _cents_by("o_orderpriority")
    n = sum(len(xs) for xs in groups.values())
    k = len(groups)
    q = sum(v * v for xs in groups.values() for v in xs)
    fold = sum(round(sum(xs) ** 2 / len(xs) / 10000, 2) for xs in groups.values())
    msw = (q / 10000 - fold) / (n - k)
    got = {
        (r["group_a"], r["group_b"]): r
        for r in QUERIES["tukey_hsd_pairs"](spark, SF_DIR).collect()
    }
    names = sorted(groups)
    assert len(got) == k * (k - 1) // 2
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            diff = abs(
                sum(groups[a]) / len(groups[a]) - sum(groups[b]) / len(groups[b])
            )
            crit = 3.858 * math.sqrt(
                msw / 2 * (1 / len(groups[a]) + 1 / len(groups[b]))
            )
            r = got[(a, b)]
            assert r["mean_diff"] == pytest.approx(diff / 100, abs=1e-2)
            assert r["hsd_critical"] == pytest.approx(crit / 100, abs=1e-2)
            assert r["significant"] == (1 if diff > crit else 0)
