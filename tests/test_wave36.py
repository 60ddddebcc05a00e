"""Round-4 wave-36 feature-engineering queries vs python references."""

import re
from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES
from federated_gcn_spark.plans.queries_wave36 import _RAKE_STOP

SF_DIR = "/root/testdata/sf0.001"


def test_rake_matches_python(spark):
    con = duckdb.connect()
    docs = con.execute(
        f"""SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE TRIM(text) <> ''"""
    ).fetchall()
    con.close()
    stops = set(_RAKE_STOP)
    phrases = []
    for _, text in docs:
        toks = re.split(r"\s+", text.strip().lower())
        run = []
        for tok in toks + [""]:  # sentinel flushes the last run
            if tok and tok not in stops:
                run.append(tok)
            else:
                if run and len(run) <= 3:
                    phrases.append(tuple(run))
                run = []
    deg = Counter()
    freq = Counter()
    for p in phrases:
        for w in p:
            deg[w] += len(p)
            freq[w] += 1
    occ = Counter(phrases)
    scores = {
        p: round(sum(round(deg[w] / freq[w], 9) for w in p), 6) for p in occ
    }
    expect = sorted(
        ((s, " ".join(p)) for p, s in scores.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = QUERIES["rake_keyphrases"](spark, SF_DIR).collect()
    assert [(r["rake_score"], r["phrase"]) for r in got] == [
        (pytest.approx(s, abs=1e-5), p) for s, p in expect
    ]
    for r in got:
        assert r["n_occurrences"] == occ[tuple(r["phrase"].split(" "))]


def test_target_encoding_matches_python_and_leak_free(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT p.p_brand, l.l_orderkey % 3,
                   CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/lineitem.parquet') l
            JOIN read_parquet('{SF_DIR}/part.parquet') p
              ON p.p_partkey = l.l_partkey"""
    ).fetchall()
    con.close()
    cell = defaultdict(lambda: [0, 0])
    for brand, fold, y in rows:
        cell[(brand, fold)][0] += 1
        cell[(brand, fold)][1] += y
    n_all = sum(v[0] for v in cell.values())
    pos_all = sum(v[1] for v in cell.values())
    brand_tot = defaultdict(lambda: [0, 0])
    fold_tot = defaultdict(lambda: [0, 0])
    for (brand, fold), (n, p) in cell.items():
        brand_tot[brand][0] += n
        brand_tot[brand][1] += p
        fold_tot[fold][0] += n
        fold_tot[fold][1] += p
    got = {
        (r["brand"], r["fold"]): r
        for r in QUERIES["target_encoding_smoothed"](spark, SF_DIR).collect()
    }
    assert set(got) == set(cell)
    for (brand, fold), (n, p) in cell.items():
        nb, pb = brand_tot[brand]
        nf, pf = fold_tot[fold]
        # prior excludes the WHOLE encoded fold (all brands), so the
        # encoding touches no same-fold row anywhere
        prior = (pos_all - pf) / (n_all - nf)
        enc = ((pb - p) + 10 * prior) / ((nb - n) + 10)
        r = got[(brand, fold)]
        assert r["n_rows"] == n
        assert r["encoding"] == pytest.approx(enc, abs=1e-5)
        assert r["oof_prior"] == pytest.approx(prior, abs=1e-5)
        # encodings are probabilities
        assert 0 <= r["encoding"] <= 1


def test_feature_scaling_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT CAST(l_quantity * 100 AS BIGINT),
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT),
                   CAST(ROUND(l_discount * 100) AS BIGINT)
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).fetchall()
    con.close()
    feats = {
        "quantity": sorted(r[0] for r in rows),
        "extendedprice": sorted(r[1] for r in rows),
        "discount": sorted(r[2] for r in rows),
    }
    got = {
        r["feature"]: r
        for r in QUERIES["feature_scaling_stats"](spark, SF_DIR).collect()
    }
    for name, xs in feats.items():
        n = len(xs)
        r = got[name]
        assert r["n"] == n
        assert r["min_value"] == pytest.approx(xs[0] / 100, abs=0.011)
        assert r["max_value"] == pytest.approx(xs[-1] / 100, abs=0.011)
        mean = sum(xs) / n
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
        assert r["mean"] == pytest.approx(mean / 100, abs=1e-3)
        assert r["sd"] == pytest.approx(var**0.5 / 100, abs=1e-3)
        med = xs[(n + 1) // 2 - 1]
        q1 = xs[-(-n // 4) - 1]
        q3 = xs[-(-3 * n // 4) - 1]
        assert r["median"] == pytest.approx(med / 100, abs=0.011)
        assert r["iqr"] == pytest.approx((q3 - q1) / 100, abs=0.011)


def test_attack_robustness_hub_dominates_random(spark):
    con = duckdb.connect()
    ed = con.execute(
        f"""SELECT DISTINCT l_orderkey, l_suppkey + 10000000
            FROM read_parquet('{SF_DIR}/lineitem.parquet')
            WHERE l_orderkey % 10 = 0"""
    ).fetchall()
    con.close()
    deg = Counter()
    for s, d in ed:
        deg[s] += 1
        deg[d] += 1
    hubs = set(
        n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    rand5 = set(
        n
        for n, _ in sorted(
            ((n, (42 + n * 2654435761) % 4294967296) for n in deg),
            key=lambda kv: (kv[1], kv[0]),
        )[:5]
    )
    after_hub = sum(1 for s, d in ed if s not in hubs and d not in hubs)
    after_rand = sum(1 for s, d in ed if s not in rand5 and d not in rand5)
    r = QUERIES["degree_attack_robustness"](spark, SF_DIR).collect()[0]
    assert r["n_edges"] == len(ed)
    assert r["max_deg"] == max(deg.values())
    assert r["edges_after_hub_attack"] == after_hub
    assert r["edges_after_random_removal"] == after_rand
    # supplier hubs concentrate edges: targeted attack must hurt more
    assert r["hub_attack_loss"] > r["random_removal_loss"]
