"""Round-4 wave-29 pipeline-audit queries vs pure-python references."""

import math
import re
from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES
from federated_gcn_spark.plans.queries_wave29 import _jl_signs

SF_DIR = "/root/testdata/sf0.001"


def _docs():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_jl_fidelity_matches_python_and_concentrates(spark):
    con = duckdb.connect()
    embs = dict(
        con.execute(
            f"""SELECT vec_id, CAST(embedding AS DOUBLE[])
                FROM read_parquet('{SF_DIR}/embeddings.parquet')"""
        ).fetchall()
    )
    con.close()
    signs = _jl_signs()
    ratios = []
    for ida in sorted(embs):
        if ida % 50 != 0 or ida + 1 not in embs:
            continue
        ea, eb = embs[ida], embs[ida + 1]
        dx2 = round(sum((x - y) * (x - y) for x, y in zip(ea, eb)), 9)
        if dx2 <= 0:
            continue
        dy2 = 0.0
        for k in range(16):
            ya = round(sum(x * s for x, s in zip(ea, signs[k])), 9)
            yb = round(sum(x * s for x, s in zip(eb, signs[k])), 9)
            dy2 += (ya - yb) * (ya - yb)
        ratios.append(round(dy2 / (16 * dx2), 9))
    r = QUERIES["jl_projection_fidelity"](spark, SF_DIR).collect()[0]
    assert r["n_pairs"] == len(ratios)
    assert r["mean_ratio"] == pytest.approx(sum(ratios) / len(ratios), abs=1e-5)
    assert r["min_ratio"] == pytest.approx(min(ratios), abs=1e-6)
    assert r["max_ratio"] == pytest.approx(max(ratios), abs=1e-6)
    # JL concentration: the mean distortion must hover around 1
    assert 0.5 < r["mean_ratio"] < 2.0


def test_feature_hash_collisions_consistent(spark):
    r = QUERIES["feature_hash_collisions"](spark, SF_DIR).collect()[0]
    vocab = set()
    for _, text, _ in _docs():
        for t in re.split(r"\s+", text.strip().lower()):
            if t:
                vocab.add(t)
    assert r["n_terms"] == len(vocab)
    assert 0 < r["buckets_used"] <= min(4096, r["n_terms"])
    assert r["collision_rate"] == pytest.approx(
        1 - r["buckets_used"] / r["n_terms"], abs=1e-6
    )
    expected = 4096 * (1 - (1 - 1 / 4096) ** len(vocab))
    assert r["expected_used"] == pytest.approx(expected, abs=0.01)
    # observed usage should be in the Poisson ballpark (+-15%)
    assert abs(r["buckets_used"] - expected) / expected < 0.15


def test_mojibake_stats_matches_python(spark):
    per = defaultdict(lambda: [0, 0, 0, 0, 0.0])
    ctrl = re.compile(r"[\x01-\x08\x0B\x0C\x0E-\x1F]")
    nonascii = re.compile(r"[^\x00-\x7F]")
    for _, text, source in _docs():
        if len(text) == 0:
            continue
        s = per[source]
        na = len(nonascii.findall(text))
        s[0] += 1
        s[1] += 1 if na > 0 else 0
        s[2] += text.count("�")
        s[3] += len(ctrl.findall(text))
        s[4] += round(na / len(text), 9)
    got = {r["source"]: r for r in QUERIES["mojibake_stats"](spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for src, (n, dna, rep, c, fsum) in per.items():
        r = got[src]
        assert r["n_docs"] == n
        assert r["docs_nonascii"] == dna
        assert r["replacement_chars"] == rep
        assert r["control_chars"] == c
        assert r["mean_nonascii_frac"] == pytest.approx(fsum / n, abs=1e-5)


def test_ngram_novelty_matches_python(spark):
    train_inv = set()
    held = []
    for doc_id, text, source in _docs():
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        grams = {
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        } if len(toks) >= 8 else set()
        if doc_id % 10 >= 8:
            held.append((doc_id, source, grams))
        else:
            train_inv |= grams
    per = defaultdict(lambda: [0, 0, 0, 0.0])
    for _, source, grams in held:
        if not grams:
            continue
        novel = sum(1 for g in grams if g not in train_inv)
        s = per[source]
        s[0] += 1
        s[1] += len(grams)
        s[2] += novel
        s[3] += round(novel / len(grams), 9)
    got = {
        r["source"]: r
        for r in QUERIES["ngram_novelty_scan"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for src, (n, tg, ng, fsum) in per.items():
        r = got[src]
        assert r["n_held_docs"] == n
        assert r["total_grams"] == tg
        assert r["novel_grams"] == ng
        assert r["mean_novelty"] == pytest.approx(fsum / n, abs=1e-5)
