"""Round-4 wave-13 queries vs pure-python references: int8
quantization fidelity, truncation fidelity, Gopher rules, SPRT."""

import math
from collections import Counter, defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _embeddings():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    ).fetchall()
    con.close()
    return rows


def test_int8_quant_report_matches_python(spark):
    per = defaultdict(lambda: [0, 0.0, 0.0])  # n, mse_sum, cos_sum
    for label, e in _embeddings():
        e = [float(x) for x in e]
        scale = max(abs(x) for x in e) / 127
        if scale <= 0:
            continue
        # python round is banker's; the engines round half away from
        # zero — emulate that explicitly
        r = [
            math.floor(x / scale + 0.5) * scale
            if x >= 0
            else math.ceil(x / scale - 0.5) * scale
            for x in e
        ]
        mse = sum((a - b) ** 2 for a, b in zip(e, r)) / 64
        dot = sum(a * b for a, b in zip(e, r))
        cos = dot / (
            math.sqrt(sum(a * a for a in e)) * math.sqrt(sum(b * b for b in r))
        )
        per[label][0] += 1
        per[label][1] += mse
        per[label][2] += cos
    got = {
        r["label"]: r
        for r in QUERIES["embedding_int8_quant_report"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for label, (n, mse_s, cos_s) in per.items():
        r = got[label]
        assert r["n_vecs"] == n
        assert r["avg_mse"] == pytest.approx(mse_s / n, rel=1e-6, abs=1e-12)
        assert r["avg_cos"] == pytest.approx(cos_s / n, abs=1e-6)
        assert 0.99 < r["avg_cos"] <= 1.0  # int8 keeps cosine ~1


def test_truncation_fidelity_matches_python(spark):
    per = defaultdict(list)
    for label, e in _embeddings():
        e = [float(x) for x in e]
        full = sum(x * x for x in e)
        head = sum(x * x for x in e[:32])
        if full > 0:
            per[label].append(math.sqrt(head / full))
    got = {
        r["label"]: r
        for r in QUERIES["embedding_truncation_fidelity"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(per)
    for label, cs in per.items():
        r = got[label]
        assert r["n_vecs"] == len(cs)
        assert r["avg_cos"] == pytest.approx(sum(cs) / len(cs), abs=1e-6)
        assert r["min_cos"] == pytest.approx(min(cs), abs=1e-6)
        assert r["n_ge_070"] == sum(1 for c in cs if c >= 0.7)


def test_gopher_rules_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()
    con.close()
    n_docs = len(rows)
    p1 = p2 = p3 = p4 = pall = 0
    for (text,) in rows:
        toks = text.split(" ")
        n_tok = len(toks)
        len_nospace = len(text.replace(" ", ""))
        non_alpha = sum(1 for ch in text if not (ch == " " or "a" <= ch <= "z"))
        top = Counter(toks).most_common(1)[0][1]
        r1 = 20 <= n_tok <= 100000
        r2 = 3 * n_tok <= len_nospace <= 10 * n_tok
        r3 = 5 * non_alpha <= len(text)
        r4 = 5 * top <= n_tok
        p1 += r1
        p2 += r2
        p3 += r3
        p4 += r4
        pall += r1 and r2 and r3 and r4
    r = QUERIES["gopher_quality_rules"](spark, SF_DIR).collect()[0]
    assert r["n_docs"] == n_docs
    assert r["pass_token_count"] == p1
    assert r["pass_mean_token_len"] == p2
    assert r["pass_alpha_ratio"] == p3
    assert r["pass_top_token_share"] == p4
    assert r["pass_all"] == pall
    assert r["pass_all_rate"] == pytest.approx(pall / n_docs, abs=1e-5)


def test_sprt_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT epoch_ns(ts) // 1000000000 // 86400,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
            FROM read_parquet('{SF_DIR}/events.parquet')"""
    ).fetchall()
    con.close()
    daily = defaultdict(lambda: [0, 0])
    for day, hit in rows:
        daily[day][0] += hit
        daily[day][1] += 1
    c1, c0 = 0.200670695462, -0.050010420575
    lna = 2.944438979166
    ch = ct = 0
    decision = 0
    decision_day = -1
    llr = 0.0
    for day in sorted(daily):
        ch += daily[day][0]
        ct += daily[day][1]
        llr = ch * c1 + (ct - ch) * c0
        if decision == 0:
            if llr >= lna:
                decision, decision_day = 1, day
            elif llr <= -lna:
                decision, decision_day = -1, day
    r = QUERIES["sprt_conversion_monitor"](spark, SF_DIR).collect()[0]
    assert r["n_days"] == len(daily)
    assert r["n_events"] == ct
    assert r["decision"] == decision
    assert r["decision_day"] == decision_day
    assert r["final_llr"] == pytest.approx(llr, abs=1e-5)
