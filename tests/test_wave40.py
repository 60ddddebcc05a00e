"""Wave-40 bounded exact-similarity front doors vs brute-force python."""

import itertools
import random

import pytest

from federated_gcn_spark.operators.ppjoin import (
    set_similarity_counts,
    set_similarity_topk,
)
from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _rand_sets(seed, n=50, clones=8):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    sets = {i: set(rng.sample(vocab, rng.randint(3, 12))) for i in range(n)}
    # clone groups: ids 100.. share set 3's elements, 200.. share set 5's
    for j in range(clones):
        sets[100 + j] = set(sets[3])
    for j in range(3):
        sets[200 + j] = set(sets[5])
    return sets


def _brute_neighbors(sets, t):
    """{id: [(jaccard, nbr_rep, nbr), ...]} — every qualifying directed
    neighbor with the documented tie-break key (rounded j)."""
    rep = {}
    for i, s in sets.items():
        key = tuple(sorted(s))
        rep.setdefault(key, min(
            j for j, o in sets.items() if tuple(sorted(o)) == key
        ))
    out = {i: [] for i in sets}
    for (ia, ea), (ib, eb) in itertools.combinations(sorted(sets.items()), 2):
        if not ea or not eb:
            continue
        j = len(ea & eb) / len(ea | eb)
        if j >= t:
            jr = round(j, 6)
            out[ia].append((jr, rep[tuple(sorted(eb))], ib))
            out[ib].append((jr, rep[tuple(sorted(ea))], ia))
    return out


def _df(spark, sets):
    return spark.createDataFrame(
        [(i, sorted(s)) for i, s in sets.items()],
        "id long, elems array<string>",
    )


@pytest.mark.parametrize("t,k", [(0.5, 3), (0.4, 5), (0.8, 2)])
def test_topk_matches_bruteforce(spark, t, k):
    sets = _rand_sets(17)
    nbrs = _brute_neighbors(sets, t)
    got = {}
    for r in set_similarity_topk(_df(spark, sets), threshold=t, k=k).collect():
        got.setdefault(r["id"], []).append(
            (r["rank"], r["nbr_id"], r["jaccard"])
        )
    for i, cands in nbrs.items():
        want = [
            (rk + 1, nbr, jr)
            for rk, (jr, _, nbr) in enumerate(
                sorted(cands, key=lambda c: (-c[0], c[1], c[2]))[:k]
            )
        ]
        assert sorted(got.get(i, [])) == want, f"id {i}"


def test_counts_matches_bruteforce(spark):
    sets = _rand_sets(29)
    nbrs = _brute_neighbors(sets, 0.5)
    got = {
        r["id"]: (r["n_similar"], r["max_jaccard"])
        for r in set_similarity_counts(_df(spark, sets), threshold=0.5).collect()
    }
    assert set(got) == set(sets)
    for i, cands in nbrs.items():
        n, mj = got[i]
        assert n == len(cands), f"id {i}"
        if cands:
            assert mj == pytest.approx(max(c[0] for c in cands), abs=1e-9)
        else:
            assert mj is None


def test_topk_clone_group_larger_than_k(spark):
    """A clone group bigger than k fills every member's list with its
    k smallest-id siblings at jaccard 1.0 — the Θ(N·k) head path."""
    sets = {i: {"a", "b", "c"} for i in range(10)}
    sets[99] = {"x", "y", "z"}  # isolated: no rows
    rows = set_similarity_topk(_df(spark, sets), threshold=0.5, k=3).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["rank"], r["nbr_id"], r["jaccard"]))
    assert 99 not in by_id
    for i in range(10):
        sibs = [x for x in range(10) if x != i][:3]
        assert sorted(by_id[i]) == [
            (rk + 1, nbr, 1.0) for rk, nbr in enumerate(sibs)
        ]


def test_wave40_queries_run_and_agree(spark):
    """The registered queries produce consistent views of the same
    neighborhood structure at sf0.001."""
    topk = QUERIES["set_similarity_topk"](spark, SF_DIR).collect()
    counts = {
        r["doc_id"]: r["n_similar"]
        for r in QUERIES["set_similarity_counts"](spark, SF_DIR).collect()
    }
    assert len(counts) > 0
    per_doc = {}
    for r in topk:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rows in per_doc.items():
        # a doc shows min(k, n_similar) ranked rows
        assert len(rows) == min(3, counts[doc])
        assert sorted(r["sim_rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
    # every doc with n_similar > 0 appears in topk
    assert {d for d, n in counts.items() if n > 0} == set(per_doc)
