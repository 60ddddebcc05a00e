"""Multi-cutpoint exact selection and DSIR importance weights."""

import math
import random

import pytest
from pyspark.sql import functions as F

from federated_gcn_spark.operators.quality import dsir_log_weights
from federated_gcn_spark.operators.stats import (
    exact_kth_smallest_value,
    exact_quantile_values,
)


def _values_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "x double")


def test_exact_quantile_values_match_sorted_list(spark):
    rng = random.Random(3)
    # duplicates on purpose: order statistics must be exact under ties
    vals = [round(rng.uniform(-50, 50), 1) for _ in range(997)]
    df = _values_df(spark, vals)
    s = sorted(vals)
    ks = [1, 2, 100, 499, 500, 996, 997]
    got = exact_quantile_values(df, "x", ks, n_buckets=64)
    assert got == {k: s[k - 1] for k in ks}


def test_exact_quantile_values_agree_with_single_k(spark):
    vals = [float(v) for v in range(200, 0, -1)]
    df = _values_df(spark, vals)
    multi = exact_quantile_values(df, "x", [7, 103], n_buckets=16)
    for k in (7, 103):
        assert multi[k] == exact_kth_smallest_value(df, "x", k, n_buckets=16)


def test_exact_quantile_values_constant_column(spark):
    df = _values_df(spark, [4.2] * 50)
    assert exact_quantile_values(df, "x", [1, 25, 50]) == {
        1: 4.2, 25: 4.2, 50: 4.2
    }


def test_exact_quantile_values_rejects_bad_ranks(spark):
    df = _values_df(spark, [1.0, 2.0])
    with pytest.raises(ValueError):
        exact_quantile_values(df, "x", [0, 1])
    with pytest.raises(ValueError):
        exact_quantile_values(df, "x", [3])


def test_dsir_weights_prefer_target_like_documents(spark):
    """Docs made of target-only tokens must outscore docs made of
    raw-only tokens; mixed docs sit in between."""
    rows = []
    for d in range(10):          # target slice: tokens t0..t9
        rows += [(d, True, f"t{i}") for i in range(10)]
    for d in range(10, 20):      # raw-only slice: tokens r0..r9
        rows += [(d, False, f"r{i}") for i in range(10)]
    rows += [(20, False, t) for t in
             ["t0", "t1", "t2", "t3", "t4", "r0", "r1", "r2", "r3", "r4"]]
    tok = spark.createDataFrame(
        rows, "doc_id long, is_target boolean, token string"
    )
    got = {
        r["doc_id"]: r["log_w"]
        for r in dsir_log_weights(tok, n_buckets=64).collect()
    }
    target_scores = [got[d] for d in range(10)]
    raw_scores = [got[d] for d in range(10, 20)]
    assert min(target_scores) > got[20] > max(raw_scores)
    assert all(s > 0 for s in target_scores)
    assert all(s < 0 for s in raw_scores)


def test_dsir_weights_sum_structure(spark):
    """log_w is additive per token: a doc with a token twice scores
    exactly twice the bucket's logratio contribution."""
    tok = spark.createDataFrame(
        [(1, True, "a"), (2, False, "a"), (3, False, "a"), (3, False, "a")],
        "doc_id long, is_target boolean, token string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["log_w"])
        for r in dsir_log_weights(tok, n_buckets=8).collect()
    }
    # all tokens identical -> same bucket; per-token logratio is equal
    per = got[1][1]
    assert got[2] == (1, per)
    assert got[3][0] == 2
    assert math.isclose(got[3][1], 2 * per, abs_tol=2e-6)


# ---------------------------------------------------------------------------
# Grouped multi-cutpoint selection
# ---------------------------------------------------------------------------

from federated_gcn_spark.operators.stats import exact_group_quantile_values


def _grouped_df(spark, by_group):
    rows = [(g, float(v)) for g, vals in by_group.items() for v in vals]
    return spark.createDataFrame(rows, "g string, x double")


def test_exact_group_quantile_values_match_sorted_lists(spark):
    rng = random.Random(11)
    by_group = {
        "a": [round(rng.uniform(-10, 10), 2) for _ in range(401)],
        "b": [round(rng.uniform(0, 1000), 1) for _ in range(173)],
        # low-cardinality group: every boundary bucket is single-valued,
        # exercising the driver-side resolution path
        "c": [float(rng.randrange(5)) for _ in range(900)],
    }
    df = _grouped_df(spark, by_group)
    ks_of = lambda n: [1, -(-n // 4), (n + 1) // 2, -(-3 * n // 4), n]
    got = exact_group_quantile_values(df, "g", "x", ks_of, n_buckets=32)
    for g, vals in by_group.items():
        s = sorted(vals)
        for k in ks_of(len(vals)):
            assert got[(g, k)] == s[k - 1], (g, k)


def test_exact_group_quantile_values_accepts_precomputed_gstats(spark):
    by_group = {"p": [float(v) for v in range(100, 0, -1)], "q": [7.0, 3.0, 9.0]}
    df = _grouped_df(spark, by_group)
    gstats = {
        g: (min(vals), max(vals), len(vals)) for g, vals in by_group.items()
    }
    ks_of = lambda n: [(n + 1) // 2]
    got = exact_group_quantile_values(
        df, "g", "x", ks_of, n_buckets=16, gstats=gstats
    )
    assert got[("p", 50)] == 50.0
    assert got[("q", 2)] == 7.0


def test_exact_group_quantile_values_matches_group_median(spark):
    from federated_gcn_spark.operators.stats import exact_group_median

    rng = random.Random(5)
    by_group = {c: [round(rng.gauss(0, 3), 3) for _ in range(257)]
                for c in "xyz"}
    df = _grouped_df(spark, by_group)
    med = {
        r["g"]: r["median"]
        for r in exact_group_median(df, "g", "x", n_buckets=64).collect()
    }
    got = exact_group_quantile_values(
        df, "g", "x", lambda n: [(n + 1) // 2], n_buckets=64
    )
    assert med == {g: got[(g, 129)] for g in by_group}


def test_exact_group_quantile_values_rejects_bad_ranks(spark):
    df = _grouped_df(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError):
        exact_group_quantile_values(df, "g", "x", lambda n: [n + 1])


def test_exact_group_quantile_values_ignores_nulls(spark):
    """NULL values are excluded from ranks in both passes (round-5
    ADVICE regression guard: NULLs used to land in a NULL bucket and
    break the sorted() histogram walk with a TypeError)."""
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", None)] * 5
    df = spark.createDataFrame(rows, "g string, x double")
    got = exact_group_quantile_values(
        df, "g", "x", lambda n: [(n + 1) // 2], n_buckets=8
    )
    assert got == {("a", 5): 5.0}  # median of 1..9, nulls ignored


def test_exact_group_quantile_values_gstats_edge_cases(spark):
    df = _grouped_df(spark, {"a": [1.0, 2.0, 3.0]})
    # a gstats group absent from df: clear ValueError, not a KeyError
    with pytest.raises(ValueError, match="no rows in df"):
        exact_group_quantile_values(
            df, "g", "x", lambda n: [1],
            gstats={"a": (1.0, 3.0, 3), "ghost": (0.0, 1.0, 2)},
        )
    # an n=0 group is fine when ks_of(0) wants nothing...
    got = exact_group_quantile_values(
        df, "g", "x", lambda n: [(n + 1) // 2] if n else [],
        gstats={"a": (1.0, 3.0, 3), "empty": (None, None, 0)},
    )
    assert got == {("a", 2): 2.0}
    # ...and a clear error when it does ask for ranks
    with pytest.raises(ValueError, match="no non-null"):
        exact_group_quantile_values(
            df, "g", "x", lambda n: [max(n, 1)],
            gstats={"empty": (None, None, 0)},
        )


def test_grouped_quantiles_match_per_group_sorted_lists(spark):
    from federated_gcn_spark.operators.stats import (
        exact_quantile_values_by_group,
    )

    rng = random.Random(11)
    rows = [
        (g, round(rng.uniform(-50, 50), 1))
        for g in (0, 1, 2)
        for _ in range(101 + 37 * g)
    ]
    df = spark.createDataFrame(rows, "g int, x double")
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    ks_seen = {}

    def deciles(g, n):
        ks_seen[g] = [-(-d * n // 10) for d in range(1, 10)]
        return ks_seen[g]

    got = exact_quantile_values_by_group(df, "g", "x", deciles, n_buckets=32)
    for g, vals in by_g.items():
        s = sorted(vals)
        assert got[g] == {k: s[k - 1] for k in set(ks_seen[g])}


def test_grouped_quantiles_constant_group_and_ties(spark):
    from federated_gcn_spark.operators.stats import (
        exact_quantile_values_by_group,
    )

    rows = [("a", 7.5)] * 20 + [("b", v) for v in (3.0, 3.0, 1.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    got = exact_quantile_values_by_group(
        df, "g", "x", lambda g, n: [1, n // 2, n], n_buckets=8
    )
    assert got["a"] == {1: 7.5, 10: 7.5, 20: 7.5}
    assert got["b"] == {1: 1.0, 2: 3.0, 4: 9.0}


def test_grouped_quantiles_guard_high_cardinality_groups(spark):
    """Round-11 hardening: the grouped selection collects O(groups x
    buckets) rows to the driver, so a high-cardinality group column
    must fail fast (named cap in the message), and so must a
    groups-x-buckets product that would blow the second collect."""
    from federated_gcn_spark.operators.stats import (
        exact_quantile_values_by_group,
    )

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(40)], "g int, x double"
    )
    with pytest.raises(ValueError, match="max_groups"):
        exact_quantile_values_by_group(
            df, "g", "x", lambda g, n: [1], n_buckets=8, max_groups=10
        )
    # product cap: 40 groups (each with a real min<max spread) x
    # 200_000 buckets > 4M histogram rows
    spread = spark.createDataFrame(
        [(i, float(v)) for i in range(40) for v in (i, i + 1)],
        "g int, x double",
    )
    with pytest.raises(ValueError, match="histogram rows"):
        exact_quantile_values_by_group(
            spread, "g", "x", lambda g, n: [1], n_buckets=200_000
        )
