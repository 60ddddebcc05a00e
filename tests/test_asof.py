"""asof_join semantics: backward match, tie-at-timestamp, no-match NULL."""

from federated_gcn_spark.operators.asof import asof_join


def test_asof_basic(spark):
    left = spark.createDataFrame(
        [(1, 10, "q1"), (1, 25, "q2"), (1, 7, "q0"), (2, 5, "q3")],
        "k long, ts long, q string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 20, 200.0), (2, 9, 300.0)],
        "k long, ts long, val double",
    )
    got = {
        r["q"]: r["val"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["val"]).collect()
    }
    assert got == {"q0": None, "q1": 100.0, "q2": 200.0, "q3": None}


def test_asof_tie_matches_same_timestamp(spark):
    left = spark.createDataFrame([(1, 20, "q")], "k long, ts long, q string")
    right = spark.createDataFrame([(1, 20, 7.0)], "k long, ts long, val double")
    [row] = asof_join(left, right, ["k"], "ts", "ts", ["val"]).collect()
    assert row["val"] == 7.0  # l.ts >= r.ts: equal timestamps DO match


def test_asof_preserves_left_rowcount(spark):
    left = spark.range(100).selectExpr("id % 5 AS k", "id AS ts", "id AS payload")
    right = spark.range(10).selectExpr("id % 5 AS k", "id * 7 AS ts", "id * 1.5 AS val")
    out = asof_join(left, right, ["k"], "ts", "ts", ["val"])
    assert out.count() == 100


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": rng.integers(0, 1000, 200).astype("int64"),
            "qid": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 80),
            "ts": rng.integers(0, 1000, 80).astype("int64"),
            "val": rng.normal(size=80),
        }
    )
    # unique (k, ts) on the right so both engines' tie rules coincide
    right = right.groupby(["k", "ts"], as_index=False)["val"].max()
    expected = pd.merge_asof(
        left.sort_values(["ts", "qid"]),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
    )
    want = {int(r.qid): None if pd.isna(r.val) else round(float(r.val), 9)
            for r in expected.itertuples()}
    got = {
        int(r["qid"]): None if r["val"] is None else round(r["val"], 9)
        for r in asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            ["k"], "ts", "ts", ["val"],
        ).collect()
    }
    assert got == want


def test_asof_null_in_matched_row_stays_null(spark):
    # the matched right row wins atomically: its NULL field must NOT be
    # backfilled from an older right row (pandas merge_asof / DuckDB parity)
    left = spark.createDataFrame([(1, 30, "q")], "k long, ts long, q string")
    right = spark.createDataFrame(
        [(1, 10, 5.0, "old"), (1, 20, None, "new")],
        "k long, ts long, val double, tag string",
    )
    [row] = asof_join(left, right, ["k"], "ts", "ts", ["val", "tag"]).collect()
    assert row["tag"] == "new"
    assert row["val"] is None  # not 5.0 from the ts=10 row


def test_asof_rejects_column_collision(spark):
    import pytest

    left = spark.createDataFrame([(1, 10, 5.0)], "k long, ts long, val double")
    right = spark.createDataFrame([(1, 8, 9.0)], "k long, ts long, val double")
    with pytest.raises(ValueError, match="both sides"):
        asof_join(left, right, ["k"], "ts", "ts", ["val"])


def test_build_scd2_hand_example(spark):
    from federated_gcn_spark.operators.scd import build_scd2

    rows = [
        # key, state, sec, tiebreak
        (1, "a", 10, 1),
        (1, "a", 20, 2),   # same state: same island
        (1, "b", 30, 3),   # change
        (1, "a", 40, 4),   # change back: NEW island (not merged with first)
        (2, "x", 5, 5),
    ]
    df = spark.createDataFrame(rows, "k long, st string, sec long, tb long")
    got = sorted(
        (r["k"], r["state"], r["valid_from"], r["valid_to"])
        for r in build_scd2(df, "k", "st", "sec", "tb").collect()
    )
    assert got == [
        (1, "a", 10, 30),
        (1, "a", 40, None),
        (1, "b", 30, 40),
        (2, "x", 5, None),
    ]


def test_build_scd2_tiebreak_orders_same_second(spark):
    from federated_gcn_spark.operators.scd import build_scd2

    df = spark.createDataFrame(
        [(1, "a", 10, 2), (1, "b", 10, 1)], "k long, st string, sec long, tb long"
    )
    got = sorted(
        (r["state"], r["valid_from"], r["valid_to"])
        for r in build_scd2(df, "k", "st", "sec", "tb").collect()
    )
    # tb=1 ("b") precedes tb=2 ("a")
    assert got == [("a", 10, None), ("b", 10, 10)]
