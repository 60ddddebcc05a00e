"""Round-4 wave-27: storage-audit queries vs python references, plus
the ORC source/sink roundtrip."""

from collections import Counter

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_table_fingerprint_is_order_invariant_and_complete(spark):
    rows = QUERIES["table_fingerprint"](spark, SF_DIR).collect()
    con = duckdb.connect()
    per_status = dict(
        con.execute(
            f"""SELECT o_orderstatus, COUNT(*)
                FROM read_parquet('{SF_DIR}/orders.parquet')
                GROUP BY 1"""
        ).fetchall()
    )
    con.close()
    assert {r["status"]: r["n_rows"] for r in rows} == per_status
    # XOR fingerprint must be invariant to physical layout: recompute
    # from a differently-partitioned reread of the same data
    from federated_gcn_spark.catalog import load_table
    from federated_gcn_spark.plans.queries_wave27 import _orders_row_hash_col
    import pyspark.sql.functions as F

    orders = load_table(spark, SF_DIR, "orders").repartition(7, "o_custkey")
    again = {
        r["status"]: r["x"]
        for r in orders.select(
            F.col("o_orderstatus").alias("status"),
            _orders_row_hash_col().alias("rh"),
        )
        .groupBy("status")
        .agg(F.bit_xor("rh").alias("x"))
        .collect()
    }
    assert {r["status"]: r["xor_fingerprint"] for r in rows} == again


def test_snapshot_diff_categories_are_consistent(spark):
    got = {
        r["category"]: r["n_rows"]
        for r in QUERIES["snapshot_diff_stats"](spark, SF_DIR).collect()
    }
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()[0]
    con.close()
    # every v1 row lands in exactly one of deleted/changed/unchanged
    assert got["deleted"] + got["changed"] + got["unchanged"] == n
    # inserts clone bucket 3; deletes take bucket 0 — both ~1% of keys
    assert 0 < got["added"] < n * 0.05
    assert 0 < got["deleted"] < n * 0.05
    assert 0 < got["changed"] < n * 0.06


def test_zone_map_report_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT o_orderkey // 4096,
                   date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
            FROM read_parquet('{SF_DIR}/orders.parquet')"""
    ).fetchall()
    con.close()
    d0, d1 = 9131, 9496
    zones = {}
    for f, d in rows:
        mn, mx = zones.get(f, (10**9, -(10**9)))
        zones[f] = (min(mn, d), max(mx, d))
    n_files = len(zones)
    n_skipped = sum(1 for mn, mx in zones.values() if mx < d0 or mn >= d1)
    n = len(rows)
    matching = sum(1 for _, d in rows if d0 <= d < d1)
    before = sum(1 for _, d in rows if d < d0)
    files_sorted = (n + 4095) // 4096
    needed = (
        0
        if matching == 0
        else (before + matching - 1) // 4096 - before // 4096 + 1
    )
    r = QUERIES["zone_map_skipping_report"](spark, SF_DIR).collect()[0]
    assert r["n_files"] == n_files
    assert r["n_skipped"] == n_skipped
    assert r["n_files_sorted"] == files_sorted
    assert r["n_skipped_sorted"] == files_sorted - needed
    # sorting can never lose to the keyed layout (strictly wins once
    # the table spans >1 file — at sf0.001 both are a single file)
    assert r["skip_frac_sorted"] >= r["skip_frac_keyed"]
    if files_sorted > 1 and 0 < matching < n:
        assert r["skip_frac_sorted"] > 0


def test_shard_balance_hash_beats_range_or_close(spark):
    r = QUERIES["shard_assignment_balance"](spark, SF_DIR).collect()[0]
    assert r["hash_shards"] == 32
    # doc_ids are dense, so range sharding is near-perfect too; both
    # schemes must land near 1.0 max/mean on uniform keys
    assert 1.0 <= r["hash_max_over_mean"] < 2.5  # ~16 docs/shard at sf0.001
    assert 1.0 <= r["range_max_over_mean"] < 2.5
    assert r["hash_chi2"] >= 0 and r["range_chi2"] >= 0


def test_orc_roundtrip(spark, tmp_path):
    from federated_gcn_spark.catalog import load_table
    from federated_gcn_spark.sources.orc import read_orc, write_orc

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path, schema=docs.schema)
    assert back.schema == docs.schema
    assert back.count() == docs.count()
    a = {r["doc_id"]: r["n_chars"] for r in docs.select("doc_id", "n_chars").collect()}
    b = {r["doc_id"]: r["n_chars"] for r in back.select("doc_id", "n_chars").collect()}
    assert a == b


def test_orc_predicate_pushdown_plan(spark, tmp_path):
    """Filter must reach the ORC scan as a pushed filter."""
    from federated_gcn_spark.catalog import load_table
    from federated_gcn_spark.sources.orc import read_orc, write_orc
    import pyspark.sql.functions as F

    docs = load_table(spark, SF_DIR, "documents")
    path = str(tmp_path / "docs_orc_pd")
    write_orc(docs, path)
    q = read_orc(spark, path).where(F.col("doc_id") == 42).select("doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split(
        "PushedFilters"
    )[1][:80]
