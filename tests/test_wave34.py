"""Round-4 wave-34 queries vs pure-python references: UNPIVOT, nested
reassembly, median polish, KMV set algebra."""

from collections import defaultdict

import duckdb
import pytest

from federated_gcn_spark.plans import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def test_unpivot_is_exact_long_form(spark):
    rows = QUERIES["unpivot_metrics"](spark, SF_DIR).collect()
    by_nation = defaultdict(dict)
    for r in rows:
        by_nation[r["n_name"]][r["metric"]] = r["value"]
    con = duckdb.connect()
    truth = con.execute(
        f"""SELECT n.n_name, COUNT(*), ROUND(SUM(o.o_totalprice), 2),
                   COUNT(DISTINCT o.o_custkey)
            FROM read_parquet('{SF_DIR}/orders.parquet') o
            JOIN read_parquet('{SF_DIR}/customer.parquet') c
              ON c.c_custkey = o.o_custkey
            JOIN read_parquet('{SF_DIR}/nation.parquet') n
              ON n.n_nationkey = c.c_nationkey
            GROUP BY 1"""
    ).fetchall()
    con.close()
    assert len(rows) == len(truth) * 4
    for name, n_orders, revenue, n_cust in truth:
        m = by_nation[name]
        assert set(m) == {"n_orders", "revenue", "avg_price", "n_customers"}
        assert m["n_orders"] == n_orders
        assert m["revenue"] == pytest.approx(revenue, abs=0.011)
        assert m["n_customers"] == n_cust


def test_order_lines_nested_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT),
                   l_partkey, l_extendedprice
            FROM read_parquet('{SF_DIR}/lineitem.parquet')"""
    ).fetchall()
    con.close()
    per = defaultdict(list)
    val = defaultdict(float)
    for ok, ln, qty, pk, price in rows:
        per[ok].append((ln, qty, pk))
        val[ok] += price
    got = {
        r["orderkey"]: r
        for r in QUERIES["order_lines_nested"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per)
    for ok, lines in per.items():
        lines.sort()
        r = got[ok]
        assert r["n_lines"] == len(lines)
        assert r["qty_csv"] == ",".join(str(q) for _, q, _ in lines)
        assert r["parts_csv"] == ",".join(str(p) for _, _, p in lines)
        assert r["order_value"] == pytest.approx(val[ok], abs=0.011)


def test_median_polish_matches_python(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) % 7,
                   CAST(strftime(o_orderdate, '%m') AS BIGINT),
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT)
            FROM read_parquet('{SF_DIR}/orders.parquet') GROUP BY 1, 2"""
    ).fetchall()
    con.close()
    cells = {(d, m): v for d, m, v in rows}
    re = defaultdict(int)
    ce = defaultdict(int)

    def lower_median(vals):
        vals = sorted(vals)
        return vals[(len(vals) + 1) // 2 - 1]

    for _ in range(2):
        for d in sorted({d for d, _ in cells}):
            med = lower_median([v for (dd, _), v in cells.items() if dd == d])
            re[d] += med
            for k in list(cells):
                if k[0] == d:
                    cells[k] -= med
        for m in sorted({m for _, m in cells}):
            med = lower_median([v for (_, mm), v in cells.items() if mm == m])
            ce[m] += med
            for k in list(cells):
                if k[1] == m:
                    cells[k] -= med
    resid = max(abs(v) for v in cells.values())
    got = {
        (r["kind"], r["key"]): r["effect_cents"]
        for r in QUERIES["median_polish_weekday_month"](spark, SF_DIR).collect()
    }
    for d, e in re.items():
        assert got[("row_dow", d)] == e
    for m, e in ce.items():
        assert got[("col_month", m)] == e
    assert got[("residual_max_abs", -1)] == resid


def test_kmv_set_algebra_matches_python(spark):
    import pyspark.sql.functions as SF

    # reuse Spark's own xxhash64 to build the reference hash sets
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")

    def hashes(et):
        return sorted(
            r["h"]
            for r in events.where(SF.col("event_type") == et)
            .select(SF.xxhash64("user_id").alias("h"))
            .distinct()
            .collect()
        )

    ha, hb = hashes("purchase"), hashes("click")
    k = 64
    ka, kb = set(ha[:k]), set(hb[:k])
    ku = sorted(ka | kb)[:k]
    shared = sum(1 for h in ku if h in ka and h in kb)
    k_actual = len(ku)
    if k_actual < k:
        est_union = float(k_actual)
    else:
        est_union = (k - 1) * 2.0**64 / (max(ku) + 2.0**63)
    r = QUERIES["kmv_set_algebra"](spark, SF_DIR).collect()[0]
    assert r["k_actual"] == k_actual
    assert r["shared"] == shared
    assert r["est_union"] == pytest.approx(est_union, abs=0.011)
    assert r["est_intersection"] == pytest.approx(
        shared / k_actual * est_union, abs=0.02
    )
    assert r["true_union"] == len(set(ha) | set(hb))
    assert r["true_intersection"] == len(set(ha) & set(hb))
    # the estimates must be in the right ballpark of the truth
    assert r["est_union"] == pytest.approx(r["true_union"], rel=0.5)
