"""Local replica of the driver's t2 correctness gate.

Runs every declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, (normalized) schema, and an
order-insensitive value snapshot. Run while iterating:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.catalog import TABLES  # noqa: E402
from federated_gcn_spark.plans import ORACLE, QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def normalize(rows, columns):
    """Sort columns by name, stringify cells.

    Floats are stringified with ``repr`` — the full shortest-roundtrip
    representation (up to 17 significant digits), NOT a truncated
    ``%.9g``.  The driver's official gate hashes full-precision values;
    round 8 proved that a 9-significant-digit local normalization is
    blind to sub-ulp contract bugs (``chow_break_test`` was 373/373
    green locally and red officially).  The local gate must be exactly
    as strict as the driver's hash: two doubles that differ in ANY bit
    (other than NaN) must normalize differently.
    """
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(repr(v))
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [columns[i] for i in idx], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("oracle-check")
    con = duck_connection(sf_dir)
    failures = []
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            if name not in ORACLE:
                print(f"  ~ {name}: rows-only ({len(srows)} rows)")
                if len(srows) == 0:
                    failures.append((name, "0 rows (rows-only check)"))
                continue
            res = con.execute(ORACLE[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            problems = []
            if len(srows) != len(drows):
                problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
            if sorted(c.lower() for c in scols) != sorted(c.lower() for c in dcols):
                problems.append(f"schema spark={sorted(scols)} duck={sorted(dcols)}")
            if not problems:
                # lower-case the names fed to normalize so both engines
                # sort columns identically even under casing-only drift
                _, s_norm = normalize(
                    [tuple(r) for r in srows], [c.lower() for c in scols]
                )
                _, d_norm = normalize(drows, [c.lower() for c in dcols])
                if s_norm != d_norm:
                    diff = [
                        (a, b) for a, b in zip(s_norm, d_norm) if a != b
                    ][:3]
                    problems.append(f"values differ; first diffs={diff}")
            if problems:
                failures.append((name, "; ".join(problems)))
                print(f"  ✗ {name}: {'; '.join(problems)}")
            else:
                print(f"  ✓ {name} ({len(srows)} rows)")
        except Exception as exc:  # noqa: BLE001
            failures.append((name, repr(exc)))
            print(f"  ✗ {name}: EXCEPTION {exc}")
    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
