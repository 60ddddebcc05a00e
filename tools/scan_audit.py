"""Repeated-scan audit: find queries whose final plan re-reads a base
table more than once (guide §1.2/§5 — a multiply-consumed subtree that
was never staged re-executes its whole upstream per consumer).

For every query (or a named subset) the optimized plan's parquet scan
locations are counted; queries scanning the same file location N>=2
times are printed sorted by the worst repeat count.  A repeat is not
automatically a defect (self-joins legitimately scan twice) — it is the
shortlist for the staging treatment applied in round 10.

Run:  python tools/scan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.plans import QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402


def scan_locations(plan: str) -> Counter:
    locs = re.findall(r"Location: \S+ \[([^\]]*)\]", plan)
    return Counter(os.path.basename(l.rstrip("/")) for l in locs)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:40s} ERROR {type(exc).__name__}: {exc}")
            continue
        locs = scan_locations(plan)
        repeats = {t: n for t, n in locs.items() if n >= 2}
        if repeats:
            rows.append((max(repeats.values()), name, repeats, sum(locs.values())))
    rows.sort(reverse=True)
    print(f"{len(rows)} queries with a repeated base-table scan:")
    for worst, name, repeats, total in rows:
        detail = ", ".join(f"{t}x{n}" for t, n in sorted(repeats.items()))
        print(f"{name:40s} worst x{worst}  total_scans={total:3d}  {detail}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
