"""Physical-plan hygiene audit over the declared query catalog.

For every query in ``plans.QUERIES`` (or a named subset) this builds the
DataFrame at the given sf dir and inspects the *executed* plan string:

- ``BatchEvalPython`` — row-at-a-time Python UDF in the plan: forbidden
  (the engine's hot paths must stay JVM-side; Arrow-batched
  ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapCoGroupsInPandas``
  are the sanctioned Python escape hatches).
- Exchange count — shuffles the plan pays (AQE may remove some at run
  time; the static count is the upper bound).
- Join strategies — BroadcastHashJoin vs SortMergeJoin/ShuffledHashJoin.
- Scan column pruning — ReadSchema column counts per parquet scan.

Run:  python tools/plan_audit.py [sf_dir] [query ...]
Exit 1 if any audited plan contains BatchEvalPython.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.plans import QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402


def audit_plan(plan: str) -> dict:
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    return {
        "python_udf_rowwise": plan.count("BatchEvalPython"),
        "python_arrow": (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapCoGroupsInPandas")
            + plan.count("FlatMapGroupsInPandas")  # applyInPandas (grouped map)
        ),
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "scan_cols": [len(s.split(",")) if s else 0 for s in scans],
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    print(f"{'query':32s} {'rowUDF':>6s} {'arrow':>5s} {'xchg':>4s} {'bcast':>5s} {'smj':>4s}  scan cols")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERROR {exc!r}")
            bad.append((name, "build failed"))
            continue
        a = audit_plan(plan)
        print(
            f"{name:32s} {a['python_udf_rowwise']:6d} {a['python_arrow']:5d} "
            f"{a['exchanges']:4d} {a['broadcast_joins']:5d} {a['sortmerge_joins']:4d}  "
            f"{a['scan_cols']}"
        )
        if a["python_udf_rowwise"]:
            bad.append((name, f"{a['python_udf_rowwise']} BatchEvalPython node(s)"))
    spark.stop()
    if bad:
        print("\nFAILED hygiene:")
        for name, why in bad:
            print(f"  {name}: {why}")
        return 1
    print(f"\n{len(names)} plans audited: no row-at-a-time Python UDFs.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
