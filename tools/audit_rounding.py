"""Sub-ulp output-contract audit (round-8 verdict task 3).

A query contract that rounds a double to k decimals promises digits the
type cannot carry once |value| approaches 10^(15-k): at |v| ~ 1e15 one
double ulp is ~0.125, so ``ROUND(v, 2)`` hashes digits BELOW
floating-point resolution and any 1-ulp cross-engine drift flips the
driver's value hash (the round-8 ``chow_break_test`` red row).

Static analysis cannot bound the magnitudes (they are data-dependent),
so this audit is numeric: run every oracle on DuckDB at a given SF
(default sf0.1 — the largest gate SF, 10x the driver's magnitudes) and
flag any FLOAT cell whose own ulp is within ``margin`` of its displayed
decimal grid.  The grid is inferred from the value's shortest-roundtrip
repr (a value printed as ``57322.56`` claims a 0.01 grid); margin=1e-6
flags anything with less than a million ulp of slack — queries the next
engine/libm version could flip.

Usage: python tools/audit_rounding.py [sf_dir] [margin]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.catalog import TABLES  # noqa: E402
from federated_gcn_spark.plans import ORACLE  # noqa: E402


def grid_of(v: float) -> float:
    """Decimal grid the value's repr claims: 10^-(fractional digits)."""
    r = repr(float(v))
    if "e" in r or "E" in r or "." not in r:
        return 1.0  # scientific / integral repr claims no fixed grid
    return 10.0 ** -len(r.split(".")[1])


def audit(sf_dir: str, margin: float = 1e-6):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    findings = []
    for name, sql in sorted(ORACLE.items()):
        try:
            res = con.execute(sql)
            cols = [d[0] for d in res.description]
            rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            findings.append((name, "*", f"oracle error: {exc!r}"))
            continue
        worst: dict[str, float] = {}
        for row in rows:
            for c, v in zip(cols, row):
                if isinstance(v, float) and math.isfinite(v) and v != 0:
                    slack = grid_of(v) / max(math.ulp(v), 5e-324)
                    if slack < worst.get(c, math.inf):
                        worst[c] = slack
        for c, slack in worst.items():
            if slack < 1.0 / margin:
                findings.append(
                    (name, c, f"grid/ulp slack {slack:.3g} (< {1/margin:.0e})")
                )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    margin = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-6
    findings = audit(sf_dir, margin)
    for name, col, why in findings:
        print(f"HAZARD {name}.{col}: {why}")
    print(f"{len(findings)} hazards over {len(ORACLE)} oracles at {sf_dir}")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
