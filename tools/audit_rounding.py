"""Sub-ulp output-contract audit (round-8 verdict task 3).

A query contract that rounds a double to k decimals promises digits the
type cannot carry once |value| approaches 10^(15-k): at |v| ~ 1e15 one
double ulp is ~0.125, so ``ROUND(v, 2)`` hashes digits BELOW
floating-point resolution and any 1-ulp cross-engine drift flips the
driver's value hash (the round-8 ``chow_break_test`` red row).

Static analysis cannot bound the magnitudes (they are data-dependent),
so this audit is numeric: run every oracle on DuckDB at a given SF
(default sf0.1 — the largest gate SF, 10x the driver's magnitudes) and
flag any ROUNDED column whose rounding grid is within ``1/margin`` ulp
of double resolution at the column's largest magnitude.  The grid is
inferred per column from the values' shortest-roundtrip reprs (a column
printing ``57322.56`` claims a 0.01 grid); columns needing >12
fractional digits are unrounded full-precision emits, whose instrument
is the strict gate's bit-identity check, not this audit.

The default margin 1e-3 flags anything with under a thousand ulp of
slack: cross-engine intermediate drift is typically 1-3 ulp (libm,
decimal→double cast paths), so sub-1e3 slack means a plausible drift is
within reach of a rounding boundary.  Slack in the 1e3..1e6 band is
random-class risk only (expected flips ~ rows/slack per column) —
monitored, not actionable.

Usage: python tools/audit_rounding.py [sf_dir] [margin]
"""

from __future__ import annotations

import math
import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.catalog import TABLES  # noqa: E402
from federated_gcn_spark.plans import ORACLE  # noqa: E402


# Columns the grid inference misreads as rounded contracts: these are
# UNROUNDED full-precision emits (verified against their SQL) whose
# shortest reprs happen to stay under 13 fractional digits because the
# integer part is large.  Their correctness instrument is the strict
# gate's bit-identity comparison (tools/check_oracle.py, repr
# normalization), which they pass at sf0.001/0.01/0.1.  Keep this list
# in sync with SCALE.md "Round 9: audit results".
_UNROUNDED_EMITS = {
    ("bootstrap_revenue_ci", "mean_price"),
    ("bootstrap_revenue_ci", "ci_lo"),
    ("bootstrap_revenue_ci", "ci_hi"),
    ("cuped_adjusted_lift", "lift_raw"),
    ("cuped_adjusted_lift", "lift_cuped"),
}


def frac_digits(v: float) -> int:
    """Fractional decimal digits in the value's shortest repr."""
    r = repr(float(v))
    if "e" in r or "E" in r or "." not in r:
        return 0
    return len(r.split(".")[1])


# ``ROUND(expr, k) AS alias`` (one paren-nesting level inside expr, an
# optional ``::TYPE`` cast between) — used to cross-check the grid k
# inferred from observed values against the DECLARED contract precision.
_ROUND_AS = re.compile(
    r"ROUND\s*\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*?,\s*(\d+)\s*\)"
    r"\s*(?:::\w+)?\s+AS\s+\"?(\w+)\"?",
    re.IGNORECASE | re.DOTALL,
)


def declared_round_digits(sql: str) -> dict:
    """Max declared ROUND precision per output alias found in the SQL.

    The value-inferred grid underestimates k when every sampled row's
    last contract digit happens to be 0 (each missing digit overstates
    slack 10x and can hide a hazard at small SFs).  Taking
    max(inferred, declared) closes that hole for the common
    ``ROUND(.., k) AS col`` spelling; aliases the regex cannot see
    simply keep the inferred grid.
    """
    out: dict[str, int] = {}
    for k, alias in _ROUND_AS.findall(sql):
        a = alias.lower()
        out[a] = max(out.get(a, 0), int(k))
    return out


def audit(sf_dir: str, margin: float = 1e-3):
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
        # Per COLUMN: infer the contract's rounding grid as the max
        # fractional-digit count over all rows.  A column where any row
        # needs >12 fractional digits is an UNROUNDED full-precision
        # emit — those hash bit-identity directly and the strict gate
        # (tools/check_oracle.py, repr normalization) is the instrument
        # for them, not this audit.  Only rounded contracts can promise
        # digits the double cannot carry.
        kmax: dict[str, int] = {}
        vmax: dict[str, float] = {}
        for row in rows:
            for c, v in zip(cols, row):
                if isinstance(v, float) and math.isfinite(v) and v != 0:
                    kmax[c] = max(kmax.get(c, 0), frac_digits(v))
                    vmax[c] = max(vmax.get(c, 0.0), abs(v))
        declared = declared_round_digits(sql)
        for c, k in kmax.items():
            if k > 12 or (name, c) in _UNROUNDED_EMITS:
                continue  # unrounded full-precision column
            k = max(k, declared.get(c.lower(), 0))
            slack = 10.0 ** -k / math.ulp(vmax[c])
            if slack < 1.0 / margin:
                findings.append(
                    (name, c,
                     f"ROUND(.., {k}) at |v|<={vmax[c]:.3g}: grid/ulp "
                     f"slack {slack:.3g} (< {1/margin:.0e})")
                )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    margin = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-3
    findings = audit(sf_dir, margin)
    for name, col, why in findings:
        print(f"HAZARD {name}.{col}: {why}")
    print(f"{len(findings)} hazards over {len(ORACLE)} oracles at {sf_dir}")
    return 1 if findings else 0


if __name__ == "__main__":
    raise SystemExit(main())
