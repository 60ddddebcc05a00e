"""Driver-faithful pre-flight over the 50-slot correctness window.

The official gate drives ``__spark_entry__.queries()`` on a VANILLA
``SparkSession`` (no ``session.get_spark`` tuning) and hashes
full-precision output values at sf0.01.  ``tools/check_oracle.py``
covers the value comparison but runs on the tuned session; this tool
replicates the driver's exact conditions for the names that will
actually be recorded — the first 50 entries of ``queries()`` — so a
session-config-dependent value or schema drift is caught BEFORE it
burns an official slot (each of the 373 registry names gets exactly one
first chance at a green row).

Run:  python tools/check_window_vanilla.py [sf_dir] [n_slots]
Exit 1 on any mismatch.  Round 9 baseline: 50/50 at sf0.01.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: __spark_entry__
sys.path.insert(0, _HERE)  # tools: check_oracle

from check_oracle import duck_connection, normalize  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_slots = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from pyspark.sql import SparkSession

    import __spark_entry__ as mod

    # vanilla, like the driver: no ANSI/partition/nanos tuning beyond
    # what the entry module itself applies to the session it is handed.
    # A pre-existing (possibly tuned) session would be silently reused by
    # getOrCreate() and defeat the whole premise — refuse to run.
    if SparkSession.getActiveSession() is not None:
        print(
            "ERROR: an active SparkSession already exists in this process; "
            "run this tool in a fresh interpreter so the session is vanilla."
        )
        return 2
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = list(queries)[:n_slots]
    con = duck_connection(sf_dir)
    bad = []
    for name in names:
        try:
            sdf = queries[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            if name not in oracles:
                status = "rows-only" if srows else "ROWS-ONLY EMPTY"
                if not srows:
                    bad.append(name)
                print(f"  ~ {name}: {status} ({len(srows)} rows)")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            # lower-case the names fed to normalize so both engines sort
            # columns identically even if they disagree only in casing
            ok = (
                len(srows) == len(drows)
                and sorted(c.lower() for c in scols)
                == sorted(c.lower() for c in dcols)
                and normalize(srows, [c.lower() for c in scols])[1]
                == normalize(drows, [c.lower() for c in dcols])[1]
            )
            print(("  ✓ " if ok else "  ✗ ") + f"{name} ({len(srows)} rows)")
            if not ok:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"  ✗ {name}: EXCEPTION {exc!r}")
            bad.append(name)
    print(f"\n{len(names) - len(bad)}/{len(names)} vanilla-session slots match")
    for name in bad:
        print(f"FAIL {name}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
