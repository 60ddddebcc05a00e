"""Compare two bench.py JSON outputs per query.

    python tools/bench_diff.py BENCH_r01.json bench_now.json [--tol 0.20]

Accepts either the raw one-line bench.py output or the driver's
BENCH_r{N}.json wrapper (with a "parsed" field). Exits 1 if any shared
query regressed more than --tol (default 20%) — the VERDICT r01 rule
that no query may regress >20% without a named reason.
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as f:
        data = json.load(f)
    if data.get("parsed"):
        data = data["parsed"]
    if "queries" not in data and "tail" in data:
        # driver wrapper: bench.py's JSON line is embedded (and possibly
        # truncated) inside the captured stdout tail — recover the last
        # complete {"metric"...} line if one survived
        tail = data["tail"]
        start = tail.rfind('{"metric"')
        if start >= 0:
            data = json.loads(tail[start:].splitlines()[0])
        else:
            # head of the JSON line was truncated away: salvage whatever
            # "name": seconds pairs survive (partial but still diffable)
            import re

            pairs = re.findall(r'\\?"([a-z0-9_]+)\\?": ([0-9.]+)[,}]', tail)
            qs = {
                k: float(v)
                for k, v in pairs
                if k not in ("value", "sf", "n", "rc", "cpus")
            }
            if not qs:
                raise SystemExit(
                    f"{path}: wrapper tail holds no bench payload; use "
                    "the committed BENCH_FULL_r{N}.json sidecar instead"
                )
            print(f"note: {path} tail truncated; {len(qs)} queries salvaged")
            data = {"queries": qs}
    return data


def steal_guard(path: str, data: dict, cap: float) -> list[str]:
    """Names of bracketing probes in ``data`` whose CPU steal exceeds
    ``cap`` percent — a run measured under hypervisor contention is not
    certifiable for absolute round-over-round comparison (SCALE.md
    round-8 rule)."""
    bad = []
    for key in ("machine", "machine_end"):
        probe = data.get(key) or {}
        steal = probe.get("steal_pct_under_load")
        if steal is not None and steal > cap:
            bad.append(f"{path}: {key} steal {steal}% > {cap}%")
    return bad


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("old", help="baseline bench JSON")
    p.add_argument("new", help="candidate bench JSON")
    p.add_argument("--tol", type=float, default=0.20, help="regression gate")
    p.add_argument(
        "--max-steal",
        type=float,
        default=5.0,
        help="refuse the comparison when either side's bracketing "
        "machine probe saw more CPU steal than this (percent); "
        "uncertifiable totals must not enter the record",
    )
    p.add_argument(
        "--force",
        action="store_true",
        help="compare anyway despite a steal-guard violation "
        "(prints the violation first)",
    )
    ns = p.parse_args()
    old, new = load(ns.old), load(ns.new)
    tol = ns.tol
    violations = steal_guard(ns.old, old, ns.max_steal) + steal_guard(
        ns.new, new, ns.max_steal
    )
    if violations:
        for v in violations:
            print(f"STEAL GUARD: {v}")
        if not ns.force:
            print(
                "refusing the comparison (absolute seconds under >5% "
                "steal are noise; re-run in a quiet window, compare "
                "same-run ratios, or pass --force to override)"
            )
            return 2
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    regressions = []
    print(f"{'query':32s} {'old':>8s} {'new':>8s} {'delta':>8s}")
    for name in shared:
        d = (nq[name] - oq[name]) / oq[name]
        flag = " <-- REGRESSION" if d > tol else ""
        if d > tol:
            regressions.append((name, oq[name], nq[name], d))
        print(f"{name:32s} {oq[name]:8.3f} {nq[name]:8.3f} {d:+7.1%}{flag}")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"\nnew queries: {', '.join(only_new)}")
    so, sn = sum(oq[n] for n in shared), sum(nq[n] for n in shared)
    print(f"\nshared-query total: {so:.3f}s -> {sn:.3f}s ({(sn - so) / so:+.1%})")
    if regressions:
        print(f"\n{len(regressions)} regression(s) beyond {tol:.0%}:")
        for name, a, b, d in regressions:
            print(f"  {name}: {a:.3f}s -> {b:.3f}s ({d:+.1%})")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
