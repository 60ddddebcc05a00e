"""Unpartitioned-window audit (round-11 VERDICT task 5).

The sf0.1 oracle run logs ~737 "No Partition Defined for Window"
warnings.  A window with no PARTITION BY collapses its whole input into
ONE task — fine over a bounded frame (a daily/calendar aggregate, a
fixed histogram), a 100 TB killer over a fact-scaled frame.  This tool
enumerates, for every registered query (or a named subset), each
Window operator in the OPTIMIZED logical plan whose partition spec is
empty, and classifies its input:

  bounded   — an Aggregate/GlobalLimit sits strictly below the window
              (the window input is group-count- or limit-sized, not
              fact-sized)
  staged    — the window input crosses a localCheckpoint cut
              (LogicalRDD): the bounding aggregate, if any, is hidden
              behind the cut — verify the staged frame is an aggregate
              output, not a fact-scaled payload
  UNBOUNDED — neither: the global window sees raw rows and would
              single-task a full-scale table

Output: one line per (query, window) hit plus a summary; exits 1 if
any UNBOUNDED hit exists outside the allowlist below (same contract as
the plan-budget tests, so new ones cannot land silently).

Run:  python tools/window_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from federated_gcn_spark.plans import QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402

# Queries allowed to keep an unpartitioned window over a non-aggregated
# input, each with a reviewed reason (the audit still prints them).
ALLOWLIST: dict[str, str] = {}

# Node classes that bound the row count of everything above them.
_BOUNDING = ("Aggregate", "GlobalLimit")


def _children(node):
    n = node.children().size()
    return [node.children().apply(i) for i in range(n)]


def _classify_subtree(node) -> str:
    """'bounded' | 'staged' | 'unbounded' for the subtree under a
    global window: the FIRST bounding aggregate/limit wins; a
    LogicalRDD (checkpoint cut) means the truth is hidden behind the
    cut; otherwise raw rows flow in."""
    name = node.getClass().getSimpleName()
    if any(name.startswith(b) for b in _BOUNDING):
        return "bounded"
    if name.startswith("LogicalRDD"):
        return "staged"
    verdicts = [_classify_subtree(c) for c in _children(node)]
    if not verdicts:
        return "unbounded"
    # a window input is bounded only if EVERY leaf-ward path is
    if all(v == "bounded" for v in verdicts):
        return "bounded"
    if any(v == "unbounded" for v in verdicts):
        return "unbounded"
    return "staged"


def global_windows(jplan) -> list[tuple[str, str]]:
    """(window description, verdict) for every Window node with an
    empty partitionSpec in the plan tree."""
    hits: list[tuple[str, str]] = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            verdicts = [_classify_subtree(c) for c in _children(node)]
            if all(v == "bounded" for v in verdicts):
                verdict = "bounded"
            elif any(v == "unbounded" for v in verdicts):
                verdict = "unbounded"
            else:
                verdict = "staged"
            hits.append((node.simpleString(60), verdict))
        for c in _children(node):
            walk(c)

    walk(jplan)
    return hits


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("window-audit")
    spark.sparkContext.setLogLevel("ERROR")
    n_global = n_staged = n_unbounded = 0
    offenders = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 - audit must cover the rest
            print(f"{name}: SKIP ({type(exc).__name__}: {exc})")
            continue
        plan = df._jdf.queryExecution().optimizedPlan()
        for desc, verdict in global_windows(plan):
            n_global += 1
            if verdict == "staged":
                n_staged += 1
                print(f"{name}: staged     {desc[:100]}")
            elif verdict == "unbounded":
                n_unbounded += 1
                if name not in ALLOWLIST:
                    offenders.append(name)
                print(f"{name}: UNBOUNDED  {desc[:100]}")
    print(
        f"\n{n_global} unpartitioned windows across {len(names)} queries: "
        f"{n_global - n_staged - n_unbounded} bounded, {n_staged} staged "
        f"(behind a checkpoint cut), {n_unbounded} unbounded "
        f"({len(offenders)} outside the allowlist)"
    )
    spark.stop()
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
