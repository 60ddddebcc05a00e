"""Distributed skyline (Pareto-optimal set) computation.

A row dominates another if it is no worse on every criterion and
strictly better on at least one.  The skyline (rows dominated by
nobody) drives multi-objective selection: best price-vs-latency
suppliers, quality-vs-length document frontiers, cost-vs-recall
configurations.

Scale shape — the two-phase dominance filter: dominance is transitive,
so any row dominated within its own partition is dominated globally;
phase 1 computes a LOCAL skyline per partition (Arrow-batched numpy
dominance scan — no shuffle), shrinking the candidate set from |rows|
to roughly the union of per-partition frontiers; phase 2 takes the
global skyline of the (now small) candidate union with a broadcast
anti-join of candidates against themselves.  The expensive quadratic
scan only ever runs on partition-local data and on the reduced
candidate set, never on the full cross product.  Worst case (every row
on the frontier) degrades to the candidates being the data — the same
worst case every skyline algorithm has.

Two measured lessons are baked in (sf0.1→sf1 curve, SCALE.md):

- ship ONLY (key, criteria) through Arrow, never the full row — the
  first version moved every column (strings included) through
  pandas both ways and spent 24x the time on marshalling at 10x the
  data; survivors rejoin their payload with a semi join on the key;
- presort each partition by the first criterion (descending in the
  maximized orientation) before the dominance scan: frontier-heavy
  rows are visited first, so the ``keep &=`` prune eliminates the
  dominated mass in the first few iterations instead of re-scanning
  it row by row.

Criteria are (column, direction) pairs, direction in {"max", "min"}.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline(cols: list[str], signs: np.ndarray):
    def run(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        X = pdf[cols].to_numpy(dtype="float64") * signs  # maximize all
        # Presort: descending first criterion, then the rest — rows that
        # dominate many others are visited first and prune them en masse.
        order = np.lexsort(tuple(-X[:, j] for j in range(X.shape[1] - 1, -1, -1)))
        X = X[order]
        keep = np.ones(len(X), dtype=bool)
        for i in range(len(X)):
            if not keep[i]:
                continue
            ge = (X >= X[i]).all(axis=1)
            gt = (X > X[i]).any(axis=1)
            if (ge & gt).any():
                keep[i] = False
            else:
                # i survives; anything i dominates can be dropped now
                le = (X <= X[i]).all(axis=1)
                lt = (X < X[i]).any(axis=1)
                keep &= ~(le & lt)
                keep[i] = True
        yield pdf.iloc[order[keep]]

    return run


def skyline(
    df: DataFrame,
    criteria: list[tuple[str, str]],
    key_col: str | None = None,
) -> DataFrame:
    """Rows of ``df`` not Pareto-dominated under ``criteria``.

    With ``key_col`` (a unique row key) only (key, criteria) columns
    cross the Python boundary and survivors are semi-joined back —
    always pass it when ``df`` carries payload columns.  Without it the
    full row is shipped through Arrow (fine for narrow inputs).
    """
    cols = [c for c, _ in criteria]
    signs = np.array([1.0 if d == "max" else -1.0 for _, d in criteria])
    for _, d in criteria:
        if d not in ("max", "min"):
            raise ValueError(f"direction must be max|min, got {d!r}")

    narrow = df.select(key_col, *cols) if key_col else df
    cands = narrow.mapInPandas(
        _local_skyline(cols, signs), schema=narrow.schema
    )
    cands = cands.localCheckpoint(eager=True)  # small: union of frontiers

    # phase 2: global skyline of the candidates — anti-join against the
    # broadcast candidate set on the dominance predicate
    right = F.broadcast(
        cands.select(*[F.col(c).alias(f"__r_{c}") for c in cols])
    )
    no_worse = None
    strictly_better = None
    for (c, d) in criteria:
        a, b = F.col(c), F.col(f"__r_{c}")
        nw = (b >= a) if d == "max" else (b <= a)
        sb = (b > a) if d == "max" else (b < a)
        no_worse = nw if no_worse is None else (no_worse & nw)
        strictly_better = sb if strictly_better is None else (strictly_better | sb)
    winners = cands.join(right, no_worse & strictly_better, "left_anti")
    if key_col is None:
        return winners
    return df.join(
        F.broadcast(winners.select(key_col)), key_col, "left_semi"
    )
