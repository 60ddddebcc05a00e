"""Distributed skyline (Pareto-optimal set) computation.

A row dominates another if it is no worse on every criterion and
strictly better on at least one.  The skyline (rows dominated by
nobody) drives multi-objective selection: best price-vs-latency
suppliers, quality-vs-length document frontiers, cost-vs-recall
configurations.

Scale shape — the two-phase dominance filter: dominance is transitive,
so any row dominated within its own partition is dominated globally;
phase 1 computes a LOCAL skyline per partition (Arrow-batched numpy
dominance scan over each partition's rows — no shuffle), shrinking the
candidate set from |rows| to roughly the union of per-partition
frontiers; phase 2 takes the global skyline of the (now small)
candidate union with a broadcast anti-join of candidates against
themselves.  The expensive quadratic scan only ever runs on partition-
local data and on the reduced candidate set, never on the full cross
product.  Worst case (every row on the frontier) degrades to the
candidates being the data — the same worst case every skyline
algorithm has.

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
        keep = np.ones(len(X), dtype=bool)
        for i in range(len(X)):
            if not keep[i]:
                continue
            ge = (X >= X[i]).all(axis=1)
            gt = (X > X[i]).any(axis=1)
            dominators = ge & gt
            if dominators.any():
                keep[i] = False
            else:
                # i survives; anything i dominates can be dropped now
                le = (X <= X[i]).all(axis=1)
                lt = (X < X[i]).any(axis=1)
                keep &= ~(le & lt)
                keep[i] = True
        yield pdf[keep]

    return run


def skyline(df: DataFrame, criteria: list[tuple[str, str]]) -> DataFrame:
    """Rows of ``df`` not Pareto-dominated under ``criteria``."""
    cols = [c for c, _ in criteria]
    signs = np.array([1.0 if d == "max" else -1.0 for _, d in criteria])
    for _, d in criteria:
        if d not in ("max", "min"):
            raise ValueError(f"direction must be max|min, got {d!r}")

    schema = df.schema
    cands = df.mapInPandas(_local_skyline(cols, signs), schema=schema)
    cands = cands.localCheckpoint(eager=True)  # small: union of frontiers

    # phase 2: global skyline of the candidates — anti-join against the
    # broadcast candidate set on the dominance predicate
    left = cands
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
    return left.join(right, no_worse & strictly_better, "left_anti")
