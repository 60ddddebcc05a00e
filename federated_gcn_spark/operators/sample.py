"""Deterministic row sampling: uniform hash-fraction and stratified.

Training-data curation needs *reproducible* subsamples — Spark's
``DataFrame.sample`` draws from per-partition RNG streams, so its output
changes with partitioning/task layout, which breaks both cross-run
reproducibility and the DuckDB oracle. These operators instead derive the
keep/drop decision from a pure function of a key column:

    u(key) = ((key + seed) mod M · A + C mod M) / M,   M = 2³¹

a textbook LCG step — portable integer arithmetic (no overflow under
ANSI mode for any bigint key, expressible identically in any SQL
dialect), uniform enough for fraction selection, and partition-layout
independent by construction. For adversarial keys use xxhash64 upstream;
for oracle-checkable sampling this portable form is the point.

Scale shape: a narrow filter — no shuffle, fully pushed into the scan's
whole-stage codegen; stratified fractions become a CASE over the strata
column (broadcast of a tiny literal map).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LCG_A = 1_103_515_245
LCG_C = 12_345
LCG_M = 2_147_483_648  # 2^31


def uniform_fraction(key: Column | str, seed: int = 42) -> Column:
    """Deterministic pseudo-uniform double in [0, 1) from a numeric key."""
    key = F.col(key) if isinstance(key, str) else key
    k = F.pmod(key.cast("long") + F.lit(seed), F.lit(LCG_M))
    return F.pmod(k * LCG_A + LCG_C, F.lit(LCG_M)).cast("double") / F.lit(
        float(LCG_M)
    )


def deterministic_sample(
    df: DataFrame, fraction: float, key_col: str, seed: int = 42
) -> DataFrame:
    """Keep rows with u(key) < fraction — same rows on any cluster layout."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(uniform_fraction(key_col, seed) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. boost rare languages,
    downsample boilerplate): keep u(key) < fractions[stratum].

    Strata missing from ``fractions`` get ``default_fraction``. The
    fraction lookup compiles to a literal CASE — no join, no shuffle.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f}")
    frac = F.lit(float(default_fraction))
    expr = None
    for s, fr in sorted(fractions.items()):
        cond = F.col(strata_col) == s
        expr = F.when(cond, F.lit(float(fr))) if expr is None else expr.when(
            cond, F.lit(float(fr))
        )
    frac = frac if expr is None else expr.otherwise(frac)
    return df.where(uniform_fraction(key_col, seed) < frac)
