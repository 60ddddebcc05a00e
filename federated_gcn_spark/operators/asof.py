"""As-of (merge-asof) join — a time-series operator Spark lacks natively.

For every left row, attach the most recent right row with
``right_ts <= left_ts`` for the same key. The naive realization is a
range join (quadratic per key); this one is the scalable union+window
form: tag both inputs, union them, and run a per-key last-non-null
window ordered by time — one shuffle on the key, linear work, no range
predicate. The same shape implements backward-fill / last-observation-
carried-forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of join: left ⟕ most-recent right per key.

    Every left column survives; ``value_cols`` (default: all right
    columns except keys and timestamp) arrive from the matched right row,
    NULL when no right row precedes the left row. Ties (equal
    timestamps) match — a right row AT the left timestamp is visible,
    mirroring DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` and pandas
    ``merge_asof``. Right rows sort before left rows at equal timestamps
    to realize that; among equal-timestamp right rows the last in
    ``value_cols`` order wins (deterministic).

    The matched row wins or loses atomically: all value columns travel as
    ONE struct through a single last(ignorenulls=True), so a NULL field in
    the matched right row stays NULL instead of being backfilled from an
    older right row (merge_asof / DuckDB ASOF semantics).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in {*on, right_ts}]
    left_payload = [c for c in left.columns if c not in {*on}]
    clash = set(left_payload) & set(value_cols)
    if clash:
        raise ValueError(
            f"asof_join: columns {sorted(clash)} exist on both sides — "
            "rename or restrict value_cols to keep the output unambiguous"
        )

    struct_ddl = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
    ) + ">"
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(struct_ddl).alias("__v"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    # right rows carry a non-null struct (even if every field is NULL), so
    # last(ignorenulls) picks the newest right ROW; its NULL fields stay NULL
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__is_left", "__v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("__v", ignorenulls=True).over(w).alias("__vc")
    )
    return carried.where(F.col("__is_left") == 1).select(
        *on,
        *left_payload,
        *[F.col("__vc").getField(c).alias(c) for c in value_cols],
    )
