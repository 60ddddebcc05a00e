"""Evaluation-metric aggregates (SURVEY.md §2.6 A6) as scalable dataflow.

The reference logs loss/accuracy/recall/AUC/precision from Keras
(models/supervised.py:103, fl_client.py:139-160); here the threshold-free
metric (AUC) is re-derived as pure relational algebra so it runs on a
predictions DataFrame of any size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def partitioned_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int = 64,
    small_input_rows: int = 1_000_000,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` in ``order_col`` order —
    WITHOUT a global unpartitioned window (which funnels every row
    through one task).

    Cost-based in the AQE spirit: the input is pinned once
    (localCheckpoint) and counted; at or below ``small_input_rows`` a
    single-task sort IS the fastest physical plan (same rationale as
    TakeOrdered for top-k) and the range shuffle would only add
    overhead. Above it, the classic two-pass distributed prefix-sum:
    1. range-repartition on the order key (equal keys co-locate), pin the
       layout with localCheckpoint so both passes see identical
       partitions;
    2. per-partition totals → driver-side cumulative offsets (one tiny
       collect of ``num_partitions`` rows);
    3. within-partition exclusive running sum (window partitioned by
       spark_partition_id) + the partition's offset.

    Wall-clock scales with rows/partitions; driver state with
    ``num_partitions`` only.
    """
    pinned = df.localCheckpoint(eager=True)
    if pinned.count() <= small_input_rows:
        w = (
            Window.orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return pinned.withColumn(
            out_col, F.coalesce(F.sum(value_col).over(w), F.lit(0)).cast("long")
        )
    ranged = (
        pinned.repartitionByRange(num_partitions, F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    partials = {
        r["__pid"]: r["total"]
        for r in ranged.groupBy("__pid").agg(F.sum(value_col).alias("total")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(partials):
        offsets[pid] = acc
        acc += partials[pid] or 0
    offset_col: Column = F.coalesce(
        *[
            F.when(F.col("__pid") == pid, F.lit(off))
            for pid, off in offsets.items()
        ],
        F.lit(0),
    ) if offsets else F.lit(0)
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ranged.withColumn(
        out_col,
        (F.coalesce(F.sum(value_col).over(w), F.lit(0)) + offset_col).cast("long"),
    ).drop("__pid")


def binary_auc(
    predictions: DataFrame, score_col: str, label_col: str
) -> DataFrame:
    """ROC-AUC as a 1-row DataFrame (column ``auc``), exact, with
    average-rank tie handling (Mann-Whitney U).

    Shape: collapse to the distinct-score histogram (one shuffle with
    map-side combine), then a distributed prefix sum of negatives in
    score order — never a global sort, never a single-partition window,
    no driver-side row data. AUC = Σ_s np(s)·(cum_neg_below(s) + nn(s)/2)
    / (NP·NN).
    """
    g = predictions.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(F.col(label_col)).alias("np"),
        (F.count(F.lit(1)) - F.sum(F.col(label_col))).alias("nn"),
    )
    c = partitioned_prefix_sum(g, "score", "nn", "cum_neg")
    totals = c.agg(F.sum("np").alias("tp"), F.sum("nn").alias("tn"))
    return (
        c.agg(
            F.sum(F.col("np") * (F.col("cum_neg") + F.col("nn") / 2.0)).alias("u")
        )
        .crossJoin(F.broadcast(totals))
        .select(F.round(F.col("u") / (F.col("tp") * F.col("tn")), 6).alias("auc"))
    )


def exact_kth_smallest_value(
    df: DataFrame, value_col: str, k: int, n_buckets: int = 65536
):
    """The k-th smallest VALUE of a double column — exactly, without a
    global sort (which would single-partition the whole column).

    Same two-pass selection as graph/split.take_n_smallest_by_hash but
    over an equi-width VALUE histogram: pass 1 aggregates (min, max,
    per-bucket counts) — a tiny groupBy collect; the driver locates the
    bucket holding the k-th order statistic; pass 2 sorts ONLY that
    boundary bucket (~|df|/n_buckets rows under any non-adversarial
    distribution) and takes the remaining offset.  Exact median/p99 at
    100 TB costs two scans and one micro-sort; the returned value is an
    actual data value, so cross-engine comparison is exact (no FP
    accumulation anywhere).
    """
    stats = df.agg(
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
        F.count(value_col).alias("n"),
    ).collect()[0]
    mn, mx, n = stats["mn"], stats["mx"], stats["n"]
    if n == 0 or k <= 0 or k > n:
        raise ValueError(f"k={k} out of range for n={n}")
    if mn == mx:
        return mn
    width = (mx - mn) / n_buckets
    bucket = F.least(
        F.floor((F.col(value_col) - F.lit(mn)) / F.lit(width)),
        F.lit(n_buckets - 1),
    )
    counts = sorted(
        df.groupBy(bucket.alias("__b")).count().collect(),
        key=lambda r: r["__b"],
    )
    cum = 0
    boundary = None
    for r in counts:
        if cum + r["count"] >= k:
            boundary = r["__b"]
            break
        cum += r["count"]
    return (
        df.where(bucket == boundary)
        .orderBy(value_col)
        .limit(k - cum)
        .agg(F.max(value_col))
        .collect()[0][0]
    )


def exact_quantile_values(
    df: DataFrame, value_col: str, ks: list[int], n_buckets: int = 65536
) -> dict:
    """Several exact order statistics of a double column in ONE shared
    two-pass selection — the multi-cutpoint form of
    :func:`exact_kth_smallest_value` (equi-depth histogram boundaries,
    winsorization bounds, p25/p50/p75 in a single shot).

    Pass 1: one (min, max, count) aggregate + one equi-width-bucket
    count aggregate, shared by ALL requested ranks; the driver walks the
    cumulative histogram once to map each k to (boundary bucket,
    in-bucket offset). Pass 2: ONE job sorts only the union of boundary
    buckets (each ~|df|/n_buckets rows), a per-bucket window row_number
    picks every requested offset. Cost is flat in len(ks): two scans +
    one micro-sort regardless of how many quantiles are asked for,
    where a naive per-k loop would rescan the column 2·len(ks) times.
    Returned values are actual data values — exact under duplicate
    ties, no FP interpolation anywhere.
    """
    from pyspark.sql import Window

    ks = sorted(set(int(k) for k in ks))
    stats = df.agg(
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
        F.count(value_col).alias("n"),
    ).collect()[0]
    mn, mx, n = stats["mn"], stats["mx"], stats["n"]
    if n == 0 or any(k <= 0 or k > n for k in ks):
        raise ValueError(f"ks={ks} out of range for n={n}")
    if mn == mx:
        return {k: mn for k in ks}
    width = (mx - mn) / n_buckets
    bucket = F.least(
        F.floor((F.col(value_col) - F.lit(mn)) / F.lit(width)),
        F.lit(n_buckets - 1),
    )
    counts = sorted(
        df.groupBy(bucket.alias("__b")).count().collect(),
        key=lambda r: r["__b"],
    )
    want = {}  # (boundary_bucket, in_bucket_rank) -> k
    cum = 0
    it = iter(counts)
    r = next(it)
    for k in ks:  # ks ascending: one forward walk over the histogram
        while cum + r["count"] < k:
            cum += r["count"]
            r = next(it)
        want[(r["__b"], k - cum)] = k
    boundary_buckets = [b for b, _ in want]
    w = Window.partitionBy("__b").orderBy("__v")
    hit = [
        (F.col("__b") == b) & (F.col("__rn") == rn) for b, rn in want
    ]
    pred = hit[0]
    for h in hit[1:]:
        pred = pred | h
    rows = (
        df.select(F.col(value_col).alias("__v"), bucket.alias("__b"))
        .where(F.col("__b").isin(boundary_buckets))
        .withColumn("__rn", F.row_number().over(w))
        .where(pred)
        .collect()
    )
    got = {want[(r["__b"], r["__rn"])]: r["__v"] for r in rows}
    missing = [k for k in ks if k not in got]
    if missing:  # pragma: no cover - defensive
        raise RuntimeError(f"quantile selection missed ranks {missing}")
    return got


def exact_quantile_values_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ks_of_n,
    n_buckets: int = 65536,
    max_groups: int = 1024,
) -> dict:
    """Exact order statistics for EVERY group in one shared three-job
    selection — the grouped form of :func:`exact_quantile_values`.

    ``ks_of_n(group, n)`` maps a group and its row count to the list of
    requested ranks (1-based), so callers can ask for e.g. deciles
    ``ceil(d/10 * n)`` without a separate count job per group (and can
    record the group's rank list for later lookup).  Returns
    ``{group: {k: value}}`` with actual data values (exact under ties,
    no interpolation).

    Cost is flat in both the number of groups and the number of ranks:
    one (min, max, n) aggregate per group, one (group, bucket) count
    aggregate, one micro-sort of the boundary buckets — where the
    per-group loop spelling pays ~4 sequential driver jobs PER GROUP
    (measured on qq_deciles_halves: 8 collect jobs -> 3).
    """
    from pyspark.sql import Window

    g = F.col(group_col)
    # Driver-collection guard: this operator collects one (min, max, n)
    # row per group and up to n_groups x n_buckets histogram rows.  Its
    # callers pass a handful of groups (halves, deciles, priorities);
    # a high-cardinality group column would OOM the driver, so fail
    # fast — with the LIMIT probe, before anything big is pulled — and
    # name the cap.  Raise ``max_groups`` deliberately (the driver pull
    # is ~n_groups x n_buckets x ~40 bytes) or pre-aggregate instead.
    stats = (
        df.groupBy(g.alias("__g"))
        .agg(
            F.min(value_col).alias("mn"),
            F.max(value_col).alias("mx"),
            F.count(value_col).alias("n"),
        )
        .limit(max_groups + 1)
        .collect()
    )
    if len(stats) > max_groups:
        raise ValueError(
            f"exact_quantile_values_by_group: more than {max_groups} "
            f"distinct '{group_col}' groups; the histogram selection "
            f"collects O(n_groups * n_buckets) rows to the driver. "
            "Raise max_groups only if the driver can hold that, or "
            "reduce n_buckets / pre-filter the groups."
        )
    out: dict = {}
    ks_by_group: dict = {}
    meta = {}  # group -> (mn, width)
    for r in stats:
        grp, mn, mx, n = r["__g"], r["mn"], r["mx"], r["n"]
        ks = sorted(set(int(k) for k in ks_of_n(grp, n)))
        if n == 0 or any(k <= 0 or k > n for k in ks):
            raise ValueError(f"ks={ks} out of range for n={n} (group {grp})")
        if mn == mx:
            out[grp] = {k: mn for k in ks}
            continue
        ks_by_group[grp] = ks
        meta[grp] = (mn, (mx - mn) / n_buckets)
    if not ks_by_group:
        return out
    # Second driver pull: the (group, bucket) histogram is at most
    # n_groups x n_buckets rows.  Cap the worst case at ~4M rows
    # (~160 MB of driver Rows) — the same fail-fast-before-the-shuffle
    # discipline as ppjoin's pair guard.
    if len(ks_by_group) * n_buckets > 4_000_000:
        raise ValueError(
            f"exact_quantile_values_by_group: {len(ks_by_group)} groups x "
            f"{n_buckets} buckets could collect "
            f"{len(ks_by_group) * n_buckets} histogram rows to the "
            "driver; reduce n_buckets or the group count."
        )
    bounds = df.sparkSession.createDataFrame(
        [(grp, float(mn), float(w)) for grp, (mn, w) in meta.items()],
        f"__g {df.schema[group_col].dataType.simpleString()}, "
        "__mn double, __w double",
    )
    based = df.join(
        F.broadcast(bounds), g == F.col("__g"), "inner"
    ).select(
        "__g",
        F.col(value_col).alias("__v"),
        F.least(
            F.floor((F.col(value_col) - F.col("__mn")) / F.col("__w")),
            F.lit(n_buckets - 1),
        ).alias("__b"),
    )
    counts = sorted(
        based.groupBy("__g", "__b").count().collect(),
        key=lambda r: (str(r["__g"]), r["__b"]),
    )
    per_group: dict = {}
    for r in counts:
        per_group.setdefault(r["__g"], []).append(r)
    want = {}  # (group, boundary_bucket, in_bucket_rank) -> k
    for grp, ks in ks_by_group.items():
        cum = 0
        it = iter(per_group[grp])
        r = next(it)
        for k in ks:
            while cum + r["count"] < k:
                cum += r["count"]
                r = next(it)
            want[(grp, r["__b"], k - cum)] = k
    boundary = {(grp, b) for grp, b, _ in want}
    w = Window.partitionBy("__g", "__b").orderBy("__v")
    pred = None
    for grp, b, rn in want:
        h = (F.col("__g") == grp) & (F.col("__b") == b) & (F.col("__rn") == rn)
        pred = h if pred is None else (pred | h)
    bpred = None
    for grp, b in boundary:
        h = (F.col("__g") == grp) & (F.col("__b") == b)
        bpred = h if bpred is None else (bpred | h)
    rows = (
        based.where(bpred)
        .withColumn("__rn", F.row_number().over(w))
        .where(pred)
        .collect()
    )
    for r in rows:
        grp = r["__g"]
        out.setdefault(grp, {})[want[(grp, r["__b"], r["__rn"])]] = r["__v"]
    missing = [
        (grp, k)
        for grp, ks in ks_by_group.items()
        for k in ks
        if k not in out.get(grp, {})
    ]
    if missing:  # pragma: no cover - defensive
        raise RuntimeError(f"grouped quantile selection missed {missing}")
    return out


def exact_group_median(
    df: DataFrame, group_col: str, value_col: str, n_buckets: int = 4096
) -> DataFrame:
    """Exact per-group median (lower-middle order statistic, k =
    (n+1)//2) of a double column — same two-pass histogram selection as
    :func:`exact_kth_smallest_value`, vectorized across groups.

    Pass 1: one partial-final aggregate to (group, bucket) counts plus
    per-group (min, max, n) — driver receives <= |groups| * n_buckets
    tiny rows.  The driver walks each group's histogram to its boundary
    bucket.  Pass 2: ONLY boundary-bucket rows (|df| / n_buckets per
    group in expectation) survive a broadcast semi join, then a
    per-group window sort of those few rows picks the exact order
    statistic.  No global sort, no per-group full sort, group count
    bounded only by driver memory for the boundary table.
    """
    from pyspark.sql import Window

    gstats = {
        r[group_col]: r
        for r in df.groupBy(group_col)
        .agg(
            F.min(value_col).alias("mn"),
            F.max(value_col).alias("mx"),
            F.count(value_col).alias("n"),
        )
        .collect()
    }
    spark = df.sparkSession
    width = {
        g: ((r["mx"] - r["mn"]) / n_buckets or 1.0) for g, r in gstats.items()
    }
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    gtype = df.schema[group_col].dataType
    wdf = F.broadcast(
        spark.createDataFrame(
            [(g, float(gstats[g]["mn"]), width[g]) for g in gstats],
            StructType([
                StructField(group_col, gtype),
                StructField("__mn", DoubleType()),
                StructField("__w", DoubleType()),
            ]),
        )
    )
    bucketed = df.join(wdf, group_col).withColumn(
        "__b",
        F.least(
            F.floor((F.col(value_col) - F.col("__mn")) / F.col("__w")),
            F.lit(n_buckets - 1),
        ),
    )
    counts = (
        bucketed.groupBy(group_col, "__b").count().collect()
    )
    per_group: dict = {}
    for r in counts:
        per_group.setdefault(r[group_col], []).append((r["__b"], r["count"]))
    boundary_rows = []
    for g, bs in per_group.items():
        k = (gstats[g]["n"] + 1) // 2
        cum = 0
        for b, c in sorted(bs):
            if cum + c >= k:
                boundary_rows.append((g, b, k - cum))
                break
            cum += c
    bdf = F.broadcast(
        spark.createDataFrame(
            boundary_rows,
            StructType([
                StructField(group_col, gtype),
                StructField("__b", LongType()),
                StructField("__k", LongType()),
            ]),
        )
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        bucketed.join(bdf, [group_col, "__b"])
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == F.col("__k"))
        .select(group_col, F.col(value_col).alias("median"))
    )


def exact_group_quantile_values(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ks_of,
    n_buckets: int = 4096,
    gstats: dict | None = None,
    hist: dict | None = None,
    bucket_of=None,
) -> dict:
    """Several exact order statistics for EVERY group in one shared
    two-pass histogram selection — the grouped, multi-cutpoint
    generalization of :func:`exact_group_median` /
    :func:`exact_quantile_values`.

    ``ks_of(n)`` maps a group's row count to the list of ranks wanted
    for that group (e.g. ``lambda n: [(n + 1) // 2, -(-n // 4)]`` for
    median + lower quartile).  Returns ``{(group, k): value}``.
    ``gstats`` optionally supplies precomputed per-group
    ``{group: (mn, mx, n)}`` — callers that already ran a per-group
    moment aggregate (min/max/count ride along for free) skip this
    function's pass-0 scan entirely.  ``n`` must be the NON-NULL count
    of ``value_col`` (``count(value_col)``, not ``count(1)``): NULL
    values are filtered from both passes here, so a null-inclusive n
    would shift every rank.  A gstats group absent from ``df`` raises
    ``ValueError``; a group with n = 0 is allowed only when
    ``ks_of(0)`` asks for no ranks (empty list).

    Cost is flat in both the group count and len(ks): pass 1 is one
    (group, bucket) (count, min, max) aggregate shared by all ranks;
    the driver walks each group's cumulative histogram once, mapping
    every rank to (boundary bucket, in-bucket offset) — and any rank
    whose boundary bucket is SINGLE-VALUED (bucket min == max, the
    common case for low-cardinality integerized features) resolves
    right there with no second pass.  Pass 2, only if some rank lands
    in a mixed-value bucket, is ONE job that keeps boundary-bucket rows
    (~n/n_buckets per group), ranks them with a per-(group, bucket)
    window, and collects the hit rows.  A naive per-(group, rank) loop
    rescans the column 3·|groups|·|ks| times — the respelling that took
    qq_deciles_halves from 18 jobs to 1 applies verbatim here.

    ``hist`` + ``bucket_of`` is the ZERO-extra-scan fast path: a caller
    that already ran its own (group, bucket) aggregate (e.g. fused with
    a moment pass over the same scan) supplies the collected histogram
    ``{group: [(b, count, bucket_min, bucket_max), ...]}`` plus the
    Column function ``bucket_of(value_col_Column) -> bucket Column``
    that produced the ``b`` values — any per-group MONOTONE bucketing
    works (it need not be equi-width).  Pass 0 and pass 1 are skipped
    entirely; per-group n is derived from the histogram counts; pass 2
    (only for ranks landing in mixed-value buckets) re-derives ``__b``
    with ``bucket_of``.  ``gstats`` is ignored when ``hist`` is given.
    """
    from pyspark.sql import Window
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    # Order statistics are over non-null values only; filtering here
    # covers both passes (bucketed derives from df) and keeps pass-0's
    # count(value_col) consistent with pass-1's count(1).
    df = df.where(F.col(value_col).isNotNull())
    spark = df.sparkSession
    gtype = df.schema[group_col].dataType
    if hist is not None:
        if bucket_of is None:
            raise ValueError("hist requires bucket_of (the bucket Column fn)")
        gstats = {
            g: (
                min((bmn for _, _, bmn, _ in h), default=None),
                max((bmx for _, _, _, bmx in h), default=None),
                sum(c for _, c, _, _ in h),
            )
            for g, h in hist.items()
        }
    elif gstats is None:
        gstats = {
            r[group_col]: (r["mn"], r["mx"], r["n"])
            for r in df.groupBy(group_col)
            .agg(
                F.min(value_col).alias("mn"),
                F.max(value_col).alias("mx"),
                F.count(value_col).alias("n"),
            )
            .collect()
        }
    ks_by_group = {}
    for g, (_, _, n) in gstats.items():
        ks = sorted(set(int(k) for k in ks_of(n)))
        if n == 0:
            if ks:
                raise ValueError(
                    f"group {g!r} has no non-null {value_col!r} rows but "
                    f"ks_of(0) requested ranks {ks}"
                )
            continue  # empty group, no ranks wanted: nothing to select
        if any(k <= 0 or k > n for k in ks):
            raise ValueError(f"ranks {ks} out of range for group {g!r}")
        ks_by_group[g] = ks
    if hist is not None:
        bucketed = df.withColumn(
            "__b", bucket_of(F.col(value_col)).cast("long")
        )
        per_group = {
            g: [(int(b), c, bmn, bmx) for b, c, bmn, bmx in h]
            for g, h in hist.items()
            if g in ks_by_group
        }
    else:
        wdf = F.broadcast(
            spark.createDataFrame(
                [
                    (g, float(mn), ((mx - mn) / n_buckets) or 1.0)
                    for g, (mn, mx, _) in gstats.items()
                    if g in ks_by_group  # skip empty / rank-free groups
                ],
                StructType([
                    StructField(group_col, gtype),
                    StructField("__mn", DoubleType()),
                    StructField("__w", DoubleType()),
                ]),
            )
        )
        bucketed = df.join(wdf, group_col).withColumn(
            "__b",
            F.least(
                F.floor((F.col(value_col) - F.col("__mn")) / F.col("__w")),
                F.lit(n_buckets - 1),
            ),
        )
        per_group = {}
        for r in (
            bucketed.groupBy(group_col, "__b")
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.min(value_col).alias("bmn"),
                F.max(value_col).alias("bmx"),
            )
            .collect()
        ):
            per_group.setdefault(r[group_col], []).append(
                (r["__b"], r["c"], r["bmn"], r["bmx"])
            )
    got = {}  # (group, k) -> value, filled driver-side when possible
    want = {}  # (group, boundary_bucket, in_bucket_rank) -> k
    for g, ks in ks_by_group.items():
        if g not in per_group:
            raise ValueError(
                f"gstats group {g!r} (n={gstats[g][2]}) has no rows in df "
                f"— stale or mismatched precomputed stats"
            )
        hist = sorted(per_group[g])
        cum = 0
        it = iter(hist)
        b, c, bmn, bmx = next(it)
        for k in ks:  # ascending: one forward walk per group
            while cum + c < k:
                cum += c
                b, c, bmn, bmx = next(it)
            if bmn == bmx:  # single-valued bucket: rank resolved here
                got[(g, k)] = bmn
            else:
                want[(g, b, k - cum)] = k
    if not want:
        return got
    # Survive only boundary-bucket rows (broadcast semi join on (g, b)),
    # rank them per bucket, then keep ONLY the exact wanted (g, b, rank)
    # triples distributed-side — a dense boundary bucket (low-cardinality
    # value domain) must not ship its whole prefix to the driver.
    bdf = F.broadcast(
        spark.createDataFrame(
            sorted({(g, b) for g, b, _ in want}),
            StructType([
                StructField(group_col, gtype),
                StructField("__b", LongType()),
            ]),
        )
    )
    hdf = F.broadcast(
        spark.createDataFrame(
            [(g, b, rn) for g, b, rn in want],
            StructType([
                StructField(group_col, gtype),
                StructField("__b", LongType()),
                StructField("__rn", LongType()),
            ]),
        )
    )
    w = Window.partitionBy(group_col, "__b").orderBy(value_col)
    # Literal group filter BEFORE the joins: when the input is a union of
    # per-group projections (lit(name) branches), Catalyst constant-folds
    # the predicate and prunes resolved groups' branches from the scan.
    needed = sorted({g for g, _, _ in want})
    hits = (
        bucketed.where(F.col(group_col).isin(needed))
        .join(bdf, [group_col, "__b"])
        .withColumn("__rn", F.row_number().over(w))
        .join(hdf, [group_col, "__b", "__rn"])
        .select(group_col, "__b", "__rn", value_col)
        .collect()
    )
    for r in hits:
        key = (r[group_col], r["__b"], r["__rn"])
        if key in want:
            got[(r[group_col], want[key])] = r[value_col]
    missing = [
        (g, k) for g, ks in ks_by_group.items() for k in ks
        if (g, k) not in got
    ]
    if missing:  # pragma: no cover - defensive
        raise RuntimeError(f"grouped selection missed ranks {missing}")
    return got
