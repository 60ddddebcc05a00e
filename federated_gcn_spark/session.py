"""SparkSession factory with scale-oriented defaults.

The reference does all its tuning by hand (dtype downcasts, ``del``+``gc``,
an analytic memory model — SURVEY.md §4.1). Here the equivalent knobs are
Spark confs chosen once: AQE (runtime re-planning, skew-join splitting,
partition coalescing), Arrow for every pandas-UDF exchange, and a session
timezone pinned to UTC so timestamp semantics are deterministic across
engines (the DuckDB oracle runs timezone-naive).

At 100 TB these defaults matter more than any single operator: AQE converts
sort-merge joins to broadcast at runtime when a post-filter side is small,
splits skewed shuffle partitions, and coalesces the tiny ones, so the same
declarative plans survive a 1000-executor cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to apply to an existing session at runtime.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The driver testdata's events.ts is parquet TIMESTAMP(NANOS), which
    # Spark's vectorized reader rejects; read it as a BIGINT of epoch-nanos
    # and do time arithmetic on integers (exact, and faster than timestamps).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ~64 MB broadcast threshold: every dim table in the star schema (and any
    # post-filter small side) broadcasts instead of shuffling.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally created session.

    The correctness/bench drivers build their own SparkSession; calling this
    from every query entry point keeps semantics (UTC, Arrow, AQE) identical
    no matter who constructed the session.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be final in some envs
            pass
    return spark


def get_spark(
    app_name: str = "federated-gcn-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``);
    on a real cluster pass ``None`` master via spark-submit and only the SQL
    confs apply. ``shuffle_partitions`` defaults to 2× the local cores —
    on a cluster you would size this to ~2-3× total executor cores, or leave
    AQE's coalescing to trim it down from a higher initial value.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 64 if cpus == "*" else max(8, 2 * int(cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune(spark)
