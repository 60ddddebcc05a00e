"""ORC source/sink — the second columnar format alongside parquet.

Mixed lakes are the norm at 100 TB: Hive-era tables are ORC, newer
drops parquet, and an engine that only speaks one forces a full rewrite
of the other. Spark's native ORC reader gives the same scan-level
wins as parquet — predicate pushdown into stripe/row-group indexes,
column pruning, optional bloom-filter indexes per column — so the
catalog treats the two formats symmetrically; everything downstream is
format-agnostic DataFrames.

Same scale rules as the JSONL source: explicit schema on read when the
footprint matters (schema merging across 100k files is a driver-side
listing storm), shard count controlled upstream via repartition, and
compression left at Spark's zlib/snappy default unless the deployment
pins one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read an ORC dataset; pass ``schema`` to skip footer inference."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    bloom_filter_cols: list[str] | None = None,
) -> None:
    """Write ORC; optional partition dirs + per-column bloom indexes.

    ``bloom_filter_cols`` turns on ORC's built-in per-stripe bloom
    filters for those columns — point-lookup predicates then skip
    stripes server-side, the ORC-native cousin of parquet min/max plus
    the explicit operators/bloom.py join filter.
    """
    writer = df.write.mode("overwrite")
    if bloom_filter_cols:
        writer = writer.option(
            "orc.bloom.filter.columns", ",".join(bloom_filter_cols)
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
