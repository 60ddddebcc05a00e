"""JSONL (newline-delimited JSON) source/sink for document corpora.

The reference only reads CSV (SURVEY.md §2.1 S1-S3), but real LLM
training corpora overwhelmingly arrive as JSONL shards — so the engine
treats it as a first-class format alongside CSV/Parquet.

Scale notes baked in:
- reads take an EXPLICIT schema (never inferSchema: schema inference is
  a full extra pass over 100 TB and silently unions drifting types);
- malformed lines go to a ``_corrupt_record`` column (PERMISSIVE) or
  drop (DROPMALFORMED) instead of failing the job — a 100 TB crawl
  always has a few broken lines;
- writes compress with gzip (the dependency-free codec every Hadoop
  build ships; swap for zstd where the native lib exists) and shard to the DataFrame's partitioning
  (one file per task — control shard count upstream with
  repartition(n), not in the writer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_JSONL_SCHEMA,
    drop_malformed: bool = False,
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema.

    PERMISSIVE mode keeps malformed lines in ``_corrupt_record`` for
    quarantine-and-audit pipelines; ``drop_malformed=True`` silently
    drops them (DROPMALFORMED) when the caller only wants clean rows.
    """
    if drop_malformed:
        return (
            spark.read.schema(schema)
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
    with_corrupt = StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compress: bool = True
) -> None:
    """Write a DataFrame as (optionally gzip-compressed) JSONL shards."""
    writer = df.write.mode(mode)
    if compress:
        writer = writer.option("compression", "gzip")
    writer.json(path)


def corrupt_line_stats(df: DataFrame) -> DataFrame:
    """(n_rows, n_corrupt) audit for a PERMISSIVE read — run this before
    trusting a new crawl shard.

    Counts a real data column alongside ``_corrupt_record``: Spark
    refuses scans whose referenced columns are ONLY the internal corrupt
    column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    """
    first_data_col = next(c for c in df.columns if c != "_corrupt_record")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.count(first_data_col).alias("n_first_col_present"),
    )
