"""ORC source/sink — the third columnar format of the lakehouse
surface (Parquet everywhere, ORC for Hive-lineage warehouses).

The reference reads CSV only (SURVEY.md §2.1 S1-S3); this engine
treats ORC as first-class because Spark's ORC reader is built in (no
extra package), predicate pushdown and column pruning work exactly as
for Parquet, and 100 TB Hive estates overwhelmingly sit in ORC.

Scale notes baked in:
- reads take an EXPLICIT schema when provided (schema-on-read drift
  across  ORC shards written by different producers is real; with no
  schema argument Spark uses the footer schema of the first file);
- writes use zlib compression (the codec every ORC reader ships) and
  shard to the DataFrame's partitioning — control shard count
  upstream with repartition(n), not in the writer;
- ``orc.filter.pushdown`` stays on (Spark default) so row-group
  min/max stats skip like Parquet zone maps
  (see plans/queries_wave27.zone_map_skipping_report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read an ORC file/directory; pass ``schema`` to pin the contract
    (mismatched columns come back NULL rather than failing mid-scan)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write ``df`` as ORC with zlib compression, one file per task."""
    df.write.mode(mode).option("compression", "zlib").orc(path)
