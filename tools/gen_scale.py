"""Deterministic scale-up of the driver testdata by integer key tiling.

    python tools/gen_scale.py [src_sf_dir] [out_dir] [factor]

Produces ``factor``× copies of every fact table with per-copy key
offsets (a cross join against ``spark.range(factor)`` — one distributed
job per table, no driver loops), leaving the fixed dims (region, nation)
untouched. Offsets are multiples of 100, so the catalog's graph-edge
samplers (``l_orderkey % 10 / 20 / 50``) hit the same residue classes in
every copy and the scaled graph is ``factor`` disjoint replicas — join
selectivities, degree distributions, group sizes, and text near-dup
cluster structure are all preserved, which is exactly what a scaling
CURVE should hold constant. Not the driver's generator (that seed is
theirs); this is for relative sf0.1 → sf1 perf measurement, not
cross-sf correctness.

Offset sanity: at factor=10 the max lineitem orderkey stays ~6M, still
below the +10,000,000 vertex-id shift the graph queries use for the
supplier side, so order/supplier vertex ids keep non-overlapping ranges.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from federated_gcn_spark.session import get_spark  # noqa: E402

# table -> columns that get the per-copy offset of the named key space
KEYED = {
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "customer": {"c_custkey": "cust"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "ev", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ("region", "nation")

# key space -> (table, column) used to size the offset
KEY_SOURCE = {
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "cust": ("customer", "c_custkey"),
    "ord": ("orders", "o_orderkey"),
    "ev": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _round_up_100(n: int) -> int:
    return ((n // 100) + 1) * 100


def tile(df: DataFrame, factor: int, offsets: dict[str, int]) -> DataFrame:
    copies = df.sparkSession.range(factor).withColumnRenamed("id", "__copy")
    out = df.crossJoin(F.broadcast(copies))
    for col, off in offsets.items():
        dtype = dict(df.dtypes)[col]
        out = out.withColumn(
            col, (F.col(col) + F.col("__copy") * F.lit(off)).cast(dtype)
        )
    return out.drop("__copy")


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scaledata", "sf1",
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)

    key_off = {
        space: _round_up_100(
            spark.read.parquet(os.path.join(src, f"{tbl}.parquet"))
            .agg(F.max(col))
            .collect()[0][0]
        )
        for space, (tbl, col) in KEY_SOURCE.items()
    }
    print(f"offsets: {key_off}")

    for tbl in COPY_AS_IS:
        df = spark.read.parquet(os.path.join(src, f"{tbl}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(dst, f"{tbl}.parquet"))
        print(f"{tbl}: copied")
    for tbl, keymap in KEYED.items():
        df = spark.read.parquet(os.path.join(src, f"{tbl}.parquet"))
        offsets = {col: key_off[space] for col, space in keymap.items()}
        out = tile(df, factor, offsets)
        out.write.mode("overwrite").parquet(os.path.join(dst, f"{tbl}.parquet"))
        n = spark.read.parquet(os.path.join(dst, f"{tbl}.parquet")).count()
        print(f"{tbl}: {n} rows ({factor}x)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
