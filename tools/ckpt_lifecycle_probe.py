"""Checkpoint-lifecycle probe (round-11 VERDICT task 2 diagnosis).

Replays a slice of bench.py's HEADLINE roster (same best-of-2 noop-sink
methodology, same session factory) and, after each query, samples the
block manager: number of cached RDDs still resident and their memory
footprint.  Every localCheckpoint in the engine materializes as cached
blocks; nothing unpersists them explicitly, so cleanup relies on Python
refcount -> py4j finalizer -> JVM GC -> ContextCleaner.  If blocks pile
up across queries (and the pile correlates with late-roster slowdowns
like the jl/feature_hash/mojibake cluster in BENCH_r10), the lifecycle
is the root cause; if the pile stays flat, it is not.

Usage: python tools/ckpt_lifecycle_probe.py [start_idx] [end_idx]
Replays HEADLINE[start:end] at $SPARK_GRAFT_SF_DIR, prints one line per
query: seconds, cached-RDD count, storage memory used.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from federated_gcn_spark.plans import QUERIES  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402


def storage_sample(spark) -> tuple[int, float]:
    """(n cached RDDs, MB of storage memory used across executors)."""
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    n = len(infos)
    mb = sum(i.memSize() for i in infos) / 1e6
    return n, mb


def main() -> None:
    start = int(sys.argv[1]) if len(sys.argv) > 1 else 210
    end = int(sys.argv[2]) if len(sys.argv) > 2 else len(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ckpt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.write.format("noop").mode("overwrite").save()

    for name in HEADLINE[start:end]:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        n, mb = storage_sample(spark)
        print(
            f"{name:36s} {best:7.3f}s  cached_rdds={n:4d}  "
            f"storage={mb:9.1f}MB",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
