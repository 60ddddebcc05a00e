"""Graph-shaped scaling bench (round-3 verdict #7).

The TPC-H tiling scale curve (tools/bench_scale.py) keeps degree
distributions fixed, so the graph layer's O(sqrt m) oriented-wedge and
O(log n) star-contraction claims were only ever measured under uniform
tiling.  This bench generates a DETERMINISTIC Chung-Lu-style power-law
graph at two sizes (10x edges apart), verifies the degree exponent with
a Hill MLE, then measures the heavy graph operators on both — wall
time, measured round counts, and the 10x ratio — writing
BENCH_GRAPH.json.

Generator: node ids drawn by inverse-CDF i = floor(n * u^beta) on
xxhash64 uniforms (beta = 2.5 -> degree tail exponent ~ 1 + 1/0.6 =
2.67, the classic web-graph range); endpoints independent, self-loops
dropped, multi-edges deduped.  Pure hash math — layout-independent,
reproducible on any cluster.

    python tools/bench_graph.py [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from federated_gcn_spark.graph import Graph  # noqa: E402
from federated_gcn_spark.graph.components import connected_components  # noqa: E402
from federated_gcn_spark.graph.kcore import core_numbers  # noqa: E402
from federated_gcn_spark.graph.triangles import local_clustering, triangle_stats  # noqa: E402
from federated_gcn_spark.graph.truss import ktruss_trace  # noqa: E402
from federated_gcn_spark.session import get_spark  # noqa: E402

BETA = 2.5  # inverse-CDF shape -> degree tail exponent ~ 2.67


def powerlaw_edges(spark, n_nodes: int, n_draws: int, seed: int):
    """Deterministic Chung-Lu-ish multigraph draw, deduped."""
    P = 1_000_003  # uniform resolution
    base = spark.range(n_draws)

    def node(col_seed: int):
        u = (
            F.pmod(F.xxhash64(F.col("id"), F.lit(col_seed), F.lit(seed)), F.lit(P))
            + F.lit(0.5)
        ) / F.lit(float(P))
        return F.floor(F.lit(float(n_nodes)) * F.pow(u, F.lit(BETA))).cast("long")

    e = base.select(node(1).alias("src"), node(2).alias("dst"))
    return (
        e.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def hill_alpha(edges, d_min: int = 5) -> float:
    """Hill MLE of the degree-tail exponent: alpha = 1 + k / sum ln(d/dmin)."""
    deg = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") >= d_min)
    )
    row = deg.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.log(F.col("d") / F.lit(float(d_min)))).alias("s"),
    ).collect()[0]
    return round(1.0 + row["k"] / row["s"], 3) if row["s"] else float("nan")


def bench_graph(spark, label: str, n_nodes: int, n_draws: int) -> dict:
    edges = powerlaw_edges(spark, n_nodes, n_draws, seed=7)
    m = edges.count()
    g = Graph.from_edges(edges)
    n = g.vertices.count()
    out = {"label": label, "n_nodes": n, "n_edges": m,
           "alpha_hat": hill_alpha(edges)}

    t0 = time.perf_counter()
    stats: dict = {}
    cc = connected_components(g, stats=stats)
    n_comp = cc.select("component").distinct().count()
    out["components"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "iterations": stats["iterations"],
        "log2_n": round(math.log2(max(n, 2)), 1),
        "n_components": n_comp,
    }

    t0 = time.perf_counter()
    stats = {}
    kc = core_numbers(g, stats=stats)
    max_core = kc.agg(F.max("coreness")).collect()[0][0]
    out["kcore"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "iterations": stats["iterations"],
        "max_core": int(max_core),
    }

    t0 = time.perf_counter()
    tri = triangle_stats(edges).collect()[0].asDict()
    out["triangles"] = {
        "sec": round(time.perf_counter() - t0, 2),
        **{k: int(v) if isinstance(v, int) else round(float(v), 4)
           for k, v in tri.items()},
    }

    t0 = time.perf_counter()
    n_cl = local_clustering(edges).count()
    out["local_clustering"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": n_cl,
    }

    t0 = time.perf_counter()
    trace = ktruss_trace(spark, edges, k=5, rounds=12).collect()
    sizes = [r["n_edges"] for r in sorted(trace, key=lambda r: r["round"])]
    conv = next(
        (i for i in range(1, len(sizes)) if sizes[i] == sizes[i - 1]),
        len(sizes) - 1,
    )
    out["ktruss"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "rounds_to_fixpoint": conv,
        "final_edges": sizes[-1],
    }
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_GRAPH.json"
    spark = get_spark("bench-graph")
    spark.sparkContext.setLogLevel("ERROR")
    g1 = bench_graph(spark, "g1", n_nodes=20_000, n_draws=120_000)
    g10 = bench_graph(spark, "g10", n_nodes=200_000, n_draws=1_200_000)
    ratios = {
        op: round(g10[op]["sec"] / g1[op]["sec"], 2)
        for op in ("components", "kcore", "triangles", "local_clustering",
                   "ktruss")
        if g1[op]["sec"] > 0
    }
    payload = {"beta": BETA, "g1": g1, "g10": g10, "sec_ratio_10x": ratios}
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
