"""Graph-family scaling probe (round 14): does the co-purchase graph
family scale linearly in edge volume, or is there a hidden superlinear
term the sf0.1 fixture is too small to expose?

Replicates sf0.1 lineitem x1 / x16 with BOTH keys shifted per replica
(the bench_tpch_scaling.py discipline: replica i shifts l_orderkey and
l_partkey by i * max_key), so the thresholded co-purchase graph becomes
16 disjoint copies — edge count, wedge count and triangle count all grow
exactly 16x, making the expected wall growth ~linear for every operator
whose plan is compact-forward / hub-capped / fixed-round as claimed:

  build     — the ONE shared weighted basket-expansion build (u, v, w)
  triangle  — compact-forward oriented closure (O(m^1.5) total wedges,
              but here wedges grow exactly 16x: disjoint copies)
  kcore     — 4 fixed peel rounds (job count constant by design)
  lpa       — 3 fixed label rounds
  cn        — hub-capped common-neighbors (deg <= 64 cap)
  bfs       — 4 fixed hops from the min-node seed (reaches ONE copy —
              wall should stay ~FLAT: frontier size is copy-local)

Prints one JSON line and writes bench/graph_scaling_results.json.

Run: python bench_graph_scaling.py   (env: SPARK_GRAFT_SCALING_BASE,
default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SCALING_BASE", "/root/testdata/sf0.1")
FACTORS = [1, 16]

_OPS = {
    "triangle": "xh_triangle_count",
    "kcore": "xh_kcore_peel",
    "lpa": "xh_label_propagation",
    "cn": "xh_common_neighbors",
    "bfs": "xh_bfs_hops",
}


def replicate(spark, out_dir: str, factor: int) -> str:
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    no = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    np_ = li.agg(F.max("l_partkey")).collect()[0][0] + 1
    reps = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * no)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * np_)).alias("l_partkey"),
        )
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    sf_dir = os.path.join(out_dir, f"x{factor}")
    out.repartition(max(4, factor * 2)).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "lineitem.parquet")
    )
    return sf_dir


def main() -> None:
    from hadoop_copier_spark.queries import graph_ops

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix="hcs_graph_scaling_")
    results: dict = {}
    try:
        for f in FACTORS:
            sf_dir = replicate(spark, tmp, f)
            r: dict = {}
            t0 = time.time()
            e = graph_ops._edges(spark, sf_dir)  # the ONE shared build
            r["n_edges_thr2"] = e.count()
            r["build_sec"] = round(time.time() - t0, 3)
            for label, name in _OPS.items():
                t0 = time.time()
                n = len(REGISTRY[name].fn(spark, sf_dir).collect())
                r[f"{label}_sec"] = round(time.time() - t0, 3)
                r[f"{label}_rows"] = n
            results[f"x{f}"] = r
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ratios = {
        op: round(
            results["x16"][f"{op}_sec"] / max(results["x1"][f"{op}_sec"], 1e-9),
            2,
        )
        for op in list(_OPS) + ["build"]
    }
    out = {
        "metric": "graph_family_scaling_curve",
        "unit": "sec",
        "base": BASE,
        "results": results,
        "x16_over_x1_wall_ratio": ratios,
        "edge_growth": round(
            results["x16"]["n_edges_thr2"] / results["x1"]["n_edges_thr2"], 2
        ),
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench", "graph_scaling_results.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ("metric", "x16_over_x1_wall_ratio", "edge_growth")}))


if __name__ == "__main__":
    main()
