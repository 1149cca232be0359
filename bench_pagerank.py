"""Measure xp_pagerank's two execution modes on the fixture graph at
sf0.1 (customer<->supplier bipartite from orders x lineitem, ~1.2M
directed edges): per-round-probe mode (tol>0: one Spark action per
round, needed for convergence-driven runs) vs fixed-budget fused mode
(tol=0: all rounds lazy, ONE materialization job — what the registry
entry runs). Writes bench/pagerank_results.json.
"""

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_edges(spark, sf_dir):
    from hadoop_copier_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = o.join(li, o.o_orderkey == li.l_orderkey).select(
        (F.col("o_custkey") + F.lit(1_000_000_000)).alias("cust_node"),
        F.col("l_suppkey").alias("supp_node"),
    )
    return pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).union(
        pairs.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst"))
    )


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("bench_pagerank")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hadoop_copier_spark.operators.pagerank import pagerank

    results = {"sf_dir": SF_DIR, "cpus": int(CPUS), "rounds": 8}
    # warm the session/JIT once
    pagerank(build_edges(spark, SF_DIR), max_iter=2, tol=0.0).count()
    for label, tol in (("probe_per_round", 1e-12), ("fixed_budget_fused", 0.0)):
        t0 = time.time()
        top = (
            pagerank(build_edges(spark, SF_DIR), max_iter=8, tol=tol)
            .orderBy(F.col("rank").desc(), "node")
            .limit(50)
        )
        rows = top.collect()
        results[label] = {"wall_sec": round(time.time() - t0, 3), "rows": len(rows)}
        results.setdefault("top1", {})[label] = {
            "node": rows[0]["node"],
            "rank": round(rows[0]["rank"], 9),
        }
    os.makedirs("bench", exist_ok=True)
    with open("bench/pagerank_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
