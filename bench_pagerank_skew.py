"""Planted hot-src probe for the pagerank link build (VERDICT r18 #5).

The r18 link build computes out-degree via a window over
partitionBy(src) on the (real ∪ self)-edge union — 1 exchange where the
old groupBy(deg)+join+repartition spelling used 3 — but a window
partition buffers the WHOLE hot src's edge list in one task's
spill-backed sorter, where the old groupBy had map-side partial
aggregation (the repartition("src") step of the old build concentrated
the same rows in one partition, but STREAMED them rather than buffering
a sort). This probe plants a celebrity src at k x the mean out-degree
and measures both builds' wall at each k, so the 100 TB claim rests on
numbers, not prose.

  base graph: 2M edges, 100k srcs (mean out-degree 20)
  hot src 0:  degree = 20 * k for k in (1, 4, 16, 64, 1024, 25000)
              (25000 => 500k-edge celebrity, 12.5% of the base graph)

Run: python bench_pagerank_skew.py   -> bench/pagerank_skew_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from hadoop_copier_spark.session import get_spark  # noqa: E402

N_EDGES = int(float(os.environ.get("SPARK_GRAFT_PRSKEW_EDGES", "2e6")))
N_SRC = 100_000
MEAN_DEG = N_EDGES // N_SRC


def build_edges(spark, k: int):
    """Uniform base graph + a planted hot src 0 with degree MEAN_DEG * k
    (the base graph already gives src 0 its MEAN_DEG share, so plant the
    excess). Eagerly checkpointed so both variants read identical rows."""
    base = spark.range(N_EDGES).select(
        F.pmod(F.xxhash64("id"), F.lit(N_SRC)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_SRC)).alias("dst"),
    )
    extra = MEAN_DEG * (k - 1)
    if extra > 0:
        hot = spark.range(extra).select(
            F.lit(0).cast("long").alias("src"),
            # distinct dst per planted edge (offset past the base id space
            # so the planted edges can't collide away in the distinct)
            (F.col("id") + F.lit(N_SRC)).alias("dst"),
        )
        base = base.unionByName(hot)
    e = base.distinct().localCheckpoint(eager=True)
    vert = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    return e, vert


def links_window(e, vert):
    """The r18 spelling (operators/pagerank.py links build)."""
    w_src = Window.partitionBy("src")
    return (
        e.select("src", "dst", F.lit(1).alias("is_edge"))
        .union(
            vert.select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0).alias("is_edge"),
            )
        )
        .withColumn("outdeg", F.sum("is_edge").over(w_src))
        .select(
            "src",
            "dst",
            F.when(F.col("is_edge") == 1, F.lit(1.0) / F.col("outdeg"))
            .otherwise(F.lit(0.0))
            .alias("inv_deg"),
            F.when(F.col("is_edge") == 0, F.col("outdeg") > 0).alias("dst_has_out"),
        )
    )


def links_groupby(e, vert):
    """The pre-r18 spelling: groupBy out-degree (map-side partial agg) +
    join + repartition(src), extended with the r18 dst_has_out flag so
    both variants produce the same schema."""
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    return (
        e.join(deg, "src")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("outdeg")).alias("inv_deg"),
            F.lit(None).cast("boolean").alias("dst_has_out"),
        )
        .union(
            vert.join(deg.select(F.col("src").alias("node"), "outdeg"), "node", "left")
            .select(
                F.col("node").alias("src"),
                F.col("node").alias("dst"),
                F.lit(0.0).alias("inv_deg"),
                (F.coalesce(F.col("outdeg"), F.lit(0)) > 0).alias("dst_has_out"),
            )
        )
        .repartition("src")
    )


def main() -> None:
    spark = get_spark(
        app_name="hcs-pr-skew",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    results = []
    for k in (1, 4, 16, 64, 1024, 25000):
        e, vert = build_edges(spark, k)
        hot_deg = e.where(F.col("src") == 0).count()
        rec = {"k": k, "hot_out_degree": hot_deg, "n_edges": e.count()}
        for tag, fn in (("window", links_window), ("groupby", links_groupby)):
            walls = []
            for _ in range(3):
                spark.sparkContext.setJobDescription(f"links {tag} k={k}")
                t0 = time.perf_counter()
                out = fn(e, vert).localCheckpoint(eager=True)
                walls.append(round(time.perf_counter() - t0, 3))
                out._jdf.queryExecution().analyzed().rdd().unpersist(False)
            rec[tag + "_walls"] = walls
            rec[tag + "_min"] = min(walls)
        spark.sparkContext.setJobDescription(None)
        for f in (e, vert):
            f._jdf.queryExecution().analyzed().rdd().unpersist(False)
        rec["window_over_groupby"] = round(rec["window_min"] / rec["groupby_min"], 2)
        results.append(rec)
        print(json.dumps(rec))
    with open(os.path.join(_REPO, "bench", "pagerank_skew_results.json"), "w") as f:
        json.dump({"n_edges_base": N_EDGES, "n_src": N_SRC, "mean_deg": MEAN_DEG,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
