"""r19 CC restructure prototypes (guide §2.4): measure exchange-count
variants of connected_components on the xh_dedup_clusters pair set.

V0 current: nbr join + left-join fixup + 2 pointer jumps.
V1 self-edge fold: (u,u) rows in sym make min-over-neighbors include the
   self label, removing the per-round left join.
V2 V1 + sym pre-partitioned on v + labels re-partitioned on node per
   round (stepped join plans zero exchanges for both sides).
V3 V2 with 1 pointer jump per round instead of 2.

    python bench_cc_variants.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hadoop_copier_spark.operators.components import (  # noqa: E402
    connected_components,
    release_local_checkpoint,
)
from hadoop_copier_spark.session import get_spark  # noqa: E402


def cc_variant(edges, nodes=None, jumps=2, prepartition=False, max_iter=50):
    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    lab = sym.select("u")
    if nodes is not None:
        lab = lab.union(nodes.select(F.col(nodes.columns[0]).alias("u")))
    verts = lab.distinct().localCheckpoint(eager=False)
    sym_all = sym.unionByName(verts.select("u", F.col("u").alias("v")))
    if prepartition:
        sym_all = sym_all.repartition(n_parts, "v")
    sym_all = sym_all.localCheckpoint(eager=False)
    labels = verts.select(F.col("u").alias("node"), F.col("u").alias("comp"))
    if prepartition:
        labels = labels.repartition(n_parts, "node")
    labels = labels.localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
    rounds = 0
    for _ in range(max_iter):
        stepped = (
            sym_all.join(labels, sym_all.v == labels.node)
            .groupBy("u")
            .agg(F.min("comp").alias("comp"))
            .withColumnRenamed("u", "node")
        )
        jumped = stepped
        for _ in range(jumps):
            hop = jumped.select(F.col("node").alias("cnode"), F.col("comp").alias("ccomp"))
            jumped = jumped.join(hop, jumped.comp == hop.cnode, "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("ccomp"), F.col("comp"))).alias("comp"),
            )
        if prepartition:
            jumped = jumped.repartition(n_parts, "node")
        jumped = jumped.localCheckpoint(eager=False)
        cur_sum = jumped.agg(F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")).collect()[0]["s"]
        superseded = labels
        labels = jumped
        release_local_checkpoint(superseded)
        rounds += 1
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    release_local_checkpoint(sym_all)
    return labels, rounds


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="hcs-cc-var", cpus=cpus, shuffle_partitions=int(cpus))
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from hadoop_copier_spark.operators.dedup import window_jaccard_pairs  # noqa: E402
    from hadoop_copier_spark.queries.base import tbl  # noqa: E402

    d = tbl(spark, sf_dir, "documents")
    pairs = window_jaccard_pairs(d, "doc_id", "text", offsets=(1, 2), threshold=0.7).localCheckpoint(eager=True)
    nodes = d.select("doc_id").localCheckpoint(eager=True)

    # correctness: all variants must equal V0's fixpoint
    base = {
        (r["node"], r["comp"])
        for r in connected_components(pairs, src="id_a", dst="id_b", nodes=nodes).collect()
    }
    for name, kw in [("V1", dict(jumps=2, prepartition=False)),
                     ("V2", dict(jumps=2, prepartition=True)),
                     ("V3", dict(jumps=1, prepartition=True)),
                     ("V4", dict(jumps=1, prepartition=False))]:
        out, rnds = cc_variant(pairs, nodes=nodes, **kw)
        got = {(r["node"], r["comp"]) for r in out.collect()}
        assert got == base, f"{name} labels differ!"
        print(f"{name}: labels identical, rounds={rnds}")

    res: dict = {}
    for rep in range(reps):
        t0 = time.perf_counter()
        connected_components(pairs, src="id_a", dst="id_b", nodes=nodes).count()
        res.setdefault("V0", []).append(round(time.perf_counter() - t0, 3))
        for name, kw in [("V1", dict(jumps=2, prepartition=False)),
                         ("V2", dict(jumps=2, prepartition=True)),
                         ("V3", dict(jumps=1, prepartition=True)),
                         ("V4", dict(jumps=1, prepartition=False))]:
            t0 = time.perf_counter()
            out, rnds = cc_variant(pairs, nodes=nodes, **kw)
            out.count()
            res.setdefault(name, []).append(round(time.perf_counter() - t0, 3))
            res[name + "_rounds"] = rnds
    print(json.dumps(res))
    with open(os.path.join(_REPO, "bench", "cc_variant_probe.json"), "a") as f:
        f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
