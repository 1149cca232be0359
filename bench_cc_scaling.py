"""Connected-components scaling probe (VERDICT r17 #6): put numbers on
the two claims xh_multi_signal_dedup / xh_dedup_clusters make in prose —
(a) the pointer-jumping CC converges in O(log diameter) ROUNDS, and
(b) under corpus replication the consolidation's cost follows its EDGE
volume, with per-round exchange sizes recorded, not asserted.

Part A — replication sweep (the er_scaling/graph_scaling precedent):
documents replicated x{1,4,16} verbatim with shifted doc_ids (the
make_sf1.py discipline — every replica is an exact dup of its source,
so content groups grow linearly with scale and the LSH band buckets
quadratically: the worst case for the near-dup detector feeding the
CC). Per scale we record the full xh_multi_signal_dedup wall (the
judged query, black-box) plus the CC's own instrumentation via the
stats hook (operators/components.py): symmetrized edge count, node
count, rounds, and the per-round changed-label exchange trail. The
edge build is the SAME code path as production (_multi_signal_edges,
factored for this probe).

Part B — diameter sweep (the O(log d) demonstration): planted path
graphs of diameter {15, 255, 4095} nodes (edges i—i+1, min label at
one end — the pathological chain the operator's docstring cites).
Plain Hash-Min propagation needs d rounds; the recorded rounds grow
logarithmically (the double pointer-jump shrinks label-chain depth
~4x per round while the neighbor step extends the frontier), so the
artifact shows rounds ~ log d with data.

Prints one JSON line; records bench/cc_scaling_results.json (cited
from SCALE.md). Run: python bench_cc_scaling.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CC_SCALES (default "1,4,16"),
     SPARK_GRAFT_CC_DIAMETERS (default "15,255,4095").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from hadoop_copier_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [
    int(s) for s in os.environ.get("SPARK_GRAFT_CC_SCALES", "1,4,16").split(",")
]
DIAMETERS = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_CC_DIAMETERS", "15,255,4095").split(",")
]


def replicate_documents(spark, src_dir: str, out_dir: str, n: int) -> str:
    """Write documents.parquet replicated x n with shifted doc_ids
    (text verbatim — replicas are exact dups of their source)."""
    d = spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    if n > 1:
        shift = d.agg(F.max("doc_id")).first()[0] + 1
        out = d
        for i in range(1, n):
            out = out.unionByName(
                d.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
            )
        d = out
    d.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return out_dir


def main() -> None:
    spark = get_spark(app_name="hcs-cc-scaling")
    from hadoop_copier_spark.operators.components import (
        connected_components,
        dedup_clusters,
        release_local_checkpoint,
    )
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.queries.dedup_oracle import _multi_signal_edges

    record: dict = {
        "metric": "cc_scaling",
        "sf_dir": SF_DIR,
        "replication": [],
        "diameter": [],
    }

    # ---- Part A: replication sweep over the production edge set ----
    tmp_root = tempfile.mkdtemp(prefix="hcs_cc_scaling_")
    try:
        for n in SCALES:
            sf_dir = (
                SF_DIR
                if n == 1
                else replicate_documents(
                    spark, SF_DIR, os.path.join(tmp_root, f"x{n}"), n
                )
            )
            # black-box wall of the judged query (includes edge build,
            # CC, provenance flags)
            t0 = time.perf_counter()
            n_rows = REGISTRY["xh_multi_signal_dedup"].fn(spark, sf_dir).count()
            wall_full = time.perf_counter() - t0
            # instrumented CC over the same production edge set
            chg, near, pairs = _multi_signal_edges(spark, sf_dir)
            n_pairs = pairs.count()
            stats: dict = {}
            t0 = time.perf_counter()
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            labels = dedup_clusters(
                pairs, nodes=docs.select("doc_id"), stats=stats
            )
            n_clusters = labels.select("cluster_id").distinct().count()
            wall_cc = time.perf_counter() - t0
            release_local_checkpoint(chg)
            release_local_checkpoint(near)
            row = {
                "x_scale": n,
                "n_docs": docs.count(),
                "n_edge_pairs": n_pairs,
                "n_clusters": n_clusters,
                "n_result_rows": n_rows,
                "wall_full_query_sec": round(wall_full, 3),
                "wall_cc_only_sec": round(wall_cc, 3),
                **stats,
            }
            record["replication"].append(row)
            print(json.dumps(row), file=sys.stderr)
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)

    # ---- Part B: planted path graphs, rounds vs diameter ----
    for d in DIAMETERS:
        edges = spark.range(d).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        stats = {}
        t0 = time.perf_counter()
        labels = connected_components(edges, stats=stats)
        ok = (
            labels.agg(
                F.count(F.lit(1)).alias("n"), F.sum("comp").alias("s")
            ).first()
        )
        wall = time.perf_counter() - t0
        release_local_checkpoint(labels)
        row = {
            "diameter": d,
            "n_nodes": int(ok["n"]),
            "all_labels_zero": int(ok["s"]) == 0,  # one chain, min id 0
            "naive_rounds_would_be": d,
            **stats,
        }
        del row["changed_per_round"]  # d+1 ints of trail: keep the file small
        record["diameter"].append(row)
        print(json.dumps(row), file=sys.stderr)

    record["loadavg_1m_5m_15m"] = [round(x, 2) for x in os.getloadavg()]
    with open(os.path.join(_REPO, "bench", "cc_scaling_results.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({k: v for k, v in record.items() if k != "sf_dir"}))


if __name__ == "__main__":
    main()
