"""Unified ANN strategy comparison — brute force vs sign-LSH vs IVF vs
PQ on the same corpus, same queries, same k: wall AND recall per
strategy, so the similarity-search scale path is chosen from data (the
bench_lsh_tuning.py discipline applied to the embedding side).

Ground truth = exact brute-force cosine top-k (cosine_topk — the q59
operator). Recall@k for each approximate strategy = mean over queries of
|approx top-k ∩ exact top-k| / k. Walls are a single timed pass after
one warm-up action (the bench.py protocol); the candidates frame is
augmented with planted 1.001-scaled near-duplicates of the query vectors
so every strategy faces the same must-find pairs (recall of the planted
set is reported separately — missing those is disqualifying, whatever
the random-neighbor recall says).

What the numbers decide: random 64-dim embeddings have near-orthogonal
neighbors, so mid recall on the random tail is EXPECTED for the pruning/
compression paths — the decision inputs are (planted-dup recall == 1.0),
wall, and the memory/shuffle story (LSH prunes buckets, IVF prunes
clusters, PQ cuts memory 32x and scores by table lookup; at 100 TB
IVF-PQ composes the last two).

Prints one JSON line and records bench/ann_results.json (cited from
SCALE.md). Run: python bench_ann.py
Env: SPARK_GRAFT_ANN_BASE (default /root/testdata/sf0.1),
     SPARK_GRAFT_ANN_NQ (query count, default 10).
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

from hadoop_copier_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_ann_topk,
    ivfpq_ann_topk,
    lsh_ann_topk,
    pq_ann_topk,
)
from hadoop_copier_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_ANN_BASE", "/root/testdata/sf0.1")
N_Q = int(os.environ.get("SPARK_GRAFT_ANN_NQ", "10"))
K = 5
PLANT_OFFSET = 1_000_000


def main() -> None:
    spark = get_spark()
    e = spark.read.parquet(os.path.join(BASE, "embeddings.parquet")).filter(
        F.col("embedding").isNotNull()
    )
    planted = e.filter(F.col("vec_id") < N_Q).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x.cast("double") * F.lit(1.001)).cast("float")
        ).alias("embedding"),
        "label",
    )
    cand = e.unionByName(planted).localCheckpoint(eager=True)
    n_cand = cand.count()
    queries = e.filter(F.col("vec_id") < N_Q).localCheckpoint(eager=True)
    queries.count()  # warm-up action (JVM + parquet footers already warm)

    strategies = {
        "brute": lambda: cosine_topk(cand, queries, k=K),
        "lsh": lambda: lsh_ann_topk(cand, queries, k=K),
        "ivf": lambda: ivf_ann_topk(cand, queries, k=K),
        "pq": lambda: pq_ann_topk(cand, queries, k=K),
        "ivfpq": lambda: ivfpq_ann_topk(cand, queries, k=K),
        # raw ADC (rerank_factor=0): no exact re-rank, so the recall
        # delta vs "pq"/"ivfpq" IS the measured compression loss
        # (ADVICE r16: the reranked default stopped recording it)
        "pq_raw_adc": lambda: pq_ann_topk(cand, queries, k=K, rerank_factor=0),
        "ivfpq_raw_adc": lambda: ivfpq_ann_topk(
            cand, queries, k=K, rerank_factor=0
        ),
    }
    tops, results = {}, {}
    for name, fn in strategies.items():
        t0 = time.monotonic()
        rows = fn().collect()
        wall = round(time.monotonic() - t0, 3)
        top = {}
        for r in rows:
            top.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        tops[name] = top
        results[name] = {"wall_sec": wall, "n_pairs": len(rows)}

    exact = tops["brute"]
    for name in strategies:
        top = tops[name]
        recalls = [
            len(exact[q] & top.get(q, set())) / len(exact[q])
            for q in exact
            if exact[q]
        ]
        planted_hits = sum(
            1 for q in range(N_Q) if (q + PLANT_OFFSET) in top.get(q, set())
        )
        results[name]["recall_at_k"] = round(sum(recalls) / len(recalls), 4)
        results[name]["planted_dup_recall"] = round(planted_hits / N_Q, 4)

    line = {
        "metric": "ann_strategy_comparison",
        "base": BASE,
        "n_candidates": n_cand,
        "n_queries": N_Q,
        "k": K,
        "strategies": results,
        "note": "recall vs exact brute-force cosine top-k; planted 1.001-"
        "scaled duplicates must be found by every strategy (disqualifying "
        "otherwise); random 64-dim tails are near-orthogonal so mid random-"
        "neighbor recall is expected for pruning/compression paths; "
        "*_raw_adc rows skip the exact re-rank (rerank_factor=0) so the "
        "recall delta vs the reranked rows is the pure PQ compression loss",
    }
    print(json.dumps(line))
    with open(os.path.join(_REPO, "bench", "ann_results.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
