"""Scaling-curve experiment: do the dedup operators scale linearly in
input size, or is there a hidden quadratic term the fixtures are too
small to expose?

Replicates sf0.1 documents x1 / x4 / x16 (doc_ids shifted per replica so
dedup still has work to do: every replica is a new exact-duplicate of
the base corpus — the worst case for the pair-forming stages) and times

  exact     — q56-style md5 groupBy (expect ~linear)
  minhash   — near_dup_pairs, the xxhash64 production path (band shuffle
              + verify join; expect ~linear in docs while the duplicate
              RATE is constant — candidate pairs grow with replica
              count^2 per bucket, which is exactly what this probes)
  cc        — connected components over the found pairs (expect ~linear
              in edges, O(log n) rounds)
  chunk     — xh_chunk_dedup, 16-token chunk-granular substring dedup
              (expect ~linear in total chunks: the per-hash window costs
              O(group size log group size) and replication multiplies
              group sizes, which is exactly the term this probes)
  novelty   — xh_ngram_novelty (round 11), first-occurrence shingle
              novelty (expect ~linear: the min-agg state is one row per
              DISTINCT shingle — constant under replication — and the
              membership join output is linear in exploded shingles;
              replicas are the worst case, every shingle shared by all
              copies)
  cdc       — xh_cdc_dedup (round 12), content-defined chunk dedup
              (expect ~linear: chunking is a pure map, and replication
              multiplies per-chunk-hash group sizes — the per-hash
              window term this probes, same as `chunk`)
  pca       — xh_pca_power (round 12) over embeddings replicated with
              fresh vec_ids (expect ~linear: 3 fixed rounds, each one
              uniform vec_id agg + one 64-row agg; no term grows faster
              than rows)
  span      — xh_span_dedup (round 12), duplicated-span coverage
              (replicas make EVERY gram cross-doc-duplicated — the dup
              probe passes the whole corpus, the worst case for the
              per-doc interval-union window; expect ~linear: windows
              stay doc-length-bounded)
  winnow    — xh_winnow_fingerprint (round 12), winnowing fingerprints
              (expect ~linear: the window min is per-doc, and the
              fingerprint agg state is one row per DISTINCT fingerprint
              — constant under replication)

Prints one JSON line with wall seconds and the x16/x1 ratio per op
(linear => ~16, and the ratio column in bench/scaling_results.json is
what SCALE.md's claims are graded against).

Run: python bench_scaling.py   (env: SPARK_GRAFT_SCALING_BASE, default
/root/testdata/sf0.1)
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

from hadoop_copier_spark.operators.components import connected_components  # noqa: E402
from hadoop_copier_spark.operators.dedup import near_dup_pairs  # noqa: E402
from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SCALING_BASE", "/root/testdata/sf0.1")
FACTORS = (1, 4, 16)


def replicate(spark, out_dir: str, factor: int) -> str:
    d = spark.read.parquet(os.path.join(BASE, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = d.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = [
        d.select((F.col("doc_id") + F.lit(i * n)).alias("doc_id"), "text")
        for i in range(factor)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    # sf_dir layout (documents.parquet inside) so registry fns run as-is
    sf_dir = os.path.join(out_dir, f"x{factor}")
    path = os.path.join(sf_dir, "documents.parquet")
    out.repartition(max(4, factor * 4)).write.mode("overwrite").parquet(path)

    e = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    ne = e.agg(F.max("vec_id")).collect()[0][0] + 1
    ereps = [
        e.select((F.col("vec_id") + F.lit(i * ne)).alias("vec_id"), "embedding", "label")
        for i in range(factor)
    ]
    eout = ereps[0]
    for r in ereps[1:]:
        eout = eout.unionByName(r)
    eout.repartition(max(4, factor * 4)).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    return sf_dir


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix="hcs_scaling_")
    results = {}
    try:
        for f in FACTORS:
            sf_dir = replicate(spark, tmp, f)
            d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            n_docs = d.count()  # warm the page cache uniformly

            r = {"n_docs": n_docs}
            r["exact_sec"] = timed(
                lambda: d.groupBy(F.md5("text"))
                .agg(F.min("doc_id"))
                .agg(F.count(F.lit(1)))
                .collect()
            )
            pairs_holder = {}

            def run_minhash():
                p = near_dup_pairs(d, "doc_id", "text")
                pairs_holder["pairs"] = p
                pairs_holder["n"] = p.count()

            r["minhash_sec"] = timed(run_minhash)
            r["n_pairs"] = pairs_holder["n"]
            r["cc_sec"] = timed(
                lambda: connected_components(
                    pairs_holder["pairs"], src="id_a", dst="id_b"
                ).count()
            )
            r["chunk_sec"] = timed(
                lambda: REGISTRY["xh_chunk_dedup"].fn(spark, sf_dir).count()
            )
            r["novelty_sec"] = timed(
                lambda: REGISTRY["xh_ngram_novelty"].fn(spark, sf_dir).count()
            )
            r["cdc_sec"] = timed(
                lambda: REGISTRY["xh_cdc_dedup"].fn(spark, sf_dir).count()
            )
            r["pca_sec"] = timed(
                lambda: REGISTRY["xh_pca_power"].fn(spark, sf_dir).count()
            )
            r["span_sec"] = timed(
                lambda: REGISTRY["xh_span_dedup"].fn(spark, sf_dir).count()
            )
            r["winnow_sec"] = timed(
                lambda: REGISTRY["xh_winnow_fingerprint"].fn(spark, sf_dir).count()
            )
            results[f"x{f}"] = r
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    ratios = {
        op: round(results["x16"][f"{op}_sec"] / max(results["x1"][f"{op}_sec"], 1e-9), 2)
        for op in ("exact", "minhash", "cc", "chunk", "novelty", "cdc", "pca",
                   "span", "winnow")
    }
    print(
        json.dumps(
            {
                "metric": "dedup_scaling_curve",
                "unit": "sec",
                "base": BASE,
                "results": results,
                "x16_over_x1_wall_ratio": ratios,
                "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
