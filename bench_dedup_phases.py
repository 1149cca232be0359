"""r19 §1 phase probe for the minhash/near-dup family (VERDICT r18 #3).

Isolates shingle build vs signature vs banding vs verify vs CC for
xh_minhash_lsh_pairs, xh_dedup_clusters, xh_multi_signal_dedup and
xp_minhash_neardup the way pagerank was isolated in r18.

    python bench_dedup_phases.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from hadoop_copier_spark.session import get_spark  # noqa: E402


def t(spark, label, thunk):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    out = thunk()
    dt = round(time.perf_counter() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:42s} {dt:7.3f}")
    return out, dt


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="hcs-dedup-phases", cpus=cpus, shuffle_partitions=int(cpus))
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    from pyspark.sql import functions as F  # noqa: E402

    from hadoop_copier_spark.queries.base import tbl  # noqa: E402
    from hadoop_copier_spark.queries.dedup_oracle import (  # noqa: E402
        _BANDS,
        _K,
        _shingle_hashes,
        _sig_col,
    )

    rec: dict = {}
    for rep in range(reps):
        print(f"== xh_minhash_lsh_pairs phases rep {rep}")
        d = tbl(spark, sf_dir, "documents")
        sh, dt_sh = t(spark, "lsh: shingle+md5+ckpt", lambda: _shingle_hashes(d).localCheckpoint(eager=True))
        sig = sh.select("doc_id", *[_sig_col(i) for i in range(_K)])
        _, dt_sig = t(spark, "lsh: signature (8x array_min) noop", lambda: sig.write.format("noop").mode("overwrite").save())
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.col(f"s{2 * b}").alias("h1"),
                    F.col(f"s{2 * b + 1}").alias("h2"),
                )
                for b in range(_BANDS)
            ]
        )
        bands = sig.select("doc_id", F.explode(band_structs).alias("bd")).select(
            "doc_id", "bd.band", "bd.h1", "bd.h2"
        )
        a, b = bands.alias("a"), bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.h1") == F.col("b.h1"))
                & (F.col("a.h2") == F.col("b.h2"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .distinct()
        )
        _, dt_cand = t(spark, "lsh: sig+bands+selfjoin+distinct noop", lambda: cand.write.format("noop").mode("overwrite").save())
        x = sh.select(F.col("doc_id").alias("id_a"), F.col("hs").alias("__ha"))
        y = sh.select(F.col("doc_id").alias("id_b"), F.col("hs").alias("__hb"))
        inter = F.size(F.array_intersect(F.col("__ha"), F.col("__hb")))
        union_ = F.size("__ha") + F.size("__hb") - inter
        full = (
            cand.join(x, "id_a")
            .join(y, "id_b")
            .filter(F.lit(10) * inter >= F.lit(7) * union_)
            .select("id_a", "id_b", inter.alias("inter_n"), union_.alias("union_n"))
            .orderBy("id_a", "id_b")
        )
        _, dt_full = t(spark, "lsh: + verify join + orderBy noop", lambda: full.write.format("noop").mode("overwrite").save())
        rec.setdefault("lsh", []).append(
            {"shingle": dt_sh, "sig": dt_sig, "cand_incl_sig": dt_cand, "full_incl_cand": dt_full}
        )
        sh.unpersist()

        print(f"== xh_dedup_clusters phases rep {rep}")
        from hadoop_copier_spark.operators.dedup import window_jaccard_pairs  # noqa: E402
        from hadoop_copier_spark.operators.components import dedup_clusters  # noqa: E402

        d2 = tbl(spark, sf_dir, "documents")
        pairs = window_jaccard_pairs(d2, "doc_id", "text", offsets=(1, 2), threshold=0.7)
        _, dt_pairs = t(spark, "dc: window_jaccard_pairs noop", lambda: pairs.write.format("noop").mode("overwrite").save())
        stats: dict = {}
        cl, dt_cc = t(spark, "dc: dedup_clusters (CC) full", lambda: dedup_clusters(
            window_jaccard_pairs(d2, "doc_id", "text", offsets=(1, 2), threshold=0.7),
            nodes=d2.select("doc_id"), stats=stats).count())
        rec.setdefault("dc", []).append({"pairs": dt_pairs, "cc_total_incl_pairs": dt_cc, "rounds": stats.get("rounds")})

        print(f"== CC-only on a fixed tiny pair set rep {rep}")
        from hadoop_copier_spark.operators.components import connected_components  # noqa: E402

        edges = pairs.localCheckpoint(eager=True)
        stats2: dict = {}
        _, dt_cconly = t(spark, "cc: connected_components only", lambda: connected_components(
            edges, src="id_a", dst="id_b", nodes=d2.select("doc_id"), stats=stats2).count())
        rec.setdefault("cc_only", []).append({"cc": dt_cconly, "rounds": stats2.get("rounds"),
                                              "n_edges_sym": stats2.get("n_edges_sym"),
                                              "n_nodes": stats2.get("n_nodes")})

        print(f"== xp_minhash_neardup phases rep {rep}")
        from hadoop_copier_spark.operators.dedup import (  # noqa: E402
            lsh_candidate_pairs,
            minhash_signature,
            shingle_hashes,
        )

        d3 = tbl(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
        hashed, dt_h = t(spark, "mn: shingle_hashes persist+count", lambda: (
            shingle_hashes(d3.select("doc_id", "text"), "text", n=3)
            .select("doc_id", "__shingle_hashes").persist()))
        _, dt_hc = t(spark, "mn: materialize persist (count)", lambda: hashed.count())
        sigs = minhash_signature(hashed, k=32)
        _, dt_s = t(spark, "mn: +signature (pandas UDF) noop", lambda: sigs.write.format("noop").mode("overwrite").save())
        cands = lsh_candidate_pairs(sigs, "doc_id", bands=8, k=32)
        _, dt_c = t(spark, "mn: +bands+selfjoin+distinct noop", lambda: cands.write.format("noop").mode("overwrite").save())
        rec.setdefault("mn", []).append({"persist_build": dt_h, "count": dt_hc, "sig_noop": dt_s, "cand_noop": dt_c})
        hashed.unpersist()

    with open(os.path.join(_REPO, "bench", "dedup_phase_probe.json"), "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
