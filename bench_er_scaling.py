"""Entity-resolution blocking scaling probe (VERDICT r16 #5): replicate
the part table x{1,4,16} and measure, per blocking strategy, the
candidate-pair volume each pass proposes and the wall of the full
block->banded-verify->distinct->profile pass — demonstrating the
block-size control knob xh_fuzzy_match's docstring promises ("add
tokens to the key to tighten it").

Replication follows the make_sf1.py discipline: replica i shifts
p_partkey by i*(max_key+1) and keeps names VERBATIM, so duplicate
classes (blocks) grow linearly with scale and the within-block
quadratic term grows with scale^2 — the worst case for a blocked
matcher, which is the point: the probe records how each key bounds it.

Strategies:
  * 1tok (production until r17): (brand, first name token) UNION
    (brand, last token) — high recall, block size ~ brand x token
    frequency. Production since r18 is PassJoin + exact-group collapse
    (bench_er_tuning.py decision rule; VERDICT r17 #3), recorded here
    as a third per-scale row — its fuzzy join sees only distinct
    (name, brand) reps, so candidate volume is FLAT under replication.
  * 2tok (the tightening knob): (brand, tokens 1+2) UNION (brand, last
    two tokens) — each pass's key gains a token, cutting expected
    block size by the second token's selectivity (~8x on TPC-H names);
    recall cost shows up as the verified-pair delta, also recorded.

Candidate volume per pass is computed as sum(C(block_size, 2)) via one
groupBy — no join materialization — so the recorded volume is exact
even at scales where materializing candidates would dominate the wall.

Prints one JSON line; records bench/er_scaling_results.json (cited from
SCALE.md). Run: python bench_er_scaling.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_ER_SCALES (default "1,4,16").
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hadoop_copier_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [
    int(s) for s in os.environ.get("SPARK_GRAFT_ER_SCALES", "1,4,16").split(",")
]
_MAX_LV = 2  # the xh_fuzzy_match verify threshold


def replicate(p: DataFrame, n: int) -> DataFrame:
    if n <= 1:
        return p
    shift = p.agg(F.max("k")).first()[0] + 1
    out = p
    for i in range(1, n):
        out = out.unionByName(
            p.withColumn("k", F.col("k") + F.lit(i * shift))
        )
    return out


def strategy_passes(name: str):
    """[(key_cols...)] per pass; all passes always include brand."""
    if name == "1tok":
        return [("w1",), ("w2",)]
    return [("w1", "wsecond"), ("wpen", "w2")]


def main() -> None:
    spark = get_spark(app_name="hcs-er-scaling")
    base = (
        spark.read.parquet(os.path.join(SF_DIR, "part.parquet"))
        .select(
            F.col("p_partkey").alias("k"),
            F.col("p_name").alias("nm"),
            F.col("p_brand").alias("br"),
            F.element_at(F.split("p_name", " "), 1).alias("w1"),
            F.element_at(F.split("p_name", " "), 2).alias("wsecond"),
            F.element_at(F.split("p_name", " "), -2).alias("wpen"),
            F.element_at(F.split("p_name", " "), -1).alias("w2"),
        )
    )
    results = []
    for scale in SCALES:
        p = replicate(base, scale).localCheckpoint(eager=True)
        n_rows = p.count()
        for strat in ("1tok", "2tok"):
            passes = strategy_passes(strat)
            # exact candidate volume per pass, via block sizes (one
            # groupBy per pass; no pair materialization)
            volumes = []
            for cols in passes:
                c = (
                    p.groupBy("br", *cols)
                    .agg(F.count(F.lit(1)).alias("c"))
                    .agg(
                        F.sum(
                            (F.col("c") * (F.col("c") - 1) / 2).cast("long")
                        ).alias("pairs"),
                        F.max("c").alias("max_block"),
                    )
                    .first()
                )
                volumes.append(
                    {
                        "key": "brand+" + "+".join(cols),
                        "n_candidate_pairs": int(c["pairs"] or 0),
                        "max_block_rows": int(c["max_block"] or 0),
                    }
                )
            # full pass: block join -> banded verify -> cross-pass
            # distinct -> (brand, lv) profile (the xh_fuzzy_match plan)
            t0 = time.monotonic()

            def pass_on(cols):
                a = p.select(
                    F.col("k").alias("key_a"),
                    F.col("nm").alias("nm_a"),
                    "br",
                    *[F.col(c).alias(f"blk_{c}") for c in cols],
                )
                b = p.select(
                    F.col("k").alias("key_b"),
                    F.col("nm").alias("nm_b"),
                    F.col("br").alias("br_b"),
                    *[F.col(c).alias(f"blkb_{c}") for c in cols],
                )
                cond = (F.col("br") == F.col("br_b")) & (
                    F.col("key_a") < F.col("key_b")
                )
                for c in cols:
                    cond = cond & (F.col(f"blk_{c}") == F.col(f"blkb_{c}"))
                return (
                    a.join(b, cond)
                    .withColumn(
                        "lv", F.levenshtein("nm_a", "nm_b", _MAX_LV).cast("bigint")
                    )
                    .filter(F.col("lv") >= 0)
                    .select("key_a", "key_b", "br", "lv")
                )

            cand = pass_on(passes[0]).unionByName(pass_on(passes[1])).distinct()
            n_verified = cand.count()
            wall = round(time.monotonic() - t0, 3)
            results.append(
                {
                    "scale": scale,
                    "n_rows": n_rows,
                    "strategy": strat,
                    "passes": volumes,
                    "total_candidate_pairs": sum(
                        v["n_candidate_pairs"] for v in volumes
                    ),
                    "n_verified_pairs": n_verified,
                    "wall_sec": wall,
                }
            )
            print(json.dumps(results[-1]), file=sys.stderr)

        # production since round 18 (VERDICT r17 #3): exact-group
        # COLLAPSE + PassJoin segment blocking — the replication
        # quadratic vanishes because the fuzzy join runs over DISTINCT
        # (name, brand) reps only; verified pairs are weighted g_a*g_b
        from hadoop_copier_spark.queries.entity_resolution import (
            passjoin_candidates,
        )

        t0 = time.monotonic()
        groups = p.groupBy("nm", "br").agg(F.count(F.lit(1)).alias("g"))
        reps = groups.select(F.xxhash64("nm", "br").alias("k"), "nm", "br")
        n_reps = reps.count()
        raw = passjoin_candidates(reps, raw=True)
        n_raw = raw.count()
        verified = (
            raw.withColumn(
                "lv", F.levenshtein("nm_a", "nm_b", _MAX_LV).cast("bigint")
            )
            .filter(F.col("lv") >= 1)
            .select("key_a", "key_b", "br", "lv")
            .distinct()
        )
        n_verified = verified.count()
        wall = round(time.monotonic() - t0, 3)
        results.append(
            {
                "scale": scale,
                "n_rows": n_rows,
                "strategy": "passjoin+collapse (production r18)",
                "n_distinct_reps": n_reps,
                "passes": [
                    {
                        "key": "brand+segment_j+content+partner_len over "
                        "distinct (name, brand) reps",
                        "n_candidate_pairs": n_raw,
                    }
                ],
                "total_candidate_pairs": n_raw,
                "n_verified_pairs": n_verified,
                "wall_sec": wall,
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    line = {
        "metric": "er_blocking_scaling",
        "sf_dir": SF_DIR,
        "verify_threshold_lv": _MAX_LV,
        "replication": "key-shifted copies, names verbatim (make_sf1.py "
        "discipline): blocks grow ~linearly with scale, within-block "
        "candidates ~quadratically — worst case for a blocked matcher",
        "results": results,
    }
    print(json.dumps(line))
    with open(os.path.join(_REPO, "bench", "er_scaling_results.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
