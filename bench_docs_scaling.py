"""Documents-corpus scaling probe (VERDICT r14 #2): every organic
probe-fire demonstration so far scaled lineitem/orders; the text-stats
family's width probes and vocabulary-bounded claims had only
forced-boundary pytest coverage. This probe synthesizes a documents
corpus with a REALISTIC Heaps-law vocabulary and scales it x16/x64
(plus a x640 guard-fire run), measuring the seven text-stats operators
organically:

  xh_zipf_fit, xh_chi2_tokens, xh_kappa_langid, xh_token_burstiness,
  xh_coverage_curve, xh_good_turing, xh_vocab_growth

Generator: token ranks are LOG-UNIFORM over a 2M-slot virtual
vocabulary (exp(u * ln(V)) for uniform u), which yields Zipf(s~1)
frequencies — and therefore Heaps-law distinct-type growth (vocab ~
N^beta) — from pure JVM-side expressions (xxhash64-seeded, fully
deterministic, no Python in the row loop). Doc lengths 20-59 tokens;
4 langs / 5 sources hash-assigned.

Per factor it records:
  n_docs / n_token_occurrences / n_vocab  — corpus vs TYPE growth (the
      Heaps curve the "vocabulary-bounded" claims lean on)
  per op: wall_sec, n_rows (output cardinality — the frames claimed
      vocabulary- or level-bounded must grow with types/levels, never
      with occurrences)
plus whether the coded width probes fire:
  _CHI2_MAX_DOCS (xh_chi2_tokens count-probe guard, 3M docs): does NOT
      fire at x64 (320k docs) — honestly recorded — and the x640 run
      (3.2M short docs) fires it ORGANICALLY: the op must raise with
      the knob named rather than silently wrap (the r14 lineitem x64
      probe-fire discipline, bench_probe_fire_x64.py).

Prints one JSON line and writes bench/docs_scaling_results.json — the
measured backing for SCALE.md's text-stats paragraph.

Run: python bench_docs_scaling.py   (env: SPARK_GRAFT_DOCS_FACTORS,
default "1,16,64"; SPARK_GRAFT_DOCS_BASE_ROWS, default 5000 = the sf0.1
documents cardinality; set SPARK_GRAFT_DOCS_GUARD_FIRE=0 to skip the
x640 chi2 guard-fire run)
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

_REPO = os.path.dirname(os.path.abspath(__file__))
BASE_ROWS = int(os.environ.get("SPARK_GRAFT_DOCS_BASE_ROWS", "5000"))
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_DOCS_FACTORS", "1,16,64").split(",")
]
GUARD_FIRE = os.environ.get("SPARK_GRAFT_DOCS_GUARD_FIRE", "1") != "0"

_V_MAX = 2_000_000  # virtual vocabulary ceiling (log-uniform rank draw)
_SEED = 2024

_OPS = [
    "xh_zipf_fit",
    "xh_chi2_tokens",
    "xh_kappa_langid",
    "xh_token_burstiness",
    "xh_coverage_curve",
    "xh_good_turing",
    "xh_vocab_growth",
]


def synth_docs(spark, out_dir: str, n_docs: int, min_len: int = 20,
               len_spread: int = 40) -> str:
    """Write a deterministic Heaps-law documents.parquet under out_dir."""
    # 1e-9 u-granularity: coarser grids quantize the high-rank tail and
    # cap distinct types (~300k at 1e-6, measured) — at 1e-9 every rank
    # in [1, V_MAX] is reachable and the draw is true Zipf(1)
    rank = (
        f"CAST(exp((pmod(xxhash64(doc_id, i, {_SEED}), 1000000000)"
        f" / 1000000000.0) * ln({_V_MAX})) AS BIGINT)"
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            (F.pmod(F.xxhash64("id", F.lit(_SEED)), F.lit(len_spread))
             + min_len).alias("__len"),
        )
        .select(
            "doc_id",
            F.expr(
                "concat_ws(' ', transform(sequence(1, CAST(__len AS INT)),"
                f" i -> concat('tok', {rank})))"
            ).alias("text"),
            F.expr(
                "element_at(array('en','de','fr','es'),"
                f" CAST(pmod(xxhash64(doc_id, 7, {_SEED}), 4) AS INT) + 1)"
            ).alias("lang"),
            F.expr(
                "element_at(array('web','wiki','books','code','news'),"
                f" CAST(pmod(xxhash64(doc_id, 11, {_SEED}), 5) AS INT) + 1)"
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    return out_dir


def corpus_stats(spark, sf_dir: str) -> dict:
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = d.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("t")
    ).where(F.col("t") != "")
    row = toks.agg(
        F.count(F.lit(1)).alias("occ"),
        F.countDistinct("t").alias("vocab"),
    ).collect()[0]
    return {
        "n_docs": d.count(),
        "n_token_occurrences": int(row["occ"]),
        "n_vocab": int(row["vocab"]),
    }


def run_one(spark, name: str, sf_dir: str) -> dict:
    t0 = time.monotonic()
    rows = REGISTRY[name].fn(spark, sf_dir).collect()
    return {"wall_sec": round(time.monotonic() - t0, 3), "n_rows": len(rows)}


def main() -> None:
    spark = get_spark()
    from hadoop_copier_spark.queries import quality_checks as qc

    tmp = tempfile.mkdtemp(prefix="docs_scaling_")
    results: dict = {}
    try:
        for f in FACTORS:
            sf_dir = synth_docs(
                spark, os.path.join(tmp, f"x{f}"), BASE_ROWS * f
            )
            r = corpus_stats(spark, sf_dir)
            for name in _OPS:
                r[name] = run_one(spark, name, sf_dir)
            results[f"x{f}"] = r

        probes: dict = {
            "chi2_max_docs_bound": qc._CHI2_MAX_DOCS,
            "chi2_guard_fires_at_max_factor": (
                BASE_ROWS * max(FACTORS) > qc._CHI2_MAX_DOCS
            ),
        }
        if GUARD_FIRE:
            # x640: 3.2M SHORT docs (the guard trips at the O(1) count
            # probe, before any token work — cheap to demonstrate)
            fire_dir = synth_docs(
                spark, os.path.join(tmp, "x640"), BASE_ROWS * 640,
                min_len=8, len_spread=8,
            )
            fired, msg = False, ""
            try:
                REGISTRY["xh_chi2_tokens"].fn(spark, fire_dir).collect()
            except ValueError as ex:
                fired, msg = True, str(ex)[:200]
            probes["chi2_guard_fire_x640"] = {
                "n_docs": BASE_ROWS * 640,
                "fired": fired,
                "knob_named_in_error": "_CHI2_MAX_DOCS" in msg,
                "error": msg,
            }
            # the other six ops must still RUN at 3.2M docs (their width
            # is unconditionally 128-bit, no guard) — smoke the two
            # vocabulary-bounded r14 adds organically past the chi2 bound
            for name in ("xh_good_turing", "xh_coverage_curve"):
                probes[f"{name}_at_x640"] = run_one(spark, name, fire_dir)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    line = {
        "metric": "docs_corpus_scaling",
        "base_rows": BASE_ROWS,
        "factors": FACTORS,
        "v_max": _V_MAX,
        "results": results,
        "probes": probes,
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
        "note": "synthetic Heaps-law corpus (log-uniform ranks => Zipf "
        "frequencies); vocabulary-bounded ops must grow output/exchange "
        "with TYPES, not occurrences; chi2 guard fires organically at "
        "x640 (3.2M docs > _CHI2_MAX_DOCS)",
    }
    print(json.dumps(line))
    os.makedirs(os.path.join(_REPO, "bench"), exist_ok=True)
    with open(
        os.path.join(_REPO, "bench", "docs_scaling_results.json"), "w"
    ) as fh:
        json.dump(line, fh, indent=1)


if __name__ == "__main__":
    main()
