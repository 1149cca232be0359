"""Heavy-hitter scaling probe: does the Misra-Gries two-pass plan
(queries/text_index.py::xh_heavy_hitters) actually beat the exact
full-vocabulary aggregate once the token long tail is real?

The driver fixtures cannot show this — their documents draw from a
31-token vocabulary, so the "long tail" the sketch exists to avoid
shuffling is empty. This probe manufactures one: every sf0.1 document
gets TAIL extra tokens unique to that document, growing the distinct
vocabulary by docs x TAIL (31 / ~400k / ~2M distinct tokens at the
default TAILS of 0 / 80 / 400 over the ~5k-doc sf0.1 corpus) while the
head (the original 31 tokens) keeps its frequencies, so both plans
return the same heavy-hitter set (asserted per run).

  exact  — q57-shape full aggregate: EVERY distinct token crosses the
           shuffle, so its exchange grows with vocabulary.
  sketch — the registered two-pass plan: per-partition K-counter
           sketches emit O(parts x K) candidates; the long tail never
           leaves its partition.

Prints one JSON line and records bench/heavy_hitter_results.json —
the measured backing for SCALE.md's "the token long tail NEVER
shuffles" row. Since round 10 the proposal pass is Spark's JVM
``freqItems`` (treeAggregate of bounded counter maps; the r7-r9
mapInPandas sketch paid the Arrow/Python tax over every token and
lost to exact at every measured vocabulary). Measured now: the sketch
WINS once the long tail is real (tail80/tail400) and trails only on
the degenerate 31-token corpus, where two tiny jobs cost more than
one. The structural claim stands on top of that: per-partition sketch
state is K+1 counters and NOTHING vocabulary-sized ever shuffles,
where the exact plan's aggregate state and exchange grow with
distinct tokens — the property that matters when shingle-scale
vocabularies (~corpus size at 100 TB) exceed executor aggregate
memory.

Run: python bench_heavy_hitters.py  (env: SPARK_GRAFT_HH_BASE,
default /root/testdata/sf0.1)
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

from hadoop_copier_spark.queries import REGISTRY  # noqa: E402
from hadoop_copier_spark.queries.text_index import _tokens_col  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_HH_BASE", "/root/testdata/sf0.1")
TAILS = (0, 80, 400)  # unique-per-doc tokens appended => vocab ~ docs x tail


def build_corpus(spark, out_dir: str, tail: int) -> str:
    d = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    if tail:
        uniq = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(tail)),
                lambda i: F.concat(
                    F.lit("u"), F.col("doc_id").cast("string"), F.lit("_"), i.cast("string")
                ),
            ),
        )
        d = d.withColumn("text", F.concat_ws(" ", F.col("text"), uniq))
    sf_dir = os.path.join(out_dir, f"tail{tail}")
    d.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def exact_heavy_hitters(spark, sf_dir: str):
    """The sketch-free baseline: aggregate EVERY distinct token (the
    q57 shape), then apply the same >N/50 filter. Correct, but its
    shuffle carries the whole vocabulary."""
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    toks = d.select(F.explode(_tokens_col()).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * 50 > F.col("total"))
        .select("token", "cnt")
        .orderBy(F.col("cnt").desc(), "token")
    )


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 3), out


def main() -> None:
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="hh_bench_")
    results = {}
    try:
        for tail in TAILS:
            sf_dir = build_corpus(spark, tmp, tail)
            vocab = (
                spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
                .select(F.explode(_tokens_col()).alias("token"))
                .select("token")
                .distinct()
                .count()
            )
            ex_s, ex_rows = timed(
                lambda: [tuple(r) for r in exact_heavy_hitters(spark, sf_dir).collect()]
            )
            sk_s, sk_rows = timed(
                lambda: [
                    tuple(r)
                    for r in REGISTRY["xh_heavy_hitters"].fn(spark, sf_dir).collect()
                ]
            )
            # The two plans must agree ALWAYS; a non-empty set is only
            # guaranteed at tail=0 — growing the corpus dilutes the head
            # below the 1/50 frequency bar (correct semantics: heavy
            # hitters are relative, and the probe's subject is wall time
            # vs vocabulary, not result size).
            assert ex_rows == sk_rows, f"tail={tail}: sketch != exact"
            assert ex_rows or tail > 0, "tail=0 must have heavy hitters"
            results[f"tail{tail}"] = {
                "distinct_tokens": vocab,
                "n_heavy_hitters": len(ex_rows),
                "exact_sec": ex_s,
                "sketch_sec": sk_s,
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    line = {
        "metric": "heavy_hitter_scaling",
        "base": BASE,
        "results": results,
        "note": "same output asserted; exact shuffles the vocabulary, "
        "sketch shuffles O(partitions x 49) candidates",
    }
    print(json.dumps(line))
    with open(os.path.join(_REPO, "bench", "heavy_hitter_results.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
