"""TPC-H-analog scaling probe (VERDICT r13 #6): no sf>=0.1 fixtures exist
in this container, so the 22-analog join suite has never run past sf0.1.
This probe synthesizes a CONSISTENT x16 star schema from the sf0.1
fixtures (the bench_scaling.py replication discipline, extended to keyed
facts): replica i shifts every key family by i * max_key — orderkeys,
partkeys, suppkeys, custkeys — so replicas reference their OWN dimension
copies and every join's selectivity/fan-out is preserved while both the
facts AND the SF-proportional dimensions (part, customer, supplier) grow
16x. nation/region stay fixed (25/5 rows — they are NOT SF-proportional
in TPC-H either).

For each of the 21 xh_tpch_* analogs + q24 (the Q1 analog) +
xh_market_basket it records, at x1 and x16:

  wall_sec          — end-to-end wall including AQE re-planning
  n_rows            — result cardinality (a correctness smoke: most
                      analogs emit the same grouped/topk shape at any SF;
                      growth is noted, not asserted)
  bhj / smj         — BroadcastHashJoin vs SortMergeJoin counts in the
                      EXECUTED (post-AQE) plan: which strategies flipped
                      under 16x growth is exactly what the probe exists
                      to see

plus whether the coded width/strategy probes fire at x16:
  _PART_BROADCAST_MAX_BYTES (tpch_analogs byte-aware probed part hint:
                             probed rows x estimated row width vs the
                             64 MiB build-side bound, _max_broadcast_rows)
  _BASKET_DECIMAL_AT        (market-basket DECIMAL(38,0) lift promotion)
and, for the record, the documents-table probes' headroom at this box's
corpus (chi2 _CHI2_MAX_DOCS; they gate documents ops, which do not scale
with lineitem — reported, not exercised, here).

Prints one JSON line and writes bench/tpch_scaling_results.json — the
measured backing for SCALE.md's TPC-H paragraph.

Run: python bench_tpch_scaling.py   (env: SPARK_GRAFT_SCALING_BASE,
default /root/testdata/sf0.1; SPARK_GRAFT_TPCH_FACTORS, default "1,16")
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

BASE = os.environ.get("SPARK_GRAFT_SCALING_BASE", "/root/testdata/sf0.1")
FACTORS = [
    int(x)
    for x in os.environ.get("SPARK_GRAFT_TPCH_FACTORS", "1,16").split(",")
]

# key columns to shift per table: (table, [(col, family)]) — one shift
# unit per key family so cross-table references stay consistent
_KEYS = {
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
    "customer": [("c_custkey", "cust")],
    "supplier": [("s_suppkey", "supp")],
}

_QUERIES = sorted(
    n for n in REGISTRY if n.startswith("xh_tpch_q")
) + ["q24", "xh_market_basket"]



def _q14_bound_rows(ta):
    """Effective byte-aware row bound for q14's 2-column part slice
    (p_partkey BIGINT, p_type STRING) -- the probed broadcast candidate."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return ta._max_broadcast_rows(
        StructType([
            StructField("p_partkey", LongType()),
            StructField("p_type", StringType()),
        ])
    )

def replicate(spark, out_dir: str, factor: int) -> str:
    sf_dir = os.path.join(out_dir, f"x{factor}")
    # one shift unit per key family (max key + 1 over the base fixture)
    units = {}
    for t, cols in _KEYS.items():
        d = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        for col, fam in cols:
            m = d.agg(F.max(col)).collect()[0][0] + 1
            units[fam] = max(units.get(fam, 0), m)
    for t, cols in _KEYS.items():
        d = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        reps = []
        for i in range(factor):
            r = d
            for col, fam in cols:
                r = r.withColumn(col, F.col(col) + F.lit(i * units[fam]))
            reps.append(r)
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.repartition(max(4, factor * 2)).write.mode("overwrite").parquet(
            os.path.join(sf_dir, f"{t}.parquet")
        )
    for t in ("nation", "region"):  # fixed catalogs, never SF-proportional
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return sf_dir


def run_one(spark, name: str, sf_dir: str) -> dict:
    t0 = time.time()
    df = REGISTRY[name].fn(spark, sf_dir)
    n = len(df.collect())
    wall = round(time.time() - t0, 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "wall_sec": wall,
        "n_rows": n,
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
    }


def main() -> None:
    from hadoop_copier_spark.queries import quality_checks as qc
    from hadoop_copier_spark.queries import tpch_analogs as ta

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix="hcs_tpch_scaling_")
    results: dict = {}
    probes: dict = {}
    try:
        for f in FACTORS:
            sf_dir = replicate(spark, tmp, f)
            li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            pt = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
            r = {
                "n_lineitem": li.count(),  # also warms the page cache
                "n_orders": od.count(),
                "n_part": pt.count(),
            }
            for name in _QUERIES:
                r[name] = run_one(spark, name, sf_dir)
            results[f"x{f}"] = r
            if f == max(FACTORS):
                probes["part_broadcast_probe"] = {
                    "bound_rows": _q14_bound_rows(ta),
                    "part_rows_at_max_factor": r["n_part"],
                    "fires_unhinted_path": r["n_part"]
                    > _q14_bound_rows(ta),
                }
                probes["basket_decimal_probe"] = {
                    "bound_orders": ta._BASKET_DECIMAL_AT,
                    "orders_at_max_factor": r["n_orders"],
                    "fires_decimal_path": r["n_orders"] >= ta._BASKET_DECIMAL_AT,
                }
                probes["chi2_width_probe_for_reference"] = {
                    "bound_docs": qc._CHI2_MAX_DOCS,
                    "note": "gates documents-table ops; the documents "
                    "corpus does not scale with lineitem in this probe",
                }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    lo, hi = f"x{min(FACTORS)}", f"x{max(FACTORS)}"
    summary = {}
    for name in _QUERIES:
        a, b = results[lo][name], results[hi][name]
        summary[name] = {
            "wall_ratio": round(b["wall_sec"] / max(a["wall_sec"], 1e-9), 2),
            "join_flips": {
                "bhj": f"{a['bhj']}->{b['bhj']}",
                "smj": f"{a['smj']}->{b['smj']}",
            },
            "flipped": (a["bhj"], a["smj"]) != (b["bhj"], b["smj"]),
        }
    out = {
        "metric": "tpch_analog_scaling_curve",
        "unit": "sec",
        "base": BASE,
        "factors": FACTORS,
        "results": results,
        "x_ratio_and_flips": summary,
        "probes": probes,
        "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench", "tpch_scaling_results.json"),
        "w",
    ) as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in ("metric", "x_ratio_and_flips", "probes")}))


if __name__ == "__main__":
    main()
