"""x64 probe-firing demonstration (round 14 follow-up to
bench_tpch_scaling.py): at x16 the coded probes honestly did NOT fire
(orders 2.4M < _BASKET_DECIMAL_AT=3M; part 320k < _PART_BROADCAST_MAX_
ROWS=2M). This focused probe replicates orders/lineitem/part x64 — the
first factor where orders (9.6M) CROSSES the market-basket DECIMAL
promotion bound — and runs the two probe-gated operators end-to-end:

  xh_market_basket — must take the DECIMAL(38,0) lift path (the coded
      row-count probe, boundary-tested in pytest, now fired by VOLUME)
      and still return sane rows;
  xh_tpch_q14      — part at 1.28M rows still clears the 2M broadcast
      bound (recorded, not hidden: the unhinted path needs part > 2M,
      i.e. SF > ~100 in real TPC-H terms).

Writes bench/probe_fire_x64.json.
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
FACTOR = 64

_KEYS = {
    "orders": [("o_orderkey", "order"), ("o_custkey", "cust")],
    "lineitem": [
        ("l_orderkey", "order"),
        ("l_partkey", "part"),
        ("l_suppkey", "supp"),
    ],
    "part": [("p_partkey", "part")],
}



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

def main() -> None:
    from hadoop_copier_spark.queries import tpch_analogs as ta

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    tmp = tempfile.mkdtemp(prefix="hcs_probe_x64_")
    sf_dir = os.path.join(tmp, f"x{FACTOR}")
    try:
        units: dict = {}
        for t, cols in _KEYS.items():
            d = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
            for col, fam in cols:
                m = d.agg(F.max(col)).collect()[0][0] + 1
                units[fam] = max(units.get(fam, 0), m)
        for t, cols in _KEYS.items():
            d = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
            reps = []
            for i in range(FACTOR):
                r = d
                for col, fam in cols:
                    r = r.withColumn(col, F.col(col) + F.lit(i * units[fam]))
                reps.append(r)
            out = reps[0]
            for r in reps[1:]:
                out = out.unionByName(r)
            out.repartition(128).write.mode("overwrite").parquet(
                os.path.join(sf_dir, f"{t}.parquet")
            )

        n_orders = spark.read.parquet(
            os.path.join(sf_dir, "orders.parquet")
        ).count()
        n_part = spark.read.parquet(
            os.path.join(sf_dir, "part.parquet")
        ).count()

        t0 = time.time()
        mb = REGISTRY["xh_market_basket"].fn(spark, sf_dir)
        mb_rows = mb.collect()
        mb_wall = round(time.time() - t0, 3)
        mb_plan = mb._jdf.queryExecution().executedPlan().toString()

        t0 = time.time()
        q14 = REGISTRY["xh_tpch_q14"].fn(spark, sf_dir)
        q14_rows = q14.collect()
        q14_wall = round(time.time() - t0, 3)

        out = {
            "metric": "probe_fire_x64",
            "factor": FACTOR,
            "n_orders": n_orders,
            "n_part": n_part,
            "basket_decimal_probe": {
                "bound_orders": ta._BASKET_DECIMAL_AT,
                "fired": n_orders >= ta._BASKET_DECIMAL_AT,
                "decimal_cast_in_executed_plan": "decimal(38,0)"
                in mb_plan.lower(),
                "wall_sec": mb_wall,
                "n_rows": len(mb_rows),
                "top_pair_sane": bool(mb_rows)
                and all(v is not None for v in mb_rows[0]),
            },
            "part_broadcast_probe": {
                "bound_rows": _q14_bound_rows(ta),
                "fired_unhinted_path": n_part > _q14_bound_rows(ta),
                "wall_sec": q14_wall,
                "n_rows": len(q14_rows),
            },
            "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
        }
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench", "probe_fire_x64.json"),
            "w",
        ) as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        print(json.dumps({k: out[k] for k in
                          ("basket_decimal_probe", "part_broadcast_probe")}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
