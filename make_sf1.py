"""Generate an sf1-scale fixture set (VERDICT r14 #6): /root/testdata
tops out at sf0.1, so the declared suite has never run end-to-end at
sf >= 1 — the scale where AQE strategy flips begin. No network and no
TPC-H dbgen in this container, so sf1 is synthesized by CONSISTENT x10
replication of the sf0.1 fixtures (the bench_tpch_scaling.py
discipline): replica i shifts every key family — order, part, supp,
cust, event, doc, vec — by i * (max_key + 1), so replicas reference
their OWN dimension copies and every join's selectivity and fan-out is
preserved while facts AND SF-proportional dimensions grow 10x.
nation/region stay fixed (25/5 rows, as in TPC-H). The DuckDB oracle
reads the SAME parquet, so the differential gate is exactly as strict
as at the driver SFs.

Replication duplicates text/embedding PAYLOADS verbatim (only ids
shift): dedup-family queries see genuine 10-way duplicate classes and
ANN queries see exact-tie neighbors — both resolve deterministically
(unique-key tiebreaks everywhere, mirrored in the oracles), so this is
a FEATURE: sf1 exercises the tie/dup paths the organic fixtures are too
sparse to hit.

Run:  python make_sf1.py        # writes $SPARK_GRAFT_SF1_DIR
                                # (default /root/repo/.sf1), ~1 GB
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF1_BASE", "/root/testdata/sf0.1")
OUT = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".sf1"),
)
FACTOR = int(os.environ.get("SPARK_GRAFT_SF1_FACTOR", "10"))

# (table, [(key column, shift family)]) — one shift unit per family so
# cross-table references stay consistent across ALL ten tables
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
    "events": [("event_id", "event"), ("user_id", "cust")],
    "documents": [("doc_id", "doc")],
    "embeddings": [("vec_id", "vec")],
}


def main() -> None:
    from hadoop_copier_spark.session import get_spark

    spark = get_spark()
    units: dict = {}
    for t, cols in _KEYS.items():
        d = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        for col, fam in cols:
            m = d.agg(F.max(col)).collect()[0][0] + 1
            units[fam] = max(units.get(fam, 0), m)
    os.makedirs(OUT, exist_ok=True)
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
        out.repartition(max(8, FACTOR * 2)).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{t}.parquet")
        )
        print(f"{t}: x{FACTOR}", flush=True)
    for t in ("nation", "region"):  # fixed catalogs, never SF-proportional
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(OUT, f"{t}.parquet")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
