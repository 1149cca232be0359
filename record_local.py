"""Regenerate the local correctness artifact over the FULL registry.

Runs every registry entry through the driver-faithful harness
(`testing.compare`: Spark toPandas() vs DuckDB .df(), the exact
serializer the driver's t2 gate uses) at sf0.01 and writes
`CORRECTNESS_LOCAL_r{N}.json` — the supplementary evidence that every
entry (not just the driver's 50-alias window) is green this round.

    python record_local.py            # round from SPARK_GRAFT_ROUND (default 7)
    SPARK_GRAFT_ROUND=8 python record_local.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

ROUND = int(os.environ.get("SPARK_GRAFT_ROUND", "7"))
SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    # the CANONICAL session factory and oracle connection — never
    # hand-rolled copies, so this recorder can't drift from the harness
    # (same table list, same pinned confs) as operators/tables are added
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.session import get_spark
    from hadoop_copier_spark.testing import compare, duck_connect

    spark = get_spark()
    con = duck_connect(SF)

    entries: dict = {}
    n_h = n_h_pass = 0
    for name, q in sorted(REGISTRY.items()):
        if q.oracle:
            n_h += 1
            try:
                probs = compare(q.fn, q.oracle, spark, SF, con=con)
                ok = not probs
            except Exception as ex:  # noqa: BLE001 - recording, not raising
                probs = [str(ex).splitlines()[0][:200]]
                ok = False
            if ok:
                n_h_pass += 1
            entries[name] = {
                "class": "H",
                "local": "pass" if ok else "FAIL",
                "detail": None if ok else "; ".join(probs)[:300],
            }
        else:
            try:
                n = q.fn(spark, SF).count()
                entries[name] = {"class": "P", "local": "pass", "detail": f"rows={n}"}
            except Exception as ex:  # noqa: BLE001
                entries[name] = {
                    "class": "P",
                    "local": "FAIL",
                    "detail": str(ex).splitlines()[0][:200],
                }
    out = {
        "meta": {
            "round": ROUND,
            "sf": 0.01,
            "harness": "driver-faithful pandas compare (testing.compare)",
            "duckdb": duckdb.__version__,
            "n_entries": len(entries),
            "n_h": n_h,
            "n_h_pass": n_h_pass,
            # VERDICT r11 #8: ambient load belongs in the artifact
            "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
        },
        "entries": entries,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"CORRECTNESS_LOCAL_r{ROUND}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    fails = [k for k, v in entries.items() if v["local"] != "pass"]
    print(
        f"wrote {path}: {len(entries)} entries, H {n_h_pass}/{n_h}, fails {fails}"
    )


if __name__ == "__main__":
    main()
