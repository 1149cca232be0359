"""Regenerate the local correctness artifact over the FULL registry.

Runs every registry entry through the driver-faithful harness
(`testing.compare`: Spark toPandas() vs DuckDB .df(), the exact
serializer the driver's t2 gate uses) and writes
`CORRECTNESS_LOCAL_r{N}.json` — the supplementary evidence that every
entry (not just the driver's 50-alias window) is green this round.

TRI-SF since round 13 (VERDICT r12 #6): the primary block runs the full
registry (H + P + the alias window) at sf0.01, and two additional
H-only blocks re-run every NON-ALIAS H query's hash compare at sf0.001
and sf0.1 — so per-operator tri-SF verification is recorded in ONE
artifact instead of claimed per-op in commit messages. Aliases are
skipped in the extra blocks because they bind the identical (fn,
oracle) pair as their target (asserted by tests/test_oracle_queries);
P-class rows-only checks are SF-insensitive by design and run once.

    python record_local.py            # round from SPARK_GRAFT_ROUND (default 7)
    SPARK_GRAFT_ROUND=8 python record_local.py
    SPARK_GRAFT_TRI_SF=0 python record_local.py   # primary block only
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb  # noqa: E402

ROUND = int(os.environ.get("SPARK_GRAFT_ROUND", "7"))
SF = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TRI_SF = os.environ.get("SPARK_GRAFT_TRI_SF", "1") != "0"
EXTRA_SFS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.1", "/root/testdata/sf0.1"),
]
# VERDICT r14 #6: a fourth H-only block at sf1 (x10-replicated fixtures,
# make_sf1.py) when the generated set exists — the scale where AQE
# strategy flips begin
_SF1_DIR = os.environ.get(
    "SPARK_GRAFT_SF1_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".sf1"),
)
if TRI_SF and os.path.isdir(_SF1_DIR):
    EXTRA_SFS.append(("sf1", _SF1_DIR))


def run_block(spark, sf_dir, include_p, include_aliases):
    """One sweep at one SF. H entries hash-compare vs DuckDB; P entries
    (when included) are rows-only. Returns (entries, n_h, n_h_pass)."""
    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.testing import compare, duck_connect

    con = duck_connect(sf_dir)
    entries: dict = {}
    n_h = n_h_pass = 0
    for name, q in sorted(REGISTRY.items()):
        if "alias" in q.tags and not include_aliases:
            continue
        if q.oracle:
            n_h += 1
            try:
                probs = compare(q.fn, q.oracle, spark, sf_dir, con=con)
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
        elif include_p:
            try:
                n = q.fn(spark, sf_dir).count()
                entries[name] = {"class": "P", "local": "pass", "detail": f"rows={n}"}
            except Exception as ex:  # noqa: BLE001
                entries[name] = {
                    "class": "P",
                    "local": "FAIL",
                    "detail": str(ex).splitlines()[0][:200],
                }
    return entries, n_h, n_h_pass


def main() -> None:
    # the CANONICAL session factory and oracle connection — never
    # hand-rolled copies, so this recorder can't drift from the harness
    # (same table list, same pinned confs) as operators/tables are added
    from hadoop_copier_spark.session import get_spark

    spark = get_spark()

    entries, n_h, n_h_pass = run_block(
        spark, SF, include_p=True, include_aliases=True
    )
    extra = {}
    if TRI_SF:
        for label, sf_dir in EXTRA_SFS:
            b_entries, b_h, b_pass = run_block(
                spark, sf_dir, include_p=False, include_aliases=False
            )
            extra[label] = {
                "sf_dir": sf_dir,
                "n_h": b_h,
                "n_h_pass": b_pass,
                "loadavg_1m_5m_15m": [round(x, 2) for x in os.getloadavg()],
                "entries": b_entries,
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
            # VERDICT r12 #6: tri-SF H-hash blocks in one artifact
            "sf_blocks": ["sf0.01 (primary, full registry)"]
            + [f"{label} (H-only, aliases skipped)" for label, _ in extra.items()],
        },
        "entries": entries,
        "extra_sf": extra,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"CORRECTNESS_LOCAL_r{ROUND}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    fails = [k for k, v in entries.items() if v["local"] != "pass"]
    for label, blk in extra.items():
        fails += [
            f"{label}:{k}" for k, v in blk["entries"].items() if v["local"] != "pass"
        ]
    summary = ", ".join(
        [f"sf0.01 H {n_h_pass}/{n_h}"]
        + [f"{lb} H {b['n_h_pass']}/{b['n_h']}" for lb, b in extra.items()]
    )
    print(f"wrote {path}: {len(entries)} primary entries, {summary}, fails {fails}")


if __name__ == "__main__":
    main()
