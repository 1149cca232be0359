"""Storage-codec probe: what does the parquet compression choice cost,
and what does it save, on the engine's fact-table shape?

At 100 TB the codec is a first-order cost lever — a 25% size cut is
25 TB of storage and network — so the choice should be a measured
trade, not a default. Writes sf0.1 lineitem (the widest fixture fact
table) under snappy / zstd / gzip, records bytes on disk, write wall,
and a full-scan aggregate wall per codec, and emits one JSON line plus
bench/storage_results.json for SCALE.md.

Run: python bench_storage.py  (env: SPARK_GRAFT_STORAGE_BASE,
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

from hadoop_copier_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_STORAGE_BASE", "/root/testdata/sf0.1")
CODECS = ("snappy", "zstd", "gzip")


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    spark = get_spark()
    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    tmp = tempfile.mkdtemp(prefix="storage_bench_")
    results = {}
    try:
        # Warm-up cycle: the first write/scan of a cold session pays JVM
        # and file-index startup that would land entirely on whichever
        # codec runs first; a throwaway pass makes the timed round fair.
        warm = os.path.join(tmp, "_warm")
        li.write.parquet(warm)
        spark.read.parquet(warm).agg(F.count(F.lit(1))).collect()
        shutil.rmtree(warm, ignore_errors=True)
        for codec in CODECS:
            out = os.path.join(tmp, codec)
            t0 = time.monotonic()
            li.write.option("compression", codec).parquet(out)
            w = time.monotonic() - t0
            size = du(out)
            t0 = time.monotonic()
            spark.read.parquet(out).agg(
                F.sum("l_quantity"), F.count(F.lit(1))
            ).collect()
            r = time.monotonic() - t0
            results[codec] = {
                "bytes": size,
                "write_sec": round(w, 3),
                "scan_agg_sec": round(r, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    base = results["snappy"]["bytes"]
    for codec, r in results.items():
        r["size_vs_snappy"] = round(r["bytes"] / base, 3)
    line = {
        "metric": "parquet_codec_tradeoff",
        "table": "lineitem",
        "base": BASE,
        "results": results,
    }
    print(json.dumps(line))
    with open(os.path.join(_REPO, "bench", "storage_results.json"), "w") as f:
        json.dump(line, f, indent=1)


if __name__ == "__main__":
    main()
