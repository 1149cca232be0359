"""Copy-job benchmark (BASELINE.md BENCH-4 / BENCH-5).

BENCH-4: unthrottled throughput over a ~1 GiB synthetic tree (target
>= 100 MB/s local-to-local, checksum on — reference doc analog 67.18 MB/s,
/root/reference/README.md:126).
BENCH-5: throttle accuracy — measured rate within [0.8x, 1.2x] of a
10 MB/s cap on a 64 MiB file.

Prints ONE JSON line; results recorded in bench/copy_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from hadoop_copier_spark.copyjob import CopyItem, CopyJobEngine, CopyRequest  # noqa: E402
from hadoop_copier_spark.session import get_spark  # noqa: E402


def _mk_tree(base: str, n_files: int, file_mb: int) -> int:
    total = 0
    payload = os.urandom(1024 * 1024)
    for i in range(n_files):
        sub = os.path.join(base, f"d{i % 4}")
        os.makedirs(sub, exist_ok=True)
        with open(os.path.join(sub, f"f{i:03d}.bin"), "wb") as f:
            for _ in range(file_mb):
                f.write(payload)
        total += file_mb * 1024 * 1024
    return total


def main() -> None:
    spark = get_spark(app_name="hcs-bench-copy", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = tempfile.mkdtemp(prefix="hcs_benchcopy_")

    # BENCH-4: 16 x 64 MiB = 1 GiB, checksum on, unthrottled
    src = os.path.join(base, "src")
    total = _mk_tree(src, n_files=16, file_mb=64)
    eng = CopyJobEngine(spark, checksum_enabled=True, parallelism=16)
    t0 = time.perf_counter()
    rid = eng.submit(CopyRequest("local", [CopyItem(src, os.path.join(base, "dst"))]))
    dt = time.perf_counter() - t0
    st = eng.status(rid)
    mbps = (total / 1048576.0) / dt

    # BENCH-5: 64 MiB @ 10 MB/s cap
    one = os.path.join(src, "d0", "f000.bin")
    t0 = time.perf_counter()
    eng2 = CopyJobEngine(spark, checksum_enabled=False, parallelism=1)
    eng2.submit(
        CopyRequest("local", [CopyItem(one, os.path.join(base, "throttled.bin"))], bandwidth=10)
    )
    dt2 = time.perf_counter() - t0
    mbps_throttled = 64.0 / dt2

    # Split-vs-unsplit: ONE 1 GiB file — the skew case file-granular
    # parallelism can't touch. Unsplit = single stream; split = 8 parallel
    # 128 MiB byte-range chunks with per-range verification.
    huge = os.path.join(base, "huge.bin")
    payload = os.urandom(1024 * 1024)
    with open(huge, "wb") as f:
        for _ in range(1024):
            f.write(payload)
    eng_nosplit = CopyJobEngine(
        spark, checksum_enabled=True, parallelism=8, split_threshold_bytes=0
    )
    t0 = time.perf_counter()
    eng_nosplit.submit(
        CopyRequest("local", [CopyItem(huge, os.path.join(base, "huge_nosplit.bin"))])
    )
    mbps_nosplit = 1024.0 / (time.perf_counter() - t0)
    eng_split = CopyJobEngine(spark, checksum_enabled=True, parallelism=8)
    t0 = time.perf_counter()
    rid3 = eng_split.submit(
        CopyRequest("local", [CopyItem(huge, os.path.join(base, "huge_split.bin"))])
    )
    mbps_split = 1024.0 / (time.perf_counter() - t0)
    st3 = eng_split.status(rid3)

    print(
        json.dumps(
            {
                "metric": "copy_job_bench",
                "bench4_unthrottled_MBps": round(mbps, 2),
                "bench4_status": st["status"],
                "bench4_checksum_verified": st["items"][0]["checksumVerified"],
                "bench5_cap_MBps": 10,
                "bench5_measured_MBps": round(mbps_throttled, 2),
                "bench5_within_bounds": bool(8.0 <= mbps_throttled <= 12.0),
                "single_1GiB_file_unsplit_MBps": round(mbps_nosplit, 2),
                "single_1GiB_file_split_MBps": round(mbps_split, 2),
                "split_verified": st3["items"][0]["checksumVerified"],
                "tree_bytes": total,
            }
        )
    )


if __name__ == "__main__":
    main()
