"""Data-layout maintenance operators: small-file compaction and clustered
(range-partitioned, sorted) rewrites.

The small-files problem is the dominant operational failure mode of long-
running ingest at scale: a streaming or incremental pipeline that commits
every few minutes leaves millions of KB-sized parquet files, and every
downstream scan pays per-file open/footer costs plus a task per file.
Compaction rewrites a table directory into ceil(total_bytes / target)
files of ~target size (the HDFS-block / `maxPartitionBytes` granularity a
scan wants).

Clustered rewrite additionally range-partitions and sorts on given keys,
so parquet row-group min/max statistics become selective — a filter on the
cluster key then prunes whole files/row-groups at scan time (the poor
man's Z-order; a real multi-dimension Z/Hilbert order is a deterministic
bit-interleave expression over the same repartitionByRange machinery).

At 100 TB: both rewrites are one shuffle (round-robin or range exchange)
and stream executor-to-executor; the driver only lists file sizes.
repartitionByRange samples keys to build balanced range bounds, so skewed
keys still give ~equal output files.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _total_input_bytes(df: DataFrame) -> int:
    """Sum the on-disk size of the files backing a (file-sourced) DataFrame.
    Driver-side metadata only. Local paths via os.stat; other filesystems
    via the JVM Hadoop FileSystem already configured on the session."""
    total = 0
    spark = df.sparkSession
    for f in df.inputFiles():
        p = urlparse(f)
        if p.scheme in ("", "file"):
            total += os.path.getsize(p.path)
        else:  # pragma: no cover - exercised only on real clusters
            jvm = spark._jvm
            path = jvm.org.apache.hadoop.fs.Path(f)
            fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
            total += fs.getFileStatus(path).getLen()
    return total


def _interleave_bits(cols, bits: int = 16):
    """Bit-interleave k bucketized int columns (each 0..2^bits-1) into one
    Z-order key: bit i of column j lands at position i*k + j. Pure Column
    expressions — shift/and/or stay inside whole-stage codegen, no UDF."""
    from pyspark.sql.functions import lit, shiftleft, shiftright

    k = len(cols)
    z = lit(0)
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1)), i * k + j))
    return z


def zorder_rewrite(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    cols: tuple,
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> dict:
    """Multi-dimension clustered rewrite (the OPTIMIZE ZORDER pattern):
    bucketize each cluster column to 2^bits levels, bit-interleave into a
    Z-order key, then range-partition + sort on that key. Files then cover
    small hyper-rectangles of the key space instead of slabs of one
    column, so min/max row-group pruning is selective on EVERY clustered
    column at once — single-column sort helps queries on that column only.

    Bucketization here is equal-width from global min/max (one metadata
    aggregate; stays JVM-side). Under heavy value skew, production would
    swap in equal-depth bounds from approxQuantile — the interleave and
    write path are unchanged. One shuffle (range exchange), like
    compact_parquet."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(src_dir)
    total = _total_input_bytes(df)
    n = max(1, math.ceil(total / target_file_bytes))
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    b = df.agg(*aggs).collect()[0]
    bucketized = []
    for c in cols:
        lo, hi = b[f"__lo_{c}"], b[f"__hi_{c}"]
        if lo is None or hi is None or float(lo) == float(hi):
            # degenerate column (all-NULL or constant): a single bucket —
            # width_bucket would return NULL and silently break clustering
            bucketized.append(F.lit(0).cast("long"))
            continue
        wb = (
            F.width_bucket(
                F.col(c).cast("double"),
                F.lit(float(lo)),
                F.lit(float(hi)),
                F.lit(2**bits - 1),
            )
            - 1
        ).cast("long")
        # NULL values sort into bucket 0 instead of nulling the whole __z key
        bucketized.append(F.coalesce(wb, F.lit(0).cast("long")))
    out = (
        df.withColumn("__z", _interleave_bits(bucketized, bits=bits))
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    out.write.mode("overwrite").parquet(dst_dir)
    after = spark.read.parquet(dst_dir)
    return {"files_after": len(after.inputFiles()), "bytes": total, "rows": after.count()}


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: tuple = (),
) -> dict:
    """Rewrite a parquet directory into ~target-sized files; returns
    driver-side metrics {files_before, files_after, bytes, rows}.

    With sort_cols the rewrite is clustered: repartitionByRange on the keys
    + sortWithinPartitions, giving disjoint key ranges per file and tight
    row-group min/max stats for scan-time pruning. Without, a round-robin
    repartition balances bytes exactly."""
    df = spark.read.parquet(src_dir)
    files_before = len(df.inputFiles())
    total = _total_input_bytes(df)
    n = max(1, math.ceil(total / target_file_bytes))
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst_dir)
    after = spark.read.parquet(dst_dir)
    return {
        "files_before": files_before,
        "files_after": len(after.inputFiles()),
        "bytes": total,
        "rows": after.count(),
    }
