"""Layout-maintenance checks: small-file compaction and clustered rewrite
(operators/layout.py). The scale claim under test: compaction reduces a
fragmented directory to ceil(bytes/target) files, and the clustered
rewrite yields disjoint per-file key ranges (the property that makes
row-group min/max pruning selective)."""

import glob
import os

from pyspark.sql import functions as F

from hadoop_copier_spark.operators.layout import compact_parquet
from hadoop_copier_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _fragment(spark, dst, n_files):
    e = load_table(spark, SF, "events")
    e.repartition(n_files).write.mode("overwrite").parquet(dst)
    return e.count()


def test_compaction_reduces_file_count_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    rows = _fragment(spark, src, 40)
    assert len(glob.glob(os.path.join(src, "part-*"))) == 40
    total = sum(os.path.getsize(p) for p in glob.glob(os.path.join(src, "part-*")))
    target = total // 3  # expect ~3-4 output files
    m = compact_parquet(spark, src, dst, target_file_bytes=target)
    assert m["rows"] == rows
    assert m["files_before"] == 40
    assert m["files_after"] <= 5
    # content equality, order-independent
    a = spark.read.parquet(src).orderBy("event_id").collect()
    b = spark.read.parquet(dst).orderBy("event_id").collect()
    assert a == b


def test_clustered_rewrite_disjoint_key_ranges(spark, tmp_path):
    src = str(tmp_path / "frag2")
    dst = str(tmp_path / "clustered")
    _fragment(spark, src, 20)
    total = sum(os.path.getsize(p) for p in glob.glob(os.path.join(src, "part-*")))
    m = compact_parquet(
        spark, src, dst, target_file_bytes=max(1, total // 4), sort_cols=("ts",)
    )
    assert m["files_after"] >= 2
    # per-file [min_ts, max_ts] must not overlap across files
    ranges = []
    for p in sorted(glob.glob(os.path.join(dst, "part-*.parquet"))):
        r = (
            spark.read.parquet(p)
            .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
            .collect()[0]
        )
        if r["lo"] is not None:
            ranges.append((r["lo"], r["hi"]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_zorder_rewrite_clusters_both_dimensions(spark, tmp_path):
    """Z-order on (user_id, value): every output file must cover a small
    rectangle of the 2-D key space. A single-column sort slabs one
    dimension and leaves the other spanning ~the full range; Z-order
    bounds BOTH, which is what makes min/max pruning selective for
    filters on either column."""
    from hadoop_copier_spark.operators.layout import zorder_rewrite

    src = str(tmp_path / "zsrc")
    dst = str(tmp_path / "zdst")
    rows = _fragment(spark, src, 20)
    total = sum(os.path.getsize(p) for p in glob.glob(os.path.join(src, "part-*")))
    m = zorder_rewrite(spark, src, dst, cols=("user_id", "value"),
                       target_file_bytes=max(1, total // 8))
    assert m["rows"] == rows
    assert m["files_after"] >= 4
    g = (
        spark.read.parquet(dst)
        .agg(F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value"))
        .collect()[0]
    )
    gu = (g[1] - g[0]) or 1
    gv = (g[3] - g[2]) or 1.0
    areas = []
    for p in sorted(glob.glob(os.path.join(dst, "part-*.parquet"))):
        r = (
            spark.read.parquet(p)
            .agg(F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value"))
            .collect()[0]
        )
        if r[0] is None:
            continue
        areas.append(((r[1] - r[0]) / gu) * ((r[3] - r[2]) / gv))
    # random placement gives each file ~the full unit rectangle (area ~1);
    # z-order files must average well under half of it
    assert areas and sum(areas) / len(areas) < 0.5, areas


def test_zorder_degenerate_columns_do_not_break_clustering(spark, tmp_path):
    """ADVICE round 1: a constant cluster column (min==max) or an all-NULL
    column used to NULL the interleaved __z key and silently destroy
    clustering. Both must map to a single bucket: the rewrite succeeds,
    preserves every row, and still clusters on the healthy column."""
    from pyspark.sql import functions as F

    from hadoop_copier_spark.operators.layout import zorder_rewrite

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(10_000).select(
        F.col("id").alias("healthy"),
        F.lit(7).alias("constant"),
        F.lit(None).cast("double").alias("all_null"),
        (F.col("id") % 13).alias("payload"),
    )
    df.repartition(8).write.mode("overwrite").parquet(src)
    stats = zorder_rewrite(
        spark, src, dst, cols=("healthy", "constant", "all_null"),
        target_file_bytes=8 * 1024,
    )
    assert stats["rows"] == 10_000
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    # healthy column still drives clustering: per-file ranges must be
    # narrow (each file covers << the full [0, 10000) domain)
    per_file = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg((F.max("healthy") - F.min("healthy")).alias("spread"))
        .collect()
    )
    assert len(per_file) > 1
    avg_spread = sum(r["spread"] for r in per_file) / len(per_file)
    assert avg_spread < 10_000 * 0.5, avg_spread
