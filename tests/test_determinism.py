"""SCALE.md principle 5, enforced: results are identical regardless of
physical partitioning. Each representative query runs under different
spark.sql.shuffle.partitions settings (1 = serial-like, 7 = odd/prime,
32 = the local default) and must collect byte-identical rows — the
property that makes hash-checked decimal aggregation safe to scale from
local[32] to a 1000-executor cluster."""

import pytest

from hadoop_copier_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

# one per risk family: multi-stage decimal agg, window, session boundary,
# iterative CC, set-op distinct, minhash banding
CASES = ["q24", "q35", "q63", "p_dedup_clusters", "q45", "h_ngram_jaccard"]


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partitioning(spark, name):
    q = REGISTRY[name]
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("1", "7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows = q.fn(spark, SF).collect()
            # normalize row order for queries whose contract doesn't order
            results.append(sorted(map(tuple, rows)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results[0] == results[1] == results[2]
