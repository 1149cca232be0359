"""applyInPandasWithState custom stateful op (stream result == batch) and
salted-join equivalence (skew pattern produces identical rows)."""

import os

from pyspark.sql import functions as F

from hadoop_copier_spark.operators.skew import salted_join
from hadoop_copier_spark.streaming.replay import EVENTS_SCHEMA, replay_events_chunks
from hadoop_copier_spark.streaming.stateful import running_totals_stateful
from hadoop_copier_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_stateful_running_totals_equal_batch(spark, tmp_path):
    src = str(tmp_path / "state_src")
    replay_events_chunks(spark, SF, src, n_chunks=4)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = (
        running_totals_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("t_state")
        .start()
    )
    try:
        q.processAllAvailable()
        # update mode emits one row per touched key per batch: the LAST
        # emission per key is the final state
        rows = spark.sql("SELECT * FROM t_state").collect()
    finally:
        q.stop()
    final = {}
    for r in rows:  # memory sink appends in batch order
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = {
        r["user_id"]: (r["n"], r["s"])
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(batch)
    for k in batch:
        assert final[k][0] == batch[k][0]
        assert abs(final[k][1] - batch[k][1]) < 1e-6


def test_salted_join_equals_plain_join(spark, sf_oracle):
    li = load_table(spark, sf_oracle, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    part = load_table(spark, sf_oracle, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    plain = li.join(part, "l_partkey").select("l_orderkey", "l_partkey", "p_name")
    salted = salted_join(li, part, "l_partkey", n_salts=4).select(
        "l_orderkey", "l_partkey", "p_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
