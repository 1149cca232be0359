"""Versioned-snapshot table semantics (operators/snapshots.py): atomic
manifest commits, exact time travel under append/overwrite, append-only
rollback, and vacuum that never touches a kept version's data."""

import os

import pytest
from pyspark.sql import functions as F

from hadoop_copier_spark.operators.snapshots import (
    list_versions,
    read_snapshot,
    rollback,
    vacuum,
    write_snapshot,
)
from hadoop_copier_spark.tables import load_table


@pytest.fixture()
def nation(spark, sf_oracle):
    return load_table(spark, sf_oracle, "nation")


def _ids(df):
    return sorted(r.n_nationkey for r in df.select("n_nationkey").collect())


def test_time_travel_exact_across_append_and_overwrite(spark, nation, tmp_path):
    t = str(tmp_path / "tbl")
    first = nation.filter(F.col("n_nationkey") < 10)
    extra = nation.filter((F.col("n_nationkey") >= 10) & (F.col("n_nationkey") < 15))
    fresh = nation.filter(F.col("n_nationkey") >= 20)

    v1 = write_snapshot(first, t)
    v2 = write_snapshot(extra, t, mode="append")
    v3 = write_snapshot(fresh, t, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert list_versions(t) == [1, 2, 3]

    # each version returns exactly its corpus, regardless of later writes
    assert _ids(read_snapshot(spark, t, 1)) == _ids(first)
    assert _ids(read_snapshot(spark, t, 2)) == _ids(first.unionByName(extra))
    assert _ids(read_snapshot(spark, t, 3)) == _ids(fresh)
    assert _ids(read_snapshot(spark, t)) == _ids(fresh)  # default = latest

    # append reuses v1's files untouched — no rewrite of history
    import json

    m1 = json.load(open(os.path.join(t, "_manifests", "v000001.json")))
    m2 = json.load(open(os.path.join(t, "_manifests", "v000002.json")))
    assert set(m1["files"]) < set(m2["files"])


def test_rollback_is_append_only(spark, nation, tmp_path):
    t = str(tmp_path / "tbl")
    good = nation.filter(F.col("n_nationkey") < 5)
    bad = nation.filter(F.col("n_nationkey") >= 23)
    write_snapshot(good, t)
    write_snapshot(bad, t, mode="overwrite")
    v3 = rollback(t, to_version=1)
    assert v3 == 3 and list_versions(t) == [1, 2, 3]
    assert _ids(read_snapshot(spark, t)) == _ids(good)
    assert _ids(read_snapshot(spark, t, 2)) == _ids(bad)  # still inspectable


def test_vacuum_removes_only_unreferenced_data(spark, nation, tmp_path):
    t = str(tmp_path / "tbl")
    for lo in (0, 5, 10):
        write_snapshot(
            nation.filter(F.col("n_nationkey") >= lo), t, mode="overwrite"
        )
    removed = vacuum(t, keep_last=2)
    assert removed, "v1's data dir should be gone"
    assert list_versions(t) == [2, 3]
    # kept versions read exactly as before the vacuum
    assert _ids(read_snapshot(spark, t, 2)) == sorted(range(5, 25))
    assert _ids(read_snapshot(spark, t, 3)) == sorted(range(10, 25))
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, t, 1)


def test_duplicate_version_commit_refused(nation, tmp_path):
    from hadoop_copier_spark.operators.snapshots import _commit_manifest

    t = str(tmp_path / "tbl")
    write_snapshot(nation, t)
    with pytest.raises(ValueError, match="already committed"):
        _commit_manifest(
            t, {"version": 1, "files": [], "n_files": 0, "schema": "{}"}
        )


def test_readers_never_depend_on_directory_listing(spark, nation, tmp_path):
    """A stray half-written data dir (a crashed writer) must be invisible
    to every committed version."""
    t = str(tmp_path / "tbl")
    write_snapshot(nation.filter(F.col("n_nationkey") < 7), t)
    junk = os.path.join(t, "data", "v999999-deadbeef")
    os.makedirs(junk)
    nation.limit(3).write.parquet(os.path.join(junk, "orphan.parquet"))
    assert _ids(read_snapshot(spark, t)) == list(range(7))


def test_streaming_snapshot_sink_exactly_once_across_restart(spark, sf_oracle, tmp_path):
    """foreachBatch -> snapshot-table sink: a mid-replay stop/restart (and
    the redelivery it causes) never duplicates a batch — the final table
    equals the batch read exactly, every micro-batch boundary is a
    time-travelable version, and manifests carry distinct batch_ids."""
    import os as _os

    from pyspark.sql import functions as F

    from hadoop_copier_spark.streaming.snapshot_sink import (
        committed_batch_ids,
        snapshot_batch_writer,
    )

    src = str(tmp_path / "snap_src")
    tbl_dir = str(tmp_path / "snap_tbl")
    chk = str(tmp_path / "snap_chk")
    e = load_table(spark, sf_oracle, "events").select(
        "event_id", "user_id", "value"
    ).limit(90)
    parts = [e.filter(F.col("event_id") % 3 == i) for i in range(3)]
    parts[0].coalesce(1).write.parquet(_os.path.join(src, "b1"))
    parts[1].coalesce(1).write.parquet(_os.path.join(src, "b2"))

    def start():
        stream = (
            spark.readStream.schema("event_id long, user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        return (
            stream.writeStream.foreachBatch(snapshot_batch_writer(tbl_dir))
            .option("checkpointLocation", chk)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # mid-replay stop: only b1+b2 ingested so far
    parts[2].coalesce(1).write.parquet(_os.path.join(src, "b3"))
    q = start()
    q.processAllAvailable()
    q.stop()

    got = read_snapshot(spark, tbl_dir).collect()
    want = {r.event_id for r in e.collect()}
    assert {r.event_id for r in got} == want and len(got) == len(want)
    ids = committed_batch_ids(tbl_dir)
    assert len(ids) == len(list_versions(tbl_dir))  # one version per batch
    # redelivering an old batch id by hand is a no-op
    writer = snapshot_batch_writer(tbl_dir)
    writer(parts[0], min(ids))
    assert len(read_snapshot(spark, tbl_dir).collect()) == len(want)


def test_right_to_erasure_registry_invariants(spark, sf_smoke):
    """The erasure workflow's contract: v2 holds zero rows for the
    erased users, strictly fewer total rows, an unchanged
    others-checksum, and the PRE-erasure version stays readable (the
    audit-trail property) until vacuumed."""
    from hadoop_copier_spark.queries import REGISTRY

    rows = {r["version"]: r for r in
            REGISTRY["xp_right_to_erasure"].fn(spark, sf_smoke).collect()}
    v1, v2 = rows[1], rows[2]
    assert v1["n_erased_users_rows"] > 0
    assert v2["n_erased_users_rows"] == 0
    assert v2["n_rows"] == v1["n_rows"] - v1["n_erased_users_rows"]
    assert v1["others_checksum"] == v2["others_checksum"]


def test_snapshot_diff_counts_every_class_exactly(spark, sf_smoke):
    """xp_snapshot_diff plants one instance of each diff class: v1->v2
    is pure appends (the %3==1 customer slice), v2->v3 is exactly one
    changed row (balance restated) and one removed row (highest-key
    customer dropped). Expected counts derive from the fixture itself,
    so the pin is exact at any SF."""
    from pyspark.sql import functions as F

    from hadoop_copier_spark.queries import REGISTRY
    from hadoop_copier_spark.tables import load_table

    c = load_table(spark, sf_smoke, "customer")
    n0 = c.filter(F.col("c_custkey") % 3 == 0).count()
    n1 = c.filter(F.col("c_custkey") % 3 == 1).count()
    rows = {
        (r["v_from"], r["v_to"]): (
            r["added"], r["removed"], r["changed"], r["unchanged"]
        )
        for r in REGISTRY["xp_snapshot_diff"].fn(spark, sf_smoke).collect()
    }
    assert rows[(1, 2)] == (n1, 0, 0, n0)
    assert rows[(2, 3)] == (0, 1, 1, n0 + n1 - 2)
