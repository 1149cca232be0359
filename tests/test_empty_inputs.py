"""Every declared query must run (possibly to zero rows) on EMPTY fixture
tables. At 100 TB empty inputs are routine — a partition-pruned scan, a
date range with no data, a tenant with no documents — and an operator
that crashes there (found: IVF centroid seeding on an empty candidate
set; partitioned-write read-back schema inference with no data files)
fails the whole pipeline, not one query.

Fixtures are built with pyarrow so the physical schemas (including the
events table's TIMESTAMP(NANOS) column that Spark itself cannot write)
match the real ones exactly.
"""

import os

import pyarrow.parquet as pq
import pytest

from hadoop_copier_spark.queries import REGISTRY
from hadoop_copier_spark.tables import TABLES


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(schema.empty_table(), os.path.join(str(d), f"{t}.parquet"))
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf):
    fails = []
    for name, q in sorted(REGISTRY.items()):
        try:
            q.fn(spark, empty_sf).count()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            fails.append((name, str(ex).splitlines()[0][:120]))
    assert not fails, fails
