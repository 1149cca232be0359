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


@pytest.fixture(scope="module")
def null_injected_sf(tmp_path_factory):
    """sf0.001 with NULLs planted in the content columns: every 7th
    document's text and every 11th embedding vector. Corrupt/missing
    content rows are routine in a real 100 TB corpus."""
    import shutil

    import pandas as pd  # noqa: F401 - via pyarrow to_pandas
    import pyarrow as pa

    d = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        dst = os.path.join(str(d), f"{t}.parquet")
        if t == "documents":
            df = pq.read_table(src).to_pandas()
            df.loc[df["doc_id"] % 7 == 0, "text"] = None
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), dst)
        elif t == "embeddings":
            df = pq.read_table(src).to_pandas()
            df["embedding"] = df.apply(
                lambda r: None if r["vec_id"] % 11 == 0 else r["embedding"], axis=1
            )
            schema = pq.read_schema(src)
            pq.write_table(
                pa.Table.from_pandas(
                    df,
                    schema=pa.schema([schema.field(n) for n in df.columns]),
                    preserve_index=False,
                ),
                dst,
            )
        else:
            shutil.copy(src, dst)
    return str(d)


def test_every_query_survives_null_content(spark, null_injected_sf):
    """Found on first sweep: IVF seeded centroids from null vectors, the
    sign-LSH and minhash pandas UDFs crashed on None, and the multimodal
    featurizer called bytes(None). All must degrade (drop the row / empty
    payload), never fail the job."""
    fails = []
    for name, q in sorted(REGISTRY.items()):
        try:
            q.fn(spark, null_injected_sf).count()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            fails.append((name, str(ex).splitlines()[0][:120]))
    assert not fails, fails
