import os

import pytest

from hadoop_copier_spark.session import get_spark
from hadoop_copier_spark.testing import duck_connect

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"), shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE


@pytest.fixture(scope="session")
def duck(sf_oracle):
    con = duck_connect(sf_oracle)
    yield con
    con.close()


def pytest_report_header(config):
    """Pin the oracle environment in every test log: the round-1 hash
    failures were a DuckDB-version rounding divergence, so local-green
    claims are only meaningful alongside the version they ran against."""
    from hadoop_copier_spark.testing import DUCKDB_VERSION

    return f"duckdb oracle: {DUCKDB_VERSION} (engine H-outputs are version-proof: no double->decimal casts)"
