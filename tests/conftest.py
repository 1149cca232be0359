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
