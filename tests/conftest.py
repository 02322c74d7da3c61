import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup

from klio_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("klio-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
