from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TESTDATA_SMALL = "/root/testdata/sf0.001"
TESTDATA_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from stock_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return TESTDATA_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return TESTDATA_ORACLE
