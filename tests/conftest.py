from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from alix_spark.session import get_spark

    s = get_spark("alix_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return os.environ.get("ALIX_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_correct() -> str:
    return "/root/testdata/sf0.01"
