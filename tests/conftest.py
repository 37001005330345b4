from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ciws_server_spark.session import get_spark

    # Small core count: test datasets are tiny; large local parallelism
    # only adds task-dispatch overhead to the suite.
    spark = get_spark("ciws-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE
