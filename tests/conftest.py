from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from fs2_osm_spark.session import get_spark

    s = get_spark(cores=8, app_name="fs2_osm_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from fs2_osm_spark.oracle import duckdb_connection

    return duckdb_connection(SF_SMOKE)
