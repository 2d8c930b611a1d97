from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # tests favor startup over throughput


@pytest.fixture(scope="session")
def spark():
    from build_datawarehouse_demo_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
