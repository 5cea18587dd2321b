from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from epiteam_network_etl_functions_spark.session import get_session  # noqa: E402

# Small-but-parallel session for tests; sf0.001 data.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

PARITY_SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("epiteam-etl-spark-tests")
    yield s
    s.stop()
