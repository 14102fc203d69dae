from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vmhub_data_pipeline_spark.session import build_session  # noqa: E402

# Fast feedback: oracle-parity tests run at the smallest sf by default.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # small shuffle fan-out: at fixture scale, 32 shuffle partitions cost
    # more in task scheduling than they buy in parallelism
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    s = build_session("vmhub-tests", master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
