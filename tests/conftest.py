from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vmhub_data_pipeline_spark.session import build_session  # noqa: E402

# Fast feedback: oracle-parity tests run at the smallest sf by default.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session", autouse=True)
def _private_artifact_root(tmp_path_factory):
    # the stable artifact store is durable and shared by design (r11) — a
    # test run must neither inherit another process's fits (cold-path pins
    # would silently measure warm no-ops) nor publish into / depend on the
    # root a concurrently serving process mounts (ADVICE r11: never wipe
    # or share the global root). Each pytest session gets its own.
    root = str(tmp_path_factory.mktemp("vmhub_artifacts"))
    prev = os.environ.get("VMHUB_SPARK_ARTIFACTS")
    os.environ["VMHUB_SPARK_ARTIFACTS"] = root
    yield root
    if prev is None:
        os.environ.pop("VMHUB_SPARK_ARTIFACTS", None)
    else:
        os.environ["VMHUB_SPARK_ARTIFACTS"] = prev


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
