from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
# Default oracle scale matches the driver's CORRECTNESS gate (sf0.01).
# Override to stress every oracle at a larger scale, e.g.:
#   SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.1 pytest tests/test_queries_oracle.py
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from dungbeetle_spark.session import get_spark

    s = get_spark("dungbeetle-tests")
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "sweep: opt-in scale-sweep smoke (quick x1/x4 profile); run "
        "with `pytest -m sweep`",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m"):
        return  # explicit marker expression: respect it
    skip = pytest.mark.skip(reason="opt-in: run with `pytest -m sweep`")
    for item in items:
        if "sweep" in item.keywords:
            item.add_marker(skip)
