from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from thymeflow_back_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (heavy end-to-end streaming/recall suites)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy end-to-end suite — skipped by default, run with --runslow",
    )


def pytest_collection_modifyitems(config, items):
    """Default-on QUICK tier: the full suite crossed 29 minutes in round 5,
    which is the gate developers skip first. Heavy end-to-end suites are
    marked ``slow`` and skipped unless --runslow; the quick tier keeps a
    correctness representative for every operator family."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
