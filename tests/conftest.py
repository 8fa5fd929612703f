"""Shared Spark session for the test suite (local[4], engine defaults).

Tiering (r16 verdict item 3): the full suite runs ~35 min on local[4],
longer than the driver's verify window, so VERIFY_r16 reported
``tests_ok: false`` with the run truncated at 77% and zero failures.
Tests marked ``slow`` (the soak/extrapolation/lifecycle tail) are
skipped unless ``SPARK_GRAFT_SLOW_TESTS=1``; the default tier must stay
under ~10 minutes. The builder runs the slow tier explicitly every
round (recorded in OPTIMIZATION_r*.md); the driver's default run now
finishes inside its window.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SPARK_GRAFT_SLOW_TESTS"):
        return
    skip = pytest.mark.skip(
        reason="slow tier — set SPARK_GRAFT_SLOW_TESTS=1 to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from udacity_dend_capstone_immigration_spark.session import get_spark_session


@pytest.fixture(scope="session")
def spark():
    spark = get_spark_session(
        app_name="udacity-dend-capstone-immigration-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()
