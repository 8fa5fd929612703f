"""Shared Spark session for the test suite (local[4], engine defaults)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

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
