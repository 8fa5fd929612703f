"""Driver-facing workload: named queries + DuckDB oracle SQL.

Importing this package registers every query in
:mod:`udacity_dend_capstone_immigration_spark.workload.base.QUERIES` /
``ORACLES`` — one entry per operator family from SURVEY.md §2 plus the
training-data-pipeline tier (dedup / similarity / text / events).
"""

from udacity_dend_capstone_immigration_spark.workload.base import QUERIES, ORACLES

# Registration side effects:
from udacity_dend_capstone_immigration_spark.workload import relational  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import textops  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import events  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import vectors  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import multimodal  # noqa: F401

# timeseries registers feature_store_build_roundtrip, whose oracle the
# streaming feature-update twin in streamq shares — import it first
from udacity_dend_capstone_immigration_spark.workload import timeseries  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import streamq  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import advanced  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import etlq  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import curation  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import analytic  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import tpch  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import pretrain  # noqa: F401
from udacity_dend_capstone_immigration_spark.workload import dedupstore  # noqa: F401

# pipeline splices the textops/pretrain/dedupstore oracles — import last
from udacity_dend_capstone_immigration_spark.workload import pipeline  # noqa: F401

__all__ = ["QUERIES", "ORACLES"]
