"""udacity_dend_capstone_immigration_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``aitzaz/udacity-DEND-capstone-immigration``
(see SURVEY.md), extended with large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design principles (SURVEY.md §7):
- DataFrame/SQL declarative plans; Catalyst/Tungsten pick physical strategy.
- No row-at-a-time Python UDFs in any hot path — native column expressions
  everywhere the reference used UDFs (reference etl.py:236-237, 254-256).
- Broadcast tiny dims, AQE for runtime re-planning, partition-pruned writes.
"""

from udacity_dend_capstone_immigration_spark.session import get_spark_session

__all__ = ["get_spark_session"]
__version__ = "0.1.0"
