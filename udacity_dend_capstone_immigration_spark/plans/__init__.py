from udacity_dend_capstone_immigration_spark.plans.immigration_etl import (
    build_label_dims,
    clean_countries,
    clean_demographics,
    clean_immigration,
    clean_ports,
    clean_states,
    build_fact,
    build_city_demographics,
    run_pipeline,
    DEMOGRAPHICS_SCHEMA,
)
from udacity_dend_capstone_immigration_spark.plans.dq import DQCheck, DQError

__all__ = [
    "build_label_dims",
    "clean_countries",
    "clean_demographics",
    "clean_immigration",
    "clean_ports",
    "clean_states",
    "build_fact",
    "build_city_demographics",
    "run_pipeline",
    "DEMOGRAPHICS_SCHEMA",
    "DQCheck",
    "DQError",
]
