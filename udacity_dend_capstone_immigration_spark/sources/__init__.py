from udacity_dend_capstone_immigration_spark.sources.readers import (
    first_available,
    read_csv_with_schema,
    read_parquet,
    from_pairs,
    load_star,
)
from udacity_dend_capstone_immigration_spark.sources.sas_labels import parse_sas_labels

__all__ = [
    "first_available",
    "read_csv_with_schema",
    "read_parquet",
    "from_pairs",
    "load_star",
    "parse_sas_labels",
]
