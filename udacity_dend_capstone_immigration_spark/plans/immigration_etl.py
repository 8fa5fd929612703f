"""The reference's end-to-end star-schema ETL, Spark-first.

Reimplements the full semantics of reference etl.py (load → clean →
fact/dim build → DQ → partitioned write) with:

- native expressions instead of the 4 Python UDFs (reference
  etl.py:236-237, 254-256) — the whole fact pipeline stays inside
  whole-stage codegen and predicate pushdown works on derived columns;
- explicit inner broadcast joins where the reference wrote LEFT JOIN ×5
  + IS-NOT-NULL filters (etl.py:313-323) — same rows, one fewer rewrite
  for Catalyst (EliminateOuterJoins) to prove;
- ``compat`` flag preserving the reference's subtle behaviors (falsy-zero
  SAS dates, stringified outputs) vs the fixed typed versions
  (SURVEY.md §7.3 risk 1);
- a single ``.cache()`` of the cleaned staging table before the DQ/write
  fan-out, fixing the reference's 12-action recompute waste
  (SURVEY.md §3 step 6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from udacity_dend_capstone_immigration_spark.functions.cleaning import (
    invalid_country_to_na,
    port_city,
    port_state_code,
    valid_birth_year,
)
from udacity_dend_capstone_immigration_spark.functions.dates import sas_date_to_date, sas_date_to_iso_string
from udacity_dend_capstone_immigration_spark.sources.readers import from_pairs
from udacity_dend_capstone_immigration_spark.sources.sas_labels import parse_sas_labels

#: Explicit demographics CSV schema (reference etl.py:143-158).
DEMOGRAPHICS_SCHEMA = StructType(
    [
        StructField("city", StringType()),
        StructField("state", StringType()),
        StructField("median_age", DoubleType()),
        StructField("male_population", IntegerType()),
        StructField("female_population", IntegerType()),
        StructField("total_population", IntegerType()),
        StructField("number_of_veterans", IntegerType()),
        StructField("foreign_born", IntegerType()),
        StructField("average_household_size", DoubleType()),
        StructField("state_code", StringType()),
        StructField("race", StringType()),
        StructField("count", IntegerType()),
    ]
)

#: (label_name, code_col, value_col) per dim (reference etl.py:161-228).
LABEL_DIMS = {
    "countries": ("I94RES", "country_code", "country_name"),
    "ports": ("I94PORT", "port_code", "port_name"),
    "states": ("I94ADDR", "state_code", "state_name"),
    "travel_modes": ("I94MODE", "mode_id", "mode_name"),
    "visa_categories": ("I94VISA", "visa_category_id", "visa_category"),
}


def build_label_dims(spark: SparkSession, labels_text: str) -> dict[str, DataFrame]:
    """Parse all 5 SAS-label dims (S4+S5) into broadcast-size DataFrames."""
    return {
        name: from_pairs(spark, parse_sas_labels(labels_text, label), (code, value))
        for name, (label, code, value) in LABEL_DIMS.items()
    }


def clean_immigration(df: DataFrame, compat: bool = True) -> DataFrame:
    """Reference etl.py:231-243: SAS-date conversion on arrdate/depdate,
    birth-year validation, exact dedup.

    ``compat=True``: ISO *strings* and stringified-double birth years with
    the falsy-zero quirk — bit-compatible with the reference's UDF output.
    ``compat=False``: proper DateType/IntegerType.
    """
    if compat:
        arr = sas_date_to_iso_string("arrdate", compat_falsy_zero=True)
        dep = sas_date_to_iso_string("depdate", compat_falsy_zero=True)
        yr = valid_birth_year("biryear", as_string=True)
    else:
        arr = sas_date_to_date("arrdate", compat_falsy_zero=False)
        dep = sas_date_to_date("depdate", compat_falsy_zero=False)
        yr = valid_birth_year("biryear", as_string=False)
    return (
        df.withColumn("arrdate", arr)
        .withColumn("depdate", dep)
        .withColumn("biryear", yr)
        .dropDuplicates()
    )


def clean_demographics(df: DataFrame) -> DataFrame:
    """Reference etl.py:246-249."""
    return df.dropDuplicates()


def clean_ports(df: DataFrame) -> DataFrame:
    """Reference etl.py:252-263: split 'City, ST', drop rows with any
    null (non-US / 'No PORT Code' rows), dedup."""
    return (
        df.withColumn("city", port_city("port_name"))
        .withColumn("state_code", port_state_code("port_name"))
        .drop("port_name")
        .na.drop()
        .dropDuplicates()
    )


def clean_countries(df: DataFrame) -> DataFrame:
    """Reference etl.py:266-269."""
    return df.withColumn("country_name", invalid_country_to_na("country_name"))


def clean_states(df: DataFrame) -> DataFrame:
    """Reference etl.py:272-275: drop the 'All Other Codes' 99 row."""
    return df.filter("state_code != '99'")


#: fact column projection (reference etl.py:292-311): (output, source).
FACT_COLUMNS = [
    ("cicid", "sid.cicid"),
    ("entry_year", "sid.i94yr"),
    ("entry_month", "sid.i94mon"),
    ("origin_country_code", "sc.country_code"),
    ("port_code", "sp.port_code"),
    ("arrival_date", "sid.arrdate"),
    ("travel_mode_code", "stm.mode_id"),
    ("us_state_code", "sus.state_code"),
    ("departure_date", "sid.depdate"),
    ("age", "sid.i94bir"),
    ("visa_category_code", "svc.visa_category_id"),
    ("occupation", "sid.occup"),
    ("gender", "sid.gender"),
    ("birth_year", "sid.biryear"),
    ("entry_date", "sid.dtaddto"),
    ("airline", "sid.airline"),
    ("admission_number", "sid.admnum"),
    ("flight_number", "sid.fltno"),
    ("visa_type", "sid.visatype"),
]


def build_fact(
    immigration: DataFrame,
    countries: DataFrame,
    states: DataFrame,
    ports: DataFrame,
    visa_categories: DataFrame,
    travel_modes: DataFrame,
) -> DataFrame:
    """Reference etl.py:278-324 as 5 inner broadcast joins + the 19-col
    projection. Join keys are string dim codes vs double fact columns —
    Spark's implicit coercion (ANSI off) matches the reference row-for-row
    (J2 semantics, SURVEY.md §2.3).

    At scale: each dim is ≤660 rows → all five joins are broadcast hash
    joins; the fact table streams through one codegen stage with zero
    shuffles.
    """
    sid = immigration.alias("sid")
    joined = (
        sid.join(F.broadcast(countries.alias("sc")), F.col("sc.country_code") == F.col("sid.i94res"))
        .join(F.broadcast(ports.alias("sp")), F.col("sp.port_code") == F.col("sid.i94port"))
        .join(F.broadcast(states.alias("sus")), F.col("sus.state_code") == F.col("sid.i94addr"))
        .join(
            F.broadcast(visa_categories.alias("svc")),
            F.col("svc.visa_category_id") == F.col("sid.i94visa"),
        )
        .join(F.broadcast(travel_modes.alias("stm")), F.col("stm.mode_id") == F.col("sid.i94mode"))
    )
    return joined.select([F.col(src).alias(dst) for dst, src in FACT_COLUMNS])


def build_city_demographics(demographics: DataFrame, ports: DataFrame) -> DataFrame:
    """Reference etl.py:327-357: per-(city, state) SUM rollup of the
    per-race rows, then case-insensitive inner join to cleaned ports."""
    agg = demographics.groupBy("city", "state_code").agg(
        F.sum("male_population").alias("male_population"),
        F.sum("female_population").alias("female_population"),
        F.sum("total_population").alias("total_population"),
        F.sum("number_of_veterans").alias("number_of_veterans"),
        F.sum("foreign_born").alias("num_foreign_born"),
    )
    sp = ports.alias("sp")
    cd = agg.alias("cd")
    return sp.join(
        F.broadcast(cd),
        (F.lower(F.col("cd.city")) == F.lower(F.col("sp.city")))
        & (F.col("cd.state_code") == F.col("sp.state_code")),
    ).select(F.col("sp.port_code").alias("port_code"), "cd.*")


@dataclass
class PipelineResult:
    fact: DataFrame
    city_demographics: DataFrame
    dims: dict[str, DataFrame]


def run_pipeline(
    spark: SparkSession,
    immigration: DataFrame,
    demographics: DataFrame,
    labels_text: str,
    compat: bool = True,
) -> PipelineResult:
    """Full load→clean→build flow (reference etl.py:28-61).

    The cleaned staging table is cached before the fact build: the
    reference recomputed the whole join DAG for each of its 12 DQ count
    actions and 7 writes (SURVEY.md §3 step 6); one ``.cache()`` turns
    that fan-out into a single materialization.
    """
    dims = build_label_dims(spark, labels_text)
    cleaned = clean_immigration(immigration, compat=compat).cache()
    countries = clean_countries(dims["countries"])
    ports = clean_ports(dims["ports"])
    states = clean_states(dims["states"])
    fact = build_fact(cleaned, countries, states, ports, dims["visa_categories"], dims["travel_modes"])
    city_demo = build_city_demographics(clean_demographics(demographics), ports)
    return PipelineResult(
        fact=fact,
        city_demographics=city_demo,
        dims={
            "countries": countries,
            "ports": ports,
            "states": states,
            "travel_modes": dims["travel_modes"],
            "visa_categories": dims["visa_categories"],
        },
    )
