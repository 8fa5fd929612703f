"""End-to-end star-schema ETL parity (reference etl.py:28-82) on the
reference-shaped fixtures from FIXTURES.md §B.

The staging rows are hand-crafted so every cleaning/join edge fires:
falsy-zero dates, out-of-range birth years, unmatched dim codes (dropped
by the inner-join semantics), an exact duplicate row, case-mismatched
demographics city names, and the '99' state / 'No PORT Code' rows.
"""

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.plans.immigration_etl import (
    DEMOGRAPHICS_SCHEMA,
    FACT_COLUMNS,
    build_label_dims,
    clean_ports,
    run_pipeline,
)

LABELS = (Path(__file__).parent / "fixtures" / "labels.SAS").read_text()

IMMIGRATION_COLS = (
    "cicid double, i94yr double, i94mon double, i94cit double, i94res double, "
    "i94port string, arrdate double, i94mode double, i94addr string, "
    "depdate double, i94bir double, i94visa double, count double, "
    "dtadfile string, visapost string, occup string, entdepa string, "
    "entdepd string, entdepu string, matflag string, biryear double, "
    "dtaddto string, gender string, insnum string, airline string, "
    "admnum double, fltno string, visatype string"
)


def _stage_row(
    cicid,
    i94res=101.0,
    i94port="NYC",
    i94addr="NY",
    i94visa=2.0,
    i94mode=1.0,
    arrdate=20566.0,
    depdate=20570.0,
    biryear=1980.0,
):
    return (
        cicid, 2016.0, 4.0, i94res, i94res, i94port, arrdate, i94mode,
        i94addr, depdate, 36.0, i94visa, 1.0, "20160421", None, None, "G",
        "O", None, "M", biryear, "07202016", "M", None, "UA", 1e10 + cicid,
        "0012", "WT",
    )


@pytest.fixture(scope="module")
def staging(spark):
    rows = [
        _stage_row(1.0),                                   # clean row
        _stage_row(1.0),                                   # exact duplicate → dropped
        _stage_row(2.0, arrdate=0.0, depdate=None),        # falsy-zero + null dates
        _stage_row(3.0, biryear=1899.0),                   # birth year below bound → null
        _stage_row(4.0, biryear=2016.0),                   # inclusive upper bound → kept
        _stage_row(5.0, i94res=999.0),                     # unmatched country → dropped by join
        _stage_row(6.0, i94port="XXX"),                    # 'No PORT Code' → dropped (port cleaning)
        _stage_row(7.0, i94addr="ZZ"),                     # unmatched state → dropped by join
        _stage_row(8.0, i94visa=3.0),                      # student visa
        _stage_row(9.0, i94mode=9.0, i94port="BOS", i94addr="MA"),
    ]
    return spark.createDataFrame(rows, IMMIGRATION_COLS)


@pytest.fixture(scope="module")
def demographics(spark):
    rows = [
        # two race rows for the same city → summed by the rollup
        ("New York", "New York", 35.0, 100, 110, 210, 5, 20, 2.5, "NY", "White", 120),
        ("New York", "New York", 35.0, 100, 110, 210, 5, 20, 2.5, "NY", "Asian", 90),
        # duplicate row → dropped before rollup
        ("New York", "New York", 35.0, 100, 110, 210, 5, 20, 2.5, "NY", "Asian", 90),
        # case differs from the port city 'BOSTON' → lower() join still hits
        ("boston", "Massachusetts", 33.0, 40, 45, 85, 2, 9, 2.1, "MA", "White", 50),
        # city absent from ports → dropped by inner join
        ("Nowhere", "Kansas", 50.0, 1, 1, 2, 0, 0, 1.0, "KS", "White", 2),
    ]
    return spark.createDataFrame(rows, DEMOGRAPHICS_SCHEMA)


@pytest.fixture(scope="module")
def result(spark, staging, demographics):
    return run_pipeline(spark, staging, demographics, LABELS, compat=True)


def test_fact_has_19_reference_columns(result):
    assert result.fact.columns == [dst for dst, _ in FACT_COLUMNS]


def test_fact_row_filtering(result):
    # 10 staged - 1 dup - 3 unmatched-dim rows (cicid 5, 6, 7) = 6
    rows = {r["cicid"]: r for r in result.fact.collect()}
    assert set(rows) == {1.0, 2.0, 3.0, 4.0, 8.0, 9.0}


def test_compat_cleaning_semantics(result):
    rows = {r["cicid"]: r for r in result.fact.collect()}
    assert rows[1.0]["arrival_date"] == "2016-04-22"       # ISO string, not date
    assert rows[2.0]["arrival_date"] is None               # falsy-zero quirk
    assert rows[2.0]["departure_date"] is None             # true null
    assert rows[3.0]["birth_year"] is None                 # 1899 < 1900
    assert rows[4.0]["birth_year"] == "2016.0"             # inclusive + stringified
    assert rows[8.0]["visa_category_code"] == "3"          # joined dim code (string)
    assert rows[9.0]["travel_mode_code"] == "9"


def test_fixed_mode_produces_typed_columns(spark, staging, demographics):
    import datetime

    fixed = run_pipeline(spark, staging, demographics, LABELS, compat=False)
    rows = {r["cicid"]: r for r in fixed.fact.collect()}
    assert rows[1.0]["arrival_date"] == datetime.date(2016, 4, 22)
    assert rows[4.0]["birth_year"] == 2016


def test_port_cleaning(spark):
    dims = build_label_dims(spark, LABELS)
    ports = clean_ports(dims["ports"])
    rows = {r["port_code"]: r for r in ports.collect()}
    assert "XXX" not in rows                  # no-comma row dropped by na.drop
    assert rows["ANC"]["city"] == "ANCHORAGE"
    assert rows["ANC"]["state_code"] == "AK"
    assert rows["ZZZ"]["state_code"] == "FAR"  # split(',')[1] semantics


def test_city_demographics_rollup_and_join(result):
    rows = {r["port_code"]: r for r in result.city_demographics.collect()}
    # NYC summed across 2 race rows; boston matched case-insensitively;
    # Nowhere/KS dropped
    assert set(rows) == {"NYC", "BOS"}
    ny = rows["NYC"]
    assert ny["male_population"] == 200
    assert ny["total_population"] == 420
    assert ny["num_foreign_born"] == 40
    assert rows["BOS"]["city"] == "boston"


def test_cleaned_dims(result):
    states = {r["state_code"] for r in result.dims["states"].collect()}
    assert "99" not in states
    countries = dict(result.dims["countries"].collect())
    assert countries["103"] == "NA"            # 'No Country Code' → NA
    assert countries["104"] == "NA"            # INVALID → NA
    assert countries["105"] == "NA"            # Collapsed → NA
    assert countries["101"] == "ALPHALAND"
