"""Native-expression replacements for the reference's 4 Python UDFs
(F1-F4; reference etl.py:236-237, 254-256, 266-269) — the subtle
semantics SURVEY.md §5 lists as mandatory unit coverage.
"""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.functions.cleaning import (
    invalid_country_to_na,
    port_city,
    port_state_code,
    valid_birth_year,
)
from udacity_dend_capstone_immigration_spark.functions.dates import (
    sas_date_to_date,
    sas_date_to_iso_string,
)


def _vals(spark, data, expr):
    df = spark.createDataFrame([Row(x=v) for v in data])
    return [r[0] for r in df.select(expr).collect()]


class TestSasDate:
    def test_compat_falsy_zero_maps_day0_to_null(self, spark):
        # reference UDF guard `if x else None` (etl.py:236): day 0 == null
        out = _vals(spark, [0.0, None, 20566.0], sas_date_to_iso_string("x", True))
        assert out == [None, None, "2016-04-22"]

    def test_fixed_mode_keeps_epoch_day(self, spark):
        out = _vals(spark, [0.0, 1.0], sas_date_to_date("x", compat_falsy_zero=False))
        assert out == [datetime.date(1960, 1, 1), datetime.date(1960, 1, 2)]

    def test_negative_offsets_go_backwards(self, spark):
        out = _vals(spark, [-1.0], sas_date_to_date("x", compat_falsy_zero=False))
        assert out == [datetime.date(1959, 12, 31)]


class TestBirthYear:
    def test_bounds_inclusive_1900_2016(self, spark):
        data = [1899.0, 1900.0, 2016.0, 2017.0, None]
        out = _vals(spark, data, valid_birth_year("x"))
        assert out == [None, 1900, 2016, None, None]

    def test_compat_stringified_double(self, spark):
        # reference UDF returns str(double) → '1955.0' (SURVEY.md §1.2)
        out = _vals(spark, [1955.0], valid_birth_year("x", as_string=True))
        assert out == ["1955.0"]


class TestPortSplit:
    def test_no_comma_yields_null_state(self, spark):
        out = _vals(spark, ["No PORT Code (XXX)"], port_state_code("x"))
        assert out == [None]

    def test_one_comma(self, spark):
        assert _vals(spark, ["ANCHORAGE, AK"], port_city("x")) == ["ANCHORAGE"]
        assert _vals(spark, ["ANCHORAGE, AK"], port_state_code("x")) == ["AK"]

    def test_two_commas_takes_second_element_not_rest(self, spark):
        # reference split(',')[1] takes the SECOND element, not the tail
        assert _vals(spark, ["SOMEWHERE, FAR, AWAY"], port_state_code("x")) == ["FAR"]
        assert _vals(spark, ["SOMEWHERE, FAR, AWAY"], port_city("x")) == ["SOMEWHERE"]


class TestCountryRegex:
    def test_alternation_cases(self, spark):
        data = [
            "No Country Code (999)",
            "INVALID: UNKNOWN",
            "Collapsed (historic)",
            "GAMMARA",
        ]
        out = _vals(spark, data, invalid_country_to_na("x"))
        assert out == ["NA", "NA", "NA", "GAMMARA"]

    def test_case_sensitive_no_false_positive(self, spark):
        # 'no country' lowercase is NOT matched (regex is case-sensitive)
        out = _vals(spark, ["no country here"], invalid_country_to_na("x"))
        assert out == ["no country here"]


class TestCrossTypeCoercion:
    def test_string_code_joins_double_column(self, spark):
        # J2/F7 (reference etl.py:313-317): '582' must match 582.0 with
        # ANSI off — the engine pins this in session config
        fact = spark.createDataFrame([(582.0,), (583.0,)], "code double")
        dim = spark.createDataFrame([("582", "MEXICO")], "code string, name string")
        out = fact.join(dim, fact.code == dim.code).select("name").collect()
        assert [r[0] for r in out] == ["MEXICO"]

    def test_string_column_equals_int_literal(self, spark):
        # notebook cell 47: visa_category_code = 3 on a string column
        df = spark.createDataFrame([("3",), ("2",)], "v string")
        assert df.where(F.col("v") == 3).count() == 1


def test_pii_redaction_and_counts(spark):
    from udacity_dend_capstone_immigration_spark.functions.text import pii_counts, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (0, "Contact Bob.Smith+x@Example.COM or see https://ex.com/a?b=12 room 4211"),
            (1, "no pii here, just words and a lone digit 7"),
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *pii_counts("text").values(), redact_pii("text").alias("red")
        ).collect()
    }
    assert rows[0]["n_email"] == 1
    assert rows[0]["n_url"] == 1
    assert rows[0]["n_digit_run"] >= 2  # 12 inside the url + 4211
    assert rows[0]["red"] == "contact [EMAIL] or see [URL] room [NUM]"
    assert rows[1]["n_email"] == 0 and rows[1]["n_url"] == 0
    assert rows[1]["red"] == "no pii here, just words and a lone digit 7"
