"""Source layer (S1-S4; reference etl.py:128-158)."""

import pytest

from udacity_dend_capstone_immigration_spark.sources.readers import (
    first_available,
    from_pairs,
    read_csv_with_schema,
)
from udacity_dend_capstone_immigration_spark.plans.immigration_etl import DEMOGRAPHICS_SCHEMA


def test_from_pairs(spark):
    df = from_pairs(spark, [("1", "Air"), ("2", "Sea")], ("mode_id", "mode_name"))
    assert df.columns == ["mode_id", "mode_name"]
    assert df.schema["mode_id"].dataType.typeName() == "string"
    assert df.count() == 2


def test_csv_with_schema_semicolon(spark, tmp_path):
    p = tmp_path / "demo.csv"
    p.write_text(
        "City;State;Median Age;Male Population;Female Population;"
        "Total Population;Number of Veterans;Foreign-born;"
        "Average Household Size;State Code;Race;Count\n"
        "Boston;Massachusetts;33.0;40;45;85;2;9;2.1;MA;White;50\n"
    )
    df = read_csv_with_schema(spark, str(p), DEMOGRAPHICS_SCHEMA, sep=";")
    row = df.collect()[0]
    assert row["city"] == "Boston"
    assert row["male_population"] == 40
    assert abs(row["average_household_size"] - 2.1) < 1e-12


def test_first_available_fallback(spark, tmp_path):
    pq = tmp_path / "t.parquet"
    spark.createDataFrame([(1,)], "a int").write.parquet(str(pq))
    df = first_available(
        spark,
        [("com.github.saurfang.sas.spark", str(tmp_path / "missing.sas7bdat")),
         ("parquet", str(pq))],
    )
    assert df.count() == 1


def test_first_available_raises_when_none_exist(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        first_available(spark, [("parquet", str(tmp_path / "nope"))])
