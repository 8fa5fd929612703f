"""S1: real SAS7BDAT reads (reference etl.py:89, 133-135) without the
saurfang JVM connector.

The fixture writer (tests/fixtures/sas7bdat_writer.py) emits the public
uncompressed 32-bit format; ``pandas.read_sas`` — an independent
third-party parser of that format — is the acceptance bar for the bytes,
and the engine's executor-side reader is then tested on top.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.fixtures.sas7bdat_writer import make_immigration_like_frame, write_sas7bdat
from udacity_dend_capstone_immigration_spark.sources.readers import first_available
from udacity_dend_capstone_immigration_spark.sources.sas7bdat import read_sas7bdat, sas7bdat_schema


@pytest.fixture(scope="module")
def sas_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("sas")
    path = d / "i94_fixture.sas7bdat"
    pdf = make_immigration_like_frame(n=20)
    write_sas7bdat(str(path), pdf)
    return str(path), pdf


def test_pandas_parses_fixture_bitexact(sas_file):
    path, pdf = sas_file
    got = pd.read_sas(path, format="sas7bdat", encoding="infer")
    assert list(got.columns) == list(pdf.columns)
    assert len(got) == len(pdf)
    for c in ["cicid", "i94yr", "i94mon", "arrdate", "i94visa"]:
        assert np.array_equal(got[c].to_numpy(), pdf[c].to_numpy())
    # NaN doubles survive
    assert np.array_equal(np.isnan(got["i94res"]), np.isnan(pdf["i94res"]))
    got_ok = got["i94res"].dropna().to_numpy()
    assert np.array_equal(got_ok, pdf["i94res"].dropna().to_numpy())
    # strings: SAS blank-missing — empty writes read back as NaN
    for g, w in zip(got["gender"], pdf["gender"]):
        if w == "":
            assert isinstance(g, float) and math.isnan(g)
        else:
            assert g == w


def test_schema_header_only(sas_file):
    path, pdf = sas_file
    schema = sas7bdat_schema(path)
    assert [f.name for f in schema.fields] == list(pdf.columns)
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types["cicid"] == "double"
    assert types["gender"] == "string"
    assert types["visatype"] == "string"


def test_spark_read_matches_frame(spark, sas_file):
    path, pdf = sas_file
    df = read_sas7bdat(spark, path)
    rows = {r["cicid"]: r for r in df.collect()}
    assert len(rows) == len(pdf)
    for _, want in pdf.iterrows():
        got = rows[want["cicid"]]
        assert got["visatype"] == want["visatype"]
        assert got["gender"] == (None if want["gender"] == "" else want["gender"])
        if math.isnan(want["i94res"]):
            assert got["i94res"] is None or math.isnan(got["i94res"])
        else:
            assert got["i94res"] == want["i94res"]


def test_spark_read_directory_multifile_and_chunked(spark, tmp_path):
    """Parallelism unit is the file; chunk_rows < nrows exercises the
    bounded-memory streaming path within a file."""
    a = make_immigration_like_frame(n=13, seed=1)
    b = make_immigration_like_frame(n=17, seed=2)
    b["cicid"] = b["cicid"] + 1000.0
    write_sas7bdat(str(tmp_path / "part1.sas7bdat"), a)
    write_sas7bdat(str(tmp_path / "part2.sas7bdat"), b)
    df = read_sas7bdat(spark, str(tmp_path), chunk_rows=5)
    assert df.count() == 30
    assert df.rdd.getNumPartitions() == 2
    cicids = {r["cicid"] for r in df.select("cicid").collect()}
    assert set(a["cicid"]) | set(b["cicid"]) == cicids


def test_first_available_prefers_real_sas(spark, tmp_path):
    """The reference's S1 branch end-to-end: SAS file present wins over
    the parquet fallback and yields the same schema the parquet path
    would (etl.py:133-138 loads either into one downstream pipeline)."""
    pdf = make_immigration_like_frame(n=8)
    sas = tmp_path / "i94_apr16_sub.sas7bdat"
    write_sas7bdat(str(sas), pdf)
    pq = tmp_path / "sas_data"
    spark.createDataFrame(pdf).write.parquet(str(pq))

    via_sas = first_available(
        spark, [("sas7bdat", str(sas)), ("parquet", str(pq))]
    )
    via_parquet = first_available(
        spark, [("sas7bdat", str(tmp_path / "missing.sas7bdat")), ("parquet", str(pq))]
    )
    assert via_sas.count() == 8
    assert [f.name for f in via_sas.schema.fields] == [f.name for f in via_parquet.schema.fields]
    assert {f.dataType.simpleString() for f in via_sas.schema.fields} == {"double", "string"}


def test_multipage_file(spark, tmp_path):
    """More rows than fit one page: the page-chained data path works and
    row order across pages is preserved by the sequential per-file scan."""
    n = 2000
    pdf = pd.DataFrame(
        {
            "k": np.arange(n, dtype=np.float64),
            "v": [f"row{i:04d}" for i in range(n)],
        }
    )
    path = tmp_path / "big.sas7bdat"
    write_sas7bdat(str(path), pdf, page_size=4096)
    got = pd.read_sas(str(path), format="sas7bdat", encoding="infer")
    assert len(got) == n
    assert np.array_equal(got["k"].to_numpy(), pdf["k"].to_numpy())
    assert got["v"].iloc[-1] == "row1999"
    df = read_sas7bdat(spark, str(path), chunk_rows=300)
    assert df.count() == n
    assert df.agg({"k": "sum"}).collect()[0][0] == float(n * (n - 1) / 2)


def test_python_datasource_format_matches_mapinpandas_reader(spark, tmp_path):
    """spark.read.format("sas7bdat") — the Spark 4 Python Data Source
    wrapper — must return exactly what the mapInPandas reader returns,
    with one input partition per file."""
    from udacity_dend_capstone_immigration_spark.sources.sas7bdat import (
        SAS7BDATDataSource,
        read_sas7bdat,
    )

    d = tmp_path / "sasdir"
    d.mkdir()
    import pandas as pd

    for i, rows in enumerate(([(1.0, "ab"), (2.0, "")], [(3.0, "cd")])):
        write_sas7bdat(
            str(d / f"f{i}.sas7bdat"),
            pd.DataFrame(rows, columns=["num", "txt"]),
        )
    spark.dataSource.register(SAS7BDATDataSource)
    via_format = spark.read.format("sas7bdat").load(str(d))
    assert via_format.rdd.getNumPartitions() == 2
    got = {tuple(r) for r in via_format.collect()}
    want = {tuple(r) for r in read_sas7bdat(spark, str(d)).collect()}
    assert got == want
    assert (1.0, "ab") in got and (2.0, None) in got and (3.0, "cd") in got


def test_python_datasource_all_null_string_chunk_keeps_declared_type(spark, tmp_path):
    """r12 advice: RecordBatch.from_pandas without the declared schema
    infers Arrow type null for an all-missing string column, failing
    the read. The reader now passes the schema explicitly."""
    from udacity_dend_capstone_immigration_spark.sources.sas7bdat import SAS7BDATDataSource

    d = tmp_path / "sasnull"
    d.mkdir()
    import pandas as pd

    # every string value blank → SAS blank-missing → all-None column
    write_sas7bdat(
        str(d / "allnull.sas7bdat"),
        pd.DataFrame([(1.0, ""), (2.0, "")], columns=["num", "txt"]),
    )
    spark.dataSource.register(SAS7BDATDataSource)
    got = spark.read.format("sas7bdat").load(str(d))
    assert dict(got.dtypes) == {"num": "double", "txt": "string"}
    rows = {tuple(r) for r in got.collect()}
    assert rows == {(1.0, None), (2.0, None)}
