"""Bucketed-table co-located join: writing both join sides bucketed by
the join key lets the sort-merge join read pre-partitioned data with NO
shuffle exchange — the layout strategy for repeated big-big joins at
scale (SURVEY.md §7's bucketing note)."""

import contextlib
import io

import pytest


@pytest.fixture(scope="module")
def warehouse_session(spark):
    # bucketing requires saveAsTable; the session's default warehouse
    # (./spark-warehouse, gitignored) is used since warehouse.dir is a
    # static conf that cannot be retargeted at runtime
    yield spark
    for t in ("b_lineitem", "b_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(warehouse_session):
    spark = warehouse_session
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )
    # disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey,
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffled"
        # sanity: result matches the unbucketed join
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_roundtrip_query_plan(spark):
    """The registered query's executed plan must show the co-located
    shape: both scans bucketed, a SortMergeJoin with no Exchange under
    it — the ONLY Exchange in the whole plan is the post-join
    aggregation (which carries 5 priority rows, not the fact tables).
    The write side must leave exactly one file per bucket (the
    small-files guardrail in write_bucketed)."""
    import glob

    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    df = QUERIES["bucketed_join_roundtrip"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert plan.count("Exchange") == 1, f"join side shuffled:\n{plan}"
    # table names carry a per-run uuid suffix (r10 ADVICE: fixed names
    # orphan previous external locations and race concurrent sessions) —
    # resolve this run's orders table from the executed plan
    import re

    m = re.search(r"bt_orders_[0-9a-f]{8}", plan)
    assert m, plan
    loc = spark.sql(f"DESCRIBE TABLE EXTENDED {m.group(0)}").collect()
    path = next(r.data_type for r in loc if r.col_name == "Location")
    files = glob.glob(f"{path.removeprefix('file:')}/*.parquet")
    assert len(files) == 8, f"expected one file per bucket, got {len(files)}"
    # lossless: values match the plain parquet join
    got = {r.o_orderpriority: (r.line_cnt, round(r.total_price, 2)) for r in df.collect()}
    assert len(got) == 5 and all(c > 0 for c, _ in got.values())
