"""Privacy-mechanism operators (r14 staging — see operators/privacy.py)."""

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.privacy import (
    randomized_response,
    rr_debias,
    suppress_small_groups,
)


def test_randomized_response_deterministic_and_in_domain(spark):
    cats = ["a", "b", "c"]
    df = spark.range(2000).select(
        F.col("id"), F.lit("a").alias("v")
    )
    out = df.select(
        "id", randomized_response(F.col("v"), cats, F.col("id")).alias("r")
    )
    rows1 = {r["id"]: r["r"] for r in out.collect()}
    rows2 = {r["id"]: r["r"] for r in out.collect()}
    assert rows1 == rows2  # deterministic replay
    assert set(rows1.values()) <= set(cats)
    kept = sum(1 for v in rows1.values() if v == "a")
    # keep=800/1000 plus uniform draws landing on 'a': E[frac] ~ 0.8+0.2/3
    assert 0.82 <= kept / 2000 <= 0.91


def test_rr_debias_recovers_expectation_exactly(spark):
    """On EXACT expected reported counts the estimator inverts the
    mechanism algebraically: n_hat == n_c for every class."""
    k, keep = 4, 800
    n = 10_000
    true = {"a": 4000, "b": 3000, "c": 2000, "d": 1000}
    rows = []
    for c, n_c in true.items():
        reported = n_c * (keep / 1000) + n * ((1 - keep / 1000) / k)
        rows.append((c, float(reported)))
    df = spark.createDataFrame(rows, "cat string, reported double")
    est = df.select(
        "cat",
        rr_debias(F.col("reported"), F.lit(n), k, keep).alias("n_hat"),
    ).collect()
    for r in est:
        assert abs(r["n_hat"] - true[r["cat"]]) < 1e-6


def test_suppress_small_groups_drops_exactly_the_small(spark):
    rows = [("x", i) for i in range(7)] + [("y", i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, i long")
    out = suppress_small_groups(df, ["g"], k=5).collect()
    assert {r["g"] for r in out} == {"x"}
    assert len(out) == 7


def test_suppress_small_groups_null_qi_survives(spark):
    """HAVING semantics for NULL quasi-identifiers (r13 advice): GROUP
    BY folds NULLs into one group, so a NULL-keyed group with >= k rows
    survives the release — a plain inner equi-join dropped it."""
    rows = (
        [(None, "x", i) for i in range(6)]
        + [(None, "y", i) for i in range(2)]
        + [("a", None, i) for i in range(5)]
        + [("a", "z", i) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "g1 string, g2 string, i long")
    out = suppress_small_groups(df, ["g1", "g2"], k=5).collect()
    got = {(r["g1"], r["g2"]) for r in out}
    assert got == {(None, "x"), ("a", None)}
    assert len(out) == 11
    # and the broadcast-ability of the size side is preserved: the
    # join keys are null-safe EQUI keys, not a theta join
    plan = suppress_small_groups(df, ["g1", "g2"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_enforce_l_diversity_homogeneity_and_null_qi(spark):
    """Distinct l-diversity drops the homogeneity-attackable group a
    size-only gate keeps: a big group whose sensitive value is constant
    goes; a NULL-QI group with enough distinct sensitive values
    survives (HAVING semantics, same null-safe join as the k-anon
    release); equi-join shape preserved."""
    from udacity_dend_capstone_immigration_spark.operators.privacy import (
        enforce_l_diversity,
    )

    rows = (
        [("big_homog", f"s0")] * 8  # 8 rows, ONE sensitive value
        + [("diverse", f"s{i}") for i in range(4)]  # 4 rows, 4 values
        + [(None, f"s{i % 3}") for i in range(6)]  # NULL QI, 3 values
    )
    df = spark.createDataFrame(rows, "g string, s string")
    out = enforce_l_diversity(df, ["g"], "s", l=3).collect()
    got = {r["g"] for r in out}
    assert got == {"diverse", None}
    assert len(out) == 10
    plan = (
        enforce_l_diversity(df, ["g"], "s", l=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_randomized_response_duckdb_replicable(spark):
    """The r14 oracle stage-gate: DuckDB reproduces the Spark release
    bit-for-bit from the same md5-derived coins (the mechanism is a
    pure function of (seed, salt) — what makes a driver oracle
    possible)."""
    import duckdb

    cats = ["click", "error", "purchase", "signup", "view"]
    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select("event_id", "event_type")
    got = {
        r["event_id"]: r["rr"]
        for r in ev.select(
            "event_id",
            randomized_response(
                F.col("event_type"), cats, F.col("event_id")
            ).alias("rr"),
        ).collect()
    }
    arr = "[" + ", ".join(f"'{c}'" for c in cats) + "]"
    want = dict(
        duckdb.sql(
            f"""
        SELECT event_id,
               CASE WHEN ('0x' || substring(md5('rr:keep:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 1000 < 800
                    THEN event_type
                    ELSE {arr}[CAST(('0x' || substring(md5('rr:draw:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 5 AS INT) + 1]
               END AS rr
        FROM read_parquet('{sf}/events.parquet')
        """
        ).fetchall()
    )
    assert got == want and len(got) > 900


def test_suppression_release_duckdb_replicable(spark):
    """r14 stage-gate for `events_k_anonymity_release`: the suppressed
    release's per-type surviving rows/groups match DuckDB's HAVING
    form exactly (same QI tuple as the audit query)."""
    import duckdb

    from udacity_dend_capstone_immigration_spark.workload.base import read_events

    sf = "/root/testdata/sf0.001"
    # read_events, never a raw parquet read — the ts physical type
    # varies by testdata generation (CLAUDE.md events-ingest rule)
    ev = read_events(spark, sf).select(
        "event_type",
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") / F.lit(50.0)).alias("band"),
        "user_id",
    )
    rel = suppress_small_groups(ev, ["event_type", "hod", "band"], k=5)
    got = sorted(
        map(
            tuple,
            rel.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct("hod", "band").cast("bigint").alias("n_groups"),
            )
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"""
        WITH qi AS (
            SELECT event_type, EXTRACT(hour FROM ts) AS hod,
                   FLOOR(value / 50.0e0) AS band, COUNT(*) AS gsz
            FROM read_parquet('{sf}/events.parquet')
            GROUP BY 1, 2, 3 HAVING COUNT(*) >= 5
        )
        SELECT event_type, CAST(SUM(gsz) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups
        FROM qi GROUP BY event_type
        """
            ).fetchall(),
        )
    )
    assert got == want and len(got) >= 3


def test_hash_kfold_stable_and_duckdb_replicable(spark):
    """r14 stage-gate for a kfold query: fold assignment is stable
    across runs and DuckDB reproduces it from the same md5 buckets."""
    import duckdb

    from udacity_dend_capstone_immigration_spark.operators.curation import hash_kfold

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id")
    out = hash_kfold(docs, "doc_id", folds=5)
    got = {r["doc_id"]: r["fold"] for r in out.collect()}
    again = {r["doc_id"]: r["fold"] for r in out.collect()}
    assert got == again and set(got.values()) == set(range(5))
    want = dict(
        duckdb.sql(
            f"""
        SELECT doc_id,
               CAST(('0x' || substring(md5('kfold:' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 1000 % 5 AS INT) AS fold
        FROM read_parquet('{sf}/documents.parquet')
        """
        ).fetchall()
    )
    assert got == want
