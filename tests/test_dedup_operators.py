"""Dedup operator semantics on hand-checkable corpora."""

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.functions.text import tokenize
from udacity_dend_capstone_immigration_spark.operators.dedup import (
    exact_dedup_by_fingerprint,
    jaccard_verified_pairs,
    lsh_candidate_pairs,
    minhash_lsh_dedup_pairs,
    minhash_signature,
    minhash_signatures_agg,
    shingle_rows,
    shingle_sets,
    simhash64,
)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_exact_dedup_keeps_min_id_and_counts(spark):
    df = _docs(spark, ["Hello World!", "hello, world", "different doc entirely"])
    out = {r["doc_id"]: r for r in exact_dedup_by_fingerprint(df, "doc_id", "text").collect()}
    # normalization makes the first two identical; min-id representative
    assert set(out) == {0, 2}
    assert out[0]["dup_count"] == 2
    assert out[2]["dup_count"] == 1


def test_shingles_drop_short_docs(spark):
    df = _docs(spark, ["one two", "one two three four"])
    out = shingle_sets(df, "doc_id", "text", 3).collect()
    assert [r["doc_id"] for r in out] == [1]
    assert sorted(out[0]["shingles"]) == ["one two three", "two three four"]


def test_minhash_agg_matches_hof_signature(spark):
    # the codegen-friendly explode/agg path must produce the exact same
    # signature values as the HOF definition
    df = _docs(spark, ["the quick brown fox jumps over the lazy dog", "pack my box with five dozen jugs"])
    sh = shingle_sets(df, "doc_id", "text", 3)
    hof = sh.select("doc_id", minhash_signature(F.col("shingles"), 8).alias("sig"))
    agg = minhash_signatures_agg(shingle_rows(df, "doc_id", "text", 3), "doc_id", 8)
    assert {tuple(r["sig"]) for r in hof.collect()} == {tuple(r["sig"]) for r in agg.collect()}


def test_minhash_lsh_finds_near_dup_and_skips_distinct(spark):
    near_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    near_b = "the quick brown fox jumps over the lazy dog near the river bank now"
    other = "completely unrelated text about database engines and shuffle partitions"
    df = _docs(spark, [near_a, near_b, other])
    pairs = minhash_lsh_dedup_pairs(df, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] > 0.5


def test_identical_docs_bucket_together(spark):
    df = _docs(spark, ["alpha beta gamma delta epsilon"] * 2)
    sh = shingle_sets(df, "doc_id", "text", 3)
    sig = minhash_signatures_agg(shingle_rows(df, "doc_id", "text", 3), "doc_id", 8)
    cand = lsh_candidate_pairs(sig, "doc_id", bands=2, rows_per_band=4)
    ver = jaccard_verified_pairs(cand, sh, "doc_id", 0.99).collect()
    assert len(ver) == 1 and ver[0]["jaccard"] == 1.0


def test_simhash_is_64_bits_and_identical_for_identical_docs(spark):
    df = _docs(spark, ["spark shuffles partitions", "spark shuffles partitions", "something else entirely now"])
    out = {r["doc_id"]: r["simhash"] for r in simhash64(df, "doc_id", tokenize(F.col("text"))).collect()}
    assert all(len(v) == 64 and set(v) <= {0, 1} for v in out.values())
    assert out[0] == out[1]
    assert out[0] != out[2]


def test_connected_components_chain_and_singleton(spark):
    from udacity_dend_capstone_immigration_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 9)], "id long")
    out = dict(connected_components(pairs, nodes).collect())
    # chain 1-2-3 collapses to min id 1; pair 5-6 to 5; 9 is a singleton
    assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}


def test_connected_components_long_chain_converges(spark):
    from udacity_dend_capstone_immigration_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(i,) for i in range(n + 1)], "id long")
    out = dict(connected_components(pairs, nodes).collect())
    assert set(out.values()) == {0}


def test_substring_runs_exact_overlap(spark):
    from udacity_dend_capstone_immigration_spark.operators.dedup import substring_run_pairs

    shared = "one two three four five six seven eight nine ten"
    df = _docs(
        spark,
        [
            f"prefix words here {shared} and a tail",
            f"other opening {shared} different ending tokens",
            "no overlap with anything else at all in this document",
        ],
    )
    out = substring_run_pairs(df, "doc_id", "text", shingle_n=5, min_tokens=10).collect()
    assert [(r["id_a"], r["id_b"], r["max_run_tokens"]) for r in out] == [(0, 1, 10)]


def test_substring_runs_below_threshold_empty(spark):
    df = _docs(spark, ["a b c d e f g h", "a b c d e f g h"])
    from udacity_dend_capstone_immigration_spark.operators.dedup import substring_run_pairs

    # full 8-token match, but the threshold is higher
    assert substring_run_pairs(df, "doc_id", "text", 5, min_tokens=9).count() == 0
    full = substring_run_pairs(df, "doc_id", "text", 5, min_tokens=8).collect()
    assert [(r["id_a"], r["id_b"], r["max_run_tokens"]) for r in full] == [(0, 1, 8)]


def test_substring_runs_stop_shingle_cap(spark):
    from udacity_dend_capstone_immigration_spark.operators.dedup import substring_run_pairs

    boiler = "standard legal disclaimer text applies to everything here"
    df = _docs(spark, [f"{boiler} doc one body", f"{boiler} doc two body", f"{boiler} doc three body"])
    # without the cap the boilerplate run pairs every doc with every other
    assert substring_run_pairs(df, "doc_id", "text", 5, min_tokens=8).count() == 3
    # capping document frequency at 2 removes shingles present in all 3 docs
    assert (
        substring_run_pairs(df, "doc_id", "text", 5, min_tokens=8, max_shingle_df=2).count() == 0
    )


def test_positional_shingles_positions(spark):
    from udacity_dend_capstone_immigration_spark.operators.dedup import positional_shingle_rows

    df = _docs(spark, ["a b c d"])
    rows = positional_shingle_rows(df, "doc_id", "text", 3).orderBy("pos").collect()
    assert [(r["pos"], r["shingle"]) for r in rows] == [(0, "a b c"), (1, "b c d")]


def test_pagerank_star_graph_ranks_hub_highest(spark):
    from udacity_dend_capstone_immigration_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    # spokes 1,2,3 all point at hub 0; hub points back at 1
    edges = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (0, 1)], "src long, dst long"
    )
    r = {row["doc_id"]: row["pagerank"] for row in pagerank(edges, nodes, iters=3).collect()}
    assert r[0] > r[1] > r[2]  # hub beats its one in-link spoke beats the rest
    assert r[2] == r[3]  # symmetric spokes tie exactly
    base = (1.0 - 0.85) / 4.0
    # nodes 2,3 have no in-edges: teleport mass only, exactly
    assert r[2] == base
    # probability never leaks: total mass bounded by 1 (dangling variant)
    assert sum(r.values()) <= 1.0


def test_pagerank_deterministic_across_runs(spark):
    from udacity_dend_capstone_immigration_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20)], "src long, dst long"
    )
    a = sorted(map(tuple, pagerank(edges, nodes, iters=3).collect()))
    b = sorted(map(tuple, pagerank(edges, nodes, iters=3).collect()))
    assert a == b


def test_prefix_filter_matches_full_join(spark):
    """Prefix-filter candidate generation must be COMPLETE: the verified
    output equals the full shingle equi-join's pairs exactly."""
    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    near_a = "the quick brown fox jumps over the lazy dog near the river bank today"
    near_b = "the quick brown fox jumps over the lazy dog near the river bank now"
    near_c = "the quick brown fox jumps over the lazy dog near the river bank today"
    other = "completely unrelated text about database engines and shuffle partitions"
    df = _docs(spark, [near_a, near_b, other, near_c])
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in prefix_filter_jaccard_pairs(df, "doc_id", "text", 3, 0.5).collect()
    }
    # full-join reference, computed directly
    e = shingle_rows(df, "doc_id", "text", 3, distinct=True)
    a = e.select(F.col("doc_id").alias("id_a"), F.col("shingle").alias("g"))
    b = e.select(F.col("doc_id").alias("id_b"), F.col("shingle").alias("g"))
    inter = (
        a.join(b, "g")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    z = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    want = set()
    sizes = {r["doc_id"]: r["n"] for r in z.collect()}
    for r in inter.collect():
        j = r["i"] / (sizes[r["id_a"]] + sizes[r["id_b"]] - r["i"])
        if j >= 0.5:
            want.add((r["id_a"], r["id_b"], round(j, 6)))
    assert got == want
    assert (0, 3, 1.0) in got  # the identical pair survives


def test_lsh_bucket_cap_drops_mega_bucket(spark):
    # 8 identical docs collide into ONE bucket per band (the boilerplate
    # mega-bucket shape); with the stop-bucket cap below the bucket size
    # no pair is generated, without it the full C(8,2) square comes out.
    df = _docs(spark, ["alpha beta gamma delta epsilon zeta"] * 8 + ["totally different words here now"])
    sig = minhash_signatures_agg(shingle_rows(df, "doc_id", "text", 3), "doc_id", 8)
    uncapped = lsh_candidate_pairs(sig, "doc_id", bands=2, rows_per_band=4)
    assert uncapped.count() == 28  # 8 choose 2
    capped = lsh_candidate_pairs(sig, "doc_id", bands=2, rows_per_band=4, max_bucket_df=7)
    assert capped.count() == 0
    # cap above the bucket size is a no-op
    roomy = lsh_candidate_pairs(sig, "doc_id", bands=2, rows_per_band=4, max_bucket_df=8)
    assert roomy.count() == 28


def test_prefix_filter_cap_drops_hot_prefix_tokens(spark):
    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    # near-identical doc pair is found normally...
    texts = [
        "the quick brown fox jumps over the lazy dog by the river bank",
        "the quick brown fox jumps over the lazy dog by the river edge",
    ]
    df = _docs(spark, texts)
    found = prefix_filter_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"]) for r in found] == [(0, 1)]
    # ...but a cap of 1 marks every shared prefix token as boilerplate-hot,
    # so the candidate stage produces nothing — the documented recall
    # trade of the hard fan-out bound.
    capped = prefix_filter_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, max_prefix_df=1
    )
    assert capped.count() == 0


def test_jaccard_size_identity_matches_array_union(spark):
    """jaccard_verified_pairs computes |union| from set sizes
    (|a|+|b|-|inter|) — valid ONLY for duplicate-free arrays, the
    documented precondition. Pin equivalence with the materialized
    array_union form on shingle_sets output (distinct by construction),
    including partial-overlap pairs either side of the threshold."""
    df = _docs(
        spark,
        [
            "a b c d e f g h",          # 6 trigram shingles
            "a b c d e f g x",          # shares 5 of them
            "a b c d e f g h",          # identical to doc 0
            "completely different text here now",
        ],
    )
    sh = shingle_sets(df, "doc_id", "text", 3)
    ids = [r["doc_id"] for r in sh.select("doc_id").collect()]
    pairs = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_verified_pairs(pairs, sh, "doc_id", 0.0).collect()
    }
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sb"))
    want = {
        (r["id_a"], r["id_b"]): r["j"]
        for r in pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb"))
            ).alias("j"),
        )
        .collect()
    }
    assert got == want and len(got) == len(ids) * (len(ids) - 1) // 2
    assert got[(0, 2)] == 1.0 and 0.0 < got[(0, 1)] < 1.0


def test_triangle_counts_degree_oriented(spark):
    """K4 on {1,2,3,4} (4 triangles, each node in 3) + a hub star
    (no triangles) + one closed hub wedge."""
    from udacity_dend_capstone_immigration_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    star = [(0, v) for v in range(10, 40)]          # hub 0, degree 30+
    closed = [(10, 11), (0, 4)]                     # triangle {0,10,11}
    edges = spark.createDataFrame(k4 + star + closed, "id_a long, id_b long")
    got = {r["node"]: r["tri_cnt"] for r in triangle_counts(edges).collect()}
    assert got[1] == got[2] == got[3] == 3  # K4: each node in C(3,2)=3
    assert got[4] == 3
    assert got[0] == 1 and got[10] == 1 and got[11] == 1  # closed wedge
    assert 12 not in got  # pure star spokes are triangle-free
