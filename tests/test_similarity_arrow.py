"""The Arrow/numpy kNN fast path must produce exactly the HOF path's
results (cosine rounded to 6dp, deterministic tiebreaks)."""

import time

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.similarity import (
    brute_force_knn,
    brute_force_knn_arrow,
)

SF_DIR = "/root/testdata/sf0.001"


def test_arrow_knn_matches_hof_knn(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 10)
    hof = brute_force_knn(queries, emb, "vec_id", k=10)
    arrow = brute_force_knn_arrow(queries, emb, "vec_id", k=10)
    a = sorted(map(tuple, hof.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b


def test_arrow_knn_handles_more_neighbors_than_rows(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 2)
    tiny = emb.where(F.col("vec_id") < 5)
    out = brute_force_knn_arrow(queries, tiny, "vec_id", k=10).collect()
    # 2 queries × 4 non-self candidates each
    assert len(out) == 8


def test_arrow_pairs_match_hof_pairs(spark):
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_pairs_above,
        cosine_pairs_above_arrow,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    hof = sorted(map(tuple, cosine_pairs_above(emb, "vec_id", 0.4).collect()))
    arrow = sorted(map(tuple, cosine_pairs_above_arrow(emb, "vec_id", 0.4).collect()))
    assert len(hof) > 0
    assert hof == arrow


def test_arrow_pairs_survive_unoccupied_blocks(spark):
    """With fewer vectors than blocks some crc32 buckets are empty, so a
    (bi, bj) group can hold rows from only one side — the gram kernel
    must return the empty typed frame instead of np.stack-ing nothing
    (r2 advice)."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_pairs_above,
        cosine_pairs_above_arrow,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 3)
    )
    hof = sorted(map(tuple, cosine_pairs_above(emb, "vec_id", -1.0).collect()))
    arrow = sorted(map(tuple, cosine_pairs_above_arrow(emb, "vec_id", -1.0, num_blocks=8).collect()))
    assert len(arrow) == 3  # all C(3,2) pairs at threshold -1
    assert hof == arrow


def test_arrow_knn_rejects_oversized_query_set(spark, monkeypatch):
    """The collect() contract is enforced, not assumed: above the
    documented bound the call fails loudly."""
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    monkeypatch.setattr(similarity, "MAX_BROADCAST_QUERY_ROWS", 5)
    with _pytest.raises(ValueError, match="5-row contract"):
        similarity.brute_force_knn_arrow(emb.where(F.col("vec_id") < 10), emb, "vec_id", k=3)


def test_grouped_pairs_match_hof_within_groups(spark):
    """cosine_pairs_above_grouped == the HOF pair join restricted to the
    same groups (id set equality; the grouped path emits ids only)."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_pairs_above,
        cosine_pairs_above_grouped,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 40)
        .withColumn("g", F.pmod(F.col("vec_id"), F.lit(3)))
    )
    grouped = sorted(
        map(tuple, cosine_pairs_above_grouped(emb, ["g"], "vec_id", 0.0).collect())
    )
    hof_all = cosine_pairs_above(emb.select("vec_id", "embedding"), "vec_id", 0.0)
    # restrict the global HOF pairs to same-group pairs
    expected = sorted(
        (a, b)
        for a, b, _ in map(tuple, hof_all.collect())
        if a % 3 == b % 3
    )
    assert grouped == expected
    assert len(grouped) > 0


def test_semdedup_cell_cap_is_subquadratic(spark):
    """Adversarial single-hot-cell corpus: every vector identical (one
    IVF cell swallows the whole corpus). With the skew cap the
    candidate-pair count stays ≤ cnt·cap (sub-bucketed), never C(n,2);
    with the cap effectively off the same helper squares. Assign is
    fabricated directly — the helper's contract is (vec_id, cell)."""
    from udacity_dend_capstone_immigration_spark.workload.vectors import (
        semdedup_candidate_pairs,
    )

    n = 120
    emb = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(n)], "vec_id long, embedding array<double>"
    )
    assign = spark.createDataFrame([(i, 0) for i in range(n)], "vec_id long, cell int")

    uncapped = semdedup_candidate_pairs(
        emb, assign, tau=0.9, skew=n, n_cells=1
    ).count()
    assert uncapped == n * (n - 1) // 2  # the quadratic blow-up, un-guarded

    # skew=2, n_cells=64 → cap = 2·ceil(120/64) = 4 → nsub = 30
    capped = semdedup_candidate_pairs(emb, assign, tau=0.9, skew=2, n_cells=64).count()
    cap = 2 * -(-n // 64)
    assert 0 < capped <= n * cap  # ≤ cnt·cap, far below C(n,2)
    assert capped < uncapped // 4


def test_semdedup_assignment_executes_once(spark):
    """The O(corpus) IVF assignment is checkpointed before the pair
    self-join: the final executed plan reads the materialized RDD
    (ExistingRDD) and contains NO max_by assignment aggregate — the
    assignment cannot run once per join side (r8 verdict item 2)."""
    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    df = QUERIES["semantic_dedup_representatives"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "max_by" not in plan
    assert "ExistingRDD" in plan


def test_grouped_components_match_iterative_cc(spark):
    """cosine_components_grouped == connected_components over the
    grouped pair graph (real embeddings, 3 artificial groups)."""
    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        connected_components,
    )
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_components_grouped,
        cosine_pairs_above_grouped,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 60)
        .withColumn("g", F.pmod(F.col("vec_id"), F.lit(3)))
    )
    kernel = sorted(
        map(tuple, cosine_components_grouped(emb, ["g"], "vec_id", 0.35).collect())
    )
    pairs = cosine_pairs_above_grouped(emb, ["g"], "vec_id", 0.35)
    iterative = sorted(
        map(
            tuple,
            connected_components(
                pairs, emb.select("vec_id"), id_col="vec_id"
            ).collect(),
        )
    )
    assert kernel == iterative
    assert len(kernel) == 60  # every vector labeled, singletons included


def test_grouped_components_long_chain_converges(spark):
    """Adversarial τ-chain: vectors v_i = unit vectors rotated in small
    steps so only consecutive ones pass the threshold — a diameter-n
    path graph. The pointer-jumping min-label kernel must collapse the
    whole chain to cluster 0 (the iterative operator would need ~n
    rounds and raises past max_iterations)."""
    import math

    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_components_grouped,
    )

    n = 48
    step = math.pi / 2 / n * 1.6  # consecutive cos ~0.9987, two-apart below
    rows = [
        (i, [math.cos(i * step), math.sin(i * step)] + [0.0] * 6) for i in range(n)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>").withColumn(
        "g", F.lit(0)
    )
    thr = math.cos(step) - (math.cos(step) - math.cos(2 * step)) / 2
    out = dict(
        map(tuple, cosine_components_grouped(emb, ["g"], "vec_id", thr).collect())
    )
    assert set(out.values()) == {0}  # one component, min-id label
    assert len(out) == n


def test_assign_nearest_arrow_tiebreak_and_sim(spark):
    """Duplicate centroids (exact cosine ties) must assign to the LOWEST
    cent_id — the oracles' ROW_NUMBER (sim DESC, cent_id ASC) order —
    and emit_sim must carry the rounded best similarity through."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        Codebook,
        assign_nearest_arrow,
    )

    # centroids 3 and 7 are identical; 9 points elsewhere
    cb = Codebook(
        [
            (7, [1.0, 0.0, 0.0, 0.0]),
            (3, [1.0, 0.0, 0.0, 0.0]),
            (9, [0.0, 1.0, 0.0, 0.0]),
        ]
    )
    emb = spark.createDataFrame(
        [(0, [2.0, 0.0, 0.0, 0.0]), (1, [0.0, 5.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in assign_nearest_arrow(emb, cb, "vec_id", emit_sim=True).collect()
    }
    assert rows[0]["cell"] == 3  # tie between 3 and 7 → lowest id
    assert rows[0]["cent_sim"] == 1.0
    assert rows[1]["cell"] == 9
    assert rows[1]["cent_sim"] == 1.0


def test_codebook_rejects_oversized_collect(spark):
    """The MAX_CODEBOOK_ROWS contract is enforced, not assumed."""
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.operators import similarity

    rows = [(i, [1.0, 0.0]) for i in range(similarity.MAX_CODEBOOK_ROWS + 1)]
    with _pytest.raises(ValueError, match="contract"):
        similarity.Codebook(rows)


def test_l2_assignment_and_pq_roundtrip(spark):
    """metric='l2' picks the squared-distance argmin (lowest-id ties)
    and pq_reconstruct emits each vector's nearest codeword per block."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        Codebook,
        assign_nearest_arrow,
        pq_reconstruct,
    )

    cb0 = Codebook([(0, [0.0, 0.0]), (1, [10.0, 0.0])])
    cb1 = Codebook([(0, [5.0, 5.0]), (1, [-5.0, -5.0])])
    emb = spark.createDataFrame(
        [(7, [1.0, 0.0, 4.0, 6.0]), (8, [9.0, 1.0, -6.0, -4.0])],
        "vec_id long, embedding array<double>",
    )
    sub0 = emb.select(
        "vec_id", F.slice("embedding", 1, 2).alias("embedding")
    )
    a = {r["vec_id"]: r["cell"] for r in assign_nearest_arrow(sub0, cb0, "vec_id", metric="l2").collect()}
    assert a == {7: 0, 8: 1}
    out = {r["vec_id"]: r for r in pq_reconstruct(emb, [cb0, cb1]).collect()}
    assert out[7]["r"] == [0.0, 0.0, 5.0, 5.0]
    assert out[8]["r"] == [10.0, 0.0, -5.0, -5.0]
    assert out[7]["v"] == [1.0, 0.0, 4.0, 6.0]


def test_emit_residual_and_centered_reconstruct(spark):
    """emit_residual must equal v − centroid(assigned cell) exactly
    (one IEEE subtract per element), and pq_reconstruct with
    center_col must emit center + codeword with passthrough columns
    copied verbatim — the IVFADC encode/decode contract."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        Codebook,
        assign_nearest_arrow,
        pq_reconstruct,
    )

    cb = Codebook([(0, [0.0, 0.0, 0.0, 0.0]), (1, [10.0, 10.0, 10.0, 10.0])])
    emb = spark.createDataFrame(
        [(7, [1.0, 2.0, 0.5, 0.25]), (8, [9.0, 11.0, 10.5, 9.75])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in assign_nearest_arrow(emb, cb, "vec_id", emit_residual=True).collect()
    }
    assert out[7]["cell"] == 1 or out[7]["cell"] == 0  # cosine picks by direction
    got7 = out[7]["residual"]
    cent7 = [0.0, 0.0, 0.0, 0.0] if out[7]["cell"] == 0 else [10.0] * 4
    assert got7 == [a - b for a, b in zip([1.0, 2.0, 0.5, 0.25], cent7)]
    cent8 = [0.0, 0.0, 0.0, 0.0] if out[8]["cell"] == 0 else [10.0] * 4
    assert out[8]["residual"] == [
        a - b for a, b in zip([9.0, 11.0, 10.5, 9.75], cent8)
    ]

    # centered decode: r = center + nearest codeword of the residual
    rcb0 = Codebook([(0, [0.0, 0.0]), (1, [1.0, 2.0])])
    rcb1 = Codebook([(0, [0.5, 0.0]), (1, [0.0, -0.5])])
    frame = spark.createDataFrame(
        [(7, [1.0, 2.0, 0.5, 0.25], [10.0, 10.0, 10.0, 10.0], "keepme")],
        "vec_id long, embedding array<double>, c array<double>, tag string",
    )
    row = pq_reconstruct(
        frame, [rcb0, rcb1], center_col="c", passthrough=("tag",)
    ).collect()[0]
    assert row["r"] == [11.0, 12.0, 10.5, 10.0]
    assert row["v"] == [1.0, 2.0, 0.5, 0.25]
    assert row["tag"] == "keepme"


def test_l2_subchunking_matches_unbounded(spark, monkeypatch):
    """The l2 diffs-tensor budget must not change assignments: force a
    tiny budget (step=1 sub-chunks) and compare against the default."""
    import numpy as np

    from udacity_dend_capstone_immigration_spark.operators import similarity

    rng = np.random.default_rng(7)
    cb = similarity.Codebook(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(50)]
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    base = sorted(
        map(tuple, similarity.assign_nearest_arrow(emb, cb, "vec_id", metric="l2").collect())
    )
    monkeypatch.setattr(similarity, "_L2_TENSOR_BUDGET", 1)
    tiny = sorted(
        map(tuple, similarity.assign_nearest_arrow(emb, cb, "vec_id", metric="l2").collect())
    )
    assert base == tiny
    assert len(base) == 300


def test_grouped_diverse_reps_match_components_pick(spark):
    """cosine_diverse_reps_grouped == per-cluster argmin(cent_sim)
    (asc-id ties) over cosine_components_grouped's clusters — the
    composition the in-kernel pick replaces (r9 perf-weak fix)."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_components_grouped,
        cosine_diverse_reps_grouped,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 60)
        .withColumn("g", F.pmod(F.col("vec_id"), F.lit(3)))
        # deterministic sim with deliberate ties (mod 7) to exercise the
        # asc-id tiebreak
        .withColumn(
            "cent_sim", (F.pmod(F.col("vec_id") * 37, F.lit(7)) / F.lit(10.0))
        )
    )
    comp = dict(
        map(
            tuple,
            cosine_components_grouped(
                emb.select("g", "vec_id", "embedding"), ["g"], "vec_id", 0.35
            ).collect(),
        )
    )
    sims = {r["vec_id"]: r["cent_sim"] for r in emb.select("vec_id", "cent_sim").collect()}
    expected = {}
    for vid, cl in comp.items():
        cur = expected.get(cl)
        cand = (sims[vid], vid)
        if cur is None or cand < cur:
            expected[cl] = cand
    got = {
        r["cluster_id"]: (r["cent_sim"], r["kept_id"])
        for r in cosine_diverse_reps_grouped(emb, ["g"], "vec_id", "cent_sim", 0.35).collect()
    }
    assert got == expected
    assert len(got) == len(set(comp.values()))


def test_mmr_select_diversity_beats_plain_topk(spark):
    """Constructed case where MMR must diverge from relevance order:
    candidates 2 and 3 are near-clones of the top pick (sim ~1), so
    after picking id 1 the penalty pushes the orthogonal id 4 ahead of
    them; plain top-k would return 1,2,3. Also pins the tie rule
    (equal score -> smaller id) and the step-score arithmetic."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        mmr_select_grouped,
    )

    # unit vectors in 4-d: 1,2,3 identical direction; 4 orthogonal
    rows = [
        (7, 1, 0.99, [1.0, 0.0, 0.0, 0.0]),
        (7, 2, 0.98, [1.0, 0.0, 0.0, 0.0]),
        (7, 3, 0.97, [1.0, 0.0, 0.0, 0.0]),
        (7, 4, 0.60, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rel double, embedding array<double>"
    )
    got = {
        r["sel_rank"]: (r["vec_id"], r["mmr_score"])
        for r in mmr_select_grouped(df, k=3).collect()
    }
    assert got[1] == (1, 0.99)
    # step 2: clones score 0.7*rel - 0.3*1.0 = .386/.379; id 4 scores
    # 0.7*0.6 - 0.3*0.0 = 0.42 and leapfrogs them
    assert got[2][0] == 4 and abs(got[2][1] - 0.42) < 1e-12
    # step 3: id 4 gone; clones penalized by maxsim=1.0, id 2 first
    assert got[3][0] == 2 and abs(got[3][1] - (0.7 * 0.98 - 0.3)) < 1e-12


def test_mmr_select_tiebreak_smaller_id(spark):
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        mmr_select_grouped,
    )

    rows = [
        (1, 9, 0.9, [1.0, 0.0]),
        (1, 5, 0.9, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rel double, embedding array<double>"
    )
    out = mmr_select_grouped(df, k=2).collect()
    first = [r for r in out if r["sel_rank"] == 1][0]
    assert first["vec_id"] == 5


def test_assign_emit_second_runner_up(spark):
    """emit_second returns the nearest-OTHER centroid: best/second are
    the top-2 of the rounded sim row, ties to the lowest cent_id."""
    import numpy as np

    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        Codebook,
        assign_nearest_arrow,
    )

    cb = Codebook(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [1.0, 1.0, 0.0]),
        ]
    )
    df = spark.createDataFrame(
        [(10, [1.0, 0.2, 0.0]), (11, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: r
        for r in assign_nearest_arrow(
            df, cb, "vec_id", emit_sim=True, emit_second=True
        ).collect()
    }
    # vec 10: sims = (0.980581, 0.196116, 0.832050) -> best 0, second 2
    assert out[10]["cell"] == 0 and out[10]["second_cell"] == 2
    assert abs(out[10]["second_sim"] - np.round(1.2 / (np.sqrt(1.04) * np.sqrt(2)), 6)) < 1e-12
    # vec 11 orthogonal to all: sims all 0.0 -> tie chain picks 0 then 1
    assert out[11]["cell"] == 0 and out[11]["second_cell"] == 1
    assert out[11]["cent_sim"] == 0.0 and out[11]["second_sim"] == 0.0


def test_hard_negative_knn_masks_inside_kernel(spark):
    """A query whose entire near neighborhood shares its label: top-k
    then filter would return nothing useful; the masked scan must
    surface the best DIFFERENT-label rows exactly."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        hard_negative_knn_arrow,
    )

    rows = [(0, 1, [1.0, 0.0])]
    # ids 1..20: label 1, nearly parallel to the query (same label -> masked)
    rows += [(i, 1, [1.0, 0.001 * i]) for i in range(1, 21)]
    # ids 30/31: label 2, further away but the only legal negatives
    rows += [(30, 2, [0.7, 0.7]), (31, 2, [0.0, 1.0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = hard_negative_knn_arrow(
        emb.where(F.col("vec_id") == 0), emb, "vec_id", "label", k=5
    ).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [30, 31]
    assert all(r["neighbor_id"] not in range(1, 21) for r in out)


def test_hard_negative_knn_tie_breaks_to_smaller_id(spark):
    """Pin the masked path's tie rule (r14: hard_negative_knn_arrow now
    delegates to brute_force_knn_arrow's label_col kernel — the rule
    must not drift): corpus rows at IDENTICAL rounded cosine rank by
    ascending id, and ranking is stable across the per-batch partial
    top-k and the final reducing window."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        hard_negative_knn_arrow,
    )

    # four different-label negatives, all exactly parallel to the query
    # (cosine 1.0 after 6dp rounding) plus one strictly worse
    rows = [(0, 1, [1.0, 0.0])]
    rows += [(i, 2, [2.0, 0.0]) for i in (7, 3, 11, 5)]
    rows += [(4, 2, [0.0, 1.0])]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    out = hard_negative_knn_arrow(
        emb.where(F.col("vec_id") == 0), emb, "vec_id", "label", k=3
    ).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])] == [3, 5, 7]
    assert all(r["cosine_sim"] == 1.0 for r in out)


def test_mmr_invariants_random_groups(spark):
    """Randomized invariants over the greedy kernel (deterministic
    seed; one Spark job for all groups): per group, exactly min(k, n)
    rows, unique ids drawn from the group's candidates, sel_rank dense
    from 1, and rank 1 = argmax relevance with the smaller-id tie
    rule."""
    import numpy as np

    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        mmr_select_grouped,
    )

    rng = np.random.default_rng(7)
    rows, expect_n = [], {}
    for g in range(12):
        n = int(rng.integers(1, 9))
        expect_n[g] = min(5, n)
        rel = np.round(rng.random(n), 6)
        for i in range(n):
            rows.append(
                (g, int(g * 100 + i), float(rel[i]), [float(x) for x in rng.random(4)])
            )
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rel double, embedding array<double>"
    )
    out = mmr_select_grouped(df, k=5).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["query_id"], []).append(r)
    cands = {}
    for g, nid, rel, _ in rows:
        cands.setdefault(g, {})[nid] = rel
    assert set(by_g) == set(expect_n)
    for g, rs in by_g.items():
        assert len(rs) == expect_n[g]
        ids = [r["vec_id"] for r in sorted(rs, key=lambda r: r["sel_rank"])]
        assert len(set(ids)) == len(ids)
        assert set(ids) <= set(cands[g])
        assert sorted(r["sel_rank"] for r in rs) == list(range(1, len(rs) + 1))
        best_rel = max(cands[g].values())
        expected_first = min(i for i, v in cands[g].items() if v == best_rel)
        assert ids[0] == expected_first
