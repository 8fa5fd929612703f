"""Deduplication operators for the training-data pipeline tier.

Six families, all engine-portable (md5-based hashing so the DuckDB oracle
reproduces results bit-for-bit) and all designed around Spark's shuffle
model:

- **exact**: hash group-by on content (or its md5 fingerprint) — one
  shuffle on the fingerprint, then min-id per group. At 100 TB, shuffling
  a 32-char fingerprint instead of the full document body is the whole
  game; ``exact_dedup_by_fingerprint`` does exactly that.
- **MinHash + LSH**: per-row signatures (zero shuffle — higher-order
  functions only), banded bucketing, candidate-pair self-join on
  (band, bucket-hash), Jaccard verification. Shuffle volume is
  O(docs × bands), never O(docs²).
- **SimHash**: explode token→bit contributions, map-side-combinable
  group-by — near-duplicate Hamming buckets without pairwise compare.
- **n-gram Jaccard**: exact pairwise verification used standalone on
  candidate sets (never on the full cross product at scale).
- **winnowing**: rolling-hash fingerprints (min k-gram hash per sliding
  window) for partial-overlap detection.
- **connected components**: pairs → clusters by iterative min-label
  propagation with checkpointed lineage.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.functions.text import doc_fingerprint, tokenize, word_shingles
from udacity_dend_capstone_immigration_spark.operators.spread import spread_scan


def exact_dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate elimination (A5; reference etl.py:243, 249, 263)."""
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def exact_dedup_by_fingerprint(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Keep the min-id representative per content fingerprint.

    Deterministic (unlike ``dropDuplicates`` which keeps an arbitrary row)
    and shuffle-cheap: only (fingerprint, id) move, not document bodies.
    Returns (id_col, fingerprint, dup_count).
    """
    return (
        df.select(F.col(id_col), doc_fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "fingerprint", "dup_count")
    )


def shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) rows: word n-grams via ``arrays_zip`` of shifted
    ``slice``s, then one explode. ZERO shuffle — deliberately not
    ``spread_scan``'d: every consumer (signature min-aggregates, shingle
    set collection, equi-join sides) immediately combines map-side into
    its own exchange, so the per-shingle work is one cheap md5 and an
    added pre-explode exchange measured net-negative (minhash 1.34 →
    1.85s at sf0.1). Contrast ``positional_shingle_rows``, whose
    consumers do heavy per-row work before any shuffle.

    ``arrays_zip``/``slice`` are collection expressions (not lambda
    HOFs), so the whole shingle build stays in whole-stage codegen —
    measured ~2× faster at sf0.1 than the previous posexplode + ``lead``
    window shape, which also paid a shuffle + sort on ``id_col``. The
    zip pads the shifted slices with null; rows whose last member is
    null are incomplete tail shingles and are dropped. Output rows are
    short shingle strings, never document bodies, and feed the
    downstream explode-shaped consumers (signature aggregation, shingle
    equi-joins) without re-exploding.
    """
    toks = tokenize(text_col)
    d = df.select(F.col(id_col), toks.alias("_t"))
    shifted = [F.col("_t")] + [
        F.slice("_t", k + 1, F.greatest(F.size("_t") - k, F.lit(0))) for k in range(1, n)
    ]
    zipped = F.arrays_zip(*[c.alias(f"c{i}") for i, c in enumerate(shifted)])
    ex = d.select(F.col(id_col), F.explode(zipped).alias("s")).where(
        F.col(f"s.c{n - 1}").isNotNull()
    )
    out = ex.select(
        F.col(id_col), F.concat_ws(" ", *[F.col(f"s.c{k}") for k in range(n)]).alias("shingle")
    )
    return out.dropDuplicates([id_col, "shingle"]) if distinct else out


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingles) with sorted distinct word n-gram shingles; docs with
    fewer than ``n`` tokens yield no row (empty sets dropped)."""
    return (
        shingle_rows(df, id_col, text_col, n, distinct=False)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_set("shingle")).alias("shingles"))
    )


#: Largest 32-bit prime — modulus of the MinHash hash family. Family
#: member i of shingle s is ``(h1(s) + i * h2(s)) mod P`` where h1/h2
#: are the two 32-bit halves of one md5 (Carter–Wegman style: one
#: strong hash, arithmetic family). Operands stay < 2^63 for any
#: practical num_hashes, so the arithmetic is exact (and identical) in
#: Spark bigint and DuckDB BIGINT.
MINHASH_P = 4294967291


def _hash_halves(s: Column) -> tuple[Column, Column]:
    h = F.md5(s)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    return h1, h2


def minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature as an array of ``num_hashes`` bigint minima.

    One md5 per shingle; family member i is ``(h1 + i*h2) mod P``
    (pairwise-independent across i because h2 is uniform). Per-row
    higher-order functions: zero shuffle — but HOF expressions are
    interpreted, not codegen'd; prefer :func:`minhash_signatures_agg`
    in hot paths.
    """

    def member(i: Column, s: Column) -> Column:
        h1, h2 = _hash_halves(s)
        return (h1 + i * h2) % F.lit(MINHASH_P)

    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: member(i, s))),
    )


def minhash_signatures_agg(
    shingle_rows_df: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """Same signature values as :func:`minhash_signature`, computed from
    (id, shingle) ROWS as ``num_hashes`` MIN aggregates → array.

    The hot path: ONE md5 per shingle row (the arithmetic family derives
    the other num_hashes-1 members — measured 2.7× faster than
    md5-per-member at sf0.1), everything inside whole-stage codegen, and
    the MINs combine map-side so the shuffle carries one num_hashes-wide
    row per document regardless of document length.
    """
    h1, h2 = _hash_halves(F.col("shingle"))
    hashed = shingle_rows_df.select(id_col, h1.alias("_h1"), h2.alias("_h2"))
    mins = [
        F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % F.lit(MINHASH_P)).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    agged = hashed.groupBy(id_col).agg(*mins)
    return agged.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    bands: int,
    rows_per_band: int,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Band the signature, bucket by band-hash, pair up within buckets.

    Input needs columns (id_col, sig). Output: distinct (id_a, id_b) with
    id_a < id_b. Pair generation is the grouped, join-free shape — ONE
    groupBy(band, bucket) collecting the doc group, then an in-group
    double explode — not a bucket self-equi-join: the join shuffles the
    banded rows twice and, worse, squares on any mega-bucket. Buckets
    collect near-identical documents by construction, so a boilerplate
    corpus (thousands of docs sharing one template) puts thousands of ids
    in ONE bucket and the join fans out to its square — the same failure
    class the winnowing fingerprint cap fixed (one fingerprint in
    3379/5000 docs → 190M pairs → OOM). ``max_bucket_df`` is the
    stop-bucket cap: buckets with more than that many documents are
    boilerplate clusters better handled by exact dedup upstream, and are
    dropped before fan-out, bounding per-group output at cap². Groups of
    one doc can never pair and are pruned before the explode.
    """
    # bands is a plan-time literal, so the band structs are built as plain
    # expressions (slice/concat_ws are non-lambda collection exprs — stay
    # in whole-stage codegen) instead of an interpreted transform() lambda
    # over F.sequence.
    band_structs = [
        F.struct(
            F.lit(j).alias("band"),
            F.md5(
                F.concat(
                    F.lit(f"{j}:"),
                    F.concat_ws(
                        ",",
                        F.slice(F.col("sig"), j * rows_per_band + 1, rows_per_band).cast(
                            "array<string>"
                        ),
                    ),
                )
            ).alias("bucket"),
        )
        for j in range(bands)
    ]
    banded = sig_df.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")

    grp = banded.groupBy("band", "bucket").agg(F.collect_set(F.col(id_col)).alias("g"))
    grp = grp.select("g", F.size("g").alias("_df")).where(F.col("_df") >= 2)
    if max_bucket_df is not None:
        grp = grp.where(F.col("_df") <= max_bucket_df)
    return (
        grp.select(F.explode("g").alias("id_a"), "g")
        .select("id_a", F.explode("g").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def jaccard_verified_pairs(
    pairs: DataFrame,
    shingle_df: DataFrame,
    id_col: str,
    threshold: float,
    spread: bool = False,
) -> DataFrame:
    """Join candidate pairs back to their shingle sets and keep pairs with
    true Jaccard >= threshold. Returns (id_a, id_b, jaccard).

    **Precondition: ``shingles`` arrays must be duplicate-free** (sets,
    e.g. from ``collect_set`` / ``array_distinct``). Jaccard is computed
    from sizes via ``|union| = |a| + |b| - |inter|``, which holds only
    for sets — passing arrays with duplicates silently deflates the
    denominator and inflates every Jaccard value. Both in-repo callers
    feed ``shingle_sets`` output (collect_set, distinct by
    construction); equivalence with the materialized
    ``array_union``/``array_intersect`` form is pinned by
    ``tests/test_dedup_operators.py::test_jaccard_size_identity_matches_array_union``.

    ``spread=True`` repartitions the candidate pairs to default
    parallelism first: pair rows are two ids — tiny in bytes — so AQE's
    byte-based coalescing packs a large candidate set into a handful of
    partitions while the per-row verify cost (array_intersect over the
    joined shingle arrays) is CPU-heavy. Measured at sf0.1 on 409k
    prefix-filter candidates: AQE coalesced to 3 tasks, 17.7 cpu-sec
    serialized; the explicit spread runs it wide. Leave False for small
    candidate sets (LSH output) where the extra exchange is pure
    overhead.
    """
    if spread:
        sc = pairs.sparkSession.sparkContext
        pairs = pairs.repartition(sc.defaultParallelism)
    s1 = shingle_df.select(
        F.col(id_col).alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.size("shingles").alias("_na"),
    )
    s2 = shingle_df.select(
        F.col(id_col).alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.size("shingles").alias("_nb"),
    )
    # the sets are distinct, so |union| = |a| + |b| - |inter| — computing
    # it from sizes skips materializing the union ARRAY per pair, the
    # second-heaviest expression in the verify (measured: prefix-filter
    # verify 2.89 → 2.49s at sf0.1, identical output)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    # merge hints: every relation here is SF-scaling (pairs O(candidates),
    # shingle sets O(docs)), but Catalyst's size estimate is blind to the
    # shingle-explode fan-out behind the checkpoint (measured 120 KB
    # estimated vs 260k actual rows at sf0.1), so the static planner
    # broadcasts a side — at a 100x corpus that was a 1.2 GiB broadcast
    # build (driver-collected in local mode, OOM class on a cluster).
    # Sort-merge spills instead of collecting; AQE cannot demote the
    # statically-planned broadcast, so the hint is the only safe pin.
    return (
        pairs.join(s1.hint("merge"), "id_a")
        .join(s2.hint("merge"), "id_b")
        .withColumn("jaccard", inter / (F.col("_na") + F.col("_nb") - inter))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 24,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """End-to-end MinHash/LSH near-dup pipeline: shingle → signature →
    banded buckets → candidate pairs → Jaccard verify."""
    rows_per_band = num_hashes // bands
    # Since the signature/shingle-set aggregate merge, the exploded
    # shingle rows have exactly ONE consumer (the grouped aggregate
    # below), so they are deliberately NOT checkpointed — materializing
    # a single-consumer intermediate only adds a block-manager write +
    # read with zero reuse (the leftover checkpoint here was the r5
    # driver-bench regression: first-run 6.4s → 2.6s without it).
    rows = shingle_rows(df, id_col, text_col, shingle_n, distinct=False)
    # ONE groupBy(doc) computes the num_hashes signature minima AND the
    # shingle set in the same shuffle (both the signature branch and the
    # verify branch group on id_col; separate aggregates would shuffle
    # the shingle rows twice). The checkpoint stops the three downstream
    # reads (banding + both verify join sides) from re-running the
    # aggregate.
    h1, h2 = _hash_halves(F.col("shingle"))
    hashed = rows.select(id_col, "shingle", h1.alias("_h1"), h2.alias("_h2"))
    mins = [
        F.min((F.col("_h1") + F.lit(i) * F.col("_h2")) % F.lit(MINHASH_P)).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    grouped = hashed.groupBy(id_col).agg(
        *mins, F.array_sort(F.collect_set("shingle")).alias("shingles")
    ).localCheckpoint(eager=False)
    sig = grouped.select(
        id_col, F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("sig")
    )
    cand = lsh_candidate_pairs(sig, id_col, bands, rows_per_band, max_bucket_df)
    sets = grouped.select(id_col, "shingles")
    return jaccard_verified_pairs(cand, sets, id_col, threshold)


def simhash64(df: DataFrame, id_col: str, tokens: Column) -> DataFrame:
    """64-bit SimHash per document, engine-portable.

    Each token hashes to md5; the first 16 hex digits supply 64 bits
    (4 bits per digit, msb first). Per (doc, bit-position) we sum +1/-1
    contributions with a plain ``sum`` — fully map-side combinable, so at
    scale the shuffle carries docs × 64 small rows, independent of
    document length — and set the bit on a strictly-positive majority.
    Returns (id_col, simhash: array<int> of 64 bits, msb first).
    """
    tok = spread_scan(df.select(F.col(id_col), tokens.alias("_t"))).select(
        F.col(id_col), F.explode("_t").alias("tok")
    )
    tok = tok.select(id_col, F.substring(F.md5("tok"), 1, 16).alias("h"))
    # Two codegen'd explode stages instead of a per-token `transform`
    # lambda (interpreted HOFs evaluated conv/pow 64× per token —
    # measured 13s at sf0.1; this shape is ~1s for identical rows):
    # hex → (digit position d, digit value v) via split/posexplode, then
    # v → its 4 bits msb-first via a plain arithmetic array. p = 4d+b.
    dig = tok.select(
        id_col, F.posexplode(F.slice(F.split("h", ""), 1, 16)).alias("d", "c")
    ).select(id_col, "d", F.conv("c", 16, 10).cast("int").alias("v"))
    bit4 = F.array(
        (F.col("v") / 8).cast("int") % 2,
        (F.col("v") / 4).cast("int") % 2,
        (F.col("v") / 2).cast("int") % 2,
        F.col("v") % 2,
    )
    bits = dig.select(id_col, "d", F.posexplode(bit4).alias("b", "bit")).select(
        id_col,
        (F.col("d") * 4 + F.col("b")).alias("p"),
        (F.col("bit") * 2 - 1).alias("v"),
    )
    summed = bits.groupBy(id_col, "p").agg(F.sum("v").alias("s"))
    return summed.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "s"))),
            lambda x: F.when(x["s"] > 0, 1).otherwise(0),
        ).alias("simhash")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair graph by min-label
    propagation — turns near-dup PAIRS into dedup CLUSTERS (the step
    after MinHash/LSH: every document gets the min doc-id of its
    component as ``cluster_id``).

    Iterative Spark: each round joins labels to edges, takes the min
    neighbor label, and ``localCheckpoint``s the result to truncate
    lineage (without it the plan doubles every round — the classic
    iterative-algorithm trap). Convergence is checked driver-side with
    ``isEmpty`` on the changed set; rounds needed = graph diameter,
    which for dedup clusters is tiny. Shuffle per round is O(edges).

    ``pairs`` needs (id_a, id_b); ``nodes`` needs ``id_col`` (singletons
    become their own cluster).
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .persist()
    )
    # Only nodes that appear in a pair ride through the iteration — in a
    # real corpus the overwhelming majority of documents are singletons
    # and must not be shuffled diameter-many times. Singletons rejoin at
    # the end as their own cluster.
    in_pairs = edges.select(F.col("src").alias("id")).distinct()
    labels = in_pairs.select("id", F.col("id").alias("label"))
    labels = labels.localCheckpoint()
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
        )
        converged = changed.isEmpty()
        labels = new_labels
        if converged:
            break
    edges.unpersist()
    if not converged:
        # Returning un-converged labels would silently diverge from the
        # oracle's full transitive closure on a >max_iterations-diameter
        # graph — fail loudly instead; the caller raises the bound.
        raise RuntimeError(
            "connected_components: min-label propagation did not converge "
            f"within max_iterations={max_iterations} (component diameter "
            "exceeds the bound); pass a larger max_iterations"
        )
    clustered = labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))
    # localCheckpoint carries the ORIGIN plan's Catalyst estimate across
    # the boundary, and the label frame descends from explode-built pair
    # sets — estimate-blind, so the static planner would broadcast a
    # corpus-sized label table at any actual size. Merge-hint the
    # checkpoint-backed side (the CLAUDE.md estimate-blind rule).
    return (
        nodes.select(F.col(id_col))
        .join(clustered.hint("merge"), id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    distinct: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    rolling-hash fingerprint scheme MOSS uses): hash every character
    k-gram of the normalized text, then keep the MINIMUM hash of each
    sliding window of ``window`` consecutive k-grams. Guarantees any
    shared substring of length >= k + window - 1 contributes at least
    one common fingerprint — partial-overlap detection that whole-doc
    md5 can't do, with output ~1/window of the k-gram count.

    Spark shape: repartition the COMPACT doc rows (id, normalized text —
    a narrow shuffle of documents, not k-grams), then one map stage —
    explode window-start positions (codegen) and take ``least()`` of the
    ``window`` k-gram md5s computed inline. Each k-gram hash is
    recomputed ``window`` times, but that beats the alternative (a
    per-k-gram exchange + per-document sort for a window-function min)
    by shuffling ~window× fewer, far narrower rows; the doc-level
    repartition also spreads the ~300× explode fan-out across all cores
    even when the input parquet is a handful of partitions (without it
    the whole md5 stage runs on however many file splits the scan
    produced). md5-based so the oracle matches bit-for-bit.
    Returns (id_col, fingerprint).

    ``distinct=False`` returns the raw selected rows (one per window
    position, duplicates included) for callers that fold the dedup into
    their own aggregation — :func:`winnowing_overlap_pairs` uses
    ``collect_set`` so the dedup rides its fingerprint-group shuffle
    instead of paying a separate exchange.
    """
    from udacity_dend_capstone_immigration_spark.functions.text import normalize_text

    norm = spread_scan(df.select(F.col(id_col), normalize_text(text_col).alias("t")))
    # positions with a full window of k-grams: 1 .. len - (k-1) - (window-1)
    nwin = F.length("t") - F.lit(k + window - 2)
    pos = norm.where(F.length("t") >= k + window - 1).select(
        F.col(id_col),
        "t",
        F.explode(F.sequence(F.lit(1), nwin)).alias("p"),
    )
    rows = pos.select(
        F.col(id_col),
        F.least(
            *[
                F.md5(F.col("t").substr(F.col("p") + F.lit(i), F.lit(k)))
                for i in range(window)
            ]
        ).alias("fingerprint"),
    )
    return rows.distinct() if distinct else rows


def winnowing_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 20,
    max_fp_df: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints.

    Pair generation is the grouped, join-free shape (one groupBy per
    fingerprint building the doc group + its document frequency in the
    same shuffle, then an in-group double explode) — NOT a fingerprint
    self-equi-join. Winnowing's min-hash selection CONCENTRATES: the
    same low-hash k-grams win their windows in every document that
    contains them, so corpus boilerplate yields fingerprints shared by
    thousands of documents and a self-join squares on them (measured at
    sf0.1: one fingerprint in 3379/5000 docs; join volume 190M pairs —
    OOM on a 128 GiB single node, a cluster-melter at 100 TB).
    ``max_fp_df`` is the stop-fingerprint cap: fingerprints in more than
    that many documents are boilerplate with no discriminative value and
    are dropped before fan-out, bounding per-group output at cap². The
    df >= 2 filter additionally prunes every unshared fingerprint before
    the explode.

    Memory bound: the cap filters AFTER the collect_set, so one hot
    fingerprint's group is still fully buffered in a single reducer's
    aggregation buffer before being dropped — but the element is a bare
    doc id (~8 bytes), so even a fingerprint shared by ten million
    documents buffers ~80 MB, inside executor memory. If corpus profiling
    ever shows hotter fingerprints than that, pre-filter with a
    count-only aggregate + join (no collect) before this one — costs an
    extra shuffle, so it is not the default.

    Returns (id_a, id_b, shared_fps) with id_a < id_b.
    """
    fps = winnowing_fingerprints(df, id_col, text_col, k, window, distinct=False)
    grp = fps.groupBy("fingerprint").agg(
        F.collect_set(F.col(id_col)).alias("g"),
    )
    grp = grp.select("g", F.size("g").alias("_df")).where(F.col("_df") >= 2)
    if max_fp_df is not None:
        grp = grp.where(F.col("_df") <= max_fp_df)
    return (
        grp.select(F.explode("g").alias("id_a"), "g")
        .select("id_a", F.explode("g").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def positional_shingle_rows(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """(id, pos, shingle) rows — like :func:`shingle_rows` but keeping the
    0-based token position of each shingle's first token, via ONE
    ``posexplode`` of the zip-slice arrays (zero shuffle, stays in
    codegen). Position order is what turns shingle matches into
    *consecutive-run* (exact substring) evidence."""
    toks = tokenize(text_col)
    d = spread_scan(df.select(F.col(id_col), toks.alias("_t")))
    shifted = [F.col("_t")] + [
        F.slice("_t", k + 1, F.greatest(F.size("_t") - k, F.lit(0))) for k in range(1, n)
    ]
    zipped = F.arrays_zip(*[c.alias(f"c{i}") for i, c in enumerate(shifted)])
    ex = d.select(F.col(id_col), F.posexplode(zipped).alias("pos", "s")).where(
        F.col(f"s.c{n - 1}").isNotNull()
    )
    return ex.select(
        F.col(id_col),
        F.col("pos"),
        F.concat_ws(" ", *[F.col(f"s.c{k}") for k in range(n)]).alias("shingle"),
    )


def substring_run_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 5,
    min_tokens: int = 15,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact-substring overlap pairs (Lee et al., "Deduplicating Training
    Data Makes Language Models Better" — the suffix-array substring
    criterion, re-expressed bounded): pairs of documents sharing a run of
    >= ``min_tokens`` consecutive identical tokens.

    A shared token run of length L is exactly a diagonal of L-n+1
    consecutive matches in (position_a - position_b) space, so:
    positional shingles → ONE groupBy(shingle-hash) building the match
    group (collect_list of (id, pos)) and the document frequency in the
    same shuffle → pair generation by double-explode WITHIN each group →
    group by (id_a, id_b, diagonal) → gaps-and-islands max consecutive
    run → max over diagonals.

    Why grouped instead of a self-equi-join: the join shape shuffles the
    full shingle set twice (both sides) plus once more for the
    frequency cap, and recomputes the tokenize/explode/md5 scan three
    times. Grouping shuffles the shingle set ONCE, evaluates the scan
    once, applies the ``max_shingle_df`` stop-shingle cap as a plain
    group filter (no anti-join), and — the big pruning win — drops every
    group with df < 2 before pair generation (a shingle in one document
    can never pair; on real corpora that's the overwhelming majority of
    the vocabulary). Per-group fan-out is bounded by the cap, so the
    explode can't square on boilerplate at corpus scale; match volume is
    O(matching shingle pairs), not O(docs²), exactly as before.

    Memory bound: the df cap filters AFTER the collect_list, so a hot
    shingle's (id, pos) structs (~16 bytes each) are fully buffered in
    one reducer before the group is dropped — ~16 MB per million
    occurrences; the residual risk is a single shingle repeated
    pathologically often (df counts documents, not occurrences). If a
    corpus profile shows that shape, pre-filter with a count-only
    aggregate + join (no collect) before this one — an extra shuffle,
    so not the default.

    Returns (id_a, id_b, max_run_tokens) with id_a < id_b.
    """
    ps = positional_shingle_rows(df, id_col, text_col, shingle_n).select(
        F.col(id_col), "pos", F.md5("shingle").alias("h")
    )
    grp = ps.groupBy("h").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("id"), F.col("pos").alias("p"))
        ).alias("g"),
        F.count_distinct(F.col(id_col)).alias("_df"),
    )
    grp = grp.where(F.col("_df") >= 2)
    if max_shingle_df is not None:
        grp = grp.where(F.col("_df") <= max_shingle_df)
    m = (
        grp.select(F.explode("g").alias("x"), "g")
        .select("x", F.explode("g").alias("y"))
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.p").alias("pa"),
            (F.col("x.p") - F.col("y.p")).alias("diag"),
        )
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("island", F.col("pa") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "island")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("id_a", "id_b")
        .agg((F.max("run") + F.lit(shingle_n - 1)).alias("max_run_tokens"))
    )
    return runs.where(F.col("max_run_tokens") >= min_tokens)


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_prefix_df: int | None = None,
) -> DataFrame:
    """Set-similarity join via prefix filtering (the PPJoin/AllPairs
    family, Chaudhuri et al. / Xiao et al.): order each document's
    shingle set by ascending global frequency and join only on the
    first ``|s| - ceil(t*|s|) + 1`` rarest shingles — any pair with
    Jaccard >= t MUST share a prefix token, so the candidate set is
    complete while the join touches rare tokens instead of every
    shingle. The exact-Jaccard verify then filters candidates.

    The win over the full shingle equi-join is join volume: hot
    (frequent) shingles are mostly excluded from candidate generation by
    ranking, which is exactly what explodes on boilerplate-heavy corpora
    at scale. Shuffles carry (id, shingle-rank) pairs only.

    Prefix ranking alone is NOT a hard bound, though: on a
    boilerplate-dominated corpus even the *rarest* shingles of many
    documents coincide (thousands of near-identical docs have identical
    prefixes), so the candidate stage can still square — measured as the
    steepest scale exponent in the suite (5.0× wall-time at 10× data).
    ``max_prefix_df`` is the hard cap: candidate generation is the
    grouped join-free shape (ONE groupBy(shingle) over prefix rows, df
    filter, in-group double explode), and prefix tokens appearing in
    more than ``max_prefix_df`` documents' prefixes are dropped before
    fan-out, bounding per-group output at cap². A pair whose every
    shared prefix token is that hot is boilerplate better handled by
    exact/minhash dedup upstream.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    e = shingle_rows(df, id_col, text_col, n, distinct=True).localCheckpoint(
        eager=False
    )
    freq = e.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    # Prefix filtering only needs SOME consistent total order over the
    # shingle vocabulary shared by both sides of a pair; (_df, shingle)
    # ascending IS that order, so join the frequency onto the shingle rows
    # and sort inside each document's window. No corpus-wide rank — a
    # global row_number() here would funnel the whole vocabulary through
    # one task, which is the plan's death at scale.
    # merge hints: freq is vocabulary-sized and sizes is O(docs) — both
    # SF-scaling, both under-estimated behind the checkpointed explode
    # (see jaccard_verified_pairs); without the hint the static planner
    # broadcasts them at any corpus size
    ranked = e.join(freq.hint("merge"), "shingle")
    sizes = e.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(id_col).orderBy("_df", "shingle")
    prefix_len = F.col("_n") - F.ceil(F.lit(threshold) * F.col("_n")) + 1
    prefix = (
        ranked.withColumn("_pos", F.row_number().over(w))
        .join(sizes.hint("merge"), id_col)
        .where(F.col("_pos") <= prefix_len)
        .select(F.col(id_col), "shingle", "_n")
    )
    # Set sizes ride the group structs so the PPJoin LENGTH filter prunes
    # in-group, before the distinct: Jaccard >= t implies
    # min(|a|,|b|) >= t * max(|a|,|b|) (intersection <= min, union >=
    # max), so dropping length-mismatched pairs here is pure pruning —
    # no semantic change, no oracle mirror needed — and it cuts ~25% of
    # candidates on this corpus before the expensive verify join.
    pgrp = prefix.groupBy("shingle").agg(
        F.collect_set(F.struct(F.col(id_col).alias("id"), F.col("_n").alias("n"))).alias(
            "ids"
        )
    )
    pgrp = pgrp.select("ids", F.size("ids").alias("_pdf")).where(F.col("_pdf") >= 2)
    if max_prefix_df is not None:
        pgrp = pgrp.where(F.col("_pdf") <= max_prefix_df)
    cand = (
        pgrp.select(F.explode("ids").alias("x"), "ids")
        .select("x", F.explode("ids").alias("y"))
        .where(
            (F.col("x.id") < F.col("y.id"))
            & (
                F.least("x.n", "y.n")
                >= F.lit(threshold) * F.greatest("x.n", "y.n")
            )
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # exact verify on collected shingle ARRAYS (codegen'd array_intersect
    # / array_union) — one groupBy of the checkpointed rows instead of
    # re-joining the full shingle set once per pair side; the same
    # verify stage the MinHash pipeline uses. spread=True: the candidate
    # set is large and CPU-heavy per row (see jaccard_verified_pairs).
    sets = e.groupBy(id_col).agg(
        F.array_sort(F.collect_set("shingle")).alias("shingles")
    )
    return jaccard_verified_pairs(cand, sets, id_col, threshold, spread=True)


def incremental_components(
    old_assign: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Merge a new batch into an existing clustering WITHOUT
    re-propagating over the old graph — the condensation algorithm:

    1. contract every old cluster to its representative label
       (``old_assign``: (id_col, cluster_id), labels = component min
       ids, i.e. exactly what :func:`connected_components` emits);
    2. map each ``new_edges`` endpoint through the contraction (old
       nodes → their cluster_id, new nodes stay themselves);
    3. run min-label propagation on the META-graph — one node per
       TOUCHED old cluster (a mapped-edge endpoint) plus the new batch,
       O(batch + touched clusters) work regardless of corpus size or
       total cluster count;
    4. re-expand: old nodes left-join the meta labels through their
       cluster_id (untouched clusters coalesce back to their own
       label), new nodes join directly.

    Contraction preserves the minimum over every merged component (a
    cluster's label IS its min member), so the result is bit-identical
    to re-running :func:`connected_components` on the union graph —
    including the case where one new document BRIDGES two old clusters
    (both contract, the meta-propagation takes the smaller label, and
    every member of BOTH old clusters re-expands to it).

    ``new_edges`` needs (id_a, id_b) and may reference old and new ids
    in either position; ``new_nodes`` needs ``id_col`` (edge-less new
    docs become their own singleton cluster).

    Scope: merging only. Edge RETRACTION (e.g. an LSH bucket-df cap
    crossing under true streaming, which would invalidate previously
    emitted pairs) cannot be applied incrementally — removing an edge
    can SPLIT a component, and split is not expressible as label
    propagation; rebuild the affected components instead. The driver
    query sidesteps this by partitioning one full-corpus pair set, so
    its evidence equals the rebuild's exactly.
    """
    old = old_assign.select(
        F.col(id_col).alias("old_id"), F.col("cluster_id").alias("old_cid")
    )
    # Every frame here is SF-scaling AND estimate-blind (the old
    # assignment is checkpoint-backed, the meta labels come out of the
    # propagation's checkpoints), so the static planner would happily
    # broadcast a corpus-sized build — merge-hint every join side.
    mapped = (
        new_edges.select("id_a", "id_b")
        .join(
            old.select(F.col("old_id").alias("id_a"), F.col("old_cid").alias("ca"))
            .hint("merge"),
            "id_a",
            "left",
        )
        .join(
            old.select(F.col("old_id").alias("id_b"), F.col("old_cid").alias("cb"))
            .hint("merge"),
            "id_b",
            "left",
        )
        .select(
            F.coalesce("ca", F.col("id_a")).alias("id_a"),
            F.coalesce("cb", F.col("id_b")).alias("id_b"),
        )
    )
    # The meta-graph carries only TOUCHED old clusters (those reached
    # by a new edge — i.e. the mapped endpoints) plus the new batch:
    # untouched clusters never enter the propagation and keep their
    # label through the left-join coalesce below. This is what makes
    # the stage O(batch + touched clusters), not O(all clusters).
    touched = (
        mapped.select(F.col("id_a").alias(id_col))
        .unionByName(mapped.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    meta_nodes = touched.unionByName(new_nodes.select(id_col)).distinct()
    meta = connected_components(
        mapped, meta_nodes, id_col=id_col, max_iterations=max_iterations
    ).select(F.col(id_col).alias("meta_id"), F.col("cluster_id").alias("meta_cid"))
    old_final = old.join(
        meta.hint("merge"), old.old_cid == meta.meta_id, "left"
    ).select(
        F.col("old_id").alias(id_col),
        F.coalesce("meta_cid", "old_cid").alias("cluster_id"),
    )
    new_final = new_nodes.select(id_col).join(
        meta.hint("merge"), F.col(id_col) == meta.meta_id
    ).select(id_col, F.col("meta_cid").alias("cluster_id"))
    return old_final.unionByName(new_final)


def delete_from_components(
    assign: DataFrame,
    edges: DataFrame,
    deleted: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
) -> DataFrame:
    """Remove nodes from an existing clustering, handling SPLITS — the
    delete-side complement of :func:`incremental_components`.

    Deleting a node is edge retraction: a removed cut vertex splits
    its component, which label propagation cannot express — but a
    localized REBUILD can, because vertex deletion only ever affects
    the deleted nodes' own components. So: (1) the affected clusters
    are the deleted nodes' clusters (one semi-join on the assignment);
    (2) their LIVE members re-cluster from scratch on the
    survivor-restricted edge subgraph — O(affected clusters), not
    O(corpus), since components are edge-closed by construction;
    (3) every other assignment row passes through untouched. A deleted
    representative relabels its survivors to the new min id; a deleted
    cut vertex yields one cluster per surviving piece.

    ``assign``: (id_col, cluster_id) — the stored clustering;
    ``edges``: (id_a, id_b) — the pair evidence the clustering was
    built from (the component "store" keeps it for exactly this);
    ``deleted``: (id_col). All three are SF-scaling and typically
    checkpoint/explode-descended (estimate-blind) — every join below
    carries a merge hint."""
    dels = deleted.select(id_col)
    affected = (
        assign.join(dels.hint("merge"), id_col)
        .select("cluster_id")
        .distinct()
    )
    aff_members = assign.join(affected.hint("merge"), "cluster_id")
    live_aff = aff_members.join(dels.hint("merge"), id_col, "left_anti").select(
        id_col
    )
    untouched = assign.join(affected.hint("merge"), "cluster_id", "left_anti")
    live_edges = (
        edges.select("id_a", "id_b")
        .join(dels.select(F.col(id_col).alias("id_a")).hint("merge"), "id_a", "left_anti")
        .join(dels.select(F.col(id_col).alias("id_b")).hint("merge"), "id_b", "left_anti")
    )
    # components are edge-closed, so restricting by ONE endpoint's
    # membership keeps exactly the affected clusters' surviving edges
    aff_edges = live_edges.join(
        live_aff.select(F.col(id_col).alias("id_a")).hint("merge"),
        "id_a",
        "left_semi",
    )
    re = connected_components(
        aff_edges, live_aff, id_col=id_col, max_iterations=max_iterations
    )
    return untouched.select(id_col, "cluster_id").unionByName(re)
