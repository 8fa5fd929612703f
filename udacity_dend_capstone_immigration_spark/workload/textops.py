"""Text-analysis + deduplication queries over ``documents``.

The training-data-pipeline tier (BASELINE.json north star): fingerprinting,
quality scoring, language ID, token stats, and the dedup ladder — exact,
n-gram Jaccard, MinHash+LSH, SimHash. Every pipeline is md5-based and
engine-portable, so the DuckDB oracles reproduce results bit-for-bit.

Scale notes per query are in the function docstrings; the common theme:
shuffle fingerprints and signatures, never document bodies, and never
materialize the O(n²) cross product — candidates come from hash buckets.
"""

from __future__ import annotations

from udacity_dend_capstone_immigration_spark.workload.base import read_parquet_memo
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    punct_ratio,
    quality_features,
    stopword_ratio,
    token_count,
    tokenize,
)
from udacity_dend_capstone_immigration_spark.operators.dedup import (
    exact_dedup_by_fingerprint,
    minhash_lsh_dedup_pairs,
    shingle_rows,
    simhash64,
)
from udacity_dend_capstone_immigration_spark.workload.base import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
    table,
)

# ---- shared DuckDB fragments (must mirror functions/text.py exactly) ----

NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
TOKS = f"list_filter(string_split({NORM}, ' '), x -> x != '')"


def _hits(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({TOKS}, t -> list_contains([{lst}], t)))"


EN = _hits(("the", "a", "of", "and", "is", "to", "in"))
ES = _hits(("el", "la", "de", "y", "es", "en", "los"))
FR = _hits(("le", "la", "de", "et", "est", "les", "un"))
DE = _hits(("der", "die", "das", "und", "ist", "ein", "zu"))

LANG_GUESS = f"""
    CASE WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
         WHEN {EN} = 0 AND {ES} = 0 AND {FR} = 0 AND {DE} = 0 THEN 'und'
         WHEN {EN} >= {ES} AND {EN} >= {FR} AND {EN} >= {DE} THEN 'en'
         WHEN {ES} >= {FR} AND {ES} >= {DE} THEN 'es'
         WHEN {FR} >= {DE} THEN 'fr'
         ELSE 'de' END
"""

SHINGLES = f"""
    SELECT doc_id,
           list_sort(list_distinct(list_transform(
               generate_series(1, greatest(len(t) - 2, 0)),
               i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS shingles
    FROM (SELECT doc_id, {TOKS} AS t FROM documents)
    WHERE len(t) >= 3
"""


# --- content fingerprint + token counting (doc_fingerprint, token_count).
@query(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5({NORM}) AS fingerprint,
           CAST(len({TOKS}) AS INT) AS n_tokens,
           {LANG_GUESS} AS lang_guess
    FROM documents
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Fingerprint stays a pure map; the language vote is computed by
    exploding tokens ONCE and taking 4 conditional counts + a token
    count in a single map-side-combinable aggregate — the per-row
    ``language_guess`` expression re-tokenizes the text 5× through
    interpreted HOF filters (~1.6× slower measured at sf0.1, and the
    gap widens with document length). Values are identical
    (tests/test_textops equivalence)."""
    from udacity_dend_capstone_immigration_spark.functions.text import CJK_PATTERN, LANG_MARKERS, tokenize

    docs = table(spark, sf_dir, "documents")
    tok_rows = docs.select("doc_id", F.explode_outer(tokenize(F.col("text"))).alias("tok"))
    hits = tok_rows.groupBy("doc_id").agg(
        F.count("tok").alias("n_tokens"),
        *[
            F.count(F.when(F.col("tok").isin(*LANG_MARKERS[lang]), 1)).alias(f"h_{lang}")
            for lang in ("en", "es", "fr", "de")
        ],
    )
    en, es, fr, de = (F.col(f"h_{lang}") for lang in ("en", "es", "fr", "de"))
    lang = (
        F.when(F.col("has_cjk"), F.lit("zh"))
        .when((en == 0) & (es == 0) & (fr == 0) & (de == 0), F.lit("und"))
        .when((en >= es) & (en >= fr) & (en >= de), F.lit("en"))
        .when((es >= fr) & (es >= de), F.lit("es"))
        .when(fr >= de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    base = docs.select(
        "doc_id",
        doc_fingerprint("text").alias("fingerprint"),
        (F.regexp_count(F.col("text"), F.lit(CJK_PATTERN)) > 0).alias("has_cjk"),
    )
    return base.join(hits, "doc_id").select(
        "doc_id",
        "fingerprint",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        lang.alias("lang_guess"),
    )


# --- language-ID eval: the n-gram-marker guesser vs the generator's
# lang label — the confusion matrix a curation pipeline reads before
# trusting the guesser to route/filter a corpus by language. Reuses
# the registered doc_fingerprints prediction (single tokenize +
# conditional counts) so the guesser evaluated IS the guesser served.
@query(
    "langid_confusion",
    oracle=f"""
    WITH p AS (SELECT doc_id, lang, {LANG_GUESS} AS lang_guess FROM documents)
    SELECT lang AS true_lang, lang_guess AS predicted_lang,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM p GROUP BY lang, lang_guess
    """,
)
def langid_confusion(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.workload.base import QUERIES

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    pred = QUERIES["doc_fingerprints"](spark, sf_dir).select(
        "doc_id", F.col("lang_guess").alias("predicted_lang")
    )
    return (
        docs.join(pred, "doc_id")
        .groupBy("true_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


# --- quality scoring: length/punct/stopword signals, all double per-row.
@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars_measured,
           CAST(len({TOKS}) AS INT) AS n_tokens,
           CAST(length(array_to_string({TOKS}, '')) AS DOUBLE)
               / greatest(len({TOKS}), 1) AS avg_token_len,
           CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) AS punct_ratio,
           CAST(len(list_filter({TOKS},
                t -> list_contains(['the','a','of','and','is','to','in'], t))) AS DOUBLE)
               / greatest(len({TOKS}), 1) AS stopword_ratio
    FROM documents
    """,
)
def text_quality_scores(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    q = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        q["n_chars"].cast("int").alias("n_chars_measured"),
        q["n_tokens"].alias("n_tokens"),
        q["avg_token_len"].cast("double").alias("avg_token_len"),
        punct_ratio(F.col("text")).cast("double").alias("punct_ratio"),
        stopword_ratio(F.col("text")).cast("double").alias("stopword_ratio"),
    )


# --- corpus token stats rollup (A1-shaped over text features).
@query(
    "token_stats_by_source",
    oracle=f"""
    SELECT source, lang,
           COUNT(*) AS doc_cnt,
           CAST(SUM(len({TOKS})) AS BIGINT) AS total_tokens,
           {sql_davg("n_chars", "avg_chars")}
    FROM documents
    GROUP BY source, lang
    """,
)
def token_stats_by_source(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("doc_cnt"),
        F.sum(token_count("text")).alias("total_tokens"),
        davg(F.col("n_chars"), "avg_chars"),
    )


# --- exact dedup: min-id representative per md5 fingerprint.
@query(
    "dedup_exact_docs",
    oracle=f"""
    SELECT min(doc_id) AS doc_id, md5({NORM}) AS fingerprint,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5({NORM})
    """,
)
def dedup_exact_docs(spark, sf_dir):
    """Shuffles (fingerprint, id) pairs only — document bodies never move."""
    docs = table(spark, sf_dir, "documents")
    return exact_dedup_by_fingerprint(docs, "doc_id", "text")


# --- n-gram Jaccard near-dup: grouped shingle pair generation, exact
# scores. Stop-shingle cap: shingles in more than this many documents
# are boilerplate and are excluded from intersection evidence (mirrored
# in the oracle's ``keep`` CTE). Set sizes stay uncapped, so kept pairs
# score their TRUE Jaccard minus only hot-shingle contributions.
_NGRAM_SHINGLE_CAP = 50


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({SHINGLES}),
    e AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    keep AS (SELECT g FROM e GROUP BY g
             HAVING COUNT(*) BETWEEN 2 AND {_NGRAM_SHINGLE_CAP}),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN keep ON keep.g = a.g
        GROUP BY a.doc_id, b.doc_id
    ),
    z AS (SELECT doc_id, len(shingles) AS n FROM sh)
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / (za.n + zb.n - i) AS jaccard
    FROM inter JOIN z za ON id_a = za.doc_id JOIN z zb ON id_b = zb.doc_id
    WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact-Jaccard near-dup via ONE groupBy(shingle) building the doc
    group + document frequency in the same shuffle, then an in-group
    double explode — never a shingle self-equi-join (CLAUDE.md hard-won
    rule: one hot shingle squares the join; the exact OOM the winnowing
    path hit pre-cap). Groups with df < 2 (the bulk of the vocabulary)
    are pruned before fan-out; the ``_NGRAM_SHINGLE_CAP`` stop-shingle
    cap (oracle-mirrored) bounds per-group pair output at cap² so
    boilerplate can't blow up at corpus scale. The intersection count is
    map-side combinable; set sizes ride a second aggregate of the same
    checkpointed rows."""
    docs = table(spark, sf_dir, "documents")
    # the distinct shingle rows feed two consumers (pair groups + set
    # sizes); a lazy checkpoint tokenizes the corpus once instead of
    # twice
    e = (
        shingle_rows(docs, "doc_id", "text", 3)
        .withColumnRenamed("shingle", "g")
        .localCheckpoint(eager=False)
    )
    grp = e.groupBy("g").agg(F.collect_set("doc_id").alias("ids"))
    grp = grp.select("ids", F.size("ids").alias("_df")).where(
        (F.col("_df") >= 2) & (F.col("_df") <= _NGRAM_SHINGLE_CAP)
    )
    inter = (
        grp.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    z = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    za = z.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    zb = z.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        # merge hints: za/zb are O(docs) and the pair side O(candidates) —
        # all SF-scaling, all size-blind behind the checkpointed explode
        # (the static planner broadcast the PAIR side at a 100x corpus:
        # 1.2 GiB build; see operators/dedup.py:jaccard_verified_pairs)
        inter.join(za.hint("merge"), "id_a")
        .join(zb.hint("merge"), "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= 0.5)
    )


# --- directed containment near-dup: C(A→B) = |shingles(A) ∩
# shingles(B)| / |shingles(A)|. Symmetric Jaccard misses the
# excerpt/quote case (a short doc wholly inside a long one scores low
# Jaccard but containment ≈ 1) — the dedup direction a pre-training
# corpus needs for boilerplate inclusions and quoted passages
# (Broder's containment, the original resemblance paper's second
# measure). Same capped rare-shingle intersection evidence as the
# Jaccard path (oracle-mirrored); each unordered candidate pair yields
# both directions, filtered at 0.8.
_CONTAIN_TAU = 0.8


@query(
    "dedup_shingle_containment",
    oracle=f"""
    WITH sh AS ({SHINGLES}),
    e AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    keep AS (SELECT g FROM e GROUP BY g
             HAVING COUNT(*) BETWEEN 2 AND {_NGRAM_SHINGLE_CAP}),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN keep k ON k.g = a.g
        GROUP BY a.doc_id, b.doc_id
    ),
    z AS (SELECT doc_id, len(shingles) AS n FROM sh),
    directed AS (
        SELECT id_a AS contained_id, id_b AS container_id,
               CAST(i AS DOUBLE) / za.n AS containment
        FROM inter JOIN z za ON id_a = za.doc_id
        UNION ALL
        SELECT id_b, id_a, CAST(i AS DOUBLE) / zb.n
        FROM inter JOIN z zb ON id_b = zb.doc_id
    )
    SELECT contained_id, container_id, containment
    FROM directed WHERE containment >= {_CONTAIN_TAU}
    """,
)
def dedup_shingle_containment(spark, sf_dir):
    """One shared intersection count feeds both directions (the grouped
    rare-shingle pass — never a shingle self-equi-join); sizes join
    merge-hinted like the Jaccard path. A single IEEE division per
    direction keeps the doubles bit-portable without decimal sums."""
    from udacity_dend_capstone_immigration_spark.operators.dedup import shingle_rows

    docs = table(spark, sf_dir, "documents")
    e = (
        shingle_rows(docs, "doc_id", "text", 3)
        .withColumnRenamed("shingle", "g")
        .localCheckpoint(eager=False)
    )
    grp = (
        e.groupBy("g")
        .agg(F.collect_set("doc_id").alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= _NGRAM_SHINGLE_CAP))
    )
    inter = (
        grp.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    z = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    za = z.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    zb = z.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    both = inter.join(za.hint("merge"), "id_a").join(zb.hint("merge"), "id_b")
    fwd = both.select(
        F.col("id_a").alias("contained_id"),
        F.col("id_b").alias("container_id"),
        (F.col("i").cast("double") / F.col("na")).alias("containment"),
    )
    rev = both.select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        (F.col("i").cast("double") / F.col("nb")).alias("containment"),
    )
    return fwd.unionByName(rev).where(F.col("containment") >= _CONTAIN_TAU)


# --- incremental ingestion dedup: classify a NEW batch of documents
# against the EXISTING corpus — the op every production pipeline runs
# on ingest (new data must dedup against everything already ingested,
# never the other way round). Batch membership is deterministic here
# (doc_id % _INC_MOD == 0 plays the incoming batch); statuses:
#   exact_dup — content fingerprint already in the corpus
#   near_dup  — shares a capped rare shingle with a corpus doc at
#               Jaccard ≥ 0.5 (the dedup_ngram_jaccard convention:
#               kept-shingle intersections over FULL set sizes)
#   unique    — neither
# Scale shape: fingerprints dedup via one (fingerprint,id) exchange —
# bodies never move; near-dup pairs come from the grouped rare-shingle
# pass restricted to new × corpus pairs (the in-group split means
# batch-internal and corpus-internal pairs are never generated at all,
# so a small batch against a huge corpus fans out per-shingle to
# |new∩g| × |corpus∩g| ≤ cap²). Exact-dup precedence over near-dup.
_INC_MOD = 7


@query(
    "dedup_incremental_status",
    oracle=f"""
    WITH sh AS ({SHINGLES}),
    e AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    keep AS (SELECT g FROM e GROUP BY g
             HAVING COUNT(*) BETWEEN 2 AND {_NGRAM_SHINGLE_CAP}),
    ke AS (SELECT e.doc_id, e.g FROM e JOIN keep USING (g)),
    inter AS (
        SELECT a.doc_id AS nid, b.doc_id AS cid, COUNT(*) AS i
        FROM ke a JOIN ke b ON a.g = b.g
        WHERE a.doc_id % {_INC_MOD} = 0 AND b.doc_id % {_INC_MOD} != 0
        GROUP BY a.doc_id, b.doc_id
    ),
    z AS (SELECT doc_id, len(shingles) AS n FROM sh),
    near AS (
        SELECT DISTINCT nid FROM inter
            JOIN z za ON za.doc_id = nid
            JOIN z zb ON zb.doc_id = cid
        WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= 0.5
    ),
    fpc AS (SELECT DISTINCT md5({NORM}) AS fp FROM documents
            WHERE doc_id % {_INC_MOD} != 0)
    SELECT doc_id,
           CASE WHEN md5({NORM}) IN (SELECT fp FROM fpc) THEN 'exact_dup'
                WHEN doc_id IN (SELECT nid FROM near) THEN 'near_dup'
                ELSE 'unique' END AS status
    FROM documents WHERE doc_id % {_INC_MOD} = 0
    """,
)
def dedup_incremental_status(spark, sf_dir):
    """One shingle scan feeds both classes: the rare-shingle groups
    split in-group into new/corpus id arrays (array `filter` lambdas —
    interpreted, but over ≤cap-element arrays, not corpus rows), so
    only cross-class pairs are ever exploded. The fingerprint check is
    a broadcast-free left join on the 32-char md5. Status joins are
    merge-hinted: every side is SF-scaling and the near set sits
    behind the explode (estimate-blind class)."""
    from udacity_dend_capstone_immigration_spark.functions.text import doc_fingerprint
    from udacity_dend_capstone_immigration_spark.operators.dedup import shingle_rows

    docs = table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % _INC_MOD == 0
    e = (
        shingle_rows(docs, "doc_id", "text", 3)
        .withColumnRenamed("shingle", "g")
        .localCheckpoint(eager=False)
    )
    grp = (
        e.groupBy("g")
        .agg(F.collect_set("doc_id").alias("ids"))
        .where((F.size("ids") >= 2) & (F.size("ids") <= _NGRAM_SHINGLE_CAP))
        .select(
            F.expr(f"filter(ids, x -> x % {_INC_MOD} = 0)").alias("nids"),
            F.expr(f"filter(ids, x -> x % {_INC_MOD} != 0)").alias("cids"),
        )
        .where((F.size("nids") >= 1) & (F.size("cids") >= 1))
    )
    inter = (
        grp.select(F.explode("nids").alias("nid"), "cids")
        .select("nid", F.explode("cids").alias("cid"))
        .groupBy("nid", "cid")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    z = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    za = z.select(F.col("doc_id").alias("nid"), F.col("n").alias("na"))
    zb = z.select(F.col("doc_id").alias("cid"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    near = (
        inter.join(za.hint("merge"), "nid")
        .join(zb.hint("merge"), "cid")
        .where(jac >= 0.5)
        .select(F.col("nid").alias("doc_id"))
        .distinct()
        .withColumn("_near", F.lit(1))
    )
    corp_fp = (
        docs.where(~is_new)
        .select(doc_fingerprint("text").alias("fp"))
        .distinct()
        .withColumn("_exact", F.lit(1))
    )
    base = docs.where(is_new).select("doc_id", doc_fingerprint("text").alias("fp"))
    return (
        base.join(corp_fp.hint("merge"), "fp", "left")
        .join(near.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact") == 1, F.lit("exact_dup"))
            .when(F.col("_near") == 1, F.lit("near_dup"))
            .otherwise(F.lit("unique"))
            .alias("status"),
        )
    )


# --- bounded edit-distance near-dup: the typo/near-verbatim detector
# (character-level, where Jaccard's bag-of-shingles misses transposed
# or lightly-edited boilerplate). Candidates come from the SAME capped
# rare-shingle groups as the Jaccard path — never an all-pairs join —
# and the verify is Levenshtein with Spark's threshold-banded kernel
# (O(k·len) per pair instead of O(len²); pairs beyond the band return
# -1 and drop). A pair is a near-dup when distance ≤ min(20% of the
# longer doc, _EDIT_ABS): the relative bound is the semantic knob, the
# absolute bound keeps the DP band narrow at any document length.
# Candidates must share ≥ _EDIT_MIN_SHARED rare shingles (a ≤20%-edit
# pair shares most of its trigrams, so this drops single-collision
# noise pairs before their text bodies ever shuffle — measured 3.73 →
# 2.54 min-of-3 at sf0.1, verified output identical).
_EDIT_REL, _EDIT_ABS, _EDIT_MIN_SHARED = 0.2, 64, 3


@query(
    "dedup_edit_distance",
    oracle=f"""
    WITH sh AS ({SHINGLES}),
    e AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    keep AS (SELECT g FROM e GROUP BY g
             HAVING COUNT(*) BETWEEN 2 AND {_NGRAM_SHINGLE_CAP}),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN keep k ON k.g = a.g
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(*) >= {_EDIT_MIN_SHARED}
    )
    SELECT id_a, id_b,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_distance
    FROM cand
        JOIN documents da ON da.doc_id = id_a
        JOIN documents db ON db.doc_id = id_b
    WHERE levenshtein(da.text, db.text) <=
          LEAST(CAST(floor({_EDIT_REL}e0 * GREATEST(length(da.text), length(db.text))) AS BIGINT),
                {_EDIT_ABS})
    """,
)
def dedup_edit_distance(spark, sf_dir):
    """Capped rare-shingle candidates (one groupBy, df ∈ [2, cap],
    in-group explode — the dedup_ngram_jaccard shape) → distinct pairs
    → threshold-banded Levenshtein verify on the raw text. The text
    joins are merge-hinted: both sides are SF-scaling and the candidate
    side is estimate-blind behind the explode (the r8 broadcast-gate
    class). Distances compare exactly against the oracle because the
    band only truncates ABOVE the absolute bound, where both engines
    discard the pair anyway."""
    from udacity_dend_capstone_immigration_spark.operators.dedup import shingle_rows

    docs = table(spark, sf_dir, "documents")
    e = shingle_rows(docs, "doc_id", "text", 3).withColumnRenamed("shingle", "g")
    grp = (
        e.groupBy("g")
        .agg(F.collect_set("doc_id").alias("ids"))
        .select("ids", F.size("ids").alias("_df"))
        .where((F.col("_df") >= 2) & (F.col("_df") <= _NGRAM_SHINGLE_CAP))
    )
    cand = (
        grp.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .where(F.col("_shared") >= _EDIT_MIN_SHARED)
        .select("id_a", "id_b")
    )
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("_ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("_tb"))
    d = F.levenshtein(F.col("_ta"), F.col("_tb"), _EDIT_ABS)
    bound = F.least(
        F.floor(F.lit(_EDIT_REL) * F.greatest(F.length("_ta"), F.length("_tb"))),
        F.lit(_EDIT_ABS).cast("bigint"),
    )
    return (
        cand.join(ta.hint("merge"), "id_a")
        .join(tb.hint("merge"), "id_b")
        .select("id_a", "id_b", d.alias("edit_distance"), bound.alias("_b"))
        .where((F.col("edit_distance") >= 0) & (F.col("edit_distance") <= F.col("_b")))
        .select("id_a", "id_b", F.col("edit_distance").cast("bigint").alias("edit_distance"))
    )


# --- MinHash + LSH near-dup: the 100 TB-scale dedup path.
# Hash family mirrors operators/dedup.py: one md5 per shingle, member i
# = (h1 + i*h2) mod MINHASH_P with h1/h2 the md5's 32-bit halves.
_MH_N, _MH_BANDS, _MH_R = 16, 4, 4
_MH_P = 4294967291
#: Stop-bucket cap (max docs per LSH bucket before the bucket is dropped
#: as boilerplate). Mirrored between the operator call and the oracle's
#: ``bg`` CTE; at the current corpus the largest bucket holds 5 docs, so
#: 50 is semantics-preserving here while bounding in-bucket fan-out at
#: cap² on boilerplate-heavy corpora.
_MH_BUCKET_CAP = 50
_MH_SIG = f"""
    SELECT doc_id, shingles,
           list_transform(generate_series(0, {_MH_N - 1}),
               i -> list_min(list_transform(shingles,
                    s -> (CAST(('0x' || substring(md5(s), 1, 8)) AS BIGINT)
                          + i * CAST(('0x' || substring(md5(s), 9, 8)) AS BIGINT))
                         % {_MH_P}))) AS sig
    FROM sh
"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS ({SHINGLES}),
    sig AS ({_MH_SIG}),
    bands AS (
        SELECT doc_id, j,
               md5(CAST(j AS VARCHAR) || ':' ||
                   array_to_string(list_slice(sig, j*{_MH_R}+1, j*{_MH_R}+{_MH_R}), ',')) AS bucket
        FROM sig, UNNEST(generate_series(0, {_MH_BANDS - 1})) AS u(j)
    ),
    bg AS (
        SELECT j, bucket FROM bands GROUP BY j, bucket
        HAVING COUNT(*) BETWEEN 2 AND {_MH_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
            ON a.j = b.j AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        JOIN bg ON bg.j = a.j AND bg.bucket = a.bucket
    ),
    z AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh)
    SELECT id_a, id_b,
           CAST(len(list_intersect(za.shingles, zb.shingles)) AS DOUBLE)
               / len(list_distinct(za.shingles || zb.shingles)) AS jaccard
    FROM cand JOIN z za ON id_a = za.doc_id JOIN z zb ON id_b = zb.doc_id
    WHERE CAST(len(list_intersect(za.shingles, zb.shingles)) AS DOUBLE)
               / len(list_distinct(za.shingles || zb.shingles)) >= 0.5
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    """shingle → 16-hash MinHash signature (per-row, zero shuffle) →
    4 bands of 4 → bucket self-join → exact Jaccard verify. Shuffle is
    O(docs × bands) small keys; only bucket-colliding docs ever pair."""
    docs = table(spark, sf_dir, "documents")
    return minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=_MH_N, bands=_MH_BANDS, threshold=0.5, max_bucket_df=_MH_BUCKET_CAP
    )


# --- SimHash signatures (near-dup by Hamming proximity; exact-equal
# signature groups are the strictest bucket).
@query(
    "dedup_simhash",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({TOKS}) AS tk FROM documents),
    h AS (SELECT doc_id, substring(md5(tk), 1, 16) AS h FROM tok),
    bits AS (
        SELECT doc_id, p,
               CASE WHEN CAST(floor(
                        (strpos('0123456789abcdef', substring(h, (p // 4) + 1, 1)) - 1)
                        / (2 ** (3 - (p % 4)))) AS INT) % 2 = 1
                    THEN 1 ELSE -1 END AS v
        FROM h, UNNEST(generate_series(0, 63)) AS u(p)
    ),
    s AS (SELECT doc_id, p, SUM(v) AS sv FROM bits GROUP BY doc_id, p)
    SELECT doc_id,
           string_agg(CASE WHEN sv > 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS simhash_bits
    FROM s GROUP BY doc_id
    """,
)
def dedup_simhash(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sig = simhash64(docs, "doc_id", tokenize(F.col("text")))
    return sig.select(
        "doc_id",
        F.concat_ws("", F.transform(F.col("simhash"), lambda b: b.cast("string"))).alias(
            "simhash_bits"
        ),
    )


# --- token counting two ways: whitespace tokens and the BPE-ish sub-word
# regex (letter runs / digit runs / punctuation marks). Both per-row map
# work; identical RE2/Java-portable pattern on both engines.
@query(
    "token_counts_bpe_ish",
    oracle=f"""
    SELECT doc_id,
           CAST(len({TOKS}) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS INT)
               AS bpe_ish_tokens
    FROM documents
    """,
)
def token_counts_bpe_ish(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        bpe_ish_token_count("text").alias("bpe_ish_tokens"),
    )


# --- pairs -> clusters: connected components over the near-dup graph
# (the step that turns MinHash pair output into usable dedup groups).
# Spark side is iterative min-label propagation with localCheckpoint
# lineage truncation; the oracle is a recursive CTE over the same pairs.
from udacity_dend_capstone_immigration_spark.operators.dedup import connected_components  # noqa: E402
from udacity_dend_capstone_immigration_spark.workload.base import ORACLES  # noqa: E402


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({ORACLES["dedup_minhash_lsh"]}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lab FROM documents
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=_MH_N, bands=_MH_BANDS, threshold=0.5, max_bucket_df=_MH_BUCKET_CAP
    ).select("id_a", "id_b")
    return connected_components(pairs, docs.select("doc_id"), id_col="doc_id")


# --- MinHash-banding recall audit: fraction of exact Jaccard-τ pairs
# (the `dedup_ngram_jaccard` semantics — same 3-shingles, same
# stop-shingle/cap regime) the LSH banding pass captures, next to the
# textbook banding prediction E[1-(1-s^r)^b] averaged over those same
# pairs. The flagship 100 TB text-dedup path was the one heavy
# approximate path with no measured recall (r9 verdict, missing #1);
# this composes the two existing oracle-defined queries exactly as
# `semantic_dedup_recall` composes SemDeDup/exact and `ann_ivf_recall`
# composes IVF/brute-force. Divergence between the two numbers is the
# non-independence of the (h1 + i·h2) mod P hash family plus the
# τ-boundary mass; at 100 TB the exact side runs on a sampled id range
# so auditing stays O(sample × corpus), never O(corpus²).
@query(
    "dedup_minhash_recall",
    oracle=f"""
    WITH exact AS ({ORACLES["dedup_ngram_jaccard"]}),
    approx AS ({ORACLES["dedup_minhash_lsh"]}),
    capt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS captured_pairs
        FROM exact e JOIN approx a ON e.id_a = a.id_a AND e.id_b = a.id_b
    ),
    ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs,
               {sql_davg(
                   "1.0e0 - (1.0e0 - jaccard*jaccard*jaccard*jaccard)"
                   "*(1.0e0 - jaccard*jaccard*jaccard*jaccard)"
                   "*(1.0e0 - jaccard*jaccard*jaccard*jaccard)"
                   "*(1.0e0 - jaccard*jaccard*jaccard*jaccard)",
                   "predicted_recall",
               )}
        FROM exact
    )
    SELECT ex.exact_pairs, capt.captured_pairs,
           CASE WHEN ex.exact_pairs = 0 THEN 0.0e0
                ELSE CAST(capt.captured_pairs AS DOUBLE) / CAST(ex.exact_pairs AS DOUBLE)
           END AS pair_recall,
           ex.predicted_recall
    FROM ex, capt
    """,
)
def dedup_minhash_recall(spark, sf_dir):
    """One-row audit: exact τ=0.5 pair count, banding-captured count,
    measured pair recall, and the 1-(1-s^4)^4 prediction averaged over
    the exact pairs' Jaccard values (r=4 rows × b=4 bands — the
    registry's `_MH_R`/`_MH_BANDS`). The prediction's power chain is
    written as identical left-associated multiplications in both
    engines and averaged with the decimal-sum convention, so the
    report hashes bit-identically; the recall ratio is one IEEE
    division of two counts."""
    from udacity_dend_capstone_immigration_spark.workload.base import QUERIES

    exact = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).select(
        "id_a", "id_b", "jaccard"
    )
    approx = QUERIES["dedup_minhash_lsh"](spark, sf_dir).select("id_a", "id_b")
    # both pair sets are SF-scaling explode descendants Catalyst
    # under-estimates (the estimate-blind broadcast class) — force SMJ
    captured = exact.hint("merge").join(approx.hint("merge"), ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("captured_pairs")
    )
    j = F.col("jaccard")
    u = F.lit(1.0) - j * j * j * j
    totals = exact.agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_pairs"),
        davg(F.lit(1.0) - u * u * u * u, "predicted_recall"),
    )
    return totals.crossJoin(captured).select(
        "exact_pairs",
        "captured_pairs",
        F.when(F.col("exact_pairs") == 0, F.lit(0.0))
        .otherwise(
            F.col("captured_pairs").cast("double") / F.col("exact_pairs").cast("double")
        )
        .alias("pair_recall"),
        "predicted_recall",
    )


# --- winnowing (rolling-hash) fingerprints: the partial-overlap
# fingerprint scheme (min k-gram hash per sliding window).
from udacity_dend_capstone_immigration_spark.operators.dedup import winnowing_fingerprints  # noqa: E402


@query(
    "doc_winnowing_fingerprints",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {NORM} AS t FROM documents),
    kg AS (
        SELECT doc_id, i AS p, md5(substring(t, i, 8)) AS h
        FROM norm, UNNEST(generate_series(1, length(t) - 7)) AS u(i)
        WHERE length(t) >= 8
    ),
    win AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
               lead(h, 3) OVER (PARTITION BY doc_id ORDER BY p) AS guard
        FROM kg
    )
    SELECT DISTINCT doc_id, fp AS fingerprint FROM win WHERE guard IS NOT NULL
    """,
)
def doc_winnowing_fingerprints(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, "doc_id", "text", k=8, window=4)


# --- overlap detection via winnowing: pairs sharing >= 20 selected
# fingerprints, on fingerprint hashes (32-char strings) — never text.
# Winnowing min-hash selection concentrates on boilerplate (one
# fingerprint hit 3379/5000 docs at sf0.1 → a fingerprint self-join is
# 190M pairs → OOM), so fingerprints in > 50 docs are dropped as
# stop-fingerprints — mirrored in the oracle's ``keep`` CTE — and pair
# generation is the grouped join-free shape, fan-out bounded by 50²
# per fingerprint.
@query(
    "dedup_winnowing_overlap",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {NORM} AS t FROM documents),
    kg AS (
        SELECT doc_id, i AS p, md5(substring(t, i, 8)) AS h
        FROM norm, UNNEST(generate_series(1, length(t) - 7)) AS u(i)
        WHERE length(t) >= 8
    ),
    win AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
               lead(h, 3) OVER (PARTITION BY doc_id ORDER BY p) AS guard
        FROM kg
    ),
    fps0 AS (SELECT DISTINCT doc_id, fp FROM win WHERE guard IS NOT NULL),
    fps AS (
        SELECT fps0.* FROM fps0
        JOIN (SELECT fp FROM fps0 GROUP BY fp HAVING COUNT(*) <= 50) keep
          USING (fp)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 20
    """,
)
def dedup_winnowing_overlap(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.operators.dedup import winnowing_overlap_pairs

    docs = table(spark, sf_dir, "documents")
    return winnowing_overlap_pairs(
        docs, "doc_id", "text", k=8, window=4, min_shared=20, max_fp_df=50
    )


# --- Gopher-style repetition signals: duplicate-token fraction,
# duplicate-bigram fraction, and top-bigram mass fraction (the
# "fraction of text inside the most common 2-gram" filter from the
# Gopher/MassiveText quality rules). All counts are exact integers;
# each fraction is ONE double division, so values are bit-identical
# across engines without the decimal-sum machinery.
@query(
    "doc_repetition_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    u AS (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
        GROUP BY doc_id, tok
    ),
    us AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total,
               COUNT(*) AS dist, CAST(MAX(c) AS BIGINT) AS mx
        FROM u GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id, g, COUNT(*) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(toks) - 1, 0)),
                       i -> array_to_string(list_slice(toks, i, i + 1), ' '))) AS g
            FROM t
        )
        GROUP BY doc_id, g
    ),
    bs AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS total,
               COUNT(*) AS dist, CAST(MAX(c) AS BIGINT) AS mx
        FROM bg GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(coalesce(us.total, 0) AS INT) AS n_tokens,
           CAST(coalesce(us.total - us.dist, 0) AS DOUBLE)
               / greatest(coalesce(us.total, 0), 1) AS dup_token_frac,
           CAST(coalesce(bs.total - bs.dist, 0) AS DOUBLE)
               / greatest(coalesce(bs.total, 0), 1) AS dup_bigram_frac,
           CAST(coalesce(bs.mx, 0) AS DOUBLE)
               / greatest(coalesce(bs.total, 0), 1) AS top_bigram_frac,
           coalesce(CAST(bs.mx AS DOUBLE)
               / greatest(bs.total, 1), 0.0) > 0.18 AS repetitive
    FROM t
    LEFT JOIN us ON t.doc_id = us.doc_id
    LEFT JOIN bs ON t.doc_id = bs.doc_id
    """,
)
def doc_repetition_scores(spark, sf_dir):
    """Two explode→two-level-aggregate pipelines (unigrams, bigrams)
    joined back on doc_id. Both aggregations are map-side combinable
    and shuffle only (doc_id, gram) count rows — never text bodies —
    so the shape survives 100 TB; at that scale the second-level
    aggregate reuses the first shuffle's hash partitioning on doc_id
    (no extra exchange). Shingles come from the codegen'd zip-slice
    builder (``shingle_rows``), not lambda HOFs."""
    docs = table(spark, sf_dir, "documents")
    # tokenize ONCE and lazily checkpoint the compact (doc_id, tokens)
    # rows: the unigram and bigram pipelines plus the doc spine would
    # otherwise each re-scan + re-tokenize the corpus (6 scans → 1)
    toks = docs.select(
        "doc_id", tokenize(F.col("text")).alias("_t")
    ).localCheckpoint(eager=False)

    def _gram_stats(n: int, prefix: str):
        if n == 1:
            e = toks.select("doc_id", F.explode("_t").alias("shingle"))
        else:
            shifted = [F.col("_t")] + [
                F.slice("_t", k + 1, F.greatest(F.size("_t") - k, F.lit(0)))
                for k in range(1, n)
            ]
            zipped = F.arrays_zip(*[c.alias(f"c{i}") for i, c in enumerate(shifted)])
            e = (
                toks.select("doc_id", F.explode(zipped).alias("s"))
                .where(F.col(f"s.c{n - 1}").isNotNull())
                .select(
                    "doc_id",
                    F.concat_ws(" ", *[F.col(f"s.c{k}") for k in range(n)]).alias(
                        "shingle"
                    ),
                )
            )
        per = e.groupBy("doc_id", "shingle").agg(F.count(F.lit(1)).alias("c"))
        return per.groupBy("doc_id").agg(
            F.sum("c").alias(f"{prefix}_total"),
            F.count(F.lit(1)).alias(f"{prefix}_dist"),
            F.max("c").alias(f"{prefix}_mx"),
        )

    u = _gram_stats(1, "tok")
    b = _gram_stats(2, "big")
    tok_total = F.coalesce(F.col("tok_total"), F.lit(0))
    big_total = F.coalesce(F.col("big_total"), F.lit(0))
    top_frac = F.coalesce(F.col("big_mx"), F.lit(0)).cast("double") / F.greatest(
        big_total, F.lit(1)
    )
    return (
        toks.select("doc_id")
        # merge hints: u/b are per-doc aggregates (O(docs), SF-scaling)
        # whose size estimate is explode-blind — unhinted, the static
        # planner broadcasts them at any corpus size
        .join(u.hint("merge"), "doc_id", "left")
        .join(b.hint("merge"), "doc_id", "left")
        .select(
            "doc_id",
            tok_total.cast("int").alias("n_tokens"),
            (
                F.coalesce(F.col("tok_total") - F.col("tok_dist"), F.lit(0)).cast("double")
                / F.greatest(tok_total, F.lit(1))
            ).alias("dup_token_frac"),
            (
                F.coalesce(F.col("big_total") - F.col("big_dist"), F.lit(0)).cast("double")
                / F.greatest(big_total, F.lit(1))
            ).alias("dup_bigram_frac"),
            top_frac.alias("top_bigram_frac"),
            (top_frac > 0.18).alias("repetitive"),
        )
    )


# --- exact-substring dedup (Lee et al. suffix-array criterion,
# bounded): pairs of docs sharing >= 15 consecutive identical tokens,
# found as diagonal runs of matching positional 5-gram shingles.
from udacity_dend_capstone_immigration_spark.operators.dedup import substring_run_pairs  # noqa: E402


@query(
    "dedup_substring_runs",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    ps0 AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS h
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 4, 0))) AS u(i)
    ),
    ps AS (
        SELECT ps0.* FROM ps0
        JOIN (SELECT h FROM ps0 GROUP BY h
              HAVING COUNT(DISTINCT doc_id) <= 50) keep USING (h)
    ),
    m AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM ps a JOIN ps b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    r AS (
        SELECT id_a, id_b, diag,
               pa - row_number() OVER (
                   PARTITION BY id_a, id_b, diag ORDER BY pa) AS island
        FROM m
    ),
    runs AS (
        SELECT id_a, id_b, COUNT(*) + 4 AS run_tokens
        FROM r GROUP BY id_a, id_b, diag, island
    )
    SELECT id_a, id_b, CAST(MAX(run_tokens) AS BIGINT) AS max_run_tokens
    FROM runs GROUP BY id_a, id_b
    HAVING MAX(run_tokens) >= 15
    """,
)
def dedup_substring_runs(spark, sf_dir):
    """A shared L-token exact substring is a diagonal of L-4 consecutive
    positional-5-gram matches; the operator joins md5'd shingles (never
    bodies), groups by (pair, diagonal) and runs gaps-and-islands for
    the max run. Shuffle is O(matching shingle pairs); the
    ``max_shingle_df=50`` stop-shingle cap (mirrored in the oracle's
    ``keep`` CTE) drops shingles shared by >50 docs so boilerplate can't
    square the equi-join at corpus scale — the guard the r2 verdict
    flagged as advertised-but-unset."""
    docs = table(spark, sf_dir, "documents")
    return substring_run_pairs(
        docs, "doc_id", "text", shingle_n=5, min_tokens=15, max_shingle_df=50
    )


# --- corpus trigram LM counts: c(w1 w2 w3) and P(w3 | w1 w2), the
# n-gram language-model estimation pass (perplexity filters, Kneser-Ney
# inputs). One shingle explode → map-side-combinable count → window sum
# over the bigram prefix (the denominator rides the same shuffle as the
# count when Catalyst co-partitions on prefix). Top 20 for the gate;
# unbounded output is the real op.
@query(
    "doc_trigram_lm",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    tri AS (
        SELECT array_to_string(list_slice(toks, i, i + 2), ' ') AS trigram
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
    ),
    cnt AS (SELECT trigram, COUNT(*) AS cnt FROM tri GROUP BY trigram),
    pref AS (
        SELECT trigram, regexp_replace(trigram, ' [^ ]+$', '') AS prefix, cnt,
               SUM(cnt) OVER (PARTITION BY regexp_replace(trigram, ' [^ ]+$', ''))
                   AS prefix_cnt
        FROM cnt
    )
    SELECT trigram, prefix, cnt,
           CAST(cnt AS DOUBLE) / prefix_cnt AS cond_prob
    FROM pref
    ORDER BY cnt DESC, trigram ASC
    LIMIT 20
    """,
)
def doc_trigram_lm(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tri = shingle_rows(docs, "doc_id", "text", 3, distinct=False)
    cnt = tri.groupBy("shingle").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = F.regexp_replace(F.col("shingle"), " [^ ]+$", "")
    w = Window.partitionBy("prefix")
    out = (
        cnt.withColumn("prefix", prefix)
        .withColumn("prefix_cnt", F.sum("cnt").over(w))
        .select(
            F.col("shingle").alias("trigram"),
            "prefix",
            "cnt",
            (F.col("cnt").cast("double") / F.col("prefix_cnt")).alias("cond_prob"),
        )
    )
    return out.orderBy(F.desc("cnt"), F.asc("trigram")).limit(20)


# --- feature hashing (HashingTF re-expressed): tokens → fixed 1024-dim
# sparse counts via md5-mod bucketing. The feature-engineering step that
# turns a corpus into model input without a vocabulary build; sparse
# (doc_id, bucket, tf) rows are the scalable representation (dense
# vectors would ship 1024 doubles per doc; sparse ships |distinct
# tokens|). One explode → map-side-combinable count; md5 keeps the
# bucket assignment identical across engines and retries.
_FH_DIM = 1024


@query(
    "doc_feature_hashing",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
    b AS (
        SELECT doc_id,
               CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT)
                    % {_FH_DIM} AS INT) AS bucket
        FROM tok
    )
    SELECT doc_id, bucket, COUNT(*) AS tf
    FROM b GROUP BY doc_id, bucket
    """,
)
def doc_feature_hashing(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("tok"))
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % _FH_DIM
    ).cast("int")
    return (
        tok.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


# --- dedup survivor selection: the step after pairs→clusters — keep ONE
# representative per near-dup cluster, chosen by quality (longest
# normalized text, doc_id tiebreak), and report what was dropped. This
# closes the dedup ladder: candidates (LSH) → clusters (connected
# components) → survivors. Cluster ids ride the connected-components
# output; the survivor pick is one max_by per cluster — shuffle carries
# (cluster, id, quality) triples only.
@query(
    "dedup_keep_best",
    oracle=f"""
    WITH clusters AS ({ORACLES["dedup_clusters"]}),
    q AS (
        SELECT doc_id, length({NORM}) AS quality FROM documents
    ),
    ranked AS (
        SELECT c.cluster_id, c.doc_id, q.quality,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
               COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
        FROM clusters c JOIN q ON c.doc_id = q.doc_id
    )
    SELECT cluster_id, doc_id AS kept_doc_id,
           CAST(quality AS INT) AS quality,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(cluster_size - 1 AS BIGINT) AS dropped_cnt
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark, sf_dir):
    from pyspark.sql import Window

    from udacity_dend_capstone_immigration_spark.functions.text import normalize_text

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=_MH_N, bands=_MH_BANDS, threshold=0.5, max_bucket_df=_MH_BUCKET_CAP
    ).select("id_a", "id_b")
    clusters = connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    q = docs.select("doc_id", F.length(normalize_text("text")).alias("quality"))
    joined = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    ws = Window.partitionBy("cluster_id")
    ranked = joined.withColumn("rn", F.row_number().over(w)).withColumn(
        "cluster_size", F.count(F.lit(1)).over(ws)
    )
    return ranked.where(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("quality").cast("int").alias("quality"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        (F.col("cluster_size") - 1).cast("bigint").alias("dropped_cnt"),
    )


# --- PageRank over the near-dup graph: the iterative-fixed-point
# operator family beyond connected components. 3 unrolled iterations in
# the oracle mirror the operator's exact expression sequence (teleport
# base, per-edge double contribution, exact decimal sum), so 500 ranks
# match DuckDB bit-for-bit — determinism that survives partitioning and
# retries is what makes iterative distributed algorithms debuggable.
from udacity_dend_capstone_immigration_spark.operators.graph import pagerank  # noqa: E402


def _pr_iter(prev: str, out: str) -> str:
    return f"""
    {out} AS (
        SELECT d.doc_id AS node,
               (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                   / (SELECT CAST(c AS DOUBLE) FROM nn)
               + coalesce(s.s, CAST(0.0 AS DOUBLE)) AS r
        FROM documents d LEFT JOIN (
            SELECT e.dst AS node,
                   CAST(CAST(SUM(CAST((CAST(0.85 AS DOUBLE) * p.r) / deg.deg
                        AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS s
            FROM edges e JOIN {prev} p ON e.src = p.node
                JOIN deg ON e.src = deg.src
            GROUP BY e.dst
        ) s ON d.doc_id = s.node
    )"""


@query(
    "doc_pagerank_near_dup",
    oracle=f"""
    WITH pairs AS ({ORACLES["dedup_minhash_lsh"]}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS c FROM documents),
    r0 AS (
        SELECT doc_id AS node,
               CAST(1.0 AS DOUBLE) / (SELECT CAST(c AS DOUBLE) FROM nn) AS r
        FROM documents
    ),
    {_pr_iter("r0", "r1")},
    {_pr_iter("r1", "r2")},
    {_pr_iter("r2", "r3")}
    SELECT node AS doc_id, r AS pagerank FROM r3
    """,
)
def doc_pagerank_near_dup(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(
        docs, "doc_id", "text", shingle_n=3, num_hashes=_MH_N, bands=_MH_BANDS, threshold=0.5, max_bucket_df=_MH_BUCKET_CAP
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    return pagerank(edges, docs.select("doc_id"), id_col="doc_id", iters=3)


# --- prefix-filtering set-similarity join (PPJoin/AllPairs family):
# candidates come from each set's rarest-shingle prefix instead of every
# shingle, so hot boilerplate shingles rarely enter the join — the
# variant that holds up on repetitive corpora at scale. The oracle
# mirrors the FULL candidate semantics (per-doc (df, shingle) ranking,
# prefix length |s| - ceil(t*|s|) + 1, prefix-token df cap) rather than
# sharing the ngram oracle: with the hard cap, prefix filtering is no
# longer guaranteed-complete on pathological corpora, so equivalence to
# the full join is not an invariant to assert.
from udacity_dend_capstone_immigration_spark.operators.dedup import prefix_filter_jaccard_pairs  # noqa: E402

_PREFIX_DF_CAP = 50


@query(
    "dedup_prefix_filter_jaccard",
    oracle=f"""
    WITH sh AS ({SHINGLES}),
    e AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    freq AS (SELECT g, COUNT(*) AS df FROM e GROUP BY g),
    z AS (SELECT doc_id, shingles, len(shingles) AS n FROM sh),
    ranked AS (
        SELECT e.doc_id, e.g,
               row_number() OVER (PARTITION BY e.doc_id ORDER BY f.df, e.g) AS pos
        FROM e JOIN freq f ON e.g = f.g
    ),
    prefix AS (
        SELECT r.doc_id, r.g
        FROM ranked r JOIN z ON r.doc_id = z.doc_id
        WHERE r.pos <= z.n - CEIL(0.5 * z.n) + 1
    ),
    pg AS (SELECT g FROM prefix GROUP BY g
           HAVING COUNT(*) BETWEEN 2 AND {_PREFIX_DF_CAP}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN prefix b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN pg ON pg.g = a.g
    )
    SELECT id_a, id_b,
           CAST(len(list_intersect(za.shingles, zb.shingles)) AS DOUBLE)
               / len(list_distinct(za.shingles || zb.shingles)) AS jaccard
    FROM cand JOIN z za ON id_a = za.doc_id JOIN z zb ON id_b = zb.doc_id
    WHERE CAST(len(list_intersect(za.shingles, zb.shingles)) AS DOUBLE)
               / len(list_distinct(za.shingles || zb.shingles)) >= 0.5
    """,
)
def dedup_prefix_filter_jaccard(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_prefix_df=_PREFIX_DF_CAP
    )


# --- overlapping token-window chunking (RAG / context-window prep):
# 64-token windows every 48 tokens. One MAP stage end-to-end — see
# operators/chunking.py for the scale notes. chunk_text is projected
# away here so the compared result shuffles hashes, not bodies.
_CHUNK, _STRIDE = 64, 48


@query(
    "doc_chunk_windows",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS t FROM documents WHERE len({TOKS}) >= 1)
    SELECT doc_id,
           CAST((s - 1) // {_STRIDE} AS INT) AS chunk_idx,
           CAST(len(list_slice(t, s, s + {_CHUNK} - 1)) AS INT) AS n_chunk_tokens,
           md5(array_to_string(list_slice(t, s, s + {_CHUNK} - 1), ' ')) AS chunk_hash
    FROM t, UNNEST(generate_series(1, len(t), {_STRIDE})) AS u(s)
    """,
)
def doc_chunk_windows(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.operators.chunking import chunk_windows

    docs = table(spark, sf_dir, "documents")
    return chunk_windows(docs, "doc_id", "text", chunk_size=_CHUNK, stride=_STRIDE).select(
        "doc_id", "chunk_idx", "n_chunk_tokens", "chunk_hash"
    )


# --- TF-IDF top terms per document. Raw inverse document frequency
# (tf * N / df, one double multiply + one divide — bit-portable across
# engines, unlike ln-based idf whose libm rounding may differ) with an
# explicit (score DESC, term ASC) tiebreak. Plan shape: ONE tokenize —
# the tf aggregate shuffles (doc, term) once and is pinned with a lazy
# localCheckpoint; df is a map-combinable groupBy(term).count() over
# the pinned tf rows (tf rows ARE the distinct doc-term pairs), so the
# corpus is scanned and tokenized exactly once — at 100× a second
# tokenize pass re-reads every document, and the r8 A/B shows the
# checkpoint now costs nothing at bench width (0.93 vs 0.96 min-of-3
# at sf0.1; exchange reuse never materializes for the two-aggregate
# shape, so deriving df from un-pinned tf would re-run the final tf
# aggregate instead). df stays an equi-join, NOT a
# Window.partitionBy(term): the term key is Zipf-distributed, and a
# stopword's window partition would buffer ~every document's row in
# ONE task at 100×, whereas AQE can skew-split (or broadcast) a hot
# JOIN key. The final top-5 window partitions by doc_id (naturally
# bounded, and WindowGroupLimit prunes to 5 per group before the
# shuffle). n_docs broadcasts from a column-pruned count scan.
@query(
    "doc_tfidf_top_terms",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                   / CAST(df.df AS DOUBLE) AS tfidf,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE)
                                / CAST(df.df AS DOUBLE) DESC,
                            tf.term ASC
               ) AS rk
        FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rk AS INT) AS rk
    FROM scored WHERE rk <= 5
    """,
)
def doc_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # merge hint: df is vocabulary-sized (Heaps-law growth with corpus)
    # and estimate-blind behind the checkpointed tf rows — unhinted, the
    # static planner broadcasts it at any corpus size
    scored = tf.join(df.hint("merge"), "term").join(
        F.broadcast(n_docs)
    ).withColumn(
        "tfidf",
        F.col("tf").cast("double") * F.col("n_docs").cast("double")
            / F.col("df").cast("double"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


# --- LM-likelihood document scoring: apply the corpus trigram LM back
# to each document — the quality-filtering signal ("how typical is this
# text of the corpus") that pipelines threshold on before training.
# Average CONDITIONAL PROBABILITY (not log-likelihood: ln's libm
# rounding is not bit-portable across engines; each prob is one double
# division and the mean is a decimal-sum — exactly portable).
# Plan shape: the trigram explode is a cheap narrow pipeline computed
# twice (count side + doc side) rather than materialized — partial
# aggregation on the count side, then ONE equi-join on trigram brings
# cond_prob back to the doc rows, then a doc_id aggregate. No windows
# over raw trigram rows: a hot trigram would buffer its whole partition
# in WindowExec, while the aggregate+join shape stays map-combinable.
@query(
    "doc_lm_likelihood",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    tri AS (
        SELECT doc_id, array_to_string(list_slice(toks, i, i + 2), ' ') AS trigram
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
    ),
    cnt AS (SELECT trigram, COUNT(*) AS cnt FROM tri GROUP BY trigram),
    p AS (
        SELECT trigram,
               CAST(cnt AS DOUBLE)
                   / SUM(cnt) OVER (PARTITION BY regexp_replace(trigram, ' [^ ]+$', ''))
                   AS cond_prob
        FROM cnt
    )
    SELECT doc_id, COUNT(*) AS n_trigrams,
           {sql_davg("cond_prob", "avg_cond_prob")}
    FROM tri JOIN p USING (trigram)
    GROUP BY doc_id
    """,
)
def doc_lm_likelihood(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    tri = shingle_rows(docs, "doc_id", "text", 3, distinct=False)
    cnt = tri.groupBy("shingle").agg(F.count(F.lit(1)).alias("cnt"))
    prefix = F.regexp_replace(F.col("shingle"), " [^ ]+$", "")
    w = Window.partitionBy("prefix")
    p = (
        cnt.withColumn("prefix", prefix)
        .withColumn("prefix_cnt", F.sum("cnt").over(w))
        .select(
            "shingle",
            (F.col("cnt").cast("double") / F.col("prefix_cnt")).alias("cond_prob"),
        )
    )
    return (
        # merge hint: p is trigram-vocabulary-sized (SF-scaling) and
        # estimate-blind behind the explode — never static-broadcast it
        tri.join(p.hint("merge"), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            davg(F.col("cond_prob"), "avg_cond_prob"),
        )
    )


# --- per-source token-distribution divergence: Pearson chi-square
# statistic of each source's token distribution against the corpus
# distribution — the corpus-QA signal for "this shard doesn't look like
# the rest" (crawl drift, encoding breakage, injected boilerplate).
# Log-free by construction (chi-square is rational arithmetic: expected
# count e = n_t * n_s / N, term = (o-e)²/e — fixed-order double ops,
# decimal-summed per source). Plan shape: ONE (source, tok) aggregate,
# lazily checkpointed — every marginal (token totals, source totals,
# grand total) derives from those compact rows instead of re-exploding
# the corpus (4 scans + 9 shuffles → 2 scans + 6, audited); one
# equi-join on tok (AQE-planned), source/grand totals broadcast.
@query(
    "source_token_divergence",
    oracle=f"""
    WITH tok AS (SELECT source, unnest({TOKS}) AS tok FROM documents),
    tf AS (SELECT source, tok, COUNT(*) AS o FROM tok GROUP BY source, tok),
    nt AS (SELECT tok, SUM(o) AS n_t FROM tf GROUP BY tok),
    ns AS (SELECT source, SUM(o) AS n_s FROM tf GROUP BY source),
    tot AS (SELECT SUM(o) AS n FROM tf),
    terms AS (
        SELECT tf.source, ns.n_s,
               CAST(tf.o AS DOUBLE) AS od,
               CAST(nt.n_t AS DOUBLE) * CAST(ns.n_s AS DOUBLE)
                   / CAST(tot.n AS DOUBLE) AS e
        FROM tf JOIN nt USING (tok) JOIN ns USING (source), tot
    )
    SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct_tokens,
           {sql_dsum("((od - e) * (od - e)) / e", "chi2")}
    FROM terms
    GROUP BY source, n_s
    ORDER BY source
    """,
)
def source_token_divergence(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokenize(F.col("text"))).alias("tok"))
    # the observed-count rows feed four consumers (join side + three
    # marginals); checkpoint the compact (source, tok, o) rows once
    tf = (
        tok.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    nt = tf.groupBy("tok").agg(F.sum("o").alias("n_t"))
    ns = tf.groupBy("source").agg(F.sum("o").alias("n_s"))
    tot = ns.agg(F.sum("n_s").alias("n"))
    od = F.col("o").cast("double")
    e = F.col("n_t").cast("double") * F.col("n_s").cast("double") / F.col("n").cast("double")
    terms = (
        # merge hint on nt (per-token corpus counts: vocabulary-sized,
        # SF-scaling, explode-blind estimate); ns/tot stay broadcast —
        # bounded (one row per source / one scalar)
        tf.join(nt.hint("merge"), "tok")
        .join(F.broadcast(ns), "source")
        .join(F.broadcast(tot))
        .select("source", "n_s", od.alias("od"), e.alias("e"))
    )
    chi_term = ((F.col("od") - F.col("e")) * (F.col("od") - F.col("e"))) / F.col("e")
    return (
        terms.groupBy("source", "n_s")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            dsum(chi_term, "chi2"),
        )
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            "n_distinct_tokens",
            "chi2",
        )
        .orderBy("source")
    )


# --- interpolated Kneser-Ney bigram scoring: the smoothing real LM
# quality filters use (KenLM's default) — MLE conditional probability
# (doc_lm_likelihood) assigns ZERO mass to unseen continuations and
# over-trusts frequent prefixes; KN discounts every observed bigram by
# D=0.75 and backs off to the CONTINUATION probability (how many
# distinct prefixes a word follows / total bigram types — "Francisco"
# is frequent but only ever follows "San", so its continuation mass is
# tiny). Per-doc average P_KN over the doc's bigram tokens, probability
# not log (ln's libm rounding is not bit-portable; each P_KN is a
# fixed-order double expression and the mean is a decimal sum).
# Plan shape mirrors source_token_divergence: ONE bigram-type aggregate
# lazily checkpointed, every marginal (prefix totals+fan-out,
# continuation fan-in, the one-row type total) derives from those
# compact rows instead of re-exploding the corpus; vocabulary-sized
# joins are merge-hinted (estimate-blind behind the checkpoint), the
# one-row total broadcasts; the doc-side explode joins the scored
# bigram table once and aggregates map-side per doc.
@query(
    "doc_kn_bigram_likelihood",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    bg AS (
        SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS bigram
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i)
    ),
    bgc AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram),
    sp AS (SELECT bigram, cnt,
                  regexp_replace(bigram, ' [^ ]+$', '') AS w1,
                  regexp_replace(bigram, '^[^ ]+ ', '') AS w2
           FROM bgc),
    pref AS (SELECT w1, SUM(cnt) AS ctot, COUNT(*) AS nfw FROM sp GROUP BY w1),
    contw AS (SELECT w2, COUNT(*) AS nbw FROM sp GROUP BY w2),
    ty AS (SELECT COUNT(*) AS btypes FROM bgc),
    pkn AS (
        SELECT s.bigram,
               greatest(CAST(s.cnt AS DOUBLE) - 0.75e0, 0e0) / p.ctot
               + (0.75e0 * p.nfw / p.ctot) * (CAST(c.nbw AS DOUBLE) / ty.btypes)
                   AS p_kn
        FROM sp s JOIN pref p ON s.w1 = p.w1
                  JOIN contw c ON s.w2 = c.w2
                  CROSS JOIN ty
    )
    SELECT doc_id, COUNT(*) AS n_bigrams, {sql_davg("p_kn", "avg_p_kn")}
    FROM bg JOIN pkn USING (bigram)
    GROUP BY doc_id
    """,
)
def doc_kn_bigram_likelihood(spark, sf_dir):
    """(doc_id, n_bigrams, avg_p_kn): interpolated Kneser-Ney with
    absolute discount D=0.75 — P_KN(w2|w1) = max(c(w1,w2)−D, 0)/c(w1·)
    + (D·N1+(w1·)/c(w1·)) · N1+(·w2)/|bigram types|. Every arithmetic
    step is written in the same order on both engines (greatest, two
    divisions, one product, one sum) so the doubles match bit-for-bit
    before the decimal-sum mean."""
    docs = table(spark, sf_dir, "documents")
    bi = shingle_rows(docs, "doc_id", "text", 2, distinct=False).withColumnRenamed(
        "shingle", "bigram"
    )
    bgc = (
        bi.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .localCheckpoint(eager=False)
    )
    pref = bgc.groupBy("w1").agg(
        F.sum("cnt").alias("ctot"), F.count(F.lit(1)).alias("nfw")
    )
    contw = bgc.groupBy("w2").agg(F.count(F.lit(1)).alias("nbw"))
    ty = bgc.agg(F.count(F.lit(1)).alias("btypes"))
    p_kn = (
        F.greatest(F.col("cnt").cast("double") - F.lit(0.75), F.lit(0.0))
        / F.col("ctot")
        + (F.lit(0.75) * F.col("nfw") / F.col("ctot"))
        * (F.col("nbw").cast("double") / F.col("btypes"))
    )
    scored = (
        bgc.join(pref.hint("merge"), "w1")
        .join(contw.hint("merge"), "w2")
        .crossJoin(F.broadcast(ty))
        .select("bigram", p_kn.alias("p_kn"))
    )
    return (
        bi.join(scored.hint("merge"), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            davg(F.col("p_kn"), "avg_p_kn"),
        )
    )


# --- SimHash pair generation: the signatures `dedup_simhash` emits were
# write-only (the same critique class as r9's unserved PQ codes) — this
# turns them into near-dup PAIRS. Banding is EXACT here, not
# probabilistic: 4 disjoint 16-bit bands and a hamming-≤3 criterion
# mean every qualifying pair shares at least one identical band
# (pigeonhole: 3 differing bits cannot touch all 4 bands), so band
# blocking loses nothing — subject only to the standard frequency cap
# (a 16-bit band shared by >cap docs is boilerplate; oracle-mirrored,
# the CLAUDE.md no-self-equi-join rule). Hamming itself is codegen'd
# integer work: each band parses to a bigint once per DOC, pairs XOR +
# bit_count four bigints — no per-pair string/HOF scans.
_SIMHASH_BAND_CAP = 50
_SIMHASH_HAM_MAX = 3

_SIMHASH_BAND_INT = (
    "CAST(list_sum(list_transform(generate_series(1, 16),"
    " i -> CASE WHEN substring(simhash_bits, j * 16 + i, 1) = '1'"
    " THEN 2.0 ** (16 - i) ELSE 0.0 END)) AS BIGINT)"
)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sig AS ({ORACLES["dedup_simhash"]}),
    bands AS (
        SELECT doc_id, j, {_SIMHASH_BAND_INT} AS bi
        FROM sig, UNNEST(generate_series(0, 3)) u(j)
    ),
    ints AS (
        SELECT doc_id,
               MAX(CASE WHEN j = 0 THEN bi END) AS i0,
               MAX(CASE WHEN j = 1 THEN bi END) AS i1,
               MAX(CASE WHEN j = 2 THEN bi END) AS i2,
               MAX(CASE WHEN j = 3 THEN bi END) AS i3
        FROM bands GROUP BY doc_id
    ),
    grp AS (
        SELECT j, bi, list(doc_id ORDER BY doc_id) AS ids
        FROM bands GROUP BY j, bi
        HAVING COUNT(*) BETWEEN 2 AND {_SIMHASH_BAND_CAP}
    ),
    cand AS (
        SELECT DISTINCT u1.a AS id_a, u2.b AS id_b
        FROM grp, UNNEST(ids) u1(a), UNNEST(ids) u2(b)
        WHERE u1.a < u2.b
    )
    SELECT c.id_a, c.id_b,
           CAST(bit_count(xor(x.i0, y.i0)) + bit_count(xor(x.i1, y.i1))
              + bit_count(xor(x.i2, y.i2)) + bit_count(xor(x.i3, y.i3)) AS INT)
               AS hamming
    FROM cand c JOIN ints x ON x.doc_id = c.id_a
                JOIN ints y ON y.doc_id = c.id_b
    WHERE bit_count(xor(x.i0, y.i0)) + bit_count(xor(x.i1, y.i1))
        + bit_count(xor(x.i2, y.i2)) + bit_count(xor(x.i3, y.i3))
        <= {_SIMHASH_HAM_MAX}
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """(id_a, id_b, hamming ≤ 3): near-dup pairs from banded SimHash
    signatures. ONE groupBy((band, value)) builds capped candidate
    groups carrying each member's four band bigints; in-group explode
    generates pairs; XOR + bit_count verifies hamming — all JVM
    integer codegen. Scale shape identical to the MinHash bucket pass:
    shuffles carry (band, 16-bit value, 4 bigints), never documents."""
    docs = table(spark, sf_dir, "documents")
    sig = simhash64(docs, "doc_id", tokenize(F.col("text"))).select(
        "doc_id",
        F.concat_ws(
            "", F.transform(F.col("simhash"), lambda b: b.cast("string"))
        ).alias("s"),
    )
    ints = sig.select(
        "doc_id",
        *[
            F.conv(F.substring("s", j * 16 + 1, 16), 2, 10)
            .cast("long")
            .alias(f"i{j}")
            for j in range(4)
        ],
    )
    bands = ints.select(
        "doc_id",
        "i0",
        "i1",
        "i2",
        "i3",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), F.col(f"i{j}").alias("bi"))
                    for j in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "i0", "i1", "i2", "i3", "band.j", "band.bi")
    grp = (
        bands.groupBy("j", "bi")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "i0", "i1", "i2", "i3"))
            ).alias("ms")
        )
        .where((F.size("ms") >= 2) & (F.size("ms") <= _SIMHASH_BAND_CAP))
    )
    pairs = (
        grp.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
    )
    ham = sum(
        F.bit_count(F.col(f"a.i{j}").bitwiseXOR(F.col(f"b.i{j}"))) for j in range(4)
    )
    return (
        pairs.select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= _SIMHASH_HAM_MAX)
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


@query(
    "dedup_simhash_recall",
    oracle=f"""
    WITH exact AS ({ORACLES["dedup_ngram_jaccard"]}),
    approx AS ({ORACLES["dedup_simhash_pairs"]}),
    capt AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS captured_pairs
        FROM exact e JOIN approx a ON e.id_a = a.id_a AND e.id_b = a.id_b
    ),
    ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_pairs FROM exact),
    ap AS (SELECT CAST(COUNT(*) AS BIGINT) AS simhash_pairs FROM approx)
    SELECT ex.exact_pairs, ap.simhash_pairs, capt.captured_pairs,
           CASE WHEN ex.exact_pairs = 0 THEN 0.0e0
                ELSE CAST(capt.captured_pairs AS DOUBLE)
                     / CAST(ex.exact_pairs AS DOUBLE)
           END AS pair_recall,
           CASE WHEN ap.simhash_pairs = 0 THEN 0.0e0
                ELSE CAST(capt.captured_pairs AS DOUBLE)
                     / CAST(ap.simhash_pairs AS DOUBLE)
           END AS pair_precision
    FROM ex, ap, capt
    """,
)
def dedup_simhash_recall(spark, sf_dir):
    """One-row audit closing the last unmeasured approximate dedup
    tier: how many exact Jaccard-τ pairs the hamming-≤3 SimHash pass
    captures (recall) AND what fraction of the emitted SimHash pairs
    are true Jaccard-τ pairs (precision — the false-positive dual; a
    banded pass can read high on one and useless on the other, so a
    go/no-go needs both).
    SimHash approximates COSINE over token multisets, not Jaccard over
    shingle sets, so low recall against this criterion is a real
    finding about criterion mismatch, not an implementation bug — the
    number tells a pipeline whether SimHash can substitute for the
    MinHash path (whose measured recall is 1.00)."""
    from udacity_dend_capstone_immigration_spark.workload.base import QUERIES

    exact = QUERIES["dedup_ngram_jaccard"](spark, sf_dir).select("id_a", "id_b")
    approx = QUERIES["dedup_simhash_pairs"](spark, sf_dir).select("id_a", "id_b")
    captured = exact.hint("merge").join(
        approx.hint("merge"), ["id_a", "id_b"]
    ).agg(F.count(F.lit(1)).cast("bigint").alias("captured_pairs"))
    ex = exact.agg(F.count(F.lit(1)).cast("bigint").alias("exact_pairs"))
    ap = approx.agg(F.count(F.lit(1)).cast("bigint").alias("simhash_pairs"))
    return (
        ex.crossJoin(ap)
        .crossJoin(captured)
        .select(
            "exact_pairs",
            "simhash_pairs",
            "captured_pairs",
            F.when(F.col("exact_pairs") == 0, F.lit(0.0))
            .otherwise(
                F.col("captured_pairs").cast("double")
                / F.col("exact_pairs").cast("double")
            )
            .alias("pair_recall"),
            F.when(F.col("simhash_pairs") == 0, F.lit(0.0))
            .otherwise(
                F.col("captured_pairs").cast("double")
                / F.col("simhash_pairs").cast("double")
            )
            .alias("pair_precision"),
        )
    )


# --- DSIR-shape importance selection (r11 verdict next #6; Xie et al.
# 2023's data-selection-with-importance-resampling, deterministic
# top-p form): score every document by the RATIO of its likelihood
# under a TARGET-domain Kneser-Ney LM to its likelihood under the
# CORPUS LM, then keep the highest-importance docs per source until
# 25% of the source's bigram mass is covered (the nucleus convention
# of corpus_nucleus_sample). The target slice here is the
# deterministic quarter doc_id % 4 = 0 — the engine-testable stand-in
# for "docs from the trusted domain" (the registry's incremental-tier
# convention); in production it is the curated high-quality set.
# Ratios, not log-ratios: ln's libm rounding is not bit-portable, and
# avg-probability ratios rank identically for selection purposes.
# Docs sharing no bigram with the target LM are unscorable and
# unselectable (inner-join semantics, identical in both engines).
# Plan: ONE (bigram, is_target) type aggregate lazily checkpointed
# feeds both LM heads (the z-checkpoint rule — a shared aggregate
# feeding two subtrees would execute twice); each head is the
# vocabulary-sized doc_kn_bigram_likelihood chain (merge-hinted —
# estimate-blind behind the explode), and the selection runs through
# the shape-adaptive grouped prefix sum.
def _kn_bigram_scores(bgc):
    """(bigram, p_kn) from a (bigram, cnt) bigram-type frame — the
    trained interpolated-KN score table (the doc_kn_bigram_likelihood
    arithmetic, factored so the DSIR heads train on different slices
    of the same type counts)."""
    bgc = (
        bgc.withColumn("w1", F.substring_index("bigram", " ", 1))
        .withColumn("w2", F.substring_index("bigram", " ", -1))
        .localCheckpoint(eager=False)
    )
    pref = bgc.groupBy("w1").agg(
        F.sum("cnt").alias("ctot"), F.count(F.lit(1)).alias("nfw")
    )
    contw = bgc.groupBy("w2").agg(F.count(F.lit(1)).alias("nbw"))
    ty = bgc.agg(F.count(F.lit(1)).alias("btypes"))
    p_kn = (
        F.greatest(F.col("cnt").cast("double") - F.lit(0.75), F.lit(0.0))
        / F.col("ctot")
        + (F.lit(0.75) * F.col("nfw") / F.col("ctot"))
        * (F.col("nbw").cast("double") / F.col("btypes"))
    )
    return (
        bgc.join(pref.hint("merge"), "w1")
        .join(contw.hint("merge"), "w2")
        .crossJoin(F.broadcast(ty))
        .select("bigram", p_kn.alias("p_kn"))
    )


def _kn_head_ctes(sfx: str, src: str) -> str:
    """Oracle CTE chain for one KN head trained on bigram rows ``src``,
    scoring ALL docs' bigrams (mirrors `_kn_bigram_scores`)."""
    return f"""
    bgc{sfx} AS (SELECT bigram, COUNT(*) AS cnt FROM {src} GROUP BY bigram),
    sp{sfx} AS (SELECT bigram, cnt,
                  regexp_replace(bigram, ' [^ ]+$', '') AS w1,
                  regexp_replace(bigram, '^[^ ]+ ', '') AS w2
           FROM bgc{sfx}),
    pref{sfx} AS (SELECT w1, SUM(cnt) AS ctot, COUNT(*) AS nfw
                  FROM sp{sfx} GROUP BY w1),
    contw{sfx} AS (SELECT w2, COUNT(*) AS nbw FROM sp{sfx} GROUP BY w2),
    ty{sfx} AS (SELECT COUNT(*) AS btypes FROM bgc{sfx}),
    pkn{sfx} AS (
        SELECT s.bigram,
               greatest(CAST(s.cnt AS DOUBLE) - 0.75e0, 0e0) / p.ctot
               + (0.75e0 * p.nfw / p.ctot) * (CAST(c.nbw AS DOUBLE) / ty.btypes)
                   AS p_kn
        FROM sp{sfx} s JOIN pref{sfx} p ON s.w1 = p.w1
                  JOIN contw{sfx} c ON s.w2 = c.w2
                  CROSS JOIN ty{sfx} ty
    ),
    score{sfx} AS (
        SELECT bg.doc_id, COUNT(*) AS n_bigrams, {sql_davg("p_kn", "avg_p")}
        FROM bg JOIN pkn{sfx} USING (bigram)
        GROUP BY bg.doc_id
    )"""


@query(
    "corpus_importance_sample",
    oracle=f"""
    WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    bg AS (
        SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS bigram
        FROM t, UNNEST(generate_series(1, greatest(len(toks) - 1, 0))) AS u(i)
    ),
    bgt AS (SELECT * FROM bg WHERE doc_id % 4 = 0),
    {_kn_head_ctes("C", "bg")},
    {_kn_head_ctes("T", "bgt")},
    w AS (
        SELECT c.doc_id, d.source, c.n_bigrams, t2.avg_p / c.avg_p AS importance
        FROM scoreC c JOIN scoreT t2 ON c.doc_id = t2.doc_id
             JOIN documents d ON d.doc_id = c.doc_id
    ),
    cum AS (
        SELECT doc_id, source, n_bigrams, importance,
               SUM(n_bigrams) OVER (PARTITION BY source
                                    ORDER BY importance DESC, doc_id ASC
                                    ROWS UNBOUNDED PRECEDING) AS cum_mass,
               SUM(n_bigrams) OVER (PARTITION BY source) AS total_mass
        FROM w
    )
    SELECT doc_id, source, importance,
           CAST(n_bigrams AS BIGINT) AS mass, CAST(cum_mass AS BIGINT) AS cum_mass
    FROM cum WHERE cum_mass - n_bigrams < 0.25 * total_mass
    """,
)
def corpus_importance_sample(spark, sf_dir):
    """(doc_id, source, importance, mass, cum_mass) for the selected
    top-25%-of-mass docs per source, importance-ordered. 0.25 is
    exactly representable in binary, so the DuckDB DECIMAL and Spark
    double threshold comparisons agree bit-for-bit."""
    from udacity_dend_capstone_immigration_spark.operators.cumsum import (
        grouped_running_sum,
    )

    docs = table(spark, sf_dir, "documents")
    bi = _doc_bigrams(docs)
    scored_c, scored_t = _dsir_train_heads(bi)
    return _dsir_select(docs, bi, scored_c, scored_t)


def _doc_bigrams(docs):
    return shingle_rows(docs, "doc_id", "text", 2, distinct=False).withColumnRenamed(
        "shingle", "bigram"
    )


def _dsir_train_heads(bi):
    """Train both KN heads from ONE (bigram, is_target) type aggregate
    (lazily checkpointed — the z-checkpoint rule; a shared aggregate
    feeding two subtrees would execute twice)."""
    is_t = (F.col("doc_id") % 4 == 0).alias("is_target")
    bgall = (
        bi.groupBy("bigram", is_t)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    scored_c = _kn_bigram_scores(bgall.groupBy("bigram").agg(F.sum("cnt").alias("cnt")))
    scored_t = _kn_bigram_scores(bgall.where(F.col("is_target")).select("bigram", "cnt"))
    return scored_c, scored_t


def _dsir_select(docs, bi, scored_c, scored_t):
    """Score + nucleus-select from TRAINED head score tables — shared
    by the inline query above and the persisted-head serve twin."""
    return _dsir_select_from_scores(_dsir_scores(docs, bi, scored_c, scored_t))


def _dsir_scores(docs, bi, scored_c, scored_t):
    """The SCORE half (r14 split, for the streaming pipeline twin):
    per-doc (doc_id, source, n_bigrams, importance) from the frozen
    heads — pure per-doc work, so a micro-batch scored at ingest is
    bit-identical to the same docs scored in one shot (what makes the
    score-on-ingest / select-at-snapshot decomposition provable).

    r16 (guide §2.4): ONE pass over ``bi`` instead of two. The heads
    are pre-merged per bigram (corpus LEFT target — target bigrams are
    a subset of corpus bigrams by construction, both in the inline
    trainer and the persisted store; pinned by tests/test_textops.py::
    test_dsir_target_bigrams_subset_of_corpus_bigrams), so the
    corpus-scaling exploded
    bigram relation is shuffled/joined ONCE and both averages come out
    of a single groupBy. davg = sum(col)/count(col) skips nulls, so
    the left-joined null p_t rows reproduce the old inner-join-with-t
    aggregate exactly; the ``_tm`` match indicator reproduces the old
    inner join's doc membership (≥1 target-matched bigram) even for
    hypothetical null p_kn rows. A/B at sf0.1: full-corpus select
    0.176 → 0.113s; in the served pipeline the doubled survivor
    subtree (text-carrying SMJ + explode) collapses to one execution.
    Heads stay merge-hinted: the inline trainer's heads sit behind a
    lazy checkpoint of an explode subtree (the estimate-blind class —
    a small estimate would static-broadcast an SF-scaling relation)."""
    heads = scored_c.withColumnRenamed("p_kn", "p_c").join(
        scored_t.select(
            "bigram", F.col("p_kn").alias("p_t"), F.lit(1).alias("_tm")
        ),
        "bigram",
        "left",
    )
    w = (
        bi.join(heads.hint("merge"), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            davg(F.col("p_c"), "avg_c"),
            davg(F.col("p_t"), "avg_t"),
            F.count("_tm").alias("_ntm"),
        )
    )
    return (
        w.where(F.col("_ntm") > 0)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            (F.col("avg_t") / F.col("avg_c")).alias("importance"),
        )
    )


def _dsir_select_from_scores(w, shape: str = "auto"):
    """The SELECT half: head-25% token mass per source over an
    already-scored frame (global decision — it needs the WHOLE
    snapshot's mass distribution, which is why the streamed twin
    accumulates scores and selects once at snapshot time).

    ``shape`` forwards to :func:`grouped_running_sum` — callers whose
    ``w`` is RDD-backed (checkpointed) must pick it themselves, because
    Catalyst reports Long.MaxValue for LogicalRDD and auto would always
    run the range-exchange machinery even on a KB-sized frame
    (``workload/pipeline.py`` gates on the batch's scan-derived
    estimate instead)."""
    from udacity_dend_capstone_immigration_spark.operators.cumsum import (
        grouped_running_sum,
    )

    cum = grouped_running_sum(
        w,
        "source",
        [F.desc("importance"), F.asc("doc_id")],
        "n_bigrams",
        out_col="cum_mass",
        total_col="total_mass",
        shape=shape,
    )
    return cum.where(
        (F.col("cum_mass") - F.col("n_bigrams")).cast("double")
        < F.lit(0.25) * F.col("total_mass").cast("double")
    ).select(
        "doc_id",
        "source",
        "importance",
        F.col("n_bigrams").cast("bigint").alias("mass"),
        F.col("cum_mass").cast("bigint").alias("cum_mass"),
    )


# --- persisted DSIR heads (r12 verdict item 4): the trained score
# tables (bigram, p_kn) are the serve artifact — vocabulary-sized, so
# the store is tiny next to the corpus, and a re-score of new/changed
# docs pays ZERO head retraining (18.3s of the x100
# corpus_importance_sample wall was the two KN trains). Same
# train-once/serve-many lifecycle as the ANN and text-dedup stores.
def build_dsir_heads(spark, docs, out_dir: str) -> str:
    """Train both heads and persist them, md5-bucketed like the
    text-dedup store so the scan splits at any corpus scale."""
    from udacity_dend_capstone_immigration_spark.sources.writers import write_table
    from udacity_dend_capstone_immigration_spark.workload.dedupstore import _bucket

    bi = _doc_bigrams(docs)
    scored_c, scored_t = _dsir_train_heads(bi)
    for name, head in (("pkn_corpus", scored_c), ("pkn_target", scored_t)):
        write_table(
            head.withColumn("bg_pt", _bucket(F.col("bigram"))),
            f"{out_dir}/{name}",
            partition_by=["bg_pt"],
        )
    return out_dir


_SERVED_DSIR: dict[tuple, str] = {}


def served_dsir_dir(spark, sf_dir: str) -> str:
    import os

    from udacity_dend_capstone_immigration_spark.workload.vectors import (
        _corpus_fingerprint,
    )

    key = (sf_dir, _corpus_fingerprint(sf_dir, "documents"))
    d = _SERVED_DSIR.get(key)
    if d is None or not os.path.isdir(f"{d}/pkn_corpus"):
        import tempfile

        d = build_dsir_heads(
            spark,
            table(spark, sf_dir, "documents"),
            tempfile.mkdtemp(prefix="dsir_heads_"),
        )
        _SERVED_DSIR[key] = d
    return d


@query("corpus_importance_served", oracle=ORACLES["corpus_importance_sample"])
def corpus_importance_served(spark, sf_dir):
    """DSIR selection served FROM the persisted heads: the score
    tables are bare parquet scans (training-free — no bigram type
    aggregate, no KN chain anywhere in the plan), the corpus pays one
    bigram explode for scoring, and the result is bit-identical to the
    inline trainer (same oracle): p_kn is a per-row double expression
    that round-trips parquet exactly. The head joins keep their merge
    hints — the BIGRAM side is explode-inflated (estimate-blind class)
    even though the head side now has accurate file stats."""
    d = served_dsir_dir(spark, sf_dir)
    scored_c = read_parquet_memo(spark, f"{d}/pkn_corpus").select("bigram", "p_kn")
    scored_t = read_parquet_memo(spark, f"{d}/pkn_target").select("bigram", "p_kn")
    docs = table(spark, sf_dir, "documents")
    return _dsir_select(docs, _doc_bigrams(docs), scored_c, scored_t)


# --- triangle cohesion over the near-dup pair graph: distributed
# triangle counting (the cohesion signal cluster-quality audits use —
# a triangle-rich component is a real template family, a triangle-free
# chain is transitive-closure noise). Composes the VERIFIED
# `dedup_ngram_jaccard` edges (capped grouped generation, canonical
# id_a < id_b) exactly like the recall audits compose their base
# queries. Algorithm (r13, closing the r12 hub-skew flag): edges
# oriented by DEGREE, wedge join on the lowest-degree vertex,
# closing-edge join — `operators/graph.py:triangle_counts`, which
# bounds every wedge task at O(√|E|) fan-out regardless of hub docs
# (one boilerplate doc in 10% of edges is the measured blowup case the
# id orientation had: tools/extrapolate_triangles.py). The tiny edge
# list is EAGERLY checkpointed before the multi-leg self-join —
# un-materialized, the full shingle pipeline would execute four times
# (the CLAUDE.md shared-subtree rule). Values unchanged: orientation
# only reorders the computation, so the oracle is untouched.
@query(
    "dedup_triangle_cohesion",
    oracle=f"""
    WITH pairs AS ({ORACLES["dedup_ngram_jaccard"]}),
    tri AS (
        SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
        FROM pairs e1
        JOIN pairs e2 ON e1.id_b = e2.id_a
        JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b
    ),
    roles AS (
        SELECT a AS doc_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT doc_id, COUNT(*) AS tri_cnt
    FROM roles GROUP BY doc_id
    """,
)
def dedup_triangle_cohesion(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.operators.graph import triangle_counts
    from udacity_dend_capstone_immigration_spark.workload.base import QUERIES

    edges = (
        QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    return triangle_counts(edges).select(
        F.col("node").alias("doc_id"), "tri_cnt"
    )


# --- per-source duplicate-rate report (corpus QA): which ingestion
# sources ship duplicated content, by exact fingerprint — the number
# that decides where dedup budget goes and which feeds to renegotiate.
# ONE md5-fingerprint aggregate (map-combinable; the fingerprint is
# the only thing shuffled, never text) feeding a source rollup; a doc
# is a duplicate if ANY other doc (any source) shares its fingerprint
# and it is not the min-id representative — the keep-best convention
# of the dedup ladder, so this report states exactly what
# exact-dedup WOULD delete, per source.
@query(
    "source_dup_rate_report",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, source, md5({NORM}) AS f FROM documents
    ),
    marked AS (
        SELECT source,
               CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY f)
                    THEN 1 ELSE 0 END AS is_dup
        FROM fp
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS dup_docs,
           CAST(SUM(is_dup) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM marked GROUP BY source
    """,
)
def source_dup_rate_report(spark, sf_dir):
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", "source", doc_fingerprint(F.col("text")).alias("f"))
    w = Window.partitionBy("f")
    marked = fp.select(
        "source",
        (F.col("doc_id") > F.min("doc_id").over(w)).cast("int").alias("is_dup"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_dup").cast("bigint").alias("dup_docs"),
        (F.sum("is_dup").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "dup_rate"
        ),
    )


# --- incremental cluster maintenance: a new batch arrives against an
# already-clustered corpus; merge it WITHOUT re-running propagation
# over the old graph. The scalable algorithm is condensation: old
# clusters contract to their representative (min doc_id — already the
# cluster label), new-batch edges map through that contraction, and
# min-label propagation runs on the META-graph only (touched clusters
# + new docs — tiny next to the corpus). Final labels re-expand
# through the old assignment. Correctness: contraction preserves the
# min over every merged component, so the result is BIT-IDENTICAL to
# a full rebuild — which is exactly what the oracle computes (the
# dedup_clusters recursive CTE over ALL pairs): append ≡ rebuild, the
# registry's standing train-once/serve-many proof shape.
@query(
    "dedup_clusters_incremental",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({{MINHASH}}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lab FROM documents
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters_incremental(spark, sf_dir):
    """Seeded/condensed connected components: doc_id % _INC_MOD == 0
    plays the incoming batch (the dedup_incremental_status convention).
    Old clusters come from propagation over corpus-only pairs; the
    meta-graph carries one node per touched old cluster plus the new
    docs, so the second propagation is O(batch + touched clusters)
    regardless of corpus size. The full pair set is computed once and
    lazily checkpointed — its two class-splits (old/old, new-touching)
    partition it exactly, so incremental ∪ rebuild see identical
    evidence."""
    docs = table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_dedup_pairs(
            docs,
            "doc_id",
            "text",
            shingle_n=3,
            num_hashes=_MH_N,
            bands=_MH_BANDS,
            threshold=0.5,
            max_bucket_df=_MH_BUCKET_CAP,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        incremental_components,
    )

    new_a = F.col("id_a") % _INC_MOD == 0
    new_b = F.col("id_b") % _INC_MOD == 0
    old_pairs = pairs.where(~new_a & ~new_b)
    new_edges = pairs.where(new_a | new_b)
    corpus_nodes = docs.where(F.col("doc_id") % _INC_MOD != 0).select("doc_id")
    old = connected_components(old_pairs, corpus_nodes, id_col="doc_id")
    old = old.localCheckpoint(eager=False)
    new_nodes = docs.where(F.col("doc_id") % _INC_MOD == 0).select("doc_id")
    # The condensation itself (contract → meta-propagate → re-expand)
    # lives in operators/dedup.py:incremental_components; the
    # old-cluster MERGE case (absent from this corpus at sf0.01) is
    # unit-pinned in tests/test_dedup_incremental.py.
    return incremental_components(old, new_edges, new_nodes, id_col="doc_id")


ORACLES["dedup_clusters_incremental"] = ORACLES["dedup_clusters_incremental"].replace(
    "{MINHASH}", ORACLES["dedup_minhash_lsh"]
)


# --- cluster-store delete: the edge-retraction case the incremental
# docstring names as the no-go for label propagation, closed the way
# it prescribes — a LOCALIZED rebuild. Deleting docs only affects
# their own components (edge-closure), so the live members of touched
# clusters re-cluster on the survivor-restricted subgraph (O(affected),
# not O(corpus)) while every other assignment passes through; a
# deleted cut vertex SPLITS its cluster, a deleted representative
# relabels survivors to the new min. Oracle: full CC rebuild over the
# pair set restricted to surviving endpoints — delete ≡ rebuild.
@query(
    "dedup_clusters_delete",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({{MINHASH}}),
    live_pairs AS (
        SELECT id_a, id_b FROM pairs WHERE id_a % 9 != 4 AND id_b % 9 != 4
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM live_pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM live_pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lab FROM documents WHERE doc_id % 9 != 4
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def dedup_clusters_delete(spark, sf_dir):
    """doc_id % 9 == 4 plays the right-to-be-forgotten batch. The
    stored clustering and its pair evidence build once (lazy-
    checkpointed pair set — assignment and delete path see identical
    evidence); `delete_from_components` then removes the batch with
    split handling. Constructed split/relabel cases are unit-pinned in
    tests/test_dedup_incremental.py (the sf0.01 graph may not contain
    a cut vertex)."""
    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        delete_from_components,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_dedup_pairs(
            docs,
            "doc_id",
            "text",
            shingle_n=3,
            num_hashes=_MH_N,
            bands=_MH_BANDS,
            threshold=0.5,
            max_bucket_df=_MH_BUCKET_CAP,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    assign = connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    deleted = docs.where(F.col("doc_id") % 9 == 4).select("doc_id")
    return delete_from_components(assign, pairs, deleted, id_col="doc_id")


ORACLES["dedup_clusters_delete"] = ORACLES["dedup_clusters_delete"].replace(
    "{MINHASH}", ORACLES["dedup_minhash_lsh"]
)


# --- the cluster tier persisted (assignments + their pair evidence),
# completing the store trilogy: text-dedup index, ANN index, and now
# the clustering itself. The edges are PART of the store because they
# are what make document deletes exact (delete_from_components needs
# the survivor subgraph) — an assignment-only store could never split
# a cluster. Both relations partition by an md5 bucket of cluster_id,
# so maintenance on a touched cluster prunes to its partitions.
N_CLUSTER_BUCKETS = 32


def _cluster_bucket(col):
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("bigint")
        % N_CLUSTER_BUCKETS
    ).cast("int")


def build_cluster_store(spark, assign, edges, out_dir: str) -> str:
    """Persist a clustering: assignments (doc_id, cluster_id) and the
    component-tagged edge evidence, both partitioned by the md5 bucket
    of cluster_id. Edges carry their component's id (closed by
    construction: both endpoints share it), so a delete's localized
    rebuild reads ONLY the touched clusters' partitions."""
    from udacity_dend_capstone_immigration_spark.sources.writers import write_table

    a = assign.select("doc_id", "cluster_id").withColumn(
        "c_pt", _cluster_bucket(F.col("cluster_id"))
    )
    write_table(a, f"{out_dir}/assignments", partition_by=["c_pt"])
    tagged = (
        edges.select("id_a", "id_b")
        .join(
            assign.select(
                F.col("doc_id").alias("id_a"), F.col("cluster_id")
            ).hint("merge"),
            "id_a",
        )
        .withColumn("c_pt", _cluster_bucket(F.col("cluster_id")))
    )
    write_table(tagged, f"{out_dir}/edges", partition_by=["c_pt"])
    return out_dir


_H8C = "CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)"
_CPT = (
    "CAST(CAST(('0x' || substring(md5(CAST(cluster_id AS VARCHAR)), 1, 4)) AS BIGINT)"
    f" % {N_CLUSTER_BUCKETS} AS INT)"
)


@query(
    "cluster_store_build_roundtrip",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({{MINHASH}}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lab FROM documents
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id),
    aa AS (
        SELECT {_CPT} AS part, CAST(COUNT(*) AS BIGINT) AS a_rows,
               CAST(SUM(doc_id) AS BIGINT) AS a_docsum,
               CAST(SUM({_H8C}) AS BIGINT) AS a_csum
        FROM comp GROUP BY 1
    ),
    te AS (
        SELECT p.id_a, p.id_b, c.cluster_id FROM pairs p
        JOIN comp c ON p.id_a = c.doc_id
    ),
    ea AS (
        SELECT {_CPT} AS part, CAST(COUNT(*) AS BIGINT) AS e_rows,
               CAST(SUM(id_a + id_b) AS BIGINT) AS e_absum
        FROM te GROUP BY 1
    )
    SELECT part, a_rows, a_docsum, a_csum,
           COALESCE(e_rows, 0) AS e_rows, COALESCE(e_absum, 0) AS e_absum
    FROM aa LEFT JOIN ea USING (part)
    ORDER BY part
    """,
)
def cluster_store_build_roundtrip(spark, sf_dir):
    """Persist the corpus clustering (assignments + component-tagged
    edges) into a fresh store and aggregate every read-back relation
    per PERSISTED bucket — the standing layout proof: a row in the
    wrong cluster partition fails the hash compare, not just a wrong
    value. The oracle recomputes components, tags, buckets and
    checksums from the pair CTE."""
    import tempfile

    docs = table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_dedup_pairs(
            docs,
            "doc_id",
            "text",
            shingle_n=3,
            num_hashes=_MH_N,
            bands=_MH_BANDS,
            threshold=0.5,
            max_bucket_df=_MH_BUCKET_CAP,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    assign = connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    out = build_cluster_store(
        spark, assign, pairs, tempfile.mkdtemp(prefix="cluster_store_")
    )
    a = read_parquet_memo(spark, f"{out}/assignments")
    aa = a.groupBy(F.col("c_pt").cast("int").alias("part")).agg(
        F.count(F.lit(1)).cast("bigint").alias("a_rows"),
        F.sum("doc_id").cast("bigint").alias("a_docsum"),
        F.sum(
            F.conv(
                F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("a_csum"),
    )
    e = read_parquet_memo(spark, f"{out}/edges")
    ea = e.groupBy(F.col("c_pt").cast("int").alias("part")).agg(
        F.count(F.lit(1)).cast("bigint").alias("e_rows"),
        F.sum(F.col("id_a") + F.col("id_b")).cast("bigint").alias("e_absum"),
    )
    return (
        aa.join(ea, "part", "left")
        .fillna({"e_rows": 0, "e_absum": 0})
        .orderBy("part")
    )


@query(
    "cluster_store_delete_served",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({{MINHASH}}),
    live_pairs AS (
        SELECT id_a, id_b FROM pairs WHERE id_a % 9 != 4 AND id_b % 9 != 4
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM live_pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM live_pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lab FROM documents WHERE doc_id % 9 != 4
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def cluster_store_delete_served(spark, sf_dir):
    """The serving win the persisted edges buy: a right-to-be-forgotten
    delete WITHOUT re-running any pair generation. Build the store
    once, then the delete path operates purely on read-back parquet —
    assignments locate the touched clusters, their stored edges feed
    the localized rebuild (splits handled), untouched clusters pass
    through. Same survivor-restricted full-rebuild oracle as the
    in-engine twin (`dedup_clusters_delete`), so the hash proves the
    store roundtrip loses nothing the delete needs."""
    import tempfile

    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        delete_from_components,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_dedup_pairs(
            docs,
            "doc_id",
            "text",
            shingle_n=3,
            num_hashes=_MH_N,
            bands=_MH_BANDS,
            threshold=0.5,
            max_bucket_df=_MH_BUCKET_CAP,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    assign = connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    out = build_cluster_store(
        spark, assign, pairs, tempfile.mkdtemp(prefix="cluster_store_del_")
    )
    stored_assign = read_parquet_memo(spark, f"{out}/assignments").select(
        "doc_id", "cluster_id"
    )
    stored_edges = read_parquet_memo(spark, f"{out}/edges").select("id_a", "id_b")
    deleted = docs.where(F.col("doc_id") % 9 == 4).select("doc_id")
    return delete_from_components(
        stored_assign, stored_edges, deleted, id_col="doc_id"
    )


ORACLES["cluster_store_build_roundtrip"] = ORACLES[
    "cluster_store_build_roundtrip"
].replace("{MINHASH}", ORACLES["dedup_minhash_lsh"])
ORACLES["cluster_store_delete_served"] = ORACLES[
    "cluster_store_delete_served"
].replace("{MINHASH}", ORACLES["dedup_minhash_lsh"])


# --- store-served incremental append: the third lifecycle leg. The
# old assignment comes from READ-BACK parquet — the O(edges)-per-round
# propagation over the old graph (the 79.8s-vs-24.0s gap at the 100×
# corpus) never runs; only the batch's edges and the touched clusters
# enter the meta-propagation. Oracle = full CC rebuild over ALL docs
# (the dedup_clusters oracle) — append-from-store ≡ rebuild.
@query(
    "cluster_store_append_served",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({{MINHASH}}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    reach AS (
        SELECT doc_id AS id, doc_id AS lab FROM documents
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY id
    """,
)
def cluster_store_append_served(spark, sf_dir):
    """Build the cluster store on the corpus (doc_id % 7 != 0, over
    corpus-only pairs — the state a production pipeline would already
    have persisted), then merge the incoming batch (doc_id % 7 == 0)
    via `incremental_components` reading the OLD assignment from
    parquet. The pair set is computed once and class-split exactly as
    in the in-engine twin (LSH cap statistics are global, so batch
    evidence must come from the same full-corpus pass); what the store
    saves is the old-graph propagation, which dominates the rebuild at
    scale."""
    import tempfile

    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        incremental_components,
    )

    docs = table(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_dedup_pairs(
            docs,
            "doc_id",
            "text",
            shingle_n=3,
            num_hashes=_MH_N,
            bands=_MH_BANDS,
            threshold=0.5,
            max_bucket_df=_MH_BUCKET_CAP,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    new_a = F.col("id_a") % _INC_MOD == 0
    new_b = F.col("id_b") % _INC_MOD == 0
    old_pairs = pairs.where(~new_a & ~new_b)
    corpus_nodes = docs.where(F.col("doc_id") % _INC_MOD != 0).select("doc_id")
    old = connected_components(old_pairs, corpus_nodes, id_col="doc_id")
    out = build_cluster_store(
        spark, old, old_pairs, tempfile.mkdtemp(prefix="cluster_store_app_")
    )
    stored_assign = read_parquet_memo(spark, f"{out}/assignments").select(
        "doc_id", "cluster_id"
    )
    new_edges = pairs.where(new_a | new_b)
    new_nodes = docs.where(F.col("doc_id") % _INC_MOD == 0).select("doc_id")
    return incremental_components(
        stored_assign, new_edges, new_nodes, id_col="doc_id"
    )


ORACLES["cluster_store_append_served"] = ORACLES[
    "cluster_store_append_served"
].replace("{MINHASH}", ORACLES["dedup_minhash_lsh"])


# --- document CHUNKING (r15): the retrieval-prep operator — RAG
# corpora chunk into overlapping token windows before embedding and
# indexing; every serious training/retrieval pipeline has this step
# between "documents" and "vectors". PER-CHUNK rows pin every window
# boundary and every chunk's exact content (the md5 travels, never the
# body): a off-by-one in the stride, a dropped tail window, or a
# redundant trailing chunk all fail the hash. Map-only, zero shuffle —
# the explode fan-out is n_tokens/stride, bounded per row; the
# ceil-div is exact-integer bucketing in BOTH engines (num - num % span
# over BIGINTs; DuckDB's / on the guaranteed-multiple numerator is
# exact).
_CHUNK_SIZE, _CHUNK_STRIDE = 64, 48


@query(
    "doc_chunking",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {TOKS} AS toks FROM documents
    ),
    tt AS (
        SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0
    ),
    nc AS (
        SELECT doc_id, toks, nt,
               CASE WHEN nt <= {_CHUNK_SIZE} THEN 1
                    ELSE CAST(((nt - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1})
                               - ((nt - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1})
                                  % {_CHUNK_STRIDE}))
                              / {_CHUNK_STRIDE} AS INT) + 1 END AS n_chunks
        FROM tt
    ),
    ch AS (
        SELECT doc_id,
               CAST(k AS INT) AS chunk_idx,
               CAST(k * {_CHUNK_STRIDE} AS INT) AS start_tok,
               list_slice(toks, k * {_CHUNK_STRIDE} + 1,
                          k * {_CHUNK_STRIDE} + {_CHUNK_SIZE}) AS win
        FROM nc, unnest(generate_series(0, n_chunks - 1)) u(k)
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(len(win) AS INT) AS n_tokens,
           md5(array_to_string(win, ' ')) AS chunk_hash
    FROM ch
    """,
)
def doc_chunking(spark, sf_dir):
    """Every chunk of every document at size {_CHUNK_SIZE}/stride
    {_CHUNK_STRIDE} — chunk k covers tokens [k*stride, k*stride+size),
    final window may run short, no fully-redundant tail. The build is
    `sequence`/`slice`/`concat_ws` collection expressions (whole-stage
    codegen, the shingle_rows shape), one bounded explode, ZERO
    shuffle: at 100 TB this is a pure map pass over the corpus scan."""
    from udacity_dend_capstone_immigration_spark.operators.curation import (
        chunk_documents,
    )

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )


# --- chunk-level BOILERPLATE detection (staged r15, registered r16;
# stage-gate: tests/test_textops.py::test_chunk_boilerplate_stage_gate):
# the window-granular twin of exact doc dedup:
# a chunk hash recurring across >= 2 distinct documents is shared
# boilerplate (headers, license blocks, templated sections) that
# chunk-granular RAG indexes and dedup passes must treat specially.
# ONE fingerprint-sized shuffle: the groupBy carries 32-char md5 rows
# (partial-aggregated map-side), never chunk bodies — the chunk build
# itself is the zero-shuffle doc_chunking pass.
_CHUNK_BOILERPLATE_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {{TOKS}} AS toks FROM documents
    ),
    tt AS (
        SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0
    ),
    nc AS (
        SELECT doc_id, toks, nt,
               CASE WHEN nt <= {_CHUNK_SIZE} THEN 1
                    ELSE CAST(((nt - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1})
                               - ((nt - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1})
                                  % {_CHUNK_STRIDE}))
                              / {_CHUNK_STRIDE} AS INT) + 1 END AS n_chunks
        FROM tt
    ),
    ch AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(toks, k * {_CHUNK_STRIDE} + 1,
                              k * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')) AS chunk_hash
        FROM nc, unnest(generate_series(0, n_chunks - 1)) u(k)
    )
    SELECT chunk_hash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(doc_id) AS BIGINT) AS exemplar_doc
    FROM ch
    GROUP BY chunk_hash HAVING COUNT(DISTINCT doc_id) >= 2
""".replace("{TOKS}", TOKS)


@query("chunk_boilerplate_windows", oracle=_CHUNK_BOILERPLATE_ORACLE)
def chunk_boilerplate_windows(spark, sf_dir):
    """Chunk hashes shared by >= 2 distinct documents, with doc
    frequency, occurrence count, and a deterministic exemplar — the
    boilerplate report a chunk-granular index consults before
    embedding (embed shared windows once, not per document)."""
    from udacity_dend_capstone_immigration_spark.operators.curation import (
        chunk_documents,
    )

    docs = table(spark, sf_dir, "documents")
    ch = chunk_documents(
        docs, "doc_id", "text", size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.count_distinct(F.col("doc_id")).cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.min("doc_id").cast("bigint").alias("exemplar_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


# --- per-document UNIQUE-CHUNK ratio (staged r15, registered r16;
# stage-gate in tests/test_textops.py) — the boilerplate-share quality
# signal chunk-granular curation filters on (a doc whose windows are
# mostly corpus-shared boilerplate carries little novel training
# mass). Composes the two chunk passes: hash df (fingerprint-sized
# aggregate) joined back onto the per-doc chunk rolls — both shuffles
# carry md5s/ids, never text.
_CHUNK_UNIQUE_RATIO_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {{TOKS}} AS toks FROM documents
    ),
    tt AS (
        SELECT doc_id, toks, len(toks) AS nt FROM t WHERE len(toks) > 0
    ),
    nc AS (
        SELECT doc_id, toks, nt,
               CASE WHEN nt <= {_CHUNK_SIZE} THEN 1
                    ELSE CAST(((nt - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1})
                               - ((nt - {_CHUNK_SIZE} + {_CHUNK_STRIDE - 1})
                                  % {_CHUNK_STRIDE}))
                              / {_CHUNK_STRIDE} AS INT) + 1 END AS n_chunks
        FROM tt
    ),
    ch AS (
        SELECT doc_id,
               md5(array_to_string(
                   list_slice(toks, k * {_CHUNK_STRIDE} + 1,
                              k * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')) AS chunk_hash
        FROM nc, unnest(generate_series(0, n_chunks - 1)) u(k)
    ),
    df AS (
        SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs FROM ch
        GROUP BY chunk_hash
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(*) FILTER (WHERE d.n_docs = 1) AS BIGINT) AS n_unique,
           CAST(COUNT(*) FILTER (WHERE d.n_docs = 1) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS unique_ratio
    FROM ch c JOIN df d ON c.chunk_hash = d.chunk_hash
    GROUP BY c.doc_id
""".replace("{TOKS}", TOKS)


@query("doc_unique_chunk_ratio", oracle=_CHUNK_UNIQUE_RATIO_ORACLE)
def doc_unique_chunk_ratio(spark, sf_dir):
    """Per doc: chunk count, count of windows whose hash occurs in NO
    other document, and their ratio — the per-doc novelty score the
    boilerplate report (`chunk_boilerplate_windows`) induces. The
    ratio is one IEEE division of two exact bigints (portable)."""
    from udacity_dend_capstone_immigration_spark.operators.curation import (
        chunk_documents,
    )

    docs = table(spark, sf_dir, "documents")
    # the chunk roll feeds TWO subtrees (hash-df aggregate + join-back);
    # ReuseExchange does not fire across them, so without a barrier the
    # tokenize+explode chunk build executes twice. Its rows are SMALL
    # (doc_id + md5, ~1.4×|docs|) — the eligible case for a lazy
    # localCheckpoint per the shared-subtree rule (this is NOT the
    # banned uncapped grouped-list materialization). A/B at the 100×
    # corpus (r16): re-scan min 10.6s vs checkpointed min 1.8s.
    ch = chunk_documents(
        docs, "doc_id", "text", size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    ).select("doc_id", "chunk_hash").localCheckpoint(eager=False)
    # merge hint: the hash-df aggregate is downstream of the chunk
    # explode, so Catalyst's estimate is blind to its true size — it
    # scales with DISTINCT WINDOWS (SF-scaling); a static broadcast
    # here would ship the whole chunk vocabulary at a 100× corpus
    # (CLAUDE.md rule; the gate in test_plans.py flags it otherwise)
    df_tbl = ch.groupBy("chunk_hash").agg(
        F.count_distinct(F.col("doc_id")).alias("n_docs")
    ).hint("merge")
    return (
        ch.join(df_tbl, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.count(F.when(F.col("n_docs") == 1, 1)).cast("bigint").alias("n_unique"),
        )
        .withColumn(
            "unique_ratio",
            F.col("n_unique").cast("double") / F.col("n_chunks").cast("double"),
        )
    )
