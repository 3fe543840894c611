"""Char-trigram language identification — Cavnar–Trenkle rank
profiles (VERDICT r15 task 7).

Script-ID (``text_unicode_script_id``) separates alphabets; this
operator separates languages WITHIN a script, the n-gram method of
Cavnar & Trenkle 1994 ("N-Gram-Based Text Categorization"), chosen
over a trained softmax precisely because it is ALL-INTEGER and
therefore bit-deterministic and fully re-derivable by the DuckDB
oracle — the same reason the quality model uses the fast sigmoid:

1. **Trigram domain** (WIDENED r17, VERDICT r16 task 3): lowercase
   BMP letters — every run of non-letters folds to one space, the
   text is space-padded, and all char trigrams are taken
   (word-boundary trigrams like ``" th"``/``"he "`` included — they
   carry most of the signal). Accented letters now CONTRIBUTE
   ("été" is three French trigrams, not silence) and non-Latin
   scripts are in domain (the fixture adds Cyrillic ru/uk — a
   same-script pair — and Greek el). DOCUMENTED BOUNDARIES:
   (a) supplementary-plane letters fold to spaces — the fold class
   is ``[\\P{L}\\x{10000}-\\x{10FFFF}]+`` because Spark substring
   counts UTF-16 units while DuckDB counts code points, so astral
   trigrams would diverge cross-engine (measured; BMP is identical);
   (b) fixtures must avoid the pinned casefold-divergence set
   (refdata/casefold_divergence.parquet) — the generator asserts
   this — since ``lower()`` differs across engines exactly there.
2. **Profiles**: per language, trigrams ranked by (count DESC,
   trigram ASC) — a TOTAL order, so ``row_number`` is deterministic
   in both engines — truncated at PROFILE_K. Training docs are the
   split ``(doc_id // 6) % 4 != 3`` (held-out quarter never builds
   profiles; the accuracy-floor pytest scores it).
3. **Scoring**: each doc's own top-PROFILE_K trigram ranking joins
   every language profile; distance = sum over the doc's trigrams of
   ``|doc_rank - profile_rank|``, with PROFILE_K charged for a
   trigram absent from the profile (the classic out-of-place
   measure). Prediction = argmin distance, ties broken by language
   code ascending (total order again).

Everything is counts, ranks, and integer sums — no floats anywhere,
so Spark and DuckDB agree exactly and the driver gate hash-matches
the full (doc, true, predicted, distance) output.

Scale: trigram explode is a flat projection; one exchange for the
per-(doc, trigram) count, one for the per-language profile (which is
metadata-sized — L×PROFILE_K rows — and broadcast back), one for the
per-doc distance aggregation. Profiles for a 100 TB corpus would be
trained once on a sample and persisted as a sidecar artifact; here
train+score run in one plan so the oracle can replay both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PROFILE_K = 300
TRAIN_SPLIT_SQL = "(doc_id // 6) % 4 <> 3"  # DuckDB: // is int div
# Lowercase-letter trigram domain: non-letters AND astral-plane
# letters fold to one space (see module docstring boundary (a)).
FOLD_REGEX = r"[\P{L}\x{10000}-\x{10FFFF}]+"
FOLD_REGEX_SQL = r"[\P{L}\x{10000}-\x{10FFFF}]+"  # RE2 spells it the same


def _train_filter(df: DataFrame) -> DataFrame:
    return df.filter((F.floor(F.col("doc_id") / 6) % 4) != 3)


def doc_trigrams(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang, g): every char trigram of the folded, padded
    text — flat projection + explode, no shuffle.

    The folded text is lambda-BOUND (``transform(array(folded), t ->
    ...)``) so the lower+regexp_replace fold runs ONCE per document
    (r17 opt). The previous form referenced the ``folded`` expression
    from inside the per-element transform lambda, and higher-order
    functions re-evaluate their lambda body's non-lambda subtrees per
    ELEMENT — an O(len²) regex fold per document, measured 5.4 s vs
    0.68 s for this projection alone at sf0.1/local[32], identical
    output."""
    folded = F.concat(
        F.lit(" "),
        F.regexp_replace(F.lower(F.col(text_col)), FOLD_REGEX, " "),
        F.lit(" "),
    )
    grams = F.transform(
        F.array(folded),
        lambda t: F.filter(
            F.transform(
                F.when(
                    F.length(t) >= 3, F.sequence(F.lit(1), F.length(t) - 2)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.substring(t, i, F.lit(3)),
            ),
            # all-space trigram = text with no letters at all (runs
            # collapse, so it can only arise from fully-folded text) —
            # excluded so letterless input yields NO trigrams, not noise
            lambda g: g != "   ",
        ),
    )[0]
    return docs.select(
        "doc_id", "lang", F.explode(grams).alias("g")
    )


def language_profiles(grams: DataFrame) -> DataFrame:
    """(lang, g, r): per-language top-PROFILE_K trigram ranks from the
    TRAINING split — metadata-sized output (L × PROFILE_K rows)."""
    counts = _train_filter(grams).groupBy("lang", "g").count()
    w = Window.partitionBy("lang").orderBy(
        F.col("count").desc(), F.col("g").asc()
    )
    return (
        counts.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= PROFILE_K)
        .select("lang", "g", "r")
    )


def doc_rankings(grams: DataFrame) -> DataFrame:
    """(doc_id, lang, g, dr): each doc's own top-PROFILE_K ranking
    (lang carried through as the true label)."""
    counts = grams.groupBy("doc_id", "lang", "g").count()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("count").desc(), F.col("g").asc()
    )
    return (
        counts.withColumn("dr", F.row_number().over(w))
        .filter(F.col("dr") <= PROFILE_K)
        .select("doc_id", "lang", "g", "dr")
    )


def classify(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang, dist): out-of-place distance argmin.

    The doc ranking cross-joins the (metadata-sized, broadcast)
    language list, left-joins the profile, and aggregates integer
    distances; argmin via a total-order row_number."""
    grams = doc_trigrams(docs)
    profiles = language_profiles(grams)
    ranks = doc_rankings(grams)
    langs = profiles.select("lang").distinct().withColumnRenamed("lang", "cand")

    per_lang = (
        ranks.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(profiles).withColumnRenamed("lang", "cand")
            .withColumnRenamed("r", "pr"),
            ["cand", "g"],
            "left",
        )
        .groupBy("doc_id", "lang", "cand")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("dr") - F.col("pr")), F.lit(PROFILE_K)
                )
            )
            .cast("bigint")
            .alias("dist")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("dist").asc(), F.col("cand").asc()
    )
    return (
        per_lang.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand").alias("pred_lang"),
            "dist",
        )
    )


def classify_served(docs: DataFrame, profiles: DataFrame) -> DataFrame:
    """(doc_id, lang, pred_lang, dist) scored against a PERSISTED
    profile artifact (r17, VERDICT r16 task 4) — the serving shape
    the train+score entry's docstring promises for 100 TB: profiles
    are a trained-once parquet sidecar, metadata-sized (L×PROFILE_K
    rows), broadcast; the corpus never re-trains.

    Plan contract (pinned in tests/test_lang_trigram.py): ONE shuffle
    exchange of doc data. The explode output is repartitioned by
    doc_id once; every downstream requirement — the (doc,lang,g)
    count, the per-doc row_number, the (doc,lang,cand) distance sum,
    the argmin window — is a superset clustering of doc_id, so
    Spark's EnsureRequirements satisfies them all from that single
    partitioning. Both profile joins are broadcasts."""
    grams = doc_trigrams(docs).repartition("doc_id")
    counts = grams.groupBy("doc_id", "lang", "g").count()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("count").desc(), F.col("g").asc()
    )
    ranks = (
        counts.withColumn("dr", F.row_number().over(w))
        .filter(F.col("dr") <= PROFILE_K)
        .select("doc_id", "lang", "g", "dr")
    )
    # Candidate languages WITHOUT a distinct (a distinct is a shuffle,
    # even metadata-sized): rank 1 exists exactly once per language.
    langs = profiles.filter(F.col("r") == 1).select(F.col("lang").alias("cand"))
    per_lang = (
        ranks.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(profiles).withColumnRenamed("lang", "cand")
            .withColumnRenamed("r", "pr"),
            ["cand", "g"],
            "left",
        )
        .groupBy("doc_id", "lang", "cand")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("dr") - F.col("pr")), F.lit(PROFILE_K)
                )
            )
            .cast("bigint")
            .alias("dist")
        )
    )
    w2 = Window.partitionBy("doc_id").orderBy(
        F.col("dist").asc(), F.col("cand").asc()
    )
    return (
        per_lang.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand").alias("pred_lang"),
            "dist",
        )
    )


def lang_trigram_served_duckdb_sql(scoped_cte: str, fixture_path: str) -> str:
    """Oracle for the served entry: profiles re-derived from the FULL
    fixture's training split (what the artifact builder trains on —
    train-once is sf-independent), scored docs from the scoped CTE."""
    k = PROFILE_K
    return f"""
WITH {scoped_cte},
pfolded AS (
    SELECT doc_id, lang,
           ' ' || regexp_replace(lower(text), '{FOLD_REGEX_SQL}', ' ', 'g') || ' ' AS t
    FROM read_parquet('{fixture_path}')
    WHERE {TRAIN_SPLIT_SQL}
),
pgrams AS (
    SELECT lang, g FROM (
        SELECT lang, substr(t, CAST(i AS INT), 3) AS g
        FROM pfolded, unnest(range(1, length(t) - 1)) AS u(i)
    ) WHERE g <> '   '
),
profile AS (
    SELECT lang, g, r FROM (
        SELECT lang, g,
               row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS r
        FROM pgrams GROUP BY lang, g
    ) WHERE r <= {k}
),
folded AS (
    SELECT doc_id, lang,
           ' ' || regexp_replace(lower(text), '{FOLD_REGEX_SQL}', ' ', 'g') || ' ' AS t
    FROM ldocs
),
grams AS (
    SELECT doc_id, lang, g FROM (
        SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS g
        FROM folded, unnest(range(1, length(t) - 1)) AS u(i)
    ) WHERE g <> '   '
),
ranks AS (
    SELECT doc_id, lang, g, dr FROM (
        SELECT doc_id, lang, g,
               row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS dr
        FROM grams GROUP BY doc_id, lang, g
    ) WHERE dr <= {k}
),
per_lang AS (
    SELECT r.doc_id, r.lang, c.cand,
           SUM(CASE WHEN p.r IS NULL THEN {k} ELSE abs(r.dr - p.r) END)::BIGINT AS dist
    FROM ranks r
    CROSS JOIN (SELECT DISTINCT lang AS cand FROM profile) c
    LEFT JOIN profile p ON p.lang = c.cand AND p.g = r.g
    GROUP BY r.doc_id, r.lang, c.cand
)
SELECT doc_id, lang, cand AS pred_lang, dist
FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, cand ASC) AS rn
    FROM per_lang
) WHERE rn = 1
"""


def lang_trigram_duckdb_sql(scoped_cte: str) -> str:
    """The SAME pipeline in DuckDB SQL over a CTE named ``ldocs``
    (doc_id, lang, text) — the oracle's full re-derivation of
    train + score."""
    k = PROFILE_K
    return f"""
WITH {scoped_cte},
folded AS (
    SELECT doc_id, lang,
           ' ' || regexp_replace(lower(text), '{FOLD_REGEX_SQL}', ' ', 'g') || ' ' AS t
    FROM ldocs
),
grams AS (
    SELECT doc_id, lang, g FROM (
        SELECT doc_id, lang, substr(t, CAST(i AS INT), 3) AS g
        FROM folded, unnest(range(1, length(t) - 1)) AS u(i)
    ) WHERE g <> '   '
),
profile AS (
    SELECT lang, g, r FROM (
        SELECT lang, g,
               row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS r
        FROM grams WHERE {TRAIN_SPLIT_SQL} GROUP BY lang, g
    ) WHERE r <= {k}
),
ranks AS (
    SELECT doc_id, lang, g, dr FROM (
        SELECT doc_id, lang, g,
               row_number() OVER (PARTITION BY doc_id ORDER BY count(*) DESC, g ASC) AS dr
        FROM grams GROUP BY doc_id, lang, g
    ) WHERE dr <= {k}
),
per_lang AS (
    SELECT r.doc_id, r.lang, c.cand,
           SUM(CASE WHEN p.r IS NULL THEN {k} ELSE abs(r.dr - p.r) END)::BIGINT AS dist
    FROM ranks r
    CROSS JOIN (SELECT DISTINCT lang AS cand FROM profile) c
    LEFT JOIN profile p ON p.lang = c.cand AND p.g = r.g
    GROUP BY r.doc_id, r.lang, c.cand
)
SELECT doc_id, lang, cand AS pred_lang, dist
FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, cand ASC) AS rn
    FROM per_lang
) WHERE rn = 1
"""
