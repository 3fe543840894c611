"""Registered corpus-curation queries (operators/curation.py) with
DuckDB oracles. All thresholds are integer-exact (cross-multiplied
ratios), so the oracle row sets match bit-for-bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as C
from ..registry import register
from ..sources.catalog import load_table, read_parquet

# DuckDB spelling of the whitespace-token count (non-empty splits),
# matching operators/curation._n_ws_tokens.
_NTOK = "len(list_filter(string_split_regex(text, '[ \t\n]+'), x -> len(x) > 0))"


@register(
    "curation_pipeline",
    oracle=f"""
WITH scored AS (
    SELECT doc_id, lang, source,
           {_NTOK}::BIGINT AS n_tokens,
           length(text)::BIGINT AS n_chars,
           length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
           md5(text) AS digest
    FROM documents
),
kept AS (
    SELECT *, MIN(doc_id) OVER (PARTITION BY digest) AS min_id
    FROM scored
    WHERE n_tokens >= {C.MIN_TOKENS} AND n_alpha * {C.ALPHA_NUM} >= n_chars
)
SELECT doc_id, lang, source, n_tokens, n_chars
FROM kept WHERE doc_id = min_id
""",
    doc="End-to-end curation chain: length floor + alpha-ratio floor + "
    "exact-dedup keep-first in one declarative plan (predicates fused "
    "into the scan, dedup is the only shuffle). "
    "operators/curation.py:curate_documents.",
    tags=("curation", "dedup", "pipeline"),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.curate_documents(load_table(spark, sf_dir, "documents"))


@register(
    "curation_train_val_split",
    oracle=f"""
SELECT doc_id, lang,
       CASE WHEN CAST(concat('0x', substr(md5(concat('{C.SPLIT_SALT}', doc_id::VARCHAR)), 1, 8)) AS BIGINT) % 100 < {C.TRAIN_PCT}
            THEN 'train' ELSE 'val' END AS split
FROM documents
""",
    doc="Deterministic hash-based train/val assignment (md5-derived, "
    "portable, retry-stable — never rand()). "
    "operators/curation.py:train_val_split.",
    tags=("curation", "sampling"),
)
def curation_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.train_val_split(load_table(spark, sf_dir, "documents"))


@register(
    "curation_pack_bins",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, source, {_NTOK}::BIGINT AS n_tokens FROM documents
),
binned AS (
    SELECT source,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                           ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {C.PACK_BUDGET}) AS BIGINT) AS bin,
           n_tokens
    FROM toks
)
SELECT source, bin, COUNT(*)::BIGINT AS n_docs, SUM(n_tokens)::BIGINT AS sum_tokens
FROM binned GROUP BY source, bin
""",
    doc="Token-budget sequence packing: contiguous fill of fixed-budget "
    "bins per source shard via a running-sum window — the shard/bin "
    "layout a packing pretraining loader consumes. "
    "operators/curation.py:pack_document_bins.",
    tags=("curation", "window", "packing"),
)
def curation_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.pack_document_bins(load_table(spark, sf_dir, "documents"))


def _strata_rate_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lg}' THEN {pct}" for lg, pct in C.STRATA_RATES.items()
    )
    return f"CASE {whens} ELSE {C.DEFAULT_RATE} END"


@register(
    "curation_stratified_sample",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(concat('0x', substr(md5(concat('{C.STRATA_SALT}', doc_id::VARCHAR)), 1, 8)) AS BIGINT) % 100
      < {_strata_rate_sql()}
""",
    doc="Deterministic stratified sampling: per-language keep rates via "
    "a salted md5 bucket — a pure per-row predicate (no sampleBy "
    "Bernoulli draw, no shuffle), so every engine/retry/partitioning "
    "keeps the identical document set. "
    "operators/curation.py:stratified_sample.",
    tags=("curation", "sampling"),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.stratified_sample(load_table(spark, sf_dir, "documents"))


@register(
    "orders_quality_report",
    oracle="""
WITH agg AS (
    SELECT COUNT(*)::BIGINT AS n_rows,
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS v1,
           SUM(CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice > 0) THEN 1 ELSE 0 END)::BIGINT AS v2,
           SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)::BIGINT AS v3,
           SUM(CASE WHEN o_orderdate IS NULL
                      OR NOT (o_orderdate >= TIMESTAMP '1992-01-01'
                              AND o_orderdate < TIMESTAMP '2002-01-01') THEN 1 ELSE 0 END)::BIGINT AS v4,
           SUM(CASE WHEN o_orderkey IS NULL OR NOT (o_orderkey >= 0) THEN 1 ELSE 0 END)::BIGINT AS v5
    FROM orders
)
SELECT 'custkey_not_null' AS "check", n_rows, v1 AS n_violations FROM agg
UNION ALL SELECT 'totalprice_positive', n_rows, v2 FROM agg
UNION ALL SELECT 'status_in_domain', n_rows, v3 FROM agg
UNION ALL SELECT 'orderdate_in_range', n_rows, v4 FROM agg
UNION ALL SELECT 'orderkey_unique_nonneg', n_rows, v5 FROM agg
""",
    doc="Deequ-style declarative data-quality suite: every rule is a "
    "sum(case) in ONE scan-speed aggregation (the exchange carries "
    "|rules| rows, never data), then unpivoted to a (check, n_rows, "
    "n_violations) report. Null predicate results count as violations. "
    "operators/quality_checks.py:validate.",
    tags=("curation", "quality", "validation"),
)
def orders_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality_checks import orders_quality_report as _r

    return _r(load_table(spark, sf_dir, "orders"))


@register(
    "referential_integrity_report",
    oracle="""
SELECT 'orders_custkey_orphans' AS "check",
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))::BIGINT AS n_orphans
UNION ALL
SELECT 'lineitem_orderkey_orphans',
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))::BIGINT
UNION ALL
SELECT 'events_user_orphans',
       (SELECT COUNT(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))::BIGINT
""",
    doc="Cross-table referential-integrity audit: orphan counts per FK "
    "edge via LEFT ANTI joins (key-only projections, dims broadcast), "
    "unioned into one report — the quality_checks companion for "
    "constraints that span tables.",
    tags=("curation", "quality", "integrity", "join"),
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    li = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")

    def orphans(name, fact, key, dim, dim_key):
        cnt = (
            fact.select(F.col(key).alias(dim_key))
            .join(F.broadcast(dim), dim_key, "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_orphans"))
        )
        return cnt.select(F.lit(name).alias("check"), "n_orphans")

    return (
        orphans("orders_custkey_orphans", o, "o_custkey", c, "c_custkey")
        .unionByName(
            orphans(
                "lineitem_orderkey_orphans",
                li,
                "l_orderkey",
                o.select("o_orderkey"),
                "o_orderkey",
            )
        )
        .unionByName(orphans("events_user_orphans", e, "user_id", c, "c_custkey"))
    )


def _mix_copies_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lg}' THEN {int(f)} + CASE WHEN bucket < {int(round((f % 1) * 100))} THEN 1 ELSE 0 END"
        for lg, f in C.MIX_FACTORS.items()
    )
    d = C.MIX_DEFAULT
    return (
        f"CASE {whens} ELSE {int(d)} + CASE WHEN bucket < {int(round((d % 1) * 100))} "
        "THEN 1 ELSE 0 END END"
    )


@register(
    "curation_mix_oversample",
    oracle=f"""
WITH b AS (
    SELECT doc_id, lang,
           CAST(concat('0x', substr(md5(concat('{C.MIX_SALT}', doc_id::VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
    FROM documents
),
n AS (
    SELECT doc_id, lang, {_mix_copies_sql()} AS n_copies FROM b
)
SELECT doc_id, lang, unnest(range(1, n_copies + 1))::BIGINT AS copy
FROM n WHERE n_copies > 0
""",
    doc="Training-mix oversampling: per-language epoch factors "
    "(fr x2, de x1.5, zh x0.5) — floor(f) copies plus a deterministic "
    "md5-bucket draw for the fraction; copies materialize via "
    "explode(sequence) at scan speed, no shuffle. The mix table a "
    "pretraining loader consumes for source weighting. "
    "operators/curation.py:mix_oversample.",
    tags=("curation", "sampling", "mixing"),
)
def curation_mix_oversample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.mix_oversample(load_table(spark, sf_dir, "documents"))


@register(
    "curation_temperature_mix",
    oracle=f"""
WITH cnt AS (SELECT lang, COUNT(*)::BIGINT AS n FROM documents GROUP BY lang),
tot AS (SELECT COUNT(*)::BIGINT AS t FROM documents),
w AS (SELECT lang, n, pow(n, {C.TMIX_ALPHA}) AS wt FROM cnt),
sw AS (SELECT SUM(wt) AS total_w FROM w),
rate AS (
    SELECT lang, n, ROUND(t * wt / total_w / n, 4) AS r
    FROM w, sw, tot
),
b AS (
    SELECT d.doc_id, d.lang, r.r,
           CAST(concat('0x', substr(md5(concat('{C.TMIX_SALT}', d.doc_id::VARCHAR)), 1, 8)) AS BIGINT) % {C.TMIX_BASIS} AS bucket
    FROM documents d JOIN rate r ON r.lang = d.lang
),
n AS (
    SELECT doc_id, lang,
           CAST(FLOOR(r) AS BIGINT)
           + CASE WHEN bucket < CAST(ROUND((r - FLOOR(r)) * {C.TMIX_BASIS}) AS BIGINT)
                  THEN 1 ELSE 0 END AS n_copies
    FROM b
)
SELECT doc_id, lang, unnest(range(1, n_copies + 1))::BIGINT AS copy
FROM n WHERE n_copies > 0
""",
    doc="Temperature-scaled training mix: per-language rates computed "
    "FROM the observed histogram (weight n^0.5, renormalized to keep "
    "corpus size) rather than operator-supplied factors — the "
    "multilingual-pretraining temperature-sampling scheme. The 5-row "
    "rate table broadcasts onto the corpus; copies materialize via "
    "explode(sequence) at scan speed. "
    "operators/curation.py:temperature_mix.",
    tags=("curation", "sampling", "mixing"),
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.temperature_mix(load_table(spark, sf_dir, "documents"))


@register(
    "documents_corpus_report",
    oracle=f"""
WITH words AS (
    SELECT doc_id,
           unnest(list_filter(list_transform(string_split_regex(text, '[ \t\n]+'),
                  t -> lower(regexp_replace(t, '[^A-Za-z]', '', 'g'))),
                  w -> length(w) > 0)) AS word
    FROM documents
),
tok AS (SELECT COUNT(*)::BIGINT AS total_tokens,
               COUNT(DISTINCT word)::BIGINT AS distinct_words FROM words),
docs AS (SELECT COUNT(*)::BIGINT AS n_docs,
                COUNT(DISTINCT lang)::BIGINT AS n_langs,
                COUNT(DISTINCT source)::BIGINT AS n_sources FROM documents),
dups AS (
    SELECT COALESCE(SUM(n), 0)::BIGINT AS exact_dup_docs FROM (
        SELECT COUNT(*) AS n FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    )
)
SELECT metric, value FROM (
    SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM docs
    UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM docs
    UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM docs
    UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM tok
    UNION ALL SELECT 'distinct_words', CAST(distinct_words AS DOUBLE) FROM tok
    UNION ALL SELECT 'exact_dup_docs', CAST(exact_dup_docs AS DOUBLE) FROM dups
    UNION ALL SELECT 'mean_tokens_per_doc',
        ROUND(CAST(t.total_tokens AS DOUBLE) / d.n_docs, 4) FROM tok t, docs d
)
""",
    doc="Data-card corpus report: the one-glance summary a training-set "
    "release ships — doc/lang/source counts, token totals, vocabulary "
    "size, exact-duplicate count, mean doc length — as (metric, value) "
    "rows. Every number is integer-derived (one rounded division for "
    "the mean), so the report is bit-stable across engines; the token "
    "scan is one pass, everything else is metadata-sized aggregation.",
    tags=("curation", "quality", "report"),
)
def documents_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.dedup import clean_words_array

    words = clean_words_array(docs).select(
        "doc_id", F.explode("words").alias("word")
    )
    tok = words.agg(
        F.count("*").cast("bigint").alias("total_tokens"),
        F.countDistinct("word").cast("bigint").alias("distinct_words"),
    )
    d = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    dups = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("exact_dup_docs"))
    )

    def row(metric: str, col: F.Column, src: DataFrame) -> DataFrame:
        return src.select(
            F.lit(metric).alias("metric"), col.cast("double").alias("value")
        )

    mean = d.crossJoin(tok).select(
        F.lit("mean_tokens_per_doc").alias("metric"),
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), 4
        ).alias("value"),
    )
    return (
        row("n_docs", F.col("n_docs"), d)
        .unionByName(row("n_langs", F.col("n_langs"), d))
        .unionByName(row("n_sources", F.col("n_sources"), d))
        .unionByName(row("total_tokens", F.col("total_tokens"), tok))
        .unionByName(row("distinct_words", F.col("distinct_words"), tok))
        .unionByName(row("exact_dup_docs", F.col("exact_dup_docs"), dups))
        .unionByName(mean)
    )


@register(
    "documents_quality_logreg",
    oracle=None,  # 40 GD iterations are not one-shot SQL; rows-only in
    # the gate. tests/test_quality_model.py carries the contract: the
    # Spark-trained weights equal a pure-Python replica's (identical
    # rounding + exact Decimal sums) and scores agree to 1e-9, plus a
    # bit-determinism re-run and a separation check (en docs score
    # higher than non-en on average by construction).
    doc="Weak-supervision quality classifier trained ON the cluster: "
    "batch gradient descent over heuristic quality features "
    "(operators/quality_model.py), label = high-resource slice "
    "(lang == 'en'), squashing chosen arithmetic-only and gradient "
    "sums reduced as rounded DECIMALs so training is bit-deterministic "
    "across partitionings. One aggregation job per iteration; only "
    "the 5-float weight vector reaches the driver. The CCNet/GPT-3 "
    "quality-filter shape with the external scorer replaced by a "
    "self-trained model.",
    tags=("curation", "quality", "model", "training", "iterative"),
)
def documents_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats, weights = _pretrained_quality_model(spark, sf_dir)
    from ..operators import quality_model as QM

    feat = QM.doc_quality_features(load_table(spark, sf_dir, "documents"))
    return QM.score_logreg(QM.standardize(feat, stats), weights)


def _pretrained_quality_model(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[str, tuple[float, float]], list[float]]:
    """Trained quality model (feature stats + weights) for a corpus
    version — the PQ-books/IVF-centroids sidecar discipline applied to
    the classifier: training (featurize + 40 GD jobs, ~20 s) runs ONCE
    per corpus version and publishes 13 floats through the atomic
    artifact cache; every later process scores from the sidecar.
    Training is bit-deterministic (rounded-DECIMAL gradient sums) and
    JSON float round-trips are repr-based and bit-exact, so cached and
    fresh scores are identical (pinned in tests/test_quality_model.py)."""
    import json
    import os

    from ..operators import quality_model as QM
    from ..sources.artifact_cache import ensure_artifact, source_key

    def build(tmp: str) -> None:
        feat = QM.doc_quality_features(
            load_table(spark, sf_dir, "documents")
        ).persist()
        try:
            stats = QM.feature_stats(feat)
            weights = QM.train_logreg(QM.standardize(feat, stats))
        finally:
            feat.unpersist(blocking=False)
        with open(os.path.join(tmp, "model.json"), "w") as f:
            json.dump({"stats": stats, "weights": weights}, f)

    mdir = ensure_artifact(
        "pmrs_quality_model",
        source_key("qlogreg", sf_dir, "documents.parquet"),
        build,
    )
    with open(os.path.join(mdir, "model.json")) as f:
        m = json.load(f)
    stats = {c: (mu, sd) for c, (mu, sd) in m["stats"].items()}
    return stats, [float(w) for w in m["weights"]]


@register(
    "curation_weighted_sample",
    oracle=f"""
WITH keyed AS (
    SELECT lang, doc_id, n_chars,
           -ln((CAST(concat('0x', substr(md5(concat('{C.WSAMPLE_SALT}', doc_id::VARCHAR)), 1, 8)) AS BIGINT) + 0.5) / 4294967296.0)
           / n_chars AS key
    FROM documents
),
ranked AS (
    SELECT lang, doc_id, n_chars,
           row_number() OVER (PARTITION BY lang ORDER BY key ASC, doc_id ASC) AS sample_rank
    FROM keyed
)
SELECT lang, doc_id, n_chars::BIGINT AS n_chars, sample_rank::INT AS sample_rank
FROM ranked WHERE sample_rank <= {C.WSAMPLE_K}
""",
    doc=f"Weighted sampling without replacement ({C.WSAMPLE_K} docs per "
    "language, inclusion odds proportional to n_chars) via the "
    "Efraimidis-Spirakis exponential-race keys -ln(u)/w over a salted "
    "md5 draw — deterministic across engines and retries, no rand(). "
    "The rank-limit window compiles to WindowGroupLimit (per-task "
    "partial top-k before the exchange), so the shuffle carries "
    "tasks*k rows, never the corpus. "
    "operators/curation.py:weighted_sample.",
    tags=("curation", "sampling", "window"),
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.weighted_sample(load_table(spark, sf_dir, "documents"))


def _leakage_split_oracle() -> str:
    # Same LSH pair SQL every dedup/graph oracle uses; min-label rounds
    # unrolled into chained CTEs (the pagerank/LPA oracle discipline).
    from .dedup import LSH_PAIRS_CTES

    steps = ["ml0 AS (SELECT node, node AS label FROM nodes)"]
    for i in range(1, C.LEAK_ROUNDS + 1):
        steps.append(
            f"""ml{i} AS (
    SELECT n.node, LEAST(n.label, COALESCE(MIN(p.label), n.label)) AS label
    FROM ml{i - 1} n
    LEFT JOIN sym e ON e.dst = n.node
    LEFT JOIN ml{i - 1} p ON p.node = e.src
    GROUP BY n.node, n.label
)"""
        )
    rounds = ",\n".join(steps)
    # sym is referenced once per unrolled round — MATERIALIZED stops
    # DuckDB re-deriving the whole shingle->minhash->band pipeline
    # LEAK_ROUNDS times (measured 20 s -> ~4 s at sf0.01).
    return f"""
WITH {LSH_PAIRS_CTES},
sym AS MATERIALIZED (
    SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
nodes AS (SELECT DISTINCT src AS node FROM sym),
{rounds},
assigned AS (
    SELECT d.doc_id,
           COALESCE(m.label, d.doc_id) AS cluster_id
    FROM documents d LEFT JOIN ml{C.LEAK_ROUNDS} m ON m.node = d.doc_id
)
SELECT doc_id, cluster_id,
       CASE
         WHEN CAST(concat('0x', substr(md5(concat('{C.LEAK_SALT}', cluster_id::VARCHAR)), 1, 8)) AS BIGINT) % 10 < {C.LEAK_TRAIN_BUCKETS} THEN 'train'
         WHEN CAST(concat('0x', substr(md5(concat('{C.LEAK_SALT}', cluster_id::VARCHAR)), 1, 8)) AS BIGINT) % 10 = {C.LEAK_TRAIN_BUCKETS} THEN 'val'
         ELSE 'test'
       END AS split
FROM assigned
"""


@register(
    "curation_leakage_split",
    oracle=_leakage_split_oracle(),
    doc=f"Leakage-guarded train/val/test split: the split hash is taken "
    "over the near-dup CLUSTER id (fixed-round min-label propagation "
    f"over the MinHash-LSH candidate graph, {C.LEAK_ROUNDS} rounds), so "
    "a near-copy of a training document can never land in eval — the "
    "contamination guard Lee et al. 2022 argue for, as one deterministic "
    "plan. Candidate edges serve from the SHARED persisted artifact "
    "(queries/dedup.py:ensure_lsh_edges); fixed rounds (vs run-to-"
    "fixpoint) keep the operator SQL-replayable, and the convergence "
    "pytest pins fixed-round == true connected components on the test "
    "corpora. operators/curation.py:leakage_guarded_split.",
    tags=("curation", "dedup", "llm-pipeline", "custom-operator"),
)
def curation_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import ensure_lsh_edges

    docs = load_table(spark, sf_dir, "documents")
    pairs = read_parquet(spark, ensure_lsh_edges(spark, sf_dir))
    return C.leakage_guarded_split(docs, pairs)
