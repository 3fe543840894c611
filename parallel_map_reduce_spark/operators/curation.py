"""Corpus curation for training-data pipelines (SURVEY.md §2.3).

The ops a pretraining data pipeline runs between "raw crawl" and
"tokenizer input", composed from the engine's own primitives:

- ``curate_documents``: the filter chain — length floor, alphabetic-
  ratio floor, exact-dedup keep-first — as ONE declarative plan, so
  Catalyst fuses the per-row predicates into the scan and the only
  shuffle is the dedup group-by.
- ``train_val_split``: deterministic hash-based split assignment
  (md5-derived, portable across engines — no rand(), so re-runs and
  retries assign identically).
- ``pack_document_bins``: contiguous token-budget packing — documents
  stream into fixed-budget bins per source shard, the shard/bin layout
  a sequence-packing pretraining loader consumes.

Threshold hygiene: every filter compares INTEGER quantities
(cross-multiplied ratios, token counts) — never a derived float against
a constant — so no engine pair can disagree about a boundary document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_i32
from .tokenize import TOKEN_SPLIT_REGEX

MIN_TOKENS = 20  # drop docs shorter than this many whitespace tokens
# alpha_ratio >= 0.5, compared as 2*n_alpha >= n_chars (integer-exact)
ALPHA_NUM = 2
PACK_BUDGET = 512  # tokens per packed bin
SPLIT_SALT = "split:"  # salt so the split hash is independent of other
# doc_id-derived hashes in the pipeline
TRAIN_PCT = 90  # md5(doc_id) % 100 < 90 -> train, else val


def _n_ws_tokens() -> F.Column:
    return F.size(
        F.filter(F.split("text", TOKEN_SPLIT_REGEX), lambda x: F.length(x) > 0)
    )


def curate_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source, n_tokens, n_chars) for documents surviving
    the curation chain: ≥ MIN_TOKENS whitespace tokens, alphabetic ratio
    ≥ 1/ALPHA_NUM of characters, and first-doc-id-wins exact dedup on
    md5(text).

    Plan shape: the length/ratio predicates are per-row projections
    fused into the scan; the dedup is the single shuffle (window min
    over the digest — at 100 TB the digest distributes uniformly by
    construction, so no skew mitigation is needed).
    """
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        _n_ws_tokens().cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).alias("n_alpha"),
        F.md5("text").alias("digest"),
    ).filter(
        (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_alpha") * ALPHA_NUM >= F.col("n_chars"))
    )
    keeper = Window.partitionBy("digest")
    return (
        scored.withColumn("min_id", F.min("doc_id").over(keeper))
        .filter(F.col("doc_id") == F.col("min_id"))
        .select("doc_id", "lang", "source", "n_tokens", "n_chars")
    )


def train_val_split(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, split): deterministic hash split — md5-derived so
    any engine (and any re-run) assigns the same document to the same
    side; never rand(), which would break retry determinism and make
    the split irreproducible."""
    bucket = F.pmod(
        md5_i32(F.concat(F.lit(SPLIT_SALT), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(bucket < TRAIN_PCT, F.lit("train")).otherwise(F.lit("val")).alias("split"),
    )


def pack_document_bins(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """(source, bin, n_docs, sum_tokens): contiguous token-budget packing.

    Documents stream through each source shard in doc_id order; a
    document lands in the bin its STARTING token offset falls in
    (floor((running_sum - n_tokens) / budget)) — the contiguous-fill
    approximation of sequence packing that stays a pure window + integer
    arithmetic plan: one shuffle on source, no Python, engine-exact.
    A bin can overflow by at most one document — the standard trade for
    streaming packers; an exact bin-capacity packer is inherently
    sequential per shard.
    """
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = docs.select("doc_id", "source", _n_ws_tokens().cast("bigint").alias("n_tokens"))
    binned = toks.withColumn(
        "bin",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / budget).cast("bigint"),
    )
    return binned.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )


# Per-language keep-rate (percent) for stratified downsampling; languages
# absent from the map keep DEFAULT_RATE. 'en' dominates the corpus ~2:1,
# so the sample rebalances by keeping 40% of it.
STRATA_RATES: dict[str, int] = {"en": 40}
DEFAULT_RATE = 100
STRATA_SALT = "strat:"


def stratified_sample(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, source): deterministic stratified sample — each
    language keeps STRATA_RATES[lang]% of its documents (DEFAULT_RATE
    for unlisted languages), selected by a salted md5 bucket of doc_id.

    Scale shape: a pure per-row predicate — no sampleBy (whose
    Bernoulli draw is seed- and partitioning-dependent), no shuffle, no
    per-stratum pass. The same document is kept by every engine, every
    retry, every partitioning; the rate map rides along as a CASE
    expression, so adding strata never adds a scan."""
    bucket = F.pmod(
        md5_i32(F.concat(F.lit(STRATA_SALT), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    rate = F.lit(DEFAULT_RATE)
    for lang, pct in STRATA_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    return docs.filter(bucket < rate).select("doc_id", "lang", "source")


# Training-mix epoch factors: copies of each document per language.
# Fractional factors (e.g. 1.5) take the integer part plus a
# deterministic md5-bucket draw for the remainder.
MIX_FACTORS: dict[str, float] = {"fr": 2.0, "de": 1.5, "zh": 0.5}
MIX_DEFAULT = 1.0
MIX_SALT = "mix:"


def mix_oversample(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, copy): the training-data mix — each document
    repeated floor(f) times plus one more with probability frac(f),
    where f is its language's epoch factor (LLaMA-style source
    weighting; f<1 downsamples).

    Deterministic end to end: the fractional draw is the salted
    md5 bucket of doc_id (stable across engines/retries), and copies
    materialize via explode(sequence(1, n_copies)) — a generator, not a
    shuffle; the mix is a scan-speed projection whatever the factors."""
    bucket = F.pmod(
        md5_i32(F.concat(F.lit(MIX_SALT), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    whole_default, frac_default = int(MIX_DEFAULT), int(round((MIX_DEFAULT % 1) * 100))
    n_copies = F.lit(whole_default) + (bucket < frac_default).cast("int")
    for lang, f in MIX_FACTORS.items():
        whole, frac = int(f), int(round((f % 1) * 100))
        n_copies = F.when(
            F.col("lang") == lang, F.lit(whole) + (bucket < frac).cast("int")
        ).otherwise(n_copies)
    return (
        docs.select("doc_id", "lang", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy"),
        )
    )


TMIX_SALT = "tmix:"
TMIX_ALPHA = 0.5
TMIX_BASIS = 10000


def temperature_mix(docs: DataFrame, alpha: float = TMIX_ALPHA) -> DataFrame:
    """(doc_id, lang, copy): temperature-scaled source mixing — per-
    language sampling weights proportional to n_lang^alpha (alpha<1
    flattens the distribution toward rare languages, the multilingual-
    pretraining "temperature sampling" scheme), renormalized so the
    expected output size equals the corpus size. Each document gets
    rate = T * n^alpha / (sum_l n_l^alpha) / n copies: floor(rate)
    whole copies plus one more when its salted md5 bucket (stable
    across engines/retries) falls under the fractional part.

    Unlike ``mix_oversample`` (operator-supplied FIXED epoch factors),
    the rates here are COMPUTED from the observed language histogram —
    a 5-row aggregate that broadcasts back onto the corpus; the copy
    materialization is the same zero-shuffle explode(sequence).

    Determinism note: rate is rounded to 4 decimals immediately after
    the one double division (same q14 discipline) so the floor/bucket
    cliffs read identical values on both engines."""
    cnt = docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("n"))
    tot = docs.agg(F.count("*").cast("bigint").alias("t"))
    wts = cnt.withColumn("wt", F.pow(F.col("n").cast("double"), F.lit(alpha)))
    sw = wts.agg(F.sum("wt").alias("total_w"))
    rate = (
        wts.crossJoin(F.broadcast(sw))
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.round(
                F.col("t") * F.col("wt") / F.col("total_w") / F.col("n"), 4
            ).alias("r"),
        )
    )
    bucket = F.pmod(
        md5_i32(F.concat(F.lit(TMIX_SALT), F.col("doc_id").cast("string"))),
        F.lit(TMIX_BASIS),
    )
    frac_ticks = F.round((F.col("r") - F.floor("r")) * TMIX_BASIS).cast("bigint")
    n_copies = F.floor("r").cast("bigint") + (bucket < frac_ticks).cast("bigint")
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(rate), "lang")
        .select("doc_id", "lang", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy"),
        )
        .select("doc_id", "lang", F.col("copy").cast("bigint").alias("copy"))
    )


# ---- deterministic weighted sampling without replacement ----

WSAMPLE_SALT = "wsample:"
WSAMPLE_K = 25  # keep this many docs per language


def weighted_sample(docs: DataFrame, k: int = WSAMPLE_K) -> DataFrame:
    """(lang, doc_id, n_chars, sample_rank): weighted random sample
    WITHOUT replacement, k docs per language, inclusion probability
    proportional to n_chars — the Efraimidis-Spirakis A-Res scheme
    (IPL 2006): give every row an exponential race key
    -ln(u)/w and keep the k SMALLEST keys per group, which is
    distributionally identical to sequential weighted draws.

    Deterministic: u = (md5(salt||doc_id) first-8-hex + 0.5) / 2^32 —
    a salted hash draw, not rand(), so re-runs, retries, and the
    DuckDB oracle all see the same sample (the repo's standard
    curation-sampling discipline). The race key itself stays out of
    the output: ln differs by ulps across libms, which cannot flip a
    rank except for keys equal to ~1e-16 relative — never with hash-
    distinct u values.

    Scale: the rank-limit window compiles to WindowGroupLimit
    (Spark 3.5+), which takes a per-task partial top-k BEFORE the
    lang-keyed exchange — the shuffle carries at most tasks*k rows
    per language, never the corpus, and no language is ever sorted
    whole."""
    u = (
        md5_i32(F.concat(F.lit(WSAMPLE_SALT), F.col("doc_id").cast("string")))
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    key = -F.log(u) / F.col("n_chars").cast("double")
    w = Window.partitionBy("lang").orderBy(F.asc("key"), F.asc("doc_id"))
    return (
        docs.select("lang", "doc_id", "n_chars", key.alias("key"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


# Leakage-guarded split: near-dup CLUSTER members must land in the same
# split, or evaluation leaks training data (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better" — the
# eval-contamination half of the dedup argument). Cluster ids come from
# FIXED-ROUND min-label propagation over the candidate-pair graph:
# fixed rounds (vs connected_components' run-to-fixpoint loop) keep the
# output a deterministic, SQL-replayable function of the edge list.
# LEAK_ROUNDS bounds the guarded chain length; near-dup clusters are
# shallow (diameter almost always <= 3), and the convergence pytest
# pins fixed-round == true-fixpoint labels on the test corpora — at a
# new corpus scale, raise LEAK_ROUNDS until that check holds.
LEAK_ROUNDS = 5
LEAK_SALT = "leak-split:"  # independent of SPLIT_SALT's hash stream
LEAK_TRAIN_BUCKETS = 8  # md5(cluster) % 10: 0-7 train, 8 val, 9 test


def minlabel_fixed_rounds(pairs: DataFrame, rounds: int = LEAK_ROUNDS) -> DataFrame:
    """(node, label): ``rounds`` synchronous min-label propagation steps
    over candidate pairs (doc_a, doc_b); label = smallest doc_id
    reachable within ``rounds`` hops. Per round: one label-keyed
    exchange for the neighbor min (map-side partial min), one node-keyed
    join back; labels checkpointed per round so plans stay flat — the
    connected_components discipline with the fixpoint loop unrolled."""
    sym = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(
        eager=True
    )
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(rounds):
        nbr = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_min"))
        )
        labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_min", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def leakage_guarded_split(
    docs: DataFrame, pairs: DataFrame, rounds: int = LEAK_ROUNDS
) -> DataFrame:
    """(doc_id, cluster_id, split): train/val/test assignment where
    every document in the same near-dup candidate cluster gets the SAME
    split — the hash is taken over the cluster id, not the doc id, so
    a near-copy of a training document can never land in test.
    Candidate pairs (not verified duplicates) are the deliberate,
    conservative choice: anything plausibly similar is guarded.
    Documents with no candidate edges are their own cluster. All
    arithmetic is integer/md5-exact, so an external engine reproduces
    every assignment bit-for-bit."""
    labels = minlabel_fixed_rounds(pairs, rounds)
    joined = docs.select("doc_id").join(
        labels, docs["doc_id"] == labels["node"], "left"
    )
    cluster = F.coalesce("label", F.col("doc_id"))
    bucket = F.pmod(
        md5_i32(F.concat(F.lit(LEAK_SALT), cluster.cast("string"))), F.lit(10)
    )
    return joined.select(
        "doc_id",
        cluster.alias("cluster_id"),
        F.when(bucket < LEAK_TRAIN_BUCKETS, F.lit("train"))
        .when(bucket == LEAK_TRAIN_BUCKETS, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
