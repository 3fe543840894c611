"""Document deduplication operators (north-star extension, SURVEY.md §2.3).

Four families, all built on DataFrame ops with portable md5-derived
hashing (``functions/hashing.py``) so an external SQL oracle reproduces
them exactly:

- **exact**: hash-groupBy on md5(text) — one shuffle on the digest.
- **MinHash + LSH**: shingle → minhash signature → band buckets →
  bucket-join for candidate pairs. The banding join is the scale path:
  candidates come from equi-joins on (band, signature), never an O(n²)
  cross join. Public basis: Broder's minhash + LSH banding as used in
  MapReduce entity-resolution literature (PAPERS.md, ICDE 2017).
- **SimHash**: 32-bit sign-of-weighted-bit-votes fingerprint; identical
  fingerprints = near-dup bucket.
- **n-gram Jaccard**: exact Jaccard over 3-token shingles computed via an
  inverted-index self-join (pairs sharing a shingle), which is the
  standard similarity-join decomposition — work is proportional to
  co-occurring shingles, not to the pair count.

Scale notes: every op here keys its shuffles on content-derived hashes,
which distribute uniformly; the one skew risk is ultra-frequent shingles
in the Jaccard join (stop-shingles), mitigated at 100 TB by a prefix
frequency cap (documented on the function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_i32
from .tokenize import clean_word_col, TOKEN_SPLIT_REGEX

# ---- shared deterministic constants (also interpolated into oracle SQL) ----

MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_K = 3


def _lcg_seeds(n: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) hash seeds via a fixed LCG — no RNG module, so
    the Spark code and the generated oracle SQL share them verbatim."""
    seeds = []
    x = 42
    for _ in range(n):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % 999_983 + 1  # nonzero multiplier
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % 999_979
        seeds.append((a, b))
    return seeds


MINHASH_SEEDS = _lcg_seeds(N_HASHES)


# ---- building blocks ----


def ordered_words(docs: DataFrame) -> DataFrame:
    """(doc_id, word, seq): cleaned tokens in document order, empties
    dropped, 1-based seq. posexplode keeps the split position so order
    survives the explode; the window re-numbers after the empty filter."""
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), TOKEN_SPLIT_REGEX)).alias("pos", "tok"),
    ).select("doc_id", "pos", clean_word_col("tok").alias("word"))
    toks = toks.filter(F.length("word") > 0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    return toks.select("doc_id", "word", F.row_number().over(w).alias("seq"))


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) DISTINCT k-token shingles (space-joined)."""
    ow = ordered_words(docs)
    w = Window.partitionBy("doc_id").orderBy("seq")
    cols = [F.col("word")] + [F.lead("word", i).over(w) for i in range(1, k)]
    sh = ow.select(
        "doc_id",
        F.concat_ws(" ", *cols).alias("shingle"),
        cols[-1].alias("_tail"),
    ).filter(F.col("_tail").isNotNull())
    return sh.select("doc_id", "shingle").distinct()


# ---- exact dedup ----


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Group identical texts: (text_md5, keep_id = min doc_id, n_copies).
    One shuffle keyed on the digest; digests distribute uniformly."""
    return (
        docs.select("doc_id", F.md5("text").alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---- MinHash + LSH ----


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, j, minhash): N_HASHES-row signature per document.

    Shingle hash is md5-derived 32-bit; each hash family j applies
    (a_j * h + b_j) mod P. The per-(doc, j) min is a partial-aggregable
    hash agg — map-side combine shrinks it before the shuffle.
    """
    sh = doc_shingles(docs).withColumn("hv", md5_i32("shingle"))
    seeds = F.array(
        *[
            F.struct(F.lit(j).alias("j"), F.lit(a).alias("a"), F.lit(b).alias("b"))
            for j, (a, b) in enumerate(MINHASH_SEEDS)
        ]
    )
    exploded = sh.select("doc_id", "hv", F.explode(seeds).alias("s"))
    mh = (F.col("s.a") * F.col("hv") + F.col("s.b")) % F.lit(MINHASH_PRIME)
    return (
        exploded.select("doc_id", F.col("s.j").alias("j"), mh.alias("h"))
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, band, sig): md5 over the band's ordered minhash values."""
    mh = minhash_signatures(docs).withColumn(
        "band", (F.col("j") / F.lit(ROWS_PER_BAND)).cast("int")
    )
    return (
        mh.groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("j", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("sig")
        )
    )


def minhash_lsh_candidates(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs: docs sharing any band
    bucket. Equi-join on (band, sig) — the LSH trick that replaces the
    O(n²) cross join; bucket sizes are bounded by actual near-dup cluster
    sizes, and AQE splits any hot bucket at scale."""
    bands = lsh_band_signatures(docs)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---- SimHash ----

SIMHASH_BITS = 32


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit fingerprint over the distinct word set.

    Explodes 32 bit positions per word-hash: bit votes aggregate with
    map-side combine, so the shuffle carries (doc, bit) partial sums, not
    (doc, word, bit) rows.
    """
    words = (
        docs.select("doc_id", F.explode(F.split("text", TOKEN_SPLIT_REGEX)).alias("tok"))
        .select("doc_id", clean_word_col("tok").alias("word"))
        .filter(F.length("word") > 0)
        .distinct()
        .withColumn("hv", md5_i32("word"))
    )
    bits = words.select(
        "doc_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("i")
    )
    # bit i of hv via integer division — portable (DuckDB: (hv // 2^i) % 2).
    bit = (F.col("hv") / F.pow(F.lit(2.0), F.col("i"))).cast("bigint") % 2
    votes = bits.select(
        "doc_id",
        "i",
        F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)).alias("v"),
    )
    agg = votes.groupBy("doc_id", "i").agg(F.sum("v").alias("vote"))
    sim_bit = F.when(F.col("vote") > 0, F.lit(1)).otherwise(F.lit(0))
    return (
        agg.select(
            "doc_id",
            (sim_bit * F.pow(F.lit(2.0), F.col("i")).cast("bigint")).alias("term"),
        )
        .groupBy("doc_id")
        .agg(F.sum("term").cast("bigint").alias("simhash"))
    )


# ---- n-gram Jaccard ----


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact Jaccard over 3-token shingle sets,
    computed via inverted-index self-join (only pairs sharing ≥1 shingle
    are ever materialized). jaccard = |∩| / (|A| + |B| - |∩|) — pure
    integer arithmetic, so the double division is bit-identical in any
    engine.

    100 TB note: hot "stop-shingles" (shared by a large doc fraction)
    would dominate the self-join; production adds a document-frequency
    cap on shingles (prefix filtering) before the join. Not applied here
    to keep oracle semantics exact.
    """
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
