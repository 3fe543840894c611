"""Similarity search over embedding columns (north-star, SURVEY.md §2.3).

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  The query set broadcasts; candidates stream through a broadcast
  nested-loop join, so no shuffle of the big side. Per-pair math is
  ``zip_with``/``aggregate`` Column expressions (JVM codegen, no Python),
  verified bit-identical to DuckDB's ``list_dot_product`` on DOUBLE[].
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH with
  OR-amplification: N_PLANES sign bits split into ANN_BANDS bands of
  ANN_PLANES_PER_BAND bits; two vectors are candidates if they collide
  in ANY band (same trick as the MinHash banding join). Keeps each
  band's bucket count small enough that buckets actually collide, while
  the AND within a band keeps buckets selective. Recall is tested
  against the brute-force baseline (tests/test_similarity.py).
- ``label_blocked_neardup``: IVF-style blocked near-dup pairs — the
  coarse partitioner (label) bounds the pair blowup to per-block O(n²),
  the standard inverted-file decomposition.

Public basis: "Parallel Top-K Similarity Join Algorithms Using
MapReduce" (ICDE 2012), PAPERS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_i32
from ..sources.catalog import read_parquet
from ..functions.vector import cosine_similarity, dot, l2_norm

N_PLANES = 12
ANN_BANDS = 3
ANN_PLANES_PER_BAND = N_PLANES // ANN_BANDS  # 4 bits → 16 buckets per band

# Serving-path query batches are DRIVER METADATA by contract: the
# two-stage entries collect the query rows to score them against the
# code store / centroid table. That is only sound while |Q| is
# bounded; this cap refuses a query batch that has silently grown to
# corpus scale instead of OOM-ing the driver (VERDICT r17 task 2 — the
# collect_bounded discipline the twins use, applied to the serving
# paths). Generous vs the registered batches (|corpus|/50 = 100 rows
# at sf0.1) and far below driver-memory trouble at dim=64.
QUERY_BATCH_CAP = 100_000
# Above this many query rows the GEMM kernel's query matrix ships to
# executors as a TorrentBroadcast instead of riding every task
# closure (one transfer per executor, not one per task).
GEMM_BROADCAST_MIN_Q = 1_024
# A single label/cluster block is buffered in ONE task by the Arrow
# pair kernels (that is the point: per-block O(n²) stays local). This
# cap turns a pathologically hot block into a loud error instead of a
# silent executor OOM (VERDICT r17 task 6; at dim=64 float64 the cap
# is ~100 MB of block matrix per task — re-partition the hot key or
# raise n_centroids past it, as the SemDeDup paper does).
PAIR_BLOCK_ROW_CAP = 200_000


def _collect_query_batch(df: DataFrame, what: str) -> list:
    """Collect a serving-path query batch, refusing above
    QUERY_BATCH_CAP rows. One job: fetch cap+1 and treat a full fetch
    as overflow — no separate count pass."""
    rows = df.limit(QUERY_BATCH_CAP + 1).collect()
    if len(rows) > QUERY_BATCH_CAP:
        raise ValueError(
            f"{what}: query batch exceeds QUERY_BATCH_CAP="
            f"{QUERY_BATCH_CAP} rows — serving-path query batches are "
            "bounded driver metadata; chunk the batch or serve from the "
            "indexed store instead"
        )
    return rows


def plane_components(dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) derives
    from md5-free integer mixing so Spark and tests share them. Values in
    [-1, 1), exact halves of integers → exactly representable doubles."""
    planes = []
    for p in range(N_PLANES):
        row = []
        x = (p + 1) * 2654435761 % (1 << 32)
        for d in range(dim):
            x = (1103515245 * x + 12345) % (1 << 31)
            row.append((x % 2048) / 1024.0 - 1.0)
        planes.append(row)
    return planes


def brute_force_topk(
    emb: DataFrame,
    query_filter: F.Column,
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    (query_id, vec_id, cos, rank) with rank 1..k, self-match excluded.
    Ties broken by vec_id so the ordering is a total order.
    """
    # Norms precomputed per side (n + n_q sqrt-folds instead of 3 folds
    # per PAIR); cos = dot/(norm_q*norm_c) is the same expression tree per
    # factor, so values are bit-identical to the inline formulation.
    q = emb.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
    )
    cand = emb.select("vec_id", "embedding", l2_norm("embedding").alias("c_norm"))
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("c_norm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _band_buckets_expr(emb_col: str, dim: int) -> F.Column:
    """ARRAY of ANN_BANDS bucket ids: band b packs the sign bits of
    planes [b*r, (b+1)*r) into an int. Sign bit = dot(embedding, plane) > 0."""
    planes = plane_components(dim)
    buckets = []
    for band in range(ANN_BANDS):
        bits = None
        for i in range(ANN_PLANES_PER_BAND):
            p = band * ANN_PLANES_PER_BAND + i
            plane = F.array(*[F.lit(v) for v in planes[p]])
            d = F.aggregate(
                F.zip_with(F.col(emb_col), plane, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
            bits = bit if bits is None else bits + bit
        buckets.append(bits.cast("int"))
    return F.array(*buckets)


def lsh_ann_topk(emb: DataFrame, query_filter: F.Column, k: int = 10, dim: int = 64) -> DataFrame:
    """Approximate top-k via banded hyperplane LSH (OR-amplification).

    Candidates = vectors sharing ANY band bucket with the query — an
    equi-join on (band, bucket), never a cross join. At 100 TB: write the
    corpus partitioned by (band, bucket) once; each query probes
    ANN_BANDS partitions — a partition-pruned scan instead of a full
    pass. Here both sides are bucketed inline and the (small) query side
    broadcasts.
    """
    with_buckets = emb.withColumn("bkts", _band_buckets_expr("embedding", dim)).withColumn(
        "nrm", l2_norm("embedding")
    )
    # (vec_id, embedding, norm, band, bucket) — ANN_BANDS rows per vector.
    exploded = with_buckets.select(
        "vec_id", "embedding", "nrm", F.posexplode("bkts").alias("band", "bucket")
    )
    q = exploded.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
        F.col("band").alias("q_band"),
        F.col("bucket").alias("q_bucket"),
    )
    # Distinct candidate pairs (a pair may collide in several bands).
    # One exchange serves both the pair-dedup and the top-k window:
    # hash-partitioning on query_id alone satisfies the (query_id,
    # vec_id) aggregate's clustered-distribution requirement (subset of
    # the grouping keys) AND the rank window's, so dropDuplicates and
    # row_number share the same shuffle instead of exchanging twice.
    cand = (
        exploded.join(
            F.broadcast(q),
            (F.col("band") == F.col("q_band"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "q_emb", "q_norm", "vec_id", "embedding", "nrm")
        .repartition("query_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def write_lsh_index(emb: DataFrame, path: str, dim: int = 64) -> None:
    """Persist the LSH serving artifact: the corpus exploded to one row
    per band membership — (vec_id, embedding, nrm, band, bucket) —
    written ONCE, partitioned by (band, bucket) (≤ ANN_BANDS * 2^bits
    directories: 48 under the default 3x4-bit banding). This is the
    "write the corpus partitioned by (band, bucket) once" half that
    ``lsh_ann_topk``'s docstring promises; ``lsh_ann_topk_indexed``
    is the query half that probes it with file-level partition
    pruning. The bucketing projection is deterministic (fixed
    ``plane_components`` hyperplanes), so a rebuilt index is
    bit-identical for the same corpus."""
    store = (
        emb.withColumn("bkts", _band_buckets_expr("embedding", dim))
        .withColumn("nrm", l2_norm("embedding"))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            F.posexplode("bkts").alias("band", "bucket"),
        )
    )
    # Cluster rows by their target directory before the partitioned
    # write: without this every upstream task writes a sliver into
    # every (band, bucket) dir — N_tasks * 48 tiny files whose open
    # cost then dominates serving scans. One exchange at build time
    # buys one file per bucket (at 100 TB: repartition(N, band,
    # bucket) for N files per bucket, still bounded per directory).
    store.repartition("band", "bucket").write.mode("overwrite").partitionBy(
        "band", "bucket"
    ).parquet(path + "/buckets")


def lsh_ann_topk_indexed(
    emb: DataFrame, index_path: str, query_filter: F.Column, k: int = 10, dim: int = 64
) -> DataFrame:
    """Serving-only twin of ``lsh_ann_topk``: candidates come from the
    persisted (band, bucket)-partitioned store of ``write_lsh_index``
    instead of re-bucketing the whole corpus per query batch. The query
    batch's bucket ids are recomputed from the raw query vectors (a
    deterministic projection — the IVF-indexed discipline); the
    broadcast equi-join on the partition columns (band, bucket) then
    triggers Spark's DYNAMIC partition pruning — the executed plan's
    ``PartitionFilters`` carries ``dynamicpruningexpression(band IN
    ...)`` (pinned in tests/test_similarity.py), so the store scan
    reads only the probed directories with NO driver-side probe
    collect (one fewer job than an explicit isin-filter, and the probe
    set never leaves the JVM). At 100 TB no serving stage scans,
    shuffles, or re-hashes the corpus. Results are row-identical to
    the inline operator (same planes, same dedup, same exact-cosine
    rank; equality pinned in tests)."""
    spark = emb.sparkSession
    store = read_parquet(spark, index_path + "/buckets")
    q = (
        emb.filter(query_filter)
        .withColumn("bkts", _band_buckets_expr("embedding", dim))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            l2_norm("embedding").alias("q_norm"),
            F.posexplode("bkts").alias("q_band", "q_bucket"),
        )
    )
    cand = (
        store.join(
            F.broadcast(q),
            (F.col("band") == F.col("q_band"))
            & (F.col("bucket") == F.col("q_bucket"))
            & (F.col("query_id") != F.col("vec_id")),
        )
        .select("query_id", "q_emb", "q_norm", "vec_id", "embedding", "nrm")
        # one exchange serves pair-dedup AND the rank window (the
        # inline operator's shared-shuffle discipline)
        .repartition("query_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


IVF_K = 16  # coarse centroids
IVF_NPROBE = 3  # centroid lists probed per query
IVF_TRAIN_ITERS = 2  # Lloyd iterations over the seed centroids


def _centroid_df(spark, cents: dict[int, list[float]]) -> DataFrame:
    """k-row centroid frame. The driver-side values ALSO ride the
    returned frame (``_pmrs_local_cents``, cid-ascending, with the
    ``math.sqrt(_seq_dot)`` replica of l2_norm — bit-identical to the
    c_nrm column) so ``_assign_to_centroids`` can take its zero-shuffle
    Arrow path without ever re-collecting what the driver already
    holds. Centroids are driver metadata BY DEFINITION (the Lloyd loop
    materializes them between iterations), so this adds no job and no
    new memory class."""
    import math

    rows = [(cid, [float(x) for x in vec]) for cid, vec in sorted(cents.items())]
    df = spark.createDataFrame(
        rows, "centroid_id INT, c_emb ARRAY<DOUBLE>"
    ).withColumn("c_nrm", l2_norm("c_emb"))
    df._pmrs_local_cents = [
        (cid, vec, math.sqrt(_seq_dot(vec, vec))) for cid, vec in rows
    ]
    return df


def _assign_fn(cent_rows):
    """Arrow-batch kernel factory for ``_assign_to_centroids``: nearest
    centroid by cosine, numpy accumulation one dimension at a time (the
    ``dot`` fold's left-to-right order — bit-identical doubles), argmax
    over cid-ascending columns (np.argmax takes the FIRST max, which is
    exactly max_by's (c_cos, -centroid_id) tie-break; a NaN column from
    a zero-norm row/centroid is 'greatest' under both orders and both
    resolve to the lowest such cid). Embedding/nrm columns pass through
    the batch untouched."""

    def assign(it):
        import numpy as np
        import pyarrow as pa

        cids = np.array([c[0] for c in cent_rows], dtype=np.int32)
        cmat = np.array([c[1] for c in cent_rows], dtype=np.float64)
        cnrm = np.array([c[2] for c in cent_rows], dtype=np.float64)
        for batch in it:
            if batch.num_rows == 0:
                continue
            embs = np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            nrm = batch.column("nrm").to_numpy()
            n, dim = embs.shape
            acc = np.zeros((n, len(cids)))
            for i in range(dim):  # sequential: matches the fold
                acc = acc + embs[:, i : i + 1] * cmat[:, i]
            cos = acc / (nrm[:, None] * cnrm[None, :])
            best = np.argmax(cos, axis=1)
            yield pa.record_batch(
                [
                    batch.column("vec_id"),
                    batch.column("embedding"),
                    batch.column("nrm"),
                    pa.array(cids[best]),
                ],
                names=["vec_id", "embedding", "nrm", "centroid_id"],
            )

    return assign


def _train_partials_fn(cent_rows):
    """Arrow-batch kernel factory for the Lloyd update: nearest-centroid
    scoring identical to ``_assign_fn`` (same per-dimension sequential
    accumulation, same first-max argmax/NaN tie behavior), then
    per-cluster partial sums and counts accumulated with ``np.add.at``
    (unbuffered: applies additions sequentially in row order — the
    order an avg partial sum visits the partition). Emits one
    (centroid_id, pos, s, c) row per non-empty cluster x dimension per
    task — k x dim metadata rows instead of n x dim exploded rows."""

    def partials(it):
        import numpy as np
        import pyarrow as pa

        cids = np.array([c[0] for c in cent_rows], dtype=np.int32)
        cmat = np.array([c[1] for c in cent_rows], dtype=np.float64)
        cnrm = np.array([c[2] for c in cent_rows], dtype=np.float64)
        k, dim = cmat.shape
        sums = np.zeros((k, dim))
        cnts = np.zeros(k, dtype=np.int64)
        for batch in it:
            if batch.num_rows == 0:
                continue
            embs = np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            nrm = batch.column("nrm").to_numpy()
            n, _ = embs.shape
            acc = np.zeros((n, k))
            for i in range(dim):  # sequential: matches the fold
                acc = acc + embs[:, i : i + 1] * cmat[:, i]
            cos = acc / (nrm[:, None] * cnrm[None, :])
            best = np.argmax(cos, axis=1)
            np.add.at(sums, best, embs)
            np.add.at(cnts, best, 1)
        nz = np.nonzero(cnts)[0]
        if nz.size == 0:
            return
        yield pa.record_batch(
            [
                pa.array(np.repeat(cids[nz], dim)),
                pa.array(np.tile(np.arange(dim, dtype=np.int32), nz.size)),
                pa.array(sums[nz].ravel()),
                pa.array(np.repeat(cnts[nz], dim)),
            ],
            names=["centroid_id", "pos", "s", "c"],
        )

    return partials


def _assign_to_centroids(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, embedding, nrm, centroid_id): nearest centroid by cosine.

    When the centroid values ride the frame (every ``_centroid_df``
    product — the Lloyd loop, the pretrained-sidecar memo, SemDeDup),
    assignment is ONE Arrow hop per partition: zero shuffle, no k-fold
    interpreted cosine per vector (r18 opt, guide §4.2 — the crossJoin
    form exploded every vector into k rows, paid k CodegenFallback
    dot folds, and re-collapsed them through a vec_id Exchange that
    moved the full embedding arrays). Values bit-identical — see
    ``_assign_fn``.

    Fallback (a centroid frame NOT built by ``_centroid_df``):
    broadcast cross-join over k centroid rows + per-vector max_by — one
    pass over the corpus, no shuffle of the big side. Ties break to the
    lowest centroid_id in both forms.
    """
    local = getattr(cents, "_pmrs_local_cents", None)
    if local is not None:
        # embedding/nrm pass through the batch untouched, so the output
        # schema carries THEIR actual types (the store is float32).
        in_types = dict(e.dtypes)
        return e.select("vec_id", "embedding", "nrm").mapInArrow(
            _assign_fn(local),
            f"vec_id bigint, embedding {in_types['embedding']}, "
            f"nrm {in_types['nrm']}, centroid_id int",
        )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos", dot("embedding", "c_emb") / (F.col("nrm") * F.col("c_nrm"))
    )
    return scored.groupBy("vec_id").agg(
        F.first("embedding").alias("embedding"),
        F.first("nrm").alias("nrm"),
        F.max_by(
            "centroid_id", F.struct(F.col("c_cos"), (-F.col("centroid_id")).alias("t"))
        ).alias("centroid_id"),
    )


def train_ivf_centroids(
    emb: DataFrame, k: int = IVF_K, iters: int = IVF_TRAIN_ITERS
) -> DataFrame:
    """(centroid_id, c_emb, c_nrm): k-means coarse centroids for the IVF
    index, trained with Lloyd iterations expressed as DataFrame ops.

    Seeds are the first k vectors by vec_id (deterministic). Each
    iteration: assign every vector to its nearest centroid by cosine
    (broadcast over k rows), then recompute per-cluster means via
    ``posexplode(embedding) → avg per (centroid, dim) → array re-assembly``.
    The k × dim centroid values are materialized on the driver between
    iterations — the same driver-side update loop Spark MLlib's KMeans
    uses: centroids are small BY DEFINITION, and collecting them
    truncates lineage so training costs exactly ``iters + 1`` corpus
    passes instead of re-running the whole chain once per downstream
    consumer. Means are rounded to 6 dp so float-reduction order can't
    jitter assignments between runs; an empty cluster keeps its previous
    centroid (standard Lloyd fallback).
    """
    spark = emb.sparkSession
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    seed = e.orderBy("vec_id").limit(k).collect()
    cents = {i: [float(x) for x in r.embedding] for i, r in enumerate(seed)}
    for _ in range(iters):
        # Assign + per-cluster partial sums FUSED in one Arrow hop
        # (r18 opt, guide §2.3/§4.2): the unfused form shipped the full
        # embedding arrays back across the Python boundary and exploded
        # them into n x dim (centroid_id, pos, val) rows per iteration
        # just to aggregate them again; the kernel emits k x dim partial
        # (sum, count) rows per task instead. Per-partition accumulation
        # is np.add.at — sequential in row order, the same order avg's
        # per-partition partial sum visits; the division and HALF_UP
        # 6-dp round stay in Spark expressions, so the means class is
        # unchanged (cross-partition merge order was never deterministic
        # — the 6-dp round is the documented absorber on both forms).
        local = _centroid_df(spark, cents)._pmrs_local_cents
        means = (
            e.select("embedding", "nrm")
            .mapInArrow(
                _train_partials_fn(local),
                "centroid_id int, pos int, s double, c bigint",
            )
            .groupBy("centroid_id", "pos")
            .agg(F.round(F.sum("s") / F.sum("c"), 6).alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r.centroid_id, {})[r.pos] = float(r.m)
        for cid, dims in by_c.items():
            cents[cid] = [dims[p] for p in sorted(dims)]
    return _centroid_df(spark, cents)


def ivf_assignments(
    emb: DataFrame, k: int = IVF_K, cents: DataFrame | None = None
) -> DataFrame:
    """(vec_id, embedding, nrm, centroid_id): nearest-centroid assignment
    against trained k-means centroids (``train_ivf_centroids``); pass
    ``cents`` to reuse already-trained centroids."""
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    if cents is None:
        cents = train_ivf_centroids(emb, k)
    return _assign_to_centroids(e, cents)


def ivf_ann_topk(
    emb: DataFrame,
    query_filter: F.Column,
    k: int = 10,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: candidates = vectors in the query's nprobe nearest
    centroid lists (inverted-file decomposition), probed against k-means
    centroids from ``train_ivf_centroids``. At 100 TB: train once, write
    the corpus partitioned by centroid_id once; each query scans nprobe
    partitions — partition pruning instead of a full pass. Emitted
    cosines are exact; only candidate generation is approximate.

    No ``.cache()`` anywhere: the query side reads raw embeddings (it
    never needs a centroid id), so the assignment table is consumed by
    exactly one plan subtree and caching it would only pin corpus-sized
    blocks for the session (the round-2 leak).
    """
    if cents is None:
        cents = train_ivf_centroids(emb, n_centroids)
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    assigned = _assign_to_centroids(e, cents)
    q = e.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    )
    # nprobe best centroids per query (k × |q| rows — small)
    q_cents = q.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos", dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    probes = (
        q_cents.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "q_emb", "q_norm", "centroid_id")
    )
    a = assigned.alias("a")
    p = probes.alias("p")
    cand = a.join(
        F.broadcast(p),
        (F.col("a.centroid_id") == F.col("p.centroid_id"))
        & (F.col("p.query_id") != F.col("a.vec_id")),
    ).select(
        F.col("p.query_id").alias("query_id"),
        F.col("p.q_emb").alias("q_emb"),
        F.col("p.q_norm").alias("q_norm"),
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.embedding").alias("embedding"),
        F.col("a.nrm").alias("nrm"),
    )
    scored = cand.withColumn("cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("nrm")))
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def label_lsh_neardup(emb: DataFrame, threshold: float = 0.9, dim: int = 64) -> DataFrame:
    """Scale path for near-dup pairs: block by (label, band, bucket).

    ``label_blocked_neardup`` is exact but per-label O(n²) — label
    cardinality is fixed, so blocks grow linearly with data and pair work
    grows quadratically. Sub-blocking each label by the banded hyperplane
    LSH bounds the join to same-bucket collisions (equi-join on
    (label, band, bucket)); recall follows the LSH collision probability
    (1-(1-p^r)^b, p = 1-θ/π) and is measured against the exact operator
    in tests/test_similarity.py. Output is a SUBSET of the exact pairs —
    every emitted cosine is exact; only candidate generation is
    approximate.
    """
    with_buckets = emb.withColumn("bkts", _band_buckets_expr("embedding", dim)).withColumn(
        "nrm", l2_norm("embedding")
    )
    exploded = with_buckets.select(
        "vec_id", "label", "embedding", "nrm", F.posexplode("bkts").alias("band", "bucket")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("emb_a"),
            F.col("b.embedding").alias("emb_b"),
            (F.col("a.nrm") * F.col("b.nrm")).alias("nrm_prod"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        cand.withColumn("cos", dot("emb_a", "emb_b") / F.col("nrm_prod"))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def _label_pairs_cos_kernel(threshold: float):
    """Arrow-batch kernel factory for label-blocked near-dup pairing:
    buffer the task's (vec_id, label, embedding, nrm) rows (blocks are
    co-located by the upstream label repartition), then per label
    compute all pairwise cosines with numpy elementwise ops
    accumulated one dimension at a time — the ``dot`` expression
    fold's left-to-right order — so the EMITTED cos doubles are
    bit-identical to the self-join form (this entry's cos is part of
    the oracle-hashed output). 1024-row blocks bound the cos matrix;
    a block past PAIR_BLOCK_ROW_CAP rows fails loudly instead of
    OOM-ing the task (r18 guard); NULL labels are skipped, matching
    the SQL null-equality semantics of the a.label == b.label join
    this kernel replaced (ADVICE r17)."""

    cap = PAIR_BLOCK_ROW_CAP

    def pairs_fn(it):
        import numpy as np
        import pyarrow as pa

        by_label: dict[str, list] = {}
        for batch in it:
            if batch.num_rows == 0:
                continue
            labels = batch.column("label").to_pylist()
            ids = batch.column("vec_id").to_numpy()
            nrms = batch.column("nrm").to_numpy()
            embs = np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            for lab in set(labels):
                if lab is None:
                    continue  # SQL equality never matches NULL labels
                sel = np.array([x == lab for x in labels])
                by_label.setdefault(lab, []).append(
                    (ids[sel], embs[sel], nrms[sel])
                )
        for lab, chunks in by_label.items():
            ids = np.concatenate([c[0] for c in chunks]).astype(np.int64)
            x = np.vstack([c[1] for c in chunks])
            nrm = np.concatenate([c[2] for c in chunks])
            n, dim = x.shape
            if n > cap:
                raise ValueError(
                    f"label_blocked_neardup: label {lab!r} has {n} rows "
                    f"(> PAIR_BLOCK_ROW_CAP={cap}) — a "
                    "block this hot must be split (finer blocking key) "
                    "rather than buffered in one task"
                )
            if n < 2:
                continue
            for lo in range(0, n, 1024):
                hi = min(lo + 1024, n)
                acc = np.zeros((hi - lo, n))
                for i in range(dim):  # sequential: matches the fold
                    acc = acc + x[lo:hi, i : i + 1] * x[:, i]
                cos = acc / (nrm[lo:hi, None] * nrm[None, :])
                ai, bi = np.nonzero(
                    (cos >= threshold) & (ids[lo:hi, None] < ids[None, :])
                )
                if ai.size == 0:
                    continue
                yield pa.record_batch(
                    [
                        pa.array(ids[lo + ai]),
                        pa.array(ids[bi]),
                        pa.array(cos[ai, bi]),
                    ],
                    names=["vec_a", "vec_b", "cos"],
                )

    return pairs_fn


def label_blocked_neardup(emb: DataFrame, threshold: float = 0.9) -> DataFrame:
    """(vec_a, vec_b, cos) pairs with cosine ≥ threshold, blocked by label
    (IVF-style coarse partition: per-block O(n²) instead of global).
    Exact baseline; ``label_lsh_neardup`` is the 100 TB path.

    r17 opt (guide §4.2, the SemDeDup-kernel pattern): the self-join
    form materialized O(n_block²) pair rows and paid an interpreted
    cosine fold per pair; one label repartition + one Arrow hop now
    scores each block with order-matched numpy accumulation —
    bit-identical cos values (DuckDB oracle hash-matched), 2.4 s →
    ~0.6 s warm at sf0.1."""
    e = emb.select("vec_id", "label", "embedding").withColumn(
        "nrm", l2_norm("embedding")
    )
    return e.repartition("label").mapInArrow(
        _label_pairs_cos_kernel(threshold),
        "vec_a bigint, vec_b bigint, cos double",
    )


def label_centroids(emb: DataFrame) -> DataFrame:
    """(label, pos, mean_val, n_vectors): per-label mean embedding in
    long format (one row per dimension).

    posexplode → groupBy(label, pos) is ONE shuffle whose key count is
    |labels| × dim — thousands of groups regardless of corpus size, so
    partial aggregation collapses the exploded stream map-side and the
    exchange carries only the group table. The long format is the
    join-ready shape for per-dimension analytics (variance, whitening,
    per-class probes); reassembly to arrays is a collect_list away
    (see train_ivf_centroids for that pattern).
    """
    dims = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return dims.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 4).alias("mean_val"),
        F.count("*").alias("n_vectors"),
    ).select("label", F.col("pos").cast("bigint").alias("pos"), "mean_val", "n_vectors")


def quantize_embeddings_int8(emb: DataFrame) -> DataFrame:
    """(vec_id, scale, q_codes): symmetric per-vector int8 quantization —
    q[i] = round(x[i] * 127 / max_abs), scale = max_abs / 127 — cutting
    the 100 TB embedding store 4x (float32 -> int8) while keeping
    dot-product search usable (dequant: q[i] * scale; recall contract
    in tests/test_similarity.py).

    Zero-shuffle projection: max_abs and the code array are array HOFs
    over the embedding column; all arithmetic is double-precision IEEE,
    so an external engine computes bit-identical codes (the oracle
    does). Codes ship as a comma-joined string so the cross-engine
    value hash is representation-stable."""
    x = F.transform("embedding", lambda v: v.cast("double"))
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v)))
    safe = F.when(max_abs > 0, max_abs).otherwise(F.lit(1.0))
    codes = F.transform(x, lambda v: F.round(v * 127.0 / safe).cast("int"))
    return emb.select(
        "vec_id",
        F.round(safe / 127.0, 10).alias("scale"),
        F.array_join(F.transform(codes, lambda c: c.cast("string")), ",").alias(
            "q_codes"
        ),
    )


def _gemm_shortlist_fn(q_payload, m):
    """Arrow-batch kernel factory for the two-stage coarse pass: score
    every candidate row in the batch against the captured query-code
    matrix with ONE int64 GEMM and emit each query's per-batch top-m
    (approx DESC, vec_id ASC). Integer-valued dots make the float64
    result order-independent (exact), so this is bit-identical to the
    per-pair fold it replaces; per-batch top-m is a superset of every
    query's global top-m, which the downstream window finalizes.
    ``q_payload`` is either the (q_ids, q_mat, q_scales) tuple riding
    the closure (small batches) or a Broadcast of it (one transfer per
    executor when |Q| ≥ GEMM_BROADCAST_MIN_Q — VERDICT r17 task 2).
    numpy/pyarrow imports live in the closure so executors resolve
    them at first call (guide §4.5: heavy init once per task)."""

    def score(it):
        import numpy as np
        import pyarrow as pa

        payload = q_payload.value if hasattr(q_payload, "value") else q_payload
        q_ids, q_mat, q_scales = payload
        for batch in it:
            if batch.num_rows == 0:
                continue
            vec_ids = batch.column("vec_id").to_numpy()
            scales = batch.column("scale").to_numpy()
            c_mat = np.stack(
                batch.column("codes").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            dots = c_mat @ q_mat.T  # (n, |Q|) int64 — exact
            approx = (dots.astype(np.float64) * scales[:, None]) * q_scales[
                None, :
            ]
            out_q, out_v, out_a = [], [], []
            for j in range(len(q_ids)):
                col = approx[:, j]
                idx = np.nonzero(vec_ids != q_ids[j])[0]
                if idx.size == 0:
                    continue
                order = np.lexsort((vec_ids[idx], -col[idx]))[:m]
                sel = idx[order]
                out_q.append(np.full(sel.size, q_ids[j], dtype=np.int64))
                out_v.append(vec_ids[sel].astype(np.int64))
                out_a.append(col[sel])
            if not out_q:
                continue
            yield pa.record_batch(
                [
                    pa.array(np.concatenate(out_q)),
                    pa.array(np.concatenate(out_v)),
                    pa.array(np.concatenate(out_a)),
                ],
                names=["query_id", "vec_id", "approx"],
            )

    return score


def two_stage_topk(
    emb: DataFrame, query_filter: F.Column, k: int = 10, overfetch: int = 4
) -> DataFrame:
    """(query_id, vec_id, cos, rank): exact top-k by two-stage retrieval —
    stage 1 scores EVERY candidate against the int8-quantized store
    (symmetric per-vector quantization, as quantize_embeddings_int8)
    and keeps a k*overfetch shortlist per query; stage 2 fetches full-
    precision vectors ONLY for the shortlist and re-ranks by exact
    cosine. The classic coarse-then-fine serving shape: at 100 TB the
    first pass streams the 4x-smaller code store (broadcast queries, no
    corpus shuffle), and the expensive full-vector reads touch
    |Q| * k * overfetch rows instead of the corpus.

    Fully deterministic, hence SQL-oracle-able: integer code dots are
    exact in doubles (|code| <= 127, so any 64-dim dot < 2^21), scales
    are rounded to 10 dp, and both rankings break ties by vec_id.
    Top-k equals brute force whenever the true k-th neighbor survives
    the quantized shortlist — the recall contract in
    tests/test_similarity.py pins equality at the default overfetch.

    r17 opt (guide §4.2): stage 1 is an Arrow GEMM, not a pair join.
    The old form broadcast the query batch into an inequality join
    (BroadcastNestedLoopJoin materializing |corpus| x |Q| pair rows)
    and folded each dot with zip_with+aggregate — ArrayAggregate is
    CodegenFallback, so every pair paid an interpreted fold plus a
    zipped-array allocation. Now the code store crosses the Arrow
    boundary ONCE per partition (vec_id, codes, scale — only the
    columns the kernel needs) and one int64 matrix multiply scores
    every (candidate, query) pair, keeping the per-partition
    k*overfetch shortlist per query; the global window then ranks
    n_partitions * |Q| * k*overfetch candidate rows instead of
    |corpus| * |Q| pair rows. Bit-identical by construction: code dots
    are integer-valued (|code| <= 127, dim-bounded sums << 2^53), so
    any summation order yields the same double; the approx expression
    applies the same left-associated (dot * scale) * q_scale IEEE ops;
    per-partition top-m under the total order (approx DESC, vec_id
    ASC) is an exact decomposition of the global top-m. Measured at
    sf0.1/local[32]: 2.62 s -> 1.57 s warm, rows identical. The query
    batch is collected at build (|corpus|/50 rows of driver metadata —
    the bounded-collect class EAGER_BUILD_OK enumerates for the IVF
    probe selection), REFUSED loudly past QUERY_BATCH_CAP, and shipped
    as a broadcast instead of a task-closure capture once |Q| ≥
    GEMM_BROADCAST_MIN_Q (r18, VERDICT r17 task 2)."""
    import numpy as np

    codes, scale = _int8_code_exprs()
    qz = emb.select("vec_id", codes.alias("codes"), scale.alias("scale"))
    qrows = _collect_query_batch(qz.filter(query_filter), "two_stage_topk")
    if not qrows:
        return emb.sparkSession.createDataFrame(
            [], "query_id bigint, vec_id bigint, cos double, rank int"
        )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["codes"] for r in qrows], dtype=np.int64)
    q_scales = np.array([r["scale"] for r in qrows], dtype=np.float64)
    payload = (q_ids, q_mat, q_scales)
    if len(qrows) >= GEMM_BROADCAST_MIN_Q:
        payload = emb.sparkSession.sparkContext.broadcast(payload)
    m = k * overfetch
    score = _gemm_shortlist_fn(payload, m)
    cand = qz.mapInArrow(score, "query_id long, vec_id long, approx double")
    w1 = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    shortlist = (
        cand.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= m)
        .select("query_id", "vec_id")
    )
    qe = emb.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
    )
    ce = emb.select("vec_id", "embedding", l2_norm("embedding").alias("c_norm"))
    re = (
        F.broadcast(shortlist).join(ce, "vec_id")
        .join(F.broadcast(qe), "query_id")
        .withColumn("cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("c_norm")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        re.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def two_stage_ivf_topk(
    emb: DataFrame,
    query_filter: F.Column,
    k: int = 10,
    overfetch: int = 4,
    n_centroids: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): the 100 TB serving shape — IVF
    partition pruning composed with two-stage quantized retrieval.
    Stage 0 picks each query's nprobe nearest k-means centroids
    (``train_ivf_centroids``); stage 1 hash-equi-joins the int8 code
    store against broadcast (query, probed-centroid) pairs on
    centroid_id, so dot products are computed ONLY for vectors in
    probed lists — O(sum of probed list sizes) coarse compute instead
    of ``two_stage_topk``'s O(|corpus|*|Q|); stage 2 fetches
    full-precision vectors only for the k*overfetch shortlist and
    re-ranks by exact cosine. In-plan, the equi-join still SCANS the
    whole code store (one O(1) hash probe per row); skipping the scan
    too is a LAYOUT property — write the codes once partitioned by
    centroid_id (``write_ivf_index`` / ``two_stage_ivf_topk_indexed``)
    and stage 1 becomes nprobe partition-pruned scans per query batch.

    Candidate generation inherits IVF's approximation (a true neighbor
    outside the probed lists is unreachable), so this is rows-only at
    the gate; the recall-floor contract vs brute force lives in
    tests/test_similarity.py, and nprobe = n_centroids degenerates to
    ``two_stage_topk``'s exact shortlist."""
    if cents is None:
        cents = train_ivf_centroids(emb, n_centroids)
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    assigned = _assign_to_centroids(e, cents)
    codes, scale = _int8_code_exprs()
    qz = assigned.select(
        "vec_id", "centroid_id", codes.alias("codes"), scale.alias("scale")
    )
    q = e.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_norm"),
    )
    q_cents = q.crossJoin(F.broadcast(cents)).withColumn(
        "c_cos", dot("q_emb", "c_emb") / (F.col("q_norm") * F.col("c_nrm"))
    )
    w0 = Window.partitionBy("query_id").orderBy(F.desc("c_cos"), F.asc("centroid_id"))
    probes = (
        q_cents.withColumn("rk", F.row_number().over(w0))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "centroid_id")
    )
    # (query_id, centroid_id, q_codes, q_scale): |Q| * nprobe rows, each
    # carrying its query's codes — broadcast-sized. Joining THIS on
    # centroid_id is a hash equi-join: every corpus row does one O(1)
    # hash probe and rows in unprobed centroids drop at the join. (The
    # previous shape — array_contains(probe_set, centroid_id) — was a
    # broadcast nested-loop join evaluating every (vector, query) pair:
    # full-corpus compute, and measured 2x SLOWER than the exhaustive
    # two_stage_topk.) Each vector has exactly one centroid and each
    # query probes distinct centroids, so no (query, vec) pair repeats.
    probe_q = probes.join(
        qz.select(
            F.col("vec_id").alias("query_id"),
            F.col("codes").alias("q_codes"),
            F.col("scale").alias("q_scale"),
        ),
        "query_id",
    )
    dotint = F.aggregate(
        F.zip_with("codes", "q_codes", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    s1 = (
        qz.join(F.broadcast(probe_q), "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("approx", dotint.cast("double") * F.col("scale") * F.col("q_scale"))
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    shortlist = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k * overfetch)
        .select("query_id", "vec_id")
    )
    ce = emb.select("vec_id", "embedding", l2_norm("embedding").alias("c_norm"))
    re = (
        F.broadcast(shortlist).join(ce, "vec_id")
        .join(
            F.broadcast(q.select("query_id", "q_emb", "q_norm")), "query_id"
        )
        .withColumn(
            "cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("c_norm"))
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        re.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _int8_code_exprs() -> tuple[F.Column, F.Column]:
    """(codes, scale) column exprs for symmetric per-vector int8
    quantization of ``embedding`` — the single definition shared by
    ``two_stage_topk`` / ``two_stage_ivf_topk`` / ``write_ivf_index``
    so the in-plan and persisted code stores are bit-identical."""
    x = F.transform("embedding", lambda v: v.cast("double"))
    max_abs = F.array_max(F.transform(x, lambda v: F.abs(v)))
    safe = F.when(max_abs > 0, max_abs).otherwise(F.lit(1.0))
    codes = F.transform(x, lambda v: F.round(v * 127.0 / safe).cast("long"))
    scale = F.round(safe / 127.0, 10)
    return codes, scale


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = IVF_K,
    cents: DataFrame | None = None,
) -> DataFrame:
    """Persist the IVF serving artifact: the int8 code store written
    ONCE, partitioned by centroid_id (``<path>/codes``), plus the
    trained centroid table (``<path>/centroids``). Returns the
    centroids. This is the index-build half of the 100 TB serving
    split: build amortizes over every future query batch, and the
    partitioned layout is what turns nprobe from a join-time filter
    into genuine file-level partition pruning (see
    ``two_stage_ivf_topk_indexed``)."""
    if cents is None:
        cents = train_ivf_centroids(emb, n_centroids)
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    assigned = _assign_to_centroids(e, cents)
    codes, scale = _int8_code_exprs()
    store = assigned.select(
        "vec_id", codes.alias("codes"), scale.alias("scale"), "centroid_id"
    )
    store.write.mode("overwrite").partitionBy("centroid_id").parquet(path + "/codes")
    cents.write.mode("overwrite").parquet(path + "/centroids")
    return cents


def two_stage_ivf_topk_indexed(
    emb: DataFrame,
    index_path: str,
    query_filter: F.Column,
    k: int = 10,
    overfetch: int = 4,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Serving-only twin of ``two_stage_ivf_topk``: stage 1 reads the
    persisted centroid_id-partitioned code store from
    ``write_ivf_index`` instead of quantizing in-plan, and the probed
    centroid ids are applied as an ``isin`` partition filter BEFORE the
    join — so the scan itself prunes to nprobe partitions per query
    batch (``PartitionFilters`` in the plan), the real 100 TB shape.
    The probed-id list is |Q| * nprobe ints of driver metadata, same
    class as the centroids themselves. Query codes are recomputed from
    the raw query vectors (the quantization is a deterministic
    projection — ``_int8_code_exprs``), avoiding a full code-store scan
    just to fetch |Q| rows. Results are identical to the inline
    operator given the same centroids (contract in
    tests/test_similarity.py)."""
    spark = emb.sparkSession
    cents = read_parquet(spark, index_path + "/centroids")
    store = read_parquet(spark, index_path + "/codes")
    q = emb.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm("embedding").alias("q_norm"),
    )
    # Probe selection on the DRIVER (r17 opt — the ivfpq_probe_table
    # discipline applied here): queries and the k-row centroid table
    # are both bounded metadata, and the old crossJoin+window probes
    # subplan was referenced TWICE (the probed-ids collect AND the
    # probe_q join re-expanded it in the final plan). The sequential
    # _seq_dot fold + math.sqrt replicate l2_norm/dot bit-for-bit, so
    # the (-cos, centroid_id) sort selects exactly the rows the
    # row_number window did. Saves one crossJoin+window job and the
    # in-plan re-expansion (~0.68 s of the 2.28 s warm wall at sf0.1).
    import math

    qrows = _collect_query_batch(
        emb.filter(query_filter).select("vec_id", "embedding"),
        "two_stage_ivf_topk_indexed probe selection",
    )
    crows = [
        (int(c.centroid_id), [float(v) for v in c.c_emb], float(c.c_nrm))
        for c in cents.collect()
    ]
    probe_pairs = []
    for r in qrows:
        qe = [float(v) for v in r["embedding"]]
        qn = math.sqrt(_seq_dot(qe, qe))
        # Zero-norm guard (ADVICE r17): the replaced Spark expression
        # degraded to NaN/Inf cosines and completed; Python would raise
        # ZeroDivisionError and sorted() has no NaN order. Score such
        # rows -inf (never probed / probes the lowest centroid ids
        # deterministically) instead of crashing the build.
        scored = sorted(
            (
                -(_seq_dot(qe, ce) / (qn * cn)) if qn * cn != 0 else math.inf,
                cid,
            )
            for cid, ce, cn in crows
        )[:nprobe]
        probe_pairs.extend((r["vec_id"], cid) for _, cid in scored)
    probes = spark.createDataFrame(
        probe_pairs, "query_id BIGINT, centroid_id INT"
    )
    probed_ids = sorted({cid for _, cid in probe_pairs})
    codes, scale = _int8_code_exprs()
    probe_q = probes.join(
        emb.filter(query_filter).select(
            F.col("vec_id").alias("query_id"),
            codes.alias("q_codes"),
            scale.alias("q_scale"),
        ),
        "query_id",
    )
    dotint = F.aggregate(
        F.zip_with("codes", "q_codes", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    s1 = (
        store.filter(F.col("centroid_id").isin(probed_ids))
        .join(F.broadcast(probe_q), "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("approx", dotint.cast("double") * F.col("scale") * F.col("q_scale"))
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    shortlist = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k * overfetch)
        .select("query_id", "vec_id")
    )
    ce = emb.select("vec_id", "embedding", l2_norm("embedding").alias("c_norm"))
    re = (
        F.broadcast(shortlist).join(ce, "vec_id")
        .join(F.broadcast(q.select("query_id", "q_emb", "q_norm")), "query_id")
        .withColumn(
            "cos", dot("q_emb", "embedding") / (F.col("q_norm") * F.col("c_norm"))
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        re.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


SEMDEDUP_THRESHOLD = 0.95


def _semdedup_pairs_kernel(threshold: float):
    """Arrow-batch kernel factory for SemDeDup's within-cluster pair
    generation: buffer the task's (vec_id, embedding, nrm,
    centroid_id) rows (clusters are co-located by the upstream
    centroid_id repartition and partition-sized by design), then per
    cluster compute all pairwise cosines with numpy elementwise ops
    accumulated one dimension at a time — the same left-to-right
    order as the ``dot`` expression fold, so emitted pairs are
    bit-identical to the self-join form. Rows are processed in
    1024-row blocks so the cos matrix stays bounded at block ×
    cluster size; a cluster past PAIR_BLOCK_ROW_CAP rows fails loudly
    instead of OOM-ing the task (r18 guard — at scale, raise
    n_centroids so clusters stay partition-sized, the paper's own
    remedy)."""

    cap = PAIR_BLOCK_ROW_CAP

    def pairs_fn(it):
        import numpy as np
        import pyarrow as pa

        by_cid: dict[int, list] = {}
        for batch in it:
            if batch.num_rows == 0:
                continue
            cids = batch.column("centroid_id").to_numpy()
            ids = batch.column("vec_id").to_numpy()
            nrms = batch.column("nrm").to_numpy()
            embs = np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            for cid in np.unique(cids):
                sel = cids == cid
                by_cid.setdefault(int(cid), []).append(
                    (ids[sel], embs[sel], nrms[sel])
                )
        for cid, chunks in by_cid.items():
            ids = np.concatenate([c[0] for c in chunks]).astype(np.int64)
            x = np.vstack([c[1] for c in chunks])
            nrm = np.concatenate([c[2] for c in chunks])
            n, dim = x.shape
            if n > cap:
                raise ValueError(
                    f"semantic_dedup: cluster {cid} has {n} rows "
                    f"(> PAIR_BLOCK_ROW_CAP={cap}) — "
                    "raise n_centroids so clusters stay partition-sized"
                )
            if n < 2:
                continue
            for lo in range(0, n, 1024):
                hi = min(lo + 1024, n)
                acc = np.zeros((hi - lo, n))
                for i in range(dim):  # sequential: matches the fold
                    acc = acc + x[lo:hi, i : i + 1] * x[:, i]
                cos = acc / (nrm[lo:hi, None] * nrm[None, :])
                ai, bi = np.nonzero(
                    (cos >= threshold) & (ids[lo:hi, None] < ids[None, :])
                )
                if ai.size == 0:
                    continue
                yield pa.record_batch(
                    [pa.array(ids[lo + ai]), pa.array(ids[bi])],
                    names=["doc_a", "doc_b"],
                )

    return pairs_fn


def semantic_dedup(
    emb: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = IVF_K,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, keeper_id, keep): SemDeDup-style semantic deduplication
    (Abbas et al. 2023): cluster the embedding space with k-means, form
    near-duplicate pairs ONLY within each cluster (cosine >=
    threshold), resolve the pair graph by connected components, and
    keep one representative (min vec_id) per semantic-duplicate group.
    ``keep`` is true for keepers and for vectors with no near-dup.

    This is the embedding-space sibling of the MinHash document chain:
    candidate generation is cluster-blocked instead of band-blocked, so
    the pair join is per-cluster O(n_c^2) rather than corpus O(n^2) —
    at 100 TB you'd raise n_centroids so clusters stay partition-sized
    (the paper's setting does exactly this), and the component
    resolution reuses the same min-label propagation as document dedup.

    Approximate by construction (cross-cluster near-dups are
    unreachable, exactly like SemDeDup); contracts live in
    tests/test_similarity.py: within-cluster recall is exact, planted
    duplicate groups resolve to single keepers."""
    from .dedup import connected_components

    if cents is None:
        cents = train_ivf_centroids(emb, n_centroids)
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    assigned = _assign_to_centroids(e, cents).select(
        "vec_id", "embedding", "nrm", "centroid_id"
    )
    # Within-cluster pairing as ONE Arrow hop (r17 opt, guide §4.2):
    # the self-join form materialized O(n_c²) pair rows and paid an
    # interpreted 64-dim cosine fold per pair. Each cluster's rows are
    # co-located by the centroid_id repartition, and the kernel
    # accumulates the pair dots one dimension at a time (left to
    # right) so every cosine is bit-identical to the dot/l2_norm
    # expression fold — within-cluster recall contracts unchanged.
    pairs = assigned.repartition("centroid_id").mapInArrow(
        _semdedup_pairs_kernel(threshold), "doc_a bigint, doc_b bigint"
    )
    comps = connected_components(pairs)
    return (
        emb.select("vec_id")
        .join(
            comps.select(F.col("doc_id").alias("vec_id"), "cluster_id"),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).cast("bigint").alias("keeper_id"),
            (
                F.col("cluster_id").isNull()
                | (F.col("cluster_id") == F.col("vec_id"))
            ).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al., "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011 — PAPERS.md): split the embedding into
# PQ_M subspaces, k-means each subspace independently, store each
# vector as M one-byte codes. The compressed store is dim*4/M-fold
# smaller than float32 (64-dim float32, 256 B → 8 bytes here), and queries
# score candidates WITHOUT touching raw vectors via asymmetric
# distance computation (ADC): cos(q, x) ≈ Σ_s q_s · c_{s, code_s(x)}
# on unit-normalized vectors. The standard billion-scale ANN layout
# (FAISS IVFPQ's fine quantizer), complementing the int8 store
# (4x, per-vector) and the IVF partitioner (scan pruning).

PQ_M = 8  # subspaces
PQ_K = 32  # codes per subspace (codebook rows)
PQ_TRAIN_ITERS = 3  # Lloyd rounds per subspace
PQ_SHORTLIST = 80  # ADC shortlist size fed to exact re-rank (fixed per
# query regardless of corpus size — |Q| * 80 full-vector reads)


def _normalized(emb: DataFrame) -> DataFrame:
    """(vec_id, nemb): unit-L2 embeddings (zero vectors pass through) —
    PQ for cosine quantizes the normalized vectors so subspace dots sum
    to the cosine."""
    nrm = l2_norm("embedding")
    safe = F.when(nrm > 0, nrm).otherwise(F.lit(1.0))
    # safe lambda-BOUND (r17 opt): referenced from inside the transform
    # lambda it was re-evaluated per ELEMENT — dim × the l2_norm fold
    # per row (1.25 s -> ~0.1 s for this projection at sf0.1); same
    # divisions, identical values.
    nemb = F.transform(
        F.array(safe),
        lambda s: F.transform("embedding", lambda v: v.cast("double") / s),
    )[0]
    return emb.select("vec_id", nemb.alias("nemb"))


def _book_lit(book: list[list[float]]) -> F.Column:
    """k x subdim codebook as a nested array literal (metadata-sized:
    codebooks ride into the plan, no join needed)."""
    return F.array(
        *[F.array(*[F.lit(float(v)) for v in cent]) for cent in book]
    )


def _sq_dist(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sub_slice(col: str, s: int, subdim: int) -> F.Column:
    return F.slice(col, s * subdim + 1, subdim)


def _code_expr(book: list[list[float]], sub: F.Column) -> F.Column:
    """argmin_j ||sub - book[j]||²; first (lowest) code wins ties —
    deterministic, and array_position's exact double compare is safe
    because the needle comes from the same computed array.

    Both the subvector and the distance array are lambda-BOUND (r17
    opt): ``sub`` was re-sliced per codebook entry and ``dists`` —
    the whole k×subdim distance computation — was evaluated TWICE
    (array_position + array_min; HOF projections are CodegenFallback,
    so no codegen CSE). Same expressions, same order, identical
    codes."""
    return F.transform(
        F.array(sub),
        lambda s: F.transform(
            F.array(F.transform(_book_lit(book), lambda c: _sq_dist(c, s))),
            lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
        )[0],
    )[0]


def train_pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_TRAIN_ITERS,
) -> list[list[list[float]]]:
    """codebooks[sub][code] = subdim-float centroid.

    Each Lloyd round is ONE corpus pass for ALL subspaces: every vector
    emits (sub, code, pos, val) rows via a struct-array explode, and the
    per-(sub, code, pos) means — m*k*subdim rows, metadata by
    definition — come back to the driver (the train_ivf_centroids
    discipline: small model state lives driver-side, truncating lineage
    so training costs iters+1 passes). Seeds are the first k vectors'
    subslices (deterministic); 6-dp-rounded means keep assignments
    rerun-stable; an empty code keeps its previous centroid."""
    e = _normalized(emb)
    dim = len(e.select("nemb").first()["nemb"])
    subdim = dim // m
    seeds = e.orderBy("vec_id").limit(k).collect()
    books = [
        [[float(v) for v in r["nemb"][s * subdim : (s + 1) * subdim]] for r in seeds]
        for s in range(m)
    ]
    for _ in range(iters):
        per_sub = F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    _code_expr(books[s], _sub_slice("nemb", s, subdim)).alias("code"),
                    _sub_slice("nemb", s, subdim).alias("sv"),
                )
                for s in range(m)
            ]
        )
        means = (
            e.select(F.explode(per_sub).alias("x"))
            .select("x.sub", "x.code", F.posexplode("x.sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.round(F.avg("val"), 6).alias("mv"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            upd.setdefault((r.sub, r.code), {})[r.pos] = float(r.mv)
        for (s, c), dims in upd.items():
            books[s][c] = [dims[p] for p in sorted(dims)]
    return books


def _pq_encode_kernel(books: list[list[list[float]]]):
    """Arrow-batch PQ encoder factory: normalize + per-subspace argmin
    with numpy elementwise ops whose ACCUMULATION ORDER replicates the
    expression folds exactly — the norm and each ||sub - c||² accumulate
    one dimension at a time, left to right, so every double is
    bit-identical to the l2_norm/_sq_dist expression path, and
    np.argmin's first-minimum matches array_position(array_min).
    Codebooks are plain Python lists captured in the closure (no
    collect; the builder stays plan-only)."""
    m = len(books)
    subdim = len(books[0][0])

    def encode(it):
        import numpy as np
        import pyarrow as pa

        cbooks = [np.array(books[s], dtype=np.float64) for s in range(m)]
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            vec_ids = batch.column("vec_id").to_numpy()
            x = np.stack(
                batch.column("embedding").to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            acc = np.zeros(n)
            for i in range(x.shape[1]):  # sequential: matches the fold
                acc = acc + x[:, i] * x[:, i]
            nrm = np.sqrt(acc)
            safe = np.where(nrm > 0, nrm, 1.0)
            xn = x / safe[:, None]
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                xs = xn[:, s * subdim : (s + 1) * subdim]
                cs = cbooks[s]
                d = np.zeros((n, cs.shape[0]))
                for i in range(subdim):  # sequential: matches _sq_dist
                    diff = xs[:, i : i + 1] - cs[None, :, i]
                    d = d + diff * diff
                codes[:, s] = np.argmin(d, axis=1)
            offsets = pa.array(
                np.arange(0, (n + 1) * m, m, dtype=np.int32)
            )
            flat = pa.array(codes.reshape(-1), type=pa.int32())
            yield pa.record_batch(
                [
                    pa.array(vec_ids.astype(np.int64)),
                    pa.ListArray.from_arrays(offsets, flat),
                ],
                names=["vec_id", "codes"],
            )

    return encode


def pq_encode(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes): the PQ code store — array of m small ints per
    vector, encoded by the Arrow numpy kernel (``_pq_encode_kernel``).

    r17 opt (guide §4.2): the expression form ran m×k interpreted
    ``_sq_dist`` folds per vector (HOFs are CodegenFallback) —
    2.7 s for 2,000 vectors at sf0.1; the vectorized kernel encodes
    the same batch in milliseconds with bit-identical codes (order-
    matched accumulation; Python-replica and twin tests pin it). Only
    (vec_id, embedding) cross the Arrow boundary. The expression form
    remains in ``_code_expr`` for the training loop's in-plan use."""
    return emb.select("vec_id", "embedding").mapInArrow(
        _pq_encode_kernel(books), "vec_id bigint, codes array<int>"
    )


def pq_adc_scores(
    emb: DataFrame,
    query_filter: F.Column,
    books: list[list[list[float]]],
) -> DataFrame:
    """(query_id, vec_id, codes, adc): stage-1 ADC scores — each code
    row against each broadcast query, score = Σ_s q_s · c_{s, code_s}
    via element_at into the codebook literals. Split out of pq_topk so
    the expression has its own python-replica contract in
    tests/test_similarity.py."""
    m = len(books)
    subdim = len(books[0][0])
    e = _normalized(emb)
    codes_df = pq_encode(emb, books)
    # The ADC lookup-table trick: materialize lut[s][j] = q_s · c_{s,j}
    # ONCE per query row (|Q| * m * k values on the broadcast side), so
    # the per-(vector, query) expression is m array lookups + adds —
    # the codebook literals and the dot folds never run in the pair
    # loop. Same arithmetic, same fold order, bit-identical scores.
    # NB: the HOF lambda must stay single-argument — pyspark treats a
    # second parameter as the element INDEX. The loop variable binds
    # eagerly because F.transform evaluates the lambda at expression
    # build time.
    lut = F.array(
        *[
            F.transform(
                _book_lit(books[s]),
                lambda c: F.aggregate(
                    F.zip_with(
                        _sub_slice("q_nemb", s, subdim), c, lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
            )
            for s in range(m)
        ]
    )
    q = e.filter(query_filter).select(
        F.col("vec_id").alias("query_id"),
        F.col("nemb").alias("q_nemb"),
        lut.alias("lut"),
    )
    adc = F.lit(0.0)
    for s in range(m):
        adc = adc + F.element_at(
            F.col("lut")[s], F.col("codes")[s] + 1
        )
    return codes_df.join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    ).withColumn("adc", adc)


def pq_topk(
    emb: DataFrame,
    query_filter: F.Column,
    k: int = 10,
    shortlist_n: int = PQ_SHORTLIST,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): PQ-ADC retrieval — stage 1 scores
    the m-byte code store against broadcast queries with the ADC
    expression Σ_s q_s · c_{s, code_s} (codebook literals, element_at
    by runtime code — no raw-vector reads, the stream side is the
    maximally-compressed store); stage 2 re-ranks the shortlist by
    exact cosine on full vectors (|Q| * shortlist_n rows only).
    Approximate where the true neighbor's ADC score falls off the
    shortlist — recall floor pinned in tests/test_similarity.py."""
    if books is None:
        books = train_pq_codebooks(emb)
    e = _normalized(emb)
    s1 = pq_adc_scores(emb, query_filter, books)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    short = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= shortlist_n)
        .select("query_id", "vec_id")
    )
    qn = e.filter(query_filter).select(
        F.col("vec_id").alias("query_id"), F.col("nemb").alias("qe")
    )
    # broadcast the query-batch-bounded shortlist so the corpus side
    # STREAMS (never shuffles/broadcasts) through the re-rank fetch
    re_rank = (
        F.broadcast(short).join(e, "vec_id")
        .join(F.broadcast(qn), "query_id")
        .withColumn("cos", dot("qe", "nemb"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        re_rank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    books: list[list[list[float]]],
    cents: DataFrame,
) -> None:
    """Persist the IVFPQ serving artifact (FAISS's IndexIVFPQ layout,
    Jégou et al. 2011): the PQ code store written ONCE, partitioned by
    coarse centroid_id (``<path>/codes``), plus the coarse centroid
    table (``<path>/centroids``). Composes the two index halves the
    repo already had separately — ``write_ivf_index``'s
    partition-pruned layout and ``write_pq_index``'s 32x-compressed
    codes — so serving scans only nprobe partitions of m-byte codes:
    at 100 TB neither a full-corpus raw scan NOR a full-corpus code
    scan remains.

    Codes come from ``pq_encode`` verbatim (bit-identical to the flat
    PQ store — the nprobe=all equality contract in
    tests/test_similarity.py depends on it); the vec_id equi-join with
    the coarse assignment is a build-time-only shuffle, amortized over
    every future query batch.

    ``<path>/vectors`` holds the NORMALIZED full vectors under the same
    centroid_id partitioning: the exact re-rank fetches its shortlist
    from probed partitions only, so serving never scans (or
    re-normalizes) the raw corpus table — every serving read is pruned
    to nprobe lists in both representations. Parquet round-trips
    doubles bit-exactly, so re-rank cosines from the stored ``nemb``
    equal live-normalized ones to the last ulp."""
    assigned = ivf_assignments(emb, cents=cents).select("vec_id", "centroid_id")
    store = pq_encode(emb, books).join(assigned, "vec_id")
    store.write.mode("overwrite").partitionBy("centroid_id").parquet(path + "/codes")
    vecs = _normalized(emb).join(assigned, "vec_id")
    vecs.write.mode("overwrite").partitionBy("centroid_id").parquet(path + "/vectors")
    cents.write.mode("overwrite").parquet(path + "/centroids")


def ivfpq_probe_table(
    spark,
    qrows: list,
    cent_rows: list,
    books: list[list[list[float]]],
    nprobe: int = IVF_NPROBE,
):
    """(probe DataFrame, probed centroid ids): stage 0 of IVFPQ serving,
    entirely driver-side metadata — for each normalized query row, its
    top-``nprobe`` coarse centroids by cosine (|q|=1, so cos = dot /
    c_nrm; ties to the lowest centroid_id) and its per-subspace ADC
    lookup table, as |Q| * nprobe rows. Callers serving a FIXED query
    batch should build this once and ``localCheckpoint`` it — the
    ~|Q| * m * k doubles otherwise re-cross the Py4J boundary on every
    request (measured ~1 s per call at even a 40-query batch)."""
    m = len(books)
    subdim = len(books[0][0])
    probe_rows = []
    for r in qrows:
        q_nemb = [float(v) for v in r["nemb"]]
        scored = sorted(
            (
                (
                    -(_seq_dot(q_nemb, [float(v) for v in c.c_emb]) / float(c.c_nrm)),
                    c.centroid_id,
                )
                for c in cent_rows
            ),
        )[:nprobe]
        lut = [
            [
                _seq_dot(q_nemb[s * subdim : (s + 1) * subdim], cent)
                for cent in books[s]
            ]
            for s in range(m)
        ]
        for _, cid in scored:
            probe_rows.append((r["vec_id"], int(cid), q_nemb, lut))
    probed_ids = sorted({cid for _, cid, _, _ in probe_rows})
    q = spark.createDataFrame(
        probe_rows,
        "query_id BIGINT, centroid_id INT, q_nemb ARRAY<DOUBLE>, "
        "lut ARRAY<ARRAY<DOUBLE>>",
    )
    return q, probed_ids


def ivfpq_topk(
    emb: DataFrame,
    index_path: str,
    query_filter: F.Column,
    books: list[list[list[float]]],
    k: int = 10,
    shortlist_n: int = PQ_SHORTLIST,
    nprobe: int = IVF_NPROBE,
    collected_queries: list | None = None,
    probe: tuple | None = None,
) -> DataFrame:
    """(query_id, vec_id, cos, rank): IVFPQ retrieval from the persisted
    index — the standard two-level billion-scale ANN serving path.

    Stage 0 (driver, metadata-sized): the broadcast-sized query batch
    picks its top-``nprobe`` coarse centroids by cosine (k x dim
    centroid table and |Q| queries are both driver metadata — the same
    class as the PQ lookup tables, computed with the same sequential
    fold as every other driver-side replica).
    Stage 1 (pruned ADC scan): the union of probed centroid ids is
    applied as an ``isin`` PARTITION filter on the code store — the
    scan itself reads only nprobe partitions per query batch
    (``PartitionFilters`` in the plan) — and the surviving m-byte codes
    hash-equi-join the broadcast (query, probe, lut) rows on
    centroid_id; ADC score = m array lookups per pair. The query
    vector rides along on the (already query-batch-sized) probe rows,
    so the shortlist leaves stage 1 carrying everything re-rank needs.
    Stage 2 (exact re-rank): the |Q| * shortlist_n shortlist — bounded
    by the query batch, never the corpus — is BROADCAST against the
    index's centroid-partitioned NORMALIZED vector store, itself pruned
    to the probed partitions (every shortlisted vec_id lives in a
    probed cell by construction). No serving stage scans or shuffles
    the corpus in any representation.

    With nprobe = all centroids this is value-identical to the flat
    ``pq_topk_indexed`` (every partition scanned, same ADC arithmetic,
    and the stored normalized vectors are parquet-round-tripped bits of
    the live-normalized ones — pinned in tests); with nprobe < k_coarse
    it is the approximate trade: vectors whose coarse cell the query
    does not probe are invisible (recall floor pinned in tests)."""
    spark = emb.sparkSession
    m = len(books)
    store = read_parquet(spark, index_path + "/codes")
    if probe is not None:
        q, probed_ids = probe
    else:
        cent_rows = sorted(
            spark.read.parquet(index_path + "/centroids").collect(),
            key=lambda r: r.centroid_id,
        )
        qrows = (
            collected_queries
            if collected_queries is not None
            else _normalized(emb).filter(query_filter).collect()
        )
        q, probed_ids = ivfpq_probe_table(spark, qrows, cent_rows, books, nprobe)
    adc = F.lit(0.0)
    for s in range(m):
        adc = adc + F.element_at(F.col("lut")[s], F.col("codes")[s] + 1)
    s1 = (
        store.filter(F.col("centroid_id").isin(probed_ids))
        .join(F.broadcast(q), "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("adc", adc)
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    short = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= shortlist_n)
        .select("query_id", "vec_id", F.col("q_nemb").alias("qe"))
    )
    vecs = read_parquet(spark, index_path + "/vectors").filter(
        F.col("centroid_id").isin(probed_ids)
    )
    re_rank = F.broadcast(short).join(vecs, "vec_id").withColumn(
        "cos", dot("qe", "nemb")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        re_rank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def _seq_dot(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot — matches the zip_with/aggregate
    expression's evaluation order exactly (no pairwise/SIMD
    re-association), so driver-computed LUTs are bit-identical to
    expression-computed ones."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def write_pq_index(
    emb: DataFrame, path: str, books: list[list[list[float]]]
) -> None:
    """Persist the PQ code store (vec_id, codes) as parquet — encoding
    runs ONCE at build time; serving then scans the m-codes-per-vector
    artifact (logically one byte per code) instead of re-encoding the
    corpus per query batch (the FAISS index-file equivalent). Codebooks
    are metadata the caller keeps (k*m*subdim floats)."""
    pq_encode(emb, books).write.mode("overwrite").parquet(path)


def pq_topk_indexed(
    emb: DataFrame,
    index_path: str,
    query_filter: F.Column,
    books: list[list[list[float]]],
    k: int = 10,
    shortlist_n: int = PQ_SHORTLIST,
    collected_queries: list | None = None,
) -> DataFrame:
    """pq_topk served from a persisted code store: stage 1 scans the
    parquet codes (ADC via per-query lookup tables), stage 2 re-ranks
    the shortlist against raw embeddings by vec_id equi-join. Value-
    identical to the inline path (tests/test_similarity.py pins it) —
    only where the codes come from differs."""
    spark = emb.sparkSession
    m = len(books)
    subdim = len(books[0][0])
    codes_df = read_parquet(spark, index_path)
    e = _normalized(emb)
    # The query batch is the BROADCAST side by contract (|Q| small), so
    # its ADC lookup tables are computed on the driver — |Q| * m * k
    # values with the SAME sequential fold as the expression path
    # (bit-identical scores, pinned by the indexed==inline test) —
    # instead of shipping the m*k*subdim codebook literals into the
    # plan, whose 2k-node expression tree dominated build+analysis
    # time. The corpus side still only ever sees m array lookups/row.
    # callers serving a fixed query batch repeatedly pass the rows in
    # (registry memoizes them) so repeat runs skip the collect job
    qrows = (
        collected_queries
        if collected_queries is not None
        else e.filter(query_filter).collect()
    )
    lut_rows = []
    for r in qrows:
        q_nemb = [float(v) for v in r["nemb"]]
        lut = [
            [
                _seq_dot(q_nemb[s * subdim : (s + 1) * subdim], cent)
                for cent in books[s]
            ]
            for s in range(m)
        ]
        lut_rows.append((r["vec_id"], q_nemb, lut))
    q = spark.createDataFrame(
        lut_rows,
        "query_id BIGINT, q_nemb ARRAY<DOUBLE>, lut ARRAY<ARRAY<DOUBLE>>",
    )
    adc = F.lit(0.0)
    for s in range(m):
        adc = adc + F.element_at(F.col("lut")[s], F.col("codes")[s] + 1)
    s1 = codes_df.join(
        F.broadcast(q.drop("q_nemb")), F.col("query_id") != F.col("vec_id")
    ).withColumn("adc", adc)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
    short = (
        s1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= shortlist_n)
        .select("query_id", "vec_id")
    )
    qn = q.select("query_id", F.col("q_nemb").alias("qe"))
    # broadcast the query-batch-bounded shortlist so the corpus side
    # STREAMS (never shuffles/broadcasts) through the re-rank fetch
    re_rank = (
        F.broadcast(short).join(e, "vec_id")
        .join(F.broadcast(qn), "query_id")
        .withColumn("cos", dot("qe", "nemb"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        re_rank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
