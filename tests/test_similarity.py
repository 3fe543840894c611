"""ANN-LSH contract tests: non-vacuous candidates + recall vs brute force.

The round-1 failure mode was an LSH whose buckets never collided (0 rows
→ unfalsifiable "pass"); these tests pin rows > 0 and a recall floor
against the exact baseline so that regression can't recur.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parallel_map_reduce_spark.operators import similarity as S
from parallel_map_reduce_spark.sources.catalog import load_table

K = 10
QUERY_FILTER_MOD = 50


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_brute_force_topk_shape(spark, emb):
    out = S.brute_force_topk(emb, F.col("vec_id") % QUERY_FILTER_MOD == 0, k=K)
    rows = out.collect()
    assert rows, "brute force returned nothing"
    by_q = {}
    for r in rows:
        assert r.query_id != r.vec_id, "self-match leaked"
        assert 1 <= r.rank <= K
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert len(rs) <= K
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1)), f"rank gaps for query {q}"


def test_ann_lsh_nonvacuous(spark, emb):
    out = S.lsh_ann_topk(emb, F.col("vec_id") % QUERY_FILTER_MOD == 0, k=K).collect()
    assert len(out) > 0, "ANN LSH returned 0 rows — buckets never collide (vacuous)"
    n_queries = emb.filter(F.col("vec_id") % QUERY_FILTER_MOD == 0).count()
    covered = {r.query_id for r in out}
    # OR-amplified banding must surface candidates for most queries.
    assert len(covered) >= 0.8 * n_queries, (
        f"only {len(covered)}/{n_queries} queries have any ANN candidates"
    )


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    exact = S.brute_force_topk(emb, qf, k=K).collect()
    approx = S.lsh_ann_topk(emb, qf, k=K).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    mean_recall = sum(recalls) / len(recalls)
    # Random-hyperplane LSH on near-uniform vectors is a weak signal; the
    # floor asserts the mechanism works (far above the ~K/N random-pick
    # rate), not production-grade recall.
    assert mean_recall >= 0.15, f"mean recall {mean_recall:.3f} below floor"


def test_neardup_lsh_subset_and_recall(spark, emb):
    """LSH sub-blocked near-dup must emit a subset of the exact pairs
    (identical cosines) with nonzero recall at the test threshold."""
    thr = 0.35
    exact = {
        (r.vec_a, r.vec_b): r.cos
        for r in S.label_blocked_neardup(emb, threshold=thr).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cos for r in S.label_lsh_neardup(emb, threshold=thr).collect()
    }
    assert exact, "exact near-dup baseline is empty — test is vacuous"
    assert set(approx) <= set(exact), "LSH emitted a pair the exact op didn't"
    for pair, cos in approx.items():
        assert abs(cos - exact[pair]) < 1e-12
    recall = len(approx) / len(exact)
    # Collision probability for cos≈0.35 over 3 bands × 4 planes is ~0.37;
    # the floor asserts the mechanism works, not production recall.
    assert recall >= 0.15, f"recall {recall:.3f}"


def test_pretrained_sidecar_artifacts_roundtrip_bitexact(spark, sf_dir, emb):
    """The persisted training sidecars (PQ codebooks, IVF centroids)
    must load back BIT-IDENTICAL to fresh training: the json dump is
    repr-based (shortest round-trip) and training is deterministic, so
    a fresh process serving from the sidecar computes exactly what an
    in-process-trained session computes. Clears the memos to force the
    disk path."""
    from parallel_map_reduce_spark.queries import similarity as QS

    QS._PQ_MEMO.clear()
    books_loaded = QS._pretrained_pq_books(spark, sf_dir)
    books_fresh = S.train_pq_codebooks(emb)
    assert books_loaded == books_fresh

    QS._CENTS_MEMO.clear()
    loaded = {
        (r.centroid_id, tuple(r.c_emb))
        for r in QS._pretrained_cents(spark, sf_dir).collect()
    }
    fresh = {
        (r.centroid_id, tuple(float(x) for x in r.c_emb))
        for r in S.train_ivf_centroids(emb, S.IVF_K)
        .select("centroid_id", "c_emb")
        .collect()
    }
    assert loaded == fresh and len(loaded) == S.IVF_K


def test_lsh_indexed_equals_inline(spark, emb, tmp_path):
    """The persisted-index LSH serving path (write_lsh_index +
    lsh_ann_topk_indexed) must return EXACTLY the inline operator's
    rows: the bucketing projection is deterministic (fixed planes),
    parquet round-trips the vectors exactly, and the partition-pruned
    store scan sees the same candidate rows the in-plan equi-join
    keeps. Also pins that the pruned scan carries band/bucket
    partition filters — the layout property the artifact exists for."""
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    idx = str(tmp_path / "lsh_index")
    S.write_lsh_index(emb, idx)
    inline = {
        (r.query_id, r.vec_id, r.rank, round(r.cos, 12))
        for r in S.lsh_ann_topk(emb, qf, k=K).collect()
    }
    indexed_df = S.lsh_ann_topk_indexed(emb, idx, qf, k=K)
    indexed = {
        (r.query_id, r.vec_id, r.rank, round(r.cos, 12))
        for r in indexed_df.collect()
    }
    assert inline == indexed and len(inline) > 0
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "band" in plan and "bucket" in plan
    # the probe set must reach the scan as DYNAMIC pruning (no
    # driver-side probe collect) — the property the operator relies on
    assert "dynamicpruning" in plan.lower()


def test_lsh_indexed_prunes_unprobed_buckets(spark, emb, tmp_path):
    """A single-query batch probes ANN_BANDS (band, bucket) pairs; the
    store scan must read at most those partitions — verified by row
    count through the scan: the filtered store yields only rows whose
    (band, bucket) is probed, far fewer than the store total."""
    idx = str(tmp_path / "lsh_index_prune")
    S.write_lsh_index(emb, idx)
    one_query = F.col("vec_id") == emb.agg(F.min("vec_id")).collect()[0][0]
    store = spark.read.parquet(idx + "/buckets")
    total = store.count()
    out = S.lsh_ann_topk_indexed(emb, idx, one_query, k=K)
    out.collect()  # must run
    # the probed subset: at most ANN_BANDS buckets of the store
    probed_rows = 0
    q = (
        emb.filter(one_query)
        .withColumn("bkts", S._band_buckets_expr("embedding", 64))
        .select(F.posexplode("bkts").alias("band", "bucket"))
        .collect()
    )
    for r in q:
        probed_rows += store.filter(
            (F.col("band") == r.band) & (F.col("bucket") == r.bucket)
        ).count()
    assert probed_rows < total, "probe read the whole store"


def test_ann_candidates_subset_scored_correctly(spark, emb):
    """Every ANN hit's cosine must equal the exact cosine for that pair."""
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    approx = S.lsh_ann_topk(emb, qf, k=K)
    e = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    c = emb.select(F.col("vec_id"), F.col("embedding").alias("ce"))
    joined = (
        approx.join(e, "query_id")
        .join(c, "vec_id")
        .withColumn("cos_exact", S.cosine_similarity("qe", "ce"))
    )
    bad = joined.filter(F.abs(F.col("cos") - F.col("cos_exact")) > 1e-12).count()
    assert bad == 0


def _mean_recall(exact_rows, approx_rows):
    exact_sets, approx_sets = {}, {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx_rows:
        assert r.query_id != r.vec_id
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    return sum(recalls) / len(recalls), approx_sets


def test_ivf_ann_nonvacuous_and_recall(spark, emb):
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    approx = S.ivf_ann_topk(emb, qf, k=K).collect()
    assert approx, "IVF ANN returned nothing"
    exact = S.brute_force_topk(emb, qf, k=K).collect()
    mean_recall, approx_sets = _mean_recall(exact, approx)
    n_queries = emb.filter(qf).count()
    assert len(approx_sets) >= 0.8 * n_queries
    # nprobe=3 of 16 TRAINED centroids; measured 0.52 at sf0.001 (seed
    # centroids gave 0.45). The floor asserts the probe mechanism beats
    # random candidate picking with real margin.
    assert mean_recall >= 0.3, f"mean recall {mean_recall:.3f}"


def test_ivf_training_improves_recall(spark, emb):
    """Lloyd-trained centroids must not lose to the raw seed vectors —
    the round-2 stand-in this training replaced. Deterministic data +
    deterministic training ⇒ a stable comparison, not a flaky one."""
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    exact = S.brute_force_topk(emb, qf, k=K).collect()
    seed_cents = S.train_ivf_centroids(emb, S.IVF_K, iters=0)
    trained_cents = S.train_ivf_centroids(emb, S.IVF_K)
    seed_recall, _ = _mean_recall(
        exact, S.ivf_ann_topk(emb, qf, k=K, cents=seed_cents).collect()
    )
    trained_recall, _ = _mean_recall(
        exact, S.ivf_ann_topk(emb, qf, k=K, cents=trained_cents).collect()
    )
    assert trained_recall >= seed_recall, (
        f"training regressed recall: {trained_recall:.3f} < {seed_recall:.3f}"
    )
    # At the default test SF the improvement is strict (0.52 vs 0.45).
    assert trained_recall >= 0.3


def test_int8_quantization_preserves_geometry(spark, sf_dir):
    """Dequantized vectors must stay geometrically faithful: cosine
    similarity between original and dequantized > 0.995 for every
    vector (int8 symmetric quantization bounds per-dim error at
    max_abs/254)."""
    import pyspark.sql.functions as F

    from parallel_map_reduce_spark.operators.similarity import (
        quantize_embeddings_int8,
    )
    from parallel_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings_int8(emb)
    joined = emb.join(q, "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("x"),
        F.transform(F.split("q_codes", ","), lambda c: c.cast("double") * F.col("scale")).alias("y"),
    )
    dot = F.aggregate(
        F.zip_with("x", "y", lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v)
    )
    cos = (dot / (norm(F.col("x")) * norm(F.col("y")))).alias("cos")
    worst = joined.select(cos).agg(F.min("cos").alias("m")).first()["m"]
    assert worst > 0.995, worst


def test_two_stage_topk_equals_brute_force(spark, sf_dir):
    """At the default overfetch the quantized shortlist preserves every
    true top-k neighbor, so two-stage retrieval must EQUAL the exact
    baseline — (query, neighbor, rank) for all queries, not just
    recall-overlap. Quantization error only matters near the shortlist
    boundary, which overfetch=4 keeps far from rank k."""
    from parallel_map_reduce_spark.operators.similarity import (
        brute_force_topk,
        two_stage_topk,
    )
    from parallel_map_reduce_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    qf = F.col("vec_id") % 50 == 0
    bf = {(r.query_id, r.vec_id, r.rank) for r in brute_force_topk(emb, qf, k=10).collect()}
    ts = {(r.query_id, r.vec_id, r.rank) for r in two_stage_topk(emb, qf, k=10).collect()}
    assert bf == ts and len(bf) > 0


def test_two_stage_ivf_recall_and_exact_degeneration(spark, emb):
    """IVF-pruned two-stage retrieval: (a) a recall floor vs brute force
    at the default nprobe (candidate generation is approximate, but the
    probed lists must catch most true neighbors); (b) with nprobe =
    n_centroids every partition is probed, so the shortlist equals
    two_stage_topk's and the result must EQUAL brute force exactly."""
    from parallel_map_reduce_spark.operators.similarity import (
        IVF_K,
        brute_force_topk,
        two_stage_ivf_topk,
    )

    qf = F.col("vec_id") % 50 == 0
    exact = brute_force_topk(emb, qf, k=10).collect()
    approx = two_stage_ivf_topk(emb, qf, k=10).collect()
    mean_recall, _ = _mean_recall(exact, approx)
    assert len(approx) > 0
    assert mean_recall >= 0.3, f"mean recall {mean_recall:.3f}"

    full = two_stage_ivf_topk(emb, qf, k=10, nprobe=IVF_K).collect()
    bf = {(r.query_id, r.vec_id, r.rank) for r in exact}
    fu = {(r.query_id, r.vec_id, r.rank) for r in full}
    assert bf == fu


def test_two_stage_ivf_indexed_equals_inline(spark, emb, tmp_path):
    """The persisted-index serving path (write_ivf_index +
    two_stage_ivf_topk_indexed) must return EXACTLY the inline
    operator's results given the same centroids: the code store is a
    deterministic projection, parquet round-trips long/double exactly,
    and the partition-pruned scan sees the same probed rows the
    in-plan equi-join keeps. Also pins that the pruned scan carries a
    centroid_id partition filter — the layout property the artifact
    exists for."""
    from parallel_map_reduce_spark.operators.similarity import (
        train_ivf_centroids,
        two_stage_ivf_topk,
        two_stage_ivf_topk_indexed,
        write_ivf_index,
    )

    qf = F.col("vec_id") % 50 == 0
    cents = train_ivf_centroids(emb, S.IVF_K)
    idx = str(tmp_path / "ivf_index")
    write_ivf_index(emb, idx, cents=cents)
    inline = {
        (r.query_id, r.vec_id, r.rank, round(r.cos, 12))
        for r in two_stage_ivf_topk(emb, qf, k=10, cents=cents).collect()
    }
    indexed_df = two_stage_ivf_topk_indexed(emb, idx, qf, k=10)
    indexed = {
        (r.query_id, r.vec_id, r.rank, round(r.cos, 12))
        for r in indexed_df.collect()
    }
    assert inline == indexed and len(inline) > 0
    plan = indexed_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_semantic_dedup_resolves_planted_groups(spark):
    """Planted near-identical embedding groups must resolve to exactly
    one keeper each (min vec_id), distinct vectors must all be kept,
    and every non-keeper must point at its group's keeper."""
    import random

    from parallel_map_reduce_spark.operators.similarity import semantic_dedup

    rng = random.Random(11)
    rows = []
    vid = 0
    groups = []
    for g in range(4):  # 4 planted groups of 3 near-copies
        base = [rng.uniform(-1, 1) for _ in range(16)]
        members = []
        for j in range(3):
            vec = [x + rng.uniform(-1e-4, 1e-4) for x in base]
            rows.append((vid, [float(x) for x in vec]))
            members.append(vid)
            vid += 1
        groups.append(members)
    singles = []
    for s in range(8):  # well-separated singletons: one-hot-ish
        vec = [0.0] * 16
        vec[s % 16] = 1.0 + 0.1 * s
        vec[(s + 7) % 16] = -1.0 - 0.05 * s
        rows.append((vid, vec))
        singles.append(vid)
        vid += 1
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.999, n_centroids=2).collect()}
    assert len(out) == vid
    for members in groups:
        keepers = [m for m in members if out[m].keep]
        # all three are mutual near-dups IF they landed in one cluster;
        # cluster blocking may split a group (SemDeDup semantics), but
        # every member must point at a keeper that IS kept
        for m in members:
            assert out[out[m].keeper_id].keep
        assert min(members) in [out[m].keeper_id for m in members]
        assert 1 <= len(keepers) <= 2
    for s in singles:
        assert out[s].keep and out[s].keeper_id == s


@pytest.fixture(scope="module")
def pq_books(emb):
    from parallel_map_reduce_spark.operators.similarity import train_pq_codebooks

    return train_pq_codebooks(emb)


def test_pq_codes_shape_and_range(emb, pq_books):
    from parallel_map_reduce_spark.operators.similarity import PQ_K, PQ_M, pq_encode

    assert len(pq_books) == PQ_M and all(len(b) == PQ_K for b in pq_books)
    rows = pq_encode(emb, pq_books).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == PQ_M
        assert all(0 <= c < PQ_K for c in r.codes)


def test_pq_topk_recall_floor(spark, emb, pq_books):
    from parallel_map_reduce_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    exact = brute_force_topk(emb, qf, k=K).collect()
    approx = pq_topk(emb, qf, k=K, books=pq_books).collect()
    recall, approx_sets = _mean_recall(exact, approx)
    # 64-dim near-random embeddings are PQ's worst case; with the
    # default m=8/k=32/shortlist=80 the measured recall is ~0.88.
    assert recall >= 0.7, recall
    assert all(len(s) == K for s in approx_sets.values())


def test_pq_adc_matches_python_replica(emb, pq_books):
    """The Spark ADC column equals the textbook ADC formula computed in
    pure Python on the collected normalized vectors, codes, and
    codebooks — Σ_s q_s · c_{s, code_s}."""
    from parallel_map_reduce_spark.operators.similarity import (
        _normalized,
        pq_adc_scores,
        pq_encode,
    )

    m = len(pq_books)
    subdim = len(pq_books[0][0])
    nemb = {r.vec_id: list(r.nemb) for r in _normalized(emb).collect()}
    codes = {r.vec_id: list(r.codes) for r in pq_encode(emb, pq_books).collect()}
    spark_adc = {
        (r.query_id, r.vec_id): r.adc
        for r in pq_adc_scores(
            emb, F.col("vec_id") % QUERY_FILTER_MOD == 0, pq_books
        ).collect()
    }
    assert spark_adc
    checked = 0
    for (qid, vid), got in sorted(spark_adc.items())[:200]:
        q = nemb[qid]
        expected = sum(
            sum(
                a * b
                for a, b in zip(
                    q[s * subdim : (s + 1) * subdim], pq_books[s][codes[vid][s]]
                )
            )
            for s in range(m)
        )
        assert got == pytest.approx(expected, abs=1e-9), (qid, vid)
        checked += 1
    assert checked == 200


def test_pq_training_deterministic(emb):
    from parallel_map_reduce_spark.operators.similarity import train_pq_codebooks

    b1 = train_pq_codebooks(emb)
    b2 = train_pq_codebooks(emb.repartition(5))
    assert b1 == b2


def test_pq_indexed_equals_inline(spark, emb, pq_books, tmp_path):
    """The persisted-code-store serving path (driver-computed LUTs)
    returns EXACTLY the inline expression path's rows — same codes,
    same sequential-fold ADC arithmetic, same tie-breaks."""
    from parallel_map_reduce_spark.operators.similarity import (
        pq_topk,
        pq_topk_indexed,
        write_pq_index,
    )

    path = str(tmp_path / "pq_index")
    write_pq_index(emb, path, pq_books)
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    inline = sorted(map(tuple, pq_topk(emb, qf, k=K, books=pq_books).collect()))
    indexed = sorted(
        map(tuple, pq_topk_indexed(emb, path, qf, pq_books, k=K).collect())
    )
    assert inline == indexed


@pytest.fixture(scope="module")
def ivfpq_index(spark, emb, pq_books, tmp_path_factory):
    """One IVFPQ artifact shared by the composition tests (build once —
    the split the operator is designed around)."""
    from parallel_map_reduce_spark.operators.similarity import (
        IVF_K,
        train_ivf_centroids,
        write_ivfpq_index,
    )

    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    cents = train_ivf_centroids(emb, IVF_K)
    write_ivfpq_index(emb, path, pq_books, cents)
    return path


def test_ivfpq_nprobe_all_equals_flat_pq(spark, emb, pq_books, ivfpq_index, tmp_path):
    """With nprobe = all coarse cells, the IVFPQ path scans every
    partition of the same bit-identical code store and applies the same
    driver-LUT ADC arithmetic — so it must EQUAL the flat persisted-PQ
    path row-for-row (which test_pq_indexed_equals_inline pins equal to
    the inline pq_topk). This is the composition's exactness anchor:
    partitioning the store changed WHERE codes live, never their values
    or the scoring."""
    from parallel_map_reduce_spark.operators.similarity import (
        IVF_K,
        ivfpq_topk,
        pq_topk_indexed,
        write_pq_index,
    )

    flat_path = str(tmp_path / "pq_flat")
    write_pq_index(emb, flat_path, pq_books)
    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    full = sorted(
        map(tuple, ivfpq_topk(emb, ivfpq_index, qf, pq_books, k=K, nprobe=IVF_K).collect())
    )
    flat = sorted(
        map(tuple, pq_topk_indexed(emb, flat_path, qf, pq_books, k=K).collect())
    )
    assert full == flat and len(full) > 0


def test_ivfpq_recall_floor_and_partition_pruning(spark, emb, pq_books, ivfpq_index):
    """Default-nprobe serving: (a) recall floor vs brute force — doubly
    approximate (IVF cell pruning x PQ quantization), so the floor sits
    at the IVF family's level (the coarse pruning dominates the loss on
    these near-random vectors; flat PQ alone measures ~0.88, IVF alone
    ~0.5); (b) the executed plan must prune the code-store SCAN to the
    probed centroid partitions (PartitionFilters), the property the
    composed artifact exists for; (c) repartitioning the query input
    must not change results (stage 0 is driver-side, stages 1-2 are
    partition-count-invariant)."""
    from parallel_map_reduce_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )

    qf = F.col("vec_id") % QUERY_FILTER_MOD == 0
    exact = brute_force_topk(emb, qf, k=K).collect()
    df = ivfpq_topk(emb, ivfpq_index, qf, pq_books, k=K)
    approx = df.collect()
    recall, approx_sets = _mean_recall(exact, approx)
    assert len(approx) > 0
    assert recall >= 0.3, f"mean recall {recall:.3f}"

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # no full-corpus pass in any representation: the only joins are the
    # centroid_id hash equi-join and the shortlist equi-joins
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    again = ivfpq_topk(emb.repartition(7), ivfpq_index, qf, pq_books, k=K).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))


def test_ivfpq_hot_centroid_stays_pruned_and_parallel(spark, tmp_path):
    """Skew resilience of the IVFPQ store (VERDICT r7 task 7): real
    embedding distributions are NOT uniform over coarse cells, so one
    centroid partition can hold 30%+ of the corpus. Serving must then
    still (a) prune the scan to probed partitions, and (b) never
    collapse the hot cell onto one reducer — which the plan guarantees
    structurally: the probe side is BROADCAST, so the code store is
    never hash-exchanged on the skewed centroid_id key, and the hot
    cell's rows arrive in multiple independently-scannable parquet
    files whose task fan-out is byte-driven (maxPartitionBytes), not
    key-driven."""
    import glob
    import random

    from parallel_map_reduce_spark.operators.similarity import (
        ivf_assignments,
        ivfpq_topk,
        train_ivf_centroids,
        train_pq_codebooks,
        write_ivfpq_index,
    )

    rng = random.Random(42)
    dim = 16
    rows = []
    for i in range(400):
        if i % 10 < 4:  # 40% of vectors in one tight cluster
            v = [1.0 + 0.01 * rng.uniform(-1, 1)] + [
                0.01 * rng.uniform(-1, 1) for _ in range(dim - 1)
            ]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")

    cents = train_ivf_centroids(emb, 8)
    books = train_pq_codebooks(emb)
    counts = {
        r.centroid_id: r.n
        for r in ivf_assignments(emb, cents=cents)
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    hot_cell, hot_n = max(counts.items(), key=lambda kv: kv[1])
    assert hot_n >= 0.3 * 400, f"planted hot cell only {hot_n}/400"

    path = str(tmp_path / "ivfpq_hot")
    write_ivfpq_index(emb, path, books, cents)
    # The hot cell exists as an ordinary parquet partition directory:
    # its task fan-out at read time is BYTE-driven (maxPartitionBytes
    # splits files/row-groups), never key-driven — at test scale AQE
    # coalesces the KB-sized build to one file, which is itself
    # splittable by row group at real sizes.
    hot_files = glob.glob(f"{path}/codes/centroid_id={hot_cell}/*.parquet")
    assert len(hot_files) >= 1

    qf = F.col("vec_id") % 100 == 0  # queries 0/100/200/300: all hot
    df = ivfpq_topk(emb, path, qf, books, k=5)
    out = df.collect()
    assert len(out) > 0 and len({r.query_id for r in out}) == 4
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    # The skew guarantee: no exchange keyed on the hot column anywhere
    # in the serving plan — the only joins broadcast the query side.
    assert "Exchange hashpartitioning(centroid_id" not in plan, plan
    assert "CartesianProduct" not in plan


def test_query_batch_cap_refuses_corpus_scale_batch(spark, emb, monkeypatch):
    """Serving-path query collects must fail LOUDLY past QUERY_BATCH_CAP
    (VERDICT r17 task 2) instead of OOM-ing the driver."""
    monkeypatch.setattr(S, "QUERY_BATCH_CAP", 10)
    with pytest.raises(ValueError, match="QUERY_BATCH_CAP"):
        S.two_stage_topk(emb, F.lit(True), k=3)


def test_query_batch_cap_refuses_indexed_probe_batch(spark, emb, tmp_path, monkeypatch):
    monkeypatch.setattr(S, "QUERY_BATCH_CAP", 10)
    path = str(tmp_path / "ivf_cap")
    S.write_ivf_index(emb, path)
    with pytest.raises(ValueError, match="QUERY_BATCH_CAP"):
        S.two_stage_ivf_topk_indexed(emb, path, F.lit(True), k=3)


def test_gemm_query_broadcast_path_is_bit_identical(spark, emb):
    """Forcing the broadcast payload path (|Q| >= GEMM_BROADCAST_MIN_Q)
    must produce exactly the closure-path rows."""
    qf = F.col("vec_id") % 50 == 0
    base = {tuple(r) for r in S.two_stage_topk(emb, qf, k=5).collect()}
    import unittest.mock as mock

    with mock.patch.object(S, "GEMM_BROADCAST_MIN_Q", 1):
        bcast = {tuple(r) for r in S.two_stage_topk(emb, qf, k=5).collect()}
    assert base == bcast and len(base) > 0


def test_pair_kernel_block_cap_trips_on_hot_label(spark, monkeypatch):
    """A pathologically hot label must raise the PAIR_BLOCK_ROW_CAP
    guard loudly instead of silently concentrating O(n^2) work/memory
    in one task (VERDICT r17 task 6)."""
    monkeypatch.setattr(S, "PAIR_BLOCK_ROW_CAP", 8)
    rows = [(i, "hot", [float(i % 3), 1.0]) for i in range(20)]
    hot = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    with pytest.raises(Exception, match="PAIR_BLOCK_ROW_CAP"):
        S.label_blocked_neardup(hot, threshold=0.0).collect()


def test_semdedup_kernel_block_cap_trips_on_hot_cluster(spark, monkeypatch):
    monkeypatch.setattr(S, "PAIR_BLOCK_ROW_CAP", 8)
    rows = [(i, [1.0 + (i % 5) * 1e-6, 1.0]) for i in range(24)]
    emb_hot = spark.createDataFrame(rows, ["vec_id", "embedding"])
    with pytest.raises(Exception, match="PAIR_BLOCK_ROW_CAP"):
        S.semantic_dedup(emb_hot, threshold=0.0, n_centroids=1).collect()


def test_label_kernel_skips_null_labels(spark):
    """NULL-labeled rows never pair (SQL null-equality semantics of the
    join the kernel replaced — ADVICE r17)."""
    rows = [
        (1, None, [1.0, 0.0]),
        (2, None, [1.0, 0.0]),
        (3, "a", [0.0, 1.0]),
        (4, "a", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = S.label_blocked_neardup(df, threshold=0.5).collect()
    assert {(r.vec_a, r.vec_b) for r in out} == {(3, 4)}


def test_assign_kernel_matches_crossjoin_form(spark, emb):
    """The Arrow assignment path is bit-identical to the crossJoin +
    max_by form it replaced (order-matched accumulation, first-max
    argmax == (c_cos, -cid) tie-break)."""
    from pyspark.sql import functions as FF

    from parallel_map_reduce_spark.functions.vector import dot, l2_norm

    cents = S.train_ivf_centroids(emb, k=8, iters=1)
    e = emb.select("vec_id", "embedding").withColumn("nrm", l2_norm("embedding"))
    kernel = S._assign_to_centroids(e, cents)
    scored = e.crossJoin(FF.broadcast(cents)).withColumn(
        "c_cos", dot("embedding", "c_emb") / (FF.col("nrm") * FF.col("c_nrm"))
    )
    legacy = scored.groupBy("vec_id").agg(
        FF.first("embedding").alias("embedding"),
        FF.first("nrm").alias("nrm"),
        FF.max_by(
            "centroid_id",
            FF.struct(FF.col("c_cos"), (-FF.col("centroid_id")).alias("t")),
        ).alias("centroid_id"),
    )
    k_rows = {r.vec_id: (tuple(r.embedding), r.nrm, r.centroid_id) for r in kernel.collect()}
    l_rows = {r.vec_id: (tuple(r.embedding), r.nrm, r.centroid_id) for r in legacy.collect()}
    assert k_rows == l_rows and len(k_rows) > 0
