"""Row-identity twins for rows-only registry entries (VERDICT r11
task 6).

Entries whose semantics are not SQL-expressible (ANN candidate
generation under LSH planes / IVF probes / PQ codes) cannot carry a
DuckDB oracle, so the driver's gate records them rows-only. But each
has an INDEPENDENT-PATH twin inside the engine — served-from-artifact
vs built-inline, sidecar-loaded vs freshly-trained state — whose rows
must be IDENTICAL by construction (the equality contracts pinned in
tests/test_similarity.py). tools/parity.py consults this table so each
gate rotation records "twin-identical (vs <label>)" instead of a bare
row count: a regression in either path breaks the identity even though
neither side has an external oracle.

Twin builders return a DataFrame with the SAME columns as the
registered entry; comparison is exact on sorted row tuples with floats
rounded to 12 dp (the tests' convention — both paths produce
bit-identical doubles today; the rounding only absorbs a hypothetical
future libm wobble, not an algorithmic difference).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from ..sources.catalog import load_table
from . import similarity as QS

# entry name -> (twin label, builder). Labels state WHAT independence
# the identity buys, so the parity record is self-describing.
TWINS: dict[str, tuple[str, Callable[[SparkSession, str], DataFrame]]] = {}

# entry name -> custom comparator (srows, trows) -> bool for twins
# whose equality is legitimately tolerance-based (float linear algebra
# with engine-order-dependent last bits). Absent = exact row identity
# at 12 dp, the default.
TWIN_COMPARE: dict[str, Callable[[list, list], bool]] = {}


def _twin(name: str, label: str):
    def deco(fn):
        TWINS[name] = (label, fn)
        return fn

    return deco


# Twin scaffolding collects corpora to the driver by design — the
# single-machine replica IS the independence. That is only safe at
# fixture scale; this cap refuses a twin pointed at a real corpus
# instead of silently OOM-ing the driver (VERDICT r12 task 6 /
# residual finding 2). Generous vs the committed fixtures (2,000
# embeddings / ~6k documents at sf0.1) and far below driver-memory
# trouble.
TWIN_COLLECT_CAP = 200_000


def collect_bounded(df: DataFrame, what: str) -> list:
    """Collect for twin replicas, refusing above TWIN_COLLECT_CAP rows.
    One job: fetch cap+1 and treat a full fetch as overflow (no
    separate count pass)."""
    rows = df.limit(TWIN_COLLECT_CAP + 1).collect()
    if len(rows) > TWIN_COLLECT_CAP:
        raise ValueError(
            f"twin replica refuses to collect {what}: more than "
            f"{TWIN_COLLECT_CAP} rows — twins are fixture-scale "
            "verification scaffolding, not a production path"
        )
    return rows


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _pred() -> F.Column:
    return F.col("vec_id") % QS._QUERY_MOD == 0


def _fold_dot(a, b) -> float:
    """Sequential left-to-right fold of per-element double products —
    the exact IEEE op order of functions/vector.dot, which is what buys
    the pure-Python twins their bit-identity (shared so a future change
    to the engine fold updates every twin at once; review r13)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


@_twin("similarity_ann_lsh", "served from persisted LSH store (lsh_ann_topk_indexed)")
def _lsh_served_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_ann_topk_indexed(
        _emb(spark, sf_dir), QS._lsh_index_dir(spark, sf_dir), _pred(), k=QS._K
    )


@_twin("similarity_ann_lsh_served", "built inline, no store (lsh_ann_topk)")
def _lsh_inline_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The served entry uses the PRUNING-EFFECTIVE batch (vec_id % 1000
    # — its documented production shape), not the % _QUERY_MOD batch of
    # the inline entry; the twin must match its filter.
    return S.lsh_ann_topk(
        _emb(spark, sf_dir), F.col("vec_id") % 1000 == 0, k=QS._K
    )


@_twin(
    "similarity_ann_ivf",
    "freshly Lloyd-trained centroids, no sidecar (train_ivf_centroids)",
)
def _ivf_fresh_cents_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return S.ivf_ann_topk(
        emb, _pred(), k=QS._K, cents=S.train_ivf_centroids(emb, S.IVF_K)
    )


@_twin(
    "similarity_two_stage_ivf_topk",
    "built inline, no code-store artifact (two_stage_ivf_topk)",
)
def _two_stage_ivf_inline_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.two_stage_ivf_topk(
        _emb(spark, sf_dir),
        _pred(),
        k=QS._K,
        overfetch=QS._OVERFETCH,
        cents=QS._pretrained_cents(spark, sf_dir),
    )


@_twin("similarity_pq_topk", "inline expression path, no code store (pq_topk)")
def _pq_inline_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return S.pq_topk(
        emb, _pred(), k=QS._K, books=QS._pretrained_pq_books(spark, sf_dir)
    )


@_twin(
    "similarity_ivfpq_topk",
    "fresh probe table + uncollected queries (no serving-state memos)",
)
def _ivfpq_fresh_state_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Weakest of the six (same scoring code, fresh state): it verifies
    # the memoized probe table / collected query batch the registered
    # entry serves from are equal to a from-scratch recomputation. The
    # cross-ALGORITHM contract (nprobe=all == flat PQ) stays in
    # tests/test_similarity.py.
    emb = _emb(spark, sf_dir)
    return S.ivfpq_topk(
        emb,
        QS._ensure_ivfpq_index(spark, sf_dir),
        _pred(),
        QS._pretrained_pq_books(spark, sf_dir),
        k=QS._K,
    )


@_twin(
    "documents_quality_logreg",
    "freshly GD-trained model, no sidecar (feature_stats + train_logreg)",
)
def _quality_logreg_fresh_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Training is bit-deterministic (rounded-DECIMAL gradient sums,
    # pinned in tests/test_quality_model.py) and the sidecar's JSON
    # float round-trip is repr-exact, so fresh-trained scores must be
    # IDENTICAL to the sidecar-served entry's.
    from ..operators import quality_model as QM

    feat = QM.doc_quality_features(load_table(spark, sf_dir, "documents")).persist()
    try:
        stats = QM.feature_stats(feat)
        weights = QM.train_logreg(QM.standardize(feat, stats))
    finally:
        feat.unpersist(blocking=False)
    fresh_feat = QM.doc_quality_features(load_table(spark, sf_dir, "documents"))
    return QM.score_logreg(QM.standardize(fresh_feat, stats), weights)


@_twin(
    "text_bpe_vocabulary",
    "textbook pure-Python BPE (train + segment on collected corpus)",
)
def _bpe_python_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full single-machine replica of the entry — word frequencies,
    Sennrich-style merge loop, and per-word segmentation all in plain
    Python over the collected corpus — materialized back as a
    DataFrame with the entry's exact schema. Shares no execution path
    with the distributed trainer, so identity verifies the merge
    sequence AND the fold-based segmentation."""
    import re

    from ..operators.text_analysis import BPE_END, BPE_N_MERGES

    texts = [
        r.text
        for r in collect_bounded(
            load_table(spark, sf_dir, "documents").select("text"),
            "documents.text (BPE twin)",
        )
    ]
    freqs: dict[str, int] = {}
    for text in texts:
        for tok in re.split("[ \t\n]+", text):
            w = re.sub("[^A-Za-z]", "", tok).lower()
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    words = {w: list(w) + [BPE_END] for w in freqs}
    for _rank in range(1, BPE_N_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    rows = [
        (w, freqs[w], len(words[w]), " ".join(words[w])) for w in sorted(freqs)
    ]
    return spark.createDataFrame(
        rows, "word STRING, freq BIGINT, n_subwords BIGINT, subwords STRING"
    )


@_twin(
    "embedding_pca_whitened",
    "full-numpy PCA on the collected matrix (two-pass covariance + eigh)",
)
def _pca_numpy_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent linear-algebra path: numpy covariance +
    eigendecomposition + whitening on the collected embedding matrix,
    with the entry's sign canonicalization and %.6f rendering. One-pass
    (sufficient statistics) vs two-pass covariance differ in final
    float bits, so this twin compares under TWIN_COMPARE's 2e-5
    absolute tolerance (the test suite's bound) instead of exact
    identity."""
    import numpy as np

    rows = collect_bounded(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "embeddings (PCA twin)",
    )
    ids = [r.vec_id for r in rows]
    mat = np.array([[float(x) for x in r.embedding] for r in rows])
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:8]
    vals, vecs = eigvals[order], eigvecs[:, order]
    for j in range(vecs.shape[1]):
        i = int(np.abs(vecs[:, j]).argmax())
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    comps = (mat - mean) @ (vecs / np.sqrt(np.maximum(vals, 1e-12)))
    out = [
        (int(vid), " ".join(f"{c + 0.0:.6f}" for c in comps[i]))
        for i, vid in enumerate(ids)
    ]
    return spark.createDataFrame(out, "vec_id BIGINT, comps STRING")


@_twin(
    "embedding_semantic_dedup",
    "pure-Python cluster-block/pair/union-find replica over collected "
    "vectors (engine-trained centroids)",
)
def _semantic_dedup_python_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-machine replica of the SemDeDup chain
    (operators/similarity.py:semantic_dedup): nearest-centroid
    assignment, within-cluster cosine pairs, connected components, and
    keeper resolution all in plain Python over the collected vectors —
    none of the distributed blocking join / min-label loop executes.
    Floating point matches BIT-IDENTICALLY because every float op
    replays the engine's exact sequence: ``functions/vector.dot`` is a
    sequential left-to-right fold of per-element double products, so
    the Python loop below performs the same IEEE adds in the same
    order, and the tie-break (max cosine, then LOWEST centroid_id)
    mirrors the engine's max_by struct. Centroids come from the
    engine's deterministic trainer (freshness of training itself is
    the similarity_ann_ivf twin's axis)."""
    from ..operators.similarity import IVF_K, train_ivf_centroids
    from . import similarity as _QSIM

    emb = _emb(spark, sf_dir)
    cents = [
        (int(r.centroid_id), [float(x) for x in r.c_emb], float(r.c_nrm))
        for r in train_ivf_centroids(emb, IVF_K).collect()
    ]

    import math

    rows = collect_bounded(
        emb.select("vec_id", "embedding"), "embeddings (SemDeDup twin)"
    )
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in rows}
    nrm = {vid: math.sqrt(_fold_dot(v, v)) for vid, v in vecs.items()}
    clusters: dict[int, list[int]] = {}
    for vid, v in vecs.items():
        best = max(
            ((_fold_dot(v, ce) / (nrm[vid] * cn), -cid) for cid, ce, cn in cents)
        )
        clusters.setdefault(-best[1], []).append(vid)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    threshold = _QSIM._NEARDUP_THRESHOLD
    for members in clusters.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos = _fold_dot(vecs[a], vecs[b]) / (nrm[a] * nrm[b])
                if cos >= threshold:
                    parent.setdefault(a, a)
                    parent.setdefault(b, b)
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for vid in parent:
        comp_min.setdefault(find(vid), None)
    for root in comp_min:
        comp_min[root] = min(v for v in parent if find(v) == root)
    out = []
    for vid in sorted(vecs):
        if vid in parent:
            keeper = comp_min[find(vid)]
            out.append((vid, keeper, keeper == vid))
        else:
            out.append((vid, vid, True))
    return spark.createDataFrame(
        out, "vec_id BIGINT, keeper_id BIGINT, keep BOOLEAN"
    )


@_twin(
    "embedding_neardup_lsh",
    "pure-Python plane-bucket/block/exact-cosine replica over collected "
    "vectors",
)
def _neardup_lsh_python_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-machine replica of label_lsh_neardup
    (operators/similarity.py:393): banded hyperplane bucketing
    (deterministic integer-mixed planes, plane_components), (label,
    band, bucket) blocking, pair dedupe, exact cosine filter — all in
    plain Python. Bit-identical floats for the same reason as the
    SemDeDup twin: every engine float op is a sequential
    left-to-right fold this replica replays in order (bucket sign
    bits are exact comparisons, so blocking cannot diverge at all)."""
    import math

    from ..operators.similarity import (
        ANN_BANDS,
        ANN_PLANES_PER_BAND,
        plane_components,
    )
    from . import similarity as _QSIM

    rows = collect_bounded(
        _emb(spark, sf_dir).select("vec_id", "label", "embedding"),
        "embeddings (neardup-LSH twin)",
    )
    planes = plane_components(64)
    blocks: dict[tuple, list[int]] = {}
    vecs: dict[int, list[float]] = {}
    nrm: dict[int, float] = {}
    for r in rows:
        vid = int(r.vec_id)
        v = [float(x) for x in r.embedding]
        vecs[vid] = v
        nrm[vid] = math.sqrt(_fold_dot(v, v))
        for band in range(ANN_BANDS):
            bucket = 0
            for i in range(ANN_PLANES_PER_BAND):
                p = band * ANN_PLANES_PER_BAND + i
                if _fold_dot(v, planes[p]) > 0:
                    bucket += 1 << i
            blocks.setdefault((r.label, band, bucket), []).append(vid)
    cand: set[tuple[int, int]] = set()
    for members in blocks.values():
        members.sort()
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((a, b))
    threshold = _QSIM._NEARDUP_THRESHOLD
    out = []
    for a, b in sorted(cand):
        cos = _fold_dot(vecs[a], vecs[b]) / (nrm[a] * nrm[b])
        if cos >= threshold:
            out.append((a, b, cos))
    return spark.createDataFrame(
        out, "vec_a BIGINT, vec_b BIGINT, cos DOUBLE"
    )


@_twin(
    "streaming_ivfpq_index",
    "batch one-shot encode over the table — no stream, no store "
    "(ivf_assignments + pq_encode)",
)
def _ivfpq_stream_batch_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch half of live index maintenance: coarse-assign and
    PQ-encode the WHOLE embeddings table in one shot against the same
    frozen quantizers, bypassing the streaming machinery entirely (no
    micro-batches, no checkpoint, no partitioned append store, no
    store re-read). Identity verifies that batch boundaries and the
    append/commit path leave no trace in the drained store's rows —
    the run_ivfpq_index_stream exactness contract, parity-recorded."""
    from ..operators.similarity import ivf_assignments, pq_encode

    emb = _emb(spark, sf_dir)
    cents = QS._pretrained_cents(spark, sf_dir)
    books = QS._pretrained_pq_books(spark, sf_dir)
    assigned = ivf_assignments(emb, cents=cents).select("vec_id", "centroid_id")
    codes = pq_encode(emb, books).join(assigned, "vec_id")
    return codes.select(
        "vec_id",
        F.col("centroid_id").cast("int").alias("centroid_id"),
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_str"),
    )


def _pca_tolerant_compare(srows: list, trows: list) -> bool:
    """vec_id sets equal; per-component |spark - numpy| <= 2e-5 (the
    test suite's bound for one-pass vs two-pass covariance)."""
    def parse(rows):
        return {r[0]: [float(x) for x in r[1].split()] for r in rows}

    s, t = parse(srows), parse(trows)
    if set(s) != set(t):
        return False
    return all(
        len(s[k]) == len(t[k])
        and all(abs(a - b) <= 2e-5 for a, b in zip(s[k], t[k]))
        for k in s
    )


TWIN_COMPARE["embedding_pca_whitened"] = _pca_tolerant_compare


# NOT @_twin-registered since r15: the entry gained a DuckDB oracle
# (the unrolled merge-loop replay in queries/text_analysis.py), and
# the twins-table contract reserves TWINS for oracle-less entries — a
# twin would downgrade the recorded evidence. The replica stays as
# pytest evidence (tests/test_bpe.py compares it to the entry).
def unicode_bpe_python_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-machine replica of the unicode BPE entry: unicode
    tokenization (lower, then maximal runs of category-L characters —
    the same contract as operators/tokenize.py:unicode_tokenize,
    restated via unicodedata instead of Java regex), Sennrich merge
    loop, per-word segmentation. Shares no execution path OR
    tokenizer implementation with the entry, so identity verifies the
    Unicode tokenization agreement AND the merge sequence AND the
    fold segmentation."""
    import unicodedata

    from ..operators.text_analysis import BPE_END, BPE_N_MERGES
    from ._unicode import scoped_unicode_docs

    def uni_tokens(text: str) -> list[str]:
        out: list[str] = []
        cur: list[str] = []
        for ch in text.lower():
            if unicodedata.category(ch).startswith("L"):
                cur.append(ch)
            elif cur:
                out.append("".join(cur))
                cur = []
        if cur:
            out.append("".join(cur))
        return out

    texts = [
        r.text
        for r in collect_bounded(
            scoped_unicode_docs(spark, sf_dir).select("text"),
            "unicode_fixture.text (unicode BPE twin)",
        )
    ]
    freqs: dict[str, int] = {}
    for text in texts:
        for w in uni_tokens(text):
            freqs[w] = freqs.get(w, 0) + 1
    words = {w: list(w) + [BPE_END] for w in freqs}
    for _rank in range(1, BPE_N_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freqs[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    rows = [
        (w, freqs[w], len(words[w]), " ".join(words[w])) for w in sorted(freqs)
    ]
    return spark.createDataFrame(
        rows, "word STRING, freq BIGINT, n_subwords BIGINT, subwords STRING"
    )
