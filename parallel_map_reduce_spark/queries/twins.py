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


def _twin(name: str, label: str):
    def deco(fn):
        TWINS[name] = (label, fn)
        return fn

    return deco


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _pred() -> F.Column:
    return F.col("vec_id") % QS._QUERY_MOD == 0


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
