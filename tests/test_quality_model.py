"""Contracts for the distributed quality-classifier training
(operators/quality_model.py).

The registry entry is rows-only in the driver gate (20+ GD iterations
are not one-shot SQL), so these tests ARE its correctness evidence:

1. the Spark-trained weights equal a pure-Python gradient-descent
   replica run on the same standardized features (the replica
   reproduces the rounded-DECIMAL order-free reduction exactly);
2. training is bit-deterministic under repartitioning (the whole point
   of the decimal gradient sums);
3. the trained model actually separates the weak-label classes.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from parallel_map_reduce_spark.operators.quality_model import (
    FEATURES,
    GRAD_SCALE,
    doc_quality_features,
    feature_stats,
    score_logreg,
    standardize,
    train_logreg,
)
from parallel_map_reduce_spark.sources.catalog import load_table

LR, ITERS = 2.0, 25  # fewer iters than prod default to keep tests fast


def _fast_sigmoid(z: float) -> float:
    return 0.5 * (1.0 + z / (1.0 + abs(z)))


def _python_gd(rows, lr: float, iters: int) -> list[float]:
    """Reference replica: same squashing, same per-term rounding, exact
    Decimal sums (order-free like Spark's DECIMAL aggregation).
    Spark's round() on a double goes through the shortest-decimal
    representation (Double.toString), which repr() also produces — so
    quantizing Decimal(repr(x)) reproduces it bit-for-bit."""
    q = Decimal(1).scaleb(-GRAD_SCALE)
    n = len(rows)
    weights = [0.0] * len(FEATURES)
    for _ in range(iters):
        sums = [Decimal(0)] * len(FEATURES)
        for r in rows:
            z = sum(w * r[c] for w, c in zip(weights, FEATURES))
            resid = _fast_sigmoid(z) - r["label"]
            for j, c in enumerate(FEATURES):
                sums[j] += Decimal(repr(resid * r[c])).quantize(q, ROUND_HALF_UP)
        weights = [w - lr * float(s) / n for w, s in zip(weights, sums)]
    return weights


@pytest.fixture(scope="module")
def std_feat(spark, sf_dir):
    feat = doc_quality_features(load_table(spark, sf_dir, "documents")).persist()
    std = standardize(feat, feature_stats(feat))
    yield std
    feat.unpersist()


def test_spark_gd_matches_python_replica(std_feat):
    spark_w = train_logreg(std_feat, lr=LR, iters=ITERS)
    rows = [r.asDict() for r in std_feat.collect()]
    py_w = _python_gd(rows, lr=LR, iters=ITERS)
    assert spark_w == pytest.approx(py_w, abs=1e-9), (spark_w, py_w)


def test_training_bit_deterministic_under_repartition(std_feat):
    w1 = train_logreg(std_feat, lr=LR, iters=ITERS)
    w2 = train_logreg(std_feat.repartition(7), lr=LR, iters=ITERS)
    assert w1 == w2  # exact — decimal sums are reduction-order-free


def test_model_separates_weak_label(std_feat):
    w = train_logreg(std_feat, lr=LR, iters=ITERS)
    scored = score_logreg(std_feat, w).collect()
    pos = [r.score for r in scored if r.label == 1.0]
    neg = [r.score for r in scored if r.label == 0.0]
    assert sum(pos) / len(pos) > sum(neg) / len(neg) + 0.3
    acc = sum(1 for r in scored if r.pred == int(r.label)) / len(scored)
    assert acc >= 0.9


def test_sidecar_model_scores_equal_fresh_training(spark, sf_dir):
    """The registry entry serves from the persisted model sidecar
    (queries/curation.py:_pretrained_quality_model); its scored rows
    must be BIT-IDENTICAL to end-to-end train_and_score — training is
    deterministic and the JSON float round-trip is repr-exact."""
    from parallel_map_reduce_spark.operators.quality_model import train_and_score
    from parallel_map_reduce_spark.queries.curation import documents_quality_logreg

    fresh = {
        tuple(r)
        for r in train_and_score(
            load_table(spark, sf_dir, "documents")
        ).collect()
    }
    cached = {tuple(r) for r in documents_quality_logreg(spark, sf_dir).collect()}
    assert cached == fresh and len(cached) > 0
