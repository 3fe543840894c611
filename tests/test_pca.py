"""Distributed PCA whitening vs a full-numpy reference.

``covariance_stats`` aggregates per-batch sufficient statistics, so its
result must equal (to float tolerance) the covariance numpy computes on
the collected matrix; ``pca_whiten``'s projections must match the
reference projection under the same sign canonicalization, and the
whitened components must actually have ~unit variance — the property
whitening exists for.
"""

from __future__ import annotations

import numpy as np
import pytest

from parallel_map_reduce_spark.functions.arrow_ops import (
    covariance_stats,
    pca_whiten,
)
from parallel_map_reduce_spark.sources.catalog import load_table

K = 8


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([[float(x) for x in r.embedding] for r in rows])
    return ids, mat


def test_covariance_stats_match_numpy(spark, sf_dir, emb_np):
    _, mat = emb_np
    n, mean, cov = covariance_stats(load_table(spark, sf_dir, "embeddings"))
    assert n == mat.shape[0]
    np.testing.assert_allclose(mean, mat.mean(axis=0), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        cov, np.cov(mat, rowvar=False), rtol=1e-8, atol=1e-10
    )


def _ref_whiten(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:k]
    vals, vecs = eigvals[order], eigvecs[:, order]
    for j in range(vecs.shape[1]):
        i = int(np.abs(vecs[:, j]).argmax())
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    w = vecs / np.sqrt(np.maximum(vals, 1e-12))
    return (mat - mean) @ w


def test_pca_whiten_matches_reference_and_unit_variance(spark, sf_dir, emb_np):
    ids, mat = emb_np
    got_rows = pca_whiten(load_table(spark, sf_dir, "embeddings"), k=K).collect()
    got = {r.vec_id: np.array(r.comps) for r in got_rows}
    ref = _ref_whiten(mat, K)
    ref_by_id = {int(i): ref[j] for j, i in enumerate(ids)}
    assert set(got) == set(ref_by_id)
    all_got = np.array([got[i] for i in sorted(got)])
    all_ref = np.array([ref_by_id[i] for i in sorted(got)])
    # Operator rounds to 6 dp; eigenvector arithmetic differs in last
    # float bits between one-pass and two-pass covariance, so compare
    # at 1e-5 absolute — far below any component's scale (variance 1).
    np.testing.assert_allclose(all_got, all_ref, atol=2e-5)
    var = all_got.var(axis=0, ddof=1)
    np.testing.assert_allclose(var, np.ones(K), rtol=1e-3)
