"""Unit tests for distributed PCA (operators/pca.py): the single-pass
moment aggregation must match numpy's covariance exactly (same algebra),
and the eigen/projection layer — not SQL-expressible, so pinned here
rather than by the oracle gate — must satisfy the linear-algebra
invariants that make it PCA."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import pca
from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings").cache()
    yield df
    df.unpersist()


def _np_matrix(emb):
    rows = emb.select("embedding").collect()
    return np.stack([np.asarray(r[0], dtype=np.float64) for r in rows])


def test_covariance_matches_numpy(spark, emb):
    X = _np_matrix(emb)
    n = len(X)
    expected = (X.T @ X) / n - np.outer(X.mean(axis=0), X.mean(axis=0))
    C = pca.covariance_matrix(emb)
    assert np.allclose(C, expected, atol=1e-9)
    assert np.allclose(C, C.T)  # symmetric by construction


def test_fit_pca_invariants(spark, emb):
    k = 8
    comps, vals, mean = pca.fit_pca(emb, k=k)
    assert comps.shape == (k, 64) and vals.shape == (k,)
    # orthonormal rows
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    # eigenvalues descending and non-negative (covariance is PSD)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(k - 1))
    assert vals[-1] >= -1e-9
    # deterministic sign convention: largest-|coef| entry positive
    for row in comps:
        assert row[np.argmax(np.abs(row))] > 0
    # mean really is the column mean
    X = _np_matrix(emb)
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)


def test_projection_variance_equals_eigenvalues(spark, emb):
    comps, vals, mean = pca.fit_pca(emb, k=4)
    proj = pca.project(emb, comps, mean)
    P = np.stack(
        [np.asarray(r[0], dtype=np.float64) for r in proj.select("pca").collect()]
    )
    # per-component variance of the projected data = the eigenvalue
    assert np.allclose(P.var(axis=0), vals, atol=1e-8)
    # components are uncorrelated in projection space
    C = np.cov(P.T, bias=True)
    assert np.allclose(C - np.diag(np.diag(C)), 0, atol=1e-8)


def test_reconstruction_error_monotone_in_k(spark, emb):
    X = _np_matrix(emb)
    errs = []
    for k in (2, 8, 32, 64):
        comps, _, mean = pca.fit_pca(emb, k=k)
        Xc = X - mean
        R = Xc - (Xc @ comps.T) @ comps
        errs.append(float((R**2).sum()))
    assert errs == sorted(errs, reverse=True)
    assert errs[-1] < 1e-12  # k = d reconstructs exactly
