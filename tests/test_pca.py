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


def test_opq_rotation_preserves_geometry(spark, emb):
    """opq_rotate is a pure orthonormal rotation + permutation: pairwise
    L2 distances and cosines must be EXACTLY preserved (to fp noise),
    and the eigenvalue allocation must balance per-subspace variance
    far better than the naive contiguous split of the PCA ordering."""
    from dwp_hbase_to_mongo_export_spark.operators import similarity

    m = 4
    sample = emb
    rotated, R = similarity.opq_rotate(sample, m=m)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-9)

    rows = rotated.filter(F.col("vec_id") < 50).select("embedding", "rotated").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    Y = np.stack([np.asarray(r["rotated"], dtype=np.float64) for r in rows])
    dX = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=2)
    dY = np.linalg.norm(Y[:, None, :] - Y[None, :, :], axis=2)
    assert np.allclose(dX, dY, atol=1e-9)
    assert np.allclose(np.linalg.norm(X, axis=1), np.linalg.norm(Y, axis=1), atol=1e-9)

    # balance: spread of per-subspace VARIANCE sums under the allocation
    # vs the naive contiguous split of descending eigenvalues
    comps, vals, _ = pca.fit_pca(sample, k=64)
    perm = similarity.opq_allocate(vals, m)

    def spread(order):
        sums = [sum(vals[d] for d in order[j * 16 : (j + 1) * 16]) for j in range(m)]
        return max(sums) - min(sums)

    naive = list(np.argsort(vals)[::-1])
    assert spread(perm) < spread(naive) * 0.25, (spread(perm), spread(naive))


def test_opq_rotated_pq_search_is_valid(spark, emb):
    """build_pq_index/query_pq compose with the rotated corpus: every
    query gets k ranked neighbors drawn from real corpus ids, and the
    rotated index's ADC recall is in the same band as the plain one
    (rotation changes quantisation error, not search mechanics)."""
    from dwp_hbase_to_mongo_export_spark.operators import similarity
    from dwp_hbase_to_mongo_export_spark.operators._cache import release

    def recall(vec_col, frame):
        codes, books = similarity.build_pq_index(
            frame, m=4, k_codes=8, iters=1, vec_col=vec_col, persist=False
        )
        got = similarity.query_pq(
            codes, books, frame.filter(F.col("vec_id") < 10),
            k=5, vec_col=vec_col,
        )
        approx = {(r.query_id, r.neighbor_id) for r in got.collect()}
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(
                frame, k=5, max_query_id=10, vec_col=vec_col
            ).collect()
        }
        ids = {r[0] for r in frame.select("vec_id").collect()}
        assert all(n in ids and q != n for q, n in approx)
        assert len({q for q, _ in approx}) == 10
        return len(approx & exact) / len(exact)

    plain = recall("embedding", emb)
    rotated_df, _ = similarity.opq_rotate(emb, m=4)
    rot = recall("rotated", rotated_df.select("vec_id", "rotated"))
    release("pq_index")
    # not asserted superior (fixture embeddings are near-isotropic) but
    # must stay in the same band — a broken rotation would crater it
    assert rot >= plain - 0.25, (plain, rot)


def test_opq_rotation_improves_recall_on_skewed_spectrum(spark, emb):
    """The measured OPQ win (not just preserved geometry): on a
    variance-skewed corpus — dim i scaled by 0.82**i, the decaying
    spectrum shape opq_allocate's docstring argues about — the naive
    contiguous subspace split concentrates nearly all energy in
    subspace 0 (8 codewords quantising almost the entire signal while
    the other three subspaces quantise noise), and ADC recall craters.
    Eigenvalue-allocation rotation rebalances per-subspace variance and
    must recover a strictly, materially higher recall@5. Everything is
    deterministic (fixed scales, deterministic fits/ties), so this pins
    an exact measured gap, not a statistical tendency. The fixture's
    own near-isotropic embeddings can't show this win (documented in
    test_opq_rotated_pq_search_is_valid); the skewed spectrum is the
    case OPQ exists for."""
    from dwp_hbase_to_mongo_export_spark.operators import similarity

    scales = ",".join(f"CAST({0.82 ** i} AS DOUBLE)" for i in range(64))
    skewed = emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, (x, i) -> x * element_at(array({scales}), i + 1))"
        ).alias("embedding"),
    )

    def recall(frame, vec_col):
        codes, books = similarity.build_pq_index(
            frame, m=4, k_codes=8, iters=1, vec_col=vec_col, persist=False
        )
        got = similarity.query_pq(
            codes, books, frame.filter(F.col("vec_id") < 20), k=5, vec_col=vec_col
        )
        approx = {(r.query_id, r.neighbor_id) for r in got.collect()}
        exact = {
            (r.query_id, r.neighbor_id)
            for r in similarity.brute_force_topk(
                frame, k=5, max_query_id=20, vec_col=vec_col
            ).collect()
        }
        return len(approx & exact) / len(exact)

    plain = recall(skewed, "embedding")
    rotated, _ = similarity.opq_rotate(skewed, m=4)
    rot = recall(rotated.select("vec_id", "rotated"), "rotated")
    assert rot >= plain + 0.1, (plain, rot)  # material, not noise-level
    assert rot >= 2 * plain, (plain, rot)    # and multiplicatively so
