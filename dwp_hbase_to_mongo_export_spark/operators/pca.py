"""Distributed PCA over embedding columns.

The scale shape is the classic one for second-order statistics at
100 TB: each Arrow batch computes its OWN dense partial moments with one
BLAS call (X^T X, column sums, count — a (d^2/2 + d + 1)-sized result
regardless of batch rows), those partials flow through ONE
map-side-combined aggregation keyed by (dim_i, dim_j), and the d x d
covariance — a few KB for d=64 — is finished on the driver. Corpus
vectors never shuffle; only moment entries do. The eigendecomposition
runs driver-side on the tiny matrix (numpy.linalg.eigh — the same
bounded-scalar class as kmeans_fit's centroid update), and projection
is a map-only matmul with the component matrix riding the task closure.

The covariance aggregation is oracle-checked (queries_extensions.
embedding_covariance); the eigen/projection layer is not
SQL-expressible and is pinned by unit tests instead (orthonormality,
eigenvalue ordering, reconstruction-error monotonicity in k).

Reference scope note: no statistical operators exist in the reference
(SURVEY §2 "deliberately absent"); this extends the engine's embedding
toolkit (whitening / dimensionality reduction ahead of PQ or
clustering, per Jégou et al.'s preprocessing guidance).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def second_moments(
    emb: DataFrame, vec_col: str = "embedding", n_dims: int = 64
) -> DataFrame:
    """(dim_i, dim_j, s_xy, s_x, s_y, n) for the upper triangle
    (dim_i <= dim_j): everything needed to finish covariance (or
    correlation) per entry. One mapInPandas pass emitting per-batch
    partials + one aggregation; the shuffle carries only
    (d^2/2 + d) * n_batches moment rows, never vectors."""

    tri_i, tri_j = np.triu_indices(n_dims)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            G = X.T @ X  # d x d gram in one BLAS call
            s = X.sum(axis=0)
            yield pd.DataFrame(
                {
                    "dim_i": tri_i,
                    "dim_j": tri_j,
                    "s_xy": G[tri_i, tri_j],
                    "s_x": s[tri_i],
                    "s_y": s[tri_j],
                    "n": np.int64(len(pdf)),
                }
            )

    from ..sources.parquet import ensure_parallelism

    schema = "dim_i int, dim_j int, s_xy double, s_x double, s_y double, n bigint"
    # the BLAS pass is CPU-bound: decouple its parallelism from the
    # input file layout (a small single-file table is ONE split)
    part = ensure_parallelism(emb.select(vec_col)).mapInPandas(partials, schema)
    return part.groupBy("dim_i", "dim_j").agg(
        F.sum("s_xy").alias("s_xy"),
        F.sum("s_x").alias("s_x"),
        F.sum("s_y").alias("s_y"),
        F.sum("n").alias("n"),
    )


def covariance(
    emb: DataFrame, vec_col: str = "embedding", n_dims: int = 64
) -> DataFrame:
    """(dim_i, dim_j, cov) upper triangle — population covariance
    cov = s_xy/n - (s_x/n)(s_y/n), finished from the single-pass
    moments. This exact algebraic form (means divided out FIRST) is
    mirrored by the DuckDB oracle so both engines round the same
    quantity."""
    m = second_moments(emb, vec_col=vec_col, n_dims=n_dims)
    n = F.col("n").cast("double")
    return m.select(
        "dim_i",
        "dim_j",
        (F.col("s_xy") / n - (F.col("s_x") / n) * (F.col("s_y") / n)).alias("cov"),
    )


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding", n_dims: int = 64
) -> np.ndarray:
    """The full symmetric d x d covariance as a driver-side numpy array
    (d^2 doubles — bounded by construction)."""
    C = np.zeros((n_dims, n_dims))
    for r in covariance(emb, vec_col=vec_col, n_dims=n_dims).collect():
        C[r["dim_i"], r["dim_j"]] = r["cov"]
        C[r["dim_j"], r["dim_i"]] = r["cov"]
    return C


def fit_pca(
    emb: DataFrame, k: int, vec_col: str = "embedding", n_dims: int = 64
):
    """(components k x d, eigenvalues k, mean d): top-k principal
    directions by eigenvalue. Sign convention: each component's
    largest-|coefficient| entry is made positive, so the decomposition
    is deterministic (eigh's signs are arbitrary)."""
    m = second_moments(emb, vec_col=vec_col, n_dims=n_dims).collect()
    C = np.zeros((n_dims, n_dims))
    s = np.zeros(n_dims)
    n = 0
    for r in m:
        i, j = r["dim_i"], r["dim_j"]
        n = max(n, r["n"])
        cov = r["s_xy"] / r["n"] - (r["s_x"] / r["n"]) * (r["s_y"] / r["n"])
        C[i, j] = C[j, i] = cov
        if i == j:
            s[i] = r["s_x"] / r["n"]
    vals, vecs = np.linalg.eigh(C)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return comps, vals[order], s


def project(
    emb: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Adds ``out_col`` = (x - mean) @ components^T — map-only, one
    BLAS matmul per Arrow batch, components ride the closure (k x d
    doubles)."""
    Ct = np.asarray(components, dtype=np.float64).T  # d x k
    mu = np.asarray(mean, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="object")
        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series(list((X - mu) @ Ct))

    return emb.withColumn(out_col, _proj(F.col(vec_col)))
