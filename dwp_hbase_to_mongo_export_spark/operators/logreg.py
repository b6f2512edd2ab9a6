"""Distributed logistic-regression fitting over embedding features —
the learned quality-classifier stage of an LLM data pipeline (the
public FastText/CCNet-style filter idea: train a linear classifier on
labelled examples, score the whole corpus, keep by threshold).

Spark shape (the kmeans/pca discipline): batch gradient descent where
each iteration is ONE corpus pass — residuals are computed map-only
with the weight vector riding the task closure, each Arrow batch
contributes a BLAS X^T r partial, and the shuffle carries 64 partial
gradient entries per batch, never vectors. The d-sized weight update
runs on the driver (the bounded-scalar class).

Cross-engine determinism: the per-row dot product is rounded (floor
half-up, the portable form) BEFORE the sigmoid and the sigmoid is
rounded again, so both engines exponentiate identical doubles and any
1-ulp libm difference dies in the rounding grid; weights are re-rounded
to 6 decimals per iteration, absorbing partial-sum ordering noise
(~1e-13) far below the grid. This is what lets a 2-iteration fit be
value-checked against a DuckDB oracle that unrolls the same updates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round6(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5) / 1e6


def _dot_expr(vec_col: str, w: np.ndarray) -> Column:
    """Rounded w . x as a JVM expression: zip_with + ordered aggregate —
    the same left-to-right summation DuckDB's list_dot_product runs, so
    pre-rounding doubles are bit-identical across engines."""
    warr = F.array(*[F.lit(float(v)) for v in w])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), warr, lambda x, wv: x.cast("double") * wv),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(dot * 1e6 + F.lit(0.5)) / 1e6


def _residual_col(vec_col: str, y_col: str, w: np.ndarray) -> Column:
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_expr(vec_col, w)))
    s6 = F.floor(s * 1e6 + F.lit(0.5)) / 1e6
    return s6 - F.col(y_col).cast("double")


def fit_logreg(
    emb: DataFrame,
    y_col: str,
    iters: int = 2,
    lr: float = 1.0,
    vec_col: str = "embedding",
    n_dims: int = 64,
) -> np.ndarray:
    """Learn weights for P(y=1|x) = sigmoid(w . x), w0 = 0, full-batch
    gradient descent: w <- round6(w - lr * X^T(sigmoid6(Xw) - y) / n).
    ``y_col`` must be a 0/1 column. Returns the d-vector of weights
    (no bias term — embeddings here are zero-centred-ish; callers can
    append a constant feature for one)."""
    from ..sources.parquet import ensure_parallelism

    # every iteration re-scans this frame with a CPU-bound Arrow pass:
    # decouple parallelism from input file layout once up front
    emb = ensure_parallelism(emb)
    w = np.zeros(n_dims)
    for _ in range(iters):
        res = emb.select(
            F.col(vec_col).alias("_x"),
            _residual_col(vec_col, y_col, w).alias("_r"),
        )

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_x"]])
                g = X.T @ pdf["_r"].to_numpy(dtype=np.float64)
                yield pd.DataFrame(
                    {"j": np.arange(len(g), dtype=np.int32), "g": g,
                     "n": np.int64(len(pdf))}
                )

        rows = (
            res.mapInPandas(partials, "j int, g double, n bigint")
            .groupBy("j")
            .agg(F.sum("g").alias("g"), F.sum("n").alias("n"))
            .collect()
        )
        grad = np.zeros(n_dims)
        n = 1
        for r in rows:
            grad[r["j"]] = r["g"]
            n = r["n"]
        w = _round6(w - lr * grad / n)
    return w


def score(
    emb: DataFrame,
    w: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "score",
) -> DataFrame:
    """Adds ``out_col`` = rounded sigmoid(w . x) — the corpus-scoring
    pass, pure JVM expressions (codegen, no Python, no shuffle). Filter
    by threshold downstream: the keep/drop quality gate."""
    s = F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_expr(vec_col, w)))
    return emb.withColumn(out_col, F.floor(s * 1e6 + F.lit(0.5)) / 1e6)
