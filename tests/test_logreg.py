"""Unit tests for the distributed logistic-regression quality
classifier (operators/logreg.py): the fit must actually LEARN on
separable data (loss decreases, accuracy beats chance), be
deterministic across re-fits, and score map-only."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import logreg


@pytest.fixture(scope="module")
def separable(spark):
    """200 points in 17-d: class 1 shifted +1.0 along dims 0-3 over a
    deterministic pseudo-random base, plus a constant 1.0 bias feature
    at dim 16 — fit_logreg has no implicit intercept (the docstring's
    append-a-constant contract), and without one the class-0 cloud is
    centred ON the w.x=0 boundary."""
    import hashlib

    rows = []
    for i in range(200):
        v = []
        for d in range(16):
            h = int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
            v.append(h / 2**31 - 1.0)
        y = 1.0 if i % 2 == 0 else 0.0
        if y:
            for d in range(4):
                v[d] += 1.0
        v.append(1.0)
        rows.append((i, v, y))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, y double").cache()
    yield df
    df.unpersist()


def test_fit_learns_separable_signal(spark, separable):
    w = logreg.fit_logreg(separable, "y", iters=5, lr=2.0, n_dims=17)
    # the informative dims carry the largest positive weights
    top = set(np.argsort(w)[-4:])
    assert top == {0, 1, 2, 3}, w[:8]
    scored = logreg.score(separable, w)
    acc = (
        scored.select(
            ((F.col("score") >= 0.5).cast("double") == F.col("y")).cast("int").alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.9, acc


def test_fit_is_deterministic(spark, separable):
    w1 = logreg.fit_logreg(separable, "y", iters=2, n_dims=17)
    w2 = logreg.fit_logreg(separable, "y", iters=2, n_dims=17)
    assert np.array_equal(w1, w2)
    # every weight sits on the 1e-6 grid (the portable rounding contract)
    assert np.array_equal(w1, np.floor(w1 * 1e6 + 0.5) / 1e6)


def test_more_iterations_reduce_log_loss(spark, separable):
    def loss(iters):
        w = logreg.fit_logreg(separable, "y", iters=iters, lr=2.0, n_dims=17)
        s = logreg.score(separable, w)
        eps = 1e-9
        nll = -(
            F.col("y") * F.log(F.col("score") + eps)
            + (1 - F.col("y")) * F.log(1 - F.col("score") + eps)
        )
        return s.select(nll.alias("l")).agg(F.avg("l")).first()[0]

    assert loss(4) < loss(1)


def test_score_plan_is_map_only(spark, separable):
    import contextlib
    import io

    w = logreg.fit_logreg(separable, "y", iters=1, n_dims=17)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        logreg.score(separable, w).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
