"""DSIR importance-resampling pins (operators/dsir.py): the bucket
models against a brute-force Python reference, the weight semantics
(target-like scores higher), and the Gumbel top-k sample contract."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import dsir

CORPUS = [
    # (doc_id, text, is_target)
    (1, "the quick brown fox", True),
    (2, "the lazy dog sleeps", True),
    (3, "quick brown foxes jump", True),
    (4, "zzz qqq xxx vvv", False),
    (5, "qqq zzz vvv www", False),
    (6, "the quick dog", False),  # target-like vocabulary, raw slice
    (7, "", False),  # token-less
]


def _bucket(tok: str, n: int = dsir.N_BUCKETS) -> int:
    return int(hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:8], 16) % n


def _py_models(n: int = dsir.N_BUCKETS):
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _id, text, is_t in CORPUS:
        for tok in text.split():
            b = _bucket(tok, n)
            cr[b] = cr.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    return {
        b: round(
            math.log((ct.get(b, 0) + 1.0) / (tt + n))
            - math.log((cr[b] + 1.0) / (tr + n)),
            9,
        )
        for b in cr
    }


def _df(spark):
    return spark.createDataFrame(
        [(i, t, "en" if is_t else "xx") for i, t, is_t in CORPUS],
        "doc_id long, text string, lang string",
    )


def test_bucket_models_match_python_reference(spark):
    got = {
        r["bucket"]: r["lr"]
        for r in dsir.bucket_models(_df(spark), F.col("lang") == "en").collect()
    }
    assert got == _py_models()


def test_importance_weights_rank_target_like_docs_higher(spark):
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_logweights(
            _df(spark), F.col("lang") == "en"
        ).collect()
    }
    # target docs score above the raw-only vocabulary docs
    assert min(w[1], w[2], w[3]) > max(w[4], w[5])
    # doc 6 shares the target vocabulary: it should also score above
    # the raw-gibberish docs even though it is NOT in the target slice —
    # the whole point of DSIR (select raw docs that LOOK target-like)
    assert w[6] > max(w[4], w[5])


def test_importance_weights_tokenless_doc_is_neutral(spark):
    rows = {
        r["doc_id"]: r
        for r in dsir.importance_logweights(
            _df(spark), F.col("lang") == "en"
        ).collect()
    }
    assert rows[7]["n_tokens"] == 0
    assert rows[7]["logw"] == 0.0
    assert len(rows) == len(CORPUS)  # every doc present


def test_importance_weights_match_python_reference(spark):
    models = _py_models()
    expect = {}
    for _id, text, _t in CORPUS:
        s = sum(models[_bucket(tok)] for tok in text.split())
        expect[_id] = round(s, 3) + 0.0
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir.importance_logweights(
            _df(spark), F.col("lang") == "en"
        ).collect()
    }
    assert got == expect


def test_gumbel_topk_contract(spark):
    w = dsir.importance_logweights(_df(spark), F.col("lang") == "en")
    s1 = dsir.gumbel_topk(w, k=4).collect()
    s2 = dsir.gumbel_topk(w, k=4).collect()
    assert sorted(r["rank"] for r in s1) == [1, 2, 3, 4]
    ids = [r["doc_id"] for r in s1]
    assert len(set(ids)) == 4  # without replacement
    assert s1 == s2  # deterministic by construction (md5 uniforms)


def test_gumbel_topk_biases_toward_heavy_weights(spark):
    """With one overwhelming weight the Gumbel draw must rank it first:
    logw >> Gumbel noise scale."""
    df = spark.createDataFrame(
        [(1, 50.0), (2, -50.0), (3, -50.0)], "doc_id long, logw double"
    )
    top = dsir.gumbel_topk(df, k=1).collect()
    assert top[0]["doc_id"] == 1


def test_streaming_counts_equal_batch_counts(spark, sf_dir):
    """The streaming SUM-fold drains to the exact batch count
    statistics — bucket counts merge like the CMS sketch, so model
    maintenance never needs a corpus refit."""
    from dwp_hbase_to_mongo_export_spark.sources.parquet import load_table
    from dwp_hbase_to_mongo_export_spark.streaming import incremental as st

    got = st.run_available_now(st.dsir_counts_stream(spark, sf_dir))
    docs = load_table(spark, sf_dir, "documents")
    want = dsir.bucket_counts(docs, F.col("lang") == "en")
    assert {(r["bucket"], r["ct"], r["cr"]) for r in got.collect()} == {
        (r["bucket"], r["ct"], r["cr"]) for r in want.collect()
    }
