"""Durable inverted text index: the BM25 build/query split — the text
modality's version of the IVF/PQ index lifecycle (similarity.py): pay
the corpus-scale pass ONCE, persist a partition-prunable artifact, and
answer every subsequent query touching only the query terms' slice.

Artifact layout at ``path`` (the save_ivf_index discipline —
similarity.py:213):

* ``postings/`` — (term, doc_id, tf, dl) parquet PARTITIONED BY a
  64-way md5 term bucket: a query's terms map to a handful of buckets,
  so the read is STATICALLY partition-pruned (the bucket filter is a
  plain partition predicate — stronger than the IVF store's dynamic
  pruning, no probe join needed). Doc length rides DENORMALISED in the
  posting row, so query-time needs NO join against a corpus-sized
  doc-length relation.
* ``stats/`` — (term, df) with the same bucket partitioning.
* ``meta/`` — one row: (n_docs, avgdl), avgdl pre-rounded to 6
  decimals exactly as the live bm25_search computes it, so the indexed
  path is bit-identical to the one-shot path and pins against the SAME
  oracle.

Query-time plan shape: pruned postings scan (|query terms| buckets)
⋈ broadcast stats ⋈ broadcast meta → TakeOrdered top-n. Zero Python,
zero corpus-side exchanges, cost bounded by the query terms' document
frequency — at 100 TB the index is built by one job and queried by
thousands.

Reference scope note: the reference has no search (its unit is the
exported record); this extends the engine's retrieval family alongside
the ANN indexes.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .textops import _doc_tokens

N_TERM_BUCKETS = 64


def term_bucket(term: Column) -> Column:
    """md5-derived term bucket — the postings partition key. Matches
    ``_py_term_bucket`` bit-for-bit so the query side can enumerate its
    buckets driver-side without touching the index."""
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("bigint")
        % N_TERM_BUCKETS
    )


def _py_term_bucket(term: str) -> int:
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) % N_TERM_BUCKETS


def build_text_index(
    corpus: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """ONE corpus-scale pass to the three artifact relations. The
    shuffles are the (doc, term) tf aggregation and the vocabulary-sized
    df aggregation — the same work the live bm25_search pays per query,
    paid once."""
    toks = _doc_tokens(corpus, text_col, id_col)
    dlen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    postings = (
        tf.join(dlen, id_col)
        .select(
            F.col("t").alias("term"),
            F.col(id_col).alias("doc_id"),
            "tf",
            "dl",
            term_bucket(F.col("t")).alias("bucket"),
        )
    )
    postings.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "postings")
    )
    stats = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df")).select(
        F.col("t").alias("term"), "df", term_bucket(F.col("t")).alias("bucket")
    )
    stats.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(path, "stats")
    )
    meta = (
        corpus.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(dlen.agg(F.round(F.avg("dl"), 6).alias("avgdl"))))
    )
    meta.write.mode("overwrite").parquet(os.path.join(path, "meta"))


def query_text_index(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """BM25 top-n from the durable index. The bucket set is computed
    driver-side from the query terms alone, so the postings/stats scans
    carry a STATIC partition filter — only those buckets' files are
    listed or read (pinned in tests/test_plans.py). Identical scoring
    arithmetic to the live bm25_search (same idf, same rounding), so
    both paths share one oracle."""
    buckets = sorted({_py_term_bucket(t) for t in query_terms})
    postings = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(query_terms)))
    )
    stats = (
        spark.read.parquet(os.path.join(path, "stats"))
        .filter(F.col("bucket").isin(buckets))
        .filter(F.col("term").isin(list(query_terms)))
        .select("term", "df")
    )
    meta = spark.read.parquet(os.path.join(path, "meta"))

    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        postings.join(F.broadcast(stats), "term")
        .join(F.broadcast(meta))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum(contrib), 6).alias("score6"),
        )
    )
    return (
        scored.orderBy(F.desc("score6"), F.asc("doc_id"))
        .limit(top_n)
        .select("doc_id", "n_terms_matched", F.round("score6", 3).alias("score"))
    )
