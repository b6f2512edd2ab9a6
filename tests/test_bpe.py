"""Unit tests for distributed BPE fitting (operators/bpe.py): the
doubled-replace merge application must equal exact greedy left-to-right
merging (the overlap cases that break a single replace pass), fits are
deterministic under ties, and encode counts reflect the learned rules."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import bpe


def _apply(spark, seq: str, a: str, b: str) -> str:
    df = spark.createDataFrame([(f" {seq} ",)], "seq string")
    return df.select(bpe.merge_once(F.col("seq"), a, b).alias("s")).first()["s"]


def _greedy(tokens: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for t in tokens:
        if out and out[-1] == a and t == b:
            out[-1] = a + b
        else:
            out.append(t)
    return out


@pytest.mark.parametrize(
    "tokens,a,b",
    [
        (["a", "b", "a", "b", "a", "b"], "a", "b"),      # alternation: single pass misses the middle
        (["a", "a", "a", "a"], "a", "a"),                # self-merge run: greedy pairs disjointly
        (["a", "a", "a"], "a", "a"),                     # odd run leaves a tail
        (["x", "a", "b", "b", "a", "b", "x"], "a", "b"), # mixed neighbours
        (["a", "b"], "b", "a"),                          # no occurrence
    ],
)
def test_doubled_replace_equals_greedy(spark, tokens, a, b):
    got = _apply(spark, " ".join(tokens), a, b).strip().split(" ")
    assert got == _greedy(tokens, a, b)


def test_fit_learns_classic_merges(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the hat and the bat"), (3, "thematic threat")],
        "doc_id bigint, text string",
    )
    wc = bpe.word_counts(docs, top_v=50)
    merges = bpe.fit_bpe(wc, n_merges=3)
    assert [(m[1], m[2], m[3]) for m in merges] == [
        ("a", "t", "at"),
        ("t", "h", "th"),
        ("th", "e", "the"),
    ]
    # steps numbered from 1; counts weighted by word frequency
    assert [m[0] for m in merges] == [1, 2, 3]
    assert merges[0][4] >= merges[1][4] >= merges[2][4] > 0


def test_fit_stops_when_fully_merged(spark):
    docs = spark.createDataFrame([(1, "ab ab ab")], "doc_id bigint, text string")
    wc = bpe.word_counts(docs, top_v=10)
    merges = bpe.fit_bpe(wc, n_merges=10)
    # 'ab' -> one merge then no adjacent pairs remain anywhere
    assert len(merges) == 1 and merges[0][3] == "ab"


def test_encode_counts_shrink_with_merges(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the hat and the bat")],
        "doc_id bigint, text string",
    )
    wc = bpe.word_counts(docs, top_v=50)
    merges = bpe.fit_bpe(wc, n_merges=4)
    base = {r.doc_id: r.bpe_tokens for r in bpe.encode(docs, []).collect()}
    enc = {r.doc_id: r.bpe_tokens for r in bpe.encode(docs, merges).collect()}
    for d in base:
        assert enc[d] < base[d]  # learned merges compress every doc here
    # no merges = plain character counts of the qualifying words
    assert base[1] == len("thecatsatonthemat")
