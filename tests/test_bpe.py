"""Unit tests for distributed BPE fitting (operators/bpe.py): the
two-space-boundary single-replace merge application must equal exact
greedy left-to-right merging — including the a == b self-merge runs of
length 5 and 6 where the earlier doubled-replace formulation diverged —
fits are deterministic under ties, encode counts reflect the learned
rules, wordless documents are emitted as zero (not dropped), and
encode_tokens produces the vocabulary-id'd sequence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dwp_hbase_to_mongo_export_spark.operators import bpe


def _apply(spark, tokens: list[str], a: str, b: str) -> list[str]:
    padded = bpe.SEP + bpe.SEP.join(tokens) + bpe.SEP
    df = spark.createDataFrame([(padded,)], "seq string")
    s = df.select(bpe.merge_once(F.col("seq"), a, b).alias("s")).first()["s"]
    return s.strip().split(bpe.SEP)


def _greedy(tokens: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


@pytest.mark.parametrize(
    "tokens,a,b",
    [
        (["a", "b", "a", "b", "a", "b"], "a", "b"),      # alternation: shared boundaries
        (["a", "a", "a", "a"], "a", "a"),                # self-merge run: greedy pairs disjointly
        (["a", "a", "a"], "a", "a"),                     # odd run leaves a tail
        (["a"] * 5, "a", "a"),                           # first divergence of the old doubled replace
        (["a"] * 6, "a", "a"),                           # old doubled replace produced 4 tokens, greedy 3
        (["a"] * 7, "a", "a"),
        (["ha"] * 5, "ha", "ha"),                        # 'hahahahaha' after the (h,a) merge
        (["x", "a", "b", "b", "a", "b", "x"], "a", "b"), # mixed neighbours
        (["a", "a", "b", "b"], "a", "b"),                # merge output adjacent to leftovers
        (["a", "b"], "b", "a"),                          # no occurrence
        (["ab", "a", "b"], "a", "b"),                    # merged symbol must not re-match as prefix
        (["ba", "a", "b"], "a", "b"),                    # ...nor as suffix
    ],
)
def test_single_replace_equals_greedy(spark, tokens, a, b):
    assert _apply(spark, tokens, a, b) == _greedy(tokens, a, b)


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


def test_fit_handles_self_merge_runs_exactly(spark):
    # 'aaaaa' under repeated (a,a)-family merges: greedy gives
    # [aa, aa, a] after step 1, so step 2 sees (aa,aa) and (aa,a) tied
    # at 2 and the lexicographic tie-break picks (aa, a). The old
    # doubled replace produced [aa, a, aa], whose pair stats would have
    # learned (a, aa) instead — this pins the greedy-exact behaviour.
    docs = spark.createDataFrame([(1, "aaaaa aaaaa")], "doc_id bigint, text string")
    wc = bpe.word_counts(docs, top_v=10, max_len=5)
    merges = bpe.fit_bpe(wc, n_merges=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "a"), ("aa", "a")]


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


def test_encode_emits_zero_for_wordless_docs(spark):
    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "1234 !!!"), (3, "")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.bpe_tokens for r in bpe.encode(docs, []).collect()}
    assert got == {1: 6, 2: 0, 3: 0}  # wordless docs present with 0, not dropped


def test_encode_respects_length_bounds(spark):
    docs = spark.createDataFrame([(1, "a abc abcdef")], "doc_id bigint, text string")
    strict = {r.doc_id: r.bpe_tokens for r in bpe.encode(docs, [], min_len=3, max_len=3).collect()}
    assert strict == {1: 3}  # only 'abc' qualifies


def test_encode_tokens_ids_and_order(spark):
    docs = spark.createDataFrame(
        [(1, "the hat"), (2, "!!")], "doc_id bigint, text string"
    )
    wc = bpe.word_counts(docs, top_v=50)
    # all pairs tied at 1 -> lexicographic tie-break learns (a,t) then (h,at)
    merges = bpe.fit_bpe(wc, n_merges=2)
    assert [(m[1], m[2]) for m in merges] == [("a", "t"), ("h", "at")]
    out = bpe.encode_tokens(docs, merges).orderBy("doc_id", "word_idx", "tok_idx").collect()
    vocab = dict(bpe.vocabulary(merges))
    # doc 2 has no qualifying words -> no rows (encode() is the zero-emitting form)
    assert {r.doc_id for r in out} == {1}
    seq = [(r.word_idx, r.tok_idx, r.token) for r in out]
    assert seq == [(0, 0, "t"), (0, 1, "h"), (0, 2, "e"), (1, 0, "hat")]
    for r in out:
        assert r.token_id == vocab[r.token] and r.token_id >= 0
    # vocabulary: 26 base chars then merged symbols in learned order
    assert vocab["a"] == 0 and vocab["z"] == 25
    assert vocab["at"] == 26 and vocab["hat"] == 27
