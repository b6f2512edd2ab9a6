"""Bounded edit-distance dedup (operators/editdist.py): brute-force
parity, pool-routing edge cases, and policy semantics.

The catalog gate (dedup_edit_distance / dedup_edit_apply /
edit_distance_report vs the DuckDB levenshtein oracle) proves
engine-vs-SQL agreement on the fixture; these tests pin the SEMANTICS
on corpora where the right answer is known by construction — and the
hypothesis suite drives the three candidate paths (prefix x prefix,
full-set x prefix, short-short length buckets) against a reference DP,
because the prefix filter's losslessness is a THEOREM whose edge cases
(short docs, empty strings, duplicate texts, bucket adjacency in both
directions) are exactly where an implementation slips."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dwp_hbase_to_mongo_export_spark.operators import editdist


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


def _brute(texts: dict[int, str], k: int) -> set[tuple[int, int, int]]:
    ids = sorted(texts)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _lev(texts[a], texts[b])
            if d <= k:
                out.add((a, b, d))
    return out


def _pairs(spark, texts: dict[int, str], k: int, q: int = 4):
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in editdist.edit_distance_pairs(df, k=k, q=q).collect()
    }


def test_planted_pairs_across_pools(spark):
    # 0/1: long docs one substitution apart (prefix path); 2/3: short
    # docs (few distinct grams) one deletion apart (bucket path); 4: a
    # clean long doc; 5: empty string; 6: single char — 5/6 are
    # no-gram docs at distance 1, which ONLY the bucket path can find.
    long_a = "the quick brown fox jumps over the lazy dog again and again" * 2
    texts = {
        0: long_a,
        1: long_a[:30] + "X" + long_a[31:],
        2: "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa",
        3: "aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaaa aaa",
        4: "completely different content with nothing shared anywhere here",
        5: "",
        6: "z",
    }
    got = _pairs(spark, texts, k=2)
    assert got == _brute(texts, 2)
    assert (0, 1, 1) in got
    assert (2, 3, 1) in got
    assert (5, 6, 1) in got


def test_exact_duplicates_are_distance_zero(spark):
    texts = {0: "same text here", 1: "same text here", 2: "other"}
    assert _pairs(spark, texts, k=0) == {(0, 1, 0)}


def test_keep_first_drops_dominated_only(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta " * 3
    texts = {0: t, 1: t + "x", 2: "unrelated content entirely", 3: t + "xy"}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    kept = {
        r.doc_id for r in editdist.edit_distance_keep_first(df, k=3).collect()
    }
    # 1 and 3 both have smaller-id neighbour 0 (and 1-3 pair besides)
    assert kept == {0, 2}


def test_report_counts_source_pairs_once(spark):
    t = "one two three four five six seven eight nine ten " * 2
    rows = [
        (0, t, "s1"),
        (1, t + "q", "s2"),
        (2, t + "qq", "s1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {
        (r.source_a, r.source_b): (r.n_pairs, r.min_dist)
        for r in editdist.edit_distance_report(df, k=3).collect()
    }
    # pairs: (0,1) s1-s2 d=1; (0,2) s1-s1 d=2; (1,2) s2-s1 d=1
    assert got == {("s1", "s2"): (2, 1), ("s1", "s1"): (1, 2)}


def test_invalid_params_raise(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        editdist.edit_distance_pairs(df, k=-1)
    with pytest.raises(ValueError):
        editdist.edit_distance_pairs(df, q=1)


def test_normalised_policy_differentiates(spark):
    # same words, different case/punctuation: strict distance is large
    # (punctuation-count), normalised distance is 0
    a = "The quick brown fox, jumps over the lazy dog -- again and again!"
    b = "the quick brown fox jumps over the lazy dog again and again"
    texts = {0: a, 1: b, 2: "unrelated other content entirely different"}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    strict = {
        (r.id_a, r.id_b): r.dist
        for r in editdist.edit_distance_pairs(df, k=3).collect()
    }
    norm = {
        (r.id_a, r.id_b): r.dist
        for r in editdist.edit_distance_pairs(df, k=3, normalise=True).collect()
    }
    assert (0, 1) not in strict  # 5 edits apart strictly
    assert norm[(0, 1)] == 0


def test_screen_batch_cross_pairs_only(spark):
    t = "north south east west up down left right in out " * 2
    corpus_rows = [(0, t), (1, t + "zz"), (2, "totally different stuff here")]
    batch_rows = [(10, t + "z"), (11, "also nothing like the corpus at all")]
    corpus = spark.createDataFrame(corpus_rows, "doc_id bigint, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, text string")
    got = {
        (r.doc_id, r.dup_of, r.dist)
        for r in editdist.edit_screen_batch(corpus, batch, k=3).collect()
    }
    # batch doc 10 matches corpus 0 (d=1) and 1 (d=1); corpus-corpus
    # pair (0,1,d=2) and batch-batch pairs must NOT appear
    assert got == {(10, 0, 1), (10, 1, 1)}


def test_screen_batch_short_and_empty_docs(spark):
    corpus = spark.createDataFrame(
        [(0, ""), (1, "ab"), (2, "a completely ordinary long sentence here")],
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [(10, "b"), (11, "abc")], "doc_id bigint, text string"
    )
    got = {
        (r.doc_id, r.dup_of, r.dist)
        for r in editdist.edit_screen_batch(corpus, batch, k=2).collect()
    }
    assert got == {(10, 0, 1), (10, 1, 1), (11, 1, 1)}


# Tiny alphabet + short strings: most docs land in the SHORT pool
# (<= q*k distinct grams), so bucket adjacency in both directions and
# the mixed path run constantly; mutations plant true pairs at known
# distances.
_doc = st.text(alphabet="ab ", min_size=0, max_size=40)
_corpus = st.lists(_doc, min_size=2, max_size=8)


@given(_corpus, st.integers(min_value=0, max_value=4))
@settings(max_examples=12, deadline=None)
def test_matches_bruteforce_short_pool(spark, corpus_texts, k):
    texts = dict(enumerate(corpus_texts))
    assert _pairs(spark, texts, k=k, q=3) == _brute(texts, k)


@given(_corpus, _corpus, st.integers(min_value=0, max_value=3))
@settings(max_examples=10, deadline=None)
def test_screen_matches_bruteforce_cross(spark, corpus_texts, batch_texts, k):
    corpus = dict(enumerate(corpus_texts))
    batch = {100 + i: t for i, t in enumerate(batch_texts)}
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id bigint, text string")
    bdf = spark.createDataFrame(list(batch.items()), "doc_id bigint, text string")
    got = {
        (r.doc_id, r.dup_of, r.dist)
        for r in editdist.edit_screen_batch(cdf, bdf, k=k, q=3).collect()
    }
    want = {
        (b, c, _lev(bt, ct))
        for b, bt in batch.items()
        for c, ct in corpus.items()
        if _lev(bt, ct) <= k
    }
    assert got == want


_long_doc = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta"]), min_size=12, max_size=25
).map(" ".join)


@given(st.lists(_long_doc, min_size=2, max_size=5), st.data())
@settings(max_examples=8, deadline=None)
def test_matches_bruteforce_with_planted_mutations(spark, base_texts, data):
    # mutate copies of the first docs so true pairs at small distances
    # exist (pure random corpora rarely produce any)
    texts = dict(enumerate(base_texts))
    nxt = len(texts)
    for i in range(min(2, len(base_texts))):
        s = list(base_texts[i])
        n_edits = data.draw(st.integers(min_value=0, max_value=3))
        for _ in range(n_edits):
            op = data.draw(st.sampled_from("ids"))
            p = data.draw(st.integers(min_value=0, max_value=max(len(s) - 1, 0)))
            if op == "i":
                s.insert(p, data.draw(st.sampled_from("abg ")))
            elif op == "d" and s:
                s.pop(min(p, len(s) - 1))
            elif s:
                s[min(p, len(s) - 1)] = data.draw(st.sampled_from("abg "))
        texts[nxt] = "".join(s)
        nxt += 1
    assert _pairs(spark, texts, k=3, q=4) == _brute(texts, 3)
