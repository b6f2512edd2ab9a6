"""Exact duplicated-span dedup (operators/spandedup.py): planted-
duplicate semantics, edge cases, and plan shape.

The catalog gate (duplicate_spans / dedup_spans_apply vs the DuckDB
oracle) proves engine-vs-SQL agreement on the fixture; these tests pin
the SEMANTICS on hand-built corpora where the right answer is known by
construction — span boundaries, the remove-all-copies policy,
within-doc repetition exclusion, and the short-doc guard (Spark's
``sequence(0, negative)`` descends instead of returning empty, so an
unguarded gram inventory would explode on a 3-word doc)."""

from __future__ import annotations

import pytest

from dwp_hbase_to_mongo_export_spark.operators import spandedup

A = "a b c d e f g h i j"  # words 0..9; shares gram a..h with B
B = "x y a b c d e f g h z"  # words 0..10; dup span at 2..9
C = "entirely novel content with no overlap anywhere at all"
D = "a b c"  # shorter than n=8: contributes no grams
E = "p q r s t u v w x"  # 9 words, fully duplicated vs FF
FF = "p q r s t u v w x"
G = "m n o p q r s t m n o p q r s t"  # same 8-gram TWICE in one doc


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, t) for i, t in enumerate([A, B, C, D, E, FF, G])]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_duplicate_spans_boundaries(spark, corpus):
    got = {
        (r.doc_id, r.span_start, r.span_end): (r.n_words, r.span_text)
        for r in spandedup.duplicate_spans(corpus, n=8).collect()
    }
    # A[0..7] and B[2..9] share "a b c d e f g h"; E and FF duplicate
    # wholesale — their two overlapping grams merge to one 0..8 span.
    assert got == {
        (0, 0, 7): (8, "a b c d e f g h"),
        (1, 2, 9): (8, "a b c d e f g h"),
        (4, 0, 8): (9, "p q r s t u v w x"),
        (5, 0, 8): (9, "p q r s t u v w x"),
    }


def test_strip_removes_all_copies_and_passes_clean_docs(spark, corpus):
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans(corpus, n=8).collect()
    }
    assert got[0] == ("i j", 8)
    assert got[1] == ("x y z", 8)
    assert got[2] == (C, 0)  # untouched clean doc
    assert got[3] == (D, 0)  # short doc: no grams, no removal
    # wholesale duplicates survive as empty strings (caller's length
    # filter drops them), not as dropped rows
    assert got[4] == ("", 9)
    assert got[5] == ("", 9)
    assert len(got) == 7


def test_within_doc_repetition_is_not_cross_doc_duplication(spark, corpus):
    # G repeats "m n o p q r s t" twice inside ONE document; min_docs
    # counts DISTINCT docs, so nothing is flagged (within-doc
    # repetition is textops.repetition_features' job).
    got = {r.doc_id: r.n_removed for r in spandedup.strip_duplicate_spans(corpus, n=8).collect()}
    assert got[6] == 0


def test_min_docs_threshold(spark, corpus):
    # with min_docs=3 no gram reaches the threshold (each dup gram
    # appears in exactly 2 docs) -> no spans anywhere
    assert spandedup.duplicate_spans(corpus, n=8, min_docs=3).count() == 0


def test_all_docs_shorter_than_n_is_empty_not_descending(spark):
    tiny = spark.createDataFrame([(0, "a b"), (1, "a b")], "doc_id bigint, text string")
    # the sequence guard: without it Spark would build descending
    # start arrays for short docs and emit phantom grams
    assert spandedup.word_grams(tiny, n=8).count() == 0
    got = {r.doc_id: (r.text_deduped, r.n_removed) for r in spandedup.strip_duplicate_spans(tiny, n=8).collect()}
    assert got == {0: ("a b", 0), 1: ("a b", 0)}


def test_plans_have_no_cartesian(spark, corpus):
    for df in (
        spandedup.duplicate_spans(corpus, n=8),
        spandedup.strip_duplicate_spans(corpus, n=8),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
