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


# --- property test vs a brute-force reference --------------------------------


def _reference(texts: dict[int, str], n: int, min_docs: int):
    """Pure-Python oracle: dup grams by distinct-doc count, covered
    positions by window union, spans by island merge."""
    from collections import defaultdict

    docs = {d: t.split(" ") for d, t in texts.items()}
    gram_docs = defaultdict(set)
    for d, ws in docs.items():
        for s in range(len(ws) - n + 1):
            gram_docs[tuple(ws[s : s + n])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    stripped, spans = {}, set()
    for d, ws in docs.items():
        cov = set()
        for s in range(len(ws) - n + 1):
            if tuple(ws[s : s + n]) in dup:
                cov.update(range(s, s + n))
        kept = [w for i, w in enumerate(ws) if i not in cov]
        stripped[d] = (" ".join(kept), len(cov))
        for p in cov:
            if p - 1 not in cov:  # island start
                q = p
                while q + 1 in cov:
                    q += 1
                spans.add((d, p, q, q - p + 1, " ".join(ws[p : q + 1])))
    return stripped, spans


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_word = st.sampled_from(["a", "b"])
_doc = st.lists(_word, min_size=1, max_size=14).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=5)


@given(_corpus)
@settings(max_examples=10, deadline=None)
def test_matches_bruteforce_reference(spark, corpus_texts):
    # n=3 over a 2-word vocab: 8 possible grams, so duplication, span
    # merging, and the min_docs boundary all occur constantly
    texts = dict(enumerate(corpus_texts))
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    want_strip, want_spans = _reference(texts, n=3, min_docs=2)
    got_strip = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans(df, n=3).collect()
    }
    got_spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_words, r.span_text)
        for r in spandedup.duplicate_spans(df, n=3).collect()
    }
    assert got_strip == want_strip
    assert got_spans == want_spans


@given(_corpus)
@settings(max_examples=6, deadline=None)
def test_input_gram_guarantee(spark, corpus_texts):
    """The operator's contract: every n-gram shared by >=2 INPUT docs
    loses all its occurrences (junction grams may appear — the
    documented non-goal — so we assert about input grams only)."""
    n = 3
    texts = dict(enumerate(corpus_texts))
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, t in texts.items():
        ws = t.split(" ")
        for s in range(len(ws) - n + 1):
            gram_docs[tuple(ws[s : s + n])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    out = spandedup.strip_duplicate_spans(df, n=n).collect()
    # dup grams may only survive as junction artifacts, i.e. made of
    # words that were NOT contiguous in the input; equivalently no
    # surviving contiguous input window equals a dup gram. The true
    # kept positions come from the reference cov computation (verified
    # equal to the operator's output in the sibling test — a greedy
    # re-embedding of kept words would be ambiguous on repeated words).
    want_strip, _ = _reference(texts, n=n, min_docs=2)
    for r in out:
        ws = texts[r.doc_id].split(" ")
        assert r.text_deduped == want_strip[r.doc_id][0]
        covered = set()
        for s in range(len(ws) - n + 1):
            if tuple(ws[s : s + n]) in dup:
                covered.update(range(s, s + n))
        pos = [i for i in range(len(ws)) if i not in covered]
        runs = []
        for i, p in enumerate(pos):
            if i and p == pos[i - 1] + 1:
                runs[-1].append(p)
            else:
                runs.append([p])
        for run in runs:
            for s in range(len(run) - n + 1):
                g = tuple(ws[p] for p in run[s : s + n])
                assert g not in dup, (r.doc_id, g)


# --- incremental (batch vs accepted corpus) ----------------------------------


def test_strip_against_corpus_semantics(spark):
    corpus = spark.createDataFrame(
        [(0, "c1 c2 a b c d e f g h c3")],  # corpus holds gram a..h
        "doc_id bigint, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "x a b c d e f g h y"),  # hits corpus gram: stripped
            (11, "k l m n o p q r s"),  # shares 8-gram k..r+l..s with 12
            (12, "k l m n o p q r s"),  # batch-internal dup: both stripped
            (13, "completely fresh words never seen anywhere at all ok"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_spans_against_corpus(batch, corpus, n=8).collect()
    }
    # a single CORPUS occurrence suffices (the corpus is accepted text;
    # min_docs applies within the batch only)
    assert got[10] == ("x y", 8)
    assert got[11] == ("", 9)
    assert got[12] == ("", 9)
    assert got[13] == ("completely fresh words never seen anywhere at all ok", 0)
    # output is the batch alone — the corpus is never rewritten
    assert set(got) == {10, 11, 12, 13}


def test_strip_against_empty_corpus_is_batch_only_dedup(spark):
    corpus = spark.createDataFrame([], "doc_id bigint, text string")
    batch = spark.createDataFrame(
        [(0, "a b c d e f g h"), (1, "a b c d e f g h"), (2, "i j")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_spans_against_corpus(batch, corpus, n=8).collect()
    }
    assert got == {0: ("", 8), 1: ("", 8), 2: ("i j", 0)}


# --- keep-one policy ----------------------------------------------------------


def _reference_keep_first(texts: dict[int, str], n: int, min_docs: int):
    from collections import defaultdict

    docs = {d: t.split(" ") for d, t in texts.items()}
    gram_docs = defaultdict(set)
    for d, ws in docs.items():
        for s in range(len(ws) - n + 1):
            gram_docs[tuple(ws[s : s + n])].add(d)
    canonical = {
        g: min(ds) for g, ds in gram_docs.items() if len(ds) >= min_docs
    }
    out = {}
    for d, ws in docs.items():
        cov = set()
        for s in range(len(ws) - n + 1):
            g = tuple(ws[s : s + n])
            if g in canonical and canonical[g] != d:
                cov.update(range(s, s + n))
        kept = [w for i, w in enumerate(ws) if i not in cov]
        out[d] = (" ".join(kept), len(cov))
    return out


def test_keep_first_keeps_the_canonical_occurrence(spark, corpus):
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans_keep_first(corpus, n=8).collect()
    }
    # doc 0 is canonical for "a..h": untouched; doc 1 loses its copy
    assert got[0] == (A, 0)
    assert got[1] == ("x y z", 8)
    # wholesale dup: doc 4 (min id) survives intact, doc 5 empties
    assert got[4] == (E, 0)
    assert got[5] == ("", 9)
    assert got[2] == (C, 0) and got[3] == (D, 0) and got[6] == (G, 0)


def test_keep_first_canonical_doc_can_still_lose_other_grams(spark):
    # doc 5 owns gram P; doc 10 contains P (canonical elsewhere) plus a
    # unique tail — the canonical-for-nothing copy is stripped even
    # though doc 10 is the only place its OTHER gram occurs
    df = spark.createDataFrame(
        [(5, "p1 p2 p3 p4 p5 p6 p7 p8"), (10, "p1 p2 p3 p4 p5 p6 p7 p8 q1")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans_keep_first(df, n=8).collect()
    }
    assert got[5] == ("p1 p2 p3 p4 p5 p6 p7 p8", 0)
    assert got[10] == ("q1", 8)


@given(_corpus)
@settings(max_examples=8, deadline=None)
def test_keep_first_matches_bruteforce_reference(spark, corpus_texts):
    texts = dict(enumerate(corpus_texts))
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    want = _reference_keep_first(texts, n=3, min_docs=2)
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans_keep_first(df, n=3).collect()
    }
    assert got == want


# ------------------------------------------------- fixpoint + normalised


def test_fixpoint_chases_junction_grams_to_empty_residual(spark):
    """Hand-built junction case (n=3): stripping "a b c" makes "j k"
    newly adjacent to "m n" in d0, forming the fresh gram "j k m"
    shared with d2 — the exact non-fixpoint dedup_spans_apply's
    contract discloses. The bounded fixpoint must chase it: pass 2
    strips the junction gram, pass 3 finds nothing."""
    rows = [(0, "j k a b c m n"), (1, "a b c"), (2, "j k m")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    one_pass = {
        r.doc_id: r.text_deduped
        for r in spandedup.strip_duplicate_spans(df, n=3).collect()
    }
    assert one_pass[0] == "j k m n"  # junction gram survives one pass
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans_fixpoint(
            df, n=3, max_passes=3
        ).collect()
    }
    assert got == {0: ("n", 6), 1: ("", 3), 2: ("", 3)}
    # residual after the fixpoint is empty
    out = spark.createDataFrame(
        [(k, v[0]) for k, v in got.items()], "doc_id bigint, text string"
    )
    g = spandedup.word_grams(out, n=3)
    assert spandedup.duplicated_grams(g, min_docs=2).count() == 0


@given(_corpus)
@settings(max_examples=6, deadline=None)
def test_fixpoint_equals_unrolled_composition(spark, corpus_texts):
    """The determinism contract that makes the SQL oracle possible:
    fixpoint(max_passes=k) == the k-fold composition of the single-pass
    strip, regardless of where the early exit fired (a pass over a
    clean corpus is the identity)."""
    texts = dict(enumerate(corpus_texts))
    df = spark.createDataFrame(list(texts.items()), "doc_id bigint, text string")
    # unrolled: 3 manual passes accumulating n_removed
    cur = {d: (t, 0) for d, t in texts.items()}
    for _ in range(3):
        sdf = spark.createDataFrame(
            [(d, t) for d, (t, _) in cur.items()], "doc_id bigint, text string"
        )
        stripped = {
            r.doc_id: (r.text_deduped, r.n_removed)
            for r in spandedup.strip_duplicate_spans(sdf, n=3).collect()
        }
        cur = {d: (stripped[d][0], cur[d][1] + stripped[d][1]) for d in cur}
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans_fixpoint(
            df, n=3, max_passes=3
        ).collect()
    }
    assert got == cur


def test_normalised_matches_case_and_punctuation_variants(spark):
    """Strict grams miss boilerplate differing only in case/punct; the
    normalised policy catches it and strips the ORIGINAL text."""
    rows = [(0, "The Quick! Brown Fox."), (1, "the quick brown fox")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    strict = {
        r.doc_id: r.n_removed
        for r in spandedup.strip_duplicate_spans(df, n=3).collect()
    }
    assert strict == {0: 0, 1: 0}
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans(
            df, n=3, normalise=True
        ).collect()
    }
    assert got == {0: ("", 4), 1: ("", 4)}


def test_normalised_positions_map_to_original_words(spark):
    """A doc where only the MIDDLE is shared modulo punctuation: the
    strip must remove exactly the original-cased words at the covered
    positions and keep the rest verbatim."""
    rows = [
        (0, "intro Alpha, Beta? Gamma! outro unique0"),
        (1, "alpha beta gamma tail1 tail2 tail3"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: (r.text_deduped, r.n_removed)
        for r in spandedup.strip_duplicate_spans(
            df, n=3, normalise=True
        ).collect()
    }
    assert got == {
        0: ("intro outro unique0", 3),
        1: ("tail1 tail2 tail3", 3),
    }
