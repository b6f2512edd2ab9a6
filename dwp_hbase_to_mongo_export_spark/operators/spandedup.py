"""Exact duplicated-span detection and removal (sub-document dedup).

The reference pipeline dedups whole records by key (HBase latest-cell
semantics, reference HBaseReader.kt scan-per-key); a 100 TB TRAINING
corpus additionally needs sub-document dedup: long word spans repeated
across documents (boilerplate, mirrored pages, licence blocks) inflate
memorisation even when no two whole documents match. This module is the
exact-substring flavour popularised by Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better") re-expressed Spark-first
at word-n-gram granularity:

1. gram inventory    — every word position starts an n-gram; a narrow
                       ``transform`` over the split array (linear in
                       corpus words, no Python), kept as a per-row
                       ARRAY so per-document work never shuffles.
2. duplicate grams   — per-doc ``array_distinct`` then groupBy(gram
                       md5) count >= ``min_docs``. The ONLY corpus-wide
                       shuffle, keyed on a 128-bit hash (the payload
                       never shuffles); the in-row distinct makes a
                       plain count equal count(DISTINCT doc) — no
                       two-shuffle distinct aggregate — and partial
                       aggregation collapses repeats before the wire.
3. covered positions — semi-join the gram-position stream back to the
                       duplicate-gram set. Boilerplate is a small
                       fraction of distinct grams in real corpora, so
                       AQE turns this into a broadcast join at runtime
                       when the dup side fits; hits regroup to ONE row
                       per covered doc carrying only the covered START
                       positions (n-fold fewer shuffle rows than the
                       old exploded-position distinct), and the covered
                       POSITION set expands per-row from the starts.
4. span merge        — per-row island detection over the sorted covered
                       array (filter with (element, index) lambdas) —
                       the old doc-partitioned window and its sort are
                       gone; islands are doc-length-bounded row work.
5. strip             — rebuild text keeping uncovered positions; a
                       narrow per-doc array filter (no second pass over
                       clean documents' grams).

100 TB design: step 2's shuffle is one row per corpus word — the same
cost class as the engine's other tokenise-everything passes (BM25
build, minhash signatures) and embarrassingly partial-aggregable.
Steps 3-5 materialise one row per document CONTAINING duplicated text
(covered starts ride as an array), never a row per duplicated word.
Hashes are full md5 so the DuckDB oracle reproduces results exactly
(engine convention, see operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_word(w: F.Column) -> F.Column:
    """Opt-in per-word normalisation for span matching: lowercase and
    strip everything but [a-z0-9]. Whitespace folding is inherent (the
    word array comes from a split). Mirrored in the DuckDB oracles as
    ``regexp_replace(lower(w), '[^a-z0-9]', '', 'g')``."""
    return F.regexp_replace(F.lower(w), "[^a-z0-9]", "")


def _staged_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    normalise: bool = False,
) -> DataFrame:
    """(id_col, ws, ghs): the split word array and the position-aligned
    gram-hash array — ``ghs[i]`` is the md5 of the n-word gram starting
    at word position i; empty for docs shorter than n words (the
    explicit guard matters: Spark's ``sequence(0, negative)`` would
    DESCEND, not return empty).

    ``normalise=True`` hashes the NORMALISED words (lower + punctuation
    strip, ``_norm_word``) so boilerplate differing only in case or
    punctuation still matches — while positions stay indexed into the
    ORIGINAL word array, so strip/report tails address original text.
    Word count is unchanged by normalisation (empty normalised words
    keep their position), which is what keeps the position mapping
    exact.

    Arrays are materialised ONCE per row (split, the normalised array,
    and the gram array each live in their own projection): an inlined
    split(text) inside the gram lambda would be re-evaluated per gram —
    O(words²) string work per doc, the round-10 in-round fix. The raw
    (id, text) projection is spread to the session's parallelism first
    (spread_scan: no-op on real multi-row-group corpora; on a small
    single-row-group scan it stops the split/md5 chain from
    serialising on one core)."""
    from .partitioning import spread_scan

    raw = df.select(F.col(id_col), F.col(text_col).alias("_raw"))
    raw = spread_scan(raw, id_col)
    base = raw.select(F.col(id_col), F.split(F.col("_raw"), " ").alias("ws"))
    ws = F.col("ws")
    if normalise:
        base = base.withColumn("gws", F.transform(ws, _norm_word))
        gsrc = F.col("gws")
    else:
        gsrc = ws
    starts = F.when(F.size(ws) >= n, F.sequence(F.lit(0), F.size(ws) - n)).otherwise(
        F.array().cast("array<int>")
    )
    ghs = F.transform(
        starts, lambda i: F.md5(F.concat_ws(" ", F.slice(gsrc, i + 1, n)))
    )
    return base.select(F.col(id_col), "ws", ghs.alias("ghs"))


def _cached_staged(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    normalise: bool = False,
) -> DataFrame:
    """``_staged_grams`` persisted under the operator-scoped cache: the
    per-row gram-hash arrays (split + n-word concat + md5 per position —
    the family's dominant row work) feed BOTH the duplicate-gram
    aggregate and the occurrence probe in every pipeline below; without
    the persist they are computed once per consumer."""
    from ._cache import swap_cache

    return swap_cache(
        "spandedup.staged", _staged_grams(df, text_col, id_col, n, normalise)
    )


def word_grams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    normalise: bool = False,
) -> DataFrame:
    """(id_col, start, gh): md5 of the n-word gram starting at each word
    position — the STREAM view of ``_staged_grams`` for consumers that
    probe per-occurrence (the durable gram store, tests)."""
    return _staged_grams(df, text_col, id_col, n, normalise).select(
        F.col(id_col), F.posexplode("ghs").alias("start", "gh")
    )


def duplicated_grams(
    grams: DataFrame, id_col: str = "doc_id", min_docs: int = 2
) -> DataFrame:
    """Gram hashes appearing in >= min_docs DISTINCT documents — the
    cross-document duplicate inventory (within-doc repetition alone is
    the repetition_features family's job, not dedup). Takes the
    per-occurrence STREAM (``word_grams``); the fused pipelines use
    ``_dup_grams`` over the staged arrays instead, where the per-doc
    distinct is free."""
    return (
        grams.groupBy("gh")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("gh")
    )


def _dup_grams(
    staged: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 2,
    with_canonical: bool = False,
) -> DataFrame:
    """Duplicate-gram inventory from the staged arrays: per-doc
    ``array_distinct`` inside the row makes a plain count equal
    count(DISTINCT doc), so the corpus-wide aggregate is a single
    partial-aggregable shuffle instead of a two-phase distinct
    aggregate. ``with_canonical`` adds min(id) for the keep-first
    policy."""
    gset = staged.select(
        F.col(id_col), F.explode(F.array_distinct("ghs")).alias("gh")
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if with_canonical:
        aggs.append(F.min(id_col).alias("canonical"))
    out = gset.groupBy("gh").agg(*aggs).filter(F.col("n_docs") >= min_docs)
    return out.select("gh", "canonical") if with_canonical else out.select("gh")


def _cov_array(starts: Column, n: int) -> Column:
    """Sorted distinct covered positions from covered START positions:
    each start covers [start, start+n) — per-row expansion, so only the
    (n-fold fewer) starts ever cross a shuffle."""
    return F.array_sort(
        F.array_distinct(
            F.flatten(F.transform(starts, lambda s: F.sequence(s, s + (n - 1))))
        )
    )


def _covered_starts(
    hits: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, cov): one row per doc with any duplicated-gram hit,
    ``cov`` the sorted distinct covered word positions. ``hits`` is a
    (id_col, start, ...) stream of duplicated-gram occurrences."""
    return (
        hits.groupBy(id_col)
        .agg(F.collect_set("start").alias("_starts"))
        .select(F.col(id_col), _cov_array(F.col("_starts"), n).alias("cov"))
    )


def covered_positions(
    grams: DataFrame, dup: DataFrame, n: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Distinct (id_col, pos) word positions covered by at least one
    duplicated n-gram (a position is covered if ANY gram containing it
    is duplicated, i.e. starts q with q <= pos < q + n). STREAM view
    for per-position consumers; the fused pipelines keep the per-doc
    ARRAY form (``_covered_starts``) and never explode."""
    hits = grams.join(dup, "gh", "left_semi")
    return _covered_starts(hits, n, id_col).select(
        F.col(id_col), F.explode("cov").alias("pos")
    )


def strip_covered(
    df: DataFrame, cov: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, text_deduped, n_removed): rebuild each doc keeping the
    word positions NOT in ``cov`` — the shared strip tail of the
    one-shot, incremental, and indexed span-dedup forms. ``cov`` is the
    per-doc ARRAY form ((id_col, cov) — ``_covered_starts``): one row
    per affected doc, bounded by doc length, and only docs containing
    duplicated text appear at all."""
    from .partitioning import spread_scan

    raw = spread_scan(
        df.select(F.col(id_col), F.col(text_col).alias("_raw")), id_col
    )
    ws_df = raw.select(F.col(id_col), F.split(F.col("_raw"), " ").alias("ws"))
    joined = ws_df.join(cov, id_col, "left").withColumn(
        "cov", F.coalesce(F.col("cov"), F.array().cast("array<int>"))
    )
    kept = F.filter(F.col("ws"), lambda w, i: ~F.array_contains(F.col("cov"), i))
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", kept).alias("text_deduped"),
        F.size("cov").cast("bigint").alias("n_removed"),
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated spans per document:
    (id_col, span_start, span_end, n_words, span_text), positions
    0-based inclusive. A span is a maximal run of covered positions —
    overlapping duplicated grams merge into one reported span.

    Island detection is per-row over the sorted covered array: a
    position opens a span when its predecessor is absent and closes it
    when its successor is absent (filter with (element, index)
    lambdas), replacing the old doc-partitioned window + sort; within
    an island every position is present, so n_words = end - start + 1."""
    staged = _cached_staged(df, text_col, id_col, n)
    hits = staged.select(
        F.col(id_col), F.posexplode("ghs").alias("start", "gh")
    ).join(_dup_grams(staged, id_col, min_docs), "gh", "left_semi")
    cov = _covered_starts(hits, n, id_col)
    # cov (duplicated docs only) is the small side of this equi-join;
    # AQE broadcasts it against the full corpus at runtime.
    c = F.col("cov")
    opens = F.filter(
        c, lambda x, i: (i == F.lit(0)) | (F.get(c, i - 1) != x - 1)
    )
    closes = F.filter(
        c, lambda x, i: (i == F.size(c) - 1) | (F.get(c, i + 1) != x + 1)
    )
    spans = F.zip_with(
        opens,
        closes,
        lambda s, e: F.struct(
            s.alias("span_start"),
            e.alias("span_end"),
            (e - s + 1).cast("bigint").alias("n_words"),
        ),
    )
    from .partitioning import spread_scan

    raw = spread_scan(
        df.select(F.col(id_col), F.col(text_col).alias("_raw")), id_col
    )
    ws_df = raw.select(F.col(id_col), F.split(F.col("_raw"), " ").alias("ws"))
    return (
        cov.join(ws_df, id_col)
        .select(F.col(id_col), "ws", F.explode(spans).alias("_s"))
        .select(
            id_col,
            F.col("_s.span_start").alias("span_start"),
            F.col("_s.span_end").alias("span_end"),
            F.col("_s.n_words").alias("n_words"),
            F.concat_ws(
                " ",
                F.slice(
                    "ws",
                    F.col("_s.span_start") + 1,
                    F.col("_s.n_words").cast("int"),
                ),
            ).alias("span_text"),
        )
    )


def strip_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    normalise: bool = False,
) -> DataFrame:
    """Cleaned corpus: every covered position removed from every doc
    (the remove-all-copies policy of Lee et al. §4). Guarantee: every
    n-gram shared by >= min_docs INPUT documents has ALL its
    occurrences removed. (Words that become newly adjacent across a
    removed span can still form fresh shared grams — junction text —
    so the guarantee is about input grams, not a fixpoint; keep-one
    policies cannot even offer the input-gram guarantee once spans from
    different canonical docs overlap.)
    Returns (id_col, text_deduped, n_removed); documents
    with nothing duplicated pass through unchanged, fully-duplicated
    documents survive as empty strings for the caller's length filter
    (corpus_filter_pipeline) to drop.

    ``normalise=True`` matches grams on normalised words (lower +
    punctuation strip — boilerplate that differs only in case or
    punctuation still dedups) while stripping positions from the
    ORIGINAL text; see ``_staged_grams``."""
    staged = _cached_staged(df, text_col, id_col, n, normalise=normalise)
    hits = staged.select(
        F.col(id_col), F.posexplode("ghs").alias("start", "gh")
    ).join(_dup_grams(staged, id_col, min_docs), "gh", "left_semi")
    cov = _covered_starts(hits, n, id_col)
    return strip_covered(df, cov, text_col, id_col)


def strip_spans_against_corpus(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    normalise: bool = False,
) -> DataFrame:
    """Incremental form: strip a NEW batch of every span whose n-gram
    already occurs ANYWHERE in the accepted corpus, or in >= min_docs
    distinct docs WITHIN the batch (the same decision the one-shot
    operator makes, restricted to batch text — corpus documents are
    already accepted and are never rewritten by an ingest).

    Scale: the corpus side reduces to its distinct gram hashes and is
    immediately semi-joined against the (small) batch gram set, so only
    grams the batch actually probes survive the corpus pass — the same
    anti-join discipline as dedup_incremental_batch. The corpus
    tokenise pass itself is the cost a durable gram index would
    amortise to once per corpus (the dedupindex.py pattern); this
    operator is the index-free form.
    """
    bstaged = _cached_staged(batch, text_col, id_col, n, normalise=normalise)
    cg = _staged_grams(corpus, text_col, id_col, n, normalise=normalise).select(
        F.explode(F.array_distinct("ghs")).alias("gh")
    )
    # corpus grams the batch probes (batch gram set is the small side)
    bgset = bstaged.select(F.explode(F.array_distinct("ghs")).alias("gh"))
    vs_corpus = cg.join(bgset.distinct(), "gh", "left_semi").distinct()
    within = _dup_grams(bstaged, id_col, min_docs)
    dup = vs_corpus.unionByName(within).distinct()
    hits = bstaged.select(
        F.col(id_col), F.posexplode("ghs").alias("start", "gh")
    ).join(dup, "gh", "left_semi")
    cov = _covered_starts(hits, n, id_col)
    return strip_covered(batch, cov, text_col, id_col)


def strip_duplicate_spans_fixpoint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
    max_passes: int = 3,
) -> DataFrame:
    """Bounded fixpoint of the remove-all-copies strip: re-run the strip
    until a pass finds NO cross-document duplicated n-gram, up to
    ``max_passes``. One pass's contract is honest that words made newly
    adjacent across a removed span can form fresh shared grams
    (junction text); this closes that gap to a measured bound instead
    of a docstring caveat (round-10 verdict #2).

    Determinism contract (what makes a SQL oracle possible): the output
    is EXACTLY the ``max_passes``-fold composition of the single-pass
    strip — the early exit fires only when a further pass would be the
    identity (no covered positions ⇒ every doc rebuilds verbatim; the
    split/concat_ws round-trip preserves text, including runs of
    spaces, exactly). So an unrolled k-pass SQL oracle hash-matches
    regardless of which pass the engine actually stopped at.

    Iteration discipline (the components.py pattern): each pass
    persists its frame before the residual-emptiness action so the
    next pass (and the final consumer) reads the materialised result,
    not a lineage replay; at 100 TB the per-pass persist becomes a
    write to the corpus store, and the per-pass cost is proportional to
    the REMAINING duplicated text (pass k's gram inventory is over the
    already-stripped corpus; empirically residuals shrink by ~an order
    of magnitude per pass — see span_dedup_residual).

    Returns (id_col, text_deduped, n_removed) with n_removed summed
    across passes."""
    cur = df.select(
        F.col(id_col),
        F.col(text_col).alias("text"),
        F.lit(0).cast("bigint").alias("n_removed"),
    )
    persisted = []
    for _ in range(max_passes):
        cur = cur.persist()
        persisted.append(cur)
        staged = _cached_staged(cur, "text", id_col, n)
        hits = staged.select(
            F.col(id_col), F.posexplode("ghs").alias("start", "gh")
        ).join(_dup_grams(staged, id_col, min_docs), "gh", "left_semi")
        cov = _covered_starts(hits, n, id_col)
        if cov.isEmpty():
            break
        stripped = strip_covered(
            cur.select(id_col, "text"), cov, "text", id_col
        )
        cur = (
            cur.select(F.col(id_col), F.col("n_removed").alias("prev"))
            .join(stripped, id_col)
            .select(
                F.col(id_col),
                F.col("text_deduped").alias("text"),
                (F.col("prev") + F.col("n_removed")).alias("n_removed"),
            )
        )
    out = cur.select(
        F.col(id_col), F.col("text").alias("text_deduped"), "n_removed"
    )
    # materialise the final frame before releasing the pass caches the
    # plan still references (the components.py checkpoint-release fix)
    out = out.localCheckpoint(eager=True)
    for p in persisted:
        p.unpersist()
    return out


def strip_duplicate_spans_keep_first(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The KEEP-ONE policy (Lee et al.'s other variant): the canonical
    occurrence of each duplicated n-gram — the one in the smallest
    ``id_col`` — survives; every occurrence in a non-canonical doc is
    removed. A position is removed iff SOME covering duplicated gram
    has its canonical copy elsewhere, so a doc that is canonical for
    one gram can still lose positions to an overlapping gram whose
    canonical copy lives in an earlier doc. Same plan shape as the
    remove-all form plus one column: the dup-gram aggregate carries
    min(id) and the covered-position semi-join becomes an equi-join
    filtered on ``id != canonical``."""
    staged = _cached_staged(df, text_col, id_col, n)
    dup = _dup_grams(staged, id_col, min_docs, with_canonical=True)
    hits = (
        staged.select(F.col(id_col), F.posexplode("ghs").alias("start", "gh"))
        .join(dup, "gh")
        .filter(F.col(id_col) != F.col("canonical"))
    )
    cov = _covered_starts(hits, n, id_col)
    return strip_covered(df, cov, text_col, id_col)
