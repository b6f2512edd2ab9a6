"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure built-in column expressions (no UDFs) — they run inside
whole-stage codegen and scale linearly; every one has a DuckDB-portable
formulation for the oracle gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, normalize_text, tokens


def _distinct_tokens(c: Column) -> Column:
    return F.array_distinct(tokens(c))


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language stopword-overlap score: |distinct tokens ∩ stoplist|
    / |stoplist|. Tiny fixed lists -> O(tokens) per row."""
    toks = _distinct_tokens(c)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        / F.lit(float(len(words)))
        for lang, words in STOPWORDS.items()
    }


def lang_id(c: Column) -> Column:
    """argmax language by stopword overlap; ties resolved by a fixed
    CASE order (en, de, es, fr — deterministic and trivially portable to
    the SQL oracle); all-zero -> 'unknown'."""
    s = lang_scores(c)
    order = ["en", "de", "es", "fr"]
    expr = F.lit("unknown")
    for lang in reversed(order):
        cond = s[lang] > 0
        for o in order[: order.index(lang)]:
            cond = cond & (s[lang] > s[o])  # strictly beat earlier langs
        for o in order[order.index(lang) + 1 :]:
            cond = cond & (s[lang] >= s[o])  # >= suffices vs later langs
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def token_count(c: Column) -> Column:
    """Whitespace token count of normalised text (0 for empty)."""
    n = normalize_text(c)
    return F.when(F.length(n) == 0, F.lit(0)).otherwise(F.size(F.split(n, " ")))


def bpe_ish_token_count(c: Column) -> Column:
    """A BPE-ish proxy: count of word-piece matches (letter runs, digit
    runs, punctuation singles) — the standard ~chars/4 heuristic's exact
    cousin, computable without a tokenizer model."""
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]{1,6}|[0-9]{1,3}|[^A-Za-z0-9\s]"), 0))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + composite score (rounded for
    oracle comparability). CPU-heavy regex/tokenise chain: input
    parallelism is decoupled from file layout (one-split small corpora
    would otherwise serialise it on one core; no-op at scale)."""
    from ..sources.parquet import ensure_parallelism

    df = ensure_parallelism(df)
    c = F.col(text_col)
    # stage the normalised text and token array ONCE per row: inlined,
    # token_count/tokens/mean_tok_len each re-run the regex normalise
    # and split per use (round-11 staging discipline — this query was
    # count-pruned and never actually timed before)
    staged = df.select(
        F.col(id_col), c.alias("_txt"), normalize_text(c, None).alias("_nt")
    ).select(
        id_col, "_txt", "_nt", F.split(F.col("_nt"), " ").alias("_toks")
    )
    df, c = staged, F.col("_txt")
    n_chars = F.length(c)
    n_toks = F.when(F.length("_nt") == 0, F.lit(0)).otherwise(
        F.size(F.col("_toks"))
    )
    toks = F.col("_toks")
    mean_tok_len = F.when(n_toks > 0, F.length("_nt") / n_toks).otherwise(0.0)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(0.0)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.when(
        n_toks > 0, F.size(F.filter(toks, lambda t: F.array_contains(en, t))) / n_toks
    ).otherwise(0.0)
    score = (
        F.least(n_toks / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 10, F.lit(1.0))) * 0.3
    )
    # portable floor-rounding, NOT F.round: per-row ratios are
    # bit-identical across engines, but round() semantics differ on
    # boundary doubles (functions/portable.py) — found at sf0.1.
    from ..functions.portable import round_portable

    return df.select(
        id_col,
        n_chars.alias("n_chars_measured"),
        n_toks.alias("n_tokens"),
        round_portable(mean_tok_len, 3).alias("mean_token_len"),
        round_portable(punct_ratio, 4).alias("punct_ratio"),
        round_portable(stop_ratio, 4).alias("stopword_ratio"),
        round_portable(score, 4).alias("quality_score"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of raw and of normalised text (the
    normalised one is the dedup key robust to whitespace/punct noise)."""
    return df.select(
        id_col,
        F.md5(F.col(text_col)).alias("fp_raw"),
        F.md5(normalize_text(F.col(text_col))).alias("fp_normalised"),
    )


# PII patterns kept deliberately simple and PORTABLE: the same regex
# string must compile in Spark's codegen'd regexp_replace (Java) and the
# DuckDB oracle (RE2-style). Order matters — emails before the phone
# pattern so user@host digits aren't half-eaten.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(c: Column) -> Column:
    """Chained regexp_replace over the PII patterns — pure JVM codegen,
    linear in text size. The standard pre-training scrub step: emails,
    IPv4 addresses, and phone-shaped digit runs become typed tags so
    downstream tokenisation sees a stable vocabulary item instead of
    unique identifiers."""
    out = c
    for _, pattern, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts(c: Column) -> dict[str, Column]:
    """Per-kind match counts (regexp_count, codegen'd) — the audit side
    of redaction: corpora report PII density before/after scrubbing."""
    return {
        name: F.regexp_count(c, F.lit(pattern)) for name, pattern, _ in PII_PATTERNS
    }


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition metrics (Rae et al. 2021, public
    literature): the quality filters that drop boilerplate/spam docs.

    - dup_line_fraction: 1 - distinct lines / lines (split on newline);
    - dup_gram_fraction: 1 - distinct word 3-grams / word 3-grams over
      the normalised text (degenerate repetitive text scores high);
    - top_gram_fraction: occurrences of the most frequent 3-gram over
      total 3-grams.

    All built-in higher-order-function expressions over per-doc arrays —
    map-only, no shuffle, no UDF — and all LINEAR(ish) per doc: the
    top-gram count is a run-length fold over the SORTED gram array
    (O(g log g)), not a distinct x full-list membership scan (O(g^2) —
    ruinous on long boilerplate docs, exactly the ones this filter
    exists to catch). Token arrays are bounded by the truncating
    normalise exactly like the shingle operators.

    Evaluation discipline (round-11, exposed when bench switched to a
    materialising action — this query was count-pruned and never
    actually timed): tokens/grams/lines are materialised as COLUMNS in
    staged projections, never inlined. An inlined ``toks`` inside the
    gram lambda re-evaluates normalise+split PER GRAM (O(words²)
    regex work per doc), and an inlined ``grams`` re-builds the array
    for each of its four consumers; CollapseProject keeps staged
    non-cheap multi-use projections apart, so each array is computed
    once per row (measured 10.5x on this query at sf0.1)."""
    base = df.select(
        F.col(id_col),
        F.split(F.col(text_col), "\n").alias("_lines"),
        normalize_text(F.col(text_col), 512).alias("_nt"),
    )
    toksed = base.select(
        id_col, "_lines", "_nt", F.split(F.col("_nt"), " ").alias("_toks")
    )
    gramsed = toksed.select(
        id_col,
        "_lines",
        F.when(
            (F.length("_nt") > 0) & (F.size("_toks") >= 3),
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - 2),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, 3)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_grams"),
    )
    n_lines = F.size(F.col("_lines"))
    n_grams = F.size(F.col("_grams"))
    # longest equal-adjacent run over the sorted grams = max occurrence
    # count of any gram; one linear aggregate, state (prev, run, best)
    run_state = F.aggregate(
        F.array_sort(F.col("_grams")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top = run_state["best"]
    return gramsed.select(
        id_col,
        F.round(
            F.when(
                n_lines > 0,
                1 - F.size(F.array_distinct(F.col("_lines"))) / n_lines.cast("double"),
            ).otherwise(0.0),
            4,
        ).alias("dup_line_fraction"),
        F.round(
            F.when(
                n_grams > 0,
                1 - F.size(F.array_distinct(F.col("_grams"))) / n_grams.cast("double"),
            ).otherwise(0.0),
            4,
        ).alias("dup_gram_fraction"),
        F.round(
            F.when(n_grams > 0, top / n_grams.cast("double")).otherwise(0.0), 4
        ).alias("top_gram_fraction"),
    )


def word_ngrams(c: Column, n: int = 8, max_chars: int | None = 512) -> Column:
    """Distinct word n-grams of normalised (optionally truncated) text as
    an array column — narrow, bounded, no explode.

    EVALUATION WARNING: as a self-contained Column expression, the
    token array is captured INSIDE the gram lambda and re-evaluated per
    gram — O(words²) normalise+split work per row (Catalyst cannot
    let-bind a subexpression inside a higher-order function). Fine for
    one-off scalar use; for relation-shaped consumers use
    ``word_ngram_rows``, which stages the split as a column (the
    round-11 fix that took boilerplate_ngram_df from 36 s to
    corpus-linear at sf0.1)."""
    nt = normalize_text(c, max_chars)
    toks = F.split(nt, " ")
    cnt = F.size(toks)
    return F.when(
        (F.length(nt) > 0) & (cnt >= n),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngram_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = "doc_id",
    n: int = 8,
    max_chars: int | None = 512,
) -> DataFrame:
    """Exploded distinct word n-grams — (id_col?, g) — with the
    normalised text and its token array STAGED as columns so each is
    computed once per row (CollapseProject keeps non-cheap multi-use
    projections apart; the lambda then only touches the materialised
    ``_toks`` attribute). Same values as exploding ``word_ngrams``."""
    keep = [F.col(id_col)] if id_col else []
    base = df.select(
        *keep, normalize_text(F.col(text_col), max_chars).alias("_nt")
    )
    toksed = base.select(
        *keep, "_nt", F.split(F.col("_nt"), " ").alias("_toks")
    )
    grams = F.when(
        (F.length("_nt") > 0) & (F.size("_toks") >= n),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toksed.select(*keep, F.explode(grams).alias("g"))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Test-set DECONTAMINATION (the n-gram-overlap method used for
    LLM training corpora, e.g. GPT-3 appendix C / Dolma — public
    literature): flag every corpus document sharing >= min_hits distinct
    word n-grams with ANY benchmark document. Returns
    (doc_id, n_contaminated_grams, contaminated).

    Scale shape: benchmark n-grams are DISTINCT-ed and joined on the
    gram — the benchmark side is tiny relative to the corpus (eval sets
    are KBs against TBs), so Catalyst broadcasts it and the corpus is
    never shuffled; per-doc gram arrays are bounded by the truncating
    normalise. The corpus side explodes bounded gram rows, the join is
    a broadcast semi-ish equi-join, and the count aggregates map-side.
    A left join keeps clean documents (contaminated = false) so the
    output is a per-document verdict, not just the flagged subset."""
    bench_grams = word_ngram_rows(benchmark, text_col, None, n).distinct()
    corpus_grams = word_ngram_rows(corpus, text_col, id_col, n)
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def boilerplate_ngram_df(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_df: int = 3,
) -> DataFrame:
    """CORPUS-INTERNAL boilerplate detection by n-gram document
    frequency (the CCNet/C4-style counterpart to decontaminate's
    corpus-vs-benchmark overlap — public literature): an n-gram that
    appears in >= min_df distinct documents is boilerplate (headers,
    footers, licence blurbs, mirrored navigation); each document is
    scored by the fraction of its distinct n-grams that are common.
    Returns (doc_id, n_grams, n_common_grams, boilerplate_fraction).

    Scale shape: per-doc gram arrays are DISTINCT and bounded by the
    truncating normalise, so the exploded gram relation is ~O(tokens).
    Document frequency is count(*) per gram (grams are distinct within
    a doc, so plain count == distinct-doc count — no countDistinct
    state). Both the DF aggregation and the grams⋈common join shuffle
    on the SAME key (g), so the exchange is reused, and the common-gram
    side shrinks by the min_df filter before joining. The final per-doc
    counts shuffle once on doc_id. No driver-side data, no UDF."""
    grams = word_ngram_rows(corpus, text_col, id_col, n)
    common = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("g")
    )
    tot = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        grams.join(common, "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_common_grams"))
    )
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0))
    n_common = F.coalesce(F.col("n_common_grams"), F.lit(0))
    return (
        corpus.select(id_col)
        .join(tot, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            id_col,
            n_grams.alias("n_grams"),
            n_common.alias("n_common_grams"),
            F.round(
                F.when(n_grams > 0, n_common / n_grams.cast("double")).otherwise(0.0),
                4,
            ).alias("boilerplate_fraction"),
        )
    )


def unigram_logprob(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-trained unigram language-model scoring — the LM-perplexity
    quality filter of CCNet/Wikipedia-filtering pipelines (public
    literature), in its exactly-reproducible unigram form: p(t) =
    count(t)/total over the corpus itself, each document scored by the
    mean log-probability of its tokens (low = rare/garbled vocabulary,
    high = common fluent vocabulary). Returns
    (doc_id, n_tokens, avg_logprob, perplexity).

    Scale shape: the frequency table is VOCABULARY-sized, not
    corpus-sized — millions of rows at 100 TB, so Catalyst broadcasts it
    under the join threshold and the corpus-side token stream never
    shuffles for the lookup (above threshold it degrades to the same
    token-keyed equi-join as the boilerplate operator). The total-count
    scalar rides a broadcast crossJoin (the q11 threshold pattern); the
    per-doc mean is one aggregation on doc_id. Perplexity is
    exp(-round(avg)) so the derived column is bit-stable given the
    rounded mean."""
    from ..functions.text import normalize_text

    toks = (
        corpus.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    # NO broadcast hint on the vocab-sized freq table: a hint never
    # degrades (Spark ships it regardless of size until the 8 GB hard
    # limit), so at web-corpus vocabulary sizes it would OOM instead of
    # falling back; AQE broadcasts it automatically when it IS small.
    # The one-row total scalar keeps its explicit broadcast.
    scored = (
        toks.join(freq, "t")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 3).alias("avg_logprob"),
        )
    )
    return (
        corpus.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
            F.round(F.exp(-F.coalesce("avg_logprob", F.lit(0.0))), 3).alias(
                "perplexity"
            ),
        )
    )


def _doc_tokens(
    corpus: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, t) exploded non-empty normalised tokens — shared by the
    tf-idf / BM25 term-statistics operators."""
    return (
        corpus.select(
            F.col(id_col),
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )


def tfidf_top_terms(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
) -> DataFrame:
    """Per-document top-N terms by tf-idf (idf = ln(N/df)) — the classic
    IR keyword extractor. Returns (doc_id, term, score, rank); ties
    break by term for determinism.

    Scale shape: term stats are VOCABULARY-sized — df is one count per
    distinct (doc, term) pair keyed on the term, broadcast back onto the
    per-doc tf rows (above threshold it degrades to a term-keyed
    equi-join); the N scalar rides a broadcast crossJoin (the q11
    pattern). The only corpus-sized shuffle is the (doc, term) tf
    aggregation, map-side combined; the final top-N is a per-doc window
    over ~vocabulary-bounded rows."""
    from pyspark.sql.window import Window

    toks = _doc_tokens(corpus, text_col, id_col)
    tf = toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n = corpus.agg(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("t"))
    # no hint on the vocab-sized df table (see unigram_logprob note) —
    # AQE broadcasts it when small, falls back to the t-keyed equi-join
    # when not; the hint form cannot degrade and would OOM at web-corpus
    # vocabulary sizes. bm25_search's dfreq keeps its hint because that
    # one is bounded by |query terms|, not by the vocabulary.
    return (
        tf.join(dfreq, "t")
        .join(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            id_col,
            F.col("t").alias("term"),
            F.round("score", 3).alias("score"),
            "rank",
        )
    )


def bm25_search(
    corpus: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
) -> DataFrame:
    """BM25 keyword search: top-N documents for a bag-of-terms query
    (Robertson/Sparck Jones; the Okapi BM25 formula with the standard
    ln(1 + (N-df+0.5)/(df+0.5)) idf). Returns
    (doc_id, n_terms_matched, score).

    Determinism: per-term contributions are summed in engine-dependent
    order, so the ranking keys on the 6-decimal-rounded score (float
    noise is ~1e-15 relative — quantised away), ties by doc_id.

    Scale shape: only rows whose term is IN the query survive the
    explode filter — the scored relation is |query| * df rows, not the
    corpus; doc lengths are one corpus-sized map-side-combined count;
    avgdl/N are one-row broadcast scalars; the global top-N is
    TakeOrdered (per-partition heads + driver merge), never a single
    giant sort partition."""
    toks = _doc_tokens(corpus, text_col, id_col)
    dlen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    avgdl = dlen.agg(F.round(F.avg("dl"), 6).alias("avgdl"))
    n = corpus.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        toks.filter(F.col("t").isin(list(query_terms)))
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "t")
        .join(dlen, id_col)
        .join(F.broadcast(avgdl))
        .join(F.broadcast(n))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum(contrib), 6).alias("score6"),
        )
    )
    return (
        scored.orderBy(F.desc("score6"), F.asc(id_col))
        .limit(top_n)
        .select(id_col, "n_terms_matched", F.round("score6", 3).alias("score"))
    )


def winnowing_fingerprints(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    max_chars: int = 256,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS local-fingerprinting algorithm — public literature): hash
    every char k-gram, then keep the MINIMUM hash of each sliding
    window of `window` consecutive k-grams. Guarantees any shared
    substring of length >= k + window - 1 contributes at least one
    SHARED fingerprint — the partial-overlap detector that whole-doc
    md5 (fingerprint) and set-jaccard (minhash) are not.

    Returns (id, fp) exploded distinct fingerprints. Fully narrow until
    the explode — no shuffle, bounded per-doc fan-out. Normalisation
    stays JVM-side (codegen'd regexp chain); the per-gram md5 + sliding
    minima run in ONE Arrow-batched numpy pass with a cross-doc
    distinct-gram memo (the minhash_sets_and_sigs rationale: md5 is the
    expensive, non-vectorisable part, and near-dup corpora repeat most
    grams, so it runs once per DISTINCT gram per batch instead of
    ~max_chars times per doc through Catalyst's interpreted HOF
    evaluator). Values are bit-identical to the pure-column form
    (md5-prefix bigints, window minima), so the DuckDB oracle is
    unchanged."""
    import hashlib

    from ..sources.parquet import ensure_parallelism

    s = normalize_text(F.col(text_col), max_chars)
    # the per-gram md5 below is the operator's dominant cost: decouple
    # its parallelism from the input file layout (a small corpus
    # arrives as ONE split and would serialise the UDF on one core;
    # no-op at scale where the table has many splits)
    base = ensure_parallelism(corpus).select(F.col(id_col), s.alias("s")).filter(
        F.length("s") >= k + window - 1
    )

    @F.pandas_udf("array<bigint>")
    def _fps(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def gram_hash(g: str) -> int:
            h = memo.get(g)
            if h is None:
                h = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                memo[g] = h
            return h

        out = []
        for t in texts:
            m = len(t) - (k - 1)
            h = np.fromiter(
                (gram_hash(t[i : i + k]) for i in range(m)),
                dtype=np.int64,
                count=m,
            )
            mins = np.stack(
                [h[j : m - (window - 1) + j] for j in range(window)]
            ).min(axis=0)
            out.append(np.unique(mins))
        return pd.Series(out)

    return base.select(F.col(id_col), F.explode(_fps(F.col("s"))).alias("fp"))


def winnowing_overlap_pairs(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    max_chars: int = 256,
    *,
    max_df: int | None = None,
    df_fraction: float = 0.04,
    abs_max_df: int = 200,
    min_shared: int = 5,
) -> DataFrame:
    """Partial-overlap candidate pairs by shared winnowing fingerprints:
    (id_a, id_b, n_shared), n_shared >= min_shared.

    Scale shape: fingerprints with document frequency above the cap are
    dropped BEFORE the self-join — the winnowing analogue of the
    boilerplate guard (a corpus-common fingerprint would otherwise
    contribute df^2 join rows); the surviving join is equi on the
    fingerprint with both sides shrunk, then one (id_a, id_b)
    aggregation. All counts, no document bodies, move through the
    shuffles.

    The cap is max(20, min(df_fraction * |corpus|, abs_max_df)): the
    FRACTION floor-to-ceiling keeps small corpora from dropping
    legitimate overlap (a fixed tiny cap would), while the ABSOLUTE
    ceiling is what makes join input linear at scale — without it,
    admitted fingerprints can carry df up to 0.04n, so the worst-case
    join input Sum(df^2) grows ~n^2 (measured: a 10x corpus sweep went
    super-linear 17x before the ceiling existed, SCALING.md; with the
    ceiling, Sum(df^2) <= fp_rows * cap, linear in the corpus). A
    fingerprint shared by >abs_max_df documents is corpus boilerplate,
    not pairwise-overlap signal — the pairs it would weld are exactly
    the quadratic pathology, and true overlap between two documents
    rides their RARE shared fingerprints regardless. The corpus size
    rides a one-row broadcast onto the (fp, df) relation, never the
    corpus itself.

    The (id, fp) relation is persisted memory-and-disk: it feeds three
    consumers (df counts, both self-join sides) that would otherwise
    each re-run the md5 k-gram pipeline over the corpus; per doc it is
    <= max_chars/window fingerprints, a small constant factor of corpus
    size, and it spills rather than OOMing (the minhash precedent). The
    cache slot is operator-scoped (_cache.swap_cache): re-invocations
    release the previous entry, so repeated calls plateau at ONE live
    cached relation instead of leaking one per call."""
    from ._cache import swap_cache

    # Persisted REPARTITIONED BY fp: every downstream step — the df
    # count, the rare join, the pair regroup — is keyed by fp, and an
    # InMemoryRelation preserves its cached plan's hashpartitioning, so
    # ONE exchange of the narrow (id, fp) relation feeds them all
    # exchange-free (guide §2.4: share one exchange between same-keyed
    # operations). Unpartitioned, the df count and the regroup each
    # paid their own fp shuffle.
    fps = swap_cache(
        "winnowing_overlap_pairs",
        winnowing_fingerprints(
            corpus, text_col=text_col, id_col=id_col, k=k, window=window,
            max_chars=max_chars,
        ).repartition("fp"),
    )
    dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        cap = F.lit(max_df)
    else:
        ncnt = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
        dfreq = dfreq.join(F.broadcast(ncnt))
        cap = F.greatest(
            F.lit(20),
            F.least(
                F.ceil(df_fraction * F.col("n_corpus")), F.lit(abs_max_df)
            ),
        )
    rare = dfreq.filter(F.col("df") <= cap).select("fp")
    good = fps.join(rare, "fp")
    # Pair generation is IN-ROW (the span-family treatment, round-11
    # verdict #7): regroup the capped fingerprints to one row per fp
    # carrying its sorted distinct doc-id array (bounded by the df cap,
    # <= abs_max_df ids — safe collect_set state at any corpus size
    # BECAUSE it runs after the rare filter), then expand the C(df, 2)
    # ordered pairs with array lambdas. The old form self-joined the
    # good relation — TWO independent df-count aggregates (one per join
    # side re-deriving `rare`), two sorts for the merge join, and both
    # sides' rows copied into the join — where one fp-keyed aggregate
    # plus JVM-codegen'd in-row expansion produces the identical pair
    # multiset: ids are distinct per fp (fps emits distinct (id, fp))
    # and sorted ascending, so (ids[i], ids[j]) for i < j enumerates
    # exactly the id_a < id_b pairs the join produced.
    grouped = good.groupBy("fp").agg(
        F.sort_array(F.collect_set(F.col(id_col))).alias("ids")
    )
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"),
                            i + F.lit(2),
                            F.size(F.col("ids")) - i - F.lit(1),
                        ),
                        lambda y: F.struct(
                            x.alias("id_a"), y.alias("id_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
