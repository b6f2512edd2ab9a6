"""Distributed BPE tokenizer fitting (Sennrich/Haddow/Birch 2016,
public literature): learn byte-pair-encoding merge rules from a corpus.

This is the tokenizer-training step of an LLM data pipeline expressed
Spark-first:

* ``word_counts`` — the ONLY corpus-scale pass: lowercase, split on
  non-alphabetic runs, one map-side-combined groupBy to the
  (word, cnt) vocabulary relation, then a deterministic top-V take
  (count desc, word asc). At 100 TB this is a single shuffle of
  vocabulary-sized partial counts; the corpus text never moves again.
* ``fit_bpe`` — Lloyd-style driver round-tripping (the kmeans_fit
  pattern): per merge step, ONE vocabulary-relation aggregation counts
  adjacent symbol pairs weighted by word frequency, the argmax pair
  (ties: count desc, then left/right lexicographic) is collected — one
  row — and applied as a map-only merge. The working relation stays
  vocabulary-sized, so a fit over a 10M-word vocabulary runs the same
  plan shape; only the base relation is persisted, each step adds one
  narrow column expression on top.
* ``encode`` / ``encode_tokens`` — apply a learned merge table to a
  corpus: map-only chained literal replaces (JVM codegen, no UDF).

Symbol sequences ride as strings with TWO-space boundaries between
symbols and at both ends (``  h  e  l  l  o  ``). Applying the merge
rule (a, b) is then ONE literal replace of ``" a  b "`` (single space,
a, two spaces, b, single space) with ``" ab "`` — and that single pass
IS exact greedy left-to-right merging:

* each match consumes only ONE space of each flanking two-space
  boundary, so after a replacement the scan resumes at the boundary's
  remaining space, which supplies the single leading space the next
  match needs — no match can starve its right neighbour of boundary
  (the failure mode of single-space padding, where self-merge runs
  like ``a a a a a`` come out ``[aa, a, aa]`` instead of greedy's
  ``[aa, aa, a]``);
* the one-space/two-space asymmetry anchors both symbols exactly: a
  pattern symbol can never match a strict substring of a stored symbol
  because stored symbols are flanked by two spaces on both sides while
  the pattern demands a non-space (the rest of the symbol) or exactly
  the boundary;
* left-to-right non-overlapping replace (Spark ``replace``, DuckDB
  ``replace``, Python ``str.replace`` all share these semantics)
  consumes symbol pairs in exactly greedy order: the leftmost match is
  the leftmost unconsumed (a, b) symbol pair, and skipping past the
  replacement is greedy's ``i += 2``.

Verified exhaustively against a reference greedy implementation for
all sequences up to length 8 over a 2-symbol alphabet plus randomized
multi-symbol cases — including the a == b self-merge runs of length
5 and 6 where the previous doubled-replace formulation diverged.
The same single replace runs verbatim in the DuckDB oracle, which is
what makes the whole iterative fit value-checkable.

Reference scope note: the reference has no tokenizer (its unit is the
exported record — HBaseResultProcessor.kt:22-67); this extends the
engine for LLM training-data preparation like the rest of the text
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = "[^a-z]+"
SEP = "  "  # two-space symbol boundary (see module docstring)
MIN_WORD_LEN, MAX_WORD_LEN = 2, 12


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 500,
    min_len: int = MIN_WORD_LEN,
    max_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """(word, cnt) — the top-``top_v`` corpus vocabulary, deterministic
    under ties (count desc, word asc). Length-bounded so pathological
    tokens can't blow up the per-word symbol sequences."""
    words = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT)).alias("word")
    ).filter(
        (F.length("word") >= min_len) & (F.length("word") <= max_len)
    )
    wc = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.orderBy(F.desc("cnt"), F.asc("word")).limit(top_v)


def _pad_seq(word_col) -> F.Column:
    """word -> '  c1  c2  ...  cn  ' (two-space boundaries)."""
    return F.concat(
        F.lit(SEP), F.array_join(F.split(word_col, ""), SEP), F.lit(SEP)
    )


def _split_seq(seq_col) -> F.Column:
    """Padded sequence string -> symbol array (inverse of _pad_seq)."""
    return F.split(F.trim(seq_col), SEP)


def merge_once(seq_col, a: str, b: str) -> F.Column:
    """Apply one merge rule to a two-space-boundary symbol-sequence
    string: a SINGLE literal replace, which is exact greedy
    left-to-right merging (see module docstring for the proof,
    including the a == b self-merge case)."""
    return F.replace(seq_col, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))


def fit_bpe(
    wc: DataFrame, n_merges: int = 6
) -> list[tuple[int, str, str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from a (word, cnt) vocabulary
    relation. Returns [(step, left, right, merged, pair_count), ...] —
    the merge table a tokenizer ships. Stops early if no adjacent pair
    remains (every word fully merged)."""
    base = wc.select("word", "cnt", _pad_seq(F.col("word")).alias("seq"))
    base = base.persist()
    try:
        merges: list[tuple[int, str, str, str, int]] = []
        seq = F.col("seq")
        for step in range(1, n_merges + 1):
            # adjacent pairs via an indexed transform over the symbol
            # array: i is 0-based, t[i+1] is the right neighbour
            pairs = (
                base.select("cnt", _split_seq(seq).alias("t"))
                .select(
                    "cnt",
                    F.explode(
                        F.expr(
                            "transform(slice(t, 1, size(t) - 1),"
                            " (x, i) -> struct(x AS a, t[i + 1] AS b))"
                        )
                    ).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("cnt").alias("pc"))
            )
            best = pairs.orderBy(F.desc("pc"), F.asc("a"), F.asc("b")).limit(1).collect()
            if not best:
                break
            a, b, pc = best[0]["a"], best[0]["b"], int(best[0]["pc"])
            merges.append((step, a, b, a + b, pc))
            seq = merge_once(seq, a, b)
        return merges
    finally:
        base.unpersist()


def _encoded_words(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str,
    min_len: int,
    max_len: int,
) -> DataFrame:
    """Per (doc row, qualifying word): the merged symbol sequence.
    ``explode_outer`` keeps documents with NO qualifying word (their
    `_word`/`_seq` are null) so callers can emit an explicit zero
    instead of silently dropping the row. Map-only: one explode plus a
    chain of codegen literal replaces, no Python."""
    words = docs.withColumn(
        "_w", F.split(F.lower(F.col(text_col)), WORD_SPLIT)
    ).select(
        "*",
        F.posexplode_outer(
            F.filter(
                "_w",
                lambda w: (F.length(w) >= min_len) & (F.length(w) <= max_len),
            )
        ).alias("_widx", "_word"),
    ).drop("_w")
    seq = _pad_seq(F.col("_word"))
    for _, a, b, _, _ in merges:
        seq = merge_once(seq, a, b)
    return words.withColumn("_seq", seq)


def encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    min_len: int = MIN_WORD_LEN,
    max_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """Tokenise with a learned merge table: per document, per word,
    apply every merge rule in learned order and count the resulting
    symbols. Adds ``out_col`` = total BPE token count per document —
    the pipeline's sizing/packing signal (cf. token_counts for the
    regex baseline). Documents with no qualifying word appear with a
    count of 0 (not dropped); min_len/max_len mirror word_counts so a
    caller who fitted with custom bounds can encode consistently."""
    per_word = _encoded_words(docs, merges, text_col, min_len, max_len)
    n = F.when(F.col("_word").isNull(), F.lit(0)).otherwise(
        F.size(_split_seq(F.col("_seq")))
    )
    return (
        per_word.withColumn("_n", n)
        .groupBy(*docs.columns)
        .agg(F.sum("_n").cast("bigint").alias(out_col))
    )


def vocabulary(
    merges: list[tuple[int, str, str, str, int]]
) -> list[tuple[str, int]]:
    """The token vocabulary a merge table induces: the 26 base symbols
    then each merged symbol in learned order, densely id'd — the
    deterministic string->id contract ``encode_tokens`` ships with.
    Driver-side and tiny (26 + n_merges rows)."""
    vocab = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    for _, _, _, m, _ in merges:
        if m not in vocab:
            vocab.append(m)
    return [(tok, i) for i, tok in enumerate(vocab)]


def encode_tokens(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = MIN_WORD_LEN,
    max_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """End-to-end tokenizer APPLY — the step a training-data pipeline
    runs at 100 TB: encode every document into its ordered BPE token-id
    sequence. Returns one row per (doc, word index, token index):
    ``(id_col, word_idx, tok_idx, token, token_id)`` — the exploded
    form keeps the output oracle-checkable and join-ready for packing.

    Scale shape: the merge chain is map-only codegen replaces; the only
    join is vocabulary-sized (26 + n_merges rows) and broadcast, so no
    corpus shuffle beyond the final explode. Tokens outside the learned
    vocabulary (possible only if fit and encode corpora differ) get
    token_id = -1 rather than dropping the position."""
    spark = docs.sparkSession
    per_word = _encoded_words(docs, merges, text_col, min_len, max_len).filter(
        F.col("_word").isNotNull()
    )
    toks = per_word.select(
        F.col(id_col),
        F.col("_widx").alias("word_idx"),
        F.posexplode(_split_seq(F.col("_seq"))).alias("tok_idx", "token"),
    )
    vocab = spark.createDataFrame(vocabulary(merges), "token string, token_id int")
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .select(
            id_col,
            "word_idx",
            "tok_idx",
            "token",
            F.coalesce("token_id", F.lit(-1)).alias("token_id"),
        )
    )
