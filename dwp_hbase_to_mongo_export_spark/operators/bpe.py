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

Symbol sequences ride as SPACE-JOINED strings padded with one leading/
trailing space (`` h e l l o ``) rather than arrays: applying a merge
is then two literal ``replace`` calls (JVM codegen, no UDF), and the
doubled replace is EXACT greedy left-to-right merging — a single pass
misses every second occurrence in runs like ``a b a b a b`` because
each match consumes the boundary space the next match needs; pass one
leaves those misses isolated (never adjacent), so pass two catches all
of them. The same doubled replace runs verbatim in the DuckDB oracle,
which is what makes the whole iterative fit value-checkable.

Reference scope note: the reference has no tokenizer (its unit is the
exported record — HBaseResultProcessor.kt:22-67); this extends the
engine for LLM training-data preparation like the rest of the text
family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_SPLIT = "[^a-z]+"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_v: int = 500,
    min_len: int = 2,
    max_len: int = 12,
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
    """word -> ' c1 c2 ... cn ' (space-joined characters, padded)."""
    return F.concat(
        F.lit(" "), F.array_join(F.split(word_col, ""), " "), F.lit(" ")
    )


def merge_once(seq_col, a: str, b: str) -> F.Column:
    """Apply one merge rule to a padded symbol-sequence string: the
    doubled literal replace (see module docstring for the proof sketch
    that two passes equal exact greedy left-to-right merging)."""
    pat, rep = F.lit(f" {a} {b} "), F.lit(f" {a}{b} ")
    return F.replace(F.replace(seq_col, pat, rep), pat, rep)


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
                base.select("cnt", F.split(F.trim(seq), " ").alias("t"))
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


def encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenise with a learned merge table: per document, per word,
    apply every merge rule in learned order and count the resulting
    symbols. Map-only (one explode + chained codegen replaces, no
    Python); adds ``out_col`` = total BPE token count per document —
    the pipeline's sizing/packing signal (cf. token_counts for the
    regex baseline)."""
    words = docs.withColumn(
        "_w", F.split(F.lower(F.col(text_col)), WORD_SPLIT)
    ).select(
        "*",
        F.explode(
            F.filter("_w", lambda w: (F.length(w) >= 2) & (F.length(w) <= 12))
        ).alias("_word"),
    )
    seq = _pad_seq(F.col("_word"))
    for _, a, b, _, _ in merges:
        seq = merge_once(seq, a, b)
    per_word = words.withColumn("_n", F.size(F.split(F.trim(seq), " ")))
    return per_word.groupBy(*docs.columns).agg(F.sum("_n").alias(out_col))
