"""Text primitives shared by the dedup / text-analysis operators.

All column expressions here are JVM built-ins (codegen'd, no Python), and
every hash is md5-based so a SQL oracle (DuckDB) can reproduce results
bit-for-bit — the property the correctness gate relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small per-language stopword lists for the langid heuristic. Public
# common-word lists; deliberately tiny so the oracle SQL can inline them.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def normalize_text(c: Column, max_chars: int | None = None) -> Column:
    """lower -> non-alnum to space -> squeeze spaces -> trim [-> truncate].
    Identical to the oracle's regexp chain."""
    out = F.trim(F.regexp_replace(F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " "), " +", " "))
    if max_chars is not None:
        out = F.substring(out, 1, max_chars)
    return out


def tokens(c: Column) -> Column:
    """Whitespace tokens of normalised text (array<string>)."""
    return F.split(normalize_text(c), " ")


def hash32(c: Column) -> Column:
    """Portable 32-bit unsigned hash: first 8 hex chars of md5, as bigint.
    DuckDB equivalent: CAST('0x' || substr(md5(x),1,8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def char_shingle_sets(
    df: DataFrame, text_col: str, id_col: str, k: int = 5, max_chars: int = 256
) -> DataFrame:
    """Distinct character k-gram shingles per document as ONE array column
    -> (id_col, gs: array<string>). Fully narrow — no explode, no
    distinct shuffle: the per-doc set is array_distinct over a transform
    of the index sequence, bounded by max_chars elements. This is the
    scale-path form: downstream signature/band computation stays
    per-row (map-only), so the first shuffle in the dedup DAG is the
    candidate equi-join itself."""
    s = normalize_text(F.col(text_col), max_chars)
    df2 = df.select(F.col(id_col), s.alias("s")).filter(F.length("s") >= k)
    idx = F.sequence(F.lit(1), F.length("s") - (k - 1))
    gs = F.array_distinct(F.transform(idx, lambda i: F.col("s").substr(i, F.lit(k))))
    return df2.select(id_col, gs.alias("gs"))


def char_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 5, max_chars: int = 256) -> DataFrame:
    """Distinct character k-gram shingles per document over normalised,
    truncated text -> (id_col, g). Truncation bounds the blow-up: shingle
    rows per doc <= max_chars regardless of document size, which is what
    keeps the dedup family linear in corpus size at 100 TB."""
    s = normalize_text(F.col(text_col), max_chars)
    df2 = df.select(F.col(id_col), s.alias("s")).filter(F.length("s") >= k)
    i = F.explode(F.sequence(F.lit(1), F.length("s") - (k - 1))).alias("i")
    return (
        df2.select(id_col, "s", i)
        .select(id_col, F.col("s").substr(F.col("i"), F.lit(k)).alias("g"))
        .distinct()
    )
