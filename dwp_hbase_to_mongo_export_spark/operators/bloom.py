"""Bloom-filter semi-join reduction (Bloom 1970; the distributed-join
"semi-join reducer" of Bernstein/Chiu 1981, public literature): screen
the FACT side of a join map-side with a constant-size bit set built
from the (filtered) dimension keys, so rows that cannot match never
enter the shuffle.

Spark itself can inject runtime bloom filters
(spark.sql.optimizer.runtime.bloomFilter.enabled) for supported shapes;
this explicit operator exists for the same reasons the CMS screen does:

* DETERMINISTIC seeded-xxhash64 bit positions — the filter, and
  therefore the screened row set, is reproducible across runs and
  explicit in the plan (the native filter's bits are engine-private
  and injection is best-effort); exactness needs no cross-engine hash
  portability because the join discards false positives either way;
* the bit set rides as ~m/64 packed-long ARRAY LITERALS (a single
  Literal object), so membership is pure codegen — no join, no
  broadcast exchange, usable under any join shape including ones the
  native injection declines;
* no false negatives, so screening before an exact join preserves the
  result EXACTLY — false positives are discarded by the join itself.

Scale shape: the build is one dimension scan to <= m distinct bit
positions (bounded driver collect, same class as the CMS sketch); the
screen is a map-only filter on the fact scan; the join downstream sees
only |matching| + |false positive| rows, with FP rate ~ (1-e^{-kn/m})^k.

Reference scope note: the reference performs no relational joins
(its dataflow is scan -> transform -> sink); this extends the join
family for star-schema reduction at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M, BLOOM_K = 65536, 4  # bits, hash count
# m is a CONSTANT-size knob (the bit vector ships as one ~m*4-byte
# array literal with the task closure — the same cost class as a small
# broadcast). Size m ~ 10x the expected key count for ~sub-1% FP; an
# undersized filter degrades to more false positives, never to a wrong
# result.


def _position(value: Column, i: int, m: int) -> Column:
    """Bit position i for a value: seeded xxhash64 mod m. xxhash64 is
    JVM-native (~ns per call) — the screen runs on EVERY fact row, and
    an md5-hex + conv formulation measured ~10x slower row cost. The
    sketch family keeps md5 for cross-engine oracle checkability; the
    bloom's bits never leave Spark (the oracle is the plain join), so
    determinism WITHIN the engine is all exactness needs."""
    return F.pmod(F.xxhash64(value, F.lit(i)), F.lit(m))


def bloom_positions(value: Column, m: int = BLOOM_M, k: int = BLOOM_K) -> Column:
    """Array of the k bit positions (build-side explode helper)."""
    return F.array(*[_position(value, i, m) for i in range(k)])


def bloom_build(
    df: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K
) -> list[int]:
    """Build the filter: one scan to the distinct set bit positions
    (<= m rows — bounded driver collect), returned as an m-length 0/1
    vector."""
    rows = (
        df.select(F.explode(bloom_positions(F.col(key_col), m, k)).alias("pos"))
        .distinct()
        .collect()
    )
    bits = [0] * m
    for r in rows:
        bits[int(r["pos"])] = 1
    return bits


def bloom_might_contain(
    value: Column, bits: list[int], m: int = BLOOM_M, k: int = BLOOM_K
) -> Column:
    """Map-only membership test: all k bits set. The bit vector rides
    as ONE array literal; each probe is an O(1) element_at lookup —
    pure codegen, no shuffle, no broadcast exchange.

    Construction note: the literal is built as
    split(lit(csv)).cast(array<int>) — ConstantFolding collapses it to
    a single ArrayData literal. ``F.lit(list)`` must NOT be used here:
    it expands to an m-child array(...) expression whose mere ANALYSIS
    is O(m) tree nodes (measured 25 s at m=65536 before any row ran)."""
    table = F.split(F.lit(",".join(map(str, bits))), ",").cast("array<int>")
    cond = F.lit(True)
    for i in range(k):
        # each condition carries ONLY its own position expression —
        # referencing a shared k-wide array column here would duplicate
        # the whole position subtree into every conjunct (measured 2x
        # row cost before codegen CSE could help)
        cond = cond & (
            F.element_at(table, _position(value, i, m).cast("int") + 1) == 1
        )
    return cond
