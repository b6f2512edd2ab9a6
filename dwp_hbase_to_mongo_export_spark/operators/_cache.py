"""Bounded operator-scoped caching.

Some multi-consumer dedup DAGs persist an intermediate relation (per-doc
minhash state, winnowing fingerprints) because it feeds both sides of a
self-join AND a statistics pass — recomputation would triple the md5
work and a leaked .persist() per invocation grows session storage
without bound (and a stale cache entry can substitute
InMemoryTableScan into LATER queries' plans — the round-4
module-scoped-fixture lesson).

``swap_cache(slot, df)`` keys entries by (operator slot, semantic hash
of the analyzed plan) so that

* a re-invocation on the SAME input reuses the already-persisted frame
  (no re-persist churn), and
* interleaved or concurrent invocations on DIFFERENT inputs (threaded
  bench, two corpora) do NOT unpersist a relation the other in-flight
  job is still scanning — the round-4 failure mode this file was
  flagged for. Per slot, up to ``_MAX_PER_SLOT`` entries stay live
  (insertion-order eviction beyond that), so storage still plateaus
  instead of accumulating one entry per invocation.

All registry mutation happens under a lock; unpersist of the evicted
frame happens outside it (it can block on the JVM).
``release(slot)`` drops every entry for the slot when the caller is
done.
"""

from __future__ import annotations

import threading

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# (slot, semantic-hash) -> persisted frame; dict preserves insertion
# order, which is what the per-slot eviction walks.
_SLOTS: dict[tuple[str, int], DataFrame] = {}
_LOCK = threading.Lock()
# Two live inputs per operator covers the interleaving the bench/tests
# actually do (e.g. corpus A and corpus B alternating); a third distinct
# input evicts the oldest.
_MAX_PER_SLOT = 2


def _semantic_key(df: DataFrame) -> int:
    """Semantic hash of the analyzed plan — a fast probe only: the hash
    is 32-bit, so a hit is CONFIRMED with _same_result before reuse
    (the CacheManager pairing: hash to find, sameResult to trust).
    Falls back to id(df) (never-reuse, still bounded by eviction) on
    Connect or other backends without the JVM handle."""
    try:
        return int(df._jdf.queryExecution().analyzed().semanticHash())
    except Exception:
        return id(df)


def _same_result(a: DataFrame, b: DataFrame) -> bool:
    """Plan-level equivalence check for a hash hit; False on any error
    (treat as miss — re-persisting is safe, wrong reuse is not)."""
    try:
        return bool(
            a._jdf.queryExecution()
            .analyzed()
            .sameResult(b._jdf.queryExecution().analyzed())
        )
    except Exception:
        return False


def swap_cache(slot: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` (memory-and-disk) under (slot, semantic hash),
    reusing an existing live entry for the same input and evicting the
    slot's oldest entry beyond the per-slot bound. Returns the
    persisted frame."""
    key = (slot, _semantic_key(df))
    evicted: list[DataFrame] = []
    with _LOCK:
        hit = _SLOTS.pop(key, None)
        if hit is not None and _same_result(hit, df):
            _SLOTS[key] = hit  # refresh insertion order (LRU-ish)
            # an external spark.catalog.clearCache() (the bench between
            # its best-of-N reps, a test teardown) unpersists the frame
            # BEHIND the registry; a hit must come back persisted or
            # every consumer silently recomputes the whole subtree
            try:
                if hit.storageLevel == StorageLevel.NONE:
                    hit.persist(StorageLevel.MEMORY_AND_DISK)
            except Exception:
                pass  # Connect or stopped session: hand back as-is
            return hit
        if hit is not None:
            # 32-bit hash collision between different inputs: keep the
            # colliding occupant live under a unique key (it may still
            # be in use) and fall through to persist the new frame
            _SLOTS[(slot, id(hit))] = hit
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _SLOTS[key] = out
        mine = [k for k in _SLOTS if k[0] == slot]
        while len(mine) > _MAX_PER_SLOT:
            oldest = mine.pop(0)
            evicted.append(_SLOTS.pop(oldest))
    for prev in evicted:
        try:
            prev.unpersist()
        except Exception:
            pass  # session already stopped
    return out


def release(slot: str) -> None:
    """Eagerly drop every cached relation for the slot (no-op when
    empty)."""
    with _LOCK:
        mine = [k for k in _SLOTS if k[0] == slot]
        dropped = [_SLOTS.pop(k) for k in mine]
    for prev in dropped:
        try:
            prev.unpersist()
        except Exception:
            pass
