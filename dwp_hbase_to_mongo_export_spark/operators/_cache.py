"""Bounded operator-scoped caching.

Some multi-consumer dedup DAGs persist an intermediate relation (per-doc
minhash state, winnowing fingerprints) because it feeds both sides of a
self-join AND a statistics pass — recomputation would triple the md5
work and a leaked .persist() per invocation grows session storage
without bound (and a stale cache entry can substitute
InMemoryTableScan into LATER queries' plans — the round-4
module-scoped-fixture lesson).

``swap_cache(slot, df)`` keeps AT MOST ONE live cached relation per
operator slot: each invocation unpersists the previous invocation's
frame before persisting its own, so repeated bench/test/library calls
plateau at one bounded cache entry instead of accumulating. The live
entry is exactly the one the most recent result still needs.
``release(slot)`` drops it eagerly when the caller is done.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_SLOTS: dict[str, DataFrame] = {}


def swap_cache(slot: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` (memory-and-disk) and release the slot's previous
    occupant. Returns the persisted frame."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass  # session already stopped
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _SLOTS[slot] = out
    return out


def release(slot: str) -> None:
    """Eagerly drop the slot's cached relation (no-op when empty)."""
    prev = _SLOTS.pop(slot, None)
    if prev is not None:
        prev.unpersist()
