"""Paired-persist bookkeeping for catalog query functions.

A catalog query function must not leave persisted frames behind in
the shared driver session (SCALE.md round-4 rule): every `persist()`
registers its analyzed plan in the session CacheManager, and later
queries pay a planning tax walking those entries for subtree matches
(3-7x measured once wide-literal plans accumulate).

The lifecycle problem: a query function returns a LAZY DataFrame, so
it cannot unpersist its shared intermediate frames before returning —
the caller has not consumed them yet. `pin()` solves the pairing by
registry: it persists the frame AND records it, and `release_pins()`
unpersists everything recorded. Release fires at two points:

1. `queries._fresh_entry` calls it on entry of the NEXT catalog query
   (whatever the previous query pinned is dead weight by then), and
2. harnesses (scripts/check.py, bench.py) call it right after
   consuming each result, so nothing outlives its query even at the
   tail of a session.

Intra-query reuse (the reason to persist at all — e.g. a minhash
signature frame feeding both the LSH band join and the Jaccard
verify join) is untouched: pins live exactly as long as the query
that created them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """persist() with a paired, registry-driven unpersist."""
    out = df.persist()
    _PINNED.append(out)
    return out


def release_pins() -> None:
    """Unpersist every frame pinned since the last release."""
    while _PINNED:
        try:
            _PINNED.pop().unpersist()
        except Exception:  # pragma: no cover - session already gone
            pass
