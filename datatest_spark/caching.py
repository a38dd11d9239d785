"""Per-call persist lifecycle for operator intermediates.

Several operators (LSH dedup, whole-scope acceptance counting) persist
an intermediate frame that must stay alive until the CALLER
materializes the returned lazy result.  Earlier rounds used one
module-global list evicted at the start of every call, which made
*interleaved* calls evict each other's frames: an unmaterialized
earlier result then silently recomputed its intermediate (correct but
wasteful — and for plans that bake literals derived from the persisted
partitioning, a correctness hazard).

This module gives every operator call its own :class:`CacheHandle`:

* the operator registers each persisted frame on its handle and
  attaches the handle to the DataFrame it returns;
* :func:`unpersist_result` frees exactly one result's intermediates;
* :func:`evict_all` (wrapped by each operator module's
  ``unpersist_cached``) frees everything, for session-level cleanup.

Nothing is evicted while a result frame is still REACHABLE, so
interleaved operator calls can both materialize without recompute.
Storage stays bounded in long-lived sessions two ways:

* **weakref auto-eviction** — :meth:`CacheHandle.attach` installs a
  ``weakref.finalize`` on the returned result frame, so when the
  caller drops their last reference to it (the common
  ``op(df).collect()`` pattern) the intermediates unpersist
  automatically at the next GC.  Callers who keep only a *derived*
  frame (``op(df).filter(...)`` with the direct result discarded) may
  see a correct-but-recomputed plan — operators that bake literals
  from the persisted partitioning pin explicit partition counts so the
  recompute reproduces the same partitioning.
* explicit ``unpersist_result`` / ``unpersist_cached`` for immediate
  deterministic cleanup.

(Persisted frames use MEMORY_AND_DISK, so the worst case between GCs
is spilled disk, not OOM.)
"""

from __future__ import annotations

import weakref
from typing import List

from pyspark.sql import DataFrame

__all__ = ["CacheHandle", "unpersist_result", "evict_all"]

_HANDLE_ATTR = "_datatest_cache_handle"


class CacheHandle:
    """The persisted intermediates of ONE operator call."""

    def __init__(self, registry: list):
        self._frames: List[DataFrame] = []
        self._registry = registry
        registry.append(self)

    def register(self, frame: DataFrame) -> DataFrame:
        """Track an (already persisted) intermediate frame."""
        self._frames.append(frame)
        return frame

    def attach(self, result: DataFrame) -> DataFrame:
        """Hand lifecycle ownership to the returned result frame.

        Also registers a GC backstop: when the result frame itself
        becomes unreachable, this handle's intermediates unpersist
        automatically (``weakref.finalize`` holds the handle, never
        the frame, so it cannot keep the frame alive)."""
        setattr(result, _HANDLE_ATTR, self)
        weakref.finalize(result, CacheHandle.unpersist, self)
        return result

    def absorb(self, other: "CacheHandle") -> None:
        """Take over *other*'s frames (one result frame owning the
        intermediates of several sub-operations, e.g. a composed
        acceptance with two stateful operands)."""
        self._frames.extend(other._frames)
        other._frames.clear()
        try:
            other._registry.remove(other)
        except ValueError:
            pass

    def unpersist(self, blocking: bool = False) -> int:
        """Evict this call's frames; returns #frames evicted.  Safe at
        any time — an unmaterialized result simply recomputes."""
        n = 0
        while self._frames:
            try:
                self._frames.pop().unpersist(blocking)
            except Exception:  # session already stopped — nothing to free
                pass
            n += 1
        try:
            self._registry.remove(self)
        except ValueError:
            pass
        return n


def unpersist_result(result: DataFrame, blocking: bool = False) -> int:
    """Evict the persisted intermediates backing *result* (a frame
    returned by a dedup/acceptance operator).  No-op for frames without
    a handle.  Returns #frames evicted."""
    handle = getattr(result, _HANDLE_ATTR, None)
    return handle.unpersist(blocking) if handle is not None else 0


def evict_all(registry: list, blocking: bool = False) -> int:
    """Evict every live handle in *registry*; returns #frames evicted."""
    n = 0
    while registry:
        n += registry[-1].unpersist(blocking)
    return n
