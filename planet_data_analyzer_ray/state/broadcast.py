"""Broadcast-state management for stateless task pools.

Two ways to hold per-worker state (an STRtree, a codec, a query
matrix) built from a ``ray.put`` broadcast object:

1. **Actor pools** (`map_batches(CallableClass, concurrency=...)`):
   state in ``__init__``.  Right for long-running stages and genuinely
   heavy state, but every actor is a fresh Python process — on short
   jobs the pool ramp (process spawn + imports) dominates.

2. **Worker-process cache** (this module): a plain function stage
   (task pool) that resolves the broadcast ref once per *worker
   process* via `cached()`.  Ray reuses warm worker processes across
   tasks and stages, so the build-once-per-worker invariant holds with
   zero pool-ramp cost.  This is the default execution path for the
   engine's broadcast joins.

Both paths ship the object once per node via the object store
(``ray.put`` + shared-memory reads), never once per batch.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable

import ray

_CACHE: "OrderedDict[str, Any]" = OrderedDict()
_CACHE_MAX = 16  # LRU bound: long-lived workers must not grow unboundedly


def _put(key: str, value: Any) -> Any:
    _CACHE[key] = value
    _CACHE.move_to_end(key)
    while len(_CACHE) > _CACHE_MAX:
        _CACHE.popitem(last=False)
    return value


def cached(ref, builder: Callable[[Any], Any]) -> Any:
    """Resolve ``ref`` and build derived state once per worker process.

    ``ref`` is a ``ray.ObjectRef`` from ``ray.put`` or an explicit string
    key (other types raise).  The builder runs at most once per (worker,
    ref); later tasks on the same worker reuse the built state.  The
    cache is a small LRU so repeated query runs on a long-lived cluster
    cannot grow worker memory without bound."""
    if isinstance(ref, ray.ObjectRef):
        key = ref.hex()
    elif isinstance(ref, str):
        # value-keyed: id() of a string is unsafe (CPython reuses freed
        # addresses, which aliased different text stages in practice)
        key = f"str:{ref}"
    else:
        # id() keys alias across a worker's lifetime for ANY object the
        # moment the original is freed — same bug class as the string
        # case above.  Callers must pass an ObjectRef or a string key.
        raise TypeError(
            f"cached() key must be a ray.ObjectRef or str, got {type(ref).__name__}"
        )
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    obj = ref if not isinstance(ref, ray.ObjectRef) else ray.get(ref)
    return _put(key, builder(obj))
