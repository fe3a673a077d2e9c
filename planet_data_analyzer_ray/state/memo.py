"""Session-scoped shared-artifact memo (round-5 same-scan fusion).

Many registry queries start from the same corpus-wide derivation (the
light image-metadata scan, the fused pixel-metrics pass, the phash
near-dup pair discovery).  This memo runs each such derivation ONCE per
(ray session, sf_dir) and hands every consumer the same materialized
Dataset / driver-side table — per-query attribution in the bench stays
(the first query of a family pays the shared cost), suite wall drops.

Keys include the ray job id: a ray restart invalidates any cached
``Dataset`` (its blocks died with the object store), so a fresh session
transparently rebuilds.  ``GRAFT_NO_MEMO=1`` disables sharing for
honest cold-path measurements (bench scaling legs).

At 100-TB scale the same artifacts would be write-once parquet/Lance
checkpoints (build job writes, every consumer reads with column
pruning); the session memo is the in-box equivalent.
"""

from __future__ import annotations

import os

import ray

_MEMO: dict = {}
# registry-wide table-read memos (one per (table, column-set)) push the
# entry count far past the old 32; entries are block-ref handles, not
# data copies, so the cap only bounds cross-session leakage
_MEMO_MAX = 192

# (sf_dir, name) -> seconds spent building the shared artifact, for
# honest bench attribution (bench.py emits these as "shared_builds")
BUILD_TIMES: dict = {}


def _session_token() -> str:
    try:
        if ray.is_initialized():
            return ray.get_runtime_context().get_job_id()
    except Exception:
        pass
    return "no-session"


def shared(sf_dir: str, name: str, builder):
    """Memoize ``builder()`` per (ray session, sf_dir, name)."""
    if os.environ.get("GRAFT_NO_MEMO") == "1":
        return builder()
    key = (_session_token(), os.path.realpath(sf_dir), name)
    if key not in _MEMO:
        if len(_MEMO) >= _MEMO_MAX:
            # drop artifacts from dead sessions first, then oldest
            for k in [k for k in _MEMO if k[0] != key[0]] or list(_MEMO)[:1]:
                _MEMO.pop(k, None)
        import time

        t0 = time.perf_counter()
        _MEMO[key] = builder()
        BUILD_TIMES[(os.path.realpath(sf_dir), name)] = round(
            time.perf_counter() - t0, 3
        )
    return _MEMO[key]


def clear() -> None:
    """Testing/bench hook: forget every shared artifact."""
    _MEMO.clear()
