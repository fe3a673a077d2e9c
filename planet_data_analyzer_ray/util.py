"""Small shared numerics/helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def collect_table(ds: "ray.data.Dataset", schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small) Dataset into one Arrow table, ignoring the
    schema-less empty blocks Ray emits for empty group results.

    Deliberately avoids ``Dataset.to_arrow_refs``: that API calls
    ``schema(fetch_if_missing=True)`` AFTER consuming, and when the
    output contains schema-less empty blocks the cached schema is
    missing, so Ray silently RE-EXECUTES the whole plan under a
    ``limit(1)`` — for a multi-sort DAG that second pass costs nearly
    full price (measured ~2x on the Jaccard pipeline).  Our pipelines
    emit Arrow blocks, so we take the bundle refs directly."""
    blocks = ray.get(collect_block_refs(ds))
    tables = []
    for t in blocks:
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        if t.num_rows > 0:
            tables.append(t)
    if tables:
        return pa.concat_tables(tables, promote_options="default")
    if schema is not None:
        return schema.empty_table()
    return pa.table({})


def collect_block_refs(ds: "ray.data.Dataset") -> list:
    """Block ObjectRefs of an executed Dataset WITHOUT the
    ``to_arrow_refs`` schema probe (see :func:`collect_table`); blocks
    are Arrow tables in all of this repo's pipelines."""
    return [r for bundle in ds.iter_internal_ref_bundles() for r in bundle.block_refs]


def default_concurrency() -> tuple[int, int]:
    """Actor-pool sizing: scale the pool ceiling to the cluster's CPUs
    (min 2 actors warm, cap at total cores) — one num_cpus=1 actor per
    core so an actor stage can saturate the node."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (2, max(4, cpus))


def hash_partition(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    """Stable avalanche hash partition of int keys — THE shared
    co-partitioning function: every stage that must land equal keys on
    the same partition calls this (a drifting copy silently breaks the
    invariant).  Fibonacci multiply + HIGH-bit extraction before the
    modulus: a bare multiplicative ``(k*c) % P`` maps every key that is
    a multiple of a power-of-two P to partition 0 (structured keys like
    ``cell*64 + salt`` serialized an entire join onto one reduce task);
    taking the high 32 bits first mixes every input bit into the
    partition id for any P.  Partition ids are routing-only — no output
    or oracle depends on the value, so the mix is free to change as
    long as it changes HERE only."""
    h = keys.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(32)) % np.uint64(num_partitions)).astype(np.int64)


def sorted_isin(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Membership mask of ``needles`` in a SORTED int array — the
    searchsorted probe with the empty-haystack and clamp guards that
    every broadcast-set filter needs."""
    if len(haystack) == 0:
        return np.zeros(len(needles), dtype=bool)
    pos = np.minimum(np.searchsorted(haystack, needles), len(haystack) - 1)
    return haystack[pos] == needles


def popcount64(v: np.ndarray) -> np.ndarray:
    """SWAR popcount for int64/uint64 arrays (numpy<2 lacks bitwise_count)."""
    x = v.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
