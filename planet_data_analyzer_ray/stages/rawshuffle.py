"""Raw-task map-side hash shuffle for already-hash-partitioned rows.

Why this exists next to ``Dataset.groupby().map_groups``: Ray Data's
map_groups exchange is SORT-based — it samples key ranges, globally
sorts every row, and re-slices blocks, and it pays that fixed price per
exchange.  For pipelines whose partition key is already a uniform hash
id in ``[0, P)`` (every stage of the n-gram Jaccard chain emits one
inline), a map-side split + one-task-per-partition reduce moves the
same bytes with no sampling pass, no sort, and no block coalescing; the
intermediate objects are exactly the per-partition sub-tables a
push-based cluster shuffle would ship between nodes, so the shape holds
on a real multi-node object store.

Partitioning assumption (documented per the custom-operator rule): the
split column must be an integer hash-partition id computed by the
upstream kernel (``util.hash_partition`` or the stage's own
multiplicative hash); values are mapped into ``[0, n)`` by ``% n``, so
any uniform integer key works.  A reduce task sees the FULL partition —
kernels may assume key co-location exactly as they do under
``groupby(part_col).map_groups``.

Scale note: like any shuffle this is a barrier — every upstream block
must finish before reduces start — but per-partition sub-tables spill
independently and reduce tasks stream out as their inputs complete, so
peak object-store footprint matches Ray Data's own shuffle, minus the
sort samples.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def split_by_part(tbl: pa.Table, col: str, n: int, drop: bool = True) -> list[pa.Table]:
    """Split a table into ``n`` sub-tables by ``col % n`` (col dropped
    unless ``drop=False``), one stable-ordered contiguous slice per
    partition."""
    if tbl.num_rows == 0:
        # Ray emits schema-less empty blocks from empty group results
        # (see util.collect_table) — they may lack the split column
        t = tbl.drop_columns([col]) if drop and col in tbl.schema.names else tbl
        return [t] * n
    p = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.int64) % np.int64(n)
    t = tbl.drop_columns([col]) if drop else tbl
    order = np.argsort(p, kind="stable")
    ts = t.take(order)
    bounds = np.searchsorted(p[order], np.arange(1, n, dtype=np.int64))
    out, prev = [], 0
    for b in list(bounds) + [tbl.num_rows]:
        out.append(ts.slice(prev, b - prev))
        prev = b
    return out


@ray.remote
def _split_block(tbl: pa.Table, col: str, n: int):
    parts = split_by_part(tbl, col, n)
    return parts[0] if n == 1 else tuple(parts)


@ray.remote
def _stage_task(kernel, split_col, n_out, *parts):
    tabs = [t for t in parts if t is not None and t.num_rows]
    # empty partitions reach the kernel as None (never a possibly
    # schema-less empty block), so kernels guard one uniform case
    inp = pa.concat_tables(tabs, promote_options="default") if tabs else None
    out = kernel(inp)
    if split_col is None:
        return out
    parts = split_by_part(out, split_col, n_out)
    return parts[0] if n_out == 1 else tuple(parts)


def split_blocks(block_refs: list, col: str, n: int) -> list[list]:
    """Map-side split of upstream blocks: one task per block, ``n``
    returns each.  Result: list over blocks of per-partition refs."""
    out = []
    for b in block_refs:
        r = _split_block.options(num_returns=n if n > 1 else 1).remote(b, col, n)
        out.append([r] if n == 1 else list(r))
    return out


@ray.remote
def _split_block_counted(tbl: pa.Table, col: str, n: int, drop: bool = True):
    parts = split_by_part(tbl, col, n, drop=drop)
    counts = np.asarray([p.num_rows for p in parts], dtype=np.int64)
    return (*parts, counts)


def part_map_groups(ds, part_col: str, kernel, num_parts: int, drop_col: bool = True):
    """Drop-in for ``ds.groupby(part_col).map_groups(kernel)`` when
    ``part_col`` is a precomputed uniform hash id in ``[0, P)``: one
    map-side split per upstream block, one reduce task per partition,
    result re-wrapped as a Dataset for downstream chaining.

    Matches groupby semantics exactly: partitions that received no rows
    produce no output block and no task (the split tasks return tiny
    per-partition row counts, fetched before scheduling reduces), so
    the kernel ALWAYS sees a non-empty partition with ``part_col``
    already dropped (``drop_col=False`` keeps it, for kernels written
    against the groupby contract that drop it themselves).  ``num_parts``
    may be smaller than the id space — routing is ``id % num_parts``,
    still uniform for hash ids; partition count is a scale parameter
    (more parts on a bigger cluster).  Executes the upstream plan
    eagerly (a shuffle is a barrier either way)."""
    from ..util import collect_block_refs

    blocks = collect_block_refs(ds)
    if not blocks:
        return ds  # fully-executed empty plan: nothing to exchange
    splits, count_refs = [], []
    for b in blocks:
        r = _split_block_counted.options(num_returns=num_parts + 1).remote(
            b, part_col, num_parts, drop_col
        )
        splits.append(list(r[:num_parts]))
        count_refs.append(r[num_parts])
    counts = np.sum(ray.get(count_refs), axis=0)
    out_refs = [
        _stage_task.options(num_returns=1).remote(
            kernel, None, 1, *[s[i] for s in splits]
        )
        for i in range(num_parts)
        if counts[i]
    ]
    if not out_refs:
        # every upstream block was empty — preserve their (possibly
        # schema-less) emptiness, exactly what groupby would return
        return ray.data.from_arrow_refs(blocks)
    return ray.data.from_arrow_refs(out_refs)


def run_stage(in_splits: list[list], kernel, n_in: int, split_col=None, n_out=1):
    """One reduce task per partition ``i``: concat the i-th sub-table of
    every upstream task, apply ``kernel`` (which receives the concat
    table, or an empty/None input when the partition is empty), and
    optionally re-split the output by ``split_col`` into ``n_out``
    parts for the next exchange.

    ``in_splits``: list over upstream tasks of per-partition ref lists
    (the return shape of :func:`split_blocks` / this function).
    Returns: list over ``n_in`` partitions — each a single ref when
    ``split_col`` is None, else a list of ``n_out`` refs."""
    outs = []
    nr = 1 if split_col is None or n_out == 1 else n_out
    for i in range(n_in):
        ins = [s[i] for s in in_splits]
        r = _stage_task.options(num_returns=nr).remote(kernel, split_col, n_out, *ins)
        outs.append(r if nr == 1 else list(r))
    if split_col is not None and n_out == 1:
        return [[r] for r in outs]
    return outs
