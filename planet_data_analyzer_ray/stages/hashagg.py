"""Hash-partitioned vectorized aggregation / distinct.

Ray Data's ``groupby(key).map_groups`` calls Python once per *group*;
for high-cardinality keys (hundreds of thousands of tiles) that
dominates wall time.  These helpers shuffle on ``hash(key) % P``
instead — P partitions, each reduced with one vectorized
sort + ``np.*.reduceat`` pass.  Same shuffle semantics (each key lands
on exactly one partition), ~1000x less Python overhead.  This is also
the honest scale pattern: partition count, not group count, bounds
task count on a cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import collect_block_refs


def _partial_kernel(
    batch: pa.Table, key: str, sum_cols: tuple[str, ...], count_name: str
) -> pa.Table:
    """Shared per-batch combiner: sort + unique + reduceat over the key."""
    k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(k, kind="stable")
    ks = k[order]
    uniq, start, counts = np.unique(ks, return_index=True, return_counts=True)
    cols = {key: pa.array(uniq), count_name: pa.array(counts.astype(np.int64))}
    for c in sum_cols:
        v = batch.column(c).to_numpy(zero_copy_only=False)
        cols[c] = pa.array(np.add.reduceat(v[order], start))
    return pa.table(cols)


def _with_part(batch: pa.Table, key: str, num_partitions: int) -> pa.Table:
    from ..util import hash_partition

    k = batch.column(key).to_numpy(zero_copy_only=False)
    return batch.append_column(
        "__part", pa.array(hash_partition(k.astype(np.int64), num_partitions))
    )


def count_sum_by_key(
    ds: "ray.data.Dataset",
    key: str,
    sum_cols: tuple[str, ...] = (),
    count_name: str = "n",
    num_partitions: int = 1024,
) -> "ray.data.Dataset":
    """groupby(int key) -> count + sums, hash-partitioned + vectorized.
    Includes a per-batch partial pre-aggregate (combiner) so only
    (key, partials) rows enter the shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_kernel(batch, key, sum_cols, count_name)

    def final(group: pa.Table) -> pa.Table:
        k = group.column(key).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        uniq, start = np.unique(ks, return_index=True)
        cols = {key: pa.array(uniq)}
        cnt = group.column(count_name).to_numpy(zero_copy_only=False)
        cols[count_name] = pa.array(np.add.reduceat(cnt[order], start))
        for c in sum_cols:
            v = group.column(c).to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.add.reduceat(v[order], start))
        return pa.table(cols)

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    parted = pre.map_batches(
        lambda b: _with_part(b, key, num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    # raw-task map-side shuffle (stages/rawshuffle.py): the exchanged
    # rows are pre-aggregated partials, so the reduce-task count can be
    # far below the key-hash modulus (% routing stays uniform)
    from .rawshuffle import part_map_groups

    return part_map_groups(
        parted, "__part", final, min(num_partitions, 128)
    )


def distinct_values(
    ds: "ray.data.Dataset", key: str, num_partitions: int = 1024
) -> "ray.data.Dataset":
    """Distinct values of an int column, hash-partitioned + vectorized,
    with per-batch pre-distinct as the combiner."""

    def pre(batch: pa.Table) -> pa.Table:
        k = np.unique(batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({key: pa.array(k)})

    def final(group: pa.Table) -> pa.Table:
        k = np.unique(group.column(key).to_numpy(zero_copy_only=False))
        return pa.table({key: pa.array(k)})

    parted = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True, batch_size=None).map_batches(
        lambda b: _with_part(b, key, num_partitions),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    from .rawshuffle import part_map_groups

    return part_map_groups(parted, "__part", final, min(num_partitions, 128))


# --- shuffle-free tree aggregate -------------------------------------------

def _reduce_partials(
    tables: list[pa.Table], key: str, sum_cols: tuple[str, ...], count_name: str
) -> pa.Table:
    nonempty = [x for x in tables if x.num_rows]
    if not nonempty:
        return tables[0]
    t = pa.concat_tables(nonempty)
    k = t.column(key).to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    ks = k[order]
    uniq, start = np.unique(ks, return_index=True)
    cols = {key: pa.array(uniq)}
    for c in (count_name, *sum_cols):
        v = t.column(c).to_numpy(zero_copy_only=False)
        cols[c] = pa.array(np.add.reduceat(v[order], start))
    return pa.table(cols)


def _node_local_first_merge(refs: list, merge, fanin: int) -> list:
    """Two-level aggregation for multi-node clusters: reduce each
    node's partials to ONE table with node-affine merge tasks (inputs
    read from local plasma), so only #nodes partials ever cross the
    object manager — instead of every block partial riding the k-ary
    tree over the network.  On a single node (or when locations are
    unavailable) this is a no-op and the plain tree runs unchanged."""
    import ray

    try:
        if len({n["NodeID"] for n in ray.nodes() if n["Alive"]}) <= 1:
            return refs
        from ray.util.scheduling_strategies import NodeAffinitySchedulingStrategy

        locs = ray.experimental.get_object_locations(refs)
    except Exception:
        return refs
    groups: dict = {}
    for r in refs:
        ids = locs.get(r, {}).get("node_ids") or []
        nid = ids[0] if ids else None
        if isinstance(nid, (bytes, bytearray)):
            nid = nid.hex()
        groups.setdefault(nid, []).append(r)
    if len(groups) <= 1:
        return refs
    out: list = []
    for nid, g in groups.items():
        opts = (
            {"scheduling_strategy": NodeAffinitySchedulingStrategy(node_id=nid, soft=True)}
            if nid is not None
            else {}
        )
        while len(g) > 1:
            g = [
                merge.options(**opts).remote(*g[i : i + fanin])
                for i in range(0, len(g), fanin)
            ]
        out.extend(g)
    return out


def tree_count_sum_by_key(
    ds: "ray.data.Dataset",
    key: str,
    sum_cols: tuple[str, ...] = (),
    count_name: str = "n",
    fanin: int = 8,
) -> pa.Table:
    """Custom combiner operator: per-block vectorized partials, then a
    k-ary tree of Ray merge tasks — NO sort shuffle at all.

    Correct whenever the aggregate is commutative/associative and the
    distinct-key space is bounded (tile manifests: <3M tiles), which is
    exactly where Ray's sort-based groupby pays an all-to-all it doesn't
    need.  This is the documented raw-Ray-tasks escape hatch (SURVEY.md
    §2 'custom operators', option c); partitioning assumption: none —
    any row placement works, merges are content-addressed by key.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_kernel(batch, key, sum_cols, count_name)

    pre = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    @ray.remote
    def merge(*tables):
        return _reduce_partials(list(tables), key, sum_cols, count_name)

    refs = collect_block_refs(pre)
    if not refs:
        return pa.table({})
    refs = _node_local_first_merge(refs, merge, fanin)
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)
        ]
    out = ray.get(refs[0])
    return out


def tree_max_by_key(
    ds: "ray.data.Dataset", key: str, val: str, fanin: int = 8
) -> pa.Table:
    """Per-key MAX via the same k-ary merge tree as
    tree_count_sum_by_key (no sort shuffle); ``ds`` must already emit
    per-batch (key, val) partials (per-batch max per key), and the
    distinct-key space must be bounded."""
    import ray

    def _max_reduce(tables: list[pa.Table]) -> pa.Table:
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return pa.table(
                {key: pa.array([], pa.int64()), val: pa.array([], pa.int64())}
            )
        t = pa.concat_tables(tables, promote_options="default")
        k = t.column(key).to_numpy(zero_copy_only=False)
        v = t.column(val).to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        last = np.ones(len(ks), dtype=bool)
        last[:-1] = ks[1:] != ks[:-1]
        return pa.table({key: pa.array(ks[last]), val: pa.array(vs[last])})

    @ray.remote
    def merge(*tables):
        return _max_reduce(list(tables))

    refs = collect_block_refs(ds)
    if not refs:
        return pa.table({key: pa.array([], pa.int64()), val: pa.array([], pa.int64())})
    refs = _node_local_first_merge(refs, merge, fanin)
    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)]
    out = ray.get(refs[0])
    if isinstance(out, pa.Table) and out.num_rows == 0:
        return pa.table({key: pa.array([], pa.int64()), val: pa.array([], pa.int64())})
    return _max_reduce([out])


def tree_distinct(ds: "ray.data.Dataset", key: str, fanin: int = 8) -> pa.Table:
    """Distinct int values via per-block unique + tree union of Ray
    tasks — shuffle-free sibling of tree_count_sum_by_key."""
    import ray

    def pre(batch: pa.Table) -> pa.Table:
        k = np.unique(batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({key: pa.array(k)})

    pre_ds = ds.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True, batch_size=None)

    @ray.remote
    def merge(*tables):
        nonempty = [t for t in tables if t.num_rows]
        if not nonempty:
            return tables[0]
        vals = np.unique(
            np.concatenate(
                [t.column(key).to_numpy(zero_copy_only=False) for t in nonempty]
            )
        )
        return pa.table({key: pa.array(vals)})

    refs = collect_block_refs(pre_ds)
    if not refs:
        return pa.table({key: pa.array([], type=pa.int64())})
    while len(refs) > 1:
        refs = [merge.remote(*refs[i : i + fanin]) for i in range(0, len(refs), fanin)]
    out = ray.get(refs[0])
    return out if out.num_rows or key in out.column_names else pa.table({key: pa.array([], type=pa.int64())})
