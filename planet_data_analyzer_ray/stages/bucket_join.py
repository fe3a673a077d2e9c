"""Bucket lookup-join: a hash-exchange inner join against a UNIQUE-key
table, built from the same tagged-union + ``util.hash_partition``
exchange every other co-partitioned stage here uses.

Why this exists: Ray 2.49's ``Dataset.join`` spins up a hash-shuffle
aggregator-actor pool per join, and TWO joins in one streaming plan
deadlock (pools are created eagerly and cannot co-schedule — see
q_nation_item_revenue's history; reproduced at num_cpus=4).  A chain
of lookup joins expressed as tagged-union groupbys needs no actor
pools, no ``materialize()`` stage barrier, and streams end to end.

Semantics: INNER join where the right side (``table``) is unique on
its key — the primary-key lookup shape (orderkey->custkey,
custkey->nationkey).  Duplicate right keys would silently resolve to
one arbitrary match, so the resolver asserts uniqueness per partition
(cheap: one diff on the sorted keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import hash_partition, sorted_isin


def lookup_join(
    stream: "ray.data.Dataset",
    key_col: str,
    payload_cols: tuple[str, ...],
    table: "ray.data.Dataset",
    table_key: str,
    table_val: str,
    out_val: str | None = None,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """stream (key, payloads...) INNER JOIN table (key -> val) on one
    hash exchange; output columns [key_col, *payload_cols, out_val].
    Payloads and the looked-up value must be int64 (the tagged union
    pads the missing side with zeros)."""
    out_val = out_val or table_val

    def tag_stream(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        cols = {"__key": b.column(key_col)}
        for c in payload_cols:
            cols[c] = b.column(c)
        cols["__val"] = pa.array(np.zeros(len(k), np.int64))
        cols["__kind"] = pa.array(np.ones(len(k), np.int8))
        cols["__part"] = pa.array(hash_partition(k, num_partitions))
        return pa.table(cols)

    def tag_table(b: pa.Table) -> pa.Table:
        k = b.column(table_key).to_numpy(zero_copy_only=False)
        cols = {"__key": b.column(table_key)}
        for c in payload_cols:
            cols[c] = pa.array(np.zeros(len(k), np.int64))
        cols["__val"] = b.column(table_val)
        cols["__kind"] = pa.array(np.zeros(len(k), np.int8))
        cols["__part"] = pa.array(hash_partition(k, num_partitions))
        return pa.table(cols)

    tagged = stream.map_batches(
        tag_stream, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        table.map_batches(
            tag_table, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def resolve(group: pa.Table) -> pa.Table:
        kind = group.column("__kind").to_numpy(zero_copy_only=False)
        key = group.column("__key").to_numpy(zero_copy_only=False)
        val = group.column("__val").to_numpy(zero_copy_only=False)
        is_tab = kind == 0
        tk, tv = key[is_tab], val[is_tab]
        o = np.argsort(tk, kind="stable")
        tk, tv = tk[o], tv[o]
        assert len(tk) == 0 or (np.diff(tk) > 0).all(), (
            "lookup_join: right side is not unique on its key — this "
            "helper is the PK-lookup shape only"
        )
        sk = key[~is_tab]
        found = sorted_isin(tk, sk)
        keep = ~is_tab
        keep[~is_tab] = found
        out = group.filter(pa.array(keep))
        cols = {key_col: out.column("__key")}
        for c in payload_cols:
            cols[c] = out.column(c)
        cols[out_val] = pa.array(tv[np.searchsorted(tk, sk[found])])
        return pa.table(cols)

    # __part is a precomputed uniform hash id, so the exchange runs on
    # the raw-task map-side shuffle (stages/rawshuffle.py) instead of
    # Ray Data's sort-based map_groups — no key sampling, no sort
    from .rawshuffle import part_map_groups

    def resolve_part(t: pa.Table | None) -> pa.Table:
        if t is None or t.num_rows == 0:
            cols = {key_col: pa.array([], pa.int64())}
            for c in payload_cols:
                cols[c] = pa.array([], pa.int64())
            cols[out_val] = pa.array([], pa.int64())
            return pa.table(cols)
        return resolve(t)

    return part_map_groups(tagged, "__part", resolve_part, num_partitions)
