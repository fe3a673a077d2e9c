"""Scale-safe dedup-arc finalizers.

The near-dup arc ends with "remove (or pick) the non-canonical members
of each cluster".  The (node, label) map from
:func:`graph.connected_components` is OUTPUT-sized — clustered nodes
only — but at 100 TB with a 20-30 % dup rate that is billions of
int64s: too big to driver-collect and ``ray.put`` as a broadcast
drop-set.  These helpers give the finalizing queries the same size
gate ``connected_components`` already uses for its union pass:

- at or below the gate (:data:`DRIVER_THRESHOLD` label rows, ~160 MB
  of int64 pairs) the label map is collected once and broadcast — one
  ``searchsorted`` probe per stream batch, zero extra exchanges (the
  fast path at sandbox scale);
- above it, the corpus stream and the label table CO-PARTITION on the
  key through the same tagged-union hash exchange the distributed CC
  loop uses (``util.hash_partition`` is the single shared partitioner),
  and every partition resolves its own anti-/semi-join — no
  driver-resident node->label table, nothing corpus-sized anywhere.

Both paths are exact; tests force the gate to 0 to run the distributed
path at sandbox scale and compare bit-for-bit (the same equivalence
pattern as ``tests/test_graph.py``).

Reference parity note: the reference deletes dup rows with a DELETE
... WHERE id IN (subquery) over Postgres (single-node SQL); the
semantics reproduced here are "corpus minus non-canonical members"
with the membership decided by the cluster keeper rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..util import hash_partition, sorted_isin

# label-map row gate between broadcast and hash-exchange finalizers;
# module attribute (not a default arg) so tests can monkeypatch it to 0
DRIVER_THRESHOLD = 10_000_000


def _tagged(ds, fn):
    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )


def anti_join_keys(
    stream: "ray.data.Dataset",
    key_col: str,
    payload_cols: tuple[str, ...],
    drop: "ray.data.Dataset",
    drop_col: str = "node",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Distributed anti-join: stream rows whose ``key_col`` is NOT in
    ``drop[drop_col]``; output columns ``[key_col, *payload_cols]``
    (payloads must be int64 — the drop side pads zeros to keep the
    tagged-union schema aligned).  One hash exchange; each partition
    sees the complete drop subset for its keys."""

    def tag_stream(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        cols = {"__key": b.column(key_col)}
        for c in payload_cols:
            cols[c] = b.column(c)
        cols["__kind"] = pa.array(np.zeros(len(k), np.int8))
        cols["__part"] = pa.array(hash_partition(k, num_partitions))
        return pa.table(cols)

    def tag_drop(b: pa.Table) -> pa.Table:
        k = b.column(drop_col).to_numpy(zero_copy_only=False)
        cols = {"__key": b.column(drop_col)}
        for c in payload_cols:
            cols[c] = pa.array(np.zeros(len(k), np.int64))
        cols["__kind"] = pa.array(np.ones(len(k), np.int8))
        cols["__part"] = pa.array(hash_partition(k, num_partitions))
        return pa.table(cols)

    tagged = _tagged(stream, tag_stream).union(_tagged(drop, tag_drop))

    def resolve(group: pa.Table) -> pa.Table:
        kind = group.column("__kind").to_numpy(zero_copy_only=False)
        key = group.column("__key").to_numpy(zero_copy_only=False)
        dset = np.sort(key[kind == 1])
        keep = (kind == 0) & ~sorted_isin(dset, key)
        out = group.filter(pa.array(keep)).drop_columns(["__kind"])
        return out.rename_columns([key_col, *payload_cols])

    from .rawshuffle import part_map_groups

    return part_map_groups(tagged, "__part", resolve, num_partitions)


def attach_labels(
    stream: "ray.data.Dataset",
    key_col: str,
    cc: "ray.data.Dataset",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Distributed semi-join ATTACH: (key, label) for every stream key
    present in the (node, label) map — the hash-exchange replacement
    for broadcasting the node->label table.  One exchange; keys absent
    from the map are dropped (non-clustered corpus rows)."""

    def tag_stream(b: pa.Table) -> pa.Table:
        k = b.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__key": b.column(key_col),
                "__lab": pa.array(np.zeros(len(k), np.int64)),
                "__kind": pa.array(np.ones(len(k), np.int8)),
                "__part": pa.array(hash_partition(k, num_partitions)),
            }
        )

    def tag_map(b: pa.Table) -> pa.Table:
        n = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "__key": b.column("node"),
                "__lab": b.column("label"),
                "__kind": pa.array(np.zeros(len(n), np.int8)),
                "__part": pa.array(hash_partition(n, num_partitions)),
            }
        )

    tagged = _tagged(stream, tag_stream).union(_tagged(cc, tag_map))

    def resolve(group: pa.Table) -> pa.Table:
        kind = group.column("__kind").to_numpy(zero_copy_only=False)
        key = group.column("__key").to_numpy(zero_copy_only=False)
        lab = group.column("__lab").to_numpy(zero_copy_only=False)
        is_map = kind == 0
        mn, ml = key[is_map], lab[is_map]
        o = np.argsort(mn, kind="stable")
        mn, ml = mn[o], ml[o]
        sk = key[~is_map]
        found = sorted_isin(mn, sk)
        sk = sk[found]
        return pa.table(
            {
                "key": pa.array(sk),
                "label": pa.array(ml[np.searchsorted(mn, sk)]),
            }
        )

    from .rawshuffle import part_map_groups

    return part_map_groups(tagged, "__part", resolve, num_partitions)


def drop_non_min_members(cc: "ray.data.Dataset") -> "ray.data.Dataset":
    """Drop set under the keeper-rule "canonical = min id = the label":
    every node != label.  Map-only — no exchange needed."""
    return _tagged(
        cc,
        lambda b: b.filter(
            pc.not_equal(b.column("node"), b.column("label"))
        ).select(["node"]),
    )


def drop_non_best_members(
    cc: "ray.data.Dataset", num_partitions: int = 64
) -> "ray.data.Dataset":
    """Drop set under the keeper-rule "max clear_confidence, tie min
    key": one hash exchange on the LABEL (each partition holds complete
    clusters), per-group lexsort picks the keeper, non-keepers emit."""
    from .. import corpus as corpus_mod
    from .. import spec

    def tag(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False)
        return b.append_column(
            "__part", pa.array(hash_partition(lab, num_partitions))
        )

    def pick(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        label = group.column("label").to_numpy(zero_copy_only=False)
        clear = corpus_mod._mix(node % np.int64(spec.MOD), spec.ST_CLEAR) % 101
        order = np.lexsort((node, -clear, label))
        ls = label[order]
        first = np.ones(len(ls), dtype=bool)
        if len(ls):
            first[1:] = ls[1:] != ls[:-1]
        keep = np.zeros(len(node), dtype=bool)
        keep[order[first]] = True
        return pa.table({"node": pa.array(node[~keep])})

    from .rawshuffle import part_map_groups

    return part_map_groups(_tagged(cc, tag), "__part", pick, num_partitions)
