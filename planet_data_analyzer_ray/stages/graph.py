"""Distributed connected components over a pair/edge Dataset — the
iterative endgame of near-duplicate detection: pair lists (phash /
minhash / embedding near-dups) become clusters, each labeled by its
minimum member id, so a canonical representative per duplicate group
can be chosen.

Algorithm: synchronous min-label propagation.  Each round is two hash
exchanges over (node, label) / (src, dst) integer rows:

  1. labels co-partitioned with edges on ``src`` -> per partition,
     every edge emits its source's current label to ``dst``;
  2. candidate messages co-partitioned with labels on the node ->
     per partition, ``new_label = min(old_label, min(messages))``;
     per-partition changed counts roll up into a driver scalar.

Rounds repeat until no label changes: that takes at most the graph
diameter.  Near-dup graphs are unions of small-diameter clusters
(cliques + short chains), so rounds stay small; for adversarially long
chains at planetary scale the production upgrade is star contraction
(large-star/small-star, Kiveris et al.), which this module's API
deliberately matches (edges in, (node, label) out).

State is bounded by the NEAR-DUP GRAPH (nodes that appear in a pair),
never the corpus: edges/labels are Datasets end to end, exchanged by
hash partition; the only driver-resident value per round is the changed
counter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..util import hash_partition as _part_of


def _edges_both_dirs(pairs: pa.Table, col_a: str, col_b: str) -> pa.Table:
    a = pairs.column(col_a).to_numpy(zero_copy_only=False).astype(np.int64)
    b = pairs.column(col_b).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        }
    )


def _driver_components(edges: pa.Table) -> pa.Table:
    """Vectorized min-label + pointer-jumping union over a collected
    edge table — the small-graph fast path (converges in O(log diam)
    sweeps, each one numpy pass over the edge arrays)."""
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(label[si], label[di])
        new = label.copy()
        np.minimum.at(new, si, m)
        np.minimum.at(new, di, m)
        new = new[new]  # pointer jump
        if np.array_equal(new, label):
            break
        label = new
    # label is an index into the SORTED nodes array, so min index ==
    # min node id within the component
    return pa.table({"node": pa.array(nodes), "label": pa.array(nodes[label])})


def connected_components(
    pairs: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    num_partitions: int = 64,
    max_rounds: int = 64,
    driver_threshold: int = 10_000_000,
) -> "ray.data.Dataset":
    """(a, b) pair Dataset -> (node, cluster_id) Dataset, cluster_id =
    min node id of the component.

    Size-gated strategy (same pattern as the partitioned join's hot-cell
    detection): the edge list is OUTPUT-proportional (near-dup pairs),
    so below ``driver_threshold`` edges (default 10M ~ 320 MB of int64
    pairs — driver-trivial, and orders of magnitude below corpus scale)
    the collected table gets one vectorized union pass, which beats
    paying Ray's per-round exchange latency; above it, the distributed
    min-label loop runs (two-to-three hash exchanges per round, state
    never driver-resident).  Both paths are exact and
    equivalence-tested."""

    edges = pairs.map_batches(
        lambda t: _edges_both_dirs(t, col_a, col_b),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    ).materialize()  # bounded by the near-dup graph; reused every round

    if edges.count() <= driver_threshold:
        from ..util import collect_table

        tab = collect_table(
            edges,
            schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())]),
        )
        return ray.data.from_arrow(_driver_components(tab))

    def init_labels(batch: pa.Table) -> pa.Table:
        n = np.unique(batch.column("src").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    labels = edges.map_batches(
        init_labels, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    # distinct nodes (the per-batch unique above is only a combiner)
    labels = _min_by_node(labels, "node", "label", num_partitions).materialize()

    for _ in range(max_rounds):
        # --- half 1: edges x labels co-partitioned on src -> messages
        def tag_edges(b: pa.Table) -> pa.Table:
            src = b.column("src").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "key": b.column("src"),
                    "val": b.column("dst"),
                    "kind": pa.array(np.ones(len(src), np.int8)),
                    "__part": pa.array(_part_of(src, num_partitions)),
                }
            )

        def tag_labels(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "key": b.column("node"),
                    "val": b.column("label"),
                    "kind": pa.array(np.zeros(len(node), np.int8)),
                    "__part": pa.array(_part_of(node, num_partitions)),
                }
            )

        tagged = edges.map_batches(
            tag_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).union(
            labels.map_batches(
                tag_labels, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        )

        def emit_msgs(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            key = group.column("key").to_numpy(zero_copy_only=False)
            val = group.column("val").to_numpy(zero_copy_only=False)
            is_lbl = kind == 0
            ln, lv = key[is_lbl], val[is_lbl]  # node -> label (unique nodes)
            order = np.argsort(ln, kind="stable")
            ln, lv = ln[order], lv[order]
            es, ed = key[~is_lbl], val[~is_lbl]
            idx = np.searchsorted(ln, es)
            # every edge src IS a node, so idx is always in range
            return pa.table({"node": pa.array(ed), "cand": pa.array(lv[idx])})

        from .rawshuffle import part_map_groups

        msgs = part_map_groups(tagged, "__part", emit_msgs, num_partitions)

        # --- half 2: messages x labels co-partitioned on node -> min
        def tag_msgs(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": b.column("node"),
                    "label": b.column("cand"),
                    "is_old": pa.array(np.zeros(len(node), np.int8)),
                    "__part": pa.array(_part_of(node, num_partitions)),
                }
            )

        def tag_old(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": b.column("node"),
                    "label": b.column("label"),
                    "is_old": pa.array(np.ones(len(node), np.int8)),
                    "__part": pa.array(_part_of(node, num_partitions)),
                }
            )

        merged = msgs.map_batches(
            tag_msgs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).union(
            labels.map_batches(
                tag_old, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        )

        def reduce_min(group: pa.Table) -> pa.Table:
            node = group.column("node").to_numpy(zero_copy_only=False)
            lab = group.column("label").to_numpy(zero_copy_only=False)
            old = group.column("is_old").to_numpy(zero_copy_only=False)
            order = np.argsort(node, kind="stable")
            ns, ls, os_ = node[order], lab[order], old[order]
            uniq, start = np.unique(ns, return_index=True)
            newl = np.minimum.reduceat(ls, start)
            # old label per node: every node has exactly one is_old row
            oldl = np.where(os_ == 1, ls, np.iinfo(np.int64).max)
            oldl = np.minimum.reduceat(oldl, start)
            changed = int((newl < oldl).sum())
            return pa.table(
                {
                    "node": pa.array(uniq),
                    "label": pa.array(newl),
                    "changed": pa.array(
                        np.full(len(uniq), 0, np.int64)
                        if changed == 0
                        else np.concatenate(
                            [[changed], np.zeros(len(uniq) - 1, np.int64)]
                        )
                    ),
                }
            )

        new_labels = part_map_groups(
            merged, "__part", reduce_min, num_partitions
        ).materialize()
        n_changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"])
        if not n_changed:
            labels = labels.materialize()
            break
        # pointer jump (label <- label[label]) compresses chains so the
        # loop converges in O(log diameter) rounds instead of diameter.
        # At the message fixpoint the jump is the identity, so it is
        # skipped on the converged round (saves a full exchange).
        labels = _pointer_jump(labels, num_partitions).materialize()
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds the cap — switch to star contraction)"
        )
    return labels


def _pointer_jump(
    labels: "ray.data.Dataset", num_partitions: int
) -> "ray.data.Dataset":
    """One label <- label[label] pass: rows (node, l) co-partitioned
    with the label table on l, resolved per partition.  Every label
    value IS a node (labels are node ids), so the lookup always hits."""

    def tag_query(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b.column("label"),
                "carry": b.column("node"),
                "kind": pa.array(np.ones(len(lab), np.int8)),
                "__part": pa.array(_part_of(lab, num_partitions)),
            }
        )

    def tag_table(b: pa.Table) -> pa.Table:
        node = b.column("node").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b.column("node"),
                "carry": b.column("label"),
                "kind": pa.array(np.zeros(len(node), np.int8)),
                "__part": pa.array(_part_of(node, num_partitions)),
            }
        )

    tagged = labels.map_batches(
        tag_query, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).union(
        labels.map_batches(
            tag_table, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
    )

    def resolve(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        carry = group.column("carry").to_numpy(zero_copy_only=False)
        is_tab = kind == 0
        tn, tl = key[is_tab], carry[is_tab]
        order = np.argsort(tn, kind="stable")
        tn, tl = tn[order], tl[order]
        qk, qnode = key[~is_tab], carry[~is_tab]
        idx = np.searchsorted(tn, qk)
        return pa.table({"node": pa.array(qnode), "label": pa.array(tl[idx])})

    from .rawshuffle import part_map_groups

    return part_map_groups(tagged, "__part", resolve, num_partitions)


def _min_by_node(
    ds: "ray.data.Dataset", key: str, val: str, num_partitions: int
) -> "ray.data.Dataset":
    def part(b: pa.Table) -> pa.Table:
        k = b.column(key).to_numpy(zero_copy_only=False)
        return b.append_column("__part", pa.array(_part_of(k, num_partitions)))

    def final(group: pa.Table) -> pa.Table:
        k = group.column(key).to_numpy(zero_copy_only=False)
        v = group.column(val).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        uniq, start = np.unique(ks, return_index=True)
        return pa.table(
            {key: pa.array(uniq), val: pa.array(np.minimum.reduceat(vs, start))}
        )

    from .rawshuffle import part_map_groups

    return part_map_groups(
        ds.map_batches(
            part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "__part",
        final,
        num_partitions,
    )


# --- k-core (fixed-k degree peeling) -----------------------------------------


def _driver_kcore(edges: pa.Table, k: int, rounds: int) -> pa.Table:
    """Vectorized peel over a collected both-direction edge table: each
    sweep simultaneously drops every node whose CURRENT degree is < k,
    then removes edges touching a dropped node.  Peeling is monotone
    (a fixpoint stays a fixpoint), so the early exit is identical to
    running all ``rounds`` sweeps — which is what the SQL oracle's
    fixed CTE chain does."""
    src = edges.column("src").to_numpy(zero_copy_only=False)
    dst = edges.column("dst").to_numpy(zero_copy_only=False)
    for _ in range(rounds):
        if len(src) == 0:
            break
        nodes, inv = np.unique(src, return_inverse=True)
        deg = np.bincount(inv, minlength=len(nodes))
        keep = deg >= k
        if keep.all():
            break
        # both directions are present, so every dst IS a src: the
        # searchsorted lookup always hits, and symmetric filtering
        # keeps the edge set symmetric
        m = keep[inv] & keep[np.searchsorted(nodes, dst)]
        src, dst = src[m], dst[m]
    if len(src) == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "core_deg": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(src, return_inverse=True)
    deg = np.bincount(inv, minlength=len(nodes)).astype(np.int64)
    return pa.table({"node": pa.array(nodes), "core_deg": pa.array(deg)})


def kcore(
    pairs: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    k: int,
    rounds: int,
    num_partitions: int = 64,
    driver_threshold: int = 10_000_000,
) -> "ray.data.Dataset":
    """(a, b) pair Dataset -> (node, core_deg) rows of the k-core: the
    maximal subgraph where every node keeps degree >= k, reached by at
    most ``rounds`` simultaneous peel sweeps (the sweep cap is part of
    the operator definition, so engine and oracle agree bit-exactly
    even on an adversarial chain that hasn't converged by the cap).

    Size-gated like :func:`connected_components`: below
    ``driver_threshold`` edges the collected table gets the vectorized
    driver peel; above it, each sweep is two hash exchanges — (1) edges
    co-partitioned on src compute COMPLETE per-node degrees (all rows
    of a src live in one partition), drop src-side and emit one drop
    record per dropped node; (2) surviving edges re-partitioned on dst
    meet the drop records co-partitioned on node and lose edges into
    dropped nodes.  State is always the current edge Dataset — never
    driver-resident."""
    edges = pairs.map_batches(
        lambda t: _edges_both_dirs(t, col_a, col_b),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    ).materialize()

    if edges.count() <= driver_threshold:
        from ..util import collect_table

        tab = collect_table(
            edges, schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        )
        return ray.data.from_arrow(_driver_kcore(tab, k, rounds))

    def tag_src(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        return b.append_column("__part", pa.array(_part_of(src, num_partitions)))

    def peel_src(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(src, return_inverse=True)
        deg = np.bincount(inv, minlength=len(nodes))
        keep = deg >= k
        kept = keep[inv]
        dropped = nodes[~keep]
        out_src = np.concatenate([src[kept], dropped])
        out_dst = np.concatenate([dst[kept], np.zeros(len(dropped), np.int64)])
        kind = np.concatenate(
            [np.ones(int(kept.sum()), np.int8), np.zeros(len(dropped), np.int8)]
        )
        # pass-2 partition key: dst for edge rows, the node id itself
        # for drop rows (so drops land with the edges pointing AT them)
        p2 = np.concatenate(
            [_part_of(dst[kept], num_partitions), _part_of(dropped, num_partitions)]
        )
        return pa.table(
            {
                "src": pa.array(out_src),
                "dst": pa.array(out_dst),
                "kind": pa.array(kind),
                "__part": pa.array(p2),
            }
        )

    def apply_drops(group: pa.Table) -> pa.Table:
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        is_edge = kind == 1
        drop_nodes = np.sort(src[~is_edge])
        es, ed = src[is_edge], dst[is_edge]
        if len(drop_nodes):
            idx = np.clip(np.searchsorted(drop_nodes, ed), 0, len(drop_nodes) - 1)
            bad = drop_nodes[idx] == ed
            es, ed = es[~bad], ed[~bad]
        return pa.table({"src": pa.array(es), "dst": pa.array(ed)})

    for _ in range(rounds):
        from .rawshuffle import part_map_groups

        pass1 = part_map_groups(
            edges.map_batches(
                tag_src, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            ),
            "__part",
            peel_src,
            num_partitions,
        ).materialize()
        n_drop = pass1.map_batches(
            lambda b: pa.table(
                {
                    "c": pa.array(
                        [int((b.column("kind").to_numpy(zero_copy_only=False) == 0).sum())],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        ).sum("c")
        if not n_drop:
            break
        edges = part_map_groups(
            pass1, "__part", apply_drops, num_partitions
        ).materialize()

    def deg_part(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {
                "node": pa.array(u),
                "core_deg": pa.array(c.astype(np.int64)),
                "__part": pa.array(_part_of(u, num_partitions)),
            }
        )

    def deg_reduce(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        dg = group.column("core_deg").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        ns, ds_ = node[order], dg[order]
        uniq, start = np.unique(ns, return_index=True)
        return pa.table(
            {"node": pa.array(uniq), "core_deg": pa.array(np.add.reduceat(ds_, start))}
        )

    from .rawshuffle import part_map_groups

    return part_map_groups(
        edges.map_batches(
            deg_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "__part",
        deg_reduce,
        num_partitions,
    )


# --- PageRank (integer lattice) ---------------------------------------------


def _driver_pagerank(edges: pa.Table, iters: int, scale: int) -> pa.Table:
    """Vectorized driver pass for output-sized graphs (same gate
    rationale as :func:`connected_components`)."""
    s = edges.column("src").to_numpy(zero_copy_only=False)
    d = edges.column("dst").to_numpy(zero_copy_only=False)
    nodes = np.unique(s)
    n = len(nodes)
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    base = np.int64((15 * scale) // (100 * n))
    r = np.full(n, scale // n, dtype=np.int64)
    for _ in range(iters):
        contrib = (r[si] * np.int64(85)) // (np.int64(100) * deg[si])
        acc = np.zeros(n, dtype=np.int64)
        np.add.at(acc, di, contrib)
        r = base + acc
    return pa.table({"node": pa.array(nodes), "rank_scaled": pa.array(r)})


def pagerank(
    pairs: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    iters: int,
    scale: int,
    num_partitions: int = 64,
    driver_threshold: int = 10_000_000,
) -> "ray.data.Dataset":
    """(a, b) pair Dataset -> (node, rank_scaled) Dataset — integer-
    lattice PageRank (r' = (15*S)//(100*N) + sum (r*85)//(100*deg)).

    Size-gated exactly like :func:`connected_components`: below
    ``driver_threshold`` edges the collected table gets the vectorized
    driver pass; above it, each iteration is two hash exchanges (edges
    x state co-partitioned on src -> contribution messages; messages x
    state co-partitioned on node -> summed new ranks), state never
    driver-resident.  Both paths are bit-identical (equivalence-tested):
    the contribution floor-division happens per SOURCE node before any
    exchange, and integer sums are order-free."""
    edges = pairs.map_batches(
        lambda t: _edges_both_dirs(t, col_a, col_b),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    ).materialize()

    n_edges = edges.count()
    if n_edges == 0:  # empty graph: empty ranks, like connected_components
        return ray.data.from_arrow(
            pa.schema([("node", pa.int64()), ("rank_scaled", pa.int64())]).empty_table()
        )
    if n_edges <= driver_threshold:
        from ..util import collect_table

        tab = collect_table(
            edges, schema=pa.schema([("src", pa.int64()), ("dst", pa.int64())])
        )
        return ray.data.from_arrow(_driver_pagerank(tab, iters, scale))

    # --- distributed path ---------------------------------------------------
    def deg_part(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        u, c = np.unique(src, return_counts=True)
        return pa.table(
            {
                "node": pa.array(u),
                "deg": pa.array(c.astype(np.int64)),
                "__part": pa.array(_part_of(u, num_partitions)),
            }
        )

    def deg_reduce(group: pa.Table) -> pa.Table:
        node = group.column("node").to_numpy(zero_copy_only=False)
        dg = group.column("deg").to_numpy(zero_copy_only=False)
        order = np.argsort(node, kind="stable")
        ns, ds_ = node[order], dg[order]
        uniq, start = np.unique(ns, return_index=True)
        return pa.table(
            {"node": pa.array(uniq), "deg": pa.array(np.add.reduceat(ds_, start))}
        )

    from .rawshuffle import part_map_groups

    state = part_map_groups(
        edges.map_batches(
            deg_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "__part",
        deg_reduce,
        num_partitions,
    ).materialize()
    n = state.count()  # driver scalar only
    base = (15 * scale) // (100 * n)
    r0 = scale // n
    state = state.map_batches(
        lambda b: b.append_column("r", pa.array(np.full(b.num_rows, r0, np.int64))),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    ).materialize()

    def tag_edges(b: pa.Table) -> pa.Table:
        src = b.column("src").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b.column("src"),
                "val": b.column("dst"),
                "kind": pa.array(np.ones(len(src), np.int8)),
                "__part": pa.array(_part_of(src, num_partitions)),
            }
        )

    # iteration-invariant: tag + partition the edge side ONCE
    tagged_edges = edges.map_batches(
        tag_edges, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    ).materialize()

    for _ in range(iters):
        def tag_state(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            r = b.column("r").to_numpy(zero_copy_only=False)
            dg = b.column("deg").to_numpy(zero_copy_only=False)
            contrib = (r * np.int64(85)) // (np.int64(100) * dg)
            return pa.table(
                {
                    "key": b.column("node"),
                    "val": pa.array(contrib),
                    "kind": pa.array(np.zeros(len(node), np.int8)),
                    "__part": pa.array(_part_of(node, num_partitions)),
                }
            )

        tagged = tagged_edges.union(
            state.map_batches(
                tag_state, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        )

        def emit_contrib(group: pa.Table) -> pa.Table:
            kind = group.column("kind").to_numpy(zero_copy_only=False)
            key = group.column("key").to_numpy(zero_copy_only=False)
            val = group.column("val").to_numpy(zero_copy_only=False)
            is_state = kind == 0
            sn, sc = key[is_state], val[is_state]
            order = np.argsort(sn, kind="stable")
            sn, sc = sn[order], sc[order]
            es, ed = key[~is_state], val[~is_state]
            idx = np.searchsorted(sn, es)  # every edge src IS a node
            return pa.table({"node": pa.array(ed), "c": pa.array(sc[idx])})

        from .rawshuffle import part_map_groups

        msgs = part_map_groups(tagged, "__part", emit_contrib, num_partitions)

        # zero-fill alignment of c/deg disambiguates the two row kinds
        # under the sum — no discriminator column needed.
        def tag_msgs(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": b.column("node"),
                    "c": b.column("c"),
                    "deg": pa.array(np.zeros(len(node), np.int64)),
                    "__part": pa.array(_part_of(node, num_partitions)),
                }
            )

        def tag_deg(b: pa.Table) -> pa.Table:
            node = b.column("node").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": b.column("node"),
                    "c": pa.array(np.zeros(len(node), np.int64)),
                    "deg": b.column("deg"),
                    "__part": pa.array(_part_of(node, num_partitions)),
                }
            )

        merged = msgs.map_batches(
            tag_msgs, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ).union(
            state.map_batches(
                tag_deg, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
            )
        )

        def reduce_rank(group: pa.Table) -> pa.Table:
            node = group.column("node").to_numpy(zero_copy_only=False)
            c = group.column("c").to_numpy(zero_copy_only=False)
            dg = group.column("deg").to_numpy(zero_copy_only=False)
            order = np.argsort(node, kind="stable")
            ns, cs, ds_ = node[order], c[order], dg[order]
            uniq, start = np.unique(ns, return_index=True)
            return pa.table(
                {
                    "node": pa.array(uniq),
                    "deg": pa.array(np.add.reduceat(ds_, start)),
                    "r": pa.array(base + np.add.reduceat(cs, start)),
                }
            )

        state = part_map_groups(
            merged, "__part", reduce_rank, num_partitions
        ).materialize()

    return state.map_batches(
        lambda b: pa.table(
            {"node": b.column("node"), "rank_scaled": b.column("r")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None,
    )
