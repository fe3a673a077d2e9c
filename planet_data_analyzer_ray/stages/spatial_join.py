"""Cell-partitioned + broadcast spatial joins (the flagship operator).

Reproduces the reference's polygon×polygon ``ST_Intersects`` joins
(image ⋈ land-cover /root/reference/database/db.py:116-122 +
app/query.py:57-58,126-134; image ⋈ country db.py:219-224) as two Ray
Data strategies:

1. **Broadcast** (`broadcast_spatial_join`): the polygon layer is small
   (reference: ~2.4k land-cover rows, 241 countries) → ship it once via
   ``ray.put``, build an STRtree + prepared geometry arrays once per
   actor (`__init__`, SURVEY.md §2.4 T4), stream image batches through
   `map_batches` with vectorized candidate lookup + exact refinement.
   No shuffle at all.

2. **Cell-partitioned** (`partitioned_spatial_join`): the scale path
   when neither side fits in one heap.  Both sides explode to covering
   cells (res-5 analog, 4°), hash-shuffle on the cell key
   (`groupby(cell)`), and each cell group joins locally.  A pair whose
   boxes share several cells is reported only in the *canonical* cell —
   the cell containing the top-left corner of the bbox intersection —
   so no second distinct shuffle is needed.  Hot cells (dense AOIs) are
   salted: probe-side rows split round-robin into ``cell×salt`` sub-keys
   with the build side replicated per salt (north rule skew handling).

Both return identical (image_id, lc_id) pairs; tests assert equality
against each other and a brute-force oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geo import cells as cellmod
from ..geo import wkb
from ..geo.strtree import STRtree


def _ring_is_rect(r: np.ndarray) -> bool:
    if len(r) != 5 or not (r[0] == r[4]).all():
        return False
    xs, ys = set(r[:4, 0].tolist()), set(r[:4, 1].tolist())
    if len(xs) != 2 or len(ys) != 2:
        return False
    # every corner combination present exactly once
    corners = {(x, y) for x, y in zip(r[:4, 0].tolist(), r[:4, 1].tolist())}
    return corners == {(x, y) for x in xs for y in ys}


class _Layer:
    """Prepared broadcast polygon layer: bbox arrays + STRtree + decoded
    part rings for exact (non-box) refinement.  A layer geometry may be
    a POLYGON (one part) or a MULTIPOLYGON (several parts — the
    reference's Natural Earth countries, db.py:208-224); refinement
    folds parts with OR."""

    def __init__(self, table: pa.Table, id_col: str, extra_cols: tuple[str, ...] = ()):
        self.ids = table.column(id_col).to_numpy(zero_copy_only=False)
        self.id_col = id_col
        self.extras = {c: table.column(c).to_numpy(zero_copy_only=False) for c in extra_cols}
        if "geom_wkb" in table.column_names:
            wkbs = table.column("geom_wkb").to_pylist()
            x0, y0, x1, y1 = wkb.decode_boxes(wkbs)
            self.parts = [wkb.decode_rings(w) for w in wkbs]
            # a geometry is a "box" only if it is one closed 5-point
            # AXIS-ALIGNED rectangle part (a rotated quad or a
            # multi-part must go through exact polygon refinement)
            self.is_boxes = all(
                len(ps) == 1 and _ring_is_rect(ps[0]) for ps in self.parts
            )
            if self.is_boxes:
                self.parts = None  # dead for the bbox fast path
        else:
            x0 = table.column("x0").to_numpy(zero_copy_only=False)
            y0 = table.column("y0").to_numpy(zero_copy_only=False)
            x1 = table.column("x1").to_numpy(zero_copy_only=False)
            y1 = table.column("y1").to_numpy(zero_copy_only=False)
            self.parts = None
            self.is_boxes = True
        # homogeneous single-part rings stack: enables the pair-batched
        # refinement kernel (no per-polygon grouping loop); multi-part
        # layers with homogeneous (part count, ring length) stack as
        # (n, P, L, 2) and refine with an OR over the P part slots
        self.rings_stack = _stack_single_part(self.parts)
        self.parts_stack = _stack_parts(self.parts)
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.tree = STRtree(x0, y0, x1, y1)


def _stack_single_part(parts) -> np.ndarray | None:
    """(n, L, 2) stack when every geometry is single-part with the same
    closed ring length; None otherwise."""
    if parts is None or not len(parts):
        return None
    if not all(ps is not None and len(ps) == 1 for ps in parts):
        return None
    if len({len(ps[0]) for ps in parts}) != 1:
        return None
    return np.stack([ps[0] for ps in parts])


def _stack_parts(parts) -> np.ndarray | None:
    """(n, P, L, 2) stack for homogeneous MULTI-part layers (every
    geometry has the same part count P > 1 and ring length L); None
    otherwise."""
    if parts is None or not len(parts):
        return None
    if any(ps is None for ps in parts):
        return None
    pcounts = {len(ps) for ps in parts}
    if len(pcounts) != 1 or pcounts == {1}:
        return None
    if len({len(r) for ps in parts for r in ps}) != 1:
        return None
    return np.stack([np.stack(ps) for ps in parts])


def _refine_pairs(
    ix0: np.ndarray,
    iy0: np.ndarray,
    ix1: np.ndarray,
    iy1: np.ndarray,
    qi: np.ndarray,
    ti: np.ndarray,
    parts: list,
    rings_stack: np.ndarray | None = None,
    parts_stack: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact refinement of bbox candidate pairs against non-rect layer
    geometries (``parts[t]`` = list of exterior rings; a multi-part
    geometry intersects iff ANY part does).  With a homogeneous
    single-part ``rings_stack`` (or multi-part ``parts_stack``) the
    WHOLE candidate list runs through pair-batched kernels; otherwise
    candidates are grouped by target geometry and each part runs one
    vectorized box-vs-ring kernel (no per-pair Python either way)."""
    from ..geo import kernels

    if rings_stack is not None:
        keep = kernels.box_rings_intersect_pairs(
            ix0[qi], iy0[qi], ix1[qi], iy1[qi], rings_stack[ti]
        )
        return qi[keep], ti[keep]
    if parts_stack is not None:
        keep = np.zeros(len(qi), dtype=bool)
        for p in range(parts_stack.shape[1]):
            rem = np.nonzero(~keep)[0]
            if not len(rem):
                break
            keep[rem] = kernels.box_rings_intersect_pairs(
                ix0[qi[rem]],
                iy0[qi[rem]],
                ix1[qi[rem]],
                iy1[qi[rem]],
                parts_stack[ti[rem], p],
            )
        return qi[keep], ti[keep]
    order = np.argsort(ti, kind="stable")
    qs, ts = qi[order], ti[order]
    seg = np.ones(len(ts), dtype=bool)
    seg[1:] = ts[1:] != ts[:-1]
    starts = np.nonzero(seg)[0]
    bounds = np.append(starts, len(ts))
    keep = np.zeros(len(ts), dtype=bool)
    for i in range(len(starts)):
        s, e = bounds[i], bounds[i + 1]
        ps = parts[int(ts[s])]
        if ps is None or (len(ps) == 1 and _ring_is_rect(ps[0])):
            keep[s:e] = True  # bbox test was already exact
            continue
        q = qs[s:e]
        acc = np.zeros(e - s, dtype=bool)
        for ring in ps:
            rem = np.nonzero(~acc)[0]
            if not len(rem):
                break
            acc[rem] = kernels.box_ring_intersect(
                ix0[q[rem]], iy0[q[rem]], ix1[q[rem]], iy1[q[rem]], ring
            )
        keep[s:e] = acc
    return qs[keep], ts[keep]


class _TargetView:
    """The subset of :class:`_Layer` the probe-side refinement needs,
    built from a cell group's build side (bbox arrays live on its
    STRtree)."""

    def __init__(self, tree: STRtree, parts, rings_stack, parts_stack=None):
        self.x0, self.y0, self.x1, self.y1 = tree.x0, tree.y0, tree.x1, tree.y1
        self.parts = parts
        self.rings_stack = rings_stack
        self.parts_stack = parts_stack
        # the decoded-stack paths leave ``parts`` None for homogeneous
        # non-rect builds, so boxes-ness needs all three to be absent
        self.is_boxes = parts is None and rings_stack is None and parts_stack is None


def _probe_rings_of(batch: pa.Table):
    """Decode probe-side footprint geometries when the batch carries
    them.  Returns (rings list | None, stack | None); (None, None)
    means every probe is its bbox (rect fast path) and needs no
    refinement.  A homogeneous column (the uniform-quad corpus case)
    decodes through one vectorized buffer view — the probe side is
    corpus-sized, so it must never pay a Python-per-row decode."""
    if "geom_wkb" not in batch.column_names:
        return None, None
    col = batch.column("geom_wkb")
    stack = wkb.decode_rings_stack(col)
    if stack is not None:
        if _stack_is_rects(stack):
            return None, None
        return None, stack
    blobs = col.to_pylist()
    if all(w is None for w in blobs):
        return None, None
    rings = [wkb.decode_rings(w)[0] if w is not None else None for w in blobs]
    if all(r is None or _ring_is_rect(r) for r in rings):
        return None, None
    stack = None
    if all(r is not None for r in rings) and len({len(r) for r in rings}) == 1:
        stack = np.stack(rings)
    return rings, stack


def _stack_is_rects(stack: np.ndarray) -> bool:
    """Vectorized every-ring-is-an-axis-aligned-rect test for a ring
    stack — exactly :func:`_ring_is_rect` per row: closed 5-point ring,
    2 distinct x values, 2 distinct y values, all 4 corner combinations
    present exactly once."""
    if stack.shape[1] != 5:
        return False
    if not (stack[:, 0] == stack[:, 4]).all():
        return False
    xs, ys = stack[:, :4, 0], stack[:, :4, 1]
    x0, x1 = xs.min(axis=1, keepdims=True), xs.max(axis=1, keepdims=True)
    y0, y1 = ys.min(axis=1, keepdims=True), ys.max(axis=1, keepdims=True)
    if ((x0 == x1) | (y0 == y1)).any():
        return False  # _ring_is_rect needs 2 DISTINCT values per axis
    if not (((xs == x0) | (xs == x1)) & ((ys == y0) | (ys == y1))).all():
        return False
    codes = 2 * (xs == x1).astype(np.int64) + (ys == y1)
    return bool(((np.int64(1) << codes).sum(axis=1) == 15).all())


def _refine_probe_pairs(
    qi: np.ndarray,
    ti: np.ndarray,
    probe_rings: list,
    probe_stack: np.ndarray | None,
    L: _Layer,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact refinement for POLYGON probe sides (rotated / non-rect
    image footprints — the reference joins arbitrary footprint polygons,
    db.py:107-122): probe ring x target geometry, pair-batched when the
    probe rings stack homogeneously, scalar fallback otherwise."""
    from ..geo import kernels

    if not len(qi):
        return qi, ti
    if probe_stack is not None and L.is_boxes:
        keep = kernels.box_rings_intersect_pairs(
            L.x0[ti], L.y0[ti], L.x1[ti], L.y1[ti], probe_stack[qi]
        )
        return qi[keep], ti[keep]
    if probe_stack is not None and L.rings_stack is not None:
        keep = kernels.polys_intersect_pairs(
            probe_stack[qi], L.rings_stack[ti]
        )
        return qi[keep], ti[keep]
    if probe_stack is not None and getattr(L, "parts_stack", None) is not None:
        keep = np.zeros(len(qi), dtype=bool)
        for p in range(L.parts_stack.shape[1]):
            rem = np.nonzero(~keep)[0]
            if not len(rem):
                break
            keep[rem] = kernels.polys_intersect_pairs(
                probe_stack[qi[rem]], L.parts_stack[ti[rem], p]
            )
        return qi[keep], ti[keep]
    # heterogeneous geometries: scalar per-pair fallback (bounded by the
    # bbox-candidate count; the corpus layers all take a stacked path)
    keep = np.zeros(len(qi), dtype=bool)
    for k in range(len(qi)):
        pring = (
            probe_rings[int(qi[k])]
            if probe_rings is not None
            else probe_stack[int(qi[k])]
        )
        if pring is None:
            # rect probe: the bbox-level tests already decided exactly
            keep[k] = True
            continue
        t = int(ti[k])
        if L.parts is not None:
            keep[k] = any(
                kernels.polygons_intersect(pring, part) for part in L.parts[t]
            )
        elif L.rings_stack is not None:
            keep[k] = kernels.polygons_intersect(pring, L.rings_stack[t])
        elif getattr(L, "parts_stack", None) is not None:
            keep[k] = any(
                kernels.polygons_intersect(pring, part)
                for part in L.parts_stack[t]
            )
        else:
            box = np.array(
                [
                    [L.x0[t], L.y0[t]],
                    [L.x1[t], L.y0[t]],
                    [L.x1[t], L.y1[t]],
                    [L.x0[t], L.y1[t]],
                    [L.x0[t], L.y0[t]],
                ]
            )
            keep[k] = kernels.polygons_intersect(pring, box)
    return qi[keep], ti[keep]


def _join_batch(
    batch: pa.Table,
    L: _Layer,
    img_cols: tuple[str, ...] = (),
    emit_image_id: bool = True,
) -> pa.Table:
        ix0 = batch.column("x0").to_numpy(zero_copy_only=False)
        iy0 = batch.column("y0").to_numpy(zero_copy_only=False)
        ix1 = batch.column("x1").to_numpy(zero_copy_only=False)
        iy1 = batch.column("y1").to_numpy(zero_copy_only=False)
        qi, ti = L.tree.query_batch(ix0, iy0, ix1, iy1)
        if not L.is_boxes and len(qi):
            qi, ti = _refine_pairs(
                ix0, iy0, ix1, iy1, qi, ti, L.parts, L.rings_stack, L.parts_stack
            )
        probe_rings, probe_stack = _probe_rings_of(batch)
        if probe_rings is not None or probe_stack is not None:
            qi, ti = _refine_probe_pairs(qi, ti, probe_rings, probe_stack, L)
        cols = {}
        if emit_image_id:
            ids = batch.column("image_id").to_numpy(zero_copy_only=False)
            cols["image_id"] = pa.array(ids[qi], type=pa.string())
        cols[L.id_col] = pa.array(L.ids[ti])
        for c, arr in L.extras.items():
            cols[c] = pa.array(arr[ti])
        for c in img_cols:
            cols[c] = batch.column(c).take(pa.array(qi))
        return pa.table(cols)


class BroadcastSpatialJoin:
    """Actor-pool form of the broadcast join: the layer ref is a
    ``ray.put`` handle resolved once in ``__init__`` (per actor), not
    per batch.  Used via ``use_actors=True`` for long-running jobs."""

    def __init__(
        self,
        layer_ref,
        id_col: str,
        extra_cols: tuple[str, ...] = (),
        img_cols: tuple[str, ...] = (),
        emit_image_id: bool = True,
    ):
        table = layer_ref if isinstance(layer_ref, pa.Table) else ray.get(layer_ref)
        self.layer = _Layer(table, id_col, extra_cols)
        self.img_cols = img_cols
        self.emit_image_id = emit_image_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _join_batch(batch, self.layer, self.img_cols, self.emit_image_id)


def broadcast_spatial_join(
    images: "ray.data.Dataset",
    layer: pa.Table,
    id_col: str,
    extra_cols: tuple[str, ...] = (),
    use_actors: bool = False,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    img_cols: tuple[str, ...] = (),
    emit_image_id: bool = True,
) -> "ray.data.Dataset":
    """Default path is a task pool with a per-worker-process STRtree
    cache (state/broadcast.py): same build-once-per-worker semantics as
    the actor pool, but reuses Ray's warm workers — no pool-ramp cost on
    short jobs.  ``use_actors=True`` selects the actor-pool form.
    ``img_cols`` pass through extra image-side columns onto each pair;
    ``emit_image_id=False`` drops the id strings when the consumer can
    reconstruct them from an int key (shuffle-width saver)."""
    layer_ref = ray.put(layer)
    if use_actors:
        from ..util import default_concurrency

        return images.map_batches(
            BroadcastSpatialJoin,
            fn_constructor_args=(layer_ref, id_col, extra_cols, img_cols, emit_image_id),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=concurrency if concurrency is not None else default_concurrency(),
            batch_size=batch_size,
        )

    from ..state.broadcast import cached

    def join(batch: pa.Table) -> pa.Table:
        L = cached(layer_ref, lambda t: _Layer(t, id_col, extra_cols))
        return _join_batch(batch, L, img_cols, emit_image_id)

    return images.map_batches(
        join, batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size
    )


# --- cell-partitioned variant ---------------------------------------------

def _explode_to_cells(
    batch: pa.Table,
    keep_cols: tuple[str, ...],
    salt_cells: dict[int, int] | None,
    side: int,
) -> pa.Table:
    rows, cell = cellmod.covering(
        batch.column("x0").to_numpy(zero_copy_only=False),
        batch.column("y0").to_numpy(zero_copy_only=False),
        batch.column("x1").to_numpy(zero_copy_only=False),
        batch.column("y1").to_numpy(zero_copy_only=False),
    )
    out = batch.select(list(keep_cols)).take(pa.array(rows))
    if salt_cells:
        # probe rows (side=0) get one salted sub-key round-robin; build
        # rows (side=1) are replicated across every salt of a hot cell.
        salts = np.zeros(len(cell), dtype=np.int64)
        rep_rows = [np.arange(len(cell))]
        rep_salts = [salts]
        for c, k in salt_cells.items():
            m = cell == c
            if not m.any():
                continue
            if side == 0:
                rep_salts[0] = rep_salts[0].copy()
                rep_salts[0][m] = np.arange(int(m.sum())) % k
            else:
                for s in range(1, k):
                    rep_rows.append(np.nonzero(m)[0])
                    rep_salts.append(np.full(int(m.sum()), s, dtype=np.int64))
        idx = np.concatenate(rep_rows)
        out = out.take(pa.array(idx))
        cell = cell[idx]
        salts = np.concatenate(rep_salts)
        key = cell * np.int64(64) + salts
    else:
        key = cell * np.int64(64)  # salt=0; key is ALWAYS cell*64+salt
    out = out.append_column("cell_key", pa.array(key))
    out = out.append_column("side", pa.array(np.full(out.num_rows, side, dtype=np.int64)))
    return out


def _cell_group_join(group: pa.Table, id_col: str = "lc_id") -> pa.Table:
    empty = pa.table(
        {
            "image_id": pa.array([], type=pa.string()),
            id_col: pa.array([], type=pa.int64()),
        }
    )
    side = group.column("side").to_numpy(zero_copy_only=False)
    probe = group.filter(pa.array(side == 0))
    build = group.filter(pa.array(side == 1))
    if probe.num_rows == 0 or build.num_rows == 0:
        return empty
    cell_key = int(group.column("cell_key")[0].as_py())
    cell = cell_key // 64  # cell_key is always cell*64+salt
    px0 = probe.column("x0").to_numpy(zero_copy_only=False)
    py0 = probe.column("y0").to_numpy(zero_copy_only=False)
    px1 = probe.column("x1").to_numpy(zero_copy_only=False)
    py1 = probe.column("y1").to_numpy(zero_copy_only=False)
    tree = STRtree(
        build.column("x0").to_numpy(zero_copy_only=False),
        build.column("y0").to_numpy(zero_copy_only=False),
        build.column("x1").to_numpy(zero_copy_only=False),
        build.column("y1").to_numpy(zero_copy_only=False),
    )
    qi, ti = tree.query_batch(px0, py0, px1, py1)
    if len(qi) == 0:
        return empty
    # canonical-cell dedup: report a pair only in the cell that contains
    # the top-left corner of the bbox intersection.  (Refinement below
    # only DROPS pairs and decides identically in every cell, so the
    # canonical rule stays consistent.)
    bx0 = tree.x0[ti]
    by0 = tree.y0[ti]
    corner_x = np.maximum(px0[qi], bx0)
    corner_y = np.maximum(py0[qi], by0)
    canon = cellmod.cell_of(corner_x, corner_y)
    keep = canon == cell
    qi, ti = qi[keep], ti[keep]
    if len(qi) == 0:
        return empty
    build_parts = None
    build_stack = None
    build_pstack = None
    if "geom_wkb" in build.column_names:
        # vectorized buffer-view decode first: the build side re-decodes
        # once PER CELL GROUP, so homogeneous layers (the common corpus
        # case) must never pay a Python-per-row decode here
        col = build.column("geom_wkb")
        build_stack = wkb.decode_rings_stack(col)
        if build_stack is None:
            build_pstack = wkb.decode_parts_stack(col)
        if build_stack is not None and _stack_is_rects(build_stack):
            build_stack = None  # bbox test was exact
        elif build_stack is not None or build_pstack is not None:
            qi, ti = _refine_pairs(
                px0, py0, px1, py1, qi, ti, None, build_stack, build_pstack
            )
            if len(qi) == 0:
                return empty
        else:
            geoms = col.to_pylist()
            if any(g is not None for g in geoms):
                build_parts = [
                    wkb.decode_rings(g) if g is not None else None for g in geoms
                ]
                if not all(
                    ps is not None and len(ps) == 1 and _ring_is_rect(ps[0])
                    for ps in build_parts
                ):
                    build_stack = _stack_single_part(build_parts)
                    build_pstack = _stack_parts(build_parts)
                    qi, ti = _refine_pairs(
                        px0, py0, px1, py1, qi, ti, build_parts, build_stack,
                        build_pstack,
                    )
                    if len(qi) == 0:
                        return empty
                else:
                    build_parts = None  # bbox test was exact
    # polygon probe side (rotated/non-rect footprints): exact
    # probe-geometry refinement against the build geometry
    if "geom_wkb" in probe.column_names:
        probe_rings, probe_stack = _probe_rings_of(probe)
        if probe_rings is not None or probe_stack is not None:
            tv = _TargetView(tree, build_parts, build_stack, build_pstack)
            qi, ti = _refine_probe_pairs(qi, ti, probe_rings, probe_stack, tv)
            if len(qi) == 0:
                return empty
    return pa.table(
        {
            "image_id": pa.array(
                probe.column("image_id").to_numpy(zero_copy_only=False)[qi],
                type=pa.string(),
            ),
            id_col: pa.array(build.column(id_col).to_numpy(zero_copy_only=False)[ti]),
        }
    )


MAX_SALTS = 64  # cell_key packs salt in 6 bits (key = cell*64 + salt)


def detect_hot_cells(
    images: "ray.data.Dataset",
    hot_factor: float = 8.0,
    target_rows_per_salt: int | None = None,
) -> dict[int, int]:
    """Skew planner for :func:`partitioned_spatial_join`: one cheap
    shuffle-free pass over the probe side's covering cells (tree-reduce
    count per cell), then every cell holding more than ``hot_factor`` x
    the mean cell load gets ``ceil(count / target_rows_per_salt)`` salts
    (capped at MAX_SALTS).  Dense AOIs — the north rule's hot-cell skew
    case — are detected from the data instead of hand-listed."""
    from .hashagg import tree_count_sum_by_key

    def cells_only(batch: pa.Table) -> pa.Table:
        _, cell = cellmod.covering(
            batch.column("x0").to_numpy(zero_copy_only=False),
            batch.column("y0").to_numpy(zero_copy_only=False),
            batch.column("x1").to_numpy(zero_copy_only=False),
            batch.column("y1").to_numpy(zero_copy_only=False),
        )
        return pa.table({"cell": pa.array(cell)})

    hist = tree_count_sum_by_key(
        images.map_batches(
            cells_only, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        ),
        "cell",
        count_name="n",
    )
    cells = hist.column("cell").to_numpy(zero_copy_only=False)
    n = hist.column("n").to_numpy(zero_copy_only=False)
    if len(n) == 0:
        return {}
    mean = float(n.mean())
    if target_rows_per_salt is None:
        target_rows_per_salt = max(int(mean), 1)
    hot = n > hot_factor * mean
    out: dict[int, int] = {}
    for c, cnt in zip(cells[hot].tolist(), n[hot].tolist()):
        out[int(c)] = min(MAX_SALTS, max(2, int(np.ceil(cnt / target_rows_per_salt))))
    return out


def partitioned_spatial_join(
    images: "ray.data.Dataset",
    layer_ds: "ray.data.Dataset",
    salt_cells: dict[int, int] | None | str = "auto",
    id_col: str = "lc_id",
    _timing: bool = False,
) -> "ray.data.Dataset":
    """Scale-path join: explode both sides to covering cells, union, hash
    shuffle on cell_key, join per group.  ``salt_cells`` maps hot cell id
    -> number of salts (build side replicated, probe side split); the
    default ``"auto"`` runs :func:`detect_hot_cells` over the probe side
    (one cheap shuffle-free counting pass) so dense-AOI skew is handled
    without hand-listing cells — a uniform corpus detects nothing and
    pays only the count pass.  ``id_col`` names the layer's id column
    (mirrors broadcast_spatial_join's generic API)."""
    if salt_cells == "auto":
        salt_cells = detect_hot_cells(images) or None
    if salt_cells and any(k > MAX_SALTS for k in salt_cells.values()):
        raise ValueError(f"salt counts must be <= {MAX_SALTS} (6-bit salt packing)")
    layer_cols = layer_ds.schema().names
    probe_cols_avail = images.schema().names
    probe_geom = "geom_wkb" in probe_cols_avail
    with_geom = "geom_wkb" in layer_cols or probe_geom
    build_cols = (id_col, "x0", "y0", "x1", "y1") + (
        ("geom_wkb",) if "geom_wkb" in layer_cols else ()
    )
    probe_cols = ("image_id", "x0", "y0", "x1", "y1") + (
        ("geom_wkb",) if probe_geom else ()
    )
    probe = images.map_batches(
        lambda b: _explode_to_cells(b, probe_cols, salt_cells, side=0),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    build = layer_ds.map_batches(
        lambda b: _explode_to_cells(b, build_cols, salt_cells, side=1),
        batch_format="pyarrow",
        zero_copy_batch=True, batch_size=None)
    # align schemas for union: add missing id columns as nulls
    def pad(batch: pa.Table, cols: dict[str, pa.DataType]) -> pa.Table:
        for name, typ in cols.items():
            if name not in batch.column_names:
                batch = batch.append_column(name, pa.nulls(batch.num_rows, typ))
        return batch.select(sorted(batch.column_names))

    schema_cols = {"image_id": pa.string(), id_col: pa.int64()}
    if with_geom:
        schema_cols["geom_wkb"] = pa.binary()
    probe = probe.map_batches(lambda b: pad(b, schema_cols), batch_format="pyarrow", batch_size=None)
    build = build.map_batches(lambda b: pad(b, schema_cols), batch_format="pyarrow", batch_size=None)
    both = probe.union(build)

    # exchange on the raw-task hash shuffle instead of the sort-based
    # groupby (same key co-location guarantee, no sampling/sort pass):
    # each partition holds MANY whole cells; the kernel sorts its
    # partition once and feeds _cell_group_join per cell run — the same
    # per-cell Python call count map_groups paid, minus the sort
    # exchange (measured: the Sort operator alone was ~1.6 s of the
    # 2.8 s warm wall at sf0.1).
    from .rawshuffle import part_map_groups

    P = 64

    def with_part(b: pa.Table) -> pa.Table:
        # util.hash_partition avalanches before the modulus — required
        # here: cell_key = cell*64 + salt is a multiple of 64 whenever
        # salt == 0, and a bare multiplicative hash mod a power-of-two
        # P maps every such key to partition 0 (measured: the whole
        # join serialized onto one reduce task).
        from ..util import hash_partition

        ck = b.column("cell_key").to_numpy(zero_copy_only=False)
        return b.append_column("__part", pa.array(hash_partition(ck, P)))

    parted = both.map_batches(
        with_part, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )

    def cells_kernel(part: pa.Table) -> pa.Table:
        import time as _time

        t0 = _time.perf_counter()
        ck = part.column("cell_key").to_numpy(zero_copy_only=False)
        order = np.argsort(ck, kind="stable")
        t = part.take(pa.array(order))
        cks = ck[order]
        starts = np.flatnonzero(
            np.concatenate(([True], cks[1:] != cks[:-1]))
        )
        ends = np.concatenate((starts[1:], [len(cks)]))
        outs = [
            _cell_group_join(t.slice(int(s), int(e - s)), id_col=id_col)
            for s, e in zip(starts, ends)
        ]
        outs = [o for o in outs if o.num_rows]
        if not outs:
            res = pa.table(
                {
                    "image_id": pa.array([], type=pa.string()),
                    id_col: pa.array([], type=pa.int64()),
                }
            )
        else:
            res = pa.concat_tables(outs, promote_options="default")
        if _timing and res.num_rows:
            # bench-only reduce-task balance telemetry (skew drill):
            # every pair row carries its reduce task's id + kernel wall
            wall = _time.perf_counter() - t0
            pid = int(part.column("__part")[0].as_py())
            res = res.append_column(
                "__task_part", pa.array(np.full(res.num_rows, pid, np.int64))
            ).append_column(
                "__task_wall",
                pa.array(np.full(res.num_rows, wall, np.float64)),
            )
        return res

    return part_map_groups(
        parted, "__part", cells_kernel, P, drop_col=not _timing
    )
