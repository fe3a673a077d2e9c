"""Hierarchical grid cell index (H3/S2 analog) for the planar world.

h3/s2 libraries are unavailable here, so the engine uses its own
deterministic hierarchy: resolution r has cell edge ``BASE_DEG / 2**(r -
BASE_RES)`` degrees (r=5 -> 4 deg, r=9 -> 0.25 deg), matching the north
rule's "H3 res 5-9" covering.  Cell ids pack (x_index, y_index) with a
fixed stride; a Morton (Z-order) code is provided as the S2-curve analog
for locality-preserving sort/partition keys.

The two resolutions the pipelines use are mirrored by SQL oracles:
res 5 (join key, spec.CELL_DEG) and res 9 (tiles, spec.TILE_PER_DEG).
"""

from __future__ import annotations

import numpy as np

from .. import spec

BASE_RES = 5
BASE_DEG = spec.CELL_DEG  # single source of truth (knn's guarantee uses it)


def res_deg(res: int) -> float:
    return BASE_DEG / (2 ** (res - BASE_RES))


def cell_of(x: np.ndarray, y: np.ndarray, res: int = BASE_RES) -> np.ndarray:
    """Cell id of points at resolution ``res`` (mirrors the SQL floor
    arithmetic for res 5 / res 9)."""
    inv = 1.0 / res_deg(res)
    cx = np.floor((x + spec.LON_OFF) * inv).astype(np.int64)
    cy = np.floor((y + spec.LAT_OFF) * inv).astype(np.int64)
    return pack(cx, cy, res)


def pack(cx: np.ndarray, cy: np.ndarray, res: int = BASE_RES) -> np.ndarray:
    stride = spec.CELL_STRIDE * (2 ** (res - BASE_RES))
    return (cx + 2) * np.int64(stride) + (cy + 2)


def unpack(cell: np.ndarray, res: int = BASE_RES) -> tuple[np.ndarray, np.ndarray]:
    stride = spec.CELL_STRIDE * (2 ** (res - BASE_RES))
    return cell // stride - 2, cell % stride - 2


def covering(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray, res: int = BASE_RES
) -> tuple[np.ndarray, np.ndarray]:
    """Covering cells of boxes -> (row_idx, cell_id) exploded pairs.

    Grid-aligned and vectorized: one pass per (dx, dy) offset of the
    maximal covering extent (images span at most 2x2 base cells).
    """
    inv = 1.0 / res_deg(res)
    cx0 = np.floor((x0 + spec.LON_OFF) * inv).astype(np.int64)
    cx1 = np.floor((x1 + spec.LON_OFF) * inv).astype(np.int64)
    cy0 = np.floor((y0 + spec.LAT_OFF) * inv).astype(np.int64)
    cy1 = np.floor((y1 + spec.LAT_OFF) * inv).astype(np.int64)
    max_dx = int((cx1 - cx0).max()) if len(cx0) else 0
    max_dy = int((cy1 - cy0).max()) if len(cy0) else 0
    rows = []
    cells = []
    base = np.arange(len(cx0), dtype=np.int64)
    for dx in range(max_dx + 1):
        for dy in range(max_dy + 1):
            m = (cx0 + dx <= cx1) & (cy0 + dy <= cy1)
            if not m.any():
                continue
            rows.append(base[m])
            cells.append(pack(cx0[m] + dx, cy0[m] + dy, res))
    if not rows:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(rows), np.concatenate(cells)


def tile_ids(x0, y0, x1, y1) -> tuple[np.ndarray, np.ndarray]:
    """Fine-tile (res 9, 0.25 deg) covering -> (row_idx, tile_id).

    Same algorithm as :func:`covering` at res 9: res_deg(9) == 1 /
    TILE_PER_DEG and the res-9 pack stride (CELL_STRIDE * 2^4) ==
    TILE_STRIDE, so this is a pure delegation — one covering
    implementation mirrors the SQL TILES_CTE (oracle-tested)."""
    return covering(
        np.asarray(x0, dtype=np.float64),
        np.asarray(y0, dtype=np.float64),
        np.asarray(x1, dtype=np.float64),
        np.asarray(y1, dtype=np.float64),
        res=9,
    )


def morton(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order curve code (S2-analog locality key): interleaves 16-bit
    quantized lon/lat.  Used as a sort/partition key, never compared to a
    SQL oracle."""
    qx = np.clip(((x + spec.LON_OFF) / 340.0 * 65535.0), 0, 65535).astype(np.uint32)
    qy = np.clip(((y + spec.LAT_OFF) / 132.0 * 65535.0), 0, 65535).astype(np.uint32)

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    return (spread(qx) << np.uint64(1) | spread(qy)).astype(np.int64)


def ring_cells(cell: int, ring: int, res: int = BASE_RES) -> np.ndarray:
    """All cell ids within Chebyshev distance ``ring`` of ``cell``
    (kNN ring expansion, north-rule 'kNN scene-proximity')."""
    stride = spec.CELL_STRIDE * (2 ** (res - BASE_RES))
    cx, cy = cell // stride - 2, cell % stride - 2
    dxs, dys = np.meshgrid(
        np.arange(-ring, ring + 1), np.arange(-ring, ring + 1), indexing="ij"
    )
    return pack((cx + dxs).ravel(), (cy + dys).ravel(), res)
