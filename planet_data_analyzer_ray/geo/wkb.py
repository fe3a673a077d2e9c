"""Vectorized WKB encode/decode (little-endian, 2-D Point / Polygon).

Replaces the reference's geoalchemy2 WKB columns
(/root/reference/database/db.py:107-111) with numpy byte assembly so a
whole Arrow batch is (de)serialized without a Python-per-row loop on the
hot path for the fixed-size cases (points, single-ring rectangles).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

_PT_DT = np.dtype(
    [("bo", "u1"), ("typ", "<u4"), ("x", "<f8"), ("y", "<f8")]
)
# single-ring 5-point polygon (closed rectangle)
_RECT_DT = np.dtype(
    [
        ("bo", "u1"),
        ("typ", "<u4"),
        ("nrings", "<u4"),
        ("npts", "<u4"),
        ("xy", "<f8", (5, 2)),
    ]
)


def encode_points(x: np.ndarray, y: np.ndarray) -> list[bytes]:
    n = len(x)
    buf = np.zeros(n, dtype=_PT_DT)
    buf["bo"] = 1
    buf["typ"] = WKB_POINT
    buf["x"] = x
    buf["y"] = y
    raw = buf.tobytes()
    sz = _PT_DT.itemsize
    return [raw[i * sz : (i + 1) * sz] for i in range(n)]


def encode_boxes(x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray) -> list[bytes]:
    """Encode axis-aligned boxes as closed 5-point WKB polygons (CCW)."""
    n = len(x0)
    buf = np.zeros(n, dtype=_RECT_DT)
    buf["bo"] = 1
    buf["typ"] = WKB_POLYGON
    buf["nrings"] = 1
    buf["npts"] = 5
    xy = buf["xy"]
    xy[:, 0, 0] = x0
    xy[:, 0, 1] = y0
    xy[:, 1, 0] = x1
    xy[:, 1, 1] = y0
    xy[:, 2, 0] = x1
    xy[:, 2, 1] = y1
    xy[:, 3, 0] = x0
    xy[:, 3, 1] = y1
    xy[:, 4, 0] = x0
    xy[:, 4, 1] = y0
    raw = buf.tobytes()
    sz = _RECT_DT.itemsize
    return [raw[i * sz : (i + 1) * sz] for i in range(n)]


def _poly_dt(npts: int) -> np.dtype:
    return np.dtype(
        [
            ("bo", "u1"),
            ("typ", "<u4"),
            ("nrings", "<u4"),
            ("npts", "<u4"),
            ("xy", "<f8", (npts, 2)),
        ]
    )


def encode_rings_stack(rings: np.ndarray) -> list[bytes]:
    """Vectorized encode of a homogeneous CLOSED ring stack (n, L, 2)
    as single-ring WKB POLYGONs — the batch form of
    :func:`encode_polygon` (no per-row struct packing)."""
    n, L, _ = rings.shape
    dt = _poly_dt(L)
    buf = np.zeros(n, dtype=dt)
    buf["bo"] = 1
    buf["typ"] = WKB_POLYGON
    buf["nrings"] = 1
    buf["npts"] = L
    buf["xy"] = rings
    raw = buf.tobytes()
    sz = dt.itemsize
    return [raw[i * sz : (i + 1) * sz] for i in range(n)]


def decode_rings_stack(arr) -> np.ndarray | None:
    """Vectorized decode of a HOMOGENEOUS binary column of single-ring
    little-endian WKB POLYGONs -> (n, L, 2) ring stack.  Returns None
    (caller takes the per-row path) when the column has nulls, mixed
    blob widths, or any non-conforming header — so this is safe to try
    on every probe batch; the corpus-sized probe side never pays a
    Python-per-row decode when its footprints are uniform quads."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0 or arr.null_count:
        return None
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    widths = np.diff(offs)
    if not (widths == widths[0]).all():
        return None
    w = int(widths[0])
    if w < 13 + 4 * 16:
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]].reshape(n, w)
    head = bytes(data[0, :13])
    if head[0] != 1:
        return None
    typ, nrings, npts = struct.unpack_from("<III", head, 1)
    if typ != WKB_POLYGON or nrings != 1 or 13 + npts * 16 != w:
        return None
    if not (data[:, :13] == data[0, :13]).all():
        return None
    return np.ascontiguousarray(data[:, 13:]).view("<f8").reshape(n, npts, 2)


def decode_parts_stack(arr) -> np.ndarray | None:
    """Vectorized decode of a HOMOGENEOUS binary column of little-endian
    WKB MULTIPOLYGONs (same part count P, every part a single ring of
    the same length L) -> (n, P, L, 2) stack.  Returns None whenever any
    row deviates (nulls, mixed widths, non-conforming headers) — caller
    falls back to the per-row path.  Same zero-copy buffer-view approach
    as :func:`decode_rings_stack`; the build side of a partitioned join
    re-decodes per cell group, so this must never loop rows."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0 or arr.null_count:
        return None
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + n + 1]
    widths = np.diff(offs)
    if not (widths == widths[0]).all():
        return None
    w = int(widths[0])
    if w < 9 + 13 + 4 * 16:
        return None
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]].reshape(n, w)
    head = bytes(data[0, :9])
    if head[0] != 1:
        return None
    typ, nparts = struct.unpack_from("<II", head, 1)
    if typ != WKB_MULTIPOLYGON or nparts < 1:
        return None
    # per-part polygon header (9 + 13 bytes in, then L points)
    part_sz = (w - 9) // nparts
    if 9 + part_sz * nparts != w or part_sz < 13 + 4 * 16:
        return None
    npts = (part_sz - 13) // 16
    if 13 + npts * 16 != part_sz:
        return None
    phead = struct.pack("<BIII", 1, WKB_POLYGON, 1, npts)
    # every row must carry the identical multipolygon + polygon headers
    if not (data[:, :9] == data[0, :9]).all():
        return None
    idx = 9 + part_sz * np.arange(nparts)[:, None] + np.arange(13)[None, :]
    if (data[0, idx.ravel()] != np.frombuffer(phead, dtype=np.uint8).reshape(1, 13).repeat(nparts, 0).ravel()).any():
        return None
    if not (data[:, idx.ravel()] == data[0, idx.ravel()]).all():
        return None
    body = data[:, 9:].reshape(n, nparts, part_sz)[:, :, 13:]
    return np.ascontiguousarray(body).view("<f8").reshape(n, nparts, npts, 2)


def encode_polygon(coords: np.ndarray) -> bytes:
    """Encode one single-ring polygon; ``coords`` is (n, 2), ring closed
    or open (closed automatically)."""
    c = np.asarray(coords, dtype=np.float64)
    if not (c[0] == c[-1]).all():
        c = np.vstack([c, c[:1]])
    head = struct.pack("<BIII", 1, WKB_POLYGON, 1, len(c))
    return head + c.astype("<f8").tobytes()


def encode_multipolygon_rects(
    x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray
) -> bytes:
    """Encode a set of disjoint axis-aligned rectangles as one WKB
    MULTIPOLYGON (the dissolve's union-geometry output form; reference
    ``ST_UNION(geom)`` returns a (Multi)Polygon, app/query.py:200-207)."""
    n = len(x0)
    head = struct.pack("<BII", 1, WKB_MULTIPOLYGON, n)
    parts = [head]
    boxes = encode_boxes(
        np.asarray(x0, dtype=np.float64),
        np.asarray(y0, dtype=np.float64),
        np.asarray(x1, dtype=np.float64),
        np.asarray(y1, dtype=np.float64),
    )
    parts.extend(boxes)
    return b"".join(parts)


def decode_multipolygon_rects(
    blob: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_multipolygon_rects` (rect members only)."""
    bo = "<" if blob[0] == 1 else ">"
    (typ,) = struct.unpack_from(f"{bo}I", blob, 1)
    if typ != WKB_MULTIPOLYGON:
        raise ValueError(f"not a multipolygon: type {typ}")
    (n,) = struct.unpack_from(f"{bo}I", blob, 5)
    off = 9
    x0 = np.empty(n)
    y0 = np.empty(n)
    x1 = np.empty(n)
    y1 = np.empty(n)
    for i in range(n):
        _, ring = decode_geometry(blob[off:])
        x0[i], y0[i] = ring[:, 0].min(), ring[:, 1].min()
        x1[i], y1[i] = ring[:, 0].max(), ring[:, 1].max()
        off += _RECT_DT.itemsize
    return x0, y0, x1, y1


def decode_geometry(wkb: bytes) -> tuple[int, np.ndarray]:
    """Decode one WKB blob -> (geom_type, coords).

    Point -> (1, array([[x, y]])); Polygon -> (3, exterior ring (n,2));
    MultiPolygon -> (6, exterior ring of the FIRST part) — callers that
    need every part use :func:`decode_rings` (interior rings are not
    used by this engine's corpus; the reference's Natural Earth
    countries are MultiPolygons, /root/reference/database/db.py:208-224).
    """
    bo = "<" if wkb[0] == 1 else ">"
    (typ,) = struct.unpack_from(f"{bo}I", wkb, 1)
    if typ == WKB_POINT:
        x, y = struct.unpack_from(f"{bo}2d", wkb, 5)
        return typ, np.array([[x, y]])
    if typ == WKB_POLYGON:
        (nrings,) = struct.unpack_from(f"{bo}I", wkb, 5)
        (npts,) = struct.unpack_from(f"{bo}I", wkb, 9)
        arr = np.frombuffer(wkb, dtype=f"{bo}f8", count=npts * 2, offset=13)
        return typ, arr.reshape(npts, 2).astype(np.float64)
    if typ == WKB_MULTIPOLYGON:
        return typ, decode_rings(wkb)[0]
    raise ValueError(f"unsupported WKB geometry type {typ}")


def _decode_polygon_at(wkb: bytes, off: int) -> tuple[np.ndarray, int]:
    """Decode the exterior ring of the polygon starting at ``off``;
    skip any interior rings.  Returns (ring, next_offset)."""
    bo = "<" if wkb[off] == 1 else ">"
    (typ,) = struct.unpack_from(f"{bo}I", wkb, off + 1)
    if typ != WKB_POLYGON:
        raise ValueError(f"expected polygon at offset {off}, got type {typ}")
    (nrings,) = struct.unpack_from(f"{bo}I", wkb, off + 5)
    pos = off + 9
    ext = None
    for r in range(nrings):
        (npts,) = struct.unpack_from(f"{bo}I", wkb, pos)
        pos += 4
        if r == 0:
            arr = np.frombuffer(wkb, dtype=f"{bo}f8", count=npts * 2, offset=pos)
            ext = arr.reshape(npts, 2).astype(np.float64)
        pos += npts * 16
    return ext, pos


def decode_rings(wkb: bytes) -> list[np.ndarray]:
    """Decode a WKB POLYGON or MULTIPOLYGON -> list of exterior rings
    (one per part).  A geometry intersects a box/polygon iff ANY part
    does, so join refinement folds the list with OR."""
    bo = "<" if wkb[0] == 1 else ">"
    (typ,) = struct.unpack_from(f"{bo}I", wkb, 1)
    if typ == WKB_POLYGON:
        ring, _ = _decode_polygon_at(wkb, 0)
        return [ring]
    if typ == WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from(f"{bo}I", wkb, 5)
        off = 9
        rings = []
        for _ in range(n):
            ring, off = _decode_polygon_at(wkb, off)
            rings.append(ring)
        return rings
    raise ValueError(f"unsupported WKB geometry type {typ} (want (multi)polygon)")


def encode_multipolygon(rings: list[np.ndarray]) -> bytes:
    """Encode a list of single-ring parts as one WKB MULTIPOLYGON."""
    head = struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(rings))
    parts = [head]
    for r in rings:
        parts.append(encode_polygon(np.asarray(r, dtype=np.float64)))
    return b"".join(parts)


def decode_boxes(wkbs) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized bbox extraction from a homogeneous array of 5-point
    rectangle polygons (fast path); falls back to per-row decode for
    general polygons."""
    sz = _RECT_DT.itemsize
    if all(len(w) == sz for w in wkbs):
        raw = b"".join(wkbs)
        buf = np.frombuffer(raw, dtype=_RECT_DT)
        if (buf["typ"] == WKB_POLYGON).all() and (buf["npts"] == 5).all():
            xy = buf["xy"]
            return (
                xy[:, :, 0].min(axis=1),
                xy[:, :, 1].min(axis=1),
                xy[:, :, 0].max(axis=1),
                xy[:, :, 1].max(axis=1),
            )
    x0 = np.empty(len(wkbs))
    y0 = np.empty(len(wkbs))
    x1 = np.empty(len(wkbs))
    y1 = np.empty(len(wkbs))
    for i, w in enumerate(wkbs):
        bo = "<" if w[0] == 1 else ">"
        if struct.unpack_from(f"{bo}I", w, 1)[0] == WKB_POINT:
            _, c = decode_geometry(w)
            cs = [c]
        else:
            cs = decode_rings(w)  # bbox over EVERY part of a multipolygon
        x0[i] = min(c[:, 0].min() for c in cs)
        y0[i] = min(c[:, 1].min() for c in cs)
        x1[i] = max(c[:, 0].max() for c in cs)
        y1[i] = max(c[:, 1].max() for c in cs)
    return x0, y0, x1, y1
