"""Deterministic corpus derivation kernels (numpy over Arrow batches).

Every function here is a *vectorized batch kernel*: it takes a
``pyarrow.Table`` (one Ray Data block / batch) and returns a
``pyarrow.Table``.  They are used both

- inside ``ray.data.Dataset.map_batches(batch_format="pyarrow", batch_size=None)`` (the
  engine's hot path), and
- directly in tests, where their output is compared bit-for-bit against
  the DuckDB SQL mirrors in :mod:`planet_data_analyzer_ray.oracle`.

The formulas are fixed by :mod:`planet_data_analyzer_ray.spec`; see that
module's docstring for the integer-milli-degree convention that makes
numpy and DuckDB agree bit-for-bit.

Reference semantics modelled here (cited file:line in /root/reference):
- metadata normalization/coercion  api_importer/clients/data.py:206-234
- centroid / area (EPSG:3035 analog)  database/db.py:73-84,150-158
- city 30 km buffer  database/db.py:243-245
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import spec


def _mix(key: np.ndarray, stream: tuple[int, int]) -> np.ndarray:
    mult, salt = stream
    return (key * np.int64(mult) + np.int64(salt)) % np.int64(spec.MOD)


# ---------------------------------------------------------------------------
# images  (from lineitem)
# ---------------------------------------------------------------------------

def image_key_from_lineitem(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Returns (key, orderkey).  Key packs all four integer columns, so
    every image attribute is functionally dependent on image_id."""
    ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False).astype(np.int64)
    ln = batch.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
    pk = batch.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    key = (
        (ok * spec.KEY_LN_MULT + ln) * spec.KEY_PART_MULT + pk
    ) * spec.KEY_SUPP_MULT + sk
    return key, ok


def derive_images(
    batch: pa.Table,
    with_bytes: bool = False,
    light: bool = False,
    with_geom: bool = False,
) -> pa.Table:
    """lineitem batch -> canonical per-image metadata (no dedup applied).

    Output columns: image_id, image_key, item_type_id, asset_types,
    sat_id, cloud_cover, clear_confidence_percent, time_acquired,
    centroid_lon, centroid_lat, x0,y0,x1,y1 (footprint bbox, degrees),
    area_sqkm, w, h, fmt, phash, caption [, bytes].

    ``light=True`` skips the string/list/timestamp attribute columns
    (keeps ids, geometry, w/h/fmt) — used by hot pipelines that don't
    consume them (the flagship tile leg).
    """
    full_key, orderkey = image_key_from_lineitem(batch)
    key = full_key % np.int64(spec.MOD)  # mix input
    lon_md = _mix(key, spec.ST_LON) % spec.LON_SPAN_MD
    lat_md = _mix(key, spec.ST_LAT) % spec.LAT_SPAN_MD
    hw_md = spec.HW_MIN_MD + _mix(key, spec.ST_HW) % spec.HW_MOD

    lon = lon_md / 1000.0 - spec.LON_OFF
    lat = lat_md / 1000.0 - spec.LAT_OFF
    x0 = (lon_md - hw_md) / 1000.0 - spec.LON_OFF
    x1 = (lon_md + hw_md) / 1000.0 - spec.LON_OFF
    y0 = (lat_md - hw_md) / 1000.0 - spec.LAT_OFF
    y1 = (lat_md + hw_md) / 1000.0 - spec.LAT_OFF
    side = (2 * hw_md) / 1000.0
    area_sqkm = side * side * spec.KM2_PER_DEG2

    cloud = (_mix(key, spec.ST_CLOUD) % 1001) / 1000.0
    clear = (_mix(key, spec.ST_CLEAR) % 101).astype(np.float64)
    w = (spec.IMG_WH_MIN + _mix(key, spec.ST_W) % spec.IMG_WH_MOD).astype(np.int32)
    h = (spec.IMG_WH_MIN + _mix(key, spec.ST_H) % spec.IMG_WH_MOD).astype(np.int32)

    fmt = np.where(full_key % spec.LOSSY_EVERY_MOD >= 8, "qraw8", "raw8")

    import pyarrow.compute as pc

    # string assembly via Arrow C kernels (np.char is ~10x slower)
    key_str = pc.cast(pa.array(full_key), pa.string())
    image_id = pc.binary_join_element_wise("img-", key_str, "")

    cols: dict[str, pa.Array | pa.ChunkedArray] = {"image_id": image_id}

    if not light:
        phash = phash_for_keys(full_key, orderkey)

        # time_acquired: epoch + mixed hours (exact integer micros)
        hours = _mix(key, spec.ST_TIME) % spec.TIME_SPAN_HOURS
        epoch_us = np.datetime64(spec.TIME_EPOCH.replace(" ", "T"), "us").astype(np.int64)
        time_acquired = (epoch_us + hours * np.int64(3_600_000_000)).view("datetime64[us]")

        c1 = (65 + _mix(key, spec.ST_CAP1) % 26).astype(np.uint32).view("U1")
        c2 = (65 + _mix(key, spec.ST_CAP2) % 26).astype(np.uint32).view("U1")
        caption = pc.binary_join_element_wise(
            image_id,
            "-",
            pa.array(c1, type=pa.string()),
            pa.array(c2, type=pa.string()),
            "",
        )

        # item/asset types (reference ItemType + AssetType M:N,
        # database/db.py:180-205; asset_types list at data.py:229)
        item_type = pc.binary_join_element_wise(
            "it-", pc.cast(pa.array(full_key % spec.ITEM_TYPE_MOD), pa.string()), ""
        )
        asset_bits = _mix(key, spec.ST_ASSET)
        has = [
            np.ones(len(key), dtype=bool),          # 'analytic' always present
            (asset_bits >> 1) % 2 == 1,             # 'visual'
            (asset_bits >> 2) % 2 == 1,             # 'udm'
        ]
        n_assets = sum(h.astype(np.int64) for h in has)
        offsets = np.zeros(len(key) + 1, dtype=np.int32)
        offsets[1:] = np.cumsum(n_assets)
        stack = np.stack(has, axis=1)  # (n, 3) presence mask, fixed order
        values = np.tile(np.asarray(spec.ASSET_TYPES), len(key))[stack.ravel()]
        asset_types = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(values, type=pa.string())
        )
        cols["item_type_id"] = item_type
        cols["asset_types"] = asset_types

    cols["image_key"] = pa.array(full_key)
    cols["sat_id"] = pa.array(
        batch.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    )
    if not light:
        cols["cloud_cover"] = pa.array(cloud)
        cols["clear_confidence_percent"] = pa.array(clear)
        cols["time_acquired"] = pa.array(time_acquired, type=pa.timestamp("us"))
    cols.update(
        {
            "centroid_lon": pa.array(lon),
            "centroid_lat": pa.array(lat),
            "x0": pa.array(x0),
            "y0": pa.array(y0),
            "x1": pa.array(x1),
            "y1": pa.array(y1),
            "area_sqkm": pa.array(area_sqkm),
            "w": pa.array(w),
            "h": pa.array(h),
            "fmt": pa.array(fmt, type=pa.string()),
        }
    )
    if not light:
        cols["phash"] = pa.array(phash)
        cols["caption"] = pa.array(caption, type=pa.string())
    if with_geom:
        from .geo import wkb as wkbmod

        cols["geom_wkb"] = pa.array(
            wkbmod.encode_boxes(x0, y0, x1, y1), type=pa.binary()
        )
    if with_bytes:
        cols["bytes"] = encode_pixels(full_key, w, h, fmt)
    return pa.table(cols)


def geom_md_from_keys(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lon_md, lat_md, hw_md) for image keys — THE single engine-side
    copy of the footprint-geometry mix (mirrors the oracle's img CTE);
    every stage needing exact integer-md geometry derives through here
    (a drifting copy silently breaks oracle parity)."""
    mk = key.astype(np.int64) % np.int64(spec.MOD)
    lon_md = _mix(mk, spec.ST_LON) % spec.LON_SPAN_MD
    lat_md = _mix(mk, spec.ST_LAT) % spec.LAT_SPAN_MD
    hw_md = spec.HW_MIN_MD + _mix(mk, spec.ST_HW) % spec.HW_MOD
    return lon_md, lat_md, hw_md


def phash_for_keys(full_key: np.ndarray, orderkey: np.ndarray) -> np.ndarray:
    """62-bit perceptual-hash stand-in with built-in near-dup structure:
    every image's phash is a 1-bit perturbation of its *order's* base
    hash, so images of the same order are near-duplicates of each other
    (hamming <= 2) — the corpus's analog of same-scene re-captures."""
    hi = _mix(orderkey, spec.ST_PH_HI)
    lo = _mix(orderkey, spec.ST_PH_LO)
    base = hi * np.int64(2147483648) + lo
    return base ^ (np.int64(1) << (full_key % 62))


def synthesize_pages(batch: pa.Table) -> pa.Table:
    """Canonical rows (page_idx=0) plus duplicate re-emissions (page_idx=1)
    for keys % DUP_EVERY == 0, with clear_confidence_percent + 1 so the
    dedup winner is observable.  Models the reference's duplicate-insert
    stream (ON CONFLICT DO NOTHING, db.py:65-70; page dedup data.py:198).
    """
    imgs = derive_images(batch)
    page0 = imgs.append_column("page_idx", pa.array(np.zeros(imgs.num_rows, np.int64)))
    key = imgs.column("image_key").to_numpy()
    mask = pa.array(key % spec.DUP_EVERY == 0)
    dups = imgs.filter(mask)
    clear = dups.column("clear_confidence_percent").to_numpy() + 1.0
    dups = dups.set_column(
        dups.schema.get_field_index("clear_confidence_percent"),
        "clear_confidence_percent",
        pa.array(clear),
    )
    dups = dups.append_column("page_idx", pa.array(np.ones(dups.num_rows, np.int64)))
    return pa.concat_tables([page0, dups])


# ---------------------------------------------------------------------------
# pixel bytes (the binary payload; spec: raw8 lossless / qraw8 lossy)
# ---------------------------------------------------------------------------

def original_pixels(key: int, w: int, h: int) -> np.ndarray:
    n = int(w) * int(h)
    return ((np.arange(n, dtype=np.int64) + int(key)) % 256).astype(np.uint8)


def encode_pixels(key: np.ndarray, w: np.ndarray, h: np.ndarray, fmt: np.ndarray) -> pa.Array:
    """Vectorized payload synthesis: one flat uint8 buffer + offsets,
    wrapped zero-copy as an Arrow binary array (no per-row Python)."""
    n = (w.astype(np.int64) * h.astype(np.int64))
    starts = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n, out=starts[1:])
    total = int(starts[-1])
    # offsets are int32 in the Arrow binary layout: a block whose payload
    # crossed 2^31 bytes would silently wrap into a corrupt array
    assert total < 2**31, (
        f"block payload {total} bytes overflows int32 binary offsets; "
        "reduce block/batch size (or switch this column to large_binary)"
    )
    # pixel(i) = (key + i) % 256 is periodic-256: every row is a slice of
    # a tiled ramp template -> encode = one memcpy per row from L1-resident
    # templates (large flat-array arithmetic thrashes DRAM instead)
    max_n = int(n.max()) if len(n) else 0
    tmpl = np.tile(np.arange(256, dtype=np.uint8), (max_n + 256) // 256 + 1)
    tmpl_q = tmpl & np.uint8(spec.LOSSY_MASK)
    px = np.empty(total, dtype=np.uint8)
    s_off = (key % 256).astype(np.int64)
    is_q = np.asarray(fmt) == "qraw8"
    for i in range(len(n)):
        src = tmpl_q if is_q[i] else tmpl
        a = starts[i]
        px[a : a + n[i]] = src[s_off[i] : s_off[i] + n[i]]
    return pa.Array.from_buffers(
        pa.binary(),
        len(n),
        [None, pa.py_buffer(starts.astype(np.int32)), pa.py_buffer(px)],
    )


# ---------------------------------------------------------------------------
# broadcast layers
# ---------------------------------------------------------------------------

def land_cover_md(p: np.ndarray) -> tuple[np.ndarray, ...]:
    """Integer milli-degree land-cover rects (x0, x1, y0, y1) for part
    keys — the single source of the layer placement formula (mirrored
    by oracle _LCMD_CTE); both the degree-valued layer table and the
    integer slab sweep derive from it."""
    cell = _mix(p, spec.ST_LC_CELL) % (spec.LC_NX * spec.LC_NY)
    cx = cell % spec.LC_NX
    cy = cell // spec.LC_NX
    grid_md = int(spec.LC_GRID_DEG * 1000)
    x0_base = cx * grid_md - 170_000
    y0_base = cy * grid_md - 66_000
    x0 = x0_base + _mix(p, spec.ST_LC_MX0) % spec.LC_MARGIN_MOD
    x1 = x0_base + grid_md - _mix(p, spec.ST_LC_MX1) % spec.LC_MARGIN_MOD
    y0 = y0_base + _mix(p, spec.ST_LC_MY0) % spec.LC_MARGIN_MOD
    y1 = y0_base + grid_md - _mix(p, spec.ST_LC_MY1) % spec.LC_MARGIN_MOD
    return x0, x1, y0, y1


def derive_land_cover(part: pa.Table) -> pa.Table:
    """part -> land-cover polygon layer (one box per part row, placed
    inside a 4-deg grid cell with hashed margins; boxes in the same cell
    overlap, exercising true polygon-union dissolves)."""
    p = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    mx0, mx1, my0, my1 = land_cover_md(p)
    x0 = mx0 / 1000.0
    x1 = mx1 / 1000.0
    y0 = my0 / 1000.0
    y1 = my1 / 1000.0
    fc = np.asarray(spec.FEATURECLASSES)[(p % 5).astype(np.intp)]
    return pa.table(
        {
            "lc_id": pa.array(p),
            "featureclass": pa.array(fc, type=pa.string()),
            "x0": pa.array(x0),
            "y0": pa.array(y0),
            "x1": pa.array(x1),
            "y1": pa.array(y1),
        }
    )


def normalize_feature_batch(batch: pa.Table) -> pa.Table:
    """M1 normalizer with the reference's field coercions
    (/root/reference/api_importer/clients/data.py:223-234, tested
    field-by-field by the reference's test_data_client_u.py:201-227):

    - ``id``/``sat_id`` -> str
    - ``provider`` -> ``.title()``-cased satellite name
    - ``pixel_res`` -> float
    - ``cloud_cover`` -> float, MISSING (null) -> 0.0
    - ``clear_confidence_percent`` -> int, MISSING (null) -> 0
    - ``acquired`` -> timestamp

    The synthetic corpus never produces missing/dirty fields, so this
    stage is exercised by unit tests with nulls + mixed-case providers
    rather than by the oracle pipelines."""
    import pyarrow.compute as pc

    n = batch.num_rows
    out: dict[str, pa.Array] = {}
    out["id"] = pc.cast(batch.column("id"), pa.string())
    out["sat_id"] = pc.cast(batch.column("sat_id"), pa.string())
    prov = batch.column("provider").to_pylist()
    out["satellite"] = pa.array(
        [None if p is None else str(p).title() for p in prov], type=pa.string()
    )
    out["pixel_res"] = pc.cast(batch.column("pixel_res"), pa.float64())
    cc = pc.cast(batch.column("cloud_cover"), pa.float64())
    out["cloud_cover"] = pc.fill_null(cc, 0.0)
    ccp = pc.cast(batch.column("clear_confidence_percent"), pa.int64())
    out["clear_confidence_percent"] = pc.fill_null(ccp, 0)
    out["time_acquired"] = pc.cast(batch.column("acquired"), pa.timestamp("us"))
    return pa.table(out)


def derive_zones(part: pa.Table) -> pa.Table:
    """part -> NON-RECTANGULAR zone layer: one right triangle per row
    (half of a hashed base rect, 4 orientations), emitted as WKB rings
    so the spatial joins take the exact polygon-refinement path.

    Orientations (right-angle corner): 0=(x0,y0), 1=(x1,y0),
    2=(x1,y1), 3=(x0,y1).  The bbox columns are the triangle's bbox
    (the base rect)."""
    from .geo import wkb as wkbmod

    p = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cell = _mix(p, spec.ST_ZN_CELL) % (spec.LC_NX * spec.LC_NY)
    cx = cell % spec.LC_NX
    cy = cell // spec.LC_NX
    x0_base = cx * spec.LC_GRID_DEG * 1000 - 170_000
    y0_base = cy * spec.LC_GRID_DEG * 1000 - 66_000
    mx0 = _mix(p, spec.ST_ZN_MX0) % spec.LC_MARGIN_MOD
    mx1 = _mix(p, spec.ST_ZN_MX1) % spec.LC_MARGIN_MOD
    my0 = _mix(p, spec.ST_ZN_MY0) % spec.LC_MARGIN_MOD
    my1 = _mix(p, spec.ST_ZN_MY1) % spec.LC_MARGIN_MOD
    orient = (_mix(p, spec.ST_ZN_OR) % 4).astype(np.int64)
    x0 = (x0_base + mx0) / 1000.0
    x1 = (x0_base + 4000 - mx1) / 1000.0
    y0 = (y0_base + my0) / 1000.0
    y1 = (y0_base + 4000 - my1) / 1000.0
    corners = {
        0: lambda i: [(x0[i], y0[i]), (x1[i], y0[i]), (x0[i], y1[i])],
        1: lambda i: [(x0[i], y0[i]), (x1[i], y0[i]), (x1[i], y1[i])],
        2: lambda i: [(x1[i], y0[i]), (x1[i], y1[i]), (x0[i], y1[i])],
        3: lambda i: [(x0[i], y0[i]), (x1[i], y1[i]), (x0[i], y1[i])],
    }
    geoms = [
        wkbmod.encode_polygon(np.asarray(corners[int(orient[i])](i)))
        for i in range(len(p))
    ]
    zc = np.asarray(spec.ZONECLASSES)[(p % 4).astype(np.intp)]
    return pa.table(
        {
            "zone_id": pa.array(p),
            "zone_class": pa.array(zc, type=pa.string()),
            "orient": pa.array(orient),
            "x0": pa.array(x0),
            "y0": pa.array(y0),
            "x1": pa.array(x1),
            "y1": pa.array(y1),
            "geom_wkb": pa.array(geoms, type=pa.binary()),
        }
    )


def derive_mzones(part: pa.Table) -> pa.Table:
    """part -> MULTI-PART zone layer: each zone is TWO axis-aligned
    rects (one per horizontal half of its hashed 4-deg cell), emitted as
    one WKB MULTIPOLYGON, so the spatial joins take the any-part
    refinement path (reference countries are Natural Earth
    MultiPolygons, /root/reference/database/db.py:208-224).  The
    covering bbox columns span both parts; the per-part bboxes are also
    emitted as columns so the DuckDB oracle can mirror the OR-of-
    overlaps predicate exactly."""
    from .geo import wkb as wkbmod

    p = part.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cell = _mix(p, spec.ST_MZ_CELL) % (spec.LC_NX * spec.LC_NY)
    cx = cell % spec.LC_NX
    cy = cell // spec.LC_NX
    x0_base = cx * spec.LC_GRID_DEG * 1000 - 170_000
    y0_base = cy * spec.LC_GRID_DEG * 1000 - 66_000
    m = spec.MZ_MARGIN_MOD
    ax0 = (x0_base + _mix(p, spec.ST_MZ_AX0) % m) / 1000.0
    ax1 = (x0_base + 2000 - _mix(p, spec.ST_MZ_AX1) % m) / 1000.0
    ay0 = (y0_base + _mix(p, spec.ST_MZ_AY0) % m) / 1000.0
    ay1 = (y0_base + 4000 - _mix(p, spec.ST_MZ_AY1) % m) / 1000.0
    bx0 = (x0_base + 2000 + _mix(p, spec.ST_MZ_BX0) % m) / 1000.0
    bx1 = (x0_base + 4000 - _mix(p, spec.ST_MZ_BX1) % m) / 1000.0
    by0 = (y0_base + _mix(p, spec.ST_MZ_BY0) % m) / 1000.0
    by1 = (y0_base + 4000 - _mix(p, spec.ST_MZ_BY1) % m) / 1000.0
    geoms = [
        wkbmod.encode_multipolygon(
            [
                np.array(
                    [
                        [ax0[i], ay0[i]],
                        [ax1[i], ay0[i]],
                        [ax1[i], ay1[i]],
                        [ax0[i], ay1[i]],
                        [ax0[i], ay0[i]],
                    ]
                ),
                np.array(
                    [
                        [bx0[i], by0[i]],
                        [bx1[i], by0[i]],
                        [bx1[i], by1[i]],
                        [bx0[i], by1[i]],
                        [bx0[i], by0[i]],
                    ]
                ),
            ]
        )
        for i in range(len(p))
    ]
    zc = np.asarray(spec.ZONECLASSES)[(p % 4).astype(np.intp)]
    return pa.table(
        {
            "mzone_id": pa.array(p),
            "zone_class": pa.array(zc, type=pa.string()),
            "x0": pa.array(np.minimum(ax0, bx0)),
            "y0": pa.array(np.minimum(ay0, by0)),
            "x1": pa.array(np.maximum(ax1, bx1)),
            "y1": pa.array(np.maximum(ay1, by1)),
            "ax0": pa.array(ax0),
            "ay0": pa.array(ay0),
            "ax1": pa.array(ax1),
            "ay1": pa.array(ay1),
            "bx0": pa.array(bx0),
            "by0": pa.array(by0),
            "bx1": pa.array(bx1),
            "by1": pa.array(by1),
            "geom_wkb": pa.array(geoms, type=pa.binary()),
        }
    )


def derive_rot_footprints(batch: pa.Table) -> pa.Table:
    """lineitem batch -> rotated image footprints: the image square
    rotated about its centroid by one of 4 exact-rational angle classes
    (spec.ROT_COS/ROT_SIN).  Emits the quad as a closed 5-point WKB
    POLYGON plus its covering bbox — probe-side geometries that are NOT
    boxes, so the joins exercise the probe-polygon refinement the
    reference's arbitrary footprint quads need (data.py:223-234)."""
    from .geo import wkb as wkbmod

    full_key, _ = image_key_from_lineitem(batch)
    key = full_key % np.int64(spec.MOD)
    lon_md = _mix(key, spec.ST_LON) % spec.LON_SPAN_MD
    lat_md = _mix(key, spec.ST_LAT) % spec.LAT_SPAN_MD
    hw_md = spec.HW_MIN_MD + _mix(key, spec.ST_HW) % spec.HW_MOD
    cx = lon_md / 1000.0 - spec.LON_OFF
    cy = lat_md / 1000.0 - spec.LAT_OFF
    hw = hw_md / 1000.0
    rot = (_mix(key, spec.ST_ROT) % 4).astype(np.intp)
    c = np.asarray(spec.ROT_COS)[rot]
    s = np.asarray(spec.ROT_SIN)[rot]
    # rotated corners of the square (+-hw, +-hw): R(theta) @ corner,
    # R = [[c, -s], [s, c]]; with e1 = hw*(c+s), e2 = hw*(c-s) the four
    # corners are (-e2,-e1), (e1,-e2), (e2,e1), (-e1,e2) — CCW, and the
    # covering bbox is +-e1 on both axes (c, s >= 0 for every class)
    e1 = hw * c + hw * s
    e2 = hw * c - hw * s
    qx = np.stack([cx - e2, cx + e1, cx + e2, cx - e1], axis=1)
    qy = np.stack([cy - e1, cy - e2, cy + e1, cy + e2], axis=1)
    import pyarrow.compute as pc

    key_str = pc.cast(pa.array(full_key), pa.string())
    image_id = pc.binary_join_element_wise("img-", key_str, "")
    ring = np.empty((len(key), 5, 2))
    ring[:, :4, 0] = qx
    ring[:, :4, 1] = qy
    ring[:, 4] = ring[:, 0]  # closed
    geoms = wkbmod.encode_rings_stack(ring)
    return pa.table(
        {
            "image_id": image_id,
            "rot_class": pa.array(rot.astype(np.int64)),
            "x0": pa.array(cx - e1),
            "y0": pa.array(cy - e1),
            "x1": pa.array(cx + e1),
            "y1": pa.array(cy + e1),
            "geom_wkb": pa.array(geoms, type=pa.binary()),
        }
    )


def derive_cities(customer: pa.Table, nation: pa.Table) -> pa.Table:
    """customer -> city points with a fixed-radius buffer
    (CITY_RADIUS_DEG, the 30 km analog of db.py:243-245)."""
    c = customer.column("c_custkey").to_numpy(zero_copy_only=False).astype(np.int64)
    lon_md = _mix(c, spec.ST_CITY_LON) % spec.LON_SPAN_MD
    lat_md = _mix(c, spec.ST_CITY_LAT) % spec.LAT_SPAN_MD
    nk = nation.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    nname = nation.column("n_name").to_numpy(zero_copy_only=False)
    iso_map = dict(zip(nk.tolist(), nname.tolist()))
    cnk = customer.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    iso = np.asarray([iso_map[int(k)] for k in cnk])
    return pa.table(
        {
            "city_id": pa.array(c),
            "city_name": customer.column("c_name"),
            "country_iso": pa.array(iso, type=pa.string()),
            "lon": pa.array(lon_md / 1000.0 - spec.LON_OFF),
            "lat": pa.array(lat_md / 1000.0 - spec.LAT_OFF),
            "radius": pa.array(np.full(len(c), spec.CITY_RADIUS_DEG)),
        }
    )


def derive_countries(nation: pa.Table) -> pa.Table:
    """nation -> 25 country boxes tiling the world in a 5x5 grid."""
    n = nation.column("n_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
    cx = n % spec.CTRY_NX
    cy = n // spec.CTRY_NX
    x0_md = cx * spec.CTRY_W_MD - 170_000
    y0_md = cy * spec.CTRY_H_MD - 66_000
    return pa.table(
        {
            "iso": nation.column("n_name"),
            "x0": pa.array(x0_md / 1000.0),
            "y0": pa.array(y0_md / 1000.0),
            "x1": pa.array((x0_md + spec.CTRY_W_MD) / 1000.0),
            "y1": pa.array((y0_md + spec.CTRY_H_MD) / 1000.0),
        }
    )


def derive_satellites(supplier: pa.Table) -> pa.Table:
    """Satellite dim table with the reference's pixel_res attribute
    (db.py:91, data.py:228) derived deterministically per satellite."""
    sk = supplier.column("s_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
    pxres = (_mix(sk, spec.ST_PXRES) % 46 + 5) / 10.0
    return pa.table(
        {
            "sat_id": supplier.column("s_suppkey"),
            "sat_name": supplier.column("s_name"),
            "pixel_res": pa.array(pxres),
        }
    )
