"""DuckDB SQL mirrors of the corpus derivation + every oracle query.

Each SQL string reproduces, with the *same arithmetic in the same
order*, what the Ray pipelines in :mod:`planet_data_analyzer_ray`
compute, so the driver's row-count / schema / value-hash comparison
passes bit-for-bit.  Shared CTE prefixes are built from
:mod:`planet_data_analyzer_ray.spec` constants.

Convention: all float values are produced by a single division of exact
integers (``md/1000.0 - OFF``) or by mirrored double expressions, so
numpy and DuckDB agree to the last bit.
"""

from __future__ import annotations

import math

from . import spec

M = spec.MOD


def _mix(expr: str, stream: tuple[int, int]) -> str:
    mult, salt = stream
    return f"(({expr}*{mult}+{salt}) % {M})"


def _raw_phash(k: str) -> str:
    return f"({_mix(k, spec.ST_PH_HI)} * 2147483648 + {_mix(k, spec.ST_PH_LO)})"


# --- shared CTE: canonical images (post-dedup view) -----------------------

IMAGES_CTE = f"""
img_raw AS (
  SELECT ((l_orderkey*{spec.KEY_LN_MULT} + l_linenumber)*{spec.KEY_PART_MULT}
          + l_partkey)*{spec.KEY_SUPP_MULT} + l_suppkey AS key,
         ((l_orderkey*{spec.KEY_LN_MULT} + l_linenumber)*{spec.KEY_PART_MULT}
          + l_partkey)*{spec.KEY_SUPP_MULT} + l_suppkey AS fkey,
         l_orderkey AS okey,
         l_suppkey AS sat_id
  FROM lineitem
),
img AS (
  SELECT fkey AS key,
    'img-' || CAST(fkey AS VARCHAR) AS image_id,
    sat_id,
    TIMESTAMP '{spec.TIME_EPOCH}'
      + to_hours({_mix(f'(fkey % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) AS time_acquired,
    {_mix(f'(fkey % {M})', spec.ST_LON)} % {spec.LON_SPAN_MD} AS lon_md,
    {_mix(f'(fkey % {M})', spec.ST_LAT)} % {spec.LAT_SPAN_MD} AS lat_md,
    {spec.HW_MIN_MD} + {_mix(f'(fkey % {M})', spec.ST_HW)} % {spec.HW_MOD} AS hw_md,
    ({_mix(f'(fkey % {M})', spec.ST_CLOUD)} % 1001)/1000.0 AS cloud_cover,
    CAST({_mix(f'(fkey % {M})', spec.ST_CLEAR)} % 101 AS DOUBLE) AS clear_confidence_percent,
    CAST({spec.IMG_WH_MIN} + {_mix(f'(fkey % {M})', spec.ST_W)} % {spec.IMG_WH_MOD} AS INT) AS w,
    CAST({spec.IMG_WH_MIN} + {_mix(f'(fkey % {M})', spec.ST_H)} % {spec.IMG_WH_MOD} AS INT) AS h,
    CASE WHEN fkey % {spec.LOSSY_EVERY_MOD} >= 8 THEN 'qraw8' ELSE 'raw8' END AS fmt,
    xor({_raw_phash('okey')}, (1::BIGINT << (fkey % 62))) AS phash,
    'img-' || CAST(fkey AS VARCHAR) || '-'
      || chr(CAST(65 + {_mix(f'(fkey % {M})', spec.ST_CAP1)} % 26 AS INT))
      || chr(CAST(65 + {_mix(f'(fkey % {M})', spec.ST_CAP2)} % 26 AS INT)) AS caption
  FROM img_raw
),
images AS (
  SELECT *,
    lon_md/1000.0 - {spec.LON_OFF} AS centroid_lon,
    lat_md/1000.0 - {spec.LAT_OFF} AS centroid_lat,
    (lon_md - hw_md)/1000.0 - {spec.LON_OFF} AS x0,
    (lon_md + hw_md)/1000.0 - {spec.LON_OFF} AS x1,
    (lat_md - hw_md)/1000.0 - {spec.LAT_OFF} AS y0,
    (lat_md + hw_md)/1000.0 - {spec.LAT_OFF} AS y1,
    ((2*hw_md)/1000.0) * ((2*hw_md)/1000.0) * {spec.KM2_PER_DEG2} AS area_sqkm
  FROM img
)
"""

# page stream with synthetic duplicates (pre-dedup view)
PAGES_CTE = (
    IMAGES_CTE
    + f""",
pages AS (
  SELECT image_id, key, clear_confidence_percent, 0::BIGINT AS page_idx FROM images
  UNION ALL
  SELECT image_id, key, clear_confidence_percent + 1.0, 1::BIGINT
  FROM images WHERE key % {spec.DUP_EVERY} = 0
)
"""
)

LAND_COVER_CTE = f"""
land_cover AS (
  SELECT p_partkey AS lc_id,
    CASE p_partkey % 5
      WHEN 0 THEN 'Urban area' WHEN 1 THEN 'River' WHEN 2 THEN 'Lake'
      WHEN 3 THEN 'Forest' ELSE 'Cropland' END AS featureclass,
    (({_mix('p_partkey', spec.ST_LC_CELL)} % {spec.LC_NX * spec.LC_NY}) % {spec.LC_NX})
        * {spec.LC_GRID_DEG * 1000} - 170000 AS x0_base,
    (({_mix('p_partkey', spec.ST_LC_CELL)} % {spec.LC_NX * spec.LC_NY}) // {spec.LC_NX})
        * {spec.LC_GRID_DEG * 1000} - 66000 AS y0_base,
    {_mix('p_partkey', spec.ST_LC_MX0)} % {spec.LC_MARGIN_MOD} AS mx0,
    {_mix('p_partkey', spec.ST_LC_MX1)} % {spec.LC_MARGIN_MOD} AS mx1,
    {_mix('p_partkey', spec.ST_LC_MY0)} % {spec.LC_MARGIN_MOD} AS my0,
    {_mix('p_partkey', spec.ST_LC_MY1)} % {spec.LC_MARGIN_MOD} AS my1
  FROM part
),
lc AS (
  SELECT lc_id, featureclass,
    (x0_base + mx0)/1000.0 AS x0,
    (x0_base + 4000 - mx1)/1000.0 AS x1,
    (y0_base + my0)/1000.0 AS y0,
    (y0_base + 4000 - my1)/1000.0 AS y1
  FROM land_cover
)
"""

# Non-rectangular zone layer: right triangles (half of a hashed rect,
# 4 orientations).  Box–triangle intersection is analytic: given bbox
# overlap, clamp the extremal corner of the box into the rect and test
# the hypotenuse half-plane there (exact for closed regions).
ZONES_CTE = f"""
zones_raw AS (
  SELECT p_partkey AS zone_id,
    (({_mix('p_partkey', spec.ST_ZN_CELL)} % {spec.LC_NX * spec.LC_NY}) % {spec.LC_NX})
        * {spec.LC_GRID_DEG * 1000} - 170000 AS x0_base,
    (({_mix('p_partkey', spec.ST_ZN_CELL)} % {spec.LC_NX * spec.LC_NY}) // {spec.LC_NX})
        * {spec.LC_GRID_DEG * 1000} - 66000 AS y0_base,
    {_mix('p_partkey', spec.ST_ZN_MX0)} % {spec.LC_MARGIN_MOD} AS mx0,
    {_mix('p_partkey', spec.ST_ZN_MX1)} % {spec.LC_MARGIN_MOD} AS mx1,
    {_mix('p_partkey', spec.ST_ZN_MY0)} % {spec.LC_MARGIN_MOD} AS my0,
    {_mix('p_partkey', spec.ST_ZN_MY1)} % {spec.LC_MARGIN_MOD} AS my1,
    {_mix('p_partkey', spec.ST_ZN_OR)} % 4 AS orient
  FROM part
),
zones AS (
  SELECT zone_id, orient,
    CASE zone_id % 4 WHEN 0 THEN 'Residential' WHEN 1 THEN 'Industrial'
      WHEN 2 THEN 'Agricultural' ELSE 'Protected' END AS zone_class,
    (x0_base + mx0)/1000.0 AS x0,
    (x0_base + 4000 - mx1)/1000.0 AS x1,
    (y0_base + my0)/1000.0 AS y0,
    (y0_base + 4000 - my1)/1000.0 AS y1
  FROM zones_raw
)
"""

# image box i vs zone triangle z: bbox overlap + half-plane corner test.
#
# Boundary-tie note: lattice coordinates make exact box-corner-on-
# hypotenuse configurations common (~3% of candidate pairs), and this
# SQL decides them with multiply-compare while the engine's ring kernel
# uses crossing counts + Liang-Barsky.  Both sides are boundary-
# INCLUSIVE (closed regions), so every exact-touch agrees in exact
# arithmetic, and the tie corners in this corpus co-occur with
# positive-area overlap (verified bit-exact through sf0.1 candidate
# volumes).  If a future layer makes touch-ONLY pairs likely, mirror
# the half-plane products in the engine for that layer.
ZONE_INTERSECTS = """
  i.x0 <= z.x1 AND z.x0 <= i.x1 AND i.y0 <= z.y1 AND z.y0 <= i.y1
  AND CASE z.orient
    WHEN 0 THEN (greatest(i.x0, z.x0) - z.x0)*(z.y1 - z.y0)
              + (greatest(i.y0, z.y0) - z.y0)*(z.x1 - z.x0)
             <= (z.x1 - z.x0)*(z.y1 - z.y0)
    WHEN 1 THEN (greatest(i.y0, z.y0) - z.y0)*(z.x1 - z.x0)
             <= (least(i.x1, z.x1) - z.x0)*(z.y1 - z.y0)
    WHEN 2 THEN (least(i.x1, z.x1) - z.x0)*(z.y1 - z.y0)
              + (least(i.y1, z.y1) - z.y0)*(z.x1 - z.x0)
             >= (z.x1 - z.x0)*(z.y1 - z.y0)
    ELSE        (least(i.y1, z.y1) - z.y0)*(z.x1 - z.x0)
             >= (greatest(i.x0, z.x0) - z.x0)*(z.y1 - z.y0)
  END
"""

# Multi-part zone layer (two rect parts per zone, corpus derive_mzones):
# intersection with a box is the OR of two inclusive bbox overlaps, so
# the any-part MULTIPOLYGON refinement is SQL-expressible exactly.
MZONES_CTE = f"""
mzones_raw AS (
  SELECT p_partkey AS mzone_id,
    (({_mix('p_partkey', spec.ST_MZ_CELL)} % {spec.LC_NX * spec.LC_NY}) % {spec.LC_NX})
        * {spec.LC_GRID_DEG * 1000} - 170000 AS x0_base,
    (({_mix('p_partkey', spec.ST_MZ_CELL)} % {spec.LC_NX * spec.LC_NY}) // {spec.LC_NX})
        * {spec.LC_GRID_DEG * 1000} - 66000 AS y0_base
  FROM part
),
mzones AS (
  SELECT mzone_id,
    CASE mzone_id % 4 WHEN 0 THEN 'Residential' WHEN 1 THEN 'Industrial'
      WHEN 2 THEN 'Agricultural' ELSE 'Protected' END AS zone_class,
    (x0_base + {_mix('mzone_id', spec.ST_MZ_AX0)} % {spec.MZ_MARGIN_MOD})/1000.0 AS ax0,
    (x0_base + 2000 - {_mix('mzone_id', spec.ST_MZ_AX1)} % {spec.MZ_MARGIN_MOD})/1000.0 AS ax1,
    (y0_base + {_mix('mzone_id', spec.ST_MZ_AY0)} % {spec.MZ_MARGIN_MOD})/1000.0 AS ay0,
    (y0_base + 4000 - {_mix('mzone_id', spec.ST_MZ_AY1)} % {spec.MZ_MARGIN_MOD})/1000.0 AS ay1,
    (x0_base + 2000 + {_mix('mzone_id', spec.ST_MZ_BX0)} % {spec.MZ_MARGIN_MOD})/1000.0 AS bx0,
    (x0_base + 4000 - {_mix('mzone_id', spec.ST_MZ_BX1)} % {spec.MZ_MARGIN_MOD})/1000.0 AS bx1,
    (y0_base + {_mix('mzone_id', spec.ST_MZ_BY0)} % {spec.MZ_MARGIN_MOD})/1000.0 AS by0,
    (y0_base + 4000 - {_mix('mzone_id', spec.ST_MZ_BY1)} % {spec.MZ_MARGIN_MOD})/1000.0 AS by1
  FROM mzones_raw
)
"""

MZONE_INTERSECTS = """
  ((i.x0 <= z.ax1 AND z.ax0 <= i.x1 AND i.y0 <= z.ay1 AND z.ay0 <= i.y1)
   OR (i.x0 <= z.bx1 AND z.bx0 <= i.x1 AND i.y0 <= z.by1 AND z.by0 <= i.y1))
"""

# Rotated-quad probe footprints (corpus derive_rot_footprints): the
# image square rotated about its centroid by an exact-rational angle
# class.  Intersection with a convex target is decided by SAT
# (separating axes = both shapes' edge normals) with inclusive
# comparisons — boundary-inclusive like the engine's crossing/
# containment kernels, so exact-touch pairs agree in exact arithmetic.
# The c/s literals are Python float reprs, so DuckDB parses the SAME
# doubles numpy uses; hw/e1 mirror the engine's expression order.
_ROT_COS_CASE = "CASE rot " + " ".join(
    f"WHEN {k} THEN {spec.ROT_COS[k]!r}" for k in range(4)
) + " END"
_ROT_SIN_CASE = "CASE rot " + " ".join(
    f"WHEN {k} THEN {spec.ROT_SIN[k]!r}" for k in range(4)
) + " END"

ROT_CTE = f"""
rotf AS (
  SELECT image_id, centroid_lon AS cx, centroid_lat AS cy,
    hw_md/1000.0 AS hw,
    {_mix(f'(key % {M})', spec.ST_ROT)} % 4 AS rot
  FROM images
),
rotq AS (
  SELECT image_id, cx, cy, hw, rot,
    {_ROT_COS_CASE} AS c, {_ROT_SIN_CASE} AS s
  FROM rotf
),
rquad AS (
  SELECT *, hw*c + hw*s AS e1 FROM rotq
)
"""


def _rot_rect_sat(zx0: str, zy0: str, zx1: str, zy1: str) -> str:
    """SAT predicate: rotated quad r (rquad row) vs axis-aligned rect
    [zx0,zx1]x[zy0,zy1].  Axes: x, y (rect normals; quad projection =
    center +- e1 since c,s >= 0), quad normal u=(c,s) and v=(-s,c)
    (quad projection = center-dot +- hw; rect extremes picked by
    coefficient sign)."""
    return f"""(
  r.cx - r.e1 <= {zx1} AND {zx0} <= r.cx + r.e1
  AND r.cy - r.e1 <= {zy1} AND {zy0} <= r.cy + r.e1
  AND r.cx*r.c + r.cy*r.s - r.hw <= {zx1}*r.c + {zy1}*r.s
  AND {zx0}*r.c + {zy0}*r.s <= r.cx*r.c + r.cy*r.s + r.hw
  AND r.cy*r.c - r.cx*r.s - r.hw <= {zy1}*r.c - {zx0}*r.s
  AND {zy0}*r.c - {zx1}*r.s <= r.cy*r.c - r.cx*r.s + r.hw
)"""


# triangle-zone SAT support: per-zone vertex + hypotenuse-normal columns
# (vertices mirror corpus derive_zones corners per orient)
TRI_CTE = """
tri AS (
  SELECT zone_id, zone_class, orient, x0, x1, y0, y1,
    CASE WHEN orient = 2 THEN x1 ELSE x0 END AS v1x, y0 AS v1y,
    x1 AS v2x, CASE WHEN orient <= 1 THEN y0 ELSE y1 END AS v2y,
    CASE WHEN orient = 1 THEN x1 ELSE x0 END AS v3x, y1 AS v3y,
    (y1 - y0) AS nx,
    CASE WHEN orient IN (0, 2) THEN (x1 - x0) ELSE -(x1 - x0) END AS ny
  FROM zones
)
"""

# rotated quad r vs triangle z (tri row): SAT over 5 axes — x, y
# (triangle bbox = its base rect), quad normals u/v (projections of the
# 3 vertices), hypotenuse normal n (quad half-extent via |n.u|+|n.v|).
ROT_TRI_SAT = """(
  r.cx - r.e1 <= z.x1 AND z.x0 <= r.cx + r.e1
  AND r.cy - r.e1 <= z.y1 AND z.y0 <= r.cy + r.e1
  AND r.cx*r.c + r.cy*r.s - r.hw
      <= greatest(z.v1x*r.c + z.v1y*r.s, z.v2x*r.c + z.v2y*r.s, z.v3x*r.c + z.v3y*r.s)
  AND least(z.v1x*r.c + z.v1y*r.s, z.v2x*r.c + z.v2y*r.s, z.v3x*r.c + z.v3y*r.s)
      <= r.cx*r.c + r.cy*r.s + r.hw
  AND r.cy*r.c - r.cx*r.s - r.hw
      <= greatest(z.v1y*r.c - z.v1x*r.s, z.v2y*r.c - z.v2x*r.s, z.v3y*r.c - z.v3x*r.s)
  AND least(z.v1y*r.c - z.v1x*r.s, z.v2y*r.c - z.v2x*r.s, z.v3y*r.c - z.v3x*r.s)
      <= r.cy*r.c - r.cx*r.s + r.hw
  AND r.cx*z.nx + r.cy*z.ny - (r.hw*abs(r.c*z.nx + r.s*z.ny) + r.hw*abs(r.c*z.ny - r.s*z.nx))
      <= greatest(z.v1x*z.nx + z.v1y*z.ny, z.v2x*z.nx + z.v2y*z.ny, z.v3x*z.nx + z.v3y*z.ny)
  AND least(z.v1x*z.nx + z.v1y*z.ny, z.v2x*z.nx + z.v2y*z.ny, z.v3x*z.nx + z.v3y*z.ny)
      <= r.cx*z.nx + r.cy*z.ny + (r.hw*abs(r.c*z.nx + r.s*z.ny) + r.hw*abs(r.c*z.ny - r.s*z.nx))
)"""


CITIES_CTE = f"""
cities AS (
  SELECT c_custkey AS city_id, c_name AS city_name,
    n_name AS country_iso,
    ({_mix('c_custkey', spec.ST_CITY_LON)} % {spec.LON_SPAN_MD})/1000.0 - {spec.LON_OFF} AS lon,
    ({_mix('c_custkey', spec.ST_CITY_LAT)} % {spec.LAT_SPAN_MD})/1000.0 - {spec.LAT_OFF} AS lat,
    {spec.CITY_RADIUS_DEG} AS radius
  FROM customer JOIN nation ON c_nationkey = n_nationkey
)
"""

COUNTRIES_CTE = f"""
countries AS (
  SELECT n_name AS iso,
    ((n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} - 170000)/1000.0 AS x0,
    ((n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} - 170000 + {spec.CTRY_W_MD})/1000.0 AS x1,
    ((n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} - 66000)/1000.0 AS y0,
    ((n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} - 66000 + {spec.CTRY_H_MD})/1000.0 AS y1
  FROM nation
)
"""

# image -> fine tile (0.25 deg) covering, exploded
TILES_CTE = f"""
img_tiles AS (
  SELECT i.image_id, i.key, i.w, i.h,
         (tx.v + 2) * {spec.TILE_STRIDE} + (ty.v + 2) AS tile_id
  FROM images i,
  LATERAL (SELECT unnest(generate_series(
      CAST(floor((i.x0 + {spec.LON_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT),
      CAST(floor((i.x1 + {spec.LON_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT))) AS v) tx,
  LATERAL (SELECT unnest(generate_series(
      CAST(floor((i.y0 + {spec.LAT_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT),
      CAST(floor((i.y1 + {spec.LAT_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT))) AS v) ty
)
"""

LC_TILES_CTE = f"""
lc_tiles AS (
  SELECT l.lc_id, l.featureclass,
         (tx.v + 2) * {spec.TILE_STRIDE} + (ty.v + 2) AS tile_id
  FROM lc l,
  LATERAL (SELECT unnest(generate_series(
      CAST(floor((l.x0 + {spec.LON_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT),
      CAST(floor((l.x1 + {spec.LON_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT))) AS v) tx,
  LATERAL (SELECT unnest(generate_series(
      CAST(floor((l.y0 + {spec.LAT_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT),
      CAST(floor((l.y1 + {spec.LAT_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT))) AS v) ty
)
"""


# --- generated mirrors of the text-sketch kernels --------------------------
#
# The SimHash and MinHash-LSH kernels (stages/text.py) are pure integer
# pipelines — FNV-1a over 5-byte shingle windows, (a*x+b) mod 2^61-1
# permutations, FNV band mixing — so they are SQL-expressible with
# HUGEINT wraparound emulation (% 2^64 after each multiply).  These
# builders emit the SAME arithmetic in the SAME order; the only float in
# either output is one division by 64 (exact, power of two).

_FNV_OFF_I = 0xCBF29CE484222325
_FNV_PRIME_I = 0x100000001B3
_M64 = 1 << 64
_P61 = (1 << 61) - 1


def _fnv_shingle(tcol: str, icol: str) -> str:
    """Nested-expression FNV-1a of the SHINGLE_K bytes at position icol."""
    h = f"CAST({_FNV_OFF_I} AS HUGEINT)"
    for j in range(spec.SHINGLE_K):
        byte = f"ascii(substring({tcol}, {icol}+{j}, 1))"
        h = f"((xor({h}, {byte}) * {_FNV_PRIME_I}) % {_M64})"
    return h


# shared window CTE: docs shorter than SHINGLE_K bytes are space-padded,
# mirroring the engine's short-doc fallback (corpus is ASCII, so char
# positions == byte positions)
_WIN_CTE = f"""
padded AS (
  SELECT doc_id, rpad(text, CAST(greatest(length(text), {spec.SHINGLE_K}) AS INT), ' ') AS t
  FROM documents
),
win AS (
  SELECT doc_id, CAST(g.i AS INT) AS i, t
  FROM padded,
       LATERAL (SELECT unnest(generate_series(1, length(t) - {spec.SHINGLE_K - 1})) AS i) g
)"""


def _simhash_sql() -> str:
    votes = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE 0 END) AS c{j}"
        for j in range(63)
    )
    val = " + ".join(
        f"(CASE WHEN 2*c{j} - n > 0 THEN CAST({1 << j} AS HUGEINT) ELSE 0 END)"
        for j in range(63)
    )
    return f"""
WITH {_WIN_CTE},
hashes AS (
  SELECT DISTINCT doc_id, {_fnv_shingle('t', 'i')} AS h FROM win
),
votes AS (
  SELECT doc_id, COUNT(*) AS n,
    {votes}
  FROM hashes GROUP BY doc_id
)
SELECT doc_id, CAST({val} AS BIGINT) AS simhash FROM votes
"""


def _mh_band_key(b: int, rpb: int) -> str:
    h = f"CAST({_FNV_OFF_I} AS HUGEINT)"
    for j in range(b * rpb, (b + 1) * rpb):
        v = f"s{j}"
        h = f"((xor({h}, {v} & 255) * {_FNV_PRIME_I}) % {_M64})"
        h = f"((xor({h}, ({v} >> 8) & 65535) * {_FNV_PRIME_I}) % {_M64})"
        h = f"((xor({h}, {v} >> 24) * {_FNV_PRIME_I}) % {_M64})"
    return f"(CAST({b << 58} AS HUGEINT) | ({h} >> 6))"


def _minhash_sql() -> str:
    # the permutation constants live next to the kernel; import here to
    # keep oracle.py a pure mirror of a single source of truth
    from .stages.text import _MH_A, _MH_B

    perms, bands = spec.MINHASH_PERMS, spec.MINHASH_BANDS
    rpb = perms // bands
    mins = ",\n    ".join(
        f"MIN((h32 * {int(_MH_A[i])} + {int(_MH_B[i])}) % {_P61}) AS s{i}"
        for i in range(perms)
    )
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {_mh_band_key(b, rpb)} AS key FROM sig"
        for b in range(bands)
    )
    eqc = " + ".join(
        f"(CASE WHEN x.s{j} = y.s{j} THEN 1 ELSE 0 END)" for j in range(perms)
    )
    bcs = ",\n    ".join(
        "("
        + " + ".join(
            f"(CASE WHEN x.s{j} = y.s{j} THEN 1 ELSE 0 END)"
            for j in range(b * rpb, (b + 1) * rpb)
        )
        + f") AS bc{b}"
        for b in range(bands - 1)
    )
    # a pair is emitted only at its LOWEST band whose 8 slots all match
    # (the engine's lowest-band dedup); candidate generation is band-KEY
    # equality, exactly like the engine's bucket membership
    prior = " OR ".join(f"(band > {b} AND bc{b} = {rpb})" for b in range(bands - 1))
    thr = math.ceil(spec.MINHASH_JACCARD_MIN * perms)  # engine's eqc bound
    return f"""
WITH {_WIN_CTE},
hwin AS (
  SELECT doc_id, ({_fnv_shingle('t', 'i')}) & 4294967295 AS h32 FROM win
),
sig AS (
  SELECT doc_id,
    {mins}
  FROM hwin GROUP BY doc_id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band AS band
  FROM bands a JOIN bands b ON a.key = b.key AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b, c.band,
    ({eqc}) AS eqc,
    {bcs}
  FROM cand c
  JOIN sig x ON c.doc_a = x.doc_id
  JOIN sig y ON c.doc_b = y.doc_id
)
SELECT doc_a, doc_b, CAST(eqc AS DOUBLE) / {perms} AS est_jaccard
FROM scored
WHERE eqc >= {thr} AND NOT ({prior})
"""


# --- integer-md^2 slab sweep (exact rectangle-union area in SQL) -----------
#
# The exact-geometry queries accumulate union areas as INTEGER squared
# milli-degrees; the mirror is the classic vertical-slab sweep written
# with window functions: distinct x bounds -> slabs -> per-slab merged
# y-interval lengths -> SUM((hi-lo)*(xr-xl)).  All integer arithmetic,
# so the only float op on either side is the final KM2_PER_MD2 multiply.


def _slab_union_cte(src_cte: str, out: str) -> str:
    """CTE chain computing per-featureclass exact union area (int md^2)
    of the integer rects in ``src_cte(featureclass, x0, x1, y0, y1)``."""
    return f"""
{out}_xs AS (
  SELECT DISTINCT featureclass, x FROM (
    SELECT featureclass, x0 AS x FROM {src_cte}
    UNION ALL SELECT featureclass, x1 FROM {src_cte})
),
{out}_slabs AS (
  SELECT featureclass, x AS xl,
         LEAD(x) OVER (PARTITION BY featureclass ORDER BY x) AS xr
  FROM {out}_xs
),
{out}_cover AS (
  -- DISTINCT is load-bearing: duplicate (y0, y1) intervals in a slab
  -- (e.g. the tiny-sf duplicate image key) create ORDER BY ties, and
  -- the MAX and SUM windows may order ties differently, splitting the
  -- duplicates into separate merge groups and double-counting them
  SELECT DISTINCT s.featureclass, s.xl, s.xr, r.y0, r.y1
  FROM {out}_slabs s JOIN {src_cte} r
    ON r.featureclass = s.featureclass AND r.x0 < s.xr AND r.x1 > s.xl
  WHERE s.xr IS NOT NULL
),
{out}_runs AS (
  SELECT featureclass, xl, xr, y0, y1,
         MAX(y1) OVER (PARTITION BY featureclass, xl ORDER BY y0, y1
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM {out}_cover
),
{out}_grps AS (
  SELECT featureclass, xl, xr, y0, y1,
         SUM(CASE WHEN pmax IS NULL OR y0 > pmax THEN 1 ELSE 0 END)
           OVER (PARTITION BY featureclass, xl ORDER BY y0, y1
                 ROWS UNBOUNDED PRECEDING) AS grp
  FROM {out}_runs
),
{out}_segs AS (
  SELECT featureclass, xl, xr, grp, MIN(y0) AS lo, MAX(y1) AS hi
  FROM {out}_grps GROUP BY featureclass, xl, xr, grp
),
{out} AS (
  SELECT featureclass, CAST(SUM((hi - lo) * (xr - xl)) AS BIGINT) AS md2
  FROM {out}_segs GROUP BY featureclass
)"""


# integer-md rectangle views of the layers (same coordinate frame as the
# engine: md = 1000 * deg value)
_LCMD_CTE = """
lcmd AS (
  SELECT featureclass,
         x0_base + mx0 AS x0, x0_base + 4000 - mx1 AS x1,
         y0_base + my0 AS y0, y0_base + 4000 - my1 AS y1
  FROM land_cover
)"""

_IMD_CTE = f"""
imd AS (
  SELECT lon_md - hw_md - {int(spec.LON_OFF * 1000)} AS x0,
         lon_md + hw_md - {int(spec.LON_OFF * 1000)} AS x1,
         lat_md - hw_md - {int(spec.LAT_OFF * 1000)} AS y0,
         lat_md + hw_md - {int(spec.LAT_OFF * 1000)} AS y1
  FROM img
)"""


# phash near-dup pair CTEs (imgs/bands/prs) — the shared edge set of
# every phash graph oracle (closure, pagerank, triangles)
_PHASH_PRS_CTES = f"""imgs AS (
  WITH {IMAGES_CTE}
  SELECT * FROM images
),
bands AS (
  SELECT key, phash, b.v AS band_idx,
         (phash >> (16 * b.v)) & 65535 AS band_val
  FROM imgs, LATERAL (SELECT unnest(generate_series(0, {spec.PHASH_BANDS - 1})) AS v) b
),
prs AS MATERIALIZED (
  SELECT DISTINCT a.key AS ka, b.key AS kb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.key < b.key
  WHERE bit_count(xor(a.phash, b.phash)) <= {spec.PHASH_HAMMING_MAX}
)"""


def _phash_closure_cte() -> str:
    """Shared WITH-RECURSIVE prefix: phash near-dup pairs -> transitive
    closure (imgs/bands/prs/edges/nodes/reach CTEs).  Callers append
    their own final CTEs/SELECT."""
    return f"""WITH RECURSIVE {_PHASH_PRS_CTES},
edges AS MATERIALIZED (
  SELECT ka AS s, kb AS d FROM prs UNION ALL SELECT kb, ka FROM prs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, r.label FROM edges e JOIN reach r ON r.node = e.s
)"""


def _minhash_closure_cte() -> str:
    """Shared WITH-RECURSIVE prefix over the minhash pairs at
    est_jaccard >= 0.5 (prs/edges/nodes/reach CTEs)."""
    return f"""WITH RECURSIVE prs AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_minhash_sql()}) mh WHERE mh.est_jaccard >= 0.5
),
edges AS MATERIALIZED (
  SELECT doc_a AS s, doc_b AS d FROM prs UNION ALL SELECT doc_b, doc_a FROM prs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, r.label FROM edges e JOIN reach r ON r.node = e.s
)"""


def oracle_queries() -> dict[str, str]:
    q: dict[str, str] = {}

    # DISTINCT: at tiny sf the 4-int key can collide; colliding rows are
    # bit-identical, and the engine side dedups by image_id (D1).
    q["images_metadata"] = f"""
WITH {IMAGES_CTE}
SELECT DISTINCT image_id, sat_id, cloud_cover, clear_confidence_percent,
       time_acquired, centroid_lon, centroid_lat, area_sqkm,
       w, h, fmt, phash, caption
FROM images
"""

    # S11 incremental re-import: existing store (key % 3 <> 0) wins every
    # conflict (ord -1 beats every incoming page_idx >= 0); new ids come
    # from the incoming page stream with first-page-wins semantics.
    q["incremental_import"] = f"""
WITH {PAGES_CTE},
prior AS (
  SELECT image_id, clear_confidence_percent,
         0::BIGINT AS src, -1::BIGINT AS ord
  FROM images WHERE key % 3 <> 0
),
incoming AS (
  SELECT image_id, clear_confidence_percent,
         1::BIGINT AS src, page_idx AS ord
  FROM pages
),
u AS (SELECT * FROM prior UNION ALL SELECT * FROM incoming),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY image_id ORDER BY ord, src) AS rn
  FROM u
)
SELECT image_id, src, clear_confidence_percent FROM r WHERE rn = 1
"""

    # deterministic hash split; no DISTINCT on either side — key-collision
    # duplicate rows are bit-identical and appear with equal multiplicity
    q["dataset_split"] = f"""
WITH {IMAGES_CTE}
SELECT image_id,
       CASE WHEN b < {spec.SPLIT_TRAIN_PCT} THEN 'train'
            WHEN b < {spec.SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM (SELECT image_id, {_mix(f'(key % {M})', spec.ST_SPLIT)} % 100 AS b FROM images)
"""

    # deterministic per-group sample: k smallest (hash, key) per satellite
    q["sample_per_satellite"] = f"""
WITH {IMAGES_CTE},
b AS (
  SELECT image_id, key, sat_id,
         {_mix(f'(key % {M})', spec.ST_SAMPLE)} AS bucket
  FROM images
)
SELECT image_id, sat_id FROM (
  SELECT image_id, sat_id,
         ROW_NUMBER() OVER (PARTITION BY sat_id ORDER BY bucket, key) AS rn
  FROM b
) WHERE rn <= {spec.SAMPLE_K}
"""

    # exact per-satellite quantiles (cloud_cover is discrete: mix % 1001
    # / 1000, so histogram-merge quantiles are exact; quantile_disc =
    # 1-based index ceil(q*n), mirrored in integer math engine-side)
    q["sat_cloud_quantiles"] = f"""
WITH {IMAGES_CTE}
SELECT sat_id, COUNT(*) AS n_images,
       quantile_disc(cloud_cover, 0.5) AS median_cloud,
       quantile_disc(cloud_cover, 0.9) AS p90_cloud
FROM images
GROUP BY sat_id
"""

    q["dedup_audit"] = f"""
WITH {PAGES_CTE}
SELECT image_id,
       COUNT(*) AS n_copies,
       MIN(page_idx) AS winner_page,
       MIN(clear_confidence_percent) AS winner_clear
FROM pages
GROUP BY image_id
HAVING COUNT(*) > 1
"""

    q["filter_images"] = f"""
WITH {IMAGES_CTE}
SELECT image_id, sat_id, cloud_cover, time_acquired
FROM images
WHERE cloud_cover <= {spec.FILTER_MAX_CLOUD}
  AND time_acquired >= TIMESTAMP '{spec.FILTER_DATE_LO}'
  AND time_acquired <= TIMESTAMP '{spec.FILTER_DATE_HI}'
  AND sat_id % {spec.FILTER_SAT_MOD} = {spec.FILTER_SAT_REM}
"""

    q["count_per_satellite"] = f"""
WITH {IMAGES_CTE}
SELECT s.s_name AS sat_name, COUNT(*) AS total_images
FROM images i JOIN supplier s ON i.sat_id = s.s_suppkey
GROUP BY s.s_name
"""

    # J1 full projection incl. the satellite's pixel_res attribute
    q["images_with_satellite"] = f"""
WITH {IMAGES_CTE}
SELECT i.image_id, i.sat_id, s.s_name AS sat_name,
       ({_mix('s.s_suppkey', spec.ST_PXRES)} % 46 + 5)/10.0 AS pixel_res
FROM images i JOIN supplier s ON i.sat_id = s.s_suppkey
"""

    # S1 paged live-source: quick-search filters + dict last-wins
    # id-dedup — the winner of a duplicated key is always the bumped
    # re-return (page p+1 > p), so the dedup is key-expressible
    # DISTINCT mirrors the id-dedup for the sf0.001 duplicate lineitem
    # key: its two derived rows are identical, so last-wins == distinct
    q["paged_search_images"] = f"""
WITH {IMAGES_CTE}
SELECT DISTINCT image_id,
  'it-' || CAST(key % {spec.ITEM_TYPE_MOD} AS VARCHAR) AS item_type_id,
  cloud_cover,
  CASE WHEN key % {spec.DUP_EVERY} = 0
       THEN clear_confidence_percent + 1.0
       ELSE clear_confidence_percent END AS clear_confidence_percent,
  time_acquired
FROM images
WHERE cloud_cover <= {spec.PAGED_MAX_CLOUD}
  AND time_acquired >= TIMESTAMP '{spec.PAGED_DATE_LO}'
  AND time_acquired <= TIMESTAMP '{spec.PAGED_DATE_HI}'
  AND 'it-' || CAST(key % {spec.ITEM_TYPE_MOD} AS VARCHAR)
      IN {tuple(spec.PAGED_ITEM_TYPES)!r}
"""

    # M10 GeoJSON Feature string, byte-exact vs json.dumps(sort_keys=True):
    # DuckDB and CPython both print doubles as shortest-roundtrip decimals
    # (verified over every corpus hw/cloud/pixel_res domain value), keys
    # are emitted in sorted order by hand, and ROUND(area,3) was checked
    # exhaustively over the 150-value hw domain against Python round().
    q["geojson_export"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
lcc AS (
  SELECT key, '[' || string_agg(fq, ', ' ORDER BY fq) || ']' AS lc_json
  FROM (
    SELECT DISTINCT i.key AS key, '"' || l.featureclass || '"' AS fq
    FROM images i JOIN lc l
      ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
  ) GROUP BY key
)
SELECT i.image_id,
  '{{"geometry": {{"coordinates": [[['
  || i.x0 || ', ' || i.y0 || '], [' || i.x1 || ', ' || i.y0 || '], ['
  || i.x1 || ', ' || i.y1 || '], [' || i.x0 || ', ' || i.y1 || '], ['
  || i.x0 || ', ' || i.y0 || ']]], "type": "Polygon"}}, "id": "' || i.image_id
  || '", "properties": {{"area_sqkm": ' || ROUND(i.area_sqkm, 3)
  || ', "asset_types": ["analytic"'
  || CASE WHEN ({_mix(f'(i.key % {M})', spec.ST_ASSET)} >> 1) % 2 = 1
       THEN ', "visual"' ELSE '' END
  || CASE WHEN ({_mix(f'(i.key % {M})', spec.ST_ASSET)} >> 2) % 2 = 1
       THEN ', "udm"' ELSE '' END
  || '], "cloud_cover": ' || i.cloud_cover
  || ', "id": "' || i.image_id
  || '", "item_type_id": "it-' || (i.key % {spec.ITEM_TYPE_MOD})
  || '", "land_cover_class": ' || COALESCE(c.lc_json, '[]')
  || ', "pixel_res": ' || ({_mix('s.s_suppkey', spec.ST_PXRES)} % 46 + 5)/10.0
  || ', "sat_id": ' || i.sat_id
  || ', "sat_name": "' || s.s_name
  || '", "srid": 4326, "time_acquired": "' || strftime(i.time_acquired, '%Y-%m-%d')
  || '"}}, "type": "Feature"}}' AS feature
FROM images i
JOIN supplier s ON i.sat_id = s.s_suppkey
LEFT JOIN lcc c ON i.key = c.key
"""

    q["spatial_join_landcover"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}
SELECT i.image_id, l.lc_id
FROM images i JOIN lc l
  ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
"""

    q["count_per_landcover"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}
SELECT l.lc_id, l.featureclass, COUNT(i.image_id) AS total_images
FROM images i JOIN lc l
  ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
GROUP BY l.lc_id, l.featureclass
"""

    q["count_per_featureclass"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}
SELECT l.featureclass, COUNT(i.image_id) AS total_images
FROM images i JOIN lc l
  ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
GROUP BY l.featureclass
"""

    # circle(point,r) vs box intersects == clamped-distance <= r
    q["city_image_counts"] = f"""
WITH {IMAGES_CTE}, {CITIES_CTE}
SELECT c.city_id, c.city_name, COUNT(i.image_id) AS total_images
FROM cities c JOIN images i
  ON greatest(i.x0 - c.lon, c.lon - i.x1, 0) * greatest(i.x0 - c.lon, c.lon - i.x1, 0)
   + greatest(i.y0 - c.lat, c.lat - i.y1, 0) * greatest(i.y0 - c.lat, c.lat - i.y1, 0)
   <= c.radius * c.radius
GROUP BY c.city_id, c.city_name
"""

    q["country_image_counts"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE}
SELECT n.iso, COUNT(i.image_id) AS total_images
FROM countries n JOIN images i
  ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1
GROUP BY n.iso
"""

    q["knn_city_scenes"] = f"""
WITH {IMAGES_CTE}, {CITIES_CTE},
dists AS (
  SELECT c.city_id, i.image_id, i.key,
    (c.lon - i.centroid_lon)*(c.lon - i.centroid_lon)
    + (c.lat - i.centroid_lat)*(c.lat - i.centroid_lat) AS dist_sq
  FROM cities c CROSS JOIN images i
  WHERE c.city_id % {spec.KNN_CITY_MOD} = 0
),
ranked AS (
  SELECT city_id, image_id, dist_sq,
    row_number() OVER (PARTITION BY city_id ORDER BY dist_sq, key) AS rank
  FROM dists
)
SELECT city_id, image_id, dist_sq, rank FROM ranked WHERE rank <= {spec.KNN_K}
"""

    q["time_heatmap"] = f"""
WITH {IMAGES_CTE}
SELECT strftime(date_trunc('month', time_acquired), '%Y-%m') AS bucket,
       CAST(floor(centroid_lon) AS BIGINT) AS grid_lon,
       CAST(floor(centroid_lat) AS BIGINT) AS grid_lat,
       COUNT(*) AS total_images
FROM images
GROUP BY 1, 2, 3
"""

    # parameterized heatmap frequencies (reference Week/Day/Hour options)
    for freq, fmt in [
        ("week", "'%Y-%m-%d'"),
        ("day", "'%Y-%m-%d'"),
        ("hour", "'%Y-%m-%d %H'"),
        ("minute", "'%Y-%m-%d %H:%M'"),
    ]:
        q[f"time_heatmap_{freq}"] = f"""
WITH {IMAGES_CTE}
SELECT strftime(date_trunc('{freq}', time_acquired), {fmt}) AS bucket,
       CAST(floor(centroid_lon) AS BIGINT) AS grid_lon,
       CAST(floor(centroid_lat) AS BIGINT) AS grid_lat,
       COUNT(*) AS total_images
FROM images
GROUP BY 1, 2, 3
"""

    q["tile_assignment"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE}
SELECT image_id, tile_id FROM img_tiles
"""

    # deterministic uniform sample of the join result: k smallest pair
    # hashes (ties broken by key, lc_id — identical-row ties at the
    # boundary are value-identical on both sides)
    q["spatial_join_sample"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
pairs AS (
  SELECT i.key, l.lc_id
  FROM images i JOIN lc l
    ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
),
h AS (
  SELECT key, lc_id,
         {_mix(f'(((key % {M}) * 131071 + lc_id) % {M})', spec.ST_PAIR_SAMPLE)} AS hv
  FROM pairs
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY hv, key, lc_id) AS rn FROM h)
SELECT 'img-' || CAST(key AS VARCHAR) AS image_id, lc_id
FROM r WHERE rn <= {spec.JOIN_SAMPLE_K}
"""

    # weighted variant: priority = hash / area weight (identical double
    # division on both sides -> identical ordering)
    q["spatial_join_sample_weighted"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
pairs AS (
  SELECT i.key, l.lc_id, i.area_sqkm
  FROM images i JOIN lc l
    ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
),
h AS (
  SELECT key, lc_id,
         CAST({_mix(f'(((key % {M}) * 131071 + lc_id) % {M})', spec.ST_PAIR_SAMPLE)}
              AS DOUBLE) / area_sqkm AS pv
  FROM pairs
),
r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pv, key, lc_id) AS rn FROM h)
SELECT 'img-' || CAST(key AS VARCHAR) AS image_id, lc_id
FROM r WHERE rn <= {spec.JOIN_SAMPLE_K}
"""

    # nearest-facility attach: per-image argmin over the city points
    # (DISTINCT probe side mirrors the engine's first-wins dedup)
    q["image_nearest_city"] = f"""
WITH {IMAGES_CTE},
di AS (SELECT DISTINCT image_id, centroid_lon, centroid_lat FROM images),
cities AS (
  SELECT c_custkey AS city_id,
         ({_mix('c_custkey', spec.ST_CITY_LON)} % {spec.LON_SPAN_MD})/1000.0
           - {spec.LON_OFF} AS lon,
         ({_mix('c_custkey', spec.ST_CITY_LAT)} % {spec.LAT_SPAN_MD})/1000.0
           - {spec.LAT_OFF} AS lat
  FROM customer
),
d AS (
  SELECT i.image_id, c.city_id,
         (c.lon - i.centroid_lon) * (c.lon - i.centroid_lon)
       + (c.lat - i.centroid_lat) * (c.lat - i.centroid_lat) AS dist_sq
  FROM di i CROSS JOIN cities c
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY image_id ORDER BY dist_sq, city_id) AS rn
  FROM d
)
SELECT image_id, city_id, dist_sq FROM r WHERE rn = 1
"""

    # directional bias: compass octant of each image relative to its
    # nearest city (exact integer sign/magnitude tests on md deltas),
    # counted per the city's country.
    q["city_bearing_sectors"] = f"""
WITH nn AS ({q['image_nearest_city']}),
img AS (
  SELECT CAST(substr(nn.image_id, 5) AS BIGINT) AS fk, nn.city_id
  FROM nn),
geo AS (
  SELECT ({_mix(f'(fk % {M})', spec.ST_LON)} % {spec.LON_SPAN_MD}) AS ilon,
         ({_mix(f'(fk % {M})', spec.ST_LAT)} % {spec.LAT_SPAN_MD}) AS ilat,
         city_id
  FROM img),
ct AS (
  SELECT c_custkey AS city_id, n_name AS iso,
         ({_mix('c_custkey', spec.ST_CITY_LON)} % {spec.LON_SPAN_MD}) AS clon,
         ({_mix('c_custkey', spec.ST_CITY_LAT)} % {spec.LAT_SPAN_MD}) AS clat
  FROM customer JOIN nation ON n_nationkey = c_nationkey),
dxy AS (
  SELECT ct.iso, g.ilon - ct.clon AS dx, g.ilat - ct.clat AS dy
  FROM geo g JOIN ct ON ct.city_id = g.city_id)
SELECT iso AS country_iso,
  CASE WHEN dx >= 0 AND dy >= 0 THEN CASE WHEN dx > dy THEN 'ENE' ELSE 'NNE' END
       WHEN dx < 0 AND dy >= 0 THEN CASE WHEN -dx > dy THEN 'WNW' ELSE 'NNW' END
       WHEN dx < 0 AND dy < 0 THEN CASE WHEN -dx > -dy THEN 'WSW' ELSE 'SSW' END
       ELSE CASE WHEN dx > -dy THEN 'ESE' ELSE 'SSE' END END AS octant,
  COUNT(*)::BIGINT AS n_images
FROM dxy GROUP BY 1, 2
"""

    # mosaic compositing: per-tile argmin (cloud, key); cloud recomputed
    # from key (pure function) so no join back to images is needed
    q["tile_best_image"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
cand AS (
  SELECT tile_id, key,
         ({_mix(f'(key % {M})', spec.ST_CLOUD)} % 1001) AS cloud_mi
  FROM img_tiles
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY tile_id ORDER BY cloud_mi, key) AS rn
  FROM cand
)
SELECT tile_id, 'img-' || CAST(key AS VARCHAR) AS image_id,
       cloud_mi / 1000.0 AS cloud_cover
FROM r WHERE rn = 1
"""

    q["tile_manifest"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE}
SELECT tile_id, COUNT(*) AS n_images,
       CAST(SUM(CAST(w AS BIGINT) * CAST(h AS BIGINT)) AS BIGINT) AS total_bytes
FROM img_tiles
GROUP BY tile_id
"""

    q["dissolve_raster_area"] = f"""
WITH {LAND_COVER_CTE}, {LC_TILES_CTE}
SELECT featureclass, COUNT(DISTINCT tile_id) AS n_tiles,
       COUNT(DISTINCT tile_id) * {spec.TILE_AREA_SQKM} AS area_sqkm
FROM lc_tiles
GROUP BY featureclass
"""

    # exact rectangle-union dissolve: integer-md^2 slab sweep mirrors the
    # engine's per-cell rect_union_area partials bit-for-bit
    q["dissolve_exact_area"] = f"""
WITH {LAND_COVER_CTE}, {_LCMD_CTE}, {_slab_union_cte('lcmd', 'du')}
SELECT featureclass, CAST(md2 AS DOUBLE) * {spec.KM2_PER_MD2} AS area_sqkm
FROM du
"""

    # exact per-country union area of image footprints (dissolve over
    # the BIG side): country rects in integer md, image clip, slab sweep
    q["country_image_union"] = f"""
WITH {IMAGES_CTE}, {_IMD_CTE},
ctmd AS (
  SELECT n_name AS featureclass,
    (n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} - 170000 AS x0,
    (n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} - 170000 + {spec.CTRY_W_MD} AS x1,
    (n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} - 66000 AS y0,
    (n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} - 66000 + {spec.CTRY_H_MD} AS y1
  FROM nation
),
icx AS (
  SELECT c.featureclass,
         GREATEST(i.x0, c.x0) AS x0, LEAST(i.x1, c.x1) AS x1,
         GREATEST(i.y0, c.y0) AS y0, LEAST(i.y1, c.y1) AS y1
  FROM imd i JOIN ctmd c
    ON i.x0 < c.x1 AND c.x0 < i.x1 AND i.y0 < c.y1 AND c.y0 < i.y1
), {_slab_union_cte('icx', 'cu')}
SELECT featureclass AS country_iso,
       CAST(md2 AS DOUBLE) * {spec.KM2_PER_MD2} AS union_area_sqkm
FROM cu
"""

    # buffered coverage (reference app/query.py:152-182 buffers the
    # dissolved layer by 1 m before clipping): layer rects dilated by
    # 1 md — the lattice's smallest unit — then the same slab sweep
    q["coverage_pct_buffered"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}, {_LCMD_CTE},
lcb AS (
  SELECT featureclass, x0 - 1 AS x0, x1 + 1 AS x1, y0 - 1 AS y0, y1 + 1 AS y1
  FROM lcmd
), {_IMD_CTE},
ixb AS (
  SELECT l.featureclass,
         GREATEST(i.x0, l.x0) AS x0, LEAST(i.x1, l.x1) AS x1,
         GREATEST(i.y0, l.y0) AS y0, LEAST(i.y1, l.y1) AS y1
  FROM imd i JOIN lcb l
    ON i.x0 < l.x1 AND l.x0 < i.x1 AND i.y0 < l.y1 AND l.y0 < i.y1
), {_slab_union_cte('ixb', 'covb')}, {_slab_union_cte('lcb', 'denb')}
SELECT d.featureclass,
       CAST(d.md2 AS DOUBLE) * {spec.KM2_PER_MD2} AS lc_area_sqkm,
       CAST(COALESCE(c.md2, 0) AS DOUBLE) * {spec.KM2_PER_MD2} AS covered_area_sqkm,
       100.0 * CAST(COALESCE(c.md2, 0) AS DOUBLE) / CAST(d.md2 AS DOUBLE)
         AS coverage_pct
FROM denb d LEFT JOIN covb c ON d.featureclass = c.featureclass
"""

    # exact geometric coverage: union(image ∩ lc) / union(lc) per class,
    # all in integer md^2 (duplicate image keys at tiny sf are harmless:
    # unions are idempotent)
    q["coverage_pct_exact"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}, {_LCMD_CTE}, {_IMD_CTE},
ix AS (
  SELECT l.featureclass,
         GREATEST(i.x0, l.x0) AS x0, LEAST(i.x1, l.x1) AS x1,
         GREATEST(i.y0, l.y0) AS y0, LEAST(i.y1, l.y1) AS y1
  FROM imd i JOIN lcmd l
    ON i.x0 < l.x1 AND l.x0 < i.x1 AND i.y0 < l.y1 AND l.y0 < i.y1
), {_slab_union_cte('ix', 'cov')}, {_slab_union_cte('lcmd', 'den')}
SELECT d.featureclass,
       CAST(d.md2 AS DOUBLE) * {spec.KM2_PER_MD2} AS lc_area_sqkm,
       CAST(COALESCE(c.md2, 0) AS DOUBLE) * {spec.KM2_PER_MD2} AS covered_area_sqkm,
       100.0 * CAST(COALESCE(c.md2, 0) AS DOUBLE) / CAST(d.md2 AS DOUBLE)
         AS coverage_pct
FROM den d LEFT JOIN cov c ON d.featureclass = c.featureclass
"""

    q["coverage_pct"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}, {TILES_CTE}, {LC_TILES_CTE},
img_tile_set AS (SELECT DISTINCT tile_id FROM img_tiles),
lc_tile_set AS (SELECT DISTINCT featureclass, tile_id FROM lc_tiles)
SELECT l.featureclass,
       COUNT(*) AS total_tiles,
       COUNT(t.tile_id) AS covered_tiles,
       100.0 * COUNT(t.tile_id) / COUNT(*) AS coverage_pct
FROM lc_tile_set l LEFT JOIN img_tile_set t ON l.tile_id = t.tile_id
GROUP BY l.featureclass
"""

    q["phash_near_dup"] = f"""
WITH {IMAGES_CTE},
bands AS (
  SELECT image_id, key, phash, b.v AS band_idx,
         (phash >> (16 * b.v)) & 65535 AS band_val
  FROM images, LATERAL (SELECT unnest(generate_series(0, {spec.PHASH_BANDS - 1})) AS v) b
),
cand AS (
  SELECT DISTINCT a.key AS key_a, b.key AS key_b,
         a.image_id AS image_a, b.image_id AS image_b,
         a.phash AS ph_a, b.phash AS ph_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.key < b.key
)
SELECT image_a, image_b, CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(ph_a, ph_b)) <= {spec.PHASH_HAMMING_MAX}
"""

    # component contraction of the phash pair graph (same bands/hamming
    # SQL as phash_near_dup, on int keys) via recursive closure
    q["phash_dup_clusters"] = f"""
{_phash_closure_cte()}
SELECT 'img-' || CAST(node AS VARCHAR) AS image_id,
       'img-' || CAST(MIN(label) AS VARCHAR) AS cluster_id
FROM reach GROUP BY node
"""

    # dup-cluster size histogram over the same closure
    q["phash_cluster_sizes"] = f"""
{_phash_closure_cte()},
lab AS (SELECT node, MIN(label) AS label FROM reach GROUP BY node),
csz AS (SELECT label, COUNT(*)::BIGINT AS cluster_size FROM lab GROUP BY label)
SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters FROM csz GROUP BY cluster_size
"""

    # zonal statistics: decode closed forms x box-overlap join; SUMs
    # cast back to BIGINT (DuckDB SUM(BIGINT) -> HUGEINT)
    q["zonal_pixel_stats"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
px AS (
  SELECT x0, y0, x1, y1, fmt,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n_pixels,
         key % 256 AS s
  FROM images
),
sums AS (
  SELECT x0, y0, x1, y1, n_pixels, fmt,
    (((s + n_pixels) // 256) * 32640
      + ((s + n_pixels) % 256) * (((s + n_pixels) % 256) - 1) // 2)
    - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2) AS sum_raw,
    (((s + n_pixels) // 4) * 6
      + ((s + n_pixels) % 4) * (((s + n_pixels) % 4) - 1) // 2)
    - ((s // 4) * 6 + (s % 4) * ((s % 4) - 1) // 2) AS sum_low3
  FROM px
),
imgpix AS (
  SELECT x0, y0, x1, y1, n_pixels,
         CASE WHEN fmt = 'qraw8' THEN sum_raw - sum_low3 ELSE sum_raw END AS pix_sum
  FROM sums
)
SELECT l.featureclass,
       COUNT(*) AS n_pairs,
       CAST(SUM(i.n_pixels) AS BIGINT) AS total_pixels,
       CAST(SUM(i.pix_sum) AS BIGINT) / CAST(SUM(i.n_pixels) AS DOUBLE) AS mean_pixel
FROM imgpix i JOIN lc l
  ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
GROUP BY l.featureclass
"""

    # canonical selection per phash cluster: highest clear, then lowest
    # key — the "which copy survives" rule of an image dedup pass
    q["phash_cluster_canonical"] = f"""
{_phash_closure_cte()},
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
members AS (SELECT cluster, COUNT(*) AS n_members FROM comp GROUP BY cluster),
cand AS (
  SELECT c.cluster, i.key, i.clear_confidence_percent
  FROM comp c
  JOIN (SELECT DISTINCT key, clear_confidence_percent FROM imgs) i
    ON i.key = c.node
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster ORDER BY clear_confidence_percent DESC, key) AS rn
  FROM cand
)
SELECT 'img-' || CAST(r.cluster AS VARCHAR) AS cluster_id,
       'img-' || CAST(r.key AS VARCHAR) AS keep_image_id,
       r.clear_confidence_percent AS keep_clear,
       m.n_members
FROM r JOIN members m ON r.cluster = m.cluster
WHERE rn = 1
"""

    # near-dup removal: all images except non-canonical cluster members
    q["images_dedup_near"] = f"""
{_phash_closure_cte()},
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
cand AS (
  SELECT c.cluster, i.key, i.clear_confidence_percent
  FROM comp c
  JOIN (SELECT DISTINCT key, clear_confidence_percent FROM imgs) i
    ON i.key = c.node
),
rk AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster ORDER BY clear_confidence_percent DESC, key) AS rn
  FROM cand
),
drops AS (SELECT key FROM rk WHERE rn > 1)
SELECT image_id FROM imgs WHERE key NOT IN (SELECT key FROM drops)
"""

    # text near-dup removal: docs minus non-canonical cluster members
    # (canonical = component min id = the closure label itself)
    q["docs_dedup_near"] = f"""
{_minhash_closure_cte()},
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
drops AS (SELECT node FROM comp WHERE node <> cluster)
SELECT doc_id, n_chars FROM documents
WHERE doc_id NOT IN (SELECT node FROM drops)
"""

    # dissolve geometry as canonical slabs — the slab sweep's segment
    # stage exposed directly (bit-comparable decomposition)
    q["dissolve_geom_slabs"] = f"""
WITH {LAND_COVER_CTE}, {_LCMD_CTE}, {_slab_union_cte('lcmd', 'du')}
SELECT featureclass, CAST(xl AS BIGINT) AS xl, CAST(xr AS BIGINT) AS xr,
       CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi
FROM du_segs
"""

    # round 5: the canonical re-decomposition of the ACTUAL dissolve
    # WKB output must reproduce the same slab sweep — equal regions
    # have equal canonical slab sets whatever the rect decomposition,
    # so this closes dissolve_geom's oracle gap (geometry content).
    q["dissolve_geom_canonical"] = q["dissolve_geom_slabs"]

    q["decode_stats"] = f"""
WITH {IMAGES_CTE},
px AS (
  SELECT image_id, key, w, h, fmt,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n_pixels,
         key % 256 AS s
  FROM images
),
-- closed form of sum((key+i) % 256 for i in 0..n-1) = F(s+n) - F(s),
-- F(m) = (m//256)*32640 + r*(r-1)/2, r = m%256; for qraw8 (6-bit quant,
-- & 0xFC) subtract the low-2-bit remainders: G(m) = (m//4)*6 + r4*(r4-1)/2.
sums AS (
  SELECT image_id, w, h, n_pixels, fmt,
    (((s + n_pixels) // 256) * 32640
      + ((s + n_pixels) % 256) * (((s + n_pixels) % 256) - 1) // 2)
    - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2) AS sum_raw,
    (((s + n_pixels) // 4) * 6
      + ((s + n_pixels) % 4) * (((s + n_pixels) % 4) - 1) // 2)
    - ((s // 4) * 6 + (s % 4) * ((s % 4) - 1) // 2) AS sum_low3
  FROM px
)
SELECT image_id, w, h, n_pixels,
  CASE WHEN fmt = 'qraw8'
       THEN (sum_raw - sum_low3) / CAST(n_pixels AS DOUBLE)
       ELSE sum_raw / CAST(n_pixels AS DOUBLE) END AS mean_pixel
FROM sums
"""

    # ---- documents -------------------------------------------------------
    q["docs_exact_dup"] = """
SELECT d.doc_id, md5(d.text) AS content_hash,
  CAST(CASE WHEN d.doc_id = m.min_id THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM documents d
JOIN (SELECT md5(text) AS h, MIN(doc_id) AS min_id FROM documents GROUP BY 1) m
  ON md5(d.text) = m.h
"""

    # composed cleaning pipeline: quality gate + dedup canonical +
    # langid + split (thresholds in integer-exact form)
    stop_list = ", ".join(f"'{w}'" for w in sorted(spec.STOPWORDS))
    clean_lang_hits = ",\n    ".join(
        f"SUM(CASE WHEN tok IN ({', '.join(repr(m) for m in sorted(spec.LANG_MARKERS[lang]))}) THEN 1 ELSE 0 END) AS hits_{lang}"
        for lang in spec.LANG_PRIORITY
    )
    q["corpus_clean"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
    CAST(SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS BIGINT)
      AS stop_cnt,
    {clean_lang_hits}
  FROM toks GROUP BY doc_id
),
canon AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
)
SELECT a.doc_id,
  CASE
    WHEN hits_en = 0 AND hits_de = 0 AND hits_fr = 0 AND hits_es = 0 THEN 'und'
    WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
    WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
    WHEN hits_fr >= hits_es THEN 'fr'
    ELSE 'es'
  END AS pred_lang,
  a.n_tokens,
  CASE WHEN b < {spec.SPLIT_TRAIN_PCT} THEN 'train'
       WHEN b < {spec.SPLIT_VAL_PCT} THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT *, {_mix(f'(doc_id % {M})', spec.ST_SPLIT)} % 100 AS b FROM agg) a
JOIN canon c ON a.doc_id = c.doc_id
WHERE a.n_tokens >= {spec.CLEAN_MIN_TOKENS}
  AND a.stop_cnt * 100 <= {spec.CLEAN_MAX_STOP_PCT} * a.n_tokens
"""

    # TF-IDF top-3 terms per doc; FLOOR(score*1e6) absorbs the <=1-ulp
    # libm ln() difference between numpy and DuckDB (the only exactly-
    # integer score is df = N -> ln(1) = 0.0 identically on both sides)
    q["docs_tfidf"] = r"""
WITH tok_raw AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
  FROM tok_raw WHERE term <> '' GROUP BY doc_id, term
),
dfx AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
nn AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT f.doc_id, f.term, f.tf, d.df,
         CAST(FLOOR(f.tf * LN(CAST(nn.n AS DOUBLE) / d.df) * 1000000) AS BIGINT)
           AS score_m
  FROM tf f JOIN dfx d USING (term) CROSS JOIN nn
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_m DESC, term)
         AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score_m FROM r WHERE rn <= 3
"""

    # Integer-lattice k-means mirror: one CTE pair (assign, update) per
    # iteration; q and the centroid CTEs are MATERIALIZED (DuckDB
    # re-inlines multi-referenced CTEs otherwise — the recursive-closure
    # lesson).  Exact int math end to end; the only floats are the
    # quantize and the floor(sum/count) update, written identically to
    # stages/ann.py.
    _kq, _kk, _kit = spec.KMEANS_QUANT, spec.KMEANS_K, spec.KMEANS_ITERS
    _kparts = [
        f"""q AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {_kq}) AS BIGINT) AS qv
  FROM embeddings),
c0 AS MATERIALIZED (SELECT vec_id AS cid, dim, qv FROM q WHERE vec_id < {_kk})"""
    ]
    for _i in range(1, _kit + 1):
        _kparts.append(
            f"""d{_i} AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.qv) * (q.qv - c.qv)) AS dist
  FROM q JOIN c{_i - 1} c USING (dim) GROUP BY 1, 2),
a{_i} AS (SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{_i}) WHERE rn = 1),
s{_i} AS (SELECT a.cid, q.dim, SUM(q.qv) AS sv, COUNT(*)::BIGINT AS cnt
  FROM q JOIN a{_i} a USING (vec_id) GROUP BY 1, 2),
c{_i} AS MATERIALIZED (SELECT c.cid, c.dim,
    COALESCE(CAST(FLOOR(CAST(s.sv AS DOUBLE) / s.cnt) AS BIGINT), c.qv) AS qv
  FROM c{_i - 1} c LEFT JOIN s{_i} s ON s.cid = c.cid AND s.dim = c.dim)"""
        )
    q["kmeans_embeddings"] = (
        "WITH "
        + ",\n".join(_kparts)
        + f""",
df AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.qv) * (q.qv - c.qv)) AS dist
  FROM q JOIN c{_kit} c USING (dim) GROUP BY 1, 2)
SELECT vec_id, cid AS cluster, CAST(dist AS BIGINT) AS dist FROM (
  SELECT vec_id, cid, dist, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM df) WHERE rn = 1
"""
    )

    # SemDeDup: same lattice-kmeans assignment, then within each
    # cluster drop any vector with an EARLIER-id vector at rounded
    # cosine >= SEMDEDUP_SIM (pairwise-exists rule, deliberately
    # non-transitive).  The rounded cosine is the same engine-wide
    # ANN_ROUND convention the near-dup oracle already matches bitwise.
    q["semdedup_survivors"] = (
        "WITH "
        + ",\n".join(_kparts)
        + f""",
sdf AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.qv) * (q.qv - c.qv)) AS dist
  FROM q JOIN c{_kit} c USING (dim) GROUP BY 1, 2),
asg AS MATERIALIZED (SELECT vec_id, cid FROM (
  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
  FROM sdf) WHERE rn = 1),
ev AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
drops AS (SELECT DISTINCT b.vec_id
  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN ev ea ON ea.vec_id = a.vec_id
  JOIN ev eb ON eb.vec_id = b.vec_id
  WHERE round(list_cosine_similarity(ea.emb, eb.emb), {spec.ANN_ROUND})
        >= {spec.SEMDEDUP_SIM})
SELECT s.vec_id, s.cid AS cluster FROM asg s
WHERE s.vec_id NOT IN (SELECT vec_id FROM drops)
"""
    )

    # Bigram PMI collocations — lead() over the nonempty-token sequence
    # mirrors the flat-adjacency bigram kernel; float expression order
    # matches pmi_score_partition exactly.
    q["docs_bigram_pmi"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
tk AS MATERIALIZED (SELECT doc_id, pos, term FROM tok_raw WHERE term <> ''),
bi AS MATERIALIZED (
  SELECT term AS a, lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b FROM tk),
bc AS (SELECT a, b, COUNT(*)::BIGINT AS nab FROM bi WHERE b IS NOT NULL GROUP BY 1, 2),
uc AS MATERIALIZED (SELECT term, COUNT(*)::BIGINT AS n FROM tk GROUP BY 1),
tot AS (SELECT (SELECT COUNT(*) FROM tk) AS t,
               (SELECT COUNT(*) FROM bi WHERE b IS NOT NULL) AS tb),
scored AS (
  SELECT c.a, c.b, c.nab,
    CAST(FLOOR(LN((CAST(c.nab AS DOUBLE) / tot.tb)
        / ((CAST(ua.n AS DOUBLE) / tot.t) * (CAST(ub.n AS DOUBLE) / tot.t)))
      * 1000000) AS BIGINT) AS pmi_m
  FROM bc c JOIN uc ua ON ua.term = c.a JOIN uc ub ON ub.term = c.b CROSS JOIN tot
  WHERE c.nab >= {spec.PMI_MIN_COUNT})
SELECT a, b, nab, pmi_m FROM scored ORDER BY pmi_m DESC, a, b LIMIT {spec.PMI_TOPK}
"""

    # BM25 (Lucene idf) — every float subexpression is written in the
    # exact order bm25_score_batch evaluates it; per-(doc,term)
    # contributions floor to micros before the per-doc sum.
    _bm25_terms = ", ".join(f"'{t}'" for t in spec.BM25_QUERY_TERMS)
    q["docs_bm25"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents
),
tok AS (SELECT doc_id, term FROM tok_raw WHERE term <> ''),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dlen FROM tok GROUP BY doc_id),
s AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
             CAST((SELECT COUNT(*) FROM tok) AS DOUBLE)
               / (SELECT COUNT(*) FROM documents) AS avglen),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok
       WHERE term IN ({_bm25_terms}) GROUP BY doc_id, term),
dfx AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term),
contrib AS (
  SELECT f.doc_id,
    CAST(FLOOR(
      LN((CAST(s.n - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5) + 1)
      * (f.tf * ({spec.BM25_K1} + 1))
      / (f.tf + {spec.BM25_K1} * ((1 - {spec.BM25_B}) + {spec.BM25_B} * l.dlen / s.avglen))
      * 1000000) AS BIGINT) AS contrib_m
  FROM tf f JOIN dfx d USING (term) JOIN dl l USING (doc_id) CROSS JOIN s
),
scored AS (SELECT doc_id, COUNT(*)::BIGINT AS n_terms,
                  CAST(SUM(contrib_m) AS BIGINT) AS score_m
           FROM contrib GROUP BY doc_id)
SELECT doc_id, n_terms, score_m FROM scored
ORDER BY score_m DESC, doc_id LIMIT {spec.BM25_TOPK}
"""

    q["docs_token_stats"] = r"""
SELECT doc_id, n_chars,
  CASE WHEN trim(text) = '' THEN 0
       ELSE array_length(string_split_regex(trim(text), '\s+')) END AS n_tokens
FROM documents
"""

    # BPE-ish token counting: the RE2 pattern string is shared verbatim
    # with the engine (Arrow and DuckDB both execute RE2, so the
    # non-overlapping match scan is identical)
    _bpe_sql = spec.BPE_TOKEN_PATTERN.replace("'", "''")
    q["docs_token_bpe"] = rf"""
SELECT doc_id,
  CASE WHEN trim(text) = '' THEN 0
       ELSE array_length(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
  len(regexp_extract_all(text, '{_bpe_sql}')) AS n_bpe_tokens
FROM documents
"""

    # concat-then-chunk sequence packing: exclusive prefix token count
    # in doc_id order (window frame ... AND 1 PRECEDING), bin = // CAP.
    # The token-count CASE is docs_token_stats' expression verbatim.
    q["docs_pack_bins"] = rf"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN trim(text) = '' THEN 0
         ELSE array_length(string_split_regex(trim(text), '\s+')) END AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum
  FROM t)
SELECT doc_id, n_tokens, cum // {spec.PACK_CAP} AS bin_id,
       cum % {spec.PACK_CAP} AS bin_pos
FROM c
"""

    # unigram-LM surprisal: per-(doc,term) micros floor BEFORE the
    # per-doc sum (integer sum -> order-free; the BM25/tfidf trick)
    q["docs_surprisal"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tok AS MATERIALIZED (SELECT doc_id, term FROM tok_raw WHERE term <> ''),
tfx AS MATERIALIZED (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
cfx AS MATERIALIZED (
  SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tfx GROUP BY 1),
tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS t FROM cfx),
contrib AS (
  SELECT f.doc_id, f.tf,
    f.tf * CAST(FLOOR(-LN(CAST(c.cf AS DOUBLE) / tot.t) * 1000000) AS BIGINT) AS sm
  FROM tfx f JOIN cfx c USING (term) CROSS JOIN tot)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
  CAST(SUM(sm) AS BIGINT) AS surprisal_micro,
  CAST(SUM(sm) AS BIGINT) // CAST(SUM(tf) AS BIGINT) AS mean_micro
FROM contrib GROUP BY doc_id
"""

    # audio-analog energy: closed-form SUM of squared samples over the
    # payload byte stream.  raw8 sample = (key+i)%256 -> prefix sums of
    # squares F2(m) = (m//256)*5559680 + r(r-1)(2r-1)/6, r = m%256.
    # qraw8 sample = 4*(v//4) -> 16 * [ (m//256)*341376
    #   + 4*S2(r//4) + (r%4)*(r//4)^2 ], S2(t) = t(t-1)(2t-1)/6.
    q["audio_energy_stats"] = f"""
WITH {IMAGES_CTE},
px AS (
  SELECT image_id, fmt, key % 256 AS s,
         (key % 256) + CAST(w AS BIGINT) * CAST(h AS BIGINT) AS e,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images
),
fsq AS (
  SELECT image_id, fmt, n,
    (((e // 256) * 5559680
       + (e % 256) * ((e % 256) - 1) * (2 * (e % 256) - 1) // 6)
     - ((s // 256) * 5559680
       + (s % 256) * ((s % 256) - 1) * (2 * (s % 256) - 1) // 6)) AS raw_e,
    16 * ((((e // 256) * 341376
            + 4 * (((e % 256) // 4) * (((e % 256) // 4) - 1)
                   * (2 * ((e % 256) // 4) - 1) // 6)
            + ((e % 256) % 4) * ((e % 256) // 4) * ((e % 256) // 4)))
          - (((s // 256) * 341376
            + 4 * (((s % 256) // 4) * (((s % 256) // 4) - 1)
                   * (2 * ((s % 256) // 4) - 1) // 6)
            + ((s % 256) % 4) * ((s % 256) // 4) * ((s % 256) // 4)))) AS q_e
  FROM px
)
SELECT image_id, n AS n_samples,
  CAST(CASE WHEN fmt = 'qraw8' THEN q_e ELSE raw_e END AS BIGINT) AS energy,
  CAST(CASE WHEN fmt = 'qraw8' THEN q_e ELSE raw_e END AS DOUBLE)
    / CAST(n AS DOUBLE) AS mean_energy
FROM fsq
"""

    # multimodal frame sampling: closed-form byte sums over every K-th
    # payload row (same F/G prefix-sum identities as decode_stats);
    # ROW_NUMBER keeps tiny-sf duplicate image keys per-ROW (oracle
    # mirroring rule), matching the engine's per-row emission.
    _K = spec.FRAME_SAMPLE_K
    q["frame_sample_stats"] = f"""
WITH {IMAGES_CTE},
base AS (
  SELECT image_id, key % 256 AS s, w, h, fmt,
         ROW_NUMBER() OVER (PARTITION BY image_id ORDER BY key) AS rk
  FROM images
),
fr AS (
  SELECT image_id, rk, s, w, h, fmt, g.r AS r
  FROM base,
       LATERAL (SELECT unnest(generate_series(0, h - 1, {_K})) AS r) g
),
ps AS (
  SELECT image_id, rk, w, h, fmt,
    ((((s + (r + 1) * w) // 256) * 32640
       + ((s + (r + 1) * w) % 256) * (((s + (r + 1) * w) % 256) - 1) // 2)
     - (((s + r * w) // 256) * 32640
       + ((s + r * w) % 256) * (((s + r * w) % 256) - 1) // 2)) AS raw_part,
    ((((s + (r + 1) * w) // 4) * 6
       + ((s + (r + 1) * w) % 4) * (((s + (r + 1) * w) % 4) - 1) // 2)
     - (((s + r * w) // 4) * 6
       + ((s + r * w) % 4) * (((s + r * w) % 4) - 1) // 2)) AS low_part
  FROM fr
)
SELECT image_id,
  CAST(MAX(h) AS BIGINT) AS n_frames,
  CAST(COUNT(*) AS BIGINT) AS n_sampled,
  CAST(SUM(CASE WHEN fmt = 'qraw8' THEN raw_part - low_part ELSE raw_part END)
       AS BIGINT) AS sampled_sum,
  CAST(SUM(CASE WHEN fmt = 'qraw8' THEN raw_part - low_part ELSE raw_part END)
       AS DOUBLE)
    / CAST(COUNT(*) * MAX(w) AS DOUBLE) AS sampled_mean
FROM ps GROUP BY image_id, rk
"""

    stop_list = ", ".join(f"'{s}'" for s in spec.STOPWORDS)
    q["docs_quality"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
    CAST(SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS BIGINT) AS stop_cnt
  FROM toks GROUP BY doc_id
)
SELECT a.doc_id, a.n_tokens, a.stop_cnt,
  a.stop_cnt / CAST(a.n_tokens AS DOUBLE) AS stop_ratio,
  d.n_chars / CAST(a.n_tokens AS DOUBLE) AS chars_per_token
FROM agg a JOIN documents d ON a.doc_id = d.doc_id
"""

    lang_cases = []
    for lang in spec.LANG_PRIORITY:
        marks = ", ".join(f"'{m}'" for m in spec.LANG_MARKERS[lang])
        lang_cases.append(
            f"SUM(CASE WHEN tok IN ({marks}) THEN 1 ELSE 0 END) AS hits_{lang}"
        )
    lang_hits = ",\n    ".join(lang_cases)
    # argmax with priority order en > de > fr > es; all-zero -> 'und'
    q["docs_langid"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
hits AS (
  SELECT doc_id,
    {lang_hits}
  FROM toks GROUP BY doc_id
)
SELECT doc_id,
  CASE
    WHEN hits_en = 0 AND hits_de = 0 AND hits_fr = 0 AND hits_es = 0 THEN 'und'
    WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
    WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
    WHEN hits_fr >= hits_es THEN 'fr'
    ELSE 'es'
  END AS pred_lang
FROM hits
"""

    # ---- embeddings ------------------------------------------------------
    q["ann_topk"] = f"""
WITH qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id % {spec.ANN_QUERY_MOD} = 0
),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), {spec.ANN_ROUND}) AS sim
  FROM qv q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {spec.ANN_TOPK}
"""

    # KMV distinct sketch with deterministic mix hash -> the estimate is
    # bit-exactly mirrorable (same k-th smallest hash on both sides)
    q["sat_distinct_days"] = f"""
WITH {IMAGES_CTE},
d AS (
  SELECT sat_id,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day
  FROM images
),
base AS (SELECT sat_id, COUNT(*) AS n_images FROM d GROUP BY sat_id),
dd AS (SELECT DISTINCT sat_id, day FROM d),
exact AS (SELECT sat_id, COUNT(*) AS n_distinct_days FROM dd GROUP BY sat_id),
hd AS (SELECT DISTINCT sat_id, {_mix('day', spec.ST_KMV)} AS hv FROM dd),
r AS (
  SELECT sat_id, hv,
         ROW_NUMBER() OVER (PARTITION BY sat_id ORDER BY hv) AS rn,
         COUNT(*) OVER (PARTITION BY sat_id) AS nd
  FROM hd
),
est AS (
  SELECT sat_id,
    CASE WHEN MAX(nd) < {spec.KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
         ELSE MAX(CASE WHEN rn = {spec.KMV_K}
                  THEN CAST({spec.KMV_K} - 1 AS DOUBLE) * {M} / hv END)
    END AS kmv_estimate
  FROM r GROUP BY sat_id
)
SELECT b.sat_id, b.n_images, e.n_distinct_days, s.kmv_estimate
FROM base b JOIN exact e ON b.sat_id = e.sat_id JOIN est s ON b.sat_id = s.sat_id
"""

    q["ann_filtered_topk"] = f"""
WITH qv AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id % {spec.ANN_QUERY_MOD} = 0
),
sims AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), {spec.ANN_ROUND}) AS sim
  FROM qv q CROSS JOIN embeddings e
  WHERE e.label % {spec.ANN_FILTER_MOD} = {spec.ANN_FILTER_REM}
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {spec.ANN_TOPK}
"""

    q["embedding_near_dup"] = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[])), {spec.ANN_ROUND}) AS sim
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), {spec.ANN_ROUND})
      >= {spec.EMB_DUP_SIM}
"""

    # connected components over the near-dup pair graph: recursive
    # transitive-closure CTE (label set per node), MIN = component id —
    # the SQL mirror of the engine's iterative min-label propagation
    q["embedding_dup_clusters"] = f"""
WITH RECURSIVE prs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), {spec.ANN_ROUND})
        >= {spec.EMB_DUP_SIM}
),
edges AS (
  SELECT vec_a AS s, vec_b AS d FROM prs
  UNION ALL SELECT vec_b, vec_a FROM prs
),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, r.label FROM edges e JOIN reach r ON r.node = e.s
)
SELECT node AS vec_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""

    # retention cohort triangle: first-seen week x weeks-since activity
    q["events_retention"] = """
WITH uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
fs AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id)
SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cw, u.w) // 7 AS BIGINT) AS weeks_since,
       COUNT(*) AS n_users
FROM uw u JOIN fs f ON u.user_id = f.user_id
GROUP BY 1, 2
"""

    # Relational equi-joins (native hash-shuffle Dataset.join mirrors).
    # Revenue is integer cents so the distributed sum is order-free;
    # SUM(BIGINT) is HUGEINT in DuckDB -> cast back.
    q["nation_order_revenue"] = """
SELECT n.n_name AS nation, COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""

    q["order_item_revenue"] = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       o.o_orderpriority AS priority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""

    # Ordered funnel: first view, first click strictly after it, first
    # purchase strictly after that (mirrors q_events_funnel's strict-ts
    # segment scans).
    q["events_funnel"] = """
WITH v AS (SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT 1::BIGINT AS step, 'view' AS step_name, (SELECT COUNT(*) FROM v) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT COUNT(*) FROM c)
UNION ALL
SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)
"""

    # ---- events ----------------------------------------------------------
    q["events_sessionize"] = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL {spec.SESSION_GAP_MIN} MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts,
    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM ordered
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sess GROUP BY user_id, session_seq
"""

    # value summed as integer cents: float SUM order is not bit-stable
    # across engines, integer sums are.
    q["events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events
GROUP BY 1, 2
"""

    # polynomial rolling hash h = sum(byte_i * 257^(L-1-i)) mod 1e9+7:
    # SQL-expressible with a recursive-CTE powers table (documents are
    # ASCII, so char position == byte position).
    q["doc_fingerprint"] = """
WITH RECURSIVE pows(e, v) AS (
  SELECT 0, CAST(1 AS BIGINT)
  UNION ALL
  SELECT e + 1, (v * 257) % 1000000007 FROM pows
  WHERE e < (SELECT COALESCE(MAX(strlen(text)), 1) FROM documents)
),
b AS (
  SELECT d.doc_id, strlen(d.text) AS L, g.v AS pos,
         ascii(substr(d.text, CAST(g.v AS INT), 1)) AS byte
  FROM documents d, LATERAL (SELECT unnest(generate_series(1, strlen(d.text))) AS v) g
)
SELECT d.doc_id,
  COALESCE(CAST(CAST(SUM(b.byte * p.v) AS HUGEINT) % 1000000007 AS BIGINT), 0)
    AS fingerprint
FROM documents d
LEFT JOIN b ON d.doc_id = b.doc_id
LEFT JOIN pows p ON p.e = b.L - b.pos
GROUP BY d.doc_id
"""

    # exact n-gram Jaccard near-dup: character 8-gram shingle SETS,
    # jaccard = |A∩B|/|A∪B|.  The engine packs each 8-byte ASCII window
    # bijectively into a uint64, so its integer set semantics equal this
    # substring set semantics exactly; the single float op (one DOUBLE
    # division) is written identically on both sides.
    q["ngram_jaccard_dups"] = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, substring(text, CAST(g.i AS INT), {spec.NGRAM_WIDTH}) AS s
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1, length(text) - {spec.NGRAM_WIDTH - 1})) AS i) g
  WHERE length(text) >= {spec.NGRAM_WIDTH}
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b, i.n_inter,
       CAST(sa.sz + sb.sz - i.n_inter AS BIGINT) AS n_union,
       CAST(i.n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE)
      >= {spec.NGRAM_JACCARD_MIN}
"""

    q["simhash_docs"] = _simhash_sql()
    q["minhash_lsh_dups"] = _minhash_sql()

    # text near-dup clusters: closure over the minhash pairs at
    # est_jaccard >= 0.5 (k/64 vs 0.5 compares exactly on both sides)
    q["minhash_dup_clusters"] = f"""
{_minhash_closure_cte()}
SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""

    q["spatial_join_landcover_partitioned"] = q["spatial_join_landcover"]

    q["events_props_parse"] = """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""

    # --- secondary operators ---------------------------------------------
    q["satellite_names"] = "SELECT DISTINCT s_name AS sat_name FROM supplier"

    q["table_counts"] = """
SELECT 'images' AS table_name, COUNT(*) AS n_rows FROM lineitem
UNION ALL SELECT 'satellites', COUNT(*) FROM supplier
UNION ALL SELECT 'land_cover', COUNT(*) FROM part
UNION ALL SELECT 'cities', COUNT(*) FROM customer
UNION ALL SELECT 'countries', COUNT(*) FROM nation
"""

    q["time_series_dense"] = f"""
WITH {IMAGES_CTE},
counts AS (
  SELECT strftime(date_trunc('month', time_acquired), '%Y-%m') AS bucket,
         COUNT(*) AS n
  FROM images GROUP BY 1
),
bounds AS (
  SELECT date_trunc('month', MIN(time_acquired)) AS lo,
         date_trunc('month', MAX(time_acquired)) AS hi
  FROM images
),
months AS (
  SELECT strftime(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)), '%Y-%m') AS bucket
  FROM bounds
)
SELECT m.bucket, COALESCE(c.n, 0) AS total_images
FROM months m LEFT JOIN counts c ON m.bucket = c.bucket
"""

    q["landcover_union_counts"] = f"""
WITH {LAND_COVER_CTE}
SELECT featureclass, COUNT(*) AS n_polys FROM lc GROUP BY featureclass
"""

    q["image_landcover_lists"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
pairs AS (
  SELECT DISTINCT i.image_id, l.featureclass
  FROM images i JOIN lc l
    ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
)
SELECT image_id, string_agg(featureclass, ',' ORDER BY featureclass) AS lc_list
FROM pairs GROUP BY image_id
"""

    q["aoi_filter"] = f"""
WITH {IMAGES_CTE}
SELECT image_id, centroid_lon, centroid_lat
FROM images
WHERE x0 <= {spec.AOI_X1} AND {spec.AOI_X0} <= x1
  AND y0 <= {spec.AOI_Y1} AND {spec.AOI_Y0} <= y1
"""

    # rn distinguishes duplicate corpus rows (tiny-sf key collisions) so
    # each image ROW yields its own thumbnail, mirroring the engine.
    q["thumbnail_stats"] = f"""
WITH {IMAGES_CTE},
img_rows AS (
  SELECT *, row_number() OVER (PARTITION BY image_id) AS rn FROM images
),
samples AS (
  SELECT i.image_id, i.rn, i.fmt,
    (i.key + ((jj.v * i.h) // {spec.THUMB}) * i.w + ((ii.v * i.w) // {spec.THUMB})) % 256 AS val
  FROM img_rows i,
  LATERAL (SELECT unnest(generate_series(0, {spec.THUMB - 1})) AS v) jj,
  LATERAL (SELECT unnest(generate_series(0, {spec.THUMB - 1})) AS v) ii
),
qv AS (
  SELECT image_id, rn,
    CASE WHEN fmt = 'qraw8' THEN val - (val % 4) ELSE val END AS val
  FROM samples
)
SELECT image_id, SUM(val) / {float(spec.THUMB * spec.THUMB)} AS thumb_mean
FROM qv GROUP BY image_id, rn
"""

    q["item_type_counts"] = f"""
WITH {IMAGES_CTE}
SELECT 'it-' || CAST(key % 4 AS VARCHAR) AS item_type_id,
       COUNT(*) AS total_images
FROM images GROUP BY 1
"""

    # asset presence mirrors the engine's bit tests on mix(key, ST_ASSET)
    q["asset_type_counts"] = f"""
WITH {IMAGES_CTE},
bits AS (
  SELECT ((key % 2147483647)*30323+71) % 2147483647 AS ab
  FROM images
)
SELECT asset_type, total_images FROM (
  SELECT 'analytic' AS asset_type, CAST(COUNT(*) AS BIGINT) AS total_images FROM bits
  UNION ALL
  SELECT 'visual', CAST(SUM(CASE WHEN (ab >> 1) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM bits
  UNION ALL
  SELECT 'udm', CAST(SUM(CASE WHEN (ab >> 2) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM bits
)
"""

    # non-rect layer: exact polygon-refinement joins (same SQL for the
    # broadcast and partitioned engine variants)
    q["zone_image_counts"] = f"""
WITH {IMAGES_CTE}, {ZONES_CTE}
SELECT z.zone_class, COUNT(i.image_id) AS total_images
FROM images i JOIN zones z ON {ZONE_INTERSECTS}
GROUP BY z.zone_class
"""
    q["zone_image_counts_partitioned"] = q["zone_image_counts"]

    q["zone_join_pairs"] = f"""
WITH {IMAGES_CTE}, {ZONES_CTE}
SELECT i.image_id, z.zone_id
FROM images i JOIN zones z ON {ZONE_INTERSECTS}
"""

    q["images_without_zone"] = f"""
WITH {IMAGES_CTE}, {ZONES_CTE}
SELECT i.image_id FROM images i
WHERE NOT EXISTS (SELECT 1 FROM zones z WHERE {ZONE_INTERSECTS})
"""

    # multi-part (MULTIPOLYGON) layer: any-part refinement
    q["mzone_join_pairs"] = f"""
WITH {IMAGES_CTE}, {MZONES_CTE}
SELECT i.image_id, z.mzone_id
FROM images i JOIN mzones z ON {MZONE_INTERSECTS}
"""
    q["mzone_image_counts"] = f"""
WITH {IMAGES_CTE}, {MZONES_CTE}
SELECT z.zone_class, COUNT(i.image_id) AS total_images
FROM images i JOIN mzones z ON {MZONE_INTERSECTS}
GROUP BY z.zone_class
"""
    q["mzone_image_counts_partitioned"] = q["mzone_image_counts"]

    # rotated (non-rect) probe footprints: SAT mirrors of the exact
    # polygon kernels
    q["rot_landcover_counts"] = f"""
WITH {IMAGES_CTE}, {ROT_CTE}, {LAND_COVER_CTE}
SELECT z.featureclass, COUNT(*) AS total_images
FROM rquad r JOIN lc z ON {_rot_rect_sat('z.x0', 'z.y0', 'z.x1', 'z.y1')}
GROUP BY z.featureclass
"""
    q["rot_mzone_pairs"] = f"""
WITH {IMAGES_CTE}, {ROT_CTE}, {MZONES_CTE}
SELECT r.image_id, z.mzone_id
FROM rquad r JOIN mzones z
ON ({_rot_rect_sat('z.ax0', 'z.ay0', 'z.ax1', 'z.ay1')}
    OR {_rot_rect_sat('z.bx0', 'z.by0', 'z.bx1', 'z.by1')})
"""
    q["rot_zone_pairs"] = f"""
WITH {IMAGES_CTE}, {ROT_CTE}, {ZONES_CTE}, {TRI_CTE}
SELECT r.image_id, z.zone_id
FROM rquad r JOIN tri z ON {ROT_TRI_SAT}
"""

    # composed app screens: the joint filter set (sat semi-join + cloud
    # + date) feeding each join, mirroring /root/reference/app/query.py
    filt = f"""
filtered AS (
  SELECT i.* FROM images i
  WHERE i.cloud_cover <= {spec.FILTER_MAX_CLOUD}
    AND i.time_acquired >= TIMESTAMP '{spec.FILTER_DATE_LO}'
    AND i.time_acquired <= TIMESTAMP '{spec.FILTER_DATE_HI}'
    AND i.sat_id % {spec.FILTER_SAT_MOD} = {spec.FILTER_SAT_REM}
)
"""
    q["city_counts_filtered"] = f"""
WITH {IMAGES_CTE}, {CITIES_CTE}, {filt}
SELECT c.city_id, c.city_name, COUNT(i.image_id) AS total_images
FROM cities c JOIN filtered i
  ON greatest(i.x0 - c.lon, c.lon - i.x1, 0) * greatest(i.x0 - c.lon, c.lon - i.x1, 0)
   + greatest(i.y0 - c.lat, c.lat - i.y1, 0) * greatest(i.y0 - c.lat, c.lat - i.y1, 0)
   <= c.radius * c.radius
GROUP BY c.city_id, c.city_name
"""

    q["landcover_counts_filtered"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}, {filt}
SELECT l.featureclass, COUNT(i.image_id) AS total_images
FROM filtered i JOIN lc l
  ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
GROUP BY l.featureclass
"""

    # ties: prior-or-equal view chosen as the LAST view row ordered by
    # (ts, event_id) -> max event_id among equal-ts views <= purchase ts
    q["events_asof_join"] = """
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, ts FROM events WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, event_id AS view_id, ts FROM events WHERE event_type = 'view'
),
matched AS (
  SELECT p.user_id, p.purchase_id, v.view_id, p.ts AS pts, v.ts AS vts,
    row_number() OVER (
      PARTITION BY p.user_id, p.purchase_id
      ORDER BY v.ts DESC, v.view_id DESC
    ) AS rn
  FROM purchases p JOIN views v
    ON p.user_id = v.user_id AND v.ts <= p.ts
)
SELECT user_id, purchase_id, view_id,
  CAST((epoch_us(pts) - epoch_us(vts)) // 60000000 AS BIGINT) AS gap_minutes
FROM matched WHERE rn = 1
"""

    q["top_cloudy_images"] = f"""
WITH {IMAGES_CTE}
SELECT image_id, cloud_cover FROM images
ORDER BY cloud_cover DESC, key ASC LIMIT 100
"""

    q["events_sliding_3h"] = """
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
         event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT bucket, event_type,
  CAST(SUM(n_events) OVER (
    PARTITION BY event_type ORDER BY bucket
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
  ) AS BIGINT) AS sliding_events
FROM hourly
"""

    # quantile definition mirrored exactly: smallest value whose
    # cumulative count reaches ceil(p * total)
    q["cloud_quantiles"] = f"""
WITH {IMAGES_CTE},
c AS (
  SELECT CAST(round(cloud_cover * 1000) AS BIGINT) AS v, COUNT(*) AS n
  FROM images GROUP BY 1
),
cum AS (
  SELECT v, SUM(n) OVER (ORDER BY v) AS cum, SUM(n) OVER () AS tot FROM c
),
ps AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS p)
SELECT p, MIN(v) / 1000.0 AS cloud_cover_q
FROM ps JOIN cum ON cum.cum >= ceil(p * tot)
GROUP BY p
"""

    q["images_without_landcover"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE}
SELECT i.image_id FROM images i
WHERE NOT EXISTS (
  SELECT 1 FROM lc l
  WHERE i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1
)
"""

    q["city_image_counts_full"] = f"""
WITH {IMAGES_CTE}, {CITIES_CTE}
SELECT c.city_id, c.city_name,
  CAST(COUNT(i.image_id) AS BIGINT) AS total_images
FROM cities c LEFT JOIN images i
  ON greatest(i.x0 - c.lon, c.lon - i.x1, 0) * greatest(i.x0 - c.lon, c.lon - i.x1, 0)
   + greatest(i.y0 - c.lat, c.lat - i.y1, 0) * greatest(i.y0 - c.lat, c.lat - i.y1, 0)
   <= c.radius * c.radius
GROUP BY c.city_id, c.city_name
"""

    # ties on cloud_cover broken by image key ascending (mirrors engine)
    q["top_cloudy_per_satellite"] = f"""
WITH {IMAGES_CTE},
ranked AS (
  SELECT sat_id, image_id, cloud_cover,
    row_number() OVER (PARTITION BY sat_id ORDER BY cloud_cover DESC, key ASC) AS rank
  FROM images
)
SELECT sat_id, image_id, cloud_cover, rank FROM ranked WHERE rank <= 3
"""

    # Decontamination: distinct shared word n-grams vs the deterministic
    # benchmark slice; lead() chain mirrors the flat-adjacency windows.
    _dn = spec.DECON_NGRAM
    _ng_expr = " || ' ' || ".join(
        ["term"] + [f"lead(term, {j}) OVER w" for j in range(1, _dn)]
    )
    q["docs_decontaminate"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
tk AS MATERIALIZED (SELECT doc_id, pos, term FROM tok_raw WHERE term <> ''),
ngw AS (
  SELECT doc_id, {_ng_expr} AS ng, lead(term, {_dn - 1}) OVER w AS tlast
  FROM tk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
ngx AS MATERIALIZED (SELECT doc_id, ng FROM ngw WHERE tlast IS NOT NULL),
bench AS (SELECT DISTINCT ng FROM ngx WHERE doc_id % {spec.DECON_BENCH_MOD} = 0)
SELECT d.doc_id, COUNT(DISTINCT d.ng) AS n_hits
FROM ngx d JOIN bench b USING (ng)
WHERE d.doc_id % {spec.DECON_BENCH_MOD} <> 0
GROUP BY 1
"""

    # Fixed token windows: row_number over the nonempty-token stream,
    # chunk text string_agg'd in position order.
    q["docs_chunks"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
tk AS MATERIALIZED (
  SELECT doc_id, pos, term,
    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS rn
  FROM tok_raw WHERE term <> '')
SELECT doc_id, CAST(rn // {spec.CHUNK_TOKENS} AS BIGINT) AS chunk_idx,
       COUNT(*)::BIGINT AS n_tokens,
       string_agg(term, ' ' ORDER BY pos) AS chunk_text
FROM tk GROUP BY 1, 2
"""

    # Gopher-style repetition metrics; integer ppm so no float parity.
    q["docs_repetition"] = r"""
WITH tok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
tk AS MATERIALIZED (SELECT doc_id, pos, term FROM tok_raw WHERE term <> ''),
stats AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
         COUNT(DISTINCT term)::BIGINT AS n_distinct
  FROM tk GROUP BY 1),
bi AS (
  SELECT doc_id, term AS a, lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM tk),
bc AS (SELECT doc_id, a, b, COUNT(*)::BIGINT AS c FROM bi WHERE b IS NOT NULL GROUP BY 1, 2, 3),
bm AS (SELECT doc_id, MAX(c) AS topc, CAST(SUM(c) AS BIGINT) AS nb FROM bc GROUP BY 1)
SELECT s.doc_id, s.n_tokens, s.n_distinct,
  CAST((s.n_tokens - s.n_distinct) * 1000000 // s.n_tokens AS BIGINT) AS dup_token_ppm,
  CAST(COALESCE(b.topc * 1000000 // b.nb, 0) AS BIGINT) AS top_bigram_ppm
FROM stats s LEFT JOIN bm b USING (doc_id)
"""

    # ROLLUP revenue; revenue in integer cents like nation_order_revenue.
    q["nation_year_rollup"] = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ROLLUP (1, 2)
"""

    # Running window aggregate: per-sat cumulative daily counts.
    q["sat_daily_cumulative"] = f"""
WITH {IMAGES_CTE},
d AS (
  SELECT sat_id, strftime(date_trunc('day', time_acquired), '%Y-%m-%d') AS day,
         COUNT(*) AS n_images
  FROM images GROUP BY 1, 2)
SELECT sat_id, day, n_images,
  CAST(SUM(n_images) OVER (PARTITION BY sat_id ORDER BY day) AS BIGINT) AS cum_images
FROM d
"""

    # Pivot to wide: per-sat counts by calendar month + total.
    _mcols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN month(time_acquired) = {m} THEN 1 ELSE 0 END) AS BIGINT) AS m{m:02d}"
        for m in range(1, 13)
    )
    q["sat_month_pivot"] = f"""
WITH {IMAGES_CTE}
SELECT sat_id,
       {_mcols},
       COUNT(*) AS total
FROM images GROUP BY 1
"""

    # Last-write-wins compaction: latest event per (user, type).
    q["events_latest_state"] = """
WITH r AS (
  SELECT user_id, event_id, ts, event_type, value,
    row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_id, ts, event_type, value FROM r WHERE rn = 1
"""

    # Pareto frontier per satellite on (cloud asc, clear desc): only the
    # max-clear row of each discrete cloud level can be non-dominated,
    # and it survives iff it beats every lower level's max.
    q["sat_pareto_frontier"] = f"""
WITH {IMAGES_CTE},
lvl AS (
  SELECT sat_id, CAST(round(cloud_cover * 1000) AS BIGINT) AS cloud_md,
         MAX(clear_confidence_percent) AS mc
  FROM images GROUP BY 1, 2),
fr AS (
  SELECT sat_id, cloud_md, mc,
    MAX(mc) OVER (PARTITION BY sat_id ORDER BY cloud_md
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
  FROM lvl),
keep AS (SELECT sat_id, cloud_md, mc FROM fr WHERE prev IS NULL OR mc > prev)
SELECT i.sat_id, i.image_id, i.cloud_cover, i.clear_confidence_percent
FROM images i
JOIN keep k ON k.sat_id = i.sat_id
  AND k.cloud_md = CAST(round(i.cloud_cover * 1000) AS BIGINT)
  AND i.clear_confidence_percent = k.mc
"""

    # Composed quantile-threshold outlier filter: rows strictly above
    # their satellite's p99 cloud level.
    q["sat_cloud_outliers"] = f"""
WITH {IMAGES_CTE},
thr AS (SELECT sat_id, quantile_disc(cloud_cover, 0.99) AS p99 FROM images GROUP BY 1)
SELECT i.image_id, i.sat_id, i.cloud_cover
FROM images i JOIN thr t USING (sat_id)
WHERE i.cloud_cover > t.p99
"""

    # Tile-grid skew diagnostics over the per-tile assignment counts.
    q["tile_skew_stats"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
m AS (SELECT tile_id, COUNT(*)::BIGINT AS n FROM img_tiles GROUP BY 1),
s AS (SELECT COUNT(*)::BIGINT AS n_tiles, CAST(SUM(n) AS BIGINT) AS total,
             MAX(n) AS mx,
             quantile_disc(n, 0.5) AS p50, quantile_disc(n, 0.99) AS p99
      FROM m),
h AS (SELECT CAST(COALESCE(SUM(m.n), 0) AS BIGINT) AS hot FROM m, s WHERE m.n > s.p99)
SELECT s.n_tiles, s.total AS total_assignments, s.mx AS max_per_tile,
       s.p50 AS p50_per_tile, s.p99 AS p99_per_tile,
       h.hot * 1000000 // s.total AS hot_share_ppm
FROM s, h
"""

    # Composed corpus build: decontamination filter (same n-gram windows
    # as docs_decontaminate) feeding the corpus_clean gates/dedup; the
    # canon group runs over the DECON-FILTERED base, mirroring the
    # engine's filter-before-exchange order.
    q["corpus_clean_decon"] = rf"""
WITH dtok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
dtk AS MATERIALIZED (SELECT doc_id, pos, term FROM dtok_raw WHERE term <> ''),
ngw AS (
  SELECT doc_id, {_ng_expr} AS ng, lead(term, {_dn - 1}) OVER w AS tlast
  FROM dtk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
ngx AS MATERIALIZED (SELECT doc_id, ng FROM ngw WHERE tlast IS NOT NULL),
bench AS (SELECT DISTINCT ng FROM ngx WHERE doc_id % {spec.DECON_BENCH_MOD} = 0),
contaminated AS (
  SELECT DISTINCT d.doc_id FROM ngx d JOIN bench b USING (ng)
  WHERE d.doc_id % {spec.DECON_BENCH_MOD} <> 0),
base AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  WHERE doc_id % {spec.DECON_BENCH_MOD} <> 0
    AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM base WHERE trim(text) <> ''),
agg AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
    CAST(SUM(CASE WHEN tok IN ({stop_list}) THEN 1 ELSE 0 END) AS BIGINT)
      AS stop_cnt,
    {clean_lang_hits}
  FROM toks GROUP BY doc_id),
canon AS (
  SELECT MIN(doc_id) AS doc_id FROM base GROUP BY md5(text))
SELECT a.doc_id,
  CASE
    WHEN hits_en = 0 AND hits_de = 0 AND hits_fr = 0 AND hits_es = 0 THEN 'und'
    WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
    WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
    WHEN hits_fr >= hits_es THEN 'fr'
    ELSE 'es'
  END AS pred_lang,
  a.n_tokens,
  CASE WHEN b < {spec.SPLIT_TRAIN_PCT} THEN 'train'
       WHEN b < {spec.SPLIT_VAL_PCT} THEN 'val'
       ELSE 'test' END AS split
FROM (SELECT *, {_mix(f'(doc_id % {M})', spec.ST_SPLIT)} % 100 AS b FROM agg) a
JOIN canon c ON a.doc_id = c.doc_id
WHERE a.n_tokens >= {spec.CLEAN_MIN_TOKENS}
  AND a.stop_cnt * 100 <= {spec.CLEAN_MAX_STOP_PCT} * a.n_tokens
"""

    # Trailing-24h 3-sigma spike detection; integer cross-multiplied
    # test (full windows only), dense hour scaffold so gaps count 0.
    q["events_hourly_anomalies"] = """
WITH h AS (SELECT date_trunc('hour', ts) AS hb, COUNT(*)::BIGINT AS n
           FROM events GROUP BY 1),
span AS (SELECT min(hb) AS lo, max(hb) AS hi FROM h),
dense AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hb FROM span),
d AS (SELECT dense.hb, COALESCE(h.n, 0) AS n FROM dense LEFT JOIN h USING (hb)),
w AS (SELECT hb, n,
        SUM(n)   OVER (ORDER BY hb ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS s,
        SUM(n*n) OVER (ORDER BY hb ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS ss,
        COUNT(*) OVER (ORDER BY hb ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS wn
      FROM d)
SELECT strftime(hb, '%Y-%m-%d %H') AS bucket, n AS n_events, CAST(s AS BIGINT) AS win_sum
FROM w
WHERE wn = 24 AND (n*24 - s) > 0
  AND (n*24 - s)*(n*24 - s) > 9*(ss*24 - s*s)
"""

    # Hybrid retrieval: the BM25 oracle as a subquery, inner-joined to
    # embeddings, re-ranked by the engine's rounded cosine (same arg
    # order as ann_topk so the float expression mirrors exactly).
    q["hybrid_search"] = f"""
WITH bm AS ({q["docs_bm25"]}),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
       WHERE vec_id = {spec.HYBRID_QUERY_VEC}),
j AS (
  SELECT bm.doc_id, bm.score_m,
    round(list_cosine_similarity(qv.qe, CAST(e.embedding AS DOUBLE[])),
          {spec.ANN_ROUND}) AS sim
  FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id CROSS JOIN qv)
SELECT doc_id, score_m, sim,
  CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
FROM j
"""

    # Integer-lattice PageRank over the phash near-dup graph — chained
    # per-iteration CTEs (the kmeans oracle pattern); every division is
    # BIGINT floor so both sides are bit-exact.
    _prsc = spec.PAGERANK_SCALE
    _prparts = [
        f"""bands AS (
  SELECT key, phash, b.v AS band_idx,
         (phash >> (16 * b.v)) & 65535 AS band_val
  FROM images, LATERAL (SELECT unnest(generate_series(0, {spec.PHASH_BANDS - 1})) AS v) b),
prs AS MATERIALIZED (
  SELECT DISTINCT a.key AS ka, b.key AS kb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.key < b.key
  WHERE bit_count(xor(a.phash, b.phash)) <= {spec.PHASH_HAMMING_MAX}),
edges AS MATERIALIZED (
  SELECT ka AS s, kb AS d FROM prs UNION ALL SELECT kb AS s, ka AS d FROM prs),
deg AS MATERIALIZED (SELECT s, COUNT(*)::BIGINT AS dd FROM edges GROUP BY 1),
nodes AS MATERIALIZED (SELECT DISTINCT s AS v FROM edges),
nn AS (SELECT COUNT(*)::BIGINT AS n FROM nodes),
p0 AS MATERIALIZED (
  SELECT v, CAST({_prsc} // nn.n AS BIGINT) AS r FROM nodes CROSS JOIN nn)"""
    ]
    for _i in range(1, spec.PAGERANK_ITERS + 1):
        _prparts.append(
            f"""p{_i} AS MATERIALIZED (
  SELECT n2.v,
    CAST((15 * {_prsc}) // (100 * nn.n) + COALESCE(c.sc, 0) AS BIGINT) AS r
  FROM nodes n2 CROSS JOIN nn
  LEFT JOIN (
    SELECT e.d AS v, CAST(SUM((p.r * 85) // (100 * dg.dd)) AS BIGINT) AS sc
    FROM edges e JOIN p{_i - 1} p ON p.v = e.s JOIN deg dg ON dg.s = e.s
    GROUP BY 1) c ON c.v = n2.v)"""
        )
    q["image_pagerank"] = (
        f"WITH {IMAGES_CTE},\n"
        + ",\n".join(_prparts)
        + f"""
SELECT 'img-' || CAST(v AS VARCHAR) AS image_id, r AS rank_scaled
FROM p{spec.PAGERANK_ITERS}
"""
    )

    # Extent aggregate: per-sat envelope; min/max over k/1000-OFF doubles
    # equals the converted integer-md min/max (monotonic, injective).
    q["sat_bbox"] = f"""
WITH {IMAGES_CTE}
SELECT sat_id, COUNT(*) AS n_images,
  MIN(x0) AS min_x, MAX(x1) AS max_x, MIN(y0) AS min_y, MAX(y1) AS max_y
FROM images GROUP BY 1
"""

    # Regex extraction + bounded aggregate (RE2 pattern shared verbatim).
    q["caption_suffix_counts"] = f"""
WITH {IMAGES_CTE}
SELECT regexp_extract(caption, '-([A-Z]{{2}})$', 1) AS suffix,
       COUNT(*) AS n_images
FROM images GROUP BY 1
"""

    # Multi-join chain (Q5 shape): integer-cents revenue, same floor
    # expression order as order_item_revenue.
    q["nation_item_revenue"] = """
SELECT n.n_name AS nation, COUNT(*) AS n_items,
       CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1
"""

    # Exact integer covariance numerator per satellite (sufficient
    # statistics in HUGEINT, cast back).
    q["sat_cloud_clear_cov"] = f"""
WITH {IMAGES_CTE},
v AS (SELECT sat_id, CAST(round(cloud_cover * 1000) AS BIGINT) AS x,
             CAST(clear_confidence_percent AS BIGINT) AS y
      FROM images),
a AS (SELECT sat_id, COUNT(*)::BIGINT AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM v GROUP BY 1)
SELECT sat_id, n, sx, sy, CAST(n * sxy - sx * sy AS BIGINT) AS cov_num FROM a
"""

    # Delta-maintenance identity: base-slice + delta-slice counts vs a
    # from-scratch recompute.
    q["count_per_satellite_incremental"] = f"""
WITH {IMAGES_CTE}
SELECT sat_id,
  CAST(SUM(CASE WHEN key % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
  CAST(SUM(CASE WHEN key % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_delta,
  COUNT(*) AS n_total
FROM images GROUP BY 1
"""

    # Per-user behavioral features; mean gap telescopes to
    # (last-first)//(n-1) in exact integer microseconds.
    q["user_features"] = """
SELECT user_id, COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
  CASE WHEN COUNT(*) > 1
       THEN CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // (COUNT(*) - 1) AS BIGINT)
       ELSE 0 END AS mean_gap_us
FROM events GROUP BY 1
"""

    # Chunk export of the cleaned corpus: the clean_decon oracle as a
    # survivor subquery, then the docs_chunks window logic over it.
    q["corpus_clean_chunks"] = rf"""
WITH surv AS ({q["corpus_clean_decon"]}),
tok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents WHERE doc_id IN (SELECT doc_id FROM surv)),
tk AS MATERIALIZED (
  SELECT doc_id, pos, term,
    row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS rn
  FROM tok_raw WHERE term <> '')
SELECT doc_id, CAST(rn // {spec.CHUNK_TOKENS} AS BIGINT) AS chunk_idx,
       COUNT(*)::BIGINT AS n_tokens,
       string_agg(term, ' ' ORDER BY pos) AS chunk_text
FROM tk GROUP BY 1, 2
"""

    # Decoded pixel-value histogram: pixel(i) = (key + i) % 256 is a
    # rotated ramp, so per image cnt(v) = n//256 + [((v - key) mod 256)
    # < n mod 256]; qraw8 masks to multiples of 4 (sum of the 4 raw
    # bins).  Engine counts REAL bytes; this is the closed form.
    q["pixel_histogram"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
n_img AS (SELECT fmt, key % 256 AS k0,
                 CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
          FROM images),
raw AS (
  SELECT 'raw8' AS fmt, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v WHERE i.fmt = 'raw8' GROUP BY 2),
qr AS (
  SELECT 'qraw8' AS fmt, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v + j.j - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v CROSS JOIN js j
  WHERE i.fmt = 'qraw8' AND v.v % 4 = 0 GROUP BY 2)
SELECT fmt, value, n_pixels FROM raw WHERE n_pixels > 0
UNION ALL
SELECT fmt, value, n_pixels FROM qr WHERE n_pixels > 0
"""

    # Per-label mean embedding on the kmeans integer lattice; FLOOR of
    # the double division mirrors the engine reduce exactly.
    q["label_centroids"] = f"""
WITH qv AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {spec.KMEANS_QUANT}) AS BIGINT) AS v
  FROM embeddings)
SELECT label, dim, COUNT(*) AS n_vecs,
  CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS centroid_q
FROM qv GROUP BY 1, 2
"""

    # Composed cluster quality: per-label exact integer inertia against
    # the label centroids above; mean = BIGINT floor division.
    q["label_inertia"] = f"""
WITH qv AS (
  SELECT CAST(label AS BIGINT) AS label, vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {spec.KMEANS_QUANT}) AS BIGINT) AS v
  FROM embeddings),
cent AS (
  SELECT label, dim,
    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM qv GROUP BY 1, 2),
per_vec AS (
  SELECT q.label, q.vec_id, CAST(SUM((q.v - c.c) * (q.v - c.c)) AS BIGINT) AS d2
  FROM qv q JOIN cent c USING (label, dim) GROUP BY 1, 2)
SELECT label, COUNT(*) AS n_vecs, CAST(SUM(d2) AS BIGINT) AS inertia,
  CAST(CAST(SUM(d2) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_inertia
FROM per_vec GROUP BY 1
"""

    # Hotspot detection: top-k nonempty cells by 3x3 neighborhood mass
    # (ties -> lowest grid_lon, grid_lat).
    q["grid_hotspots"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT CAST(floor(centroid_lon) AS BIGINT) AS gx,
         CAST(floor(centroid_lat) AS BIGINT) AS gy, COUNT(*)::BIGINT AS n
  FROM images GROUP BY 1, 2),
nb AS (SELECT unnest(generate_series(-1, 1)) AS d),
g AS (
  SELECT c.gx, c.gy, c.n, CAST(SUM(c2.n) AS BIGINT) AS g9
  FROM cells c
  JOIN nb dx ON TRUE JOIN nb dy ON TRUE
  JOIN cells c2 ON c2.gx = c.gx + dx.d AND c2.gy = c.gy + dy.d
  GROUP BY 1, 2, 3)
SELECT gx AS grid_lon, gy AS grid_lat, n AS n_images, g9,
  CAST(row_number() OVER (ORDER BY g9 DESC, gx, gy) AS BIGINT) AS rank
FROM g ORDER BY rank LIMIT {spec.HOTSPOT_TOPK}
"""

    # Markov transition counts: lead() over (ts, event_id) per user.
    q["events_transitions"] = """
WITH seq AS (
  SELECT user_id, event_type AS a,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
  FROM events)
SELECT a AS from_type, b AS to_type, COUNT(*) AS n
FROM seq WHERE b IS NOT NULL GROUP BY 1, 2
"""

    # Revisit detection: same-sat pairs <= 1 h apart, key-ordered; dup
    # corpus keys never self-pair (a.key < b.key).
    q["sat_revisit_pairs"] = f"""
WITH {IMAGES_CTE}
SELECT a.sat_id, a.image_id AS image_a, b.image_id AS image_b,
  CAST(epoch_us(b.time_acquired) - epoch_us(a.time_acquired) AS BIGINT) AS dt_us
FROM images a JOIN images b
  ON a.sat_id = b.sat_id AND a.key < b.key
 AND abs(epoch_us(b.time_acquired) - epoch_us(a.time_acquired)) <= 3600000000
"""

    # Proximity-buffered re-capture: revisit pairs whose footprint boxes
    # (each expanded by RECAPTURE_BUFFER_MD) intersect — compared in
    # exact integer millidegrees on BOTH sides.
    _rb2 = 2 * spec.RECAPTURE_BUFFER_MD
    q["sat_recapture_pairs"] = f"""
WITH {IMAGES_CTE}
SELECT a.sat_id, a.image_id AS image_a, b.image_id AS image_b,
  CAST(epoch_us(b.time_acquired) - epoch_us(a.time_acquired) AS BIGINT) AS dt_us
FROM images a JOIN images b
  ON a.sat_id = b.sat_id AND a.key < b.key
 AND abs(epoch_us(b.time_acquired) - epoch_us(a.time_acquired)) <= 3600000000
 AND (a.lon_md - a.hw_md) <= (b.lon_md + b.hw_md) + {_rb2}
 AND (b.lon_md - b.hw_md) <= (a.lon_md + a.hw_md) + {_rb2}
 AND (a.lat_md - a.hw_md) <= (b.lat_md + b.hw_md) + {_rb2}
 AND (b.lat_md - b.hw_md) <= (a.lat_md + a.hw_md) + {_rb2}
"""

    # Percent-of-total window over the nation revenue aggregate.
    q["nation_revenue_share"] = """
WITH base AS (
  SELECT n.n_name AS nation, COUNT(*) AS n_orders,
         CAST(SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1)
SELECT nation, n_orders, revenue_cents,
  CAST(revenue_cents * 1000000 // CAST(SUM(revenue_cents) OVER () AS BIGINT) AS BIGINT) AS share_ppm
FROM base
"""

    # Area-weighted coverage centroid per country: exact int64 moment
    # sums, degrees via the single mirrored float expression.
    q["country_coverage_centroid"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE},
j AS (
  SELECT n.iso, (2 * i.hw_md) * (2 * i.hw_md) AS a_md2, i.lon_md, i.lat_md
  FROM countries n JOIN images i
    ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1),
agg AS (
  SELECT iso, COUNT(*) AS n_images,
    CAST(SUM(a_md2) AS BIGINT) AS area_md2,
    CAST(SUM(a_md2 * lon_md) AS BIGINT) AS wx,
    CAST(SUM(a_md2 * lat_md) AS BIGINT) AS wy
  FROM j GROUP BY 1)
SELECT iso, n_images, area_md2, wx, wy,
  (CAST(wx AS DOUBLE) / area_md2) / 1000.0 - {spec.LON_OFF} AS cx,
  (CAST(wy AS DOUBLE) / area_md2) / 1000.0 - {spec.LAT_OFF} AS cy
FROM agg
"""

    # Exact heavy hitters over the nonempty-token stream.
    q["top_terms"] = rf"""
WITH tok_raw AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tk AS (SELECT term FROM tok_raw WHERE term <> '')
SELECT term, COUNT(*) AS n FROM tk GROUP BY 1
ORDER BY n DESC, term LIMIT {spec.TOP_TERMS_K}
"""

    # Multi-resolution cell pyramid: integer-md floor division per
    # level (edge = 4000 // 2^(r-5)).
    _pyr = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS res,
       lon_md // {4000 // (2 ** (r - 5))} AS cell_x,
       lat_md // {4000 // (2 ** (r - 5))} AS cell_y,
       COUNT(*) AS n_images
FROM images GROUP BY 2, 3"""
        for r in (5, 7, 9)
    )
    q["cell_pyramid_counts"] = f"""
WITH {IMAGES_CTE}
{_pyr}
"""

    # True footprint covering at res 5-9: the bbox explodes to every
    # cell it intersects.  +4000 md (a common multiple of all edges)
    # keeps the floors non-negative, where DuckDB's truncating // and
    # numpy's flooring // agree; the whole-cell offset is subtracted
    # back out.  Two-stage unnest = cross product of the x and y ranges.
    _cov_blocks = []
    for _r in (5, 6, 7, 8, 9):
        _e = 4000 // (2 ** (_r - 5))
        _oc = 4000 // _e
        _cov_blocks.append(f"""SELECT res, cell_x, unnest(generate_series(yy0, yy1)) - {_oc} AS cell_y
FROM (
  SELECT CAST({_r} AS BIGINT) AS res,
         unnest(generate_series((lon_md - hw_md + 4000) // {_e},
                                (lon_md + hw_md + 4000) // {_e})) - {_oc} AS cell_x,
         (lat_md - hw_md + 4000) // {_e} AS yy0,
         (lat_md + hw_md + 4000) // {_e} AS yy1
  FROM images)""")
    _cov = "\nUNION ALL\n".join(_cov_blocks)
    q["footprint_cover_counts"] = f"""
WITH {IMAGES_CTE}
SELECT res, cell_x, cell_y, COUNT(*) AS n_images
FROM ({_cov})
GROUP BY 1, 2, 3
"""

    # Covering fanout per level: closed-form cell count of the bbox.
    _cfh = "\nUNION ALL\n".join(
        f"""SELECT CAST({_r} AS BIGINT) AS res,
       ((lon_md + hw_md + 4000) // {4000 // (2 ** (_r - 5))}
        - (lon_md - hw_md + 4000) // {4000 // (2 ** (_r - 5))} + 1)
     * ((lat_md + hw_md + 4000) // {4000 // (2 ** (_r - 5))}
        - (lat_md - hw_md + 4000) // {4000 // (2 ** (_r - 5))} + 1) AS n_cells
FROM images"""
        for _r in (5, 6, 7, 8, 9)
    )
    q["footprint_cover_res_hist"] = f"""
WITH {IMAGES_CTE}
SELECT res, n_cells, COUNT(*) AS n_images
FROM ({_cfh})
GROUP BY 1, 2
"""

    # H3-style compact of the occupied res-7 centroid-cell set: promote
    # a parent when all 4 children are present, twice (7->6->5); emit
    # each surviving cell at the coarsest level that fully covers it.
    q["cell_compact_cover"] = f"""
WITH {IMAGES_CTE},
occ7 AS (SELECT DISTINCT lon_md // 1000 AS cx, lat_md // 1000 AS cy FROM images),
f6 AS (SELECT cx // 2 AS cx, cy // 2 AS cy FROM occ7 GROUP BY 1, 2 HAVING COUNT(*) = 4),
f5 AS (SELECT cx // 2 AS cx, cy // 2 AS cy FROM f6 GROUP BY 1, 2 HAVING COUNT(*) = 4)
SELECT CAST(5 AS BIGINT) AS res, cx AS cell_x, cy AS cell_y FROM f5
UNION ALL
SELECT CAST(6 AS BIGINT), a.cx, a.cy
FROM f6 a LEFT JOIN f5 b ON a.cx // 2 = b.cx AND a.cy // 2 = b.cy
WHERE b.cx IS NULL
UNION ALL
SELECT CAST(7 AS BIGINT), a.cx, a.cy
FROM occ7 a LEFT JOIN f6 b ON a.cx // 2 = b.cx AND a.cy // 2 = b.cy
WHERE b.cx IS NULL
"""

    # Temperature (alpha = 0.5) multilingual sampling weights, relative
    # to the most frequent language: sqrt(max_n / n) is one divide +
    # one sqrt, both correctly-rounded IEEE ops — bit-exact both sides.
    q["lang_mixture_weights"] = """
WITH lc AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
m AS (SELECT MAX(n_docs) AS mx FROM lc)
SELECT lang, n_docs, SQRT(CAST(mx AS DOUBLE) / n_docs) AS weight_rel
FROM lc, m
"""

    # Exact global percentiles of events.value (PERCENTILE_DISC picks
    # an actual element — no interpolation float risk).
    q["events_value_quantiles"] = "\nUNION ALL\n".join(
        f"""SELECT CAST({p} AS BIGINT) AS p,
       percentile_disc({p / 100}) WITHIN GROUP (ORDER BY value) AS value
FROM events"""
        for p in (25, 50, 75, 90, 99)
    )

    # Per-dimension embedding stats on the 2^20 integer lattice
    # (float32 * 2^20 exact in double, floor exact; zipped unnest gives
    # value + ordinal per element).
    q["embedding_dim_stats"] = """
WITH x AS (
  SELECT unnest(embedding) AS v, unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
qx AS (SELECT i - 1 AS dim, CAST(floor(CAST(v AS DOUBLE) * 1048576) AS BIGINT) AS q FROM x)
SELECT dim, COUNT(*) AS n_vecs,
       CAST(SUM(q) AS BIGINT) AS sum_q,
       CAST(SUM(q * q) AS BIGINT) AS sumsq_q
FROM qx GROUP BY 1
"""

    # Spatio-temporal mosaic completeness: distinct tiles per month,
    # split by whether any covering image was clear (< 0.2 cloud).
    q["tile_month_clear_coverage"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
tm AS (
  SELECT t.tile_id,
         CAST(year(i.time_acquired) * 100 + month(i.time_acquired) AS BIGINT) AS ym,
         MAX(CASE WHEN i.cloud_cover < 0.2 THEN 1 ELSE 0 END) AS has_clear
  FROM img_tiles t JOIN images i USING (key)
  GROUP BY 1, 2
)
SELECT ym, COUNT(*) AS n_tiles,
       CAST(SUM(has_clear) AS BIGINT) AS n_clear_tiles,
       CAST(SUM(has_clear) AS BIGINT) * 1000000 // COUNT(*) AS clear_ppm
FROM tm GROUP BY 1
"""

    # Per-group exact percentiles (grouped distributed selection).
    q["event_type_value_quantiles"] = "\nUNION ALL\n".join(
        f"""SELECT event_type, CAST({p} AS BIGINT) AS p,
       percentile_disc({p / 100}) WITHIN GROUP (ORDER BY value) AS value
FROM events GROUP BY 1"""
        for p in (25, 50, 75, 90, 99)
    )

    # Fleet churn: distinct (sat, calendar month) presence; new = no
    # presence the previous month, churned-next = none the following
    # month (0 for the final observed month by convention).
    q["sat_month_churn"] = f"""
WITH {IMAGES_CTE},
pres AS (SELECT DISTINCT sat_id,
         CAST(year(time_acquired) * 12 + month(time_acquired) AS BIGINT) AS m
         FROM images),
mm AS (SELECT MAX(m) AS mx FROM pres)
SELECT CAST((p.m - 1) // 12 AS BIGINT) * 100 + ((p.m - 1) % 12 + 1) AS ym,
       COUNT(*) AS n_active,
       CAST(SUM(CASE WHEN prv.sat_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN p.m < (SELECT mx FROM mm) AND nxt.sat_id IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned_next
FROM pres p
LEFT JOIN pres prv ON prv.sat_id = p.sat_id AND prv.m = p.m - 1
LEFT JOIN pres nxt ON nxt.sat_id = p.sat_id AND nxt.m = p.m + 1
GROUP BY 1
"""

    # IVF over the lattice kmeans: reuse the kmeans chained CTEs, then
    # final assignment + per-query probe lists + rounded-cosine re-rank
    # within the probed lists — an APPROXIMATE index with an exact
    # oracle.
    q["ann_ivf_lattice_topk"] = (
        "WITH "
        + ",\n".join(_kparts)
        + f""",
dfin AS (SELECT q.vec_id, c.cid, SUM((q.qv - c.qv) * (q.qv - c.qv)) AS dist
  FROM q JOIN c{_kit} c USING (dim) GROUP BY 1, 2),
af AS (SELECT vec_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dfin) WHERE rn = 1),
pr AS (SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM dfin WHERE vec_id % {spec.ANN_QUERY_MOD} = 0)
  WHERE rn <= {spec.IVF_LAT_PROBE}),
qv2 AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        FROM embeddings WHERE vec_id % {spec.ANN_QUERY_MOD} = 0),
cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
         FROM pr p JOIN af a ON a.cid = p.cid),
sims AS (
  SELECT c.query_id, c.neighbor_id,
    round(list_cosine_similarity(qv2.qe, CAST(e.embedding AS DOUBLE[])),
          {spec.ANN_ROUND}) AS sim
  FROM cand c JOIN qv2 USING (query_id)
  JOIN embeddings e ON e.vec_id = c.neighbor_id),
ranked AS (SELECT query_id, neighbor_id, sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {spec.ANN_TOPK}
"""
    )

    # Sign-LSH multi-probe ANN: the 16 hyperplanes are deterministic
    # module constants, so even THIS approximation mirrors — each sign
    # is an explicit left-to-right 64-term dot expression (plane
    # literals round-trip exactly; a sign flip would need |dot| ~ 1e-15,
    # ruled out empirically on the fixed test data).
    from .stages.ann import _PLANES as _lsh_planes

    _sign_terms = []
    _n_planes, _n_dims = _lsh_planes.shape
    for _i in range(_n_planes):
        _terms = " + ".join(
            f"({float(_lsh_planes[_i, _d])!r} * e[{_d + 1}])" for _d in range(_n_dims)
        )
        _sign_terms.append(
            f"CASE WHEN round({_terms}, {spec.ANN_ROUND}) > 0 THEN {1 << _i} ELSE 0 END"
        )
    _bucket_expr = "\n    + ".join(_sign_terms)
    q["ann_lsh_topk"] = f"""
WITH b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
bk AS MATERIALIZED (
  SELECT vec_id, e,
    CAST({_bucket_expr} AS BIGINT) AS bucket
  FROM b),
qb AS (SELECT vec_id AS query_id, bucket AS qbucket, e AS qe
       FROM bk WHERE vec_id % {spec.ANN_QUERY_MOD} = 0),
sims AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
    round(list_cosine_similarity(q.qe, v.e), {spec.ANN_ROUND}) AS sim
  FROM qb q JOIN bk v ON bit_count(xor(q.qbucket, v.bucket)) <= {spec.LSH_PROBE_HAMMING}),
ranked AS (SELECT query_id, neighbor_id, sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims)
SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {spec.ANN_TOPK}
"""

    # Split-balance QC: same ST_SPLIT bucket as dataset_split, token
    # rule mirrors docs_token_stats.
    q["split_token_stats"] = rf"""
WITH d AS (
  SELECT CASE WHEN b < {spec.SPLIT_TRAIN_PCT} THEN 'train'
              WHEN b < {spec.SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
    CASE WHEN trim(text) = '' THEN 0
         ELSE array_length(string_split_regex(trim(text), '\s+')) END AS ntok,
    n_chars
  FROM (SELECT *, {_mix(f'(doc_id % {M})', spec.ST_SPLIT)} % 100 AS b FROM documents))
SELECT split, COUNT(*) AS n_docs,
  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM d GROUP BY 1
"""

    # SimHash near-dup pairs: band candidacy (4 x 16-bit) + hamming
    # threshold + lowest-matching-band rule — the same index definition
    # as phash_near_dup, over the simhash_docs signature SQL nested
    # whole as a CTE.
    q["simhash_near_dup"] = f"""
WITH sims AS ({_simhash_sql()}),
bands AS (
  SELECT doc_id, simhash, b.v AS band_idx,
         (simhash >> (16 * b.v)) & 65535 AS band_val
  FROM sims, LATERAL (SELECT unnest(generate_series(0, {spec.SIMHASH_BANDS - 1})) AS v) b),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {spec.SIMHASH_HAMMING_MAX}
"""

    # geo-temporal rollup: country containment x calendar month
    q["country_monthly_coverage"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE}
SELECT n.iso,
       strftime(date_trunc('month', i.time_acquired), '%Y-%m') AS bucket,
       COUNT(*) AS total_images
FROM countries n JOIN images i
  ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1
GROUP BY 1, 2
"""

    # zonal majority: per-image decoded-value counts in closed form
    # (the pixel_histogram math), summed over the box-overlap join,
    # argmax per featureclass (ties -> lowest value)
    q["zonal_majority"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
px AS (SELECT x0, y0, x1, y1, fmt, key % 256 AS k0,
              CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
       FROM images),
pr AS (SELECT l.featureclass, p.fmt, p.k0, p.n
       FROM lc l JOIN px p
         ON p.x0 <= l.x1 AND l.x0 <= p.x1 AND p.y0 <= l.y1 AND l.y0 <= p.y1),
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
hist AS (
  SELECT featureclass, v.v,
    CAST(SUM(CASE WHEN pr.fmt = 'raw8' THEN
      pr.n // 256 + CASE WHEN ((v.v - pr.k0) % 256 + 256) % 256 < pr.n % 256
                         THEN 1 ELSE 0 END
    WHEN v.v % 4 = 0 THEN
      4 * (pr.n // 256)
      + CASE WHEN ((v.v + 0 - pr.k0) % 256 + 256) % 256 < pr.n % 256 THEN 1 ELSE 0 END
      + CASE WHEN ((v.v + 1 - pr.k0) % 256 + 256) % 256 < pr.n % 256 THEN 1 ELSE 0 END
      + CASE WHEN ((v.v + 2 - pr.k0) % 256 + 256) % 256 < pr.n % 256 THEN 1 ELSE 0 END
      + CASE WHEN ((v.v + 3 - pr.k0) % 256 + 256) % 256 < pr.n % 256 THEN 1 ELSE 0 END
    ELSE 0 END) AS BIGINT) AS n_pixels
  FROM pr CROSS JOIN vals v GROUP BY 1, 2)
SELECT featureclass, CAST(v AS BIGINT) AS mode_value, n_pixels FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY featureclass ORDER BY n_pixels DESC, v) AS rn
  FROM hist) WHERE rn = 1 AND n_pixels > 0
"""

    # cross-split leakage: MinHash near-dup pairs (est_jaccard >= 0.5,
    # the docs_dedup_near threshold) spanning splits; the full minhash
    # pair SQL nests as a CTE, splits derive from the pair's doc ids
    # with the same ST_SPLIT bucket rule as dataset_split
    _split_case = (
        f"CASE WHEN {{b}} < {spec.SPLIT_TRAIN_PCT} THEN 'train' "
        f"WHEN {{b}} < {spec.SPLIT_VAL_PCT} THEN 'val' ELSE 'test' END"
    )
    _sp_a = _split_case.format(b=_mix(f"(doc_a % {M})", spec.ST_SPLIT) + " % 100")
    _sp_b = _split_case.format(b=_mix(f"(doc_b % {M})", spec.ST_SPLIT) + " % 100")
    q["split_leakage"] = f"""
WITH mh AS ({_minhash_sql()}),
p AS (
  SELECT LEAST({_sp_a}, {_sp_b}) AS split_a,
         GREATEST({_sp_a}, {_sp_b}) AS split_b
  FROM mh WHERE est_jaccard >= 0.5)
SELECT split_a, split_b, COUNT(*)::BIGINT AS n_pairs
FROM p GROUP BY 1, 2
"""

    # per-satellite track statistics: consecutive-acquisition legs via
    # lag() over (sat, ORDER BY t, key); integer md² distances; sats
    # with one image have no legs and drop (inner join)
    _t_expr = f"{_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}"
    q["sat_track_stats"] = f"""
WITH {IMAGES_CTE},
v AS (SELECT sat_id, key, {_t_expr} AS t, lon_md, lat_md FROM images),
l AS (SELECT sat_id,
        t - lag(t) OVER w AS dt,
        lon_md - lag(lon_md) OVER w AS dx,
        lat_md - lag(lat_md) OVER w AS dy
      FROM v WINDOW w AS (PARTITION BY sat_id ORDER BY t, key)),
a1 AS (SELECT sat_id, COUNT(*)::BIGINT AS n_images FROM v GROUP BY 1),
a2 AS (SELECT sat_id, COUNT(*)::BIGINT AS n_legs,
         CAST(MAX(dt) AS BIGINT) AS max_gap_hours,
         CAST(MAX(dx*dx + dy*dy) AS BIGINT) AS max_leg_md2,
         CAST(SUM(dx*dx + dy*dy) AS BIGINT) AS sum_leg_md2
       FROM l WHERE dt IS NOT NULL GROUP BY 1)
SELECT a1.sat_id, n_images, n_legs, max_gap_hours, max_leg_md2, sum_leg_md2
FROM a1 JOIN a2 USING (sat_id)
"""

    # exact PERCENT_RANK as integer ppm via the bounded level histogram
    q["cloud_percent_rank"] = f"""
WITH {IMAGES_CTE},
lv AS (SELECT image_id, CAST(round(cloud_cover * 1000) AS BIGINT) AS cloud_md
       FROM images),
tot AS (SELECT COUNT(*)::BIGINT AS n FROM lv),
h AS (SELECT cloud_md, COUNT(*)::BIGINT AS c FROM lv GROUP BY 1),
p AS (SELECT cloud_md,
        CAST(COALESCE(SUM(c) OVER (
          ORDER BY cloud_md ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          0) AS BIGINT) AS n_less
      FROM h)
SELECT lv.image_id, lv.cloud_md,
       (p.n_less * 1000000) // GREATEST(tot.n - 1, 1) AS pct_ppm
FROM lv JOIN p USING (cloud_md) CROSS JOIN tot
"""

    # deterministic shuffled page: hash rank + ROW_NUMBER + LIMIT
    q["docs_shuffled_page"] = f"""
SELECT ROW_NUMBER() OVER (ORDER BY r, doc_id) AS pos, doc_id, r AS rank
FROM (SELECT doc_id, {_mix(f'(doc_id % {M})', spec.ST_SHUFFLE)} AS r FROM documents)
ORDER BY pos LIMIT {spec.SHUFFLE_PAGE_K}
"""

    # THE composed release pipeline: decon+clean+exact-dedup survivors
    # (the corpus_clean_decon SQL, nested whole) minus minhash near-dup
    # non-canonicals (the docs_dedup_near closure), packed per split
    q["corpus_release"] = f"""
{_minhash_closure_cte()},
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
drops AS (SELECT node FROM comp WHERE node <> cluster),
surv AS ({q["corpus_clean_decon"]}),
rel AS (SELECT * FROM surv WHERE doc_id NOT IN (SELECT node FROM drops)),
packed AS (
  SELECT doc_id, pred_lang, split, CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY split ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
  FROM rel)
SELECT doc_id, pred_lang, split, n_tokens, cum // {spec.PACK_CAP} AS bin_id
FROM packed
"""

    # areal interpolation: exact integer-md² intersection areas under
    # the same closed-box join predicate as country_image_counts
    q["country_overlap_area"] = f"""
WITH {IMAGES_CTE},
ctry AS (
  SELECT n_name AS iso,
    (n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} AS cx0,
    (n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} + {spec.CTRY_W_MD} AS cx1,
    (n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} AS cy0,
    (n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} + {spec.CTRY_H_MD} AS cy1
  FROM nation),
j AS (
  SELECT c.iso,
    (LEAST(i.lon_md + i.hw_md, c.cx1) - GREATEST(i.lon_md - i.hw_md, c.cx0))
      * (LEAST(i.lat_md + i.hw_md, c.cy1) - GREATEST(i.lat_md - i.hw_md, c.cy0))
      AS inter
  FROM ctry c JOIN images i
    ON i.lon_md - i.hw_md <= c.cx1 AND c.cx0 <= i.lon_md + i.hw_md
   AND i.lat_md - i.hw_md <= c.cy1 AND c.cy0 <= i.lat_md + i.hw_md)
SELECT iso, COUNT(*)::BIGINT AS n_images,
  CAST(SUM(inter) AS BIGINT) AS overlap_md2,
  CAST(SUM(inter) AS DOUBLE) / {spec.CTRY_W_MD * spec.CTRY_H_MD} AS overlap_ratio
FROM j GROUP BY 1
"""

    # spatial self-join density: neighbors within the Chebyshev box
    # (exact integer md); DuckDB's IEJoin handles the two BETWEEN range
    # predicates without the grid decomposition the engine uses.
    # Images with zero neighbors do not appear (both sides).
    q["image_density"] = f"""
WITH {IMAGES_CTE},
pt AS (SELECT DISTINCT key, lon_md AS x, lat_md AS y FROM images)
SELECT 'img-' || CAST(a.key AS VARCHAR) AS image_id,
       COUNT(*)::BIGINT AS n_neighbors
FROM pt a JOIN pt b
  ON b.x BETWEEN a.x - {spec.DENSITY_RADIUS_MD} AND a.x + {spec.DENSITY_RADIUS_MD}
 AND b.y BETWEEN a.y - {spec.DENSITY_RADIUS_MD} AND a.y + {spec.DENSITY_RADIUS_MD}
 AND a.key <> b.key
GROUP BY 1
"""

    # per-country longest revisit gap over the containment join
    q["country_revisit_gap"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE},
j AS (SELECT n.iso, {_t_expr} AS t
      FROM countries n JOIN images i
        ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1),
d AS (SELECT iso, t - lag(t) OVER (PARTITION BY iso ORDER BY t) AS dt FROM j)
SELECT iso, COUNT(*)::BIGINT AS n_images, CAST(MAX(dt) AS BIGINT) AS max_gap_hours
FROM d GROUP BY 1
"""

    # per-node triangle counts on the phash near-dup graph: each
    # triangle a<b<c closes via three prs rows; every vertex of every
    # triangle contributes one count
    q["image_triangles"] = f"""
WITH {_PHASH_PRS_CTES},
tri AS (
  SELECT e1.ka AS a, e1.kb AS b, e2.kb AS c
  FROM prs e1 JOIN prs e2 ON e2.ka = e1.kb
  JOIN prs e3 ON e3.ka = e1.ka AND e3.kb = e2.kb),
tn AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT 'img-' || CAST(node AS VARCHAR) AS image_id,
       COUNT(*)::BIGINT AS n_triangles
FROM tn GROUP BY 1
"""

    # exact NTILE(4) per satellite over footprint half-width; quartile
    # aggregates are tie-order-free (duplicate corpus rows are
    # bit-identical, so any NTILE assignment among them aggregates the
    # same)
    q["sat_area_quartiles"] = f"""
WITH {IMAGES_CTE},
t AS (SELECT sat_id, hw_md,
        NTILE(4) OVER (PARTITION BY sat_id ORDER BY hw_md, key) AS quartile
      FROM images)
SELECT sat_id, CAST(quartile AS BIGINT) AS quartile,
       COUNT(*)::BIGINT AS n_images,
       CAST(SUM(4 * hw_md * hw_md) AS BIGINT) AS area_md2
FROM t GROUP BY 1, 2
"""

    # winsorized per-satellite cloud mean: quantile_disc thresholds
    # (ceil(q*n) 1-based, the sat_cloud_quantiles convention), clamp,
    # exact integer micro-mean
    q["sat_cloud_winsorized"] = f"""
WITH {IMAGES_CTE},
lv AS (SELECT sat_id, CAST(round(cloud_cover * 1000) AS BIGINT) AS c FROM images),
th AS (SELECT sat_id, COUNT(*)::BIGINT AS n_images,
         CAST(quantile_disc(c, 0.10) AS BIGINT) AS p10_md,
         CAST(quantile_disc(c, 0.90) AS BIGINT) AS p90_md
       FROM lv GROUP BY 1)
SELECT t.sat_id, t.n_images, t.p10_md, t.p90_md,
       CAST(SUM(LEAST(GREATEST(l.c, t.p10_md), t.p90_md)) * 1000
         // t.n_images AS BIGINT) AS wins_mean_micro
FROM lv l JOIN th t USING (sat_id)
GROUP BY 1, 2, 3, 4
"""

    # per-doc duplicated-shingle coverage: distinct (doc, shingle) ->
    # global df -> per-doc share of df>=2 shingles, integer ppm
    q["docs_dup_shingles"] = f"""
WITH {_WIN_CTE},
sh AS (SELECT DISTINCT doc_id, {_fnv_shingle('t', 'i')} AS h FROM win),
df AS (SELECT h, COUNT(*)::BIGINT AS df FROM sh GROUP BY 1),
per AS (SELECT s.doc_id, COUNT(*)::BIGINT AS n_shingles,
          SUM(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
        FROM sh s JOIN df d USING (h) GROUP BY 1)
SELECT doc_id, n_shingles, n_dup,
       n_dup * 1000000 // n_shingles AS dup_ppm
FROM per
"""

    # basket-style country co-occurrence: DISTINCT (nationkey, image)
    # containment rows self-joined on the image, ordered by nationkey
    q["country_cooccurrence"] = f"""
WITH {IMAGES_CTE},
ctry AS (
  SELECT n_nationkey AS ck, n_name AS iso,
    ((n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} - 170000)/1000.0 AS x0,
    ((n_nationkey % {spec.CTRY_NX}) * {spec.CTRY_W_MD} - 170000 + {spec.CTRY_W_MD})/1000.0 AS x1,
    ((n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} - 66000)/1000.0 AS y0,
    ((n_nationkey // {spec.CTRY_NX}) * {spec.CTRY_H_MD} - 66000 + {spec.CTRY_H_MD})/1000.0 AS y1
  FROM nation),
j AS (SELECT DISTINCT c.ck, c.iso, i.key
      FROM ctry c JOIN images i
        ON i.x0 <= c.x1 AND c.x0 <= i.x1 AND i.y0 <= c.y1 AND c.y0 <= i.y1)
SELECT a.iso AS iso_a, b.iso AS iso_b, COUNT(*)::BIGINT AS n_images
FROM j a JOIN j b ON a.key = b.key AND a.ck < b.ck
GROUP BY 1, 2
"""

    # language-ID confusion matrix: actual lang label x LangId
    # prediction (the docs_langid SQL nests whole); empty-trim docs drop
    q["langid_confusion"] = f"""
WITH pred AS ({q["docs_langid"]})
SELECT d.lang, p.pred_lang, COUNT(*)::BIGINT AS n_docs
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2
"""

    # exact distinct active days per (satellite, calendar month)
    q["sat_monthly_active_days"] = f"""
WITH {IMAGES_CTE},
d AS (SELECT DISTINCT sat_id, CAST(time_acquired AS DATE) AS day FROM images)
SELECT sat_id, strftime(date_trunc('month', day), '%Y-%m') AS month,
       COUNT(*)::BIGINT AS n_days
FROM d GROUP BY 1, 2
"""

    # per-cluster dedup-QA: members from the closure, edge stats from
    # the pair set re-joined to DISTINCT phashes (duplicate corpus keys
    # would multiply the join otherwise)
    q["phash_cluster_density"] = f"""
{_phash_closure_cte()},
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
mem AS (SELECT cluster, COUNT(*)::BIGINT AS n_members FROM comp GROUP BY 1),
ik AS (SELECT DISTINCT key, phash FROM imgs),
eh AS (SELECT c.cluster, bit_count(xor(ia.phash, ib.phash)) AS ham
       FROM prs p JOIN comp c ON c.node = p.ka
       JOIN ik ia ON ia.key = p.ka JOIN ik ib ON ib.key = p.kb),
es AS (SELECT cluster, COUNT(*)::BIGINT AS n_edges,
         CAST(MIN(ham) AS BIGINT) AS min_hamming,
         CAST(SUM(ham) AS BIGINT) AS sum_hamming
       FROM eh GROUP BY 1)
SELECT 'img-' || CAST(m.cluster AS VARCHAR) AS cluster_id,
       m.n_members, e.n_edges, e.min_hamming, e.sum_hamming
FROM mem m JOIN es e ON e.cluster = m.cluster
"""

    # AOI coverage gaps: the dense AOI tile scaffold minus every tile
    # any image footprint touches
    q["tile_gaps"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
xs AS (SELECT unnest(generate_series(
    CAST(floor(({spec.AOI_X0} + {spec.LON_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT),
    CAST(floor(({spec.AOI_X1} + {spec.LON_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT))) AS tx),
ys AS (SELECT unnest(generate_series(
    CAST(floor(({spec.AOI_Y0} + {spec.LAT_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT),
    CAST(floor(({spec.AOI_Y1} + {spec.LAT_OFF}) * {spec.TILE_PER_DEG}) AS BIGINT))) AS ty),
sc AS (SELECT (xs.tx + 2) * {spec.TILE_STRIDE} + (ys.ty + 2) AS tile_id
       FROM xs CROSS JOIN ys)
SELECT sc.tile_id FROM sc
WHERE sc.tile_id NOT IN (SELECT tile_id FROM img_tiles)
"""

    # ANN index-quality eval: per-query recall@k of the sign-LSH result
    # against the exact brute-force baseline (both SQL mirrors nest
    # whole); every brute query has exactly k rows, LSH may have fewer
    q["ann_recall_eval"] = f"""
WITH b AS ({q["ann_topk"]}),
l AS ({q["ann_lsh_topk"]}),
c AS (SELECT b.query_id, COUNT(*)::BIGINT AS n_common
      FROM b JOIN l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
      GROUP BY 1),
nb AS (SELECT query_id, COUNT(*)::BIGINT AS n_brute FROM b GROUP BY 1),
nl AS (SELECT query_id, COUNT(*)::BIGINT AS n_lsh FROM l GROUP BY 1)
SELECT nb.query_id, nb.n_brute,
       COALESCE(nl.n_lsh, 0) AS n_lsh,
       COALESCE(c.n_common, 0) AS n_common,
       COALESCE(c.n_common, 0) * 1000000 // GREATEST(nb.n_brute, 1) AS recall_ppm
FROM nb LEFT JOIN nl USING (query_id) LEFT JOIN c USING (query_id)
"""

    # robust dispersion: per-satellite median + median absolute
    # deviation on the exact level lattice (quantile_disc convention)
    q["sat_cloud_mad"] = f"""
WITH {IMAGES_CTE},
lv AS (SELECT sat_id, CAST(round(cloud_cover * 1000) AS BIGINT) AS c FROM images),
med AS (SELECT sat_id, COUNT(*)::BIGINT AS n_images,
          CAST(quantile_disc(c, 0.50) AS BIGINT) AS median_md
        FROM lv GROUP BY 1),
dev AS (SELECT l.sat_id, abs(l.c - m.median_md) AS d FROM lv l JOIN med m USING (sat_id))
SELECT m.sat_id, m.n_images, m.median_md,
       CAST(quantile_disc(d.d, 0.50) AS BIGINT) AS mad_md
FROM dev d JOIN med m USING (sat_id)
GROUP BY 1, 2, 3
"""

    # per-source near-dup drop rate: the minhash closure's non-canonical
    # nodes left-joined onto the corpus, grouped by ingestion source
    q["dedup_rate_by_source"] = f"""
{_minhash_closure_cte()},
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
drops AS (SELECT node FROM comp WHERE node <> cluster)
SELECT d.source, COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN dr.node IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
       SUM(CASE WHEN dr.node IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         * 1000000 // COUNT(*)::BIGINT AS drop_ppm
FROM documents d LEFT JOIN drops dr ON dr.node = d.doc_id
GROUP BY 1
"""

    # --- relational classics (TPC-H shapes over the raw tables) -----------
    # money math mirrors the Ray side verbatim: floor(<double expr>*100.0)
    # cents summed as BIGINT, averages as ONE double division of those
    # integers (same expression order both sides)

    q["pricing_summary"] = """
WITH agg AS (
  SELECT l_returnflag, l_linestatus,
    SUM(CAST(floor(l_quantity) AS BIGINT)) AS sum_qty,
    SUM(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS sum_base_cents,
    SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS sum_disc_cents,
    SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100.0) AS BIGINT)) AS sum_charge_cents,
    SUM(CAST(floor(l_discount * 100.0) AS BIGINT)) AS sum_disc_pp,
    COUNT(*)::BIGINT AS n_items
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
  GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus, sum_qty::BIGINT AS sum_qty,
       sum_base_cents::BIGINT AS sum_base_cents,
       sum_disc_cents::BIGINT AS sum_disc_cents,
       sum_charge_cents::BIGINT AS sum_charge_cents,
       sum_qty / (1.0 * n_items) AS avg_qty,
       sum_base_cents / (100.0 * n_items) AS avg_price,
       sum_disc_pp / (100.0 * n_items) AS avg_disc,
       n_items
FROM agg
"""

    q["late_order_priorities"] = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '2001-06-01')
GROUP BY 1
"""

    q["customer_order_distribution"] = """
WITH pc AS (
  SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS n_orders
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1)
SELECT n_orders, COUNT(*)::BIGINT AS n_customers FROM pc GROUP BY 1
"""

    q["promo_revenue_monthly"] = """
WITH rows_ AS (
  SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
         CASE WHEN p_type = 'PROMO' THEN 1 ELSE 0 END AS promo,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey)
SELECT ym,
       SUM(CASE WHEN promo = 1 THEN cents ELSE 0 END)::BIGINT AS promo_cents,
       SUM(cents)::BIGINT AS total_cents,
       SUM(CASE WHEN promo = 1 THEN cents ELSE 0 END)::BIGINT * 1000000
         // SUM(cents)::BIGINT AS promo_ppm
FROM rows_ GROUP BY 1
"""

    q["returned_losses_topk"] = """
WITH rev AS (
  SELECT o_custkey,
         SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS revenue_cents,
         COUNT(*)::BIGINT AS n_items
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY 1
  ORDER BY revenue_cents DESC, o_custkey
  LIMIT 20)
SELECT c_custkey, c_name, revenue_cents::BIGINT AS revenue_cents, n_items
FROM rev JOIN customer ON c_custkey = o_custkey
"""

    q["idle_rich_customers"] = """
WITH thr AS (
  SELECT SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) / (100.0 * COUNT(*)) AS t
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey::BIGINT AS c_nationkey,
       COUNT(*)::BIGINT AS n_customers,
       SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT))::BIGINT AS bal_cents
FROM customer, thr
WHERE c_acctbal > thr.t
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-09-01')
GROUP BY 1
"""

    # exact distinct-users-per-day (COUNT DISTINCT through the
    # distinct_values hash exchange on the Ray side)
    q["events_daily_active_users"] = """
SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT user_id)::BIGINT AS dau
FROM events GROUP BY 1
"""

    # lexical richness per source: vocabulary + hapax legomena share
    # (tokenizer shared with top_terms: whitespace split, nonempty)
    q["docs_hapax_ratio"] = r"""
WITH tok_raw AS (
  SELECT source, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tc AS (SELECT source, term, COUNT(*) AS n
       FROM tok_raw WHERE term <> '' GROUP BY 1, 2)
SELECT source, COUNT(*)::BIGINT AS vocab,
       SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax,
       SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT * 1000000
         // COUNT(*)::BIGINT AS hapax_ppm
FROM tc GROUP BY 1
"""

    # int8 symmetric quantization error per label: scale = max|x|/127
    # per vector, round-half-up (floor(v + 0.5) both sides); squared
    # errors floor to integer picos per element before summing
    q["embedding_quantize_error"] = """
WITH m AS (
  SELECT label, vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx,
         embedding
  FROM embeddings),
el AS (SELECT label, vec_id, mx, CAST(unnest(embedding) AS DOUBLE) AS x FROM m),
er AS (SELECT label, vec_id,
         CASE WHEN mx = 0 THEN 0.0
              ELSE x - floor(x * 127.0 / mx + 0.5) * mx / 127.0 END AS err
       FROM el),
pe AS (SELECT label, vec_id,
         CAST(floor(err * err * 1000000000000.0) AS BIGINT) AS picos FROM er),
ag AS (SELECT label, COUNT(*)::BIGINT AS n_elems, SUM(picos)::BIGINT AS sse_picos
       FROM pe GROUP BY 1),
nv AS (SELECT label, COUNT(*)::BIGINT AS n_vecs FROM embeddings GROUP BY 1)
SELECT a.label::BIGINT AS label, nv.n_vecs, a.n_elems, a.sse_picos,
       a.sse_picos / (1000000000000.0 * a.n_elems) AS mean_err2
FROM ag a JOIN nv USING (label)
"""

    # RFM cube: quartile scores by quantile_disc thresholds (1-based
    # rank ceil(q*n) — DuckDB's convention, mirrored by the span-bucketed
    # exact selection on the Ray side); value cents use the
    # user_features floor(value*100.0) convention
    q["events_rfm_cells"] = """
WITH u AS (
  SELECT user_id, COUNT(*)::BIGINT AS f,
         SUM(CAST(floor(value * 100.0) AS BIGINT)) AS m,
         CAST(date_diff('day', CAST(MAX(ts) AS DATE), DATE '2024-06-01') AS BIGINT) AS r
  FROM events GROUP BY 1),
t AS (SELECT
  quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.50) AS r2, quantile_disc(r, 0.75) AS r3,
  quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.50) AS f2, quantile_disc(f, 0.75) AS f3,
  quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.50) AS m2, quantile_disc(m, 0.75) AS m3
  FROM u),
s AS (SELECT
  1 + CAST(r > t.r1 AS INT) + CAST(r > t.r2 AS INT) + CAST(r > t.r3 AS INT) AS r_score,
  1 + CAST(f > t.f1 AS INT) + CAST(f > t.f2 AS INT) + CAST(f > t.f3 AS INT) AS f_score,
  1 + CAST(m > t.m1 AS INT) + CAST(m > t.m2 AS INT) + CAST(m > t.m3 AS INT) AS m_score
  FROM u, t)
SELECT r_score::BIGINT AS r_score, f_score::BIGINT AS f_score,
       m_score::BIGINT AS m_score, COUNT(*)::BIGINT AS n_users
FROM s GROUP BY 1, 2, 3
"""

    # rolling 7-day active users: every distinct (day,user) pair
    # supports window days day..day+6, i.e. WAU(D) counts users active
    # in [D-6, D]
    q["events_weekly_active_users"] = """
WITH pu AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
win AS (SELECT DISTINCT day + o * INTERVAL 1 DAY AS wday, user_id
        FROM pu CROSS JOIN (SELECT unnest(range(7)) AS o))
SELECT wday AS day, COUNT(*)::BIGINT AS wau FROM win GROUP BY 1
"""

    # month-over-month growth per satellite vs previous OBSERVED month
    q["sat_monthly_growth"] = f"""
WITH {IMAGES_CTE},
c AS (SELECT sat_id, year(time_acquired) * 100 + month(time_acquired) AS ym,
             COUNT(*)::BIGINT AS n_images
      FROM images GROUP BY 1, 2)
SELECT sat_id, ym, n_images,
       n_images - COALESCE(LAG(n_images) OVER (PARTITION BY sat_id ORDER BY ym),
                           0) AS delta
FROM c
"""

    # streaming sufficient statistics + Pearson corr on integer lattices
    q["part_price_size_stats"] = """
WITH a AS (
  SELECT COUNT(*)::BIGINT AS n,
         SUM(p_size)::BIGINT AS sx,
         SUM(CAST(floor(p_retailprice * 100.0) AS BIGINT))::BIGINT AS sy,
         SUM(p_size * p_size)::BIGINT AS sxx,
         SUM(CAST(floor(p_retailprice * 100.0) AS BIGINT)
             * CAST(floor(p_retailprice * 100.0) AS BIGINT))::BIGINT AS syy,
         SUM(p_size * CAST(floor(p_retailprice * 100.0) AS BIGINT))::BIGINT AS sxy
  FROM part)
SELECT n, sx, sy, sxx, syy, sxy,
       (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
         / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS corr
FROM a
"""

    # lexical-diversity histogram: per-doc type-token ratio in ppm,
    # 10%-band buckets (empty-token docs excluded on both sides)
    q["docs_ttr_buckets"] = r"""
WITH tok_raw AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tk AS (SELECT doc_id, term FROM tok_raw WHERE term <> ''),
per AS (SELECT doc_id, COUNT(*)::BIGINT AS n, COUNT(DISTINCT term)::BIGINT AS d
        FROM tk GROUP BY 1)
SELECT d * 1000000 // n // 100000 AS bucket, COUNT(*)::BIGINT AS n_docs
FROM per GROUP BY 1
"""

    # per-satellite quartiles of per-image mean decoded brightness on
    # the milli lattice; pixel sums via the ramp closed form (see
    # decode_stats), quantile_disc = the Ray side's ceil-rank picks
    q["sat_brightness_quartiles"] = f"""
WITH {IMAGES_CTE},
px AS (
  SELECT sat_id, CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n_pixels,
         key % 256 AS s, fmt
  FROM images),
sums AS (
  SELECT sat_id, n_pixels, fmt,
    (((s + n_pixels) // 256) * 32640
      + ((s + n_pixels) % 256) * (((s + n_pixels) % 256) - 1) // 2)
    - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2) AS sum_raw,
    (((s + n_pixels) // 4) * 6
      + ((s + n_pixels) % 4) * (((s + n_pixels) % 4) - 1) // 2)
    - ((s // 4) * 6 + (s % 4) * ((s % 4) - 1) // 2) AS sum_low3
  FROM px),
m AS (
  SELECT sat_id,
         1000 * (CASE WHEN fmt = 'qraw8' THEN sum_raw - sum_low3
                      ELSE sum_raw END) // n_pixels AS mean_milli
  FROM sums)
SELECT sat_id, COUNT(*)::BIGINT AS n_images,
       CAST(quantile_disc(mean_milli, 0.25) AS BIGINT) AS q1_milli,
       CAST(quantile_disc(mean_milli, 0.50) AS BIGINT) AS q2_milli,
       CAST(quantile_disc(mean_milli, 0.75) AS BIGINT) AS q3_milli
FROM m GROUP BY 1
"""

    # Moran's I (queen contiguity) over 4-degree cell image counts:
    # integer adjacency aggregates via a self-join of observed cells,
    # the statistic as ONE mirrored double expression
    q["grid_morans_i"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
pairs AS (
  SELECT i.x AS xi, j.x AS xj
  FROM cells i JOIN cells j
    ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
   AND NOT (i.cx = j.cx AND i.cy = j.cy)),
ag AS (
  SELECT (SELECT COUNT(*)::BIGINT FROM cells) AS n_cells,
         (SELECT COUNT(*)::BIGINT FROM pairs) AS s0,
         (SELECT SUM(x)::BIGINT FROM cells) AS sx,
         (SELECT SUM(x * x)::BIGINT FROM cells) AS sxx,
         (SELECT SUM(xi * xj)::BIGINT FROM pairs) AS a,
         (SELECT SUM(xi + xj)::BIGINT FROM pairs) AS b)
SELECT n_cells, s0, sx, sxx, a, b,
       (1.0 * a - (sx / (1.0 * n_cells)) * b
          + (sx / (1.0 * n_cells)) * (sx / (1.0 * n_cells)) * s0) * n_cells
         / ((1.0 * sxx - (sx / (1.0 * n_cells)) * sx) * s0) AS morans_i
FROM ag
"""

    # Getis-Ord Gi* per occupied cell: 3x3 window incl. self over the
    # occupied-cell study area; the double z expression mirrors the
    # engine's numpy operation order exactly (grid_morans_i precedent).
    q["cell_getis_gi"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
nb AS (
  SELECT i.cx, i.cy, SUM(j.x)::BIGINT AS a, COUNT(*)::BIGINT AS w
  FROM cells i JOIN cells j
    ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
  GROUP BY 1, 2),
g AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
             SUM(x * x)::BIGINT AS sxx FROM cells)
SELECT c.cx AS cell_x, c.cy AS cell_y, c.x AS n_images,
       nb.a AS nbr_sum, nb.w AS n_nbrs,
       (1.0 * nb.a - (g.sx / (1.0 * g.n)) * nb.w)
       / (sqrt(g.sxx / (1.0 * g.n) - (g.sx / (1.0 * g.n)) * (g.sx / (1.0 * g.n)))
          * sqrt((1.0 * g.n * nb.w - 1.0 * nb.w * nb.w) / (g.n - 1.0))) AS gi_z
FROM cells c JOIN nb ON nb.cx = c.cx AND nb.cy = c.cy CROSS JOIN g
"""

    # centrographic drift: mean center + standard distance per month,
    # exact integer sums + mirrored-double mean/std expressions.
    q["monthly_mean_center"] = f"""
WITH {IMAGES_CTE},
ag AS (
  SELECT strftime(date_trunc('month', time_acquired), '%Y-%m') AS bucket,
         COUNT(*)::BIGINT AS n,
         SUM(lon_md)::BIGINT AS sx, SUM(lat_md)::BIGINT AS sy,
         SUM(lon_md * lon_md)::BIGINT AS sxx,
         SUM(lat_md * lat_md)::BIGINT AS syy
  FROM images GROUP BY 1)
SELECT bucket, n AS n_images, sx AS sum_lon_md, sy AS sum_lat_md,
       sx / (1.0 * n) AS mean_lon_md,
       sy / (1.0 * n) AS mean_lat_md,
       sqrt((sxx - sx * (sx / (1.0 * n)) + syy - sy * (sy / (1.0 * n)))
            / (1.0 * n)) AS std_dist_md
FROM ag
"""

    # grid-censused Ripley's K: ordered point-pair counts within
    # Chebyshev cell radius r (self point-pairs removed), exact ints.
    q["grid_ripley_k"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
radii AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS radius),
tot AS (SELECT SUM(x)::BIGINT AS n_points FROM cells),
pc AS (
  SELECT r.radius,
         (SELECT SUM(i.x * j.x)::BIGINT FROM cells i JOIN cells j
            ON abs(i.cx - j.cx) <= r.radius AND abs(i.cy - j.cy) <= r.radius)
         - t.n_points AS n_pairs,
         t.n_points
  FROM radii r CROSS JOIN tot t)
SELECT radius, n_pairs, n_points,
       (1.0 * n_pairs) / (1.0 * n_points) AS khat
FROM pc
"""

    # directional semivariogram over occupied cells: exact squared-diff
    # sums per (direction, lag), mirrored double gamma.
    q["grid_semivariogram"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
dirs AS (SELECT unnest(['EW', 'NS']) AS dir),
lags AS (SELECT unnest(generate_series(1, 4)) AS lag),
pr AS (
  SELECT d.dir, l.lag,
         COUNT(*)::BIGINT AS n_pairs,
         SUM((i.x - j.x) * (i.x - j.x))::BIGINT AS sum_sq_diff
  FROM cells i CROSS JOIN dirs d CROSS JOIN lags l
  JOIN cells j
    ON (d.dir = 'EW' AND j.cx = i.cx + l.lag AND j.cy = i.cy)
    OR (d.dir = 'NS' AND j.cx = i.cx AND j.cy = i.cy + l.lag)
  GROUP BY 1, 2)
SELECT dir, lag, n_pairs, sum_sq_diff,
       sum_sq_diff / (2.0 * n_pairs) AS gamma
FROM pr
"""

    # Geary's C (queen contiguity): pair squared-diff sum via the
    # occupied-cell self-join, C as ONE mirrored double expression.
    q["grid_gearys_c"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
pairs AS (
  SELECT i.x AS xi, j.x AS xj
  FROM cells i JOIN cells j
    ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
   AND NOT (i.cx = j.cx AND i.cy = j.cy)),
ag AS (
  SELECT (SELECT COUNT(*)::BIGINT FROM cells) AS n_cells,
         (SELECT COUNT(*)::BIGINT FROM pairs) AS s0,
         (SELECT SUM(x)::BIGINT FROM cells) AS sx,
         (SELECT SUM(x * x)::BIGINT FROM cells) AS sxx,
         (SELECT SUM((xi - xj) * (xi - xj))::BIGINT FROM pairs) AS d)
SELECT n_cells, s0, sx, sxx, d AS sum_sq_diff,
       (n_cells - 1.0) * d
         / (2.0 * s0 * (1.0 * sxx - (sx / (1.0 * n_cells)) * sx)) AS gearys_c
FROM ag
"""

    # Local Moran's I (Anselin LISA) per occupied cell + the Moran
    # scatterplot quadrant; doubles and comparisons mirror the
    # engine's numpy operation order exactly.
    q["cell_local_moran"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
nb AS (
  SELECT i.cx, i.cy,
         COALESCE(SUM(j.x), 0)::BIGINT AS a,
         COUNT(j.x)::BIGINT AS w
  FROM cells i LEFT JOIN cells j
    ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
   AND NOT (i.cx = j.cx AND i.cy = j.cy)
  GROUP BY 1, 2),
g AS (SELECT COUNT(*)::BIGINT AS n, SUM(x)::BIGINT AS sx,
             SUM(x * x)::BIGINT AS sxx FROM cells)
SELECT c.cx AS cell_x, c.cy AS cell_y, c.x AS n_images,
       nb.a AS nbr_sum, nb.w AS n_nbrs,
       (c.x - g.sx / (1.0 * g.n))
         * (1.0 * nb.a - (g.sx / (1.0 * g.n)) * nb.w)
         / (g.sxx / (1.0 * g.n)
            - (g.sx / (1.0 * g.n)) * (g.sx / (1.0 * g.n))) AS lisa,
       (CASE WHEN c.x > g.sx / (1.0 * g.n) THEN 'H' ELSE 'L' END)
         || (CASE WHEN 1.0 * nb.a > (g.sx / (1.0 * g.n)) * nb.w
                  THEN 'H' ELSE 'L' END) AS quad
FROM cells c JOIN nb ON nb.cx = c.cx AND nb.cy = c.cy CROSS JOIN g
"""

    # Binary join counts (queen) over the FULL occupiable lattice:
    # dense grid via generate_series, ordered BB/BW/WW pair census.
    nx = (spec.LON_SPAN_MD + 3999) // 4000
    ny = (spec.LAT_SPAN_MD + 3999) // 4000
    q["grid_join_counts"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
grid AS (
  SELECT gx.cx, gy.cy,
         CASE WHEN c.x IS NULL THEN 0 ELSE 1 END AS b
  FROM (SELECT unnest(generate_series(0, {nx - 1})) AS cx) gx
  CROSS JOIN (SELECT unnest(generate_series(0, {ny - 1})) AS cy) gy
  LEFT JOIN cells c ON c.cx = gx.cx AND c.cy = gy.cy),
pairs AS (
  SELECT i.b AS bi, j.b AS bj
  FROM grid i JOIN grid j
    ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1
   AND NOT (i.cx = j.cx AND i.cy = j.cy)),
ag AS (
  SELECT (SELECT COUNT(*)::BIGINT FROM grid) AS n_cells,
         (SELECT SUM(b)::BIGINT FROM grid) AS n_black,
         (SELECT COUNT(*)::BIGINT FROM pairs) AS s0,
         (SELECT COUNT(*)::BIGINT FROM pairs WHERE bi = 1 AND bj = 1) AS bb,
         (SELECT COUNT(*)::BIGINT FROM pairs WHERE bi <> bj) AS bw,
         (SELECT COUNT(*)::BIGINT FROM pairs WHERE bi = 0 AND bj = 0) AS ww)
SELECT n_cells, n_black, s0, bb, bw, ww,
       (1.0 * bb) / (1.0 * s0) AS bb_rate,
       (1.0 * n_black * n_black) / (1.0 * n_cells * n_cells) AS exp_bb_rate
FROM ag
"""

    # Bivariate cross-K (images x cities), grid-censused: exact
    # weighted pair counts within Chebyshev cell radius r.
    q["grid_cross_k"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2),
city_cells AS (
  SELECT ({_mix('c_custkey', spec.ST_CITY_LON)} % {spec.LON_SPAN_MD}) // 4000 AS cx,
         ({_mix('c_custkey', spec.ST_CITY_LAT)} % {spec.LAT_SPAN_MD}) // 4000 AS cy,
         COUNT(*)::BIGINT AS y
  FROM customer GROUP BY 1, 2),
radii AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS radius),
ti AS (SELECT SUM(x)::BIGINT AS n_images FROM cells),
tc AS (SELECT SUM(y)::BIGINT AS n_cities FROM city_cells),
pc AS (
  SELECT r.radius,
         COALESCE((SELECT SUM(i.x * j.y)::BIGINT FROM cells i JOIN city_cells j
            ON abs(i.cx - j.cx) <= r.radius AND abs(i.cy - j.cy) <= r.radius),
           0) AS n_pairs
  FROM radii r)
SELECT radius, n_pairs, ti.n_images, tc.n_cities,
       (1.0 * n_pairs) / (1.0 * ti.n_images) AS khat
FROM pc CROSS JOIN ti CROSS JOIN tc
"""

    # TPC-H Q17 shape: revenue of small-quantity lineitems vs the
    # per-part average, exact integer 20% test, mirrored final double.
    q["small_qty_revenue"] = """
WITH lib AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = 'Brand#13'),
ag AS (
  SELECT l_partkey, SUM(qty)::BIGINT AS sum_qty, COUNT(*)::BIGINT AS cnt
  FROM lib GROUP BY 1),
sel AS (
  SELECT cents FROM lib JOIN ag USING (l_partkey)
  WHERE 5 * qty * cnt < sum_qty)
SELECT COUNT(*)::BIGINT AS n_small,
       COALESCE(SUM(cents), 0)::BIGINT AS sum_cents,
       (COALESCE(SUM(cents), 0) / 100.0) / 7.0 AS avg_yearly
FROM sel
"""

    # Blob (4-connected component) census per image.  The engine runs
    # a real union-find over the actual payload bytes; this closed
    # form counts, per raster row r with phase s = (k0 + r*w) % 256,
    # the foreground cells / adjacent pairs / 2x2 blocks of the
    # thresholded rotated ramp (arc-overlap LEAST/GREATEST algebra;
    # w <= 64 < 128 keeps every arc un-wrapped), then applies the
    # Euler identity C = V - Eh - Ev + Q, exact because the stripe
    # pattern has no 8-connected holes (exhaustive (k0, w, h) sweep).
    q["image_blob_stats"] = f"""
WITH {IMAGES_CTE},
base AS (
  -- rid keeps duplicate source rows (sf0.001's twin lineitem key) as
  -- two identical output rows, matching the engine's map-only stream
  SELECT image_id, key % 256 AS k0, CAST(w AS BIGINT) AS w,
         CAST(h AS BIGINT) AS h, ROW_NUMBER() OVER () AS rid
  FROM images),
rws AS (
  SELECT image_id, k0, w, h, rid,
         unnest(generate_series(0, h - 1)) AS r
  FROM base),
ph AS (
  SELECT image_id, w, h, r, rid, (k0 + r * w) % 256 AS s FROM rws),
cnts AS (
  SELECT image_id, rid,
    SUM(GREATEST(0, LEAST(s + w, 256) - GREATEST(s, 128))
      + GREATEST(0, LEAST(s + w, 512) - GREATEST(s, 384)))::BIGINT AS n_fg,
    SUM(GREATEST(0, LEAST(s + w - 1, 255) - GREATEST(s, 128))
      + GREATEST(0, LEAST(s + w - 1, 511) - GREATEST(s, 384)))::BIGINT
      AS n_edges_h,
    SUM(CASE WHEN r < h - 1 THEN
        GREATEST(0, LEAST(s + w, 256 - w) - GREATEST(s, 128))
      + GREATEST(0, LEAST(s + w, 512 - w) - GREATEST(s, 384))
      ELSE 0 END)::BIGINT AS n_edges_v,
    SUM(CASE WHEN r < h - 1 THEN
        GREATEST(0, LEAST(s + w - 1, 255 - w) - GREATEST(s, 128))
      + GREATEST(0, LEAST(s + w - 1, 511 - w) - GREATEST(s, 384))
      ELSE 0 END)::BIGINT AS n_quads
  FROM ph GROUP BY 1, 2)
SELECT image_id, n_fg, n_edges_h, n_edges_v, n_quads,
       n_fg - n_edges_h - n_edges_v + n_quads AS n_blobs
FROM cnts
"""

    # Knox space-time interaction: exact ordered close-pair counts in
    # space / time / both over the (cell, day) census; joint count via
    # 27 equality-offset hash joins (no inequality join blowup).
    q["grid_knox_st"] = f"""
WITH {IMAGES_CTE},
pts AS MATERIALIZED (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS d,
         COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2, 3),
cells AS (SELECT cx, cy, SUM(x)::BIGINT AS x FROM pts GROUP BY 1, 2),
days AS (SELECT d, SUM(x)::BIGINT AS x FROM pts GROUP BY 1),
tot AS (SELECT SUM(x)::BIGINT AS n FROM pts),
sp AS (SELECT SUM(i.x * j.x)::BIGINT AS v FROM cells i JOIN cells j
        ON abs(i.cx - j.cx) <= 1 AND abs(i.cy - j.cy) <= 1),
tm AS (SELECT SUM(i.x * j.x)::BIGINT AS v FROM days i JOIN days j
        ON abs(i.d - j.d) <= 1),
offs AS MATERIALIZED (
  SELECT ox.v AS dx, oy.v AS dy, ot.v AS dt
  FROM (SELECT unnest([-1, 0, 1]) AS v) ox
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS v) oy
  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS v) ot),
st AS (
  SELECT SUM(i.x * j.x)::BIGINT AS v
  FROM pts i CROSS JOIN offs o
  JOIN pts j ON j.cx = i.cx + o.dx AND j.cy = i.cy + o.dy
            AND j.d = i.d + o.dt)
SELECT t.n, sp.v - t.n AS n_space, tm.v - t.n AS n_time,
       st.v - t.n AS n_st, t.n * t.n - t.n AS n_tot,
       (1.0 * (sp.v - t.n)) * (tm.v - t.n)
         / (1.0 * (t.n * t.n - t.n)) AS knox_expected
FROM tot t CROSS JOIN sp CROSS JOIN tm CROSS JOIN st
"""

    # nearest occupied cell: exact min squared distance via self-join.
    q["cell_nearest_neighbor"] = f"""
WITH {IMAGES_CTE},
cells AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2)
SELECT i.cx AS cell_x, i.cy AS cell_y, i.x AS n_images,
       MIN((i.cx - j.cx) * (i.cx - j.cx)
         + (i.cy - j.cy) * (i.cy - j.cy))::BIGINT AS nn_d2
FROM cells i JOIN cells j ON NOT (i.cx = j.cx AND i.cy = j.cy)
GROUP BY 1, 2, 3
"""

    # Mann-Kendall trend per 4-deg cell over the DENSE monthly series
    # (missing months = 0, global [first, last] month scaffold):
    # S = sum over month pairs i<j of sign(x_j - x_i), exact integer.
    q["cell_trend_mk"] = f"""
WITH {IMAGES_CTE},
per AS (
  SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy,
         year(time_acquired) * 12 + month(time_acquired) AS m,
         COUNT(*)::BIGINT AS x
  FROM images GROUP BY 1, 2, 3),
bounds AS (SELECT MIN(m) AS lo, MAX(m) AS hi FROM per),
months AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds),
                                (SELECT hi FROM bounds))) AS m),
cells AS (SELECT DISTINCT cx, cy FROM per),
dense AS (
  SELECT c.cx, c.cy, mo.m, COALESCE(p.x, 0) AS x
  FROM cells c CROSS JOIN months mo
  LEFT JOIN per p ON p.cx = c.cx AND p.cy = c.cy AND p.m = mo.m),
s AS (
  SELECT a.cx, a.cy, SUM(SIGN(b.x - a.x))::BIGINT AS s_stat
  FROM dense a JOIN dense b
    ON a.cx = b.cx AND a.cy = b.cy AND b.m > a.m
  GROUP BY 1, 2),
tot AS (SELECT cx, cy, SUM(x)::BIGINT AS n_images FROM per GROUP BY 1, 2)
SELECT t.cx AS cell_x, t.cy AS cell_y, t.n_images, s.s_stat,
       CASE WHEN s.s_stat > 0 THEN 'inc'
            WHEN s.s_stat < 0 THEN 'dec'
            ELSE 'flat' END AS trend
FROM tot t JOIN s ON s.cx = t.cx AND s.cy = t.cy
"""

    # dedup-index quality: MinHash candidates (est >= 0.5) vs the exact
    # n-gram Jaccard >= 0.5 pair set — precision/recall in integer ppm
    q["dedup_index_quality"] = f"""
WITH est AS (
  SELECT doc_a, doc_b FROM ({_minhash_sql()}) WHERE est_jaccard >= 0.5),
tru AS (
  SELECT doc_a, doc_b FROM ({q['ngram_jaccard_dups']})),
ag AS (
  SELECT (SELECT COUNT(*)::BIGINT FROM est) AS n_est,
         (SELECT COUNT(*)::BIGINT FROM tru) AS n_true,
         (SELECT COUNT(*)::BIGINT FROM est JOIN tru USING (doc_a, doc_b)) AS n_both)
SELECT n_est, n_true, n_both,
       n_both * 1000000 // n_est AS precision_ppm,
       n_both * 1000000 // n_true AS recall_ppm
FROM ag
"""

    # mosaic freshness: newest image age per tile, day histogram
    q["tile_freshness_hist"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
mx AS (
  SELECT tile_id,
         MAX({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) AS hrs
  FROM img_tiles GROUP BY 1)
SELECT ({spec.TIME_SPAN_HOURS} - hrs) // 24 AS age_days,
       COUNT(*)::BIGINT AS n_tiles
FROM mx GROUP BY 1
"""

    # user lifetime (calendar days first->last event), histogram
    q["user_lifespan_hist"] = """
WITH u AS (
  SELECT user_id,
         CAST(date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS BIGINT) AS days
  FROM events GROUP BY 1)
SELECT days, COUNT(*)::BIGINT AS n_users FROM u GROUP BY 1
"""

    # per-satellite histogram-equalization LUT: pixel-value counts via
    # the ramp closed form (pixel_histogram), integer window cumsum
    q["sat_equalization_lut"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
n_img AS (SELECT sat_id, fmt, key % 256 AS k0,
                 CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
          FROM images),
raw AS (
  SELECT i.sat_id, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v WHERE i.fmt = 'raw8' GROUP BY 1, 2),
qr AS (
  SELECT i.sat_id, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v + j.j - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v CROSS JOIN js j
  WHERE i.fmt = 'qraw8' AND v.v % 4 = 0 GROUP BY 1, 2),
u AS (
  SELECT sat_id, value, SUM(n_pixels)::BIGINT AS n_pixels
  FROM (SELECT * FROM raw UNION ALL SELECT * FROM qr)
  GROUP BY 1, 2 HAVING SUM(n_pixels) > 0)
SELECT sat_id, value, n_pixels,
  CAST((SUM(n_pixels) OVER (PARTITION BY sat_id ORDER BY value)) * 255
    // (SUM(n_pixels) OVER (PARTITION BY sat_id)) AS BIGINT) AS lut
FROM u
"""

    # border-vs-interior brightness per satellite: border positions
    # brute-enumerated per image (top/bottom rows, side columns),
    # totals via the ramp closed form; exact integer milli means
    q["sat_border_contrast"] = f"""
WITH {IMAGES_CTE},
n_img AS (
  SELECT sat_id, fmt, key % 256 AS s,
         CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images),
sums AS (
  SELECT sat_id, fmt, w, h, n,
    (((s + n) // 256) * 32640
      + ((s + n) % 256) * (((s + n) % 256) - 1) // 2)
    - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2) AS sum_raw,
    (((s + n) // 4) * 6
      + ((s + n) % 4) * (((s + n) % 4) - 1) // 2)
    - ((s // 4) * 6 + (s % 4) * ((s % 4) - 1) // 2) AS sum_low3
  FROM n_img),
bp AS (
  SELECT sat_id, fmt, s, g.p
  FROM n_img, LATERAL (
    SELECT unnest(generate_series(0, w - 1)) AS p
    UNION ALL SELECT unnest(generate_series((h - 1) * w, h * w - 1))
    UNION ALL SELECT unnest(generate_series(1, h - 2)) * w
    UNION ALL SELECT unnest(generate_series(1, h - 2)) * w + w - 1) g),
bs AS (
  SELECT sat_id,
         SUM(CASE WHEN fmt = 'qraw8' THEN ((s + p) % 256) // 4 * 4
                  ELSE (s + p) % 256 END)::BIGINT AS border_sum
  FROM bp GROUP BY 1),
tot AS (
  SELECT sat_id, COUNT(*)::BIGINT AS n_images,
         SUM(CASE WHEN fmt = 'qraw8' THEN sum_raw - sum_low3
                  ELSE sum_raw END)::BIGINT AS total_sum,
         SUM(n)::BIGINT AS total_px,
         SUM(2 * w + 2 * h - 4)::BIGINT AS border_px
  FROM sums GROUP BY 1)
SELECT t.sat_id, t.n_images,
  1000 * b.border_sum // t.border_px AS border_mean_milli,
  1000 * (t.total_sum - b.border_sum) // (t.total_px - t.border_px)
    AS inner_mean_milli,
  1000 * b.border_sum // t.border_px
    - 1000 * (t.total_sum - b.border_sum) // (t.total_px - t.border_px)
    AS contrast_milli
FROM tot t JOIN bs b USING (sat_id)
"""

    # next-type transition entropy per event type; -p*ln(p) floored to
    # integer micros per term before summing (docs_tfidf ln convention)
    q["events_type_entropy"] = """
WITH seq AS (
  SELECT user_id, event_type AS a,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
  FROM events),
tc AS (SELECT a, b, COUNT(*)::BIGINT AS n
       FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT a, SUM(n)::BIGINT AS tot, COUNT(*)::BIGINT AS n_branches
        FROM tc GROUP BY 1)
SELECT t.a AS from_type, t.tot AS n_transitions, t.n_branches,
  SUM(CAST(floor(-(c.n / (1.0 * t.tot)) * ln(c.n / (1.0 * t.tot)) * 1000000.0)
      AS BIGINT))::BIGINT AS entropy_micro
FROM tc c JOIN tot t USING (a)
GROUP BY 1, 2, 3
"""

    # quarterly first-order cohorts: share ordering again the NEXT
    # calendar quarter
    q["order_cohort_retention"] = """
WITH o AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 4 + (month(o_orderdate) - 1) // 3 AS q
  FROM orders),
f AS (SELECT o_custkey, MIN(q) AS q0 FROM o GROUP BY 1),
r AS (SELECT f.o_custkey, f.q0,
             MAX(CASE WHEN o.q = f.q0 + 1 THEN 1 ELSE 0 END) AS retained
      FROM f JOIN o USING (o_custkey) GROUP BY 1, 2)
SELECT q0 AS cohort_q, COUNT(*)::BIGINT AS n_customers,
       SUM(retained)::BIGINT AS n_retained,
       SUM(retained)::BIGINT * 1000000 // COUNT(*)::BIGINT AS retention_ppm
FROM r GROUP BY 1
"""

    # Pareto concentration: smallest prefix of users (by descending
    # spend) whose running total first reaches 80% of all spend
    q["events_pareto_users"] = """
WITH u AS (
  SELECT user_id, SUM(CAST(floor(value * 100.0) AS BIGINT))::BIGINT AS m
  FROM events GROUP BY 1),
t AS (SELECT SUM(m)::BIGINT AS tot, COUNT(*)::BIGINT AS nu FROM u),
r AS (SELECT m, SUM(m) OVER (ORDER BY m DESC, user_id) AS cum,
             ROW_NUMBER() OVER (ORDER BY m DESC, user_id) AS rn FROM u)
SELECT MIN(r.rn)::BIGINT AS n_users_80pct, t.nu AS n_users_total,
       t.tot AS total_cents, MIN(r.cum)::BIGINT AS covered_cents
FROM r, t WHERE r.cum * 5 >= t.tot * 4 GROUP BY t.nu, t.tot
"""

    # per-satellite quarterly chi-square vs uniform; zero quarters
    # participate ((0-e)^2/e), each term floored to micros
    q["sat_seasonality_chi2"] = f"""
WITH {IMAGES_CTE},
c AS (SELECT sat_id, (month(time_acquired) - 1) // 3 AS qtr,
             COUNT(*)::BIGINT AS o
      FROM images GROUP BY 1, 2),
sats AS (SELECT sat_id, COUNT(*)::BIGINT AS tot FROM images GROUP BY 1),
qs AS (SELECT unnest(generate_series(0, 3)) AS qtr),
grid AS (
  SELECT s.sat_id, s.tot, q.qtr, COALESCE(c.o, 0) AS o
  FROM sats s CROSS JOIN qs q
  LEFT JOIN c ON c.sat_id = s.sat_id AND c.qtr = q.qtr)
SELECT sat_id, tot AS n_images,
  SUM(CAST(floor((o - tot / 4.0) * (o - tot / 4.0) / (tot / 4.0) * 1000000.0)
      AS BIGINT))::BIGINT AS chi2_micro
FROM grid GROUP BY 1, 2
"""

    # embedding L2-norm histogram on the floor(x*2^20) integer lattice
    q["embedding_norm_hist"] = """
WITH el AS (
  SELECT vec_id,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0) AS BIGINT) AS q
  FROM embeddings),
n2 AS (SELECT vec_id, SUM(q * q)::BIGINT AS norm2q FROM el GROUP BY 1)
SELECT norm2q // 68719476736 AS bucket, COUNT(*)::BIGINT AS n_vecs
FROM n2 GROUP BY 1
"""

    # order -> first shipment lag, day histogram
    q["order_fulfillment_lag_hist"] = """
WITH f AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS fs
  FROM lineitem GROUP BY 1)
SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), fs) AS BIGINT) AS lag_days,
       COUNT(*)::BIGINT AS n_orders
FROM f JOIN orders ON o_orderkey = l_orderkey GROUP BY 1
"""

    # caption edit-distance histogram over phash near-dup pairs
    # (levenshtein mirrors the vectorized batch DP exactly)
    q["caption_edit_dist_hist"] = f"""
WITH {IMAGES_CTE},
p AS (SELECT image_a, image_b FROM ({q['phash_near_dup']})),
-- DISTINCT: sf0.001 has one duplicated lineitem key whose identical
-- derived row would otherwise fan the caption join out
ca AS (SELECT DISTINCT image_id, caption FROM images)
SELECT levenshtein(a.caption, b.caption)::BIGINT AS edit_distance,
       COUNT(*)::BIGINT AS n_pairs
FROM p
JOIN ca a ON a.image_id = p.image_a
JOIN ca b ON b.image_id = p.image_b
GROUP BY 1
"""

    # phash bit balance: per bit position, set fraction in integer ppm
    q["phash_bit_balance"] = f"""
WITH {IMAGES_CTE},
bits AS (SELECT unnest(generate_series(0, 61)) AS bit)
SELECT b.bit, SUM((i.phash >> b.bit) & 1)::BIGINT AS n_set,
       SUM((i.phash >> b.bit) & 1)::BIGINT * 1000000
         // COUNT(*)::BIGINT AS set_ppm
FROM images i CROSS JOIN bits b GROUP BY 1
"""

    # revenue share per customer market segment (orders x customer PK
    # lookup-join on the Ray side)
    q["mktsegment_revenue_share"] = """
SELECT c_mktsegment, COUNT(*)::BIGINT AS n_orders,
       SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))::BIGINT AS revenue_cents,
       SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))::BIGINT * 1000000
         // (SELECT SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT))
             FROM orders)::BIGINT AS share_ppm
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY 1
"""

    # snowflake rollup: supplier balances through nation -> region
    q["supplier_region_balance"] = """
SELECT r_name, COUNT(*)::BIGINT AS n_suppliers,
       SUM(CAST(floor(s_acctbal * 100.0) AS BIGINT))::BIGINT AS bal_cents
FROM supplier
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY 1
"""

    # composed IMAGE training-corpus release: quality gate -> phash
    # near-dup removal among the gated survivors (banded pairs, CC,
    # max-clear/min-key keeper) -> hash split -> per-split manifest
    q["image_corpus_release"] = f"""
WITH RECURSIVE imgs AS (
  WITH {IMAGES_CTE} SELECT * FROM images
),
g AS (
  SELECT key, phash, clear_confidence_percent, w, h
  FROM imgs
  WHERE CAST(round(cloud_cover * 1000) AS BIGINT) <= 300
    AND clear_confidence_percent >= 50),
bands AS (
  SELECT key, phash, b.v AS band_idx,
         (phash >> (16 * b.v)) & 65535 AS band_val
  FROM g, LATERAL (SELECT unnest(generate_series(0, {spec.PHASH_BANDS - 1})) AS v) b),
prs AS MATERIALIZED (
  SELECT DISTINCT a.key AS ka, b.key AS kb
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.key < b.key
  WHERE bit_count(xor(a.phash, b.phash)) <= {spec.PHASH_HAMMING_MAX}),
edges AS MATERIALIZED (
  SELECT ka AS s, kb AS d FROM prs UNION ALL SELECT kb, ka FROM prs),
nodes AS (SELECT DISTINCT s AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.d, r.label FROM edges e JOIN reach r ON r.node = e.s),
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
cand AS (
  SELECT c.cluster, i.key, i.clear_confidence_percent
  FROM comp c
  JOIN (SELECT DISTINCT key, clear_confidence_percent FROM g) i
    ON i.key = c.node),
rk AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cluster ORDER BY clear_confidence_percent DESC, key) AS rn
  FROM cand),
drops AS (SELECT key FROM rk WHERE rn > 1),
surv AS (
  SELECT key, CAST(w AS BIGINT) * CAST(h AS BIGINT) AS px,
         {_mix(f'(key % {M})', spec.ST_SPLIT)} % 100 AS b
  FROM g WHERE key NOT IN (SELECT key FROM drops))
SELECT CASE WHEN b < {spec.SPLIT_TRAIN_PCT} THEN 'train'
            WHEN b < {spec.SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*)::BIGINT AS n_images, SUM(px)::BIGINT AS total_px
FROM surv GROUP BY 1
"""

    # footprint IoU histogram over strictly overlapping pairs; the
    # BETWEEN prefilter (max centroid distance 2*HW_MAX = 398 md) keeps
    # the self-join IEJoin-able, exact overlap refines in WHERE
    q["image_iou_hist"] = f"""
WITH {IMAGES_CTE},
bd AS (SELECT DISTINCT key, lon_md AS x, lat_md AS y, hw_md AS hw FROM images),
p AS (
  SELECT LEAST(a.x + a.hw, b.x + b.hw) - GREATEST(a.x - a.hw, b.x - b.hw) AS iw,
         LEAST(a.y + a.hw, b.y + b.hw) - GREATEST(a.y - a.hw, b.y - b.hw) AS ih,
         a.hw AS ha, b.hw AS hb
  FROM bd a JOIN bd b
    ON b.x BETWEEN a.x - 398 AND a.x + 398
   AND b.y BETWEEN a.y - 398 AND a.y + 398
   AND a.key < b.key
  WHERE abs(a.x - b.x) < a.hw + b.hw AND abs(a.y - b.y) < a.hw + b.hw),
i AS (SELECT iw * ih AS inter,
             4 * ha * ha + 4 * hb * hb - iw * ih AS un FROM p)
SELECT inter * 1000000 // un // 100000 AS bucket, COUNT(*)::BIGINT AS n_pairs
FROM i GROUP BY 1
"""

    # rolling 7-day image counts per satellite at every supported
    # window day ((sat, day) counts fanned to day..day+6)
    q["sat_rolling_7d_counts"] = f"""
WITH {IMAGES_CTE},
c AS (
  SELECT sat_id,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day,
         COUNT(*)::BIGINT AS c
  FROM images GROUP BY 1, 2),
w AS (SELECT sat_id, day + o.o AS wday, c
      FROM c CROSS JOIN (SELECT unnest(range(7)) AS o) o)
SELECT sat_id, wday, SUM(c)::BIGINT AS n_images_7d
FROM w GROUP BY 1, 2
"""

    # bounce rate: share of single-event sessions (sessionize rules)
    q["events_bounce_rate"] = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL {spec.SESSION_GAP_MIN} MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events),
sess AS (
  SELECT user_id,
    CAST(SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM ordered),
per AS (SELECT user_id, session_seq, COUNT(*)::BIGINT AS n FROM sess GROUP BY 1, 2),
ag AS (SELECT COUNT(*)::BIGINT AS n_sessions,
              SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_bounce
       FROM per)
SELECT n_sessions, n_bounce,
       n_bounce * 1000000 // n_sessions AS bounce_ppm
FROM ag
"""

    # the JSONL round-trip computes the SAME rollup (JSON double
    # serialization is shortest-repr round-trip-exact)
    q["events_hourly_jsonl"] = q["events_hourly"]

    # per-zone best image: lowest cloud, key tiebreak, exact-refinement
    # join (tile_best_image's vector-zone twin)
    q["zone_best_image"] = f"""
WITH {IMAGES_CTE}, {ZONES_CTE},
j AS (
  SELECT z.zone_id, i.key,
         CAST(round(i.cloud_cover * 1000) AS BIGINT) AS cmi
  FROM images i JOIN zones z ON {ZONE_INTERSECTS}),
r AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY zone_id ORDER BY cmi, key) AS rn FROM j)
SELECT zone_id, 'img-' || CAST(key AS VARCHAR) AS image_id,
       cmi / 1000.0 AS cloud_cover
FROM r WHERE rn = 1
"""

    # satellite coverage similarity: Jaccard of covered tile sets
    q["sat_tile_jaccard"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
ts AS (SELECT DISTINCT tile_id, key % {spec.KEY_SUPP_MULT} AS sat_id FROM img_tiles),
per AS (SELECT sat_id, COUNT(*)::BIGINT AS n FROM ts GROUP BY 1),
pr AS (SELECT a.sat_id AS sat_a, b.sat_id AS sat_b, COUNT(*)::BIGINT AS n_inter
       FROM ts a JOIN ts b ON a.tile_id = b.tile_id AND a.sat_id < b.sat_id
       GROUP BY 1, 2)
SELECT pr.sat_a, pr.sat_b, pr.n_inter,
       pa.n + pb.n - pr.n_inter AS n_union,
       pr.n_inter * 1000000 // (pa.n + pb.n - pr.n_inter) AS jaccard_ppm
FROM pr
JOIN per pa ON pa.sat_id = pr.sat_a
JOIN per pb ON pb.sat_id = pr.sat_b
"""

    # inter-event gap histogram per user stream (minute buckets):
    # epoch-microsecond diffs floor-divided, ties ordered by event_id
    q["events_gap_hist"] = """
WITH s AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pt
  FROM events)
SELECT (t - pt) // 60000000 AS gap_min, COUNT(*)::BIGINT AS n_gaps
FROM s WHERE pt IS NOT NULL GROUP BY 1
"""

    # distributed last-wins MERGE over the duplicate-bearing page
    # stream: highest page_idx wins per key (its clear is base+page_idx,
    # so MAX(clear) is the winner's value)
    q["pages_last_wins_merge"] = f"""
WITH {PAGES_CTE},
m AS (SELECT key, MAX(page_idx) AS pi, MAX(clear_confidence_percent) AS cl
      FROM pages GROUP BY 1)
SELECT key % {spec.KEY_SUPP_MULT} AS sat_id, COUNT(*)::BIGINT AS n_images,
       SUM(pi)::BIGINT AS n_updated,
       SUM(CAST(floor(cl) AS BIGINT))::BIGINT AS clear_pp_sum
FROM m GROUP BY 1
"""

    # sensor-diversity histogram: distinct sats per tile, bucketed
    q["tile_sat_diversity"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
ts AS (SELECT DISTINCT tile_id, key % {spec.KEY_SUPP_MULT} AS sat_id FROM img_tiles),
per AS (SELECT tile_id, COUNT(*)::BIGINT AS n_sats FROM ts GROUP BY 1)
SELECT n_sats, COUNT(*)::BIGINT AS n_tiles FROM per GROUP BY 1
"""

    # coverage cross-tab: images per (country, satellite)
    q["country_sat_matrix"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE}
SELECT n.iso, i.sat_id, COUNT(*)::BIGINT AS n_images
FROM countries n JOIN images i
  ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1
GROUP BY 1, 2
"""

    # nearest-city distance histogram over the reverse-kNN result
    # (unit square-degree buckets of the oracle-exact dist_sq)
    q["city_distance_hist"] = f"""
WITH nn AS ({q['image_nearest_city']})
SELECT CAST(floor(dist_sq) AS BIGINT) AS bucket, COUNT(*)::BIGINT AS n_images
FROM nn GROUP BY 1
"""

    # split-balance QA: chi-square of (split x source) vs independence;
    # e = row_tot * col_tot / n as one mirrored double expression, terms
    # floored to micros (zero cells participate)
    q["split_source_chi2"] = f"""
WITH sp AS (
  SELECT CASE WHEN b < {spec.SPLIT_TRAIN_PCT} THEN 0
              WHEN b < {spec.SPLIT_VAL_PCT} THEN 1 ELSE 2 END AS si, source
  FROM (SELECT source, {_mix(f'(doc_id % {M})', spec.ST_SPLIT)} % 100 AS b
        FROM documents)),
srcs AS (SELECT DISTINCT source FROM documents),
sidx AS (SELECT unnest(generate_series(0, 2)) AS si),
o AS (SELECT si, source, COUNT(*)::BIGINT AS o FROM sp GROUP BY 1, 2),
grid AS (
  SELECT i.si, s.source, COALESCE(o.o, 0) AS o
  FROM sidx i CROSS JOIN srcs s
  LEFT JOIN o ON o.si = i.si AND o.source = s.source),
rt AS (SELECT si, SUM(o)::BIGINT AS rt FROM grid GROUP BY 1),
ct AS (SELECT source, SUM(o)::BIGINT AS ct FROM grid GROUP BY 1),
n AS (SELECT SUM(o)::BIGINT AS n FROM grid)
SELECT CASE g.si WHEN 0 THEN 'train' WHEN 1 THEN 'val' ELSE 'test' END AS split,
       rt.rt AS n_docs,
       SUM(CAST(floor((g.o - rt.rt * (1.0 * ct.ct) / n.n)
                      * (g.o - rt.rt * (1.0 * ct.ct) / n.n)
                      / (rt.rt * (1.0 * ct.ct) / n.n) * 1000000.0) AS BIGINT)
          )::BIGINT AS chi2_micro
FROM grid g JOIN rt ON rt.si = g.si JOIN ct ON ct.source = g.source, n
GROUP BY 1, 2
"""

    # cluster-separation matrix: squared lattice distance between label
    # centroids (the label_centroids reduce, paired)
    q["label_separation"] = f"""
WITH qv AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {spec.KMEANS_QUANT}) AS BIGINT) AS v
  FROM embeddings),
cent AS (
  SELECT label, dim,
    CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS c
  FROM qv GROUP BY 1, 2)
SELECT a.label AS label_a, b.label AS label_b,
       SUM((a.c - b.c) * (a.c - b.c))::BIGINT AS dist2_q
FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2
"""

    # first-touch attribution: a user's whole value total credits their
    # first event's type (ties by event_id)
    q["events_first_touch"] = """
WITH f AS (
  SELECT user_id, event_type,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events),
tot AS (SELECT user_id, SUM(CAST(floor(value * 100.0) AS BIGINT)) AS v
        FROM events GROUP BY 1)
SELECT f.event_type, COUNT(*)::BIGINT AS n_users, SUM(t.v)::BIGINT AS value_cents
FROM f JOIN tot t USING (user_id) WHERE f.rn = 1 GROUP BY 1
"""

    # constellation synergy: per 1-degree cell, min gap between captures
    # by DIFFERENT satellites (adjacent-pair scan is exact — see the
    # query docstring's lemma), histogrammed in hours
    q["cell_cross_sat_revisit"] = f"""
WITH {IMAGES_CTE},
e AS (
  SELECT (CAST(floor(centroid_lon) AS BIGINT) + 180) * 400
       + (CAST(floor(centroid_lat) AS BIGINT) + 90) AS cell,
         {_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS} AS h,
         sat_id, key
  FROM images),
s AS (
  SELECT cell, h, sat_id,
         lag(h) OVER (PARTITION BY cell ORDER BY h, key) AS ph,
         lag(sat_id) OVER (PARTITION BY cell ORDER BY h, key) AS ps
  FROM e),
m AS (SELECT cell, MIN(h - ph) AS mdt
      FROM s WHERE ps IS NOT NULL AND sat_id <> ps GROUP BY 1)
SELECT CAST(mdt AS BIGINT) AS min_dt_hours, COUNT(*)::BIGINT AS n_cells
FROM m GROUP BY 1
"""

    # per-source document-length quartiles on the n_chars lattice
    q["source_length_quartiles"] = """
SELECT source, COUNT(*)::BIGINT AS n_docs,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q1_chars,
       CAST(quantile_disc(n_chars, 0.50) AS BIGINT) AS q2_chars,
       CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS q3_chars
FROM documents GROUP BY 1
"""

    # record-setting days per satellite (cumulative-max window)
    q["sat_record_days"] = f"""
WITH {IMAGES_CTE},
c AS (SELECT sat_id,
             ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day,
             COUNT(*)::BIGINT AS n
      FROM images GROUP BY 1, 2),
r AS (SELECT sat_id, n,
        MAX(n) OVER (PARTITION BY sat_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM c)
SELECT sat_id,
       SUM(CASE WHEN prev_max IS NULL OR n > prev_max THEN 1 ELSE 0 END)::BIGINT
         AS n_record_days,
       MAX(n)::BIGINT AS best_day_count
FROM r GROUP BY 1
"""

    # anti-join complement of the buffered city screen
    q["images_without_city"] = f"""
WITH {IMAGES_CTE}, {CITIES_CTE}
SELECT i.image_id FROM images i
WHERE NOT EXISTS (
  SELECT 1 FROM cities c
  WHERE greatest(i.x0 - c.lon, c.lon - i.x1, 0)
          * greatest(i.x0 - c.lon, c.lon - i.x1, 0)
      + greatest(i.y0 - c.lat, c.lat - i.y1, 0)
          * greatest(i.y0 - c.lat, c.lat - i.y1, 0)
      <= c.radius * c.radius)
"""

    # land-use mixing: zone-class pairs covered by the same image
    q["zone_class_cooccurrence"] = f"""
WITH {IMAGES_CTE}, {ZONES_CTE},
j AS (SELECT DISTINCT i.key, z.zone_id % 4 AS ci
      FROM images i JOIN zones z ON {ZONE_INTERSECTS}),
p AS (SELECT a.ci AS ca, b.ci AS cb
      FROM j a JOIN j b ON a.key = b.key AND a.ci < b.ci)
SELECT CASE ca WHEN 0 THEN 'Residential' WHEN 1 THEN 'Industrial'
               WHEN 2 THEN 'Agricultural' ELSE 'Protected' END AS class_a,
       CASE cb WHEN 0 THEN 'Residential' WHEN 1 THEN 'Industrial'
               WHEN 2 THEN 'Agricultural' ELSE 'Protected' END AS class_b,
       COUNT(*)::BIGINT AS n_images
FROM p GROUP BY 1, 2
"""

    # sliced model eval: LangId accuracy per length band
    q["langid_accuracy_by_len"] = f"""
WITH pred AS ({q["docs_langid"]})
SELECT d.n_chars // 256 AS band, COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END)::BIGINT AS n_correct,
       SUM(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END)::BIGINT * 1000000
         // COUNT(*)::BIGINT AS accuracy_ppm
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1
"""

    # per-priority fulfillment-lag medians (ceil-rank weighted median)
    q["priority_lag_median"] = """
WITH f AS (
  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS fs
  FROM lineitem GROUP BY 1),
l AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', CAST(o_orderdate AS DATE), fs) AS BIGINT) AS lag
  FROM f JOIN orders ON o_orderkey = l_orderkey)
SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders,
       CAST(quantile_disc(lag, 0.50) AS BIGINT) AS median_lag_days
FROM l GROUP BY 1
"""

    # per-source top-5 terms (ties -> lexicographically first)
    q["top_terms_per_source"] = r"""
WITH tok_raw AS (
  SELECT source, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tc AS (SELECT source, term, COUNT(*)::BIGINT AS n
       FROM tok_raw WHERE term <> '' GROUP BY 1, 2),
r AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY n DESC, term) AS rn FROM tc)
SELECT source, term, n FROM r WHERE rn <= 5
"""

    # Gini coefficient of per-country image counts (ascending-rank
    # formula; tie order is irrelevant to the sum)
    q["country_coverage_gini"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE},
c AS (SELECT n.iso, COUNT(*)::BIGINT AS x
      FROM countries n JOIN images i
        ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1
      GROUP BY 1),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS i,
             COUNT(*) OVER () AS n, SUM(x) OVER () AS tot
      FROM c)
SELECT MAX(n)::BIGINT AS n_countries, MAX(tot)::BIGINT AS total_pairs,
       SUM((2 * i - n - 1) * x)::BIGINT AS gini_num,
       SUM((2 * i - n - 1) * x)::BIGINT
         / (1.0 * (MAX(n)::BIGINT * MAX(tot)::BIGINT)) AS gini
FROM r
"""

    # quality-gate pass rate per language (corpus_clean gate, per lang)
    stop_list2 = ", ".join(f"'{w}'" for w in sorted(spec.STOPWORDS))
    q["lang_clean_rate"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, lang, unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
m AS (
  SELECT doc_id, lang,
         SUM(CASE WHEN term <> '' THEN 1 ELSE 0 END)::BIGINT AS nt,
         SUM(CASE WHEN term <> '' AND term IN ({stop_list2})
                  THEN 1 ELSE 0 END)::BIGINT AS sc
  FROM tok_raw GROUP BY 1, 2)
SELECT lang, COUNT(*)::BIGINT AS n_docs,
       SUM(CASE WHEN nt >= {spec.CLEAN_MIN_TOKENS}
                 AND sc * 100 <= {spec.CLEAN_MAX_STOP_PCT} * nt
                THEN 1 ELSE 0 END)::BIGINT AS n_clean,
       SUM(CASE WHEN nt >= {spec.CLEAN_MIN_TOKENS}
                 AND sc * 100 <= {spec.CLEAN_MAX_STOP_PCT} * nt
                THEN 1 ELSE 0 END)::BIGINT * 1000000
         // COUNT(*)::BIGINT AS clean_ppm
FROM m GROUP BY 1
"""

    # per-source character-class profile (ASCII corpus: bytes == chars)
    q["source_char_profile"] = r"""
WITH m AS (
  SELECT source, CAST(length(text) AS BIGINT) AS n,
    CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
         AS BIGINT) AS le,
    CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
         AS BIGINT) AS di,
    CAST(length(text) - length(regexp_replace(text, '[ \t\n\r\v\f]', '', 'g'))
         AS BIGINT) AS sp
  FROM documents)
SELECT source, SUM(n)::BIGINT AS n_chars,
       SUM(le)::BIGINT * 1000000 // SUM(n)::BIGINT AS letter_ppm,
       SUM(di)::BIGINT * 1000000 // SUM(n)::BIGINT AS digit_ppm,
       SUM(sp)::BIGINT * 1000000 // SUM(n)::BIGINT AS space_ppm
FROM m GROUP BY 1
"""

    # asset availability per (satellite, asset type)
    q["sat_asset_matrix"] = f"""
WITH {IMAGES_CTE},
bits AS (SELECT sat_id, {_mix(f'(key % {M})', spec.ST_ASSET)} AS ab FROM images)
SELECT sat_id, asset_type, n_images FROM (
  SELECT sat_id, 'analytic' AS asset_type, COUNT(*)::BIGINT AS n_images
  FROM bits GROUP BY 1
  UNION ALL
  SELECT sat_id, 'visual',
         SUM(CASE WHEN (ab >> 1) % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
  FROM bits GROUP BY 1
  UNION ALL
  SELECT sat_id, 'udm',
         SUM(CASE WHEN (ab >> 2) % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
  FROM bits GROUP BY 1)
WHERE n_images > 0
"""

    # Heaps-law vocabulary growth at power-of-two doc checkpoints
    # (bucket = smallest b with first_doc < 2^b, via an exact integer
    # powers join — no float log2)
    q["docs_vocab_growth"] = r"""
WITH tok_raw AS (
  SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tf AS (SELECT term, MIN(doc_id) AS first
       FROM tok_raw WHERE term <> '' GROUP BY 1),
pows AS (SELECT unnest(generate_series(0, 62)) AS b),
tb AS (SELECT t.term, MIN(p.b) AS bucket
       FROM tf t JOIN pows p ON t.first < (1::BIGINT << p.b) GROUP BY 1),
co AS (SELECT bucket, COUNT(*)::BIGINT AS n FROM tb GROUP BY 1)
SELECT (1::BIGINT << bucket) AS n_docs_checkpoint,
       CAST(SUM(n) OVER (ORDER BY bucket) AS BIGINT) AS vocab
FROM co
"""

    # --- fixed-size sketches & locality index (stages/sketch.py) ----------

    # image-pyramid level 1: 2x2 floor-mean pooling per decoded payload;
    # pixel(idx) = (key + idx) % 256, qraw8 quantized (& 0xFC == v - v%4).
    # One lateral row per pooled cell; GROUP BY (image_id, rk) keeps
    # tiny-sf duplicate keys per-ROW (the frame_sample_stats rule).
    def _pxv(idx: str) -> str:
        return (
            f"(CASE WHEN fmt = 'qraw8' THEN ((s + {idx}) % 256) - ((s + {idx}) % 4)"
            f" ELSE (s + {idx}) % 256 END)"
        )

    q["pixel_pyramid_stats"] = f"""
WITH {IMAGES_CTE},
base AS (
  SELECT image_id, key % 256 AS s, w, h, fmt,
         CAST(w // 2 AS BIGINT) AS pw, CAST(h // 2 AS BIGINT) AS ph,
         ROW_NUMBER() OVER (PARTITION BY image_id ORDER BY key) AS rk
  FROM images
),
cells AS (
  SELECT image_id, rk, s, w, fmt, pw, ph,
         (g.i % pw) * 2 AS c, (g.i // pw) * 2 AS r
  FROM base, LATERAL (SELECT unnest(generate_series(0, pw * ph - 1)) AS i) g
),
pooled AS (
  SELECT image_id, rk, pw, ph,
    ({_pxv('(r * w + c)')} + {_pxv('(r * w + c + 1)')}
     + {_pxv('((r + 1) * w + c)')} + {_pxv('((r + 1) * w + c + 1)')}) // 4 AS pv
  FROM cells
)
SELECT image_id, MAX(pw) AS pw, MAX(ph) AS ph,
       CAST(SUM(pv) AS BIGINT) AS pool_sum
FROM pooled GROUP BY image_id, rk
"""

    # Bloom-filter semi-join + audit: K=3 hash bits over one shared
    # 2^17-bit array; false positives are part of the op and mirrored.
    _bb = spec.BLOOM_BITS
    _bhash = [
        lambda k, st=st: f"({_mix(f'({k} % {M})', st)} % {_bb})" for st in spec.ST_BLOOM
    ]
    _okey_div = spec.KEY_LN_MULT * spec.KEY_PART_MULT * spec.KEY_SUPP_MULT
    q["bloom_semi_join"] = f"""
WITH {IMAGES_CTE},
sel AS (SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
bits AS (
  SELECT DISTINCT b FROM (
    SELECT {_bhash[0]('k')} AS b FROM sel
    UNION ALL SELECT {_bhash[1]('k')} FROM sel
    UNION ALL SELECT {_bhash[2]('k')} FROM sel) u
),
probe AS (SELECT sat_id, key // {_okey_div} AS okey FROM images),
f AS (
  SELECT sat_id,
    ({_bhash[0]('okey')} IN (SELECT b FROM bits)
     AND {_bhash[1]('okey')} IN (SELECT b FROM bits)
     AND {_bhash[2]('okey')} IN (SELECT b FROM bits)) AS pass,
    okey IN (SELECT k FROM sel) AS is_true
  FROM probe
)
SELECT sat_id,
  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  CAST(SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
  CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END)
       - SUM(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
FROM f GROUP BY sat_id
"""

    # Count-min sketch audit: order-free polynomial term key (position
    # join + SUM), DEPTH row grids as group-bys, est = least of the
    # hashed cells for the exact top-k terms.
    _pows_vals = ", ".join(
        f"({i + 1}, {w})" for i, w in enumerate(spec.CMS_POW31)
    )
    _cmsc = [
        lambda k, st=st: f"({_mix(k, st)} % {spec.CMS_WIDTH})" for st in spec.ST_CMS
    ]
    q["cms_heavy_hitters"] = rf"""
WITH tok_raw AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS term FROM documents),
tk AS (SELECT term FROM tok_raw WHERE term <> ''),
tc AS (SELECT term, COUNT(*) AS cnt FROM tk GROUP BY 1),
pows(i, wgt) AS (VALUES {_pows_vals}),
keys AS (
  SELECT t.term, t.cnt,
         CAST(SUM(CAST(ascii(substring(t.term, p.i, 1)) AS BIGINT) * p.wgt)
              % {M} AS BIGINT) AS tkey
  FROM tc t JOIN pows p ON p.i <= least(length(t.term), {spec.CMS_KEY_CHARS})
  GROUP BY t.term, t.cnt
),
r0 AS (SELECT {_cmsc[0]('tkey')} AS cell, SUM(cnt) AS tot FROM keys GROUP BY 1),
r1 AS (SELECT {_cmsc[1]('tkey')} AS cell, SUM(cnt) AS tot FROM keys GROUP BY 1),
r2 AS (SELECT {_cmsc[2]('tkey')} AS cell, SUM(cnt) AS tot FROM keys GROUP BY 1),
topk AS (SELECT term, cnt, tkey FROM keys ORDER BY cnt DESC, term
         LIMIT {spec.TOP_TERMS_K})
SELECT t.term, CAST(t.cnt AS BIGINT) AS n_exact,
       CAST(least(a.tot, b.tot, c.tot) AS BIGINT) AS cms_est
FROM topk t
JOIN r0 a ON a.cell = {_cmsc[0]('t.tkey')}
JOIN r1 b ON b.cell = {_cmsc[1]('t.tkey')}
JOIN r2 c ON c.cell = {_cmsc[2]('t.tkey')}
"""

    # HyperLogLog distinct days per satellite: register = val % m, rho =
    # 1 + trailing zeros of val // m (power-join MIN), estimate in exact
    # integers — the ESTIMATE itself is compared, like the KMV op.
    _m_hll = 1 << spec.HLL_REG_BITS
    _rmax = spec.HLL_RMAX
    q["hll_distinct_days"] = f"""
WITH {IMAGES_CTE},
d AS (
  SELECT DISTINCT sat_id,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day
  FROM images
),
u AS (SELECT sat_id, {_mix('day', spec.ST_HLL)} AS uu FROM d),
v AS (SELECT sat_id, (uu * uu + uu) % {M} AS val FROM u),
q2 AS (SELECT sat_id, val % {_m_hll} AS reg, val // {_m_hll} AS qq FROM v),
pows AS (SELECT unnest(generate_series(0, {_rmax})) AS b),
tz AS (
  SELECT sat_id, reg, qq, MIN(p.b) AS t
  FROM q2 LEFT JOIN pows p ON ((qq // (1::BIGINT << p.b)) % 2) = 1
  GROUP BY 1, 2, 3
),
regs AS (
  SELECT sat_id, reg,
         MAX(CASE WHEN qq = 0 THEN {_rmax}
                  ELSE least(t + 1, {_rmax}) END) AS rho
  FROM tz GROUP BY 1, 2
),
hs AS (
  SELECT sat_id,
         SUM(1::BIGINT << ({_rmax} - rho))
           + ({_m_hll} - COUNT(*)) * (1::BIGINT << {_rmax}) AS s
  FROM regs GROUP BY 1
),
ex AS (SELECT sat_id, COUNT(*) AS n FROM d GROUP BY 1)
SELECT e.sat_id, CAST(e.n AS BIGINT) AS n_days_exact,
  CAST(({spec.HLL_ALPHA_PPM}::BIGINT * {_m_hll} * {_m_hll} * (1::BIGINT << {_rmax}))
       // (1000000 * h.s) AS BIGINT) AS hll_est
FROM ex e JOIN hs h USING (sat_id)
"""

    # Z-order locality index: 8-bit axis quantization, bit interleave as
    # a sum of masked shifts, bucket = top 8 code bits.
    _ilv = " + ".join(
        f"(((x8 // {1 << i}) % 2) * {1 << (2 * i)})"
        f" + (((y8 // {1 << i}) % 2) * {1 << (2 * i + 1)})"
        for i in range(spec.MORTON_BITS)
    )
    q["morton_bucket_counts"] = f"""
WITH {IMAGES_CTE},
xy AS (
  SELECT key,
         (lon_md * {1 << spec.MORTON_BITS}) // {spec.LON_SPAN_MD} AS x8,
         (lat_md * {1 << spec.MORTON_BITS}) // {spec.LAT_SPAN_MD} AS y8
  FROM images
),
mc AS (SELECT key, ({_ilv}) AS code FROM xy)
SELECT code // {1 << (2 * spec.MORTON_BITS - spec.MORTON_PREFIX_BITS)} AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       MIN(key) AS min_key, MAX(key) AS max_key
FROM mc GROUP BY 1
"""

    # Weighted per-satellite sample: integer Efraimidis-Spirakis
    # priority = hash // (1 + clear); ROW_NUMBER mirror of the
    # partial-top-k combiner.
    q["weighted_sample_per_satellite"] = f"""
WITH {IMAGES_CTE},
b AS (
  SELECT image_id, key, sat_id,
         {_mix(f'(key % {M})', spec.ST_WSAMPLE)}
           // (1 + ({_mix(f'(key % {M})', spec.ST_CLEAR)} % 101)) AS priority
  FROM images
)
SELECT image_id, sat_id, priority FROM (
  SELECT image_id, sat_id, priority,
         ROW_NUMBER() OVER (PARTITION BY sat_id ORDER BY priority, key) AS rn
  FROM b
) WHERE rn <= {spec.WSAMPLE_K}
"""

    # Interval aggregate (active scenes per day): the oracle unrolls
    # each availability window with a lateral series (the semantic
    # definition); the engine computes the same curve with a
    # difference-array sweep.  Days with zero active scenes drop out of
    # the GROUP BY on both sides.
    _nd = spec.TIME_SPAN_HOURS // 24
    q["active_scenes_daily"] = f"""
WITH {IMAGES_CTE},
iv AS (
  SELECT ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS d0,
         ({_mix(f'(key % {M})', spec.ST_AVAIL)} % {spec.AVAIL_DUR_MOD}) + 1 AS dur
  FROM images
),
act AS (
  SELECT g.day AS day
  FROM iv,
       LATERAL (SELECT unnest(generate_series(d0, least(d0 + dur, {_nd - 1}))) AS day) g
)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active FROM act GROUP BY 1
"""

    # Grid connected components (coverage regions): occupied 0.5-degree
    # cells, 4-connected, min-label closure via recursive CTE —
    # tractable because 0.5-degree occupancy sits below the percolation
    # threshold at oracle scales (measured max component 42 cells at
    # sf0.01).
    _ny = spec.REGION_NY
    _rc = spec.REGION_CELL_MD
    q["coverage_regions"] = f"""
WITH RECURSIVE {IMAGES_CTE},
cells AS (
  SELECT DISTINCT (lon_md // {_rc}) * {_ny} + (lat_md // {_rc}) AS id,
         lon_md // {_rc} AS cx, lat_md // {_rc} AS cy
  FROM images
),
edges AS (
  SELECT a.id AS a, b.id AS b
  FROM cells a JOIN cells b
    ON (abs(a.cx - b.cx) + abs(a.cy - b.cy)) = 1
),
reach(node, label) AS (
  SELECT id, id FROM cells
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, COUNT(*) AS sz FROM comp GROUP BY cluster)
SELECT CAST(sz AS BIGINT) AS region_size, CAST(COUNT(*) AS BIGINT) AS n_regions
FROM sizes GROUP BY sz
"""

    # Bitmap-index co-observation matrix: shared active days per
    # satellite pair (canonical sat_a < sat_b, zero-overlap pairs drop
    # out on both sides).
    q["sat_coactive_days"] = f"""
WITH {IMAGES_CTE},
d AS (
  SELECT DISTINCT sat_id,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day
  FROM images
)
SELECT a.sat_id AS sat_a, b.sat_id AS sat_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM d a JOIN d b ON a.day = b.day AND a.sat_id < b.sat_id
GROUP BY 1, 2
"""

    # Range-partition planner: deterministic 1/64 key sample, boundary
    # i = sorted-sample rank (i*n)//B (1-based), bucket = #boundaries
    # <= key (the searchsorted-right mirror).
    _rb = spec.RP_BUCKETS
    q["range_partition_plan"] = f"""
WITH {IMAGES_CTE},
s AS (
  SELECT key FROM images
  WHERE {_mix(f'(key % {M})', spec.ST_RPSAMPLE)} % {spec.RP_SAMPLE_MOD} = 0
),
r AS (SELECT key, ROW_NUMBER() OVER (ORDER BY key) AS rn FROM s),
cnt AS (SELECT COUNT(*) AS n FROM s),
bnd AS (
  SELECT r.key AS bk
  FROM r, cnt,
       LATERAL (SELECT unnest(generate_series(1, {_rb - 1})) AS i) g
  WHERE r.rn = (g.i * cnt.n) // {_rb}
),
assigned AS (
  SELECT i.key,
         (SELECT COUNT(*) FROM bnd WHERE bnd.bk <= i.key) AS bucket
  FROM images i
)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(key) AS min_key, MAX(key) AS max_key
FROM assigned GROUP BY bucket
"""

    # Reciprocal (mutual) nearest neighbors: city's nearest image whose
    # nearest city is that city; ties -> lowest key / lowest city_id,
    # mirrored double expressions (same as image_nearest_city).
    q["reciprocal_nearest_city"] = f"""
WITH {IMAGES_CTE},
di AS (SELECT DISTINCT key, centroid_lon, centroid_lat FROM images),
cities AS (
  SELECT c_custkey AS city_id,
         ({_mix('c_custkey', spec.ST_CITY_LON)} % {spec.LON_SPAN_MD})/1000.0
           - {spec.LON_OFF} AS lon,
         ({_mix('c_custkey', spec.ST_CITY_LAT)} % {spec.LAT_SPAN_MD})/1000.0
           - {spec.LAT_OFF} AS lat
  FROM customer
),
d AS (
  SELECT i.key, c.city_id,
         (c.lon - i.centroid_lon) * (c.lon - i.centroid_lon)
       + (c.lat - i.centroid_lat) * (c.lat - i.centroid_lat) AS dist_sq
  FROM di i CROSS JOIN cities c
),
-- per-city min via GROUP BY (not a window sort over the cross join),
-- lowest key among distance ties
rmin AS (SELECT city_id, MIN(dist_sq) AS md FROM d GROUP BY 1),
rev AS (
  SELECT d.city_id, MIN(d.key) AS key, MIN(d.dist_sq) AS dist_sq
  FROM d JOIN rmin ON d.city_id = rmin.city_id AND d.dist_sq = rmin.md
  GROUP BY d.city_id
),
-- forward check only on the <= #cities candidate keys
fwd AS (
  SELECT key, city_id FROM (
    SELECT d.key, d.city_id,
           ROW_NUMBER() OVER (PARTITION BY d.key ORDER BY d.dist_sq, d.city_id) AS rn
    FROM d WHERE d.key IN (SELECT key FROM rev)) WHERE rn = 1
)
SELECT r.city_id, 'img-' || CAST(r.key AS VARCHAR) AS image_id, r.dist_sq
FROM rev r JOIN fwd f ON f.key = r.key AND f.city_id = r.city_id
"""

    # CMS join-cardinality estimate: per-row counter grids as
    # group-bys, est = least of the per-row inner products, exact
    # count beside it.
    _jw = spec.CMS_JOIN_WIDTH

    def _jcell(k: str, st: tuple[int, int]) -> str:
        # quadratic mix (see engine note: affine-only is collision-free
        # on dense integer keys, making the estimate trivially exact)
        u = _mix(k, st)
        return f"((({u} * {u} + {u}) % {M}) % {_jw})"

    _jc = [lambda k, st=st: _jcell(k, st) for st in spec.ST_CMS]
    q["join_size_estimate"] = f"""
WITH {IMAGES_CTE},
probe AS (SELECT key // {_okey_div} AS okey FROM images),
sel AS (SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
ga0 AS (SELECT {_jc[0]('okey')} AS cell, COUNT(*) AS c FROM probe GROUP BY 1),
ga1 AS (SELECT {_jc[1]('okey')} AS cell, COUNT(*) AS c FROM probe GROUP BY 1),
ga2 AS (SELECT {_jc[2]('okey')} AS cell, COUNT(*) AS c FROM probe GROUP BY 1),
gb0 AS (SELECT {_jc[0]('k')} AS cell, COUNT(*) AS c FROM sel GROUP BY 1),
gb1 AS (SELECT {_jc[1]('k')} AS cell, COUNT(*) AS c FROM sel GROUP BY 1),
gb2 AS (SELECT {_jc[2]('k')} AS cell, COUNT(*) AS c FROM sel GROUP BY 1),
d0 AS (SELECT SUM(a.c * b.c) AS v FROM ga0 a JOIN gb0 b USING (cell)),
d1 AS (SELECT SUM(a.c * b.c) AS v FROM ga1 a JOIN gb1 b USING (cell)),
d2 AS (SELECT SUM(a.c * b.c) AS v FROM ga2 a JOIN gb2 b USING (cell)),
ex AS (
  SELECT COUNT(*) AS n FROM probe WHERE okey IN (SELECT k FROM sel)
)
SELECT CAST(ex.n AS BIGINT) AS n_exact,
       CAST(least(d0.v, d1.v, d2.v) AS BIGINT) AS cms_est
FROM ex, d0, d1, d2
"""

    # Watermark / late-data accounting: running max over arrival order
    # (event_id), late = ts below watermark - 1 h; hourly on-time/late
    # counts.
    q["events_late_arrivals"] = f"""
WITH w AS (
  SELECT ts,
         MAX(ts) OVER (ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
  FROM events
),
f AS (
  SELECT epoch_us(ts) // 3600000000 AS hour_id,
         CASE WHEN pm IS NOT NULL
                   AND epoch_us(ts) < epoch_us(pm) - {spec.LATE_SLACK_US}
              THEN 1 ELSE 0 END AS late
  FROM w
)
SELECT hour_id,
       CAST(SUM(1 - late) AS BIGINT) AS n_on_time,
       CAST(SUM(late) AS BIGINT) AS n_late
FROM f GROUP BY 1
"""

    # Referential-integrity audit: orphan counts per dim-side FK.
    q["fk_integrity_audit"] = """
SELECT 'lineitem.l_suppkey->supplier' AS relation,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphans
FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
UNION ALL
SELECT 'lineitem.l_partkey->part',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
UNION ALL
SELECT 'orders.o_custkey->customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'events.user_id->customer',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""

    # Catalog stats (ANALYZE): per column n/min/max + the KMV distinct
    # estimate (sat_distinct_days estimator, exact below k).
    _an_cols = [
        ("sat_id", "sat_id"),
        ("w", "CAST(w AS BIGINT)"),
        ("h", "CAST(h AS BIGINT)"),
        ("cloud_mi", f"{_mix(f'(key % {M})', spec.ST_CLOUD)} % 1001"),
        ("clear_i", f"{_mix(f'(key % {M})', spec.ST_CLEAR)} % 101"),
    ]
    _an_parts = []
    for _nm, _expr in _an_cols:
        _an_parts.append(f"""
SELECT '{_nm}' AS column, s.n AS n_rows, s.vmin AS min_v, s.vmax AS max_v, e.ndv AS ndv_est
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, MIN(v) AS vmin, MAX(v) AS vmax
  FROM (SELECT {_expr} AS v FROM images)
) s, (
  SELECT CASE WHEN MAX(nd) < {spec.KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
              ELSE MAX(CASE WHEN rn = {spec.KMV_K}
                       THEN CAST({spec.KMV_K} - 1 AS DOUBLE) * {M} / hv END)
         END AS ndv
  FROM (
    SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn, COUNT(*) OVER () AS nd
    FROM (SELECT DISTINCT {_mix('v', spec.ST_KMV)} AS hv
          FROM (SELECT {_expr} AS v FROM images))
  )
) e""")
    q["images_analyze"] = (
        f"WITH {IMAGES_CTE}\n" + "\nUNION ALL\n".join(_an_parts)
    )

    # Adaptive quadtree tiling: leaf = first level at or below the
    # split threshold along the res 5 -> 6 -> 7 chain (res 7 is a leaf
    # regardless once both ancestors are hot).
    _t = spec.ADAPTIVE_SPLIT_MAX
    q["adaptive_tile_grid"] = f"""
WITH {IMAGES_CTE},
l5 AS (SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*) AS n
       FROM images GROUP BY 1, 2),
l6 AS (SELECT lon_md // 2000 AS cx, lat_md // 2000 AS cy, COUNT(*) AS n
       FROM images GROUP BY 1, 2),
l7 AS (SELECT lon_md // 1000 AS cx, lat_md // 1000 AS cy, COUNT(*) AS n
       FROM images GROUP BY 1, 2)
SELECT CAST(5 AS BIGINT) AS res, cx AS cell_x, cy AS cell_y,
       CAST(n AS BIGINT) AS n_images
FROM l5 WHERE n <= {_t}
UNION ALL
SELECT 6, a.cx, a.cy, CAST(a.n AS BIGINT)
FROM l6 a JOIN l5 p ON a.cx // 2 = p.cx AND a.cy // 2 = p.cy
WHERE p.n > {_t} AND a.n <= {_t}
UNION ALL
SELECT 7, a.cx, a.cy, CAST(a.n AS BIGINT)
FROM l7 a
JOIN l6 p ON a.cx // 2 = p.cx AND a.cy // 2 = p.cy
JOIN l5 g ON a.cx // 4 = g.cx AND a.cy // 4 = g.cy
WHERE g.n > {_t} AND p.n > {_t}
"""

    # Distributed-sort ordinal probe: ROW_NUMBER over the (hrs, key)
    # order, every PROBE_STEP-th 1-based ordinal.
    q["time_ordered_probe"] = f"""
WITH {IMAGES_CTE},
h AS (
  SELECT {_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS} AS hrs,
         key AS image_key
  FROM images
),
r AS (
  SELECT hrs, image_key,
         ROW_NUMBER() OVER (ORDER BY hrs, image_key) AS ordinal
  FROM h
)
SELECT ordinal, hrs, image_key FROM r
WHERE (ordinal - 1) % {spec.PROBE_STEP} = 0
"""

    # Batched box queries: one containment LEFT JOIN per broadcast box
    # (zero-hit boxes keep their row, mirroring the engine's all-boxes
    # partial).
    q["batched_box_queries"] = f"""
WITH {IMAGES_CTE},
boxes AS (
  SELECT g.i AS box_id,
         {_mix('g.i', spec.ST_BOX_X)} % {spec.LON_SPAN_MD - spec.BOX_W_MD} AS x0,
         {_mix('g.i', spec.ST_BOX_Y)} % {spec.LAT_SPAN_MD - spec.BOX_W_MD} AS y0
  FROM (SELECT unnest(generate_series(0, {spec.NBOX - 1})) AS i) g
)
SELECT b.box_id, CAST(COUNT(i.lon_md) AS BIGINT) AS n_images
FROM boxes b LEFT JOIN images i
  ON i.lon_md >= b.x0 AND i.lon_md < b.x0 + {spec.BOX_W_MD}
 AND i.lat_md >= b.y0 AND i.lat_md < b.y0 + {spec.BOX_W_MD}
GROUP BY 1
"""

    # Adaptive tile assignment: the leaves partition space, so three
    # disjoint equi-joins (one per res) cover every image exactly once.
    q["adaptive_tile_assignment"] = f"""
WITH {IMAGES_CTE},
l5 AS (SELECT lon_md // 4000 AS cx, lat_md // 4000 AS cy, COUNT(*) AS n
       FROM images GROUP BY 1, 2),
l6 AS (SELECT lon_md // 2000 AS cx, lat_md // 2000 AS cy, COUNT(*) AS n
       FROM images GROUP BY 1, 2),
l7 AS (SELECT lon_md // 1000 AS cx, lat_md // 1000 AS cy, COUNT(*) AS n
       FROM images GROUP BY 1, 2),
grid AS (
  SELECT CAST(5 AS BIGINT) AS res, cx, cy FROM l5 WHERE n <= {_t}
  UNION ALL
  SELECT 6, a.cx, a.cy
  FROM l6 a JOIN l5 p ON a.cx // 2 = p.cx AND a.cy // 2 = p.cy
  WHERE p.n > {_t} AND a.n <= {_t}
  UNION ALL
  SELECT 7, a.cx, a.cy
  FROM l7 a
  JOIN l6 p ON a.cx // 2 = p.cx AND a.cy // 2 = p.cy
  JOIN l5 g ON a.cx // 4 = g.cx AND a.cy // 4 = g.cy
  WHERE g.n > {_t} AND p.n > {_t}
)
SELECT g.res, g.cell_x, g.cell_y, g.sat_id,
       CAST(COUNT(*) AS BIGINT) AS n_images
FROM (
  SELECT grid.res, grid.cx AS cell_x, grid.cy AS cell_y, i.sat_id
  FROM images i JOIN grid
    ON grid.res = 5 AND grid.cx = i.lon_md // 4000 AND grid.cy = i.lat_md // 4000
  UNION ALL
  SELECT grid.res, grid.cx, grid.cy, i.sat_id
  FROM images i JOIN grid
    ON grid.res = 6 AND grid.cx = i.lon_md // 2000 AND grid.cy = i.lat_md // 2000
  UNION ALL
  SELECT grid.res, grid.cx, grid.cy, i.sat_id
  FROM images i JOIN grid
    ON grid.res = 7 AND grid.cx = i.lon_md // 1000 AND grid.cy = i.lat_md // 1000
) g
GROUP BY 1, 2, 3, 4
"""

    # k-core of the phash near-dup graph: KCORE_ROUNDS chained peel
    # sweeps (same fixed-chain pattern as image_pagerank — the engine
    # early-exits at the fixpoint, which is identical because peeling
    # is monotone).  e0 is the both-direction DISTINCT pair set; each
    # sweep keeps nodes with degree >= K and edges between them.
    _kparts = [
        f"""kbands AS (
  SELECT key, phash, b.v AS band_idx,
         (phash >> (16 * b.v)) & 65535 AS band_val
  FROM images, LATERAL (SELECT unnest(generate_series(0, {spec.PHASH_BANDS - 1})) AS v) b),
kprs AS MATERIALIZED (
  SELECT DISTINCT a.key AS ka, b.key AS kb
  FROM kbands a JOIN kbands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.key < b.key
  WHERE bit_count(xor(a.phash, b.phash)) <= {spec.PHASH_HAMMING_MAX}),
e0 AS MATERIALIZED (
  SELECT ka AS s, kb AS d FROM kprs UNION ALL SELECT kb AS s, ka AS d FROM kprs)"""
    ]
    for _i in range(1, spec.KCORE_ROUNDS + 1):
        _kparts.append(
            f"""kp{_i} AS MATERIALIZED (
  SELECT s FROM e{_i - 1} GROUP BY s HAVING COUNT(*) >= {spec.KCORE_K}),
e{_i} AS MATERIALIZED (
  SELECT e.s, e.d FROM e{_i - 1} e
  JOIN kp{_i} a ON a.s = e.s JOIN kp{_i} b ON b.s = e.d)"""
        )
    q["image_kcore"] = (
        f"WITH {IMAGES_CTE},\n"
        + ",\n".join(_kparts)
        + f"""
SELECT 'img-' || CAST(s AS VARCHAR) AS image_id, COUNT(*) AS core_deg
FROM e{spec.KCORE_ROUNDS} GROUP BY 1
"""
    )

    # IDW interpolation surface: 3x3 node-neighborhood emit with an
    # exact d2 <= R2 filter (radius <= step makes the neighborhood
    # complete); integer kernel WNUM // (WEPS + d2); all sums on the
    # int64 lattice so grouping order is free.
    _S, _R2 = spec.IDW_STEP_MD, spec.IDW_RADIUS_MD**2
    q["grid_idw_cloud"] = f"""
WITH {IMAGES_CTE},
pts AS (
  SELECT lon_md, lat_md,
         {_mix(f'(key % {M})', spec.ST_CLOUD)} % 1001 AS cloud_milli
  FROM images),
nb AS (SELECT unnest(generate_series(-1, 1)) AS d),
contrib AS (
  SELECT (lon_md // {_S}) + dx.d AS gx, (lat_md // {_S}) + dy.d AS gy,
         lon_md - ((lon_md // {_S}) + dx.d) * {_S} AS ddx,
         lat_md - ((lat_md // {_S}) + dy.d) * {_S} AS ddy,
         cloud_milli
  FROM pts JOIN nb dx ON TRUE JOIN nb dy ON TRUE),
f AS (
  SELECT gx, gy,
         {spec.IDW_WNUM} // ({spec.IDW_WEPS} + ddx*ddx + ddy*ddy) AS w,
         cloud_milli
  FROM contrib WHERE ddx*ddx + ddy*ddy <= {_R2})
SELECT gx, gy, COUNT(*) AS n_images,
  CAST(SUM(w) AS BIGINT) AS sum_w,
  CAST(SUM(w * cloud_milli) AS BIGINT) AS sum_wv,
  CAST(SUM(w * cloud_milli) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS idw_milli
FROM f GROUP BY 1, 2
"""

    # OLAP CUBE over (sat_id, fmt): the engine computes the finest
    # level distributed and derives subtotals exactly (sums compose);
    # GROUPING() bitmask ids match bit-for-bit.
    q["sat_fmt_cube"] = f"""
WITH {IMAGES_CTE},
v AS (SELECT sat_id, fmt,
             {_mix(f'(key % {M})', spec.ST_CLOUD)} % 1001 AS cloud_milli
      FROM images)
SELECT CAST(GROUPING(sat_id, fmt) AS BIGINT) AS gid, sat_id, fmt,
       COUNT(*) AS n_images,
       CAST(SUM(cloud_milli) AS BIGINT) AS sum_cloud_milli
FROM v
GROUP BY GROUPING SETS ((sat_id, fmt), (sat_id), (fmt), ())
"""

    # kNN-graph construction: exact top-K by (d2, neighbor key) among
    # the image_density Chebyshev-box candidates (complete for the 3x3
    # grid neighborhood); DISTINCT dedups tiny-sf duplicate keys like
    # image_density does.
    q["image_knn_graph"] = f"""
WITH {IMAGES_CTE},
pt AS (SELECT DISTINCT key, lon_md AS x, lat_md AS y FROM images),
cand AS (
  SELECT a.key AS ka, b.key AS kb,
         (a.x - b.x)*(a.x - b.x) + (a.y - b.y)*(a.y - b.y) AS d2
  FROM pt a JOIN pt b
    ON b.x BETWEEN a.x - {spec.DENSITY_RADIUS_MD} AND a.x + {spec.DENSITY_RADIUS_MD}
   AND b.y BETWEEN a.y - {spec.DENSITY_RADIUS_MD} AND a.y + {spec.DENSITY_RADIUS_MD}
   AND a.key <> b.key),
r AS (
  SELECT *, row_number() OVER (PARTITION BY ka ORDER BY d2, kb) AS rn
  FROM cand)
SELECT 'img-' || CAST(ka AS VARCHAR) AS image_id,
       CAST(rn AS BIGINT) AS nb_rank,
       'img-' || CAST(kb AS VARCHAR) AS neighbor_id,
       CAST(d2 AS BIGINT) AS d2
FROM r WHERE rn <= {spec.KNN_GRAPH_K}
"""

    # SCD2 interval compaction: gaps-and-islands over (ts, event_id)
    # per user; valid_to = next run's valid_from (NULL on the user's
    # current state); run_seq ordered by the island id (deterministic
    # under ts ties, unlike ordering by valid_from).
    q["events_state_history"] = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
         THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
r AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s),
g AS (
  SELECT user_id, run_id, MIN(event_type) AS state,
         MIN(ts) AS valid_from, MAX(ts) AS last_ts, COUNT(*) AS n_events
  FROM r GROUP BY 1, 2)
SELECT user_id, state, valid_from,
  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
  last_ts, n_events,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY run_id) AS BIGINT) AS run_seq
FROM g
"""

    # exact-quota stratified split: rank*100 < n*pct is pure-integer on
    # both sides (mirrors queries.q_stratified_split verbatim)
    q["stratified_split"] = f"""
WITH {IMAGES_CTE},
r AS (
  SELECT image_id, sat_id,
         ROW_NUMBER() OVER (PARTITION BY sat_id
             ORDER BY {_mix(f'(key % {M})', spec.ST_SPLIT)}, key) - 1 AS rk,
         COUNT(*) OVER (PARTITION BY sat_id) AS n
  FROM images)
SELECT image_id, sat_id,
       CASE WHEN rk*100 < n*{spec.SPLIT_TRAIN_PCT} THEN 'train'
            WHEN rk*100 < n*{spec.SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM r
"""

    # sandwich join: prev = last view at ts <= purchase ts (max
    # event_id on ties), next = first view at ts > purchase ts (min
    # event_id on ties); interpolation is one mirrored double
    # expression so numpy and DuckDB agree bitwise
    q["events_asof_interpolate"] = """
WITH v AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'),
p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
prev AS (
  SELECT purchase_id, vts AS pvts, vid AS prev_view_id, vv AS vp FROM (
    SELECT p.event_id AS purchase_id, v.ts AS vts, v.event_id AS vid, v.value AS vv,
           ROW_NUMBER() OVER (PARTITION BY p.event_id
               ORDER BY v.ts DESC, v.event_id DESC) AS rn
    FROM p JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
  WHERE rn = 1),
nxt AS (
  SELECT purchase_id, vts AS nvts, vid AS next_view_id, vv AS vn FROM (
    SELECT p.event_id AS purchase_id, v.ts AS vts, v.event_id AS vid, v.value AS vv,
           ROW_NUMBER() OVER (PARTITION BY p.event_id
               ORDER BY v.ts ASC, v.event_id ASC) AS rn
    FROM p JOIN v ON v.user_id = p.user_id AND v.ts > p.ts)
  WHERE rn = 1)
SELECT p.user_id, p.event_id AS purchase_id, prev_view_id, next_view_id,
       vp + (vn - vp) * (CAST(epoch_us(p.ts) - epoch_us(pvts) AS DOUBLE)
                         / CAST(epoch_us(nvts) - epoch_us(pvts) AS DOUBLE))
         AS value_interp
FROM p
JOIN prev ON prev.purchase_id = p.event_id
JOIN nxt  ON nxt.purchase_id = p.event_id
"""

    # grid DBSCAN: recursive min-label closure over 8-connected core
    # cells; border cells take the min adjacent core cluster
    q["grid_dbscan"] = f"""
WITH RECURSIVE {IMAGES_CTE},
cells AS MATERIALIZED (
  SELECT CAST(floor(centroid_lon / 2.0) AS BIGINT) AS gx,
         CAST(floor(centroid_lat / 2.0) AS BIGINT) AS gy,
         COUNT(*)::BIGINT AS n
  FROM images GROUP BY 1, 2),
core AS MATERIALIZED (
  SELECT gx, gy, n, gx*1000 + gy AS k FROM cells WHERE n >= {spec.DBSCAN_MINPTS}),
eg AS MATERIALIZED (
  SELECT a.k AS s, b.k AS d FROM core a JOIN core b
    ON abs(a.gx - b.gx) <= 1 AND abs(a.gy - b.gy) <= 1 AND a.k <> b.k),
reach(node, label) AS (
  SELECT k, k FROM core
  UNION
  SELECT e.d, r.label FROM eg e JOIN reach r ON r.node = e.s),
lab AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node),
core_l AS (
  SELECT c.gx, c.gy, c.n, l.cluster_id FROM core c JOIN lab l ON l.node = c.k),
border AS (
  SELECT c.gx, c.gy, c.n, MIN(cl.cluster_id) AS cluster_id
  FROM cells c JOIN core_l cl
    ON abs(c.gx - cl.gx) <= 1 AND abs(c.gy - cl.gy) <= 1
  WHERE c.n < {spec.DBSCAN_MINPTS}
  GROUP BY 1, 2, 3)
SELECT gx AS grid_lon, gy AS grid_lat, n AS n_images, cluster_id,
       'core' AS role
FROM core_l
UNION ALL
SELECT gx, gy, n, cluster_id, 'border' FROM border
"""

    # per-tile brightness change between acquisition-window halves:
    # pixel sums via the decode_stats closed form; the emission test is
    # pure-integer cross multiplication, means are mirrored divisions
    q["tile_change_detect"] = f"""
WITH {IMAGES_CTE}, {TILES_CTE},
px AS (
  SELECT t.tile_id,
         ({_mix(f'(t.key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) * 2
             >= {spec.TIME_SPAN_HOURS} AS half_b,
         CAST(t.w AS BIGINT) * CAST(t.h AS BIGINT) AS n_pixels,
         t.key % 256 AS s,
         t.key % {spec.LOSSY_EVERY_MOD} >= 8 AS isq
  FROM img_tiles t),
sums AS (
  SELECT tile_id, half_b, n_pixels,
    CASE WHEN isq THEN
      ((((s + n_pixels) // 256) * 32640
         + ((s + n_pixels) % 256) * (((s + n_pixels) % 256) - 1) // 2)
       - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2))
      - ((((s + n_pixels) // 4) * 6
         + ((s + n_pixels) % 4) * (((s + n_pixels) % 4) - 1) // 2)
       - ((s // 4) * 6 + (s % 4) * ((s % 4) - 1) // 2))
    ELSE
      (((s + n_pixels) // 256) * 32640
         + ((s + n_pixels) % 256) * (((s + n_pixels) % 256) - 1) // 2)
       - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2)
    END AS psum
  FROM px),
agg AS (
  SELECT tile_id, half_b, COUNT(*)::BIGINT AS n_img,
         SUM(n_pixels)::BIGINT AS npx, SUM(psum)::BIGINT AS ps
  FROM sums GROUP BY 1, 2)
SELECT a.tile_id, a.n_img AS n_a, b.n_img AS n_b,
       a.ps / CAST(a.npx AS DOUBLE) AS mean_a,
       b.ps / CAST(b.npx AS DOUBLE) AS mean_b,
       b.ps / CAST(b.npx AS DOUBLE) - a.ps / CAST(a.npx AS DOUBLE) AS delta
FROM agg a JOIN agg b ON a.tile_id = b.tile_id
WHERE a.half_b = false AND b.half_b = true
  AND abs(b.ps * a.npx - a.ps * b.npx) * 1000 >= {spec.CHANGE_MILLI} * a.npx * b.npx
"""

    # threshold-sensitivity histogram over the verified near-dup pairs:
    # integer percent buckets on both sides
    q["ngram_jaccard_hist"] = (
        "WITH base AS (" + q["ngram_jaccard_dups"] + """)
SELECT n_inter*100 // n_union AS jaccard_pct,
       COUNT(*)::BIGINT AS n_pairs
FROM base GROUP BY 1
"""
    )

    # Otsu threshold per satellite: histogram via the ramp closed form
    # (sat_equalization_lut's u CTE), then the exact integer micro-unit
    # between-class variance argmax the engine mirrors in Python ints:
    # score_u = (s0*(N-w0) - (S-s0)*w0)^2 * 1e6 // (w0*(N-w0)*N*N)
    q["sat_otsu_threshold"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
n_img AS (SELECT sat_id, fmt, key % 256 AS k0,
                 CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
          FROM images),
raw AS (
  SELECT i.sat_id, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v WHERE i.fmt = 'raw8' GROUP BY 1, 2),
qr AS (
  SELECT i.sat_id, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v + j.j - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v CROSS JOIN js j
  WHERE i.fmt = 'qraw8' AND v.v % 4 = 0 GROUP BY 1, 2),
u AS (
  SELECT sat_id, value, SUM(n_pixels)::BIGINT AS n_pixels
  FROM (SELECT * FROM raw UNION ALL SELECT * FROM qr)
  GROUP BY 1, 2 HAVING SUM(n_pixels) > 0),
c AS (
  SELECT sat_id, value AS t,
    CAST(SUM(n_pixels) OVER win AS BIGINT) AS w0,
    CAST(SUM(value * n_pixels) OVER win AS BIGINT) AS s0,
    CAST(SUM(n_pixels) OVER (PARTITION BY sat_id) AS BIGINT) AS n,
    CAST(SUM(value * n_pixels) OVER (PARTITION BY sat_id) AS BIGINT) AS s
  FROM u WINDOW win AS (PARTITION BY sat_id ORDER BY value)),
sc AS (
  SELECT sat_id, t, n,
    CAST(CAST(s0 * (n - w0) - (s - s0) * w0 AS HUGEINT)
         * (s0 * (n - w0) - (s - s0) * w0) * 1000000
      // (CAST(w0 AS HUGEINT) * (n - w0) * n * n) AS BIGINT) AS score_u
  FROM c WHERE w0 < n)
SELECT sat_id, t AS threshold, score_u, n AS n_pixels
FROM sc
QUALIFY row_number() OVER (PARTITION BY sat_id ORDER BY score_u DESC, t ASC) = 1
"""

    # Gini impurity of the pooled per-sat pixel histogram (same u CTE
    # as the Otsu oracle); gini_ppm = 1e6 - (1e6 * sum c^2) // N^2 in
    # HUGEINT, mirroring the engine's Python-int floor.
    q["sat_pixel_gini"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
js AS (SELECT unnest(generate_series(0, 3)) AS j),
n_img AS (SELECT sat_id, fmt, key % 256 AS k0,
                 CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
          FROM images),
raw AS (
  SELECT i.sat_id, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v WHERE i.fmt = 'raw8' GROUP BY 1, 2),
qr AS (
  SELECT i.sat_id, v.v AS value,
    CAST(SUM(i.n // 256
      + CASE WHEN ((v.v + j.j - i.k0) % 256 + 256) % 256 < i.n % 256
             THEN 1 ELSE 0 END) AS BIGINT) AS n_pixels
  FROM n_img i CROSS JOIN vals v CROSS JOIN js j
  WHERE i.fmt = 'qraw8' AND v.v % 4 = 0 GROUP BY 1, 2),
u AS (
  SELECT sat_id, value, SUM(n_pixels)::BIGINT AS n_pixels
  FROM (SELECT * FROM raw UNION ALL SELECT * FROM qr)
  GROUP BY 1, 2 HAVING SUM(n_pixels) > 0),
ag AS (
  SELECT sat_id, SUM(n_pixels)::BIGINT AS n_pixels,
         SUM(CAST(n_pixels AS HUGEINT) * n_pixels) AS ssq
  FROM u GROUP BY 1)
SELECT sat_id, n_pixels, CAST(ssq AS BIGINT) AS sum_sq,
       CAST(1000000 - (1000000 * ssq)
            // (CAST(n_pixels AS HUGEINT) * n_pixels) AS BIGINT) AS gini_ppm
FROM ag
"""

    # First-difference edge energy per satellite: the ramp's gradient
    # has a closed form — positions j in (s, s+n-1]; raw8 diff is 1
    # except 255 at each 256-wrap; qraw8 diff is 4 at each 4-boundary
    # except 252 at the wrap, 0 elsewhere.  The engine diffs the REAL
    # payload bytes; this is the per-image closed form summed per sat.
    q["sat_gradient_energy"] = f"""
WITH {IMAGES_CTE},
n_img AS (
  SELECT sat_id, fmt, key % 256 AS s,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images),
per AS (
  SELECT sat_id, n - 1 AS nd,
    CASE WHEN fmt = 'qraw8' THEN
      (((s + n - 1) // 4 - s // 4) - ((s + n - 1) // 256 - s // 256)) * 4
      + ((s + n - 1) // 256 - s // 256) * 252
    ELSE
      ((n - 1) - ((s + n - 1) // 256 - s // 256))
      + ((s + n - 1) // 256 - s // 256) * 255
    END AS e
  FROM n_img)
SELECT sat_id,
       SUM(e)::BIGINT AS energy,
       SUM(nd)::BIGINT AS n_diffs,
       CAST(SUM(e)::BIGINT * 1000 // SUM(nd)::BIGINT AS BIGINT) AS mean_milli
FROM per GROUP BY 1
"""

    # VERTICAL edge energy per satellite: pairs at lag w (the image's
    # pixel width).  On the ramp, position i carries residue
    # v = (s+i) % 256, so summing over the 256 residues with the
    # standard per-residue count (m//256 + carry) gives the exact
    # total: raw8 |p[i+w]-p[i]| is w unless the +w step wraps 256
    # (then 256-w); qraw8 diffs the two quantized stored values
    # directly.  The engine diffs the REAL payload bytes at a per-row
    # lag; this is the closed form summed per sat.
    q["sat_vertical_gradient"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
n_img AS (
  SELECT sat_id, fmt, key % 256 AS k0, CAST(w AS BIGINT) AS wd,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) - CAST(w AS BIGINT) AS m
  FROM images),
per AS (
  SELECT i.sat_id,
    (i.m // 256
       + CASE WHEN ((v.v - i.k0) % 256 + 256) % 256 < i.m % 256
              THEN 1 ELSE 0 END)
    * (CASE WHEN i.fmt = 'qraw8'
            THEN abs(4 * (((v.v + i.wd) % 256) // 4) - 4 * (v.v // 4))
            WHEN v.v < 256 - i.wd THEN i.wd
            ELSE 256 - i.wd END) AS e
  FROM n_img i CROSS JOIN vals v),
en AS (SELECT sat_id, SUM(e)::BIGINT AS energy FROM per GROUP BY 1),
nd AS (SELECT sat_id, SUM(m)::BIGINT AS n_diffs FROM n_img GROUP BY 1)
SELECT en.sat_id, en.energy, nd.n_diffs,
       CAST(en.energy * 1000 // nd.n_diffs AS BIGINT) AS mean_milli
FROM en JOIN nd USING (sat_id)
"""

    # anisotropy = horizontal vs vertical mean gradient per satellite:
    # the two closed forms above combined; exact HUGEINT ratio floor.
    q["sat_gradient_anisotropy"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
n_img AS (
  SELECT sat_id, fmt, key % 256 AS k0, CAST(w AS BIGINT) AS wd,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) - CAST(w AS BIGINT) AS m
  FROM images),
h_per AS (
  SELECT sat_id, n - 1 AS nd,
    CASE WHEN fmt = 'qraw8' THEN
      (((k0 + n - 1) // 4 - k0 // 4) - ((k0 + n - 1) // 256 - k0 // 256)) * 4
      + ((k0 + n - 1) // 256 - k0 // 256) * 252
    ELSE
      ((n - 1) - ((k0 + n - 1) // 256 - k0 // 256))
      + ((k0 + n - 1) // 256 - k0 // 256) * 255
    END AS e
  FROM n_img),
v_per AS (
  SELECT i.sat_id,
    (i.m // 256
       + CASE WHEN ((v.v - i.k0) % 256 + 256) % 256 < i.m % 256
              THEN 1 ELSE 0 END)
    * (CASE WHEN i.fmt = 'qraw8'
            THEN abs(4 * (((v.v + i.wd) % 256) // 4) - 4 * (v.v // 4))
            WHEN v.v < 256 - i.wd THEN i.wd
            ELSE 256 - i.wd END) AS e
  FROM n_img i CROSS JOIN vals v),
hh AS (SELECT sat_id, SUM(e)::BIGINT AS e_h, SUM(nd)::BIGINT AS nd_h
       FROM h_per GROUP BY 1),
vv AS (SELECT sat_id, SUM(e)::BIGINT AS e_v FROM v_per GROUP BY 1),
nn AS (SELECT sat_id, SUM(m)::BIGINT AS nd_v FROM n_img GROUP BY 1)
SELECT hh.sat_id, hh.e_h, hh.nd_h, vv.e_v, nn.nd_v,
       CAST(1000 * CAST(hh.e_h AS HUGEINT) * nn.nd_v
            // (CAST(vv.e_v AS HUGEINT) * hh.nd_h) AS BIGINT) AS aniso_milli
FROM hh JOIN vv USING (sat_id) JOIN nn USING (sat_id)
"""

    # bright-run count per satellite: in a ramp the bright set is the
    # contiguous value range [vmin, 255] (vmin = BRIGHT_T+1 for raw8,
    # next multiple of 4 above BRIGHT_T for qraw8), so a run starts
    # exactly where the value equals vmin — count positions
    # j in (s, s+n-1] with j % 256 == vmin (+256 keeps // non-negative),
    # plus the row-leading bright pixel.  The engine thresholds REAL
    # payload bytes.
    _vr = spec.BRIGHT_T + 1                       # raw8 lowest bright value
    _vq = ((spec.BRIGHT_T // 4) + 1) * 4          # qraw8 lowest bright stored value
    q["sat_bright_runs"] = f"""
WITH {IMAGES_CTE},
n_img AS (
  SELECT sat_id, fmt, key % 256 AS s,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images),
per AS (
  SELECT sat_id,
    CASE WHEN fmt = 'qraw8' THEN
      ((s + n - 1 - {_vq} + 256) // 256) - ((s - {_vq} + 256) // 256)
      + CASE WHEN s >= {_vq} THEN 1 ELSE 0 END
    ELSE
      ((s + n - 1 - {_vr} + 256) // 256) - ((s - {_vr} + 256) // 256)
      + CASE WHEN s >= {_vr} THEN 1 ELSE 0 END
    END AS runs
  FROM n_img)
SELECT sat_id,
       SUM(runs)::BIGINT AS n_runs,
       COUNT(*)::BIGINT AS n_images,
       CAST(SUM(runs)::BIGINT * 1000 // COUNT(*)::BIGINT AS BIGINT)
         AS runs_per_image_milli
FROM per GROUP BY 1
"""

    # Round-5 fused-pass rollup: per-satellite sums of EVERY closed-form
    # per-image pixel metric (pixel sum F/G prefix identities, sum of
    # squares F2 identities, horizontal/vertical ramp gradients,
    # bright-run starts, thresholded-stripe blob census via the Euler
    # identity).  The engine computes all of these from the REAL bytes
    # in ONE fused decode pass (pipelines/pixel_fused); a mismatch in
    # any column localizes the broken fused kernel.
    q["pixel_metrics_fused"] = f"""
WITH {IMAGES_CTE},
vals AS (SELECT unnest(generate_series(0, 255)) AS v),
n_img AS (
  SELECT sat_id, fmt, key % 256 AS s, CAST(w AS BIGINT) AS wd,
         CAST(h AS BIGINT) AS hd,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images),
-- exact pixel sum + sum of squares (decode_stats / audio closed forms)
scalars AS (
  SELECT sat_id, n,
    CASE WHEN fmt = 'qraw8' THEN
      ((((s + n) // 256) * 32640
        + ((s + n) % 256) * (((s + n) % 256) - 1) // 2)
       - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2))
      - ((((s + n) // 4) * 6
        + ((s + n) % 4) * (((s + n) % 4) - 1) // 2)
       - ((s // 4) * 6 + (s % 4) * ((s % 4) - 1) // 2))
    ELSE
      (((s + n) // 256) * 32640
        + ((s + n) % 256) * (((s + n) % 256) - 1) // 2)
      - ((s // 256) * 32640 + (s % 256) * ((s % 256) - 1) // 2)
    END AS ps,
    CASE WHEN fmt = 'qraw8' THEN
      16 * (((((s + n) // 256) * 341376
              + 4 * ((((s + n) % 256) // 4) * ((((s + n) % 256) // 4) - 1)
                     * (2 * (((s + n) % 256) // 4) - 1) // 6)
              + (((s + n) % 256) % 4) * (((s + n) % 256) // 4)
                * (((s + n) % 256) // 4)))
            - (((s // 256) * 341376
              + 4 * (((s % 256) // 4) * (((s % 256) // 4) - 1)
                     * (2 * ((s % 256) // 4) - 1) // 6)
              + ((s % 256) % 4) * ((s % 256) // 4) * ((s % 256) // 4))))
    ELSE
      (((s + n) // 256) * 5559680
        + ((s + n) % 256) * (((s + n) % 256) - 1) * (2 * ((s + n) % 256) - 1) // 6)
      - ((s // 256) * 5559680
        + (s % 256) * ((s % 256) - 1) * (2 * (s % 256) - 1) // 6)
    END AS sq
  FROM n_img),
h_per AS (
  SELECT sat_id, n - 1 AS nd,
    CASE WHEN fmt = 'qraw8' THEN
      (((s + n - 1) // 4 - s // 4) - ((s + n - 1) // 256 - s // 256)) * 4
      + ((s + n - 1) // 256 - s // 256) * 252
    ELSE
      ((n - 1) - ((s + n - 1) // 256 - s // 256))
      + ((s + n - 1) // 256 - s // 256) * 255
    END AS e
  FROM n_img),
v_per AS (
  SELECT i.sat_id,
    ((i.n - i.wd) // 256
       + CASE WHEN ((v.v - i.s) % 256 + 256) % 256 < (i.n - i.wd) % 256
              THEN 1 ELSE 0 END)
    * (CASE WHEN i.fmt = 'qraw8'
            THEN abs(4 * (((v.v + i.wd) % 256) // 4) - 4 * (v.v // 4))
            WHEN v.v < 256 - i.wd THEN i.wd
            ELSE 256 - i.wd END) AS e
  FROM n_img i CROSS JOIN vals v),
runs_per AS (
  SELECT sat_id,
    CASE WHEN fmt = 'qraw8' THEN
      ((s + n - 1 - {((spec.BRIGHT_T // 4) + 1) * 4} + 256) // 256)
      - ((s - {((spec.BRIGHT_T // 4) + 1) * 4} + 256) // 256)
      + CASE WHEN s >= {((spec.BRIGHT_T // 4) + 1) * 4} THEN 1 ELSE 0 END
    ELSE
      ((s + n - 1 - {spec.BRIGHT_T + 1} + 256) // 256)
      - ((s - {spec.BRIGHT_T + 1} + 256) // 256)
      + CASE WHEN s >= {spec.BRIGHT_T + 1} THEN 1 ELSE 0 END
    END AS runs
  FROM n_img),
blob_rows AS (
  SELECT sat_id, wd, hd, (s + g.r * wd) % 256 AS rs, g.r AS r
  FROM n_img,
       LATERAL (SELECT unnest(generate_series(0, hd - 1)) AS r) g),
blob_per AS (
  SELECT sat_id,
    SUM(GREATEST(0, LEAST(rs + wd, 256) - GREATEST(rs, 128))
      + GREATEST(0, LEAST(rs + wd, 512) - GREATEST(rs, 384)))::BIGINT AS fg,
    SUM(GREATEST(0, LEAST(rs + wd - 1, 255) - GREATEST(rs, 128))
      + GREATEST(0, LEAST(rs + wd - 1, 511) - GREATEST(rs, 384)))::BIGINT AS eh,
    SUM(CASE WHEN r < hd - 1 THEN
        GREATEST(0, LEAST(rs + wd, 256 - wd) - GREATEST(rs, 128))
      + GREATEST(0, LEAST(rs + wd, 512 - wd) - GREATEST(rs, 384))
      ELSE 0 END)::BIGINT AS ev,
    SUM(CASE WHEN r < hd - 1 THEN
        GREATEST(0, LEAST(rs + wd - 1, 255 - wd) - GREATEST(rs, 128))
      + GREATEST(0, LEAST(rs + wd - 1, 511 - wd) - GREATEST(rs, 384))
      ELSE 0 END)::BIGINT AS q
  FROM blob_rows GROUP BY 1),
sc AS (SELECT sat_id, COUNT(*)::BIGINT AS n_images, SUM(n)::BIGINT AS n_px,
              SUM(ps)::BIGINT AS pix_sum, SUM(sq)::BIGINT AS sumsq
       FROM scalars GROUP BY 1),
hh AS (SELECT sat_id, SUM(e)::BIGINT AS e_h, SUM(nd)::BIGINT AS nd_h
       FROM h_per GROUP BY 1),
vv AS (SELECT sat_id, SUM(e)::BIGINT AS e_v FROM v_per GROUP BY 1),
nn AS (SELECT sat_id, SUM(n - wd)::BIGINT AS nd_v FROM n_img GROUP BY 1),
rr AS (SELECT sat_id, SUM(runs)::BIGINT AS n_runs FROM runs_per GROUP BY 1),
bb AS (SELECT sat_id, fg AS n_fg, fg - eh - ev + q AS n_blobs FROM blob_per)
SELECT sc.sat_id, sc.n_images, sc.n_px, sc.pix_sum, sc.sumsq,
       hh.e_h, hh.nd_h, vv.e_v, nn.nd_v, rr.n_runs, bb.n_fg, bb.n_blobs
FROM sc JOIN hh USING (sat_id) JOIN vv USING (sat_id)
     JOIN nn USING (sat_id) JOIN rr USING (sat_id) JOIN bb USING (sat_id)
ORDER BY sc.sat_id
"""

    # The BASELINE lossy-codec invariant as a per-sat audit: qraw8
    # stores orig & 0xFC, so the residual at ramp position i is
    # (s + i) % 4 (4 divides 256); per-residue counts over [0, n) have
    # the standard n//4 + carry closed form, sse = cnt1 + 4*cnt2 +
    # 9*cnt3.  All-integer output (the 40 dB test is exact:
    # 10000*sse > 65025*n).
    q["sat_codec_psnr"] = f"""
WITH {IMAGES_CTE},
qimg AS (
  SELECT sat_id, key % 4 AS s4,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images WHERE fmt = 'qraw8'),
per AS (
  SELECT sat_id, n,
      (n // 4 + CASE WHEN ((1 - s4) % 4 + 4) % 4 < n % 4 THEN 1 ELSE 0 END)
    + (n // 4 + CASE WHEN ((2 - s4) % 4 + 4) % 4 < n % 4 THEN 1 ELSE 0 END) * 4
    + (n // 4 + CASE WHEN ((3 - s4) % 4 + 4) % 4 < n % 4 THEN 1 ELSE 0 END) * 9
      AS sse
  FROM qimg)
SELECT sat_id,
       COUNT(*)::BIGINT AS n_images,
       SUM(n)::BIGINT AS n_px,
       SUM(sse)::BIGINT AS sse,
       CAST(1000000 * SUM(sse)::BIGINT // SUM(n)::BIGINT AS BIGINT) AS mse_ppm,
       SUM(CASE WHEN 10000 * sse > 65025 * n THEN 1 ELSE 0 END)::BIGINT
         AS n_below_40db
FROM per GROUP BY 1 ORDER BY 1
"""

    # PERCENTILE_CONT quartiles over the 1001-level cloud grid, exact:
    # position (N-1)*j/4 in quarter units -> q4x4_milli =
    # x_k*(4-r) + x_{k+1}*r, integer on both sides (the engine computes
    # the same from its bounded histogram).
    q["sat_cloud_quartiles_cont"] = f"""
WITH {IMAGES_CTE},
h AS (
  SELECT sat_id, CAST(round(cloud_cover * 1000) AS BIGINT) AS v,
         COUNT(*)::BIGINT AS c
  FROM images GROUP BY 1, 2),
cumt AS (
  SELECT sat_id, v, c,
         CAST(SUM(c) OVER (PARTITION BY sat_id ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY sat_id) AS BIGINT) AS n
  FROM h),
qs AS (SELECT unnest(generate_series(1, 3)) AS j),
kr AS (
  SELECT DISTINCT sat_id, n, j,
         ((n - 1) * j) // 4 AS k, ((n - 1) * j) % 4 AS r
  FROM cumt CROSS JOIN qs),
xk AS (
  SELECT kr.sat_id, kr.j, kr.n, kr.r,
         MIN(CASE WHEN c1.cum >= kr.k + 1 THEN c1.v END) AS xa,
         MIN(CASE WHEN c1.cum >= kr.k + 2 THEN c1.v END) AS xb
  FROM kr JOIN cumt c1 USING (sat_id) GROUP BY 1, 2, 3, 4)
SELECT sat_id, CAST(j AS BIGINT) AS quartile, n AS n_images,
  CAST(xa * (4 - r) + CASE WHEN r > 0 THEN xb * r ELSE 0 END AS BIGINT)
    AS q4x4_milli
FROM xk
"""

    # FULL OUTER join over (satellite, acquisition day): clear-image
    # counts vs cloudy-image counts, COALESCEd to zero — the SQL mirror
    # of the engine's tagged-union groupby (where the outer falls out
    # of one key-hash exchange).
    q["sat_day_clear_cloudy_outer"] = f"""
WITH {IMAGES_CTE},
base AS (
  SELECT sat_id,
    (epoch_us(time_acquired)
       - epoch_us(TIMESTAMP '{spec.TIME_EPOCH}')) // 86400000000 AS day_idx,
    CAST(round(cloud_cover * 1000) AS BIGINT) AS cint
  FROM images),
clr AS (
  SELECT sat_id, day_idx, COUNT(*)::BIGINT AS n_clear
  FROM base WHERE cint < 300 GROUP BY 1, 2),
cld AS (
  SELECT sat_id, day_idx, COUNT(*)::BIGINT AS n_cloudy
  FROM base WHERE cint > 700 GROUP BY 1, 2)
SELECT COALESCE(a.sat_id, b.sat_id) AS sat_id,
       CAST(COALESCE(a.day_idx, b.day_idx) AS BIGINT) AS day_idx,
       COALESCE(a.n_clear, 0)::BIGINT AS n_clear,
       COALESCE(b.n_cloudy, 0)::BIGINT AS n_cloudy,
       CASE WHEN a.sat_id IS NULL THEN 'cloudy_only'
            WHEN b.sat_id IS NULL THEN 'clear_only'
            ELSE 'both' END AS side
FROM clr a FULL OUTER JOIN cld b
  ON a.sat_id = b.sat_id AND a.day_idx = b.day_idx
"""

    # Exact chunk-level substring dedup: non-overlapping 64-char chunks
    # (the corpus is ASCII, so character == byte semantics match the
    # engine's byte kernel), a chunk is duplicated when it occurs in
    # >= 2 DISTINCT docs, and every occurrence of a duplicated chunk
    # counts toward its doc.

    # cross-source shingle-overlap matrix: exact Jaccard + minhash
    # estimate per source pair (mirrors q_source_overlap; sig mins use
    # the same 64 perms over h32 as _minhash_sql)
    from .stages.text import _MH_A as _SOA, _MH_B as _SOB

    _so_mins = ",\n    ".join(
        f"MIN((h32 * {int(_SOA[i])} + {int(_SOB[i])}) % {_P61}) AS s{i}"
        for i in range(spec.MINHASH_PERMS)
    )
    _so_eqc = " + ".join(
        f"(CASE WHEN x.s{j} = y.s{j} THEN 1 ELSE 0 END)"
        for j in range(spec.MINHASH_PERMS)
    )
    q["source_overlap"] = f"""
WITH {_WIN_CTE},
sh AS (
  SELECT DISTINCT d.source, {_fnv_shingle('w.t', 'w.i')} AS h
  FROM win w JOIN documents d USING (doc_id)),
per AS (SELECT source, COUNT(*)::BIGINT AS n FROM sh GROUP BY 1),
com AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*)::BIGINT AS c
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2),
sig AS (
  SELECT source,
    {_so_mins}
  FROM (SELECT source, h & 4294967295 AS h32 FROM sh) GROUP BY source)
SELECT p.source AS source_a, q2.source AS source_b,
  p.n AS n_a, q2.n AS n_b,
  COALESCE(c.c, 0)::BIGINT AS n_common,
  (COALESCE(c.c, 0) * 1000000 // (p.n + q2.n - COALESCE(c.c, 0)))::BIGINT
    AS jaccard_ppm,
  (({_so_eqc}) * 1000000 // {spec.MINHASH_PERMS})::BIGINT AS est_ppm
FROM per p JOIN per q2 ON p.source < q2.source
LEFT JOIN com c ON c.sa = p.source AND c.sb = q2.source
JOIN sig x ON x.source = p.source
JOIN sig y ON y.source = q2.source
"""


    # rare-bigram novelty: per-doc share of bigram occurrences whose
    # GLOBAL count is <= RARE_BIGRAM_MAX (mirrors q_docs_rare_bigrams)
    q["docs_rare_bigrams"] = rf"""
WITH tok_raw AS (
  SELECT doc_id, generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos,
         unnest(string_split_regex(text, '\s+')) AS term
  FROM documents),
tk AS (SELECT doc_id, pos, term FROM tok_raw WHERE term <> ''),
bi AS (
  SELECT doc_id, term AS a,
         lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM tk),
bi2 AS MATERIALIZED (SELECT doc_id, a, b FROM bi WHERE b IS NOT NULL),
gc AS (SELECT a, b, COUNT(*)::BIGINT AS n FROM bi2 GROUP BY 1, 2),
per AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
         SUM(CASE WHEN g.n <= {spec.RARE_BIGRAM_MAX} THEN 1 ELSE 0 END)::BIGINT
           AS n_rare
  FROM bi2 JOIN gc g USING (a, b) GROUP BY doc_id)
SELECT doc_id, n_bigrams, n_rare,
       (n_rare * 1000000 // n_bigrams)::BIGINT AS rare_ppm
FROM per
"""


    # capture-cadence autocorrelation: per-(4-deg cell, day) counts,
    # raw lagged products normalized vs lag 0 (mirrors
    # q_cell_day_autocorr; all-integer)
    q["cell_day_autocorr"] = f"""
WITH {IMAGES_CTE},
c AS (
  SELECT (lon_md // {spec.AUTOCORR_CELL_MD}) * 1024
           + (lat_md // {spec.AUTOCORR_CELL_MD}) AS cell,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day,
         COUNT(*)::BIGINT AS c
  FROM images GROUP BY 1, 2),
lags AS (SELECT unnest(range({spec.AUTOCORR_MAX_LAG + 1})) AS lag),
s AS (
  SELECT l.lag, SUM(a.c * b.c)::BIGINT AS sum_prod
  FROM lags l
  JOIN c a ON TRUE
  JOIN c b ON b.cell = a.cell AND b.day = a.day + l.lag
  GROUP BY 1),
s0 AS (SELECT sum_prod AS s0 FROM s WHERE lag = 0)
SELECT lag, sum_prod, (sum_prod * 1000000 // s0.s0)::BIGINT AS r_ppm
FROM s, s0 ORDER BY lag
"""


    # best-IoU partner per image (both directions of the iou_hist pair
    # join; ties -> lowest partner key)
    q["image_best_iou"] = f"""
WITH {IMAGES_CTE},
bd AS (SELECT DISTINCT key, lon_md AS x, lat_md AS y, hw_md AS hw FROM images),
p AS (
  SELECT a.key AS ka, b.key AS kb,
         LEAST(a.x + a.hw, b.x + b.hw) - GREATEST(a.x - a.hw, b.x - b.hw) AS iw,
         LEAST(a.y + a.hw, b.y + b.hw) - GREATEST(a.y - a.hw, b.y - b.hw) AS ih,
         a.hw AS ha, b.hw AS hb
  FROM bd a JOIN bd b
    ON b.x BETWEEN a.x - 398 AND a.x + 398
   AND b.y BETWEEN a.y - 398 AND a.y + 398
   AND a.key <> b.key
  WHERE abs(a.x - b.x) < a.hw + b.hw AND abs(a.y - b.y) < a.hw + b.hw),
i AS (SELECT ka, kb,
             iw * ih * 1000000 // (4*ha*ha + 4*hb*hb - iw*ih) AS iou_ppm
      FROM p),
r AS (SELECT ka, kb, iou_ppm,
             ROW_NUMBER() OVER (PARTITION BY ka ORDER BY iou_ppm DESC, kb) AS rn
      FROM i)
SELECT 'img-' || CAST(ka AS VARCHAR) AS image_id,
       'img-' || CAST(kb AS VARCHAR) AS best_image_id,
       iou_ppm
FROM r WHERE rn = 1
"""


    # PQ-ADC mirror: chained per-iteration codebook CTEs on the long
    # (vec_id, dim, qv) lattice (the kmeans oracle pattern); subspace =
    # (dim-1)//SUBD.  Exact int math; the only floats are the quantize
    # and the floor(sum/count) update, identical to _pq_codebooks.
    _pqk, _pqm, _pqit = spec.PQ_K, spec.PQ_M, spec.PQ_ITERS
    _sd = 64 // _pqm
    _pq_parts = [
        f"""q AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {spec.KMEANS_QUANT}) AS BIGINT) AS qv
  FROM embeddings),
cb0 AS MATERIALIZED (SELECT vec_id AS code, dim, qv FROM q WHERE vec_id < {_pqk})"""
    ]
    for _i in range(1, _pqit + 1):
        _pq_parts.append(
            f"""d{_i} AS (
  SELECT q.vec_id, (q.dim - 1) // {_sd} AS sub, c.code,
         SUM((q.qv - c.qv) * (q.qv - c.qv)) AS dist
  FROM q JOIN cb{_i - 1} c USING (dim) GROUP BY 1, 2, 3),
a{_i} AS (SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
    FROM d{_i}) WHERE rn = 1),
s{_i} AS (
  SELECT a.code, q.dim, SUM(q.qv) AS sv, COUNT(*)::BIGINT AS cnt
  FROM q JOIN a{_i} a
    ON a.vec_id = q.vec_id AND a.sub = (q.dim - 1) // {_sd}
  GROUP BY 1, 2),
cb{_i} AS MATERIALIZED (
  SELECT c.code, c.dim,
         COALESCE(CAST(FLOOR(CAST(s.sv AS DOUBLE) / s.cnt) AS BIGINT), c.qv) AS qv
  FROM cb{_i - 1} c LEFT JOIN s{_i} s ON s.code = c.code AND s.dim = c.dim)"""
        )
    q["ann_pq_adc_topk"] = (
        "WITH "
        + ",\n".join(_pq_parts)
        + f""",
df AS (
  SELECT q.vec_id, (q.dim - 1) // {_sd} AS sub, c.code,
         SUM((q.qv - c.qv) * (q.qv - c.qv)) AS dist
  FROM q JOIN cb{_pqit} c USING (dim) GROUP BY 1, 2, 3),
af AS (SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
    FROM df) WHERE rn = 1),
dq AS (
  SELECT qq.vec_id AS query_id, (c.dim - 1) // {_sd} AS sub, c.code,
         SUM((qq.qv - c.qv) * (qq.qv - c.qv)) AS d
  FROM q qq JOIN cb{_pqit} c USING (dim)
  WHERE qq.vec_id % {spec.ANN_QUERY_MOD} = 0 GROUP BY 1, 2, 3),
score AS (
  SELECT dq.query_id, a.vec_id AS neighbor_id, CAST(SUM(dq.d) AS BIGINT) AS adc_d2
  FROM af a JOIN dq ON dq.sub = a.sub AND dq.code = a.code GROUP BY 1, 2),
ranked AS (
  SELECT query_id, neighbor_id, adc_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id)
           AS rank
  FROM score)
SELECT query_id, neighbor_id, adc_d2, rank FROM ranked WHERE rank <= {spec.ANN_TOPK}
"""
    )


    # nearest river segment per image: the polyline layer's steps all
    # share squared length SEG_LEN2, so scaled point-to-segment
    # distances (d^2 * SEG_LEN2) are exact BIGINTs comparable across
    # segments (mirrors q_image_nearest_segment)
    q["image_nearest_segment"] = f"""
WITH {IMAGES_CTE},
nk AS (SELECT n_nationkey AS nkey FROM nation),
st AS (
  SELECT nkey, CAST(k AS BIGINT) AS k,
         {_mix('(nkey*16 + k)', spec.ST_SEG_D)} % 8 AS sidx
  FROM nk, LATERAL (SELECT unnest(range(1, 9)) AS k) g),
raw AS (SELECT nkey, k, CASE sidx WHEN 0 THEN 3000 WHEN 1 THEN 4000 WHEN 2 THEN 0 WHEN 3 THEN 5000 WHEN 4 THEN -3000 WHEN 5 THEN -4000 WHEN 6 THEN 3000 WHEN 7 THEN 4000 END AS dx, CASE sidx WHEN 0 THEN 4000 WHEN 1 THEN 3000 WHEN 2 THEN 5000 WHEN 3 THEN 0 WHEN 4 THEN 4000 WHEN 5 THEN 3000 WHEN 6 THEN -4000 WHEN 7 THEN -3000 END AS dy FROM st),
verts AS (
  SELECT nkey, k,
    {_mix('nkey', spec.ST_SEG_X)} % 340000
      + SUM(dx) OVER (PARTITION BY nkey ORDER BY k) AS x,
    {_mix('nkey', spec.ST_SEG_Y)} % 132000
      + SUM(dy) OVER (PARTITION BY nkey ORDER BY k) AS y
  FROM raw),
v0 AS (
  SELECT nkey, CAST(0 AS BIGINT) AS k,
         {_mix('nkey', spec.ST_SEG_X)} % 340000 AS x,
         {_mix('nkey', spec.ST_SEG_Y)} % 132000 AS y
  FROM nk),
allv AS (SELECT * FROM v0 UNION ALL SELECT * FROM verts),
segs AS (
  SELECT nkey * 16 + k AS seg_id, x AS ax, y AS ay,
         lead(x) OVER (PARTITION BY nkey ORDER BY k) AS bx,
         lead(y) OVER (PARTITION BY nkey ORDER BY k) AS by_
  FROM allv QUALIFY bx IS NOT NULL),
bd AS (SELECT DISTINCT key, lon_md, lat_md FROM images),
c AS (
  SELECT p.key AS ikey, s.seg_id,
         p.lon_md - s.ax AS vx, p.lat_md - s.ay AS vy,
         s.bx - s.ax AS wx, s.by_ - s.ay AS wy,
         p.lon_md - s.bx AS ex, p.lat_md - s.by_ AS ey
  FROM bd p CROSS JOIN segs s),
d AS (
  SELECT ikey, seg_id,
    CASE WHEN vx*wx + vy*wy <= 0 THEN (vx*vx + vy*vy) * 25000000
         WHEN vx*wx + vy*wy >= 25000000 THEN (ex*ex + ey*ey) * 25000000
         ELSE (vx*vx + vy*vy) * 25000000 - (vx*wx + vy*wy)*(vx*wx + vy*wy)
    END AS d2n
  FROM c),
r AS (SELECT ikey, seg_id, d2n,
             ROW_NUMBER() OVER (PARTITION BY ikey ORDER BY d2n, seg_id) AS rn
      FROM d)
SELECT 'img-' || CAST(i.key AS VARCHAR) AS image_id, r.seg_id,
       CAST(r.d2n AS BIGINT) AS d2n
FROM images i JOIN r ON r.ikey = i.key AND r.rn = 1
"""


    # CUSUM change point per satellite over the full N-day calendar:
    # argmax |N*S_k - (k+1)*T|, denominators cleared (mirrors
    # q_sat_cusum_changepoint; all-integer)
    _cu_n = spec.TIME_SPAN_HOURS // 24
    q["sat_cusum_changepoint"] = f"""
WITH {IMAGES_CTE},
cnt AS (
  SELECT sat_id,
         ({_mix(f'(key % {M})', spec.ST_TIME)} % {spec.TIME_SPAN_HOURS}) // 24 AS day,
         COUNT(*)::BIGINT AS c
  FROM images GROUP BY 1, 2),
cal AS (
  SELECT s.sat_id, CAST(d.day AS BIGINT) AS day
  FROM (SELECT DISTINCT sat_id FROM images) s,
       LATERAL (SELECT unnest(range({_cu_n})) AS day) d),
dense AS (
  SELECT cal.sat_id, cal.day, COALESCE(cnt.c, 0) AS c
  FROM cal LEFT JOIN cnt ON cnt.sat_id = cal.sat_id AND cnt.day = cal.day),
w AS (
  SELECT sat_id, day,
         SUM(c) OVER (PARTITION BY sat_id ORDER BY day) AS s,
         SUM(c) OVER (PARTITION BY sat_id) AS t
  FROM dense),
dev AS (
  SELECT sat_id, day, abs({_cu_n} * s - (day + 1) * t) AS a FROM w),
r AS (
  SELECT sat_id, day, a,
         ROW_NUMBER() OVER (PARTITION BY sat_id ORDER BY a DESC, day) AS rn
  FROM dev)
SELECT sat_id, day AS cp_day, CAST(a AS BIGINT) AS abs_dev FROM r WHERE rn = 1
"""


    # corridor count per river segment (exact d2n <= R^2 * SEG_LEN2;
    # zero-count segments kept via the segment scaffold)
    _seg_prefix = q["image_nearest_segment"].split("bd AS")[0]
    q["segment_image_counts"] = (
        _seg_prefix
        + f"""bd AS (SELECT key, lon_md, lat_md FROM images),
c AS (
  SELECT s.seg_id,
         p.lon_md - s.ax AS vx, p.lat_md - s.ay AS vy,
         s.bx - s.ax AS wx, s.by_ - s.ay AS wy,
         p.lon_md - s.bx AS ex, p.lat_md - s.by_ AS ey
  FROM bd p CROSS JOIN segs s),
d AS (
  SELECT seg_id,
    CASE WHEN vx*wx + vy*wy <= 0 THEN (vx*vx + vy*vy) * {spec.SEG_LEN2}
         WHEN vx*wx + vy*wy >= {spec.SEG_LEN2} THEN (ex*ex + ey*ey) * {spec.SEG_LEN2}
         ELSE (vx*vx + vy*vy) * {spec.SEG_LEN2} - (vx*wx + vy*wy)*(vx*wx + vy*wy)
    END AS d2n
  FROM c),
hits AS (
  SELECT seg_id, COUNT(*)::BIGINT AS n
  FROM d WHERE d2n <= {spec.SEG_RADIUS_MD * spec.SEG_RADIUS_MD * spec.SEG_LEN2}
  GROUP BY 1)
SELECT s.seg_id, COALESCE(h.n, 0)::BIGINT AS n_images
FROM segs s LEFT JOIN hits h USING (seg_id)
"""
    )


    # Pareto skyline of (cloud_milli asc, clear desc): per-cloud max
    # clear, then a strict running-max scan (mirrors q_image_skyline)
    q["image_skyline"] = f"""
WITH {IMAGES_CTE},
pts AS (
  SELECT sat_id,
         {_mix(f'(key % {M})', spec.ST_CLOUD)} % 1001 AS cloud_milli,
         {_mix(f'(key % {M})', spec.ST_CLEAR)} % 101 AS clear,
         COUNT(*)::BIGINT AS n
  FROM images GROUP BY 1, 2, 3),
cand AS (
  SELECT sat_id, cloud_milli, MAX(clear) AS clear FROM pts GROUP BY 1, 2),
w AS (
  SELECT sat_id, cloud_milli, clear,
         MAX(clear) OVER (PARTITION BY sat_id ORDER BY cloud_milli
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM cand)
SELECT w.sat_id, w.cloud_milli, w.clear, p.n AS n_images
FROM w JOIN pts p USING (sat_id, cloud_milli, clear)
WHERE w.pm IS NULL OR w.clear > w.pm
"""

    # incremental manifest must equal the from-scratch recompute
    q["tile_manifest_incremental"] = q["tile_manifest"]


    # featureclass co-occurrence support per image (distinct image
    # keys; mirrors q_landcover_pair_support)
    q["landcover_pair_support"] = f"""
WITH {IMAGES_CTE}, {LAND_COVER_CTE},
prs AS (
  SELECT DISTINCT i.key, l.featureclass
  FROM images i JOIN lc l
    ON i.x0 <= l.x1 AND l.x0 <= i.x1 AND i.y0 <= l.y1 AND l.y0 <= i.y1)
SELECT a.featureclass AS fc_a, b.featureclass AS fc_b,
       COUNT(*)::BIGINT AS n_images
FROM prs a JOIN prs b
  ON a.key = b.key AND a.featureclass < b.featureclass
GROUP BY 1, 2
"""


    # directional extreme image per (country, direction) — integer dot
    # argmax, ties to lowest key (mirrors q_country_extreme_points)
    q["country_extreme_points"] = f"""
WITH {IMAGES_CTE}, {COUNTRIES_CTE},
dirs(dir_idx, dx, dy) AS (VALUES (0, 1, 0), (1, 1, 1), (2, 0, 1), (3, -1, 1), (4, -1, 0), (5, -1, -1), (6, 0, -1), (7, 1, -1)),
j AS (
  SELECT n.iso, i.key, i.lon_md, i.lat_md
  FROM countries n JOIN images i
    ON i.x0 <= n.x1 AND n.x0 <= i.x1 AND i.y0 <= n.y1 AND n.y0 <= i.y1),
s AS (
  SELECT j.iso, d.dir_idx, d.dx * j.lon_md + d.dy * j.lat_md AS dot, j.key
  FROM j CROSS JOIN dirs d),
r AS (
  SELECT iso, dir_idx, dot, key,
         ROW_NUMBER() OVER (PARTITION BY iso, dir_idx ORDER BY dot DESC, key)
           AS rn
  FROM s)
SELECT iso, CAST(dir_idx AS BIGINT) AS dir_idx, dot,
       'img-' || CAST(key AS VARCHAR) AS image_id
FROM r WHERE rn = 1
"""


    # per-satellite hardest images: top-5 by exact closed-form mean
    # gradient (mirrors q_sat_hardest_images over REAL payload bytes)
    q["sat_hardest_images"] = f"""
WITH {IMAGES_CTE},
n_img AS (
  SELECT sat_id, key, fmt, key % 256 AS s,
         CAST(w AS BIGINT) * CAST(h AS BIGINT) AS n
  FROM images),
per AS (
  SELECT sat_id, key, n - 1 AS nd,
    CASE WHEN fmt = 'qraw8' THEN
      (((s + n - 1) // 4 - s // 4) - ((s + n - 1) // 256 - s // 256)) * 4
      + ((s + n - 1) // 256 - s // 256) * 252
    ELSE
      ((n - 1) - ((s + n - 1) // 256 - s // 256))
      + ((s + n - 1) // 256 - s // 256) * 255
    END AS e
  FROM n_img),
m AS (SELECT DISTINCT sat_id, key, e * 1000 // nd AS mean_milli FROM per),
r AS (
  SELECT sat_id, key, mean_milli,
         ROW_NUMBER() OVER (PARTITION BY sat_id
                            ORDER BY mean_milli DESC, key) AS rank
  FROM m)
SELECT sat_id, 'img-' || CAST(key AS VARCHAR) AS image_id, mean_milli,
       rank
FROM r WHERE rank <= 5
"""

    q["docs_substring_dups"] = """
WITH chunks AS (
  SELECT doc_id, substring(text, 1 + i * 64, 64) AS chunk
  FROM (SELECT doc_id, text,
               unnest(range(CAST(length(text) // 64 AS BIGINT))) AS i
        FROM documents)
),
dup AS (
  SELECT chunk FROM chunks GROUP BY chunk HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_dup_chunks
  FROM chunks WHERE chunk IN (SELECT chunk FROM dup) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) // 64 AS BIGINT) AS n_chunks,
       COALESCE(p.n_dup_chunks, 0)::BIGINT AS n_dup_chunks,
       (COALESCE(p.n_dup_chunks, 0) * 64)::BIGINT AS dup_bytes
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

    return q
