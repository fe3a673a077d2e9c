"""Unit + property tests for the pure-numpy geometry layer."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from planet_data_analyzer_ray.geo import cells, kernels, wkb
from planet_data_analyzer_ray.geo.strtree import STRtree


# --- WKB round trips -------------------------------------------------------

def test_wkb_point_roundtrip():
    pts = wkb.encode_points(np.array([1.5, -170.0]), np.array([-2.25, 66.0]))
    for raw, (x, y) in zip(pts, [(1.5, -2.25), (-170.0, 66.0)]):
        typ, c = wkb.decode_geometry(raw)
        assert typ == wkb.WKB_POINT
        assert c[0, 0] == x and c[0, 1] == y


def test_wkb_box_roundtrip_and_bbox():
    x0 = np.array([0.0, -10.0])
    y0 = np.array([1.0, -20.0])
    x1 = np.array([2.0, -5.0])
    y1 = np.array([3.0, -15.0])
    raws = wkb.encode_boxes(x0, y0, x1, y1)
    bx0, by0, bx1, by1 = wkb.decode_boxes(raws)
    np.testing.assert_array_equal(bx0, x0)
    np.testing.assert_array_equal(by1, y1)
    typ, ring = wkb.decode_geometry(raws[0])
    assert typ == wkb.WKB_POLYGON and len(ring) == 5


def test_wkb_general_polygon():
    tri = np.array([[0, 0], [4, 0], [2, 3]], dtype=float)
    raw = wkb.encode_polygon(tri)
    typ, ring = wkb.decode_geometry(raw)
    assert typ == wkb.WKB_POLYGON
    assert (ring[0] == ring[-1]).all()
    assert kernels.ring_area(ring) == pytest.approx(6.0)


# --- predicates ------------------------------------------------------------

def test_point_in_polygon_triangle():
    tri = np.array([[0, 0], [4, 0], [2, 3], [0, 0]], dtype=float)
    px = np.array([2.0, 3.9, -1.0, 2.0])
    py = np.array([1.0, 2.9, 0.5, 2.9])
    got = kernels.points_in_polygon(px, py, tri)
    assert got.tolist() == [True, False, False, True]


def test_polygons_intersect_cases():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    far = sq + 10.0
    touch = sq + np.array([2.0, 0.0])
    inside = np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]])
    cross = sq + np.array([1.0, 1.0])
    assert not kernels.polygons_intersect(sq, far)
    assert kernels.polygons_intersect(sq, touch)  # edge touch counts
    assert kernels.polygons_intersect(sq, inside)  # containment
    assert kernels.polygons_intersect(inside, sq)  # either direction
    assert kernels.polygons_intersect(sq, cross)


def test_ring_centroid_and_area():
    sq = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
    cx, cy = kernels.ring_centroid(sq)
    assert (cx, cy) == (2.0, 2.0)
    assert kernels.ring_area(sq) == 4.0


def test_rect_union_area_overlaps():
    # two overlapping 2x2 squares sharing a 1x2 strip -> area 6
    x0 = np.array([0.0, 1.0])
    y0 = np.array([0.0, 0.0])
    x1 = np.array([2.0, 3.0])
    y1 = np.array([2.0, 2.0])
    assert kernels.rect_union_area(x0, y0, x1, y1) == pytest.approx(6.0)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-50, 50), st.floats(-50, 50), st.floats(0.1, 10), st.floats(0.1, 10)
        ),
        min_size=1,
        max_size=12,
    )
)
def test_rect_union_area_monte_carlo(rects):
    x0 = np.array([r[0] for r in rects])
    y0 = np.array([r[1] for r in rects])
    x1 = x0 + np.array([r[2] for r in rects])
    y1 = y0 + np.array([r[3] for r in rects])
    exact = kernels.rect_union_area(x0, y0, x1, y1)
    # grid oracle on a modest lattice
    gx = np.unique(np.concatenate([x0, x1]))
    gy = np.unique(np.concatenate([y0, y1]))
    area = 0.0
    for i in range(len(gx) - 1):
        for j in range(len(gy) - 1):
            cx, cy = (gx[i] + gx[i + 1]) / 2, (gy[j] + gy[j + 1]) / 2
            if ((x0 <= cx) & (cx <= x1) & (y0 <= cy) & (cy <= y1)).any():
                area += (gx[i + 1] - gx[i]) * (gy[j + 1] - gy[j])
    assert exact == pytest.approx(area, rel=1e-9)


def test_clip_ring_to_box():
    tri = np.array([[0, 0], [4, 0], [2, 3], [0, 0]], dtype=float)
    clipped = kernels.clip_ring_to_box(tri, 1, 0.0, 3, 10.0)
    assert len(clipped) >= 4
    # clip of the triangle to x in [1,3]: area = total - two corners
    a = kernels.ring_area(clipped)
    assert 0 < a < kernels.ring_area(tri)
    # full-cover box is identity area
    full = kernels.clip_ring_to_box(tri, -10, -10, 10, 10)
    assert kernels.ring_area(full) == pytest.approx(6.0)
    # disjoint box is empty
    assert len(kernels.clip_ring_to_box(tri, 10, 10, 20, 20)) == 0


def test_circle_box_dist_sq():
    d2 = kernels.circle_box_dist_sq(
        np.array([0.0, 5.0, 3.0]),
        np.array([0.0, 5.0, 1.0]),
        np.array([1.0, 1.0, 1.0]),
        np.array([1.0, 1.0, 0.0]),
        np.array([2.0, 2.0, 2.0]),
        np.array([2.0, 2.0, 2.0]),
    )
    assert d2[0] == 2.0  # (0,0) to corner (1,1)
    assert d2[1] == 18.0  # (5,5) to corner (2,2)
    assert d2[2] == 1.0  # (3,1) right of box x[1,2],y[0,2]: dx=1, dy=0


# --- STRtree ---------------------------------------------------------------

@settings(max_examples=30, deadline=None)
@given(st.integers(0, 200), st.integers(1, 50))
def test_strtree_matches_linear_scan(n, nq):
    rng = np.random.RandomState(n * 1000 + nq)
    x0 = rng.uniform(-100, 100, n)
    y0 = rng.uniform(-100, 100, n)
    x1 = x0 + rng.uniform(0, 10, n)
    y1 = y0 + rng.uniform(0, 10, n)
    tree = STRtree(x0, y0, x1, y1, leaf_size=8)
    qx0 = rng.uniform(-100, 100, nq)
    qy0 = rng.uniform(-100, 100, nq)
    qx1 = qx0 + rng.uniform(0, 20, nq)
    qy1 = qy0 + rng.uniform(0, 20, nq)
    qi, ti = tree.query_batch(qx0, qy0, qx1, qy1)
    got = set(zip(qi.tolist(), ti.tolist()))
    expected = set()
    for q in range(nq):
        m = (x0 <= qx1[q]) & (qx0[q] <= x1) & (y0 <= qy1[q]) & (qy0[q] <= y1)
        for t in np.nonzero(m)[0]:
            expected.add((q, int(t)))
    assert got == expected


# --- cells -----------------------------------------------------------------

def test_cell_covering_and_tiles():
    x0 = np.array([-0.1, 3.9])
    y0 = np.array([-0.1, 0.1])
    x1 = np.array([0.1, 4.1])
    y1 = np.array([0.1, 0.3])
    rows, cs = cells.covering(x0, y0, x1, y1)
    # first box straddles 4 base cells (cell edge at 0 mod 4 offset -170/-66)
    assert (rows == 0).sum() >= 1 and (rows == 1).sum() >= 1
    rows2, tiles = cells.tile_ids(x0, y0, x1, y1)
    assert len(rows2) >= 2
    # pack/unpack round trip
    cx, cy = cells.unpack(cs)
    assert (cells.pack(cx, cy) == cs).all()


def test_ring_cells():
    c = cells.cell_of(np.array([0.0]), np.array([0.0]))[0]
    ring = cells.ring_cells(int(c), 1)
    assert len(ring) == 9 and c in ring


def test_morton_deterministic_and_bounded():
    x = np.array([0.0, 0.1, 100.0, -170.0, 169.99])
    y = np.array([0.0, 0.1, -50.0, -66.0, 65.99])
    m = cells.morton(x, y)
    assert (m == cells.morton(x, y)).all()
    assert (m >= 0).all() and (m < np.int64(1) << 32).all()
    assert len(np.unique(m[[0, 2, 3, 4]])) == 4  # far-apart points distinct


def test_morton_prefix_locality():
    """Points in the same quadrant share the code's high bits (the
    property partitioning relies on), unlike points in different
    quadrants."""
    ql = cells.morton(np.array([-100.0, -99.0]), np.array([-30.0, -29.0]))
    qr = cells.morton(np.array([100.0]), np.array([30.0]))
    top = lambda v: int(v) >> 28
    assert top(ql[0]) == top(ql[1])
    assert top(ql[0]) != top(qr[0])


def test_rotated_quad_is_not_a_box():
    """A 5-point closed ring that is NOT axis-aligned must take the
    exact polygon-refinement path (code-review regression)."""
    import pyarrow as pa
    import ray.data

    from planet_data_analyzer_ray.stages import spatial_join

    diamond = np.array([[5.0, 0.0], [10.0, 5.0], [5.0, 10.0], [0.0, 5.0], [5.0, 0.0]])
    layer = pa.table(
        {
            "lc_id": pa.array([1], type=pa.int64()),
            "geom_wkb": pa.array([wkb.encode_polygon(diamond)], type=pa.binary()),
        }
    )
    imgs = ray.data.from_arrow(
        pa.table(
            {
                # A: bbox corner, outside the diamond; B: center, inside
                "image_id": pa.array(["A", "B"], type=pa.string()),
                "x0": pa.array([0.2, 4.5]),
                "y0": pa.array([0.2, 4.5]),
                "x1": pa.array([1.0, 5.5]),
                "y1": pa.array([1.0, 5.5]),
            }
        )
    )
    got = spatial_join.broadcast_spatial_join(imgs, layer, id_col="lc_id").to_pandas()
    assert set(zip(got["image_id"], got["lc_id"])) == {("B", 1)}


def test_salt_count_cap_enforced():
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from planet_data_analyzer_ray.stages import spatial_join

    ds = ray.data.from_arrow(
        pa.table({"image_id": pa.array(["a"]), "x0": pa.array([0.0]), "y0": pa.array([0.0]), "x1": pa.array([1.0]), "y1": pa.array([1.0])})
    )
    with _pytest.raises(ValueError, match="salt counts"):
        spatial_join.partitioned_spatial_join(ds, ds, salt_cells={1: 100})


def test_box_ring_intersect_matches_scalar_kernel():
    """Vectorized box-vs-ring refinement == the generic polygon-polygon
    kernel on random boxes vs triangles and rotated quads."""
    import numpy as np

    from planet_data_analyzer_ray.geo import kernels

    rng = np.random.RandomState(11)
    rings = []
    for _ in range(20):  # random triangles
        pts = rng.uniform(0, 10, (3, 2))
        rings.append(np.vstack([pts, pts[:1]]))
    for _ in range(10):  # rotated quads
        c = rng.uniform(2, 8, 2)
        ang = rng.uniform(0, np.pi)
        w, h = rng.uniform(0.5, 3, 2)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        quad = np.array([[-w, -h], [w, -h], [w, h], [-w, h]]) @ R.T + c
        rings.append(np.vstack([quad, quad[:1]]))
    n = 300
    bx0 = rng.uniform(-1, 10, n)
    by0 = rng.uniform(-1, 10, n)
    bx1 = bx0 + rng.uniform(0.05, 4, n)
    by1 = by0 + rng.uniform(0.05, 4, n)
    for ring in rings:
        got = kernels.box_ring_intersect(bx0, by0, bx1, by1, ring)
        for i in range(n):
            box_ring = np.array(
                [
                    [bx0[i], by0[i]],
                    [bx1[i], by0[i]],
                    [bx1[i], by1[i]],
                    [bx0[i], by1[i]],
                    [bx0[i], by0[i]],
                ]
            )
            want = kernels.polygons_intersect(box_ring, ring)
            assert bool(got[i]) == bool(want), (i, ring[:4])


def test_box_rings_pairs_matches_grouped_kernel():
    """Pair-batched refinement == the per-polygon kernel on random
    boxes vs triangles."""
    import numpy as np

    from planet_data_analyzer_ray.geo import kernels

    rng = np.random.RandomState(5)
    n = 500
    bx0 = rng.uniform(-1, 10, n)
    by0 = rng.uniform(-1, 10, n)
    bx1 = bx0 + rng.uniform(0.05, 4, n)
    by1 = by0 + rng.uniform(0.05, 4, n)
    rings = np.empty((n, 4, 2))
    for i in range(n):
        pts = rng.uniform(0, 10, (3, 2))
        rings[i] = np.vstack([pts, pts[:1]])
    got = kernels.box_rings_intersect_pairs(bx0, by0, bx1, by1, rings)
    for i in range(n):
        want = kernels.box_ring_intersect(
            bx0[i : i + 1], by0[i : i + 1], bx1[i : i + 1], by1[i : i + 1], rings[i]
        )[0]
        assert bool(got[i]) == bool(want), i


def test_rect_union_area_grid_matches_sweep():
    import numpy as np

    from planet_data_analyzer_ray.geo import kernels

    rng = np.random.RandomState(6)
    for trial in range(100):
        n = rng.randint(1, 60)
        x0 = rng.uniform(0, 10, n)
        x1 = x0 + rng.uniform(0.1, 5, n)
        y0 = rng.uniform(0, 10, n)
        y1 = y0 + rng.uniform(0.1, 5, n)
        a = kernels.rect_union_area(x0, y0, x1, y1)
        b = kernels.rect_union_area_grid(x0, y0, x1, y1)
        assert abs(a - b) < 1e-9 * max(a, 1.0), trial


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),        # featureclass code
            st.integers(0, 50),       # x0
            st.integers(1, 30),       # width
            st.integers(0, 50),       # y0
            st.integers(1, 30),       # height
        ),
        min_size=1,
        max_size=40,
    )
)
def test_slab_sweep_sql_matches_union_kernel(rects):
    """The DuckDB slab-sweep CTE (oracle mirror of the exact dissolve /
    coverage queries) computes the same integer union area as the numpy
    rect_union_area kernel on arbitrary int rect sets."""
    import duckdb
    import numpy as np

    from planet_data_analyzer_ray.geo import kernels
    from planet_data_analyzer_ray.oracle import _slab_union_cte

    # duplicate every rect once: identical (y0, y1) intervals within a
    # slab create window-ordering ties — the regression that
    # double-counted the tiny-sf duplicate image key
    rects = rects + rects
    fc = np.array([r[0] for r in rects], dtype=np.int64)
    x0 = np.array([r[1] for r in rects], dtype=np.int64)
    x1 = x0 + np.array([r[2] for r in rects], dtype=np.int64)
    y0 = np.array([r[3] for r in rects], dtype=np.int64)
    y1 = y0 + np.array([r[4] for r in rects], dtype=np.int64)

    con = duckdb.connect()
    rows = ", ".join(
        f"('{int(f)}', {int(a)}, {int(b)}, {int(c)}, {int(d)})"
        for f, a, b, c, d in zip(fc, x0, x1, y0, y1)
    )
    sql = f"""
WITH src(featureclass, x0, x1, y0, y1) AS (VALUES {rows}),
{_slab_union_cte('src', 'u')}
SELECT featureclass, md2 FROM u ORDER BY featureclass
"""
    got = {f: int(m) for f, m in con.execute(sql).fetchall()}
    for f in np.unique(fc):
        m = fc == f
        want = round(kernels.rect_union_area(x0[m], y0[m], x1[m], y1[m]))
        assert got[str(f)] == want, (f, got, want)
