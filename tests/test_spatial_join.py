"""Spatial-join strategy equivalence: broadcast STRtree vs
cell-partitioned shuffle vs brute force, including salted hot cells."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from planet_data_analyzer_ray.sources import images as src
from planet_data_analyzer_ray.stages import spatial_join


def _pairs_set(result) -> set:
    df = result.to_pandas() if hasattr(result, "to_pandas") else result
    return set(zip(df["image_id"], df["lc_id"]))


@pytest.fixture(scope="module")
def world(sf_dir):
    imgs = src.images_dataset(sf_dir)
    lc = src.land_cover_table(sf_dir)
    return imgs, lc


def brute_force_pairs(sf_dir, lc) -> set:
    import pyarrow.parquet as pq

    from planet_data_analyzer_ray import corpus

    imgs = corpus.derive_images(
        pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        )
    )
    ix0 = imgs.column("x0").to_numpy(zero_copy_only=False)
    iy0 = imgs.column("y0").to_numpy(zero_copy_only=False)
    ix1 = imgs.column("x1").to_numpy(zero_copy_only=False)
    iy1 = imgs.column("y1").to_numpy(zero_copy_only=False)
    ids = imgs.column("image_id").to_numpy(zero_copy_only=False)
    lx0 = lc.column("x0").to_numpy(zero_copy_only=False)
    ly0 = lc.column("y0").to_numpy(zero_copy_only=False)
    lx1 = lc.column("x1").to_numpy(zero_copy_only=False)
    ly1 = lc.column("y1").to_numpy(zero_copy_only=False)
    lid = lc.column("lc_id").to_numpy(zero_copy_only=False)
    out = set()
    for j in range(len(lid)):
        m = (ix0 <= lx1[j]) & (lx0[j] <= ix1) & (iy0 <= ly1[j]) & (ly0[j] <= iy1)
        for i in np.nonzero(m)[0]:
            out.add((ids[i], lid[j]))
    return out


def test_broadcast_matches_brute_force(world, sf_dir):
    imgs, lc = world
    got = _pairs_set(spatial_join.broadcast_spatial_join(imgs, lc, id_col="lc_id"))
    expected = brute_force_pairs(sf_dir, lc)
    assert got == expected


def test_partitioned_matches_broadcast(world, sf_dir):
    imgs, lc = world
    bc = _pairs_set(spatial_join.broadcast_spatial_join(imgs, lc, id_col="lc_id"))
    lc_ds = ray.data.from_arrow(lc)
    part = _pairs_set(spatial_join.partitioned_spatial_join(imgs, lc_ds))
    assert part == bc


def test_partitioned_with_salted_hot_cells(world, sf_dir):
    """Salting hot cells must not change the result set."""
    imgs, lc = world
    bc = _pairs_set(spatial_join.broadcast_spatial_join(imgs, lc, id_col="lc_id"))
    # salt the densest cells (as a real skew mitigation would)
    from planet_data_analyzer_ray.geo import cells as cellmod

    lx0 = lc.column("x0").to_numpy(zero_copy_only=False)
    ly0 = lc.column("y0").to_numpy(zero_copy_only=False)
    cells = cellmod.cell_of(lx0 + 1e-9, ly0 + 1e-9)
    vals, counts = np.unique(cells, return_counts=True)
    hot = {int(c): 4 for c in vals[np.argsort(counts)][-5:]}
    lc_ds = ray.data.from_arrow(lc)
    part = _pairs_set(
        spatial_join.partitioned_spatial_join(imgs, lc_ds, salt_cells=hot)
    )
    assert part == bc


def test_actor_pool_variant_matches(world):
    imgs, lc = world
    task = _pairs_set(spatial_join.broadcast_spatial_join(imgs, lc, id_col="lc_id"))
    act = _pairs_set(
        spatial_join.broadcast_spatial_join(
            imgs, lc, id_col="lc_id", use_actors=True, concurrency=(1, 2)
        )
    )
    assert task == act


def test_general_polygon_refinement():
    """Non-rectangular layer goes through the exact polygon-intersects
    refinement path (geom_wkb) and rejects bbox-only false positives."""
    from planet_data_analyzer_ray.geo import wkb

    # a thin diagonal triangle whose bbox covers the unit square
    tri = np.array([[0.0, 0.0], [10.0, 10.0], [10.0, 9.0], [0.0, 0.0]])
    layer = pa.table(
        {
            "lc_id": pa.array([1], type=pa.int64()),
            "geom_wkb": pa.array([wkb.encode_polygon(tri)], type=pa.binary()),
        }
    )
    # image A: near the bbox corner, away from the triangle -> no pair
    # image B: crossing the diagonal -> pair
    imgs = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array(["A", "B"], type=pa.string()),
                "x0": pa.array([0.5, 4.0]),
                "y0": pa.array([8.0, 3.5]),
                "x1": pa.array([1.5, 5.0]),
                "y1": pa.array([9.0, 4.5]),
            }
        )
    )
    got = _pairs_set(spatial_join.broadcast_spatial_join(imgs, layer, id_col="lc_id"))
    assert got == {("B", 1)}


def _seg_cross(a, b, c, d) -> bool:
    """Independent segment-intersection reference (orientation tests,
    inclusive of collinear touching)."""

    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(p, q, r):
        return (
            min(p[0], q[0]) <= r[0] <= max(p[0], q[0])
            and min(p[1], q[1]) <= r[1] <= max(p[1], q[1])
        )

    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(a, b, c):
        return True
    if o2 == 0 and on_seg(a, b, d):
        return True
    if o3 == 0 and on_seg(c, d, a):
        return True
    return o4 == 0 and on_seg(c, d, b)


def _pt_in_ring_ref(pt, ring) -> bool:
    """Independent ray-casting point-in-polygon (ring open, CCW or CW)."""
    x, y = pt
    n = len(ring)
    inside = False
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > y) != (y2 > y):
            xc = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
            if x < xc:
                inside = not inside
    return inside


def _rings_intersect_ref(ra, rb) -> bool:
    """Simple-polygon intersection reference: any edge pair crosses, or
    one contains the other (vertex containment suffices when no edges
    cross)."""
    na, nb = len(ra), len(rb)
    for i in range(na):
        for j in range(nb):
            if _seg_cross(ra[i], ra[(i + 1) % na], rb[j], rb[(j + 1) % nb]):
                return True
    return _pt_in_ring_ref(ra[0], rb) or _pt_in_ring_ref(rb[0], ra)


def _random_convex_ring(rng, cx, cy, rad, k):
    ang = np.sort(rng.uniform(0, 2 * np.pi, size=k))
    rr = rng.uniform(0.4 * rad, rad, size=k)
    return np.column_stack([cx + rr * np.cos(ang), cy + rr * np.sin(ang)])


def test_rotated_probes_vs_multipart_layer_brute_force():
    """Randomized equivalence: rotated-quad probe footprints (plus some
    axis-aligned rect probes) joined against a layer of 1-3-part
    MULTIPOLYGONs, through BOTH join strategies, vs an independent
    O(n*m) segment/containment reference implemented in this test."""
    from planet_data_analyzer_ray.geo import wkb

    rng = np.random.default_rng(20260817)
    # --- probes: 150 rotated squares + 50 axis-aligned rects ----------
    n_rot, n_rect = 150, 50
    probe_rings = []
    for i in range(n_rot):
        cx, cy = rng.uniform(0, 100), rng.uniform(0, 100)
        hw = rng.uniform(1.0, 6.0)
        th = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        base = np.array([[-hw, -hw], [hw, -hw], [hw, hw], [-hw, hw]])
        quad = base @ np.array([[c, s], [-s, c]]) + [cx, cy]
        probe_rings.append(quad)
    for i in range(n_rect):
        x0, y0 = rng.uniform(0, 95), rng.uniform(0, 95)
        w, h = rng.uniform(1, 8), rng.uniform(1, 8)
        probe_rings.append(
            np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
        )
    pids = [f"p{i}" for i in range(len(probe_rings))]
    probes = pa.table(
        {
            "image_id": pa.array(pids, type=pa.string()),
            "x0": pa.array([r[:, 0].min() for r in probe_rings]),
            "y0": pa.array([r[:, 1].min() for r in probe_rings]),
            "x1": pa.array([r[:, 0].max() for r in probe_rings]),
            "y1": pa.array([r[:, 1].max() for r in probe_rings]),
            "geom_wkb": pa.array(
                [wkb.encode_polygon(r) for r in probe_rings], type=pa.binary()
            ),
        }
    )
    # --- layer: 30 multipolygons of 1-3 random convex parts -----------
    layer_parts, lids = [], []
    for j in range(30):
        parts = [
            _random_convex_ring(
                rng, rng.uniform(0, 100), rng.uniform(0, 100),
                rng.uniform(2, 9), int(rng.integers(3, 7)),
            )
            for _ in range(int(rng.integers(1, 4)))
        ]
        layer_parts.append(parts)
        lids.append(j)
    lx0 = [min(p[:, 0].min() for p in ps) for ps in layer_parts]
    ly0 = [min(p[:, 1].min() for p in ps) for ps in layer_parts]
    lx1 = [max(p[:, 0].max() for p in ps) for ps in layer_parts]
    ly1 = [max(p[:, 1].max() for p in ps) for ps in layer_parts]
    layer = pa.table(
        {
            "lc_id": pa.array(lids, type=pa.int64()),
            "x0": pa.array(lx0),
            "y0": pa.array(ly0),
            "x1": pa.array(lx1),
            "y1": pa.array(ly1),
            "geom_wkb": pa.array(
                [
                    wkb.encode_multipolygon(ps)
                    if len(ps) > 1
                    else wkb.encode_polygon(ps[0])
                    for ps in layer_parts
                ],
                type=pa.binary(),
            ),
        }
    )
    # --- independent brute force --------------------------------------
    expect = set()
    for i, pr in enumerate(probe_rings):
        for j, ps in enumerate(layer_parts):
            if any(_rings_intersect_ref(pr.tolist(), part.tolist()) for part in ps):
                expect.add((pids[i], j))
    assert len(expect) > 50  # fixture is non-trivial

    probe_ds = ray.data.from_arrow(probes)
    got_b = _pairs_set(
        spatial_join.broadcast_spatial_join(probe_ds, layer, id_col="lc_id")
    )
    assert got_b == expect
    got_p = _pairs_set(
        spatial_join.partitioned_spatial_join(
            probe_ds, ray.data.from_arrow(layer), id_col="lc_id"
        )
    )
    assert got_p == expect
