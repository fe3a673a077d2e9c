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
