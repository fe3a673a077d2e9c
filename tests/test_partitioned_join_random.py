"""Randomized stress tests for the cell-partitioned join's
canonical-cell pair dedup (boxes spanning MANY cells), the hash/tree
aggregates, and the kNN fallback path."""

import numpy as np
import pyarrow as pa
import ray.data

from planet_data_analyzer_ray.stages import spatial_join
from planet_data_analyzer_ray.stages.hashagg import (
    count_sum_by_key,
    distinct_values,
    tree_count_sum_by_key,
)
from planet_data_analyzer_ray.util import collect_table


def _random_boxes(rng, n, max_side):
    x0 = rng.uniform(-160, 150, n)
    y0 = rng.uniform(-60, 50, n)
    x1 = x0 + rng.uniform(0.01, max_side, n)
    y1 = y0 + rng.uniform(0.01, max_side, n)
    return x0, y0, x1, y1


def test_partitioned_join_wide_boxes_matches_brute_force():
    """Probe boxes up to 10 deg and build boxes up to 15 deg — every
    pair overlaps many 4-deg cells; the canonical-cell rule must emit
    each pair exactly once."""
    rng = np.random.RandomState(7)
    px0, py0, px1, py1 = _random_boxes(rng, 300, 10.0)
    bx0, by0, bx1, by1 = _random_boxes(rng, 80, 15.0)
    probe = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"p{i}" for i in range(300)], type=pa.string()),
                "x0": pa.array(px0),
                "y0": pa.array(py0),
                "x1": pa.array(px1),
                "y1": pa.array(py1),
            }
        )
    )
    build = ray.data.from_arrow(
        pa.table(
            {
                "lc_id": pa.array(np.arange(80, dtype=np.int64)),
                "x0": pa.array(bx0),
                "y0": pa.array(by0),
                "x1": pa.array(bx1),
                "y1": pa.array(by1),
            }
        )
    )
    got = spatial_join.partitioned_spatial_join(probe, build).to_pandas()
    got_pairs = sorted(zip(got["image_id"], got["lc_id"]))
    assert len(got_pairs) == len(set(got_pairs)), "duplicate pairs emitted"
    expected = []
    for i in range(300):
        m = (px0[i] <= bx1) & (bx0 <= px1[i]) & (py0[i] <= by1) & (by0 <= py1[i])
        expected.extend((f"p{i}", int(j)) for j in np.nonzero(m)[0])
    assert got_pairs == sorted(expected)


def test_partitioned_join_wide_boxes_with_salt():
    rng = np.random.RandomState(11)
    px0, py0, px1, py1 = _random_boxes(rng, 200, 6.0)
    bx0, by0, bx1, by1 = _random_boxes(rng, 40, 12.0)
    probe = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"p{i}" for i in range(200)], type=pa.string()),
                "x0": pa.array(px0),
                "y0": pa.array(py0),
                "x1": pa.array(px1),
                "y1": pa.array(py1),
            }
        )
    )
    bt = pa.table(
        {
            "lc_id": pa.array(np.arange(40, dtype=np.int64)),
            "x0": pa.array(bx0),
            "y0": pa.array(by0),
            "x1": pa.array(bx1),
            "y1": pa.array(by1),
        }
    )
    base = spatial_join.partitioned_spatial_join(
        probe, ray.data.from_arrow(bt)
    ).to_pandas()
    from planet_data_analyzer_ray.geo import cells as cellmod

    # salt every cell the build boxes touch (max stress)
    rows, cs = cellmod.covering(bx0, by0, bx1, by1)
    hot = {int(c): 3 for c in np.unique(cs)}
    salted = spatial_join.partitioned_spatial_join(
        probe, ray.data.from_arrow(bt), salt_cells=hot
    ).to_pandas()
    a = sorted(zip(base["image_id"], base["lc_id"]))
    b = sorted(zip(salted["image_id"], salted["lc_id"]))
    assert a == b


def test_hashagg_and_tree_agg_match_pandas():
    rng = np.random.RandomState(3)
    n = 50_000
    keys = rng.randint(0, 5_000, n).astype(np.int64)
    vals = rng.randint(0, 100, n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ).repartition(8)
    import pandas as pd

    expected = (
        pd.DataFrame({"k": keys, "v": vals})
        .groupby("k")
        .agg(n=("v", "size"), v=("v", "sum"))
        .reset_index()
    )
    shuffled = (
        collect_table(count_sum_by_key(ds, "k", sum_cols=("v",), count_name="n"))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    tree = (
        tree_count_sum_by_key(ds, "k", sum_cols=("v",), count_name="n")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for got in (shuffled, tree):
        assert (got["k"].values == expected["k"].values).all()
        assert (got["n"].values == expected["n"].values).all()
        assert (got["v"].values == expected["v"].values).all()

    dv = collect_table(distinct_values(ds, "k")).to_pandas()["k"].sort_values().values
    assert (dv == np.unique(keys)).all()


def test_knn_fallback_exactness():
    """Images so sparse that ring-1 cannot satisfy k: the fallback must
    still return the exact brute-force answer."""
    import pyarrow.parquet as pq

    from planet_data_analyzer_ray.stages import knn

    rng = np.random.RandomState(5)
    n_img = 40  # ~0.01 images per cell -> every city falls back
    ilon = rng.uniform(-160, 160, n_img)
    ilat = rng.uniform(-60, 60, n_img)
    imgs = ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array([f"i{k}" for k in range(n_img)], type=pa.string()),
                "image_key": pa.array(np.arange(n_img, dtype=np.int64)),
                "centroid_lon": pa.array(ilon),
                "centroid_lat": pa.array(ilat),
            }
        )
    )
    cities = pa.table(
        {
            "city_id": pa.array(np.arange(10, dtype=np.int64)),
            "lon": pa.array(rng.uniform(-150, 150, 10)),
            "lat": pa.array(rng.uniform(-50, 50, 10)),
        }
    )
    got = knn.knn_city_scenes(imgs, cities, k=5).to_pandas()
    for cid in range(10):
        cx = cities.column("lon")[cid].as_py()
        cy = cities.column("lat")[cid].as_py()
        d2 = (cx - ilon) ** 2 + (cy - ilat) ** 2
        order = np.lexsort((np.arange(n_img), d2))[:5]
        expect_ids = [f"i{k}" for k in order]
        rows = got[got["city_id"] == cid].sort_values("rank")
        assert list(rows["image_id"]) == expect_ids


def test_detect_hot_cells_and_auto_salted_join():
    """A dense AOI (80% of probes in one cell) is detected from the
    data; the auto-salted partitioned join matches the unsalted one."""
    rng = np.random.RandomState(21)
    n = 400
    # 80% of boxes clustered inside one 4-deg cell near (1, 1)
    cx = np.where(rng.rand(n) < 0.8, 1.0, rng.uniform(-150, 150, n))
    cy = np.where(rng.rand(n) < 0.8, 1.0, rng.uniform(-55, 55, n))
    px0 = cx + rng.uniform(0, 0.5, n)
    py0 = cy + rng.uniform(0, 0.5, n)
    px1 = px0 + rng.uniform(0.1, 1.0, n)
    py1 = py0 + rng.uniform(0.1, 1.0, n)
    probe_t = pa.table(
        {
            "image_id": pa.array([f"p{i}" for i in range(n)], type=pa.string()),
            "x0": pa.array(px0),
            "y0": pa.array(py0),
            "x1": pa.array(px1),
            "y1": pa.array(py1),
        }
    )
    probe = ray.data.from_arrow(probe_t)
    hot = spatial_join.detect_hot_cells(ray.data.from_arrow(probe_t))
    assert len(hot) >= 1  # the dense cell is found
    assert all(2 <= k <= spatial_join.MAX_SALTS for k in hot.values())

    rng2 = np.random.RandomState(22)
    bx0, by0, bx1, by1 = _random_boxes(rng2, 30, 12.0)
    bt = pa.table(
        {
            "lc_id": pa.array(np.arange(30, dtype=np.int64)),
            "x0": pa.array(bx0),
            "y0": pa.array(by0),
            "x1": pa.array(bx1),
            "y1": pa.array(by1),
        }
    )
    base = spatial_join.partitioned_spatial_join(
        probe, ray.data.from_arrow(bt)
    ).to_pandas()
    salted = spatial_join.partitioned_spatial_join(
        probe, ray.data.from_arrow(bt), salt_cells=hot
    ).to_pandas()
    a = sorted(zip(base["image_id"], base["lc_id"]))
    b = sorted(zip(salted["image_id"], salted["lc_id"]))
    assert a == b
