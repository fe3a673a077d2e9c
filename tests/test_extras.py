"""Golden/oracle tests for the secondary operators without SQL mirrors."""

import json

import numpy as np
import pytest

from planet_data_analyzer_ray import corpus
from planet_data_analyzer_ray.geo import kernels
from planet_data_analyzer_ray.pipelines import queries as Q
from planet_data_analyzer_ray.sources import images as src


def test_dissolve_exact_matches_single_shot_union(sf_dir):
    got = {
        r["featureclass"]: r["area_sqkm"]
        for r in Q.q_dissolve_exact_area(sf_dir).to_pandas().to_dict("records")
    }
    lc = src.land_cover_table(sf_dir)
    fc = lc.column("featureclass").to_numpy(zero_copy_only=False)
    x0 = lc.column("x0").to_numpy(zero_copy_only=False)
    y0 = lc.column("y0").to_numpy(zero_copy_only=False)
    x1 = lc.column("x1").to_numpy(zero_copy_only=False)
    y1 = lc.column("y1").to_numpy(zero_copy_only=False)
    for f in np.unique(fc):
        m = fc == f
        expected = (
            kernels.rect_union_area(x0[m], y0[m], x1[m], y1[m]) * 12364.0
        )
        assert got[f] == pytest.approx(expected, rel=1e-12)


def test_geojson_export_golden(sf_dir):
    """Full reference property set (db.py:160-177): all 11 keys present,
    date format %Y-%m-%d (db.py:169), area rounded to 3 (db.py:153),
    land_cover_class equals the actual intersecting classes."""
    out = Q.q_geojson_export(sf_dir).to_pandas()
    assert len(out) > 0
    feat = json.loads(out.iloc[0]["feature"])
    assert feat["type"] == "Feature"
    assert feat["geometry"]["type"] == "Polygon"
    ring = feat["geometry"]["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    props = feat["properties"]
    assert feat["id"] == out.iloc[0]["image_id"]
    assert set(props) == {
        "id",
        "cloud_cover",
        "pixel_res",
        "time_acquired",
        "sat_id",
        "sat_name",
        "item_type_id",
        "srid",
        "area_sqkm",
        "land_cover_class",
        "asset_types",
    }
    assert props["srid"] == 4326
    assert isinstance(props["pixel_res"], float) and 0.5 <= props["pixel_res"] <= 5.0
    assert isinstance(props["asset_types"], list) and "analytic" in props["asset_types"]
    import re

    assert re.fullmatch(r"\d{4}-\d{2}-\d{2}", props["time_acquired"])
    assert props["area_sqkm"] == round(props["area_sqkm"], 3)
    # land_cover_class lists match the flagship join's per-image lists
    lists = Q.q_image_landcover_lists(sf_dir).to_pandas()
    want = dict(zip(lists["image_id"], lists["lc_list"]))
    checked = 0
    for _, row in out.head(200).iterrows():
        p = json.loads(row["feature"])["properties"]
        expect = want.get(row["image_id"], "")
        assert ",".join(p["land_cover_class"]) == expect
        checked += 1
    assert checked > 0


def test_dense_series_has_empty_buckets(sf_dir):
    df = Q.q_time_series_dense(sf_dir).to_pandas()
    # contiguous months, and the scaffold keeps any zero-count months
    assert df["bucket"].is_monotonic_increasing
    assert (df["total_images"] >= 0).all()
    import pandas as pd

    months = pd.PeriodIndex(df["bucket"], freq="M")
    assert (months[1:] - months[:-1]).map(lambda d: d.n == 1).all()


def test_tree_aggregate_matches_shuffle_aggregate(sf_dir):
    """tree_count_sum_by_key (shuffle-free combiner) == the
    hash-partitioned shuffle aggregate == the tile_manifest oracle."""
    import pandas as pd

    from planet_data_analyzer_ray.stages import tiles
    from planet_data_analyzer_ray.stages.hashagg import tree_count_sum_by_key

    def exploded():
        import numpy as np
        import pyarrow as pa

        def explode_with_bytes(batch):
            w = batch.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
            h = batch.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.append_column("n_bytes", pa.array(w * h))
            return tiles.explode_tiles(batch, ("image_id", "n_bytes"))

        return src.images_dataset(sf_dir).map_batches(
            explode_with_bytes, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )

    tree = (
        tree_count_sum_by_key(
            exploded(), "tile_id", sum_cols=("n_bytes",), count_name="n_images"
        )
        .to_pandas()
        .rename(columns={"n_bytes": "total_bytes"})
        .sort_values("tile_id")
        .reset_index(drop=True)
    )
    shuffle = (
        tiles.tile_manifest(src.images_dataset(sf_dir))
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)[tree.columns]
    )
    pd.testing.assert_frame_equal(tree, shuffle, check_dtype=False)


def test_export_tile_manifests_resumable(sf_dir, tmp_path):
    from planet_data_analyzer_ray.stages import tiles

    out = str(tmp_path / "tiles")
    r1 = tiles.export_tile_manifests(src.images_dataset(sf_dir), out)
    assert r1["written"] == r1["buckets"] and r1["skipped"] == 0
    r2 = tiles.export_tile_manifests(src.images_dataset(sf_dir), out)
    assert r2["written"] == 0 and r2["skipped"] == r2["buckets"]
    import os

    import pyarrow.dataset as pads

    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    ]
    total = pads.dataset(files).to_table()
    mf = tiles.tile_manifest(src.images_dataset(sf_dir)).to_pandas()
    assert total.num_rows == len(mf)
    assert sorted(total.column("tile_id").to_pylist()) == sorted(mf["tile_id"])


def test_images_geom_wkb_join_equivalence(sf_dir):
    """Geometry-as-WKB flow: images carrying geom_wkb decode to the same
    bboxes, and a WKB-only layer joins identically (SURVEY §7.0)."""
    import pyarrow.parquet as pq

    from planet_data_analyzer_ray import corpus
    from planet_data_analyzer_ray.geo import wkb

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    ).slice(0, 500)
    imgs = corpus.derive_images(t, with_geom=True)
    x0, y0, x1, y1 = wkb.decode_boxes(imgs.column("geom_wkb").to_pylist())
    np.testing.assert_array_equal(x0, imgs.column("x0").to_numpy(zero_copy_only=False))
    np.testing.assert_array_equal(y1, imgs.column("y1").to_numpy(zero_copy_only=False))


def test_random_shuffle_invariance(sf_dir):
    """random_shuffle (seeded wide op) must not change aggregate results."""
    base = (
        Q.q_count_per_featureclass(sf_dir)
        .to_pandas()
        .sort_values("featureclass")
        .reset_index(drop=True)
    )
    from planet_data_analyzer_ray.stages import spatial_join

    shuffled_imgs = src.images_dataset(sf_dir).random_shuffle(seed=42)
    pairs = spatial_join.broadcast_spatial_join(
        shuffled_imgs,
        src.land_cover_table(sf_dir),
        id_col="lc_id",
        extra_cols=("featureclass",),
    )
    got = (
        pairs.groupby("featureclass")
        .count()
        .to_pandas()
        .rename(columns={"count()": "total_images"})
        .sort_values("featureclass")
        .reset_index(drop=True)
    )
    assert got.equals(base)


def test_export_manifest_partitioned_large_keyspace(tmp_path):
    """>10^6 synthetic tiles through the unbounded-keyspace sink: the
    manifest never transits the driver (only per-bucket summary rows
    do), resume skips complete buckets, and the written parquet
    reproduces the exact per-tile aggregate."""
    import pyarrow.dataset as pads

    from planet_data_analyzer_ray.stages import tiles

    n, reps = 1_200_000, 2
    span = 100_000

    def gen(batch):
        # rows arrive as {"id": int64 numpy}; two fact rows per tile id
        import pyarrow as pa

        ids = batch["id"].astype(np.int64)
        t = np.repeat(ids, reps)
        return pa.table({"tile_id": pa.array(t), "n_bytes": pa.array(t % 7 + 1)})

    import ray.data

    rows = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="numpy", batch_size=None
    )
    out = str(tmp_path / "bigtiles")
    r1 = tiles.export_manifest_partitioned(rows, out, bucket_span=span)
    assert r1["buckets"] == n // span
    assert r1["written"] == r1["buckets"] and r1["skipped"] == 0

    rows2 = ray.data.range(n, override_num_blocks=64).map_batches(
        gen, batch_format="numpy", batch_size=None
    )
    r2 = tiles.export_manifest_partitioned(rows2, out, bucket_span=span)
    assert r2["written"] == 0 and r2["skipped"] == r2["buckets"]

    import pyarrow as pa  # noqa: F401

    got = pads.dataset(out).to_table().sort_by("tile_id")
    assert got.num_rows == n
    assert got.column("n_images").to_numpy().sum() == n * reps
    tid = got.column("tile_id").to_numpy()
    assert (tid == np.arange(n)).all()
    assert (
        got.column("n_bytes").to_numpy() == reps * (tid % 7 + 1)
    ).all()


def test_paged_datasource_structure(sf_dir):
    """S1 paginated Datasource: get_read_tasks respects parallelism and
    never exceeds the page count; different task partitionings produce
    the same feature multiset; every emitted block is a single page (or
    its duplicate tail)."""
    import pyarrow as pa
    import ray.data as rd

    from planet_data_analyzer_ray import spec
    from planet_data_analyzer_ray.sources.paged import (
        PagedSearchDatasource,
        paged_dedup_last_wins,
    )

    src_small = PagedSearchDatasource(sf_dir, page_size=500)
    assert src_small.num_pages == 12  # 6000 lineitem rows at sf0.001
    assert len(src_small.get_read_tasks(4)) == 4
    assert len(src_small.get_read_tasks(100)) == 12  # capped at pages

    def collect(par):
        tasks = src_small.get_read_tasks(par)
        blocks = [b for t in tasks for b in t()]
        return pa.concat_tables(blocks)

    one = collect(1).sort_by([("image_key", "ascending"), ("page_idx", "ascending")])
    many = collect(12).sort_by([("image_key", "ascending"), ("page_idx", "ascending")])
    assert one.equals(many)
    # duplicate re-returns: keys emitted twice are exactly the
    # key % DUP_EVERY == 0 features, with the re-return one page later
    # and clear confidence bumped by 1
    k = one.column("image_key").to_numpy(zero_copy_only=False)
    p = one.column("page_idx").to_numpy(zero_copy_only=False)
    cl = one.column("clear_confidence_percent").to_numpy(zero_copy_only=False)
    uniq, counts = np.unique(k, return_counts=True)
    dup_keys = uniq[counts == 2]
    assert len(dup_keys) > 0
    assert (dup_keys % spec.DUP_EVERY == 0).all()
    sel = np.isin(k, dup_keys)
    ks, ps, cs = k[sel], p[sel], cl[sel]  # sorted by (key, page)
    assert (ps[1::2] == ps[0::2] + 1).all()
    assert (cs[1::2] == cs[0::2] + 1.0).all()

    # end-to-end: dedup over a different page size gives the same result
    ds = rd.read_datasource(src_small, override_num_blocks=src_small.num_pages)
    out = paged_dedup_last_wins(ds).to_pandas()
    assert out["image_id"].is_unique


def test_geojson_batch_matches_json_dumps():
    """Byte parity of the vectorized GeoJSON assembly with a row-wise
    json.dumps(sort_keys=True) reference over adversarial numerics
    (integral doubles, shortest-repr tails, negative zero)."""
    import json as _json

    import pyarrow as pa

    from planet_data_analyzer_ray.stages import extras

    x0 = np.array([99.54500000000002, -128.58, 1.0, -0.0])
    y0 = np.array([51.669, 63.491000000000014, 2.5, 7.0])
    w = np.array([0.314, 0.136, 1.0, 0.125])
    batch = pa.table(
        {
            "image_id": pa.array([f"img-{i}" for i in range(4)], type=pa.string()),
            "x0": pa.array(x0),
            "y0": pa.array(y0),
            "x1": pa.array(x0 + w),
            "y1": pa.array(y0 + w),
            "cloud_cover": pa.array([0.969, 0.0, 1.0, 0.329]),
            "area_sqkm": pa.array([1219.0405, 228.685, 42.0, 0.1234]),
            "pixel_res": pa.array([2.1, 0.6, 5.0, 1.0]),
            "sat_id": pa.array([9, 0, 3, 12], type=pa.int64()),
            "sat_name": pa.array(["Supplier#9", "S0", "S3", "S12"], type=pa.string()),
            "item_type_id": pa.array(["it-1", "it-0", "it-3", "it-2"], type=pa.string()),
            "asset_types": pa.array(
                [["analytic", "udm"], ["analytic"], ["analytic", "visual", "udm"], ["analytic"]],
                type=pa.list_(pa.string()),
            ),
            "time_acquired": pa.array(
                np.array(
                    ["2001-12-06T23:00:00", "1995-12-03T01:00:00",
                     "1994-01-01T00:00:00", "2000-02-29T12:00:00"],
                    dtype="datetime64[us]",
                )
            ),
        }
    )
    got = extras.geojson_batch(batch)["feature"].to_pylist()
    rows = batch.to_pylist()
    for i, r in enumerate(rows):
        ring = [
            [r["x0"], r["y0"]], [r["x1"], r["y0"]], [r["x1"], r["y1"]],
            [r["x0"], r["y1"]], [r["x0"], r["y0"]],
        ]
        want = _json.dumps(
            {
                "type": "Feature",
                "id": r["image_id"],
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": {
                    "id": r["image_id"],
                    "cloud_cover": r["cloud_cover"],
                    "pixel_res": r["pixel_res"],
                    "time_acquired": r["time_acquired"].strftime("%Y-%m-%d"),
                    "sat_id": r["sat_id"],
                    "sat_name": r["sat_name"],
                    "item_type_id": r["item_type_id"],
                    "srid": 4326,
                    "area_sqkm": round(r["area_sqkm"], 3),
                    "land_cover_class": [],
                    "asset_types": r["asset_types"],
                },
            },
            sort_keys=True,
        )
        assert got[i] == want, f"row {i}:\n{got[i]}\n!=\n{want}"


def test_export_manifest_digest_probe_catches_changed_counts(tmp_path):
    """Resume probe is a CONTENT digest, not a row count: a bucket whose
    per-tile counts changed but whose tile cardinality did not must
    rewrite, and an identical re-run must skip."""
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from planet_data_analyzer_ray.stages import tiles

    def rows_for(reps):
        t = np.repeat(np.arange(500, dtype=np.int64), reps)
        return rd.from_arrow(
            pa.table({"tile_id": pa.array(t), "n_bytes": pa.array(t % 5 + 1)})
        )

    out = str(tmp_path / "m")
    r1 = tiles.export_manifest_partitioned(rows_for(2), out, bucket_span=100)
    assert r1["written"] == r1["buckets"] == 5
    # identical content -> all skipped
    r2 = tiles.export_manifest_partitioned(rows_for(2), out, bucket_span=100)
    assert r2["written"] == 0 and r2["skipped"] == 5
    # same tile cardinality, different counts/bytes -> all rewritten
    r3 = tiles.export_manifest_partitioned(rows_for(3), out, bucket_span=100)
    assert r3["written"] == 5 and r3["skipped"] == 0
    got = pads.dataset(out).to_table()
    assert got.num_rows == 500
    assert got.column("n_images").to_numpy().sum() == 1500
