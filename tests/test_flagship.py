"""Fused flagship vs the original two-leg pipeline: identical results.

The round-5 flagship fuses derive -> spatial join -> decode -> tile
explode into ONE streaming pass (join-pair counts ride the tile tree
reduce as sentinel rows).  These tests pin that the fusion changes the
wall clock only — every reported number matches the two-pass form, and
the sentinel never leaks into the manifest.
"""

import pyarrow as pa

from planet_data_analyzer_ray.pipelines import flagship


def test_fused_matches_two_leg_pipeline(sf_dir):
    a = flagship.run_flagship(sf_dir)
    b = flagship.run_flagship_legs(sf_dir)
    assert a["n_images"] == b["n_images"]
    assert a["n_join_pairs"] == b["n_join_pairs"]
    assert a["n_tiles"] == b["n_tiles"]
    assert a["fused"] is True


def test_fused_matches_two_leg_with_repeat(sf_dir):
    # the scaling bench unions the corpus N times; pair/tile accounting
    # must scale exactly (pairs x N, tile SET unchanged)
    a1 = flagship.run_flagship(sf_dir, repeat=1)
    a2 = flagship.run_flagship(sf_dir, repeat=2)
    assert a2["n_images"] == 2 * a1["n_images"]
    assert a2["n_join_pairs"] == 2 * a1["n_join_pairs"]
    assert a2["n_tiles"] == a1["n_tiles"]


def test_fused_flagship_survives_worker_death(sf_dir, tmp_path):
    # T1 on the HEADLINE path: one worker hard-dies (os._exit) mid-job;
    # Ray restarts it and the fused pass still produces the exact
    # pair/tile accounting.  The chaos stage also re-batches the stream
    # (1024-row batches), so this doubles as a batching-invariance pin
    # for the sentinel design: per-batch pair counts must SUM correctly
    # no matter how the input is split.
    import os

    import ray

    from planet_data_analyzer_ray.sources import images as src
    from planet_data_analyzer_ray.stages.chaos import CrashOncePassthrough
    from planet_data_analyzer_ray.stages.hashagg import tree_count_sum_by_key

    clean = flagship.run_flagship(sf_dir)
    marker = str(tmp_path / "crashed-once")
    layer_ref = ray.put(src.land_cover_table(sf_dir))
    stage = flagship.FusedFlagship(layer_ref)
    ex = (
        src.lineitem_dataset(sf_dir)
        .map_batches(
            CrashOncePassthrough,
            fn_constructor_args=(marker,),
            concurrency=2,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=1024,
            max_restarts=4,
            max_task_retries=4,
        )
        .map_batches(
            stage, batch_format="pyarrow", zero_copy_batch=True, batch_size=16384
        )
    )
    manifest = tree_count_sum_by_key(
        ex, "tile_id", sum_cols=("n_bytes",), count_name="n_images"
    )
    tid = manifest.column("tile_id").to_numpy(zero_copy_only=False)
    sent = tid == flagship.PAIRS_SENTINEL
    n_pairs = int(manifest.column("n_bytes").to_numpy(zero_copy_only=False)[sent].sum())
    assert os.path.exists(marker), "the injected crash never fired"
    assert n_pairs == clean["n_join_pairs"]
    assert manifest.num_rows - int(sent.sum()) == clean["n_tiles"]


def test_lineitem_read_sizes_generator_buffer(sf_dir):
    # the single-fragment read splits its output `override_num_blocks`
    # ways from ONE task; Ray's default 2-block generator buffer makes
    # that task pause on a scheduler round-trip every 2 blocks (measured
    # 3.5 s of wall for 50 ms of read).  lineitem_dataset must size the
    # buffer to at least its per-task split count.
    import ray.data

    from planet_data_analyzer_ray.sources import images as src

    ds = src.lineitem_dataset(sf_dir)
    ctx = ray.data.DataContext.get_current()
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    assert ctx._max_num_blocks_in_streaming_gen_buffer >= min(
        max(32, cpus * 2), 128
    )
    assert ds.count() > 0


def test_sentinel_rows_stay_out_of_tile_space(sf_dir):
    # every real tile id is a nonnegative packed (x, y) index, so the
    # -1 sentinel can never collide with a manifest row
    import ray

    from planet_data_analyzer_ray.sources import images as src
    from planet_data_analyzer_ray.stages import tiles

    ids = (
        src.images_dataset(sf_dir)
        .map_batches(
            lambda b: tiles.explode_tiles(b, ("image_id",)).select(["tile_id"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )
        .to_pandas()["tile_id"]
    )
    assert int(ids.min()) >= 0
    assert flagship.PAIRS_SENTINEL < 0
