"""Flagship pipeline: the BASELINE headline job.

images (streamed, derived metadata + footprints) ->
  (a) spatial join vs land-cover (STRtree actor pool)  [joined]
  (b) decode pixel payloads (actor pool) -> raster↔vector tile
      assignment of image bytes -> per-tile manifests  [tiled]

Throughput metric = images/sec through (a)+(b), the BASELINE.json
"spatial-join throughput (images/sec joined + tiled)".  The tile leg
carries and decodes the real ``bytes`` payload (the north rule assigns
image *bytes* to H3 tiles); only byte SIZES enter the shuffle —
pixels are never shuffled (SURVEY.md §7.5).

Round 5: (a) and (b) are FUSED into one actor-pool pass (shared-scan
fusion, the same optimization the pixel family got): each batch is
derived once, joined against the broadcast land-cover STRtree, decoded,
and exploded to tiles inside a single task.  Per-batch join-pair counts
ride the tile reduction as one sentinel row (tile_id = -1), so the
whole job is one streaming map + one tree reduce — the corpus is
scanned once instead of twice and never materializes anywhere.
``run_flagship_legs`` keeps the original two-pass form for parity
testing and stage-level ``ds.stats()`` profiling.
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..sources import images as src
from ..stages import decode, tiles
from ..stages.hashagg import tree_count_sum_by_key

#: sentinel tile id for the per-batch join-pair-count rows (real tile
#: ids are nonnegative packed (x, y) indexes — see geo.cells.covering)
PAIRS_SENTINEL = -1


class DeriveDecodeExplode(decode.DecodeStats):
    """One fused actor stage: lineitem batch -> derive metadata+payload
    -> decode pixels (per-actor codec state, validates every payload) ->
    drop bytes -> explode to tiles with true byte sizes.

    Fusing keeps the pixel payloads inside the task: bytes never enter
    the object store or any shuffle (SURVEY.md §7.5 'never shuffle pixel
    bytes') — only the (image_id, n_bytes, tile_id) skeleton leaves."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import corpus

        imgs = corpus.derive_images(batch, with_bytes=True, light=True)
        stats = super().__call__(imgs)  # decode + validate every payload
        lens = stats.column("n_pixels")  # == byte length for raw8/qraw8
        meta = imgs.drop_columns(["bytes"]).append_column("n_bytes", lens)
        return tiles.explode_tiles(meta, ("image_id", "n_bytes"))


class FusedFlagship(decode.DecodeStats):
    """Whole flagship in ONE actor-pool stage: derive -> spatial join
    (STRtree built once per worker from the broadcast land-cover table)
    -> decode/validate payloads -> tile explode.

    The join output is pair COUNTS here (the headline job counts join
    rows; the pair *table* form is ``stages.spatial_join``): each batch
    appends one sentinel row (tile_id = PAIRS_SENTINEL, n_bytes =
    n_pairs) so the count flows through the same tree reduce as the
    tile manifest — no second scan, no extra collection.

    Runs as stateless tasks over a pre-built instance (the proven
    DeriveDecodeExplode pattern): the instance carries only the
    land-cover ``ray.put`` ref; each worker resolves it and builds the
    STRtree ONCE via the per-worker broadcast cache."""

    def __init__(self, layer_ref):
        super().__init__()
        self._layer_ref = layer_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import corpus
        from ..state.broadcast import cached
        from ..stages.spatial_join import _Layer, _join_batch

        imgs = corpus.derive_images(batch, with_bytes=True, light=True)
        L = cached(self._layer_ref, lambda t: _Layer(t, "lc_id"))
        n_pairs = _join_batch(imgs, L, emit_image_id=False).num_rows
        stats = super().__call__(imgs)  # decode + validate every payload
        lens = stats.column("n_pixels")  # == byte length for raw8/qraw8
        meta = imgs.drop_columns(["bytes"]).append_column("n_bytes", lens)
        out = tiles.explode_tiles(meta, ("image_id", "n_bytes"))
        sent = pa.table(
            {
                "image_id": ["__join_pairs__"],
                "n_bytes": pa.array([n_pairs], type=out.column("n_bytes").type),
                "tile_id": pa.array([PAIRS_SENTINEL], type=out.column("tile_id").type),
            },
            schema=out.schema,
        )
        return pa.concat_tables([out, sent])


def run_flagship(sf_dir: str, repeat: int = 1) -> dict:
    """``repeat`` unions N copies of the image stream — used by the
    scaling benchmark so compute dominates fixed startup/scheduling
    costs (the sandbox corpus is small; the target corpus is 10^12)."""

    import pyarrow.parquet as pq
    import ray as _ray

    t0 = time.perf_counter()
    # derive is 1:1 with lineitem rows, so the image count comes from
    # parquet METADATA — the round-1 version re-derived the whole corpus
    # in a count() pass just for this number (a wasted full scan).
    n_images = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows * repeat
    t_derive = time.perf_counter() - t0

    t0 = time.perf_counter()
    layer_ref = _ray.put(src.land_cover_table(sf_dir))
    stage = FusedFlagship(layer_ref)
    exploded = src.lineitem_dataset(sf_dir, repeat=repeat).map_batches(
        stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16384,  # sweet spot: per-call overhead vs transient pixel buffer (~26MB)
    )
    manifest = tree_count_sum_by_key(
        exploded, "tile_id", sum_cols=("n_bytes",), count_name="n_images"
    )
    total = time.perf_counter() - t0

    tid = manifest.column("tile_id").to_numpy(zero_copy_only=False)
    sent = tid == PAIRS_SENTINEL
    n_pairs = int(
        manifest.column("n_bytes").to_numpy(zero_copy_only=False)[sent].sum()
    )
    n_tiles = manifest.num_rows - int(sent.sum())

    return {
        "n_images": n_images,
        "n_join_pairs": n_pairs,
        "n_tiles": n_tiles,
        "fused": True,
        "sec_derive_scan": t_derive,
        "sec_join_tile": total,
        "images_per_sec": n_images / total if total > 0 else 0.0,
    }


def run_flagship_legs(sf_dir: str, repeat: int = 1) -> dict:
    """The original two-pass flagship (join leg, then tile leg) — kept
    for fused-vs-legs parity testing and per-stage profiling."""

    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    n_images = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows * repeat
    t_derive = time.perf_counter() - t0

    t0 = time.perf_counter()
    # fuse derive+join in one stage: the intermediate metadata blocks
    # never hit the object store (same pattern as the tile leg)
    import ray as _ray

    from .. import corpus
    from ..state.broadcast import cached
    from ..stages.spatial_join import _Layer, _join_batch

    layer_ref = _ray.put(src.land_cover_table(sf_dir))

    def derive_join(batch: pa.Table) -> pa.Table:
        L = cached(layer_ref, lambda t: _Layer(t, "lc_id"))
        return _join_batch(corpus.derive_images(batch, light=True), L)

    pairs = src.lineitem_dataset(sf_dir, repeat=repeat).map_batches(
        derive_join, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    n_pairs = pairs.count()
    t_join = time.perf_counter() - t0

    t0 = time.perf_counter()
    stage = DeriveDecodeExplode()
    exploded = src.lineitem_dataset(sf_dir, repeat=repeat).map_batches(
        stage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=16384,  # sweet spot: per-call overhead vs transient pixel buffer (~26MB)
    )
    manifest = tree_count_sum_by_key(
        exploded, "tile_id", sum_cols=("n_bytes",), count_name="n_images"
    )
    n_tiles = manifest.num_rows
    t_tile = time.perf_counter() - t0

    total = t_join + t_tile
    return {
        "n_images": n_images,
        "n_join_pairs": n_pairs,
        "n_tiles": n_tiles,
        "sec_derive_scan": t_derive,
        "sec_join": t_join,
        "sec_tile": t_tile,
        "sec_join_tile": total,
        "images_per_sec": n_images / total if total > 0 else 0.0,
    }
