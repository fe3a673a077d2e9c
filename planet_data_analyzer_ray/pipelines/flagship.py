"""Flagship pipeline: the BASELINE headline job.

images (streamed, derived metadata + footprints) ->
  (a) spatial join vs land-cover (STRtree actor pool)  [joined]
  (b) raster↔vector tile assignment -> per-tile manifests  [tiled]

Throughput metric = images/sec through (a)+(b), the BASELINE.json
"spatial-join throughput (images/sec joined + tiled)".
"""

from __future__ import annotations

import time

from ..sources import images as src
from ..stages import spatial_join, tiles


def run_flagship(sf_dir: str) -> dict:
    t0 = time.perf_counter()
    n_images = src.images_dataset(sf_dir).count()
    t_derive = time.perf_counter() - t0

    t0 = time.perf_counter()
    pairs = spatial_join.broadcast_spatial_join(
        src.images_dataset(sf_dir), src.land_cover_table(sf_dir), id_col="lc_id"
    )
    n_pairs = pairs.count()
    t_join = time.perf_counter() - t0

    t0 = time.perf_counter()
    manifest = tiles.tile_manifest(src.images_dataset(sf_dir))
    n_tiles = manifest.count()
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
